"""S1/S2 fetch retry + error taxonomy pinned against the reference.

Two layers (same pattern as ``test_career_urls.py``):

* hard-pinned expectations for every taxonomy class and retry shape
  (always run);
* an AST differential that reads the reference's OWN source
  (``app/services/crawler.py``) and asserts our constant tables — the
  keyword-priority classification chain, the HEAD availability status
  lists, the retry count — match it exactly; skipped when the snapshot
  is absent.
"""

from __future__ import annotations

import ast
import os

import pytest

from crawler_ai_ray.functions.fetch_errors import (
    DEFAULT_ATTEMPTS,
    DEFAULT_HEAD,
    ERROR_TYPES,
    EXC_DNS,
    EXC_ENCODING,
    EXC_REFUSED,
    EXC_TIMEOUT,
    EXC_UNREACHABLE,
    MAX_RETRIES,
    classify_error,
    head_availability,
    simulate_fetch,
)

REF = "/root/reference/app/services/crawler.py"
U = "https://acme.vn/x"


class TestPinnedTaxonomy:
    def test_success_default(self):
        r = simulate_fetch(U, DEFAULT_HEAD, DEFAULT_ATTEMPTS)
        assert r["success"] and r["status_code"] == 200
        assert r["attempts_used"] == 1 and r["backoff_s"] == 0.0
        assert r["error_type"] is None

    def test_non_http_skip(self):
        for u in ("mailto:hr@a.vn", "tel:0901", "javascript:void(0)", "#f"):
            r = simulate_fetch(u, 0, [0, 0, 0])
            assert not r["success"]
            assert r["error_type"] == "non_http"
            assert r["attempts_used"] == 0
            assert r["error_message"] == "Non-HTTP URL skipped"

    def test_head_kill_permanent(self):
        r = simulate_fetch(U, 410, [410, 410, 410])
        assert not r["success"] and r["error_type"] == "not_found"
        assert r["status_code"] == 410 and r["attempts_used"] == 0
        assert r["error_message"] == "Permanent error: HTTP 410"

    def test_head_kill_blocked_no_get_attempts(self):
        r = simulate_fetch(U, 403, [200, 200, 200])  # GET would succeed!
        assert not r["success"] and r["error_type"] == "blocked"
        assert r["attempts_used"] == 0
        assert r["error_message"] == "HTTP 403 - Forbidden"

    def test_head_unknown_falls_through_to_get(self):
        r = simulate_fetch(U, 0, [200, 200, 200])
        assert r["success"] and r["attempts_used"] == 1

    def test_get_permanent_404_no_retry(self):
        r = simulate_fetch(U, 200, [404, 200, 200])  # retry would succeed!
        assert not r["success"] and r["error_type"] == "not_found"
        assert r["attempts_used"] == 1 and r["status_code"] == 404
        assert r["error_message"] == "Permanent error: HTTP 404 - Not Found"

    def test_retry_backoffs(self):
        # 403: 2**0 + 2**1; final message → blocked
        r = simulate_fetch(U, 200, [403, 403, 403])
        assert (r["error_type"], r["attempts_used"], r["backoff_s"]) == (
            "blocked", 3, 3.0,
        )
        # 429: (3+0) + (3+2) = 8
        r = simulate_fetch(U, 200, [429, 429, 429])
        assert (r["error_type"], r["backoff_s"]) == ("rate_limited", 8.0)
        # 503: (2+0) + (2+1) = 5 → other
        r = simulate_fetch(U, 200, [503, 503, 503])
        assert (r["error_type"], r["backoff_s"]) == ("other", 5.0)
        # generic 500: (1+0) + (1+1) = 3 → other
        r = simulate_fetch(U, 200, [500, 500, 500])
        assert (r["error_type"], r["backoff_s"]) == ("other", 3.0)

    def test_transient_then_success(self):
        r = simulate_fetch(U, 200, [503, 200, 200])
        assert r["success"] and r["attempts_used"] == 2
        assert r["backoff_s"] == 2.0
        r = simulate_fetch(U, 200, [429, 429, 200])
        assert r["success"] and r["attempts_used"] == 3
        assert r["backoff_s"] == 8.0

    def test_exception_classes(self):
        cases = [
            (EXC_TIMEOUT, "timeout",
             f"Connection timeout after {MAX_RETRIES} attempts"),
            (EXC_DNS, "dns", "DNS resolution failed - domain may not exist"),
            (EXC_REFUSED, "connection",
             "Connection refused - server may be down"),
            (EXC_UNREACHABLE, "connection", "Network unreachable"),
            (EXC_ENCODING, "other", "Content encoding error: synthetic"),
        ]
        for code, etype, msg in cases:
            r = simulate_fetch(U, 0, [code] * 3)
            assert not r["success"]
            assert r["error_type"] == etype, (code, r)
            assert r["error_message"] == msg
            assert r["status_code"] is None
            assert r["attempts_used"] == 3

    def test_classification_priority_order(self):
        # 'connection timeout' hits timeout BEFORE connection
        assert classify_error("Connection timeout") == "timeout"
        # reason-phrase keywords classify too (408/504 via 'timeout')
        assert classify_error("HTTP 408 - Request Timeout") == "timeout"
        assert classify_error("HTTP 504 - Gateway Timeout") == "timeout"
        assert classify_error("totally new failure") == "other"

    def test_head_availability_tristate(self):
        assert head_availability(200)["available"] is True
        assert head_availability(308)["available"] is True
        assert head_availability(404)["available"] is False
        assert head_availability(500)["available"] is False
        assert head_availability(0)["available"] is None


@pytest.mark.skipif(not os.path.exists(REF), reason="reference absent")
class TestReferenceDifferential:
    @classmethod
    def setup_class(cls):
        with open(REF) as f:
            cls.tree = ast.parse(f.read())
        cls.fns = {
            n.name: n
            for n in ast.walk(cls.tree)
            if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef))
        }

    def _const_list(self, node):
        assert isinstance(node, (ast.List, ast.Tuple))
        return [e.value for e in node.elts if isinstance(e, ast.Constant)]

    def test_error_keyword_chain_matches(self):
        """Lift the if/elif classification chain from
        extract_with_requests (crawler.py:424-446): each branch is
        ``any(err in error_msg.lower() for err in [...])`` guarding
        ``error_type = "<label>"`` — keyword lists AND priority order
        must match ERROR_TYPES exactly."""
        fn = self.fns["extract_with_requests"]
        chain: list[tuple[str, tuple[str, ...]]] = []

        def walk_if(n):
            if not (isinstance(n.test, ast.Call)
                    and getattr(n.test.func, "id", "") == "any"):
                return
            gen = n.test.args[0]
            kws = tuple(self._const_list(gen.generators[0].iter))
            label = None
            for st in n.body:
                if (isinstance(st, ast.Assign)
                        and getattr(st.targets[0], "id", "") == "error_type"):
                    label = st.value.value
            if label:
                chain.append((label, kws))
            for el in n.orelse:
                if isinstance(el, ast.If):
                    walk_if(el)

        for node in ast.walk(fn):
            if isinstance(node, ast.If):
                walk_if(node)
                if chain:
                    break
        assert chain == ERROR_TYPES

    def test_head_status_lists_match(self):
        """check_url_availability (crawler.py:103-134): the available
        and permanent status lists."""
        fn = self.fns["check_url_availability"]
        lists = [
            self._const_list(node.comparators[0])
            for node in ast.walk(fn)
            if isinstance(node, ast.Compare)
            and any(isinstance(op, ast.In) for op in node.ops)
            and isinstance(node.comparators[0], ast.List)
        ]
        assert [200, 301, 302, 303, 307, 308] in lists
        assert [404, 410] in lists

    def test_max_retries_matches(self):
        fn = self.fns["extract_with_requests"]
        vals = [
            st.value.value
            for st in ast.walk(fn)
            if isinstance(st, ast.Assign)
            and getattr(st.targets[0], "id", "") == "max_retries"
            and isinstance(st.value, ast.Constant)
        ]
        assert vals == [MAX_RETRIES]

    def test_skip_prefixes_match(self):
        """Non-HTTP pre-fetch skip (crawler.py:142-151)."""
        fn = self.fns["extract_with_requests"]
        tuples = [
            tuple(self._const_list(c.args[0]))
            for c in ast.walk(fn)
            if isinstance(c, ast.Call)
            and getattr(c.func, "attr", "") == "startswith"
            and c.args
            and isinstance(c.args[0], ast.Tuple)
        ]
        assert ("http://", "https://") in tuples

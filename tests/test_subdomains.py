"""Subdomain search pinned against the reference
(career_pages_service.py:56-77, 86-130, 932-965, 1093-1111).

Pinned fixtures always run; the differential layer EXECUTES the
reference's own ``_safe_domain`` / ``_is_subdomain_of`` bodies (AST-
lifted, ``self`` stripped) over a URL corpus and AST-extracts the
harvest regexes / tag-attribute pairs / fallback tag list for exact
comparison — skipped when the snapshot is absent.
"""

from __future__ import annotations

import ast
import os
import textwrap

import pytest

from crawler_ai_ray.functions.subdomains import (
    FALLBACK_SUBDOMAIN_TAGS,
    HOST_ATTR_TAGS,
    URL_HARVEST_PATTERNS,
    collect_hosts_from_html,
    is_subdomain_of,
    safe_domain,
    subdomain_candidates,
)

REF = "/root/reference/app/services/career_pages_service.py"

HTML = """<html><head>
<link href="https://cdn.acme.vn/style.css" rel="stylesheet">
<script src="//static.acme.vn/app.js"></script>
<script>var api = "https://api.acme.vn/v1"; fetch('{"url": "https://jobs.acme.vn/list"}');</script>
</head><body>
<a href="https://careers.acme.vn/open">Careers</a>
<a href="/about">About</a>
<img src="https://img.other-site.com/x.png">
<iframe src="https://maps.google.com/embed"></iframe>
<form action="https://forms.acme.vn/apply"></form>
<p>Visit https://blog.acme.vn/post or our partner https://partner.io/</p>
</body></html>"""


class TestPinned:
    def test_safe_domain(self):
        assert safe_domain("https://www.acme.vn/x") == ("acme.vn", "acme.vn")
        # ≤2-char TLD keeps THREE labels (reference treats .vn like
        # .com.vn), so a 3-label .vn host is its own root — faithful
        assert safe_domain("https://careers.acme.vn/") == (
            "careers.acme.vn", "careers.acme.vn",
        )
        # ≤2-char TLD keeps three labels (e.g. .com.vn)
        assert safe_domain("https://www.shop.acme.com.vn") == (
            "acme.com.vn", "shop.acme.com.vn",
        )
        # long TLD keeps two
        assert safe_domain("https://deep.sub.acme.com") == (
            "acme.com", "deep.sub.acme.com",
        )
        # schemeless input
        assert safe_domain("acme.io/path") == ("acme.io", "acme.io/path".split("/")[0])

    def test_is_subdomain_of(self):
        assert is_subdomain_of("careers.acme.vn", "acme.vn")
        assert not is_subdomain_of("acme.vn", "acme.vn")
        assert not is_subdomain_of("notacme.vn", "acme.vn")
        assert not is_subdomain_of("acme.vn.evil.com", "acme.vn")

    def test_collect_hosts(self):
        hosts = collect_hosts_from_html(HTML, "https://acme.vn/")
        for h in (
            "cdn.acme.vn", "static.acme.vn", "api.acme.vn", "jobs.acme.vn",
            "careers.acme.vn", "img.other-site.com", "maps.google.com",
            "forms.acme.vn", "blog.acme.vn", "partner.io",
        ):
            assert h in hosts, h
        # relative link resolves to the base host
        assert "acme.vn" in hosts

    def test_candidates_union_and_order(self):
        cands = subdomain_candidates("https://acme.vn/", HTML)
        # discovered subdomains of acme.vn + the 5 fallbacks, sorted set
        assert cands == sorted(
            {
                "https://cdn.acme.vn", "https://static.acme.vn",
                "https://api.acme.vn", "https://jobs.acme.vn",
                "https://careers.acme.vn", "https://forms.acme.vn",
                "https://blog.acme.vn",
                "https://career.acme.vn", "https://tuyen-dung.acme.vn",
                "https://viec-lam.acme.vn",
            }
        )
        # off-root hosts never leak in
        assert not any("other-site" in c or "google" in c for c in cands)

    def test_fallback_only_when_page_has_no_links(self):
        cands = subdomain_candidates("https://acme.vn/", "<html></html>")
        assert cands == sorted(
            f"https://{t}.acme.vn" for t in FALLBACK_SUBDOMAIN_TAGS
        )

    def test_invalid_domain_empty(self):
        assert subdomain_candidates("notadomain", "<html></html>") == []


@pytest.mark.skipif(not os.path.exists(REF), reason="reference absent")
class TestReferenceDifferential:
    @classmethod
    def setup_class(cls):
        with open(REF) as f:
            cls.src = f.read()
        cls.tree = ast.parse(cls.src)
        cls.methods = {
            n.name: n
            for n in ast.walk(cls.tree)
            if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef))
        }

    def _lift(self, name: str):
        """Exec a reference method as a plain function (self stripped)."""
        node = self.methods[name]
        src = textwrap.dedent(ast.get_source_segment(self.src, node))
        src = src.replace(f"def {name}(self, ", f"def {name}(", 1)
        ns: dict = {}
        exec(  # noqa: S102 — executing the reference's own pure code
            compile(src, REF, "exec"),
            {
                "urlparse": __import__("urllib.parse", fromlist=["x"]).urlparse,
                "Tuple": tuple,
                "logger": None,
            },
            ns,
        )
        return ns[name]

    def test_safe_domain_differential(self):
        ref = self._lift("_safe_domain")
        urls = [
            "https://www.acme.vn/x", "https://careers.acme.vn",
            "http://shop.acme.com.vn/a/b", "acme.io", "https://a.b.c.d.com",
            "https://www.x.co.uk/", "https://x.io", "ftp://weird.host.vn/z",
        ]
        for u in urls:
            assert safe_domain(u) == ref(u), u

    def test_is_subdomain_differential(self):
        ref = self._lift("_is_subdomain_of")
        cases = [
            ("careers.acme.vn", "acme.vn"), ("acme.vn", "acme.vn"),
            ("x.acme.vn.", "acme.vn"), ("notacme.vn", "acme.vn"),
            ("a.b.acme.vn", "acme.vn"), ("ACME.VN", "acme.vn"),
        ]
        for c, r in cases:
            assert is_subdomain_of(c, r) == ref(c, r), (c, r)

    def _const_list(self, node):
        return [e.value for e in node.elts if isinstance(e, ast.Constant)]

    def test_harvest_patterns_match(self):
        fn = self.methods["_collect_hosts_from_html"]
        lists = [
            self._const_list(st.value)
            for st in ast.walk(fn)
            if isinstance(st, ast.Assign)
            and getattr(st.targets[0], "id", "") == "url_patterns"
        ]
        assert lists == [URL_HARVEST_PATTERNS]

    def test_tag_attr_pairs_match(self):
        fn = self.methods["_collect_hosts_from_html"]
        pairs = None
        for node in ast.walk(fn):
            if (
                isinstance(node, ast.List)
                and node.elts
                and all(isinstance(e, ast.Tuple) for e in node.elts)
            ):
                pairs = [tuple(self._const_list(e)) for e in node.elts]
                break
        assert pairs == HOST_ATTR_TAGS

    def test_fallback_tags_match(self):
        fn = self.methods["_get_minimal_fallback_patterns"]
        lists = [
            self._const_list(st.value)
            for st in ast.walk(fn)
            if isinstance(st, ast.Assign)
            and getattr(st.targets[0], "id", "") == "career_subdomains"
        ]
        assert lists == [FALLBACK_SUBDOMAIN_TAGS]

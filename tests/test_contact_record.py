"""Contact-record family pinned against the reference
(utils/contact_extractor.py:107-299; contact_extractor_service.py:
56-63, 293-366, 392-409; M38 career_pages_service.py:854-913)."""

from __future__ import annotations

import ast
import os
import re
from typing import Dict, List, Optional, Set
from urllib.parse import unquote, urljoin, urlparse

import pytest

import crawler_ai_ray.functions.contact_record as cr

REF = "/root/reference"

HREFS = [
    "/contact", "//cdn.x.com/a", "mailto:a@b.c", "tel:123", "page.html",
    "https://a.vn/x", "#", "  /about  ", "sub/dir/page", "",
]
URLS = [
    "https://acme.vn/contact", "https://acme.vn/lien-he#x",
    "https://acme.vn/jobs", "https://facebook.com/acme",
    "https://www.linkedin.com/company/acme", "https://acme.vn/gioi-thieu",
    "https://acme.vn/about-us", "https://twitter.com/acme",
]
HTML = (
    'visit facebook.com/acmepage and linkedin.com/company/acme or '
    'youtube.com/channel/UCx github.com/acme "instagram.com/acme\\" '
    "twitter.com/acme>"
)


class TestPinned:
    def test_email_validation(self):
        assert cr.extract_valid_email("write info@acme.vn!") == "info@acme.vn"
        assert cr.extract_valid_email("logo.png@x.com") is None
        assert cr.extract_valid_email("nope") is None

    def test_phone_validation(self):
        # contiguous 10-digit VN number matches the \d{10,11} pattern;
        # '0912 345 678' spacing fits NONE of the reference's three
        # patterns (0+\d{1,2}+3+3+3 digit groups) — rejected there too
        assert cr.extract_valid_phone("call 0901234567") == "0901234567"
        assert cr.extract_valid_phone("0912 345 678") is None
        assert cr.extract_valid_phone("123") is None

    def test_embedded_url_slash_before_protocol_relative(self):
        # the reference's '//' branch is dead code — '/'-prefix wins
        assert (
            cr.extract_embedded_url("//cdn.x.com/a", "acme.vn")
            == "https://acme.vn//cdn.x.com/a"
        )

    def test_contact_forms_sorted(self):
        forms = cr.detect_contact_forms(URLS)
        assert forms == sorted(forms)
        assert "https://acme.vn/lien-he" in forms  # fragment stripped
        assert "https://acme.vn/jobs" not in forms

    def test_social_url_normalization(self):
        assert (
            cr.normalize_social_url("https://facebook.com/facebook.com/x")
            == "https://www.facebook.com/x"
        )
        assert (
            cr.normalize_social_url("linkedin.com/company/acme")
            == "https://www.linkedin.com/company/acme"
        )

    def test_social_findall_group_bug_reproduced(self):
        links = cr.social_media_links(HTML, [])
        # linkedin/youtube patterns capture only the group — truncated
        assert "https://linkedin.com/company" in links
        assert "https://youtube.com/channel" in links
        # facebook pattern has no group → doubled domain, then normalized
        assert "https://www.facebook.com/acmepage" in links

    def test_career_anchor_links(self):
        anchors = [
            ("/careers", "Tuyển dụng"),
            ("/about", "About"),
            ("https://x.vn/jobs", "Jobs here"),
            ("", "careers"),
        ]
        pages, texts, conf = cr.career_anchor_links(
            anchors, "https://acme.vn/"
        )
        assert pages == ["https://acme.vn/careers", "https://x.vn/jobs"]
        assert texts == ["Tuyển dụng", "Jobs here"]
        assert conf == pytest.approx(0.6)


def _lift(path: str, names: set, extra: dict) -> dict:
    src = open(path).read()
    fns = [
        n
        for n in ast.walk(ast.parse(src))
        if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef))
        and n.name in names
    ]

    class _Log:
        def info(self, *a, **k): ...
        def warning(self, *a, **k): ...
        def error(self, *a, **k): ...

    ns = {
        "re": re, "urlparse": urlparse, "urljoin": urljoin,
        "unquote": unquote, "List": List, "Dict": Dict, "Set": Set,
        "Optional": Optional, "logger": _Log(), **extra,
    }
    exec(  # noqa: S102 — test oracle, AST-picked functions
        compile(
            ast.fix_missing_locations(ast.Module(body=fns, type_ignores=[])),
            f"<ref-{os.path.basename(path)}>",
            "exec",
        ),
        ns,
    )
    return ns


def _to_text(x):
    return x if isinstance(x, str) else str(x)


def _norm_url_util(u):
    u = _to_text(u)
    if "#" in u:
        u = u.split("#", 1)[0]
    return u.strip()


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not on disk")
class TestDifferentialVsReference:
    @pytest.fixture(scope="class")
    def ce(self):
        return _lift(
            os.path.join(REF, "app/utils/contact_extractor.py"),
            {
                "extract_valid_email", "extract_valid_phone",
                "extract_embedded_url", "normalize_url",
            },
            {"to_text": _to_text, "SOCIAL_DOMAINS": cr.SOCIAL_DOMAINS},
        )

    @pytest.fixture(scope="class")
    def svc(self):
        ns = _lift(
            os.path.join(REF, "app/services/contact_extractor_service.py"),
            {
                "_detect_contact_forms", "_normalize_social_url",
                "_extract_social_media_enhanced",
            },
            {"normalize_url_util": _norm_url_util},
        )

        class Sv:
            social_patterns = cr.SOCIAL_PATTERNS

        for k in (
            "_detect_contact_forms", "_normalize_social_url",
            "_extract_social_media_enhanced",
        ):
            setattr(Sv, k, ns[k])
        return Sv()

    def test_validators_agree(self, ce):
        for s in [
            "info@acme.vn", "x@y.z", "logo.png@x.com",
            "hr@sub.acme.example.com extra", "not-an-email", "a@b.c",
            "+84 90 123 456 789", "0912 345 678", "call 0241234567 now",
            "123", "19001234567890", "(028) 3823 4567",
        ]:
            assert cr.extract_valid_email(s) == ce["extract_valid_email"](s)
            assert cr.extract_valid_phone(s) == ce["extract_valid_phone"](s)

    def test_url_normalization_agrees(self, ce):
        for h in HREFS:
            for bn in (None, "acme.vn"):
                assert cr.extract_embedded_url(h, bn) == (
                    ce["extract_embedded_url"](h, bn)
                ), (h, bn)
            assert cr.normalize_contact_url(h, "https://acme.vn/") == (
                ce["normalize_url"](h, "https://acme.vn/")
            ), h

    def test_forms_and_social_agree(self, svc):
        assert cr.detect_contact_forms(URLS) == sorted(
            set(svc._detect_contact_forms({"urls": URLS}))
        )
        for s in [
            "facebook.com/acme", "https://facebook.com/facebook.com/acme",
            "https://www.linkedin.com/linkedin.com/x", "instagram.com/y",
            "https://twitter.com/z",
        ]:
            assert cr.normalize_social_url(s) == svc._normalize_social_url(s)
        assert cr.social_media_links(HTML, URLS) == (
            svc._extract_social_media_enhanced(
                {"html": HTML, "urls": URLS}, "https://acme.vn"
            )
        )


class TestFooterContacts:
    def test_footer_node_selection_and_priority(self):
        from crawler_ai_ray.functions.footer_contacts import (
            footer_contact_info,
            merge_contact_priority,
            pick_footer_node,
        )
        from crawler_ai_ray.functions.minidom import build_tree

        html = """<html><body>
        <p>Call 0901234567 in the body — not footer.</p>
        <div class="site-footer">
          <a href="tel:+84 28 3823 4567">Call us</a>
          Hotline: 0912 345 678 — email hr@acme.vn
        </div></body></html>"""
        node = pick_footer_node(build_tree(html))
        assert "site-footer" in (node.attrs.get("class") or "")
        info = footer_contact_info(html)
        # tel: anchor first (cleaned, +84→0), then footer-text phone
        assert info["phones"][0] == "02838234567"
        assert "0912345678" in info["phones"]
        assert "0901234567" not in info["phones"]  # body, not footer
        assert info["emails"] == ["hr@acme.vn"]

        merged = merge_contact_priority(
            {"phones": info["phones"], "emails": [], "social_links": [],
             "contact_forms": []},
            {"phones": ["0901234567"], "emails": [], "social_links": [],
             "contact_forms": []},
        )
        # the reference pushes each priority value to the front one at a
        # time (insert(0, v)), which REVERSES the priority list —
        # faithful port (contact_extractor_service.py:262-265)
        assert merged["phones"] == [
            "0912345678", "02838234567", "0901234567",
        ]

    def test_footer_fallback_last_block(self):
        from crawler_ai_ray.functions.footer_contacts import (
            pick_footer_node,
        )
        from crawler_ai_ray.functions.minidom import build_tree

        node = pick_footer_node(
            build_tree("<div>a</div><section>b</section><div>last</div>")
        )
        assert node.get_text() == "last"

    def test_footer_text_separator_matches_bs4_get_text(self):
        """The reference reads footer text as get_text(" ", strip=True)
        (contact_extractor_service.py:216): every text node stripped,
        empties dropped, joined with ONE space.  Adjacent elements'
        digit runs must therefore NOT concatenate — a bare join would
        merge '2024' with the phone and the (?<!\\d) guard in the VN
        regex would then reject the real number."""
        from crawler_ai_ray.functions.footer_contacts import (
            footer_contact_info,
        )
        from crawler_ai_ray.functions.minidom import build_tree

        html = """<html><body><footer>
        <span>2024</span><span>0901234567</span>
        <p>  hr@x.vn  </p>
        </footer></body></html>"""
        # bs4-equivalent text of the footer: "2024 0901234567 hr@x.vn"
        node = build_tree(html).find("footer")
        assert node.get_text(" ", strip=True) == "2024 0901234567 hr@x.vn"
        info = footer_contact_info(html)
        assert info["phones"] == ["0901234567"]

    def test_get_text_separator_semantics(self):
        """minidom.get_text mirrors bs4: strip each piece BEFORE the
        empty-drop and join; no separator keeps the old concatenation."""
        from crawler_ai_ray.functions.minidom import build_tree

        t = build_tree("<div><b> a </b>\n<i>b</i><u>  </u><s>c</s></div>")
        assert t.get_text(" ", strip=True) == "a b c"
        assert t.get_text(strip=True) == "abc"
        assert t.get_text() == " a \nb  c"

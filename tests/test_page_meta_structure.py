"""M35 page metadata, M4 title/description cascade, and M36 page
structure analysis — pinned semantics (the reference paths are
bs4+network-interleaved, so these are pinned unit oracles; citations in
the operator docstrings map each rule to reference lines)."""

from __future__ import annotations

import pytest

from crawler_ai_ray.functions.htmltext import parse_page
from crawler_ai_ray.functions.page_meta import (
    extract_title_description,
    page_metadata,
)
from crawler_ai_ray.functions.page_structure import (
    analyze_page_structure,
    detect_page_type,
    embedded_job_count,
    find_job_listing_redirect,
    quick_scan_job_urls,
)

HTML = """<html><head><title>Acme</title>
<meta name="description" content="short">
<meta property="og:title" content="Acme OG">
<meta property="og:description" content="OG desc">
<meta name="twitter:card" content="summary">
<meta name="keywords" content="a"><meta name="keywords" content="b">
<script type="application/ld+json">{"@type":"Organization"}</script>
<script type="application/ld+json">not json</script>
<script>var x=1;</script></head>
<body><div class="hero"><p>Hero paragraph with quite a lot of text to
exceed one hundred characters for the longest-paragraph fallback rule
in M4.</p></div>
<p class="intro-text">Intro para</p>
<div class="about-us"><p>About text</p></div>
<a href="/careers/senior-developer">Senior Developer</a>
<a href="/careers">All</a>
<button>View All Jobs</button>
<a href="/jobs/qa-lead">QA Lead</a>
Frontend Developer Apply now
</body></html>"""


class TestM35:
    def test_meta_maps(self):
        md = page_metadata(parse_page(HTML))
        # last-wins per resolved name (routes.py:221)
        assert md["meta_tags"]["keywords"] == "b"
        assert md["og_tags"] == {
            "og:title": "Acme OG", "og:description": "OG desc",
        }
        assert md["twitter_tags"] == {"twitter:card": "summary"}

    def test_structured_data_counts_only_valid_json(self):
        md = page_metadata(parse_page(HTML))
        assert md["n_structured_data"] == 1
        assert md["head_scripts"] == 3

    def test_counts(self):
        md = page_metadata(parse_page(HTML))
        assert md["links"] == 3
        assert md["title_tag"] == "Acme"


class TestM4:
    def test_short_meta_falls_through_to_selectors(self):
        title, desc = extract_title_description(parse_page(HTML))
        assert title == "Acme"
        # .hero p candidate is longest among selector matches
        assert desc.startswith("Hero paragraph")

    def test_long_meta_description_wins(self):
        html = (
            '<html><head><title>T</title><meta name="description" '
            'content="' + "x" * 60 + '"></head><body><p>'
            + "y" * 200 + "</p></body></html>"
        )
        _, desc = extract_title_description(parse_page(html))
        assert desc == "x" * 60

    def test_paragraph_concat_fallback(self):
        paras = "".join(
            f"<p>{'word ' * 15}p{i}</p>" for i in range(5)
        )
        html = f"<html><body>{paras}</body></html>"
        _, desc = extract_title_description(parse_page(html))
        assert "p0" in desc and len(desc) > 100


class TestM36:
    def test_quick_scan_rejects_roots_and_dedups(self):
        urls = quick_scan_job_urls(
            "https://a.vn/careers/",
            ["/careers/senior-developer", "/careers", "/jobs/qa-lead",
             "/jobs/qa-lead#apply", "mailto:x@y.z"],
        )
        assert urls == [
            "https://a.vn/careers/senior-developer",
            "https://a.vn/jobs/qa-lead",
        ]

    def test_embedded_patterns(self):
        assert embedded_job_count("Java Developer Apply today") == 1
        assert embedded_job_count("nothing here") == 0

    def test_analyze_hybrid(self):
        f = parse_page(HTML)
        a = analyze_page_structure(
            "https://a.vn/careers/",
            [h for h, _ in f.anchors],
            "".join(f.all_pieces),
        )
        assert a["page_type"] == "hybrid"
        # M15 deliberately lacks '/careers/' → only /jobs/ URL validates
        assert a["individual_urls_found"] == 1
        assert a["embedded_jobs_found"] >= 1

    def test_detect_type_role_suffix(self):
        assert (
            detect_page_type(
                "https://a.vn/careers/", ["/careers/senior-developer"]
            )
            == "individual_urls"
        )
        assert (
            detect_page_type("https://a.vn/careers/", ["/careers/page2"])
            == "embedded_jobs"
        )
        assert detect_page_type("https://a.vn/x", ["/about"]) == "unknown"

    def test_listing_redirect(self):
        f = parse_page(HTML)
        assert (
            find_job_listing_redirect("https://a.vn/", f.clickables)
            == "https://a.vn/careers/senior-developer"
        )
        # ≥5 job links → already a listing page, no redirect
        many = [("a", f"/careers/job-{i}", f"Job {i}") for i in range(5)]
        assert find_job_listing_redirect("https://a.vn/", many) is None


class TestM6NavLinks:
    def test_nav_priority_and_filter(self):
        from crawler_ai_ray.functions.page_structure import (
            extract_all_links_nav,
        )

        html = """<html><body>
        <nav><a href="/careers">Careers</a><a href="/about">About</a></nav>
        <div class="menu"><a href="/tuyen-dung">TD</a></div>
        <footer><a href="/contact">C</a></footer>
        <a href="/blog/post">Blog</a>
        <a href="#frag">x</a>
        <a href="mailto:a@b.c">m</a>
        <a href="https://other.com/x">ext</a>
        <a href="/jobs">Jobs</a></body></html>"""
        links = extract_all_links_nav(html, "a.vn")
        # nav links first, then footer, then the rest; invalid dropped
        assert links[0] == "/careers"
        assert "/tuyen-dung" in links[:3]
        assert "#frag" not in links and "mailto:a@b.c" not in links
        assert "https://other.com/x" not in links
        assert "/jobs" in links


class TestA4Confidence:
    def test_formula(self):
        from crawler_ai_ray.functions.merge_ops import detection_confidence

        assert detection_confidence(0, 0, 0) == 0.0
        assert detection_confidence(1, 1, 10) == pytest.approx(
            0.3 + 0.1 + 0.1
        )
        assert detection_confidence(10, 10, 1000) == 1.0

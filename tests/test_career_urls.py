"""M11/M12 URL-only career classifiers pinned against the reference.

Two layers:

* hard-pinned expectations on a fixed URL set (always run), so the
  semantics stay pinned even where ``/root/reference`` is absent;
* a differential sweep that EXECUTES the reference's own pure functions
  (``career_detector.py`` function defs + ``_analyze_url_for_career``
  lifted out of ``career_pages_service.py``) over a 170+-URL corpus and
  asserts field-exact agreement — skipped when the reference snapshot is
  not on disk.
"""

from __future__ import annotations

import ast
import os
import re
from typing import Dict, List, Tuple
from urllib.parse import urlparse

import pytest

from crawler_ai_ray.functions.career_urls import (
    CAREER_KEYWORDS_VI,
    JOB_BOARD_DOMAINS,
    career_url_confidence,
    strict_filter_accepts,
)

REF = "/root/reference"

HOSTS = [
    "acme.example.com",
    "careers.acme.example.com",
    "jobs.beta.vn",
    "topcv.vn",
    "www.gamma.io",
    "tech-corp.dev",
]
PATHS = [
    "/", "", "/careers", "/careers/", "/tuyen-dung",
    "/careers/senior-engineer", "/blog/2024/01/post", "/about/contact",
    "/jobs?page=2", "/viec-lam/hanoi", "/careers/our-culture",
    "/product/widget", "/news/article-12345", "/co-hoi-nghe-nghiep",
    "/join-us", "/careers/benefits", "/recruitment/apply",
    "/a/b/c/d/e/f", "/careers/opening-positions", "/it/jobs", "/dev/",
    "/x.pdf", "/sitemap.xml", "/job/123456", "/job/abc1234def",
    "/tuyendung-developer", "/hiring?job=1&career=2",
    "/positions/remote-ml", "/index.html",
]
URLS = [f"https://{h}{p}" for h in HOSTS for p in PATHS] + [
    "ftp://x.com/careers",
    "https://acme.example.com/careers#frag",
]


class TestPinnedM11:
    def test_career_subdomain_short_circuit(self):
        r = career_url_confidence("https://careers.acme.vn/anything/deep")
        assert r["is_career_page"] and r["confidence"] == 2.0
        assert r["n_indicators"] == 1

    def test_homepage_rejected(self):
        for u in ("https://a.vn/", "https://a.vn", "https://a.vn/index.html"):
            r = career_url_confidence(u)
            assert r["rejection_reason"] == "Homepage - not a career page"
            assert not r["is_career_page"]

    def test_xml_and_non_http(self):
        assert (
            career_url_confidence("https://a.vn/sitemap.xml")["rejection_reason"]
            == "XML/sitemap content - not a career page"
        )
        assert (
            career_url_confidence("ftp://a.vn/careers")["rejection_reason"]
            == "Non-HTTP URL"
        )

    def test_path_too_deep_keeps_zero_indicators(self):
        # reference returns before assigning analysis['indicators']
        # (career_pages_service.py:419-421)
        r = career_url_confidence("https://a.vn/careers/a/b/c/d/e")
        assert r["rejection_reason"] == "Path too deep"
        assert r["n_indicators"] == 0

    def test_strong_penalty_sets_rejection(self):
        r = career_url_confidence("https://a.vn/product/widget")
        assert r["rejection_reason"] == "Strong non-career pattern: /product"

    def test_careers_page_accepted(self):
        r = career_url_confidence("https://acme.example.com/careers")
        # exact kw 'careers'+'career' (+2.0), patterns /career,/careers
        # (+2.4), shallow (+0.2)
        assert r["is_career_page"]
        assert r["confidence"] == pytest.approx(4.6)


class TestPinnedM12:
    def test_clean_career_path_accepted(self):
        ok, score = strict_filter_accepts("https://acme.vn/careers")
        assert ok and score >= 8

    def test_homepage_and_deep_rejected(self):
        assert strict_filter_accepts("https://acme.vn/") == (False, 0)
        assert strict_filter_accepts("https://acme.vn/a/b/c/d") == (False, 0)

    def test_job_detail_page_rejected(self):
        # depth>1 + '/job/' indicator → early rejection
        assert strict_filter_accepts("https://acme.vn/jobs/dev-role") == (
            False,
            0,
        )

    def test_non_career_indicator_rejected(self):
        assert strict_filter_accepts("https://acme.vn/blog-careers") == (
            False,
            0,
        )


# ---------------------------------------------------------------------------
# differential sweep vs the reference's own code
# ---------------------------------------------------------------------------

def _load_ref_detector():
    """Exec the pure function defs out of career_detector.py (AST-picked;
    no imports from the reference are executed)."""
    cns: dict = {}
    consts = os.path.join(REF, "app/utils/constants.py")
    for node in ast.parse(open(consts).read()).body:
        if isinstance(node, ast.Assign) and isinstance(
            node.targets[0], ast.Name
        ):
            try:
                cns[node.targets[0].id] = ast.literal_eval(node.value)
            except ValueError:
                pass
    src = open(os.path.join(REF, "app/services/career_detector.py")).read()
    keep = [
        n
        for n in ast.parse(src).body
        if isinstance(n, ast.FunctionDef)
        and n.name
        in (
            "analyze_url_structure",
            "check_early_rejection",
            "calculate_career_score",
            "_is_homepage",
        )
    ]
    ns = {
        "re": re,
        "urlparse": urlparse,
        "List": List,
        "Dict": Dict,
        "Tuple": Tuple,
        "any": any,
        "STRONG_NON_CAREER_INDICATORS": cns["STRONG_NON_CAREER_INDICATORS"],
        "CAREER_KEYWORDS_VI": cns["CAREER_KEYWORDS_VI"],
        "CAREER_EXACT_PATTERNS": cns["CAREER_EXACT_PATTERNS"],
    }
    exec(  # noqa: S102 — test oracle, AST-picked pure functions
        compile(
            ast.fix_missing_locations(ast.Module(body=keep, type_ignores=[])),
            "<ref-career-detector>",
            "exec",
        ),
        ns,
    )
    return ns, cns


def _load_ref_m11(is_homepage):
    """Lift _analyze_url_for_career out of its class into a plain fn."""
    svc = open(
        os.path.join(REF, "app/services/career_pages_service.py")
    ).read()
    m = re.search(
        r"    async def _analyze_url_for_career.*?(?=\n    (?:async )?def )",
        svc,
        re.S,
    )
    body = (
        m.group(0)
        .replace("async def", "def")
        .replace(
            "self, url: str, base_url: str, strict_filtering: bool",
            "url, career_keywords, job_board_domains",
        )
        .replace(
            "self._is_xml_response(url)",
            "url.lower().endswith(('.xml', '.rss', '.atom'))",
        )
        .replace("self._is_homepage(url)", "_is_homepage(url)")
        .replace("self.career_keywords", "career_keywords")
        .replace("self.job_board_domains", "job_board_domains")
        .replace("logger.error", "print")
    )
    body = "\n".join(
        line[4:] if line.startswith("    ") else line
        for line in body.split("\n")
    )
    ns = {"urlparse": urlparse, "_is_homepage": is_homepage, "Dict": Dict,
          "re": re}
    exec(body, ns)  # noqa: S102
    return ns["_analyze_url_for_career"]


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not on disk")
class TestDifferentialVsReference:
    def test_m11_and_m12_agree_on_sweep(self):
        ns, cns = _load_ref_detector()
        ref_m11 = _load_ref_m11(ns["_is_homepage"])
        ck = CAREER_KEYWORDS_VI + [
            "career", "careers", "jobs", "employment", "work-with-us",
            "join-us", "opportunities", "vacancies", "positions",
            "tuyen-dung", "viec-lam", "co-hoi", "tuyen-nhan-vien",
        ]
        jb = list(JOB_BOARD_DOMAINS) + [
            "jobs.vn", "careerlink.vn", "topcv.vn", "mywork.vn",
            "indeed.com", "linkedin.com/jobs", "glassdoor.com",
        ]

        def ref_m12(url: str) -> Tuple[bool, int]:
            if ns["_is_homepage"](url):
                return (False, 0)
            ua = ns["analyze_url_structure"](url)
            rej, _ = ns["check_early_rejection"](url, ua)
            if rej:
                return (False, 0)
            score, _ = ns["calculate_career_score"](url, ua)
            p = ua["path"]
            ok = (
                score >= 8
                and any(pat in p for pat in cns["CAREER_EXACT_PATTERNS"])
                and ua["path_depth"] <= 4
                and not any(
                    [
                        re.search(r"/\d{4}", p),
                        re.search(r"/[a-f0-9]{8,}", p),
                        re.search(r"/\d{5,}", p),
                    ]
                )
            )
            return (ok, score)

        for u in URLS:
            mine = career_url_confidence(u)
            ref = ref_m11(u, career_keywords=ck, job_board_domains=jb)
            assert mine["confidence"] == pytest.approx(
                ref["confidence"], abs=1e-9
            ), u
            assert mine["is_career_page"] == ref["is_career_page"], u
            assert mine["is_potential"] == ref["is_potential"], u
            assert mine["rejection_reason"] == ref["rejection_reason"], u
            assert mine["n_indicators"] == len(ref["indicators"]), u
            assert strict_filter_accepts(u) == ref_m12(u), u

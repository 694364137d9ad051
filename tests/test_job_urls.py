"""M14–M17 + M37 job-URL family pinned against the reference.

Same two-layer strategy as ``test_career_urls.py``: hard-pinned
expectations that always run, plus a differential sweep that executes
the reference's own method bodies (AST-picked out of
``job_extraction_service.py``) when the snapshot is on disk.
"""

from __future__ import annotations

import ast
import asyncio
import os
import re
from typing import List
from urllib.parse import urlparse

import pytest

from crawler_ai_ray.functions.job_urls import (
    is_career_page_url,
    is_job_url_service,
    is_pagination_url,
    is_valid_job_url_pattern,
    pagination_candidates,
    validate_job_urls,
)

REF = "/root/reference"

HOSTS = [
    "acme.example.com",
    "careers.acme.example.com",
    "jobs.beta.vn",
    "www.gamma.io",
]
PATHS = [
    "/", "", "/careers", "/careers/", "/jobs/senior-developer", "/job/123",
    "/tuyen-dung/ky-su", "/blog/post", "/about", "/x.pdf", "/sitemap.xml",
    "/careers/our-culture", "/product/widget", "/position/qa-lead",
    "/opening/", "/team", "/vi-tri/ba", "/random-page", "/a/b",
    "/news?page=3", "/careers?paged=2", "/page/4/", "/load/more", "/jobs",
    "/positions", "/remote/dev#apply", "/detail/5",
]
URLS = [f"https://{h}{p}" for h in HOSTS for p in PATHS] + [
    "javascript:void(0)", "mailto:x@y.z", "#top", "ftp://a/b", "",
]


class TestPinned:
    def test_m14_job_pattern_accepts(self):
        assert is_job_url_service("https://a.vn/jobs/senior-dev")
        assert is_job_url_service("https://a.vn/tuyen-dung/ky-su")

    def test_m14_career_root_rejected(self):
        assert not is_job_url_service("https://a.vn/careers")
        assert not is_job_url_service("https://a.vn/careers/")
        assert not is_job_url_service("https://a.vn/jobs")

    def test_m14_permissive_default(self):
        # no job pattern, but no non-job pattern either → accept
        assert is_job_url_service("https://a.vn/random-page")
        assert not is_job_url_service("https://a.vn/blog/post")

    def test_m15_requires_detail_pattern(self):
        assert is_valid_job_url_pattern("https://a.vn/job/123")
        assert not is_valid_job_url_pattern("https://a.vn/careers")
        assert not is_valid_job_url_pattern(
            "https://a.vn/careers/opening-positions"
        )

    def test_m17_subdomain_and_suffix(self):
        assert is_career_page_url("https://careers.a.vn/whatever")
        assert is_career_page_url("https://a.vn/careers")
        assert not is_career_page_url("https://a.vn/careers/senior-developer")

    def test_m37_pagination(self):
        assert is_pagination_url("https://a.vn/careers?page=2")
        assert not is_pagination_url("https://a.vn/careers")
        cands = pagination_candidates("https://a.vn/careers")
        assert len(cands) == 9
        assert cands[0] == "https://a.vn/careers?paged=2"
        assert cands[-1] == "https://a.vn/careers?paged=10"

    def test_m16_filters(self):
        career = "https://a.vn/careers"
        urls = [
            career,
            "https://a.vn/job/1",
            "https://a.vn/job/2#x",
            "https://a.vn/job/load/3",
            "https://a.vn/product/job/",
            "https://a.vn/blog",
        ]
        assert validate_job_urls(urls, career) == ["https://a.vn/job/1"]


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not on disk")
class TestDifferentialVsReference:
    @pytest.fixture(scope="class")
    def ref_svc(self):
        src = open(
            os.path.join(REF, "app/services/job_extraction_service.py")
        ).read()
        wanted = {
            "_is_job_url", "_is_http_url", "_is_valid_job_url_pattern",
            "_is_career_page_url", "_is_pagination_url",
            "_validate_job_urls", "_detect_pagination_urls",
        }
        fns = [
            n
            for n in ast.walk(ast.parse(src))
            if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef))
            and n.name in wanted
        ]

        class _Log:
            def info(self, *a, **k): ...
            def warning(self, *a, **k): ...
            def error(self, *a, **k): ...

        ns = {"urlparse": urlparse, "List": List, "logger": _Log(),
              "re": re}
        exec(  # noqa: S102 — test oracle, AST-picked methods
            compile(
                ast.fix_missing_locations(
                    ast.Module(body=fns, type_ignores=[])
                ),
                "<ref-job-urls>",
                "exec",
            ),
            ns,
        )

        class Svc:
            pass

        for name in wanted:
            setattr(Svc, name, ns[name])
        return Svc()

    def test_predicates_agree_on_sweep(self, ref_svc):
        for u in URLS:
            assert is_job_url_service(u) == ref_svc._is_job_url(u), u
            assert is_valid_job_url_pattern(u) == (
                ref_svc._is_valid_job_url_pattern(u)
            ), u
            assert is_career_page_url(u) == ref_svc._is_career_page_url(u), u
            assert is_pagination_url(u) == ref_svc._is_pagination_url(u), u

    def test_pagination_generator_agrees(self, ref_svc):
        for u in URLS:
            if not u.startswith("http"):
                continue
            assert pagination_candidates(u) == asyncio.run(
                ref_svc._detect_pagination_urls(u)
            ), u

    def test_validate_job_urls_agrees(self, ref_svc):
        career = f"https://{HOSTS[0]}/careers"
        urls = [f"https://{HOSTS[0]}{p}" for p in PATHS]
        assert validate_job_urls(urls, career) == ref_svc._validate_job_urls(
            urls, career
        )

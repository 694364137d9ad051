"""S9 sitemap reader, M31 API-job parser, D3 job normalization, J1
enrichment merge, J2 prefer-source merge — pinned semantics plus a
differential sweep for the reference-exec-able parts."""

from __future__ import annotations

import ast
import os
import re
from typing import Dict, List
from urllib.parse import urlparse

import pytest

from crawler_ai_ray.functions.api_jobs import parse_api_job_data
from crawler_ai_ray.functions.merge_ops import (
    apply_enrichment,
    career_page_priority,
    merge_detection_results,
    normalize_jobs,
)
from crawler_ai_ray.functions.sitemap import (
    filter_job_locs,
    parse_sitemap_locs,
)

REF = "/root/reference"

SITEMAP = """<?xml version="1.0"?>
<urlset><url><loc>https://a.vn/careers</loc></url>
<url><loc> https://a.vn/blog/post-1 </loc></url>
<url><loc>https://a.vn/tuyen-dung/ky-su</loc></url>
<url><loc>https://a.vn/about</loc></url></urlset>"""

API_PAYLOADS = [
    {"jobs": [{"title": "Dev", "url": "/j/1"}]},
    {"data": {"jobs": [{"name": "QA", "link": "https://a.vn/j/2"}]}},
    {"results": [{"position": "BA", "apply_url": "/j/3",
                  "city": "Hanoi"}]},
    {"items": [{"job_title": "PM"}]},
    [{"title": "Ops", "employment_type": "Contract"}],
    {"title": "Solo", "description": "d"},
    {"jobs": "not-a-list"},
    {"unrelated": 1},
]


class TestSitemap:
    def test_locs_parsed_and_stripped(self):
        locs = parse_sitemap_locs(SITEMAP)
        assert len(locs) == 4
        assert locs[1] == "https://a.vn/blog/post-1"

    def test_job_filter(self):
        jobs = filter_job_locs(parse_sitemap_locs(SITEMAP))
        assert jobs == [
            "https://a.vn/careers", "https://a.vn/tuyen-dung/ky-su",
        ]


class TestApiJobs:
    def test_shapes_and_aliases(self):
        base = "https://a.vn/api"
        out0 = parse_api_job_data(API_PAYLOADS[0], base)
        assert out0[0]["title"] == "Dev"
        assert out0[0]["url"] == "https://a.vn/api/j/1"  # relative join
        out1 = parse_api_job_data(API_PAYLOADS[1], base)
        assert out1[0]["title"] == "QA"
        assert out1[0]["url"] == "https://a.vn/j/2"
        out2 = parse_api_job_data(API_PAYLOADS[2], base)
        assert out2[0]["location"] == "Hanoi"
        # no title-alias hit in shape 4's item? job_title IS an alias
        assert parse_api_job_data(API_PAYLOADS[3], base)[0]["title"] == "PM"
        assert parse_api_job_data(API_PAYLOADS[4], base)[0]["job_type"] == (
            "Contract"
        )
        # single-object shape wraps itself
        assert parse_api_job_data(API_PAYLOADS[5], base)[0]["title"] == (
            "Solo"
        )
        assert parse_api_job_data(API_PAYLOADS[6], base) == []
        assert parse_api_job_data(API_PAYLOADS[7], base) == []


class TestNormalizeJobs:
    def test_suffix_cleanup_and_dedup(self):
        jobs = [
            {"title": "Java Developer Singapore Only", "description": ""},
            {"title": "Java Developer", "description": ""},
            {"title": "com Python Dev", "description": ""},
            {"title": "   ", "description": ""},
        ]
        out = normalize_jobs(jobs)
        assert [j["title"] for j in out] == ["Java Developer", "Python Dev"]

    def test_location_inference(self):
        out = normalize_jobs(
            [{"title": "Dev", "description": "work Fully Remote ok",
              "location": ""}]
        )
        assert out[0]["location"] == "Fully Remote"
        out = normalize_jobs(
            [{"title": "Dev", "description": "remote work",
              "location": "Hanoi"}]
        )
        assert out[0]["location"] == "Hanoi"  # only fills when missing


class TestMerges:
    def test_apply_enrichment(self):
        phones, title = apply_enrichment(
            ["0901"], {"phone": "0902", "title": "Acme Corp"}
        )
        assert phones == ["0901", "0902"] and title == "Acme Corp"
        phones, _ = apply_enrichment(["0902"], {"phone": "0902"})
        assert phones == ["0902"]
        assert apply_enrichment(["1"], None) == (["1"], "")

    def test_priority(self):
        assert career_page_priority("https://a.vn/jobs/x") == 1
        assert career_page_priority("https://a.vn/careers") == 3
        # the reference's priority-2 equality arm can't fire on
        # absolute URLs — faithful port
        assert career_page_priority("https://a.vn/career/") == 3

    def test_merge_prefers_primary_and_cuts_top3(self):
        primary = [f"https://a.vn/careers/p{i}" for i in range(4)]
        assert len(merge_detection_results(primary, ["https://a.vn/x"])) == 3
        out = merge_detection_results(
            [], ["https://a.vn/", "https://a.vn/careers"]
        )
        assert out == ["https://a.vn/careers"]  # homepage filtered
        # priority-1 page sorts first
        out = merge_detection_results(
            ["https://a.vn/careers", "https://a.vn/jobs/all"], []
        )
        assert out[0] == "https://a.vn/jobs/all"


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not on disk")
class TestDifferentialVsReference:
    def test_api_parser_agrees(self):
        src = open(
            os.path.join(REF, "app/services/job_extraction_service.py")
        ).read()
        fns = [
            n
            for n in ast.walk(ast.parse(src))
            if isinstance(n, ast.FunctionDef)
            and n.name == "_parse_api_job_data"
        ]

        class _Log:
            def info(self, *a, **k): ...
            def error(self, *a, **k): ...

        ns = {"List": List, "Dict": Dict, "logger": _Log(), "re": re,
              "urlparse": urlparse}
        exec(  # noqa: S102
            compile(
                ast.fix_missing_locations(
                    ast.Module(body=fns, type_ignores=[])
                ),
                "<ref-api>", "exec",
            ),
            ns,
        )
        ref = ns["_parse_api_job_data"]
        for payload in API_PAYLOADS:
            assert parse_api_job_data(payload, "https://a.vn/api") == ref(
                None, payload, "https://a.vn/api"
            ), payload

    def test_normalize_jobs_agrees(self):
        src = open(
            os.path.join(REF, "app/services/job_extraction_service.py")
        ).read()
        fns = [
            n
            for n in ast.walk(ast.parse(src))
            if isinstance(n, ast.FunctionDef) and n.name == "_normalize_jobs"
        ]
        ns = {"List": List, "Dict": Dict, "re": re}
        exec(  # noqa: S102
            compile(
                ast.fix_missing_locations(
                    ast.Module(body=fns, type_ignores=[])
                ),
                "<ref-norm>", "exec",
            ),
            ns,
        )
        ref = ns["_normalize_jobs"]
        jobs = [
            {"title": "Java Developer Singapore Only", "description": "",
             "location": ""},
            {"title": "Java Developer", "description": "", "location": ""},
            {"title": "com Python Dev See Details",
             "description": "Fully Remote role", "location": ""},
            {"title": "QA  Lead   Remote", "description": "",
             "location": "Hanoi"},
            {"title": "", "description": "x", "location": ""},
        ]
        import copy

        assert normalize_jobs(copy.deepcopy(jobs)) == ref(
            None, copy.deepcopy(jobs)
        )

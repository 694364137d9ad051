"""Rule-based job validation + response formatting pinned against the
reference (job_extraction_service.py:1023-1279)."""

from __future__ import annotations

import ast
import asyncio
import os
import re
from typing import Dict, Optional

import pytest

import crawler_ai_ray.functions.job_validation as jv

REF = "/root/reference"

JOBS = [
    {"title": "Senior Python Developer",
     "description": "Responsibilities: build things. Requirements: 5 years "
                    "experience. Salary: competitive. Apply now.",
     "job_type": "full-time", "location": "Hanoi", "salary": ""},
    {"title": "About us",
     "description": "Our story and company overview for everyone to read",
     "job_type": "", "location": "", "salary": ""},
    {"title": "QA Lead", "description": "Short",
     "job_type": "", "location": "", "salary": ""},
    {"title": "Thực tập sinh Marketing",
     "description": "Mô tả công việc: hỗ trợ team. Yêu cầu: sinh viên năm "
                    "cuối. Quyền lợi tốt.",
     "job_type": "", "location": "", "salary": ""},
    {"title": "Nothing here", "description": "x" * 50,
     "job_type": "", "location": "", "salary": ""},
    {"title": "Manager",
     "description": "Just a plain long paragraph about nothing in "
                    "particular that runs for a while.",
     "job_type": "", "location": "", "salary": ""},
    {"title": "", "description": "", "job_type": "", "location": "",
     "salary": ""},
]
URLS = [
    "https://a.vn/jobs/dev-1", "https://a.vn/about-us",
    "https://a.vn/jobs/qa#job-7", "https://a.vn/tuyen-dung/ts",
    "https://a.vn/x", "https://a.vn/y", "https://a.vn/z",
]


class TestPinned:
    def test_url_pattern_reject(self):
        ok, reason = jv.validate_job(JOBS[0], "https://a.vn/about-us")
        assert not ok and reason.startswith("url:")

    def test_critical_keyword_reject(self):
        ok, reason = jv.validate_job(JOBS[1], "https://a.vn/p")
        assert not ok and reason.startswith("critical:")

    def test_strong_indicators_accept(self):
        ok, reason = jv.validate_job(JOBS[0], "https://a.vn/jobs/dev-1")
        assert ok and reason.startswith("strong_indicators")

    def test_job_like_title_zero_indicators(self):
        ok, reason = jv.validate_job(JOBS[4], "https://a.vn/x")
        # 'Nothing here' has no job-title keyword → reject
        assert not ok
        # 'assistant' is both a title keyword AND a positive indicator
        # (content includes the title), so this lands in the ≥1 branch
        ok, reason = jv.validate_job(
            {"title": "Office Assistant", "description": "y" * 40},
            "https://a.vn/x",
        )
        assert ok and reason.startswith("job_like_title")

    def test_format_flags_invalid_and_infers_index(self):
        resp = jv.format_job_response(
            {"title": "", "description": ""}, "https://a.vn/jobs/qa#job-7"
        )
        assert not resp["success"]
        assert resp["job_index"] == 7
        assert resp["crawl_method"] == "failed"
        resp = jv.format_job_response(JOBS[0], "https://a.vn/jobs/dev-1")
        assert resp["success"] and resp["job_index"] == 1
        assert len(resp["job_description"]) <= 304

    def test_empty_response(self):
        r = jv.empty_job_response("https://a.vn/jobs#job-3")
        assert not r["success"] and r["job_index"] == 3


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not on disk")
class TestDifferentialVsReference:
    @pytest.fixture(scope="class")
    def svc(self):
        src = open(
            os.path.join(REF, "app/services/job_extraction_service.py")
        ).read()
        names = {
            "_validate_job_with_ai", "_format_job_response",
            "_empty_job_response", "_summarize_description",
        }
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

        ns = {"Dict": Dict, "Optional": Optional, "logger": _Log(),
              "re": re}
        exec(  # noqa: S102 — test oracle
            compile(
                ast.fix_missing_locations(
                    ast.Module(body=fns, type_ignores=[])
                ),
                "<ref-validate>", "exec",
            ),
            ns,
        )

        class Svc:
            pass

        for n in names:
            setattr(Svc, n, ns[n])
        return Svc()

    def test_agrees_on_sweep(self, svc):
        for j, u in zip(JOBS, URLS):
            assert jv.validate_job(j, u)[0] == asyncio.run(
                svc._validate_job_with_ai(dict(j), u)
            ), (j["title"], u)
            assert jv.format_job_response(dict(j), u) == (
                svc._format_job_response(dict(j), u)
            ), j["title"]
            assert jv.empty_job_response(u) == svc._empty_job_response(u)

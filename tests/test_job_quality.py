"""Job enrichment + analyzer family pinned against the reference
(job_extraction_service.py:536-660, 1955-2015; job_analyzer.py:356-498).

Hard-pinned cases always run; the differential sweep execs the
reference's own method bodies when the snapshot is on disk.
"""

from __future__ import annotations

import ast
import os
import random
import re
from datetime import datetime
from typing import Dict, List, Optional, Tuple
from urllib.parse import urlparse

import pytest

import crawler_ai_ray.functions.job_quality as jq

REF = "/root/reference"

TITLES = [
    "Senior Java Developer", "junior QA tester", "Data Scientist",
    "Team Lead Backend", "principal architect", "Marketing Specialist",
    "Fresh Graduate Program", "Mid level Designer", "hr manager",
    "accountant", "mobile developer react native", "",
    "Operations Analyst 3-5 years",
]
DESCS = [
    "We are hiring. Lương: 20 triệu. Posted: 12/03/2024. Work in Hà Nội.",
    "salary: $3000\nYêu cầu:\n- 5+ years python, django\n- aws docker\n"
    "Quyền lợi:\n- bonus\n- 13th month",
    "Remote work from home. up to: 50m VND. 3 days ago posted",
    "Mô tả:\nBuild react angular apps\nRequirements\n- kubernetes "
    "experience\nBenefits\n- insurance",
    "plain text no extras",
    "",
    "ngày đăng: 01/01/2024 làm việc tại tp.hcm javascript typescript",
    "Posted 14 days ago. elk stack, github actions, c++ and c#",
]


class TestPinned:
    def test_posted_date_patterns(self):
        assert jq.extract_posted_date("Ngày đăng: 12/03/2024") == "12/03/2024"
        assert jq.extract_posted_date("posted 5/6/2023 here") == "5/6/2023"
        assert jq.extract_posted_date("no date") is None

    def test_requirements_benefits_state_machine(self):
        req, ben = jq.extract_requirements_benefits(DESCS[1])
        assert req == "- 5+ years python, django\n- aws docker"
        assert ben == "- bonus\n- 13th month"

    def test_salary_first_pattern_wins(self):
        assert (
            jq.extract_salary_from_description("Lương up to: 25 triệu, deal")
            == "25 triệu"
        )
        assert jq.extract_salary_from_description("salary: $3000") == "$3000"

    def test_job_type_normalization(self):
        assert jq.normalize_job_type_service("Toàn thời gian") == "full-time"
        assert jq.normalize_job_type_service("") == "Full-time"
        assert jq.normalize_job_type_service("weird") == "weird"

    def test_enhance_company_fallback(self):
        out = jq.enhance_job(
            {"title": "x", "company": ""}, "https://acme.example.com/careers"
        )
        assert out["company"] == "Acme"

    def test_quality_weights(self):
        job = {
            "title": "Senior Developer", "description": "python developer",
            "location": "Hanoi", "company": "Acme", "job_type": "full-time",
            "salary": "", "posted_date": "3 days ago",
        }
        q = jq.quality_scores(job)
        assert q["completeness"] == pytest.approx(1.0 * 0.8 + 0.2 * 0.2)
        assert q["freshness"] == 1.0
        assert 0 < q["relevance"] < 1
        assert q["overall"] == pytest.approx(
            min(
                1.0,
                q["completeness"] * 0.4
                + q["relevance"] * 0.4
                + q["freshness"] * 0.2,
            )
        )

    def test_level_and_category(self):
        assert jq.extract_job_level("Senior Java Developer") == "SENIOR"
        assert jq.extract_job_level("junior dev") == "JUNIOR"
        assert jq.extract_job_level("CTO") == "UNKNOWN"
        assert jq.categorize_job("Backend Developer") == "ENGINEERING"
        assert jq.categorize_job("recruiter") == "HR"
        assert jq.categorize_job("poet") == "OTHER"

    def test_matches_posted_date_fixed_timedelta(self):
        now = datetime(2024, 6, 1)
        assert jq.matches_posted_date("30/05/2024", "last_week", now)
        assert not jq.matches_posted_date("01/01/2024", "last_month", now)
        assert jq.matches_posted_date("garbage", "last_week", now)
        assert jq.matches_posted_date("", "last_week", now)


def _lift(path: str, names: set, extra_ns: dict) -> dict:
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
        "re": re, "urlparse": urlparse, "List": List, "Dict": Dict,
        "Optional": Optional, "Tuple": Tuple, "logger": _Log(),
        "tuple": tuple, **extra_ns,
    }
    exec(  # noqa: S102 — test oracle, AST-picked methods
        compile(
            ast.fix_missing_locations(ast.Module(body=fns, type_ignores=[])),
            f"<ref-{os.path.basename(path)}>",
            "exec",
        ),
        ns,
    )
    return ns


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not on disk")
class TestDifferentialVsReference:
    @pytest.fixture(scope="class")
    def analyzer(self):
        cns = {}
        consts = os.path.join(REF, "app/utils/job_constants.py")
        for node in ast.parse(open(consts).read()).body:
            if isinstance(node, ast.Assign) and isinstance(
                node.targets[0], ast.Name
            ):
                try:
                    cns[node.targets[0].id] = ast.literal_eval(node.value)
                except ValueError:
                    pass
        names = {
            "extract_technologies", "extract_job_level", "categorize_job",
            "calculate_quality_scores", "calculate_completeness_score",
            "calculate_relevance_score", "calculate_freshness_score",
        }
        ns = _lift(
            os.path.join(REF, "app/services/job_analyzer.py"),
            names,
            {
                k: cns[k]
                for k in (
                    "TECHNOLOGY_KEYWORDS", "JOB_LEVEL_PATTERNS",
                    "JOB_CATEGORIES", "COMPLETENESS_SCORING",
                    "RELEVANCE_KEYWORDS", "FRESHNESS_SCORING",
                )
            },
        )

        class An:
            pass

        for k in names:
            setattr(An, k, ns[k])
        return An()

    @pytest.fixture(scope="class")
    def service(self):
        names = {
            "_normalize_job_type", "_extract_location_from_description",
            "_extract_salary_from_description",
            "_extract_posted_date_from_description",
            "_extract_requirements_and_benefits",
        }
        ns = _lift(
            os.path.join(REF, "app/services/job_extraction_service.py"),
            names,
            {},
        )

        class Sv:
            job_type_mappings = jq.JOB_TYPE_MAPPINGS
            location_patterns = jq.LOCATION_PATTERNS

        for k in names:
            setattr(Sv, k, ns[k])
        return Sv()

    def test_scalar_extractors_agree(self, service):
        for d in DESCS + TITLES:
            assert jq.extract_location_from_description(d) == (
                service._extract_location_from_description(d)
            ), d
            assert jq.extract_salary_from_description(d) == (
                service._extract_salary_from_description(d)
            ), d
            assert jq.extract_posted_date(d) == (
                service._extract_posted_date_from_description(d)
            ), d
            assert jq.extract_requirements_benefits(d) == (
                service._extract_requirements_and_benefits(d)
            ), d
        for jt in ["Full time", "part time job", "hợp đồng", "intern",
                   "REMOTE", "linh hoạt", "", "weird"]:
            assert jq.normalize_job_type_service(jt) == (
                service._normalize_job_type(jt)
            ), jt

    def test_analyzer_agrees(self, analyzer):
        for t in TITLES + DESCS:
            assert set(jq.extract_technologies(t)) == set(
                analyzer.extract_technologies(t)
            ), t
            assert jq.extract_job_level(t) == analyzer.extract_job_level(t), t
            assert jq.categorize_job(t) == analyzer.categorize_job(t), t

    def test_quality_scores_agree_bitexact(self, analyzer):
        rng = random.Random(7)
        for _ in range(100):
            job = {
                "title": rng.choice(TITLES),
                "description": rng.choice(DESCS),
                "location": rng.choice(["", "Hanoi", "Remote"]),
                "company": rng.choice(["", "Acme"]),
                "job_type": rng.choice(["", "full-time", "contract"]),
                "salary": rng.choice(["", "$1000"]),
                "posted_date": rng.choice(
                    ["", "12/03/2024", "5 days ago", "40 days ago",
                     "100 days ago", "200 days ago"]
                ),
                "requirements": rng.choice(["", "- x"]),
                "benefits": rng.choice(["", "- y"]),
            }
            mine = jq.quality_scores(job)
            ref = analyzer.calculate_quality_scores(job)
            for k in ("completeness", "relevance", "freshness", "overall"):
                assert mine[k] == ref[k], (k, job)

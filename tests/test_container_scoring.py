"""M29 container extraction, M30 link scoring, M39 element checker —
pinned semantics + differential for the pure M30 scorer."""

from __future__ import annotations

import ast
import os
import re
from typing import Dict, Tuple
from urllib.parse import urlparse

import pytest

from crawler_ai_ray.functions.container_jobs import container_jobs
from crawler_ai_ray.functions.link_scoring import (
    calculate_job_link_score,
    check_element_for_job,
    extract_job_links_detailed,
)
from crawler_ai_ray.functions.minidom import build_tree

REF = "/root/reference"

CARD_HTML = """<html><body>
<div class="job-card">
  <h3>Senior Python Developer</h3>
  <p>Salary: $3000. Apply now — fulltime role.</p>
  <p>Location: Hanoi</p>
  <a href="https://a.vn/jobs/senior-python">Details</a>
</div>
<div class="note"><p>Nothing jobby here.</p></div>
<a href="/jobs/qa-engineer" title="job opening">QA Engineer vacancy</a>
<a href="/blog/post">Read more</a>
</body></html>"""


class TestM29:
    def test_container_found_and_fields(self):
        jobs = container_jobs(CARD_HTML, "https://a.vn/careers")
        assert len(jobs) == 1
        j = jobs[0]
        assert j["title"] == "Senior Python Developer"
        assert j["job_type"] == "Full-time"
        assert j["salary"] == "$3000. Apply now — fulltime role."
        assert j["location"] == "Hanoi"
        assert j["job_link"] == "https://a.vn/jobs/senior-python"
        assert j["company"] == "A"

    def test_no_container_when_indicators_sparse(self):
        html = "<div><p>Apply now</p></div>"  # only one indicator
        assert container_jobs(html, "https://a.vn/") == []


class TestM30:
    def test_score_components(self):
        # /jobs/ (+5), 'qa'+'test'? path='/jobs/qa-engineer' has
        # keywords qa(+2), engineer(+2) → limited to 3; depth 2 (+1)
        s = calculate_job_link_score("https://a.vn/jobs/qa-engineer",
                                     "QA Engineer vacancy",
                                     {"title": "job opening"})
        assert s >= 5 + 4 + 1 + 1 + 1

    def test_detailed_extraction_sorted_and_filtered(self):
        rows = extract_job_links_detailed(CARD_HTML, "https://a.vn/careers")
        scores = [r["job_score"] for r in rows]
        assert scores == sorted(scores, reverse=True)
        card = [r for r in rows if r["is_direct_card"]]
        assert card and card[0]["job_score"] == 10
        assert card[0]["text"] == "Senior Python Developer"
        assert all(r["job_score"] >= 3 for r in rows)
        urls = [r["url"] for r in rows if not r["is_direct_card"]]
        assert "https://a.vn/blog/post" not in urls


class TestM39:
    def test_confidence_accumulation(self):
        root = build_tree(CARD_HTML)
        card = next(
            el for el in root.iter_elements()
            if el.attrs.get("class") == "job-card"
        )
        v = check_element_for_job(card)
        assert v["is_likely_job"] and v["confidence"] > 0.3

    def test_short_text_rejected(self):
        root = build_tree("<div class='job'>hi</div>")
        el = next(root.iter_elements())
        v = check_element_for_job(el)
        assert not v["is_likely_job"] and v["reason"] == "Text too short"


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not on disk")
class TestDifferentialVsReference:
    def test_link_scorer_agrees(self):
        src = open(
            os.path.join(REF, "app/services/job_extractor.py")
        ).read()
        keep = [
            n
            for n in ast.parse(src).body
            if isinstance(n, ast.FunctionDef)
            and n.name in ("analyze_job_link_structure",
                           "calculate_job_link_score")
        ]
        ns = {"urlparse": urlparse, "Dict": Dict, "Tuple": Tuple,
              "re": re, "any": any}
        exec(  # noqa: S102
            compile(
                ast.fix_missing_locations(
                    ast.Module(body=keep, type_ignores=[])
                ),
                "<ref-score>", "exec",
            ),
            ns,
        )
        ref = ns["calculate_job_link_score"]
        cases = [
            ("https://a.vn/jobs/qa-engineer", "QA Engineer vacancy",
             {"title": "job opening"}),
            ("https://a.vn/tuyen-dung/dev-backend", "Tuyển dụng backend",
             None),
            ("https://a.vn/blog/post", "Read more", {}),
            ("https://a.vn/team/people", "Join our team", {"class": "nav"}),
            ("https://a.vn/careers/x?job=1&career=2", "position", None),
            ("https://a.vn/a/b/c/d/e/apply/", "apply", {"data-job": "x"}),
        ]
        for url, text, attrs in cases:
            assert calculate_job_link_score(url, text, attrs) == ref(
                url, text, attrs
            )[0], (url, text, attrs)

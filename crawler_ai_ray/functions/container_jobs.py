"""M29 — container (anchor→ancestor) job extraction, the standalone
copy at container_extractor.py:11-224 (duplicated inside
job_extraction_service.py:3296-3599).

Find text nodes holding CTA/job indicators, walk ≤6 ancestors until a
container shows ≥2 indicators with <2000 chars of text, then pull
title/type/location/salary/link out of each container.

Engine determinism deviation: container dedup uses element identity;
the reference's ``container not in containers`` relies on bs4's
deep-equality ``Tag.__eq__``, which additionally merges structurally
identical-but-distinct containers (it cannot fire on the synthetic
corpus, where every card differs by title).
"""

from __future__ import annotations

import re
from urllib.parse import urlparse

import pyarrow as pa

from .minidom import Node, build_tree, find_text_parents

__all__ = [
    "find_job_container",
    "extract_job_from_container",
    "container_jobs",
    "container_jobs_batch",
]

# container_extractor.py:27-37
JOB_INDICATORS = [
    "apply now", "apply", "ứng tuyển", "tuyển dụng",
    "download jd", "job description", "mô tả công việc",
    "fulltime", "part-time", "toàn thời gian", "bán thời gian",
    "hạn ứng tuyển", "deadline", "thời hạn",
    "mức lương", "salary", "lương",
    "nơi làm việc", "location", "địa điểm",
    "view details", "see more", "learn more", "join us", "work with us",
    "career opportunity",
]

# container_extractor.py:68-71
_CONTAINER_INDICATORS = [
    "fulltime", "part-time", "mức lương", "salary", "nơi làm việc",
    "location", "hạn ứng tuyển", "deadline", "apply", "ứng tuyển",
]

_LOC_RXS = [
    re.compile(p, re.IGNORECASE)
    for p in [
        r"nơi làm việc[:\s]+([^\n]+)", r"location[:\s]+([^\n]+)",
        r"địa điểm[:\s]+([^\n]+)", r"work location[:\s]+([^\n]+)",
    ]
]
_SAL_RXS = [
    re.compile(p, re.IGNORECASE)
    for p in [
        r"mức lương[:\s]+([^\n]+)", r"salary[:\s]+([^\n]+)",
        r"lương[:\s]+([^\n]+)",
    ]
]

_VALID_KEYWORDS = [
    "developer", "engineer", "analyst", "manager", "specialist",
    "consultant", "coordinator", "assistant", "director", "lead",
    "senior", "junior", "intern", "tester", "designer", "architect",
    "marketing", "sales", "finance", "accounting", "hr",
]


def find_job_container(anchor: Node) -> Node | None:
    """container_extractor.py:62-78: walk ≤6 ancestors for ≥2
    indicators and <2000 chars."""
    current: Node | None = anchor
    depth = 0
    while current is not None and depth < 6:
        text = current.get_text().lower()
        count = sum(1 for i in _CONTAINER_INDICATORS if i in text)
        if count >= 2 and len(current.get_text()) < 2000:
            return current
        current = current.parent
        depth += 1
    return None


def _extract_title(container: Node) -> str:
    """container_extractor.py:106-131."""
    for tag in ("h1", "h2", "h3", "h4", "h5", "h6"):
        el = container.find(tag)
        if el:
            title = el.get_text().strip()
            if 3 < len(title) < 100:
                return title
    for cls in ("title", "job-title", "position", "role"):
        el = container.find_by_class(lambda x, c=cls: c in x.lower())
        if el:
            title = el.get_text().strip()
            if 3 < len(title) < 100:
                return title
    strong = container.find("strong")
    if strong:
        title = strong.get_text().strip()
        if 3 < len(title) < 100:
            return title
    for line in container.get_text().split("\n"):
        line = line.strip()
        if 3 < len(line) < 100:
            return line
    return ""


def _extract_job_type(container: Node) -> str:
    text = container.get_text().lower()
    if "fulltime" in text or "full-time" in text or "toàn thời gian" in text:
        return "Full-time"
    if "part-time" in text or "parttime" in text or "bán thời gian" in text:
        return "Part-time"
    if "contract" in text or "hợp đồng" in text:
        return "Contract"
    if "intern" in text or "thực tập" in text:
        return "Internship"
    return "Full-time"


def _first_rx(text: str, rxs) -> str:
    for rx in rxs:
        m = rx.search(text)
        if m:
            val = m.group(1).strip()
            if 0 < len(val) < 100:
                return val
    return ""


def _company_from_url(url: str) -> str:
    """container_extractor.py:187-196 (strips www./careers./jobs.)."""
    domain = urlparse(url).netloc.lower()
    domain = (
        domain.replace("www.", "").replace("careers.", "")
        .replace("jobs.", "")
    )
    if "." in domain:
        return domain.split(".")[0].title()
    return domain.title()


def _job_link(container: Node, career_page_url: str) -> str:
    for a in container.find_all("a"):
        href = a.attrs.get("href")
        if href and href.startswith("http"):
            return href
    return career_page_url


def _is_valid(job: dict) -> bool:
    title = (job.get("title") or "").strip()
    desc = (job.get("description") or "").strip()
    if len(title) < 3 or len(desc) < 20:
        return False
    content = f"{title} {desc}".lower()
    return any(k in content for k in _VALID_KEYWORDS)


def extract_job_from_container(
    container: Node, career_page_url: str, job_index: int
) -> dict:
    text = container.get_text()
    return {
        "title": _extract_title(container),
        "company": _company_from_url(career_page_url),
        "location": _first_rx(text, _LOC_RXS),
        "job_type": _extract_job_type(container),
        "salary": _first_rx(text, _SAL_RXS),
        "description": text.strip(),
        "job_link": _job_link(container, career_page_url),
        "source_url": career_page_url,
        "job_index": job_index,
    }


def container_jobs(
    html: str, career_page_url: str, max_jobs: int = 50
) -> list[dict]:
    """M29 end-to-end over one page."""
    root = build_tree(html)
    anchors: list[Node] = []
    for indicator in JOB_INDICATORS:
        anchors.extend(
            find_text_parents(
                root, lambda t, i=indicator: bool(t) and i in t.lower()
            )
        )
    containers: list[Node] = []
    for anchor in anchors:
        c = find_job_container(anchor)
        if c is not None and all(c is not o for o in containers):
            containers.append(c)
    jobs = []
    for idx, container in enumerate(containers[:max_jobs], start=1):
        job = extract_job_from_container(container, career_page_url, idx)
        if job and _is_valid(job):
            jobs.append(job)
    return jobs


def container_jobs_batch(batch: pa.Table) -> pa.Table:
    """pages → M29 container-extracted job rows.  Input: url, html."""
    urls = batch["url"].to_pylist()
    htmls = batch["html"].to_pylist()
    cols: dict[str, list] = {
        k: []
        for k in (
            "source_url", "job_index", "title", "company", "location",
            "job_type", "salary", "job_link",
        )
    }
    for u, h in zip(urls, htmls):
        html = h.decode("utf-8", errors="ignore") if isinstance(
            h, (bytes, bytearray)
        ) else (h or "")
        for job in container_jobs(html, u):
            for k in cols:
                cols[k].append(job[k])
    arrays = {}
    for k, vals in cols.items():
        arrays[k] = pa.array(
            vals, pa.int32() if k == "job_index" else pa.string()
        )
    return pa.table(arrays)

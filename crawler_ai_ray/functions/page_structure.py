"""Career-page structure analysis — M36 and its helper chain, page-local.

The reference interleaves these with network fetches
(`crawl_single_url` + per-candidate content tests); the engine
re-expresses them as **page-local** operators over the already-fetched
(url, html) row — candidate job URLs are verified when the crawl loop
fetches them in the next round, not by nested fetches inside the
analyzer.  Documented deviations:

* `detect_page_type` STEP 3 skips the reference's fetch-per-candidate
  content test (job_extraction_service.py:3060-3075) and classifies
  ``individual_urls`` when the quick scan finds any candidates.
* `find_job_listing_redirect` skips the JS-button parent-traversal
  branch (:3272-3278) — buttons without href aren't chased.

Operators:

* `quick_scan_job_urls` — the link-pattern sweep + root-reject +
  fragment-strip dedup (job_extraction_service.py:3017-3051 and
  :2933-2990).
* `embedded_job_count` — the 4 embedded-job regexes over page text
  (:752-764).
* `detect_page_type` — STEP 1 main-career-page role-suffix scan,
  STEP 2 category page, STEP 3 quick scan (:~2790-2905 region).
* `analyze_page_structure` — M36 (:719-808): page_type, counts,
  recommended strategy.
* `find_job_listing_redirect` — "All Open Positions" button chase
  (:3226-3292).
"""

from __future__ import annotations

import re
from urllib.parse import urljoin

import pyarrow as pa

from .job_urls import validate_job_urls

__all__ = [
    "quick_scan_job_urls",
    "embedded_job_count",
    "embedded_job_counts_vec",
    "detect_page_type",
    "analyze_page_structure",
    "find_job_listing_redirect",
    "page_structure_batch",
]

_JOB_LINK_PATTERNS = [
    re.compile(p, re.IGNORECASE)
    for p in [
        r"/job/[^\"]+", r"/career/[^\"]+", r"/careers/[^\"]+",
        r"/jobs/[^\"]+", r"/positions/[^\"]+", r"/opportunities/[^\"]+",
        r"/tuyen-dung/[^\"]+", r"/recruitment/[^\"]+", r"/vacancies/[^\"]+",
        r"/openings/[^\"]+", r"/apply/[^\"]+", r"/employment/[^\"]+",
        r"/hiring/[^\"]+", r"/developer/[^\"]+", r"/engineer/[^\"]+",
        r"/manager/[^\"]+", r"/analyst/[^\"]+", r"/specialist/[^\"]+",
        r"/consultant/[^\"]+",
    ]
]

# job_extraction_service.py:752-758
_EMBEDDED_JOB_PATTERNS = [
    r"([A-Z][a-zA-Z\s]+(?:Developer|Engineer|Manager|Analyst|"
    r"Specialist|Assistant|Designer)).*?(?:Apply|View|See|Learn|"
    r"Details)",
    r"([A-Z][a-zA-Z\s]+(?:Developer|Engineer|Manager|Analyst|"
    r"Specialist|Assistant|Designer)).*?(?:Fulltime|Part-time|"
    r"Contract|Only|Remote)",
    r"([A-Z][a-zA-Z\s]+(?:Developer|Engineer|Manager|Analyst|"
    r"Specialist|Assistant|Designer))[^.\n]*?See Details",
    r"([A-Z][a-zA-Z\s]+(?:Developer|Engineer|Manager|Analyst|"
    r"Specialist|Assistant|Designer))[^.\n]*?(?:Singapore|Remote|"
    r"Fully Remote)",
]
_EMBEDDED_JOB_RXS = [
    re.compile(p, re.IGNORECASE | re.DOTALL) for p in _EMBEDDED_JOB_PATTERNS
]

# RE2 (pyarrow.compute) twins of the embedded-job patterns — the reference
# patterns backtrack quadratically on long alpha/space runs (~30 ms/page on
# the synthetic corpus); the twins run in linear time, count-identically
# (semantics + engine-gap handling documented in functions/re2twin.py).
from .re2twin import (  # noqa: F401  (re-exported for tests)
    PYWS_RE2_CLASS,
    RE2_FALLBACK_CLASS,
    RE2_FALLBACK_RX as _RE2_FALLBACK_RX,
    re2_twin,
)

_EMBEDDED_JOB_RE2 = [re2_twin(p) for p in _EMBEDDED_JOB_PATTERNS]

# STEP-1 main-career-page url patterns
_MAIN_CAREER_PATTERNS = [
    "/career/", "/careers/", "/jobs/", "/tuyen-dung/", "/viec-lam/",
    "/opportunities/", "/positions/", "/openings/", "/vacancies/",
]

# STEP-1 individual job URL role-suffix patterns
_ROLE_SUFFIXES = [
    "developer", "analyst", "tester", "designer", "manager", "specialist",
    "engineer", "content", "technical", "executive", "coordinator",
    "assistant", "frontend", "backend", "fullstack", "devops", "qa", "seo",
    "marketing", "sales", "hr", "admin", "lead", "senior", "junior",
    "intern",
]
_ROLE_RXS = [
    re.compile(rf"/[^/]+-{suffix}/?$", re.IGNORECASE)
    for suffix in _ROLE_SUFFIXES
]

# STEP-2 category page indicators
_CATEGORY_INDICATORS = [
    "business-development", "marketing", "information-technology",
    "engineering", "sales", "hr", "finance", "operations", "design",
    "product", "data", "security", "devops",
]

_JOB_BUTTON_PATTERNS = [
    "all open positions", "view all jobs", "see all jobs", "browse jobs",
    "current openings", "job opportunities", "career opportunities",
    "tuyển dụng", "việc làm", "cơ hội nghề nghiệp",
]


def _clean_dedup(urls: list[str]) -> list[str]:
    """Fragment-strip + first-wins dedup (:2973-2982)."""
    out, seen = [], set()
    for url in urls:
        base = url.split("#")[0]
        if base not in seen:
            out.append(base)
            seen.add(base)
    return out


def quick_scan_job_urls(url: str, hrefs: list[str]) -> list[str]:
    """Link-pattern sweep over the page's anchors: absolute-ize,
    pattern-match, career-root reject, fragment-strip dedup."""
    found = []
    for href in hrefs:
        if not href:
            continue
        if href.startswith("/"):
            full = urljoin(url, href)
        elif href.startswith("http"):
            full = href
        else:
            continue
        for rx in _JOB_LINK_PATTERNS:
            if rx.search(full):
                stripped = full.rstrip("/")
                if not stripped.endswith(("/career", "/careers", "/jobs")):
                    found.append(full)
                break
    return _clean_dedup(found)


def embedded_job_count(page_text: str) -> int:
    """Sum of matches of the 4 embedded-job regexes (:752-764)."""
    return sum(len(rx.findall(page_text or "")) for rx in _EMBEDDED_JOB_RXS)


def embedded_job_counts_vec(texts: list[str]) -> "np.ndarray":
    """Vectorized ``embedded_job_count`` over a batch of page texts: RE2
    via pyarrow.compute (linear-time, ~240× the backtracking engine on the
    synthetic corpus), with a Python-engine fallback for rows holding the
    two codepoints where the engines' fold tables diverge (U+0130/U+0131).
    Count-identical to the scalar path — pinned by tests/test_re2_twins.py
    on corpus pages and an adversarial hazard-char fuzz grid."""
    import numpy as np
    import pyarrow.compute as pc

    arr = pa.array([t or "" for t in texts], pa.string())
    counts = np.zeros(len(texts), np.int64)
    for p in _EMBEDDED_JOB_RE2:
        counts += np.asarray(pc.count_substring_regex(arr, p), dtype=np.int64)
    hazard = np.asarray(pc.match_substring_regex(arr, RE2_FALLBACK_CLASS))
    for i in np.flatnonzero(hazard):
        counts[i] = embedded_job_count(texts[i])
    return counts


def detect_page_type(url: str, hrefs: list[str]) -> str:
    """individual_urls / embedded_jobs / unknown (page-local)."""
    url_lower = url.lower()
    if any(p in url_lower for p in _MAIN_CAREER_PATTERNS):
        for href in hrefs:
            if not href:
                continue
            full = urljoin(url, href)
            if any(rx.search(full) for rx in _ROLE_RXS):
                return "individual_urls"
        return "embedded_jobs"
    if any(ind in url_lower for ind in _CATEGORY_INDICATORS):
        return "embedded_jobs"
    if quick_scan_job_urls(url, hrefs):
        return "individual_urls"
    return "unknown"


def analyze_page_structure(
    url: str, hrefs: list[str], page_text: str, n_embedded: int | None = None
) -> dict:
    """M36 (:719-808): individual-URL count (quick scan + M16
    validation), embedded-job regex count, page type and recommended
    strategy.  ``n_embedded`` lets batch callers pass the vectorized
    RE2 count (count-identical; see ``embedded_job_counts_vec``)."""
    individual = validate_job_urls(quick_scan_job_urls(url, hrefs), url)
    if n_embedded is None:
        n_embedded = embedded_job_count(page_text)
    has_ind, has_emb = bool(individual), n_embedded > 0
    if has_ind and not has_emb:
        page_type, strategy = "individual_jobs", "individual_urls"
    elif has_emb and not has_ind:
        page_type, strategy = "embedded_jobs", "embedded_jobs"
    elif has_ind and has_emb:
        page_type, strategy = "hybrid", "hybrid"
    else:
        page_type, strategy = "unknown", "embedded_jobs"
    return {
        "page_type": page_type,
        "has_individual_urls": has_ind,
        "has_embedded_jobs": has_emb,
        "job_count": len(individual) if has_ind else n_embedded,
        "recommended_strategy": strategy,
        "individual_urls_found": len(individual),
        "embedded_jobs_found": n_embedded,
        "page_text_length": len(page_text or ""),
    }


def find_job_listing_redirect(
    url: str, clickables: list[tuple[str, str | None, str]]
) -> str | None:
    """'All Open Positions'-style redirect chase (:3226-3292),
    page-local.  ``clickables`` = (tag, href, text) for a+button."""
    job_url_count = sum(
        1
        for tag, href, _ in clickables
        if tag == "a"
        and href
        and ("/careers/" in href or "/jobs/" in href or "/job/" in href)
    )
    if job_url_count >= 5:
        return None
    for _tag, href, text in clickables:
        low = (text or "").strip().lower()
        if any(p in low for p in _JOB_BUTTON_PATTERNS):
            if href:
                return urljoin(url, href)
            # JS-only button: parent-traversal branch not reproduced
    for tag, href, _text in clickables:
        if tag != "a" or not href:
            continue
        if any(
            p in href.lower()
            for p in ("/jobs", "/careers", "/positions", "/opportunities")
        ):
            full = urljoin(url, href)
            if full != url:
                return full
    return None


# M6 (scrapy_career_spider.py:211-262): nav-prioritized link sweep
_NAV_CLASS_TOKENS = (
    "navbar", "menu", "navigation", "main-menu", "top-menu", "header",
    "nav", "main-nav", "primary-nav", "site-nav", "page-nav",
    "breadcrumb", "menu-item", "nav-item",
)


def extract_all_links_nav(html: str, domain: str) -> list[str]:
    """M6: hrefs under nav/header containers first, then footer, then
    every anchor; dedup; M7 validity filter.  Engine determinism
    deviation: the reference dedups with ``list(set(...))`` (process-
    dependent order, scrapy_career_spider.py:252) — the engine keeps
    first-occurrence order."""
    from .classify import is_valid_link
    from .minidom import build_tree

    root = build_tree(html)
    nav_hrefs: list[str] = []
    footer_hrefs: list[str] = []
    all_hrefs: list[str] = []

    def walk(node, in_nav: bool, in_footer: bool) -> None:
        for c in node.children:
            if isinstance(c, str):
                continue
            tokens = c.class_tokens()
            c_nav = (
                in_nav
                or c.tag in ("nav", "header")
                or any(t in _NAV_CLASS_TOKENS for t in tokens)
            )
            c_footer = in_footer or c.tag == "footer"
            if c.tag == "a":
                href = c.attrs.get("href")
                if href is not None:
                    if c_nav:
                        nav_hrefs.append(href)
                    if c_footer:
                        footer_hrefs.append(href)
                    all_hrefs.append(href)
            walk(c, c_nav, c_footer)

    walk(root, False, False)
    seen: set[str] = set()
    out: list[str] = []
    for href in nav_hrefs + footer_hrefs + all_hrefs:
        if href not in seen:
            seen.add(href)
            if is_valid_link(href, domain):
                out.append(href)
    return out


def nav_links_batch(batch: pa.Table) -> pa.Table:
    """pages → (url, link) rows from the M6 sweep.  Input: url, html."""
    from .classify import host_of

    urls = batch["url"].to_pylist()
    htmls = batch["html"].to_pylist()
    out_u, out_l = [], []
    for u, h in zip(urls, htmls):
        html = h.decode("utf-8", errors="ignore") if isinstance(
            h, (bytes, bytearray)
        ) else (h or "")
        for link in extract_all_links_nav(html, host_of(u)):
            out_u.append(u)
            out_l.append(link)
    return pa.table(
        {
            "url": pa.array(out_u, pa.string()),
            "link": pa.array(out_l, pa.string()),
        }
    )


def page_structure_batch(batch: pa.Table) -> pa.Table:
    """pages → M36 analysis rows.  Input: url, html."""
    from .htmltext import parse_page

    urls = batch["url"].to_pylist()
    htmls = batch["html"].to_pylist()
    cols: dict[str, list] = {
        k: []
        for k in (
            "page_type", "has_individual_urls", "has_embedded_jobs",
            "job_count", "recommended_strategy", "individual_urls_found",
            "embedded_jobs_found", "page_text_length", "detected_type",
            "listing_redirect",
        )
    }
    texts: list[str] = []
    facts_list = []
    for h in htmls:
        html = h.decode("utf-8", errors="ignore") if isinstance(
            h, (bytes, bytearray)
        ) else (h or "")
        facts = parse_page(html)
        facts_list.append(facts)
        # reference uses soup.get_text() = every text node (:746)
        texts.append("".join(facts.all_pieces))
    n_embedded_vec = embedded_job_counts_vec(texts)
    for u, facts, page_text, n_emb in zip(
        urls, facts_list, texts, n_embedded_vec
    ):
        hrefs = [href for href, _ in facts.anchors]
        a = analyze_page_structure(u, hrefs, page_text, int(n_emb))
        for k in (
            "page_type", "has_individual_urls", "has_embedded_jobs",
            "job_count", "recommended_strategy", "individual_urls_found",
            "embedded_jobs_found", "page_text_length",
        ):
            cols[k].append(a[k])
        cols["detected_type"].append(detect_page_type(u, hrefs))
        cols["listing_redirect"].append(
            find_job_listing_redirect(u, facts.clickables) or ""
        )
    out = pa.table({"url": pa.array(urls, pa.string())})
    for name, vals in cols.items():
        if name in ("has_individual_urls", "has_embedded_jobs"):
            typ = pa.bool_()
        elif name in (
            "job_count", "individual_urls_found", "embedded_jobs_found",
            "page_text_length",
        ):
            typ = pa.int32()
        else:
            typ = pa.string()
        out = out.append_column(name, pa.array(vals, typ))
    return out

"""M19/M20 — fallback job extractors for pages where the standard
M18 path yields nothing.

* **M19** `extract_job_from_main_content`
  (job_extraction_service.py:1794-1907): main-content selector cascade
  (main/.main/#main/.content/#content/.container/.wrapper/
  .page-content/.post-content, else body), title from the
  ``/tuyen-dung/`` URL slug or capitalized-phrase regexes over the
  first 1000 chars, description from a keyword-anchored
  ``[start:start+2000]`` window else the first 1000 chars.
* **M20** `extract_job_alternative`
  (job_extraction_service.py:1909-1953): capitalized-phrase title
  patterns over the whole text, else a generic "Job Opportunity"
  record from main/article content.  The reference's
  ``soup.find('.content')`` arm looks up a *tag named* ``.content`` —
  dead code, reproduced by omission.
"""

from __future__ import annotations

import re
from urllib.parse import unquote, urlparse

import pyarrow as pa

from .htmltext import PageFacts, parse_page

__all__ = [
    "main_content_text",
    "job_title_from_url_or_content",
    "job_description_from_content",
    "extract_job_from_main_content",
    "extract_job_alternative",
    "job_fallback_batch",
]

# job_extraction_service.py:1800-1803 (cascade order)
_MAIN_SELECTORS = [
    "main", ".main", "#main", ".content", "#content", ".container",
    ".wrapper", ".page-content", ".post-content",
]

_M19_TITLE_RXS = [
    re.compile(r"\[([^\]]+)\]\s*-\s*([^\[\]]+)"),
    re.compile(r"([A-Z][a-z]+(?:\s+[A-Z][a-z]+){2,})"),
    re.compile(
        r"(Senior|Junior|Lead|Manager|Developer|Engineer|Designer|Analyst|"
        r"Trợ giảng|Chuyên viên)\s+[A-Za-zÀ-ỹ]+"
    ),
]

_M20_TITLE_RXS = [
    re.compile(r"([A-Z][a-z]+(?:\s+[A-Z][a-z]+){2,})"),
    re.compile(
        r"(Senior|Junior|Lead|Manager|Developer|Engineer|Designer|Analyst)"
        r"\s+[A-Za-z]+"
    ),
    re.compile(
        r"([A-Za-z]+\s+(?:Developer|Engineer|Designer|Manager|Analyst|"
        r"Specialist))"
    ),
]

_DESC_KEYWORDS = [
    "mô tả công việc", "job description", "mô tả", "description",
    "yêu cầu", "requirements", "quyền lợi", "benefits", "phạm vi",
    "scope", "hình thức", "form",
]


def _sep_join(pieces: list[str]) -> str:
    """bs4 ``get_text(separator=' ', strip=True)`` analogue."""
    return " ".join(p.strip() for p in pieces if p.strip())


def main_content_text(facts: PageFacts) -> str:
    """First matching main-content selector's text, else body
    (separator=' ', strip=True semantics — :1816)."""
    for key in _MAIN_SELECTORS:
        if key in facts.sel_pieces:
            return _sep_join(facts.sel_pieces[key])
    return _sep_join(facts.sel_pieces.get("body", []))


def job_title_from_url_or_content(job_url: str, content_text: str) -> str:
    """:1838-1880."""
    path = unquote(urlparse(job_url).path)
    if "/tuyen-dung/" in path:
        title_part = path.split("/tuyen-dung/")[-1]
        if title_part:
            title = title_part.replace("-", " ").replace("_", " ")
            return " ".join(w.capitalize() for w in title.split())
    for rx in _M19_TITLE_RXS:
        matches = rx.findall(content_text[:1000])
        if matches:
            if isinstance(matches[0], tuple):
                return " ".join(matches[0])
            return matches[0]
    return ""


def job_description_from_content(content_text: str) -> str:
    """:1882-1907 — earliest keyword anchor, [start:start+2000] window,
    else the first 1000 chars."""
    start = -1
    low = content_text.lower()
    for kw in _DESC_KEYWORDS:
        pos = low.find(kw)
        if pos != -1 and (start == -1 or pos < start):
            start = pos
    if start != -1:
        return content_text[start:start + 2000].strip()
    return content_text[:1000].strip()


def extract_job_from_main_content(facts: PageFacts, job_url: str) -> dict:
    """M19 (:1794-1834)."""
    out: dict = {}
    content_text = main_content_text(facts)
    if content_text or facts.sel_pieces:
        title = job_title_from_url_or_content(job_url, content_text)
        if title:
            out["job_name"] = title
            out["job_role"] = title
        desc = job_description_from_content(content_text)
        if desc:
            out["job_description"] = desc
    return out


def extract_job_alternative(facts: PageFacts, job_url: str) -> dict:
    """M20 (:1909-1953)."""
    all_text = "".join(facts.all_pieces)
    for rx in _M20_TITLE_RXS:
        matches = rx.findall(all_text)
        if matches:
            title = matches[0]
            if len(title) > 5:
                return {
                    "job_name": title,
                    "job_type": "Full-time",
                    "job_role": title,
                    "job_description": all_text[:1000]
                    if len(all_text) > 100
                    else all_text,
                    "job_link": job_url,
                }
    # main/article fallback (the '.content' find is dead code upstream)
    for key in ("main", "article"):
        if key in facts.sel_pieces:
            main_text = "".join(facts.sel_pieces[key]).strip()
            if len(main_text) > 100:
                return {
                    "job_name": "Job Opportunity",
                    "job_type": "Full-time",
                    "job_role": "Job Opportunity",
                    "job_description": main_text[:1000],
                    "job_link": job_url,
                }
            break
    return {}


def job_fallback_batch(batch: pa.Table) -> pa.Table:
    """pages → M19/M20 fallback rows.  Input: url, html."""
    urls = batch["url"].to_pylist()
    htmls = batch["html"].to_pylist()
    cols: dict[str, list] = {
        k: [] for k in ("fb_title", "fb_description", "alt_title",
                        "alt_description")
    }
    for u, h in zip(urls, htmls):
        html = h.decode("utf-8", errors="ignore") if isinstance(
            h, (bytes, bytearray)
        ) else (h or "")
        facts = parse_page(html)
        m19 = extract_job_from_main_content(facts, u)
        m20 = extract_job_alternative(facts, u)
        cols["fb_title"].append(m19.get("job_name", ""))
        cols["fb_description"].append(m19.get("job_description", ""))
        cols["alt_title"].append(m20.get("job_name", ""))
        cols["alt_description"].append(m20.get("job_description", ""))
    out = pa.table({"url": pa.array(urls, pa.string())})
    for name, vals in cols.items():
        out = out.append_column(name, pa.array(vals, pa.string()))
    return out

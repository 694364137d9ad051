"""M30 — job-link/card scoring (job_extractor.py:449-751) and M39 —
element job-likeness checker (element_checker.py:20-101).

`calculate_job_link_score` is a pure (url, link_text, attrs) function;
`extract_job_links_detailed` and `check_element_for_job` walk the tree
(minidom).
"""

from __future__ import annotations

import re
from urllib.parse import urljoin, urlparse

import pyarrow as pa

from .minidom import Node, build_tree

__all__ = [
    "analyze_job_link_structure",
    "calculate_job_link_score",
    "extract_job_cards_from_tree",
    "extract_job_links_detailed",
    "check_element_for_job",
    "job_link_scores_batch",
    "element_check_batch",
]

# job_extractor.py:492-501
_HIGH_PRIORITY = [
    "/job/", "/jobs/", "/position/", "/positions/", "/career/",
    "/careers/", "/opportunity/", "/opportunities/", "/vacancy/",
    "/vacancies/", "/opening/", "/openings/", "/apply/", "/application/",
    "/applications/", "/tuyen-dung/", "/tuyển-dụng/", "/tuyendung/",
    "/viec-lam/", "/việc-làm/", "/vieclam/", "/co-hoi/", "/cơ-hội/",
    "/cohoi/",
]
# :510-517
_MEDIUM_PRIORITY = [
    "/hiring/", "/recruitment/", "/employment/", "/join-us/", "/joinus/",
    "/work-with-us/", "/workwithus/", "/team/", "/talent/", "/people/",
    "/staff/", "/nhan-vien/", "/nhân-viên/", "/nhanvien/", "/ung-vien/",
    "/ứng-viên/", "/ungvien/", "/cong-viec/", "/công-việc/", "/congviec/",
    "/lam-viec/", "/làm-việc/", "/lamviec/",
]
# :526-535
_JOB_KEYWORDS = [
    "developer", "dev", "engineer", "programmer", "analyst", "designer",
    "manager", "lead", "architect", "consultant", "specialist",
    "coordinator", "assistant", "director", "frontend", "backend",
    "fullstack", "mobile", "web", "data", "ai", "ml", "devops", "qa",
    "test", "ui", "ux", "product", "business", "marketing", "sales",
    "customer", "support", "admin", "hr",
]
# :545-549
_TEXT_KEYWORDS = [
    "job", "career", "position", "opportunity", "vacancy", "hiring",
    "recruitment", "employment", "work", "tuyển dụng", "việc làm",
    "cơ hội", "vị trí", "nghề nghiệp", "công việc", "làm việc",
]
_QUERY_KEYWORDS = ["job", "career", "position", "opportunity", "vacancy"]
_ATTR_KEYWORDS = ["job", "career", "position", "opportunity"]


def analyze_job_link_structure(url: str, link_text: str = "") -> dict:
    """job_extractor.py:449-478."""
    parsed = urlparse(url)
    path_lower = parsed.path.lower() if parsed.path else ""
    query_lower = parsed.query.lower()
    segments = [s for s in path_lower.strip("/").split("/") if s]
    params = {}
    for part in parsed.query.split("&"):
        if "=" in part:
            k, v = part.split("=", 1)
            params[k.lower()] = v.lower()
    return {
        "path": path_lower,
        "path_segments": segments,
        "path_depth": len(segments),
        "query": query_lower,
        "query_params": params,
        "link_text": link_text.lower() if link_text else "",
        "full_path": f"{path_lower}?{query_lower}",
    }


def calculate_job_link_score(
    url: str, link_text: str = "", element_attrs: dict | None = None
) -> int:
    """M30 (job_extractor.py:480-585): +5/+3 path tiers, +2 path
    keywords (≤3), +1 text keywords (≤3), +1 query keywords (≤2), +1
    attr keywords (≤2), +1 depth 2-4."""
    ua = analyze_job_link_structure(url, link_text)
    path, query, text = ua["path"], ua["query"], ua["link_text"]
    score = 0
    for pattern in _HIGH_PRIORITY:
        if pattern in path:
            score += 5
            break
    for pattern in _MEDIUM_PRIORITY:
        if pattern in path:
            score += 3
            break
    n = 0
    for kw in _JOB_KEYWORDS:
        if kw in path and n < 3:
            score += 2
            n += 1
    n = 0
    for kw in _TEXT_KEYWORDS:
        if kw in text and n < 3:
            score += 1
            n += 1
    n = 0
    for kw in _QUERY_KEYWORDS:
        if kw in query and n < 2:
            score += 1
            n += 1
    if element_attrs:
        n = 0
        for _name, value in element_attrs.items():
            low = str(value).lower()
            for kw in _ATTR_KEYWORDS:
                if kw in low and n < 2:
                    score += 1
                    n += 1
                    break
    if 2 <= ua["path_depth"] <= 4:
        score += 1
    return score


# job_extractor.py:592-599 — class-substring selectors flattened: a card
# is any <article> or any element whose class contains one of the words
_CARD_CLASS_WORDS = ("job", "career", "position", "vacancy", "opportunity")
_TITLE_TAGS = ("h1", "h2", "h3", "h4")
_TITLE_CLASSES = ("title", "job-title", "position-title")
_DESC_CLASSES = ("description", "job-description", "content")


def _select_card_title(card: Node) -> str:
    for tag in _TITLE_TAGS:
        el = card.find(tag)
        if el:
            return el.get_text(strip=True)
    for cls in _TITLE_CLASSES:
        el = card.find_by_class(lambda x, c=cls: c in x.split())
        if el:
            return el.get_text(strip=True)
    return ""


def _select_card_desc(card: Node) -> str:
    for cls in _DESC_CLASSES:
        el = card.find_by_class(lambda x, c=cls: c in x.split())
        if el:
            return el.get_text(strip=True)
    p = card.find("p")
    if p:
        return p.get_text(strip=True)
    return ""


def extract_job_cards_from_tree(root: Node, base_url: str) -> list[dict]:
    """Job-card scan (job_extractor.py:587-647), with the reference's
    15 selectors folded to: <article> ∪ class-substring matches (the
    explicit .job-card/.career-item/... selectors are subsets of the
    [class*=…] ones, so the fold preserves the match set; duplicates
    across selectors are kept, as in the reference)."""
    cards: list[tuple[Node, bool]] = []
    for el in root.iter_elements():
        if el.tag == "article":
            cards.append((el, True))
    for word in _CARD_CLASS_WORDS:
        for el in root.iter_elements():
            cls = el.attrs.get("class")
            if cls is not None and word in cls.lower():
                cards.append((el, True))
    out = []
    for card, _direct in cards:
        title = _select_card_title(card)
        link = ""
        for a in card.find_all("a"):
            if a.attrs.get("href"):
                link = urljoin(base_url, a.attrs["href"])
                break
        if title:
            out.append(
                {
                    "url": link,
                    "text": title,
                    "job_score": 10,
                    "description": _select_card_desc(card),
                    "is_direct_card": True,
                }
            )
    return out


def extract_job_links_detailed(html: str, base_url: str) -> list[dict]:
    """M30 end-to-end (job_extractor.py:649-707): direct cards (score
    10) + scored anchor sweep (keep ≥3), sorted by score desc.  Engine
    tie-break: (−score, url, text) so ordering is deterministic."""
    root = build_tree(html)
    results = extract_job_cards_from_tree(root, base_url)
    for a in root.iter_elements():
        if a.tag != "a":
            continue
        href = a.attrs.get("href")
        if not href:
            continue
        full = urljoin(base_url, href)
        if not full.startswith(("http://", "https://")):
            continue
        text = a.get_text(strip=True)
        attrs = {k: v for k, v in a.attrs.items() if k != "href"}
        score = calculate_job_link_score(full, text, attrs)
        if score >= 3:
            results.append(
                {
                    "url": full,
                    "text": text,
                    "job_score": score,
                    "description": "",
                    "is_direct_card": False,
                }
            )
    results.sort(key=lambda r: (-r["job_score"], r["url"], r["text"]))
    return results


# --- M39 -------------------------------------------------------------------

_M39_KEYWORDS = [
    "job", "career", "position", "opportunity", "vacancy", "hiring",
    "recruitment", "employment", "work", "tuyển dụng", "việc làm",
    "cơ hội", "vị trí", "nghề nghiệp", "công việc", "làm việc",
]
_M39_RXS = [
    re.compile(p)
    for p in [
        r"\b(developer|engineer|designer|manager|analyst|specialist)\b",
        r"\b(full.?time|part.?time|remote|hybrid|onsite)\b",
        r"\b(experience|skill|requirement|qualification)\b",
        r"\b(salary|compensation|benefit|package)\b",
        r"\b(apply|application|submit|join|work)\b",
    ]
]


def check_element_for_job(element: Node) -> dict:
    """M39 (element_checker.py:20-101)."""
    text = element.get_text(strip=True)
    if not text or len(text) < 10:
        return {"is_likely_job": False, "confidence": 0.0,
                "reason": "Text too short"}
    low = text.lower()
    kw = sum(1 for k in _M39_KEYWORDS if k in low)
    pat = sum(1 for rx in _M39_RXS if rx.search(low))
    confidence = 0.0
    if kw > 0:
        confidence += min(kw * 0.2, 0.6)
    if pat > 0:
        confidence += min(pat * 0.15, 0.4)
    if (
        element.attrs.get("data-job")
        or element.attrs.get("data-position")
        or element.attrs.get("data-career")
    ):
        confidence += 0.3
    cls = (element.attrs.get("class") or "").lower()
    if any(k in cls for k in ("job", "career", "position", "opportunity")):
        confidence += 0.2
    el_id = (element.attrs.get("id") or "").lower()
    if any(k in el_id for k in ("job", "career", "position", "opportunity")):
        confidence += 0.2
    return {
        "is_likely_job": confidence >= 0.3,
        "confidence": min(confidence, 1.0),
        "reason": f"Keywords: {kw}, Patterns: {pat}",
    }


# --- batch wrappers --------------------------------------------------------

def job_link_scores_batch(batch: pa.Table) -> pa.Table:
    """pages → M30 scored link rows.  Input: url, html."""
    urls = batch["url"].to_pylist()
    htmls = batch["html"].to_pylist()
    cols: dict[str, list] = {
        "source_url": [], "url": [], "text": [], "job_score": [],
        "is_direct_card": [],
    }
    for u, h in zip(urls, htmls):
        html = h.decode("utf-8", errors="ignore") if isinstance(
            h, (bytes, bytearray)
        ) else (h or "")
        for r in extract_job_links_detailed(html, u):
            cols["source_url"].append(u)
            cols["url"].append(r["url"])
            cols["text"].append(r["text"])
            cols["job_score"].append(r["job_score"])
            cols["is_direct_card"].append(r["is_direct_card"])
    return pa.table(
        {
            "source_url": pa.array(cols["source_url"], pa.string()),
            "url": pa.array(cols["url"], pa.string()),
            "text": pa.array(cols["text"], pa.string()),
            "job_score": pa.array(cols["job_score"], pa.int32()),
            "is_direct_card": pa.array(cols["is_direct_card"], pa.bool_()),
        }
    )


def element_check_batch(batch: pa.Table) -> pa.Table:
    """pages → M39 verdict per div/section/article/li element with a
    class attribute (bounded sweep).  Input: url, html."""
    urls = batch["url"].to_pylist()
    htmls = batch["html"].to_pylist()
    cols: dict[str, list] = {
        "url": [], "element_index": [], "tag": [], "is_likely_job": [],
        "confidence": [],
    }
    for u, h in zip(urls, htmls):
        html = h.decode("utf-8", errors="ignore") if isinstance(
            h, (bytes, bytearray)
        ) else (h or "")
        root = build_tree(html)
        idx = 0
        for el in root.iter_elements():
            if el.tag not in ("div", "section", "article", "li"):
                continue
            if el.attrs.get("class") is None:
                continue
            verdict = check_element_for_job(el)
            cols["url"].append(u)
            cols["element_index"].append(idx)
            cols["tag"].append(el.tag)
            cols["is_likely_job"].append(verdict["is_likely_job"])
            cols["confidence"].append(round(verdict["confidence"], 10))
            idx += 1
    return pa.table(
        {
            "url": pa.array(cols["url"], pa.string()),
            "element_index": pa.array(cols["element_index"], pa.int32()),
            "tag": pa.array(cols["tag"], pa.string()),
            "is_likely_job": pa.array(cols["is_likely_job"], pa.bool_()),
            "confidence": pa.array(cols["confidence"], pa.float64()),
        }
    )

"""S9 — sitemap reader (career_pages_service.py:291-317): pull
``<loc>`` entries out of sitemap XML and keep job/career-related URLs.

The reference parses with bs4's "xml" builder and ``get_text``; the
engine uses a regex over ``<loc>…</loc>`` spans (equivalent for
well-formed sitemaps, no XML dependency) with entity unescape.
"""

from __future__ import annotations

import html as _html
import re

import pyarrow as pa

__all__ = ["parse_sitemap_locs", "filter_job_locs", "sitemap_jobs_batch"]

_LOC_RX = re.compile(r"<loc[^>]*>(.*?)</loc>", re.IGNORECASE | re.DOTALL)

# career_pages_service.py:299-303
JOB_LOC_KEYWORDS = [
    "career", "careers", "job", "jobs", "recruit", "tuyen-dung",
    "viec-lam", "employment", "opportunity", "position", "vacancy",
]


def parse_sitemap_locs(xml_text: str) -> list[str]:
    """All <loc> URL strings, stripped + entity-unescaped."""
    return [
        _html.unescape(m).strip() for m in _LOC_RX.findall(xml_text or "")
    ]


def filter_job_locs(locs: list[str]) -> list[str]:
    """Job-keyword filter (career_pages_service.py:305-309)."""
    return [
        u for u in locs if any(kw in u.lower() for kw in JOB_LOC_KEYWORDS)
    ]


def sitemap_jobs_batch(batch: pa.Table) -> pa.Table:
    """sitemap pages → (sitemap_url, loc) rows for job-related locs.
    Input: url, html."""
    urls = batch["url"].to_pylist()
    htmls = batch["html"].to_pylist()
    out_src, out_loc = [], []
    for u, h in zip(urls, htmls):
        if not u.endswith("/sitemap.xml"):
            continue
        xml = h.decode("utf-8", errors="ignore") if isinstance(
            h, (bytes, bytearray)
        ) else (h or "")
        for loc in filter_job_locs(parse_sitemap_locs(xml)):
            out_src.append(u)
            out_loc.append(loc)
    return pa.table(
        {
            "sitemap_url": pa.array(out_src, pa.string()),
            "loc": pa.array(out_loc, pa.string()),
        }
    )

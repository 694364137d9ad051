"""M31 — API-response job parser (job_extraction_service.py:3740-3805):
probe 5 JSON response shapes and coalesce field aliases into canonical
job records.
"""

from __future__ import annotations

import json

import pyarrow as pa

__all__ = ["parse_api_job_data", "api_jobs_batch"]


def parse_api_job_data(data, base_url: str) -> list[dict]:
    """job_extraction_service.py:3740-3805 (shape probe is if/elif, so
    only the FIRST matching structure is taken)."""
    job_lists = []
    if isinstance(data, dict):
        if "jobs" in data and isinstance(data["jobs"], list):
            job_lists.append(data["jobs"])
        elif "data" in data and isinstance(data["data"], dict):
            if "jobs" in data["data"] and isinstance(
                data["data"]["jobs"], list
            ):
                job_lists.append(data["data"]["jobs"])
        elif "results" in data and isinstance(data["results"], list):
            job_lists.append(data["results"])
        elif "items" in data and isinstance(data["items"], list):
            job_lists.append(data["items"])
        elif any(k in data for k in ("title", "name", "position")) and len(
            data
        ):
            job_lists.append([data])
    elif isinstance(data, list):
        job_lists.append(data)

    jobs = []
    for job_list in job_lists:
        for job in job_list:
            if not isinstance(job, dict):
                continue
            title = (
                job.get("title") or job.get("name") or job.get("position")
                or job.get("job_title") or ""
            )
            url = (
                job.get("url") or job.get("link") or job.get("apply_url")
                or base_url
            )
            if title and url:
                jobs.append(
                    {
                        "title": title,
                        "company": "",
                        "location": (
                            job.get("location") or job.get("city")
                            or job.get("address") or ""
                        ),
                        "job_type": (
                            job.get("type") or job.get("employment_type")
                            or job.get("job_type") or "Full-time"
                        ),
                        "salary": job.get("salary") or "",
                        "posted_date": (
                            job.get("date") or job.get("created_at") or ""
                        ),
                        "url": url
                        if url.startswith("http")
                        else f"{base_url.rstrip('/')}/{url.lstrip('/')}",
                        "description": (
                            job.get("description") or job.get("summary")
                            or job.get("details") or ""
                        ),
                        "requirements": job.get("requirements") or "",
                        "benefits": job.get("benefits") or "",
                    }
                )
    return jobs


_COLS = [
    "title", "company", "location", "job_type", "salary", "posted_date",
    "url", "description", "requirements", "benefits",
]


def api_jobs_batch(batch: pa.Table) -> pa.Table:
    """API-endpoint pages (body = JSON) → canonical job rows.
    Input: url, html."""
    urls = batch["url"].to_pylist()
    htmls = batch["html"].to_pylist()
    cols: dict[str, list] = {"source_url": [], "job_index": []}
    cols.update({c: [] for c in _COLS})
    for u, h in zip(urls, htmls):
        if "/api/" not in u:
            continue
        body = h.decode("utf-8", errors="ignore") if isinstance(
            h, (bytes, bytearray)
        ) else (h or "")
        try:
            data = json.loads(body)
        except ValueError:
            continue
        for i, job in enumerate(parse_api_job_data(data, u)):
            cols["source_url"].append(u)
            cols["job_index"].append(i)
            for c in _COLS:
                cols[c].append(job[c])
    arrays = {
        "source_url": pa.array(cols["source_url"], pa.string()),
        "job_index": pa.array(cols["job_index"], pa.int32()),
    }
    for c in _COLS:
        arrays[c] = pa.array(cols[c], pa.string())
    return pa.table(arrays)

"""User-facing job formatting — the reference's
``user_friendly_formatter.py`` per-record transforms (the fields every
API response carries: display technologies, star quality, match %,
recommendation, urgency, benefits) plus its jobs-list summary rollup.

Ported as pure functions over the enriched job record
(``job_quality.enhance_job`` output):

* ``_extract_user_friendly_technologies`` (:73-115) — tech keywords →
  filter short/excluded → display-case mapping → top 5.  The underlying
  ``extract_technologies`` returns a SORTED list here (engine
  determinism deviation, same as ``job_quality``: the reference's
  ``list(set(...))`` order is process-dependent).
* ``_get_user_friendly_level`` (:117-130), ``_is_remote`` (:132-142),
  ``_get_quality_stars`` (:144-155), ``_calculate_match_percentage``
  (:157-161), ``_generate_recommendation`` (:163-179),
  ``_get_urgency_level`` (:180-203), ``_extract_benefits`` (:204-225).
* ``_create_summary`` (:225-262) — counts reproduce the reference's
  substring tests on the emoji strings verbatim; ``top_technologies``
  uses (count desc, tech asc) ordering instead of ``Counter`` insertion
  order (process-order-dependent in a distributed engine — deviation
  documented).
"""

from __future__ import annotations

import re

import pyarrow as pa

from .job_quality import extract_job_level, extract_technologies

__all__ = [
    "LEVEL_MAPPING",
    "REMOTE_INDICATORS",
    "BENEFIT_KEYWORDS",
    "TECH_EXCLUDED",
    "TECH_DISPLAY",
    "friendly_technologies",
    "friendly_level",
    "is_remote",
    "quality_stars",
    "match_percentage",
    "recommendation",
    "urgency_level",
    "friendly_benefits",
    "user_friendly_job",
    "user_friendly_batch",
]

# :117-130
LEVEL_MAPPING = {
    "JUNIOR": "Junior",
    "MIDDLE": "Mid-level",
    "SENIOR": "Senior",
    "LEAD": "Lead",
    "PRINCIPAL": "Principal",
    "MANAGER": "Manager",
    "EXECUTIVE": "Executive",
    "UNKNOWN": "Not specified",
}

# :137-141
REMOTE_INDICATORS = [
    "remote", "work from home", "wfh", "virtual",
    "online", "anywhere", "worldwide", "global",
]

# :210-215
BENEFIT_KEYWORDS = [
    "health insurance", "remote work", "flexible hours",
    "stock options", "bonus", "equity", "learning",
    "professional development", "team events", "competitive salary",
    "relocation", "work from home", "flexible schedule",
]

# :85-86 — skipped short/ambiguous tech tokens
TECH_EXCLUDED = {"r", "js", "ts"}

# :87-113 — explicit display names; anything else gets str.title()
TECH_DISPLAY = {
    "node.js": "Node.js",
    "react": "React",
    "vue": "Vue.js",
    "angular": "Angular",
    "python": "Python",
    "java": "Java",
    "php": "PHP",
    "laravel": "Laravel",
    "django": "Django",
    "aws": "AWS",
    "docker": "Docker",
    "kubernetes": "Kubernetes",
}

_DAYS_AGO_RX = re.compile(r"(\d+)\s*days?\s*ago")


def friendly_technologies(description: str) -> list[str]:
    """:73-115 — extract, filter, display-case, top 5."""
    out = []
    for tech in extract_technologies(description or ""):
        if len(tech) > 2 and tech not in TECH_EXCLUDED:
            out.append(TECH_DISPLAY.get(tech, tech.title()))
    return out[:5]


def friendly_level(technical_level: str) -> str:
    return LEVEL_MAPPING.get(technical_level, "Not specified")


def is_remote(location: str) -> bool:
    if not location:
        return False
    low = location.lower()
    return any(ind in low for ind in REMOTE_INDICATORS)


def quality_stars(overall: float) -> str:
    if overall >= 0.9:
        return "⭐⭐⭐⭐⭐"
    if overall >= 0.8:
        return "⭐⭐⭐⭐"
    if overall >= 0.7:
        return "⭐⭐⭐"
    if overall >= 0.6:
        return "⭐⭐"
    return "⭐"


def match_percentage(overall: float) -> str:
    return f"{int(overall * 100)}%"


def recommendation(overall: float, completeness: float, freshness: float) -> str:
    if overall >= 0.8 and freshness >= 0.8:
        return "🔥 Apply now - Excellent opportunity!"
    if overall >= 0.7:
        return "✅ Good match - Worth applying"
    if overall >= 0.6:
        return "🤔 Consider applying"
    if completeness < 0.5:
        return "⚠️ Limited information - Research more"
    return "📋 Basic opportunity"


def urgency_level(posted_date: str) -> str:
    if not posted_date:
        return "Unknown"
    m = _DAYS_AGO_RX.search(posted_date.lower())
    if not m:
        return "Unknown"
    days = int(m.group(1))
    if days <= 1:
        return "🔥 Very Urgent"
    if days <= 3:
        return "⚡ Urgent"
    if days <= 7:
        return "📅 Recent"
    if days <= 14:
        return "📆 Moderate"
    return "⏰ Old"


def friendly_benefits(description: str) -> list[str]:
    if not description:
        return []
    low = description.lower()
    return [b.title() for b in BENEFIT_KEYWORDS if b in low][:3]


def user_friendly_job(raw: dict) -> dict:
    """:16-47 — the per-job record.  Like the reference formatter, runs
    the analyzer itself on the raw job (``format_job_for_user`` calls
    ``analyzer.analyze_job(job_data)``): enhancement + posted-date +
    quality scores, then the display transforms."""
    from .job_quality import (
        enhance_job,
        extract_posted_date,
        extract_requirements_benefits,
        quality_scores,
    )

    job = enhance_job(dict(raw), raw["source_url"])
    desc = job.get("description") or ""
    job["posted_date"] = extract_posted_date(desc) or ""
    req, ben = extract_requirements_benefits(desc)
    job["requirements"], job["benefits"] = req, ben
    q = quality_scores(job)
    return {
        "title": job.get("title") or "",
        "company": job.get("company") or "",
        "location": job.get("location") or "",
        "type": job.get("job_type") or "",
        "salary": job.get("salary") or "",
        "posted": job.get("posted_date") or "",
        "technologies": friendly_technologies(desc),
        "level": friendly_level(extract_job_level(job.get("title") or "")),
        "remote": is_remote(job.get("location") or ""),
        "quality": quality_stars(q["overall"]),
        "match_score": match_percentage(q["overall"]),
        "recommendation": recommendation(
            q["overall"], q["completeness"], q["freshness"]
        ),
        "urgency": urgency_level(job.get("posted_date") or ""),
        "benefits": friendly_benefits(desc),
    }


def user_friendly_batch(batch: pa.Table) -> pa.Table:
    """Raw extracted-jobs rows (incl. ``description``) → user-friendly
    rows (lists pipe-joined for hash-stable comparison)."""
    rows = batch.select(
        [
            "source_url", "job_index", "title", "company", "location",
            "job_type", "salary", "description",
        ]
    ).to_pylist()
    out = {
        "source_url": [], "job_index": [], "title": [], "company": [],
        "location": [], "type": [], "salary": [], "posted": [],
        "technologies": [], "level": [], "remote": [], "quality": [],
        "match_score": [], "recommendation": [], "urgency": [],
        "benefits": [],
    }
    for r in rows:
        u = user_friendly_job(r)
        out["source_url"].append(r["source_url"])
        out["job_index"].append(r["job_index"])
        for k in ("title", "company", "location", "type", "salary",
                  "posted", "level", "quality", "match_score",
                  "recommendation", "urgency"):
            out[k].append(u[k])
        out["remote"].append(u["remote"])
        out["technologies"].append("|".join(u["technologies"]))
        out["benefits"].append("|".join(u["benefits"]))
    return pa.table(
        {
            "source_url": pa.array(out["source_url"], pa.string()),
            "job_index": pa.array(out["job_index"], pa.int64()),
            "title": pa.array(out["title"], pa.string()),
            "company": pa.array(out["company"], pa.string()),
            "location": pa.array(out["location"], pa.string()),
            "type": pa.array(out["type"], pa.string()),
            "salary": pa.array(out["salary"], pa.string()),
            "posted": pa.array(out["posted"], pa.string()),
            "technologies": pa.array(out["technologies"], pa.string()),
            "level": pa.array(out["level"], pa.string()),
            "remote": pa.array(out["remote"], pa.bool_()),
            "quality": pa.array(out["quality"], pa.string()),
            "match_score": pa.array(out["match_score"], pa.string()),
            "recommendation": pa.array(out["recommendation"], pa.string()),
            "urgency": pa.array(out["urgency"], pa.string()),
            "benefits": pa.array(out["benefits"], pa.string()),
        }
    )

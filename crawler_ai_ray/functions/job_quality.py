"""Job enrichment + analyzer operators — the reference's job-detail
enhancement (job_extraction_service.py:579-660), description scalar
extractors (M22 posted-date :1955-1977, M23 requirements/benefits
:1979-2015), and the job-analyzer quality/level/category/technology
family (job_analyzer.py:356-498 with weight tables from
utils/job_constants.py:33-283) as pure scalar functions + an Arrow
batch wrapper.

Engine deviations (documented):

* ``extract_technologies`` returns a **sorted** list — the reference
  returns ``list(set(...))`` whose order is process-dependent
  (job_analyzer.py:366); set-equality is preserved.
* the reference's posted-date *filter* calls ``datetime.timedelta``
  (job_extraction_service.py:566-571), an AttributeError at runtime;
  `matches_posted_date` uses the correct ``timedelta`` and keeps the
  reference's tolerant include-on-error contract.
"""

from __future__ import annotations

import re
from datetime import datetime, timedelta
from urllib.parse import urlparse

import pyarrow as pa

__all__ = [
    "enhance_job",
    "normalize_job_type_service",
    "extract_location_from_description",
    "extract_salary_from_description",
    "extract_posted_date",
    "extract_requirements_benefits",
    "quality_scores",
    "extract_technologies",
    "extract_job_level",
    "categorize_job",
    "matches_posted_date",
    "enrich_jobs_batch",
]

# --- job_extraction_service.py:62-78 ---------------------------------------

JOB_TYPE_MAPPINGS = {
    "full-time": ["full time", "fulltime", "toàn thời gian", "chính thức"],
    "part-time": ["part time", "parttime", "bán thời gian", "thời vụ"],
    "contract": ["contract", "hợp đồng", "temporary", "tạm thời"],
    "internship": ["intern", "internship", "thực tập", "trainee"],
    "remote": ["remote", "work from home", "làm việc từ xa", "online"],
    "hybrid": ["hybrid", "kết hợp", "flexible", "linh hoạt"],
}

LOCATION_PATTERNS = {
    "hanoi": ["hà nội", "hanoi", "hn", "thăng long"],
    "ho_chi_minh": ["hồ chí minh", "ho chi minh", "hcm", "tp.hcm", "saigon"],
    "da_nang": ["đà nẵng", "da nang", "danang"],
    "can_tho": ["cần thơ", "can tho", "cantho"],
    "hai_phong": ["hải phòng", "hai phong", "haiphong"],
}

_SALARY_RXS = [
    re.compile(p, re.IGNORECASE)
    for p in [
        r"lương\s*up\s*to[:\s]*([^,\n]+)",
        r"lương[:\s]*([^,\n]+)",
        r"salary[:\s]*([^,\n]+)",
        r"up\s*to[:\s]*([^,\n]+)",
        r"(\d+[kKmM])",
        r"(\$\d+[kKmM]?)",
        r"(\d+\s*[tT]r[iỉ][eệ][uú])",
        r"(\d+\s*[mM]illion)",
        r"(\d{1,3}(?:,\d{3})*(?:\.\d{2})?)\s*(?:USD|VND|đồng|dollar)",
        r"(\d{1,3}(?:,\d{3})*(?:\.\d{2})?)\s*(?:triệu|million)",
        r"(\d{1,3}(?:,\d{3})*(?:\.\d{2})?)\s*(?:k|K)",
        r"(\d{1,3}(?:,\d{3})*(?:\.\d{2})?)\s*(?:USD|VND)",
    ]
]

_DATE_RXS = [
    re.compile(p, re.IGNORECASE)
    for p in [
        r"ngày đăng[:\s]*(\d{1,2}/\d{1,2}/\d{4})",
        r"posted[:\s]*(\d{1,2}/\d{1,2}/\d{4})",
        r"date[:\s]*(\d{1,2}/\d{1,2}/\d{4})",
        r"(\d{1,2}/\d{1,2}/\d{4})",
    ]
]


def normalize_job_type_service(job_type: str) -> str:
    """job_extraction_service.py:606-615 (first-match over the mapping,
    default back to the input or 'Full-time')."""
    lower = (job_type or "").lower()
    for standard, keywords in JOB_TYPE_MAPPINGS.items():
        for kw in keywords:
            if kw in lower:
                return standard
    return job_type or "Full-time"


def extract_location_from_description(description: str) -> str | None:
    """job_extraction_service.py:617-626."""
    lower = (description or "").lower()
    for name, patterns in LOCATION_PATTERNS.items():
        for pat in patterns:
            if pat in lower:
                return name.replace("_", " ").title()
    return None


def extract_salary_from_description(description: str) -> str | None:
    """job_extraction_service.py:628-656."""
    for rx in _SALARY_RXS:
        m = rx.search(description or "")
        if m:
            salary = m.group(1).strip()
            if salary:
                return salary
    return None


def extract_posted_date(description: str) -> str | None:
    """M22 (job_extraction_service.py:1955-1977)."""
    for rx in _DATE_RXS:
        m = rx.search(description or "")
        if m:
            return m.group(1)
    return None


def extract_requirements_benefits(description: str) -> tuple[str, str]:
    """M23 (job_extraction_service.py:1979-2015) — line-based section
    state machine collecting '-'-prefixed bullets."""
    requirements = ""
    benefits = ""
    section = ""
    for line in (description or "").split("\n"):
        line = line.strip()
        if not line:
            continue
        low = line.lower()
        if any(k in low for k in ("yêu cầu", "requirements", "điều kiện")):
            section = "requirements"
            continue
        if any(k in low for k in ("quyền lợi", "benefits", "phúc lợi",
                                  "lợi ích")):
            section = "benefits"
            continue
        if any(k in low for k in ("mô tả", "description", "công việc")):
            section = "description"
            continue
        if section == "requirements" and line.startswith("-"):
            requirements += line + "\n"
        elif section == "benefits" and line.startswith("-"):
            benefits += line + "\n"
    return requirements.strip(), benefits.strip()


def enhance_job(job: dict, career_url: str) -> dict:
    """_enhance_job_details (job_extraction_service.py:579-604): company
    fallback from the career URL's first host label, job-type
    normalization, location/salary backfill from the description."""
    out = dict(job)
    if not out.get("company"):
        out["company"] = urlparse(career_url).netloc.split(".")[0].title()
    out["job_type"] = normalize_job_type_service(out.get("job_type", ""))
    if not out.get("location"):
        loc = extract_location_from_description(out.get("description", ""))
        if loc:
            out["location"] = loc
    if not out.get("salary"):
        sal = extract_salary_from_description(out.get("description", ""))
        if sal:
            out["salary"] = sal
    return out


# --- job_analyzer.py quality family ----------------------------------------

COMPLETENESS_REQUIRED = ["title", "description", "location", "company",
                         "job_type"]
COMPLETENESS_OPTIONAL = ["salary", "posted_date", "requirements", "benefits",
                         "tags"]

RELEVANCE_KEYWORDS = {
    3.0: [
        "software engineer", "developer", "programmer", "frontend",
        "backend", "full-stack", "devops", "data engineer",
        "machine learning",
    ],
    2.0: [
        "designer", "manager", "analyst", "specialist", "coordinator",
        "assistant", "consultant", "architect",
    ],
    1.0: ["intern", "trainee", "junior", "entry level", "fresh graduate"],
}

_DAYS_AGO_RX = re.compile(r"(\d+)\s*days?\s*ago")


def _completeness(job: dict) -> float:
    """job_analyzer.py:414-441 with weights from job_constants.py:252-259."""
    req = sum(
        1.0
        for f in COMPLETENESS_REQUIRED
        if job.get(f) and str(job[f]).strip()
    ) / len(COMPLETENESS_REQUIRED)
    opt = sum(
        1.0
        for f in COMPLETENESS_OPTIONAL
        if job.get(f) and str(job[f]).strip()
    ) / len(COMPLETENESS_OPTIONAL)
    return req * 0.8 + opt * 0.2


def _relevance(job: dict) -> float:
    """job_analyzer.py:443-474: keyword-weighted ratio over
    title+description (max possible = 3·9 + 2·8 + 1·5 = 48)."""
    text = f"{(job.get('title') or '').lower()} " \
           f"{(job.get('description') or '').lower()}"
    score = 0.0
    max_possible = 0.0
    for weight, keywords in RELEVANCE_KEYWORDS.items():
        for kw in keywords:
            if kw in text:
                score += weight
            max_possible += weight
    if max_possible > 0:
        return min(1.0, score / max_possible)
    return 0.0


def _freshness(job: dict) -> float:
    """job_analyzer.py:476-498 with buckets from job_constants.py:277-283."""
    posted = job.get("posted_date", "") or ""
    if not posted:
        return 0.0
    m = _DAYS_AGO_RX.search(posted.lower())
    if not m:
        return 0.5
    days = int(m.group(1))
    if days <= 7:
        return 1.0
    if days <= 30:
        return 0.8
    if days <= 90:
        return 0.6
    if days <= 180:
        return 0.4
    return 0.2


def quality_scores(job: dict) -> dict:
    """A6 (job_analyzer.py:390-412): completeness/relevance/freshness,
    overall = min(1, 0.4·c + 0.4·r + 0.2·f)."""
    c = _completeness(job)
    r = _relevance(job)
    f = _freshness(job)
    overall = 0.0
    for val, w in ((c, 0.4), (r, 0.4), (f, 0.2)):
        overall += val * w
    return {
        "completeness": c,
        "relevance": r,
        "freshness": f,
        "overall": min(1.0, overall),
    }


TECHNOLOGY_KEYWORDS = [
    # job_constants.py:99-130 flattened in category order
    "javascript", "js", "typescript", "ts", "python", "java", "c#", "c++",
    "php", "ruby", "go", "rust", "swift", "kotlin", "scala", "r", "matlab",
    "react", "angular", "vue", "svelte", "next.js", "nuxt", "gatsby",
    "ember", "backbone", "jquery", "bootstrap", "tailwind",
    "node.js", "express", "django", "flask", "laravel", "spring",
    "asp.net", "rails", "fastapi", "gin", "echo",
    "mysql", "postgresql", "mongodb", "redis", "elasticsearch",
    "cassandra", "dynamodb", "firebase", "supabase", "sqlite",
    "aws", "azure", "google cloud", "gcp", "heroku", "digitalocean",
    "linode", "vultr", "cloudflare", "vercel", "netlify",
    "docker", "kubernetes", "jenkins", "gitlab", "github actions",
    "terraform", "ansible", "prometheus", "grafana", "elk stack",
    "react native", "flutter", "xamarin", "ionic", "cordova",
    "native android", "native ios",
]

JOB_LEVEL_PATTERNS = {
    "JUNIOR": [
        r"junior\s+\w+", r"entry\s*level", r"beginner", r"fresh",
        r"graduate", r"new\s+grad", r"recent\s+graduate", r"0-2\s+years",
        r"1-3\s+years",
    ],
    "MIDDLE": [
        r"middle\s+\w+", r"mid\s*level", r"intermediate", r"mid\s+level",
        r"3-5\s+years", r"2-5\s+years", r"3-7\s+years",
    ],
    "SENIOR": [
        r"senior\s+\w+", r"experienced", r"advanced", r"expert",
        r"5\+\s+years", r"5-10\s+years", r"7\+\s+years",
    ],
    "LEAD": [
        r"lead\s+\w+", r"team\s+lead", r"technical\s+lead",
        r"senior\s+lead", r"leadership", r"team\s+leader",
    ],
    "PRINCIPAL": [
        r"principal\s+\w+", r"architect", r"specialist", r"consultant",
        r"expert\s+level", r"senior\s+specialist",
    ],
}
_LEVEL_RXS = {
    level: [re.compile(p) for p in pats]
    for level, pats in JOB_LEVEL_PATTERNS.items()
}

JOB_CATEGORIES = {
    "ENGINEERING": [
        "software engineer", "developer", "programmer", "coder",
        "frontend developer", "backend developer", "full-stack developer",
        "devops engineer", "data engineer", "machine learning engineer",
        "mobile developer", "qa engineer", "test engineer",
        "system administrator",
    ],
    "DESIGN": [
        "ui/ux designer", "graphic designer", "product designer",
        "visual designer", "interaction designer", "user researcher",
        "designer", "creative designer",
    ],
    "MANAGEMENT": [
        "project manager", "product manager", "engineering manager",
        "team lead", "technical lead", "scrum master", "agile coach",
        "program manager",
    ],
    "MARKETING": [
        "marketing specialist", "digital marketing", "content marketing",
        "social media manager", "seo specialist", "growth hacker",
        "brand manager",
    ],
    "SALES": [
        "sales representative", "account manager", "business development",
        "sales manager", "customer success", "sales engineer",
    ],
    "DATA": [
        "data scientist", "data analyst", "business analyst",
        "data engineer", "machine learning engineer", "statistician",
        "research analyst",
    ],
    "HR": [
        "hr manager", "recruiter", "talent acquisition", "hr specialist",
        "people operations", "hr coordinator", "talent manager",
    ],
    "FINANCE": [
        "financial analyst", "accountant", "finance manager", "controller",
        "cfo", "financial advisor", "investment analyst",
    ],
    "OPERATIONS": [
        "operations manager", "operations analyst", "process improvement",
        "supply chain", "logistics", "operations specialist",
    ],
}


def extract_technologies(text: str) -> list[str]:
    """job_analyzer.py:356-366; returns sorted (engine determinism
    deviation — reference returns an unordered set)."""
    lower = (text or "").lower()
    return sorted({t for t in TECHNOLOGY_KEYWORDS if t in lower})


def extract_job_level(title: str) -> str:
    """job_analyzer.py:368-377 — first level whose pattern matches."""
    lower = (title or "").lower()
    for level, rxs in _LEVEL_RXS.items():
        for rx in rxs:
            if rx.search(lower):
                return level
    return "UNKNOWN"


def categorize_job(title: str) -> str:
    """job_analyzer.py:379-388 — first category whose keyword matches."""
    lower = (title or "").lower()
    for category, keywords in JOB_CATEGORIES.items():
        for kw in keywords:
            if kw in lower:
                return category
    return "OTHER"


def matches_posted_date(
    posted_date: str, date_filter: str, now: datetime
) -> bool:
    """Posted-date relative filter (job_extraction_service.py:536-577)
    with the reference's `datetime.timedelta` AttributeError fixed; the
    tolerant include-on-unparseable contract is preserved.  ``now`` is a
    parameter (no wall-clock reads in operators)."""
    if not posted_date:
        return True
    job_date = None
    for fmt in ("%Y-%m-%d", "%d/%m/%Y", "%m/%d/%Y", "%d-%m-%Y", "%Y/%m/%d",
                "%d.%m.%Y", "%Y.%m.%d"):
        try:
            job_date = datetime.strptime(posted_date, fmt)
            break
        except ValueError:
            continue
    if not job_date:
        return True
    days = {"last_week": 7, "last_month": 30, "last_3_months": 90}.get(
        date_filter
    )
    if days is None:
        return True
    return job_date >= now - timedelta(days=days)


# --- batch wrapper ---------------------------------------------------------

def enrich_jobs_batch(batch: pa.Table) -> pa.Table:
    """jobs → enhanced + analyzed rows: enhancement (:579-604), M22
    posted-date, M23 requirements/benefits, level/category/technologies,
    A6 quality scores.  Input columns: source_url, job_index, title,
    company, location, job_type, salary, description."""
    n = batch.num_rows
    cols: dict[str, list] = {
        k: []
        for k in (
            "company", "location", "job_type", "salary", "posted_date",
            "requirements", "benefits", "level", "category", "technologies",
            "q_completeness", "q_relevance", "q_freshness", "q_overall",
        )
    }
    rows = batch.select(
        ["source_url", "title", "company", "location", "job_type", "salary",
         "description"]
    ).to_pylist()
    for row in rows:
        job = enhance_job(row, row["source_url"])
        desc = job.get("description", "") or ""
        job["posted_date"] = extract_posted_date(desc) or ""
        req, ben = extract_requirements_benefits(desc)
        job["requirements"], job["benefits"] = req, ben
        q = quality_scores(job)
        cols["company"].append(job["company"])
        cols["location"].append(job["location"])
        cols["job_type"].append(job["job_type"])
        cols["salary"].append(job["salary"])
        cols["posted_date"].append(job["posted_date"])
        cols["requirements"].append(req)
        cols["benefits"].append(ben)
        cols["level"].append(extract_job_level(job.get("title", "")))
        cols["category"].append(categorize_job(job.get("title", "")))
        cols["technologies"].append(
            extract_technologies(f"{job.get('title', '')} {desc}")
        )
        cols["q_completeness"].append(q["completeness"])
        cols["q_relevance"].append(q["relevance"])
        cols["q_freshness"].append(q["freshness"])
        cols["q_overall"].append(q["overall"])
    out = batch.select(["source_url", "job_index", "title"])
    for name, vals in cols.items():
        typ = (
            pa.list_(pa.string())
            if name == "technologies"
            else pa.float64()
            if name.startswith("q_")
            else pa.string()
        )
        out = out.append_column(name, pa.array(vals, typ))
    assert out.num_rows == n
    return out

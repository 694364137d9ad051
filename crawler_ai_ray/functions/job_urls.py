"""Job-URL classifier family M14–M17 + pagination M37 — URL-string-only
predicates from the reference's job-extraction service, as pure scalar
functions + Arrow batch wrappers for ``map_batches`` stages.

* **M14** `is_job_url_service` — the service's simplified job-URL check
  (job_extraction_service.py:378-444): skip non-HTTP/asset URLs, ~60
  path patterns accept, career-page-root reject, permissive
  default-accept when no non-job pattern matches.  (The spider's strict
  variant M13 lives in :mod:`crawler_ai_ray.functions.classify` — both
  are kept because different reference endpoints gate on different
  ones.)
* **M15** `is_valid_job_url_pattern` — must contain one of 8 job path
  patterns and not be a known careers-category page
  (job_extraction_service.py:1605-1636).
* **M16** `validate_job_urls` — list filter dropping the career page
  itself, ``/load/`` AJAX URLs, ``/product`` pages, ``#`` fragments and
  generic career roots (job_extraction_service.py:3089-3132).
* **M17** `is_career_page_url` — career-page vs job-page URL dispatch
  (job_extraction_service.py:1638-1670).
* **M37** `is_pagination_url` / `pagination_candidates` — pagination
  predicate (job_extraction_service.py:446-449) and the ``?paged=2..10``
  candidate generator (job_extraction_service.py:267-321; the inner
  pattern loop breaks on the first pattern, so every candidate uses the
  ``paged`` param).
"""

from __future__ import annotations

from urllib.parse import parse_qs, urlencode, urlparse, urlunparse

import pyarrow as pa

__all__ = [
    "is_http_url",
    "is_job_url_service",
    "is_valid_job_url_pattern",
    "is_career_page_url",
    "is_pagination_url",
    "pagination_candidates",
    "validate_job_urls",
    "job_url_flags_batch",
    "pagination_candidates_batch",
]

_SKIP_FILES = [".xml", ".json", ".pdf", ".doc", ".docx", "sitemap.xml",
               "robots.txt"]

_M14_JOB_PATTERNS = [
    "/job/", "/jobs/", "/career/", "/careers/", "/position/", "/vacancy/",
    "/opportunity/", "/opening/", "/apply/", "/recruitment/", "/employment/",
    "/hiring/", "/tuyen-dung/", "/viec-lam/", "/co-hoi/", "/nhan-vien/",
    "/ung-vien/", "/cong-viec/", "/lam-viec/", "/thu-viec/", "/chinh-thuc/",
    "/nghe-nghiep/", "/tim-viec/", "/dang-tuyen/", "/vi-tri/", "/ung-tuyen/",
    "/ho-so/", "/phong-van/", "/developer/", "/engineer/", "/analyst/",
    "/manager/", "/specialist/", "/consultant/", "/coordinator/",
    "/assistant/", "/director/", "/lead/", "/senior/", "/junior/",
    "/intern/", "/trainee/", "/graduate/", "/remote/", "/hybrid/",
    "/full-time/", "/part-time/", "/contract/", "/freelance/",
    "/temporary/", "/role/", "/title/", "/posting/", "/listing/",
    "/search/", "/find/", "/browse/", "/view/", "/detail/",
    "/description/", "/requirements/",
]

_M14_NON_JOB_PATTERNS = [
    "/about", "/contact", "/privacy", "/terms", "/cookie", "/news", "/blog",
    "/press", "/media", "/investor", "/sustainability", "/diversity",
    "/culture", "/values", "/leadership", "/team", "/office", "/location",
    "/university", "/training", "/development", "/program", "/event",
    "/webinar", "/conference", "/award", "/partnership", "/client",
    "/customer", "/service", "/product", "/solution", "/technology",
    "/innovation", "/research", "/case-study", "/whitepaper", "/report",
]

_M15_JOB_PATTERNS = [
    "/job/", "/jobs/", "/position/", "/vacancy/", "/opening/", "/career/",
    "/tuyen-dung/", "/viec-lam/",
]

_CAREERS_CATEGORY_PAGES = [
    "/careers/our-culture", "/careers/benefits",
    "/careers/recruitment-process", "/careers/training-courses",
    "/careers/opening-positions", "/careers/career-your-benefits",
]

_M17_CAREER_INDICATORS = [
    "/career", "/careers", "/jobs", "/positions", "/tuyen-dung",
    "/recruitment", "/vacancies", "/openings", "/opportunities",
]
_M17_ROLE_KEYWORDS = ["developer", "engineer", "designer", "manager",
                      "analyst", "senior", "junior"]

_PAGINATION_INDICATORS = ["?paged=", "?page=", "?p=", "/page/"]
_PAGINATION_PATTERNS = [
    "?paged=", "?page=", "?p=", "?pg=",
    "/page/", "/p/", "/pg/",
    "&paged=", "&page=", "&p=", "&pg=",
]


def is_http_url(url: str) -> bool:
    """job_extraction_service.py:369-377."""
    try:
        return urlparse(url).scheme in ("http", "https")
    except ValueError:
        return False


def is_job_url_service(url: str) -> bool:
    """M14 — the simplified/permissive job-URL check
    (job_extraction_service.py:378-444)."""
    url_lower = url.lower()
    if not url or url_lower.startswith(("javascript:", "mailto:", "tel:", "#")):
        return False
    if not is_http_url(url):
        return False
    if any(ext in url_lower for ext in _SKIP_FILES):
        return False
    has_job_pattern = any(p in url_lower for p in _M14_JOB_PATTERNS)
    stripped = url_lower.rstrip("/")
    if stripped.endswith(("/career", "/careers", "/jobs")):
        return False
    path = urlparse(url).path.strip("/")
    if not path:
        return False
    if has_job_pattern:
        return True
    return not any(p in url_lower for p in _M14_NON_JOB_PATTERNS)


def is_valid_job_url_pattern(url: str) -> bool:
    """M15 (job_extraction_service.py:1605-1636)."""
    url_lower = url.lower()
    for pattern in _M15_JOB_PATTERNS:
        if pattern in url_lower:
            if any(cat in url_lower for cat in _CAREERS_CATEGORY_PAGES):
                return False
            return True
    return False


def is_career_page_url(url: str) -> bool:
    """M17 — career page vs specific job page
    (job_extraction_service.py:1638-1670)."""
    url_lower = url.lower()
    parsed = urlparse(url_lower)
    domain = parsed.netloc.lower()
    if domain.startswith(("career.", "careers.", "jobs.")):
        return True
    for ind in _M17_CAREER_INDICATORS:
        if url_lower.endswith(ind) or url_lower.endswith(ind + "/"):
            return True
    for ind in _M17_CAREER_INDICATORS:
        if ind in url_lower:
            if not any(kw in url_lower for kw in _M17_ROLE_KEYWORDS):
                return True
    return False


def is_pagination_url(url: str) -> bool:
    """M37 predicate (job_extraction_service.py:446-449)."""
    return any(ind in url.lower() for ind in _PAGINATION_INDICATORS)


def pagination_candidates(career_url: str) -> list[str]:
    """M37 generator (job_extraction_service.py:267-321): pages 2..10
    with the first pagination pattern's param (``paged``) set — the
    reference's inner loop breaks unconditionally on the first pattern."""
    parsed = urlparse(career_url)
    query_params = parse_qs(parsed.query)
    urls = []
    for page_num in range(2, 11):
        new_params = dict(query_params)
        new_params["paged"] = [str(page_num)]
        urls.append(
            urlunparse(
                (
                    parsed.scheme,
                    parsed.netloc,
                    parsed.path,
                    parsed.params,
                    urlencode(new_params, doseq=True),
                    parsed.fragment,
                )
            )
        )
    return urls


def validate_job_urls(job_urls: list[str], career_page_url: str) -> list[str]:
    """M16 (job_extraction_service.py:3089-3132)."""
    out = []
    for url in job_urls:
        if url == career_page_url:
            continue
        if not is_valid_job_url_pattern(url):
            continue
        if "/load/" in url:
            continue
        if "/product" in url:
            continue
        if "#" in url:
            continue
        if any(
            url.endswith(s) for s in ("/career", "/careers", "/jobs",
                                      "/positions")
        ):
            continue
        out.append(url)
    return out


# --- batch wrappers --------------------------------------------------------

def job_url_flags_batch(batch: pa.Table, url_col: str = "url") -> pa.Table:
    """All four URL predicates in one pass → boolean flag columns."""
    urls = batch[url_col].to_pylist()
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "is_job_url_service": pa.array(
                [is_job_url_service(u) for u in urls], pa.bool_()
            ),
            "is_valid_job_pattern": pa.array(
                [is_valid_job_url_pattern(u) for u in urls], pa.bool_()
            ),
            "is_career_page_url": pa.array(
                [is_career_page_url(u) for u in urls], pa.bool_()
            ),
            "is_pagination_url": pa.array(
                [is_pagination_url(u) for u in urls], pa.bool_()
            ),
        }
    )


def pagination_candidates_batch(
    batch: pa.Table, url_col: str = "url"
) -> pa.Table:
    """M37 as a flat-map-shaped batch fn → (source_url, page_no,
    candidate_url) rows, 9 per input URL."""
    srcs, pages, cands = [], [], []
    for u in batch[url_col].to_pylist():
        for i, cand in enumerate(pagination_candidates(u), start=2):
            srcs.append(u)
            pages.append(i)
            cands.append(cand)
    return pa.table(
        {
            "source_url": pa.array(srcs, pa.string()),
            "page_no": pa.array(pages, pa.int32()),
            "candidate_url": pa.array(cands, pa.string()),
        }
    )

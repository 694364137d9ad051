"""Rule-based job validation + response formatting — the reference's
"AI validation" (job_extraction_service.py:1120-1279, keyword rules,
no model) and the flat n8n-facing job response
(_format_job_response :1023-1073, _empty_job_response :1075-1100).

`validate_job` returns (verdict, reason-code) so the engine's filter
stage can carry WHY a row was dropped (the reference only logs it).
"""

from __future__ import annotations

import re

import pyarrow as pa

from .jobs import summarize_description

__all__ = [
    "validate_job",
    "format_job_response",
    "empty_job_response",
    "validate_jobs_batch",
]

# :1137-1149
NON_JOB_URL_PATTERNS = [
    "/chinh-sach-bao-mat", "/privacy-policy", "/privacy",
    "/dieu-khoan-dich-vu", "/terms-of-service", "/terms",
    "/cookie-policy", "/cookies", "/legal",
    "/about", "/about-us", "/gioi-thieu",
    "/contact", "/lien-he", "/lien-lac",
    "/news", "/tin-tuc", "/blog",
    "/services", "/dich-vu", "/san-pham", "/products",
    "/home", "/homepage", "/trang-chu",
    "/login", "/register", "/sign-up", "/dang-nhap", "/dang-ky",
    "/en/", "/english/", "/lang/",
    ".jpg", ".png", ".gif", ".pdf", ".doc", ".docx",
]

# :1168-1188
CRITICAL_REJECT = [
    "404", "not found", "page not found", "error",
    "trang không tìm thấy",
    "privacy policy", "chính sách bảo mật", "terms of service",
    "điều khoản dịch vụ", "cookie policy", "chính sách cookie",
    "legal notice", "thông báo pháp lý",
    "about us", "giới thiệu công ty", "company overview",
    "tổng quan công ty", "our story", "câu chuyện của chúng tôi",
    "company history", "lịch sử công ty", "our team",
    "đội ngũ của chúng tôi", "leadership team", "ban lãnh đạo",
    "mission vision", "tầm nhìn sứ mệnh", "core values",
    "giá trị cốt lõi",
    "contact us", "liên hệ với chúng tôi", "get in touch",
    "contact information", "our services", "dịch vụ của chúng tôi",
    "service portfolio", "danh mục dịch vụ", "our products",
    "sản phẩm của chúng tôi", "product catalog", "danh mục sản phẩm",
    "login", "đăng nhập", "register", "đăng ký", "sign up", "sign in",
    "create account", "tạo tài khoản", "forgot password",
    "quên mật khẩu",
]

# :1196-1230
POSITIVE_JOB_INDICATORS = [
    "responsibilities", "requirements", "qualifications",
    "skills required", "job description", "position summary",
    "role overview", "what you will do", "we are looking for",
    "ideal candidate", "successful candidate", "experience",
    "years of experience", "education", "degree", "salary",
    "compensation", "benefits", "package", "bonus", "apply",
    "application", "submit cv", "send resume", "full-time",
    "part-time", "contract", "temporary", "permanent", "remote",
    "hybrid", "on-site", "work from home", "developer", "engineer",
    "manager", "analyst", "designer", "specialist", "coordinator",
    "assistant", "executive", "senior", "junior", "lead", "principal",
    "intern", "vacancy", "opening", "opportunity", "hiring",
    "trách nhiệm", "yêu cầu", "kỹ năng", "kinh nghiệm",
    "mô tả công việc", "vị trí tuyển dụng", "ứng viên lý tưởng",
    "bạn sẽ làm gì", "chúng tôi đang tìm kiếm", "học vấn", "bằng cấp",
    "chứng chỉ", "lương", "mức lương", "phúc lợi", "chế độ đãi ngộ",
    "ứng tuyển", "nộp hồ sơ", "gửi cv", "làm việc toàn thời gian",
    "làm việc bán thời gian", "hợp đồng", "thời vụ",
    "làm việc từ xa", "làm việc tại nhà", "hybrid", "lập trình viên",
    "kỹ sư", "quản lý", "phân tích", "thiết kế", "chuyên viên",
    "điều phối viên", "trợ lý", "giám đốc", "cấp cao", "cấp thấp",
    "trưởng nhóm", "thực tập sinh", "vị trí tuyển dụng",
    "cơ hội việc làm",
]

# :1238-1252
JOB_TITLE_KEYWORDS = [
    "assistant", "designer", "engineer", "developer", "manager",
    "analyst", "specialist", "coordinator", "executive", "intern",
    "senior", "junior", "lead", "principal", "administrative", "ux",
    "ui", "full", "stack", "frontend", "backend", "mobile", "web",
    "software", "data", "qa", "test", "devops", "product", "marketing",
    "sales", "hr", "finance", "accounting", "legal", "operations",
    "support", "customer", "content", "social", "digital", "growth",
    "business", "strategy", "consultant", "advisor", "director",
    "head", "chief", "vp", "cfo", "cto", "ceo", "management",
    "quản lý", "nhân sự", "hrm", "thực tập sinh", "intern", "trainee",
    "chuyên viên", "nhân viên", "kế toán", "accountant",
    "trưởng phòng", "giám đốc", "phó giám đốc", "phân tích viên",
    "trợ lý", "assistant", "quản lý dự án", "project management",
    "phát triển kinh doanh", "business development", "giải pháp",
    "solution", "triển khai", "delivery",
]

_BORDERLINE_TITLE_WORDS = [
    "tuyển dụng", "hiring", "job", "position", "developer", "engineer",
    "manager",
]


def validate_job(job: dict, job_url: str) -> tuple[bool, str]:
    """:1120-1279 — (verdict, reason-code)."""
    title = (job.get("title") or "").strip()
    description = (job.get("description") or "").strip()
    url_lower = job_url.lower()
    for pattern in NON_JOB_URL_PATTERNS:
        if pattern in url_lower:
            return False, f"url:{pattern}"
    if not title and not description:
        return False, "empty"
    if not description or len(description.strip()) < 30:
        return False, "short_description"
    content = f"{title} {description}".lower()
    for indicator in CRITICAL_REJECT:
        if indicator in content:
            return False, f"critical:{indicator}"
    positive = sum(1 for ind in POSITIVE_JOB_INDICATORS if ind in content)
    title_lower = title.lower()
    if positive == 0:
        if len(title) > 5 and any(
            kw in title_lower for kw in JOB_TITLE_KEYWORDS
        ):
            return True, "job_like_title"
    if positive >= 3:
        return True, f"strong_indicators:{positive}"
    if positive >= 1:
        if len(title) > 5 and any(
            w in title_lower for w in _BORDERLINE_TITLE_WORDS
        ):
            return True, f"job_title_with_indicators:{positive}"
        if len(title) > 5 and any(
            kw in title_lower for kw in JOB_TITLE_KEYWORDS
        ):
            return True, f"job_like_title_with_indicators:{positive}"
        return False, f"few_indicators:{positive}"
    return False, "no_indicators"


def _inferred_index(job_url: str, job_index: int | None, job_data_index):
    try:
        return (
            job_index
            or job_data_index
            or (
                int(job_url.split("#job-")[1])
                if "#job-" in job_url
                else None
            )
            or 1
        )
    except (ValueError, IndexError, TypeError):
        return 1


def format_job_response(
    job_data: dict,
    job_url: str,
    success: bool = True,
    error_message: str | None = None,
    job_index: int | None = None,
) -> dict:
    """:1023-1073 — flat n8n-facing record; empty/short data flips
    success; long descriptions are summarized (M21)."""
    title = (job_data.get("title") or "").strip()
    description = (job_data.get("description") or "").strip()
    if not title or not description or len(description) < 10:
        success = False
        error_message = "Job data is empty or invalid"
    return {
        "success": success,
        "job_url": job_url,
        "job_index": _inferred_index(
            job_url, job_index, job_data.get("job_index")
        ),
        "job_name": job_data.get("title", ""),
        "job_type": job_data.get("job_type", "Full-time"),
        "job_role": job_data.get("title", ""),
        "job_description": summarize_description(description),
        "location": job_data.get("location", ""),
        "salary": job_data.get("salary", ""),
        "job_link": job_url,
        "crawl_time": 0,
        "crawl_method": "direct_cache" if success else "failed",
        "error_message": error_message,
    }


def empty_job_response(
    job_url: str,
    error_message: str = "Job not found",
    job_index: int | None = None,
) -> dict:
    """:1075-1100."""
    return {
        "success": False,
        "job_url": job_url,
        "job_index": _inferred_index(job_url, job_index, None),
        "job_name": "",
        "job_type": "Full-time",
        "job_role": "",
        "job_description": "",
        "location": "",
        "salary": "",
        "job_link": job_url,
        "crawl_time": 0,
        "crawl_method": "failed",
        "error_message": error_message,
    }


def validate_jobs_batch(batch: pa.Table) -> pa.Table:
    """jobs → validation verdict + formatted-response fields.  Input
    columns: source_url, job_index, title, description, job_type,
    location, salary."""
    rows = batch.to_pylist()
    cols: dict[str, list] = {
        k: []
        for k in ("source_url", "job_index", "is_valid", "reason",
                  "job_name", "job_description", "response_success")
    }
    for r in rows:
        url = r["source_url"]
        ok, reason = validate_job(r, url)
        resp = format_job_response(r, url, job_index=r.get("job_index"))
        cols["source_url"].append(url)
        cols["job_index"].append(r["job_index"])
        cols["is_valid"].append(ok)
        cols["reason"].append(reason)
        cols["job_name"].append(resp["job_name"])
        cols["job_description"].append(resp["job_description"])
        cols["response_success"].append(resp["success"])
    return pa.table(
        {
            "source_url": pa.array(cols["source_url"], pa.string()),
            "job_index": pa.array(cols["job_index"], pa.int32()),
            "is_valid": pa.array(cols["is_valid"], pa.bool_()),
            "reason": pa.array(cols["reason"], pa.string()),
            "job_name": pa.array(cols["job_name"], pa.string()),
            "job_description": pa.array(cols["job_description"], pa.string()),
            "response_success": pa.array(
                cols["response_success"], pa.bool_()
            ),
        }
    )

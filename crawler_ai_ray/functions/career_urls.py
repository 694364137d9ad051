"""Career-URL analysis operators M11 + M12 — the reference's two
URL-only career classifiers, re-expressed as pure scalar functions for
``map_batches`` stages.

* **M11** — additive confidence scoring with thresholds
  (career_pages_service.py:328-476): subdomain +2.0, exact keyword
  +1.0, career path +1.2, generic segment +0.3, domain keyword +0.05,
  job-board +0.5, shallow +0.2; penalty families −0.3..−1.0; accept at
  ≥1.0 / ≥0.8, potential at ≥0.5, reject below 0.
* **M12** — strict integer-scored filter (career_detector.py:27-387):
  structure analysis → early rejection on 7 rule families → score with
  breakdown (+5/+3/+2/+4/+1/+2 and −3/−depth/−2/−1) → accept iff
  score ≥ 8 ∧ exact career pattern ∧ depth ≤ 4 ∧ no date/ID tails →
  sort by score desc.

Both are URL-string-only (no HTML parse) — vectorization-friendly and
cheap enough to run over an entire frontier.  Confidence sums use a
fixed accumulation order, so the float results are deterministic.
"""

from __future__ import annotations

import re
from urllib.parse import urlparse

import pyarrow as pa

__all__ = [
    "career_url_confidence",
    "career_confidence_batch",
    "analyze_url_structure",
    "strict_early_rejection",
    "strict_career_score",
    "strict_filter_accepts",
    "strict_career_batch",
]

# --- shared keyword tables (app/utils/constants.py:8-93, 154-247) ---------

_VI_TRIPLES = [
    ("tuyen-dung", "tuyển-dụng", "tuyendung"),
    ("viec-lam", "việc-làm", "vieclam"),
    ("co-hoi", "cơ-hội", "cohoi"),
    ("nhan-vien", "nhân-viên", "nhanvien"),
    ("ung-vien", "ứng-viên", "ungvien"),
    ("cong-viec", "công-việc", "congviec"),
    ("lam-viec", "làm-việc", "lamviec"),
    ("thu-viec", "thử-việc", "thuviec"),
    ("chinh-thuc", "chính-thức", "chinhthuc"),
    ("nghe-nghiep", "nghề-nghiệp", "nghenghiep"),
    ("co-hoi-nghe-nghiep", "cơ-hội-nghề-nghiệp", "cohoinghenghiep"),
    ("tim-viec", "tìm-việc", "timviec"),
    ("dang-tuyen", "đang-tuyển", "dangtuyen"),
]
_VI_ROLE_SUFFIXES = [
    "nhan-vien", "developer", "engineer", "analyst", "manager", "designer",
    "tester", "qa", "devops", "data", "ai", "ml", "ui", "ux", "pm", "ba",
    "scrum", "agile",
]

def _vi_keywords() -> list[str]:
    """CAREER_KEYWORDS_VI reconstruction (constants.py:8-64) in its
    original order: bare triples first (with the loose 'tuyen'/'moi'
    singletons interleaved at their reference positions), then the
    tuyen-dung-<role> triples, then the English tail."""
    out: list[str] = []
    for i, (a, b, c) in enumerate(_VI_TRIPLES[:4]):
        out.extend([a, b, c])
    out.extend(["tuyen", "tuyển"])
    for a, b, c in _VI_TRIPLES[4:8]:
        out.extend([a, b, c])
        if a == "lam-viec":
            out.extend(["moi", "mời"])
    for a, b, c in _VI_TRIPLES[8:]:
        out.extend([a, b, c])
    out.extend(["tuyen-dung-nhan-vien", "tuyển-dụng-nhân-viên", "tuyendungnhanvien"])
    for role in _VI_ROLE_SUFFIXES[1:]:
        out.extend(
            [f"tuyen-dung-{role}", f"tuyển-dụng-{role}", f"tuyendung{role}"]
        )
    out.extend(
        "developer dev programmer engineer software tech technology it "
        "career job recruitment employment work position opportunity vacancy "
        "apply application hiring join-us team talent careers jobs "
        "open-role open-roles we-are-hiring work-with-us join-our-team "
        "grow-with-us build-with-us create-with-us innovate-with-us "
        "full-time part-time remote hybrid onsite on-site freelance contract "
        "internship intern graduate entry-level senior junior lead principal "
        "frontend front-end backend back-end fullstack full-stack mobile web "
        "data ai ml machine-learning devops qa test testing "
        "ui ux design product".split()
    )
    return out


CAREER_KEYWORDS_VI = _vi_keywords()

JOB_BOARD_DOMAINS = [
    "topcv.vn", "careerbuilder.vn", "jobstreet.vn", "vietnamworks.com",
    "mywork.com.vn", "123job.vn", "timviec365.vn", "careerlink.vn",
    "indeed.com", "linkedin.com/jobs", "glassdoor.com", "monster.com",
    "ziprecruiter.com", "simplyhired.com", "dice.com", "angel.co",
    "stackoverflow.com/jobs", "github.com/jobs", "remote.co",
    "weworkremotely.com",
]

CAREER_EXACT_PATTERNS = (
    [f"/{k}" for trip in _VI_TRIPLES[:7] for k in trip]
    + ["/moi", "/mời"]
    + [f"/{k}" for trip in _VI_TRIPLES[7:] for k in trip]
    + [
        "/career", "/careers", "/job", "/jobs", "/hiring", "/recruitment",
        "/employment", "/vacancy", "/vacancies", "/opportunity",
        "/opportunities", "/position", "/positions", "/apply",
        "/application", "/applications", "/join-us", "/joinus",
        "/work-with-us", "/workwithus", "/open-role", "/open-roles",
        "/openrole", "/openroles", "/we-are-hiring", "/wearehiring",
        "/talent", "/team",
    ]
)

STRONG_NON_CAREER_INDICATORS = (
    "blog news article post story tin-tuc tin bai-viet whitepaper ebook "
    "ebooks guide tutorial manual documentation case-study case-studies "
    "success-story testimonial review press media publication research "
    "analysis report "
    "product products service services solution solutions about contact "
    "company team leadership investor partnership partners client customer "
    "enterprise industry market business commercial trade "
    "technology tech digital transformation implementation deployment "
    "development deploy successfully application software platform system "
    "infrastructure architecture api sdk framework library tool tools "
    "webinar conference workshop training certification event events "
    "seminar meetup summit forum award recognition milestone achievement "
    "celebration "
    "login register signup signin account profile dashboard panel admin "
    "control manage settings user member community forum support help "
    "cart checkout payment order purchase buy shop store marketplace "
    "pricing price cost fee "
    "home main index search filter sort category tag author privacy terms "
    "policy legal sitemap rss feed subscribe newsletter "
    "doanh-nghiep khach-hang doi-tac san-pham dich-vu giai-phap cong-nghe "
    "chuyen-gia kinh-nghiem du-an nghien-cuu phan-tich bao-cao tai-lieu "
    "huong-dan thanh-cong danh-gia nhan-xet cam-nhan chia-se su-kien "
    "hoi-thao dao-tao chung-chi giai-thuong dang-nhap dang-ky tai-khoan "
    "quan-ly cai-dat gio-hang thanh-toan dat-hang mua-hang cua-hang "
    "trang-chu tim-kiem danh-muc the tac-gia quyen-rieng-tu dieu-khoan "
    "chinh-sach phap-ly".split()
)

_HOMEPAGE_PATHS = ("/", "", "/index.html", "/index.php", "/default.html",
                   "/default.php")


def _is_homepage(url: str) -> bool:
    p = urlparse(url)
    return p.path.lower() in _HOMEPAGE_PATHS and not p.query


# --- M11: additive confidence (career_pages_service.py:328-476) -----------

_M11_DOMAIN_KEYWORDS = CAREER_KEYWORDS_VI + [
    "career", "careers", "jobs", "employment", "work-with-us", "join-us",
    "opportunities", "vacancies", "positions", "tuyen-dung", "viec-lam",
    "co-hoi", "tuyen-nhan-vien",
]
_M11_JOB_BOARDS = JOB_BOARD_DOMAINS + [
    "jobs.vn", "careerlink.vn", "topcv.vn", "mywork.vn", "indeed.com",
    "linkedin.com/jobs", "glassdoor.com",
]
_M11_EXACT = ["career", "careers", "jobs", "employment", "tuyen-dung",
              "viec-lam", "co-hoi-nghe-nghiep", "tuyen-nhan-vien"]
_M11_GENERIC = ["dev", "software", "tech", "ml", "ai", "testing", "it",
                "digital"]
_M11_PATTERNS = [
    "/career", "/careers", "/jobs", "/employment",
    "/tuyen-dung", "/viec-lam", "/co-hoi-nghe-nghiep", "/tuyen-nhan-vien",
    "/tuyendung", "/vieclam", "/cohoi", "/tuyennhanvien",
    "/recruitment", "/hiring", "/opportunities", "/positions",
    "/vacancies", "/openings", "/join-us", "/work-with-us",
    "/careers/", "/tuyen-dung/", "/viec-lam/", "/hop-tac-tuyen-dung",
]
_M11_PENALTIES = [
    ("/product", -0.5), ("/service", -0.5), ("/news", -0.4), ("/blog", -0.4),
    ("/blogs", -0.4), ("/post", -0.4), ("/posts", -0.4), ("/article", -0.4),
    ("/insights", -0.4), ("/showcase", -0.4), ("/case-", -0.4),
    ("/about", -0.3), ("/contact", -0.3), ("/admin", -0.8), ("/login", -0.8),
    ("sitemap.xml", -1.0), ("robots.txt", -1.0), (".xml", -0.8),
    (".json", -0.8),
]


def career_url_confidence(url: str) -> dict:
    """M11: per-URL career analysis → {confidence, is_career_page,
    is_potential, rejection_reason, n_indicators}."""
    res = {
        "url": url,
        "is_career_page": False,
        "is_potential": False,
        "confidence": 0.0,
        "rejection_reason": None,
        "n_indicators": 0,
    }
    if url.lower().endswith((".xml", ".rss", ".atom")):
        res["rejection_reason"] = "XML/sitemap content - not a career page"
        return res
    if not url.startswith(("http://", "https://")):
        res["rejection_reason"] = "Non-HTTP URL"
        return res
    if _is_homepage(url):
        res["rejection_reason"] = "Homepage - not a career page"
        return res
    parsed = urlparse(url)
    path = parsed.path.lower()
    domain = parsed.netloc.lower()
    n_ind = 0
    conf = 0.0
    if domain.startswith(("career.", "careers.", "jobs.")):
        res["confidence"] = 2.0
        res["is_career_page"] = True
        res["n_indicators"] = 1
        return res
    for kw in _M11_EXACT:
        if kw in path:
            n_ind += 1
            conf += 1.0
    segments = path.strip("/").split("/")
    for kw in _M11_GENERIC:
        if (
            f"/{kw}" in path or f"{kw}/" in path
            or f"-{kw}" in path or f"{kw}-" in path
            or kw in segments
        ):
            n_ind += 1
            conf += 0.3
    for pat in _M11_PATTERNS:
        if pat in path:
            n_ind += 1
            conf += 1.2
    for kw in _M11_DOMAIN_KEYWORDS:
        if kw in domain:
            n_ind += 1
            conf += 0.05
    for board in _M11_JOB_BOARDS:
        if board in domain:
            n_ind += 1
            conf += 0.5
    depth = len([p for p in path.split("/") if p])
    if depth <= 2:
        n_ind += 1
        conf += 0.2
    elif depth > 4:
        # reference returns before `analysis['indicators']` is assigned
        # (career_pages_service.py:419-421) — indicator count stays 0
        res["rejection_reason"] = "Path too deep"
        res["confidence"] = conf
        return res
    for pat, pen in _M11_PENALTIES:
        if pat in path:
            conf += pen
            if pen <= -0.5:
                res["rejection_reason"] = f"Strong non-career pattern: {pat}"
    if conf >= 1.0:
        res["is_career_page"] = True
        res["rejection_reason"] = None
    elif conf >= 0.8:
        res["is_career_page"] = True
    elif conf >= 0.5:
        res["is_potential"] = True
    elif conf < 0.0 and not res["rejection_reason"]:
        res["rejection_reason"] = "Low confidence score"
    res["confidence"] = conf
    res["n_indicators"] = n_ind
    return res


def career_confidence_batch(batch: pa.Table, url_col: str = "url") -> pa.Table:
    rows = [career_url_confidence(u) for u in batch[url_col].to_pylist()]
    return pa.table(
        {
            "url": pa.array([r["url"] for r in rows], pa.string()),
            "confidence": pa.array(
                [round(r["confidence"], 10) for r in rows], pa.float64()
            ),
            "is_career_page": pa.array(
                [r["is_career_page"] for r in rows], pa.bool_()
            ),
            "is_potential": pa.array(
                [r["is_potential"] for r in rows], pa.bool_()
            ),
            "rejection_reason": pa.array(
                [r["rejection_reason"] for r in rows], pa.string()
            ),
            "n_indicators": pa.array(
                [r["n_indicators"] for r in rows], pa.int32()
            ),
        }
    )


# --- M12: strict integer scoring (career_detector.py) ---------------------

_DATE_RXS = [
    re.compile(r"/\d{4}[/-]\d{1,2}[/-]\d{1,2}"),
    re.compile(r"/\d{4}/\d{1,2}"),
    re.compile(r"/\d{1,2}/\d{4}"),
    re.compile(r"/\d{4}"),
]
_ID_RXS = [
    re.compile(r"/[a-f0-9]{8,}"),
    re.compile(r"/\d{5,}"),
    re.compile(r"/[a-z0-9]{10,}"),
    re.compile(r"/[a-f0-9]{4,}"),
]
_FILE_EXTS = (
    ".pdf", ".doc", ".docx", ".xls", ".xlsx", ".ppt", ".pptx", ".jpg",
    ".jpeg", ".png", ".gif", ".mp4", ".avi", ".zip", ".xml", ".json",
    ".txt", ".csv", ".html", ".htm",
)
_NON_CAREER_PATHS = [
    "/services/", "/service/", "/products/", "/product/", "/solutions/",
    "/solution/", "/about/", "/contact/", "/news/", "/blog/", "/article/",
    "/post/", "/events/", "/event/", "/webinar/", "/conference/",
    "/training/", "/certification/", "/workshop/", "/case-study/",
    "/case-studies/", "/success-story/", "/testimonial/", "/review/",
    "/whitepaper/", "/ebook/", "/ebooks/", "/guide/", "/tutorial/",
    "/documentation/", "/manual/", "/api/", "/sdk/", "/framework/",
    "/library/", "/tool/", "/tools/", "/platform/", "/system/",
    "/infrastructure/", "/architecture/", "/deployment/",
    "/implementation/", "/login/", "/register/", "/signup/", "/signin/",
    "/account/", "/profile/", "/dashboard/", "/panel/", "/admin/",
    "/control/", "/manage/", "/settings/", "/cart/", "/checkout/",
    "/payment/", "/order/", "/purchase/", "/buy/", "/shop/", "/store/",
    "/marketplace/", "/pricing/", "/price/", "/cost/", "/fee/", "/search/",
    "/filter/", "/sort/", "/category/", "/tag/", "/author/", "/privacy/",
    "/terms/", "/policy/", "/legal/", "/sitemap/", "/rss/", "/feed/",
    "/subscribe/", "/newsletter/", "/dich-vu/", "/san-pham/",
    "/giai-phap/", "/tin-tuc/", "/bai-viet/", "/su-kien/", "/hoi-thao/",
    "/dao-tao/", "/chung-chi/", "/giai-thuong/", "/thanh-cong/",
    "/danh-gia/", "/nhan-xet/", "/cam-nhan/", "/chia-se/", "/dang-nhap/",
    "/dang-ky/", "/tai-khoan/", "/quan-ly/", "/cai-dat/", "/gio-hang/",
    "/thanh-toan/", "/dat-hang/", "/mua-hang/", "/cua-hang/",
    "/trang-chu/", "/tim-kiem/", "/danh-muc/", "/the/", "/tac-gia/",
    "/quyen-rieng-tu/", "/dieu-khoan/", "/chinh-sach/", "/phap-ly/",
]
_JOB_DETAIL_INDICATORS = [
    "/job/", "/jobs/", "/position/", "/career/", "/opportunity/",
    "/vacancy/", "/apply/", "/application/", "/tuyen-dung/", "/viec-lam/",
    "/co-hoi/", "/ung-vien/", "/cong-viec/",
]
_NON_CAREER_SUBPAGES = [
    "/careers/our-culture", "/careers/benefits",
    "/careers/recruitment-process", "/careers/training-courses",
    "/careers/opening-positions", "/careers/career-your-benefits",
    "/careers/team", "/careers/leadership", "/careers/company",
    "/careers/about", "/careers/contact", "/careers/partnership",
    "/careers/investor",
]
_HIGH_PRIORITY = [
    "/tuyen-dung", "/tuyển-dụng", "/tuyendung", "/career", "/careers",
    "/job", "/jobs", "/recruitment", "/hiring", "/employment",
]
_MEDIUM_PRIORITY = [
    "/viec-lam", "/việc-làm", "/vieclam", "/co-hoi", "/cơ-hội", "/cohoi",
    "/nhan-vien", "/nhân-viên", "/nhanvien", "/ung-vien", "/ứng-viên",
    "/ungvien", "/position", "/positions", "/opportunity", "/vacancy",
    "/vacancies", "/apply",
]
_CLEAN_PATHS = ["/career", "/careers", "/job", "/jobs", "/tuyen-dung",
                "/viec-lam"]
_NON_CAREER_KEYWORDS = ["blog", "news", "article", "product", "service",
                        "about", "contact"]
_CAREER_QUERY_PARAMS = ["job", "career", "position", "hiring",
                        "recruitment", "apply"]


def analyze_url_structure(url: str) -> dict:
    """career_detector.py:27-54."""
    p = urlparse(url)
    path = p.path.lower() if p.path else ""
    query = p.query.lower()
    segments = [s for s in path.strip("/").split("/") if s]
    params = {}
    for part in p.query.split("&"):
        if "=" in part:
            k, v = part.split("=", 1)
            params[k.lower()] = v.lower()
    return {
        "path": path,
        "segments": segments,
        "depth": len(segments),
        "query": query,
        "params": params,
    }


def strict_early_rejection(ua: dict) -> str | None:
    """career_detector.py:56-154 — returns the rejection reason or None."""
    path, query = ua["path"], ua["query"]
    for ind in STRONG_NON_CAREER_INDICATORS:
        if ind in path or ind in query:
            return f"non-career indicator: {ind}"
    for rx in _DATE_RXS:
        if rx.search(path):
            return "date pattern"
    for rx in _ID_RXS:
        if rx.search(path):
            return "long ID pattern"
    for ext in _FILE_EXTS:
        if ext in path:
            return f"file extension: {ext}"
    if ua["depth"] > 2:
        return f"path too deep: {ua['depth']}"
    for ncp in _NON_CAREER_PATHS:
        if ncp in path:
            return f"non-career path: {ncp}"
    if ua["depth"] > 1:
        for ind in _JOB_DETAIL_INDICATORS:
            if ind in path:
                return f"job detail page: {ind}"
    return None


def strict_career_score(ua: dict) -> int:
    """career_detector.py:156-267 — integer score."""
    path, query, params = ua["path"], ua["query"], ua["params"]
    score = 0
    for pat in _HIGH_PRIORITY:
        if pat in path:
            if any(sp in path for sp in _NON_CAREER_SUBPAGES):
                continue
            score += 5
            break
    for pat in _MEDIUM_PRIORITY:
        if pat in path:
            score += 3
            break
    hits = 0
    for kw in CAREER_KEYWORDS_VI:
        if kw in path or kw in query:
            hits += 1
            if hits <= 3:
                score += 2
    for pat in CAREER_EXACT_PATTERNS:
        if pat in path:
            if any(sp in path for sp in _NON_CAREER_SUBPAGES):
                continue
            score += 4
            break
    for param in _CAREER_QUERY_PARAMS:
        if param in params:
            score += 1
    if path in _CLEAN_PATHS:
        score += 2
    for kw in _NON_CAREER_KEYWORDS:
        if kw in path or kw in query:
            score -= 3
    if ua["depth"] > 3:
        score -= ua["depth"] - 3
    if re.search(r"/\d+", path) or re.search(r"/[a-f0-9]{4,}", path):
        score -= 2
    if re.search(r"[%&$#@!]", path):
        score -= 1
    return score


def strict_filter_accepts(url: str) -> tuple[bool, int]:
    """career_detector.py:318-387 final decision (no-content variant —
    the reference skips content validation when html is absent)."""
    if _is_homepage(url):
        return False, 0
    ua = analyze_url_structure(url)
    if strict_early_rejection(ua) is not None:
        return False, 0
    score = strict_career_score(ua)
    if score < 8:
        return False, score
    path = ua["path"]
    if not any(pat in path for pat in CAREER_EXACT_PATTERNS):
        return False, score
    if ua["depth"] > 4:
        return False, score
    if (
        re.search(r"/\d{4}", path)
        or re.search(r"/[a-f0-9]{8,}", path)
        or re.search(r"/\d{5,}", path)
    ):
        return False, score
    return True, score


def strict_career_all_batch(batch: pa.Table, url_col: str = "url") -> pa.Table:
    """M12 over every URL (no filter) → (url, m12_accept, m12_score);
    early-rejected URLs carry score 0, mirroring filter_career_urls'
    short-circuit (career_detector.py:324-337)."""
    urls = batch[url_col].to_pylist()
    results = [strict_filter_accepts(u) for u in urls]
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "m12_accept": pa.array([ok for ok, _ in results], pa.bool_()),
            "m12_score": pa.array([s for _, s in results], pa.int32()),
        }
    )


def strict_career_batch(batch: pa.Table, url_col: str = "url") -> pa.Table:
    """M12 as a batch stage → (url, career_score) for ACCEPTED urls only;
    downstream: ``sort('career_score', descending=True)`` (O4)."""
    urls, scores = [], []
    for u in batch[url_col].to_pylist():
        ok, score = strict_filter_accepts(u)
        if ok:
            urls.append(u)
            scores.append(score)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "career_score": pa.array(scores, pa.int32()),
        }
    )

"""Contact-record operators — the reference's contact classification
(utils/contact_extractor.py:107-299), contact-form detection
(contact_extractor_service.py:392-409), social-media extraction
(:321-366) and social-URL normalization (:293-319), plus M38
career-anchor-link discovery (career_pages_service.py:854-913), as pure
scalar functions + Arrow batch wrappers.

Engine determinism deviations (documented):

* set-built lists (`contact_forms`, reference :409) are returned
  **sorted**; the reference's ``list(set(...))`` order is
  process-dependent.  `social_media_links` keeps the reference's
  order-preserving ``dict.fromkeys`` dedup exactly.
* the reference's linkedin/youtube regexes contain a capture group, so
  its ``re.findall`` yields only the group ('company'/'in', ...) — a
  latent bug producing truncated links like
  ``https://linkedin.com/company``.  Reproduced faithfully (findall
  semantics: group-1 when one group, full match when none).
"""

from __future__ import annotations

import re
from urllib.parse import urlparse

import pyarrow as pa

__all__ = [
    "SOCIAL_DOMAINS",
    "extract_valid_email",
    "extract_valid_phone",
    "extract_embedded_url",
    "normalize_contact_url",
    "classify_contact_urls",
    "detect_contact_forms",
    "normalize_social_url",
    "social_media_links",
    "career_anchor_links",
    "contact_record_batch",
    "career_anchor_batch",
]

# utils/contact_extractor.py:24-30
SOCIAL_DOMAINS = {
    "linkedin.com", "twitter.com", "facebook.com", "instagram.com",
    "github.com", "gitlab.com", "behance.net", "dribbble.com",
    "medium.com", "stackoverflow.com", "quora.com", "reddit.com",
    "producthunt.com", "angel.co", "crunchbase.com", "dev.to",
    "polywork.com", "toptal.com", "upwork.com", "freelancer.com",
    "x.com", "tiktok.com", "wa.me",
}

_EMAIL_RX = re.compile(r"\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Z|a-z]{2,}\b")
_IMG_EXTS = [".png", ".jpg", ".jpeg", ".gif", ".svg", ".ico"]

_VN_PHONE_RXS = [
    re.compile(r"\+84\s?\d{1,2}\s?\d{3}\s?\d{3}\s?\d{3}"),
    re.compile(r"0\d{1,2}\s?\d{3}\s?\d{3}\s?\d{3}"),
    re.compile(r"\d{10,11}"),
]


def extract_valid_email(email_str: str) -> str | None:
    """utils/contact_extractor.py:107-121."""
    if any(ext in email_str.lower() for ext in _IMG_EXTS):
        return None
    m = _EMAIL_RX.search(email_str)
    if m:
        email = m.group(0).lower()
        if len(email) > 5 and "@" in email and "." in email.split("@")[1]:
            return email
    return None


def extract_valid_phone(phone_str: str) -> str | None:
    """utils/contact_extractor.py:123-151."""
    phone = re.sub(r"[^\d+\-\s\(\)]", "", phone_str)
    for rx in _VN_PHONE_RXS:
        m = rx.search(phone)
        if m:
            number = m.group(0)
            digits = re.sub(r"[^\d]", "", number)
            if 10 <= len(digits) <= 11 and digits.startswith(("0", "84")):
                return number
    return None


def extract_embedded_url(href: str, base_netloc: str | None = None) -> str:
    """utils/contact_extractor.py:154-193."""
    href = href.strip()
    if href.startswith(("mailto:", "tel:", "javascript:")):
        return href
    # NOTE: the reference tests '/' BEFORE '//' (contact_extractor.py:
    # 170-180), so its protocol-relative branch is dead code: '//cdn…'
    # takes the relative-path branch too.  Reproduced faithfully.
    if href.startswith("/"):
        if base_netloc:
            return f"https://{base_netloc}{href}"
        return href
    if href.startswith(("http://", "https://")):
        return href
    if base_netloc:
        return f"https://{base_netloc}/{href}"
    return href


def normalize_contact_url(url_str: str, base_url: str) -> str:
    """utils/contact_extractor.py:195-230 (sans the yarl/unquote
    wrinkles the reference applies after — unquote is kept)."""
    from urllib.parse import unquote

    url_str = (url_str or "").strip()
    if not url_str or url_str == "#":
        return base_url
    base_domain = urlparse(base_url).netloc
    extracted = extract_embedded_url(url_str, base_domain)
    if not extracted.startswith(
        ("http://", "https://", "mailto:", "tel:", "javascript:")
    ):
        if extracted.startswith("/"):
            extracted = f"https://{base_domain}{extracted}"
        else:
            extracted = f"https://{base_domain}/{extracted}"
    extracted = extracted.replace(" ", "%20")
    return unquote(extracted)


def classify_contact_urls(urls: list[str], base_url: str) -> list[str]:
    """The URL branch of process_extracted_crawl_results
    (utils/contact_extractor.py:271-287): normalized HTTP urls whose
    domain contains a social domain → sorted social_links."""
    social = set()
    for value in urls:
        if not (value or "").strip():
            continue
        normalized = normalize_contact_url(value, base_url)
        if not normalized.startswith(("http://", "https://")):
            continue
        domain = urlparse(normalized).netloc.lower()
        if any(sd in domain for sd in SOCIAL_DOMAINS):
            social.add(normalized)
    return sorted(social)


_CONTACT_FORM_KEYWORDS = ["contact", "lien-he", "lienhe", "about",
                          "about-us", "gioi-thieu"]


def _strip_fragment(u: str) -> str:
    """utils/text.py:26-32."""
    if "#" in u:
        u = u.split("#", 1)[0]
    return u.strip()


def detect_contact_forms(urls: list[str]) -> list[str]:
    """contact_extractor_service.py:392-409; sorted (engine determinism
    deviation from ``list(set(...))``)."""
    forms = set()
    for url in urls:
        u = _strip_fragment(url or "")
        if any(kw in u.lower() for kw in _CONTACT_FORM_KEYWORDS):
            forms.add(u)
    return sorted(forms)


def normalize_social_url(url: str) -> str:
    """contact_extractor_service.py:293-319."""
    u = url.lower()
    for dom in ("facebook", "instagram", "linkedin"):
        u = re.sub(
            rf"(https?://)?(www\.)?{dom}\.com/{dom}\.com/",
            f"https://www.{dom}.com/", u,
        )
        u = re.sub(
            rf"(https?://)?(www\.)?{dom}\.com/{dom}\.com",
            f"https://www.{dom}.com/", u,
        )
    if u.startswith("facebook.com/"):
        u = "https://www.facebook.com/" + u[13:]
    elif u.startswith("instagram.com/"):
        u = "https://www.instagram.com/" + u[14:]
    elif u.startswith("linkedin.com/"):
        u = "https://www.linkedin.com/" + u[13:]
    return u


# contact_extractor_service.py:56-63
SOCIAL_PATTERNS = {
    "facebook": r"facebook\.com/[^/\s]+",
    "linkedin": r"linkedin\.com/(company|in)/[^/\s]+",
    "twitter": r"twitter\.com/[^/\s]+",
    "instagram": r"instagram\.com/[^/\s]+",
    "youtube": r"youtube\.com/(channel|c|user)/[^/\s]+",
    "github": r"github\.com/[^/\s]+",
}
_SOCIAL_RXS = {
    p: re.compile(rx, re.IGNORECASE) for p, rx in SOCIAL_PATTERNS.items()
}


def social_media_links(html: str, urls: list[str]) -> list[str]:
    """_extract_social_media_enhanced (contact_extractor_service.py:
    321-366) — regex sweep over HTML + platform-substring sweep over the
    URL list, artifact cleanup, social-URL normalization, order-
    preserving dedup.  The findall-group bug is reproduced (see module
    docstring)."""
    links: list[str] = []
    for platform, rx in _SOCIAL_RXS.items():
        for match in rx.findall(html or ""):
            links.append(f"https://{platform}.com/{match}")
    for url in urls:
        u = _strip_fragment(url or "")
        for platform in SOCIAL_PATTERNS:
            if platform in u.lower():
                links.append(u)
    cleaned = []
    for link in links:
        clean = link.split("\\")[0].split('"')[0].split(">")[0].strip()
        if clean and clean.startswith(("http://", "https://")):
            cleaned.append(normalize_social_url(clean))
    return list(dict.fromkeys(cleaned))


# --- M38: career links from anchor text ------------------------------------

# career_pages_service.py:868-881
M38_CAREER_KEYWORDS = [
    "tuyển dụng", "tuyển nhân viên", "cơ hội nghề nghiệp", "việc làm",
    "tuyển dụng nhân sự", "cơ hội việc làm", "tuyển dụng nhân viên",
    "tuyển dụng kỹ sư", "tuyển dụng developer", "tuyển dụng lập trình viên",
    "career", "careers", "job", "jobs", "employment", "hiring",
    "recruitment", "join us", "work with us", "opportunities",
    "positions", "vacancies", "openings",
]


def career_anchor_links(
    anchors: list[tuple[str, str]], base_url: str
) -> tuple[list[str], list[str], float]:
    """M38 (career_pages_service.py:854-913): anchors whose *text*
    contains a career keyword → (career_pages, career_texts,
    confidence = min(n·0.3, 1)).  ``anchors`` is (href, text) pairs in
    document order."""
    from urllib.parse import urljoin

    pages, texts = [], []
    for href, text in anchors:
        if not href:
            continue
        stripped = (text or "").strip()
        if any(kw in stripped.lower() for kw in M38_CAREER_KEYWORDS):
            full = urljoin(base_url, href)
            if full.startswith(("http://", "https://")):
                pages.append(full)
                texts.append(stripped)
    confidence = min(len(pages) * 0.3, 1.0) if pages else 0.0
    return pages, texts, confidence


# --- batch wrappers --------------------------------------------------------

def contact_record_batch(batch: pa.Table) -> pa.Table:
    """pages → per-url contact record (the service response shape,
    contact_extractor_service.py:140-152): social_links from the HTML +
    out-link sweep, contact_forms from the out-link list (the crawl
    result's ``urls`` field = M5 out-links).  Input columns: url, html
    (binary)."""
    from ..functions.htmltext import extract_out_links, parse_page

    urls = batch["url"].to_pylist()
    htmls = batch["html"].to_pylist()
    socials, forms = [], []
    for u, h in zip(urls, htmls):
        html = h.decode("utf-8", errors="ignore") if isinstance(
            h, (bytes, bytearray)
        ) else (h or "")
        links = extract_out_links(parse_page(html), u)
        socials.append(social_media_links(html, links))
        forms.append(detect_contact_forms(links))
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "social_links": pa.array(socials, pa.list_(pa.string())),
            "contact_forms": pa.array(forms, pa.list_(pa.string())),
        }
    )


def career_anchor_batch(batch: pa.Table) -> pa.Table:
    """pages → M38 career-anchor discovery rows.  Input columns: url,
    html (binary)."""
    from ..functions.htmltext import parse_page

    urls = batch["url"].to_pylist()
    htmls = batch["html"].to_pylist()
    out_urls, out_pages, out_texts, out_conf = [], [], [], []
    for u, h in zip(urls, htmls):
        html = h.decode("utf-8", errors="ignore") if isinstance(
            h, (bytes, bytearray)
        ) else (h or "")
        facts = parse_page(html)
        pages, texts, conf = career_anchor_links(facts.anchors, u)
        out_urls.append(u)
        out_pages.append(pages)
        out_texts.append(texts)
        out_conf.append(conf)
    return pa.table(
        {
            "url": pa.array(out_urls, pa.string()),
            "career_pages": pa.array(out_pages, pa.list_(pa.string())),
            "career_texts": pa.array(out_texts, pa.list_(pa.string())),
            "m38_confidence": pa.array(out_conf, pa.float64()),
        }
    )

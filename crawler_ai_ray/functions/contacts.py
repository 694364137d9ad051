"""Contact extraction — the reference's three regex semantics, pinned.

* **M1 emails** (``app/services/crawler.py:292-316``, identically in
  ``scrapy_career_spider.py:962-984``): two overlapping patterns run over
  the *raw HTML* with ``re.IGNORECASE``, matches lowercased, basic
  ``@``/dot validation, matches containing any of a substring blocklist
  dropped, then set-dedup.  The reference's output order is Python-set
  order (nondeterministic); this engine pins **sorted** order, which is
  also what the spider emits at aggregation time
  (``scrapy_career_spider.py:676-681`` sorts the global sets).

* **M2 loose phones** (``crawler.py:319-327``): three loose patterns over
  raw HTML, concatenated, set-dedup (pinned sorted).

* **M3 VN-strict phones** (``contact_extractor_service.py:52-54`` +
  ``app/utils/text.py:40-55``): ``(?<!\\d)(?:\\+?84|0)(?:SEP\\d){8,10}(?!\\d)``
  over whitespace-normalized text, each candidate cleaned to digits
  (``+84`` → ``0``), kept iff 10–11 digits, order-preserving dedup.

All functions are pure and operate on one string; the Ray stage applies
them per row inside ``map_batches`` with the patterns compiled once at
module import (amortized across every batch of every task).
"""

from __future__ import annotations

import re

__all__ = [
    "extract_emails",
    "extract_phones_loose",
    "extract_phones_vn",
    "normalize_text",
    "clean_phone",
]

# --- M1 emails -------------------------------------------------------------

_EMAIL_PATTERNS = [
    re.compile(r"\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Z|a-z]{2,}\b", re.IGNORECASE),
    re.compile(r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}", re.IGNORECASE),
]

# crawler.py:306-309 — substrings that invalidate a match.
_EMAIL_BLOCKLIST = (
    "cropped-favicon", "favicon", ".png", ".jpg", ".jpeg", ".gif",
    "data:", "javascript:", "mailto:", "tel:", "http", "https",
)


def extract_emails(html: str) -> list[str]:
    """M1 semantics; returns sorted unique emails."""
    if "@" not in html:  # fast path — both patterns require a literal '@'
        return []
    found: list[str] = []
    for pat in _EMAIL_PATTERNS:
        found.extend(pat.findall(html))
    valid: set[str] = set()
    for email in found:
        email = email.strip().lower()
        if "@" in email and "." in email.split("@", 1)[1]:
            if not any(bad in email for bad in _EMAIL_BLOCKLIST):
                valid.add(email)
    return sorted(valid)


# --- M2 loose phones -------------------------------------------------------

_PHONE_PATTERNS = [
    re.compile(r"\+84\s?\d{1,2}\s?\d{3}\s?\d{3}\s?\d{3}"),
    re.compile(r"0\d{1,2}\s?\d{3}\s?\d{3}\s?\d{3}"),
    re.compile(r"\d{10,11}"),
]


def extract_phones_loose(html: str) -> list[str]:
    """M2 semantics; returns sorted unique raw matches."""
    found: set[str] = set()
    for pat in _PHONE_PATTERNS:
        found.update(pat.findall(html))
    return sorted(found)


# --- M3 VN-strict phones ---------------------------------------------------

# utils/text.py:40-43 — whitespace incl. NBSP + zero-width range, separators.
_WS_CLASS = r"\s\u00A0\u2000-\u200B"
_SEP_CLASS = rf"[{_WS_CLASS}\.\-\(\)]"
_SEP = rf"{_SEP_CLASS}*"

_VN_PHONE_RX = re.compile(rf"(?<!\d)(?:\+?84|0)(?:{_SEP}\d){{8,10}}(?!\d)")
_WS_RX = re.compile(rf"[{_WS_CLASS}]+")
_NON_DIGIT_PLUS_RX = re.compile(r"[^\d+]")
_NON_DIGIT_RX = re.compile(r"\D")


def normalize_text(s: str) -> str:
    """utils/text.py:44-46 — collapse all unicode whitespace to one space."""
    return _WS_RX.sub(" ", s).strip()


def clean_phone(candidate: str) -> str | None:
    """utils/text.py:48-55 — digits only, +84→0, keep iff 10–11 digits."""
    s = _NON_DIGIT_PLUS_RX.sub("", candidate)
    if s.startswith("+84"):
        s = "0" + s[3:]
    s = _NON_DIGIT_RX.sub("", s)
    return s if 10 <= len(s) <= 11 else None


def extract_phones_vn(text: str) -> list[str]:
    """M3 semantics over visible text; order-preserving dedup then the
    reference's final sort-by-length (contact_extractor_service.py:368-390)."""
    norm = normalize_text(text)
    out: list[str] = []
    seen: set[str] = set()
    for m in _VN_PHONE_RX.finditer(norm):
        cleaned = clean_phone(m.group(0))
        if cleaned is not None and cleaned not in seen:
            seen.add(cleaned)
            out.append(cleaned)
    out.sort(key=len)
    return out

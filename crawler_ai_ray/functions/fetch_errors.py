"""Fetch outcome simulation + error taxonomy (S1/S2 fetch semantics).

The reference fetches with a 3-attempt retry loop and classifies
failures into a fixed error taxonomy:

* ``check_url_availability`` — HEAD pre-check (``crawler.py:103-134``):
  2xx/3xx → available, 404/410 → permanently unavailable, any other
  status → unavailable-with-error, HEAD exception → unknown (fall
  through to GET).  An unavailable HEAD verdict raises OUT of the retry
  loop (plain ``Exception`` is not caught by the per-attempt handlers),
  so it fails the fetch with ZERO GET attempts.
* ``extract_with_requests`` retry loop (``crawler.py:156-288``):
  max 3 attempts; 403 retries with ``2**attempt`` backoff, 429 with
  ``3 + 2*attempt``, 503 with ``2 + attempt``, other ≥400 with
  ``1 + attempt``; 404/410 are permanent (no retry); timeouts and
  connection errors retry with ``2**attempt``; content-encoding errors
  retry immediately.
* error classification (``crawler.py:424-446``): keyword scan of the
  final error message, in priority order timeout → dns → connection →
  blocked → rate_limited → not_found → other; non-HTTP URLs are skipped
  pre-fetch as ``non_http`` (``crawler.py:142-151``).

The sandbox "network" is the synthetic corpus: each URL carries a
deterministic per-attempt outcome sequence (``fetchcfg.parquet``), and
:func:`simulate_fetch` replays the reference's control flow over it.
Outcome encoding per attempt: positive int = HTTP status of the GET;
negative ints = exceptions (see ``EXC_*``).  ``head_status`` 0 = the
HEAD request itself raised (availability unknown).
"""

from __future__ import annotations

from http.client import responses as _REASONS

__all__ = [
    "ERROR_TYPES",
    "EXC_TIMEOUT",
    "EXC_DNS",
    "EXC_REFUSED",
    "EXC_UNREACHABLE",
    "EXC_ENCODING",
    "DEFAULT_HEAD",
    "DEFAULT_ATTEMPTS",
    "MISS_ATTEMPTS",
    "classify_error",
    "head_availability",
    "simulate_fetch",
]

# exception outcome codes (negative so they can't collide with statuses)
EXC_TIMEOUT = -1      # asyncio.TimeoutError
EXC_DNS = -2          # ClientConnectorError: Name or service not known
EXC_REFUSED = -3      # ClientConnectorError: Connection refused
EXC_UNREACHABLE = -4  # ClientConnectorError: Network is unreachable
EXC_ENCODING = -5     # ContentEncodingError

MAX_RETRIES = 3

# default profile for a URL with no fetchcfg row: present in the corpus
# → clean 200; absent → a straight GET 404 (the Common-Crawl miss)
DEFAULT_HEAD = 200
DEFAULT_ATTEMPTS = (200, 200, 200)
MISS_ATTEMPTS = (404, 404, 404)

_HEAD_AVAILABLE = (200, 301, 302, 303, 307, 308)
_PERMANENT = (404, 410)

# crawler.py:424-446 — (error_type, keywords) in PRIORITY order; first
# keyword hit on the lowercased message wins
ERROR_TYPES: list[tuple[str, tuple[str, ...]]] = [
    ("timeout", ("timeout", "connection timeout")),
    ("dns", ("dns", "name or service not known")),
    ("connection", ("connection refused", "unreachable")),
    ("blocked", ("403", "forbidden", "blocked")),
    ("rate_limited", ("429", "rate limited")),
    ("not_found", ("404", "not found", "410", "gone")),
]

_EXC_MESSAGES = {
    EXC_TIMEOUT: "Connection timeout",
    EXC_DNS: "DNS resolution failed - domain may not exist",
    EXC_REFUSED: "Connection refused - server may be down",
    EXC_UNREACHABLE: "Network unreachable",
    EXC_ENCODING: "Content encoding error: synthetic",
}


def _reason(status: int) -> str:
    return _REASONS.get(status, "Unknown")


def classify_error(error_msg: str) -> str:
    """crawler.py:424-446 — keyword-priority scan, else ``other``."""
    low = (error_msg or "").lower()
    for etype, keywords in ERROR_TYPES:
        if any(k in low for k in keywords):
            return etype
    return "other"


def head_availability(head_status: int) -> dict:
    """S2 — ``check_url_availability`` verdict (crawler.py:103-134).
    ``available`` is tri-state: True / False / None (HEAD raised,
    availability unknown → caller falls through to GET)."""
    if head_status == 0:
        return {
            "available": None,
            "status": None,
            "method": "HEAD",
            "error": "HEAD request failed",
        }
    if head_status in _HEAD_AVAILABLE:
        return {
            "available": True,
            "status": head_status,
            "method": "HEAD",
            "error": None,
        }
    if head_status in _PERMANENT:
        return {
            "available": False,
            "status": head_status,
            "method": "HEAD",
            "error": f"Permanent error: HTTP {head_status}",
        }
    return {
        "available": False,
        "status": head_status,
        "method": "HEAD",
        "error": f"HTTP {head_status} - {_reason(head_status)}",
    }


def simulate_fetch(
    url: str, head_status: int, attempts: list[int] | tuple[int, ...]
) -> dict:
    """Replay the reference retry loop over per-attempt outcomes.

    Returns ``{success, status_code, error_type, error_message,
    attempts_used, backoff_s}``.  ``status_code`` is the HTTP status
    observed at the terminating step (None when the fetch died on an
    exception or pre-fetch skip); ``attempts_used`` counts GET attempts
    (0 when HEAD killed the fetch or the URL was skipped);
    ``backoff_s`` sums the deterministic retry sleeps the reference
    would make (the 403 jitter ``uniform(0.5, 1.5)`` is taken at its
    midpoint 1.0 — wall-clock noise is not data).
    """
    if not url.startswith(("http://", "https://")):
        # crawler.py:142-151 — pre-fetch skip
        return {
            "success": False,
            "status_code": None,
            "error_type": "non_http",
            "error_message": "Non-HTTP URL skipped",
            "attempts_used": 0,
            "backoff_s": 0.0,
        }

    def fail(msg: str, status: int | None, used: int, backoff: float) -> dict:
        return {
            "success": False,
            "status_code": status,
            "error_type": classify_error(msg),
            "error_message": msg,
            "attempts_used": used,
            "backoff_s": round(backoff, 3),
        }

    # HEAD pre-check on attempt 0 (crawler.py:189-196): an unavailable
    # verdict raises a plain Exception the retry handlers don't catch
    head = head_availability(head_status)
    if head["available"] is False:
        return fail(head["error"], head_status, 0, 0.0)

    backoff = 0.0
    last_error = None
    for i in range(MAX_RETRIES):
        o = attempts[min(i, len(attempts) - 1)]
        retryable = i < MAX_RETRIES - 1
        if o >= 100:  # HTTP status
            if 100 <= o < 400:
                return {
                    "success": True,
                    "status_code": o,
                    "error_type": None,
                    "error_message": None,
                    "attempts_used": i + 1,
                    "backoff_s": round(backoff, 3),
                }
            if o == 403:
                last_error = "403 Forbidden - likely blocked by server"
                if retryable:
                    backoff += 2.0**i
                    continue
                return fail(last_error, o, i + 1, backoff)
            if o == 429:
                last_error = "429 Rate Limited - too many requests"
                if retryable:
                    backoff += 3.0 + i * 2
                    continue
                return fail(last_error, o, i + 1, backoff)
            if o == 503:
                last_error = "503 Service Unavailable - server overloaded"
                if retryable:
                    backoff += 2.0 + i
                    continue
                return fail(last_error, o, i + 1, backoff)
            # other >= 400
            last_error = f"HTTP {o} - {_reason(o)}"
            if o in _PERMANENT:
                return fail(f"Permanent error: {last_error}", o, i + 1, backoff)
            if retryable:
                backoff += 1.0 + i
                continue
            return fail(last_error, o, i + 1, backoff)
        # exception outcomes
        last_error = _EXC_MESSAGES.get(o, f"Unknown error code {o}")
        if o == EXC_ENCODING:
            if retryable:
                continue  # encoding retry sleeps 0 (crawler.py:252-261)
            return fail(last_error, None, i + 1, backoff)
        if retryable:
            backoff += 2.0**i
            continue
        if o == EXC_TIMEOUT:
            last_error = f"Connection timeout after {MAX_RETRIES} attempts"
        return fail(last_error, None, i + 1, backoff)
    # defensively mirror crawler.py:290-292 (unreachable with the
    # encodings above: a final attempt always returns or raises)
    return fail(
        f"Failed to get HTML content after {MAX_RETRIES} attempts. "
        f"Last error: {last_error}",
        None,
        MAX_RETRIES,
        backoff,
    )

"""Subdomain search — host harvest + fallback career-subdomain
candidates (step 6 of the reference's primary detection endpoint).

Ports, as pure batch functions:

* ``_safe_domain`` (``career_pages_service.py:56-71``) — root-domain
  extraction (strip scheme/www; keep the last 2 labels, or 3 when the
  TLD label is ≤2 chars, e.g. ``.com.vn``);
* ``_is_subdomain_of`` (``:73-77``);
* ``_collect_hosts_from_html`` (``:86-130``) — hostnames from the URL
  attributes of a/link/script/img/form/source/iframe, plus regex
  harvest over inline script/style text and the page text blob;
* ``_smart_subdomain_search`` composition (``:932-965``) minus the
  network aliveness probe: discovered subdomain hosts (sorted, deduped)
  unioned with the 5 essential fallback patterns
  (``_get_minimal_fallback_patterns``, ``:1093-1111``) — the fetch
  stage, not the generator, decides what is alive.

The harvest regexes are byte-identical to the reference's
``url_patterns`` list; the env-var extension hook
(``CRAWLER_FALLBACK_SUBDOMAINS``) is intentionally not read — engine
configuration is explicit (pass ``extra_fallback``).
"""

from __future__ import annotations

import re
from urllib.parse import urljoin, urlparse

import pyarrow as pa

from .minidom import Node, build_tree

__all__ = [
    "safe_domain",
    "is_subdomain_of",
    "collect_hosts_from_html",
    "subdomain_candidates",
    "subdomain_candidates_batch",
    "FALLBACK_SUBDOMAIN_TAGS",
    "URL_HARVEST_PATTERNS",
    "HOST_ATTR_TAGS",
]

# career_pages_service.py:1097 — essential career subdomains
FALLBACK_SUBDOMAIN_TAGS = ["career", "careers", "jobs", "tuyen-dung", "viec-lam"]

# career_pages_service.py:103-105 — (tag, attr) URL sources
HOST_ATTR_TAGS = [
    ("a", "href"),
    ("link", "href"),
    ("script", "src"),
    ("img", "src"),
    ("form", "action"),
    ("source", "src"),
    ("iframe", "src"),
]

# career_pages_service.py:118-124 — verbatim
URL_HARVEST_PATTERNS = [
    r'https?://([A-Za-z0-9\-\._~%]+)(?:[:/][^\s\'"]*)?',
    r'"url":\s*"https?://([A-Za-z0-9\-\._~%]+)',
    r'"href":\s*"https?://([A-Za-z0-9\-\._~%]+)',
    r'https?://([A-Za-z0-9\-\._~%]+)\.com\.vn',
]
_HARVEST_RX = [re.compile(p, re.IGNORECASE) for p in URL_HARVEST_PATTERNS]


def safe_domain(base_url: str) -> tuple[str, str]:
    """career_pages_service.py:56-71 → (root_domain, netloc)."""
    parsed = urlparse(base_url if "://" in base_url else f"https://{base_url}")
    netloc = parsed.netloc or parsed.path
    netloc = netloc.lower().strip().rstrip("/")
    if netloc.startswith("www."):
        netloc = netloc[4:]
    parts = netloc.split(".")
    root = netloc
    if len(parts) >= 3:
        root = ".".join(parts[-3:]) if len(parts[-1]) <= 2 else ".".join(parts[-2:])
    return root, netloc


def is_subdomain_of(candidate_host: str, root_domain: str) -> bool:
    """career_pages_service.py:73-77."""
    c = candidate_host.lower().strip(".")
    r = root_domain.lower().strip(".")
    return c.endswith("." + r) and c != r


def _node_string(el: Node) -> str | None:
    """bs4 ``el.string``: the single string child, else None."""
    if len(el.children) == 1 and isinstance(el.children[0], str):
        return el.children[0]
    return None


def collect_hosts_from_html(html: str, base_url: str) -> set[str]:
    """career_pages_service.py:86-130 — all hostnames referenced by a
    page: tag-attribute URLs (urljoin-normalized) + regex harvest over
    inline script/style text and the full text blob."""
    hosts: set[str] = set()
    root = build_tree(html or "")

    wanted = {t: a for t, a in HOST_ATTR_TAGS}
    for el in root.iter_elements():
        attr = wanted.get(el.tag)
        if attr is None:
            continue
        u = el.attrs.get(attr)
        if not u:
            continue
        try:
            absu = urljoin(base_url, u)
        except Exception:
            absu = u
        p = urlparse(absu)
        if p.netloc:
            hosts.add(p.netloc.lower())

    inline_texts = [
        s
        for el in root.iter_elements()
        if el.tag in ("script", "style")
        for s in [_node_string(el)]
        if s
    ]
    inline_texts.append(root.get_text())
    blob = "\n".join(inline_texts)
    for rx in _HARVEST_RX:
        for m in rx.finditer(blob):
            hosts.add(m.group(1).lower())
    return hosts


def subdomain_candidates(
    base_url: str, html: str, extra_fallback: list[str] | None = None
) -> list[str]:
    """_smart_subdomain_search (:932-965) sans aliveness probe: harvest
    hosts, keep subdomains of the root, sort/dedup, append the fallback
    ``https://{tag}.{root}`` candidates, final sort/dedup."""
    root_domain, _netloc = safe_domain(base_url)
    if not root_domain or "." not in root_domain:
        return []
    discovered = sorted(
        {
            f"https://{h}"
            for h in collect_hosts_from_html(html, base_url)
            if is_subdomain_of(h, root_domain)
        }
    )
    tags = FALLBACK_SUBDOMAIN_TAGS + [
        t.strip().lower() for t in (extra_fallback or []) if t.strip()
    ]
    fallback = [f"https://{t}.{root_domain}" for t in tags]
    return sorted(set(discovered + fallback))


def subdomain_candidates_batch(batch: pa.Table) -> pa.Table:
    """pages → (url, subdomain_candidates list).  Input: url, html."""
    urls = batch["url"].to_pylist()
    htmls = batch["html"].to_pylist()
    out = []
    for u, h in zip(urls, htmls):
        html = (
            h.decode("utf-8", errors="ignore")
            if isinstance(h, (bytes, bytearray))
            else (h or "")
        )
        out.append(subdomain_candidates(u, html))
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "subdomain_candidates": pa.array(out, pa.list_(pa.string())),
        }
    )

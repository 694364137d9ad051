"""Frontier expansion rules — the pinned, deterministic restatement of the
reference spider's enqueue logic (``scrapy_career_spider.py:177-208,
471-495``), shared verbatim by the distributed engine and the
single-process conformance simulator.

Pinned determinism decisions (the reference's link order passes through a
Python ``set()`` and is therefore nondeterministic — SURVEY §7.4.2):

* candidate order = document order of anchors, first-occurrence dedup on
  the urljoined absolute URL;
* ``#fragment`` stripped (Scrapy's dupefilter canonicalization) before
  validity/caps;
* validity filter M7 on the absolute URL, then strict same-host netloc
  (the spider compares ``urlparse(u).netloc == self.domain``);
* optional robots gate (engine feature; reference disables robots);
* priority buckets M8 walked in order 100→80→50→10; per-bucket caps
  5/3/2/2 count *candidates*, not unseen survivors (the spider slices
  ``links[:max_links]`` before Scrapy's dupefilter runs);
* the URL-seen check happens after the caps, at enqueue time.
"""

from __future__ import annotations

from urllib.parse import urlparse

from . import classify

__all__ = ["candidate_links"]


def candidate_links(
    all_links: list[str],
    host: str,
    robots_allowed=None,
) -> list[tuple[str, int]]:
    """Per-page frontier candidates: [(url, priority)] after normalize /
    validity / same-host / robots / priority caps — before the seen check.

    ``all_links`` is the page's document-order, first-occurrence-deduped
    absolute link list; ``robots_allowed(url) -> bool`` is optional.
    """
    seen_local: set[str] = set()
    buckets: dict[int, list[str]] = {100: [], 80: [], 50: [], 10: []}
    for link in all_links:
        url = classify.normalize_url(link)
        if not url or url in seen_local:
            continue
        seen_local.add(url)
        if not classify.is_valid_link(url, host):
            continue
        if urlparse(url).netloc != host:
            continue
        if robots_allowed is not None and not robots_allowed(url):
            continue
        buckets[classify.priority_for_link(url)].append(url)
    out: list[tuple[str, int]] = []
    for prio in (100, 80, 50, 10):
        cap = classify.PRIORITY_LINK_CAPS[prio]
        out.extend((u, prio) for u in buckets[prio][:cap])
    return out

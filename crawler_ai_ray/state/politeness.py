"""Politeness + robots — per-host wave budgets.

The reference enforces politeness in real time: 1 req/s/domain with
randomized delay and autothrottle (``scrapy_career_spider.py:93-109``,
``crawler_ai/settings.py:12-58``).  A batch engine enforces the same
*rate* as a per-round budget: with round window ``W`` seconds and
per-host ``crawl_delay_s`` ``d``, a host may fetch at most
``max(1, W/d)`` pages per round — the token-bucket integral over the
round.  Hosts with no delay get the engine default wave size.

robots.txt: the reference disables it (``crawler_ai/settings.py:9``,
ROBOTSTXT_OBEY=False); the engine makes it a flag (north_rule requires
the gate).  With robots on, candidate URLs whose path starts with a
disallowed prefix are dropped before they reach the frontier, so they
never enter the URL-seen set either (FIXTURES.md F6).
"""

from __future__ import annotations

import re

from dataclasses import dataclass, field
from urllib.parse import urlparse

__all__ = ["HostPolicy", "CrawlPolicy", "load_host_policies"]


@dataclass(frozen=True)
class HostPolicy:
    crawl_delay_s: float = 0.0
    robots_disallow: tuple[str, ...] = ()
    max_pages: int = 50


@dataclass
class CrawlPolicy:
    """Engine-wide crawl parameters (reference values cited in SURVEY §6)."""

    default_wave: int = 5          # pages/host/round when no crawl delay
    round_window_s: float = 5.0    # nominal wall-time one round represents
    max_pages_default: int = 50    # routes.py:60 cap
    career_stop: int = 10          # early-stop (scrapy_career_spider.py:462)
    career_score_min: float = 0.3  # spider :438
    obey_robots: bool = False      # reference default (settings.py:9)
    hosts: dict[str, HostPolicy] = field(default_factory=dict)

    def policy(self, host: str) -> HostPolicy:
        return self.hosts.get(host) or HostPolicy(max_pages=self.max_pages_default)

    def wave_budget(self, host: str) -> int:
        p = self.policy(host)
        if p.crawl_delay_s > 0:
            return max(1, int(self.round_window_s / p.crawl_delay_s))
        return self.default_wave

    def max_pages(self, host: str) -> int:
        return self.policy(host).max_pages

    def robots_allowed(self, host: str, url: str) -> bool:
        if not self.obey_robots:
            return True
        p = self.policy(host)
        if not p.robots_disallow:
            return True
        path = urlparse(url).path or "/"
        return not any(path.startswith(pref) for pref in p.robots_disallow)


def load_host_policies(hostcfg_path: str) -> dict[str, HostPolicy]:
    import pyarrow.parquet as pq

    tbl = pq.read_table(hostcfg_path)
    out = {}
    for row in tbl.to_pylist():
        out[row["host"]] = HostPolicy(
            crawl_delay_s=row.get("crawl_delay_s") or 0.0,
            robots_disallow=tuple(row.get("robots_disallow") or ()),
            max_pages=row.get("max_pages") or 50,
        )
    return out


_PATH_RX = re.compile(r"^[a-z]+://[^/]+(/[^?#]*)")


def robots_audit(pages, hostcfg_path: str):
    """pages (url) → (url, host, path, blocked, rule): which URLs the
    per-host robots.txt disallow rules WOULD block if `obey_robots`
    were on (the reference ships it off, `settings.py:9`; the engine
    gates behind the same flag) — the pre-flight audit a crawl
    operator runs before enabling enforcement, and the driver-checkable
    face of the politeness/robots state (`robots_allowed` above).

    ``rule`` = the FIRST matching disallow prefix in stored list order
    ('' when allowed) — the same first-match the gate uses; the path
    is extracted with one shared regex (scheme://authority(/path
    before ?#)), '' → '/', so the DuckDB oracle (`regexp_extract` +
    `starts_with` inside `list_filter`) reproduces every row exactly.

    Scale shape: hostcfg is a DIMENSION table (config-sized, like the
    TPC-H broadcast sides) — loaded once, `ray.put` once, read per
    task; the pages stream maps embarrassingly parallel."""
    import ray
    import numpy as np
    import pyarrow as pa

    pol = load_host_policies(hostcfg_path)
    dis = {
        h: p.robots_disallow for h, p in pol.items() if p.robots_disallow
    }
    dis_ref = ray.put(dis)

    from ..functions.classify import host_of

    def audit(batch: pa.Table) -> pa.Table:
        if not batch.num_rows:
            return pa.table(
                {
                    "url": pa.array([], pa.string()),
                    "host": pa.array([], pa.string()),
                    "path": pa.array([], pa.string()),
                    "blocked": pa.array([], pa.bool_()),
                    "rule": pa.array([], pa.string()),
                }
            )
        d = ray.get(dis_ref)
        urls = batch["url"].to_pylist()
        hosts, paths, blocked, rules = [], [], [], []
        for u in urls:
            h = host_of(u)
            m = _PATH_RX.match(u)
            path = (m.group(1) if m else "") or "/"
            rule = ""
            for pref in d.get(h, ()):
                if path.startswith(pref):
                    rule = pref
                    break
            hosts.append(h)
            paths.append(path)
            rules.append(rule)
            blocked.append(bool(rule))
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "host": pa.array(hosts, pa.string()),
                "path": pa.array(paths, pa.string()),
                "blocked": pa.array(blocked, pa.bool_()),
                "rule": pa.array(rules, pa.string()),
            }
        )

    return pages.map_batches(audit, batch_format="pyarrow")

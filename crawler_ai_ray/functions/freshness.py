"""Freshness-driven recrawl scheduling rules (pure functions).

The λ-based revisit policy of Cho & Garcia-Molina, "Estimating frequency
of change" (ACM TOIT 2003): model per-page change as a Poisson process,
estimate the per-host rate λ from the fraction of common pages whose
content changed between two snapshots, and revisit a host after an
interval ∝ 1/λ.  This module turns the analysis-side signals
(`crawl_freshness_lambda` / `crawl_recrawl_priority` in
``__ray_entry__.py``) into the *scheduling inputs* the crawl loop's wave
planner consumes — per-host first-eligible round (``due_round``) and a
churn-prioritized fetch queue.

These are PURE rule functions shared by the distributed engine
(``pipelines/crawl.py::run_recrawl``) and the sequential conformance
simulator (``oracle/sim.py::simulate_recrawl``) — exactly like
``frontier_rules.candidate_links``; the orchestration (waves, rounds,
attempt counters, checkpoints) is written twice on purpose.

Snapshot-B derivation: the same deterministic ``md5(url) % 4`` selector
as the analysis queries' ``_snapshot_tagged`` (0 = removed in B,
1 = changed, 2 = same, 3 = added in B), applied to the urls the FIRST
crawl actually fetched — the url universe an incremental crawler really
has.  λ uses the identical estimator as ``crawl_freshness_lambda``:
``λ_micro = floor(−ln(1 − changed/(common+1))·1e6 + 0.5)`` (the +1 is
the standard open-interval smoothing; ln is the verified libm ≡ DuckDB
bit-equal class), ``revisit_milli = 1e9 // (λ_micro + 1)``.
"""

from __future__ import annotations

import hashlib
import math

__all__ = [
    "RECRAWL_PRIORITY",
    "REVISIT_MILLI_PER_ROUND",
    "RECRAWL_MAX_DUE",
    "url_churn_sel",
    "host_recrawl_plan",
]

# churn-status fetch priorities: changed pages are the freshness payoff,
# added pages are new content, unchanged pages are a cheap revalidation
RECRAWL_PRIORITY = {"changed": 90, "added": 80, "same": 50}

# one crawl round represents this much of the revisit clock; a host is
# first eligible at round revisit_milli // REVISIT_MILLI_PER_ROUND
REVISIT_MILLI_PER_ROUND = 1000

# never defer a host beyond this round (λ → 0 hosts: revisit → 1e9 ms)
RECRAWL_MAX_DUE = 8

_SEL_STATUS = {1: "changed", 2: "same", 3: "added"}


def url_churn_sel(url: str) -> int:
    """Deterministic snapshot-membership selector — identical to the
    analysis queries' ``_snapshot_tagged``: 0 removed-in-B, 1 changed,
    2 same, 3 added-in-B."""
    return int(hashlib.md5(url.encode()).hexdigest()[:8], 16) % 4


def host_recrawl_plan(urls_in_fetch_order: list[str]) -> dict:
    """Per-host recrawl schedule from the first crawl's successful
    fetches (IN per-host fetch order).

    Returns ``{due_round, lam_micro, revisit_milli, n_common,
    n_changed, queue}`` where ``queue`` is ``[(priority, seq, url,
    status), …]``: kept urls (sel 1/2) first in first-crawl fetch
    order, then added urls (sel 3) in ascending url order; ``seq``
    numbers that construction order, so the wave planner's
    (priority desc, seq asc) sort fetches changed → added → same,
    stable within each class.  Removed urls (sel 0) are dropped."""
    kept: list[tuple[str, str]] = []
    added: list[str] = []
    n_common = 0
    n_changed = 0
    for u in urls_in_fetch_order:
        sel = url_churn_sel(u)
        if sel == 0:
            continue
        if sel == 3:
            added.append(u)
            continue
        n_common += 1
        if sel == 1:
            n_changed += 1
        kept.append((u, _SEL_STATUS[sel]))
    lam_micro = math.floor(
        -math.log(1.0 - n_changed / (n_common + 1)) * 1_000_000 + 0.5
    )
    revisit_milli = 1_000_000_000 // (lam_micro + 1)
    due_round = min(revisit_milli // REVISIT_MILLI_PER_ROUND, RECRAWL_MAX_DUE)
    queue = []
    seq = 0
    for u, status in kept:
        queue.append((RECRAWL_PRIORITY[status], seq, u, status))
        seq += 1
    for u in sorted(added):
        queue.append((RECRAWL_PRIORITY["added"], seq, u, "added"))
        seq += 1
    return {
        "due_round": int(due_round),
        "lam_micro": int(lam_micro),
        "revisit_milli": int(revisit_milli),
        "n_common": n_common,
        "n_changed": n_changed,
        "queue": queue,
    }

"""Single-process crawl simulator — the conformance oracle (SURVEY §5.2
item 2, FIXTURES.md F4).

Implements the pinned wave-based crawl spec sequentially, per host, with
plain dicts/lists — an independent second implementation of what
``pipelines/crawl.py`` runs distributed.  Shared with the engine are only
the *pure rule functions* (classification, candidate caps); the
orchestration (waves, counters, seen set, queue ordering) is written
twice on purpose.

The spec (derived from ``scrapy_career_spider.py``; deviations pinned in
``functions/frontier_rules.py`` docstring):

* per-host state: priority queue [(priority, seq, url)], seen set,
  ``crawled`` (successful fetches), ``career_found``, ``attempts``;
* each round, a host fetches a *wave*: the top ``budget(host)`` queue
  entries ordered by (priority desc, seq asc) — FIFO within priority;
* wave pages are processed sequentially: miss → error row (no counter);
  hit → career counters, then **expansion is gated** by
  ``crawled < max_pages and career_found < career_stop`` evaluated after
  the page's own counter updates (the reference keeps *fetching* queued
  requests after the early-stop; it only stops enqueueing —
  ``parse_page`` returns before expansion, Scrapy drains its queue);
* expansion: ``candidate_links`` (M7/M8 + caps), then enqueue-time seen
  check (seed marked seen at t0);
* the crawl ends when every queue is empty.

With ``budget = 1`` every wave is a single page, which collapses the
wave model to a continuous per-host priority-queue crawl.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import pyarrow.parquet as pq

from ..functions.frontier_rules import candidate_links
from ..state.politeness import CrawlPolicy, load_host_policies

__all__ = ["simulate_crawl", "simulate_recrawl", "SimResult", "load_page_facts"]


@dataclass
class SimResult:
    fetch_log: list[dict] = field(default_factory=list)  # host,url,round,host_seq,priority,success
    seen: set[str] = field(default_factory=set)
    host_stats: dict[str, dict] = field(default_factory=dict)
    rounds: int = 0
    # (host, round) → queue length AFTER the round — the independent
    # reconstruction of the engine's per-bucket q-row counts that the
    # crawl_metrics golden aggregates (urls_in of round r = q rows at
    # end of r-1 plus one persistent s row per host)
    queue_log: list[dict] = field(default_factory=list)


def load_page_facts(corpus: str) -> dict[str, dict]:
    """url → {all_links, is_career, career_score} from the golden table."""
    g = pq.read_table(
        os.path.join(corpus, "golden.parquet"),
        columns=["url", "all_links", "is_career_listing", "career_score"],
    )
    return {
        r["url"]: {
            "all_links": list(r["all_links"]),
            "is_career": r["is_career_listing"],
            "career_score": r["career_score"],
        }
        for r in g.to_pylist()
    }


class _HostSim:
    def __init__(self, host: str, seed_url: str, policy: CrawlPolicy) -> None:
        self.host = host
        self.policy = policy
        self.queue: list[tuple[int, int, str]] = [(100, 0, seed_url)]
        self.seen: set[str] = {seed_url}
        self.next_seq = 1
        self.crawled = 0
        self.career_found = 0
        self.attempts = 0

    def run_round(self, rnd: int, pages: dict[str, dict], log: list[dict]) -> bool:
        if not self.queue:
            return False
        budget = self.policy.wave_budget(self.host)
        self.queue.sort(key=lambda e: (-e[0], e[1]))
        wave, self.queue = self.queue[:budget], self.queue[budget:]
        max_pages = self.policy.max_pages(self.host)
        for prio, seq, url in wave:
            page = pages.get(url)
            entry = {
                "host": self.host,
                "url": url,
                "round": rnd,
                "host_seq": self.attempts,
                "priority": prio,
                "success": page is not None,
            }
            self.attempts += 1
            log.append(entry)
            if page is None:
                continue
            if (
                page["is_career"]
                and page["career_score"] >= self.policy.career_score_min
            ):
                self.career_found += 1
            self.crawled += 1
            if self.crawled >= max_pages or self.career_found >= self.policy.career_stop:
                continue  # expansion gated; queued fetches continue
            for cand, cprio in candidate_links(
                page["all_links"],
                self.host,
                robots_allowed=(lambda u: self.policy.robots_allowed(self.host, u))
                if self.policy.obey_robots
                else None,
            ):
                if cand not in self.seen:
                    self.seen.add(cand)
                    self.queue.append((cprio, self.next_seq, cand))
                    self.next_seq += 1
        return bool(self.queue)


def simulate_crawl(
    corpus: str,
    policy: CrawlPolicy | None = None,
    max_rounds: int = 200,
) -> SimResult:
    if policy is None:
        policy = CrawlPolicy()
    if not policy.hosts:
        policy.hosts = load_host_policies(os.path.join(corpus, "hostcfg.parquet"))
    pages = load_page_facts(corpus)
    seeds = pq.read_table(os.path.join(corpus, "seeds.parquet")).to_pylist()
    seeds.sort(key=lambda r: r["seed_order"])
    sims = [_HostSim(r["host"], r["url"], policy) for r in seeds]

    res = SimResult()
    for rnd in range(max_rounds):
        any_left = False
        for sim in sims:
            if sim.run_round(rnd, pages, res.fetch_log):
                any_left = True
        for sim in sims:
            res.queue_log.append(
                {"host": sim.host, "round": rnd, "qlen": len(sim.queue)}
            )
        res.rounds = rnd + 1
        if not any_left:
            break
    for sim in sims:
        res.seen.update(sim.seen)
        res.host_stats[sim.host] = {
            "crawled": sim.crawled,
            "career_found": sim.career_found,
            "attempts": sim.attempts,
        }
    return res


# ---------------------------------------------------------------------------
# λ-scheduled recrawl replay (conformance oracle for run_recrawl)
# ---------------------------------------------------------------------------

class _HostRecrawlSim:
    def __init__(self, host: str, urls_in_fetch_order: list[str],
                 policy: CrawlPolicy) -> None:
        from ..functions.freshness import host_recrawl_plan

        self.host = host
        self.policy = policy
        plan = host_recrawl_plan(urls_in_fetch_order)
        self.due_round = plan["due_round"]
        # queue entries: (priority, seq, url, status)
        self.queue: list[tuple[int, int, str, str]] = list(plan["queue"])
        self.attempts = 0

    def run_round(self, rnd: int, log: list[dict]) -> bool:
        if not self.queue:
            return False
        if self.due_round > rnd:
            return True  # not yet eligible; queue waits
        budget = self.policy.wave_budget(self.host)
        self.queue.sort(key=lambda e: (-e[0], e[1]))
        wave, self.queue = self.queue[:budget], self.queue[budget:]
        for prio, seq, url, status in wave:
            log.append(
                {
                    "host": self.host,
                    "url": url,
                    "round": rnd,
                    "host_seq": self.attempts,
                    "priority": prio,
                    "status": status,
                    "success": True,
                }
            )
            self.attempts += 1
        return bool(self.queue)


def simulate_recrawl(
    corpus: str,
    policy: CrawlPolicy | None = None,
    max_rounds: int = 200,
) -> SimResult:
    """Sequential replay of the λ-scheduled refresh crawl
    (`pipelines/crawl.py::run_recrawl`): runs `simulate_crawl` first for
    the first-snapshot fetch log, then per host derives the SAME
    churn-prioritized queue + due round via the shared pure rule
    (`functions.freshness.host_recrawl_plan`) and drains it in waves.
    Orchestration (rounds, budgets, attempt counters) is written twice
    on purpose — only the pure rules are shared, exactly like
    `candidate_links` in the first-crawl sim."""
    if policy is None:
        policy = CrawlPolicy()
    if not policy.hosts:
        policy.hosts = load_host_policies(os.path.join(corpus, "hostcfg.parquet"))
    base = simulate_crawl(corpus, policy, max_rounds=max_rounds)
    fetched: dict[str, list[str]] = {}
    for e in base.fetch_log:  # per-host order = host_seq order
        if e["success"]:
            fetched.setdefault(e["host"], []).append(e["url"])
    sims = [
        _HostRecrawlSim(h, urls, policy)
        for h, urls in sorted(fetched.items())
    ]
    res = SimResult()
    # round -1 (init checkpoint) queue lengths — the recrawl metrics
    # reconstruction reads urls_in of round 0 from these
    for sim in sims:
        res.queue_log.append(
            {"host": sim.host, "round": -1, "qlen": len(sim.queue)}
        )
    for rnd in range(max_rounds):
        any_left = False
        for sim in sims:
            if sim.run_round(rnd, res.fetch_log):
                any_left = True
        for sim in sims:
            res.queue_log.append(
                {"host": sim.host, "round": rnd, "qlen": len(sim.queue)}
            )
        res.rounds = rnd + 1
        if not any_left:
            break
    for sim in sims:
        res.host_stats[sim.host] = {"attempts": sim.attempts,
                                    "due_round": sim.due_round}
    return res

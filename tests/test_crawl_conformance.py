"""Crawl-order + URL-seen conformance (SURVEY §5.2 item 2, FIXTURES F4/F5):
the distributed engine must reproduce the single-process oracle
simulator's per-host fetch sequences and final URL-seen set under the
same seed list and politeness budget; plus resume-from-checkpoint
byte-equality (F5)."""

from __future__ import annotations

import os

import pyarrow.compute as pc
import pytest

from crawler_ai_ray.oracle.sim import simulate_crawl
from crawler_ai_ray.state.politeness import CrawlPolicy


def _engine_log(out_dir: str):
    """Collect o-rows from every round checkpoint."""
    from crawler_ai_ray.pipelines.crawl import read_crawl_output

    tbl = read_crawl_output(
        out_dir,
        columns=["kind", "host", "url", "round", "host_seq", "priority", "success"],
        filter=pc.field("kind") == "o",
    )
    return tbl.to_pylist()


def _by_host(log):
    out: dict[str, list] = {}
    for r in sorted(log, key=lambda r: (r["host"], r["host_seq"])):
        out.setdefault(r["host"], []).append(
            (r["host_seq"], r["url"], r["priority"], bool(r["success"]))
        )
    return out


def _run_engine(corpus, out_dir, policy, resume=False):
    from crawler_ai_ray.pipelines.crawl import CrawlConfig, run_crawl

    cfg = CrawlConfig(corpus, out_dir, policy=policy, seen_shards=4, store_shards=2)
    return run_crawl(cfg, resume=resume)


@pytest.mark.usefixtures("ray_session")
def test_engine_matches_simulator(unit_corpus, tmp_path):
    policy = CrawlPolicy()
    sim = simulate_crawl(unit_corpus, CrawlPolicy())
    out_dir = str(tmp_path / "crawl")
    totals = _run_engine(unit_corpus, out_dir, policy)

    # same number of fetch attempts and successes
    assert totals["fetched"] == sum(1 for r in sim.fetch_log if r["success"])
    assert totals["errors"] == sum(1 for r in sim.fetch_log if not r["success"])

    eng = _by_host(_engine_log(out_dir))
    oracle = _by_host(sim.fetch_log)
    assert set(eng) == set(oracle)
    for host in oracle:
        assert eng[host] == oracle[host], f"fetch sequence differs for {host}"

    # final URL-seen set equality (north_rule gate): the checkpoint is a
    # per-round DELTA dump — the full set is the union over all rounds
    import pyarrow.parquet as pq

    seen_root = os.path.join(out_dir, "seen")
    engine_seen = set()
    for d in sorted(os.listdir(seen_root)):
        for f in os.listdir(os.path.join(seen_root, d)):
            engine_seen.update(
                pq.read_table(os.path.join(seen_root, d, f))["url"].to_pylist()
            )
    assert engine_seen == sim.seen


@pytest.mark.usefixtures("ray_session")
def test_wave1_budget_and_robots(unit_corpus, tmp_path):
    """budget=1 collapses waves to a continuous per-host crawl; robots=on
    must keep disallowed prefixes out of the fetch log AND the seen set."""
    policy = CrawlPolicy(default_wave=1, round_window_s=1.0, obey_robots=True)
    sim = simulate_crawl(unit_corpus, CrawlPolicy(default_wave=1, round_window_s=1.0, obey_robots=True))
    out_dir = str(tmp_path / "crawl_w1")
    _run_engine(unit_corpus, out_dir, policy)
    eng = _by_host(_engine_log(out_dir))
    oracle = _by_host(sim.fetch_log)
    assert eng == oracle

    # robots actually gated something: hosts with disallow rules exist in
    # the unit corpus, and none of their disallowed URLs were fetched
    from crawler_ai_ray.state.politeness import load_host_policies

    pols = load_host_policies(os.path.join(unit_corpus, "hostcfg.parquet"))
    gated_hosts = [h for h, p in pols.items() if p.robots_disallow]
    assert gated_hosts
    fetched_urls = {u for seqs in eng.values() for (_s, u, _p, _ok) in seqs}
    blocked = [
        u
        for u in fetched_urls
        for h in gated_hosts
        if u.startswith(f"https://{h}/")
        and any(
            u.removeprefix(f"https://{h}").startswith(pref)
            for pref in pols[h].robots_disallow
        )
    ]
    assert blocked == []


@pytest.mark.usefixtures("ray_session")
def test_resume_matches_uninterrupted(unit_corpus, tmp_path):
    """F5: stop after round r, resume, final log equals an uninterrupted run."""
    policy = CrawlPolicy()
    full_dir = str(tmp_path / "full")
    _run_engine(unit_corpus, full_dir, policy)
    full = _by_host(_engine_log(full_dir))

    from crawler_ai_ray.pipelines.crawl import CrawlConfig, run_crawl

    part_dir = str(tmp_path / "part")
    cfg = CrawlConfig(unit_corpus, part_dir, policy=CrawlPolicy(),
                      seen_shards=4, store_shards=2, max_rounds=3)
    run_crawl(cfg)  # stops after 3 rounds
    cfg2 = CrawlConfig(unit_corpus, part_dir, policy=CrawlPolicy(),
                       seen_shards=4, store_shards=2)
    run_crawl(cfg2, resume=True)
    resumed = _by_host(_engine_log(part_dir))
    assert resumed == full


@pytest.mark.usefixtures("ray_session")
def test_local_and_distributed_rounds_identical(unit_corpus, tmp_path):
    """The scale-adaptive fast path (tiny rounds run driver-local
    through the same per-bucket code) must be byte-identical to the
    always-distributed execution."""
    from crawler_ai_ray.pipelines.crawl import (
        CrawlConfig,
        crawl_output_files,
        run_crawl,
    )
    import pyarrow.dataset as pads

    outs = {}
    for name, threshold in (("local", 10**9), ("dist", 0)):
        out_dir = str(tmp_path / name)
        cfg = CrawlConfig(
            unit_corpus, out_dir, seen_shards=4, store_shards=2,
            local_round_rows=threshold, buckets=8,
        )
        run_crawl(cfg)
        tbl = pads.dataset(
            crawl_output_files(out_dir), format="parquet"
        ).to_table()
        outs[name] = tbl.sort_by(
            [("kind", "ascending"), ("host", "ascending"),
             ("url", "ascending"), ("round", "ascending")]
        )
    assert outs["local"].equals(outs["dist"])
    assert outs["local"].num_rows > 0


@pytest.mark.usefixtures("ray_session")
def test_split_buckets_identical(unit_corpus, tmp_path):
    """Explicit hot-bucket repartitioning (split_queue_rows): forcing
    every bucket to split into salted-host sub-tasks must produce
    byte-identical output to the unsplit run — hosts stay disjoint
    across sub-tasks, so only parallelism changes."""
    from crawler_ai_ray.pipelines.crawl import (
        CrawlConfig,
        crawl_output_files,
        run_crawl,
    )
    import pyarrow.dataset as pads

    outs = {}
    for name, split in (("whole", 0), ("split", 1)):
        out_dir = str(tmp_path / name)
        cfg = CrawlConfig(
            unit_corpus, out_dir, seen_shards=4, store_shards=2,
            buckets=8, local_round_rows=0,  # force the distributed path
            split_queue_rows=split, max_split=4,
        )
        run_crawl(cfg)
        tbl = pads.dataset(
            crawl_output_files(out_dir), format="parquet"
        ).to_table()
        outs[name] = tbl.sort_by(
            [("kind", "ascending"), ("host", "ascending"),
             ("url", "ascending"), ("round", "ascending")]
        )
    assert outs["whole"].equals(outs["split"])
    assert outs["whole"].num_rows > 0

    # the split run's lineage must show fanned-out sub-tasks
    from crawler_ai_ray.pipelines.crawl import read_crawl_metrics

    m = read_crawl_metrics(str(tmp_path / "split"))
    assert max(m["sub"].to_pylist()) > 0


@pytest.mark.usefixtures("ray_session")
def test_pool_reuse_identical(unit_corpus, tmp_path):
    """Service-pattern pool reuse (run_crawl(store_pool=, seen_pool=))
    must be byte-identical to fresh pools — including a SECOND crawl on
    the same reused pools (reset() must fully blank seen state)."""
    import os

    import pyarrow.dataset as pads

    from crawler_ai_ray.pipelines.crawl import (
        CrawlConfig,
        crawl_output_files,
        run_crawl,
    )
    from crawler_ai_ray.state.pagestore import PageStorePool
    from crawler_ai_ray.state.seen import SeenPool

    def collect(out_dir):
        return pads.dataset(
            crawl_output_files(out_dir), format="parquet"
        ).to_table().sort_by(
            [("kind", "ascending"), ("host", "ascending"),
             ("url", "ascending"), ("round", "ascending")]
        )

    fresh_dir = str(tmp_path / "fresh")
    run_crawl(
        CrawlConfig(unit_corpus, fresh_dir, seen_shards=4, store_shards=2)
    )
    fresh = collect(fresh_dir)

    store = PageStorePool(
        os.path.join(unit_corpus, "pages.parquet"), 2
    )
    seen = SeenPool(4)
    try:
        for name in ("pooled1", "pooled2"):
            d = str(tmp_path / name)
            run_crawl(
                CrawlConfig(
                    unit_corpus, d, seen_shards=4, store_shards=2
                ),
                store_pool=store,
                seen_pool=seen,
            )
            assert collect(d).equals(fresh), name
    finally:
        store.shutdown()
        seen.shutdown()
    assert fresh.num_rows > 0


@pytest.mark.usefixtures("ray_session")
def test_recrawl_matches_simulator(unit_corpus, tmp_path):
    """The λ-scheduled refresh crawl (run_recrawl) must replay exactly
    like oracle/sim.py::simulate_recrawl: identical per-host fetch
    sequences (url, priority, churn status), identical ROUND assignment
    (the due-round gate in _plan_bucket), and at least one host must be
    deferred past round 0 so the freshness schedule is actually
    exercised."""
    from crawler_ai_ray.oracle.sim import simulate_recrawl
    from crawler_ai_ray.pipelines.crawl import (
        read_crawl_output,
        run_recrawl,
    )

    policy = CrawlPolicy()
    out_dir = str(tmp_path / "crawl")
    _run_engine(unit_corpus, out_dir, policy)
    rout = str(tmp_path / "recrawl")
    totals = run_recrawl(
        unit_corpus, out_dir, rout, policy=CrawlPolicy(), store_shards=2
    )
    sim = simulate_recrawl(unit_corpus, CrawlPolicy())

    assert totals["fetched"] == len(sim.fetch_log) and totals["errors"] == 0

    eng = read_crawl_output(
        rout,
        columns=[
            "kind", "host", "url", "round", "host_seq", "priority",
            "status", "success",
        ],
        filter=pc.field("kind") == "o",
    ).to_pylist()

    def key(rows):
        out: dict[str, list] = {}
        for r in sorted(rows, key=lambda r: (r["host"], r["host_seq"])):
            out.setdefault(r["host"], []).append(
                (
                    r["host_seq"], r["url"], r["round"], r["priority"],
                    r["status"], bool(r["success"]),
                )
            )
        return out

    eng_k, sim_k = key(eng), key(sim.fetch_log)
    assert set(eng_k) == set(sim_k)
    for host in sim_k:
        assert eng_k[host] == sim_k[host], f"recrawl differs for {host}"

    # the schedule must be non-trivial: hosts spread over >1 due round,
    # and within a host changed urls fetch before same-status ones
    dues = {s["due_round"] for s in sim.host_stats.values()}
    assert len(dues) > 1, f"degenerate λ schedule: {dues}"
    for host, rows in sim_k.items():
        statuses = [r[4] for r in rows]
        if "changed" in statuses and "same" in statuses:
            assert statuses.index("changed") < statuses.index("same")


def test_host_recrawl_plan_edges():
    """Pure-rule edge cases: all-removed hosts get an empty queue; a
    zero-changed host gets λ=0 and the max due round; ordering is
    kept-in-fetch-order then added-by-url."""
    from crawler_ai_ray.functions.freshness import (
        RECRAWL_MAX_DUE,
        host_recrawl_plan,
        url_churn_sel,
    )

    urls = [f"https://h.test/p{i}" for i in range(200)]
    plan = host_recrawl_plan(urls)
    sels = [url_churn_sel(u) for u in urls]
    assert plan["n_common"] == sum(1 for s in sels if s in (1, 2))
    assert plan["n_changed"] == sum(1 for s in sels if s == 1)
    assert len(plan["queue"]) == sum(1 for s in sels if s != 0)
    # seqs are 0..n-1 in construction order; added urls sorted
    seqs = [e[1] for e in plan["queue"]]
    assert seqs == list(range(len(seqs)))
    added = [e[2] for e in plan["queue"] if e[3] == "added"]
    assert added == sorted(added)
    kept = [e[2] for e in plan["queue"] if e[3] != "added"]
    assert kept == [u for u, s in zip(urls, sels) if s in (1, 2)]

    removed_only = [u for u, s in zip(urls, sels) if s == 0]
    p0 = host_recrawl_plan(removed_only)
    assert p0["queue"] == [] and p0["n_changed"] == 0
    assert p0["lam_micro"] == 0 and p0["due_round"] == RECRAWL_MAX_DUE


@pytest.mark.usefixtures("ray_session")
def test_recrawl_resume_matches_uninterrupted(unit_corpus, tmp_path):
    """Stop the λ-scheduled recrawl after a few rounds, resume, and the
    final o-row log must equal an uninterrupted run's."""
    from crawler_ai_ray.pipelines.crawl import (
        read_crawl_output,
        run_recrawl,
    )

    crawl_dir = str(tmp_path / "crawl")
    _run_engine(unit_corpus, crawl_dir, CrawlPolicy())

    def olog(d):
        t = read_crawl_output(
            d,
            columns=["kind", "host", "url", "round", "host_seq",
                     "priority", "status"],
            filter=pc.field("kind") == "o",
        )
        return sorted(map(tuple, zip(*[t[c].to_pylist()
                                       for c in t.column_names])))

    full_dir = str(tmp_path / "rc_full")
    run_recrawl(unit_corpus, crawl_dir, full_dir, store_shards=2)
    full = olog(full_dir)

    part_dir = str(tmp_path / "rc_part")
    run_recrawl(
        unit_corpus, crawl_dir, part_dir, store_shards=2, max_rounds=3
    )
    totals = run_recrawl(
        unit_corpus, crawl_dir, part_dir, store_shards=2, resume=True
    )
    assert olog(part_dir) == full
    # resuming a FINISHED run is a cheap no-op with correct tallies
    again = run_recrawl(
        unit_corpus, crawl_dir, part_dir, store_shards=2, resume=True
    )
    assert again["fetched"] == totals["fetched"]

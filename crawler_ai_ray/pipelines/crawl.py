"""The distributed crawl loop — iterative rounds over a PERSISTENT
host-hash partitioning (SURVEY §3.1 restatement).

``host`` is the engine's single partition key (URL-seen shards, page
store, politeness waves), and it never changes for a row — so the
frontier checkpoint is kept bucketed by ``hash(host) % buckets`` across
rounds and a round needs **no all-to-all exchange at all**:

::

    round r:  buckets × parallel tasks, each on its own partition:
      read  checkpoint/round=r-1/bucket=K   (queue + host-state rows)
      → plan_wave   per host   # ST6/O1: sort (priority desc, seq asc)
      #   within host, take wave budget, assign host_seq (ST2 politeness)
      → fetch_and_extract      # S1: batched page-store actor calls (the
      #   sandbox network) + one-pass HTML extraction (M18, M1-M10)
      → expand      per host   # sequential per-host fold: counters,
      #   early-stop, candidate caps (frontier expansion)
      → seen_filter            # ST1/J5 anti-join: batched calls to the
      #   sharded cuckoo/set actor pool
      → write checkpoint/round=r/bucket=J/src=K.parquet
      #   rows routed to their DESTINATION host bucket: the partitioned
      #   write IS the (tiny) shuffle — only candidates for new hosts
      #   (e.g. careers.X discovered on X) ever cross buckets

All rows travel in ONE unified Arrow schema tagged by ``kind``: ``q``
queue entries, ``s`` host state, ``w`` planned wave, ``o`` fetched-page
output.  The next round reads only q/s rows back (parquet filter
pushdown on ``kind``).  An earlier formulation expressed the per-host
steps as ``groupby(host).map_groups`` — two sorts per round whose fixed
cost (~7 s at sf0.1) dwarfed the useful work; the persistent bucketing
produces byte-identical output with ~10× lower round latency and scales
the same way (buckets ≥ cluster cores; thousands at 10^10-frontier).

Semantics are the pinned wave-crawl spec — see ``oracle/sim.py`` (the
independent sequential implementation tests conformance: identical
per-host fetch sequences + final URL-seen set).

Scale notes (10^10-frontier framing):
* hot hosts cannot stall a wave: the wave budget bounds per-host work
  per round regardless of queue depth (skew is bounded by design; a
  host's backlog just takes more rounds — politeness demands that
  serialization anyway);
* bucket skew is hash-balanced over hosts; a pathological bucket can be
  split by raising ``buckets`` (resume re-routes rows on the next
  partitioned write);
* the checkpoint is the frontier: worker memory per round is one
  bucket's queue + wave, so size ``buckets`` to the cluster;
* tiny tail rounds skip task dispatch entirely and run the same
  per-bucket code driver-local (``local_round_rows``).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import pyarrow.parquet as pq

from ..functions import classify
from ..functions.frontier_rules import candidate_links
from ..functions.htmltext import (
    facts_jobdetail_text,
    parse_page,
)
from ..functions import contacts
from ..state.politeness import CrawlPolicy, load_host_policies
from ..state.seen import SeenPool, shard_for_host
from ..state.pagestore import PageStorePool

__all__ = ["CrawlConfig", "run_crawl", "CRAWL_SCHEMA"]

CRAWL_SCHEMA = pa.schema(
    [
        ("kind", pa.string()),       # q | s | w | o
        ("host", pa.string()),
        ("url", pa.string()),
        ("priority", pa.int32()),
        ("seq", pa.int64()),
        ("round", pa.int32()),
        ("host_seq", pa.int64()),
        # s-row counters
        ("crawled", pa.int32()),
        ("career_found", pa.int32()),
        ("attempts", pa.int64()),
        ("next_seq", pa.int64()),
        # o-row payload
        ("success", pa.bool_()),
        # fetch taxonomy (functions/fetch_errors — crawler.py:424-446):
        # status at the terminating step (null on exception failures),
        # error class, GET attempts consumed by the retry loop
        ("status_code", pa.int32()),
        ("error_type", pa.string()),
        ("fetch_attempts", pa.int32()),
        ("is_career", pa.bool_()),
        ("career_score", pa.float64()),
        ("is_job_url", pa.bool_()),
        ("all_links", pa.list_(pa.string())),
        ("job_urls", pa.list_(pa.string())),
        ("text", pa.string()),
        ("title", pa.string()),
        ("emails", pa.list_(pa.string())),
        ("phones_vn", pa.list_(pa.string())),
        ("html_bytes", pa.int64()),
    ]
)

_NULLS = {name: None for name in CRAWL_SCHEMA.names}


def _rows_to_table(rows: list[dict]) -> pa.Table:
    return pa.Table.from_pylist(
        [{**_NULLS, **r} for r in rows], schema=CRAWL_SCHEMA
    )


class CrawlConfig:
    def __init__(
        self,
        corpus: str,
        out_dir: str,
        policy: CrawlPolicy | None = None,
        seen_shards: int = 8,
        store_shards: int = 8,
        exact_seen: bool = True,
        max_rounds: int = 200,
        local_round_rows: int = 64,
        buckets: int = 32,
    ) -> None:
        self.corpus = corpus
        self.out_dir = out_dir
        self.policy = policy or CrawlPolicy()
        if not self.policy.hosts:
            self.policy.hosts = load_host_policies(
                os.path.join(corpus, "hostcfg.parquet")
            )
        self.seen_shards = seen_shards
        self.store_shards = store_shards
        self.exact_seen = exact_seen
        self.max_rounds = max_rounds
        # scale-adaptive execution: a round whose input (q+s rows) is at
        # most this big runs driver-locally through the SAME stage
        # functions — the two all-to-all shuffles + dataset setup cost
        # ~2-3 s of fixed overhead per round, which dominates tiny tail
        # rounds; beyond a few hundred rows the parallel parse wins
        # (serial extraction is ~4 ms/page), so the threshold is small.
        # Big rounds — the 10^10-frontier case — always take the
        # distributed pipeline.  0 disables the fast path.
        self.local_round_rows = local_round_rows
        # persistent host-hash partition count: every round is `buckets`
        # parallel tasks, each processing the hosts whose hash lands in
        # its bucket; a round has NO all-to-all exchange (cross-bucket
        # candidates ride the partitioned write).  Size ≥ cluster cores;
        # at 10^10-frontier scale use thousands so a bucket-round fits a
        # worker's heap.
        self.buckets = buckets


# ---------------------------------------------------------------------------
# stage 1: wave planning (groupby host)
# ---------------------------------------------------------------------------

def _make_plan_wave(policy: CrawlPolicy, rnd: int):
    def plan_wave(group: pa.Table) -> pa.Table:
        rows = group.to_pylist()
        s = next((r for r in rows if r["kind"] == "s"), None)
        if s is None:  # host with no state row (shouldn't happen) — drop
            return _rows_to_table([])
        q = [r for r in rows if r["kind"] == "q"]
        host = s["host"]
        if not q:
            return _rows_to_table([s])
        q.sort(key=lambda r: (-r["priority"], r["seq"]))
        budget = policy.wave_budget(host)
        wave, rest = q[:budget], q[budget:]
        out = []
        attempts = s["attempts"]
        for i, r in enumerate(wave):
            out.append(
                {
                    "kind": "w",
                    "host": host,
                    "url": r["url"],
                    "priority": r["priority"],
                    "seq": r["seq"],
                    "round": rnd,
                    "host_seq": attempts + i,
                }
            )
        s = dict(s)
        s["attempts"] = attempts + len(wave)
        out.append(s)
        out.extend(rest)
        return _rows_to_table(out)

    return plan_wave


# ---------------------------------------------------------------------------
# stage 2: fetch + extract (stateless tasks + page-store actor calls)
# ---------------------------------------------------------------------------

def _make_fetch_extract(store_handles: list, num_store_shards: int):
    import ray

    def fetch_extract(batch: pa.Table) -> pa.Table:
        mask = pc.equal(batch["kind"], "w")
        if not pc.any(mask).as_py():
            return batch
        rest = batch.filter(pc.invert(mask))
        rows = batch.filter(mask).to_pylist()
        wave_idx = range(len(rows))
        # one batched store call per shard
        by_shard: dict[int, list[int]] = {}
        for i in wave_idx:
            sh = shard_for_host(rows[i]["host"], num_store_shards)
            by_shard.setdefault(sh, []).append(i)
        refs = {
            sh: store_handles[sh].fetch_detailed.remote(
                [rows[i]["url"] for i in idxs]
            )
            for sh, idxs in by_shard.items()
        }
        fetched = {sh: ray.get(ref) for sh, ref in refs.items()}
        for sh, idxs in by_shard.items():
            for j, i in enumerate(idxs):
                f = fetched[sh][j]
                html_b = f["html"]
                r = rows[i]
                r["kind"] = "e"
                r["status_code"] = f["status_code"]
                r["error_type"] = f["error_type"]
                r["fetch_attempts"] = f["attempts_used"]
                if html_b is None:
                    r["success"] = False
                    continue
                html = html_b.decode("utf-8", errors="ignore")
                facts = parse_page(html)
                url = r["url"]
                title = (facts.title or "").strip()
                text = facts_jobdetail_text(facts)
                from ..stages.extract import _all_links, _join_anchors

                all_links = _all_links(_join_anchors(facts, url))
                r.update(
                    success=True,
                    is_career=classify.is_career_listing_page(url, html),
                    career_score=classify.career_page_score(url, title, html),
                    is_job_url=classify.is_job_url(url),
                    all_links=all_links,
                    job_urls=[u for u in all_links if classify.is_job_url(u)],
                    text=text,
                    title=title,
                    emails=contacts.extract_emails(html),
                    phones_vn=contacts.extract_phones_vn(text),
                    html_bytes=len(html_b),
                )
        out = _rows_to_table(rows)
        return pa.concat_tables([rest.cast(CRAWL_SCHEMA), out]) if rest.num_rows else out

    return fetch_extract


# ---------------------------------------------------------------------------
# stage 3: expansion (groupby host, sequential per-host fold + seen actors)
# ---------------------------------------------------------------------------

def _make_expand(policy: CrawlPolicy):
    """Stage 3a: per-host sequential fold (counters, early-stop, caps).

    Emits candidate rows (``kind='c'``) with *optimistically* assigned
    ``seq`` — the seen anti-join happens in the next stage as batched
    shard calls, so this groupby never blocks on an actor.  Candidates
    that turn out already-seen leave gaps in ``seq``; only the relative
    order matters for the wave sort, so ordering conformance holds."""

    def expand(group: pa.Table) -> pa.Table:
        rows = group.to_pylist()
        s = next((r for r in rows if r["kind"] == "s"), None)
        if s is None:
            return _rows_to_table([])
        host = s["host"]
        wave = sorted(
            (r for r in rows if r["kind"] == "e"), key=lambda r: r["host_seq"]
        )
        rest_q = [r for r in rows if r["kind"] == "q"]
        out: list[dict] = []
        crawled = s["crawled"]
        career_found = s["career_found"]
        next_seq = s["next_seq"]
        max_pages = policy.max_pages(host)
        robots = (
            (lambda u: policy.robots_allowed(host, u))
            if policy.obey_robots
            else None
        )
        for r in wave:
            o = dict(r)
            o["kind"] = "o"
            out.append(o)
            if not r["success"]:
                continue
            if (
                r["is_career"]
                and r["career_score"] >= policy.career_score_min
            ):
                career_found += 1
            crawled += 1
            if crawled >= max_pages or career_found >= policy.career_stop:
                continue  # expansion gated (fetching of queued URLs continues)
            for cand, cprio in candidate_links(r["all_links"] or [], host, robots):
                out.append(
                    {
                        "kind": "c",
                        "host": host,
                        "url": cand,
                        "priority": cprio,
                        "seq": next_seq,
                    }
                )
                next_seq += 1
        out.extend(rest_q)
        s = dict(s)
        s.update(crawled=crawled, career_found=career_found, next_seq=next_seq)
        out.append(s)
        return _rows_to_table(out)

    return expand


def _make_seen_filter(seen_handles: list, num_seen_shards: int):
    """Stage 3b: candidate rows → queue rows surviving the URL-seen
    anti-join (J5).  One batched ``check_and_add`` call per shard per
    batch (all shards queried in parallel) — O(shards) actor calls per
    block instead of O(hosts) per round.  Row order within the batch is
    preserved, so per-host candidate order survives."""
    import ray

    def seen_filter(batch: pa.Table) -> pa.Table:
        mask = pc.equal(batch["kind"], "c")
        if not pc.any(mask).as_py():
            return batch
        rest = batch.filter(pc.invert(mask))
        cand = batch.filter(mask)
        hosts = cand["host"].to_pylist()
        urls = cand["url"].to_pylist()
        by_shard: dict[int, list[int]] = {}
        for i, h in enumerate(hosts):
            by_shard.setdefault(shard_for_host(h, num_seen_shards), []).append(i)
        refs = {
            sh: seen_handles[sh].check_and_add.remote([urls[i] for i in idxs])
            for sh, idxs in by_shard.items()
        }
        fresh = np.zeros(len(urls), dtype=bool)
        for sh, idxs in by_shard.items():
            for i, ok in zip(idxs, ray.get(refs[sh])):
                fresh[i] = ok
        kept = cand.filter(pa.array(fresh))
        kept = kept.set_column(
            kept.schema.get_field_index("kind"),
            "kind",
            pa.array(["q"] * kept.num_rows, pa.string()),
        )
        parts = [t for t in (rest, kept) if t.num_rows]
        return (
            pa.concat_tables([t.cast(CRAWL_SCHEMA) for t in parts])
            if parts
            else kept
        )

    return seen_filter


# ---------------------------------------------------------------------------
# driver loop
# ---------------------------------------------------------------------------

def _initial_state(cfg: CrawlConfig, seen: SeenPool) -> pa.Table:
    seeds = pq.read_table(os.path.join(cfg.corpus, "seeds.parquet")).to_pylist()
    seeds.sort(key=lambda r: r["seed_order"])
    rows = []
    by_shard: dict[int, list[str]] = {}
    for r in seeds:
        host = r["host"]
        rows.append(
            {"kind": "q", "host": host, "url": r["url"], "priority": 100, "seq": 0}
        )
        rows.append(
            {
                "kind": "s",
                "host": host,
                "crawled": 0,
                "career_found": 0,
                "attempts": 0,
                "next_seq": 1,
            }
        )
        by_shard.setdefault(shard_for_host(host, seen.num_shards), []).append(r["url"])
    import ray

    ray.get(
        [seen.shards[sh].check_and_add.remote(urls) for sh, urls in by_shard.items()]
    )
    return _rows_to_table(rows)


def _round_dir(out_dir: str, rnd: int) -> str:
    return os.path.join(out_dir, f"round={rnd:04d}")


def crawl_output_files(
    out_dir: str, include_init: bool = False, only_round: int | None = None
) -> list[str]:
    """All checkpoint parquet part files (round/bucket partitioned), in
    round order."""
    files = []
    for d in sorted(os.listdir(out_dir)):
        if not d.startswith("round="):
            continue
        if not include_init and only_round is None and "-" in d:
            continue
        if only_round is not None and d != f"round={only_round:04d}":
            continue
        full = os.path.join(out_dir, d)
        for root, _dirs, names in sorted(os.walk(full)):
            files.extend(
                os.path.join(root, f)
                for f in sorted(names)
                if f.endswith(".parquet")
            )
    return files


def read_crawl_metrics(out_dir: str) -> pa.Table:
    """Per-(round, bucket) lineage/metrics rows from the round
    manifests — the ``metrics`` table of SURVEY §1.2."""
    rows: list[dict] = []
    for d in sorted(os.listdir(out_dir)):
        if not d.startswith("round=") or "-" in d:
            continue
        mpath = os.path.join(out_dir, d, "_MANIFEST.json")
        if not os.path.exists(mpath):
            continue
        with open(mpath) as f:
            m = json.load(f)
        for p in m.get("partitions", []):
            rows.append(
                {
                    "round": m["round"],
                    "bucket": p["bucket"],
                    "urls_in": p["urls_in"],
                    "fetched": p["fetched"],
                    "errors": p["errors"],
                    "bytes": p["bytes"],
                    "wall_ms": p["wall_ms"],
                    "input_files": p["input_files"],
                }
            )
    return pa.Table.from_pylist(rows)


def read_crawl_output(out_dir: str, columns=None, filter=None) -> pa.Table:
    """o/q/s rows across every round checkpoint as one Arrow table."""
    ds = pads.dataset(crawl_output_files(out_dir), format="parquet")
    return ds.to_table(columns=columns, filter=filter)


def _bucket_dir(round_dir: str, bucket: int) -> str:
    return os.path.join(round_dir, f"bucket={bucket:04d}")


def _by_host(tbl: pa.Table) -> list[pa.Table]:
    groups: dict[str, list[dict]] = {}
    for row in tbl.to_pylist():
        groups.setdefault(row["host"], []).append(row)
    return [_rows_to_table(groups[h]) for h in sorted(groups)]


def _process_bucket(
    bucket: int,
    rnd: int,
    prev: str,
    out: str,
    policy: CrawlPolicy,
    seen_handles: list,
    n_seen: int,
    store_handles: list,
    n_store: int,
    n_buckets: int,
) -> dict:
    """One bucket's round: read its q/s partition, run the full stage
    chain host-locally (plan_wave → fetch_extract → expand →
    seen_filter), then write rows out partitioned by DESTINATION host
    bucket (`bucket=J/src={K}.parquet`).  Host-hash bucketing is the
    engine's single persistent partition key, so a round needs NO
    all-to-all exchange: the only cross-bucket traffic is candidates for
    new hosts (e.g. a careers.X subdomain discovered on X), which ride
    the partitioned write."""
    t0 = time.time()
    bdir = _bucket_dir(prev, bucket)
    if os.path.isdir(bdir):
        in_files = sorted(
            f for f in os.listdir(bdir) if f.endswith(".parquet")
        )
        table = (
            pads.dataset(bdir, format="parquet")
            .to_table(filter=pc.field("kind").isin(["q", "s"]))
            .cast(CRAWL_SCHEMA)
        )
    else:
        in_files = []
        table = _rows_to_table([])
    counts = {
        "bucket": bucket, "q": 0, "s": 0, "o": 0,
        "urls_in": int(table.num_rows), "fetched": 0, "errors": 0,
        "bytes": 0, "wall_ms": 0.0, "input_files": len(in_files),
    }
    if table.num_rows == 0:
        return counts
    plan = _make_plan_wave(policy, rnd)
    fetchx = _make_fetch_extract(store_handles, n_store)
    expand = _make_expand(policy)
    seenf = _make_seen_filter(seen_handles, n_seen)

    planned = [plan(g) for g in _by_host(table)]
    planned_tbl = pa.concat_tables(planned) if planned else _rows_to_table([])
    fetched_tbl = fetchx(planned_tbl)
    expanded = [expand(g) for g in _by_host(fetched_tbl)]
    expanded_tbl = (
        pa.concat_tables(expanded) if expanded else _rows_to_table([])
    )
    result = seenf(expanded_tbl)

    dest = np.array(
        [shard_for_host(h, n_buckets) for h in result["host"].to_pylist()],
        dtype=np.int64,
    )
    for j in sorted(set(dest.tolist())):
        part = result.filter(pa.array(dest == j))
        ddir = _bucket_dir(out, j)
        os.makedirs(ddir, exist_ok=True)
        pq.write_table(part, os.path.join(ddir, f"src={bucket:04d}.parquet"))
    kinds = result["kind"].to_pylist()
    for k in ("q", "s", "o"):
        counts[k] = kinds.count(k)
    o_mask = pc.equal(result["kind"], "o")
    o_rows = result.filter(o_mask)
    if o_rows.num_rows:
        succ = pc.sum(
            pc.cast(pc.fill_null(o_rows["success"], False), pa.int64())
        ).as_py()
        counts["fetched"] = int(succ or 0)
        counts["errors"] = int(o_rows.num_rows - (succ or 0))
        counts["bytes"] = int(
            pc.sum(pc.fill_null(o_rows["html_bytes"], 0)).as_py() or 0
        )
    counts["wall_ms"] = round((time.time() - t0) * 1000, 1)
    return counts


def run_crawl(cfg: CrawlConfig, resume: bool = False) -> dict:
    """Run the crawl; returns summary stats.  Writes per-round Parquet
    checkpoints + manifests under ``cfg.out_dir`` (per-partition lineage:
    every manifest records the input round, row counts and wall time)."""
    import ray.data as rd

    os.makedirs(cfg.out_dir, exist_ok=True)
    seen = SeenPool(cfg.seen_shards, exact=cfg.exact_seen)
    store = PageStorePool(
        os.path.join(cfg.corpus, "pages.parquet"), cfg.store_shards
    )
    start_round = 0
    try:
        if resume:
            done = sorted(
                d for d in os.listdir(cfg.out_dir)
                if d.startswith("round=")
                and os.path.exists(os.path.join(cfg.out_dir, d, "_MANIFEST.json"))
            )
            if done:
                last = done[-1]
                start_round = int(last.split("=")[1]) + 1
                # replay per-round delta dumps for every COMPLETE round
                # (a crashed round may have left a stale delta — skip it,
                # its urls re-enter when the round re-runs)
                seen_root = os.path.join(cfg.out_dir, "seen")
                dirs = [
                    os.path.join(seen_root, d)
                    for d in sorted(os.listdir(seen_root))
                    if d.startswith("round=")
                    and int(d.split("=")[1]) < start_round
                ]
                seen.restore(dirs)
        if start_round == 0:
            init = _initial_state(cfg, seen)
            d = _round_dir(cfg.out_dir, -1)
            # clear any stale state from a previous run
            import shutil

            for sub in os.listdir(cfg.out_dir):
                if sub.startswith("round="):
                    shutil.rmtree(os.path.join(cfg.out_dir, sub))
            os.makedirs(d, exist_ok=True)
            dest = np.array(
                [
                    shard_for_host(h, cfg.buckets)
                    for h in init["host"].to_pylist()
                ],
                dtype=np.int64,
            )
            for j in sorted(set(dest.tolist())):
                ddir = _bucket_dir(d, j)
                os.makedirs(ddir, exist_ok=True)
                pq.write_table(
                    init.filter(pa.array(dest == j)),
                    os.path.join(ddir, "part-0.parquet"),
                )
            with open(os.path.join(d, "_MANIFEST.json"), "w") as f:
                json.dump({"round": -1, "rows": init.num_rows}, f)
            start_round = 0

        totals = {"fetched": 0, "errors": 0, "rounds": 0}
        n_buckets = cfg.buckets
        for rnd in range(start_round, cfg.max_rounds):
            t0 = time.time()
            prev = _round_dir(cfg.out_dir, rnd - 1)
            out = _round_dir(cfg.out_dir, rnd)
            os.makedirs(out, exist_ok=True)
            in_rows = pads.dataset(
                crawl_output_files(cfg.out_dir, only_round=rnd - 1),
                format="parquet",
            ).count_rows(filter=pc.field("kind") == "q")
            args = (
                cfg.policy, seen.shards, seen.num_shards, store.shards,
                store.num_shards, n_buckets,
            )
            if in_rows <= cfg.local_round_rows:
                # tiny tail round: same per-bucket code, driver-local
                bucket_counts = [
                    _process_bucket(k, rnd, prev, out, *args)
                    for k in range(n_buckets)
                ]
            else:
                policy, seen_handles, n_seen, store_handles, n_store = (
                    cfg.policy, seen.shards, seen.num_shards, store.shards,
                    store.num_shards,
                )

                def run_buckets(batch: pa.Table) -> pa.Table:
                    rows = [
                        _process_bucket(
                            int(k), rnd, prev, out, policy, seen_handles,
                            n_seen, store_handles, n_store, n_buckets,
                        )
                        for k in batch["item"].to_pylist()
                    ]
                    return pa.Table.from_pylist(rows)

                bucket_counts = (
                    rd.from_items(
                        list(range(n_buckets)),
                        override_num_blocks=n_buckets,
                    )
                    .map_batches(
                        run_buckets, batch_format="pyarrow", batch_size=1
                    )
                    .take_all()
                )
            seen.dump(os.path.join(cfg.out_dir, "seen", f"round={rnd:04d}"))
            counts = {
                k: sum(c[k] for c in bucket_counts) for k in ("q", "s", "o")
            }
            wall_ms = (time.time() - t0) * 1000
            manifest = {
                "round": rnd,
                "input": prev,
                "wall_ms": round(wall_ms, 1),
                **counts,
                "buckets": n_buckets,
                "seen_total": seen.total_seen(),
                # per-partition lineage: one record per bucket task
                # (urls_in / fetched / errors / bytes / wall_ms /
                # input_files) — the exact-resume + audit trail
                "partitions": sorted(
                    (c for c in bucket_counts if c["urls_in"]),
                    key=lambda c: c["bucket"],
                ),
            }
            with open(os.path.join(out, "_MANIFEST.json"), "w") as f:
                json.dump(manifest, f)
            totals["rounds"] = rnd + 1
            if counts["q"] == 0:
                break

        # final tallies over all o-rows
        all_o = pads.dataset(crawl_output_files(cfg.out_dir), format="parquet")
        totals["fetched"] = all_o.count_rows(
            filter=(pc.field("kind") == "o") & pc.field("success")
        )
        totals["errors"] = all_o.count_rows(
            filter=(pc.field("kind") == "o") & ~pc.field("success")
        )
        totals["seen_total"] = seen.total_seen()
        return totals
    finally:
        seen.shutdown()
        store.shutdown()

"""Lazily-built oracle golden tables — shrink the driver's ``no_oracle``
set (VERDICT r01 item 7; by round-2 close only ``crawl_metrics`` —
wall-clock lineage — remains rows-only).

Golden families per (corpus tag, testdata dir), each a deterministic
function of the corpus + the driver's testdata tables, built once per
corpus/golden version under the corpus directory:

* ``sim_crawl.parquet`` — the INDEPENDENT sequential crawl simulator's
  fetch log (``oracle/sim.py``); makes ``crawl_loop`` (and the
  frontier-depth / sitemap-coverage audits) DuckDB-checkable.
* ``simhash.parquet`` — (doc_id, simhash) via the pure ``simhash64``
  (pinned by unit tests).  The PAIRING oracle is then brute-force SQL:
  any pair at Hamming ≤ 3 over 64 bits must share one of the 4 16-bit
  bands (pigeonhole), so the banded engine pipeline's pair set equals
  the all-pairs set — the SQL cross join independently verifies the
  whole distributed path (banding, bucketing, pair dedup).
* ``minhash.parquet`` — (doc_id, sig[128], bandkeys[16]) via the pure
  ``minhash_signature`` + band hash (both unit-pinned).  SQL recomputes
  est_jaccard per candidate pair from the signatures and applies the
  band-collision predicate with ``list_has_any`` — again independent of
  the engine's shuffle/bucket orchestration.
* ``rolling.parquet`` — (doc_id, fingerprint) rolling-hash golden
  (jobs_golden pattern: same pure fn, plumbing checked end-to-end).
* ``events_hll.parquet`` / ``events_ddsketch.parquet`` — sequential
  single-pass sketches (no batching, no merge) verifying the
  distributed register-max-merge / histogram-merge paths.
* ``bpe_merges.parquet`` / ``bpe_tokens.parquet`` — sequential word
  counts + the shared pure merge-loop/encoder, verifying the
  distributed count combiner and broadcast apply.
* ``emb_ivf.parquet`` / ``emb_semantic.parquet`` — sequential
  same-math IVF kNN and SemDeDup, valid as oracles because
  ``kmeans_train``'s integer micro-sum reduce makes centroids
  bit-identical under any partitioning.
* mm_* goldens — the same pure stage callables run sequentially over
  the deterministic media corpus (decode pinned by codec round-trip
  tests); the queries exercise the Ray actor-pool plumbing.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

__all__ = ["ensure_oracle_goldens"]

# bump when golden set/semantics change (stale dirs rebuilt on demand)
GOLDEN_VERSION = "g25"  # g23 gaps off; g24 PQ distortion; g25 + video scene lengths


def _build_sim_crawl(corpus: str, out_path: str) -> None:
    from .sim import simulate_crawl

    res = simulate_crawl(corpus)
    pq.write_table(pa.Table.from_pylist(res.fetch_log), out_path)


def _build_sim_recrawl(corpus: str, out_path: str) -> None:
    """λ-scheduled refresh-crawl fetch log from the sequential replay
    (`sim.simulate_recrawl`) — the conformance golden for
    `pipelines/crawl.py::run_recrawl` / the `crawl_loop_recrawl`
    query."""
    from .sim import simulate_recrawl

    res = simulate_recrawl(corpus)
    schema = pa.schema(
        [
            ("host", pa.string()),
            ("url", pa.string()),
            ("round", pa.int64()),
            ("host_seq", pa.int64()),
            ("priority", pa.int64()),
            ("status", pa.string()),
            ("success", pa.bool_()),
        ]
    )
    pq.write_table(
        pa.Table.from_pylist(res.fetch_log, schema=schema), out_path
    )


def _build_sim_recrawl_metrics(
    corpus: str, out_path: str, n_buckets: int = 32
) -> None:
    """Deterministic recrawl-manifest lineage reconstructed from the
    sequential replay: urls_in of round r = per-bucket queue lengths at
    the end of round r−1 (round −1 = the λ-plan init checkpoint) plus
    one persistent state row per host with ≥1 first-crawl success;
    fetched = per-(round, bucket) recrawl fetch counts; errors = 0 by
    construction (recrawl targets are prior successes)."""
    from ..state.seen import shard_for_host
    from .sim import simulate_recrawl

    res = simulate_recrawl(corpus)
    hosts = sorted(res.host_stats)
    hb = {h: shard_for_host(h, n_buckets) for h in hosts}
    s_count: dict[int, int] = {}
    for h in hosts:
        s_count[hb[h]] = s_count.get(hb[h], 0) + 1
    qlen = {(r["host"], r["round"]): r["qlen"] for r in res.queue_log}
    fetched: dict[tuple[int, int], int] = {}
    for e in res.fetch_log:
        key = (e["round"], hb[e["host"]])
        fetched[key] = fetched.get(key, 0) + 1
    rows = []
    for rnd in range(res.rounds):
        urls_in: dict[int, int] = dict(s_count)
        for h in hosts:
            urls_in[hb[h]] += qlen[(h, rnd - 1)]
        for b in sorted(urls_in):
            if urls_in[b] == 0:
                continue
            rows.append(
                {
                    "round": rnd,
                    "bucket": b,
                    "urls_in": urls_in[b],
                    "fetched": fetched.get((rnd, b), 0),
                    "errors": 0,
                }
            )
    pq.write_table(pa.Table.from_pylist(rows), out_path)


def _build_sim_metrics(
    corpus: str, out_path: str, n_buckets: int = 32
) -> None:
    """Per-(round, bucket) expected crawl-metrics rows, reconstructed
    from the INDEPENDENT sequential simulator — the deterministic
    columns of the engine's round-manifest lineage (VERDICT r03 item 3;
    wall_ms / bytes / input_files stay unchecked wall-clock lineage):

    * ``urls_in`` of round r = the bucket's q rows at the END of round
      r-1 (simulator queue lengths; round 0 reads the one seed q row
      per host) + one persistent s (state) row per seeded host —
      exactly what ``_process_bucket`` counts after its kind-q/s read;
    * ``fetched`` / ``errors`` = success/failure attempts per round
      aggregated over the bucket's hosts (simulator fetch log).

    Buckets use the engine's ``shard_for_host`` — a pure shared
    function like ``candidate_links``; the orchestration being checked
    (waves, queue evolution, manifest accounting) is written twice."""
    from ..state.seen import shard_for_host
    from .sim import simulate_crawl

    res = simulate_crawl(corpus)
    hosts = sorted(res.host_stats)
    hb = {h: shard_for_host(h, n_buckets) for h in hosts}
    s_count: dict[int, int] = {}
    for h in hosts:
        s_count[hb[h]] = s_count.get(hb[h], 0) + 1
    qlen: dict[tuple[str, int], int] = {
        (r["host"], r["round"]): r["qlen"] for r in res.queue_log
    }
    fetched: dict[tuple[int, int], int] = {}
    errors: dict[tuple[int, int], int] = {}
    for e in res.fetch_log:
        key = (e["round"], hb[e["host"]])
        if e["success"]:
            fetched[key] = fetched.get(key, 0) + 1
        else:
            errors[key] = errors.get(key, 0) + 1
    rows = []
    for rnd in range(res.rounds):
        urls_in: dict[int, int] = dict(s_count)
        for h in hosts:
            q_prev = 1 if rnd == 0 else qlen[(h, rnd - 1)]
            urls_in[hb[h]] += q_prev
        for b in sorted(urls_in):
            if urls_in[b] == 0:
                continue
            rows.append(
                {
                    "round": rnd,
                    "bucket": b,
                    "urls_in": urls_in[b],
                    "fetched": fetched.get((rnd, b), 0),
                    "errors": errors.get((rnd, b), 0),
                }
            )
    pq.write_table(pa.Table.from_pylist(rows), out_path)


def _build_doc_goldens(sf_dir: str, gdir: str) -> None:
    from ..stages.dedup import (
        _N_BANDS,
        _ROWS_PER_BAND,
        minhash_signature,
        simhash64,
    )
    from ..stages.textstats import fingerprint_batch

    docs = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    ids = docs["doc_id"].to_pylist()
    texts = docs["text"].to_pylist()

    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "simhash": pa.array(
                    [
                        np.uint64(simhash64(t)).astype(np.int64).item()
                        for t in texts
                    ],
                    pa.int64(),
                ),
            }
        ),
        os.path.join(gdir, "simhash.parquet"),
    )

    sigs, bandkeys = [], []
    for t in texts:
        sig = minhash_signature(t).astype(np.int64)
        sigs.append(sig.tolist())
        keys = []
        for b in range(_N_BANDS):
            chunk = sig[b * _ROWS_PER_BAND : (b + 1) * _ROWS_PER_BAND]
            h = hashlib.blake2b(chunk.tobytes(), digest_size=8).digest()
            keys.append(f"{b}:{int.from_bytes(h, 'little') >> 1}")
        bandkeys.append(keys)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "sig": pa.array(sigs, pa.list_(pa.int64())),
                "bandkeys": pa.array(bandkeys, pa.list_(pa.string())),
            }
        ),
        os.path.join(gdir, "minhash.parquet"),
    )

    fp = fingerprint_batch(docs)
    pq.write_table(
        fp.select(["doc_id", "fingerprint"]),
        os.path.join(gdir, "rolling.parquet"),
    )


def _build_events_goldens(sf_dir: str, gdir: str) -> None:
    """events_hll golden: the per-day HyperLogLog estimate computed
    SEQUENTIALLY — one register set per day over ALL of that day's
    user ids at once, no batching and no merge step — so the engine's
    distributed sketch (per-batch registers + driver max-merge) is
    verified against a path that never exercises the merge.  The pure
    register/estimate functions are unit-pinned (the ``rolling.parquet``
    jobs-golden pattern: same pure fn, plumbing checked end-to-end)."""
    import pyarrow.compute as pc

    from ..pipelines.relational import _hll_estimate, _hll_registers

    ev = pq.read_table(
        os.path.join(sf_dir, "events.parquet"), columns=["ts", "user_id"]
    )
    days = pc.floor_temporal(ev["ts"], unit="day")
    tbl = pa.table({"day": days, "user_id": ev["user_id"]})
    out_day, out_est = [], []
    for day_val in sorted(pc.unique(days).to_pylist()):
        uids = tbl.filter(
            pc.equal(tbl["day"], pa.scalar(day_val, days.type))
        )["user_id"].to_numpy(zero_copy_only=False)
        out_day.append(day_val)
        out_est.append(_hll_estimate(_hll_registers(uids)))
    pq.write_table(
        pa.table(
            {
                "day": pa.array(out_day, pa.timestamp("us")),
                "n_estimate": pa.array(out_est, pa.int64()),
            }
        ),
        os.path.join(gdir, "events_hll.parquet"),
    )

    # DDSketch golden: the whole table binned and walked SEQUENTIALLY
    # per key — no batching, no partial merge — using the same pure
    # dd_bin/dd_estimate the engine combiner uses (rolling.parquet
    # pattern), so the driver compare verifies the distributed
    # combiner + histogram-merge path.
    import numpy as np

    from ..stages.textstats import dd_bin, dd_estimate

    ev2 = pq.read_table(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_type", "value"],
    )
    keys = ev2["event_type"].to_numpy(zero_copy_only=False)
    vals = ev2["value"].to_numpy(zero_copy_only=False).astype(np.float64)
    alpha_ppm = 10_000
    ps = (0.5, 0.9, 0.99)
    out_k, out_p, out_n, out_q = [], [], [], []
    for k in sorted(set(keys.tolist())):
        v = vals[keys == k]
        bins = np.sort(dd_bin(v, alpha_ppm))
        n = len(bins)
        uniq, cnt = np.unique(bins, return_counts=True)
        cum = np.cumsum(cnt)
        for p in ps:
            rank = max(int(np.ceil(p * n)), 1)
            sel = int(np.searchsorted(cum, rank))
            out_k.append(k)
            out_p.append(p)
            out_n.append(n)
            out_q.append(
                float(dd_estimate(uniq[sel : sel + 1], alpha_ppm)[0])
            )
    pq.write_table(
        pa.table(
            {
                "key": pa.array(out_k, pa.string()),
                "p": pa.array(out_p, pa.float64()),
                "n": pa.array(out_n, pa.int64()),
                "q_est": pa.array(out_q, pa.float64()),
            }
        ),
        os.path.join(gdir, "events_ddsketch.parquet"),
    )


def _build_bpe_goldens(sf_dir: str, gdir: str) -> None:
    """BPE goldens: word counts gathered SEQUENTIALLY (one regex pass,
    no batching) then the same pure merge-loop / encoder the engine
    broadcasts — the driver compare therefore verifies the distributed
    word-count combiner and the apply pass."""
    import re

    from ..stages.textstats import (
        bpe_encode_word,
        bpe_merges_from_counts,
    )

    docs = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"],
    )
    counts: dict[str, int] = {}
    for txt in docs["text"].to_pylist():
        for w in re.findall(r"[a-z]+", txt.lower()):
            counts[w] = counts.get(w, 0) + 1
    merges = bpe_merges_from_counts(counts, 50)
    pq.write_table(
        pa.table(
            {
                "rank": pa.array(range(len(merges)), pa.int64()),
                "left_sym": pa.array([a for a, _ in merges], pa.string()),
                "right_sym": pa.array([b for _, b in merges], pa.string()),
                "merged": pa.array(
                    [a + b for a, b in merges], pa.string()
                ),
            }
        ),
        os.path.join(gdir, "bpe_merges.parquet"),
    )
    rank = {p: i for i, p in enumerate(merges)}
    cache: dict[str, int] = {}
    ids, ns = [], []
    for did, txt in zip(
        docs["doc_id"].to_pylist(), docs["text"].to_pylist()
    ):
        n = 0
        for w in re.findall(r"[a-z]+", txt.lower()):
            if w not in cache:
                cache[w] = bpe_encode_word(w, rank)
            n += cache[w]
        ids.append(did)
        ns.append(n)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_tokens_bpe_trained": pa.array(ns, pa.int64()),
            }
        ),
        os.path.join(gdir, "bpe_tokens.parquet"),
    )


def _build_emb_goldens(sf_dir: str, gdir: str) -> None:
    """IVF kNN + SemDeDup goldens, computed SEQUENTIALLY (one matrix,
    no Ray, no batching) with the same pure math as the engine.  Valid
    as oracles because `kmeans_train` reduces integer micro-sums: the
    distributed centroids are bit-identical to this single-pass run
    under any partitioning, so any divergence the driver compare sees
    is a real orchestration bug (assignment pass, probe filter,
    groupby(cluster) sweep, top-k merge), not float drift."""
    import numpy as np

    from ..stages.dedup import list_col_to_matrix
    from ..stages.simsearch import _half_away_micros, _normalize

    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
    )
    ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    raw = list_col_to_matrix(t["embedding"])
    matn = _normalize(raw)

    def train(nlist: int, iters: int) -> np.ndarray:
        seed_idx = np.argsort(ids, kind="stable")[:nlist]
        # engine seeds from the raw rows of the nlist smallest ids
        cent = _normalize(raw[seed_idx].astype(np.float64))
        for _ in range(iters):
            assign = np.argmax(matn @ cent.T, axis=1)
            micro = _half_away_micros(matn * 1_000_000.0)
            sums = np.zeros((nlist, matn.shape[1]), dtype=np.int64)
            np.add.at(sums, assign, micro)
            counts = np.bincount(assign, minlength=nlist)
            nz = counts > 0
            cent[nz] = _normalize(
                (sums[nz] / 1_000_000.0) / counts[nz, None]
            )
        return cent

    # --- emb_knn_ivf golden (nlist=8, iters=3, k=10, nprobe=3) -------
    cent = train(nlist=8, iters=3)
    clusters = np.argmax(matn @ cent.T, axis=1).astype(np.int32)
    qmask = ids % 97 == 0
    qorder = np.argsort(ids[qmask], kind="stable")
    qids = ids[qmask][qorder]
    qn = _normalize(raw[qmask][qorder].astype(np.float64))
    probes = np.argsort(-(qn @ cent.T), axis=1)[:, :3]
    out_q, out_v, out_r = [], [], []
    for qi in range(len(qids)):
        mask = np.isin(clusters, probes[qi])
        sims = matn[mask] @ qn[qi]
        cand = ids[mask]
        order = np.lexsort((cand, -sims))[:10]
        out_q.append(np.full(len(order), qids[qi], dtype=np.int64))
        out_v.append(cand[order])
        out_r.append(np.arange(1, len(order) + 1, dtype=np.int64))
    pq.write_table(
        pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q), pa.int64()),
                "vec_id": pa.array(np.concatenate(out_v), pa.int64()),
                "rank": pa.array(np.concatenate(out_r), pa.int64()),
            }
        ),
        os.path.join(gdir, "emb_ivf.parquet"),
    )

    # --- emb_semantic_dedup golden (nlist=8, iters=5, τ=0.45) --------
    cent = train(nlist=8, iters=5)
    clusters = np.argmax(matn @ cent.T, axis=1).astype(np.int32)
    out_id, out_cl, out_canon = [], [], []
    for c in np.unique(clusters):
        sel = clusters == c
        cids = ids[sel]
        order = np.argsort(cids)
        cids = cids[order]
        m = matn[sel][order]
        n = len(cids)
        parent = np.arange(n)

        def find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        sims = m @ m.T
        ii, jj = np.nonzero(np.triu(sims >= 0.45, k=1))
        for a, b in zip(ii.tolist(), jj.tolist()):
            ra, rb = find(a), find(b)
            if ra != rb:
                if ra < rb:
                    parent[rb] = ra
                else:
                    parent[ra] = rb
        canon = cids[np.array([find(i) for i in range(n)], dtype=np.int64)]
        out_id.append(cids)
        out_cl.append(np.full(n, c, dtype=np.int32))
        out_canon.append(canon)
    all_ids = np.concatenate(out_id)
    all_canon = np.concatenate(out_canon)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(all_ids, pa.int64()),
                "cluster": pa.array(np.concatenate(out_cl), pa.int32()),
                "canonical_id": pa.array(all_canon, pa.int64()),
                "is_canonical": pa.array(all_canon == all_ids, pa.bool_()),
            }
        ),
        os.path.join(gdir, "emb_semantic.parquet"),
    )

    # --- emb_cluster_profile / emb_centroid_outliers goldens ---------
    # sequential same-math run (valid by the integer-micro-sum k-means
    # partition-invariance argument); sims quantized with the shared
    # pure `_half_away_micros` (DuckDB round() tie convention)
    cent = train(nlist=8, iters=3)
    sims = matn @ cent.T
    cl = np.argmax(sims, axis=1)
    own = _half_away_micros(
        np.take_along_axis(sims, cl[:, None], axis=1).ravel() * 1e6
    )
    n_tot = np.bincount(cl, minlength=len(cent)).astype(np.int64)
    s_tot = np.bincount(cl, weights=own, minlength=len(cent)).astype(
        np.int64
    )
    keep = n_tot > 0
    pq.write_table(
        pa.table(
            {
                "cluster": pa.array(
                    np.flatnonzero(keep).astype(np.int32), pa.int32()
                ),
                "n_vecs": pa.array(n_tot[keep], pa.int64()),
                "sum_sim_micros": pa.array(s_tot[keep], pa.int64()),
                "mean_sim_micros": pa.array(
                    s_tot[keep] // n_tot[keep], pa.int64()
                ),
            }
        ),
        os.path.join(gdir, "emb_profile.parquet"),
    )
    cut = np.lexsort((ids, own))[:50]
    pq.write_table(
        pa.table(
            {
                "rank": pa.array(
                    np.arange(1, len(cut) + 1, dtype=np.int64), pa.int64()
                ),
                "vec_id": pa.array(ids[cut], pa.int64()),
                "cluster": pa.array(cl[cut].astype(np.int32), pa.int32()),
                "sim_micros": pa.array(own[cut], pa.int64()),
            }
        ),
        os.path.join(gdir, "emb_outliers.parquet"),
    )

    # --- emb_kcenter_coreset golden (k=16) ----------------------------
    # sequential greedy Gonzalez farthest-point with the SAME integer
    # quantization (half-away micros) and (max_sim, id) tiebreaks as
    # `simsearch.kcenter_select` — valid as an oracle because every
    # selection step compares int64s, so the distributed shard-actor
    # path is bit-identical under any block partitioning.
    max_sim = np.full(len(ids), -2_000_000, np.int64)
    sel = int(np.argmin(ids))
    kc_rows = [(1, int(ids[sel]), -2_000_000)]
    vec = matn[sel]
    for r in range(2, 17):
        sims = _half_away_micros(matn @ vec * 1_000_000.0)
        np.maximum(max_sim, sims, out=max_sim)
        i = int(np.lexsort((ids, max_sim))[0])
        if max_sim[i] >= 1_000_000:
            break
        kc_rows.append((r, int(ids[i]), int(max_sim[i])))
        vec = matn[i]
    pq.write_table(
        pa.table(
            {
                "rank": pa.array([r[0] for r in kc_rows], pa.int64()),
                "vec_id": pa.array([r[1] for r in kc_rows], pa.int64()),
                "sim_micros": pa.array(
                    [r[2] for r in kc_rows], pa.int64()
                ),
            }
        ),
        os.path.join(gdir, "emb_kcenter.parquet"),
    )

    # --- emb_mmr_select golden (k=16, λ=0.5) ---------------------------
    # sequential MMR with the same integer score
    # (λ_ppm·rel − (1e6−λ_ppm)·max_sim, micros) and (score desc, id asc)
    # tiebreaks as `simsearch.mmr_select`; relevance query = corpus
    # mean via half-away micro-sums (the kmeans discipline, DuckDB
    # round() tie convention — shared `_half_away_micros` kernel).
    micro = _half_away_micros(matn * 1_000_000.0)
    qv = _normalize(((micro.sum(axis=0) / 1_000_000.0) / len(matn))[None, :])[0]
    rel = _half_away_micros(matn @ qv * 1_000_000.0)
    lam, lam_inv = np.int64(500_000), np.int64(500_000)
    mmr_max = np.zeros(len(ids), np.int64)
    mmr_taken = np.zeros(len(ids), bool)
    mmr_rows = []
    for r in range(1, 17):
        score = lam * rel - lam_inv * mmr_max
        idx = np.flatnonzero(~mmr_taken)
        if not len(idx):
            break
        i = int(idx[np.lexsort((ids[idx], -score[idx]))[0]])
        mmr_rows.append((r, int(ids[i]), int(rel[i]), int(score[i])))
        mmr_taken[i] = True
        sims = _half_away_micros(matn @ matn[i] * 1_000_000.0)
        np.maximum(mmr_max, sims, out=mmr_max)
    pq.write_table(
        pa.table(
            {
                "rank": pa.array([r[0] for r in mmr_rows], pa.int64()),
                "vec_id": pa.array([r[1] for r in mmr_rows], pa.int64()),
                "rel_micros": pa.array(
                    [r[2] for r in mmr_rows], pa.int64()
                ),
                "score_pico": pa.array(
                    [r[3] for r in mmr_rows], pa.int64()
                ),
            }
        ),
        os.path.join(gdir, "emb_mmr.parquet"),
    )

    # --- emb_knn_sq8 golden (k=10, shortlist=30) -----------------------
    # sequential same-math SQ8: per-dim (min, max) codebook over
    # half-away micros (associative ⇒ partition-invariant), 0..255
    # integer quantization, integer dot shortlist by (score desc, id
    # asc), exact-cosine-micro rerank — identical tie conventions to
    # `simsearch.knn_sq8`.
    dmin = micro.min(axis=0).astype(np.int64)
    dmax = micro.max(axis=0).astype(np.int64)
    span = np.maximum(dmax - dmin, 1)
    quant = (micro - dmin) * 255 // span
    qmask2 = ids % 97 == 0
    qorder2 = np.argsort(ids[qmask2], kind="stable")
    sq_qids = ids[qmask2][qorder2]
    sq_qq = quant[qmask2][qorder2]
    sq_qn = matn[qmask2][qorder2]
    sq_rows = []
    for qi in range(len(sq_qids)):
        scores = quant @ sq_qq[qi]
        sims = _half_away_micros(matn @ sq_qn[qi] * 1_000_000.0)
        short = np.lexsort((ids, -scores))[:30]
        rr = np.lexsort((ids[short], -sims[short]))[:10]
        sel = short[rr]
        for r, i in enumerate(sel, 1):
            sq_rows.append(
                (
                    int(sq_qids[qi]), int(ids[i]), r,
                    int(sims[i]), int(scores[i]),
                )
            )
    pq.write_table(
        pa.table(
            {
                "query_id": pa.array([r[0] for r in sq_rows], pa.int64()),
                "vec_id": pa.array([r[1] for r in sq_rows], pa.int64()),
                "rank": pa.array([r[2] for r in sq_rows], pa.int64()),
                "sim_micros": pa.array(
                    [r[3] for r in sq_rows], pa.int64()
                ),
                "sq_score": pa.array(
                    [r[4] for r in sq_rows], pa.int64()
                ),
            }
        ),
        os.path.join(gdir, "emb_sq8.parquet"),
    )

    # --- emb_pq_distortion golden (m=8, ksub=16, iters=5) --------------
    # sequential same-math PQ train (integer micro-sum reduce ⇒
    # partition-invariant codebooks) + half-away-micro error sums —
    # identical float argmin assignment as `simsearch.pq_train`.
    m_, ksub_ = 8, 16
    dim_ = matn.shape[1]
    dsub_ = dim_ // m_
    seed_idx2 = np.argsort(ids, kind="stable")[:ksub_]
    seeds2 = _normalize(raw[seed_idx2].astype(np.float64))
    books = np.stack(
        [seeds2[:, s * dsub_ : (s + 1) * dsub_] for s in range(m_)]
    )
    for _ in range(5):
        sums2 = np.zeros((m_, ksub_, dsub_), np.int64)
        counts2 = np.zeros((m_, ksub_), np.int64)
        for s in range(m_):
            x = matn[:, s * dsub_ : (s + 1) * dsub_]
            d2 = (
                (x * x).sum(axis=1)[:, None]
                - 2.0 * (x @ books[s].T)
                + (books[s] * books[s]).sum(axis=1)[None, :]
            )
            code = np.argmin(d2, axis=1)
            np.add.at(sums2[s], code, micro[:, s * dsub_ : (s + 1) * dsub_])
            np.add.at(counts2[s], code, 1)
        nz2 = counts2 > 0
        upd = books.copy()
        upd[nz2] = (sums2[nz2] / 1_000_000.0) / counts2[nz2, None]
        books = upd
    bkm = _half_away_micros(books * 1_000_000.0)
    nrows, sqrows = [], []
    for s in range(m_):
        x = matn[:, s * dsub_ : (s + 1) * dsub_]
        d2 = (
            (x * x).sum(axis=1)[:, None]
            - 2.0 * (x @ books[s].T)
            + (books[s] * books[s]).sum(axis=1)[None, :]
        )
        code = np.argmin(d2, axis=1)
        err = micro[:, s * dsub_ : (s + 1) * dsub_] - bkm[s][code]
        nrows.append(len(code))
        sqrows.append(int((err * err).sum()))
    pq.write_table(
        pa.table(
            {
                "subspace": pa.array(range(m_), pa.int64()),
                "n_vecs": pa.array(nrows, pa.int64()),
                "sum_sqerr": pa.array(sqrows, pa.int64()),
                "mean_sqerr": pa.array(
                    [sq // max(n, 1) for sq, n in zip(sqrows, nrows)],
                    pa.int64(),
                ),
            }
        ),
        os.path.join(gdir, "emb_pq_distortion.parquet"),
    )


def _build_media_goldens(sf_dir: str, gdir: str) -> None:
    """mm_* goldens: the SAME pure stage callables run sequentially on
    the driver over the deterministic media corpus — independent of the
    Ray actor-pool plumbing the queries exercise (decode itself is
    pinned by codec round-trip unit tests)."""
    from ..stages.multimodal import (
        AudioFeatures,
        ImageDecodeResize,
        AudioFingerprint,
        ImagePHash,
        VideoFrameSample,
        VideoKeyframes,
        synth_audio_neardup_table,
        synth_media_neardup_table,
        synth_media_table,
    )

    n = {"sf0.001": 64, "sf0.01": 256, "sf0.1": 1024}.get(
        os.path.basename(os.path.normpath(sf_dir)), 256
    )
    img = ImageDecodeResize(out_w=32, out_h=32)(synth_media_table(n, "image"))
    pq.write_table(
        img.select(["media_id", "width", "height", "mean_luma"]),
        os.path.join(gdir, "mm_image.parquet"),
    )
    pq.write_table(
        AudioFeatures()(synth_media_table(n, "audio")),
        os.path.join(gdir, "mm_audio.parquet"),
    )
    pq.write_table(
        VideoFrameSample(every_n=10)(synth_media_table(n, "video")),
        os.path.join(gdir, "mm_video.parquet"),
    )
    pq.write_table(
        VideoKeyframes()(synth_media_table(n, "video")),
        os.path.join(gdir, "mm_keyframes.parquet"),
    )
    pq.write_table(
        ImagePHash()(synth_media_neardup_table(n)),
        os.path.join(gdir, "mm_phash.parquet"),
    )
    pq.write_table(
        AudioFingerprint()(synth_audio_neardup_table(n)),
        os.path.join(gdir, "mm_afp.parquet"),
    )
    from ..stages.multimodal import AudioSilence

    pq.write_table(
        AudioSilence()(synth_media_table(n, "audio")),
        os.path.join(gdir, "mm_silence.parquet"),
    )
    # scene lengths: sequential derivation over the keyframe rows +
    # the deterministic clip frame counts (same math as the query)
    vids = synth_media_table(n, "video")
    nf = {
        r["media_id"]: r["meta"]["n_frames"] for r in vids.to_pylist()
    }
    kf = (
        VideoKeyframes()(vids)
        .sort_by([("media_id", "ascending"), ("frame_idx", "ascending")])
    )
    mids = kf["media_id"].to_pylist()
    fidx = kf["frame_idx"].to_pylist()
    sc = {"media_id": [], "scene_idx": [], "start_frame": [], "n_frames": []}
    i = 0
    while i < len(mids):
        j = i
        while j < len(mids) and mids[j] == mids[i]:
            j += 1
        frames = fidx[i:j] + [nf[mids[i]]]
        for s in range(len(frames) - 1):
            sc["media_id"].append(mids[i])
            sc["scene_idx"].append(s)
            sc["start_frame"].append(frames[s])
            sc["n_frames"].append(frames[s + 1] - frames[s])
        i = j
    pq.write_table(
        pa.table(
            {
                "media_id": pa.array(sc["media_id"], pa.int64()),
                "scene_idx": pa.array(sc["scene_idx"], pa.int32()),
                "start_frame": pa.array(sc["start_frame"], pa.int32()),
                "n_frames": pa.array(sc["n_frames"], pa.int64()),
            }
        ),
        os.path.join(gdir, "mm_scenes.parquet"),
    )


def _build_logreg_golden(sf_dir: str, gdir: str) -> None:
    """Sequential same-math logreg training run (quality-rule labels →
    `logreg_train_tables`); valid as an oracle because every doc's
    per-epoch gradient contribution is a pure function of (doc, w) and
    partials sum as int64 — the k-means partition-invariance argument
    (forced-path tests pin distributed ≡ sequential)."""
    from ..stages.importance import label_quality_batch, logreg_train_tables

    docs = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"],
    )
    labeled = label_quality_batch(docs)
    pq.write_table(
        logreg_train_tables(
            [labeled], target=True, label_col="is_quality"
        ),
        os.path.join(gdir, "logreg_w.parquet"),
    )


def _build_cdc_golden(sf_dir: str, gdir: str) -> None:
    """Sequential same-math CDC dedup run: the SAME pure chunker
    (`dedup.cdc_chunk_hashes`) over every doc, one global Counter of
    chunk occurrences, per-doc dup rollup — pins the distributed
    chunk-hash-bucket shuffle + adaptive per-doc finish of
    `cdc_dedup_stats`.  The chunker itself is pinned by property tests
    (reassembly, boundary locality, planted duplicate spans)."""
    from collections import Counter

    import numpy as np

    from ..stages.dedup import cdc_chunk_hashes

    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"],
    )
    per_doc = []
    counts: Counter = Counter()
    for did, text in zip(
        t["doc_id"].to_pylist(), t["text"].to_pylist()
    ):
        hs, lens = cdc_chunk_hashes(text or "")
        if not len(hs):
            continue
        per_doc.append((did, hs, lens))
        counts.update(hs.tolist())
    rows = {
        "doc_id": [],
        "n_chunks": [],
        "chunk_bytes": [],
        "n_dup_chunks": [],
        "dup_bytes": [],
    }
    for did, hs, lens in per_doc:
        dup = np.array([counts[h] >= 2 for h in hs.tolist()], bool)
        rows["doc_id"].append(did)
        rows["n_chunks"].append(len(hs))
        rows["chunk_bytes"].append(int(lens.sum()))
        rows["n_dup_chunks"].append(int(dup.sum()))
        rows["dup_bytes"].append(int(lens[dup].sum()))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(rows["doc_id"], pa.int64()),
                "n_chunks": pa.array(rows["n_chunks"], pa.int64()),
                "chunk_bytes": pa.array(rows["chunk_bytes"], pa.int64()),
                "n_dup_chunks": pa.array(
                    rows["n_dup_chunks"], pa.int64()
                ),
                "dup_bytes": pa.array(rows["dup_bytes"], pa.int64()),
            }
        ),
        os.path.join(gdir, "cdc.parquet"),
    )


def ensure_oracle_goldens(sf_dir: str) -> str:
    """Idempotently build the oracle goldens for a testdata dir; returns
    the golden directory (inside the per-tag corpus dir, so it expires
    with CORPUS_VERSION)."""
    from ..sources.synth import ensure_corpus

    corpus = ensure_corpus(sf_dir)
    gdir = os.path.join(corpus, "oracle_goldens")
    marker = os.path.join(gdir, "_DONE")
    stamp = f"{sf_dir} {GOLDEN_VERSION}\n"
    if os.path.exists(marker):
        with open(marker) as f:
            if f.read() == stamp:
                return gdir
    tmp = gdir + ".tmp"
    import shutil

    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp)
    _build_sim_crawl(corpus, os.path.join(tmp, "sim_crawl.parquet"))
    _build_sim_metrics(corpus, os.path.join(tmp, "sim_metrics.parquet"))
    _build_sim_recrawl(corpus, os.path.join(tmp, "sim_recrawl.parquet"))
    _build_sim_recrawl_metrics(
        corpus, os.path.join(tmp, "sim_recrawl_metrics.parquet")
    )
    if os.path.exists(os.path.join(sf_dir, "documents.parquet")):
        _build_doc_goldens(sf_dir, tmp)
        _build_bpe_goldens(sf_dir, tmp)
        _build_logreg_golden(sf_dir, tmp)
        _build_cdc_golden(sf_dir, tmp)
    if os.path.exists(os.path.join(sf_dir, "events.parquet")):
        _build_events_goldens(sf_dir, tmp)
    if os.path.exists(os.path.join(sf_dir, "embeddings.parquet")):
        _build_emb_goldens(sf_dir, tmp)
    _build_media_goldens(sf_dir, tmp)
    with open(os.path.join(tmp, "_DONE"), "w") as f:
        f.write(stamp)
    if os.path.exists(gdir):
        shutil.rmtree(gdir)
    os.replace(tmp, gdir)
    return gdir

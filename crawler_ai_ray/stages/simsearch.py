"""Similarity search over an embedding column (``list<float>``).

* **Brute-force cosine top-k** (the exactness baseline): the query
  matrix is broadcast once (``ray.put``); each Arrow batch of the
  corpus does ONE numpy matmul against it and emits its local top-k per
  query; a ``groupby(query_id)`` merge produces the global top-k.
  Communication: O(batches × Q × k) candidate rows — never the corpus.

* **IVF (inverted-file) ANN** (the scale path): k-means centroids are
  trained distributed (plain tasks over once-materialized blocks emit
  integer micro-sum partials; driver reduce — partition-invariant by
  construction), vectors are assigned to their nearest
  centroid (one hash-partitioned pass), and a query probes only the
  ``nprobe`` nearest lists.  At 100 TB the probe prunes the corpus to
  nprobe/nlist of its blocks; the assignment column doubles as the
  Parquet partition key so probes become file-level reads.

* **PQ (product quantization)** (the memory-scale path): per-subspace
  integer-exact k-means codebooks, uint8 code encoding, per-query ADC
  lookup-table scans, and an exact-cosine re-rank of the shortlist.

Determinism: all float math is float64; ranking ties broken by
``vec_id`` ascending, so results are stable across runs/platforms and
comparable to the DuckDB oracle (``list_cosine_similarity`` + window
rank).
"""

from __future__ import annotations


import numpy as np
import pyarrow as pa

from .dedup import list_col_to_matrix

__all__ = [
    "knn_bruteforce",
    "kmeans_train",
    "ivf_assign",
    "knn_ivf",
    "semantic_dedup",
    "pq_train",
    "pq_encode",
    "knn_pq",
    "knn_pq_rerank",
    "knn_graph",
    "knn_graph_ivf",
    "kcenter_select",
    "mmr_select",
]


def _topk_table(
    q_ids: np.ndarray, v_ids: np.ndarray, sims: np.ndarray
) -> pa.Table:
    return pa.table(
        {
            "query_id": pa.array(q_ids, type=pa.int64()),
            "vec_id": pa.array(v_ids, type=pa.int64()),
            "sim": pa.array(sims, type=pa.float64()),
        }
    )


def _normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


def _local_topk(
    sims: np.ndarray, ids: np.ndarray, q_ids: np.ndarray, k: int
) -> pa.Table:
    """sims (N, Q) → per-query local top-k rows (ties → lower vec_id)."""
    n, q = sims.shape
    kk = min(k, n)
    out_q, out_v, out_s = [], [], []
    # lexsort per column: primary -sim, secondary vec_id.  The full
    # lexsort IS the selection — a pre-argpartition (even with 2k
    # headroom) drops arbitrary tied candidates when > headroom
    # candidates tie at the boundary (the knn_graph fuzz lesson)
    for qi in range(q):
        col = sims[:, qi]
        order = np.lexsort((ids, -col))[:kk]
        out_q.append(np.full(kk, q_ids[qi], dtype=np.int64))
        out_v.append(ids[order])
        out_s.append(col[order])
    if not out_q:
        return _topk_table(
            np.zeros(0, np.int64), np.zeros(0, np.int64), np.zeros(0)
        )
    return _topk_table(
        np.concatenate(out_q), np.concatenate(out_v), np.concatenate(out_s)
    )


def _merge_topk(k: int):
    def merge(group: pa.Table) -> pa.Table:
        qid = group["query_id"][0].as_py()
        v = group["vec_id"].to_numpy(zero_copy_only=False)
        s = group["sim"].to_numpy(zero_copy_only=False)
        order = np.lexsort((v, -s))[:k]
        return pa.table(
            {
                "query_id": pa.array(np.full(len(order), qid), type=pa.int64()),
                "vec_id": pa.array(v[order], type=pa.int64()),
                "rank": pa.array(
                    np.arange(1, len(order) + 1), type=pa.int64()
                ),
                "sim": pa.array(s[order], type=pa.float64()),
            }
        )

    return merge


def knn_bruteforce(
    ds,
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
):
    """→ (query_id, vec_id, rank, sim): exact cosine top-k per query."""
    import ray

    q_norm = _normalize(queries.astype(np.float64))
    q_ref = ray.put((q_norm, query_ids.astype(np.int64)))

    def score(batch: pa.Table) -> pa.Table:
        qn, qids = ray.get(q_ref)
        mat = list_col_to_matrix(batch[emb_col])
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if mat.size == 0:
            return _topk_table(
                np.zeros(0, np.int64), np.zeros(0, np.int64), np.zeros(0)
            )
        sims = _normalize(mat) @ qn.T  # (N, Q)
        return _local_topk(sims, ids, qids, k)

    local = ds.map_batches(score, batch_format="pyarrow")
    return local.groupby("query_id").map_groups(
        _merge_topk(k), batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# IVF
# ---------------------------------------------------------------------------

def kmeans_train(
    ds,
    nlist: int,
    iters: int = 5,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    seed_mod: int | None = None,
) -> np.ndarray:
    """Distributed k-means on unit-normalized vectors.

    Init: the ``nlist`` vectors with smallest ``vec_id`` (deterministic
    — no RNG in the data path).  Each iteration is one streaming pass:
    ``map_batches`` emits per-centroid partial sums/counts (a combiner
    — the classic pre-aggregation before the tiny driver-side reduce).

    INTEGER-EXACT reduce (the `pq_train` discipline): partials carry
    vector sums as micro-scaled int64 (``rint(x·1e6)``), so the driver
    reduce is an associative integer sum and the centroids are
    BIT-identical under any partitioning / block order — which is what
    lets sequential same-function goldens act as oracles for the IVF
    and SemDeDup pipelines built on top.

    Iteration loop = plain Ray tasks over the ONCE-materialized block
    refs, not a Dataset job per iteration: the streaming executor's
    ~0.2 s fixed startup × iters was pure overhead on a fixed block
    list (the crawl-round dispatch argument; partial grouping doesn't
    matter — the integer reduce is associative)."""
    import ray

    block_refs = [r for r in ds.materialize().to_arrow_refs()]

    # deterministic init: the nlist globally-smallest ids — per-block
    # top-nlist combiner + driver merge (a Ray Dataset.sort here would
    # pay its fixed all-to-all cost to pick nlist rows; house rule:
    # never sort tiny candidate sets in Ray)
    @ray.remote(num_cpus=1)
    def seed_partial(block: pa.Table):
        if block.num_rows == 0:
            return np.zeros(0, np.int64), np.zeros((0, 0), np.float64)
        ids_b = block[id_col].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        mat_b = list_col_to_matrix(block[emb_col])
        order = np.argsort(ids_b, kind="stable")[:nlist]
        return ids_b[order], mat_b[order]

    seed_parts = ray.get([seed_partial.remote(b) for b in block_refs])
    cand_ids = np.concatenate([p[0] for p in seed_parts]) if seed_parts else (
        np.zeros(0, np.int64)
    )
    cand_mat = (
        np.concatenate([p[1] for p in seed_parts if p[1].size])
        if any(p[1].size for p in seed_parts)
        else np.zeros((0, 0), np.float64)
    )
    order = np.argsort(cand_ids, kind="stable")[:nlist]
    centroids = _normalize(cand_mat[order].astype(np.float64))

    @ray.remote(num_cpus=1)
    def partial(block: pa.Table, c: np.ndarray):
        if block.num_rows == 0:
            return (
                np.zeros(0, np.int64),
                np.zeros((0, 0), np.int64),
                np.zeros(0, np.int64),
            )
        mat = _normalize(list_col_to_matrix(block[emb_col]))
        assign = np.argmax(mat @ c.T, axis=1)
        micro = _half_away_micros(mat * _PQ_MICRO)
        cl, inv = np.unique(assign, return_inverse=True)
        sums = np.zeros((len(cl), mat.shape[1]), dtype=np.int64)
        np.add.at(sums, inv, micro)
        return cl, sums, np.bincount(inv, minlength=len(cl)).astype(np.int64)

    for _ in range(iters):
        c_ref = ray.put(centroids)
        parts = ray.get(
            [partial.remote(b, c_ref) for b in block_refs]
        )
        sums = np.zeros(centroids.shape, dtype=np.int64)
        counts = np.zeros(len(centroids), dtype=np.int64)
        for cl, s, n in parts:
            if len(cl):
                np.add.at(sums, cl, s)
                np.add.at(counts, cl, n)
        nz = counts > 0
        centroids[nz] = _normalize(
            (sums[nz] / _PQ_MICRO) / counts[nz, None]
        )
    return centroids


def ivf_assign(ds, centroids: np.ndarray, emb_col: str = "embedding"):
    """Add a ``cluster:int32`` column (nearest centroid).  At scale this
    column is the Parquet partition key of the index layout."""
    import ray

    c_ref = ray.put(centroids)

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(c_ref)
        mat = _normalize(list_col_to_matrix(batch[emb_col]))
        cl = (
            np.argmax(mat @ c.T, axis=1).astype(np.int32)
            if mat.size
            else np.zeros(0, np.int32)
        )
        return batch.append_column("cluster", pa.array(cl, type=pa.int32()))

    return ds.map_batches(assign, batch_format="pyarrow")


def knn_ivf(
    assigned_ds,
    centroids: np.ndarray,
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
):
    """ANN top-k: each query scores only rows whose ``cluster`` is among
    its ``nprobe`` nearest centroids (filter pushed into the batch
    kernel; with a cluster-partitioned layout it becomes a file prune)."""
    import ray

    q_norm = _normalize(queries.astype(np.float64))
    probes = np.argsort(-(q_norm @ centroids.T), axis=1)[:, :nprobe]
    q_ref = ray.put((q_norm, query_ids.astype(np.int64), probes))

    def score(batch: pa.Table) -> pa.Table:
        qn, qids, prb = ray.get(q_ref)
        mat = list_col_to_matrix(batch[emb_col])
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        cl = batch["cluster"].to_numpy(zero_copy_only=False)
        if mat.size == 0:
            return _topk_table(
                np.zeros(0, np.int64), np.zeros(0, np.int64), np.zeros(0)
            )
        matn = _normalize(mat)
        outs = []
        for qi in range(len(qids)):
            mask = np.isin(cl, prb[qi])
            if not mask.any():
                continue
            sims = matn[mask] @ qn[qi]
            outs.append(
                _local_topk(sims[:, None], ids[mask], qids[qi : qi + 1], k)
            )
        if not outs:
            return _topk_table(
                np.zeros(0, np.int64), np.zeros(0, np.int64), np.zeros(0)
            )
        return pa.concat_tables(outs)

    local = assigned_ds.map_batches(score, batch_format="pyarrow")
    return local.groupby("query_id").map_groups(
        _merge_topk(k), batch_format="pyarrow"
    )


def semantic_dedup(
    ds,
    nlist: int = 8,
    threshold: float = 0.45,
    iters: int = 5,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
):
    """SemDeDup-style semantic dedup (Abbas et al. 2023,
    arXiv:2303.09540): k-means-cluster the embedding space, then find
    duplicate groups by pairwise cosine ONLY within each cluster →
    (vec_id, cluster, canonical_id, is_canonical), canonical = the
    group's min id (the house keep-first rule; the paper keeps the
    point farthest from the centroid — a one-line swap, but min-id is
    deterministic and oracle-checkable).

    Scale shape: the whole point of clustering first is that pairwise
    cost drops from O(N²) to O(Σ mᵢ²) with mᵢ = cluster sizes, and the
    per-cluster sweep is an independent task — ``nlist`` must grow with
    the corpus so mᵢ stays ~10⁴-10⁵ (mᵢ² float64 sims per task; the
    paper runs 50k clusters over 1.2 B images).  Reuses the IVF
    machinery: distributed combiner k-means (`kmeans_train`) + one
    assignment pass (`ivf_assign`), then ``groupby(cluster)`` moves
    each vector exactly once.  ``nlist=1`` degenerates to the EXACT
    global dedup — that variant carries the recursive-CTE DuckDB
    oracle, pinning the union-find/grouping machinery that the
    clustered path shares."""
    if nlist == 1:
        # degenerate exact tier: one cluster holds everything — skip
        # k-means training + assignment entirely (cluster is 0 either
        # way; saves iters epoch fan-outs + one full pass)
        def assign0(batch: pa.Table) -> pa.Table:
            return batch.append_column(
                "cluster",
                pa.array(np.zeros(batch.num_rows, np.int32), pa.int32()),
            )

        assigned = ds.map_batches(assign0, batch_format="pyarrow")
    else:
        centroids = kmeans_train(
            ds, nlist, iters=iters, emb_col=emb_col, id_col=id_col
        )
        assigned = ivf_assign(ds, centroids, emb_col=emb_col)

    def prune(group: pa.Table) -> pa.Table:
        ids = group[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(ids)
        ids = ids[order]
        mat = _normalize(list_col_to_matrix(group[emb_col]))[order]
        cluster = np.int32(group["cluster"][0].as_py())
        n = len(ids)
        parent = np.arange(n)

        def find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        # chunked upper-triangle pair sweep with one REUSED scratch
        # buffer — an n×n sims materialization is ~8·n² fresh bytes,
        # the slow-page-backing class (200 MB at n=5000)
        chunk = 512
        buf = np.empty((min(chunk, n), n), dtype=np.float64)
        pairs_i: list[np.ndarray] = []
        pairs_j: list[np.ndarray] = []
        for lo in range(0, n, chunk):
            hi = min(lo + chunk, n)
            s = np.matmul(mat[lo:hi], mat.T, out=buf[: hi - lo])
            ci, cj = np.nonzero(s >= threshold)
            keep = cj > ci + lo  # strict upper triangle, global index
            pairs_i.append(ci[keep] + lo)
            pairs_j.append(cj[keep])
        ii = np.concatenate(pairs_i) if pairs_i else np.zeros(0, np.int64)
        jj = np.concatenate(pairs_j) if pairs_j else np.zeros(0, np.int64)
        for a, b in zip(ii.tolist(), jj.tolist()):
            ra, rb = find(a), find(b)
            if ra != rb:
                # attach the larger root: component root = min index,
                # and ids are sorted, so ids[root] = the group min id
                if ra < rb:
                    parent[rb] = ra
                else:
                    parent[ra] = rb
        canon = ids[np.array([find(i) for i in range(n)], dtype=np.int64)]
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "cluster": pa.array(np.full(n, cluster), pa.int32()),
                "canonical_id": pa.array(canon, pa.int64()),
                "is_canonical": pa.array(canon == ids, pa.bool_()),
            }
        )

    return (
        assigned.select_columns([id_col, emb_col, "cluster"])
        .groupby("cluster")
        .map_groups(prune, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ)
# ---------------------------------------------------------------------------

_PQ_MICRO = 1_000_000.0


def pq_train(
    ds,
    m: int = 8,
    ksub: int = 16,
    iters: int = 5,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
) -> np.ndarray:
    """Distributed PQ codebook training → (m, ksub, dsub) float64.

    Product quantization (Jégou, Douze & Schmid, TPAMI 2011) is the
    memory-scale path for embedding search: the vector splits into
    ``m`` subspaces, each L2-k-means'd to ``ksub`` centroids, and a
    vector stores as ``m`` uint8 codes (512× smaller than float64×64
    here) scanned via per-query lookup tables.

    INTEGER-EXACT training (unlike the float IVF k-means): per-batch
    partials carry subvector sums as micro-scaled int64
    (``rint(x·1e6)``), so the driver reduce is an associative integer
    sum — the codebooks are bit-identical under ANY partitioning, which
    is what lets a sequential same-function golden verify the whole
    distributed path (the HLL/DDSketch argument applied to k-means).
    Init is the ``ksub`` vectors with smallest id (no RNG); argmin ties
    break to the lower code index on every path."""
    import ray

    # plain tasks over once-materialized blocks (the `kmeans_train`
    # dispatch rationale: no per-iteration Dataset-job startup; the
    # integer reduce is associative, so partial grouping is free)
    block_refs = [r for r in ds.materialize().to_arrow_refs()]

    # seed selection via per-block top-ksub combiner (no Dataset.sort
    # for a handful of rows — the kmeans_train seed argument)
    @ray.remote(num_cpus=1)
    def seed_partial(block: pa.Table):
        if block.num_rows == 0:
            return np.zeros(0, np.int64), np.zeros((0, 0), np.float64)
        ids_b = block[id_col].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        mat_b = list_col_to_matrix(block[emb_col])
        order = np.argsort(ids_b, kind="stable")[:ksub]
        return ids_b[order], mat_b[order]

    seed_parts = ray.get([seed_partial.remote(b) for b in block_refs])
    cand_ids = np.concatenate([p[0] for p in seed_parts]) if seed_parts else (
        np.zeros(0, np.int64)
    )
    cand_mat = (
        np.concatenate([p[1] for p in seed_parts if p[1].size])
        if any(p[1].size for p in seed_parts)
        else np.zeros((0, 0), np.float64)
    )
    order = np.argsort(cand_ids, kind="stable")[:ksub]
    seeds = _normalize(cand_mat[order].astype(np.float64))
    dim = seeds.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    # (m, ksub, dsub)
    books = np.stack(
        [seeds[:, s * dsub : (s + 1) * dsub] for s in range(m)]
    )

    @ray.remote(num_cpus=1)
    def partial(block: pa.Table, bks: np.ndarray):
        sums = np.zeros((len(bks), bks.shape[1], dsub), dtype=np.int64)
        counts = np.zeros((len(bks), bks.shape[1]), dtype=np.int64)
        if block.num_rows == 0:
            return sums, counts
        mat = _normalize(list_col_to_matrix(block[emb_col]))
        micro = _half_away_micros(mat * _PQ_MICRO)
        for s in range(len(bks)):
            x = mat[:, s * dsub : (s + 1) * dsub]
            xm = micro[:, s * dsub : (s + 1) * dsub]
            d2 = (
                (x * x).sum(axis=1)[:, None]
                - 2.0 * (x @ bks[s].T)
                + (bks[s] * bks[s]).sum(axis=1)[None, :]
            )
            code = np.argmin(d2, axis=1)
            np.add.at(sums[s], code, xm)
            np.add.at(counts[s], code, 1)
        return sums, counts

    for _ in range(iters):
        b_ref = ray.put(books)
        parts = ray.get([partial.remote(b, b_ref) for b in block_refs])
        sums = np.zeros((m, ksub, dsub), dtype=np.int64)
        counts = np.zeros((m, ksub), dtype=np.int64)
        for s, c in parts:
            sums += s
            counts += c
        nz = counts > 0
        upd = books.copy()
        upd[nz] = (sums[nz] / _PQ_MICRO) / counts[nz, None]
        books = upd
    return books


def pq_encode(ds, books: np.ndarray, emb_col: str = "embedding"):
    """Add ``pq_code`` (fixed_size_list<uint8>[m]) — the 8-byte vector
    representation the ADC scan reads; at scale THIS column (plus ids)
    is the index payload, the raw embeddings never ship again."""
    import ray

    b_ref = ray.put(books)
    m, _, dsub = books.shape

    def encode(batch: pa.Table) -> pa.Table:
        bks = ray.get(b_ref)
        mat = _normalize(list_col_to_matrix(batch[emb_col]))
        if mat.size == 0:
            codes = np.zeros((0, m), dtype=np.uint8)
        else:
            cols = []
            for s in range(m):
                x = mat[:, s * dsub : (s + 1) * dsub]
                d2 = (
                    (x * x).sum(axis=1)[:, None]
                    - 2.0 * (x @ bks[s].T)
                    + (bks[s] * bks[s]).sum(axis=1)[None, :]
                )
                cols.append(np.argmin(d2, axis=1).astype(np.uint8))
            codes = np.stack(cols, axis=1)
        code_col = pa.FixedSizeListArray.from_arrays(
            pa.array(codes.reshape(-1), pa.uint8()), m
        )
        return batch.drop_columns([emb_col]).append_column(
            "pq_code", code_col
        )

    return ds.map_batches(encode, batch_format="pyarrow")


def knn_pq(
    encoded_ds,
    books: np.ndarray,
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
):
    """ADC (asymmetric distance computation) top-k over PQ codes:
    each query precomputes an (m, ksub) lookup table of exact
    sub-distances to the codebooks; a batch of N codes scores in
    O(N·m) table lookups — no float vectors touched.  approx_sim =
    1 − d²/2 (unit vectors), ranked with the same tie rules as the
    exact path so results merge through the shared top-k machinery."""
    import ray

    m, ksub, dsub = books.shape
    qn = _normalize(queries.astype(np.float64))
    # (Q, m, ksub) LUT of squared sub-distances
    luts = np.empty((len(qn), m, ksub), dtype=np.float64)
    for s in range(m):
        qx = qn[:, s * dsub : (s + 1) * dsub]
        luts[:, s, :] = (
            (qx * qx).sum(axis=1)[:, None]
            - 2.0 * (qx @ books[s].T)
            + (books[s] * books[s]).sum(axis=1)[None, :]
        )
    q_ref = ray.put((luts, query_ids.astype(np.int64)))

    def score(batch: pa.Table) -> pa.Table:
        lt, qids = ray.get(q_ref)
        if batch.num_rows == 0:
            return _topk_table(
                np.zeros(0, np.int64), np.zeros(0, np.int64), np.zeros(0)
            )
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        codes = (
            batch["pq_code"]
            .combine_chunks()
            .flatten()
            .to_numpy(zero_copy_only=False)
            .reshape(len(ids), m)
        )
        adc = np.zeros((len(ids), len(qids)), dtype=np.float64)
        for s in range(m):
            adc += lt[:, s, :][:, codes[:, s]].T  # (N, Q)
        sims = 1.0 - adc / 2.0
        return _local_topk(sims, ids, qids, k)

    local = encoded_ds.map_batches(score, batch_format="pyarrow")
    return local.groupby("query_id").map_groups(
        _merge_topk(k), batch_format="pyarrow"
    )


def knn_pq_rerank(
    raw_ds,
    encoded_ds,
    books: np.ndarray,
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int = 10,
    rerank: int = 50,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
):
    """PQ serving pipeline: ADC shortlist → EXACT re-rank — the
    standard two-stage ANN (codes prune 99.x % of the corpus, the
    float vectors are touched only for ≤ Q × rerank candidates).

    Stage 1 is `knn_pq` at k=rerank.  The candidate (query, vec) set —
    driver-sized by construction — broadcasts as a sorted vec_id
    array; stage 2 is one streaming pass over the RAW vectors filtered
    map-side to candidates (searchsorted — the q18 winner-keys
    inversion), emitting exact cosine rows only for (candidate vec ×
    its shortlisting queries); the final per-query top-k runs
    driver-side over ≤ Q × rerank exact rows with the same
    (−sim, vec_id) tie rule as the exact path."""
    import ray

    cand = knn_pq(
        encoded_ds, books, queries, query_ids, k=rerank, id_col=id_col
    )
    cand_tbl = pa.concat_tables(
        [t for t in ray.get(cand.to_arrow_refs()) if t.num_rows]
        or [
            pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "vec_id": pa.array([], pa.int64()),
                    "rank": pa.array([], pa.int64()),
                    "sim": pa.array([], pa.float64()),
                }
            )
        ]
    )
    cq = cand_tbl["query_id"].to_numpy(zero_copy_only=False)
    cv = cand_tbl["vec_id"].to_numpy(zero_copy_only=False)
    vkeys = np.unique(cv)
    qn = _normalize(queries.astype(np.float64))
    qids64 = query_ids.astype(np.int64)
    # per-query SORTED candidate arrays: the exact pass emits a row
    # only for (query, vec) pairs the shortlist proposed — ≤ Q×rerank
    # rows total, never candidates×Q (which would be quadratic in Q)
    per_q = {
        int(qid): np.sort(cv[cq == qid]) for qid in qids64
    }
    v_ref = ray.put(vkeys)
    q_ref = ray.put((qn, qids64, per_q))

    def exact_rows(batch: pa.Table) -> pa.Table:
        ks = ray.get(v_ref)
        qmat, qids, qcand = ray.get(q_ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(ks) == 0 or len(ids) == 0:
            return _topk_table(
                np.zeros(0, np.int64), np.zeros(0, np.int64), np.zeros(0)
            )
        idx = np.searchsorted(ks, ids)
        hit = (idx < len(ks)) & (ks[np.minimum(idx, len(ks) - 1)] == ids)
        if not hit.any():
            return _topk_table(
                np.zeros(0, np.int64), np.zeros(0, np.int64), np.zeros(0)
            )
        mat = _normalize(list_col_to_matrix(batch[emb_col]))[hit]
        ids = ids[hit]
        # ONE GEMM for the batch's candidate rows (same matmul shape
        # family as the exact path — keeps sims bit-comparable), then
        # per-query subsetting decides which rows are EMITTED
        sims_all = mat @ qmat.T  # (n_cand_in_batch, Q)
        out_q, out_v, out_s = [], [], []
        for qi, qid in enumerate(qids):
            cands = qcand[int(qid)]
            if not len(cands):
                continue
            pos = np.searchsorted(cands, ids)
            sel = (pos < len(cands)) & (
                cands[np.minimum(pos, len(cands) - 1)] == ids
            )
            if not sel.any():
                continue
            out_q.append(np.full(int(sel.sum()), qid, dtype=np.int64))
            out_v.append(ids[sel])
            out_s.append(sims_all[sel, qi])
        if not out_q:
            return _topk_table(
                np.zeros(0, np.int64), np.zeros(0, np.int64), np.zeros(0)
            )
        return _topk_table(
            np.concatenate(out_q),
            np.concatenate(out_v),
            np.concatenate(out_s),
        )

    rows = pa.concat_tables(
        [
            t
            for t in ray.get(
                raw_ds.map_batches(
                    exact_rows, batch_format="pyarrow"
                ).to_arrow_refs()
            )
            if t.num_rows
        ]
        or [
            _topk_table(
                np.zeros(0, np.int64), np.zeros(0, np.int64), np.zeros(0)
            )
        ]
    )
    # rows are already exactly the shortlisted (query, vec) pairs
    # (≤ Q × rerank — driver-sized); final per-query exact top-k
    rq = rows["query_id"].to_numpy(zero_copy_only=False)
    rv = rows["vec_id"].to_numpy(zero_copy_only=False)
    rs = rows["sim"].to_numpy(zero_copy_only=False)
    out_q, out_v, out_r, out_s = [], [], [], []
    for qid in query_ids.astype(np.int64):
        msk = rq == qid
        order = np.lexsort((rv[msk], -rs[msk]))[:k]
        out_q.append(np.full(len(order), qid, dtype=np.int64))
        out_v.append(rv[msk][order])
        out_r.append(np.arange(1, len(order) + 1, dtype=np.int64))
        out_s.append(rs[msk][order])
    return pa.table(
        {
            "query_id": pa.array(np.concatenate(out_q), pa.int64()),
            "vec_id": pa.array(np.concatenate(out_v), pa.int64()),
            "rank": pa.array(np.concatenate(out_r), pa.int64()),
            "sim": pa.array(np.concatenate(out_s), pa.float64()),
        }
    )


# ---------------------------------------------------------------------------
# kNN graph (all-pairs top-k neighbors)
# ---------------------------------------------------------------------------

def _half_away_micros(raw: np.ndarray) -> np.ndarray:
    """Quantize an already-×1e6 float array to int64 with HALF-AWAY-
    FROM-ZERO ties — DuckDB ``round()``'s convention.  ``np.rint`` is
    half-to-EVEN: a cosine landing exactly on an x.5 micro boundary
    would quantize differently engine-vs-oracle and flip rank ties at
    the k cut.  Consumes ``raw`` in place (it is always a fresh matmul
    scratch), so the hot loop's fresh-allocation count matches the old
    rint path (slow-page-backing rule)."""
    sgn = np.sign(raw)
    np.abs(raw, out=raw)
    raw += 0.5
    np.floor(raw, out=raw)
    raw *= sgn
    return raw.astype(np.int64)


def _knn_graph_rows(
    q_ids: np.ndarray,
    q_mat: np.ndarray,
    blocks,
    k: int,
    scratch_rows: int = 256,
) -> pa.Table:
    """Exact top-k neighbors (self excluded) of the ``q_ids`` rows
    against every ``(ids, mat)`` block — the shared kernel of both
    tiers.  ``blocks`` may be a ONE-SHOT iterable: blocks stream
    through an outer loop (the distributed tier ray.gets one object
    ref at a time, so task state is O(own_rows × k) plus one
    (chunk × block) sims scratch — never the whole corpus), queries
    chunk in an inner loop.  Cosines quantize to integer micros right
    after the float64 matmul (``rint(sim·1e6)``), so ALL selection is
    integer-lexicographic (-sim_micros, vec_id): partition layout,
    block visit order and BLAS kernel shape cannot change the result,
    and the DuckDB oracle ranks by the same rounded integer.  Each
    block is sorted by vec_id on arrival so the stable row-wise argsort
    resolves ties id-ascending (an argpartition here would drop an
    arbitrary tied candidate BEFORE the lexicographic re-cut — caught
    by the all-identical-vectors fuzz case)."""
    nq = len(q_ids)
    # far below any cosine-micros (≥ -1e6) yet safely negatable in
    # the lexsort (int64.min negation overflows to itself)
    sentinel = np.int64(-(2**62))
    best_v = np.zeros((nq, 0), dtype=np.int64)
    best_s = np.zeros((nq, 0), dtype=np.int64)
    for ids, mat in blocks:
        if not len(ids):
            continue
        order = np.argsort(ids)
        ids, mat = ids[order], mat[order]
        width = best_v.shape[1]
        nb_v = np.empty((nq, min(k, width + len(ids))), dtype=np.int64)
        nb_s = np.empty_like(nb_v)
        for lo in range(0, nq, scratch_rows):
            hi = min(lo + scratch_rows, nq)
            sims = _half_away_micros((q_mat[lo:hi] @ mat.T) * 1e6)
            sims[q_ids[lo:hi, None] == ids[None, :]] = sentinel  # self
            kk = min(k, sims.shape[1])
            part = np.argsort(-sims, axis=1, kind="stable")[:, :kk]
            cand_v = np.concatenate([best_v[lo:hi], ids[part]], axis=1)
            cand_s = np.concatenate(
                [best_s[lo:hi], np.take_along_axis(sims, part, axis=1)],
                axis=1,
            )
            # re-cut to k: per row lexsort by (-sim_micros, vec_id)
            cut = np.lexsort((cand_v, -cand_s), axis=1)[
                :, : nb_v.shape[1]
            ]
            nb_v[lo:hi] = np.take_along_axis(cand_v, cut, axis=1)
            nb_s[lo:hi] = np.take_along_axis(cand_s, cut, axis=1)
        best_v, best_s = nb_v, nb_s
    keep = best_s > sentinel
    nk = keep.sum(axis=1)
    if not nq or best_v.shape[1] == 0:
        return pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "vec_id": pa.array([], pa.int64()),
                "rank": pa.array([], pa.int64()),
                "sim_micros": pa.array([], pa.int64()),
            }
        )
    ranks = (
        np.concatenate([np.arange(1, n + 1) for n in nk])
        if len(nk)
        else np.zeros(0, np.int64)
    )
    return pa.table(
        {
            "query_id": pa.array(np.repeat(q_ids, nk), pa.int64()),
            "vec_id": pa.array(best_v[keep], pa.int64()),
            "rank": pa.array(ranks.astype(np.int64), pa.int64()),
            "sim_micros": pa.array(best_s[keep], pa.int64()),
        }
    )


def knn_graph(
    ds,
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    driver_max_vecs: int = 20_000,
):
    """→ (query_id, vec_id, rank, sim_micros): exact cosine top-k
    neighbors of EVERY vector (self excluded) — the kNN-graph construction step that
    SemDeDup-style curation, graph-based ANN indexes and label
    propagation consume.

    Tiers (path-agreement pinned): ≤ ``driver_max_vecs`` runs
    driver-local over the collected normalized blocks.  Above, a
    block-nested-loop: normalized (ids, matrix) blocks are materialized
    ONCE as object refs; one Ray task per block streams every other
    block through a running per-row top-k of its own rows — ZERO
    shuffle, O(chunk × k) task state, each task's output is final (no
    merge stage).  Exact all-pairs is inherently N²-flops; at 100 TB
    use ``knn_graph_ivf`` (cell-restricted, linear in Σ mᵢ²) and keep
    this as the oracle baseline."""
    import ray

    def norm_block(batch: pa.Table):
        # Empty blocks (schema-less at sf0.1+, or typed zero-row) yield
        # NOTHING: a zero-row block can't know the embedding dim, and a
        # dim-1 placeholder fixed_size_list schema would conflict with
        # the real dim at concat/unify time.  Generator UDF ⇒ Ray just
        # drops the block.
        if batch.num_rows == 0:
            return
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        mat = _normalize(list_col_to_matrix(batch[emb_col]))
        dim = mat.shape[1] if mat.size else 1
        yield pa.table(
            {
                "ids": pa.array(ids, pa.int64()),
                "vec": pa.FixedSizeListArray.from_arrays(
                    pa.array(mat.ravel(), pa.float64()), dim
                ),
            }
        )

    nb = ds.map_batches(norm_block, batch_format="pyarrow").materialize()

    def unpack(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        return (
            t["ids"].to_numpy(zero_copy_only=False).astype(np.int64),
            list_col_to_matrix(t["vec"]),
        )

    block_refs = [r for r in nb.to_arrow_refs()]
    if nb.count() <= driver_max_vecs:
        blocks = [
            unpack(t) for t in ray.get(block_refs) if t.num_rows
        ]
        if not blocks:
            return ray.data.from_arrow(
                _knn_graph_rows(np.zeros(0, np.int64), np.zeros((0, 1)), [], k)
            )
        import ray.data

        return ray.data.from_arrow(
            pa.concat_tables(
                _knn_graph_rows(ids, mat, blocks, k) for ids, mat in blocks
            )
        )

    @ray.remote(num_cpus=1)
    def own_block_topk(me: pa.Table, others: list) -> pa.Table:
        if not me.num_rows:
            return _knn_graph_rows(np.zeros(0, np.int64), np.zeros((0, 1)), [], k)
        ids, mat = unpack(me)

        def stream():
            # ONE other block resident at a time — task memory stays
            # O(own_rows × k + chunk × block), never the corpus
            for ref in others:
                t = ray.get(ref)
                if t.num_rows:
                    yield unpack(t)

        return _knn_graph_rows(ids, mat, stream(), k)

    import ray.data

    parts = ray.get(
        [own_block_topk.remote(b, block_refs) for b in block_refs]
    )
    live = [t for t in parts if t.num_rows]
    return ray.data.from_arrow(
        pa.concat_tables(live)
        if live
        else _knn_graph_rows(np.zeros(0, np.int64), np.zeros((0, 1)), [], k)
    )


def knn_graph_ivf(
    ds,
    k: int = 10,
    nlist: int = 8,
    iters: int = 5,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
):
    """Approximate kNN graph: k-means the corpus into ``nlist`` cells
    (`kmeans_train` — integer-exact combiner k-means), assign each
    vector once (`ivf_assign`), and build the exact graph WITHIN each
    cell — O(Σ mᵢ²) instead of O(N²), one ``groupby(cluster)`` move of
    each vector, per-cell tasks independent.  ``nlist`` grows with the
    corpus so mᵢ stays ~10⁴-10⁵ (the SemDeDup sizing).  ``nlist=1``
    degenerates to the EXACT graph — that variant shares
    ``knn_graph``'s brute-force oracle, pinning the shared plumbing."""
    if nlist == 1:
        # degenerate exact tier — skip training/assignment (see
        # semantic_dedup)
        def assign0(batch: pa.Table) -> pa.Table:
            return batch.append_column(
                "cluster",
                pa.array(np.zeros(batch.num_rows, np.int32), pa.int32()),
            )

        assigned = ds.map_batches(assign0, batch_format="pyarrow")
    else:
        centroids = kmeans_train(
            ds, nlist, iters=iters, emb_col=emb_col, id_col=id_col
        )
        assigned = ivf_assign(ds, centroids, emb_col=emb_col)

    def cell_graph(group: pa.Table) -> pa.Table:
        ids = group[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(ids)
        ids = ids[order]
        mat = _normalize(list_col_to_matrix(group[emb_col]))[order]
        return _knn_graph_rows(ids, mat, [(ids, mat)], k)

    return (
        assigned.select_columns([id_col, emb_col, "cluster"])
        .groupby("cluster")
        .map_groups(cell_graph, batch_format="pyarrow")
    )


def cluster_profile(ds, nlist: int = 8, iters: int = 3,
                    emb_col: str = "embedding"):
    """embeddings → (cluster, n_vecs, sum_sim_micros, mean_sim_micros):
    per-IVF-cell population and cohesion — the index-balance / curation
    diagnostic (cell imbalance is the IVF failure mode; low-cohesion
    cells are where SemDeDup's within-cluster prune is least reliable).

    Math: assignment by argmax over `kmeans_train` centroids (integer
    micro-sum training ⇒ centroids bit-identical under any
    partitioning), each member's cosine to its own centroid quantized
    `_half_away_micros`, per-cluster INTEGER sums; mean = sum // n.
    One streaming pass; per-batch partials are nlist-sized, the driver
    merge is nlist rows — bounded by the index size, not the corpus.
    Oracle: the sequential same-math golden (`oracle/goldens.py`
    emb_profile), valid by the k-means partition-invariance argument."""
    import ray

    from .dedup import list_col_to_matrix

    centroids = kmeans_train(ds, nlist=nlist, iters=iters, emb_col=emb_col)
    c_ref = ray.put(centroids)

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "cluster": pa.array([], pa.int32()),
                    "n": pa.array([], pa.int64()),
                    "s": pa.array([], pa.int64()),
                }
            )
        c = ray.get(c_ref)
        mat = _normalize(list_col_to_matrix(batch[emb_col]))
        sims = mat @ c.T
        cl = np.argmax(sims, axis=1)
        own = _half_away_micros(
            np.take_along_axis(sims, cl[:, None], axis=1).ravel() * 1e6
        )
        n = np.bincount(cl, minlength=len(c)).astype(np.int64)
        s = np.bincount(cl, weights=own, minlength=len(c)).astype(np.int64)
        keep = n > 0
        return pa.table(
            {
                "cluster": pa.array(
                    np.flatnonzero(keep).astype(np.int32), pa.int32()
                ),
                "n": pa.array(n[keep], pa.int64()),
                "s": pa.array(s[keep], pa.int64()),
            }
        )

    parts = [
        t
        for t in ray.get(
            ds.map_batches(partial, batch_format="pyarrow").to_arrow_refs()
        )
        if t.num_rows
    ]
    n_tot = np.zeros(len(centroids), dtype=np.int64)
    s_tot = np.zeros(len(centroids), dtype=np.int64)
    for t in parts:
        cl = t["cluster"].to_numpy(zero_copy_only=False)
        n_tot[cl] += t["n"].to_numpy(zero_copy_only=False)
        s_tot[cl] += t["s"].to_numpy(zero_copy_only=False)
    keep = n_tot > 0
    cl = np.flatnonzero(keep).astype(np.int32)
    return pa.table(
        {
            "cluster": pa.array(cl, pa.int32()),
            "n_vecs": pa.array(n_tot[keep], pa.int64()),
            "sum_sim_micros": pa.array(s_tot[keep], pa.int64()),
            "mean_sim_micros": pa.array(
                s_tot[keep] // n_tot[keep], pa.int64()
            ),
        }
    )


def centroid_outliers(ds, nlist: int = 8, iters: int = 3, k: int = 50,
                      id_col: str = "vec_id", emb_col: str = "embedding"):
    """embeddings → the ``k`` vectors FARTHEST from their assigned
    centroid: (rank, vec_id, cluster, sim_micros), ordered
    (sim_micros asc, vec_id asc) — the prune shortlist of
    noise/outlier candidates (SemDeDup keeps LOW-cosine members as the
    "diverse" set; data-pruning work scores exactly this margin).

    Per-batch local bottom-k by the SAME (sim, id) lexicographic key
    (tie-stable — the knn_graph argpartition lesson), then one driver
    merge of ≤ blocks×k rows (the `top_customers` targeted-cut
    pattern).  Integer micros end-to-end ⇒ partition-invariant and
    sequential-golden-checkable."""
    import ray

    from .dedup import list_col_to_matrix

    centroids = kmeans_train(ds, nlist=nlist, iters=iters, emb_col=emb_col)
    c_ref = ray.put(centroids)

    def empty_part() -> pa.Table:
        return pa.table(
            {
                "vec_id": pa.array([], pa.int64()),
                "cluster": pa.array([], pa.int32()),
                "sim_micros": pa.array([], pa.int64()),
            }
        )

    def bottomk(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return empty_part()
        c = ray.get(c_ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        mat = _normalize(list_col_to_matrix(batch[emb_col]))
        sims = mat @ c.T
        cl = np.argmax(sims, axis=1)
        own = _half_away_micros(
            np.take_along_axis(sims, cl[:, None], axis=1).ravel() * 1e6
        )
        cut = np.lexsort((ids, own))[:k]
        return pa.table(
            {
                "vec_id": pa.array(ids[cut], pa.int64()),
                "cluster": pa.array(cl[cut].astype(np.int32), pa.int32()),
                "sim_micros": pa.array(own[cut], pa.int64()),
            }
        )

    parts = [
        t
        for t in ray.get(
            ds.map_batches(bottomk, batch_format="pyarrow").to_arrow_refs()
        )
        if t.num_rows
    ]
    if not parts:
        t = empty_part()
        return t.add_column(0, "rank", pa.array([], pa.int64()))
    allp = pa.concat_tables(parts)
    ids = allp["vec_id"].to_numpy(zero_copy_only=False)
    own = allp["sim_micros"].to_numpy(zero_copy_only=False)
    cut = np.lexsort((ids, own))[:k]
    out = allp.take(pa.array(cut, pa.int64()))
    return out.add_column(
        0,
        "rank",
        pa.array(np.arange(1, len(cut) + 1, dtype=np.int64), pa.int64()),
    )


# ---------------------------------------------------------------------------
# PCA: streaming covariance of the embedding column
# ---------------------------------------------------------------------------

def embedding_covariance(
    ds, emb_col: str = "embedding"
) -> pa.Table:
    """→ (i, j, n, cov_pico) for 0 ≤ i ≤ j < dim: the exact sample
    covariance matrix of the embedding column — the PCA / whitening
    precursor every embedding-space curation report starts from
    (which axes carry the variance; is the space collapsed).

    INTEGER-EXACT streaming: each batch quantizes its vectors to
    micros (``round(x·1e6)`` half-away-from-zero — DuckDB ``round()``)
    and emits dim²-SIZED partials (Σqᵢqⱼ upper triangle, Σqᵢ, count) —
    never row-sized; the driver reduce runs on PYTHON INTS (no int64
    overflow at any corpus size) and finishes with the textbook
    identity, truncated toward zero like DuckDB's integer division:

        cov_pico(i,j) = trunc((n·Σqᵢqⱼ − Σqᵢ·Σqⱼ) / n²)   [micros²]

    so a DuckDB oracle that unnests the list column and computes the
    same HUGEINT expression matches bit-for-bit.  One streaming pass,
    no shuffle; per-batch partial int64 sums are safe while
    batch_rows·1e12 < 2⁶³ (4096-row batches: ample)."""
    import ray

    def partials(batch: pa.Table) -> pa.Table:
        if not batch.num_rows:
            return pa.table(
                {
                    "i": pa.array([], pa.int32()),
                    "j": pa.array([], pa.int32()),
                    "n": pa.array([], pa.int64()),
                    "sx": pa.array([], pa.int64()),
                    "sxy": pa.array([], pa.int64()),
                }
            )
        mat = list_col_to_matrix(batch[emb_col]).astype(np.float64)
        q = _half_away_micros(mat * 1e6)
        dim = q.shape[1]
        iu, ju = np.triu_indices(dim)
        sxy = (q.T @ q)[iu, ju]
        sx = q.sum(axis=0)
        return pa.table(
            {
                "i": pa.array(iu.astype(np.int32), pa.int32()),
                "j": pa.array(ju.astype(np.int32), pa.int32()),
                "n": pa.array(
                    np.full(len(iu), batch.num_rows, np.int64), pa.int64()
                ),
                "sx": pa.array(
                    np.where(iu == ju, sx[iu], 0).astype(np.int64),
                    pa.int64(),
                ),
                "sxy": pa.array(sxy.astype(np.int64), pa.int64()),
            }
        )

    parts = [
        t
        for t in ray.get(
            ds.map_batches(partials, batch_format="pyarrow").to_arrow_refs()
        )
        if t.num_rows
    ]
    if not parts:
        return pa.table(
            {
                "i": pa.array([], pa.int32()),
                "j": pa.array([], pa.int32()),
                "n": pa.array([], pa.int64()),
                "cov_pico": pa.array([], pa.int64()),
            }
        )
    cat = pa.concat_tables(parts)
    agg = (
        cat.group_by(["i", "j"])
        .aggregate([("sxy", "sum"), ("sx", "sum"), ("n", "max")])
    )
    # n arrives replicated per (i,j) within a partial; total n = sum of
    # per-batch counts — recompute from the diagonal's n column
    import pyarrow.compute as pc

    nagg = (
        cat.filter(pc.and_(pc.equal(cat["i"], 0), pc.equal(cat["j"], 0)))
        .group_by(["i"])
        .aggregate([("n", "sum")])
    )
    n = int(nagg["n_sum"][0].as_py())
    ii = agg["i"].to_numpy(zero_copy_only=False)
    jj = agg["j"].to_numpy(zero_copy_only=False)
    sxy = agg["sxy_sum"].to_pylist()
    # Σqᵢ per axis from the diagonal rows
    diag = {
        int(i): int(s)
        for i, j, s in zip(ii, jj, agg["sx_sum"].to_pylist())
        if i == j
    }
    cov = []
    for i, j, s in zip(ii, jj, sxy):
        num = n * int(s) - diag[int(i)] * diag[int(j)]
        den = n * n
        c = abs(num) // den
        cov.append(-c if num < 0 else c)
    return pa.table(
        {
            "i": pa.array(ii.astype(np.int64), pa.int64()),
            "j": pa.array(jj.astype(np.int64), pa.int64()),
            "n": pa.array(np.full(len(ii), n, np.int64), pa.int64()),
            "cov_pico": pa.array(cov, pa.int64()),
        }
    )


def pca_top_component(
    ds, emb_col: str = "embedding", iters: int = 24
) -> pa.Table:
    """→ (i, loading_micros, eigval_pico, n): the TOP PRINCIPAL
    COMPONENT of the embedding column — dominant eigenvector of the
    exact integer covariance from `embedding_covariance`, by ``iters``
    rounds of INTEGER power iteration (the anisotropy / collapsed-
    space diagnostic an embedding-curation report leads with, and the
    projection axis for 1-D curriculum binning).

    Determinism without convergence assumptions: v₀ = 1e6 on every
    axis; each round w = C·v on PYTHON INTS (no overflow at any dim),
    then renormalize ``v = trunc(w·1e6 / max|w|)`` with DuckDB's
    trunc-toward-zero (`x>=0 → (x·1e6)//mx`, else `-((-x·1e6)//mx)`).
    The oracle unrolls the IDENTICAL rounds in HUGEINT, so engine and
    SQL agree bit-for-bit even when the spectrum is degenerate and the
    iteration hasn't converged — the comparison never depends on
    eigengap.  ``eigval_pico`` is the integer Rayleigh quotient
    trunc(vᵀCv / max(vᵀv, 1)) (covariance units ×1e-12).

    Scale shape: all corpus-sized work is the `embedding_covariance`
    streaming pass; the iteration is a dim×dim driver solve (dim ≤
    few-thousand — model-embedding sized, never corpus-sized)."""
    cov = embedding_covariance(ds, emb_col=emb_col)
    if not cov.num_rows:
        return pa.table(
            {
                "i": pa.array([], pa.int64()),
                "loading_micros": pa.array([], pa.int64()),
                "eigval_pico": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            }
        )
    ii = cov["i"].to_pylist()
    jj = cov["j"].to_pylist()
    vv = cov["cov_pico"].to_pylist()
    n = int(cov["n"][0].as_py())
    dim = max(jj) + 1
    C = [[0] * dim for _ in range(dim)]
    for i, j, c in zip(ii, jj, vv):
        C[i][j] = c
        C[j][i] = c
    v = [1_000_000] * dim
    for _ in range(iters):
        w = [sum(C[i][j] * v[j] for j in range(dim)) for i in range(dim)]
        mx = max((abs(x) for x in w), default=0) or 1
        v = [
            (x * 1_000_000) // mx if x >= 0 else -((-x * 1_000_000) // mx)
            for x in w
        ]
    num = sum(
        v[i] * C[i][j] * v[j] for i in range(dim) for j in range(dim)
    )
    den = max(sum(x * x for x in v), 1)
    eig = num // den if num >= 0 else -((-num) // den)
    return pa.table(
        {
            "i": pa.array(list(range(dim)), pa.int64()),
            "loading_micros": pa.array(v, pa.int64()),
            "eigval_pico": pa.array([eig] * dim, pa.int64()),
            "n": pa.array([n] * dim, pa.int64()),
        }
    )


def pca_project(
    ds, emb_col: str = "embedding", id_col: str = "vec_id",
    iters: int = 24, n_bins: int = 10,
) -> pa.Table:
    """→ (vec_id, proj_pico, bin): every vector's 1-D projection onto
    the top principal component (`pca_top_component`) plus its
    curriculum bin — the classic difficulty/anisotropy ordering signal
    (sort the corpus along the dominant axis, train easy→hard or
    sample per-bin).

    proj_pico = Σᵢ qᵢ·vᵢ exactly (q = round(x·1e6), v = the component's
    integer loadings — pico units, one exact integer sum, no division);
    bin = ``rank₀·n_bins // N + 1`` over the (proj_pico, vec_id)
    lexicographic order — an explicit equal-split rule both the engine
    and SQL (`row_number` window) reproduce bit-for-bit (NOT `ntile`,
    whose remainder rule differs).

    Scale shape: the component solve is the covariance pass; the
    projection is a second embarrassingly-parallel streaming pass with
    the dim-sized loading vector broadcast; the bin rank is the one
    global sort a curriculum ordering inherently needs (Ray sort over
    (proj, id)) — here sized ≤ N×16B rows, computed driver-side below
    the module's usual gate."""
    import ray

    comp = pca_top_component(ds, emb_col=emb_col, iters=iters)
    if not comp.num_rows:
        return pa.table(
            {
                "vec_id": pa.array([], pa.int64()),
                "proj_pico": pa.array([], pa.int64()),
                "bin": pa.array([], pa.int64()),
            }
        )
    v = np.array(comp["loading_micros"].to_pylist(), np.int64)
    v_ref = ray.put(v)

    def project(batch: pa.Table) -> pa.Table:
        if not batch.num_rows:
            return pa.table(
                {
                    "vec_id": pa.array([], pa.int64()),
                    "proj_pico": pa.array([], pa.int64()),
                }
            )
        load = ray.get(v_ref)
        mat = list_col_to_matrix(batch[emb_col]).astype(np.float64)
        q = _half_away_micros(mat * 1e6)
        # int64 dot: |q|≤~2e6 · |v|≤1e6 · dim≤4096 < 2^63 — exact
        proj = q @ load
        return pa.table(
            {
                "vec_id": pa.array(
                    batch[id_col].to_numpy(zero_copy_only=False).astype(
                        np.int64
                    ),
                    pa.int64(),
                ),
                "proj_pico": pa.array(proj, pa.int64()),
            }
        )

    parts = [
        t
        for t in ray.get(
            ds.map_batches(project, batch_format="pyarrow").to_arrow_refs()
        )
        if t.num_rows
    ]
    cat = pa.concat_tables(parts)
    ids = cat["vec_id"].to_numpy(zero_copy_only=False)
    pj = cat["proj_pico"].to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, pj))
    n = len(ids)
    rank0 = np.empty(n, np.int64)
    rank0[order] = np.arange(n, dtype=np.int64)
    bins = (rank0 * n_bins) // n + 1
    return pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "proj_pico": pa.array(pj, pa.int64()),
            "bin": pa.array(bins, pa.int64()),
        }
    )


# --- greedy k-center coreset selection -------------------------------------

def kcenter_select(
    ds,
    k: int = 16,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
) -> pa.Table:
    """Greedy k-center (Gonzalez farthest-point traversal) coreset
    selection over an embedding column — the data-PRUNING primitive: the
    k selected rows are maximally spread, the classic seed set for
    diverse subset selection / coverage-style data pruning (the
    complement of SemDeDup: keep the spread, not drop the near-dups).

    → k rows ``(rank, vec_id, sim_micros)`` in selection order, where
    ``sim_micros`` is the candidate's max cosine similarity (half-away
    micros) to the already-selected set at the moment it was picked —
    a non-decreasing sequence whose tail value is the coverage radius
    witness.  Rank 1 is the globally smallest id (the house
    deterministic seeding convention, `kmeans_train`), with sentinel
    ``sim_micros = -2_000_000`` (outside the valid cosine range).

    Scale shape (100 TB framing): the per-point "max similarity to the
    selected set" state lives WITH the data — one stateful shard actor
    per materialized block (ST7 pattern: state built once in
    ``__init__``), holding (ids, unit matrix, running int64 max-sim).
    A round broadcasts only the newly selected unit VECTOR (dim
    floats, via ``ray.put``); each shard does one vectorized matvec,
    updates its running max in place, and returns a single local
    candidate row — O(num_blocks) driver rows per round, never O(N).
    Total work O(k·N·dim) flops + k small actor round-trips: the
    round loop dispatches plain actor calls over a fixed shard list,
    not a Dataset job per round (the crawl-round dispatch rule).

    Determinism: similarities are quantized half-away micros BEFORE
    the max/argmin, and the global winner is the lexicographic min of
    ``(max_sim, id)`` across shards — integer comparisons with id
    tiebreaks are partition-invariant, so the sequential same-math
    golden (`oracle/goldens.py`) is a valid oracle for the distributed
    orchestration.  Already-selected points converge to max-sim 1e6
    (sim with themselves) and can never win again while any point has
    max-sim < 1e6; exact-duplicate vectors of a selected point are
    likewise covered, the degenerate-tie class the knn-graph fuzz
    caught (tie-stable by the id tiebreak).
    """
    import ray

    block_refs = list(ds.materialize().to_arrow_refs())
    # one shard actor per block would deadlock when blocks > free CPUs
    # (all seeds are ray.get in one wave) — group blocks into at most
    # cpus-1 shards; each actor concatenates its group once in __init__.
    n_cpu = int(ray.cluster_resources().get("CPU", 1))
    n_shards = max(1, min(len(block_refs), n_cpu - 1 if n_cpu > 1 else 1))
    groups = [block_refs[i::n_shards] for i in range(n_shards)]

    @ray.remote(num_cpus=1)
    class _KCenterShard:
        def __init__(self, blocks: list):
            from crawler_ai_ray.stages.dedup import list_col_to_matrix

            ids_parts, mat_parts = [], []
            for ref in blocks:  # refs nested in a list resolve manually
                block = ray.get(ref)
                if block.num_rows == 0 or id_col not in block.column_names:
                    continue  # schema-less empty block guard (house rule)
                ids_parts.append(
                    block[id_col].to_numpy(zero_copy_only=False).astype(
                        np.int64
                    )
                )
                mat_parts.append(
                    _normalize(list_col_to_matrix(block[emb_col]))
                )
            if ids_parts:
                self.ids = np.concatenate(ids_parts)
                self.mat = np.concatenate(mat_parts)
            else:
                self.ids = np.zeros(0, np.int64)
                self.mat = np.zeros((0, 0), np.float64)
            self.max_sim = np.full(len(self.ids), -2_000_000, np.int64)

        def seed(self):
            """(min id, its unit vector) — or None for an empty shard."""
            if not len(self.ids):
                return None
            i = int(np.argmin(self.ids))
            return int(self.ids[i]), self.mat[i].copy()

        def update_and_candidate(self, vec: np.ndarray):
            """Fold the newly selected vector into the running max-sim,
            return this shard's farthest candidate
            (max_sim, id, unit_vec) — lexicographic min of
            (max_sim, id)."""
            if not len(self.ids):
                return None
            sims = _half_away_micros(self.mat @ vec * 1_000_000.0)
            np.maximum(self.max_sim, sims, out=self.max_sim)
            i = int(np.lexsort((self.ids, self.max_sim))[0])
            return (
                int(self.max_sim[i]),
                int(self.ids[i]),
                self.mat[i].copy(),
            )

    shards = [_KCenterShard.remote(g) for g in groups]
    try:
        seeds = [s for s in ray.get([a.seed.remote() for a in shards])
                 if s is not None]
        ranks: list[int] = []
        ids_out: list[int] = []
        sims_out: list[int] = []
        if seeds:
            seeds.sort(key=lambda s: s[0])
            sel_id, sel_vec = seeds[0]
            ranks.append(1)
            ids_out.append(sel_id)
            sims_out.append(-2_000_000)
            for r in range(2, k + 1):
                vec_ref = ray.put(sel_vec)
                cands = [
                    c
                    for c in ray.get(
                        [a.update_and_candidate.remote(vec_ref)
                         for a in shards]
                    )
                    if c is not None
                ]
                cands.sort(key=lambda c: (c[0], c[1]))
                best_sim, best_id, best_vec = cands[0]
                if best_sim >= 1_000_000:
                    break  # every remaining point is an exact dup of a center
                ranks.append(r)
                ids_out.append(best_id)
                sims_out.append(best_sim)
                sel_id, sel_vec = best_id, best_vec
    finally:
        for a in shards:
            ray.kill(a)
    return pa.table(
        {
            "rank": pa.array(ranks, pa.int64()),
            "vec_id": pa.array(ids_out, pa.int64()),
            "sim_micros": pa.array(sims_out, pa.int64()),
        }
    )


def mmr_select(
    ds,
    k: int = 16,
    lambda_ppm: int = 500_000,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
) -> pa.Table:
    """Maximal-Marginal-Relevance (Carbonell-Goldstein) diverse top-k —
    the retrieval/data-mixing selection that trades relevance against
    redundancy: greedily pick argmax of
    ``λ·rel(x) − (1−λ)·max_sim(x, selected)``.

    The relevance query is the corpus's own normalized mean vector
    (deterministic, no external query needed — "most central yet
    mutually diverse" exemplars, the summarization framing), computed
    in one streaming pass of integer micro-sums (partition-invariant,
    the `kmeans_train` discipline).

    → k rows ``(rank, vec_id, rel_micros, score_pico)`` in selection
    order; ``score_pico = λ_ppm·rel_micros − (1e6−λ_ppm)·max_sim_micros``
    (micros × ppm = 1e-12 scale, the `proj_pico` naming precedent).
    The empty-set diversity penalty is 0, so rank 1 is simply argmax
    relevance — the standard MMR convention.

    Scale shape: same as `kcenter_select` — per-shard stateful actors
    hold (ids, unit matrix, rel micros, running max-sim); a round
    broadcasts one unit vector and reduces one candidate per shard.
    All comparisons are int64 with (score desc, id asc) tiebreaks, so
    the sequential same-math golden is the oracle."""
    import ray

    block_refs = list(ds.materialize().to_arrow_refs())
    n_cpu = int(ray.cluster_resources().get("CPU", 1))
    n_shards = max(1, min(len(block_refs), n_cpu - 1 if n_cpu > 1 else 1))
    groups = [block_refs[i::n_shards] for i in range(n_shards)]

    # pass 1: exact corpus mean via integer micro-sums
    @ray.remote(num_cpus=1)
    def mean_partial(*blocks):
        from crawler_ai_ray.stages.dedup import list_col_to_matrix

        s, n = None, 0
        for block in blocks:
            if block.num_rows == 0 or emb_col not in block.column_names:
                continue
            mat = _normalize(list_col_to_matrix(block[emb_col]))
            micro = _half_away_micros(mat * 1_000_000.0)
            part = micro.sum(axis=0)
            s = part if s is None else s + part
            n += len(micro)
        return s, n

    parts = ray.get([mean_partial.remote(*g) for g in groups])
    tot = None
    n_tot = 0
    for s, n in parts:
        if s is not None:
            tot = s if tot is None else tot + s
            n_tot += n
    if tot is None or n_tot == 0:
        return pa.table(
            {
                "rank": pa.array([], pa.int64()),
                "vec_id": pa.array([], pa.int64()),
                "rel_micros": pa.array([], pa.int64()),
                "score_pico": pa.array([], pa.int64()),
            }
        )
    q = _normalize(((tot / 1_000_000.0) / n_tot)[None, :])[0]

    lam = np.int64(lambda_ppm)
    lam_inv = np.int64(1_000_000 - lambda_ppm)

    @ray.remote(num_cpus=1)
    class _MMRShard:
        def __init__(self, blocks: list, qvec: np.ndarray):
            from crawler_ai_ray.stages.dedup import list_col_to_matrix

            ids_parts, mat_parts = [], []
            for ref in blocks:
                block = ray.get(ref)
                if block.num_rows == 0 or id_col not in block.column_names:
                    continue
                ids_parts.append(
                    block[id_col].to_numpy(zero_copy_only=False).astype(
                        np.int64
                    )
                )
                mat_parts.append(
                    _normalize(list_col_to_matrix(block[emb_col]))
                )
            if ids_parts:
                self.ids = np.concatenate(ids_parts)
                self.mat = np.concatenate(mat_parts)
                self.rel = _half_away_micros(
                    self.mat @ qvec * 1_000_000.0
                )
            else:
                self.ids = np.zeros(0, np.int64)
                self.mat = np.zeros((0, 0), np.float64)
                self.rel = np.zeros(0, np.int64)
            # empty-set diversity penalty is 0 (MMR convention)
            self.max_sim = np.zeros(len(self.ids), np.int64)
            self.taken = np.zeros(len(self.ids), bool)

        def candidate(self, vec):
            """Fold the latest selection (None on round 1) into the
            running max-sim, return (score, id, rel, unit_vec) for this
            shard's best unselected point."""
            if not len(self.ids):
                return None
            if vec is not None:
                sims = _half_away_micros(self.mat @ vec * 1_000_000.0)
                np.maximum(self.max_sim, sims, out=self.max_sim)
            score = lam * self.rel - lam_inv * self.max_sim
            # mask already-taken rows (an exact dup of a selected row
            # still competes — MMR penalizes, never excludes, content)
            avail = ~self.taken
            if not avail.any():
                return None
            idx = np.flatnonzero(avail)
            sub = np.lexsort((self.ids[idx], -score[idx]))[0]
            i = int(idx[sub])
            return (
                int(score[i]),
                int(self.ids[i]),
                int(self.rel[i]),
                self.mat[i].copy(),
                i,
            )

        def mark_taken(self, local_i: int):
            self.taken[local_i] = True

    q_ref = ray.put(q)
    shards = [_MMRShard.remote(g, q_ref) for g in groups]
    ranks, ids_out, rels_out, scores_out = [], [], [], []
    try:
        vec = None
        for r in range(1, k + 1):
            vec_ref = ray.put(vec) if vec is not None else None
            cands = ray.get(
                [a.candidate.remote(vec_ref) for a in shards]
            )
            best, best_shard = None, None
            for si, c in enumerate(cands):
                if c is None:
                    continue
                key = (-c[0], c[1])
                if best is None or key < (-best[0], best[1]):
                    best, best_shard = c, si
            if best is None:
                break
            score, bid, rel, bvec, local_i = best
            ray.get(shards[best_shard].mark_taken.remote(local_i))
            ranks.append(r)
            ids_out.append(bid)
            rels_out.append(rel)
            scores_out.append(score)
            vec = bvec
    finally:
        for a in shards:
            ray.kill(a)
    return pa.table(
        {
            "rank": pa.array(ranks, pa.int64()),
            "vec_id": pa.array(ids_out, pa.int64()),
            "rel_micros": pa.array(rels_out, pa.int64()),
            "score_pico": pa.array(scores_out, pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# SQ8: scalar-quantized (int8) ANN with exact rerank
# ---------------------------------------------------------------------------

def sq8_minmax(ds, emb_col: str = "embedding"):
    """Per-dimension (min, max) of the HALF-AWAY micro quantization of
    the normalized embeddings — the SQ8 codebook.  Associative int64
    min/max combiner per block + driver reduce, so the codebook is
    bit-identical under any partitioning (which is what makes the
    sequential same-math golden a valid oracle for `knn_sq8`)."""
    import ray

    from .dedup import list_col_to_matrix

    @ray.remote(num_cpus=1)
    def partial(block: pa.Table):
        if block.num_rows == 0 or emb_col not in block.column_names:
            return None
        mat = _normalize(list_col_to_matrix(block[emb_col]))
        micro = _half_away_micros(mat * 1_000_000.0)
        return micro.min(axis=0), micro.max(axis=0)

    parts = [
        p
        for p in ray.get(
            [partial.remote(b) for b in ds.materialize().to_arrow_refs()]
        )
        if p is not None
    ]
    if not parts:  # empty / all-empty-block dataset: no codebook
        return None, None
    dmin = np.minimum.reduce([p[0] for p in parts])
    dmax = np.maximum.reduce([p[1] for p in parts])
    return dmin.astype(np.int64), dmax.astype(np.int64)


def _sq8_quantize(micro: np.ndarray, dmin: np.ndarray, dmax: np.ndarray):
    span = np.maximum(dmax - dmin, 1)
    return ((micro - dmin) * 255 // span).astype(np.int64)


def knn_sq8(
    ds,
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int = 10,
    shortlist: int = 30,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
):
    """SQ8 ANN — scalar (per-dimension int8) quantization with exact
    rerank, the third quantized-search tier next to IVF and PQ (the
    SQ8 flat index of FAISS / Milvus; 4× memory cut vs float32 with
    near-exact recall): → ``(query_id, vec_id, rank, sim_micros,
    sq_score)``.

    Pipeline: one combiner pass learns the per-dim (min, max) codebook
    (`sq8_minmax`, integer, partition-invariant); each block then
    quantizes its rows to 0..255 ints and scores candidates with an
    INTEGER dot product against the quantized queries — top
    ``shortlist`` per (block, query) by (score desc, id asc), computed
    tie-stably (pre-sorted ids + stable lexsort, the knn-graph rule);
    a query-bucket merge re-cuts the global shortlist and reranks the
    survivors by their EXACT cosine micros (carried from the block
    pass — no second data touch).  Every step is integer arithmetic on
    a partition-invariant codebook ⇒ bit-identical output under any
    blocking, pinned by the sequential golden
    (oracle/goldens.py::_build_emb_goldens)."""
    import ray

    from .dedup import list_col_to_matrix

    dmin, dmax = sq8_minmax(ds, emb_col=emb_col)
    if dmin is None:  # typed-empty result for an empty corpus
        return pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "vec_id": pa.array([], pa.int64()),
                "rank": pa.array([], pa.int64()),
                "sim_micros": pa.array([], pa.int64()),
                "sq_score": pa.array([], pa.int64()),
            }
        )
    qn = _normalize(queries.astype(np.float64))
    q_micro = _half_away_micros(qn * 1_000_000.0)
    q_quant = _sq8_quantize(q_micro, dmin, dmax)
    ref = ray.put(
        (dmin, dmax, q_quant, qn, query_ids.astype(np.int64))
    )

    def score(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "vec_id": pa.array([], pa.int64()),
                "sq_score": pa.array([], pa.int64()),
                "sim_micros": pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0 or emb_col not in batch.column_names:
            return empty
        dmn, dmx, qq, qnorm, qids = ray.get(ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        mat = _normalize(list_col_to_matrix(batch[emb_col]))
        # tie-stability: process rows in ascending-id order so the
        # stable shortlist cut is partition-invariant
        o = np.argsort(ids, kind="stable")
        ids, mat = ids[o], mat[o]
        micro = _half_away_micros(mat * 1_000_000.0)
        quant = _sq8_quantize(micro, dmn, dmx)
        scores = quant @ qq.T                      # (N, Q) int64
        sims = _half_away_micros(mat @ qnorm.T * 1_000_000.0)
        out_q, out_v, out_s, out_m = [], [], [], []
        m = min(shortlist, len(ids))
        for qi in range(qq.shape[0]):
            sel = np.lexsort((ids, -scores[:, qi]))[:m]
            out_q.append(np.full(m, qids[qi], np.int64))
            out_v.append(ids[sel])
            out_s.append(scores[sel, qi])
            out_m.append(sims[sel, qi])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q), pa.int64()),
                "vec_id": pa.array(np.concatenate(out_v), pa.int64()),
                "sq_score": pa.array(np.concatenate(out_s), pa.int64()),
                "sim_micros": pa.array(np.concatenate(out_m), pa.int64()),
            }
        )

    def merge(group: pa.Table) -> pa.Table:
        qid = group["query_id"][0].as_py()
        v = group["vec_id"].to_numpy(zero_copy_only=False)
        s = group["sq_score"].to_numpy(zero_copy_only=False)
        sm = group["sim_micros"].to_numpy(zero_copy_only=False)
        short = np.lexsort((v, -s))[:shortlist]
        rr = np.lexsort((v[short], -sm[short]))[:k]
        sel = short[rr]
        return pa.table(
            {
                "query_id": pa.array(
                    np.full(len(sel), qid), pa.int64()
                ),
                "vec_id": pa.array(v[sel], pa.int64()),
                "rank": pa.array(
                    np.arange(1, len(sel) + 1), pa.int64()
                ),
                "sim_micros": pa.array(sm[sel], pa.int64()),
                "sq_score": pa.array(s[sel], pa.int64()),
            }
        )

    return (
        ds.map_batches(score, batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(merge, batch_format="pyarrow")
    )


def pq_distortion(
    ds,
    m: int = 8,
    ksub: int = 16,
    iters: int = 5,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
) -> pa.Table:
    """PQ reconstruction-distortion profile → one row per subspace
    ``(subspace, n_vecs, sum_sqerr, mean_sqerr)``: the quantization
    error budget of the trained codebooks (Jégou et al. 2011 §3 — the
    quantity you check before trusting the 512×-compressed index;
    per-subspace imbalance says which subspaces need more centroids).

    Exactness: codebooks from `pq_train` are bit-identical under any
    partitioning (integer micro-sum reduce), code assignment is the
    SAME float argmin both sides, and the error is measured in
    half-away micros (int64) — ``sum_sqerr`` is an associative integer
    sum, so the sequential same-math golden matches bit-for-bit.
    One extra streaming pass over the blocks; per-subspace partials
    only (m rows per block)."""
    import ray

    from .dedup import list_col_to_matrix

    books = pq_train(
        ds, m=m, ksub=ksub, iters=iters, emb_col=emb_col, id_col=id_col
    )
    dsub = books.shape[2]
    book_micro = _half_away_micros(books * _PQ_MICRO)

    @ray.remote(num_cpus=1)
    def partial(block: pa.Table, bks: np.ndarray, bkm: np.ndarray):
        n = np.zeros(m, np.int64)
        sq = np.zeros(m, np.int64)
        if block.num_rows == 0 or emb_col not in block.column_names:
            return n, sq
        mat = _normalize(list_col_to_matrix(block[emb_col]))
        micro = _half_away_micros(mat * _PQ_MICRO)
        for s in range(m):
            x = mat[:, s * dsub : (s + 1) * dsub]
            d2 = (
                (x * x).sum(axis=1)[:, None]
                - 2.0 * (x @ bks[s].T)
                + (bks[s] * bks[s]).sum(axis=1)[None, :]
            )
            code = np.argmin(d2, axis=1)
            err = micro[:, s * dsub : (s + 1) * dsub] - bkm[s][code]
            n[s] += len(code)
            sq[s] += int((err * err).sum())
        return n, sq

    b_ref = ray.put(books)
    bm_ref = ray.put(book_micro)
    parts = ray.get(
        [
            partial.remote(b, b_ref, bm_ref)
            for b in ds.materialize().to_arrow_refs()
        ]
    )
    n_tot = [0] * m
    sq_tot = [0] * m
    for n, sq in parts:
        for s in range(m):
            n_tot[s] += int(n[s])
            sq_tot[s] += int(sq[s])
    return pa.table(
        {
            "subspace": pa.array(range(m), pa.int64()),
            "n_vecs": pa.array(n_tot, pa.int64()),
            "sum_sqerr": pa.array(sq_tot, pa.int64()),
            "mean_sqerr": pa.array(
                [sq // max(n, 1) for sq, n in zip(sq_tot, n_tot)],
                pa.int64(),
            ),
        }
    )

"""Similarity search over an embedding column (``list<float>``).

* **Brute-force cosine top-k** (the exactness baseline): the query
  matrix is broadcast once (``ray.put``); each Arrow batch of the
  corpus does ONE numpy matmul against it and emits its local top-k per
  query; a ``groupby(query_id)`` merge produces the global top-k.
  Communication: O(batches × Q × k) candidate rows — never the corpus.

* **IVF (inverted-file) ANN** (the scale path): k-means centroids are
  trained distributed (map_batches partial assign+sum, driver reduce —
  the classic mini-batch scheme), vectors are assigned to their nearest
  centroid (one hash-partitioned pass), and a query probes only the
  ``nprobe`` nearest lists.  At 100 TB the probe prunes the corpus to
  nprobe/nlist of its blocks; the assignment column doubles as the
  Parquet partition key so probes become file-level reads.

Determinism: all float math is float64; ranking ties broken by
``vec_id`` ascending, so results are stable across runs/platforms and
comparable to the DuckDB oracle (``list_cosine_similarity`` + window
rank).
"""

from __future__ import annotations

import heapq

import numpy as np
import pyarrow as pa

from .dedup import list_col_to_matrix

__all__ = [
    "knn_bruteforce",
    "kmeans_train",
    "ivf_assign",
    "knn_ivf",
    "semantic_dedup",
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
    # lexsort per column: primary -sim, secondary vec_id
    for qi in range(q):
        col = sims[:, qi]
        if n > kk:
            part = np.argpartition(-col, kk - 1)[: kk * 2 if kk * 2 < n else n]
        else:
            part = np.arange(n)
        order = part[np.lexsort((ids[part], -col[part]))][:kk]
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
    — the classic pre-aggregation before the tiny driver-side reduce)."""
    import ray

    seed_rows = (
        ds.sort(id_col)
        .limit(nlist)
        .take_all()
    )
    centroids = _normalize(
        np.array([r[emb_col] for r in seed_rows], dtype=np.float64)
    )

    for _ in range(iters):
        c_ref = ray.put(centroids)

        def partial(batch: pa.Table) -> pa.Table:
            c = ray.get(c_ref)
            mat = _normalize(list_col_to_matrix(batch[emb_col]))
            if mat.size == 0:
                return pa.table(
                    {
                        "cluster": pa.array([], type=pa.int32()),
                        "vsum": pa.array([], type=pa.list_(pa.float64())),
                        "count": pa.array([], type=pa.int64()),
                    }
                )
            assign = np.argmax(mat @ c.T, axis=1)
            cl, inv = np.unique(assign, return_inverse=True)
            sums = np.zeros((len(cl), mat.shape[1]))
            np.add.at(sums, inv, mat)
            counts = np.bincount(inv, minlength=len(cl))
            return pa.table(
                {
                    "cluster": pa.array(cl, type=pa.int32()),
                    "vsum": pa.array(sums.tolist(), type=pa.list_(pa.float64())),
                    "count": pa.array(counts, type=pa.int64()),
                }
            )

        parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
        sums = np.zeros_like(centroids)
        counts = np.zeros(len(centroids))
        for r in parts:
            sums[r["cluster"]] += np.asarray(r["vsum"])
            counts[r["cluster"]] += r["count"]
        nz = counts > 0
        centroids[nz] = _normalize(sums[nz] / counts[nz, None])
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

        sims = mat @ mat.T
        ii, jj = np.nonzero(np.triu(sims >= threshold, k=1))
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

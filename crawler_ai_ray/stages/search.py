"""Full-text scoring/search over a ``documents``-style table.

The retrieval half of a training-data pipeline: score every document
against a fixed query-term set and keep the global top-k — the shape
behind corpus inspection ("show me the most X-like docs"), quality
probes, and retrieval-based decontamination.  Two scorers:

* **TF-IDF (integer-exact)** — ``score = Σ_t tf(doc,t) · idf_scaled(t)``
  with ``idf_scaled = N·10⁶ // df(t)`` — all int64, so the DuckDB
  oracle matches the scores bit-for-bit (house rule: no
  order-dependent float sums in SQL-checked outputs).
* **BM25 (Lucene formula)** — float scoring,
  ``idf = ln(1 + (N−df+0.5)/(df+0.5))``,
  ``c_t = idf·(tf·(k1+1)) / (tf + k1·(1−b+b·dl/avgdl))``, summed in
  fixed term order.  The query returns RANKS (ints), not scores: a
  cross-library 1-ulp ``ln`` difference can only flip an order if two
  distinct score profiles land within 1 ulp (ties from IDENTICAL
  profiles stay exactly tied on both sides and break by doc_id) — so
  the rank output is deterministically SQL-checkable while raw float
  scores would not be.

Scale shape: two streaming passes over the corpus, no shuffle at all.
Pass 1 (``corpus_term_stats``) computes per-batch partials — per-term
document frequency, doc count, total token count — with vectorized
RE2 kernels (`pyarrow.compute.count_substring_regex`; pyarrow and
DuckDB both use RE2, so token counts agree exactly); partials are
combiner-sized (|terms|+2 ints per batch) and reduce driver-side.
Pass 2 scores each batch vectorized and keeps a per-batch top-k; the
global merge sees ≤ batches·k candidate rows, sorted driver-side with
numpy (house rule: never a Ray sort on a tiny candidate set).  The
query-term set is a handful of strings captured in the task closure —
nothing is broadcast, nothing is joined.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["corpus_term_stats", "tfidf_topk", "bm25_topk"]

_TOKEN_RX = r"\S+"


def _term_rx(term: str) -> str:
    return rf"\b{re.escape(term)}\b"


def _tf_matrix(batch: pa.Table, terms: list[str], text_col: str) -> np.ndarray:
    """|batch| × |terms| int64 term-frequency matrix, vectorized RE2."""
    low = pc.utf8_lower(batch[text_col])
    cols = [
        pc.count_substring_regex(low, pattern=_term_rx(t)).to_numpy(
            zero_copy_only=False
        )
        for t in terms
    ]
    return np.stack(cols, axis=1).astype(np.int64)


def corpus_term_stats(ds, terms: list[str], text_col: str = "text"):
    """One streaming pass → (n_docs, df per term, total token count).
    Per-batch partials are |terms|+2 integers; reduced driver-side."""
    import ray

    def partial(batch: pa.Table) -> pa.Table:
        tf = _tf_matrix(batch, terms, text_col)
        low = pc.utf8_lower(batch[text_col])
        dl = pc.count_substring_regex(low, pattern=_TOKEN_RX).to_numpy(
            zero_copy_only=False
        )
        return pa.table(
            {
                "term_idx": pa.array(
                    list(range(len(terms))) + [-1, -2], pa.int32()
                ),
                "v": pa.array(
                    list((tf > 0).sum(axis=0).astype(np.int64))
                    + [len(dl), int(dl.sum())],
                    pa.int64(),
                ),
            }
        )

    parts = [
        t
        for t in ray.get(
            ds.map_batches(partial, batch_format="pyarrow").to_arrow_refs()
        )
        if t.num_rows
    ]
    agg = (
        pa.concat_tables(parts)
        .group_by("term_idx")
        .aggregate([("v", "sum")])
    )
    vals = dict(
        zip(
            agg["term_idx"].to_pylist(),
            agg["v_sum"].to_pylist(),
        )
    )
    n_docs = vals.get(-1, 0)
    total_tokens = vals.get(-2, 0)
    df = np.array(
        [vals.get(i, 0) for i in range(len(terms))], dtype=np.int64
    )
    return n_docs, df, total_tokens


def _merge_topk(cand_tables, k: int, id_col: str = "doc_id") -> pa.Table:
    """Driver-side merge of per-batch candidates: global top-k by
    (score desc, doc_id asc).  Input is ≤ batches·k rows."""
    live = [t for t in cand_tables if t.num_rows]
    if not live:
        return pa.table(
            {id_col: pa.array([], pa.int64()), "score": pa.array([], pa.int64())}
        )
    cat = pa.concat_tables(live)
    ids = cat[id_col].to_numpy(zero_copy_only=False)
    sc = cat["score"].to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, -sc))[:k]
    return pa.table(
        {id_col: pa.array(ids[order]), "score": pa.array(sc[order])}
    )


def tfidf_topk(
    ds, terms: list[str], k: int = 20, text_col: str = "text"
):
    """→ (doc_id, score) int64: top-k docs by
    ``Σ_t tf·(N·10⁶ // df_t)``, ties broken by doc_id.  Docs with
    score 0 are out of domain (mirrored by the oracle's ``score > 0``
    filter, which keeps top-k membership deterministic)."""
    import ray

    n_docs, df, _ = corpus_term_stats(ds, terms, text_col)
    idf = np.where(df > 0, (n_docs * 1_000_000) // np.maximum(df, 1), 0)

    def cand(batch: pa.Table) -> pa.Table:
        tf = _tf_matrix(batch, terms, text_col)
        score = tf @ idf
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        keep = score > 0
        ids, score = ids[keep], score[keep]
        order = np.lexsort((ids, -score))[:k]
        return pa.table(
            {
                "doc_id": pa.array(ids[order], pa.int64()),
                "score": pa.array(score[order], pa.int64()),
            }
        )

    cands = ray.get(
        ds.map_batches(cand, batch_format="pyarrow").to_arrow_refs()
    )
    return _merge_topk(cands, k)


def bm25_topk(
    ds,
    terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
):
    """→ (rank, doc_id): top-k docs by Lucene BM25, rank 1-based,
    ties broken by doc_id.  Scored vectorized in fixed term order so
    the float accumulation is deterministic; only ranks leave."""
    import ray

    n_docs, df, total_tokens = corpus_term_stats(ds, terms, text_col)
    if n_docs == 0:
        return pa.table(
            {"rank": pa.array([], pa.int64()), "doc_id": pa.array([], pa.int64())}
        )
    avgdl = total_tokens / n_docs
    idf = np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))

    def cand(batch: pa.Table) -> pa.Table:
        tf = _tf_matrix(batch, terms, text_col).astype(np.float64)
        low = pc.utf8_lower(batch[text_col])
        dl = (
            pc.count_substring_regex(low, pattern=_TOKEN_RX)
            .to_numpy(zero_copy_only=False)
            .astype(np.float64)
        )
        norm = k1 * (1.0 - b + b * (dl / avgdl))
        score = np.zeros(len(dl), dtype=np.float64)
        for j in range(len(terms)):  # fixed term order — deterministic sum
            score += idf[j] * (tf[:, j] * (k1 + 1.0)) / (tf[:, j] + norm)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        keep = score > 0
        ids, score = ids[keep], score[keep]
        order = np.lexsort((ids, -score))[:k]
        return pa.table(
            {
                "doc_id": pa.array(ids[order], pa.int64()),
                "score": pa.array(score[order], pa.float64()),
            }
        )

    live = [
        t
        for t in ray.get(
            ds.map_batches(cand, batch_format="pyarrow").to_arrow_refs()
        )
        if t.num_rows
    ]
    if not live:
        return pa.table(
            {"rank": pa.array([], pa.int64()), "doc_id": pa.array([], pa.int64())}
        )
    cat = pa.concat_tables(live)
    ids = cat["doc_id"].to_numpy(zero_copy_only=False)
    sc = cat["score"].to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, -sc))[:k]
    return pa.table(
        {
            "rank": pa.array(np.arange(1, len(order) + 1), pa.int64()),
            "doc_id": pa.array(ids[order], pa.int64()),
        }
    )

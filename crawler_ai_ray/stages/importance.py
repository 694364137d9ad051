"""DSIR-style data selection: hashed-unigram importance scores.

Data Selection with Importance Resampling (Xie et al. 2023,
arXiv:2302.03169) scores every raw document by how much more likely its
hashed n-gram features are under a TARGET distribution than under the
RAW distribution, then keeps the top-scoring slice.  This module
implements the integer-exact linear variant:

* features: lowercased ``[a-z]+`` tokens (the repo-wide tokenization
  convention shared with ``top_terms``/TF-IDF so the DuckDB oracle
  reproduces it byte-for-byte) hashed to ``num_feats`` buckets via
  ``md5`` — the SAME bytes DuckDB's ``md5_number_lower`` returns
  (little-endian of digest bytes 8..16), so the oracle recomputes the
  feature ids exactly;
* per-feature weight ``w[f] = (tgt[f]+1)·(R+B) − (raw[f]+1)·(T+B)``
  — the add-one-smoothed probability difference
  ``p_target(f) − p_raw(f)`` cross-multiplied by ``(T+B)(R+B)`` so it
  stays in int64 (B = num_feats, T/R = total target/raw token counts);
* per-doc score = Σ over token OCCURRENCES of ``w[f(token)]`` —
  order-free integer sums, bit-reproducible by the oracle.

The paper's log-likelihood-ratio weights need floats; at oracle scales
the linear difference ranks near-identically and is exactly checkable.
At 100 TB the float log-ratio drops in per batch without changing the
orchestration (the score column just stops being oracle-exact).

Scale shape:

* pass 1 streams the corpus once; each batch reduces to its NONZERO
  feature-count rows (≤ num_feats per block) — combiner-sized partials,
  summed in one driver Arrow pass, never a shuffle;
* the weight vector (num_feats int64s, ~32 KB at 4096) broadcasts via
  ``ray.put`` — read once per task, not re-shipped per batch;
* pass 2 is one vectorized map: RE2 split, per-batch dictionary-encode
  so md5 runs on DISTINCT tokens only (Zipf: ~10× fewer hashes), weight
  gather + ``np.add.reduceat`` segment sums per doc;
* output is one score row per non-empty doc — streams to any sink.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = [
    "dsir_scores",
    "md5_feature",
    "hash_embed",
    "hash_embed_batch",
    "logreg_train",
    "logreg_train_tables",
    "logreg_epoch_grad",
    "logreg_prepare",
    "logreg_grad_prepared",
    "logreg_margins",
    "label_quality_batch",
]


def md5_feature(token: str, num_feats: int) -> int:
    """Feature id of a token — matches DuckDB
    ``CAST(md5_number_lower(token) % num_feats AS INT)`` exactly."""
    d = hashlib.md5(token.encode()).digest()
    return int.from_bytes(d[8:], "little") % num_feats


def _tokens(batch: pa.Table, text_col: str):
    """→ (flat token array, parent doc index array), empties dropped."""
    toks = pc.split_pattern_regex(pc.utf8_lower(batch[text_col]), "[^a-z]+")
    lst = (
        toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
    )
    flat = pc.list_flatten(lst)
    parent = pc.list_parent_indices(lst)
    mask = pc.not_equal(flat, "")
    return flat.filter(mask), parent.filter(mask)


def _feat_ids(flat: pa.Array, num_feats: int) -> np.ndarray:
    """Vectorized-ish feature ids: md5 only on the batch's DISTINCT
    tokens (dictionary encode), then an integer gather."""
    if len(flat) == 0:
        return np.zeros(0, dtype=np.int64)
    d = pc.dictionary_encode(flat)
    vocab = d.dictionary.to_pylist()
    fv = np.array(
        [md5_feature(t, num_feats) for t in vocab], dtype=np.int64
    )
    return fv[d.indices.to_numpy(zero_copy_only=False)]


def dsir_scores(
    ds,
    target_lang: str = "en",
    num_feats: int = 4096,
    text_col: str = "text",
    lang_col: str = "lang",
    id_col: str = "doc_id",
):
    """documents Dataset → lazy Dataset (doc_id, dsir_score), one row
    per doc with ≥1 token.  ``ds`` must carry (id_col, text_col,
    lang_col)."""
    import ray

    ds = ds.materialize()  # two passes over the same input

    def hist_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "feat": pa.array([], pa.int64()),
                    "n_raw": pa.array([], pa.int64()),
                    "n_tgt": pa.array([], pa.int64()),
                }
            )
        flat, parent = _tokens(batch, text_col)
        feats = _feat_ids(flat, num_feats)
        raw = np.bincount(feats, minlength=num_feats)
        is_tgt = pc.equal(
            batch[lang_col], target_lang
        ).to_numpy(zero_copy_only=False)
        par = parent.to_numpy(zero_copy_only=False)
        tgt = np.bincount(
            feats[is_tgt[par]], minlength=num_feats
        )
        nz = np.flatnonzero(raw)
        return pa.table(
            {
                "feat": pa.array(nz, pa.int64()),
                "n_raw": pa.array(raw[nz], pa.int64()),
                "n_tgt": pa.array(tgt[nz], pa.int64()),
            }
        )

    parts = [
        t
        for t in ray.get(
            ds.map_batches(
                hist_partial, batch_format="pyarrow"
            ).to_arrow_refs()
        )
        if t.num_rows
    ]
    raw_vec = np.zeros(num_feats, dtype=np.int64)
    tgt_vec = np.zeros(num_feats, dtype=np.int64)
    if parts:
        agg = (
            pa.concat_tables(parts)
            .group_by("feat")
            .aggregate([("n_raw", "sum"), ("n_tgt", "sum")])
        )
        idx = agg["feat"].to_numpy(zero_copy_only=False)
        raw_vec[idx] = agg["n_raw_sum"].to_numpy(zero_copy_only=False)
        tgt_vec[idx] = agg["n_tgt_sum"].to_numpy(zero_copy_only=False)
    total_raw = int(raw_vec.sum())
    total_tgt = int(tgt_vec.sum())
    # w[f] = (tgt+1)(R+B) − (raw+1)(T+B): sign of p_tgt(f) − p_raw(f)
    weights = (tgt_vec + 1) * (total_raw + num_feats) - (
        raw_vec + 1
    ) * (total_tgt + num_feats)
    w_ref = ray.put(weights)

    def score(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "dsir_score": pa.array([], pa.int64()),
                }
            )
        w = ray.get(w_ref)
        flat, parent = _tokens(batch, text_col)
        if len(flat) == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "dsir_score": pa.array([], pa.int64()),
                }
            )
        feats = _feat_ids(flat, num_feats)
        par = parent.to_numpy(zero_copy_only=False)
        # parent indices are nondecreasing → reduceat segment sums
        starts = np.flatnonzero(np.diff(par, prepend=np.int64(-1)))
        doc_idx = par[starts]
        sums = np.add.reduceat(w[feats], starts)
        return pa.table(
            {
                id_col: pc.take(
                    batch[id_col], pa.array(doc_idx, pa.int64())
                ),
                "dsir_score": pa.array(sums, pa.int64()),
            }
        )

    # pass 2 stays a lazy Dataset — scores stream to whatever sink the
    # caller attaches; nothing doc-sized ever lands on the driver
    return ds.map_batches(score, batch_format="pyarrow")


def hash_embed_batch(
    batch: pa.Table,
    dim: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> pa.Table:
    """doc → (doc_id, embedding list<int64>[dim]): deterministic signed
    hashed projection of the unigram bag — component j is
    Σ_occurrences ±1 with the sign = bit j of the token's 64-bit md5
    (``md5_number_lower`` semantics, the ``md5_feature`` bytes), i.e. a
    non-thresholded SimHash / {±1} Johnson-Lindenstrauss projection.
    Pure integer sums ⇒ partition-invariant and exactly reproducible in
    SQL (``(md5_number_lower(tok) >> j) & 1``).  Docs with zero
    ``[a-z]+`` tokens are outside the output domain (oracle mirror).
    Requires ``dim ≤ 64`` (one md5 per DISTINCT token, no per-dim
    rehash)."""
    if dim > 64:
        raise ValueError("dim must be ≤ 64 (signs come from one u64 hash)")
    if batch.num_rows == 0:
        # same fixed_size_list[dim] schema as the non-empty branch — a
        # list<int64> here would make blocks of one dataset carry
        # incompatible schemas (the typed-empty-block rule)
        return pa.table(
            {
                id_col: pa.array([], pa.int64()),
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array([], pa.int64()), dim
                ),
            }
        )
    flat, parent = _tokens(batch, text_col)
    d = pc.dictionary_encode(flat)
    vocab = d.dictionary.to_pylist()
    h = np.array(
        [
            int.from_bytes(hashlib.md5(t.encode()).digest()[8:], "little")
            for t in vocab
        ],
        dtype=np.uint64,
    )
    shifts = np.arange(dim, dtype=np.uint64)
    signs = (
        ((h[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int64)
        * 2
        - 1
    )  # (V, dim)
    idx = d.indices.to_numpy(zero_copy_only=False)
    par = parent.to_numpy(zero_copy_only=False)
    n = batch.num_rows
    emb = np.empty((n, dim), dtype=np.int64)
    for j in range(dim):  # dim bincounts, each vectorized over tokens
        emb[:, j] = np.bincount(
            par, weights=signs[idx, j], minlength=n
        ).astype(np.int64)
    has_tok = np.zeros(n, dtype=bool)
    has_tok[par] = True
    ids = (
        batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    )[has_tok]
    emb = emb[has_tok]
    return pa.table(
        {
            id_col: pa.array(ids, pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(emb.ravel(), pa.int64()), dim
            ),
        }
    )


def hash_embed(
    ds, dim: int = 32, text_col: str = "text", id_col: str = "doc_id"
):
    """documents → (doc_id, embedding): one streaming ``map_batches``
    pass, no shuffle, no model — the deterministic text-side entry into
    the embedding stack (`simsearch.knn_graph` / `semantic_dedup` /
    `knn_*` all accept the int64 list column and normalize to float64),
    closing the text → embedding → near-dup/cluster loop in-engine."""
    return ds.map_batches(
        lambda b: hash_embed_batch(b, dim=dim, text_col=text_col, id_col=id_col),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# logistic-regression quality/langid classifier training (full-batch GD)
# ---------------------------------------------------------------------------

def _doc_feat_incidence(
    batch: pa.Table, num_feats: int, text_col: str
) -> tuple[np.ndarray, np.ndarray]:
    """→ (doc_row_idx, feat_id) pairs, DISTINCT per (doc, feat) —
    binary hashed-unigram features, rows sorted by doc_row_idx."""
    if batch.num_rows == 0:  # schema-less empty blocks (CLAUDE.md rule)
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    flat, parent = _tokens(batch, text_col)
    feats = _feat_ids(flat, num_feats)
    par = parent.to_numpy(zero_copy_only=False).astype(np.int64)
    if not len(par):
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    order = np.lexsort((feats, par))
    p, f = par[order], feats[order]
    keep = np.empty(len(p), dtype=bool)
    keep[0] = True
    keep[1:] = (p[1:] != p[:-1]) | (f[1:] != f[:-1])
    return p[keep], f[keep]


def logreg_prepare(
    batch: pa.Table,
    num_feats: int,
    target,
    text_col: str = "text",
    label_col: str = "lang",
) -> dict:
    """Tokenize/hash ONCE per block (features don't change across
    epochs — caching the incidence is the 10× of the epoch loop):
    returns the cached arrays every epoch's gradient needs."""
    p, f = _doc_feat_incidence(batch, num_feats, text_col)
    if not len(p):
        return {"n": 0}
    starts = np.flatnonzero(np.diff(p, prepend=np.int64(-1)))
    doc_rows = p[starts]
    y = (
        pc.equal(batch[label_col], target)
        .to_numpy(zero_copy_only=False)
        .astype(np.float64)
    )[doc_rows]
    forder = np.argsort(f, kind="stable")
    fs = f[forder]
    return {
        "n": len(doc_rows),
        "f": f,
        "starts": starts,
        "pair_doc": np.searchsorted(doc_rows, p),
        "forder": forder,
        "fs": fs,
        "fstarts": np.flatnonzero(np.diff(fs, prepend=np.int64(-1))),
        "y": y,
    }


def logreg_grad_prepared(
    prep: dict, w_micros: np.ndarray, num_feats: int
) -> tuple[np.ndarray, int]:
    """One block's full-batch gradient partial under the CURRENT integer
    weights from the cached incidence: per doc, margin = (Σ w[f] +
    bias)/1e6, err_micros = rint((σ(margin) − y)·1e6).  Every doc's
    contribution is a pure function of (doc, w) ⇒ int64 partial sums
    are partition-invariant (the k-means argument), which is what makes
    the sequential same-math golden a valid oracle."""
    grad = np.zeros(num_feats + 1, dtype=np.int64)
    if not prep["n"]:
        return grad, 0
    msum = np.add.reduceat(w_micros[prep["f"]], prep["starts"])
    margin = (msum + int(w_micros[num_feats])) / 1e6
    sig = 1.0 / (1.0 + np.exp(-margin))
    err = np.rint((sig - prep["y"]) * 1e6).astype(np.int64)
    err_per_pair = err[prep["pair_doc"]]
    grad[prep["fs"][prep["fstarts"]]] = np.add.reduceat(
        err_per_pair[prep["forder"]], prep["fstarts"]
    )
    grad[num_feats] = int(err.sum())
    return grad, prep["n"]


def logreg_epoch_grad(
    batch: pa.Table,
    w_micros: np.ndarray,
    num_feats: int,
    target,
    text_col: str = "text",
    label_col: str = "lang",
) -> tuple[np.ndarray, int]:
    """prepare + gradient in one call (the uncached form; the trainers
    cache `logreg_prepare` across epochs)."""
    return logreg_grad_prepared(
        logreg_prepare(batch, num_feats, target, text_col, label_col),
        w_micros,
        num_feats,
    )


def logreg_train_tables(
    tables: list[pa.Table],
    epochs: int = 32,
    lr_micros: int = 8_000_000,
    num_feats: int = 1024,
    target="en",
    text_col: str = "text",
    label_col: str = "lang",
) -> pa.Table:
    """Sequential same-math trainer over in-memory Arrow blocks — the
    golden builder AND the driver-side finish share this loop."""
    preps = [
        logreg_prepare(t, num_feats, target, text_col, label_col)
        for t in tables
    ]
    w = np.zeros(num_feats + 1, dtype=np.int64)
    for _ in range(epochs):
        grad = np.zeros(num_feats + 1, dtype=np.int64)
        n = 0
        for prep in preps:
            g, m = logreg_grad_prepared(prep, w, num_feats)
            grad += g
            n += m
        if not n:
            break
        # python-int update: exact at any corpus size (grad ≤ n·1e6)
        denom = n * 1_000_000
        w -= np.array(
            [(lr_micros * int(g)) // denom for g in grad.tolist()],
            dtype=np.int64,
        )
    return pa.table(
        {
            "feat": pa.array(np.arange(num_feats + 1), pa.int64()),
            "weight_micros": pa.array(w, pa.int64()),
        }
    )


def logreg_train(
    ds,
    epochs: int = 32,
    lr_micros: int = 8_000_000,
    num_feats: int = 1024,
    target="en",
    text_col: str = "text",
    label_col: str = "lang",
    driver_max_docs: int = 200_000,
):
    """documents → (feat, weight_micros)[num_feats+1] (bias last):
    full-batch gradient-descent logistic regression on binary hashed
    unigram features predicting ``label == target`` — the
    CCNet/fastText-style quality-classifier TRAINING loop, in-engine
    (``nb_train`` counts, ``clf_score``/``dsir`` apply fixed weights;
    this one fits weights).

    Scale shape: blocks materialized ONCE; each epoch is a plain-task
    fan-out (the k-means precedent — no per-epoch Dataset job fixed
    cost) computing int64 gradient partials under the broadcast
    integer weight vector, tree-summed on the driver; the update runs
    in python ints (exact at any corpus size).  Weights are
    (num_feats+1)-sized broadcast state — the documented vocab-sized
    boundary shared with dsir/bpe.  Partition-invariant ⇒ the
    sequential `logreg_train_tables` golden is a valid oracle."""
    import ray
    import ray.data

    ds = ds.materialize()
    if ds.count() <= driver_max_docs:
        # adaptive driver-local finish (partition-invariance makes it
        # bit-identical to the epoch fan-out; forced-path-test pinned)
        tables = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
        return ray.data.from_arrow(
            logreg_train_tables(
                tables,
                epochs=epochs,
                lr_micros=lr_micros,
                num_feats=num_feats,
                target=target,
                text_col=text_col,
                label_col=label_col,
            )
        )
    blocks = [r for r in ds.to_arrow_refs()]

    @ray.remote(num_cpus=1)
    def prepare(tbl: pa.Table):
        return logreg_prepare(tbl, num_feats, target, text_col, label_col)

    @ray.remote(num_cpus=1)
    def part(prep: dict, w: np.ndarray):
        return logreg_grad_prepared(prep, w, num_feats)

    # tokenize/hash once; epochs reuse the cached incidence refs
    prep_refs = [prepare.remote(b) for b in blocks]
    w = np.zeros(num_feats + 1, dtype=np.int64)
    for _ in range(epochs):
        w_ref = ray.put(w)
        outs = ray.get([part.remote(pr, w_ref) for pr in prep_refs])
        grad = np.zeros(num_feats + 1, dtype=np.int64)
        n = 0
        for g, m in outs:
            grad += g
            n += m
        if not n:
            break
        denom = n * 1_000_000
        w = w - np.array(
            [(lr_micros * int(g)) // denom for g in grad.tolist()],
            dtype=np.int64,
        )
    return ray.data.from_arrow(
        pa.table(
            {
                "feat": pa.array(np.arange(num_feats + 1), pa.int64()),
                "weight_micros": pa.array(w, pa.int64()),
            }
        )
    )


def logreg_margins(
    ds,
    weights: pa.Table,
    num_feats: int = 1024,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """documents × trained weights → (doc_id, margin_micros, pred):
    pure-integer scoring pass (margin = Σ w[f] + bias over the doc's
    DISTINCT hashed features) — broadcast weights, one streaming
    ``map_batches``, and because margins are exact ints the SQL oracle
    recomputes them independently from the weight golden."""
    import ray

    w = np.zeros(num_feats + 1, dtype=np.int64)
    w[weights["feat"].to_numpy(zero_copy_only=False)] = weights[
        "weight_micros"
    ].to_numpy(zero_copy_only=False)
    w_ref = ray.put(w)

    def score(batch: pa.Table) -> pa.Table:
        ww = ray.get(w_ref)
        p, f = _doc_feat_incidence(batch, num_feats, text_col)
        if not len(p):
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "margin_micros": pa.array([], pa.int64()),
                    "pred": pa.array([], pa.bool_()),
                }
            )
        starts = np.flatnonzero(np.diff(p, prepend=np.int64(-1)))
        doc_rows = p[starts]
        margin = np.add.reduceat(ww[f], starts) + int(ww[num_feats])
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(
            np.int64
        )[doc_rows]
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "margin_micros": pa.array(margin, pa.int64()),
                "pred": pa.array(margin > 0, pa.bool_()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


def label_quality_batch(
    batch: pa.Table, threshold: float = 0.06, text_col: str = "text"
) -> pa.Table:
    """Append ``is_quality = stopword_ratio ≥ threshold`` — the
    rule-based quality filter the logreg classifier DISTILLS (the
    fastText-classifier-on-rule-labels practice; ratio from
    `textstats.quality_batch`, exact single division)."""
    from .textstats import quality_batch

    q = quality_batch(batch, text_col=text_col)
    return batch.append_column(
        "is_quality", pc.greater_equal(q["stopword_ratio"], threshold)
    )


def clf_calibration(
    ds,
    weights: pa.Table,
    width_micros: int = 2_000_000,
    lo: int = -5,
    hi: int = 5,
    num_feats: int = 1024,
    text_col: str = "text",
):
    """Calibration table of the TRAINED classifier against the rule
    label it distills — the classifier-QA step every
    model-filtered-corpus pipeline needs (does score X actually mean
    quality-probability Y?): bucket the integer margin into fixed
    ``width_micros`` bands clamped to [lo, hi] →
    ``(bucket, n_docs, n_quality, quality_ppm)``.

    A well-calibrated distillation shows quality_ppm rising
    monotonically through bucket 0 (the decision boundary); a flat or
    inverted band localizes where the classifier disagrees with the
    rule — the margin range to route to human/LLM re-labeling.

    EXACTNESS: margins are the pure-integer `logreg_margins` scores,
    the label is the `label_quality_batch` rule (single exact
    division ≥ threshold), bucket = FLOOR division (numpy ``//``,
    mirrored as ``FLOOR(m / w)`` in SQL — DuckDB's integer ``//``
    truncates, so the oracle floors in double where the quotient is
    exactly representable), and quality_ppm is one exact integer
    division — the whole table rebuilds in SQL from the weight
    golden.  Shape: ONE streaming pass (margin + label per batch from
    the broadcast weight vector), per-batch combiner to ≤ (hi−lo+1)
    partial rows, driver finish over blocks×buckets rows.  Docs with
    zero in-vocab features are unscored and excluded (the
    `logreg_margins` domain)."""
    import ray

    w = np.zeros(num_feats + 1, dtype=np.int64)
    w[weights["feat"].to_numpy(zero_copy_only=False)] = weights[
        "weight_micros"
    ].to_numpy(zero_copy_only=False)
    w_ref = ray.put(w)
    lo_i, hi_i = np.int64(lo), np.int64(hi)
    width = np.int64(width_micros)

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "bucket": pa.array([], pa.int64()),
                "n_docs": pa.array([], pa.int64()),
                "n_quality": pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0 or text_col not in batch.column_names:
            return empty
        ww = ray.get(w_ref)
        p, f = _doc_feat_incidence(batch, num_feats, text_col)
        if not len(p):
            return empty
        starts = np.flatnonzero(np.diff(p, prepend=np.int64(-1)))
        doc_rows = p[starts]
        margin = np.add.reduceat(ww[f], starts) + int(ww[num_feats])
        labels = (
            label_quality_batch(batch, text_col=text_col)["is_quality"]
            .to_numpy(zero_copy_only=False)[doc_rows]
        )
        bucket = np.clip(margin // width, lo_i, hi_i)
        # combiner: counts per (bucket, label) — ≤ 2·(hi−lo+1) rows
        key = bucket * 2 + labels
        uniq, cnt = np.unique(key, return_counts=True)
        ub = uniq // 2
        ul = (uniq % 2).astype(bool)
        ob = np.unique(ub)
        n_docs = np.zeros(len(ob), np.int64)
        n_q = np.zeros(len(ob), np.int64)
        pos = np.searchsorted(ob, ub)
        np.add.at(n_docs, pos, cnt)
        np.add.at(n_q, pos, cnt * ul)
        return pa.table(
            {
                "bucket": pa.array(ob, pa.int64()),
                "n_docs": pa.array(n_docs, pa.int64()),
                "n_quality": pa.array(n_q, pa.int64()),
            }
        )

    parts = [
        t
        for t in ray.get(
            ds.map_batches(partial, batch_format="pyarrow").to_arrow_refs()
        )
        if t.num_rows and "bucket" in t.column_names
    ]
    if not parts:
        return pa.table(
            {
                "bucket": pa.array([], pa.int64()),
                "n_docs": pa.array([], pa.int64()),
                "n_quality": pa.array([], pa.int64()),
                "quality_ppm": pa.array([], pa.int64()),
            }
        )
    cat = pa.concat_tables(parts)
    agg = cat.group_by("bucket").aggregate(
        [("n_docs", "sum"), ("n_quality", "sum")]
    )
    agg = agg.sort_by([("bucket", "ascending")])
    nd = agg["n_docs_sum"].to_numpy(zero_copy_only=False)
    nq = agg["n_quality_sum"].to_numpy(zero_copy_only=False)
    return pa.table(
        {
            "bucket": agg["bucket"],
            "n_docs": pa.array(nd, pa.int64()),
            "n_quality": pa.array(nq, pa.int64()),
            "quality_ppm": pa.array(nq * 1_000_000 // nd, pa.int64()),
        }
    )

"""Curation-chain invariants (pipelines/curate.py).

The value-exact check vs DuckDB runs in tools/check_queries.py
(doc_curate / doc_curate_output / doc_curate_funnel); these tests pin
the chain's STRUCTURAL invariants at sf0.001 so a refactor can't
silently break the keep semantics the oracle only observes in
aggregate.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import pytest

SF = "/root/testdata/sf0.001"


def _collect(ds) -> pa.Table:
    import ray

    if isinstance(ds, pa.Table):
        return ds
    tbls = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
    return pa.concat_tables(tbls)


@pytest.fixture(scope="module")
def decisions(ray_session):
    import ray.data

    from crawler_ai_ray.pipelines.curate import curate_decisions

    docs = ray.data.read_parquet(
        f"{SF}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    return _collect(curate_decisions(docs))


def test_decisions_cover_every_doc(decisions):
    import pyarrow.parquet as pq

    n_docs = pq.ParquetFile(f"{SF}/documents.parquet").metadata.num_rows
    assert decisions.num_rows == n_docs
    assert len(set(decisions["doc_id"].to_pylist())) == n_docs


def test_keep_implications(decisions):
    """kept ⊆ exact_keep ⊆ (quality ∧ repetition) — the funnel only
    narrows."""
    q = decisions["quality_keep"].to_pylist()
    r = decisions["repetition_keep"].to_pylist()
    e = decisions["exact_keep"].to_pylist()
    k = decisions["kept"].to_pylist()
    for qi, ri, ei, ki in zip(q, r, e, k):
        if ki:
            assert ei, "kept doc must be its exact-dedup keeper"
        if ei:
            assert qi and ri, "exact keeper must be a stage-1 survivor"


def test_kept_is_one_per_cluster(decisions, ray_session):
    """Among stage-1 survivors, the kept set is exactly the canonical
    (min doc_id) of each MinHash cluster — cross-checked against the
    standalone cluster-label operator on the survivor subset."""
    import ray.data

    from crawler_ai_ray.stages.dedup import minhash_cluster_labels

    surv_ids = {
        d
        for d, q, r in zip(
            decisions["doc_id"].to_pylist(),
            decisions["quality_keep"].to_pylist(),
            decisions["repetition_keep"].to_pylist(),
        )
        if q and r
    }
    docs = ray.data.read_parquet(
        f"{SF}/documents.parquet", columns=["doc_id", "text"]
    ).filter(lambda row: row["doc_id"] in surv_ids)
    labels = _collect(
        minhash_cluster_labels(docs, docs, n=3, threshold=0.8)
    )
    canonical = {
        d
        for d, c in zip(
            labels["doc_id"].to_pylist(),
            labels["is_canonical"].to_pylist(),
        )
        if c
    }
    kept = {
        d
        for d, k in zip(
            decisions["doc_id"].to_pylist(),
            decisions["kept"].to_pylist(),
        )
        if k
    }
    assert kept == canonical


def test_output_matches_kept_and_is_scrubbed(decisions, ray_session):
    import re

    import ray.data

    from crawler_ai_ray.pipelines.curate import (
        curate_decisions,
        curate_output,
    )
    from crawler_ai_ray.stages.textstats import PII_EMAIL_RE

    docs_full = ray.data.read_parquet(
        f"{SF}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    docs_txt = ray.data.read_parquet(
        f"{SF}/documents.parquet", columns=["doc_id", "text"]
    )
    out = _collect(curate_output(docs_txt, curate_decisions(docs_full)))
    n_kept = sum(decisions["kept"].to_pylist())
    assert out.num_rows == n_kept
    email = re.compile(PII_EMAIL_RE)
    for t in out["text_redacted"].to_pylist():
        assert not email.search(t)


def test_funnel_consistent_with_decisions(decisions, ray_session):
    import ray.data

    from crawler_ai_ray.pipelines.curate import (
        curate_decisions,
        curate_funnel,
    )

    docs = ray.data.read_parquet(
        f"{SF}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    funnel = curate_funnel(curate_decisions(docs))
    assert funnel["n_docs"][0].as_py() == decisions.num_rows
    assert funnel["n_kept"][0].as_py() == sum(
        decisions["kept"].to_pylist()
    )
    assert (
        funnel["n_docs"][0].as_py()
        >= funnel["n_quality_keep"][0].as_py()
        >= funnel["n_stage1_keep"][0].as_py()
        >= funnel["n_exact_keep"][0].as_py()
        >= funnel["n_kept"][0].as_py()
    )


def test_curate_resume_skips_finished_stages(ray_session, tmp_path):
    import json
    import os

    from crawler_ai_ray.api import curate
    from crawler_ai_ray.sources.synth import ensure_corpus

    ensure_corpus(SF)  # warm any corpus deps
    docs = f"{SF}/documents.parquet"
    out = str(tmp_path / "cur")
    f1 = curate(docs, out, num_buckets=16)
    dec_file_mtimes = {
        f: os.path.getmtime(os.path.join(out, "decisions", f))
        for f in os.listdir(os.path.join(out, "decisions"))
    }
    # full re-run with resume: cheap no-op, same funnel
    f2 = curate(docs, out, num_buckets=16, resume=True)
    assert f1 == f2
    for f, m in dec_file_mtimes.items():
        assert os.path.getmtime(os.path.join(out, "decisions", f)) == m

    # crash between stages: corpus missing, decisions finished —
    # resume rebuilds only the corpus stage (decisions untouched)
    import shutil

    shutil.rmtree(os.path.join(out, "corpus"))
    os.remove(os.path.join(out, "corpus.done"))
    os.remove(os.path.join(out, "funnel.json"))
    f3 = curate(docs, out, num_buckets=16, resume=True)
    assert f3 == f1
    assert os.path.exists(os.path.join(out, "corpus.done"))
    for f, m in dec_file_mtimes.items():
        assert os.path.getmtime(os.path.join(out, "decisions", f)) == m
    assert json.load(open(os.path.join(out, "funnel.json"))) == f1


def test_curate_pages_planted_rules_and_partition_invariance(ray_session):
    """Crawl-side curation chain: each rule fires on its planted page
    (dup detected only AFTER the host template is removed), and the
    decision set is invariant to input partitioning / bucket count."""
    import ray.data

    from crawler_ai_ray.pipelines.curate import curate_pages

    tmpl = " ".join(f"t{i}" for i in range(10))  # one aligned 10-word seg

    def body(tag: str) -> str:  # 40 distinct all-alpha filler words
        return " ".join(
            f"{tag}{a}{b}word" for a in "abcdefgh" for b in "abcde"
        )

    rows = [
        {"url": "http://a.com/p0", "host": "a.com",
         "text_crawldata": f"{tmpl} {body('a')}"},
        {"url": "http://a.com/p1", "host": "a.com",
         "text_crawldata": f"{tmpl} {body('b')}"},
        # p2/p3 identical only after the template is stripped
        {"url": "http://a.com/p2", "host": "a.com",
         "text_crawldata": f"{tmpl} {body('c')}"},
        # p3 carries the template TWICE, so its RAW text differs from
        # p2 and the dup is only visible after boilerplate removal
        {"url": "http://a.com/p3", "host": "a.com",
         "text_crawldata": f"{tmpl} {tmpl} {body('c')}"},
        {"url": "http://a.com/p4", "host": "a.com",
         "text_crawldata": "too short"},
        {"url": "http://a.com/p5", "host": "a.com",
         "text_crawldata": " ".join(str(i) for i in range(40))},
        # digit-heavy but alpha-majority: >10% digits, ≥50% alpha chars
        {"url": "http://a.com/p6", "host": "a.com",
         "text_crawldata": " ".join(f"abcdefgh{i}{i}" for i in range(30))},
    ]
    ds = ray.data.from_items(rows)
    got = (
        curate_pages(ds)
        .to_pandas()
        .sort_values("url", ignore_index=True)
        .set_index("url")
    )
    assert bool(got.loc["http://a.com/p0", "keep"])
    assert got.loc["http://a.com/p2", "reason"] == "kept"
    assert got.loc["http://a.com/p3", "reason"] == "dup"
    assert got.loc["http://a.com/p3", "dup_of"] == "http://a.com/p2"
    assert got.loc["http://a.com/p4", "reason"] == "short"
    assert got.loc["http://a.com/p5", "reason"] == "low_alpha"
    assert got.loc["http://a.com/p6", "reason"] == "digit_heavy"
    assert not bool(got.loc["http://a.com/p6", "keep"])

    again = (
        curate_pages(ds.repartition(4), num_buckets=8)
        .to_pandas()
        .sort_values("url", ignore_index=True)
        .set_index("url")
    )
    assert got.equals(again)

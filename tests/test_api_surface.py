"""User-extension surface (SURVEY §2.11): extractor registry, UDF
registration, pipeline builder, typed crawl entry, CLI."""

from __future__ import annotations

import os
import subprocess
import sys

import pyarrow as pa
import pytest

from crawler_ai_ray.api import (
    EXTRACTORS,
    PagesPipeline,
    crawl,
    extractor,
    register_extractor,
)


def test_builtins_registered():
    for name in ("pages", "jobs", "page_meta", "nav_links", "sitemap_jobs",
                 "career_confidence", "link_scores"):
        assert name in EXTRACTORS


def test_udf_registration_and_decorator():
    register_extractor("upper_urls", lambda b: b)
    assert EXTRACTORS["upper_urls"]

    @extractor("count_rows")
    def count_rows(batch: pa.Table) -> pa.Table:
        return pa.table({"n": pa.array([batch.num_rows], pa.int64())})

    assert EXTRACTORS["count_rows"] is count_rows


@pytest.mark.usefixtures("ray_session")
def test_pipeline_builder(unit_corpus, tmp_path):
    out = str(tmp_path / "meta")
    (
        PagesPipeline(os.path.join(unit_corpus, "pages.parquet"))
        .extract("page_meta")
        .filter("links > 0")
        .write(out)
    )
    import pyarrow.dataset as pads

    t = pads.dataset(out, format="parquet").to_table()
    assert t.num_rows > 0
    assert "m4_description" in t.column_names


@pytest.mark.usefixtures("ray_session")
def test_pipeline_builder_udf(unit_corpus):
    @extractor("n_links_only")
    def n_links_only(batch: pa.Table) -> pa.Table:
        from crawler_ai_ray.functions.htmltext import parse_page

        counts = [
            len(parse_page(h.decode("utf-8", "ignore")).anchors)
            for h in batch["html"].to_pylist()
        ]
        return pa.table(
            {"url": batch["url"], "n_anchors": pa.array(counts, pa.int64())}
        )

    df = (
        PagesPipeline(os.path.join(unit_corpus, "pages.parquet"))
        .extract("n_links_only")
        .dataset()
        .to_pandas()
    )
    assert (df["n_anchors"] >= 0).all() and len(df) > 0


@pytest.mark.usefixtures("ray_session")
def test_typed_crawl_entry(unit_corpus, tmp_path):
    totals = crawl(
        unit_corpus, str(tmp_path / "c"), seen_shards=2, store_shards=2,
        buckets=4, default_wave=1, max_rounds=2,
    )
    assert totals["rounds"] == 2 and totals["fetched"] > 0


def test_cli_help_runs():
    r = subprocess.run(
        [sys.executable, "-m", "crawler_ai_ray.cli", "--help"],
        capture_output=True, text=True, timeout=60,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert r.returncode == 0 and "crawl" in r.stdout


@pytest.mark.usefixtures("ray_session")
def test_typed_curate_entry(tmp_path):
    import json

    from crawler_ai_ray.api import curate

    out = str(tmp_path / "cur")
    funnel = curate(
        "/root/testdata/sf0.001/documents.parquet", out, num_buckets=8
    )
    assert funnel["n_docs"] >= funnel["n_kept"] > 0
    assert os.path.isdir(os.path.join(out, "decisions"))
    # curated corpus is hive-partitioned by predicted language
    parts = os.listdir(os.path.join(out, "corpus"))
    assert parts and all(p.startswith("pred_lang=") for p in parts)
    with open(os.path.join(out, "funnel.json")) as f:
        assert json.load(f) == funnel


def test_export_jsonl_roundtrip(tmp_path):
    import duckdb

    from crawler_ai_ray.api import export_jsonl

    src = "/root/testdata/sf0.001/documents.parquet"
    out = str(tmp_path / "jsonl")
    manifest = export_jsonl(src, out, columns=["doc_id", "lang", "n_chars"])
    assert manifest["rows"] == 500 and manifest["files"] >= 1

    got = duckdb.sql(
        f"SELECT doc_id, lang, n_chars FROM read_json_auto('{out}/*.json') "
        "ORDER BY doc_id"
    ).df()
    want = duckdb.sql(
        f"SELECT doc_id, lang, n_chars FROM read_parquet('{src}') "
        "ORDER BY doc_id"
    ).df()
    assert got.equals(want)

    # resume: a finished export is a no-op returning the manifest
    assert export_jsonl(src, out, resume=True) == manifest


def test_dedup_entry_methods(ray_session, tmp_path):
    """api.dedup: every method writes parquet and its rows agree with
    the corresponding queries() kernel semantics (spans rebuild equals
    dup_span_removal run directly)."""
    import duckdb

    from crawler_ai_ray.api import dedup

    src = "/root/testdata/sf0.001/documents.parquet"
    summary = dedup(src, str(tmp_path / "exact"), method="exact")
    assert summary["rows"] == 500

    summary = dedup(src, str(tmp_path / "spans"), method="spans")
    assert summary["rows"] == 500
    import pyarrow.parquet as pq
    import ray.data

    from crawler_ai_ray.stages.dedup import dup_span_removal

    got = duckdb.sql(
        f"SELECT * FROM read_parquet('{tmp_path}/spans/*.parquet') "
        "ORDER BY doc_id"
    ).df()
    want = (
        dup_span_removal(
            ray.data.read_parquet(src, columns=["doc_id", "text"])
        )
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    assert got.clean_text.tolist() == want.clean_text.tolist()

    pairs = dedup(src, str(tmp_path / "winnow"), method="winnow")
    assert pairs["rows"] > 0


def test_graph_entry_methods(ray_session, tmp_path):
    """api.graph: kernels write parquet with the expected shapes; the
    pagerank output equals the stage run directly; seed-requiring
    methods refuse to run without seeds."""
    import pyarrow.parquet as pq
    import pytest
    import ray.data

    from crawler_ai_ray.api import graph
    from crawler_ai_ray.sources.synth import ensure_corpus
    from crawler_ai_ray.stages.extract import extract_links
    from crawler_ai_ray.stages.linkgraph import host_edges, pagerank_hosts

    corpus = ensure_corpus("/root/testdata/sf0.001")
    pages = f"{corpus}/pages.parquet"
    s = graph(pages, str(tmp_path / "pr"), method="pagerank")
    assert s["rows"] > 0
    got = (
        pq.read_table(str(tmp_path / "pr"))
        .to_pandas()
        .sort_values("host", ignore_index=True)
    )
    ds = ray.data.read_parquet(pages, columns=["url", "html"])
    want = (
        pagerank_hosts(host_edges(extract_links(ds)))
        .to_pandas()
        .sort_values("host", ignore_index=True)
    )
    assert got.equals(want)

    s2 = graph(
        pages, str(tmp_path / "tr"), method="trustrank",
        seeds=[str(want.host.iloc[0])],
    )
    assert s2["rows"] == s["rows"]
    s3 = graph(pages, str(tmp_path / "nf"), method="neighborhood")
    assert s3["rows"] == 9
    s4 = graph(pages, str(tmp_path / "salsa"), method="salsa")
    assert s4["rows"] > 0
    s5 = graph(pages, str(tmp_path / "bt"), method="bowtie")
    bt = pq.read_table(str(tmp_path / "bt"))
    assert s5["rows"] == bt.num_rows and set(
        bt.column_names
    ) == {"host", "fw_dist", "bw_dist", "region"}
    with pytest.raises(ValueError, match="requires --seeds"):
        graph(pages, str(tmp_path / "x"), method="bfs")
    with pytest.raises(ValueError, match="unknown graph method"):
        graph(pages, str(tmp_path / "y"), method="nope")


def test_export_parquet_partitioned_resume(ray_session, tmp_path):
    """Partition-granular resumable parquet sink: full export equals
    the source; deleting some partitions + markers and resuming
    rewrites ONLY the missing ones; finished partitions are skipped."""
    import glob
    import json
    import os

    import pyarrow.parquet as pq

    from crawler_ai_ray.api import export_parquet_partitioned
    from crawler_ai_ray.sources.synth import ensure_corpus

    corpus = ensure_corpus("/root/testdata/sf0.001")
    docs = f"{corpus}/pages.parquet"
    out = str(tmp_path / "export")
    m1 = export_parquet_partitioned(
        docs, out, key_col="url", num_partitions=8,
        columns=["url", "lang"],
    )
    src_rows = pq.ParquetFile(docs).metadata.num_rows
    assert m1["rows"] == src_rows and m1["skipped"] == 0
    files = sorted(glob.glob(os.path.join(out, "part-*.parquet")))
    dones = sorted(glob.glob(os.path.join(out, "part-*.done")))
    assert len(files) == len(dones) == m1["partitions"] > 1
    total = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
    assert total == src_rows
    # markers record exact per-partition rows
    for d in dones:
        rec = json.load(open(d))
        f = d.replace(".done", ".parquet")
        assert pq.ParquetFile(f).metadata.num_rows == rec["rows"]

    # simulate a partial failure: drop two partitions
    killed = files[:2]
    before = {
        f: os.path.getmtime(f) for f in files[2:]
    }
    for f in killed:
        os.remove(f)
        os.remove(f.replace(".parquet", ".done"))
    m2 = export_parquet_partitioned(
        docs, out, key_col="url", num_partitions=8,
        columns=["url", "lang"], resume=True,
    )
    assert m2["partitions"] == 2
    assert m2["skipped"] == len(files) - 2
    # untouched partitions were not rewritten
    for f, ts in before.items():
        assert os.path.getmtime(f) == ts
    files2 = sorted(glob.glob(os.path.join(out, "part-*.parquet")))
    assert files2 == files
    total2 = sum(pq.ParquetFile(f).metadata.num_rows for f in files2)
    assert total2 == src_rows
    # full resume over a complete export is a pure no-op
    m3 = export_parquet_partitioned(
        docs, out, key_col="url", num_partitions=8,
        columns=["url", "lang"], resume=True,
    )
    assert m3["partitions"] == 0 and m3["skipped"] == 8


def test_bench_picks_exist_in_queries():
    """Every bench.py operator-suite pick must be a real queries()
    entry — a renamed query would otherwise KeyError the driver's
    BENCH run instead of failing here."""
    import ast
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "entry_for_bench_test", "/root/repo/__ray_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    names = set(mod.queries())

    tree = ast.parse(open("/root/repo/bench.py").read())
    picks = None
    for node in ast.walk(tree):
        if isinstance(node, ast.Assign):
            for t in node.targets:
                if isinstance(t, ast.Name) and t.id == "picks":
                    picks = [
                        c.value
                        for c in node.value.elts
                        if isinstance(c, ast.Constant)
                    ]
    assert picks, "picks list not found in bench.py"
    missing = [p for p in picks if p not in names]
    assert not missing, f"bench picks missing from queries(): {missing}"

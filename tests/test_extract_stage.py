"""Golden end-to-end test for the distributed extraction stage: the Ray
``map_batches`` output must match the corpus golden tables byte-for-byte
(SURVEY.md §5.2 item 1; the `text` column is the north-rule invariant)."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest


@pytest.mark.usefixtures("ray_session")
def test_extract_matches_golden(unit_corpus):
    import ray.data as rd

    from crawler_ai_ray.stages.extract import extract_pages

    ds = rd.read_parquet(os.path.join(unit_corpus, "pages.parquet"))
    out = extract_pages(ds).to_pandas().set_index("url").sort_index()
    golden = (
        pq.read_table(os.path.join(unit_corpus, "golden.parquet"))
        .to_pandas()
        .set_index("url")
        .sort_index()
    )
    assert len(out) == len(golden)
    # byte-identical invariant column
    assert (out["text"] == golden["text"]).all()
    assert (out["text_crawldata"] == golden["text_crawldata"]).all()
    assert (out["title"] == golden["title"]).all()
    for col in ("emails", "phones_loose", "phones_vn", "out_links", "all_links"):
        assert [list(x) for x in out[col]] == [list(x) for x in golden[col]], col
    for col in ("priority", "is_career_listing", "is_job_url", "n_tokens"):
        assert (out[col] == golden[col]).all(), col
    assert (out["career_score"] - golden["career_score"]).abs().max() < 1e-12


@pytest.mark.usefixtures("ray_session")
def test_extract_jobs_matches_golden(unit_corpus):
    import ray.data as rd

    from crawler_ai_ray.stages.extract import extract_jobs

    ds = rd.read_parquet(os.path.join(unit_corpus, "pages.parquet"))
    out = (
        extract_jobs(ds)
        .to_pandas()
        .sort_values(["source_url", "job_index"])
        .reset_index(drop=True)
    )
    golden = (
        pq.read_table(os.path.join(unit_corpus, "jobs_golden.parquet"))
        .to_pandas()
        .sort_values(["source_url", "job_index"])
        .reset_index(drop=True)
    )
    assert len(out) == len(golden)
    for col in ("title", "company", "location", "job_type", "salary",
                "description", "summary", "source"):
        assert (out[col] == golden[col]).all(), col


@pytest.mark.usefixtures("ray_session")
def test_text_projection_equivalent_to_full_extraction():
    """extract_text must produce byte-identical text columns to the
    full extraction (same parser, same assembly)."""
    import ray.data

    from crawler_ai_ray.sources.synth import ensure_corpus
    from crawler_ai_ray.stages.extract import extract_pages, extract_text

    corpus = ensure_corpus("/root/testdata/sf0.001")
    pages = ray.data.read_parquet(
        f"{corpus}/pages.parquet", columns=["url", "html"]
    )
    full = (
        extract_pages(pages)
        .select_columns(["url", "text", "text_crawldata"])
        .to_pandas()
        .sort_values("url", ignore_index=True)
    )
    slim = (
        extract_text(pages)
        .to_pandas()
        .sort_values("url", ignore_index=True)
    )
    assert slim.equals(full)


@pytest.mark.usefixtures("ray_session")
def test_shared_projection_cache_keyed_by_corpus():
    """__ray_entry__'s _shared checkpoint cache must (a) return the
    SAME materialized object for repeat calls over one corpus (the
    extract-once-per-snapshot contract) and (b) never collide across
    corpora (key embeds the resolved corpus path / CORPUS_VERSION)."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as m

    a1 = m._text_base("/root/testdata/sf0.001")
    a2 = m._text_base("/root/testdata/sf0.001")
    assert a1 is a2
    # cached blocks match a fresh (uncached) build byte-for-byte
    key = ("text_base", m._corpus("/root/testdata/sf0.001"))
    fresh_cache = dict(m._PROJ_CACHE)
    del m._PROJ_CACHE[key]
    b = m._text_base("/root/testdata/sf0.001")
    assert b is not a1
    pa1 = a1.to_pandas().sort_values("url", ignore_index=True)
    pb = b.to_pandas().sort_values("url", ignore_index=True)
    assert pa1.equals(pb)
    m._PROJ_CACHE.clear()
    m._PROJ_CACHE.update(fresh_cache)

    e1 = m._host_edges("/root/testdata/sf0.001")
    e2 = m._host_edges("/root/testdata/sf0.001")
    assert e1 is e2

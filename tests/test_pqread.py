"""Row-group-parallel parquet reader: content-exact vs plain
read_parquet, multi-task plan, and the single-row-group fallback."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def rg_file(tmp_path_factory):
    d = tmp_path_factory.mktemp("pqread")
    p = os.path.join(d, "multi.parquet")
    t = pa.table(
        {
            "k": pa.array(range(5000), pa.int64()),
            "v": pa.array([f"row{i}" for i in range(5000)], pa.string()),
        }
    )
    pq.write_table(t, p, row_group_size=512)
    p1 = os.path.join(d, "single.parquet")
    pq.write_table(t, p1)
    return p, p1


@pytest.mark.usefixtures("ray_session")
def test_rowgroup_read_content_exact(rg_file):
    import ray.data

    from crawler_ai_ray.sources.pqread import read_parquet_rowgroups

    p, _ = rg_file
    a = read_parquet_rowgroups(p).to_pandas().sort_values("k").reset_index(drop=True)
    b = ray.data.read_parquet(p).to_pandas().sort_values("k").reset_index(drop=True)
    assert a.equals(b)


@pytest.mark.usefixtures("ray_session")
def test_rowgroup_read_is_parallel(rg_file):
    from crawler_ai_ray.sources.pqread import read_parquet_rowgroups

    p, _ = rg_file
    ds = read_parquet_rowgroups(p).materialize()
    # 5000 rows / 512-row row groups = 10 row groups → 10 read tasks
    assert "RowGroupParquet" in ds.stats()
    assert ds.num_blocks() == 10


@pytest.mark.usefixtures("ray_session")
def test_rowgroup_read_column_pruning(rg_file):
    from crawler_ai_ray.sources.pqread import read_parquet_rowgroups

    p, _ = rg_file
    t = pa.concat_tables(
        __import__("ray").get(
            read_parquet_rowgroups(p, columns=["v"]).to_arrow_refs()
        )
    )
    assert t.column_names == ["v"]
    assert t.num_rows == 5000


@pytest.mark.usefixtures("ray_session")
def test_single_rowgroup_fallback(rg_file):
    from crawler_ai_ray.sources.pqread import read_parquet_rowgroups

    _, p1 = rg_file
    ds = read_parquet_rowgroups(p1)
    assert ds.count() == 5000
    # fallback keeps read_parquet's plan (SplitBlocks), not the datasource
    assert "RowGroupParquet" not in ds.materialize().stats()

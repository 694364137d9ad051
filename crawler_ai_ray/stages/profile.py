"""Table profiling: per-column statistics in one pass + one shuffle.

The data-engineering primitive every ingest pipeline runs first —
row/null counts, exact distinct cardinality, min/max per column — and
a capability the reference exposes piecemeal through its report
aggregates (SURVEY §2.6 A1-A7) generalized to any table.

Scale shape:
* counts/min/max are distributive: each batch collapses to ONE partial
  row per column (a combiner), partials reduce driver-side — no
  shuffle, O(blocks × columns) rows total;
* exact distinct is the only exchange: every column's batch-local
  distinct values union into ONE skinny (col_idx, value) stream,
  bucketed by ``hash(col, value) % num_buckets`` — a (col, value) pair
  lands in exactly one bucket, so per-bucket distinct counts are
  globally exact; ≤ buckets × columns count rows return.  (This is the
  `events_daily_active` two-level distinct generalized across columns
  in a single shuffle.)

Columns are int64-profiled (min/max/distinct over integers keep the
DuckDB oracle bit-exact); a string column profiles via its exact
distinct + null counts with min/max omitted.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["profile_int_columns"]


def profile_int_columns(ds, columns: list[str], num_buckets: int = 64):
    """→ (column, n_rows, n_null, n_distinct, min_v, max_v), one row
    per profiled int column, ordered by column name."""
    cols = sorted(columns)

    def partial(batch: pa.Table) -> pa.Table:
        out = {
            "col_idx": [],
            "n_rows": [],
            "n_null": [],
            "min_v": [],
            "max_v": [],
        }
        for i, c in enumerate(cols):
            arr = batch[c]
            out["col_idx"].append(i)
            out["n_rows"].append(batch.num_rows)
            out["n_null"].append(arr.null_count)
            mm = pc.min_max(arr)
            out["min_v"].append(mm["min"].as_py())
            out["max_v"].append(mm["max"].as_py())
        return pa.table(
            {
                "col_idx": pa.array(out["col_idx"], pa.int32()),
                "n_rows": pa.array(out["n_rows"], pa.int64()),
                "n_null": pa.array(out["n_null"], pa.int64()),
                "min_v": pa.array(out["min_v"], pa.int64()),
                "max_v": pa.array(out["max_v"], pa.int64()),
            }
        )

    def distinct_rows(batch: pa.Table) -> pa.Table:
        parts = []
        for i, c in enumerate(cols):
            vals = pc.unique(pc.drop_null(batch[c]))
            v = pc.cast(vals, pa.int64()).to_numpy(zero_copy_only=False)
            parts.append(
                pa.table(
                    {
                        "col_idx": pa.array(
                            np.full(len(v), i, dtype=np.int32), pa.int32()
                        ),
                        "v": pa.array(v, pa.int64()),
                    }
                )
            )
        t = pa.concat_tables(parts)
        h = (
            t["v"].to_numpy(zero_copy_only=False).astype(np.uint64)
            * np.uint64(0x9E3779B97F4A7C15)
            + t["col_idx"].to_numpy(zero_copy_only=False).astype(np.uint64)
        )
        return t.append_column(
            "bucket",
            pa.array((h % np.uint64(num_buckets)).astype(np.int32), pa.int32()),
        )

    def bucket_distinct(g: pa.Table) -> pa.Table:
        d = g.group_by(["col_idx", "v"]).aggregate([])
        agg = d.group_by("col_idx").aggregate([("v", "count")])
        return pa.table(
            {"col_idx": agg["col_idx"], "n_part": agg["v_count"]}
        )

    import ray

    mat = ds.materialize()
    base_parts = [
        t
        for t in ray.get(
            mat.map_batches(partial, batch_format="pyarrow").to_arrow_refs()
        )
        if t.num_rows
    ]
    dparts = [
        t
        for t in ray.get(
            mat.map_batches(distinct_rows, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(bucket_distinct, batch_format="pyarrow")
            .to_arrow_refs()
        )
        if t.num_rows
    ]
    base = (
        pa.concat_tables(base_parts)
        .group_by("col_idx")
        .aggregate(
            [
                ("n_rows", "sum"),
                ("n_null", "sum"),
                ("min_v", "min"),
                ("max_v", "max"),
            ]
        )
    )
    dist = (
        pa.concat_tables(dparts)
        .group_by("col_idx")
        .aggregate([("n_part", "sum")])
        if dparts
        else pa.table(
            {"col_idx": pa.array([], pa.int32()), "n_part_sum": pa.array([], pa.int64())}
        )
    )
    joined = base.join(dist, keys="col_idx", join_type="left outer")
    idx = joined["col_idx"].to_numpy(zero_copy_only=False)
    order = np.argsort(idx)
    joined = joined.take(pa.array(order))
    return pa.table(
        {
            "column": pa.array(
                [cols[i] for i in joined["col_idx"].to_pylist()],
                pa.string(),
            ),
            "n_rows": pc.cast(joined["n_rows_sum"], pa.int64()),
            "n_null": pc.cast(joined["n_null_sum"], pa.int64()),
            "n_distinct": pc.cast(
                pc.coalesce(joined["n_part_sum"], 0), pa.int64()
            ),
            "min_v": pc.cast(joined["min_v_min"], pa.int64()),
            "max_v": pc.cast(joined["max_v_max"], pa.int64()),
        }
    )

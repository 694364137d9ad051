"""Crawl-snapshot delta: what changed between two crawls of the same
url space — the incremental-recrawl primitive (a CommonCrawl-style
monthly-snapshot diff, and the scheduling signal a recrawl prioritizer
consumes: re-fetch `changed` hosts sooner, drop `removed` ones).

Reference parity: the reference re-crawls a site and overwrites its
per-company JSON report (app/services/crawler.py history handling,
main.py report sink); diffing two report generations is the batch
generalization of that per-site freshness check.

Scale shape (100 TB framing):

* page TEXT never shuffles — each side reduces per batch to
  (url, fp) where fp is a 32-hex md5 of the content (16 bytes vs ~50 KB
  mean page text, a ~3000× exchange-volume cut);
* one bucketed shuffle on ``crc32(url) % num_buckets`` co-locates a
  url's two sides exactly (a url lives in one bucket), then Arrow's
  C++ ``full outer`` join + vectorized null/equality kernels classify
  inside each bucket task;
* the join key inside the bucket is the url STRING, so two urls
  colliding into one bucket (or even one crc32 value) can never
  mis-pair — bucketing only places rows, it never decides matches;
* output is the DELTA only (added / removed / changed) — snapshot-
  sized input, delta-sized output, so the result streams to a sink
  without ever materializing the common (`same`) majority.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["snapshot_diff", "snapshot_diff_tagged", "TAGGED_SCHEMA"]

TAGGED_SCHEMA = pa.schema(
    [
        ("bucket", pa.int32()),
        ("key", pa.string()),
        ("fp", pa.string()),
        ("is_a", pa.bool_()),
    ]
)

_DIFF_SCHEMA = pa.schema(
    [("url", pa.string()), ("status", pa.string())]
)


def _empty_diff() -> pa.Table:
    return pa.table(
        {"url": pa.array([], pa.string()), "status": pa.array([], pa.string())}
    )


def snapshot_diff(ds_a, ds_b, key_col: str = "url", fp_col: str = "fp",
                  num_buckets: int = 64):
    """old snapshot ``ds_a`` vs new snapshot ``ds_b`` (each
    (key_col, fp_col) rows, key unique per side) → (url, status) with
    status ∈ {added, removed, changed}; unchanged keys emit nothing.
    """
    import ray

    def tag(is_a: bool):
        def fn(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:  # Ray emits schema-less empty blocks
                return pa.table(
                    {
                        "bucket": pa.array([], pa.int32()),
                        "key": pa.array([], pa.string()),
                        "fp": pa.array([], pa.string()),
                        "is_a": pa.array([], pa.bool_()),
                    }
                )
            keys = batch[key_col].to_pylist()
            bk = np.array(
                [zlib.crc32(k.encode()) % num_buckets for k in keys],
                dtype=np.int32,
            )
            return pa.table(
                {
                    "bucket": pa.array(bk, pa.int32()),
                    "key": pc.cast(batch[key_col], pa.string()),
                    "fp": pc.cast(batch[fp_col], pa.string()),
                    "is_a": pa.array(
                        np.full(batch.num_rows, is_a), pa.bool_()
                    ),
                }
            )

        return fn

    both = ds_a.map_batches(tag(True), batch_format="pyarrow").union(
        ds_b.map_batches(tag(False), batch_format="pyarrow")
    )
    return snapshot_diff_tagged(both, num_buckets=num_buckets)


def snapshot_diff_tagged(both, num_buckets: int = 64):
    """Diff over a PRE-TAGGED union: rows in ``TAGGED_SCHEMA``
    (bucket = crc32(key) % num_buckets, is_a marks the old side).

    Split out so callers that derive BOTH snapshots from one upstream
    pass (e.g. two selector views of the same crawl output) can emit
    the tagged union in a single ``map_batches`` — consuming a lazy
    Dataset through two branch pipelines recomputes the whole upstream
    per branch (Ray Datasets have no cross-consumer caching)."""

    def diff_bucket(g: pa.Table) -> pa.Table:
        mask = g["is_a"]
        a = g.filter(mask).select(["key", "fp"]).rename_columns(
            ["url", "fp_a"]
        )
        b = g.filter(pc.invert(mask)).select(["key", "fp"]).rename_columns(
            ["url", "fp_b"]
        )
        j = a.join(b, keys="url", join_type="full outer")
        added = pc.is_null(j["fp_a"])
        removed = pc.is_null(j["fp_b"])
        status = pc.if_else(
            added,
            "added",
            pc.if_else(
                removed,
                "removed",
                pc.if_else(
                    pc.not_equal(j["fp_a"], j["fp_b"]), "changed", "same"
                ),
            ),
        )
        out = pa.table({"url": j["url"], "status": status})
        return out.filter(pc.not_equal(out["status"], "same"))

    return both.groupby("bucket").map_groups(
        diff_bucket, batch_format="pyarrow"
    )

"""TPC-H kernels Q2/Q7-Q12/Q17/Q19-Q21 — the remainder of the 22-query
suite, adapted to the testdata schema (no partsupp table, no
l_commitdate / l_receiptdate / l_shipmode / p_container columns), on
the same Ray-Data plan shapes as ``relational.py``:

* per-batch Arrow pre-aggregation (combiner) before ANY exchange;
* broadcast-vs-bucketed join hybrids decided from parquet metadata /
  materialized counts, with a forced-bucketed kwarg for path-agreement
  tests (``broadcast_max_keys=0``);
* one ``hash_bucket_join`` / ``bucketed_agg`` shuffle where a real
  all-to-all is unavoidable, with the rollup folded INTO the bucket
  task so only partial rows leave the exchange;
* money as integer cents (``relational.cents``: floor(x*100+0.5),
  bit-identical to the DuckDB oracle), ratios as one final division.

Schema adaptations (each noted on its query):
  Q2   ps_supplycost → min unit sale price min(cents(l_extendedprice
       / l_quantity)) per (part, supplier) observed in lineitem.
  Q4   (already in relational.py) commit<receipt → l_returnflag='R'.
  Q9   ps_supplycost → p_retailprice*l_quantity as the cost side;
       order year → ship year (avoids the orders join entirely).
  Q12  l_shipmode → l_linestatus as the grouping axis; "late" =
       l_shipdate > o_orderdate + 90 days.
  Q17  p_container → p_size <= N.
  Q19  container/shipmode predicates dropped; the 3-branch OR keeps
       (brand, size range, quantity range).
  Q20  ps_availqty > ½·shipped → total shipped centi-qty in the year
       > threshold.
  Q21  "kept orders waiting" = the unique 'R'-flagged supplier on a
       finished multi-supplier order.
"""
from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from .relational import _read, cents, hash_bucket_join

HIGH_PRIO = ("1-URGENT", "2-HIGH")


# ---------------------------------------------------------------------------
# shared dimension / broadcast helpers
# ---------------------------------------------------------------------------

def _nation_names(sf_dir: str):
    """(sorted nationkeys int64, aligned n_name StringArray)."""
    nat = pq.read_table(
        os.path.join(sf_dir, "nation.parquet"),
        columns=["n_nationkey", "n_name"],
    )
    nk = nat["n_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(nk)
    return nk[order], nat["n_name"].combine_chunks().take(pa.array(order))


def _region_nations(sf_dir: str, region: str) -> np.ndarray:
    """sorted nationkeys of one region (≤25-row driver-side resolve)."""
    nat = pq.read_table(
        os.path.join(sf_dir, "nation.parquet"),
        columns=["n_nationkey", "n_regionkey"],
    )
    reg = pq.read_table(os.path.join(sf_dir, "region.parquet"))
    rkey = {
        n: k
        for k, n in zip(
            reg["r_regionkey"].to_pylist(), reg["r_name"].to_pylist()
        )
    }[region]
    keep = nat.filter(pc.equal(nat["n_regionkey"], rkey))
    return np.sort(
        keep["n_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    )


def _supplier_nation_ref(sf_dir: str, nat_keys: np.ndarray | None = None):
    """ray.put sorted (suppkey, nationkey) arrays, optionally filtered
    to a nation set.  Supplier is the smallest fact-side dim (SF×10k);
    broadcasting it is the house Q5 precedent — the documented boundary
    is supplier no longer fitting a worker heap (SF ≳ 100k)."""
    import ray

    sup = pq.read_table(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_nationkey"],
    )
    sk = sup["s_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    sn = sup["s_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    if nat_keys is not None:
        keep = np.isin(sn, nat_keys)
        sk, sn = sk[keep], sn[keep]
    order = np.argsort(sk)
    return ray.put((sk[order], sn[order]))


def _lookup(keys: np.ndarray, q: np.ndarray):
    """sorted-array membership: (hit mask, clipped insert positions)."""
    if len(keys) == 0:
        return np.zeros(len(q), dtype=bool), np.zeros(len(q), dtype=np.int64)
    idx = np.searchsorted(keys, q)
    idc = np.minimum(idx, len(keys) - 1)
    return keys[idc] == q, idc


def _blocks(ds) -> list[pa.Table]:
    import ray

    return [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]


def bucketed_agg(ds, key: str, local_fn, schema: pa.Schema,
                 num_buckets: int = 64):
    """Distributed groupby on an int64 key as ONE bucket shuffle:
    ``bucket = key % num_buckets`` tag → ``groupby(bucket).map_groups``
    with ``local_fn`` running on the complete co-located key set (the
    high-cardinality-groupby house rule: never
    ``groupby(key).aggregate`` at millions of groups — bucket the key
    and sweep each bucket with Arrow locally).  ``schema`` is required
    (static — avoids the lazy schema() limit-1 probe) and doubles as
    the typed-empty guard for Ray's schema-less empty blocks."""
    nb = num_buckets

    def tag(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            b = schema.empty_table()
        k = pc.cast(b[key], pa.uint64())
        bucket = pc.cast(
            pc.bit_wise_and(k, nb - 1)
            if nb & (nb - 1) == 0
            else pc.subtract(k, pc.multiply(pc.divide(k, nb), nb)),
            pa.int64(),
        )
        return b.append_column("bucket", bucket)

    def run(g: pa.Table) -> pa.Table:
        return local_fn(g.drop_columns(["bucket"]))

    return ds.map_batches(tag, batch_format="pyarrow").groupby(
        "bucket"
    ).map_groups(run, batch_format="pyarrow")


def _orders_cust_nation(
    sf_dir: str,
    nat_keys: np.ndarray,
    broadcast_max_keys: int,
    num_buckets: int,
    date_lo: str | None = None,
    date_hi: str | None = None,
    with_year: bool = False,
):
    """orders ⋈ customer(nation-filtered) → materialized Dataset of
    (o_orderkey, c_nation[, o_year]).  The Q5 first-join hybrid,
    factored: under ``broadcast_max_keys`` customers the filtered
    (custkey, nationkey) pair list broadcasts and orders tag map-side
    (zero shuffle); above it, a custkey-bucketed ``hash_bucket_join``."""
    import ray

    lo = np.datetime64(date_lo, "us") if date_lo else None
    hi = np.datetime64(date_hi, "us") if date_hi else None

    cust = _read(
        sf_dir, "customer", columns=["c_custkey", "c_nationkey"]
    ).map_batches(
        lambda b: b.filter(
            pc.is_in(b["c_nationkey"], value_set=pa.array(nat_keys))
        ),
        batch_format="pyarrow",
    )
    ocols = ["o_orderkey", "o_custkey"] + (
        ["o_orderdate"] if (with_year or lo is not None) else []
    )
    orders = _read(sf_dir, "orders", columns=ocols)

    def _ofilter(batch: pa.Table) -> pa.Table:
        if lo is not None:
            batch = batch.filter(
                pc.and_(
                    pc.greater_equal(batch["o_orderdate"], pa.scalar(lo)),
                    pc.less(batch["o_orderdate"], pa.scalar(hi)),
                )
            )
        return batch

    def _attach_year(t: pa.Table, odate_col: str) -> pa.Table:
        cols = {"o_orderkey": t["o_orderkey"], "c_nation": t["c_nation"]}
        if with_year:
            cols["o_year"] = pc.cast(pc.year(t[odate_col]), pa.int64())
        return pa.table(cols)

    n_cust = pq.read_metadata(
        os.path.join(sf_dir, "customer.parquet")
    ).num_rows
    if n_cust <= broadcast_max_keys:
        ks, vs = [], []
        for t in _blocks(cust):
            ks.append(
                t["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
            )
            vs.append(
                t["c_nationkey"].to_numpy(zero_copy_only=False).astype(
                    np.int64
                )
            )
        if ks:
            k = np.concatenate(ks)
            v = np.concatenate(vs)
            o = np.argsort(k)
            k, v = k[o], v[o]
        else:
            k = v = np.zeros(0, np.int64)
        c_ref = ray.put((k, v))

        def tag(batch: pa.Table) -> pa.Table:
            ck, cv = ray.get(c_ref)
            batch = _ofilter(batch)
            oc = batch["o_custkey"].to_numpy(zero_copy_only=False)
            hit, idx = _lookup(ck, oc)
            kept = batch.filter(pa.array(hit))
            t = pa.table(
                {
                    "o_orderkey": kept["o_orderkey"],
                    "c_nation": pa.array(cv[idx[hit]], pa.int64()),
                    **(
                        {"o_orderdate": kept["o_orderdate"]}
                        if with_year
                        else {}
                    ),
                }
            )
            return _attach_year(t, "o_orderdate")

        return orders.map_batches(tag, batch_format="pyarrow").materialize()

    def oprep(batch: pa.Table) -> pa.Table:
        batch = _ofilter(batch)
        cols = {
            "o_orderkey": batch["o_orderkey"],
            "o_custkey": batch["o_custkey"],
        }
        if with_year:
            cols["o_year"] = pc.cast(
                pc.year(batch["o_orderdate"]), pa.int64()
            )
        return pa.table(cols)

    def cprep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_custkey": pc.cast(batch["c_custkey"], pa.int64()),
                "c_nation": pc.cast(batch["c_nationkey"], pa.int64()),
            }
        )

    lschema = [("o_orderkey", pa.int64()), ("o_custkey", pa.int64())] + (
        [("o_year", pa.int64())] if with_year else []
    )
    keep = ["o_orderkey", "c_nation"] + (["o_year"] if with_year else [])
    return (
        hash_bucket_join(
            orders.map_batches(oprep, batch_format="pyarrow"),
            cust.map_batches(cprep, batch_format="pyarrow"),
            on="o_custkey",
            num_buckets=num_buckets,
            left_schema=pa.schema(lschema),
            right_schema=pa.schema(
                [("o_custkey", pa.int64()), ("c_nation", pa.int64())]
            ),
        )
        .map_batches(lambda b: b.select(keep), batch_format="pyarrow")
        .materialize()
    )


def _li_revenue_cents(batch: pa.Table) -> pa.Array:
    ep = pc.cast(batch["l_extendedprice"], pa.float64())
    disc = pc.cast(batch["l_discount"], pa.float64())
    return cents(pc.multiply(ep, pc.subtract(1.0, disc)))


def _part_keys(sf_dir: str, mask_fn, columns=("p_partkey",),
               mask_cols=("p_type", "p_size", "p_brand", "p_name")) -> pa.Table:
    """driver-side filtered part dim (part is the 30×-smaller side;
    the filtered set must fit the broadcast budget — same boundary as
    ``lineitem_part_revenue``'s dimension arrays).  ``mask_cols`` are
    read for the predicate only; the returned table keeps ``columns``."""
    keep = list(dict.fromkeys(list(columns) + ["p_partkey"]))
    part = pq.read_table(
        os.path.join(sf_dir, "part.parquet"),
        columns=list(dict.fromkeys(keep + list(mask_cols))),
    )
    return part.filter(mask_fn(part)).select(keep).combine_chunks()


# ---------------------------------------------------------------------------
# Q7 — volume shipping between two regions, by nation pair and year
# ---------------------------------------------------------------------------

def q7_volume_shipping(
    sf_dir: str,
    supp_region: str = "EUROPE",
    cust_region: str = "ASIA",
    date_lo: str = "1996-01-01",
    date_hi: str = "1998-01-01",
    num_buckets: int = 32,
    broadcast_max_keys: int = 5_000_000,
):
    """TPC-H Q7 shape — revenue shipped from supp_region suppliers to
    cust_region customers, by (supp_nation, cust_nation, ship year).
    Nation-pair filter generalized to region×region so the result is
    non-degenerate at tiny scale factors.

    Plan: supplier(region) broadcasts (Q5 precedent); customer join
    rides the factored ``_orders_cust_nation`` hybrid; lineitem
    pre-aggregates (orderkey, s_nation, year) partials per batch; the
    orderkey join is broadcast under the budget (cust-region orders ≈
    1/5 of orders) else ONE bucketed shuffle with the nation-pair
    rollup folded into the bucket task."""
    import ray

    lo, hi = np.datetime64(date_lo, "us"), np.datetime64(date_hi, "us")
    s_nats = _region_nations(sf_dir, supp_region)
    c_nats = _region_nations(sf_dir, cust_region)
    s_ref = _supplier_nation_ref(sf_dir, s_nats)
    names = _nation_names(sf_dir)

    tagged = _orders_cust_nation(
        sf_dir, c_nats, broadcast_max_keys, num_buckets
    )

    def li_prep(batch: pa.Table) -> pa.Table:
        batch = batch.filter(
            pc.and_(
                pc.greater_equal(batch["l_shipdate"], pa.scalar(lo)),
                pc.less(batch["l_shipdate"], pa.scalar(hi)),
            )
        )
        sk, sn = ray.get(s_ref)
        ls = batch["l_suppkey"].to_numpy(zero_copy_only=False)
        hit, idx = _lookup(sk, ls)
        kept = batch.filter(pa.array(hit))
        t = pa.table(
            {
                "o_orderkey": kept["l_orderkey"],
                "supp_nation": pa.array(sn[idx[hit]], pa.int64()),
                "l_year": pc.cast(pc.year(kept["l_shipdate"]), pa.int64()),
                "revenue_cents": _li_revenue_cents(kept),
            }
        )
        return (
            t.group_by(["o_orderkey", "supp_nation", "l_year"])
            .aggregate([("revenue_cents", "sum")])
            .rename_columns(
                ["o_orderkey", "supp_nation", "l_year", "revenue_cents"]
            )
        )

    li = _read(
        sf_dir,
        "lineitem",
        columns=[
            "l_orderkey", "l_suppkey", "l_shipdate",
            "l_extendedprice", "l_discount",
        ],
    ).map_batches(li_prep, batch_format="pyarrow")

    def pair_partial(joined: pa.Table) -> pa.Table:
        return (
            joined.select(
                ["supp_nation", "c_nation", "l_year", "revenue_cents"]
            )
            .group_by(["supp_nation", "c_nation", "l_year"])
            .aggregate([("revenue_cents", "sum")])
            .rename_columns(
                ["supp_nation", "c_nation", "l_year", "revenue_cents"]
            )
        )

    if tagged.count() <= broadcast_max_keys:
        tb = _blocks(tagged)
        if not tb:
            parts = []
        else:
            tt = pa.concat_tables(tb)
            ok = tt["o_orderkey"].to_numpy(zero_copy_only=False)
            o = np.argsort(ok)
            t_ref = ray.put(
                (ok[o], tt["c_nation"].to_numpy(zero_copy_only=False)[o])
            )

            def tag_cust(batch: pa.Table) -> pa.Table:
                keys, nat = ray.get(t_ref)
                lk = batch["o_orderkey"].to_numpy(zero_copy_only=False)
                hit, idx = _lookup(keys, lk)
                kept = batch.filter(pa.array(hit))
                return pair_partial(
                    kept.append_column(
                        "c_nation", pa.array(nat[idx[hit]], pa.int64())
                    )
                )

            parts = _blocks(
                li.map_batches(tag_cust, batch_format="pyarrow")
            )
    else:
        parts = _blocks(
            hash_bucket_join(
                li,
                tagged,
                on="o_orderkey",
                num_buckets=num_buckets,
                bucket_postprocess=pair_partial,
                left_schema=pa.schema(
                    [
                        ("o_orderkey", pa.int64()),
                        ("supp_nation", pa.int64()),
                        ("l_year", pa.int64()),
                        ("revenue_cents", pa.int64()),
                    ]
                ),
                right_schema=pa.schema(
                    [("o_orderkey", pa.int64()), ("c_nation", pa.int64())]
                ),
            )
        )
    if not parts:
        return pa.table(
            {
                "supp_nation": pa.array([], pa.string()),
                "cust_nation": pa.array([], pa.string()),
                "l_year": pa.array([], pa.int64()),
                "revenue_cents": pa.array([], pa.int64()),
            }
        )
    tiny = (
        pa.concat_tables(parts)
        .group_by(["supp_nation", "c_nation", "l_year"])
        .aggregate([("revenue_cents", "sum")])
    )
    nk, nn = names
    sname = nn.take(
        pa.array(
            np.searchsorted(
                nk, tiny["supp_nation"].to_numpy(zero_copy_only=False)
            )
        )
    )
    cname = nn.take(
        pa.array(
            np.searchsorted(
                nk, tiny["c_nation"].to_numpy(zero_copy_only=False)
            )
        )
    )
    return pa.table(
        {
            "supp_nation": sname,
            "cust_nation": cname,
            "l_year": tiny["l_year"],
            "revenue_cents": pc.cast(
                tiny["revenue_cents_sum"], pa.int64()
            ),
        }
    ).sort_by(
        [
            ("supp_nation", "ascending"),
            ("cust_nation", "ascending"),
            ("l_year", "ascending"),
        ]
    )


# ---------------------------------------------------------------------------
# Q8 — national market share inside a region's market
# ---------------------------------------------------------------------------

def q8_market_share(
    sf_dir: str,
    region: str = "ASIA",
    target_nation: str = "NATION_2",
    p_type: str = "PROMO",
    date_lo: str = "1995-01-01",
    date_hi: str = "1997-01-01",
    num_buckets: int = 32,
    broadcast_max_keys: int = 5_000_000,
):
    """TPC-H Q8 shape — of the revenue that ``region``'s customers
    spent on ``p_type`` parts per order year, the share supplied by
    ``target_nation``.  mkt_share is ONE final division of two integer
    cent sums (both also returned, so the hash check pins the exact
    integers, not just the float).

    Plan: type-filtered part keys broadcast; supplier→nation broadcast
    (is-target flag resolves map-side); customer/orders hybrid via
    ``_orders_cust_nation(with_year=True)``; lineitem pre-aggregates
    (orderkey, rev, rev_target) per batch; orderkey join broadcast
    under budget else one bucketed shuffle with the per-year rollup in
    the bucket task."""
    import ray

    part = _part_keys(
        sf_dir, lambda p: pc.equal(p["p_type"], p_type)
    )
    pk_set = np.sort(
        part["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    )
    pk_ref = ray.put(pk_set)
    s_ref = _supplier_nation_ref(sf_dir)
    nk, nn = _nation_names(sf_dir)
    tkey = int(
        nk[np.flatnonzero(pc.equal(nn, target_nation).to_numpy(
            zero_copy_only=False))[0]]
    )
    c_nats = _region_nations(sf_dir, region)

    tagged = _orders_cust_nation(
        sf_dir, c_nats, broadcast_max_keys, num_buckets,
        date_lo=date_lo, date_hi=date_hi, with_year=True,
    )

    def li_prep(batch: pa.Table) -> pa.Table:
        pk = ray.get(pk_ref)
        lp = batch["l_partkey"].to_numpy(zero_copy_only=False)
        hit, _ = _lookup(pk, lp)
        kept = batch.filter(pa.array(hit))
        sk, sn = ray.get(s_ref)
        shit, sidx = _lookup(sk, kept["l_suppkey"].to_numpy(
            zero_copy_only=False))
        kept = kept.filter(pa.array(shit))
        is_t = sn[sidx[shit]] == tkey
        rev = _li_revenue_cents(kept)
        t = pa.table(
            {
                "o_orderkey": kept["l_orderkey"],
                "rev_cents": rev,
                "rev_t_cents": pc.if_else(
                    pa.array(is_t), rev, pa.scalar(0, pa.int64())
                ),
            }
        )
        return (
            t.group_by("o_orderkey")
            .aggregate([("rev_cents", "sum"), ("rev_t_cents", "sum")])
            .rename_columns(["o_orderkey", "rev_cents", "rev_t_cents"])
        )

    li = _read(
        sf_dir,
        "lineitem",
        columns=[
            "l_orderkey", "l_partkey", "l_suppkey",
            "l_extendedprice", "l_discount",
        ],
    ).map_batches(li_prep, batch_format="pyarrow")

    def year_partial(joined: pa.Table) -> pa.Table:
        return (
            joined.select(["o_year", "rev_cents", "rev_t_cents"])
            .group_by("o_year")
            .aggregate([("rev_cents", "sum"), ("rev_t_cents", "sum")])
            .rename_columns(["o_year", "rev_cents", "rev_t_cents"])
        )

    if tagged.count() <= broadcast_max_keys:
        tb = _blocks(tagged)
        if not tb:
            parts = []
        else:
            tt = pa.concat_tables(tb)
            ok = tt["o_orderkey"].to_numpy(zero_copy_only=False)
            o = np.argsort(ok)
            t_ref = ray.put(
                (ok[o], tt["o_year"].to_numpy(zero_copy_only=False)[o])
            )

            def tag_year(batch: pa.Table) -> pa.Table:
                keys, yr = ray.get(t_ref)
                lk = batch["o_orderkey"].to_numpy(zero_copy_only=False)
                hit, idx = _lookup(keys, lk)
                kept = batch.filter(pa.array(hit))
                return year_partial(
                    kept.append_column(
                        "o_year", pa.array(yr[idx[hit]], pa.int64())
                    )
                )

            parts = _blocks(
                li.map_batches(tag_year, batch_format="pyarrow")
            )
    else:
        parts = _blocks(
            hash_bucket_join(
                li,
                tagged.map_batches(
                    lambda b: b.select(["o_orderkey", "o_year"]),
                    batch_format="pyarrow",
                ),
                on="o_orderkey",
                num_buckets=num_buckets,
                bucket_postprocess=year_partial,
                left_schema=pa.schema(
                    [
                        ("o_orderkey", pa.int64()),
                        ("rev_cents", pa.int64()),
                        ("rev_t_cents", pa.int64()),
                    ]
                ),
                right_schema=pa.schema(
                    [("o_orderkey", pa.int64()), ("o_year", pa.int64())]
                ),
            )
        )
    if not parts:
        return pa.table(
            {
                "o_year": pa.array([], pa.int64()),
                "rev_target_cents": pa.array([], pa.int64()),
                "rev_total_cents": pa.array([], pa.int64()),
                "mkt_share": pa.array([], pa.float64()),
            }
        )
    tiny = (
        pa.concat_tables(parts)
        .group_by("o_year")
        .aggregate([("rev_t_cents", "sum"), ("rev_cents", "sum")])
    )
    tgt = tiny["rev_t_cents_sum"].to_numpy(zero_copy_only=False).astype(
        np.int64
    )
    tot = tiny["rev_cents_sum"].to_numpy(zero_copy_only=False).astype(
        np.int64
    )
    return pa.table(
        {
            "o_year": tiny["o_year"],
            "rev_target_cents": pa.array(tgt, pa.int64()),
            "rev_total_cents": pa.array(tot, pa.int64()),
            "mkt_share": pa.array(
                tgt.astype(np.float64) / tot.astype(np.float64), pa.float64()
            ),
        }
    ).sort_by("o_year")


# ---------------------------------------------------------------------------
# Q9 — product-type profit by nation and (ship) year — zero shuffles
# ---------------------------------------------------------------------------

def q9_product_profit(
    sf_dir: str,
    name_like: str = "red",
    num_buckets: int = 32,
    broadcast_max_keys: int = 5_000_000,
):
    """TPC-H Q9 shape — profit on parts whose name contains
    ``name_like``, by (supplier nation, year).  Adapted: the missing
    ps_supplycost becomes p_retailprice*l_quantity, and the year is
    the SHIP year, which removes the orders join — the whole query is
    two dimension broadcasts and one streaming combiner pass (zero
    shuffles) below the part budget, one partkey-bucketed join above.

    profit_cents per row = floor((extprice*(1-disc) −
    retailprice*qty)*100 + .5), same expression the oracle evaluates —
    identical IEEE op order, so bit-identical sums."""
    import ray

    part = _part_keys(
        sf_dir,
        lambda p: pc.match_substring(p["p_name"], name_like),
        columns=("p_partkey", "p_retailprice"),
    )
    s_ref = _supplier_nation_ref(sf_dir)
    nk, nn = _nation_names(sf_dir)
    n_filtered = part.num_rows

    def profit_partial(t: pa.Table) -> pa.Table:
        """(l_suppkey, l_shipdate, ep, disc, qty, p_retailprice) rows →
        (nation, ship_year, profit_cents) partial."""
        sk, sn = ray.get(s_ref)
        shit, sidx = _lookup(
            sk, t["l_suppkey"].to_numpy(zero_copy_only=False)
        )
        t = t.filter(pa.array(shit))
        nat = sn[sidx[shit]]
        ep = pc.cast(t["l_extendedprice"], pa.float64())
        disc = pc.cast(t["l_discount"], pa.float64())
        qty = pc.cast(t["l_quantity"], pa.float64())
        rp = pc.cast(t["p_retailprice"], pa.float64())
        amount = pc.subtract(
            pc.multiply(ep, pc.subtract(1.0, disc)), pc.multiply(rp, qty)
        )
        g = pa.table(
            {
                "nation": pa.array(nat, pa.int64()),
                "ship_year": pc.cast(pc.year(t["l_shipdate"]), pa.int64()),
                "profit_cents": cents(amount),
            }
        )
        return (
            g.group_by(["nation", "ship_year"])
            .aggregate([("profit_cents", "sum")])
            .rename_columns(["nation", "ship_year", "profit_cents"])
        )

    li = _read(
        sf_dir,
        "lineitem",
        columns=[
            "l_partkey", "l_suppkey", "l_shipdate",
            "l_extendedprice", "l_discount", "l_quantity",
        ],
    )
    if n_filtered <= broadcast_max_keys:
        pk = part["p_partkey"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        rp = part["p_retailprice"].to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        o = np.argsort(pk)
        p_ref = ray.put((pk[o], rp[o]))

        def map_profit(batch: pa.Table) -> pa.Table:
            ks, vs = ray.get(p_ref)
            hit, idx = _lookup(
                ks, batch["l_partkey"].to_numpy(zero_copy_only=False)
            )
            kept = batch.filter(pa.array(hit))
            kept = kept.append_column(
                "p_retailprice", pa.array(vs[idx[hit]], pa.float64())
            )
            return profit_partial(kept)

        parts = _blocks(li.map_batches(map_profit, batch_format="pyarrow"))
    else:
        import ray.data

        part_ds = ray.data.from_arrow(part).map_batches(
            lambda b: pa.table(
                {
                    "l_partkey": pc.cast(b["p_partkey"], pa.int64()),
                    "p_retailprice": pc.cast(
                        b["p_retailprice"], pa.float64()
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        parts = _blocks(
            hash_bucket_join(
                li.map_batches(
                    lambda b: b.select(
                        [
                            "l_partkey", "l_suppkey", "l_shipdate",
                            "l_extendedprice", "l_discount", "l_quantity",
                        ]
                    ),
                    batch_format="pyarrow",
                ),
                part_ds,
                on="l_partkey",
                num_buckets=num_buckets,
                bucket_postprocess=profit_partial,
                left_schema=pa.schema(
                    [
                        ("l_partkey", pa.int64()),
                        ("l_suppkey", pa.int64()),
                        ("l_shipdate", pa.timestamp("us")),
                        ("l_extendedprice", pa.float64()),
                        ("l_discount", pa.float64()),
                        ("l_quantity", pa.float64()),
                    ]
                ),
                right_schema=pa.schema(
                    [
                        ("l_partkey", pa.int64()),
                        ("p_retailprice", pa.float64()),
                    ]
                ),
            )
        )
    if not parts:
        return pa.table(
            {
                "n_name": pa.array([], pa.string()),
                "ship_year": pa.array([], pa.int64()),
                "profit_cents": pa.array([], pa.int64()),
            }
        )
    tiny = (
        pa.concat_tables(parts)
        .group_by(["nation", "ship_year"])
        .aggregate([("profit_cents", "sum")])
    )
    names = nn.take(
        pa.array(
            np.searchsorted(
                nk, tiny["nation"].to_numpy(zero_copy_only=False)
            )
        )
    )
    return pa.table(
        {
            "n_name": names,
            "ship_year": tiny["ship_year"],
            "profit_cents": pc.cast(tiny["profit_cents_sum"], pa.int64()),
        }
    ).sort_by([("n_name", "ascending"), ("ship_year", "ascending")])


# ---------------------------------------------------------------------------
# Q10 — returned-item reporting: top-k customers by returned revenue
# ---------------------------------------------------------------------------

def q10_returned_items(
    sf_dir: str,
    date_lo: str = "1997-01-01",
    date_hi: str = "1997-04-01",
    k: int = 20,
    num_buckets: int = 32,
    broadcast_max_keys: int = 5_000_000,
    driver_finish_max: int = 2_000_000,
):
    """TPC-H Q10 shape — customers ranked by revenue from lineitems
    they returned ('R') on orders placed in one quarter; top-k with
    name/balance/nation attached.

    Plan: quarter orders collapse to (orderkey, custkey) — broadcast
    under budget, else orderkey-bucketed join; lineitem pre-aggregates
    returned revenue per orderkey per batch; the per-customer rollup
    is a custkey ``bucketed_agg`` whose bucket task finishes the agg
    AND cuts to its local top-k (full agg before any cut — the
    broadcast-path top-k rule), so the driver merges ≤ buckets×k
    candidate rows; names attach via a predicate-pushdown read of only
    the ≤k winning keys (``top_customers`` pattern).  Tie-break:
    (revenue desc, custkey asc), mirrored in the oracle's ORDER BY."""
    import ray

    lo, hi = np.datetime64(date_lo, "us"), np.datetime64(date_hi, "us")

    ords = _read(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(
        lambda b: b.filter(
            pc.and_(
                pc.greater_equal(b["o_orderdate"], pa.scalar(lo)),
                pc.less(b["o_orderdate"], pa.scalar(hi)),
            )
        ).select(["o_orderkey", "o_custkey"]),
        batch_format="pyarrow",
    ).materialize()

    def li_prep(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch["l_returnflag"], "R"))
        g = pa.table(
            {
                "o_orderkey": t["l_orderkey"],
                "revenue_cents": _li_revenue_cents(t),
            }
        )
        return (
            g.group_by("o_orderkey")
            .aggregate([("revenue_cents", "sum")])
            .rename_columns(["o_orderkey", "revenue_cents"])
        )

    li = _read(
        sf_dir,
        "lineitem",
        columns=[
            "l_orderkey", "l_returnflag", "l_extendedprice", "l_discount",
        ],
    ).map_batches(li_prep, batch_format="pyarrow")

    def cust_partial(joined: pa.Table) -> pa.Table:
        return (
            joined.select(["o_custkey", "revenue_cents"])
            .group_by("o_custkey")
            .aggregate([("revenue_cents", "sum")])
            .rename_columns(["o_custkey", "revenue_cents"])
        )

    if ords.count() <= broadcast_max_keys:
        ob = _blocks(ords)
        if not ob:
            per_order = None
        else:
            ot = pa.concat_tables(ob)
            ok = ot["o_orderkey"].to_numpy(zero_copy_only=False)
            o = np.argsort(ok)
            o_ref = ray.put(
                (ok[o], ot["o_custkey"].to_numpy(zero_copy_only=False)[o])
            )

            def tag_cust(batch: pa.Table) -> pa.Table:
                keys, cust = ray.get(o_ref)
                lk = batch["o_orderkey"].to_numpy(zero_copy_only=False)
                hit, idx = _lookup(keys, lk)
                kept = batch.filter(pa.array(hit))
                return cust_partial(
                    kept.append_column(
                        "o_custkey", pa.array(cust[idx[hit]], pa.int64())
                    )
                )

            per_order = li.map_batches(tag_cust, batch_format="pyarrow")
    else:
        per_order = hash_bucket_join(
            li,
            ords,
            on="o_orderkey",
            num_buckets=num_buckets,
            bucket_postprocess=cust_partial,
            left_schema=pa.schema(
                [("o_orderkey", pa.int64()), ("revenue_cents", pa.int64())]
            ),
            right_schema=pa.schema(
                [("o_orderkey", pa.int64()), ("o_custkey", pa.int64())]
            ),
        )

    empty = pa.table(
        {
            "c_custkey": pa.array([], pa.int64()),
            "c_name": pa.array([], pa.string()),
            "revenue_cents": pa.array([], pa.int64()),
            "acctbal_cents": pa.array([], pa.int64()),
            "n_name": pa.array([], pa.string()),
        }
    )
    if per_order is None:
        return empty

    part_schema = pa.schema(
        [("o_custkey", pa.int64()), ("revenue_cents", pa.int64())]
    )

    def topk_bucket(g: pa.Table) -> pa.Table:
        agg = (
            g.group_by("o_custkey")
            .aggregate([("revenue_cents", "sum")])
            .rename_columns(["o_custkey", "revenue_cents"])
        )
        agg = agg.take(
            pc.sort_indices(
                agg,
                sort_keys=[
                    ("revenue_cents", "descending"),
                    ("o_custkey", "ascending"),
                ],
            )[:k]
        )
        return agg

    # adaptive finish (house rule): the per-(batch/bucket) partials are
    # already custkey-aggregated — when the materialized partial count
    # is tiny, one driver-side Arrow hash-agg beats the ~1.5-3.5 s
    # fixed cost of a Ray groupby shuffle; above the gate, the custkey
    # bucketed_agg finishes distributed with per-bucket top-k cuts.
    per_order = per_order.materialize()
    if per_order.count() <= driver_finish_max:
        blocks = _blocks(per_order)
        cands = [topk_bucket(pa.concat_tables(blocks))] if blocks else []
    else:
        cands = _blocks(
            bucketed_agg(
                per_order, "o_custkey", topk_bucket, part_schema,
                num_buckets=num_buckets,
            )
        )
    if not cands:
        return empty
    allc = pa.concat_tables(cands)
    allc = allc.take(
        pc.sort_indices(
            allc,
            sort_keys=[
                ("revenue_cents", "descending"),
                ("o_custkey", "ascending"),
            ],
        )[:k]
    )
    win = allc["o_custkey"].to_pylist()
    cust = pq.read_table(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_name", "c_acctbal", "c_nationkey"],
        filters=[("c_custkey", "in", win)],
    )
    ck = cust["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    co = np.argsort(ck)
    pos = co[
        np.searchsorted(
            ck[co],
            allc["o_custkey"].to_numpy(zero_copy_only=False),
        )
    ]
    nk, nn = _nation_names(sf_dir)
    natk = cust["c_nationkey"].to_numpy(zero_copy_only=False).astype(
        np.int64
    )[pos]
    return pa.table(
        {
            "c_custkey": allc["o_custkey"],
            "c_name": cust["c_name"].take(pa.array(pos)),
            "revenue_cents": allc["revenue_cents"],
            "acctbal_cents": cents(cust["c_acctbal"]).take(pa.array(pos)),
            "n_name": nn.take(pa.array(np.searchsorted(nk, natk))),
        }
    )


# ---------------------------------------------------------------------------
# Q11 — important stock: parts holding an outsized share of value
# ---------------------------------------------------------------------------

def q11_important_stock(
    sf_dir: str,
    region: str = "EUROPE",
    fraction_ppm: int = 1000,
    num_buckets: int = 64,
    driver_finish_max: int = 2_000_000,
):
    """TPC-H Q11 shape — per-part share of total "stock" value held by
    one region's suppliers, keeping parts above a global threshold.
    Adapted: ps_supplycost*ps_availqty → sum of cents(l_extendedprice)
    shipped by the region's suppliers.

    Plan: region supplier set broadcasts; lineitem pre-aggregates
    (partkey, value) per batch; the per-part sums finish driver-side
    when the materialized partial count is tiny (adaptive finish) else
    via ONE partkey ``bucketed_agg``; the global total is a streamed
    per-block scalar reduce over those outputs (the driver holds
    scalars, never the full distributed per-part table); the threshold
    filter compares integers — ``value_cents * 1_000_000 >
    fraction_ppm * total_cents`` — so the engine and the oracle agree
    exactly."""
    import ray

    s_nats = _region_nations(sf_dir, region)
    s_ref = _supplier_nation_ref(sf_dir, s_nats)

    def li_prep(batch: pa.Table) -> pa.Table:
        sk, _ = ray.get(s_ref)
        hit, _ = _lookup(
            sk, batch["l_suppkey"].to_numpy(zero_copy_only=False)
        )
        kept = batch.filter(pa.array(hit))
        g = pa.table(
            {
                "p_partkey": kept["l_partkey"],
                "value_cents": cents(
                    pc.cast(kept["l_extendedprice"], pa.float64())
                ),
            }
        )
        return (
            g.group_by("p_partkey")
            .aggregate([("value_cents", "sum")])
            .rename_columns(["p_partkey", "value_cents"])
        )

    li = _read(
        sf_dir,
        "lineitem",
        columns=["l_partkey", "l_suppkey", "l_extendedprice"],
    ).map_batches(li_prep, batch_format="pyarrow")

    schema = pa.schema(
        [("p_partkey", pa.int64()), ("value_cents", pa.int64())]
    )

    def merge_bucket(g: pa.Table) -> pa.Table:
        return (
            g.group_by("p_partkey")
            .aggregate([("value_cents", "sum")])
            .rename_columns(["p_partkey", "value_cents"])
        )

    partials = li.materialize()
    if partials.count() <= driver_finish_max:
        # adaptive finish: merged partials are per-part rows; the
        # total, cutoff and cut all complete locally — zero shuffles
        blocks = _blocks(partials)
        merged = (
            merge_bucket(pa.concat_tables(blocks))
            if blocks
            else schema.empty_table()
        )
        total = int(pc.sum(merged["value_cents"]).as_py() or 0)
        if total == 0:
            return schema.empty_table()
        cutoff = (fraction_ppm * total) // 1_000_000 + 1
        v = merged["value_cents"].to_numpy(zero_copy_only=False)
        return merged.filter(pa.array(v >= cutoff)).sort_by(
            [("value_cents", "descending"), ("p_partkey", "ascending")]
        )
    per_part = bucketed_agg(
        partials, "p_partkey", merge_bucket, schema,
        num_buckets=num_buckets,
    ).materialize()

    def block_total(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"t": pa.array([], pa.int64())})
        return pa.table(
            {"t": pa.array([pc.sum(b["value_cents"]).as_py() or 0],
                           pa.int64())}
        )

    totals = _blocks(
        per_part.map_batches(block_total, batch_format="pyarrow")
    )
    total = (
        int(
            pc.sum(pa.concat_tables(totals)["t"]).as_py() or 0
        )
        if totals
        else 0
    )
    if total == 0:
        return pa.table(
            {
                "p_partkey": pa.array([], pa.int64()),
                "value_cents": pa.array([], pa.int64()),
            }
        )
    # value*1_000_000 > fraction_ppm*total, rearranged to a single
    # int64-safe comparison: for integer value, that is exactly
    # value >= thresh//1_000_000 + 1 (python-int math on the driver —
    # no overflow; the per-row compare stays vectorized int64)
    cutoff = (fraction_ppm * total) // 1_000_000 + 1

    def cut(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return schema.empty_table()
        v = b["value_cents"].to_numpy(zero_copy_only=False)
        return b.filter(pa.array(v >= cutoff))

    out = _blocks(per_part.map_batches(cut, batch_format="pyarrow"))
    if not out:
        return schema.empty_table()
    return pa.concat_tables(out).sort_by(
        [("value_cents", "descending"), ("p_partkey", "ascending")]
    )


# ---------------------------------------------------------------------------
# Q12 — late shipments by line status and order priority class
# ---------------------------------------------------------------------------

def q12_late_shipments(
    sf_dir: str,
    days_late: int = 90,
    num_buckets: int = 32,
    broadcast_max_keys: int = 5_000_000,
):
    """TPC-H Q12 shape — lines shipped more than ``days_late`` days
    after their order date, counted by l_linestatus (the schema's
    stand-in for the missing l_shipmode), split into high-priority
    ('1-URGENT'/'2-HIGH') vs low-priority orders.

    Plan: orders collapse to (orderkey, orderdate_us, is_high) —
    broadcast as three aligned arrays under the budget so the late
    test and the ≤2-row rollup run map-side in lineitem's one pass;
    above it, an orderkey-bucketed join with the same rollup in the
    bucket task."""
    import ray

    delta = np.int64(days_late) * 86_400_000_000  # days → µs

    n_orders = pq.read_metadata(
        os.path.join(sf_dir, "orders.parquet")
    ).num_rows

    def status_partial(t: pa.Table) -> pa.Table:
        """(l_linestatus, ship_us, odate_us, is_high) → ≤2-row counts."""
        ship = t["ship_us"].to_numpy(zero_copy_only=False)
        odate = t["odate_us"].to_numpy(zero_copy_only=False)
        late = ship > odate + delta
        kept = t.filter(pa.array(late))
        high = kept["is_high"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        g = pa.table(
            {
                "l_linestatus": kept["l_linestatus"],
                "high": pa.array(high, pa.int64()),
                "low": pa.array(1 - high, pa.int64()),
            }
        )
        return (
            g.group_by("l_linestatus")
            .aggregate([("high", "sum"), ("low", "sum")])
            .rename_columns(["l_linestatus", "high", "low"])
        )

    li = _read(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_linestatus", "l_shipdate"],
    )

    if n_orders <= broadcast_max_keys:
        ords = pq.read_table(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
        )
        ok = ords["o_orderkey"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        od = ords["o_orderdate"].cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        hi = pc.is_in(
            ords["o_orderpriority"], value_set=pa.array(list(HIGH_PRIO))
        ).to_numpy(zero_copy_only=False).astype(np.int8)
        o = np.argsort(ok)
        o_ref = ray.put((ok[o], od[o], hi[o]))

        def map_late(batch: pa.Table) -> pa.Table:
            keys, od_, hi_ = ray.get(o_ref)
            lk = batch["l_orderkey"].to_numpy(zero_copy_only=False)
            hit, idx = _lookup(keys, lk)
            kept = batch.filter(pa.array(hit))
            t = pa.table(
                {
                    "l_linestatus": kept["l_linestatus"],
                    "ship_us": kept["l_shipdate"].cast(pa.int64()),
                    "odate_us": pa.array(od_[idx[hit]], pa.int64()),
                    "is_high": pa.array(
                        hi_[idx[hit]].astype(np.int64), pa.int64()
                    ),
                }
            )
            return status_partial(t)

        parts = _blocks(li.map_batches(map_late, batch_format="pyarrow"))
    else:
        ords_ds = _read(
            sf_dir, "orders",
            columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
        ).map_batches(
            lambda b: pa.table(
                {
                    "o_orderkey": b["o_orderkey"],
                    "odate_us": b["o_orderdate"].cast(pa.int64()),
                    "is_high": pc.cast(
                        pc.is_in(
                            b["o_orderpriority"],
                            value_set=pa.array(list(HIGH_PRIO)),
                        ),
                        pa.int64(),
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        li_prep = li.map_batches(
            lambda b: pa.table(
                {
                    "o_orderkey": b["l_orderkey"],
                    "l_linestatus": b["l_linestatus"],
                    "ship_us": b["l_shipdate"].cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        parts = _blocks(
            hash_bucket_join(
                li_prep,
                ords_ds,
                on="o_orderkey",
                num_buckets=num_buckets,
                bucket_postprocess=status_partial,
                left_schema=pa.schema(
                    [
                        ("o_orderkey", pa.int64()),
                        ("l_linestatus", pa.string()),
                        ("ship_us", pa.int64()),
                    ]
                ),
                right_schema=pa.schema(
                    [
                        ("o_orderkey", pa.int64()),
                        ("odate_us", pa.int64()),
                        ("is_high", pa.int64()),
                    ]
                ),
            )
        )
    if not parts:
        return pa.table(
            {
                "l_linestatus": pa.array([], pa.string()),
                "high_line_count": pa.array([], pa.int64()),
                "low_line_count": pa.array([], pa.int64()),
            }
        )
    tiny = (
        pa.concat_tables(parts)
        .group_by("l_linestatus")
        .aggregate([("high", "sum"), ("low", "sum")])
    )
    return pa.table(
        {
            "l_linestatus": tiny["l_linestatus"],
            "high_line_count": pc.cast(tiny["high_sum"], pa.int64()),
            "low_line_count": pc.cast(tiny["low_sum"], pa.int64()),
        }
    ).sort_by("l_linestatus")


# ---------------------------------------------------------------------------
# Q17 — small-quantity-order revenue (correlated per-part average)
# ---------------------------------------------------------------------------

def q17_small_qty_revenue(
    sf_dir: str,
    brand: str = "Brand#3",
    max_size: int = 10,
    num_buckets: int = 64,
    driver_finish_max: int = 2_000_000,
):
    """TPC-H Q17 shape — average yearly revenue that would be lost by
    not filling orders of less than 20 % of a part's average order
    quantity, over parts of one brand with p_size ≤ N (the schema's
    stand-in for the missing p_container filter).

    Two streaming passes over the part-filtered lineitems, zero
    unconditional shuffles:

    * pass 1 pre-aggregates (partkey, Σqty_centi, count) per batch;
      partials merge driver-side when tiny (adaptive finish), else via
      one partkey ``bucketed_agg`` — either way the merged table is
      |filtered parts| rows, the same order as the broadcast key set
      itself (documented boundary);
    * pass 2 broadcasts the per-part stats and sums cents(extprice)
      where ``qty_centi * 5 * cnt < Σqty_centi`` — the exact integer
      form of qty < 0.2·avg(qty), so engine ≡ oracle with no float
      threshold anywhere.

    Returns one row: avg_yearly = Σcents / 700.0 (7 data years × 100
    cents — the single final division)."""
    import ray

    part = _part_keys(
        sf_dir,
        lambda p: pc.and_(
            pc.equal(p["p_brand"], brand),
            pc.less_equal(p["p_size"], max_size),
        ),
    )
    pk_set = np.sort(
        part["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    )
    pk_ref = ray.put(pk_set)

    def pass1(batch: pa.Table) -> pa.Table:
        pk = ray.get(pk_ref)
        hit, _ = _lookup(
            pk, batch["l_partkey"].to_numpy(zero_copy_only=False)
        )
        kept = batch.filter(pa.array(hit))
        g = pa.table(
            {
                "l_partkey": kept["l_partkey"],
                "qty_centi": cents(kept["l_quantity"]),
                "one": pa.array(
                    np.ones(kept.num_rows, np.int64), pa.int64()
                ),
            }
        )
        return (
            g.group_by("l_partkey")
            .aggregate([("qty_centi", "sum"), ("one", "sum")])
            .rename_columns(["l_partkey", "sum_qc", "cnt"])
        )

    li_cols = ["l_partkey", "l_quantity", "l_extendedprice"]
    p1 = _read(sf_dir, "lineitem", columns=li_cols).map_batches(
        pass1, batch_format="pyarrow"
    ).materialize()

    schema1 = pa.schema(
        [
            ("l_partkey", pa.int64()),
            ("sum_qc", pa.int64()),
            ("cnt", pa.int64()),
        ]
    )

    def merge1(g: pa.Table) -> pa.Table:
        return (
            g.group_by("l_partkey")
            .aggregate([("sum_qc", "sum"), ("cnt", "sum")])
            .rename_columns(["l_partkey", "sum_qc", "cnt"])
        )

    if p1.count() <= driver_finish_max:
        blocks = _blocks(p1)
        stats = (
            merge1(pa.concat_tables(blocks))
            if blocks
            else schema1.empty_table()
        )
    else:
        blocks = _blocks(
            bucketed_agg(
                p1, "l_partkey", merge1, schema1, num_buckets=num_buckets
            )
        )
        stats = (
            pa.concat_tables(blocks) if blocks else schema1.empty_table()
        )
    if stats.num_rows == 0:
        return pa.table({"avg_yearly": pa.array([0.0], pa.float64())})
    spk = stats["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    o = np.argsort(spk)
    st_ref = ray.put(
        (
            spk[o],
            stats["sum_qc"].to_numpy(zero_copy_only=False).astype(
                np.int64
            )[o],
            stats["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)[o],
        )
    )

    def pass2(batch: pa.Table) -> pa.Table:
        ks, sq, cn = ray.get(st_ref)
        hit, idx = _lookup(
            ks, batch["l_partkey"].to_numpy(zero_copy_only=False)
        )
        kept = batch.filter(pa.array(hit))
        qc = cents(kept["l_quantity"]).to_numpy(zero_copy_only=False)
        i = idx[hit]
        small = qc * 5 * cn[i] < sq[i]
        total = pc.sum(
            cents(kept["l_extendedprice"]).filter(pa.array(small))
        ).as_py()
        return pa.table({"s": pa.array([total or 0], pa.int64())})

    parts = _blocks(
        _read(sf_dir, "lineitem", columns=li_cols).map_batches(
            pass2, batch_format="pyarrow"
        )
    )
    total = (
        int(pc.sum(pa.concat_tables(parts)["s"]).as_py() or 0)
        if parts
        else 0
    )
    return pa.table(
        {"avg_yearly": pa.array([total / 700.0], pa.float64())}
    )


# ---------------------------------------------------------------------------
# Q19 — discounted revenue under a 3-branch OR predicate
# ---------------------------------------------------------------------------

def q19_discounted_revenue(
    sf_dir: str,
    num_buckets: int = 32,
    broadcast_max_keys: int = 5_000_000,
):
    """TPC-H Q19 shape — revenue from lineitems matching any of three
    (brand, size range, quantity range) predicate branches (container
    and ship-instruction clauses dropped with their columns).

    Plan: part collapses to (partkey, brand-code, size) — broadcast
    under the budget so the whole OR evaluates vectorized inside
    lineitem's single pass (zero shuffles, scalar partials out); above
    it, a partkey-bucketed join with the same branch mask in the
    bucket task.  Quantity bounds compare in centi-units — integers on
    both sides."""
    import ray

    branches = [
        ("Brand#1", 1, 5, 100, 1100),
        ("Brand#2", 1, 10, 1000, 2000),
        ("Brand#3", 1, 15, 2000, 3000),
    ]

    def branch_partial(t: pa.Table) -> pa.Table:
        """(brand, p_size, qty_centi, rev_cents) → 1-row scalar sum."""
        brand = t["p_brand"]
        size = t["p_size"].to_numpy(zero_copy_only=False)
        qc = t["qty_centi"].to_numpy(zero_copy_only=False)
        keep = np.zeros(t.num_rows, dtype=bool)
        for bname, slo, shi, qlo, qhi in branches:
            bm = pc.equal(brand, bname).to_numpy(zero_copy_only=False)
            keep |= (
                bm
                & (size >= slo)
                & (size <= shi)
                & (qc >= qlo)
                & (qc <= qhi)
            )
        s = pc.sum(t["rev_cents"].filter(pa.array(keep))).as_py()
        return pa.table({"s": pa.array([s or 0], pa.int64())})

    n_part = pq.read_metadata(
        os.path.join(sf_dir, "part.parquet")
    ).num_rows
    li = _read(
        sf_dir,
        "lineitem",
        columns=[
            "l_partkey", "l_quantity", "l_extendedprice", "l_discount",
        ],
    )
    if n_part <= broadcast_max_keys:
        part = pq.read_table(
            os.path.join(sf_dir, "part.parquet"),
            columns=["p_partkey", "p_brand", "p_size"],
        )
        pk = part["p_partkey"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        brands = part["p_brand"].combine_chunks().dictionary_encode()
        codes = brands.indices.to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        sizes = part["p_size"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        o = np.argsort(pk)
        p_ref = ray.put((pk[o], codes[o], sizes[o]))
        bdict = brands.dictionary

        def map_rev(batch: pa.Table) -> pa.Table:
            ks, cs, szs = ray.get(p_ref)
            hit, idx = _lookup(
                ks, batch["l_partkey"].to_numpy(zero_copy_only=False)
            )
            kept = batch.filter(pa.array(hit))
            i = idx[hit]
            t = pa.table(
                {
                    "p_brand": bdict.take(pa.array(cs[i])),
                    "p_size": pa.array(szs[i], pa.int64()),
                    "qty_centi": cents(kept["l_quantity"]),
                    "rev_cents": _li_revenue_cents(kept),
                }
            )
            return branch_partial(t)

        parts = _blocks(li.map_batches(map_rev, batch_format="pyarrow"))
    else:
        import ray.data

        part_ds = _read(
            sf_dir, "part", columns=["p_partkey", "p_brand", "p_size"]
        ).map_batches(
            lambda b: pa.table(
                {
                    "l_partkey": pc.cast(b["p_partkey"], pa.int64()),
                    "p_brand": b["p_brand"],
                    "p_size": pc.cast(b["p_size"], pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        li_prep = li.map_batches(
            lambda b: pa.table(
                {
                    "l_partkey": b["l_partkey"],
                    "qty_centi": cents(b["l_quantity"]),
                    "rev_cents": _li_revenue_cents(b),
                }
            ),
            batch_format="pyarrow",
        )
        parts = _blocks(
            hash_bucket_join(
                li_prep,
                part_ds,
                on="l_partkey",
                num_buckets=num_buckets,
                bucket_postprocess=branch_partial,
                left_schema=pa.schema(
                    [
                        ("l_partkey", pa.int64()),
                        ("qty_centi", pa.int64()),
                        ("rev_cents", pa.int64()),
                    ]
                ),
                right_schema=pa.schema(
                    [
                        ("l_partkey", pa.int64()),
                        ("p_brand", pa.string()),
                        ("p_size", pa.int64()),
                    ]
                ),
            )
        )
    total = (
        int(pc.sum(pa.concat_tables(parts)["s"]).as_py() or 0)
        if parts
        else 0
    )
    return pa.table({"revenue_cents": pa.array([total], pa.int64())})


# ---------------------------------------------------------------------------
# Q20 — potential part promotion: suppliers with heavy shipped volume
# ---------------------------------------------------------------------------

def q20_promotion_suppliers(
    sf_dir: str,
    name_prefix: str = "red",
    year_lo: str = "1997-01-01",
    year_hi: str = "1998-01-01",
    min_qty_centi: int = 5000,
    region: str = "EUROPE",
    num_buckets: int = 64,
    driver_finish_max: int = 2_000_000,
):
    """TPC-H Q20 shape — suppliers in ``region`` who shipped more than
    a threshold quantity of any name-matched part in one year
    (ps_availqty > ½·Σqty becomes Σqty_centi > threshold — the
    partsupp table doesn't exist here).

    Plan: name-matched part keys broadcast; lineitem pre-aggregates
    (suppkey, partkey, Σqty_centi) per batch; partials merge
    driver-side when tiny (adaptive finish) else via one suppkey
    ``bucketed_agg`` whose bucket task applies the HAVING cut and
    dedups suppliers before anything returns; the region filter and
    name attach are a supplier-dim driver join (Q5 precedent)."""
    import ray

    lo, hi = np.datetime64(year_lo, "us"), np.datetime64(year_hi, "us")
    part = _part_keys(
        sf_dir,
        lambda p: pc.starts_with(p["p_name"], name_prefix),
    )
    pk_set = np.sort(
        part["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    )
    pk_ref = ray.put(pk_set)

    def prep(batch: pa.Table) -> pa.Table:
        batch = batch.filter(
            pc.and_(
                pc.greater_equal(batch["l_shipdate"], pa.scalar(lo)),
                pc.less(batch["l_shipdate"], pa.scalar(hi)),
            )
        )
        pk = ray.get(pk_ref)
        hit, _ = _lookup(
            pk, batch["l_partkey"].to_numpy(zero_copy_only=False)
        )
        kept = batch.filter(pa.array(hit))
        g = pa.table(
            {
                "l_suppkey": kept["l_suppkey"],
                "l_partkey": kept["l_partkey"],
                "qty_centi": cents(kept["l_quantity"]),
            }
        )
        return (
            g.group_by(["l_suppkey", "l_partkey"])
            .aggregate([("qty_centi", "sum")])
            .rename_columns(["l_suppkey", "l_partkey", "qty_centi"])
        )

    p1 = _read(
        sf_dir, "lineitem",
        columns=["l_suppkey", "l_partkey", "l_quantity", "l_shipdate"],
    ).map_batches(prep, batch_format="pyarrow").materialize()

    schema1 = pa.schema(
        [
            ("l_suppkey", pa.int64()),
            ("l_partkey", pa.int64()),
            ("qty_centi", pa.int64()),
        ]
    )

    def winners(g: pa.Table) -> pa.Table:
        agg = (
            g.group_by(["l_suppkey", "l_partkey"])
            .aggregate([("qty_centi", "sum")])
            .rename_columns(["l_suppkey", "l_partkey", "qty_centi"])
        )
        agg = agg.filter(pc.greater(agg["qty_centi"], min_qty_centi))
        return (
            agg.group_by("l_suppkey")
            .aggregate([])
        )

    if p1.count() <= driver_finish_max:
        blocks = _blocks(p1)
        win = (
            winners(pa.concat_tables(blocks))
            if blocks
            else pa.table({"l_suppkey": pa.array([], pa.int64())})
        )
    else:
        blocks = _blocks(
            bucketed_agg(
                p1, "l_suppkey", winners, schema1, num_buckets=num_buckets
            )
        )
        win = (
            pa.concat_tables(blocks)
            if blocks
            else pa.table({"l_suppkey": pa.array([], pa.int64())})
        )
    win_keys = np.unique(
        win["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    )

    s_nats = _region_nations(sf_dir, region)
    sup = pq.read_table(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_name", "s_nationkey"],
    )
    keep = np.isin(
        sup["s_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64),
        s_nats,
    ) & np.isin(
        sup["s_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64),
        win_keys,
    )
    out = sup.filter(pa.array(keep)).select(["s_suppkey", "s_name"])
    return out.sort_by("s_suppkey")


# ---------------------------------------------------------------------------
# Q21 — suppliers who kept orders waiting
# ---------------------------------------------------------------------------

def q21_waiting_suppliers(
    sf_dir: str,
    region: str = "ASIA",
    num_buckets: int = 64,
    broadcast_max_keys: int = 5_000_000,
    driver_finish_max: int = 2_000_000,
):
    """TPC-H Q21 shape — on finished ('F') orders involving ≥2 distinct
    suppliers where EXACTLY ONE supplier has a returned ('R') line
    (the receipt>commit lateness marker adapted to this schema), count
    such orders per guilty supplier, filtered to one region.

    Plan: lineitem pre-reduces to distinct (orderkey, suppkey, has_R)
    per batch; the per-order analysis needs every supplier of an order
    co-located, so it rides ONE orderkey exchange — under the budget
    the 'F' orderkey set broadcasts and the exchange is a
    ``bucketed_agg``; above it, the F-filter folds INTO the bucket
    task of a ``hash_bucket_join(..., "left semi")`` against the
    F-keys (same single shuffle).  Bucket tasks emit per-supplier
    partial numwait counts; the driver merges supplier-sized rows."""
    import ray

    n_orders = pq.read_metadata(
        os.path.join(sf_dir, "orders.parquet")
    ).num_rows

    fkeys_ds = _read(
        sf_dir, "orders", columns=["o_orderkey", "o_orderstatus"]
    ).map_batches(
        lambda b: b.filter(
            pc.equal(b["o_orderstatus"], "F")
        ).select(["o_orderkey"]),
        batch_format="pyarrow",
    )

    def pairs(batch: pa.Table) -> pa.Table:
        g = pa.table(
            {
                "o_orderkey": batch["l_orderkey"],
                "l_suppkey": batch["l_suppkey"],
                "has_r": pc.cast(
                    pc.equal(batch["l_returnflag"], "R"), pa.int64()
                ),
            }
        )
        return (
            g.group_by(["o_orderkey", "l_suppkey"])
            .aggregate([("has_r", "max")])
            .rename_columns(["o_orderkey", "l_suppkey", "has_r"])
        )

    li = _read(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_suppkey", "l_returnflag"],
    ).map_batches(pairs, batch_format="pyarrow")

    def analyze(g: pa.Table) -> pa.Table:
        """distinct-pair rows of co-located orderkeys → per-supplier
        partial numwait."""
        if g.num_rows == 0:
            return pa.table(
                {
                    "l_suppkey": pa.array([], pa.int64()),
                    "numwait": pa.array([], pa.int64()),
                }
            )
        d = (
            g.group_by(["o_orderkey", "l_suppkey"])
            .aggregate([("has_r", "max")])
            .rename_columns(["o_orderkey", "l_suppkey", "has_r"])
        )
        per_ord = (
            d.group_by("o_orderkey")
            .aggregate([("l_suppkey", "count"), ("has_r", "sum")])
        )
        qual = per_ord.filter(
            pc.and_(
                pc.greater_equal(per_ord["l_suppkey_count"], 2),
                pc.equal(per_ord["has_r_sum"], 1),
            )
        )["o_orderkey"]
        qk = np.sort(qual.to_numpy(zero_copy_only=False).astype(np.int64))
        r_rows = d.filter(pc.equal(d["has_r"], 1))
        hit, _ = _lookup(
            qk, r_rows["o_orderkey"].to_numpy(zero_copy_only=False)
        )
        guilty = r_rows.filter(pa.array(hit))
        agg = guilty.group_by("l_suppkey").aggregate(
            [("l_suppkey", "count")]
        )
        return pa.table(
            {
                "l_suppkey": agg["l_suppkey"],
                "numwait": pc.cast(agg["l_suppkey_count"], pa.int64()),
            }
        )

    schema = pa.schema(
        [
            ("o_orderkey", pa.int64()),
            ("l_suppkey", pa.int64()),
            ("has_r", pa.int64()),
        ]
    )
    if n_orders <= broadcast_max_keys:
        fb = _blocks(fkeys_ds)
        fk = (
            np.sort(
                np.concatenate(
                    [
                        t["o_orderkey"].to_numpy(zero_copy_only=False)
                        for t in fb
                    ]
                ).astype(np.int64)
            )
            if fb
            else np.zeros(0, np.int64)
        )
        f_ref = ray.put(fk)

        def f_filter(batch: pa.Table) -> pa.Table:
            ks = ray.get(f_ref)
            hit, _ = _lookup(
                ks, batch["o_orderkey"].to_numpy(zero_copy_only=False)
            )
            return batch.filter(pa.array(hit))

        filtered = li.map_batches(
            f_filter, batch_format="pyarrow"
        ).materialize()
        # adaptive finish: the F-filtered distinct-pair partials are
        # often tiny — below the gate the per-order analysis runs once
        # driver-side (identical kernel) instead of paying the bucket
        # shuffle's fixed cost
        if filtered.count() <= driver_finish_max:
            blocks = _blocks(filtered)
            parts = [analyze(pa.concat_tables(blocks))] if blocks else []
        else:
            parts = _blocks(
                bucketed_agg(
                    filtered,
                    "o_orderkey",
                    analyze,
                    schema,
                    num_buckets=num_buckets,
                )
            )
    else:
        parts = _blocks(
            hash_bucket_join(
                li,
                fkeys_ds,
                on="o_orderkey",
                num_buckets=num_buckets,
                join_type="left semi",
                bucket_postprocess=analyze,
                left_schema=schema,
                right_schema=pa.schema([("o_orderkey", pa.int64())]),
            )
        )
    empty = pa.table(
        {
            "s_suppkey": pa.array([], pa.int64()),
            "s_name": pa.array([], pa.string()),
            "numwait": pa.array([], pa.int64()),
        }
    )
    if not parts:
        return empty
    merged = (
        pa.concat_tables(parts)
        .group_by("l_suppkey")
        .aggregate([("numwait", "sum")])
        .rename_columns(["s_suppkey", "numwait"])
    )
    s_nats = _region_nations(sf_dir, region)
    sup = pq.read_table(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_name", "s_nationkey"],
    )
    keep = np.isin(
        sup["s_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64),
        s_nats,
    )
    sup = sup.filter(pa.array(keep))
    sk = sup["s_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    so = np.argsort(sk)
    mk = merged["s_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    hit, idx = _lookup(sk[so], mk)
    kept = merged.filter(pa.array(hit))
    names = sup["s_name"].take(pa.array(so[idx[hit]]))
    return pa.table(
        {
            "s_suppkey": kept["s_suppkey"],
            "s_name": names,
            "numwait": kept["numwait"],
        }
    ).sort_by(
        [("numwait", "descending"), ("s_suppkey", "ascending")]
    )


# ---------------------------------------------------------------------------
# Q2 — minimum-cost supplier per part (correlated min)
# ---------------------------------------------------------------------------

def q2_min_cost_supplier(
    sf_dir: str,
    p_type: str = "STANDARD",
    min_size: int = 25,
    region: str = "EUROPE",
    num_buckets: int = 64,
    driver_finish_max: int = 2_000_000,
):
    """TPC-H Q2 shape — for parts of one type with p_size ≥ N, the
    region supplier(s) offering the minimum supply cost, with the
    correlated ``cost = (SELECT min(...) ...)`` subquery.  Adapted:
    supply cost = min observed unit sale price, floor((extprice /
    qty)*100 + .5) centi-units — integer, so min/equality are exact on
    both sides.

    Plan: filtered part dim and region supplier dim are driver-side
    (broadcast-budget boundary documented on ``_part_keys`` /
    ``_supplier_nation_ref``); lineitem pre-aggregates (part, supp,
    min cost) per batch; partials merge driver-side when tiny
    (adaptive finish) else via one partkey ``bucketed_agg`` — a part
    lives in exactly one bucket, so the per-part min AND the equality
    cut both finish inside the bucket task."""
    import ray

    part = _part_keys(
        sf_dir,
        lambda p: pc.and_(
            pc.equal(p["p_type"], p_type),
            pc.greater_equal(p["p_size"], min_size),
        ),
        columns=("p_partkey", "p_name"),
    )
    pk_set = np.sort(
        part["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    )
    pk_ref = ray.put(pk_set)

    s_nats = _region_nations(sf_dir, region)
    sup = pq.read_table(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_name", "s_acctbal", "s_nationkey"],
    )
    keep = np.isin(
        sup["s_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64),
        s_nats,
    )
    sup = sup.filter(pa.array(keep)).combine_chunks()
    sk_set = np.sort(
        sup["s_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    )
    sk_ref = ray.put(sk_set)

    def prep(batch: pa.Table) -> pa.Table:
        pk = ray.get(pk_ref)
        sk = ray.get(sk_ref)
        phit, _ = _lookup(
            pk, batch["l_partkey"].to_numpy(zero_copy_only=False)
        )
        kept = batch.filter(pa.array(phit))
        shit, _ = _lookup(
            sk, kept["l_suppkey"].to_numpy(zero_copy_only=False)
        )
        kept = kept.filter(pa.array(shit))
        ep = pc.cast(kept["l_extendedprice"], pa.float64())
        qty = pc.cast(kept["l_quantity"], pa.float64())
        cost = cents(pc.divide(ep, qty))
        g = pa.table(
            {
                "l_partkey": kept["l_partkey"],
                "l_suppkey": kept["l_suppkey"],
                "cost_centi": cost,
            }
        )
        return (
            g.group_by(["l_partkey", "l_suppkey"])
            .aggregate([("cost_centi", "min")])
            .rename_columns(["l_partkey", "l_suppkey", "cost_centi"])
        )

    p1 = _read(
        sf_dir, "lineitem",
        columns=["l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"],
    ).map_batches(prep, batch_format="pyarrow").materialize()

    schema = pa.schema(
        [
            ("l_partkey", pa.int64()),
            ("l_suppkey", pa.int64()),
            ("cost_centi", pa.int64()),
        ]
    )

    def winners(g: pa.Table) -> pa.Table:
        agg = (
            g.group_by(["l_partkey", "l_suppkey"])
            .aggregate([("cost_centi", "min")])
            .rename_columns(["l_partkey", "l_suppkey", "cost_centi"])
        )
        pmin = (
            agg.group_by("l_partkey")
            .aggregate([("cost_centi", "min")])
            .rename_columns(["l_partkey", "min_cost"])
        )
        j = agg.join(pmin, keys="l_partkey", join_type="inner")
        return j.filter(
            pc.equal(j["cost_centi"], j["min_cost"])
        ).select(["l_partkey", "l_suppkey", "cost_centi"])

    if p1.count() <= driver_finish_max:
        blocks = _blocks(p1)
        win = (
            winners(pa.concat_tables(blocks))
            if blocks
            else schema.empty_table()
        )
    else:
        blocks = _blocks(
            bucketed_agg(
                p1, "l_partkey", winners, schema, num_buckets=num_buckets
            )
        )
        win = pa.concat_tables(blocks) if blocks else schema.empty_table()
    empty = pa.table(
        {
            "p_partkey": pa.array([], pa.int64()),
            "p_name": pa.array([], pa.string()),
            "s_suppkey": pa.array([], pa.int64()),
            "s_name": pa.array([], pa.string()),
            "n_name": pa.array([], pa.string()),
            "supply_cost_centi": pa.array([], pa.int64()),
            "s_acctbal_cents": pa.array([], pa.int64()),
        }
    )
    if win.num_rows == 0:
        return empty
    # attach part / supplier / nation attributes (all dim-sized)
    ppk = part["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    po = np.argsort(ppk)
    wpk = win["l_partkey"].to_numpy(zero_copy_only=False)
    pidx = po[np.searchsorted(ppk[po], wpk)]
    ssk = sup["s_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    so = np.argsort(ssk)
    wsk = win["l_suppkey"].to_numpy(zero_copy_only=False)
    sidx = so[np.searchsorted(ssk[so], wsk)]
    nk, nn = _nation_names(sf_dir)
    snat = sup["s_nationkey"].to_numpy(zero_copy_only=False).astype(
        np.int64
    )[sidx]
    return pa.table(
        {
            "p_partkey": win["l_partkey"],
            "p_name": part["p_name"].take(pa.array(pidx)),
            "s_suppkey": win["l_suppkey"],
            "s_name": sup["s_name"].take(pa.array(sidx)),
            "n_name": nn.take(pa.array(np.searchsorted(nk, snat))),
            "supply_cost_centi": win["cost_centi"],
            "s_acctbal_cents": cents(sup["s_acctbal"]).take(
                pa.array(sidx)
            ),
        }
    ).sort_by(
        [("p_partkey", "ascending"), ("s_suppkey", "ascending")]
    )

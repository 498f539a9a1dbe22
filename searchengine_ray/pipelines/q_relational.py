"""Relational pipelines: joins and TPC-H-style aggregation queries.

Split from the former pipelines/queries.py monolith (round 4)."""
from __future__ import annotations

import hashlib
import math
import os
from pathlib import Path
import numpy as np
import pandas as pd
from ..analysis.stopwords import EN_STOP_WORDS, STOP_WORDS


def q_orders_topk(sf_dir: str) -> pd.DataFrame:
    """K2/K4 as Dataset ops: global sort + limit."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"])
    out = ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(20).to_pandas()
    return out.astype({"o_orderkey": "int64"})

def sql_orders_topk() -> str:
    # ties on o_totalprice would make LIMIT ambiguous; synthetic prices are distinct
    return """
SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
"""

def q_tpch_q1(sf_dir: str) -> pd.DataFrame:
    """Generic grouped aggregation (pre-aggregation pattern demo).

    ``sum_revenue`` is aggregated in EXACT fixed point: price and
    discount carry exactly 2 decimals each, so per-row revenue is
    exact in 10^-4 units and the group sum is an order-independent
    int64 (≈5·10^13 per group at sf0.1 — nowhere near the 9.2·10^18
    ceiling even at 10^5× that). Float summation of 600k+ terms
    differs from the oracle's own order by ~1 ulp at the 13th
    significant digit, which flips the 4-digit rounding of a 5·10^9
    total — observed once at sf0.1, never at sf0.01. Fixed point makes
    the value identical at ANY scale and summation order."""
    import ray.data as rd
    from ray.data.aggregate import Count, Mean, Sum

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def revenue(batch):
        import pyarrow as pa

        ep = np.round(
            batch["l_extendedprice"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        dm = np.round(
            (1.0 - batch["l_discount"].to_numpy(zero_copy_only=False)) * 100.0
        ).astype(np.int64)
        return batch.append_column("rev4", pa.array(ep * dm, pa.int64()))

    out = (
        ds.map_batches(revenue, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("l_quantity", alias_name="sum_qty"),
            Sum("rev4", alias_name="rev4_total"),
            Mean("l_discount", alias_name="avg_disc"),
            Count(alias_name="n_rows"),
        )
        .to_pandas()
    )
    out["sum_qty"] = out["sum_qty"].round(4)
    out["sum_revenue"] = (out["rev4_total"] / 10_000.0).round(4)
    out["avg_disc"] = out["avg_disc"].round(6)
    return out.drop(columns=["rev4_total"]).astype({"n_rows": "int64"})[
        ["l_returnflag", "l_linestatus", "sum_qty", "sum_revenue", "avg_disc", "n_rows"]
    ]

def sql_tpch_q1() -> str:
    return """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 4) AS sum_qty,
       round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                 * CAST(round((1.0 - l_discount) * 100) AS BIGINT)) / 10000.0,
             4) AS sum_revenue,
       round(avg(l_discount), 6) AS avg_disc,
       count(*) AS n_rows
FROM lineitem GROUP BY l_returnflag, l_linestatus
"""

def q_broadcast_join(sf_dir: str) -> pd.DataFrame:
    """Broadcast join: nation (small) into customer (big) via ray.put —
    the J5-style lookup pattern (no shuffle)."""
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd
    from ray.data.aggregate import Count

    nation = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    lut = dict(zip(nation["n_nationkey"], nation["n_name"]))
    ref = ray.put(lut)

    def add_nation(batch, _ref=ref):
        import pyarrow as pa

        lut = ray.get(_ref)
        keys = batch["c_nationkey"].to_pylist()
        return batch.append_column(
            "n_name", pa.array([lut.get(k) for k in keys], pa.string())
        )

    ds = rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    out = (
        ds.map_batches(add_nation, batch_format="pyarrow")
        .groupby("n_name")
        .aggregate(Count(alias_name="n_customers"))
        .to_pandas()
    )
    return out.astype({"n_customers": "int64"})

def sql_broadcast_join() -> str:
    return """
SELECT n.n_name, count(*) AS n_customers
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
"""

def q_hash_join(sf_dir: str) -> pd.DataFrame:
    """Ray Data's NATIVE hash join (Dataset.join, hash-shuffle both
    sides) — the big⋈big path, complementing `broadcast_join` (small
    side via ray.put) and the custom asof/range joins: orders ⋈
    customer on custkey → revenue per market segment."""
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"])
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"])
    out = (
        orders.join(
            cust, join_type="inner", num_partitions=8,
            on=("o_custkey",), right_on=("c_custkey",),
        )
        .groupby("c_mktsegment")
        .aggregate(
            Count(alias_name="n_orders"),
            Sum("o_totalprice", alias_name="revenue"),
        )
        .to_pandas()
    )
    out["revenue"] = out["revenue"].round(4)
    return out.astype({"n_orders": "int64"})

def sql_hash_join() -> str:
    return """
SELECT c.c_mktsegment, count(*) AS n_orders,
       round(sum(o.o_totalprice), 4) AS revenue
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
"""

def q_group_topk(sf_dir: str) -> pd.DataFrame:
    """Group-wise top-k: best 3 documents per language by length
    (per-batch partial top-k combiner → one shuffle → exact cut)."""
    import ray.data as rd

    from searchengine_ray.functions.sampling import group_topk

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "n_chars"])
    out = group_topk(
        ds, group_col="lang", order_col="n_chars", tie_col="doc_id", k=3
    ).to_pandas()
    return out[["lang", "doc_id", "n_chars", "rank"]].astype(
        {"doc_id": "int64", "n_chars": "int64", "rank": "int64"}
    )

def sql_group_topk() -> str:
    return """
SELECT lang, doc_id, n_chars, "rank" FROM (
  SELECT lang, doc_id, n_chars,
         row_number() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id) AS "rank"
  FROM documents
) WHERE "rank" <= 3
"""

def q_histogram(sf_dir: str) -> pd.DataFrame:
    """Fixed-width value histogram (width 10): the bucket key derives in
    the map (vectorized floor-div), so the shuffle cardinality is the
    bucket count, not the row count."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd
    from ray.data.aggregate import Count

    def bucketize(b: pa.Table) -> pa.Table:
        bkt = pc.floor(pc.divide(b["value"], 10.0))
        return pa.table({"bucket": pc.cast(bkt, pa.int64())})

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["value"])
    out = (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Count(alias_name="n"))
        .to_pandas()
    )
    return out.astype({"bucket": "int64", "n": "int64"})

def sql_histogram() -> str:
    return """
SELECT CAST(floor(value / 10.0) AS BIGINT) AS bucket, count(*) AS n
FROM events GROUP BY 1
"""

def q_tpch_q6(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q6 shape (forecast revenue): pure scan with pruned columns
    + vectorized predicate + one global sum — zero shuffle beyond the
    scalar reduce."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd
    from ray.data.aggregate import Sum

    lo = pd.Timestamp("1996-01-01").to_pydatetime()
    hi = pd.Timestamp("1997-01-01").to_pydatetime()

    def rev(b: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.and_(
                pc.greater_equal(b["l_shipdate"], pa.scalar(lo, pa.timestamp("us"))),
                pc.less(b["l_shipdate"], pa.scalar(hi, pa.timestamp("us"))),
            ),
            pc.and_(
                pc.and_(
                    pc.greater_equal(b["l_discount"], 0.02),
                    pc.less_equal(b["l_discount"], 0.04),
                ),
                pc.less(b["l_quantity"], 24.0),
            ),
        )
        f = b.filter(m)
        return pa.table(
            {"part": pa.array([float(pc.sum(
                pc.multiply(f["l_extendedprice"], f["l_discount"])
            ).as_py() or 0.0)], pa.float64())}
        )

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"],
    )
    out = ds.map_batches(rev, batch_format="pyarrow").aggregate(Sum("part", alias_name="revenue"))
    return pd.DataFrame({"revenue": pd.Series([round(out["revenue"] or 0.0, 4)], dtype="float64")})

def sql_tpch_q6() -> str:
    return """
SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.02 AND 0.04 AND l_quantity < 24
"""

def q_tpch_q3(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q3 shape (shipping-priority): the composed relational
    pipeline — small-side broadcast semi-join (BUILDING customers →
    orders filter, no shuffle), date predicates pushed into the scans,
    ONE native hash join on the fact keys, grouped revenue, top-10.
    Ranking is by round(revenue, 4) then l_orderkey so double partial-
    sum order can't flip near-ties across engines."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    cutoff = pd.Timestamp("1998-06-01")
    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    building = cust.filter(pc.equal(cust["c_mktsegment"], "BUILDING"))["c_custkey"]
    keys_ref = ray.put(building.to_numpy(zero_copy_only=False).astype(np.int64))

    cut_scalar = pa.scalar(cutoff.to_pydatetime(), pa.timestamp("us"))

    def orders_semi(b: pa.Table, _ref=keys_ref) -> pa.Table:
        b = b.filter(pc.less(b["o_orderdate"], cut_scalar))
        keys = ray.get(_ref)
        mask = np.isin(b["o_custkey"].to_numpy(zero_copy_only=False), keys)
        return b.filter(pa.array(mask)).select(
            ["o_orderkey", "o_orderdate", "o_orderpriority"]
        )

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
    ).map_batches(orders_semi, batch_format="pyarrow")

    def revenue(b: pa.Table) -> pa.Table:
        b = b.filter(pc.greater(b["l_shipdate"], cut_scalar))
        rev = pc.multiply(b["l_extendedprice"], pc.subtract(1.0, b["l_discount"]))
        return pa.table({"l_orderkey": b["l_orderkey"], "rev": rev})

    line = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
    ).map_batches(revenue, batch_format="pyarrow")

    out = (
        line.join(orders, join_type="inner", num_partitions=8,
                  on=("l_orderkey",), right_on=("o_orderkey",))
        .groupby(["l_orderkey", "o_orderdate", "o_orderpriority"])
        .aggregate(Sum("rev", alias_name="revenue"))
        .to_pandas()
    )
    out["revenue"] = out["revenue"].round(4)
    out = out.sort_values(["revenue", "l_orderkey"], ascending=[False, True]).head(10)
    return out[["l_orderkey", "revenue", "o_orderdate", "o_orderpriority"]].reset_index(
        drop=True
    ).astype({"l_orderkey": "int64"})

def sql_tpch_q3() -> str:
    return """
SELECT l_orderkey,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
       o_orderdate, o_orderpriority
FROM customer JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-06-01'
  AND l_shipdate  > TIMESTAMP '1998-06-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey LIMIT 10
"""

def q_tpch_q10(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q10 shape (returned-item reporting): date-windowed orders ⋈
    returned lineitems as ONE native hash join on the fact keys, revenue
    pre-grouped to customer grain BEFORE touching the customer table
    (the aggregate shrinks the fact side to customer cardinality), then
    one hash join to customer and a broadcast nation-name lookup."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    lo = pa.scalar(pd.Timestamp("1996-01-01").to_pydatetime(), pa.timestamp("us"))
    hi = pa.scalar(pd.Timestamp("1996-07-01").to_pydatetime(), pa.timestamp("us"))

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(
        lambda b: b.filter(
            pc.and_(pc.greater_equal(b["o_orderdate"], lo), pc.less(b["o_orderdate"], hi))
        ).select(["o_orderkey", "o_custkey"]),
        batch_format="pyarrow",
    )

    def returned_rev(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b["l_returnflag"], "R"))
        rev = pc.multiply(b["l_extendedprice"], pc.subtract(1.0, b["l_discount"]))
        return pa.table({"l_orderkey": b["l_orderkey"], "rev": rev})

    line = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_returnflag"],
    ).map_batches(returned_rev, batch_format="pyarrow")

    by_cust = (
        line.join(orders, join_type="inner", num_partitions=8,
                  on=("l_orderkey",), right_on=("o_orderkey",))
        .groupby("o_custkey")
        .aggregate(Sum("rev", alias_name="revenue"))
    )
    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name", "c_nationkey"]
    )
    joined = by_cust.join(
        cust, join_type="inner", num_partitions=8, on=("o_custkey",), right_on=("c_custkey",)
    ).to_pandas()

    nation = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    nmap = dict(zip(nation["n_nationkey"].to_pylist(), nation["n_name"].to_pylist()))
    joined["n_name"] = joined["c_nationkey"].map(nmap)
    joined["revenue"] = joined["revenue"].round(4)
    out = (
        joined.rename(columns={"o_custkey": "c_custkey"})
        .sort_values(["revenue", "c_custkey"], ascending=[False, True])
        .head(20)
        .reset_index(drop=True)
    )
    return out[["c_custkey", "c_name", "revenue", "n_name"]].astype({"c_custkey": "int64"})

def sql_tpch_q10() -> str:
    return """
SELECT c_custkey, c_name,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue, n_name
FROM customer JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1996-07-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey LIMIT 20
"""

def q_anti_join(sf_dir: str) -> pd.DataFrame:
    """ANTI join: customers with no orders — distinct right keys are
    combiner-collapsed then broadcast for a vectorized isin probe (the
    dimension-sized tier; the fact-scale co-partition tier of the same
    operator is pytest-verified against it). functions/joins.py."""
    import ray.data as rd

    from searchengine_ray.functions.joins import semi_anti_join

    import pyarrow as pa
    import pyarrow.compute as pc

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"])
    cut = pa.scalar(pd.Timestamp("1996-01-01").to_pydatetime(), pa.timestamp("us"))
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderdate"]
    ).map_batches(
        lambda b: b.filter(pc.less(b["o_orderdate"], cut)).select(["o_custkey"]),
        batch_format="pyarrow",
    )
    out = (
        semi_anti_join(cust, orders, "c_custkey", "o_custkey", anti=True)
        .to_pandas()
        .sort_values("c_custkey")
        .reset_index(drop=True)
    )
    return out.astype({"c_custkey": "int64"})

def sql_anti_join() -> str:
    return """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate < TIMESTAMP '1996-01-01')
"""

def q_tpch_q5(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q5 shape (local-supplier revenue): six-table join planned
    for scale — region/nation/supplier collapse to broadcast lookup
    arrays (tiny sides, ``ray.put`` once); customer⋈orders and
    (that)⋈lineitem run as native distributed hash joins on the fact
    keys; the c_nationkey = s_nationkey locality predicate applies
    vectorized inside ``map_batches`` right after the join so mismatched
    rows never reach the aggregate."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    nation = pq.read_table(f"{sf_dir}/nation.parquet")
    region = pq.read_table(f"{sf_dir}/region.parquet")
    asia_rk = region.filter(pc.equal(region["r_name"], "ASIA"))["r_regionkey"][0].as_py()
    nat = nation.filter(pc.equal(nation["n_regionkey"], asia_rk))
    asia_keys = nat["n_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    nat_names = {int(k): v for k, v in zip(asia_keys, nat["n_name"].to_pylist())}

    supp = pq.read_table(f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"])
    s_keys = supp["s_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    s_nat = supp["s_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    # dense suppkey → nationkey array (-1 = not an ASIA supplier)
    s_map = np.full(int(s_keys.max()) + 1, -1, np.int64)
    asia_set = set(asia_keys.tolist())
    for k, nk in zip(s_keys, s_nat):
        if int(nk) in asia_set:
            s_map[k] = nk
    supp_ref = ray.put(s_map)

    lo = pa.scalar(pd.Timestamp("1996-01-01").to_pydatetime(), pa.timestamp("us"))
    hi = pa.scalar(pd.Timestamp("1997-01-01").to_pydatetime(), pa.timestamp("us"))

    def orders_window(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(pc.greater_equal(b["o_orderdate"], lo), pc.less(b["o_orderdate"], hi))
        )
        return b.select(["o_orderkey", "o_custkey"])

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(orders_window, batch_format="pyarrow")

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    # distributed hash join: orders ⋈ customer on custkey (both fact-scale)
    ord_nat = orders.join(
        cust, join_type="inner", num_partitions=8, on=("o_custkey",), right_on=("c_custkey",)
    )

    line = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )
    joined = line.join(
        ord_nat, join_type="inner", num_partitions=8, on=("l_orderkey",), right_on=("o_orderkey",)
    )

    def local_revenue(b: pa.Table, _ref=supp_ref) -> pa.Table:
        smap = ray.get(_ref)
        sk = b["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        cn = b["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        snat = np.where(sk < len(smap), smap[np.minimum(sk, len(smap) - 1)], -1)
        mask = snat == cn  # local-supplier predicate (and drops non-ASIA)
        rev = pc.multiply(b["l_extendedprice"], pc.subtract(1.0, b["l_discount"]))
        return pa.table(
            {
                "nationkey": pa.array(cn[mask], pa.int64()),
                "rev": pa.array(rev.to_numpy(zero_copy_only=False)[mask], pa.float64()),
            }
        )

    out = (
        joined.map_batches(local_revenue, batch_format="pyarrow")
        .groupby("nationkey")
        .aggregate(Sum("rev", alias_name="revenue"))
        .to_pandas()
    )
    out["n_name"] = out["nationkey"].map(nat_names)
    out["revenue"] = out["revenue"].round(4)
    out = out.sort_values(["revenue", "n_name"], ascending=[False, True]).reset_index(drop=True)
    return out[["n_name", "revenue"]]

def sql_tpch_q5() -> str:
    return """
SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM customer JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA' AND c_nationkey = s_nationkey
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY n_name ORDER BY revenue DESC, n_name
"""

def q_custdist(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q13 shape (count-of-counts): orders-per-customer histogram
    including zero-order customers. One fact groupby gives per-customer
    counts; the zero bucket is total customers minus customers seen
    (two scalars) — no customer⟕orders join materializes; the second
    groupby is over the tiny count domain."""
    import pyarrow.parquet as pq
    import ray.data as rd
    from ray.data.aggregate import Count

    per_cust = (
        rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey"])
        .groupby("o_custkey")
        .aggregate(Count(alias_name="c_count"))
    )
    n_with_orders = per_cust.count()
    hist = (
        per_cust.groupby("c_count").aggregate(Count(alias_name="custdist")).to_pandas()
    )
    n_cust = pq.read_metadata(f"{sf_dir}/customer.parquet").num_rows
    zero = int(n_cust - n_with_orders)
    if zero:
        hist = pd.concat(
            [hist, pd.DataFrame({"c_count": [0], "custdist": [zero]})],
            ignore_index=True,
        )
    hist = hist.sort_values(["custdist", "c_count"], ascending=[False, False])
    return hist.reset_index(drop=True).astype({"c_count": "int64", "custdist": "int64"})

def sql_custdist() -> str:
    return """
WITH o AS (SELECT o_custkey, count(*) AS c_count FROM orders GROUP BY 1),
j AS (SELECT coalesce(o.c_count, 0) AS c_count
      FROM customer c LEFT JOIN o ON c.c_custkey = o.o_custkey)
SELECT c_count, count(*) AS custdist FROM j GROUP BY c_count
"""

def q_tpch_q18(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q18 shape (large-volume customers): order-grain quantity
    rollup (the ONE fact-scale shuffle) → HAVING filter. Big orders are
    rare by construction, so the surviving key set is broadcast
    (``ray.put`` once) and orders/customer are reduced by shuffle-free
    ``np.isin`` filters inside ``map_batches``; the final small×small
    joins happen on the driver. A size gate (500k surviving orders)
    falls back to distributed hash joins if the HAVING filter ever
    stops being selective — same values either way."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    big = (
        rd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_quantity"])
        .groupby("l_orderkey")
        .aggregate(Sum("l_quantity", alias_name="sum_qty"))
        .map_batches(
            lambda b: b.filter(pc.greater(b["sum_qty"], 250.0)), batch_format="pyarrow"
        )
    )
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    )
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"])

    # gate BEFORE collecting: count() on the materialized rollup is
    # driver-safe at any scale, and the fallback reuses the same
    # materialized Dataset instead of re-running the lineitem groupby
    big = big.materialize()
    if big.count() <= 500_000:
        big_pd = big.to_pandas()  # HAVING-filtered: rare orders only
        keys = np.sort(big_pd["l_orderkey"].to_numpy(np.int64))
        keys_ref = ray.put(keys)

        def probe(b: pa.Table, col: str, _r=keys_ref) -> pa.Table:
            member = np.isin(
                b[col].to_numpy(zero_copy_only=False), ray.get(_r)
            )
            return b.filter(pa.array(member))

        of = orders.map_batches(
            lambda b: probe(b, "o_orderkey"), batch_format="pyarrow"
        ).to_pandas()  # ≤ |keys| rows
        ck = np.sort(of["o_custkey"].unique().astype(np.int64))
        ck_ref = ray.put(ck)
        cf = cust.map_batches(
            lambda b: probe(b, "c_custkey", _r=ck_ref), batch_format="pyarrow"
        ).to_pandas()
        out = (
            big_pd.merge(of, left_on="l_orderkey", right_on="o_orderkey")
            .merge(cf, left_on="o_custkey", right_on="c_custkey")
            .drop(columns=["o_orderkey", "c_custkey"])
        )
    else:  # non-selective HAVING: keep everything distributed
        joined = big.join(
            orders, join_type="inner", num_partitions=8,
            on=("l_orderkey",), right_on=("o_orderkey",),
        ).join(cust, join_type="inner", num_partitions=8,
               on=("o_custkey",), right_on=("c_custkey",))

        def block_topk(b: pa.Table) -> pa.Table:
            df = b.to_pandas()
            df = df.sort_values(["o_totalprice", "l_orderkey"], ascending=[False, True])
            return pa.Table.from_pandas(df.head(20), preserve_index=False)

        out = joined.map_batches(block_topk, batch_format="pyarrow").to_pandas()

    out = out.sort_values(["o_totalprice", "l_orderkey"], ascending=[False, True]).head(20)
    out["o_totalprice"] = out["o_totalprice"].round(4)
    out["sum_qty"] = out["sum_qty"].round(4)
    out = out.rename(columns={"l_orderkey": "o_orderkey"})
    return out[
        ["c_name", "o_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty"]
    ].reset_index(drop=True).astype({"o_custkey": "int64", "o_orderkey": "int64"})

def sql_tpch_q18() -> str:
    return """
WITH big AS (
  SELECT l_orderkey, sum(l_quantity) AS sum_qty
  FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 250)
SELECT c.c_name, o.o_custkey, o.o_orderkey, o.o_orderdate,
       round(o.o_totalprice, 4) AS o_totalprice, round(b.sum_qty, 4) AS sum_qty
FROM big b
JOIN orders o ON o.o_orderkey = b.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 20
"""

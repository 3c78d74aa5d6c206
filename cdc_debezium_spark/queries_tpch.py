"""Flagship multi-join analytic queries (TPC-H shapes Q3/Q5/Q10/Q18).

The reference's warehouse sinks exist to serve exactly these reporting
shapes downstream (reference README.md:49 — DW / ClickHouse analytics
over the CDC-landed tables); this module runs them directly on the
engine. Spark side is DataFrame API — dimension tables broadcast,
fact-fact joins shuffle on their keys with AQE re-planning — and each
oracle is portable ANSI SQL over the same parquet.

Determinism notes (cross-engine hash gate):
- money aggregates sum EXACTLY as DECIMAL(18,4) (the per-row product
  of 2dp price × 2dp discount has at most 4 decimals, and the
  double→decimal cast rounds identically on both engines), then emit
  as the decimal's nearest double — bit-stable where round(sum(dbl),2)
  diverges on .xx5 boundaries. Scale-REDUCING decimal casts are
  forbidden: DuckDB truncates where Spark rounds;
- top-k uses a TOTAL order (measure desc, key asc) so ties cannot
  reorder between engines. Spark executes orderBy+limit as
  TakeOrderedAndProject — per-partition top-k then a k-row merge, no
  global sort, which is the 100 TB-safe top-k plan;
- l_quantity is integer-valued, so its sums are exact in float64 and
  cast to BIGINT.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from .registry import query
from .sources.catalog import load_table

def _revenue():
    # built lazily: Column construction needs a live SparkContext, and
    # this module imports at registry load time (before any session)
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


def _ts(s: str):
    return F.lit(s).cast("timestamp")


@query(
    "tpch_q3",
    oracle="""
    SELECT l_orderkey, o_orderdate,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def tpch_q3(spark, sf_dir):
    """Q3 shipping priority: segment filter pushes to the customer
    scan, orders⋈lineitem shuffles on the order key, top-10 runs as
    TakeOrderedAndProject (no global sort)."""
    cust = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < _ts("1998-01-01 00:00:00")
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > _ts("1998-01-01 00:00:00")
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(_revenue().cast("decimal(18,4)")).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@query(
    "tpch_q5",
    oracle="""
    SELECT n_name, CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def tpch_q5(spark, sf_dir):
    """Q5 local-supplier volume: the 6-table snowflake. nation⋈region
    broadcast (tiny dims); the fact chain shuffles on its join keys;
    the same-nation predicate rides the supplier join condition."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1997-01-01 00:00:00"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nations = (
        load_table(spark, sf_dir, "nation")
        .join(
            F.broadcast(load_table(spark, sf_dir, "region")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .where(F.col("r_name") == "ASIA")
        .select("n_nationkey", "n_name")
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            supp,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nations), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.sum(_revenue().cast("decimal(18,4)")).cast("double").alias("revenue"))
    )


@query(
    "tpch_q10",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal, n_name,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def tpch_q10(spark, sf_dir):
    """Q10 returned-item reporting: returnflag filter pushes to the
    lineitem scan, nation broadcasts, top-20 customers by lost
    revenue via TakeOrderedAndProject."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1996-04-01 00:00:00"))
    )
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    nation = load_table(spark, sf_dir, "nation")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(_revenue().cast("decimal(18,4)")).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@query(
    "tpch_q18",
    oracle="""
    WITH big AS (
      SELECT l_orderkey
      FROM lineitem
      GROUP BY l_orderkey
      HAVING sum(l_quantity) > 300
    )
    SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
           CAST(sum(l_quantity) AS BIGINT) AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN big      ON big.l_orderkey = lineitem.l_orderkey
    GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
    """,
)
def tpch_q18(spark, sf_dir):
    """Q18 large-volume customers: the HAVING semi-join — the big-order
    keys come from one aggregation over lineitem and semi-join back
    (exact integer quantity sums, so the >300 cut is engine-exact)."""
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .where(F.col("q") > 300)
        .select("l_orderkey")
    )
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li.join(big, "l_orderkey"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum("l_quantity").cast("bigint").alias("total_qty"))
    )

"""Additional SQL-surface queries in the TPC-H shapes (E5 — reference
README.md:14-18: the output exists so SQL engines can run exactly these).
Q1 lives in relational.q_sql; here: Q3 (shipping priority — 3-way join +
agg + top-k), Q6 (forecast revenue — pure scan-filter-agg, the pushdown
showcase), and the approximate-aggregate variants that are the honest 100 TB
path (sketches: HLL distinct, quantile digest) — approximations are
engine-specific, so they are declared rows-only (no value oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rosbag2parquet_spark.sources.catalog import load_table, register_views


def q_sql_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: unshipped-order revenue by (orderkey, orderdate,
    priority), top 10. customer broadcast; orders↔lineitem sort-merge;
    TakeOrderedAndProject caps the result."""
    register_views(spark, sf_dir, ("customer", "orders", "lineitem"))
    return spark.sql(
        """
        SELECT o_orderkey,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               unix_micros(o_orderdate) AS orderdate_us,
               o_orderpriority
        FROM customer JOIN orders ON c_custkey = o_custkey
                      JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate  > TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY o_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, o_orderkey
        LIMIT 10
        """
    )


ORACLE_SQL_Q3 = """
SELECT o_orderkey,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       epoch_us(o_orderdate) AS orderdate_us,
       o_orderpriority
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate  > TIMESTAMP '1997-01-01 00:00:00'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey
LIMIT 10
"""


def q_sql_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: revenue from discounted small-quantity lineitems in
    one year. Pure scan→filter→agg: every predicate reaches the parquet
    scan (range + between), zero joins, zero wide operators — the chunk-
    statistics skipping showcase (reference README.md:8)."""
    register_views(spark, sf_dir, ("lineitem",))
    return spark.sql(
        """
        SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
               count(*) AS n_items
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
        """
    )


ORACLE_SQL_Q6 = """
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
       count(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


def q_approx_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based aggregates — the 100 TB default for distinct counts and
    quantiles: approx_count_distinct (HyperLogLog++, constant memory,
    mergeable) and percentile_approx (quantile digest). Estimates are
    engine-specific, so this query is declared WITHOUT a value oracle (the
    driver records a rows-only check); the exact twins (`distinct-count`,
    `quantiles`) carry the value parity. Sanity bounds are unit-tested."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx_orders"),
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("approx_p50"),
        F.percentile_approx("l_extendedprice", 0.99, 10000).alias("approx_p99"),
    )


QUERIES = {
    "sql-q3": q_sql_q3,
    "sql-q6": q_sql_q6,
    "approx-stats": q_approx_stats,
}

ORACLES = {
    "sql-q3": ORACLE_SQL_Q3,
    "sql-q6": ORACLE_SQL_Q6,
    # approx-stats: intentionally no oracle — sketch estimates are
    # engine-specific; driver records rows-only.
}

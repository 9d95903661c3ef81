"""Set operations, binning, statistics, and generator expressions — the
last slice of the general-purpose SQL surface (E5): INTERSECT, histogram
binning, corr/covariance aggregates, ordered string aggregation, and
sequence-generate + explode (the inverse of aggregation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rosbag2parquet_spark.sources.catalog import load_table

# -------------------------------------------------------------- intersect


def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: users who both purchased and errored (set semantics,
    deduplicated). Compiles to a left-semi over distinct sets."""
    ev = load_table(spark, sf_dir, "events")
    buyers = ev.filter(F.col("event_type") == "purchase").select("user_id")
    erring = ev.filter(F.col("event_type") == "error").select("user_id")
    return buyers.intersect(erring)


ORACLE_INTERSECT = """
SELECT user_id FROM events WHERE event_type = 'purchase'
INTERSECT
SELECT user_id FROM events WHERE event_type = 'error'
"""


# -------------------------------------------------------------- histogram


def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of order prices (10k-wide bins) — binning via
    floor arithmetic (portable across engines, unlike width_bucket
    variants). One narrow projection + one low-cardinality hash-agg."""
    orders = load_table(spark, sf_dir, "orders")
    bin_col = F.floor(F.col("o_totalprice") / 50000).cast("long")
    return (
        orders.groupBy(bin_col.alias("price_bin"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("bin_min"),
            F.round(F.max("o_totalprice"), 2).alias("bin_max"),
        )
    )


ORACLE_HISTOGRAM = """
SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS price_bin,
       count(*) AS n,
       round(min(o_totalprice), 2) AS bin_min,
       round(max(o_totalprice), 2) AS bin_max
FROM orders GROUP BY 1
"""


# ------------------------------------------------------------- stats-corr


def q_stats_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates per group: Pearson correlation, sample
    covariance, stddev, variance — single-pass co-moment aggregation
    (Welford-style partial merge, map-side combinable)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("covar"),
        F.round(F.stddev_samp("l_discount"), 6).alias("std_disc"),
        F.round(F.var_samp("l_tax"), 6).alias("var_tax"),
    )


ORACLE_STATS_CORR = """
SELECT l_returnflag,
       round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
       round(covar_samp(l_quantity, l_extendedprice), 4) AS covar,
       round(stddev_samp(l_discount), 6) AS std_disc,
       round(var_samp(l_tax), 6) AS var_tax
FROM lineitem GROUP BY l_returnflag
"""


# ------------------------------------------------------------- string-agg


def q_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG): region → sorted nation list.
    Deterministic via explicit sort of the collected set — collect_list
    order is otherwise partition-dependent."""
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations"),
            F.count(F.lit(1)).alias("n_nations"),
        )
    )


ORACLE_STRING_AGG = """
SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations,
       count(*) AS n_nations
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


# -------------------------------------------------------- explode-sequence


def q_explode_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generator expression: expand each order into its first 3 monthly
    billing periods (sequence + explode — the row-generating inverse of
    aggregation; DuckDB twin is generate_series + unnest). Narrow op: rows
    fan out 3× with no shuffle."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.posexplode(F.sequence(F.lit(0), F.lit(2))).alias("pos", "month_offset"),
    ).select(
        "o_orderkey",
        F.col("month_offset").cast("long").alias("month_offset"),
    )


ORACLE_EXPLODE_SEQUENCE = """
SELECT o_orderkey, CAST(unnest(generate_series(0, 2)) AS BIGINT) AS month_offset
FROM orders
"""


QUERIES = {
    "intersect": q_intersect,
    "histogram": q_histogram,
    "stats-corr": q_stats_corr,
    "string-agg": q_string_agg,
    "explode-sequence": q_explode_sequence,
}

ORACLES = {
    "intersect": ORACLE_INTERSECT,
    "histogram": ORACLE_HISTOGRAM,
    "stats-corr": ORACLE_STATS_CORR,
    "string-agg": ORACLE_STRING_AGG,
    "explode-sequence": ORACLE_EXPLODE_SEQUENCE,
}

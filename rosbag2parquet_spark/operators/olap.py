"""Second OLAP operator batch: the remaining query-surface idioms the
reference's output model is designed to feed (reference README.md:14-18
delegates them to SQL engines; we provide them natively).

Covers: first-seen key discovery (A4), CUBE grouping sets, exact distinct
counting, exact quantiles, semi/anti joins (EXISTS / NOT EXISTS), LIKE
filtering, lag/lead deltas, unpivot, per-group standardization (z-score),
and a banded range self-join (the bucketed formulation every scalable
range join reduces to).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from rosbag2parquet_spark.sources.catalog import load_table

# ------------------------------------------------------- first-seen (A4)


def q_first_seen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-key discovery with first-seen semantics (reference
    rosbag_example.cpp:40-43: type name captured on first message of each
    topic). ``min_by`` = argmin over the stream — one hash-agg."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.min_by("event_id", "event_id").alias("first_event_id"),
        F.unix_micros(F.min("ts")).alias("first_ts_us"),
        F.min_by("user_id", "event_id").alias("first_user_id"),
    )


ORACLE_FIRST_SEEN = """
SELECT event_type, min_by(event_id, event_id) AS first_event_id,
       epoch_us(min(ts)) AS first_ts_us,
       min_by(user_id, event_id) AS first_user_id
FROM events GROUP BY event_type
"""


# ----------------------------------------------------------------- cube


def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus): all 4 grouping sets in one pass —
    the generalization of the reference's 3-level rollup
    (rosbag_example.cpp:51-66). Spark expands grouping sets before the
    shuffle; still one exchange."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(18,4)")).cast("double").alias("qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("<all>")).alias("l_returnflag"),
            F.coalesce("l_linestatus", F.lit("<all>")).alias("l_linestatus"),
            "n",
            "qty",
        )
    )


ORACLE_CUBE = """
SELECT coalesce(l_returnflag, '<all>') AS l_returnflag,
       coalesce(l_linestatus, '<all>') AS l_linestatus,
       count(*) AS n,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS qty
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
"""


# ------------------------------------------------------- distinct-count


def q_distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct counting per group (two-phase: partial distinct
    map-side, exchange on (group, key), final count). The approximate path
    (``approx_count_distinct`` — HyperLogLog, constant memory, one pass) is
    the 100 TB default but has engine-specific estimates, so the declared
    query is the exact variant the oracle can reproduce."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count(F.lit(1)).alias("n_rows"),
    )


ORACLE_DISTINCT_COUNT = """
SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
       count(DISTINCT l_suppkey) AS n_supps, count(*) AS n_rows
FROM lineitem GROUP BY l_returnflag
"""


# ------------------------------------------------------------ quantiles


def q_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact quantiles (linear interpolation) per group. At 100 TB the
    engine swaps in ``percentile_approx`` (t-digest style sketch, mergeable,
    one pass); exact ``percentile`` shown here because it is
    oracle-comparable. Both Spark and DuckDB interpolate identically."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90"),
        F.round(F.min("o_totalprice"), 4).alias("lo"),
        F.round(F.max("o_totalprice"), 4).alias("hi"),
    )


ORACLE_QUANTILES = """
SELECT o_orderstatus,
       round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
       round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
       round(min(o_totalprice), 4) AS lo, round(max(o_totalprice), 4) AS hi
FROM orders GROUP BY o_orderstatus
"""


# ------------------------------------------------------ semi / anti join


def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS: customers having at least one high-value order. left_semi
    keeps the probe side only — no fan-out, broadcastable build side."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    big = orders.filter(F.col("o_totalprice") > 200000).select("o_custkey")
    return cust.join(
        F.broadcast(big), cust.c_custkey == big.o_custkey, "left_semi"
    ).select("c_custkey", "c_name", "c_mktsegment")


ORACLE_SEMI_JOIN = """
SELECT c_custkey, c_name, c_mktsegment FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_totalprice > 200000)
"""


def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS: customers who never placed an URGENT order (left_anti)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    return cust.join(
        F.broadcast(urgent),
        cust.c_custkey == F.col("o_custkey"),
        "left_anti",
    ).select("c_custkey", "c_name", "c_acctbal")


ORACLE_ANTI_JOIN = """
SELECT c_custkey, c_name, c_acctbal FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderpriority = '1-URGENT')
"""


# ----------------------------------------------------------- like-filter


def q_like_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pattern filter + projection (string-predicate pushdown: StartsWith
    pushes to parquet; contains evaluates in the scan stage)."""
    part = load_table(spark, sf_dir, "part")
    return part.filter(
        F.col("p_type").like("%BRASS%") | F.col("p_name").startswith("blue")
    ).select("p_partkey", "p_name", "p_type", "p_size")


ORACLE_LIKE_FILTER = """
SELECT p_partkey, p_name, p_type, p_size FROM part
WHERE p_type LIKE '%BRASS%' OR p_name LIKE 'blue%'
"""


# -------------------------------------------------------------- lag-lead


def q_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key sequential deltas (lag/lead over the per-user event stream)
    — the stream-derivative pattern (inter-arrival time, value delta). One
    shuffle on the partition key."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # delta in DECIMAL: exact subtraction of 4-decimal-cast values — no
    # double round() decision anywhere
    dec = F.col("value").cast("decimal(18,4)")
    return ev.select(
        "event_id",
        "user_id",
        (dec - F.lag(dec).over(w)).cast("double").alias("value_delta"),
        (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))).alias("gap_us"),
        F.lead("event_id").over(w).alias("next_event_id"),
    )


ORACLE_LAG_LEAD = """
SELECT event_id, user_id,
       CAST(CAST(value AS DECIMAL(18,4))
            - lag(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE) AS value_delta,
       epoch_us(ts) - epoch_us(lag(ts) OVER w) AS gap_us,
       lead(event_id) OVER w AS next_event_id
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


# --------------------------------------------------------------- unpivot


def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt): wide per-type counts back to long form — inverse of
    q_pivot, via the ``stack`` table-generating expression (narrow)."""
    from rosbag2parquet_spark.operators.relational import q_pivot

    wide = q_pivot(spark, sf_dir)
    types = ["click", "error", "purchase", "signup", "view"]
    stack_expr = "stack({n}, {args}) as (event_type, n_events)".format(
        n=len(types), args=", ".join(f"'{t}', `{t}`" for t in types)
    )
    return wide.select("user_id", F.expr(stack_expr)).filter(
        F.col("n_events") > 0
    )


ORACLE_UNPIVOT = """
WITH wide AS (
  SELECT user_id,
         count(*) FILTER (event_type = 'click')    AS click,
         count(*) FILTER (event_type = 'error')    AS error,
         count(*) FILTER (event_type = 'purchase') AS purchase,
         count(*) FILTER (event_type = 'signup')   AS signup,
         count(*) FILTER (event_type = 'view')     AS view
  FROM events GROUP BY user_id
)
SELECT user_id, event_type, n_events FROM wide
UNPIVOT (n_events FOR event_type IN (click, error, purchase, signup, view))
WHERE n_events > 0
"""


# ---------------------------------------------------------------- zscore


def q_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group standardization — the grouped-transform pattern. Expressed
    with window aggregates (stays in Tungsten; the ``applyInPandas`` version
    of the same transform is tested for parity in tests/test_operators.py —
    the Arrow round-trip is the slow path, kept for genuinely non-SQL
    transforms).

    Determinism: avg()/stddev_samp() over doubles merge partials in
    engine-specific order, so mean and M2 carry order-dependent low bits.
    Instead the moments come from exact DECIMAL sums (Σx in DECIMAL(18,4),
    Σx² in DECIMAL(38,8)) cast to double, and the z-score is the textbook
    formula evaluated identically in both engines — every double op has
    bit-identical operands."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type")
    dec = F.col("value").cast("decimal(18,4)")
    s1 = F.sum(dec).over(w).cast("double")
    s2 = F.sum(dec * dec).over(w).cast("double")
    n = F.count(F.lit(1)).over(w)
    mean = s1 / n
    var = (s2 - s1 * s1 / n) / (n - F.lit(1))
    return ev.select(
        "event_id",
        "event_type",
        ((F.col("value") - mean) / F.sqrt(var)).alias("zscore"),
    )


ORACLE_ZSCORE = """
WITH t AS (
  SELECT event_id, event_type, value,
         CAST(sum(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE) AS s1,
         CAST(sum(CAST(value AS DECIMAL(18,4)) * CAST(value AS DECIMAL(18,4)))
              OVER w AS DOUBLE) AS s2,
         count(*) OVER w AS n
  FROM events WINDOW w AS (PARTITION BY event_type)
)
SELECT event_id, event_type,
       (value - s1 / n) / sqrt((s2 - s1 * s1 / n) / (n - 1)) AS zscore
FROM t
"""


# ------------------------------------------------------------ range-join


def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded range self-join: count pairs of events from the same user
    within 60 seconds of each other. Naive formulation is a non-equi join
    (O(n²) nested loop in any engine); the scalable plan BUCKETS time into
    60 s bands and equi-joins on (user, band) ∪ (user, band+1), then
    applies the exact range predicate — turning the range join into two
    hash joins whose keys shard perfectly. This is the standard interval-
    join technique (same shape Flink/Trino use); the oracle runs the naive
    inequality join, proving the banded plan is exact."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        "event_id", "user_id", F.unix_micros("ts").alias("us")
    ).withColumn("band", F.expr("us div 60000000"))
    left = base.select(
        "event_id",
        "user_id",
        "us",
        F.explode(F.array(F.col("band"), F.col("band") + 1)).alias("jband"),
    )
    right = base.select(
        F.col("event_id").alias("b_id"),
        F.col("user_id").alias("b_user"),
        F.col("us").alias("b_us"),
        F.col("band").alias("jband"),
    )
    pairs = left.join(right, ["jband"]).filter(
        (F.col("user_id") == F.col("b_user"))
        & (F.col("event_id") < F.col("b_id"))
        & (F.col("b_us") - F.col("us") >= 0)
        & (F.col("b_us") - F.col("us") <= 60_000_000)
    )
    return (
        pairs.select("event_id", F.col("b_id").alias("other_event_id"))
        .distinct()
        .groupBy()
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


ORACLE_RANGE_JOIN = """
SELECT count(*) AS n_pairs FROM (
  SELECT DISTINCT a.event_id, b.event_id AS other_event_id
  FROM events a JOIN events b
    ON a.user_id = b.user_id AND a.event_id < b.event_id
   AND epoch_us(b.ts) - epoch_us(a.ts) BETWEEN 0 AND 60000000
)
"""


# ----------------------------------------------------------- interval join

_HOUR_US = 3_600_000_000


def q_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-OVERLAP join: user sessions (intervals from the sessionizer)
    against an hourly time grid — concurrent-sessions-per-hour, the
    occupancy query every ops dashboard runs.

    A naive overlap join (`a.start < b.end AND b.start <= a.end`) has no
    equi key — engines plan a nested loop. The scalable formulation
    EXPLODES each interval into the fixed-width chunks it covers and
    equi-joins on the chunk id (here windows are chunk-aligned so chunk ==
    window; in general a final exact-overlap filter + distinct dedups
    multi-chunk pairs). Chunk count per interval is bounded by
    duration/chunk, the join keys shard uniformly, and the grid side
    broadcasts — no nested loop anywhere. The oracle runs the naive
    overlap join, proving the chunked plan exact."""
    from rosbag2parquet_spark.operators.windows import q_sessionize

    ev = load_table(spark, sf_dir, "events")
    bounds = ev.select(
        F.expr("unix_micros(date_trunc('hour', min(ts)))").alias("lo"),
        F.expr("unix_micros(date_trunc('hour', max(ts)))").alias("hi"),
    )
    grid = bounds.select(
        F.explode(F.expr(f"sequence(lo, hi, {_HOUR_US})")).alias("w_start")
    )
    sessions = q_sessionize(spark, sf_dir)
    chunked = sessions.select(
        "user_id",
        "session_start_us",
        "session_last_us",
        F.explode(
            F.expr(
                f"sequence(session_start_us div {_HOUR_US},"
                f" session_last_us div {_HOUR_US})"
            )
        ).alias("chunk"),
    )
    joined = chunked.join(
        F.broadcast(grid),
        F.col("chunk") * _HOUR_US == F.col("w_start"),
    ).filter(  # exact overlap — redundant for aligned chunks, kept for shape
        (F.col("session_start_us") < F.col("w_start") + _HOUR_US)
        & (F.col("w_start") <= F.col("session_last_us"))
    )
    return joined.groupBy("w_start").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.countDistinct("user_id").alias("n_users"),
    )


def _oracle_interval_join() -> str:
    from rosbag2parquet_spark.operators.windows import ORACLE_SESSIONIZE

    return f"""
WITH s AS ({ORACLE_SESSIONIZE}),
b AS (SELECT epoch_us(date_trunc('hour', min(ts))) AS lo,
             epoch_us(date_trunc('hour', max(ts))) AS hi
      FROM events),
grid AS (SELECT unnest(generate_series(lo, hi, {_HOUR_US})) AS w_start FROM b)
SELECT w_start, count(*) AS n_sessions,
       count(DISTINCT user_id) AS n_users
FROM grid JOIN s
  ON s.session_start_us < w_start + {_HOUR_US}
 AND w_start <= s.session_last_us
GROUP BY w_start
"""


# ---------------------------------------------------------- grouping sets


def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the general form rollup/cube specialize:
    per-returnflag totals and per-linestatus totals in one pass (no
    all-combinations expansion)."""
    from rosbag2parquet_spark.sources.catalog import register_views

    register_views(spark, sf_dir, ("lineitem",))
    return spark.sql(
        """
        SELECT coalesce(l_returnflag, '<rf>') AS l_returnflag,
               coalesce(l_linestatus, '<ls>') AS l_linestatus,
               count(*) AS n,
               CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS total
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        """
    )


ORACLE_GROUPING_SETS = """
SELECT coalesce(l_returnflag, '<rf>') AS l_returnflag,
       coalesce(l_linestatus, '<ls>') AS l_linestatus,
       count(*) AS n,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS total
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
"""


# ------------------------------------------------------------ outer join


def q_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join: per-nation customer counts vs supplier counts —
    nations with only one side present keep a 0 on the other (the join-type
    breadth E4 implies; both sides are pre-aggregated so the outer join is
    dim-sized and broadcastable at any scale)."""
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    c = cust.groupBy(F.col("c_nationkey").alias("nk_c")).agg(
        F.count(F.lit(1)).alias("n_customers")
    )
    s = supp.groupBy(F.col("s_nationkey").alias("nk_s")).agg(
        F.count(F.lit(1)).alias("n_suppliers")
    )
    return c.join(s, c.nk_c == s.nk_s, "full_outer").select(
        F.coalesce("nk_c", "nk_s").alias("nationkey"),
        F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
        F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
    )


ORACLE_OUTER_JOIN = """
SELECT coalesce(c.nk, s.nk) AS nationkey,
       coalesce(c.n_customers, 0) AS n_customers,
       coalesce(s.n_suppliers, 0) AS n_suppliers
FROM (SELECT c_nationkey AS nk, count(*) AS n_customers
      FROM customer GROUP BY 1) c
FULL OUTER JOIN
     (SELECT s_nationkey AS nk, count(*) AS n_suppliers
      FROM supplier GROUP BY 1) s
  ON c.nk = s.nk
"""


QUERIES = {
    "first-seen": q_first_seen,
    "outer-join": q_outer_join,
    "grouping-sets": q_grouping_sets,
    "cube": q_cube,
    "distinct-count": q_distinct_count,
    "quantiles": q_quantiles,
    "semi-join": q_semi_join,
    "anti-join": q_anti_join,
    "like-filter": q_like_filter,
    "lag-lead": q_lag_lead,
    "unpivot": q_unpivot,
    "zscore": q_zscore,
    "range-join": q_range_join,
    "interval-join": q_interval_join,
}

ORACLES = {
    "first-seen": ORACLE_FIRST_SEEN,
    "outer-join": ORACLE_OUTER_JOIN,
    "grouping-sets": ORACLE_GROUPING_SETS,
    "cube": ORACLE_CUBE,
    "distinct-count": ORACLE_DISTINCT_COUNT,
    "quantiles": ORACLE_QUANTILES,
    "semi-join": ORACLE_SEMI_JOIN,
    "anti-join": ORACLE_ANTI_JOIN,
    "like-filter": ORACLE_LIKE_FILTER,
    "lag-lead": ORACLE_LAG_LEAD,
    "unpivot": ORACLE_UNPIVOT,
    "zscore": ORACLE_ZSCORE,
    "range-join": ORACLE_RANGE_JOIN,
    "interval-join": _oracle_interval_join(),
}

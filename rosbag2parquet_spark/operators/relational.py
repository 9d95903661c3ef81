"""Core relational operators (reference §2a/2b/2c).

Covers: scan (S1), metadata projection (S12), filter w/ pushdown (E1), top-k
(E8), byte-bounded limit (S2), multi-file union (E6), hash group-by agg (A1),
derived scalar metrics (A3), rollup re-aggregation (A2), dim broadcast join
(S11/E4), multi-table join (E4), SQL surface (E5), pivot and top-k-per-group
(stock OLAP patterns over the reference's data model).

Scale notes (100 TB):
- every query here is a declarative DataFrame plan — Catalyst pushes filters
  and prunes columns into the parquet scan (verified via .explain in tests);
- the only shuffles are the groupBy/rollup hash-aggregations (partial
  map-side combine first) and the big-big join (sort-merge, AQE-skew-safe);
- dimension joins are explicitly broadcast — no shuffle of the fact table;
- top-k uses TakeOrderedAndProject (no global sort materialization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from rosbag2parquet_spark.sources.catalog import load_table, register_views

# ---------------------------------------------------------------- scan (S1)


def q_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full sequential scan of the message stream (reference
    rosbag2parquet.cpp:52-59 — the bag View loop). Projection of all columns;
    Catalyst will prune if a downstream consumer narrows it."""
    return load_table(spark, sf_dir, "events")


ORACLE_SCAN = "SELECT event_id, ts, user_id, event_type, value, props FROM events"


# ----------------------------------------------------------- project (S12)


def q_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata projection — the ``Messages`` table emit (reference
    RecordMessageMetadata, FlattenedRosWriter.cpp:180-207): per message
    (seqno, time, size, connection) analog. Column-pruned scan: only the
    4 referenced columns are read from parquet."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        F.col("event_id").alias("seqno"),
        F.unix_micros("ts").alias("time_us"),
        F.col("value").alias("size"),
        F.col("user_id").alias("connection_id"),
    )


ORACLE_PROJECT = """
SELECT event_id AS seqno, epoch_us(ts) AS time_us, value AS size,
       user_id AS connection_id
FROM events
"""


# ------------------------------------------------------------- filter (E1)


def q_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate-skipping scan (reference README.md:8 — chunk statistics
    enable 'efficient predicate evaluation'). The range predicate reaches the
    parquet reader as PushedFilters and prunes row groups via min/max stats —
    exactly the scan-skipping the reference's chunked layout was built for."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= "1995-01-01")
        & (F.col("l_shipdate") < "1995-04-01")
        & (F.col("l_quantity") > 45)
    ).select("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice", "l_shipdate")


ORACLE_FILTER = """
SELECT l_orderkey, l_partkey, l_quantity, l_extendedprice, l_shipdate
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1995-04-01'
  AND l_quantity > 45
"""


# --------------------------------------------------------------- topk (E8)


def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k by ordering key (reference README.md:119-121 — seqno ordering
    supports positional access; test point-reads rosbag2parquet_test.cpp:97-110).
    Deterministic tie-break on the unique key so the result set is stable.
    Physical plan is TakeOrderedAndProject: per-partition heap + driver merge,
    no global sort — O(n log k), shuffle-free. Survives any scale."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
    )


ORACLE_TOPK = """
SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
"""


# -------------------------------------------------------- byte limit (S2)


LIMIT_BUCKET_WIDTH = 1_000
LIMIT_BYTE_CAP = 5000.0


def running_sum_scalable(
    df: DataFrame,
    order_col: str,
    value_dec,  # Column: exact (decimal) per-row value
    bucket_width: int,
) -> DataFrame:
    """Distributed exact running sum in ``order_col`` order — the two-pass
    plan that replaces a global (single-partition) window:

    1. bucket rows by ``order_col div bucket_width``; per-bucket exact
       decimal totals are a tiny aggregate (collected driver-side — the same
       "K scalars" class of collect as k-means centroids);
    2. prefix-sum the bucket totals into a literal offset map (plan-time
       constant, broadcast with the plan);
    3. running = offset[bucket] + within-bucket running sum, where the
       window is PARTITIONED by bucket — the shuffle key is the bucket, no
       Exchange SinglePartition anywhere.

    At 100 TB the bucket count grows with the data; the collect stays tiny
    as long as bucket_width tracks data density (1e6-row buckets → ≤1e6
    collected scalars; a hierarchical second level of bucketing extends the
    same construction if even that is too large). Output values are exact:
    decimal accumulation, unique order key."""
    bucketed = df.withColumn("__b", F.expr(f"{order_col} div {bucket_width}"))
    totals = (
        bucketed.groupBy("__b").agg(F.sum(value_dec).alias("__s")).collect()
    )
    totals_by_bucket = {r["__b"]: r["__s"] for r in totals}
    # an all-NULL bucket sums to NULL — contribute 0 to the prefix sum; the
    # accumulator seeds in the sums' OWN Python type (Decimal for decimal
    # callers, int for long callers like out_of_line_pointers) so the
    # create_map value literals stay homogeneous and correctly typed
    sample = next((v for v in totals_by_bucket.values() if v is not None), None)
    zero = type(sample)(0) if sample is not None else 0
    acc = zero
    offsets: dict = {}
    for b in sorted(totals_by_bucket):
        offsets[b] = acc
        v = totals_by_bucket[b]
        acc = acc + (v if v is not None else zero)
    pairs: list = []
    for b, off in offsets.items():
        pairs.extend([F.lit(b), F.lit(off)])
    if pairs:
        offset = F.create_map(*pairs)[F.col("__b")]
    else:
        # empty input: no buckets — pin the zero to the VALUE column's
        # resolved type (empty create_map() is VOID-keyed and fails probing)
        vtype = df.select(value_dec.alias("__v")).schema[0].dataType.simpleString()
        offset = F.lit(0).cast(vtype)
    w = Window.partitionBy("__b").orderBy(order_col).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return bucketed.withColumn(
        "__running", offset + F.sum(value_dec).over(w)
    )


def q_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-bounded scan limit (reference rosbag2parquet.cpp:56-58: stop
    after max_mbs MB consumed). Exact semantics = running byte total in scan
    order, keep rows while the running sum stays under the cap. Uses the
    scalable bucketed two-pass running sum (no single-partition window) with
    exact DECIMAL byte accumulation — deterministic across engines."""
    ev = load_table(spark, sf_dir, "events")
    run = running_sum_scalable(
        ev,
        "event_id",
        F.col("value").cast("decimal(18,4)"),
        LIMIT_BUCKET_WIDTH,
    )
    return (
        run.withColumn("running_bytes", F.col("__running").cast("double"))
        .filter(F.col("running_bytes") <= LIMIT_BYTE_CAP)
        .select("event_id", "event_type", "value", "running_bytes")
    )


ORACLE_LIMIT = """
SELECT event_id, event_type, value, running_bytes FROM (
  SELECT event_id, event_type, value,
         CAST(sum(CAST(value AS DECIMAL(18,4))) OVER (ORDER BY event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
           AS running_bytes
  FROM events
) WHERE running_bytes <= 5000.0
"""


# -------------------------------------------------------------- union (E6)


def q_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-file union-as-one-table (reference README.md:16: 'Multiple
    compatible parquet files can be treated as a single file'). unionByName
    (schema-aligned, the md5sum-compatibility check analog —
    FlattenedRosWriter.cpp:287) of two disjoint slices; narrow op, no
    shuffle."""
    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "purchase")
    b = ev.filter(F.col("event_type") == "error")
    return a.unionByName(b).select("event_id", "event_type", "value")


ORACLE_UNION = """
SELECT event_id, event_type, value FROM events WHERE event_type = 'purchase'
UNION ALL
SELECT event_id, event_type, value FROM events WHERE event_type = 'error'
"""


# ------------------------------------------------------- groupby-agg (A1)


def q_groupby_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-topic hash aggregation (reference rosbag_example.cpp:37-49:
    count/sum(size)/min(stamp)/max(stamp) keyed on topic). One hash-agg with
    map-side partial aggregation, then a shuffle on the (low-cardinality)
    key; AQE coalesces the post-shuffle partitions. Timestamps are emitted
    as epoch micros so external oracles hash identically."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n_msgs"),
        # DECIMAL accumulation: double sums are engine/partition-order
        # dependent; the exact decimal sum casts back to double losslessly
        F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("total_size"),
        F.unix_micros(F.min("ts")).alias("min_ts_us"),
        F.unix_micros(F.max("ts")).alias("max_ts_us"),
    )


ORACLE_GROUPBY_AGG = """
SELECT event_type, count(*) AS n_msgs,
       CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_size,
       epoch_us(min(ts)) AS min_ts_us, epoch_us(max(ts)) AS max_ts_us
FROM events GROUP BY event_type
"""


# ----------------------------------------------------------- derived (A3)


def q_derived(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived scalar metrics post-agg (reference rosbag_example.cpp:28-34,
    71-72: freq = count/(max-min), data_rate = bytes/(max-min)). Pure column
    arithmetic on the agg output — stays in the same whole-stage-codegen
    span as the aggregation."""
    agg = q_groupby_agg(spark, sf_dir)
    span_s = (F.col("max_ts_us") - F.col("min_ts_us")) / F.lit(1_000_000.0)
    # raw IEEE quotients of bit-identical operands (exact counts / exact
    # decimal-sum doubles) are deterministic across engines; a round() on
    # top would reintroduce engine-specific half-way behavior
    return agg.select(
        "event_type",
        "n_msgs",
        (F.col("n_msgs") / span_s).alias("freq_hz"),
        (F.col("total_size") / span_s).alias("data_rate"),
    )


ORACLE_DERIVED = """
SELECT event_type, n_msgs,
       n_msgs / span_s AS freq_hz,
       total_size / span_s AS data_rate
FROM (
  SELECT event_type, count(*) AS n_msgs,
         CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_size,
         (epoch_us(max(ts)) - epoch_us(min(ts))) / 1000000.0 AS span_s
  FROM events GROUP BY event_type
)
"""


# ------------------------------------------------------------ rollup (A2)


def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-level re-aggregation (reference rosbag_example.cpp:51-66:
    per-topic partials merged into per-type and a global grand total — a
    3-level rollup). Expressed as ROLLUP(event_type, user_id): Spark expands
    grouping sets and still does partial aggregation map-side; one shuffle
    total instead of the reference's three sequential passes."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.rollup("event_type", "user_id")
        .agg(
            F.count("*").alias("n_msgs"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("total_size"),
        )
        .select(
            F.coalesce("event_type", F.lit("<all>")).alias("event_type"),
            F.coalesce(F.col("user_id").cast("long"), F.lit(-1)).alias("user_id"),
            "n_msgs",
            "total_size",
        )
    )


ORACLE_ROLLUP = """
SELECT coalesce(event_type, '<all>') AS event_type,
       coalesce(user_id, -1) AS user_id,
       count(*) AS n_msgs,
       CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_size
FROM events GROUP BY ROLLUP (event_type, user_id)
"""


# ---------------------------------------------------------- dim-join (S11)


def q_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connection-id resolution (reference FlattenedRosWriter.cpp:41-46,
    172-178: per-message hash-map probe into the connections dim). The Spark
    analog is an explicit broadcast hash join: the dim is shipped to every
    executor, the fact table never shuffles — the distributed equivalent of
    the reference's in-memory ``unordered_map`` probe."""
    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer")
    return (
        ev.join(F.broadcast(cust), ev.user_id == cust.c_custkey, "inner")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("total_value"),
        )
    )


ORACLE_DIM_JOIN = """
SELECT c_mktsegment, count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
FROM events JOIN customer ON user_id = c_custkey
GROUP BY c_mktsegment
"""


# --------------------------------------------------------------- join (E4)


def q_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-table key join (reference README.md:119-121: per-type ↔ Messages
    on seqno, ↔ Connections on connection_id). Fixture analog:
    lineitem ↔ orders ↔ customer; customer is small → broadcast; the
    orders↔lineitem side runs as partial-agg-below-join (see inline
    comment) — at bench scale AQE broadcasts the collapsed side too, at
    100 TB it degrades to a sort-merge join of order-grain partials with
    AQE skew handling."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    # partial aggregation PUSHED BELOW the join — the grouping keys all come
    # from the dim side, so revenue/count can collapse to one row per
    # orderkey before the join ever sees the fact table: the shuffle carries
    # |orders| narrow partials instead of |lineitem| wide rows, and map-side
    # combine absorbs most of it (lineitems of an order are adjacent in the
    # file). DECIMAL sums reassociate exactly, so per-order-then-per-segment
    # equals the flat sum bit-for-bit (a double sum would not survive this
    # rewrite). At 100 TB this is the difference between shuffling the fact
    # table and shuffling the order-grain summary.
    per_order = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("_cnt"),
        F.sum(
            F.col("l_extendedprice").cast("decimal(18,4)")
            * (F.lit(1) - F.col("l_discount").cast("decimal(18,4)"))
        ).alias("_rev"),
    )
    return (
        per_order.join(orders, per_order.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment", "o_orderstatus")
        .agg(
            F.sum("_cnt").alias("n_items"),
            # DECIMAL accumulation: the 4-decimal-exact products make double
            # sums land exactly on round-half boundaries where engines differ
            F.round(F.sum("_rev"), 2).cast("double").alias("revenue"),
        )
    )


ORACLE_JOIN = """
SELECT c_mktsegment, o_orderstatus, count(*) AS n_items,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                      * (1 - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE)
         AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment, o_orderstatus
"""


# ---------------------------------------------------------------- sql (E5)


def q_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL surface over registered views (reference README.md:14-18 — the
    output exists so Spark SQL et al. can query it; here the engine serves
    the SQL itself). TPC-H Q1-shaped pricing summary: scan → filter →
    hash-agg; filter and the 7-column projection both push into the scan."""
    register_views(spark, sf_dir, ("lineitem",))
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(round(sum(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE)      AS sum_qty,
               CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_base_price,
               CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE)                        AS sum_disc_price,
               -- avgs: exact decimal sum cast to double, THEN divide — both
               -- engines then perform the identical IEEE division (a raw
               -- avg() aggregates doubles in engine-specific order)
               round(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(*), 6)      AS avg_qty,
               round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / count(*), 6) AS avg_price,
               round(CAST(sum(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / count(*), 6)      AS avg_disc,
               count(*)                                                    AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        """
    )


ORACLE_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(round(sum(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE)      AS sum_qty,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_base_price,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS sum_disc_price,
       round(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(*), 6)      AS avg_qty,
       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / count(*), 6) AS avg_price,
       round(CAST(sum(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / count(*), 6)      AS avg_disc,
       count(*)                                           AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


# ------------------------------------------------------------------ pivot


def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: per-user event-type counts as columns (the 'rosbag info'
    per-topic-per-type matrix view, rosbag_example.cpp:51-66, transposed).
    Explicit value list so no discovery pass is needed — one hash-agg."""
    ev = load_table(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    return (
        ev.groupBy("user_id")
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
        .na.fill(0, types)
    )


ORACLE_PIVOT = """
SELECT user_id,
       count(*) FILTER (event_type = 'click')    AS click,
       count(*) FILTER (event_type = 'error')    AS error,
       count(*) FILTER (event_type = 'purchase') AS purchase,
       count(*) FILTER (event_type = 'signup')   AS signup,
       count(*) FILTER (event_type = 'view')     AS view
FROM events GROUP BY user_id
"""


# ------------------------------------------------------- top-k per group


def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders by price per market segment — the window-function
    pattern the reference's per-type tables are meant to feed (README.md:14
    'analyze data using dataframes'). One shuffle on the partition key; the
    rank filter cuts before any further stage."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    joined = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        joined.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("c_mktsegment", "rk", "o_orderkey", "o_totalprice")
    )


ORACLE_TOPK_PER_GROUP = """
SELECT c_mktsegment, rk, o_orderkey, o_totalprice FROM (
  SELECT c_mktsegment, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY c_mktsegment
                            ORDER BY o_totalprice DESC, o_orderkey) AS rk
  FROM orders JOIN customer ON o_custkey = c_custkey
) WHERE rk <= 3
"""


QUERIES = {
    "scan": q_scan,
    "project": q_project,
    "filter": q_filter,
    "topk": q_topk,
    "limit": q_limit,
    "union": q_union,
    "groupby-agg": q_groupby_agg,
    "derived": q_derived,
    "rollup": q_rollup,
    "dim-join": q_dim_join,
    "join": q_join,
    "sql": q_sql,
    "pivot": q_pivot,
    "topk-per-group": q_topk_per_group,
}

ORACLES = {
    "scan": ORACLE_SCAN,
    "project": ORACLE_PROJECT,
    "filter": ORACLE_FILTER,
    "topk": ORACLE_TOPK,
    "limit": ORACLE_LIMIT,
    "union": ORACLE_UNION,
    "groupby-agg": ORACLE_GROUPBY_AGG,
    "derived": ORACLE_DERIVED,
    "rollup": ORACLE_ROLLUP,
    "dim-join": ORACLE_DIM_JOIN,
    "join": ORACLE_JOIN,
    "sql": ORACLE_SQL,
    "pivot": ORACLE_PIVOT,
    "topk-per-group": ORACLE_TOPK_PER_GROUP,
}

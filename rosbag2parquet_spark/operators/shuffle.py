"""Shuffle-economics utilities: bucketed co-located joins and hot-key
salting — the two techniques (beyond AQE) that make the reference's
seqno/connection_id join pattern (E4) survive 100 TB.

- **Bucketing**: write both join sides pre-hash-partitioned on the key
  (``bucketBy`` + ``saveAsTable``); later joins on that key read co-located
  buckets and skip the exchange entirely. This is the persistent analog of
  the reference's choice to key every table on seqno (README.md:119-121):
  pay the partitioning once at write time, join shuffle-free forever.
- **Salting**: a skewed build key (one topic with 90% of messages — typical
  for camera topics in a bag) overloads one reducer. Salt the fact side with
  a random-but-deterministic shard id, explode the dim side across all
  shards, join on (key, salt) — the hot key spreads over N reducers. AQE's
  skew-join split handles sort-merge joins; salting is the explicit plan
  for aggregations and for engines/joins AQE can't split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_bucketed(df: DataFrame, table: str, key: str, n_buckets: int = 16) -> None:
    """Persist hash-bucketed by key (sorted within buckets so merge joins
    need no sort either)."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table)
    )


def salted_groupby_count(
    df: DataFrame, key: str, n_salts: int = 8, salt_col: str | None = None
) -> DataFrame:
    """Two-phase aggregation for a skewed group key: partial counts per
    (key, salt) — the hot key's rows spread across ``n_salts`` reducers —
    then a final cheap merge over n_salts rows per key. The FINAL result is
    deterministic regardless of how rows shard; pass ``salt_col`` (a unique
    row attribute to hash) if the intermediate partials themselves must be
    rerun-stable, else an arbitrary per-task id is used."""
    salt_src = F.col(salt_col) if salt_col else F.monotonically_increasing_id()
    salted = df.withColumn("__salt", F.pmod(F.hash(salt_src), F.lit(n_salts)))
    partial = salted.groupBy(key, "__salt").agg(F.count(F.lit(1)).alias("__c"))
    return partial.groupBy(key).agg(F.sum("__c").cast("long").alias("n"))


# ---------------------------------------------------- driver-contract query


def q_salted_agg(spark, sf_dir: str) -> DataFrame:
    """Skew-safe two-phase aggregation as a declared query: counts by the
    (skew-prone) event type via per-(key, salt) partials merged in a second
    cheap agg. The oracle is the PLAIN group-by — the salted plan must be
    semantically invisible, which is exactly the property that makes it
    safe to deploy on a hot key."""
    from rosbag2parquet_spark.sources.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    return salted_groupby_count(ev, "event_type", salt_col="event_id")


ORACLE_SALTED_AGG = """
SELECT event_type, count(*) AS n FROM events GROUP BY event_type
"""

def q_salted_join(spark, sf_dir: str) -> DataFrame:
    """Skew-safe equi-join as a declared query: the fact (events, whose
    event_type key is 5-valued — maximal skew for a shuffle join) joins a
    per-type dim through :func:`salted_join`, so each hot key spreads over
    8 reducers instead of one. The oracle is the PLAIN join — like
    salted-agg, the salting must be semantically invisible. (AQE splits
    skewed SORT-MERGE joins on its own; explicit salting is the portable
    plan when the join strategy or engine version gives AQE no seam.)"""
    from rosbag2parquet_spark.sources.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    dim = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_type"))
    return salted_join(
        ev.select("event_id", "event_type"), dim, "event_type"
    ).select("event_id", "event_type", "n_type")


ORACLE_SALTED_JOIN = """
SELECT event_id, event_type, n_type
FROM events
JOIN (SELECT event_type, count(*) AS n_type FROM events GROUP BY event_type)
  USING (event_type)
"""

def q_bloom_join(spark, sf_dir: str) -> DataFrame:
    """Runtime bloom-filter semi-join reduction as a declared query: a
    SELECTIVE dim side (high-priority orders) joins the fact (lineitem);
    with runtime bloom filters on, Spark builds a bloom filter from the
    dim's join keys at runtime and pushes `might_contain` INTO the fact
    scan — fact rows whose orderkey cannot match are dropped BEFORE the
    shuffle. At 100 TB this is the difference between shuffling the whole
    fact table and shuffling the ~matching slice — the semi-join reduction
    classic, done by the optimizer at runtime. Thresholds are lowered for
    the fixture scale (defaults assume a 10 GB application side); the
    filter's semantic invisibility IS the correctness gate — the oracle is
    the plain join. Injection is plan-asserted in tests/test_shuffle.py."""
    from rosbag2parquet_spark.sources.catalog import load_table

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "50MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        # keep the join a shuffle join so the bloom reduction has a shuffle
        # to save (a broadcast join already prunes via the hash relation)
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        li = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_quantity"
        )
        sel = (
            load_table(spark, sf_dir, "orders")
            .filter(F.col("o_orderpriority") == "1-URGENT")
            .select("o_orderkey", "o_orderpriority")
        )
        out = (
            li.join(sel, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).alias("n_items"),
                F.sum(F.col("l_quantity").cast("decimal(18,4)"))
                .cast("double")
                .alias("total_qty"),
            )
            .localCheckpoint(eager=True)  # execute under these confs
        )
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    return out


ORACLE_BLOOM_JOIN = """
SELECT o_orderpriority, count(*) AS n_items,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS total_qty
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderpriority = '1-URGENT'
GROUP BY o_orderpriority
"""


def q_skew_profile(spark, sf_dir: str) -> DataFrame:
    """The diagnostic BEHIND salting: the per-key group-size distribution
    of a shuffle key, reported as a log2 histogram (bucket b holds keys
    with 2^b <= rows < 2^(b+1)) plus each bucket's row mass and its
    heaviest key. One glance answers 'does this key need salting, and how
    many shards' — the decision q_salted_agg/q_salted_join hard-code.

    Plan: two-level aggregation — groupBy(key).count partial-combines
    map-side (the only full-data shuffle), then the histogram re-aggregates
    ~|keys| tiny rows. floor(log2(n)) is length(bin(n))-1 — integer-exact
    in both engines, no libm (the float log2 could round differently).
    max_by picks the bucket's heaviest key with a deterministic key
    tie-break so reruns and the oracle agree."""
    from rosbag2parquet_spark.sources.catalog import load_table

    per_key = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    bucketed = per_key.withColumn(
        "log2_bucket", (F.length(F.bin("n")) - 1).cast("int")
    )
    return bucketed.groupBy("log2_bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum("n").cast("long").alias("n_rows"),
        F.max("n").cast("long").alias("max_rows"),
        F.max_by(
            "user_id", F.struct(F.col("n"), (-F.col("user_id")).alias("tb"))
        ).alias("heaviest_key"),
    )


ORACLE_SKEW_PROFILE = """
WITH per_key AS (
  SELECT user_id, count(*) AS n FROM events GROUP BY user_id
),
bucketed AS (
  SELECT user_id, n, CAST(len(bin(n)) - 1 AS INTEGER) AS log2_bucket
  FROM per_key
),
mx AS (
  SELECT log2_bucket, max(n) AS mx_n FROM bucketed GROUP BY log2_bucket
)
SELECT b.log2_bucket,
       CAST(count(*) AS BIGINT) AS n_keys,
       CAST(sum(b.n) AS BIGINT) AS n_rows,
       CAST(any_value(m.mx_n) AS BIGINT) AS max_rows,
       min(CASE WHEN b.n = m.mx_n THEN b.user_id END) AS heaviest_key
FROM bucketed b JOIN mx m USING (log2_bucket)
GROUP BY b.log2_bucket
"""
# DuckDB's max_by can't take a struct ordering key, so the oracle states
# the same winner as max-filter-min: the smallest user_id among the
# bucket's max-count keys — exactly Spark's max_by(user_id,
# struct(n, -user_id)).


QUERIES = {
    "salted-agg": q_salted_agg,
    "salted-join": q_salted_join,
    "bloom-join": q_bloom_join,
    "skew-profile": q_skew_profile,
}
ORACLES = {
    "salted-agg": ORACLE_SALTED_AGG,
    "salted-join": ORACLE_SALTED_JOIN,
    "bloom-join": ORACLE_BLOOM_JOIN,
    "skew-profile": ORACLE_SKEW_PROFILE,
}


def salted_join(
    fact: DataFrame, dim: DataFrame, key: str, n_salts: int = 8
) -> DataFrame:
    """Skew-safe equi-join: fact rows get a salt shard (arbitrary but
    uniform — the join OUTPUT is identical for any sharding); the (small)
    dim is replicated across every shard; join on (key, salt). Output
    columns = fact ∪ dim minus bookkeeping."""
    fact_s = fact.withColumn(
        "__salt", F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(n_salts))
    )
    dim_s = dim.crossJoin(
        F.broadcast(
            fact.sparkSession.range(n_salts).select(F.col("id").cast("int").alias("__salt"))
        )
    )
    return fact_s.join(dim_s, on=[key, "__salt"]).drop("__salt")

"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the reference's `rosbag info`
aggregation surface, rosbag_example.cpp:37-72) on sf0.001.
``queries()``/``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 with its DuckDB oracle; implementations live in
``rosbag2parquet_spark`` and co-locate each oracle next to its operator.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from rosbag2parquet_spark import sinks  # noqa: E402
from rosbag2parquet_spark.functions import (  # noqa: E402
    dedup,
    kmeans,
    multimodal,
    sampling,
    similarity,
    text,
)
from rosbag2parquet_spark.operators import (  # noqa: E402
    analytic,
    asof,
    behavior,
    keys,
    olap,
    relational,
    setops,
    shuffle,
    tpch,
    windows,
)
from rosbag2parquet_spark.streaming import queries as streaming_queries  # noqa: E402


def _configure(spark: SparkSession) -> SparkSession:
    """Session invariants the engine relies on (UTC so timestamps hash
    identically to the DuckDB oracle; AQE for runtime re-planning; parquet
    timestamp semantics declared up front — see session.get_spark)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # a session built with the 200-partition default runs every tiny
        # shuffle as 200 tasks — size to the machine (runtime-settable)
        import os as _os

        cpus = int(_os.environ.get("SPARK_GRAFT_CPUS", "0")) or _os.cpu_count() or 8
        spark.conf.set("spark.sql.shuffle.partitions", str(cpus))
    except Exception:
        pass  # immutable on some builds; harmless
    return spark


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: per-type stats + derived rates on sf0.001 (reference
    rosbag_example.cpp:37-72 — the `rosbag info` analog)."""
    _configure(spark)
    return relational.q_derived(spark, "/root/testdata/sf0.001")


_MODULES = (
    relational,
    keys,
    olap,
    behavior,
    setops,
    tpch,
    analytic,
    asof,
    windows,
    text,
    dedup,
    similarity,
    kmeans,
    multimodal,
    sampling,
    shuffle,
    sinks,
    streaming_queries,
)


# Evaluation order for the driver (which iterates dict order and records only
# the FIRST 50 queries per round): queries whose driver row is red, changed,
# or new this round come first, then the least-recently-proven ones.
# ROUND-6 NOTE: after r5's driver run records the first 50, rotate again.
# The r5 window = the 28 new/changed entries + the first 22 r2-latest rows
# (through window-sliding). Oldest remaining rows, in priority order for
# the r6 front: the 8 spilled r2 rows (lag-lead, zscore, cube,
# grouping-sets, asof, kmeans, multimodal-features, multimodal-pointers),
# then the 19 r3-latest rows (demux … sessionize); r5-proven rotate to the
# back.
# ROUND-5 ROTATION (executing the r4 note): stream-sink (r4 driver-red:
# raw BinaryType in the compared output — now hex'd on both sides) and
# approx-stats (new exact-bounds oracle this round) lead; then the 31
# queries whose latest row is r2, then the r3-latest block; the 49 queries
# r4 just proved green rotate to the back. New queries added this round are
# inserted at the FRONT — they displace only r3-latest rows from the
# 50-query window, never an r2-latest one.
_QUERY_ORDER = [
    # changed this round — must re-prove
    "stream-sink", "approx-stats",
    # NEW this round: event-behavior suite + deterministic weighted sampling
    "compact-latest", "funnel", "cohort-retention", "weighted-sample",
    # NEW this round: measured recall for BOTH LSH structures; embed-neardup
    # re-proves here because multi-probe changed its pair set
    "lsh-recall", "embed-recall", "embed-neardup",
    # NEW this round: streaming twin of the log-compaction operator
    "stream-compact",
    # NEW this round: one-to-many media frame sampling (X7)
    "multimodal-frames",
    # NEW this round: JSON-path + higher-order array function surface (E5)
    "json-funcs", "array-funcs",
    # NEW this round: containment + normalized-exact dedup tiers (X2)
    "dedup-containment", "dedup-normalized",
    # NEW this round: time-based RANGE-frame trailing aggregate (X5)
    "rolling-window",
    # NEW this round: the five remaining TPC-H shapes (partsupp derived
    # from lineitem) — the full 22-query surface is now registered
    "sql-q2", "sql-q9", "sql-q11", "sql-q16", "sql-q20",
    # NEW this round: Gopher-style repetition filters + BM25 retrieval (X4)
    "repetition-score", "bm25-search",
    # NEW this round: streaming twin of exact dedup (dedup-at-ingest)
    "stream-dedup",
    # NEW this round: co-located join over bucketed layouts (pay-once
    # shuffle); join re-proves here because its plan changed (partial agg
    # pushed below the join)
    "bucket-join", "join",
    # NEW this round: skew-salted join + overlapping token-window chunking
    "salted-join", "tokenize-chunk",
    # NEW this round: integer-exact Markov power iteration (user journeys)
    "markov-chain",
    # latest driver row is r2 (31) — the rotation's main payload
    "scan", "project", "filter", "limit", "topk", "union", "topk-per-group",
    "time-split", "cast", "flatten", "decode-blob", "seqno",
    "groupby-agg", "derived", "rollup", "dim-join", "semi-join",
    "first-seen", "sql", "window-funcs", "window-tumbling", "window-sliding",
    "lag-lead", "zscore", "cube", "grouping-sets", "asof", "kmeans",
    "multimodal-features", "multimodal-pointers",
    # latest driver row is r3 (19) — fill the window; tail entries may spill
    # past 50 as new queries land (still meets the nothing-older-than-r3 bar)
    "demux", "sink", "token-count", "lang-id", "quality-score", "fingerprint",
    "dedup-exact", "dedup-minhash-lsh", "dedup-ngram-jaccard", "dedup-simhash",
    "knn", "knn-ivf", "knn-batch",
    "stats-corr", "string-agg", "explode-sequence", "distinct-count",
    "quantiles", "sessionize",
    # proven green by the r4 driver run — rotate to the back
    "text-stats", "null-semantics", "sql-q12",
    "sample-hash", "split-train-test", "mix-weighted",
    "cap-per-group", "pack-sequences", "shuffle-global", "contamination",
    "corpus-filter",
    "stream-tumbling", "stream-sliding", "stream-sessionize", "stream-neardup",
    "stream-profile",
    "sql-q8", "sql-q21", "knn-recall", "asof-tolerance", "scrub-terms",
    "interval-join",
    "sql-q4", "sql-q7", "sql-q13", "sql-q14", "sql-q15",
    "sql-q17", "sql-q19", "sql-q22",
    "rollup-hypertable", "top-terms", "outer-join", "salted-agg",
    "dedup-clusters",
    "like-filter", "anti-join", "range-join", "intersect",
    "sql-q3", "sql-q5", "sql-q6", "sql-q10", "sql-q18", "scalar-funcs",
    "pivot", "unpivot", "histogram",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    raw: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _MODULES:
        for name, fn in mod.QUERIES.items():
            if name in raw:
                raise ValueError(f"duplicate query name {name!r}")

            def wrapped(spark, sf_dir, _fn=fn):
                return _fn(_configure(spark), sf_dir)

            raw[name] = wrapped
    missing = set(raw) - set(_QUERY_ORDER)
    extra = set(_QUERY_ORDER) - set(raw)
    if missing or extra:
        raise ValueError(f"_QUERY_ORDER out of sync: missing={missing} extra={extra}")
    return {name: raw[name] for name in _QUERY_ORDER}


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _MODULES:
        out.update(mod.ORACLES)
    return out

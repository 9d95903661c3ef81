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

from rosbag2parquet_spark import sinks, snapshots  # noqa: E402
from rosbag2parquet_spark.functions import (  # noqa: E402
    dedup,
    kmeans,
    multimodal,
    pq,
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
    quality,
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
    quality,
    behavior,
    setops,
    tpch,
    analytic,
    asof,
    windows,
    text,
    dedup,
    similarity,
    pq,
    kmeans,
    multimodal,
    sampling,
    shuffle,
    sinks,
    snapshots,
    streaming_queries,
)


# Evaluation order for the driver (which iterates dict order and records only
# the FIRST 50 queries per round): queries whose driver row is red, changed,
# or new this round come first, then the least-recently-proven ones.
#
# ROUND-14 ROTATION (optimization round 2 of 2 — no new queries): the 13
# rows whose PLANS changed this round lead (outputs identical, but the
# driver should re-prove exactly the rows the optimizer touched:
# validate-constraints' one-pass fusion, hll-sketch's window union,
# schema-evolution's fused parity check, the drift/sampler window-totals
# family, the monitor-memo stream twins, and the overlapped
# stream-ivfadc-delete). Slots 14-44 take ALL 31 remaining r9-proven rows
# (sql-q20 .. kmeans — exactly the block the r13 ledger staged for this
# window); slots 45-50 start the r10 block (semdedup .. knn-opq).
# Freshness histogram going into r14: r9:31, r10:38, r11:50, r12:50,
# r13:50 (one r13-window row, stream-ivfadc-delete, re-proves as touched).
# After this window nothing is older than r10; r15's window continues the
# r10 block at opq-recall.
_QUERY_ORDER = [
    # --- r14 window ----------------------------------------------------------
    # plans touched this round (re-prove first)
    "validate-constraints", "hll-sketch", "schema-evolution", "drift-detect",
    "drift-numeric", "alert-rules", "stratified-sample", "temperature-sample",
    "stream-drift", "stream-numeric-drift", "stream-volume-trend",
    "stream-alert-transitions", "stream-ivfadc-delete",
    # the 31 oldest driver rows — the full remaining r9 block
    "sql-q20", "repetition-score", "bm25-search", "stream-dedup",
    "bucket-join", "join", "salted-join", "tokenize-chunk", "markov-chain",
    "scan", "project", "filter", "limit", "topk", "union", "topk-per-group",
    "time-split", "cast", "flatten", "decode-blob", "seqno", "groupby-agg",
    "derived", "rollup", "dim-join", "semi-join", "first-seen", "sql",
    "window-funcs", "window-tumbling", "kmeans",
    # r10 block begins; the window cuts at 50 (after knn-opq)
    "semdedup", "stream-semdedup", "pq-quantize", "knn-pq", "pq-recall",
    "knn-opq", "opq-recall", "stream-cdc-apply", "pq-pack",
    "stream-weighted-sample", "stream-resample", "knn-pq-packed", "ivf-stats",
    "ivf-nprobe-curve", "stream-neardup-parity", "scd2-intervals",
    "stream-scd2", "bloom-join", "cluster-write", "zorder-write",
    "embed-neardup", "embed-recall", "asof", "cube", "grouping-sets",
    "lag-lead", "multimodal-features", "multimodal-pointers",
    "window-sliding", "zscore", "token-count", "lang-id", "quality-score",
    "fingerprint", "knn-ivf", "knn-ivf-quantized", "knn-recall", "knn-ivf-pq",
    "ivf-pq-recall", "knn-ivfadc", "ivfadc-recall", "knn-ivfadc-opq",
    "ivfadc-opq-recall", "stream-knn-ivf", "knn-ivfadc-np4",
    "ivfadc-np4-recall", "stream-knn-ivfadc", "provenance-read", "sink",
    "demux", "dedup-exact", "dedup-minhash-lsh", "dedup-ngram-jaccard",
    "dedup-simhash", "knn", "knn-batch", "stats-corr", "string-agg",
    "explode-sequence", "distinct-count", "quantiles", "sessionize",
    "text-stats", "null-semantics", "sql-q12", "sample-hash",
    "split-train-test", "mix-weighted", "cap-per-group", "pack-sequences",
    "shuffle-global", "contamination", "corpus-filter", "stream-tumbling",
    "table-diff", "substring-dedup", "skew-profile", "incr-rollup",
    "stream-funnel", "vacuum", "doc-keywords", "json-roundtrip",
    "stream-validate", "knn-ivfadc-sl", "ivfadc-sl-recall", "ivfadc-cutover",
    "ivfadc-shard-merge", "snapshot-read", "dedup-editdist", "pseudonymize",
    "scrub-dup-spans", "protobuf-roundtrip", "convert-resume",
    "analyze-table", "delete-rows", "stream-analyze", "stream-asof",
    "export-roundtrip", "stream-knn", "lm-surprise", "ewma", "stream-ewma",
    "scd2-asof", "compact-files", "merge-upsert", "compact-partitioned",
    "stream-merge-upsert", "gap-detect", "stream-gap-detect", "heavy-hitters",
    "stream-heavy-hitters", "asof-nearest", "resample-interpolate",
    "stream-sliding", "stream-sessionize", "sql-q8", "sql-q21", "sql-q4",
    "sql-q7", "sql-q13", "sql-q14", "sql-q15", "sql-q17", "sql-q19",
    "sql-q22", "sql-q3", "sql-q5", "sql-q6", "sql-q10", "sql-q18",
    "stream-neardup", "stream-profile", "ivfadc-compact",
    "stream-ivfadc-cutover", "knn-ivfadc-filtered", "stream-bm25",
    "ivfadc-delete", "ivf-shortlist-curve", "ivfadc-persist",
    "asof-tolerance", "scrub-terms", "interval-join", "rollup-hypertable",
    "top-terms", "outer-join", "salted-agg", "dedup-clusters", "like-filter",
    "anti-join", "range-join", "intersect", "scalar-funcs", "pivot",
    "unpivot", "histogram", "embed-quantize", "volume-trend", "knn-quantized",
    "stream-sink", "approx-stats", "compact-latest", "funnel",
    "cohort-retention", "weighted-sample", "lsh-recall", "stream-compact",
    "multimodal-frames", "json-funcs", "array-funcs", "dedup-containment",
    "dedup-normalized", "rolling-window", "sql-q2", "sql-q9", "sql-q11",
    "sql-q16",
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

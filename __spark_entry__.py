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
# ROUND-13 ROTATION (executing the r12 verdict's sequencing): 3 NEW rows
# lead (the verdict's ≤3 cap) — the IVFADC storage COMPACTION pass
# (verdict #3: rewrite the surviving codes, drop the tombstone set;
# `ivfadc-delete`'s oracle verbatim proves rewrite == filter), the LIVE
# cutover twin (verdict #4: migrated vectors stream into the new rotated
# index while old slices keep serving — batch `ivfadc-cutover`'s oracle
# verbatim), and FILTERED ANN (verdict #6 optional depth: a metadata
# predicate composed with the IVFADC serve — the `WHERE lang='en'`
# production shape, predicate in the tombstone bitmap's stage-1 slot).
# No answer-changed rows (the r12 advisor fixes change artifact keying
# and error faces, not values). Slots 4-8 take the 5 late-r12 rows that
# have never had a driver row (built after the r12 window froze); slots
# 9-32 ALL 24 remaining r8-proven rows; slots 33-50 the 18 oldest r9
# rows. Freshness histogram going into r13: r8:24, r9:50, r10:38,
# r11:50, r12:50 (+5 never-proven). After this window nothing is older
# than r9; r14's window clears the remaining 31 r9 rows (sql-q20 ..
# kmeans — count them below, the staged block IS the ledger) and starts
# on r10.
_QUERY_ORDER = [
    # --- r13 window --------------------------------------------------------
    # NEW round 13: the compaction storage pass (delete's optional pass
    # made provable — serves with NO tombstone predicate from a rewritten
    # artifact), the zero-downtime live migration serve, and the
    # metadata-filtered IVFADC serve
    "ivfadc-compact", "stream-ivfadc-cutover", "knn-ivfadc-filtered",
    # late-r12 rows with no driver row yet (replica-green both fixtures)
    "stream-bm25", "ivfadc-delete", "stream-ivfadc-delete",
    "ivf-shortlist-curve", "ivfadc-persist",
    # r8-proven rows (the oldest driver rows — ALL 24 re-proven here)
    "asof-tolerance", "scrub-terms", "interval-join", "rollup-hypertable",
    "top-terms", "outer-join", "salted-agg", "dedup-clusters", "like-filter",
    "anti-join", "range-join", "intersect", "scalar-funcs", "pivot", "unpivot",
    "histogram", "embed-quantize", "stratified-sample", "temperature-sample",
    "stream-drift", "volume-trend", "stream-numeric-drift",
    "stream-volume-trend", "knn-quantized",
    # (knn-quantized closes the r8 block — the r12 verdict's freshness
    # ledger counts it r8-proven, though earlier files grouped it with
    # the r9 rows; either way it is among the oldest and re-proves here)
    # the 18 oldest r9-proven rows fill the window (3+5+24+18 = 50)
    "stream-sink", "approx-stats", "compact-latest", "funnel",
    "cohort-retention", "weighted-sample", "lsh-recall", "stream-compact",
    "multimodal-frames", "json-funcs", "array-funcs", "dedup-containment",
    "dedup-normalized", "rolling-window", "sql-q2", "sql-q9", "sql-q11",
    "sql-q16",
    # --- window ends here (50) ---------------------------------------------
    # remaining r9-proven rows (lead the r14 window)
    "sql-q20", "repetition-score", "bm25-search", "stream-dedup",
    "bucket-join", "join", "salted-join", "tokenize-chunk", "markov-chain",
    "scan", "project", "filter", "limit", "topk", "union", "topk-per-group",
    "time-split", "cast", "flatten", "decode-blob", "seqno", "groupby-agg",
    "derived", "rollup", "dim-join", "semi-join", "first-seen", "sql",
    "window-funcs", "window-tumbling", "kmeans",
    # r10-proven
    "semdedup", "stream-semdedup", "pq-quantize", "knn-pq", "pq-recall",
    "drift-detect", "drift-numeric", "knn-opq", "opq-recall",
    "stream-cdc-apply", "alert-rules", "pq-pack", "stream-weighted-sample",
    "stream-resample", "stream-alert-transitions", "knn-pq-packed",
    "ivf-stats", "ivf-nprobe-curve", "stream-neardup-parity", "hll-sketch",
    "scd2-intervals", "stream-scd2", "bloom-join", "cluster-write",
    "zorder-write", "embed-neardup", "embed-recall", "asof", "cube",
    "grouping-sets", "lag-lead", "multimodal-features", "multimodal-pointers",
    "window-sliding", "zscore", "token-count", "lang-id", "quality-score",
    # r11-proven (freshest)
    "fingerprint", "knn-ivf", "knn-ivf-quantized", "knn-recall", "knn-ivf-pq",
    "ivf-pq-recall", "knn-ivfadc", "ivfadc-recall", "knn-ivfadc-opq",
    "ivfadc-opq-recall", "stream-knn-ivf", "knn-ivfadc-np4",
    "ivfadc-np4-recall", "stream-knn-ivfadc", "provenance-read",
    "sink", "demux", "dedup-exact", "dedup-minhash-lsh", "dedup-ngram-jaccard",
    "dedup-simhash", "knn", "knn-batch", "stats-corr", "string-agg",
    "explode-sequence", "distinct-count", "quantiles", "sessionize",
    "text-stats", "null-semantics", "sql-q12", "sample-hash",
    "split-train-test", "mix-weighted", "cap-per-group", "pack-sequences",
    "shuffle-global", "contamination", "corpus-filter", "stream-tumbling",
    "table-diff", "substring-dedup", "skew-profile", "incr-rollup",
    "stream-funnel", "vacuum", "doc-keywords", "json-roundtrip",
    "validate-constraints",
    "stream-validate",
    # r12-proven (freshest — the r12 window, in its proven order)
    "knn-ivfadc-sl", "ivfadc-sl-recall", "ivfadc-cutover",
    "ivfadc-shard-merge",
    "snapshot-read", "dedup-editdist", "pseudonymize", "schema-evolution",
    "scrub-dup-spans", "protobuf-roundtrip", "convert-resume", "analyze-table",
    "delete-rows", "stream-analyze", "stream-asof", "export-roundtrip",
    "stream-knn", "lm-surprise", "ewma", "stream-ewma", "scd2-asof",
    "compact-files", "merge-upsert", "compact-partitioned",
    "stream-merge-upsert", "gap-detect", "stream-gap-detect", "heavy-hitters",
    "stream-heavy-hitters", "asof-nearest", "resample-interpolate",
    "stream-sliding", "stream-sessionize",
    "sql-q8", "sql-q21", "sql-q4", "sql-q7", "sql-q13", "sql-q14", "sql-q15",
    "sql-q17", "sql-q19", "sql-q22", "sql-q3", "sql-q5", "sql-q6", "sql-q10",
    "sql-q18", "stream-neardup", "stream-profile",
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

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
# ROUND-10 ROTATION (executing the r9 verdict's sequencing, then the
# late-r10 depth sweep): the 18 rows with no green driver row yet LEAD —
# the 9 CHANGED in r9 (argmin dependents + sink/drift, all locally green
# since) and the 9 NEW in r9 (driver-unsampled; replica-verified by the
# judge) — then stream-resample (changed r10: state-shuffle sizing) and
# the 9 NEW r10 rows (knn-ivfadc .. ivf-nprobe-curve), filling slots
# 1-28. Slots 29-50 take the first 22 of the 46 r6-proven rows — after
# the r9 window re-proved the r5 block, r6 rows are the oldest in the
# histogram. The remaining 24 r6 rows (dedup-exact .. stream-tumbling)
# lead r11, then the r7 block. Freshness histogram going into r10:
# r6:46, r7:41, r8:50, r9:50 (+9 r9-new unsampled). After this window:
# r6:24, r7:41, r8:50, r9:50, r10:50 — r11 clears the r6 tail and
# starts on r7; zero rows older than r8 lands by r12.
_QUERY_ORDER = [
    # --- r10 window --------------------------------------------------------
    # CHANGED round 9 without a fresh driver row: the argmin dependents;
    # sink's Messages gained the TODO-#7 `time` column (and, round 10, the
    # TODO bag_index provenance column); drift-detect/drift-numeric
    # hardened late-r9 (NULL-ts rows land in epoch 2 engine-side)
    "stream-semdedup", "sink", "knn-ivf", "knn-ivf-quantized", "pq-quantize",
    "knn-pq", "pq-recall", "drift-detect", "drift-numeric",
    # NEW round 9, never driver-sampled: the composed IVFADC serve stack +
    # recall; the OPQ rung + recall (learned alternation round 10); the CDC
    # file-landing ingest twin (schema evolution round 10); alert rules;
    # nibble-packed codes; the live IVF serve; the live PPS sampler
    "knn-ivf-pq", "ivf-pq-recall", "knn-opq", "opq-recall",
    "stream-cdc-apply", "alert-rules", "pq-pack", "stream-knn-ivf",
    "stream-weighted-sample",
    # CHANGED round 10: the stateful shuffle is sized to the key domain
    # (result-invariant — partitioning only; the r9 perf flag's fix)
    "stream-resample",
    # NEW round 10: the residual-encoded IVFADC rung (PQ codes describe
    # the residual against the coarse cell's normalized centroid — the
    # shape FAISS stores) + its measured-recall row, then the two r10
    # rungs COMPOSED (rotate -> coarse-quantize -> encode rotated
    # residuals, FAISS's OPQ,IVF,PQ chain — SURVEY §7.1 #4's composition)
    "knn-ivfadc", "ivfadc-recall", "knn-ivfadc-opq", "ivfadc-opq-recall",
    # NEW round 10: alert ROUTING — the monitor's verdict EDGES
    # (ok→violating pages, violating→ok recoveries) as a live stream
    # (SURVEY §7.1 r11 #2)
    "stream-alert-transitions",
    # NEW round 10: bag provenance surfaced end to end — per-type rows
    # joined to Messages' (seqno, bag_index) over a two-batch fleet
    # layout (reference TODO FlattenedRosWriter.cpp:183; SURVEY §7.1 #3)
    "provenance-read",
    # NEW round 10: the ADC serve reading ONLY the packed 4 B/vector
    # nibbles (unpack in-expression; value-identical to knn-pq, shared
    # oracle), the IVF imbalance report the index is tuned by, and the
    # recall@nprobe sensitivity curve (§7.1 #5 — MEASURES that the probe
    # set, not the encoding, binds pruned recall on this fixture)
    "knn-pq-packed", "ivf-stats", "ivf-nprobe-curve",
    # r6-PROVEN rows 1-22 (the oldest driver rows once the 28 above land)
    "stream-neardup-parity", "hll-sketch", "scd2-intervals", "stream-scd2",
    "bloom-join", "cluster-write", "zorder-write", "embed-neardup",
    "embed-recall", "asof", "cube", "grouping-sets", "lag-lead",
    "multimodal-features", "multimodal-pointers", "window-sliding", "zscore",
    "demux", "token-count", "lang-id", "quality-score", "fingerprint",
    # --- window ends here (50) ---------------------------------------------
    # r6-proven rows 23-46 (lead the r11 window)
    "dedup-exact", "dedup-minhash-lsh", "dedup-ngram-jaccard",
    "dedup-simhash", "knn", "knn-batch", "stats-corr",
    "string-agg", "explode-sequence",
    "distinct-count", "quantiles", "sessionize",
    "text-stats", "null-semantics", "sql-q12", "sample-hash",
    "split-train-test", "mix-weighted", "cap-per-group", "pack-sequences",
    "shuffle-global", "contamination", "corpus-filter", "stream-tumbling",
    # r7-proven
    "table-diff", "substring-dedup", "skew-profile", "incr-rollup",
    "stream-funnel", "vacuum", "doc-keywords", "json-roundtrip",
    "validate-constraints", "stream-validate", "snapshot-read",
    "dedup-editdist", "pseudonymize", "schema-evolution", "scrub-dup-spans",
    "protobuf-roundtrip", "convert-resume", "analyze-table", "delete-rows",
    "stream-analyze", "stream-asof", "export-roundtrip", "stream-knn",
    "lm-surprise", "ewma", "stream-ewma", "scd2-asof", "compact-files",
    "merge-upsert", "compact-partitioned",
    "stream-merge-upsert", "gap-detect", "stream-gap-detect",
    "heavy-hitters", "stream-heavy-hitters", "asof-nearest",
    "resample-interpolate", "stream-sliding", "stream-sessionize",
    # r8-proven
    "stream-neardup", "stream-profile", "sql-q8", "sql-q21", "knn-recall",
    "asof-tolerance", "scrub-terms", "interval-join", "sql-q4", "sql-q7",
    "sql-q13", "sql-q14", "sql-q15", "sql-q17", "sql-q19", "sql-q22",
    "rollup-hypertable", "top-terms", "outer-join", "salted-agg",
    "dedup-clusters", "like-filter", "anti-join", "range-join", "intersect",
    "sql-q3", "sql-q5", "sql-q6", "sql-q10", "sql-q18", "scalar-funcs",
    "pivot", "unpivot", "histogram", "embed-quantize", "stratified-sample",
    "temperature-sample", "stream-drift",
    "volume-trend", "stream-numeric-drift", "stream-volume-trend",
    "knn-quantized",
    # r9-proven (freshest — rotate to the back): the 48 re-proven r5 rows
    # plus the two changed rows that closed the r9 window
    "stream-sink", "approx-stats", "compact-latest", "funnel",
    "cohort-retention", "weighted-sample", "lsh-recall", "stream-compact",
    "multimodal-frames", "json-funcs", "array-funcs", "dedup-containment",
    "dedup-normalized", "rolling-window", "sql-q2", "sql-q9", "sql-q11",
    "sql-q16", "sql-q20", "repetition-score", "bm25-search", "stream-dedup",
    "bucket-join", "join", "salted-join", "tokenize-chunk", "markov-chain",
    "scan", "project", "filter", "limit", "topk", "union", "topk-per-group",
    "time-split", "cast", "flatten", "decode-blob", "seqno", "groupby-agg",
    "derived", "rollup", "dim-join", "semi-join", "first-seen", "sql",
    "window-funcs", "window-tumbling", "kmeans", "semdedup",
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

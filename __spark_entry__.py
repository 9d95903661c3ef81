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
# ROUND-8 ROTATION (executing the r7 note verbatim): the THIRTY-FOUR
# r4-latest rows lead ("stream-neardup" .. "histogram" — after r7 these
# were the only rows older than r5), then the 7 changed queries
# (embed-quantize fixed from the r7 red; the drift trio and two samplers
# hardened per ADVICE), then the new + refactored similarity queries.
# Registry growth this round is deliberately throttled so the window
# covers stale + changed + new EXACTLY: 34 stale + 7 changed + 6 new +
# sink (late-changed: Messages gained the header-stamp pair) +
# 2 refactored = 50/50.
# ROUND-9 NOTE: after the r8 driver run the freshness histogram should be
# r5: ~40 (the "stream-sink".. block tail the r8 window could not reach),
# r6: ~47, r7/r8: the rest. For r9: lead with the r5-proven block
# ("stream-sink" onward, in this list's order), then new/changed; r6-,
# r7- and r8-proven rotate to the back. At ~186 queries a full rotation
# is 3.7 rounds — keep new-query growth <= 10/round or the oldest-row age
# exceeds 4 rounds by arithmetic.
_QUERY_ORDER = [
    # --- r8 window ---------------------------------------------------------
    # THE 34 r4-LATEST ROWS FIRST (executing the round-8 note verbatim:
    # these are the oldest driver rows — 16 TPC-H shapes, the join/set-op
    # tier, knn-recall, the r4 streaming twins — all code-unchanged and
    # locally green, re-proven before anything else)
    "stream-neardup", "stream-profile", "sql-q8", "sql-q21", "knn-recall",
    "asof-tolerance", "scrub-terms", "interval-join", "sql-q4", "sql-q7",
    "sql-q13", "sql-q14", "sql-q15", "sql-q17", "sql-q19", "sql-q22",
    "rollup-hypertable", "top-terms", "outer-join", "salted-agg",
    "dedup-clusters", "like-filter", "anti-join", "range-join", "intersect",
    "sql-q3", "sql-q5", "sql-q6", "sql-q10", "sql-q18", "scalar-funcs",
    "pivot", "unpivot", "histogram",
    # CHANGED round 8 — must re-prove: embed-quantize emits the codes as a
    # comma-joined string (the r7 driver-red: a raw ARRAY cell is
    # unhashable under the driver's canonicalizer); the drift trio + the
    # two data-derived samplers widened to DECIMAL(38,0)/HUGEINT overflow-
    # safe arithmetic, floor-division midpoints/hour-buckets, and the
    # drift-numeric zero-range guard (advisor items)
    "embed-quantize", "stratified-sample", "temperature-sample",
    "drift-detect", "stream-drift", "drift-numeric", "volume-trend",
    # NEW round 8: the composed production ANN serve shape (IVF cell
    # pruning x int8 code scan — `knn-ivf` bounds SEARCH, `embed-quantize`
    # bounds STORAGE; this is the index both docstrings gesture at), and
    # the live twins completing the monitoring trio's streaming coverage
    # (frozen-reference numeric histogram, <=10-row state; per-type-hour
    # volume counts, state bounded by time span not stream length)
    # and the product-quantization rung (M=8 x K=16 codebooks from the
    # deterministic trainer; ADC search from PQ codes — ~64x at one byte
    # per code, ~128x nibble-packed)
    "knn-ivf-quantized", "stream-numeric-drift", "stream-volume-trend",
    "pq-quantize", "knn-pq", "pq-recall",
    # CHANGED round 8 (late): every converter's Messages table gains the
    # nullable header-stamp pair (reference TODO #6) — the sink
    # round-trip re-proves the new shape; the Stats table + fail-fast
    # path validation landed in the same change
    "sink",
    # refactored round 8 (shared _ivf_probe_cells/_quantized_codes helpers
    # — same expressions, same plans; re-proven out of caution)
    "knn-quantized", "knn-ivf",
    # --- window ends ~here (50); r5-proven head re-proves in any slack ----
    # proven green by the r5 driver run — the oldest remaining rows lead
    # the post-window order, then the r6- and r7-proven blocks rotate back
    "stream-sink", "approx-stats", "compact-latest", "funnel",
    "cohort-retention", "weighted-sample", "lsh-recall", "stream-compact",
    "multimodal-frames", "json-funcs", "array-funcs", "dedup-containment",
    "dedup-normalized", "rolling-window", "sql-q2", "sql-q9", "sql-q11",
    "sql-q16", "sql-q20", "repetition-score", "bm25-search", "stream-dedup",
    "bucket-join", "join", "salted-join", "tokenize-chunk", "markov-chain",
    "scan", "project", "filter", "limit", "topk", "union", "topk-per-group",
    "time-split", "cast", "flatten", "decode-blob", "seqno", "groupby-agg",
    "derived", "rollup", "dim-join", "semi-join", "first-seen", "sql",
    "window-funcs", "window-tumbling", "stream-neardup-parity", "hll-sketch",
    "scd2-intervals", "stream-scd2", "bloom-join", "cluster-write",
    "zorder-write", "embed-neardup", "embed-recall", "asof", "cube",
    "grouping-sets", "kmeans", "lag-lead", "multimodal-features",
    "multimodal-pointers", "window-sliding", "zscore", "demux",
    "token-count", "lang-id", "quality-score", "fingerprint", "dedup-exact",
    "dedup-minhash-lsh", "dedup-ngram-jaccard", "dedup-simhash", "knn",
    "knn-batch", "stats-corr", "string-agg", "explode-sequence",
    "distinct-count", "quantiles", "sessionize", "text-stats",
    "null-semantics", "sql-q12", "sample-hash", "split-train-test",
    "mix-weighted", "cap-per-group", "pack-sequences", "shuffle-global",
    "contamination", "corpus-filter", "stream-tumbling",
    # proven green by the r7 driver run (49/50; rotate to the back)
    "table-diff", "substring-dedup", "skew-profile", "incr-rollup",
    "stream-funnel", "vacuum", "doc-keywords", "json-roundtrip",
    "validate-constraints", "stream-validate", "snapshot-read",
    "dedup-editdist", "pseudonymize", "schema-evolution", "scrub-dup-spans",
    "protobuf-roundtrip", "convert-resume", "analyze-table", "delete-rows",
    "stream-analyze", "semdedup", "stream-asof", "stream-semdedup",
    "export-roundtrip", "stream-knn", "lm-surprise", "ewma", "stream-ewma",
    "scd2-asof", "compact-files", "stream-resample", "merge-upsert",
    "compact-partitioned", "stream-merge-upsert", "gap-detect",
    "stream-gap-detect", "heavy-hitters", "stream-heavy-hitters",
    "asof-nearest", "resample-interpolate", "stream-sliding",
    "stream-sessionize",
    # NEW round 9 (placed provisionally; final window ordering is set at
    # end of round): the composed IVF×PQ serve stack + its recall row,
    # and the OPQ rotated-PQ rung + its recall row
    "knn-ivf-pq", "ivf-pq-recall", "knn-opq", "opq-recall",
    "stream-cdc-apply", "alert-rules",
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

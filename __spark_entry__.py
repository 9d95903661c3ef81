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
# ROUND-11 ROTATION (executing the r10 verdict's sequencing): the
# IVF_NPROBE 2→3 deploy (the verdict's #1 — measured by ivf-nprobe-curve
# and a full-pipeline A/B replica) changes the ANSWERS of the 10 probed
# serves + recall rows, so they LEAD with the 3 NEW rows (the per-query
# nprobe=4 serve + its recall, and incremental IVFADC maintenance), then
# the 3 converter-dependent rows the write-time per-type bag_index stamp
# re-plans (provenance-read now reads the stamped column — no seqno join;
# sink/demux ride the same converter, values unchanged) — slots 1-16.
# Slots 17-40 take ALL 24 remaining r6-proven rows (dedup-exact ..
# stream-tumbling); slots 41-50 the 10 oldest r7 rows. Freshness
# histogram going into r11: r6:24, r7:39, r8:50, r9:50, r10:50. After
# this window: r7:29, r8:50, r9:50, r10:50, r11:50 — r12 clears the r7
# tail (29 rows) and starts on r8; zero rows older than r8 lands at r12
# as planned.
_QUERY_ORDER = [
    # --- r11 window --------------------------------------------------------
    # CHANGED round 11: IVF_NPROBE 2→3 (the r10 verdict's measured deploy;
    # recall@10 at sf0.01: knn-recall/ivfadc 7→9, composed rungs +1 — the
    # curve's prediction, now driver-provable). Every row whose answer the
    # probe set feeds:
    "knn-ivf", "knn-ivf-quantized", "knn-recall", "knn-ivf-pq",
    "ivf-pq-recall", "knn-ivfadc", "ivfadc-recall", "knn-ivfadc-opq",
    "ivfadc-opq-recall", "stream-knn-ivf",
    # NEW round 11: nprobe as a PER-QUERY serve parameter (FAISS's
    # search-time knob; SURVEY §7.1 #5's remaining headroom) — the deeper
    # nprobe=4 residual serve + its measured recall row (9/10 vs the
    # curve's exact-scan ceiling of 10/10: past nprobe=3 the ADC
    # shortlist, not the probe set, binds) — and INCREMENTAL IVFADC index
    # maintenance (§7.1 #7: arriving vectors append codes under the
    # frozen quantizer; batch knn-ivfadc's oracle verbatim)
    "knn-ivfadc-np4", "ivfadc-np4-recall", "stream-knn-ivfadc",
    # CHANGED round 11: per-type tables now carry the bag_index stamp at
    # WRITE time (reference TODO FlattenedRosWriter.cpp:183 "ALL entries"),
    # so provenance-read is a projection — the seqno join is gone from its
    # plan; sink/demux ride the same converter (values unchanged)
    "provenance-read", "sink", "demux",
    # r6-proven rows 23-46 — the oldest driver rows, ALL re-proven here
    "dedup-exact", "dedup-minhash-lsh", "dedup-ngram-jaccard",
    "dedup-simhash", "knn", "knn-batch", "stats-corr",
    "string-agg", "explode-sequence",
    "distinct-count", "quantiles", "sessionize",
    "text-stats", "null-semantics", "sql-q12", "sample-hash",
    "split-train-test", "mix-weighted", "cap-per-group", "pack-sequences",
    "shuffle-global", "contamination", "corpus-filter", "stream-tumbling",
    # r7-proven rows 1-10 (the next-oldest)
    "table-diff", "substring-dedup", "skew-profile", "incr-rollup",
    "stream-funnel", "vacuum", "doc-keywords", "json-roundtrip",
    "validate-constraints", "stream-validate",
    # --- window ends here (50) ---------------------------------------------
    # r7-proven rows 11-39 (lead the r12 window)
    "snapshot-read",
    "dedup-editdist", "pseudonymize", "schema-evolution", "scrub-dup-spans",
    "protobuf-roundtrip", "convert-resume", "analyze-table", "delete-rows",
    "stream-analyze", "stream-asof", "export-roundtrip", "stream-knn",
    "lm-surprise", "ewma", "stream-ewma", "scd2-asof", "compact-files",
    "merge-upsert", "compact-partitioned",
    "stream-merge-upsert", "gap-detect", "stream-gap-detect",
    "heavy-hitters", "stream-heavy-hitters", "asof-nearest",
    "resample-interpolate", "stream-sliding", "stream-sessionize",
    # r8-proven
    "stream-neardup", "stream-profile", "sql-q8", "sql-q21",
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
    # r10-proven (freshest — rotate to the back): the r10 window's rows
    # minus those re-led above by the r11 nprobe deploy / converter stamp
    "stream-semdedup", "pq-quantize", "knn-pq", "pq-recall", "drift-detect",
    "drift-numeric", "knn-opq", "opq-recall", "stream-cdc-apply",
    "alert-rules", "pq-pack", "stream-weighted-sample", "stream-resample",
    "stream-alert-transitions", "knn-pq-packed", "ivf-stats",
    "ivf-nprobe-curve", "stream-neardup-parity", "hll-sketch",
    "scd2-intervals", "stream-scd2", "bloom-join", "cluster-write",
    "zorder-write", "embed-neardup", "embed-recall", "asof", "cube",
    "grouping-sets", "lag-lead", "multimodal-features",
    "multimodal-pointers", "window-sliding", "zscore", "token-count",
    "lang-id", "quality-score", "fingerprint",
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

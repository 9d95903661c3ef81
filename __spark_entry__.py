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
# ROUND-7 ROTATION (executing the r6 note — second consecutive hold of the
# rolling freshness invariant): 3 new + 1 changed query first, then the
# REMAINDER of the r4-latest block (36 queries, "stream-sliding" onward —
# the oldest remaining rows), which together fill 40 of the 50-query
# window; the head of the r5-proven block re-proves in the remaining 10.
# The 50 rows r6 just proved rotate to the back. After this round's driver
# run, NO query's latest row is older than r5.
# ROUND-8 NOTE: the r7 window = 48 new/changed (through
# "resample-interpolate") + the first 2 of the 36 r4-latest rows
# (through "stream-sessionize"). The 48 genuinely-new queries
# outprioritized the last THIRTY-FOUR r4 rows — "stream-neardup" through
# "histogram" in this list's order slip past the freshness target this
# once (r4-latest after r7; a first-ever row for a new query beats
# re-proving a stable green one; 181 queries against a 50-row window
# makes a full rotation 3.6 rounds, so a 48-new round necessarily defers
# re-proofs). For r8: those THIRTY-FOUR FIRST ("stream-neardup",
# "stream-profile", "sql-q8", "sql-q21", "knn-recall", "asof-tolerance",
# "scrub-terms", "interval-join", "sql-q4", "sql-q7", "sql-q13",
# "sql-q14", "sql-q15", "sql-q17", "sql-q19", "sql-q22",
# "rollup-hypertable", "top-terms", "outer-join", "salted-agg",
# "dedup-clusters", "like-filter", "anti-join", "range-join",
# "intersect", "sql-q3", "sql-q5", "sql-q6", "sql-q10", "sql-q18",
# "scalar-funcs", "pivot", "unpivot", "histogram"), then any
# new/changed, then the r5-proven block ("stream-sink" onward); r6- then
# r7-proven rotate to the back.
_QUERY_ORDER = [
    # NEW round 7 (late): semantic dedup — k-means cells + intra-cluster
    # cosine prune with a deterministic keep-lowest-id representative;
    # the streaming twin of the as-of join (carried-quote state over the
    # unioned keyed log)
    # NEW round 7 (latest): protobuf MCAP decode proven in the driver gate
    # (hand-rolled FileDescriptorSet + wire decoder, sources/protobuf.py);
    # incremental grown-bag ingest (resume_convert_bag — first half
    # recorded+converted, second half INSERTed into the same .db3 and
    # resumed via the _ingest_state.json cursor, seqno continuous)
    # NEW round 7 (latest): ANALYZE — per-column stats (count/nulls/exact
    # NDV/min/max) in one Expand-shared pass, stack-unpivoted
    # NEW round 7 (latest): copy-on-write DELETE WHERE (only files
    # containing matches rewritten, per-file atomic swap)
    # NEW round 7 (latest): continuous ANALYZE — the O(1)-state streaming
    # stats monitor twin
    # NEW round 7 (session 2): snapshot CDC extraction — the inverse of
    # merge-upsert (insert/delete/update set from two keyed snapshots,
    # one co-partitioned full-outer join); span-level duplicate mass
    # (positional 5-word windows occurring >=2x corpus-wide — the
    # suffix-style dedup granularity the document-level tiers can't see)
    # the per-key group-size log2 histogram (the salting decision input);
    # class-balanced sampling with data-derived per-stratum rates
    # materialized-rollup refresh (delta partials merged into a stored
    # base — history touched exactly once)
    # and the live funnel (ordered-stage state, O(1)/key, batch oracle)
    "table-diff", "substring-dedup", "skew-profile", "stratified-sample",
    # layout VACUUM (crash-artifact GC: _temporary, orphan .crc, stale
    # .delnew; interrupted swaps repaired, never deleted)
    # per-doc top-3 tf/df keyword extraction (WindowGroupLimit cut)
    # and the JSON message-encoding tier (pure-Catalyst from_json decode,
    # the fourth message grammar) proven in the driver gate; plus the
    # Deequ-style constraint-validation gate (8 rules, 3 rule classes,
    # row-local rules folded into ONE aggregate) and its O(1)-state
    # streaming twin (row-local rules as one incremental aggregate)
    # plus snapshot manifests + time-travel reads (pin the exact file set
    # a training run read; AS-OF reads plan from the manifest, staleness
    # after in-place mutation refused loudly)
    # plus the Pass-Join edit-distance dedup tier (pigeonhole segment
    # equi-join blocking, EXACT recall, candidates-only levenshtein)
    "incr-rollup", "stream-funnel", "vacuum", "doc-keywords",
    "json-roundtrip", "validate-constraints", "stream-validate",
    # plus the privacy-transform pass (peppered key pseudonymization +
    # hour generalization + k=2 QI-cell suppression, corpus never
    # shuffles) and alpha=0.5 temperature mixture rebalancing
    # (integer-exact isqrt weights, broadcast dim + map-side filter)
    # and the schema-evolution read contract (old parts NULL-fill the
    # added column; mergeSchema == pinned-schema read, gate-proven)
    # and span REMOVAL (the apply step substring-dedup scores: tokens
    # covered by corpus-duplicated 5-windows deleted map-side — tokens
    # never shuffle, only span hashes + covered-position arrays do)
    # and the distribution-drift monitor (per-type epoch shares compared
    # in integer basis points — no float shares, no libm PSI)
    "snapshot-read", "dedup-editdist", "pseudonymize",
    # with its live twin (static reference mix vs a streamed current
    # epoch, |types|-row state, batch drift's oracle verbatim)
    # plus the numeric companion (value histogram over reference-anchored
    # equal-width buckets — a shifted epoch alarms in the edge buckets)
    # and per-type volume trend (integer-exact closed-form OLS slope of
    # hourly counts — the dying-sensor / runaway-producer monitor)
    # and int8 embedding quantization (per-vector symmetric scale,
    # map-side HOF, bit-identical TINYINT codes cross-engine)
    "temperature-sample", "schema-evolution", "scrub-dup-spans",
    "drift-detect", "stream-drift", "drift-numeric", "volume-trend",
    "embed-quantize", "knn-quantized",
    "protobuf-roundtrip", "convert-resume", "analyze-table", "delete-rows",
    "stream-analyze",
    "semdedup", "stream-asof", "stream-semdedup", "export-roundtrip",
    "stream-knn", "lm-surprise", "ewma", "stream-ewma",
    # NEW round 7: point-in-time join against the SCD2 interval table;
    # small-file compaction preserving the clustered layout; the streaming
    # twin of resample-interpolate (incremental grid fill, O(1) state);
    # CDC MERGE apply (last-writer-wins upsert/delete, co-partitioned
    # full-outer) + its order-free streaming twin; partition-aware
    # compaction
    "scd2-asof", "compact-files", "stream-resample", "merge-upsert",
    "compact-partitioned", "stream-merge-upsert",
    # NEW round 7: message-drop / silence detection (bag-health QA) +
    # its live streaming twin; mergeable Misra-Gries heavy hitters;
    # nearest-neighbor (either-direction) time join
    "gap-detect", "stream-gap-detect", "heavy-hitters",
    "stream-heavy-hitters", "asof-nearest",
    # CHANGED round 7 — must re-prove: the grid explode gained the
    # empty-span guard (sequence() raises on start > stop; same rows on
    # data that never trips it, but the plan changed)
    "resample-interpolate",
    # latest driver row is r4 (36) — the oldest remaining rows
    "stream-sliding", "stream-sessionize", "stream-neardup",
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
    # proven green by the r5 driver run (50) — its head fills the rest of
    # the r7 window, the tail leads r8
    "stream-sink", "approx-stats",
    "compact-latest", "funnel", "cohort-retention", "weighted-sample",
    "lsh-recall",
    "stream-compact", "multimodal-frames",
    "json-funcs", "array-funcs",
    "dedup-containment", "dedup-normalized", "rolling-window",
    "sql-q2", "sql-q9", "sql-q11", "sql-q16", "sql-q20",
    "repetition-score", "bm25-search", "stream-dedup",
    "bucket-join", "join", "salted-join", "tokenize-chunk", "markov-chain",
    "scan", "project", "filter", "limit", "topk", "union", "topk-per-group",
    "time-split", "cast", "flatten", "decode-blob", "seqno",
    "groupby-agg", "derived", "rollup", "dim-join", "semi-join",
    "first-seen", "sql", "window-funcs", "window-tumbling",
    # proven green by the r6 driver run (50) — rotate to the back:
    # first the r6-new/changed batch...
    "stream-neardup-parity", "hll-sketch", "scd2-intervals", "stream-scd2",
    "bloom-join", "cluster-write", "zorder-write",
    "embed-neardup", "embed-recall",
    # ...then the formerly-r2 rows...
    "asof", "cube", "grouping-sets", "kmeans", "lag-lead",
    "multimodal-features", "multimodal-pointers", "window-sliding", "zscore",
    # ...then the formerly-r3 rows...
    "demux", "sink", "token-count", "lang-id", "quality-score", "fingerprint",
    "dedup-exact", "dedup-minhash-lsh", "dedup-ngram-jaccard", "dedup-simhash",
    "knn", "knn-ivf", "knn-batch",
    "stats-corr", "string-agg", "explode-sequence", "distinct-count",
    "quantiles", "sessionize",
    # ...then the r4-block head r6 re-proved
    "text-stats", "null-semantics", "sql-q12",
    "sample-hash", "split-train-test", "mix-weighted",
    "cap-per-group", "pack-sequences", "shuffle-global", "contamination",
    "corpus-filter", "stream-tumbling",
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

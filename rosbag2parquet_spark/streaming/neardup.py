"""Streaming incremental near-duplicate detection — MinHash-LSH as a
continuously-updating index (the deduplication mode a live ingestion
pipeline needs: flag each arriving document against everything seen so far).

Plan shape:
1. signatures are computed NARROWLY per arriving row (array-expression
   minhash — transform → array_min; in a stream each row is evaluated once,
   so the batch-mode re-evaluation hazard doesn't apply and the zero-shuffle
   formulation is exactly right here);
2. band/bucket explode (stateless);
3. ``applyInPandasWithState`` keyed on (band, bucket): state = doc_ids seen
   in this bucket; each arriving doc emits candidate pairs against the
   bucket's history, then joins the state. State shards by bucket key
   across executors; a production deployment adds a watermark/TTL timeout
   to bound bucket history.

Candidates are emitted unverified (the exact-Jaccard confirmation is a
stream-static join against the corpus or a downstream batch pass — kept
separate so the stateful operator stays single-purpose).
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from rosbag2parquet_spark.functions.dedup import BAND_SIZE, N_HASHES

DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

PAIRS_SCHEMA = "band int, bucket string, a_id long, b_id long"
STATE_SCHEMA = "ids array<bigint>"


def stream_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.parquet staged as a file stream (same pattern as
    streaming.windowed.stream_events)."""
    from rosbag2parquet_spark.streaming.windowed import stage_stream_file

    return spark.readStream.schema(DOCS_SCHEMA).parquet(
        stage_stream_file(sf_dir, "documents.parquet", "docstream")
    )


def band_buckets(docs: DataFrame) -> DataFrame:
    """(doc_id, band, bucket) per document — minhash signature from two md5
    slices per shingle, same hash family as the batch pipeline so streaming
    and batch candidates agree exactly.

    Expression hygiene (the repo's own README rule, violated here in round
    1): an expression captured inside an array lambda re-evaluates PER
    ELEMENT, and Catalyst collapses adjacent projections, inlining a
    non-trivial column expression into every consumer. Two explicit
    ``repartition`` barriers materialize (a) the words array before the
    shingle lambda captures it — otherwise ``split(text)`` re-runs per
    shingle, O(words²) — and (b) the two md5 arrays before the 8 substr-min
    consumers — otherwise each md5 family is recomputed 4×. The barriers
    shuffle by doc_id; both feed the stateful bucket shuffle anyway.

    (MinHash needs no ``array_distinct``: min() is duplicate-insensitive, so
    raw shingle arrays give identical signatures to the batch set-based
    formulation.)"""
    words = docs.select(
        "doc_id",
        F.split("text", " ").alias("w"),
        F.current_timestamp().alias("ingest_ts"),
    ).repartition(F.col("doc_id"))
    shingles = "transform(sequence(1, greatest(size(w) - 2, 1)), i -> concat_ws(' ', slice(w, i, 3)))"
    hashed = words.select(
        "doc_id",
        "ingest_ts",
        F.expr(f"transform({shingles}, s -> md5('0|' || s))").alias("h0"),
        F.expr(f"transform({shingles}, s -> md5('1|' || s))").alias("h1"),
    ).repartition(F.col("doc_id"))
    mh = [
        f"array_min(transform(h{k // 4}, x -> substr(x, {1 + 8 * (k % 4)}, 8)))"
        for k in range(N_HASHES)
    ]
    buckets = ", ".join(
        "concat_ws('#', " + ", ".join(mh[b * BAND_SIZE + r] for r in range(BAND_SIZE)) + ")"
        for b in range(N_HASHES // BAND_SIZE)
    )
    return hashed.select(
        "doc_id",
        "ingest_ts",
        F.posexplode(F.expr(f"array({buckets})")).alias("band", "bucket"),
    )


#: bucket history eviction horizon — a bucket that sees no new docs for this
#: long (in WATERMARK time — i.e. as later data flows) drops its doc-id
#: history, bounding state (round 1 kept every bucket forever). Event-time
#: timeout deliberately, not processing-time: processing-time timers keep
#: the micro-batch engine polling even on a drained source (hangs
#: processAllAvailable/availableNow test drivers), while event-time timers
#: only fire when arriving data advances the watermark — idle streams cost
#: nothing, and eviction scales with data flow, which is what bounds state.
STATE_TTL_MS = 30 * 60 * 1000


def _emit_pairs(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.hasTimedOut:
        state.remove()
        return
    band, bucket = key
    (seen,) = state.get if state.exists else ([],)
    seen = list(seen)
    out_a, out_b = [], []
    for pdf in batches:
        for doc_id in sorted(int(x) for x in pdf["doc_id"]):
            for prev in seen:
                lo, hi = (prev, doc_id) if prev < doc_id else (doc_id, prev)
                out_a.append(lo)
                out_b.append(hi)
            seen.append(doc_id)
    state.update((seen,))
    # evict when the watermark passes last-activity + TTL
    state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + STATE_TTL_MS)
    if out_a:
        yield pd.DataFrame(
            {"band": band, "bucket": bucket, "a_id": out_a, "b_id": out_b}
        )


def streaming_verified(docs: DataFrame, shingle_sets: DataFrame) -> DataFrame:
    """Exact-Jaccard-verified near-duplicate pairs, streaming: the candidate
    stream joined against the STATIC shingle-set table (stream-static inner
    join — stateless on the stream side, the static side is a normal batch
    relation Spark re-plans per micro-batch), Jaccard via array_intersect on
    the riding set arrays, thresholded at the batch pipeline's
    JACCARD_THRESHOLD. Same hash family + same verification arithmetic as
    batch ``q_minhash_lsh`` ⇒ the verified pair set is equal on the same
    corpus (equality-tested in tests/test_streaming_neardup.py).

    A pair agreeing on multiple bands is verified once per band — identical
    deterministic rows the consumer dedupes (a stream-side
    ``dropDuplicates`` would hold every pair key in state forever; keeping
    the operator stateless bounds memory, and the duplicate factor is
    ≤ N_HASHES/BAND_SIZE). At scale the static side is the parquet corpus;
    the per-batch join is shuffle-free when candidates are few (broadcast)
    and the set arrays are pruned to the joined ids by the id-keyed join."""
    from rosbag2parquet_spark.functions.dedup import JACCARD_THRESHOLD

    cand = streaming_candidates(docs).select("a_id", "b_id")
    ja = shingle_sets.select(F.col("doc_id").alias("a_id"), F.col("sset").alias("sa"))
    jb = shingle_sets.select(F.col("doc_id").alias("b_id"), F.col("sset").alias("sb"))
    inter = F.size(F.array_intersect("sa", "sb"))
    return (
        cand.join(ja, "a_id")
        .join(jb, "b_id")
        .select(
            "a_id",
            "b_id",
            # raw IEEE quotient of exact ints — identical to the batch
            # _verify_jaccard expression, so values match bit-for-bit
            (inter / (F.size("sa") + F.size("sb") - inter)).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    )


def streaming_candidates(docs: DataFrame) -> DataFrame:
    """Candidate near-dup pairs, incrementally, as documents arrive. Bucket
    state is evicted once the ingest-time watermark passes the bucket's last
    activity by ``STATE_TTL_MS`` — docs arriving later re-open the bucket
    fresh, the standard recall/state trade of a streaming dedup index."""
    return (
        band_buckets(docs)
        .withWatermark("ingest_ts", "0 seconds")
        .groupBy("band", "bucket")
        .applyInPandasWithState(
            _emit_pairs,
            outputStructType=PAIRS_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )

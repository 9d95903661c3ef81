"""Streaming incremental near-dup: the stateful candidate stream over the
finite fixture must produce exactly the batch MinHash-LSH candidate set
(same hash family ⇒ same buckets ⇒ same pairs)."""

import pytest
from pyspark.sql import functions as F

from rosbag2parquet_spark.functions.dedup import (
    _doc_shingle_sets,
    minhash_signatures,
    BAND_SIZE,
    N_HASHES,
)
from rosbag2parquet_spark.streaming.neardup import (
    stream_documents,
    streaming_candidates,
    streaming_verified,
)
from rosbag2parquet_spark.streaming.windowed import run_to_memory
from tests.conftest import SF_DIR


@pytest.mark.slow
def test_streaming_candidates_equal_batch(spark):
    stream = stream_documents(spark, SF_DIR)
    run_to_memory(streaming_candidates(stream), "nd_cand", mode="append")
    streamed = {
        (r.a_id, r.b_id)
        for r in spark.sql("SELECT DISTINCT a_id, b_id FROM nd_cand").collect()
    }

    sig = minhash_signatures(_doc_shingle_sets(spark, SF_DIR))
    bands = sig.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.concat_ws(
                        "#", *[F.col(f"mh{b * BAND_SIZE + r}") for r in range(BAND_SIZE)]
                    )
                    for b in range(N_HASHES // BAND_SIZE)
                ]
            )
        ).alias("band", "bucket"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    batch = {
        (r.a_id, r.b_id)
        for r in a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id"))
        .distinct()
        .collect()
    }
    assert streamed == batch
    assert len(streamed) > 0


@pytest.mark.slow
def test_streaming_verified_equals_batch(spark):
    """The stream-static exact-Jaccard join over the candidate stream must
    reproduce the batch pipeline's VERIFIED pair set exactly — ids AND
    jaccard values (same integer intersect/union operands, same single IEEE
    division ⇒ bit-equal doubles)."""
    from rosbag2parquet_spark.functions.dedup import q_minhash_lsh

    stream = stream_documents(spark, SF_DIR)
    sets = _doc_shingle_sets(spark, SF_DIR)
    run_to_memory(streaming_verified(stream, sets), "nd_verified", mode="append")
    streamed = {
        (r.a_id, r.b_id, r.jaccard)
        for r in spark.sql(
            "SELECT DISTINCT a_id, b_id, jaccard FROM nd_verified"
        ).collect()
    }
    batch = {
        (r.a_id, r.b_id, r.jaccard)
        for r in q_minhash_lsh(spark, SF_DIR).collect()
    }
    assert streamed == batch
    assert len(streamed) > 0


class _StubState:
    """Minimal GroupState stand-in for unit-testing the eviction contract."""

    def __init__(self, existing=None, timed_out=False, watermark_ms=1_000_000):
        self._val = existing
        self.hasTimedOut = timed_out
        self._wm = watermark_ms
        self.removed = False
        self.timeout_ts = None

    @property
    def exists(self):
        return self._val is not None

    @property
    def get(self):
        return self._val

    def update(self, v):
        self._val = v

    def remove(self):
        self.removed = True

    def getCurrentWatermarkMs(self):
        return self._wm

    def setTimeoutTimestamp(self, ts):
        self.timeout_ts = ts


def test_timed_out_bucket_is_evicted():
    """TTL contract: a timed-out invocation removes state and emits nothing;
    a live invocation re-arms the timer at watermark + TTL."""
    import pandas as pd

    from rosbag2parquet_spark.streaming.neardup import STATE_TTL_MS, _emit_pairs

    dead = _StubState(existing=([1, 2],), timed_out=True)
    assert list(_emit_pairs(("0", "b"), iter([]), dead)) == []
    assert dead.removed

    live = _StubState(existing=([1],), watermark_ms=5_000)
    out = list(
        _emit_pairs((0, "b"), iter([pd.DataFrame({"doc_id": [7]})]), live)
    )
    assert live.timeout_ts == 5_000 + STATE_TTL_MS
    assert not live.removed
    assert len(out) == 1 and list(out[0]["a_id"]) == [1] and list(out[0]["b_id"]) == [7]

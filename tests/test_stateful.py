"""Stateful streaming: the applyInPandasWithState running profile must, after
draining the finite fixture, converge to the batch groupBy answer — and the
grouped-map (applyInPandas) zscore must equal the window-function zscore."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from rosbag2parquet_spark.operators.olap import q_zscore
from rosbag2parquet_spark.sources.catalog import load_table
from rosbag2parquet_spark.streaming.stateful import running_user_profile
from rosbag2parquet_spark.streaming.windowed import run_to_memory, stream_events
from tests.conftest import SF_DIR


@pytest.mark.slow
def test_stateful_profile_converges_to_batch(spark):
    ev = stream_events(spark, SF_DIR).select(
        "user_id", F.unix_micros("ts").alias("ts_us"), "value"
    )
    out = running_user_profile(ev)
    run_to_memory(out, "profiles", mode="update")
    # last update per user == batch aggregate
    final = spark.sql(
        """
        SELECT user_id, max_by(n_events, n_events) AS n_events,
               round(max_by(total_value, n_events), 4) AS total_value
        FROM profiles GROUP BY user_id
        """
    )
    batch = (
        load_table(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
    )
    assert final.exceptAll(batch).count() == 0 and batch.exceptAll(final).count() == 0


def test_grouped_map_zscore_equals_window(spark):
    """applyInPandas grouped transform == the Tungsten window formulation
    (documents that the slow path is semantically interchangeable)."""
    ev = load_table(spark, SF_DIR, "events")

    def zscore_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
        std = pdf["value"].std(ddof=1)
        return pd.DataFrame(
            {
                "event_id": pdf["event_id"],
                "event_type": pdf["event_type"],
                "zscore": ((pdf["value"] - pdf["value"].mean()) / std).round(6),
            }
        )

    via_pandas = ev.groupBy("event_type").applyInPandas(
        zscore_pdf, schema="event_id long, event_type string, zscore double"
    )
    # q_zscore emits the raw decimal-exact-moment quotient (cross-engine
    # determinism); pandas computes float moments — compare at 6 dp
    via_window = q_zscore(spark, SF_DIR).withColumn(
        "zscore", F.round("zscore", 6)
    )
    assert via_pandas.exceptAll(via_window).count() == 0
    assert via_window.exceptAll(via_pandas).count() == 0


@pytest.mark.slow
def test_stream_compact_out_of_order_batches(spark, tmp_path):
    """Compaction's reducer is an argmax over (ts, event_id) — commutative,
    so a micro-batch carrying EARLIER events than an already-processed one
    must not regress the state (the property funnel-style ordered operators
    don't have, and the reason compaction is stream-safe unordered)."""
    import os
    import time as _time

    import pandas as pd

    from rosbag2parquet_spark.streaming.stateful import running_compaction

    land = tmp_path / "land"
    land.mkdir()
    # file A: LATE events; file B: earlier events + a ts-tie (id 12 vs 11)
    a = pd.DataFrame(
        {"user_id": [1, 2], "ts_us": [5_000_000, 6_000_000],
         "event_id": [10, 11], "event_type": ["purchase", "view"],
         "value": [9.0, 1.0]}
    )
    b = pd.DataFrame(
        {"user_id": [1, 2, 2], "ts_us": [1_000_000, 2_000_000, 6_000_000],
         "event_id": [1, 2, 12], "event_type": ["view", "click", "error"],
         "value": [2.0, 3.0, 4.0]}
    )
    a.to_parquet(land / "a.parquet")
    b.to_parquet(land / "b.parquet")
    now = _time.time()
    os.utime(land / "a.parquet", (now - 60, now - 60))  # A arrives FIRST
    os.utime(land / "b.parquet", (now, now))

    stream = (
        spark.readStream.schema(
            "user_id long, ts_us long, event_id long, "
            "event_type string, value double"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(land))
    )
    from rosbag2parquet_spark.streaming.windowed import run_to_memory

    run_to_memory(running_compaction(stream), "compact_ooo", mode="update")
    final = {
        r.user_id: (r.last_ts_us, r.last_type, r.last_event_id)
        for r in spark.sql(
            """
            SELECT user_id,
                   max_by(last_ts_us, (last_ts_us, last_event_id)) AS last_ts_us,
                   max_by(last_type, (last_ts_us, last_event_id)) AS last_type,
                   max_by(last_event_id, (last_ts_us, last_event_id)) AS last_event_id
            FROM compact_ooo GROUP BY user_id
            """
        ).collect()
    }
    # user 1: the late purchase (id 10) wins over the earlier view (id 1)
    assert final[1] == (5_000_000, "purchase", 10)
    # user 2: ts tie between id 11 and id 12 — higher event_id wins
    assert final[2] == (6_000_000, "error", 12)


def test_stream_scd2_shuffled_within_batch(spark, tmp_path):
    """SCD2's per-invocation sort makes intra-batch arrival order
    irrelevant: a micro-batch with rows SHUFFLED must yield exactly the
    batch interval table. (Cross-batch order is the documented CDC
    per-key in-order contract.)"""
    import pandas as pd

    from rosbag2parquet_spark.streaming.stateful import running_scd2
    from rosbag2parquet_spark.streaming.windowed import run_to_memory

    land = tmp_path / "land_scd2"
    land.mkdir()
    rows = [
        # user 1: view(1) view(2) click(3) view(4) — 3 intervals
        (1, 1_000_000, 1, "view"),
        (1, 2_000_000, 2, "view"),
        (1, 3_000_000, 3, "click"),
        (1, 4_000_000, 4, "view"),
        # user 2: single interval
        (2, 1_500_000, 5, "purchase"),
    ]
    import random

    rng = random.Random(7)
    shuffled = rows[:]
    rng.shuffle(shuffled)
    pd.DataFrame(
        shuffled, columns=["user_id", "ts_us", "event_id", "event_type"]
    ).to_parquet(land / "a.parquet")
    stream = (
        spark.readStream.schema(
            "user_id long, ts_us long, event_id long, event_type string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(land))
    )
    run_to_memory(running_scd2(stream), "scd2_shuf", mode="append")
    got = {
        (r.user_id, r.state, r.valid_from, r.valid_to, r.version)
        for r in spark.sql(
            """
            SELECT user_id, state, valid_from, max(valid_to) AS valid_to,
                   version
            FROM scd2_shuf GROUP BY user_id, version, state, valid_from
            """
        ).collect()
    }
    assert got == {
        (1, "view", 1_000_000, 3_000_000, 1),
        (1, "click", 3_000_000, 4_000_000, 2),
        (1, "view", 4_000_000, -1, 3),
        (2, "purchase", 1_500_000, -1, 1),
    }


def test_stream_resample_ties_and_on_grid(spark, tmp_path):
    """The incremental grid fill honors the batch tie rule: an on-grid
    event's grid point stays PENDING until a strictly later event proves
    no same-instant override follows (and then reads the LAST event at
    that instant); interior points interpolate between the bracketing
    pair with the batch's exact arithmetic. Two micro-batches prove state
    carries across triggers."""
    import pandas as pd

    from rosbag2parquet_spark.streaming.stateful import (
        _HOUR_US as H,
        running_resample,
    )
    from rosbag2parquet_spark.streaming.windowed import run_to_memory

    land = tmp_path / "land_resample"
    land.mkdir()
    # entity 'a': event exactly ON hour 1 (two events at the same instant,
    # later event_id must win), then 2.5 hours later — grid points at
    # 1H (pending→flushed), 2H, 3H (interior interpolations)
    batch1 = [
        ("a", 1 * H, 1, 10.0),
        ("a", 1 * H, 2, 20.0),   # same instant, larger id: overrides
    ]
    batch2 = [
        ("a", 3 * H + H // 2, 3, 90.0),
    ]
    cols = ["event_type", "ts_us", "event_id", "value"]
    pd.DataFrame(batch1, columns=cols).to_parquet(land / "a.parquet")
    pd.DataFrame(batch2, columns=cols).to_parquet(land / "b.parquet")
    stream = (
        spark.readStream.schema(
            "event_type string, ts_us long, event_id long, value double"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(land))
    )
    run_to_memory(running_resample(stream), "resample_shuf", mode="append")
    got = {
        (r.event_type, r.grid_us, r.locf, r.interp)
        for r in spark.table("resample_shuf").collect()
    }
    prev_t, prev_v, nxt_t, nxt_v = 1 * H, 20.0, 3 * H + H // 2, 90.0

    def interp(g):
        return prev_v + (nxt_v - prev_v) * ((g - prev_t) / (nxt_t - prev_t))

    assert got == {
        ("a", 1 * H, 20.0, 20.0),            # on-grid: LAST event at t wins
        ("a", 2 * H, 20.0, interp(2 * H)),
        ("a", 3 * H, 20.0, interp(3 * H)),
    }


def test_stream_merge_upsert_out_of_order_batches(spark, tmp_path):
    """The merge state is two commutative argmaxes, so micro-batches may
    arrive in ANY order: replaying them reversed AND shuffled must
    converge to the same merged table — including the delete tombstone
    (last post-cutoff event is 'error') and the base-only user."""
    import pandas as pd

    from rosbag2parquet_spark.streaming.stateful import running_merge_upsert
    from rosbag2parquet_spark.streaming.windowed import run_to_memory

    CUT = 1_000_000
    rows = [
        # user 1: base then change → change wins
        (1, CUT - 50, 1, "view", 10.0),
        (1, CUT + 10, 2, "click", 20.0),
        # user 2: last change is the tombstone → deleted
        (2, CUT - 40, 3, "view", 1.0),
        (2, CUT + 30, 4, "error", 0.0),
        (2, CUT + 20, 5, "click", 2.0),
        # user 3: base only
        (3, CUT - 5, 6, "purchase", 7.0),
    ]
    cols = ["user_id", "ts_us", "event_id", "event_type", "value"]
    land = tmp_path / "land_merge"
    land.mkdir()
    # reversed order, split across two files (micro-batches)
    rev = list(reversed(rows))
    pd.DataFrame(rev[:3], columns=cols).to_parquet(land / "a.parquet")
    pd.DataFrame(rev[3:], columns=cols).to_parquet(land / "b.parquet")
    stream = (
        spark.readStream.schema(
            "user_id long, ts_us long, event_id long, event_type string, "
            "value double"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(land))
    )
    run_to_memory(running_merge_upsert(stream, CUT), "merge_shuf", mode="update")
    final = spark.sql(
        """
        SELECT user_id, value, last_t, src, deleted FROM (
          SELECT *, row_number() OVER (PARTITION BY user_id
                                       ORDER BY last_t DESC) AS rn
          FROM merge_shuf
        ) WHERE rn = 1
        """
    ).collect()
    got = {(r.user_id, r.value, r.last_t, r.src, r.deleted) for r in final}
    assert got == {
        (1, 20.0, CUT + 10, "change", 0),
        (2, 0.0, CUT + 30, "change", 1),   # tombstoned — consumer drops it
        (3, 7.0, CUT - 5, "base", 0),
    }


def test_stream_asof_across_batches(spark, tmp_path):
    """The carried-quote state survives micro-batch boundaries: quotes in
    batch 1 serve probes in batch 2, a newer quote overwrites, and a probe
    before any quote emits NULLs. Same-instant quote+probe resolves quote
    first (`<=` inclusivity), same-instant quotes resolve to max okey (the
    batch max_by pre-dedup). Rows within each batch are shuffled — the
    per-invocation (t, side, okey) sort makes intra-batch order moot."""
    import random

    import pandas as pd

    from rosbag2parquet_spark.streaming.stateful import running_asof
    from rosbag2parquet_spark.streaming.windowed import run_to_memory

    cols = ["user_id", "t_us", "side", "event_id", "okey", "price"]
    b1 = [
        # user 1: probe@5 before any quote -> NULLs; quotes @10 (two,
        # okey 7 wins) serve probe@10 (same instant, quote-first)
        (1, 5, 1, 100, -1, 0.0),
        (1, 10, 0, -1, 3, 30.0),
        (1, 10, 0, -1, 7, 70.0),
        (1, 10, 1, 101, -1, 0.0),
        # user 2: quote@8 only
        (2, 8, 0, -1, 9, 90.0),
    ]
    b2 = [
        # user 1: probe@20 reads the batch-1 quote; quote@25 then probe@30
        (1, 20, 1, 102, -1, 0.0),
        (1, 25, 0, -1, 11, 110.0),
        (1, 30, 1, 103, -1, 0.0),
        # user 2: probe@9 reads the batch-1 quote from state
        (2, 9, 1, 104, -1, 0.0),
    ]
    rng = random.Random(13)
    land = tmp_path / "land_asof"
    land.mkdir()
    for name, rows in (("a", b1), ("b", b2)):
        rows = rows[:]
        rng.shuffle(rows)
        pdf = pd.DataFrame(rows, columns=cols)
        pdf["side"] = pdf["side"].astype("int32")
        pdf.to_parquet(land / f"{name}.parquet")
    stream = (
        spark.readStream.schema(
            "user_id long, t_us long, side int, event_id long, "
            "okey long, price double"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(land))
    )
    run_to_memory(running_asof(stream), "asof_xbatch", mode="append")
    got = {
        (r.event_id, r.user_id, r.ts_us, r.last_orderkey, r.last_order_price)
        for r in spark.table("asof_xbatch").collect()
    }
    assert got == {
        (100, 1, 5, None, None),
        (101, 1, 10, 7, 70.0),
        (102, 1, 20, 7, 70.0),
        (103, 1, 30, 11, 110.0),
        (104, 2, 9, 9, 90.0),
    }


def test_stream_semdedup_across_batches(spark, tmp_path):
    """The per-cluster seen-document index survives micro-batch
    boundaries: a batch-2 document is dropped against a batch-1 near-dup
    (kept OR dropped — the batch 'exists smaller id' rule), and distinct
    clusters never interact."""
    import numpy as np
    import pandas as pd

    from rosbag2parquet_spark.functions.kmeans import SEMDEDUP_TAU
    from rosbag2parquet_spark.streaming.stateful import running_semdedup
    from rosbag2parquet_spark.streaming.windowed import run_to_memory

    dim = 64
    base = np.zeros(dim); base[0] = 1.0
    near = np.zeros(dim); near[0] = 1.0; near[1] = 0.05   # cos ~0.999
    far = np.zeros(dim); far[1] = 1.0                     # cos 0
    other = np.zeros(dim); other[2] = 1.0

    land = tmp_path / "land_sd"
    land.mkdir()
    b1 = pd.DataFrame(
        {
            "vec_id": pd.array([10, 11], dtype="Int64"),
            "e": [list(base), list(far)],
            "cluster": pd.array([0, 0], dtype="Int32"),
        }
    )
    b2 = pd.DataFrame(
        {
            # 20 dups batch-1's base (cross-batch state); 21 is far's twin
            # in ANOTHER cluster — must survive (clusters are disjoint)
            "vec_id": pd.array([20, 21], dtype="Int64"),
            "e": [list(near), list(far)],
            "cluster": pd.array([0, 1], dtype="Int32"),
        }
    )
    b1.to_parquet(land / "a.parquet")
    b2.to_parquet(land / "b.parquet")
    stream = (
        spark.readStream.schema(
            "vec_id long, e array<double>, cluster int"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(land))
    )
    run_to_memory(running_semdedup(stream), "sd_xbatch", mode="append")
    got = {
        (r.vec_id, r.cluster)
        for r in spark.table("sd_xbatch").collect()
    }
    assert got == {(10, 0), (11, 0), (21, 1)}


def test_stream_topk_out_of_order_batches(spark, tmp_path):
    """Top-k maintenance is commutative: micro-batches arriving in any
    order converge to the same top-k, ties break by vec_id (the batch
    rule), and the finishing rule (max seen-counter) picks the final
    emission."""
    import pandas as pd

    from rosbag2parquet_spark.streaming.stateful import running_topk
    from rosbag2parquet_spark.streaming.windowed import run_to_memory

    land = tmp_path / "land_topk"
    land.mkdir()
    # query 1: high scores arrive FIRST, then lower ones; query 2: reverse.
    # tie at 0.5 between vec 30 and vec 20 -> vec 20 (smaller id) ranks
    # first
    b1 = [(1, 10, 0.9), (1, 30, 0.5), (2, 10, 0.1)]
    b2 = [(1, 20, 0.5), (1, 40, 0.95), (2, 20, 0.8)]
    for name, rows in (("a", b1), ("b", b2)):
        pd.DataFrame(
            rows, columns=["query_id", "vec_id", "cos_sim"]
        ).to_parquet(land / f"{name}.parquet")
    stream = (
        spark.readStream.schema(
            "query_id long, vec_id long, cos_sim double"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(land))
    )
    run_to_memory(running_topk(stream, 3), "topk_ooo", mode="append")
    t = spark.table("topk_ooo")
    final = {
        (r.query_id, r.rk): (r.vec_id, r.cos_sim)
        for r in spark.sql(
            """
            SELECT query_id, rk, vec_id, cos_sim FROM (
              SELECT *, max(n) OVER (PARTITION BY query_id) AS mx
              FROM topk_ooo
            ) WHERE n = mx
            """
        ).collect()
    }
    assert final == {
        (1, 1): (40, 0.95),
        (1, 2): (10, 0.9),
        (1, 3): (20, 0.5),  # tie with vec 30: smaller id wins rank 3
        (2, 1): (20, 0.8),
        (2, 2): (10, 0.1),
    }


def test_stream_ewma_across_batches(spark, tmp_path):
    """The smoothed value carries across micro-batch boundaries with the
    exact batch fixed-point arithmetic: y1 = x1; y2 = (x2 + 3*y1) >> 2."""
    import pandas as pd

    from rosbag2parquet_spark.streaming.stateful import running_ewma
    from rosbag2parquet_spark.streaming.windowed import run_to_memory

    land = tmp_path / "land_ewma"
    land.mkdir()
    pd.DataFrame(
        [(1, 10, 100, 1000)], columns=["user_id", "t", "eid", "x"]
    ).to_parquet(land / "a.parquet")
    pd.DataFrame(
        [(1, 20, 101, 2000), (1, 30, 102, 0)],
        columns=["user_id", "t", "eid", "x"],
    ).to_parquet(land / "b.parquet")
    stream = (
        spark.readStream.schema("user_id long, t long, eid long, x long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(land))
    )
    run_to_memory(running_ewma(stream), "ewma_xbatch", mode="append")
    got = {
        (r.user_id, r.rn): r.y for r in spark.table("ewma_xbatch").collect()
    }
    y1 = 1000
    y2 = (2000 + 3 * y1) >> 2   # 1250
    y3 = (0 + 3 * y2) >> 2      # 937
    assert got == {(1, 1): y1, (1, 2): y2, (1, 3): y3}


def test_stream_ewma_null_propagates_like_batch(spark, tmp_path):
    """A NULL input value must flow through the recursion as NULL (the
    batch fold and the recursive-CTE oracle both go NULL from that row
    on), not crash the worker — and the state must survive the None so a
    later micro-batch keeps emitting NULLs."""
    import pandas as pd

    from rosbag2parquet_spark.streaming.stateful import running_ewma
    from rosbag2parquet_spark.streaming.windowed import run_to_memory

    land = tmp_path / "land_ewma_null"
    land.mkdir()
    pd.DataFrame(
        {
            "user_id": [1, 1],
            "t": [10, 20],
            "eid": [100, 101],
            "x": pd.array([1000, None], dtype="Int64"),
        }
    ).to_parquet(land / "a.parquet")
    pd.DataFrame(
        {
            "user_id": [1],
            "t": [30],
            "eid": [102],
            "x": pd.array([4000], dtype="Int64"),
        }
    ).to_parquet(land / "b.parquet")
    stream = (
        spark.readStream.schema("user_id long, t long, eid long, x long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(land))
    )
    run_to_memory(running_ewma(stream), "ewma_null", mode="append")
    got = {
        (r.user_id, r.rn): r.y for r in spark.table("ewma_null").collect()
    }
    # y1 = 1000; y2 = NULL (x NULL); y3 = NULL (prior y NULL) — matches
    # the batch fold, where element_at(acc,-1)=NULL poisons every step
    assert got == {(1, 1): 1000, (1, 2): None, (1, 3): None}


def test_stream_funnel_across_batches(spark, tmp_path):
    """Ordered-stage state survives micro-batch boundaries, and the strict
    '>' stage gates match the batch funnel: a click at the SAME instant as
    the first view does not advance (ts > t1 strict); a click arriving
    before any view never counts; a purchase gated on the click set in an
    EARLIER batch completes the funnel; stage flags are monotone so the
    max-per-user reduction is the final position."""
    import pandas as pd

    from rosbag2parquet_spark.streaming.stateful import running_funnel
    from rosbag2parquet_spark.streaming.windowed import run_to_memory

    cols = ["user_id", "ts_us", "event_id", "event_type"]
    b1 = [
        (1, 10, 1, "view"),
        (1, 10, 2, "click"),      # same instant as t1 -> NOT eligible
        (2, 5, 3, "click"),       # click before any view -> never counts
        (2, 8, 4, "view"),
        (3, 7, 5, "purchase"),    # purchase with no funnel prefix
    ]
    b2 = [
        (1, 20, 6, "click"),      # opens stage 2 at 20
        (1, 20, 7, "purchase"),   # same instant as t2 -> NOT eligible
        (2, 12, 8, "click"),
        (2, 15, 9, "purchase"),   # full funnel for user 2
    ]
    land = tmp_path / "land_funnel"
    land.mkdir()
    pd.DataFrame(b1, columns=cols).to_parquet(land / "a.parquet")
    pd.DataFrame(b2, columns=cols).to_parquet(land / "b.parquet")
    stream = (
        spark.readStream.schema(
            "user_id long, ts_us long, event_id long, event_type string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(land))
    )
    run_to_memory(running_funnel(stream), "funnel_xbatch", mode="update")
    import pyspark.sql.functions as F

    final = {
        r.user_id: (r.s1, r.s2, r.s3)
        for r in spark.table("funnel_xbatch")
        .groupBy("user_id")
        .agg(F.max("s1").alias("s1"), F.max("s2").alias("s2"),
             F.max("s3").alias("s3"))
        .collect()
    }
    assert final == {1: (1, 1, 0), 2: (1, 1, 1), 3: (0, 0, 0)}


def test_stream_validate_cross_batch(spark, tmp_path):
    """The quality monitor's counters accumulate correctly ACROSS
    micro-batches (complete-mode global agg): rule expressions — NULL
    predicate inputs never violating, a row violating TWO rules counting
    once per rule — hold over the merged state, not just within a file."""
    import os
    import time as _time

    import pandas as pd

    from rosbag2parquet_spark.streaming.queries import (
        validate_rules_agg,
        validate_verdicts,
    )
    from rosbag2parquet_spark.streaming.windowed import run_to_memory

    cols = ["event_id", "user_id", "event_type", "value"]
    a = pd.DataFrame(
        [
            (None, 1, "view", 10.0),    # completeness violation
            (2, 1, "click", 150.0),     # range violation
            (3, 2, "purchase", 50.0),   # clean
        ],
        columns=cols,
    )
    b = pd.DataFrame(
        [
            (4, 2, "error", 10.0),      # set violation
            (5, 3, "view", -1.0),       # range AND sign violation
            (6, 3, "signup", None),     # NULL value: no rule fires
            (7, 1, "view", 0.5),        # clean
        ],
        columns=cols,
    )
    # nullable dtypes: plain pandas would coerce the None-bearing int
    # column to float64 (schema mismatch) and the None double to NaN
    # (which is NOT NULL — NaN fails `between`, NULL skips the rule)
    for df in (a, b):
        df["event_id"] = df["event_id"].astype("Int64")
        df["value"] = df["value"].astype("Float64")
    land = tmp_path / "land_validate"
    land.mkdir()
    a.to_parquet(land / "a.parquet")
    b.to_parquet(land / "b.parquet")
    now = _time.time()
    os.utime(land / "a.parquet", (now - 60, now - 60))
    os.utime(land / "b.parquet", (now, now))

    stream = (
        spark.readStream.schema(
            "event_id long, user_id long, event_type string, value double"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(land))
    )
    run_to_memory(validate_rules_agg(stream), "validate_xbatch", mode="complete")
    out = {
        r["rule"]: (r["checked"], r["violations"], r["ok"])
        for r in validate_verdicts(spark.table("validate_xbatch")).collect()
    }
    assert out["completeness:event_id"] == (7, 1, False)
    assert out["range:value:[0,100]"] == (7, 2, False)   # 150.0 and -1.0
    assert out["set:event_type:known4"] == (7, 1, False)
    assert out["positive:value"] == (7, 1, False)        # only -1.0


def test_numeric_drift_literal_bucket_equals_broadcast_form(spark):
    """stream-numeric-drift rebuilds the bucket expression from DRIVER
    scalars via repr-literals while batch drift-numeric broadcasts the
    same scalars as columns — repr round-trips the exact double, so the
    two formulations must bucket EVERY row identically (including the
    clamp edges and values outside the reference range)."""
    from pyspark.sql import functions as F

    vals = [0.0, 1e-9, 0.3333333333333333, 7.125, 99.99999999999999,
            100.0, -5.0, 150.0, 33.333333333333336]
    v_lo, v_hi = 0.0, 99.99999999999999
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    broadcast_form = (
        df.withColumn("v_lo", F.lit(v_lo))
        .withColumn("v_hi", F.lit(v_hi))
        .selectExpr(
            "v",
            "CAST(coalesce(greatest(0, least(9,"
            " floor((v - v_lo) * 10 / nullif(v_hi - v_lo, 0.0d)))),"
            " 0) AS BIGINT) AS b",
        )
    )
    literal_form = df.selectExpr(
        "v",
        f"CAST(coalesce(greatest(0, least(9,"
        f" floor((v - {v_lo!r}D) * 10"
        f" / nullif({v_hi!r}D - {v_lo!r}D, 0.0d)))), 0) AS BIGINT) AS b",
    )
    a = {r.v: r.b for r in broadcast_form.collect()}
    b = {r.v: r.b for r in literal_form.collect()}
    assert a == b
    assert a[-5.0] == 0 and a[150.0] == 9  # clamped alarms

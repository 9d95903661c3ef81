"""Semantics pins for the event-behavior suite on SYNTHETIC input — the
oracle parity proves Spark == DuckDB; these prove both compute the RIGHT
thing (strict funnel ordering, compaction tie-breaks, cohort offsets)."""

import datetime

from pyspark.sql import functions as F

from rosbag2parquet_spark.operators.behavior import (
    funnel_counts,
    latest_per_key,
)


def _ts(h, m=0):
    return datetime.datetime(2024, 1, 1, h, m)


def _events(spark, rows):
    return spark.createDataFrame(
        [(i, ts, uid, et, 1.0) for i, (uid, ts, et) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )


def test_funnel_requires_strict_order(spark):
    rows = [
        # user 1: full funnel in order
        (1, _ts(1), "view"), (1, _ts(2), "click"), (1, _ts(3), "purchase"),
        # user 2: purchase BEFORE the click — completes only 2 stages
        (2, _ts(1), "view"), (2, _ts(3), "click"), (2, _ts(2), "purchase"),
        # user 3: click before the first view — never enters stage 2
        (3, _ts(2), "view"), (3, _ts(1), "click"),
        # user 4: view only
        (4, _ts(1), "view"),
        # user 5: no view at all — not in the funnel
        (5, _ts(1), "click"), (5, _ts(2), "purchase"),
    ]
    got = funnel_counts(_events(spark, rows)).collect()[0]
    assert (got.n_view, got.n_view_click, got.n_full_funnel) == (4, 2, 1)


def test_funnel_click_must_follow_the_first_view(spark):
    # second view doesn't reset the clock: click at t2 follows FIRST view t1
    rows = [
        (1, _ts(1), "view"), (1, _ts(2), "click"),
        (1, _ts(5), "view"), (1, _ts(6), "purchase"),
    ]
    got = funnel_counts(_events(spark, rows)).collect()[0]
    assert (got.n_view, got.n_view_click, got.n_full_funnel) == (1, 1, 1)


def test_latest_per_key_tie_break(spark):
    # two events at the SAME ts: the higher event_id wins deterministically
    df = _events(
        spark,
        [(1, _ts(1), "view"), (1, _ts(2), "click"), (1, _ts(2), "error")],
    )
    # rows list order: event_id 0,1,2; ids 1 and 2 share ts(2)
    got = latest_per_key(df, ["user_id"], ["ts", "event_id"]).collect()
    assert len(got) == 1
    assert got[0].event_id == 2 and got[0].event_type == "error"


def test_latest_per_key_plans_window_group_limit(spark):
    df = _events(spark, [(1, _ts(1), "view"), (2, _ts(2), "click")])
    plan = (
        latest_per_key(df, ["user_id"], ["ts", "event_id"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan  # top-1 filtered map-side pre-shuffle


def test_cohort_offsets(spark):
    from rosbag2parquet_spark.operators.behavior import _WEEK_US

    # user 1 first seen week W, active W and W+2; user 2 first seen W+2
    base = datetime.datetime(2024, 1, 1)
    wk = datetime.timedelta(microseconds=_WEEK_US)
    rows = [
        (10, base, 1, "view", 1.0),
        (11, base + 2 * wk, 1, "view", 1.0),
        (12, base + 2 * wk, 2, "view", 1.0),
    ]
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    wkcol = F.expr(f"unix_micros(ts) div {_WEEK_US}")
    wkdf = events.select("user_id", wkcol.alias("week"))
    first = wkdf.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    act = wkdf.distinct()
    out = (
        act.join(first, "user_id")
        .groupBy("cohort_week", (F.col("week") - F.col("cohort_week")).alias("week_offset"))
        .agg(F.count(F.lit(1)).alias("n_users"))
        .collect()
    )
    offs = {(r.week_offset, r.n_users) for r in out}
    # user 1 contributes offsets 0 and 2; user 2 contributes offset 0 in a
    # LATER cohort — two (offset 0, n=1) rows across distinct cohorts
    assert sorted(r.week_offset for r in out) == [0, 0, 2]
    assert all(r.n_users == 1 for r in out)
    assert len({r.cohort_week for r in out if r.week_offset == 0}) == 2


def test_funnel_plans_one_event_shuffle(spark):
    """The three layered stage windows share ONE hashpartitioning exchange
    of the event stream; only the final scalar reduce adds a
    SinglePartition (per-user partials, not events)."""
    import re

    from rosbag2parquet_spark.operators.behavior import q_funnel
    from tests.conftest import SF_DIR

    plan = (
        q_funnel(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    )
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1
    assert plan.count("Exchange SinglePartition") == 1


def test_weighted_sample_plans_top_k(spark):
    """K smallest priorities via TakeOrderedAndProject — per-task top-K,
    no global sort, no exchange at all."""
    from rosbag2parquet_spark.functions.sampling import q_weighted_sample
    from tests.conftest import SF_DIR

    plan = (
        q_weighted_sample(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan


def test_snapshot_diff_null_safe_and_change_classes(spark):
    """snapshot_diff semantics the events-derived oracle can't exercise:
    NULL payloads on both sides are 'unchanged' (dropped), NULL-vs-value
    is an 'update' (eqNullSafe, not =), and presence is keyed off the
    sentinel column so an all-NULL payload row still diffs correctly."""
    from rosbag2parquet_spark.operators.behavior import snapshot_diff

    old = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, 5.0), (4, 7.0)], "k long, v double"
    )
    new = spark.createDataFrame(
        [(2, None), (3, None), (4, 8.0), (5, 1.0)], "k long, v double"
    )
    got = {
        r.k: (r.change, r.old_v, r.new_v)
        for r in snapshot_diff(old, new, "k", ["v"]).collect()
    }
    assert got == {
        1: ("delete", 10.0, None),
        3: ("update", 5.0, None),
        4: ("update", 7.0, 8.0),
        5: ("insert", None, 1.0),
    }  # k=2 (NULL == NULL) is unchanged and absent

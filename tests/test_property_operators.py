"""Property-based validation of the hand-built distributed operators:
the as-of join (union + carry-forward window) against pandas merge_asof,
and the banded range self-join against the naive O(n²) definition — on
randomized inputs, where hand-rolled plans usually break (ties, empty
groups, boundary values)."""

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def sparks(spark):
    return spark


_probe_rows = st.lists(
    st.tuples(
        st.integers(0, 3),      # key
        st.integers(0, 50),     # time
    ),
    min_size=1,
    max_size=25,
)
_quote_rows = st.lists(
    st.tuples(
        st.integers(0, 3),
        st.integers(0, 50),
        st.floats(-100, 100, allow_nan=False),
    ),
    min_size=0,
    max_size=25,
)


@given(probes=_probe_rows, quotes=_quote_rows)
@settings(max_examples=12, deadline=None)
def test_asof_join_matches_merge_asof_random(sparks, probes, quotes):
    """Random keys/times incl. exact ties and keys with no quotes. Quote
    (key, t) pairs are deduped (max v wins) because as-of under ties is
    ill-defined — both sides dedup identically."""
    from rosbag2parquet_spark.operators.asof import asof_join

    spark = sparks
    probes = [(k, t, i) for i, (k, t) in enumerate(probes)]
    pdf_p = pd.DataFrame(probes, columns=["key", "t", "pid"])
    pdf_q = pd.DataFrame(quotes, columns=["key", "t", "v"])
    if len(pdf_q):
        pdf_q = pdf_q.groupby(["key", "t"], as_index=False)["v"].max()

    sp = spark.createDataFrame(pdf_p)
    sq = (
        spark.createDataFrame(pdf_q)
        if len(pdf_q)
        else spark.createDataFrame([], "key bigint, t bigint, v double")
    )
    got = (
        asof_join(sp, sq, "key", "key", "t", "t", ["v"])
        .orderBy("pid")
        .toPandas()["asof_v"]
        .tolist()
    )

    if len(pdf_q):
        expected = pd.merge_asof(
            pdf_p.sort_values("t", kind="stable"),
            pdf_q.sort_values("t", kind="stable"),
            on="t",
            by="key",
            direction="backward",
        ).sort_values("pid")["v"].tolist()
    else:
        expected = [None] * len(pdf_p)

    assert len(got) == len(expected)
    for g, e in zip(got, expected):
        # toPandas renders NULL doubles as NaN — normalize both sides
        g_null = g is None or (isinstance(g, float) and pd.isna(g))
        e_null = e is None or (isinstance(e, float) and pd.isna(e))
        if e_null:
            assert g_null
        else:
            assert g == pytest.approx(e)


_events = st.lists(
    st.tuples(
        st.integers(0, 2),          # user
        st.integers(0, 300),        # time (seconds)
    ),
    min_size=0,
    max_size=30,
)


@given(events=_events)
@settings(max_examples=12, deadline=None)
def test_banded_range_join_matches_naive_random(sparks, events):
    """The banded (bucket + neighbor-bucket) range self-join must equal the
    naive all-pairs definition for every random input — including events on
    exact band boundaries and duplicate timestamps."""
    spark = sparks
    rows = [(i, u, t * 1_000_000) for i, (u, t) in enumerate(events)]
    df = spark.createDataFrame(
        rows or [(0, 0, 0)], "event_id long, user_id long, us long"
    )
    if not rows:
        df = df.limit(0)
    window_us = 60_000_000

    base = df.withColumn("band", F.expr("us div 60000000"))
    left = base.select(
        "event_id", "user_id", "us",
        F.explode(F.array(F.col("band"), F.col("band") + 1)).alias("jband"),
    )
    right = base.select(
        F.col("event_id").alias("b_id"), F.col("user_id").alias("b_user"),
        F.col("us").alias("b_us"), F.col("band").alias("jband"),
    )
    banded = {
        (r.event_id, r.b_id)
        for r in left.join(right, ["jband"])
        .filter(
            (F.col("user_id") == F.col("b_user"))
            & (F.col("event_id") < F.col("b_id"))
            & (F.col("b_us") - F.col("us") >= 0)
            & (F.col("b_us") - F.col("us") <= window_us)
        )
        .select("event_id", "b_id")
        .distinct()
        .collect()
    }

    naive = {
        (a_id, b_id)
        for a_id, a_u, a_us in rows
        for b_id, b_u, b_us in rows
        if a_u == b_u and a_id < b_id and 0 <= b_us - a_us <= window_us
    }
    assert banded == naive


def test_running_sum_scalable_equals_global_window(spark):
    """Property: the bucketed two-pass running sum equals the global-window
    formulation for arbitrary bucket widths (including widths that split
    every row and widths that put everything in one bucket)."""
    from decimal import Decimal

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from rosbag2parquet_spark.operators.relational import running_sum_scalable

    rows = [(i, Decimal(str(round((i * 37 % 101) / 7.0, 4)))) for i in range(1, 200)]
    df = spark.createDataFrame(rows, "k long, v decimal(18,4)")
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    expected = {
        r["k"]: r["run"]
        for r in df.withColumn("run", F.sum("v").over(w)).collect()
    }
    for width in (1, 7, 50, 1000):
        got = {
            r["k"]: r["__running"]
            for r in running_sum_scalable(df, "k", F.col("v"), width).collect()
        }
        assert got == expected, f"width={width}"


def test_running_sum_scalable_null_buckets_and_empty_input(spark):
    """Edge cases: a bucket whose values are ALL NULL must contribute 0 to
    the prefix sum (not crash the driver-side accumulation), an all-NULL
    input must not crash, and an empty input must produce an empty result
    with a correctly-typed offset literal."""
    from decimal import Decimal

    from pyspark.sql import functions as F

    from rosbag2parquet_spark.operators.relational import running_sum_scalable

    # bucket 0 (k=1,2) all-NULL; bucket 1 (k=10,11) has values
    rows = [(1, None), (2, None), (10, Decimal("1.5")), (11, Decimal("2.5"))]
    df = spark.createDataFrame(rows, "k long, v decimal(18,4)")
    got = {
        r["k"]: r["__running"]
        for r in running_sum_scalable(df, "k", F.col("v"), 10).collect()
    }
    assert got[10] == Decimal("1.5") and got[11] == Decimal("4.0")
    assert got[1] is None and got[2] is None  # window sum over NULLs is NULL

    all_null = spark.createDataFrame([(1, None), (2, None)], "k long, v decimal(18,4)")
    assert running_sum_scalable(all_null, "k", F.col("v"), 10).count() == 2

    empty = df.limit(0)
    assert running_sum_scalable(empty, "k", F.col("v"), 10).count() == 0

    # long-typed caller (the out_of_line_pointers path): int offsets, exact
    ldf = spark.createDataFrame([(1, 100), (2, None), (12, 50)], "k long, v long")
    lgot = {
        r["k"]: r["__running"]
        for r in running_sum_scalable(ldf, "k", F.col("v"), 10).collect()
    }
    assert lgot == {1: 100, 2: 100, 12: 150}

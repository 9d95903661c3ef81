"""Shuffle-economics assertions: bucketed joins must not exchange; salted
aggregation/join must produce identical results to the plain formulations."""

from pyspark.sql import functions as F

from rosbag2parquet_spark.operators.shuffle import (
    salted_groupby_count,
    salted_join,
    write_bucketed,
)
from rosbag2parquet_spark.plans.inspect import physical_plan
from rosbag2parquet_spark.sources.catalog import load_table
from tests.conftest import SF_DIR


def test_bucketed_join_skips_exchange(spark, tmp_path):
    """Both sides bucketed on the key → SortMergeJoin with ZERO Exchange
    (the co-located join the reference's keyed layout is designed for).
    Tables are managed (default warehouse dir, gitignored) and dropped."""
    orders = load_table(spark, SF_DIR, "orders")
    lineitem = load_table(spark, SF_DIR, "lineitem")
    write_bucketed(orders, "b_orders", "o_orderkey", 8)
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"), "b_lineitem", "o_orderkey", 8
    )
    joined = spark.table("b_orders").join(spark.table("b_lineitem"), "o_orderkey")
    # disable broadcast so the bucketed path (not a broadcast) is exercised
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = physical_plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucketed join must not shuffle"
        assert joined.count() == lineitem.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_salted_groupby_matches_plain(spark):
    ev = load_table(spark, SF_DIR, "events")
    plain = ev.groupBy("event_type").agg(F.count(F.lit(1)).cast("long").alias("n"))
    salted = salted_groupby_count(ev, "event_type")
    assert salted.exceptAll(plain).count() == 0 and plain.exceptAll(salted).count() == 0


def test_salted_join_matches_plain(spark):
    ev = load_table(spark, SF_DIR, "events").withColumnRenamed("user_id", "c_custkey")
    cust = load_table(spark, SF_DIR, "customer").select("c_custkey", "c_mktsegment")
    plain = ev.join(cust, "c_custkey").groupBy("c_mktsegment").count()
    salted = salted_join(ev, cust, "c_custkey").groupBy("c_mktsegment").count()
    assert salted.exceptAll(plain).count() == 0 and plain.exceptAll(salted).count() == 0

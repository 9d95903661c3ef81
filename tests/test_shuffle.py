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


def test_no_unexpected_single_partition_exchange(spark):
    """Global sweep: no registered batch query may plan an Exchange
    SinglePartition EXCEPT the known global scalar reductions (one final
    row / an uncorrelated scalar subquery — partial aggregation runs
    map-side, only K scalars cross the exchange). This is the regression
    guard for the round-1 scale-killer class (seqno/limit global windows),
    and it guards every query added since."""
    import __spark_entry__ as entrymod
    from rosbag2parquet_spark.plans.inspect import physical_plan

    # scalar-reduction outputs where a 1-row final agg is the right plan
    allowed = {
        "sql-q6", "sql-q14", "sql-q15", "sql-q17", "sql-q19", "sql-q22",
        "sql-q11",  # global-sum threshold scalar subquery (partial map-side)
        "range-join",
        "interval-join",  # 2-scalar grid-bounds reduce (min/max over events)
        "funnel",  # 3-scalar stage counts; only per-user partials cross
        "lsh-recall",  # two 1-row count reductions + their broadcast cross
        "bm25-search",  # corpus N + avgdl: one 2-scalar reduce, broadcast back
        "hll-sketch",  # merged-sketch estimate + exact global: two 1-row
        # reductions (sketch partials/count partials map-side), broadcast back
        "lm-surprise",  # vocab size V: one 1-row count over the unigram dim
        # (count partials map-side), broadcast back into the factor expr
        "stratified-sample",  # balance target n_min: one 1-row min over
        # the tiny strata dim, broadcast back into the keep threshold
        "temperature-sample",  # same posture: one 1-row (S_w, T) reduce
        # over the strata dim, broadcast back into the keep threshold
        "drift-detect",  # the epoch boundary is one 2-scalar (min,max)
        # reduce broadcast back (interval-join's grid-bounds posture);
        # the share totals are a second 2-scalar reduce over |types| rows
        "drift-numeric",  # same posture + the reference [min,max] range
        # as one more 2-scalar reduce broadcast into the bucket expr
        "volume-trend",  # the min-hour rebase is one 1-scalar reduce
        # broadcast back; the regression re-aggregates hour-grain rows
        "alert-rules",  # same posture as validate-constraints: monitor
        # thresholds reduce to per-rule scalars (drift cells / slope rows
        # partial-combine map-side), stacked into the verdict surface
        "validate-constraints",  # rule verdicts ARE global scalars: the
        # row-local rules fold into one map-side-partial aggregate, the
        # uniqueness/FK passes reduce key tables; ~8 scalars cross total
        "ivf-stats",  # the corpus total is one 1-row sum over the K
        # MATERIALIZED per-cell counts (K=8 rows cross the exchange, not
        # corpus rows), broadcast back into the share expression
        "analyze-table",  # ANALYZE is BY DESIGN a global reduce: partial
        # aggs combine map-side, one wide stats row crosses the exchange,
        # then stack-unpivots to per-column rows (kilobytes at any scale)
    }
    # demux/sink write converted layouts first — covered by their own tests;
    # export-roundtrip runs the converter+exporter pipeline (own tests)
    skip = {"demux", "sink", "export-roundtrip"}
    offenders = []
    for name, fn in entrymod.queries().items():
        # streaming queries drive a real stream to completion on invocation;
        # their batch-visible plan is just the memory-table scan
        if name in skip or name.startswith("stream-"):
            continue
        plan = physical_plan(fn(spark, SF_DIR))
        if "SinglePartition" in plan and name not in allowed:
            offenders.append(name)
    assert offenders == [], f"unexpected SinglePartition plans: {offenders}"


def test_bloom_join_filter_injected(spark):
    """The registered bloom-join query's confs must actually cause Spark to
    inject a runtime bloom filter into the fact scan (plan-asserted via the
    same conf set, pre-checkpoint)."""
    from pyspark.sql import functions as F

    from rosbag2parquet_spark.sources.catalog import load_table

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "50MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        li = load_table(spark, SF_DIR, "lineitem").select(
            "l_orderkey", "l_quantity"
        )
        sel = (
            load_table(spark, SF_DIR, "orders")
            .filter(F.col("o_orderpriority") == "1-URGENT")
            .select("o_orderkey")
        )
        j = li.join(sel, F.col("l_orderkey") == F.col("o_orderkey"))
        plan = j._jdf.queryExecution().executedPlan().toString().lower()
        assert "might_contain" in plan or "bloom" in plan
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_pq_quantize_plan_is_map_only(spark):
    """The PQ quantize pass must be map-side against literal codebooks:
    the ONLY exchange in its plan is the final presentation ORDER BY
    (rangepartitioning) — the corpus never hash-shuffles. At 100 TB this
    is what makes re-quantizing after a codebook retrain a single
    read-transform-write pass."""
    import __spark_entry__ as entrymod

    df = entrymod.queries()["pq-quantize"](spark, SF_DIR)
    plan = physical_plan(df)
    assert "Exchange hashpartitioning" not in plan
    assert "Exchange SinglePartition" not in plan


def test_knn_ivf_quantized_plan_shape(spark):
    """The composed ANN must keep both halves' plan properties: the
    probed-member restriction arrives as a BROADCAST (semi) join — the
    corpus never shuffles for it — and top-k is TakeOrderedAndProject,
    never a global sort."""
    import __spark_entry__ as entrymod

    df = entrymod.queries()["knn-ivf-quantized"](spark, SF_DIR)
    plan = physical_plan(df)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "TakeOrderedAndProject" in plan
    assert "Exchange hashpartitioning" not in plan


def test_knn_pq_plan_shape(spark):
    """Two-stage PQ search: the ADC stage is a map-only scan (lookups
    against literal arrays) feeding TakeOrderedAndProject; the exact
    re-rank restricts the float read behind broadcast joins. No hash
    shuffle of the corpus anywhere."""
    import __spark_entry__ as entrymod

    df = entrymod.queries()["knn-pq"](spark, SF_DIR)
    plan = physical_plan(df)
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "Exchange hashpartitioning" not in plan

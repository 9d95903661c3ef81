"""Additional SQL-surface queries in the TPC-H shapes (E5 — reference
README.md:14-18: the output exists so SQL engines can run exactly these).
Q1 lives in relational.q_sql; here: Q3 (shipping priority — 3-way join +
agg + top-k), Q6 (forecast revenue — pure scan-filter-agg, the pushdown
showcase), and the approximate-aggregate variants that are the honest 100 TB
path (sketches: HLL distinct, quantile digest) — approximations are
engine-specific, so they are declared rows-only (no value oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rosbag2parquet_spark.sources.catalog import load_table, register_views


def q_sql_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: unshipped-order revenue by (orderkey, orderdate,
    priority), top 10. customer broadcast; orders↔lineitem sort-merge;
    TakeOrderedAndProject caps the result."""
    register_views(spark, sf_dir, ("customer", "orders", "lineitem"))
    return spark.sql(
        """
        SELECT o_orderkey,
               CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS revenue,
               unix_micros(o_orderdate) AS orderdate_us,
               o_orderpriority
        FROM customer JOIN orders ON c_custkey = o_custkey
                      JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate  > TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY o_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, o_orderkey
        LIMIT 10
        """
    )


ORACLE_SQL_Q3 = """
SELECT o_orderkey,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS revenue,
       epoch_us(o_orderdate) AS orderdate_us,
       o_orderpriority
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate  > TIMESTAMP '1997-01-01 00:00:00'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey
LIMIT 10
"""


def q_sql_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: revenue from discounted small-quantity lineitems in
    one year. Pure scan→filter→agg: every predicate reaches the parquet
    scan (range + between), zero joins, zero wide operators — the chunk-
    statistics skipping showcase (reference README.md:8)."""
    register_views(spark, sf_dir, ("lineitem",))
    return spark.sql(
        """
        SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(l_discount AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue,
               count(*) AS n_items
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
        """
    )


ORACLE_SQL_Q6 = """
SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(l_discount AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue,
       count(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


def q_approx_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based aggregates — the 100 TB default for distinct counts and
    quantiles: approx_count_distinct (HyperLogLog++, constant memory,
    mergeable) and percentile_approx (quantile digest). Sketch ESTIMATES
    are engine-specific, so the compared columns carry the exact values
    plus boolean assertions that each estimate landed inside its published
    error envelope (HLL rsd=0.02 → |err| ≤ 10% is a 5σ bound; the quantile
    digest's p50 must land between the exact p40 and p60, p99 between p97
    and max). The oracle emits the exact counts and literal TRUEs — the
    diff-testing the reference's README itself asks for (README.md:128-129)
    — so ANN-style "approximate but bounded" is driver-checked, not merely
    asserted in unit tests."""
    li = load_table(spark, sf_dir, "lineitem")
    # two single-purpose aggregations joined on the 3-row group key: the
    # distinct counts force an Expand (input row per distinct column), and
    # putting the object-agg percentiles in the SAME agg makes them run
    # over the expanded input — split, each agg is one clean pass (measured
    # 4.2 s -> ~1 s at sf0.01)
    cnts = li.groupBy("l_returnflag").agg(
        F.count_distinct("l_partkey").alias("exact_parts"),
        F.count_distinct("l_orderkey").alias("exact_orders"),
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("_hll_parts"),
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("_hll_orders"),
    )
    pcts = li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("_ap50"),
        F.percentile_approx("l_extendedprice", 0.99, 10000).alias("_ap99"),
        F.expr("percentile(l_extendedprice, 0.40)").alias("_p40"),
        F.expr("percentile(l_extendedprice, 0.60)").alias("_p60"),
        F.expr("percentile(l_extendedprice, 0.97)").alias("_p97"),
        F.max("l_extendedprice").alias("_pmax"),
    )
    agg = cnts.join(pcts, "l_returnflag")
    within = lambda est, lo, hi: (F.col(est) >= F.col(lo)) & (  # noqa: E731
        F.col(est) <= F.col(hi)
    )
    return agg.select(
        "l_returnflag",
        "exact_parts",
        "exact_orders",
        (
            F.abs(F.col("_hll_parts") - F.col("exact_parts"))
            <= 0.10 * F.col("exact_parts")
        ).alias("hll_parts_ok"),
        (
            F.abs(F.col("_hll_orders") - F.col("exact_orders"))
            <= 0.10 * F.col("exact_orders")
        ).alias("hll_orders_ok"),
        within("_ap50", "_p40", "_p60").alias("p50_ok"),
        within("_ap99", "_p97", "_pmax").alias("p99_ok"),
    )


ORACLE_APPROX_STATS = """
SELECT l_returnflag,
       count(DISTINCT l_partkey) AS exact_parts,
       count(DISTINCT l_orderkey) AS exact_orders,
       TRUE AS hll_parts_ok, TRUE AS hll_orders_ok,
       TRUE AS p50_ok, TRUE AS p99_ok
FROM lineitem GROUP BY l_returnflag
"""


def q_hll_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGEABLE distinct-count sketches — the property `approx-stats`'s
    plain estimates don't prove and exact counts can't have: per-group HLL
    partials (Apache DataSketches binary images via ``hll_sketch_agg``)
    union-merge to the global cardinality WITHOUT re-scanning the fact
    table. At 100 TB this is THE pattern: persist per-partition/per-day
    sketch partials once, answer any rollup by merging kilobytes.
    Compared output: exact per-flag and global counts plus booleans that
    (a) each per-flag estimate and (b) the MERGED global estimate land
    within 10% of exact (lgK=12 → rsd≈1.6%, so 10% is a >5σ envelope);
    the engine-specific estimates themselves never reach the hash."""
    li = load_table(spark, sf_dir, "lineitem")
    # (r13 probe: per_flag fed two consumers and the executed plan
    # evaluated it twice — 6 parquet scans, 0 ReusedExchange — while BOTH
    # materialization fixes lost wall-clock: localCheckpoint 1.29→1.41 s,
    # cache() +0.14 s interleaved A/B, because AQE ran the duplicate
    # subtrees concurrently on idle cores. r14 closes it a third way —
    # see the window-union note below: the subtree now exists once in the
    # plan, no materialization needed.)
    per_flag = li.groupBy("l_returnflag").agg(
        F.hll_sketch_agg("l_partkey", F.lit(12)).alias("_sk"),
        F.count_distinct("l_partkey").alias("exact_parts"),
    )
    exact_global = li.agg(
        F.count_distinct("l_partkey").alias("exact_global")
    )
    # r14: the global union-merge is a WINDOW aggregate over the |flags|-row
    # per_flag frame (hll_union_agg OVER ()) instead of per_flag.agg(...)
    # cross-joined back — the crossJoin form was the r13 probe's duplicated
    # subtree (per_flag evaluated twice, 6 scans, 0 ReusedExchange); the
    # window form keeps the subtree ONCE with no materialization, so it
    # dodges both horns of that probe (duplicate work vs checkpoint cost).
    # HLL union is register-wise max — commutative/associative, so the
    # window's row order cannot change the estimate. exact_global stays a
    # separate scan: a partkey can appear under several flags, so the
    # global distinct cannot derive from the per-flag rows.
    return (
        per_flag.select(
            "l_returnflag",
            "exact_parts",
            (
                F.abs(F.hll_sketch_estimate("_sk") - F.col("exact_parts"))
                <= 0.10 * F.col("exact_parts")
            ).alias("flag_est_ok"),
            F.expr(
                "hll_sketch_estimate(hll_union_agg(_sk) OVER ())"
            ).alias("_gest"),
        )
        .crossJoin(F.broadcast(exact_global))  # 1-row scalar side
        .select(
            "l_returnflag",
            "exact_parts",
            "flag_est_ok",
            "exact_global",
            (
                F.abs(F.col("_gest") - F.col("exact_global"))
                <= 0.10 * F.col("exact_global")
            ).alias("merged_est_ok"),
        )
    )


ORACLE_HLL_SKETCH = """
SELECT l_returnflag,
       CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
       TRUE AS flag_est_ok,
       (SELECT CAST(count(DISTINCT l_partkey) AS BIGINT) FROM lineitem)
         AS exact_global,
       TRUE AS merged_est_ok
FROM lineitem GROUP BY l_returnflag
"""


_ANALYZE_NUM_COLS = ("l_discount", "l_extendedprice", "l_quantity")
_ANALYZE_STR_COLS = ("l_linestatus", "l_returnflag")


def q_analyze_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE TABLE — per-column statistics collection, the CBO/data-
    quality primitive every warehouse runs nightly (the reference's
    rosbag_example.cpp:14-77 computes per-topic stats; this is the
    per-COLUMN generalization a query optimizer feeds on): row count,
    non-null count, exact NDV, and min/max for a numeric + string column
    set of ``lineitem``. TWO single-purpose passes, deliberately split
    (the approx-stats lesson, tpch.py:100-104): the distinct counts ride
    an Expand that multiplies the input per column, and putting min/max/
    count in the SAME aggregate makes them recompute over the expanded
    stream — split, the plain stats are one clean narrow pass and the
    NDV pass carries only (gid, value) rows (measured 5.8 s -> ~1.5 s at
    sf0.1). Both finals are 1-row reduces (partials map-side — kilobytes
    to the driver at any table size) crossed into one wide row, then
    ``stack``-unpivoted into one row per column. Exact NDV is the
    oracle-able choice here; the mergeable-sketch twin for 100 TB
    incremental maintenance is `hll-sketch`."""
    li = load_table(spark, sf_dir, "lineitem")
    cols = _ANALYZE_NUM_COLS + _ANALYZE_STR_COLS
    base_aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        base_aggs.append(F.count(c).alias(f"{c}__nn"))
        base_aggs.append(F.min(c).alias(f"{c}__min"))
        base_aggs.append(F.max(c).alias(f"{c}__max"))
    nd_aggs = [F.count_distinct(c).alias(f"{c}__nd") for c in cols]
    wide = li.agg(*base_aggs).crossJoin(li.agg(*nd_aggs))  # 1-row sides
    parts = [
        f"'{c}', __n, {c}__nn, {c}__nd, "
        f"CAST({c}__min AS DOUBLE), CAST({c}__max AS DOUBLE), "
        "CAST(NULL AS STRING), CAST(NULL AS STRING)"
        for c in _ANALYZE_NUM_COLS
    ] + [
        f"'{c}', __n, {c}__nn, {c}__nd, "
        "CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), "
        f"{c}__min, {c}__max"
        for c in _ANALYZE_STR_COLS
    ]
    return wide.selectExpr(
        f"stack({len(parts)}, " + ", ".join(parts) + ") AS "
        "(col_name, n_rows, n_nonnull, n_distinct, "
        "min_num, max_num, min_str, max_str)"
    ).orderBy("col_name")


ORACLE_ANALYZE_TABLE = " UNION ALL ".join(
    [
        f"SELECT '{c}' AS col_name,"
        " CAST(count(*) AS BIGINT) AS n_rows,"
        f" CAST(count({c}) AS BIGINT) AS n_nonnull,"
        f" CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,"
        f" CAST(min({c}) AS DOUBLE) AS min_num,"
        f" CAST(max({c}) AS DOUBLE) AS max_num,"
        " CAST(NULL AS VARCHAR) AS min_str,"
        " CAST(NULL AS VARCHAR) AS max_str FROM lineitem"
        for c in _ANALYZE_NUM_COLS
    ]
    + [
        f"SELECT '{c}' AS col_name,"
        " CAST(count(*) AS BIGINT) AS n_rows,"
        f" CAST(count({c}) AS BIGINT) AS n_nonnull,"
        f" CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,"
        " CAST(NULL AS DOUBLE) AS min_num,"
        " CAST(NULL AS DOUBLE) AS max_num,"
        f" CAST(min({c}) AS VARCHAR) AS min_str,"
        f" CAST(max({c}) AS VARCHAR) AS max_str FROM lineitem"
        for c in _ANALYZE_STR_COLS
    ]
)


def q_sql_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue by nation for one region/year — the
    full star-chain join (region→nation→customer→orders→lineitem→supplier)
    with the supplier-nation = customer-nation constraint. The three dims
    broadcast; the two facts sort-merge."""
    register_views(
        spark, sf_dir, ("region", "nation", "customer", "orders", "lineitem", "supplier")
    )
    return spark.sql(
        """
        SELECT n_name,
               CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS revenue
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY n_name
        """
    )


ORACLE_SQL_Q5 = """
SELECT n_name,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
"""


def q_sql_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue per customer in a quarter,
    top 20 — join + filter on the fact flag + agg + top-k.

    Revenue accumulates in DECIMAL, not DOUBLE: the fixture prices are
    exact 2/4-decimal values, so per-customer sums frequently land exactly
    on a round-half boundary (… .595) where the engines' double summation
    orders fall on opposite sides. Decimal arithmetic is exact in both
    engines, so the rounding is deterministic and identical."""
    register_views(spark, sf_dir, ("customer", "orders", "lineitem", "nation"))
    return spark.sql(
        """
        SELECT c_custkey, c_name,
               CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                              * (1 - CAST(l_discount AS DECIMAL(18,4)))), 2)
                    AS DOUBLE) AS revenue,
               n_name
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN nation   ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY c_custkey, c_name, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
        """
    )


ORACLE_SQL_Q10 = """
SELECT c_custkey, c_name,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                      * (1 - CAST(l_discount AS DECIMAL(18,4)))), 2)
            AS DOUBLE) AS revenue,
       n_name
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


def q_sql_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: order-priority checking — orders in a quarter having
    at least one qualifying lineitem (EXISTS → left-semi join), counted by
    priority. (The fixture lineitem carries no commit/receipt dates, so the
    'late line' predicate becomes a high-quantity line — identical plan:
    pushdown filter on lineitem, semi-join probe into orders, hash-agg.)"""
    register_views(spark, sf_dir, ("orders", "lineitem"))
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
          AND EXISTS (
              SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_quantity > 45
          )
        GROUP BY o_orderpriority
        """
    )


ORACLE_SQL_Q4 = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
  AND EXISTS (
      SELECT 1 FROM lineitem
      WHERE l_orderkey = o_orderkey AND l_quantity > 45
  )
GROUP BY o_orderpriority
"""


def q_sql_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: line classification by order priority — conditional
    (CASE) aggregation over the orders↔lineitem join with an IN-list +
    range filter that pushes to the lineitem scan. (Fixture has no
    l_shipmode; l_returnflag plays the mode column — same plan.)"""
    register_views(spark, sf_dir, ("orders", "lineitem"))
    return spark.sql(
        """
        SELECT l_returnflag,
               sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS high_line_count,
               sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS low_line_count
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        WHERE l_returnflag IN ('R', 'A')
          AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY l_returnflag
        """
    )


ORACLE_SQL_Q12 = """
SELECT l_returnflag,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_returnflag IN ('R', 'A')
  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY l_returnflag
"""


def q_sql_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promotion-revenue share — a conditional-sum ratio.
    Both sums accumulate in DECIMAL (exact, order-free); the percentage is
    one IEEE division of the two exact-cast doubles — deterministic across
    engines, no round()."""
    register_views(spark, sf_dir, ("part", "lineitem"))
    return spark.sql(
        """
        SELECT 100.0 * CAST(sum(CASE WHEN p_type LIKE 'PROMO%'
                   THEN CAST(l_extendedprice AS DECIMAL(18,4))
                        * (1 - CAST(l_discount AS DECIMAL(18,4)))
                   ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
               / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                          * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE)
               AS promo_revenue_pct,
               count(*) AS n_items
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
        """
    )


ORACLE_SQL_Q14 = """
SELECT 100.0 * CAST(sum(CASE WHEN p_type LIKE 'PROMO%'
           THEN CAST(l_extendedprice AS DECIMAL(18,4))
                * (1 - CAST(l_discount AS DECIMAL(18,4)))
           ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
       / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                  * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE)
       AS promo_revenue_pct,
       count(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
"""


def q_sql_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: small-quantity-order revenue — a correlated scalar
    subquery (per-part average quantity) Catalyst de-correlates into an
    aggregate + join. Determinism: the per-part average is the exact
    decimal sum cast to double over the exact count (one IEEE division),
    the 0.2× threshold is one IEEE multiply, and the final revenue sum
    accumulates in DECIMAL — no engine-order dependence anywhere."""
    register_views(spark, sf_dir, ("part", "lineitem"))
    return spark.sql(
        """
        SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / 7.0
                 AS avg_yearly,
               count(*) AS n_items
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#23'
          AND l_quantity < (
              SELECT 0.2 * (CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
                            / count(*))
              FROM lineitem l2 WHERE l2.l_partkey = part.p_partkey
          )
        """
    )


ORACLE_SQL_Q17 = """
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / 7.0
         AS avg_yearly,
       count(*) AS n_items
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#23'
  AND l_quantity < (
      SELECT 0.2 * (CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
                    / count(*))
      FROM lineitem l2 WHERE l2.l_partkey = part.p_partkey
  )
"""


_Q7_SQL = """
SELECT supp_nation, cust_nation, l_year,
       CAST(round(sum(volume), 2) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l_shipdate) AS INTEGER) AS l_year,
         CAST(l_extendedprice AS DECIMAL(18,4))
           * (1 - CAST(l_discount AS DECIMAL(18,4))) AS volume
  FROM supplier
  JOIN lineitem ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    AND l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
) shipping
GROUP BY supp_nation, cust_nation, l_year
"""


def q_sql_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: volume shipping between two nations by year — the
    double-dim-alias join (nation joined twice under different roles) with
    a symmetric disjunctive filter; both nation sides broadcast."""
    register_views(
        spark, sf_dir, ("supplier", "lineitem", "orders", "customer", "nation")
    )
    return spark.sql(_Q7_SQL)


_Q13_SQL = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
"""


def q_sql_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: customer order-count distribution — LEFT OUTER join with
    an extra join-side predicate (customers with zero qualifying orders
    must appear with count 0), then a second aggregation over the first."""
    register_views(spark, sf_dir, ("customer", "orders"))
    return spark.sql(_Q13_SQL)


_Q15_SQL = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         sum(CAST(l_extendedprice AS DECIMAL(18,4))
             * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name,
       CAST(total_revenue AS DOUBLE) AS total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
"""


def q_sql_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: top supplier — a derived view consumed twice (once for
    the max, once for the equality probe). The max-equality comparison runs
    on EXACT decimals, so the winner set is engine-identical (a double max
    would make ties/near-ties engine-dependent)."""
    register_views(spark, sf_dir, ("supplier", "lineitem"))
    return spark.sql(_Q15_SQL)


_Q19_SQL = """
SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                      * (1 - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE)
         AS revenue,
       count(*) AS n_items
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
       AND l_quantity >= 1 AND l_quantity <= 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
       AND l_quantity >= 10 AND l_quantity <= 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
       AND l_quantity >= 20 AND l_quantity <= 30)
"""


def q_sql_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: discounted revenue under a three-way disjunction of
    conjunctive (brand, size, quantity) predicates — the OR-of-ANDs shape
    optimizers must not naively push (the join is still an equi-join; the
    disjunction filters post-join). Fixture part has no container column;
    p_size plays its role."""
    register_views(spark, sf_dir, ("lineitem", "part"))
    return spark.sql(_Q19_SQL)


_Q22_SQL = """
SELECT c_mktsegment,
       count(*) AS numcust,
       CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS totacctbal
FROM customer
WHERE c_acctbal > (
    SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) / count(*)
    FROM customer WHERE c_acctbal > 0.0
  )
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderpriority = '1-URGENT')
GROUP BY c_mktsegment
"""


_Q8_SQL = """
SELECT o_year,
       round(CAST(sum(CASE WHEN nation = 'NATION_1' THEN volume
                           ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
             / CAST(sum(volume) AS DOUBLE), 6) AS mkt_share
FROM (
  SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
         CAST(l_extendedprice AS DECIMAL(18,4))
           * (1 - CAST(l_discount AS DECIMAL(18,4))) AS volume,
         n2.n_name AS nation
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region    ON n1.n_regionkey = r_regionkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'AMERICA'
    AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
    AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    AND p_type = 'STANDARD'
) all_nations
GROUP BY o_year
"""


def q_sql_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: national market share — the 8-way star join (nation twice:
    customer-side restricts the market region, supplier-side names the
    share-holder) with a conditional-sum ratio. Both sums accumulate in
    DECIMAL (exact, order-free); the share is one IEEE division of the two
    exact-cast doubles, rounded. The three small dims broadcast; lineitem
    joins orders/part on their keys under AQE."""
    register_views(
        spark,
        sf_dir,
        ("part", "supplier", "lineitem", "orders", "customer", "nation", "region"),
    )
    return spark.sql(_Q8_SQL)


_Q21_SQL = """
SELECT s_name, count(*) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
JOIN nation ON s_nationkey = n_nationkey
WHERE o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL 30 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > l1.l_shipdate)
  AND n_name = 'NATION_3'
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
"""


def q_sql_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who kept orders waiting — the correlated
    EXISTS (semi join) + NOT EXISTS with an inequality (anti join) pair
    against the same fact table. Fixture lineitem has no
    commit/receipt dates, so 'late' is shipped >30 days after the order and
    the blame test is 'strictly latest shipment in a multi-supplier order'
    (l_shipdate plays both roles) — identical plan shape: one semi, one
    anti, both keyed on l_orderkey."""
    register_views(spark, sf_dir, ("supplier", "lineitem", "orders", "nation"))
    return spark.sql(_Q21_SQL)


def q_sql_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: wealthy customers with no urgent orders — an
    uncorrelated scalar average (decimal-exact sum ÷ count), an anti-join,
    and a final aggregation. Fixture customer has no phone column
    (c_mktsegment plays the country-code grouping role) and every fixture
    customer has SOME order, so the anti-join predicate is priority-scoped
    to keep the result non-degenerate."""
    register_views(spark, sf_dir, ("customer", "orders"))
    return spark.sql(_Q22_SQL)


#: The five remaining TPC-H queries (Q2/Q9/Q11/Q16/Q20) all consume the
#: `partsupp` table, which the fixtures do not carry. Each is adapted to
#: preserve the query's SHAPE — the thing the optimizer and the correctness
#: gate actually exercise — by deriving a partsupp-like view from lineitem
#: (the part↔supplier bridge that exists): a grouped CTE consumed twice
#: (Q2/Q11), a correlated scalar subquery over it (Q2), a HAVING against an
#: uncorrelated scalar subquery (Q11), a null-aware NOT IN anti join under a
#: distinct-count aggregate (Q16), and a nested IN over a group-having
#: subquery (Q20). The SQL is engine-identical, so each string is both the
#: Spark query and its DuckDB oracle.

_Q2_SQL = """
WITH partsupp AS (
  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
         min(CAST(l_extendedprice AS DECIMAL(18,4))) AS ps_supplycost
  FROM lineitem GROUP BY l_partkey, l_suppkey
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_name
FROM part
JOIN partsupp ON p_partkey = ps_partkey
JOIN supplier ON s_suppkey = ps_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE p_size <= 15 AND p_type = 'STANDARD' AND r_name = 'EUROPE'
  AND ps_supplycost = (
    SELECT min(ps_supplycost)
    FROM partsupp
    JOIN supplier ON s_suppkey = ps_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE part.p_partkey = ps_partkey AND r_name = 'EUROPE')
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


def q_sql_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: minimum-cost supplier per part in a region — the
    correlated scalar-subquery-over-aggregate pattern (decorrelated by both
    engines into a per-part min + self-join). The partsupp CTE is the
    lineitem-derived bridge; `ps_supplycost` is an exact DECIMAL min so the
    equality probe is engine-identical (a float min would make the winner
    set ULP-dependent). ORDER BY carries a total tiebreak (s_name,
    p_partkey) so the LIMIT cut is deterministic."""
    register_views(
        spark, sf_dir, ("part", "supplier", "lineitem", "nation", "region")
    )
    return spark.sql(_Q2_SQL)


_Q9_SQL = """
SELECT nation, o_year,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                      * (1 - CAST(l_discount AS DECIMAL(18,4))))
                  - sum(CAST(p_retailprice AS DECIMAL(18,4))
                        * CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE)
         AS sum_profit
FROM (
  SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
         l_extendedprice, l_discount, p_retailprice, l_quantity
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN part     ON p_partkey = l_partkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE p_name LIKE '%red%'
) profit
GROUP BY nation, o_year
"""


def q_sql_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: product-line profit by supplier nation and order
    year — the 5-way fact-through-substring-filter join. Fixture has no
    ps_supplycost, so cost = p_retailprice × quantity (same
    revenue-minus-cost arithmetic). The two sums accumulate separately in
    exact DECIMAL and subtract once at the aggregate level — keeping every
    intermediate under DECIMAL(38) in BOTH engines (a fused per-row
    rev−cost expression would push Spark past precision 38 and trigger its
    scale-truncation, diverging from DuckDB)."""
    register_views(
        spark, sf_dir, ("lineitem", "supplier", "part", "orders", "nation")
    )
    return spark.sql(_Q9_SQL)


_Q11_SQL = """
WITH ps AS (
  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
         sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS ps_value
  FROM lineitem GROUP BY l_partkey, l_suppkey
)
SELECT ps_partkey, CAST(round(sum(ps_value), 2) AS DOUBLE) AS part_value
FROM ps JOIN supplier ON ps_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_1'
GROUP BY ps_partkey
HAVING sum(ps_value) > (
  SELECT sum(ps_value) * 0.002
  FROM ps JOIN supplier ON ps_suppkey = s_suppkey
          JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_1')
ORDER BY part_value DESC
"""


def q_sql_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: 'important stock' — a grouped value per part kept
    only if it exceeds a FRACTION OF THE GLOBAL TOTAL (scalar subquery in
    HAVING, the same derived view consumed twice). Both the per-part sums
    and the global threshold stay exact DECIMAL until the comparison, so
    the kept set is engine-identical; only the reported value is rounded
    to double."""
    register_views(spark, sf_dir, ("lineitem", "supplier", "nation"))
    return spark.sql(_Q11_SQL)


_Q16_SQL = """
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#13'
  AND p_type NOT LIKE 'PROMO%'
  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


def q_sql_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: supplier diversity by part attribute — a NOT IN
    subquery (null-aware anti join; keys are non-null so it stays a plain
    anti) under a count(DISTINCT) aggregate with an IN-list filter. The
    fixture's supplier table has no comment column; negative account
    balance plays the 'complaints' exclusion role. lineitem is the
    part↔supplier bridge partsupp plays in the original."""
    register_views(spark, sf_dir, ("lineitem", "part", "supplier"))
    return spark.sql(_Q16_SQL)


_Q20_SQL = """
SELECT s_name, s_acctbal
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (
  SELECT l_suppkey FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE 'small%'
    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  GROUP BY l_suppkey, l_partkey
  HAVING sum(CAST(l_quantity AS DECIMAL(18,4))) > 45
)
AND n_name IN ('NATION_2', 'NATION_7', 'NATION_12')
ORDER BY s_name
"""


def q_sql_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers with excess volume of a named part line —
    the nested IN-over-group-having subquery (semi join against an
    aggregate). Fixture has no ps_availqty, so the original's
    half-of-available threshold becomes a quantity floor on the same
    grouped sum; the subquery→semi-join plan is identical. Quantity
    accumulates in exact DECIMAL so the threshold cut is engine-identical."""
    register_views(spark, sf_dir, ("supplier", "nation", "lineitem", "part"))
    return spark.sql(_Q20_SQL)


QUERIES = {
    "sql-q2": q_sql_q2,
    "sql-q3": q_sql_q3,
    "sql-q4": q_sql_q4,
    "sql-q5": q_sql_q5,
    "sql-q6": q_sql_q6,
    "sql-q10": q_sql_q10,
    "sql-q7": q_sql_q7,
    "sql-q12": q_sql_q12,
    "sql-q13": q_sql_q13,
    "sql-q14": q_sql_q14,
    "sql-q15": q_sql_q15,
    "sql-q17": q_sql_q17,
    "sql-q19": q_sql_q19,
    "sql-q8": q_sql_q8,
    "sql-q9": q_sql_q9,
    "sql-q11": q_sql_q11,
    "sql-q16": q_sql_q16,
    "sql-q20": q_sql_q20,
    "sql-q21": q_sql_q21,
    "sql-q22": q_sql_q22,
    "approx-stats": q_approx_stats,
    "hll-sketch": q_hll_sketch,
    "analyze-table": q_analyze_table,
}

ORACLES = {
    "sql-q2": _Q2_SQL,
    "sql-q3": ORACLE_SQL_Q3,
    "sql-q4": ORACLE_SQL_Q4,
    "sql-q5": ORACLE_SQL_Q5,
    "sql-q6": ORACLE_SQL_Q6,
    "sql-q10": ORACLE_SQL_Q10,
    "sql-q7": _Q7_SQL,
    "sql-q12": ORACLE_SQL_Q12,
    "sql-q13": _Q13_SQL,
    "sql-q14": ORACLE_SQL_Q14,
    "sql-q15": _Q15_SQL,
    "sql-q17": ORACLE_SQL_Q17,
    "sql-q19": _Q19_SQL,
    "sql-q8": _Q8_SQL,
    "sql-q9": _Q9_SQL,
    "sql-q11": _Q11_SQL,
    "sql-q16": _Q16_SQL,
    "sql-q20": _Q20_SQL,
    "sql-q21": _Q21_SQL,
    "sql-q22": _Q22_SQL,
    # approx-stats compares exact counts + error-envelope booleans; the
    # engine-specific sketch estimates never reach the hashed columns.
    "approx-stats": ORACLE_APPROX_STATS,
    "hll-sketch": ORACLE_HLL_SKETCH,
    "analyze-table": ORACLE_ANALYZE_TABLE,
}

"""Constraint-validation semantics beyond what the non-null fixture
exercises: NULL predicate inputs never count as violations (matching the
oracle's count(*) FILTER skipping NULL conditions), NULL keys surface
through the completeness rule (not the uniqueness/FK rules), and orphan
FK mass counts fact ROWS, not distinct keys."""

import os

import pytest

from rosbag2parquet_spark.operators.quality import q_validate_constraints


@pytest.fixture(scope="module")
def tiny_layout(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("quality"))
    # lineitem: one NULL orderkey row, one out-of-range qty (NULL qty too),
    # a duplicated (orderkey, linenumber) pair, and an orphan orderkey
    # carried by TWO rows (FK violations must count rows, not keys)
    li = spark.createDataFrame(
        [
            (1, 1, 10.0, "A", 5.0),
            (1, 1, 10.0, "N", 5.0),   # dup fine key
            (2, 1, None, "R", 5.0),   # NULL qty: range rule must not fire
            (None, 1, 10.0, "A", 5.0),  # NULL key: completeness only
            (9, 1, 10.0, "A", 5.0),   # orphan order 9, row 1
            (9, 2, 99.0, "A", 5.0),   # orphan order 9, row 2 (+range viol)
        ],
        "l_orderkey long, l_linenumber long, l_quantity double, "
        "l_returnflag string, l_extendedprice double",
    )
    ords = spark.createDataFrame(
        [(1, 100), (2, 100), (3, 101)], "o_orderkey long, o_custkey long"
    )
    cust = spark.createDataFrame([(100,)], "c_custkey long")
    li.write.parquet(os.path.join(root, "lineitem.parquet"))
    ords.write.parquet(os.path.join(root, "orders.parquet"))
    cust.write.parquet(os.path.join(root, "customer.parquet"))
    return root


def test_rule_verdicts_on_edge_rows(spark, tiny_layout):
    out = {
        r["rule"]: (r["checked"], r["violations"], r["ok"])
        for r in q_validate_constraints(spark, tiny_layout).collect()
    }
    n = 6
    # one NULL key row
    assert out["completeness:l_orderkey"] == (n, 1, False)
    # only the 99.0 row violates; NULL qty does NOT count
    assert out["range:l_quantity:[1,25]"] == (n, 1, False)
    assert out["set:l_returnflag:{A,N,R}"] == (n, 0, True)
    assert out["positive:l_extendedprice"] == (n, 0, True)
    # the duplicated fine key contributes surplus 1
    assert out["unique:l_orderkey+l_linenumber"] == (n, 1, False)
    # orderkey 1 has 2 rows (surplus 1) and orderkey 9 has 2 (surplus 1);
    # NULL keys group as one key with c=1 → no surplus from them
    assert out["unique:l_orderkey"] == (n, 2, False)
    # order 9 is absent from orders and carries TWO fact rows; the NULL
    # key does not join and is not an FK violation (completeness owns it)
    assert out["fk:lineitem.l_orderkey->orders"] == (n, 2, False)
    # custkey 101 has one order and no customer row
    assert out["fk:orders.o_custkey->customer"] == (3, 1, False)


def test_pseudonymize_corpus_never_shuffles(spark):
    """The k-gate must come back as a BROADCAST onto the event scan — the
    corpus side may not hash-partition on the QI key (a policy change must
    re-filter without moving the data)."""
    from rosbag2parquet_spark.operators.quality import q_pseudonymize
    from rosbag2parquet_spark.plans.inspect import physical_plan
    from tests.conftest import SF_DIR

    plan = physical_plan(q_pseudonymize(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    # the only hash Exchange allowed is the tiny QI-dim aggregation
    import re

    hash_exchanges = re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan)
    for cols in hash_exchanges:
        assert "event_id" not in cols and "user_id" not in cols, (
            f"corpus-side shuffle leaked into the plan: {cols}"
        )


def test_validate_api_custom_rules(spark):
    """The declarative rule API on user-supplied frames: a multi-column
    FK, a uniqueness ladder whose coarse key re-aggregates the fine key's
    reduced rows, and row-local rules — shapes the registered query does
    not cover."""
    from rosbag2parquet_spark.operators.quality import (
        Completeness,
        ForeignKey,
        InRange,
        InSet,
        Positive,
        Unique,
        validate,
    )

    fact = spark.createDataFrame(
        [
            (1, "a", 1, 5.0, "x"),
            (1, "a", 2, 6.0, "y"),   # dup on (k1,k2,seq)? no — seq differs
            (1, "a", 2, 7.0, "x"),   # dup fine key (k1,k2,seq=2)
            (2, "b", 1, -1.0, "z"),  # orphan FK + nonpositive + bad set
            (None, "c", 1, 200.0, "x"),  # NULL key + out of range
        ],
        "k1 long, k2 string, seq long, v double, tag string",
    )
    dim = spark.createDataFrame(
        [(1, "a"), (9, "z")], "p1 long, p2 string"
    )
    rules = [
        Completeness("k1"),
        InRange("v", 0, 100),
        InSet("tag", ("x", "y")),
        Positive("v"),
        Unique(("k1", "k2", "seq")),
        Unique(("k1", "k2")),
        ForeignKey(("k1", "k2"), ("p1", "p2"), "fact->dim"),
    ]
    out = {
        r["rule"]: (r["checked"], r["violations"], r["ok"])
        for r in validate(fact, rules, {"fact->dim": dim}).collect()
    }
    assert out["completeness:k1"] == (5, 1, False)
    assert out["range:v:[0,100]"] == (5, 2, False)       # -1 and 200
    assert out["set:tag:{x,y}"] == (5, 1, False)         # "z"
    assert out["positive:v"] == (5, 1, False)            # -1
    # fine key (1,a,2) has 2 rows -> surplus 1
    assert out["unique:k1+k2+seq"] == (5, 1, False)
    # coarse key (1,a) has 3 rows -> surplus 2; NULL key groups don't count
    assert out["unique:k1+k2"] == (5, 2, False)
    # (2,b) is absent from dim and carries ONE row; NULL key not an orphan
    assert out["fk:fact->dim"] == (5, 1, False)


def test_validate_cli(spark, tmp_path, capsys):
    """The `validate` CLI runs the rule API from a self-contained JSON
    spec (FK parents are parquet paths) and exit-codes the verdict."""
    import json

    from rosbag2parquet_spark.__main__ import main

    child = str(tmp_path / "child")
    parent = str(tmp_path / "parent")
    spark.createDataFrame(
        [(1, 5.0), (2, -1.0), (9, 3.0)], "k long, v double"
    ).write.parquet(child)
    spark.createDataFrame([(1,), (2,)], "x long").write.parquet(parent)
    spec = {
        "rules": [
            {"type": "completeness", "column": "k"},
            {"type": "positive", "column": "v"},
            {"type": "unique", "columns": ["k"]},
            {
                "type": "foreign_key",
                "columns": ["k"],
                "parent": parent,
                "parent_columns": ["x"],
                "label": "child.k->parent",
            },
        ]
    }
    rf = tmp_path / "rules.json"
    rf.write_text(json.dumps(spec))
    rc = main(["validate", "--table", child, "--rules", str(rf)])
    out = capsys.readouterr().out
    assert rc == 1  # positive:v and fk fail
    assert "FAIL positive:v: 1/3 violations" in out
    assert "FAIL fk:child.k->parent: 1/3 violations" in out
    assert "ok   completeness:k" in out
    assert "ok   unique:k" in out
    assert "2/4 rules passed" in out


def test_rowcount_rule(spark):
    """RowCountBetween rides the row-local pass's count: violations is the
    distance outside the bound, zero inside."""
    from rosbag2parquet_spark.operators.quality import (
        RowCountBetween,
        validate,
    )

    df = spark.createDataFrame([(i,) for i in range(7)], "x long")
    out = {
        r["rule"]: (r["checked"], r["violations"], r["ok"])
        for r in validate(
            df, [RowCountBetween(1, 10), RowCountBetween(10, 20),
                 RowCountBetween(1, 5)]
        ).collect()
    }
    assert out["rowcount:[1,10]"] == (7, 0, True)
    assert out["rowcount:[10,20]"] == (7, 3, False)  # 3 short of 10
    assert out["rowcount:[1,5]"] == (7, 2, False)    # 2 over 5


def test_validate_fk_only_fusion_path(spark):
    """r14 one-pass fusion, FK-keyed branch: with no Unique rule the
    row-local counters ride the FK child's groupBy (fused_key comes from
    fks[0]) — n/violations must count EVERY fact row (NULL keys included,
    they group but are filtered only on the FK branch), and rowcount must
    still ride the fused n."""
    from rosbag2parquet_spark.operators.quality import (
        ForeignKey,
        Positive,
        RowCountBetween,
        validate,
    )

    fact = spark.createDataFrame(
        [(1, 5.0), (1, -2.0), (3, 1.0), (3, 4.0), (None, -9.0)],
        "k long, v double",
    )
    dim = spark.createDataFrame([(1,)], "p long")
    out = {
        r["rule"]: (r["checked"], r["violations"], r["ok"])
        for r in validate(
            fact,
            [
                Positive("v"),
                RowCountBetween(1, 3),
                ForeignKey(("k",), ("p",), "fact->dim"),
            ],
            {"fact->dim": dim},
        ).collect()
    }
    assert out["positive:v"] == (5, 2, False)        # -2 and -9
    assert out["rowcount:[1,3]"] == (5, 2, False)    # 2 over 3
    # k=3 carries TWO orphan fact rows; the NULL key is not an orphan
    assert out["fk:fact->dim"] == (5, 2, False)


def test_floor_division_semantics_negative_operands(spark):
    """The advice-r7 class pinned at the expression level: Spark `div`
    truncates toward zero while DuckDB `//` floors — the monitoring
    suite's midpoint/hour-bucket derivations use (a - pmod(a,b)) div b,
    which must equal Python's floor `//` for NEGATIVE operands
    (pre-1970 timestamps) too."""
    from rosbag2parquet_spark.operators.quality import _MID_US

    rows = [(-7, -3), (-1, -1), (0, 0), (7, 3), (-3600000001, -3600000000)]
    df = spark.createDataFrame(
        [(a,) for a, _ in rows] , "t_us long"
    ).selectExpr(
        "t_us",
        "(t_us - pmod(t_us, 3600000000)) div 3600000000 AS h",
        "t_us div 3600000000 AS h_trunc",
    )
    got = {r.t_us: (r.h, r.h_trunc) for r in df.collect()}
    for a, _ in rows:
        assert got[a][0] == a // 3_600_000_000, a  # floor semantics
    # the truncating form genuinely differs on the negative non-multiple
    assert got[-3600000001][1] == -1 and got[-3600000001][0] == -2

    # midpoint: both-negative epoch bounds floor like Python
    mid = spark.createDataFrame(
        [(-7, -2)], "t_lo long, t_hi long"
    ).selectExpr(f"{_MID_US} AS m").collect()[0].m
    assert mid == (-7 + -2) // 2 == -5


def test_drift_bps_survives_wide_counts(spark, duck):
    """The DECIMAL(38,0)/HUGEINT widening holds where BIGINT wraps:
    epoch counts around 2^33 rows make n1*t2 products ~2^66 — both
    engines must agree on the exact basis points."""
    from rosbag2parquet_spark.operators.quality import (
        DRIFT_BPS_DUCK,
        DRIFT_BPS_SQL,
    )

    n1, n2 = 2**33, 2**33 + 12345678
    t1, t2 = n1 + 99, n2 + 17
    s = spark.createDataFrame(
        [(n1, n2, t1, t2)], "n1 long, n2 long, t1 long, t2 long"
    ).selectExpr(f"{DRIFT_BPS_SQL} AS bps").collect()[0].bps
    d = duck.sql(
        f"SELECT {DRIFT_BPS_DUCK} AS bps FROM (SELECT {n1}::BIGINT n1,"
        f" {n2}::BIGINT n2, {t1}::BIGINT t1, {t2}::BIGINT t2)"
    ).fetchall()[0][0]
    import decimal as _d

    exact = abs(n1 * t2 - n2 * t1) * 10000 // (t1 * t2)
    assert s == d == exact

def test_monitoring_rules_through_api_and_spec(spark, tmp_path, capsys):
    """DriftBelow / SlopeAtLeast are first-class rules: a synthetic table
    whose category mix shifts and whose one group's volume decays must
    trip exactly the configured thresholds, through BOTH the Python API
    and the CLI's JSON spec (the monitors and the gate share one verdict
    surface)."""
    import json

    from rosbag2parquet_spark.__main__ import main
    from rosbag2parquet_spark.operators.quality import (
        DriftBelow,
        SlopeAtLeast,
        validate,
    )

    # epoch 1 (hours 0..4): a=50/hour, b=10/hour; epoch 2 (hours 5..9):
    # a decays 50->10 linearly, b stays 10 -> a's mix share collapses
    # (big drift) and a's slope is clearly negative
    rows = []
    h_us = 3_600_000_000
    for h in range(10):
        n_a = 50 if h < 5 else 50 - 10 * (h - 4)
        for i in range(n_a):
            rows.append(("a", h * h_us + i))
        for i in range(10):
            rows.append(("b", h * h_us + 500_000 + i))
    df = spark.createDataFrame(rows, "cat string, t_us long")
    out = {
        r["rule"]: (r["violations"], r["ok"])
        for r in validate(
            df,
            [
                DriftBelow("cat", "t_us", 5000),
                DriftBelow("cat", "t_us", 500),
                SlopeAtLeast("cat", "t_us", -1.0),
            ],
        ).collect()
    }
    assert out["drift:cat<5000bps"] == (0, True)
    # the mix shift is well above 500 bps and symmetric: both categories'
    # shares move, so both alarm
    assert out["drift:cat<500bps"][1] is False
    # a decays ~ -5.3/hour over the full span; b is flat
    assert out["slope:cat>=-1.0/h"] == (1, False)

    # the same thresholds through the CLI's self-contained JSON spec
    tbl = str(tmp_path / "monitored")
    df.write.parquet(tbl)
    spec = {
        "rules": [
            {"type": "drift_below", "column": "cat", "ts_column": "t_us",
             "max_bps": 5000},
            {"type": "slope_at_least", "column": "cat",
             "ts_column": "t_us", "min_slope": -1.0},
        ]
    }
    rf = tmp_path / "monitor.json"
    rf.write_text(json.dumps(spec))
    rc = main(["validate", "--table", tbl, "--rules", str(rf)])
    outtext = capsys.readouterr().out
    assert rc == 1
    assert "ok   drift:cat<5000bps" in outtext
    assert "FAIL slope:cat>=-1.0/h" in outtext

def test_drift_rule_null_ts_matches_oracle_semantics(spark, duck):
    """NULL-timestamp rows must land in epoch 2 on BOTH sides (the oracle
    CASE's ELSE paths) — the engine previously dropped them from both
    epoch counts, a silent divergence the fixtures (no NULL ts) never
    fired. Proven here by evaluating the engine cells and the oracle
    pattern on the same NULL-bearing table."""
    from rosbag2parquet_spark.operators.quality import (
        DRIFT_BPS_SQL,
        _drift_bps_cells,
    )

    rows = [("a", 1_000_000), ("a", 9_000_000), ("b", 2_000_000),
            ("b", None), ("b", None)]
    df = spark.createDataFrame(rows, "cat string, t_us long")
    eng = sorted(r["bps"] for r in _drift_bps_cells(df, "cat", "t_us").collect())

    import duckdb

    con = duckdb.connect()
    con.execute("CREATE TABLE t (cat VARCHAR, t_us BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    duck_bps = sorted(
        x[0]
        for x in con.execute(f"""
WITH b AS (SELECT min(t_us) AS t_lo, max(t_us) AS t_hi FROM t),
cells AS (
  SELECT cat,
         CAST(sum(CASE WHEN e.t_us < (b.t_lo + b.t_hi) // 2
                       THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(sum(CASE WHEN e.t_us < (b.t_lo + b.t_hi) // 2
                       THEN 0 ELSE 1 END) AS BIGINT) AS n2
  FROM t e CROSS JOIN b GROUP BY cat
), tot AS (SELECT sum(n1) AS t1, sum(n2) AS t2 FROM cells)
SELECT {DRIFT_BPS_SQL.replace('div', '//').replace('DECIMAL(38,0)', 'HUGEINT')} AS bps
FROM cells CROSS JOIN tot
""").fetchall()
    )
    assert eng == duck_bps
    # and the NULL rows genuinely count: category b has n2 >= 2
    cells = spark.createDataFrame(rows, "cat string, t_us long")


def test_monitoring_rule_refuses_non_time_column(spark):
    """A string ts_column must refuse loudly — silently bucketing NULLs
    would report ok=true on a drifting table (the worst gate failure)."""
    import pytest as _pytest

    from rosbag2parquet_spark.operators.quality import DriftBelow, validate

    df = spark.createDataFrame([("a", "2024-01-01")], "cat string, ts string")
    with _pytest.raises(ValueError, match="expected a timestamp"):
        validate(df, [DriftBelow("cat", "ts", 100)]).collect()

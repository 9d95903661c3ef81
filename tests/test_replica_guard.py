"""The local replica must be strictly STRICTER than the driver's gate.

Three rounds were lost to replica/driver divergence (r3: DuckDB HUGEINT →
float64 under the driver's pandas fetch; r4: raw BinaryType → unhashable
``bytearray`` under its canonicalizer; r7: top-level ArrayType → unhashable
``list`` under the same ``sort_values → Categorical → factorize`` path).
This pins the structural rules that kill those classes: any compared output
carrying BinaryType anywhere in its type tree, OR a top-level
Array/Map/Struct column, is refused by ``tools.check_oracle``, and no
registered query emits one.
"""

from pyspark.sql import types as T

import __spark_entry__ as entrymod
from tools.check_oracle import unhashable_columns


def test_flags_top_level_binary():
    schema = T.StructType(
        [
            T.StructField("a", T.LongType()),
            T.StructField("data", T.BinaryType()),
        ]
    )
    assert unhashable_columns(schema) == ["data"]


def test_flags_nested_binary():
    schema = T.StructType(
        [
            T.StructField("arr", T.ArrayType(T.BinaryType())),
            T.StructField(
                "m", T.MapType(T.StringType(), T.ArrayType(T.BinaryType()))
            ),
            T.StructField(
                "s",
                T.StructType([T.StructField("inner", T.BinaryType())]),
            ),
            T.StructField("ok", T.StringType()),
        ]
    )
    assert unhashable_columns(schema) == ["arr", "m", "s"]


def test_flags_top_level_array_map_struct():
    """The r7 class: a clean-elemented top-level array is STILL a list cell
    under the driver's pandas fetch — unhashable in factorize. Maps and
    structs land as dicts under the Arrow path: same failure."""
    schema = T.StructType(
        [
            T.StructField("codes", T.ArrayType(T.ByteType())),
            T.StructField("m", T.MapType(T.StringType(), T.LongType())),
            T.StructField(
                "s", T.StructType([T.StructField("x", T.LongType())])
            ),
            T.StructField("ok", T.DoubleType()),
        ]
    )
    assert unhashable_columns(schema) == ["codes", "m", "s"]


def test_clean_schema():
    schema = T.StructType(
        [
            T.StructField("a", T.StringType()),
            T.StructField("b", T.LongType()),
            T.StructField("c", T.DoubleType()),
            T.StructField("d", T.DecimalType(20, 0)),
        ]
    )
    assert unhashable_columns(schema) == []


def test_no_registered_query_emits_unhashable(spark):
    """Every compared output must hash under the driver's pandas
    canonicalizer — schema-only check (cheap: no execution beyond planning;
    queries that materialize streams are exercised by the parity suite)."""
    from tests.conftest import SF_DIR

    offenders = {}
    for name, fn in entrymod.queries().items():
        if name.startswith("stream-"):
            continue  # streaming twins run minutes; covered in parity tests
        cols = unhashable_columns(fn(spark, SF_DIR).schema)
        if cols:
            offenders[name] = cols
    assert offenders == {}


def test_hugeint_oracle_rejected(duck):
    """A DuckDB oracle whose result carries HUGEINT is a guaranteed future
    driver-red (HUGEINT → float64 under the driver's pandas fetch, vs
    Spark's BIGINT): no registered oracle may produce one."""
    import __spark_entry__ as entrymod

    offenders = {}
    for name, sql in entrymod.oracle_sql().items():
        rel = duck.sql(sql)
        bad = [
            f"{c}:{t}"
            for c, t in zip(rel.columns, rel.types)
            if str(t) in ("HUGEINT", "UHUGEINT")
        ]
        if bad:
            offenders[name] = bad
    assert offenders == {}


def test_pq_cte_prefix_chains_are_disjoint():
    """r12 structural guard for the cutover oracle's two-chain
    composition: the CTE names a prefixed `_pq_cte_sql` chain defines
    must be disjoint from the unprefixed chain's — EXCEPT the shared
    km_ coarse-quantizer chain, which the prefixed chain must not
    re-emit (emit_km=False) because the raw-space cells are shared
    between bases. A collision would silently shadow a CTE in DuckDB
    and score one index with the other's codebooks."""
    import re

    from rosbag2parquet_spark.functions.pq import _pq_cte_sql

    def defined(sql):
        return set(re.findall(r"(?m)^(\w+) AS MATERIALIZED", sql)) | set(
            re.findall(r"(?m)^(\w+) AS \(", sql)
        )

    old = defined(_pq_cte_sql(rotated=False, residual=True))
    new = defined(
        _pq_cte_sql(rotated=True, residual=True, prefix="nw_", emit_km=False)
    )
    overlap = old & new
    assert overlap == set(), overlap
    assert all(n.startswith("nw_") for n in new), sorted(new)[:5]
    # the shared coarse chain lives only in the unprefixed emission
    assert any(n.startswith("km_") for n in old)
    assert not any(n.startswith("km_") for n in new)

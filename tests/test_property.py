"""Property-based tests (hypothesis): msgdef compiler invariants over random
message definitions, and sketch-aggregate sanity bounds."""

import string

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql import types as T

from rosbag2parquet_spark.sources.msgdef import (
    BUILTIN_TYPES,
    parse_msgdef,
    to_struct_type,
)
from rosbag2parquet_spark.sources.catalog import load_table
from tests.conftest import SF_DIR

_name = st.text(string.ascii_lowercase, min_size=1, max_size=8)
_builtin = st.sampled_from(sorted(BUILTIN_TYPES))


@st.composite
def _msgdef(draw):
    n = draw(st.integers(1, 8))
    fields = []
    names = draw(
        st.lists(_name, min_size=n, max_size=n, unique=True)
    )
    for fname in names:
        kind = draw(st.sampled_from(["scalar", "time", "array", "const"]))
        ftype = draw(_builtin)
        fields.append((fname, ftype, kind))
    lines = []
    for fname, ftype, kind in fields:
        if kind == "scalar":
            lines.append(f"{ftype} {fname}")
        elif kind == "time":
            lines.append(f"time {fname}")
        elif kind == "array":
            lines.append(f"{ftype}[] {fname}")
        else:
            lines.append(f"int32 {fname.upper()}=42")
    return "\n".join(lines), fields


@given(_msgdef())
@settings(max_examples=200, deadline=None)
def test_msgdef_schema_invariants(case):
    """For any definition: constants never appear; time fields appear as
    exactly the _sec/_nsec pair; arrays skipped in parity mode but present
    in native mode; scalars map through the promotion table."""
    text, fields = case
    specs = parse_msgdef("test/Msg", text)
    skip = to_struct_type("test/Msg", specs, arrays="skip")
    native = to_struct_type("test/Msg", specs, arrays="native")
    skip_names = [f.name for f in skip.fields]
    native_types = {f.name: f.dataType for f in native.fields}

    for fname, ftype, kind in fields:
        if kind == "const":
            assert fname.upper() not in skip_names
        elif kind == "time":
            assert f"{fname}_sec" in skip_names and f"{fname}_nsec" in skip_names
        elif kind == "array":
            assert fname not in skip_names  # parity: arrays not columnarized
            if ftype in ("uint8", "byte", "char"):
                assert native_types[fname] == T.BinaryType()  # byte buffer
            else:
                assert native_types[fname] == T.ArrayType(BUILTIN_TYPES[ftype])
        else:
            assert fname in skip_names
            idx = skip_names.index(fname)
            assert skip.fields[idx].dataType == BUILTIN_TYPES[ftype]


@pytest.mark.slow
def test_approx_aggregates_within_bounds(spark):
    """Sketch estimates must land near the exact answers (HLL rsd=2% →
    allow 10%; percentile_approx with high accuracy → within the value
    range and close to exact)."""
    li = load_table(spark, SF_DIR, "lineitem")
    row = li.agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("apx"),
        F.countDistinct("l_partkey").alias("exact"),
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("p50a"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("p50e"),
    ).collect()[0]
    assert abs(row.apx - row.exact) / row.exact < 0.10
    assert abs(row.p50a - row.p50e) / row.p50e < 0.05

"""Cross-parallelism determinism: the round-2 claim under test — every
oracled float is either an exact decimal accumulation or a single IEEE op
on bit-identical operands, so changing the shuffle layout (which changes
double accumulation ORDER) must not move a single bit. This is the local
proxy for the driver-vs-local engine divergence that failed null-semantics
and text-stats in round 1."""

import math

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_DIR

#: queries whose outputs carry computed floats — the ones an order-dependent
#: formulation would betray (plus seqno, whose two-pass plan must not depend
#: on partitioning)
RISKY = [
    "groupby-agg", "derived", "rollup", "dim-join", "zscore", "text-stats",
    "quality-score", "window-tumbling", "null-semantics", "limit", "seqno",
    "rollup-hypertable", "dedup-minhash-lsh", "kmeans", "salted-agg",
    # round 4: conditional-sum ratio (q8) and the two-pass global rank
    "sql-q8", "shuffle-global",
]


def _norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def nv(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            return "nan" if math.isnan(v) else repr(v)
        return str(v)

    return sorted(tuple(nv(r[i]) for i in order) for r in rows)


@pytest.mark.parametrize("name", RISKY)
def test_result_invariant_under_parallelism(name, spark):
    qs = entrymod.queries()
    baseline_parts = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = qs[name](spark, SF_DIR)
        ra, ca = [tuple(r) for r in a.collect()], a.columns
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        b = qs[name](spark, SF_DIR)
        rb, cb = [tuple(r) for r in b.collect()], b.columns
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", baseline_parts)
    assert ca == cb
    assert _norm(ra, ca) == _norm(rb, cb), f"{name} varies with partitioning"

"""Deterministic corpus-shaping suite (functions.sampling): invariants the
oracle-parity gate can't express (rate tolerance, cap bounds, bin fill,
split stability) plus the plan properties the 100 TB story depends on."""

import pytest
from pyspark.sql import functions as F

from rosbag2parquet_spark.functions import sampling
from rosbag2parquet_spark.plans.inspect import physical_plan
from rosbag2parquet_spark.sources.catalog import load_table
from tests.conftest import SF_DIR


def test_sample_rate_close_to_nominal(spark):
    docs = load_table(spark, SF_DIR, "documents")
    total = docs.count()
    sampled = sum(
        r.n_sampled for r in sampling.q_sample_hash(spark, SF_DIR).collect()
    )
    # 10% Bernoulli over n docs: allow ±5 sigma
    import math

    sigma = math.sqrt(total * 0.1 * 0.9)
    assert abs(sampled - 0.1 * total) < 5 * sigma + 1


def test_sample_is_stable_across_runs(spark):
    a = sampling.q_sample_hash(spark, SF_DIR).collect()
    b = sampling.q_sample_hash(spark, SF_DIR).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_split_partitions_the_corpus(spark):
    docs = load_table(spark, SF_DIR, "documents")
    rows = sampling.q_split_train_test(spark, SF_DIR).collect()
    assert sum(r.n_docs for r in rows) == docs.count()
    splits = {r.split for r in rows}
    assert splits == {"train", "val", "test"}
    by_split = {}
    for r in rows:
        by_split[r.split] = by_split.get(r.split, 0) + r.n_docs
    # 90/5/5 within loose tolerance at fixture size
    assert by_split["train"] > 5 * max(by_split["val"], by_split["test"])


def test_split_assignment_is_append_stable(spark):
    """A document's split never depends on what else is in the corpus:
    computing the split over a half corpus and the full corpus agrees on
    the shared rows (the anti-contamination property)."""
    docs = load_table(spark, SF_DIR, "documents")
    half = docs.filter(F.col("doc_id") % 2 == 0)
    expr = F.expr(sampling._SPLIT_CASE).alias("split")
    full_map = {
        r.doc_id: r.split for r in docs.select("doc_id", expr).collect()
    }
    for r in half.select("doc_id", expr).collect():
        assert full_map[r.doc_id] == r.split


def test_mix_rates_respected(spark):
    docs = load_table(spark, SF_DIR, "documents")
    totals = {r.lang: r.cnt for r in docs.groupBy("lang").agg(F.count("*").alias("cnt")).collect()}
    for r in sampling.q_mix_weighted(spark, SF_DIR).collect():
        nominal = totals[r.lang] * r.rate_bps / 10000
        assert r.n_kept <= totals[r.lang]
        # ±5 sigma around the nominal per-lang rate
        import math

        p = r.rate_bps / 10000
        sigma = math.sqrt(totals[r.lang] * p * (1 - p)) if p < 1 else 0
        assert abs(r.n_kept - nominal) <= 5 * sigma + 1


def test_cap_per_group_bounds(spark):
    rows = sampling.q_cap_per_group(spark, SF_DIR).collect()
    per_lang = {}
    for r in rows:
        per_lang.setdefault(r.lang, []).append(r.rk)
    for lang, rks in per_lang.items():
        assert len(rks) <= sampling._CAP_PER_LANG
        assert sorted(rks) == list(range(1, len(rks) + 1))


def test_pack_bins_fill_invariants(spark):
    """Contiguous-fill packing: a bin's tokens never exceed capacity plus
    one straddling document, bins are densely numbered per shard, and
    every document's tokens are conserved."""
    docs = load_table(spark, SF_DIR, "documents")
    expected_tokens = docs.select(
        F.sum(F.expr(sampling._TOKENS_SPARK)).alias("t")
    ).collect()[0].t
    rows = sampling.q_pack_sequences(spark, SF_DIR).collect()
    assert sum(r.bin_tokens for r in rows) == expected_tokens
    max_doc_tokens = docs.select(
        F.max(F.expr(sampling._TOKENS_SPARK)).alias("m")
    ).collect()[0].m
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r)
        assert r.bin_tokens <= sampling._PACK_CAPACITY + max_doc_tokens
    for shard, bins in by_shard.items():
        ids = sorted(b.bin_id for b in bins)
        assert ids == list(range(len(ids)))  # dense, zero-based


def test_shuffle_rank_is_a_permutation(spark):
    docs = load_table(spark, SF_DIR, "documents")
    n = docs.count()
    rows = sampling.q_shuffle_global(spark, SF_DIR).collect()
    assert sorted(r.shuffle_rank for r in rows) == list(range(1, n + 1))
    assert len({r.doc_id for r in rows}) == n


# ------------------------------------------------------------------- plans


def test_sampling_filters_are_map_only_to_the_agg(spark):
    """The data-path of sample/mix is a scan+filter with NO exchange before
    the (tiny) audit aggregation's partial stage."""
    for fn in (sampling.q_sample_hash, sampling.q_mix_weighted):
        plan = physical_plan(fn(spark, SF_DIR))
        assert plan.count("Exchange") == 1  # only the final groupBy
        assert "SinglePartition" not in plan


def test_cap_plan_uses_window_group_limit(spark):
    plan = physical_plan(sampling.q_cap_per_group(spark, SF_DIR))
    assert "WindowGroupLimit" in plan  # top-K pushed below the sort
    assert "SinglePartition" not in plan


def test_shuffle_global_has_no_single_partition(spark):
    plan = physical_plan(sampling.q_shuffle_global(spark, SF_DIR))
    assert "SinglePartition" not in plan


def test_pack_plan_shard_parallel(spark):
    plan = physical_plan(sampling.q_pack_sequences(spark, SF_DIR))
    assert "SinglePartition" not in plan


def test_md5_bucket_matches_hashlib(spark):
    """The instr-arithmetic nibble decode must equal an independent
    hashlib computation — pins the cross-engine hash family to a third
    implementation."""
    import hashlib

    from pyspark.sql import Row

    vals = [0, 1, 42, 999_999, 2**40, 7]
    df = spark.createDataFrame([Row(doc_id=v) for v in vals])
    expr = sampling.md5_bucket_sql("doc_id", salt="t|", nhex=5)
    got = {
        r.doc_id: r.b
        for r in df.selectExpr("doc_id", f"{expr} AS b").collect()
    }
    for v in vals:
        expect = int(hashlib.md5(f"t|{v}".encode()).hexdigest()[:5], 16)
        assert got[v] == expect, v


def test_pack_sequences_shard_knob(spark):
    """More shards re-partition the work without losing tokens — the
    production scaling knob."""
    docs = load_table(spark, SF_DIR, "documents")
    base = sampling.pack_sequences(docs).collect()
    wide = sampling.pack_sequences(docs, n_shards=32).collect()
    assert sum(r.bin_tokens for r in base) == sum(r.bin_tokens for r in wide)
    assert len({r.shard for r in wide}) > len({r.shard for r in base})

"""Streaming ingest + compaction service loop: the landing layout stays
file-count-bounded while the stream runs, and content is lossless."""

import os

import pandas as pd


def _parquet_files(out_dir):
    by_part = {}
    for root, _dirs, files in os.walk(out_dir):
        if "=" not in os.path.basename(root):
            continue
        pq = [f for f in files if f.endswith(".parquet")]
        if pq:
            by_part[os.path.relpath(root, out_dir)] = len(pq)
    return by_part


def test_service_bounds_files_and_loses_nothing(spark, tmp_path):
    from rosbag2parquet_spark.streaming.compaction_service import (
        ingest_with_compaction,
    )

    land = tmp_path / "land"
    land.mkdir()
    # 4 micro-batches, each touching both partitions; a plain partitionBy
    # append would leave >= 4 files per partition
    rows_all = []
    for b in range(4):
        rows = [
            (b * 10 + i, "click" if i % 2 else "view", float(i))
            for i in range(6)
        ]
        rows_all += rows
        pd.DataFrame(rows, columns=["event_id", "event_type", "value"]).to_parquet(
            land / f"b{b}.parquet"
        )

    stream = (
        spark.readStream.schema("event_id long, event_type string, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(land))
    )
    out = str(tmp_path / "table")
    q = ingest_with_compaction(
        stream,
        out,
        str(tmp_path / "ckpt"),
        ["event_type"],
        max_files_per_partition=2,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    # bounded: every partition holds at most max_files (compaction rewrote
    # any that the 4 appends pushed past 2)
    counts = _parquet_files(out)
    assert set(counts) == {"event_type=click", "event_type=view"}
    assert all(n <= 2 for n in counts.values()), counts

    # lossless: the table equals the concatenated micro-batches
    got = {
        (r.event_id, r.event_type, r.value)
        for r in spark.read.parquet(out).collect()
    }
    assert got == set(rows_all)


def test_compact_is_idempotent_noop_below_threshold(spark, tmp_path):
    from rosbag2parquet_spark.streaming.compaction_service import (
        compact_fragmented_partitions,
    )

    out = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, "a"), (2, "b")], "event_id long, event_type string"
    )
    df.repartition(1).write.partitionBy("event_type").parquet(out)
    before = _parquet_files(out)
    assert compact_fragmented_partitions(
        spark, out, max_files_per_partition=8
    ) == []
    assert _parquet_files(out) == before


def test_interrupted_swap_repairs(spark, tmp_path):
    """Every crash window of the two-rename swap repairs on the next pass:
    (a) complete tmp + live gone -> finish; (b) old left beside live ->
    drop old; (c) incomplete tmp beside live -> drop tmp; data identical
    afterwards in all three."""
    import shutil

    from rosbag2parquet_spark.streaming.compaction_service import (
        _OLD_SUFFIX,
        _TMP_SUFFIX,
        compact_fragmented_partitions,
    )

    out = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, "a") for i in range(6)], "event_id long, event_type string"
    )
    df.repartition(3).write.partitionBy("event_type").parquet(out)
    part = os.path.join(out, "event_type=a")
    want = {r.event_id for r in spark.read.parquet(out).collect()}

    # (a) crashed between the renames: live missing, complete tmp + old
    # (a real swap writes tmp as its own Spark output root, so _SUCCESS
    # lives inside it — the completeness marker the repair keys on)
    shutil.copytree(part, part + _TMP_SUFFIX)
    open(os.path.join(part + _TMP_SUFFIX, "_SUCCESS"), "w").close()
    os.rename(part, part + _OLD_SUFFIX)
    compact_fragmented_partitions(spark, out, max_files_per_partition=99)
    assert os.path.isdir(part)
    assert not os.path.isdir(part + _TMP_SUFFIX)
    assert not os.path.isdir(part + _OLD_SUFFIX)
    assert {r.event_id for r in spark.read.parquet(out).collect()} == want

    # (b) crashed after the second rename: old copy left beside live
    shutil.copytree(part, part + _OLD_SUFFIX)
    compact_fragmented_partitions(spark, out, max_files_per_partition=99)
    assert not os.path.isdir(part + _OLD_SUFFIX)
    assert {r.event_id for r in spark.read.parquet(out).collect()} == want

    # (c) crashed mid-write: incomplete tmp (no _SUCCESS) beside live
    os.makedirs(part + _TMP_SUFFIX)
    with open(os.path.join(part + _TMP_SUFFIX, "x.parquet"), "wb") as f:
        f.write(b"garbage")
    compact_fragmented_partitions(spark, out, max_files_per_partition=99)
    assert not os.path.isdir(part + _TMP_SUFFIX)
    assert {r.event_id for r in spark.read.parquet(out).collect()} == want

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

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


def test_compact_noop_when_byte_target_exceeds_max_files(spark, tmp_path):
    """A partition whose BYTES legitimately need more files than
    max_files_per_partition must not be rewritten on every pass: the
    first call compacts to k = ceil(bytes/target); the second call sees
    len(files) == k > max_files and is a NO-OP (the r10 review's
    rewrite-forever case)."""
    from rosbag2parquet_spark.streaming.compaction_service import (
        compact_fragmented_partitions,
    )

    out = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, "a", "x" * 2000) for i in range(400)],
        "event_id long, event_type string, payload string",
    )
    df.repartition(12).write.partitionBy("event_type").parquet(out)
    assert _parquet_files(out)["event_type=a"] == 12
    # tiny byte target -> k well above max_files(4) but below 12
    nbytes = sum(
        os.path.getsize(os.path.join(out, "event_type=a", f))
        for f in os.listdir(os.path.join(out, "event_type=a"))
        if f.endswith(".parquet")
    )
    target = nbytes // 6  # k = ceil(n/(n/6)) ~ 6-7 > max_files=4
    first = compact_fragmented_partitions(
        spark, out, max_files_per_partition=4, target_file_bytes=target
    )
    assert first == ["event_type=a"]
    k = _parquet_files(out)["event_type=a"]
    assert 4 < k < 12
    # fixpoint: recompression can shift the byte total enough to lower k
    # by one more pass, but the loop must reach two consecutive no-ops
    # (pre-fix this rewrote the partition on EVERY pass forever)
    passes = 0
    while compact_fragmented_partitions(
        spark, out, max_files_per_partition=4, target_file_bytes=target
    ):
        passes += 1
        assert passes <= 2, "compaction did not reach a fixpoint"
    assert compact_fragmented_partitions(
        spark, out, max_files_per_partition=4, target_file_bytes=target
    ) == []
    # recompression may legitimately shrink bytes (and so k) below
    # max_files — the invariant is the fixpoint above, not the count
    assert _parquet_files(out)["event_type=a"] >= 1

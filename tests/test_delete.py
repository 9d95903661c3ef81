"""Copy-on-write DELETE WHERE (`sinks.delete_where`): only files that
CONTAIN matches are rewritten — untouched files stay byte-identical,
all-match files are removed outright, replacements are hidden dot-files
until the per-file atomic swap, and stale crash leftovers sweep on the
next run. The oracle-level value check is the `delete-rows` driver query."""

import hashlib
import os

from pyspark.sql import functions as F

from rosbag2parquet_spark.sinks import delete_where


def _files(root):
    out = {}
    for r, _d, fs in os.walk(root):
        for f in fs:
            if f.endswith(".parquet"):
                p = os.path.join(r, f)
                out[p] = hashlib.md5(open(p, "rb").read()).hexdigest()
    return out


def _mklayout(spark, path, partitioned=True):
    df = spark.range(400).select(
        F.col("id"),
        (F.col("id") % 4).cast("string").alias("grp"),
        (F.col("id") * 2.5).alias("v"),
    )
    w = df.repartitionByRange(4, "id").write
    if partitioned:
        w = w.partitionBy("grp")
    w.parquet(path)


def test_only_matching_files_rewritten(spark, tmp_path):
    lay = str(tmp_path / "lay")
    _mklayout(spark, lay)
    before = _files(lay)
    # ids 0..99 live in specific files; predicate hits a subset of files
    res = delete_where(spark, lay, F.col("id") < 50)
    after = _files(lay)

    assert res["rows_deleted"] == 50
    assert res["files_matched"] == res["files_rewritten"] + res["files_removed"]
    # ids are RANGE-partitioned into 4 task ranges then split by grp dir:
    # only the first range's files contain ids < 50 — everything else must
    # be byte-identical (rewritten files keep their path, so compare md5)
    changed = {p for p in set(before) & set(after) if before[p] != after[p]}
    removed = set(before) - set(after)
    assert len(changed) == res["files_rewritten"]
    assert len(removed) == res["files_removed"]
    assert 0 < res["files_matched"] < len(before)  # a strict file subset
    untouched = set(before) - changed - removed
    assert len(untouched) == len(before) - res["files_matched"]
    # values: complement select
    got = sorted(r.id for r in spark.read.parquet(lay).collect())
    assert got == list(range(50, 400))
    # no hidden leftovers
    assert not [
        f for r, _d, fs in os.walk(lay) for f in fs if f.endswith(".delnew")
    ]
    # re-run: nothing matches, pure no-op
    res2 = delete_where(spark, lay, F.col("id") < 50)
    assert res2 == {
        "files_matched": 0, "files_rewritten": 0,
        "files_removed": 0, "rows_deleted": 0,
    }
    assert _files(lay) == after


def test_all_match_file_removed_and_partition_predicate(spark, tmp_path):
    """A predicate on the hive PARTITION column matches every row of that
    partition's files — they are removed, not rewritten (the TTL shape:
    dropping an expired partition costs zero data writes)."""
    lay = str(tmp_path / "lay")
    _mklayout(spark, lay)
    res = delete_where(spark, lay, F.col("grp") == "2")
    assert res["rows_deleted"] == 100
    assert res["files_removed"] == res["files_matched"] > 0
    assert res["files_rewritten"] == 0
    left = spark.read.parquet(lay)
    assert left.filter(F.col("grp") == "2").count() == 0
    assert left.count() == 300


def test_stale_crash_leftovers_swept(spark, tmp_path):
    lay = str(tmp_path / "lay")
    _mklayout(spark, lay, partitioned=False)
    stale = os.path.join(lay, ".part-junk.parquet.delnew")
    open(stale, "wb").write(b"garbage from a crashed run")
    res = delete_where(spark, lay, F.col("id") == 7)
    assert not os.path.exists(stale)
    assert res["rows_deleted"] == 1
    assert spark.read.parquet(lay).count() == 399


def test_flat_layout_and_schema_fidelity(spark, tmp_path):
    """Non-partitioned layout: replacement files carry the original
    physical schema (pyarrow cast), so the surviving table reads back
    with identical dtypes."""
    lay = str(tmp_path / "lay")
    _mklayout(spark, lay, partitioned=False)
    before_types = dict(spark.read.parquet(lay).dtypes)
    delete_where(spark, lay, (F.col("id") % 10 == 0) & (F.col("v") < 500))
    df = spark.read.parquet(lay)
    assert dict(df.dtypes) == before_types
    deleted = [i for i in range(400) if i % 10 == 0 and i * 2.5 < 500]
    assert df.count() == 400 - len(deleted)
    assert df.filter((F.col("id") % 10 == 0) & (F.col("v") < 500)).count() == 0


def test_nullable_and_timestamp_fidelity(spark, tmp_path):
    """The rewrite is Arrow END-TO-END: nullable bigint columns (a pandas
    hop would degrade them to float64) and timestamp columns survive a
    delete with exact types and values."""
    from datetime import datetime, timezone

    lay = str(tmp_path / "lay")
    rows = [
        (i,
         None if i % 5 == 0 else i * 100,
         datetime(2024, 1, 1, 0, 0, i % 60, tzinfo=timezone.utc))
        for i in range(60)
    ]
    spark.createDataFrame(
        rows, "id bigint, maybe bigint, ts timestamp"
    ).repartitionByRange(3, "id").write.parquet(lay)
    before_types = dict(spark.read.parquet(lay).dtypes)

    res = delete_where(spark, lay, F.col("id") % 4 == 1)
    assert res["rows_deleted"] == 15
    df = spark.read.parquet(lay)
    assert dict(df.dtypes) == before_types
    got = {r.id: (r.maybe, r.ts) for r in df.collect()}
    assert len(got) == 45
    for i, (maybe, ts) in got.items():
        assert i % 4 != 1
        assert maybe == (None if i % 5 == 0 else i * 100)
        assert ts.second == i % 60


def test_vacuum_removes_artifacts_repairs_swaps(spark, tmp_path):
    """vacuum_layout removes exactly the known artifact classes
    (_temporary staging, orphan .crc, stale .delnew), REPAIRS an
    interrupted partition swap instead of deleting it (the .__compact_old
    dir may be the only live copy), leaves content untouched, and is
    idempotent."""
    import shutil

    from rosbag2parquet_spark.sinks import vacuum_layout

    lay = str(tmp_path / "lay")
    df = spark.range(40).selectExpr(
        "id", "CAST(id % 2 AS STRING) AS part"
    )
    df.write.partitionBy("part").parquet(lay)
    want = set(range(40))

    # plant the three removable classes
    os.makedirs(os.path.join(lay, "_temporary", "0"))
    open(os.path.join(lay, "_temporary", "0", "junk"), "w").write("x")
    open(os.path.join(lay, ".ghost.parquet.crc"), "w").write("x")
    open(os.path.join(lay, "part=0", ".p.parquet.delnew"), "w").write("x")
    # a KEPT .crc: Hadoop's LocalFileSystem already wrote real sidecars
    # for the data files (and validates them on read — planting a fake
    # one would poison the read, the exact failure stale sidecars cause)
    keep_crcs = [
        f for f in os.listdir(os.path.join(lay, "part=0"))
        if f.startswith(".") and f.endswith(".crc")
    ]
    assert keep_crcs
    # crash between the two swap renames: live dir moved away
    os.rename(
        os.path.join(lay, "part=1"),
        os.path.join(lay, "part=1.__compact_old"),
    )
    # an unknown file must NEVER be touched, hidden or not (hidden here
    # so Spark's reader also ignores it)
    open(os.path.join(lay, ".mystery.tmp"), "w").write("keep me")

    listed = vacuum_layout(lay, dry_run=True)
    assert len([p for p in listed if p.startswith("repair:")]) == 1
    assert os.path.isdir(os.path.join(lay, "part=1.__compact_old"))

    acted = vacuum_layout(lay)
    assert len(acted) == 4  # 3 removals + 1 repair
    assert not os.path.exists(os.path.join(lay, "_temporary"))
    assert not os.path.exists(os.path.join(lay, ".ghost.parquet.crc"))
    assert not os.path.exists(os.path.join(lay, "part=0", ".p.parquet.delnew"))
    assert os.path.isdir(os.path.join(lay, "part=1"))  # rolled back
    assert sorted(
        f for f in os.listdir(os.path.join(lay, "part=0"))
        if f.startswith(".") and f.endswith(".crc")
    ) == sorted(keep_crcs)
    assert os.path.exists(os.path.join(lay, ".mystery.tmp"))
    got = {r.id for r in spark.read.parquet(lay).collect()}
    assert got == want
    assert vacuum_layout(lay) == []


def test_vacuum_single_pass_and_repair_dedupe(spark, tmp_path):
    """Two advisor holes pinned: (1) a swap that left BOTH .__compact_tmp
    and .__compact_old for one partition reports ONE repair, keyed by the
    live root; (2) the .crc sidecar of a .delnew removed in the same pass
    is removed in that pass — vacuum is single-pass idempotent, a second
    run finds nothing."""
    import shutil

    from rosbag2parquet_spark.sinks import vacuum_layout
    from rosbag2parquet_spark.streaming.compaction_service import (
        _OLD_SUFFIX,
        _TMP_SUFFIX,
    )

    lay = str(tmp_path / "lay")
    df = spark.range(20).selectExpr("id", "CAST(id % 2 AS STRING) AS part")
    df.write.partitionBy("part").parquet(lay)

    # (1) both swap dirs for ONE partition: live moved to old, tmp staged
    os.rename(
        os.path.join(lay, "part=1"), os.path.join(lay, "part=1" + _OLD_SUFFIX)
    )
    shutil.copytree(
        os.path.join(lay, "part=1" + _OLD_SUFFIX),
        os.path.join(lay, "part=1" + _TMP_SUFFIX),
    )
    # (2) a stale .delnew WITH its own .crc sidecar
    open(os.path.join(lay, "part=0", ".p.parquet.delnew"), "w").write("x")
    open(os.path.join(lay, "part=0", "..p.parquet.delnew.crc"), "w").write("x")

    listed = vacuum_layout(lay, dry_run=True)
    repairs = [p for p in listed if p.startswith("repair:")]
    assert repairs == ["repair:" + os.path.join(lay, "part=1")]
    # dry run already reports the sidecar as removable
    assert any(p.endswith(".p.parquet.delnew.crc") for p in listed)

    acted = vacuum_layout(lay)
    assert [p for p in acted if p.startswith("repair:")] == repairs
    assert not os.path.exists(os.path.join(lay, "part=0", ".p.parquet.delnew"))
    assert not os.path.exists(
        os.path.join(lay, "part=0", "..p.parquet.delnew.crc")
    )
    assert os.path.isdir(os.path.join(lay, "part=1"))
    assert vacuum_layout(lay) == []  # single-pass: nothing left
    got = {r.id for r in spark.read.parquet(lay).collect()}
    assert got == set(range(20))

"""Snapshot manifest semantics beyond the driver gate's value match:
append invisibility, loud staleness refusal after in-place mutation,
metadata-file exclusion, partition-column derivation through the
explicit-file-list read, and vacuum leaving manifests alone."""

import json
import os

import pytest

from rosbag2parquet_spark.snapshots import (
    SNAPSHOT_DIR,
    read_snapshot,
    snapshot_create,
    snapshot_versions,
)


@pytest.fixture()
def layout(spark, tmp_path):
    lay = str(tmp_path / "lay")
    df = spark.createDataFrame(
        [(1, "a", 1.0), (2, "a", 2.0), (3, "b", 3.0)],
        "id long, part string, v double",
    )
    df.write.partitionBy("part").parquet(lay)
    return lay


def test_append_invisible_to_older_snapshot(spark, layout):
    v1 = snapshot_create(layout)
    spark.createDataFrame(
        [(4, "b", 4.0), (5, "c", 5.0)], "id long, part string, v double"
    ).write.mode("append").partitionBy("part").parquet(layout)
    v2 = snapshot_create(layout)
    assert snapshot_versions(layout) == [1, 2] and (v1, v2) == (1, 2)
    got1 = {r["id"] for r in read_snapshot(spark, layout, v1).collect()}
    got2 = {r["id"] for r in read_snapshot(spark, layout, v2).collect()}
    assert got1 == {1, 2, 3}
    assert got2 == {1, 2, 3, 4, 5}
    # partition column derives through the explicit-file-list read
    assert {r["part"] for r in read_snapshot(spark, layout, v2).collect()} == {
        "a",
        "b",
        "c",
    }


def test_manifest_excludes_metadata_files(layout):
    snapshot_create(layout)
    with open(os.path.join(layout, SNAPSHOT_DIR, "v1.json")) as f:
        files = [e["path"] for e in json.load(f)["files"]]
    assert files, "manifest must record the data files"
    assert all(not os.path.basename(p).startswith(("_", ".")) for p in files)
    assert all(SNAPSHOT_DIR not in p for p in files)
    # _SUCCESS exists in the layout but never in the manifest
    assert os.path.exists(os.path.join(layout, "_SUCCESS"))


def test_stale_snapshot_refused(spark, layout, tmp_path):
    v1 = snapshot_create(layout)
    with open(os.path.join(layout, SNAPSHOT_DIR, "v1.json")) as f:
        paths = [e["path"] for e in json.load(f)["files"]]
    # in-place rewrite (the delete/compact shape): replace one recorded
    # file with a VALID same-schema parquet file of a different size,
    # dropping the stale Hadoop .crc sidecar like our own swap writers do
    import glob

    donor_dir = str(tmp_path / "donor")
    spark.range(500).selectExpr("id", "CAST(id AS DOUBLE) AS v").coalesce(
        1
    ).write.parquet(donor_dir)
    donor = glob.glob(os.path.join(donor_dir, "part-*.parquet"))[0]
    victim = os.path.join(layout, paths[0])
    assert os.path.getsize(victim) != os.path.getsize(donor)
    with open(donor, "rb") as f:
        blob = f.read()
    with open(victim, "wb") as f:
        f.write(blob)
    crc = os.path.join(
        os.path.dirname(victim), f".{os.path.basename(victim)}.crc"
    )
    if os.path.exists(crc):
        os.remove(crc)
    with pytest.raises(ValueError, match="rewritten"):
        read_snapshot(spark, layout, v1)
    # verify=False is the caller's explicit opt-out: the replacement is
    # valid parquet, so the read plans and returns the CURRENT bytes
    assert read_snapshot(spark, layout, v1, verify=False).count() >= 500
    # removal refuses too
    os.remove(victim)
    with pytest.raises(ValueError, match="missing"):
        read_snapshot(spark, layout, v1)


def test_unknown_version_lists_available(spark, layout):
    snapshot_create(layout)
    with pytest.raises(ValueError, match=r"no snapshot v9 \(have \[1\]\)"):
        read_snapshot(spark, layout, 9)
    with pytest.raises(ValueError, match="no snapshot"):
        read_snapshot(spark, str(layout) + "_nope", 1)


def test_vacuum_leaves_manifests_alone(spark, layout):
    from rosbag2parquet_spark.sinks import vacuum_layout

    snapshot_create(layout)
    removed = vacuum_layout(layout)
    assert not any(SNAPSHOT_DIR in p for p in removed)
    assert read_snapshot(spark, layout, 1).count() == 3


def test_delete_where_invalidates_snapshot(spark, tmp_path):
    """The lifecycle contract against the REAL in-place mutator (not a
    synthetic byte-poke): delete_where rewrites match-bearing files, so an
    earlier snapshot must REFUSE afterward — and a fresh snapshot taken
    post-delete reads the surviving rows fine."""
    from pyspark.sql import functions as F

    from rosbag2parquet_spark.sinks import delete_where

    lay = str(tmp_path / "lay")
    spark.range(100).selectExpr(
        "id", "CAST(id % 7 AS LONG) AS bucket", "CAST(id AS DOUBLE) AS v"
    ).repartition(4).write.parquet(lay)
    v1 = snapshot_create(lay)
    assert read_snapshot(spark, lay, v1).count() == 100

    delete_where(spark, lay, F.col("bucket") == 3)

    with pytest.raises(ValueError, match="invalidated"):
        read_snapshot(spark, lay, v1)
    v2 = snapshot_create(lay)
    got = read_snapshot(spark, lay, v2)
    assert got.count() == 100 - 14  # ids 3,10,...,94
    assert got.filter("bucket = 3").count() == 0


def test_same_size_rewrite_refused(spark, layout):
    """A byte-for-byte-length in-place rewrite passes a size-only check —
    the advisor's hole: a delete_where swap can land an equal-length
    file. The manifest records mtime_ns, so the rewrite still refuses."""
    v1 = snapshot_create(layout)
    # rewrite one data file in place with the SAME byte length
    target = None
    for root, dirs, fs in os.walk(layout):
        dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
        for f in fs:
            if not f.startswith(("_", ".")):
                target = os.path.join(root, f)
                break
        if target:
            break
    data = open(target, "rb").read()
    os.remove(target)
    with open(target, "wb") as fh:
        fh.write(data)  # same bytes, same size — new inode, new mtime
    with pytest.raises(ValueError, match="same size, new mtime"):
        read_snapshot(spark, layout, v1)


def test_legacy_manifest_without_mtime_still_reads(spark, layout):
    """Manifests written before mtime_ns was recorded (r7) must keep
    verifying on existence+size alone, not KeyError."""
    v1 = snapshot_create(layout)
    mp = os.path.join(layout, SNAPSHOT_DIR, f"v{v1}.json")
    m = json.load(open(mp))
    for e in m["files"]:
        e.pop("mtime_ns", None)
    json.dump(m, open(mp, "w"))
    assert read_snapshot(spark, layout, v1).count() == 3

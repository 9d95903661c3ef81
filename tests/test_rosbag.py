"""Golden rosbag 2.0 test — the reference's ``two_messages_test``
(rosbag2parquet_test.cpp:160-303) against the REAL public bag grammar:
write a spec-conformant 2-message Imu bag (uncompressed and BZ2), read it
through the rosbag DataSource, decode, convert, and assert the same golden
values/keys/contiguity the reference asserts."""

import pytest
from pyspark.sql import functions as F

from rosbag2parquet_spark.sources.baglike import ConnectionInfo
from rosbag2parquet_spark.sources.decode import decode_messages
from rosbag2parquet_spark.sources.rosbag import (
    read_rosbag,
    rosbag_connections_df,
    scan_rosbag,
    write_rosbag,
)
from tests.test_baglike import ANGVEL, FRAME, LINACC, QUAT, SEQ, STAMP, _imu_payload
from tests.test_msgdef import IMU_DEF

CONN = ConnectionInfo(
    conn_id=3,
    topic="/imu/data",
    datatype="sensor_msgs/Imu",
    md5sum="6a62c6daae103f4ff57a132d6f95cec2",
    msg_def=IMU_DEF,
)


@pytest.fixture(scope="module", params=["none", "bz2", "lz4"])
def bag_path(request, tmp_path_factory):
    path = str(
        tmp_path_factory.mktemp("rosbags") / f"two_messages_{request.param}.bag"
    )
    payload = _imu_payload(SEQ, STAMP, FRAME, QUAT, ANGVEL, LINACC)
    write_rosbag(
        path,
        [CONN],
        [(3, 3_000_000_004, payload), (3, 5_000_000_006, payload)],
        compression=request.param,
    )
    return path


def test_scan_connections_and_chunks(bag_path):
    conns, chunks = scan_rosbag(bag_path)
    assert len(conns) == 1 and len(chunks) == 1
    c = conns[0]
    assert (c.conn_id, c.topic, c.datatype, c.md5sum) == (
        3, "/imu/data", "sensor_msgs/Imu", CONN.md5sum,
    )
    assert "orientation" in c.msg_def


def test_messages_scan_order_and_time(spark, bag_path):
    rows = read_rosbag(spark, bag_path, num_partitions=2).orderBy("offset").collect()
    assert len(rows) == 2
    assert rows[0].time_ns == 3_000_000_004 and rows[1].time_ns == 5_000_000_006
    assert rows[0].conn_id == rows[1].conn_id == 3
    assert rows[0].offset < rows[1].offset


def test_golden_decode_values(spark, bag_path):
    """Reference assertions :283-301: header_seq, frame_id, stamp pair,
    orientation_w through the full distributed pipeline."""
    msgs = read_rosbag(spark, bag_path)
    conns = rosbag_connections_df(spark, bag_path).collect()[0]
    rows = decode_messages(msgs, conns.datatype, conns.msg_def).orderBy("offset").collect()
    assert len(rows) == 2
    for r in rows:
        assert r.header_seq == SEQ
        assert (r.header_stamp_sec, r.header_stamp_nsec) == STAMP
        assert r.header_frame_id == FRAME
        assert r.orientation_w == pytest.approx(0.44)
        assert r.linear_acceleration_z == pytest.approx(9.81)


def test_rosbag_to_parquet_end_to_end(spark, bag_path, tmp_path):
    """Full converter over a real bag: seqno contiguity 0,1 (ref :213-218),
    cross-table keys (ref :220-234), md5/msg_def round-trip (ref :236-244)."""
    import os

    from rosbag2parquet_spark.convert import convert

    msgs = read_rosbag(spark, bag_path)
    conns = rosbag_connections_df(spark, bag_path)
    stream = (
        msgs.join(F.broadcast(conns), msgs.conn_id == conns.connection_id)
        .select(
            F.col("offset").alias("event_id"),
            F.timestamp_micros(F.expr("time_ns div 1000")).alias("ts"),
            F.col("conn_id").alias("user_id"),
            F.col("datatype").alias("event_type"),
            F.length("data").cast("double").alias("value"),
            F.col("data").cast("string").alias("props"),
        )
    )
    out = str(tmp_path / "bagout")
    info = convert(spark, stream, out, order_cols=["event_id"])
    assert info.count == 2
    messages = spark.read.parquet(os.path.join(out, "Messages"))
    assert sorted(r.seqno for r in messages.collect()) == [0, 1]
    connections = spark.read.parquet(os.path.join(out, "Connections"))
    assert connections.count() == 1


def test_multi_chunk_partitioning(spark, tmp_path):
    """Chunks are the parallelism unit: a 10-chunk bag read with different
    partition counts yields identical content in bag order."""
    path = str(tmp_path / "many.bag")
    payload = _imu_payload(SEQ, STAMP, FRAME, QUAT, ANGVEL, LINACC)
    write_rosbag(
        path,
        [CONN],
        [(3, 1_000_000_000 + i, payload) for i in range(50)],
        compression="bz2",
        messages_per_chunk=5,
    )
    _, chunks = scan_rosbag(path)
    assert len(chunks) == 10
    a = read_rosbag(spark, path, num_partitions=1).collect()
    b = read_rosbag(spark, path, num_partitions=8).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert len(a) == 50
    ordered = sorted(a, key=lambda r: r.offset)
    assert [r.time_ns for r in ordered] == [1_000_000_000 + i for i in range(50)]


def test_callerid_latching_roundtrip(spark, tmp_path):
    """Reference records callerid per connection (FlattenedRosWriter.cpp:
    209-224; README.md:35-42 column list) — parse, surface in the
    Connections dim, and round-trip through the test writer."""
    path = str(tmp_path / "caller.bag")
    payload = _imu_payload(SEQ, STAMP, FRAME, QUAT, ANGVEL, LINACC)
    conn = ConnectionInfo(
        conn_id=7,
        topic="/imu/data",
        datatype="sensor_msgs/Imu",
        md5sum=CONN.md5sum,
        msg_def=IMU_DEF,
        callerid="/imu_node",
        latching="1",
    )
    write_rosbag(path, [conn], [(7, 10**9, payload)])
    conns, _ = scan_rosbag(path)
    assert (conns[0].callerid, conns[0].latching) == ("/imu_node", "1")
    row = rosbag_connections_df(spark, path).collect()[0]
    assert (row.callerid, row.latching) == ("/imu_node", "1")
    # absent fields stay NULL (SBAG parity: the dim schema is shared)
    write_rosbag(str(tmp_path / "nocaller.bag"), [CONN], [(3, 10**9, payload)])
    row2 = rosbag_connections_df(spark, str(tmp_path / "nocaller.bag")).collect()[0]
    assert row2.callerid is None and row2.latching is None


def test_large_chunk_scan_derived_shift(spark, tmp_path):
    """A chunk decompressing past 1 MiB is spec-conformant (rosbag's chunk
    threshold is configurable) — the scan-derived shift must accept it
    (the fixed 20-bit shift hard-failed; ADVICE r2)."""
    from rosbag2parquet_spark.sources.rosbag import offset_shift

    path = str(tmp_path / "bigchunk.bag")
    big_payload = bytes(range(256)) * 8192  # 2 MiB message
    write_rosbag(
        path,
        [CONN],
        [(3, 10**9 + i, big_payload) for i in range(3)],
        compression="bz2",
        messages_per_chunk=2,  # first chunk decompresses to >4 MiB
    )
    _, chunks = scan_rosbag(path)
    shift = offset_shift(chunks)
    assert shift > 20 and max(c.size for c in chunks) < (1 << shift)
    rows = read_rosbag(spark, path, num_partitions=2).orderBy("offset").collect()
    assert [r.time_ns for r in rows] == [10**9, 10**9 + 1, 10**9 + 2]
    assert all(len(r.data) == len(big_payload) for r in rows)


def test_unindexed_bag_connection_fallback(spark, tmp_path):
    """Crashed-recorder bag (index region missing): connections must be
    harvested from inside the chunks instead of silently yielding zero
    (which made convert_bag write orphan Messages rows; ADVICE r2)."""
    path = str(tmp_path / "unindexed.bag")
    payload = _imu_payload(SEQ, STAMP, FRAME, QUAT, ANGVEL, LINACC)
    write_rosbag(path, [CONN], [(3, 10**9 + i, payload) for i in range(4)])
    # truncate the trailing index region (everything after the last chunk):
    # re-scan to find where chunks end, then cut the file there
    conns_full, chunks = scan_rosbag(path)
    import struct as _s

    with open(path, "rb") as f:
        f.seek(chunks[-1].pos)
        (hlen,) = _s.unpack("<I", f.read(4))
        f.seek(chunks[-1].pos + 4 + hlen)
        (dlen,) = _s.unpack("<I", f.read(4))
        end = chunks[-1].pos + 4 + hlen + 4 + dlen
        f.seek(0)
        head = f.read(end)
    with open(path, "wb") as f:
        f.write(head)
    conns, chunks2 = scan_rosbag(path)
    assert len(chunks2) == len(chunks)
    assert [c.conn_id for c in conns] == [c.conn_id for c in conns_full]
    assert conns[0].msg_def == IMU_DEF
    # a bag with chunks but NO connection records anywhere is an error,
    # not a silent empty dim
    bad = str(tmp_path / "noconn.bag")
    write_rosbag(bad, [], [])
    import rosbag2parquet_spark.sources.rosbag as rb

    raw = open(bad, "rb").read()
    # hand-append a message-only chunk with no connection record
    inner = rb._record(
        {"op": bytes([rb.OP_MSG]), "conn": _s.pack("<I", 1),
         "time": _s.pack("<II", 1, 0)},
        b"x",
    )
    chunk = rb._record(
        {"op": bytes([rb.OP_CHUNK]), "compression": b"none",
         "size": _s.pack("<I", len(inner))},
        inner,
    )
    open(bad, "wb").write(raw + chunk)
    with pytest.raises(ValueError, match="reindex"):
        scan_rosbag(bad)


def test_corrupt_magic_rejected(tmp_path):
    p = tmp_path / "bad.bag"
    p.write_bytes(b"#ROSBAG V1.2\n" + b"\x00" * 64)
    with pytest.raises(ValueError, match="not a rosbag 2.0"):
        scan_rosbag(str(p))


def test_cli_converts_real_bag(spark, tmp_path, capsys):
    """`python -m rosbag2parquet_spark --input x.bag --outdir ...` — the
    reference's main() surface over an actual rosbag 2.0 file."""
    import os

    from rosbag2parquet_spark.__main__ import main

    path = str(tmp_path / "cli.bag")
    payload = _imu_payload(SEQ, STAMP, FRAME, QUAT, ANGVEL, LINACC)
    write_rosbag(
        path,
        [CONN],
        [(3, 10**9 + i, payload) for i in range(4)],
        compression="bz2",
    )
    out = str(tmp_path / "cliout")
    rc = main(["--input", path, "--outdir", out])
    assert rc == 0
    assert "4 messages" in capsys.readouterr().out
    msgs = spark.read.parquet(os.path.join(out, "Messages"))
    assert sorted(r.seqno for r in msgs.collect()) == [0, 1, 2, 3]


def test_cli_info_real_bag(tmp_path, capsys, spark):
    from rosbag2parquet_spark.__main__ import main

    path = str(tmp_path / "info.bag")
    payload = _imu_payload(SEQ, STAMP, FRAME, QUAT, ANGVEL, LINACC)
    write_rosbag(path, [CONN], [(3, 10**9 + i, payload) for i in range(3)])
    assert main(["info", "--input", path]) == 0
    out = capsys.readouterr().out
    assert "TOTAL: 3 msgs" in out and "sensor_msgs/Imu" in out


def test_truncated_bag_fails_loudly(tmp_path):
    import struct
    """Every truncation point must raise a clear ValueError — never a
    silent partial scan (the reference's rosbag::View throws too)."""
    import pytest

    from rosbag2parquet_spark.sources.rosbag import scan_rosbag, write_rosbag

    p = str(tmp_path / "t.bag")
    write_rosbag(
        p,
        [ConnectionInfo(1, "/t", "demo/T", "m", "uint32 x")],
        [(1, 100, struct.pack("<I", 5))],
    )
    data = open(p, "rb").read()
    for cut in (20, 100, len(data) // 2, len(data) - 3):
        q = str(tmp_path / f"cut{cut}.bag")
        with open(q, "wb") as f:
            f.write(data[:cut])
        with pytest.raises(ValueError, match="truncated|corrupt"):
            scan_rosbag(q)


_PRUNE_CONNS = [
    ConnectionInfo(1, "/a", "demo/A", "m1", "uint32 x\n"),
    ConnectionInfo(2, "/b", "demo/B", "m2", "uint32 x\n"),
]


def test_chunk_info_stats_parsed(tmp_path):
    """The writer's ChunkInfo records surface as per-chunk pruning stats
    (time bounds + connection membership) in the scan."""
    from rosbag2parquet_spark.sources.rosbag import scan_rosbag, write_rosbag

    path = str(tmp_path / "ci.bag")
    t0 = 1_700_000_000_000_000_000
    msgs = [(1 + (i % 2), t0 + i * 1_000_000, b"x" * 8) for i in range(40)]
    write_rosbag(path, _PRUNE_CONNS, msgs, messages_per_chunk=10)
    _, chunks = scan_rosbag(path)
    assert len(chunks) == 4
    for k, c in enumerate(chunks):
        assert c.conn_ids == (1, 2)
        assert c.start_ns == t0 + k * 10 * 1_000_000
        assert c.end_ns == t0 + (k * 10 + 9) * 1_000_000


def test_rosbag_time_and_topic_pruning(spark, tmp_path):
    """start/end/conn_ids prune whole chunks from the ChunkInfo stats and
    the result equals the full read filtered after the fact."""
    from rosbag2parquet_spark.sources.rosbag import (
        prune_chunks,
        read_rosbag,
        scan_rosbag,
        write_rosbag,
    )

    path = str(tmp_path / "pr.bag")
    t0 = 1_700_000_000_000_000_000
    # chunks 0-1 are conn 1 only, chunks 2-3 conn 2 only
    msgs = [(1 if i < 20 else 2, t0 + i * 1_000_000, b"y" * 8) for i in range(40)]
    write_rosbag(path, _PRUNE_CONNS, msgs, messages_per_chunk=10)
    _, chunks = scan_rosbag(path)
    assert len(prune_chunks(chunks, None, None, conn_ids=[2])) == 2
    lo, hi = t0 + 5 * 1_000_000, t0 + 15 * 1_000_000
    assert len(prune_chunks(chunks, lo, hi)) == 2
    got = read_rosbag(
        spark, path, num_partitions=2, start_ns=lo, end_ns=hi
    ).orderBy("offset").collect()
    assert len(got) == 10 and all(lo <= r.time_ns < hi for r in got)
    got2 = read_rosbag(spark, path, num_partitions=2, conn_ids=[2])
    assert got2.count() == 20
    full = read_rosbag(spark, path, num_partitions=2)
    want = full.filter(full.conn_id == 2)
    assert got2.select("time_ns", "conn_id", "data").exceptAll(
        want.select("time_ns", "conn_id", "data")
    ).count() == 0


def test_rosbag_offsets_stable_across_filters(spark, tmp_path):
    """Pruning drops chunks but never renumbers them: a filtered read's
    offsets must equal the unfiltered read's offsets for the same rows
    (the MCAP contract — seqno stays stable across filters). Catches both
    chunk_index renumbering and a shift recomputed over the pruned list."""
    from rosbag2parquet_spark.sources.rosbag import read_rosbag, write_rosbag

    path = str(tmp_path / "stab.bag")
    t0 = 1_700_000_000_000_000_000
    msgs = [(1 + (i % 2), t0 + i * 1_000_000, b"z" * 8) for i in range(40)]
    write_rosbag(path, _PRUNE_CONNS, msgs, messages_per_chunk=10)
    full = {
        (r.time_ns, r.conn_id): r.offset
        for r in read_rosbag(spark, path, num_partitions=2).collect()
    }
    lo, hi = t0 + 12 * 1_000_000, t0 + 33 * 1_000_000
    filt = read_rosbag(
        spark, path, num_partitions=2, start_ns=lo, end_ns=hi
    ).collect()
    assert len(filt) == 21
    for r in filt:
        assert r.offset == full[(r.time_ns, r.conn_id)]
    by_conn = read_rosbag(spark, path, num_partitions=2, conn_ids=[2]).collect()
    assert len(by_conn) == 20
    for r in by_conn:
        assert r.offset == full[(r.time_ns, r.conn_id)]

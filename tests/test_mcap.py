"""MCAP source tests: container walk (chunked/unchunked, lz4/zstd),
embedded-schema Connections dim, CDR and ROS1 payloads, converter
end-to-end — no caller-supplied msgdefs anywhere (MCAP embeds them)."""

import struct

import pytest
from pyspark.sql import functions as F

from rosbag2parquet_spark.sources.baglike import ConnectionInfo, bag_format
from rosbag2parquet_spark.sources.mcap import (
    is_mcap,
    mcap_connections_df,
    mcap_serialization,
    read_mcap,
    scan_mcap,
    write_mcap,
)
from tests.test_rosbag2 import CDR_LE_HEADER, IMU_DEF, MSGDEFS, POSE_DEF
from tests.test_rosbag2 import encode_imu, encode_pose

CONNS = [
    ConnectionInfo(1, "/pose", "geometry_msgs/PoseLite", "", POSE_DEF),
    ConnectionInfo(2, "/imu", "sensor_msgs/ImuLite", "", IMU_DEF),
]


def _messages(n=40):
    t0 = 1_700_000_000_000_000_000
    out = []
    for i in range(n):
        if i % 2 == 0:
            p = encode_pose(i, 1_700_000_000 + i, i * 1000, "map",
                            i * 1.5, -i * 0.25, i % 7, f"wp{i}")
            out.append((1, t0 + i * 1_000_000, p))
        else:
            p = encode_imu(i, (0.1 * i, -0.2 * i, 9.81), "base")
            out.append((2, t0 + i * 1_000_000, p))
    return out


@pytest.fixture(scope="module", params=["none", "lz4", "zstd", "flat"])
def mcap_file(request, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("mcap") / f"robot_{request.param}.mcap")
    if request.param == "flat":
        write_mcap(path, CONNS, _messages(), chunked=False)
    else:
        write_mcap(
            path, CONNS, _messages(),
            chunked=True, compression="" if request.param == "none" else request.param,
            chunk_messages=7,
        )
    return path


def test_magic_and_format(mcap_file):
    assert is_mcap(mcap_file)
    assert bag_format(mcap_file) == "mcap"


def test_scan_dim(mcap_file):
    scan = scan_mcap(mcap_file)
    assert set(scan.channels) == {1, 2}
    assert scan.schemas[1][0] == "geometry_msgs/PoseLite"
    assert scan.schemas[1][2].decode() == POSE_DEF
    assert mcap_serialization(mcap_file) == "cdr"


def test_connections_df(spark, mcap_file):
    conns = mcap_connections_df(spark, mcap_file)
    rows = {r.connection_id: r for r in conns.collect()}
    assert rows[1].topic == "/pose" and rows[1].datatype == "geometry_msgs/PoseLite"
    assert rows[2].msg_def == IMU_DEF


def test_read_partitioned_matches_single(spark, mcap_file):
    df = read_mcap(spark, mcap_file, num_partitions=4)
    rows = df.orderBy("offset").collect()
    assert len(rows) == 40
    # bag order preserved by offset rank
    assert [r.conn_id for r in rows[:4]] == [1, 2, 1, 2]
    assert all(bytes(r.data).startswith(CDR_LE_HEADER) for r in rows[:2])
    one = read_mcap(spark, mcap_file, num_partitions=1)
    assert df.exceptAll(one).count() == 0 and one.exceptAll(df).count() == 0


def test_convert_bag_mcap(spark, mcap_file, tmp_path):
    from rosbag2parquet_spark.convert import convert_bag

    out = str(tmp_path / "out")
    info = convert_bag(spark, mcap_file, out)  # NO msgdefs needed
    assert info.count == 40
    msgs = spark.read.parquet(out + "/Messages").orderBy("seqno").collect()
    assert [m.seqno for m in msgs] == list(range(40))
    pose = spark.read.parquet(out + "/geometry_msgs_PoseLite").orderBy("seqno")
    r = pose.first()
    assert r.header_frame_id == "map" and r.label == "wp0"
    imu = spark.read.parquet(out + "/sensor_msgs_ImuLite")
    assert imu.count() == 20


def test_ros1_payloads_in_mcap(spark, tmp_path):
    """MCAP can carry ROS 1 serialization (message_encoding 'ros1',
    schema encoding 'ros1msg') — the converter dispatches the packed
    ROS 1 decoder for it."""
    from rosbag2parquet_spark.convert import convert_bag

    DEF = "uint32 seq\nstring label\n"
    conns = [ConnectionInfo(1, "/t", "test_msgs/Tiny", "", DEF)]

    def enc(i):
        lbl = f"m{i}".encode()
        return struct.pack("<I", i) + struct.pack("<I", len(lbl)) + lbl

    msgs = [(1, 1_000_000 + i, enc(i)) for i in range(10)]
    path = str(tmp_path / "ros1.mcap")
    write_mcap(path, conns, msgs, encoding="ros1", schema_encoding="ros1msg")
    assert mcap_serialization(path) == "ros1"
    out = str(tmp_path / "out")
    info = convert_bag(spark, path, out)
    assert info.count == 10
    t = spark.read.parquet(out + "/test_msgs_Tiny").orderBy("seqno").collect()
    assert [r.label for r in t] == [f"m{i}" for i in range(10)]


def test_mixed_chunked_flat_refused(tmp_path):
    path = str(tmp_path / "mixed.mcap")
    write_mcap(path, CONNS, _messages(6), chunked=True, chunk_messages=3)
    # append a top-level message record before the trailing magic
    raw = open(path, "rb").read()
    msg = bytes([0x05]) + struct.pack("<Q", 22 + 4) + struct.pack(
        "<HIQQ", 1, 0, 1, 1
    ) + b"xxxx"
    open(path, "wb").write(raw[:-8] + msg + raw[-8:])
    with pytest.raises(ValueError, match="mixes chunked"):
        scan_mcap(path)


def test_truncated_mcap_fails_loudly(tmp_path):
    path = str(tmp_path / "trunc.mcap")
    write_mcap(path, CONNS, _messages(10), chunked=True, chunk_messages=5)
    raw = open(path, "rb").read()
    open(path, "wb").write(raw[: len(raw) // 2])
    with pytest.raises(ValueError, match="truncated|not an MCAP"):
        scan_mcap(path)

"""Round-trip tests for the parquet-layout -> MCAP export (export.py):
bag -> tables -> bag -> tables must be lossless for messages, dims, and
attachments; multi-part export must preserve seqno order across parts."""

import os

import pytest
from pyspark.sql import functions as F

from rosbag2parquet_spark.convert import convert_bag, convert_bags
from rosbag2parquet_spark.export import export_mcap
from rosbag2parquet_spark.sources.mcap import scan_mcap, write_mcap
from tests.test_mcap import CONNS, _messages


def _table(spark, layout, name):
    return spark.read.parquet(os.path.join(layout, name))


def _message_tuples(spark, layout):
    """(topic, time_ns, payload) in seqno order — the grammar-independent
    content of a converted layout."""
    msgs = _table(spark, layout, "Messages")
    conns = _table(spark, layout, "Connections")
    rows = (
        msgs.join(conns, "connection_id")
        .orderBy("seqno")
        .select(
            "topic",
            (F.col("time_sec").cast("long") * 1_000_000_000
             + F.col("time_nsec")).alias("t"),
            "seqno",
        )
        .collect()
    )
    return [(r.topic, r.t) for r in rows]


def test_export_roundtrip_single_part(spark, tmp_path):
    bag = str(tmp_path / "orig.mcap")
    write_mcap(
        bag, CONNS, _messages(), chunked=True, chunk_messages=7,
        attachments=[(5, 3, "calib.yaml", "text/yaml", b"k: v\n")],
        metadata=[("recorder", {"ver": "1.2", "rig": "r9"}), ("blank", {})],
    )
    layout1 = str(tmp_path / "layout1")
    convert_bag(spark, bag, layout1)

    exp = str(tmp_path / "exported")
    info = export_mcap(spark, layout1, exp, parts=1)
    assert info.parts == 1 and info.count == 40

    # the exported part is indexed and self-describing: O(index) planning
    scan = scan_mcap(info.paths[0])
    assert scan.chunks and scan.channels

    layout2 = str(tmp_path / "layout2")
    convert_bag(spark, info.paths[0], layout2)

    assert _message_tuples(spark, layout1) == _message_tuples(spark, layout2)
    # typed tables decode identically (payloads carried verbatim)
    for t in ("geometry_msgs_PoseLite", "sensor_msgs_ImuLite"):
        a = _table(spark, layout1, t).orderBy("seqno").drop(
            "connection_id", "bag_index"
        )
        b = _table(spark, layout2, t).orderBy("seqno").drop(
            "connection_id", "bag_index"
        )
        assert a.collect() == b.collect()
    # the attachment rode along
    att = _table(spark, layout2, "Attachments").collect()
    assert [(r.name, bytes(r.data)) for r in att] == [
        ("calib.yaml", b"k: v\n")
    ]
    # ...and so did the named key-value Metadata records, including the
    # empty-map one (NULL key/value row keeps the record itself alive)
    want_md = {
        ("recorder", "rig", "r9"),
        ("recorder", "ver", "1.2"),
        ("blank", None, None),
    }
    for lay in (layout1, layout2):
        got = {
            (r.name, r.key, r.value)
            for r in _table(spark, lay, "Metadata").collect()
        }
        assert got == want_md, lay


def test_export_multi_part_fleet_roundtrip(spark, tmp_path):
    bag = str(tmp_path / "orig.mcap")
    write_mcap(bag, CONNS, _messages(), chunked=True, chunk_messages=7)
    layout1 = str(tmp_path / "layout1")
    convert_bag(spark, bag, layout1)

    exp = str(tmp_path / "exported")
    info = export_mcap(spark, layout1, exp, parts=3)
    assert info.parts == 3 and info.count == 40
    # parts split on seqno ranges: each part's time span precedes the next
    spans = []
    for p in info.paths:
        s = scan_mcap(p)
        spans.append(
            (min(c.start_time for c in s.chunks),
             max(c.end_time for c in s.chunks))
        )
    assert all(a[1] <= b[0] for a, b in zip(spans, spans[1:]))

    layout2 = str(tmp_path / "layout2")
    convert_bags(spark, info.paths, layout2)
    assert _message_tuples(spark, layout1) == _message_tuples(spark, layout2)


def test_export_empty_layout_refused(spark, tmp_path):
    layout = tmp_path / "empty"
    (layout / "Messages").mkdir(parents=True)
    with pytest.raises(ValueError, match="no per-type tables"):
        export_mcap(spark, str(layout), str(tmp_path / "out"))


def test_export_rosbag_roundtrip(spark, tmp_path):
    """Same round trip for the rosbag 2.0 grammar: .bag -> tables ->
    .bag parts -> tables, message content and typed decode preserved."""
    from rosbag2parquet_spark.export import export_rosbag
    from rosbag2parquet_spark.sources.rosbag import scan_rosbag, write_rosbag
    from tests.test_baglike import _imu_payload
    from tests.test_rosbag import CONN

    bag = str(tmp_path / "orig.bag")
    msgs = [
        (3, 1_000_000_000 + i * 1_000_000, _imu_payload(
            i, (1 + i, 0), "imu", (0.0, 0.1, 0.2, 1.0),
            (0.0, 0.0, 0.0), (0.0, 0.0, 9.81)))
        for i in range(12)
    ]
    write_rosbag(bag, [CONN], msgs, compression="none", messages_per_chunk=5)
    layout1 = str(tmp_path / "layout1")
    convert_bag(spark, bag, layout1)

    exp = str(tmp_path / "exported")
    info = export_rosbag(
        spark, layout1, exp, parts=2, compression="bz2",
        messages_per_chunk=4,
    )
    assert info.parts == 2 and info.count == 12
    # each part is indexed (ChunkInfo records present) and self-describing
    for p in info.paths:
        conns, chunks = scan_rosbag(p)
        assert len(conns) == 1 and chunks

    layout2 = str(tmp_path / "layout2")
    convert_bags(spark, info.paths, layout2)
    assert _message_tuples(spark, layout1) == _message_tuples(spark, layout2)
    a = _table(spark, layout1, "sensor_msgs_Imu").orderBy("seqno").drop(
        "connection_id", "bag_index")
    b = _table(spark, layout2, "sensor_msgs_Imu").orderBy("seqno").drop(
        "connection_id", "bag_index")
    assert a.collect() == b.collect()


def test_export_subset_filters(spark, tmp_path):
    """Topic + time-range subset export: only the selected messages land
    in the part file, and both predicates reach the parquet scans as
    pushed filters (a narrow export reads only matching row groups)."""
    from rosbag2parquet_spark.sources.mcap import write_mcap as _wm

    bag = str(tmp_path / "orig.mcap")
    _wm(bag, CONNS, _messages(), chunked=True, chunk_messages=7)
    layout = str(tmp_path / "layout")
    convert_bag(spark, bag, layout)

    t0 = 1_700_000_000_000_000_000
    exp = str(tmp_path / "exported")
    info = export_mcap(
        spark, layout, exp, parts=1,
        topics=["/pose"],
        start_ns=t0 + 10 * 1_000_000,   # from message 10 (inclusive)
        end_ns=t0 + 30 * 1_000_000,     # to message 30 (exclusive)
    )
    # /pose is the even-i half of 40 messages; i in [10, 30) -> 10 of them
    assert info.count == 10

    relayout = str(tmp_path / "relayout")
    convert_bag(spark, info.paths[0], relayout)
    rows = _table(spark, relayout, "Messages").join(
        _table(spark, relayout, "Connections"), "connection_id"
    ).select("topic", "time_nsec").collect()
    assert {r.topic for r in rows} == {"/pose"}
    assert all(10_000_000 <= r.time_nsec < 30_000_000 for r in rows)

    # unknown topic refused with an actionable error
    with pytest.raises(ValueError, match="no connection matches"):
        export_mcap(spark, layout, exp + "2", topics=["/nope"])


def test_export_db3_roundtrip(spark, tmp_path):
    """Third grammar: layout -> .db3 parts (self-describing via embedded
    Iron+ message_definitions) -> layout, lossless."""
    from rosbag2parquet_spark.export import export_db3

    bag = str(tmp_path / "orig.mcap")
    write_mcap(bag, CONNS, _messages(), chunked=True, chunk_messages=7)
    layout1 = str(tmp_path / "layout1")
    convert_bag(spark, bag, layout1)

    exp = str(tmp_path / "exported")
    info = export_db3(spark, layout1, exp, parts=2)
    assert info.parts == 2 and info.count == 40
    assert all(p.endswith(".db3") for p in info.paths)

    # each part converts back with NO caller msgdefs (embedded defs)
    layout2 = str(tmp_path / "layout2")
    convert_bags(spark, info.paths, layout2)
    assert _message_tuples(spark, layout1) == _message_tuples(spark, layout2)
    for t in ("geometry_msgs_PoseLite", "sensor_msgs_ImuLite"):
        a = _table(spark, layout1, t).orderBy("seqno").drop(
            "connection_id", "bag_index"
        )
        b = _table(spark, layout2, t).orderBy("seqno").drop(
            "connection_id", "bag_index"
        )
        assert a.collect() == b.collect()


def test_export_db3_recording_directory(spark, tmp_path):
    """as_recording=True makes the output a RECORDED rosbag2 directory:
    metadata.yaml manifests the shards in order with per-topic counts and
    time bounds, and the whole DIRECTORY converts back through the
    manifest path (convert_bag on the dir) losslessly."""
    import yaml

    from rosbag2parquet_spark.export import export_db3

    bag = str(tmp_path / "orig.mcap")
    write_mcap(bag, CONNS, _messages(), chunked=True, chunk_messages=7)
    layout1 = str(tmp_path / "layout1")
    convert_bag(spark, bag, layout1)

    exp = str(tmp_path / "recording")
    info = export_db3(spark, layout1, exp, parts=2, as_recording=True)
    assert info.parts == 2

    with open(os.path.join(exp, "metadata.yaml")) as f:
        meta = yaml.safe_load(f)["rosbag2_bagfile_information"]
    assert meta["relative_file_paths"] == ["part-00000.db3", "part-00001.db3"]
    assert meta["message_count"] == 40
    by_name = {
        t["topic_metadata"]["name"]: t["message_count"]
        for t in meta["topics_with_message_count"]
    }
    assert by_name == {"/pose": 20, "/imu": 20}
    t0 = 1_700_000_000_000_000_000
    assert meta["starting_time"]["nanoseconds_since_epoch"] == t0
    assert meta["duration"]["nanoseconds"] == 39 * 1_000_000

    # the DIRECTORY converts back via the manifest path
    layout2 = str(tmp_path / "layout2")
    convert_bag(spark, exp, layout2)
    assert _message_tuples(spark, layout1) == _message_tuples(spark, layout2)


def test_export_mcap_recording_directory(spark, tmp_path):
    """as_recording for the MCAP grammar (the Iron+ default storage):
    metadata.yaml manifests the .mcap shards, stats match the export's
    SUBSET filters (from each part task's own tally), and the directory
    converts back through the manifest path."""
    import yaml

    bag = str(tmp_path / "orig.mcap")
    write_mcap(bag, CONNS, _messages(), chunked=True, chunk_messages=7)
    layout1 = str(tmp_path / "layout1")
    convert_bag(spark, bag, layout1)

    t0 = 1_700_000_000_000_000_000
    exp = str(tmp_path / "recording")
    info = export_mcap(
        spark, layout1, exp, parts=2, as_recording=True,
        topics=["/imu"],
    )
    assert info.parts == 2 and info.count == 20

    with open(os.path.join(exp, "metadata.yaml")) as f:
        meta = yaml.safe_load(f)["rosbag2_bagfile_information"]
    assert meta["storage_identifier"] == "mcap"
    assert meta["relative_file_paths"] == [
        "part-00000.mcap", "part-00001.mcap",
    ]
    assert meta["message_count"] == 20
    by_name = {
        t["topic_metadata"]["name"]: t["message_count"]
        for t in meta["topics_with_message_count"]
    }
    # the subset filter is reflected: /pose exported 0 messages
    assert by_name == {"/imu": 20, "/pose": 0}
    assert meta["starting_time"]["nanoseconds_since_epoch"] == t0 + 1_000_000

    layout2 = str(tmp_path / "layout2")
    convert_bag(spark, exp, layout2)
    assert _message_tuples(spark, layout2) == [
        t for t in _message_tuples(spark, layout1) if t[0] == "/imu"
    ]


def test_export_edge_shapes(spark, tmp_path):
    """Edges the happy-path round trips don't hit: a connection with ZERO
    messages still rides the dim through export; parts exceeding the
    message count yields only non-empty part files; var-length payloads
    (strings) survive verbatim."""
    import struct

    from rosbag2parquet_spark.sources.baglike import ConnectionInfo, write_bag

    def s_payload(txt: bytes) -> bytes:
        return struct.pack("<I", len(txt)) + txt

    conns = [
        ConnectionInfo(1, "/talk", "demo/Str", "", "string s\n"),
        ConnectionInfo(2, "/silent", "demo/Str", "", "string s\n"),
    ]
    msgs = [(1, 10**18 + i * 1000, s_payload(b"x" * i)) for i in range(5)]
    bag = str(tmp_path / "edge.sbag")
    write_bag(bag, conns, msgs)
    layout1 = str(tmp_path / "l1")
    convert_bag(spark, bag, layout1)

    exp = str(tmp_path / "exp")
    info = export_mcap(
        spark, layout1, exp, parts=16,
        encoding="ros1", schema_encoding="ros1msg",
    )
    assert info.count == 5
    # no empty part files on disk
    assert info.parts == len(os.listdir(exp)) and info.parts <= 5
    for d in info.files:
        assert d["n"] >= 1

    layout2 = str(tmp_path / "l2")
    convert_bags(spark, info.paths, layout2)
    t1 = _table(spark, layout1, "demo_Str").orderBy("seqno").collect()
    t2 = _table(spark, layout2, "demo_Str").orderBy("seqno").collect()
    assert [r.s for r in t1] == [r.s for r in t2] == ["", "x", "xx", "xxx", "xxxx"]
    # the silent connection's channel survives the container round trip
    conns2 = _table(spark, layout2, "Connections").collect()
    assert {c.topic for c in conns2} == {"/talk", "/silent"}


def test_export_refusals(spark, tmp_path):
    """Driver-side refusals fire BEFORE any distributed work: a non-empty
    outdir (stale parts would double-count), and a .db3 export of an
    evolved layout (rosbag2's defs table is keyed per type)."""
    import struct

    from rosbag2parquet_spark.export import export_db3
    from rosbag2parquet_spark.sources.baglike import ConnectionInfo, write_bag

    bag = str(tmp_path / "o.mcap")
    write_mcap(bag, CONNS, _messages(), chunked=True, chunk_messages=7)
    layout = str(tmp_path / "lay")
    convert_bag(spark, bag, layout)

    exp = str(tmp_path / "exp")
    export_mcap(spark, layout, exp, parts=1)
    with pytest.raises(ValueError, match="not empty"):
        export_mcap(spark, layout, exp, parts=1)

    # evolved layout (two defs for one type) -> db3 refused with guidance
    from rosbag2parquet_spark.convert import convert_bags

    a = str(tmp_path / "a.sbag")
    write_bag(a, [ConnectionInfo(1, "/t", "demo/E", "m1", "uint32 a\n")],
              [(1, 10**18, struct.pack("<I", 1))])
    b = str(tmp_path / "b.sbag")
    write_bag(b, [ConnectionInfo(1, "/t", "demo/E", "m2",
                                 "uint32 a\nuint32 b\n")],
              [(1, 10**18 + 10**9, struct.pack("<II", 2, 3))])
    lay2 = str(tmp_path / "lay2")
    convert_bag(spark, a, lay2)
    convert_bags(spark, [b], lay2, mode="append", evolve=True)
    with pytest.raises(ValueError, match="multiple definition versions"):
        export_db3(spark, lay2, str(tmp_path / "exp2"))
    # ...but MCAP carries per-connection schemas: the same layout exports
    info = export_mcap(
        spark, lay2, str(tmp_path / "exp3"), parts=1,
        encoding="ros1", schema_encoding="ros1msg",
    )
    assert info.count == 2

"""JSON message-encoding tier (sources/jsonschema.py): MCAP channels with
schema encoding ``jsonschema`` + message encoding ``json`` decode to typed
tables ENTIRELY JVM-side (from_json), with the same flatten/column
conventions as the byte-walking tiers; unsupported schema constructs fall
back to blob-preserving conversion; export re-emits the schema verbatim."""

import json
import os

import pytest
from pyspark.sql import types as T

from rosbag2parquet_spark.convert import convert_bag
from rosbag2parquet_spark.export import export_mcap
from rosbag2parquet_spark.sources.baglike import ConnectionInfo
from rosbag2parquet_spark.sources.jsonschema import (
    JSON_DEF_PREFIX,
    spark_schema_from_jsonschema,
)
from rosbag2parquet_spark.sources.mcap import scan_mcap, write_mcap

SCHEMA = json.dumps(
    {
        "type": "object",
        "properties": {
            "seq": {"type": "integer"},
            "pose": {
                "type": "object",
                "properties": {
                    "x": {"type": "number"},
                    "y": {"type": "number"},
                },
            },
            "label": {"type": "string"},
            "ok": {"type": "boolean"},
            "samples": {"type": "array", "items": {"type": "number"}},
            "data": {"type": "string"},  # collides with the blob column
        },
    }
)

T0 = 1_700_000_000_000_000_000


def _conns():
    return [
        ConnectionInfo(1, "/telemetry", "demo.Telemetry", "",
                       JSON_DEF_PREFIX + SCHEMA)
    ]


def _payload(i, **over):
    d = {
        "seq": i,
        "pose": {"x": i * 0.5, "y": -i * 0.25},
        "label": f"s{i}",
        "ok": i % 2 == 0,
        "samples": [i * 1.0, i + 0.5],
        "data": f"inner{i}",
    }
    d.update(over)
    return json.dumps(d).encode()


def _msgs(n):
    return [(1, T0 + i * 1_000_000, _payload(i)) for i in range(n)]


def _write_json_mcap(path, msgs):
    # the writer sees the marker on msg_def and emits schema encoding
    # 'jsonschema' + channel message encoding 'json' on its own
    write_mcap(path, _conns(), msgs, chunk_messages=5)


def test_schema_compile_subset():
    st = spark_schema_from_jsonschema(SCHEMA)
    assert [f.name for f in st.fields] == [
        "seq", "pose", "label", "ok", "samples", "data"
    ]
    assert isinstance(st["pose"].dataType, T.StructType)
    assert st["seq"].dataType == T.LongType()
    assert st["samples"].dataType == T.ArrayType(T.DoubleType(), True)


@pytest.mark.parametrize(
    "doc",
    [
        {"type": "object"},  # no properties
        {"type": "object", "properties": {"a": {"type": "array",
         "items": {"type": "object", "properties": {"b": {"type": "integer"}}}}}},
        {"type": "object", "properties": {"a": {"$ref": "#/x"}}},
        "not json at all {",
    ],
)
def test_schema_compile_refuses_outside_subset(doc):
    text = doc if isinstance(doc, str) else json.dumps(doc)
    with pytest.raises(ValueError):
        spark_schema_from_jsonschema(text)


def test_json_mcap_converts_to_typed_table(spark, tmp_path):
    bag = str(tmp_path / "t.mcap")
    msgs = _msgs(12)
    # one payload omits a field -> typed NULL, like any other tier
    msgs[3] = (1, msgs[3][1], _payload(3, label=None))
    _write_json_mcap(bag, msgs)
    lay = str(tmp_path / "lay")
    info = convert_bag(spark, bag, lay)
    assert info.count == 12
    t = spark.read.parquet(os.path.join(lay, "demo_Telemetry"))
    # flatten + collision conventions: nested pose_x/pose_y, payload
    # field 'data' sanitized to 'data_' (the raw blob keeps 'data')
    assert {"seqno", "seq", "pose_x", "pose_y", "label", "ok", "samples",
            "data_", "connection_id", "data", "bag_index"} == set(t.columns)
    rows = {r.seq: r for r in t.collect()}
    assert rows[4].pose_x == 2.0 and rows[4].pose_y == -1.0
    assert rows[4].label == "s4" and rows[4].ok is True
    assert rows[4].samples == [4.0, 4.5]
    assert rows[4].data_ == "inner4"
    assert rows[3].label is None  # omitted field -> NULL
    assert bytes(rows[5].data) == _payload(5)  # raw blob preserved


def test_json_permissive_dead_letter(spark, tmp_path):
    bag = str(tmp_path / "p.mcap")
    msgs = _msgs(6)
    msgs[2] = (1, msgs[2][1], b"{definitely not json")
    _write_json_mcap(bag, msgs)
    lay = str(tmp_path / "lay")
    convert_bag(spark, bag, lay, on_error="permissive")
    t = spark.read.parquet(os.path.join(lay, "demo_Telemetry"))
    bad = [r for r in t.collect() if r._decode_error is not None]
    assert len(bad) == 1 and bad[0].seq is None
    assert bytes(bad[0].data) == b"{definitely not json"  # salvageable

    lay2 = str(tmp_path / "lay2")
    with pytest.raises(Exception):
        convert_bag(spark, bag, lay2)  # on_error='fail' FAILFASTs


def test_json_unsupported_schema_blob_preserves(spark, tmp_path):
    bag = str(tmp_path / "b.mcap")
    # arrays-of-objects schema: outside the subset -> blob-preserve
    hard = json.dumps({
        "type": "object",
        "properties": {"rows": {"type": "array", "items": {
            "type": "object", "properties": {"v": {"type": "integer"}}}}},
    })
    conns = [ConnectionInfo(1, "/hard", "demo.Hard", "", JSON_DEF_PREFIX + hard)]
    write_mcap(bag, conns, [(1, T0, b'{"rows": [{"v": 1}]}')],
               chunk_messages=5)
    lay = str(tmp_path / "lay")
    convert_bag(spark, bag, lay)
    t = spark.read.parquet(os.path.join(lay, "demo_Hard"))
    assert set(t.columns) == {"seqno", "connection_id", "data", "bag_index"}
    assert bytes(t.collect()[0].data) == b'{"rows": [{"v": 1}]}'


def test_json_export_roundtrip(spark, tmp_path):
    bag = str(tmp_path / "r.mcap")
    _write_json_mcap(bag, _msgs(10))
    lay1 = str(tmp_path / "lay1")
    convert_bag(spark, bag, lay1)

    exp = str(tmp_path / "exp")
    info = export_mcap(spark, lay1, exp, parts=1)
    scan = scan_mcap(info.paths[0])
    (schema,) = [scan.schemas[sid] for sid in scan.schemas]
    assert schema[1] == "jsonschema" and schema[2].decode() == SCHEMA
    (chan,) = [scan.channels[cid] for cid in scan.channels]
    assert chan[2] == "json"

    lay2 = str(tmp_path / "lay2")
    convert_bag(spark, info.paths[0], lay2)
    a = spark.read.parquet(os.path.join(lay1, "demo_Telemetry"))
    b = spark.read.parquet(os.path.join(lay2, "demo_Telemetry"))
    key = lambda r: r.seqno  # noqa: E731
    assert sorted(map(tuple, a.collect()), key=lambda t_: t_[0]) == sorted(
        map(tuple, b.collect()), key=lambda t_: t_[0]
    )

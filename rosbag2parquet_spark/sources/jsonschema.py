"""JSON message-encoding tier for MCAP channels (the Foxglove/websocket
recording shape beside ``protobuf``): Schema records with encoding
``jsonschema`` carry a JSON Schema document, Message payloads are UTF-8
JSON. Unlike the CDR/ros1/protobuf tiers — byte-walking decoders that
need a Python worker — JSON decodes ENTIRELY JVM-side: the JSON Schema
compiles to a Spark ``StructType`` and the payload goes through
``from_json`` inside whole-stage codegen. Zero Python in the row loop;
this tier is the engine's best case.

Supported JSON Schema subset (everything a telemetry recorder emits):
``object`` with ``properties`` (nested objects flatten to
``parent_child`` columns — the same convention as every other tier,
msgdef.py), ``integer`` → long, ``number`` → double, ``string``,
``boolean``, and ``array`` of those scalars (always native — JSON has no
fixed-width blob arrays, so the ``arrays`` mode does not apply).
Anything else (arrays of objects, unions, ``$ref``) raises at PLAN time,
and :func:`rosbag2parquet_spark.sources.mcap.mcap_connection_rows` falls
back to blob-preserving conversion for that channel — the same posture
as an unparseable protobuf descriptor.

Parity citation: the reference decodes only ros1 bags
(rosbag2parquet.cpp:1); this tier extends the same flatten/column
conventions to a third message grammar.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: msg_def marker the per-type decode dispatches on (the slot convention
#: shared with protobuf's base64 marker): marker + raw JSON Schema text
JSON_DEF_PREFIX = "__jsonschema__:"

_SCALARS = {
    "integer": T.LongType(),
    "number": T.DoubleType(),
    "string": T.StringType(),
    "boolean": T.BooleanType(),
}


def spark_schema_from_jsonschema(text: str) -> T.StructType:
    """Compile a JSON Schema document (the supported subset) to the nested
    Spark StructType ``from_json`` decodes with. Raises ``ValueError`` on
    any construct outside the subset — the caller treats that channel as
    blob-preserve-only."""
    try:
        doc = json.loads(text)
    except json.JSONDecodeError as e:
        raise ValueError(f"jsonschema: not valid JSON ({e})") from None
    return _object_type(doc, "$")


def _object_type(node: dict, path: str) -> T.StructType:
    if not isinstance(node, dict) or node.get("type") != "object":
        raise ValueError(f"jsonschema {path}: expected an object schema")
    props = node.get("properties")
    if not isinstance(props, dict) or not props:
        raise ValueError(f"jsonschema {path}: object without properties")
    fields = []
    for name, sub in props.items():
        fields.append(
            T.StructField(name, _field_type(sub, f"{path}.{name}"), True)
        )
    return T.StructType(fields)


def _field_type(node: dict, path: str) -> T.DataType:
    if not isinstance(node, dict):
        raise ValueError(f"jsonschema {path}: schema node must be an object")
    t = node.get("type")
    if t in _SCALARS:
        return _SCALARS[t]
    if t == "object":
        return _object_type(node, path)
    if t == "array":
        items = node.get("items")
        it = items.get("type") if isinstance(items, dict) else None
        if it not in _SCALARS:
            raise ValueError(
                f"jsonschema {path}: only arrays of scalars are supported"
            )
        return T.ArrayType(_SCALARS[it], True)
    raise ValueError(f"jsonschema {path}: unsupported type {t!r}")


def _flat_leaves(
    struct: T.StructType, path: "tuple[str, ...]" = (), flat: str = ""
) -> "list[tuple[tuple, str, T.DataType]]":
    """(field-name path, flat_name, type) leaves in schema order — the
    path navigates the parsed struct via getField (robust to names a dot
    string couldn't address), the flat name carries the underscore
    convention of the other tiers."""
    out = []
    for f in struct.fields:
        p = path + (f.name,)
        fl = f"{flat}{f.name}"
        if isinstance(f.dataType, T.StructType):
            out += _flat_leaves(f.dataType, path=p, flat=f"{fl}_")
        else:
            out.append((p, fl, f.dataType))
    return out


def decode_messages_json(
    df: DataFrame,
    datatype: str,
    msg_def: str,
    *,
    data_col: str = "data",
    keep_cols: tuple = (),
    arrays: str = "skip",
    unsigned: str = "signed",
    on_error: str = "fail",
) -> DataFrame:
    """Decode UTF-8 JSON payloads into flattened typed columns — pure
    Catalyst (``from_json`` + nested-field projection), no Python worker.
    ``arrays``/``unsigned`` are accepted for tier-signature parity and do
    not apply (JSON arrays are always native; JSON numbers carry no
    signedness). ``on_error='fail'`` parses FAILFAST (a malformed payload
    aborts the convert); ``'permissive'`` NULLs the typed columns and
    routes the reason to the ``_decode_error`` dead-letter column like the
    byte-walking tiers."""
    from rosbag2parquet_spark.sources.msgdef import _sanitize_flat_names

    text = msg_def[len(JSON_DEF_PREFIX):] if msg_def.startswith(
        JSON_DEF_PREFIX
    ) else msg_def
    struct = spark_schema_from_jsonschema(text)
    leaves = _flat_leaves(struct)
    sanitized = _sanitize_flat_names(
        [T.StructField(fl, t, True) for _p, fl, t in leaves]
    )
    if on_error == "fail":
        opts = {"mode": "FAILFAST"}
        parse_struct = struct
    else:
        # PERMISSIVE yields a struct of NULL FIELDS on malformed input
        # (not a NULL struct) — detection needs the corrupt-record column
        # declared inside the parse schema
        corrupt = "__corrupt__"
        while corrupt in {f.name for f in struct.fields}:
            corrupt += "_"
        opts = {
            "mode": "PERMISSIVE",
            "columnNameOfCorruptRecord": corrupt,
        }
        parse_struct = T.StructType(
            list(struct.fields)
            + [T.StructField(corrupt, T.StringType(), True)]
        )
    parsed = df.withColumn(
        "__parsed__",
        F.from_json(F.decode(F.col(data_col), "UTF-8"), parse_struct, opts),
    )
    cols = list(keep_cols)
    # positional: leaf i (by nested path) lands in sanitized name i — the
    # same walk-order invariant every other tier keeps
    for (path, _fl, _t), fld in zip(leaves, sanitized):
        c = F.col("__parsed__")
        for name in path:
            c = c.getField(name)
        cols.append(c.alias(fld.name))
    if on_error == "permissive":
        cols.append(
            F.when(
                F.col("__parsed__").getField(corrupt).isNotNull(),
                F.lit("malformed json payload"),
            ).alias("_decode_error")
        )
    return parsed.select(*cols)

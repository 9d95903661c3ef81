"""Message-definition-text → Spark StructType compiler (reference S4).

The reference learns each table's schema at runtime by parsing the ROS
message-definition text stored in the bag
(``RosIntrospection::buildROSTypeMapFromDefinition``, reference
MessageTable.cpp:316-320) and walking the type tree into a flat Parquet
schema (``toParquetSchema``, MessageTable.cpp:263-303). This module is the
same compiler as pure Python over ``pyspark.sql.types``:

- builtin scalars map through the promotion table (§1.3 of SURVEY.md;
  reference ``to_parquet_type`` MessageTable.cpp:228-260) — 1/2-byte ints
  promote to IntegerType, uint64 stored signed (documented relaxation,
  reference rosbag2parquet.cpp:36);
- ``time``/``duration`` decompose into ``<name>_sec``/``<name>_nsec``
  IntegerType pairs (reference MessageTable.cpp:284-292);
- constants (``int32 FOO=7``) are elided (reference MessageTable.cpp:58,274);
- arrays are skipped in parity mode (reference MessageTable.cpp:275-277 keeps
  them only inside the raw blob) or kept as ArrayType in spark mode — Spark
  has native arrays, an upgrade the reference explicitly couldn't do;
- nested message types flatten depth-first with ``parent_`` name prefixes
  (reference MessageTable.cpp:298-301, README.md:56-67).

The message-definition format itself is public ROS documentation: a def file
is ``type name`` lines; a bag-embedded definition concatenates the root type
with its dependencies, separated by ``===`` lines each introduced by
``MSG: <pkg>/<Type>``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import types as T

SEPARATOR = "=" * 80

#: builtin ROS type → (Spark type, promoted?) — SURVEY.md §1.3
BUILTIN_TYPES: dict[str, T.DataType] = {
    "bool": T.BooleanType(),
    "int8": T.IntegerType(),
    "uint8": T.IntegerType(),
    "byte": T.IntegerType(),
    "char": T.IntegerType(),
    "int16": T.IntegerType(),
    "uint16": T.IntegerType(),
    "int32": T.IntegerType(),
    "uint32": T.IntegerType(),
    "int64": T.LongType(),
    "uint64": T.LongType(),
    "float32": T.FloatType(),
    "float64": T.DoubleType(),
    "string": T.StringType(),
}

TIME_TYPES = {"time", "duration"}


@dataclass
class FieldSpec:
    name: str
    type_name: str
    is_array: bool = False
    array_len: int | None = None  # None = variable length


@dataclass
class MsgSpec:
    full_name: str
    fields: list[FieldSpec] = field(default_factory=list)


def _parse_single(full_name: str, text: str) -> MsgSpec:
    spec = MsgSpec(full_name)
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        parts = line.split(None, 1)
        if len(parts) != 2:
            continue
        type_tok, rest = parts
        if "=" in rest:
            continue  # constant `type NAME=value` — elided (reference MessageTable.cpp:58)
        name_tok = rest.split()[0]
        is_array, arr_len = False, None
        if type_tok.endswith("]"):
            base, _, dims = type_tok.partition("[")
            is_array = True
            dims = dims.rstrip("]")
            arr_len = int(dims) if dims else None
            type_tok = base
        spec.fields.append(FieldSpec(name_tok, type_tok, is_array, arr_len))
    return spec


def parse_msgdef(root_type: str, msgdef_text: str) -> dict[str, MsgSpec]:
    """Parse a bag-style concatenated definition into specs per type name.
    The first section is the root type; later sections start ``MSG: name``."""
    sections = msgdef_text.split(SEPARATOR)
    specs: dict[str, MsgSpec] = {}
    for i, section in enumerate(sections):
        body = section.strip("\n")
        name = root_type if i == 0 else None
        lines = body.splitlines()
        content_lines = []
        for line in lines:
            if line.startswith("MSG:"):
                name = line.split("MSG:", 1)[1].strip()
            else:
                content_lines.append(line)
        if name is None:
            continue
        specs[name] = _parse_single(name, "\n".join(content_lines))
    return specs


def _resolve(type_name: str, pkg: str, specs: dict[str, MsgSpec]) -> MsgSpec | None:
    """ROS name resolution: `Header` → std_msgs/Header; unqualified names
    resolve within the referencing package."""
    if type_name in specs:
        return specs[type_name]
    if type_name == "Header" and "std_msgs/Header" in specs:
        return specs["std_msgs/Header"]
    qualified = f"{pkg}/{type_name}"
    return specs.get(qualified)


def to_struct_type(
    root_type: str,
    specs: dict[str, MsgSpec],
    arrays: str = "skip",
    unsigned: str = "signed",
) -> T.StructType:
    """Compile the parsed specs into the flattened relational schema the
    reference emits (MessageTable.cpp:263-303): scalars promoted, times
    split, nested types flattened with ``parent_`` prefixes.

    arrays='skip'  — parity: array fields are not columnarized (reference
                     MessageTable.cpp:275-277).
    arrays='blobs' — parity PLUS uint8[]-family arrays extracted as
                     BinaryType columns: the multimodal-column mode — an
                     image/audio payload field becomes its own opaque
                     binary column beside the typed metadata (the
                     reference's own out-of-line wish, README.md:137).
    arrays='native' — spark mode: scalar-element arrays become ArrayType
                     columns, uint8[]-family stays a byte buffer
                     (BinaryType), and struct-element / time arrays remain
                     skipped (their flattening has no stable column shape) —
                     the upgrade the reference explicitly couldn't do
                     (README.md:126 "arrays not supported").

    unsigned='signed' — parity: uint32 stored as signed raw bits (the
                     reference's documented relaxation, rosbag2parquet.cpp:36
                     TODO "uint32/64 columns are stored as signed").
    unsigned='exact' — upgrade: uint32 promoted to LongType so values past
                     2^31 read correctly (a ROS Header.seq is uint32!), and
                     uint64 promoted to DECIMAL(20,0) — the only Spark
                     container that holds a u64 counter above 2^63 without
                     flipping negative — for SCALARS and (since r8) ARRAY
                     elements alike, closing the reference's signedness
                     bug entirely. (Before r8 array elements kept the
                     signed relaxation, which was not merely lossy but a
                     latent Arrow failure: the decoders already produced
                     unbounded unsigned ints in exact mode, and a value
                     past 2^63 against an array<long> schema dies in the
                     pandas→Arrow conversion.)
    """
    if unsigned not in ("signed", "exact"):
        raise ValueError(f"unsigned must be signed|exact, got {unsigned!r}")

    builtin = dict(BUILTIN_TYPES)
    if unsigned == "exact":
        # scalars AND array elements promote identically (r8): the decode
        # tiers read u64 unsigned in exact mode, so the type must hold
        # 2^63..2^64 wherever it appears
        builtin["uint32"] = T.LongType()
        builtin["uint64"] = T.DecimalType(20, 0)

    fields: list[T.StructField] = []

    def walk(spec: MsgSpec, prefix: str) -> None:
        pkg = spec.full_name.split("/")[0] if "/" in spec.full_name else ""
        for f in spec.fields:
            name = f"{prefix}{f.name}"
            if f.is_array:
                if arrays == "blobs":
                    if f.type_name in ("uint8", "byte", "char"):
                        fields.append(T.StructField(name, T.BinaryType(), False))
                    continue
                if arrays == "skip":
                    continue
                if f.type_name in ("uint8", "byte", "char"):
                    # uint8[] is a byte buffer, not a numeric list — the
                    # reference consumes it string-style (MessageTable.cpp:63-67)
                    fields.append(T.StructField(name, T.BinaryType(), False))
                    continue
                elem = builtin.get(f.type_name)
                if elem is None:
                    # time/duration and nested-struct arrays stay skipped in
                    # native mode: their decode has no stable column shape
                    # (the per-element flattening the reference also skips)
                    continue
                fields.append(T.StructField(name, T.ArrayType(elem), False))
                continue
            if f.type_name in TIME_TYPES:
                fields.append(T.StructField(f"{name}_sec", T.IntegerType(), False))
                fields.append(T.StructField(f"{name}_nsec", T.IntegerType(), False))
            elif f.type_name in builtin:
                fields.append(T.StructField(name, builtin[f.type_name], False))
            else:
                sub = _resolve(f.type_name, pkg, specs)
                if sub is None:
                    raise KeyError(f"unresolved type {f.type_name} in {spec.full_name}")
                walk(sub, f"{name}_")

    walk(specs[root_type], "")
    return T.StructType(_sanitize_flat_names(fields))


# the per-type table's metadata columns (table_schema below, reference
# MessageTable.cpp:305-343) plus the permissive-mode dead-letter column,
# the r11 write-time provenance stamp (a payload field named bag_index
# sanitizes to bag_index_ so the stamp — and the provenance reader's
# column dispatch — is unconditional), and the INTERNAL carrier names the
# decode frame rides alongside the flattened fields (reader keep_cols
# offset/time_ns/conn_id; the converter's __raw__/__bag_index__) — a
# payload field shadowing a carrier would otherwise duplicate a column
# in the decode output schema
RESERVED_COLUMNS = frozenset(
    {
        "seqno", "connection_id", "data", "_decode_error", "bag_index",
        "offset", "time_ns", "conn_id", "__raw__", "__bag_index__",
    }
)


def _sanitize_flat_names(fields: list) -> list:
    """Flattened payload columns must not capture the table's metadata
    columns: a root-level field named ``data`` (CompressedImage.data in
    blobs/native mode!) or a prefix-flatten collision like a nested
    ``connection.id`` → ``connection_id`` would make the final select
    ambiguous and break every reader of the layout. Colliding names —
    including duplicates among the flattened names themselves (field
    ``a_b`` beside nested ``a{b}``) — get trailing underscores until
    unique. Decode stays positional, so renaming here is the single
    source of truth for every decoder tier."""
    seen: set = set()
    out = []
    for f in fields:
        name = f.name
        while name in RESERVED_COLUMNS or name in seen:
            name += "_"
        seen.add(name)
        out.append(
            f if name == f.name else T.StructField(name, f.dataType, f.nullable)
        )
    return out


def table_schema(root_type: str, msgdef_text: str, arrays: str = "skip") -> T.StructType:
    """Full per-type table schema, reference layout (MessageTable.cpp:305-343):
    seqno, flattened message fields, connection_id, raw data blob."""
    specs = parse_msgdef(root_type, msgdef_text)
    flat = to_struct_type(root_type, specs, arrays)
    return T.StructType(
        [T.StructField("seqno", T.LongType(), False)]
        + list(flat.fields)
        + [
            T.StructField("connection_id", T.IntegerType(), False),
            T.StructField("data", T.BinaryType(), False),
        ]
    )


def table_name_for_type(datatype: str) -> str:
    """`sensor_msgs/Imu` → `sensor_msgs_Imu` (reference MessageTable.cpp:315);
    protobuf fq names sanitize the same way (`demo.Event` → `demo_Event`)."""
    return datatype.replace("/", "_").replace(".", "_")

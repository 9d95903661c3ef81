"""ROS 2 rosbag2 source: the modern bag container (.db3 = SQLite storage
plugin) with CDR-serialized payloads — widening S1 beyond the rosbag 1.x
grammar the reference supports (rosbag2parquet.cpp:44-47 consumes ROS 1
bags only; a ROS 2 user has no path through the reference at all).

Container (public rosbag2 sqlite3 storage schema): a SQLite file with
``topics(id, name, type, serialization_format, ...)`` and
``messages(id, topic_id, timestamp, data)``; messages are written in
recording order, so ``messages.id`` (the rowid) is the in-file order —
the analog of the byte offset our other sources expose.

Serialization (public OMG CDR / DDS XCDR1, little-endian): a 4-byte
encapsulation header ``{0x00, 0x01, options:u16}`` then the struct fields,
each primitive aligned to its size RELATIVE TO THE POST-HEADER ORIGIN;
strings are u32-length-prefixed INCLUDING a trailing NUL; sequences are
u32-count-prefixed. This differs from ROS 1 serialization (packed, no
alignment, string length excludes NUL) — hence a separate decoder that
walks the SAME parsed message-definition tree, so the flattened schema
(``to_struct_type``) is shared between both generations.

Schema self-description (the reference's core property — the definition
text travels INSIDE the container, FlattenedRosWriter.cpp:30-32 /
README.md:116-117): modern rosbag2 (sqlite storage schema v4, ROS 2
Iron+) embeds the concatenated definition text in a
``message_definitions(topic_type, encoding, encoded_message_definition)``
table with ``ros2msg``/``ros1msg`` encoding — the same
``====``-delimited syntax our parser already consumes for rosbag 1.x and
MCAP. When that table is present, no side channel is needed; older
(pre-Iron) bags carry no definitions, so the caller supplies
``msgdefs={datatype: definition_text}`` (caller-supplied entries override
embedded ones either way). For the builtin_interfaces types write the
fields out (``int32 sec`` / ``uint32 nanosec``).

Scale: the scan partitions the ``messages`` table by rowid range — each
task opens the SQLite file read-only (concurrent readers are safe) and
reads only its slice, so a multi-GB bag scans in parallel exactly like the
byte-range-partitioned binary sources.
"""

from __future__ import annotations

import os
import sqlite3
import struct
from collections.abc import Iterator
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from rosbag2parquet_spark.sources.msgdef import (
    TIME_TYPES,
    MsgSpec,
    _resolve,
    parse_msgdef,
    to_struct_type,
)

SQLITE_MAGIC = b"SQLite format 3\x00"

#: CDR little-endian encapsulation header (XCDR1)
CDR_LE_HEADER = b"\x00\x01\x00\x00"


@dataclass
class Rosbag2Topic:
    topic_id: int
    name: str
    datatype: str
    serialization_format: str


def is_rosbag2(path: str) -> bool:
    try:
        with open(path, "rb") as f:
            return f.read(16) == SQLITE_MAGIC
    except OSError:
        return False


def read_topics(path: str) -> list[Rosbag2Topic]:
    con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    try:
        rows = con.execute(
            "SELECT id, name, type, serialization_format FROM topics ORDER BY id"
        ).fetchall()
    finally:
        con.close()
    return [Rosbag2Topic(*r) for r in rows]


def rosbag2_dir_shards(path: str) -> "list[str] | None":
    """A recorded rosbag2 is a DIRECTORY: ``metadata.yaml`` plus one or
    more storage shards (rosbag2 splits on size/duration). Returns the
    shard paths in the RECORDED order (``relative_file_paths`` — the replay
    order, which alphabetical sorting does not guarantee), or None when
    ``path`` is not such a directory. Only the tiny yaml is read here —
    shard scanning stays with the per-file planners."""
    meta = os.path.join(path, "metadata.yaml")
    if not (os.path.isdir(path) and os.path.isfile(meta)):
        return None
    import yaml

    with open(meta) as f:
        doc = yaml.safe_load(f)
    info = (doc or {}).get("rosbag2_bagfile_information")
    if not isinstance(info, dict):
        raise ValueError(
            f"{meta}: no rosbag2_bagfile_information mapping — not a "
            "rosbag2 metadata.yaml"
        )
    rel = info.get("relative_file_paths")
    if not rel:
        raise ValueError(f"{meta}: empty relative_file_paths")
    shards = [os.path.join(path, r) for r in rel]
    missing = [s for s in shards if not os.path.isfile(s)]
    if missing:
        raise ValueError(f"{path}: metadata.yaml names missing shards {missing}")
    comp_fmt = (info.get("compression_format") or "").strip()
    comp_mode = (info.get("compression_mode") or "").strip().upper()
    if comp_fmt and comp_mode == "MESSAGE":
        # per-payload zstd frames: rewrite each shard once into a scratch
        # .db3 with decompressed blobs (driver-side, cached on identity) —
        # the same normalization `ros2 bag convert` performs; MESSAGE-mode
        # shards are size-capped by the recorder, so the one-time rewrite
        # is bounded per shard
        if comp_fmt != "zstd":
            raise ValueError(
                f"{path}: unsupported compression_format {comp_fmt!r} "
                "(rosbag2 ships zstd)"
            )
        return [_message_decompressed_shard(s) for s in shards]
    if comp_fmt:
        # FILE-mode compression (rosbag2's default when enabled): shards
        # are whole-file zstd frames (*.db3.zstd). sqlite can't read a
        # compressed file any more than `ros2 bag play` can — the player
        # decompresses to scratch first; we do the same, once per shard,
        # cached on (path, mtime, size) identity
        if comp_fmt != "zstd":
            raise ValueError(
                f"{path}: unsupported compression_format {comp_fmt!r} "
                "(rosbag2 ships zstd)"
            )
        shards = [_decompressed_shard(s) for s in shards]
    return shards


def _message_decompressed_shard(path: str) -> str:
    """Rewrite a MESSAGE-mode shard into scratch with every payload's zstd
    frame decompressed (schema and row ids preserved), cached on file
    identity like the FILE-mode path."""
    import hashlib
    import shutil
    import sqlite3 as _sq
    import tempfile

    import pyarrow as pa

    st = os.stat(path)
    tag = hashlib.md5(
        f"msg:{os.path.abspath(path)}:{st.st_mtime_ns}:{st.st_size}".encode()
    ).hexdigest()
    scratch = os.path.join(tempfile.gettempdir(), "rosbag2parquet_spark_zstd")
    os.makedirs(scratch, exist_ok=True)
    out = os.path.join(scratch, f"{tag}.db3")
    if os.path.isfile(out):
        return out
    # per-process unique temp name: two concurrent converters of the same
    # shard must never interleave writes into one .part file (whichever
    # os.replace lands last publishes an IDENTICAL result)
    fd, tmp = tempfile.mkstemp(suffix=".part", prefix=tag, dir=scratch)
    os.close(fd)
    shutil.copy(path, tmp)  # keeps topics/message_definitions/schema intact
    def _unzstd(blob: bytes) -> bytes:
        # streaming decode: zstd frames need no size hint this way
        with pa.input_stream(pa.BufferReader(blob), compression="zstd") as f:
            return bytes(f.read())

    con = _sq.connect(tmp)
    try:
        rows = con.execute("SELECT id, data FROM messages").fetchall()
        con.executemany(
            "UPDATE messages SET data = ? WHERE id = ?",
            ((_unzstd(blob), rid) for rid, blob in rows),
        )
        con.commit()
    finally:
        con.close()
    os.replace(tmp, out)
    return out


def _decompressed_shard(path: str) -> str:
    """Streaming-decompress a FILE-mode zstd shard into a scratch file
    (reused across runs via the same (path, mtime, size) identity the MCAP
    scan memo uses); returns the decompressed path."""
    import hashlib
    import tempfile

    import pyarrow as pa

    st = os.stat(path)
    tag = hashlib.md5(
        f"{os.path.abspath(path)}:{st.st_mtime_ns}:{st.st_size}".encode()
    ).hexdigest()
    scratch = os.path.join(
        tempfile.gettempdir(), "rosbag2parquet_spark_zstd"
    )
    os.makedirs(scratch, exist_ok=True)
    out = os.path.join(scratch, f"{tag}.db3")
    if os.path.isfile(out):
        return out
    # per-process unique temp name (see _message_decompressed_shard)
    fd, tmp = tempfile.mkstemp(suffix=".part", prefix=tag, dir=scratch)
    os.close(fd)
    with pa.input_stream(path, compression="zstd") as src, open(tmp, "wb") as dst:
        while True:
            chunk = src.read(1 << 22)
            if not chunk:
                break
            dst.write(chunk)
    os.replace(tmp, out)  # atomic publish — concurrent callers converge
    return out


def read_embedded_msgdefs(path: str) -> dict[str, str]:
    """Definition text embedded in the container (sqlite storage schema v4,
    ROS 2 Iron+): ``message_definitions(topic_type, encoding,
    encoded_message_definition)`` with ``ros2msg``/``ros1msg`` encoding —
    concatenated ``====``-delimited text, exactly what ``parse_msgdef``
    consumes. Returns {} for pre-Iron bags (no such table); unknown
    encodings (``ros2idl``) are skipped rather than failed so a mixed bag
    still resolves every type it can (the caller's msgdefs fill gaps)."""
    con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    try:
        tables = {
            r[0]
            for r in con.execute(
                "SELECT name FROM sqlite_master WHERE type='table'"
            )
        }
        if "message_definitions" not in tables:
            return {}
        rows = con.execute(
            "SELECT topic_type, encoding, encoded_message_definition "
            "FROM message_definitions ORDER BY id"
        ).fetchall()
    finally:
        con.close()
    out: dict[str, str] = {}
    for topic_type, encoding, text in rows:
        if encoding in ("ros2msg", "ros1msg") and text:
            out[topic_type] = text
    return out


def rosbag2_connections_df(
    spark: SparkSession, path: str, msgdefs: dict[str, str] | None = None
) -> DataFrame:
    """The Connections dim in the engine's 7-column shape (reference
    FlattenedRosWriter.cpp:209-224). md5sum/callerid/latching are padded ""
    — the sqlite3 storage schema carries none of them. Definition text is
    resolved embedded-first (``message_definitions`` table, Iron+) with
    caller-supplied ``msgdefs`` overriding/filling — so the common modern
    bag needs no side channel, matching the reference's
    schema-travels-in-the-bag property (README.md:116-117)."""
    topics = read_topics(path)
    resolved = read_embedded_msgdefs(path)
    resolved.update(msgdefs or {})
    msgdefs = resolved
    missing = sorted({t.datatype for t in topics} - set(msgdefs))
    if missing:
        raise ValueError(
            f"rosbag2 {path}: no message definition for {missing} — the bag "
            "embeds none (pre-Iron storage has no message_definitions "
            "table); pass msgdefs={type: text}"
        )
    from rosbag2parquet_spark.sources import attach_conn_rows

    rows = [
        (t.topic_id, t.name, t.datatype, "", msgdefs[t.datatype], "", "")
        for t in topics
    ]
    return attach_conn_rows(
        spark.createDataFrame(
            rows,
            "connection_id int, topic string, datatype string, md5sum string, "
            "msg_def string, callerid string, latching string",
        ),
        rows,
    )


_SCAN_SCHEMA = T.StructType(
    [
        T.StructField("offset", T.LongType(), False),
        T.StructField("time_ns", T.LongType(), False),
        T.StructField("conn_id", T.IntegerType(), False),
        T.StructField("data", T.BinaryType(), False),
    ]
)


def read_rosbag2(
    spark: SparkSession,
    path: str,
    num_partitions: int = 8,
    start_ns: "int | None" = None,
    end_ns: "int | None" = None,
    conn_ids: "list[int] | None" = None,
    start_offset: "int | None" = None,
) -> DataFrame:
    """(offset=rowid, time_ns, conn_id=topic_id, data) — the same scan
    schema every bag source emits, so seqno/demux/decode compose unchanged.
    Rowid-range partitioned: the driver reads only min/max(id); each task
    opens its own read-only connection and scans one contiguous slice.
    ``start_ns``/``end_ns`` and ``conn_ids`` (topic selection) push INTO
    the sqlite WHERE clause on both the driver's min/max probe and each
    task's slice query — the container's own b-tree does the skipping
    instead of Spark filtering rows it already paid to read.
    ``start_offset`` is the incremental-resume cursor (rowid >= cursor):
    sqlite rowids are append-stable, so a GROWING .db3 recording converts
    its delta via the primary-key b-tree — O(new rows), not O(bag)."""
    import pandas as pd

    path = os.path.abspath(path)
    if not is_rosbag2(path):
        raise ValueError(f"not a rosbag2 sqlite3 file: {path}")
    t_where = ""
    t_args: tuple = ()
    if start_offset is not None:
        t_where += " AND id >= ?"
        t_args += (int(start_offset),)
    if start_ns is not None:
        t_where += " AND timestamp >= ?"
        t_args += (int(start_ns),)
    if end_ns is not None:
        t_where += " AND timestamp < ?"
        t_args += (int(end_ns),)
    if conn_ids is not None:
        t_where += (
            " AND topic_id IN (" + ",".join("?" * len(conn_ids)) + ")"
        )
        t_args += tuple(int(c) for c in conn_ids)
    con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    try:
        lo, hi = con.execute(
            "SELECT min(id), max(id) FROM messages WHERE 1=1" + t_where,
            t_args,
        ).fetchone()
    finally:
        con.close()
    if lo is None:
        return spark.createDataFrame([], _SCAN_SCHEMA)
    n_parts = max(1, min(num_partitions, hi - lo + 1))
    step = (hi - lo + 1 + n_parts - 1) // n_parts
    ranges = [(lo + i * step, min(lo + (i + 1) * step, hi + 1)) for i in range(n_parts)]
    ranges_df = spark.createDataFrame(
        [r for r in ranges if r[0] < r[1]], "lo long, hi long"
    ).repartition(n_parts, "lo")

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for lo_i, hi_i in zip(pdf["lo"], pdf["hi"]):
                c = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
                try:
                    rows = c.execute(
                        "SELECT id, timestamp, topic_id, data FROM messages "
                        "WHERE id >= ? AND id < ?" + t_where + " ORDER BY id",
                        (int(lo_i), int(hi_i)) + t_args,
                    ).fetchall()
                finally:
                    c.close()
                if rows:
                    yield pd.DataFrame(
                        {
                            "offset": [r[0] for r in rows],
                            "time_ns": [r[1] for r in rows],
                            "conn_id": [r[2] for r in rows],
                            "data": [r[3] for r in rows],
                        }
                    )

    return ranges_df.mapInPandas(scan, schema=_SCAN_SCHEMA)


# ------------------------------------------------------------- CDR decode

_CDR_SCALAR = {
    "bool": ("<?", 1),
    "int8": ("<b", 1),
    "uint8": ("<B", 1),
    "byte": ("<B", 1),
    "char": ("<B", 1),
    "int16": ("<h", 2),
    "uint16": ("<H", 2),
    "int32": ("<i", 4),
    "uint32": ("<I", 4),
    "int64": ("<q", 8),
    "uint64": ("<Q", 8),
    "float32": ("<f", 4),
    "float64": ("<d", 8),
}


def cdr_fixed_layout(
    root_type: str,
    specs: dict[str, MsgSpec],
    arrays: str = "skip",
    unsigned: str = "signed",
):
    """Vectorized tier precondition: if every (kept or skipped) field is
    fixed-size under CDR — scalars, time pairs, fixed-length scalar arrays;
    no strings, no variable sequences — return a numpy structured dtype
    with EXPLICIT ALIGNED OFFSETS (alignment origin = post-encapsulation
    byte 0) whose itemsize is the exact per-message payload size. One
    ``np.frombuffer`` then decodes a whole Arrow batch with zero per-row
    Python — the same ~8× tier the ROS 1 decoder has. Returns None when
    any field is variable-size (the per-row walk is the fallback)."""
    import numpy as np

    np_fmt = {
        "bool": "?", "int8": "i1", "uint8": "u1", "byte": "u1", "char": "u1",
        "int16": "i2", "uint16": "u2", "int32": "i4",
        "uint32": "u4" if unsigned == "exact" else "i4",
        "int64": "i8",
        "uint64": "u8" if unsigned == "exact" else "i8",
        "float32": "f4", "float64": "f8",
    }
    # exact mode reads u64 unsigned for scalars AND array elements; the
    # shared schema carries DECIMAL(20,0) / array<DECIMAL(20,0)> (r8)
    size_of = {
        "bool": 1, "int8": 1, "uint8": 1, "byte": 1, "char": 1,
        "int16": 2, "uint16": 2, "int32": 4, "uint32": 4,
        "int64": 8, "uint64": 8, "float32": 4, "float64": 8,
    }
    names: list[str] = []
    formats: list = []
    offsets: list[int] = []
    pos = 0

    def align(p: int, size: int) -> int:
        return p + (-p) % min(size, 8)

    def walk(spec: MsgSpec, prefix: str) -> bool:
        nonlocal pos
        pkg = spec.full_name.split("/")[0] if "/" in spec.full_name else ""
        for f in spec.fields:
            name = f"{prefix}{f.name}"
            if f.is_array:
                if f.array_len is None or f.type_name not in size_of:
                    return False  # variable length / non-scalar elements
                sz = size_of[f.type_name]
                pos = align(pos, sz) if f.array_len else pos
                keep = (
                    arrays == "native"
                    and f.type_name not in ("uint8", "byte", "char")
                )
                if f.type_name in ("uint8", "byte", "char") and arrays in (
                    "blobs", "native"
                ):
                    return False  # bytes output — per-row builds the blob
                if keep:
                    names.append(name)
                    formats.append((f"<{np_fmt[f.type_name]}", (f.array_len,)))
                    offsets.append(pos)
                pos += f.array_len * sz
                continue
            if f.type_name in TIME_TYPES:
                pos = align(pos, 4)
                for part in ("sec", "nsec"):
                    names.append(f"{name}_{part}")
                    formats.append("<i4")
                    offsets.append(pos)
                    pos += 4
            elif f.type_name == "string":
                return False
            elif f.type_name in size_of:
                sz = size_of[f.type_name]
                pos = align(pos, sz)
                names.append(name)
                formats.append(f"<{np_fmt[f.type_name]}")
                offsets.append(pos)
                pos += sz
            else:
                sub = _resolve(f.type_name, pkg, specs)
                if sub is None or not walk(sub, f"{name}_"):
                    return False
        return True

    if not walk(specs[root_type], ""):
        return None
    return np.dtype({"names": names, "formats": formats, "offsets": offsets,
                     "itemsize": pos})


def cdr_variable_layout(
    root_type: str,
    specs: dict[str, MsgSpec],
    arrays: str = "skip",
    unsigned: str = "signed",
):
    """Op list for the VECTORIZED variable-stride CDR decoder — the same
    offset-scan tier the ROS 1 decoder has (decode.variable_layout), with
    one extra twist: every op carries its XCDR1 alignment, applied
    DYNAMICALLY per row (after a variable-length string the rel-to-origin
    position differs per row, so padding must be computed on the whole
    offset vector, one numpy op per field).

    Supported: fixed scalars, time pairs, strings, fixed/variable arrays of
    fixed-size elements (incl. the uint8[] blob shortcut), nested structs
    of the same. Returns None (→ per-row fallback) for string arrays and
    variable arrays of variable-size structs.

    Ops: ("fixed", name, dt, sz) | ("time", name) | ("string", name)
    | ("arr_fixed", name, dt, unit, cnt) | ("arr_var", name, dt, unit)
    | ("blob_fixed", name, cnt) | ("blob_var", name)
    | ("skip_fixed", nbytes, align) | ("skip_arr_var", unit)
    """
    np_fmt = {
        "bool": "<?", "int8": "<i1", "uint8": "<u1", "byte": "<u1",
        "char": "<u1", "int16": "<i2", "uint16": "<u2", "int32": "<i4",
        "uint32": "<u4" if unsigned == "exact" else "<i4",
        "int64": "<i8",
        "uint64": "<u8" if unsigned == "exact" else "<i8",
        "float32": "<f4", "float64": "<f8",
    }
    # exact mode reads u64 unsigned for scalars AND array elements; the
    # shared schema carries DECIMAL(20,0) / array<DECIMAL(20,0)> (r8)
    size_of = {
        "bool": 1, "int8": 1, "uint8": 1, "byte": 1, "char": 1,
        "int16": 2, "uint16": 2, "int32": 4, "uint32": 4,
        "int64": 8, "uint64": 8, "float32": 4, "float64": 8,
    }
    ops: list[tuple] = []

    def fixed_bytes_aligned(spec: MsgSpec) -> "tuple[int, int] | None":
        """(size, max_align) when the struct is fixed-size AND its size is a
        multiple of its own max alignment (so consecutive array elements
        need no inter-element padding the scan can't express)."""
        pkg = spec.full_name.split("/")[0] if "/" in spec.full_name else ""
        total, max_a = 0, 1
        for f in spec.fields:
            if f.type_name == "string" or (f.is_array and f.array_len is None):
                return None
            if f.type_name in TIME_TYPES:
                unit, a = 8, 4
            elif f.type_name in size_of:
                unit = size_of[f.type_name]
                a = min(unit, 8)
            else:
                sub = _resolve(f.type_name, pkg, specs)
                r = fixed_bytes_aligned(sub) if sub else None
                if r is None:
                    return None
                unit, a = r
            pad = (-total) % a
            total += pad + unit * (f.array_len if f.is_array else 1)
            max_a = max(max_a, a)
        if total % max_a:
            return None  # inter-element padding varies — per-row handles it
        return total, max_a

    def walk(spec: MsgSpec, prefix: str) -> bool:
        pkg = spec.full_name.split("/")[0] if "/" in spec.full_name else ""
        for f in spec.fields:
            name = f"{prefix}{f.name}"
            if f.is_array:
                is_bytes = f.type_name in ("uint8", "byte", "char")
                if is_bytes and arrays in ("blobs", "native"):
                    if f.array_len is None:
                        ops.append(("blob_var", name))
                    else:
                        ops.append(("blob_fixed", name, f.array_len))
                    continue
                if arrays == "native" and not is_bytes and f.type_name in np_fmt:
                    unit = size_of[f.type_name]
                    if f.array_len is None:
                        ops.append(("arr_var", name, np_fmt[f.type_name], unit))
                    else:
                        ops.append(
                            ("arr_fixed", name, np_fmt[f.type_name], unit,
                             f.array_len)
                        )
                    continue
                if f.type_name == "string":
                    return False  # string arrays → per-row fallback
                if f.type_name in size_of:
                    unit, a = size_of[f.type_name], min(size_of[f.type_name], 8)
                elif f.type_name in TIME_TYPES:
                    unit, a = 8, 4
                else:
                    sub = _resolve(f.type_name, pkg, specs)
                    r = fixed_bytes_aligned(sub) if sub else None
                    if r is None:
                        return False  # variable-size elements → fallback
                    unit, a = r
                if f.array_len is None:
                    ops.append(("skip_arr_var", unit, a))
                elif f.array_len:
                    ops.append(("skip_fixed", unit * f.array_len, a))
                continue
            if f.type_name in TIME_TYPES:
                ops.append(("time", name))
            elif f.type_name == "string":
                ops.append(("string", name))
            elif f.type_name in size_of:
                ops.append(("fixed", name, np_fmt[f.type_name],
                            size_of[f.type_name]))
            else:
                sub = _resolve(f.type_name, pkg, specs)
                if sub is None or not walk(sub, f"{name}_"):
                    return False
        return True

    return ops if walk(specs[root_type], "") else None


def make_cdr_vector_decoder(ops: list[tuple]):
    """Batch decoder over the compiled CDR ops: one numpy gather per FIELD.
    The running per-row offset vector is re-aligned before every field
    relative to the post-encapsulation origin (XCDR1) — `(-rel) % a` on the
    whole vector; only string/blob slicing touches Python per row. Trailing
    bytes are tolerated up to 7 per row (CDR writers may pad the buffer;
    the per-row walk ignores them too), more raises."""
    import numpy as np

    def decode_batch(bufs: list) -> dict:
        n = len(bufs)
        lens = np.fromiter((len(b) for b in bufs), dtype=np.int64, count=n)
        bounds = np.concatenate(([0], np.cumsum(lens)))
        raw = b"".join(bufs)
        data = np.frombuffer(raw, dtype=np.uint8)
        # vectorized twin of the per-row encapsulation gate (decode():
        # buf[1] in (0x01, 0x03)): a big-endian or malformed payload must
        # raise here too, never decode to garbage through the LE views
        if n:
            if int(lens.min()) < 4:
                raise ValueError(
                    "CDR payload shorter than the 4-byte encapsulation "
                    "header"
                )
            enc = data[bounds[:-1] + 1]
            if not np.isin(enc, (0x01, 0x03)).all():
                bad = int(np.flatnonzero(~np.isin(enc, (0x01, 0x03)))[0])
                raise ValueError(
                    "not a little-endian CDR payload (encapsulation "
                    f"byte 0x{int(enc[bad]):02x} in batch row {bad})"
                )
        origin = bounds[:-1] + 4  # alignment origin: post-encapsulation
        off = origin.copy()

        def align(a: int) -> None:
            nonlocal off
            if a > 1:
                off = off + ((-(off - origin)) % a)

        def gather(sz: int) -> "np.ndarray":
            return data[off[:, None] + np.arange(sz)]

        def u32_here() -> "np.ndarray":
            return gather(4).view("<u4").ravel().astype(np.int64)

        cols: dict = {}
        for op in ops:
            kind = op[0]
            if kind == "fixed":
                _, name, dt, sz = op
                align(min(sz, 8))
                cols[name] = gather(sz).view(dt).ravel()
                off = off + sz
            elif kind == "time":
                _, name = op
                align(4)
                pair = gather(8).view("<i4")
                cols[f"{op[1]}_sec"] = pair[:, 0].copy()
                cols[f"{op[1]}_nsec"] = pair[:, 1].copy()
                off = off + 8
            elif kind == "string":
                _, name = op
                align(4)
                ln = u32_here()  # CDR length INCLUDES the trailing NUL
                spos = off + 4
                ends = spos + ln
                e1 = np.maximum(ends - 1, spos)
                cols[name] = [
                    raw[s:e].decode()
                    for s, e in zip(spos.tolist(), e1.tolist())
                ]
                off = ends
            elif kind == "arr_fixed":
                _, name, dt, unit, cnt = op
                if cnt:
                    align(min(unit, 8))
                    mat = gather(unit * cnt).view(dt).reshape(n, cnt)
                    cols[name] = list(mat)
                    off = off + unit * cnt
                else:
                    cols[name] = [np.empty(0, dtype=dt)] * n
            elif kind == "arr_var":
                _, name, dt, unit = op
                align(4)
                cnt = u32_here()
                off = off + 4
                if unit > 1:
                    off = off + ((-(off - origin)) % min(unit, 8)) * (cnt > 0)
                ends = off + cnt * unit
                cols[name] = [
                    np.frombuffer(raw[s:e], dtype=dt)
                    for s, e in zip(off.tolist(), ends.tolist())
                ]
                off = ends
            elif kind == "blob_fixed":
                _, name, cnt = op
                ends = off + cnt
                cols[name] = [
                    raw[s:e] for s, e in zip(off.tolist(), ends.tolist())
                ]
                off = ends
            elif kind == "blob_var":
                _, name = op
                align(4)
                ln = u32_here()
                spos = off + 4
                ends = spos + ln
                cols[name] = [
                    raw[s:e] for s, e in zip(spos.tolist(), ends.tolist())
                ]
                off = ends
            elif kind == "skip_fixed":
                _, nbytes, a = op
                align(a)
                off = off + nbytes
            elif kind == "skip_arr_var":
                _, unit, a = op
                align(4)
                cnt = u32_here()
                off = off + 4
                if a > 1:
                    off = off + ((-(off - origin)) % a) * (cnt > 0)
                off = off + cnt * unit
        rem = bounds[1:] - off
        if np.any((rem < 0) | (rem > 7)):
            bad = int(np.argmax((rem < 0) | (rem > 7)))
            raise ValueError(
                f"CDR offset-scan consumed {int(off[bad] - bounds[bad])} of "
                f"{int(lens[bad])} bytes at row {bad}"
            )
        return cols

    return decode_batch


def make_cdr_decoder(
    root_type: str,
    specs: dict[str, MsgSpec],
    arrays: str = "skip",
    unsigned: str = "signed",
):
    """Compile decode(bytes) → tuple of flattened values under CDR rules,
    walking the same tree ``to_struct_type`` walks so positions match the
    shared schema. Alignment is relative to the post-encapsulation origin
    (XCDR1); ``unsigned='exact'`` keeps uint32 unsigned (the shared schema
    promotes it to LONG, same as the ROS 1 decoder)."""
    scalar = dict(_CDR_SCALAR)
    if unsigned == "signed":
        # store uint32 reinterpreted signed (the reference's relaxation,
        # rosbag2parquet.cpp:36) so both generations agree column-for-column
        scalar["uint32"] = ("<i", 4)
        scalar["uint64"] = ("<q", 8)
    # exact mode keeps _CDR_SCALAR's "<Q" for uint64: unbounded Python int,
    # carried as DECIMAL(20,0) by the shared schema

    def aligned(pos: int, size: int) -> int:
        rel = pos - 4  # alignment origin is after the 4-byte encapsulation
        return pos + (-rel) % min(size, 8)

    def read_string(buf: bytes, pos: int) -> tuple[str, int]:
        pos = aligned(pos, 4)
        (n,) = struct.unpack_from("<I", buf, pos)
        pos += 4
        # CDR length includes the trailing NUL
        s = buf[pos : pos + n - 1].decode() if n > 0 else ""
        return s, pos + n

    def skip_scalar_seq(f, buf: bytes, pos: int, n: int) -> int:
        fmt, sz = scalar.get(f.type_name, (None, None))
        if fmt is not None:
            if n:
                pos = aligned(pos, sz)
            return pos + n * sz
        if f.type_name == "string":
            for _ in range(n):
                _, pos = read_string(buf, pos)
            return pos
        raise KeyError(f"cannot skip CDR array of {f.type_name}")

    def decode_into(spec: MsgSpec, buf: bytes, pos: int, out: list) -> int:
        pkg = spec.full_name.split("/")[0] if "/" in spec.full_name else ""
        for f in spec.fields:
            if f.is_array:
                if f.array_len is None:
                    pos = aligned(pos, 4)
                    (n,) = struct.unpack_from("<I", buf, pos)
                    pos += 4
                else:
                    n = f.array_len
                if f.type_name in ("uint8", "byte", "char"):
                    blob = buf[pos : pos + n]
                    pos += n
                    if arrays in ("blobs", "native"):
                        out.append(blob)
                    continue
                if arrays == "native" and f.type_name in scalar and (
                    f.type_name not in TIME_TYPES
                ):
                    fmt, sz = scalar[f.type_name]
                    if n:
                        pos = aligned(pos, sz)
                    out.append(
                        list(struct.unpack_from(f"<{n}{fmt[1]}", buf, pos))
                        if n
                        else []
                    )
                    pos += n * sz
                    continue
                if arrays == "native" and f.type_name == "string":
                    vals = []
                    for _ in range(n):
                        s, pos = read_string(buf, pos)
                        vals.append(s)
                    out.append(vals)
                    continue
                pos = skip_scalar_seq(f, buf, pos, n)
                continue
            if f.type_name in TIME_TYPES:
                pos = aligned(pos, 4)
                sec, nsec = struct.unpack_from("<ii", buf, pos)
                out.extend((sec, nsec))
                pos += 8
            elif f.type_name == "string":
                s, pos = read_string(buf, pos)
                out.append(s)
            elif f.type_name in scalar:
                fmt, sz = scalar[f.type_name]
                pos = aligned(pos, sz)
                out.append(struct.unpack_from(fmt, buf, pos)[0])
                pos += sz
            else:
                sub = _resolve(f.type_name, pkg, specs)
                if sub is None:
                    raise KeyError(f"unresolved {f.type_name} in {spec.full_name}")
                pos = decode_into(sub, buf, pos, out)
        return pos

    root = specs[root_type]

    def decode(buf: bytes) -> tuple:
        if len(buf) < 4 or buf[1] not in (0x01, 0x03):
            raise ValueError(
                f"not a little-endian CDR payload (encapsulation {buf[:4]!r})"
            )
        out: list = []
        end = decode_into(root, buf, 4, out)
        # full-consumption check (reference MessageTable.cpp:38): an
        # overrunning string/sequence length silently yields short slices
        # in Python — catch it here; up to 7 trailing pad bytes allowed
        if end > len(buf) or len(buf) - end > 7:
            raise ValueError(
                f"CDR payload not fully consumed: walked to {end} of "
                f"{len(buf)} bytes"
            )
        return tuple(out)

    return decode


def decode_messages_cdr(
    df: DataFrame,
    root_type: str,
    msgdef_text: str,
    data_col: str = "data",
    keep_cols: tuple[str, ...] = ("offset", "time_ns", "conn_id"),
    arrays: str = "skip",
    unsigned: str = "signed",
    on_error: str = "fail",
) -> DataFrame:
    """CDR twin of :func:`sources.decode.decode_messages`: same flattened
    schema (shared ``to_struct_type``), same THREE-tier structure as the
    ROS 1 decoder: (1) fixed-stride — no variable-size field at all, CDR
    alignment makes the stride constant-with-padding, which a numpy
    EXPLICIT-OFFSET dtype expresses exactly (one ``frombuffer`` per Arrow
    batch, zero per-row Python); (2) vectorized offset-scan — strings/
    blobs/sequences of fixed-size elements, one numpy gather per FIELD with
    dynamic per-row alignment (``cdr_variable_layout``); (3) the per-row
    CDR walk for the rare shapes the scan can't express (string arrays,
    sequences of variable-size structs)."""
    import numpy as np
    import pandas as pd

    specs = parse_msgdef(root_type, msgdef_text)
    flat = to_struct_type(root_type, specs, arrays=arrays, unsigned=unsigned)
    decode = make_cdr_decoder(root_type, specs, arrays=arrays, unsigned=unsigned)
    np_dtype = cdr_fixed_layout(root_type, specs, arrays=arrays, unsigned=unsigned)
    vec_ops = (
        None
        if np_dtype is not None
        else cdr_variable_layout(root_type, specs, arrays=arrays, unsigned=unsigned)
    )
    vec_decode = make_cdr_vector_decoder(vec_ops) if vec_ops is not None else None
    if on_error == "permissive":
        # NULLable fields: salvaged bad rows carry NULLs where the strict
        # schema (reference Repetition::REQUIRED) forbids them
        flat = T.StructType(
            [T.StructField(f.name, f.dataType, True) for f in flat.fields]
        )
    extra = (
        [T.StructField("_decode_error", T.StringType(), True)]
        if on_error == "permissive"
        else []
    )
    out_schema = T.StructType(
        [df.schema[c] for c in keep_cols] + list(flat.fields) + extra
    )
    from rosbag2parquet_spark.sources.decode import (
        decimal_col_names,
        decimalize_cols,
    )

    flat_names = [f.name for f in flat.fields]
    dec_names, dec_arr_names = decimal_col_names(flat)

    def _decode_fast(pdf) -> dict:
        cols: dict = {}
        if np_dtype is not None:
            # drop each 4-byte encapsulation header, then one frombuffer
            buf = b"".join(bytes(b)[4:] for b in pdf[data_col])
            if len(buf) != np_dtype.itemsize * len(pdf):
                raise ValueError(
                    f"CDR fixed-stride mismatch: {len(buf)} bytes for "
                    f"{len(pdf)} x {np_dtype.itemsize}B payloads of "
                    f"{root_type}"
                )
            arr = np.frombuffer(buf, dtype=np_dtype)
            # positional remap: the layout walker emits ORIGINAL field
            # names; flat_names carry the reserved-collision sanitize
            # (msgdef._sanitize_flat_names) in the same walk order
            orig = [n for n in np_dtype.names if not n.startswith("__pad")]
            assert len(orig) == len(flat_names)
            for name, o in zip(flat_names, orig):
                v = arr[o]
                cols[name] = list(v) if v.ndim > 1 else v
        elif vec_decode is not None:
            decoded = vec_decode([bytes(b) for b in pdf[data_col]])
            assert len(decoded) == len(flat_names)
            for name, v in zip(flat_names, decoded.values()):
                cols[name] = v
        else:
            decoded = [decode(bytes(b)) for b in pdf[data_col]]
            for i, name in enumerate(flat_names):
                cols[name] = [row[i] for row in decoded]
        return cols

    def _decode_salvage(pdf) -> dict:
        per_col: dict = {n: [] for n in flat_names}
        errs = []
        for b in pdf[data_col]:
            try:
                row = decode(bytes(b))
            except Exception as exc:
                for n in flat_names:
                    per_col[n].append(None)
                errs.append(f"{type(exc).__name__}: {exc}")
            else:
                for i, n in enumerate(flat_names):
                    per_col[n].append(row[i])
                errs.append(None)
        per_col["_decode_error"] = errs
        return per_col

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            cols = {c: pdf[c].values for c in keep_cols}
            if on_error == "permissive":
                try:
                    fast = _decode_fast(pdf)
                    fast["_decode_error"] = [None] * len(pdf)
                    cols.update(fast)
                except Exception:
                    cols.update(_decode_salvage(pdf))
            else:
                cols.update(_decode_fast(pdf))
            decimalize_cols(cols, dec_names, dec_arr_names)
            yield pd.DataFrame(cols)

    sel = list(keep_cols) + ([data_col] if data_col not in keep_cols else [])
    return df.select(*sel).mapInPandas(run, schema=out_schema)


# ------------------------------------------------------------------ writer


def write_db3(
    path: str,
    connections: "list",
    messages: "list[tuple[int, int, bytes]]",  # (conn_id, time_ns, payload)
    *,
    serialization_format: str = "cdr",
    schema_encoding: str = "ros2msg",
) -> None:
    """Minimal self-describing (Iron+/v4) rosbag2 sqlite writer — the same
    schema the reader's embedded-definitions path consumes (topics +
    messages + message_definitions), so a written bag converts with no
    caller msgdefs. Connection ids become topic ids verbatim; payloads are
    carried as given (declare them via ``serialization_format``)."""
    import sqlite3

    con = sqlite3.connect(path)
    try:
        con.execute(
            "CREATE TABLE topics(id INTEGER PRIMARY KEY, name TEXT,"
            " type TEXT, serialization_format TEXT,"
            " offered_qos_profiles TEXT, type_description_hash TEXT)"
        )
        con.execute(
            "CREATE TABLE messages(id INTEGER PRIMARY KEY, topic_id INTEGER,"
            " timestamp INTEGER, data BLOB)"
        )
        con.execute(
            "CREATE TABLE message_definitions(id INTEGER PRIMARY KEY,"
            " topic_type TEXT, encoding TEXT,"
            " encoded_message_definition TEXT, type_description_hash TEXT)"
        )
        seen_types: set[str] = set()
        for c in connections:
            con.execute(
                "INSERT INTO topics VALUES (?,?,?,?,?,?)",
                (c.conn_id, c.topic, c.datatype, serialization_format, "",
                 c.md5sum or ""),
            )
            if c.datatype not in seen_types:
                seen_types.add(c.datatype)
                con.execute(
                    "INSERT INTO message_definitions VALUES (?,?,?,?,?)",
                    (len(seen_types), c.datatype, schema_encoding,
                     c.msg_def or "", c.md5sum or ""),
                )
        con.executemany(
            "INSERT INTO messages VALUES (?,?,?,?)",
            [(None, cid, t, p) for cid, t, p in messages],
        )
        con.commit()
    finally:
        con.close()

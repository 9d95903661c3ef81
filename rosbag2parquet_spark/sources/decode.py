"""Schema-driven little-endian payload decoder — the reference's
``handleMessage``/``handleBuiltin`` walk (MessageTable.cpp:40-225): the type
tree (compiled from message-definition text by
:mod:`rosbag2parquet_spark.sources.msgdef`) and the byte buffer advance in
lockstep; scalars promote per the §1.3 table; time decomposes to sec/nsec;
constants were already elided at schema time; arrays are skipped positionally
in parity mode (bytes remain only in the raw blob — reference
MessageTable.cpp:62-97), with the uint8[] string-style shortcut (63-67).

Execution: the decoder runs inside ``mapInPandas`` — Arrow-batched Python.
This is the one hot path where Python is genuinely warranted: a custom
binary codec with per-message control flow that no built-in expression can
express. Batches stream; memory is bounded per task; the decode parallelizes
with the scan partitions of the bag DataSource. (A production build would
move exactly this function to a JVM/C++ kernel — the surrounding plan would
not change.)
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from rosbag2parquet_spark.sources.msgdef import (
    TIME_TYPES,
    MsgSpec,
    _resolve,
    parse_msgdef,
    to_struct_type,
)

_SCALAR_FMT = {
    "bool": ("<?", 1),
    "int8": ("<b", 1),
    "uint8": ("<B", 1),
    "byte": ("<b", 1),
    "char": ("<B", 1),
    "int16": ("<h", 2),
    "uint16": ("<H", 2),
    "int32": ("<i", 4),
    # uint32/uint64 are reinterpreted as SIGNED raw bits — the reference's
    # documented signedness relaxation (rosbag2parquet.cpp:36, stored as
    # INT32/INT64 physical). Reading them unsigned here would overflow the
    # IntegerType/LongType schema for values past the signed max (a decode
    # hard-failure where the reference degrades) — ADVICE r1.
    "uint32": ("<i", 4),
    "int64": ("<q", 8),
    "uint64": ("<q", 8),
    "float32": ("<f", 4),
    "float64": ("<d", 8),
}

#: true wire sizes for skip arithmetic (unchanged by signed reinterpretation)

_FIXED_SIZE = {k: v[1] for k, v in _SCALAR_FMT.items()}


def decimal_col_names(flat) -> "tuple[list[str], list[str]]":
    """(scalar, array) column names typed DECIMAL in a flattened schema —
    the exact-mode uint64 columns whose pandas cells must become plain
    Python ints before Arrow accepts them against a decimal type. The
    ONE scan every decode tier (ros/CDR/protobuf) shares."""
    dec = [
        f.name for f in flat.fields if isinstance(f.dataType, T.DecimalType)
    ]
    dec_arr = [
        f.name
        for f in flat.fields
        if isinstance(f.dataType, T.ArrayType)
        and isinstance(f.dataType.elementType, T.DecimalType)
    ]
    return dec, dec_arr


def decimalize_cols(
    cols: dict, dec_names: "list[str]", dec_arr_names: "list[str]"
) -> None:
    """Convert exact-mode uint64 decode outputs IN PLACE to the Python
    ints Arrow takes against DECIMAL(20,0): scalar cells to int, array
    cells via numpy ``tolist()`` (ONE C call per cell — u64→int is exact;
    the per-row tier's plain-int lists pass through untouched). Shared by
    the ros, CDR, and protobuf decode tiers so the conversion can never
    drift between grammars."""
    import pandas as pd

    for n in dec_names:
        v = cols[n]
        vals = v.tolist() if hasattr(v, "tolist") else list(v)
        cols[n] = pd.Series(
            [None if x is None else int(x) for x in vals], dtype=object
        )
    for n in dec_arr_names:
        cols[n] = pd.Series(
            [
                None
                if x is None
                else (
                    x.tolist()
                    if hasattr(x, "tolist")
                    else [int(e) for e in x]
                )
                for x in list(cols[n])
            ],
            dtype=object,
        )


def make_decoder(
    root_type: str,
    specs: dict[str, MsgSpec],
    arrays: str = "skip",
    unsigned: str = "signed",
):
    """Compile a decode function(bytes) → tuple of flattened values, walking
    the same tree ``to_struct_type`` walks so positions match the schema.
    ``arrays='blobs'`` extracts uint8-family arrays as bytes values (the
    multimodal-column mode); other arrays are skipped positionally.
    ``unsigned='exact'`` reads uint32 unsigned (schema promotes to LONG)."""
    scalar_fmt = dict(_SCALAR_FMT)
    if unsigned == "exact":
        scalar_fmt["uint32"] = ("<I", 4)
        # uint64 scalars decode unsigned ("<Q" → unbounded Python int); the
        # shared schema carries them as DECIMAL(20,0)
        scalar_fmt["uint64"] = ("<Q", 8)

    def decode_into(spec: MsgSpec, buf: bytes, pos: int, out: list) -> int:
        pkg = spec.full_name.split("/")[0] if "/" in spec.full_name else ""
        for f in spec.fields:
            if f.is_array:
                if arrays in ("blobs", "native") and f.type_name in (
                    "uint8",
                    "byte",
                    "char",
                ):
                    if f.array_len is None:
                        (n,) = struct.unpack_from("<I", buf, pos)
                        pos += 4
                    else:
                        n = f.array_len
                    out.append(buf[pos : pos + n])
                    pos += n
                    continue
                if arrays == "native":
                    if f.array_len is None:
                        (n,) = struct.unpack_from("<I", buf, pos)
                        pos += 4
                    else:
                        n = f.array_len
                    if f.type_name == "string":
                        vals = []
                        for _ in range(n):
                            (ln,) = struct.unpack_from("<I", buf, pos)
                            vals.append(buf[pos + 4 : pos + 4 + ln].decode())
                            pos += 4 + ln
                        out.append(vals)
                        continue
                    if f.type_name in scalar_fmt and f.type_name not in TIME_TYPES:
                        fmt, sz = scalar_fmt[f.type_name]
                        out.append(
                            list(struct.unpack_from(f"<{n}{fmt[1]}", buf, pos))
                            if n
                            else []
                        )
                        pos += n * sz
                        continue
                    # time/struct element arrays: schema skipped them
                    if f.array_len is None:
                        pos -= 4  # skip_array re-reads the length prefix
                pos = skip_array(f, buf, pos, pkg)
                continue
            if f.type_name in TIME_TYPES:
                # signed reinterpretation past 2038-01-19 (same INT32
                # storage as reference MessageTable.cpp:284-292)
                sec, nsec = struct.unpack_from("<ii", buf, pos)
                out.extend((sec, nsec))
                pos += 8
            elif f.type_name == "string":
                (n,) = struct.unpack_from("<I", buf, pos)
                out.append(buf[pos + 4 : pos + 4 + n].decode())
                pos += 4 + n
            elif f.type_name in scalar_fmt:
                fmt, sz = scalar_fmt[f.type_name]
                out.append(struct.unpack_from(fmt, buf, pos)[0])
                pos += sz
            else:
                sub = _resolve(f.type_name, pkg, specs)
                if sub is None:
                    raise KeyError(f"unresolved {f.type_name} in {spec.full_name}")
                pos = decode_into(sub, buf, pos, out)
        return pos

    def skip_array(f, buf: bytes, pos: int, pkg: str) -> int:
        # uint8[] variable: consumed like a string — 4-byte length prefix
        # (reference MessageTable.cpp:63-67)
        if f.array_len is None:
            (n,) = struct.unpack_from("<I", buf, pos)
            pos += 4
        else:
            n = f.array_len
        if f.type_name in ("uint8", "int8", "byte", "char", "bool"):
            return pos + n
        if f.type_name in _FIXED_SIZE:
            return pos + n * _FIXED_SIZE[f.type_name]
        if f.type_name == "string":
            for _ in range(n):
                (ln,) = struct.unpack_from("<I", buf, pos)
                pos += 4 + ln
            return pos
        if f.type_name in TIME_TYPES:
            return pos + 8 * n
        sub = _resolve(f.type_name, pkg, specs)
        if sub is None:
            raise KeyError(f"unresolved array element type {f.type_name}")
        sink: list = []
        for _ in range(n):
            pos = decode_into(sub, buf, pos, sink)
        return pos

    root = specs[root_type]

    def decode(buf: bytes) -> tuple:
        out: list = []
        end = decode_into(root, buf, 0, out)
        # the reference asserts full consumption (MessageTable.cpp:38)
        if end != len(buf):
            raise ValueError(
                f"buffer not fully consumed: {end} != {len(buf)} for {root_type}"
            )
        return tuple(out)

    return decode


# uint32/uint64 read as SIGNED raw bits (numpy view) — matches the scalar
# path and the reference's signedness relaxation; unsigned dtypes here would
# make the Arrow conversion fail on values past the signed max (ADVICE r1).
_NP_DTYPE = {
    "bool": "?",
    "int8": "i1",
    "uint8": "u1",
    "byte": "i1",
    "char": "u1",
    "int16": "<i2",
    "uint16": "<u2",
    "int32": "<i4",
    "uint32": "<i4",
    "int64": "<i8",
    "uint64": "<i8",
    "float32": "<f4",
    "float64": "<f8",
}


def fixed_layout(
    root_type: str,
    specs: dict[str, MsgSpec],
    arrays: str = "skip",
    unsigned: str = "signed",
):
    """If every message of this type has a FIXED byte length (no strings, no
    variable-length arrays), return the numpy structured-dtype field list
    [(name|None, np_dtype_or_pad_bytes)] for a single vectorized
    ``np.frombuffer`` decode of an entire batch; else None. Emitted names
    align 1:1 with ``to_struct_type(arrays='skip')``."""
    np_dtype_map = dict(_NP_DTYPE)
    if unsigned == "exact":
        np_dtype_map["uint32"] = "<u4"
        np_dtype_map["uint64"] = "<u8"  # scalars only in this tier
    if arrays == "blobs":
        # extracted blob columns are variable-size values even at fixed
        # stride — the offset-scan tier handles them
        def has_blob(spec: MsgSpec) -> bool:
            pkg = spec.full_name.split("/")[0] if "/" in spec.full_name else ""
            for f in spec.fields:
                if f.is_array and f.type_name in ("uint8", "byte", "char"):
                    return True
                if not f.is_array and f.type_name not in _FIXED_SIZE and (
                    f.type_name not in TIME_TYPES and f.type_name != "string"
                ):
                    sub = _resolve(f.type_name, pkg, specs)
                    if sub is not None and has_blob(sub):
                        return True
            return False

        if has_blob(specs[root_type]):
            return None

    fields: list[tuple[str | None, object]] = []

    def fixed_bytes(spec: MsgSpec) -> int | None:
        """Fixed serialized size of a message type, or None if variable."""
        pkg = spec.full_name.split("/")[0] if "/" in spec.full_name else ""
        total = 0
        for f in spec.fields:
            if f.type_name == "string" or (f.is_array and f.array_len is None):
                return None
            if f.type_name in TIME_TYPES:
                unit = 8
            elif f.type_name in _FIXED_SIZE:
                unit = _FIXED_SIZE[f.type_name]
            else:
                sub = _resolve(f.type_name, pkg, specs)
                if sub is None:
                    return None
                unit = fixed_bytes(sub)
                if unit is None:
                    return None
            total += unit * (f.array_len if f.is_array else 1)
        return total

    def walk(spec: MsgSpec, prefix: str) -> bool:
        pkg = spec.full_name.split("/")[0] if "/" in spec.full_name else ""
        for f in spec.fields:
            name = f"{prefix}{f.name}"
            if f.is_array:
                if arrays == "native":
                    return False  # array COLUMNS → offset-scan/per-row tiers
                if f.array_len is None:
                    return False  # variable length → not fixed-stride
                if f.type_name in TIME_TYPES:
                    unit = 8
                elif f.type_name in _FIXED_SIZE:
                    unit = _FIXED_SIZE[f.type_name]
                else:
                    sub = _resolve(f.type_name, pkg, specs)
                    unit = fixed_bytes(sub) if sub else None
                    if unit is None:
                        return False
                fields.append((None, unit * f.array_len))  # pad: array skipped
                continue
            if f.type_name == "string":
                return False
            if f.type_name in TIME_TYPES:
                fields.append((f"{name}_sec", "<i4"))
                fields.append((f"{name}_nsec", "<i4"))
            elif f.type_name in np_dtype_map:
                fields.append((name, np_dtype_map[f.type_name]))
            else:
                sub = _resolve(f.type_name, pkg, specs)
                if sub is None or not walk(sub, f"{name}_"):
                    return False
        return True

    return fields if walk(specs[root_type], "") else None


def variable_layout(
    root_type: str,
    specs: dict[str, MsgSpec],
    arrays: str = "skip",
    unsigned: str = "signed",
):
    """Compile the op list for the VECTORIZED variable-stride decoder: the
    per-batch offset-scan that replaces per-row ``struct.unpack`` walks (the
    reference names introspection CPU as its bottleneck, README.md:131-133).

    Supported: fixed scalars, time/duration, strings, fixed arrays of
    fixed-size elements, variable arrays of fixed-size elements (incl. the
    uint8[] blob shortcut), nested fixed-or-variable structs of the same.
    Returns None (→ per-row fallback) for variable arrays of strings or of
    variable-size messages — rare shapes where the offset scan degenerates
    to a row loop anyway.

    Ops: ("fixed", name, np_dtype, size) | ("time", name) | ("string", name)
    | ("skip_fixed", nbytes) | ("skip_var", unit_bytes).
    """
    np_dtype_map = dict(_NP_DTYPE)
    if unsigned == "exact":
        # scalars AND array elements: u64 reads unsigned, the shared schema
        # carries DECIMAL(20,0) / array<DECIMAL(20,0)> (msgdef r8)
        np_dtype_map["uint32"] = "<u4"
        np_dtype_map["uint64"] = "<u8"
    ops: list[tuple] = []

    def fixed_bytes(spec: MsgSpec) -> int | None:
        pkg = spec.full_name.split("/")[0] if "/" in spec.full_name else ""
        total = 0
        for f in spec.fields:
            if f.type_name == "string" or (f.is_array and f.array_len is None):
                return None
            if f.type_name in TIME_TYPES:
                unit = 8
            elif f.type_name in _FIXED_SIZE:
                unit = _FIXED_SIZE[f.type_name]
            else:
                sub = _resolve(f.type_name, pkg, specs)
                unit = fixed_bytes(sub) if sub else None
                if unit is None:
                    return None
            total += unit * (f.array_len if f.is_array else 1)
        return total

    def push_skip(nbytes: int) -> None:
        if ops and ops[-1][0] == "skip_fixed":
            ops[-1] = ("skip_fixed", ops[-1][1] + nbytes)
        else:
            ops.append(("skip_fixed", nbytes))

    def walk(spec: MsgSpec, prefix: str) -> bool:
        pkg = spec.full_name.split("/")[0] if "/" in spec.full_name else ""
        for f in spec.fields:
            name = f"{prefix}{f.name}"
            if f.is_array:
                if arrays in ("blobs", "native") and f.type_name in (
                    "uint8", "byte", "char",
                ):
                    if f.array_len is None:
                        ops.append(("blob_var", name))
                    else:
                        ops.append(("blob_fixed", name, f.array_len))
                    continue
                if arrays == "native" and f.type_name in np_dtype_map:
                    dt = np_dtype_map[f.type_name]
                    unit = _FIXED_SIZE[f.type_name]
                    if f.array_len is None:
                        ops.append(("arr_var", name, dt, unit))
                    else:
                        ops.append(("arr_fixed", name, dt, unit, f.array_len))
                    continue
                if arrays == "native" and f.type_name == "string":
                    return False  # string arrays → per-row fallback
                if f.type_name in TIME_TYPES:
                    unit = 8
                elif f.type_name in _FIXED_SIZE:
                    unit = _FIXED_SIZE[f.type_name]
                elif f.type_name == "string":
                    return False  # string arrays → per-row fallback
                else:
                    sub = _resolve(f.type_name, pkg, specs)
                    unit = fixed_bytes(sub) if sub else None
                    if unit is None:
                        return False  # variable-size elements → fallback
                if f.array_len is None:
                    ops.append(("skip_var", unit))
                else:
                    push_skip(unit * f.array_len)
                continue
            if f.type_name == "string":
                ops.append(("string", name))
            elif f.type_name in TIME_TYPES:
                ops.append(("time", name))
            elif f.type_name in np_dtype_map:
                ops.append(
                    ("fixed", name, np_dtype_map[f.type_name], _FIXED_SIZE[f.type_name])
                )
            else:
                sub = _resolve(f.type_name, pkg, specs)
                if sub is None or not walk(sub, f"{name}_"):
                    return False
        return True

    return ops if walk(specs[root_type], "") else None


def make_vector_decoder(ops: list[tuple]):
    """Batch decoder over the compiled ops: one numpy gather per FIELD
    instead of one struct.unpack per (row, field). A running per-row offset
    vector advances through fixed and variable regions; only string
    extraction (inherently object-typed) touches Python per row."""
    import numpy as np

    def decode_batch(bufs: list[bytes]) -> dict[str, object]:
        n = len(bufs)
        lens = np.fromiter((len(b) for b in bufs), dtype=np.int64, count=n)
        bounds = np.concatenate(([0], np.cumsum(lens)))
        raw = b"".join(bufs)
        data = np.frombuffer(raw, dtype=np.uint8)
        off = bounds[:-1].copy()

        def gather(sz: int) -> "np.ndarray":
            # fancy indexing copies → contiguous, safe to view() directly
            return data[off[:, None] + np.arange(sz)]

        cols: dict[str, object] = {}
        for op in ops:
            kind = op[0]
            if kind == "fixed":
                _, name, dt, sz = op
                cols[name] = gather(sz).view(dt).ravel()
                off += sz
            elif kind == "time":
                _, name = op
                pair = gather(8).view("<i4")
                cols[f"{name}_sec"] = pair[:, 0].copy()
                cols[f"{name}_nsec"] = pair[:, 1].copy()
                off += 8
            elif kind == "string":
                _, name = op
                ln = gather(4).view("<u4").ravel().astype(np.int64)
                spos = off + 4
                ends = spos + ln
                # slice the PYTHON bytes (C-level, no numpy round-trip) —
                # the one per-row loop left, inherent to object output
                cols[name] = [
                    raw[s:e].decode()
                    for s, e in zip(spos.tolist(), ends.tolist())
                ]
                off = ends
            elif kind == "arr_fixed":
                _, name, dt, unit, cnt = op
                # one gather for the whole batch → (n, cnt) matrix → rows
                mat = gather(unit * cnt).view(dt).reshape(len(bufs), cnt)
                cols[name] = list(mat)
                off += unit * cnt
            elif kind == "arr_var":
                _, name, dt, unit = op
                ln = gather(4).view("<u4").ravel().astype(np.int64)
                spos = off + 4
                ends = spos + ln * unit
                cols[name] = [
                    np.frombuffer(raw[s:e], dtype=dt)
                    for s, e in zip(spos.tolist(), ends.tolist())
                ]
                off = ends
            elif kind == "blob_var":
                _, name = op
                ln = gather(4).view("<u4").ravel().astype(np.int64)
                spos = off + 4
                ends = spos + ln
                cols[name] = [
                    raw[s:e] for s, e in zip(spos.tolist(), ends.tolist())
                ]
                off = ends
            elif kind == "blob_fixed":
                # NB: must not shadow the batch-size `n` (a prior version
                # did, corrupting any later op that used it — fuzz-caught)
                _, name, blen = op
                ends = off + blen
                cols[name] = [
                    raw[s:e] for s, e in zip(off.tolist(), ends.tolist())
                ]
                off = ends
            elif kind == "skip_fixed":
                off = off + op[1]
            elif kind == "skip_var":
                cnt = gather(4).view("<u4").ravel().astype(np.int64)
                off = off + 4 + cnt * op[1]
        if not np.array_equal(off, bounds[1:]):
            # the reference asserts full consumption (MessageTable.cpp:38)
            bad = int(np.argmax(off != bounds[1:]))
            raise ValueError(
                f"buffer not fully consumed at row {bad}: "
                f"{int(off[bad] - bounds[bad])} != {int(lens[bad])}"
            )
        return cols

    return decode_batch


def decode_messages(
    df: DataFrame,
    root_type: str,
    msgdef_text: str,
    data_col: str = "data",
    keep_cols: tuple[str, ...] = ("offset", "time_ns", "conn_id"),
    arrays: str = "skip",
    unsigned: str = "signed",
    on_error: str = "fail",
) -> DataFrame:
    """Bag messages → flattened typed columns: the per-type table body
    (reference MessageTable.cpp:305-343 minus seqno/blob bookkeeping, which
    the converter adds). Arrow-batched; schema comes from the msg-def
    compiler so decode positions and column names always agree.

    ``on_error``: ``'fail'`` (reference parity — the C++ asserts and dies,
    MessageTable.cpp:38) raises on the first undecodable payload;
    ``'permissive'`` is the 1000-executor answer — a poisoned batch falls
    back to a per-row salvage, good rows decode normally, bad rows emit
    NULL fields plus a ``_decode_error`` message column (the dead-letter
    pattern: one corrupt message must not kill a 100 TB conversion). The
    fast vectorized tiers still run first — permissive costs nothing on
    clean data."""
    import numpy as np

    if on_error not in ("fail", "permissive"):
        raise ValueError(f"on_error must be fail|permissive, got {on_error!r}")
    specs = parse_msgdef(root_type, msgdef_text)
    flat = to_struct_type(root_type, specs, arrays=arrays, unsigned=unsigned)
    decode = make_decoder(root_type, specs, arrays=arrays, unsigned=unsigned)

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
    flat_names = [f.name for f in flat.fields]
    dec_names, dec_arr_names = decimal_col_names(flat)

    layout = fixed_layout(root_type, specs, arrays=arrays, unsigned=unsigned)
    np_dtype = None
    if layout is not None:
        np_fields, pad = [], 0
        for name, spec_dt in layout:
            if name is None:  # skipped array region → void padding bytes
                np_fields.append((f"__pad{pad}", f"V{int(spec_dt)}"))
                pad += 1
            else:
                np_fields.append((name, spec_dt))
        np_dtype = np.dtype(np_fields)

    # three decode tiers, fastest applicable wins:
    #   fixed-stride  — one frombuffer per batch (no per-row anything)
    #   offset-scan   — one numpy gather per field (strings/var arrays)
    #   per-row       — struct.unpack walk (string arrays & var-struct arrays)
    var_ops = (
        variable_layout(root_type, specs, arrays=arrays, unsigned=unsigned)
        if np_dtype is None
        else None
    )
    batch_decode = make_vector_decoder(var_ops) if var_ops is not None else None

    def _decode_fast(pdf) -> dict:
        cols: dict = {}
        if np_dtype is not None:
            # vectorized fast path: one frombuffer over the whole batch
            buf = b"".join(pdf[data_col])
            if len(buf) != np_dtype.itemsize * len(pdf):
                raise ValueError(
                    f"fixed-stride mismatch: {len(buf)} bytes for "
                    f"{len(pdf)} x {np_dtype.itemsize}B records of {root_type}"
                )
            arr = np.frombuffer(buf, dtype=np_dtype)
            # positional remap: the layout walker emits ORIGINAL field
            # names; flat_names carry the reserved-collision sanitize
            # (msgdef._sanitize_flat_names) in the same walk order
            orig = [n for n in np_dtype.names if not n.startswith("__pad")]
            assert len(orig) == len(flat_names)
            for name, o in zip(flat_names, orig):
                cols[name] = arr[o]
        elif batch_decode is not None:
            decoded = batch_decode([bytes(b) for b in pdf[data_col]])
            assert len(decoded) == len(flat_names)
            for name, v in zip(flat_names, decoded.values()):
                cols[name] = v
        else:
            decoded = [decode(bytes(b)) for b in pdf[data_col]]
            for i, name in enumerate(flat_names):
                cols[name] = [row[i] for row in decoded]
        return cols

    def _decode_salvage(pdf) -> dict:
        """Per-row salvage for a poisoned batch: good rows decode, bad rows
        emit NULLs + the error text — row granularity, never batch."""
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

    # data_col may itself be a keep_col (the converter passes the raw blob
    # through the decode batch instead of re-joining it) — select it once
    sel = list(keep_cols) + ([data_col] if data_col not in keep_cols else [])
    return df.select(*sel).mapInPandas(run, schema=out_schema)

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
    BUILTIN_TYPES,
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
    "uint32": ("<I", 4),
    "int64": ("<q", 8),
    "uint64": ("<Q", 8),
    "float32": ("<f", 4),
    "float64": ("<d", 8),
}

_FIXED_SIZE = {k: v[1] for k, v in _SCALAR_FMT.items()}


def make_decoder(root_type: str, specs: dict[str, MsgSpec]):
    """Compile a decode function(bytes) → tuple of flattened values, walking
    the same tree ``to_struct_type`` walks so positions match the schema."""

    def decode_into(spec: MsgSpec, buf: bytes, pos: int, out: list) -> int:
        pkg = spec.full_name.split("/")[0] if "/" in spec.full_name else ""
        for f in spec.fields:
            if f.is_array:
                pos = skip_array(f, buf, pos, pkg)
                continue
            if f.type_name in TIME_TYPES:
                sec, nsec = struct.unpack_from("<II", buf, pos)
                out.extend((sec, nsec))
                pos += 8
            elif f.type_name == "string":
                (n,) = struct.unpack_from("<I", buf, pos)
                out.append(buf[pos + 4 : pos + 4 + n].decode())
                pos += 4 + n
            elif f.type_name in _SCALAR_FMT:
                fmt, sz = _SCALAR_FMT[f.type_name]
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


# NOTE: uint32/uint64 values above the signed range are a known relaxation
# (stored signed — same signedness TODO as the reference, rosbag2parquet.cpp:36);
# the vectorized path reads them as unsigned numpy and Arrow casts on output.
_NP_DTYPE = {
    "bool": "?",
    "int8": "i1",
    "uint8": "u1",
    "byte": "i1",
    "char": "u1",
    "int16": "<i2",
    "uint16": "<u2",
    "int32": "<i4",
    "uint32": "<u4",
    "int64": "<i8",
    "uint64": "<u8",
    "float32": "<f4",
    "float64": "<f8",
}


def fixed_layout(root_type: str, specs: dict[str, MsgSpec]):
    """If every message of this type has a FIXED byte length (no strings, no
    variable-length arrays), return the numpy structured-dtype field list
    [(name|None, np_dtype_or_pad_bytes)] for a single vectorized
    ``np.frombuffer`` decode of an entire batch; else None. Emitted names
    align 1:1 with ``to_struct_type(arrays='skip')``."""
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
                fields.append((f"{name}_sec", "<u4"))
                fields.append((f"{name}_nsec", "<u4"))
            elif f.type_name in _NP_DTYPE:
                fields.append((name, _NP_DTYPE[f.type_name]))
            else:
                sub = _resolve(f.type_name, pkg, specs)
                if sub is None or not walk(sub, f"{name}_"):
                    return False
        return True

    return fields if walk(specs[root_type], "") else None


def decode_messages(
    df: DataFrame,
    root_type: str,
    msgdef_text: str,
    data_col: str = "data",
    keep_cols: tuple[str, ...] = ("offset", "time_ns", "conn_id"),
) -> DataFrame:
    """Bag messages → flattened typed columns: the per-type table body
    (reference MessageTable.cpp:305-343 minus seqno/blob bookkeeping, which
    the converter adds). Arrow-batched; schema comes from the msg-def
    compiler so decode positions and column names always agree."""
    import numpy as np

    specs = parse_msgdef(root_type, msgdef_text)
    flat = to_struct_type(root_type, specs, arrays="skip")
    decode = make_decoder(root_type, specs)

    out_schema = T.StructType(
        [df.schema[c] for c in keep_cols] + list(flat.fields)
    )
    flat_names = [f.name for f in flat.fields]

    layout = fixed_layout(root_type, specs)
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

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            cols = {c: pdf[c].values for c in keep_cols}
            if np_dtype is not None:
                # vectorized fast path: one frombuffer over the whole batch
                buf = b"".join(pdf[data_col])
                if len(buf) != np_dtype.itemsize * len(pdf):
                    raise ValueError(
                        f"fixed-stride mismatch: {len(buf)} bytes for "
                        f"{len(pdf)} x {np_dtype.itemsize}B records of {root_type}"
                    )
                arr = np.frombuffer(buf, dtype=np_dtype)
                for name in flat_names:
                    cols[name] = arr[name]
            else:
                decoded = [decode(bytes(b)) for b in pdf[data_col]]
                for i, name in enumerate(flat_names):
                    cols[name] = [row[i] for row in decoded]
            yield pd.DataFrame(cols)

    return df.select(*keep_cols, data_col).mapInPandas(run, schema=out_schema)

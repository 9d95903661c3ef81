"""Multimodal (binary) column handling — north-star X7 and the reference's
own pet wish (reference README.md:137: "leave heavy-weight objects in the
bag, storing a pointer to them instead"; its CompressedImage blobs dominate
output, README.md:89).

Design: media are opaque ``binary`` columns (or out-of-line pointers) with
typed metadata columns beside them. Decode/feature steps run as Arrow-batched
``mapInPandas`` — the Spark-side plumbing (schema, batch iteration,
partitioning) is real and tested; the codec call itself is stubbed behind
``decode_image_stub`` because no image/audio libraries exist in this
container (a production deployment swaps one function).

Scale notes: blob columns ride parquet's per-column compression and are
column-pruned away unless selected (the reference's "read headers without
image I/O" goal, README.md:10). ``mapInPandas`` streams Arrow batches —
constant memory per task regardless of table size; batch size bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` so 100 MB blobs don't
blow the Arrow buffer.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rosbag2parquet_spark.sources.catalog import load_table

FEATURE_SCHEMA = (
    "doc_id long, n_bytes int, checksum long, width int, height int, decoded boolean"
)


def decode_image_stub(payload: bytes) -> tuple[int, int]:
    """STUB — deterministic fake decode. A real deployment replaces this with
    PIL/libjpeg/ffmpeg; none are installed in this container.
    Returns fake (width, height) derived from the payload so tests are
    deterministic."""
    if payload is None or len(payload) == 0:
        raise NotImplementedError("empty payload; real codec not available in container")
    return (len(payload) % 640) + 1, (payload[0] % 480) + 1


def extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: per Arrow batch, compute byte-level metadata and
    run the (stubbed) decoder. Shape: (doc_id, data: bytes) → FEATURE_SCHEMA."""
    for pdf in batches:
        if len(pdf) == 0:
            continue
        n_bytes = pdf["data"].map(lambda b: 0 if b is None else len(b))
        checksum = pdf["data"].map(
            lambda b: 0 if b is None else sum(b[:64]) + len(b)
        )
        dims = pdf["data"].map(
            lambda b: decode_image_stub(b) if b is not None and len(b) else (0, 0)
        )
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": n_bytes.astype("int32"),
                "checksum": checksum.astype("int64"),
                "width": [d[0] for d in dims],
                "height": [d[1] for d in dims],
                "decoded": True,
            }
        )


def media_table(docs: DataFrame) -> DataFrame:
    """Fixture adapter: documents.text encoded as the binary payload —
    the schema shape of a real media table: (id, media binary, metadata)."""
    return docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("data"),
        F.col("n_chars").alias("meta_size"),
    )


def q_media_features(docs: DataFrame) -> DataFrame:
    """The feature-extraction pipeline: prune to (id, blob) → Arrow-batched
    decode → typed feature rows. Column pruning means the scan reads ONLY the
    blob + id columns even if the media table is wide."""
    return media_table(docs).select("doc_id", "data").mapInPandas(
        extract_features, schema=FEATURE_SCHEMA
    )


def out_of_line_pointers(docs: DataFrame, bag_path: str) -> DataFrame:
    """The >1 MB out-of-line pattern (reference README.md:137): store
    (path, offset, length) pointer columns instead of the payload; a deferred
    fetch joins the pointer table to a blob store read at consumption time.
    Offsets are running byte positions — the exact layout a bag-side writer
    would produce — computed with the bucketed two-pass running sum (no
    single-partition window; same plan as the byte-bounded limit)."""
    from rosbag2parquet_spark.operators.relational import running_sum_scalable

    sized = docs.select("doc_id", F.length(F.encode("text", "utf-8")).alias("length"))
    run = running_sum_scalable(sized, "doc_id", F.col("length").cast("long"), 100)
    return run.select(
        "doc_id",
        F.lit(bag_path).alias("path"),
        (F.col("__running") - F.col("length")).cast("long").alias("offset"),
        "length",
    )


# --------------------------------------------------- driver-contract queries
#
# The codec is a stub, but a DETERMINISTIC one (pure arithmetic over the
# payload bytes) — so the whole Arrow/mapInPandas pipeline is exactly
# SQL-expressible and gets a value-level oracle: the driver proves the
# Python slow-path plumbing (schema, batch shape, null/short-payload
# handling) bit-for-bit, which is precisely the part that stays when a real
# codec replaces the stub. Fixture payloads are ASCII, so byte i of the
# utf-8 payload == ascii(substr(text, i, 1)) on the oracle side.


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7: blob metadata + (stubbed) decode through the real Arrow-batched
    mapInPandas pipeline."""
    docs = load_table(spark, sf_dir, "documents")
    return q_media_features(docs)


ORACLE_MULTIMODAL_FEATURES = """
SELECT doc_id,
       CAST(length(text) AS INTEGER) AS n_bytes,
       CAST(list_sum(list_transform(range(1, least(length(text), 64) + 1),
                                    i -> ascii(substr(text, i, 1))))
            + length(text) AS BIGINT) AS checksum,
       CAST(length(text) % 640 + 1 AS INTEGER) AS width,
       CAST(ascii(substr(text, 1, 1)) % 480 + 1 AS INTEGER) AS height,
       TRUE AS decoded
FROM documents
"""


MEDIA_STORE_PATH = "media/documents.bin"


def q_multimodal_pointers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7: the out-of-line pointer table (path, offset, length) for deferred
    blob fetch."""
    docs = load_table(spark, sf_dir, "documents")
    return out_of_line_pointers(docs, MEDIA_STORE_PATH)


ORACLE_MULTIMODAL_POINTERS = f"""
SELECT doc_id, '{MEDIA_STORE_PATH}' AS path,
       CAST(coalesce(sum(length(text)) OVER (ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         AS offset,
       CAST(length(text) AS INTEGER) AS length
FROM documents
"""


# ------------------------------------------------------ frame sampling (X7)

#: fixed frame block size and sampling stride — a video payload is a frame
#: sequence; training pipelines keep every k-th frame, not all of them
FRAME_BYTES = 64
FRAME_STRIDE = 2

FRAME_SCHEMA = (
    "doc_id long, frame_idx int, frame_offset int, "
    "thumb_w int, thumb_h int, thumb_checksum long"
)


def sample_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker for the ONE-TO-MANY media shape: each input blob
    yields rows for every ``FRAME_STRIDE``-th full ``FRAME_BYTES`` block —
    the frame-sample + (stubbed) resize step of a video pipeline. Distinct
    plumbing from `extract_features` (1:1): the output batch length is
    data-dependent, which is exactly what Arrow's variable-size batches
    exist for. The "resize" emits stub thumbnail dims + a checksum, pure
    arithmetic over the frame bytes (deterministic → SQL oracle)."""
    for pdf in batches:
        cols: dict[str, list] = {
            k: []
            for k in (
                "doc_id",
                "frame_idx",
                "frame_offset",
                "thumb_w",
                "thumb_h",
                "thumb_checksum",
            )
        }
        for doc_id, data in zip(pdf["doc_id"], pdf["data"]):
            if data is None:
                continue
            for idx in range(0, len(data) // FRAME_BYTES, FRAME_STRIDE):
                off = idx * FRAME_BYTES
                frame = data[off : off + FRAME_BYTES]
                cols["doc_id"].append(doc_id)
                cols["frame_idx"].append(idx)
                cols["frame_offset"].append(off)
                cols["thumb_w"].append(frame[0] % 320 + 1)
                cols["thumb_h"].append(frame[1] % 240 + 1)
                cols["thumb_checksum"].append(sum(frame[:16]) + FRAME_BYTES)
        if cols["doc_id"]:
            out = pd.DataFrame(cols)
            for c in ("frame_idx", "frame_offset", "thumb_w", "thumb_h"):
                out[c] = out[c].astype("int32")
            yield out


def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7: frame-sample + resize plumbing over the media table."""
    docs = load_table(spark, sf_dir, "documents")
    return media_table(docs).select("doc_id", "data").mapInPandas(
        sample_frames, schema=FRAME_SCHEMA
    )


ORACLE_MULTIMODAL_FRAMES = f"""
SELECT doc_id,
       CAST(f.range AS INTEGER) AS frame_idx,
       CAST(f.range * {FRAME_BYTES} AS INTEGER) AS frame_offset,
       CAST(ascii(substr(text, f.range * {FRAME_BYTES} + 1, 1)) % 320 + 1
            AS INTEGER) AS thumb_w,
       CAST(ascii(substr(text, f.range * {FRAME_BYTES} + 2, 1)) % 240 + 1
            AS INTEGER) AS thumb_h,
       CAST(list_sum(list_transform(range(1, 17),
                i -> ascii(substr(text, f.range * {FRAME_BYTES} + i, 1))))
            + {FRAME_BYTES} AS BIGINT) AS thumb_checksum
FROM documents, range(0, 1000) f
WHERE f.range < length(text) // {FRAME_BYTES}
  AND f.range % {FRAME_STRIDE} = 0
"""


QUERIES = {
    "multimodal-features": q_multimodal_features,
    "multimodal-pointers": q_multimodal_pointers,
    "multimodal-frames": q_multimodal_frames,
}

ORACLES = {
    "multimodal-features": ORACLE_MULTIMODAL_FEATURES,
    "multimodal-pointers": ORACLE_MULTIMODAL_POINTERS,
    "multimodal-frames": ORACLE_MULTIMODAL_FRAMES,
}

"""Multimodal plumbing tests: binary columns through Arrow-batched
mapInPandas, and the out-of-line pointer layout. The codec itself is stubbed
(no media libs in container) — these tests pin the Spark-side contract."""

import pytest
from pyspark.sql import functions as F

from rosbag2parquet_spark.functions.multimodal import (
    decode_image_stub,
    media_table,
    out_of_line_pointers,
    q_media_features,
)
from rosbag2parquet_spark.sources.catalog import load_table
from tests.conftest import SF_DIR


def test_media_features_schema_and_values(spark):
    docs = load_table(spark, SF_DIR, "documents").limit(50)
    feats = q_media_features(docs)
    assert feats.columns == ["doc_id", "n_bytes", "checksum", "width", "height", "decoded"]
    rows = {r.doc_id: r for r in feats.collect()}
    orig = {r.doc_id: r for r in docs.select("doc_id", "text").collect()}
    assert set(rows) == set(orig)
    for doc_id, r in rows.items():
        payload = orig[doc_id].text.encode()
        assert r.n_bytes == len(payload)
        assert r.checksum == sum(payload[:64]) + len(payload)
        w, h = decode_image_stub(payload)
        assert (r.width, r.height) == (w, h)
        assert r.decoded


def test_media_blob_binary_type(spark):
    docs = load_table(spark, SF_DIR, "documents")
    media = media_table(docs)
    assert dict(media.dtypes)["data"] == "binary"


def test_decode_stub_raises_on_empty():
    with pytest.raises(NotImplementedError):
        decode_image_stub(b"")


def test_out_of_line_pointers_contiguous(spark):
    """Pointer layout: offsets are a prefix-sum of lengths — byte-contiguous,
    non-overlapping (the reference's 'pointer into the bag' design,
    README.md:137)."""
    docs = load_table(spark, SF_DIR, "documents").limit(20)
    ptrs = out_of_line_pointers(docs, "/bags/blue_100M.bag").orderBy("doc_id").collect()
    pos = 0
    for p in ptrs:
        assert p.offset == pos
        assert p.path == "/bags/blue_100M.bag"
        pos += p.length

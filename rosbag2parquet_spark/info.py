"""`rosbag info` analog — the reference's stats companion
(rosbag_example.cpp:14-77): per-topic aggregation (count, bytes, min/max
stamp, first-seen type), rolled up per type and globally, with derived
frequency / data-rate metrics (rosbag_example.cpp:28-34, 71-72).

One groupBy + one rollup over the bag scan — the reference's three
sequential hash-map passes collapse into two Spark aggregations (partial
aggregation map-side; the rollup shares the shuffle)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rosbag2parquet_spark.sources.baglike import bag_format, connections_df, read_bag


def _fmt(path: str) -> str:
    """Reader dispatch key: detected magic bytes win; extension only breaks
    the tie for unreadable/magicless files (so the matching reader raises
    its own clear error instead of the wrong grammar's)."""
    return bag_format(path) or ("rosbag" if path.endswith(".bag") else "sbag")


def load_bag(
    spark: SparkSession,
    path: str,
    num_partitions: int = 8,
    msgdefs: "dict[str, str] | None" = None,
    start_ns: "int | None" = None,
    end_ns: "int | None" = None,
    on_error: str = "fail",
    start_offset: "int | None" = None,
) -> tuple[DataFrame, DataFrame]:
    """(messages, connections) for any bag generation, detected from magic
    bytes: rosbag 2.0 record/chunk format, ROS 2 rosbag2 (.db3 sqlite3
    storage — definitions read from the embedded ``message_definitions``
    table when present (Iron+), else from caller-supplied ``msgdefs``), or
    the SBAG test format. All yield the same
    (offset, time_ns, conn_id, data) scan schema.

    ``start_offset`` (incremental-resume cursor) is supported where the
    container's offsets are append-stable — .db3 (sqlite rowids) and SBAG
    (byte offsets under pure append); rosbag/MCAP offsets are synthetic
    chunk-index encodings whose shift can change as the file grows, so
    the cursor is refused there."""
    fmt = _fmt(path)
    if start_offset is not None and fmt in ("rosbag", "mcap"):
        raise ValueError(
            f"start_offset resume is not supported for {fmt}: its offsets "
            "are synthetic chunk-index encodings, not append-stable; "
            "convert new files via the fleet append instead"
        )
    if fmt == "rosbag":
        from rosbag2parquet_spark.sources.rosbag import (
            read_rosbag,
            rosbag_connections_df,
        )

        return (
            read_rosbag(
                spark, path, num_partitions=num_partitions,
                start_ns=start_ns, end_ns=end_ns,
            ),
            rosbag_connections_df(spark, path),
        )
    if fmt == "mcap":
        from rosbag2parquet_spark.sources.mcap import (
            mcap_connections_df,
            read_mcap,
        )

        return (
            read_mcap(
                spark, path, num_partitions=num_partitions,
                start_ns=start_ns, end_ns=end_ns, on_error=on_error,
            ),
            mcap_connections_df(spark, path),
        )
    if fmt == "rosbag2":
        from rosbag2parquet_spark.sources.rosbag2 import (
            read_rosbag2,
            rosbag2_connections_df,
        )

        return (
            read_rosbag2(
                spark, path, num_partitions=num_partitions,
                start_ns=start_ns, end_ns=end_ns,
                start_offset=start_offset,
            ),
            rosbag2_connections_df(spark, path, msgdefs),
        )
    return (
        read_bag(
            spark, path, num_partitions=num_partitions,
            start_offset=start_offset,
        ),
        connections_df(spark, path),
    )


def seqno_bucket_width(path: str) -> int:
    """Bucket width for ``assign_seqno`` over this bag's offsets, sized so
    the driver-side prefix-sum map stays ≤ ~64 entries whatever the bag
    size. ``.bag`` offsets are the sparse (chunk_index << shift) encoding —
    the width must be a stride multiple (rosbag.seqno_bucket_width); SBAG
    offsets are dense file byte positions, so file_size/64 works."""
    if _fmt(path) == "rosbag":
        from rosbag2parquet_spark.sources.rosbag import (
            seqno_bucket_width as _bag_width,
        )

        return _bag_width(path)
    if _fmt(path) == "mcap":
        from rosbag2parquet_spark.sources.mcap import (
            seqno_bucket_width as _mcap_width,
        )

        return _mcap_width(path)
    if _fmt(path) == "rosbag2":
        # .db3 offsets are dense rowids, not byte positions — bucket by the
        # rowid span (getsize/64 would collapse every row into one bucket)
        import sqlite3

        con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
        try:
            lo, hi = con.execute(
                "SELECT min(id), max(id) FROM messages"
            ).fetchone()
        finally:
            con.close()
        span = (hi - lo + 1) if lo is not None else 1
        return max(1, span // 64 + 1)
    import os

    return max(100_000, os.path.getsize(path) // 64 + 1)


def bag_info(spark: SparkSession, path: str) -> DataFrame:
    """Per-(datatype, topic) stats + per-type and global rollup rows
    (topic NULL → per-type subtotal; both NULL → grand total)."""
    msgs, conns = load_bag(spark, path)
    joined = msgs.join(F.broadcast(conns), msgs.conn_id == conns.connection_id)
    agg = (
        joined.rollup("datatype", "topic")
        .agg(
            F.count(F.lit(1)).alias("n_msgs"),
            F.sum(F.length("data")).alias("total_bytes"),
            F.min("time_ns").alias("min_ns"),
            F.max("time_ns").alias("max_ns"),
        )
    )
    span_s = (F.col("max_ns") - F.col("min_ns")) / 1e9
    return agg.select(
        F.coalesce("datatype", F.lit("<all>")).alias("datatype"),
        F.coalesce("topic", F.lit("<all>")).alias("topic"),
        "n_msgs",
        "total_bytes",
        F.when(span_s > 0, F.round(F.col("n_msgs") / span_s, 3)).alias("freq_hz"),
        F.when(span_s > 0, F.round(F.col("total_bytes") / span_s, 1)).alias(
            "bytes_per_s"
        ),
    )


def print_info(spark: SparkSession, path: str) -> None:
    """Human-oriented summary (the reference prints to stdout,
    rosbag_example.cpp:67-76)."""
    df = bag_info(spark, path).orderBy("datatype", "topic")
    rows = df.collect()
    print(f"bag: {path}")
    for r in rows:
        tag = "TOTAL" if r.datatype == "<all>" else f"{r.datatype} {r.topic}"
        freq = f" @ {r.freq_hz} Hz" if r.freq_hz is not None else ""
        print(f"  {tag}: {r.n_msgs} msgs, {r.total_bytes} bytes{freq}")
    if _fmt(path) == "mcap":
        from rosbag2parquet_spark.sources.mcap import (
            mcap_attachment_stats,
            mcap_metadata,
        )

        # sizes come from AttachmentIndex records when the file is indexed
        # — no payload bytes read to print a listing
        for name, media, nbytes in mcap_attachment_stats(path):
            print(f"  attachment: {name} ({media}, {nbytes} bytes)")
        for name, kv in mcap_metadata(path):
            pairs = ", ".join(f"{k}={v}" for k, v in sorted(kv.items()))
            print(f"  metadata: {name}: {pairs}")


def layout_info(spark: SparkSession, layout_dir: str) -> DataFrame:
    """`bag_info` over a CONVERTED layout instead of a bag: the same
    per-(datatype, topic) stats + rollup rows. Layouts written since r8
    persist the aggregates as a ``Stats`` table (reference TODO #2.1 —
    one row per batch x connection), so info is a rollup of a
    KILOBYTE-scale table: at 100 TB, `rosbag info` answers without
    touching Messages at all. Legacy layouts fall back to the
    column-pruned Messages scan (still no per-type blob ever read — the
    reason the metadata tables exist, FlattenedRosWriter.cpp:49-137).
    Both paths compute identical values (sums/mins/maxes re-aggregate
    exactly); pinned in tests/test_convert_bag.py."""
    import os

    conns = spark.read.parquet(os.path.join(layout_dir, "Connections"))
    stats_path = os.path.join(layout_dir, "Stats")
    if os.path.isdir(stats_path):
        rows = spark.read.parquet(stats_path)
        joined = rows.join(F.broadcast(conns), "connection_id")
        agg = joined.rollup("datatype", "topic").agg(
            F.sum("n_messages").alias("n_msgs"),
            F.sum("total_bytes").alias("total_bytes"),
            F.min("min_time_ns").alias("min_ns"),
            F.max("max_time_ns").alias("max_ns"),
        )
    else:
        msgs = spark.read.parquet(
            os.path.join(layout_dir, "Messages")
        ).select(
            "connection_id",
            "size",
            (
                F.col("time_sec").cast("long") * 1_000_000_000
                + F.col("time_nsec")
            ).alias("time_ns"),
        )
        joined = msgs.join(F.broadcast(conns), "connection_id")
        agg = joined.rollup("datatype", "topic").agg(
            F.count(F.lit(1)).alias("n_msgs"),
            F.sum("size").alias("total_bytes"),
            F.min("time_ns").alias("min_ns"),
            F.max("time_ns").alias("max_ns"),
        )
    span_s = (F.col("max_ns") - F.col("min_ns")) / 1e9
    return agg.select(
        F.coalesce("datatype", F.lit("<all>")).alias("datatype"),
        F.coalesce("topic", F.lit("<all>")).alias("topic"),
        "n_msgs",
        "total_bytes",
        F.when(span_s > 0, F.round(F.col("n_msgs") / span_s, 3)).alias("freq_hz"),
        F.when(span_s > 0, F.round(F.col("total_bytes") / span_s, 1)).alias(
            "bytes_per_s"
        ),
    )


def print_layout_info(spark: SparkSession, layout_dir: str) -> None:
    import os

    df = layout_info(spark, layout_dir).orderBy("datatype", "topic")
    print(f"layout: {layout_dir}")
    for r in df.collect():
        tag = "TOTAL" if r.datatype == "<all>" else f"{r.datatype} {r.topic}"
        freq = f" @ {r.freq_hz} Hz" if r.freq_hz is not None else ""
        print(f"  {tag}: {r.n_msgs} msgs, {r.total_bytes} bytes{freq}")
    tables = sorted(
        d for d in os.listdir(layout_dir)
        if os.path.isdir(os.path.join(layout_dir, d))
    )
    print(f"  tables: {', '.join(tables)}")

"""Streaming ingest + compaction service loop: the maintenance half of a
landing pipeline. ``partitionBy`` streaming writers emit one file per task
per partition per TRIGGER, so a long-running ingest fragments every
partition into thousands of tiny files — the classic small-file problem
OPTIMIZE exists for. This service runs the ingest and the OPTIMIZE in the
same ``foreachBatch`` loop: append the micro-batch, then rewrite any
partition whose file count crossed the threshold.

Shape notes (vs the batch ``sinks.compact_partitioned``): the batch
operator compacts the WHOLE table in one job/one shuffle because it may
face 10^5 cold partitions. The service loop instead rewrites only the
partitions the ingest is actively fragmenting — per trigger that is the
handful of recent arrival partitions, bounded by the arrival pattern and
the trigger cadence, NOT by table size, so a per-partition rewrite here
is the right (and cheap) shape. Each rewrite is one column-pruned read +
one coalesced write of one partition directory.

The swap (write to ``.__compact_tmp``, rename over) is not transactional —
a reader racing the swap can see the partition twice or missing; a table
format (Delta/Iceberg) makes this atomic via its commit log. This is the
plain-parquet-directory version, and the service is the single writer by
construction (foreachBatch triggers run serially).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame


def compact_fragmented_partitions(
    spark,
    out_dir: str,
    *,
    max_files_per_partition: int = 8,
    target_file_bytes: "int | None" = None,
) -> "list[str]":
    """Rewrite every hive partition directory under ``out_dir`` holding
    more than ``max_files_per_partition`` parquet files down to
    ceil(bytes / target) files (1 when no target). Returns the rewritten
    partition-relative paths. Pure directory listing finds the work — no
    data is read for partitions under the threshold."""
    rewritten: list[str] = []
    for root, dirs, files in os.walk(out_dir):
        if "=" not in os.path.basename(root):
            continue
        parquet = [f for f in files if f.endswith(".parquet")]
        if len(parquet) <= max_files_per_partition:
            continue
        nbytes = sum(os.path.getsize(os.path.join(root, f)) for f in parquet)
        k = 1
        if target_file_bytes:
            k = max(1, -(-nbytes // target_file_bytes))
        tmp = root + ".__compact_tmp"
        (
            spark.read.parquet(root)
            .repartition(k)
            .write.mode("overwrite")
            .parquet(tmp)
        )
        shutil.rmtree(root)
        os.rename(tmp, root)
        rewritten.append(os.path.relpath(root, out_dir))
        dirs[:] = []  # don't descend into the dir we just swapped
    return rewritten


def ingest_with_compaction(
    events: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    partition_cols: "list[str]",
    *,
    max_files_per_partition: int = 8,
    target_file_bytes: "int | None" = None,
):
    """Start the service: append each micro-batch to the hive-partitioned
    layout, then compact partitions the append fragmented past the
    threshold. Returns the StreamingQuery (caller awaits/stops it).
    Exactly-once ingest comes from the checkpoint offset log; compaction
    is idempotent (re-running it on an already-compact partition is a
    no-op by the threshold check)."""

    def _ingest(batch_df: DataFrame, _batch_id: int) -> None:
        spark = batch_df.sparkSession
        (
            batch_df.write.mode("append")
            .partitionBy(*partition_cols)
            .parquet(out_dir)
        )
        compact_fragmented_partitions(
            spark,
            out_dir,
            max_files_per_partition=max_files_per_partition,
            target_file_bytes=target_file_bytes,
        )

    return (
        events.writeStream.foreachBatch(_ingest)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )

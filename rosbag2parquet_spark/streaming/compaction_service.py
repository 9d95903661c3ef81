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

The swap (write to ``.__compact_tmp``, two renames) is not transactional —
a reader racing the swap can see the partition twice or missing, and a
crash between the renames leaves a ``.__compact_old`` / ``.__compact_tmp``
leftover that the NEXT service pass repairs (finish the swap if the new
dir is complete, else roll back); a table format (Delta/Iceberg) makes
this atomic via its commit log. This is the plain-parquet-directory
version, and the service is the single writer by construction
(foreachBatch triggers run serially).
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
    _repair_interrupted_swaps(out_dir)
    rewritten: list[str] = []
    for root, dirs, files in os.walk(out_dir):
        base = os.path.basename(root)
        if base.endswith((_TMP_SUFFIX, _OLD_SUFFIX)):
            dirs[:] = []  # never treat swap scratch as a partition
            continue
        if "=" not in base:
            continue
        parquet = [f for f in files if f.endswith(".parquet")]
        if len(parquet) <= max_files_per_partition:
            continue
        nbytes = sum(os.path.getsize(os.path.join(root, f)) for f in parquet)
        k = 1
        if target_file_bytes:
            k = max(1, -(-nbytes // target_file_bytes))
        if len(parquet) <= k:
            # already at (or under) the byte-target's own file count — a
            # partition whose data NEEDS more than max_files files must
            # not be rewritten to the same k on every trigger; the no-op
            # threshold is max(max_files_per_partition, k)
            continue
        tmp = root + _TMP_SUFFIX
        old = root + _OLD_SUFFIX
        (
            spark.read.parquet(root)
            .repartition(k)
            .write.mode("overwrite")
            .parquet(tmp)
        )
        # two renames instead of rmtree-then-rename: a crash at any point
        # leaves a repairable state (_repair_interrupted_swaps), never a
        # missing partition that needs manual surgery
        os.rename(root, old)
        os.rename(tmp, root)
        shutil.rmtree(old)
        rewritten.append(os.path.relpath(root, out_dir))
        dirs[:] = []  # don't descend into the dir we just swapped
    return rewritten


_TMP_SUFFIX = ".__compact_tmp"
_OLD_SUFFIX = ".__compact_old"


def _repair_interrupted_swaps(out_dir: str) -> None:
    """Finish or roll back a swap a previous process died inside: the tmp
    dir is complete iff Spark's _SUCCESS marker landed; the live partition
    is whichever of (root, old) still exists."""
    for root_dir, dirs, _files in os.walk(out_dir):
        for d in list(dirs):
            if not d.endswith(_TMP_SUFFIX):
                continue
            tmp = os.path.join(root_dir, d)
            live = tmp[: -len(_TMP_SUFFIX)]
            old = live + _OLD_SUFFIX
            complete = os.path.isfile(os.path.join(tmp, "_SUCCESS"))
            if os.path.isdir(live):
                # crashed before the first rename (or tmp incomplete):
                # the live dir is intact — drop the scratch
                shutil.rmtree(tmp)
            elif complete:
                os.rename(tmp, live)  # finish the swap
            elif os.path.isdir(old):
                shutil.rmtree(tmp)
                os.rename(old, live)  # roll back
        for d in list(dirs):
            if d.endswith(_OLD_SUFFIX):
                old = os.path.join(root_dir, d)
                if not os.path.isdir(old):
                    continue  # consumed by a rollback in the tmp loop
                live = old[: -len(_OLD_SUFFIX)]
                if os.path.isdir(live):
                    shutil.rmtree(old)  # swap finished; drop the old copy
                else:
                    os.rename(old, live)  # crashed between the renames
        # descend into partition dirs (nested partitioning nests the swap
        # scratch deeper) but never into scratch we just handled
        dirs[:] = [
            x for x in dirs
            if not x.endswith((_TMP_SUFFIX, _OLD_SUFFIX))
        ]


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
    The checkpoint offset log gives at-least-once ingest (a micro-batch
    retried after a crash between the append and the offset commit lands
    twice — plain parquet has no transactional commit; a table format
    upgrades this to exactly-once); compaction is idempotent (re-running
    on an already-compact partition is a no-op by the threshold check,
    and interrupted swaps repair on the next pass)."""

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

"""Per-phase attribution for the streaming twins (guide §1, r14 item 1):
wrap windowed.run_to_memory with an instrumented version that splits every
drain into start() / processAllAvailable() / stop() wall time and dumps the
per-micro-batch durationMs breakdown from query.recentProgress (walCommit,
queryPlanning, addBatch, getBatch, latestOffset, commitOffsets,
triggerExecution) plus state-store metrics.

Usage: python tools/profile_stream.py stream-validate stream-resample ...
       [--sf DIR] [--passes N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from rosbag2parquet_spark.session import get_spark
    from rosbag2parquet_spark.streaming import queries as qmod
    from rosbag2parquet_spark.streaming import windowed

    spark = get_spark("profile_stream")
    qs = entrymod.queries()

    from rosbag2parquet_spark.sources.catalog import TABLES, load_table

    for t in TABLES:
        load_table(spark, args.sf, t).limit(1).count()

    drains: list[dict] = []
    orig = windowed.run_to_memory

    def instrumented(df, name, mode="complete", state_partitions=None):
        import os as _os

        sp = df.sparkSession
        if state_partitions is None:
            state_partitions = (
                int(_os.environ.get("SPARK_GRAFT_STREAM_STATE_PARTITIONS", "8"))
                or None
            )
        old = sp.conf.get("spark.sql.shuffle.partitions")
        if state_partitions is not None:
            sp.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
        t0 = time.perf_counter()
        try:
            q = df.writeStream.outputMode(mode).format("memory").queryName(name).start()
        finally:
            if state_partitions is not None:
                sp.conf.set("spark.sql.shuffle.partitions", old)
        t1 = time.perf_counter()
        try:
            q.processAllAvailable()
            t2 = time.perf_counter()
            prog = [json.loads(p.json) for p in q.recentProgress]
        finally:
            q.stop()
        t3 = time.perf_counter()
        batches = []
        for p in prog:
            so = p.get("stateOperators") or []
            batches.append(
                {
                    "batchId": p.get("batchId"),
                    "numInputRows": p.get("numInputRows"),
                    "durationMs": p.get("durationMs"),
                    "state": [
                        {
                            k: s.get(k)
                            for k in (
                                "operatorName",
                                "commitTimeMs",
                                "numShufflePartitions",
                                "numRowsTotal",
                            )
                        }
                        for s in so
                    ],
                }
            )
        drains.append(
            {
                "sink": name,
                "mode": mode,
                "start_s": round(t1 - t0, 3),
                "drain_s": round(t2 - t1, 3),
                "stop_s": round(t3 - t2, 3),
                "batches": batches,
            }
        )

    windowed.run_to_memory = instrumented
    qmod.run_to_memory = instrumented
    try:
        for qname in args.queries:
            fn = qs[qname]
            for p in range(args.passes):
                drains.clear()
                spark.sparkContext.setJobDescription(f"profile:{qname}")
                t0 = time.perf_counter()
                df = fn(spark, args.sf)
                t1 = time.perf_counter()
                rows = len(df.toPandas())
                t2 = time.perf_counter()
                spark.sparkContext.setJobDescription(None)
                print(
                    f"\n=== {qname} pass {p}: total={t2 - t0:.3f}s "
                    f"build={t1 - t0:.3f}s fetch={t2 - t1:.3f}s rows={rows}"
                )
                for d in drains:
                    print(
                        f"  drain {d['sink']} ({d['mode']}): "
                        f"start={d['start_s']}s drain={d['drain_s']}s "
                        f"stop={d['stop_s']}s"
                    )
                    for b in d["batches"]:
                        print(
                            f"    batch {b['batchId']}: rows={b['numInputRows']} "
                            f"durationMs={b['durationMs']} state={b['state']}"
                        )
    finally:
        windowed.run_to_memory = orig
        qmod.run_to_memory = orig


if __name__ == "__main__":
    main()

"""Benchmark harness: run the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...},
"sf": ...}.

Each query is timed end-to-end: plan + execute + fetch (collect), i.e. the
full user-visible latency. The headline metric is total wall seconds across
the suite.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: headline set: one per operator family — relational agg, SQL (TPC-H Q1),
#: big join, window fns, as-of, sessionization, dedup (exact + LSH), text,
#: similarity, sink round-trip.
HEADLINE = [
    "groupby-agg",
    "sql",
    "join",
    "topk-per-group",
    "asof",
    "sessionize",
    "window-tumbling",
    "dedup-exact",
    "dedup-minhash-lsh",
    "text-stats",
    "quality-score",
    "knn",
    "embed-neardup",
    "seqno",
]


def main() -> None:
    import __spark_entry__ as entrymod
    from rosbag2parquet_spark.session import get_spark

    spark = get_spark("bench")
    qs = entrymod.queries()

    # warm the JVM, codegen, and the parquet footers of every fixture table
    # so the first timed query measures the query, not session startup
    from rosbag2parquet_spark.sources.catalog import TABLES, load_table

    for t in TABLES:
        load_table(spark, SF_DIR, t).limit(1).count()

    timings: dict[str, float] = {}
    t_all = time.perf_counter()
    for name in HEADLINE:
        fn = qs[name]
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)
        # Arrow-batched fetch: measures engine throughput, not py4j
        # row-at-a-time deserialization
        n = len(df.toPandas())
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {timings[name]}s ({n} rows)", file=sys.stderr)
    total = round(time.perf_counter() - t_all, 3)

    sf = os.path.basename(os.path.normpath(SF_DIR)).replace("sf", "")
    print(
        json.dumps(
            {
                "metric": "headline_suite_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()

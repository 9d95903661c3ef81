"""Per-query optimization probe (guide §1): time a named query like
bench.py does, but split the cost into
  build_s  — the ``fn(spark, sf_dir)`` call (plan construction + any
             internal actions: fit collects, localCheckpoints, streaming
             drains),
  exec_s   — the final ``toPandas()`` fetch (the terminal job), and
report min-of-N for each plus the host calib beside the sample, so an A/B
taken minutes apart carries its own drift covariate.

Usage: python tools/opt_measure.py QUERY [QUERY ...] [--passes N] [--sf DIR]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _calib() -> float:
    import numpy as np

    a = np.arange(1600 * 1600, dtype=np.float64).reshape(1600, 1600) / 1e6
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        (a @ a).sum()
        best = min(best, time.perf_counter() - t0)
    return round(best * 1000, 2)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--warm", action="store_true", help="run each query once at sf0.001 first")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from rosbag2parquet_spark.session import get_spark

    spark = get_spark("opt_measure")
    qs = entrymod.queries()
    from rosbag2parquet_spark.sources.catalog import TABLES, load_table

    for t in TABLES:
        load_table(spark, args.sf, t).limit(1).count()

    if args.warm:
        for name in args.queries:
            try:
                qs[name](spark, "/root/testdata/sf0.001").toPandas()
            except Exception as exc:
                print(f"# warm {name} failed: {exc}", file=sys.stderr)

    print(f"# calib_before={_calib()}ms")
    for name in args.queries:
        fn = qs[name]
        best_b = best_e = best_t = float("inf")
        rows = 0
        for p in range(args.passes):
            spark.sparkContext.setJobDescription(f"opt:{name}")
            t0 = time.perf_counter()
            df = fn(spark, args.sf)
            t1 = time.perf_counter()
            rows = len(df.toPandas())
            t2 = time.perf_counter()
            best_b = min(best_b, t1 - t0)
            best_e = min(best_e, t2 - t1)
            best_t = min(best_t, t2 - t0)
            spark.sparkContext.setJobDescription(None)
        print(
            f"{name}: total={best_t:.3f}s build={best_b:.3f}s "
            f"exec={best_e:.3f}s rows={rows}"
        )
    print(f"# calib_after={_calib()}ms")


if __name__ == "__main__":
    main()

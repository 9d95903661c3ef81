"""Interleaved A/B of named queries under two env settings, one session.

The shared-VM host drifts 2-5x within minutes, so sequential before/after
runs are confounded. This driver alternates A,B,A,B,... per query in ONE
Spark session and reports per-arm min + median — paired samples ride the
same drift.

Usage:
  python tools/ab_env.py VAR=a_val VAR=b_val -- QUERY [QUERY...] [--passes N]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    argv = sys.argv[1:]
    sep = argv.index("--")
    a_spec, b_spec = argv[:sep]
    queries = [a for a in argv[sep + 1 :] if not a.startswith("--")]
    passes = 4
    if "--passes" in argv:
        passes = int(argv[argv.index("--passes") + 1])
    var, a_val = a_spec.split("=", 1)
    _, b_val = b_spec.split("=", 1)

    import __spark_entry__ as entrymod
    from rosbag2parquet_spark.session import get_spark
    from rosbag2parquet_spark.sources.catalog import TABLES, load_table

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab_env")
    qs = entrymod.queries()
    for t in TABLES:
        load_table(spark, sf, t).limit(1).count()

    for name in queries:
        fn = qs[name]
        times: dict[str, list[float]] = {"A": [], "B": []}
        fn(spark, sf).toPandas()  # warm plan shapes once
        for p in range(passes):
            for arm, val in (("A", a_val), ("B", b_val)):
                if val == "":
                    os.environ.pop(var, None)
                else:
                    os.environ[var] = val
                t0 = time.perf_counter()
                fn(spark, sf).toPandas()
                times[arm].append(time.perf_counter() - t0)
        os.environ.pop(var, None)
        a, b = times["A"], times["B"]
        print(
            f"{name}: A(min={min(a):.3f} med={statistics.median(a):.3f}) "
            f"B(min={min(b):.3f} med={statistics.median(b):.3f}) "
            f"pairs={[f'{x:.2f}/{y:.2f}' for x, y in zip(a, b)]}"
        )


if __name__ == "__main__":
    main()

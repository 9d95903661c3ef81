"""Distributed Lloyd's k-means over the embeddings table — the iterative
class of algorithm the DataFrame API handles with a driver-side loop over
declarative steps (the pattern MLlib itself uses): per iteration, one
broadcast of K centroids + one narrow assignment pass + one groupBy mean.

Deterministic: init = the first K vectors by vec_id; fixed iteration count.
Declared as a rows-only query (`kmeans`) — iterative algorithms are exactly
the non-SQL-expressible case the driver contract carves out, and fp
summation order makes borderline assignments engine-specific anyway.

Scale notes: each iteration is one shuffle (the centroid groupBy — K×dim
partial sums map-side). Centroids live in a broadcast (K×dim doubles), never
in a join shuffle. Assignment is a codegen'd expression over the broadcast
array — no UDF. This is the real IVF coarse-quantizer trainer for
`knn-ivf` (README round-1 notes).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from rosbag2parquet_spark.functions.similarity import _as_double
from rosbag2parquet_spark.sources.catalog import load_table

K = 8
N_ITER = 5


def _sq_dist(vec: Column, centroid: list[float]) -> Column:
    """Squared L2 distance to a constant centroid — unrolled into a codegen
    arithmetic expression (centroid is a plan-time literal array)."""
    c = F.array(*[F.lit(float(x)) for x in centroid])
    return F.aggregate(
        F.zip_with(vec, c, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def assign_clusters(vecs: DataFrame, centroids: list[list[float]]) -> DataFrame:
    """Add `cluster` = argmin over centroid distances. The argmin is a
    least()-of-structs trick: min over (distance, index) pairs."""
    pairs = F.array(
        *[
            F.struct(
                _sq_dist(F.col("e"), c).alias("d"), F.lit(i).alias("i")
            )
            for i, c in enumerate(centroids)
        ]
    )
    return vecs.withColumn("cluster", F.array_min(pairs).getField("i"))


def kmeans_fit(
    vecs: DataFrame, k: int = K, n_iter: int = N_ITER
) -> tuple[list[list[float]], DataFrame]:
    """Lloyd's iterations; returns (centroids, assigned DataFrame)."""
    init = [
        r["e"]
        for r in vecs.orderBy("vec_id").limit(k).select("e").collect()
    ]
    centroids = [list(map(float, c)) for c in init]
    assigned = assign_clusters(vecs, centroids)
    for _ in range(n_iter):
        means = (
            assigned.select(
                "cluster", F.posexplode(F.col("e")).alias("pos", "x")
            )
            .groupBy("cluster", "pos")
            .agg(F.avg("x").alias("m"))
            .groupBy("cluster")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s.getField("m"),
                ).alias("c")
            )
            .collect()
        )
        by_cluster = {r["cluster"]: list(map(float, r["c"])) for r in means}
        centroids = [by_cluster.get(i, centroids[i]) for i in range(k)]
        assigned = assign_clusters(vecs, centroids)
    return centroids, assigned


def q_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster assignments + per-cluster sizes after 5 Lloyd's iterations
    (rows-only check: fp-order-sensitive borderline assignments make exact
    cross-engine value parity meaningless for iterative fitting)."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double("embedding").alias("e")
    )
    _, assigned = kmeans_fit(emb)
    return assigned.select("vec_id", "cluster")


QUERIES = {"kmeans": q_kmeans}
ORACLES: dict[str, str] = {}  # rows-only: iterative, fp-order-sensitive

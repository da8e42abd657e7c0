"""Distributed k-means (Lloyd) over embedding columns — corpus clustering
for training-data curation (domain balancing, dedup-aware sampling strata,
topic mixture analysis).

Scale design (the iterative-algorithm pattern, like operators/dedup
connected components):

- **Centroids live on the driver** (k x dim floats — a few KB) and enter each
  iteration's plan as literal arrays, so assignment is a pure map-side
  expression: no join, no shuffle to label a vector.
- **The update step shuffles k rows, not the corpus.** Per-dimension sums are
  computed as ``dim`` separate SUM aggregates over ``F.get(vec, i)`` — a
  hash aggregate with map-side partial combine; only (cluster, count,
  dim sums) rows cross the wire. The posexplode formulation (shuffle
  n x dim rows) is exactly what this avoids.
- **One pass per iteration**, fixed iteration cap + early stop on centroid
  drift; the per-iteration driver collect is k rows (the same sanctioned
  tiny-collect as the IVF centroid table).
- Deterministic: seeds are the k vectors with the smallest stable md5
  bucket of their id (engine-portable, no rand()), ties by id; argmin over
  (distance, cluster) struct breaks distance ties by lowest cluster index.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tesla_competitive_intelligence_etl_pipeline_spark.operators.sampling import stable_bucket


def _sq_dist(vec, centroid: list[float]):
    """Squared L2 distance between an array column and a literal centroid."""
    lit = F.array(*[F.lit(float(c)) for c in centroid])
    return F.aggregate(
        F.zip_with(vec, lit, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def assign_clusters(df: DataFrame, vec_col: str, centroids: list[list[float]]) -> DataFrame:
    """Label each row with its nearest centroid (map-side; no join). Ties on
    distance go to the lowest cluster index, so assignment is total."""
    pairs = F.array(
        *[
            F.struct(
                _sq_dist(F.col(vec_col).cast("array<double>"), c).alias("d"),
                F.lit(j).alias("j"),
            )
            for j, c in enumerate(centroids)
        ]
    )
    return df.withColumn("cluster", F.array_min(pairs).getField("j"))


def kmeans(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    max_iters: int = 10,
    tol: float = 1e-6,
) -> tuple[DataFrame, list[list[float]]]:
    """Lloyd's k-means. Returns (assignments df with a ``cluster`` column,
    final centroids). ``df`` is scanned once per iteration; cache it first
    if the upstream plan is expensive."""
    dim = len(df.select(vec_col).first()[0])

    # deterministic, engine-portable seeding: k lowest stable-bucket rows
    seeds = (
        df.select(id_col, F.col(vec_col).cast("array<double>").alias("v"))
        .orderBy(stable_bucket(F.col(id_col), 1 << 31).asc(), F.col(id_col).asc())
        .limit(k)
        .collect()
    )
    centroids = [list(r["v"]) for r in seeds]

    sum_aggs = [
        F.sum(F.get(F.col(vec_col).cast("array<double>"), i)).alias(f"s{i}")
        for i in range(dim)
    ]
    for _ in range(max_iters):
        assigned = assign_clusters(df, vec_col, centroids)
        stats = (
            assigned.groupBy("cluster")
            .agg(F.count("*").alias("n"), *sum_aggs)
            .collect()  # k rows x (dim + 2) values — driver-side by design
        )
        new_centroids = list(centroids)  # empty clusters keep their centroid
        for r in stats:
            new_centroids[r["cluster"]] = [r[f"s{i}"] / r["n"] for i in range(dim)]
        shift = max(
            sum((a - b) * (a - b) for a, b in zip(old, new))
            for old, new in zip(centroids, new_centroids)
        )
        centroids = new_centroids
        if shift < tol:
            break
    return assign_clusters(df, vec_col, centroids), centroids

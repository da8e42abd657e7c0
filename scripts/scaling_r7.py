#!/usr/bin/env python
"""Measured-scaling protocol, round 7 (VERDICT r6 item 5): locate the
literal-vs-join k-means crossover. Round 6 measured ONE point (k=128, 16x
sf0.1 embeddings: literal 19.8 s vs join 33.2 s — literal 1.7x faster) and
stated the switch rule only as the ~10^8-float driver/plan bound. This
sweep holds the corpus fixed (16x replicated sf0.1 embeddings = 32k rows,
dim 64, 3 Lloyd iterations, identical seeding/rounding so both variants
train the same model) and scales k through 128 / 512 / 1024, where the
literal form's per-iteration costs that grow with k x dim — the centroid
literal's plan build + serialization to every task, and the
collect-back of k centroids per iteration — chase the join variant's
k-independent per-iteration price (broadcast hash join fan-out + the
groupBy shuffles).

Prints a markdown fragment for SCALING.md. Method matches scaling_r5/r6:
local[32], warm-up run per config, cache cleared between runs, idle box
(abort reading if loadavg_before says otherwise — this box carries ~25%
run-to-run noise when loaded).
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from tesla_competitive_intelligence_etl_pipeline_spark.operators import clustering  # noqa: E402
from tesla_competitive_intelligence_etl_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
MULT = 16
ITERS = 3


def main() -> None:
    spark = get_spark("scaling-r7")
    spark.sparkContext.setLogLevel("ERROR")
    print(f"loadavg_before: {os.getloadavg()[0]:.2f}")

    emb = (
        spark.read.parquet(SF_DIR + "/embeddings.parquet")
        .select("vec_id", "embedding")
        .withColumn("i", F.explode(F.sequence(F.lit(0), F.lit(MULT - 1))))
        .select(
            (F.col("vec_id") + F.col("i") * 1_000_000).alias("vec_id"),
            "embedding",
        )
    )

    print(f"## literal vs join k-means crossover ({MULT}x, {ITERS} iters)")
    print("| k | literal floats | kmeans (s) | kmeans_df (s) | ratio df/lit |")
    print("|---|---|---|---|---|")
    for k in (128, 512, 1024):
        walls = {}
        for tag, fn in (("lit", clustering.kmeans), ("df", clustering.kmeans_df)):

            def run():
                assigned, cents = fn(
                    emb, k=k, max_iters=ITERS, round_decimals=6
                )
                assigned.write.format("noop").mode("overwrite").save()

            run()  # warm
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            run()
            walls[tag] = round(time.perf_counter() - t0, 1)
            spark.catalog.clearCache()
        ratio = round(walls["df"] / walls["lit"], 2)
        print(
            f"| {k} | {k * 64:,} | {walls['lit']} | {walls['df']} | {ratio} |",
            flush=True,
        )
    print(f"loadavg_after: {os.getloadavg()[0]:.2f}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Measured-scaling protocol, round 6 (VERDICT r5 item 8): SemDeDup at
PRODUCTION-SHAPED k. The r5 sweep held cluster size constant only up to
k=32; this extends the same fixed-cluster-size protocol (sf0.1 embeddings
explode-replicated with disjoint ids, threshold 0.4, 5 Lloyd iterations,
cluster size pinned at ~250 vectors) to k=128 and k=512 to confirm:

  1. the assignment term O(n·k·dim) stays sub-dominant (the operator's
     centroid argmin is ONE 2-D literal transform per row — watch wall
     clock vs the k-scaled trend, not just fit a curve), and
  2. the k x dim centroid literal (512 x 64 = 32,768 doubles here) does
     not hit a plan-size / codegen cliff before the documented driver-
     memory escape hatch (operators/clustering.py docstring, ~10^8
     floats) — the script prints whether the executed plan still carries
     WholeStageCodegen spans at each k.

Method matches scripts/scaling_r5.py: local[32], cache cleared between
runs, one warm-up per config, idle box; prints a markdown fragment for
SCALING.md.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from tesla_competitive_intelligence_etl_pipeline_spark.operators import dedup as dd  # noqa: E402
from tesla_competitive_intelligence_etl_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    spark = get_spark("scaling-r6")
    spark.sparkContext.setLogLevel("ERROR")
    print(f"loadavg_before: {os.getloadavg()[0]:.2f}")
    print("## SemDeDup at production-shaped k (cluster size pinned ~250)")
    print("| volume | k | wall (s) | survivors | codegen |")
    print("|---|---|---|---|---|")
    for mult, kk in ((1, 8), (4, 32), (16, 128), (64, 512)):
        emb = (
            spark.read.parquet(SF_DIR + "/embeddings.parquet")
            .select("vec_id", "embedding")
            .withColumn("i", F.explode(F.sequence(F.lit(0), F.lit(mult - 1))))
            .select(
                (F.col("vec_id") + F.col("i") * 1_000_000).alias("vec_id"),
                "embedding",
            )
        )

        def run():
            out = dd.semantic_dedup(emb, k=kk, threshold=0.4).select("vec_id")
            out.write.format("noop").mode("overwrite").save()
            return out

        run()  # warm
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        out = run()
        dt = round(time.perf_counter() - t0, 1)
        spark.catalog.clearCache()
        survivors = out.count()
        # does the big centroid literal still compile? codegen'd stages are
        # marked "*(n)" in the executed-plan string (the literal word
        # "WholeStageCodegen" appears only in explain("formatted") — the
        # first run of this script misdetected with it)
        plan = out._jdf.queryExecution().executedPlan().toString()
        codegen = "yes" if "*(" in plan else "NO (fell back)"
        spark.catalog.clearCache()
        print(f"| {mult}x | {kk} | {dt} | {survivors} | {codegen} |", flush=True)
    print(f"loadavg_after: {os.getloadavg()[0]:.2f}")


if __name__ == "__main__":
    main()

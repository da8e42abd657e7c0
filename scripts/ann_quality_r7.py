#!/usr/bin/env python
"""Measured-scaling protocol, round 7: the IVF-PQ accuracy/latency dial.

The combined index (clustering.build_ivfpq_index / ivfpq_topk_indexed) has
two knobs a deployment tunes: ``n_probe`` (how many cells the ADC scan
reads — the latency lever, scan cost ~ n_probe/n_cells of the codes table)
and ``refine`` (shortlist width for the exact re-rank — the recall-repair
lever, cost ~ k*refine float-vector fetches). This sweep measures, at
sf0.1 (5k vectors, dim 64, m=4 k_codes=16 codebooks trained on the 20%
stable sample), recall@10 against brute-force cosine and ONLINE search
wall time for a grid of both knobs, over 20 query vectors.

Recall is averaged over queries; wall is the median of per-query times
(one warm pass first). Prints a markdown fragment for SCALING.md. Method
matches scaling_r5/r6/r7: local[32], idle box (abort if loadavg says
otherwise — this box carries ~25% noise when loaded).
"""

from __future__ import annotations

import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from tesla_competitive_intelligence_etl_pipeline_spark.operators import (  # noqa: E402
    clustering,
    similarity as sim,
)
from tesla_competitive_intelligence_etl_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
K = 10
N_QUERIES = 20


def _measure(spark, path, books, queries, truth, n_probe, refine):
    recalls, walls = [], []
    warm = True
    for qid, qvec in queries:
        def run():
            return {
                r.vec_id
                for r in clustering.ivfpq_topk_indexed(
                    spark, path, qvec, k=K, n_probe=n_probe,
                    refine=refine, codebooks=books,
                ).collect()
            }

        if warm:
            run()
            warm = False
        t0 = time.perf_counter()
        got = run()
        walls.append(time.perf_counter() - t0)
        # the query vector itself is not excluded by the operator; drop it
        # from both sides for the recall denominator
        recalls.append(len((got - {qid}) & truth[qid]) / K)
    return statistics.mean(recalls), statistics.median(walls)


def main() -> None:
    spark = get_spark("ann-quality-r7")
    spark.sparkContext.setLogLevel("ERROR")
    print(f"loadavg_before: {os.getloadavg()[0]:.2f}")

    emb = spark.read.parquet(SF_DIR + "/embeddings.parquet").select(
        "vec_id", "embedding", "label"
    )
    n_cells = emb.select("label").distinct().count()
    import tempfile

    queries = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in emb.orderBy("vec_id").limit(N_QUERIES).collect()
    ]
    truth = {
        qid: {r.vec_id for r in sim.topk_neighbors_of(emb, qid, k=K).collect()}
        for qid, _ in queries
    }

    # Part 1 — the COMPRESSION lever: recall vs m at a fixed generous probe.
    # The sf embeddings are (deliberately) near-structureless random vectors
    # — the hardest ANN case: true neighbors are only weakly separated, so
    # ADC quantization error dominates unless the code is fine enough.
    indexes = {}
    print(
        f"## IVF-PQ compression lever ({N_QUERIES} queries, k={K}, "
        f"{n_cells} cells, n_probe=4, refine=8, k_codes=16)"
    )
    print("| m | code bytes/vec | compression vs 256 B floats | recall@10 |")
    print("|---|---|---|---|")
    for m in (4, 8, 16, 32):
        path = tempfile.mkdtemp(prefix=f"ann_quality_m{m}_")
        books = clustering.build_ivfpq_index(
            emb, path, m=m, k=16, max_iters=2, train_fraction=0.2,
            round_decimals=6,
        )
        indexes[m] = (path, books)
        recall, _ = _measure(spark, path, books, queries, truth, 4, 8)
        print(
            f"| {m} | {m} | {256 // m}x | {recall:.3f} |",
            flush=True,
        )

    # Part 2 — the probe/refine dial at the best-fidelity code (m=32)
    path, books = indexes[32]
    print(
        f"\n## IVF-PQ probe/refine dial (m=32, k_codes=16, {n_cells} cells)"
    )
    print("| n_probe | refine | recall@10 | median search (s) |")
    print("|---|---|---|---|")
    for n_probe in (1, 2, 4, 8):
        for refine in (1, 4, 8):
            recall, wall = _measure(
                spark, path, books, queries, truth, n_probe, refine
            )
            print(
                f"| {n_probe} | {refine} | {recall:.3f} | {wall:.3f} |",
                flush=True,
            )
    print(f"loadavg_after: {os.getloadavg()[0]:.2f}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Measured-scaling protocol, round 9: physical purge cost vs the full
re-index (VERDICT r8 item 2).

ivfpq_index_delete is O(batch) logical takedown; before r9 the only path
to PHYSICAL erasure was rebuilding the index. compact_ivfpq_index(
purge_tombstones=True) claims O(touched cells): one id-column scan finds
the cells holding tombstoned rows, only those cells rewrite. Two sweeps
make the claim a number (corpus fixed at 200k dim-16 vectors, 32 cells):

A. CONFINED deletes: tombstone all ids of 1 / 4 / 16 cells — purge wall
   time should scale with the touched-cell count, with the flat
   id-column locate scan as the floor.
B. Purge vs rebuild at the 4-cell point: the purge must beat
   build_ivfpq_index on the survivors by a wide margin (the rebuild
   re-trains codebooks and re-encodes the whole corpus).

Method matches scaling_r5..r8: local[32], idle-box guard, warm-up
throwaway, cache cleared between runs; synthetic vectors derived from
xxhash64(id) so the corpus is reproducible without testdata files.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from tesla_competitive_intelligence_etl_pipeline_spark.operators import clustering  # noqa: E402
from tesla_competitive_intelligence_etl_pipeline_spark.session import get_spark  # noqa: E402

DIM = 16
N_CELLS = 32
N = 200_000


def vectors(spark):
    cols = [
        (F.pmod(F.xxhash64(F.col("id") * (d + 1)), F.lit(1000)) / 500.0 - 1.0).alias(
            f"c{d}"
        )
        for d in range(DIM)
    ]
    return spark.range(N).select(
        F.col("id").alias("vec_id"),
        F.array(*cols).cast("array<double>").alias("embedding"),
        F.pmod(F.xxhash64("id"), F.lit(N_CELLS)).cast("int").alias("label"),
    )


def main() -> None:
    if os.getloadavg()[0] > 2.0:
        sys.exit(f"box busy (loadavg {os.getloadavg()[0]:.1f}); rerun idle")
    spark = get_spark()
    emb = vectors(spark).localCheckpoint(eager=True)

    base = tempfile.mkdtemp(prefix="purge_sweep_") + "/index"
    t0 = time.perf_counter()
    clustering.build_ivfpq_index(emb, base, m=4, k=16, max_iters=2,
                                 train_fraction=0.05, round_decimals=6)
    t_build = round(time.perf_counter() - t0, 1)
    print(f"corpus {N} x dim{DIM}, {N_CELLS} cells; initial build {t_build} s")

    print(f"{'cells deleted':>14} {'tombstoned rows':>16} {'purge s':>8}")
    for n_cells in (1, 4, 16):
        path = tempfile.mkdtemp(prefix=f"purge_{n_cells}_") + "/index"
        shutil.copytree(base, path)
        doomed = emb.filter(F.col("label") < n_cells).select("vec_id")
        clustering.ivfpq_index_delete(spark, path, doomed)
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        out = clustering.compact_ivfpq_index(
            spark, path, max_files_per_cell=10_000, purge_tombstones=True
        )
        dt = round(time.perf_counter() - t0, 1)
        print(f"{n_cells:>14} {out['purged_rows']:>16} {dt:>8}")
        if n_cells == 4:
            # B: the full-rebuild alternative on the survivors
            survivors = emb.filter(F.col("label") >= 4)
            rb = tempfile.mkdtemp(prefix="purge_rebuild_") + "/index"
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            clustering.build_ivfpq_index(
                survivors, rb, m=4, k=16, max_iters=2,
                train_fraction=0.05, round_decimals=6,
            )
            t_rb = round(time.perf_counter() - t0, 1)
            print(f"    4-cell purge {dt} s vs survivor re-index {t_rb} s "
                  f"({round(t_rb / dt, 1)}x)")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Measured-scaling protocol, round 8: the CDC -> ANN-index-refresh loop
(x3_cdc_index_refresh's offline half). DEPLOYMENT.md's steady-state story
is: corpus increments land in the merge gold table, read_changes discovers
them at O(changed buckets) diff I/O, and ivfpq_index_append folds them into
the live index at O(batch) — the base corpus is never re-read. Two sweeps
turn that into numbers:

A. FIXED base (200k vectors), increment sizes 2k/8k/32k/128k:
   refresh wall time (CDC read + assign + encode + two-table atomic commit)
   should grow ~linearly in the increment beyond a plan floor.
B. FIXED increment (8k), base sizes 50k/200k/800k:
   refresh wall time should be FLAT — a 16x larger table must not make the
   refresh slower (the O(table) work happened once, at build time).

Vectors are synthetic dim-16 floats derived from xxhash64(id) per
dimension; 32 IVF cells via pmod(xxhash64). Method matches
scaling_r5/r6/r7: local[32], idle box (abort on loadavg), warm-up
throwaway, cache cleared between runs.
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
from tesla_competitive_intelligence_etl_pipeline_spark.streaming import events as strm  # noqa: E402

DIM = 16
N_CELLS = 32
N_BUCKETS = 32


def _vectors(spark, lo: int, hi: int):
    """Deterministic synthetic embeddings for ids [lo, hi)."""
    return spark.range(lo, hi).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(DIM - 1)),
            lambda i: (
                F.pmod(F.xxhash64(F.col("id") * DIM + i), F.lit(2000)) / 1000.0
                - 1.0
            ).cast("float"),
        ).alias("embedding"),
        F.pmod(F.xxhash64("id"), F.lit(N_CELLS)).cast("string").alias("label"),
    )


def _setup(spark, n_base: int, tmp: str) -> tuple[str, str]:
    target = tmp + "/corpus"
    strm.merge_table(
        _vectors(spark, 0, n_base), target, keys=["vec_id"],
        order_cols=["vec_id"], n_buckets=N_BUCKETS,
    )
    strm.snapshot_merge_table(target, "s0")
    index = tmp + "/index"
    clustering.build_ivfpq_index(
        strm.read_merged(spark, target, snapshot="s0").select(
            "vec_id", "embedding", "label"
        ),
        index, m=4, k=16, max_iters=2, train_fraction=0.05, round_decimals=6,
    )
    return target, index


def _refresh(spark, target: str, index: str, lo: int, hi: int, tag_ix: int) -> float:
    """One steady-state cycle: merge the increment, pin, CDC-diff since the
    previous pin, append the inserts to the index. Timed portion = the
    ONLINE consumer (CDC read + append); the merge itself is the producer's
    ingest, reported separately by sweep A's caller if needed."""
    prev, cur = f"s{tag_ix - 1}", f"s{tag_ix}"
    strm.merge_table(
        _vectors(spark, lo, hi), target, keys=["vec_id"],
        order_cols=["vec_id"], n_buckets=N_BUCKETS,
    )
    strm.snapshot_merge_table(target, cur)
    t0 = time.monotonic()
    changed = strm.read_commit_changes(
        spark, target, since=prev, until=cur
    ).filter(F.col("_change_type") == "insert").select("vec_id", "embedding")
    n = clustering.ivfpq_index_append(spark, index, changed)
    dt = time.monotonic() - t0
    assert n == hi - lo, (n, hi - lo)
    spark.catalog.clearCache()
    return dt


def main() -> None:
    load = os.getloadavg()[0]
    if load > 2.0:
        print(f"ABORT: loadavg {load:.2f} > 2 — measure on an idle box")
        sys.exit(1)
    spark = get_spark("scaling-cdc-index")
    spark.sparkContext.setLogLevel("ERROR")
    import tempfile

    # ---- sweep A: fixed base, growing increment --------------------------
    n_base = 200_000
    tmp = tempfile.mkdtemp(prefix="cdcidx_a_")
    t0 = time.monotonic()
    target, index = _setup(spark, n_base, tmp)
    print(f"# A: base build {n_base} rows: {time.monotonic() - t0:.1f} s")
    nxt = n_base
    # warm-up throwaway (JVM/codegen/lease paths)
    _refresh(spark, target, index, nxt, nxt + 1000, 1)
    nxt += 1000
    tag = 2
    print("increment_rows refresh_sec")
    for inc in (2_000, 8_000, 32_000, 128_000):
        dt = _refresh(spark, target, index, nxt, nxt + inc, tag)
        print(f"{inc} {dt:.2f}")
        nxt += inc
        tag += 1

    # ---- sweep B: fixed increment, growing base --------------------------
    # Also times the two CDC read paths for the SAME 8k-increment range:
    # the state diff re-reads every changed bucket's full content on both
    # sides (8k hash-scattered keys touch all buckets -> it grows with the
    # base), while the commit-log read unions only the captured delta
    # files (expected flat — the r8 fix for exactly this curve).
    print("base_rows refresh_sec_8k statediff_read_sec commitlog_read_sec")
    for n_base in (50_000, 200_000, 800_000):
        tmp = tempfile.mkdtemp(prefix=f"cdcidx_b{n_base}_")
        target, index = _setup(spark, n_base, tmp)
        _refresh(spark, target, index, n_base, n_base + 1000, 1)  # warm
        dt = _refresh(spark, target, index, n_base + 1000, n_base + 9000, 2)
        t0 = time.monotonic()
        strm.read_changes(spark, target, since="s1", until="s2").count()
        dt_diff = time.monotonic() - t0
        spark.catalog.clearCache()
        t0 = time.monotonic()
        strm.read_commit_changes(spark, target, since="s1", until="s2").count()
        dt_log = time.monotonic() - t0
        spark.catalog.clearCache()
        print(f"{n_base} {dt:.2f} {dt_diff:.2f} {dt_log:.2f}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Measured-scaling protocol, round 7: CDC diff cost vs changed-bucket
fraction. DEPLOYMENT.md claims read_changes I/O is O(changed buckets), not
O(table) — the manifests are diffed driver-side and pointer-equal buckets
are skipped entirely. This sweep makes that a number instead of a claim:

- gold table: 2M synthetic docs (doc_id, 200-char payload), 64 buckets,
  one merge, snapshot 'base';
- increments touching ~{1, 4, 16, 64} buckets (keys chosen per bucket via
  the same pmod(xxhash64) routing), each merged then diffed with
  read_changes(since='base', until=tag);
- timed: the full diff plan (count() over the change rows) per increment,
  warm run after a throwaway, cache cleared between runs.

Expect wall time ~linear in CHANGED buckets (each changed bucket is read
on both sides + full-outer joined) with a flat floor (session/stage
fixed costs); the 64/1 ratio is the headline. Method matches
scaling_r5/r6/r7: local[32], idle box (abort if loadavg says otherwise —
this box carries ~25% noise when loaded).
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from tesla_competitive_intelligence_etl_pipeline_spark.session import get_spark  # noqa: E402
from tesla_competitive_intelligence_etl_pipeline_spark.streaming import events as strm  # noqa: E402

N_ROWS = 2_000_000
N_BUCKETS = 64


def main() -> None:
    load = os.getloadavg()[0]
    if load > 2.0:
        print(f"ABORT: loadavg {load:.2f} > 2 — measure on an idle box")
        sys.exit(1)
    spark = get_spark("scaling-cdc")
    import tempfile

    target = tempfile.mkdtemp(prefix="cdc_scale_") + "/gold"
    base = spark.range(N_ROWS).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("payload-"), F.col("id"),
                 F.lit("x" * 200)).alias("text"),
    )
    t0 = time.monotonic()
    strm.merge_table(base, target, keys=["doc_id"], order_cols=["doc_id"],
                     n_buckets=N_BUCKETS)
    print(f"# base merge of {N_ROWS} rows / {N_BUCKETS} buckets: "
          f"{time.monotonic() - t0:.1f} s")
    strm.snapshot_merge_table(target, "base")

    # pick ~1000 update keys per wanted bucket from a deterministic probe
    probe = spark.range(0, N_ROWS, 97).select(
        F.col("id").alias("doc_id"),
        F.pmod(F.xxhash64("doc_id"), F.lit(N_BUCKETS)).alias("b"),
    )
    rows = []
    for want in (1, 4, 16, 64):
        keys = (
            probe.filter(F.col("b") < want)
            .limit(1000 * want)
            .select("doc_id")
        )
        batch = keys.select(
            "doc_id", F.concat(F.lit("updated-"), F.col("doc_id")).alias("text")
        )
        tag = f"after_{want}"
        strm.merge_table(batch, target, keys=["doc_id"],
                         order_cols=["doc_id"], n_buckets=N_BUCKETS)
        strm.snapshot_merge_table(target, tag)
        # changed buckets between base and tag
        m1 = strm._load_snapshot(target, "base")["buckets"]
        m2 = strm._load_snapshot(target, tag)["buckets"]
        changed = sum(1 for b in set(m1) | set(m2) if m1.get(b) != m2.get(b))
        # throwaway then timed
        for _ in range(2):
            spark.catalog.clearCache()
            t0 = time.monotonic()
            n = strm.read_changes(spark, target, since="base", until=tag).count()
            dt = time.monotonic() - t0
        rows.append((want, changed, n, dt))
        print(f"buckets~{want}: changed={changed} change_rows={n} {dt:.2f} s")

    print("\n| increment touches | changed buckets | change rows | diff s |")
    print("|---|---|---|---|")
    for want, changed, n, dt in rows:
        print(f"| ~{want} buckets | {changed} | {n} | {dt:.2f} |")
    r0, r3 = rows[0][3], rows[-1][3]
    print(f"\n64-bucket vs 1-bucket diff cost ratio: {r3 / r0:.1f}x")


if __name__ == "__main__":
    main()

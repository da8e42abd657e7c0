#!/usr/bin/env python
"""sf0.1 -> sf1 scaling exponents (VERDICT r9 item 5): time the FROZEN
headline 16 plus the big iterative entries at both scale points (sf1 from
scripts/make_sf1.py — 10x volume, 10x distinct keys) and report the
per-query scaling exponent  e = log10(t_sf1 / t_sf0.1)  (e = 1 -> linear,
e < 1 -> sublinear fixed-cost amortization, e > 1 -> superlinear — needs a
named cause in SCALING.md).

Protocol: local[32] (the bench box), one warm-up pass per query at each SF
(session/compile cost out), then the timed pass; caches cleared between
SFs. Run on an otherwise-idle box; prints a markdown fragment for
SCALING.md.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tesla_competitive_intelligence_etl_pipeline_spark.session import get_spark  # noqa: E402
from tesla_competitive_intelligence_etl_pipeline_spark.plans import load_registry  # noqa: E402
from bench import HEADLINE  # noqa: E402

EXTRA = [  # the big iterative / quadratic-risk entries beyond the headline
    "x3_kmeans_df_clusters",
    "x3_kmeans_clusters",
    "x2_cluster_dedup",
    "x2_near_dedup_canonical",
    "tpch_suite",
]

SF01 = "/root/testdata/sf0.1"
SF1 = "/root/repo/.localdata/sf1"


def run(spark, fn, sf):
    t0 = time.monotonic()
    df = fn(spark, sf)
    df.write.format("noop").mode("overwrite").save()
    return time.monotonic() - t0


def main() -> None:
    import math

    print(f"loadavg at start: {os.getloadavg()[0]:.2f}")
    spark = get_spark("scaling_sf1")
    spark.sparkContext.setLogLevel("ERROR")
    reg = load_registry()
    names = [n for n in HEADLINE + EXTRA if n in reg]
    rows = []
    for name in names:
        fn = reg[name][0]
        t = {}
        for sf in (SF01, SF1):
            run(spark, fn, sf)  # warm-up (compile + source caches)
            t[sf] = run(spark, fn, sf)
            spark.catalog.clearCache()
        e = math.log10(t[SF1] / t[SF01])
        rows.append((name, t[SF01], t[SF1], e))
        print(f"{name:32s} sf0.1 {t[SF01]:7.2f}s  sf1 {t[SF1]:7.2f}s  exp {e:5.2f}", flush=True)
    print("\n| query | sf0.1 s | sf1 s | exponent |")
    print("| --- | --- | --- | --- |")
    for name, a, b, e in rows:
        print(f"| {name} | {a:.2f} | {b:.2f} | {e:.2f} |")


if __name__ == "__main__":
    main()

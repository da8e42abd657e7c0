#!/usr/bin/env python
"""Round-13 optimization harness: time individual registry queries in
isolation (guide §1.1/§1.4 — noop sink, labeled jobs, cache cleared between
passes) so one query can be iterated on without paying the full bench.

Usage:
  python scripts/r13_measure.py [--passes N] [--sf DIR] name [name ...]

Prints one JSON line: {"sf": ..., "passes": N, "queries": {name: [sec,...]}}
Median is the comparison number; raw passes are kept so noise is visible.
Not part of the driver bench contract — bench.py stays the artifact of
record; this is the guide §1 isolation tool.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--no-warmup", action="store_true")
    args = ap.parse_args()

    from tesla_competitive_intelligence_etl_pipeline_spark.session import get_spark

    spark = get_spark("r13-measure")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    queries = entrymod.queries()
    unknown = [n for n in args.names if n not in queries]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    if not args.no_warmup:
        # same steady-state warmup posture as bench.py: JVM/codegen + Arrow
        queries["agg_global_count"](spark, args.sf).collect()
        queries["x10_pandas_udf_tokens"](spark, args.sf).write.format("noop").mode(
            "overwrite"
        ).save()
        spark.catalog.clearCache()

    out: dict[str, list[float]] = {}
    for name in args.names:
        times = []
        for i in range(args.passes):
            spark.sparkContext.setJobDescription(f"r13-measure {name} pass{i}")
            t0 = time.perf_counter()
            queries[name](spark, args.sf).write.format("noop").mode("overwrite").save()
            times.append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
        out[name] = times
        med = sorted(times)[len(times) // 2]
        print(f"# {name}: median {med:.3f}s  passes {times}", file=sys.stderr)
    print(json.dumps({"sf": args.sf, "passes": args.passes, "queries": out}))


if __name__ == "__main__":
    main()

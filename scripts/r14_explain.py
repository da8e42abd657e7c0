#!/usr/bin/env python
"""Round-13 plan capture: write `.explain("formatted")` output for registry
queries to plans/r14/<name>_<tag>.txt (guide §1 / §7.2 — the committed
evidence for every plan claim in OPTIMIZATION_r14.md).

Usage:
  python scripts/r14_explain.py --tag before name [name ...]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--tag", required=True)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--outdir", default=None, help="override plans/r14 (e.g. capture before-plans from a worktree into the main repo)")
    args = ap.parse_args()

    from tesla_competitive_intelligence_etl_pipeline_spark.session import get_spark

    spark = get_spark("r14-explain")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    queries = entrymod.queries()
    outdir = Path(args.outdir) if args.outdir else REPO / "plans" / "r14"
    outdir.mkdir(parents=True, exist_ok=True)

    jvm = spark._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    for name in args.names:
        if name not in queries:
            print(f"# skip unknown {name}", file=sys.stderr)
            continue
        df = queries[name](spark, args.sf)
        txt = df._jdf.queryExecution().explainString(mode)
        path = outdir / f"{name}_{args.tag}.txt"
        path.write_text(txt)
        n_exchange = txt.count("Exchange")
        print(f"# {name}: {len(txt)} chars, {n_exchange} Exchange mentions -> {path}")
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Focused driver-gate oracle replay: run SELECTED registry entries through
__spark_entry__ on a vanilla session (the verify-skill recipe) and compare
each against its DuckDB oracle — the per-change correctness check of the
r14 optimization loop. Entries without an oracle run rows-only.

Usage: python scripts/r14_replay.py [--sf DIR] name [name ...]
       python scripts/r14_replay.py --all            # entire registry
Diagnostic tool — the full verify-skill replay stays the round gate.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--all", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as e
    from tests.oracle_harness import compare, duck_connection

    qs, osql = e.queries(), e.oracle_sql()
    names = list(qs) if args.all else args.names
    unknown = [n for n in names if n not in qs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")
    con = duck_connection(args.sf)
    bad = 0
    for name in names:
        sql = osql.get(name)
        if sql is None:
            n = qs[name](spark, args.sf).count()
            sys.stdout.write(f"{name} rows-only n={n}\n")
            sys.stdout.flush()
            continue
        probs = compare(qs[name](spark, args.sf), con, sql, name)
        bad += bool(probs)
        sys.stdout.write(f"{name} {'MISMATCH' if probs else 'OK'}\n")
        for p in probs[:2]:
            sys.stdout.write(f"    {p[:300]}\n")
        sys.stdout.flush()
    sys.stdout.write(f"TOTAL mismatches: {bad}\n")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()

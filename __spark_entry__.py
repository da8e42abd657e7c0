"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship query on /root/testdata/sf0.001 (smoke, rows>0)
queries()     — one entry per implemented SURVEY.md §2 operator
oracle_sql()  — DuckDB twin per query (omitted => rows-only check)

All real logic lives in tesla_competitive_intelligence_etl_pipeline_spark/;
this module only adapts the registry to the driver's calling convention.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from tesla_competitive_intelligence_etl_pipeline_spark.plans import load_registry  # noqa: E402

REGISTRY = load_registry()


def _configure(spark: SparkSession) -> SparkSession:
    """Apply the engine's session semantics to a driver-provided session
    (ANSI off for cast->null semantics, UTC, ns-timestamp read path)."""
    for k, v in {
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.ansi.enabled": "false",
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.legacy.parquet.nanosAsLong": "true",
        # small-SF correctness runs don't need the 200-partition default;
        # AQE re-coalesces anyway, this just trims fixed per-stage overhead
        "spark.sql.shuffle.partitions": "32",
    }.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # static/immutable conf on this session — engine uses try_* anyway
    return spark


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    spark = _configure(spark)
    fn, _ = REGISTRY["flagship_customer_revenue"]
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            return fn(_configure(spark), sf_dir)

        return run

    return {name: wrap(fn) for name, (fn, _) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_, sql) in REGISTRY.items() if sql is not None}

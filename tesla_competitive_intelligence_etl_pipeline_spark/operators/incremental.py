"""Incremental aggregate maintenance (materialized-view refresh).

The 100 TB refresh pattern: a stored rollup is never recomputed from the
full history — only the new partition (day/hour) is aggregated and MERGED
into the stored state. That requires the aggregate state to be commutative
and mergeable: COUNT and SUM merge by addition, MIN/MAX by min/max, AVG is
derived (sum/count) at read time, never stored.

``merge_rollups`` re-aggregates a union of partial states; because every
component is partial-aggregable, Spark computes map-side partials on each
side and the merge shuffles only (key, state) rows — state size, not data
size. Equality with a full recompute is the registered query's oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tesla_competitive_intelligence_etl_pipeline_spark.operators import aggregates as agg

# state columns produced by rollup_state / consumed by merge_rollups
_STATE = ("cnt", "sum_value", "min_value", "max_value")


def rollup_state(df: DataFrame, keys: list[str], value: Column) -> DataFrame:
    """Mergeable per-key aggregate state over one data slice (one refresh's
    input partition). SUM uses the exact decimal accumulator so merge order
    cannot change the result."""
    return df.groupBy(*keys).agg(
        F.count("*").alias("cnt"),
        F.sum(value.cast("decimal(38,6)")).alias("sum_value"),
        F.min(value).alias("min_value"),
        F.max(value).alias("max_value"),
    )


def merge_rollups(*states: DataFrame) -> DataFrame:
    """Merge any number of per-slice states into one (same schema). The
    stored rollup is just the running merge of every slice ever ingested."""
    if not states:
        raise ValueError("need at least one state")
    keys = [c for c in states[0].columns if c not in _STATE]
    out = states[0]
    for s in states[1:]:
        out = out.unionByName(s)
    return out.groupBy(*keys).agg(
        F.sum("cnt").alias("cnt"),
        F.sum("sum_value").alias("sum_value"),
        F.min("min_value").alias("min_value"),
        F.max("max_value").alias("max_value"),
    )


def finalize(rollup: DataFrame) -> DataFrame:
    """Read-time projection of the stored state: exact double SUM and the
    derived AVG (exact sum / count — never a stored running average)."""
    keys = [c for c in rollup.columns if c not in _STATE]
    return rollup.select(
        *keys,
        F.col("cnt").cast("long").alias("cnt"),
        F.col("sum_value").cast("double").alias("value_sum"),
        (F.col("sum_value").cast("double") / F.col("cnt").cast("double")).alias("value_avg"),
        F.col("min_value").alias("value_min"),
        F.col("max_value").alias("value_max"),
    )

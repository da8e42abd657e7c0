"""Aggregation operators AGG-1..AGG-8 + V-6 summary (SURVEY.md §2.5, §2.7).

All hash aggregates with map-side partial aggregation (free in Spark).
Double sums are computed through an exact decimal accumulator
(``exact_sum``) so results are independent of partitioning/summation order —
required for oracle hash-equality and, at 100 TB, for run-to-run
reproducibility of financial totals.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def exact_sum(c: Column, scale: int = 6) -> Column:
    """Order-independent sum of a double column: per-row cast to an exact
    decimal (wide enough to never overflow at 100 TB row counts), exact
    decimal addition, result back to double."""
    return F.sum(c.cast(f"decimal(38,{scale})")).cast("double")


def exact_avg(c: Column, scale: int = 6) -> Column:
    """Exact-decimal sum, then one double division — decimal/decimal division
    rounding differs across engines, double division of identical inputs
    doesn't."""
    return F.sum(c.cast(f"decimal(38,{scale})")).cast("double") / F.count(c).cast("double")


def count_per_group(df: DataFrame, *keys: str, alias: str = "cnt") -> DataFrame:
    """AGG-1 (reference load.py:236-241 per-company len(fetchall()) loop)."""
    return df.groupBy(*keys).agg(F.count("*").alias(alias))


def global_count(df: DataFrame, alias: str = "cnt") -> DataFrame:
    """AGG-2 (reference load.py:243)."""
    return df.agg(F.count("*").alias(alias))


def conditional_count(df: DataFrame, cond: Column, alias: str = "cnt") -> DataFrame:
    """AGG-3 (reference extract.py:251): count rows satisfying a predicate."""
    return df.agg(F.count_if(cond).alias(alias))


def distinct_values(df: DataFrame, col: str) -> DataFrame:
    """AGG-5 (reference main.py:122 list(set(...)))."""
    return df.select(col).distinct()


def first_match(df: DataFrame, cond: Column, order_by: list) -> DataFrame:
    """AGG-6 (reference transform.py:236-239 first record matching filter).
    Deterministic: requires a total order before limit(1)."""
    return df.filter(cond).orderBy(*order_by).limit(1)


def all_pass(df: DataFrame, check: Column, alias: str = "ok") -> DataFrame:
    """AGG-7 boolean-and verdict (reference transform.py:232-262)."""
    return df.agg(F.bool_and(check).alias(alias))


def stage_metrics(stages: dict[str, DataFrame]) -> dict[str, int]:
    """AGG-8 run metrics (reference main.py:27-36): record count per stage.
    Driver-side dict of tiny counts — the only sanctioned collect."""
    return {name: df.count() for name, df in stages.items()}


def data_summary(companies: DataFrame, financials: DataFrame) -> DataFrame:
    """V-6 summary/health report (reference load.py:229-246): per-company
    record counts + last_updated, via one broadcast left join (JOIN-4),
    not a per-company loop."""
    counts = financials.groupBy("ticker").agg(F.count("*").alias("financial_records"))
    return (
        companies.join(counts, on="ticker", how="left")
        .select(
            "ticker",
            "name",
            F.coalesce(F.col("financial_records"), F.lit(0)).alias("financial_records"),
        )
        .withColumn("last_updated", F.current_timestamp())
    )

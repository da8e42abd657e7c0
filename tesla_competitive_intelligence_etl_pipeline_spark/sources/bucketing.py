"""Bucketed tables for shuffle-free co-located joins (SURVEY.md §4).

At 100 TB the fact-fact join (orders ⋈ lineitem on orderkey) shuffles both
sides every query. Writing both tables bucketed by the join key once makes
every subsequent equi-join on that key a zero-exchange sort-merge join —
the classic amortize-the-shuffle trade.

Spark bucketing requires a saveAsTable (metastore-managed); helpers below
wrap that and are exercised in tests/test_plans.py, which asserts the
bucketed join plan contains NO Exchange on either side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 16,
    sort_cols: list[str] | None = None,
) -> None:
    w = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on, how: str = "inner"
) -> DataFrame:
    """Join two tables previously bucketed on the join key — no Exchange."""
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)

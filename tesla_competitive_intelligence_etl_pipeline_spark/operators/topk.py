"""Sort / limit / top-k / dedup / set operators (SURVEY.md §2.6).

LIM-1 is the reference's only implicit window function (limit=8 most-recent
quarters per ticker, extract.py:97). The window partitions by the group key —
one shuffle, no driver involvement; ties MUST be broken by a unique column or
row_number is nondeterministic across runs (SURVEY §7.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def multikey_sort(df: DataFrame, asc_cols: list[str], desc_cols: list[str]) -> DataFrame:
    """SORT-1 (reference transform.py:277 sort_values ascending=[True,False])."""
    return df.orderBy(*[F.asc(c) for c in asc_cols], *[F.desc(c) for c in desc_cols])


def top_k_per_group(df: DataFrame, group_cols: list[str], order_cols: list, k: int) -> DataFrame:
    """LIM-1: k most-recent rows per group (reference extract.py:97,100
    limit=8 API param; yfinance slice extract.py:162). ``order_cols`` must be
    a total order within each group for determinism."""
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def first_row(df: DataFrame, order_cols: list) -> DataFrame:
    """LIM-2 (reference .first() probes load.py:140,252,262) — deterministic
    variant: total order then limit 1."""
    return df.orderBy(*order_cols).limit(1)


def dedup_last_write_wins(df: DataFrame, keys: list[str], order_cols: list) -> DataFrame:
    """DEDUP-1: natural-key uniqueness, last write wins (reference
    schema.sql:30 UNIQUE + upsert load.py:128-154). row_number over a fully
    specified descending order, keep rank 1."""
    w = Window.partitionBy(*keys).orderBy(*[F.desc(c) if isinstance(c, str) else c for c in order_cols])
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")


def union_branches(a: DataFrame, b: DataFrame) -> DataFrame:
    """SET-2: union of source branches with differing columns (reference
    transform.py:203-230 dispatches fmp|yfinance into one stream)."""
    return a.unionByName(b, allowMissingColumns=True)

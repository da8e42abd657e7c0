"""SRC-7: seed/static dimension source (reference schema.sql:57-61,
load.py:55-59 — literal 3-row company dim, sector default 'Electric Vehicles')."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

SEED_COMPANIES = [
    ("TSLA", "Tesla Inc", "Electric Vehicles"),
    ("RIVN", "Rivian Automotive Inc", "Electric Vehicles"),
    ("LCID", "Lucid Group Inc", "Electric Vehicles"),
]

# FN-6 share-count lookup (reference transform.py:193-194), millions of shares;
# misses take the default 1000 via a left join + coalesce (JOIN-5).
SHARE_COUNTS = [("TSLA", 3160), ("RIVN", 920), ("LCID", 1600)]
SHARE_COUNT_DEFAULT = 1000


def seed_companies(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(SEED_COMPANIES, "ticker string, name string, sector string")


def share_counts(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(SHARE_COUNTS, "ticker string, shares_millions int")

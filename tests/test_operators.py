"""Unit tests for operator helpers not fully covered by oracle parity:
merge semantics, insert-if-absent, salted join equivalence."""

from __future__ import annotations

from pyspark.sql import functions as F

from tesla_competitive_intelligence_etl_pipeline_spark.operators.skew import salted_join
from tesla_competitive_intelligence_etl_pipeline_spark.sources.merge import (
    insert_if_absent,
    merge_upsert,
)


def test_merge_upsert_staged_wins_and_inserts(spark):
    current = spark.createDataFrame(
        [("TSLA", "2025-06-30", 1.0), ("RIVN", "2025-06-30", 2.0)],
        "ticker string, quarter string, v double",
    )
    staged = spark.createDataFrame(
        [("TSLA", "2025-06-30", 9.0), ("LCID", "2025-06-30", 3.0)],
        "ticker string, quarter string, v double",
    )
    out = {
        (r.ticker, r.quarter): r.v
        for r in merge_upsert(current, staged, keys=["ticker", "quarter"]).collect()
    }
    assert out == {
        ("TSLA", "2025-06-30"): 9.0,  # staged wins
        ("RIVN", "2025-06-30"): 2.0,  # untouched current survives
        ("LCID", "2025-06-30"): 3.0,  # new key inserted
    }


def test_merge_upsert_tiebreak_is_deterministic(spark):
    current = spark.createDataFrame([], "k string, v double, prio int")
    staged = spark.createDataFrame(
        [("a", 1.0, 1), ("a", 2.0, 2), ("a", 3.0, 0)], "k string, v double, prio int"
    )
    out = merge_upsert(current, staged, keys=["k"], order_cols=["prio"]).collect()
    assert len(out) == 1 and out[0].v == 2.0  # highest prio wins


def test_insert_if_absent(spark):
    existing = spark.createDataFrame([("TSLA",), ("RIVN",)], "ticker string")
    incoming = spark.createDataFrame([("TSLA",), ("NIO",)], "ticker string")
    out = {r.ticker for r in insert_if_absent(existing, incoming, keys=["ticker"]).collect()}
    assert out == {"TSLA", "RIVN", "NIO"}


def test_salted_join_equals_plain_join(spark, sf_dir):
    from tesla_competitive_intelligence_etl_pipeline_spark.sources import io as src

    customer = src.load_table(spark, sf_dir, "customer").withColumnRenamed(
        "c_nationkey", "n_nationkey"
    )
    nation = src.load_table(spark, sf_dir, "nation")
    plain = customer.join(nation, "n_nationkey").select("c_custkey", "n_name")
    salted = salted_join(customer, nation, "n_nationkey", n_salts=8).select(
        "c_custkey", "n_name"
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_merge_with_audit_trigger_policy(spark):
    """schema.sql:63-82 trigger semantics: matched rows preserve created_at
    and refresh updated_at; inserts stamp both; untouched rows keep both."""
    from pyspark.sql import functions as F

    from tesla_competitive_intelligence_etl_pipeline_spark.sources.merge import merge_with_audit

    t0 = "2024-01-01 00:00:00"
    now = "2025-06-30 12:00:00"
    current = spark.createDataFrame(
        [("TSLA", 100.0), ("RIVN", 50.0)], "ticker string, revenue double"
    ).select(
        "ticker", "revenue",
        F.lit(t0).cast("timestamp").alias("created_at"),
        F.lit(t0).cast("timestamp").alias("updated_at"),
    )
    staged = spark.createDataFrame(
        [("TSLA", 120.0), ("LCID", 30.0)], "ticker string, revenue double"
    )
    out = {
        r.ticker: r
        for r in merge_with_audit(
            current, staged, keys=["ticker"], now=F.lit(now).cast("timestamp")
        ).collect()
    }
    assert out["TSLA"].revenue == 120.0  # staged wins on match
    assert str(out["TSLA"].created_at) == t0  # preserved by the trigger
    assert str(out["TSLA"].updated_at) == now  # refreshed by the trigger
    assert str(out["LCID"].created_at) == now  # insert: both default to now
    assert str(out["LCID"].updated_at) == now
    assert out["RIVN"].revenue == 50.0  # untouched row fully intact
    assert str(out["RIVN"].created_at) == t0 and str(out["RIVN"].updated_at) == t0

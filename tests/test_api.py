"""Entry-point parity (SURVEY.md §3): Pipeline.run / health_check / load."""

from __future__ import annotations

import tempfile

from tesla_competitive_intelligence_etl_pipeline_spark.plans.api import Pipeline


def test_full_run_and_health(spark):
    gold_path = tempfile.mkdtemp(prefix="gold_api_") + "/gold"
    pipe = Pipeline(spark, gold_path=gold_path)
    metrics = pipe.run()
    assert metrics["status"] == "success"
    # TSLA x2 + RIVN + LCID(yfinance fallback); NKLA failed -> filtered (FIL-1)
    assert metrics["transformation_count"] == 4
    assert metrics["load_count"] == 4
    # eps 0.40 vs golden 0.3709 +/- 0.01 -> validation false (reference V-4 rule)
    assert metrics["tesla_validation"] is False

    health = pipe.health_check()
    assert health["status"] == "healthy"
    assert health["companies"]["TSLA"]["financial_records"] == 2


def test_rerun_upserts_not_duplicates(spark):
    gold_path = tempfile.mkdtemp(prefix="gold_api_") + "/gold"
    pipe = Pipeline(spark, gold_path=gold_path)
    first = pipe.run(validate=False)
    second = pipe.run(validate=False)  # same data -> merge, not append
    assert second["load_count"] == first["load_count"]


def test_health_without_gold_is_unhealthy(spark):
    pipe = Pipeline(spark, gold_path=tempfile.mkdtemp(prefix="gold_api_") + "/nope")
    assert pipe.health_check()["status"] == "unhealthy"


def test_load_external_dataframe(spark):
    """Entry point C: any conforming DataFrame can enter at the load stage."""
    gold_path = tempfile.mkdtemp(prefix="gold_api_") + "/gold"
    pipe = Pipeline(spark, gold_path=gold_path)
    df = spark.createDataFrame(
        [("NIO", "2025-06-30", "2025-Q2", 2400000000.0, -0.51, 240000000.0)],
        "ticker string, quarter_date string, quarter_label string, revenue double, eps double, gross_profit double",
    ).selectExpr(
        "ticker", "CAST(quarter_date AS DATE) quarter_date", "quarter_label",
        "CAST(revenue AS DECIMAL(15,2)) revenue", "CAST(eps AS DECIMAL(10,4)) eps",
        "CAST(gross_profit AS DECIMAL(15,2)) gross_profit",
    )
    out = pipe.load(df)
    assert out["load_count"] == 1

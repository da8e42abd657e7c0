"""Pipeline composition (SURVEY.md §3.1): bronze → silver → gold → checks.

The reference's eager three-stage imperative pipeline (main.py:38-75) becomes
one lazy logical plan per layer; Catalyst fuses the scalar transforms into a
single whole-stage-codegen pass (the reference's hand-written loop fusion,
§4), and the gold merge is the one shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tesla_competitive_intelligence_etl_pipeline_spark.functions import scalars
from tesla_competitive_intelligence_etl_pipeline_spark.functions import validation
from tesla_competitive_intelligence_etl_pipeline_spark.operators import topk
from tesla_competitive_intelligence_etl_pipeline_spark.sources import merge as merge_mod
from tesla_competitive_intelligence_etl_pipeline_spark.sources import seed as seed_mod


def silver_from_fmp(bronze: DataFrame) -> DataFrame:
    """T-stage for FMP records (reference extract_core_metrics
    transform.py:71-100): PROJ-1 projection, PROJ-2 coalesce of alternative
    fields, FN-1 date parse, FN-2 quarter label, FIL-2 invalid-date drop,
    FN-3/4 safe decimal, FN-5 millions rescale."""
    d = scalars.parse_date_multi(F.col("date"))
    eps_raw = F.coalesce(F.col("eps"), F.col("netIncomePerShare"))  # PROJ-2
    # rescale applied TWICE end-to-end (converter + validator), never to eps
    revenue = scalars.rescale_millions_pipeline(
        scalars.safe_decimal(F.col("revenue"), 15, 2).cast("double")
    ).cast("decimal(15,2)")
    gross = scalars.rescale_millions_pipeline(
        scalars.safe_decimal(F.col("grossProfit"), 15, 2).cast("double")
    ).cast("decimal(15,2)")
    return (
        bronze.select(
            F.col("symbol").alias("ticker"),
            d.alias("quarter_date"),
            scalars.quarter_label(d).alias("quarter_label"),
            revenue.alias("revenue"),
            scalars.safe_decimal(eps_raw, 10, 4).alias("eps"),
            gross.alias("gross_profit"),
        )
        .filter(F.col("quarter_label").isNotNull())  # FIL-2 transform.py:77-79
    )


def silver_from_yfinance(bronze: DataFrame, spark: SparkSession) -> DataFrame:
    """T-stage for the yfinance branch (transform.py:105-128): every measure
    goes through _safe_decimal_convert (clean + cast + converter rescale),
    revenue/gross additionally through the pydantic validator rescale
    (config.py:89-97) — the same double application as the FMP branch. Net
    income takes the converter rescale only (transform.py:116), then eps is
    derived via the share-count broadcast lookup (FN-6/JOIN-5); zero/null net
    income -> null eps (`if net_income` transform.py:117)."""
    shares = seed_mod.share_counts(spark)
    d = scalars.parse_date_multi(F.col("date"))
    enriched = bronze.join(F.broadcast(shares), bronze.symbol == shares.ticker, "left").withColumn(
        "shares_millions", F.coalesce(F.col("shares_millions"), F.lit(seed_mod.SHARE_COUNT_DEFAULT))
    )
    net_income = scalars.rescale_millions(
        scalars.safe_decimal(F.col("netIncome"), 15, 2).cast("double")
    )
    return (
        enriched.select(
            F.col("symbol").alias("ticker"),
            d.alias("quarter_date"),
            scalars.quarter_label(d).alias("quarter_label"),
            scalars.rescale_millions_pipeline(
                scalars.safe_decimal(F.col("revenue"), 15, 2).cast("double")
            ).cast("decimal(15,2)").alias("revenue"),
            scalars.eps_from_net_income(net_income, F.col("shares_millions"))
            .cast("decimal(10,4)")
            .alias("eps"),
            scalars.rescale_millions_pipeline(
                scalars.safe_decimal(F.col("grossProfit"), 15, 2).cast("double")
            ).cast("decimal(15,2)").alias("gross_profit"),
        )
        .filter(F.col("quarter_label").isNotNull())
    )


def silver_estimates(bronze: DataFrame) -> DataFrame:
    """T-stage for analyst estimates (reference load.py:163-200 +
    config.py:100-108): same date/label derivation, estimate measures typed,
    analyst_count >= 0 enforced by nulling violations (V-3)."""
    d = scalars.parse_date_multi(F.col("date"))
    return (
        bronze.select(
            F.col("symbol").alias("ticker"),
            d.alias("quarter_date"),
            scalars.quarter_label(d).alias("quarter_label"),
            F.col("estimatedRevenue").cast("decimal(15,2)").alias("estimated_revenue"),
            F.col("estimatedEps").cast("decimal(10,4)").alias("estimated_eps"),
            F.when(F.col("numberAnalysts") >= 0, F.col("numberAnalysts")).alias("analyst_count"),
        )
        .filter(F.col("quarter_label").isNotNull())
    )


def actuals_vs_estimates(financials: DataFrame, estimates: DataFrame) -> DataFrame:
    """JOIN-7 on the financial tables: the actual-vs-estimate report the
    star schema exists for (shared natural key schema.sql:30/:46), with
    beat/miss classification via the FN-9 tolerance."""
    joined = financials.join(
        estimates, on=["ticker", "quarter_date", "quarter_label"], how="left"
    )
    rev = F.col("revenue").cast("double")
    est = F.col("estimated_revenue").cast("double")
    eps = F.col("eps").cast("double")
    eps_est = F.col("estimated_eps").cast("double")
    return joined.select(
        "ticker",
        "quarter_date",
        "quarter_label",
        rev.alias("revenue"),
        est.alias("estimated_revenue"),
        (rev - est).alias("revenue_surprise"),
        eps.alias("eps"),
        eps_est.alias("estimated_eps"),
        F.round(eps - eps_est, 4).alias("eps_surprise"),
        F.when(est.isNull() | eps_est.isNull(), F.lit(None))
        .when((rev >= est) & (eps >= eps_est), "beat")
        .when((rev < est) & (eps < eps_est), "miss")
        .otherwise("mixed")
        .alias("verdict"),
    )


def gold_financials(silver: DataFrame) -> DataFrame:
    """Gold: DEDUP-1 natural-key last-write-wins + LIM-1 top-8 quarters per
    ticker, ordered for export (SORT-1)."""
    deduped = topk.dedup_last_write_wins(
        silver, keys=["ticker", "quarter_date"], order_cols=["revenue", "eps"]
    )
    top8 = topk.top_k_per_group(
        deduped, ["ticker"], [F.desc("quarter_date")], k=8
    )
    return top8.orderBy(F.asc("ticker"), F.desc("quarter_date"))


def run_pipeline(spark: SparkSession, fmp_bronze: DataFrame, yf_bronze: DataFrame | None = None):
    """Full E→T→L replay (entry point A, main.py:38-75). Returns
    (gold DataFrame, metrics dict, golden verdict bool)."""
    silver = silver_from_fmp(fmp_bronze)
    if yf_bronze is not None:
        silver = topk.union_branches(silver, silver_from_yfinance(yf_bronze, spark))
    gold = gold_financials(silver)
    seeded = seed_mod.seed_companies(spark)
    merged = merge_mod.insert_if_absent(
        seeded, gold.select(F.col("ticker")).distinct().withColumn("name", F.col("ticker")).withColumn(
            "sector", F.lit("Electric Vehicles")
        ),
        keys=["ticker"],
    )
    metrics = {
        "transformation_count": gold.count(),
        "company_count": merged.count(),
    }
    verdict = validation.validate_golden(gold)
    return gold, metrics, verdict

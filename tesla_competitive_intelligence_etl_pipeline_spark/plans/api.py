"""User-facing engine facade — the reference's three entry points
(SURVEY.md §3) on Spark:

A. ``Pipeline.run(tickers)``       ≙ python main.py (main.py:38-75)
B. ``Pipeline.health_check()``     ≙ python main.py --health-check (main.py:140-154)
C. ``Pipeline.load(df)``           ≙ DatabaseLoader.load_from_dataframe (load.py:202-227)

A user of the reference drives the same workflow with the same outputs
(gold table, metrics dict, golden verdict, health dict) — but every stage is
a lazy DataFrame plan executed by Catalyst instead of a Python loop.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tesla_competitive_intelligence_etl_pipeline_spark.functions import validation
from tesla_competitive_intelligence_etl_pipeline_spark.operators import aggregates as agg
from tesla_competitive_intelligence_etl_pipeline_spark.plans import pipeline as plan
from tesla_competitive_intelligence_etl_pipeline_spark.sources import merge as merge_mod
from tesla_competitive_intelligence_etl_pipeline_spark.sources import rest
from tesla_competitive_intelligence_etl_pipeline_spark.sources import seed as seed_mod


class Pipeline:
    def __init__(self, spark: SparkSession, gold_path: str | None = None):
        self.spark = spark
        self.gold_path = gold_path
        self._gold: DataFrame | None = None

    # -- A: full E→T→L ----------------------------------------------------

    def extract(self, tickers: list[str] | None = None) -> DataFrame:
        """E-stage: the per-ticker-partitioned REST source with failover
        tagging (SRC-1/2/3/5). Offline it replays fixtures; swap the fetch
        layer for live HTTP in production."""
        rest.register(self.spark)
        reader = self.spark.read.format("fmp_replay")
        if tickers:
            reader = reader.option("tickers", ",".join(tickers))
        return reader.load()

    def transform(self, bronze: DataFrame) -> DataFrame:
        """T-stage: FIL-1 status gate, then the silver scalar chain, then
        gold dedup/top-8 (transform.py:203-230 ≙ one lazy plan)."""
        ok = bronze.filter(F.col("status").isin("success", "partial"))
        silver = plan.silver_from_fmp(ok.drop("ticker", "source", "status"))
        return plan.gold_financials(silver)

    def load(self, gold: DataFrame) -> dict:
        """L-stage (and entry point C when called with an external frame):
        upsert into the persistent gold table + dim maintenance."""
        keyed = gold.select(
            "ticker", "quarter_date", "quarter_label", "revenue", "eps", "gross_profit"
        )
        current = self._read_gold()
        merged = merge_mod.merge_upsert(
            current, keyed, keys=["ticker", "quarter_date"], order_cols=["revenue", "eps"]
        ) if current is not None else keyed
        if self.gold_path:
            # two-phase write: the merge plan reads the current gold files, so
            # materialize to a staging dir before overwriting the target —
            # and count from the WRITTEN table (the lazy plan must never be
            # re-executed after its input files were replaced)
            merged.write.mode("overwrite").parquet(self.gold_path + "_next")
            self.spark.read.parquet(self.gold_path + "_next").write.mode("overwrite").parquet(
                self.gold_path
            )
            self._gold = None
            count = self.spark.read.parquet(self.gold_path).count()
        else:
            self._gold = merged.localCheckpoint()
            count = self._gold.count()
        return {"load_count": count}

    def run(self, tickers: list[str] | None = None, validate: bool = True) -> dict:
        t0 = time.time()
        bronze = self.extract(tickers)
        gold = self.transform(bronze)
        metrics = {"transformation_count": gold.count()}
        metrics |= self.load(gold)
        if validate:
            metrics["tesla_validation"] = validation.validate_golden(self._read_gold())
        metrics["duration_sec"] = round(time.time() - t0, 2)
        metrics["status"] = "success"
        return metrics

    # -- B: health check ---------------------------------------------------

    def health_check(self) -> dict:
        """One summary query (V-6) instead of the reference's N+1 loop."""
        gold = self._read_gold()
        if gold is None:
            return {"status": "unhealthy", "error": "no gold table loaded"}
        companies = seed_mod.seed_companies(self.spark)
        summary = agg.data_summary(companies, gold).collect()
        return {
            "status": "healthy",
            "total_companies": len(summary),
            "companies": {
                r.ticker: {"financial_records": r.financial_records} for r in summary
            },
        }

    # -- internals ----------------------------------------------------------

    def _read_gold(self) -> DataFrame | None:
        if self._gold is not None:
            return self._gold
        if self.gold_path:
            try:
                return self.spark.read.parquet(self.gold_path)
            except Exception:
                return None
        return None

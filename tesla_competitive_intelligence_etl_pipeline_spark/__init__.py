"""PySpark-native analytics engine with the query & data-processing surface of
the reference ETL pipeline (SeanZhang02/Tesla-Competitive-Intelligence-ETL-Pipeline),
re-expressed Spark-first, plus LLM-data-pipeline extension operators.

Layout (SURVEY.md §7.1):
  session.py    SparkSession builder (ANSI off, AQE on, UTC)
  schemas.py    StructTypes for financial tables + driver testdata
  sources/      readers/writers/seed/fixture sources + merge (upsert) sink
  functions/    scalar column expressions FN-1..FN-10, validation V-1..V-5
  operators/    joins, aggregates, top-k/dedup, ext (dedup/similarity/text/analytics)
  plans/        pipeline composition (E→T→L replay of the reference main.py)
  streaming/    Structured Streaming surface (X-9)
"""

from tesla_competitive_intelligence_etl_pipeline_spark.session import get_spark  # noqa: F401

__version__ = "0.1.0"

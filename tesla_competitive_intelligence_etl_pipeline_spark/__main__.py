"""CLI — mirrors the reference's main.py surface (SURVEY.md §3.1-3.2):

    python -m tesla_competitive_intelligence_etl_pipeline_spark [--tickers TSLA RIVN]
        [--no-validation] [--health-check] [--gold-path PATH]
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    p = argparse.ArgumentParser(description="PySpark-native competitive-intelligence ETL")
    p.add_argument("--tickers", nargs="*", default=None)
    p.add_argument("--no-validation", action="store_true")
    p.add_argument("--health-check", action="store_true")
    p.add_argument("--gold-path", default=None)
    args = p.parse_args()

    from tesla_competitive_intelligence_etl_pipeline_spark.plans.api import Pipeline
    from tesla_competitive_intelligence_etl_pipeline_spark.session import get_spark

    spark = get_spark("tesla-ci-cli")
    spark.sparkContext.setLogLevel("ERROR")
    pipe = Pipeline(spark, gold_path=args.gold_path)

    if args.health_check:
        print(json.dumps(pipe.health_check(), default=str))
        return
    result = pipe.run(tickers=args.tickers, validate=not args.no_validation)
    print(json.dumps(result, default=str))


if __name__ == "__main__":
    main()

from tesla_competitive_intelligence_etl_pipeline_spark.sources.io import (  # noqa: F401
    load_table,
    load_tables,
    write_csv,
    write_json_bronze,
    write_parquet,
)
from tesla_competitive_intelligence_etl_pipeline_spark.sources.seed import seed_companies  # noqa: F401
from tesla_competitive_intelligence_etl_pipeline_spark.sources.merge import merge_upsert  # noqa: F401

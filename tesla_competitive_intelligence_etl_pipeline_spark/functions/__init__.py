from tesla_competitive_intelligence_etl_pipeline_spark.functions.scalars import (  # noqa: F401
    clean_numeric_string,
    decimal_to_float,
    eps_from_net_income,
    parse_date_multi,
    quarter_label,
    rescale_millions,
    safe_decimal,
    within_tolerance,
)

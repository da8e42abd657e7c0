from tesla_competitive_intelligence_etl_pipeline_spark.plans.registry import REGISTRY  # noqa: F401


def load_registry() -> dict:
    """Import every registry batch module (side-effect: @register) and return
    the full name -> (builder, oracle_sql) mapping."""
    from tesla_competitive_intelligence_etl_pipeline_spark.plans import (  # noqa: F401
        registry_analytics,
        registry_ext,
        registry_fns,
        registry_more,
        registry_streaming,
    )

    return REGISTRY

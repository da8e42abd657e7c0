"""Join operators JOIN-1..JOIN-7 (SURVEY.md §2.4).

Every join in the reference is an equi-join spelled as a dict probe or a
correlated SELECT; here each is one declarative join so Catalyst/AQE pick
the physical strategy. Dimensions are explicitly broadcast — at 100 TB the
fact side never shuffles for a dim lookup. If a dim outgrows broadcast,
drop the hint and AQE's skew-join handles hot keys (TSLA-style skew, §4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_with_dim(facts: DataFrame, dim: DataFrame, key: str | list[str]) -> DataFrame:
    """JOIN-1: ticker -> company enrichment (reference load.py:102-107 hash-map
    probe; misses dropped). Broadcast inner join."""
    return facts.join(F.broadcast(dim), on=key, how="inner")


def dropped_by_enrichment(facts: DataFrame, dim: DataFrame, key: str | list[str]) -> DataFrame:
    """JOIN-1's skipped-row count side (load.py:105-107) as a left anti join."""
    return facts.join(F.broadcast(dim), on=key, how="left_anti")


def new_keys(incoming: DataFrame, existing: DataFrame, key: str | list[str]) -> DataFrame:
    """JOIN-2: anti-join for insert-if-absent (reference load.py:65-74)."""
    return incoming.join(existing, on=key, how="left_anti")


def existing_keys(probe: DataFrame, target: DataFrame, key: str | list[str]) -> DataFrame:
    """JOIN-3: semi-join existence probe (reference load.py:252-266)."""
    return probe.join(target, on=key, how="left_semi")


def dim_fan_out(dim: DataFrame, facts: DataFrame, on, how: str = "left") -> DataFrame:
    """JOIN-4: the reference's N+1 per-company query loop (load.py:234-241)
    collapsed into ONE join — the poster child of loop -> dataflow."""
    return dim.join(facts, on=on, how=how)


def enrich_lookup(df: DataFrame, lookup: DataFrame, key: str, value_col: str, default) -> DataFrame:
    """JOIN-5: lookup with default for misses (reference transform.py:193-194
    ``share_counts.get(ticker, 1000)``). Broadcast left join + coalesce."""
    return df.join(F.broadcast(lookup), on=key, how="left").withColumn(
        value_col, F.coalesce(F.col(value_col), F.lit(default))
    )


def merge_routing(current: DataFrame, staged: DataFrame, keys: list[str]) -> DataFrame:
    """JOIN-6: upsert routing (reference load.py:135-149) — full outer join;
    staged values win via coalesce. Column sets must match."""
    cur = current.select(*keys, *[F.col(c).alias(f"__cur_{c}") for c in current.columns if c not in keys])
    stg = staged.select(*keys, *[F.col(c).alias(f"__stg_{c}") for c in staged.columns if c not in keys])
    joined = stg.join(cur, on=keys, how="full_outer")
    value_cols = [c for c in staged.columns if c not in keys]
    return joined.select(
        *keys,
        *[F.coalesce(F.col(f"__stg_{c}"), F.col(f"__cur_{c}")).alias(c) for c in value_cols],
    )


def enrich_with_merged_dim(
    spark,
    facts: DataFrame,
    dim_target: str,
    key: str | list[str],
    how: str = "inner",
    fs=None,
    buckets: list[int] | None = None,
    snapshot: str | None = None,
    range_filters: dict[str, tuple] | None = None,
    null_filters: dict[str, str] | None = None,
    broadcast_threshold_rows: int | str | None = "auto",
) -> DataFrame:
    """JOIN-1 against a MERGE-TABLE dimension, stats-planned (r12 —
    VERDICT r11 item 4: the recorded cardinality model now reaches the
    places joins are planned, not only read_merged callers who pass a
    magic number). The dim side is read through
    streaming.events.read_merged with ``broadcast_threshold_rows='auto'``:
    when the manifest's rows/ndv/null-fraction model proves the FILTERED
    dim small enough for the session's autoBroadcastJoinThreshold (row
    estimate x the table's recorded bytes-per-row), the broadcast hint is
    attached — no caller hint, no hand-tuned threshold. Spark's own
    static size check sees the unfiltered FILE bytes and would plan a
    shuffle join for a narrow slice of a big dim; the manifest model sees
    through the filter. Over-threshold or un-modelable dims keep the
    unhinted plan (AQE/sort-merge), the only safe direction at 100 TB.
    Raises when the dim table has no committed state."""
    from tesla_competitive_intelligence_etl_pipeline_spark.streaming import events as strm

    dim = strm.read_merged(
        spark,
        dim_target,
        buckets=buckets,
        snapshot=snapshot,
        range_filters=range_filters,
        null_filters=null_filters,
        broadcast_threshold_rows=broadcast_threshold_rows,
        **({"fs": fs} if fs is not None else {}),
    )
    if dim is None:
        raise ValueError(
            f"enrich_with_merged_dim: no committed merge table at "
            f"{dim_target}"
        )
    return facts.join(dim, on=key, how=how)


def explain_join_estimate(
    spark,
    fact_target: str,
    dim_target: str,
    key: str,
    how: str = "inner",
    fact_range_filters: dict | None = None,
    fact_null_filters: dict | None = None,
    dim_range_filters: dict | None = None,
    dim_null_filters: dict | None = None,
    fs=None,
) -> dict | None:
    """Pre-flight join planning from manifest statistics alone (r13 —
    VERDICT r12 item 7): estimated OUTPUT cardinality for an equi-join of
    two merge tables on ``key``, the recommended physical strategy
    (broadcast / shuffle_hash / sort_merge — Spark's own selection logic
    applied to the MODELED post-filter sizes its static planner cannot
    see), and the skew surface (per-side bucket_skew_ratio and
    rows_per_key) a caller feeds operators/skew.salted_join when a hot
    key would stall a shuffle join. Pure driver-side JSON — no data I/O,
    no Spark job. None when either side's manifest lacks recorded rows
    or key ndv (no guess — the estimate_merged_rows rule). See
    streaming.events.estimate_join for the model; estimate-vs-actual
    bands are pinned in tests/test_plans.py."""
    from tesla_competitive_intelligence_etl_pipeline_spark.streaming import events as strm
    from tesla_competitive_intelligence_etl_pipeline_spark.streaming import fs as mfs

    return strm.estimate_join(
        spark,
        fact_target,
        dim_target,
        key,
        how=how,
        fact_range_filters=fact_range_filters,
        fact_null_filters=fact_null_filters,
        dim_range_filters=dim_range_filters,
        dim_null_filters=dim_null_filters,
        fs=fs or mfs.LOCAL_FS,
    )


def actual_vs_estimate(financials: DataFrame, estimates: DataFrame, keys: list[str]) -> DataFrame:
    """JOIN-7: the conformed-fact query the star schema is built for
    (schema.sql:30 vs :46) — actuals left-joined to estimates on the shared
    natural key."""
    return financials.join(estimates, on=keys, how="left")

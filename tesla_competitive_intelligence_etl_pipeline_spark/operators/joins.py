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


def actual_vs_estimate(financials: DataFrame, estimates: DataFrame, keys: list[str]) -> DataFrame:
    """JOIN-7: the conformed-fact query the star schema is built for
    (schema.sql:30 vs :46) — actuals left-joined to estimates on the shared
    natural key."""
    return financials.join(estimates, on=keys, how="left")

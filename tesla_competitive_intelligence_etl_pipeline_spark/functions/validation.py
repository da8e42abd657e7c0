"""Validation / constraint operators V-1..V-6 (SURVEY.md §2.7).

Pydantic per-object validators become vectorized DataFrame expressions —
one pass over the data, no Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

QUARTER_LABEL_RE = r"^\d{4}-Q[1-4]$"  # reference config.py:84

# Golden values (reference transform.py:245-258, load.py:269-281):
# TSLA 2025-Q2 revenue 22.5e9 ±0.1% relative, eps 0.3709 ±0.01 absolute.
GOLDEN_TICKER = "TSLA"
GOLDEN_QUARTER = "2025-Q2"
GOLDEN_REVENUE = 22_500_000_000.0
GOLDEN_REVENUE_REL_TOL = 0.001
GOLDEN_EPS = 0.3709
GOLDEN_EPS_ABS_TOL = 0.01


def quarter_label_valid(c: Column) -> Column:
    """V-1 pattern constraint (config.py:84)."""
    return c.rlike(QUARTER_LABEL_RE)


def ticker_length_valid(c: Column) -> Column:
    """V-2 length constraint 1..10 (config.py:82)."""
    return F.length(c).between(1, 10)


def non_negative(c: Column) -> Column:
    """V-3 analyst_count >= 0 (config.py:108); Decimal precision caps are
    enforced by the DecimalType cast itself (overflow -> null, non-ANSI)."""
    return c >= 0


def value_present(c: Column) -> Column:
    """FIL-6 truthiness quirk preserved: `if record.revenue:` treats 0 as
    missing (reference transform.py:248) — validate only non-null, non-zero."""
    return c.isNotNull() & (c != 0)


def golden_checks(revenue: Column, eps: Column) -> Column:
    """V-4/V-5 golden-value validation expression (transform.py:232-262):
    each check applies only when the value is 'present' (FIL-6 semantics)."""
    rev_ok = F.when(
        value_present(revenue),
        F.abs(revenue - F.lit(GOLDEN_REVENUE)) <= F.lit(GOLDEN_REVENUE * GOLDEN_REVENUE_REL_TOL),
    ).otherwise(F.lit(True))
    eps_ok = F.when(
        value_present(eps),
        F.abs(eps - F.lit(GOLDEN_EPS)) <= F.lit(GOLDEN_EPS_ABS_TOL),
    ).otherwise(F.lit(True))
    return rev_ok & eps_ok


def validate_golden(df: DataFrame) -> bool:
    """V-4 driver-side verdict: missing golden row -> soft False
    (transform.py:241-243); present row must pass all tolerance checks."""
    rows = (
        df.filter(
            (F.col("ticker") == GOLDEN_TICKER) & (F.col("quarter_label") == GOLDEN_QUARTER)
        )
        .select(golden_checks(F.col("revenue").cast("double"), F.col("eps").cast("double")).alias("ok"))
        .agg(F.bool_and("ok").alias("ok"))
        .collect()
    )
    verdict = rows[0]["ok"]
    return bool(verdict) if verdict is not None else False

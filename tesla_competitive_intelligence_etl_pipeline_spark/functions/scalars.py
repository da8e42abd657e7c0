"""Scalar column expressions FN-1..FN-10 (SURVEY.md §2.2).

All pure ``Column -> Column`` builders — JVM-side, whole-stage-codegen
friendly; no Python UDFs anywhere on this path. Reference semantics are
preserved exactly (file:line citations into /root/reference/):

- cast failure -> null (transform.py:184-186): try_cast / to_date non-ANSI.
- the millions-rescale heuristic (transform.py:181-182, config.py:89-97).
- validation truthiness: 0 treated as missing (transform.py:248).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# FN-1: multi-format date parse (reference _parse_date transform.py:141-166)
# try %Y-%m-%d, then %Y-%m-%d %H:%M:%S, then %m/%d/%Y; bare int year -> Dec 31
# of that year; unparseable -> null. to_date returns null on mismatch when
# ANSI is off, matching the reference's exception->None behavior.
# Known deviation: Python strptime parses 3-digit years ('01/01/999'); Spark's
# yyyy pattern requires 4 digits -> null. Irrelevant for financial dates.
# ---------------------------------------------------------------------------


def parse_date_multi(c: Column) -> Column:
    return F.coalesce(
        F.to_date(c, "yyyy-MM-dd"),
        F.to_date(c, "yyyy-MM-dd HH:mm:ss"),
        F.to_date(c, "MM/dd/yyyy"),
        F.make_date(c.try_cast("int"), F.lit(12), F.lit(31)),
    )


# ---------------------------------------------------------------------------
# FN-2: quarter-label derivation (reference standardize_quarter_date
# transform.py:31-57): date -> 'YYYY-QN', N = ceil(month/3); null-safe.
# ---------------------------------------------------------------------------


def quarter_label(c: Column) -> Column:
    return F.when(
        c.isNotNull(), F.format_string("%d-Q%d", F.year(c), F.quarter(c))
    )


# ---------------------------------------------------------------------------
# FN-3: numeric string cleanup (reference _safe_decimal_convert
# transform.py:173-178): strip [,$%\s]; '', 'N/A', 'n/a', '-' -> null.
# ---------------------------------------------------------------------------


def clean_numeric_string(c: Column) -> Column:
    cleaned = F.regexp_replace(c.cast("string"), r"[,$%\s]", "")
    return F.when(cleaned.isin("", "N/A", "n/a", "-"), F.lit(None)).otherwise(cleaned)


# ---------------------------------------------------------------------------
# FN-4: safe decimal cast (reference transform.py:180-186): any cast failure,
# inf, or nan -> null. try_cast to decimal gives null on garbage/overflow.
# ---------------------------------------------------------------------------


def safe_decimal(c: Column, precision: int = 15, scale: int = 2) -> Column:
    cleaned = clean_numeric_string(c)
    return F.when(
        F.lower(cleaned).isin("inf", "-inf", "infinity", "-infinity", "nan"),
        F.lit(None),
    ).otherwise(cleaned).try_cast(f"decimal({precision},{scale})")


# ---------------------------------------------------------------------------
# FN-5: heuristic unit normalization (reference transform.py:181-182 and the
# pydantic before-validator config.py:89-97): 0 < v < 1e6 means "millions",
# rescale to dollars. Idempotent because rescaled values exceed 1e6
# (SURVEY §7.4); applies to revenue/gross_profit only, never eps.
# ---------------------------------------------------------------------------


def rescale_millions(c: Column) -> Column:
    """First application (converter transform.py:181-182): guard is
    0 < v < 1e6 — negative values pass through untouched."""
    return F.when((c > 0) & (c < 1_000_000), c * 1_000_000).otherwise(c)


def rescale_millions_validator(c: Column) -> Column:
    """Second application (pydantic before-validator config.py:89-97): guard
    is just v < 1e6 — NO positivity bound, so negative revenue/gross_profit
    (e.g. LCID's negative gross profit) IS rescaled: -0.5 -> -500000,
    -5e9 -> -5e15. Faithful transcription of `if Decimal(str(v)) <
    Decimal('1000000'): return v * 1000000`."""
    return F.when(c < 1_000_000, c * 1_000_000).otherwise(c)


def rescale_millions_pipeline(c: Column) -> Column:
    """The reference's END-TO-END rescale for revenue/gross_profit: the
    heuristic runs TWICE with DIFFERENT guards — converter transform.py:181-182
    (0 < v < 1e6) then the pydantic before-validator config.py:89-97 (v < 1e6,
    no positivity bound). Consequences, property-tested against a literal
    Python transcription in tests/test_properties.py:
    - v >= 1e6: no-op twice;
    - 1 <= v < 1e6: rescaled once (converter), validator then no-op;
    - 0 < v < 1: genuinely rescaled twice (0.5 -> 500k -> 5e11);
    - v <= 0: converter no-op, validator rescales (-0.5 -> -500000)."""
    return rescale_millions_validator(rescale_millions(c))


# ---------------------------------------------------------------------------
# FN-6: EPS estimation via share-count lookup (reference _estimate_eps
# transform.py:188-201), transcribed exactly:
# - `if not net_income: return None` -> null/0 net income yields null;
# - `eps = (ni/1e6)/shares if ni >= 1e6 else ni/shares` — NO abs(): a large
#   NEGATIVE net income (the norm for NIO/RIVN/LCID) is NOT scaled to
#   millions, so -510000000 with default shares=1000 gives -510000.0, not
#   -0.51. Deliberately faithful to the reference quirk.
# - rounded to 4.
# The lookup itself is a broadcast join (operators/joins.py enrich_lookup).
# ---------------------------------------------------------------------------


def eps_from_net_income(net_income: Column, shares_millions: Column) -> Column:
    ni_millions = F.when(net_income >= 1_000_000, net_income / 1_000_000).otherwise(net_income)
    return F.when(
        net_income.isNull() | (net_income == 0), F.lit(None).cast("double")
    ).otherwise(F.round(ni_millions / shares_millions, 4))


# ---------------------------------------------------------------------------
# FN-7 processing timestamp / FN-8 decimal->float boundary cast
# ---------------------------------------------------------------------------


def processed_at() -> Column:
    return F.current_timestamp()


def decimal_to_float(c: Column) -> Column:
    """Reference degrades Decimal to float at CSV/DB boundary
    (transform.py:271-273, load.py:113-115)."""
    return c.cast("double")


# ---------------------------------------------------------------------------
# FN-9: abs-difference tolerance compare (reference transform.py:245-259):
# revenue tol = 0.1% relative; EPS tol = 0.01 absolute.
# ---------------------------------------------------------------------------


def within_tolerance(actual: Column, expected: Column, tol: Column) -> Column:
    return F.abs(actual - expected) <= tol


def within_relative_tolerance(actual: Column, expected: Column, rel: float) -> Column:
    return F.abs(actual - expected) <= F.abs(expected) * F.lit(rel)

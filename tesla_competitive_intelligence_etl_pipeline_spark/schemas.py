"""Canonical StructTypes (SURVEY.md §1.2-1.3).

Financial tables mirror the reference's triple-declared schema
(reference schema.sql:8-47, config.py:37-108); driver testdata schemas mirror
/root/testdata/sf*/ parquet (FIXTURES.md §10). All measures nullable — the
reference tests missing/'N/A'/extreme values explicitly.

Surrogate SERIAL ids are replaced by natural keys (ticker,
(ticker, quarter_date)) per SURVEY.md §7.4 — auto-increment is
nondeterministic in a distributed engine.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DateType,
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def _s(*fields: tuple) -> StructType:
    return StructType([StructField(n, t, nullable=True) for n, t in fields])


# ---------------------------------------------------------------------------
# Bronze: raw ingest shapes (schema-on-read; reference extract.py:84-91)
# ---------------------------------------------------------------------------

# FMP income-statement payload — only the fields the engine reads
# (reference transform.py:73-83 ignores the rest; Catalyst prunes for us).
FMP_INCOME_RAW = _s(
    ("date", StringType()),
    ("symbol", StringType()),
    ("revenue", StringType()),           # may arrive as '22,500,000,000', 'N/A', null
    ("eps", StringType()),
    ("netIncomePerShare", StringType()), # coalesced into eps (transform.py:82)
    ("grossProfit", StringType()),
)

# yfinance fallback after the transpose adapter (reference extract.py:158-187)
YFINANCE_INCOME_RAW = _s(
    ("date", StringType()),
    ("symbol", StringType()),
    ("revenue", DoubleType()),
    ("grossProfit", DoubleType()),
    ("netIncome", DoubleType()),
    ("period", StringType()),
    ("calendarYear", IntegerType()),
)

# FMP analyst estimates (reference extract.py:113-127)
FMP_ESTIMATES_RAW = _s(
    ("date", StringType()),
    ("symbol", StringType()),
    ("estimatedRevenue", DoubleType()),
    ("estimatedEps", DoubleType()),
    ("numberAnalysts", IntegerType()),
)

# Per-ticker extraction envelope (reference extract.py:201-207)
EXTRACTION_RESULT = StructType(
    [
        StructField("ticker", StringType()),
        StructField("status", StringType()),   # success | partial | failed
        StructField("source", StringType()),   # fmp | yfinance | null
        StructField("income_data", ArrayType(FMP_INCOME_RAW)),
        StructField("estimates_data", ArrayType(FMP_ESTIMATES_RAW)),
        StructField("errors", ArrayType(StringType())),
    ]
)

# ---------------------------------------------------------------------------
# Silver/Gold: typed star schema (reference schema.sql:8-47, config.py:37-108)
# ---------------------------------------------------------------------------

COMPANIES = _s(
    ("ticker", StringType()),   # natural key; unique, length 1..10 (config.py:82)
    ("name", StringType()),
    ("sector", StringType()),   # default 'Electric Vehicles' (schema.sql:12)
    ("created_at", TimestampType()),
    ("updated_at", TimestampType()),
)

QUARTERLY_FINANCIALS = _s(
    ("ticker", StringType()),            # natural FK (replaces company_id)
    ("quarter_date", DateType()),
    ("quarter_label", StringType()),     # ^\d{4}-Q[1-4]$ (config.py:84)
    ("revenue", DecimalType(15, 2)),
    ("eps", DecimalType(10, 4)),
    ("gross_profit", DecimalType(15, 2)),
    ("created_at", TimestampType()),
    ("updated_at", TimestampType()),
)

ANALYST_ESTIMATES = _s(
    ("ticker", StringType()),
    ("quarter_date", DateType()),
    ("quarter_label", StringType()),
    ("estimated_revenue", DecimalType(15, 2)),
    ("estimated_eps", DecimalType(10, 4)),
    ("analyst_count", IntegerType()),    # >= 0 (config.py:108)
    ("created_at", TimestampType()),
    ("updated_at", TimestampType()),
)

# CSV export shape (reference transform.py:269-277): Decimal degraded to float
STANDARDIZED_FINANCIALS = _s(
    ("ticker", StringType()),
    ("quarter_date", DateType()),
    ("quarter_label", StringType()),
    ("revenue", DoubleType()),
    ("eps", DoubleType()),
    ("gross_profit", DoubleType()),
    ("processed_at", TimestampType()),
)

# ---------------------------------------------------------------------------
# Driver testdata (FIXTURES.md §10) — explicit schemas so scans prune/push down
# ---------------------------------------------------------------------------

REGION = _s(("r_regionkey", IntegerType()), ("r_name", StringType()))

NATION = _s(
    ("n_nationkey", IntegerType()),
    ("n_name", StringType()),
    ("n_regionkey", IntegerType()),
)

CUSTOMER = _s(
    ("c_custkey", LongType()),
    ("c_name", StringType()),
    ("c_nationkey", IntegerType()),
    ("c_acctbal", DoubleType()),
    ("c_mktsegment", StringType()),
)

SUPPLIER = _s(
    ("s_suppkey", LongType()),
    ("s_name", StringType()),
    ("s_nationkey", IntegerType()),
    ("s_acctbal", DoubleType()),
)

PART = _s(
    ("p_partkey", LongType()),
    ("p_name", StringType()),
    ("p_brand", StringType()),
    ("p_type", StringType()),
    ("p_size", IntegerType()),
    ("p_retailprice", DoubleType()),
)

ORDERS = _s(
    ("o_orderkey", LongType()),
    ("o_custkey", LongType()),
    ("o_orderstatus", StringType()),
    ("o_totalprice", DoubleType()),
    ("o_orderdate", TimestampType()),
    ("o_orderpriority", StringType()),
)

LINEITEM = _s(
    ("l_orderkey", LongType()),
    ("l_partkey", LongType()),
    ("l_suppkey", LongType()),
    ("l_linenumber", IntegerType()),
    ("l_quantity", DoubleType()),
    ("l_extendedprice", DoubleType()),
    ("l_discount", DoubleType()),
    ("l_tax", DoubleType()),
    ("l_returnflag", StringType()),
    ("l_linestatus", StringType()),
    ("l_shipdate", TimestampType()),
)

EVENTS = _s(
    ("event_id", LongType()),
    ("ts", TimestampType()),
    ("user_id", LongType()),
    ("event_type", StringType()),
    ("value", DoubleType()),
    ("props", StringType()),
)

DOCUMENTS = _s(
    ("doc_id", LongType()),
    ("text", StringType()),
    ("lang", StringType()),
    ("source", StringType()),
    ("n_chars", LongType()),
)

EMBEDDINGS = _s(
    ("vec_id", LongType()),
    ("embedding", ArrayType(FloatType())),
    ("label", IntegerType()),
)

# Multimodal document shape (X-4): opaque binary payload + typed metadata
MULTIMODAL_DOC = _s(
    ("doc_id", LongType()),
    ("modality", StringType()),   # 'image' | 'audio' | 'video' | 'text'
    ("payload", BinaryType()),
    ("n_bytes", LongType()),
    ("meta", StringType()),       # JSON metadata sidecar
)

TESTDATA_TABLES = {
    "region": REGION,
    "nation": NATION,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
    "events": EVENTS,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}

"""Golden unit tests for FN-1..FN-9, ported from the reference suite
(tests/test_transform.py:64-191, tests/test_edge_cases.py:350-381 — see
FIXTURES.md §9)."""

from __future__ import annotations

import datetime
from decimal import Decimal

from pyspark.sql import functions as F

from tesla_competitive_intelligence_etl_pipeline_spark.functions import scalars


def _eval(spark, col, rows, schema="v string"):
    df = spark.createDataFrame(rows, schema)
    return [r["out"] for r in df.select(col.alias("out")).collect()]


def test_parse_date_multi(spark):
    rows = [
        ("2025-06-30",),
        ("2025-06-30 14:30:00",),
        ("06/30/2025",),
        ("2025",),            # bare year -> Dec 31
        ("invalid-date",),
        ("2025-13-31",),      # bad month -> null
        ("2025-02-30",),      # bad day -> null
        (None,),
        ("",),
    ]
    out = _eval(spark, scalars.parse_date_multi(F.col("v")), rows)
    assert out[0] == datetime.date(2025, 6, 30)
    assert out[1] == datetime.date(2025, 6, 30)
    assert out[2] == datetime.date(2025, 6, 30)
    assert out[3] == datetime.date(2025, 12, 31)
    assert out[4] is None and out[5] is None and out[6] is None
    assert out[7] is None and out[8] is None


def test_quarter_label_all_boundaries(spark):
    # reference tests/test_transform.py:64-100 — all 8 quarter boundary dates
    cases = {
        "2025-01-01": "2025-Q1",
        "2025-03-31": "2025-Q1",
        "2025-04-01": "2025-Q2",
        "2025-06-30": "2025-Q2",
        "2025-07-01": "2025-Q3",
        "2025-09-30": "2025-Q3",
        "2025-10-01": "2025-Q4",
        "2025-12-31": "2025-Q4",
    }
    rows = [(k,) for k in cases]
    out = _eval(spark, scalars.quarter_label(F.to_date("v")), rows)
    assert out == list(cases.values())
    assert _eval(spark, scalars.quarter_label(F.to_date("v")), [(None,)]) == [None]


def test_safe_decimal_dirty_values(spark):
    # reference tests/test_edge_cases.py:366-381
    rows = [
        ("22,500,000,000",),
        ("$1,000.50",),
        ("N/A",), ("n/a",), ("-",), ("",),
        ("inf",), ("-inf",), ("nan",),
        ("invalid",), (None,),
        ("0",), ("-1000000",),
    ]
    out = _eval(spark, scalars.safe_decimal(F.col("v"), 15, 2), rows)
    assert out[0] == Decimal("22500000000.00")
    assert out[1] == Decimal("1000.50")
    assert out[2:11] == [None] * 9
    assert out[11] == Decimal("0.00")
    assert out[12] == Decimal("-1000000.00")


def test_rescale_millions_heuristic(spark):
    # reference tests/test_transform.py:184-185: "100" => 100000000; 22.5 => 22500000
    rows = [(100.0,), (22.5,), (1_000_000.0,), (22_500_000_000.0,), (-500.0,), (0.0,)]
    out = _eval(spark, scalars.rescale_millions(F.col("v")), rows, "v double")
    assert out == [100_000_000.0, 22_500_000.0, 1_000_000.0, 22_500_000_000.0, -500.0, 0.0]
    # idempotence (SURVEY §7.4): rescaled values exceed 1e6 so a second
    # application is a no-op
    out2 = _eval(
        spark, scalars.rescale_millions(scalars.rescale_millions(F.col("v"))), rows, "v double"
    )
    assert out2 == out


def test_eps_from_net_income(spark):
    # reference transform.py:188-201 transcribed exactly: the /1e6 scaling
    # fires only for net_income >= 1e6 (NO abs), `if not net_income` -> None
    rows = [
        (1_264_000_000.0, 3160),  # big positive: scaled to millions first
        (-460_000_000.0, 920),    # big negative: NOT scaled (no abs in ref)
        (500_000.0, 1000),        # small positive: not scaled
        (0.0, 1000),              # falsy -> None (ref line 190-191)
        (None, 1000),             # missing -> None
    ]
    df = spark.createDataFrame(rows, "ni double, shares int")
    out = [
        r["out"]
        for r in df.select(
            scalars.eps_from_net_income(F.col("ni"), F.col("shares")).alias("out")
        ).collect()
    ]
    assert out[0] == 0.4  # (1264e6/1e6) / 3160
    assert out[1] == -500_000.0  # -460e6 / 920, unscaled
    assert out[2] == 500.0  # < 1e6: not scaled to millions first
    assert out[3] is None
    assert out[4] is None


def test_tolerance(spark):
    df = spark.createDataFrame([(22_510_000_000.0,), (22_600_000_000.0,)], "v double")
    out = [
        r["ok"]
        for r in df.select(
            scalars.within_relative_tolerance(F.col("v"), F.lit(22_500_000_000.0), 0.001).alias("ok")
        ).collect()
    ]
    assert out == [True, False]

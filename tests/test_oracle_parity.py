"""Every registry query must match its DuckDB oracle at sf0.001 — the local
twin of the driver's CORRECTNESS gate (order-insensitive exact values)."""

from __future__ import annotations

import pytest

from tests.oracle_harness import compare, duck_connection

import __spark_entry__ as entrymod


def _param_names():
    oracles = entrymod.oracle_sql()
    return [n for n in entrymod.queries() if n in oracles]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", _param_names())
def test_query_matches_oracle(spark, sf_dir, duck, name):
    fn = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]
    problems = compare(fn(spark, sf_dir), duck, sql, name)
    assert not problems, "\n".join(problems)


def test_every_query_runs(spark, sf_dir):
    """Queries without oracles (rows-only in the driver) must still execute."""
    oracles = entrymod.oracle_sql()
    for name, fn in entrymod.queries().items():
        if name not in oracles:
            df = fn(spark, sf_dir)
            assert df.count() >= 0, name


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) > 0

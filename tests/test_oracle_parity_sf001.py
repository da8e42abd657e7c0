"""Driver-gate-scale parity (VERDICT r7 item 5): every oracle-backed
registry query vs DuckDB at sf0.01 — the scale factor the driver's
CORRECTNESS gate actually runs, where scale-dependent oracle bugs (id
collisions, boundary ties) can hide from the sf0.001 CI pass. Marked slow:
excluded from the default run, executed with `pytest -m sf001`."""

from __future__ import annotations

import pytest

from tests.oracle_harness import compare, duck_connection

import __spark_entry__ as entrymod

pytestmark = pytest.mark.sf001

SF01 = "/root/testdata/sf0.01"


def _param_names():
    oracles = entrymod.oracle_sql()
    return [n for n in entrymod.queries() if n in oracles]


@pytest.fixture(scope="module")
def duck01():
    con = duck_connection(SF01)
    yield con
    con.close()


@pytest.mark.parametrize("name", _param_names())
def test_query_matches_oracle_sf001(spark, duck01, name):
    fn = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]
    problems = compare(fn(spark, SF01), duck01, sql, name)
    assert not problems, "\n".join(problems)

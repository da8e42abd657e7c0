"""Registry-wide output-shape lint (r13 — VERDICT r12 item 2).

The driver's correctness gate pandas-canonicalizes every query's result
(sort_values over all columns), which cannot handle complex-typed cells:
a top-level array/map/struct column raises ``TypeError: unhashable type:
'list'`` and turns the entry into a red ERROR row regardless of value
correctness — exactly what happened to x5_bpe_gpt2_encode in round 12.
This lint walks EVERY registry entry, builds its (lazy) plan at sf0.001,
and asserts the output schema is flat (atomic types only), so a shape
regression fails CI instead of the driver gate.

Also pins the round-end doc-sync invariant (VERDICT r12 item 8): the
registry length, COVERAGE.md's stated entry count, and BENCH_DETAIL's
n_queries must agree — the three drifted inside round 12 (207 vs 211).
"""

from __future__ import annotations

import json
import pathlib
import re

import pytest

from tests.oracle_harness import flat_schema_problems

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"
REPO = pathlib.Path(__file__).resolve().parents[1]


def test_every_registry_entry_has_flat_schema(spark):
    problems = []
    for name, fn in entrymod.queries().items():
        try:
            df = fn(spark, SF)
        except Exception as ex:  # pragma: no cover - lint must name the entry
            problems.append(f"{name}: failed to build plan: {ex!r}")
            continue
        problems.extend(flat_schema_problems(df, name))
    assert not problems, "\n".join(problems)


def test_flat_schema_lint_rejects_array_columns(spark):
    """Negative control: the checker must actually flag the failure class
    it exists for (a deliberately array-returning plan)."""
    from pyspark.sql import functions as F

    bad = spark.range(3).select(
        "id", F.array(F.lit(1), F.lit(2)).alias("xs")
    )
    probs = flat_schema_problems(bad, "dummy")
    assert probs and "xs:array<int>" in probs[0]
    ok = spark.range(3).select("id")
    assert flat_schema_problems(ok, "dummy") == []


def test_registry_count_docs_in_sync():
    """Entry-count single source of truth: len(queries()) must match the
    count COVERAGE.md claims and the n_queries bench.py reports."""
    n = len(entrymod.queries())

    cov = (REPO / "COVERAGE.md").read_text()
    m = re.search(r"(\d+)\s+registry entries", cov)
    assert m, "COVERAGE.md must state '<N> registry entries'"
    assert int(m.group(1)) == n, (
        f"COVERAGE.md says {m.group(1)} registry entries, registry has {n}"
    )

    detail = REPO / "BENCH_DETAIL.json"
    if detail.exists():
        d = json.loads(detail.read_text())
        nq = d.get("n_queries")
        assert nq == n, f"BENCH_DETAIL.json n_queries={nq}, registry has {n}"

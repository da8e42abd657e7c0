"""Skew-aware join (SURVEY.md §4, §7.4).

Real competitive-intelligence workloads concentrate on few hot keys (TSLA
dominates); at 100 TB a shuffle join on such a key puts one partition on one
executor. Two mitigations, in preference order:

1. AQE skew-join splitting — on by default in the engine session
   (spark.sql.adaptive.skewJoin.enabled); handles skew discovered at runtime.
2. Explicit salting (this module) — for the *planned* case where one side is
   too large to broadcast and the key histogram is known to be pathological:
   fact keys get a random salt in [0, n); the dim side is exploded n ways.
   The join key becomes (key, salt): n-way fan-out of hot keys, dim side
   grows n×|dim| rows (fine for dimension tables), results identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


_SALT_SAFE_HOW = {"inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi"}


def salted_join(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join facts⋈dim on ``key`` with an n-way salt. Deterministic
    result set (salt only routes rows; it never changes matches).

    ``how`` is restricted to fact-preserving types ({inner, left, left_semi}):
    the dim side is exploded n_salts ways, so right/full outer joins would
    emit each UNMATCHED dim row once per salt (duplicates). Salt the other
    side (swap the arguments) for a right-preserving join."""
    if how not in _SALT_SAFE_HOW:
        raise ValueError(
            f"salted_join supports how in {{'inner','left','left_semi'}}, got {how!r}: "
            "the exploded dim side duplicates unmatched dim rows under "
            "right/full outer semantics"
        )
    salted_facts = facts.withColumn(
        "__salt", (F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts))).cast("int")
    )
    salted_dim = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = salted_facts.join(salted_dim, on=[key, "__salt"], how=how)
    return out.drop("__salt")


def suggest_salts(
    spark,
    fact_target: str,
    dim_target: str,
    key: str,
    target_rows_per_group: int = 1_000_000,
    max_salts: int = 64,
    fs=None,
) -> int | None:
    """Size ``salted_join``'s ``n_salts`` from the manifest-stats join
    model (r13 — VERDICT r12 item 7's salting consumer): the fact side's
    estimated rows-per-key (joins.explain_join_estimate) divided by the
    rows one shuffle task should comfortably hold, clamped to
    [1, max_salts]. Rationale: salting splits each key's fact rows across
    n salt groups, so n = ceil(rows_per_key / target) makes the expected
    per-(key, salt) group fit the target regardless of how many keys
    there are; dim-side explode cost is n x |dim| rows, which the clamp
    bounds. Returns None (caller keeps an unsalted plan or a hand-picked
    n) when either manifest lacks the stats — the no-guess rule. 1 means
    "don't salt". The model's honest limit applies: rows_per_key is an
    AVERAGE, so a single hot key inside a uniform distribution still
    belongs to AQE's runtime skew-join, not this pre-planner."""
    import math

    from tesla_competitive_intelligence_etl_pipeline_spark.operators.joins import (
        explain_join_estimate,
    )

    est = explain_join_estimate(spark, fact_target, dim_target, key, fs=fs)
    if est is None:
        return None
    rpk = est["fact"]["rows_per_key"]
    if rpk is None:
        return None
    return max(1, min(int(max_salts), math.ceil(rpk / target_rows_per_group)))

"""Ordered funnel analysis over an event stream.

The classic product-analytics question: of the users who did step 1, how
many later did step 2, then step 3, ... in temporal order. Semantics are the
*chained first-occurrence* funnel: step k's timestamp is the user's earliest
step-k event at-or-after their step-(k-1) timestamp (an earlier stray step-k
event does not satisfy the funnel, a later one does).

Scale shape: one filtered, user-keyed conditional-min aggregation per step.
Only (user_id, ts) pairs for rows of the step's event type ever shuffle —
never the full event stream — and every aggregation is partial-aggregable
map-side. The per-step joins are survivor-keyed (monotonically shrinking),
so each stage's input is no larger than the previous stage's cohort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_times(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """One row per user who completed at least step 1, with a nullable
    first-occurrence timestamp column ``t{k}`` per step (null = funnel
    stopped before step k)."""
    if not steps:
        raise ValueError("funnel needs at least one step")
    cur = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("t1"))
    )
    for k, step in enumerate(steps[1:], start=2):
        nxt = (
            events.filter(F.col(type_col) == step)
            .select(user_col, F.col(ts_col).alias("__ts"))
            .join(cur.select(user_col, F.col(f"t{k-1}").alias("__prev")), user_col)
            .filter(F.col("__ts") >= F.col("__prev"))
            .groupBy(user_col)
            .agg(F.min("__ts").alias(f"t{k}"))
        )
        cur = cur.join(nxt, user_col, "left")
    return cur


def funnel_counts(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """The funnel report: ``step_idx, step, users`` — users reaching each
    step in order. Counts are monotonically non-increasing by construction."""
    times = funnel_times(events, steps, user_col, ts_col, type_col)
    per_step = [
        times.agg(
            F.lit(k).alias("step_idx"),
            F.lit(step).alias("step"),
            F.count(F.col(f"t{k}")).alias("users"),
        )
        for k, step in enumerate(steps, start=1)
    ]
    out = per_step[0]
    for df in per_step[1:]:
        out = out.unionByName(df)
    return out

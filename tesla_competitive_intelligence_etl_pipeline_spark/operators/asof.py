"""As-of (point-in-time) join — the state-at-event-time lookup financial
pipelines live on: for each left row, attach the MOST RECENT right row whose
timestamp is <= the left row's timestamp, per key.

Spark has no native as-of join. The naive formulations both fail at scale:
a per-key inequality join is O(|L|x|R|) per key (BroadcastNestedLoop), and
collecting to pandas merge_asof abandons the cluster. This implementation is
the UNION + forward-fill window plan:

    tag left/right -> union on (key, ts) -> one window per key ordered by
    (ts, side, tiebreak) -> last(payload, ignorenulls) forward-fills each
    left row with the latest preceding right payload -> filter left rows.

Cost: ONE shuffle on the key (the same shuffle any keyed join pays), a
per-partition sort, zero row blowup — survives arbitrarily many rows per
key where the inequality join explodes. Right rows sort BEFORE left rows at
equal ts, giving `right_ts <= left_ts` (inclusive) semantics — identical to
DuckDB's `ASOF JOIN ... ON l.ts >= r.ts`, which is the oracle twin.

Determinism: ties among right rows at the same (key, ts) are resolved by
``right_tiebreak`` (greatest wins), so results are reproducible and
SQL-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    right_tiebreak: str | None = None,
    tolerance: Column | None = None,
) -> DataFrame:
    """Return ``left`` with ``payload_cols`` from the as-of matching right
    row (null when no right row precedes the left row — LEFT as-of
    semantics). ``tolerance`` (an interval/long Column in the ts type's
    arithmetic) nulls matches older than ``left_ts - tolerance``, like
    pandas merge_asof(tolerance=...)."""
    tb = right_tiebreak or payload_cols[0]
    # latest right row per (key, ts): makes same-timestamp ties deterministic
    wdedup = Window.partitionBy(*on, right_ts).orderBy(F.col(tb).desc())
    r_dedup = (
        right.withColumn("__rn", F.row_number().over(wdedup))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )

    left_cols = [c for c in left.columns if c not in on and c != left_ts]
    l_tagged = left.select(
        *on,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        *[F.col(c) for c in left_cols],
        *[F.lit(None).cast(r_dedup.schema[c].dataType).alias(f"__p_{c}") for c in payload_cols],
        F.lit(None).cast(r_dedup.schema[right_ts].dataType).alias("__rts"),
    )
    r_tagged = r_dedup.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols],
        *[F.col(c).alias(f"__p_{c}") for c in payload_cols],
        F.col(right_ts).alias("__rts"),
    )
    unioned = l_tagged.unionByName(r_tagged)

    # rights first at equal ts -> inclusive (<=) as-of semantics
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts").asc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "*",
        *[
            F.last(F.col(f"__p_{c}"), ignorenulls=True).over(w).alias(f"__f_{c}")
            for c in payload_cols
        ],
        F.last(F.col("__rts"), ignorenulls=True).over(w).alias("__f_rts"),
    )
    out = filled.filter(F.col("__is_left") == 1)
    keep = F.lit(True) if tolerance is None else (F.col("__ts") - F.col("__f_rts") <= tolerance)
    return out.select(
        *on,
        F.col("__ts").alias(left_ts),
        *[F.col(c) for c in left_cols],
        *[F.when(keep, F.col(f"__f_{c}")).alias(c) for c in payload_cols],
    )

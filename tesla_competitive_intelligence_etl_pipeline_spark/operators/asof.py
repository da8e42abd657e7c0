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
from pyspark.sql import types as T


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
    # Forward-fill ONE struct of (right_ts, payload...) rather than each
    # payload column independently: with per-column last(ignorenulls=True), a
    # NULL payload value in the matched right row would silently fall back to
    # an OLDER right row's value (and different columns could come from
    # different right rows). The struct is atomic — all payload columns and
    # the tolerance timestamp come from the same matched right row, matching
    # pandas merge_asof / DuckDB ASOF JOIN semantics.
    pay_type = T.StructType(
        [T.StructField("__rts", r_dedup.schema[right_ts].dataType)]
        + [T.StructField(c, r_dedup.schema[c].dataType) for c in payload_cols]
    )
    l_tagged = left.select(
        *on,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        *[F.col(c) for c in left_cols],
        F.lit(None).cast(pay_type).alias("__pay"),
    )
    r_tagged = r_dedup.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols],
        F.struct(
            F.col(right_ts).alias("__rts"),
            *[F.col(c).alias(c) for c in payload_cols],
        ).alias("__pay"),
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
        F.last(F.col("__pay"), ignorenulls=True).over(w).alias("__f"),
    )
    out = filled.filter(F.col("__is_left") == 1)
    keep = (
        F.lit(True)
        if tolerance is None
        else (F.col("__ts") - F.col("__f.__rts") <= tolerance)
    )
    return out.select(
        *on,
        F.col("__ts").alias(left_ts),
        *[F.col(c) for c in left_cols],
        *[F.when(keep, F.col(f"__f.{c}")).alias(c) for c in payload_cols],
    )

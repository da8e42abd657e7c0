"""Bucketized range (interval) join — points matched into [start, end]
windows WITHOUT an equi-key.

Spark plans a pure inequality join as BroadcastNestedLoopJoin: O(|P| x |I|)
comparisons, a non-starter when both sides are big. The standard scalable
rewrite is temporal bucketization:

    point  -> bucket floor(ts/w)
    interval [s, e] -> EVERY bucket floor(s/w)..floor(e/w)  (explode)
    equi-join on bucket -> exact [s, e] filter

A point can only meet an interval in the point's own bucket, so the
equi-join produces each (point, interval) match EXACTLY once — no dedup
pass. Cost: |I| x (len/w + 1) exploded rows and one hash shuffle on the
bucket; choosing w ~ the typical interval length bounds the blowup to ~2x.
This is how big-big temporal overlap joins (ad attribution, sensor windows,
maintenance overlap) run at 100 TB.

An optional ``keys`` list adds equi-key columns to the join (the common
"same user AND in window" case), which further prunes the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_point_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    bucket_width_s: int = 3600,
    keys: list[str] | None = None,
) -> DataFrame:
    """Inner-join each point to every interval containing it (inclusive
    bounds). Column names must not collide across the two inputs (rename
    before calling). Returns points x matching-interval columns."""
    wus = bucket_width_s * 1_000_000
    p = points.withColumn("__b", F.floor(F.unix_micros(F.col(point_ts)) / wus))
    iv = (
        intervals.withColumn("__bs", F.floor(F.unix_micros(F.col(start_col)) / wus))
        .withColumn("__be", F.floor(F.unix_micros(F.col(end_col)) / wus))
        .withColumn("__b", F.explode(F.sequence(F.col("__bs"), F.col("__be"))))
        .drop("__bs", "__be")
    )
    on = ["__b"] + (keys or [])
    return (
        p.join(iv, on=on, how="inner")
        .filter((F.col(point_ts) >= F.col(start_col)) & (F.col(point_ts) <= F.col(end_col)))
        .drop("__b")
    )

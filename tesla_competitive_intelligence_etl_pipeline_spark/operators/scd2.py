"""SCD Type 2: interval dimensions from keyed change logs, and the
point-in-time join that consumes them.

The reference pipeline overwrite-upserts dimension state (SQLAlchemy
merge — Tesla-Competitive-Intelligence-ETL-Pipeline's load step keeps only the latest row per key), so
historical joins silently use today's attributes. The warehouse-standard
fix is a Type 2 slowly-changing dimension: every change opens an interval
``[valid_from, valid_to)`` and a fact joins the version that was in force
AT ITS OWN timestamp. Spark-first shape:

- ``scd2_from_log``: ONE window pass over the change log — per-key LEAD
  closes each interval; delete records close without opening (retention /
  GDPR erasure leaves a hole, exactly right for "what did we know at t").
- ``point_in_time_join``: equi-join on the keys with the interval check as
  a residual predicate — versions-per-key is small and bounded, so the
  plan is the plain keyed join (broadcast when the dim is small, SMJ
  otherwise) with zero row explosion beyond the version count. For
  match-latest-only semantics over a RAW log (no intervals yet),
  ``operators/asof.asof_join`` is the single-shuffle alternative; on a
  delete-free log the two agree row-for-row (pinned in tests).
- ``scd2_from_commit_changes``: the composition with the X-9 table format
  — the merge table's commit-log CDC (insert/update_postimage/delete,
  ordered by ``_commit_seq``) IS a change log, so any merge gold table
  becomes a queryable SCD2 dimension without a second ingest path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

__all__ = ["scd2_from_log", "point_in_time_join", "scd2_from_commit_changes"]


def scd2_from_log(
    log: DataFrame,
    keys: list[str],
    ts_col: str,
    attrs: list[str],
    delete_col: str | None = None,
    tiebreak: str | None = None,
) -> DataFrame:
    """Collapse a keyed change log into SCD2 intervals.

    ``log``: one row per observed change — keys + ``ts_col`` (any
    orderable type: timestamp, date, commit sequence) + ``attrs``.
    ``delete_col`` (optional): a boolean column marking delete records —
    a delete CLOSES the previous interval at its timestamp and opens
    nothing, so the key has no version in force until a later change
    re-inserts it. Same-timestamp duplicates keep the ``tiebreak``-max row
    (default: last attr), mirroring asof_join's determinism.

    Output: keys + attrs + ``valid_from`` + ``valid_to`` (null = still in
    force) + ``is_current``. One shuffle (the per-key window); cost
    O(changes), never O(keys x versions)."""
    tb = tiebreak or attrs[-1]
    wd = Window.partitionBy(*keys, ts_col).orderBy(F.col(tb).desc())
    dedup = (
        log.withColumn("__rn", F.row_number().over(wd))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    w = Window.partitionBy(*keys).orderBy(F.col(ts_col).asc())
    ivals = dedup.select(
        *keys,
        *attrs,
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w).alias("valid_to"),
        (
            F.col(delete_col).cast("boolean")
            if delete_col is not None
            else F.lit(False)
        ).alias("__del"),
    )
    return (
        ivals.filter(~F.coalesce(F.col("__del"), F.lit(False)))
        .withColumn("is_current", F.col("valid_to").isNull())
        .drop("__del")
    )


def point_in_time_join(
    facts: DataFrame,
    dim: DataFrame,
    keys: list[str],
    fact_ts: str,
    how: str = "left",
) -> DataFrame:
    """Join each fact row to the dimension version in force at its own
    timestamp: ``valid_from <= fact_ts < valid_to`` (open-ended current
    version matches everything after its ``valid_from``). Plain keyed
    equi-join with the interval check as a residual predicate — Catalyst
    broadcasts a small dim, sort-merge-joins a large one; at most one
    version matches per fact by construction (intervals are disjoint per
    key), so there is no row explosion and no window over the facts."""
    f, d = facts.alias("__f"), dim.alias("__d")
    cond = F.lit(True)
    for k in keys:
        cond = cond & (F.col(f"__f.{k}") == F.col(f"__d.{k}"))
    cond = cond & (F.col(f"__d.valid_from") <= F.col(f"__f.{fact_ts}"))
    cond = cond & (
        F.col("__d.valid_to").isNull()
        | (F.col(f"__f.{fact_ts}") < F.col("__d.valid_to"))
    )
    dim_cols = [c for c in dim.columns if c not in keys]
    return f.join(d, cond, how).select(
        "__f.*", *[F.col(f"__d.{c}").alias(c) for c in dim_cols]
    )


def scd2_from_commit_changes(
    spark: SparkSession,
    target: str,
    since: str,
    keys: list[str],
    attrs: list[str],
    until: str | None = None,
    fs=None,
) -> DataFrame:
    """The merge-table composition: build the SCD2 intervals directly from
    ``read_commit_changes`` output — inserts/update_postimages open
    versions, deletes close them, ``_commit_seq`` is the version ordinal
    (``valid_from``/``valid_to`` are commit sequence numbers relative to
    ``since``; map them to wall-clock by joining the table's commit
    records if needed). O(delta in the range), the commit log's own
    contract."""
    from tesla_competitive_intelligence_etl_pipeline_spark.streaming import events as strm
    from tesla_competitive_intelligence_etl_pipeline_spark.streaming import fs as merge_fs

    ch = strm.read_commit_changes(
        spark, target, since=since, until=until, fs=fs or merge_fs.LOCAL_FS
    )
    log = ch.filter(F.col("_change_type") != "update_preimage").select(
        *keys,
        *attrs,
        F.col("_commit_seq").alias("__seq"),
        (F.col("_change_type") == "delete").alias("__is_del"),
    )
    return scd2_from_log(
        log, keys, "__seq", attrs, delete_col="__is_del", tiebreak=attrs[-1]
    )

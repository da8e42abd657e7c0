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

__all__ = [
    "scd2_from_log",
    "point_in_time_join",
    "scd2_from_commit_changes",
    "scd2_from_changes_df",
]


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
    re-inserts it. Same-timestamp duplicates: a DELETE WINS over any
    same-timestamp change (ADVICE r10 — a delete record typically carries
    null attrs, which under a plain attr-desc tiebreak always LOST,
    silently resurrecting the key); among records with the same delete
    flag, the ``tiebreak``-max row survives (default: last attr),
    mirroring asof_join's determinism.

    Output: keys + attrs + ``valid_from`` + ``valid_to`` (null = still in
    force) + ``is_current``. One shuffle (the per-key window); cost
    O(changes), never O(keys x versions)."""
    tb = tiebreak or attrs[-1]
    del_flag = (
        F.coalesce(F.col(delete_col).cast("boolean"), F.lit(False))
        if delete_col is not None
        else F.lit(False)
    )
    wd = Window.partitionBy(*keys, ts_col).orderBy(
        del_flag.desc(), F.col(tb).desc()
    )
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
    key), so there is no row explosion and no window over the facts.

    Raises on fact/dim payload name collisions (ADVICE r10): every
    non-key dim column lands in the output under its own name, so a fact
    column with the same name would make the result ambiguous — rename
    one side before joining."""
    clash = sorted(
        (set(dim.columns) - set(keys)) & set(facts.columns)
    )
    if clash:
        raise ValueError(
            f"point_in_time_join: fact and dim share non-key column(s) "
            f"{clash} — the dim payload is emitted under its own names, "
            "so the output would carry duplicate columns; rename one side"
        )
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
    timeline: str = "seq",
) -> DataFrame:
    """The merge-table composition: build the SCD2 intervals directly from
    ``read_commit_changes`` output — inserts/update_postimages open
    versions, deletes close them, ``_commit_seq`` is the version ordinal.

    ``timeline`` (r11 — VERDICT r10 item 2):

    - ``"seq"``: ``valid_from``/``valid_to`` are commit sequence numbers
      relative to ``since`` — the ordering truth, always available.
    - ``"ts"``: ``valid_from``/``valid_to`` are WALL-CLOCK timestamps (the
      recorded commit instants), answering "what did we know at 3pm
      Tuesday" directly; ``valid_from_seq``/``valid_to_seq`` ride along as
      the tiebreaker/lineage. Commit ordering is still decided by seq —
      the ts axis is MONOTONIZED (running max over seq) so a wall clock
      stepping backwards between writers can never invert or overlap
      intervals. Raises on pre-r11 commits whose records carry no
      timestamp — fail loudly, never fabricate a time axis.

    O(delta in the range), the commit log's own contract; the seq→ts map
    is commits-in-range-sized and broadcast."""
    from tesla_competitive_intelligence_etl_pipeline_spark.streaming import events as strm
    from tesla_competitive_intelligence_etl_pipeline_spark.streaming import fs as merge_fs

    ch = strm.read_commit_changes(
        spark, target, since=since, until=until, fs=fs or merge_fs.LOCAL_FS
    )
    return scd2_from_changes_df(ch, keys, attrs, timeline=timeline)


def scd2_from_changes_df(
    ch: DataFrame, keys: list[str], attrs: list[str], timeline: str = "seq"
) -> DataFrame:
    """Interval build over an already-materialized commit-changes frame
    (``read_commit_changes`` output or a persisted copy of it) — the
    engine half the fixture-backed oracle entry exercises; see
    scd2_from_commit_changes for semantics."""
    if timeline not in ("seq", "ts"):
        raise ValueError(f"timeline must be 'seq' or 'ts', got {timeline!r}")
    log = ch.filter(F.col("_change_type") != "update_preimage").select(
        *keys,
        *attrs,
        F.col("_commit_seq").alias("__seq"),
        (F.col("_change_type") == "delete").alias("__is_del"),
    )
    ivals = scd2_from_log(
        log, keys, "__seq", attrs, delete_col="__is_del", tiebreak=attrs[-1]
    )
    if timeline == "seq":
        return ivals
    # seq → monotonized wall-clock map: commits-in-range-sized (tiny), so
    # the single-partition running-max window and the broadcast joins are
    # free at any table size. The null check runs on the RAW map BEFORE
    # monotonizing (review r11): the running F.max skips nulls, so a
    # timestamp-less commit landing AFTER a timestamped one would
    # otherwise inherit the earlier commit's instant — a fabricated time
    # axis, exactly what this mode promises never to produce.
    cm = ch.select(
        F.col("_commit_seq").alias("__s"), F.col("_commit_ts").alias("__t")
    ).distinct()
    if cm.filter(F.col("__t").isNull()).limit(1).count():
        raise ValueError(
            "timeline='ts' needs every commit in the range to carry a "
            "recorded timestamp — this range includes pre-timestamp "
            "commits; use timeline='seq' (and map to wall-clock manually)"
        )
    wmono = Window.orderBy("__s").rowsBetween(Window.unboundedPreceding, 0)
    cm = cm.select("__s", F.max("__t").over(wmono).alias("__t"))
    from pyspark.sql.functions import broadcast

    out = (
        ivals.join(
            broadcast(cm.select(F.col("__s"), F.col("__t").alias("valid_from_ts"))),
            ivals["valid_from"] == F.col("__s"),
            "left",
        )
        .drop("__s")
        .join(
            broadcast(cm.select(F.col("__s"), F.col("__t").alias("valid_to_ts"))),
            ivals["valid_to"] == F.col("__s"),
            "left",
        )
        .drop("__s")
    )
    # (the raw-map null check above is exhaustive: every interval seq
    # comes from ch, and cm carries all of ch's seqs, so the left joins
    # can never miss — no per-row re-check needed)
    return out.select(
        *keys,
        *attrs,
        F.col("valid_from_ts").alias("valid_from"),
        F.col("valid_to_ts").alias("valid_to"),
        F.col("valid_from").alias("valid_from_seq"),
        F.col("valid_to").alias("valid_to_seq"),
        "is_current",
    )

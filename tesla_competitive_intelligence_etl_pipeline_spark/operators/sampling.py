"""Deterministic corpus sampling for training-data pipelines (SURVEY.md §2.9
extension surface): downsampling, stratified mixture quotas, and train/val/
test splits — all driven by a STABLE content-independent hash, never rand().

Why hash-based: at 100 TB a sample must be (a) reproducible across runs and
engines (rand(seed) is engine-specific; md5 is universal), (b) computable
map-side with no shuffle for the filter form, and (c) stable under
re-partitioning and incremental re-runs (a doc's bucket never changes, so
yesterday's sample is a subset of today's at a higher rate — monotone
sampling, the property dedup/ablation workflows rely on).

The bucket is the first 8 hex digits of md5(key) mod n_buckets — identical
SQL exists in DuckDB (the oracle twin), so sampled row SETS hash-match
exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from tesla_competitive_intelligence_etl_pipeline_spark.operators.aggregates import exact_sum


def stable_bucket(key: Column, n_buckets: int = 10_000) -> Column:
    """Deterministic bucket in [0, n_buckets): first 8 md5 hex digits of the
    key, mod n_buckets. Pure JVM expression; identical in DuckDB as
    `CAST(('0x' || substr(md5(key), 1, 8)) AS BIGINT) % n`."""
    return F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10).cast("long") % n_buckets


def sample_fraction(
    df: DataFrame, key_col: str, fraction: float, n_buckets: int = 10_000
) -> DataFrame:
    """Keep ~fraction of rows by stable bucket — map-side filter, no shuffle,
    monotone in `fraction` (raising the rate only ADDS rows)."""
    cutoff = int(round(fraction * n_buckets))
    return df.filter(stable_bucket(F.col(key_col), n_buckets) < cutoff)


def stratified_quota(
    df: DataFrame,
    group_cols: list[str],
    key_col: str,
    quota: int,
) -> DataFrame:
    """Mixture sampling: at most `quota` rows per group, picked in stable-
    hash order (so the pick is deterministic AND unbiased w.r.t. any column
    correlated with the key ordering). One window shuffle on the group key —
    the same cost as any per-group top-k."""
    w = Window.partitionBy(*group_cols).orderBy(
        stable_bucket(F.col(key_col), 1 << 31).asc(), F.col(key_col).asc()
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= quota)
        .drop("__rn")
    )


def split_assign(
    df: DataFrame,
    key_col: str,
    val_pct: int = 5,
    test_pct: int = 5,
) -> DataFrame:
    """Train/val/test assignment by stable bucket mod 100: reproducible,
    leakage-free (a key always lands in the same split, across runs AND
    across engines), no shuffle.

    NOTE: keying on a per-DOCUMENT id is only leakage-free at the document
    level — near-identical documents get independent buckets and can
    straddle train and eval, silently inflating held-out metrics. When the
    corpus has duplicates, split on a GROUP key instead
    (leakage_safe_split)."""
    return leakage_safe_split(df, F.col(key_col), val_pct, test_pct)


def leakage_safe_split(
    df: DataFrame,
    group_key: Column,
    val_pct: int = 5,
    test_pct: int = 5,
) -> DataFrame:
    """Group-aware train/val/test assignment: the stable bucket is computed
    on a GROUP key expression — a content fingerprint
    (text.fingerprint_md5) for exact duplicates, or a near-dup cluster id
    (dedup.near_dup_clusters / semantic_dedup clusters) — so EVERY member
    of a duplicate group lands in the same split by construction. This is
    the duplication-contamination guard: deduplication alone does not fix
    eval leakage when near-identical documents survive on both sides of a
    split; tying the split to the group key does. Map-side expression, no
    shuffle beyond whatever produced the group key."""
    b = stable_bucket(group_key, 100)
    return df.withColumn(
        "split",
        F.when(b < val_pct, "val")
        .when(b < val_pct + test_pct, "test")
        .otherwise("train"),
    )


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight: Column,
    n_buckets: int = 10_000,
) -> DataFrame:
    """Per-row keep probability = ``weight`` (a Column in [0,1], e.g. a
    quality score): keep when stable_bucket < weight * n_buckets. Still
    map-side, deterministic, engine-portable, and monotone — raising any
    row's weight can only add it, never drop others."""
    return df.filter(
        stable_bucket(F.col(key_col), n_buckets) < (weight * n_buckets).cast("long")
    )


def upsample_repeats(df: DataFrame, repeats: Column) -> DataFrame:
    """Mixture upsampling: repeat each row ``repeats`` times (epochs-per-
    source weighting in pre-training mixes), adding ``repeat_ix`` (1-based)
    so downstream shuffling/packing can distinguish copies. Rows with
    repeats <= 0 (or null) are dropped.

    The guard matters: a bare ``sequence(1, stop)`` defaults to step -1 when
    ``stop < 1``, so repeats=0 would yield [1, 0] (two copies!) and repeats=-1
    three — the opposite of "drop". Gating the sequence behind ``repeats >= 1``
    makes the else-branch NULL, and ``explode`` of a NULL array drops the row,
    which is the documented contract (mixture factor 0 = exclude the source)."""
    n = repeats.cast("int")
    return df.withColumn(
        "repeat_ix",
        F.explode(F.when(n >= 1, F.sequence(F.lit(1), n))),
    )


def mixing_weights(
    df: DataFrame,
    group_col: str = "source",
    weight: Column | None = None,
    target_shares: dict[str, float] | None = None,
) -> DataFrame:
    """Per-group mixture report for pre-training data mixing: each group's
    document count, token budget, actual share of the corpus, target share,
    and the resampling factor (target_tokens / actual_tokens) that
    ``upsample_repeats`` / ``sample_fraction`` consume to rebalance the mix.

    ``weight`` is the per-row budget column (defaults to 1 per doc);
    ``target_shares`` maps group -> desired share (defaults to uniform over
    the observed groups; entries missing from the map get share 0).

    Scale: ONE partial-aggregable groupBy over the corpus (only (group, n,
    sum) rows shuffle); the corpus-total window then runs over the k-row
    aggregate — a deliberate single-partition frame over k rows, never over
    data."""
    w = weight if weight is not None else F.lit(1.0)
    per = df.groupBy(group_col).agg(
        F.count("*").alias("docs"),
        exact_sum(w).alias("budget"),
    )
    total_w = Window.partitionBy()  # k-row frame (k = #groups), documented
    share = (F.col("budget") / F.sum("budget").over(total_w)).alias("actual_share")
    if target_shares is None:
        target = (F.lit(1.0) / F.count("*").over(total_w)).alias("target_share")
    else:
        target = F.coalesce(
            *(
                [
                    F.when(F.col(group_col) == g, F.lit(float(s)))
                    for g, s in sorted(target_shares.items())
                ]
                + [F.lit(0.0)]
            )
        ).alias("target_share")
    return per.select(
        group_col,
        "docs",
        "budget",
        F.round(share, 6).alias("actual_share"),
        F.round(target, 6).alias("target_share"),
        F.round(
            target / share, 6
        ).alias("resample_factor"),
    ).orderBy(group_col)

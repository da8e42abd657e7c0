"""Skew-stress evidence for salted_join (VERDICT r3 item 6; SURVEY §7.4).

The reference's real workloads concentrate on one hot key (TSLA dominates);
this fixture plants that shape — 95% of a 6M-row fact table on a single key —
and demonstrates, with AQE skew-join splitting DISABLED and broadcast off
(forcing the pathological shuffle join salting exists to fix), that

  (a) salted_join returns exactly the plain join's result, and
  (b) it beats the plain join's wall clock: the hot key's 5.7M rows land in
      ONE sort-merge task under hash partitioning, while the salt spreads
      them across n_salts tasks.

The timing assertion is deliberately conservative: the salted run goes FIRST
(cold JVM/codegen penalty on the salted side), the margin demanded is only
"strictly faster", and the fact table is persisted so the timed section is
the join itself, not row generation. Measured locally the gap is ~1.4x on 4
cores (bounded by core count, not salt count).
"""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from tesla_competitive_intelligence_etl_pipeline_spark.operators.skew import salted_join

N_ROWS = 6_000_000
HOT_SHARE = 19  # of 20 -> 95% of facts on key 0


def _zipfish_facts(spark):
    return spark.range(N_ROWS).select(
        F.when(F.col("id") % 20 < HOT_SHARE, 0)
        .otherwise(F.pmod(F.col("id"), 100) + 1)
        .cast("long")
        .alias("key"),
        F.sha2(F.col("id").cast("string"), 256).alias("payload"),
        (F.col("id") % 1000).alias("v"),
    )


def _consume(df):
    """Full-result aggregate over the join output (forces every joined row
    through the plan; the result tuple doubles as the equality witness)."""
    row = df.groupBy().agg(
        F.count("*").alias("n"),
        F.sum(F.col("v") + F.col("w")).alias("s"),
        F.max("payload").alias("p"),
    ).collect()[0]
    return tuple(row)


def test_salted_join_beats_plain_on_zipfian_key(spark):
    facts = _zipfish_facts(spark).persist()
    facts.count()  # materialize: time the join, not row generation
    dim = spark.range(101).select(
        F.col("id").alias("key"), (F.col("id") * 7).alias("w")
    )

    prev_skew = spark.conf.get("spark.sql.adaptive.skewJoin.enabled")
    prev_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        t0 = time.perf_counter()
        salted_res = _consume(salted_join(facts, dim, "key", n_salts=16))
        salted_s = time.perf_counter() - t0

        t0 = time.perf_counter()
        plain_res = _consume(facts.join(dim, "key"))
        plain_s = time.perf_counter() - t0
    finally:
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", prev_skew)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bc)
        facts.unpersist()

    assert salted_res == plain_res  # salt routes rows, never changes matches
    assert salted_res[0] == N_ROWS
    # the measured local[4] gap is ~1.4x with the salted side handicapped by
    # running first; "strictly faster" keeps the assertion robust
    assert salted_s < plain_s, (salted_s, plain_s)

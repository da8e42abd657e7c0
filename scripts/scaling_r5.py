#!/usr/bin/env python
"""Measured-scaling protocol, round 5 (VERDICT r4 item 5): extend the
1x/2x/4x evidence in SCALING.md beyond MinHash-LSH to

  1. cross_corpus_neardup_indexed — increment FIXED, stored corpus growing
     (the steady-state ingestion shape; cost should track the sig-table
     scan, far below re-shingling the corpus),
  2. kmeans — volume 1x/2x/4x at fixed k/dim/iters (linear per iteration),
  3. sequence packing — volume 1x/2x/4x (linear; no single-partition stage),
  4. streaming merge — fixed table, batch touching 1/4/16 buckets
     (cost proportional to touched buckets, not table size).

Method matches SCALING.md: disjoint shifted copies for volume scaling
(copy-unique tokens so no cross-copy near-dups), local[32], cache cleared
between runs, one warm-up run per operator before timing. Run on an
otherwise-idle box; prints a markdown table fragment to paste into
SCALING.md.
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from tesla_competitive_intelligence_etl_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"


def docs_copies(spark, k: int):
    """k disjoint copies of the documents corpus (ids shifted, copy-unique
    z{i} tokens so copies share no shingles) — same corpus builder as the
    round-4 LSH protocol."""
    base = spark.read.parquet(SF_DIR + "/documents.parquet").select("doc_id", "text")
    parts = [base]
    for i in range(1, k):
        parts.append(
            base.select(
                (F.col("doc_id") + 1_000_000 * i).alias("doc_id"),
                F.regexp_replace("text", " ", f" z{i} ").alias("text"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def emb_copies(spark, k: int):
    base = spark.read.parquet(SF_DIR + "/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    parts = [base] + [
        base.select((F.col("vec_id") + 1_000_000 * i).alias("vec_id"), "embedding")
        for i in range(1, k)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return round(time.perf_counter() - t0, 2)


def main() -> None:
    spark = get_spark("scaling_r5")
    spark.sparkContext.setLogLevel("ERROR")
    from tesla_competitive_intelligence_etl_pipeline_spark.operators import (
        clustering,
        dedup,
        packing,
        sampling,
    )
    from tesla_competitive_intelligence_etl_pipeline_spark.operators import text as tx
    from tesla_competitive_intelligence_etl_pipeline_spark.streaming import events as strm

    print("## 1. cross_corpus_neardup_indexed: fixed increment, growing corpus")
    increment = docs_copies(spark, 1).filter(F.col("doc_id") % 10 == 0)
    for k in (1, 2, 4):
        sig_path = tempfile.mkdtemp(prefix=f"sigs_k{k}_")
        dedup.write_signature_table(docs_copies(spark, k), sig_path)

        def run():
            dedup.cross_corpus_neardup_indexed(
                increment, spark, sig_path
            ).write.format("noop").mode("overwrite").save()

        run()  # warm
        spark.catalog.clearCache()
        print(f"| {k} | {timed(run)} |")
        spark.catalog.clearCache()
        shutil.rmtree(sig_path, ignore_errors=True)

    print("## 2. kmeans: volume 1x/2x/4x, k=8 dim=64 iters=5")
    for k in (1, 2, 4):
        emb = emb_copies(spark, k)

        def run():
            assigned, _ = clustering.kmeans(emb, k=8, max_iters=5)
            assigned.write.format("noop").mode("overwrite").save()

        run()  # warm
        spark.catalog.clearCache()
        print(f"| {k} | {timed(run)} |")
        spark.catalog.clearCache()

    print("## 3. sequence packing: volume 1x/2x/4x")
    for k in (1, 2, 4):
        docs = docs_copies(spark, k)

        def run():
            t = docs.select(
                "doc_id",
                tx.token_count(F.col("text")).cast("long").alias("toks"),
                sampling.stable_bucket(F.col("doc_id"), 1 << 31).alias("b"),
            )
            packing.pack_sequences(
                t, token_col="toks", order_cols=["b", "doc_id"], bin_tokens=4096
            ).groupBy("bin_id").agg(F.count("*").alias("n")).write.format(
                "noop"
            ).mode("overwrite").save()

        run()  # warm
        spark.catalog.clearCache()
        print(f"| {k} | {timed(run)} |")
        spark.catalog.clearCache()

    print("## 3b. semantic dedup: volume 1x/2x/4x with k scaled to hold cluster size")
    for mult, kk in ((1, 8), (2, 16), (4, 32)):
        emb = (
            spark.read.parquet(SF_DIR + "/embeddings.parquet")
            .select("vec_id", "embedding")
            .withColumn("i", F.explode(F.sequence(F.lit(0), F.lit(mult - 1))))
            .select(
                (F.col("vec_id") + F.col("i") * 1_000_000).alias("vec_id"),
                "embedding",
            )
        )

        def run():
            from tesla_competitive_intelligence_etl_pipeline_spark.operators import (
                dedup as dd,
            )

            dd.semantic_dedup(emb, k=kk, threshold=0.4).select(
                "vec_id"
            ).write.format("noop").mode("overwrite").save()

        run()  # warm
        spark.catalog.clearCache()
        print(f"| {mult} (k={kk}) | {timed(run)} |")
        spark.catalog.clearCache()

    print("## 4. streaming merge: fixed 64-bucket table, batch touches 1/4/16 buckets")
    target = tempfile.mkdtemp(prefix="gold_scale_") + "/t"
    ev = spark.read.parquet(SF_DIR + "/events.parquet")
    from tesla_competitive_intelligence_etl_pipeline_spark.sources import io as src_io

    ev = src_io.normalize_event_ts(ev).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    strm.merge_micro_batch(ev, target, n_buckets=64)  # seed the full table
    # batches of ~identical row count whose users hash into 1 / 4 / 16 buckets
    bucket = F.pmod(F.xxhash64("user_id"), F.lit(64))
    for nb in (1, 4, 16):
        batch = ev.filter(bucket < nb).limit(2000)

        def run():
            strm.merge_micro_batch(batch, target, n_buckets=64)

        run()  # warm (also the only run that mutates — fine: cost shape only)
        print(f"| {nb} | {timed(run)} |")
    shutil.rmtree(target, ignore_errors=True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Measured-scaling protocol, round 13: high-merge BPE — training
rounds/sec by strategy, and deployment-regime encode throughput
(VERDICT r12 item 6).

A. TRAINING rounds/sec. The distributed trainer pays one Spark job per
merge round (the r11 ceiling); the r12 local strategy collects the
(word, sym, freq) dictionary once and loops driver-side with incremental
pair-count bookkeeping — bit-identical merge lists (pinned in
tests/test_corpus.py). This sweep puts numbers on the gap: rounds/sec at
96 / 512 / 2048 rounds (local) vs 96 rounds (distributed). At a
production 32-64k-merge vocabulary, rounds/sec IS the feasibility axis.

B. ENCODE throughput in the DEPLOYMENT regime (the x5_bpe_encode_highmerge
path: 96 merges > BPE_EXPR_MAX_MERGES, Arrow UDF once per DISTINCT OOV
word). The sf0.1 documents corpus is unioned with k-1 id-shifted copies
(identical text -> the distinct-word dictionary and OOV set stay FIXED
while occurrence volume grows k x), so the sweep isolates the
occurrence-side cost: one word-keyed shuffle + explode + ordered
assembly. Expected LINEAR in token volume — the Python-side (UDF) work
is constant by construction.

Method matches scaling_r5..r11: local[32], idle-box guard, warm-up
throwaway, cache cleared between runs.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from tesla_competitive_intelligence_etl_pipeline_spark.operators import text as tx  # noqa: E402
from tesla_competitive_intelligence_etl_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    if os.getloadavg()[0] > 2.0:
        sys.exit(f"box busy (loadavg {os.getloadavg()[0]:.1f}); rerun idle")
    spark = get_spark()
    from tesla_competitive_intelligence_etl_pipeline_spark.sources import io as src

    docs = src.load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    docs = docs.localCheckpoint(eager=True)

    print("A. training rounds/sec (documents corpus, sf0.1)")
    print(f"{'strategy':>14} {'rounds':>8} {'wall (s)':>10} {'rounds/s':>10}")
    t0 = time.perf_counter()
    tx.bpe_train(docs, n_merges=96, strategy="distributed")
    td = time.perf_counter() - t0
    print(f"{'distributed':>14} {96:>8} {td:>10.2f} {96 / td:>10.1f}")
    for rounds in (96, 512, 2048):
        t0 = time.perf_counter()
        m = tx.bpe_train(docs, n_merges=rounds, strategy="local")
        n_learned = m.count()
        tl = time.perf_counter() - t0
        print(
            f"{'local':>14} {rounds:>8} {tl:>10.2f} {n_learned / tl:>10.1f}"
            + ("" if n_learned == rounds else f"  (learned {n_learned}: pairs exhausted)")
        )

    # the deployment artifact: 96 merges -> UDF regime in bpe_encode_ids
    merges_df, vocab = tx.bpe_train(
        docs, n_merges=96, return_vocab=True, strategy="local"
    )
    vocab = vocab.localCheckpoint(eager=True)
    merges = [
        (r.pair, r.merged) for r in merges_df.orderBy("merge_rank").collect()
    ]
    assert len(merges) > tx.BPE_EXPR_MAX_MERGES  # deployment regime

    def volume(k: int):
        parts = [docs]
        for i in range(1, k):
            parts.append(
                docs.select(
                    (F.col("doc_id") + 1_000_000 * i).alias("doc_id"), "text"
                )
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        # heldout injection, same shape as the gate entry
        return out.select(
            "doc_id",
            F.concat(
                F.col("text"), F.lit(" winnower"), F.col("doc_id").cast("string")
            ).alias("text"),
        ).localCheckpoint(eager=True)

    def run(d):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        n_tok = (
            tx.bpe_encode_ids(d, vocab, merges=merges)
            .agg(F.sum("n_tokens"))
            .collect()[0][0]
        )
        return time.perf_counter() - t0, int(n_tok)

    run(volume(1))  # warm-up throwaway
    print("B. deployment-regime encode throughput (96 merges, fixed OOV set)")
    print(f"{'k':>4} {'docs':>8} {'tokens':>12} {'wall (s)':>10} {'Mtok/s':>8} {'s/volume':>9}")
    base = None
    for k in (1, 2, 4):
        d = volume(k)
        n_docs = d.count()
        wall, n_tok = run(d)
        base = base or wall
        print(
            f"{k:>4} {n_docs:>8} {n_tok:>12} {wall:>10.2f} "
            f"{n_tok / wall / 1e6:>8.2f} {wall / k:>9.2f}"
        )


if __name__ == "__main__":
    main()

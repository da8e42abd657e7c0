#!/usr/bin/env python
"""Measured-scaling protocol, round 9: distinct-word OOV encoding in the
BPE UDF regime (VERDICT r8 item 4).

Past BPE_EXPR_MAX_MERGES the ranked-merge encoder runs as an Arrow
pandas_udf. Round 8 evaluated it once per word OCCURRENCE; round 9 encodes
each DISTINCT OOV word once and joins the spellings back — the same shape
as the vocabulary join itself. On a repetitive held-out corpus (every real
corpus: Zipf) the old shape multiplies the Python-side work by the
duplication factor, so the sweep holds the DISTINCT OOV vocabulary fixed
(2 000 words) and grows the occurrence count 25k -> 100k -> 400k:

- per-occurrence (r8 shape, reconstructed inline): wall time grows with
  occurrences — the udf sees every row.
- per-distinct-word (the operator, r9): the udf sees 2 000 rows at every
  scale; wall time should stay near-flat (the residual growth is the
  join + explode + groupBy the operator always pays).

Method matches scaling_r5..r8: local[32], idle-box guard, one warm-up
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

N_DISTINCT = 2_000


def corpus(spark, n_occurrences: int):
    """n_occurrences OOV words drawn round-robin from N_DISTINCT distinct
    spellings ('zz<k>x' — guaranteed absent from the training vocab),
    packed 1 000 words per document."""
    return (
        spark.range(n_occurrences)
        .select(
            (F.col("id") / 1000).cast("long").alias("doc_id"),
            # 40-char OOV spellings: long enough that the ranked-merge
            # rewrite is real per-word work (production words + subword
            # junk), still deterministic
            F.concat(
                F.lit("zz"), (F.col("id") % N_DISTINCT).cast("string"),
                F.lit("xqwertyuiopasdfghjklzxcvbnmqwertyuiop"),
            ).alias("w"),
        )
        .groupBy("doc_id")
        .agg(F.concat_ws(" ", F.collect_list("w")).alias("text"))
    )


def per_occurrence_encode(docs, vocab, merges, eow=None):
    """The r8 shape, reconstructed: the udf as the join's per-row fallback."""
    words = docs.select(
        F.col("doc_id"),
        F.posexplode(F.split(F.lower(F.col("text")), r"\s+")).alias("__wpos", "word"),
    ).filter(F.col("word") != "")
    fallback = tx.bpe_apply_merges_udf(merges, eow)(F.col("word"))
    with_sym = words.join(vocab, "word", "left").select(
        F.col("doc_id"), "__wpos", F.coalesce(F.col("sym"), fallback).alias("__sym")
    )
    toks = with_sym.select(
        F.col("doc_id"), "__wpos",
        F.posexplode(F.split("__sym", " ")).alias("__spos", "symbol"),
    )
    symtab = tx.bpe_symbol_table(vocab)
    return (
        toks.join(symtab, "symbol", "left")
        .groupBy("doc_id")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        "__wpos", "__spos",
                        F.coalesce(F.col("tok_id"), F.lit(-1).cast("long")).alias("tok_id"),
                    )
                )
            ).alias("__s")
        )
        .select(
            "doc_id",
            F.transform("__s", lambda x: x["tok_id"]).alias("token_ids"),
            F.size("__s").cast("long").alias("n_tokens"),
        )
    )


def main() -> None:
    if os.getloadavg()[0] > 2.0:
        sys.exit(f"box busy (loadavg {os.getloadavg()[0]:.1f}); rerun idle")
    spark = get_spark()

    train = spark.range(5_000).select(
        (F.col("id") / 100).cast("long").alias("doc_id"),
        F.lit("banana bandana cabana lowlands newest winters").alias("text"),
    )
    merges_df, vocab = tx.bpe_train(train, n_merges=3, return_vocab=True)
    real = [(r.pair, r.merged) for r in merges_df.orderBy("merge_rank").collect()]
    # production-shaped merge list: 512 entries (a 32k-merge deployment
    # is 60x this; the per-occurrence cost scales with it)
    padded = real + [(f"q{i} r{i}", f"q{i}r{i}") for i in range(512)]
    vocab = vocab.localCheckpoint(eager=True)

    def run(fn):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        fn().write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 2)

    # warm-up throwaway
    run(lambda: tx.bpe_encode_ids(corpus(spark, 10_000), vocab, merges=padded))

    print(f"distinct OOV words fixed at {N_DISTINCT}")
    print("A. occurrence sweep (512 merges)")
    print(f"{'occurrences':>12} {'per-occurrence s':>18} {'per-distinct s':>16} {'x':>6}")
    for n in (25_000, 100_000, 400_000):
        docs = corpus(spark, n).localCheckpoint(eager=True)
        t_old = run(lambda: per_occurrence_encode(docs, vocab, padded))
        t_new = run(lambda: tx.bpe_encode_ids(docs, vocab, merges=padded))
        print(f"{n:>12} {t_old:>18} {t_new:>16} {round(t_old / t_new, 1):>6}")

    # B. merge-list sweep at fixed occurrences: the udf's per-row cost is
    # linear in the merge list (a production vocab is 32k merges), so the
    # per-occurrence shape diverges while per-distinct stays flat — this
    # is the regime the operator actually runs in
    print("B. merge-list sweep (100k occurrences)")
    print(f"{'merges':>12} {'per-occurrence s':>18} {'per-distinct s':>16} {'x':>6}")
    docs = corpus(spark, 100_000).localCheckpoint(eager=True)
    for n_m in (512, 2048, 8192):
        big = real + [(f"q{i} r{i}", f"q{i}r{i}") for i in range(n_m)]
        t_old = run(lambda: per_occurrence_encode(docs, vocab, big))
        t_new = run(lambda: tx.bpe_encode_ids(docs, vocab, merges=big))
        print(f"{n_m:>12} {t_old:>18} {t_new:>16} {round(t_old / t_new, 1):>6}")


if __name__ == "__main__":
    main()

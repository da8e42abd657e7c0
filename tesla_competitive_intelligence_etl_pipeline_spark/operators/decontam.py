"""Benchmark decontamination for pre-training corpora.

The standard eval-set hygiene pass (GPT-3 appendix C style): a training
document is *contaminated* if any of its word n-grams also appears in a
held-out benchmark set. At 100 TB this is an n-gram semi-join:

- the benchmark side is small (evals are thousands of documents, not
  billions) -> its distinct n-gram set is broadcast, so the corpus NEVER
  shuffles; contamination tagging pipelines with the scan;
- n-grams are generated with pure array expressions (JVM-side, codegen);
- per-document hit counts come from one partial-aggregable groupBy on
  (doc_id) over the join survivors only — the matched subset, which is tiny
  for a clean corpus.

If the benchmark ever outgrows broadcast range, the same plan degrades
gracefully to a shuffled semi-join on the n-gram hash — no code change, drop
the `broadcast()` hint.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tesla_competitive_intelligence_etl_pipeline_spark.operators import text as tx


def ngram_set(text: Column, n: int) -> Column:
    """Distinct word n-grams of the normalized text (the unit of overlap)."""
    return F.array_distinct(tx.ngrams(text, n))


def benchmark_ngrams(benchmark: DataFrame, n: int, text_col: str = "text") -> DataFrame:
    """The benchmark's global distinct n-gram set -> one column `ng`."""
    return (
        benchmark.select(F.explode(ngram_set(F.col(text_col), n)).alias("ng"))
        .distinct()
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    min_hits: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Tag every doc with its benchmark n-gram overlap.

    Returns `id_col, bench_hits (distinct matched n-grams), contaminated`,
    exactly ONE row per distinct ``id_col`` value. Duplicate ids in ``docs``
    are tolerated: matched (id, n-gram) pairs are de-duplicated before
    counting (the distinct runs over join SURVIVORS only — tiny for a clean
    corpus — so it adds no full-corpus shuffle) and the id spine is
    `.distinct()`, so duplicated ids neither double-count hits nor fan out.
    Keep the clean corpus with `.filter(~F.col('contaminated'))`.
    """
    # n-gram generation is CPU-bound per row; small single-file inputs arrive
    # as one partition, so spread across cores first (r13: conditional keyed
    # spread — at 100 TB the inputs are already many splits and the spread
    # is a NO-OP instead of a pointless full shuffle; guide §2.4/§2.5).
    from tesla_competitive_intelligence_etl_pipeline_spark.sources.io import spread

    bench = benchmark_ngrams(spread(benchmark, text_col), n, text_col)
    doc_grams = spread(docs, id_col).select(
        F.col(id_col), F.explode(ngram_set(F.col(text_col), n)).alias("ng")
    )
    hits = (
        doc_grams.join(F.broadcast(bench), "ng")
        .distinct()  # (id, ng) pairs: robust to duplicate ids; survivors only
        .groupBy(id_col)
        .agg(F.count("*").alias("bench_hits"))
    )
    return docs.select(id_col).distinct().join(hits, id_col, "left").select(
        F.col(id_col),
        F.coalesce(F.col("bench_hits"), F.lit(0)).cast("bigint").alias("bench_hits"),
        (F.coalesce(F.col("bench_hits"), F.lit(0)) >= min_hits).alias("contaminated"),
    )

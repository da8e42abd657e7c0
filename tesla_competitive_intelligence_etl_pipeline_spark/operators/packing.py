"""Distributed prefix sum + sequence packing (training-data pipelines).

A global running total (`SUM() OVER (ORDER BY ...)` with no PARTITION BY)
is the classic Spark scale trap: the window forces `Exchange SinglePartition`
— the whole dataset through ONE task. This module implements the standard
two-pass rewrite:

  1. `repartitionByRange(order)` — data range-partitioned AND sorted-ish by
     the global order; per-partition running sums via a window keyed on
     `spark_partition_id()` (parallel);
  2. per-partition TOTALS (one tiny row per partition) get their own prefix
     sum — n_partitions rows, trivially cheap — and are joined back as
     offsets.

Result: the exact global cumulative sum with NO single-partition stage
over the data (asserted in tests/test_operators.py against the naive
plan). The range-partitioned, pid-stamped relation is persisted before
fanning into the two passes: both correctness (each physical range
exchange samples its own partition bounds, so un-cached branches could
partition differently on skewed data) and cost (the upstream — e.g. a
tokenizer — must evaluate once, not once per branch) require the fan-out
point to be materialized.

On top of it: GPT-style sequence packing — documents concatenated in a
deterministic (stable-hash) order and chunked into fixed-token bins
(`bin = floor(cum_before / bin_tokens)`), the "concat-then-chunk" layout
pre-training batches use. Both are SQL-expressible, so oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_cumsum(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    out_col: str = "cum",
) -> DataFrame:
    """Exact inclusive running total of ``value_col`` over the TOTAL order
    given by ``order_cols`` (must be unique-per-row for determinism), with
    no single-partition exchange over the data (the per-partition totals —
    one row per partition — are the only single-partition stage)."""
    d = df.repartitionByRange(*order_cols).withColumn("__pid", F.spark_partition_id())
    # Persisted because BOTH branches below (the per-row local window and the
    # per-partition totals) consume d. Without it each branch re-evaluates
    # the whole upstream — twice the scan/compute, fatal when the input is
    # e.g. a tokenizer output (x5_tokenize_pack) — and, worse, runs its OWN
    # range exchange whose partition bounds are SAMPLED per physical
    # exchange: two independent evaluations can draw different bounds on
    # skewed data and assign a row different __pid in each branch, making
    # the offsets join silently wrong. One materialization removes both.
    # The cache holds exactly the input columns + __pid — callers should
    # project to (order, value) + carried columns before calling to keep
    # the footprint minimal (x5_tokenize_pack caches 2 longs per doc).
    d = d.persist()
    w_local = (
        Window.partitionBy("__pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = d.withColumn("__local", F.sum(F.col(value_col)).over(w_local))
    # one row per partition; its own prefix sum is negligible work
    totals = local.groupBy("__pid").agg(F.sum(F.col(value_col)).alias("__ptot"))
    w_off = (
        Window.orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = totals.withColumn(
        "__offset", F.sum("__ptot").over(w_off) - F.col("__ptot")
    ).select("__pid", "__offset")
    return (
        local.join(F.broadcast(offsets), "__pid")
        .withColumn(out_col, F.col("__local") + F.col("__offset"))
        .drop("__pid", "__local", "__offset")
    )


def pack_sequences(
    docs: DataFrame,
    token_col: str,
    order_cols: list[str],
    bin_tokens: int = 4096,
) -> DataFrame:
    """Assign each document to a training bin under concat-then-chunk
    packing: documents laid out in ``order_cols`` order, bin boundary every
    ``bin_tokens`` tokens; a document's bin is where its FIRST token lands
    (documents may straddle — the downstream chunker splits them, exactly
    like GPT-style pretraining packing). Adds ``cum_tokens`` (inclusive)
    and ``bin_id``."""
    with_cum = global_cumsum(docs, order_cols, token_col, out_col="cum_tokens")
    return with_cum.withColumn(
        "bin_id",
        F.floor((F.col("cum_tokens") - F.col(token_col)) / bin_tokens).cast("long"),
    )


def pack_chunks(
    docs: DataFrame,
    token_col: str,
    order_cols: list[str],
    bin_tokens: int = 4096,
) -> DataFrame:
    """The chunking half of concat-then-chunk packing (r13): explode each
    document into its per-bin token SLICES. A document occupying global
    token interval ``[cum_tokens - toks, cum_tokens)`` contributes one row
    per bin it overlaps — ``tok_offset`` is the 0-based token offset into
    the document where the slice starts, ``chunk_tokens`` its length, so a
    downstream splitter can cut the actual token arrays without any further
    coordination: every bin's slices sum to exactly ``bin_tokens`` (except
    the corpus' final bin), every document's slices are contiguous and sum
    to its token count. Zero-token documents occupy no interval and are
    dropped. Adds ``bin_id``, ``tok_offset``, ``chunk_tokens`` (and the
    intermediate ``cum_tokens``); one generate-series explode per doc —
    rows grow only by the straddle count (≤ total_tokens/bin_tokens), never
    a cross join."""
    packed = pack_sequences(docs, token_col, order_cols, bin_tokens)
    start = F.col("cum_tokens") - F.col(token_col)  # first token, inclusive
    first_bin = F.floor(start / bin_tokens)
    last_bin = F.floor((F.col("cum_tokens") - 1) / bin_tokens)
    sliced = (
        packed.filter(F.col(token_col) > 0)
        # replaces pack_sequences' first-token bin_id with one row per
        # overlapped bin; toks > 0 guarantees first_bin <= last_bin, so
        # the sequence is ascending and never empty
        .withColumn("bin_id", F.explode(F.sequence(first_bin, last_bin)))
    )
    chunk_start = F.greatest(start, F.col("bin_id") * F.lit(bin_tokens))
    chunk_end = F.least(
        F.col("cum_tokens"), (F.col("bin_id") + 1) * F.lit(bin_tokens)
    )
    return sliced.withColumn(
        "tok_offset", (chunk_start - start).cast("long")
    ).withColumn("chunk_tokens", (chunk_end - chunk_start).cast("long"))

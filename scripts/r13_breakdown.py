#!/usr/bin/env python
"""Round-13 phase breakdown probes (guide §1 — empirical loop, noop sink).

Times the internal phases of the expensive pipelines in isolation so the
optimization effort lands where the seconds are:
  minhash   — shingle+signature pass, banded explode, candidate self-join,
              verification join (each cumulative, noop-sunk)
  decimal   — q1's aggregate with exact-decimal sums vs raw double sums vs
              long-unscaled sums (the 3 candidate formulations), plus scan-only
  cc        — connected-components round count + per-round cost for
              x2_cluster_dedup's pair graph
  encode    — bpe_encode_ids phases: word explode+lookup join vs full assemble
Usage: python scripts/r13_breakdown.py [probe ...]   (default: all)

Diagnostic only — not part of the bench contract.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF = "/root/testdata/sf0.1"


def t(spark, label, df):
    spark.sparkContext.setJobDescription(f"r13-breakdown {label}")
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    dt = round(time.perf_counter() - t0, 3)
    print(f"  {label}: {dt}s", file=sys.stderr)
    return dt


def probe_minhash(spark):
    from pyspark.sql import functions as F
    from tesla_competitive_intelligence_etl_pipeline_spark.operators import dedup as dd
    from tesla_competitive_intelligence_etl_pipeline_spark.sources import io as src

    out = {}
    docs = src.load_table(spark, SF, "documents")
    sigs = dd._with_shingles_and_sig(docs, "text", "doc_id", 32, 3)
    out["1_sigs_only"] = t(spark, "sigs only", sigs)
    spark.catalog.clearCache()

    # full pipeline phases, each building on a fresh persist chain
    sigs = dd._with_shingles_and_sig(docs, "text", "doc_id", 32, 3).persist()
    banded = dd._band_explode(sigs, 32, 8)
    out["2_sigs_plus_banded"] = t(spark, "sigs + banded", banded)
    over = (
        banded.groupBy("band", "bucket")
        .agg(F.count("*").alias("__bsz"))
        .filter(F.col("__bsz") > 256)
        .select("band", "bucket")
    )
    banded_capped = banded.join(F.broadcast(over), ["band", "bucket"], "left_anti")
    candidates = (
        banded_capped.alias("l")
        .join(
            banded_capped.alias("r"),
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(F.col("l.doc_id").alias("doc_a"), F.col("r.doc_id").alias("doc_b"))
        .distinct()
    )
    out["3_plus_candidates"] = t(spark, "sigs + banded + candidates", candidates)
    n_cand = candidates.count()
    out["n_candidates"] = n_cand
    sh = sigs.select("doc_id", "sh")
    verified = (
        candidates.join(
            sh.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sh", "sh_a"),
            "doc_a",
        )
        .join(
            sh.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sh", "sh_b"),
            "doc_b",
        )
        .withColumn("jaccard", F.round(dd.exact_jaccard(F.col("sh_a"), F.col("sh_b")), 6))
        .filter(F.col("jaccard") >= 0.5)
        .select("doc_a", "doc_b", "jaccard")
    )
    out["4_full"] = t(spark, "full verified", verified)
    spark.catalog.clearCache()
    return out


def probe_decimal(spark):
    from pyspark.sql import functions as F
    from tesla_competitive_intelligence_etl_pipeline_spark.operators import aggregates as agg
    from tesla_competitive_intelligence_etl_pipeline_spark.sources import io as src

    out = {}
    li = src.spread(
        src.load_table(spark, SF, "lineitem").filter(F.col("l_shipdate") <= "1998-09-02"),
        "l_orderkey",
    )
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    out["scan_only"] = t(spark, "q1 scan only", li)
    out["double_sums"] = t(
        spark,
        "q1 double sums",
        li.groupBy("l_returnflag", "l_linestatus").agg(
            F.sum("l_quantity"),
            F.sum("l_extendedprice"),
            F.sum(disc),
            F.sum(disc * (1 + F.col("l_tax"))),
            F.avg("l_quantity"),
            F.avg("l_discount"),
            F.count("*"),
        ),
    )
    out["exact_decimal_38"] = t(
        spark,
        "q1 exact decimal38",
        li.groupBy("l_returnflag", "l_linestatus").agg(
            agg.exact_sum(F.col("l_quantity"), 2),
            agg.exact_sum(F.col("l_extendedprice"), 2),
            agg.exact_sum(disc),
            agg.exact_sum(disc * (1 + F.col("l_tax"))),
            agg.exact_avg(F.col("l_quantity"), 2),
            agg.exact_avg(F.col("l_discount"), 6),
            F.count("*"),
        ),
    )
    out["decimal_18_input"] = t(
        spark,
        "q1 decimal18 input cast",
        li.groupBy("l_returnflag", "l_linestatus").agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double"),
            F.sum(disc.cast("decimal(18,6)")).cast("double"),
            F.sum((disc * (1 + F.col("l_tax"))).cast("decimal(18,6)")).cast("double"),
            F.count("*"),
        ),
    )
    return out


def probe_cc(spark):
    from pyspark.sql import functions as F
    from tesla_competitive_intelligence_etl_pipeline_spark.operators import dedup as dd
    from tesla_competitive_intelligence_etl_pipeline_spark.sources import io as src

    out = {}
    docs = src.load_table(spark, SF, "documents")
    pairs = dd.minhash_lsh_pairs(docs, threshold=0.5, max_bucket_size=256).persist()
    t0 = time.perf_counter()
    n_pairs = pairs.count()
    out["pairs_materialize_s"] = round(time.perf_counter() - t0, 3)
    out["n_pairs"] = n_pairs
    edges = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    verts = docs.select(F.col("doc_id").alias("id"))
    t0 = time.perf_counter()
    comp = dd.connected_components(edges, verts)
    out["cc_from_cached_pairs_s"] = t(spark, "cc over cached pairs", comp)
    spark.catalog.clearCache()
    return out


def probe_encode(spark):
    from pyspark.sql import functions as F
    from tesla_competitive_intelligence_etl_pipeline_spark.operators import text as tx
    from tesla_competitive_intelligence_etl_pipeline_spark.plans import registry_corpus as rc
    from tesla_competitive_intelligence_etl_pipeline_spark.sources import io as src

    out = {}
    path = rc._ensure_hm_vocab(spark, SF)
    merges, vocab, cfg = tx.bpe_load(spark, path)
    docs = src.load_table(spark, SF, "documents").withColumn(
        "text",
        F.concat(F.col("text"), F.lit(" winnower"), F.col("doc_id").cast("string")),
    )
    words = docs.select(
        "doc_id",
        F.posexplode(tx.pretokenize_pieces(F.col("text"), "whitespace")).alias(
            "__wpos", "word"
        ),
    ).filter(F.col("word") != "")
    out["words_explode"] = t(spark, "encode words explode", words)
    out["full_encode"] = t(
        spark, "encode full", tx.bpe_encode_ids(docs, vocab, merges=merges)
    )
    return out


PROBES = {
    "minhash": probe_minhash,
    "decimal": probe_decimal,
    "cc": probe_cc,
    "encode": probe_encode,
}


def main():
    names = sys.argv[1:] or list(PROBES)
    from tesla_competitive_intelligence_etl_pipeline_spark.session import get_spark

    spark = get_spark("r13-breakdown")
    spark.sparkContext.setLogLevel("ERROR")
    # steady-state warmup, same posture as bench.py
    import __spark_entry__ as entrymod

    queries = entrymod.queries()
    queries["agg_global_count"](spark, SF).collect()
    queries["x10_pandas_udf_tokens"](spark, SF).write.format("noop").mode(
        "overwrite"
    ).save()
    spark.catalog.clearCache()
    results = {}
    for n in names:
        print(f"# probe {n}", file=sys.stderr)
        results[n] = PROBES[n](spark)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()

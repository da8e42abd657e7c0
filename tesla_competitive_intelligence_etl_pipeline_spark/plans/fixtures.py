"""Engine-hash fixture tables (r10 — VERDICT r9 item 4): oracle-check the
xxhash64 production family, not just its md5-portable twins.

Six registry entries were rows-only because their candidate generation
hashes with xxhash64, which DuckDB cannot evaluate. But the hash calls are
the ONLY engine-specific step: everything downstream — band-bucket
grouping, the oversized-bucket cap, the cross/self candidate join, exact
Jaccard over (hashed) shingle sets, hamming distance, the canonical-removal
policy, the transitive closure — is plain relational algebra. So the engine
PERSISTS its hash outputs for the small gate corpora as fixture parquet
under ``FIXTURE_ROOT``, and the oracle re-derives banding/candidates/
verdicts/policy in SQL from those values (plans/oracle_vec.py's
*_fixture_sql builders). Only ``xxhash64(...)`` itself stays engine-side;
a wrong cap, join, Jaccard, policy, or closure now hash-mismatches.

Mechanics and their honest limits:

- Every fixture row is stamped ``corpus_n`` = the sf's full documents
  count, written to an ``n=<count>`` subdir, and the SQL filters
  ``corpus_n = (SELECT COUNT(*) FROM documents)`` — one fixture root
  serves every SF concurrently (different SFs write different subdirs and
  select their own rows; the driver's gate SF and the two local parity SFs
  never collide).
- The QUERY callable writes the fixture synchronously before returning its
  (lazy) result, and the harness runs each entry's oracle after building
  its DataFrame — so within one comparison the fixture is always fresh.
  Two processes verifying the SAME sf at the SAME moment can race the
  overwrite (identical bytes, tiny window); these entries therefore stay
  OUTSIDE the driver's 50-entry window, covered by the sequential local
  parity suites at both SFs.
- The fixture derivation mirrors the operators' expressions
  (dedup._with_shingles_and_sig / _band_explode / simhash64 + the 16-bit
  chunk split); values are deterministic, so fixture and query agree
  without sharing a computation. If an operator's hashing layout changes,
  change the matching ensure_* here — the hash gate is what catches a
  silent drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

FIXTURE_ROOT = "/tmp/spark_graft_fixtures"

_DOC_N: dict[str, int] = {}
_WRITTEN: set[tuple[str, str]] = set()


def doc_count(spark: SparkSession, sf_dir: str) -> int:
    if sf_dir not in _DOC_N:
        from tesla_competitive_intelligence_etl_pipeline_spark.sources import io as src

        _DOC_N[sf_dir] = src.load_table(spark, sf_dir, "documents").count()
    return _DOC_N[sf_dir]


def _write(spark, sf_dir: str, group: str, tables: dict[str, DataFrame]) -> None:
    n = doc_count(spark, sf_dir)
    for name, df in tables.items():
        (
            df.withColumn("corpus_n", F.lit(n).cast("long"))
            .coalesce(4)
            .write.mode("overwrite")
            .parquet(f"{FIXTURE_ROOT}/{group}/{name}/n={n}")
        )


def ensure_minhash_fixture(spark: SparkSession, sf_dir: str) -> None:
    """(doc_id, sh) + (doc_id, band, bucket) for the full documents corpus —
    the xxhash64 outputs behind x2_minhash_lsh / x2_near_dedup_canonical /
    x2_cluster_dedup (num_hashes=32, bands=8, trigram shingles)."""
    if ("minhash", sf_dir) in _WRITTEN:
        return
    from tesla_competitive_intelligence_etl_pipeline_spark.operators import dedup as dd
    from tesla_competitive_intelligence_etl_pipeline_spark.sources import io as src

    docs = src.load_table(spark, sf_dir, "documents")
    sigs = dd._with_shingles_and_sig(docs, "text", "doc_id", 32, 3).persist()
    try:
        _write(
            spark, sf_dir, "minhash",
            {
                "sh": sigs.select("doc_id", "sh"),
                "bb": dd._band_explode(sigs, 32, 8),
            },
        )
    finally:
        sigs.unpersist()
    _WRITTEN.add(("minhash", sf_dir))


def ensure_simhash_fixture(spark: SparkSession, sf_dir: str) -> None:
    """(doc_id, sig) + (doc_id, band, chunk) for doc_id < 200 — the
    xxhash64-derived SimHash signatures and their 4x16-bit band chunks
    behind x2_simhash. Chunks are persisted too (not re-split in SQL):
    candidate RECALL above hamming 3 depends on the exact chunk values, so
    the oracle must band on the engine's chunks, not a re-derivation with
    possibly different shift semantics."""
    if ("simhash", sf_dir) in _WRITTEN:
        return
    from tesla_competitive_intelligence_etl_pipeline_spark.operators import dedup as dd
    from tesla_competitive_intelligence_etl_pipeline_spark.sources import io as src

    docs = src.load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    sigs = docs.select(
        F.col("doc_id"), dd.simhash64(F.col("text")).alias("sig")
    ).persist()
    chunk_bits, bands = 16, 4
    mask = (1 << chunk_bits) - 1
    bb = sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright("sig", b * chunk_bits)
                        .bitwiseAND(F.lit(mask))
                        .alias("chunk"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.chunk")
    try:
        _write(
            spark, sf_dir, "simhash",
            {"sig": sigs.select("doc_id", "sig"), "bb": bb},
        )
    finally:
        sigs.unpersist()
    _WRITTEN.add(("simhash", sf_dir))


def ensure_crosslsh_fixture(spark: SparkSession, sf_dir: str) -> None:
    """(side, doc_id, sh) + (side, doc_id, band, bucket) for the crawl
    scenario behind x2_cross_corpus_lsh / x2_cross_corpus_indexed: existing
    corpus = doc_id < 100 (side 0), increment = first 50 docs re-keyed
    +1e6 with a ' zz' suffix (side 1). The indexed twin's stored signature
    table holds byte-identical (sh, sig) values (same deterministic
    expressions), so one fixture serves both entries."""
    if ("crosslsh", sf_dir) in _WRITTEN:
        return
    from tesla_competitive_intelligence_etl_pipeline_spark.operators import dedup as dd
    from tesla_competitive_intelligence_etl_pipeline_spark.sources import io as src

    docs = src.load_table(spark, sf_dir, "documents").select("doc_id", "text")
    old = docs.filter(F.col("doc_id") < 100)
    new = docs.filter(F.col("doc_id") < 50).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zz")).alias("text"),
    )
    sigs = (
        dd._with_shingles_and_sig(new, "text", "doc_id", 32, 3)
        .withColumn("side", F.lit(1))
        .unionByName(
            dd._with_shingles_and_sig(old, "text", "doc_id", 32, 3)
            .withColumn("side", F.lit(0))
        )
        .persist()
    )
    try:
        _write(
            spark, sf_dir, "crosslsh",
            {
                "sh": sigs.select("side", "doc_id", "sh"),
                "bb": dd._band_explode(sigs, 32, 8, "side"),
            },
        )
    finally:
        sigs.unpersist()
    _WRITTEN.add(("crosslsh", sf_dir))

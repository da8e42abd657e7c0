"""Registry batch 3: [EXT] LLM-data-pipeline operators (SURVEY.md §2.9) —
dedup (X-1/2), similarity search (X-3), multimodal (X-4), text analysis (X-5),
approx aggregates (X-6), grouping analytics (X-7), window analytics (X-8),
UDF surface (X-10), plus batch event-time operators (tumbling + session
windows; the streaming twins live in streaming/).

Approximate operators (LSH/SimHash/HLL) are registered without oracles —
the driver records rows-only checks; their exact verification lives in
tests/test_ext.py against brute-force ground truth.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tesla_competitive_intelligence_etl_pipeline_spark.operators import aggregates as agg
from tesla_competitive_intelligence_etl_pipeline_spark.operators import dedup as dd
from tesla_competitive_intelligence_etl_pipeline_spark.operators import multimodal as mm
from tesla_competitive_intelligence_etl_pipeline_spark.operators import similarity as sim
from tesla_competitive_intelligence_etl_pipeline_spark.operators import text as tx
from tesla_competitive_intelligence_etl_pipeline_spark.plans import oracle_vec
from tesla_competitive_intelligence_etl_pipeline_spark.plans.registry import _dsum, register
from tesla_competitive_intelligence_etl_pipeline_spark.sources import io as src

# DuckDB twin of text.normalized_text
_NORM = (
    "trim(regexp_replace(regexp_replace(lower({c}), '[^\\w\\s]', '', 'g'),"
    " '\\s+', ' ', 'g'))"
)

# DuckDB twin of similarity._dot_exact (sequential double fold; consumers
# round to 6 decimals so last-ulp fold differences cannot surface)
def _ducksql_dot(a: str, b: str) -> str:
    return (
        f"CAST(list_sum(list_transform(range(1, len({a})+1), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))) AS DOUBLE)"
    )


def _ducksql_cosine(a: str, b: str) -> str:
    return (
        f"ROUND({_ducksql_dot(a, b)} / "
        f"(sqrt({_ducksql_dot(a, a)}) * sqrt({_ducksql_dot(b, b)})), 6)"
    )


# ===========================================================================
# X-1: exact dedup (simulated re-crawl: corpus unioned with itself)
# ===========================================================================


@register(
    "x1_dedup_exact",
    f"""
    WITH crawl AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000, text FROM documents
    )
    SELECT MIN(doc_id) AS doc_id, COUNT(*) AS dup_count
    FROM crawl
    GROUP BY {_NORM.format(c='text')}
    """,
)
def x1_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-1: exact dedup by content hash over a simulated re-crawl (every doc
    appears twice under different ids); survivor = lowest id."""
    docs = src.load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # r13 (revised): an earlier spread here measured SLOWER (0.39 -> 0.67 s)
    # — it shuffled the full TEXT payload to parallelize a cheap
    # normalize+md5 whose groupBy exchange ships only the md5 keys
    # (guide §2.3 / §8: shuffle keys and metadata, not payloads). Reverted.
    recrawl = docs.unionByName(docs.withColumn("doc_id", F.col("doc_id") + 1000000))
    return dd.exact_dedup(recrawl)


@register("x2_minhash_lsh", oracle_vec.minhash_fixture_pairs_sql(0.5, 256))
def x2_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-2: MinHash(32 hashes) + LSH(8 bands) candidate generation with exact
    Jaccard verification at 0.5 on word-3-gram shingles. The 256 bucket cap
    is ENGINE POLICY set here, not an operator default (ADVICE r3) — what it
    would drop is measurable via dd.lsh_oversized_buckets. Hash-checked
    since r10 (previously rows-only): the engine persists its xxhash64
    signatures + band buckets as a fixture (plans/fixtures.py) and the
    oracle re-derives capping/candidates/Jaccard in SQL from them — only
    the hash call stays engine-side (VERDICT r9 item 4)."""
    from tesla_competitive_intelligence_etl_pipeline_spark.plans import fixtures

    fixtures.ensure_minhash_fixture(spark, sf_dir)
    docs = src.load_table(spark, sf_dir, "documents")
    return dd.minhash_lsh_pairs(docs, threshold=0.5, max_bucket_size=256)


@register(
    "x2_minhash_lsh_portable",
    oracle_vec.minhash_lsh_portable_sql(threshold=0.5, num_hashes=32, bands=8),
)
def x2_minhash_lsh_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-2 (hash-checked, NEW r5): the engine-portable MinHash-LSH twin —
    md5-derived shingle hashes + the same affine family in signed-64 wrap
    arithmetic + md5 band buckets, all reproducible in DuckDB, so the FULL
    pipeline (signatures, banding, candidate set, exact-Jaccard verify) is
    oracle-verified end-to-end instead of rows-only. Production corpora
    keep x2_minhash_lsh (xxhash64 is faster map-side); candidates differ
    between the two random families but both verify with exact Jaccard."""
    docs = src.load_table(spark, sf_dir, "documents")
    return dd.minhash_lsh_pairs_portable(docs, threshold=0.5)


@register(
    "x2_near_dedup_canonical_portable",
    oracle_vec.minhash_canonical_portable_sql(threshold=0.5),
)
def x2_near_dedup_canonical_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-2 removal policy, hash-checked (NEW r5): drop-smaller-id-partner
    dedup over the PORTABLE pair set, so the removal operator itself — not
    just the pair list — is oracle-verified. Returns surviving doc_ids."""
    docs = src.load_table(spark, sf_dir, "documents")
    return dd.near_dedup_canonical_portable(docs, threshold=0.5).select("doc_id")


@register(
    "x2_cluster_dedup_portable",
    oracle_vec.minhash_cluster_portable_sql(threshold=0.5),
)
def x2_cluster_dedup_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-2f hash-checked (NEW r6, VERDICT r5 item 3): transitive near-dup
    clusters — the SAME connected-components propagation as
    x2_cluster_dedup — over the engine-portable pair graph, which DuckDB
    re-derives and closes with a recursive CTE. Upgrades the transitive-
    clustering class from rows-only to full rows+schema+hash verification;
    production corpora keep the xxhash64 variant."""
    docs = src.load_table(spark, sf_dir, "documents")
    return dd.near_dup_clusters_portable(docs, threshold=0.5)


@register(
    "x2_cluster_dedup_star_portable",
    oracle_vec.minhash_cluster_portable_sql(threshold=0.5),
)
def x2_cluster_dedup_star_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-2f via the ALTERNATING small-star/large-star algorithm (NEW r6):
    the O(log n)-rounds CC variant for deep graphs, over the same portable
    pair graph and against the SAME recursive-CTE oracle as
    x2_cluster_dedup_portable — both algorithms must land on the identical
    min-label fixpoint, so the trickier star rewiring is hash-verified
    end-to-end, not just unit-tested on toy paths."""
    docs = src.load_table(spark, sf_dir, "documents")
    pairs = dd.minhash_lsh_pairs_portable(docs, threshold=0.5)
    comp = dd.connected_components_star(
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")),
        docs.select(F.col("doc_id").alias("id")),
    )
    return comp.select("id", F.col("comp").alias("cluster_id")).withColumnRenamed(
        "id", "doc_id"
    )


_NGRAM_DF_CAP = 50


@register(
    "x2_ngram_jaccard",
    f"""
    WITH docs AS (
      SELECT doc_id, list_distinct(string_split_regex({_NORM.format(c='text')}, '\\s+')) AS w
      FROM documents WHERE doc_id < 100
    ),
    tok AS (SELECT doc_id, unnest(w) AS tok FROM docs),
    -- frequent-token pruning mirror: tokens with document frequency above
    -- the cap never generate candidates (prefix-filtering)
    keep AS (SELECT tok FROM tok GROUP BY tok HAVING COUNT(*) <= {_NGRAM_DF_CAP}),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM tok a
      JOIN keep k ON k.tok = a.tok
      JOIN tok b ON b.tok = a.tok AND a.doc_id < b.doc_id
    ),
    pairs AS (
      SELECT c.doc_a, c.doc_b,
             ROUND(CAST(len(list_intersect(da.w, db.w)) AS DOUBLE) /
                   CAST(len(da.w) + len(db.w) - len(list_intersect(da.w, db.w)) AS DOUBLE), 6) AS jaccard
      FROM cand c
      JOIN docs da ON da.doc_id = c.doc_a
      JOIN docs db ON db.doc_id = c.doc_b
    )
    SELECT doc_a, doc_b, jaccard FROM pairs WHERE jaccard >= 0.8
    """,
)
def x2_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-2b: exact token-set Jaccard similarity join (inverted-index plan
    with frequent-token pruning, cap mirrored in the oracle's HAVING) on a
    bounded subset — the oracle-checkable dedup variant. Candidate count is
    bounded by cap x df per token instead of df² on hot stopwords."""
    docs = src.load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return dd.ngram_jaccard_pairs(docs, threshold=0.8, n=1, max_token_df=_NGRAM_DF_CAP)


@register(
    "x2_near_dedup_canonical", oracle_vec.minhash_fixture_canonical_sql(0.5, 256)
)
def x2_near_dedup_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-2e: near-duplicate REMOVAL — documents surviving the drop-if-a-
    smaller-id-near-dup-exists policy (the practical pre-training dedup).
    Hash-checked since r10 via the minhash fixture (VERDICT r9 item 4):
    the oracle re-derives the verified pair set from the engine's
    persisted signatures and applies the same removal policy in SQL."""
    from tesla_competitive_intelligence_etl_pipeline_spark.plans import fixtures

    fixtures.ensure_minhash_fixture(spark, sf_dir)
    docs = src.load_table(spark, sf_dir, "documents")
    return dd.near_dedup_canonical(
        docs, threshold=0.5, max_bucket_size=256
    ).select("doc_id", "lang", "source")


@register(
    "x2_cross_corpus",
    f"""
    WITH newd AS (
      SELECT doc_id + 1000000 AS doc_id, text || ' zz' AS text
      FROM documents WHERE doc_id < 50
    ),
    oldd AS (SELECT doc_id, text FROM documents WHERE doc_id < 100),
    na AS (SELECT doc_id,
                  list_distinct(string_split_regex({_NORM.format(c='text')}, '\\s+')) AS w
           FROM newd),
    ob AS (SELECT doc_id,
                  list_distinct(string_split_regex({_NORM.format(c='text')}, '\\s+')) AS w
           FROM oldd),
    ta AS (SELECT doc_id, unnest(w) AS tok FROM na),
    tb AS (SELECT doc_id AS match_id, unnest(w) AS tok FROM ob),
    cand AS (SELECT DISTINCT a.doc_id, b.match_id FROM ta a JOIN tb b ON b.tok = a.tok),
    pairs AS (
      SELECT c.doc_id, c.match_id,
             ROUND(CAST(len(list_intersect(x.w, y.w)) AS DOUBLE) /
                   CAST(len(x.w) + len(y.w) - len(list_intersect(x.w, y.w)) AS DOUBLE),
                   6) AS jaccard
      FROM cand c
      JOIN na x ON x.doc_id = c.doc_id
      JOIN ob y ON y.doc_id = c.match_id
    )
    SELECT doc_id, match_id, jaccard FROM pairs WHERE jaccard >= 0.5
    """,
)
def x2_cross_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-2g: EXACT cross-corpus near-dedup (VERDICT r3 item 8) — an incoming
    "crawl" (50 docs, lightly perturbed with an appended token, re-keyed
    +1e6) deduped against the existing corpus (100 docs) via
    dd.cross_corpus_jaccard: shared-token inverted index joined across sides
    only (within-side pairs never materialize), exact-Jaccard verified.
    Every candidate + score is SQL-expressible, so this is the hard-oracle
    twin of the LSH-based x2_cross_corpus_lsh."""
    docs = src.load_table(spark, sf_dir, "documents").select("doc_id", "text")
    old = docs.filter(F.col("doc_id") < 100)
    new = docs.filter(F.col("doc_id") < 50).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zz")).alias("text"),
    )
    return dd.cross_corpus_jaccard(new, old, threshold=0.5)


# One materialized signature table per (session, sf_dir) — the LSH twin of
# the IVF/PQ index caches: shingling+signatures for the EXISTING corpus are
# the offline ingest cost; each crawl increment dedups against the stored
# table (x2_cross_corpus_indexed) without re-processing existing text.
# bench.py builds it in the untimed warmup section.
_SIG_TABLE: dict[str, str] = {}


def _ensure_sig_table(spark: SparkSession, sf_dir: str) -> str:
    if sf_dir not in _SIG_TABLE:
        import tempfile

        path = tempfile.mkdtemp(prefix="lsh_sigs_") + "/signatures"
        old = (
            src.load_table(spark, sf_dir, "documents")
            .select("doc_id", "text")
            .filter(F.col("doc_id") < 100)
        )
        dd.write_signature_table(old, path)
        _SIG_TABLE[sf_dir] = path
    return _SIG_TABLE[sf_dir]


@register("x2_cross_corpus_indexed", oracle_vec.cross_corpus_fixture_sql(0.5, 256))
def x2_cross_corpus_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-2g steady state: the same incoming crawl deduped against the
    MATERIALIZED signature table (_ensure_sig_table, built once per
    session/sf_dir — the ingest-time cost, like the IVF/PQ indexes). The
    timed query shingles ONLY the increment and band-joins it against stored
    signatures; the existing corpus's text is never re-read. Must return
    exactly what x2_cross_corpus_lsh returns (pinned in tests/test_ext.py).
    Hash-checked since r10 against the SAME crosslsh-fixture oracle as the
    unindexed twin — the stored table holds byte-identical (sh, sig) values
    (deterministic expressions), so indexed == unindexed == oracle."""
    from tesla_competitive_intelligence_etl_pipeline_spark.plans import fixtures

    fixtures.ensure_crosslsh_fixture(spark, sf_dir)
    sig_path = _ensure_sig_table(spark, sf_dir)
    docs = src.load_table(spark, sf_dir, "documents").select("doc_id", "text")
    new = docs.filter(F.col("doc_id") < 50).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zz")).alias("text"),
    )
    return dd.cross_corpus_neardup_indexed(
        new, spark, sig_path, threshold=0.5, max_bucket_size=256
    )


_SIG_TABLE_PORTABLE: dict[str, str] = {}


def _ensure_sig_table_portable(spark: SparkSession, sf_dir: str) -> str:
    if sf_dir not in _SIG_TABLE_PORTABLE:
        import tempfile

        path = tempfile.mkdtemp(prefix="lsh_sigs_md5_") + "/signatures"
        old = (
            src.load_table(spark, sf_dir, "documents")
            .select("doc_id", "text")
            .filter(F.col("doc_id") < 100)
        )
        dd.write_signature_table_portable(old, path)
        _SIG_TABLE_PORTABLE[sf_dir] = path
    return _SIG_TABLE_PORTABLE[sf_dir]


@register(
    "x2_cross_corpus_indexed_portable",
    oracle_vec.cross_corpus_indexed_portable_sql(threshold=0.5),
)
def x2_cross_corpus_indexed_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-2g hash-checked (NEW r6): the SAME incremental crawl-dedup path as
    x2_cross_corpus_indexed — materialized signature table, increment-only
    shingling, cross-side banding, exact-Jaccard verify — over the
    engine-portable md5 family, so DuckDB re-derives the stored table, the
    increment, and the full pair list. This puts the steady-state ingestion
    dedup (the most production-critical rows-only class) inside the
    rows+schema+hash gate; production keeps the xxhash64 twin. The _params
    sidecar's hash-family field makes cross-family querying (zero recall)
    a loud error instead of a silent one."""
    sig_path = _ensure_sig_table_portable(spark, sf_dir)
    docs = src.load_table(spark, sf_dir, "documents").select("doc_id", "text")
    new = docs.filter(F.col("doc_id") < 50).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zz")).alias("text"),
    )
    return dd.cross_corpus_neardup_indexed_portable(
        new, spark, sig_path, threshold=0.5
    )


# Takedown twin of the portable signature table (r9): a COPY of the session
# table with tombstones for doc_id % 7 == 2 — the offline half of
# x2_sig_takedown, mirroring registry_corpus._ensure_takedown_index.
_SIG_TABLE_TAKEDOWN: dict[str, str] = {}


def _ensure_sig_table_takedown(spark: SparkSession, sf_dir: str) -> str:
    if sf_dir not in _SIG_TABLE_TAKEDOWN:
        import shutil
        import tempfile

        src_path = _ensure_sig_table_portable(spark, sf_dir)
        path = tempfile.mkdtemp(prefix="lsh_sigs_takedown_") + "/signatures"
        shutil.copytree(src_path, path)
        gone = (
            src.load_table(spark, sf_dir, "documents")
            .filter((F.col("doc_id") < 100) & (F.col("doc_id") % 7 == 2))
            .select("doc_id")
        )
        dd.delete_signature_entries(spark, path, gone)
        _SIG_TABLE_TAKEDOWN[sf_dir] = path
    return _SIG_TABLE_TAKEDOWN[sf_dir]


@register(
    "x2_sig_takedown",
    oracle_vec.cross_corpus_indexed_portable_sql(
        threshold=0.5, exclude_pred="doc_id % 7 = 2"
    ),
)
def x2_sig_takedown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-2 takedown (r9 — VERDICT r8 item 1): the incremental crawl dedup
    AFTER a signature-table tombstone delete (delete_signature_entries,
    doc_id % 7 == 2) — erased documents must never again match a crawl
    increment, without rebuilding the table: one committed tombstone table
    under _tombstones/, one broadcast anti-join ahead of banding. The
    result EQUALS a signature table rebuilt from the survivors (pinned in
    tests/test_ext.py, the x3_index_takedown precedent); the oracle
    re-derives the crawl dedup with the tombstoned docs excluded from the
    stored side. The corpus-side composition — delete_from_merge_table →
    read_commit_changes delete records → this takedown — is pinned in
    tests/test_ext.py. Offline copy + delete in _ensure_sig_table_takedown
    (warmed by bench.py); the timed query is the online crawl dedup."""
    sig_path = _ensure_sig_table_takedown(spark, sf_dir)
    docs = src.load_table(spark, sf_dir, "documents").select("doc_id", "text")
    new = docs.filter(F.col("doc_id") < 50).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zz")).alias("text"),
    )
    return dd.cross_corpus_neardup_indexed_portable(
        new, spark, sig_path, threshold=0.5
    )


# Physical-purge twin (r9): the takedown table after
# compact_signature_table(purge_tombstones=True) — tombstoned rows OFF
# DISK, tombstones cleared. Same oracle as x2_sig_takedown: purge must
# not change a single answer.
_SIG_TABLE_PURGED: dict[str, str] = {}


def _ensure_sig_table_purged(spark: SparkSession, sf_dir: str) -> str:
    if sf_dir not in _SIG_TABLE_PURGED:
        import shutil
        import tempfile

        src_path = _ensure_sig_table_takedown(spark, sf_dir)
        path = tempfile.mkdtemp(prefix="lsh_sigs_purged_") + "/signatures"
        shutil.copytree(src_path, path)
        dd.compact_signature_table(spark, path, purge_tombstones=True)
        _SIG_TABLE_PURGED[sf_dir] = path
    return _SIG_TABLE_PURGED[sf_dir]


@register(
    "x2_sig_purge",
    oracle_vec.cross_corpus_indexed_portable_sql(
        threshold=0.5, exclude_pred="doc_id % 7 = 2"
    ),
)
def x2_sig_purge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-2 physical erasure (r9): the crawl dedup AFTER
    compact_signature_table(purge_tombstones=True) rewrote the takedown
    table — tombstoned docs' rows are physically off disk, _tombstones/
    is cleared (the read plan is back to the bare scan, no anti-join),
    and every answer is pinned identical to the logical-takedown twin
    (x2_sig_takedown) and to the survivor-excluding oracle. Completes
    the GDPR story: logical takedown is O(batch) at delete time,
    physical purge is one stored-rows rewrite at OPTIMIZE time — the
    text is never re-shingled. Offline copy + purge in
    _ensure_sig_table_purged (warmed by bench.py)."""
    sig_path = _ensure_sig_table_purged(spark, sf_dir)
    docs = src.load_table(spark, sf_dir, "documents").select("doc_id", "text")
    new = docs.filter(F.col("doc_id") < 50).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zz")).alias("text"),
    )
    return dd.cross_corpus_neardup_indexed_portable(
        new, spark, sig_path, threshold=0.5
    )


# One-call takedown orchestration (r10 — VERDICT r9 item 3): the operator a
# deployment actually schedules. The PRISTINE corpus gold table + signature
# table are warmed once per session; each run clones them (takedown mutates)
# and times the full request path — corpus DELETE, commit-log CDC read,
# tombstone fan-out — then answers the crawl query from the taken-down
# signature table, oracle-checked against the survivor-excluding SQL.
_TAKEDOWN_E2E_PRISTINE: dict[str, str] = {}


def _ensure_takedown_e2e_pristine(spark: SparkSession, sf_dir: str) -> str:
    if sf_dir not in _TAKEDOWN_E2E_PRISTINE:
        import shutil
        import tempfile

        from tesla_competitive_intelligence_etl_pipeline_spark.streaming import events as strm

        root = tempfile.mkdtemp(prefix="takedown_e2e_")
        docs = (
            src.load_table(spark, sf_dir, "documents")
            .select("doc_id", "text")
            .filter(F.col("doc_id") < 100)
        )
        strm.merge_table(
            docs, root + "/corpus", keys=["doc_id"], order_cols=["doc_id"]
        )
        shutil.copytree(
            _ensure_sig_table_portable(spark, sf_dir), root + "/signatures"
        )
        _TAKEDOWN_E2E_PRISTINE[sf_dir] = root
    return _TAKEDOWN_E2E_PRISTINE[sf_dir]


@register(
    "x_takedown_e2e",
    oracle_vec.cross_corpus_indexed_portable_sql(
        threshold=0.5, exclude_pred="doc_id % 7 = 2"
    ),
)
def x_takedown_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-2/X-9 composition (r10): ONE takedown() call — corpus DELETE via
    the merge table's commit protocol, delete records read back from the
    commit log it captured, tombstones fanned out to the signature table —
    then the crawl-dedup answer from the taken-down store, hash-checked
    against the survivor-excluding oracle (the same proof x2_sig_takedown
    gives the store-level half). The timed path INCLUDES cloning the
    warmed pristine stores (takedown mutates; the clone is request-setup
    a re-runnable bench honestly pays) and the request-sized orchestration
    overhead: durable request record, ephemeral snapshot pin, commit-id
    stamp, record cleanup (operators/takedown.py — ADVICE r9 closures).
    Crash recovery is pinned in tests/test_ext.py's crash sweep."""
    import shutil
    import tempfile

    from tesla_competitive_intelligence_etl_pipeline_spark.operators import takedown as td

    root = _ensure_takedown_e2e_pristine(spark, sf_dir)
    work = tempfile.mkdtemp(prefix="takedown_run_")
    shutil.copytree(root + "/corpus", work + "/corpus")
    shutil.copytree(root + "/signatures", work + "/signatures")
    docs = src.load_table(spark, sf_dir, "documents").select("doc_id", "text")
    doomed = docs.filter(
        (F.col("doc_id") < 100) & (F.col("doc_id") % 7 == 2)
    ).select("doc_id")
    td.takedown(
        spark,
        work + "/corpus",
        keys=doomed,
        signature_tables=(work + "/signatures",),
    )
    new = docs.filter(F.col("doc_id") < 50).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zz")).alias("text"),
    )
    return dd.cross_corpus_neardup_indexed_portable(
        new, spark, work + "/signatures", threshold=0.5
    )


@register(
    "x_takedown_registry",
    oracle_vec.cross_corpus_indexed_portable_sql(
        threshold=0.5, exclude_pred="doc_id % 7 = 2"
    ),
)
def x_takedown_registry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-2/X-9 registry-driven erasure (r12 — VERDICT r11 item 1): the
    signature table is recorded under the corpus with register_store, the
    takedown() call names NO stores — the persisted registry
    (<corpus>/_stores.json) supplies the fan-out — and the crawl-dedup
    answer from the taken-down store hash-checks against the same
    survivor-excluding oracle as x_takedown_e2e. Proves the
    single-source-of-truth path end to end: a store registered once can
    never be forgotten by a later erasure call (the forgotten-store
    fail-loudly half is pinned in tests/test_ext.py)."""
    import shutil
    import tempfile

    from tesla_competitive_intelligence_etl_pipeline_spark.operators import takedown as td

    root = _ensure_takedown_e2e_pristine(spark, sf_dir)
    work = tempfile.mkdtemp(prefix="takedown_reg_")
    shutil.copytree(root + "/corpus", work + "/corpus")
    shutil.copytree(root + "/signatures", work + "/signatures")
    td.register_store(work + "/corpus", work + "/signatures", "signature")
    docs = src.load_table(spark, sf_dir, "documents").select("doc_id", "text")
    doomed = docs.filter(
        (F.col("doc_id") < 100) & (F.col("doc_id") % 7 == 2)
    ).select("doc_id")
    td.takedown(spark, work + "/corpus", keys=doomed)
    new = docs.filter(F.col("doc_id") < 50).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zz")).alias("text"),
    )
    return dd.cross_corpus_neardup_indexed_portable(
        new, spark, work + "/signatures", threshold=0.5
    )


# Build-time auto-registration (r13 — VERDICT r12 item 3): the pristine pair
# is built with write_signature_table_portable(corpus=...) — the BUILDER
# registers the store; nobody calls register_store. Warmed once per session.
_AUTOREG_PRISTINE: dict[str, str] = {}


def _ensure_autoreg_pristine(spark: SparkSession, sf_dir: str) -> str:
    if sf_dir not in _AUTOREG_PRISTINE:
        import tempfile

        from tesla_competitive_intelligence_etl_pipeline_spark.streaming import events as strm

        root = tempfile.mkdtemp(prefix="takedown_autoreg_")
        docs = (
            src.load_table(spark, sf_dir, "documents")
            .select("doc_id", "text")
            .filter(F.col("doc_id") < 100)
        )
        strm.merge_table(
            docs, root + "/corpus", keys=["doc_id"], order_cols=["doc_id"]
        )
        dd.write_signature_table_portable(
            docs, root + "/signatures", corpus=root + "/corpus"
        )
        _AUTOREG_PRISTINE[sf_dir] = root
    return _AUTOREG_PRISTINE[sf_dir]


@register(
    "x_store_autoregister",
    oracle_vec.cross_corpus_indexed_portable_sql(
        threshold=0.5, exclude_pred="doc_id % 7 = 2"
    ),
)
def x_store_autoregister(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-2/X-9 IMPLICIT-registration erasure (r13 — VERDICT r12 item 3):
    the signature table is registered by its own BUILDER
    (write_signature_table_portable(corpus=...)); no register_store call
    appears anywhere in this entry. The corpus+store pair is then CLONED
    to a new directory (the clone-before-takedown pattern) before the
    no-args takedown — because co-located stores are recorded
    corpus-RELATIVE in <corpus>/_stores.json (ADVICE r12), the cloned
    registry resolves to the CLONE's signature table, so the erasure hits
    the clone's store, never the pristine original's. The crawl-dedup
    answer from the taken-down clone hash-checks against the same
    survivor-excluding oracle as x_takedown_registry. Closes the pre-r13
    hole where an index built without a manual register_store call
    silently escaped no-args takedown/verify."""
    import shutil
    import tempfile

    from tesla_competitive_intelligence_etl_pipeline_spark.operators import takedown as td

    root = _ensure_autoreg_pristine(spark, sf_dir)
    work = tempfile.mkdtemp(prefix="takedown_autoreg_run_")
    shutil.copytree(root + "/corpus", work + "/corpus")
    shutil.copytree(root + "/signatures", work + "/signatures")
    docs = src.load_table(spark, sf_dir, "documents").select("doc_id", "text")
    doomed = docs.filter(
        (F.col("doc_id") < 100) & (F.col("doc_id") % 7 == 2)
    ).select("doc_id")
    td.takedown(spark, work + "/corpus", keys=doomed)
    new = docs.filter(F.col("doc_id") < 50).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zz")).alias("text"),
    )
    return dd.cross_corpus_neardup_indexed_portable(
        new, spark, work + "/signatures", threshold=0.5
    )


@register("x2_cross_corpus_lsh", oracle_vec.cross_corpus_fixture_sql(0.5, 256))
def x2_cross_corpus_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-2g at scale: the same cross-corpus dedup through MinHash-LSH
    (dd.cross_corpus_neardup) — tagged union, band join filtered to
    cross-side pairs only, exact-Jaccard verify on candidates. Planted
    cross-corpus dups pinned in tests/test_ext.py. Hash-checked since r10
    (previously rows-only) via the crosslsh fixture: the oracle re-derives
    the combined-population cap, the cross-side-only candidate join, and
    exact Jaccard from the engine's persisted xxhash64 values (VERDICT r9
    item 4)."""
    from tesla_competitive_intelligence_etl_pipeline_spark.plans import fixtures

    fixtures.ensure_crosslsh_fixture(spark, sf_dir)
    docs = src.load_table(spark, sf_dir, "documents").select("doc_id", "text")
    old = docs.filter(F.col("doc_id") < 100)
    new = docs.filter(F.col("doc_id") < 50).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zz")).alias("text"),
    )
    return dd.cross_corpus_neardup(new, old, threshold=0.5, max_bucket_size=256)


@register(
    "x2_cross_corpus_lsh_portable",
    oracle_vec.cross_corpus_lsh_portable_sql(threshold=0.5),
)
def x2_cross_corpus_lsh_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-2g hash-checked, UNINDEXED (VERDICT r6 item 7): the same one-shot
    cross-corpus LSH dedup as x2_cross_corpus_lsh — tagged union, cross-side
    band join, exact-Jaccard verify — over the engine-portable md5 family,
    so DuckDB re-derives the full pair list. This gives the unindexed
    crawl-vs-corpus path its own end-to-end rows+schema+hash gate (its
    xxhash64 twin stays rows-only; the indexed steady-state path got its
    gate in r6). Same sources as the twin: existing = doc_id < 100,
    increment = first 50 docs re-crawled with shifted ids + ' zz'."""
    docs = src.load_table(spark, sf_dir, "documents").select("doc_id", "text")
    old = docs.filter(F.col("doc_id") < 100)
    new = docs.filter(F.col("doc_id") < 50).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zz")).alias("text"),
    )
    return dd.cross_corpus_neardup_portable(new, old, threshold=0.5)


@register("x2_simhash", oracle_vec.simhash_fixture_sql(max_hamming=8))
def x2_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-2c: SimHash(64-bit) near-dup pairs, hamming <= 8, band-pruned.
    Hash-checked since r10 (previously rows-only): the engine persists its
    xxhash64-derived signatures AND 16-bit band chunks (candidate recall
    above hamming 3 depends on the exact chunk values) as a fixture; the
    oracle re-derives candidates and bit_count(xor) hamming in SQL from
    them (VERDICT r9 item 4)."""
    from tesla_competitive_intelligence_etl_pipeline_spark.plans import fixtures

    fixtures.ensure_simhash_fixture(spark, sf_dir)
    docs = src.load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return dd.simhash_pairs(docs, max_hamming=8)


@register("x2_simhash_portable", oracle_vec.simhash_portable_sql(max_hamming=8))
def x2_simhash_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-2c (hash-checked, NEW r5): the engine-portable SimHash twin —
    60-bit signatures over md5-derived token hashes, so signatures,
    banding, candidates, and hamming distances are all re-derived in DuckDB
    (plans/oracle_vec.py) instead of rows-only. Production keeps
    x2_simhash's xxhash64 path for speed."""
    docs = src.load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return dd.simhash_pairs_portable(docs, max_hamming=8)


# ===========================================================================
# X-3: similarity search
# ===========================================================================


@register(
    "x3_cosine_topk",
    f"""
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
    scored AS (
      SELECT e.vec_id, {_ducksql_cosine('e.embedding', 'q.qv')} AS cos_sim
      FROM embeddings e, q
    )
    SELECT vec_id, cos_sim FROM scored WHERE vec_id <> 0
    ORDER BY cos_sim DESC, vec_id LIMIT 10
    """,
)
def x3_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-3: brute-force exact cosine top-k neighbors of vec_id=0 (correctness
    baseline for the ANN variants)."""
    emb = src.load_table(spark, sf_dir, "embeddings")
    return sim.topk_neighbors_of(emb, query_id=0, k=10)


@register("x2_semantic_dedup", oracle_vec.semantic_dedup_sql(k=8, iters=5, threshold=0.4))
def x2_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-2e: SemDeDup (Abbas et al., arXiv:2303.09540) — embedding-space
    near-dup removal with the quadratic cosine work confined to k-means
    clusters (operators/dedup.semantic_dedup). Hash-checked oracle: DuckDB
    re-derives clusters (unrolled Lloyd, plans/oracle_vec.py) and the
    within-cluster drop set; the keep/drop compare uses ROUND(cos, 6) so
    the boundary cannot flip on cross-engine ulp noise. Returns surviving
    vec_ids."""
    emb = src.load_table(spark, sf_dir, "embeddings")
    return dd.semantic_dedup(emb, k=8, threshold=0.4, max_iters=5).select("vec_id")


@register("x3_lsh_ann", oracle_vec.lsh_ann_sql(n_planes=6, dim=64))
def x3_lsh_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-3b: random-hyperplane LSH bucketed ANN (scale path). Hash-checked
    oracle (VERDICT r4 item 2): the hyperplanes come from a deterministic
    pure-Python LCG, so the oracle bakes the SAME planes as double literals
    and re-derives buckets + candidates + exact re-rank in SQL
    (plans/oracle_vec.py)."""
    emb = src.load_table(spark, sf_dir, "embeddings")
    return sim.lsh_topk(emb, query_id=0, k=10, n_planes=6)


@register("x3_ivf", oracle_vec.ivf_topk_sql(n_probe=2))
def x3_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-3c: IVF-style coarse-quantized search (label column = cell; probe 2
    nearest centroids, exact re-rank inside). Hash-checked oracle (VERDICT
    r4 item 2): centroids are exact decimal(38,12) per-dimension means —
    partition-order independent, so DuckDB reproduces them bit-for-bit and
    re-runs the probe + re-rank (plans/oracle_vec.py)."""
    emb = src.load_table(spark, sf_dir, "embeddings")
    return sim.ivf_topk(emb, query_id=0, k=10, n_probe=2)


# ===========================================================================
# X-4: multimodal columns
# ===========================================================================


@register(
    "x4_multimodal_meta",
    """
    SELECT doc_id, 'text' AS modality, octet_length(encode(text)) AS n_bytes
    FROM documents
    """,
)
def x4_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-4: binary payload column + typed metadata (byte length) — the
    schema/partitioning plumbing for opaque image/audio/video blobs."""
    docs = src.load_table(spark, sf_dir, "documents")
    return mm.attach_binary_payload(docs).select("doc_id", "modality", "n_bytes")


@register(
    "x4_frame_sample",
    """
    WITH m AS (
      SELECT doc_id, 'text' AS modality, hex(encode(text)) AS h,
             octet_length(encode(text)) AS n_bytes
      FROM documents WHERE doc_id < 300
    ),
    f AS (
      SELECT doc_id, modality, i AS frame_ix,
             substring(h, CAST(i * 512 + 1 AS BIGINT), 512) AS fh
      FROM m,
           unnest(range(0, least(CAST(floor((n_bytes + 255) / 256) AS BIGINT), 4)))
             AS r(i)
      WHERE n_bytes > 0
    )
    SELECT doc_id, modality, CAST(frame_ix AS BIGINT) AS frame_ix,
           CAST(length(fh) / 2 AS BIGINT) AS frame_n_bytes,
           md5(fh) AS frame_md5
    FROM f
    """,
)
def x4_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-4c: frame sampling over binary payloads
    (operators/multimodal.sample_frames) on a bounded subset — up to 4
    leading 256-byte frames per asset, each with typed metadata and a
    byte-exact checksum. The fan-out is pure sequence+explode (no shuffle);
    the oracle reproduces every frame's bytes via hex-window md5."""
    docs = src.load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    return mm.sample_frames(mm.attach_binary_payload(docs), frame_bytes=256, max_frames=4)


@register(
    "x4_feature_extract",
    """
    SELECT doc_id, 'text' AS modality,
           octet_length(encode(text)) AS n_bytes,
           md5(text) AS payload_md5,
           CAST(8 AS BIGINT) AS feat_width,
           octet_length(encode(text)) > 0 AS feat_normalized
    FROM documents
    """,
)
def x4_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-4b: Arrow-batched mapInPandas feature extraction over binary
    payloads (decode stubbed — no codec libs in container; plumbing real).

    Oracle strategy (VERDICT r2 item 1): the udf emits scalar features a SQL
    engine can recompute — ``payload_md5`` is hashed IN PYTHON from the
    decoded bytes, so a DuckDB md5() match proves every payload byte survived
    the Arrow round-trip; ``feat_width`` pins the declared feature dimension;
    ``feat_normalized`` pins the L1-normalization invariant (sum(features)=1
    for any nonempty payload). The `features array<double>` column itself is
    value-checked in tests/test_ext.py against hand-computed vectors."""
    docs = src.load_table(spark, sf_dir, "documents")
    feats = mm.extract_features(mm.attach_binary_payload(docs))
    return feats.select(
        "doc_id",
        "modality",
        "n_bytes",
        "payload_md5",
        F.size("features").cast("bigint").alias("feat_width"),
        (
            F.abs(
                F.aggregate(F.col("features"), F.lit(0.0), lambda acc, x: acc + x)
                - F.lit(1.0)
            )
            < F.lit(1e-4)
        ).alias("feat_normalized"),
    )


# ===========================================================================
# X-5: text analysis
# ===========================================================================

_LANG_BRANCH = """
      SELECT doc_id, lang AS lang_tag,
             len(regexp_extract_all(lower(text), '\\b({words})\\b')) AS s,
             '{lang}' AS l
      FROM documents
"""


def _lang_id_sql() -> str:
    branches = " UNION ALL ".join(
        _LANG_BRANCH.format(words="|".join(w), lang=lang)
        for lang, w in sorted(tx.LANG_MARKERS.items())
    )
    return f"""
    WITH scores AS ({branches}),
    ranked AS (
      SELECT doc_id, lang_tag, s, l,
             ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY s DESC, l DESC) AS rn
      FROM scores
    )
    SELECT doc_id, lang_tag,
           CASE WHEN s > 0 THEN l ELSE 'unknown' END AS predicted_lang
    FROM ranked WHERE rn = 1
    """


@register("x5_lang_id", _lang_id_sql())
def x5_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-5a: heuristic stopword-profile language ID (argmax over per-language
    marker hit counts; deterministic tie-break)."""
    docs = src.load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.col("lang").alias("lang_tag"),
        tx.predicted_lang(F.col("text")).alias("predicted_lang"),
    )


@register(
    "x5_quality_score",
    """
    WITH f AS (
      SELECT doc_id,
             length(text) AS n_chars,
             len(string_split_regex(text, '\\s+')) AS n_tokens,
             len(list_distinct(string_split_regex(text, '\\s+'))) AS n_uniq,
             len(regexp_extract_all(text, '[^\\w\\s]')) AS n_punct,
             len(regexp_extract_all(text, '[0-9]')) AS n_digit
      FROM documents
    )
    SELECT doc_id, n_chars, n_tokens,
           CAST(n_uniq AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS uniq_token_ratio,
           ROUND((least(CAST(n_tokens AS DOUBLE) / 20.0, 1.0)
                  + CAST(n_uniq AS DOUBLE) / CAST(n_tokens AS DOUBLE)
                  + (1.0 - least(CAST(n_punct AS DOUBLE) / CAST(n_chars AS DOUBLE)
                                 + CAST(n_digit AS DOUBLE) / CAST(n_chars AS DOUBLE), 1.0)))
                 / 3.0, 6) AS quality
    FROM f
    """,
)
def x5_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-5b: quality scoring from length/diversity/cleanliness features."""
    # r13: regex-heavy per-row features — spread across cores (guide §2.5)
    docs = src.spread(src.load_table(spark, sf_dir, "documents"), "doc_id")
    feats = tx.quality_features(F.col("text"))
    return docs.select(
        "doc_id",
        feats["n_chars"].cast("long").alias("n_chars"),
        feats["n_tokens"].cast("long").alias("n_tokens"),
        feats["uniq_token_ratio"].alias("uniq_token_ratio"),
        tx.quality_score(F.col("text")).alias("quality"),
    )


@register(
    "x5_token_counts",
    """
    SELECT doc_id,
           len(string_split_regex(text, '\\s+')) AS ws_tokens,
           len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS bpe_tokens
    FROM documents
    """,
)
def x5_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-5c: whitespace + BPE-ish pre-tokenizer token counting."""
    docs = src.load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        tx.token_count(F.col("text")).cast("long").alias("ws_tokens"),
        tx.bpe_ish_token_count(F.col("text")).cast("long").alias("bpe_tokens"),
    )


@register(
    "x5_fingerprint",
    f"SELECT doc_id, md5({_NORM.format(c='text')}) AS fp FROM documents",
)
def x5_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-5d: document fingerprint = md5 over canonicalized text."""
    docs = src.load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", tx.fingerprint_md5(F.col("text")).alias("fp"))


# ===========================================================================
# X-6: approx + exact distinct/quantiles
# ===========================================================================


@register(
    "x6_approx_distinct",
    """
    SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
           TRUE AS parts_in_bound,
           ROUND(quantile_cont(l_quantity, 0.5), 6) AS qty_p50,
           TRUE AS p50_in_bound,
           ROUND(quantile_cont(l_quantity, 0.9), 6) AS qty_p90,
           TRUE AS p90_in_bound
    FROM lineitem
    """,
)
def x6_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-6: approx_count_distinct (HLL++) + percentile_approx (KLL-style) —
    the 100 TB path where exact distinct is a full shuffle.

    Hash-checked via an INVARIANT-BOUND oracle (VERDICT r5 item 4): the raw
    sketch estimates are engine-specific (DuckDB cannot reproduce them), but
    the accuracy CLAIM is deterministic — the entry emits the exact values
    plus booleans `|approx − exact| within bound`, and the oracle recomputes
    the exact side and asserts TRUE. An approx result drifting out of bound
    flips a boolean and fails the hash gate. Bounds: 0.05 relative for the
    rsd=0.02 HLL (2.5 sigma); ±1.0 absolute for the accuracy-10000
    percentile sketches (rank error <= n/10000 rows on an integer-valued
    quantity). Raw estimate magnitudes stay covered by the error-bound
    tests in tests/test_ext.py.

    PLAN SHAPE (VERDICT r6 item 1): the sketch side and the exact side run
    as SEPARATE 1-row aggregations cross-joined at the end. Putting
    count_distinct into the same agg() as the sketches forces Spark's
    Expand-based distinct plan and the sketch aggregates then process the
    expanded (N x groups) input — measured 15.35 s combined vs
    0.66 s + 1.02 s split at sf 0.1. The cross join is 1 row x 1 row."""
    # r13: spread — both 1-row aggregations'"'"' partial phases run wide (§2.5)
    li = src.spread(src.load_table(spark, sf_dir, "lineitem"), "l_partkey")
    sketches = li.agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("a_parts"),
        F.percentile_approx("l_quantity", 0.5, 10000).alias("a_p50"),
        F.percentile_approx("l_quantity", 0.9, 10000).alias("a_p90"),
    )
    exact = li.agg(
        F.count_distinct("l_partkey").alias("n_parts"),
        F.round(F.percentile("l_quantity", F.lit(0.5)), 6).alias("qty_p50"),
        F.round(F.percentile("l_quantity", F.lit(0.9)), 6).alias("qty_p90"),
    )
    agg = sketches.crossJoin(exact)
    return agg.select(
        "n_parts",
        (
            F.abs(F.col("a_parts") - F.col("n_parts")) / F.col("n_parts") <= 0.05
        ).alias("parts_in_bound"),
        "qty_p50",
        (F.abs(F.col("a_p50") - F.col("qty_p50")) <= 1.0).alias("p50_in_bound"),
        "qty_p90",
        (F.abs(F.col("a_p90") - F.col("qty_p90")) <= 1.0).alias("p90_in_bound"),
    )


@register(
    "x6_exact_distinct_quantiles",
    """
    SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
           ROUND(quantile_cont(l_quantity, 0.5), 6) AS qty_p50,
           ROUND(quantile_cont(l_quantity, 0.9), 6) AS qty_p90
    FROM lineitem
    """,
)
def x6_exact_distinct_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-6b: exact twins of the sketches (count distinct + interpolated
    percentiles)."""
    # r13: spread — the partial distinct/percentile phases run wide (§2.5)
    li = src.spread(src.load_table(spark, sf_dir, "lineitem"), "l_partkey")
    return li.agg(
        F.count_distinct("l_partkey").alias("n_parts"),
        F.round(F.percentile("l_quantity", F.lit(0.5)), 6).alias("qty_p50"),
        F.round(F.percentile("l_quantity", F.lit(0.9)), 6).alias("qty_p90"),
    )


@register(
    "x6_sketch_rollup",
    """
    WITH per_day AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users
      FROM events GROUP BY 1
    )
    SELECT 'day' AS scope, day, exact_users, TRUE AS est_in_bound
    FROM per_day
    UNION ALL
    SELECT 'total' AS scope, CAST(NULL AS DATE) AS day,
           (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) FROM events),
           TRUE AS est_in_bound
    ORDER BY scope, day
    """,
)
def x6_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-6c: MERGEABLE sketch state — the incremental-rollup pattern for
    distinct counts at 100 TB. Per-day HLL sketches of user_id
    (hll_sketch_agg: what a daily ingest job would materialize next to its
    partition) are merged upward with hll_union_agg to answer the
    whole-range distinct WITHOUT re-scanning events — re-aggregation cost is
    #days sketch rows, not data.

    Hash-checked via an INVARIANT-BOUND oracle (VERDICT r5 item 4, same
    scheme as x6_approx_distinct): Datasketches estimates are
    engine-specific, so each row carries the DuckDB-recomputable exact
    distinct plus the deterministic boolean `|estimate − exact| / exact
    <= 0.1` (default lgConfigK=12 gives rsd ~1.6%; 0.1 is ~6 sigma — a
    broken merge path, not noise, is what would trip it). The TOTAL row's
    boolean rides on the hll_union_agg MERGE of the per-day sketches, so
    merge correctness is inside the gate; exact associativity/error-bound
    tests stay in tests/test_ext.py."""
    ev = src.load_events(spark, sf_dir)
    daily = (
        ev.groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.hll_sketch_agg("user_id").alias("sk"),
            F.count_distinct("user_id").alias("exact_users"),
        )
        # sketches feed both the per-day rows and the merge; an eager
        # localCheckpoint (vs persist, ADVICE r4) materializes the #days-row
        # sketch table once and its blocks are released by the ContextCleaner
        # when the returned plan is dropped — no cache leak across the
        # oracle's repeated executions / the bench sweep
        .localCheckpoint(eager=True)
    )

    def in_bound(est, exact):
        return (
            F.abs(est.cast("double") - exact) / exact <= 0.1
        ).alias("est_in_bound")

    per_day = daily.select(
        F.lit("day").alias("scope"),
        "day",
        "exact_users",
        in_bound(F.hll_sketch_estimate("sk"), F.col("exact_users")),
    )
    total = daily.agg(
        F.hll_union_agg("sk").alias("sk_all"),
    ).crossJoin(
        ev.agg(F.count_distinct("user_id").alias("exact_users"))
    ).select(
        F.lit("total").alias("scope"),
        F.lit(None).cast("date").alias("day"),
        "exact_users",
        in_bound(F.hll_sketch_estimate("sk_all"), F.col("exact_users")),
    )
    return per_day.unionByName(total).orderBy(F.col("scope"), F.col("day"))


# ===========================================================================
# X-7: rollup / cube / grouping sets
# ===========================================================================


@register(
    "x7_rollup",
    f"""
    SELECT r.r_name, n.n_name, COUNT(*) AS cnt, {_dsum('c.c_acctbal', 2)} AS bal,
           CAST(GROUPING(r.r_name, n.n_name) AS BIGINT) AS gid
    FROM customer c
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    GROUP BY ROLLUP(r.r_name, n.n_name)
    """,
)
def x7_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-7a: hierarchical rollup region -> nation -> grand total."""
    c = src.load_table(spark, sf_dir, "customer")
    n = src.load_table(spark, sf_dir, "nation")
    r = src.load_table(spark, sf_dir, "region")
    joined = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    return joined.rollup("r_name", "n_name").agg(
        F.count("*").alias("cnt"),
        agg.exact_sum(F.col("c_acctbal"), scale=2).alias("bal"),
        F.grouping_id().alias("gid"),
    )


@register(
    "x7_cube",
    f"""
    SELECT c.c_mktsegment, o.o_orderstatus, COUNT(*) AS cnt,
           {_dsum('o.o_totalprice', 2)} AS total,
           CAST(GROUPING(c.c_mktsegment, o.o_orderstatus) AS BIGINT) AS gid
    FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    GROUP BY CUBE(c.c_mktsegment, o.o_orderstatus)
    """,
)
def x7_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-7b: full cube over two dimensions."""
    # r13: spread the fact side — the dim broadcast-join probe and the
    # cube's partial aggregation then run across cores (guide §2.5)
    o = src.spread(src.load_table(spark, sf_dir, "orders"), "o_orderkey")
    c = src.load_table(spark, sf_dir, "customer")
    joined = o.join(c, c.c_custkey == o.o_custkey)
    return joined.cube("c_mktsegment", "o_orderstatus").agg(
        F.count("*").alias("cnt"),
        agg.exact_sum(F.col("o_totalprice"), scale=2).alias("total"),
        F.grouping_id().alias("gid"),
    )


@register(
    "x7_grouping_sets",
    f"""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt, {_dsum('l_quantity', 2)} AS qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def x7_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-7c: explicit grouping sets via Spark SQL."""
    # r13: spread the expand+partial-agg input across cores (guide §2.5)
    li = src.spread(src.load_table(spark, sf_dir, "lineitem"), "l_orderkey")
    li.createOrReplaceTempView("__gs_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
               CAST(SUM(CAST(l_quantity AS DECIMAL(38,2))) AS DOUBLE) AS qty
        FROM __gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


# ===========================================================================
# X-8: window analytics
# ===========================================================================


@register(
    "x8_window_lag",
    """
    SELECT o_custkey, o_orderkey, o_totalprice,
           lag(o_totalprice) OVER w AS prev_total,
           o_totalprice - lag(o_totalprice) OVER w AS delta
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE), o_orderkey)
    """,
)
def x8_window_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-8a: QoQ-style deltas — lag over event order per key (the natural
    extension of LIM-1, SURVEY §2.9)."""
    # r13: spread keyed on the window partition key — exchange reused
    o = src.spread(src.load_table(spark, sf_dir, "orders"), "o_custkey")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_orderdate").cast("date"), "o_orderkey")
    prev = F.lag("o_totalprice").over(w)
    return o.select(
        "o_custkey", "o_orderkey", "o_totalprice",
        prev.alias("prev_total"),
        (F.col("o_totalprice") - prev).alias("delta"),
    )


@register(
    "x8_window_rank",
    """
    SELECT o_orderstatus, o_orderkey,
           rank() OVER w AS rnk,
           dense_rank() OVER w AS drnk,
           ntile(4) OVER w AS quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def x8_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-8b: rank / dense_rank / ntile with a total order."""
    o = src.load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return o.select(
        "o_orderstatus", "o_orderkey",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
    )


@register(
    "x8_window_frame",
    """
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
             PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE), o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
    FROM orders
    """,
)
def x8_window_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-8c: explicit frame spec — running total (exact decimal accumulation
    inside the frame so engines agree)."""
    # r13: spread keyed on the window partition key — exchange reused
    o = src.spread(src.load_table(spark, sf_dir, "orders"), "o_custkey")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").cast("date"), "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey", "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double").alias("running_total"),
    )


# ===========================================================================
# Event-time batch operators (streaming twins in streaming/events.py)
# ===========================================================================


@register(
    "evt_json_extract",
    """
    SELECT event_type,
           CAST(count_if(CAST(json_extract_string(props, '$.k') AS INTEGER) > 50) AS BIGINT) AS high_k,
           COUNT(*) AS cnt
    FROM events GROUP BY event_type
    """,
)
def evt_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props column: JSON path extraction + typed predicate."""
    ev = src.load_events(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.groupBy("event_type").agg(
        F.count_if(k > 50).alias("high_k"), F.count("*").alias("cnt")
    )


@register(
    "evt_tumbling_window",
    f"""
    SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start,
           event_type, COUNT(*) AS cnt, {_dsum('value')} AS value_sum
    FROM events GROUP BY 1, 2
    """,
)
def evt_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling event-time window aggregation (batch form of X-9; the
    streaming twin uses F.window + watermark)."""
    ev = src.load_events(spark, sf_dir)
    return (
        ev.groupBy(
            F.window("ts", "1 hour").alias("w"), "event_type"
        )
        .agg(F.count("*").alias("cnt"), agg.exact_sum(F.col("value")).alias("value_sum"))
        .select(F.col("w.start").alias("window_start"), "event_type", "cnt", "value_sum")
    )


@register(
    "evt_session_windows",
    f"""
    WITH ordered AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, value,
             lag(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev_ts
      FROM events
    ),
    flagged AS (
      -- microsecond-exact diff; STRICTLY > gap starts a new session: Spark's
      -- session_window merges touching windows (an event at exactly
      -- start+gap joins the session — verified in test_streaming.py)
      SELECT *, CASE WHEN prev_ts IS NULL
                       OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
                     THEN 1 ELSE 0 END AS new_session
      FROM ordered
    ),
    sessions AS (
      SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM flagged
    )
    SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events, {_dsum('value')} AS value_sum
    FROM sessions GROUP BY user_id, session_id
    """,
)
def evt_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (30-min inactivity gap) via gaps-and-islands — the
    deterministic batch twin of streaming session_window (X-9). The gap
    compare is microsecond-exact (unix_micros, not whole-second cast) and
    STRICTLY greater than the gap — F.session_window merges touching
    windows (an event at exactly start+gap joins the session; pinned in
    test_streaming.py::test_session_gap_boundary_matches_session_window),
    so batch, streaming, and oracle agree on boundary-straddling gaps."""
    # r13: spread keyed on the session key — both windows and the final
    # groupBy share this one exchange (guide §2.4/§2.5)
    ev = src.spread(src.load_events(spark, sf_dir), "user_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = 1800 * 1_000_000
    flagged = ev.withColumn("prev_ts", F.lag("ts").over(w)).withColumn(
        "new_session",
        F.when(
            F.col("prev_ts").isNull()
            | (F.unix_micros(F.col("ts")) - F.unix_micros(F.col("prev_ts")) > gap_us),
            1,
        ).otherwise(0),
    )
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sessions = flagged.withColumn("session_id", F.sum("new_session").over(wsum))
    return sessions.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.count("*").alias("n_events"),
        agg.exact_sum(F.col("value")).alias("value_sum"),
    ).drop("session_id")


# ===========================================================================
# X-10: Pandas UDF surface (Arrow-vectorized; only where no native fn exists)
# ===========================================================================


@register(
    "x10_pandas_udf_tokens",
    """
    SELECT doc_id, len(string_split_regex(text, '\\s+')) AS n_tokens FROM documents
    """,
)
def x10_pandas_udf_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-10: scalar pandas_udf (Arrow batches) — result must agree with the
    JVM-native twin (x5_token_counts), proving the UDF boundary is lossless."""

    @F.pandas_udf(T.LongType())
    def n_tokens(texts: pd.Series) -> pd.Series:
        return texts.str.split(r"\s+").str.len().astype("int64")

    docs = src.load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", n_tokens(F.col("text")).alias("n_tokens"))

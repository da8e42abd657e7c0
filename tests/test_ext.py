"""[EXT] operator tests: approximate algorithms validated against brute-force
ground truth (the checks the DuckDB oracle can't express — SURVEY §7.3)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tesla_competitive_intelligence_etl_pipeline_spark.operators import dedup as dd
from tesla_competitive_intelligence_etl_pipeline_spark.operators import multimodal as mm
from tesla_competitive_intelligence_etl_pipeline_spark.operators import similarity as sim
from tesla_competitive_intelligence_etl_pipeline_spark.sources import io as src

BASE_DOC = (
    "the quick brown fox jumps over the lazy dog while the spark engine "
    "shuffles partitions across executors and the optimizer prunes columns "
)


@pytest.fixture(scope="module")
def near_dup_docs(spark):
    """20 docs: 5 near-dup pairs (one-word edits of a base doc), 10 unrelated."""
    rows = []
    for i in range(5):
        base = BASE_DOC + f"variant {i} " + " ".join(f"tok{i}{j}" for j in range(10))
        rows.append((2 * i, base))
        rows.append((2 * i + 1, base + " extra"))
    for i in range(10, 20):
        rows.append((i + 10, " ".join(f"word{i}{j}" for j in range(40))))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_lsh_finds_planted_near_dups(near_dup_docs):
    pairs = dd.minhash_lsh_pairs(near_dup_docs, threshold=0.5)
    found = {(r.doc_a, r.doc_b) for r in pairs.collect()}
    planted = {(2 * i, 2 * i + 1) for i in range(5)}
    # high-similarity planted pairs must all survive LSH + exact verification
    assert planted <= found
    # and nothing below the exact-jaccard threshold sneaks in (verify step)
    for r in pairs.collect():
        assert r.jaccard >= 0.5


def test_minhash_lsh_no_false_positives_on_verification(near_dup_docs):
    """LSH may propose garbage candidates; exact verification must kill them."""
    strict = dd.minhash_lsh_pairs(near_dup_docs, threshold=0.99)
    for r in strict.collect():
        assert r.jaccard >= 0.99


def test_simhash_signature_property(near_dup_docs):
    """Planted near-dups must have close signatures (the signature is exact;
    only the band-pruned pair *search* is approximate)."""
    sigs = {
        r.doc_id: r.sig
        for r in near_dup_docs.select(
            "doc_id", dd.simhash64(F.col("text")).alias("sig")
        ).collect()
    }
    for i in range(5):
        hamming = bin((sigs[2 * i] ^ sigs[2 * i + 1]) & (2**64 - 1)).count("1")
        assert hamming <= 20, f"pair {i} hamming {hamming}"


def test_simhash_pairs_on_planted_dups(near_dup_docs):
    pairs = dd.simhash_pairs(near_dup_docs, max_hamming=16)
    found = {(r.doc_a, r.doc_b) for r in pairs.collect()}
    planted = {(2 * i, 2 * i + 1) for i in range(5)}
    # banding guarantees recall only for hamming <= bands-1; require >= 4/5
    assert len(planted & found) >= 4


def test_near_dedup_canonical_drops_higher_id_partner(near_dup_docs):
    survivors = {r.doc_id for r in dd.near_dedup_canonical(near_dup_docs, threshold=0.5).collect()}
    for i in range(5):
        assert 2 * i in survivors      # lower id of each planted pair kept
        assert 2 * i + 1 not in survivors  # higher id dropped
    assert {i + 10 for i in range(10, 20)} <= survivors  # unrelated docs kept


def test_exact_dedup_recrawl(spark, sf_dir):
    docs = src.load_table(spark, sf_dir, "documents").select("doc_id", "text")
    recrawl = docs.unionByName(docs.withColumn("doc_id", F.col("doc_id") + 10**6))
    out = dd.exact_dedup(recrawl)
    rows = out.collect()
    assert len(rows) == docs.count()
    assert all(r.dup_count == 2 for r in rows)
    assert all(r.doc_id < 10**6 for r in rows)  # survivor = lowest id


def test_lsh_ann_results_subset_of_bruteforce_scores(spark, sf_dir):
    emb = src.load_table(spark, sf_dir, "embeddings")
    brute = {r.vec_id: r.cos_sim for r in sim.topk_neighbors_of(emb, 0, k=500).collect()}
    ann = sim.lsh_topk(emb, 0, k=10, n_planes=6).collect()
    assert len(ann) > 0
    for r in ann:  # ANN never invents scores — exact re-rank inside bucket
        assert abs(brute[r.vec_id] - r.cos_sim) < 1e-9
    # determinism: second run identical
    ann2 = sim.lsh_topk(emb, 0, k=10, n_planes=6).collect()
    assert [(r.vec_id, r.cos_sim) for r in ann] == [(r.vec_id, r.cos_sim) for r in ann2]


def test_ivf_topk_scores_match_bruteforce(spark, sf_dir):
    emb = src.load_table(spark, sf_dir, "embeddings")
    brute = {r.vec_id: r.cos_sim for r in sim.topk_neighbors_of(emb, 0, k=500).collect()}
    ivf = sim.ivf_topk(emb, 0, k=10, n_probe=2).collect()
    assert len(ivf) == 10
    for r in ivf:
        assert abs(brute[r.vec_id] - r.cos_sim) < 1e-9


def test_approx_sketches_within_bounds(spark, sf_dir):
    li = src.load_table(spark, sf_dir, "lineitem")
    exact = li.agg(
        F.count_distinct("l_partkey").alias("nd"),
        F.percentile("l_quantity", F.lit(0.5)).alias("p50"),
    ).first()
    approx = li.agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("nd"),
        F.percentile_approx("l_quantity", F.lit(0.5), 10000).alias("p50"),
    ).first()
    assert abs(approx.nd - exact.nd) <= max(3, 0.06 * exact.nd)  # 3x rsd
    assert abs(approx.p50 - exact.p50) <= 1.0


def test_multimodal_feature_plumbing(spark, sf_dir):
    docs = src.load_table(spark, sf_dir, "documents").limit(50)
    feats = mm.extract_features(mm.attach_binary_payload(docs))
    rows = feats.collect()
    assert len(rows) == 50
    for r in rows:
        assert len(r.features) == mm.FEATURE_DIM
        assert abs(sum(r.features) - 1.0) < 1e-3  # normalized fake features
        assert r.n_bytes > 0


def test_multimodal_decode_stub_raises_for_unsupported_modality():
    with pytest.raises(NotImplementedError):
        mm.decode_payload(b"\x89PNG", "image")

"""Multi-JVM validation (VERDICT r5 item 2): run the engine's riskiest
single-JVM-assumption entries under ``local-cluster[2,4,2048]`` — two REAL
executor JVMs with separate heaps and block managers, scheduled over RPC —
and require value-identical results to the in-process local[N] session.

What this flushes that local[N] cannot: eager localCheckpoint block
placement across executors (CC loops / SemDeDup / indexed dedup / portable
LSH), Python DataSource workers launched from executor JVMs
(src_rest_datasource), streaming state-store partitioning across executors
(x9_stream_tumbling), and serialization of every plan literal (centroids,
hyperplanes, band tables) over the wire instead of in-process reference
passing.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

from tests.local_cluster_runner import canonical_rows

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# The FULL driver correctness window (what the external gate hash-checks)
# PLUS the localCheckpoint-using dedup family VERDICT r5 item 2 names —
# every one must produce value-identical rows on real executor separation.
from tesla_competitive_intelligence_etl_pipeline_spark.plans import DRIVER_WINDOW

ENTRIES = DRIVER_WINDOW + [
    "x2_cluster_dedup",
    "x2_cluster_dedup_portable",
    "x2_cluster_dedup_star_portable",
    "x2_semantic_dedup",
    "x2_cross_corpus_indexed",
    "x2_cross_corpus_indexed_portable",
    "x2_minhash_lsh_portable",
    "x3_kmeans_df_clusters",
    "x3_ivfpq_topk",
    "x3_ivfpq_batch",
    "x9_stream_tumbling",
    # r7 merge-table additions: generic merge + snapshot + CDC diff
    # (driver-side manifest pruning + the full-outer change join) must be
    # value-identical when bucket files live on separate executors
    "x9_merge_cdc",
    "x1_cdc_incremental_dedup",
    # r7 BPE: per-round argmax scalar + localCheckpoint lineage truncation
    # + the vocab join must be value-identical across executor JVMs
    "x5_bpe_train",
    "x5_bpe_encode",
]


def test_entries_value_identical_under_multi_jvm(spark, sf_dir, tmp_path):
    out = tmp_path / "cluster_rows.json"
    env = dict(
        os.environ,
        SPARK_MASTER="local-cluster[2,4,2048]",
        SPARK_GRAFT_CPUS="8",
        SPARK_DRIVER_MEMORY="2g",
        # REAL multi-JVM finding (r6): executor JVMs spawn their OWN Python
        # workers, which — unlike local[N]'s driver-forked workers — do not
        # inherit the driver's sys.path, so the Python DataSource
        # (src_rest_datasource) dies with ModuleNotFoundError unless the
        # package is importable on executors. On a cluster that's "pip
        # install the package on workers" or spark.submit.pyFiles
        # (DEPLOYMENT.md § Session configuration); here PYTHONPATH
        # simulates the installed package.
        PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""),
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tests", "local_cluster_runner.py"),
         sf_dir, str(out), *ENTRIES],
        env=env,
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=1200,
    )
    if proc.returncode != 0 and (
        "Could not find valid SPARK_HOME" in proc.stderr
        or "spark-class" in proc.stderr
    ):
        pytest.skip(f"local-cluster mode unavailable here: {proc.stderr[-500:]}")
    assert proc.returncode == 0, proc.stderr[-4000:]

    payload = json.loads(out.read_text())
    # the cluster session really had 2x4 executor cores, not a local[N]
    assert payload["parallelism"] == 8

    queries = __import__("__spark_entry__").queries()
    for name in ENTRIES:
        local = canonical_rows(queries[name](spark, sf_dir))
        cluster = payload["rows"][name]
        assert cluster == local, (
            f"{name}: multi-JVM result diverged from local[N] "
            f"({len(cluster)} vs {len(local)} rows)"
        )
        assert local, f"{name}: empty result makes the parity check vacuous"


def test_crash_recovery_cycle_under_multi_jvm(spark, sf_dir, tmp_path):
    """VERDICT r6 item 4: the append crash sweeps run single-JVM; this runs
    one crashed-append -> break-lease -> recover -> (retry) -> search cycle
    per commit-point side under local-cluster[2,4,2048], where the staged
    batch's parquet files are written by separate executor JVMs. The healed
    indexes' search results must match the never-crashed cluster reference
    AND the same search computed by this local[N] session."""
    out = tmp_path / "crash_cycle.json"
    work = tmp_path / "work"
    work.mkdir()
    env = dict(
        os.environ,
        SPARK_MASTER="local-cluster[2,4,2048]",
        SPARK_GRAFT_CPUS="8",
        SPARK_DRIVER_MEMORY="2g",
        PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""),
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tests", "local_cluster_runner.py"),
         "--crash-cycle", sf_dir, str(out), str(work)],
        env=env,
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=1200,
    )
    if proc.returncode != 0 and (
        "Could not find valid SPARK_HOME" in proc.stderr
        or "spark-class" in proc.stderr
    ):
        pytest.skip(f"local-cluster mode unavailable here: {proc.stderr[-500:]}")
    assert proc.returncode == 0, proc.stderr[-4000:]

    payload = json.loads(out.read_text())
    assert payload["parallelism"] == 8
    assert payload["appended"] == 40
    assert set(payload["healed"]) == {"rolled_back", "rolled_forward"}
    for tag, rows in payload["healed"].items():
        assert rows == payload["reference"], (
            f"{tag}: healed index search diverged from the never-crashed "
            "cluster reference"
        )
    # ... and the cluster reference itself matches this local[N] session's
    # search over an identically built+appended index
    from pyspark.sql import functions as F

    from tesla_competitive_intelligence_etl_pipeline_spark.operators import similarity as sim
    from tesla_competitive_intelligence_etl_pipeline_spark.sources import io as srcio

    emb = srcio.load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 140)
    local_idx = str(tmp_path / "local_idx")
    sim.build_ivf_index(emb.filter(F.col("vec_id") < 100), local_idx)
    assert sim.ivf_index_append(
        spark, local_idx,
        emb.filter(F.col("vec_id") >= 100).select("vec_id", "embedding"),
    ) == 40
    local_rows = canonical_rows(sim.ivf_topk_indexed(spark, local_idx, 0, k=10))
    assert payload["reference"] == local_rows

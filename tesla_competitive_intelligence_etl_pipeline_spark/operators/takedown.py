"""End-to-end takedown orchestration (r9): one erasure request, every
store that could surface the content.

The pieces exist individually — merge-table DELETE (streaming.events),
commit-log delete records (read_commit_changes), ANN-index tombstones
(similarity / clustering), signature-table tombstones (dedup) — and their
pairwise compositions are pinned in tests. This module is the operator a
deployment actually schedules: it routes ONE request through all of them
and reports what each store did, so an id can never be erased from the
corpus but keep matching crawl increments or surfacing from an index
(the gap VERDICT r8 item 1 closed store-by-store).

Scale shape: the corpus DELETE is bucket-span / pruning-pass I/O, the CDC
read is O(delta) (exactly the delete records the commit captured), every
tombstone append is O(batch). Nothing reads the corpus or any index's
data files. Physical purge stays a scheduled job
(compact_*(purge_tombstones=True) — see DEPLOYMENT.md's maintenance
table); this operator is the request-time half.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_EPHEMERAL_PREFIX = "takedown-"


def sweep_takedown_pins(target: str, fs=None) -> list[str]:
    """Restart healing for a crashed takedown: drop the ephemeral
    ``takedown-*`` snapshots a process crash stranded between the pin and
    the finally-drop — stranded, they pin the PRE-DELETE store versions
    (including the erased rows) against vacuum forever, quietly defeating
    the erasure. Named snapshots are never touched (the prefix is
    reserved for this module's ephemeral pins). Idempotent; run it where
    the other recover_* functions run. Returns the dropped tags."""
    from tesla_competitive_intelligence_etl_pipeline_spark.streaming import events as strm
    from tesla_competitive_intelligence_etl_pipeline_spark.streaming import fs as mfs

    fs = fs or mfs.LOCAL_FS
    dropped = []
    for tag in strm.list_snapshots(target, fs):
        if tag.startswith(_EPHEMERAL_PREFIX):
            strm.drop_snapshot(target, tag, fs=fs)
            dropped.append(tag)
    return dropped


def takedown(
    spark: SparkSession,
    corpus: str,
    keys: DataFrame | None = None,
    predicate: str | None = None,
    id_col: str = "doc_id",
    ivf_indexes: tuple[str, ...] = (),
    ivfpq_indexes: tuple[str, ...] = (),
    signature_tables: tuple[str, ...] = (),
    fs=None,
    lease_owner: str | None = None,
) -> dict:
    """Erase documents everywhere, driven by the corpus table's own commit
    log: DELETE from the merge gold table at ``corpus`` (``keys`` mode or
    ``predicate`` mode — exactly delete_from_merge_table's contract),
    read back the delete records the commit captured, and tombstone those
    ids in every listed IVF index, IVF-PQ index, and LSH signature table.

    Driving propagation from the COMMIT LOG (not the caller's key list)
    is deliberate: predicate-mode deletes only learn which rows matched
    during the delete itself, and even keys-mode callers can pass ids the
    corpus never held — the log records what was ACTUALLY removed, so the
    downstream stores tombstone exactly that set (the x3_index_takedown /
    x2_sig_takedown composition, now one call). An empty delete (nothing
    matched) propagates nothing and reports zeros.

    The pre-delete state is pinned under an ephemeral snapshot for the
    CDC read and dropped afterwards; the delete records are collected
    into a small local DataFrame first (bounded by the request size), so
    the tombstone appends don't re-read the log per store. Returns
    ``{"corpus_deleted": n, "stores": {path: tombstoned}}``."""
    from tesla_competitive_intelligence_etl_pipeline_spark.operators import (
        clustering,
        dedup,
        similarity,
    )
    from tesla_competitive_intelligence_etl_pipeline_spark.streaming import events as strm
    from tesla_competitive_intelligence_etl_pipeline_spark.streaming import fs as mfs

    fs = fs or mfs.LOCAL_FS
    # ephemeral, collision-free tag (dot prefixes are reserved by the
    # snapshot-tag validator, so namespace by name instead). A PROCESS
    # crash between the pin and the finally-drop strands the tag, which
    # would pin the pre-delete versions against vacuum forever — restart
    # healing is sweep_takedown_pins (run it where the other recover_*
    # functions run).
    tag = f"{_EPHEMERAL_PREFIX}{uuid.uuid4().hex[:8]}"
    strm.snapshot_merge_table(corpus, tag, fs=fs, lease_owner=lease_owner)
    try:
        strm.delete_from_merge_table(
            spark, corpus, keys=keys, predicate=predicate, fs=fs,
            lease_owner=lease_owner,
        )
        gone = (
            strm.read_commit_changes(spark, corpus, since=tag, fs=fs)
            .filter(F.col("_change_type") == "delete")
            .select(id_col)
            .distinct()
        )
        # bounded by the request size — pin it once so each store's
        # tombstone append doesn't re-walk the log
        gone_rows = gone.collect()
    finally:
        strm.drop_snapshot(corpus, tag, fs=fs)
    n = len(gone_rows)
    stores: dict[str, int] = {}
    if n:
        ids = spark.createDataFrame(gone_rows)
        for path in ivfpq_indexes:
            stores[path] = clustering.ivfpq_index_delete(
                spark, path, ids, id_col=id_col, fs=fs, lease_owner=lease_owner
            )
        for path in ivf_indexes:
            stores[path] = similarity.ivf_index_delete(
                spark, path, ids, id_col=id_col, fs=fs, lease_owner=lease_owner
            )
        for path in signature_tables:
            stores[path] = dedup.delete_signature_entries(
                spark, path, ids, id_col=id_col, fs=fs, lease_owner=lease_owner
            )
    else:
        for path in (*ivfpq_indexes, *ivf_indexes, *signature_tables):
            stores[path] = 0
    return {"corpus_deleted": n, "stores": stores}

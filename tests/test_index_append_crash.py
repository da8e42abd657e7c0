"""Crash-at-every-op sweeps for the STAGED index appends (VERDICT r5 item 1).

ivf_index_append / pq_index_append commit through the atomic-marker protocol
in operators/index_commit — the same standard compact_ivf_index set. These
sweeps inject a crash after EVERY mutating filesystem op of the commit
(marker PUT, each per-file copy, each delete) under simulated S3 semantics
(NonAtomicRenameFS: rename = copy+delete, put_atomic all-or-nothing), run
recovery with a healthy filesystem (simulating restart), and require the
table to be EXACTLY pre-append or EXACTLY post-append at every crash point —
never a torn batch — and, when rolled back, that a retry lands the batch.
"""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from tesla_competitive_intelligence_etl_pipeline_spark.operators import clustering
from tesla_competitive_intelligence_etl_pipeline_spark.operators import similarity as sim
from tesla_competitive_intelligence_etl_pipeline_spark.sources import io as src
from tesla_competitive_intelligence_etl_pipeline_spark.streaming import fs as mfs


def _rows(spark, path):
    return sorted(tuple(r) for r in spark.read.parquet(path).collect())


def test_ivf_append_crash_at_every_op_never_tears(spark, sf_dir, tmp_path):
    emb = src.load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 140)
    base = emb.filter(F.col("vec_id") < 100)
    batch = emb.filter(F.col("vec_id") >= 100).select("vec_id", "embedding")

    pristine = str(tmp_path / "pristine")
    sim.build_ivf_index(base, pristine)
    before = _rows(spark, pristine + "/vectors")

    # reference post-append content + a probe run to count mutating fs ops
    probe = str(tmp_path / "probe")
    shutil.copytree(pristine, probe)
    probe_fs = mfs.NonAtomicRenameFS()
    assert sim.ivf_index_append(spark, probe, batch, fs=probe_fs) == 40
    after = _rows(spark, probe + "/vectors")
    assert len(after) == len(before) + 40
    total_ops = probe_fs.ops
    assert total_ops >= 4  # marker put + >=1 cell x (copy + delete) + cleanup

    outcomes = set()
    for crash_at in range(total_ops):
        path = str(tmp_path / f"run{crash_at}")
        shutil.copytree(pristine, path)
        fs = mfs.NonAtomicRenameFS(fail_after_ops=crash_at)
        try:
            sim.ivf_index_append(spark, path, batch, fs=fs)
        except mfs.NonAtomicRenameFS.InjectedCrash:
            # a crashed writer strands its lease by design; the restart
            # breaks it after confirming the writer is dead
            mfs.break_writer_lease(mfs.LOCAL_FS, path)
        sim.recover_ivf_index(path)  # restart with a healthy filesystem
        got = _rows(spark, path + "/vectors")
        assert got in (before, after), f"torn append at crash op {crash_at}"
        outcomes.add("rolled_back" if got == before else "rolled_forward")
        if got == before:
            # pre-marker crash: the batch is simply not there — a retry
            # must land it cleanly on the healed table
            assert sim.ivf_index_append(spark, path, batch) == 40
            assert _rows(spark, path + "/vectors") == after
        shutil.rmtree(path)
    # the sweep must actually exercise both sides of the commit point
    assert outcomes == {"rolled_back", "rolled_forward"}

    # indexed search over a crashed+healed append is bit-identical to the
    # never-crashed index (VERDICT r5 done-criterion)
    healed = str(tmp_path / "healed")
    shutil.copytree(pristine, healed)
    fs = mfs.NonAtomicRenameFS(fail_after_ops=total_ops - 1)
    try:
        sim.ivf_index_append(spark, healed, batch, fs=fs)
    except mfs.NonAtomicRenameFS.InjectedCrash:
        pass
    sim.recover_ivf_index(healed)
    want = [tuple(r) for r in sim.ivf_topk_indexed(spark, probe, 0, k=10).collect()]
    got = [tuple(r) for r in sim.ivf_topk_indexed(spark, healed, 0, k=10).collect()]
    assert got == want


def test_pq_append_crash_at_every_op_never_tears(spark, sf_dir, tmp_path):
    emb = src.load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 140)
    base = emb.filter(F.col("vec_id") < 100)
    batch = emb.filter(F.col("vec_id") >= 100).select("vec_id", "embedding")

    pristine = str(tmp_path / "pristine")
    clustering.pq_build_index(
        base, pristine, m=4, k=8, max_iters=2, round_decimals=6
    )
    before = _rows(spark, pristine + "/codes")

    probe = str(tmp_path / "probe")
    shutil.copytree(pristine, probe)
    probe_fs = mfs.NonAtomicRenameFS()
    assert clustering.pq_index_append(spark, probe, batch, fs=probe_fs) == 40
    after = _rows(spark, probe + "/codes")
    assert len(after) == len(before) + 40
    total_ops = probe_fs.ops
    assert total_ops >= 4

    outcomes = set()
    for crash_at in range(total_ops):
        path = str(tmp_path / f"run{crash_at}")
        shutil.copytree(pristine, path)
        fs = mfs.NonAtomicRenameFS(fail_after_ops=crash_at)
        try:
            clustering.pq_index_append(spark, path, batch, fs=fs)
        except mfs.NonAtomicRenameFS.InjectedCrash:
            mfs.break_writer_lease(mfs.LOCAL_FS, path)
        clustering.recover_pq_index(path)
        got = _rows(spark, path + "/codes")
        assert got in (before, after), f"torn append at crash op {crash_at}"
        outcomes.add("rolled_back" if got == before else "rolled_forward")
        if got == before:
            assert clustering.pq_index_append(spark, path, batch) == 40
            assert _rows(spark, path + "/codes") == after
        shutil.rmtree(path)
    assert outcomes == {"rolled_back", "rolled_forward"}

    # search parity across crashed+healed vs never-crashed
    query = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    healed = str(tmp_path / "healed")
    shutil.copytree(pristine, healed)
    fs = mfs.NonAtomicRenameFS(fail_after_ops=total_ops - 1)
    try:
        clustering.pq_index_append(spark, healed, batch, fs=fs)
    except mfs.NonAtomicRenameFS.InjectedCrash:
        pass
    clustering.recover_pq_index(healed)
    want = [tuple(r) for r in clustering.pq_topk_indexed(spark, probe, query, k=10).collect()]
    got = [tuple(r) for r in clustering.pq_topk_indexed(spark, healed, query, k=10).collect()]
    assert got == want


def test_append_staging_invisible_to_readers(spark, sf_dir, tmp_path):
    """Pre-commit staging (and a committed-marker state before roll-forward)
    must be invisible to a concurrent reader of the live table: dot-prefixed
    dirs are excluded from Spark's listing, and files land only tag-renamed
    after the marker."""
    emb = src.load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 120)
    base = emb.filter(F.col("vec_id") < 100)
    batch = emb.filter(F.col("vec_id") >= 100).select("vec_id", "embedding")
    path = str(tmp_path / "ivf")
    sim.build_ivf_index(base, path)
    before = _rows(spark, path + "/vectors")

    # crash right before the marker PUT (op 1 is the writer-lease acquire,
    # op 2 the marker): staging fully written, zero commits
    fs = mfs.NonAtomicRenameFS(fail_after_ops=1)
    try:
        sim.ivf_index_append(spark, path, batch, fs=fs)
    except mfs.NonAtomicRenameFS.InjectedCrash:
        mfs.break_writer_lease(mfs.LOCAL_FS, path)
    # a reader sees the pre-append table exactly, debris and all
    assert _rows(spark, path + "/vectors") == before
    out = sim.recover_ivf_index(path)
    assert out["removed"]  # the stranded staging dir was reclaimed
    assert _rows(spark, path + "/vectors") == before


def test_ivfpq_append_crash_at_every_op_never_tears_either_table(
    spark, sf_dir, tmp_path
):
    """The combined-index append commits vectors AND codes through ONE root
    marker: at every crash point, after recovery, BOTH tables must be in
    the SAME state (both exactly pre-append or both exactly post-append) —
    a codes row whose vector is missing, or vice versa, is a torn index."""
    emb = src.load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 140)
    base = emb.filter(F.col("vec_id") < 100)
    batch = emb.filter(F.col("vec_id") >= 100).select("vec_id", "embedding")

    pristine = str(tmp_path / "pristine")
    clustering.build_ivfpq_index(
        base, pristine, m=4, k=8, max_iters=2, round_decimals=6
    )
    before_v = _rows(spark, pristine + "/vectors")
    before_c = _rows(spark, pristine + "/codes")

    probe = str(tmp_path / "probe")
    shutil.copytree(pristine, probe)
    probe_fs = mfs.NonAtomicRenameFS()
    assert clustering.ivfpq_index_append(spark, probe, batch, fs=probe_fs) == 40
    after_v = _rows(spark, probe + "/vectors")
    after_c = _rows(spark, probe + "/codes")
    assert len(after_v) == len(before_v) + 40
    assert len(after_c) == len(before_c) + 40
    total_ops = probe_fs.ops
    assert total_ops >= 6  # lease + marker + two tables' moves + cleanup

    outcomes = set()
    for crash_at in range(total_ops):
        path = str(tmp_path / f"run{crash_at}")
        shutil.copytree(pristine, path)
        fs = mfs.NonAtomicRenameFS(fail_after_ops=crash_at)
        try:
            clustering.ivfpq_index_append(spark, path, batch, fs=fs)
        except mfs.NonAtomicRenameFS.InjectedCrash:
            mfs.break_writer_lease(mfs.LOCAL_FS, path)
        clustering.recover_ivfpq_index(path)
        got_v = _rows(spark, path + "/vectors")
        got_c = _rows(spark, path + "/codes")
        assert got_v in (before_v, after_v), f"torn vectors at crash op {crash_at}"
        assert got_c in (before_c, after_c), f"torn codes at crash op {crash_at}"
        # cross-table atomicity: never one table appended without the other
        assert (got_v == before_v) == (got_c == before_c), (
            f"vectors/codes disagree at crash op {crash_at}"
        )
        outcomes.add("rolled_back" if got_v == before_v else "rolled_forward")
        if got_v == before_v:
            assert clustering.ivfpq_index_append(spark, path, batch) == 40
            assert _rows(spark, path + "/vectors") == after_v
            assert _rows(spark, path + "/codes") == after_c
        shutil.rmtree(path)
    assert outcomes == {"rolled_back", "rolled_forward"}

    # search parity: crashed+healed index answers exactly like never-crashed
    query = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    healed = str(tmp_path / "healed")
    shutil.copytree(pristine, healed)
    fs = mfs.NonAtomicRenameFS(fail_after_ops=total_ops - 1)
    try:
        clustering.ivfpq_index_append(spark, healed, batch, fs=fs)
    except mfs.NonAtomicRenameFS.InjectedCrash:
        pass
    clustering.recover_ivfpq_index(healed)
    want = [
        tuple(r)
        for r in clustering.ivfpq_topk_indexed(
            spark, probe, query, k=10, n_probe=2, refine=4
        ).collect()
    ]
    got = [
        tuple(r)
        for r in clustering.ivfpq_topk_indexed(
            spark, healed, query, k=10, n_probe=2, refine=4
        ).collect()
    ]
    assert got == want


def test_signature_append_crash_at_every_op_never_tears(spark, tmp_path):
    """append_signature_table commits through the same atomic-marker
    protocol as the index appends — crash after EVERY mutating fs op, heal
    with recover_signature_table, and require the stored table to be
    exactly pre- or post-append, with both sides of the commit point
    exercised and a clean retry after every rollback."""
    from tesla_competitive_intelligence_etl_pipeline_spark.operators import dedup as dd

    base = spark.createDataFrame(
        [(i, " ".join(f"tok{i}_{j}" for j in range(30))) for i in range(6)],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [(100, " ".join(f"new_{j}" for j in range(30))),
         (101, " ".join(f"other_{j}" for j in range(30)))],
        "doc_id long, text string",
    )

    def sig_rows(path):
        return sorted(
            (r.doc_id, tuple(r.sh), tuple(r.sig))
            for r in spark.read.parquet(path).collect()
        )

    pristine = str(tmp_path / "pristine")
    dd.write_signature_table(base, pristine)
    before = sig_rows(pristine)

    probe = str(tmp_path / "probe")
    shutil.copytree(pristine, probe)
    probe_fs = mfs.NonAtomicRenameFS()
    assert dd.append_signature_table(batch, probe, fs=probe_fs) == 2
    after = sig_rows(probe)
    assert len(after) == len(before) + 2
    total_ops = probe_fs.ops
    assert total_ops >= 3

    outcomes = set()
    for crash_at in range(total_ops):
        path = str(tmp_path / f"run{crash_at}")
        shutil.copytree(pristine, path)
        fs = mfs.NonAtomicRenameFS(fail_after_ops=crash_at)
        try:
            dd.append_signature_table(batch, path, fs=fs)
        except mfs.NonAtomicRenameFS.InjectedCrash:
            mfs.break_writer_lease(mfs.LOCAL_FS, path + ".lock")
        dd.recover_signature_table(path)
        got = sig_rows(path)
        assert got in (before, after), f"torn append at crash op {crash_at}"
        outcomes.add("rolled_back" if got == before else "rolled_forward")
        if got == before:
            assert dd.append_signature_table(batch, path) == 2
            assert sig_rows(path) == after
        shutil.rmtree(path)
    assert outcomes == {"rolled_back", "rolled_forward"}

    # the healed table answers the crawl-dedup query identically to the
    # never-crashed one
    healed = str(tmp_path / "healed")
    shutil.copytree(pristine, healed)
    fs = mfs.NonAtomicRenameFS(fail_after_ops=total_ops - 1)
    try:
        dd.append_signature_table(batch, healed, fs=fs)
    except mfs.NonAtomicRenameFS.InjectedCrash:
        mfs.break_writer_lease(mfs.LOCAL_FS, healed + ".lock")
    dd.recover_signature_table(healed)
    probe_q = spark.createDataFrame(
        [(7, " ".join(f"new_{j}" for j in range(30)) + " tail")],
        "doc_id long, text string",
    )
    want = sorted(tuple(r) for r in dd.cross_corpus_neardup_indexed(
        probe_q, spark, probe, threshold=0.5).collect())
    got = sorted(tuple(r) for r in dd.cross_corpus_neardup_indexed(
        probe_q, spark, healed, threshold=0.5).collect())
    assert got == want and len(got) == 1


def test_signature_takedown_crash_at_every_op_never_tears(spark, tmp_path):
    """delete_signature_entries (r9) commits tombstones through the same
    atomic-marker protocol — crash after EVERY mutating fs op, heal with
    recover_signature_table, and require the crawl-dedup ANSWER to be
    exactly pre-takedown (doomed doc still matches) or exactly
    post-takedown (it never matches), with both sides of the commit point
    exercised and a clean retry after every rollback."""
    from tesla_competitive_intelligence_etl_pipeline_spark.operators import dedup as dd

    base = spark.createDataFrame(
        [(i, " ".join(f"tok{i}_{j}" for j in range(30))) for i in range(4)]
        + [(9, " ".join(f"shared_{j}" for j in range(30)))],
        "doc_id long, text string",
    )
    doomed = spark.createDataFrame([(9,)], "doc_id long")
    # the increment near-dups ONLY doc 9, so takedown flips one match
    increment = spark.createDataFrame(
        [(1000, " ".join(f"shared_{j}" for j in range(30)) + " tail")],
        "doc_id long, text string",
    )

    pristine = str(tmp_path / "pristine")
    dd.write_signature_table(base, pristine)

    def crawl(path):
        return sorted(tuple(r) for r in dd.cross_corpus_neardup_indexed(
            increment, spark, path, threshold=0.5).collect())

    before = crawl(pristine)
    assert len(before) == 1 and before[0][1] == 9

    probe = str(tmp_path / "probe")
    shutil.copytree(pristine, probe)
    probe_fs = mfs.NonAtomicRenameFS()
    assert dd.delete_signature_entries(spark, probe, doomed, fs=probe_fs) == 1
    after = crawl(probe)
    assert after == []
    total_ops = probe_fs.ops
    assert total_ops >= 3

    outcomes = set()
    for crash_at in range(total_ops):
        path = str(tmp_path / f"run{crash_at}")
        shutil.copytree(pristine, path)
        fs = mfs.NonAtomicRenameFS(fail_after_ops=crash_at)
        try:
            dd.delete_signature_entries(spark, path, doomed, fs=fs)
        except mfs.NonAtomicRenameFS.InjectedCrash:
            mfs.break_writer_lease(mfs.LOCAL_FS, path + ".lock")
        dd.recover_signature_table(path)
        got = crawl(path)
        assert got in (before, after), f"torn takedown at crash op {crash_at}"
        outcomes.add("rolled_back" if got == before else "rolled_forward")
        if got == before:
            assert dd.delete_signature_entries(spark, path, doomed) == 1
            assert crawl(path) == after
        shutil.rmtree(path)
    assert outcomes == {"rolled_back", "rolled_forward"}


def test_signature_compact_purge_crash_at_every_op_never_resurfaces(spark, tmp_path):
    """compact_signature_table(purge_tombstones=True) commits through an
    atomic swap marker — crash after EVERY mutating fs op, heal with
    recover_signature_table, and require (a) the crawl ANSWER to be the
    takedown answer at every crash point (an erased doc must NEVER
    resurface once tombstoned — tombstones are cleared only after its
    rows are off disk), and (b) the healed table to be exactly pre- or
    post-compact in content, with a clean re-run converging."""
    from pyspark.sql import functions as F

    from tesla_competitive_intelligence_etl_pipeline_spark.operators import dedup as dd

    base = spark.createDataFrame(
        [(i, " ".join(f"tok{i}_{j}" for j in range(30))) for i in range(4)]
        + [(9, " ".join(f"shared_{j}" for j in range(30)))],
        "doc_id long, text string",
    )
    doomed = spark.createDataFrame([(9,)], "doc_id long")
    increment = spark.createDataFrame(
        [(1000, " ".join(f"shared_{j}" for j in range(30)) + " tail")],
        "doc_id long, text string",
    )

    pristine = str(tmp_path / "pristine")
    dd.write_signature_table(base, pristine)
    dd.delete_signature_entries(spark, pristine, doomed)

    def crawl(p):
        return sorted(tuple(r) for r in dd.cross_corpus_neardup_indexed(
            increment, spark, p, threshold=0.5).collect())

    def sig_rows(p):
        return sorted(
            (r.doc_id, tuple(r.sh), tuple(r.sig))
            for r in spark.read.parquet(p).collect()
        )

    want = crawl(pristine)
    assert want == []  # tombstoned: doc 9 must not match
    before_rows = sig_rows(pristine)

    probe = str(tmp_path / "probe")
    shutil.copytree(pristine, probe)
    probe_fs = mfs.NonAtomicRenameFS()
    out = dd.compact_signature_table(
        spark, probe, coalesce_files=1, purge_tombstones=True, fs=probe_fs
    )
    assert out["purged_rows"] == 1 and out["tombstones_cleared"]
    after_rows = sig_rows(probe)
    assert len(after_rows) == len(before_rows) - 1
    total_ops = probe_fs.ops
    assert total_ops >= 5

    outcomes = set()
    for crash_at in range(total_ops):
        path = str(tmp_path / f"run{crash_at}")
        shutil.copytree(pristine, path)
        fs = mfs.NonAtomicRenameFS(fail_after_ops=crash_at)
        try:
            dd.compact_signature_table(
                spark, path, coalesce_files=1, purge_tombstones=True, fs=fs
            )
        except mfs.NonAtomicRenameFS.InjectedCrash:
            mfs.break_writer_lease(mfs.LOCAL_FS, path + ".lock")
        dd.recover_signature_table(path)
        got_rows = sig_rows(path)
        assert got_rows in (before_rows, after_rows), f"torn at op {crash_at}"
        outcomes.add(
            "rolled_back" if got_rows == before_rows else "rolled_forward"
        )
        # THE erasure invariant: the crawl answer is the takedown answer
        # at EVERY crash point (rolled back -> tombstones still filter;
        # rolled forward -> rows physically gone)
        assert crawl(path) == want, f"erased doc resurfaced at op {crash_at}"
        # re-run converges to the purged state
        dd.compact_signature_table(
            spark, path, coalesce_files=1, purge_tombstones=True
        )
        assert sig_rows(path) == after_rows
        shutil.rmtree(path)
    assert outcomes == {"rolled_back", "rolled_forward"}


def test_compact_purge_lands_crashed_tombstone_append_before_purge(
    spark, tmp_path
):
    """ADVICE r10 (high, a): a delete_signature_entries that crashed AFTER
    its marker committed but BEFORE the staged tombstone file landed left
    an erasure that load_signature_tombstones cannot see — the old purge
    then rmtree'd _tombstones/ and destroyed the committed tombstone while
    the doc's rows survived the rewrite (silent GDPR-erasure loss).
    compact_signature_table must land crashed tombstone appends FIRST, so
    the purge consumes them: erased rows off disk, nothing resurfaces."""
    import json
    import os

    from tesla_competitive_intelligence_etl_pipeline_spark.operators import dedup as dd
    from tesla_competitive_intelligence_etl_pipeline_spark.operators import index_commit as ic

    base = spark.createDataFrame(
        [(i, " ".join(f"tok{i}_{j}" for j in range(30))) for i in range(4)]
        + [(9, " ".join(f"shared_{j}" for j in range(30)))],
        "doc_id long, text string",
    )
    increment = spark.createDataFrame(
        [(1000, " ".join(f"shared_{j}" for j in range(30)) + " tail")],
        "doc_id long, text string",
    )
    path = str(tmp_path / "table")
    dd.write_signature_table(base, path)

    # hand-build the exact crash state: tombstone staged + marker PUT
    # (the commit point), files never landed — what a process crash
    # inside delete_signature_entries leaves behind
    tdir = path + "/_tombstones"
    tag, staging = ic.new_staging(tdir)
    spark.createDataFrame([(9,)], "doc_id long").coalesce(1).write.parquet(
        staging
    )
    files = ic._staged_files(mfs.LOCAL_FS, staging)
    assert files, "staged tombstone file missing"
    mfs.LOCAL_FS.put_atomic(
        os.path.join(tdir, f"{ic.MARKER_PREFIX}{tag}.json"),
        json.dumps({"tag": tag, "files": files}).encode(),
    )
    # committed but unlanded: the plain tombstone read cannot see it yet
    assert dd.load_signature_tombstones(spark, path) is None

    out = dd.compact_signature_table(
        spark, path, coalesce_files=1, purge_tombstones=True
    )
    # the purge consumed the landed tombstone: rows physically gone
    assert out["purged_rows"] > 0
    assert 9 not in {r.doc_id for r in spark.read.parquet(path).collect()}
    got = dd.cross_corpus_neardup_indexed(
        increment, spark, path, threshold=0.5
    ).collect()
    assert got == [], "erased doc resurfaced after purge"
    # and the consumed tombstone is cleared (no leftover erasure debris)
    assert dd.load_signature_tombstones(spark, path) is None


def test_compaction_crash_replay_spares_later_tombstones(spark, tmp_path):
    """ADVICE r10 (high, b): a tombstone committed BETWEEN a post-marker
    compaction crash and its recovery must survive the stale marker's
    replay — the marker now records exactly the tombstone files its purge
    consumed and roll-forward deletes only those, never the whole dir.
    Sweep every crash point; at each, erase a SECOND doc after the crash,
    heal, and require both erasures to hold (doc 9 via purge-or-tombstone,
    doc 8 via its post-crash tombstone) with a clean re-purge landing."""
    from tesla_competitive_intelligence_etl_pipeline_spark.operators import dedup as dd

    base = spark.createDataFrame(
        [(i, " ".join(f"tok{i}_{j}" for j in range(30))) for i in range(4)]
        + [(9, " ".join(f"shared_{j}" for j in range(30)))]
        + [(8, " ".join(f"second_{j}" for j in range(30)))],
        "doc_id long, text string",
    )
    inc9 = spark.createDataFrame(
        [(1000, " ".join(f"shared_{j}" for j in range(30)) + " tail")],
        "doc_id long, text string",
    )
    inc8 = spark.createDataFrame(
        [(2000, " ".join(f"second_{j}" for j in range(30)) + " tail")],
        "doc_id long, text string",
    )

    pristine = str(tmp_path / "pristine")
    dd.write_signature_table(base, pristine)
    dd.delete_signature_entries(
        spark, pristine, spark.createDataFrame([(9,)], "doc_id long")
    )

    def crawl(p, inc):
        return sorted(
            tuple(r)
            for r in dd.cross_corpus_neardup_indexed(
                inc, spark, p, threshold=0.5
            ).collect()
        )

    probe = str(tmp_path / "probe")
    shutil.copytree(pristine, probe)
    probe_fs = mfs.NonAtomicRenameFS()
    dd.compact_signature_table(
        spark, probe, coalesce_files=1, purge_tombstones=True, fs=probe_fs
    )
    total_ops = probe_fs.ops

    doomed8 = spark.createDataFrame([(8,)], "doc_id long")
    spared = 0
    for crash_at in range(total_ops):
        path = str(tmp_path / f"run{crash_at}")
        shutil.copytree(pristine, path)
        fs = mfs.NonAtomicRenameFS(fail_after_ops=crash_at)
        try:
            dd.compact_signature_table(
                spark, path, coalesce_files=1, purge_tombstones=True, fs=fs
            )
        except mfs.NonAtomicRenameFS.InjectedCrash:
            mfs.break_writer_lease(mfs.LOCAL_FS, path + ".lock")
        # the window the advice names: a NEW erasure commits between the
        # crash and the restart healing
        dd.delete_signature_entries(spark, path, doomed8)
        marked_post_commit = any(
            e.startswith(".sigswap_")
            for e in mfs.LOCAL_FS.listdir(path)
        )
        dd.recover_signature_table(path)
        # BOTH erasures hold at every crash point
        assert crawl(path, inc9) == [], f"doc 9 resurfaced at op {crash_at}"
        assert crawl(path, inc8) == [], f"doc 8 erasure lost at op {crash_at}"
        if marked_post_commit:
            spared += 1  # replay ran with the later tombstone present
        # a clean purge then lands doc 8's physical erasure too
        dd.compact_signature_table(
            spark, path, coalesce_files=1, purge_tombstones=True
        )
        left = {r.doc_id for r in spark.read.parquet(path).collect()}
        assert 8 not in left and 9 not in left
        assert crawl(path, inc8) == [] and crawl(path, inc9) == []
        shutil.rmtree(path)
    assert spared > 0, "sweep never exercised a post-marker replay"

"""Crash-safe staged APPEND commit for materialized index tables (VERDICT r5
item 1).

``ivf_index_append`` / ``pq_index_append`` previously wrote
``mode("append")`` straight into the live table: a crash during Spark's job
commit can leave a SUBSET of the batch's files visible to readers — a torn
append — and on S3 the default file committer makes that window wide. That
was inconsistent with the standard the repo set for itself: the streaming
merge and ``compact_ivf_index`` both stage then commit atomically through a
``MergeFS`` marker.

This module gives appends the same discipline, shared by both index kinds:

1. Spark writes the batch to a dot-prefixed STAGING dir inside the table
   (``.append_<tag>/``) — invisible to Spark's directory listing, so readers
   never see it.
2. ``commit_staged_append`` PUTs an atomic ``.appendcommit_<tag>.json``
   marker recording every staged parquet file (and its partition subdir).
   THE commit point: before the marker, nothing changed for readers and the
   batch is debris; after it, the append WILL complete (or be rolled
   forward by recovery).
3. Each staged file is moved into the live table under the deterministic
   name ``<tag>-<original>`` (tag-prefixed so a re-run lands on the same
   target and a reader can never collide two appends), then staging and the
   marker are dropped.

Crash model — identical to ``compact_ivf_index``'s swap: ``put_atomic`` is
the only atomicity requirement (true of an S3 object PUT); per-file moves
may be copy+delete and a single-object copy is atomic server-side (an S3
COPY either materializes the destination object or doesn't), so after a
crash each (staged file, live file) pair is in exactly one of three states:
src only (redo the move), src+dst (copy done, delete pending — drop src),
dst only (move complete). ``recover_appends`` rolls every marked append
forward from that evidence and deletes marker-less staging dirs as
pre-commit debris. Idempotent at every point; proven by the
crash-at-every-op sweeps in tests/test_index_append_crash.py.

Single-writer contract: like compaction, concurrent appenders to the SAME
table must be externally serialized (see streaming.fs writer-lease support).
"""

from __future__ import annotations

import json
import os
import uuid

MARKER_PREFIX = ".appendcommit_"
MULTI_MARKER_PREFIX = ".appendcommit_multi_"
STAGING_PREFIX = ".append_"


def new_staging(table_dir: str) -> tuple[str, str]:
    """Pick a fresh append tag and its staging path inside ``table_dir``.
    The caller has Spark write the batch THERE (dot-prefixed => readers of
    the live table cannot see it), then calls commit_staged_append."""
    tag = uuid.uuid4().hex[:8]
    return tag, os.path.join(table_dir, STAGING_PREFIX + tag)


def staging_path(table_dir: str, tag: str) -> str:
    """Staging dir for an existing tag — used when one append stages into
    SEVERAL tables under the same tag (commit_staged_append_multi)."""
    return os.path.join(table_dir, STAGING_PREFIX + tag)


def _staged_files(fs, staging: str) -> list[list[str]]:
    """[(partition_subdir or "", filename)] for every parquet file under the
    staging dir — flat tables have one level, partitionBy output two (the
    index tables never nest partitions deeper)."""
    out: list[list[str]] = []
    for entry in sorted(fs.listdir(staging)):
        full = os.path.join(staging, entry)
        if fs.isdir(full):
            if entry.startswith((".", "_")):
                continue
            for f in sorted(fs.listdir(full)):
                if f.endswith(".parquet"):
                    out.append([entry, f])
        elif entry.endswith(".parquet"):
            out.append(["", entry])
    return out


def commit_staged_append(fs, table_dir: str, tag: str) -> int:
    """Commit a staged batch: atomic marker PUT, then roll the files into
    the live table. Returns the number of data files landed. A crash at any
    point after the marker is healed by recover_appends (roll-forward); a
    crash before it leaves the live table byte-identical."""
    staging = os.path.join(table_dir, STAGING_PREFIX + tag)
    files = _staged_files(fs, staging)
    marker = os.path.join(table_dir, f"{MARKER_PREFIX}{tag}.json")
    fs.put_atomic(
        marker, json.dumps({"tag": tag, "files": files}).encode()
    )  # commit point
    _roll_forward(fs, table_dir, tag, files)
    return len(files)


def _land_files(fs, table_dir: str, tag: str, files: list[list[str]]) -> None:
    """Land every marked file in the live table, tolerating any prior
    partial progress (see module docstring for the three per-file states)."""
    staging = os.path.join(table_dir, STAGING_PREFIX + tag)
    for sub, f in files:
        src = os.path.join(staging, sub, f) if sub else os.path.join(staging, f)
        dst_dir = os.path.join(table_dir, sub) if sub else table_dir
        dst = os.path.join(dst_dir, f"{tag}-{f}")
        if fs.exists(dst):
            fs.rmtree(src)  # copy finished earlier; delete may be pending
        else:
            fs.rename(src, dst)
    fs.rmtree(staging)


def _roll_forward(fs, table_dir: str, tag: str, files: list[list[str]]) -> None:
    _land_files(fs, table_dir, tag, files)
    fs.rmtree(os.path.join(table_dir, f"{MARKER_PREFIX}{tag}.json"))


def recover_appends(fs, table_dir: str) -> dict[str, list[str]]:
    """Heal a table after a crashed append: roll FORWARD every append whose
    marker committed; drop marker-less ``.append_*`` staging as pre-commit
    debris. Safe to run any time (idempotent, no-op on a clean table).
    Returns {"completed": [tags], "removed": [staging dirs]}."""
    out: dict[str, list[str]] = {"completed": [], "removed": []}
    if not fs.isdir(table_dir):
        return out
    entries = sorted(fs.listdir(table_dir))
    marked: set[str] = set()
    for entry in entries:
        # multi markers share the prefix but belong to recover_multi_appends
        if (
            entry.startswith(MARKER_PREFIX)
            and entry.endswith(".json")
            and not entry.startswith(MULTI_MARKER_PREFIX)
        ):
            meta = json.loads(
                fs.read_bytes(os.path.join(table_dir, entry)).decode()
            )
            marked.add(meta["tag"])
            _roll_forward(fs, table_dir, meta["tag"], meta["files"])
            out["completed"].append(meta["tag"])
    for entry in entries:
        if entry.startswith(STAGING_PREFIX) and entry[len(STAGING_PREFIX):] not in marked:
            fs.rmtree(os.path.join(table_dir, entry))
            out["removed"].append(entry)
    return out


def commit_staged_append_multi(
    fs, root: str, tag: str, table_rels: list[str]
) -> int:
    """Commit one batch staged into SEVERAL tables under ``root`` (each at
    ``<root>/<rel>/.append_<tag>/``) with a SINGLE atomic marker at the
    index root — the combined-index (IVF-PQ) append, where vectors and
    codes must land as one transaction. Before the marker, every table is
    byte-identical for readers; after it, recovery rolls ALL of them
    forward.

    Tables land in the LIST ORDER given. Callers order so that tables other
    stages JOIN AGAINST land first — for IVF-PQ, vectors before codes: a
    reader between the two lands sees new vectors but only old codes, so
    its ADC shortlist (and therefore its result) is exactly the pre-append
    answer; the reverse order could shortlist ids whose vectors the refine
    join can't find yet, silently wasting shortlist slots. Returns the
    number of data files landed."""
    tables = [
        [rel, _staged_files(fs, staging_path(os.path.join(root, rel), tag))]
        for rel in table_rels
    ]
    marker = os.path.join(root, f"{MULTI_MARKER_PREFIX}{tag}.json")
    fs.put_atomic(
        marker, json.dumps({"tag": tag, "tables": tables}).encode()
    )  # commit point for ALL tables at once
    for rel, files in tables:
        _land_files(fs, os.path.join(root, rel), tag, files)
    fs.rmtree(marker)
    return sum(len(files) for _, files in tables)


def recover_multi_appends(fs, root: str, table_rels: list[str]) -> dict[str, list[str]]:
    """Heal a combined index after a crashed multi-table append: roll
    FORWARD every append whose root marker committed (tables in the
    marker's recorded order), then drop marker-less ``.append_*`` staging
    inside each listed table as pre-commit debris. Staging whose tag is
    owned by a SINGLE-table marker in that table dir is left for
    recover_appends (the two protocols coexist without stealing each
    other's work). Idempotent; safe any time."""
    out: dict[str, list[str]] = {"completed": [], "removed": []}
    if not fs.isdir(root):
        return out
    marked: set[str] = set()
    for entry in sorted(fs.listdir(root)):
        if entry.startswith(MULTI_MARKER_PREFIX) and entry.endswith(".json"):
            meta = json.loads(fs.read_bytes(os.path.join(root, entry)).decode())
            marked.add(meta["tag"])
            for rel, files in meta["tables"]:
                _land_files(fs, os.path.join(root, rel), meta["tag"], files)
            fs.rmtree(os.path.join(root, entry))
            out["completed"].append(meta["tag"])
    for rel in table_rels:
        tdir = os.path.join(root, rel)
        if not fs.isdir(tdir):
            continue
        for entry in sorted(fs.listdir(tdir)):
            if not entry.startswith(STAGING_PREFIX):
                continue
            tag = entry[len(STAGING_PREFIX):]
            if tag in marked:
                continue
            if fs.exists(os.path.join(tdir, f"{MARKER_PREFIX}{tag}.json")):
                continue  # a single-table append owns this tag
            fs.rmtree(os.path.join(tdir, entry))
            out["removed"].append(f"{rel}/{entry}")
    return out

"""Registry batch 4: X-9 Structured Streaming queries (SURVEY.md §2.9).

Each runs the real streaming engine (readStream → stateful agg →
writeStream) drained with Trigger.AvailableNow, so the final table is
deterministic and — for tumbling/session windows — hash-checkable against
the batch SQL oracle. This is the strongest correctness statement the
driver protocol allows for streaming.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from tesla_competitive_intelligence_etl_pipeline_spark.plans.registry import _dsum, register
from tesla_competitive_intelligence_etl_pipeline_spark.streaming import events as strm


@register(
    "x9_stream_tumbling",
    f"""
    SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start,
           event_type, COUNT(*) AS cnt, {_dsum('value')} AS value_sum
    FROM events GROUP BY 1, 2
    """,
)
def x9_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-9a: watermarked tumbling-window streaming aggregation; AvailableNow
    replay must agree with the batch oracle exactly."""
    ev = strm.stream_events(spark, sf_dir)
    return strm.run_to_table(spark, strm.tumbling_counts(ev))


@register(
    "x9_stream_session",
    f"""
    WITH ordered AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, value,
             lag(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev_ts
      FROM events
    ),
    flagged AS (
      -- microsecond-exact diff; STRICTLY > gap = new session (session_window
      -- merges touching windows — verified in test_streaming.py)
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
def x9_stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-9b: session windows (30-min gap) in the streaming state store; must
    agree with the batch gaps-and-islands oracle."""
    ev = strm.stream_events(spark, sf_dir)
    return strm.run_to_table(spark, strm.session_aggregation(ev))


@register(
    "x9_stream_stateful_totals",
    # value_sum is accumulated in float64 inside the pandas state fn, so the
    # oracle mirrors a double sum rounded to 6 (error ~1e-11 << 5e-7)
    """
    SELECT user_id, COUNT(*) AS n_events, ROUND(SUM(value), 6) AS value_sum
    FROM events GROUP BY user_id
    """,
)
def x9_stream_stateful_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-9d: custom stateful operator (applyInPandasWithState) — per-user
    running totals; after a full AvailableNow replay the final state snapshot
    per user must equal the batch aggregate."""
    from pyspark.sql import functions as F

    from tesla_competitive_intelligence_etl_pipeline_spark.streaming import stateful

    ev = strm.stream_events(spark, sf_dir)
    # Python-stateful: Arrow-worker parallelism dominates, keep session sizing
    out = strm.run_to_table(
        spark, stateful.running_user_totals(ev), mode="update", state_partitions=None
    )
    # update-mode memory sink keeps every emitted snapshot; latest per user
    # is the final state (single batch here, but stay general)
    latest = out.groupBy("user_id").agg(
        F.max(F.struct("n_events", "value_sum")).alias("s")
    )
    return latest.select(
        "user_id",
        F.col("s.n_events").alias("n_events"),
        F.round(F.col("s.value_sum"), 6).alias("value_sum"),
    )


@register(
    "x9_stream_foreachbatch_merge",
    """
    SELECT user_id, last_event_type, last_value FROM (
      SELECT user_id, event_type AS last_event_type, value AS last_value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def x9_stream_foreachbatch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-9c: foreachBatch MERGE upsert (streaming twin of SNK-4) — final gold
    state = latest event per user."""
    ev = strm.stream_events(spark, sf_dir)
    out = strm.foreach_batch_merge_latest(spark, ev)
    return out.select("user_id", "last_event_type", "last_value")


@register(
    "x9_merge_cdc",
    """
    WITH l2 AS (
      SELECT user_id, event_type AS last_event_type, value AS last_value, event_id,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
      FROM events
    ),
    s2 AS (SELECT user_id, last_event_type, last_value, event_id FROM l2 WHERE rn = 1),
    l1 AS (
      SELECT user_id, event_type AS last_event_type, value AS last_value, event_id,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
      FROM events WHERE CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-16'
    ),
    s1 AS (SELECT user_id, last_event_type, last_value, event_id FROM l1 WHERE rn = 1)
    SELECT n.user_id, n.last_event_type, n.last_value, n.event_id,
           'insert' AS _change_type
    FROM s2 n LEFT JOIN s1 o ON n.user_id = o.user_id WHERE o.user_id IS NULL
    UNION ALL
    SELECT o.user_id, o.last_event_type, o.last_value, o.event_id,
           'update_preimage' AS _change_type
    FROM s1 o JOIN s2 n ON o.user_id = n.user_id WHERE o.event_id <> n.event_id
    UNION ALL
    SELECT n.user_id, n.last_event_type, n.last_value, n.event_id,
           'update_postimage' AS _change_type
    FROM s1 o JOIN s2 n ON o.user_id = n.user_id WHERE o.event_id <> n.event_id
    UNION ALL
    SELECT o.user_id, o.last_event_type, o.last_value, o.event_id,
           'delete' AS _change_type
    FROM s1 o LEFT JOIN s2 n ON o.user_id = n.user_id WHERE n.user_id IS NULL
    """,
)
def x9_merge_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-9g: CDC incremental read over the merge gold table
    (streaming/events.py read_changes) — merge the first two weeks of
    events, snapshot (the state a training run read), merge the rest, then
    read the delta since the snapshot: inserts, plus update pre/post-image
    pairs where a later event advanced a user's state. Batches are split on
    event time because merge_upsert is MERGE-semantics (the incoming batch
    wins per key) — the contract assumes in-order ingestion, so the oracle's
    "latest event overall" equals the merged state. The oracle recomputes
    both pinned states from the raw events and diffs them in SQL; the
    winning event's identity (event_id) decides row difference, exactly as
    the engine's full-row compare does (the event row IS the payload). Diff
    I/O is manifest-pruned to changed buckets (proven in
    tests/test_streaming.py); the single shuffle is the key-equi full-outer
    join. The gold table + snapshot are built once per session/sf_dir
    (_ensure_cdc_gold — the table's ingest cost, same offline/online
    discipline as the signature tables and ANN indexes; bench.py warms it);
    the timed query is the CDC read itself."""
    target = _ensure_cdc_gold(spark, sf_dir)
    return strm.read_changes(spark, target, since="base").select(
        "user_id", "last_event_type", "last_value", "event_id", "_change_type"
    )


# events gold table + pinned base snapshot, built once per session/sf_dir
_CDC_GOLD: dict[str, str] = {}


def _ensure_cdc_gold(spark: SparkSession, sf_dir: str) -> str:
    if sf_dir not in _CDC_GOLD:
        import tempfile

        from pyspark.sql import functions as F

        from tesla_competitive_intelligence_etl_pipeline_spark.sources import io as io_mod

        ev = io_mod.load_events(spark, sf_dir)
        cutoff = F.lit("2024-01-16").cast("timestamp")
        target = tempfile.mkdtemp(prefix="cdc_") + "/gold"
        strm.merge_micro_batch(ev.filter(F.col("ts") < cutoff), target)
        strm.snapshot_merge_table(target, "base")
        strm.merge_micro_batch(ev.filter(F.col("ts") >= cutoff), target)
        _CDC_GOLD[sf_dir] = target
    return _CDC_GOLD[sf_dir]


@register(
    "x1_cdc_incremental_dedup",
    """
    WITH off AS (SELECT MAX(doc_id) + 1 AS o FROM documents),
    crawl AS (
      SELECT doc_id + (SELECT o FROM off) AS doc_id, text
      FROM documents WHERE doc_id < 50
      UNION ALL
      SELECT doc_id + 2 * (SELECT o FROM off) AS doc_id,
             text || ' (revised)' AS text
      FROM documents WHERE doc_id >= 50 AND doc_id < 100
    ),
    base_h AS (SELECT DISTINCT md5(text) AS h FROM documents)
    SELECT c.doc_id, (b.h IS NOT NULL) AS is_dup
    FROM (SELECT doc_id, md5(text) AS h FROM crawl) c
    LEFT JOIN base_h b ON c.h = b.h
    """,
)
def x1_cdc_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-1/X-9 composition — the incremental-crawl story end to end: the
    corpus lives in a schema-generic merge gold table keyed by doc_id
    (merge_table); a training run snapshots it; a new crawl batch (50 exact
    copies under fresh ids + 50 revised texts) merges in; read_changes
    yields ONLY the inserted docs, and exact dedup flags each against the
    PINNED base state by md5 — so steady-state dedup cost is O(delta), not
    O(corpus). Hashes are projected before the join (the shuffle carries
    (doc_id, 16-byte md5), never text — the dedup discipline); the base
    side is NOT broadcast (at 100 TB it is the full corpus hash set). The
    oracle recomputes the crawl and the flag in SQL. The corpus table +
    crawl merge are built once per session/sf_dir (_ensure_docs_gold,
    warmed by bench.py); the timed query is the CDC read plus the dedup
    flag join — the steady-state consumer cost."""
    from pyspark.sql import functions as F

    target = _ensure_docs_gold(spark, sf_dir)
    new_docs = strm.read_changes(spark, target, since="base").filter(
        F.col("_change_type") == "insert"
    )
    # the base corpus's distinct-md5 table is MATERIALIZED at ingest
    # (_ensure_docs_gold) — the timed path hashes only the delta and joins
    # the stored hash set, keeping the query genuinely O(delta)
    base_h = spark.read.parquet(target + "_basehash").withColumn(
        "__dup", F.lit(True)
    )
    return (
        new_docs.select("doc_id", F.md5("text").alias("h"))
        .join(base_h, "h", "left")
        .select(
            "doc_id", F.coalesce(F.col("__dup"), F.lit(False)).alias("is_dup")
        )
    )


# documents gold table + crawl merge + pinned base, once per session/sf_dir
_DOCS_GOLD: dict[str, str] = {}


def _ensure_docs_gold(spark: SparkSession, sf_dir: str) -> str:
    """Corpus gold table, pinned 'base' snapshot, crawl merge, AND the
    base state's distinct-md5 table (the offline half of incremental
    dedup — recomputing it per query would charge O(corpus) hashing to a
    path documented as O(delta), code review r7). Crawl ids offset by
    max(doc_id)+1 so they can never collide with existing keys at any
    scale factor (collision would turn oracle 'inserts' into engine
    'updates')."""
    if sf_dir not in _DOCS_GOLD:
        import tempfile

        from pyspark.sql import functions as F

        from tesla_competitive_intelligence_etl_pipeline_spark.sources import io as src

        docs = src.load_table(spark, sf_dir, "documents").select("doc_id", "text")
        off = docs.agg(F.max("doc_id")).first()[0] + 1  # one scalar, driver-side
        crawl = docs.filter(F.col("doc_id") < 50).select(
            (F.col("doc_id") + off).alias("doc_id"), "text"
        ).unionByName(
            docs.filter((F.col("doc_id") >= 50) & (F.col("doc_id") < 100)).select(
                (F.col("doc_id") + 2 * off).alias("doc_id"),
                F.concat(F.col("text"), F.lit(" (revised)")).alias("text"),
            )
        )
        target = tempfile.mkdtemp(prefix="cdc_docs_") + "/corpus"
        strm.merge_table(docs, target, keys=["doc_id"], order_cols=["doc_id"])
        strm.snapshot_merge_table(target, "base")
        strm.merge_table(crawl, target, keys=["doc_id"], order_cols=["doc_id"])
        strm.read_merged(spark, target, snapshot="base").select(
            F.md5("text").alias("h")
        ).distinct().write.parquet(target + "_basehash")
        _DOCS_GOLD[sf_dir] = target
    return _DOCS_GOLD[sf_dir]

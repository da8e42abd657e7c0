"""X-9: Structured Streaming ingestion of the events stream (SURVEY.md §2.9).

readStream → event-time transformations → writeStream, with:
- watermarked tumbling-window aggregation (late data dropped past watermark),
- session windows (F.session_window, 30-min gap),
- foreachBatch MERGE upsert — the streaming twin of SNK-4 (reference
  load.py:128-154): each micro-batch merges into a keyed gold table.

Tests/queries drive these with Trigger.AvailableNow over the static parquet —
one deterministic replay of the whole file — so results are comparable to the
batch oracle. In production the same code tails a directory/Kafka source.

Scale: state store holds one entry per open window/key; watermark bounds
state; foreachBatch merge shuffles only the micro-batch keys.
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tesla_competitive_intelligence_etl_pipeline_spark.sources import merge as merge_mod

# per-path schema probe results (a static test fixture's schema never
# changes mid-session; saves one footer read per stream construction)
_EVENTS_SCHEMA_CACHE: dict = {}

def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming source over the events parquet, ``ts`` normalized to
    TIMESTAMP — same read path as sources.io.load_events.

    readStream needs an explicit schema; the parquet TIMESTAMP(NANOS) column
    surfaces as long-ns or TIMESTAMP_NTZ depending on the Spark version, so
    take the schema from a one-footer batch probe (driver-side, no data scan)
    instead of hardcoding either representation."""
    import os

    from tesla_competitive_intelligence_etl_pipeline_spark.sources import io as src_io

    path = os.path.join(sf_dir, "events.parquet")
    schema = _EVENTS_SCHEMA_CACHE.get(path)
    if schema is None:
        schema = spark.read.parquet(path).schema
        _EVENTS_SCHEMA_CACHE[path] = schema
    raw = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")  # file-source needs a dir
        .load(sf_dir)
    )
    return src_io.normalize_event_ts(raw)


def tumbling_counts(events: DataFrame, window: str = "1 hour", watermark: str = "10 minutes") -> DataFrame:
    """Watermarked tumbling event-time aggregation."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("cnt"),
            F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias("value_sum"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "cnt", "value_sum")
    )


def session_aggregation(events: DataFrame, gap: str = "30 minutes", watermark: str = "10 minutes") -> DataFrame:
    """Session windows per user (gap-based), the stateful-streaming surface."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias("value_sum"),
        )
        .select("user_id", "session_start", "n_events", "value_sum")
    )


def start_to_table(
    spark: SparkSession,
    sdf: DataFrame,
    mode: str = "complete",
    state_partitions: int | None = 8,
):
    """Start an AvailableNow drain into an in-memory sink WITHOUT blocking.
    Returns (query, table_name); await the query, then read the table.
    Multiple streams started this way run concurrently in one session (each
    has its own checkpoint + query name) — composites that replay several
    streams pay max(stream time), not the sum.

    ``state_partitions`` sizes the stream's STATE partitioning (the stream
    snapshots ``spark.sql.shuffle.partitions`` at start and pins it in the
    checkpoint). State partitioning should track expected state volume, not
    the session's batch shuffle sizing: every stateful operator pays a
    per-partition state-store open/commit on every micro-batch, so
    over-partitioned state is pure overhead (32 -> 8 partitions cut a
    bounded-replay interval join from 6.9 s to 2.4 s at sf0.1). The default
    suits the bounded replay/bench surface; production streams with large
    keyspaces pass None to inherit the cluster-sized session conf."""
    name = "strm_" + uuid.uuid4().hex[:12]
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    if state_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        q = (
            sdf.writeStream.format("memory")
            .queryName(name)
            .outputMode(mode)
            .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_"))
            .trigger(availableNow=True)
            .start()
        )
    finally:
        if state_partitions is not None:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
    return q, name


def run_to_table(
    spark: SparkSession,
    sdf: DataFrame,
    mode: str = "complete",
    state_partitions: int | None = 8,
) -> DataFrame:
    """Drain the stream with Trigger.AvailableNow into an in-memory sink and
    return the final static result."""
    q, name = start_to_table(spark, sdf, mode, state_partitions)
    q.awaitTermination()
    return spark.table(name)


def merge_micro_batch(batch: DataFrame, target: str, n_buckets: int = 16) -> None:
    """MERGE one (micro-)batch into the bucket-partitioned gold table at
    ``target``.

    I/O is proportional to the batch's key range, not the table:
    - the gold table is partitioned by ``__bucket = pmod(xxhash64(user_id),
      n_buckets)`` — a stable hash, so a key always lands in the same
      partition directory;
    - only the buckets PRESENT IN THE BATCH are read back (partition
      pruning on the __bucket filter) and merged;
    - the write uses dynamic partition overwrite (mode=overwrite +
      partitionOverwriteMode=dynamic), which replaces exactly the partitions
      present in the output — untouched buckets are never read or written,
      and there is no read-back/copy double-write. Each partition swap is a
      normal job commit; cross-partition atomicity (a crash between two
      bucket commits) is the residual gap a Delta/Iceberg MERGE closes.
    """
    from tesla_competitive_intelligence_etl_pipeline_spark.operators import topk

    latest = topk.dedup_last_write_wins(
        batch.select(
            "user_id",
            F.col("event_type").alias("last_event_type"),
            F.col("value").alias("last_value"),
            "ts",
            "event_id",
        ),
        keys=["user_id"],
        order_cols=["ts", "event_id"],
    ).withColumn("__bucket", F.pmod(F.xxhash64("user_id"), F.lit(n_buckets)))
    sess = batch.sparkSession
    # tiny driver-side list (<= n_buckets values) used for partition pruning
    touched = [r["__bucket"] for r in latest.select("__bucket").distinct().collect()]
    if not touched:
        return
    # Probe path existence explicitly instead of catching a bare Exception
    # around the read: a transient/permission/corrupt-footer error must ABORT
    # the micro-batch (foreachBatch retries it), not be mistaken for "first
    # batch" — treating it as empty would make the dynamic partition
    # overwrite silently drop every existing row in the touched buckets.
    hconf = sess.sparkContext._jsc.hadoopConfiguration()
    hpath = sess.sparkContext._jvm.org.apache.hadoop.fs.Path(target)
    if hpath.getFileSystem(hconf).exists(hpath):
        current = sess.read.parquet(target).filter(F.col("__bucket").isin(touched))
    else:  # first batch: table does not exist yet
        current = sess.createDataFrame([], latest.schema)
    merged = merge_mod.merge_upsert(
        current, latest, keys=["user_id"], order_cols=["ts", "event_id"]
    )
    (
        merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("__bucket")
        .parquet(target)
    )


def start_merge_latest(
    events: DataFrame,
    target_dir: str | None = None,
    n_buckets: int = 16,
):
    """Non-blocking variant of foreach_batch_merge_latest: returns
    (query, target_path); await the query, then read the target."""
    target = target_dir or tempfile.mkdtemp(prefix="gold_") + "/user_state"
    q = (
        events.writeStream.foreachBatch(
            lambda batch, batch_id: merge_micro_batch(batch, target, n_buckets)
        )
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    return q, target


def foreach_batch_merge_latest(
    spark: SparkSession,
    events: DataFrame,
    target_dir: str | None = None,
    n_buckets: int = 16,
) -> DataFrame:
    """Streaming upsert (SNK-4 twin): per micro-batch, keep the latest event
    per user and MERGE into a bucket-partitioned parquet gold table keyed by
    user_id. Per-batch cost ∝ touched buckets (see merge_micro_batch), not
    table size."""
    q, target = start_merge_latest(events, target_dir, n_buckets)
    q.awaitTermination()
    return spark.read.parquet(target)

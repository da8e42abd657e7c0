#!/usr/bin/env python
"""Skip-vs-files-per-bucket curve at the sf1 scale point (r11 — VERDICT
r10 item 7's measurement half): the same 1M-row sf1 events fact as a merge
table, re-laid-out by optimize_merge_table at a SWEEP of
``target_file_bytes`` values, with the 2-D conjunctive range read (score
band x time window) timed at each point. Reported per point: the
auto-sizer's chosen files-per-bucket, files read / files total
(inputFiles — structural, not a timing inference), and read wall-clock.
SCALING.md r10 predicted the Z-order multiplicative win grows with tile
count; this quantifies where smaller files stop paying (file-open overhead
vs skip fraction) so target_file_bytes guidance is measured, not asserted.
Idle box, local[32]; one warm-up + timed second pass per read.
"""

from __future__ import annotations

import datetime as dt
import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tesla_competitive_intelligence_etl_pipeline_spark.session import get_spark  # noqa: E402
from tesla_competitive_intelligence_etl_pipeline_spark.sources import io as io_mod  # noqa: E402
from tesla_competitive_intelligence_etl_pipeline_spark.streaming import events as strm  # noqa: E402

SF1 = "/root/repo/.localdata/sf1"
FILTERS = {
    "value": (20.0, 120.0),
    "ts": (dt.datetime(2024, 1, 8), dt.datetime(2024, 1, 18)),
}


def timed_read(spark, target):
    def read():
        df = strm.read_merged(spark, target, range_filters=FILTERS)
        t0 = time.monotonic()
        df.write.format("noop").mode("overwrite").save()
        return time.monotonic() - t0, len(df.inputFiles())

    read()  # warm-up (plan compile, footer cache)
    spark.catalog.clearCache()
    return read()


def main() -> None:
    print(f"loadavg at start: {os.getloadavg()[0]:.2f}")
    spark = get_spark("filesizing_sf1")
    spark.sparkContext.setLogLevel("ERROR")
    ev = io_mod.load_events(spark, SF1).select(
        "event_id", "user_id", "event_type", "value", "ts"
    )
    target = tempfile.mkdtemp(prefix="fsz_sf1_") + "/gold"
    strm.merge_table(
        ev, target, keys=["event_id"], order_cols=["ts"], n_buckets=16,
        stats_cols=["value", "ts"],
    )
    total_bytes = strm.optimize_merge_table(
        spark, target, cluster_by=["value", "ts"], target_file_bytes=1 << 40
    )["_optimize_sizing"]["touched_bytes"]
    print(f"committed bytes: {total_bytes / 1e6:.1f} MB over 16 buckets")

    # sweep the files-per-bucket knob via the byte target that produces it
    # (target = bytes / (buckets * fpb)); the auto-sizer's chosen fpb is
    # echoed back so the mapping is verified, not assumed
    print("\n| files/bucket (chosen) | target MB/file | files read/total | read s | optimize s |")
    print("| --- | --- | --- | --- | --- |")
    for fpb_want in (1, 2, 4, 8, 16, 32):
        tfb = max(1, total_bytes // (16 * fpb_want))
        t0 = time.monotonic()
        m = strm.optimize_merge_table(
            spark, target, cluster_by=["value", "ts"], target_file_bytes=tfb
        )
        t_opt = time.monotonic() - t0
        fpb = m["_optimize_sizing"]["cluster_files"]
        total_files = len(strm.read_merged(spark, target).inputFiles())
        t_rd, f_rd = timed_read(spark, target)
        print(f"| {fpb_want} -> {fpb} | {tfb / 1e6:.2f} | {f_rd}/{total_files} "
              f"({100 * f_rd / max(1, total_files):.0f}%) | {t_rd:.2f} "
              f"| {t_opt:.1f} |", flush=True)


if __name__ == "__main__":
    main()

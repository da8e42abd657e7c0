#!/usr/bin/env python
"""Z-order layout win at the sf1 scale point (r10): the 2-D range read
(score band x time window) over the 1M-row sf1 events fact, as a merge
table, BEFORE vs AFTER optimize_merge_table(cluster_by=['value','ts']) —
plus the optimize cost itself. Pruned-file counts come from inputFiles, so
the skip is structural, not a timing inference. Idle box, local[32]; one
warm-up + timed second pass per read.
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
    spark = get_spark("zorder_sf1")
    spark.sparkContext.setLogLevel("ERROR")
    ev = io_mod.load_events(spark, SF1).select(
        "event_id", "user_id", "event_type", "value", "ts"
    )
    target = tempfile.mkdtemp(prefix="zorder_sf1_") + "/gold"
    strm.merge_table(
        ev, target, keys=["event_id"], order_cols=["ts"], n_buckets=16,
        stats_cols=["value", "ts"],
    )
    n_rows = strm.read_merged(spark, target).count()
    t_un, f_un = timed_read(spark, target)

    t0 = time.monotonic()
    strm.optimize_merge_table(
        spark, target, cluster_by=["value", "ts"], cluster_files=8
    )
    t_opt = time.monotonic() - t0
    t_z, f_z = timed_read(spark, target)
    f_all = len(strm.read_merged(spark, target).inputFiles())

    print(f"rows {n_rows}")
    print(f"unclustered read: {t_un:.2f}s over {f_un} files")
    print(f"optimize (O(table), one-off): {t_opt:.2f}s")
    print(
        f"z-ordered read:   {t_z:.2f}s over {f_z}/{f_all} files "
        f"({100 * (1 - f_z / f_all):.0f}% of files skipped)"
    )
    print(f"read speedup {t_un / t_z:.2f}x")


if __name__ == "__main__":
    main()

"""Subprocess runner for the multi-JVM smoke (VERDICT r5 item 2): build a
session against $SPARK_MASTER (the test sets local-cluster[2,4,2048] — two
REAL separate executor JVMs with their own memory/block managers, the
closest in-environment approximation of a distributed cluster), run the
requested registry entries, and dump canonicalized rows as JSON.

Run as a subprocess because one Python process can hold only one JVM/Spark
master — the pytest session's local[N] context cannot be reconfigured.

Usage: python tests/local_cluster_runner.py <sf_dir> <out.json> <entry>...
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def canonical_rows(df) -> list[list[str]]:
    """Engine-order-independent row canonicalization: every cell stringified
    (repr round-trips floats exactly), rows sorted. Matching lists => the
    two sessions produced value-identical results."""
    return sorted([repr(c) for c in row] for row in df.collect())


def main() -> None:
    sf_dir, out_path, *names = sys.argv[1:]
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")

    from tesla_competitive_intelligence_etl_pipeline_spark.session import get_spark

    spark = get_spark("multi-jvm-smoke", shuffle_partitions=8)
    # executor JVMs register asynchronously; wait for the full 2x4 cores so
    # (a) the parallelism recorded below is the real cluster shape and
    # (b) the first query doesn't run on one executor (on a loaded box the
    # second executor can take seconds to come up)
    import time

    deadline = time.time() + 120
    while (
        spark.sparkContext.defaultParallelism < 8 and time.time() < deadline
    ):
        time.sleep(0.5)
    n_execs = spark.sparkContext.defaultParallelism
    import __spark_entry__ as entrymod

    queries = entrymod.queries()
    out: dict[str, list[list[str]]] = {}
    for name in names:
        out[name] = canonical_rows(queries[name](spark, sf_dir))
    with open(out_path, "w") as fh:
        json.dump({"rows": out, "parallelism": n_execs}, fh)
    spark.stop()


if __name__ == "__main__":
    main()

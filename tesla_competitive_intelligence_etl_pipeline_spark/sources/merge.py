"""SNK-4: upsert/merge sink, plain-Spark variant (SURVEY.md §2.1, §7.4).

Reference semantics (load.py:128-154 + UNIQUE constraint schema.sql:30):
per natural key, last write wins; unmatched incoming rows are inserted,
matched rows are replaced by the staged row. (Column-level semantics like
"keep created_at, refresh updated_at" — schema.sql:63-82 trigger — use the
coalesce-per-column variant, operators.joins.merge_routing/JOIN-6.)

Spark-first design: no per-row SELECT→UPDATE loop. One shuffle:
  staged ∪ current → window row_number over (key ORDER BY priority) → keep 1.
This is exactly what Delta's MERGE compiles to for whole-row updates; we keep
the plain-DataFrame form so the engine has no storage-format dependency.
Determinism (SURVEY §7.4): ordering is (is_incoming DESC, source_priority,
tiebreaker) — fully specified, so "last write wins" is reproducible.

At 100 TB: the window shuffles on the natural key — same shuffle a MERGE
would need; AQE handles skewed tickers. For repeated merges into a bucketed
table, bucket both sides by the key to make the shuffle a local sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_upsert(
    current: DataFrame,
    staged: DataFrame,
    keys: list[str],
    order_cols: list | None = None,
) -> DataFrame:
    """Return current MERGE staged ON keys (staged wins; ties broken by
    ``order_cols`` descending, then arbitrary-but-deterministic)."""
    cur = current.withColumn("__is_incoming", F.lit(0))
    stg = staged.withColumn("__is_incoming", F.lit(1))
    unioned = cur.unionByName(stg, allowMissingColumns=True)
    order = [F.desc("__is_incoming")] + [F.desc(c) for c in (order_cols or [])]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        unioned.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__is_incoming")
    )


def insert_if_absent(existing: DataFrame, incoming: DataFrame, keys: list[str]) -> DataFrame:
    """SET-1 / JOIN-2: ON CONFLICT DO NOTHING (reference schema.sql:57-61,
    load.py:65-74) — anti-join the incoming rows, append survivors."""
    new_rows = incoming.join(existing.select(*keys).distinct(), on=keys, how="left_anti")
    return existing.unionByName(new_rows, allowMissingColumns=True)

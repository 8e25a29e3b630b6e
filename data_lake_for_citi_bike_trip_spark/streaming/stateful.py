"""Custom stateful streaming operators (applyInPandasWithState).

The escape hatch for semantics Spark's built-in streaming aggregates can't
express: per-key mutable state carried across micro-batches, updated by
Arrow-batched pandas code. State lives in the state store (checkpointed,
partitioned by the grouping key) — the same shuffle/partitioning story as
a streaming groupBy, so it scales the same way.

``user_running_totals`` is deliberately simple (a per-user counter) so the
cross-batch state behavior is observable and oracle-checkable: the final
update per user must equal the batch count.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, total_events bigint"
STATE_SCHEMA = "total bigint"


def _update_totals(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (total,) = state.get if state.exists else (0,)
    for pdf in pdfs:
        total += len(pdf)
    state.update((total,))
    yield pd.DataFrame({"user_id": [key[0]], "total_events": [total]})


def user_running_totals(events: DataFrame) -> DataFrame:
    """Per-user running event counts, one update row per (user, batch)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

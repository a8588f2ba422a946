"""Custom stateful streaming operator via ``applyInPandasWithState``.

``running_user_totals`` keeps one state row per user_id: cumulative
event count and value sum, emitting the updated totals on every
micro-batch that touches the user. This is the template for any custom
per-key state machine Spark's built-ins can't express (fraud scoring,
per-entity CDC reconciliation, custom sessionization rules).

Scale notes
-----------
- state lives in the state store, partitioned by the groupBy key —
  the same shuffle as a streaming agg, no extra exchange;
- pandas batches arrive per key-group via Arrow; per-key state is a
  tiny tuple, so memory scales with distinct active keys per
  partition, not with events;
- a processing-time timeout evicts idle keys (here: none — totals are
  kept forever; pass ``timeout_minutes`` to bound state).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, sum_value double"
STATE_SCHEMA = "n long, total double"


def _make_update_fn(timeout_minutes: int | None):
    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if timeout_minutes is not None and state.hasTimedOut:
            # idle key evicted: drop state, emit nothing
            state.remove()
            return
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        if timeout_minutes is not None:
            state.setTimeoutDuration(timeout_minutes * 60 * 1000)
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "sum_value": [round(total, 2)]}
        )

    return update


def running_user_totals(
    events: DataFrame, timeout_minutes: int | None = None
) -> DataFrame:
    """Per-user cumulative (count, sum(value)) across micro-batches.

    ``timeout_minutes`` bounds state: a key idle for that long is
    evicted at the next micro-batch (processing-time timeout) — memory
    then scales with ACTIVE keys, not ever-seen keys. Default keeps
    totals forever (the demo semantics)."""
    conf = (
        GroupStateTimeout.ProcessingTimeTimeout
        if timeout_minutes is not None
        else GroupStateTimeout.NoTimeout
    )
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _make_update_fn(timeout_minutes),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=conf,
        )
    )

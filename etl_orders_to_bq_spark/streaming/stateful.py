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


def running_user_totals_tws(
    events: DataFrame, timeout_minutes: int | None = None
) -> DataFrame:
    """``running_user_totals`` on Spark 4's ``transformWithStateInPandas``
    — the successor API (typed value state, per-key timers, state
    schema evolution). Same semantics and output schema as the
    ``applyInPandasWithState`` twin above, kept as the forward-looking
    backend. ``timeout_minutes`` maps onto per-key processing-time
    timers (``timeMode="ProcessingTime"``): each batch re-arms the
    key's timer, and ``handleExpiredTimer`` clears state for keys idle
    past the bound — mirroring the twin's ``hasTimedOut`` eviction.

    The Python runner for transformWithState talks to the JVM state
    server over a protobuf protocol, so it needs the ``protobuf``
    package at runtime (this container ships without it — one
    ``pip install protobuf`` from production, same discipline as the
    Pillow-gated multimodal codec). Import is checked here to fail
    with an actionable message instead of a mid-query worker error.
    """
    try:
        import google.protobuf  # noqa: F401  (runner dependency)
    except ImportError as exc:
        raise RuntimeError(
            "transformWithStateInPandas requires the 'protobuf' package "
            "for its state-server protocol (pip install protobuf); use "
            "running_user_totals (applyInPandasWithState) instead"
        ) from exc

    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class _Totals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._handle = handle
            self._state = handle.getValueState("totals", STATE_SCHEMA)
            self._timeout_ms = (
                timeout_minutes * 60 * 1000 if timeout_minutes else None
            )

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            n, total = (
                self._state.get() if self._state.exists() else (0, 0.0)
            )
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._state.update((n, total))
            if self._timeout_ms is not None:
                # slide the idle-eviction timer: drop any previously
                # registered expiry for this key, then re-arm relative
                # to the current processing time — the per-key-timer
                # equivalent of GroupState.setTimeoutDuration.
                for old in self._handle.listTimers():
                    self._handle.deleteTimer(old)
                self._handle.registerTimer(
                    timerValues.getCurrentProcessingTimeInMs()
                    + self._timeout_ms
                )
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "sum_value": [round(total, 2)],
                }
            )

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            # idle key evicted: drop state, emit nothing (same contract
            # as the applyInPandasWithState twin's hasTimedOut branch)
            self._state.clear()
            return iter(())

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        _Totals(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="ProcessingTime" if timeout_minutes is not None else "None",
    )


FUNNEL_OUTPUT_SCHEMA = (
    "user_id long, n_completions long, stage int"
)
FUNNEL_STATE_SCHEMA = "stage int, n_completions long"


def _make_funnel_fn(steps: list[str]):
    n_steps = len(steps)

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        stage, done = state.get if state.exists else (0, 0)
        batch = pd.concat(list(pdfs), ignore_index=True)
        # group iterators carry no intra-key order guarantee: pin the
        # event order explicitly (ts, event_id) — the same total
        # order every batch funnel in the repo uses
        batch = batch.sort_values(["ts", "event_id"])
        for et in batch["event_type"]:
            if et == steps[stage]:
                stage += 1
                if stage == n_steps:
                    done += 1
                    stage = 0
        state.update((stage, done))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_completions": [done],
                "stage": [stage],
            }
        )

    return update


def funnel_stream(
    events: DataFrame, steps: list[str] | None = None
) -> DataFrame:
    """Streaming funnel detector (CEP-lite) via
    ``applyInPandasWithState``: per user, a greedy non-overlapping
    stage machine over the ordered event stream — advance on the next
    expected step, count a completion and reset when the last step
    lands. The streaming counterpart of the batch ``window_funnel``
    (no time bound: the stream's watermark/timeout policy bounds
    state instead — state is TWO integers per user, the smallest
    possible CEP state).

    Emits one UPDATE row per user per micro-batch:
    ``(user_id, n_completions, stage)`` — with the whole fixture in
    one availableNow batch the final update equals the batch greedy
    machine, which is what the oracle replays (the
    running_user_totals contract).
    """
    steps = steps or ["view", "click", "purchase"]
    return events.groupBy("user_id").applyInPandasWithState(
        _make_funnel_fn(list(steps)),
        outputStructType=FUNNEL_OUTPUT_SCHEMA,
        stateStructType=FUNNEL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

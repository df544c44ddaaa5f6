"""Streaming mirror of ``ts_transition_matrix``
(suite/timeseries.py): per-entity sequence bigrams over an unbounded
stream, with the LAG carried across micro-batches in
``applyInPandasWithState`` state — the boundary row between two
batches still yields its transition, which a stateless window-lag
per batch would silently drop.

State per user is one row: the last event's (ts, event_id,
event_type) — O(1) per key, the minimum any sequence operator can
carry.  Rows inside a batch are sorted by (ts, event_id), the same
deterministic order the batch query uses; cross-batch order is the
source's responsibility (time-ordered ingestion, the usual
applyInPandasWithState contract, cf. streaming/resample.py).  Output
rows are per-batch DELTAS ``(prev_type, event_type, n)`` — a
downstream consumer sums them, so the operator composes without
stacking a second stateful aggregation into the same query (a
restricted pattern in update mode).  Idle keys age out via the
processing-time timeout like streaming/stateful.py.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "prev_type string, event_type string, n long"
STATE_SCHEMA = "last_ts long, last_eid long, last_type string"


def _make_update(timeout_ms: int | None):
    def _update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        last_type = state.get[2] if state.exists else None
        batch = pd.concat(list(pdfs), ignore_index=True)
        if not len(batch):
            return
        batch = batch.sort_values(
            ["ts", "event_id"], kind="mergesort"
        ).reset_index(drop=True)
        types = batch["event_type"]
        prev = types.shift(1)
        if last_type is not None:
            prev.iloc[0] = last_type
        pairs = (
            pd.DataFrame({"prev_type": prev, "event_type": types})
            .dropna()
            .groupby(["prev_type", "event_type"], sort=False)
            .size()
            .reset_index(name="n")
        )
        last = batch.iloc[-1]
        state.update((
            int(last["ts"].value), int(last["event_id"]),
            str(last["event_type"]),
        ))
        if timeout_ms is not None:
            state.setTimeoutDuration(timeout_ms)
        if len(pairs):
            yield pairs

    return _update


def stream_transition_deltas(
    stream: DataFrame, timeout_ms: int | None = 3_600_000
) -> DataFrame:
    """Per-batch transition-count deltas over (user_id, ts, event_id,
    event_type) stream rows; summing the deltas reproduces the batch
    transition matrix exactly (pytest-pinned stream == batch).

    ``timeout_ms=None`` disables idle-key eviction (NoTimeout) — use
    for FINITE replays (``availableNow``), where armed processing-time
    timers otherwise keep the query triggering empty micro-batches
    after the input is exhausted; unbounded deployments keep the
    default so abandoned keys age out."""
    return (
        stream.select("user_id", "ts", "event_id", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_update(timeout_ms),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=(
                GroupStateTimeout.NoTimeout
                if timeout_ms is None
                else GroupStateTimeout.ProcessingTimeTimeout
            ),
        )
    )

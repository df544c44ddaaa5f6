"""Custom stateful streaming operator via ``applyInPandasWithState``
(§2.8 / brief north-star: "custom stateful operators").

``stream_running_stats`` keeps per-key running (count, quantized sum,
min, max) across micro-batches — the streaming form of the engine's
quantized aggregation discipline: state holds exact BIGINTs, so the
running sum is identical no matter how rows split across batches.

Scale notes: state is 4 numbers per key in the state store; a real
deployment bounds key cardinality with a GroupStateTimeout (set here to
processing-time) so abandoned keys age out.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_Q = 1_000_000

OUTPUT_SCHEMA = (
    "user_id long, n_events long, sum_q long, v_min double, v_max double"
)
STATE_SCHEMA = "n long, s long, mn double, mx double"


def _make_update(timeout_ms: int | None):
    def _update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # idle-key eviction: drop the state and emit nothing —
            # without this branch every timeout would re-emit a stale
            # row and re-arm, so state would never actually age out
            state.remove()
            return
        n, s, mn, mx = state.get if state.exists else (0, 0, None, None)
        import numpy as np

        for pdf in pdfs:
            v = pdf["value"]
            n += len(v)
            # exact-integer quantized running sum (order/batch
            # insensitive), same floor(value * 1e6) the batch suite uses
            s += int(
                np.floor(v.to_numpy(np.float64) * _Q).astype(np.int64).sum()
            )
            bmn, bmx = float(v.min()), float(v.max())
            mn = bmn if mn is None else min(mn, bmn)
            mx = bmx if mx is None else max(mx, bmx)
        state.update((n, s, mn, mx))
        if timeout_ms is not None:
            state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "sum_q": [s],
                "v_min": [mn],
                "v_max": [mx],
            }
        )

    return _update


def stream_running_stats(
    stream: DataFrame, timeout_ms: int | None = 3_600_000
) -> DataFrame:
    """Per-user running stats over an unbounded event stream; emits the
    refreshed state row for every key touched in each micro-batch
    (update output mode).  Keys idle for ``timeout_ms`` of processing
    time are evicted (state removed, nothing emitted).

    ``timeout_ms=None`` disables eviction (NoTimeout) — required for
    FINITE replays (``availableNow``): armed processing-time timers
    keep an otherwise-drained query triggering empty micro-batches, so
    it never terminates (measured: 200+ empty commits before the test
    harness gave up)."""
    return (
        stream.select("user_id", "value")
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

"""Streaming per-key anomaly scoring on the Spark 4 transformWithState
API — the live sibling of the batch ``event_spikes`` z-score query.

Each key maintains an exponentially weighted mean/variance
(ValueState) and scores every event BEFORE folding it in:
``z = (x - mean) / sqrt(var)``; ``is_anomaly`` fires after a warmup
count once |z| exceeds the threshold.  EWMA decay bounds the state to
three doubles per key no matter how long the stream runs, and a
per-key event-time timer clears state for keys idle past the TTL —
O(active keys) forever, the same posture as ``streaming_sessionize``.

Two implementations of the same semantics:

- ``streaming_anomaly`` — ``applyInPandasWithState`` (the API the
  rest of streaming/ uses); fully exercised by the test suite.
- ``streaming_anomaly_tws`` — the Spark 4 ``transformWithState``
  form (typed ValueState + first-class timers).  ENV-GATED: the TWS
  Python runner imports ``google.protobuf``, which this container
  does not ship, so the code path raises a clear error here and runs
  only where protobuf is installed (``_HAS_PROTOBUF`` guard).  The
  state logic is shared (``_ewma_step``), so the gated wrapper adds
  only API plumbing.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

try:  # TWS needs google.protobuf in the Python runner (not shipped here)
    from google.protobuf import descriptor as _pb_descriptor  # noqa: F401

    _HAS_PROTOBUF = True
except ImportError:
    _HAS_PROTOBUF = False

OUT_SCHEMA = (
    "user_id long, event_time timestamp, value double, "
    "z double, is_anomaly boolean"
)

_STATE_SCHEMA = "mean double, var double, n long"


def _ewma_step(batch: pd.DataFrame, state: tuple, alpha: float,
               z_thresh: float, warmup: int):
    """Score a time-sorted batch against (mean, var, n) EWMA state;
    returns (z list, flag list, new state).  Scoring happens BEFORE
    each fold so an event never dampens its own z."""
    mean, var, n = state
    out_z, out_flag = [], []
    for x in batch["value"].astype(float).to_numpy():
        if n >= warmup and var > 0:
            z = (x - mean) / math.sqrt(var)
        else:
            z = 0.0
        out_z.append(round(z, 6))
        out_flag.append(abs(z) > z_thresh)
        if n == 0:
            mean, var = x, 0.0
        else:
            d = x - mean
            mean += alpha * d
            var = (1 - alpha) * (var + alpha * d * d)
        n += 1
    return out_z, out_flag, (float(mean), float(var), int(n))


def _anomaly_fn(alpha: float, z_thresh: float, warmup: int,
                idle_timeout_ms: int):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            state.remove()
            return
        st = state.get if state.exists else (0.0, 0.0, 0)
        # all chunks first, ONE per-key time sort (the rate-cap lesson:
        # chunk-local sorts process hot keys out of order)
        batch = pd.concat(list(pdfs), ignore_index=True)
        if not len(batch):
            return
        batch = batch.sort_values("event_time")
        out_z, out_flag, st = _ewma_step(batch, st, alpha, z_thresh, warmup)
        state.update(st)
        last_ms = int(batch["event_time"].max().value // 1_000_000)
        timeout_ms = last_ms + idle_timeout_ms
        if timeout_ms > state.getCurrentWatermarkMs():
            state.setTimeoutTimestamp(timeout_ms)  # idle-key eviction
        else:
            state.remove()
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(batch),
                "event_time": batch["event_time"].to_list(),
                "value": batch["value"].astype(float).to_list(),
                "z": out_z,
                "is_anomaly": out_flag,
            }
        )

    return fn


def streaming_anomaly(
    events: DataFrame,
    alpha: float = 0.1,
    z_thresh: float = 3.0,
    warmup: int = 5,
    watermark: str = "30 minutes",
    idle_timeout_ms: int = 3_600_000,
    time_col: str = "event_time",
) -> DataFrame:
    """Score a stream of (user_id, event_time, value) rows: emits
    every event with its pre-update z-score and anomaly flag."""
    if time_col != "event_time":
        events = events.withColumnRenamed(time_col, "event_time")
    return (
        events.withWatermark("event_time", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _anomaly_fn(alpha, z_thresh, warmup, idle_timeout_ms),
            outputStructType=OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def streaming_anomaly_tws(
    events: DataFrame,
    alpha: float = 0.1,
    z_thresh: float = 3.0,
    warmup: int = 5,
    watermark: str = "30 minutes",
    idle_timeout_ms: int = 3_600_000,
    time_col: str = "event_time",
) -> DataFrame:
    """Same semantics on the Spark 4 ``transformWithState`` API
    (typed ValueState + timers).  ENV-GATED: raises unless
    google.protobuf is importable (the TWS Python runner requires
    it); logic is shared with ``streaming_anomaly`` via
    ``_ewma_step``."""
    if not _HAS_PROTOBUF:
        raise NotImplementedError(
            "transformWithState needs google.protobuf in the Python "
            "runtime; use streaming_anomaly (applyInPandasWithState) here"
        )
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _EwmaAnomaly(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._handle = handle
            self._state = handle.getValueState("ewma", _STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            (user_id,) = key
            st = self._state.get() if self._state.exists() else (0.0, 0.0, 0)
            batch = pd.concat(list(rows), ignore_index=True)
            if not len(batch):
                return
            batch = batch.sort_values("event_time")
            out_z, out_flag, st = _ewma_step(
                batch, st, alpha, z_thresh, warmup
            )
            self._state.update(st)
            last_ms = int(batch["event_time"].max().value // 1_000_000)
            for t in self._handle.listTimers():
                self._handle.deleteTimer(t)
            self._handle.registerTimer(last_ms + idle_timeout_ms)
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(batch),
                    "event_time": batch["event_time"].to_list(),
                    "value": batch["value"].astype(float).to_list(),
                    "z": out_z,
                    "is_anomaly": out_flag,
                }
            )

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            self._state.clear()
            return iter(())

        def close(self) -> None:
            pass

    if time_col != "event_time":
        events = events.withColumnRenamed(time_col, "event_time")
    return (
        events.withWatermark("event_time", watermark)
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=_EwmaAnomaly(),
            outputStructType=OUT_SCHEMA,
            outputMode="append",
            timeMode="eventTime",
        )
    )

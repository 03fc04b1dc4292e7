"""Simulated transformWithStateInPandas state server (VERDICT r9 #6).

The real TWS runtime talks to the JVM state store over a
protobuf-framed socket (pyspark/sql/streaming/proto/StateMessage_pb2)
— the ``protobuf`` package is absent in this container, so the TWS
query cannot RUN here. The operator's VALUE, though, is the processor
class (streaming/pipelines.SessionProcessor): typed state variables,
per-key timers, event-time expiry. This module re-implements the
driver side of that contract in pure Python — the same
StatefulProcessorHandle surface (getValueState / registerTimer /
deleteTimer / listTimers) and the micro-batch replay loop
(handleInputRows per key per batch, then handleExpiredTimer for every
timer the advancing event-time watermark passes) — so the sessionizer
parity test EXECUTES the processor's behavior instead of skipping
(pipelines.py cites the runtime protocol; semantics follow the Spark 4
StatefulProcessor API, SPARK-46815).

Watermark semantics mirror availableNow event-time processing: input
batches are processed with the watermark computed from PRIOR batches'
data (first batch: no watermark), and a final empty batch fires the
timers the end-of-stream watermark has passed.

NOT a wire-protocol implementation: state lives in a dict, not the
JVM store — checkpoint/restore of TWS state stays runtime-gated on
protobuf (the one thing this harness cannot prove).
"""

from __future__ import annotations

from collections import defaultdict
from typing import Any, Iterator

import pandas as pd


class SimValueState:
    """pyspark.sql.streaming.stateful_processor.ValueState surface,
    scoped to the handle's CURRENT key like the real runtime."""

    def __init__(self, handle: "SimStatefulProcessorHandle", name: str):
        self._h = handle
        self._name = name

    def _slot(self) -> tuple:
        return (self._h._current_key, self._name)

    def exists(self) -> bool:
        return self._slot() in self._h._values

    def get(self):
        return self._h._values[self._slot()]

    def update(self, value) -> None:
        self._h._values[self._slot()] = tuple(value)

    def clear(self) -> None:
        self._h._values.pop(self._slot(), None)


class SimStatefulProcessorHandle:
    """StatefulProcessorHandle surface the SessionProcessor uses."""

    def __init__(self) -> None:
        self._values: dict[tuple, tuple] = {}
        self._timers: dict[tuple, set[int]] = defaultdict(set)
        self._current_key: tuple | None = None

    def getValueState(  # noqa: N802 (API name)
        self, name: str, schema, ttl_duration_ms: int | None = None
    ) -> SimValueState:
        return SimValueState(self, name)

    def registerTimer(self, expiry_ms: int) -> None:  # noqa: N802
        self._timers[self._current_key].add(int(expiry_ms))

    def deleteTimer(self, expiry_ms: int) -> None:  # noqa: N802
        self._timers[self._current_key].discard(int(expiry_ms))

    def listTimers(self) -> list[int]:  # noqa: N802
        return sorted(self._timers[self._current_key])


class _ExpiredTimerInfo:
    def __init__(self, expiry_ms: int):
        self._expiry_ms = expiry_ms

    def getExpiryTimeInMs(self) -> int:  # noqa: N802
        return self._expiry_ms


class SimTWSRuntime:
    """Micro-batch replay loop for one StatefulProcessor instance."""

    def __init__(self, processor) -> None:
        self.processor = processor
        self.handle = SimStatefulProcessorHandle()
        processor.init(self.handle)
        self._wm_ms: int | None = None  # watermark from PRIOR batches

    def _fire_expired(self, outs: list[pd.DataFrame]) -> None:
        if self._wm_ms is None:
            return
        for key in list(self.handle._timers):
            for t in sorted(self.handle._timers[key]):
                if t <= self._wm_ms:
                    self.handle._current_key = key
                    self.handle._timers[key].discard(t)
                    outs.extend(
                        self.processor.handleExpiredTimer(
                            key, None, _ExpiredTimerInfo(t)
                        )
                    )

    def process_batch(
        self,
        pdf: pd.DataFrame,
        key_cols: list[str],
        event_time_col: str,
        delay_ms: int,
    ) -> pd.DataFrame:
        """One input micro-batch: fire timers the watermark (from PRIOR
        batches) has passed, route rows per key through
        handleInputRows, then advance the watermark from this batch's
        max event time minus the delay."""
        outs: list[pd.DataFrame] = []
        self._fire_expired(outs)
        if len(pdf):
            for key, grp in pdf.groupby(key_cols, sort=True):
                kt = key if isinstance(key, tuple) else (key,)
                self.handle._current_key = kt
                outs.extend(
                    self.processor.handleInputRows(kt, iter([grp]), None)
                )
            batch_wm = int(pdf[event_time_col].max()) - delay_ms
            if self._wm_ms is None or batch_wm > self._wm_ms:
                self._wm_ms = batch_wm
        return (
            pd.concat(outs, ignore_index=True) if outs else pd.DataFrame()
        )

    def finish(self) -> pd.DataFrame:
        """End of stream (availableNow's trailing batch): fire
        everything the final watermark has passed."""
        outs: list[pd.DataFrame] = []
        self._fire_expired(outs)
        return (
            pd.concat(outs, ignore_index=True) if outs else pd.DataFrame()
        )


def run_sessionizer_sim(
    events: pd.DataFrame,
    n_batches: int = 1,
    delay_ms: int = 30 * 60 * 1000,
) -> pd.DataFrame:
    """Drive streaming/pipelines.SessionProcessor over ``events``
    (columns user_id, us [µs], value) split time-ordered into
    ``n_batches`` micro-batches, with a ``delay_ms`` watermark —
    mirroring stateful_sessionize_tws' 30-minute default. Returns the
    emitted closed sessions (user_id, session_start_ms, n, val_sum)."""
    from .pipelines import SessionProcessor

    ev = events.sort_values("us").reset_index(drop=True)
    ev = ev.assign(ms=(ev["us"] // 1000).astype("int64"))
    rt = SimTWSRuntime(SessionProcessor())
    outs = []
    n = len(ev)
    bounds = [round(i * n / n_batches) for i in range(n_batches + 1)]
    for i in range(n_batches):
        batch = ev.iloc[bounds[i]:bounds[i + 1]]
        outs.append(rt.process_batch(batch, ["user_id"], "ms", delay_ms))
    outs.append(rt.finish())
    res = pd.concat([o for o in outs if len(o)], ignore_index=True)
    return res

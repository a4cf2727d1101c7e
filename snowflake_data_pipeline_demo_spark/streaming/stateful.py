"""Custom stateful streaming operators (applyInPandasWithState).

``session_window`` (streaming/windows.py) covers gap sessions whose
output is count/min/max aggregates. When a session needs CUSTOM state
or emission logic — e.g. emit a closed session the moment its
successor arrives, carry running business state across batches — the
engine drops to Structured Streaming's arbitrary-state API.

Scale notes: state lives in the state store keyed by user — size is
(open sessions) x (3 longs), not history. Each micro-batch shuffles
only that batch's events on the group key; Arrow moves the per-group
batch into pandas. This is the documented pattern for custom stateful
operators; everything else in the engine stays JVM-side.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: (session_start_s, last_ts_s, n_events) — epoch seconds
_STATE_SCHEMA = T.StructType([
    T.StructField("session_start", T.LongType()),
    T.StructField("last_ts", T.LongType()),
    T.StructField("n_events", T.LongType()),
])

_OUTPUT_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("session_start", T.TimestampType()),
    T.StructField("session_end", T.TimestampType()),
    T.StructField("n_events", T.LongType()),
])


def stateful_sessionize(events: DataFrame, gap_minutes: int = 30,
                        ts_col: str = "ts",
                        user_col: str = "user_id") -> DataFrame:
    """Gap-sessionization with explicit per-user state: a session is
    emitted the moment it CLOSES — either its successor event arrives
    (> gap later) or the event-time timeout fires (watermark passed
    last_ts + gap). The final open session per user stays in state
    until one of those happens; emitted ``session_end`` is the last
    event's timestamp.

    Input may arrive across many micro-batches; state carries the open
    session between them. Late rows older than the watermark are
    dropped by the upstream ``withWatermark``."""
    gap_s = gap_minutes * 60

    def fn(key: tuple, pdfs: Iterable[pd.DataFrame],
           state: GroupState) -> Iterable[pd.DataFrame]:
        (user,) = key
        closed: list[tuple[int, int, int]] = []

        if state.hasTimedOut:
            if state.exists:
                s0, last, n = state.get
                closed.append((s0, last, n))
                state.remove()
        else:
            ts = sorted(
                int(t.timestamp())
                for pdf in pdfs
                for t in pdf[ts_col]
            )
            if ts:
                if state.exists:
                    s0, last, n = state.get
                else:
                    s0, last, n = ts[0], ts[0] - gap_s - 1, 0
                for t in ts:
                    if t - last > gap_s and n > 0:
                        closed.append((s0, last, n))
                        s0, n = t, 0
                    elif n == 0:
                        s0 = t
                    last = t
                    n += 1
                state.update((s0, last, n))
                # close the open session when the watermark passes its
                # gap horizon (epoch ms for the timeout API)
                state.setTimeoutTimestamp((last + gap_s) * 1000)

        if closed:
            yield pd.DataFrame({
                "user_id": [user] * len(closed),
                "session_start": [pd.Timestamp(s, unit="s") for s, _, _ in closed],
                "session_end": [pd.Timestamp(e, unit="s") for _, e, _ in closed],
                "n_events": [n for _, _, n in closed],
            })

    return (
        events.withWatermark(ts_col, f"{gap_minutes} minutes")
        .groupBy(user_col)
        .applyInPandasWithState(
            fn,
            outputStructType=_OUTPUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )

"""Custom stateful streaming operator via ``applyInPandasWithState``.

Gap-based sessionization of an event stream — the canonical custom
stateful op (and the shape of a streaming per-host crawl-rate tracker:
key = host instead of user, gap = politeness window).  State carried per
key across micro-batches: the currently-open session.  A session closes
when the next event for the key arrives more than ``gap_s`` after the
last one; closed sessions are emitted, the open tail stays in state.

Used with a file-source stream (``maxFilesPerTrigger=1``) the operator
provably carries state across batch boundaries — the test feeds the same
events in 4 time-ordered files and checks the closed sessions equal a
batch-mode window computation.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp,"
    " n_events long, sum_value double"
)
STATE_SCHEMA = "start long, last long, n long, s double"


def sessionize(events: DataFrame, gap_s: int = 1800) -> DataFrame:
    """events: streaming DF with (user_id, ts, value).  Emits CLOSED
    sessions (rows per key, in event-time order across batches)."""

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        rows = pd.concat(list(pdfs)).sort_values("ts")
        if state.exists:
            start, last, n, s = state.get
        else:
            start = last = None
            n, s = 0, 0.0
        out = []
        for ts, val in zip(rows["ts"], rows["value"]):
            t = int(pd.Timestamp(ts).value // 1_000)  # epoch µs, tz-safe
            if start is None:
                start, last, n, s = t, t, 1, float(val)
            elif t - last > gap_s * 1_000_000:
                out.append((key[0], start, last, n, s))
                start, last, n, s = t, t, 1, float(val)
            else:
                last, n, s = t, n + 1, s + float(val)
        state.update((start, last, n, s))
        if out:
            df = pd.DataFrame(out, columns=["user_id", "session_start",
                                            "session_end", "n_events",
                                            "sum_value"])
            df["session_start"] = pd.to_datetime(df["session_start"], unit="us")
            df["session_end"] = pd.to_datetime(df["session_end"], unit="us")
            yield df

    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )

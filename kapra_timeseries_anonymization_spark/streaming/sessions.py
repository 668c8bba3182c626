"""Custom stateful streaming operator: conversation sessionization via
``applyInPandasWithState``.

Closes a conversation "session" when no turn arrives for ``gap_sec``
(processing-time timeout). Emits one row per closed session:
(conv_id, session_seq, n_turns, first_ts, last_ts). This is the
harness for arbitrary per-key streaming state the built-in window
aggregates can't express (SURVEY §2.7: `applyInPandasWithState` for
custom stateful operators).

After a session closes, a `(seq+1, n_turns=0)` placeholder state survives
one more gap so a returning conversation continues the per-conv session
numbering (session_seq 2, 3, ...); a second silent gap removes the
placeholder, so state stays O(active convs), bounded by 2x the timeout. At 10^12-turn scale the state store shards by
conv_id across executors like any keyed state.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("session_seq", IntegerType()),
        StructField("n_turns", LongType()),
        StructField("first_ts", TimestampType()),
        StructField("last_ts", TimestampType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("session_seq", IntegerType()),
        StructField("n_turns", LongType()),
        StructField("first_us", LongType()),
        StructField("last_us", LongType()),
    ]
)


def _session_fn(gap_sec: int):
    gap_ms = gap_sec * 1000

    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (conv_id,) = key
        if state.hasTimedOut:
            seq, n, first_us, last_us = state.get
            if n == 0:
                # placeholder state (session already closed, no new turns
                # for another gap): forget the conversation entirely. Keeps
                # state O(active convs); a conv returning after 2x gap
                # restarts at seq=1 — documented trade-off for boundedness.
                state.remove()
                return
            # close the session but KEEP a (seq+1, 0, ...) placeholder so
            # the next burst of turns gets session_seq = seq + 1 instead of
            # restarting at 1 (n_turns == 0 means "no open session")
            state.update((seq + 1, 0, last_us, last_us))
            state.setTimeoutDuration(gap_ms)
            yield pd.DataFrame(
                {
                    "conv_id": [conv_id],
                    "session_seq": [seq],
                    "n_turns": [n],
                    "first_ts": [pd.Timestamp(first_us, unit="us")],
                    "last_ts": [pd.Timestamp(last_us, unit="us")],
                }
            )
            return
        batch = pd.concat(list(pdfs), ignore_index=True)
        # unit-safe: normalize to us regardless of the Arrow batch's
        # datetime64 resolution (ns in classic pandas, us possible)
        ts_us = batch["ts"].astype("datetime64[us]").astype("int64")
        if state.exists:
            seq, n, first_us, last_us = state.get
            if n == 0:
                # placeholder: previous session closed — open session `seq`
                first_us = last_us = int(ts_us.min())
        else:
            seq, n, first_us, last_us = 1, 0, int(ts_us.min()), int(ts_us.min())
        n += len(batch)
        first_us = min(first_us, int(ts_us.min()))
        last_us = max(last_us, int(ts_us.max()))
        state.update((seq, n, first_us, last_us))
        state.setTimeoutDuration(gap_ms)
        yield pd.DataFrame(
            columns=["conv_id", "session_seq", "n_turns", "first_ts", "last_ts"]
        )

    return fn


def sessionize_stream(stream: DataFrame, gap_sec: int = 1800) -> DataFrame:
    """Transcript stream -> closed-session rows (emitted on gap timeout)."""
    return stream.groupBy("conv_id").applyInPandasWithState(
        _session_fn(gap_sec),
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )

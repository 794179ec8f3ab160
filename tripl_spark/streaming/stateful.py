"""Custom stateful streaming operators (``applyInPandasWithState``).

The reference engine has no streaming at all (SURVEY.md §2.9); these
fill the category with operators the *built-in* streaming surface can't
express either:

* ``stateful_sessions`` — sessionization where a session closes on an
  inactivity gap OR an explicit terminator event type (e.g. logout).
  Native ``session_window`` only models the gap; the terminator rule
  needs per-key custom state.
* ``streaming_first_seen`` — exactly-once first-occurrence dedup by an
  arbitrary key across micro-batches: the streaming twin of
  ``operators/dedup.exact_dedup`` for a continuously-arriving corpus
  (keep the first document per fingerprint, drop all later copies).

Scale notes: state lives in the executor state store keyed by group —
per-key state is O(1) (a handful of scalars / one flag), so state size
is bounded by #distinct keys, not event volume. Arrow moves each
group's micro-batch rows to Python in one vectorized block, and
``EventTimeTimeout`` + watermark bound how long idle keys stay
resident. At 100 TB the same code runs unchanged: groups hash across
executors, and RocksDB state store handles key counts beyond heap.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("closed_by", T.StringType()),
    ]
)

# (session_start µs, last_ts µs, n_events, total_value)
_SESSION_STATE = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ]
)


def stateful_sessions(
    events: DataFrame,
    gap_seconds: int = 1800,
    close_types: tuple[str, ...] = ("logout",),
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-user sessions that close on a ``gap_seconds`` inactivity gap,
    on any event whose type is in ``close_types`` (the terminator event
    belongs to the session it closes), or on event-time timeout once the
    watermark passes the open session's horizon.

    ``events`` needs columns ``user_id, ts (timestamp), event_type,
    value``. Emits one row per CLOSED session (append mode).
    """
    gap_us = gap_seconds * 1_000_000

    def handle(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        out: list[tuple[Any, ...]] = []

        def emit(start_us: int, last_us: int, n: int, total: float, why: str) -> None:
            out.append(
                (
                    user_id,
                    pd.Timestamp(start_us, unit="us"),
                    pd.Timestamp(last_us, unit="us"),
                    n,
                    round(total, 2),
                    why,
                )
            )

        if state.hasTimedOut:
            if state.exists:
                emit(*state.get, "timeout")
                state.remove()
            yield pd.DataFrame(out, columns=SESSION_SCHEMA.names)
            return

        cur: tuple[int, int, int, float] | None = state.get if state.exists else None
        for pdf in pdfs:
            if pdf.empty:
                continue
            pdf = pdf.sort_values("ts", kind="stable")
            # normalize to µs whatever resolution Arrow handed pandas
            ts_us = pdf["ts"].astype("datetime64[us]").astype("int64")
            for t, etype, val in zip(ts_us, pdf["event_type"], pdf["value"]):
                v = float(val) if pd.notna(val) else 0.0
                if cur is not None and t - cur[1] > gap_us:
                    emit(*cur, "gap")
                    cur = None
                if cur is None:
                    cur = (int(t), int(t), 1, v)
                else:
                    cur = (cur[0], int(t), cur[2] + 1, cur[3] + v)
                if etype in close_types:
                    emit(*cur, "logout")
                    cur = None

        if cur is not None:
            state.update(cur)
            # flush via watermark once the gap horizon passes
            state.setTimeoutTimestamp(cur[1] // 1000 + gap_seconds * 1000)
        elif state.exists:
            state.remove()
        yield pd.DataFrame(out, columns=SESSION_SCHEMA.names)

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            handle,
            SESSION_SCHEMA,
            _SESSION_STATE,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


_SEEN_STATE = T.StructType([T.StructField("seen", T.BooleanType())])


def streaming_first_seen(df: DataFrame, key_col: str, payload_cols: list[str]) -> DataFrame:
    """Keep the FIRST row per ``key_col`` across the whole stream —
    exactly-once streaming dedup (state = one boolean per key).

    Within a micro-batch, "first" is the minimum of ``payload_cols``
    order after sorting — deterministic regardless of partition order.
    """
    out_schema = T.StructType(
        [df.schema[key_col]] + [df.schema[c] for c in payload_cols]
    )
    cols = [key_col] + payload_cols

    def handle(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            yield pd.DataFrame(columns=cols)
            return
        first: pd.DataFrame | None = None
        for pdf in pdfs:
            if pdf.empty:
                continue
            head = pdf.sort_values(payload_cols, kind="stable")[cols].head(1)
            if first is None or (
                head[payload_cols].iloc[0].tolist()
                < first[payload_cols].iloc[0].tolist()
            ):
                first = head
        if first is not None and not first.empty:
            state.update((True,))
            yield first
        else:
            yield pd.DataFrame(columns=cols)

    return df.groupBy(key_col).applyInPandasWithState(
        handle,
        out_schema,
        _SEEN_STATE,
        "append",
        GroupStateTimeout.NoTimeout,
    )

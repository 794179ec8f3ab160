"""Stream-stream joins: the streaming twin of ``operators.rangejoin``.

Structured Streaming can join two unbounded streams only because the
time-range predicate + watermarks BOUND THE STATE: each side buffers
rows only until the other side's watermark passes the end of the join
window, then evicts. Without the range condition the state store grows
forever; with it, state is O(events per window), independent of stream
age — the property that keeps a 100 TB/day pipeline alive.

The join shape mirrors ``range_join`` (error → follow-ups within an
hour): equi-key on user plus ``l.ts < r.ts <= l.ts + 1h``. Results are
emitted append-mode as pairs; ``tests/test_stream_join.py`` proves the
drained stream equals the batch bin-bucketed range join on the same
data — the batch and streaming operators implement one semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def error_followups_stream(
    events: DataFrame,
    window_seconds: int = 3600,
    watermark: str = "2 hours",
) -> DataFrame:
    """Pairs (error event, any later event by the same user within the
    window) from ONE events stream joined against itself. Both sides
    carry watermarks; the range condition lets the engine evict buffered
    errors once followups' watermark passes ts + window (and vice
    versa)."""
    errors = (
        events.select(
            F.col("user_id").alias("l_user"),
            F.col("ts").alias("l_ts"),
            F.col("event_type").alias("t1"),
        )
        .filter(F.col("t1") == "error")
        .withWatermark("l_ts", watermark)
    )
    followups = events.select(
        F.col("user_id").alias("r_user"),
        F.col("ts").alias("r_ts"),
        F.col("event_type").alias("t2"),
    ).withWatermark("r_ts", watermark)
    return errors.join(
        followups,
        (F.col("l_user") == F.col("r_user"))
        & (F.col("r_ts") > F.col("l_ts"))
        & (
            F.col("r_ts")
            <= F.col("l_ts") + F.make_dt_interval(secs=F.lit(window_seconds))
        ),
    ).select("l_user", "l_ts", "r_ts", "t1", "t2")

"""Stream-stream range join ≡ batch bin-bucketed range join."""

from __future__ import annotations

from pyspark.sql import functions as F

from tripl_spark.operators.rangejoin import range_join
from tripl_spark.session import load_table
from tripl_spark.streaming.events import read_events_stream, run_to_memory
from tripl_spark.streaming.joins import error_followups_stream


def test_stream_join_equals_batch_range_join(spark, sf_small):
    stream = read_events_stream(spark, sf_small)
    out = run_to_memory(
        error_followups_stream(stream), "stream_pairs", mode="append"
    )
    got = sorted(map(tuple, out.select("l_user", "l_ts", "r_ts", "t2").collect()))

    events = load_table(spark, sf_small, "events").select(
        "user_id", "ts", "event_type"
    )
    errors = events.filter(F.col("event_type") == "error")
    pairs = range_join(
        errors.withColumnRenamed("event_type", "t1"),
        events.withColumnRenamed("event_type", "t2"),
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        window_seconds=3600,
    )
    want = sorted(
        (r[0], r[1], r[2], r[3])
        for r in pairs.select(
            F.col("L.user_id"), F.col("L.ts"), F.col("R.ts"), "t2"
        ).collect()
    )
    assert got == want and len(got) > 0

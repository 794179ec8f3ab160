"""Correctness-gate queries that run the STREAMING engine.

``stateful_sessions_stream`` drives the custom
``applyInPandasWithState`` sessionizer (streaming/stateful.py) over the
events table and checks it against a plain-SQL sessionization oracle —
the gap-only configuration is SQL-expressible, so the custom stateful
operator gets a full DuckDB value-hash gate, not just a rows-only
check. A per-user flush sentinel (max ts + 1 day) forces every real
session closed, making the append-mode stream's output total.
"""

from __future__ import annotations

import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tripl_spark.queries.registry import query
from tripl_spark.session import load_table
from tripl_spark.streaming.events import run_to_memory
from tripl_spark.streaming.joins import error_followups_stream
from tripl_spark.streaming.stateful import stateful_sessions


@query(
    "stateful_sessions_stream",
    oracle="""
    WITH ev AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events
    ),
    flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                  THEN 1 ELSE 0 END AS new_s
      FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    sess AS (
      SELECT user_id, ts, value,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged
    )
    SELECT user_id,
           epoch_us(min(ts)) AS session_start_us,
           epoch_us(max(ts)) AS session_end_us,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 2) AS total_value
    FROM sess GROUP BY user_id, sid
    """,
)
def stateful_sessions_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the custom stateful streaming sessionizer end-to-end: events
    + per-user flush sentinels → file stream → applyInPandasWithState →
    closed sessions, compared value-for-value against batch-SQL
    sessionization."""
    events = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_type", "value"
    )
    flush = (
        events.groupBy("user_id")
        .agg((F.max("ts") + F.expr("INTERVAL 1 DAY")).alias("ts"))
        .select(
            "user_id", "ts", F.lit("flush").alias("event_type"),
            F.lit(0.0).alias("value"),
        )
    )
    staged = tempfile.mkdtemp(prefix="tripl_spark_sessions_")
    events.unionByName(flush).write.mode("overwrite").parquet(staged)

    stream = spark.readStream.schema(
        "user_id BIGINT, ts TIMESTAMP, event_type STRING, value DOUBLE"
    ).parquet(staged)
    closed = stateful_sessions(stream, gap_seconds=1800, close_types=())
    name = "sessions_" + uuid.uuid4().hex[:8]
    try:
        out = run_to_memory(closed, name, mode="append")
    finally:
        # results live in the memory sink once the drain returns; the
        # staged files are dead weight (repeated driver runs would
        # otherwise accumulate temp dirs)
        shutil.rmtree(staged, ignore_errors=True)
    return out.filter(F.col("closed_by") != "timeout").select(
        "user_id",
        F.unix_micros("session_start").alias("session_start_us"),
        F.unix_micros("session_end").alias("session_end_us"),
        "n_events",
        "total_value",
    )


@query(
    "stream_join_error_followups",
    oracle="""
    SELECT e1.event_type AS t1, e2.event_type AS t2,
           CAST(count(*) AS BIGINT) AS n_pairs
    FROM (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_type
          FROM events WHERE event_type = 'error') e1
    JOIN (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_type
          FROM events) e2
      ON e1.user_id = e2.user_id
     AND e2.ts > e1.ts
     AND e2.ts <= e1.ts + INTERVAL 1 HOUR
    GROUP BY t1, t2
    """,
)
def stream_join_error_followups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream range join under the value-hash gate:
    events restaged through the normalized batch loader (the pattern
    stateful_sessions_stream uses), streamed, self-joined with the
    time-range predicate (streaming/joins.py — state bounded by
    watermark + window), drained append-mode, then aggregated to the
    same (t1, t2, n_pairs) shape the batch range-join query emits. The
    oracle is DuckDB's native inequality join, so a dropped/duplicated
    pair at a watermark or bucket edge hash-mismatches."""
    events = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_type"
    )
    staged = tempfile.mkdtemp(prefix="tripl_spark_streamjoin_")
    events.write.mode("overwrite").parquet(staged)

    stream = spark.readStream.schema(
        "user_id BIGINT, ts TIMESTAMP, event_type STRING"
    ).parquet(staged)
    pairs = error_followups_stream(stream)
    name = "streamjoin_" + uuid.uuid4().hex[:8]
    try:
        out = run_to_memory(pairs, name, mode="append")
    finally:
        shutil.rmtree(staged, ignore_errors=True)
    return out.groupBy("t1", "t2").agg(F.count(F.lit(1)).alias("n_pairs"))

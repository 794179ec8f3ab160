"""Custom stateful streaming operators: gap+terminator sessionization
and cross-batch first-seen dedup (``applyInPandasWithState``)."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from tripl_spark.queries.registry import all_queries
from tripl_spark.session import load_table
from tripl_spark.streaming.events import run_to_memory
from tripl_spark.streaming.stateful import stateful_sessions, streaming_first_seen

EV_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _t(minute: int, hour: int = 9) -> dt.datetime:
    return dt.datetime(2024, 1, 1, hour, minute)


def _stream(spark, tmp_path, rows, name, **read_opts):
    path = str(tmp_path / name)
    spark.createDataFrame(rows, EV_SCHEMA).write.parquet(path)
    reader = spark.readStream.schema(EV_SCHEMA)
    for k, v in read_opts.items():
        reader = reader.option(k, v)
    return reader.parquet(path)


def test_sessions_close_on_gap_and_logout(spark, tmp_path):
    rows = [
        # user 1: 3 events, then >30min gap, then 2 events, then flush
        (1, _t(0), "click", 1.0),
        (1, _t(5), "view", 2.0),
        (1, _t(10), "click", 3.0),
        (1, _t(50), "view", 4.0),
        (1, _t(55), "click", 5.0),
        (1, _t(0, hour=20), "flush", 0.0),
        # user 2: logout mid-stream closes immediately (no gap needed)
        (2, _t(0), "click", 10.0),
        (2, _t(2), "logout", 0.0),
        (2, _t(4), "view", 7.0),
        (2, _t(0, hour=20), "flush", 0.0),
    ]
    out = run_to_memory(
        stateful_sessions(_stream(spark, tmp_path, rows, "ev"), gap_seconds=1800),
        "stateful_sessions_t1",
        mode="append",
    ).toPandas()
    # flush sentinels' own open sessions may or may not fire as timeout
    # emissions depending on whether the engine runs an extra watermark
    # batch — exclude them either way
    out = (
        out[out.closed_by != "timeout"]
        .sort_values(["user_id", "session_start"])
        .reset_index(drop=True)
    )

    u1 = out[out.user_id == 1]
    assert list(u1.n_events) == [3, 2]
    assert list(u1.total_value) == [6.0, 9.0]
    assert list(u1.closed_by) == ["gap", "gap"]
    assert u1.iloc[0].session_start == _t(0) and u1.iloc[0].session_end == _t(10)

    u2 = out[out.user_id == 2]
    # logout closes session 1 ON the logout event; view starts session 2
    assert list(u2.n_events) == [2, 1]
    assert list(u2.closed_by) == ["logout", "gap"]
    assert u2.iloc[0].session_end == _t(2)


def test_sessions_match_batch_sessionization(spark, tmp_path, sf_small):
    """Gap-only stateful sessions (flush-forced) == batch lag/cumsum count."""
    events = load_table(spark, sf_small, "events").select(
        "user_id", "ts", "event_type", "value"
    )
    flush = events.groupBy("user_id").agg(
        (F.max("ts") + F.expr("INTERVAL 1 DAY")).alias("ts")
    ).select("user_id", "ts", F.lit("flush").alias("event_type"), F.lit(0.0).alias("value"))
    rows = events.unionByName(flush).collect()

    out = run_to_memory(
        stateful_sessions(
            _stream(spark, tmp_path, rows, "ev_real"), gap_seconds=1800, close_types=()
        ),
        "stateful_sessions_t2",
        mode="append",
    ).toPandas()
    out = out[out.closed_by != "timeout"]
    # every real session got closed by the flush event's gap; the flush
    # events' own 1-event sessions stay open (or fire as timeout rows,
    # excluded above) — emitted gap-closed sessions are exactly the
    # batch sessionization's sessions
    per_user = out.groupby("user_id").size().sort_index()
    batch = all_queries()["events_sessionization"](spark, sf_small).toPandas()
    batch_counts = batch.set_index("user_id")["n_sessions"].sort_index()
    assert (per_user == batch_counts).all()
    # and the event totals agree too: all real events are in closed sessions
    assert out.n_events.sum() == batch.n_events.sum()


def test_first_seen_dedup_across_batches(spark, tmp_path):
    schema = T.StructType(
        [
            T.StructField("fp", T.StringType()),
            T.StructField("doc_id", T.LongType()),
            T.StructField("body", T.StringType()),
        ]
    )
    b1 = [("a", 2, "a-second"), ("a", 1, "a-first"), ("b", 5, "b-only")]
    b2 = [("a", 0, "a-late-smaller"), ("c", 7, "c-new")]
    path = str(tmp_path / "docs")
    # two files → two micro-batches via maxFilesPerTrigger=1
    spark.createDataFrame(b1, schema).coalesce(1).write.mode("append").parquet(path)
    spark.createDataFrame(b2, schema).coalesce(1).write.mode("append").parquet(path)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(path)
    )
    out = run_to_memory(
        streaming_first_seen(stream, "fp", ["doc_id", "body"]),
        "first_seen_t1",
        mode="append",
    ).toPandas().set_index("fp").sort_index()

    assert list(out.index) == ["a", "b", "c"]
    # within a batch the smallest payload wins; across batches FIRST SEEN
    # wins even if a later batch has a smaller payload ("a", 0 dropped)
    assert out.loc["a", "doc_id"] in (0, 1)
    if out.loc["a", "doc_id"] == 1:
        assert out.loc["a", "body"] == "a-first"
    assert out.loc["b", "doc_id"] == 5
    assert out.loc["c", "doc_id"] == 7

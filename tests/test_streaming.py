"""Structured Streaming tests: the streaming pipeline must agree exactly
with its batch twin, sessions must respect the gap, and the streaming
triple-ingest must produce valid facts rows."""

from __future__ import annotations

import pandas as pd

from tripl_spark.queries.registry import all_queries
from tripl_spark.streaming.events import (
    hourly_counts,
    read_events_stream,
    run_to_memory,
    session_aggregates,
    sliding_counts,
    stream_facts,
)


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    return pdf.sort_values(by=list(pdf.columns), kind="mergesort").reset_index(drop=True)


def test_streaming_hourly_equals_batch(spark, sf_small):
    stream = read_events_stream(spark, sf_small)
    streamed = run_to_memory(hourly_counts(stream), "hourly_stream").toPandas()
    batch = all_queries()["events_hourly_tumbling"](spark, sf_small).toPandas()
    pd.testing.assert_frame_equal(_canon(streamed), _canon(batch))


def test_streaming_sliding_equals_batch(spark, sf_small):
    stream = read_events_stream(spark, sf_small)
    streamed = run_to_memory(sliding_counts(stream), "sliding_stream").toPandas()
    batch = all_queries()["events_sliding_hourly"](spark, sf_small).toPandas()
    pd.testing.assert_frame_equal(_canon(streamed), _canon(batch))


def test_session_windows(spark, sf_small):
    stream = read_events_stream(spark, sf_small)
    sessions = run_to_memory(session_aggregates(stream), "sessions_stream").toPandas()
    assert len(sessions) > 0
    assert (sessions.session_start <= sessions.session_end).all()
    # session count per user must match the batch lag/cumsum sessionization
    batch = all_queries()["events_sessionization"](spark, sf_small).toPandas()
    per_user = sessions.groupby("user_id").size().sort_index()
    batch_counts = batch.set_index("user_id")["n_sessions"].sort_index()
    assert (per_user == batch_counts).all()


def test_stream_facts_ingest(spark, sf_small):
    stream = read_events_stream(spark, sf_small)
    facts = run_to_memory(stream_facts(stream), "facts_stream", mode="append")
    pdf = facts.toPandas()
    n_events = pdf[pdf.a == "db:ident"].shape[0]
    assert n_events > 0
    assert set(pdf.a.unique()) == {
        "db:ident", "event:user", "event:type", "event:value", "event:ts"
    }
    assert len(pdf) == n_events * 5
    # ref values are well-formed eids
    refs = pdf[pdf.a == "event:user"].v_str
    assert refs.str.startswith("user-").all()

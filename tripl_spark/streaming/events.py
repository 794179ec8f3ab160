"""Structured Streaming over the events table.

The reference is a synchronous in-memory store — no streaming exists
there (SURVEY.md §2.9); this module supplies the category Spark-native:

* ``read_events_stream`` — file-source stream of the events parquet
  (swap ``.format("kafka")`` in production; everything downstream is
  identical).
* ``hourly_counts`` — watermarked tumbling-window aggregation. Shares
  its transformation shape with the batch query
  ``events_hourly_tumbling`` so batch and stream provably agree
  (tests/test_streaming.py asserts exact equality).
* ``session_aggregates`` — native ``session_window`` (30-min gap), the
  streaming twin of the batch lag/cumsum sessionization.
* ``stream_facts`` — events melted to EAV triples on the fly: the
  streaming ingest path of the triple store (append-only micro-batches
  with a ``t`` stamp — the same write model the batch store uses).

Scale notes: watermarks bound state (late events beyond 2h are
dropped); window+key grouping shuffles once per trigger; file listing
is the local stand-in for Kafka partition assignment. Memory sinks are
test-only — production writes parquet/Delta via ``foreachBatch`` for
exactly-once.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream of events with µs-normalized timestamps.

    Streaming sources require an explicit schema, but the testdata's
    ``ts`` encoding varies by vintage (TIMESTAMP(NANOS) → bigint under
    the legacy nanosAsLong read; TIMESTAMP(MICROS) → timestamp_ntz).
    Probe once with a cheap batch read (footer-only — no data scan) and
    apply the SAME normalization branch as the batch loader
    (session.py load_table), so stream and batch provably agree.
    """
    key = "spark.sql.legacy.parquet.nanosAsLong"
    if spark.conf.get(key, None) != "true":  # idempotent, like load_table
        spark.conf.set(key, "true")
    probe = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    ts_type = dict(probe.dtypes).get("ts")
    raw = (
        spark.readStream.schema(probe.schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if ts_type == "bigint":  # nanos vintage: ns → µs
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":  # micros vintage: NTZ → session-TZ timestamp
        raw = raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return raw


def hourly_counts(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling 1-hour window counts per event type."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sliding_counts(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Watermarked SLIDING window (1 hour / 15-minute slide) counts per
    event type — the streaming twin of the batch ``events_sliding_hourly``
    query; each event lands in exactly 4 overlapping windows, carried
    through the watermark as the same Expand fan-out the batch plan
    uses."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def session_aggregates(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Native session windows: per-user sessions closed after `gap` of
    inactivity (streaming equivalent of the batch lag/cumsum query)."""
    return (
        events.withWatermark("ts", "2 hours")
        .groupBy(F.session_window("ts", gap).alias("sw"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            "user_id",
            F.date_format("sw.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format("sw.end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def stream_facts(events: DataFrame) -> DataFrame:
    """Melt the event stream into EAV facts rows (streaming triple
    ingest): one micro-batch = one transaction, ``t`` = event ts µs."""
    e = F.concat(F.lit("event-"), F.col("event_id").cast("string"))
    t = F.unix_micros("ts")
    null_n = F.lit(None).cast("double")
    null_b = F.lit(None).cast("boolean")

    def kv(a: str, vtype: str, v_str, v_num, v_bool):
        return F.struct(
            F.lit(a).alias("a"), F.lit(vtype).alias("vtype"),
            v_str.cast("string").alias("v_str"), v_num.cast("double").alias("v_num"),
            v_bool.cast("boolean").alias("v_bool"),
        )

    structs = F.array(
        kv("db:ident", "str", e, null_n, null_b),
        kv("event:user", "ref",
           F.concat(F.lit("user-"), F.col("user_id").cast("string")), null_n, null_b),
        kv("event:type", "str", F.col("event_type"), null_n, null_b),
        kv("event:value", "float", F.lit(None).cast("string"), F.col("value"), null_b),
        kv("event:ts", "str", F.date_format("ts", "yyyy-MM-dd HH:mm:ss"), null_n, null_b),
    )
    return events.select(e.alias("e"), F.explode(structs).alias("kv"), t.alias("t")).select(
        "e", "kv.*", "t"
    )


def run_to_memory(stream_df: DataFrame, name: str, mode: str = "complete") -> DataFrame:
    """Drive a streaming frame to completion against a memory sink
    (test/smoke harness: processAllAvailable → stop → return the table).
    Use mode="complete" for aggregations (append would hold back windows
    the watermark hasn't closed when the finite source drains) and
    mode="append" for row-level streams."""
    q = (
        stream_df.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return stream_df.sparkSession.sql(f"SELECT * FROM {name}")

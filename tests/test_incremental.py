"""Incremental rollup maintenance ≡ one-shot batch rollup, for any
micro-batch split of the log, including via a real foreachBatch stream."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tripl_spark.queries.registry import REGISTRY, _ensure_loaded
from tripl_spark.session import load_table
from tripl_spark.streaming.incremental import IncrementalRollup

_ensure_loaded()


def _batch_daily(spark, sf):
    return REGISTRY["hypertable_rollup_daily"].fn(spark, sf)


def _sorted_rows(df):
    return sorted(map(tuple, df.collect()))


def test_any_split_converges_to_batch_result(spark, sf_small):
    events = load_table(spark, sf_small, "events")
    rollup = IncrementalRollup(spark)
    for i in range(3):  # arbitrary 3-way partition of the log
        rollup.upsert(events.filter(F.col("event_id") % 3 == i), batch_id=i)
    assert _sorted_rows(rollup.daily()) == _sorted_rows(_batch_daily(spark, sf_small))


def test_batch_replay_is_idempotent(spark, sf_small):
    events = load_table(spark, sf_small, "events")
    rollup = IncrementalRollup(spark)
    rollup.upsert(events, batch_id=0)
    before = _sorted_rows(rollup.daily())
    rollup.upsert(events, batch_id=0)  # failure-recovery replay
    assert _sorted_rows(rollup.daily()) == before


def test_foreachbatch_stream_maintains_layer(spark, sf_small, tmp_path):
    events = load_table(spark, sf_small, "events")
    src = str(tmp_path / "stream_src")
    for i in range(3):  # three files → three micro-batches
        events.filter(F.col("event_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    stream = spark.readStream.schema(events.schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(src)
    rollup = IncrementalRollup(spark)
    q = (
        stream.writeStream.foreachBatch(rollup.upsert)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(timeout=120)
    assert not q.isActive
    assert _sorted_rows(rollup.daily()) == _sorted_rows(_batch_daily(spark, sf_small))

"""Streaming incremental dedup ≡ one-shot batch shard matching, for any
micro-batch split, including via a real foreachBatch stream."""

from __future__ import annotations

from pyspark.sql import functions as F

from tripl_spark.operators.dedup import minhash_match_new
from tripl_spark.session import load_table
from tripl_spark.streaming.dedup_stream import StreamingDedup


def _split(spark, sf):
    docs = load_table(spark, sf, "documents")
    return docs.filter(F.col("doc_id") < 400), docs.filter(F.col("doc_id") >= 400)


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_any_split_converges_to_batch_result(spark, sf_small):
    corpus, shard = _split(spark, sf_small)
    sd = StreamingDedup(spark, corpus)
    for i in range(3):
        sd.process(shard.filter(F.col("doc_id") % 3 == i), batch_id=i)
    assert sd.matches is not None
    assert _rows(sd.matches) == _rows(minhash_match_new(corpus, shard))


def test_replay_is_idempotent(spark, sf_small):
    corpus, shard = _split(spark, sf_small)
    sd = StreamingDedup(spark, corpus)
    sd.process(shard, batch_id=0)
    before = _rows(sd.matches)
    sd.process(shard, batch_id=0)  # failure-recovery replay
    assert _rows(sd.matches) == before


def test_foreachbatch_stream_matches_batch(spark, sf_small, tmp_path):
    corpus, shard = _split(spark, sf_small)
    src = str(tmp_path / "doc_stream")
    for i in range(3):
        shard.filter(F.col("doc_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    stream = spark.readStream.schema(shard.schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(src)
    sd = StreamingDedup(spark, corpus)
    q = (
        stream.writeStream.foreachBatch(sd.process)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(timeout=120)
    assert not q.isActive
    assert _rows(sd.matches) == _rows(minhash_match_new(corpus, shard))

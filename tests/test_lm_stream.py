"""Streaming bigram-LM maintenance: any micro-batch split converges to
the one-shot corpus counts; scoring under the accumulated LM equals the
batch operator; replays are idempotent and failed batches replayable."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tripl_spark.operators.text import bigram_logprob_scores
from tripl_spark.session import load_table
from tripl_spark.streaming.lm_stream import StreamingBigramLM


def _counts(df, key):
    return {r[key]: r[1] for r in df.collect()}


def test_any_split_converges_to_batch_counts(spark, sf_small):
    docs = load_table(spark, sf_small, "documents")
    lm = StreamingBigramLM(spark)
    for i in range(3):
        lm.process(docs.filter(F.col("doc_id") % 3 == i), batch_id=i)

    one = StreamingBigramLM(spark)
    one.process(docs, batch_id=0)
    assert _counts(lm.c1, "term") == _counts(one.c1, "term")
    assert _counts(lm.c2, "bg") == _counts(one.c2, "bg")


def test_streamed_scores_match_batch_operator(spark, sf_small):
    """After the whole corpus has streamed through, score() under the
    accumulated counts equals the one-shot batch LM scoring."""
    docs = load_table(spark, sf_small, "documents")
    lm = StreamingBigramLM(spark)
    for i in range(3):
        lm.process(docs.filter(F.col("doc_id") % 3 == i), batch_id=i)
    streamed = {
        (r.doc_id): (r.n_bigrams, r.avg_logprob) for r in lm.score(docs).collect()
    }
    batch = {
        (r.doc_id): (r.n_bigrams, r.avg_logprob)
        for r in bigram_logprob_scores(docs).collect()
    }
    assert streamed == batch and len(batch) > 0


def test_replay_is_idempotent_and_failure_replayable(spark, sf_small):
    docs = load_table(spark, sf_small, "documents")
    lm = StreamingBigramLM(spark)
    # a malformed batch fails before any state commit -> not seen
    with pytest.raises(Exception):
        lm.process(docs.select("doc_id"), batch_id=0)
    assert 0 not in lm._seen
    lm.process(docs.filter(F.col("doc_id") < 100), batch_id=0)
    before = _counts(lm.c1, "term")
    lm.process(docs.filter(F.col("doc_id") < 100), batch_id=0)  # replay
    assert _counts(lm.c1, "term") == before


def test_unseen_text_scores_under_smoothing(spark, sf_small):
    """Novel terms at score time fall back to the add-k mass instead of
    failing or skewing to NULL."""
    docs = load_table(spark, sf_small, "documents")
    lm = StreamingBigramLM(spark)
    lm.process(docs, batch_id=0)
    novel = spark.createDataFrame(
        [(999_999, "zzqx wvvk zzqx")], "doc_id long, text string"
    )
    out = lm.score(novel).collect()
    assert len(out) == 1 and out[0].n_bigrams == 2
    assert out[0].avg_logprob is not None and out[0].avg_logprob < 0


def test_lm_real_stream_matches_oneshot(spark, sf_small, tmp_path):
    """Same convergence contract through a real availableNow parquet
    stream + foreachBatch, not direct process() calls."""
    docs = load_table(spark, sf_small, "documents").select("doc_id", "text")
    src = str(tmp_path / "doc_stream")
    for i in range(3):
        docs.filter(F.col("doc_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    lm = StreamingBigramLM(spark)
    stream = spark.readStream.schema(docs.schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(src)
    q = (
        stream.writeStream.foreachBatch(lm.process)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination()
    one = StreamingBigramLM(spark)
    one.process(docs, batch_id=0)
    assert _counts(lm.c1, "term") == _counts(one.c1, "term")
    assert _counts(lm.c2, "bg") == _counts(one.c2, "bg")

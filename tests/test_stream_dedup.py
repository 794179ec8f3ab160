"""Streaming incremental dedup ≡ one-shot batch shard matching, for any
micro-batch split, including via a real foreachBatch stream."""

from __future__ import annotations

import pytest
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


def test_sink_backed_mode_survives_driver_restart(spark, sf_small, tmp_path):
    # restart-safe exactly-once: a NEW StreamingDedup over the same sink
    # (simulated driver restart) skips replayed batches, keeps the prior
    # batches' matches, and converges to the one-shot result
    corpus, shard = _split(spark, sf_small)
    sink = str(tmp_path / "match_sink")
    sd1 = StreamingDedup(spark, corpus, sink_path=sink)
    sd1.process(shard.filter(F.col("doc_id") % 3 == 0), batch_id=0)
    sd1.process(shard.filter(F.col("doc_id") % 3 == 1), batch_id=1)

    # driver restart: fresh object, same sink; checkpoint replays batch 1
    sd2 = StreamingDedup(spark, corpus, sink_path=sink)
    assert sd2._seen == {0, 1}  # recovered from sink partitions
    sd2.process(shard.filter(F.col("doc_id") % 3 == 1), batch_id=1)  # replay
    sd2.process(shard.filter(F.col("doc_id") % 3 == 2), batch_id=2)  # new
    assert _rows(sd2.matches_df()) == _rows(minhash_match_new(corpus, shard))

    # an unseen-set replay (forced reprocess) still converges: partition
    # overwrite rewrites batch_id=2 with identical content
    sd3 = StreamingDedup(spark, corpus, sink_path=sink)
    sd3._seen.discard(2)
    sd3.process(shard.filter(F.col("doc_id") % 3 == 2), batch_id=2)
    assert _rows(sd3.matches_df()) == _rows(minhash_match_new(corpus, shard))


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


def test_streaming_semantic_any_split_equals_oneshot(spark, sf_small):
    """Any micro-batch split of the embedding increment accumulates the
    same matches as one-shot semantic_match_new; replays are skipped."""
    from pyspark.sql import functions as F

    from tripl_spark.operators.clustering import semantic_match_new
    from tripl_spark.session import load_table
    from tripl_spark.streaming.semantic_stream import StreamingSemanticDedup

    emb = load_table(spark, sf_small, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    corpus = emb.filter(F.col("vec_id") % 7 != 0)
    shard = emb.filter(F.col("vec_id") % 7 == 0)
    sd = StreamingSemanticDedup(spark, corpus)
    for i in range(3):
        sd.process(shard.filter(F.col("vec_id") % 3 == i), batch_id=i)
    streamed = {
        (r.new_id, r.corpus_id): (r.cid, r.cosine) for r in sd.matches.collect()
    }
    oneshot = {
        (r.new_id, r.corpus_id): (r.cid, r.cosine)
        for r in semantic_match_new(shard, sd.index, sd.cent).collect()
    }
    assert streamed == oneshot and len(oneshot) > 0
    before = dict(streamed)
    sd.process(shard.filter(F.col("vec_id") % 3 == 0), batch_id=0)  # replay
    assert {
        (r.new_id, r.corpus_id): (r.cid, r.cosine) for r in sd.matches.collect()
    } == before


def test_streaming_semantic_real_stream_matches_oneshot(spark, sf_small, tmp_path):
    """Same contract through a real availableNow parquet stream +
    foreachBatch, not direct process() calls."""
    from pyspark.sql import functions as F

    from tripl_spark.operators.clustering import semantic_match_new
    from tripl_spark.session import load_table
    from tripl_spark.streaming.semantic_stream import StreamingSemanticDedup

    emb = load_table(spark, sf_small, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    corpus = emb.filter(F.col("vec_id") % 7 != 0)
    shard = emb.filter(F.col("vec_id") % 7 == 0)
    src = str(tmp_path / "emb_stream")
    for i in range(3):
        shard.filter(F.col("vec_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    sd = StreamingSemanticDedup(spark, corpus)
    stream = spark.readStream.schema(shard.schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(src)
    q = (
        stream.writeStream.foreachBatch(sd.process)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination()
    streamed = {
        (r.new_id, r.corpus_id): r.cosine for r in sd.matches.collect()
    }
    oneshot = {
        (r.new_id, r.corpus_id): r.cosine
        for r in semantic_match_new(shard, sd.index, sd.cent).collect()
    }
    assert streamed == oneshot and len(oneshot) > 0


def test_sink_mode_committed_only_semantics(spark, sf_small, tmp_path):
    """The committed-only invariant end to end: all-empty committed
    partitions yield a TYPED empty frame; an uncommitted (marker-less)
    partition is neither recovered as seen nor read into results."""
    import os
    import shutil

    from pyspark.sql import functions as F

    from tripl_spark.session import load_table
    from tripl_spark.streaming.dedup_stream import StreamingDedup

    docs = load_table(spark, sf_small, "documents")
    corpus = docs.filter(F.col("doc_id") < 100)
    sink = str(tmp_path / "sink")
    sd = StreamingDedup(spark, corpus, sink_path=sink)
    # a batch with no near-dups vs the corpus: empty committed partition
    no_dups = docs.filter(F.col("doc_id") == 499).withColumn(
        "doc_id", F.col("doc_id") + 100000
    )
    sd.process(no_dups, batch_id=0)
    out = sd.matches_df()
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["id_a", "id_b", "jaccard"]
    assert dict(out.dtypes)["id_a"] == dict(corpus.dtypes)["doc_id"]

    # a real match commits alongside
    dup = corpus.filter(F.col("doc_id") == 5).withColumn(
        "doc_id", F.col("doc_id") + 200000
    )
    sd.process(dup, batch_id=1)
    assert sd.matches_df().count() >= 1

    # fabricate a crashed half-write: partition dir without _SUCCESS
    crashed = os.path.join(sink, "batch_id=9")
    os.makedirs(crashed)
    shutil.copy(
        next(
            os.path.join(sink, "batch_id=1", f)
            for f in os.listdir(os.path.join(sink, "batch_id=1"))
            if f.endswith(".parquet")
        ),
        os.path.join(crashed, "part-stale.parquet"),
    )
    n_before = sd.matches_df().count()
    sd2 = StreamingDedup(spark, corpus, sink_path=sink)  # driver restart
    assert 9 not in sd2._seen  # not recovered as processed...
    assert sd2.matches_df().count() == n_before  # ...and not read


def test_streaming_semantic_failed_batch_is_replayable(spark, sf_small):
    """The ADVICE-r5 invariant: a batch is marked seen only AFTER its
    results commit, so a batch whose processing FAILED mid-computation
    can be replayed into the same object and its matches are not lost."""
    from pyspark.sql import functions as F

    from tripl_spark.session import load_table
    from tripl_spark.streaming.semantic_stream import StreamingSemanticDedup

    emb = load_table(spark, sf_small, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    corpus = emb.filter(F.col("vec_id") % 7 != 0)
    shard = emb.filter(F.col("vec_id") % 7 == 0)
    sd = StreamingSemanticDedup(spark, corpus)
    # a malformed batch (missing the vector column) fails inside
    # process() before any state commit ...
    bad = shard.select("vec_id")
    with pytest.raises(Exception):
        sd.process(bad, batch_id=0)
    assert 0 not in sd._seen  # ... so the batch is NOT marked seen
    # ... and the engine's replay of the same batch_id then lands
    sd.process(shard, batch_id=0)
    assert 0 in sd._seen
    assert sd.matches is not None and sd.matches.count() > 0


def test_streaming_semantic_sink_mode_survives_driver_restart(
    spark, sf_small, tmp_path
):
    """Kill-and-resume for the semantic stream: a NEW
    StreamingSemanticDedup over the same sink skips replayed batches,
    keeps prior batches' matches, and converges to the one-shot
    semantic_match_new of the whole increment."""
    from tripl_spark.operators.clustering import semantic_match_new
    from tripl_spark.streaming.semantic_stream import StreamingSemanticDedup

    emb = load_table(spark, sf_small, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    corpus = emb.filter(F.col("vec_id") % 7 != 0)
    shard = emb.filter(F.col("vec_id") % 7 == 0)
    sink = str(tmp_path / "sem_sink")

    sd1 = StreamingSemanticDedup(spark, corpus, sink_path=sink)
    sd1.process(shard.filter(F.col("vec_id") % 3 == 0), batch_id=0)
    sd1.process(shard.filter(F.col("vec_id") % 3 == 1), batch_id=1)

    # driver restart: fresh object, same sink; checkpoint replays batch 1
    sd2 = StreamingSemanticDedup(spark, corpus, sink_path=sink)
    assert sd2._seen == {0, 1}  # recovered from committed partitions
    sd2.process(shard.filter(F.col("vec_id") % 3 == 1), batch_id=1)  # replay
    sd2.process(shard.filter(F.col("vec_id") % 3 == 2), batch_id=2)  # new
    got = _rows(sd2.matches_df())
    want = _rows(semantic_match_new(shard, sd2.index, sd2.cent, sd2.threshold))
    assert got == want and len(want) > 0

    # forced unseen replay still converges: partition overwrite rewrites
    # batch_id=2 with identical content
    sd3 = StreamingSemanticDedup(spark, corpus, sink_path=sink)
    sd3._seen.discard(2)
    sd3.process(shard.filter(F.col("vec_id") % 3 == 2), batch_id=2)
    assert _rows(sd3.matches_df()) == want

"""Streaming sketch maintenance ≡ one-shot batch sketches, for any
micro-batch split, including via a real foreachBatch stream."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tripl_spark.operators.sketches import countmin_table, hll_registers
from tripl_spark.session import load_table
from tripl_spark.streaming.sketch_stream import StreamingSketches, _tokens


def _cm_map(df):
    return {(r.row, r.cell): r.n for r in df.collect()}


def _hll_map(df):
    return {r.register: r.max_rho for r in df.collect()}


def _docs(spark, sf):
    return load_table(spark, sf, "documents")


def test_any_split_converges_to_batch_sketches(spark, sf_small):
    docs = _docs(spark, sf_small)
    sk = StreamingSketches(spark)
    for i in range(3):
        sk.process(docs.filter(F.col("doc_id") % 3 == i), batch_id=i)
    toks = _tokens(docs, "text")
    assert _cm_map(sk.cm) == _cm_map(countmin_table(toks))
    assert _hll_map(sk.hll) == _hll_map(hll_registers(toks))


def test_replay_is_idempotent(spark, sf_small):
    docs = _docs(spark, sf_small)
    sk = StreamingSketches(spark)
    sk.process(docs, batch_id=0)
    before = _cm_map(sk.cm), _hll_map(sk.hll)
    sk.process(docs, batch_id=0)  # failure-recovery replay
    assert (_cm_map(sk.cm), _hll_map(sk.hll)) == before


def test_foreachbatch_stream_matches_batch(spark, sf_small, tmp_path):
    docs = _docs(spark, sf_small)
    src = str(tmp_path / "doc_stream")
    for i in range(3):
        docs.filter(F.col("doc_id") % 3 == i).select("doc_id", "text").coalesce(
            1
        ).write.mode("append").parquet(src)
    schema = docs.select("doc_id", "text").schema
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(src)
    sk = StreamingSketches(spark)
    q = (
        stream.writeStream.foreachBatch(sk.process)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(timeout=120)
    assert not q.isActive
    toks = _tokens(docs, "text")
    assert _cm_map(sk.cm) == _cm_map(countmin_table(toks))
    assert _hll_map(sk.hll) == _hll_map(hll_registers(toks))


def test_streaming_heavy_hitters_bounds_and_top_exactness(spark, sf_small):
    """Streamed heavy-hitter estimates are lower bounds of the true
    counts, exact on the head of the distribution, and replay-
    idempotent; state stays bounded at shards x state_k rows."""
    from tripl_spark.operators.sketches import (
        HH_LOCAL_K,
        HH_SHARDS,
        _shard_of,
        heavy_hitter_merge,
        heavy_hitter_summaries,
    )
    from tripl_spark.streaming.sketch_stream import StreamingHeavyHitters

    docs = _docs(spark, sf_small).select("doc_id", "text")
    hh = StreamingHeavyHitters(spark)
    for i in range(3):
        hh.process(docs.filter(F.col("doc_id") % 3 == i), batch_id=i)
    assert hh.state.count() <= HH_SHARDS * hh.state_k

    streamed = {r.term: r.hh_estimate for r in hh.heavy_hitters().collect()}

    toks = docs.select(
        _shard_of(F.col("doc_id")).alias("shard"),
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("term"),
    )
    truth = {
        r.term: r.c
        for r in toks.groupBy("term").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    oneshot = {
        r.term: r.hh_estimate
        for r in heavy_hitter_merge(heavy_hitter_summaries(toks)).collect()
    }
    for term, est in streamed.items():
        assert est <= truth[term], term  # lower bound always
    # the head of the distribution never leaves any shard's state, so
    # the streamed estimate must equal the one-shot summary estimate
    top = sorted(oneshot, key=lambda t: (-oneshot[t], t))[:10]
    for term in top:
        assert streamed.get(term) == oneshot[term], term

    # replay idempotence
    before = dict(streamed)
    hh.process(docs.filter(F.col("doc_id") % 3 == 0), batch_id=0)
    after = {r.term: r.hh_estimate for r in hh.heavy_hitters().collect()}
    assert after == before


def test_streaming_heavy_hitters_failed_batch_is_replayable(spark, sf_small):
    """Same ADVICE-r5 invariant as the semantic stream: a batch whose
    processing failed is not marked seen, so its replay is processed
    rather than silently skipped (which would lose its counts)."""
    from tripl_spark.session import load_table
    from tripl_spark.streaming.sketch_stream import StreamingHeavyHitters

    docs = load_table(spark, sf_small, "documents")
    hh = StreamingHeavyHitters(spark)
    bad = docs.select("doc_id")  # no text column -> fails in process()
    with pytest.raises(Exception):
        hh.process(bad, batch_id=0)
    assert 0 not in hh._seen
    hh.process(docs, batch_id=0)
    assert 0 in hh._seen
    assert hh.state is not None and hh.state.count() > 0


def test_streaming_heavy_hitters_sink_mode_survives_driver_restart(
    spark, sf_small, tmp_path
):
    """Kill-and-resume: a NEW StreamingHeavyHitters over the same sink
    resumes from the last committed state snapshot, skips replayed
    batches, and converges to the same estimates as an uninterrupted
    run."""
    from tripl_spark.streaming.sketch_stream import StreamingHeavyHitters

    docs = _docs(spark, sf_small).select("doc_id", "text")
    sink = str(tmp_path / "hh_sink")

    hh1 = StreamingHeavyHitters(spark, sink_path=sink)
    hh1.process(docs.filter(F.col("doc_id") % 3 == 0), batch_id=0)
    hh1.process(docs.filter(F.col("doc_id") % 3 == 1), batch_id=1)

    # driver restart: fresh object, same sink; checkpoint replays batch 1
    hh2 = StreamingHeavyHitters(spark, sink_path=sink)
    assert hh2._seen == {0, 1}  # recovered from committed partitions
    assert hh2.state is not None
    hh2.process(docs.filter(F.col("doc_id") % 3 == 1), batch_id=1)  # replay
    hh2.process(docs.filter(F.col("doc_id") % 3 == 2), batch_id=2)  # new

    # uninterrupted reference run (in-memory mode)
    ref = StreamingHeavyHitters(spark)
    for i in range(3):
        ref.process(docs.filter(F.col("doc_id") % 3 == i), batch_id=i)
    got = {r.term: r.hh_estimate for r in hh2.heavy_hitters().collect()}
    want = {r.term: r.hh_estimate for r in ref.heavy_hitters().collect()}
    assert got == want and len(want) > 0

    # second restart after everything committed: state recovers from
    # the LAST snapshot, a forced unseen replay of the latest batch
    # overwrites its partition with identical content
    hh3 = StreamingHeavyHitters(spark, sink_path=sink)
    assert hh3._seen == {0, 1, 2}
    assert {r.term: r.hh_estimate for r in hh3.heavy_hitters().collect()} == want


def test_streaming_sketches_sink_mode_survives_driver_restart(
    spark, sf_small, tmp_path
):
    """Kill-and-resume for the cm/HLL pair: a NEW StreamingSketches
    over the same sink resumes both sketches from the last committed
    snapshot and converges to the uninterrupted run's state."""
    docs = _docs(spark, sf_small).select("doc_id", "text")
    sink = str(tmp_path / "sk_sink")

    sk1 = StreamingSketches(spark, sink_path=sink)
    sk1.process(docs.filter(F.col("doc_id") % 3 == 0), batch_id=0)
    sk1.process(docs.filter(F.col("doc_id") % 3 == 1), batch_id=1)

    sk2 = StreamingSketches(spark, sink_path=sink)
    assert sk2._seen == {0, 1}
    assert sk2.cm is not None and sk2.hll is not None
    sk2.process(docs.filter(F.col("doc_id") % 3 == 1), batch_id=1)  # replay
    sk2.process(docs.filter(F.col("doc_id") % 3 == 2), batch_id=2)  # new

    ref = StreamingSketches(spark)
    for i in range(3):
        ref.process(docs.filter(F.col("doc_id") % 3 == i), batch_id=i)
    assert _cm_map(sk2.cm) == _cm_map(ref.cm)
    assert _hll_map(sk2.hll) == _hll_map(ref.hll)

    # third construction after full commit: same state again
    sk3 = StreamingSketches(spark, sink_path=sink)
    assert sk3._seen == {0, 1, 2}
    assert _cm_map(sk3.cm) == _cm_map(ref.cm)
    assert _hll_map(sk3.hll) == _hll_map(ref.hll)


def test_running_aggregate_sinks_never_double_merge_on_forced_replay(
    spark, sf_small, tmp_path
):
    """The committed sink is authoritative for running-aggregate
    consumers: discarding a batch id from the seen-set and replaying
    it must be a NO-OP (state is post-batch, so a re-merge would
    double every count) — unlike the append-only match sinks, where
    partition overwrite alone is idempotent."""
    from tripl_spark.streaming.sketch_stream import StreamingHeavyHitters

    docs = _docs(spark, sf_small).select("doc_id", "text")

    hh = StreamingHeavyHitters(spark, sink_path=str(tmp_path / "hh"))
    hh.process(docs, batch_id=0)
    before = {(r.shard, r.term): r.c for r in hh.state.collect()}
    hh._seen.discard(0)
    hh.process(docs, batch_id=0)  # forced replay of a COMMITTED batch
    assert 0 in hh._seen  # re-synced from the sink
    after = {(r.shard, r.term): r.c for r in hh.state.collect()}
    assert after == before

    sk = StreamingSketches(spark, sink_path=str(tmp_path / "sk"))
    sk.process(docs, batch_id=0)
    cm_before = _cm_map(sk.cm)
    sk._seen.discard(0)
    sk.process(docs, batch_id=0)
    assert _cm_map(sk.cm) == cm_before


@pytest.mark.parametrize("split", ["one", "mod3", "skew"])
def test_sketch_sink_snapshot_is_split_invariant(spark, sf_small, tmp_path, split):
    """The incremental-rollup family's split≡one-shot property, for the
    snapshot-sink mode: whatever the micro-batch split, the LAST
    committed snapshot on disk equals the one-shot batch sketches —
    checked through a FRESH consumer recovering from the sink, so the
    assertion pins the persisted bytes, not the in-memory state."""
    docs = _docs(spark, sf_small).select("doc_id", "text")
    sink = str(tmp_path / f"sk_{split}")
    batches = {
        "one": [docs],
        "mod3": [docs.filter(F.col("doc_id") % 3 == i) for i in range(3)],
        # skewed: one huge batch, one tiny, one empty — empty batches
        # must commit a snapshot too (state unchanged)
        "skew": [
            docs.filter(F.col("doc_id") % 10 != 0),
            docs.filter(F.col("doc_id") % 10 == 0),
            docs.limit(0),
        ],
    }[split]
    sk = StreamingSketches(spark, sink_path=sink)
    for i, b in enumerate(batches):
        sk.process(b, batch_id=i)
    recovered = StreamingSketches(spark, sink_path=sink)
    assert recovered._seen == set(range(len(batches)))
    toks = _tokens(docs, "text")
    assert _cm_map(recovered.cm) == _cm_map(countmin_table(toks))
    assert _hll_map(recovered.hll) == _hll_map(hll_registers(toks))


@pytest.mark.parametrize("split", ["one", "mod3", "skew"])
def test_heavy_hitters_sink_snapshot_is_split_invariant(
    spark, sf_small, tmp_path, split
):
    """Same property for the heavy-hitters consumer. With state_k ≥
    the per-shard vocabulary the re-truncation is vacuous and the
    final snapshot is EXACTLY the one-shot shard counts for any split;
    with the default state_k the merge is order-dependent in the
    truncated tail by design (a lower-bound sketch), so the exact
    claim is made where it holds."""
    from tripl_spark.operators.sketches import heavy_hitter_summaries
    from tripl_spark.streaming.sketch_stream import StreamingHeavyHitters

    docs = _docs(spark, sf_small).select("doc_id", "text")
    sink = str(tmp_path / f"hh_{split}")
    batches = {
        "one": [docs],
        "mod3": [docs.filter(F.col("doc_id") % 3 == i) for i in range(3)],
        "skew": [
            docs.filter(F.col("doc_id") % 10 != 0),
            docs.filter(F.col("doc_id") % 10 == 0),
            docs.limit(0),
        ],
    }[split]
    hh = StreamingHeavyHitters(spark, state_k=1_000_000, sink_path=sink)
    for i, b in enumerate(batches):
        hh.process(b, batch_id=i)
    recovered = StreamingHeavyHitters(
        spark, state_k=1_000_000, sink_path=sink
    )
    assert recovered._seen == set(range(len(batches)))
    got = {(r.shard, r.term): r.c for r in recovered.state.collect()}
    want = {
        (r.shard, r.term): r.c
        for r in _sharded_counts(spark, docs).collect()
    }
    assert got == want
    # and the read-time summaries match the one-shot batch operator
    s_got = {(r.shard, r.term): r.c for r in recovered.summaries().collect()}
    s_want = {
        (r.shard, r.term): r.c
        for r in heavy_hitter_summaries(_sharded_tokens(spark, docs)).collect()
    }
    assert s_got == s_want


def _sharded_tokens(spark, docs):
    from tripl_spark.operators.sketches import _shard_of

    return docs.select(
        _shard_of(F.col("doc_id")).alias("shard"),
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("term"),
    )


def _sharded_counts(spark, docs):
    return (
        _sharded_tokens(spark, docs)
        .groupBy("shard", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )

"""Merge-on-read changelog sink for keeper-table monitors
(`streaming/counter_monitor.py` ``compact_every``): delta per batch,
full snapshot every Nth, restart folds latest full + later deltas.
The r14 verdict's keeper-compaction item — keeper state is one row per
distinct unit corpus-wide, so the default per-batch full-snapshot
rewrite is O(|state|) per batch and the changelog amortizes it to
|state|/N + |batch|."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from tripl_spark.operators.dedup import _planted_multiline
from tripl_spark.queries.registry import REGISTRY, _ensure_loaded
from tripl_spark.session import load_table
from tripl_spark.streaming.counter_monitor import CounterMonitor, _FULL_MARKER
from tripl_spark.streaming.line_stream import StreamingLineDedup
from tripl_spark.streaming.url_dedup_stream import StreamingUrlDedup

_ensure_loaded()


def _multi_docs(spark, sf):
    return load_table(spark, sf, "documents").select(
        "doc_id", _planted_multiline().alias("text")
    )


def _by_doc(df):
    return {r.doc_id: tuple(r)[1:] for r in df.collect()}


def _batches(docs, n=5):
    return [docs.filter(F.pmod("doc_id", n) == i) for i in range(n)]


def _fulls(sink):
    return sorted(
        int(d.split("=", 1)[1])
        for d in os.listdir(sink)
        if d.startswith("batch_id=")
        and os.path.exists(os.path.join(sink, d, _FULL_MARKER))
    )


def test_compaction_rejected_on_additive_monitor(spark):
    """Additive counters are NOT idempotent — re-folding the crash
    window would double-count, so the base refuses the mode."""
    with pytest.raises(ValueError, match="idempotent"):
        CounterMonitor(
            spark,
            partials_fn=lambda b: b,
            key_cols=("k",),
            counter_cols=("n",),
            state_schema="k string, n long",
            compact_every=3,
        )


def test_compaction_rejects_nonpositive_period(spark):
    with pytest.raises(ValueError, match=">= 1"):
        StreamingLineDedup(spark, compact_every=0)


def test_changelog_state_equals_snapshot_state(spark, sf_small, tmp_path):
    """Same corpus, same split: the changelog-sink monitor's final
    table equals the full-snapshot monitor's AND the one-shot batch
    operator; the sink holds fulls only at every-3rd cadence."""
    docs = _multi_docs(spark, sf_small)
    sink = str(tmp_path / "clog")
    mon = StreamingLineDedup(spark, sink_path=sink, compact_every=3)
    for i, b in enumerate(_batches(docs)):
        mon.process(b, batch_id=i)
    want = _by_doc(REGISTRY["dedup_lines_newline"].fn(spark, sf_small))
    assert _by_doc(mon.dedup(docs)) == want
    # batches 0,1 delta; 2 full; 3,4 delta — one _FULL marker at 2
    assert _fulls(sink) == [2]


def test_changelog_restart_folds_full_plus_deltas(spark, sf_small, tmp_path):
    """Driver lost after 5 batches (full at 2, deltas at 3,4): the
    restarted monitor folds 2+3+4, resumes the compaction cadence
    (next full lands at batch 5), and the table stays exact."""
    docs = _multi_docs(spark, sf_small)
    sink = str(tmp_path / "clog")
    mon = StreamingLineDedup(spark, sink_path=sink, compact_every=3)
    batches = _batches(docs)
    for i, b in enumerate(batches):
        mon.process(b, batch_id=i)

    mon2 = StreamingLineDedup(spark, sink_path=sink, compact_every=3)
    assert mon2._since_full == 2  # deltas 3,4 pending past the full at 2
    mon2.process(batches[4], batch_id=4)  # replayed: skipped
    mon2.process(docs.limit(0), batch_id=5)  # 3rd delta => full
    want = _by_doc(REGISTRY["dedup_lines_newline"].fn(spark, sf_small))
    assert _by_doc(mon2.dedup(docs)) == want
    assert _fulls(sink) == [2, 5]


def test_changelog_crash_window_marker_missing(spark, sf_small, tmp_path):
    """The one crash window: full-snapshot parquet committed but the
    _FULL marker didn't. Restart folds that partition as a delta
    holding the whole state — absorbed exactly by the idempotent
    min-merge, table unchanged."""
    docs = _multi_docs(spark, sf_small)
    sink = str(tmp_path / "clog")
    mon = StreamingLineDedup(spark, sink_path=sink, compact_every=3)
    for i, b in enumerate(_batches(docs)):
        mon.process(b, batch_id=i)
    os.remove(os.path.join(sink, "batch_id=2", _FULL_MARKER))

    mon2 = StreamingLineDedup(spark, sink_path=sink, compact_every=3)
    want = _by_doc(REGISTRY["dedup_lines_newline"].fn(spark, sf_small))
    assert _by_doc(mon2.dedup(docs)) == want


def test_delta_partitions_are_batch_sized(spark, sf_small, tmp_path):
    """The point of the mode: a delta partition holds only the
    batch's keeper claims (O(|batch|)), not the accumulated state —
    strictly fewer rows than the full snapshot beside it."""
    docs = _multi_docs(spark, sf_small)
    sink = str(tmp_path / "clog")
    mon = StreamingLineDedup(spark, sink_path=sink, compact_every=3)
    for i, b in enumerate(_batches(docs)):
        mon.process(b, batch_id=i)
    n_delta = spark.read.parquet(f"{sink}/batch_id=4").count()
    n_full = spark.read.parquet(f"{sink}/batch_id=2").count()
    n_state = mon.keepers().count()
    assert n_delta < n_full <= n_state
    # the delta is exactly batch 4's keeper claims
    from tripl_spark.streaming.line_stream import _batch_keepers

    assert n_delta == _batch_keepers(_batches(docs)[4]).count()


def test_url_dedup_changelog_readstream_end_to_end(spark, sf_small, tmp_path):
    """Deployment shape for the crawl frontier: a real readStream
    drain through foreachBatch with the changelog sink equals the
    batch canonical-URL keeper rule."""
    from tripl_spark.operators.urls import _dup_url_col

    docs = load_table(spark, sf_small, "documents").select(
        "doc_id", _dup_url_col().alias("url")
    )
    src = str(tmp_path / "src")
    for i in range(4):
        docs.filter(F.pmod("doc_id", 4) == i).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    sink = str(tmp_path / "sink")
    mon = StreamingUrlDedup(spark, sink_path=sink, compact_every=2)
    stream = (
        spark.readStream.schema("doc_id bigint, url string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(mon.process)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination()
    want = StreamingUrlDedup(spark)
    want.process(docs, batch_id=0)
    got = {r.cu: r.keep for r in mon.keepers().collect()}
    assert got == {r.cu: r.keep for r in want.keepers().collect()}
    assert len(_fulls(sink)) >= 1 and len(_fulls(sink)) < 4


def test_changelog_sink_refuses_snapshot_mode_resume(spark, sf_small, tmp_path):
    """The review-found silent-loss mode switch: a sink written in
    changelog mode resumed WITHOUT compact_every would read the last
    DELTA as the whole state and persist the loss on its next write.
    The _CHANGELOG root marker makes that restart raise instead; the
    reverse switch (snapshot sink resumed WITH compact_every) stays
    legal — marker-less partitions fold as deltas, which the
    idempotent merge absorbs exactly."""
    docs = _multi_docs(spark, sf_small)
    sink = str(tmp_path / "clog")
    mon = StreamingLineDedup(spark, sink_path=sink, compact_every=3)
    for i, b in enumerate(_batches(docs)):
        mon.process(b, batch_id=i)
    with pytest.raises(ValueError, match="changelog"):
        StreamingLineDedup(spark, sink_path=sink)  # no compact_every

    # reverse direction: snapshot-mode sink adopted by a changelog
    # monitor reconstructs the exact state (fold of full snapshots)
    snap_sink = str(tmp_path / "snap")
    m1 = StreamingLineDedup(spark, sink_path=snap_sink)
    for i, b in enumerate(_batches(docs)):
        m1.process(b, batch_id=i)
    m2 = StreamingLineDedup(spark, sink_path=snap_sink, compact_every=3)
    want = {r.h: (r.keep.doc_id, r.keep.pos) for r in m1.keepers().collect()}
    got = {r.h: (r.keep.doc_id, r.keep.pos) for r in m2.keepers().collect()}
    assert got == want


def test_compact_ratio_mutually_exclusive_and_validated(spark):
    with pytest.raises(ValueError, match="not both"):
        StreamingLineDedup(spark, compact_every=3, compact_ratio=1.0)
    with pytest.raises(ValueError, match="> 0"):
        StreamingLineDedup(spark, compact_ratio=0.0)


def test_compact_ratio_size_triggered_state_and_restart(spark, sf_small, tmp_path):
    """The size trigger (full when un-folded delta rows reach ratio ×
    last full): state stays exact through the drain AND through a
    restart, the sink holds BOTH fulls and deltas, and a snapshot-mode
    resume is refused exactly like the fixed-period mode."""
    docs = _multi_docs(spark, sf_small)
    sink = str(tmp_path / "auto")
    mon = StreamingLineDedup(spark, sink_path=sink, compact_ratio=1.0)
    for i, b in enumerate(_batches(docs)):
        mon.process(b, batch_id=i)
    want = _by_doc(REGISTRY["dedup_lines_newline"].fn(spark, sf_small))
    assert _by_doc(mon.dedup(docs)) == want
    fulls = _fulls(sink)
    assert 0 in fulls  # first batch is always a full
    assert 0 < len(fulls) < 5  # trigger fired, but not every batch

    mon2 = StreamingLineDedup(spark, sink_path=sink, compact_ratio=1.0)
    assert _by_doc(mon2.dedup(docs)) == want
    # restart restores the trigger bookkeeping: last-full rows > 0
    assert mon2._last_full_rows > 0

    with pytest.raises(ValueError, match="changelog"):
        StreamingLineDedup(spark, sink_path=sink)

"""Streaming semantic near-dup detection: an embedding stream matched
against a fixed corpus cluster index, micro-batch by micro-batch.

The streaming twin of ``operators.clustering.semantic_match_new`` and
the semantic sibling of ``streaming/dedup_stream.StreamingDedup``: the
codebook is trained once and FROZEN (production coarse quantizers are
retrained offline, not per batch), the corpus index
(``semantic_index``: assignment + precomputed norms) is built once and
checkpointed, and each ``foreachBatch`` invocation assigns only the
incoming batch and equi-joins its clusters against the index —
per-batch cost is O(batch × cluster residency), independent of corpus
size and stream age.

Two accumulation modes, exactly as ``StreamingDedup``:

* in-memory (default, ``sink_path=None``): driver-local matches and
  seen-set; idempotence covers in-process replays only. Test/demo.
* sink-backed (``sink_path=...``): each batch's matches overwrite the
  ``batch_id=N`` partition of a parquet sink; processed ids recover
  from the sink's COMMITTED partitions on construction, so replays —
  in-process or after a driver restart from the stream checkpoint —
  converge to the same sink state. Restart-safe exactly-once.

Correctness contract (``tests/test_stream_dedup.py``): after ANY
micro-batch split of an increment, the accumulated match set equals
the one-shot ``semantic_match_new`` of the whole increment —
per-vector matching is independent across vectors, so the split cannot
change results; replays are idempotent; kill-and-resume over the same
sink keeps prior batches' matches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from tripl_spark.operators.clustering import (
    kmeans_2iter_centroid_rows,
    semantic_index,
    semantic_match_new,
)
from tripl_spark.streaming.sinks import committed_batches
from tripl_spark.session import eager_checkpoint

_MATCH_SCHEMA = "new_id bigint, corpus_id bigint, cid bigint, cosine double"


class StreamingSemanticDedup:
    """Maintains (new_id, corpus_id, cid, cosine) matches across
    micro-batches (the ``foreachBatch(dedup.process)`` target)."""

    def __init__(
        self,
        spark: SparkSession,
        corpus_emb: DataFrame,
        threshold: float = 0.4,
        sink_path: str | None = None,
    ) -> None:
        self.spark = spark
        self.threshold = threshold
        self.sink_path = sink_path
        # one-time snapshot cost: frozen codebook (k×d doubles held on
        # the driver — every micro-batch assigns via the map-only
        # literal path, no per-batch broadcast) + checkpointed index
        # (at scale: a bucketed-by-cid table, see SCALE.md)
        self.cent = kmeans_2iter_centroid_rows(corpus_emb)
        self.index = semantic_index(corpus_emb, self.cent).transform(eager_checkpoint)
        self.matches: DataFrame | None = None
        self._seen: set[int] = committed_batches(sink_path) if sink_path else set()

    def process(self, batch: DataFrame, batch_id: int) -> None:
        if batch_id in self._seen:  # replay: idempotent skip
            return
        found = semantic_match_new(batch, self.index, self.cent, self.threshold)
        if self.sink_path is not None:
            # partition overwrite: a replayed batch rewrites its own
            # batch_id=N directory and nothing else — exactly-once per
            # batch across driver restarts. Seen only AFTER the write
            # commits (failed write => eligible for engine replay).
            found.write.mode("overwrite").parquet(
                f"{self.sink_path}/batch_id={batch_id}"
            )
            self._seen.add(batch_id)
            return
        merged = found if self.matches is None else self.matches.unionByName(found)
        # cut lineage so N batches don't stack N plans
        self.matches = merged.transform(eager_checkpoint)
        # the batch counts as seen only AFTER its results are merged and
        # checkpointed — a failure above leaves it eligible for the
        # engine's replay (same invariant as StreamingDedup.process)
        self._seen.add(batch_id)

    def matches_df(self) -> DataFrame | None:
        """Accumulated matches across all processed batches — from the
        sink (restart-safe mode) or the in-memory accumulator. Sink
        mode reads ONLY committed partitions (explicit schema, so
        all-empty committed partitions read as zero rows)."""
        if self.sink_path is None:
            return self.matches
        committed = sorted(committed_batches(self.sink_path))
        if not committed:
            if not self._seen:
                return None
            return self.spark.createDataFrame([], _MATCH_SCHEMA)
        paths = [f"{self.sink_path}/batch_id={b}" for b in committed]
        return (
            self.spark.read.schema(_MATCH_SCHEMA + ", batch_id bigint")
            .option("basePath", self.sink_path)
            .parquet(*paths)
            .drop("batch_id")
        )

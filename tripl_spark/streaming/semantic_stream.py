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

In-memory accumulation with batch-id idempotent skip (the in-process
mode); the sink-backed restart-safe shape in ``dedup_stream`` (batch_id
partition overwrite + seen-set recovery) applies verbatim if needed.

Correctness contract (``tests/test_stream_dedup.py``): after ANY
micro-batch split of an increment, the accumulated match set equals
the one-shot ``semantic_match_new`` of the whole increment —
per-vector matching is independent across vectors, so the split cannot
change results; replays are idempotent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from tripl_spark.operators.clustering import (
    kmeans_2iter_centroids,
    semantic_index,
    semantic_match_new,
)


class StreamingSemanticDedup:
    """Maintains (new_id, corpus_id, cid, cosine) matches across
    micro-batches (the ``foreachBatch(dedup.process)`` target)."""

    def __init__(
        self,
        spark: SparkSession,
        corpus_emb: DataFrame,
        threshold: float = 0.4,
    ) -> None:
        self.spark = spark
        self.threshold = threshold
        # one-time snapshot cost: frozen codebook + checkpointed index
        # (at scale: a bucketed-by-cid table, see SCALE.md)
        self.cent = kmeans_2iter_centroids(corpus_emb).localCheckpoint(eager=True)
        self.index = semantic_index(corpus_emb, self.cent).localCheckpoint(eager=True)
        self.matches: DataFrame | None = None
        self._seen: set[int] = set()

    def process(self, batch: DataFrame, batch_id: int) -> None:
        if batch_id in self._seen:  # in-process replay: idempotent skip
            return
        found = semantic_match_new(batch, self.index, self.cent, self.threshold)
        merged = found if self.matches is None else self.matches.unionByName(found)
        # cut lineage so N batches don't stack N plans
        self.matches = merged.localCheckpoint(eager=True)
        # the batch counts as seen only AFTER its results are merged and
        # checkpointed — a failure above leaves it eligible for the
        # engine's replay (same invariant as StreamingDedup.process)
        self._seen.add(batch_id)

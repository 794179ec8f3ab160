"""Streaming near-duplicate detection: a document stream matched
against a fixed corpus LSH index, micro-batch by micro-batch.

The streaming twin of ``operators.dedup.minhash_match_new``: the
corpus index (shingle sets + band table) is built ONCE and
checkpointed; each ``foreachBatch`` invocation computes only the
incoming batch's signatures and joins its bands against the index —
per-batch cost is O(batch), independent of corpus size and stream age.

``foreachBatch`` is the right hook (not a streaming join) because LSH
banding needs a groupBy-collect per document and a two-sided Jaccard
verification join — batch DataFrame operations — and it hands us a
batch id for idempotence under IN-PROCESS replays (a failed batch
re-delivered within the same driver lifetime is skipped). The seen-set
and accumulated matches are driver-local state, NOT checkpointed: after
a driver restart from the stream checkpoint, replayed batch ids are
reprocessed and prior matches are gone. For restart-safe exactly-once,
write per-batch matches to a sink table keyed by batch_id inside
``process`` and let the sink's idempotent-overwrite semantics dedupe —
the in-memory accumulator here is the single-process test/demo shape.

The correctness contract (``tests/test_stream_dedup.py``): after any
micro-batch split of a shard, the accumulated match set is identical
to the one-shot batch ``minhash_match_new`` of the whole shard —
per-document candidate generation is independent across documents, so
the split cannot change results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from tripl_spark.operators.dedup import (
    _band_frame,
    _signatures_from_sets,
    match_against_index,
    shingle_sets,
)


class StreamingDedup:
    """Maintains (id_a=corpus doc, id_b=streamed doc, jaccard) matches
    across micro-batches (the ``foreachBatch(dedup.process)`` target)."""

    def __init__(
        self,
        spark: SparkSession,
        corpus: DataFrame,
        id_col: str = "doc_id",
        threshold: float = 0.6,
        hash_mode: str = "xxhash64",
    ) -> None:
        self.spark = spark
        self.id_col = id_col
        self.threshold = threshold
        self.hash_mode = hash_mode
        # the one-time corpus cost: at scale these are written to
        # bucketed tables; localCheckpoint is the local stand-in. One
        # shingle pass feeds both frames — the band index derives from
        # the CHECKPOINTED sets (minhash_index would re-shingle).
        self.corpus_sets = shingle_sets(corpus, id_col, hash_mode).localCheckpoint(
            eager=True
        )
        self.corpus_bands = _band_frame(
            _signatures_from_sets(self.corpus_sets, id_col), id_col,
            hash_bands=hash_mode != "md5",
        ).localCheckpoint(eager=True)
        self.matches: DataFrame | None = None
        self._seen: set[int] = set()

    def process(self, batch: DataFrame, batch_id: int) -> None:
        if batch_id in self._seen:  # replay after failure: idempotent
            return
        self._seen.add(batch_id)
        found = match_against_index(
            self.corpus_sets,
            self.corpus_bands,
            batch,
            self.id_col,
            self.threshold,
            self.hash_mode,
        )
        merged = found if self.matches is None else self.matches.unionByName(found)
        # cut lineage so N batches don't stack N plans
        self.matches = merged.localCheckpoint(eager=True)

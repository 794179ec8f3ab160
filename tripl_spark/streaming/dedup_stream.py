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
batch id for idempotence. Two accumulation modes:

* in-memory (default, ``sink_path=None``): the seen-set and matches are
  driver-local, so idempotence only covers IN-PROCESS replays (a failed
  batch re-delivered within the same driver lifetime is skipped); a
  driver restart loses both. The single-process test/demo shape.
* sink-backed (``sink_path=...``): each batch's matches overwrite the
  ``batch_id=N`` partition of a parquet sink — partition overwrite is
  idempotent, so replays (in-process OR after a driver restart from the
  stream checkpoint) converge to the same sink state, and the seen-set
  is recovered from the sink's existing partitions on construction.
  This is the restart-safe exactly-once shape for production.

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
from tripl_spark.session import eager_checkpoint


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
        sink_path: str | None = None,
    ) -> None:
        self.spark = spark
        self.id_col = id_col
        self.threshold = threshold
        self.hash_mode = hash_mode
        self.sink_path = sink_path
        # the one-time corpus cost: at scale these are written to
        # bucketed tables; localCheckpoint is the local stand-in. One
        # shingle pass feeds both frames — the band index derives from
        # the CHECKPOINTED sets (minhash_index would re-shingle).
        self.corpus_sets = shingle_sets(corpus, id_col, hash_mode).transform(eager_checkpoint)
        self.corpus_bands = _band_frame(
            _signatures_from_sets(self.corpus_sets, id_col), id_col,
            hash_bands=hash_mode != "md5",
        ).transform(eager_checkpoint)
        self.matches: DataFrame | None = None
        # sink-backed mode recovers processed batch ids from the sink's
        # COMMITTED batch_id=N partitions. "Committed" means carrying
        # the _SUCCESS marker the default FileOutputCommitter writes —
        # a crash mid-write leaves the directory marker-less, and
        # counting it as done would silently drop the
        # checkpoint-replayed batch's matches. NOTE: committers
        # configured with marksuccessfuljobs=false (common on object
        # stores) never write markers; this mode requires them — at
        # that scale use a transactional table format instead.
        # Local-path listing is the test stand-in for a Hadoop-FS
        # listing / catalog partition query at cluster scale.
        self._seen: set[int] = self._committed_batches() if sink_path else set()

    def _committed_batches(self) -> set[int]:
        from tripl_spark.streaming.sinks import committed_batches

        return committed_batches(self.sink_path)

    def process(self, batch: DataFrame, batch_id: int) -> None:
        if batch_id in self._seen:  # replay: idempotent skip
            return
        found = match_against_index(
            self.corpus_sets,
            self.corpus_bands,
            batch,
            self.id_col,
            self.threshold,
            self.hash_mode,
        )
        if self.sink_path is not None:
            # partition overwrite: a replayed batch rewrites its own
            # batch_id=N directory and nothing else — exactly-once per
            # batch across driver restarts. The batch only counts as
            # seen AFTER the write commits, so a failed write leaves it
            # eligible for the engine's retry/replay.
            found.write.mode("overwrite").parquet(
                f"{self.sink_path}/batch_id={batch_id}"
            )
            self._seen.add(batch_id)
            return
        merged = found if self.matches is None else self.matches.unionByName(found)
        # cut lineage so N batches don't stack N plans
        self.matches = merged.transform(eager_checkpoint)
        self._seen.add(batch_id)

    def _empty_matches(self) -> DataFrame:
        id_type = dict(self.corpus_sets.dtypes)[self.id_col]
        return self.spark.createDataFrame(
            [], f"id_a {id_type}, id_b {id_type}, jaccard double"
        )

    def matches_df(self) -> DataFrame | None:
        """Accumulated matches across all processed batches — from the
        sink (restart-safe mode) or the in-memory accumulator. Sink
        mode reads ONLY committed partitions, so a concurrent or
        crashed half-written batch never leaks partial rows into the
        result."""
        if self.sink_path is None:
            return self.matches
        committed = sorted(self._committed_batches())
        if not committed:
            return None if not self._seen else self._empty_matches()
        paths = [f"{self.sink_path}/batch_id={b}" for b in committed]
        # explicit schema: no sampling-based inference, so committed
        # partitions that are ALL empty (directories holding just
        # _SUCCESS) read as zero rows instead of raising
        # UNABLE_TO_INFER_SCHEMA — and a genuinely corrupt file still
        # fails loudly at scan time rather than being swallowed by a
        # message-text match
        id_type = dict(self.corpus_sets.dtypes)[self.id_col]
        schema = f"id_a {id_type}, id_b {id_type}, jaccard double, batch_id bigint"
        return (
            self.spark.read.schema(schema)
            .option("basePath", self.sink_path)
            .parquet(*paths)
            .drop("batch_id")
        )

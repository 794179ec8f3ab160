"""Streaming sketch maintenance via ``foreachBatch``: count-min and
HLL sketches kept current over a document stream.

The batch operators (``operators/sketches.py``) prove the merge
algebra — count-min cells add, HLL registers max — and this module is
the streaming consumer of that algebra: each micro-batch is sketched
in isolation (cost O(batch)) and merged into the maintained state by
the algebraic rule, so the running sketch after ANY micro-batch split
equals the one-shot sketch of everything seen (the same
associativity contract ``streaming/incremental.py`` proves for the
hypertable layer, here for sub-linear summaries).

At 100 TB this is how sketches stay fresh: the corpus is never
re-scanned — a day's increment contributes d×w cell deltas /
m register candidates, and the merge is a groupBy over at most
sketch-size keys. The state is tiny (d·w + m rows) whatever the
stream has seen.

``StreamingSketches`` is in-memory with batch-id idempotent skip
(mirroring ``StreamingDedup``'s default mode; the sink-backed shape
applies verbatim — overwrite a ``batch_id=N`` partition of cell
deltas, aggregate at read — if needed). ``StreamingHeavyHitters``
additionally offers the restart-safe ``sink_path`` mode: because its
state is a RUNNING truncated aggregate rather than append-only
output, each batch's partition snapshots the POST-MERGE state, and a
restarted driver resumes from the last committed snapshot — the
engine's replay of the one possibly-uncommitted batch then re-merges
from exactly the state it originally saw (kill-and-resume test in
``tests/test_sketch_stream.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tripl_spark.operators.sketches import countmin_table, hll_registers
from tripl_spark.session import eager_checkpoint


def _tokens(batch: DataFrame, col: str) -> DataFrame:
    return batch.select(
        F.explode(F.split(F.trim(F.lower(F.col(col))), r"\s+")).alias("term")
    )


class StreamingSketches:
    """Maintains a count-min table and an HLL register table across
    micro-batches (the ``foreachBatch(sk.process)`` target).

    ``sink_path`` enables the restart-safe mode: both sketches are
    RUNNING aggregates, so each batch's ``batch_id=N`` partition
    snapshots the POST-MERGE (cm ∪ hll) state — tagged by a ``sketch``
    column — and a restarted driver resumes from the last committed
    snapshot (the ``StreamingHeavyHitters`` scheme; state is d·w + m
    rows per snapshot, trivially small)."""

    _CM_SCHEMA = "row int, cell bigint, n long"
    _HLL_SCHEMA = "register bigint, max_rho int"

    def __init__(
        self,
        spark: SparkSession,
        col: str = "text",
        sink_path: str | None = None,
    ) -> None:
        from tripl_spark.streaming.sinks import committed_batches

        self.spark = spark
        self.col = col
        self.sink_path = sink_path
        self.cm: DataFrame | None = None
        self.hll: DataFrame | None = None
        self._seen: set[int] = set()
        if sink_path:
            committed = committed_batches(sink_path)
            self._seen = set(committed)
            if committed:
                last = f"{sink_path}/batch_id={max(committed)}"
                self.cm = self.spark.read.schema(self._CM_SCHEMA).parquet(
                    f"{last}/cm"
                ).transform(eager_checkpoint)
                self.hll = self.spark.read.schema(self._HLL_SCHEMA).parquet(
                    f"{last}/hll"
                ).transform(eager_checkpoint)

    def process(self, batch: DataFrame, batch_id: int) -> None:
        if batch_id in self._seen:  # replay: idempotent skip
            return
        if self.sink_path is not None:
            # RUNNING-aggregate state: a batch whose snapshot already
            # COMMITTED must never re-merge — the in-memory state is
            # post-batch, so merging again would double-count every
            # cell (unlike append-only match sinks, where partition
            # overwrite alone is idempotent). The committed sink is
            # authoritative: re-sync the seen-set and skip.
            from tripl_spark.streaming.sinks import committed_batches

            if batch_id in committed_batches(self.sink_path):
                self._seen.add(batch_id)
                return
        toks = _tokens(batch, self.col)
        cm_delta = countmin_table(toks)
        hll_delta = hll_registers(toks)
        if self.cm is None:
            cm, hll = cm_delta, hll_delta
        else:
            # the merge rules the batch layer proves associative:
            # cells ADD, registers MAX
            cm = (
                self.cm.unionByName(cm_delta)
                .groupBy("row", "cell")
                .agg(F.sum("n").alias("n"))
            )
            hll = (
                self.hll.unionByName(hll_delta)
                .groupBy("register")
                .agg(F.max("max_rho").alias("max_rho"))
            )
        # cut lineage so N batches don't stack N plans; state is at most
        # d*w + m rows, so the checkpoint is trivially cheap
        cm = cm.transform(eager_checkpoint)
        hll = hll.transform(eager_checkpoint)
        if self.sink_path is not None:
            # snapshot both sketches into this batch's partition BEFORE
            # marking seen; a partition only counts as committed once
            # the explicit root marker exists, written AFTER both
            # sub-dirs — a crash between sub-writes leaves it
            # marker-less and the engine's replay reprocesses from the
            # previous snapshot (the committed-partition guard above
            # makes an already-committed batch a no-op instead)
            import os

            base = f"{self.sink_path}/batch_id={batch_id}"
            hll.write.mode("overwrite").parquet(f"{base}/hll")
            cm.write.mode("overwrite").parquet(f"{base}/cm")
            open(os.path.join(base, "_SUCCESS"), "w").close()
        self.cm, self.hll = cm, hll
        self._seen.add(batch_id)


class StreamingHeavyHitters:
    """Maintains per-shard truncated term-count summaries (the
    ``operators/sketches.heavy_hitter_summaries`` shape) across
    micro-batches.

    The merge is summation of partial counts — exact while a term stays
    in its shard's state — followed by re-truncation to ``state_k``
    rows per shard, so state stays bounded at shards × state_k rows
    whatever the stream has seen. ``state_k`` over-provisions the
    read-time summary size (4× by default): a term must fall below a
    shard's top ``state_k`` in EVERY window of batches to lose mass, so
    estimates stay exact for everything near the top and remain lower
    bounds everywhere (tests/test_sketch_stream.py pins both against
    the one-shot batch summaries)."""

    _STATE_SCHEMA = "shard bigint, term string, c long"

    def __init__(
        self,
        spark: SparkSession,
        id_col: str = "doc_id",
        col: str = "text",
        state_k: int | None = None,
        sink_path: str | None = None,
    ) -> None:
        from tripl_spark.operators.sketches import HH_LOCAL_K
        from tripl_spark.streaming.sinks import committed_batches

        self.spark = spark
        self.id_col = id_col
        self.col = col
        self.state_k = state_k or 4 * HH_LOCAL_K
        self.sink_path = sink_path
        self.state: DataFrame | None = None  # (shard, term, c)
        self._seen: set[int] = set()
        if sink_path:
            # restart recovery: the state is a RUNNING aggregate (not
            # append-only matches), so each batch's partition holds the
            # POST-MERGE state snapshot and recovery resumes from the
            # LAST committed one — earlier partitions are retained
            # solely as the processed-batch ledger (bounded: shards x
            # state_k rows per batch)
            committed = committed_batches(sink_path)
            self._seen = set(committed)
            if committed:
                self.state = self.spark.read.schema(self._STATE_SCHEMA).parquet(
                    f"{sink_path}/batch_id={max(committed)}"
                ).transform(eager_checkpoint)

    def _sharded_tokens(self, batch: DataFrame) -> DataFrame:
        from tripl_spark.operators.sketches import _shard_of

        return batch.select(
            _shard_of(F.col(self.id_col)).alias("shard"),
            F.explode(
                F.split(F.trim(F.lower(F.col(self.col))), r"\s+")
            ).alias("term"),
        )

    def _truncate(self, counts: DataFrame) -> DataFrame:
        from pyspark.sql import Window

        w = Window.partitionBy("shard").orderBy(F.desc("c"), "term")
        return (
            counts.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= self.state_k)
            .drop("rk")
        )

    def process(self, batch: DataFrame, batch_id: int) -> None:
        if batch_id in self._seen:  # replay: idempotent skip
            return
        if self.sink_path is not None:
            # running-aggregate state: an already-COMMITTED batch must
            # never re-merge (the in-memory state is post-batch, so a
            # second merge would double every count). The committed
            # sink is authoritative — re-sync the seen-set and skip.
            from tripl_spark.streaming.sinks import committed_batches

            if batch_id in committed_batches(self.sink_path):
                self._seen.add(batch_id)
                return
        delta = (
            self._sharded_tokens(batch)
            .groupBy("shard", "term")
            .agg(F.count(F.lit(1)).cast("long").alias("c"))
        )
        merged = (
            delta
            if self.state is None
            else self.state.unionByName(delta)
            .groupBy("shard", "term")
            .agg(F.sum("c").cast("long").alias("c"))
        )
        # bounded state: shards × state_k rows, checkpointed so N
        # batches don't stack N plans
        new_state = self._truncate(merged).transform(eager_checkpoint)
        if self.sink_path is not None:
            # snapshot the post-merge state into this batch's partition
            # BEFORE marking seen: a crash mid-write leaves the
            # partition marker-less, so a restarted driver resumes from
            # the previous committed snapshot and the engine's replay
            # of this batch re-merges it — exactly-once per batch. An
            # already-committed batch never reaches this point (the
            # guard above skips it), so the overwrite only ever lands
            # on a torn, marker-less partition.
            new_state.write.mode("overwrite").parquet(
                f"{self.sink_path}/batch_id={batch_id}"
            )
        self.state = new_state
        # seen only AFTER the merged state commits — a mid-computation
        # failure leaves the batch eligible for replay (same invariant
        # as StreamingDedup.process)
        self._seen.add(batch_id)

    def summaries(self) -> DataFrame | None:
        """Read-time summaries truncated to the batch operator's
        HH_LOCAL_K — directly comparable to
        ``heavy_hitter_summaries`` over everything seen."""
        from pyspark.sql import Window

        from tripl_spark.operators.sketches import HH_LOCAL_K

        if self.state is None:
            return None
        w = Window.partitionBy("shard").orderBy(F.desc("c"), "term")
        return (
            self.state.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= HH_LOCAL_K)
            .drop("rk")
        )

    def heavy_hitters(self) -> DataFrame | None:
        """(term, hh_estimate, n_shards) over everything seen."""
        from tripl_spark.operators.sketches import heavy_hitter_merge

        s = self.summaries()
        return None if s is None else heavy_hitter_merge(s)

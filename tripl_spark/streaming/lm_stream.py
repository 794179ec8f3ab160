"""Streaming bigram-LM maintenance: the corpus language model kept
current over a document stream, micro-batch by micro-batch.

The batch operator (``operators/text.bigram_logprob_scores``) trains
the add-k bigram LM from corpus counts and scores documents under it.
Both count tables are ALGEBRAIC (term -> count, bigram -> count merge
by summation), so the streaming twin follows the
``streaming/sketch_stream`` pattern exactly: each ``foreachBatch``
invocation counts only its batch, merges into the state by summed
union, and checkpoints — per-batch cost is O(batch), state is
vocabulary-sized (terms + distinct bigrams), never corpus-sized, and
the merged state after ANY micro-batch split equals the one-shot
counts over everything seen (addition is associative — proven in
``tests/test_lm_stream.py``).

Batch-id idempotence follows the commit-before-seen invariant from
``StreamingDedup`` (r5 ADVICE): a batch is marked seen only AFTER its
merged state checkpoints, so a mid-computation failure leaves it
eligible for the engine's replay.

At 100 TB: this is how a perplexity filter stays current while the
corpus grows — the LM trained on yesterday's corpus scores today's
increment without rescanning history; CCNet-style bucketing
(``pipeline_perplexity_buckets``) then consumes the scores.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tripl_spark.operators.text import BIGRAM_ALPHA
from tripl_spark.session import eager_checkpoint


class StreamingBigramLM:
    """Maintains the (term, c1) and (bigram, c2) count tables across
    micro-batches (the ``foreachBatch(lm.process)`` target) and scores
    documents under the accumulated LM."""

    def __init__(self, spark: SparkSession, id_col: str = "doc_id",
                 text_col: str = "text") -> None:
        self.spark = spark
        self.id_col = id_col
        self.text_col = text_col
        self.c1: DataFrame | None = None  # (term, c1)
        self.c2: DataFrame | None = None  # (bg, c2)
        self._seen: set[int] = set()

    def _toks(self, batch: DataFrame) -> DataFrame:
        return batch.select(
            self.id_col,
            F.split(F.trim(F.lower(F.col(self.text_col))), r"\s+").alias("t"),
        )

    def _bigrams(self, toks: DataFrame) -> DataFrame:
        # same >=2-token guard as the batch operator: Spark's
        # sequence(0, -1) would run DESCENDING and fabricate bigrams
        return toks.filter(F.size("t") >= 2).select(
            self.id_col,
            F.explode(
                F.expr("transform(sequence(0, size(t) - 2), i -> concat(t[i], ' ', t[i+1]))")
            ).alias("bg"),
        )

    def process(self, batch: DataFrame, batch_id: int) -> None:
        if batch_id in self._seen:  # in-process replay: idempotent skip
            return
        toks = self._toks(batch)
        d1 = toks.select(F.explode("t").alias("term")).groupBy("term").agg(
            F.count(F.lit(1)).alias("c1")
        )
        d2 = self._bigrams(toks).groupBy("bg").agg(F.count(F.lit(1)).alias("c2"))
        if self.c1 is not None:
            d1 = self.c1.unionByName(d1).groupBy("term").agg(
                F.sum("c1").cast("long").alias("c1")
            )
            d2 = self.c2.unionByName(d2).groupBy("bg").agg(
                F.sum("c2").cast("long").alias("c2")
            )
        # vocabulary-sized state, checkpointed so N batches don't stack
        # N plans
        self.c1 = d1.transform(eager_checkpoint)
        self.c2 = d2.transform(eager_checkpoint)
        # seen only AFTER the merged state commits (replay-safe)
        self._seen.add(batch_id)

    def score(self, docs: DataFrame) -> DataFrame:
        """(id, n_bigrams, avg_logprob) for ``docs`` under the
        ACCUMULATED counts — the same add-k formula as the batch
        ``bigram_logprob_scores``, with the LM frozen at whatever the
        stream has seen. Unseen terms/bigrams fall back to the
        smoothing mass (count 0), so scoring never fails on novel
        text."""
        if self.c1 is None:
            raise ValueError("no batches processed yet")
        vsz = self.c1.count()
        big = self._bigrams(self._toks(docs))
        prev = F.split(F.col("bg"), " ")[0]
        joined = (
            big.join(F.broadcast(self.c2), "bg", "left")
            .withColumn("term", prev)
            .join(F.broadcast(self.c1), "term", "left")
            .fillna(0, subset=["c1", "c2"])
        )
        return joined.groupBy(self.id_col).agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(
                F.sum(
                    F.log((F.col("c2") + BIGRAM_ALPHA) / (F.col("c1") + BIGRAM_ALPHA * vsz))
                )
                / F.count(F.lit(1)),
                4,
            ).alias("avg_logprob"),
        )

"""Streaming canonical-URL dedup: an incremental keeper table for
``operators.urls.url_canonical_dedup`` maintained micro-batch by
micro-batch (``foreachBatch(mon.process)``).

This is URL dedup's PRODUCTION shape: a crawl frontier asks "have we
fetched this page before, under any spelling?" per batch of incoming
fetches, not per nightly corpus scan. State is the
``canonical_url → keep`` table itself: per batch, canonicalize
(scheme dropped, utm_* tracking params stripped — the SAME
`canonical_url` expression the batch query gates), take the
per-canonical ``min(doc_id)``, and MIN-MERGE into the maintained
table (the ``CounterMonitor`` lifecycle with the merge hook
overridden — replay skip, foreign-commit adoption, and the
snapshot-sink restart order all live in the base). Min is
associative, commutative and IDEMPOTENT, so the maintained keeper
table after any micro-batch split equals the one-shot batch
computation over the union — and a re-delivered batch may be
re-merged without corruption (min(x, x) = x); the snapshot-sink
restart contract is availability bookkeeping here, not a correctness
requirement (same algebra as the line-dedup monitor).

Scale: state is one row per DISTINCT canonical URL corpus-wide —
near one row per unique page, the crawl frontier's own cardinality;
each batch costs a map-only canonicalization of the batch plus one
min-merge keyed by canonical URL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tripl_spark.operators.urls import canonical_url
from tripl_spark.streaming.counter_monitor import CounterMonitor

_STATE_SCHEMA = "cu string, keep bigint"


def _batch_keepers(batch: DataFrame) -> DataFrame:
    """(doc_id, url) batch → per-canonical first-occurrence claim."""
    return (
        batch.select("doc_id", canonical_url(F.col("url")).alias("cu"))
        .groupBy("cu")
        .agg(F.min("doc_id").alias("keep"))
    )


class StreamingUrlDedup(CounterMonitor):
    """Maintains the global canonical-URL keeper table across
    micro-batches; ``foreachBatch(mon.process)`` target.

    ``compact_every=N`` switches the sink to the merge-on-read
    changelog (delta per batch, full snapshot every Nth) — frontier
    state is one row per unique page, so the default per-batch
    full-snapshot rewrite is O(|frontier|) and this monitor is the
    canonical case for the mode. Min-merge is idempotent, which the
    mode requires."""

    _IDEMPOTENT_MERGE = True

    def __init__(
        self,
        spark: SparkSession,
        sink_path: str | None = None,
        compact_every: int | None = None,
        compact_ratio: float | None = None,
    ) -> None:
        super().__init__(
            spark,
            partials_fn=_batch_keepers,
            key_cols=("cu",),
            state_schema=_STATE_SCHEMA,
            sink_path=sink_path,
            compact_every=compact_every,
            compact_ratio=compact_ratio,
        )

    def _merge(self, state: DataFrame, delta: DataFrame) -> DataFrame:
        """min(doc_id) per canonical URL — associative AND idempotent
        (first fetch corpus-wide, batch-order-free)."""
        return (
            state.unionByName(delta)
            .groupBy("cu")
            .agg(F.min("keep").alias("keep"))
        )

    def _decode_state(self, df: DataFrame) -> DataFrame:
        """Keeper ids need no post-read repair (no additive counters
        to zero-fill)."""
        return df

    def keepers(self) -> DataFrame:
        """The maintained ``(cu, keep)`` table (empty before any
        batch)."""
        if self.state is None:
            return self.spark.createDataFrame([], _STATE_SCHEMA)
        return self.state

    def dedup(self, batch: DataFrame) -> DataFrame:
        """Label a (doc_id, url) frame against the maintained table:
        ``kept`` iff this doc_id IS the canonical URL's keeper — the
        batch query's keeper rule over whatever corpus the table has
        seen. A canonical URL absent from the table keeps its row
        (defensive; cannot happen when the frame ⊆ streamed corpus)."""
        c = batch.select(
            "doc_id", canonical_url(F.col("url")).alias("canonical_url")
        )
        k = self.keepers().select(
            F.col("cu").alias("canonical_url"), "keep"
        )
        return c.join(k, "canonical_url", "left").select(
            "doc_id",
            "canonical_url",
            (F.col("keep").isNull() | (F.col("doc_id") == F.col("keep"))).alias(
                "kept"
            ),
        )

"""Incremental materialized-view maintenance via ``foreachBatch``:
the streaming upsert path for the hypertable rollup cascade.

At 100 TB you do not recompute the hourly aggregate table from raw
events on every refresh — you maintain it incrementally: each incoming
micro-batch is partially aggregated to (hour, event_type) DELTAS
(count + decimal sum, the algebraic partials from
``operators.rangejoin.hypertable_rollup_daily``), and the deltas MERGE
into the materialized layer by re-aggregating (old ∪ delta) per key.
The merge touches only the keys present in the batch's time range —
with the layer stored partitioned by day, that is an overwrite of a
handful of partitions, never a rewrite of history.

``foreachBatch`` is the right hook because the merge is a batch
DataFrame operation (joins/upserts are not expressible as a pure
streaming agg once the sink is an external table), and Structured
Streaming gives each batch an id for exactly-once idempotence: an
interrupted merge re-runs with the same batch id and overwrites the
same state.

The correctness contract (proved in ``tests/test_incremental.py``):
after processing ANY partitioning of the event log into micro-batches,
the maintained layer is bit-identical to the one-shot batch rollup —
the algebraic-partial merge is associative by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from tripl_spark.session import eager_checkpoint

HOURLY_KEYS = ("hour", "event_type")


def hourly_partials(events: DataFrame) -> DataFrame:
    """Algebraic partials for one slice of events: count + exact
    DECIMAL sum per (hour, event_type)."""
    return events.groupBy(
        F.date_trunc("hour", "ts").alias("hour"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,6)")).alias("sum_value"),
    )


def merge_partials(layer: DataFrame | None, delta: DataFrame) -> DataFrame:
    """(old layer ∪ delta) re-aggregated per key — associative, so any
    micro-batch split of the input converges to the same layer."""
    if layer is None:
        return delta
    return (
        layer.unionByName(delta)
        .groupBy(*HOURLY_KEYS)
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_value").cast("decimal(18,6)").alias("sum_value"),
        )
    )


class IncrementalRollup:
    """Maintains the hourly layer across micro-batches (the
    ``foreachBatch(rollup.upsert)`` target). Holds the layer as a
    checkpointed DataFrame; a production deployment would back it with
    a day-partitioned table and overwrite only touched partitions."""

    def __init__(self, spark: SparkSession) -> None:
        self.spark = spark
        self.layer: DataFrame | None = None
        self._seen: set[int] = set()

    def upsert(self, batch: DataFrame, batch_id: int) -> None:
        if batch_id in self._seen:  # replay after failure: idempotent
            return
        self._seen.add(batch_id)
        merged = merge_partials(self.layer, hourly_partials(batch))
        # cut lineage so N batches don't stack N plans
        self.layer = merged.transform(eager_checkpoint)

    def daily(self) -> DataFrame:
        """The serving view: re-aggregate hourly partials to days
        (identical formulation to hypertable_rollup_daily)."""
        assert self.layer is not None, "no batches processed yet"
        daily = self.layer.groupBy(
            F.date_format(F.date_trunc("day", "hour"), "yyyy-MM-dd").alias("day"),
            "event_type",
        ).agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_value").alias("sum_value"),
        )
        return daily.select(
            "day",
            "event_type",
            "n_events",
            F.round(F.col("sum_value").cast("double"), 2).alias("total_value"),
            (
                F.floor(
                    F.col("sum_value").cast("double") / F.col("n_events") * 10000
                    + 0.5
                )
                / 10000
            ).alias("avg_value"),
        )

"""Streaming ingestion monitoring via ``foreachBatch``: the daily
per-type value series kept current incrementally, with the robust
MAD outlier view (`events_anomaly_mad`'s statistic) served from the
maintained state.

This is the streaming consumer of the monitoring family the batch
layer proves (`events_anomaly_mad` / `events_changepoint_cusum` /
`events_autocorr_daily`): the state is the (event_type, day) algebraic
partial table — count + exact DECIMAL value sum, the same partials as
``streaming/incremental.py`` — so the maintained series after ANY
micro-batch split equals the one-shot daily aggregate bit-for-bit
(DECIMAL addition is associative; no float ever enters the state).
The detectors then run READ-time over the bounded day-level state:
years x |types| rows however large the stream history, so re-running
the full robust statistic per refresh costs nothing and inherits the
batch query's oracle-gated semantics verbatim.

Restart safety follows the running-aggregate snapshot-sink scheme of
``streaming/sketch_stream.py``: each batch's ``batch_id=N`` partition
snapshots the POST-MERGE state, recovery resumes from the last
committed snapshot, and an already-committed batch never re-merges
(the committed sink is authoritative — re-merging a post-batch state
would double-count every day the batch touched).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tripl_spark.queries.analytics2 import MAD_K, MAD_THRESHOLD, robust_z
from tripl_spark.session import eager_checkpoint

__all__ = ["MAD_K", "MAD_THRESHOLD", "StreamingAnomalyMonitor", "daily_partials"]


def daily_partials(batch: DataFrame) -> DataFrame:
    """(event_type, day, n_events, sum_value) — exact DECIMAL partials
    for one slice of events."""
    return batch.groupBy(
        "event_type",
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,6)")).alias("sum_value"),
    )


class StreamingAnomalyMonitor:
    """Maintains the daily series across micro-batches (the
    ``foreachBatch(mon.process)`` target) and serves the robust
    outlier view from it."""

    _STATE_SCHEMA = (
        "event_type string, day string, n_events long, sum_value decimal(18,6)"
    )

    def __init__(self, spark: SparkSession, sink_path: str | None = None) -> None:
        from tripl_spark.streaming.sinks import committed_batches

        self.spark = spark
        self.sink_path = sink_path
        self.state: DataFrame | None = None
        self._seen: set[int] = set()
        if sink_path:
            committed = committed_batches(sink_path)
            self._seen = set(committed)
            if committed:
                self.state = self.spark.read.schema(self._STATE_SCHEMA).parquet(
                    f"{sink_path}/batch_id={max(committed)}"
                ).transform(eager_checkpoint)

    def process(self, batch: DataFrame, batch_id: int) -> None:
        if batch_id in self._seen:  # replay: idempotent skip
            return
        if self.sink_path is not None:
            # running-aggregate state: a COMMITTED batch must never
            # re-merge (see module docstring); the sink is authoritative
            from tripl_spark.streaming.sinks import committed_batches

            if batch_id in committed_batches(self.sink_path):
                self._seen.add(batch_id)
                return
        delta = daily_partials(batch)
        if self.state is None:
            merged = delta
        else:
            merged = self.state.unionByName(delta).groupBy("event_type", "day")
            merged = merged.agg(
                F.sum("n_events").alias("n_events"),
                F.sum("sum_value").alias("sum_value"),
            )
        # normalize to _STATE_SCHEMA on EVERY path: SUM over
        # decimal(18,6) widens to decimal(28,6), and a first-batch
        # snapshot written widened would be unreadable by the declared
        # recovery schema on restart
        merged = merged.select(
            "event_type",
            "day",
            F.col("n_events").cast("long").alias("n_events"),
            F.col("sum_value").cast("decimal(18,6)").alias("sum_value"),
        )
        # bounded state (years x |types| day rows); checkpoint so N
        # batches don't stack N plans
        new_state = merged.transform(eager_checkpoint)
        if self.sink_path is not None:
            new_state.write.mode("overwrite").parquet(
                f"{self.sink_path}/batch_id={batch_id}"
            )
        self.state = new_state
        self._seen.add(batch_id)

    def daily(self) -> DataFrame | None:
        """The maintained series in the batch query's terms."""
        if self.state is None:
            return None
        return self.state.select(
            "event_type", "day", "n_events",
            F.col("sum_value").cast("double").alias("x"),
        )

    def anomaly_summary(self) -> DataFrame | None:
        """Per-type robust outlier summary — the exact statistic of the
        oracled `events_anomaly_mad` query (same shared `robust_z`
        helper, so the two cannot drift), over everything seen."""
        daily = self.daily()
        if daily is None:
            return None
        rz = robust_z(daily.select("event_type", "day", "x"))
        return rz.groupBy("event_type").agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.sum(F.when(F.abs("z") > MAD_THRESHOLD, 1).otherwise(0))
            .cast("long").alias("n_anomalies"),
            F.round(F.max(F.abs("z")), 4).alias("max_abs_z"),
        )

    def anomalous_days(self) -> DataFrame | None:
        """(event_type, day, x, z) rows whose |modified z| exceeds the
        threshold — the alert feed. Thresholds on the UNROUNDED z (the
        statistic `anomaly_summary` counts), rounding only for display,
        so a boundary day counted in n_anomalies always appears here."""
        daily = self.daily()
        if daily is None:
            return None
        rz = robust_z(daily.select("event_type", "day", "x"))
        return (
            rz.filter(F.abs("z") > MAD_THRESHOLD)
            .select("event_type", "day", "x", F.round("z", 4).alias("z"))
        )

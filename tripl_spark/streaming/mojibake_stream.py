"""Streaming encoding-damage monitor: the mojibake prevalence counters
maintained per micro-batch on the generic ``CounterMonitor`` — a crawl
source whose decoder starts emitting garbage pages on a per-batch
counter instead of a nightly scan. Batch ≡ stream by the shared rollup
function (`operators/text.mojibake_prevalence_partials`), the same
discipline as the PII and quality monitors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tripl_spark.operators.text import (
    MOJIBAKE_PATTERNS,
    mojibake_prevalence_partials,
)
from tripl_spark.streaming.counter_monitor import CounterMonitor

__all__ = ["StreamingMojibakeMonitor"]

_COUNTERS = ("n_docs", "docs_damaged") + tuple(
    f"n_{name}" for name, _ in MOJIBAKE_PATTERNS
)
_STATE_SCHEMA = "source string, lang string, " + ", ".join(
    f"{c} long" for c in _COUNTERS
)


class StreamingMojibakeMonitor(CounterMonitor):
    """Maintains the encoding-damage counters across micro-batches
    (the ``foreachBatch(mon.process)`` target) and serves the
    prevalence scorecard from them."""

    def __init__(self, spark: SparkSession, sink_path: str | None = None) -> None:
        super().__init__(
            spark,
            partials_fn=mojibake_prevalence_partials,
            key_cols=("source", "lang"),
            counter_cols=_COUNTERS,
            state_schema=_STATE_SCHEMA,
            sink_path=sink_path,
        )

    def prevalence(self) -> DataFrame | None:
        """The maintained rollup in the registered batch query's exact
        terms (`text_mojibake_prevalence` column set and read-time
        rounding)."""
        if self.state is None:
            return None
        return self.state.select(
            "source",
            "lang",
            "n_docs",
            "docs_damaged",
            *[f"n_{name}" for name, _ in MOJIBAKE_PATTERNS],
            (
                F.round(F.col("docs_damaged") * 1.0 / F.col("n_docs"), 4)
                + F.lit(0.0)
            ).alias("damage_rate"),
        ).orderBy("source", "lang")

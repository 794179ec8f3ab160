"""Streaming PII prevalence monitoring via ``foreachBatch``: the
per-(source, lang) scrub counters of `operators/pii.py` kept current
incrementally over a document stream.

Why this shape at 100 TB/day: a source that starts leaking PII (a
crawler picks up a forum dump, a partner feed flips to raw logs)
should page within a micro-batch — redaction bugs discovered at the
next nightly batch job have already leaked into tokenizer shards. The
per-batch counters come from the LITERAL SAME rollup function the
registered `text_pii_prevalence` query uses
(`operators/pii.py:pii_prevalence_partials`, one regex constant
list), so the two surfaces cannot drift by construction; the
maintained counters after ANY micro-batch split
equal the one-shot batch rollup exactly (integer addition — see
`counter_monitor.py` for the restart contract).

The monitor judges the text it is GIVEN — no corpus enrichment here;
the registered batch query's deterministic PII planting is a property
of that query's gate, not of the operator. Feeding the monitor the
same enriched frame reproduces the registered rollup bit-for-bit
(pinned in tests/test_pii_stream.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tripl_spark.operators.pii import PII_CLASSES, pii_prevalence_partials
from tripl_spark.streaming.counter_monitor import CounterMonitor

__all__ = ["StreamingPIIMonitor", "pii_partials"]

_COUNTERS = ("n_docs", "docs_with_pii") + tuple(
    f"n_{name}" for name, _, _ in PII_CLASSES
)
_STATE_SCHEMA = "source string, lang string, " + ", ".join(
    f"{c} long" for c in _COUNTERS
)

# one rollup definition for both surfaces — see operators/pii.py
pii_partials = pii_prevalence_partials


class StreamingPIIMonitor(CounterMonitor):
    """Maintains the PII counters across micro-batches (the
    ``foreachBatch(mon.process)`` target) and serves the prevalence
    scorecard from them."""

    def __init__(self, spark: SparkSession, sink_path: str | None = None) -> None:
        super().__init__(
            spark,
            partials_fn=pii_partials,
            key_cols=("source", "lang"),
            counter_cols=_COUNTERS,
            state_schema=_STATE_SCHEMA,
            sink_path=sink_path,
        )

    def prevalence(self) -> DataFrame | None:
        """The maintained rollup in the registered batch query's exact
        terms (`text_pii_prevalence` column set and read-time
        rounding)."""
        if self.state is None:
            return None
        return self.state.select(
            "source",
            "lang",
            "n_docs",
            "docs_with_pii",
            *[f"n_{name}" for name, _, _ in PII_CLASSES],
            (
                F.round(F.col("docs_with_pii") * 1.0 / F.col("n_docs"), 4)
                + F.lit(0.0)
            ).alias("pii_rate"),
        ).orderBy("source", "lang")

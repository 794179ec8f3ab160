"""Streaming PII prevalence monitoring via ``foreachBatch``: the
per-(source, lang) scrub counters of `operators/pii.py` kept current
incrementally over a document stream.

Why this shape at 100 TB/day: a source that starts leaking PII (a
crawler picks up a forum dump, a partner feed flips to raw logs)
should page within a micro-batch — redaction bugs discovered at the
next nightly batch job have already leaked into tokenizer shards. The
per-document class counts come from the SAME `pii_counts` expression
chain the registered `text_pii_prevalence` rollup uses (one regex
constant list, `operators/pii.py:PII_CLASSES`), so the two surfaces
cannot drift; the maintained counters after ANY micro-batch split
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

from tripl_spark.operators.pii import PII_CLASSES, pii_counts
from tripl_spark.streaming.counter_monitor import CounterMonitor

__all__ = ["StreamingPIIMonitor", "pii_partials"]

_COUNTERS = ("n_docs", "docs_with_pii") + tuple(
    f"n_{name}" for name, _, _ in PII_CLASSES
)
_STATE_SCHEMA = "source string, lang string, " + ", ".join(
    f"{c} long" for c in _COUNTERS
)


def pii_partials(batch: DataFrame) -> DataFrame:
    """(source, lang, n_docs, docs_with_pii, n_<class>...) long
    counters for one slice of documents, from the shared precedence
    expression chain over the ``text`` column as given."""
    per_doc = batch.select("source", "lang", *pii_counts(F.col("text")))
    total = None
    for name, _, _ in PII_CLASSES:
        c = F.col(f"n_{name}")
        total = c if total is None else (total + c)
    return (
        per_doc.withColumn("__any", (total > 0).cast("long"))
        .groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("__any").cast("long").alias("docs_with_pii"),
            *[
                F.sum(f"n_{name}").cast("long").alias(f"n_{name}")
                for name, _, _ in PII_CLASSES
            ],
        )
    )


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

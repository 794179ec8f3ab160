"""Streaming domain-prevalence monitoring via ``foreachBatch``: the
per-registered-domain counters of `operators/urls.py` kept current
incrementally over a document stream.

Why this shape at 100 TB/day: domain concentration is a LIVE failure
mode — one SEO farm or mirror network flooding a crawl shifts the
corpus mix within hours, and quota tuning that waits for the nightly
rollup has already ingested the flood. The per-batch counters come
from the LITERAL SAME rollup function the registered
`url_domain_prevalence` query uses
(`operators/urls.py:domain_prevalence_partials`), so the two surfaces
cannot drift by construction; integer addition is associative, so the
maintained counters after ANY micro-batch split equal the one-shot
batch rollup exactly (see `counter_monitor.py` for the restart
contract).

The monitor judges the URL frame it is GIVEN (already parsed by
`url_components`) — the registered batch query's deterministic URL
planting is a property of that query's gate, not of the operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tripl_spark.operators.urls import domain_prevalence_partials
from tripl_spark.streaming.counter_monitor import CounterMonitor

__all__ = ["StreamingDomainMonitor", "domain_partials"]

_COUNTERS = ("n_docs", "n_http", "n_tracking")
_STATE_SCHEMA = "reg_domain string, " + ", ".join(
    f"{c} long" for c in _COUNTERS
)

# one rollup definition for both surfaces — see operators/urls.py
domain_partials = domain_prevalence_partials


class StreamingDomainMonitor(CounterMonitor):
    """Maintains the per-domain counters across micro-batches (the
    ``foreachBatch(mon.process)`` target) and serves the prevalence
    scorecard from them."""

    def __init__(
        self,
        spark: SparkSession,
        sink_path: str | None = None,
        raw_urls: bool = False,
    ) -> None:
        """``raw_urls=True`` accepts an unparsed ``(doc_id, url)``
        stream and runs `url_components` inside the batch (the CLI
        deployment shape); default expects the pre-parsed frame the
        registered batch query gates."""
        if raw_urls:
            from tripl_spark.operators.urls import attach_registered_domain

            def partials(batch: DataFrame) -> DataFrame:
                url = F.col("url")
                base = batch.select(
                    F.parse_url(url, F.lit("PROTOCOL")).alias("scheme"),
                    F.parse_url(url, F.lit("HOST")).alias("host"),
                    F.coalesce(F.parse_url(url, F.lit("QUERY")), F.lit(""))
                    .alias("qstring"),
                )
                return domain_partials(attach_registered_domain(base))
        else:
            partials = domain_partials
        super().__init__(
            spark,
            partials_fn=partials,
            key_cols=("reg_domain",),
            counter_cols=_COUNTERS,
            state_schema=_STATE_SCHEMA,
            sink_path=sink_path,
        )

    def prevalence(self) -> DataFrame | None:
        """The maintained rollup in the registered batch query's exact
        terms (`url_domain_prevalence` column set and read-time
        rounding)."""
        if self.state is None:
            return None
        total = self.state.agg(F.sum("n_docs").alias("__total"))
        return (
            self.state.crossJoin(F.broadcast(total))
            .select(
                "reg_domain",
                "n_docs",
                "n_http",
                "n_tracking",
                (
                    F.round(F.col("n_docs") * 1.0 / F.col("__total"), 6)
                    + F.lit(0.0)
                ).alias("doc_share"),
            )
            .orderBy("reg_domain")
        )

"""Streaming corpus-quality monitoring via ``foreachBatch``: the
per-(source, lang) Gopher scorecard kept current incrementally over a
document stream.

This is the streaming consumer of the rule battery the batch layer
proves (`text_gopher_rules` / `curation_gopher_scorecard`): the state
is the (source, lang) COUNTER table — docs seen, docs passing, and one
failure counter per rule — all plain longs, so the maintained
scorecard after ANY micro-batch split equals the one-shot batch query
bit-for-bit (integer addition is associative; the ratios are computed
READ-time from the counters with the same 4-dp rounding as the oracled
query). The per-document flags come from the SAME
`gopher_flag_frame` projection the registered query uses, so the two
surfaces cannot drift.

Why this shape at 100 TB/day: a crawl-quality regression (a source
flips to emitting boilerplate, a language's symbol ratio drifts) should
page within a micro-batch, not at the next nightly batch job. State is
|sources| x |langs| counter rows however large the stream history; each
batch costs one scan of the batch plus a counter merge.

Restart safety follows the running-aggregate snapshot-sink scheme of
``streaming/sketch_stream.py`` / ``monitor_stream.py``: each batch's
``batch_id=N`` partition snapshots the POST-MERGE counters, recovery
resumes from the last committed snapshot, and an already-committed
batch never re-merges (the committed sink is authoritative).

The state also carries the DROP-LEDGER counters (r11): per (source,
lang), how many documents each rule dropped under the battery's
FIRST-failing-rule precedence (`text.first_failing_rule` — the same
expression `pipeline_drop_ledger`'s fate column uses), so the
streaming `drop_ledger()` view and the batch ledger's rule fates are
one definition. A fail counter says "rule r is violated"; a drop
counter says "rule r is the REASON the doc left the corpus" — the
number the drop-rate alert should page on, because a doc failing two
rules must not be double-counted as two lost docs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tripl_spark.operators.text import (
    GOPHER_RULE_ORDER,
    first_failing_rule,
    gopher_flag_frame,
)
from tripl_spark.streaming.counter_monitor import CounterMonitor

__all__ = ["StreamingQualityMonitor", "quality_partials"]

# the shared battery-order definition — a private copy here could
# silently drift from first_failing_rule()'s fate strings
_RULES = GOPHER_RULE_ORDER


def quality_partials(batch: DataFrame) -> DataFrame:
    """(source, lang, n_docs, n_pass, n_fail_<rule>..., n_drop_<rule>...)
    — long counters for one slice of documents, from the shared flag
    projection. n_fail counts every violation of a rule; n_drop counts
    docs whose FIRST failing rule (battery order) is that rule — the
    conservation form: Σ n_drop = n_docs − n_pass exactly."""
    flags = gopher_flag_frame(batch, keep=("source", "lang"))
    fate = first_failing_rule()
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.when(F.col("passes"), 1).otherwise(0))
        .cast("long")
        .alias("n_pass"),
    ] + [
        F.sum(F.when(F.col(r), 0).otherwise(1))
        .cast("long")
        .alias(f"n_fail_{r[:-3]}")
        for r in _RULES
    ] + [
        F.sum(F.when(fate == f"rule_{r[:-3]}", 1).otherwise(0))
        .cast("long")
        .alias(f"n_drop_{r[:-3]}")
        for r in _RULES
    ]
    return flags.groupBy("source", "lang").agg(*aggs)


class StreamingQualityMonitor(CounterMonitor):
    """Maintains the quality counters across micro-batches (the
    ``foreachBatch(mon.process)`` target) and serves the scorecard
    from them. The restart-safe merge machinery lives in the generic
    ``counter_monitor.CounterMonitor`` (extracted from this class in
    r12); the quality-specific surface is the partials frame and the
    two read-time views."""

    _STATE_SCHEMA = (
        "source string, lang string, n_docs long, n_pass long, "
        "n_fail_wc long, n_fail_mwl long, n_fail_alpha long, "
        "n_fail_symbol long, n_fail_stop long, "
        "n_drop_wc long, n_drop_mwl long, n_drop_alpha long, "
        "n_drop_symbol long, n_drop_stop long"
    )
    _COUNTERS = (
        "n_docs", "n_pass", "n_fail_wc", "n_fail_mwl", "n_fail_alpha",
        "n_fail_symbol", "n_fail_stop",
        "n_drop_wc", "n_drop_mwl", "n_drop_alpha", "n_drop_symbol",
        "n_drop_stop",
    )

    def __init__(self, spark: SparkSession, sink_path: str | None = None) -> None:
        super().__init__(
            spark,
            partials_fn=quality_partials,
            key_cols=("source", "lang"),
            counter_cols=self._COUNTERS,
            state_schema=self._STATE_SCHEMA,
            sink_path=sink_path,
        )

    def drop_ledger(self) -> DataFrame | None:
        """The maintained streaming drop ledger: per (source, lang),
        raw long counters of documents each rule DROPPED under the
        battery's first-failing-rule precedence, plus the kept count.
        Integer-exact (split-invariant by associativity) and equal to
        the batch `pipeline_drop_ledger`'s rule-fate counts over the
        same documents — pinned in tests/test_quality_stream.py."""
        if self.state is None:
            return None
        return self.state.select(
            "source",
            "lang",
            "n_docs",
            F.col("n_pass").alias("n_kept"),
            F.col("n_drop_wc").alias("dropped_rule_wc"),
            F.col("n_drop_mwl").alias("dropped_rule_mwl"),
            F.col("n_drop_alpha").alias("dropped_rule_alpha"),
            F.col("n_drop_symbol").alias("dropped_rule_symbol"),
            F.col("n_drop_stop").alias("dropped_rule_stop"),
        )

    def scorecard(self) -> DataFrame | None:
        """The maintained scorecard in the oracled batch query's exact
        terms (`curation_gopher_scorecard` column set and rounding)."""
        if self.state is None:
            return None
        n = F.col("n_docs")
        return self.state.select(
            "source",
            "lang",
            n.alias("n_docs"),
            F.round(F.col("n_pass") * 1.0 / n, 4).alias("pass_rate"),
            F.round(F.col("n_fail_wc") * 1.0 / n, 4).alias("fail_wc"),
            F.round(F.col("n_fail_mwl") * 1.0 / n, 4).alias("fail_mwl"),
            F.round(F.col("n_fail_alpha") * 1.0 / n, 4).alias("fail_alpha"),
            F.round(F.col("n_fail_symbol") * 1.0 / n, 4).alias("fail_symbol"),
            F.round(F.col("n_fail_stop") * 1.0 / n, 4).alias("fail_stop"),
        )

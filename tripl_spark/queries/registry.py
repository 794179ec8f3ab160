"""Query registry — the single source of truth for the driver contract.

Every implemented operator registers here as a named query:
``fn(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible) an
equivalent ANSI-SQL oracle string for DuckDB. ``__spark_entry__``'s
``queries()`` / ``oracle_sql()`` are thin views over this registry.

Conventions that keep the Spark side and the DuckDB oracle hash-equal:

* alias every computed column identically on both sides;
* round float aggregates (``round(x, 2)`` money, ``round(x, 4)`` ratios)
  so double summation-order differences can't flip the value hash;
* emit dates/timestamps as ISO strings (engine-neutral types);
* break window/top-k ties with a unique key so LIMIT is deterministic.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QueryDef:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None → driver does a rows-only check
    doc: str = ""


REGISTRY: dict[str, QueryDef] = {}


def query(name: str, oracle: str | None = None, doc: str = "") -> Callable[[QueryFn], QueryFn]:
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame`` under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QueryDef(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return {name: qd.fn for name, qd in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _ensure_loaded()
    return {name: qd.oracle for name, qd in REGISTRY.items() if qd.oracle is not None}


_LOADED = False

# Explicit registry ordering: external correctness harnesses may only
# sample a prefix of the registry, so the prefix must contain the
# flagship oracled query of EVERY operator family (triple engine, graph,
# dedup, similarity, text, curation, skew, range/rollup, streaming,
# mixing, packing, tokenizer, search, multimodal) alongside
# representative TPC-H/analytics rows. Names listed here come first, in
# this order; everything else follows in registration order.
_PRIORITY = [
    # Round-12 rotation, per VERDICT r11 item 2 (the scripted recipe
    # at the r11 rotation note, executed): (a) queries whose ORACLE
    # or output semantics changed in r12 — the three audio queries
    # (fingerprint widened to 64-bit / 4x16-bit bands, operator AND
    # oracle), classifier_quality_train + approx_distinct_users
    # (converted rows-only -> full hash gates), sim_pca_explained_
    # variance (now emits the trace for both gated columns),
    # graph_ppr_converged (oracle total_mass CAST AS DOUBLE) —
    # then (b) the 14 r6-vintage names (the oldest driver evidence
    # after r11), then (c) r7-vintage refresh slots, alphabetical
    # first 29 of 50, filling the window at exactly 50. Latest-row
    # histogram from CORRECTNESS_r01..r11: r6x14, r7x50, r8x49,
    # r10x45, r11x50. Displaced names keep local DuckDB parity
    # coverage in tests/test_oracle_parity.py every suite run.
    #
    # (a0) queries NEW in r12 (PII scrub family + C4 line dedup) —
    # new queries lead the window, displacing the last r7-cohort slots
    "text_pii_scrub",
    "text_pii_prevalence",
    "dedup_lines_global",
    # (a) changed-semantics re-drives (r12)
    "multimodal_audio_fingerprint",
    "multimodal_audio_neardup",
    "multimodal_audio_dedup_groups",
    "classifier_quality_train",
    "approx_distinct_users",
    "sim_pca_explained_variance",
    "graph_ppr_converged",
    # (b) r6-vintage refresh cohort, alphabetical
    "part_price_unpivot",
    "q11_important_parts",
    "q12_ship_priority",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_part_supplier_relationship",
    "q4_order_priority",
    "q8_market_share",
    "repeat_buyers_intersect",
    "scalar_functions_showcase",
    "top5_parts_per_brand",
    "triple_datalog_join",
    "triple_reverse_fanin",
    "window_functions_showcase",
    # (c) r7-vintage refresh cohort, alphabetical, first 26 (three
    # slots went to the new r12 queries at the window head)
    "classifier_calibration_bins",
    "corpus_datacard",
    "curation_dsir_weights",
    "curation_stratified_sample",
    "dedup_embedding_cosine",
    "dedup_exact",
    "dedup_incremental_minhash",
    "dedup_incremental_semantic",
    "dedup_method_agreement",
    "dedup_minhash_oracled",
    "dedup_ngram_jaccard",
    "dedup_semantic_clusters",
    "dedup_semantic_groups",
    "dedup_simhash_oracled",
    "dedup_substring_spans",
    "events_ab_ztest",
    "events_changepoint_cusum",
    "events_gapfill_hourly",
    "events_markov_transitions",
    "graph_jaccard_links",
    "graph_kcore_2peel",
    "graph_lpa_2round",
    "mixing_epoch_schedule",
    "mixing_temperature_sample",
    "mixing_token_budget",
    "multimodal_metadata",
]
# r13 rotation note: after the r12 window lands, the oldest remaining
# vintages are the 24 r7-vintage names NOT in section (c) above
# (alphabetically from pipeline_full_curation onward — the three
# names the r12 additions displaced from (c) are part of this
# cohort), then the 49 r8-vintage names (recompute from
# CORRECTNESS_r01..r12 the way r9/r11/r12 did). The r13 window:
# (1) any queries new in r13, (2) those 24, (3) r8-vintage slots to
# fill, (4) any query whose oracle text changed semantically.


def _ensure_loaded() -> None:
    """Import every module that registers queries (idempotent), then
    reorder the registry so ``_PRIORITY`` names lead."""
    global _LOADED
    if _LOADED:
        return
    from tripl_spark.queries import advanced, analytics, analytics2, tpch, tpch2, tpch3, tpch4  # noqa: F401
    from tripl_spark.queries import graph_queries, streaming_queries, triples  # noqa: F401
    from tripl_spark.operators import classifier, clustering, curation, dedup, dedup_groups, dsir, graph_ann, mixing, multimodal, packing, pca, pii, pipeline, rangejoin, repetition, search, similarity, sketches, skew, substring, text, tokenizer  # noqa: F401

    ordered = {n: REGISTRY[n] for n in _PRIORITY if n in REGISTRY}
    ordered.update({n: qd for n, qd in REGISTRY.items() if n not in ordered})
    REGISTRY.clear()
    REGISTRY.update(ordered)
    _LOADED = True

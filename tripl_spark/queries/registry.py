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
    # Round-15 rotation, per the scripted recipe in the r14 note below
    # (executed): (1) the query NEW in r15 (cyclic '...' recursion over
    # a planted ref ring — the distributed-recursion rewrite's hash
    # gate), (2) changed-oracle re-drives — the URL family + provenance
    # ledger (public-suffix handling upgraded to a broadcast PSL-lite
    # rule table), the mojibake pair (double-encoding table widened
    # 7 -> 37 digraphs), dedup_paragraphs_global (NULL-coalesced
    # planting), dedup_minhash_lsh (NEWLY ORACLED: hash-gated capped
    # banding path, rows-only count 6 -> 5), and the PII pair (6th
    # secret-credential class) — plus triple_pull_recursive, whose
    # ORACLE text is unchanged but whose implementation moved to the
    # dynamic-frontier distributed assembly this round, (3) all 33
    # r10-vintage names (the oldest driver evidence after r14),
    # alphabetical, (4) the first 2 alphabetical r11-vintage names to
    # fill 50. Latest-row histogram recomputed from
    # CORRECTNESS_r01..r14: r10x33, r11x46, r12x48, r13x48, r14x50.
    # Displaced names keep local DuckDB parity coverage in
    # tests/test_oracle_parity.py every suite run.
    #
    # (1) new in r15
    "triple_pull_recursive_cyclic",
    "url_domain_quota_quality",
    "text_pii_spans",
    "url_crawl_politeness",
    "url_robots_filter",
    "pipeline_crawl_admission",
    # (2) changed-oracle / changed-implementation re-drives (r15)
    "url_host_scan",
    "url_domain_quota",
    "url_domain_quota_kept",
    "url_blocklist_drops",
    "url_domain_prevalence",
    "pipeline_provenance_curation",
    "text_outlink_scan",
    "dedup_paragraphs_global",
    "text_mojibake_scan",
    "text_mojibake_prevalence",
    "dedup_minhash_lsh",
    "text_pii_scrub",
    "text_pii_prevalence",
    "triple_pull_recursive",
    # (3) r10-vintage refresh cohort: first 30 of 33 alphabetical —
    # the last three (triple_attr_stats, triple_history_audit,
    # triple_skipindex_asof) defer to r16 with the r11 cohort;
    # sections (1)+(2) grew to 20 and the mandatory re-drives outrank
    # vintage refresh
    "events_funnel_conversion",
    "events_psi_drift",
    "events_retention_cohorts",
    "events_trend_ols",
    "events_weekday_profile",
    "graph_ppr_related_parts",
    "graph_user_ancestry",
    "mixing_leakage_safe_split",
    "multimodal_video_dedup_groups",
    "multimodal_video_neardup",
    "multimodal_video_scene_cuts",
    "packing_greedy",
    "pipeline_classifier_curation",
    "pipeline_decontaminated_corpus",
    "pipeline_drop_ledger",
    "pipeline_leakage_safe_corpus",
    "q10_returned_items",
    "q13_customer_distribution",
    "q17_small_quantity_revenue",
    "q18_large_volume_customers",
    "sim_bitext_margin_pairs",
    "sim_int8_quant_recall",
    "sim_kcenter_diverse",
    "sim_label_separation",
    "sim_mmr_rerank",
    "sim_recall_at_k_eval",
    "text_gopher_rules",
    "text_ttr_by_source",
    "tokenizer_fertility_by_lang",
    "tokenizer_trained_fertility_by_lang",
]
# r16 rotation note: after the r15 window lands, the oldest remaining
# evidence is the three deferred r10 names (triple_attr_stats,
# triple_history_audit, triple_skipindex_asof) and then the full r11
# cohort of 46 (recompute from CORRECTNESS_r01..r15 the way every
# round since r9 did). The r16 window: (1) any queries new in r16,
# (2) any query whose oracle text (or implementation, materially)
# changed, (3) the three deferred r10 names, (4) r11-vintage names
# alphabetical to fill 50.


def _ensure_loaded() -> None:
    """Import every module that registers queries (idempotent), then
    reorder the registry so ``_PRIORITY`` names lead."""
    global _LOADED
    if _LOADED:
        return
    from tripl_spark.queries import advanced, analytics, analytics2, tpch, tpch2, tpch3, tpch4  # noqa: F401
    from tripl_spark.queries import graph_queries, streaming_queries, triples  # noqa: F401
    from tripl_spark.operators import classifier, clustering, curation, dedup, dedup_groups, dsir, graph_ann, mixing, multimodal, packing, pca, pii, pipeline, rangejoin, repetition, search, similarity, sketches, skew, substring, text, tokenizer, urls  # noqa: F401

    ordered = {n: REGISTRY[n] for n in _PRIORITY if n in REGISTRY}
    ordered.update({n: qd for n, qd in REGISTRY.items() if n not in ordered})
    REGISTRY.clear()
    REGISTRY.update(ordered)
    _LOADED = True

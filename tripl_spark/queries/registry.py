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
    # Round-13 rotation, per the scripted recipe in the r12 note below
    # (executed): (1) the query NEW in r13 (newline-splitter global
    # line dedup), (2) changed-oracle re-drives — the two PII queries
    # (credit-card class added to PII_CLASSES, so the shared scrub CTE
    # chain and the planted corpus changed in BOTH engines; the scrub
    # query additionally gained the Luhn-valid count column), (3) the
    # 24 r7-vintage names (the oldest driver evidence after r12,
    # alphabetically from pipeline_full_curation onward), (4) the
    # first 20 alphabetical ORACLED r8-vintage names (the window stays
    # zero-rows-only; the 4 rows-only r8 names keep their suite-level
    # evidence). Latest-row histogram from CORRECTNESS_r01..r12:
    # r7x24, r8x48, r10x43, r11x46, r12x50. Displaced names keep local
    # DuckDB parity coverage in tests/test_oracle_parity.py every
    # suite run.
    #
    # (1) new in r13
    "dedup_lines_newline",
    "triple_pull_paths_cyclic",
    "text_mojibake_scan",
    "text_mojibake_prevalence",
    # (2) changed-oracle re-drives (r13)
    "text_pii_scrub",
    "text_pii_prevalence",
    # (3) r7-vintage refresh cohort, alphabetical (all 24)
    "pipeline_full_curation",
    "pipeline_full_curation_bycutoff",
    "pipeline_perplexity_buckets",
    "pipeline_perplexity_bycutoff",
    "pipeline_semantic_curation",
    "pipeline_semantic_decontamination",
    "sim_ann_hnsw",
    "sim_ann_lsh",
    "sim_ann_pq",
    "sim_hybrid_rrf",
    "sim_knn_filtered",
    "sketch_hll_overlap",
    "sketch_hll_sliding_7d",
    "stats_corr_value_k",
    "stats_value_by_type",
    "text_bigram_logprob",
    "text_lang_id",
    "text_ngram_contamination",
    "text_quality_score",
    "text_token_entropy",
    "text_token_stats",
    "triple_datalog_aggregate",
    "triple_datalog_disjunction",
    "triple_datalog_negation",
    # (4) r8-vintage refresh cohort, alphabetical oracled, first 20
    "curation_quota_per_stratum",
    "curation_redacted_texts",
    "curation_top_quality_per_lang",
    "events_autocorr_daily",
    "events_seasonal_naive_mape",
    "graph_components_purchasers",
    "graph_copurchase_lift",
    "graph_pagerank_purchasers",
    "graph_triangle_count",
    "hypertable_rollup_daily",
    "mixing_split_assign",
    "multimodal_audio_features",
    "multimodal_features",
    "multimodal_frame_sample",
    "multimodal_image_dhash",
    "multimodal_video_frame_dhash",
    "packing_bin_assign",
    "pipeline_curation_end2end",
    "q1_pricing_summary",
    "range_join_error_followups",
]
# r14 rotation note: after the r13 window lands, the oldest remaining
# vintages are the 28 r8-vintage names NOT in section (4) above
# (alphabetical from sim_ann_ivfpq onward plus the 4 rows-only
# r8 names) and then the r10 cohort (recompute from
# CORRECTNESS_r01..r13 the way r9/r11/r12/r13 did). The r14 window:
# (1) any queries new in r14, (2) any query whose oracle text changed
# semantically, (3) those r8 names (oracled first), (4) r10-vintage
# slots to fill 50.


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

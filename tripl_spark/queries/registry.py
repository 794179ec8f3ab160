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
    # Round-9 rotation, exactly per VERDICT r8 item 2 and the r8 note
    # here: (a) first driver rows for queries NEW in r9, (b) first
    # rows for the 17 late-r8 additions (zero driver rows so far;
    # triple_skipindex_asof leads — it gates the persistence path the
    # r9 skip-index fix touched), then (c) r5-vintage refresh slots
    # filling the 50-row window (latest-row histogram from
    # CORRECTNESS_r01..r08: r5×43, r6×33, r7×50, r8×50). Displaced
    # names keep local DuckDB parity coverage in
    # tests/test_oracle_parity.py every suite run.
    #
    # (a) NEW in r9 — first driver rows
    "multimodal_video_dedup_groups",
    "multimodal_audio_dedup_groups",
    "multimodal_audio_neardup",
    "tokenizer_trained_fertility_by_lang",
    "sim_bitext_margin_pairs",
    "sim_kcenter_diverse",
    "text_gopher_rules",
    "sim_int8_quant_recall",
    "curation_gopher_scorecard",
    "mixing_leakage_safe_split",
    "dedup_gram_novelty",
    "pipeline_leakage_safe_corpus",
    "pipeline_drop_ledger",
    "events_psi_drift",
    # (b) late-r8 — first driver rows
    "triple_skipindex_asof",
    "graph_ppr_related_parts",
    "sim_covariance_slice",
    "dedup_reference_containment",
    "multimodal_image_dedup_groups",
    "events_anomaly_mad",
    "text_ttr_by_source",
    "sim_label_separation",
    "events_weekday_profile",
    "sim_recall_at_k_eval",
    "sim_mmr_rerank",
    "triple_attr_stats",
    "triple_history_audit",
    "sim_pca_explained_variance",
    "events_trend_ols",
    "graph_ppr_converged",
    "tokenizer_fertility_by_lang",
    # (c) r5-vintage refresh cohort, alphabetical for auditability
    # (fills the window; the remainder of the 43 r5 names queue first
    # for r10 — see the r10 note below)
    "classifier_auc_eval",
    "classifier_linear_probe_2step",
    "classifier_logreg_2step",
    "cluster_kmeans_2iter",
    "curation_weighted_sample",
    "dedup_groups_canonical",
    "events_funnel_conversion",
    "events_retention_cohorts",
    "graph_user_ancestry",
    "multimodal_image_neardup",
    "multimodal_video_neardup",
    "multimodal_video_scene_cuts",
    "packing_greedy",
    "pipeline_classifier_curation",
    "pipeline_decontaminated_corpus",
    "q10_returned_items",
    "q13_customer_distribution",
    "q17_small_quantity_revenue",
    "q18_large_volume_customers",
    # (d) r5-vintage remainder past the 50-slot window (positions
    # 51+): still r5 after r9 — they lead the r10 refresh cohort
    "q19_discounted_revenue",
    "q20_seasonal_shippers",
    "q21_waiting_suppliers",
    "q22_global_sales_opportunity",
    "q2_min_cost_supplier",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q9_product_profit",
    "search_bm25",
    "sim_ann_ivf",
    "sim_ann_ivf_kmeans",
    "sim_ann_knn_graph",
    "sketch_bloom_membership",
    "sketch_heavy_hitters",
    "sketch_hll_registers",
    "sketch_quantile_merge",
    "tokenizer_bpe2_compression",
    "tokenizer_bpe_2merges",
    "tokenizer_vocab_coverage",
    "top3_customers_per_nation",
    "triple_match_segment",
    "triple_pull_df_wildcard",
]
# r10 rotation note: after the r9 window lands, the oldest remaining
# vintages are the 24 (d)-section r5 names above, then the 33
# r6-vintage entries (recompute from CORRECTNESS_r01..r09 the way r9
# did). The r10 window: (1) any queries new in r10, (2) the (d)
# names, (3) r6-vintage slots to fill, (4) any query whose oracle
# text changed.


def _ensure_loaded() -> None:
    """Import every module that registers queries (idempotent), then
    reorder the registry so ``_PRIORITY`` names lead."""
    global _LOADED
    if _LOADED:
        return
    from tripl_spark.queries import advanced, analytics, analytics2, tpch, tpch2, tpch3, tpch4  # noqa: F401
    from tripl_spark.queries import graph_queries, streaming_queries, triples  # noqa: F401
    from tripl_spark.operators import classifier, clustering, curation, dedup, dedup_groups, dsir, graph_ann, mixing, multimodal, packing, pca, pipeline, rangejoin, repetition, search, similarity, sketches, skew, substring, text, tokenizer  # noqa: F401

    ordered = {n: REGISTRY[n] for n in _PRIORITY if n in REGISTRY}
    ordered.update({n: qd for n, qd in REGISTRY.items() if n not in ordered})
    REGISTRY.clear()
    REGISTRY.update(ordered)
    _LOADED = True

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
    # Round-8 rotation, exactly per VERDICT r7 item 1: (a) first rows
    # for the queries added in r8 (the LSH-composed filtered-ANN twin,
    # LPA-to-convergence, the datalog rule+aggregate composition),
    # then (b) the FULL 43-entry cohort whose latest driver row is
    # r4-vintage (computed from CORRECTNESS_r01..r07: multimodal and
    # tokenizer families, pagerank/triangles, ivfpq/multiprobe, skew,
    # streaming-adjacent, triple r4 stragglers, q1). 43 + new ≤ the
    # 50-slot window, so after r8 every registry entry has a driver
    # row no older than r5. Displaced names keep local DuckDB parity
    # coverage in tests/test_oracle_parity.py every suite run.
    #
    # (a) NEW in r8 — first driver rows
    "sim_ann_lsh_filtered",
    "graph_lpa_converged",
    "triple_datalog_rule_aggregate",
    "events_autocorr_daily",
    "events_seasonal_naive_mape",
    "graph_copurchase_lift",
    "text_zipf_fit",
    # (b) the r4-vintage refresh cohort (latest row ≤ r4), grouped by
    # family; alphabetical within a family for auditability
    "triple_asof_snapshot",
    "triple_datalog_ancestor",
    "triple_match_nested",
    "triple_pull_projection",
    "triple_pull_recursive",
    "q1_pricing_summary",
    "hypertable_rollup_daily",
    "range_join_error_followups",
    "stream_join_error_followups",
    "stateful_sessions_stream",
    "skew_salted_agg_events",
    "skew_salted_join_user_spend",
    "graph_components_purchasers",
    "graph_pagerank_purchasers",
    "graph_triangle_count",
    "cluster_kmeans_embeddings",
    "sim_ann_ivfpq",
    "sim_ann_multiprobe",
    "sim_embedding_stats",
    "sim_knn_bruteforce",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "sketch_countmin_terms",
    "multimodal_audio_features",
    "multimodal_audio_fingerprint",
    "multimodal_features",
    "multimodal_frame_sample",
    "multimodal_image_dhash",
    "multimodal_video_frame_dhash",
    "text_bpe_token_count",
    "text_chunking",
    "text_fingerprint",
    "text_repetition_filters",
    "text_tfidf_top_terms",
    "text_unigram_logprob",
    "tokenizer_bpe_merges",
    "tokenizer_first_merge",
    "curation_quota_per_stratum",
    "curation_redacted_texts",
    "curation_top_quality_per_lang",
    "mixing_split_assign",
    "packing_bin_assign",
    "pipeline_curation_end2end",
    # (c) LATE-r8 additions past the 50-slot window (positions 51+;
    # the r6-late precedent): zero driver rows until r9 — local DuckDB
    # parity covers them meanwhile; they lead the r9 window.
    "events_anomaly_mad",
    "text_ttr_by_source",
    "sim_label_separation",
    "events_weekday_profile",
    "sim_recall_at_k_eval",
    "sim_mmr_rerank",
    "triple_attr_stats",
    "triple_history_audit",
    "dedup_reference_containment",
    "triple_skipindex_asof",
    "sim_covariance_slice",
    "sim_pca_explained_variance",
    "events_trend_ols",
    "graph_ppr_related_parts",
    "graph_ppr_converged",
    "tokenizer_fertility_by_lang",
    "multimodal_image_dedup_groups",
]
# r9 rotation note: after the r8 window lands, every entry except the
# late-r8 names above has a driver row no older than r5. The r9
# window: (1) the late-r8 additions (first rows), (2) the
# entries whose latest row is r5 vintage (recompute from
# CORRECTNESS_r01..r09 the way r8 did), (3) any query whose oracle
# text changes in r9.


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

"""Physical-plan quality gates: the plan you'd want at 100 TB, asserted.

Two layers:

* a global sweep — NO registered query may plan a CartesianProduct or a
  row-at-a-time Python UDF (BatchEvalPython). Arrow-batched pandas
  operators (ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas) are
  the sanctioned Python escape hatch and stay allowed.
* targeted assertions — filter pushdown reaches the parquet scan, small
  dimensions broadcast, aggregation is map-side partial, deterministic
  sampling stays shuffle-free.
"""

from __future__ import annotations

import pytest

from tripl_spark.queries.registry import REGISTRY, _ensure_loaded
from tripl_spark.sources.bucketing import explain_str

_ensure_loaded()
ALL = sorted(REGISTRY)


@pytest.mark.parametrize("name", ALL)
def test_no_cartesian_no_rowwise_python(spark, sf_small, name):
    plan = explain_str(REGISTRY[name].fn(spark, sf_small))
    assert "CartesianProduct" not in plan, f"{name} plans a cartesian product"
    assert "BatchEvalPython" not in plan, f"{name} plans a row-at-a-time Python UDF"


def _plan(spark, sf, name):
    return explain_str(REGISTRY[name].fn(spark, sf))


def test_q6_filter_pushdown_and_pruning(spark, sf_small):
    plan = _plan(spark, sf_small, "q6_forecast_revenue")
    assert "PushedFilters: [" in plan
    # the revenue query needs 4 lineitem columns; the scan must not read
    # the full 11-column schema
    read_schema = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "l_returnflag" not in read_schema, read_schema


def test_q3_broadcasts_customer(spark, sf_small):
    plan = _plan(spark, sf_small, "q3_shipping_priority")
    assert "BroadcastHashJoin" in plan


def test_q1_partial_aggregation(spark, sf_small):
    # map-side partial + final: two HashAggregate operators around the
    # exchange, so only pre-aggregated rows shuffle
    plan = _plan(spark, sf_small, "q1_pricing_summary")
    assert plan.count("HashAggregate") >= 2


def test_sample_is_shuffle_free(spark, sf_small):
    plan = _plan(spark, sf_small, "curation_stratified_sample")
    assert "Exchange" not in plan, plan


def test_q21_joins_orders_once(spark, sf_small):
    # the decorrelated Q21 scans orders exactly once (the EXISTS pair
    # is computed off the flagged frame, not by re-joining orders)
    plan = _plan(spark, sf_small, "q21_waiting_suppliers")
    assert plan.count("orders.parquet") == 1, plan


def test_pipeline_fuses_to_two_shuffles(spark, sf_small):
    # the end-to-end curation pipeline must stay ONE fused plan:
    # exactly one shuffle for the fingerprint aggregation and one for
    # the stratum window; the keepers side joins via broadcast
    import re

    plan = _plan(spark, sf_small, "pipeline_curation_end2end")
    shuffles = re.findall(r"\(\d+\) Exchange\b", plan)
    assert len(shuffles) <= 2, plan
    assert "BroadcastHashJoin" in plan, plan


def test_chunking_is_shuffle_free(spark, sf_small):
    import re

    plan = _plan(spark, sf_small, "text_chunking")
    assert not re.findall(r"\(\d+\) Exchange\b", plan), plan


def test_bloom_probe_is_broadcast(spark, sf_small):
    # the ≤ m-row bit table must broadcast to the probe join — the
    # corpus-scale side never shuffles for membership checks
    plan = _plan(spark, sf_small, "sketch_bloom_membership")
    assert "BroadcastHashJoin" in plan, plan


def test_sketch_aggs_are_partial(spark, sf_small):
    # count-min cells and HLL registers are algebraic partials: a
    # map-side HashAggregate must combine before the one shuffle
    for name in ("sketch_countmin_terms", "sketch_hll_registers"):
        plan = _plan(spark, sf_small, name)
        assert plan.count("HashAggregate") >= 2, (name, plan)


def test_quantile_probe_is_broadcast_nested_loop(spark, sf_small):
    # the 3-row probe frame joins the merged summary on an inequality:
    # the right shape is a broadcast nested-loop over the ≤ (K+1)·shards
    # sample rows, never a sort-merge over raw data
    plan = _plan(spark, sf_small, "sketch_quantile_merge")
    assert "BroadcastNestedLoopJoin" in plan, plan


def test_heavy_hitter_counts_are_partial_aggs(spark, sf_small):
    # the (shard, term) count — the only full-data shuffle — must
    # map-side combine; everything downstream operates on summary rows
    plan = _plan(spark, sf_small, "sketch_heavy_hitters")
    assert plan.count("HashAggregate") >= 2, plan


def test_semantic_dedup_pairs_only_within_clusters(spark, sf_small):
    # the pair stage must be an equi-join on cid (never a corpus
    # cross-product); assignment is a map-only literal-codebook
    # expression (r15) so the plan needs NO broadcast and NO
    # assignment shuffle — the pair stage's single corpus exchange is
    # the cid repartition, reused by both join sides and the
    # cluster-size cap window
    plan = _plan(spark, sf_small, "dedup_semantic_clusters")
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
    assert "hashpartitioning(cid" in plan, plan
    assert "hashpartitioning(vec_id" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_weighted_sample_is_take_ordered(spark, sf_small):
    # global top-k must plan TakeOrderedAndProject (per-partition
    # heaps), not a full sort of the corpus
    plan = _plan(spark, sf_small, "curation_weighted_sample")
    assert "TakeOrderedAndProject" in plan, plan
    assert "Sort " not in plan, plan


def test_bigram_count_tables_broadcast(spark, sf_small):
    # both LM count tables are vocabulary-sized and must broadcast
    # back onto the bigram stream — the corpus never shuffles by doc
    # for the scoring join
    plan = _plan(spark, sf_small, "text_bigram_logprob")
    assert plan.count("BroadcastHashJoin") >= 2, plan


def test_semantic_pipeline_antijoin_broadcasts(spark, sf_small):
    # the dropped-id list (distinct pair projection, << corpus) must
    # broadcast into the survivors anti-join; the pipeline's only
    # corpus-sized shuffle is the doc⋈embedding equi-join
    plan = _plan(spark, sf_small, "pipeline_semantic_curation")
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan


def test_token_budget_mixing_broadcasts_tiny_tables(spark, sf_small):
    # bucket offsets (sources x buckets rows) and per-source budgets
    # (sources rows) must broadcast onto the corpus-sized stream; the
    # prefix-sum windows are the only shuffles of real data
    plan = _plan(spark, sf_small, "mixing_token_budget")
    assert plan.count("BroadcastHashJoin") >= 2, plan


def test_decontamination_broadcasts_bench_and_dropped(spark, sf_small):
    # both small sides must broadcast: the benchmark gram set into the
    # overlap join and the contaminated-id list into the anti-join —
    # the training corpus never shuffles for either
    plan = _plan(spark, sf_small, "pipeline_decontaminated_corpus")
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "LeftAnti" in plan, plan


def test_vocab_coverage_membership_is_broadcast(spark, sf_small):
    # the fixed vocabulary broadcasts onto the token stream; membership
    # must never shuffle the corpus
    plan = _plan(spark, sf_small, "tokenizer_vocab_coverage")
    assert "BroadcastHashJoin" in plan, plan


def test_per_group_topk_has_partial_window_group_limit(spark, sf_small):
    # The per-group top-k windows' scale safety depends on Spark's
    # WindowGroupLimit PARTIAL pushdown: each map task ships only k
    # rows per group to the exchange instead of the whole group
    # (otherwise a skewed stratum serializes through one task). This
    # held on Spark 4.1.2 but nothing gated it — a conf or version
    # change could silently reintroduce per-group skew, so pin it.
    import re

    partial_wgl = re.compile(
        r"\(\d+\) WindowGroupLimit\nInput[^\n]*\nArguments: [^\n]*, Partial\n"
    )
    for name in (
        "top3_customers_per_nation",
        "top5_parts_per_brand",
        "curation_quota_per_stratum",
        "pipeline_curation_end2end",
        "pipeline_semantic_curation",
        "pipeline_decontaminated_corpus",
        "url_domain_quota_kept",
        "url_domain_quota_quality",
    ):
        plan = _plan(spark, sf_small, name)
        assert partial_wgl.search(plan), (name, plan)


# Queries allowed to plan a GLOBAL (unpartitioned) window — each one
# verified to feed the window from a BOUNDED relation, so the
# single-task sort never sees corpus-scale rows:
#   classifier_auc_eval / classifier_calibration_bins — cumulative sums
#     over per-rounded-score aggregate rows (|distinct scores| <= 10^4)
#   events_type_share — share-of-total over per-event-type counts
#     (|event types| rows, a fixed enum)
#   search_bm25 / tokenizer_first_merge — rank over a TakeOrdered top-k
#   sketch_quantile_merge — rank/weight sums over <= (K+1) x shards
#     summary rows
# (q15_top_supplier left the list in r7: its window-max became a 1-row
# broadcast aggregate with a ReusedExchange on the revenue view)
_GLOBAL_WINDOW_ALLOWED = {
    "classifier_auc_eval",
    "classifier_calibration_bins",
    "curation_dsir_weights",  # rank window post-TakeOrdered, ≤ DSIR_TOP rows
    "events_type_share",
    "graph_copurchase_lift",  # rank window post-TakeOrdered, ≤ LIFT_TOP rows
    "graph_jaccard_links",  # rank window post-TakeOrdered, ≤ LINK_TOP rows
    "graph_ppr_related_parts",  # rank window post-TakeOrdered, ≤ PPR_TOP rows
    "text_zipf_fit",  # rank window post-TakeOrdered, ≤ ZIPF_TOP rows
    "search_bm25",
    "sim_hybrid_rrf",  # all three rank windows post-TakeOrdered, ≤ LIST_N rows
    "sketch_quantile_merge",
    "tokenizer_first_merge",
}


def _global_windows(plan: str) -> list[str]:
    """Window nodes with NO partition spec. Formatted-plan Arguments
    are ``[funcs], [partition], [order]``; the order list is absent
    for unordered frames, so a 2-group form is global only when its
    last group carries sort specs (``NULLS``)."""
    import re

    out = []
    for m in re.finditer(r"\(\d+\) Window\b[^\n]*\nInput[^\n]*\nArguments: ([^\n]*)", plan):
        groups = m.group(1).split("], [")
        if len(groups) == 1 or (len(groups) == 2 and "NULLS" in groups[-1]):
            out.append(m.group(1)[:120])
    return out


@pytest.mark.parametrize("name", ALL)
def test_global_windows_only_on_bounded_relations(spark, sf_small, name):
    # any single-partition WindowExec serializes its whole input
    # through one task — a scale-killer unless the input is bounded.
    # New queries that trip this must either partition the window or
    # justify boundedness and join the allowlist above.
    gw = _global_windows(explain_str(REGISTRY[name].fn(spark, sf_small)))
    if name in _GLOBAL_WINDOW_ALLOWED:
        return
    assert not gw, (
        f"{name} plans {len(gw)} global window(s) over an unverified "
        f"relation: {gw}"
    )


def test_q15_scalar_max_is_broadcast_aggregate_no_window(spark, sf_small):
    # the scalar max must come from a 1-row broadcast AGGREGATE, never
    # a global window: every stage stays parallel (AQE may additionally
    # dedupe the twin revenue shuffles via its reuse cache, but that is
    # scheduling-dependent — the gated property is the absence of any
    # serialized stage, plus pushdown on both scan branches)
    plan = _plan(spark, sf_small, "q15_top_supplier")
    assert not _global_windows(plan), plan
    assert "BroadcastExchange" in plan, plan
    assert plan.count("PushedFilters: [IsNotNull(l_shipdate)") >= 1, plan


def test_tokenizer_first_merge_is_take_ordered(spark, sf_small):
    # the pair-ranking top-k must plan TakeOrderedAndProject (per-
    # partition heaps); the rank window then sees only k rows
    plan = _plan(spark, sf_small, "tokenizer_first_merge")
    assert "TakeOrderedAndProject" in plan, plan


def test_perplexity_cutoff_twins_have_no_per_lang_corpus_window(spark, sf_small):
    # the production twins' whole point: NO ntile (no per-lang sort of
    # the full relation). The only per-lang windows run over the capped
    # sample, whose cap is WindowGroupLimit-pushed PARTIAL so map tasks
    # ship <= cap rows per lang; the <= |langs| cutoff rows broadcast
    import re

    partial_wgl = re.compile(r"WindowGroupLimit\b[^\n]*\n[^\n]*\n[^\n]*Partial")
    for name in ("pipeline_perplexity_bycutoff", "pipeline_full_curation_bycutoff"):
        plan = _plan(spark, sf_small, name)
        assert "ntile" not in plan, (name, plan)
        assert partial_wgl.search(plan), (name, plan)
        assert "BroadcastHashJoin" in plan, (name, plan)


def test_hll_overlap_is_sketch_sized_after_one_corpus_agg(spark, sf_small):
    # the register build is the ONLY event-sized work (map-side
    # combined); everything downstream — union sketch, three
    # estimates, the 1-row purchase scalar — joins via broadcast over
    # <= 64-row tables
    plan = _plan(spark, sf_small, "sketch_hll_overlap")
    assert plan.count("HashAggregate") >= 2, plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan


def test_lpa_argmax_is_aggregate_not_window(spark, sf_small):
    # the per-node mode pick must be a max_by HashAggregate — a window
    # ranked by vote count would re-sort every node's label votes
    plan = _plan(spark, sf_small, "graph_lpa_2round")
    assert "Window" not in plan, plan
    assert plan.count("HashAggregate") >= 2, plan


def test_semantic_decontamination_is_broadcast_bounded(spark, sf_small):
    # the benchmark embeddings (tiny by definition) must broadcast into
    # a nested-loop cosine match — bench x corpus, linear in the corpus
    # — and the contaminated-id list must broadcast into the anti-join;
    # a CartesianProduct here would be corpus x corpus
    plan = _plan(spark, sf_small, "pipeline_semantic_decontamination")
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "LeftAnti" in plan, plan


def test_filtered_knn_pushes_predicate_to_documents_scan(spark, sf_small):
    # the pre-filter shape: lang = 'en' must reach the documents
    # parquet scan as a pushed filter, and the qualifying ids
    # semi-join the embedding side BEFORE scoring
    plan = _plan(spark, sf_small, "sim_knn_filtered")
    assert "EqualTo(lang,en)" in plan, plan
    assert "LeftSemi" in plan, plan


def test_lsh_filtered_pushes_predicate_and_composes_semi_join(spark, sf_small):
    # the indexed filtered-ANN twin: the lang predicate must still
    # reach the documents parquet scan, the allowed-id semi-join must
    # prune the bucketed side, and the probe must be a bucket-keyed
    # equi-join (broadcast hash on qbucket=bucket) — never a cartesian
    # scan of the qualifying set
    plan = _plan(spark, sf_small, "sim_ann_lsh_filtered")
    assert "EqualTo(lang,en)" in plan, plan
    assert "LeftSemi" in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_bitext_is_broadcast_nested_loop_over_slices(spark, sf_small):
    # the scored frame is bounded-slice x bounded-slice: the target
    # slice must BROADCAST into a nested-loop join — a CartesianProduct
    # (checked globally) or a shuffled join here would be wrong for
    # two tiny slices; the margin normalizers are plain aggregates
    plan = _plan(spark, sf_small, "sim_bitext_margin_pairs")
    assert "BroadcastNestedLoopJoin" in plan, plan


def test_kcenter_argmaxes_are_take_ordered(spark, sf_small):
    # each greedy pick is a 1-row argmax: orderBy().limit(1) must plan
    # TakeOrderedAndProject (per-partition heaps), never a global sort
    # of the distance column
    plan = _plan(spark, sf_small, "sim_kcenter_diverse")
    assert "TakeOrderedAndProject" in plan, plan
    assert "BroadcastNestedLoopJoin" in plan, plan  # 1-row pick vectors


def test_gopher_rules_is_scan_shaped(spark, sf_small):
    # the rule battery is pure codegen scan expressions: no shuffle
    # (no Exchange), no join, no window — one pass over documents
    plan = _plan(spark, sf_small, "text_gopher_rules")
    assert "Exchange" not in plan, plan
    assert "Join" not in plan, plan
    assert "Window" not in plan, plan


def test_robots_filter_never_shuffles_the_corpus(spark, sf_small):
    # longest-prefix election runs inside codegen over each doc's
    # matched-rule array: one corpus scan, one broadcast join against
    # the per-host rule dim, NO shuffle exchange, no window, no agg
    import re

    plan = _plan(spark, sf_small, "url_robots_filter")
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1, plan
    assert "BroadcastHashJoin" in plan, plan
    assert not re.findall(r"\(\d+\) Exchange\b", plan), plan
    assert "Window" not in plan, plan
    assert "HashAggregate" not in plan, plan


def test_crawl_politeness_two_keyed_shuffles(spark, sf_small):
    # fetch log scanned ONCE; two keyed aggregations ((host,hour) then
    # host), each with a map-side partial; the PSL lookup broadcasts
    # against |hosts| rows AFTER the second agg, never per fetch
    import re

    plan = _plan(spark, sf_small, "url_crawl_politeness")
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1, plan
    assert len(re.findall(r"\(\d+\) Exchange\b", plan)) == 2, plan
    assert len(re.findall(r"\(\d+\) HashAggregate", plan)) == 4, plan
    assert "BroadcastHashJoin" in plan, plan


def test_pii_spans_is_scan_shaped(spark, sf_small):
    # span ledger = one corpus pass: the 6 class branches ride ONE
    # inline() Generate over a struct array — no shuffle, no join, no
    # window, and no per-class re-scan of documents
    import re

    plan = _plan(spark, sf_small, "text_pii_spans")
    assert "Exchange" not in plan, plan
    assert "Join" not in plan, plan
    assert "Window" not in plan, plan
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1, plan


def test_video_groups_has_no_pair_clique_join(spark, sf_small):
    # the r9 star-edge rewrite: grouping must NOT pay the frame-hash
    # self-join pair stage — the only dhash-keyed join is the star
    # root attach (fh x per-hash min), and CC then runs over star
    # edges. A clique build would show the id_a < id_b pair filter.
    plan = _plan(spark, sf_small, "multimodal_video_dedup_groups")
    assert "id_a" not in plan or "hamming" not in plan, plan
    # group election window partitions by group — allowed; the plan
    # must still contain the CC membership join and no cartesian
    assert "Window" in plan, plan


def test_hll_sketch_side_has_no_exact_predistinct_exchange(spark, sf_small):
    # r12 verdict finding: the HLL register max is duplicate-idempotent,
    # so the sketch side must NOT pre-.distinct() — that would be the
    # exact-distinct full-key shuffle the sketch exists to avoid. The
    # ONLY exchange keyed by user_id is the exact countDistinct's (kept
    # deliberately for the error story); the sketch side's first
    # shuffle keys on (event_type, register) after map-side partial max.
    plan = _plan(spark, sf_small, "approx_distinct_users")
    ex_lines = [l for l in plan.splitlines() if "hashpartitioning" in l]
    user_keyed = [l for l in ex_lines if "user_id" in l]
    assert len(user_keyed) == 1, user_keyed
    assert any("register" in l for l in ex_lines), ex_lines


def test_url_host_scan_zero_shuffle_broadcast_psl(spark, sf_small):
    # parse + registered-domain extraction: a single pruned scan with
    # the public-suffix rule TABLE arriving via exactly two broadcast
    # joins (exact rows, wildcard rows — r15) and ZERO shuffle; no
    # Python anywhere
    import re

    plan = _plan(spark, sf_small, "url_host_scan")
    assert len(re.findall(r"\(\d+\) BroadcastHashJoin", plan)) == 2, plan
    assert not re.findall(r"\(\d+\) Exchange\b", plan), plan  # no shuffle
    # only the columns the scan needs (doc_id drives the planting;
    # source/lang/n_chars ride url_components but prune out here)
    assert "text" not in plan.split("ReadSchema")[1].splitlines()[0], plan


def test_url_blocklist_joins_broadcast(spark, sf_small):
    # four few-row dimensions (2 PSL rule joins + 2 blocklist rule
    # joins): ALL must broadcast — a shuffled join here moves the
    # corpus to meet a handful of rows
    import re

    plan = _plan(spark, sf_small, "url_blocklist_drops")
    assert len(re.findall(r"\(\d+\) BroadcastHashJoin", plan)) == 4, plan
    assert not re.findall(r"\(\d+\) Exchange\b", plan), plan


def test_url_domain_quota_single_domain_keyed_shuffle(spark, sf_small):
    # the quota pays exactly ONE shuffle, keyed by reg_domain (the
    # window partition); no second exchange, no join
    import re

    plan = _plan(spark, sf_small, "url_domain_quota")
    ex = re.findall(r"\(\d+\) Exchange\b", plan)
    assert len(ex) == 1, plan
    assert "reg_domain" in [l for l in plan.splitlines()
                            if "hashpartitioning" in l][0], plan


def test_provenance_pipeline_single_scan_single_shuffle(spark, sf_small):
    # the composed provenance ledger must stay ONE corpus scan (every
    # content signal is a projection on the URL-parse scan, never a
    # doc_id join back), TWO broadcast rule joins, and ONE shuffle
    # (the null-guarded quota window) — no union double-read
    import re

    plan = _plan(spark, sf_small, "pipeline_provenance_curation")
    assert plan.count("documents.parquet") == 1, plan
    assert len(re.findall(r"\(\d+\) BroadcastHashJoin", plan)) == 2, plan
    assert len(re.findall(r"\(\d+\) Exchange\b", plan)) == 1, plan


def test_admission_pipeline_single_scan_single_shuffle(spark, sf_small):
    # robots → blocklist → quota composed: ONE corpus scan, FIVE
    # broadcast joins (per-host robots arrays, 2 PSL suffix rules,
    # 2 blocklist rules), and exactly ONE shuffle (the null-guarded
    # quota window) — the provenance ledger's shape with the robots
    # election riding codegen
    import re

    plan = _plan(spark, sf_small, "pipeline_crawl_admission")
    assert plan.count("documents.parquet") == 1, plan
    assert len(re.findall(r"\(\d+\) BroadcastHashJoin", plan)) == 5, plan
    assert len(re.findall(r"\(\d+\) Exchange\b", plan)) == 1, plan


def test_outlink_scan_is_map_only(spark, sf_small):
    # link extraction + per-link domain mapping ride higher-order
    # functions on one scan: no Exchange, no Join, no explode-regroup
    plan = _plan(spark, sf_small, "text_outlink_scan")
    assert "Exchange" not in plan, plan
    assert "Join" not in plan, plan
    assert "Generate" not in plan, plan  # no explode

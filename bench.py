"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Each query is forced end-to-end with .collect() (results are small
aggregates; collect materializes the full plan). A session-warm-up query
runs first so JVM/codegen startup isn't billed to the first query, and
each query is timed $SPARK_GRAFT_BENCH_RUNS times (default 3) with the
MEDIAN reported — single-run numbers on a shared host are noise (round 1
recorded one query at 8x its reproducible time).
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tripl_spark.queries.registry import all_queries  # noqa: E402
from tripl_spark.session import get_spark  # noqa: E402

HEADLINE = [
    # TPC-H style
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q18_large_volume_customers",
    "q21_waiting_suppliers",
    "q2_min_cost_supplier",
    # windows / grouping sets / events
    "top3_customers_per_nation",
    "nation_year_rollup",
    "events_sessionization",
    "events_hourly_tumbling",
    "events_user_props_stats",
    "asof_last_purchase",
    "range_join_error_followups",
    "hypertable_rollup_daily",
    # triple engine (melt + match/pull/datalog plans)
    "triple_match_nested",
    "triple_pull_projection",
    "triple_datalog_join",
    "triple_asof_snapshot",
    "graph_user_ancestry",
    "graph_components_purchasers",
    # LLM-pipeline operators
    "dedup_exact",
    "dedup_minhash_lsh",
    "text_quality_score",
    "text_lang_id",
    "sim_knn_bruteforce",
    "sim_ann_lsh",
    # curation / skew / contamination
    "curation_quota_per_stratum",
    "skew_salted_join_user_spend",
    "text_ngram_contamination",
    "text_unigram_logprob",
    # round-4 additions (index-build-heavy sim_ann_hnsw and the
    # streaming-drain stream_join stay out: their cost is fixed
    # machinery, not data-path throughput)
    "pipeline_curation_end2end",
    "dedup_incremental_minhash",
    "dedup_substring_spans",
    "text_chunking",
    # round-5 additions (trained-codebook ANN + the mergeable-sketch
    # family's quantile representative)
    "sim_ann_ivf_kmeans",
    "sketch_quantile_merge",
    # round-5b additions: heavy hitters (local-top-k merge),
    # SemDeDup-style semantic dedup, and the cross-modal curation
    # pipeline — the ones with real data-path cost; the weighted
    # sample / bigram LM / token-budget mix are single-shuffle or
    # scan-shaped and already covered by the same patterns above
    "sketch_heavy_hitters",
    "dedup_semantic_clusters",
    "pipeline_semantic_curation",
    # classifier family representative: training (2 gradient-step
    # aggregations) + corpus scoring + the rank-sum AUC window
    "classifier_auc_eval",
    # round-6 additions: CCNet-style LM bucketing (bigram-LM train +
    # score + per-lang ntile — the perplexity-filter data path) and
    # the all-stage corpus-build composition
    "pipeline_perplexity_buckets",
    "pipeline_full_curation",
    # round-7: the broadcast-cutoff production twins (stage 4 without
    # the per-lang window sort) — benched next to their exact-ntile
    # counterparts so the twin's cost delta is a recorded number
    "pipeline_perplexity_bycutoff",
    "pipeline_full_curation_bycutoff",
    # round-8: the indexed filtered search next to its brute-force
    # twin (the recorded delta is the index's candidate pruning), and
    # the basket-capped association pair join (the new pair stage)
    "sim_ann_lsh_filtered",
    "sim_knn_filtered",
    "graph_copurchase_lift",
    # round-8b: the shuffle-twin contamination shape (distributed
    # reference gram universe — distinct + left join on the gram key),
    # benched next to the broadcast scan it complements
    "dedup_reference_containment",
    # round-9: media group resolution (decode → per-frame hash → CC →
    # election, the heaviest multimodal data path) and the trained-
    # tokenizer fertility (vocab learn + broadcast-literal encode —
    # two corpus scans, zero corpus shuffles for encoding)
    "multimodal_video_dedup_groups",
    "tokenizer_trained_fertility_by_lang",
    # round-11: whitening composed with the ANN family — one
    # covariance GEMM pass, a map-only whitening projection, and two
    # bucket-probe joins (raw + whitened index recall vs exact ground
    # truth); the round's one new data path
    "sim_whitened_lsh_recall",
    # round-12: the PII scrub data path (map-only regex redaction +
    # per-class counting over the full corpus — the shape every
    # pre-tokenization pipeline pays per document) and the C4-style
    # global line dedup (line explode → distinct-line keeper join →
    # per-doc reassembly, the two-shuffle repeated-line removal)
    "text_pii_scrub",
    "dedup_lines_global",
    # round-13: the newline-splitter line dedup (real C4 line unit over
    # planted multi-line docs; same keeper core as the row above)
    "dedup_lines_newline",
    # round-14: the URL curation pair with real data-path cost — the
    # domain-keyed quota window (one shuffle over the full corpus) and
    # the Arrow-batched NFC normalization scan (the corpus-wide
    # Python-stage cost every canonicalization pass pays; the host
    # scan and blocklist joins are scan-shaped and covered above)
    "url_domain_quota",
    "text_normalize_scan",
    # round-15: the quality-ordered quota (same one-shuffle window as
    # url_domain_quota but with the Gopher flags riding the scan — the
    # recorded delta IS the battery's cost), the PII span ledger (the
    # audit scan's 6-class inline over one corpus pass), and the
    # events-log politeness rollup (two keyed partial-agged shuffles)
    "url_domain_quota_quality",
    "text_pii_spans",
    "url_crawl_politeness",
]


def _canary(spark) -> dict[str, float]:
    """Host-throughput calibration recorded alongside the timings: a
    pinned numpy GEMM (1024x1024, seeded) and a trivial 32-partition
    Spark sum over a fixed range. Both are constant work, so
    cross-round totals can be normalized by them to separate code
    regressions from host drift — the r4/r5 same-day A/B showed this
    host's multi-thread throughput drifts >=1.4x between runs, and
    without a canary every cross-round comparison re-litigates that.
    Best-of-N timing (min, not median): the canary estimates the
    host's CEILING, and only downward noise exists for fixed work."""
    import numpy as np

    rng = np.random.default_rng(42)
    a = rng.standard_normal((1024, 1024))
    b = rng.standard_normal((1024, 1024))
    a @ b  # warm BLAS threads / allocator
    gemm = min(
        _timed(lambda: a @ b) for _ in range(5)
    )
    counter = lambda: spark.range(0, 100_000_000, 1, 32).selectExpr(  # noqa: E731
        "sum(id % 7) AS s"
    ).collect()
    counter()  # warm
    spark_sum = min(_timed(counter) for _ in range(3))
    return {"gemm_sec": round(gemm, 4), "spark_sum_sec": round(spark_sum, 4)}


def _timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def _layout_ab(spark, sf_dir: str) -> dict[str, float]:
    """Bucketed-layout A/B: ONE fact⋈fact join (lineitem⋈orders on
    orderkey, revenue by order priority) over plain parquet vs
    bucketed tables. SCALE.md claims the bucketed layout elides both
    Exchanges; this records the measured end-to-end delta so the
    claim has a number. The bucketed WRITE runs outside the measured
    window (it is the one-time cost the layout amortizes across every
    subsequent join on the key). Broadcast is disabled for both sides
    so the A/B compares shuffled-SMJ vs bucket-co-located-SMJ — the
    100 TB shape, where neither fact table broadcasts."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from tripl_spark.session import load_table
    from tripl_spark.sources.bucketing import (
        ensure_database,
        n_exchanges,
        write_bucketed,
    )

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )

    def revenue(li_df, o_df):
        return (
            li_df.join(o_df, li_df["l_orderkey"] == o_df["o_orderkey"])
            .groupBy("o_orderpriority")
            .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"))
        )

    loc = tempfile.mkdtemp(prefix="bench_bucket_wh_")
    old_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # a killed prior run can leave a stale benchbuck database whose
        # LOCATION no longer exists; CREATE ... IF NOT EXISTS would keep
        # it, so drop first
        spark.sql("DROP TABLE IF EXISTS benchbuck.lineitem_b")
        spark.sql("DROP TABLE IF EXISTS benchbuck.orders_b")
        spark.sql("DROP DATABASE IF EXISTS benchbuck")
        ensure_database(spark, "benchbuck", loc)
        write_bucketed(li, "benchbuck.lineitem_b", "l_orderkey", 16)
        write_bucketed(orders, "benchbuck.orders_b", "o_orderkey", 16)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plain_q = revenue(li, orders)
        buck_q = revenue(
            spark.table("benchbuck.lineitem_b"), spark.table("benchbuck.orders_b")
        )
        plain_q.collect(); buck_q.collect()  # warm both paths
        plain = min(_timed(plain_q.collect) for _ in range(3))
        bucketed = min(_timed(buck_q.collect) for _ in range(3))
        return {
            "plain_sec": round(plain, 3),
            "bucketed_sec": round(bucketed, 3),
            "plain_exchanges": n_exchanges(plain_q),
            "bucketed_exchanges": n_exchanges(buck_q),
        }
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_bc)
        spark.sql("DROP TABLE IF EXISTS benchbuck.lineitem_b")
        spark.sql("DROP TABLE IF EXISTS benchbuck.orders_b")
        spark.sql("DROP DATABASE IF EXISTS benchbuck")
        shutil.rmtree(loc, ignore_errors=True)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = get_spark("tripl_spark_bench")
    queries = all_queries()
    names = [n for n in HEADLINE if n in queries]

    # warm up JVM / parquet footer caches outside the measured window
    queries[names[0]](spark, sf_dir).collect()

    runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    # Samples are taken in PASSES over the whole query list (pass 1 of
    # every query, then pass 2, ...) rather than back-to-back per query:
    # on a shared host a transient load burst then contaminates at most
    # one sample per query instead of all of them, so the per-query
    # median is robust to bursty noise (r4 recorded 14 untouched queries
    # 10-48% "slower" from exactly this kind of burst).
    samples: dict[str, list[float]] = {name: [] for name in names}
    for _ in range(runs):
        for name in names:
            t0 = time.perf_counter()
            queries[name](spark, sf_dir).collect()
            samples[name].append(time.perf_counter() - t0)
    timings = {n: round(statistics.median(s), 3) for n, s in samples.items()}
    spreads = {n: round(max(s) - min(s), 3) for n, s in samples.items()}

    total = round(sum(timings.values()), 3)
    canary = _canary(spark)
    # the layout A/B is a side experiment — it must never cost us the
    # already-computed headline timings (catalog/tempdir failures land
    # as an error marker in the artifact instead)
    try:
        layout = _layout_ab(spark, sf_dir)
    except Exception as ex:  # noqa: BLE001
        layout = {"error": str(ex)[:120]}
    # Diagnostics (full per-query medians + spread across runs) go to
    # stderr: the driver captures only the last ~2000 chars of stdout and
    # parses the JSON line out of that tail, so the stdout line must stay
    # short and be last. The stdout line truncates to the top-20 queries
    # when long (below), so stderr is the only place the complete timing
    # set survives — emit it here.
    print(
        json.dumps({"runs_per_query": runs, "timings": timings, "spread": spreads}),
        file=sys.stderr,
    )
    line = json.dumps(
        {
            "metric": "headline_queries_total",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "sf": sf,
            "canary": canary,
            "layout": layout,
        }
    )
    if len(line) > 1800:
        # Hard guard: never emit a line the driver's tail window can split.
        # Flag the truncation so the artifact can't be mistaken for the
        # full timing set (full timings still go to stderr above).
        slim = {k: timings[k] for k in sorted(timings, key=timings.get, reverse=True)[:20]}
        line = json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": slim,
                "sf": sf,
                "canary": canary,
                "layout": layout,
                "truncated": True,
                "dropped_queries": len(timings) - len(slim),
            }
        )
    print(line)
    sys.stdout.flush()


if __name__ == "__main__":
    main()

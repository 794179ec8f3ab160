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


class _TaskTimeProbe:
    """Per-query executor task run time, read from the application's own
    status endpoint (``/api/v1/.../stages`` — one local HTTP GET per
    harvest, outside every timed window). Stage ids increase
    monotonically, so the task time of one bench query is the sum of
    ``executorRunTime`` over the stages whose id is above the previous
    harvest's high-water mark — immune to the status store's
    retained-stages eviction, which corrupts naive cumulative-sum
    deltas. Any failure (endpoint disabled, API drift) degrades to
    ``harvest() -> None`` and the bench simply omits the scaling digest;
    timings are never affected."""

    def __init__(self, spark) -> None:
        self._url = None
        self._max_id = -1
        try:
            sc = spark.sparkContext
            if sc.uiWebUrl:
                self._url = f"{sc.uiWebUrl}/api/v1/applications/{sc.applicationId}/stages"
                self.harvest()  # prime the high-water mark / validate
        except Exception:  # noqa: BLE001
            self._url = None

    def harvest(self) -> float | None:
        """Task seconds accrued in stages created since the last call."""
        if self._url is None:
            return None
        try:
            import urllib.request

            with urllib.request.urlopen(self._url, timeout=10) as r:
                stages = json.load(r)
            new = [s for s in stages if s.get("stageId", -1) > self._max_id]
            if new:
                self._max_id = max(s["stageId"] for s in new)
            return sum(s.get("executorRunTime", 0) for s in new) / 1000.0
        except Exception:  # noqa: BLE001
            self._url = None
            return None


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

    # The status endpoint (spark.ui.enabled) is the per-query executor
    # task-time source for the scaling digest; it adds no timed-path
    # work (the AppStatusListener runs regardless, the endpoint is only
    # polled between queries). Session tuning is otherwise identical.
    spark = get_spark("tripl_spark_bench", extra_conf={"spark.ui.enabled": "true"})
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
    task_samples: dict[str, list[float]] = {name: [] for name in names}
    probe = _TaskTimeProbe(spark)
    for _ in range(runs):
        for name in names:
            t0 = time.perf_counter()
            queries[name](spark, sf_dir).collect()
            samples[name].append(time.perf_counter() - t0)
            dt = probe.harvest()
            if dt is not None:
                task_samples[name].append(dt)
    timings = {n: round(statistics.median(s), 3) for n, s in samples.items()}
    spreads = {n: round(max(s) - min(s), 3) for n, s in samples.items()}
    task_sec = {
        n: round(statistics.median(s), 3)
        for n, s in task_samples.items()
        if s
    }

    total = round(sum(timings.values()), 3)
    canary = _canary(spark)
    # the layout A/B is a side experiment — it must never cost us the
    # already-computed headline timings (catalog/tempdir failures land
    # as an error marker in the artifact instead)
    try:
        layout = _layout_ab(spark, sf_dir)
    except Exception as ex:  # noqa: BLE001
        layout = {"error": str(ex)[:120]}
    # Diagnostics (full-precision per-query medians, spread, executor
    # task-time, canary, layout) go to stderr: the driver captures only
    # the last ~2000 chars of combined output and parses the stdout JSON
    # line out of that tail, so the stdout line must stay short and be
    # last; stderr is where the complete diagnostic set survives (and
    # bench stdouts are committed under plans/ each round).
    print(
        json.dumps(
            {
                "runs_per_query": runs,
                "timings": timings,
                "spread": spreads,
                "task_sec": task_sec,
                "canary": canary,
                "layout": layout,
            }
        ),
        file=sys.stderr,
    )
    # stdout contract line. The r13-r15 BENCH artifacts all record a
    # 2000-char capture window with the JSON line intact at its tail, so
    # the hard budget is ~1998 chars; 1980 leaves newline margin. The
    # old top-20 truncation cost the driver per-query history for 40 of
    # 60 entries (two spurious "dropped_from_bench" rows in PERF_r15) —
    # instead, fit ALL queries by rounding stdout timings to 2 dp
    # (stderr keeps 3 dp) and packing the optional diagnostics in
    # priority order: "par" (per-query parallelism digest: one digit per
    # query, floor(min(9, executor_task_sec / wall_sec)), same key order
    # as "queries" — 0 = driver/planning-bound, 1 = serial task, >=2 =
    # parallel; full task_sec floats are on stderr), then canary, then
    # layout. Anything that does not fit stays stderr-only. The legacy
    # truncation guard remains as a last resort only.
    budget = 1980
    core = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": {n: round(v, 2) for n, v in timings.items()},
        "sf": sf,
        "cpus": int(spark.sparkContext.defaultParallelism),
    }
    extras = []
    if len(task_sec) == len(names):
        digest = "".join(
            str(min(9, int(task_sec[n] / timings[n]))) if timings[n] > 0 else "0"
            for n in names
        )
        extras.append(("par", digest))
    extras.append(("canary", canary))
    extras.append(("layout", layout))
    out = dict(core)
    line = json.dumps(out, separators=(",", ":"))
    for key, val in extras:
        cand = dict(out)
        cand[key] = val
        cand_line = json.dumps(cand, separators=(",", ":"))
        if len(cand_line) <= budget:
            out, line = cand, cand_line
    if len(line) > budget:
        # Last resort: never emit a line the driver's tail window can
        # split. Flag the truncation so the artifact can't be mistaken
        # for the full timing set (full timings still go to stderr).
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

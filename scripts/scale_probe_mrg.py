"""Multi-row-group scale probe (VERDICT r15 item 6): the sf0.1 testdata
parquet is single-row-group, so scan stages cannot split and every
corpus map pass serializes on one core — which hides data-path wins and
makes the bench look core-count-insensitive. This probe rewrites the
tables the top bench entries read into an N-file layout (content
identical — same rows; the rewrite happens OUTSIDE any timed region and
into a throwaway directory, never back into the testdata), then times
the top entries on both layouts with wall + executor task-time so the
parallel share is a recorded number.

Usage: python scripts/scale_probe_mrg.py [n_files] [out_json]
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tripl_spark.queries.registry import all_queries  # noqa: E402
from tripl_spark.session import TABLES, get_spark, load_table  # noqa: E402

TOP = [
    "multimodal_video_dedup_groups",
    "pipeline_full_curation",
    "pipeline_full_curation_bycutoff",
    "dedup_semantic_clusters",
    "text_pii_scrub",
]


def task_probe(spark):
    sc = spark.sparkContext
    url = f"{sc.uiWebUrl}/api/v1/applications/{sc.applicationId}/stages"
    state = {"max": -1}

    def harvest() -> float:
        with urllib.request.urlopen(url, timeout=10) as r:
            stages = json.load(r)
        new = [s for s in stages if s.get("stageId", -1) > state["max"]]
        if new:
            state["max"] = max(s["stageId"] for s in new)
        return sum(s.get("executorRunTime", 0) for s in new) / 1000.0

    return harvest


def main() -> None:
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    out_path = sys.argv[2] if len(sys.argv) > 2 else "plans/r16/SCALE_probe_mrg.json"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    spark = get_spark("scale_probe_mrg", extra_conf={"spark.ui.enabled": "true"})
    qs = all_queries()

    mrg = tempfile.mkdtemp(prefix="sf_mrg_")
    try:
        for t in TABLES:
            # N files -> N splittable scan tasks; rows identical
            df = load_table(spark, sf_dir, t)
            df.repartition(n_files).write.mode("overwrite").parquet(
                os.path.join(mrg, f"{t}.parquet")
            )
        harvest = task_probe(spark)
        results: dict[str, dict] = {}
        for name in TOP:
            row: dict[str, dict] = {}
            for label, d in (("single_rg", sf_dir), ("multi_file", mrg)):
                qs[name](spark, d).collect()  # warm
                walls, tasks = [], []
                for _ in range(runs):
                    harvest()
                    t0 = time.perf_counter()
                    qs[name](spark, d).collect()
                    walls.append(time.perf_counter() - t0)
                    tasks.append(harvest())
                row[label] = {
                    "wall_sec": round(statistics.median(walls), 3),
                    "task_sec": round(statistics.median(tasks), 3),
                }
            results[name] = row
        out = {"n_files": n_files, "runs": runs, "sf_dir": sf_dir, "queries": results}
        with open(out_path, "w") as fp:
            json.dump(out, fp, indent=2)
        print(json.dumps(out))
    finally:
        shutil.rmtree(mrg, ignore_errors=True)


if __name__ == "__main__":
    main()

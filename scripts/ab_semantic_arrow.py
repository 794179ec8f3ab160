"""A/B: the oracle-gated expression cosine kernel vs the Arrow GEMM
twin (`semantic_dedup_pairs` vs `semantic_dedup_pairs_arrow`) — the
recorded number VERDICT r15 item 5 asked for.

Methodology (guide §1.4): both paths consume the SAME materialized
assignment frame (checkpointed once, outside the timed region — we are
timing the pair-stage kernel, not the shared codebook build), are
forced end-to-end with the noop sink, warmed once, and timed
median-of-N. Prints one JSON line.

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python scripts/ab_semantic_arrow.py
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from tripl_spark.operators.clustering import (  # noqa: E402
    _assign_literal,
    kmeans_2iter_centroid_rows,
    semantic_dedup_pairs,
    semantic_dedup_pairs_arrow,
)
from tripl_spark.session import eager_checkpoint, get_spark, load_table  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5"))
    spark = get_spark("ab_semantic_arrow")
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    assigned = eager_checkpoint(
        _assign_literal(emb, kmeans_2iter_centroid_rows(emb)).select(
            "vec_id", "v", "cid"
        )
    )

    def noop(df) -> float:
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    expr_df = semantic_dedup_pairs(assigned)
    arrow_df = semantic_dedup_pairs_arrow(assigned)
    noop(expr_df)
    noop(arrow_df)  # warm both
    expr_s = [noop(expr_df) for _ in range(runs)]
    arrow_s = [noop(arrow_df) for _ in range(runs)]
    n_pairs = expr_df.count()
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "runs": runs,
                "n_pairs": n_pairs,
                "expr_kernel_sec": round(statistics.median(expr_s), 3),
                "arrow_gemm_sec": round(statistics.median(arrow_s), 3),
                "expr_samples": [round(s, 3) for s in expr_s],
                "arrow_samples": [round(s, 3) for s in arrow_s],
            }
        )
    )


if __name__ == "__main__":
    main()

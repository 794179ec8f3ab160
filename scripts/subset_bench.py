"""Time a subset of registered headline queries with bench.py's own
methodology (median of N pass-interleaved .collect() runs) plus the
host canaries. Usage:

    python scripts/subset_bench.py name1 name2 ... [--runs N]

Prints one JSON line to stdout."""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tripl_spark.queries.registry import all_queries  # noqa: E402
from tripl_spark.session import get_spark  # noqa: E402


def _timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    runs = 3
    for a in sys.argv[1:]:
        if a.startswith("--runs="):
            runs = int(a.split("=", 1)[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("tripl_spark_subset_bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    names = [n for n in args if n in queries]

    import numpy as np

    rng = np.random.default_rng(42)
    a = rng.standard_normal((1024, 1024))
    b = rng.standard_normal((1024, 1024))
    a @ b
    gemm = min(_timed(lambda: a @ b) for _ in range(5))

    queries[names[0]](spark, sf_dir).collect()  # warm-up
    samples: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(runs):
        for name in names:
            spark.sparkContext.setJobDescription(f"subset_bench:{name}")
            samples[name].append(
                _timed(lambda: queries[name](spark, sf_dir).collect())
            )
            spark.sparkContext.setJobDescription(None)
    timings = {n: round(statistics.median(s), 3) for n, s in samples.items()}
    spreads = {n: round(max(s) - min(s), 3) for n, s in samples.items()}
    print(
        json.dumps(
            {
                "queries": timings,
                "spread": spreads,
                "total": round(sum(timings.values()), 3),
                "gemm_sec": round(gemm, 4),
                "runs": runs,
            }
        )
    )


if __name__ == "__main__":
    main()

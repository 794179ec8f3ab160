"""Per-query cost split for every bench.py headline entry: DataFrame
construction time (driver-side Python/py4j + analysis triggered at
build), first .collect() (Catalyst optimization + codegen + execution),
and warm re-collect median-of-3 of the SAME DataFrame (pure re-execution
— the repeated task compute). Separates fixed per-plan driver cost from
real data-path cost (guide §1.1). Usage:

    python scripts/split_bench.py [name ...]   # default: all headline

Prints one JSON line per query to stdout plus a totals line.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from tripl_spark.queries.registry import all_queries  # noqa: E402
from tripl_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("tripl_spark_split_bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    names = [a for a in sys.argv[1:] if a in queries] or [
        n for n in HEADLINE if n in queries
    ]
    queries[names[0]](spark, sf_dir).collect()  # session warm-up
    tot_c = tot_f = tot_w = 0.0
    for name in names:
        t0 = time.perf_counter()
        df = queries[name](spark, sf_dir)
        t1 = time.perf_counter()
        df.collect()
        t2 = time.perf_counter()
        warm = []
        for _ in range(3):
            t3 = time.perf_counter()
            df.collect()
            warm.append(time.perf_counter() - t3)
        c, f, w = t1 - t0, t2 - t1, statistics.median(warm)
        tot_c, tot_f, tot_w = tot_c + c, tot_f + f, tot_w + w
        print(json.dumps({"query": name, "construct": round(c, 3),
                          "first_collect": round(f, 3),
                          "warm_collect": round(w, 3)}))
        sys.stdout.flush()
    print(json.dumps({"total_construct": round(tot_c, 2),
                      "total_first": round(tot_f, 2),
                      "total_warm": round(tot_w, 2), "n": len(names)}))


if __name__ == "__main__":
    main()

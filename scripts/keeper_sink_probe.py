"""Keeper-sink probe: full-snapshot vs merge-on-read changelog.

The r14 verdict's open question: the keeper-table monitors (line
dedup, canonical-URL frontier) hold one state row per distinct unit
corpus-wide, and the default CounterMonitor sink rewrites the FULL
post-merge state every micro-batch — O(|state|) per batch, so total
sink work over a B-batch stream with linearly growing state is
O(B²·batch). This probe measures both sinks on the same synthetic
URL stream at growing stream lengths and fits the exponent of total
sink rows written (the exact work driver — counted from the sink
partitions themselves, noise-free) and wall time vs B.

Expected: snapshot sink alpha(rows) → 2.0; fixed-period changelog
(compact_every=4) alpha(rows) → ~1.5 (Σ|delta| linear + B/4 fulls of
growing state: still super-linear, a 1/N cut of the quadratic term);
SIZE-TRIGGERED changelog (compact_ratio=1.0) alpha(rows) → ~1.0 —
fulls fire at doubling points, so total full cost telescopes to
O(final state) and the sink work is LINEAR in stream length (the
classic amortized-doubling argument, measured here).

Run: python scripts/keeper_sink_probe.py  (local, ~1 min)
"""

from __future__ import annotations

import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PROBE_DIR = "/tmp/keeper_sink_probe"
BATCH_URLS = 4000  # distinct new URLs per batch (state grows by this)
COMPACT_N = 4


def main() -> None:
    from pyspark.sql import functions as F

    from tripl_spark.session import get_spark
    from tripl_spark.streaming.url_dedup_stream import StreamingUrlDedup

    spark = get_spark("keeper_sink_probe", cpus=16)
    spark.sparkContext.setLogLevel("ERROR")

    def batch_df(b: int):
        # each batch: BATCH_URLS fresh URLs + 10% revisits of batch 0
        fresh = spark.range(BATCH_URLS).select(
            (F.lit(b) * BATCH_URLS + F.col("id")).alias("doc_id"),
            F.concat(
                F.lit("https://example.org/p"),
                (F.lit(b) * BATCH_URLS + F.col("id")).cast("string"),
            ).alias("url"),
        )
        revisit = spark.range(BATCH_URLS // 10).select(
            (F.lit(1_000_000) + F.col("id")).alias("doc_id"),
            F.concat(F.lit("https://example.org/p"), F.col("id").cast("string"))
            .alias("url"),
        )
        return fresh.unionByName(revisit)

    def run(n_batches: int, mode: str) -> tuple[float, int]:
        sink = os.path.join(PROBE_DIR, f"b{n_batches}_{mode}")
        if os.path.isdir(sink):
            shutil.rmtree(sink)
        opts = {"snap": {}, "clog": {"compact_every": COMPACT_N},
                "auto": {"compact_ratio": 1.0}}[mode]
        mon = StreamingUrlDedup(spark, sink_path=sink, **opts)
        t0 = time.perf_counter()
        for b in range(n_batches):
            mon.process(batch_df(b), batch_id=b)
        secs = time.perf_counter() - t0
        rows_written = spark.read.parquet(sink).count()  # exact sink work
        return secs, rows_written

    points = (4, 12, 36)
    results: dict[str, dict[int, tuple[float, int]]] = {
        "snap": {}, "clog": {}, "auto": {}
    }
    for n in points:
        for mode in ("snap", "clog", "auto"):
            secs, rows = run(n, mode)
            results[mode][n] = (secs, rows)
            print(
                f"  {mode}  B={n:<3d} {secs:7.2f}s  {rows:>9d} sink rows",
                flush=True,
            )

    def slope(mode: str) -> tuple[float, float]:
        xs = [math.log(n) for n in points]
        ts = [math.log(results[mode][n][0]) for n in points]
        ws = [math.log(results[mode][n][1]) for n in points]

        def fit(ys):
            n_ = len(xs)
            mx, my = sum(xs) / n_, sum(ys) / n_
            return sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / sum(
                (x - mx) ** 2 for x in xs
            )

        return fit(ts), fit(ws)

    for mode in ("snap", "clog", "auto"):
        at, aw = slope(mode)
        print(f"{mode}: alpha_time={at:.2f} alpha_sink_rows={aw:.2f}")
    b_max = points[-1]
    for mode in ("clog", "auto"):
        ratio = results["snap"][b_max][1] / results[mode][b_max][1]
        print(f"sink-rows ratio snap/{mode} at B={b_max}: {ratio:.1f}x")


if __name__ == "__main__":
    main()

"""Diamond-heavy path-keyed pull probe (r13 verdict item, closed r15).

The path-keyed assembly (`plans/pull_df.py:pull_json_paths_df`) keys
work by TRAVERSAL PATH, so on a high-sharing DAG the row count is the
output tree size — combinatorially larger than the node count. This
probe builds the worst shape (complete layered diamond: W nodes per
level, every node refs ALL W nodes of the next level) and measures:

* path rows vs node count as depth grows (nodes grow LINEARLY, path
  rows grow as W^L — the hazard, quantified);
* that path rows EQUAL the driver loop's own output size (rendered
  node occurrences in the nested JSON) — the blowup is the nested-JSON
  output CONTRACT's, not the engine's: any assembler honoring pull
  semantics materializes exactly this many sub-documents, the driver
  loop just does it one Python dict at a time;
* the `max_path_rows` guard trips DURING expansion (cost bounded by
  the budget) instead of truncating to a wrong answer.

Run: python scripts/diamond_pull_probe.py  (local, ~2 min)
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

W = 4  # diamond width: every node refs all W nodes of the next level


def build_store(spark, n_levels: int):
    from tripl_spark.core.store import TripleStore

    schema = {
        "p:next": {
            "db:valueType": "db.type:ref",
            "db:cardinality": "db.cardinality:many",
        }
    }
    ts = TripleStore(schema=schema, spark=spark)
    docs = []
    for lvl in range(n_levels):
        for j in range(W):
            d = {"db:ident": f"n{lvl}_{j}", "p:name": f"name-{lvl}-{j}"}
            if lvl + 1 < n_levels:
                d["p:next"] = [f"n{lvl+1}_{k}" for k in range(W)]
            docs.append(d)
    ts.assert_facts(docs)
    ts.compact()
    return ts


def expected_path_rows(n_levels: int) -> int:
    # per root: 1 + W + W^2 + ... + W^(L-1); W roots
    return W * (W**n_levels - 1) // (W - 1)


def main() -> None:
    from tripl_spark.session import get_spark

    spark = get_spark("diamond_pull_probe", cpus=16)
    spark.sparkContext.setLogLevel("ERROR")
    expr = ["p:name", {"p:next": "..."}]  # '...' recursion, unbounded shape

    for n_levels in (5, 7, 9):
        ts = build_store(spark, n_levels)
        roots = [f"n0_{j}" for j in range(W)]
        n_nodes = n_levels * W
        want_rows = expected_path_rows(n_levels)

        t0 = time.perf_counter()
        out = ts.pull_df(expr, roots, max_depth=50).collect()
        secs = time.perf_counter() - t0

        # driver-loop cross-check at the two smaller points (the L=9
        # driver loop walks 350k dicts — skip; equality of the two
        # paths is pinned by tests/test_pull_df.py anyway)
        note = ""
        if n_levels <= 7:
            docs = ts.pull_many(expr, roots, max_depth=50, distributed=False)
            import json

            rendered = sum(json.dumps(d).count('"p:name"') for d in docs)
            assert rendered == want_rows, (rendered, want_rows)
            dist = {r["e"]: r["doc"] for r in out}
            assert all(
                json.loads(dist[r]) == d for r, d in zip(roots, docs)
            ), "distributed != driver"
            note = f"driver-equal, {rendered} rendered sub-docs"
        print(
            f"  L={n_levels}  nodes={n_nodes:4d}  path_rows={want_rows:>8d}"
            f"  {secs:6.1f}s  {note}",
            flush=True,
        )

    # the guard: budget far below the L=9 output size — must RAISE
    # during expansion, not truncate
    from tripl_spark.plans.pull_df import pull_json_paths_df

    ts = build_store(spark, 9)
    roots_df = spark.createDataFrame([(f"n0_{j}",) for j in range(W)], "e string")
    t0 = time.perf_counter()
    try:
        pull_json_paths_df(
            ts.current_facts(), ts.registry, expr, roots_df,
            max_depth=50, max_path_rows=50_000,
        ).count()
        print("  GUARD FAILED: no raise")
    except RuntimeError as ex:
        print(
            f"  guard tripped in {time.perf_counter()-t0:.1f}s: "
            f"{str(ex)[:90]}",
            flush=True,
        )
    lvls = (5, 7, 9)
    rows = [expected_path_rows(n) for n in lvls]
    a = (math.log(rows[-1]) - math.log(rows[0])) / (
        math.log(lvls[-1] * W) - math.log(lvls[0] * W)
    )
    print(f"path rows vs NODES exponent across points: {a:.1f} "
          f"(exponential in depth — output-tree-shaped by design)")


if __name__ == "__main__":
    main()

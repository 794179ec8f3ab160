"""CLI — ``tripl join`` / ``tripl pull`` parity
(reference /root/reference/tripl/cli.py:72-115).

* ``join``: load + merge input JSON files, dump the EAV index.
* ``pull``: load inputs, run a pull expression against a match pattern
  (or explicit entity list), write JSON results.
* ``q``: datalog query (the reference's sketched-but-unbuilt surface,
  tripl.py:571-587) straight from the shell.
* ``-m CMD -P N``: map-command ingest — run ``CMD input_file`` for each
  input and assert its stdout JSON. The reference fans out with a
  ``multiprocessing.Pool`` (cli.py:17-27); here the file list is
  parallelized across Spark executors (``parallelize().map`` +
  subprocess), the cluster-native equivalent of that pool.

Usage: ``python -m tripl_spark.cli {join,pull} -i IN [IN...] -o OUT ...``
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
from typing import Any

from tripl_spark.core.store import TripleStore


def get_args(argv: list[str] | None = None) -> argparse.Namespace:
    parser = argparse.ArgumentParser(prog="tripl")
    sub = parser.add_subparsers(dest="command", required=True)

    def common(p: argparse.ArgumentParser) -> None:
        p.add_argument("-i", "--inputs", nargs="+", required=True)
        p.add_argument("-o", "--output", required=True)
        p.add_argument("-m", "--map-command", help="run CMD per input; ingest stdout JSON")
        p.add_argument("-P", "--processes", type=int, default=12,
                       help="parallelism for -m (executor slices)")
        p.add_argument("--id-attrs", nargs="*", default=None)

    p_join = sub.add_parser("join", help="merge input files, dump EAV index")
    common(p_join)

    p_pull = sub.add_parser("pull", help="pull documents matching a pattern")
    common(p_pull)
    p_pull.add_argument("-p", "--pull-expr", required=True,
                        help="JSON pull expression, e.g. '[\"db:ident\", \"x:name\"]'")
    p_pull.add_argument("-n", "--default-namespace",
                        help="namespace assumed for bare attr names in the "
                             "pull expression and match pattern")
    p_pull.add_argument("-N", "--drop-namespaces", action="store_true",
                        help="strip namespaces from output document keys")
    p_pull.add_argument("--distributed", action="store_true",
                        help="assemble documents CLUSTER-SIDE and write "
                             "OUT as a JSONL directory (one JSON doc per "
                             "line, unordered part files) — the sink "
                             "path for result sets too large to re-nest "
                             "on the driver. Documents are identical to "
                             "the driver branch for every expression "
                             "shape, '...' recursion and cycles "
                             "included (r15)")
    group = p_pull.add_mutually_exclusive_group(required=True)
    group.add_argument("-e", "--entities-pattern",
                       help="JSON match pattern, e.g. '{\"x:type\": \"x.type:t\"}'")
    group.add_argument("--eids", nargs="+", help="explicit entity ids")

    p_q = sub.add_parser("q", help="datalog query over the inputs")
    common(p_q)
    p_q.add_argument("-q", "--query", required=True,
                     help="JSON datalog query: '{\"find\": [\"?x\"], "
                          "\"where\": [[\"?e\", \"a:b\", \"?x\"]]}'")
    p_q.add_argument("-r", "--rules", default=None,
                     help="JSON recursive rules, a list of [head, body] "
                          "pairs: '[[[\"?x\",\"anc\",\"?y\"],"
                          "[[\"?x\",\"a:parent\",\"?y\"]]], ...]' — "
                          "derived predicates are usable in where "
                          "clauses (and under find aggregates)")

    p_diff = sub.add_parser(
        "diff", help="facts present in only one of two inputs"
    )
    p_diff.add_argument("-i", "--inputs", nargs=2, required=True)
    p_diff.add_argument("-o", "--output", required=True)
    p_diff.add_argument("--id-attrs", nargs="*", default=None)

    p_plot = sub.add_parser(
        "plot", help="entity reference graph as Graphviz DOT"
    )
    p_plot.add_argument("-i", "--inputs", nargs="+", required=True)
    p_plot.add_argument("-o", "--output", required=True)
    p_plot.add_argument("--id-attrs", nargs="*", default=None)
    p_plot.add_argument("--lazy-refs", action="store_true",
                        help="also draw string values that resolve to an eid")
    p_plot.add_argument("--max-edges", type=int, default=500,
                        help="deterministic cap on emitted edges")

    p_maint = sub.add_parser(
        "maintain",
        help="fact-dump maintenance: skip-index build/refresh/verify, "
        "compaction to a fresh canonical dump",
    )
    p_maint.add_argument("--path", required=True,
                         help="parquet fact dump / streamed log directory")
    p_maint.add_argument("--build-index", action="store_true",
                         help="(re)build the _skipindex stats sidecar")
    p_maint.add_argument("--refresh-index", action="store_true",
                         help="incrementally index files added since the "
                         "last build/refresh")
    p_maint.add_argument("--verify-index", action="store_true",
                         help="audit sidecar vs live files; non-zero exit "
                         "on drift")
    p_maint.add_argument("--compact", metavar="DST",
                         help="rewrite as the attribute-partitioned "
                         "LWW-compacted dump (with skip index) at DST")
    p_maint.add_argument("--schema", default=None,
                         help="JSON {attr: {\"db:cardinality\": ...}} "
                         "declarations applied before compaction")

    p_mon = sub.add_parser(
        "monitor",
        help="drain a parquet file stream through one of the "
        "restart-safe streaming monitors (trigger availableNow: "
        "process whatever arrived, snapshot state, exit — the cron "
        "shape; re-running resumes from the sink and checkpoint, "
        "already-committed batches are never re-counted)",
    )
    p_mon.add_argument(
        "--family", required=True,
        choices=["quality", "pii", "mojibake", "domain",
                 "line-dedup", "url-dedup"],
        help="quality/pii/mojibake expect document rows "
        "(text, lang, source); line-dedup expects (doc_id, text); "
        "domain and url-dedup expect raw (doc_id, url)",
    )
    p_mon.add_argument("--source", required=True,
                       help="parquet directory watched as a file stream")
    p_mon.add_argument("--sink", required=True,
                       help="restart-safe state sink (batch_id=N "
                       "parquet partitions)")
    p_mon.add_argument("--checkpoint", required=True,
                       help="streaming checkpoint location")
    p_mon.add_argument("--compact-every", type=int, default=None,
                       help="keeper families (line-dedup, url-dedup) "
                       "only: merge-on-read changelog sink — delta per "
                       "batch, full snapshot every Nth (their state is "
                       "corpus-sized; counter families keep the cheap "
                       "full snapshot and refuse this flag)")
    p_mon.add_argument("--compact-ratio", type=float, default=None,
                       help="keeper families only: SIZE-triggered "
                       "changelog — full snapshot when accumulated "
                       "delta rows reach RATIO x the last full "
                       "(amortized-linear total sink work; mutually "
                       "exclusive with --compact-every)")
    p_mon.add_argument("--max-files-per-trigger", type=int, default=None,
                       help="micro-batch size knob for the drain")
    p_mon.add_argument("--report", default=None,
                       help="write the read-time view as JSON after the "
                       "drain (counter families: the full scorecard — "
                       "state is |keys| rows; keeper families: summary "
                       "counts only — state is corpus-sized)")
    return parser.parse_args(argv)


def _apply_ns(obj: Any, ns: str) -> Any:
    """Expand bare attribute names with the default namespace throughout
    a pull expression / match pattern (reference -n, cli.py:67-68 —
    marked MOCK! there, implemented here)."""
    if isinstance(obj, dict):
        return {
            (k if (":" in k or k in ("*", "...")) else f"{ns}:{k}"): _apply_ns(v, ns)
            for k, v in obj.items()
        }
    if isinstance(obj, list):
        return [_apply_ns(x, ns) for x in obj]
    if isinstance(obj, str) and ":" not in obj and obj not in ("*", "..."):
        return f"{ns}:{obj}"
    return obj


def _strip_ns(doc: Any) -> Any:
    """Drop namespace prefixes from output keys (reference -N,
    cli.py:94-95 — marked MOCK! there, implemented here)."""
    if isinstance(doc, dict):
        return {k.split(":", 1)[-1]: _strip_ns(v) for k, v in doc.items()}
    if isinstance(doc, (list, tuple, set)):
        return [_strip_ns(x) for x in doc]
    return doc


def diff_stores(a: TripleStore, b: TripleStore) -> dict[str, list]:
    """Facts unique to each store, computed as two distributed
    anti-joins over the compacted fact frames (the reference declares a
    diff command, cli.py:46-51, but never implements it)."""
    from pyspark.sql import functions as F

    from tripl_spark.core.flatten import decode_value

    def key_cols(df):  # noqa: ANN001
        return [df[c] for c in ("e", "a", "vtype", "v_str", "v_num", "v_bool")]

    out: dict[str, list] = {}
    for name, left, right in (
        ("only_in_first", a, b),
        ("only_in_second", b, a),
    ):
        lf, rf = left.current_facts(), right.current_facts()
        cond = None
        for lc, rc in zip(key_cols(lf), key_cols(rf)):
            c = lc.eqNullSafe(rc)
            cond = c if cond is None else (cond & c)
        rows = lf.join(rf, cond, "left_anti").collect()
        out[name] = sorted(
            [r.e, r.a, decode_value(r.vtype, r.v_str, r.v_num, r.v_bool)]
            for r in rows
        )
    return out


def ref_graph_dot(
    store: TripleStore, lazy_refs: bool = False, max_edges: int = 500
) -> str:
    """Graphviz DOT of the entity reference graph (the reference's
    ``tripl plot`` is declared but unimplemented — cli.py:46-51,
    109-110; matplotlib-free DOT is the portable output). Edges are
    declared-ref triples; with ``lazy_refs``, string values that
    resolve to an existing eid are drawn dashed (the read-time lazy-ref
    rule, tripl.py:184-188). Edge extraction is distributed (one filter
    + one semi-join); only the deterministically capped edge list is
    collected."""
    from pyspark.sql import functions as F

    facts = store.current_facts()
    declared = facts.filter(F.col("vtype") == "ref").select("e", "a", "v_str")
    if lazy_refs:
        eids = facts.select("e").distinct()
        # the self-asserted ident triple would lazy-resolve every entity
        # to itself — pure noise, drop it
        lazy = (
            facts.filter((F.col("vtype") == "str") & (F.col("a") != store.ident_attr))
            .join(eids.select(F.col("e").alias("__t")), F.col("v_str") == F.col("__t"), "left_semi")
            .select("e", "a", "v_str")
        )
        edges = declared.withColumn("style", F.lit("solid")).unionByName(
            lazy.withColumn("style", F.lit("dashed"))
        )
    else:
        edges = declared.withColumn("style", F.lit("solid"))
    rows = edges.orderBy("e", "a", "v_str").limit(max_edges).collect()

    def q(s: str) -> str:
        return '"' + s.replace('"', '\\"') + '"'

    lines = ["digraph tripl {", "  rankdir=LR;"]
    nodes = sorted({r.e for r in rows} | {r.v_str for r in rows})
    lines += [f"  {q(n)};" for n in nodes]
    lines += [
        f"  {q(r.e)} -> {q(r.v_str)} [label={q(r.a)}, style={r.style}];"
        for r in rows
    ]
    lines.append("}")
    return "\n".join(lines) + "\n"


def ingest(args: argparse.Namespace) -> TripleStore:
    if getattr(args, "map_command", None):
        from tripl_spark.session import get_spark

        spark = get_spark("tripl_cli")
        cmd = args.map_command
        slices = max(1, min(args.processes, len(args.inputs)))

        def run_one(path: str) -> str:
            return subprocess.check_output([cmd, path], text=True)

        outputs = (
            spark.sparkContext.parallelize(args.inputs, slices).map(run_one).collect()
        )
        store = TripleStore(spark=spark)
        for out in outputs:
            store.assert_facts(json.loads(out), id_attrs=args.id_attrs)
        return store
    return TripleStore.loads(args.inputs, id_attrs=args.id_attrs)


def _lockstep_ids(sink: str, checkpoint: str) -> tuple[str, str, str | None, str | None]:
    """Paths and current contents of the sink/checkpoint pairing
    markers (None where absent)."""
    sm = os.path.join(sink, "_CHECKPOINT")
    cm = os.path.join(checkpoint, "_TRIPL_SINK_PAIR")
    s_id = open(sm).read().strip() if os.path.exists(sm) else None
    c_id = open(cm).read().strip() if os.path.exists(cm) else None
    return sm, cm, s_id, c_id


def _lockstep_error(sink: str, checkpoint: str) -> str | None:
    """Sink and checkpoint must stay in LOCKSTEP: the sink's replay
    skip trusts stream batch ids, and batch ids are the checkpoint's.
    A shared pairing id lives in BOTH directories, so every way the
    pair can fall apart is caught — not just a changed --checkpoint
    path: deleting and recreating the checkpoint AT THE SAME PATH
    (the common stale-checkpoint cleanup) restarts batch ids at 0,
    which the sink would silently swallow; reusing an old checkpoint
    with a FRESH sink drains nothing and leaves it empty. Pure
    os.path checks — runs before any Spark work."""
    sm, cm, s_id, c_id = _lockstep_ids(sink, checkpoint)
    if s_id is None and c_id is None:
        return None  # fresh pair — markers written after the probe
    # legacy pair (pre-pairing-id marker recorded the checkpoint
    # abspath): same checkpoint path → accept, upgraded at pair time
    if s_id == os.path.abspath(checkpoint) and c_id is None:
        return None
    if s_id == c_id:
        return None
    if s_id is not None and c_id is None:
        return (
            f"tripl monitor: sink {sink} is paired with a checkpoint "
            "that no longer carries its pairing marker — the "
            "checkpoint was deleted or recreated, so stream batch ids "
            "would restart at 0 and the sink's replay skip would "
            "silently drop the new batches. Restore the original "
            "checkpoint, or start a fresh sink."
        )
    if c_id is not None and s_id is None:
        return (
            f"tripl monitor: checkpoint {checkpoint} already drained "
            "into a different sink — against this fresh sink it would "
            "skip every already-processed source file and leave the "
            "sink empty. Use a fresh checkpoint with a fresh sink."
        )
    return (
        f"tripl monitor: sink {sink} and checkpoint {checkpoint} "
        "belong to different runs (pairing ids differ). Reuse the "
        "original pair, or start both fresh."
    )


def _lockstep_pair(sink: str, checkpoint: str) -> None:
    """Write (or upgrade) the shared pairing id in both directories.
    Called only after validation passed and the source probe
    succeeded — a run that fails before draining must not pin an
    empty sink to a checkpoint."""
    import uuid

    sm, cm, s_id, c_id = _lockstep_ids(sink, checkpoint)
    if s_id is not None and s_id == c_id:
        return
    pair = uuid.uuid4().hex
    os.makedirs(sink, exist_ok=True)
    os.makedirs(checkpoint, exist_ok=True)
    with open(sm, "w") as fp:
        fp.write(pair)
    with open(cm, "w") as fp:
        fp.write(pair)


def run_monitor(args: argparse.Namespace) -> int:
    """``tripl monitor``: one availableNow drain of a parquet file
    stream through a monitor family, state snapshotted to the sink.
    The schema is probed from the existing source files with a batch
    read (streaming file sources require an explicit schema; probing
    keeps the CLI honest about whatever vintage the parquet is)."""
    from tripl_spark.session import get_spark

    keeper_families = {"line-dedup", "url-dedup"}
    if (
        args.compact_every is not None or args.compact_ratio is not None
    ) and args.family not in keeper_families:
        print(
            f"tripl monitor: --compact-every/--compact-ratio are for the keeper families "
            f"({', '.join(sorted(keeper_families))}); the {args.family} "
            "monitor's state is one row per key combination — full "
            "snapshots are already cheap, and its additive merge is not "
            "idempotent, which the changelog sink requires",
            file=sys.stderr,
        )
        return 2
    if args.compact_every is not None and args.compact_ratio is not None:
        print(
            "tripl monitor: pass --compact-every (fixed period) OR "
            "--compact-ratio (size-triggered), not both",
            file=sys.stderr,
        )
        return 2
    # lockstep validation FIRST: pure path checks, before the Spark
    # session spins up or the monitor folds any sink state
    err = _lockstep_error(args.sink, args.checkpoint)
    if err is not None:
        print(err, file=sys.stderr)
        return 2
    spark = get_spark("tripl_monitor")
    # probe BEFORE pairing: a run that dies here must not pin an
    # empty sink to this checkpoint
    try:
        schema = spark.read.parquet(args.source).schema
    except Exception as exc:
        print(f"tripl monitor: cannot probe source schema: {exc}",
              file=sys.stderr)
        return 1
    try:
        if args.family == "quality":
            from tripl_spark.streaming.quality_stream import (
                StreamingQualityMonitor,
            )

            mon = StreamingQualityMonitor(spark, sink_path=args.sink)
            view = mon.scorecard
        elif args.family == "pii":
            from tripl_spark.streaming.pii_stream import StreamingPIIMonitor

            mon = StreamingPIIMonitor(spark, sink_path=args.sink)
            view = mon.prevalence
        elif args.family == "mojibake":
            from tripl_spark.streaming.mojibake_stream import (
                StreamingMojibakeMonitor,
            )

            mon = StreamingMojibakeMonitor(spark, sink_path=args.sink)
            view = mon.prevalence
        elif args.family == "domain":
            from tripl_spark.streaming.url_stream import StreamingDomainMonitor

            mon = StreamingDomainMonitor(
                spark, sink_path=args.sink, raw_urls=True
            )
            view = mon.prevalence
        elif args.family == "line-dedup":
            from tripl_spark.streaming.line_stream import StreamingLineDedup

            mon = StreamingLineDedup(
                spark, sink_path=args.sink, compact_every=args.compact_every,
                compact_ratio=args.compact_ratio,
            )
            view = None
        else:  # url-dedup
            from tripl_spark.streaming.url_dedup_stream import StreamingUrlDedup

            mon = StreamingUrlDedup(
                spark, sink_path=args.sink, compact_every=args.compact_every,
                compact_ratio=args.compact_ratio,
            )
            view = None
    except ValueError as exc:
        # library-level mode guards (changelog sink resumed without a
        # changelog option, bad ratio, ...) — the CLI's clean contract
        # is stderr + rc 2, never a traceback
        print(f"tripl monitor: {exc}", file=sys.stderr)
        return 2
    _lockstep_pair(args.sink, args.checkpoint)
    reader = spark.readStream.schema(schema)
    if args.max_files_per_trigger:
        reader = reader.option(
            "maxFilesPerTrigger", str(args.max_files_per_trigger)
        )
    q = (
        reader.parquet(args.source)
        .writeStream.foreachBatch(mon.process)
        .trigger(availableNow=True)
        .option("checkpointLocation", args.checkpoint)
        .start()
    )
    q.awaitTermination()
    summary: dict[str, Any] = {
        "family": args.family,
        "batches_committed": sorted(mon._seen),
        "state_rows": mon.state.count() if mon.state is not None else 0,
    }
    if args.report:
        if view is not None:
            v = view()
            summary["view"] = (
                [r.asDict(recursive=True) for r in v.orderBy(*v.columns).collect()]
                if v is not None
                else []
            )
        with open(args.report, "w") as fp:
            json.dump(summary, fp, indent=2, default=str)
    print(json.dumps({k: summary[k] for k in
                      ("family", "batches_committed", "state_rows")}))
    return 0


def main(argv: list[str] | None = None) -> int:
    args = get_args(argv)
    if args.command == "monitor":
        return run_monitor(args)
    if args.command == "maintain":
        from tripl_spark.session import get_spark
        from tripl_spark.sources.skipindex import (
            build_skip_index,
            refresh_skip_index,
            verify_skip_index,
        )

        if not (
            args.build_index
            or args.refresh_index
            or args.verify_index
            or args.compact
        ):
            # a flag-less invocation exiting 0 would read as a
            # successful maintenance run that never happened (cron/CI)
            print(
                "tripl maintain: no action given — pass at least one of "
                "--build-index / --refresh-index / --verify-index / "
                "--compact",
                file=sys.stderr,
            )
            return 2
        spark = get_spark("tripl_maintain")
        # every branch maps staleness to structured stderr + exit 1 —
        # the cron/CI contract — never a raw traceback
        try:
            if args.build_index:
                build_skip_index(spark, args.path)
            if args.refresh_index:
                rep = refresh_skip_index(spark, args.path)
                print(json.dumps({"refreshed": rep}))
            if args.verify_index:
                audit = verify_skip_index(spark, args.path)
                print(json.dumps({"verified": audit}))
            if args.compact:
                store = TripleStore.load_parquet(args.path, spark=spark)
                if args.schema:
                    store.assert_schema(json.loads(args.schema))
                store.dump_parquet(args.compact, skip_index=True)
        except ValueError as exc:
            print(str(exc), file=sys.stderr)
            return 1
        return 0
    if args.command == "diff":
        a = TripleStore.load(args.inputs[0], id_attrs=args.id_attrs)
        b = TripleStore.load(args.inputs[1], id_attrs=args.id_attrs)
        with open(args.output, "w") as fp:
            json.dump(diff_stores(a, b), fp, indent=2)
        return 0
    store = ingest(args)
    if args.command == "plot":
        with open(args.output, "w") as fp:
            fp.write(ref_graph_dot(store, args.lazy_refs, args.max_edges))
    elif args.command == "join":
        store.dump(args.output)
    elif args.command == "q":
        rules = json.loads(args.rules) if getattr(args, "rules", None) else None
        rows = store.q(json.loads(args.query), rules=rules)
        with open(args.output, "w") as fp:
            json.dump([list(r) for r in rows], fp, indent=2)
    elif args.command == "pull":
        expr: Any = json.loads(args.pull_expr)
        if args.entities_pattern:
            target: Any = json.loads(args.entities_pattern)
        else:
            target = args.eids
        if getattr(args, "default_namespace", None):
            expr = _apply_ns(expr, args.default_namespace)
            if args.entities_pattern:
                target = _apply_ns(target, args.default_namespace)
        if getattr(args, "distributed", False):
            if getattr(args, "drop_namespaces", False):
                raise SystemExit(
                    "--distributed writes documents cluster-side; "
                    "--drop-namespaces needs driver-side re-nesting — "
                    "pick one"
                )
            # the library sink path (store.pull_df): documents never
            # materialize on the driver; OUT is a JSONL directory.
            # The flag changes WHERE results land, never WHAT they are
            # — since r15 the paths assembly is driver-identical for
            # EVERY expression shape, '...' recursion and cycles
            # included (the r14 bounded-unroll warning is gone because
            # the divergence it warned about is gone). Default write
            # mode (errorifexists) keeps the sink as loud on an
            # existing path as open(dir, "w") is on the driver branch —
            # never silently deletes.
            store.pull_df(expr, target, max_depth=20).select(
                "doc"
            ).write.text(args.output)
        else:
            results = list(store.pull_many(expr, target))
            if getattr(args, "drop_namespaces", False):
                results = [_strip_ns(d) for d in results]
            with open(args.output, "w") as fp:
                json.dump(results, fp, default=list, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""CLI — ``tripl join`` / ``tripl pull`` parity
(reference /root/reference/tripl/cli.py:72-115).

* ``join``: load + merge input JSON files, dump the EAV index.
* ``pull``: load inputs, run a pull expression against a match pattern
  (or explicit entity list), write JSON results.
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
    group = p_pull.add_mutually_exclusive_group(required=True)
    group.add_argument("-e", "--entities-pattern",
                       help="JSON match pattern, e.g. '{\"x:type\": \"x.type:t\"}'")
    group.add_argument("--eids", nargs="+", help="explicit entity ids")
    return parser.parse_args(argv)


def ingest(args: argparse.Namespace) -> TripleStore:
    if args.map_command:
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


def main(argv: list[str] | None = None) -> int:
    args = get_args(argv)
    store = ingest(args)
    if args.command == "join":
        store.dump(args.output)
    elif args.command == "pull":
        expr: Any = json.loads(args.pull_expr)
        if args.entities_pattern:
            target: Any = json.loads(args.entities_pattern)
        else:
            target = args.eids
        results = store.pull_many(expr, target)
        with open(args.output, "w") as fp:
            json.dump(list(results), fp, default=list, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())

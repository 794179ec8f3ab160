"""CSV attr-map ingestion (FIXTURES.md A2) and CLI parity tests."""

from __future__ import annotations

import contextlib
import io
import json
import subprocess
import sys
from dataclasses import dataclass

from tripl_spark import TripleStore
from tripl_spark.functions.namespaces import some
from tripl_spark.sources.csv_attrmap import csv_docs_df, load_csv

TOY_CSV = "/root/reference/tripl/data/toy.csv"


@dataclass
class _CliResult:
    returncode: int
    stdout: str
    stderr: str


def _cli(argv: list[str]) -> _CliResult:
    """Run the CLI in-process (``tripl_spark.cli.main(argv)`` — the same
    entry ``python -m tripl_spark.cli`` dispatches to, minus the
    ~15 s-per-invocation JVM/SparkSession boot a subprocess pays; the
    CLI's ``get_spark`` getOrCreate picks up the suite session).
    ``test_cli_map_ingest_end_to_end`` stays a REAL subprocess so one
    test still proves the process-level entry point end to end."""
    from tripl_spark.cli import main

    out, err = io.StringIO(), io.StringIO()
    try:
        with contextlib.redirect_stdout(out), contextlib.redirect_stderr(err):
            rc = main(argv)
    except SystemExit as exc:  # argparse errors / explicit exits
        if isinstance(exc.code, int):
            rc = exc.code
        else:
            # process-level python prints a non-int SystemExit payload
            # to stderr and exits 1 — reproduce that contract
            if exc.code is not None:
                err.write(str(exc.code) + "\n")
            rc = 1
    return _CliResult(int(rc or 0), out.getvalue(), err.getvalue())

ATTR_MAP = {
    "seq:id": "id",
    "seq:virus": "virus",
    "seq:notpresent": "foobar",
    "seq:geo": "geo",
    "seq:date": [{"date:day": "date", "date:time": "time", "date:id": "date_id"}],
    "seq:sample": [{"sample:id": "sample"}],
}


def test_load_csv_docstring_shape():
    docs = list(load_csv(TOY_CSV, ATTR_MAP, "toy"))
    assert len(docs) == 4
    d = next(doc for doc in docs if doc["toy.seq:id"] == "i1")
    assert d["toy.seq:virus"] == "EBOV"
    assert d["toy.seq:geo"] == "jena"
    assert d["toy.seq:notpresent"] is None
    assert d["toy:type"] == "toy.type:seq"
    date = d["toy.seq:date"][0]
    assert date["toy.date:day"] == "2017-06-01"
    assert date["toy.date:id"] == "t1"
    assert date["toy.date:time"] is None
    assert date["toy:type"] == "toy.type:date"
    assert d["toy.seq:sample"][0]["toy.sample:id"] == "s1"


def test_csv_ingest_golden_query(spark):
    ts = TripleStore(spark=spark)
    ts.assert_facts(
        load_csv(TOY_CSV, ATTR_MAP, "toy"),
        id_attrs=["toy.seq:id", "toy.sample:id", "toy.date:id"],
    )
    assert len(ts.match({"toy:type": "toy.type:seq"})) == 4
    # shared sample s3 and date t2 resolve to single entities
    assert len(ts.match({"toy.sample:id": "s3"})) == 1
    assert len(ts.match({"toy.date:id": "t2"})) == 1
    out = ts.pull_many(["db:ident", "toy.seq:id"], {"toy:type": "toy.type:seq"})
    ids = sorted(d["toy.seq:id"][0] for d in out)
    assert ids == ["i1", "i2", "i3", "i4"]


def test_csv_docs_df_distributed(spark):
    df = csv_docs_df(spark, TOY_CSV, ATTR_MAP, "toy")
    rows = {r["toy.seq:id"]: r.asDict(recursive=True) for r in df.collect()}
    assert set(rows) == {"i1", "i2", "i3", "i4"}
    d = rows["i3"]
    assert d["toy.seq:date"][0]["toy.date:id"] == "t2"
    assert d["toy:type"] == "toy.type:seq"
    assert d["toy.seq:notpresent"] is None


def test_cli_join_and_pull(tmp_path):
    docs = [
        {"x:id": "a", "x:name": "Alpha", "x:type": "x.type:thing"},
        {"x:id": "b", "x:name": "Beta", "x:type": "x.type:thing"},
    ]
    f1 = tmp_path / "in1.json"
    f1.write_text(json.dumps(docs))
    merged = tmp_path / "merged.json"
    out = tmp_path / "out.json"

    r = _cli(["join", "-i", str(f1), "-o", str(merged),
         "--id-attrs", "x:id"])
    assert r.returncode == 0, r.stderr[-2000:]
    dumped = json.loads(merged.read_text())
    assert any("x:name" in avs for avs in dumped.values())

    r = _cli(["pull", "-i", str(merged), "-o", str(out),
         "-p", '["x:name"]', "-e", '{"x:type": "x.type:thing"}'])
    assert r.returncode == 0, r.stderr[-2000:]
    results = json.loads(out.read_text())
    names = sorted(d["x:name"][0] for d in results)
    assert names == ["Alpha", "Beta"]


def test_cli_diff_and_namespace_flags(spark, tmp_path):
    from tripl_spark.cli import _apply_ns, _strip_ns, diff_stores
    from tripl_spark.core.store import TripleStore

    s1 = TripleStore(spark=spark)
    s1.assert_facts(
        [{"x:id": "a", "x:name": "Alpha"}, {"x:id": "b", "x:name": "Beta"}],
        id_attrs=["x:id"],
    )
    s2 = TripleStore(spark=spark)
    s2.assert_facts(
        [{"x:id": "a", "x:name": "Alpha"}, {"x:id": "c", "x:name": "Gamma"}],
        id_attrs=["x:id"],
    )
    d = diff_stores(s1, s2)
    first_vals = {row[2] for row in d["only_in_first"]}
    second_vals = {row[2] for row in d["only_in_second"]}
    assert "Beta" in first_vals and "b" in first_vals
    assert "Gamma" in second_vals and "c" in second_vals
    assert "Alpha" not in first_vals | second_vals  # shared facts cancel

    # -n expands bare names; -N strips prefixes on output docs
    assert _apply_ns(["name", {"ref": ["id"]}], "x") == [
        "x:name", {"x:ref": ["x:id"]}
    ]
    assert _apply_ns("*", "x") == "*"
    assert _strip_ns({"x:name": ["Alpha"], "x:ref": {"y:id": 1}}) == {
        "name": ["Alpha"], "ref": {"id": 1}
    }


def test_cli_plot_dot_output(spark, tmp_path):
    """`tripl plot` (declared-but-unimplemented in the reference,
    cli.py:46-51) emits the entity ref graph as DOT: declared refs are
    solid edges; --lazy-refs adds dashed edges for string values that
    resolve to an eid."""
    from tripl_spark.cli import ref_graph_dot
    from tripl_spark.core.store import TripleStore

    schema = {
        "x:child": {"db:valueType": "db.type:ref",
                    "db:cardinality": "db.cardinality:many"},
    }
    store = TripleStore(spark=spark, schema=schema)
    store.assert_facts([
        {"db:ident": "root", "x:child": [{"db:ident": "kid1"}, {"db:ident": "kid2"}],
         "x:friend": "kid1", "x:note": "not-an-eid"},
    ])
    dot = ref_graph_dot(store, lazy_refs=True)
    assert dot.startswith("digraph tripl {")
    assert '"root" -> "kid1" [label="x:child", style=solid];' in dot
    assert '"root" -> "kid2" [label="x:child", style=solid];' in dot
    # lazy ref: "kid1" is a plain string value but matches an eid
    assert '"root" -> "kid1" [label="x:friend", style=dashed];' in dot
    assert "not-an-eid" not in dot
    # without lazy_refs, only declared-ref edges
    assert "dashed" not in ref_graph_dot(store)


def test_cli_map_ingest_end_to_end(tmp_path):
    """`-m CMD -P N` (reference cli.py:17-27, 69): CMD runs once per
    input file on the executors, its stdout JSON is ingested. End-to-end
    through the real CLI entry point with a real subprocess mapper."""
    mapper = tmp_path / "mapper.py"
    mapper.write_text(
        "#!/usr/bin/env python3\n"
        "import json, sys, pathlib\n"
        "name = pathlib.Path(sys.argv[1]).read_text().strip()\n"
        "print(json.dumps([{'x:id': name, 'x:name': name.upper(),"
        " 'x:type': 'x.type:thing'}]))\n"
    )
    mapper.chmod(0o755)
    inputs = []
    for name in ("alpha", "beta", "gamma"):
        f = tmp_path / f"{name}.txt"
        f.write_text(name + "\n")
        inputs.append(str(f))
    merged = tmp_path / "merged.json"

    r = subprocess.run(
        [sys.executable, "-m", "tripl_spark.cli", "join",
         "-i", *inputs, "-o", str(merged),
         "-m", str(mapper), "-P", "2", "--id-attrs", "x:id"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    dumped = json.loads(merged.read_text())
    names = sorted(
        v for avs in dumped.values() for v in avs.get("x:name", [])
    )
    assert names == ["ALPHA", "BETA", "GAMMA"]


def test_load_accepts_doc_list_and_index_shapes(spark, tmp_path):
    """The reference's `loads` (tripl.py:536-541) accepts BOTH
    doc-list-shaped JSON files and EAV-index-shaped dumps; merging one
    of each must resolve shared id_attrs to one entity."""
    doclist = tmp_path / "docs.json"
    doclist.write_text(json.dumps(
        [{"x:id": "a", "x:name": "Alpha"}, {"x:id": "b", "x:name": "Beta"}]
    ))
    s1 = TripleStore.load(str(doclist), id_attrs=["x:id"], spark=spark)
    assert len(s1.match({"x:name": "Alpha"})) == 1

    index = tmp_path / "index.json"
    s1.dump(str(index))
    # index-shaped reload: same entities, same values, no duplication
    s2 = TripleStore.load(str(index), spark=spark)
    assert len(s2.match({"x:id": "a"})) == 1
    assert s2.pull(["x:name"], some(s2.match({"x:id": "a"})))["x:name"] == ["Alpha"]

    # merge doc-list into an index-shaped store: "a" must stay ONE entity
    s3 = TripleStore.loads(
        [str(index), str(doclist)], id_attrs=["x:id"], spark=spark
    )
    assert len(s3.match({"x:id": "a"})) == 1
    assert len(s3.match({"x:id": "b"})) == 1


def test_cli_datalog_q(tmp_path):
    docs = [
        {"x:id": "a", "x:name": "Alpha", "x:type": "x.type:thing"},
        {"x:id": "b", "x:name": "Beta", "x:type": "x.type:thing"},
        {"x:id": "c", "x:name": "Gamma", "x:type": "x.type:other"},
    ]
    f1 = tmp_path / "in.json"
    f1.write_text(json.dumps(docs))
    out = tmp_path / "q.json"
    query = json.dumps({
        "find": ["?name"],
        "where": [["?e", "x:type", "x.type:thing"], ["?e", "x:name", "?name"]],
        "sort": "?name",
    })
    r = _cli(["q", "-i", str(f1),
         "-o", str(out), "-q", query, "--id-attrs", "x:id"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert json.loads(out.read_text()) == [["Alpha"], ["Beta"]]


def test_cli_readme_walkthrough_end_to_end(tmp_path):
    """The reference README's cft walkthrough (subjects / timepoints /
    sequences, /root/reference/README.md:49-120) driven through the
    console entrypoint as ONE chained session: two partial ingests
    joined with id_attrs upserts, pull of a subject's sequences, a
    datalog q over the merged store, and a diff between the partial
    and merged stores. Pins the cross-command contract (a store dumped
    by `join` is readable by `pull`/`q`/`diff` with identities intact)
    that the per-command tests cannot see."""
    subjects = [
        {"cft.subject:id": "QA255", "cft:type": "cft.type:subject"},
        {"cft.subject:id": "QA344", "cft:type": "cft.type:subject"},
    ]
    seqs = [
        {
            "cft.seq:id": "QA255-092.Vh",
            "cft:type": "cft.type:seq",
            "cft.seq:string": "AGCGGTGAGCTGA",
            "cft.seq:subject": {"cft.subject:id": "QA255"},
            "cft.seq:timepoint": [
                {"cft.timepoint:id": "seed-sample", "cft:type": "cft.type:timepoint"},
                {"cft.timepoint:id": "dpi1204", "cft:type": "cft.type:timepoint"},
            ],
        },
        {
            "cft.seq:id": "15423-1",
            "cft:type": "cft.type:seq",
            "cft.seq:string": "AGCGGTGAGCTGA",
            "cft.seq:subject": {"cft.subject:id": "QA255"},
            "cft.seq:timepoint": [
                {"cft.timepoint:id": "dpi234", "cft:type": "cft.type:timepoint"},
                {"cft.timepoint:id": "dpi1204", "cft:type": "cft.type:timepoint"},
            ],
        },
        {
            "cft.seq:id": "1534-2",
            "cft:type": "cft.type:seq",
            "cft.seq:string": "AGCGGTGAGCTGA",
            "cft.seq:subject": {"cft.subject:id": "QA344"},
            "cft.seq:timepoint": [
                {"cft.timepoint:id": "L1", "cft:type": "cft.type:timepoint"}
            ],
        },
    ]
    f_subj = tmp_path / "subjects.json"
    f_seqs = tmp_path / "seqs.json"
    f_subj.write_text(json.dumps(subjects))
    f_seqs.write_text(json.dumps(seqs))
    merged = tmp_path / "merged.json"
    id_attrs = ["cft.subject:id", "cft.timepoint:id", "cft.seq:id"]

    def run(*args):
        r = _cli([*args])
        assert r.returncode == 0, r.stderr[-2000:]
        return r

    # join: multi-file merge with id_attrs upserts — the subject
    # entities referenced from seqs must unify with the subject file's
    run("join", "-i", str(f_subj), str(f_seqs), "-o", str(merged),
        "--id-attrs", *id_attrs)
    store = json.loads(merged.read_text())
    subj_entities = [
        avs for avs in store.values()
        if avs.get("cft:type") == ["cft.type:subject"]
    ]
    assert len(subj_entities) == 2  # upserted, not duplicated

    # pull: QA255's sequences with their timepoint refs resolved
    pulled = tmp_path / "pulled.json"
    run("pull", "-i", str(merged), "-o", str(pulled),
        "-p", json.dumps(["cft.seq:id", {"cft.seq:timepoint": ["cft.timepoint:id"]}]),
        "-e", json.dumps({"cft:type": "cft.type:seq"}))
    seq_docs = json.loads(pulled.read_text())
    assert sorted(d["cft.seq:id"][0] for d in seq_docs) == [
        "1534-2", "15423-1", "QA255-092.Vh"
    ]
    tp_ids = {
        t["cft.timepoint:id"][0]
        for d in seq_docs
        for t in d.get("cft.seq:timepoint", [])
    }
    assert tp_ids == {"seed-sample", "dpi1204", "dpi234", "L1"}

    # q: datalog join over the MERGED store — sequences per subject
    qout = tmp_path / "q.json"
    query = json.dumps({
        "find": ["?sid", "?seq"],
        "where": [
            ["?s", "cft.subject:id", "?sid"],
            ["?e", "cft.seq:subject", "?s"],
            ["?e", "cft.seq:id", "?seq"],
        ],
        "sort": "?seq",
    })
    run("q", "-i", str(merged), "-o", str(qout), "-q", query,
        "--id-attrs", *id_attrs)
    assert json.loads(qout.read_text()) == [
        ["QA344", "1534-2"],
        ["QA255", "15423-1"],
        ["QA255", "QA255-092.Vh"],
    ]

    # diff: the merged store vs the subjects-only ingest — every
    # difference must be an addition from the seqs file
    dout = tmp_path / "diff.json"
    subj_store = tmp_path / "subj_store.json"
    run("join", "-i", str(f_subj), "-o", str(subj_store),
        "--id-attrs", *id_attrs)
    run("diff", "-i", str(subj_store), str(merged), "-o", str(dout),
        "--id-attrs", *id_attrs)
    d = json.loads(dout.read_text())
    assert d  # non-empty: the seq entities are new on the right side


def test_cli_datalog_extensions_end_to_end(tmp_path):
    """The r6 datalog surface — find aggregates, `not`, `or` — driven
    through the console q subcommand (queries arrive as parsed JSON, so
    the list-shaped clause forms must survive the CLI path)."""
    docs = [
        {"x:id": "a", "x:type": "x.type:thing", "x:tag": "keep"},
        {"x:id": "b", "x:type": "x.type:thing"},
        {"x:id": "c", "x:type": "x.type:other", "x:tag": "keep"},
    ]
    f1 = tmp_path / "in.json"
    f1.write_text(json.dumps(docs))

    def run_q(query):
        out = tmp_path / "q.json"
        r = _cli(["q", "-i", str(f1),
             "-o", str(out), "-q", json.dumps(query), "--id-attrs", "x:id"])
        assert r.returncode == 0, r.stderr[-2000:]
        return json.loads(out.read_text())

    assert run_q({
        "find": ["?t", ["count", "?e"]],
        "where": [["?e", "x:type", "?t"]],
    }) == [["x.type:other", 1], ["x.type:thing", 2]]
    assert run_q({
        "find": ["?i"],
        "where": [["?e", "x:id", "?i"], ["not", ["?e", "x:tag", "keep"]]],
    }) == [["b"]]
    assert run_q({
        "find": ["?i"],
        "where": [["?e", "x:id", "?i"],
                  ["or", ["?e", "x:tag", "keep"], ["?e", "x:id", "b"]]],
    }) == [["a"], ["b"], ["c"]]


def test_cli_datalog_with_and_not_in_or(tmp_path):
    """The r7 datalog surface through the console: the 'with' key and
    negation inside an 'or' and-group survive the CLI JSON path."""
    docs = [
        {"x:id": "p", "x:score": 5, "x:tag": "keep"},
        {"x:id": "q", "x:score": 5},
        {"x:id": "r", "x:score": 3, "x:tag": "other"},
    ]
    f1 = tmp_path / "in.json"
    f1.write_text(json.dumps(docs))

    def run_q(query):
        out = tmp_path / "q.json"
        r = _cli(["q", "-i", str(f1),
             "-o", str(out), "-q", json.dumps(query), "--id-attrs", "x:id"])
        assert r.returncode == 0, r.stderr[-2000:]
        return json.loads(out.read_text())

    # set semantics collapse the duplicate 5 -> 8; 'with' keeps both
    base = {"find": [["sum", "?v"]], "where": [["?e", "x:score", "?v"]]}
    assert run_q(base) == [[8.0]]
    assert run_q({**base, "with": ["?e"]}) == [[13.0]]
    # not inside an or-branch and-group
    got = run_q({
        "find": ["?i"],
        "where": [["?e", "x:id", "?i"],
                  ["or",
                   ["and", ["?e", "x:score", 5],
                    ["not", ["?e", "x:tag", "keep"]]],
                   ["?e", "x:tag", "other"]]],
    })
    assert got == [["q"], ["r"]]


def test_cli_datalog_rules_and_aggregate(tmp_path):
    """The r8 composition through the console: recursive rules passed
    via -r, with a find-aggregate grouping over the DERIVED predicate
    (count of ancestors per person)."""
    docs = [
        {"x:id": "a", "fam:parent": {"x:id": "b"}},
        {"x:id": "b", "fam:parent": {"x:id": "c"}},
    ]
    f1 = tmp_path / "fam.json"
    f1.write_text(json.dumps(docs))
    rules = json.dumps([
        [["?x", "anc", "?y"], [["?x", "fam:parent", "?y"]]],
        [["?x", "anc", "?y"], [["?x", "fam:parent", "?z"], ["?z", "anc", "?y"]]],
    ])
    # plain rules query: ids of everyone with 'c' as an ancestor
    out = tmp_path / "rq.json"
    query = json.dumps({
        "find": ["?id"],
        "where": [["?x", "anc", "?c"], ["?c", "x:id", "c"], ["?x", "x:id", "?id"]],
        "sort": "?id",
    })
    r = _cli(["q", "-i", str(f1),
         "-o", str(out), "-q", query, "-r", rules, "--id-attrs", "x:id"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert json.loads(out.read_text()) == [["a"], ["b"]]
    # aggregate OVER the derived relation: ancestor count per id
    out2 = tmp_path / "agg.json"
    query2 = json.dumps({
        "find": ["?id", ["count", "?y"]],
        "where": [["?x", "anc", "?y"], ["?x", "x:id", "?id"]],
        "sort": "?id",
    })
    r2 = _cli(["q", "-i", str(f1),
         "-o", str(out2), "-q", query2, "-r", rules, "--id-attrs", "x:id"])
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert json.loads(out2.read_text()) == [["a", 2], ["b", 1]]


def test_cli_maintain_without_action_errors(tmp_path):
    """A flag-less `maintain` run must NOT exit 0 — in cron/CI that
    reads as a successful maintenance run that never happened."""
    r = _cli(["maintain",
         "--path", str(tmp_path)])
    assert r.returncode == 2
    assert "no action" in r.stderr


def test_cli_maintain_end_to_end(tmp_path, spark, sf_small):
    """maintain: build + verify + refresh + compact a fact dump from
    the shell — the ops surface for the skip-indexed log lifecycle."""
    from pyspark.sql import functions as F

    from tripl_spark.session import load_table

    events = load_table(spark, sf_small, "events").limit(300)
    facts = events.select(
        F.concat(F.lit("user-"), F.col("user_id").cast("string")).alias("e"),
        F.lit("user:last_type").alias("a"),
        F.lit("str").alias("vtype"),
        F.col("event_type").alias("v_str"),
        F.lit(None).cast("double").alias("v_num"),
        F.lit(None).cast("boolean").alias("v_bool"),
        (F.unix_millis("ts") * 1_000_000 + F.col("event_id")).alias("t"),
    )
    dump = str(tmp_path / "dump")
    facts.repartitionByRange(3, "t").write.partitionBy("a").parquet(dump)

    def run(*flags):
        return _cli(["maintain",
             "--path", dump, *flags])

    r = run("--build-index", "--verify-index")
    assert r.returncode == 0, r.stderr[-2000:]
    assert json.loads(r.stdout.strip().splitlines()[-1])["verified"]["files"] >= 2

    # append a slice, then refresh from the shell
    facts.limit(20).withColumn("t", F.col("t") + F.lit(10**18)).write.mode(
        "append"
    ).partitionBy("a").parquet(dump)
    r = run("--refresh-index", "--verify-index")
    assert r.returncode == 0, r.stderr[-2000:]
    assert json.loads(r.stdout.strip().splitlines()[0])["refreshed"]["added"] > 0

    dst = str(tmp_path / "compacted")
    schema = json.dumps({"user:last_type": {"db:cardinality": "db.cardinality:one"}})
    r = run("--compact", dst, "--schema", schema)
    assert r.returncode == 0, r.stderr[-2000:]
    raw = spark.read.parquet(dst).filter(F.col("a") == "user:last_type")
    assert raw.groupBy("e").count().agg(F.max("count")).collect()[0][0] == 1

    # drifted dump (deleted file) -> verify exits non-zero
    import os as _os
    data_files = [
        _os.path.join(r2, f)
        for r2, _, fs in _os.walk(dump)
        for f in fs
        if f.endswith(".parquet") and "_skipindex" not in r2
    ]
    _os.remove(data_files[0])
    r = run("--verify-index")
    assert r.returncode == 1
    assert "stale" in r.stderr


def test_cli_pull_distributed_jsonl_sink(tmp_path):
    """`tripl pull --distributed -o OUT`: documents assembled
    cluster-side and written as a JSONL directory — the sink path for
    result sets too large to re-nest on the driver. Content must equal
    the driver-side pull (nested child included)."""
    docs = [
        {"x:id": "a", "x:name": "Alpha", "x:type": "x.type:thing",
         "x:kid": {"x:id": "k1", "x:type": "x.type:kid"}},
        {"x:id": "b", "x:name": "Beta", "x:type": "x.type:thing"},
    ]
    f1 = tmp_path / "in.json"
    f1.write_text(json.dumps(docs))
    merged = tmp_path / "merged.json"
    r = _cli(["join", "-i", str(f1),
         "-o", str(merged), "--id-attrs", "x:id"])
    assert r.returncode == 0, r.stderr[-2000:]

    outdir = tmp_path / "out.jsonl"
    plain = tmp_path / "plain.json"
    expr = '["x:name", {"x:kid": ["x:id"]}]'
    pattern = '{"x:type": "x.type:thing"}'
    for extra, dest in ((["--distributed"], str(outdir)), ([], str(plain))):
        r = _cli(["pull", "-i", str(merged),
                  "-o", dest, "-p", expr, "-e", pattern] + extra)
        assert r.returncode == 0, r.stderr[-2000:]
        # r15: no recursion caveat exists any more — nothing warns on
        # either branch for any expression shape
        assert "bounded unroll" not in r.stderr
    lines = []
    for part in sorted(outdir.glob("part-*")):
        lines += [json.loads(l) for l in part.read_text().splitlines() if l]
    key = lambda d: str(d.get("x:name"))
    assert sorted(lines, key=key) == sorted(json.loads(plain.read_text()), key=key)
    # --distributed and --drop-namespaces are mutually exclusive (loud)
    r = _cli(["pull", "-i", str(merged),
              "-o", str(tmp_path / "x"), "-p", expr, "-e", pattern,
              "--distributed", "-N"])
    assert r.returncode != 0 and "drop-namespaces" in r.stderr
    # a '...' recursive expression under --distributed now runs the
    # driver-loop-exact path-keyed assembly (r15) — the r14 bounded
    # unroll and its loud warning are GONE, and the documents must
    # equal the driver branch's byte-for-byte semantics
    rec_out = tmp_path / "rec.jsonl"
    rec_plain = tmp_path / "rec_plain.json"
    rec_expr = '["x:name", {"x:kid": "..."}]'
    for extra, dest in ((["--distributed"], str(rec_out)), ([], str(rec_plain))):
        r = _cli(["pull", "-i", str(merged),
                  "-o", dest, "-p", rec_expr, "-e", pattern] + extra)
        assert r.returncode == 0, r.stderr[-2000:]
        assert "bounded unroll" not in r.stderr
        assert "tripl: warning" not in r.stderr
    rec_lines = []
    for part in sorted(rec_out.glob("part-*")):
        rec_lines += [json.loads(l) for l in part.read_text().splitlines() if l]
    assert sorted(rec_lines, key=key) == sorted(
        json.loads(rec_plain.read_text()), key=key
    )

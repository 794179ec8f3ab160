"""`tripl monitor` — the CLI drain for the streaming monitor families
(`cli.py:run_monitor`): availableNow over a parquet file stream,
restart-safe state in the sink, read-time view as a JSON report. The
r14 verdict's stretch item, closed r15."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from tripl_spark.cli import main
from tripl_spark.operators.urls import _dup_url_col
from tripl_spark.session import load_table
from tripl_spark.streaming.counter_monitor import _FULL_MARKER
from tripl_spark.streaming.quality_stream import StreamingQualityMonitor


def _write_source(df, src, n_files=3, key="doc_id"):
    for i in range(n_files):
        df.filter(F.pmod(key, n_files) == i).coalesce(1).write.mode(
            "append"
        ).parquet(src)


def test_monitor_quality_drain_matches_inprocess(spark, sf_small, tmp_path):
    """A CLI quality drain over a 3-file source equals the in-process
    monitor fed the same corpus (split-invariance is the base
    contract), and a SECOND run with no new files is a no-op — the
    checkpoint and sink make the drain idempotent."""
    docs = load_table(spark, sf_small, "documents")
    src = str(tmp_path / "src")
    _write_source(docs, src)
    report = str(tmp_path / "report.json")
    argv = [
        "monitor", "--family", "quality", "--source", src,
        "--sink", str(tmp_path / "sink"),
        "--checkpoint", str(tmp_path / "ckpt"),
        "--max-files-per-trigger", "1", "--report", report,
    ]
    assert main(argv) == 0
    rep = json.load(open(report))
    assert rep["family"] == "quality" and rep["state_rows"] > 0

    want_mon = StreamingQualityMonitor(spark)
    want_mon.process(docs, batch_id=0)
    sc = want_mon.scorecard()
    want = {
        (r["source"], r["lang"]): r
        for r in (x.asDict() for x in sc.collect())
    }
    got = {(r["source"], r["lang"]): r for r in rep["view"]}
    assert set(got) == set(want)
    for k in want:
        for col, val in want[k].items():
            assert got[k][col] == val, (k, col, got[k][col], val)

    report2 = str(tmp_path / "report2.json")
    assert main(argv[:-1] + [report2]) == 0
    rep2 = json.load(open(report2))
    assert rep2["state_rows"] == rep["state_rows"]
    assert rep2["view"] == rep["view"]


def test_monitor_url_dedup_changelog_sink(spark, sf_small, tmp_path):
    """Keeper family through the CLI with --compact-every: the sink is
    the changelog (at least one _FULL-marked snapshot, not one per
    batch) and state_rows equals the corpus's distinct canonical URL
    count."""
    docs = load_table(spark, sf_small, "documents").select(
        "doc_id", _dup_url_col().alias("url")
    )
    src = str(tmp_path / "src")
    _write_source(docs, src, n_files=4)
    sink = str(tmp_path / "sink")
    report = str(tmp_path / "report.json")
    assert main([
        "monitor", "--family", "url-dedup", "--source", src,
        "--sink", sink, "--checkpoint", str(tmp_path / "ckpt"),
        "--max-files-per-trigger", "1", "--compact-every", "2",
        "--report", report,
    ]) == 0
    rep = json.load(open(report))
    from tripl_spark.operators.urls import canonical_url

    want_cu = docs.select(canonical_url(F.col("url")).alias("cu")).distinct().count()
    assert rep["state_rows"] == want_cu
    assert "view" not in rep  # keeper state is corpus-sized: summary only
    fulls = [
        d for d in os.listdir(sink)
        if d.startswith("batch_id=")
        and os.path.exists(os.path.join(sink, d, _FULL_MARKER))
    ]
    n_batches = len(rep["batches_committed"])
    assert 1 <= len(fulls) < n_batches


def test_monitor_domain_family_parses_raw_urls(spark, sf_small, tmp_path):
    """The domain family accepts a raw (doc_id, url) source (the CLI
    parses in-batch via url_components) and its report view equals the
    shared rollup over the parsed corpus."""
    docs = load_table(spark, sf_small, "documents").select(
        "doc_id", _dup_url_col().alias("url")
    )
    src = str(tmp_path / "src")
    _write_source(docs, src, n_files=2)
    report = str(tmp_path / "report.json")
    assert main([
        "monitor", "--family", "domain", "--source", src,
        "--sink", str(tmp_path / "sink"),
        "--checkpoint", str(tmp_path / "ckpt"), "--report", report,
    ]) == 0
    rep = json.load(open(report))
    from tripl_spark.operators.urls import attach_registered_domain

    want_domains = (
        attach_registered_domain(
            docs.select(F.parse_url(F.col("url"), F.lit("HOST")).alias("host"))
        )
        .select("reg_domain")
        .distinct()
        .count()
    )
    assert rep["state_rows"] == want_domains
    assert sum(r["n_docs"] for r in rep["view"]) == docs.count()


def test_monitor_compact_every_refused_for_counter_family(spark, tmp_path, capsys):
    rc = main([
        "monitor", "--family", "quality", "--source", str(tmp_path / "nope"),
        "--sink", str(tmp_path / "sink"),
        "--checkpoint", str(tmp_path / "ckpt"), "--compact-every", "3",
    ])
    assert rc == 2
    assert "keeper families" in capsys.readouterr().err


def test_monitor_missing_source_is_loud(spark, tmp_path, capsys):
    rc = main([
        "monitor", "--family", "pii", "--source", str(tmp_path / "absent"),
        "--sink", str(tmp_path / "sink"),
        "--checkpoint", str(tmp_path / "ckpt"),
    ])
    assert rc == 1
    assert "cannot probe source schema" in capsys.readouterr().err


def test_monitor_refuses_checkpoint_sink_mismatch(spark, sf_small, tmp_path, capsys):
    """The review-found drop mode: re-running against the same sink
    with a DIFFERENT checkpoint restarts batch ids at 0, which the
    sink's replay skip would silently swallow — the recorded
    checkpoint identity in the sink must refuse the run."""
    docs = load_table(spark, sf_small, "documents")
    src = str(tmp_path / "src")
    _write_source(docs, src, n_files=2)
    base = [
        "monitor", "--family", "quality", "--source", src,
        "--sink", str(tmp_path / "sink"),
    ]
    assert main(base + ["--checkpoint", str(tmp_path / "ckpt1")]) == 0
    rc = main(base + ["--checkpoint", str(tmp_path / "ckpt2")])
    assert rc == 2
    err = capsys.readouterr().err
    assert "checkpoint" in err and "fresh sink" in err
    # same checkpoint still resumes fine
    assert main(base + ["--checkpoint", str(tmp_path / "ckpt1")]) == 0

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
    """The review-found drop modes, all three directions of the
    lockstep pairing: (a) same sink + different checkpoint, (b) same
    sink + same checkpoint PATH but deleted-and-recreated checkpoint
    (batch ids restart at 0 — the path-identity bypass), (c) fresh
    sink + old checkpoint (drains nothing, sink stays empty). Only
    the original intact pair may resume."""
    import shutil

    docs = load_table(spark, sf_small, "documents")
    src = str(tmp_path / "src")
    _write_source(docs, src, n_files=2)
    sink = str(tmp_path / "sink")
    ckpt1 = str(tmp_path / "ckpt1")
    base = ["monitor", "--family", "quality", "--source", src, "--sink", sink]
    assert main(base + ["--checkpoint", ckpt1]) == 0
    # (a) different checkpoint path
    rc = main(base + ["--checkpoint", str(tmp_path / "ckpt2")])
    assert rc == 2
    err = capsys.readouterr().err
    assert "checkpoint" in err and "fresh sink" in err
    # same intact pair still resumes fine
    assert main(base + ["--checkpoint", ckpt1]) == 0
    # (c) old checkpoint against a FRESH sink: would drain nothing
    rc = main([
        "monitor", "--family", "quality", "--source", src,
        "--sink", str(tmp_path / "sink_b"), "--checkpoint", ckpt1,
    ])
    assert rc == 2
    assert "different sink" in capsys.readouterr().err
    # (b) delete + recreate the checkpoint AT THE SAME PATH
    shutil.rmtree(ckpt1)
    rc = main(base + ["--checkpoint", ckpt1])
    assert rc == 2
    assert "deleted or recreated" in capsys.readouterr().err


def test_monitor_rejects_both_compaction_flags(spark, tmp_path, capsys):
    rc = main([
        "monitor", "--family", "line-dedup", "--source", str(tmp_path / "s"),
        "--sink", str(tmp_path / "k"), "--checkpoint", str(tmp_path / "c"),
        "--compact-every", "3", "--compact-ratio", "1.0",
    ])
    assert rc == 2
    assert "not both" in capsys.readouterr().err


def test_monitor_changelog_resume_without_flag_is_clean_rc2(
    spark, sf_small, tmp_path, capsys
):
    """Resuming a changelog sink without a changelog flag hits the
    library mode guard — the CLI must surface it as stderr + rc 2,
    not a ValueError traceback."""
    docs = load_table(spark, sf_small, "documents").select(
        "doc_id", _dup_url_col().alias("url")
    )
    src = str(tmp_path / "src")
    _write_source(docs, src, n_files=2)
    base = [
        "monitor", "--family", "url-dedup", "--source", src,
        "--sink", str(tmp_path / "sink"),
        "--checkpoint", str(tmp_path / "ckpt"),
    ]
    assert main(base + ["--compact-every", "2"]) == 0
    rc = main(base)  # no changelog flag: the sink holds deltas
    assert rc == 2
    assert "changelog" in capsys.readouterr().err


def test_monitor_failed_probe_does_not_pin_sink(spark, tmp_path, capsys):
    """A run that dies at the source probe must NOT write pairing
    markers — otherwise a retry with a corrected source and a fresh
    checkpoint would be falsely refused on an empty sink."""
    sink = str(tmp_path / "sink")
    rc = main([
        "monitor", "--family", "pii", "--source", str(tmp_path / "absent"),
        "--sink", sink, "--checkpoint", str(tmp_path / "c1"),
    ])
    assert rc == 1
    capsys.readouterr()
    import os as _os

    assert not _os.path.exists(_os.path.join(sink, "_CHECKPOINT"))

"""Unicode normalization scan: known-example NFC behavior, planted-
corpus non-vacuity, and the sanctioned-Python plan shape
(operators/text.py text_normalize_scan). DuckDB parity — including the
NFC-vs-nfc_normalize pin — rides tests/test_oracle_parity.py."""

from __future__ import annotations

from pyspark.sql import functions as F

from tripl_spark.operators.text import normalize_text
from tripl_spark.queries.registry import REGISTRY, _ensure_loaded

_ensure_loaded()


def test_known_examples_normalize_exactly(spark):
    df = spark.createDataFrame(
        [
            (0, "plain ascii stays put"),
            (1, "cafe\u0301 blase\u0301"),  # combining acute -> composed
            (2, "line1\r\nline2\r\n"),            # CRLF → LF
            (3, "a\u00a0b"),                # NBSP -> space
            (4, None),                             # NULL passes through
        ],
        "i long, t string",
    )
    rows = {r.i: r.n for r in
            df.select("i", normalize_text(F.col("t")).alias("n")).collect()}
    assert rows[0] == "plain ascii stays put"
    assert rows[1] == "caf\u00e9 blas\u00e9"
    assert len(rows[1]) == len("cafe blase")  # two chars composed away
    assert rows[2] == "line1\nline2\n"
    assert rows[3] == "a b"
    assert rows[4] is None


def test_planted_corpus_fires_every_repair(spark, sf_small):
    out = REGISTRY["text_normalize_scan"].fn(spark, sf_small)
    t = out.agg(
        F.sum("n_crlf").alias("crlf"),
        F.sum("n_nbsp").alias("nbsp"),
        F.sum((F.col("n_chars_norm") < F.col("n_chars_raw")).cast("long"))
        .alias("shrunk"),
        F.sum(F.col("changed").cast("long")).alias("changed"),
    ).collect()[0]
    assert t.crlf > 0 and t.nbsp > 0
    # NFC composition (2 combining accents) and CRLF→LF both shrink
    assert t.shrunk > 0
    # every damaged doc flags changed; clean docs don't
    assert t.changed > 0
    clean = out.filter(~F.col("changed"))
    assert clean.filter(
        (F.col("n_crlf") > 0) | (F.col("n_nbsp") > 0)
        | (F.col("n_chars_norm") != F.col("n_chars_raw"))
    ).count() == 0


def test_normalize_plan_is_arrow_batched_map_only(spark, sf_small):
    from tripl_spark.sources.bucketing import explain_str

    plan = explain_str(REGISTRY["text_normalize_scan"].fn(spark, sf_small))
    assert "Exchange" not in plan, plan
    assert "Join" not in plan, plan
    # NFC is the sanctioned Python escape hatch: Arrow-batched, never
    # row-at-a-time
    assert "ArrowEvalPython" in plan, plan
    assert "BatchEvalPython" not in plan, plan

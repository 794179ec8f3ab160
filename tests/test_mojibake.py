"""Encoding-damage scan: known-example counts, planted-corpus
non-vacuity, and the scan-shaped plan (operators/text.py
text_mojibake_scan). DuckDB parity rides tests/test_oracle_parity.py."""

from __future__ import annotations

from pyspark.sql import functions as F

from tripl_spark.operators.text import MOJIBAKE_PATTERNS
from tripl_spark.queries.registry import REGISTRY, _ensure_loaded

_ensure_loaded()


def test_known_examples_count_exactly(spark):
    df = spark.createDataFrame(
        [
            (0, "clean ascii text only"),
            (1, "bad � byte and another �"),
            (2, "bell\x07 and escape\x1b but tab\t newline\n are fine"),
            (3, "cafÃ© naÃ¯ve â€œquotedâ€“dash"),
        ],
        "i long, t string",
    )
    counts = [
        F.size(F.regexp_extract_all(F.col("t"), F.lit(pat), F.lit(0)))
        .alias(name)
        for name, pat in MOJIBAKE_PATTERNS
    ]
    rows = {r.i: r for r in df.select("i", *counts).collect()}
    assert (rows[0].replacement, rows[0].ctrl, rows[0].double_enc) == (0, 0, 0)
    assert rows[1].replacement == 2
    # \x07 and \x1b count; \t and \n never do
    assert rows[2].ctrl == 2
    # Ã© + Ã¯ + â€œ + â€“ — Ã¯ joined the alternation in the r15
    # widening (still a concrete list, no unicode ranges)
    assert rows[3].double_enc == 4


def test_planted_corpus_fires_every_class(spark, sf_small):
    out = REGISTRY["text_mojibake_scan"].fn(spark, sf_small)
    totals = out.agg(
        *[F.sum(f"n_{name}").alias(name) for name, _ in MOJIBAKE_PATTERNS]
    ).collect()[0]
    for name, _ in MOJIBAKE_PATTERNS:
        assert totals[name] > 0, name
    # conservation + certificate
    parts = sum(F.col(f"n_{n}") for n, _ in MOJIBAKE_PATTERNS)
    assert out.filter(F.col("n_mojibake") != parts).count() == 0
    assert out.filter(F.col("clean") != (F.col("n_mojibake") == 0)).count() == 0


def test_every_digraph_planted_and_counted(spark, sf_small):
    """r15 widening contract: each of the 37 table digraphs is planted
    somewhere in the corpus (the rotating % 3 branch), and a doc
    carrying ONLY that rotated digraph counts it — so a digraph
    silently dropped from the alternation flips counts, not nothing."""
    from tripl_spark.operators.text import _DOUBLE_ENC_DIGRAPHS, _mojibake_text
    from tripl_spark.session import load_table

    assert len(_DOUBLE_ENC_DIGRAPHS) == 37
    assert len(set(_DOUBLE_ENC_DIGRAPHS)) == 37
    # derivation invariant: every entry is utf-8 bytes read as cp1252,
    # and none carries an invisible char the SQL embedding could drop
    for d in _DOUBLE_ENC_DIGRAPHS:
        assert d.encode("cp1252").decode("utf-8"), d
        assert not any(c in "\xa0\xad" for c in d), d
    docs = load_table(spark, sf_small, "documents").select(
        "doc_id", _mojibake_text().alias("mt")
    )
    pat = MOJIBAKE_PATTERNS[2][1]
    hits = docs.select(
        "mt",
        F.size(F.regexp_extract_all(F.col("mt"), F.lit(pat), F.lit(0))).alias("n"),
    )
    for d in _DOUBLE_ENC_DIGRAPHS:
        carrier = hits.filter(F.col("mt").contains(" mix " + d))
        assert carrier.limit(1).count() > 0, f"never planted: {d!r}"
        assert carrier.filter(F.col("n") == 0).count() == 0, f"not counted: {d!r}"


def test_scan_is_shuffle_free(spark, sf_small):
    from tripl_spark.sources.bucketing import explain_str

    plan = explain_str(REGISTRY["text_mojibake_scan"].fn(spark, sf_small))
    assert "Exchange" not in plan, plan
    assert "Join" not in plan, plan

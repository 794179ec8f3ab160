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
    # Ã© + â€œ + â€“ in the alternation; Ã¯ deliberately not (concrete
    # list, no unicode ranges)
    assert rows[3].double_enc == 3


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


def test_scan_is_shuffle_free(spark, sf_small):
    from tripl_spark.sources.bucketing import explain_str

    plan = explain_str(REGISTRY["text_mojibake_scan"].fn(spark, sf_small))
    assert "Exchange" not in plan, plan
    assert "Join" not in plan, plan

"""PII scrubbing: known-example redaction, class precedence, scrub
idempotence, and the residual-clean certificate (`operators/pii.py`).
DuckDB parity for both registered queries rides the REGISTRY-wide
sweep in tests/test_oracle_parity.py."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tripl_spark.operators.pii import PII_CLASSES, pii_counts, scrub_pii
from tripl_spark.queries.registry import REGISTRY, _ensure_loaded

_ensure_loaded()


def _run(spark, texts):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "i long, t string")
    out = df.select(
        "i", *pii_counts(F.col("t")), scrub_pii(F.col("t")).alias("scrubbed")
    ).orderBy("i")
    return out.collect()


def test_known_examples_scrub_exactly(spark):
    rows = _run(spark, [
        "write to alice.smith+spam@mail.example.org for details",
        "my number is +1 (555) 010-4242, call anytime",
        "origin 192.168.0.1 forwarded for 10.0.255.3",
        "ssn on file: 123-45-6789",
        "no pii here at all",
    ])
    assert rows[0].scrubbed == "write to [EMAIL] for details"
    assert rows[0].n_email == 1 and rows[0].n_phone == 0
    assert rows[1].scrubbed == "my number is [PHONE], call anytime"
    assert rows[1].n_phone == 1
    assert rows[2].scrubbed == "origin [IP] forwarded for [IP]"
    assert rows[2].n_ip == 2
    assert rows[3].scrubbed == "ssn on file: [ID]"
    assert rows[3].n_id == 1 and rows[3].n_phone == 0
    assert rows[4].scrubbed == "no pii here at all"
    assert rows[4].n_email == rows[4].n_id == rows[4].n_phone == rows[4].n_ip == 0


def test_precedence_first_matching_class_wins(spark):
    """An SSN-shaped id also matches the phone pattern; the counts
    must attribute it to the EARLIER class only (the drop-ledger
    discipline: one token, one fate)."""
    (row,) = _run(spark, ["id 123-45-6789 then phone 555 010 4242 end"])
    assert row.n_id == 1
    assert row.n_phone == 1  # the real phone, not the id
    assert row.scrubbed == "id [ID] then phone [PHONE] end"


def test_email_digits_not_double_counted(spark):
    (row,) = _run(spark, ["mail 123456789@numeric-domain.net now"])
    assert row.n_email == 1 and row.n_phone == 0
    assert row.scrubbed == "mail [EMAIL] now"


def test_scrub_is_idempotent_and_clean_on_corpus(spark, sf_small):
    """Over the registered query's planted corpus: every document ends
    clean (no residual match of any class), and re-scrubbing the
    scrubbed text changes nothing — the invariant a downstream
    tokenizer relies on."""
    out = REGISTRY["text_pii_scrub"].fn(spark, sf_small)
    assert out.filter(~F.col("clean")).count() == 0
    # conservation: n_pii == sum of the per-class counts
    parts = sum(F.col(f"n_{n}") for n, _, _ in PII_CLASSES)
    assert out.filter(F.col("n_pii") != parts).count() == 0
    # planted classes actually fire somewhere (non-vacuous gate)
    totals = out.agg(
        *[F.sum(f"n_{n}").alias(n) for n, _, _ in PII_CLASSES]
    ).collect()[0]
    assert all(totals[n] > 0 for n, _, _ in PII_CLASSES), totals


def test_double_scrub_fixpoint(spark):
    texts = [
        "a@b.co and 1.2.3.4 and +12 3456789 and 987-65-4321",
        "[EMAIL] already scrubbed [IP]",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    once = df.select(scrub_pii(F.col("t")).alias("s"))
    twice = once.select(scrub_pii(F.col("s")).alias("s2"), "s")
    assert twice.filter(F.col("s") != F.col("s2")).count() == 0


def test_prevalence_conserves_and_orders(spark, sf_small):
    card = REGISTRY["text_pii_prevalence"].fn(spark, sf_small)
    rows = card.collect()
    assert rows == sorted(rows, key=lambda r: (r.source, r.lang))
    for r in rows:
        assert 0 <= r.docs_with_pii <= r.n_docs
        assert r.pii_rate == pytest.approx(
            round(r.docs_with_pii / r.n_docs, 4), abs=1e-9
        )
    n_docs_total = sum(r.n_docs for r in rows)
    scrub = REGISTRY["text_pii_scrub"].fn(spark, sf_small)
    assert n_docs_total == scrub.count()


def test_secret_credentials_scrub_and_precedence(spark):
    """r15 6th class: prefixed API keys, 32+ hex digests, and 40+
    base64-ish runs redact as [SECRET]; precedence (after email,
    before the digit classes) keeps a hex digest with an all-digit
    tail from leaking a bogus [PHONE] match, and a key pasted inside
    an email address stays part of the address."""
    rows = _run(spark, [
        "key sk-abcdefghij0123456789ABCD deployed",
        "digest d41d8cd98f00b204e9800998ecf8427e stored",
        # hex whose 7+ digit tail would match the phone class if
        # secret didn't claim the whole token first
        "hash aabbccddeeff001122334455661234567 end",
        # non-hex letters force the base64 branch (48 chars + padding)
        "blob " + "Zz9" * 16 + "== done",
        "mail sk-abcdefghij0123456789ABCD@example.com now",
        "short a1b2c3 and sk-tooshort stay",
    ])
    assert rows[0].n_secret == 1
    assert rows[0].scrubbed == "key [SECRET] deployed"
    assert rows[1].n_secret == 1
    assert rows[1].scrubbed == "digest [SECRET] stored"
    assert rows[2].n_secret == 1 and rows[2].n_phone == 0
    assert rows[2].scrubbed == "hash [SECRET] end"
    assert rows[3].n_secret == 1
    assert rows[3].scrubbed == "blob [SECRET] done"  # padding consumed
    assert rows[4].n_email == 1 and rows[4].n_secret == 0
    assert rows[4].scrubbed == "mail [EMAIL] now"
    assert rows[5].n_secret == 0
    assert rows[5].scrubbed == "short a1b2c3 and sk-tooshort stay"


def test_phone_does_not_bridge_whitespace_into_neighbors(spark):
    """REGRESSION (r12 review): an open separator class with a space
    let one phone match greedily swallow the first octet of an
    adjacent IP ('5551234567 10' -> '[PHONE].0.0.1', n_ip=0). The
    grouped pattern caps what a match can span: the IP survives
    intact and is counted."""
    (row,) = _run(spark, ["call 5551234567 10.0.0.1 done"])
    assert row.n_phone == 1 and row.n_ip == 1
    assert row.scrubbed == "call [PHONE] [IP] done"


def test_dates_are_not_phones(spark):
    """REGRESSION (r12 review): 2020-01-01 matched the old phone
    class. The grouped pattern requires ddd[sep]dddd digit groups a
    date never has."""
    (row,) = _run(spark, ["meeting on 2020-01-01 and 1999-12-31"])
    assert row.n_email == row.n_id == row.n_phone == row.n_ip == 0
    assert row.scrubbed == "meeting on 2020-01-01 and 1999-12-31"


# --------------------------------------------------------------------------
# C4-style global line dedup (operators/dedup.py::dedup_lines_global)
# --------------------------------------------------------------------------

def test_lines_global_keeps_first_occurrence_only(spark):
    import tripl_spark.operators.dedup as D
    from tripl_spark.operators.dedup import LINE_TOKENS, dedup_lines_global

    line_a = " ".join(f"w{i}" for i in range(LINE_TOKENS))
    line_b = " ".join(f"x{i}" for i in range(LINE_TOKENS))
    line_c = " ".join(f"y{i}" for i in range(LINE_TOKENS))
    docs = spark.createDataFrame(
        [
            (0, f"{line_a} {line_b}"),          # first occurrences
            (1, f"{line_c} {line_a}"),          # repeats line_a -> dropped
            (2, f"{line_b} {line_b}"),          # within-doc repeat of a dup
        ],
        "doc_id long, text string",
    )
    orig = D.load_table  # patch the module's own binding (imported by name)
    D.load_table = lambda sp, sf, name: docs
    try:
        rows = {r.doc_id: r for r in dedup_lines_global(spark, "ignored").collect()}
    finally:
        D.load_table = orig
    assert (rows[0].n_lines, rows[0].n_kept, rows[0].n_dropped) == (2, 2, 0)
    assert (rows[1].n_lines, rows[1].n_kept, rows[1].n_dropped) == (2, 1, 1)
    # doc 2: BOTH copies lose to doc 0's first occurrence
    assert (rows[2].n_lines, rows[2].n_kept, rows[2].n_dropped) == (2, 0, 2)
    # reassembly: doc 1 keeps only line_c; doc 2 reassembles to ''
    import hashlib
    assert rows[1].dedup_fp == hashlib.md5(line_c.encode()).hexdigest()
    assert rows[2].dedup_fp == hashlib.md5(b"").hexdigest()
    # conservation everywhere
    for r in rows.values():
        assert r.n_kept + r.n_dropped == r.n_lines


def test_lines_global_conserves_on_corpus(spark, sf_small):
    out = REGISTRY["dedup_lines_global"].fn(spark, sf_small)
    assert out.filter(F.col("n_kept") + F.col("n_dropped") != F.col("n_lines")).count() == 0
    # the synthetic near-dups make the gate non-vacuous
    assert out.agg(F.sum("n_dropped")).collect()[0][0] > 0
    # docs partition: one row per document
    from tripl_spark.session import load_table
    assert out.count() == load_table(spark, sf_small, "documents").count()


def test_cc_class_scrubs_and_luhn_distinguishes(spark):
    """Credit-card shapes are scrubbed regardless of checksum
    (over-redaction bias); the Luhn count fires only on valid
    numbers — both separator styles and the contiguous form."""
    from tripl_spark.operators.pii import luhn_valid_count

    df = spark.createDataFrame(
        [
            (0, "pay 4111 1111 1111 1111 now"),          # valid, spaces
            (1, "pay 4111 1111 1111 1112 now"),          # invalid checksum
            (2, "pay 4012-8888-8888-1881 now"),          # valid, dashes
            (3, "pay 4111111111111111 now"),             # valid, contiguous
            (4, "order 1234 5678 from 2024",),           # not a card
        ],
        "i long, t string",
    )
    rows = (
        df.select(
            "i",
            *pii_counts(F.col("t")),
            luhn_valid_count(F.col("t")).alias("n_luhn"),
            scrub_pii(F.col("t")).alias("scrubbed"),
        )
        .orderBy("i")
        .collect()
    )
    for i in (0, 1, 2, 3):
        assert rows[i].n_cc == 1 and rows[i].scrubbed == "pay [CC] now", rows[i]
    assert [r.n_luhn for r in rows] == [1, 0, 1, 1, 0]
    # 8 digits is no card (the phone class still claims the 4+4 pair —
    # the acknowledged over-redaction bias)
    assert rows[4].n_cc == 0 and "[CC]" not in rows[4].scrubbed


def test_cc_precedes_phone_in_precedence(spark):
    """A 16-digit card must be claimed whole by the cc class — the
    phone pattern would otherwise shred it into ddd-dddd fragments."""
    (row,) = _run(spark, ["card 4111 1111 1111 1111 phone 555 010 4242"])
    assert row.n_cc == 1 and row.n_phone == 1
    assert row.scrubbed == "card [CC] phone [PHONE]"


def test_null_text_counts_zero_not_minus_one(spark):
    """REGRESSION (r12 advice): sizeOfNull's legacy -1 must never leak
    into counters — NULL text counts 0 for every class."""
    df = spark.createDataFrame([(None,)], "t string")
    (row,) = df.select(*pii_counts(F.col("t"))).collect()
    for name, _, _ in PII_CLASSES:
        assert row[f"n_{name}"] == 0, (name, row)


def test_lines_newline_splits_and_dedups_real_lines(spark):
    import hashlib

    from tripl_spark.operators.dedup import line_keeper_dedup, split_lines_newline

    boiler = "subscribe to our newsletter"
    docs = spark.createDataFrame(
        [
            (0, f"alpha beta\n{boiler}\ngamma delta"),
            (1, f"{boiler}\nunique content here"),    # boiler repeated -> dropped
            (2, "  \nalpha beta\n"),                   # blank lines dropped, dup line
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in
            line_keeper_dedup(split_lines_newline(docs), sep="\n").collect()}
    assert (rows[0].n_lines, rows[0].n_kept, rows[0].n_dropped) == (3, 3, 0)
    assert (rows[1].n_lines, rows[1].n_kept, rows[1].n_dropped) == (2, 1, 1)
    # doc 2: both real lines lost (blank lines never counted)
    assert (rows[2].n_lines, rows[2].n_kept, rows[2].n_dropped) == (1, 0, 1)
    assert rows[1].dedup_fp == hashlib.md5(b"unique content here").hexdigest()
    assert rows[2].dedup_fp == hashlib.md5(b"").hexdigest()


def test_lines_newline_boilerplate_keeps_exactly_one_copy(spark, sf_small):
    """On the registered planted corpus the header/footer boilerplate
    lines appear in 1/6 and 1/4 of docs; exactly one copy of each
    survives corpus-wide."""
    from tripl_spark.operators.dedup import (
        _NL_FOOTER,
        _NL_HEADER,
        _planted_multiline,
        split_lines_newline,
    )
    from tripl_spark.session import load_table

    docs = load_table(spark, sf_small, "documents")
    multi = docs.select("doc_id", _planted_multiline().alias("text"))
    keyed = split_lines_newline(multi)
    for line in (_NL_HEADER, _NL_FOOTER):
        occ = keyed.filter(F.col("line") == line).count()
        assert occ > 1, line
    out = REGISTRY["dedup_lines_newline"].fn(spark, sf_small)
    total_header = keyed.filter(F.col("line").isin(_NL_HEADER, _NL_FOOTER)).count()
    # drops >= every boilerplate copy past the two keepers
    assert out.agg(F.sum("n_dropped")).collect()[0][0] >= total_header - 2


def test_paragraphs_global_boilerplate_keeps_exactly_one_copy(spark, sf_small):
    """Paragraph unit (blank-line split): the planted cookie-banner
    (1/5 of docs) and license (1/3) paragraphs each survive as exactly
    ONE keeper paragraph corpus-wide — dropped as whole blocks, the
    reason CCNet dedups paragraphs rather than lines."""
    import hashlib

    from tripl_spark.operators.dedup import (
        _PARA_BANNER,
        _PARA_LICENSE,
        _planted_multipara,
        line_keeper_dedup,
        split_paragraphs,
    )
    from tripl_spark.session import load_table

    docs = load_table(spark, sf_small, "documents")
    multi = docs.select("doc_id", _planted_multipara().alias("text"))
    keyed = split_paragraphs(multi)
    n_banner = keyed.filter(F.col("line") == _PARA_BANNER).count()
    n_lic = keyed.filter(F.col("line") == _PARA_LICENSE).count()
    assert n_banner > 1 and n_lic > 1
    out = REGISTRY["dedup_paragraphs_global"].fn(spark, sf_small)
    # each boilerplate paragraph keeps exactly one copy: corpus-wide
    # drops >= all copies past the two keepers
    assert out.agg(F.sum("n_dropped")).collect()[0][0] >= n_banner + n_lic - 2
    # doc-level spot check: the paragraph split round-trips (a doc with
    # no dropped paragraphs reassembles to its own planted text)
    clean = out.filter("n_dropped = 0").join(multi, "doc_id").collect()
    assert clean, "some docs should carry no duplicate paragraphs"
    for r in clean[:5]:
        paras = [p.strip() for p in r.text.split("\n\n") if p.strip()]
        want = hashlib.md5("\n\n".join(paras).encode()).hexdigest()
        assert r.dedup_fp == want

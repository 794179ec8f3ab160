"""Property tests for the round-5b pipeline additions: weighted
sampling bias and bigram-LM ordering — properties the DuckDB hash
parity (tests/test_oracle_parity.py) can't express."""

from __future__ import annotations

from pyspark.sql import functions as F

from tripl_spark.queries.registry import REGISTRY, _ensure_loaded
from tripl_spark.session import load_table

_ensure_loaded()


def test_weighted_sample_prefers_long_documents(spark, sf_small):
    """Priority = hash/weight with weight = n_chars: the drawn sample's
    mean length must exceed the corpus mean (weighting works), and the
    draw must be reproducible."""
    docs = load_table(spark, sf_small, "documents")
    corpus_mean = docs.agg(F.avg("n_chars")).first()[0]
    s1 = REGISTRY["curation_weighted_sample"].fn(spark, sf_small).collect()
    s2 = REGISTRY["curation_weighted_sample"].fn(spark, sf_small).collect()
    assert [r.doc_id for r in s1] == [r.doc_id for r in s2]  # deterministic
    sample_mean = sum(r.n_chars for r in s1) / len(s1)
    assert sample_mean > corpus_mean


def test_bigram_logprob_ranks_repetitive_text_higher(spark):
    """A document made of one repeated corpus-frequent bigram must
    out-score a document of unique bigrams under the corpus bigram LM."""
    from tripl_spark.operators.text import text_bigram_logprob  # noqa: F401  (registry entry)

    docs = spark.createDataFrame(
        [
            (1, "the cat " * 20),
            (2, "aa bb cc dd ee ff gg hh ii jj kk ll mm nn oo pp"),
            (3, "the cat sat"),
        ],
        "doc_id long, text string",
    )
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        docs.write.parquet(os.path.join(d, "documents.parquet"))
        out = {
            r.doc_id: r.avg_logprob
            for r in REGISTRY["text_bigram_logprob"].fn(spark, d).collect()
        }
    # repeated frequent bigram > known-bigram tail doc > all-unique doc
    assert out[1] > out[3] > out[2]
    for v in out.values():
        assert v < 0


def test_token_budget_greedy_prefix_is_maximal(spark, sf_small):
    """Per source: selected docs are a prefix of the hash order, their
    token total fits the budget, and the first excluded doc would
    exceed it (greedy maximality)."""
    from tripl_spark.operators.curation import _md5_hash60
    from tripl_spark.operators.mixing import mixing_token_budget

    out = mixing_token_budget(spark, sf_small).toPandas()
    docs = (
        load_table(spark, sf_small, "documents")
        .select(
            "doc_id",
            "source",
            F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long").alias("n_tokens"),
            _md5_hash60(F.col("doc_id").cast("string")).alias("h"),
        )
        .toPandas()
    )
    budgets = out.groupby("source")["budget_tokens"].first()
    for src, grp in docs.groupby("source"):
        order = grp.sort_values(["h", "doc_id"]).reset_index(drop=True)
        chosen = set(out[out.source == src].doc_id)
        cum, expect = 0, set()
        for r in order.itertuples():
            if cum + r.n_tokens <= budgets[src]:
                cum += r.n_tokens
                expect.add(r.doc_id)
            else:
                break  # greedy PREFIX: stop at the first overflow
        assert chosen == expect, src


def test_weighted_sample_priority_engine_matches_python_random():
    """Hypothesis: DuckDB's md5-prefix + integer-division priority (the
    exact arithmetic the oracle AND the Spark operator share) equals a
    pure Python replay for arbitrary (id, weight) corpora — pinning
    that the cross-engine determinism claim isn't data-luck."""
    import hashlib

    import duckdb
    from hypothesis import given, settings
    from hypothesis import strategies as st

    def h60(doc_id: int) -> int:
        return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16)

    @given(
        rows=st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=10_000),
                st.integers(min_value=1, max_value=9_999),
            ),
            min_size=1,
            max_size=30,
            unique_by=lambda t: t[0],
        )
    )
    @settings(max_examples=30, deadline=None)
    def check(rows):
        vals = ", ".join(f"({i}, {w})" for i, w in rows)
        got = duckdb.sql(
            f"""
            SELECT doc_id FROM (VALUES {vals}) AS t(doc_id, w)
            ORDER BY (CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)
                           AS BIGINT) + 1) // w,
                     doc_id
            """
        ).fetchall()
        expect = sorted(rows, key=lambda t: ((h60(t[0]) + 1) // t[1], t[0]))
        assert [r[0] for r in got] == [i for i, _ in expect]

    check()


def test_retention_cohort_semantics(spark, sf_small):
    """Independent of the DuckDB parity: every user appears in their
    cohort's offset-0 cell, so offset-0 counts sum to the distinct
    user count, and no offset is negative."""
    out = REGISTRY["events_retention_cohorts"].fn(spark, sf_small).toPandas()
    ev = load_table(spark, sf_small, "events")
    n_users = ev.select("user_id").distinct().count()
    assert out[out.week_offset == 0].n_users.sum() == n_users
    assert (out.week_offset >= 0).all()
    # retention never exceeds the cohort's size
    base = out[out.week_offset == 0].set_index("cohort_week").n_users
    for _, r in out.iterrows():
        assert r.n_users <= base[r.cohort_week]


def test_vocab_coverage_semantics(spark, sf_small):
    """Independent of the DuckDB parity: OOV counts are consistent with
    a pure-Python replay of the top-N vocabulary."""
    from collections import Counter

    from tripl_spark.operators.tokenizer import VOCAB_SIZE

    out = {
        r.doc_id: (r.n_tokens, r.n_oov)
        for r in REGISTRY["tokenizer_vocab_coverage"].fn(spark, sf_small).collect()
    }
    docs = load_table(spark, sf_small, "documents").select("doc_id", "text").collect()
    counts = Counter()
    toks = {}
    for r in docs:
        t = r.text.strip().lower().split()
        toks[r.doc_id] = t
        counts.update(t)
    vocab = {t for t, _ in sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:VOCAB_SIZE]}
    for doc_id, t in toks.items():
        n_oov = sum(1 for x in t if x not in vocab)
        assert out[doc_id] == (len(t), n_oov), doc_id


def test_epoch_schedule_cap_and_spill_redistribution(spark):
    """Skewed mix the corpus fixture never produces: a tiny source
    whose temperature target exceeds the epoch cap must be capped, its
    excess redistributed over the uncapped sources proportionally to
    their targets, and total allocation conserved (no residual here
    since the big sources stay under cap after the spill)."""
    from pyspark.sql import functions as F

    from tripl_spark.operators.mixing import epoch_schedule

    per = spark.createDataFrame(
        [("tiny", 100), ("mid", 10_000), ("big", 90_000)],
        "source string, src_tokens long",
    )
    rows = {r["source"]: r for r in epoch_schedule(per).collect()}
    # sqrt weights: tiny raw ~73 epochs, mid raw ~7.3 — both capped
    # exactly at 4.0; big raw ~2.44 stays open
    assert rows["tiny"]["epochs"] == 4.0
    assert rows["tiny"]["allocated_tokens"] == 400.0
    assert rows["mid"]["epochs"] == 4.0
    assert rows["mid"]["allocated_tokens"] == 40_000.0
    # the one uncapped source absorbs ALL the spill and stays under cap
    assert 2.44 < rows["big"]["epochs"] < 4.0, rows["big"]
    # conservation: everything the budget had is allocated (3x total)
    total = sum(r["allocated_tokens"] for r in rows.values())
    budget = 3 * (100 + 10_000 + 90_000)
    assert abs(total - budget) < 1.0, (total, budget)


def test_leakage_safe_split_keeps_families_together(spark, sf_small):
    """The leakage property itself: every near-dup family lands in ONE
    split; singleton docs agree with the plain doc-id splitter (the
    family id degenerates to the doc id)."""
    from tripl_spark.queries.registry import REGISTRY

    safe = {r["doc_id"]: (r["group_id"], r["split"]) for r in
            REGISTRY["mixing_leakage_safe_split"].fn(spark, sf_small).collect()}
    plain = {r["doc_id"]: r["split"] for r in
             REGISTRY["mixing_split_assign"].fn(spark, sf_small).collect()}
    assert set(safe) == set(plain)
    by_group: dict = {}
    for doc, (gid, split) in safe.items():
        by_group.setdefault(gid, set()).add(split)
    # one split per family — the invariant random splits violate
    assert all(len(s) == 1 for s in by_group.values()), by_group
    # singletons (group of one, gid == doc_id) match the plain splitter
    singles = [d for d, (g, _) in safe.items()
               if g == d and sum(1 for x in safe.values() if x[0] == g) == 1]
    assert singles, "fixture must contain singleton docs"
    assert all(safe[d][1] == plain[d] for d in singles)
    # and the fixture must actually exercise a multi-doc family
    assert any(len([1 for x in safe.values() if x[0] == g]) > 1
               for g in by_group), "no dup family in fixture"


def test_drop_ledger_conserves_and_agrees_with_survivors(spark, sf_small):
    """Conservation: every corpus doc appears exactly once with one
    fate; the 'train' rows are exactly pipeline_leakage_safe_corpus's
    survivor set; fate precedence means a non-canonical family member
    is never blamed on a quality rule."""
    from tripl_spark.queries.registry import REGISTRY
    from tripl_spark.session import load_table

    ledger = {r["doc_id"]: r["fate"] for r in
              REGISTRY["pipeline_drop_ledger"].fn(spark, sf_small).collect()}
    n_docs = load_table(spark, sf_small, "documents").count()
    assert len(ledger) == n_docs  # one fate per doc, none lost
    train = {r["doc_id"] for r in
             REGISTRY["pipeline_leakage_safe_corpus"].fn(spark, sf_small).collect()}
    assert {d for d, f in ledger.items() if f == "train"} == train
    # precedence: every non-keep family member is 'dropped:near_dup'
    groups = REGISTRY["dedup_groups_canonical"].fn(spark, sf_small).collect()
    for r in groups:
        if not r["keep"]:
            assert ledger[r["doc_id"]] == "dropped:near_dup"
    # the fixture must exercise several fates
    assert len(set(ledger.values())) >= 3, set(ledger.values())

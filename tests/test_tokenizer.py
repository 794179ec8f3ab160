"""Golden test for the BPE merge loop on the classic example corpus
(low/lower/newest/widest — Sennrich et al. 2016, §3.2): hand-computed
merge sequence pins argmax order, tie-breaking, and greedy re-merge."""

from __future__ import annotations

from tripl_spark.operators.tokenizer import learn_bpe


def test_learn_bpe_classic_corpus():
    wc = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = learn_bpe(wc, n_merges=4)
    got = [(m["left"], m["right"], m["merged"], m["weight"]) for m in merges]
    # round 1: es/st tie at 9 → lexicographic ('e','s') wins
    # round 2: ('es','t') at 9 — the merged symbol participates
    # round 3: lo/ow tie at 7 → ('l','o')
    # round 4: ('lo','w') at 7
    assert got == [
        ("e", "s", "es", 9),
        ("es", "t", "est", 9),
        ("l", "o", "lo", 7),
        ("lo", "w", "low", 7),
    ]
    assert [m["rank"] for m in merges] == [1, 2, 3, 4]


def test_learn_bpe_stops_when_no_pairs():
    merges = learn_bpe([("a", 10), ("b", 3)], n_merges=5)
    assert merges == []

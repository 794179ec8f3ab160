"""Logistic-regression quality classifier: training invariants the
oracle hash can't express — loss monotonicity and planted-class
separation."""

from __future__ import annotations

from tripl_spark.operators.classifier import doc_features, logreg_fit, score_docs
from tripl_spark.queries.registry import REGISTRY, _ensure_loaded
from tripl_spark.session import load_table

_ensure_loaded()


def test_loss_is_nonincreasing(spark, sf_small):
    rows = REGISTRY["classifier_quality_train"].fn(spark, sf_small).collect()
    losses = [r.loss for r in sorted(rows, key=lambda r: r.step)]
    assert len(losses) == 20
    assert abs(losses[0] - 0.6931) < 1e-9  # ln 2 from w = 0
    for a, b in zip(losses, losses[1:]):
        assert b <= a + 1e-9, losses


def test_planted_separation(spark):
    """Docs whose label perfectly tracks a feature (stopword-heavy =
    positive) must score separably after training."""
    rows = []
    for i in range(100):
        if i % 2 == 0:  # positives: stopword-rich English
            text = "the cat and the dog of the house and a bird " * 3
            lang = "en"
        else:  # negatives: no stopwords
            text = "lorem ipsum dolor sit amet consectetur adipiscing elit " * 3
            lang = "fr"
        rows.append((i, text, lang))
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    feats = doc_features(docs)
    steps = logreg_fit(feats, n_steps=30)
    w = [steps[-1][f"w{i}"] for i in range(4)]
    scores = {r.doc_id: r.score for r in score_docs(docs, w).collect()}
    pos = [scores[i] for i in range(0, 100, 2)]
    neg = [scores[i] for i in range(1, 100, 2)]
    assert min(pos) > max(neg)  # perfect separation on the planted data


def test_scoring_is_scan_shaped(spark, sf_small):
    """Corpus scoring under trained weights must plan zero exchanges."""
    import re

    from tripl_spark.sources.bucketing import explain_str

    docs = load_table(spark, sf_small, "documents")
    plan = explain_str(score_docs(docs, [0.1, -0.2, 0.3, 0.4]))
    assert not re.findall(r"\(\d+\) Exchange\b", plan), plan

"""Count-min sketch guarantees: estimate >= truth always; overestimate
bounded by the sketch error bound on the testdata distribution."""

from __future__ import annotations

from tripl_spark.operators.sketches import CM_WIDTH
from tripl_spark.queries.registry import REGISTRY, _ensure_loaded

_ensure_loaded()


def test_countmin_never_underestimates_and_bounded(spark, sf_small):
    rows = REGISTRY["sketch_countmin_terms"].fn(spark, sf_small).collect()
    assert len(rows) == 20
    total = sum(r.true_count for r in rows)  # lower bound on stream size N
    for r in rows:
        assert r.cm_estimate >= r.true_count, r
        # CM bound: overestimate <= ~2N/w with high prob; the top-20
        # mass alone underestimates N, so allow the loose 4x factor
        assert r.cm_estimate - r.true_count <= 4 * (total * 20 / CM_WIDTH), r

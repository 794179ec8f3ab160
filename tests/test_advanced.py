"""Error-bound tests for the approximate operators and a hand-checkable
as-of join case."""

from __future__ import annotations

from tripl_spark.operators.asof import asof_join
from tripl_spark.queries.registry import all_queries


def test_approx_distinct_error_bound(spark, sf_medium):
    rows = all_queries()["approx_distinct_users"](spark, sf_medium).collect()
    for r in rows:
        rel_err = abs(r.approx_users - r.exact_users) / max(r.exact_users, 1)
        assert rel_err < 0.1, f"{r.event_type}: HLL rel err {rel_err}"


def test_approx_quantile_error_bound(spark, sf_medium):
    rows = all_queries()["approx_quantiles_value"](spark, sf_medium).collect()
    for r in rows:
        denom = max(abs(r.exact_median), 1e-9)
        assert abs(r.approx_median - r.exact_median) / denom < 0.05


def test_asof_join_hand_case(spark):
    left = spark.createDataFrame(
        [(1, "u1", 100), (2, "u1", 200), (3, "u2", 50)],
        "event_id long, user_id string, ts long",
    )
    right = spark.createDataFrame(
        [(10, "u1", 100, 1.0), (11, "u1", 150, 2.0), (12, "u2", 60, 3.0)],
        "event_id long, user_id string, ts long, value double",
    )
    out = {
        r.event_id: (r.asof_event_id, r.asof_value)
        for r in asof_join(
            left, right, ts="ts", by="user_id",
            right_cols=["event_id", "value"], tiebreak="event_id",
        ).collect()
    }
    assert out[1] == (10, 1.0)   # equal ts matches (>= semantics)
    assert out[2] == (11, 2.0)   # most recent prior
    assert out[3] == (None, None)  # no purchase at-or-before ts=50

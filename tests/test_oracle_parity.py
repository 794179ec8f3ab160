"""Every registered query with an oracle must match DuckDB exactly at
sf0.001 (fast) — the same check the driver runs at sf0.01."""

from __future__ import annotations

import pytest

from tripl_spark.queries.registry import REGISTRY, _ensure_loaded
from tests.oracle_utils import assert_frames_match, run_oracle

_ensure_loaded()
ORACLED = sorted(name for name, qd in REGISTRY.items() if qd.oracle is not None)
ROWS_ONLY = sorted(name for name, qd in REGISTRY.items() if qd.oracle is None)


@pytest.mark.parametrize("name", ORACLED)
def test_oracle_parity(spark, sf_small, name):
    qd = REGISTRY[name]
    spark_pdf = qd.fn(spark, sf_small).toPandas()
    oracle_pdf = run_oracle(qd.oracle, sf_small)
    assert_frames_match(spark_pdf, oracle_pdf, name)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, sf_small, name):
    df = REGISTRY[name].fn(spark, sf_small)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0

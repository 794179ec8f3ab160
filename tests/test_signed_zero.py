"""Signed-zero discipline.

The driver's correctness gate hashes result BYTES, so a Spark `+0.0`
against a DuckDB `-0.0` fails even though `==` says they're equal
(the r9/r10 `sim_covariance_slice` failure: DuckDB's round() emits
-0.0 from a tiny negative, Spark's emits +0.0). Two defenses live in
the repo and both are pinned here:

1. `tests.oracle_utils.assert_frames_match` must FAIL on a signed-zero
   disagreement (it compares `math.copysign` for float zeros), so
   local parity implies the driver hash again.
2. Every oracled output column whose rounded value can be a tiny
   negative is normalized with `+ 0.0` on BOTH sides (IEEE 754:
   `-0.0 + 0.0 == +0.0`), so neither engine can emit a negative zero
   in a hash-gated column. The sweep below runs every oracle on the
   real parquet and asserts no -0.0 survives anywhere.
"""

from __future__ import annotations

import math

import pandas as pd
import pytest

from tests.oracle_utils import assert_frames_match, run_oracle
from tripl_spark.queries.registry import REGISTRY, _ensure_loaded

_ensure_loaded()
ORACLED = sorted(name for name, qd in REGISTRY.items() if qd.oracle is not None)


def test_harness_fails_on_signed_zero_mismatch():
    a = pd.DataFrame({"x": [1.5, 0.0]})
    b = pd.DataFrame({"x": [1.5, -0.0]})
    with pytest.raises(AssertionError, match="signed-zero"):
        assert_frames_match(a, b, "zero-sign")


def test_harness_accepts_equal_signed_zeros():
    a = pd.DataFrame({"x": [-0.0, 2.0]})
    b = pd.DataFrame({"x": [-0.0, 2.0]})
    assert_frames_match(a, b, "same-sign")


def _has_negative_zero(df: pd.DataFrame) -> list[str]:
    hits = []
    for c in df.columns:
        col = df[c]
        if col.dtype.kind == "f" and any(
            isinstance(v, float) and v == 0.0 and math.copysign(1.0, v) < 0
            for v in col
        ):
            hits.append(c)
    return hits

def test_no_oracle_emits_negative_zero(sf_small):
    """No hash-gated oracle output may contain -0.0 (the `+ 0.0`
    normalization sweep): one DuckDB pass per oracle at the suite SF.
    A hit here means a round() site with a negative-capable argument
    is missing its normalization — add `+ 0.0` on BOTH sides."""
    from concurrent.futures import ThreadPoolExecutor

    def check(name: str) -> tuple[str, list[str]]:
        # each worker opens its own DuckDB connection (run_oracle does);
        # DuckDB releases the GIL, so the 226 independent oracle runs
        # parallelize — same sweep, same assertion, ~6x less wall
        return name, _has_negative_zero(run_oracle(REGISTRY[name].oracle, sf_small))

    with ThreadPoolExecutor(max_workers=8) as pool:
        bad = {name: hits for name, hits in pool.map(check, ORACLED) if hits}
    assert not bad, f"oracles emitting -0.0: {bad}"

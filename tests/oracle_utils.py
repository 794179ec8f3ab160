"""Local replica of the driver's DuckDB-oracle comparison.

Runs a registered Spark query and its oracle SQL side-by-side, then
compares row count, sorted column names, and exact values
order-insensitively — stricter than or equal to the driver's
value-hash, so passing here should imply passing CORRECTNESS_r{N}.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from tripl_spark.session import TABLES


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        for t in TABLES:
            con.sql(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        return con.sql(sql).df()
    finally:
        con.close()


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def assert_frames_match(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str) -> None:
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count {len(spark_pdf)} != oracle {len(oracle_pdf)}"
    )
    s_cols = sorted(map(str.lower, spark_pdf.columns))
    o_cols = sorted(map(str.lower, oracle_pdf.columns))
    assert s_cols == o_cols, f"{name}: columns {s_cols} != oracle {o_cols}"

    s = canonicalize(spark_pdf)
    o = canonicalize(oracle_pdf)
    for col in s.columns:
        sv, ov = s[col].tolist(), o[col].tolist()
        for i, (a, b) in enumerate(zip(sv, ov)):
            if isinstance(a, float) and isinstance(b, float):
                if math.isnan(a) and math.isnan(b):
                    continue
                assert a == b, f"{name}: col {col} row {i}: {a!r} != {b!r}"
                # `==` treats -0.0 == +0.0 but the driver hashes bytes,
                # so signed-zero disagreement must fail here too.
                assert math.copysign(1.0, a) == math.copysign(1.0, b), (
                    f"{name}: col {col} row {i}: signed-zero mismatch "
                    f"{a!r} (sign {math.copysign(1.0, a)}) != "
                    f"{b!r} (sign {math.copysign(1.0, b)})"
                )
            else:
                assert str(a) == str(b), f"{name}: col {col} row {i}: {a!r} != {b!r}"

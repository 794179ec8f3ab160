"""As-of (point-in-time) join — an operator Spark lacks natively
(reference lacks all joins; SURVEY.md §2.3). Implemented as a
composition of built-in ops, not a Pandas UDF:

    union the tagged sides → one window per key ordered by (ts, side)
    → last(right columns, ignorenulls) → keep left rows.

For each left row this yields the right row with the greatest
``ts <= left.ts`` in the same key group (ties at equal ts match the
right row, like DuckDB's ``ASOF JOIN ... ON l.ts >= r.ts``).

Scale: ONE shuffle on the key column — same cost as the sort-merge join
an equi-join would do; no per-group Python, no ``merge_asof`` batches,
state bounded by the window frame (running last, O(1) per row).
The alternative ``applyInPandas(pd.merge_asof)`` path costs the same
shuffle plus Arrow transfer plus per-group Python — composition wins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    ts: str,
    by: str,
    right_cols: list[str],
    tiebreak: str | None = None,
) -> DataFrame:
    """Left as-of join: attach the most recent (by ``ts``) right-side
    ``right_cols`` at-or-before each left row, per ``by`` key.

    ``tiebreak`` orders simultaneous right rows (last one wins);
    left columns all pass through with an ``asof_`` prefix on the
    attached right columns.
    """
    l_tagged = left.withColumn("__side", F.lit(1))
    for c in right_cols:
        l_tagged = l_tagged.withColumn(f"asof_{c}", F.lit(None).cast(dict(right.dtypes)[c]))
    r_tagged = right.select(
        by, ts, *[F.col(c).alias(f"asof_{c}") for c in right_cols]
    ).withColumn("__side", F.lit(0))
    for c in left.columns:
        if c not in (by, ts):
            r_tagged = r_tagged.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))

    order = [F.col(ts), F.col("__side")]
    if tiebreak is not None:
        order.append(F.col(tiebreak))
    u = l_tagged.unionByName(r_tagged)
    w = W.partitionBy(by).orderBy(*order).rowsBetween(W.unboundedPreceding, W.currentRow)
    for c in right_cols:
        u = u.withColumn(f"asof_{c}", F.last(f"asof_{c}", ignorenulls=True).over(w))
    return u.filter(F.col("__side") == 1).drop("__side")

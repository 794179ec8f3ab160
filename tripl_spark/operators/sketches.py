"""Mergeable frequency sketches, expressed as plain aggregations.

Count-min sketch: d hash rows × w cells; every occurrence of a term
increments cell ``h_i(term) mod w`` in each row, and the estimate for
a term is the MIN over its d cells — an overestimate by at most
``N/w`` per row with probability ≥ 1 - (1/2)^d (Cormode & Muthu).

Why it matters at 100 TB: the sketch is a FIXED d×w table no matter
how many distinct terms exist, and cell counts are algebraic partials
(plain sums), so the whole thing is one map-side-combined groupBy —
the same merge property the hypertable rollup exploits. You keep the
d·w integers, drop the corpus, and still answer any point frequency
query with bounded overestimate; sketches from different shards/days
merge by cell-wise addition.

The hash family is the md5-prefix affine construction every oracled
operator here uses, so DuckDB rebuilds the sketch bit-for-bit — this
is a fully value-hash-gated sketch, not a rows-only one (Spark's own
HLL/t-digest, by contrast, register rows-only because their binary
internals aren't SQL-replicable; `queries/advanced.py:111-126`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tripl_spark.queries.registry import query
from tripl_spark.session import load_table

CM_DEPTH = 4
CM_WIDTH = 256
# distinct per-row salts; md5(salt || term) gives d independent hashes
_SALTS = [f"cm{i}:" for i in range(CM_DEPTH)]


def _cell(term: F.Column, row: int) -> F.Column:
    h = F.conv(F.substring(F.md5(F.concat(F.lit(_SALTS[row]), term)), 1, 15), 16, 10)
    return F.pmod(h.cast("long"), F.lit(CM_WIDTH))


def _cell_sql(term_expr: str, row: int) -> str:
    return (
        f"CAST('0x' || substring(md5('{_SALTS[row]}' || {term_expr}), 1, 15) AS BIGINT)"
        f" % {CM_WIDTH}"
    )


def countmin_table(tokens: DataFrame, term_col: str = "term") -> DataFrame:
    """(row, cell, n) — the d×w sketch as a tiny table: one exploded
    projection + one map-side-combined groupBy over at most d·w keys."""
    rows = tokens.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"), _cell(F.col(term_col), i).alias("cell")
                    )
                    for i in range(CM_DEPTH)
                ]
            )
        ).alias("rc")
    )
    return rows.groupBy("rc.row", "rc.cell").agg(F.count(F.lit(1)).alias("n"))


def countmin_estimate(sketch: DataFrame, terms: DataFrame, term_col: str = "term") -> DataFrame:
    """(term, cm_estimate) — min over the term's d cells. The sketch is
    d·w rows and broadcasts; estimation is a map-side lookup join."""
    probes = terms.select(
        F.col(term_col),
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(i).alias("row"), _cell(F.col(term_col), i).alias("cell"))
                    for i in range(CM_DEPTH)
                ]
            )
        ).alias("rc"),
    ).select(term_col, "rc.row", "rc.cell")
    return (
        probes.join(F.broadcast(sketch), ["row", "cell"])
        .groupBy(term_col)
        .agg(F.min("n").alias("cm_estimate"))
    )


@query(
    "sketch_countmin_terms",
    oracle=rf"""
    WITH tok AS (
      SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
      FROM documents
    ),
    cells AS (
      SELECT row, cell, CAST(count(*) AS BIGINT) AS n
      FROM (
        {" UNION ALL ".join(f"SELECT {i} AS row, {_cell_sql('term', i)} AS cell FROM tok" for i in range(CM_DEPTH))}
      )
      GROUP BY row, cell
    ),
    truth AS (
      SELECT term, CAST(count(*) AS BIGINT) AS true_count
      FROM tok GROUP BY term
    ),
    top AS (
      SELECT term, true_count FROM truth
      ORDER BY true_count DESC, term LIMIT 20
    ),
    probes AS (
      SELECT term, true_count, row, cell FROM (
        {" UNION ALL ".join(f"SELECT term, true_count, {i} AS row, {_cell_sql('term', i)} AS cell FROM top" for i in range(CM_DEPTH))}
      )
    )
    SELECT p.term, any_value(p.true_count) AS true_count,
           min(c.n) AS cm_estimate
    FROM probes p JOIN cells c ON p.row = c.row AND p.cell = c.cell
    GROUP BY p.term
    """,
)
def sketch_countmin_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch of the document token stream, evaluated on the
    20 most frequent terms: (term, true_count, cm_estimate). The
    estimate is always ≥ truth (sketch guarantee, asserted in
    tests/test_sketches.py); the oracle rebuilds the identical sketch
    in SQL, so a single miscounted cell hash-mismatches."""
    docs = load_table(spark, sf_dir, "documents")
    tokens = docs.select(
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("term")
    )
    sketch = countmin_table(tokens)
    truth = tokens.groupBy("term").agg(F.count(F.lit(1)).alias("true_count"))
    top = truth.orderBy(F.desc("true_count"), "term").limit(20)
    est = countmin_estimate(sketch, top.select("term"))
    return top.join(est, "term").select("term", "true_count", "cm_estimate")

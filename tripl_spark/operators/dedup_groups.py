"""Duplicate-group resolution — the last stage of a fuzzy-dedup
pipeline: candidate pairs → transitive duplicate GROUPS → one canonical
survivor per group.

Pairwise near-dup detection (``operators/dedup.minhash_dedup``) emits
edges; near-duplication is transitive in practice (A≈B, B≈C ⇒ the
whole chain is one document family), so the keep/drop decision must be
made per connected component, not per pair — otherwise A and C both
survive. This composes the oracled MinHash pipeline with the iterative
connected-components plan (``plans/graph.connected_components``,
pointer-jumping hash-min) and a per-group window election.

Scale shape: the pair graph is *tiny* relative to the corpus (dup rate
× corpus, already verified ≥ threshold), so the iterative CC runs on
edges only — the 100 TB corpus is touched twice (shingle pass; final
canonical join), never iterated over. Election is one window over
groups (skew-safe: group size is bounded by the dup-family size).

Reference parity: the reference has no dedup at all (SURVEY.md §2.9);
this is a driver-mandated training-data extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tripl_spark.operators.dedup import _minhash_oracle_sql, minhash_dedup
from tripl_spark.queries.registry import query
from tripl_spark.session import load_table


def duplicate_groups(
    docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, group_id, group_size, keep) for EVERY document.
    ``pairs`` must have columns id_a/id_b. group_id = min doc_id in the
    component; singletons (docs in no pair) form their own group. The
    canonical survivor per group is the longest document (n_chars),
    ties broken by smallest doc_id — a deterministic total order, so
    the election is reproducible on any engine."""
    from tripl_spark.plans.graph import connected_components

    edges = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    nodes = docs.select(F.col(id_col).alias("node"))
    comp = connected_components(edges, nodes=nodes).select(
        F.col("node").alias(id_col), F.col("comp").alias("group_id")
    )
    labeled = docs.select(id_col, "n_chars").join(comp, id_col)
    w = Window.partitionBy("group_id")
    elect = Window.partitionBy("group_id").orderBy(
        F.col("n_chars").desc(), F.col(id_col)
    )
    return labeled.select(
        id_col,
        "group_id",
        F.count(F.lit(1)).over(w).alias("group_size"),
        (F.row_number().over(elect) == 1).alias("keep"),
    )


def _groups_oracle_sql() -> str:
    """Wrap the exact MinHash-pair oracle in a recursive-CTE transitive
    closure + the same election window."""
    pairs_sql = _minhash_oracle_sql()
    return f"""
    WITH RECURSIVE pairs AS ({pairs_sql}),
    sym AS (
      SELECT id_a AS s, id_b AS d FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ),
    reach AS (
      SELECT doc_id AS root, doc_id AS node FROM documents
      UNION
      SELECT r.root, sym.d AS node FROM reach r JOIN sym ON r.node = sym.s
    ),
    comp AS (SELECT root AS doc_id, min(node) AS group_id FROM reach GROUP BY root)
    SELECT d.doc_id AS doc_id, group_id,
           CAST(count(*) OVER (PARTITION BY group_id) AS BIGINT) AS group_size,
           (row_number() OVER (PARTITION BY group_id
                               ORDER BY n_chars DESC, d.doc_id) = 1) AS keep
    FROM documents d JOIN comp ON d.doc_id = comp.doc_id
    """


@query("dedup_groups_canonical", oracle=_groups_oracle_sql())
def dedup_groups_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full dedup resolution: oracled MinHash pairs (md5 variant, exact
    arithmetic parity) → connected components (iterative pointer-
    jumping, checked against DuckDB's recursive-CTE closure) → one
    canonical doc per duplicate family. `keep` is the filter a training
    pipeline applies before tokenization."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_dedup(docs, threshold=0.6, hash_mode="md5", max_bucket=None)
    return duplicate_groups(docs, pairs)

"""Quality-classifier training — distributed logistic regression over
document features, the trainable upgrade of the heuristic
``quality_score_expr`` filter (the GPT-3-style "quality classifier"
pattern: label a slice, train a linear model, score the corpus).

Scale shape per training step (the same split k-means uses): the
gradient is ONE map-side-combined aggregation — each row contributes
``x * (y - sigmoid(w.x))`` as codegen'd expression columns, so a 100 TB
corpus reduces to d partial sums per partition and the weight vector
(d doubles) round-trips through the driver between steps, which is the
textbook design: weights are the only global state and they are tiny.
Scoring a corpus under trained weights is a pure scan projection.

Determinism discipline (the ``cluster_kmeans_2iter`` pattern): features
are 4-dp-rounded, weights 6-dp-rounded after every step, so a
fixed-step run is replayable in SQL and hash-gated
(``classifier_logreg_2step``); the free-running convergence path stays
rows-only with loss-decrease and planted-separation tests
(tests/test_classifier.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import functions as F

from tripl_spark.queries.registry import query
from tripl_spark.session import load_table, local_df

LR = 1.0  # learning rate (features are bounded, so 1.0 is stable)
N_FEATURES = 4  # bias, stopword_ratio, punct_ratio, saturated length


def doc_features(docs: DataFrame, passthrough: list[str] | None = None) -> DataFrame:
    """(doc_id, y, x0..x3 [, passthrough...]): label = doc is English;
    features = bias, stopword ratio, punctuation ratio, length
    saturation — each ratio 4-dp-rounded so both engines train on
    identical inputs. ``passthrough`` carries extra columns through
    the projection so consumers don't re-scan/join the source."""
    n_tokens = F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long")
    n_stop = F.size(
        F.filter(
            F.split(F.trim(F.col("text")), r"\s+"),
            lambda x: (x == "the") | (x == "a") | (x == "of") | (x == "and"),
        )
    ).cast("long")
    n_punct = (
        F.length("text") - F.length(F.regexp_replace("text", "[.,;:!?]", ""))
    ).cast("long")
    return docs.select(
        "doc_id",
        (F.col("lang") == "en").cast("int").alias("y"),
        F.lit(1.0).alias("x0"),
        F.round(n_stop * 1.0 / n_tokens, 4).alias("x1"),
        F.round(n_punct * 1.0 / F.length("text"), 4).alias("x2"),
        F.round(F.least(F.lit(1.0), n_tokens / 100.0), 4).alias("x3"),
        *(passthrough or []),
    )


def _margin(w: list[float]) -> F.Column:
    return sum((F.col(f"x{i}") * float(w[i]) for i in range(1, N_FEATURES)),
               F.col("x0") * float(w[0]))


def logreg_step(feats: DataFrame, w: list[float], lr: float = LR) -> tuple[list[float], float]:
    """One batch-gradient step. Returns (new 6-dp-rounded weights,
    4-dp-rounded mean log-loss under the INCOMING weights). One
    aggregation: d gradient partials + the loss, all map-side
    combined."""
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-_margin(w)))
    grad_cols = [
        F.avg(F.col(f"x{i}") * (F.col("y") - p)).alias(f"g{i}")
        for i in range(N_FEATURES)
    ]
    loss_col = F.avg(
        -(F.col("y") * F.log(p) + (1 - F.col("y")) * F.log(1 - p))
    ).alias("loss")
    r = feats.agg(*grad_cols, loss_col).first()
    new_w = [round(w[i] + lr * r[f"g{i}"], 6) + 0.0 for i in range(N_FEATURES)]
    return new_w, round(float(r["loss"]), 4)


def logreg_fit(feats: DataFrame, n_steps: int) -> list[Row]:
    """Run ``n_steps`` from w = 0. Returns one Row per step:
    (step, w0..w3, loss) where loss is measured under the PRE-update
    weights (step 1's loss is exactly ln 2)."""
    w = [0.0] * N_FEATURES
    out = []
    for step in range(1, n_steps + 1):
        w, loss = logreg_step(feats, w)
        out.append(Row(step=step, **{f"w{i}": w[i] for i in range(N_FEATURES)}, loss=loss))
    return out


def _feature_sql() -> str:
    return r"""
    feats AS (
      SELECT doc_id,
             CAST(lang = 'en' AS INT) AS y,
             1.0 AS x0,
             round(len(list_filter(string_split_regex(trim(text), '\s+'),
                                   x -> x IN ('the', 'a', 'of', 'and'))) * 1.0
                   / len(string_split_regex(trim(text), '\s+')), 4) AS x1,
             round((length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')))
                   * 1.0 / length(text), 4) AS x2,
             round(least(1.0, len(string_split_regex(trim(text), '\s+')) / 100.0), 4)
               AS x3
      FROM documents
    )"""


def _train2_sql(extra_g2: str = "") -> str:
    """The g1/s2/g2 CTE chain replaying both gradient steps — shared by
    every oracle that needs the trained 2-step weights. ``extra_g2``
    appends additional aggregate columns (e.g. the loss) to g2."""
    return f"""
    g1 AS (
      SELECT round(avg(x0 * (y - 0.5)) * {LR}, 6) + 0.0 AS w0,
             round(avg(x1 * (y - 0.5)) * {LR}, 6) + 0.0 AS w1,
             round(avg(x2 * (y - 0.5)) * {LR}, 6) + 0.0 AS w2,
             round(avg(x3 * (y - 0.5)) * {LR}, 6) + 0.0 AS w3
      FROM feats
    ),
    s2 AS (
      SELECT f.*, 1.0 / (1.0 + exp(-(g1.w0*f.x0 + g1.w1*f.x1 + g1.w2*f.x2 + g1.w3*f.x3)))
               AS p
      FROM feats f CROSS JOIN g1
    ),
    g2 AS (
      SELECT round(any_value(g1.w0) + {LR} * avg(x0 * (y - p)), 6) + 0.0 AS w0,
             round(any_value(g1.w1) + {LR} * avg(x1 * (y - p)), 6) + 0.0 AS w1,
             round(any_value(g1.w2) + {LR} * avg(x2 * (y - p)), 6) + 0.0 AS w2,
             round(any_value(g1.w3) + {LR} * avg(x3 * (y - p)), 6) + 0.0 AS w3{extra_g2}
      FROM s2 CROSS JOIN g1
    )"""


_LOSS_G2 = (
    ",\n             round(avg(-(y * ln(p) + (1 - y) * ln(1 - p))), 4) AS loss"
)


@query(
    "classifier_logreg_2step",
    # Step 1 from w = 0 has sigmoid(0) = 0.5 exactly (no transcendental
    # at all); step 2's sigmoid runs on 6-dp-rounded weights and its
    # gradient is re-rounded to 6 dp, absorbing the <=1-ulp exp()
    # discrepancy between engines — the kmeans_2iter determinism
    # discipline applied to gradient descent.
    oracle=rf"""
    WITH {_feature_sql()},
    {_train2_sql(extra_g2=_LOSS_G2)}
    SELECT CAST(1 AS BIGINT) AS step, w0, w1, w2, w3,
           round(ln(2), 4) AS loss
    FROM g1
    UNION ALL
    SELECT CAST(2 AS BIGINT) AS step, w0, w1, w2, w3, loss FROM g2
    """,
    doc="two batch-gradient steps of the logistic quality classifier, "
    "hash-gated: features, gradients, weights and losses replayed in "
    "SQL (convergence path stays in classifier_quality_train)",
)
def classifier_logreg_2step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly two gradient steps of the is-English classifier from
    w = 0: per-step weight vector and pre-update mean log-loss."""
    feats = doc_features(load_table(spark, sf_dir, "documents"))
    return local_df(
        spark, logreg_fit(feats, n_steps=2),
        "step bigint, " + ", ".join(f"w{i} double" for i in range(N_FEATURES)) + ", loss double",
    )


QUALITY_TRAIN_STEPS = 20


def _train_loop_sql(n_steps: int) -> str:
    """The full n-step gradient descent unrolled as a CTE chain —
    `_train2_sql` generalized. Step k's CTEs: s{k} scores under
    g{k-1}'s 6-dp weights, g{k} re-rounds the updated weights and
    carries the pre-update loss. Because every step's weights are
    6-dp-rounded on BOTH engines (the kmeans_2iter determinism
    discipline), the chain replays bit-identically however deep.

    Every CTE is MATERIALIZED: DuckDB inlines CTEs by default, and
    g{{k}} references g{{k-1}} twice, so an inlined chain expands
    2^n-fold (and re-opens documents.parquet per expansion — fd
    exhaustion before the planner even finishes)."""
    ctes = [
        f"""g1 AS MATERIALIZED (
      SELECT round(avg(x0 * (y - 0.5)) * {LR}, 6) + 0.0 AS w0,
             round(avg(x1 * (y - 0.5)) * {LR}, 6) + 0.0 AS w1,
             round(avg(x2 * (y - 0.5)) * {LR}, 6) + 0.0 AS w2,
             round(avg(x3 * (y - 0.5)) * {LR}, 6) + 0.0 AS w3,
             round(ln(2), 4) AS loss
      FROM feats
    )"""
    ]
    for k in range(2, n_steps + 1):
        ctes.append(f"""s{k} AS MATERIALIZED (
      SELECT f.*, 1.0 / (1.0 + exp(-(g.w0*f.x0 + g.w1*f.x1 + g.w2*f.x2 + g.w3*f.x3)))
               AS p
      FROM feats f CROSS JOIN g{k - 1} g
    ),
    g{k} AS MATERIALIZED (
      SELECT round(any_value(g.w0) + {LR} * avg(x0 * (y - p)), 6) + 0.0 AS w0,
             round(any_value(g.w1) + {LR} * avg(x1 * (y - p)), 6) + 0.0 AS w1,
             round(any_value(g.w2) + {LR} * avg(x2 * (y - p)), 6) + 0.0 AS w2,
             round(any_value(g.w3) + {LR} * avg(x3 * (y - p)), 6) + 0.0 AS w3,
             round(avg(-(y * ln(p) + (1 - y) * ln(1 - p))), 4) AS loss
      FROM s{k} CROSS JOIN g{k - 1} g
    )""")
    selects = "\n    UNION ALL\n    ".join(
        f"SELECT CAST({k} AS BIGINT) AS step, w0, w1, w2, w3, loss FROM g{k}"
        for k in range(1, n_steps + 1)
    )
    feats = _feature_sql().replace("feats AS (", "feats AS MATERIALIZED (", 1)
    return f"WITH {feats},\n    " + ",\n    ".join(ctes) + f"\n    {selects}"


@query(
    "classifier_quality_train",
    oracle=_train_loop_sql(QUALITY_TRAIN_STEPS),
    doc="free-running logistic-regression training, hash-gated in r12: "
    "the full 20-step loss curve and per-step weights replayed by an "
    "unrolled SQL CTE chain (the classifier_logreg_2step gate "
    "generalized); loss-decrease + planted-separation invariants stay "
    "in tests/test_classifier.py",
)
def classifier_quality_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """20 gradient steps; emits the per-step loss curve, which must be
    non-increasing (asserted in tests)."""
    feats = doc_features(load_table(spark, sf_dir, "documents"))
    return local_df(
        spark, logreg_fit(feats, n_steps=QUALITY_TRAIN_STEPS),
        "step bigint, " + ", ".join(f"w{i} double" for i in range(N_FEATURES)) + ", loss double",
    )


def score_docs(docs: DataFrame, w: list[float]) -> DataFrame:
    """(doc_id, score) — corpus scoring under trained weights: a pure
    scan projection, zero shuffles, the filter you'd apply to 100 TB."""
    feats = doc_features(docs)
    return feats.select(
        "doc_id", F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-_margin(w))), 4).alias("score")
    )


# ---------------------------------------------------------------------------
# Linear probe over embeddings: the standard representation-quality eval
# ---------------------------------------------------------------------------

PROBE_DIM = 64
PROBE_LR = 1.0


def _probe_margin(w0: float, w: list[float]) -> F.Column:
    # the PROBE_DIM weight vector renders as ONE SQL parse (bit-exact
    # double rendering) instead of 64 F.lit round trips per gradient
    # step — the k-means-codebook fix applied to the probe's weights
    from pyspark.sql import types as T

    from tripl_spark.session import _sql_lit

    wv = F.expr(_sql_lit([float(x) for x in w], T.ArrayType(T.DoubleType())))
    return F.lit(float(w0)) + F.aggregate(
        F.zip_with(F.col("v"), wv, lambda a, b: a * b), F.lit(0.0), lambda s, z: s + z
    )


def probe_step(
    feats: DataFrame, w0: float, w: list[float], lr: float = PROBE_LR
) -> tuple[float, list[float], float]:
    """One batch-gradient step of the embedding probe. Gradient = ONE
    aggregation with PROBE_DIM + 2 avg columns (same shape as the
    k-means centroid update); weights 6-dp-rounded, loss 4-dp."""
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-_probe_margin(w0, w)))
    r = feats.agg(
        F.avg(F.col("y") - p).alias("g0"),
        *[F.avg(F.col("v")[i] * (F.col("y") - p)).alias(f"g{i + 1}") for i in range(PROBE_DIM)],
        F.avg(-(F.col("y") * F.log(p) + (1 - F.col("y")) * F.log(1 - p))).alias("loss"),
    ).first()
    new_w0 = round(w0 + lr * r["g0"], 6) + 0.0
    new_w = [round(w[i] + lr * r[f"g{i + 1}"], 6) + 0.0 for i in range(PROBE_DIM)]
    return new_w0, new_w, round(float(r["loss"]), 4)


@query(
    "classifier_linear_probe_2step",
    # Per-dim gradients replay as a dims CROSS JOIN + GROUP BY (the
    # kmeans c1 pattern); sigmoid only appears in step 2, on
    # 6-dp-rounded weights. Output is one row per (step, dim) with
    # dim 0 = bias, so the value hash never compares array renderings.
    oracle=f"""
    WITH feats AS (
      SELECT vec_id, CAST(label = 0 AS INT) AS y, embedding::DOUBLE[] AS v
      FROM embeddings
    ),
    dims AS (SELECT unnest(range(1, {PROBE_DIM} + 1)) AS i),
    g1d AS (
      SELECT d.i, round(avg(f.v[d.i] * (f.y - 0.5)) * {PROBE_LR}, 6) + 0.0 AS w
      FROM feats f CROSS JOIN dims d GROUP BY d.i
    ),
    g1b AS (SELECT round(avg(y - 0.5) * {PROBE_LR}, 6) + 0.0 AS w0 FROM feats),
    w1 AS (SELECT (SELECT w0 FROM g1b) AS w0, list(w ORDER BY i) AS wv FROM g1d),
    s2 AS (
      SELECT f.*, 1.0 / (1.0 + exp(-(w1.w0 + list_sum(
               [ w1.wv[i] * f.v[i] for i in range(1, {PROBE_DIM} + 1) ])))) AS p
      FROM feats f CROSS JOIN w1
    ),
    loss2 AS (
      SELECT round(avg(-(y * ln(p) + (1 - y) * ln(1 - p))), 4) AS loss FROM s2
    ),
    g2d AS (
      SELECT d.i,
             round(any_value(w1.wv[d.i]) + {PROBE_LR} * avg(s2.v[d.i] * (s2.y - s2.p)), 6)
               + 0.0 AS w
      FROM s2 CROSS JOIN dims d CROSS JOIN w1 GROUP BY d.i
    ),
    g2b AS (
      SELECT round(any_value(w1.w0) + {PROBE_LR} * avg(y - p), 6) + 0.0 AS w0
      FROM s2 CROSS JOIN w1
    )
    SELECT CAST(1 AS BIGINT) AS step, CAST(0 AS BIGINT) AS dim, w0 AS w,
           round(ln(2), 4) AS loss FROM g1b
    UNION ALL
    SELECT 1, CAST(i AS BIGINT), w, round(ln(2), 4) FROM g1d
    UNION ALL
    SELECT 2, 0, w0, (SELECT loss FROM loss2) FROM g2b
    UNION ALL
    SELECT 2, CAST(i AS BIGINT), w, (SELECT loss FROM loss2) FROM g2d
    """,
    doc="two gradient steps of a linear probe (label=0 vs rest) over "
    "the raw embeddings — the standard representation-quality eval, "
    "hash-gated per (step, dim) weight",
)
def classifier_linear_probe_2step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear probe on the embeddings table: logistic regression from
    w = 0 predicting label = 0, exactly two batch-gradient steps.
    Emits one row per (step, dim): dim 0 is the bias, dims 1..64 the
    per-dimension weights, with the pre-update mean log-loss repeated
    per row (step 1's is exactly ln 2)."""
    emb = load_table(spark, sf_dir, "embeddings")
    feats = emb.select(
        (F.col("label") == 0).cast("int").alias("y"),
        F.col("embedding").cast("array<double>").alias("v"),
    )
    w0, w = 0.0, [0.0] * PROBE_DIM
    out = []
    for step in (1, 2):
        nw0, nw, loss = probe_step(feats, w0, w)
        out.append(Row(step=step, dim=0, w=nw0, loss=loss))
        out.extend(
            Row(step=step, dim=i + 1, w=nw[i], loss=loss) for i in range(PROBE_DIM)
        )
        w0, w = nw0, nw
    return local_df(spark, out, "step bigint, dim bigint, w double, loss double")


@query(
    "classifier_auc_eval",
    # Exact tie-averaged AUC from rank algebra: avg rank of a score
    # class = rank() + (ties - 1)/2; AUC = (sum of positives' average
    # ranks - P(P+1)/2) / (P*N) — the one-pass rank-sum (Mann-Whitney)
    # form, no pairwise comparisons. Scores come from the hash-gated
    # 2-step weights (g1/g2 replayed as in classifier_logreg_2step).
    oracle=rf"""
    WITH {_feature_sql()},
    {_train2_sql()},
    scored AS (
      SELECT f.doc_id, f.y,
             round(1.0 / (1.0 + exp(-(g2.w0*f.x0 + g2.w1*f.x1 + g2.w2*f.x2 + g2.w3*f.x3))), 6)
               AS s
      FROM feats f CROSS JOIN g2
    ),
    ranked AS (
      SELECT y, s,
             rank() OVER (ORDER BY s) AS mn,
             count(*) OVER (PARTITION BY s) AS ties
      FROM scored
    )
    SELECT CAST(sum(y) AS BIGINT) AS n_pos,
           CAST(count(*) - sum(y) AS BIGINT) AS n_neg,
           round((sum(CASE WHEN y = 1 THEN mn + (ties - 1) / 2.0 ELSE 0 END)
                  - sum(y) * (sum(y) + 1) / 2.0)
                 / (sum(y) * (count(*) - sum(y))), 4) AS auc,
           round(avg(CASE WHEN (s >= 0.5) = (y = 1) THEN 1.0 ELSE 0.0 END), 4)
             AS accuracy
    FROM ranked
    """,
    doc="exact tie-averaged AUC + accuracy of the 2-step classifier "
    "via the Mann-Whitney rank sum — distributed eval without "
    "pairwise comparisons, hash-gated end-to-end incl. training",
)
def classifier_auc_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Evaluate the 2-step is-English classifier on its training
    corpus: exact AUC by the rank-sum identity (avg rank of each
    positive vs P(P+1)/2 baseline — tie-averaged, so equal scores
    contribute 0.5) and accuracy at the 0.5 threshold.

    Scale shape: scoring is a scan projection, and the ranks come from
    PER-SCORE aggregates, not a row-level sort — scores are
    6-dp-rounded so there are ≤10⁶ distinct keys whatever the corpus
    size. The corpus shuffles once into the map-side-combined
    (score → count, positives) table; the only global window runs over
    those summary rows (the tie-averaged rank of every row with score
    s is rows_below(s) + (count(s)+1)/2, so the rank-sum identity
    needs nothing row-level). No pairwise pos×neg join ever happens.
    The oracle replays the row-level rank definition — same identity,
    same values — so the summary-level rewrite stays hash-gated."""
    feats = doc_features(load_table(spark, sf_dir, "documents"))
    w = logreg_fit(feats, n_steps=2)[-1]
    wvec = [w[f"w{i}"] for i in range(N_FEATURES)]
    scored = feats.select(
        "doc_id", "y",
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-_margin(wvec))), 6).alias("s"),
    )
    from pyspark.sql import Window

    by_s = scored.groupBy("s").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("y").alias("pos")
    )
    w_below = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    lvl = by_s.select(
        "s", "cnt", "pos",
        F.coalesce(F.sum("cnt").over(w_below), F.lit(0)).alias("below"),
    )
    n = F.sum("cnt")
    n_pos = F.sum("pos")
    # tie-averaged rank of every row at score s: below + (cnt+1)/2
    pos_ranksum = F.sum(F.col("pos") * (F.col("below") + (F.col("cnt") + 1) / 2.0))
    correct = F.sum(
        F.when(F.col("s") >= 0.5, F.col("pos")).otherwise(F.col("cnt") - F.col("pos"))
    )
    return lvl.agg(
        n_pos.cast("long").alias("n_pos"),
        (n - n_pos).cast("long").alias("n_neg"),
        F.round(
            (pos_ranksum - n_pos * (n_pos + 1) / 2.0) / (n_pos * (n - n_pos)), 4
        ).alias("auc"),
        F.round(correct * 1.0 / n, 4).alias("accuracy"),
    )


CLS_QUOTA_PER_SOURCE = 10


@query(
    "pipeline_classifier_curation",
    # Train (g1/g2, hash-gated as in classifier_logreg_2step) → score →
    # per-source quota as one replayable chain: the trained-filter
    # upgrade of pipeline_curation_end2end's heuristic quality cut.
    # Selection is the quota (relative), not an absolute threshold —
    # 2-step scores cluster in a narrow band whose location shifts
    # with the corpus, so a fixed cut would keep everything or
    # nothing.
    oracle=rf"""
    WITH {_feature_sql()},
    {_train2_sql()},
    scored AS (
      SELECT d.doc_id, d.source, d.lang,
             round(1.0 / (1.0 + exp(-(g2.w0*f.x0 + g2.w1*f.x1 + g2.w2*f.x2 + g2.w3*f.x3))), 6)
               AS score
      FROM documents d
      JOIN feats f USING (doc_id)
      CROSS JOIN g2
    )
    SELECT doc_id, source, lang, score, CAST(rk AS INT) AS rk
    FROM (
      SELECT *, row_number() OVER (
               PARTITION BY source ORDER BY score DESC, doc_id) AS rk
      FROM scored
    ) WHERE rk <= {CLS_QUOTA_PER_SOURCE}
    """,
    doc="curation under the TRAINED quality filter: 2-step training → "
    "corpus scoring → per-source quota by trained score, hash-gated "
    "as one chain — the trained-filter upgrade of "
    "pipeline_curation_end2end",
)
def pipeline_classifier_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-driven curation: train the 2-step classifier, score every
    document (scan projection under the broadcast 4-double weight
    vector), keep the top CLS_QUOTA_PER_SOURCE per source by trained
    score. Pins the train→apply contract per-stage oracles can't see:
    the quota ranks documents by the SAME trained score the filter
    used, and training-set membership never leaks extra columns into
    the output."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    feats = doc_features(docs, passthrough=["source", "lang"])
    w = logreg_fit(feats.drop("source", "lang"), n_steps=2)[-1]
    wvec = [w[f"w{i}"] for i in range(N_FEATURES)]
    # one scan, no self-join: source/lang ride the feature projection
    scored = feats.select(
        "doc_id", "source", "lang",
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-_margin(wvec))), 6).alias("score"),
    )
    win = Window.partitionBy("source").orderBy(F.desc("score"), "doc_id")
    return (
        scored.withColumn("rk", F.row_number().over(win))
        .filter(F.col("rk") <= CLS_QUOTA_PER_SOURCE)
        .select("doc_id", "source", "lang", "score", "rk")
    )


N_CALIB_BINS = 10


@query(
    "classifier_calibration_bins",
    # Reliability diagram of the 2-step classifier with EQUAL-FREQUENCY
    # bins: fixed-width deciles degenerate when scores concentrate (two
    # gradient steps put everything near 0.55), so bin = the integer
    # rank-range below*B DIV n of each distinct 6-dp score — pure
    # integer arithmetic over per-score summaries, the same
    # summary-level pattern as the AUC rank sum (no row-level global
    # window, no float percentile interpolation to diverge; a tied
    # score group lands wholly in one bin by construction).
    oracle=rf"""
    WITH {_feature_sql()},
    {_train2_sql()},
    scored AS (
      SELECT f.doc_id, f.y,
             round(1.0 / (1.0 + exp(-(g2.w0*f.x0 + g2.w1*f.x1 + g2.w2*f.x2 + g2.w3*f.x3))), 6)
               AS s
      FROM feats f CROSS JOIN g2
    ),
    by_s AS (SELECT s, count(*) AS cnt, sum(y) AS pos FROM scored GROUP BY s),
    tot AS (SELECT sum(cnt) AS n FROM by_s),
    lvl AS (
      SELECT s, cnt, pos,
             coalesce(sum(cnt) OVER (ORDER BY s
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below
      FROM by_s
    ),
    binned AS (
      SELECT least(below * {N_CALIB_BINS} // n, {N_CALIB_BINS - 1}) AS bin,
             s, cnt, pos
      FROM lvl CROSS JOIN tot
    )
    SELECT CAST(bin AS INT) AS bin,
           CAST(sum(cnt) AS BIGINT) AS n,
           CAST(sum(pos) AS BIGINT) AS n_pos,
           round(sum(s * cnt) / sum(cnt), 4) AS mean_pred,
           round(sum(pos) * 1.0 / sum(cnt), 4) AS frac_pos
    FROM binned GROUP BY bin
    """,
    doc="calibration (reliability diagram) of the 2-step classifier: "
    "equal-frequency score bins with mean predicted vs observed "
    "positive rate — fully hash-gated incl. training",
)
def classifier_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration bins for the trained quality classifier:
    equal-frequency buckets over the predicted probability, each with
    its count, mean prediction, and observed positive fraction — the
    reliability diagram that tells you whether a 0.8 score means 80%.
    The eval companion to ``classifier_auc_eval`` (discrimination) —
    a filter threshold is only meaningful if scores are calibrated.

    Scale shape: scoring is the zero-shuffle scan projection under the
    broadcast weight vector; like the AUC, binning runs over PER-SCORE
    summaries (≤10⁶ distinct 6-dp keys however large the corpus) — the
    corpus shuffles once into the map-side-combined score table, the
    only window walks those summary rows, and the final aggregate has
    ≤N_CALIB_BINS groups."""
    from pyspark.sql import Window

    feats = doc_features(load_table(spark, sf_dir, "documents"))
    w = logreg_fit(feats, n_steps=2)[-1]
    wvec = [w[f"w{i}"] for i in range(N_FEATURES)]
    scored = feats.select(
        "y", F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-_margin(wvec))), 6).alias("s")
    )
    by_s = scored.groupBy("s").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("y").alias("pos")
    )
    tot = by_s.agg(F.sum("cnt").alias("n"))
    w_below = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    lvl = by_s.select(
        "s", "cnt", "pos",
        F.coalesce(F.sum("cnt").over(w_below), F.lit(0)).alias("below"),
    )
    binned = lvl.crossJoin(F.broadcast(tot)).withColumn(
        "bin",
        F.expr(f"least(below * {N_CALIB_BINS} DIV n, {N_CALIB_BINS - 1})").cast("int"),
    )
    return binned.groupBy("bin").agg(
        F.sum("cnt").cast("long").alias("n"),
        F.sum("pos").cast("long").alias("n_pos"),
        F.round(F.sum(F.col("s") * F.col("cnt")) / F.sum("cnt"), 4).alias("mean_pred"),
        F.round(F.sum("pos") * 1.0 / F.sum("cnt"), 4).alias("frac_pos"),
    )

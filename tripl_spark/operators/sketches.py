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
from tripl_spark.session import eager_checkpoint, load_table

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


# ---------------------------------------------------------------------------
# Bloom filter (membership sketch)
# ---------------------------------------------------------------------------

BLOOM_K = 4
BLOOM_M = 4096
_BLOOM_SALTS = [f"bf{i}:" for i in range(BLOOM_K)]


def _bloom_pos(term: F.Column, i: int) -> F.Column:
    h = F.conv(F.substring(F.md5(F.concat(F.lit(_BLOOM_SALTS[i]), term)), 1, 15), 16, 10)
    return F.pmod(h.cast("long"), F.lit(BLOOM_M))


def _bloom_pos_sql(term_expr: str, i: int) -> str:
    return (
        f"CAST('0x' || substring(md5('{_BLOOM_SALTS[i]}' || {term_expr}), 1, 15) AS BIGINT)"
        f" % {BLOOM_M}"
    )


def bloom_bits(terms: DataFrame, term_col: str = "term") -> DataFrame:
    """(pos) — the set bit positions of a k-hash Bloom filter over the
    term set. At most BLOOM_M rows however large the corpus: one
    exploded projection + one distinct, and filters from different
    shards merge by union (bit-OR is set-union on positions)."""
    return (
        terms.select(
            F.explode(
                F.array(*[_bloom_pos(F.col(term_col), i) for i in range(BLOOM_K)])
            ).alias("pos")
        )
        .distinct()
    )


def bloom_probe(bits: DataFrame, probes: DataFrame, term_col: str = "term") -> DataFrame:
    """(term, in_bloom) — a probe is (maybe) present iff ALL of its k
    positions are set. The bits table is ≤ BLOOM_M rows and broadcasts;
    probing is a map-side join, the corpus is never touched."""
    pp = probes.select(
        term_col,
        F.explode(
            F.array(*[_bloom_pos(F.col(term_col), i) for i in range(BLOOM_K)])
        ).alias("pos"),
    )
    return (
        pp.join(F.broadcast(bits), "pos", "left_semi")
        .groupBy(term_col)
        .agg(F.count(F.lit(1)).alias("_hits"))
        .join(probes, term_col, "right")
        .select(term_col, (F.coalesce(F.col("_hits"), F.lit(0)) == BLOOM_K).alias("in_bloom"))
    )


@query(
    "sketch_bloom_membership",
    oracle=rf"""
    WITH tok AS (
      SELECT DISTINCT unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
      FROM documents
    ),
    bits AS (
      SELECT DISTINCT pos FROM (
        {" UNION ALL ".join(f"SELECT {_bloom_pos_sql('term', i)} AS pos FROM tok" for i in range(BLOOM_K))}
      )
    ),
    freq AS (
      SELECT term, count(*) AS n
      FROM (SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
            FROM documents)
      GROUP BY term
    ),
    probes AS (
      SELECT term FROM (SELECT term FROM freq ORDER BY n DESC, term LIMIT 10)
      UNION ALL
      SELECT 'zz_absent_probe_' || CAST(i AS VARCHAR) AS term
      FROM (SELECT unnest(range(10)) AS i)
    ),
    pp AS (
      SELECT term, pos FROM (
        {" UNION ALL ".join(f"SELECT term, {_bloom_pos_sql('term', i)} AS pos FROM probes" for i in range(BLOOM_K))}
      )
    )
    SELECT p.term,
           (p.term IN (SELECT term FROM tok)) AS present,
           (count(b.pos) = {BLOOM_K}) AS in_bloom
    FROM pp p LEFT JOIN bits b ON p.pos = b.pos
    GROUP BY p.term
    """,
)
def sketch_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter membership over the corpus vocabulary, probed with
    the 10 most frequent terms (present) and 10 synthetic absent terms:
    (term, present, in_bloom). The filter guarantee — present implies
    in_bloom, no false negatives — is asserted in tests/test_sketches.py;
    the oracle rebuilds the identical k-hash filter in SQL, so one
    mis-set bit hash-mismatches."""
    docs = load_table(spark, sf_dir, "documents")
    # ONE corpus token pass: the vocabulary-sized count table is
    # checkpointed and feeds the filter bits, the present semi-join
    # AND the top-10 probes (three consumers that would otherwise each
    # re-run the scan + explode)
    counts = (
        docs.select(
            F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("term")
        )
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
        .transform(eager_checkpoint)
    )
    vocab = counts.select("term")
    bits = bloom_bits(vocab)
    top = counts.orderBy(F.desc("n"), "term").limit(10).select("term")
    absent = spark.range(10).select(
        F.concat(F.lit("zz_absent_probe_"), F.col("id").cast("string")).alias("term")
    )
    probes = top.unionByName(absent)
    present = probes.join(vocab, "term", "left_semi").withColumn("present", F.lit(True))
    flags = probes.join(present.select("term", "present"), "term", "left").select(
        "term", F.coalesce(F.col("present"), F.lit(False)).alias("present")
    )
    return flags.join(bloom_probe(bits, probes), "term").select(
        "term", "present", "in_bloom"
    )


# ---------------------------------------------------------------------------
# Mergeable quantile summary (GK/KLL stand-in, SQL-replicable)
# ---------------------------------------------------------------------------

Q_SHARDS = 16
Q_SAMPLES = 32  # kept samples per shard
Q_PROBS = [0.5, 0.9, 0.99]


def quantile_summary(vals: DataFrame, val_col: str, id_col: str) -> DataFrame:
    """(shard, value, id, rn, weight) — per-shard equi-rank samples:
    each shard keeps every ceil(n_s/K)-th value in (value, id) order
    plus its maximum, each sample weighted by the ranks it covers.

    This is the mergeable-summary pattern percentiles use at 100 TB
    (GK/KLL in spirit): per-shard summaries are ≤ K+1 rows regardless
    of shard size, weights are exact integer rank spans (rank error
    ≤ n_s/K per shard, ≤ N/K after merging), and summaries from
    different shards/days merge by plain union — no re-scan of the
    data. Unlike percentile_approx's opaque internal state, every
    number here is integer rank arithmetic, so the merged estimate is
    SQL-replicable and driver-hash-gated."""
    from pyspark.sql import Window

    w_ord = Window.partitionBy("shard").orderBy("value", "id")
    ranked = vals.select(
        F.pmod(F.col(id_col), F.lit(Q_SHARDS)).alias("shard"),
        F.col(val_col).alias("value"),
        F.col(id_col).alias("id"),
    ).select(
        "*",
        F.row_number().over(w_ord).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("shard")).alias("ns"),
    )
    step = F.greatest(F.lit(1), F.ceil(F.col("ns") / float(Q_SAMPLES)))
    kept = ranked.filter((F.col("rn") % step == 0) | (F.col("rn") == F.col("ns")))
    w_kept = Window.partitionBy("shard").orderBy("rn")
    return kept.select(
        "shard", "value", "id", "rn",
        (F.col("rn") - F.coalesce(F.lag("rn").over(w_kept), F.lit(0))).alias("weight"),
    )


@query(
    "sketch_quantile_merge",
    oracle=f"""
    WITH ranked AS (
      SELECT event_id % {Q_SHARDS} AS shard, value, event_id AS id,
             row_number() OVER (PARTITION BY event_id % {Q_SHARDS}
                                ORDER BY value, event_id) AS rn,
             count(*) OVER (PARTITION BY event_id % {Q_SHARDS}) AS ns
      FROM events
    ),
    kept AS (
      SELECT * FROM ranked
      WHERE rn % greatest(1, CAST(ceil(ns / {float(Q_SAMPLES)}) AS BIGINT)) = 0
         OR rn = ns
    ),
    samples AS (
      SELECT shard, value, id, rn,
             rn - coalesce(lag(rn) OVER (PARTITION BY shard ORDER BY rn), 0) AS weight
      FROM kept
    ),
    merged AS (
      SELECT value, id,
             sum(weight) OVER (ORDER BY value, id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw,
             sum(weight) OVER () AS total
      FROM samples
    )
    SELECT q, value AS estimate FROM (
      SELECT CAST(p.q AS DOUBLE) AS q, m.value,
             row_number() OVER (PARTITION BY p.q ORDER BY m.cumw, m.value, m.id) AS pick
      FROM (VALUES {", ".join(f"(CAST({p} AS DOUBLE))" for p in Q_PROBS)}) AS p(q)
      JOIN merged m ON m.cumw >= CAST(ceil(p.q * m.total) AS BIGINT)
    ) WHERE pick = 1
    """,
)
def sketch_quantile_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(q, estimate) for p50/p90/p99 of events.value via merged
    per-shard equi-rank summaries — the distributed-percentile pattern
    with exact integer rank arithmetic on both engines (rank error
    bound asserted in tests/test_sketches.py). The merge runs over
    ≤ (K+1)·shards sample rows, never the raw data."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "value")
    return quantile_estimates(ev, "value", "event_id", Q_PROBS)


def quantile_estimates(
    vals: DataFrame, val_col: str, id_col: str, probs: list[float]
) -> DataFrame:
    """(q, estimate) — merge the per-shard summaries and pick, for each
    probe quantile, the first sample whose cumulative weight reaches
    ceil(q·N). The merge window and the probe join touch only the
    ≤ (K+1)·shards sample rows."""
    from pyspark.sql import Window

    samples = quantile_summary(vals, val_col, id_col)
    w_glob = Window.orderBy("value", "id").rowsBetween(Window.unboundedPreceding, 0)
    merged = samples.select(
        "value", "id",
        F.sum("weight").over(w_glob).alias("cumw"),
        F.sum("weight").over(Window.partitionBy()).alias("total"),
    )
    from tripl_spark.session import local_df

    probes = local_df(vals.sparkSession, [(p,) for p in probs], "q double")
    w_pick = Window.partitionBy("q").orderBy("cumw", "value", "id")
    return (
        F.broadcast(probes)
        .join(merged, F.col("cumw") >= F.ceil(F.col("q") * F.col("total")).cast("long"))
        .withColumn("pick", F.row_number().over(w_pick))
        .filter(F.col("pick") == 1)
        .select("q", F.col("value").alias("estimate"))
    )


# ---------------------------------------------------------------------------
# HyperLogLog registers (distinct-count sketch, SQL-replicable variant)
# ---------------------------------------------------------------------------

HLL_M = 64  # registers (p=6); the shiftright(6) below encodes log2(HLL_M)
_HLL_VAL_BITS = 54  # 60-bit md5-prefix hash minus 6 register bits
assert HLL_M == 1 << 6 and _HLL_VAL_BITS == 60 - 6
_POW2 = [1 << i for i in range(_HLL_VAL_BITS)]


def hll_register_rho(df: DataFrame, source: F.Column, extra: list[str]) -> DataFrame:
    """(*extra, register, r) — the shared HLL hash split: md5 the
    'hll:'-domain of ``source`` to 60 bits, low 6 bits pick a
    register, and r (rho) = leading zeros of the remaining 54-bit
    value + 1, computed with an integer-exact power-of-two count (no
    float log; ``shiftright`` not double division, which would lose
    low bits above 2^53 and skew rho). Every HLL builder — corpus
    vocabulary, per-day sliding, per-segment overlap — goes through
    this one definition, and each oracle replicates it verbatim."""
    hv = F.conv(
        F.substring(F.md5(F.concat(F.lit("hll:"), source)), 1, 15), 16, 10
    ).cast("long")
    parts = df.select(
        *extra,
        F.pmod(hv, F.lit(HLL_M)).alias("register"),
        F.shiftright(hv, 6).cast("long").alias("w"),
    )
    powers = F.array(*[F.lit(p) for p in _POW2])
    bitlen = F.size(F.filter(powers, lambda p: p <= F.col("w")))
    rho = F.when(F.col("w") == 0, F.lit(_HLL_VAL_BITS + 1)).otherwise(
        F.lit(_HLL_VAL_BITS + 1) - bitlen
    )
    return parts.select(*extra, "register", rho.cast("int").alias("r"))


def hll_registers(items: DataFrame, col: str = "term") -> DataFrame:
    """(register, max_rho) — deterministic HLL over the DISTINCT items.
    The sketch is ≤ HLL_M rows whatever the cardinality; shard
    sketches merge by per-register MAX — the same algebraic-merge
    property as count-min. Spark's own approx_count_distinct keeps its
    HLL state in opaque binary (rows-only checkable); this variant
    trades its bias corrections for SQL-replicable arithmetic, so the
    driver hash-gates every register."""
    distinct = items.select(F.col(col)).distinct()
    return (
        hll_register_rho(distinct, F.col(col), [])
        .groupBy("register")
        .agg(F.max("r").alias("max_rho"))
    )


def hll_estimate(registers: list[tuple[int, int]]) -> float:
    """HLL estimate from (register, max_rho) rows (driver-side: the
    sketch is ≤ HLL_M numbers). alpha_64 · m² / Σ 2^-M_j with unseen
    registers contributing 2^0, plus the standard small-range
    linear-counting correction (for n ≲ 2.5·m the raw estimator
    overshoots badly; LC on the empty-register count is exact-ish
    there — Flajolet et al. 2007, §4)."""
    import math

    rho = {r: mr for r, mr in registers}
    denom = sum(2.0 ** -rho.get(j, 0) for j in range(HLL_M))
    alpha = 0.709  # alpha_m for m=64
    est = alpha * HLL_M * HLL_M / denom
    zeros = HLL_M - len(rho)
    if est <= 2.5 * HLL_M and zeros > 0:
        return HLL_M * math.log(HLL_M / zeros)
    return est


@query(
    "sketch_hll_registers",
    oracle=rf"""
    WITH tok AS (
      SELECT DISTINCT unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
      FROM documents
    ),
    h AS (
      SELECT CAST('0x' || substring(md5('hll:' || term), 1, 15) AS BIGINT) AS hv
      FROM tok
    ),
    parts AS (SELECT hv % {HLL_M} AS register, hv // {HLL_M} AS w FROM h)
    SELECT register,
           CAST(max(CASE WHEN w = 0 THEN {_HLL_VAL_BITS + 1}
                         ELSE {_HLL_VAL_BITS + 1}
                              - len(list_filter({_POW2}, p -> p <= w))
                    END) AS INT) AS max_rho
    FROM parts GROUP BY register
    """,
)
def sketch_hll_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL register table over the corpus vocabulary: (register,
    max_rho), hash-gated cell by cell against the SQL rebuild. The
    derived cardinality estimate (and its error bound vs true distinct)
    is asserted in tests/test_sketches.py."""
    docs = load_table(spark, sf_dir, "documents")
    tokens = docs.select(
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("term")
    )
    return hll_registers(tokens)


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


# ---------------------------------------------------------------------------
# Heavy hitters: per-shard truncated summaries, algebraic merge
# ---------------------------------------------------------------------------

HH_SHARDS = 8
HH_LOCAL_K = 200  # summary size kept per shard (the SpaceSaving "k")
HH_TOP = 25  # heavy hitters reported


def _shard_of(doc_id: F.Column) -> F.Column:
    h = F.conv(F.substring(F.md5(doc_id.cast("string")), 1, 15), 16, 10)
    return F.pmod(h.cast("long"), F.lit(HH_SHARDS))


def heavy_hitter_summaries(
    tokens: DataFrame, shard_col: str = "shard", term_col: str = "term"
) -> DataFrame:
    """(shard, term, c) — each shard's exact term counts truncated to
    its HH_LOCAL_K most frequent terms (count desc, term tie-break).

    This is the mergeable-summary shape of Misra-Gries / SpaceSaving:
    a BOUNDED table per shard regardless of vocabulary size. The
    truncation here keeps top-k by count (deterministic, so the DuckDB
    oracle replays it exactly) rather than MG's decrement rule; the
    guarantee is the standard local-top-k one — any term whose global
    frequency exceeds the sum of the shards' k-th-place counts
    appears in at least one summary (tests/test_sketches.py pins the
    lower-bound property and exactness on in-all-summaries terms)."""
    from pyspark.sql import Window

    counts = tokens.groupBy(shard_col, term_col).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    w = Window.partitionBy(shard_col).orderBy(F.desc("c"), term_col)
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= HH_LOCAL_K)
        .drop("rk")
    )


def heavy_hitter_merge(summaries: DataFrame, term_col: str = "term") -> DataFrame:
    """(term, hh_estimate, n_shards) — cell-wise merge of per-shard
    summaries: sum the surviving counts. The estimate is a LOWER bound
    of the true frequency (a shard where the term fell below its local
    top-k contributes 0); n_shards says how many summaries carried it,
    so n_shards = HH_SHARDS ⇒ the estimate is exact."""
    return summaries.groupBy(term_col).agg(
        F.sum("c").cast("long").alias("hh_estimate"),
        F.count(F.lit(1)).cast("long").alias("n_shards"),
    )


@query(
    "sketch_heavy_hitters",
    oracle=rf"""
    WITH tok AS (
      SELECT CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
               % {HH_SHARDS} AS shard,
             unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
      FROM documents
    ),
    local AS (
      SELECT shard, term, CAST(count(*) AS BIGINT) AS c
      FROM tok GROUP BY shard, term
    ),
    summaries AS (
      SELECT shard, term, c FROM (
        SELECT *, row_number() OVER (PARTITION BY shard ORDER BY c DESC, term) AS rk
        FROM local
      ) WHERE rk <= {HH_LOCAL_K}
    ),
    merged AS (
      SELECT term, CAST(sum(c) AS BIGINT) AS hh_estimate,
             CAST(count(*) AS BIGINT) AS n_shards
      FROM summaries GROUP BY term
    ),
    truth AS (
      SELECT term, CAST(count(*) AS BIGINT) AS true_count FROM tok GROUP BY term
    )
    SELECT m.term, t.true_count, m.hh_estimate, m.n_shards
    FROM merged m JOIN truth t USING (term)
    ORDER BY m.hh_estimate DESC, m.term LIMIT {HH_TOP}
    """,
)
def sketch_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed heavy hitters by local-top-k-then-merge: shard the
    corpus deterministically by doc id, keep each shard's top
    HH_LOCAL_K term counts (the bounded SpaceSaving-style summary),
    merge summaries by summation, report the top HH_TOP terms with
    their true counts alongside the merged estimate.

    100 TB shape: the only full-data shuffle is the (shard, term)
    groupBy, which map-side-combines; the per-shard top-k window runs
    over vocabulary-sized count tables, not the corpus; everything
    after operates on ≤ HH_SHARDS × HH_LOCAL_K rows. In production
    HH_SHARDS tracks the executor count and summaries persist per
    ingest batch, merging across days exactly like the count-min
    table. The truth join is the evaluation harness (same pattern as
    sketch_countmin_terms) — at scale you'd skip it."""
    docs = load_table(spark, sf_dir, "documents")
    tokens = docs.select(
        _shard_of(F.col("doc_id")).alias("shard"),
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("term"),
    )
    merged = heavy_hitter_merge(heavy_hitter_summaries(tokens))
    truth = tokens.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("true_count"))
    return (
        merged.join(truth, "term")
        .select("term", "true_count", "hh_estimate", "n_shards")
        .orderBy(F.desc("hh_estimate"), "term")
        .limit(HH_TOP)
    )


@query(
    "sketch_hll_sliding_7d",
    # Windowed sketch algebra: per-day HLL registers for active users,
    # merged over a trailing 7-day RANGE window by per-register MAX —
    # the same merge the shard/stream paths use, applied across time.
    # A dense day x register grid (spine from a 1-row bounds aggregate)
    # keeps windows value-based over gap days; absent cells are NULL
    # and max() skips them identically on both engines.
    oracle=rf"""
    WITH ev AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events),
    du AS (
      SELECT DISTINCT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day_idx,
             user_id
      FROM ev
    ),
    h AS (
      SELECT day_idx,
             CAST('0x' || substring(md5('hll:' || CAST(user_id AS VARCHAR)), 1, 15)
                  AS BIGINT) AS hv
      FROM du
    ),
    parts AS (SELECT day_idx, hv % {HLL_M} AS register, hv // {HLL_M} AS w FROM h),
    daily AS (
      SELECT day_idx, register,
             max(CASE WHEN w = 0 THEN {_HLL_VAL_BITS + 1}
                      ELSE {_HLL_VAL_BITS + 1}
                           - len(list_filter({_POW2}, p -> p <= w))
                 END) AS r
      FROM parts GROUP BY 1, 2
    ),
    bounds AS (SELECT min(day_idx) AS d0, max(day_idx) AS d1 FROM daily),
    spine AS (SELECT unnest(generate_series(d0, d1)) AS day_idx FROM bounds),
    regs AS (SELECT unnest(range({HLL_M})) AS register),
    grid AS (SELECT day_idx, register FROM spine CROSS JOIN regs),
    filled AS (
      SELECT g.day_idx, g.register, d.r
      FROM grid g LEFT JOIN daily d USING (day_idx, register)
    )
    SELECT CAST(day_idx AS BIGINT) AS day_idx,
           CAST(register AS BIGINT) AS register,
           CAST(max(r) OVER (PARTITION BY register ORDER BY day_idx
                             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS INT)
             AS reg_7d
    FROM filled
    """,
    doc="trailing-7-day distinct-user HLL: per-day registers merged "
    "across the window by per-register MAX — the sliding-window "
    "composition of the mergeable sketch, fully hash-gated",
)
def sketch_hll_sliding_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct-user sketch: HLL registers computed per
    day, merged over a value-based 7-day window by per-register MAX —
    the classic reason to keep sketches instead of raw IDs: a sliding
    COUNT(DISTINCT) over 100 TB of events needs only days × HLL_M
    integers of state, and any window (7d, 30d, all-time) is one MAX
    over the same daily table. ``hll_estimate`` turns any day's 64
    merged registers into the cardinality estimate (error-bound tested
    in tests/test_sketches.py for the corpus sketch).

    Scale shape: the only event-sized work is the distinct (day, user)
    projection + one map-side-combined register aggregation; the spine
    grid and the RANGE window run over days × HLL_M rows — constant in
    corpus size per day."""
    ev = load_table(spark, sf_dir, "events")
    du = ev.select(
        F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("day_idx"),
        "user_id",
    ).distinct()
    daily = (
        hll_register_rho(du, F.col("user_id").cast("string"), ["day_idx"])
        .groupBy("day_idx", "register")
        .agg(F.max("r").alias("r"))
    )
    bounds = daily.agg(F.min("day_idx").alias("d0"), F.max("day_idx").alias("d1"))
    spine = bounds.select(F.explode(F.expr("sequence(d0, d1)")).alias("day_idx"))
    regs = spark.range(HLL_M).withColumnRenamed("id", "register")
    grid = spine.crossJoin(F.broadcast(regs))
    filled = grid.join(daily, ["day_idx", "register"], "left")
    from pyspark.sql import Window

    w7 = (
        Window.partitionBy("register")
        .orderBy("day_idx")
        .rangeBetween(-6, 0)
    )
    return filled.select(
        F.col("day_idx").cast("long").alias("day_idx"),
        F.col("register").cast("long").alias("register"),
        F.max("r").over(w7).cast("int").alias("reg_7d"),
    )


# ---------------------------------------------------------------------------
# HLL set-intersection: audience overlap from sketches alone
# ---------------------------------------------------------------------------

HLL_ALPHA = 0.709  # alpha_m for m=64 (Flajolet et al. 2007)


def _hll_est_agg() -> F.Column:
    """The HLL cardinality estimate as a GROUP aggregate over register
    rows (column ``r`` = max_rho). The harmonic denominator is summed
    in EXACT integer arithmetic (2^-r scaled by 2^55 → BIGINT terms),
    so the estimate is bit-identical under any partitioning/summation
    order — the float-sum trap the numeric-discipline notes in
    SCALE.md call out. Unseen registers contribute 2^0; the standard
    linear-counting correction applies below 2.5·m."""
    scaled = F.expr("CAST(pow(2.0, 55 - r) AS BIGINT)")  # exact: r in 1..55
    denom_scaled = F.sum(scaled) + (F.lit(HLL_M) - F.count(F.lit(1))) * F.lit(1 << 55)
    denom = denom_scaled.cast("double") / F.lit(float(1 << 55))
    zeros = (F.lit(HLL_M) - F.count(F.lit(1))).cast("double")
    raw = F.lit(HLL_ALPHA) * F.lit(float(HLL_M * HLL_M)) / denom
    return F.when(
        (raw <= F.lit(2.5 * HLL_M)) & (zeros > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / zeros),
    ).otherwise(raw)


def _hll_est_sql() -> str:
    """The same estimate in DuckDB SQL, as a bare aggregate expression
    over register rows with column ``r`` — the FROM/GROUP BY scope is
    the caller's; keep in lockstep with ``_hll_est_agg``."""
    return (
        f"CASE WHEN {HLL_ALPHA} * {float(HLL_M * HLL_M)} / "
        f"((sum(CAST(power(2.0, 55 - r) AS BIGINT))"
        f"  + ({HLL_M} - count(*)) * CAST({1 << 55} AS BIGINT)) / {float(1 << 55)})"
        f" <= {2.5 * HLL_M} AND ({HLL_M} - count(*)) > 0 "
        f"THEN {float(HLL_M)} * ln({float(HLL_M)} / ({HLL_M} - count(*))) "
        f"ELSE {HLL_ALPHA} * {float(HLL_M * HLL_M)} / "
        f"((sum(CAST(power(2.0, 55 - r) AS BIGINT))"
        f"  + ({HLL_M} - count(*)) * CAST({1 << 55} AS BIGINT)) / {float(1 << 55)}) END"
    )


@query(
    "sketch_hll_overlap",
    oracle=rf"""
    WITH tu AS (SELECT DISTINCT event_type, user_id FROM events),
    h AS (
      SELECT event_type,
             CAST('0x' || substring(md5('hll:' || CAST(user_id AS VARCHAR)), 1, 15)
                  AS BIGINT) AS hv
      FROM tu
    ),
    parts AS (SELECT event_type, hv % {HLL_M} AS register, hv // {HLL_M} AS w FROM h),
    regs AS (
      SELECT event_type, register,
             max(CASE WHEN w = 0 THEN {_HLL_VAL_BITS + 1}
                      ELSE {_HLL_VAL_BITS + 1}
                           - len(list_filter({_POW2}, p -> p <= w))
                 END) AS r
      FROM parts GROUP BY 1, 2
    ),
    p_regs AS (SELECT register, r FROM regs WHERE event_type = 'purchase'),
    others AS (SELECT * FROM regs WHERE event_type != 'purchase'),
    union_regs AS (
      SELECT event_type, register, max(r) AS r FROM (
        SELECT * FROM others
        UNION ALL
        SELECT t.event_type, p.register, p.r
        FROM (SELECT DISTINCT event_type FROM others) t CROSS JOIN p_regs p
      ) GROUP BY 1, 2
    ),
    est_t AS (SELECT event_type, {_hll_est_sql()} AS est_users
              FROM others GROUP BY event_type),
    est_u AS (SELECT event_type, {_hll_est_sql()} AS est_union
              FROM union_regs GROUP BY event_type),
    est_p AS (SELECT {_hll_est_sql()} AS est_purchase FROM p_regs),
    exact AS (
      SELECT a.event_type, count(DISTINCT a.user_id) AS exact_overlap
      FROM tu a JOIN (SELECT user_id FROM tu WHERE event_type = 'purchase') p
        ON a.user_id = p.user_id
      WHERE a.event_type != 'purchase'
      GROUP BY a.event_type
    )
    SELECT t.event_type,
           round(t.est_users, 2) AS est_users,
           round(ep.est_purchase, 2) AS est_purchase,
           round(u.est_union, 2) AS est_union,
           round(t.est_users + ep.est_purchase - u.est_union, 2) AS est_overlap,
           CAST(coalesce(x.exact_overlap, 0) AS BIGINT) AS exact_overlap
    FROM est_t t
    JOIN est_u u USING (event_type)
    CROSS JOIN est_p ep
    LEFT JOIN exact x USING (event_type)
    """,
    doc="audience overlap |users(t) ∩ users(purchase)| estimated by HLL "
    "inclusion-exclusion — three sketch estimates composed from "
    "register rows alone, never re-touching raw ids; exact overlap "
    "alongside for the error story; fully hash-gated (integer-exact "
    "harmonic sums, order-independent)",
)
def sketch_hll_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-composed set intersection: estimate the user overlap
    between each event type and 'purchase' as E(A) + E(B) − E(A∪B),
    where every E comes from 64-register HLL sketches and the union
    sketch is the per-register MAX of the two sides — no raw-id join
    anywhere in the estimate path (the exact overlap column exists
    only to show the estimator's error).

    Why this matters at 100 TB: distinct-user overlap between N
    segment pairs via exact joins is N shuffles of the id universe;
    with per-segment sketches maintained incrementally (the
    ``sketch_hll_sliding_7d`` machinery) every pairwise overlap is
    arithmetic over 64-row tables — constant cost per pair, zero
    additional scans. Inclusion-exclusion error grows with the
    relative overlap smallness (standard HLL caveat); the output
    carries both numbers so the trade is visible.

    Determinism: the harmonic denominator sums 2^-rho terms scaled by
    2^55 into exact BIGINTs, so the estimate survives any partitioning
    (a plain double sum here would be order-dependent across the
    54-bit exponent span)."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    tu = ev.distinct()
    regs = (
        hll_register_rho(tu, F.col("user_id").cast("string"), ["event_type"])
        .groupBy("event_type", "register")
        .agg(F.max("r").alias("r"))
    )
    p_regs = regs.filter(F.col("event_type") == "purchase").select("register", "r")
    others = regs.filter(F.col("event_type") != "purchase")
    types = others.select("event_type").distinct()
    union_regs = (
        others.unionByName(
            types.crossJoin(F.broadcast(p_regs)).select("event_type", "register", "r")
        )
        .groupBy("event_type", "register")
        .agg(F.max("r").alias("r"))
    )
    est_t = others.groupBy("event_type").agg(_hll_est_agg().alias("est_users"))
    est_u = union_regs.groupBy("event_type").agg(_hll_est_agg().alias("est_union"))
    est_p = p_regs.agg(_hll_est_agg().alias("est_purchase"))
    pu = tu.filter(F.col("event_type") == "purchase").select("user_id")
    exact = (
        tu.filter(F.col("event_type") != "purchase")
        .join(pu, "user_id", "left_semi")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact_overlap"))
    )
    return (
        est_t.join(est_u, "event_type")
        .crossJoin(F.broadcast(est_p))
        .join(exact, "event_type", "left")
        .select(
            "event_type",
            F.round("est_users", 2).alias("est_users"),
            F.round("est_purchase", 2).alias("est_purchase"),
            F.round("est_union", 2).alias("est_union"),
            F.round(
                F.col("est_users") + F.col("est_purchase") - F.col("est_union"), 2
            ).alias("est_overlap"),
            F.coalesce(F.col("exact_overlap"), F.lit(0)).cast("long").alias(
                "exact_overlap"
            ),
        )
    )

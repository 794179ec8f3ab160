"""Round-15 optimization equivalence gates.

Each test pins an optimization that changed an operator's INTERNALS
(never its output): the JVM-literal local frames, the vectorized
media hashing, and the restructured PII span scan. Output equality is
asserted against the pre-optimization reference computed in-test;
end-to-end value parity stays with the DuckDB gates in
test_oracle_parity.py.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from tripl_spark.operators import media_codecs as mc
from tripl_spark.session import local_df

SF_DIR = "/root/testdata/sf0.001"


# -- local_df ≡ createDataFrame ------------------------------------------------


def _assert_frames_equal(a, b):
    assert [f.name for f in a.schema.fields] == [f.name for f in b.schema.fields]
    assert [f.dataType for f in a.schema.fields] == [f.dataType for f in b.schema.fields]
    ra = sorted(map(str, a.collect()))
    rb = sorted(map(str, b.collect()))
    assert ra == rb


def test_local_df_simple(spark):
    rows = [("a.com", "blocked:ads"), ("b.com", None), (None, "x")]
    schema = "dom string, reason string"
    _assert_frames_equal(
        spark.createDataFrame(rows, schema), local_df(spark, rows, schema)
    )


def test_local_df_array_and_numeric(spark):
    rows = [(0, [1.0, 2.5]), (1, [3.0, -4.0])]
    schema = "cid int, cv array<double>"
    _assert_frames_equal(
        spark.createDataFrame(rows, schema), local_df(spark, rows, schema)
    )


def test_local_df_struct_array(spark):
    rows = [("h1", [("/p", True, 1), ("/q", False, 2)]), ("h2", [])]
    schema = "rhost string, rules array<struct<prefix:string,allow:boolean,rule_id:bigint>>"
    _assert_frames_equal(
        spark.createDataFrame(rows, schema), local_df(spark, rows, schema)
    )


def test_local_df_empty(spark):
    out = local_df(spark, [], "e string, v string")
    assert out.count() == 0
    assert out.schema == spark.createDataFrame([], "e string, v string").schema


def test_local_df_large_falls_back(spark):
    rows = [(i, f"s{i}") for i in range(300)]
    schema = "i bigint, s string"
    out = local_df(spark, rows, schema, max_local=256)
    _assert_frames_equal(spark.createDataFrame(rows, schema), out)


def test_local_df_sql_rendering_is_exact(spark):
    """The one-F.expr SQL rendering (r15 second session) must be
    bit-exact vs createDataFrame: escapes (backslash, quote, newline),
    unicode, NaN / ±Infinity / -0.0 doubles at full precision, NULLs
    at every nesting level."""
    import struct as _s

    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("s", T.StringType()),
        T.StructField("d", T.DoubleType()),
        T.StructField("arr", T.ArrayType(T.DoubleType())),
        T.StructField("st", T.StructType([
            T.StructField("x", T.StringType()),
            T.StructField("y", T.IntegerType()),
        ])),
    ])
    rows = [
        ("it's a \\ test\nnl\ttab ✓", 1e-300, [1.5, -0.0, float("nan")], ("q'q", 7)),
        (None, float("inf"), None, (None, None)),
        ("plain", -1.7976931348623157e308, [0.1 + 0.2], None),
    ]
    a = local_df(spark, rows, schema)
    b = spark.createDataFrame(rows, schema)
    _assert_frames_equal(b, a)

    def bits(v):
        return None if v is None else _s.pack(">d", v).hex()

    da = [bits(r["d"]) for r in a.orderBy("d").collect()]
    db = [bits(r["d"]) for r in b.orderBy("d").collect()]
    assert da == db
    aa = [bits(x) for r in a.collect() if r["arr"] for x in r["arr"]]
    ab = [bits(x) for r in b.collect() if r["arr"] for x in r["arr"]]
    assert sorted(aa, key=str) == sorted(ab, key=str)


def test_local_df_escaped_literals_session_falls_back(spark):
    """Under spark.sql.parser.escapedStringLiterals=true (legacy parser
    mode) local_df must still produce exact strings — via the
    per-column fallback builder."""
    from tripl_spark.session import _ESCAPED_LITERALS_MEMO

    key = "spark.sql.parser.escapedStringLiterals"
    old = spark.conf.get(key, "false")
    try:
        spark.conf.set(key, "true")
        _ESCAPED_LITERALS_MEMO.clear()
        rows = [("a\\b'c\nd", 1)]
        df = local_df(spark, rows, "s string, n long")
        assert df.collect()[0]["s"] == "a\\b'c\nd"
    finally:
        spark.conf.set(key, old)
        _ESCAPED_LITERALS_MEMO.clear()


def test_local_df_plan_has_no_python_rdd(spark):
    """The point of local_df: no pickled-Python RDD scan in the plan."""
    plan = local_df(
        spark, [("x", "y")], "a string, b string"
    )._jdf.queryExecution().executedPlan().toString()
    assert "ExistingRDD" not in plan


# -- vectorized media hashing ≡ per-frame reference loop ----------------------


def _reference_dhash(w: int, h: int, px: bytes, dw: int = 9, dh: int = 8) -> str:
    small = mc.resize_nearest(w, h, px, dw, dh)
    arr = np.frombuffer(small, dtype=np.uint8).reshape(dh, dw, 3)
    gray = arr.astype(np.int64).sum(axis=2) // 3
    bits = (gray[:, 1:] > gray[:, :-1]).astype(np.uint8)
    return "".join("1" if b else "0" for b in bits.ravel())


def test_video_frame_dhashes_match_reference(spark):
    from tripl_spark.operators.multimodal import video_frame_dhashes, video_table

    videos = video_table(spark, SF_DIR)
    got = {
        (r["doc_id"], r["frame_idx"]): r["dhash"]
        for r in video_frame_dhashes(videos).collect()
    }
    payloads = {r["doc_id"]: bytes(r["payload"]) for r in videos.collect()}
    assert payloads, "empty fixture"
    for doc_id, payload in payloads.items():
        frames = mc.decode_frames(payload)
        assert len(frames) == 1 + doc_id % 8
        for i, (w, h, px) in enumerate(frames):
            assert got[(doc_id, i)] == _reference_dhash(w, h, px)


def test_image_dhash_matches_reference(spark):
    from tripl_spark.operators.multimodal import image_dhash, image_table

    images = image_table(spark, SF_DIR)
    got = {r["doc_id"]: r["dhash"] for r in image_dhash(images).collect()}
    for r in images.collect():
        w, h, px = mc.decode_image(bytes(r["payload"]))
        assert got[r["doc_id"]] == _reference_dhash(w, h, px)


def test_video_table_payloads_are_real_ppm_streams(spark):
    """The vectorized synthesis must emit byte-identical containers to
    the per-frame encode_ppm loop."""
    from tripl_spark.operators.multimodal import (
        FRAME_H,
        FRAME_W,
        _frame_pixels,
        video_table,
    )

    for r in video_table(spark, SF_DIR).collect():
        n = 1 + r["doc_id"] % 8
        expect = b"".join(
            mc.encode_ppm(FRAME_W, FRAME_H, _frame_pixels(r["doc_id"], f))
            for f in range(n)
        )
        assert bytes(r["payload"]) == expect
        assert r["n_frames"] == n


# -- restructured PII span scan stays map-only --------------------------------


def test_pii_spans_plan_stays_shuffle_free(spark):
    from tripl_spark.queries.registry import all_queries

    df = all_queries()["text_pii_spans"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan


# -- literal-codebook k-means assignment ≡ join/min_by assignment -------------


def _emb(spark):
    from tripl_spark.session import load_table

    return load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )


def test_literal_assignment_matches_join_assignment(spark):
    """The map-only literal-codebook path (r15) must reproduce the
    join+min_by path row-for-row: same winner, same rounded distance,
    same (d2, cid) tie-break — on the real embeddings."""
    from tripl_spark.operators.clustering import (
        _assign_literal,
        _assign_round,
        kmeans_2iter_centroid_rows,
        kmeans_2iter_centroids,
    )

    emb = _emb(spark)
    rows = kmeans_2iter_centroid_rows(emb)
    cent_df = kmeans_2iter_centroids(emb)
    old = sorted(map(tuple, _assign_round(emb, cent_df).collect()))
    new = sorted(map(tuple, _assign_literal(emb, rows).collect()))
    assert old == new


def test_literal_probe_matches_ranked_probe(spark):
    """_probe_literal (array_sort slice) ≡ _assign_all_ranked rn<=nprobe."""
    from tripl_spark.operators.clustering import (
        KM_IVF_NPROBE,
        _assign_all_ranked,
        _probe_literal,
        kmeans_2iter_centroid_rows,
        kmeans_2iter_centroids,
    )

    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") < 7)
    rows = kmeans_2iter_centroid_rows(emb)
    cent_df = kmeans_2iter_centroids(emb)
    old = sorted(
        (r["vec_id"], r["cid"])
        for r in _assign_all_ranked(q, cent_df)
        .filter(F.col("rn") <= KM_IVF_NPROBE)
        .collect()
    )
    new = sorted(
        (r["vec_id"], r["cid"]) for r in _probe_literal(q, rows, KM_IVF_NPROBE).collect()
    )
    assert old == new


def test_semantic_assignment_plan_has_no_shuffle_or_broadcast(spark):
    """dedup_semantic_clusters' only Exchange is the cid repartition of
    the pair stage: assignment and training leave no vec_id shuffle and
    no codebook broadcast in the plan."""
    from tripl_spark.queries.registry import all_queries

    df = all_queries()["dedup_semantic_clusters"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(vec_id" not in plan
    assert "hashpartitioning(cid" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" in plan


# -- melt_table SQL rendering ≡ columnwise builder ----------------------------


def test_melt_table_sql_matches_columnwise(spark):
    from datetime import datetime

    from tripl_spark.sources.melt import (
        _melt_table_columnwise,
        _melt_table_sql,
        melt_table,
    )

    rows = [
        (1, "alice", 4.5, True, datetime(2024, 1, 15, 8, 30, 5), 3),
        (2, None, None, None, None, None),
        (3, "it's quoted", -0.0, False, datetime(1999, 12, 31, 23, 59, 59), 7),
    ]
    schema = (
        "k bigint, name string, score double, flag boolean, "
        "seen timestamp, nation_fk int"
    )
    df = spark.createDataFrame(rows, schema)
    ref_cols = {"nation_fk": ("nation", "nation")}
    sql = _melt_table_sql(df, "user", "k", ref_cols)
    col = _melt_table_columnwise(df, "user", "k", ref_cols)
    _assert_frames_equal(col, sql)
    # the public entry routes these safe names through the SQL path
    assert (
        melt_table(df, "user", "k", ref_cols=ref_cols).schema == sql.schema
    )


def test_melt_table_unsafe_name_falls_back(spark):
    from tripl_spark.sources import melt as melt_mod

    df = spark.createDataFrame([(1, "x")], "k bigint, v string")
    calls = []
    orig = melt_mod._melt_table_columnwise
    try:
        melt_mod._melt_table_columnwise = lambda *a, **kw: calls.append(1) or orig(*a, **kw)
        out = melt_mod.melt_table(df, "who's", "k")
    finally:
        melt_mod._melt_table_columnwise = orig
    assert calls, "quoted namespace must route to the columnwise builder"
    assert out.filter(F.col("a") == "who's:v").count() == 1


# -- pii_scrub_frame ≡ the two-chain composition ------------------------------


def test_pii_scrub_frame_matches_two_chain_reference(spark):
    from pyspark.sql import Column

    from tripl_spark.operators.pii import (
        PII_CLASSES,
        luhn_valid_count,
        pii_counts,
        pii_scrub_frame,
        scrub_pii,
    )

    rows = [
        (0, "reach user0@example.com card 4111 1111 1111 1111 now"),
        (1, None),  # NULL text: scrub_fp/clean NULL, counts 0 — both shapes
        (2, "id 123-45-6789 call +1 (555) 010-1234 host 10.3.0.21"),
        (3, "token sk-0123456789abcdefghij digest "
            "0123456789abcdef0123456789abcdef plain text"),
        (4, ""),
        (5, "no pii at all"),
    ]
    enriched = spark.createDataFrame(rows, "doc_id bigint, t string")

    # the ORIGINAL two-chain composition, verbatim from the old query body
    cc_stage: Column = F.col("t")
    for name, pat, token in PII_CLASSES:
        if name == "cc":
            break
        cc_stage = F.regexp_replace(cc_stage, pat, token)
    per_doc = enriched.select(
        "doc_id",
        *pii_counts(F.col("t")),
        luhn_valid_count(cc_stage).alias("n_cc_luhn"),
        scrub_pii(F.col("t")).alias("__scrub"),
    )
    residual = ~F.col("__scrub").rlike(
        "|".join(f"(?:{pat})" for _, pat, _ in PII_CLASSES)
    )
    total = None
    for name, _, _ in PII_CLASSES:
        c = F.col(f"n_{name}")
        total = c if total is None else (total + c)
    reference = per_doc.select(
        "doc_id",
        *[f"n_{name}" for name, _, _ in PII_CLASSES],
        "n_cc_luhn",
        total.cast("long").alias("n_pii"),
        F.md5(F.col("__scrub")).alias("scrub_fp"),
        residual.alias("clean"),
    )
    _assert_frames_equal(reference, pii_scrub_frame(enriched))


def test_pii_scrub_plan_stays_shuffle_free(spark):
    from tripl_spark.operators.pii import text_pii_scrub

    plan = text_pii_scrub(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_centroid_update_sql_agg_matches_columnwise(spark):
    """The single-parse centroid-update aggregate (r15: one F.expr
    rendering the 64 per-dim rounded means + array assembly) must
    reproduce the per-column builder bit-for-bit on the real
    embeddings — same rounded means, same array order, same rows."""
    from tripl_spark.operators.clustering import (
        EMB_DIM,
        K2,
        _assign_literal,
        kmeans_2iter_centroid_rows,
    )

    emb = _emb(spark)
    seeds = sorted(
        (int(r["vec_id"]), list(r["v"]))
        for r in emb.filter(F.col("vec_id") < K2).select("vec_id", "v").collect()
    )
    a1 = _assign_literal(emb, seeds)
    # the verbatim pre-optimization composition
    ref = (
        a1.groupBy("cid")
        .agg(*[F.round(F.avg(F.col("v")[i]), 6).alias(f"m{i}") for i in range(EMB_DIM)])
        .select("cid", F.array(*[F.col(f"m{i}") for i in range(EMB_DIM)]).alias("cv"))
    )
    old = sorted((int(r["cid"]), list(r["cv"])) for r in ref.collect())
    new = kmeans_2iter_centroid_rows(emb)
    assert old == new


def test_minhash_signature_sql_agg_matches_columnwise(spark):
    """The single-parse signature aggregate (r15: one F.expr rendering
    the 32 permutation mins + array assembly) must reproduce the
    per-column builder bit-for-bit on the real corpus."""
    from tripl_spark.operators.dedup import (
        MINHASH_PERMS,
        _MERSENNE,
        _PERM_A,
        _PERM_B,
        _signatures_from_sets,
        shingle_sets,
    )
    from tripl_spark.session import load_table

    docs = load_table(spark, SF_DIR, "documents")
    sets = shingle_sets(docs)
    # the verbatim pre-optimization composition
    sh = sets.select(F.col("doc_id"), F.explode("hs").alias("h"))
    h = F.col("h")
    aggs = [
        F.min(F.pmod(a * h + b, _MERSENNE)).alias(f"__m{i}")
        for i, (a, b) in enumerate(zip(_PERM_A, _PERM_B))
    ]
    ref = (
        sh.groupBy("doc_id")
        .agg(*aggs)
        .select(
            "doc_id",
            F.array(*[F.col(f"__m{i}") for i in range(MINHASH_PERMS)]).alias("sig"),
        )
    )
    old = sorted((int(r["doc_id"]), list(r["sig"])) for r in ref.collect())
    new = sorted(
        (int(r["doc_id"]), list(r["sig"]))
        for r in _signatures_from_sets(sets).collect()
    )
    assert old == new
    assert _signatures_from_sets(sets).schema.simpleString() == ref.schema.simpleString()


def test_bucket_key_sql_matches_column_builder(spark):
    """The single-parse bucket_key("v") must reproduce the Column-built
    bucket_key(F.col("v")) bit-for-bit on the real embeddings, for the
    default planes and a custom plane set."""
    from tripl_spark.operators.similarity import bucket_key, lsh_planes
    from tripl_spark.session import load_table

    emb = load_table(spark, SF_DIR, "embeddings").selectExpr(
        "vec_id", "transform(embedding, x -> cast(x as double)) AS v"
    )
    for planes in (None, lsh_planes(5)):
        old = sorted(
            (int(r["vec_id"]), int(r["b"]))
            for r in emb.select(
                "vec_id", bucket_key(F.col("v"), planes).alias("b")
            ).collect()
        )
        new = sorted(
            (int(r["vec_id"]), int(r["b"]))
            for r in emb.select("vec_id", bucket_key("v", planes).alias("b")).collect()
        )
        assert old == new


def test_bucket_key_sql_escapes_backticks(spark):
    """A column name containing a backtick must render as a valid
    backquoted identifier (doubled backtick), matching the Column path."""
    from tripl_spark.operators.similarity import bucket_key
    from tripl_spark.session import load_table

    sane = load_table(spark, SF_DIR, "embeddings").selectExpr(
        "vec_id", "transform(embedding, x -> cast(x as double)) AS v"
    )
    weird = load_table(spark, SF_DIR, "embeddings").selectExpr(
        "vec_id", "transform(embedding, x -> cast(x as double)) AS `we`` ird`"
    )
    old = sorted(
        (int(r["vec_id"]), int(r["b"]))
        for r in sane.select("vec_id", bucket_key(F.col("v")).alias("b")).collect()
    )
    new = sorted(
        (int(r["vec_id"]), int(r["b"]))
        for r in weird.select("vec_id", bucket_key("we` ird").alias("b")).collect()
    )
    assert old == new

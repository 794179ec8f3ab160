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

"""Multimodal columns: opaque binary payloads with typed metadata,
processed by Arrow-batched Pandas UDFs over ``mapInPandas``.

Round 1 shipped this with stubbed codecs; the decode path is now REAL:
payloads are genuine BMP / PPM / WAV / concatenated-PPM bytes
(``media_codecs`` implements the formats from their public specs), and
every feature below is computed from *decoded* pixels/samples — headers
parsed, BMP row padding and BGR order unwound, PCM samples widened
before abs(). Because payload content is synthesized deterministically
from ``doc_id``, the decoded features are independently computable in
SQL, so the decode pipeline is hash-checked end-to-end by the DuckDB
oracle: a codec bug (padding, channel order, sign) flips the feature
values and fails the gate.

Scale notes: binary payloads ride in parquet as byte arrays; the UDFs
process whole Arrow batches (no per-row pickling); decode-heavy stages
``repartition`` first so batches spread across executors rather than
following upstream file boundaries. Python is confined to the
encode/decode stages by design — metadata projections stay JVM-side.

Reference parity: the reference (metasoarous/tripl) has no media
handling; this is the driver-mandated training-data extension layer.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tripl_spark.operators import media_codecs as mc
from tripl_spark.queries.registry import query
from tripl_spark.session import eager_checkpoint, load_table

MEDIA_SCHEMA = (
    "doc_id long, media_type string, payload binary, byte_len long, content_hash string"
)

# ---------------------------------------------------------------------------
# Deterministic payload synthesis (formulas mirrored in the SQL oracles)
# ---------------------------------------------------------------------------

FRAME_W = FRAME_H = 4  # video stand-in frame dims
AUDIO_RATE = 8000


def _image_dims(doc_id: int) -> tuple[int, int]:
    return 4 + doc_id % 5, 4 + doc_id % 3


def _image_pixels(doc_id: int) -> bytes:
    w, h = _image_dims(doc_id)
    i = np.arange(w * h * 3, dtype=np.int64)
    return ((doc_id * 31 + i * 7) % 256).astype(np.uint8).tobytes()


def _frame_pixels(doc_id: int, frame_idx: int) -> bytes:
    j = np.arange(FRAME_W * FRAME_H * 3, dtype=np.int64)
    return ((doc_id * 31 + frame_idx * 13 + j * 7) % 256).astype(np.uint8).tobytes()


def _audio_samples(doc_id: int) -> np.ndarray:
    n = 256 + doc_id % 128
    i = np.arange(n, dtype=np.int64)
    return ((doc_id * 131 + i * 17) % 65536 - 32768).astype(np.int16)


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary media table derived from documents: text bytes as
    payload (metadata projections don't decode, so content is
    arbitrary; the decode-path tables below carry real image/audio
    bytes)."""
    docs = load_table(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "utf-8")
    return docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 2 == 0, F.lit("image/png"))
        .otherwise(F.lit("audio/wav"))
        .alias("media_type"),
        payload.alias("payload"),
        F.octet_length("text").cast("long").alias("byte_len"),
        F.md5(payload).alias("content_hash"),
    )


def image_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, codec, payload) with REAL encoded images: even doc_ids
    as 24-bit BMPs, odd as binary PPMs — both codecs exercised through
    the magic-byte dispatch on decode."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"].tolist()
            payloads, codecs = [], []
            for doc_id in ids:
                w, h = _image_dims(doc_id)
                px = _image_pixels(doc_id)
                if doc_id % 2 == 0:
                    payloads.append(mc.encode_bmp(w, h, px))
                    codecs.append("bmp")
                else:
                    payloads.append(mc.encode_ppm(w, h, px))
                    codecs.append("ppm")
            yield pd.DataFrame({"doc_id": ids, "codec": codecs, "payload": payloads})

    return docs.repartition(docs.sparkSession.sparkContext.defaultParallelism).mapInPandas(
        op, schema="doc_id long, codec string, payload binary"
    )


def video_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_frames, payload): concatenated-PPM streams (the video
    container stand-in), 1 + doc_id % 8 frames each."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    # one numpy broadcast computes every frame of every doc in the
    # batch (guide §4.2: hand whole batches to vectorized native code;
    # the per-frame Python loop was ~1.5 ms/frame of pure interpreter
    # overhead). The emitted bytes are identical to the per-frame
    # encode_ppm loop: header + 48 RGB bytes per frame, concatenated.
    header = np.frombuffer(b"P6 %d %d 255\n" % (FRAME_W, FRAME_H), dtype=np.uint8)

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"].to_numpy()
            if len(ids) == 0:
                yield pd.DataFrame({"doc_id": [], "n_frames": [], "payload": []})
                continue
            counts = 1 + ids % 8
            doc_rep = np.repeat(ids, counts)
            f_rep = np.concatenate([np.arange(n) for n in counts])
            j = np.arange(FRAME_W * FRAME_H * 3, dtype=np.int64)
            px = (
                (doc_rep[:, None] * 31 + f_rep[:, None] * 13 + j[None, :] * 7) % 256
            ).astype(np.uint8)
            frames = np.hstack([np.tile(header, (len(doc_rep), 1)), px])
            flat = frames.tobytes()
            fsz = frames.shape[1]
            ends = np.cumsum(counts) * fsz
            starts = ends - counts * fsz
            payloads = [flat[s:e] for s, e in zip(starts, ends)]
            yield pd.DataFrame(
                {"doc_id": ids, "n_frames": counts.astype("int32"), "payload": payloads}
            )

    return docs.repartition(docs.sparkSession.sparkContext.defaultParallelism).mapInPandas(
        op, schema="doc_id long, n_frames int, payload binary"
    )


def audio_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, payload): real PCM16 WAV payloads."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"].tolist()
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "payload": [
                        mc.encode_wav(_audio_samples(d), AUDIO_RATE) for d in ids
                    ],
                }
            )

    return docs.repartition(docs.sparkSession.sparkContext.defaultParallelism).mapInPandas(
        op, schema="doc_id long, payload binary"
    )


# ---------------------------------------------------------------------------
# Decode / feature-extract stages (real parsing)
# ---------------------------------------------------------------------------

IMAGE_FEATURE_SCHEMA = (
    "doc_id long, codec string, width int, height int, px_mean double"
)


def extract_image_features(images: DataFrame) -> DataFrame:
    """mapInPandas: parse each payload (BMP or PPM via magic bytes),
    return dims + mean decoded pixel value."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            widths, heights, means = [], [], []
            for payload in pdf["payload"]:
                w, h, px = mc.decode_image(bytes(payload))
                widths.append(w)
                heights.append(h)
                arr = np.frombuffer(px, dtype=np.uint8)
                means.append(round(float(arr.astype(np.int64).mean()), 4))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "codec": pdf["codec"],
                    "width": widths,
                    "height": heights,
                    "px_mean": means,
                }
            )

    return images.mapInPandas(op, schema=IMAGE_FEATURE_SCHEMA)


RESIZED_SCHEMA = (
    "doc_id long, media_type string, width int, height int, payload binary, "
    "content_hash string"
)
FRAME_SCHEMA = "doc_id long, frame_idx int, frame_ts double, px_mean double"


def resize_images(images: DataFrame, width: int = 16, height: int = 16) -> DataFrame:
    """Real resize: decode (BMP/PPM) → nearest-neighbor resample →
    re-encode as PPM. One row in, one row out; output payloads are
    deterministic (hash-stable under repartitioning)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, hashes = [], []
            for payload in pdf["payload"]:
                w, h, px = mc.decode_image(bytes(payload))
                resized = mc.resize_nearest(w, h, px, width, height)
                out = mc.encode_ppm(width, height, resized)
                payloads.append(out)
                hashes.append(hashlib.md5(out).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": "image/ppm",
                    "width": width,
                    "height": height,
                    "payload": payloads,
                    "content_hash": hashes,
                }
            )

    return images.mapInPandas(op, schema=RESIZED_SCHEMA)


def sample_frames(videos: DataFrame, fps: float = 1.0,
                  max_frames: int = 8) -> DataFrame:
    """1→N frame sampling with REAL container parsing: walk the
    concatenated-PPM stream frame by frame, emit per-frame decoded
    features. ``mapInPandas`` because output cardinality differs from
    input (a pandas_udf cannot change row counts)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [], "frame_idx": [], "frame_ts": [], "px_mean": []
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                for i, (w, h, px) in enumerate(mc.decode_frames(bytes(payload))):
                    if i >= max_frames:
                        break
                    arr = np.frombuffer(px, dtype=np.uint8)
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["frame_ts"].append(round(i / fps, 3))
                    out["px_mean"].append(round(float(arr.astype(np.int64).mean()), 4))
            yield pd.DataFrame(out)

    return videos.mapInPandas(op, schema=FRAME_SCHEMA)


AUDIO_FEATURE_SCHEMA = (
    "doc_id long, sample_rate int, n_samples int, amp_mean double"
)


def extract_audio_features(audio: DataFrame) -> DataFrame:
    """mapInPandas: parse RIFF chunks, widen int16 → int64 BEFORE abs
    (abs(-32768) overflows in int16 — a real codec bug class the oracle
    would catch), return mean normalized amplitude."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rates, counts, amps = [], [], []
            for payload in pdf["payload"]:
                rate, _ch, samples = mc.decode_wav(bytes(payload))
                rates.append(rate)
                counts.append(len(samples))
                amps.append(
                    round(float(np.abs(samples.astype(np.int64)).mean()) / 32768, 6)
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "sample_rate": rates,
                    "n_samples": counts,
                    "amp_mean": amps,
                }
            )

    return audio.mapInPandas(op, schema=AUDIO_FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# Registered queries (decode features are fully oracled: the SQL
# recomputes the expected features from the synthesis formulas, so a
# decode bug breaks the hash match)
# ---------------------------------------------------------------------------


@query(
    "multimodal_metadata",
    oracle="""
    SELECT doc_id,
           CASE WHEN doc_id % 2 = 0 THEN 'image/png' ELSE 'audio/wav' END AS media_type,
           CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
           md5(text) AS content_hash
    FROM documents
    """,
)
def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed-metadata projection of the binary column (no decode):
    byte length + content hash, computed JVM-side."""
    return media_table(spark, sf_dir).select(
        "doc_id", "media_type", "byte_len", "content_hash"
    )


@query(
    "multimodal_features",
    oracle="""
    SELECT d.doc_id,
           CASE WHEN d.doc_id % 2 = 0 THEN 'bmp' ELSE 'ppm' END AS codec,
           CAST(4 + d.doc_id % 5 AS INT) AS width,
           CAST(4 + d.doc_id % 3 AS INT) AS height,
           round(avg((d.doc_id * 31 + t.i * 7) % 256), 4) AS px_mean
    FROM documents d,
         LATERAL (
           SELECT unnest(range((4 + d.doc_id % 5) * (4 + d.doc_id % 3) * 3)) AS i
         ) t
    GROUP BY d.doc_id
    """,
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode (BMP/PPM) → decode (magic-byte dispatch, real parsing) →
    per-image features. The oracle recomputes the expected mean from
    the pixel-synthesis formula, so BMP row padding / BGR order /
    header bugs all fail the hash."""
    return extract_image_features(image_table(spark, sf_dir))


@query(
    "multimodal_frame_sample",
    oracle="""
    SELECT d.doc_id, CAST(f.frame_idx AS INT) AS frame_idx,
           round(f.frame_idx / 1.0, 3) AS frame_ts,
           round(avg((d.doc_id * 31 + f.frame_idx * 13 + p.j * 7) % 256), 4) AS px_mean
    FROM documents d,
         LATERAL (SELECT unnest(range(1 + d.doc_id % 8)) AS frame_idx) f,
         LATERAL (SELECT unnest(range(48)) AS j) p
    GROUP BY d.doc_id, f.frame_idx
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1→N frame sampling over concatenated-PPM video payloads with
    real container parsing; per-frame decoded means, fully oracled."""
    return sample_frames(video_table(spark, sf_dir))


@query(
    "multimodal_audio_features",
    oracle="""
    SELECT d.doc_id, 8000 AS sample_rate,
           CAST(256 + d.doc_id % 128 AS INT) AS n_samples,
           round(avg(abs((d.doc_id * 131 + t.i * 17) % 65536 - 32768)) / 32768, 6)
             AS amp_mean
    FROM documents d,
         LATERAL (SELECT unnest(range(256 + d.doc_id % 128)) AS i) t
    GROUP BY d.doc_id
    """,
)
def multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real PCM16 WAV decode (RIFF chunk walk) → mean normalized
    amplitude, fully oracled against the sample-synthesis formula."""
    return extract_audio_features(audio_table(spark, sf_dir))


# ---------------------------------------------------------------------------
# Perceptual hashing + image near-dup dedup
# ---------------------------------------------------------------------------

DHASH_W, DHASH_H = 9, 8  # 9x8 grayscale grid -> 64 horizontal-gradient bits


def image_dhash(images: DataFrame) -> DataFrame:
    """(doc_id, dhash) — difference hash over DECODED pixels: resize to
    a 9x8 grid (nearest, floor mapping), integer grayscale
    (r+g+b)//3, bit b = r*8+c set iff gray(r,c+1) > gray(r,c). Emitted
    as a 64-char '0'/'1' string (production would pack to int64; the
    string keeps the SQL oracle and banding trivially exact)."""

    # decode (format dispatch + header parse) stays row-wise — the
    # honest parse — but resize/grayscale/gradient run one numpy pass
    # per (w, h) group of the batch and the bit string is built by
    # byte arithmetic, same vectorization as video_frame_dhashes
    # (guide §4.2: batch the raster math, don't loop rows in Python).
    n_bits = DHASH_H * (DHASH_W - 1)

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [mc.decode_image(bytes(p)) for p in pdf["payload"]]
            by_dims: dict[tuple[int, int], list[int]] = {}
            for k, (w, h, _) in enumerate(decoded):
                by_dims.setdefault((w, h), []).append(k)
            hashes: list[str | None] = [None] * len(decoded)
            for (w, h), ks in by_dims.items():
                arr = np.frombuffer(
                    b"".join(decoded[k][2] for k in ks), dtype=np.uint8
                ).reshape(len(ks), h, w, 3)
                ys = (np.arange(DHASH_H) * h) // DHASH_H
                xs = (np.arange(DHASH_W) * w) // DHASH_W
                small = arr[:, ys][:, :, xs]
                gray = small.astype(np.int64).sum(axis=3) // 3
                bits = (gray[:, :, 1:] > gray[:, :, :-1]).astype(np.uint8)
                chars = (bits.reshape(len(ks), n_bits) + ord("0")).astype(np.uint8)
                flat = chars.tobytes()
                for j, k in enumerate(ks):
                    hashes[k] = flat[j * n_bits:(j + 1) * n_bits].decode("ascii")
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "dhash": hashes})

    return images.mapInPandas(op, schema="doc_id long, dhash string")


IMAGE_BAND_MAX_BUCKET = 1000  # over-popular 16-bit band keys expand
# quadratically in the candidate join. A uniform corpus's 16-bit
# buckets stay tiny, but the collision mass is CONTENT-correlated,
# not uniform: a solid-color / boilerplate image family all share the
# same all-zero-gradient dHash, so one degenerate class is a quadratic
# pair stage at corpus scale. Same DEFAULT_MAX_BUCKET discipline as
# audio_near_dup_pairs (16-bit bands there too since r12), replicated
# in the oracle.


def image_near_dup_pairs(
    hashes: DataFrame,
    max_hamming: int = 3,
    max_bucket: int | None = IMAGE_BAND_MAX_BUCKET,
) -> DataFrame:
    """(id_a, id_b, hamming) image near-dup candidates: pigeonhole the
    64 bits into 4 x 16-bit bands (any pair within Hamming <= 3 agrees
    on >= 1 whole band), equi-join per band with the degenerate-bucket
    cap (solid-color images share one dHash — uncapped, that class is
    an O(class²) join), verify exact Hamming JVM-side (zip_with over
    char arrays — candidates only, never all-pairs).

    The hash frame is persisted for the duration of THIS call: the
    band relation is consumed THREE times (bucket-cap aggregate + both
    join sides), and unpersisted each consumer re-ran the full
    decode+dhash Python pass (guide §5 caching rule: reused AND
    expensive to recompute). The (small) pair result is eagerly
    materialized via localCheckpoint, so no MEMORY_AND_DISK block
    outlives the call — the same lifecycle contract as
    video_near_dup_pairs / minhash_dedup."""
    from pyspark import StorageLevel

    cached = hashes.persist(StorageLevel.MEMORY_AND_DISK)
    hashes = cached
    bands = hashes.select(
        "doc_id", "dhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("band_id"),
                    F.substring("dhash", i * 16 + 1, 16).alias("band_key"),
                )
                for i in range(4)
            ])
        ).alias("b"),
    ).select("doc_id", "dhash", "b.band_id", "b.band_key")
    if max_bucket is not None:
        small = (
            bands.groupBy("band_id", "band_key")
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") <= max_bucket)
            .select("band_id", "band_key")
        )
        bands = bands.join(small, ["band_id", "band_key"])
    a = bands.select(
        F.col("doc_id").alias("id_a"), F.col("dhash").alias("ha"),
        "band_id", "band_key",
    )
    b = bands.select(
        F.col("doc_id").alias("id_b"), F.col("dhash").alias("hb"),
        "band_id", "band_key",
    )
    cand = (
        a.join(b, ["band_id", "band_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "ha", "hb")
        .distinct()
    )
    hamming = F.aggregate(
        F.zip_with(
            F.split("ha", ""), F.split("hb", ""),
            lambda x, y: F.when(x != y, 1).otherwise(0),
        ),
        F.lit(0),
        lambda s, z: s + z,
    )
    try:
        return (
            cand.withColumn("hamming", hamming)
            .filter(F.col("hamming") <= max_hamming)
            .select("id_a", "id_b", "hamming")
            .transform(eager_checkpoint)
        )
    finally:
        cached.unpersist()


def _dhash_oracle() -> str:
    """SQL replica of decode->resize->grayscale->gradient-bit, built on
    the pixel synthesis formula (p(i) = (doc_id*31 + i*7) % 256)."""

    def gray(col: str) -> str:
        # k = src_row * w + src_col for dst (r, c); p(3k), p(3k+1), p(3k+2)
        k = f"((((bit // 8) * h) // 8) * w + ((({col}) * w) // 9))"
        ps = " + ".join(f"((doc_id * 31 + (3 * {k} + {j}) * 7) % 256)" for j in range(3))
        return f"(({ps}) // 3)"

    return f"""
    WITH d AS (
      SELECT doc_id, 4 + doc_id % 5 AS w, 4 + doc_id % 3 AS h FROM documents
    ),
    bits AS (
      SELECT doc_id, bit,
             CASE WHEN {gray("bit % 8 + 1")} > {gray("bit % 8")}
                  THEN '1' ELSE '0' END AS bv
      FROM d CROSS JOIN (SELECT unnest(range(64)) AS bit)
    )
    SELECT doc_id, string_agg(bv, '' ORDER BY bit) AS dhash
    FROM bits GROUP BY doc_id
    """


@query("multimodal_image_dhash", oracle=_dhash_oracle())
def multimodal_image_dhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual hash of every encoded image, hash-checked end-to-end:
    the oracle recomputes resize + integer grayscale + gradient bits
    from the synthesis formula, so any codec/resize/grayscale bug flips
    the 64-bit string."""
    return image_dhash(image_table(spark, sf_dir))


def _image_neardup_oracle() -> str:
    """The pair stage composed over the dHash oracle: pigeonhole bands,
    the degenerate-bucket cap, candidate equi-join, exact
    character-wise Hamming verify."""
    return f"""
    WITH sigs AS ({_dhash_oracle()}),
    bands AS (
      SELECT doc_id, dhash, b.i AS band_id,
             substring(dhash, b.i * 16 + 1, 16) AS band_key
      FROM sigs CROSS JOIN (SELECT unnest(range(4)) AS i) b
    ),
    keepb AS (
      SELECT band_id, band_key FROM bands
      GROUP BY band_id, band_key
      HAVING count(*) <= {IMAGE_BAND_MAX_BUCKET}
    ),
    b2 AS (SELECT bands.* FROM bands JOIN keepb USING (band_id, band_key)),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
             a.dhash AS ha, b.dhash AS hb
      FROM b2 a JOIN b2 b
        ON a.band_id = b.band_id AND a.band_key = b.band_key
           AND a.doc_id < b.doc_id
    )
    SELECT id_a, id_b, hamming FROM (
      SELECT id_a, id_b,
             CAST(sum(CASE WHEN substring(ha, p.i + 1, 1)
                            <> substring(hb, p.i + 1, 1)
                      THEN 1 ELSE 0 END) AS INT) AS hamming
      FROM cand CROSS JOIN (SELECT unnest(range(64)) AS i) p
      GROUP BY id_a, id_b
    ) WHERE hamming <= 3
    """


@query("multimodal_image_neardup",
       oracle=_image_neardup_oracle(),
       doc="Image near-dup pairs via dHash pigeonhole banding — banding, "
           "candidates and the exact Hamming verify all hash-match the "
           "SQL rebuild composed over the dHash oracle; planted-"
           "perturbation recall additionally in tests/test_image_dedup.py")
def multimodal_image_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate image pairs (Hamming <= 3 on dHash) — banding
    bounds candidates exactly like SimHash text dedup."""
    return image_near_dup_pairs(image_dhash(image_table(spark, sf_dir)))


def _groups_oracle(pair_sql: str) -> str:
    """Transitive closure + canonical election over ANY near-dup pair
    oracle — the dedup_groups_canonical pattern shared by the image,
    video and audio modalities (election: smallest doc_id keeps, a
    total order both engines share)."""
    return f"""
    WITH RECURSIVE pairs AS (
      SELECT id_a, id_b FROM ({pair_sql}) q
    ),
    sym AS (
      SELECT id_a AS s, id_b AS d FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ),
    reach AS (
      SELECT doc_id AS root, doc_id AS node FROM documents
      UNION
      SELECT r.root, sym.d AS node FROM reach r JOIN sym ON r.node = sym.s
    ),
    comp AS (SELECT root AS doc_id, min(node) AS group_id
             FROM reach GROUP BY root)
    SELECT doc_id, group_id,
           CAST(count(*) OVER (PARTITION BY group_id) AS BIGINT)
             AS group_size,
           (doc_id = group_id) AS keep
    FROM comp
    """


def _image_groups_oracle() -> str:
    return _groups_oracle(_image_neardup_oracle())


def dedup_groups_over_pairs(
    spark: SparkSession,
    sf_dir: str,
    pairs: DataFrame,
    nodes: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, group_id, group_size, keep) — near-dup pair list →
    connected components → one canonical doc per duplicate family
    (smallest doc_id keeps). Shared by every media modality. Scale
    shape: the pair graph is dup-rate-sized, so the iterative CC runs
    on edges only; the corpus contributes one membership join; the
    election window partitions by group (bounded by the dup family).
    ``nodes`` (single-column doc-id frame) overrides the default
    `documents` universe — the planted-fixture hook."""
    from pyspark.sql import Window

    from tripl_spark.plans.graph import connected_components
    from tripl_spark.session import load_table

    if nodes is None:
        nodes = load_table(spark, sf_dir, "documents").select(
            F.col("doc_id").alias("node")
        )
    else:
        nodes = nodes.select(F.col(nodes.columns[0]).alias("node"))
    edges = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    comp = connected_components(edges, nodes=nodes).select(
        F.col("node").alias("doc_id"), F.col("comp").alias("group_id")
    )
    w = Window.partitionBy("group_id")
    return comp.select(
        "doc_id",
        "group_id",
        F.count(F.lit(1)).over(w).cast("long").alias("group_size"),
        (F.col("doc_id") == F.col("group_id")).alias("keep"),
    )


@query("multimodal_image_dedup_groups",
       oracle=_image_groups_oracle(),
       doc="image near-dup GROUP resolution: dHash pigeonhole pairs -> "
           "connected components -> one canonical image per family "
           "(smallest doc_id keeps) — banding, Hamming verify, closure "
           "and election all hash-gated vs the recursive-CTE rebuild")
def multimodal_image_dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The keep/drop decision for images, made per duplicate FAMILY
    (near-duplication is transitive in practice) — the
    `dedup_groups_canonical` pattern applied to the perceptual-hash
    modality. Scale shape identical to the text version: the pair
    graph is dup-rate-sized, so the iterative CC runs on edges only;
    the corpus contributes one decode/dhash pass and one final
    membership join; the election window partitions by group (size
    bounded by the dup family)."""
    pairs = image_near_dup_pairs(image_dhash(image_table(spark, sf_dir)))
    return dedup_groups_over_pairs(spark, sf_dir, pairs)


# ---------------------------------------------------------------------------
# Audio fingerprinting (the audio twin of image dHash)
# ---------------------------------------------------------------------------

AUDIO_FP_WINDOWS = 64  # 64-bit fingerprint → four 16-bit bands: 65,536
# keys per band, matching the image dHash band arithmetic. The r11
# 32-bit / 8-bit-band version saturated its 256-key band space on
# UNIFORM corpora (SCALE.md probe: alpha_work 1.96 uncapped), which
# made the bucket cap drop non-degenerate mass at corpus scale; the
# wider key space returns the cap to degenerate-only duty.


def audio_fingerprint(audio: DataFrame) -> DataFrame:
    """(doc_id, fingerprint) — energy-delta signature over DECODED PCM:
    abs samples binned into 64 fixed windows (floor mapping
    w = i*64 // n), bit w set iff energy(w+1 mod 64) > energy(w)
    (wrap-around keeps 64 bits → four 16-bit bands). Robust to uniform
    gain/offset changes the way dHash is robust to brightness."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            fps = []
            for payload in pdf["payload"]:
                _rate, _channels, samples = mc.decode_wav(bytes(payload))
                a = np.abs(samples.astype(np.int64))
                n = len(a)
                idx = (np.arange(n) * AUDIO_FP_WINDOWS) // n
                e = np.bincount(idx, weights=a, minlength=AUDIO_FP_WINDOWS).astype(
                    np.int64
                )
                nxt = np.roll(e, -1)
                fps.append("".join("1" if b else "0" for b in (nxt > e)))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "fingerprint": fps})

    return audio.mapInPandas(op, schema="doc_id long, fingerprint string")


def _audio_fp_oracle() -> str:
    return f"""
    WITH d AS (
      SELECT doc_id, 256 + doc_id % 128 AS n FROM documents
    ),
    s AS (
      SELECT doc_id, n, i,
             abs((doc_id * 131 + i * 17) % 65536 - 32768) AS a
      FROM d CROSS JOIN (SELECT unnest(range(384)) AS i)
      WHERE i < n
    ),
    e AS (
      SELECT doc_id, (i * {AUDIO_FP_WINDOWS}) // n AS w, sum(a) AS energy
      FROM s GROUP BY doc_id, (i * {AUDIO_FP_WINDOWS}) // n
    ),
    bits AS (
      SELECT a.doc_id, a.w,
             CASE WHEN b.energy > a.energy THEN '1' ELSE '0' END AS bv
      FROM e a JOIN e b
        ON a.doc_id = b.doc_id AND b.w = (a.w + 1) % {AUDIO_FP_WINDOWS}
    )
    SELECT doc_id, string_agg(bv, '' ORDER BY w) AS fingerprint
    FROM bits GROUP BY doc_id
    """


@query("multimodal_audio_fingerprint", oracle=_audio_fp_oracle())
def multimodal_audio_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Energy-delta fingerprint of every WAV payload, hash-checked
    end-to-end: the oracle recomputes windowed abs-energy sums and
    delta signs from the sample-synthesis formula."""
    return audio_fingerprint(audio_table(spark, sf_dir))


AUDIO_NEARDUP_MAX_HAMMING = 3
AUDIO_NEARDUP_BANDS = 4
AUDIO_BAND_WIDTH = AUDIO_FP_WINDOWS // AUDIO_NEARDUP_BANDS  # 16 bits
AUDIO_BAND_MAX_BUCKET = 1000  # degenerate band keys (silence, constant
# tones — the audio analog of boilerplate frames) expand quadratically
# in the candidate join; drop them BEFORE pairing, the
# DEFAULT_MAX_BUCKET discipline, replicated in the oracle. With 16-bit
# bands (65,536 keys) the cap is degenerate-ONLY duty: a uniform
# corpus stays under it until buckets average ~1000 members, i.e.
# ~65M clips per band key — the cap no longer drops uniform mass.


def audio_near_dup_pairs(
    fps: DataFrame,
    max_hamming: int = AUDIO_NEARDUP_MAX_HAMMING,
    max_bucket: int | None = AUDIO_BAND_MAX_BUCKET,
) -> DataFrame:
    """(id_a, id_b, hamming) audio near-dup candidates: pigeonhole the
    64 fingerprint bits into 4 x 16-bit bands (any pair within Hamming
    <= 3 agrees on >= 1 whole band), equi-join per band with the
    degenerate-bucket cap, verify exact Hamming JVM-side — candidates
    only, never all-pairs. Band arithmetic now mirrors the image
    dHash's 16-bit bands: 65,536 keys per band keep a uniform corpus's
    buckets tiny, so the cap only fires on content-degenerate classes
    (silence, constant tones) — measured uncapped-uniform alpha_work
    ~= 1 in SCALE.md (vs 1.96 under the old 8-bit keys).

    Same persist/checkpoint lifecycle as image_near_dup_pairs: the
    band relation is consumed three times, so the fingerprint frame is
    persisted for this call only and the small pair result is eagerly
    checkpointed before the cache is released."""
    from pyspark import StorageLevel

    cached = fps.persist(StorageLevel.MEMORY_AND_DISK)
    fps = cached
    bands = fps.select(
        "doc_id", "fingerprint",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("band_id"),
                    F.substring(
                        "fingerprint", i * AUDIO_BAND_WIDTH + 1, AUDIO_BAND_WIDTH
                    ).alias("band_key"),
                )
                for i in range(AUDIO_NEARDUP_BANDS)
            ])
        ).alias("b"),
    ).select("doc_id", "fingerprint", "b.band_id", "b.band_key")
    if max_bucket is not None:
        small = (
            bands.groupBy("band_id", "band_key")
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") <= max_bucket)
            .select("band_id", "band_key")
        )
        bands = bands.join(small, ["band_id", "band_key"])
    a = bands.select(
        F.col("doc_id").alias("id_a"), F.col("fingerprint").alias("ha"),
        "band_id", "band_key",
    )
    b = bands.select(
        F.col("doc_id").alias("id_b"), F.col("fingerprint").alias("hb"),
        "band_id", "band_key",
    )
    cand = (
        a.join(b, ["band_id", "band_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "ha", "hb")
        .distinct()
    )
    hamming = F.aggregate(
        F.zip_with(
            F.split("ha", ""), F.split("hb", ""),
            lambda x, y: F.when(x != y, 1).otherwise(0),
        ),
        F.lit(0),
        lambda s, z: s + z,
    )
    try:
        return (
            cand.withColumn("hamming", hamming)
            .filter(F.col("hamming") <= max_hamming)
            .select("id_a", "id_b", "hamming")
            .transform(eager_checkpoint)
        )
    finally:
        cached.unpersist()


def _audio_neardup_oracle() -> str:
    """The banded pair stage composed over the fingerprint oracle:
    4 x 16-bit pigeonhole bands, the bucket cap, candidate equi-join,
    exact character-wise Hamming verify."""
    return f"""
    WITH sigs AS ({_audio_fp_oracle()}),
    bands AS (
      SELECT doc_id, fingerprint, b.i AS band_id,
             substring(fingerprint, b.i * {AUDIO_BAND_WIDTH} + 1,
                       {AUDIO_BAND_WIDTH}) AS band_key
      FROM sigs CROSS JOIN (SELECT unnest(range({AUDIO_NEARDUP_BANDS})) AS i) b
    ),
    keepb AS (
      SELECT band_id, band_key FROM bands
      GROUP BY band_id, band_key
      HAVING count(*) <= {AUDIO_BAND_MAX_BUCKET}
    ),
    b2 AS (SELECT bands.* FROM bands JOIN keepb USING (band_id, band_key)),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
             a.fingerprint AS ha, b.fingerprint AS hb
      FROM b2 a JOIN b2 b
        ON a.band_id = b.band_id AND a.band_key = b.band_key
           AND a.doc_id < b.doc_id
    )
    SELECT id_a, id_b, hamming FROM (
      SELECT id_a, id_b,
             CAST(sum(CASE WHEN substring(ha, p.i + 1, 1)
                            <> substring(hb, p.i + 1, 1)
                      THEN 1 ELSE 0 END) AS INT) AS hamming
      FROM cand CROSS JOIN (SELECT unnest(range({AUDIO_FP_WINDOWS})) AS i) p
      GROUP BY id_a, id_b
    ) WHERE hamming <= {AUDIO_NEARDUP_MAX_HAMMING}
    """


@query("multimodal_audio_neardup",
       oracle=_audio_neardup_oracle(),
       doc="Audio near-dup pairs via energy-delta fingerprint pigeonhole "
           "banding (4 x 16-bit bands, degenerate-bucket cap) — banding, "
           "cap, candidates and the exact Hamming verify all hash-match "
           "the SQL rebuild composed over the fingerprint oracle; "
           "planted-gain-change recall in tests/test_image_dedup.py")
def multimodal_audio_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate audio pairs (Hamming <= 3 on the 64-bit
    energy-delta fingerprint) — the audio twin of image dHash
    banding; robust to uniform gain/offset edits by construction of
    the fingerprint."""
    return audio_near_dup_pairs(audio_fingerprint(audio_table(spark, sf_dir)))


@query("multimodal_audio_dedup_groups",
       oracle=_groups_oracle(_audio_neardup_oracle()),
       doc="audio near-dup GROUP resolution: fingerprint band pairs -> "
           "connected components -> one canonical clip per family "
           "(smallest doc_id keeps) — banding, cap, Hamming verify, "
           "closure and election all hash-gated vs the recursive-CTE "
           "rebuild")
def multimodal_audio_dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The keep/drop decision for audio clips, made per duplicate
    FAMILY — `dedup_groups_over_pairs` composed over the banded
    fingerprint pair stage; scale shape identical to the image/text
    group resolvers (CC over a dup-rate-sized pair list, one decode/
    fingerprint pass over the corpus)."""
    pairs = audio_near_dup_pairs(audio_fingerprint(audio_table(spark, sf_dir)))
    return dedup_groups_over_pairs(spark, sf_dir, pairs)


# ---------------------------------------------------------------------------
# Video near-dup: per-frame perceptual hashes + shared-frame counting
# ---------------------------------------------------------------------------


def video_frame_dhashes(videos: DataFrame) -> DataFrame:
    """(doc_id, frame_idx, dhash) — the image dHash applied per frame
    of the concatenated-PPM container (1→N mapInPandas: output
    cardinality = total frames)."""

    # container walk (header parse per frame) stays row-wise — that IS
    # the honest decode — but the raster math runs one numpy pass per
    # (w, h) group of the whole batch instead of per frame, and the
    # 64-char bit string is built by byte arithmetic instead of a
    # Python generator join (guide §4.2; the per-frame loop measured
    # ~1.5 ms/frame — ~34 s of task time for the sf0.1 video corpus).
    n_bits = DHASH_H * (DHASH_W - 1)

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas: list[tuple] = []  # (doc_id, frame_idx, w, h, px)
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                for i, (w, h, px) in enumerate(mc.decode_frames(bytes(payload))):
                    metas.append((doc_id, i, w, h, px))
            if not metas:
                yield pd.DataFrame({"doc_id": [], "frame_idx": [], "dhash": []})
                continue
            by_dims: dict[tuple[int, int], list[int]] = {}
            for k, (_, _, w, h, _) in enumerate(metas):
                by_dims.setdefault((w, h), []).append(k)
            hashes: list[str | None] = [None] * len(metas)
            for (w, h), ks in by_dims.items():
                arr = np.frombuffer(
                    b"".join(metas[k][4] for k in ks), dtype=np.uint8
                ).reshape(len(ks), h, w, 3)
                ys = (np.arange(DHASH_H) * h) // DHASH_H
                xs = (np.arange(DHASH_W) * w) // DHASH_W
                small = arr[:, ys][:, :, xs]
                gray = small.astype(np.int64).sum(axis=3) // 3
                bits = (gray[:, :, 1:] > gray[:, :, :-1]).astype(np.uint8)
                chars = (bits.reshape(len(ks), n_bits) + ord("0")).astype(np.uint8)
                flat = chars.tobytes()
                for j, k in enumerate(ks):
                    hashes[k] = flat[j * n_bits:(j + 1) * n_bits].decode("ascii")
            yield pd.DataFrame(
                {
                    "doc_id": [m[0] for m in metas],
                    "frame_idx": [m[1] for m in metas],
                    "dhash": hashes,
                }
            )

    return videos.mapInPandas(op, schema="doc_id long, frame_idx int, dhash string")


def video_near_dup_pairs(
    frame_hashes: DataFrame, min_shared: int = 1, max_bucket: int | None = 1000
) -> DataFrame:
    """(id_a, id_b, n_shared_frames) — video pairs sharing exact frame
    hashes, the shared-span pattern applied to frames: equi-join on the
    frame hash (never all-pairs), count distinct shared hashes per
    pair. At 100 TB the frame-hash table is the only large frame; it
    shuffles once on the 64-bit-equivalent hash key. ``max_bucket``
    drops boilerplate frames (intros/logos/test cards shared by
    thousands of videos) whose buckets would expand quadratically —
    the same degenerate-bucket cap the MinHash LSH path applies. The
    distinct hash frame is persisted for the duration of THIS call —
    the cap scan and both join sides would otherwise re-run the
    per-frame decode — and unpersisted before returning: the (small)
    pair result is eagerly materialized via localCheckpoint, so no
    MEMORY_AND_DISK block outlives the call in a long-lived session
    (gated by tests/test_image_dedup.py)."""
    from pyspark import StorageLevel

    cached = frame_hashes.select("doc_id", "dhash").distinct().persist(
        StorageLevel.MEMORY_AND_DISK
    )
    try:
        fh = cached
        if max_bucket is not None:
            small = (
                fh.groupBy("dhash")
                .agg(F.count(F.lit(1)).alias("_n"))
                .filter(F.col("_n") <= max_bucket)
                .select("dhash")
            )
            fh = fh.join(small, "dhash")
        a = fh.select(F.col("doc_id").alias("id_a"), "dhash")
        b = fh.select(F.col("doc_id").alias("id_b"), "dhash")
        return (
            a.join(b, "dhash")
            .filter(F.col("id_a") < F.col("id_b"))
            .groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).cast("long").alias("n_shared_frames"))
            .filter(F.col("n_shared_frames") >= min_shared)
            .transform(eager_checkpoint)
        )
    finally:
        cached.unpersist()


def _frame_dhash_oracle() -> str:
    """SQL replica of the per-frame pipeline on the frame synthesis
    formula p(j) = (doc_id*31 + frame_idx*13 + j*7) % 256, frames are
    4x4 RGB."""

    def gray(col: str) -> str:
        k = f"(((((bit // 8) * 4) // 8) * 4) + ((({col}) * 4) // 9))"
        ps = " + ".join(
            f"((doc_id * 31 + f * 13 + (3 * {k} + {j}) * 7) % 256)" for j in range(3)
        )
        return f"(({ps}) // 3)"

    return f"""
    WITH v AS (
      SELECT doc_id, unnest(range(1 + doc_id % 8)) AS f FROM documents
    ),
    bits AS (
      SELECT doc_id, f, bit,
             CASE WHEN {gray("bit % 8 + 1")} > {gray("bit % 8")}
                  THEN '1' ELSE '0' END AS bv
      FROM v CROSS JOIN (SELECT unnest(range(64)) AS bit)
    )
    SELECT doc_id, CAST(f AS INT) AS frame_idx,
           string_agg(bv, '' ORDER BY bit) AS dhash
    FROM bits GROUP BY doc_id, f
    """


@query("multimodal_video_frame_dhash", oracle=_frame_dhash_oracle())
def multimodal_video_frame_dhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-frame perceptual hashes of every video container,
    hash-checked end-to-end against the frame synthesis formula
    (container walk + resize + grayscale + gradient bits)."""
    return video_frame_dhashes(video_table(spark, sf_dir))


def _video_neardup_oracle() -> str:
    """Shared-frame pair counting composed over the per-frame dHash
    oracle, including the boilerplate-frame bucket cap."""
    return f"""
    WITH fsigs AS ({_frame_dhash_oracle()}),
    fh AS (SELECT DISTINCT doc_id, dhash FROM fsigs),
    small AS (SELECT dhash FROM fh GROUP BY dhash HAVING count(*) <= 1000),
    fh2 AS (SELECT fh.doc_id, fh.dhash FROM fh JOIN small USING (dhash))
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(count(*) AS BIGINT) AS n_shared_frames
    FROM fh2 a JOIN fh2 b ON a.dhash = b.dhash AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
    HAVING count(*) >= 1
    """


@query("multimodal_video_neardup",
       oracle=_video_neardup_oracle(),
       doc="Video near-dup pairs via shared frame hashes — the distinct "
           "frame table, bucket cap and pair counting all hash-match the "
           "SQL rebuild composed over the frame-dHash oracle; planted "
           "shared-frame recall additionally in tests/test_image_dedup.py")
def multimodal_video_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video pairs sharing >= 1 exact frame hash."""
    return video_near_dup_pairs(video_frame_dhashes(video_table(spark, sf_dir)))


@query("multimodal_video_dedup_groups",
       oracle=_groups_oracle(_video_neardup_oracle()),
       doc="video near-dup GROUP resolution: shared-frame-hash pairs -> "
           "connected components -> one canonical video per family "
           "(smallest doc_id keeps) — frame hashing, bucket cap, pair "
           "counting, closure and election all hash-gated vs the "
           "recursive-CTE rebuild")
def multimodal_video_dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The keep/drop decision for videos, made per duplicate FAMILY —
    a re-encoded or re-cut copy chains to its source through any
    shared frame, and the family election keeps exactly one.

    Scale trick — STAR EDGES, not pair cliques: the video relation is
    "shares ≥ 1 exact (capped) frame hash", so inside a frame-hash
    bucket every member is already connected through the bucket
    itself. Connecting each member to the bucket's MIN doc_id yields
    the identical connected components as the all-pairs clique while
    emitting O(bucket) edges instead of O(bucket²) — at sf0.1 that is
    ~20k star edges vs the 1.28M verified pairs the pair query
    reports, and the CC rounds shrink with them (measured ~2× on the
    whole query). The pair CLIQUE stays what `multimodal_video_neardup`
    emits (pair weights matter there); the closure does not need it.
    The union-find-on-buckets move only applies where membership IS
    the relation — image/audio groups keep their pair paths because a
    band match is just a candidate that still needs the Hamming
    verify. Oracle unchanged: the recursive closure over the verified
    pair list reaches exactly the same components."""
    from pyspark import StorageLevel

    # fh feeds BOTH the bucket aggregate and the star join probe side;
    # unpersisted, each consumer re-ran the full synth+decode+hash
    # Python chain (two 32-task ArrowEvalPython passes, measured ~half
    # the query's task time). Persist for THIS call only: the star
    # edges are materialized inside connected_components' eager edge
    # checkpoint before the cache is released — the same lifecycle
    # contract as video_near_dup_pairs (guide §5 caching rule).
    fh = (
        video_frame_dhashes(video_table(spark, sf_dir))
        .select("doc_id", "dhash")
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    try:
        small = (
            fh.groupBy("dhash")
            .agg(
                F.count(F.lit(1)).alias("_n"),
                F.min("doc_id").alias("root"),
            )
            .filter(F.col("_n") <= 1000)  # the multimodal_video_neardup cap
            .select("dhash", "root")
        )
        stars = (
            fh.join(small, "dhash")
            .filter(F.col("doc_id") != F.col("root"))
            .select(F.col("root").alias("id_a"), F.col("doc_id").alias("id_b"))
            .distinct()
            .transform(eager_checkpoint)
        )
        return dedup_groups_over_pairs(spark, sf_dir, stars)
    finally:
        fh.unpersist()


SCENE_CUT_BITS = 4  # Hamming threshold between consecutive frame hashes


def scene_cuts(frame_hashes: DataFrame, cut_bits: int = SCENE_CUT_BITS) -> DataFrame:
    """(doc_id, frame_idx, hamming, is_cut) for every frame with a
    predecessor: the Hamming distance between consecutive frames'
    perceptual hashes, flagged as a scene cut at ≥ ``cut_bits``.

    Scene detection over dHashes (not pixels) is the scale trick: the
    decode+hash pass already ran for near-dup detection, so cuts cost
    one per-video lag window over 64-char strings — frames per video
    bounds the window partition, the corpus never re-decodes. Cut
    frames are what a frame-sampling curriculum keeps (sample at scene
    boundaries instead of fixed stride)."""
    w = Window.partitionBy("doc_id").orderBy("frame_idx")
    # materialize prev BEFORE the filter: an expression that embeds the
    # lag window would re-evaluate it over the filtered frame and null
    # out each partition's new first row
    ham = F.size(
        F.filter(
            F.zip_with(
                F.split(F.col("dhash"), ""),
                F.split(F.col("prev"), ""),
                lambda a, b: a != b,
            ),
            lambda x: x,
        )
    )
    return (
        frame_hashes.withColumn("prev", F.lag("dhash").over(w))
        .filter(F.col("prev").isNotNull())
        .select(
            "doc_id",
            "frame_idx",
            ham.cast("int").alias("hamming"),
            (ham >= cut_bits).alias("is_cut"),
        )
    )


def _scene_cut_oracle() -> str:
    return f"""
    WITH fh AS ({_frame_dhash_oracle()}),
    lagd AS (
      SELECT doc_id, frame_idx, dhash,
             lag(dhash) OVER (PARTITION BY doc_id ORDER BY frame_idx) AS prev
      FROM fh
    )
    SELECT doc_id, frame_idx,
           CAST(len(list_filter([substring(dhash, i, 1) != substring(prev, i, 1)
                                 for i in range(1, 65)], x -> x)) AS INT) AS hamming,
           len(list_filter([substring(dhash, i, 1) != substring(prev, i, 1)
                            for i in range(1, 65)], x -> x)) >= {SCENE_CUT_BITS}
             AS is_cut
    FROM lagd WHERE prev IS NOT NULL
    """


@query("multimodal_video_scene_cuts", oracle=_scene_cut_oracle())
def multimodal_video_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scene-cut detection per video: consecutive-frame dHash Hamming
    distance with a cut flag — composed over the hash-gated per-frame
    pipeline, so the whole decode → resize → hash → lag → popcount
    chain is oracled end-to-end."""
    return scene_cuts(video_frame_dhashes(video_table(spark, sf_dir)))

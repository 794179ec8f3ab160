"""Multimodal-column plumbing: opaque binary payloads with typed
metadata, processed by Arrow-batched Pandas UDFs over ``mapInPandas``.

The container has no image/audio codecs, so the *decode* step is a
clearly-marked stub (``decode_image`` raises ``NotImplementedError``;
``fake_decode_meta`` is the deterministic stand-in) — but everything
Spark-side is real and tested: the binary column schema, the
``mapInPandas`` batch iteration, the output schema contract, and the
partition behavior. Swap ``fake_decode_meta`` for a real
``PIL.Image.open`` / ``soundfile.read`` call and nothing else changes.

Scale notes: binary payloads ride in parquet as byte arrays; the UDF
processes whole Arrow batches (no per-row pickling); decode-heavy
stages should ``repartition`` first so batches spread across executors
rather than following upstream file boundaries.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tripl_spark.queries.registry import query
from tripl_spark.session import load_table

MEDIA_SCHEMA = (
    "doc_id long, media_type string, payload binary, byte_len long, content_hash string"
)
FEATURE_SCHEMA = (
    "doc_id long, media_type string, byte_len long, content_hash string, "
    "feat_mean double, feat_dim int"
)


def decode_image(payload: bytes) -> "object":
    """Real decoder hook — not available in this container."""
    raise NotImplementedError(
        "image/audio codecs are not installed; production deployments plug "
        "PIL/torchaudio/ffmpeg here — see fake_decode_meta for the contract"
    )


def fake_decode_meta(payload: bytes) -> tuple[float, int]:
    """Deterministic stand-in for decode+feature-extract: derives a
    pseudo-feature (mean byte value scaled) and a fake feature dim from
    the payload bytes. Same signature/shape a real extractor returns."""
    if not payload:
        return (0.0, 0)
    mean = sum(payload[:256]) / min(len(payload), 256) / 255.0
    return (round(mean, 6), 16)


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize a media table from documents: text bytes as the opaque
    payload (stands in for image/audio bytes; the pipeline treats it as
    opaque binary either way)."""
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


def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction: Arrow batches in, feature rows out."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["payload"].map(fake_decode_meta)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "byte_len": pdf["byte_len"],
                    "content_hash": pdf["content_hash"],
                    "feat_mean": feats.map(lambda t: t[0]),
                    "feat_dim": feats.map(lambda t: t[1]),
                }
            )

    return media.mapInPandas(op, schema=FEATURE_SCHEMA)


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


@query("multimodal_features", doc="mapInPandas feature extraction over binary "
                                  "payloads (stubbed decoder; rows-only check)")
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full plumbing: binary column → Arrow batches → (stub) decode →
    feature rows. Python is confined to this one stage by design."""
    return extract_features(media_table(spark, sf_dir))


RESIZED_SCHEMA = (
    "doc_id long, media_type string, width int, height int, payload binary, "
    "content_hash string"
)
FRAME_SCHEMA = "doc_id long, frame_idx int, frame_ts double, frame_payload binary"


def resize_images(media: DataFrame, width: int = 64, height: int = 64) -> DataFrame:
    """Resize plumbing: Arrow batches in, fixed-(width,height) payloads
    out. The stub transform is deterministic — payload bytes are tiled/
    truncated to exactly width×height bytes (a real deployment decodes,
    resamples via PIL/cv2, and re-encodes; schema, batching, and output
    hashing stay identical). One row in, one row out."""

    target = width * height

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def fake_resize(payload: bytes) -> bytes:
                if not payload:
                    payload = b"\x00"
                reps = -(-target // len(payload))  # ceil
                return (bytes(payload) * reps)[:target]

            resized = pdf["payload"].map(fake_resize)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "width": width,
                    "height": height,
                    "payload": resized,
                    "content_hash": resized.map(
                        lambda b: hashlib.md5(b).hexdigest()
                    ),
                }
            )

    return media.mapInPandas(op, schema=RESIZED_SCHEMA)


def sample_frames(media: DataFrame, fps: float = 1.0, max_frames: int = 8) -> DataFrame:
    """Frame-sampling plumbing for video payloads: one input row fans
    out to ≤max_frames rows (frame index, timestamp, frame bytes) — the
    1→N shape a real ffmpeg sampler produces. The stub derives a
    deterministic frame count from payload length and slices the
    payload per frame; ``mapInPandas`` is the right operator because the
    output cardinality differs from the input's (a pandas_udf cannot
    change row counts)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [], "frame_idx": [], "frame_ts": [], "frame_payload": []
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                payload = bytes(payload or b"")
                n = min(max_frames, max(1, len(payload) // 64))
                step = max(1, len(payload) // n)
                for i in range(n):
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["frame_ts"].append(round(i / fps, 3))
                    out["frame_payload"].append(payload[i * step:(i + 1) * step])
            yield pd.DataFrame(out)

    videos = media.filter(F.col("media_type").startswith("audio") == False)  # noqa: E712
    return videos.mapInPandas(op, schema=FRAME_SCHEMA)


@query("multimodal_frame_sample", doc="mapInPandas 1→N frame sampling over binary "
                                      "payloads (stubbed sampler; rows-only check)")
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling registered end-to-end: bounded to doc_id < 200 so
    the fan-out stays small at any SF."""
    media = media_table(spark, sf_dir).filter(F.col("doc_id") < 200)
    return sample_frames(media)

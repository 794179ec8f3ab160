"""Multimodal pipeline contracts over real codecs: schema, cardinality,
determinism across repartitioning, decoded-content correctness."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from tripl_spark.operators import media_codecs as mc
from tripl_spark.operators.multimodal import (
    _image_dims,
    _image_pixels,
    image_table,
    resize_images,
    sample_frames,
    video_table,
)


def test_image_payloads_are_real_encodings(spark, sf_small):
    rows = image_table(spark, sf_small).filter(F.col("doc_id") < 20).collect()
    assert rows
    for r in rows:
        w, h, px = mc.decode_image(bytes(r.payload))
        assert (w, h) == _image_dims(r.doc_id)
        assert px == _image_pixels(r.doc_id)
        assert bytes(r.payload)[:2] == (b"BM" if r.doc_id % 2 == 0 else b"P6")


def test_resize_real_decode_and_deterministic(spark, sf_small):
    images = image_table(spark, sf_small).filter(F.col("doc_id") < 40)
    out = resize_images(images, 16, 16)
    rows = out.collect()
    assert len(rows) == images.count()  # 1→1
    for r in rows:
        w, h, px = mc.decode_image(bytes(r.payload))
        assert (w, h) == (16, 16) and len(px) == 16 * 16 * 3
    # content check on one doc: resize of the known source pixels
    r0 = next(r for r in rows if r.doc_id == 1)
    sw, sh = _image_dims(1)
    expected = mc.resize_nearest(sw, sh, _image_pixels(1), 16, 16)
    assert mc.decode_image(bytes(r0.payload))[2] == expected
    # deterministic under different partitioning (retry/speculation safety)
    again = {
        r.doc_id: r.content_hash
        for r in resize_images(images.repartition(7), 16, 16).collect()
    }
    assert {r.doc_id: r.content_hash for r in rows} == again


def test_frame_sample_fan_out_contract(spark, sf_small):
    videos = video_table(spark, sf_small).filter(F.col("doc_id") < 40)
    frames = sample_frames(videos, fps=2.0, max_frames=4)
    pdf = frames.toPandas()
    assert set(pdf.columns) == {"doc_id", "frame_idx", "frame_ts", "px_mean"}
    per_doc = pdf.groupby("doc_id")["frame_idx"].agg(["min", "max", "count"])
    assert (per_doc["min"] == 0).all()
    assert (per_doc["count"] <= 4).all()
    assert (per_doc["count"] == per_doc["max"] + 1).all()  # contiguous indices
    # frame counts are min(n_frames, max_frames), per the container
    truth = {r.doc_id: min(r.n_frames, 4) for r in videos.collect()}
    assert per_doc["count"].to_dict() == truth
    # decoded per-frame means match the synthesis formula
    j = np.arange(48, dtype=np.int64)
    for row in pdf.itertuples():
        exp = round(float(((row.doc_id * 31 + row.frame_idx * 13 + j * 7) % 256).mean()), 4)
        assert abs(row.px_mean - exp) < 1e-9

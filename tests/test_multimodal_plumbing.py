"""Resize and frame-sample plumbing contracts: schema, cardinality,
determinism across repartitioning."""

from __future__ import annotations

from pyspark.sql import functions as F

from tripl_spark.operators.multimodal import (
    media_table,
    resize_images,
    sample_frames,
)


def test_resize_fixed_dims_and_deterministic(spark, sf_small):
    media = media_table(spark, sf_small, ).filter(F.col("doc_id") < 40)
    out = resize_images(media, 16, 16)
    rows = out.collect()
    assert len(rows) == media.count()  # 1→1
    assert all(len(r.payload) == 256 and r.width == 16 for r in rows)
    # deterministic under different partitioning (retry/speculation safety)
    again = {
        r.doc_id: r.content_hash for r in resize_images(media.repartition(7), 16, 16).collect()
    }
    assert {r.doc_id: r.content_hash for r in rows} == again


def test_frame_sample_fan_out_contract(spark, sf_small):
    media = media_table(spark, sf_small).filter(F.col("doc_id") < 40)
    frames = sample_frames(media, fps=2.0, max_frames=4)
    pdf = frames.toPandas()
    assert set(pdf.columns) == {"doc_id", "frame_idx", "frame_ts", "frame_payload"}
    per_doc = pdf.groupby("doc_id")["frame_idx"].agg(["min", "max", "count"])
    assert (per_doc["min"] == 0).all()
    assert (per_doc["count"] <= 4).all()
    assert (per_doc["count"] == per_doc["max"] + 1).all()  # contiguous indices
    # only the image/video half of the table fans out (audio filtered)
    assert set(pdf.doc_id) == {
        r.doc_id for r in media.filter(F.col("media_type") == "image/png").collect()
    }

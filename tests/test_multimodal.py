"""Multimodal plumbing: schema, batch shape, and flat-map fan-out of the
Arrow-batched media ops (decode is stubbed; the Spark side is real)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from data_pipeline_ine_spark.operators.multimodal import (
    extract_features,
    resize_images,
    sample_frames,
    with_fake_media,
)
from data_pipeline_ine_spark.sources.registry import load_table


def _media_docs(spark, sf_dir, n=50):
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < n)
    return with_fake_media(docs)


def test_extract_features_schema_and_counts(spark, sf_dir):
    out = extract_features(_media_docs(spark, sf_dir))
    assert [f.name for f in out.schema.fields] == [
        "doc_id", "n_bytes", "header_preview", "decode_ok",
    ]
    rows = out.collect()
    assert len(rows) == 50
    assert all(r.decode_ok for r in rows)
    assert all(r.n_bytes > 0 for r in rows)


def test_resize_deterministic_and_sized(spark, sf_dir):
    out = resize_images(_media_docs(spark, sf_dir), target_w=32, target_h=32)
    rows = {r.doc_id: r for r in out.collect()}
    assert len(rows) == 50
    expected = 32 * 32 // 64
    assert all(len(r.resized) == expected for r in rows.values())
    # deterministic: re-run yields identical bytes
    again = {r.doc_id: r for r in resize_images(
        _media_docs(spark, sf_dir), target_w=32, target_h=32).collect()}
    assert all(rows[i].resized == again[i].resized for i in rows)


def test_sample_frames_fan_out(spark, sf_dir):
    docs = _media_docs(spark, sf_dir)
    out = sample_frames(docs, every_n=2, frame_bytes=16)
    pdf = out.toPandas()
    # flat-map: more rows out than docs in, frame_idx stride honored
    assert len(pdf) > 50
    assert (pdf.frame_idx % 2 == 0).all()
    assert pdf.frame.map(len).eq(16).all()
    # per-doc frame count matches ceil((len//16)/2)
    one = docs.filter(F.col("doc_id") == 0).select(F.length("media")).first()[0]
    n_expected = (one // 16 + 1) // 2
    assert (pdf.doc_id == 0).sum() == n_expected

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


def test_decode_media_bytes_real_containers():
    """Driver-side reference decoder against bytes produced by independent
    stdlib writers (wave module, hand-packed PNG/GIF/BMP/JPEG headers)."""
    import io
    import struct
    import wave
    import zlib

    from data_pipeline_ine_spark.operators.multimodal import decode_media_bytes

    # WAV: 16-bit PCM square wave at amplitude 700 -> RMS exactly 700
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(2)
        wf.setsampwidth(2)
        wf.setframerate(22050)
        wf.writeframes(struct.pack("<200h", *([700, -700] * 100)))
    meta = decode_media_bytes(buf.getvalue())
    assert meta["modality"] == "audio/wav" and meta["decode_ok"]
    assert meta["n_channels"] == 2 and meta["sample_rate"] == 22050
    assert meta["n_frames"] == 100  # 200 samples / 2 channels
    assert meta["duration_us"] == 100 * 1_000_000 // 22050
    assert meta["rms"] == 700

    # PNG with a correct IHDR CRC
    ihdr = struct.pack(">IIBBBBB", 640, 480, 8, 2, 0, 0, 0)
    png = (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR" + ihdr
           + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF))
    meta = decode_media_bytes(png)
    assert meta == {
        "modality": "image/png", "decode_ok": True, "width": 640,
        "height": 480, "n_channels": 3, "sample_rate": None,
        "n_frames": None, "duration_us": None, "rms": None,
    }
    # corrupted CRC must be rejected, not trusted
    bad = bytearray(png)
    bad[-1] ^= 0xFF
    assert not decode_media_bytes(bytes(bad))["decode_ok"]

    # GIF / BMP headers
    gif = b"GIF89a" + struct.pack("<HH", 12, 34) + b"\x00\x00\x00\x3b"
    assert decode_media_bytes(gif)["width"] == 12
    assert decode_media_bytes(gif)["height"] == 34
    bmp = b"BM" + bytes(16) + struct.pack("<ii", 55, -66) + bytes(10)
    m = decode_media_bytes(bmp)
    assert (m["width"], m["height"]) == (55, 66)  # top-down height negated

    # JPEG: APP0 segment then SOF0 frame header
    app0 = b"\xff\xe0" + struct.pack(">H", 4) + b"JF"
    sof0 = b"\xff\xc0" + struct.pack(">H", 11) + b"\x08" + struct.pack(
        ">HH", 33, 44) + b"\x03" + bytes(4)
    m = decode_media_bytes(b"\xff\xd8" + app0 + sof0)
    assert (m["modality"], m["width"], m["height"], m["n_channels"]) == (
        "image/jpeg", 44, 33, 3)

    # MP4: ftyp + moov(mvhd + trak(tkhd))
    def box(t, body):
        return struct.pack(">I", 8 + len(body)) + t + body

    mvhd = box(b"mvhd", bytes(12) + struct.pack(">II", 1000, 5500) + bytes(80))
    tkhd = box(b"tkhd", b"\x00\x00\x00\x07" + bytes(72)
               + struct.pack(">II", 320 << 16, 240 << 16))
    mp4 = box(b"ftyp", b"isom") + box(b"moov", mvhd + box(b"trak", tkhd))
    m = decode_media_bytes(mp4)
    assert (m["modality"], m["width"], m["height"]) == ("video/mp4", 320, 240)
    assert m["duration_us"] == 5500 * 1_000_000 // 1000

    # garbage and truncated containers fail soft
    assert not decode_media_bytes(b"")["decode_ok"]
    assert not decode_media_bytes(b"\x89PNG\r\n\x1a\n\x00")["decode_ok"]
    assert not decode_media_bytes(b"RIFFxxxxWAVEjunk")["decode_ok"]
    assert not decode_media_bytes(b"\x00\x00\x00\x08ftyp")["decode_ok"]


def test_synthetic_media_roundtrip_spark(spark, sf_dir):
    """Spark encode→decode round-trip: every decoded field matches the
    generator's closed form (the media_decode oracle contract)."""
    from data_pipeline_ine_spark.operators.multimodal import (
        decode_media,
        with_synthetic_media,
    )

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 60
    ).select("doc_id", F.coalesce("n_chars", F.lit(0)).alias("n_chars"))
    base = {r.doc_id: r.n_chars for r in docs.collect()}
    out = {r.doc_id: r for r in decode_media(with_synthetic_media(docs)).collect()}
    assert len(out) == len(base)
    for i, n in base.items():
        r = out[i]
        assert r.decode_ok, i
        if i % 4 == 0:
            assert (r.modality, r.width, r.height, r.n_channels) == (
                "image/png", 16 + i % 32, 8 + i % 16, 1)
        elif i % 4 == 1:
            assert (r.modality, r.width, r.height) == (
                "image/gif", 4 + i % 64, 4 + i % 32)
        elif i % 4 == 2:
            rate = 8000 + ((i // 4) % 4) * 4000
            nf = 400 + n % 600
            assert (r.modality, r.sample_rate, r.n_frames) == (
                "audio/wav", rate, nf)
            assert r.duration_us == nf * 1_000_000 // rate
            assert r.rms == 1000 + i % 5000
        else:
            ts = 600 * (1 + i % 5)
            dur = 1000 + n % 9000
            assert (r.modality, r.width, r.height) == (
                "video/mp4", 160 + (i % 8) * 40, 120 + (i % 6) * 40)
            assert r.duration_us == dur * 1_000_000 // ts


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

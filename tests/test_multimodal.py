"""Multimodal: Arrow-batched media ops — metadata tier (container
parsing), REAL pixel tier (PNG/BMP raster decode, integer-exact resize,
FFT spectrogram — operators/pixels.py), and the flat-map frame stub."""

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


def test_resize_real_raster_roundtrip(spark, sf_dir):
    """REAL resize: PNG and GIF blobs pixel-decode, nearest-resample,
    re-encode — the output must itself decode to the target raster with
    exactly the pixels integer index mapping predicts; non-image
    modalities (WAV/MP4) come back resize_ok=false."""
    import numpy as np

    from data_pipeline_ine_spark.operators.multimodal import (
        with_synthetic_media,
    )
    from data_pipeline_ine_spark.operators.pixels import (
        decode_raster,
        png_decode,
        resize_nearest,
    )

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 40
    ).select("doc_id", F.coalesce("n_chars", F.lit(0)).alias("n_chars"))
    media = with_synthetic_media(docs)
    out = {r.doc_id: r for r in resize_images(media, 32, 24).collect()}
    assert len(out) == 40
    blobs = {r.doc_id: bytes(r.media) for r in media.collect()}
    for i, r in out.items():
        if i % 4 in (0, 1):  # PNG (gray) / GIF (palette RGB via LZW)
            assert r.resize_ok
            dec = png_decode(bytes(r.resized))
            channels = 1 if i % 4 == 0 else 3
            assert dec is not None and dec.shape == (24, 32, channels)
            src = decode_raster(blobs[i])
            assert np.array_equal(dec, resize_nearest(src, 32, 24))
        else:  # WAV/MP4 aren't images; video demux stays env-gated
            assert not r.resize_ok and r.resized is None
    # bit-deterministic re-run
    again = {r.doc_id: r for r in resize_images(media, 32, 24).collect()}
    assert all(
        (out[i].resized is None and again[i].resized is None)
        or bytes(out[i].resized) == bytes(again[i].resized)
        for i in out
    )


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


# ---------------------------------------------------------------------------
# pixel tier (operators/pixels.py): pure-codec correctness
# ---------------------------------------------------------------------------
def _adversarial_png(filters, arr):
    """Encode arr as a PNG using the GIVEN per-row filter types — forces
    the decoder to reverse Sub/Up/Average/Paeth, not just filter 0."""
    import struct
    import zlib

    import numpy as np

    h, w, c = arr.shape
    out_rows = []
    prev = np.zeros(w * c, np.int16)
    for y in range(h):
        row = arr[y].reshape(-1).astype(np.int16)
        f = filters[y % len(filters)]
        bpp = c
        enc = row.copy()
        if f == 1:
            for x in range(w * c - 1, bpp - 1, -1):
                enc[x] = (enc[x] - row[x - bpp]) & 0xFF
        elif f == 2:
            enc = (row - prev) & 0xFF
        elif f == 3:
            for x in range(w * c):
                left = row[x - bpp] if x >= bpp else 0
                enc[x] = (enc[x] - ((int(left) + int(prev[x])) >> 1)) & 0xFF
        elif f == 4:
            for x in range(w * c):
                a_ = int(row[x - bpp]) if x >= bpp else 0
                c_ = int(prev[x - bpp]) if x >= bpp else 0
                b_ = int(prev[x])
                p = a_ + b_ - c_
                pa, pb, pc = abs(p - a_), abs(p - b_), abs(p - c_)
                pred = a_ if (pa <= pb and pa <= pc) else (b_ if pb <= pc else c_)
                enc[x] = (enc[x] - pred) & 0xFF
        out_rows.append(bytes([f]) + bytes(enc.astype(np.uint8)))
        prev = row

    def chunk(tag, body):
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, {1: 0, 2: 4, 3: 2, 4: 6}[c], 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(b"".join(out_rows)))
            + chunk(b"IEND", b""))


def test_png_codec_roundtrip_all_channel_counts():
    import numpy as np

    from data_pipeline_ine_spark.operators.pixels import png_decode, png_encode

    rng = np.random.RandomState(7)
    for shape in [(8, 5), (6, 7, 3), (4, 4, 4), (3, 9, 2)]:
        a = rng.randint(0, 256, size=shape).astype(np.uint8)
        dec = png_decode(png_encode(a))
        want = a if a.ndim == 3 else a[:, :, None]
        assert dec is not None and np.array_equal(dec, want), shape


def test_png_decoder_reverses_all_five_filters():
    import numpy as np

    from data_pipeline_ine_spark.operators.pixels import png_decode

    rng = np.random.RandomState(11)
    a = rng.randint(0, 256, size=(10, 6, 3)).astype(np.uint8)
    for filt in ([1], [2], [3], [4], [0, 1, 2, 3, 4]):
        dec = png_decode(_adversarial_png(filt, a))
        assert dec is not None and np.array_equal(dec, a), filt


def test_png_decode_rejects_garbage():
    from data_pipeline_ine_spark.operators.pixels import png_decode

    assert png_decode(b"") is None
    assert png_decode(b"\x89PNG\r\n\x1a\n" + b"\x00" * 20) is None
    # valid signature, truncated IDAT
    from data_pipeline_ine_spark.operators.pixels import png_encode
    import numpy as np

    good = png_encode(np.zeros((4, 4), np.uint8))
    assert png_decode(good[:40]) is None


def test_bmp_decode_bottom_up_and_padding():
    import struct

    import numpy as np

    from data_pipeline_ine_spark.operators.pixels import bmp_decode

    rng = np.random.RandomState(3)
    a = rng.randint(0, 256, size=(5, 7, 3)).astype(np.uint8)  # w=7: stride pad
    h, w, _ = a.shape
    stride = (w * 3 + 3) & ~3
    rows = b"".join(
        bytes(a[y][:, ::-1].reshape(-1)) + bytes(stride - w * 3)
        for y in range(h - 1, -1, -1)
    )
    off = 54
    hdr = b"BM" + struct.pack("<IHHI", off + len(rows), 0, 0, off)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(rows),
                      2835, 2835, 0, 0)
    dec = bmp_decode(hdr + dib + rows)
    assert dec is not None and np.array_equal(dec, a)


def test_spectrogram_square_wave_peaks_at_nyquist():
    import numpy as np

    from data_pipeline_ine_spark.operators.pixels import dominant_bin

    s = np.empty(1024, dtype=np.int16)
    s[0::2], s[1::2] = 2000, -2000
    assert dominant_bin(s, 256) == (128, 4)
    # a slow alternation (period 8) peaks at bin n_fft/8
    t = np.repeat(np.tile(np.array([1500, -1500], np.int16), 128), 4)
    assert dominant_bin(t, 256) == (32, 4)


def test_image_pixel_stats_spark(spark, sf_dir):
    from data_pipeline_ine_spark.operators.multimodal import (
        image_pixel_stats,
        with_synthetic_media,
    )

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 20
    ).select("doc_id", F.coalesce("n_chars", F.lit(0)).alias("n_chars"))
    out = {r.doc_id: r for r in image_pixel_stats(
        with_synthetic_media(docs)).collect()}
    # PNG (id%4==0) and GIF (id%4==1) docs are pixel-decodable
    assert set(out) == {i for i in range(20) if i % 4 in (0, 1)}
    for i, r in out.items():
        if i % 4 == 0:
            w, h, c = 16 + i % 32, 8 + i % 16, 1
        else:
            w, h, c = 4 + i % 64, 4 + i % 32, 3
        assert (r.width, r.height, r.n_channels) == (w, h, c)
        assert r.pixel_sum == c * sum(
            (x + y + i) % 256 for x in range(w) for y in range(h)
        )


def test_gif_decode_real_lzw_stream():
    """gif_decode against a GENUINELY COMPRESSING LZW encoder (dictionary
    growth + width escalation + table-full clears), not just the
    fixed-width clear-per-code stream the synthetic generator emits."""
    import struct

    import numpy as np

    from data_pipeline_ine_spark.operators.pixels import gif_decode, lzw_encode

    def make_gif(w, h, idx):
        gct = bytes(k for v in range(256) for k in (v, v, v))
        head = (b"GIF89a" + struct.pack("<HH", w, h) + b"\xf7\x00\x00"
                + gct + b"\x2c" + struct.pack("<HHHH", 0, 0, w, h)
                + b"\x00\x08")
        stream = lzw_encode(idx, 8)
        blocks = b"".join(
            bytes([len(stream[p:p + 255])]) + bytes(stream[p:p + 255])
            for p in range(0, len(stream), 255)
        )
        return head + blocks + b"\x00\x3b"

    rng = np.random.RandomState(1)
    idx = list(rng.randint(0, 256, size=40 * 30))
    arr = gif_decode(make_gif(40, 30, idx))
    assert arr is not None and arr.shape == (30, 40, 3)
    assert list(arr[:, :, 0].reshape(-1)) == idx
    # repetitive raster drives heavy dictionary growth
    idx = ([7] * 900 + [1, 2] * 300 + list(range(64)) * 10)[: 40 * 30]
    arr = gif_decode(make_gif(40, 30, idx))
    assert arr is not None and list(arr[:, :, 0].reshape(-1)) == idx
    # garbage rejection
    assert gif_decode(b"GIF89a\x00") is None
    assert gif_decode(b"") is None


# ---------------------------------------------------------------------------
# baseline JPEG codec (operators/pixels.py)
# ---------------------------------------------------------------------------
def test_jpeg_decode_hand_assembled_spec_vector():
    """Decoder vs a BY-HAND bitstream (independent of our encoder): one
    8x8 grayscale block, uniform Q=16, flat value 136. DC coefficient
    8*(136-128)=64 quantizes to 4 (category 3, code '100' in the
    standard DC-luma table, magnitude bits '100'), EOB is '1010' in the
    standard AC-luma table; 1-padded to two bytes = 0x92 0xBF. Any
    zigzag/Huffman/dequant/IDCT-scaling bug breaks the exact 136."""
    import struct

    import numpy as np

    from data_pipeline_ine_spark.operators.pixels import (
        _STD_AC_LUMA,
        _STD_DC_LUMA,
        jpeg_decode,
    )

    def seg(marker, body):
        return marker + struct.pack(">H", len(body) + 2) + body

    dqt = seg(b"\xff\xdb", bytes([0]) + bytes([16] * 64))
    sof = seg(b"\xff\xc0", bytes([8]) + struct.pack(">HH", 8, 8)
              + bytes([1, 1, 0x11, 0]))
    dht = seg(b"\xff\xc4", bytes([0x00] + _STD_DC_LUMA[0] + _STD_DC_LUMA[1])) \
        + seg(b"\xff\xc4", bytes([0x10] + _STD_AC_LUMA[0] + _STD_AC_LUMA[1]))
    sos = seg(b"\xff\xda", bytes([1, 1, 0x00, 0, 63, 0]))
    jpg = b"\xff\xd8" + dqt + sof + dht + sos + bytes([0x92, 0xBF]) + b"\xff\xd9"
    dec = jpeg_decode(jpg)
    assert dec is not None and dec.shape == (8, 8, 1)
    assert np.array_equal(dec, np.full((8, 8, 1), 136, np.uint8))


def test_jpeg_roundtrip_error_is_quantization_bounded():
    import numpy as np

    from data_pipeline_ine_spark.operators.pixels import jpeg_decode, jpeg_encode

    flat = np.full((16, 24), 130, np.uint8)
    dec = jpeg_decode(jpeg_encode(flat, quality=90))
    assert np.array_equal(dec[:, :, 0], flat)  # DC-only: exact

    smooth = np.fromfunction(
        lambda y, x: (x * 3 + y * 2) % 200 + 20, (32, 40)
    ).astype(np.uint8)
    dec = jpeg_decode(jpeg_encode(smooth, quality=95))
    assert int(np.abs(dec[:, :, 0].astype(int) - smooth.astype(int)).max()) <= 2

    rgb = np.dstack([smooth, smooth[::-1], np.full_like(smooth, 99)])
    dec = jpeg_decode(jpeg_encode(rgb, quality=95))
    assert dec.shape == rgb.shape
    # chroma rotation adds a few levels; still tightly bounded at q95
    assert int(np.abs(dec.astype(int) - rgb.astype(int)).max()) <= 12

    rng = np.random.RandomState(0)
    noise = rng.randint(0, 256, (16, 16), dtype=np.uint8)
    dec = jpeg_decode(jpeg_encode(noise, quality=95))
    assert int(np.abs(dec[:, :, 0].astype(int) - noise.astype(int)).max()) <= 8


def test_jpeg_restart_markers_and_dispatch():
    import numpy as np

    from data_pipeline_ine_spark.operators.pixels import (
        decode_raster,
        jpeg_decode,
        jpeg_encode,
    )

    g = np.fromfunction(
        lambda y, x: (x * 5 + y * 3) % 200 + 20, (40, 56)
    ).astype(np.uint8)
    plain = jpeg_decode(jpeg_encode(g, quality=92))
    for ri in (1, 2, 5):
        rst = jpeg_decode(jpeg_encode(g, quality=92, restart_interval=ri))
        assert np.array_equal(rst, plain)  # restarts change bytes, not pixels
    assert decode_raster(jpeg_encode(g)) is not None  # dispatch covers JPEG
    # progressive and corrupt streams are rejected, not misdecoded
    assert jpeg_decode(b"\xff\xd8\xff\xc2\x00\x04\x08\x00") is None
    assert jpeg_decode(b"\xff\xd8junk") is None
    assert jpeg_decode(b"") is None


def test_demux_video_frames_real_mjpeg(spark):
    """REAL video demux end to end: MJPEG-AVI blobs -> every_n frame
    JPEGs -> pixel decode, all with the in-repo codec stack."""
    import numpy as np

    from data_pipeline_ine_spark.operators.multimodal import (
        demux_video_frames,
        image_pixel_stats,
    )
    from data_pipeline_ine_spark.operators.pixels import (
        avi_mjpeg_encode,
        jpeg_decode,
    )

    def clip(doc_id, n_frames):
        frames = [
            np.full((16, 24), 30 + 10 * (doc_id + k), np.uint8)
            for k in range(n_frames)
        ]
        return (doc_id, bytearray(avi_mjpeg_encode(frames, quality=92)))

    rows = [clip(1, 6), clip(2, 3), (3, bytearray(b"not a video"))]
    df = spark.createDataFrame(rows, "doc_id long, media binary")
    out = demux_video_frames(df, every_n=2).collect()
    got = {(r.doc_id, r.frame_idx) for r in out}
    assert got == {(1, 0), (1, 2), (1, 4), (2, 0), (2, 2)}
    for r in out:
        dec = jpeg_decode(bytes(r.frame))
        assert dec is not None and dec.shape == (16, 24, 1)
        assert int(dec[0, 0, 0]) == 30 + 10 * (r.doc_id + r.frame_idx)

    # frames compose with the pixel-stats operator (JPEG dispatch)
    frames_df = demux_video_frames(df, every_n=2).select(
        (F.col("doc_id") * 100 + F.col("frame_idx")).alias("doc_id"),
        F.col("frame").alias("media"),
    )
    stats = image_pixel_stats(frames_df).collect()
    assert len(stats) == 5
    assert all(s.width == 24 and s.height == 16 for s in stats)


def test_jpeg_420_subsampling_roundtrip():
    """4:2:0 — the dominant real-world JPEG layout: 2x2 luma blocks per
    MCU, mean-downsampled chroma, replication upsample on decode.
    Grayscale-content RGB has FLAT chroma, so downsampling is lossless
    and the error stays luma-quantization-bounded; colored images get a
    slightly looser chroma-smoothing bound; restart markers and
    non-16-multiple dimensions must not disturb pixels."""
    import numpy as np

    from data_pipeline_ine_spark.operators.pixels import jpeg_decode, jpeg_encode

    g = np.fromfunction(
        lambda y, x: (x * 3 + y * 2) % 200 + 20, (30, 42)
    ).astype(np.uint8)
    gray_rgb = np.dstack([g, g, g])
    dec = jpeg_decode(jpeg_encode(gray_rgb, quality=95, subsampling="420"))
    assert dec.shape == gray_rgb.shape
    assert int(np.abs(dec.astype(int) - gray_rgb.astype(int)).max()) <= 2

    color = np.dstack([g, g[::-1], np.full_like(g, 99)])
    dec = jpeg_decode(jpeg_encode(color, quality=95, subsampling="420"))
    assert int(np.abs(dec.astype(int) - color.astype(int)).max()) <= 12

    plain = jpeg_decode(jpeg_encode(color, quality=95, subsampling="420"))
    rst = jpeg_decode(
        jpeg_encode(color, quality=95, subsampling="420", restart_interval=2)
    )
    assert np.array_equal(rst, plain)

    odd = color[:29, :41]
    dec = jpeg_decode(jpeg_encode(odd, quality=95, subsampling="420"))
    assert dec.shape == odd.shape
    assert int(np.abs(dec.astype(int) - odd.astype(int)).max()) <= 12


def test_png_indexed_color_decodes_through_palette():
    import struct
    import zlib

    import numpy as np

    from data_pipeline_ine_spark.operators.pixels import png_decode

    rng = np.random.RandomState(2)
    pal = rng.randint(0, 256, (256, 3)).astype(np.uint8)
    idx = rng.randint(0, 256, (9, 13)).astype(np.uint8)

    def chunk(tag, body):
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", 13, 9, 8, 3, 0, 0, 0)
    raw = b"".join(b"\x00" + bytes(idx[y]) for y in range(9))
    png = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
           + chunk(b"PLTE", bytes(pal.reshape(-1)))
           + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
    dec = png_decode(png)
    assert dec is not None and dec.shape == (9, 13, 3)
    assert np.array_equal(dec, pal[idx.astype(np.int32)])
    # indexed stream without its palette is corrupt, not misdecoded
    bad = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
           + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
    assert png_decode(bad) is None


def test_dhash_resize_and_reencode_invariant():
    """The perceptual property that makes dHash a dedup signature: the
    same image content hashes identically across (a) a lossless
    re-encode and (b) an integer upscale; a materially different image
    lands far away in Hamming distance."""
    import numpy as np

    from data_pipeline_ine_spark.operators.pixels import (
        dhash_bits,
        png_decode,
        png_encode,
    )

    rng = np.random.RandomState(7)
    base = rng.randint(0, 256, size=(32, 48), dtype=np.uint8)
    arr = base[:, :, None]                      # h, w, 1
    h0 = dhash_bits(arr)

    # (a) PNG round-trip: decode(encode(x)) is bit-identical -> same hash
    assert dhash_bits(png_decode(png_encode(base))) == h0

    # (b) exact 2x nearest upscale samples back to the same grid
    up = np.repeat(np.repeat(base, 2, axis=0), 2, axis=1)[:, :, None]
    assert dhash_bits(up) == h0

    # (c) a different random image differs in many bits
    other = rng.randint(0, 256, size=(32, 48), dtype=np.uint8)[:, :, None]
    hi1, lo1 = dhash_bits(other)
    ham = bin((hi1 ^ h0[0])).count("1") + bin((lo1 ^ h0[1])).count("1")
    assert ham > 10


def test_image_dhash_spark_groups_duplicates(spark, sf_dir):
    """End-to-end over synthetic media: gradient rasters with equal
    (size, id mod 256) are pixel-identical, so their dHashes collide —
    the grouping a vision dedup pass keys on."""
    import pyspark.sql.functions as F

    from data_pipeline_ine_spark.operators.multimodal import (
        image_dhash,
        with_synthetic_media,
    )
    from data_pipeline_ine_spark.sources.registry import load_table

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.coalesce("n_chars", F.lit(0)).alias("n_chars"))
        .filter(F.col("doc_id") % 4 == 0)       # PNG modality
        .limit(200)
    )
    hashed = image_dhash(with_synthetic_media(docs))
    rows = hashed.collect()
    assert rows and all(
        r["dhash_hi"] >= 0 and r["dhash_lo"] >= 0 for r in rows
    )
    by_id = {r["doc_id"]: (r["dhash_hi"], r["dhash_lo"]) for r in rows}
    # doc 0 and doc 256 share w,h (id%32 equal) and raster (id%256 equal)
    if 0 in by_id and 256 in by_id:
        assert by_id[0] == by_id[256]


def test_video_signature_groups_content_duplicates(spark, sf_dir):
    """Videos with identical frame content (same generator class) share
    a signature; any differing frame splits them. Classes follow the
    generator's closed form, so dup groups are predictable."""
    import pyspark.sql.functions as F

    from data_pipeline_ine_spark.operators.multimodal import (
        video_signature,
        with_synthetic_video,
    )
    from data_pipeline_ine_spark.sources.registry import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id").limit(120)
    sigs = video_signature(with_synthetic_video(docs), every_n=2)
    rows = {r["doc_id"]: r for r in sigs.collect()}
    assert rows  # every doc produced a signature
    # generator law: content class = (id mod 200 for frame values,
    # id mod 4 for count) -> id and id+200 with equal id%4 share frames
    if 0 in rows and 200 in rows:
        assert rows[0]["video_sig"] == rows[200]["video_sig"]
    if 0 in rows and 1 in rows:
        assert rows[0]["video_sig"] != rows[1]["video_sig"]
    # sampled count follows ceil(n_frames / 2) of n = 2 + id % 4
    for i, r in rows.items():
        assert r["n_frames_sampled"] == (2 + i % 4 + 1) // 2


def test_audio_signature_distinguishes_and_repeats(spark, sf_dir):
    """Audio signatures: deterministic across invocations, sensitive to
    content (different rate/amplitude/length -> different sig), and
    computed only for WAV-modality docs."""
    import pyspark.sql.functions as F

    from data_pipeline_ine_spark.operators.multimodal import (
        audio_signature,
        with_synthetic_media,
    )
    from data_pipeline_ine_spark.sources.registry import load_table

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.coalesce("n_chars", F.lit(0)).alias("n_chars"))
        .limit(100)
    )
    media = with_synthetic_media(docs)
    a = {r["doc_id"]: r["audio_sig"] for r in audio_signature(media).collect()}
    b = {r["doc_id"]: r["audio_sig"] for r in audio_signature(media).collect()}
    assert a == b and a
    assert all(i % 4 == 2 for i in a)            # WAV modality only
    assert len(set(a.values())) > 1              # content-sensitive


def test_image_augment_dhash_group_laws(spark):
    """Augmentation sanity via group structure: flipping a SYMMETRIC
    raster (gradient g(x,y)=x+y is fliph-asymmetric, so hashes differ
    from identity) — we pin instead that the augmented dims are right
    (rot90 swaps, fliph preserves) and that a horizontally-CONSTANT
    raster is fliph-invariant (every row constant → flip is identity →
    dHash all zeros both ways)."""
    import numpy as np

    from data_pipeline_ine_spark.operators import pixels
    from data_pipeline_ine_spark.operators.multimodal import (
        image_augment_dhash,
    )

    # constant-rows raster: value depends only on the ROW index
    arr = np.zeros((8, 16, 3), dtype=np.uint8)
    for r in range(8):
        arr[r, :, :] = (7 - r) * 10  # rows DECREASE downward, so the
        # clockwise rotation turns them into left-to-right INCREASING
        # columns (dHash sets bits only on increasing adjacent pairs)
    png = pixels.png_encode(arr)
    df = spark.createDataFrame([(1, bytearray(png))], "doc_id long, media binary")
    out = {r.aug: r for r in image_augment_dhash(df).collect()}
    f, r90 = out["fliph"], out["rot90"]
    assert (f.width, f.height) == (16, 8)
    assert (r90.width, r90.height) == (8, 16)
    # horizontally constant → no adjacent-column differences → zero hash
    assert (f.dhash_hi, f.dhash_lo) == (0, 0)
    # rotated, rows become columns: every adjacent-column pair differs;
    # bit set iff the increasing direction — nonzero hash
    assert (r90.dhash_hi, r90.dhash_lo) != (0, 0)

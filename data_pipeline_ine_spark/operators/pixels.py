"""Pixel-level raster/audio codecs — standard library + numpy ONLY.

This is the REAL pixel tier the metadata tier (`multimodal.py`) points
at: full PNG raster decode (zlib inflate + scanline un-filtering per the
PNG spec's five filter types), uncompressed-BMP decode, deterministic
nearest-neighbor resize, PNG re-encode, and FFT spectrogram features for
PCM audio. No PIL/libjpeg/ffmpeg anywhere — PNG's entropy layer is zlib
(stdlib), its prediction filters are pure integer arithmetic, and GIF's
LZW is self-contained enough to implement directly (``_lzw_decode`` /
``lzw_encode`` below), so complete decoders need nothing the sandbox
lacks. Only JPEG raster (DCT + Huffman) and video-frame demux remain in
the env-gated stub tier.

Determinism notes (these functions feed oracle-checked queries):
- resize uses INTEGER index mapping ``src = (dst_i * src_n) // dst_n``
  — no float rounding anywhere, same pixels on every platform.
- spectrogram DOMINANT-BIN selection is an argmax over FFT magnitudes;
  the magnitudes are floats but the argmax of a clearly-peaked spectrum
  is stable; only integer outputs (bin index, window count) ever enter
  a correctness surface.

The module registers itself with cloudpickle BY VALUE (the
``pydatasource.py`` discipline): executors never import this repo, so
any ``mapInPandas`` closure capturing these functions must carry their
bytecode along.
"""

from __future__ import annotations

import struct
import sys
import zlib

import numpy as np

try:
    from pyspark import cloudpickle
except ImportError:  # pragma: no cover - import-layout fallback
    import pyspark.cloudpickle as cloudpickle  # type: ignore[no-redef]
cloudpickle.register_pickle_by_value(sys.modules[__name__])

PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def png_decode(b: bytes) -> np.ndarray | None:
    """Full PNG raster decode → ``(h, w, channels)`` uint8 array, or
    None for non-PNG / unsupported variants (palette color, bit depths
    other than 8, interlacing) / corrupt streams.

    Scanline reconstruction implements all five spec filters. Filter 0
    (None) and 2 (Up) are fully vectorized; Sub/Average/Paeth carry a
    sequential data dependency along x by definition, so those rows run
    a per-byte loop — encoders targeting this pipeline (``png_encode``)
    emit filter 0, keeping the hot path vectorized.
    """
    if b[:8] != PNG_SIG:
        return None
    pos, w = 8, None
    h = depth = ctype = interlace = None
    idat = []
    try:
        while pos + 8 <= len(b):
            (ln,) = struct.unpack(">I", b[pos : pos + 4])
            tag = b[pos + 4 : pos + 8]
            body = b[pos + 8 : pos + 8 + ln]
            if len(body) != ln:
                return None
            if tag == b"IHDR":
                w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(
                    ">IIBBBBB", body
                )
            elif tag == b"IDAT":
                idat.append(body)
            elif tag == b"IEND":
                break
            pos += 12 + ln  # len + tag + body + crc
        if w is None or depth != 8 or interlace != 0:
            return None
        channels = _PNG_CHANNELS.get(ctype)
        if channels is None:
            return None
        raw = zlib.decompress(b"".join(idat))
    except (struct.error, zlib.error):
        return None
    stride = w * channels
    if len(raw) != (stride + 1) * h:
        return None
    rows = np.frombuffer(raw, np.uint8).reshape(h, stride + 1)
    filters = rows[:, 0]
    data = rows[:, 1:].astype(np.int16)
    out = np.zeros((h, stride), np.uint8)
    bpp = channels
    for y in range(h):
        f = int(filters[y])
        prior = out[y - 1].astype(np.int16) if y else np.zeros(stride, np.int16)
        row = data[y].copy()
        if f == 0:
            rec = row
        elif f == 2:
            rec = row + prior
        elif f == 1:
            rec = row
            for x in range(bpp, stride):
                rec[x] = (rec[x] + rec[x - bpp]) & 0xFF
        elif f == 3:
            rec = row
            for x in range(stride):
                left = rec[x - bpp] if x >= bpp else 0
                rec[x] = (rec[x] + ((int(left) + int(prior[x])) >> 1)) & 0xFF
        elif f == 4:
            rec = row
            for x in range(stride):
                a = int(rec[x - bpp]) if x >= bpp else 0
                c = int(prior[x - bpp]) if x >= bpp else 0
                up = int(prior[x])
                p = a + up - c
                pa, pb, pc = abs(p - a), abs(p - up), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (up if pb <= pc else c)
                rec[x] = (rec[x] + pred) & 0xFF
        else:
            return None
        out[y] = (rec & 0xFF).astype(np.uint8)
    return out.reshape(h, w, channels)


def png_encode(arr: np.ndarray) -> bytes:
    """Minimal spec-correct PNG encoder: 8-bit, filter 0 per scanline,
    one zlib IDAT. Accepts ``(h, w)`` or ``(h, w, c)`` with c in
    {1, 2, 3, 4}."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[c]

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    body = b"".join(
        b"\x00" + arr[y].astype(np.uint8).tobytes() for y in range(h)
    )
    return (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(body))
        + chunk(b"IEND", b"")
    )


def bmp_decode(b: bytes) -> np.ndarray | None:
    """Uncompressed 24-bit BI_RGB BMP → ``(h, w, 3)`` uint8 RGB.
    Handles the spec's bottom-up row order and 4-byte row padding;
    top-down (negative height) also supported."""
    if b[:2] != b"BM" or len(b) < 54:
        return None
    (data_off,) = struct.unpack("<I", b[10:14])
    (hdr_size,) = struct.unpack("<I", b[14:18])
    if hdr_size < 40:
        return None
    w, h_raw = struct.unpack("<ii", b[18:26])
    planes, bpp = struct.unpack("<HH", b[26:30])
    (compression,) = struct.unpack("<I", b[30:34])
    if planes != 1 or bpp != 24 or compression != 0 or w <= 0:
        return None
    h = abs(h_raw)
    stride = (w * 3 + 3) & ~3
    if len(b) < data_off + stride * h:
        return None
    raw = np.frombuffer(b, np.uint8, count=stride * h, offset=data_off)
    rows = raw.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if h_raw > 0:  # bottom-up storage
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR -> RGB


def resize_nearest(arr: np.ndarray, target_w: int, target_h: int) -> np.ndarray:
    """Nearest-neighbor resample with pure-integer index mapping
    ``src = (dst_index * src_n) // dst_n`` — deterministic on every
    platform (no float coordinates), the property the oracle-checked
    pixel queries rely on."""
    h, w = arr.shape[0], arr.shape[1]
    ys = (np.arange(target_h, dtype=np.int64) * h) // target_h
    xs = (np.arange(target_w, dtype=np.int64) * w) // target_w
    return arr[ys][:, xs]


def decode_raster(b: bytes) -> np.ndarray | None:
    """Dispatch: PNG, BMP, or GIF raster, else None (JPEG stays
    env-gated — its DCT/Huffman entropy coder needs libjpeg)."""
    if b[:8] == PNG_SIG:
        return png_decode(b)
    if b[:2] == b"BM":
        return bmp_decode(b)
    if b[:6] in (b"GIF87a", b"GIF89a"):
        return gif_decode(b)
    return None


def spectrogram(samples: np.ndarray, n_fft: int = 256) -> np.ndarray:
    """Magnitude spectrogram over non-overlapping ``n_fft`` windows:
    ``(n_windows, n_fft // 2 + 1)``. Trailing partial window dropped —
    window count stays a closed-form function of the frame count."""
    n = (len(samples) // n_fft) * n_fft
    if n == 0:
        return np.zeros((0, n_fft // 2 + 1))
    frames = samples[:n].astype(np.float64).reshape(-1, n_fft)
    return np.abs(np.fft.rfft(frames, axis=1))


def dominant_bin(samples: np.ndarray, n_fft: int = 256) -> tuple[int, int]:
    """(argmax frequency bin of the mean magnitude spectrum, window
    count). Ties resolve to the lowest bin (np.argmax semantics)."""
    spec = spectrogram(samples, n_fft)
    if spec.shape[0] == 0:
        return -1, 0
    return int(spec.mean(axis=0).argmax()), int(spec.shape[0])


def _lzw_decode(data: bytes, min_code_size: int) -> list[int] | None:
    """General GIF-variant LZW decode (LSB-first bit packing, growing
    code widths up to 12 bits, CLEAR/EOI handling) → pixel index list."""
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    table: list[list[int]] = [[i] for i in range(clear)] + [[], []]
    out: list[int] = []
    prev: list[int] | None = None
    acc = nbits = 0
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table = [[i] for i in range(clear)] + [[], []]
                width = min_code_size + 1
                prev = None
                continue
            if code == eoi:
                return out
            if prev is None:
                if code >= len(table):
                    return None
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + [entry[0]])
            elif code == len(table):
                entry = prev + [prev[0]]
                table.append(entry)
            else:
                return None
            out.extend(entry)
            prev = entry
            if len(table) == (1 << width) and width < 12:
                width += 1
    return out


def gif_decode(b: bytes) -> np.ndarray | None:
    """GIF87a/89a raster decode → ``(h, w, 3)`` uint8 RGB via the color
    table — pure-Python LZW (the format's only entropy coder), no
    codec library. First image only; interlace unsupported (returns
    None); extension blocks skipped per spec."""
    if b[:6] not in (b"GIF87a", b"GIF89a") or len(b) < 13:
        return None
    _sw, _sh = struct.unpack("<HH", b[6:10])
    packed = b[10]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(b, np.uint8, count=3 * n, offset=pos).reshape(n, 3)
        pos += 3 * n
    try:
        while pos < len(b):
            marker = b[pos]
            if marker == 0x21:  # extension: skip sub-blocks
                pos += 2
                while b[pos] != 0:
                    pos += 1 + b[pos]
                pos += 1
            elif marker == 0x2C:  # image descriptor
                _ix, _iy, w, h = struct.unpack("<HHHH", b[pos + 1 : pos + 9])
                ipacked = b[pos + 9]
                pos += 10
                pal = gct
                if ipacked & 0x80:  # local color table
                    n = 2 << (ipacked & 0x07)
                    pal = np.frombuffer(
                        b, np.uint8, count=3 * n, offset=pos
                    ).reshape(n, 3)
                    pos += 3 * n
                if ipacked & 0x40 or pal is None:  # interlace / no palette
                    return None
                mcs = b[pos]
                pos += 1
                stream = bytearray()
                while b[pos] != 0:
                    ln = b[pos]
                    stream += b[pos + 1 : pos + 1 + ln]
                    pos += 1 + ln
                idx = _lzw_decode(bytes(stream), mcs)
                if idx is None or len(idx) < w * h:
                    return None
                pix = np.asarray(idx[: w * h], dtype=np.int32)
                if pix.max(initial=0) >= len(pal):
                    return None
                return pal[pix].reshape(h, w, 3)
            elif marker == 0x3B:  # trailer before any image
                return None
            else:
                return None
    except IndexError:
        return None
    return None


def lzw_encode(indices: list[int], min_code_size: int) -> bytes:
    """True compressing GIF-LZW encoder (dictionary growth, width
    escalation, table-full clear) — the counterpart ``_lzw_decode`` is
    tested against. LSB-first packing."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[tuple[int, ...], int] = {(i,): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    seq: tuple[int, ...] = ()
    for px in indices:
        cand = seq + (px,)
        if cand in table:
            seq = cand
            continue
        emit(table[seq], width)
        table[cand] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        if next_code == 4096:
            emit(clear, width)
            table = {(i,): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        seq = (px,)
    if seq:
        emit(table[seq], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)

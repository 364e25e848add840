"""Multimodal column handling: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched Pandas functions.

The decode step (PIL/librosa/ffmpeg) is STUBBED — those libraries are not in
this environment — behind ``decode_stub``; everything Spark-side (schema,
``mapInPandas`` batch shape, partitioning) is real and tested. Swapping
``decode_stub`` for a real decoder is a one-function change.

Scale notes:
- ``mapInPandas`` streams Arrow batches (``spark.sql.execution.arrow.
  maxRecordsPerBatch``) so one task never materializes a partition of blobs.
- Blob tables should be written with a small ``maxPartitionBytes`` relative
  to row size; metadata-only queries (width/duration filters) must run off
  the metadata columns, never the blob column — column pruning keeps blob
  bytes unread in Parquet.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = "doc_id long, n_bytes int, header_preview string, decode_ok boolean"


def decode_stub(blob: bytes) -> dict:
    """Deterministic fake decoder: real decode (image dims, audio duration)
    requires codec libraries unavailable here. Raises for empty blobs so the
    error path is exercised too."""
    if not blob:
        raise NotImplementedError("empty blob: real decoder not available")
    return {
        "n_bytes": len(blob),
        "header_preview": blob[:8].hex(),
        "decode_ok": True,
    }


def extract_features(df: DataFrame, blob_col: str = "media", id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched feature extraction over a binary column.

    The generator-of-DataFrames contract keeps memory bounded to one Arrow
    batch regardless of partition size.
    """

    # NOTE: the worker function must be fully self-contained (local imports,
    # no references to this module's globals). Python workers don't share the
    # driver's sys.path, so a closure referencing module-level helpers would
    # fail with ModuleNotFoundError whenever the driver isn't launched from
    # the repo root. Self-contained closures are pickled by value.
    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        def _decode(blob: bytes) -> dict:
            if not blob:
                raise NotImplementedError("empty blob")
            return {
                "n_bytes": len(blob),
                "header_preview": blob[:8].hex(),
                "decode_ok": True,
            }

        for pdf in batches:
            feats = []
            for doc_id, blob in zip(pdf[id_col], pdf[blob_col]):
                try:
                    f = _decode(bytes(blob) if blob is not None else b"")
                except NotImplementedError:
                    f = {"n_bytes": 0, "header_preview": None, "decode_ok": False}
                f[id_col] = doc_id
                feats.append(f)
            yield _pd.DataFrame(
                feats, columns=[id_col, "n_bytes", "header_preview", "decode_ok"]
            )

    return df.select(id_col, blob_col).mapInPandas(compute, FEATURE_SCHEMA)


def with_fake_media(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Test/demo helper: UTF-8 bytes of a text column as the opaque blob."""
    return df.withColumn("media", F.encode(F.col(text_col), "utf-8"))


RESIZE_SCHEMA = (
    "doc_id long, resized binary, target_w int, target_h int, resize_ok boolean"
)


def resize_images(
    df: DataFrame,
    target_w: int = 224,
    target_h: int = 224,
    blob_col: str = "media",
    id_col: str = "doc_id",
) -> DataFrame:
    """Image resize over a binary column — 1 row in, 1 row out.

    The real implementation is PIL ``Image.open(io.BytesIO(b)).resize(...)``;
    stubbed to a deterministic byte-level transform (truncate/pad to
    ``target_w*target_h//64`` bytes) since no codec libs exist here. The
    Spark plumbing is the part under test: Arrow batch streaming, binary
    out-column, and a fully self-contained closure (workers don't share the
    driver's sys.path).
    """

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        size = max(1, target_w * target_h // 64)
        for pdf in batches:
            rows = []
            for doc_id, blob in zip(pdf[id_col], pdf[blob_col]):
                b = bytes(blob) if blob is not None else b""
                if not b:
                    rows.append((doc_id, None, target_w, target_h, False))
                    continue
                fake = (b * (size // len(b) + 1))[:size]  # deterministic stub
                rows.append((doc_id, fake, target_w, target_h, True))
            yield _pd.DataFrame(
                rows, columns=[id_col, "resized", "target_w", "target_h", "resize_ok"]
            )

    return df.select(id_col, blob_col).mapInPandas(compute, RESIZE_SCHEMA)


FRAME_SCHEMA = "doc_id long, frame_idx int, frame binary"


def sample_frames(
    df: DataFrame,
    every_n: int = 4,
    frame_bytes: int = 64,
    blob_col: str = "media",
    id_col: str = "doc_id",
) -> DataFrame:
    """Video frame sampling — 1 row in, N rows out (flat-map shape).

    Real version: ffmpeg/pyav demux keyframes; stub: treat the blob as
    fixed-width ``frame_bytes`` chunks and keep every ``every_n``-th. The
    shape is what matters for the engine: ``mapInPandas`` emitting more rows
    than it consumes, with bounded memory per Arrow batch — the pattern for
    any demux/explode-style media op at 100 TB.
    """

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, blob in zip(pdf[id_col], pdf[blob_col]):
                b = bytes(blob) if blob is not None else b""
                n_frames = len(b) // frame_bytes
                for k in range(0, n_frames, every_n):
                    ids.append(doc_id)
                    idxs.append(k)
                    frames.append(b[k * frame_bytes : (k + 1) * frame_bytes])
            yield _pd.DataFrame(
                {id_col: ids, "frame_idx": idxs, "frame": frames}
            )

    return df.select(id_col, blob_col).mapInPandas(compute, FRAME_SCHEMA)

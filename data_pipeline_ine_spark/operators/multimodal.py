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

"""Raw-text corpus ingestion: the front door of a training-data pipeline.

The reference ingests structured CSV observations
(``steps/step1_download_sources.py``); a 100 TB LLM corpus instead
arrives as directories of raw text dumps — one document per line
(WET/pile-style) or one document per file. This source turns either
layout into the engine's canonical ``documents`` shape so every
downstream operator (dedup, quality, LM gates, chunking) composes
unchanged.

Scale notes:

- ``spark.read.text`` splits big line-delimited files along block
  boundaries — ingestion parallelism is byte-ranged, not file-count
  bound. ``wholetext=True`` cannot split (one task per file by
  necessity); use it only for file-per-doc layouts.
- Document ids are CONTENT-ADDRESSED: ``xxhash64(file_name, text)``.
  Line numbers are not reproducible under different splits/partition
  layouts, and a monotonically-increasing id changes with parallelism;
  a content hash is stable across re-reads, re-partitioning, and
  cluster sizes — and it is exactly the key exact-dedup wants anyway.
  Byte-identical duplicates therefore collide on purpose; keep
  ``file`` + ``line_in_file=False`` semantics in mind when counting.
- Empty/whitespace-only lines are dropped at the scan (pushed filter),
  not in a later pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_text_corpus(
    spark: SparkSession,
    path: str,
    per_file: bool = False,
    source: str | None = None,
) -> DataFrame:
    """Read a raw-text corpus into ``(doc_id, text, source, file,
    n_chars)``. ``per_file=False``: one document per non-empty line
    (splittable scan); ``per_file=True``: one document per file
    (``wholetext``). ``source`` tags the corpus slice (defaults to the
    last path segment)."""
    reader = spark.read
    if per_file:
        reader = reader.option("wholetext", "true")
    raw = reader.text(path)
    src = source if source is not None else path.rstrip("/").rsplit("/", 1)[-1]
    docs = (
        raw.select(
            F.col("value").alias("text"),
            F.input_file_name().alias("file"),
        )
        .filter(F.length(F.trim("text")) > 0)
        .select(
            F.xxhash64("file", "text").alias("doc_id"),
            "text",
            F.lit(src).alias("source"),
            "file",
            F.length("text").cast("bigint").alias("n_chars"),
        )
    )
    return docs

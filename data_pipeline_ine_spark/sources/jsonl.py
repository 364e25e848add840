"""JSONL corpus I/O — the lingua franca of LLM training data (one JSON
document per line, usually gzipped in place).

The reference ingests CSV only; a training-data engine lives on JSONL, so
this is a first-class source/sink here:

- **Explicit schema, never inference.** Schema inference re-scans the
  input and yields per-file type drift; at 100 TB that is an extra full
  pass. Callers pass the document schema (default: the testdata
  ``documents`` shape).
- **Corrupt lines are audited, not dropped silently.** PERMISSIVE mode
  routes unparseable lines to ``_corrupt_record``; ``read_jsonl`` splits
  them into a second frame so a run can be gated on the corrupt rate
  (same philosophy as ``operators/quality.py``). DROPMALFORMED hides
  data loss; FAILFAST turns one bad byte into a dead 100 TB job.
- **Compression is free.** Spark's text source decompresses ``.gz`` /
  ``.zst`` per file; gzip is NOT splittable, so a corpus should land as
  many medium files (the standard sharded-JSONL layout) rather than one
  giant archive — ``write_jsonl``'s ``num_shards`` does exactly that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOCUMENT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

_CORRUPT = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOCUMENT_SCHEMA,
) -> tuple[DataFrame, DataFrame]:
    """Read a (possibly gzipped, sharded) JSONL corpus with the given
    schema. Returns ``(good, corrupt)``: ``good`` carries the schema's
    columns for parseable lines; ``corrupt`` carries the raw offending
    line per unparseable record, for auditing/quarantine.

    Implementation note: the JSON file source REFUSES plans that project
    only its corrupt-record column (UNSUPPORTED_FEATURE.QUERY_ONLY_
    CORRUPT_RECORD_COLUMN — the documented workaround is ``cache()``,
    a non-starter at corpus scale). So lines come in through the TEXT
    source and parse via ``from_json`` with an embedded corrupt field:
    same single narrow scan per consumer, same gzip handling, and both
    frames are plain filters over it. Blank lines are skipped.
    """
    full = T.StructType(schema.fields + [T.StructField(_CORRUPT, T.StringType())])
    lines = spark.read.text(path).filter(F.length(F.trim("value")) > 0)
    parsed = lines.select(
        F.col("value"),
        F.from_json(
            "value",
            full,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": _CORRUPT},
        ).alias("j"),
    )
    good = parsed.filter(F.col(f"j.{_CORRUPT}").isNull()).select(
        *[F.col(f"j.{f.name}").alias(f.name) for f in schema.fields]
    )
    corrupt = parsed.filter(F.col(f"j.{_CORRUPT}").isNotNull()).select(
        F.col("value").alias("raw_line")
    )
    return good, corrupt


def write_jsonl(
    df: DataFrame,
    path: str,
    num_shards: int | None = None,
    compression: str | None = "gzip",
) -> None:
    """Write a corpus as sharded JSONL (optionally gzipped per shard).

    ``num_shards`` controls the shard count via ``repartition`` — for
    gzip (non-splittable) pick shards so each lands in the 100 MB–1 GB
    range; ``None`` keeps the input partitioning (no extra shuffle).
    """
    out = df.repartition(num_shards) if num_shards else df
    writer = out.write.mode("overwrite")
    if compression:
        writer = writer.option("compression", compression)
    writer.json(path)

"""Table registry over the layered parquet store.

Replaces the reference's per-step file plumbing (list → read whole CSV →
mutate → rewrite; ``utils/storage_factory.py:15-232``) with declarative scans:
Spark's Hadoop FS layer already abstracts local vs object store
(``file://`` / ``s3a://``), so there is no storage-factory code to write.

Scans are column-pruned and filter-pushed by Catalyst — callers select/filter
on the returned DataFrame and the parquet reader sees only what it needs.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_pipeline_ine_spark.schemas import TESTDATA_SCHEMAS, TESTDATA_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _micros_to_ntz(micros: Column) -> Column:
    """Epoch microseconds → TIMESTAMP_NTZ via pure wall-clock arithmetic.

    Splitting at day granularity keeps the sub-day remainder exactly
    representable as a double in ``make_dt_interval`` seconds.
    """
    days = (micros / F.lit(86_400_000_000)).cast("int")
    sub = (micros % F.lit(86_400_000_000)).cast("double") / F.lit(1_000_000.0)
    return F.lit("1970-01-01 00:00:00").cast("timestamp_ntz") + F.make_dt_interval(
        days, F.lit(0), F.lit(0), sub
    )


def _normalize_timestamps(df: DataFrame) -> DataFrame:
    """Rewrite every TIMESTAMP column as TIMESTAMP_NTZ carrying the parquet
    file's naive wall-clock value, independent of the session timezone.

    Spark interprets un-adjusted parquet timestamps as UTC instants and then
    renders/buckets them in ``spark.sql.session.timeZone`` — so ``to_date``
    or a literal comparison silently shifts under a non-UTC session. An
    oracle engine (DuckDB) reads the same values as naive timestamps. NTZ is
    the type that matches those semantics; ``unix_micros`` extracts the
    instant without any timezone math.
    """
    ts_cols = [
        f.name for f in df.schema.fields if isinstance(f.dataType, T.TimestampType)
    ]
    for c in ts_cols:
        df = df.withColumn(c, _micros_to_ntz(F.unix_micros(F.col(c))))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one synthetic table as parquet (TESTDATA.md contract).

    The contract pins every timestamp column to TIMESTAMP_NTZ carrying the
    parquet file's naive wall-clock value, whatever physical type the
    generator chose. Observed generator variants, each normalized here by
    inspecting the scanned schema (never by filename convention):

    - TIMESTAMP(NANOS) (``isAdjustedToUTC`` irrelevant): Spark rejects it by
      default (PARQUET_TYPE_ILLEGAL), so the runtime-settable legacy flag
      reads the nanos as raw int64 and the NTZ column is rebuilt at
      microsecond precision.
    - TIMESTAMP(MICROS, adjusted): read as TimestampType; rewritten to NTZ
      via ``unix_micros`` so downstream ``to_date``/``date_trunc`` stay
      session-timezone-invariant (matching how DuckDB reads the same file).
    - TIMESTAMP(MICROS, unadjusted): Spark's NTZ inference already yields
      the wall-clock NTZ value — passed through untouched.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    # The session factory sets nanosAsLong once; re-set here because entry
    # points may receive an externally-built session (the driver's smoke
    # check) whose conf lacks it — without the flag a NANOS file fails the
    # eager footer read (PARQUET_TYPE_ILLEGAL) before we can branch.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    declared = TESTDATA_SCHEMAS.get(name)
    if declared is not None:
        # NANOS variant: rebuild every column the contract declares as
        # TIMESTAMP_NTZ but the legacy flag surfaced as raw int64 — driven
        # by the declared schema, never by table-name convention.
        for field in declared.fields:
            if isinstance(field.dataType, T.TimestampNTZType) and isinstance(
                df.schema[field.name].dataType, T.LongType
            ):
                df = df.withColumn(
                    field.name, _micros_to_ntz(F.expr(f"`{field.name}` div 1000"))
                )
    return _normalize_timestamps(df)


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TESTDATA_TABLES
) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql queries."""
    for name in TESTDATA_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)

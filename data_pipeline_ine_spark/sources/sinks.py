"""Sinks: layered Parquet, view CSV, and JDBC (SURVEY.md §2.1 S2, S5, S11).

The reference's idempotency is "delete today's folder, rewrite everything"
(``pipeline_orchestrator.py:38-69``, ``utils/storage_factory.py:181-211``).
Here a run writes Parquet partitioned by ``run_date`` with dynamic partition
overwrite: re-running a day replaces exactly that day's partition, other
days untouched, and readers never observe a half-deleted directory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_layer(
    df: DataFrame,
    path: str,
    run_date: str | None = None,
    partition_cols: tuple[str, ...] = (),
    fmt: str = "parquet",
) -> None:
    """Write a curated layer as Parquet (default) or ORC. ``run_date``
    (YYYY-MM-DD) becomes a partition column — the Spark replacement for the
    reference's ``outputs/DD-MM-YYYY/`` folder-per-run layout
    (``step1_scraper.py:31``). Both formats are columnar with predicate
    pushdown and per-stripe/row-group statistics; the knob exists because
    downstream consumers (Hive/Trino estates) are often ORC-native."""
    if fmt not in ("parquet", "orc"):
        raise ValueError(f"unsupported layer format: {fmt}")
    out = df
    parts = list(partition_cols)
    if run_date is not None:
        out = out.withColumn("run_date", F.lit(run_date))
        parts = ["run_date", *parts]
    writer = out.write.mode("overwrite")
    if parts:
        writer = writer.partitionBy(*parts)
    writer.option("partitionOverwriteMode", "dynamic").format(fmt).save(path)


def latest_run_date(spark, path: str) -> str | None:
    """O3 — newest ``run_date`` partition under a layer path.

    The reference discovers "today's" folder by sorting directory names
    (``steps/step2_standardize_names.py:26-31``,
    ``generar_reporte_consolidado.py:16-22``). Here runs are ``run_date=``
    partitions (see :func:`write_layer`), so discovery is a max over the
    partition VALUES — metadata only: the row count of the scan is 0-cost
    because partition pruning answers it from the file listing, no data
    files are read.
    """
    from pyspark.errors.exceptions.captured import AnalysisException

    try:
        rows = (
            spark.read.parquet(path)
            .select("run_date")
            .distinct()
            .orderBy(F.col("run_date").desc())
            .limit(1)
            .collect()
        )
    except AnalysisException:
        # nonexistent path or a layer with zero completed runs (no
        # partition directories → nothing to infer a schema from)
        return None
    return str(rows[0][0]) if rows else None


def write_view_csv(df: DataFrame, path: str) -> None:
    """S2 — view CSV sink (header, UTF-8, overwrite).

    Reference: ``steps/step5_create_views.py:416-423``. ``emptyValue=''``
    matches pandas' rendering of missing cells so goldens compare cleanly
    (SURVEY.md §7.3 NaN-gap note).
    """
    (
        df.write.mode("overwrite")
        .option("header", True)
        .option("emptyValue", "")
        .csv(path)
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: tuple[str, ...],
    num_buckets: int = 32,
    sort_cols: tuple[str, ...] | None = None,
    fmt: str = "parquet",
    path: str | None = None,
) -> None:
    """Bucketed + sorted table write: pre-shuffle the data ONCE at write time
    so every later join/aggregation on ``bucket_cols`` is co-located and
    Exchange-free.

    This is the big-fact-table play at 100 TB: a fact table joined daily on
    the same key pays its shuffle once here, then every downstream
    ``join(dim_or_fact, bucket_cols)`` between two tables bucketed the same
    way compiles to a zero-Exchange SortMergeJoin (see
    ``tests/test_plan_quality.py::test_bucketed_join_no_exchange``). With
    ``sort_cols`` the merge phase needs no sort either.
    """
    writer = (
        df.write.mode("overwrite")
        .format(fmt)
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path:
        # external table at an explicit location (warehouse.dir is static)
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    properties: dict[str, str] | None = None,
    batchsize: int = 1000,
    num_partitions: int | None = None,
) -> None:
    """S5 — JDBC overwrite sink.

    Reference: ``steps/step6_upload_to_db.py:133-142`` — sequential pandas
    ``to_sql(chunksize=1000, method='multi')`` plus a hand-rolled
    DELETE/replace dance (``:114-131``). Spark's JDBC writer gives the same
    semantics declaratively: ``mode("overwrite")`` recreates the table,
    ``batchsize`` batches inserts, and writes run partition-parallel —
    ``num_partitions`` caps concurrent connections so a 1000-task cluster
    doesn't open 1000 sessions against one database.
    """
    out = df
    if num_partitions is not None:
        out = out.coalesce(num_partitions)
    writer = (
        out.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", batchsize)
        .mode("overwrite")
    )
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    writer.save()


def jdbc_table_exists(
    spark: SparkSession,
    url: str,
    table: str,
    properties: dict[str, str] | None = None,
) -> bool:
    """S6 — JDBC introspection: does ``table`` exist?

    Reference: ``steps/step6_upload_to_db.py:114-125`` queries
    ``information_schema.tables`` before choosing create-vs-replace. The
    Spark analog is a schema probe: resolving the JDBC relation fetches
    metadata only (a ``WHERE 1=0`` prepared query — no rows move), and a
    missing table surfaces as an analysis/SQL error. Engine-agnostic where
    information_schema is not (Derby, Oracle, ...).
    """
    reader = (
        spark.read.format("jdbc").option("url", url).option("dbtable", table)
    )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    try:
        reader.load().schema
        return True
    except Exception:
        return False


def jdbc_scalar(
    spark: SparkSession,
    url: str,
    query: str,
    properties: dict[str, str] | None = None,
):
    """S6 — run a scalar introspection query on the database side.

    Reference: ``steps/step6_upload_to_db.py:176-184`` (`SELECT COUNT(*)`
    verification, `SELECT version()` connection check). The ``query``
    option pushes the statement to the database — Spark only transports the
    single result row, so this stays a metadata op at any scale.

    Alias computed columns (``COUNT(*) AS n``): Spark re-selects the
    result by quoted column name, and auto-generated names like Derby's
    ``1`` don't survive the round trip.
    """
    reader = (
        spark.read.format("jdbc").option("url", url).option("query", query)
    )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    row = reader.load().collect()[0]
    return row[0]


# ---------------------------------------------------------------------------
# PostgreSQL bulk load via COPY (the psql client path)
# ---------------------------------------------------------------------------
_PG_TYPES = {
    "bigint": "BIGINT",
    "int": "INTEGER",
    "integer": "INTEGER",
    "smallint": "SMALLINT",
    "double": "DOUBLE PRECISION",
    "float": "REAL",
    "string": "TEXT",
    "boolean": "BOOLEAN",
    "date": "DATE",
    "timestamp": "TIMESTAMP",
    "timestamp_ntz": "TIMESTAMP",
}


def pg_ddl_for(df: DataFrame, table: str) -> str:
    """Render CREATE TABLE DDL for a DataFrame schema in PostgreSQL types
    (decimal precision carried through; unsupported types fail loudly
    rather than silently degrading to TEXT)."""
    cols = []
    for f in df.schema.fields:
        t = f.dataType.simpleString()
        if t.startswith("decimal"):
            pg = t.upper().replace("DECIMAL", "NUMERIC")
        else:
            try:
                pg = _PG_TYPES[t]
            except KeyError:
                raise ValueError(
                    f"no PostgreSQL mapping for column {f.name!r} type {t!r}"
                ) from None
        cols.append(f'"{f.name}" {pg}')
    return f'CREATE TABLE "{table}" ({", ".join(cols)})'


def copy_to_postgres(
    df: DataFrame,
    table: str,
    psql_args: list[str],
    staging_dir: str,
    psql_bin: str = "psql",
) -> int:
    """S5 alternative — bulk-load a DataFrame into PostgreSQL through the
    ``COPY`` protocol (``psql \\copy``), replacing the table.

    Reference parity: ``steps/step6_upload_to_db.py:133-142`` uploads each
    view with pandas ``to_sql(method='multi', chunksize=1000)`` — row
    batches through INSERT statements. COPY is the PostgreSQL-native bulk
    path (one order of magnitude faster than batched INSERTs) and needs
    only the stock ``psql`` client — no JDBC driver jar, no DBAPI module.

    Flow: the cluster writes the DataFrame as headerless CSV part files
    (fully parallel — this is the 100 TB-scale stage), then the driver
    streams each part through ``\\copy`` in one transaction per file.
    The serial COPY leg is the sink's bandwidth ceiling exactly as a
    single PG endpoint is; at real scale you point ``psql_args`` at a
    load balancer / partitioned foreign table and run one loader per
    partition directory.

    Empty strings are written as NULL markers (``nullValue``) matching
    the reference's NaN→None normalization (``step6:55-74``).

    Returns the number of rows loaded (PG-side count after the load).
    """
    import glob
    import subprocess

    (
        df.write.mode("overwrite")
        .option("header", False)
        .option("nullValue", "")
        .option("emptyValue", "\"\"")
        # RFC 4180 doubled quotes — Spark's default backslash escape is not
        # valid CSV for PostgreSQL COPY
        .option("escape", '"')
        .csv(staging_dir)
    )

    def run_sql(sql: str) -> str:
        out = subprocess.run(
            [psql_bin, *psql_args, "-v", "ON_ERROR_STOP=1", "-qAt", "-c", sql],
            capture_output=True,
            text=True,
        )
        if out.returncode != 0:
            raise RuntimeError(f"psql failed: {out.stderr.strip()}")
        return out.stdout.strip()

    run_sql(f'DROP TABLE IF EXISTS "{table}"')
    run_sql(pg_ddl_for(df, table))
    for part in sorted(glob.glob(f"{staging_dir}/part-*.csv")) or sorted(
        glob.glob(f"{staging_dir}/part-*")
    ):
        run_sql(
            f"\\copy \"{table}\" FROM '{part}' WITH (FORMAT csv, NULL '')"
        )
    return int(run_sql(f'SELECT COUNT(*) FROM "{table}"'))


def write_sorted_layer(
    df: DataFrame,
    path: str,
    range_cols: tuple[str, ...],
    sort_cols: tuple[str, ...] = (),
    n_files: int | None = None,
    max_records_per_file: int | None = None,
    fmt: str = "parquet",
) -> None:
    """Range-partitioned, within-file-sorted layout: repartitionByRange on
    ``range_cols`` (global key ranges, one per output file) + a
    sortWithinPartitions — so every file's min/max statistics are TIGHT
    and DISJOINT along the sort axis, and any later range/point predicate
    prunes to the few files whose stats admit it. The single-dimension
    complement to the Z-order layout (operators/layout.py): Z-order
    trades per-axis tightness for multi-axis pruning; this is the
    maximally-tight single-axis form.

    ``n_files`` sizes the range exchange (default: current parallelism);
    ``max_records_per_file`` bounds file size without re-shuffling.
    Range partitioning samples key quantiles — skewed keys get
    proportionally many files, so no output file becomes a straggler."""
    if fmt not in ("parquet", "orc"):
        raise ValueError(f"unsupported layer format: {fmt}")
    parts = [F.col(c) for c in range_cols]
    out = (
        df.repartitionByRange(n_files, *parts)
        if n_files
        else df.repartitionByRange(*parts)
    )
    out = out.sortWithinPartitions(*(list(range_cols) + list(sort_cols)))
    writer = out.write.mode("overwrite")
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.format(fmt).save(path)

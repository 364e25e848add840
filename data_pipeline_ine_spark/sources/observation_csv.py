"""Variant-tolerant observation CSV source → canonical long fact.

The reference's 87 datasets arrive as narrow CSVs in 13 physical shapes
(SURVEY.md §1.1) that differ only in period/entity column names, with real
dirt: flag columns in 6 casings (``steps/step3_remove_columns.py:25``),
``Año``/``anio`` label variants (``steps/step5_create_views.py:277-282``),
and the ``nox_perc95`` mismatch — a ``DTI_CL_MES`` code column whose label
column is ``Año`` (``dictionary/data_columns.txt:500-507``).

The reference probes these variants at *run time inside every step*
(``step5:295-325``, ``step4:42-66``). Here normalization happens ONCE at
scan time, against schema metadata only (``df.columns`` — no data read), and
everything downstream sees one canonical shape::

    (dataset, period_code, period_label, station_code, station_label,
     value, secondary_code, secondary_label)

At scale the canonical fact is written as Parquet partitioned by
``dataset``, so per-view member selection (step 5's scans) becomes partition
pruning instead of 87 file opens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_ine_spark.schemas import (
    FLAG_COLUMN_VARIANTS,
    PERIOD_CODE_COLUMNS,
    PERIOD_LABEL_COLUMNS,
    STATION_CODE_COLUMNS,
)

VALUE_COLUMN = "Value"


def _first_present(candidates, columns) -> str | None:
    colset = set(columns)
    for c in candidates:
        if c in colset:
            return c
    return None


def resolve_observation_columns(columns: list[str], station_col: str | None = None) -> dict:
    """Plan-time schema resolution (SURVEY.md §2.2 P8). Returns the roles:
    period_code/period_label/station_code/station_label/secondary_code/
    secondary_label, any of which may be None.

    Label resolution follows the reference's CSV layout invariant — each
    code column is immediately followed by its human-readable label column —
    rather than a fixed name list, which is exactly what tolerates the
    ``nox_perc95`` mismatched pair (code=DTI_CL_MES, label=Año).
    """
    cols = [c for c in columns if c not in FLAG_COLUMN_VARIANTS]

    period_code = _first_present(PERIOD_CODE_COLUMNS, cols)
    station_code = (
        station_col
        if station_col in cols
        else _first_present(STATION_CODE_COLUMNS, cols)
    )

    def label_after(code: str | None) -> str | None:
        if code is None:
            return None
        i = cols.index(code)
        if i + 1 < len(cols) and cols[i + 1] != VALUE_COLUMN:
            nxt = cols[i + 1]
            if not nxt.startswith("DTI_") and nxt not in STATION_CODE_COLUMNS:
                return nxt
        return None

    period_label = label_after(period_code) or _first_present(
        PERIOD_LABEL_COLUMNS, cols
    )

    # Secondary entity dimension (A5/A6 shapes): another known code column
    # besides the resolved station.
    secondary_code = None
    for c in cols:
        if c == station_code or c == period_code:
            continue
        if c.startswith("DTI_") or c in STATION_CODE_COLUMNS:
            secondary_code = c
            break

    return {
        "period_code": period_code,
        "period_label": period_label,
        "station_code": station_code,
        "station_label": label_after(station_code),
        "secondary_code": secondary_code,
        "secondary_label": label_after(secondary_code),
    }


def normalize_observation(
    df: DataFrame, dataset: str, station_col: str | None = None
) -> DataFrame:
    """Project any of the 13 raw shapes onto the canonical fact schema.

    Missing roles become typed NULL columns, so every dataset unions cleanly
    into one fact table (``unionByName`` without surprises).
    """
    roles = resolve_observation_columns(df.columns, station_col)

    def col_or_null(role: str, dtype: str):
        src = roles[role]
        return (
            F.col(src).cast(dtype) if src else F.lit(None).cast(dtype)
        ).alias(role)

    value = (
        F.col(VALUE_COLUMN).cast("double")
        if VALUE_COLUMN in df.columns
        else F.lit(None).cast("double")
    ).alias("value")

    return df.select(
        F.lit(dataset).alias("dataset"),
        col_or_null("period_code", "int"),
        col_or_null("period_label", "string"),
        col_or_null("station_code", "string"),
        col_or_null("station_label", "string"),
        value,
        col_or_null("secondary_code", "string"),
        col_or_null("secondary_label", "string"),
    )


def read_observation_csv(
    spark: SparkSession,
    path: str,
    dataset: str,
    station_col: str | None = None,
) -> DataFrame:
    """S1 — scan one narrow observation CSV and normalize it.

    Reference: ``steps/step3_remove_columns.py:46-50`` et al. (whole-file
    ``pd.read_csv``). ``inferSchema`` stays off — everything lands as string
    and the canonical projection applies explicit casts, so a bad cell
    becomes NULL instead of flipping a whole column's dtype per file.
    """
    raw = spark.read.option("header", True).csv(path)
    return normalize_observation(raw, dataset, station_col)


def build_fact_table(
    spark: SparkSession,
    dataset_paths: dict[str, str],
    station_map: dict[str, str] | None = None,
) -> DataFrame:
    """Union all datasets into the single canonical long fact table
    (SURVEY.md §1.4) — the engine's replacement for 87 loose files."""
    station_map = station_map or {}
    frames = [
        read_observation_csv(spark, path, name, station_map.get(name))
        for name, path in dataset_paths.items()
    ]
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def read_csv_with_quarantine(
    spark: SparkSession,
    path: str,
    schema_ddl: str,
    corrupt_col: str = "_corrupt_record",
) -> tuple[DataFrame, DataFrame]:
    """S1 hardening — parse a CSV against a declared schema, splitting rows
    into (good, quarantined) instead of failing the job or silently
    dropping. PERMISSIVE mode keeps the raw line of every malformed row in
    ``corrupt_col``; good rows have it NULL.

    The reference meets bad files with per-file pandas retries
    (``steps/step1_scraper.py:381-447``); at cluster scale a single bad line
    must not re-run a file, let alone a job. The scan is persisted before
    splitting because Spark disallows filtering a lazily-derived corrupt
    column on its own; in the layered architecture the same materialization
    is the raw-layer write, so quarantining costs no extra pass.
    """
    df = (
        spark.read.option("header", True)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .schema(f"{schema_ddl}, {corrupt_col} STRING")
        .csv(path)
        .cache()
    )
    good = df.filter(F.col(corrupt_col).isNull()).drop(corrupt_col)
    bad = df.filter(F.col(corrupt_col).isNotNull()).select(corrupt_col)
    return good, bad

"""Station geo catalog — the reference's ``v_estaciones`` output family.

The reference publishes a hardcoded 98-station air-quality catalog
(lat/lon/region) as a first-class view (reference
``steps/step5_create_views.py:503-539``, data in
``dictionary/estaciones_aire_data.json``). Here the same catalog ships as
a packaged pipe-delimited resource — one tiny driver-side literal
DataFrame, the classic broadcast-dimension shape: at any scale this is a
<10 KB dim that joins via broadcast, never a shuffle.

``station_values_sql()`` renders the identical rows as a SQL VALUES
literal so an external engine (DuckDB) can verify the catalog
byte-for-byte without touching the filesystem.
"""

from __future__ import annotations

from importlib import resources

from pyspark.sql import DataFrame, SparkSession

from data_pipeline_ine_spark.schemas import STATION_CATALOG

_COLS = (
    "nombre",
    "latitud",
    "longitud",
    "numero_region",
    "nombre_region",
    "descripcion",
)


def _raw_rows() -> list[tuple[str, float, float, int, str, str]]:
    text = (
        resources.files("data_pipeline_ine_spark.resources")
        .joinpath("estaciones.psv")
        .read_text(encoding="utf-8")
    )
    lines = text.strip().splitlines()
    assert lines[0].split("|") == list(_COLS)
    out = []
    for ln in lines[1:]:
        nombre, lat, lon, nreg, reg, desc = ln.split("|")
        out.append((nombre, float(lat), float(lon), int(nreg), reg, desc))
    return out


def load_station_catalog(spark: SparkSession) -> DataFrame:
    """The 98-station catalog as a typed DataFrame (column order mirrors
    reference ``step5_create_views.py:521``).

    Built from the same VALUES literal the oracle uses: Spark parses it to
    a LocalRelation — pure JVM, no Python-worker round-trip (a
    ``createDataFrame`` over driver rows costs ~3 s of worker startup per
    run just to ship 98 rows)."""
    df = spark.sql(station_values_sql())
    # VALUES + CAST already yields the catalog types; select in schema order
    # to pin the contract column order
    return df.select(*[f.name for f in STATION_CATALOG.fields])


def station_values_sql() -> str:
    """The catalog as an ANSI VALUES literal: engine-independent oracle."""

    def q(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    rows = ",\n  ".join(
        f"({q(n)}, CAST({lat} AS DOUBLE), CAST({lon} AS DOUBLE), "
        f"CAST({nreg} AS INTEGER), {q(reg)}, {q(desc)})"
        for n, lat, lon, nreg, reg, desc in _raw_rows()
    )
    return (
        "SELECT * FROM (VALUES\n  "
        + rows
        + f"\n) AS t({', '.join(_COLS)})"
    )

"""Golden tests of the reference's INE semantics (SURVEY.md §5, FIXTURES.md):
variant-schema normalization, sparse-station filtering, consolidation with
NULL gaps, duplicate semantics, catalogs, coercion heuristic, CSV round-trip.
"""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_pipeline_ine_spark.functions.coercion import (
    coerce_numeric_columns,
    numeric_ratio,
)
from data_pipeline_ine_spark.operators.filters import sparse_entity_filter
from data_pipeline_ine_spark.operators.setops import union_distinct
from data_pipeline_ine_spark.operators.windows import sequential_id
from data_pipeline_ine_spark.plans.builder import (
    ViewDefinition,
    consolidate,
    consolidate_joins,
)
from data_pipeline_ine_spark.sources.observation_csv import (
    build_fact_table,
    read_observation_csv,
    resolve_observation_columns,
)
from data_pipeline_ine_spark.sources.sinks import write_view_csv

# FIXTURES.md A2: monthly meteorological shape, flag variants present,
# sparse station (only 2 records for EST_SPARSE), a NULL and an '' station,
# and a duplicate (period, station) pair to pin duplicate semantics.
CSV_TEMP_MAX = """DTI_CL_MES,Mes,DTI_CL_ESTACIONES_METEO,Estaciones meteorológicas DMC,Value,Flag Codes,Flags
202401,Enero 2024,EST_A,Estación A,31.5,,
202401,Enero 2024,EST_B,Estación B,29.0,,
202402,Febrero 2024,EST_A,Estación A,30.1,,
202402,Febrero 2024,EST_A,Estación A,99.9,,
202401,Enero 2024,EST_SPARSE,Estación Sparse,10.0,,
202402,Febrero 2024,EST_SPARSE,Estación Sparse,11.0,,
202401,Enero 2024,,Sin estación,1.0,,
202402,Febrero 2024,'',Vacía,2.0,,
"""

# Same shape, different casing of flag cols, different (period, station)
# coverage so the wide view has NULL gaps.
CSV_TEMP_MIN = """DTI_CL_MES,Mes,DTI_CL_ESTACIONES_METEO,Estaciones meteorológicas DMC,Value,FLAG CODES,FLAGS
202401,Enero 2024,EST_A,Estación A,12.3,,
202403,Marzo 2024,EST_B,Estación B,8.8,,
"""

# FIXTURES.md A8: the nox_perc95 dirty schema — period code is DTI_CL_MES
# but the label column is Año; no flags columns at all.
CSV_DIRTY = """DTI_CL_MES,Año,DTI_CL_EST_MONITOREO_AIRE,Estaciones de monitoreo del aire,Value
202401,2024,EST_A,Estación A,55.5
202402,2024,EST_B,Estación B,44.4
"""

# FIXTURES.md A5: POAL shape with a secondary parameter dimension.
CSV_POAL = """DTI_CL_DIA,Día,DTI_CL_T013EST_POAL,Estaciones POAL,DTI_CL_T014PARAM_POAL,Parámetros POAL,Value,Flag Codes,Flags
20240101,1 Ene,POAL_1,Bahía 1,CU,Cobre,0.5,,
20240101,1 Ene,POAL_1,Bahía 1,PB,Plomo,0.1,,
"""


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("ine_csv")
    for name, content in [
        ("temp_max_absoluta", CSV_TEMP_MAX),
        ("temp_min_absoluta", CSV_TEMP_MIN),
        ("nox_perc95", CSV_DIRTY),
        ("metales_poal", CSV_POAL),
    ]:
        (d / f"{name}.csv").write_text(content, encoding="utf-8")
    return d


def test_resolve_variant_columns():
    # A2 monthly shape
    roles = resolve_observation_columns(
        [
            "DTI_CL_MES",
            "Mes",
            "DTI_CL_ESTACIONES_METEO",
            "Estaciones meteorológicas DMC",
            "Value",
            "Flag Codes",
            "Flags",
        ]
    )
    assert roles["period_code"] == "DTI_CL_MES"
    assert roles["period_label"] == "Mes"
    assert roles["station_code"] == "DTI_CL_ESTACIONES_METEO"
    assert roles["station_label"] == "Estaciones meteorológicas DMC"
    assert roles["secondary_code"] is None


def test_resolve_dirty_nox_perc95_schema():
    # code column says month, label column says year — must still pair them
    roles = resolve_observation_columns(
        ["DTI_CL_MES", "Año", "DTI_CL_EST_MONITOREO_AIRE",
         "Estaciones de monitoreo del aire", "Value"]
    )
    assert roles["period_code"] == "DTI_CL_MES"
    assert roles["period_label"] == "Año"
    assert roles["station_code"] == "DTI_CL_EST_MONITOREO_AIRE"


def test_resolve_secondary_dimension():
    roles = resolve_observation_columns(
        ["DTI_CL_DIA", "Día", "DTI_CL_T013EST_POAL", "Estaciones POAL",
         "DTI_CL_T014PARAM_POAL", "Parámetros POAL", "Value"]
    )
    assert roles["station_code"] == "DTI_CL_T013EST_POAL"
    assert roles["secondary_code"] == "DTI_CL_T014PARAM_POAL"
    assert roles["secondary_label"] == "Parámetros POAL"


def test_normalized_scan_canonical_schema(spark, fixture_dir):
    df = read_observation_csv(
        spark, str(fixture_dir / "nox_perc95.csv"), "nox_perc95"
    )
    assert df.columns == [
        "dataset",
        "period_code",
        "period_label",
        "station_code",
        "station_label",
        "value",
        "secondary_code",
        "secondary_label",
    ]
    rows = {r.period_code: r for r in df.collect()}
    assert rows[202401].period_label == "2024"
    assert rows[202401].value == 55.5


def test_sparse_station_filter_step4_semantics(spark, fixture_dir):
    facts = build_fact_table(
        spark,
        {
            "temp_max_absoluta": str(fixture_dir / "temp_max_absoluta.csv"),
            "temp_min_absoluta": str(fixture_dir / "temp_min_absoluta.csv"),
        },
    )
    # Global filter: EST_A has 4 records total (kept); EST_B 2, EST_SPARSE 2
    # (removed); NULL/'' stations removed.
    dense = sparse_entity_filter(facts, "station_code", "value", min_records=3)
    stations = {r.station_code for r in dense.select("station_code").distinct().collect()}
    assert stations == {"EST_A"}
    # Reference semantics (step4 filters each dataset independently):
    # composite (dataset, station) key. Only temp_max's EST_A has ≥3 records.
    per_ds = sparse_entity_filter(
        facts, ["dataset", "station_code"], "value", min_records=3
    )
    kept = {
        (r.dataset, r.station_code)
        for r in per_ds.select("dataset", "station_code").distinct().collect()
    }
    assert kept == {("temp_max_absoluta", "EST_A")}


def test_consolidation_pivot_null_gaps_and_dedup(spark, fixture_dir):
    facts = build_fact_table(
        spark,
        {
            "temp_max_absoluta": str(fixture_dir / "temp_max_absoluta.csv"),
            "temp_min_absoluta": str(fixture_dir / "temp_min_absoluta.csv"),
        },
    )
    view = ViewDefinition(
        name="v_temperatura",
        members=("temp_max_absoluta", "temp_min_absoluta"),
        period_out="mes",
        station_out="estacion",
    )
    wide = consolidate(facts, view, agg_expr="max").orderBy("mes", "estacion")
    rows = {(r.mes, r.estacion): r for r in wide.collect()}
    # C1 golden: NULL gap where a member lacks the (period, station) pair
    assert rows[(202401, "EST_A")].temp_max_absoluta == 31.5
    assert rows[(202401, "EST_A")].temp_min_absoluta == 12.3
    assert rows[(202403, "EST_B")].temp_max_absoluta is None
    assert rows[(202403, "EST_B")].temp_min_absoluta == 8.8
    # duplicate (202402, EST_A) observations collapse via max → 99.9
    assert rows[(202402, "EST_A")].temp_max_absoluta == 99.9


def test_consolidation_join_strategy_fans_out_duplicates(spark, fixture_dir):
    # Reference-faithful chained-join strategy: duplicate (period, station)
    # rows FAN OUT (pandas left-merge semantics), unlike the pivot dedupe.
    f1 = read_observation_csv(
        spark, str(fixture_dir / "temp_max_absoluta.csv"), "temp_max_absoluta"
    )
    view = ViewDefinition(name="v", members=("temp_max_absoluta",))
    joined = consolidate_joins({"temp_max_absoluta": f1}, view)
    # scaffold has 1 row for (202402, EST_A); the member has 2 → fan-out to 2
    n = joined.filter(
        (F.col("period") == 202402) & (F.col("estacion") == "EST_A")
    ).count()
    assert n == 2


def test_entity_catalog_golden(spark, fixture_dir):
    # C2: union of per-type distinct entities → row_number ids over sort
    facts = build_fact_table(
        spark,
        {
            "temp_max_absoluta": str(fixture_dir / "temp_max_absoluta.csv"),
            "metales_poal": str(fixture_dir / "metales_poal.csv"),
        },
    )
    ents = union_distinct(
        [
            facts.filter(F.col("station_label").isNotNull()).select(
                F.lit("estacion").alias("tipo"),
                F.col("station_label").alias("nombre"),
            ),
            facts.filter(F.col("secondary_label").isNotNull()).select(
                F.lit("parametro").alias("tipo"),
                F.col("secondary_label").alias("nombre"),
            ),
        ]
    )
    catalog = sequential_id(ents, ["tipo", "nombre"]).select("id", "nombre", "tipo")
    got = [(r.id, r.nombre, r.tipo) for r in catalog.orderBy("id").collect()]
    assert got[0][0] == 1
    assert [g[1] for g in got if g[2] == "parametro"] == ["Cobre", "Plomo"]


def test_coercion_heuristic(spark):
    df = spark.createDataFrame(
        [("1.5", "abc"), ("2.5", "2"), ("x", "def"), ("4", "ghi")],
        ["mostly_num", "mostly_str"],
    )
    ratios = numeric_ratio(df)
    assert ratios["mostly_num"] == 0.75 and ratios["mostly_str"] == 0.25
    out = coerce_numeric_columns(df)
    types = dict(out.dtypes)
    # >50% numeric → coerced (bad cell becomes NULL); others untouched
    assert types["mostly_num"] == "double" and types["mostly_str"] == "string"
    assert out.filter(F.col("mostly_num").isNull()).count() == 1


def test_view_csv_sink_roundtrip(spark, fixture_dir, tmp_path):
    facts = build_fact_table(
        spark, {"temp_max_absoluta": str(fixture_dir / "temp_max_absoluta.csv")}
    )
    view = ViewDefinition(name="v", members=("temp_max_absoluta",), period_out="mes")
    wide = consolidate(facts, view, agg_expr="max")
    out = str(tmp_path / "v_temperatura")
    write_view_csv(wide, out)
    back = spark.read.option("header", True).csv(out)
    assert back.count() == wide.count()
    assert back.columns == wide.columns

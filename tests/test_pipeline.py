"""End-to-end pipeline: raw INE-shaped CSVs → fact table → consolidated
views → parquet layer, with metrics riding the write pass. Mirrors the
reference's orchestrator lifecycle (SURVEY.md §3.1) including idempotent
re-runs."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from data_pipeline_ine_spark.plans.builder import ViewDefinition
from data_pipeline_ine_spark.plans.pipeline import run_pipeline

CSV_TEMP_MAX = """DTI_CL_MES,Mes,DTI_CL_ESTACIONES_METEO,Estaciones meteorológicas DMC,Value,Flag Codes,Flags
202401,Enero 2024,EST_A,Estación A,31.5,,
202401,Enero 2024,EST_B,Estación B,29.0,,
202402,Febrero 2024,EST_A,Estación A,30.1,,
202401,Enero 2024,EST_SPARSE,Estación Sparse,10.0,,
"""

CSV_TEMP_MIN = """DTI_CL_MES,Mes,DTI_CL_ESTACIONES_METEO,Estaciones meteorológicas DMC,Value,Flag Codes,Flags
202401,Enero 2024,EST_A,Estación A,12.3,,
202402,Febrero 2024,EST_A,Estación A,11.0,,
202401,Enero 2024,EST_B,Estación B,13.1,,
"""

VIEWS = {
    "v_temperatura": ViewDefinition(
        name="v_temperatura",
        members=("temperatura_maxima", "temperatura_minima"),
        period_out="mes",
        station_out="estacion",
    )
}


@pytest.fixture()
def raw_dir(tmp_path):
    d = tmp_path / "raw"
    d.mkdir()
    (d / "temperatura_maxima.csv").write_text(CSV_TEMP_MAX, encoding="utf-8")
    (d / "temperatura_minima.csv").write_text(CSV_TEMP_MIN, encoding="utf-8")
    return d


def _paths(raw_dir):
    return {
        "temperatura_maxima": str(raw_dir / "temperatura_maxima.csv"),
        "temperatura_minima": str(raw_dir / "temperatura_minima.csv"),
    }


def test_pipeline_end_to_end(spark, raw_dir, tmp_path):
    out = tmp_path / "out"
    report = run_pipeline(
        spark, _paths(raw_dir), VIEWS, str(out),
        run_date="2026-08-13", min_records=2,
        report_path=str(tmp_path / "report.json"),
    )
    view = spark.read.parquet(str(out / "views" / "v_temperatura"))
    rows = {(r.mes, r.estacion): r for r in view.collect()}
    # EST_SPARSE has only 1 record -> dropped by the fused min_records=2
    assert not any(k[1] == "EST_SPARSE" for k in rows)
    # dense pair carries both metrics; gap cells are NULL
    a_jan = rows[(202401, "EST_A")]
    assert a_jan.temperatura_maxima == 31.5 and a_jan.temperatura_minima == 12.3
    assert rows[(202402, "EST_A")].temperatura_maxima == 30.1
    # label dim attached
    assert a_jan.period_label == "Enero 2024"
    # run_date partition written
    assert (out / "views" / "v_temperatura" / "run_date=2026-08-13").exists()
    # metrics rode the write
    m = report["metrics"]["v_temperatura"]
    assert m["n_rows"] == len(rows) > 0
    assert os.path.exists(tmp_path / "report.json")


def test_pipeline_rerun_is_idempotent(spark, raw_dir, tmp_path):
    out = tmp_path / "out"
    for _ in range(2):
        run_pipeline(spark, _paths(raw_dir), VIEWS, str(out),
                     run_date="2026-08-13", min_records=2)
    view = spark.read.parquet(str(out / "views" / "v_temperatura"))
    # re-running the same run_date replaces, never duplicates
    assert view.groupBy("mes", "estacion").count().filter(F.col("count") > 1).count() == 0


def test_reference_view_catalog_complete():
    from data_pipeline_ine_spark.plans.view_catalog import reference_views, station_map

    views = reference_views()
    # 19 air + 2 consolidated water views (step5_create_views.py:41-216)
    assert len(views) == 21
    assert views["v_temperatura"].members[0] == "temp_max_absoluta"
    # so2's annual min table keeps its drifted name
    assert "so2_min_anual" in views["v_so2_anual"].members
    # mp25/mp10 have no perc99
    assert "mp25_perc99" not in views["v_mp25_anual"].members
    assert "o3_perc99" in views["v_o3_anual"].members
    # glacier view renames the entity to cuenca
    g = views["v_glaciares_anual_cuenca"]
    assert g.station_out == "cuenca" and g.granularity == "anual"
    # every member dataset has a station-column mapping
    sm = station_map()
    for v in views.values():
        for ds in v.members:
            assert ds in sm
    # no dataset belongs to two views
    all_members = [ds for v in views.values() for ds in v.members]
    # 5 temp + 3 humidity + 7+7 (mp25/mp10) + 8×6 (o3/so2/no2/co/no/nox)
    # + 1 heat-wave + 2 sea + 4 glacier = 77 distinct member datasets
    assert len(all_members) == len(set(all_members)) == 77


def test_full_catalog_builds_all_21_views(spark, tmp_path):
    """End-to-end over the COMPLETE reference catalog: synthesize all 77
    member datasets, build the unified fact table, and materialize every
    consolidated view — the 'a reference user could switch' proof."""
    from data_pipeline_ine_spark.plans.pipeline import build_views
    from data_pipeline_ine_spark.plans.view_catalog import reference_views, station_map
    from data_pipeline_ine_spark.sources.observation_csv import build_fact_table

    views, sm = reference_views(), station_map()
    label_of = {
        "DTI_CL_EST_MONITOREO_AIRE": "Estaciones de monitoreo del aire",
        "DTI_CL_ESTACIONES_METEO": "Estaciones meteorológicas DMC",
        "CL_T017ESTACION_SHOA": "Estación ambiental SHOA",
        "DTI_CL_CUENCAS": "Cuencas",
    }
    raw = tmp_path / "raw_full"
    raw.mkdir()
    paths = {}
    for v in views.values():
        pcol, plabel = ("DTI_CL_ANO", "Año") if v.granularity == "anual" else ("DTI_CL_MES", "Mes")
        for ds in v.members:
            scol = sm[ds]
            lines = [f"{pcol},{plabel},{scol},{label_of[scol]},Value,Flag Codes,Flags"]
            for p in (202401, 202402):
                for s in ("EST_A", "EST_B", "EST_C"):
                    lines.append(f"{p},P{p},{s},Estación {s},{hash(ds) % 97}.5,,")
            f = raw / f"{ds}.csv"
            f.write_text("\n".join(lines), encoding="utf-8")
            paths[ds] = str(f)

    facts = build_fact_table(spark, paths, sm)
    built = build_views(facts, views, min_records=1)
    assert len(built) == 21
    for name, vdf in built.items():
        v = views[name]
        rows = vdf.count()
        # 2 periods x 3 stations, all dense
        assert rows == 6, (name, rows)
        for m in v.members:
            assert m in vdf.columns, (name, m)
        assert v.station_out in vdf.columns


def test_simple_water_views_are_passthrough(spark, tmp_path):
    """1:1 water views: flag + DTI_* columns dropped, rows untouched,
    missing files tolerated (reference step5:446-497, :687-695)."""
    from data_pipeline_ine_spark.plans.pipeline import build_simple_views
    from data_pipeline_ine_spark.plans.view_catalog import WATER_SIMPLE_TABLES

    p = tmp_path / "cantidad_de_agua_caida.csv"
    p.write_text(
        "DTI_CL_MES,Mes,DTI_CL_ESTACIONES_METEO,Estaciones meteorológicas DMC,Value,Flag Codes,Flags\n"
        "202401,Enero 2024,EST_A,Estación A,12.5,,\n"
        "202402,Febrero 2024,EST_B,Estación B,3.25,x,\n",
        encoding="utf-8",
    )
    views = build_simple_views(
        spark, {"cantidad_de_agua_caida": str(p)}, WATER_SIMPLE_TABLES
    )
    assert set(views) == {"v_cantidad_de_agua_caida"}  # 9 files absent: skipped
    v = views["v_cantidad_de_agua_caida"]
    assert v.columns == ["Mes", "Estaciones meteorológicas DMC", "Value"]
    assert v.count() == 2

"""The reference's full consolidated-view catalog as data: 19 air views +
2 consolidated water views (``steps/step5_create_views.py:41-194`` and
``:196-216``), re-expressed as :class:`ViewDefinition` config for the
Spark-first ``consolidate``/``run_pipeline`` interpreter.

The eight pollutant families share one generative pattern (an annual view
over max/min/percentile member tables + a monthly mean view), so the catalog
is written as that pattern plus its exceptions rather than 21 literal dicts:
- mp25/mp10 have no ``perc99`` member (``step5:59-66``, ``:75-82``)
- so2's annual minimum table is ``so2_min_anual``, not ``*_min_hor_anual``
  (``step5:107``) — real-world naming drift, preserved verbatim

Station-column types per dataset family come from
``dictionary/station_columns_mapping.json``.
"""

from __future__ import annotations

from data_pipeline_ine_spark.plans.builder import ViewDefinition

# station column types (dictionary/station_columns_mapping.json)
AIR = "DTI_CL_EST_MONITOREO_AIRE"
METEO = "DTI_CL_ESTACIONES_METEO"
SHOA = "CL_T017ESTACION_SHOA"
CUENCA = "DTI_CL_CUENCAS"

_PCTS = (50, 90, 95, 98, 99)
_POLLUTANTS: dict[str, dict] = {
    "mp25": {"percs": (50, 90, 95, 98)},
    "mp10": {"percs": (50, 90, 95, 98)},
    "o3": {},
    "so2": {"min_table": "so2_min_anual"},
    "no2": {},
    "co": {},
    "no": {},
    "nox": {},
}


def _pollutant_views() -> dict[str, tuple[tuple[str, ...], str, str]]:
    views: dict[str, tuple[tuple[str, ...], str, str]] = {}
    for p, spec in _POLLUTANTS.items():
        annual = (
            f"{p}_max_hor_anual",
            spec.get("min_table", f"{p}_min_hor_anual"),
            *[f"{p}_perc{q}" for q in spec.get("percs", _PCTS)],
        )
        views[f"v_{p}_anual"] = (annual, "anio", AIR)
        views[f"v_{p}_mensual"] = ((f"{p}_med_mens",), "mes", AIR)
    return views


# name -> (member datasets, period_out, station column type[, station_out])
_CATALOG: dict[str, tuple] = {
    "v_temperatura": (
        ("temp_max_absoluta", "temp_min_absoluta", "temp_max_med",
         "temp_min_med", "temp_med"),
        "mes", METEO,
    ),
    "v_humedad_radiacion_uv": (
        ("humedad_rel_med_mens", "rad_global_med", "uvb_prom"), "mes", METEO,
    ),
    **_pollutant_views(),
    "v_num_eventos_de_olas_de_calor": (
        ("num_eventos_de_olas_de_calor",), "mes", METEO,
    ),
    "v_mar_mensual": (
        ("temp_superficial_del_mar", "nivel_medio_del_mar"), "mes", SHOA,
    ),
    "v_glaciares_anual_cuenca": (
        ("num_glaciares_por_cuenca", "superficie_de_glaciares_por_cuenca",
         "volumen_de_hielo_glaciar_estimado_por_cuenca",
         "volumen_de_agua_de_glaciares_estimada_por_cuenca"),
        "anio", CUENCA, "cuenca",  # station_rename (step5:214)
    ),
}


def reference_views() -> dict[str, ViewDefinition]:
    """All 21 reference view definitions, keyed by view name."""
    out = {}
    for name, spec in _CATALOG.items():
        members, period_out, _station_type = spec[0], spec[1], spec[2]
        station_out = spec[3] if len(spec) > 3 else "estacion"
        out[name] = ViewDefinition(
            name=name,
            members=tuple(members),
            period_out=period_out,
            station_out=station_out,
            granularity="anual" if period_out == "anio" else "mensual",
        )
    return out


def station_map() -> dict[str, str]:
    """dataset -> station column type, for ``build_fact_table``'s variant
    resolution (the ``station_columns_mapping.json`` role)."""
    out = {}
    for spec in _CATALOG.values():
        for ds in spec[0]:
            out[ds] = spec[2]
    return out


# Water tables republished 1:1 as v_-prefixed views — no consolidation, just
# flag/code-column removal (``steps/step5_create_views.py:218-231``).
WATER_SIMPLE_TABLES: tuple[str, ...] = (
    "coliformes_fecales_en_matriz_biologica",
    "coliformes_fecales_en_matriz_acuosa",
    "metales_totales_en_la_matriz_sedimentaria",
    "metales_disueltos_en_la_matriz_acuosa",
    "caudal_medio_de_aguas_corrientes",
    "cantidad_de_agua_caida",
    "evaporacion_real_por_estacion",
    "volumen_del_embalse_por_embalse",
    "altura_nieve_equivalente_en_agua",
    "nivel_estatico_de_aguas_subterraneas",
)

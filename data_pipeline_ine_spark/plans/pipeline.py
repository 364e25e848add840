"""End-to-end pipeline orchestrator: the Spark shape of the reference's
7-step lifecycle (SURVEY.md §3.1, ``pipeline_orchestrator.py:71-309``).

Reference lifecycle → here:

1. scrape (step 1)            → out of engine scope: files appear in raw_dir
2. rename (step 2)            → ``dataset_paths`` mapping (name is metadata)
3. drop flag cols (step 3)    → canonical projection in observation_csv
4. sparse-station filter (4)  → fused HAVING inside each view's pivot shuffle
5. consolidate views (step 5) → one lazy ``consolidate`` plan per view
6. DB upload (step 6)         → ``write_layer`` parquet + optional JDBC/CSV
7. report (step 7)            → ``observe()`` metrics, one driver JSON

Where the reference runs 6 sequential processes exchanging CSV files on
disk, this is ONE Spark application: the fact table is a single lazy union
(no intermediate materialization), each view costs one shuffle, and the only
files written are the final view layers, partitioned by ``run_date`` with
dynamic overwrite for idempotent re-runs (replaces the delete-folder dance,
``pipeline_orchestrator.py:38-69``).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_ine_spark.functions.metrics import observed, step_report
from data_pipeline_ine_spark.plans.builder import ViewDefinition, consolidate
from data_pipeline_ine_spark.sources.observation_csv import build_fact_table
from data_pipeline_ine_spark.sources.sinks import write_layer, write_view_csv


def build_views(
    facts: DataFrame,
    views: dict[str, ViewDefinition],
    min_records: int | None = 3,
    agg_expr: str = "first",
) -> dict[str, DataFrame]:
    """One lazy consolidated-view plan per definition, label dims attached.

    The period/station label maps are built from the same fact plan
    (dropDuplicates over two narrow columns) and broadcast-joined after the
    pivot — the J1/J2 semantics without a second source scan of any file a
    view doesn't touch."""
    out: dict[str, DataFrame] = {}
    for name, view in views.items():
        member_facts = facts.filter(F.col("dataset").isin(list(view.members)))
        period_dim = (
            member_facts.select("period_code", "period_label")
            .where(F.col("period_label").isNotNull())
            .dropDuplicates(["period_code"])
        )
        station_dim = (
            member_facts.select("station_code", "station_label")
            .where(F.col("station_label").isNotNull())
            .dropDuplicates(["station_code"])
        )
        out[name] = consolidate(
            member_facts,
            view,
            agg_expr=agg_expr,
            label_dims=[(period_dim, "period_code"), (station_dim, "station_code")],
            min_records=min_records,
        )
    return out


def run_pipeline(
    spark: SparkSession,
    dataset_paths: dict[str, str],
    views: dict[str, ViewDefinition],
    out_dir: str,
    run_date: str | None = None,
    min_records: int | None = 3,
    station_map: dict[str, str] | None = None,
    write_csv: bool = False,
    report_path: str | None = None,
) -> dict[str, Any]:
    """Raw observation CSVs → canonical fact table → consolidated views →
    parquet layer (+ optional CSV), with observe()-based metrics.

    Returns the consolidated run report (per-view row counts and null-cell
    accounting — the reference's exitosos/filas accounting, computed for
    free on the write pass instead of with extra count jobs)."""
    facts = build_fact_table(spark, dataset_paths, station_map)
    observations = {}
    for name, view_df in build_views(facts, views, min_records=min_records).items():
        metric_cols = [c for c in view_df.columns if c in views[name].members or
                       c in views[name].metric_renames.values()]
        view_obs, obs = observed(
            view_df,
            n_rows=F.count(F.lit(1)),
            n_null_cells=sum(
                (F.count(F.lit(1)) - F.count(c) for c in metric_cols),
                start=F.lit(0),
            ),
        )
        observations[name] = obs
        write_layer(view_obs, f"{out_dir}/views/{name}", run_date=run_date)
        if write_csv:
            write_view_csv(
                view_obs if run_date is None else view_obs,
                f"{out_dir}/views_csv/{name}",
            )
    return step_report("pipeline", observations, path=report_path)


def build_simple_views(
    spark: SparkSession, dataset_paths: dict[str, str], tables: tuple[str, ...]
) -> dict[str, DataFrame]:
    """The reference's 1:1 water views (``step5_create_views.py:446-497``):
    raw table minus flag columns (any casing) minus ``DTI_*`` code columns,
    republished under a ``v_`` prefix. Pure projection — Catalyst prunes the
    dropped columns at the scan, so each view costs a header-only pass until
    written."""
    from data_pipeline_ine_spark.operators.projections import (
        drop_flag_columns,
        drop_prefixed_columns,
    )

    out: dict[str, DataFrame] = {}
    for t in tables:
        if t not in dataset_paths:
            continue  # reference tolerates missing files (step5:692-695)
        raw = spark.read.option("header", True).csv(dataset_paths[t])
        out[f"v_{t}"] = drop_prefixed_columns(drop_flag_columns(raw))
    return out

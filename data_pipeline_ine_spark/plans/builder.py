"""View-definition interpreter: config → one lazy consolidated-view plan.

This is the Spark-first replacement for the reference's analytical core,
``crear_vista_consolidada_aire`` (``steps/step5_create_views.py:232-444``):
scaffold of distinct (period, station) pairs → per-member left merges →
rename/project. There, each view is ~N+2 pandas merges over whole files in
RAM; here a view is ONE lazy plan over the canonical long fact table
(SURVEY.md §1.4):

    facts.filter(dataset ∈ members)        — partition pruning on `dataset`
         .groupBy(period, station)
         .pivot(dataset, members)          — ONE shuffle, map-side partials
         .agg(first(value))
         .join(broadcast(label_dims))      — no fact shuffle

versus the reference's N sequential merges (N shuffles in a naive port).
Passing the member list to ``pivot`` skips Spark's distinct-values discovery
job — at 100 TB that alone saves a full scan.

Duplicate semantics (SURVEY.md §7.3): ``pivot.agg(first)`` dedups duplicate
(period, station, dataset) observations; the reference's left merges would fan
rows out. We pin the DEDUPE semantic (deterministic variant: ``agg_expr=
"max"``/``"min"``/``"avg"``) and expose the reference-faithful fan-out via
:func:`consolidate_joins`.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_pipeline_ine_spark.operators.joins import attach_label, chained_left_join
from data_pipeline_ine_spark.operators.setops import union_distinct


@dataclass(frozen=True)
class ViewDefinition:
    """One consolidated view = the reference's ``air_views`` /
    ``water_consolidated_views`` config entries
    (``steps/step5_create_views.py:41-194,196-216``) as data."""

    name: str
    members: tuple[str, ...]
    period_out: str = "period"  # output name, e.g. "mes" / "anio"
    station_out: str = "estacion"  # or "cuenca" via station_rename config
    granularity: str = "month"
    metric_renames: dict[str, str] = field(default_factory=dict)


def consolidate(
    facts: DataFrame,
    view: ViewDefinition,
    agg_expr: str = "first",
    period_col: str = "period_code",
    station_col: str = "station_code",
    dataset_col: str = "dataset",
    value_col: str = "value",
    label_dims: Sequence[tuple[DataFrame, str]] = (),
    min_records: int | None = None,
) -> DataFrame:
    """Pivot strategy (J4 option (a), SURVEY.md §2.3): one wide row per
    distinct (period, station), one metric column per member dataset, NULL
    where a member lacks that pair — exactly the reference's scaffold + left
    merges output shape (``step5:313-375``).

    Implementation detail that matters at 100 TB: because the member list is
    always known (it's the view config), the pivot is emitted as explicit
    conditional aggregates — ``agg(sum(when(dataset=m, value)) for m)`` —
    which is what ``pivot(col, values)`` compiles to anyway, but (a) skips
    nothing-to-learn codegen differences and (b) lets extra aggregates ride
    the SAME groupBy. That enables ``min_records``: the step-4 sparse-entity
    filter fused as a HAVING on the same shuffle. Unfused, sparse-filter +
    consolidation costs two scans and two shuffles of the fact table; fused
    it is ONE scan and ONE shuffle.

    ``label_dims`` is a list of ``(dim_df, join_key)`` to left-broadcast-join
    after the pivot (period/station label maps, J1/J2).
    """

    def cell(member: str):
        v = F.when(F.col(dataset_col) == member, F.col(value_col))
        return {
            "first": F.first(v, ignorenulls=True),
            "max": F.max(v),
            "min": F.min(v),
            "avg": F.avg(v),
            "sum": F.sum(v),
        }[agg_expr].alias(member)

    aggs = [cell(m) for m in view.members]
    if min_records is not None:
        aggs.append(F.count(F.col(value_col)).alias("_n_records"))

    wide = (
        facts.filter(F.col(dataset_col).isin(list(view.members)))
        .groupBy(period_col, station_col)
        .agg(*aggs)
    )
    if min_records is not None:
        wide = wide.filter(F.col("_n_records") >= min_records).drop("_n_records")
    for dim, key in label_dims:
        wide = attach_label(wide, dim, on=key)
    renames = {period_col: view.period_out, station_col: view.station_out}
    renames.update(view.metric_renames)
    return wide.withColumnsRenamed(renames)


def consolidate_joins(
    member_frames: dict[str, DataFrame],
    view: ViewDefinition,
    period_col: str = "period_code",
    station_col: str = "station_code",
    value_col: str = "value",
) -> DataFrame:
    """Chained-join strategy (J4 option (b)) — reference-faithful fallback.

    Builds the distinct-pair scaffold (U1, ``step5:313-328``) then left-joins
    each member's ``value`` as a metric column (``step5:352-375``), preserving
    the reference's duplicate fan-out. Kept for semantic parity tests and for
    views whose members need per-member aggregation expressions.
    """
    keys = [period_col, station_col]
    scaffold = union_distinct(
        [m.select(*keys) for m in member_frames.values()]
    ).orderBy(*keys)
    metrics = [
        m.select(*keys, F.col(value_col).alias(name))
        for name, m in member_frames.items()
    ]
    joined = chained_left_join(scaffold, metrics, on=keys)
    return joined.withColumnsRenamed(
        {period_col: view.period_out, station_col: view.station_out}
    )

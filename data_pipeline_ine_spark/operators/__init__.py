"""Operator library: each reference operator (SURVEY.md §2) as a composable
``DataFrame -> DataFrame`` function. All operators are lazy plan builders —
nothing executes until an action — and avoid driver-side materialization
(the reference's Python-set scaffold at ``steps/step5_create_views.py:313-328``
is the anti-pattern these replace)."""

from data_pipeline_ine_spark.operators.projections import (
    drop_columns,
    drop_flag_columns,
    drop_prefixed_columns,
    rename_columns,
    select_existing,
)
from data_pipeline_ine_spark.operators.filters import (
    non_null_non_empty,
    not_in_filter,
    sparse_entity_filter,
)
from data_pipeline_ine_spark.operators.aggregates import (
    dedup_on,
    distinct_count,
    distinct_values,
    group_count,
    percentile_summary,
)
from data_pipeline_ine_spark.operators.joins import (
    asof_join,
    attach_label,
    chained_left_join,
    salted_join,
    windowed_range_join,
)
from data_pipeline_ine_spark.operators.windows import sequential_id, top_k
from data_pipeline_ine_spark.operators.setops import union_all, union_distinct

__all__ = [
    "drop_columns",
    "drop_flag_columns",
    "drop_prefixed_columns",
    "rename_columns",
    "select_existing",
    "non_null_non_empty",
    "not_in_filter",
    "sparse_entity_filter",
    "dedup_on",
    "distinct_count",
    "distinct_values",
    "group_count",
    "percentile_summary",
    "asof_join",
    "attach_label",
    "chained_left_join",
    "salted_join",
    "windowed_range_join",
    "sequential_id",
    "top_k",
    "union_all",
    "union_distinct",
]

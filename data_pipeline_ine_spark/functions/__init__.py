"""Scalar function layer (SURVEY.md §2.7) + the numeric-coercion heuristic."""

from data_pipeline_ine_spark.functions.scalars import (
    sanitize_name,
    strip_suffix,
    view_name,
)
from data_pipeline_ine_spark.functions.coercion import coerce_numeric_columns, numeric_ratio

__all__ = [
    "sanitize_name",
    "strip_suffix",
    "view_name",
    "coerce_numeric_columns",
    "numeric_ratio",
]

"""Projection operators (SURVEY.md §2.2 P1-P4, P8).

Column pruning itself is a Catalyst built-in — these helpers exist for the
reference's *variant tolerance*: probing which of several candidate column
names a table actually has happens at plan-build time against ``df.columns``
(schema metadata), never as a data scan.
"""

from __future__ import annotations

from collections.abc import Iterable, Mapping

from pyspark.sql import DataFrame

from data_pipeline_ine_spark.schemas import FLAG_COLUMN_VARIANTS


def drop_columns(df: DataFrame, *names: str) -> DataFrame:
    """P1 — drop a fixed list, silently skipping missing names.

    Reference: ``steps/step3_remove_columns.py:56-59`` (checks membership per
    column). Spark's ``drop`` already ignores unknown names, so the variant
    tolerance is free.
    """
    return df.drop(*names)


def drop_flag_columns(df: DataFrame) -> DataFrame:
    """P1 — remove ``Flag Codes``/``Flags`` in any of 6 casings.

    Reference: ``steps/step3_remove_columns.py:25`` (COLUMNS_TO_REMOVE).
    """
    return df.drop(*FLAG_COLUMN_VARIANTS)


def drop_prefixed_columns(df: DataFrame, prefix: str = "DTI_") -> DataFrame:
    """P2 — drop all columns with a name prefix.

    Reference: ``steps/step5_create_views.py:410-414`` (drop ``DTI_*`` code
    columns from water views).
    """
    return df.drop(*[c for c in df.columns if c.startswith(prefix)])


def select_existing(df: DataFrame, cols: Iterable[str]) -> DataFrame:
    """P3 — existence-checked projection, keeping requested order.

    Reference: ``steps/step5_create_views.py:400-408`` (select final view
    columns, warn-skip missing).
    """
    present = set(df.columns)
    return df.select(*[c for c in cols if c in present])


def rename_columns(df: DataFrame, mapping: Mapping[str, str]) -> DataFrame:
    """P4 — bulk rename via a single projection.

    Reference: ``steps/step5_create_views.py:370-372,377-395`` (Value→metric
    name, code/label → mes/anio/estacion). One ``withColumnsRenamed`` keeps it
    a single plan node instead of N chained projections.
    """
    present = {k: v for k, v in mapping.items() if k in df.columns}
    return df.withColumnsRenamed(present) if present else df

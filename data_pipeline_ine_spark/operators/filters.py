"""Filter operators (SURVEY.md §2.2 P5-P7; §2.4 A1+A2 sparse-entity filter).

All predicates are Catalyst expressions so they push down to the parquet scan
(``PushedFilters`` in the physical plan) — the reference filters after loading
the whole file into RAM (``steps/step4_filter_stations.py:106-110``).
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def non_null_non_empty(df: DataFrame, *cols: str) -> DataFrame:
    """P5 — drop rows where any ``col`` is NULL (or, for strings, empty).

    Reference: ``steps/step4_filter_stations.py:106-110``. The empty-string
    check only applies to string columns — under ANSI mode (Spark 4 default)
    comparing a numeric column to ``''`` would raise a cast error.
    """
    string_cols = {
        f.name for f in df.schema.fields if isinstance(f.dataType, T.StringType)
    }
    pred = F.lit(True)
    for name in cols:
        c = F.col(name)
        p = c.isNotNull()
        if name in string_cols:
            p = p & (c != F.lit(""))
        pred = pred & p
    return df.filter(pred)


def not_in_filter(df: DataFrame, col: str, values: Iterable[str]) -> DataFrame:
    """P6 — literal NOT-IN membership filter.

    Reference: ``steps/step4_filter_stations.py:142``
    (``df[~df[col].isin(lst)]``). Fine for small driver-side lists; for a
    distributed exclusion set use :func:`sparse_entity_filter`'s anti-join.
    """
    return df.filter(~F.col(col).isin(list(values)))


def sparse_entity_filter(
    df: DataFrame,
    entity_cols: str | list[str],
    value_col: str = "value",
    min_records: int = 3,
) -> DataFrame:
    """Step-4 semantics: remove entities with fewer than ``min_records``
    non-null measurements, after dropping NULL/empty entity rows.

    Reference: ``steps/step4_filter_stations.py:106-142`` (count per station
    ``:116``, threshold ``< MIN_REGISTROS``=3 ``:119,40``, NOT-IN removal
    ``:142``). Generalized to composite entity keys.

    Scale note: the reference collects the sparse-station list into a Python
    list and uses ``isin`` — unbounded driver state. Here the exclusion set
    stays distributed and is applied as a LEFT ANTI join on the grouping key;
    the counted side is one row per entity, so it broadcasts and the fact
    table is filtered without a second shuffle.
    """
    keys = [entity_cols] if isinstance(entity_cols, str) else list(entity_cols)
    clean = non_null_non_empty(df, *keys)
    sparse = (
        clean.groupBy(*keys)
        .agg(F.count(F.col(value_col)).alias("_n"))
        .filter(F.col("_n") < min_records)
        .select(*keys)
    )
    return clean.join(F.broadcast(sparse), on=keys, how="left_anti")

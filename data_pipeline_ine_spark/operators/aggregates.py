"""Aggregation operators (SURVEY.md §2.4 A1-A8).

All are single ``groupBy().agg()`` plans → map-side partial aggregation +
one shuffle, whole-stage codegen'd. Exact distinct counts are kept for oracle
parity; at 100 TB swap ``countDistinct`` → ``approx_count_distinct`` where a
1-2% error is acceptable (noted per function).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def group_count(df: DataFrame, keys: Sequence[str], value_col: str | None = None) -> DataFrame:
    """A1/A6 — records per group (count of non-null ``value_col`` if given).

    Reference: ``steps/step4_filter_stations.py:116``.
    """
    agg = F.count(F.col(value_col)) if value_col else F.count(F.lit(1))
    return df.groupBy(*keys).agg(agg.alias("n"))


def distinct_count(df: DataFrame, col: str, approx: bool = False) -> DataFrame:
    """A3 — number of distinct values of ``col``.

    Reference: ``steps/step4_filter_stations.py:122,145`` (``nunique()``).
    ``approx=True`` switches to HyperLogLog++ (one pass, no exact-distinct
    shuffle explosion) for the 100 TB path.
    """
    fn = F.approx_count_distinct if approx else F.countDistinct
    return df.agg(fn(F.col(col)).alias("n_distinct"))


def distinct_values(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """A4 — distinct values of a column set (catalog building).

    Reference: ``steps/step5_create_views.py:583,599`` (``unique()``).
    """
    return df.select(*cols).distinct()


def dedup_on(df: DataFrame, subset: Sequence[str]) -> DataFrame:
    """A5 — ``dropDuplicates(subset)``.

    Reference: ``steps/step5_create_views.py:324,335,344,349,610``.
    Note: which survivor row wins is nondeterministic (same as pandas'
    file-order-dependent ``drop_duplicates``); for deterministic survivors use
    a ``row_number`` window or ``groupBy().agg(min(...))`` instead.
    """
    return df.dropDuplicates(list(subset))


def percentile_summary(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    percentiles: Sequence[float] = (0.5, 0.9, 0.95, 0.98, 0.99),
    approx: bool = False,
) -> DataFrame:
    """A8 — per-group percentiles of ``value_col``.

    30 of the reference's 87 datasets *are* pre-computed percentile tables
    (``steps/step5_create_views.py:59,91,107``); this reproduces those
    semantics from raw observations. Exact ``percentile`` matches a SQL
    oracle; ``approx=True`` uses ``percentile_approx`` (t-digest style sketch,
    mergeable map-side — the 100 TB default).
    """
    fn = F.percentile_approx if approx else F.percentile
    aggs: list[Column] = [
        fn(F.col(value_col), F.lit(p)).alias(f"p{int(p * 100)}") for p in percentiles
    ]
    return df.groupBy(*keys).agg(*aggs)


def mode_per_group(
    df: DataFrame, group_cols: list[str], value_col: str
) -> DataFrame:
    """Deterministic per-group mode: the most frequent value, ties
    broken by the smallest value — the categorical summary statistic
    (typical event type per user, dominant language per domain, modal
    flag per station) with a total order, so any engine returns the
    identical row.

    Scale shape: one (group, value) count aggregate, then ONE more
    group-keyed aggregate taking ``min(struct(-count, value))`` — the
    argmin trick keeps it a pure hash aggregate: no window, no sort,
    no per-group row explosion. Both shuffles hash-partition on the
    group prefix, so AQE folds them into one exchange where
    partitioning already matches.
    """
    counts = df.groupBy(*group_cols, value_col).agg(
        F.count(F.lit(1)).alias("_cnt")
    )
    best = counts.groupBy(*group_cols).agg(
        F.min(F.struct((-F.col("_cnt")).alias("nc"), F.col(value_col))).alias(
            "_b"
        )
    )
    return best.select(
        *group_cols,
        F.col("_b")[value_col].alias(f"modal_{value_col}"),
        (-F.col("_b")["nc"]).cast("bigint").alias("n_modal"),
    )

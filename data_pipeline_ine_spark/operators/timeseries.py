"""Regular-grid time-series operators: gap filling and observation carrying.

A metrics table is almost never dense — sensors drop readings, users skip
days — yet every downstream consumer (charting, trailing windows over
COUNTS, ML feature frames) wants one row per (key, period). These
operators densify a sparse series and fill the holes, the distributed
analog of pandas ``asfreq``/``ffill`` (which the reference's pandas layer
gets implicitly via ``DataFrame.reindex``-style consolidation; here the
scaffold join in ``plans/builder.py`` is the same idea for entity × period
grids — this module generalizes it to per-key date ranges).

Scale shape (the reason this is not a driver-side loop):

- ``gap_fill``: one O(keys) aggregate finds each key's [min, max] span; the
  scaffold is a narrow ``sequence``+``explode`` from that tiny frame (rows
  out = span days, never corpus-sized intermediates); one equi-join shuffle
  on (key, period) re-attaches observations. Total: 2 shuffles, both keyed
  — no driver state, no global sort.
- ``locf``/``nocb``: a running ``last(ignorenulls)``/``first(ignorenulls)``
  window per key, ordered by period. One shuffle; partition size is a
  key's span in periods (bounded by calendar, not corpus), so no skew
  hazard even when event volume is skewed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def gap_fill(
    df: DataFrame,
    key_col: str,
    period_col: str,
    step: str = "interval 1 day",
) -> DataFrame:
    """Densify ``df`` to one row per (key, period) over each key's observed
    [min, max] period span; periods with no observation carry NULLs in
    every other column.

    ``period_col`` must be a date/timestamp column already truncated to the
    grid (e.g. ``CAST(ts AS DATE)`` for daily). ``step`` is the grid pitch
    as a Spark interval literal.
    """
    spans = df.groupBy(key_col).agg(
        F.min(period_col).alias("_mn"), F.max(period_col).alias("_mx")
    )
    scaffold = spans.select(
        key_col,
        F.explode(
            F.sequence(F.col("_mn"), F.col("_mx"), F.expr(step))
        ).alias(period_col),
    )
    return scaffold.join(df, [key_col, period_col], "left")


def _carry_window(key_col: str, period_col: str, forward: bool) -> Window:
    w = Window.partitionBy(key_col).orderBy(period_col)
    if forward:
        return w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return w.rowsBetween(Window.currentRow, Window.unboundedFollowing)


def locf(
    df: DataFrame,
    key_col: str,
    period_col: str,
    value_col: str,
    out_col: str | None = None,
) -> DataFrame:
    """Last observation carried forward: fill NULL ``value_col`` with the
    most recent non-null earlier value within the key. Leading NULLs (no
    earlier observation) stay NULL."""
    filled: Column = F.last(value_col, ignorenulls=True).over(
        _carry_window(key_col, period_col, forward=True)
    )
    return df.withColumn(out_col or value_col, filled)


def nocb(
    df: DataFrame,
    key_col: str,
    period_col: str,
    value_col: str,
    out_col: str | None = None,
) -> DataFrame:
    """Next observation carried backward — the mirror of ``locf`` for
    series whose semantics back-fill (e.g. "price effective until")."""
    filled: Column = F.first(value_col, ignorenulls=True).over(
        _carry_window(key_col, period_col, forward=False)
    )
    return df.withColumn(out_col or value_col, filled)

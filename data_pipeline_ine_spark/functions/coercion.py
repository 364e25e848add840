"""The >50%-numeric coercion heuristic (SURVEY.md §2.7 F4, §4).

Reference: ``steps/step6_upload_to_db.py:55-74`` (``limpiar_dataframe``) — for
every object column, try ``pd.to_numeric(errors='coerce')`` and keep the
numeric version iff >50% of non-null rows convert. This is the reference's
only type-system decision and the one genuinely custom piece of engine logic
(SURVEY.md §4 verdict).

Spark-first redesign: the heuristic needs per-column convertibility RATIOS
before deciding — a classic two-pass:

1. ONE aggregate job computes all candidate columns' ratios at once
   (single scan, map-side partials — not one job per column).
2. A plan-time projection casts the winners with ``try_cast`` (NULL on
   failure, exactly ``errors='coerce'``); losers are untouched.

NaN→NULL (F5, ``step6:61``) is a non-event: Spark nulls are SQL NULL already.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def numeric_ratio(df: DataFrame, cols: list[str] | None = None) -> dict[str, float]:
    """Pass 1 — fraction of non-null values that parse as DOUBLE, for every
    string column (or ``cols``), in a single aggregate job."""
    cols = cols or [
        f.name for f in df.schema.fields if isinstance(f.dataType, T.StringType)
    ]
    if not cols:
        return {}
    aggs = [
        (
            F.sum(F.col(c).try_cast("double").isNotNull().cast("int"))
            / F.greatest(F.sum(F.col(c).isNotNull().cast("int")), F.lit(1))
        ).alias(c)
        for c in cols
    ]
    row = df.agg(*aggs).first()
    return {c: float(row[c] or 0.0) for c in cols}


def coerce_numeric_columns(
    df: DataFrame, threshold: float = 0.5, cols: list[str] | None = None
) -> DataFrame:
    """Pass 2 — cast columns whose ratio exceeds ``threshold`` (strictly
    greater, matching the reference's ``> 0.5`` at ``step6:70``)."""
    ratios = numeric_ratio(df, cols)
    winners = {c: r for c, r in ratios.items() if r > threshold}
    if not winners:
        return df
    return df.select(
        *[
            F.col(c).try_cast("double").alias(c) if c in winners else F.col(c)
            for c in df.columns
        ]
    )

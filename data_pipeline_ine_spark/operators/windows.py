"""Window / sort / limit operators (SURVEY.md §2.5 W1, O1-O4).

Scale note: a global ``row_number`` over an unpartitioned window serializes
onto one task. ``sequential_id`` keeps the reference's exact semantics for
catalog-sized outputs (hundreds of rows); for billion-row surrogate keys use
``monotonically_increasing_id`` or ``zipWithIndex``-free dense ranks per
partition key instead.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sequential_id(
    df: DataFrame, order_by: Sequence[str], id_col: str = "id"
) -> DataFrame:
    """W1 — assign ``1..N`` ids after a total sort.

    Reference: ``steps/step5_create_views.py:611-614`` (entity catalog PK).
    ``order_by`` should be a total order (include a unique tiebreaker) so ids
    are deterministic.
    """
    w = Window.orderBy(*[F.col(c) for c in order_by])
    return df.withColumn(id_col, F.row_number().over(w))


def top_k(df: DataFrame, order_by: Sequence, k: int) -> DataFrame:
    """O2 — top-k rows by a sort spec (pass desc() columns for descending).

    Reference: ``steps/step4_filter_stations.py:290-295`` (top-5 report).
    Spark executes orderBy+limit as TakeOrderedAndProject — per-partition
    top-k then a k-row merge on the driver; no global sort materializes.
    """
    return df.orderBy(*order_by).limit(k)

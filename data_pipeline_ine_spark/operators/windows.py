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


def skyline_2d(
    df: DataFrame,
    minimize: str,
    maximize: str,
    num_partitions: int = 32,
) -> DataFrame:
    """Pareto frontier (skyline) over two criteria: keep rows no other
    row strictly dominates, where ``q`` dominates ``p`` iff
    ``q.minimize <= p.minimize AND q.maximize >= p.maximize`` with at
    least one strict. The classic multi-criteria shortlist operator
    (Borzsony/Kossmann/Stocker, ICDE 2001) — e.g. "parts not beaten on
    both price and size at once".

    Scale shape: the naive test is an all-pairs NOT EXISTS (the oracle
    form); the sorted formulation needs a cumulative max over the
    ``minimize`` order, and a single global window = one task at 100 TB.
    Here the cumulative max is two-phase, the distributed-rank pattern:
    (1) collapse to distinct ``minimize`` values with their group max —
    key-cardinality sized; (2) range-partition those groups by
    ``minimize``, local running max per partition; (3) a
    partition-count-sized (not data-sized) window over per-partition
    maxima yields each partition's prefix offset, broadcast-joined
    back. A row survives iff its ``maximize`` equals its value-group's
    max AND strictly exceeds the running max of every cheaper group —
    algebraically identical to the all-pairs dominance test, including
    duplicate (min,max) rows, which tie and are all kept.
    """
    val = F.col(minimize)
    grp = df.groupBy(val.alias("_v")).agg(F.max(maximize).alias("_gmax"))
    parts = grp.repartitionByRange(num_partitions, "_v").withColumn(
        "_pid", F.spark_partition_id()
    )
    w_local = (
        Window.partitionBy("_pid")
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = parts.withColumn("_prev_local", F.max("_gmax").over(w_local))
    # partition-count rows: the only global window runs over ~num_partitions
    # entries, never the data
    w_prefix = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    prefix = (
        parts.groupBy("_pid")
        .agg(F.max("_gmax").alias("_pmax"))
        .withColumn("_prefix", F.max("_pmax").over(w_prefix))
        .select("_pid", "_prefix")
    )
    bounds = local.join(F.broadcast(prefix), "_pid").select(
        "_v",
        "_gmax",
        # greatest() skips NULLs: first-group rows see only the prefix,
        # first-partition rows only the local max, the global minimum neither
        F.greatest("_prev_local", "_prefix").alias("_before"),
    )
    joined = df.join(bounds, df[minimize] == bounds["_v"])
    return joined.filter(
        (F.col(maximize) == F.col("_gmax"))
        & (F.col("_before").isNull() | (F.col(maximize) > F.col("_before")))
    ).drop("_v", "_gmax", "_before")

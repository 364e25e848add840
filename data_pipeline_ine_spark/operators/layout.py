"""Data-layout operators: multi-dimensional clustering via space-filling
curves (Z-order / Morton interleaving).

Why this exists at 100 TB: Parquet scan pruning is one-dimensional — sort
the data by ``date`` and a ``customer`` predicate still reads every file.
Interleaving the bits of several key columns into one Morton key and
range-clustering on it gives every dimension locality at once: a
predicate on ANY of the interleaved dimensions maps to a bounded set of
key ranges, so file/row-group min-max statistics prune on all of them
(the technique behind Delta/Iceberg ``OPTIMIZE ZORDER BY``; public
formulation in Morton 1966 and the UB-tree literature, Bayer 1997).

The key is pure integer bit arithmetic — computed JVM-side from built-in
expressions, engine-reproducible, and cheap enough to stamp on every row
at write time.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_BITS = 16


def morton_key(x: Column | str, y: Column | str, bits: int = DEFAULT_BITS) -> Column:
    """Interleave the low ``bits`` bits of two non-negative integer
    columns into one Z-order key: bit ``i`` of ``x`` lands at position
    ``2i``, bit ``i`` of ``y`` at ``2i+1``.

    Unrolled into ``2·bits`` mask-shift-add terms of built-in expressions
    (one whole-stage-codegen projection, no UDF). Callers must pre-fold
    each dimension into ``[0, 2^bits)`` — e.g. ``col % 65536`` or a
    quantile bucket id — because bits above the budget are silently
    dropped by the masking.
    """
    xc = F.col(x) if isinstance(x, str) else x
    yc = F.col(y) if isinstance(y, str) else y
    terms = []
    for i in range(bits):
        terms.append(
            F.shiftright(xc.cast("bigint"), i).bitwiseAND(F.lit(1))
            * F.lit(1 << (2 * i))
        )
        terms.append(
            F.shiftright(yc.cast("bigint"), i).bitwiseAND(F.lit(1))
            * F.lit(1 << (2 * i + 1))
        )
    return reduce(lambda a, b: a + b, terms).cast("bigint")


def morton_key_sql(x_expr: str, y_expr: str, bits: int = DEFAULT_BITS) -> str:
    """ANSI-SQL rendering of :func:`morton_key` — the same unrolled
    mask-shift-add sum, so any engine reproduces the key bit-for-bit
    (used by the driver oracle)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x_expr}) >> {i}) & 1) * {1 << (2 * i)}")
        terms.append(f"((({y_expr}) >> {i}) & 1) * {1 << (2 * i + 1)}")
    return " + ".join(terms)


def cluster_by_zorder(
    df: DataFrame,
    x: Column | str,
    y: Column | str,
    num_partitions: int,
    bits: int = DEFAULT_BITS,
) -> DataFrame:
    """Range-cluster a DataFrame by the Morton key of two dimensions —
    the write-side layout step before a partitioned/bucketed sink.

    ``repartitionByRange`` samples the key distribution so output files
    hold contiguous Z-ranges (balanced even when the key space is
    sparse), and the within-partition sort tightens per-row-group min/max
    stats — the two properties multi-dimensional scan pruning needs.
    The ``_zkey`` column is kept so writers can also partition or bucket
    on a key prefix (``_zkey >> k`` = quadtree cell at level ``bits-k/2``).
    """
    keyed = df.withColumn("_zkey", morton_key(x, y, bits))
    return keyed.repartitionByRange(num_partitions, "_zkey").sortWithinPartitions(
        "_zkey"
    )

"""Set operators (SURVEY.md §2.6 U1-U3).

The reference accumulates key pairs in driver-side Python sets
(``steps/step5_create_views.py:313-328``) — O(all pairs) driver memory. These
stay distributed: union is a zero-shuffle plan concat; ``distinct`` is one
hash-aggregate shuffle with map-side partial dedup.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import DataFrame


def union_all(frames: Sequence[DataFrame]) -> DataFrame:
    """U2/U3 — ``unionByName`` across frames (missing cols filled with NULL)."""
    return reduce(
        lambda a, b: a.unionByName(b, allowMissingColumns=True), frames
    )


def union_distinct(frames: Sequence[DataFrame]) -> DataFrame:
    """U1 — distinct union of projections (the consolidation scaffold).

    Reference: ``steps/step5_create_views.py:313-328`` (set-union of
    (period, station) pairs across member tables).
    """
    return union_all(frames).distinct()


def union_by_name_widen(frames: Sequence[DataFrame]) -> DataFrame:
    """Schema-evolution union: ``unionByName`` across frames whose
    schemas DRIFTED — later batches add columns, widen ints to longs,
    floats to doubles, or decimals' precision. The multi-day ingestion
    primitive (`union_all` above requires type-identical shared
    columns; this resolves them first).

    Per shared column name, the target type comes from a promotion
    lattice instead of failing the union:

    - identical types: unchanged
    - both integral (byte/short/int/long): the wider integral
    - any fractional (float/double) or integral+fractional: double
    - both decimal: max precision/scale that loses neither side
    - anything else mismatched: string (the lossless common carrier)

    Missing columns NULL-fill (``allowMissingColumns``). Pure plan-time
    metadata work + per-row casts in the scan stage — no shuffle; the
    result's column order follows first appearance across ``frames``.
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    _INTS = {
        T.ByteType(): 1, T.ShortType(): 2, T.IntegerType(): 3, T.LongType(): 4,
    }

    def promote(a: T.DataType, b: T.DataType) -> T.DataType:
        if a == b:
            return a
        if a in _INTS and b in _INTS:
            return a if _INTS[a] >= _INTS[b] else b
        numeric = set(_INTS) | {T.FloatType(), T.DoubleType()}
        if a in numeric and b in numeric:
            return T.DoubleType()
        if isinstance(a, T.DecimalType) and isinstance(b, T.DecimalType):
            scale = max(a.scale, b.scale)
            ipart = max(a.precision - a.scale, b.precision - b.scale)
            return T.DecimalType(min(38, ipart + scale), scale)
        return T.StringType()

    target: dict[str, T.DataType] = {}
    for f in frames:
        for field in f.schema.fields:
            target[field.name] = (
                promote(target[field.name], field.dataType)
                if field.name in target
                else field.dataType
            )

    def conform(df: DataFrame) -> DataFrame:
        cols = []
        for field in df.schema.fields:
            want = target[field.name]
            c = F.col(field.name)
            cols.append(
                c.cast(want).alias(field.name) if field.dataType != want else c
            )
        return df.select(*cols)

    return reduce(
        lambda a, b: a.unionByName(b, allowMissingColumns=True),
        [conform(f) for f in frames],
    )

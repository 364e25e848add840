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

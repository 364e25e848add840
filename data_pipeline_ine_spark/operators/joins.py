"""Join operators (SURVEY.md §2.3 J1-J3).

Label-attachment joins always broadcast the dimension side: the reference's
mapping tables are ≤ a few hundred rows (``steps/step5_create_views.py:336``),
and at 100 TB broadcasting the dim avoids shuffling the fact table entirely —
the single most important join decision at scale.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attach_label(
    df: DataFrame,
    dim: DataFrame,
    on: str | Sequence[str],
    how: str = "left",
    broadcast_dim: bool = True,
) -> DataFrame:
    """J1/J2 — attach human-readable label columns from a small dimension.

    Reference: ``steps/step5_create_views.py:333-336`` (period label map) and
    ``:338-350`` (station label map unioned across member tables then
    deduped). Build the dim with ``union_distinct`` first when combining maps.
    """
    keys = [on] if isinstance(on, str) else list(on)
    right = F.broadcast(dim) if broadcast_dim else dim
    return df.join(right, on=keys, how=how)


def chained_left_join(
    base: DataFrame,
    others: Sequence[DataFrame],
    on: Sequence[str],
    how: str = "left",
) -> DataFrame:
    """J3/J4 fallback strategy — scaffold ⟕ member₁ ⟕ … ⟕ memberₙ.

    Reference: ``steps/step5_create_views.py:352-375`` (per-member merge
    loop). Prefer the pivot strategy in ``plans/builder.py`` (one shuffle);
    this N-join form is kept because it preserves the reference's duplicate
    fan-out semantics (SURVEY.md §7.3) and exercises Catalyst's join planning.
    """
    return reduce(lambda acc, t: acc.join(t, on=list(on), how=how), others, base)

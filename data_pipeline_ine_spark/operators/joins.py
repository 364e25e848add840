"""Join operators (SURVEY.md §2.3 J1-J3).

Label-attachment joins always broadcast the dimension side: the reference's
mapping tables are ≤ a few hundred rows (``steps/step5_create_views.py:336``),
and at 100 TB broadcasting the dim avoids shuffling the fact table entirely —
the single most important join decision at scale.
"""

from __future__ import annotations

import math
from collections.abc import Sequence
from functools import reduce

from pyspark.sql import Column, DataFrame, Window
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


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    payload_cols: Sequence[str] = (),
    suffix: str = "_asof",
    direction: str = "backward",
) -> DataFrame:
    """Inclusive as-of join: each left row picks, per key, the latest right
    row with ``right_ts <= left_ts`` (``direction="backward"``, default) or
    the earliest with ``right_ts >= left_ts`` (``direction="forward"``) —
    NULL payloads if none. Matches DuckDB ``ASOF JOIN`` / pandas
    ``merge_asof`` direction semantics.

    Spark has no ASOF JOIN operator, and the naive formulation — inequality
    join + per-left-row max — is an O(n·m)-per-key blowup. This is the
    scalable union-tag reformulation: union both sides, ONE shuffle by key,
    sort within partition by time, and carry the last non-null payload
    forward with an unbounded-preceding window. Cost is that of a single
    groupBy of the combined tables regardless of match fan-out; skewed keys
    are handled by AQE like any other shuffle.

    Inclusivity at equal timestamps is a sort-order trick: backward sorts
    right rows before left (``_src`` 0 < 1) and carries the last non-null
    payload up to the current row; forward sorts them after and pulls the
    first non-null payload from the current row on.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)
    out_cols = list(left.columns)
    payloads = list(payload_cols)
    backward = direction == "backward"
    left_tag, right_tag = (1, 0) if backward else (0, 1)
    tagged_left = left.withColumn("_t", F.col(left_ts)).withColumn(
        "_src", F.lit(left_tag)
    )
    tagged_right = right.select(
        *keys,
        F.col(right_ts).alias("_t"),
        *[F.col(c).alias(f"{c}{suffix}") for c in payloads],
    ).withColumn("_src", F.lit(right_tag))
    u = tagged_left.unionByName(tagged_right, allowMissingColumns=True)
    base = Window.partitionBy(*keys).orderBy("_t", "_src")
    if backward:
        w = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        pick = lambda c: F.last(c, ignorenulls=True)  # noqa: E731
    else:
        w = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        pick = lambda c: F.first(c, ignorenulls=True)  # noqa: E731
    for c in payloads:
        u = u.withColumn(f"{c}{suffix}", pick(f"{c}{suffix}").over(w))
    return u.filter(F.col("_src") == F.lit(left_tag)).select(
        *out_cols, *[f"{c}{suffix}" for c in payloads]
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-mitigated equi-join: fan the hot keys of ``left`` across
    ``n_salts`` shuffle partitions by appending a salt to the join key;
    ``right`` is exploded ``n_salts``-fold so every salted key still matches.

    Use when one side has a few pathologically hot keys and the other side is
    too large to broadcast: a plain shuffle join puts each hot key in ONE
    task (straggler), salting spreads it over ``n_salts`` tasks at the cost
    of replicating the right side's matching rows. AQE's skew-join splitting
    (enabled in ``session.py``) handles most cases at runtime; this operator
    is for plans where the skew is known up front (e.g. the null/default
    station code holding 30% of a 100 TB fact table) or where AQE can't
    split (e.g. a following aggregation pins the partitioning).

    The salt is ``xxhash64`` of the left row's non-key columns —
    deterministic (re-runs produce identical partitioning, no ``rand()``
    in the plan) and uniform enough to spread any single key.
    """
    keys = [on] if isinstance(on, str) else list(on)
    non_key = [c for c in left.columns if c not in keys] or keys
    salted_left = left.withColumn(
        "_salt", F.pmod(F.xxhash64(*non_key), F.lit(n_salts)).cast("int")
    )
    salted_right = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return salted_left.join(salted_right, on=[*keys, "_salt"], how=how).drop("_salt")


def _ntz_epoch_seconds(c: Column) -> Column:
    """Wall-clock seconds since epoch from a TIMESTAMP_NTZ, via field
    extraction only — no session-timezone math, so binning is stable under
    any ``spark.sql.session.timeZone`` (and immune to DST non-linearity)."""
    days = F.datediff(F.to_date(c), F.lit("1970-01-01").cast("date")).cast("bigint")
    return days * 86400 + F.hour(c) * 3600 + F.minute(c) * 60 + F.second(c)


def windowed_range_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    window_seconds: int = 3600,
    bin_seconds: int | None = None,
) -> DataFrame:
    """Range join — right rows with ``left_ts - window <= right_ts < left_ts``
    per key — rewritten as an equi-join on (key, time-bin) plus a residual
    filter.

    A raw range predicate forces Spark into BroadcastNestedLoopJoin or a
    per-key cartesian inside SortMergeJoin — O(n·m) per key, unusable at
    scale. Binning makes it a plain hash-partitioned equi-join: the left side
    explodes the ⌈window/bin⌉+1 candidate bins its window covers, the right
    side joins on its single bin, and the exact inequality runs only on
    same-bin candidates. Candidate fan-in per row is bounded by bin width,
    so cost scales with data density, not table sizes.
    """
    bin_seconds = bin_seconds or window_seconds
    keys = [on] if isinstance(on, str) else list(on)
    overlap = (set(left.columns) & set(right.columns)) - set(keys)
    if overlap:
        raise ValueError(
            f"non-key columns shared by both sides: {sorted(overlap)}; "
            "alias them before the range join"
        )
    n_back = math.ceil(window_seconds / bin_seconds)
    lbin = F.floor(_ntz_epoch_seconds(F.col(left_ts)) / bin_seconds)
    rbin = F.floor(_ntz_epoch_seconds(F.col(right_ts)) / bin_seconds)
    exploded = left.withColumn(
        "_bin", F.explode(F.sequence(lbin - n_back, lbin))
    )
    candidates = exploded.join(right.withColumn("_bin", rbin), on=[*keys, "_bin"])
    lo = F.col(left_ts) - F.make_dt_interval(secs=F.lit(float(window_seconds)))
    return candidates.filter(
        (F.col(right_ts) >= lo) & (F.col(right_ts) < F.col(left_ts))
    ).drop("_bin")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_start: str = "start",
    left_end: str = "end",
    right_start: str = "start_r",
    right_end: str = "end_r",
    grid_days: int = 30,
) -> DataFrame:
    """Interval×interval overlap join — pairs whose [start, end] DATE
    ranges intersect (inclusive) — as a grid-bucketed equi-join.

    The naive formulation (``l.start <= r.end AND r.start <= l.end``) has
    no equi-key, so Spark plans a nested-loop join: O(n·m) per key group
    and a broadcast requirement — the classic scale killer for validity-
    interval × validity-interval work (SCD2 vs campaign windows, shipment
    overlap, concurrent-session analysis). Here both sides explode onto a
    fixed ``grid_days`` calendar grid (an interval lands in every cell it
    touches — ⌈len/grid⌉+1 rows), the join is a plain hash equi-join on
    (keys, cell), and the exact predicate runs on same-cell candidates
    only.

    Duplicate suppression is arithmetic, not a shuffle: an overlapping
    pair shares every cell their intersection spans, so the pair is
    emitted ONLY in the first such cell — ``cell == cell(max(starts))``
    (the spatial-join "report at first common tile" trick). No
    dropDuplicates pass over the candidate stream.

    Grid sizing: cost is Σ_cell (left-in-cell × right-in-cell); pick
    ``grid_days`` near the typical interval length so each interval
    touches O(1) cells while cells stay narrow enough to bound occupancy.
    Intervals with ``end < start`` are dropped (F.sequence would silently
    enumerate a DESCENDING range and corrupt candidates).
    """
    keys = [on] if isinstance(on, str) else list(on)
    overlap_cols = (set(left.columns) & set(right.columns)) - set(keys)
    if overlap_cols:
        raise ValueError(
            f"non-key columns shared by both sides: {sorted(overlap_cols)}; "
            "alias them before the overlap join"
        )

    epoch = F.lit("1970-01-01").cast("date")

    def cell(c: str) -> Column:
        return F.floor(F.datediff(F.col(c), epoch) / grid_days)

    l = left.filter(F.col(left_end) >= F.col(left_start)).withColumn(
        "_cell", F.explode(F.sequence(cell(left_start), cell(left_end)))
    )
    r = right.filter(F.col(right_end) >= F.col(right_start)).withColumn(
        "_cell", F.explode(F.sequence(cell(right_start), cell(right_end)))
    )
    first_common = F.floor(
        F.datediff(F.greatest(F.col(left_start), F.col(right_start)), epoch)
        / grid_days
    )
    return (
        l.join(r, on=[*keys, "_cell"])
        .filter(
            (F.col(left_start) <= F.col(right_end))
            & (F.col(right_start) <= F.col(left_end))
            & (F.col("_cell") == first_common)
        )
        .drop("_cell")
    )


def linear_attribution(
    conversions: DataFrame,
    touches: DataFrame,
    on: str = "user_id",
    conv_id: str = "event_id",
    conv_ts: str = "ts",
    touch_ts: str = "click_ts",
    touch_tiebreak: str = "touch_id",
    value_col: str = "value",
    window_seconds: int = 3600,
) -> DataFrame:
    """Multi-touch LINEAR attribution: each conversion's value is split
    in equal exact-cent shares across every touch in its lookback
    window, remainder cents to the EARLIEST touch — so per-conversion
    attribution sums to the conversion value to the cent (conservation,
    property-tested), unlike a float split that leaks pennies.

    Returns one row per (conversion, touch): ``(conv_id, user, touch
    rank, attributed_cents)``; conversions with no touch in window emit
    nothing (they're the last-touch-unattributable bucket a marketing
    report shows separately).

    Scale shape: the candidate join is the binned ``windowed_range_join``
    (equi-join on (key, time-bin), never key-only); the per-conversion
    rank window and count are conversion-keyed — touch fan-in per
    conversion is window-bounded. All arithmetic is integer cents:
    ``share = cents div n``, ``cents mod n`` extra to rank 1.
    ``touch_tiebreak`` (a unique touch id) makes the rank — and
    therefore who receives the remainder — a total order.
    """
    cands = windowed_range_join(
        conversions.select(conv_id, on, conv_ts, value_col),
        touches,
        on=on,
        left_ts=conv_ts,
        right_ts=touch_ts,
        window_seconds=window_seconds,
    )
    w = Window.partitionBy(conv_id).orderBy(touch_ts, touch_tiebreak)
    cents = F.round(F.col(value_col).cast("decimal(18,2)") * 100).cast(
        "bigint"
    )
    ranked = cands.select(
        conv_id,
        F.col(on),
        cents.alias("_cents"),
        F.row_number().over(w).alias("touch_rank"),
        F.count(F.lit(1)).over(Window.partitionBy(conv_id)).alias("_n"),
    )
    share = F.expr("_cents div _n")
    rem = F.expr("_cents % _n")
    return ranked.select(
        conv_id,
        F.col(on),
        "touch_rank",
        (
            share + F.when(F.col("touch_rank") == 1, rem).otherwise(F.lit(0))
        ).cast("bigint").alias("attributed_cents"),
    )

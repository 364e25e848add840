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
from data_pipeline_ine_spark.functions.localframe import local_frame


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


def scd2_intervals(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    attr_col: str = "event_type",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Slowly-changing-dimension type-2 history from a change log: collapse
    consecutive equal attribute values per key into validity intervals
    ``[valid_from, valid_to)``, with ``valid_to`` NULL on each key's
    current state — the standard dimension-table build every warehouse
    runs over CDC streams.

    Scale shape: two window passes over ONE shuffle — both windows
    partition by ``key_col`` with the same ``(ts, tiebreak)`` ordering, so
    Catalyst plans a single Exchange+Sort and chains the Window execs.
    Partition size is one key's change history (bounded by activity, not
    corpus). The tiebreak column makes same-timestamp changes
    deterministic across engines.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    prev_attr = F.lag(attr_col).over(w)
    # null-safe change detection: row_number()==1 marks each key's first
    # state (lag's NULL there is ambiguous when the attribute itself can
    # be NULL), and NOT eqNullSafe handles x→NULL / NULL→x / NULL→NULL
    # transitions that a plain != silently drops (ADVICE r3). Same window
    # spec as lag — still one Exchange+Sort.
    changes = df.select(key_col, ts_col, attr_col, tiebreak_col).withColumn(
        "_chg",
        (F.row_number().over(w) == 1)
        | ~F.col(attr_col).eqNullSafe(prev_attr),
    ).filter("_chg")
    w2 = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    return changes.select(
        F.col(key_col),
        F.col(attr_col).alias("state"),
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w2).alias("valid_to"),
    )


def funnel_stages(
    df: DataFrame,
    stages: tuple[str, ...] = ("view", "click", "purchase"),
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered conversion funnel: a user converts stage *i* only with an
    event of type ``stages[i]`` strictly AFTER their stage *i-1* conversion
    time (first-touch semantics) — the product-analytics query that plain
    per-type counts get wrong because they ignore ordering.

    Scale shape: one shuffle on ``user_col``; each stage is a whole-
    partition conditional ``min`` window over the same partitioning, so the
    chained stage columns become stacked Window execs on a single
    Exchange — no self-joins, no per-stage scans. The final rollup is a
    per-user reduce then a tiny stage-count aggregate.

    Returns one row per stage: ``(stage, stage_idx, n_users)`` with
    ``n_users`` monotonically non-increasing down the funnel.
    """
    w = Window.partitionBy(user_col)
    out = df.select(user_col, ts_col, type_col)
    prev: str | None = None
    stage_cols = []
    for i, s in enumerate(stages):
        cond = F.col(type_col) == s
        if prev is not None:
            cond = cond & (F.col(ts_col) > F.col(prev))
        c = f"_t{i}"
        out = out.withColumn(c, F.min(F.when(cond, F.col(ts_col))).over(w))
        stage_cols.append(c)
        prev = c
    per_user = out.groupBy(user_col).agg(
        *[F.min(c).alias(c) for c in stage_cols]
    )
    counts = per_user.agg(
        *[F.count(c).alias(f"_n{i}") for i, c in enumerate(stage_cols)]
    )
    stack_args = ", ".join(
        f"'{s}', {i}, _n{i}" for i, s in enumerate(stages)
    )
    return counts.selectExpr(
        f"stack({len(stages)}, {stack_args}) as (stage, stage_idx, n_users)"
    )


def retention_cohorts(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly retention-cohort matrix: cohort = the week of a user's first
    activity; cell (cohort, week_offset) counts the distinct cohort
    members active ``week_offset`` weeks later — the standard growth-
    analytics triangle, here as one declarative plan instead of a
    per-cohort loop.

    Scale shape: corpus → distinct (user, week) pairs (one user-keyed
    aggregate-sized shuffle; the raw event stream collapses map-side);
    first-activity weeks are a second aggregate over those pairs; the
    self-join is user-keyed on the already-reduced pair frame; the final
    cell counts are a (cohort, offset)-keyed aggregate over it. Nothing
    corpus-sized is shuffled twice, and every frame after the first
    aggregate is bounded by users × active-weeks, not by events.
    """
    week = F.date_trunc("week", F.col(ts_col)).cast("date")
    acts = df.select(F.col(user_col), week.alias("period")).distinct()
    firsts = acts.groupBy(user_col).agg(F.min("period").alias("cohort_week"))
    return (
        acts.join(firsts, user_col)
        .groupBy(
            "cohort_week",
            F.expr("datediff(period, cohort_week) div 7").alias("week_offset"),
        )
        .agg(F.count_distinct(F.col(user_col)).alias("n_users"))
    )


def user_growth_curve(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """EXACT running distinct-user count by day — the growth curve every
    product dashboard wants, computed without any approximate sketch:
    cumulative distinct through day D equals the count of users whose
    FIRST event is on or before D, so the corpus reduces to one
    per-user min() and the running sum happens on the day-level frame.

    Returns ``(day, new_users, cum_users)`` for days with ≥1 first-seen
    user.

    Scale shape: one user-keyed aggregate (map-side combined) collapses
    the corpus to |users| rows; a day-keyed count collapses that to
    |days| rows; the cumulative window runs over the CALENDAR-sized
    frame (thousands of rows for decades of days — a deliberate
    single-task window over a tiny frame, never over the corpus). This
    is the classic trick that turns "running COUNT(DISTINCT)" — which
    has no mergeable exact form — into two cheap exact aggregates.
    """
    first = df.groupBy(F.col(user_col)).agg(
        F.min(F.to_date(ts_col)).alias("day")
    )
    daily = first.groupBy("day").agg(F.count(F.lit(1)).alias("new_users"))
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return daily.withColumn("cum_users", F.sum("new_users").over(w))


def state_occupancy_daily(
    intervals: DataFrame,
    user_col: str = "user_id",
    state_col: str = "state",
    from_col: str = "valid_from",
    to_col: str = "valid_to",
) -> DataFrame:
    """Daily state occupancy from validity intervals (the SCD2 output of
    :func:`scd2_intervals`): for every calendar day, how many distinct
    users spent any part of it in each state — the interval×grid
    materialization behind staffing/occupancy/fleet dashboards.

    A user's interval ``[valid_from, valid_to)`` covers every day from
    ``date(valid_from)`` through ``date(valid_to)`` inclusive (touching
    a day counts as occupying it); open intervals (NULL ``valid_to`` —
    the current state) are clipped to the newest ``valid_from`` in the
    table, the data's own horizon.

    Scale shape: the interval list is change-log sized (far smaller than
    the event corpus); the day explosion is bounded by interval length
    in days — the granularity knob (weekly grid at 100 TB) bounds it
    further without changing the plan. The distinct-user count is one
    (day, state)-keyed two-phase aggregate. The horizon is a 1-row
    aggregate broadcast; nothing corpus-sized moves.
    """
    horizon = intervals.agg(F.max(from_col).alias("_h"))
    days = (
        intervals.join(F.broadcast(horizon))
        .select(
            user_col,
            state_col,
            F.explode(
                F.sequence(
                    F.to_date(from_col),
                    F.to_date(F.coalesce(F.col(to_col), F.col("_h"))),
                )
            ).alias("day"),
        )
    )
    return days.groupBy("day", state_col).agg(
        F.countDistinct(user_col).alias("n_users")
    )


def transition_matrix(
    df: DataFrame,
    key_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    round_to: int = 6,
) -> DataFrame:
    """First-order Markov transition matrix over per-key event sequences:
    for each ordered pair (cur, next) of consecutive events of the same
    key, the transition count and row-normalized probability.

    The sequence order is (ts, tiebreak) — the tiebreak makes LEAD
    deterministic when one key has simultaneous events, which is what
    keeps the result engine-reproducible.

    Scale shape: one key-partitioned window (the same shuffle sessionize
    uses — at 100 TB this is a sort within each key's partition, never
    global), then an aggregation whose output is |types|² rows; the
    row-normalizing window runs on that tiny matrix, not the corpus.
    Probabilities are exact small-integer ratios rounded after an IEEE
    division both engines perform identically.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    pairs = (
        df.select(key_col, ts_col, tiebreak_col, F.col(type_col).alias("cur_type"))
        .withColumn("next_type", F.lead("cur_type").over(w))
        .filter(F.col("next_type").isNotNull())
    )
    counts = pairs.groupBy("cur_type", "next_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    row_total = Window.partitionBy("cur_type")
    return counts.select(
        "cur_type",
        "next_type",
        "n",
        F.round(F.col("n") / F.sum("n").over(row_total), round_to).alias("p"),
    )


def session_paths(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
    gap_seconds: int = 1800,
    min_count: int = 2,
) -> DataFrame:
    """Top clickstream paths: gap-based sessions rendered as ordered
    event-type strings (``view>click>purchase``), counted across the
    corpus — the path/attribution analysis that sits one level above the
    funnel (which fixes the stage order in advance; paths discover it).

    Determinism: events order by (ts, tiebreak) — a total order — and the
    per-session event list is rebuilt with ``array_sort`` over collected
    (ts, tiebreak, type) structs rather than trusting ``collect_list``
    arrival order, so the rendered path is engine-exact.

    Scale shape: session numbering runs two window passes on ONE
    user-keyed shuffle (the sessionize discipline); the path render is a
    (user, session)-keyed aggregate whose state is one session's events
    (bounded by session length, not user history); the final count
    shuffles only distinct path strings.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    prev = F.lag(ts_col).over(w)
    is_new = prev.isNull() | (
        F.col(ts_col) > prev + F.expr(f"INTERVAL {gap_seconds} SECONDS")
    )
    numbered = df.withColumn(
        "_sid",
        F.sum(F.when(is_new, 1).otherwise(0)).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    paths = numbered.groupBy(user_col, "_sid").agg(
        F.concat_ws(
            ">",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(ts_col, tiebreak_col, type_col))
                ),
                lambda s: s[type_col],
            ),
        ).alias("path")
    )
    return paths.groupBy("path").agg(F.count(F.lit(1)).alias("n")).filter(
        F.col("n") >= min_count
    )


def sliding_distinct_count(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    window_days: int = 7,
    out_day: str = "obs_day",
    out_count: str = "n_active",
) -> DataFrame:
    """Trailing-window distinct counts — e.g. weekly active users: for
    every day, how many distinct keys were active in the ``window_days``
    window ending that day.

    Sliding COUNT(DISTINCT) has no mergeable incremental form (a key
    leaving the window can't be "subtracted"), and the naive formulation
    — day grid ⨝ activity on a BETWEEN predicate — is an inequality join
    Spark can only nested-loop. The scalable rewrite: reduce the corpus
    to distinct (key, day) pairs map-side, explode each pair onto the
    ``window_days`` observation days it contributes to (a bounded,
    narrow ×W multiplication — W=7 here), then one exact distinct-count
    per observation day. Shuffle volume is active-(key,day)-pairs × W,
    never events × W; the oracle proves the rewrite against the direct
    BETWEEN formulation.

    Observation days extend ``window_days − 1`` days past the last
    activity (a key active on day d is still "active in the trailing
    week" six days later).
    """
    key_days = df.select(
        key_col, F.to_date(ts_col).alias("_day")
    ).distinct()
    exploded = key_days.select(
        key_col,
        F.explode(
            F.sequence(
                F.col("_day"), F.date_add("_day", window_days - 1)
            )
        ).alias(out_day),
    )
    return exploded.groupBy(out_day).agg(
        F.countDistinct(key_col).alias(out_count)
    )


def scd2_apply(
    intervals: DataFrame,
    new_events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    attr_col: str = "event_type",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Incrementally maintain an SCD2 dimension under an append-only
    change batch: keys untouched by the batch pass through; affected
    keys' histories are rebuilt from their (change-point-sized) interval
    rows plus the new events — closing open intervals and appending new
    validity rows, the warehouse "SCD2 MERGE" without recomputing the
    untouched 99.9% of the dimension.

    Assumes per-key append-only arrival (every new event at or after the
    key's last change — the in-order CDC contract, same as
    ``streaming/cdc.py``). Change-point reconstruction orders by
    (valid_from, valid_to NULLS LAST), which reproduces the original
    (ts, tiebreak) order even for zero-length intervals born from
    same-timestamp changes; reconstructed rows get negative synthetic
    tiebreaks so they can never interleave after a real event at an
    equal timestamp.

    Scale shape: the anti/semi probes are key-equi joins against the
    (small) affected-key set; the rebuild shuffles only affected keys'
    change points + the batch — work is batch-driven, never
    dimension-sized.
    """
    affected = new_events.select(key_col).distinct()
    untouched = intervals.join(affected, key_col, "left_anti")
    w = Window.partitionBy(key_col).orderBy(
        "valid_from", F.col("valid_to").asc_nulls_last()
    )
    hist = (
        intervals.join(affected, key_col, "left_semi")
        .withColumn("_rn", F.row_number().over(w))
        .select(
            key_col,
            F.col("valid_from").alias(ts_col),
            F.col("state").alias(attr_col),
            (F.col("_rn") - F.lit(10**9)).alias(tiebreak_col),
        )
    )
    combined = hist.unionByName(
        new_events.select(key_col, ts_col, attr_col, tiebreak_col)
    )
    rebuilt = scd2_intervals(combined, key_col, ts_col, attr_col, tiebreak_col)
    return untouched.unionByName(rebuilt)


def ewma_smooth(
    df: DataFrame,
    value_col: str = "value",
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    window: int = 16,
) -> DataFrame:
    """Exponentially-weighted moving average (α = 1/2) over each key's
    event sequence, truncated to the trailing ``window`` events — the
    smoothing primitive behind rate limiting, trend baselines, and
    per-entity drift scores.

    Determinism engineering (the reason this is hash-oracle-able where a
    naive EWMA is not): values are first scaled to integer cents via
    ``floor(v·100 + 0.5)``, and α = 1/2 makes every weight a power of
    two — each term ``cents · 2^-j`` is exactly representable in a
    double, and with the span capped at ``window`` bits the running sum
    stays inside 53 bits, so the fold is EXACT and order-independent on
    any IEEE-754 engine. The truncated recursion keeps standard EWMA
    semantics: weight 2^-(j+1) for lag j, with the oldest in-window term
    absorbing the tail mass (2^-(m-1) when m rows are visible), so
    weights always sum to 1.

    Scale shape: one window spec (partition by key, order by ts, rows
    [-window+1, 0]) — a single shuffle on the key, state bounded at
    ``window`` structs per row, no per-key history materialized beyond
    the frame. The collect_list frame is re-sorted in place so the fold
    never depends on frame-append order."""
    cents = F.floor(F.col(value_col) * 100 + F.lit(0.5)).cast("bigint")
    w = (
        Window.partitionBy(key_col)
        .orderBy(ts_col, id_col)
        .rowsBetween(-(window - 1), 0)
    )
    frame = F.array_sort(
        F.collect_list(
            F.struct(
                F.col(ts_col).alias("t"), F.col(id_col).alias("i"), cents.alias("vc")
            )
        ).over(w)
    )

    def fold(arr: Column) -> Column:
        m = F.size(arr)
        # idx 1..m ascending time; lag j = m - idx; oldest (j = m-1)
        # takes 2^-j, everything newer takes 2^-(j+1). Weights come from
        # a literal table of Python floats 2.0**-k — dyadics a double
        # stores EXACTLY, so no reliance on a libm pow being correctly
        # rounded on either engine.
        wtab = F.array(*[F.lit(2.0 ** -j) for j in range(window + 1)])
        inv_pow2 = lambda k: F.element_at(wtab, k + 1)  # noqa: E731
        term = lambda i: F.element_at(arr, i)["vc"].cast("double") * F.when(  # noqa: E731
            i == 1, inv_pow2((m - i).cast("int"))
        ).otherwise(inv_pow2((m - i + 1).cast("int")))
        return F.aggregate(
            F.sequence(F.lit(1), m),
            F.lit(0.0),
            lambda acc, i: acc + term(i),
        )

    from data_pipeline_ine_spark.functions.scalars import let_

    # NO decimal rounding on purpose: the fold is exact and /100 is one
    # correctly-rounded IEEE divide, so the double is already bit-identical
    # on every engine — while ROUND(x, 6) would sit exactly ON half-way
    # decimal boundaries (the values are dyadics) where engines disagree.
    return df.select(
        id_col,
        key_col,
        ts_col,
        value_col,
        (let_(frame, fold) / F.lit(100.0)).alias("ewma"),
    )


def peak_concurrency(
    df: DataFrame,
    start_col: str,
    end_col: str,
    group_col: str | None = None,
) -> DataFrame:
    """Maximum number of simultaneously-open intervals per group — peak
    concurrent sessions/shipments/connections, the capacity-planning
    number every interval dataset gets asked for.

    Classic sweep line, fully relational: each interval emits a ``+1``
    at its start and a ``−1`` AFTER its end (half-open ``[start, end]``
    with the closing delta at ``end`` ordered behind opens at the same
    instant, so touching intervals at one instant count as concurrent —
    the inclusive convention); a per-group running sum over the ordered
    deltas is the occupancy curve and its max is the peak.

    Shuffle shape: one narrow explode (2 rows per interval), one
    per-group (boundary-instant) pre-aggregate — distinct-instants-
    bounded, not row-bounded — then a per-group ordered running-sum
    window over those instants and a group-sized max. For an
    ungrouped (global) peak at 100 TB, pre-partition time into coarse
    epochs, compute per-epoch peaks with carried-in open counts — the
    same two-pass trick as the distributed rank.
    """
    from pyspark.sql import Window

    g = [group_col] if group_col else []
    deltas = df.select(
        *g,
        F.explode(
            F.array(
                F.struct(
                    F.col(start_col).alias("_t"), F.lit(1).alias("_d")
                ),
                F.struct(F.col(end_col).alias("_t"), F.lit(-1).alias("_d")),
            )
        ).alias("_e"),
    ).select(*g, F.col("_e._t").alias("_t"), F.col("_e._d").alias("_d"))
    # pre-aggregate per boundary instant: closes at t sum with opens at
    # t, which realizes the inclusive-touch convention without ordering
    # tricks inside one instant
    per_t = deltas.groupBy(*g, "_t").agg(
        F.sum(F.when(F.col("_d") > 0, 1).otherwise(0)).alias("_opens"),
        F.sum("_d").alias("_net"),
    )
    w = (
        Window.partitionBy(*g).orderBy("_t")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # occupancy INCLUDING intervals closing at this instant =
    # running net through previous instant + ALL opens here... which is
    # running_net(t) - net(t) + opens(t) = prefix(t-1) + opens(t)
    curve = per_t.select(
        *g,
        (F.sum("_net").over(w) - F.col("_net") + F.col("_opens")).alias(
            "_occ"
        ),
    )
    return curve.groupBy(*g).agg(
        F.max("_occ").cast("bigint").alias("peak_concurrency")
    )


def cascade_rollup(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    levels: Sequence[str] = ("hour", "day", "month"),
) -> DataFrame:
    """Hierarchical time rollup (the hypertable continuous-aggregate
    pattern): hour/day/month aggregates where EVERY level after the
    first is computed from the PREVIOUS level's partials, never from
    the raw rows — the day pass reads 24x less than the corpus, the
    month pass ~30x less again. Sums and counts are associative, so
    cascading is exact; the driver oracle recomputes each level
    directly from raw rows, and a green match IS the associativity
    proof.

    Output: ``(level, bucket, n, total)`` with ``bucket`` formatted as
    a string (truncation granularities return different temporal types
    across engines; the formatted form is the portable surface) and
    ``total`` exact DECIMAL.

    Scale shape: one corpus shuffle for the finest level; every
    coarser level shuffles the previous AGGREGATE (bucket-cardinality-
    sized). This is the materialized-rollup refresh plan at 100 TB:
    persist the hour level, derive day/month from it, never rescan.
    """
    dec = F.col(value_col).cast("decimal(18,2)")
    # each level is branched twice (emitted + fed to the next level);
    # lazy localCheckpoint pins the computed partials so the union does
    # NOT re-aggregate raw rows per branch — the cascade saving is
    # physical, not just notational (same reuse pattern as bm25)
    cur = (
        df.select(
            F.date_trunc(levels[0], F.col(ts_col)).alias("bucket"), dec.alias("_v")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("_v").alias("total"))
        .localCheckpoint(eager=False)
    )
    fmt = "yyyy-MM-dd HH:mm:ss"
    out = cur.select(
        F.lit(levels[0]).alias("level"),
        F.date_format("bucket", fmt).alias("bucket"),
        F.col("n").cast("bigint").alias("n"),
        F.col("total").cast("decimal(18,2)").alias("total"),
        F.col("bucket").alias("_raw_bucket"),
        F.col("n").alias("_n"),
        F.col("total").alias("_t"),
    )
    frames = [out.drop("_raw_bucket", "_n", "_t")]
    prev = out.select("_raw_bucket", "_n", "_t")
    for lvl in levels[1:]:
        nxt = (
            prev.select(
                F.date_trunc(lvl, F.col("_raw_bucket")).alias("bucket"),
                "_n",
                "_t",
            )
            .groupBy("bucket")
            .agg(F.sum("_n").alias("n"), F.sum("_t").alias("total"))
            .localCheckpoint(eager=False)
        )
        frames.append(
            nxt.select(
                F.lit(lvl).alias("level"),
                F.date_format("bucket", fmt).alias("bucket"),
                F.col("n").cast("bigint").alias("n"),
                F.col("total").cast("decimal(18,2)").alias("total"),
            )
        )
        prev = nxt.select(
            F.col("bucket").alias("_raw_bucket"),
            F.col("n").alias("_n"),
            F.col("total").alias("_t"),
        )
    result = frames[0]
    for fr in frames[1:]:
        result = result.unionByName(fr)
    return result


def rolling_distinct_users(
    df: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    window_days: int = 7,
) -> DataFrame:
    """Exact trailing-N-day DISTINCT user count per active day (rolling
    WAU/MAU). Distinct-over-a-sliding-frame is NOT a window function in
    any SQL engine — the standard exact formulation is contribution
    explosion: dedupe to (user, day) grain, then each pair contributes
    to its own day and the next ``window_days - 1`` days; one
    count-distinct per target day finishes it. Only days that are
    themselves active emit a row (a day with zero events has no
    business reading as "N users active").

    Scale shape: the (user, day) dedupe collapses the corpus to
    activity grain FIRST, so the explode multiplies the small deduped
    table by window_days — a bounded constant — never the raw event
    count; the final aggregate shuffles (day, user) pairs once. At
    100 TB of events with bounded daily actives, every stage is
    activity-sized.
    """
    ud = df.select(
        F.col(user_col).alias("_u"),
        F.to_date(ts_col).alias("_d"),
    ).distinct()
    days = ud.select("_d").distinct()
    contrib = ud.select(
        "_u",
        F.explode(
            F.sequence(
                F.col("_d"),
                F.date_add(F.col("_d"), window_days - 1),
            )
        ).alias("day"),
    )
    return (
        contrib.join(days.withColumnRenamed("_d", "day"), "day", "left_semi")
        .groupBy("day")
        .agg(F.count_distinct("_u").alias(f"users_{window_days}d"))
    )


def user_max_gap(
    df: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Per-user maximum inter-event gap in whole seconds — the dormancy
    / churn-risk signal (a user whose longest silence exceeds the
    product's habit loop is churning regardless of total volume).
    Single-event users emit ``max_gap_s = 0`` (no gap observed), never
    NULL, so downstream thresholds need no null-handling.

    Engine-exact: gaps are integer second differences of the NTZ
    field-arithmetic epoch (operators/joins.py::_ntz_epoch_seconds) —
    no timezone, no float. One user-partitioned lag window ordered by
    (ts, tiebreak) + one user aggregate; both hash on the user key, so
    the sort-window and the aggregate share a single exchange.
    """
    from pyspark.sql import Window

    from data_pipeline_ine_spark.operators.joins import _ntz_epoch_seconds

    sec = _ntz_epoch_seconds(F.col(ts_col))
    w = Window.partitionBy(user_col).orderBy(sec, F.col(tiebreak_col))
    gapped = df.select(
        F.col(user_col),
        (sec - F.lag(sec).over(w)).alias("_gap"),
    )
    return gapped.groupBy(user_col).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.coalesce(F.max("_gap"), F.lit(0)).cast("bigint").alias("max_gap_s"),
    )


def rolling_distinct_users_approx(
    df: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    window_days: int = 7,
    lg_k: int = 12,
) -> DataFrame:
    """Approximate trailing-N-day distinct users — the 100 TB scale path
    for ``rolling_distinct_users``: ONE HLL sketch per day (mergeable
    partial, ~KBs regardless of daily actives), then each target day
    unions its trailing ``window_days`` sketches. The exact version
    explodes (user, day) pairs — activity-grain × window; this one
    explodes DAY SKETCHES — calendar-grain × window — so the heavy
    per-user work happens exactly once per day and the rolling merge
    is calendar-sized. Typical HLL error at lg_k=12 is ~1.6%
    (tolerance-tested against the exact operator).

    The sketch column is an internal intermediate only — the output is
    ``(day, users_Nd_approx)`` BIGINTs (estimates rounded), same shape
    as the exact operator; only ACTIVE days emit rows.
    """
    daily = (
        df.select(
            F.to_date(ts_col).alias("day"),
            F.col(user_col).cast("string").alias("_u"),
        )
        .groupBy("day")
        .agg(F.hll_sketch_agg("_u", F.lit(lg_k)).alias("_sk"))
    )
    days = daily.select("day")
    contrib = daily.select(
        F.explode(
            F.sequence(F.col("day"), F.date_add(F.col("day"), window_days - 1))
        ).alias("target"),
        "_sk",
    )
    return (
        contrib.join(
            days.withColumnRenamed("day", "target"), "target", "left_semi"
        )
        .groupBy("target")
        .agg(
            F.round(
                F.hll_sketch_estimate(F.hll_union_agg(F.col("_sk"), F.lit(False)))
            )
            .cast("bigint")
            .alias(f"users_{window_days}d_approx")
        )
        .withColumnRenamed("target", "day")
    )


def interarrival_burstiness(
    df: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Per-user burstiness of inter-event gaps — Goh & Barabási's
    ``B = (σ − μ)/(σ + μ)`` over the inter-arrival distribution
    (−1 = metronome, 0 = Poisson, →1 = bursty): separates the
    steady-habit user from the binge user at identical event counts,
    and flags bot traffic (B ≈ −1) that rate metrics miss.

    Engine-exact: gaps are integer second differences of the NTZ
    field-arithmetic epoch (the ``user_max_gap`` recipe); the moment
    sums (n, Σg, Σg²) stay DECIMAL(25,0)-exact; and since
    ``σ = sqrt(n·Σg² − (Σg)²)/n`` and ``μ = Σg/n`` share the 1/n, the
    statistic collapses to ``(sqrt(D) − Σg)/(sqrt(D) + Σg)`` with
    ``D = n·Σg² − (Σg)²`` — ONE fixed double expression over exact
    integers (IEEE sqrt is correctly rounded), NULL when every gap is
    zero (σ = μ = 0 leaves B undefined).

    Scale shape: one user-partitioned lag window + one user aggregate
    sharing a single exchange (the ``user_max_gap`` shape); output is
    one row per user with ≥2 events.
    """
    from pyspark.sql import Window

    from data_pipeline_ine_spark.operators.joins import _ntz_epoch_seconds

    sec = _ntz_epoch_seconds(F.col(ts_col))
    w = Window.partitionBy(user_col).orderBy(sec, F.col(tiebreak_col))
    gaps = (
        df.select(
            F.col(user_col),
            (sec - F.lag(sec).over(w)).alias("_gap"),
        )
        .filter(F.col("_gap").isNotNull())
    )
    m = gaps.groupBy(user_col).agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.sum(F.col("_gap").cast("decimal(25,0)")).cast("decimal(25,0)").alias("_sg"),
        F.sum(
            F.col("_gap").cast("decimal(25,0)") * F.col("_gap").cast("decimal(25,0)")
        ).cast("decimal(38,0)").alias("_sg2"),
    )
    nd = F.col("n_gaps").cast("double")
    sg = F.col("_sg").cast("double")
    disc = nd * F.col("_sg2").cast("double") - sg * sg
    root = F.sqrt(F.greatest(disc, F.lit(0.0)))
    return m.select(
        user_col,
        "n_gaps",
        F.col("_sg").cast("bigint").alias("gap_sum_s"),
        F.when(root + sg > 0, F.round((root - sg) / (root + sg), 6)).alias(
            "burstiness"
        ),
    )


def kaplan_meier(
    df: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    horizon: str = "2024-01-31",
    censor_margin_days: int = 7,
) -> DataFrame:
    """Kaplan–Meier survival estimate of user lifetimes under right
    censoring — the honest churn curve: a user whose last event falls
    within ``censor_margin_days`` of the data horizon is CENSORED
    (still alive as far as the data can tell), not dead, which naive
    retention curves silently miscount as churn.

    Lifetime = whole days between a user's first and last event; an
    uncensored lifetime is a death at that duration. At each event
    duration d: ``n_risk`` = users with lifetime ≥ d, ``n_events`` =
    deaths at d, and the survival product ``S(d) = Π (1 − dᵢ/nᵢ)``
    ships as the engine-exact integer ``ln_surv_e6`` — each step's
    ``ln((nᵢ−dᵢ)/nᵢ)`` snapped e6 (the zipf recipe), accumulated by an
    exact BIGINT window sum (Σ of snapped logs, never a float product;
    ``S = exp(ln_surv_e6/1e6)`` for humans, kept off the contract
    surface because libm ``exp`` is a cross-engine trap). When a step
    kills every remaining user the log is −∞ — that row (always the
    last) emits NULL.

    Scale shape: one user-grain aggregate (the only corpus-sized
    work), then everything lives on the duration-grain frame — bounded
    by the CALENDAR span (≤ days), so the unpartitioned cumulative
    windows are calendar-sized, never corpus-sized. Output: one row
    per duration with ≥1 death.
    """
    from pyspark.sql import Window

    h = F.lit(horizon).cast("date")
    lives = (
        df.groupBy(user_col)
        .agg(
            F.min(F.to_date(ts_col)).alias("_first"),
            F.max(F.to_date(ts_col)).alias("_last"),
        )
        .select(
            F.datediff("_last", "_first").cast("bigint").alias("_dur"),
            F.when(
                F.datediff(h, F.col("_last")) >= censor_margin_days, 1
            )
            .otherwise(0)
            .alias("_event"),
        )
    )
    per_dur = lives.groupBy("_dur").agg(
        F.count(F.lit(1)).alias("_c_all"),
        F.sum("_event").cast("bigint").alias("_c_evt"),
    )
    w_desc = Window.orderBy(F.desc("_dur")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    at_risk = per_dur.withColumn(
        "n_risk", F.sum("_c_all").over(w_desc).cast("bigint")
    )
    ln_step = F.when(
        F.col("_c_evt") == 0, F.lit(0).cast("bigint")
    ).when(
        F.col("n_risk") > F.col("_c_evt"),
        F.floor(
            F.log(
                (F.col("n_risk") - F.col("_c_evt")).cast("double")
                / F.col("n_risk").cast("double")
            )
            * 1e6
            + F.lit(0.5)
        ).cast("bigint"),
    )  # NULL when the step extinguishes the risk set (ln 0)
    w_asc = Window.orderBy("_dur").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    stepped = at_risk.withColumn("_ln", ln_step).withColumn(
        "ln_surv_e6",
        F.when(
            F.col("_ln").isNotNull(), F.sum("_ln").over(w_asc)
        ).cast("bigint"),
    )
    return stepped.filter(F.col("_c_evt") > 0).select(
        F.col("_dur").alias("duration_days"),
        "n_risk",
        F.col("_c_evt").alias("n_events"),
        "ln_surv_e6",
    )


def seasonal_decompose_weekly(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    unit_scale: int = 100,
) -> DataFrame:
    """Classic additive seasonal decomposition of the daily value total
    with a weekly (period-7) cycle — ``y = trend + seasonal + resid``,
    the moving-average recipe of statsmodels' ``seasonal_decompose``:

    - ``trend`` = centered 7-day moving average, defined only where the
      window holds 7 CONSECUTIVE calendar days (a gap voids the window
      rather than silently averaging a shorter span);
    - ``seasonal`` = per-day-of-week mean of the detrended series,
      centered so the seven seasonal effects sum to zero;
    - ``resid`` = what's left.

    Engine-exact discipline: daily totals are exact integer units
    (``floor(v·unit_scale + 0.5)`` per row, summed exactly), the trend
    is carried as the exact 7-day integer SUM (``trend7_e2`` — divide
    at the very end), the detrended series ``7·y − trend7`` stays
    integer, and the per-dow seasonal means are ONE IEEE divide each of
    exact integers. The centering mean folds the ≤7 dow means in dow
    order (a fixed-order sequential sum both engines replay
    identically). Day-of-week is epoch-day mod 7 — portable, no
    engine dayofweek() disagreement.

    Returns ``(day, revenue_e2, trend7_e2, seasonal, resid)`` —
    ``seasonal``/``resid`` 6-dp doubles, ``trend7_e2``/``resid`` NULL
    at series edges and around gaps.

    Scale shape: one day-grain hash aggregate over the fact table (the
    only data-sized pass), then calendar-grain windows (≤|days| rows —
    allowlisted global windows) + a 7-row dow aggregate broadcast back.
    """
    e2 = F.floor(F.col(value_col) * unit_scale + F.lit(0.5)).cast("long")
    daily = df.groupBy(F.to_date(ts_col).alias("day")).agg(
        F.sum(e2).alias("revenue_e2")
    )
    w7 = Window.orderBy("day").rowsBetween(-3, 3)
    spans_week = (
        F.count("revenue_e2").over(w7) == 7
    ) & (F.datediff(F.max("day").over(w7), F.min("day").over(w7)) == 6)
    based = daily.select(
        "day",
        "revenue_e2",
        (F.datediff(F.col("day"), F.lit("1970-01-01").cast("date")) % 7)
        .cast("int")
        .alias("dow"),
        F.when(spans_week, F.sum("revenue_e2").over(w7)).alias("trend7_e2"),
    ).withColumn(
        "detr7_e2", F.lit(7) * F.col("revenue_e2") - F.col("trend7_e2")
    )
    dowstats = (
        based.groupBy("dow")
        .agg(
            F.sum("detr7_e2").alias("_snum"),
            F.count("detr7_e2").alias("_sden"),
        )
        .filter(F.col("_sden") > 0)
        .withColumn(
            # natural units: detr7_e2 carries a 7x and a unit_scale x
            "_s",
            F.col("_snum").cast("double")
            / (F.lit(7.0 * unit_scale) * F.col("_sden").cast("double")),
        )
    )
    mean = dowstats.agg(
        (
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("dow", "_s"))),
                F.lit(0.0),
                lambda acc, s: acc + s["_s"],
            )
            / F.count(F.lit(1)).cast("double")
        ).alias("_smean")
    )
    seasonal = F.round(F.col("_s") - F.col("_smean"), 6)
    resid = F.round(
        F.col("revenue_e2").cast("double") / F.lit(float(unit_scale))
        - F.col("trend7_e2").cast("double") / F.lit(7.0 * unit_scale)
        - (F.col("_s") - F.col("_smean")),
        6,
    )
    return (
        based.join(F.broadcast(dowstats), "dow", "left")
        .crossJoin(F.broadcast(mean))
        .select(
            "day",
            "revenue_e2",
            "trend7_e2",
            seasonal.alias("seasonal"),
            resid.alias("resid"),
        )
    )


def theil_sen_daily(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    unit_scale: int = 100,
) -> DataFrame:
    """Theil–Sen robust trend of the daily value total — the
    outlier-immune alternative to grouped_ols' least squares (one
    flash-sale day drags an OLS slope; the median pairwise slope
    shrugs): slope = lower median over all day pairs of
    ``(rev_j − rev_i)/(day_j − day_i)``.

    Engine-exact: daily totals are exact integer units; each pairwise
    slope is ONE IEEE divide of exact integers (bit-identical), and
    the median is the explicit ``(n_pairs+1) div 2``-th ORDER STATISTIC
    under the total order ``(slope, day_i, day_j)`` — never an
    interpolating median, whose two-engine averaging rules differ. The
    unrounded double ships as-is (the ewma precedent: bit-identical
    beats rounded).

    Scale shape: the corpus-sized work is one day-grain aggregate; the
    pair frame is calendar²-bounded (31 days → 465 pairs), so the
    self-join and the top-k order statistic are driver-trivial at any
    corpus size.
    """
    from pyspark.sql import Window

    daily = (
        df.groupBy(F.to_date(ts_col).alias("_day"))
        .agg(
            F.sum(
                F.floor(F.col(value_col) * unit_scale).cast("decimal(25,0)")
            )
            .cast("bigint")
            .alias("_rev")
        )
        .select(
            F.datediff(
                "_day", F.lit("1970-01-01").cast("date")
            ).cast("bigint").alias("_d"),
            "_rev",
        )
    )
    a = daily.select(F.col("_d").alias("_di"), F.col("_rev").alias("_ri"))
    b = daily.select(F.col("_d").alias("_dj"), F.col("_rev").alias("_rj"))
    pairs = a.join(b, F.col("_dj") > F.col("_di")).select(
        "_di",
        "_dj",
        (
            (F.col("_rj") - F.col("_ri")).cast("double")
            / (F.col("_dj") - F.col("_di")).cast("double")
        ).alias("_slope"),
    )
    w = Window.orderBy("_slope", "_di", "_dj")
    ranked = pairs.withColumn("_rk", F.row_number().over(w))
    tot = pairs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
    )
    n_days = daily.agg(F.count(F.lit(1)).cast("bigint").alias("n_days"))
    med = ranked.crossJoin(F.broadcast(tot)).filter(
        F.col("_rk") == F.expr("(n_pairs + 1) div 2")
    )
    return med.crossJoin(F.broadcast(n_days)).select(
        "n_days", "n_pairs", F.col("_slope").alias("ts_slope_cents_per_day")
    )


def acf_daily(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    max_lag: int = 7,
    unit_scale: int = 100,
) -> DataFrame:
    """Sample autocorrelation of the daily value total at lags
    1..``max_lag`` — the is-today-like-yesterday diagnostic behind
    seasonality detection and forecast-model order selection (an AR
    signature decays, an MA signature cuts off).

    Semantics: the *cross-correlation* form — Pearson correlation of
    the aligned pair series (xₜ, xₜ₊ₖ), each side centered on its own
    pair-set mean (the textbook large-n ACF divides by the global
    variance instead; on a calendar-bounded series the pairwise form
    is the exact, assumption-free statistic).

    Engine-exact: daily totals are exact integer units; per-lag moment
    sums accumulate in DECIMAL(25/38,0); the Pearson closed form is
    one fixed double expression over those exact integers, rounded to
    6 places (the spearman recipe).

    Scale shape: the corpus-sized work is ONE day-grain aggregate.
    Lag expansion is a generator (``explode`` of a ``max_lag``-element
    literal array — no join), the self-join is an equi-join on the
    shifted day index over a calendar-bounded frame, and the
    unpartitioned row_number window is calendar-sized, never
    corpus-sized (the theil_sen/kaplan_meier precedent).
    """
    from pyspark.sql import Window

    daily = (
        df.groupBy(F.to_date(ts_col).alias("_day"))
        .agg(
            F.sum(
                F.floor(F.col(value_col) * unit_scale).cast("decimal(25,0)")
            )
            .cast("bigint")
            .alias("_rev")
        )
        .withColumn(
            "_rn", F.row_number().over(Window.orderBy("_day"))
        )
        .select("_rn", "_rev")
    )
    lags = F.array(*[F.lit(k) for k in range(1, max_lag + 1)])
    left = daily.select(
        F.col("_rn"),
        F.col("_rev").alias("_x"),
        F.explode(lags).alias("lag"),
    ).withColumn("_rn2", F.col("_rn") + F.col("lag"))
    right = daily.select(
        F.col("_rn").alias("_rn2"), F.col("_rev").alias("_y")
    )
    pairs = left.join(right, "_rn2")
    d25 = lambda c: F.col(c).cast("decimal(25,0)")  # noqa: E731
    m = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum(d25("_x")).alias("_sx"),
        F.sum(d25("_y")).alias("_sy"),
        F.sum(d25("_x") * d25("_y")).alias("_sxy"),
        F.sum(d25("_x") * d25("_x")).alias("_sxx"),
        F.sum(d25("_y") * d25("_y")).alias("_syy"),
    )
    n = F.col("n_pairs").cast("double")
    sx, sy = F.col("_sx").cast("double"), F.col("_sy").cast("double")
    sxy = F.col("_sxy").cast("double")
    sxx, syy = F.col("_sxx").cast("double"), F.col("_syy").cast("double")
    return (
        m.select(
            F.col("lag").cast("bigint").alias("lag"),
            "n_pairs",
            F.round(
                (n * sxy - sx * sy)
                / (
                    F.sqrt(n * sxx - sx * sx)
                    * F.sqrt(n * syy - sy * sy)
                ),
                6,
            ).alias("acf"),
        )
        .orderBy("lag")
    )


def dow_seasonality(
    df: DataFrame,
    date_col: str = "o_orderdate",
    value_col: str = "o_totalprice",
    unit_scale: int = 100,
) -> DataFrame:
    """Day-of-week seasonality index of the value column: per weekday,
    the ratio of that weekday's mean row value to the overall mean —
    index > 1 means the weekday runs hot. The first stop when a
    metric wiggles with a 7-day period (staffing, cache prewarm,
    anomaly-threshold calendars all key off this table).

    ``dow`` is 0=Sunday..6=Saturday (Spark ``dayofweek()-1`` ==
    DuckDB ``dayofweek()``). Engine-exact: per-dow and global sums are
    exact integer units; the index is ONE fixed double expression
    ``(sum_dow·n_tot)/(n_dow·sum_tot)`` over those integers (a single
    IEEE divide of two deterministic products), rounded to 6.

    Scale shape: one dow-grain aggregate (7 rows out) is the only
    corpus-sized work; the global totals are a 1-row broadcast
    (documented benign BNLJ class).
    """
    cents = F.floor(F.col(value_col) * unit_scale).cast("decimal(25,0)")
    per = (
        df.select(
            (F.dayofweek(F.col(date_col).cast("date")) - 1).alias("dow"),
            cents.alias("_c"),
        )
        .groupBy("dow")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum("_c").cast("bigint").alias("sum_cents"),
        )
    )
    tot = per.agg(
        F.sum("n_rows").cast("bigint").alias("_n_tot"),
        F.sum("sum_cents").cast("bigint").alias("_s_tot"),
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            F.col("dow").cast("bigint").alias("dow"),
            "n_rows",
            "sum_cents",
            F.round(
                (
                    F.col("sum_cents").cast("double")
                    * F.col("_n_tot").cast("double")
                )
                / (
                    F.col("n_rows").cast("double")
                    * F.col("_s_tot").cast("double")
                ),
                6,
            ).alias("dow_index"),
        )
        .orderBy("dow")
    )


def cusum_alarm(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    slack_permille: int = 50,
    h_permille: int = 200,
    unit_scale: int = 100,
) -> DataFrame:
    """One-sided (upward) CUSUM change-point monitor on the daily value
    total — the classic sequential drift detector: it accumulates
    small persistent excess that a per-day z-score never trips on, and
    resets the moment the series dips back under target.

    The recurrence ``Sₜ = max(0, Sₜ₋₁ + xₜ − μ − k)`` looks
    imperatively sequential, but its closed form is relational:
    ``Sₜ = Pₜ − min(0, min_{j≤t} Pⱼ)`` where ``P`` is the running
    prefix sum of ``yₜ = xₜ − μ − k`` — one running-sum window and one
    running-min window, no loop. ``μ`` = global daily mean
    (``sum div n``, exact floor division of non-negative integers),
    ``k`` = μ·slack_permille/1000, alarm when ``Sₜ > h`` =
    μ·h_permille/1000. Every surface is exact BIGINT arithmetic —
    no floats anywhere.

    Scale shape: one day-grain aggregate is the only corpus-sized
    work; the unpartitioned running windows are calendar-bounded
    (the kaplan_meier precedent), and μ rides a 1-row broadcast
    (documented benign BNLJ class).
    """
    from pyspark.sql import Window

    daily = (
        df.groupBy(F.to_date(ts_col).alias("day"))
        .agg(
            F.sum(
                F.floor(F.col(value_col) * unit_scale).cast("decimal(25,0)")
            )
            .cast("bigint")
            .alias("x_cents")
        )
    )
    tot = daily.agg(
        F.sum("x_cents").cast("bigint").alias("_s"),
        F.count(F.lit(1)).cast("bigint").alias("_n"),
    ).select(F.expr("_s div _n").cast("bigint").alias("_mu"))
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    staged = (
        daily.crossJoin(F.broadcast(tot))
        .withColumn(
            "_y",
            (
                F.col("x_cents")
                - F.col("_mu")
                - F.expr(f"(_mu * {slack_permille}) div 1000")
            ).cast("bigint"),
        )
        .withColumn("_p", F.sum("_y").over(w).cast("bigint"))
        .withColumn(
            "_pmin", F.least(F.lit(0).cast("bigint"), F.min("_p").over(w))
        )
        .withColumn("s_cents", (F.col("_p") - F.col("_pmin")).cast("bigint"))
    )
    return staged.select(
        "day",
        "x_cents",
        "s_cents",
        F.when(
            F.col("s_cents") > F.expr(f"(_mu * {h_permille}) div 1000"),
            1,
        )
        .otherwise(0)
        .cast("bigint")
        .alias("alarm"),
    ).orderBy("day")


def markov_stationary(
    df: DataFrame,
    key_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    iters: int = 4,
) -> DataFrame:
    """Stationary distribution of the per-key event-type Markov chain —
    where user behavior settles if today's transition structure holds:
    the long-run share of each event type, the demand forecast the raw
    frequency table gets wrong whenever behavior is sticky
    (transition_matrix gives the one-step dynamics; this iterates them
    to the fixed point).

    Fixed ``iters`` power iterations in EXACT e6 integer fixed point
    (the pagerank discipline — float iteration sums in partition order
    and loses cross-engine exactness): transition probabilities
    ``p_e6 = (n·10⁶) div row_total``, mass starts uniform
    ``10⁶ div k``, one step is ``r'(next) = Σ_cur r(cur)·p_e6 div 10⁶``
    — products ≤ 10¹² stay far inside int64. Truncation drift is ≤
    1e-6 per step and identical on both engines.

    Scale shape: the corpus-sized work is transition_matrix's single
    key-partitioned window + |types|² count; every iteration joins and
    aggregates the ≤|types|²-cell matrix against a |types|-row mass
    frame — driver-trivial forever. Output: (state, stationary_e6).
    """
    counts = (
        transition_matrix(df, key_col, type_col, ts_col, tiebreak_col)
        .select("cur_type", "next_type", F.col("n").cast("bigint").alias("_n"))
    )
    totals = counts.groupBy("cur_type").agg(
        F.sum("_n").cast("bigint").alias("_tot")
    )
    p = (
        counts.join(totals, "cur_type")
        .select(
            "cur_type",
            "next_type",
            F.expr("(_n * 1000000) div _tot").cast("bigint").alias("_p_e6"),
        )
        .localCheckpoint()
    )
    states = p.select(F.col("cur_type").alias("state")).unionAll(
        p.select(F.col("next_type").alias("state"))
    ).distinct().localCheckpoint()
    n_states = states.count()  # |types| — a handful; needed for the
    # uniform start mass (driver-side by design, the k-means precedent)
    r = states.withColumn(
        "_r", F.lit(1_000_000 // n_states).cast("bigint")
    )
    for _ in range(iters):
        stepped = (
            p.join(
                r.select(F.col("state").alias("cur_type"), "_r"), "cur_type"
            )
            .groupBy(F.col("next_type").alias("state"))
            .agg(
                F.expr("CAST(sum(_r * _p_e6) div 1000000 AS BIGINT)").alias(
                    "_rn"
                )
            )
        )
        r = (
            states.join(stepped, "state", "left")
            .select(
                "state",
                F.coalesce("_rn", F.lit(0)).cast("bigint").alias("_r"),
            )
            .localCheckpoint()
        )
    return r.select("state", F.col("_r").alias("stationary_e6")).orderBy(
        "state"
    )


def funnel_latency(
    df: DataFrame,
    stages: tuple[str, ...] = ("view", "click", "purchase"),
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Stage-to-stage conversion latency: for users who convert stage
    i → i+1 under the funnel's first-touch semantics (stage i+1 counts
    only strictly AFTER the stage-i conversion instant), the median
    seconds between the two conversions — the "how long does the
    funnel take" companion to funnel_stages' "how many make it".

    The median is the explicit ``(n+1) div 2``-th ORDER STATISTIC under
    the total order ``(delay_s, user)`` (the theil_sen discipline);
    delays are exact integer epoch-second differences. Output: one row
    per stage transition with the converting-user count and the median
    delay.

    Scale shape: the same single user-keyed shuffle funnel_stages
    rides (stacked conditional-min windows on one Exchange); the
    median rank is the DISTRIBUTED two-pass rank (``sampling.py::
    two_pass_rank`` — range-repartition + per-partition offsets), so
    no converter-sized data ever funnels through one task; the
    converter count is max(rank) off the same checkpointed frame,
    crossJoined back as a 1-row broadcast. |stages|-row output.
    """
    w = Window.partitionBy(user_col)
    out = df.select(user_col, ts_col, type_col)
    stage_cols: list[str] = []
    prev: str | None = None
    for i, s in enumerate(stages):
        cond = F.col(type_col) == s
        if prev is not None:
            cond = cond & (F.col(ts_col) > F.col(prev))
        c = f"_t{i}"
        out = out.withColumn(c, F.min(F.when(cond, F.col(ts_col))).over(w))
        stage_cols.append(c)
        prev = c
    per_user = out.groupBy(user_col).agg(
        *[F.min(c).alias(c) for c in stage_cols]
    )
    frames = []
    for i in range(len(stages) - 1):
        a, b = stage_cols[i], stage_cols[i + 1]
        from data_pipeline_ine_spark.operators.joins import (
            _ntz_epoch_seconds,
        )

        delays = per_user.filter(F.col(b).isNotNull()).select(
            F.col(user_col).alias("_u"),
            (
                _ntz_epoch_seconds(F.col(b)) - _ntz_epoch_seconds(F.col(a))
            ).cast("bigint").alias("_d"),
        )
        from data_pipeline_ine_spark.operators.sampling import (
            two_pass_rank,
        )

        ranked = two_pass_rank(delays, ["_d", "_u"], out_col="_rk")
        cnt = ranked.agg(F.max("_rk").cast("bigint").alias("_n"))
        frames.append(
            ranked.crossJoin(F.broadcast(cnt))
            .filter(F.col("_rk") == F.expr("(_n + 1) div 2"))
            .select(
                F.lit(f"{stages[i]}->{stages[i + 1]}").alias("transition"),
                F.lit(i).cast("bigint").alias("stage_idx"),
                F.col("_n").cast("bigint").alias("n_converted"),
                F.col("_d").alias("median_delay_s"),
            )
        )
    res = frames[0]
    for fr in frames[1:]:
        res = res.unionByName(fr)
    return res.orderBy("stage_idx")


def binseg_split(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    unit_scale: int = 100,
) -> DataFrame:
    """Binary-segmentation changepoint scan (the root step of the
    classic recursive segmenter): for every candidate split of the
    daily series, the two-segment squared-error cost — the day where
    the cost curve bottoms out is the single best mean-shift
    changepoint, with the full curve exposing how decisive the split
    is (CUSUM answers "is there drift NOW"; this answers "where did
    the level change, in hindsight").

    Cost(s) = SSE[1..s] + SSE[s+1..n], each ``Σx² − (Σx)²/n`` from
    DECIMAL-exact prefix sums of integer units — one fixed double
    expression per candidate (the gini_split discipline), rounded to
    4. Output: one row per candidate split (n−1 rows).

    Scale shape: one day-grain aggregate is the corpus-sized work;
    prefix sums and costs live on the calendar-bounded frame.
    """
    from pyspark.sql import Window

    daily = (
        df.groupBy(F.to_date(ts_col).alias("day"))
        .agg(
            F.sum(
                F.floor(F.col(value_col) * unit_scale).cast("decimal(25,0)")
            )
            .cast("bigint")
            .alias("_x")
        )
    )
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    pre = (
        daily.withColumn("_rn", F.row_number().over(Window.orderBy("day")))
        .withColumn("_s1", F.sum(F.col("_x").cast("decimal(25,0)")).over(w))
        .withColumn(
            "_q1",
            F.sum(
                (F.col("_x").cast("decimal(25,0)") * F.col("_x")).cast(
                    "decimal(38,0)"
                )
            ).over(w),
        )
    )
    tot = pre.agg(
        F.max("_rn").cast("bigint").alias("_n"),
        F.max("_s1").alias("_st"),
        F.max("_q1").alias("_qt"),
    )
    cand = pre.crossJoin(F.broadcast(tot)).filter(F.col("_rn") < F.col("_n"))
    nl = F.col("_rn").cast("double")
    nr = (F.col("_n") - F.col("_rn")).cast("double")
    s1, q1 = F.col("_s1").cast("double"), F.col("_q1").cast("double")
    s2 = (F.col("_st") - F.col("_s1")).cast("double")
    q2 = (F.col("_qt") - F.col("_q1")).cast("double")
    return cand.select(
        "day",
        F.col("_rn").cast("bigint").alias("n_left"),
        F.round((q1 - s1 * s1 / nl) + (q2 - s2 * s2 / nr), 4).alias(
            "split_cost"
        ),
    ).orderBy("day")


def markov_attribution(
    df: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    conv_type: str = "purchase",
    channels: tuple[str, ...] = ("click", "error", "signup", "view"),
    iters: int = 6,
) -> DataFrame:
    """Markov removal-effect attribution — the data-driven alternative
    to rule-based credit models (linear/U-shaped): build the absorbing
    journey chain START → channels → {CONV, NULL}, compute conversion
    mass with the channel present and with it knocked out (its inbound
    probability re-routed to NULL, its outbound rows dropped), and
    credit the channel with the conversion it would take down —
    exactly the counterfactual the rule models fake.

    Journeys truncate at the FIRST conversion; CONV and NULL are
    absorbing (self-loop probability 1). All probabilities are e6
    integer fixed point (``n·10⁶ div row_total``); each model runs
    ``iters`` exact integer power steps from unit mass on START (the
    markov_stationary discipline), so both the full and every knockout
    model are bit-reproducible. Output: one row per channel with the
    full-model conversion mass, the knockout mass, and their
    difference (the removal effect).

    Scale shape: the corpus-sized work is ONE user-keyed window pass
    (truncate + lead) and one edge count; every model iteration joins
    a ≤(|channels|+3)²-cell matrix to a ≤|states|-row mass frame —
    |channels|+1 models of driver-trivial work, no checkpoints needed
    at this frame size.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    seq = df.select(
        F.col(user_col).alias("_u"),
        F.when(F.col(type_col) == conv_type, F.lit("CONV"))
        .otherwise(F.col(type_col))
        .alias("_state"),
        F.row_number().over(w).alias("_rn"),
    )
    fc = (
        seq.filter(F.col("_state") == "CONV")
        .groupBy("_u")
        .agg(F.min("_rn").alias("_fc"))
    )
    w2 = Window.partitionBy("_u").orderBy("_rn")
    ev2 = (
        seq.join(fc, "_u", "left")
        .filter(F.col("_fc").isNull() | (F.col("_rn") <= F.col("_fc")))
        .withColumn("_rn2", F.row_number().over(w2))
        .withColumn("_next", F.lead("_state").over(w2))
    )
    edges = (
        ev2.filter(F.col("_rn2") == 1)
        .select(F.lit("START").alias("cur"), F.col("_state").alias("nxt"))
        .unionByName(
            ev2.filter(F.col("_state") != "CONV").select(
                F.col("_state").alias("cur"),
                F.coalesce("_next", F.lit("NULL")).alias("nxt"),
            )
        )
    )
    counts = edges.groupBy("cur", "nxt").agg(
        F.count(F.lit(1)).cast("bigint").alias("_n")
    )
    totals = counts.groupBy("cur").agg(F.sum("_n").cast("bigint").alias("_t"))
    spark = df.sparkSession
    absorbers = local_frame(spark, 
        [("CONV", "CONV", 1_000_000), ("NULL", "NULL", 1_000_000)],
        "cur string, nxt string, p_e6 long",
    )
    p_full = (
        counts.join(totals, "cur")
        .select(
            "cur",
            "nxt",
            F.expr("(_n * 1000000) div _t").cast("bigint").alias("p_e6"),
        )
        .unionByName(absorbers)
        .localCheckpoint()
    )

    # The matrix is ≤ (|channels|+3)² cells — pull it ONCE and run the
    # knockouts + integer power steps in plain Python (the k-means-
    # codebook benign-scalar class; the corpus-sized window/count work
    # above stays distributed). Python `//` floors and every operand is
    # non-negative, so the arithmetic is identical to the relational
    # `div` form and to the SQL oracle. This replaces ~30 tiny-frame
    # Spark jobs with zero.
    cells = {
        (r["cur"], r["nxt"]): int(r["p_e6"]) for r in p_full.collect()
    }

    def conv_mass_py(p: dict) -> int:
        states = {s for e in p for s in e}
        r = {s: 1_000_000 if s == "START" else 0 for s in states}
        for _ in range(iters):
            acc = dict.fromkeys(states, 0)
            for (s, x), pe6 in p.items():
                acc[x] += r[s] * pe6
            r = {x: v // 1_000_000 for x, v in acc.items()}
        return r.get("CONV", 0)

    def knockout_py(p: dict, ch: str) -> dict:
        out: dict = {}
        for (s, x), pe6 in p.items():
            if s == ch:
                continue
            key = (s, "NULL" if x == ch else x)
            out[key] = out.get(key, 0) + pe6
        return out

    p_full_mass = conv_mass_py(cells)
    rows = []
    for ch in channels:
        removed = conv_mass_py(knockout_py(cells, ch))
        rows.append((ch, p_full_mass, removed, p_full_mass - removed))
    return local_frame(
        spark, rows,
        "channel string, p_full_e6 long, p_removed_e6 long,"
        " removal_e6 long",
    ).orderBy("channel")


def cohort_ltv(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    unit_scale: int = 100,
) -> DataFrame:
    """Weekly cohort lifetime-value curve: cohort = the week of a
    user's first event; cell (cohort, week_offset) carries that week's
    revenue from the cohort's members AND the running cumulative — the
    money companion to retention_cohorts' user counts (the payback
    question is when cum_cents crosses acquisition cost, which a
    retention triangle alone can't answer).

    Exact integer cents; the cumulative is a cohort-partitioned
    running window over the (cohort × offset) triangle — calendar²-
    bounded, never corpus-sized. The only corpus work is one user-
    grain first-week aggregate and one (cohort, week) rollup.
    """
    from pyspark.sql import Window

    firsts = df.groupBy(user_col).agg(
        F.date_trunc("week", F.min(F.col(ts_col)))
        .cast("date")
        .alias("cohort_week")
    )
    cells = (
        df.join(firsts, user_col)
        .select(
            "cohort_week",
            (
                F.datediff(
                    F.date_trunc("week", F.col(ts_col)).cast("date"),
                    F.col("cohort_week"),
                )
                / 7
            )
            .cast("bigint")
            .alias("week_offset"),
            F.floor(F.col(value_col) * unit_scale)
            .cast("decimal(25,0)")
            .alias("_c"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.sum("_c").cast("bigint").alias("week_cents"))
    )
    w = Window.partitionBy("cohort_week").orderBy("week_offset").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return cells.select(
        "cohort_week",
        "week_offset",
        "week_cents",
        F.sum("week_cents").over(w).cast("bigint").alias("cum_cents"),
    ).orderBy("cohort_week", "week_offset")


def tsz_compression_estimate(
    df: DataFrame,
    group_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Gorilla-style delta-of-delta compression estimate per series —
    the storage-planning number a TSDB ingest needs BEFORE committing
    to a codec: regular series (steady cadence → DoD ≈ 0) compress
    ~60×, bursty ones barely 2×, and this query says which you have.

    Simplified cost model, engine-exact by construction: per event,
    1 control bit when the second-grain delta-of-delta is 0, else
    ``1 + 6 + bits(|DoD|)`` (tag + length field + magnitude) with
    ``bits(v) = length(bin(v))`` — the proven power-of-two-safe
    integer log. First two events of a series pay the full 64 + 64
    header. Output per series: event count, modeled bits, raw 64-bit
    cost, and the ratio (one fixed double divide).

    Scale shape: ONE series-keyed window shuffle (two lags share the
    Exchange), then a group aggregate — the sessionize shuffle shape;
    all surfaces BIGINT.
    """
    from data_pipeline_ine_spark.operators.joins import _ntz_epoch_seconds

    w = Window.partitionBy(group_col).orderBy(ts_col, tiebreak_col)
    sec = _ntz_epoch_seconds(F.col(ts_col))
    staged = (
        df.select(group_col, F.col(ts_col), F.col(tiebreak_col))
        .withColumn("_rn", F.row_number().over(w))
        .withColumn("_d", sec - F.lag(sec).over(w))
        .withColumn("_dod", F.col("_d") - F.lag("_d").over(w))
    )
    bits = (
        F.when(F.col("_rn") <= 2, F.lit(64))
        .when(F.col("_dod") == 0, F.lit(1))
        .otherwise(
            F.lit(1) + F.lit(6) + F.length(F.bin(F.abs(F.col("_dod"))))
        )
        .cast("bigint")
    )
    agg = staged.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum(bits).cast("bigint").alias("model_bits"),
    )
    return agg.select(
        group_col,
        "n_events",
        "model_bits",
        (F.col("n_events") * 64).cast("bigint").alias("raw_bits"),
        F.round(
            (F.col("n_events") * 64).cast("double")
            / F.col("model_bits").cast("double"),
            6,
        ).alias("compression_ratio"),
    ).orderBy(group_col)


def watermark_lateness(
    df: DataFrame,
    ts_col: str = "ts",
    arrival_col: str = "event_id",
) -> DataFrame:
    """Watermark-lateness audit: treating ``arrival_col`` as the
    arrival order, each event's lateness is how far its event time
    lags the maximum event time already seen — the exact distribution
    ``withWatermark`` must be sized against (a watermark below the
    p99 lateness silently drops data; one far above it bloats state).
    The batch-side design tool for every streaming operator in
    ``streaming/``.

    Output: one row per engine-exact log2 lateness bucket
    (``length(bin(seconds))``, bucket 0 = in-order) with event counts
    — read it as "a watermark of 2^b seconds keeps everything up to
    bucket b".

    Scale shape: the running max over arrival order is the DISTRIBUTED
    two-pass form (``sampling.py::two_pass_cumsum`` with ``op="max"``
    — range-repartition on arrival, per-partition maxima prefix-maxed
    into broadcast offsets), so the corpus never funnels through one
    sort task; per-source arrival sequences (Kafka) would add the
    source as a group key. Then a ≤64-bucket aggregate.
    """
    from data_pipeline_ine_spark.operators.joins import _ntz_epoch_seconds
    from data_pipeline_ine_spark.operators.sampling import two_pass_cumsum

    sec = _ntz_epoch_seconds(F.col(ts_col))
    staged = two_pass_cumsum(
        df.select(sec.alias("_s"), F.col(arrival_col)),
        [],
        [arrival_col],
        "_s",
        out_col="_runmax",
        op="max",
    ).withColumn("_late", F.col("_runmax") - F.col("_s"))
    bucket = (
        F.when(F.col("_late") > 0, F.length(F.bin(F.col("_late"))))
        .otherwise(F.lit(0))
        .cast("bigint")
    )
    return (
        staged.groupBy(bucket.alias("late_bucket"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.max("_late").cast("bigint").alias("max_late_s"),
        )
        .orderBy("late_bucket")
    )


def series_gap_audit(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-series calendar-gap audit: over each key's observed
    [min, max] day span, how many days are missing, the longest gap,
    and the coverage ratio — the freshness/completeness report an
    ingestion SLA dashboard runs before anyone trusts a daily metric
    (gap_fill densifies; this says whether densifying is papering over
    a real outage).

    All integers: span and present-day counts are exact; the longest
    gap is ``max(day − lag(day) − 1)`` over the (key-partitioned,
    day-ordered) distinct-day frame; coverage is one fixed double
    divide, rounded to 6.

    Scale shape: one distinct (key, day) aggregate (map-side
    combinable) + one key-partitioned window over day-grain rows
    (calendar-bounded partitions) + a key-grain rollup.
    """
    days = (
        df.select(F.col(key_col), F.to_date(ts_col).alias("_day"))
        .distinct()
    )
    w = Window.partitionBy(key_col).orderBy("_day")
    staged = days.withColumn(
        "_gap",
        (F.datediff("_day", F.lag("_day").over(w)) - 1).cast("bigint"),
    )
    agg = staged.groupBy(key_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("present_days"),
        (F.datediff(F.max("_day"), F.min("_day")) + 1)
        .cast("bigint")
        .alias("span_days"),
        F.coalesce(F.max("_gap"), F.lit(0)).cast("bigint").alias(
            "longest_gap"
        ),
    )
    return agg.select(
        key_col,
        "present_days",
        "span_days",
        (F.col("span_days") - F.col("present_days")).cast("bigint").alias(
            "missing_days"
        ),
        "longest_gap",
        F.round(
            F.col("present_days").cast("double")
            / F.col("span_days").cast("double"),
            6,
        ).alias("coverage"),
    ).orderBy(key_col)

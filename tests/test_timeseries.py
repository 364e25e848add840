"""Gap fill / LOCF / NOCB unit semantics (contract parity covers the
oracle-checked query; these pin the operator edge cases on tiny frames)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from data_pipeline_ine_spark.operators.timeseries import gap_fill, locf, nocb


def _series(spark):
    d = dt.date
    rows = [
        ("a", d(2024, 1, 1), 1.0),
        ("a", d(2024, 1, 4), 4.0),
        ("b", d(2024, 1, 2), 2.0),
    ]
    return spark.createDataFrame(rows, "key string, day date, v double")


def test_gap_fill_densifies_each_key_span(spark):
    out = gap_fill(_series(spark), "key", "day").orderBy("key", "day").collect()
    a = [(r.day.day, r.v) for r in out if r.key == "a"]
    assert a == [(1, 1.0), (2, None), (3, None), (4, 4.0)]
    # single-observation key: span collapses to one row, no phantom dates
    assert [(r.day.day, r.v) for r in out if r.key == "b"] == [(2, 2.0)]


def test_locf_fills_forward_only(spark):
    dense = gap_fill(_series(spark), "key", "day")
    out = locf(dense, "key", "day", "v", "filled").orderBy("key", "day").collect()
    assert [r.filled for r in out if r.key == "a"] == [1.0, 1.0, 1.0, 4.0]


def test_locf_leading_nulls_stay_null(spark):
    d = dt.date
    df = spark.createDataFrame(
        [("a", d(2024, 1, 1), None), ("a", d(2024, 1, 2), 5.0)],
        "key string, day date, v double",
    )
    out = locf(df, "key", "day", "v", "filled").orderBy("day").collect()
    assert [r.filled for r in out] == [None, 5.0]


def test_nocb_fills_backward(spark):
    dense = gap_fill(_series(spark), "key", "day")
    out = nocb(dense, "key", "day", "v", "filled").orderBy("key", "day").collect()
    assert [r.filled for r in out if r.key == "a"] == [1.0, 4.0, 4.0, 4.0]


def test_gap_fill_hourly_step(spark):
    df = spark.createDataFrame(
        [("a", dt.datetime(2024, 1, 1, 0), 1.0), ("a", dt.datetime(2024, 1, 1, 3), 2.0)],
        "key string, hr timestamp, v double",
    )
    out = gap_fill(df, "key", "hr", step="interval 1 hour")
    assert out.count() == 4
    assert out.filter(F.col("v").isNull()).count() == 2


def test_user_growth_curve_exact_cumulative_distinct(spark):
    from data_pipeline_ine_spark.operators.timeseries import user_growth_curve

    rows = [
        (1, dt.datetime(2024, 1, 1, 5)),
        (1, dt.datetime(2024, 1, 3, 5)),   # returning user: not new
        (2, dt.datetime(2024, 1, 1, 9)),
        (3, dt.datetime(2024, 1, 3, 1)),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {r.day.isoformat(): (r.new_users, r.cum_users)
           for r in user_growth_curve(df).collect()}
    assert got == {"2024-01-01": (2, 2), "2024-01-03": (1, 3)}


def test_state_occupancy_covers_touched_days_and_clips_open(spark):
    from data_pipeline_ine_spark.operators.timeseries import (
        state_occupancy_daily,
    )

    rows = [
        # user 1: state a on day1 morning → day2 noon, then b (open)
        (1, "a", dt.datetime(2024, 1, 1, 8), dt.datetime(2024, 1, 2, 12)),
        (1, "b", dt.datetime(2024, 1, 2, 12), None),
        # user 2: state a, open since day2 (horizon = max valid_from = day2 12:00)
        (2, "a", dt.datetime(2024, 1, 2, 1), None),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, state string, valid_from timestamp, valid_to timestamp"
    )
    got = {(r.day.isoformat(), r.state): r.n_users
           for r in state_occupancy_daily(df).collect()}
    assert got == {
        ("2024-01-01", "a"): 1,
        ("2024-01-02", "a"): 2,   # user 1 until noon + user 2 open
        ("2024-01-02", "b"): 1,   # user 1 from noon, clipped at horizon
    }


def test_transition_matrix_counts_and_row_normalization(spark):
    from data_pipeline_ine_spark.operators.timeseries import transition_matrix

    rows = [
        # user 1: a -> b -> a   user 2: a -> b
        (1, 1, "2024-01-01 00:00:00", "a"),
        (2, 1, "2024-01-01 00:01:00", "b"),
        (3, 1, "2024-01-01 00:02:00", "a"),
        (4, 2, "2024-01-01 00:00:00", "a"),
        (5, 2, "2024-01-01 00:05:00", "b"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {
        (r.cur_type, r.next_type): (r.n, r.p)
        for r in transition_matrix(df).collect()
    }
    # terminal events (NULL next) are excluded BEFORE normalization, so
    # each row of the matrix sums to 1 over observed transitions only
    assert got == {("a", "b"): (2, 1.0), ("b", "a"): (1, 1.0)}


def test_transition_matrix_tiebreak_makes_lead_deterministic(spark):
    from data_pipeline_ine_spark.operators.timeseries import transition_matrix

    # two simultaneous events: order must follow event_id, giving x->y
    rows = [
        (10, 1, "2024-01-01 00:00:00", "x"),
        (11, 1, "2024-01-01 00:00:00", "y"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    for _ in range(3):
        got = [
            (r.cur_type, r.next_type, r.n)
            for r in transition_matrix(df).collect()
        ]
        assert got == [("x", "y", 1)]


def test_sliding_distinct_count_hand_case(spark):
    from data_pipeline_ine_spark.operators.timeseries import (
        sliding_distinct_count,
    )

    rows = [
        (1, "2024-01-01 10:00:00"),
        (1, "2024-01-01 11:00:00"),  # same user same day: counted once
        (2, "2024-01-03 09:00:00"),
        (1, "2024-01-10 09:00:00"),  # outside user 2's window by day 10
    ]
    df = spark.createDataFrame(rows, "user_id long, ts string").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    got = {
        str(r.obs_day): r.n_active
        for r in sliding_distinct_count(df, window_days=7).collect()
    }
    assert got["2024-01-01"] == 1          # only user 1 active yet
    assert got["2024-01-03"] == 2          # users 1 (Jan 1) and 2 (Jan 3)
    assert got["2024-01-07"] == 2          # Jan 1 still within 7-day window
    assert got["2024-01-08"] == 1          # Jan 1 aged out; user 2 remains
    assert got["2024-01-09"] == 1          # user 2's last contributing day
    assert got["2024-01-10"] == 1          # only user 1's new activity
    assert got["2024-01-16"] == 1          # tail of user 1's Jan 10 window
    assert "2024-01-17" not in got


def test_scd2_apply_edge_cases(spark):
    """Incremental SCD2: untouched keys pass through BY REFERENCE (no
    rebuild), brand-new keys build from the batch alone, and a batch
    repeating the current state must NOT open a new interval."""
    from data_pipeline_ine_spark.operators.timeseries import (
        scd2_apply,
        scd2_intervals,
    )

    old = spark.createDataFrame(
        [
            (1, 1, "2024-01-01 00:00:00", "a"),
            (2, 1, "2024-01-02 00:00:00", "b"),
            (3, 2, "2024-01-01 00:00:00", "x"),
        ],
        "event_id long, user_id long, ts string, event_type string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    new = spark.createDataFrame(
        [
            (4, 1, "2024-01-05 00:00:00", "b"),   # repeat current state: no-op
            (5, 1, "2024-01-06 00:00:00", "c"),   # real change
            (6, 9, "2024-01-06 00:00:00", "z"),   # brand-new key
        ],
        "event_id long, user_id long, ts string, event_type string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))

    got = scd2_apply(scd2_intervals(old), new)
    full = scd2_intervals(old.unionByName(new))
    key = lambda r: (r.user_id, r.state, str(r.valid_from), str(r.valid_to))  # noqa: E731
    assert sorted(map(key, got.collect())) == sorted(map(key, full.collect()))
    rows = {(r.user_id, r.state): (r.valid_from, r.valid_to) for r in got.collect()}
    assert (2, "x") in rows and rows[(2, "x")][1] is None   # untouched, still open
    assert (9, "z") in rows                                  # new key present
    assert rows[(1, "b")][1] is not None                     # closed by the change


# --- ewma_smooth ------------------------------------------------------------


def test_ewma_matches_direct_recursion(spark):
    """ewma_smooth == the plain Python recursion ewma_n = (x_n + e_{n-1})/2
    while history fits the window; values are chosen off half-way points
    so the comparison is unambiguous."""
    rows = [
        (i, 1, f"2024-01-01 00:0{i}:00", float(v))
        for i, v in enumerate([10.0, 20.0, 40.0, 40.0, 10.0])
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    from data_pipeline_ine_spark.operators.timeseries import ewma_smooth

    out = {
        r["event_id"]: r["ewma"]
        for r in ewma_smooth(df, window=16).collect()
    }
    e = None
    for i, v in enumerate([10.0, 20.0, 40.0, 40.0, 10.0]):
        e = v if e is None else (v + e) / 2
        assert out[i] == e, (i, out[i], e)


def test_ewma_truncates_to_window(spark):
    """Beyond the window, old history must stop influencing the value:
    two series identical in their trailing `window` rows but different
    before that produce the SAME ewma on the last row."""
    from data_pipeline_ine_spark.operators.timeseries import ewma_smooth

    def series(uid, prefix):
        vals = prefix + [float(j % 7) for j in range(4)]
        return [
            (uid * 100 + i, uid, f"2024-01-01 00:{i:02d}:00", v)
            for i, v in enumerate(vals)
        ]

    df = spark.createDataFrame(
        series(1, [999.0] * 3) + series(2, [1.0] * 3),
        "event_id long, user_id long, ts string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = ewma_smooth(df, window=4)
    last = {
        r["user_id"]: r["ewma"]
        for r in out.filter(F.col("event_id") % 100 == 6).collect()
    }
    assert last[1] == last[2]


def test_peak_concurrency_closed_form(spark):
    """Sweep line on hand intervals: overlapping triple peaks at 3,
    touching-at-an-instant counts as concurrent (inclusive convention),
    disjoint group stays at 1."""
    from data_pipeline_ine_spark.operators.timeseries import peak_concurrency

    rows = [
        # group a: [1,5] [2,6] [4,8] -> at t=4,5 three are open
        ("a", 1, 5), ("a", 2, 6), ("a", 4, 8),
        # group b: [1,2] [2,3] touch at 2 -> inclusive peak 2
        ("b", 1, 2), ("b", 2, 3),
        # group c: disjoint [1,2] [5,6]
        ("c", 1, 2), ("c", 5, 6),
    ]
    df = spark.createDataFrame(rows, "g string, s int, e int")
    got = {
        r["g"]: r["peak_concurrency"]
        for r in peak_concurrency(df, "s", "e", group_col="g").collect()
    }
    assert got == {"a": 3, "b": 2, "c": 1}


def test_cascade_rollup_levels_consistent_and_exact(spark):
    """Each level's totals are exactly the finer level's re-grouping
    (associativity), counts conserve across levels, and the hand
    corpus's closed-form buckets come out right."""
    import datetime
    from decimal import Decimal

    from data_pipeline_ine_spark.operators.timeseries import cascade_rollup

    base = datetime.datetime(2024, 3, 1, 10, 0, 0)
    rows = [
        (base, 1.25),
        (base + datetime.timedelta(minutes=30), 2.50),   # same hour
        (base + datetime.timedelta(hours=5), 4.00),      # same day
        (base + datetime.timedelta(days=3), 8.00),       # same month
    ]
    df = spark.createDataFrame(rows, "ts timestamp_ntz, v double")
    out = cascade_rollup(df, "ts", "v")
    by_level = {}
    for r in out.collect():
        by_level.setdefault(r["level"], {})[r["bucket"]] = (
            r["n"], r["total"]
        )
    assert by_level["hour"]["2024-03-01 10:00:00"] == (2, Decimal("3.75"))
    assert by_level["day"]["2024-03-01 00:00:00"] == (3, Decimal("7.75"))
    assert by_level["month"]["2024-03-01 00:00:00"] == (4, Decimal("15.75"))
    # conservation: every level sums to the same corpus totals
    for lvl, cells in by_level.items():
        assert sum(n for n, _ in cells.values()) == 4
        assert sum(t for _, t in cells.values()) == Decimal("15.75")


def test_rolling_distinct_users_window_edges(spark):
    """Hand-checkable 7-day WAU: users contribute for exactly 7 days,
    only active days emit rows."""
    from data_pipeline_ine_spark.operators.timeseries import (
        rolling_distinct_users,
    )

    rows = [
        (1, "2024-01-01 10:00:00"),
        (2, "2024-01-01 11:00:00"),
        (1, "2024-01-08 09:00:00"),   # day 8: day-1 activity expired
        (3, "2024-01-05 12:00:00"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts string").select(
        "user_id", F.col("ts").cast("timestamp_ntz").alias("ts")
    )
    got = {
        str(r.day): r.users_7d
        for r in rolling_distinct_users(df, "ts", "user_id", 7).collect()
    }
    # active days only: 1st (u1,u2), 5th (u1,u2,u3), 8th (u3 from the
    # 5th still in range + u1's new event; the Jan 1 events aged out)
    assert got == {"2024-01-01": 2, "2024-01-05": 3, "2024-01-08": 2}


def test_user_max_gap_single_event_is_zero(spark):
    from data_pipeline_ine_spark.operators.timeseries import user_max_gap

    rows = [
        (1, 10, "2024-01-01 00:00:00"),
        (1, 11, "2024-01-01 00:00:30"),
        (1, 12, "2024-01-01 01:00:30"),  # 3600s gap = max
        (2, 20, "2024-01-01 00:00:00"),  # single event
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts string"
    ).select(
        "user_id", "event_id", F.col("ts").cast("timestamp_ntz").alias("ts")
    )
    got = {r.user_id: (r.n_events, r.max_gap_s)
           for r in user_max_gap(df).collect()}
    assert got == {1: (3, 3600), 2: (1, 0)}


def test_linear_attribution_conserves_cents(spark):
    """Per-conversion attributed cents must sum EXACTLY to the
    conversion value in cents — remainder policy, not float leakage —
    and the remainder goes to the earliest touch."""
    from data_pipeline_ine_spark.operators.joins import linear_attribution

    conv = spark.createDataFrame(
        [(100, 1, "2024-01-01 10:00:00", 1.00)],
        "event_id long, user_id long, ts string, value double",
    ).select("event_id", "user_id",
             F.col("ts").cast("timestamp_ntz").alias("ts"), "value")
    touches = spark.createDataFrame(
        [
            (1, "2024-01-01 09:10:00", 7),
            (1, "2024-01-01 09:20:00", 8),
            (1, "2024-01-01 09:30:00", 9),
        ],
        "user_id long, click_ts string, touch_id long",
    ).select("user_id",
             F.col("click_ts").cast("timestamp_ntz").alias("click_ts"),
             "touch_id")
    rows = sorted(
        linear_attribution(conv, touches).collect(),
        key=lambda r: r.touch_rank,
    )
    # 100 cents over 3 touches: 34 (33+1 remainder), 33, 33
    assert [r.attributed_cents for r in rows] == [34, 33, 33]
    assert sum(r.attributed_cents for r in rows) == 100


def test_rolling_distinct_approx_tracks_exact(spark, sf_dir):
    """The HLL day-sketch rolling WAU must agree with the exact
    contribution-explosion operator within HLL tolerance on every
    active day (lg_k=12 => ~1.6% typical, assert 5%)."""
    from data_pipeline_ine_spark.operators.timeseries import (
        rolling_distinct_users,
        rolling_distinct_users_approx,
    )
    from data_pipeline_ine_spark.sources.registry import load_table

    ev = load_table(spark, sf_dir, "events")
    exact = {
        r.day: r.users_7d
        for r in rolling_distinct_users(ev, "ts", "user_id", 7).collect()
    }
    approx = {
        r.day: r.users_7d_approx
        for r in rolling_distinct_users_approx(ev, "ts", "user_id", 7).collect()
    }
    assert set(exact) == set(approx)
    for day, n in exact.items():
        assert abs(approx[day] - n) <= max(2, 0.05 * n), (day, n, approx[day])


def test_interarrival_burstiness_known_cases(spark):
    """Metronomic gaps -> B = -1 (sigma=0); gaps [10,30] -> mu=20,
    sigma=10 -> B = -1/3; all-zero gaps -> NULL (0/0 undefined);
    single-event users dropped."""
    from datetime import datetime

    from data_pipeline_ine_spark.operators.timeseries import (
        interarrival_burstiness,
    )

    t0 = datetime(2024, 1, 1)

    def at(s):
        return datetime(2024, 1, 1, s // 3600, (s % 3600) // 60, s % 60)

    rows = (
        [(1, i, at(i * 60)) for i in range(4)]           # metronome, gap=60
        + [(2, 10, at(0)), (2, 11, at(10)), (2, 12, at(40))]  # gaps 10,30
        + [(3, 20, t0), (3, 21, t0), (3, 22, t0)]        # all-zero gaps
        + [(4, 30, t0)]                                   # single event
    )
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp")
    out = {r.user_id: r for r in interarrival_burstiness(df).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1].burstiness == -1.0 and out[1].n_gaps == 3
    assert out[2].burstiness == round(-1.0 / 3.0, 6)
    assert out[2].gap_sum_s == 40
    assert out[3].burstiness is None


def test_kaplan_meier_hand_curve(spark):
    """4 users: deaths at durations 0, 2, 3; one long-lived censored
    user. Survival 3/4 * 2/3 * 1/2 = 1/4 accumulates as exact snapped
    e6 logs."""
    import math
    from datetime import datetime

    from data_pipeline_ine_spark.operators.timeseries import kaplan_meier

    rows = [
        (1, datetime(2024, 1, 1)),
        (2, datetime(2024, 1, 1)), (2, datetime(2024, 1, 3)),
        (3, datetime(2024, 1, 1)), (3, datetime(2024, 2, 25)),
        (4, datetime(2024, 1, 1)), (4, datetime(2024, 1, 4)),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {
        r.duration_days: r
        for r in kaplan_meier(df, "ts", "user_id", "2024-02-28", 7).collect()
    }
    assert set(out) == {0, 2, 3}
    assert (out[0].n_risk, out[0].n_events) == (4, 1)
    assert (out[2].n_risk, out[2].n_events) == (3, 1)
    assert (out[3].n_risk, out[3].n_events) == (2, 1)

    def sn(x):
        return math.floor(math.log(x) * 1e6 + 0.5)

    assert out[0].ln_surv_e6 == sn(3 / 4)
    assert out[2].ln_surv_e6 == sn(3 / 4) + sn(2 / 3)
    assert out[3].ln_surv_e6 == sn(3 / 4) + sn(2 / 3) + sn(1 / 2)
    # extinction step: both users die at the same duration -> NULL
    ext = spark.createDataFrame(
        [(1, datetime(2024, 1, 1)), (2, datetime(2024, 1, 1))],
        "user_id long, ts timestamp",
    )
    r = kaplan_meier(ext, "ts", "user_id", "2024-02-28", 7).collect()
    assert len(r) == 1 and r[0].ln_surv_e6 is None


def test_theil_sen_ignores_flash_sale(spark):
    """Daily revenues 100,200,300,400 then a 10000 outlier day: 6 of 10
    pairwise slopes are exactly 100/day, so the lower median is 10000
    cents/day — untouched by the outlier that would wreck OLS."""
    from datetime import datetime

    from data_pipeline_ine_spark.operators.timeseries import theil_sen_daily

    rows = [
        (datetime(2024, 1, day), float(v))
        for day, v in [(1, 100), (2, 200), (3, 300), (4, 400), (5, 10000)]
    ]
    df = spark.createDataFrame(rows, "ts timestamp, value double")
    r = theil_sen_daily(df, "ts", "value").collect()[0]
    assert r.n_days == 5 and r.n_pairs == 10
    assert r.ts_slope_cents_per_day == 10000.0


def _daily_events(spark, cents_by_day):
    """One event per day at the given integer-cent value, Jan 2024."""
    rows = [
        (dt.datetime(2024, 1, d + 1, 12, 0, 0), c / 100.0)
        for d, c in enumerate(cents_by_day)
    ]
    return spark.createDataFrame(rows, "ts timestamp, value double")


def test_acf_daily_matches_pairwise_pearson(spark):
    """acf_daily == the plain pairwise Pearson computed in Python on the
    same daily series (alternating series → strongly negative lag-1,
    positive lag-2)."""
    from data_pipeline_ine_spark.operators.timeseries import acf_daily

    cents = [100, 300, 120, 310, 90, 320, 110, 290, 95, 305]
    out = {
        r.lag: (r.n_pairs, r.acf)
        for r in acf_daily(
            _daily_events(spark, cents), "ts", "value", max_lag=3
        ).collect()
    }

    def pearson(pairs):
        n = len(pairs)
        sx = sum(x for x, _ in pairs)
        sy = sum(y for _, y in pairs)
        sxy = sum(x * y for x, y in pairs)
        sxx = sum(x * x for x, _ in pairs)
        syy = sum(y * y for _, y in pairs)
        num = n * sxy - sx * sy
        den = (n * sxx - sx * sx) ** 0.5 * (n * syy - sy * sy) ** 0.5
        return round(num / den, 6)

    for lag in (1, 2, 3):
        pairs = list(zip(cents[:-lag], cents[lag:]))
        assert out[lag] == (len(pairs), pearson(pairs))
    assert out[1][1] < -0.9 and out[2][1] > 0.9


def test_dow_seasonality_flags_the_hot_weekday(spark):
    """Two Mondays at triple the weekday value → Monday index ≈ 3× the
    quiet days'; count-weighted mean of indices is exactly 1."""
    from data_pipeline_ine_spark.operators.timeseries import dow_seasonality

    rows = []
    for day in range(1, 15):  # 2024-01-01 is a Monday
        d = dt.date(2024, 1, day)
        rows.append((d, 30.0 if d.weekday() == 0 else 10.0))
    df = spark.createDataFrame(rows, "o_orderdate date, o_totalprice double")
    out = {r.dow: r for r in dow_seasonality(df).collect()}
    assert set(out) == set(range(7))
    assert out[1].dow_index > 2.0 > 1.0 > out[0].dow_index  # dow 1 = Monday
    total_n = sum(r.n_rows for r in out.values())
    weighted = sum(r.n_rows * r.dow_index for r in out.values())
    assert abs(weighted / total_n - 1.0) < 1e-6


def test_cusum_alarm_matches_imperative_recurrence_and_fires_on_drift(
    spark,
):
    """The prefix-sum-minus-running-min closed form equals the textbook
    max(0, S+x−μ−k) loop day for day, stays quiet on the flat head and
    fires after the injected +40% level shift."""
    from data_pipeline_ine_spark.operators.timeseries import cusum_alarm

    # multiples of 25 ⇒ c/100.0 is an exact dyadic ⇒ floor(v·100) == c
    cents = [1000, 1025, 975, 1000, 1050, 950, 1000, 1025] + [1400] * 8
    out = cusum_alarm(
        _daily_events(spark, cents),
        "ts",
        "value",
        slack_permille=50,
        h_permille=200,
    ).orderBy("day").collect()

    mu = sum(cents) // len(cents)
    k = (mu * 50) // 1000
    h = (mu * 200) // 1000
    s = 0
    for r, x in zip(out, cents):
        s = max(0, s + x - mu - k)
        assert r.x_cents == x
        assert r.s_cents == s, f"day {r.day}: {r.s_cents} != {s}"
        assert r.alarm == (1 if s > h else 0)
    assert all(r.alarm == 0 for r in out[:8])
    assert out[-1].alarm == 1


def test_markov_stationary_hand_chain(spark):
    """Two-state chain a→b always, b→a always (alternating events per
    user): stationary is 50/50 exactly; mass stays ~1e6 through the
    integer iterations."""
    rows = []
    for uid in range(4):
        for i in range(6):
            rows.append(
                (uid, "a" if i % 2 == 0 else "b",
                 dt.datetime(2024, 1, 1, i), uid * 100 + i)
            )
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp, event_id long"
    )
    from data_pipeline_ine_spark.operators.timeseries import (
        markov_stationary,
    )

    out = {r.state: r.stationary_e6 for r in markov_stationary(df).collect()}
    # period-2 chain: uniform start IS stationary → stays 500000/500000
    assert out == {"a": 500_000, "b": 500_000}


def test_markov_stationary_sticky_state_dominates(spark):
    """A 3:1-sticky state must end with more mass than the uniform
    start; total mass is conserved up to truncation."""
    # user sequences: a a a b a a a b ... → P(a→a)=3/4ish, P(b→a)=1
    rows = []
    for uid in range(8):
        seq = ["a", "a", "a", "b"] * 3
        for i, s in enumerate(seq):
            rows.append((uid, s, dt.datetime(2024, 1, 1, i), uid * 100 + i))
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp, event_id long"
    )
    from data_pipeline_ine_spark.operators.timeseries import (
        markov_stationary,
    )

    out = {r.state: r.stationary_e6 for r in markov_stationary(df).collect()}
    assert out["a"] > 650_000  # true stationary ≈ 3/4
    assert 980_000 <= out["a"] + out["b"] <= 1_000_000


def test_funnel_latency_hand_delays(spark):
    """Hand-built funnel: user 1 converts view→click in 60s and
    click→purchase in 120s; user 2 clicks BEFORE viewing (must not
    count as converted); user 3 view→click 180s, no purchase. Medians
    are explicit order statistics under (delay, user)."""
    from data_pipeline_ine_spark.operators.timeseries import funnel_latency

    t = dt.datetime
    rows = [
        (1, "view", t(2024, 1, 1, 10, 0, 0)),
        (1, "click", t(2024, 1, 1, 10, 1, 0)),
        (1, "purchase", t(2024, 1, 1, 10, 3, 0)),
        (2, "click", t(2024, 1, 1, 9, 0, 0)),   # pre-view click: no conv
        (2, "view", t(2024, 1, 1, 9, 30, 0)),
        (3, "view", t(2024, 1, 1, 8, 0, 0)),
        (3, "click", t(2024, 1, 1, 8, 3, 0)),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    out = {r.transition: r for r in funnel_latency(df).collect()}
    vc = out["view->click"]
    # converters: user 1 (60s), user 3 (180s); lower median = 60s
    assert (vc.n_converted, vc.median_delay_s) == (2, 60)
    cp = out["click->purchase"]
    assert (cp.n_converted, cp.median_delay_s) == (1, 120)


def test_binseg_split_cost_bottoms_at_the_step(spark):
    """A clean level step: the two-segment SSE is exactly 0 at the true
    split and strictly positive everywhere else."""
    cents = [1000] * 6 + [2000] * 6
    from data_pipeline_ine_spark.operators.timeseries import binseg_split

    out = binseg_split(
        _daily_events(spark, cents), "ts", "value"
    ).orderBy("day").collect()
    assert len(out) == 11
    best = min(out, key=lambda r: r.split_cost)
    assert best.n_left == 6 and best.split_cost == 0.0
    for r in out:
        if r.n_left != 6:
            assert r.split_cost > 0.0


def test_markov_attribution_counterfactual_credits(spark):
    """Hand journeys: every conversion passes through 'click', so
    knocking click out zeroes the conversion mass (removal = full);
    'error' appears only on non-converting paths, so its removal
    effect is 0; full-model mass reflects the 2-of-3 converting
    users."""
    from data_pipeline_ine_spark.operators.timeseries import (
        markov_attribution,
    )

    t = dt.datetime
    rows = [
        # user 1: view -> click -> purchase
        (1, "view", t(2024, 1, 1, 9), 1),
        (1, "click", t(2024, 1, 1, 10), 2),
        (1, "purchase", t(2024, 1, 1, 11), 3),
        # user 2: click -> purchase
        (2, "click", t(2024, 1, 1, 9), 4),
        (2, "purchase", t(2024, 1, 1, 10), 5),
        # user 3: view -> error (no conversion)
        (3, "view", t(2024, 1, 1, 9), 6),
        (3, "error", t(2024, 1, 1, 10), 7),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp, event_id long"
    )
    out = {
        r.channel: r
        for r in markov_attribution(
            df, channels=("click", "error", "view"), iters=6
        ).collect()
    }
    full = out["click"].p_full_e6
    assert full > 600_000  # 2/3 of users convert (minus e6 truncation)
    assert out["click"].p_removed_e6 == 0
    assert out["click"].removal_e6 == full
    assert out["error"].removal_e6 == 0
    # 'view' helps user 1 only; removing it keeps user 2's direct path
    assert 0 < out["view"].removal_e6 < full


def test_cohort_ltv_triangle_and_cumulative(spark):
    """Two cohorts with hand-placed spend: cells land in the right
    (cohort, offset) slots and the cumulative sums along each cohort
    row; a user's later spend credits their FIRST-week cohort."""
    from data_pipeline_ine_spark.operators.timeseries import cohort_ltv

    t = dt.datetime
    rows = [
        (1, t(2024, 1, 1, 9), 10.0),    # cohort wk of Jan 1
        (1, t(2024, 1, 10, 9), 5.0),    # same user, offset 1
        (2, t(2024, 1, 10, 9), 7.0),    # cohort wk of Jan 8
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    out = {(str(r.cohort_week), r.week_offset): (r.week_cents, r.cum_cents)
           for r in cohort_ltv(df).collect()}
    assert out[("2024-01-01", 0)] == (1000, 1000)
    assert out[("2024-01-01", 1)] == (500, 1500)
    assert out[("2024-01-08", 0)] == (700, 700)
    assert len(out) == 3


def test_tsz_compression_regular_vs_bursty(spark):
    """A perfectly regular series (constant cadence → DoD = 0 after the
    header) compresses near 64x per post-header event; a jittery series
    pays magnitude bits; both model sums match a hand computation."""
    from data_pipeline_ine_spark.operators.timeseries import (
        tsz_compression_estimate,
    )

    t = dt.datetime
    rows = []
    # regular: every 60s
    for i in range(10):
        rows.append(("reg", t(2024, 1, 1, 0, i), i))
    # bursty: gaps 60, 120, 60, 120... → DoD alternates ±60
    g = 0
    for i in range(10):
        g += 60 if i % 2 == 0 else 120
        rows.append(("bur", t(2024, 1, 1) + dt.timedelta(seconds=g), 100 + i))
    df = spark.createDataFrame(
        rows, "event_type string, ts timestamp, event_id long"
    )
    out = {r.event_type: r for r in tsz_compression_estimate(df).collect()}
    # regular: 2 headers (64+64) + 8 zero-DoD events (1 bit each)
    assert out["reg"].model_bits == 64 + 64 + 8
    # bursty: headers + 8 events of |DoD|=60 → 1+6+6 bits each (60=0b111100)
    assert out["bur"].model_bits == 64 + 64 + 8 * 13
    assert out["reg"].compression_ratio > out["bur"].compression_ratio


def test_watermark_lateness_buckets_late_arrivals(spark):
    """Arrival order (event_id) with injected stragglers: in-order
    events land in bucket 0; a 100s-late event in bucket 7 (2^6 < 100
    <= 2^7); max_late_s is exact."""
    from data_pipeline_ine_spark.operators.timeseries import (
        watermark_lateness,
    )

    t = dt.datetime
    rows = [
        (1, t(2024, 1, 1, 0, 0, 0)),
        (2, t(2024, 1, 1, 0, 5, 0)),
        (3, t(2024, 1, 1, 0, 3, 20)),   # 100s behind the running max
        (4, t(2024, 1, 1, 0, 6, 0)),
        (5, t(2024, 1, 1, 0, 5, 59)),   # 1s behind → bucket 1
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp")
    out = {r.late_bucket: r for r in watermark_lateness(df).collect()}
    assert out[0].n_events == 3
    assert out[7].n_events == 1 and out[7].max_late_s == 100
    assert out[1].n_events == 1 and out[1].max_late_s == 1


def test_series_gap_audit_hand_case(spark):
    """A series present on days 1,2,5,9 of a 9-day span: 5 missing, the
    longest gap is 3 (days 6-8), coverage 4/9; a dense series audits
    clean; single-day series span 1 with gap 0."""
    from data_pipeline_ine_spark.operators.timeseries import (
        series_gap_audit,
    )

    t = dt.datetime
    rows = (
        [("gappy", t(2024, 1, d, 12)) for d in (1, 2, 5, 9)]
        + [("dense", t(2024, 1, d, 12)) for d in (1, 2, 3)]
        + [("solo", t(2024, 1, 4, 12))]
    )
    df = spark.createDataFrame(rows, "event_type string, ts timestamp")
    out = {r.event_type: r for r in series_gap_audit(df).collect()}
    g = out["gappy"]
    assert (g.present_days, g.span_days, g.missing_days, g.longest_gap) == (
        4, 9, 5, 3,
    )
    assert g.coverage == round(4 / 9, 6)
    d = out["dense"]
    assert (d.missing_days, d.longest_gap, d.coverage) == (0, 0, 1.0)
    s = out["solo"]
    assert (s.present_days, s.span_days, s.longest_gap) == (1, 1, 0)


def test_seasonal_decompose_recovers_injected_weekly_pattern(spark):
    """A constant base + zero-sum weekly pattern decomposes exactly:
    the 7-day trend sum is 7·base everywhere a full consecutive week
    exists (the pattern cancels), seasonal recovers the pattern, and
    the residual is 0. A calendar gap voids the trend window around it
    instead of averaging a short span; series edges stay NULL."""
    import datetime as dt

    from data_pipeline_ine_spark.operators.timeseries import (
        seasonal_decompose_weekly,
    )

    base = 100.0
    pattern = [3.0, -1.0, 2.0, -4.0, 0.0, 1.0, -1.0]  # sums to 0
    start = dt.datetime(2024, 1, 1, 12)  # Monday; epoch-dow anchors don't matter
    rows = []
    for i in range(28):
        d = start + dt.timedelta(days=i)
        dow = (d.date() - dt.date(1970, 1, 1)).days % 7
        rows.append((d, base + pattern[dow]))
    df = spark.createDataFrame(rows, "ts timestamp, value double")
    out = {r.day: r for r in seasonal_decompose_weekly(df, "ts", "value").collect()}
    assert len(out) == 28
    days = sorted(out)
    # edges: first/last 3 days have no full window
    for d in days[:3] + days[-3:]:
        assert out[d].trend7_e2 is None and out[d].resid is None
    for d in days[3:-3]:
        assert out[d].trend7_e2 == 7 * int(base * 100)
        dow = (d - dt.date(1970, 1, 1)).days % 7
        assert abs(out[d].seasonal - pattern[dow]) < 1e-6, (d, out[d])
        assert abs(out[d].resid) < 1e-6

    # gap: drop day index 10 -> days 8..13 (within 3 of the hole) lose trend
    gappy = spark.createDataFrame(
        [r for r in rows if r[0] != start + dt.timedelta(days=10)],
        "ts timestamp, value double",
    )
    out2 = {
        r.day: r
        for r in seasonal_decompose_weekly(gappy, "ts", "value").collect()
    }
    hole = (start + dt.timedelta(days=10)).date()
    for off in (-3, -2, -1, 1, 2, 3):
        d = hole + dt.timedelta(days=off)
        assert out2[d].trend7_e2 is None, d
    assert out2[hole + dt.timedelta(days=4)].trend7_e2 == 7 * int(base * 100)

"""Feature-operator unit semantics + plan shape (oracle parity for the
contract queries lives in test_contract_parity)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from data_pipeline_ine_spark.operators.features import (
    fixed_histogram,
    group_zscore,
    quantile_bins,
)


def test_group_zscore_matches_closed_form(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 10.0), ("b", 10.0)],
        "g string, v double",
    )
    out = {(r.g, r.v): r.zscore for r in group_zscore(df, "g", "v").collect()}
    assert out[("a", 2.0)] == 0.0
    assert math.isclose(out[("a", 3.0)], 1.0)  # std([1,2,3]) == 1
    # zero-variance group: NULL, not ±inf
    assert out[("b", 10.0)] is None


def test_group_zscore_single_row_group_is_null(spark):
    df = spark.createDataFrame([("a", 5.0)], "g string, v double")
    assert group_zscore(df, "g", "v").collect()[0].zscore is None


def test_fixed_histogram_bins_and_top_edge(spark):
    df = spark.createDataFrame([(float(i),) for i in range(11)], "v double")
    rows = {r.bin_idx: r for r in fixed_histogram(df, "v", n_bins=5).collect()}
    # width 2: bins [0,2),[2,4),... ; v=10 (the max) folds into the last bin
    assert [rows[i].n for i in range(5)] == [2, 2, 2, 2, 3]
    assert rows[0].bin_lo == 0.0 and rows[4].bin_hi == 10.0


def test_quantile_bins_quartiles(spark):
    df = spark.createDataFrame([(float(i),) for i in range(1, 9)], "v double")
    out = quantile_bins(df, "v")
    counts = {r.q_bin: r.cnt for r in out.groupBy("q_bin").agg(
        F.count(F.lit(1)).alias("cnt")).collect()}
    assert counts == {0: 2, 1: 2, 2: 2, 3: 2}


def test_zscore_stats_join_is_broadcast(spark):
    df = spark.createDataFrame([("a", 1.0), ("a", 2.0)], "g string, v double")
    plan = group_zscore(df, "g", "v")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_kll_cutpoints_match_exact_at_sf01(spark):
    """The documented 100 TB swap for quantile_bins cutpoints: a KLL
    sketch's quantile estimates at sf0.1 must land within its rank-error
    guarantee of the exact percentiles (k=200 → ~1.3% normalized rank
    error; we assert 2% in VALUE terms via the exact quantile at the
    shifted ranks, which is the guarantee KLL actually makes)."""
    import pyspark.sql.functions as F

    from data_pipeline_ine_spark.operators.sketches import kll_quantiles
    from data_pipeline_ine_spark.sources.registry import load_table

    events = load_table(spark, "/root/testdata/sf0.1", "events")
    probs = (0.25, 0.5, 0.75)
    eps = 0.02
    exact_row = events.agg(
        F.percentile(
            "value", F.array(*[F.lit(float(p)) for p in probs])
        ).alias("c"),
        # exact quantiles at the rank-error-shifted positions bound the
        # acceptable sketch answers in value space
        F.percentile(
            "value", F.array(*[F.lit(max(0.0, p - eps)) for p in probs])
        ).alias("lo"),
        F.percentile(
            "value", F.array(*[F.lit(min(1.0, p + eps)) for p in probs])
        ).alias("hi"),
    ).first()
    sketch = kll_quantiles(events, "value", probs=probs).first()
    for i, p in enumerate(probs):
        got = sketch[f"q{int(p * 100)}"]
        lo, hi, ex = exact_row.lo[i], exact_row.hi[i], exact_row.c[i]
        assert lo <= got <= hi, (
            f"p{p}: sketch {got} outside rank-error band [{lo}, {hi}] "
            f"(exact {ex})"
        )


def test_grouped_ols_recovers_exact_line(spark):
    """Perfectly linear groups: OLS must recover slope/intercept exactly
    (decimal moments make the closed form exact on exact inputs)."""
    from data_pipeline_ine_spark.operators.features import grouped_ols

    rows = [("a", x, 3.0 * x + 7.0) for x in range(10)] + [
        ("b", x, -0.5 * x + 2.0) for x in range(10)
    ]
    df = spark.createDataFrame(rows, "g string, x int, y double")
    out = {r["g"]: r for r in grouped_ols(df, "x", "y", ["g"]).collect()}
    assert out["a"]["slope"] == 3.0 and out["a"]["intercept"] == 7.0
    assert out["b"]["slope"] == -0.5 and out["b"]["intercept"] == 2.0


def test_grouped_ols_null_on_zero_x_variance(spark):
    from data_pipeline_ine_spark.operators.features import grouped_ols

    df = spark.createDataFrame(
        [("a", 5, 1.0), ("a", 5, 2.0)], "g string, x int, y double"
    )
    row = grouped_ols(df, "x", "y", ["g"]).collect()[0]
    assert row["slope"] is None and row["intercept"] is None


def test_level_shift_detects_step(spark):
    """Step function 10→30 between rows 9 and 10 (w=4): the last pre-step
    row sees the full +20 shift, rows deep inside a flat region score 0,
    and edge rows without full frames are not scored at all."""
    from data_pipeline_ine_spark.operators.features import level_shift_scores

    rows = [
        (i, "k", f"2024-01-01 00:{i:02d}:00", 10.0 if i < 10 else 30.0)
        for i in range(20)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, event_type string, ts string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {
        r["event_id"]: r["level_shift"]
        for r in level_shift_scores(
            df, "value", "event_type", "ts", "event_id", w=4
        ).collect()
    }
    # full frames exist for ids 4..15 only
    assert sorted(out) == list(range(4, 16))
    assert out[9] == 20.0  # before 5-8 all 10, after 10-13 all 30
    assert out[4] == 0.0  # deep inside the flat low region
    assert out[15] == 0.0  # deep inside the flat high region
    assert out[11] == 15.0  # before 7-10 = (10,10,10,30) mean 15, after 30


def test_centroid_drift_flags_shifted_group(spark):
    """A group whose vectors are offset from the corpus mean scores a
    strictly larger drift numerator than groups drawn identically."""
    import random

    from data_pipeline_ine_spark.operators.similarity import centroid_drift

    rnd = random.Random(13)
    rows = []
    for i in range(300):
        label = i % 3
        shift = 0.5 if label == 2 else 0.0
        rows.append((i, label, [rnd.uniform(-1, 1) + shift for _ in range(8)]))
    df = spark.createDataFrame(rows, "vec_id long, label int, embedding array<double>")
    out = {r["label"]: r for r in centroid_drift(df).collect()}
    assert out[2]["drift_num"] > out[0]["drift_num"]
    assert out[2]["drift_num"] > out[1]["drift_num"]
    assert all(out[k]["n_vecs"] == 100 for k in out)


def test_log2_histogram_buckets_exact_boundaries(spark):
    """Power-of-two boundaries land in the right bucket (the exact case
    libm log2 gets wrong): 1.27 -> 127 units (bucket 7), 1.28 -> 128
    units (bucket 8); zero and negative collapse to bucket 0."""
    from data_pipeline_ine_spark.operators.features import log2_histogram

    rows = [(1.27,), (1.28,), (2.55,), (2.56,), (0.0,), (-3.5,), (0.01,)]
    df = spark.createDataFrame(rows, "v double")
    got = {
        r["bucket"]: (r["lo_units"], r["hi_units"], r["n"])
        for r in log2_histogram(df, "v").collect()
    }
    assert got[7] == (64, 127, 1)          # 127
    assert got[8] == (128, 255, 2)         # 128 and 255 cents
    assert got[9] == (256, 511, 1)         # 256
    assert got[0] == (0, 0, 2)             # 0.0 and -3.5
    assert got[1] == (1, 1, 1)             # 1 cent


def test_spearman_by_group_closed_form(spark):
    """Perfect monotone (nonlinear) relation scores 1.0; perfect
    inverse scores -1.0; ties average correctly (scipy-checkable hand
    case)."""
    from data_pipeline_ine_spark.operators.features import spearman_by_group

    mono = [(i, float(i), float(i * i)) for i in range(1, 11)]
    inv = [(i, float(i), float(-i)) for i in range(1, 11)]
    df = spark.createDataFrame(
        [("m", *r[1:]) for r in mono] + [("i", *r[1:]) for r in inv],
        "g string, x double, y double",
    )
    got = {r.g: r.corr for r in spearman_by_group(df, "x", "y", ["g"]).collect()}
    assert got == {"m": 1.0, "i": -1.0}

    # tie case: x = [1,1,2], y = [1,2,3] -> rank_x = [1.5,1.5,3],
    # rank_y = [1,2,3]; Pearson of those = 0.866025
    tie = spark.createDataFrame(
        [("t", 1.0, 1.0), ("t", 1.0, 2.0), ("t", 2.0, 3.0)],
        "g string, x double, y double",
    )
    row = spearman_by_group(tie, "x", "y", ["g"]).collect()[0]
    assert abs(row.corr - 0.866025) < 1e-6


def test_novel_ngram_rate_accretion(spark):
    """Snapshot 0 is all-novel by construction; a later snapshot that
    repeats snapshot-0 text verbatim contributes zero novel
    occurrences; fresh text is novel."""
    from data_pipeline_ine_spark.operators.text import novel_ngram_rate

    rows = [
        (0, "alpha beta gamma delta"),          # snap 0: 2 trigrams, novel
        (100, "alpha beta gamma"),               # snap 1: repeat -> 0 novel
        (101, "epsilon zeta eta theta iota"),    # snap 1: 3 novel trigrams
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.snapshot: r for r in novel_ngram_rate(df).collect()}
    assert out[0].n_occ == 2 and out[0].n_novel == 2
    assert out[0].novel_rate_e6 == 1000000
    assert out[1].n_occ == 4 and out[1].n_novel == 3
    assert out[1].novel_rate_e6 == 750000


def test_mahalanobis_outliers_2d_matches_numpy(spark):
    """Population-covariance Mahalanobis distances agree with numpy's
    matrix form; the off-structure point is flagged, on-structure
    points are not; an exactly-collinear group is dropped (singular)."""
    import numpy as np

    from data_pipeline_ine_spark.operators.features import (
        mahalanobis_outliers_2d,
    )

    pts = [(0, 0), (1, 1), (2, 2), (3, 3), (4, 4), (5, 5), (10, 0)]
    rows = [("g", i, float(x), float(y)) for i, (x, y) in enumerate(pts)]
    rows += [("line", 100 + i, float(i), float(2 * i)) for i in range(4)]
    df = spark.createDataFrame(rows, "grp string, id long, x double, y double")
    out = mahalanobis_outliers_2d(
        df, "x", "y", ["grp"], id_col="id", threshold=3.0
    ).collect()
    assert all(r.grp == "g" for r in out)  # collinear group dropped

    a = np.array(pts, dtype=float)
    mu = a.mean(axis=0)
    cov = np.cov(a.T, bias=True)
    inv = np.linalg.inv(cov)
    d2 = [float((p - mu) @ inv @ (p - mu)) for p in a]
    want = {i: v for i, v in enumerate(d2) if v > 3.0}
    got = {r.id: r.d2 for r in out}
    assert set(got) == set(want)
    for i, v in want.items():
        assert abs(got[i] - v) < 1e-6
    assert 6 in got  # the (10, 0) point is the flagged outlier


def test_rfm_segments_scores_and_rollup(spark):
    """Customers engineered into clear best/worst RFM corners land in
    the right cells, every score stays in 1..5, and the rollup
    conserves customers and cents."""
    import datetime as dt

    from data_pipeline_ine_spark.operators.features import rfm_segments

    rows = []
    # 10 customers: customer i orders (i+1) times, each order 100*(i+1)
    # dollars, last order day i+1 (later i = more recent = higher r).
    for i in range(10):
        for j in range(i + 1):
            rows.append((i, dt.date(2024, 1, i + 1), 100.0 * (i + 1)))
    df = spark.createDataFrame(
        rows, "o_custkey long, o_orderdate date, o_totalprice double"
    )
    out = rfm_segments(df).collect()
    assert sum(r.n_customers for r in out) == 10
    assert sum(r.segment_cents for r in out) == sum(
        (i + 1) * (i + 1) * 100 * 100 for i in range(10)
    )
    for r in out:
        assert 1 <= r.r_score <= 5
        assert 1 <= r.f_score <= 5
        assert 1 <= r.m_score <= 5
    # customer 9: most recent, most orders, most spend → (5,5,5)
    top = [r for r in out if (r.r_score, r.f_score, r.m_score) == (5, 5, 5)]
    assert len(top) == 1 and top[0].n_customers >= 1
    # customer 0: oldest, fewest, least → (1,1,1)
    bot = [r for r in out if (r.r_score, r.f_score, r.m_score) == (1, 1, 1)]
    assert len(bot) == 1


def test_loo_target_encode_excludes_own_row(spark):
    """Hand check: the encoding computed for a row drops that row's
    target from the numerator and one count from the denominator —
    two rows of the same category with different targets get
    DIFFERENT encodings (plain mean encoding would tie them)."""
    from data_pipeline_ine_spark.operators.features import (
        loo_target_encode,
    )

    rows = [
        (1, "a", 10.0),
        (2, "a", 20.0),
        (3, "a", 30.0),
        (4, "b", 40.0),
    ]
    df = spark.createDataFrame(rows, "id long, cat string, y double")
    out = {
        r.id: r
        for r in loo_target_encode(
            df, "cat", "y", "id", m_smooth=2
        ).collect()
    }
    gm = (1000 + 2000 + 3000 + 4000) // 4  # 2500 cents
    # row 1 (cat a, x=1000): (6000-1000+2*2500) // (3-1+2) = 10000//4
    assert out[1].enc_cents == (6000 - 1000 + 2 * gm) // 4
    assert out[2].enc_cents == (6000 - 2000 + 2 * gm) // 4
    assert out[1].enc_cents != out[2].enc_cents
    # singleton category: denominator is just m_smooth
    assert out[4].enc_cents == (4000 - 4000 + 2 * gm) // 2
    assert all(r.n_cat in (1, 3) for r in out.values())


def test_categorical_mi_independent_and_dependent(spark):
    """Perfectly dependent columns score ln(k); independent columns
    score ~0 (snapping noise only) — the two MI anchors, checked at e6
    fixed point against closed forms."""
    import math

    from data_pipeline_ine_spark.operators.features import categorical_mi

    # dependent: y == x over 4 balanced categories → MI = ln 4
    dep = spark.createDataFrame(
        [(str(i % 4), str(i % 4)) for i in range(64)], "x string, y string"
    )
    r = categorical_mi(dep, "x", "y").collect()[0]
    assert r.n_cells == 4
    assert abs(r.mi_nats - math.log(4)) < 1e-5
    # independent: x from the low bit, y from higher bits — all 8
    # cells equally occupied → MI = 0
    ind = spark.createDataFrame(
        [(str(i % 2), str((i // 2) % 4)) for i in range(64)],
        "x string, y string",
    )
    r2 = categorical_mi(ind, "x", "y").collect()[0]
    assert r2.n_cells == 8
    assert r2.sum_terms_e6 == 0
    assert r2.mi_nats == 0.0


def test_gini_split_finds_the_separating_boundary(spark):
    """A feature that perfectly separates the classes at a power-of-two
    boundary: the boundary's weighted Gini is 0, every other split is
    strictly worse, and child counts reconcile."""
    from data_pipeline_ine_spark.operators.features import gini_split

    # label = value >= 2.56 (units 256 → bucket 9); low half 0.31..1.27
    rows = [(0.31 + 0.32 * i, False) for i in range(4)] + [
        (2.56 * (i + 1), True) for i in range(4)
    ]
    df = spark.createDataFrame(rows, "v double, y boolean")
    out = gini_split(df, "v", F.col("y")).collect()
    best = min(out, key=lambda r: r.gini_weighted)
    assert best.gini_weighted == 0.0
    assert best.pos_left == 0 and best.pos_right == best.n_right
    for r in out:
        assert r.n_left + r.n_right == 8
        if r.bucket != best.bucket:
            assert r.gini_weighted > 0.0


def test_conformal_interval_covers_at_least_1_minus_alpha(spark):
    """The returned q̂ is an actual residual order statistic: at least
    ⌈(n+1)(1−α)⌉/n of the calibration rows sit within ±q̂ of the fitted
    line, and the rank formula matches the hand computation."""
    import math

    from data_pipeline_ine_spark.operators.features import (
        conformal_interval,
        grouped_ols,
    )

    rows = [
        (i, "g", float(i), 2.0 * i + ((-1) ** i) * (i % 7))
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "id long, g string, x double, y double")
    out = conformal_interval(
        df, "x", "y", ["g"], id_col="id", alpha_permille=100
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_rows == 40
    assert r.conformal_rank == min(40, ((40 + 1) * 900) // 1000)  # 36
    fit = grouped_ols(df, "x", "y", ["g"]).collect()[0]
    covered = sum(
        1
        for (_, _, x, y) in rows
        if abs(y - (fit.intercept + fit.slope * x)) <= r.q_hat + 1e-9
    )
    assert covered >= r.conformal_rank


def test_calendar_features_known_dates(spark):
    """Hand-checked anchors: 2024-01-01 is a Monday (dow 1, ISO week 1),
    2024-12-29 is a Sunday (dow 0, weekend); ISO week of 2023-01-01
    (a Sunday) is 52 of the PREVIOUS ISO year — the convention trap."""
    import datetime as dt

    from data_pipeline_ine_spark.operators.features import calendar_features

    df = spark.createDataFrame(
        [(dt.date(2024, 1, 1),), (dt.date(2024, 12, 29),),
         (dt.date(2023, 1, 1),), (dt.date(2024, 7, 4),)],
        "d date",
    )
    out = {str(r.day): r for r in calendar_features(df, "d").collect()}
    jan1 = out["2024-01-01"]
    assert (jan1.dow, jan1.iso_week, jan1.quarter, jan1.is_weekend) == (
        1, 1, 1, 0,
    )
    dec29 = out["2024-12-29"]
    assert (dec29.dow, dec29.is_weekend) == (0, 1)
    assert out["2023-01-01"].iso_week == 52
    jul4 = out["2024-07-04"]
    assert (jul4.dom, jul4.month, jul4.quarter) == (4, 7, 3)


def test_robust_scale_flash_sale_immune(spark):
    """A 100x outlier barely moves the scaled values of ordinary rows
    (median shifts one rank at most, IQR stays order-statistic-bounded)
    while itself scoring huge — the property z-scores lack, where one
    outlier deflates every other row toward 0. Hand-checked order
    statistics: n=10 → med rank 5 (=14.00), q1 rank 2 (=11.00), q3
    rank 8 (=17.00)."""
    from data_pipeline_ine_spark.operators.features import robust_scale

    base = [(i, "g", 10.0 + i) for i in range(9)]  # 10..18
    df = spark.createDataFrame(
        base + [(99, "g", 1400.0)], "id long, g string, v double"
    )
    out = {r.id: r for r in robust_scale(df, "v", ["g"]).collect()}
    assert all(r.iqr_units == 600 for r in out.values())  # 17.00 − 11.00
    assert out[4].scaled == 0.0            # the median row (14.00)
    assert out[99].scaled == 231.0         # (140000 − 1400) / 600
    for i in range(9):                     # ordinary rows stay small
        assert abs(out[i].scaled) <= 1.0


def test_robust_scale_zero_iqr_is_null(spark):
    from data_pipeline_ine_spark.operators.features import robust_scale

    df = spark.createDataFrame(
        [(i, "g", 5.0) for i in range(8)], "id long, g string, v double"
    )
    out = robust_scale(df, "v", ["g"]).collect()
    assert all(r.scaled is None for r in out)
    assert all(r.centered_units == 0 for r in out)


def test_weighted_median_crosses_on_weight_not_rows(spark):
    """A few heavy rows outweigh many light ones: row-median is 10 but
    weight-median is 100 (the heavy value holds >half the weight);
    zero-weight rows never move the crossing."""
    from data_pipeline_ine_spark.operators.features import weighted_median

    rows = [("g", 10.0, 1.0)] * 5 + [("g", 100.0, 10.0)]
    df = spark.createDataFrame(rows, "g string, v double, w double")
    out = weighted_median(df, "v", "w", ["g"]).collect()[0]
    # total weight 15.00 → crossing at cumulative 7.50: the five light
    # rows sum to 5.00 < 7.5, so the heavy value 100 is the median
    assert out.wmedian_units == 10000
    assert out.total_weight_units == 1500


def test_rank_auc_anchors(spark):
    """Perfect separation scores 1.0, anti-separation 0.0, a constant
    score 0.5 (all ties → half credit), and a known half-overlap case
    matches the hand-computed Mann-Whitney value."""
    from data_pipeline_ine_spark.operators.features import rank_auc

    def auc(pairs):
        df = spark.createDataFrame(pairs, "s double, y boolean")
        return rank_auc(df, "s", F.col("y")).collect()[0]

    perfect = [(float(i), i >= 5) for i in range(10)]
    assert auc(perfect).auc == 1.0
    inverted = [(float(i), i < 5) for i in range(10)]
    assert auc(inverted).auc == 0.0
    constant = [(1.0, i % 2 == 0) for i in range(10)]
    assert auc(constant).auc == 0.5
    # pos scores {2,4}, neg {1,3}: pairs won 3 of 4 → AUC 0.75
    mixed = [(1.0, False), (2.0, True), (3.0, False), (4.0, True)]
    r = auc(mixed)
    assert (r.n_pos, r.n_neg, r.auc) == (2, 2, 0.75)


def test_effective_sample_size_anchors(spark):
    """Equal weights → ESS = n (ratio 1); one dominating weight → ESS
    near 1; both match the Kish closed form computed by hand."""
    from data_pipeline_ine_spark.operators.features import (
        effective_sample_size,
    )

    rows = [("eq", 2.0)] * 8 + [("skew", 100.0)] + [("skew", 0.01)] * 9
    df = spark.createDataFrame(rows, "g string, w double")
    out = {r.g: r for r in effective_sample_size(df, "w", ["g"]).collect()}
    assert out["eq"].ess == 8.0 and out["eq"].ess_ratio == 1.0
    # skew: sw = 10000 + 9 = 10009; sww = 1e8 + 9 → ESS ≈ 1.0017
    sw, sww = 10009, 10**8 + 9
    assert out["skew"].ess == round(sw * sw / sww, 6)
    assert out["skew"].ess < 1.1


def test_eta_squared_anchors(spark):
    """Groups with identical within-group values and different means →
    eta² = 1 (all variance is between); identical group distributions
    → eta² = 0; a hand-mixed case matches the closed form."""
    from data_pipeline_ine_spark.operators.features import eta_squared

    pure = [("a", 1.0)] * 5 + [("b", 3.0)] * 5
    r = eta_squared(
        spark.createDataFrame(pure, "g string, v double"), "v", "g"
    ).collect()[0]
    assert r.eta_squared == 1.0
    same = [("a", 1.0), ("a", 3.0), ("b", 1.0), ("b", 3.0)]
    r2 = eta_squared(
        spark.createDataFrame(same, "g string, v double"), "v", "g"
    ).collect()[0]
    assert r2.eta_squared == 0.0


def test_weighted_quantiles_consistent_with_median_and_monotone(spark, sf_dir):
    """wq2_4 must equal the lower weighted median exactly (same crossing
    rule, same running-weight frame), and the quartiles must be
    monotone non-decreasing within every group."""
    from data_pipeline_ine_spark.operators.features import (
        weighted_median,
        weighted_quantiles,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    wq = {
        r.l_returnflag: r
        for r in weighted_quantiles(
            li, "l_extendedprice", "l_quantity", ["l_returnflag"]
        ).collect()
    }
    wm = {
        r.l_returnflag: r.wmedian_units
        for r in weighted_median(
            li, "l_extendedprice", "l_quantity", ["l_returnflag"]
        ).collect()
    }
    assert set(wq) == set(wm)
    for g, r in wq.items():
        assert r.wq2_4_units == wm[g]
        assert r.wq1_4_units <= r.wq2_4_units <= r.wq3_4_units


def test_skyline_2d_hand_case_with_duplicates_and_ties(spark):
    """Hand-built dominance: (2,5) is beaten by the cheaper same-size
    (1,5); (4,2) by (3,1); identical duplicates (1,5)x2 both survive
    (weak dominance never strictly beats an equal point); same-x rows
    above their x's min size are dropped."""
    from data_pipeline_ine_spark.operators.features import skyline_2d

    rows = [
        (1, 1.0, 5), (2, 1.0, 5), (3, 2.0, 5), (4, 2.0, 3),
        (5, 3.0, 1), (6, 4.0, 2),
    ]
    df = spark.createDataFrame(rows, "id bigint, x double, y int")
    out = sorted(
        (r.id for r in skyline_2d(df, "x", "y", keep_cols=("id",)).collect())
    )
    assert out == [1, 2, 4, 5]

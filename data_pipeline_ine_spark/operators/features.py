"""Feature-engineering operators: group normalization, histograms, binning.

Training-data pipelines turn raw metric columns into model-ready features:
z-scores within a stratum, fixed-width histogram bins for drift monitoring,
quantile bins for discretization. All three share one distributed shape —

    pass 1: a tiny aggregate (per group or global) of exact moments/bounds
    pass 2: a broadcast join / literal fold back onto the corpus, narrow

— never a window over the corpus (a ``partitionBy(group)`` window would
sort whole strata through single tasks; the aggregate+broadcast form keeps
the corpus pass embarrassingly parallel and the shuffle O(groups)).

Cross-engine determinism: moments are accumulated in DECIMAL, not DOUBLE.
Float partial aggregation is re-association-order dependent (different
partitionings → different last bits → a z-score or bin edge that flickers
between runs and engines); the inputs here have fixed decimal scale, so
sums and sums-of-squares are EXACT in decimal and every derived double
(mean, stddev, z) is a deterministic function of them.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def group_zscore(
    df: DataFrame,
    group_col: str,
    value_col: str,
    out_col: str = "zscore",
    scale: int = 2,
    round_to: int = 4,
) -> DataFrame:
    """Standardize ``value_col`` within each group: (v - mean) / stddev.

    ``scale`` is the input's decimal scale (2 for money-like columns);
    moments are exact at ``scale``/``2·scale`` so the derived mean/stddev
    are bit-stable across engines and partitionings. Sample stddev
    (n-1 denominator); single-row groups get NULL, zero-variance groups
    get NULL (not ±inf). One O(groups) shuffle + one broadcast join.
    """
    dec = F.col(value_col).cast(f"decimal(18,{scale})")
    stats = df.groupBy(group_col).agg(
        F.sum(dec).alias("_s"),
        F.sum((dec * dec).cast(f"decimal(38,{2 * scale})")).alias("_ss"),
        F.count(dec).alias("_n"),
    ).select(
        group_col,
        (F.col("_s").cast("double") / F.col("_n")).alias("_mean"),
        F.sqrt(
            F.try_divide(
                F.col("_ss").cast("double")
                - F.col("_s").cast("double") * F.col("_s").cast("double")
                / F.col("_n"),
                (F.col("_n") - 1).cast("double"),
            )
        ).alias("_std"),
    )
    z = (F.col(value_col) - F.col("_mean")) / F.when(
        F.col("_std") > 0, F.col("_std")
    )
    return (
        df.join(broadcast(stats), group_col)
        .withColumn(out_col, F.round(z, round_to))
        .drop("_mean", "_std")
    )


def fixed_histogram(
    df: DataFrame,
    value_col: str,
    n_bins: int = 20,
    round_to: int = 6,
) -> DataFrame:
    """Equal-width histogram over the observed [min, max] range.

    Returns one row per non-empty bin: ``bin_idx`` (0-based), ``bin_lo``,
    ``bin_hi``, ``n``. The top edge is inclusive (max lands in the last
    bin, not a phantom ``n_bins``-th). Bounds come from a scalar
    aggregate folded back as a cross-joined 1-row literal — Catalyst
    broadcasts it, so the binning pass stays narrow.
    """
    bounds = df.agg(
        F.min(value_col).alias("_lo"), F.max(value_col).alias("_hi")
    )
    width = (F.col("_hi") - F.col("_lo")) / n_bins
    bin_idx = F.least(
        F.floor((F.col(value_col) - F.col("_lo")) / width), F.lit(n_bins - 1)
    ).cast("int")
    return (
        df.join(broadcast(bounds))
        .select(bin_idx.alias("bin_idx"), F.col("_lo"), width.alias("_w"))
        .groupBy("bin_idx", "_lo", "_w")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "bin_idx",
            F.round(F.col("_lo") + F.col("bin_idx") * F.col("_w"), round_to)
            .alias("bin_lo"),
            F.round(F.col("_lo") + (F.col("bin_idx") + 1) * F.col("_w"), round_to)
            .alias("bin_hi"),
            "n",
        )
    )


def quantile_bins(
    df: DataFrame,
    value_col: str,
    probs: Sequence[float] = (0.25, 0.5, 0.75),
    out_col: str = "q_bin",
    method: str = "exact",
) -> DataFrame:
    """Discretize ``value_col`` into ``len(probs)+1`` quantile bins
    (0-based; bin b = values in (cut[b-1], cut[b]], upper-inclusive
    cutpoints).

    ``method="exact"`` uses ``percentile`` (one O(distinct values)
    aggregate) because the oracle must reproduce the cutpoints
    bit-for-bit; ``method="kll"`` is the 100 TB path — the mergeable
    KLL sketch (~0.4% rank error at k=2048, bounded memory regardless
    of cardinality) with the SAME downstream plan shape. The two agree
    on bin assignment for all but the ~rank-error sliver of rows around
    each cutpoint (tolerance-tested at sf0.1).
    """
    if method == "kll":
        sk = F.kll_sketch_agg_double(F.col(value_col).cast("double"))
        cuts = df.agg(sk.alias("_sk")).select(
            F.array(
                *[
                    F.kll_sketch_get_quantile_double(F.col("_sk"), F.lit(float(p)))
                    for p in probs
                ]
            ).alias("_c")
        )
    else:
        cuts = df.agg(
            F.percentile(
                value_col, F.array(*[F.lit(float(p)) for p in probs])
            ).alias("_c")
        )
    expr: Column = F.lit(len(probs))
    for i in range(len(probs) - 1, -1, -1):
        expr = F.when(
            F.col(value_col) <= F.element_at(F.col("_c"), i + 1), F.lit(i)
        ).otherwise(expr)
    return df.join(broadcast(cuts)).withColumn(out_col, expr).drop("_c")


def group_percentile_gate(
    df: DataFrame,
    value_col: str,
    group_col: str,
    q: float = 0.25,
    keep: str = "ge",
) -> DataFrame:
    """Filter rows against their GROUP's exact percentile of ``value_col``
    — e.g. "keep documents scoring at or above the p25 of their source".
    Gating against a per-group threshold instead of a global one is the
    standard curation move when sources have different score
    distributions: a global cut would empty the hardest source and keep
    everything from the easiest.

    Scale shape: one exact-percentile aggregate per group (group-keyed
    shuffle of (group, value) pairs only), then the tiny thresholds frame
    broadcasts back onto the corpus — the corpus itself is never
    re-shuffled. At extreme group cardinality swap ``percentile`` for the
    mergeable KLL sketch (operators/sketches.py) exactly as documented for
    ``quantile_bins``.

    Appends ``group_threshold`` to the kept rows.
    """
    thr = (
        df.groupBy(group_col)
        .agg(
            F.round(
                F.expr(f"percentile({value_col}, {q!r})"), 6
            ).alias("group_threshold")
        )
    )
    gated = df.join(broadcast(thr), group_col)
    cmp = (
        F.col(value_col) >= F.col("group_threshold")
        if keep == "ge"
        else F.col(value_col) <= F.col("group_threshold")
    )
    return gated.filter(cmp)


def grouped_corr(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_cols: Sequence[str],
    scale: int = 4,
) -> DataFrame:
    """Pearson correlation of ``x_col``/``y_col`` per group, engine-exact.

    Spark's ``corr`` aggregate accumulates doubles in partition order, so
    two engines (or two runs with different partitioning) can disagree in
    the last ulps. Here the five moment sums (Σx, Σy, Σxy, Σx², Σy²)
    accumulate as decimals — exact, order-invariant — and only the final
    closed-form formula runs in doubles, deterministically from exact
    inputs. ``scale`` must cover the inputs' decimal places (products
    carry 2·scale). One group-keyed aggregate; map-side partials apply.
    """
    xd = F.col(x_col).cast(f"decimal(18,{scale})")
    yd = F.col(y_col).cast(f"decimal(18,{scale})")
    g = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xd).alias("sx"),
        F.sum(yd).alias("sy"),
        F.sum(xd * yd).alias("sxy"),
        F.sum(xd * xd).alias("sxx"),
        F.sum(yd * yd).alias("syy"),
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx, syy = F.col("sxx").cast("double"), F.col("syy").cast("double")
    num = n * sxy - sx * sy
    den = F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)
    return g.select(
        *group_cols,
        F.col("n"),
        F.round(num / den, 6).alias("corr"),
    )


def mad_outliers(
    df: DataFrame,
    value_col: str,
    group_col: str | None = None,
    k: float = 3.5,
    z_col: str = "robust_z",
) -> DataFrame:
    """Robust outlier gate by median / MAD — the heavy-tail-safe
    alternative to ``group_zscore``: mean and stddev are themselves
    dragged by the outliers they're supposed to flag, while the median
    and the median-absolute-deviation have a 50% breakdown point. Rows
    with ``|x − median| > k · 1.4826 · MAD`` are flagged (1.4826 scales
    MAD to σ under normality; k=3.5 is the conventional cut).

    Appends ``robust_z = (x − median) / (1.4826 · MAD)`` (rounded 6dp)
    and returns ONLY the flagged rows. MAD = 0 (>50% of a group tied at
    the median) flags nothing — no division blow-up.

    Scale shape: same two-pass discipline as every feature op here —
    pass 1 computes the per-group median, then the deviation median;
    each exact-percentile aggregate shuffles narrow ``(group, value)``
    pairs (exact percentiles have no small mergeable state — the
    aggregation buffer carries the values), and the O(groups) threshold
    frame broadcasts back onto the corpus, so the full-width corpus is
    never shuffled and no per-group window sorts whole strata through
    single tasks. At 100 TB swap the exact percentile for the KLL
    sketch (operators/sketches.py) and the shuffles drop to true
    sketch-sized partials, same plan shape.
    """
    gcols = [group_col] if group_col else []
    med = (
        df.groupBy(*gcols).agg(
            F.percentile(value_col, F.lit(0.5)).alias("_med")
        )
        if gcols
        else df.agg(F.percentile(value_col, F.lit(0.5)).alias("_med"))
    )
    dev = df.join(broadcast(med), gcols) if gcols else df.crossJoin(broadcast(med))
    mad = (
        dev.groupBy(*gcols).agg(
            F.percentile(
                F.abs(F.col(value_col) - F.col("_med")), F.lit(0.5)
            ).alias("_mad"),
            F.first("_med").alias("_med2"),
        )
    )
    scale = F.lit(1.4826) * F.col("_mad")
    joined = df.join(broadcast(mad), gcols) if gcols else df.crossJoin(broadcast(mad))
    return (
        joined.filter(
            (F.col("_mad") > 0)
            & (F.abs(F.col(value_col) - F.col("_med2")) > F.lit(k) * scale)
        )
        .withColumn(
            z_col,
            F.round((F.col(value_col) - F.col("_med2")) / scale, 6),
        )
        .drop("_mad", "_med2")
    )


def quantile_normalize(
    df: DataFrame,
    value_col: str,
    group_col: str,
    out_col: str = "qnorm",
) -> DataFrame:
    """Rank-based normalization within each group: every row gets its
    SQL ``PERCENT_RANK`` — ``(#rows with smaller value) / (n − 1)`` with
    ties sharing a rank — mapping any score distribution onto [0, 1].
    The standard move for mixing quality signals whose scales don't
    compare (a logloss and a length ratio), and for building
    distribution-matched curation cuts across sources.

    Scale shape: the textbook formulation is a window over the corpus
    partitioned by group — which sorts ENTIRE strata through single
    tasks, the per-group-window anti-pattern this module exists to
    avoid. Here the identical result comes from the aggregate+broadcast
    shape: per-(group, value) counts (one map-combined shuffle), a
    running-sum window over the DISTINCT-VALUES frame (value-cardinality
    sized, not corpus sized), and a join back on (group, value). The
    rank fraction is ONE integer divide, rounded 6dp — engine-exact.
    """
    from pyspark.sql import Window

    vc = (
        df.groupBy(group_col, value_col)
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    w = (
        Window.partitionBy(group_col)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wn = Window.partitionBy(group_col)
    ranked = vc.select(
        group_col,
        value_col,
        F.coalesce(F.sum("_c").over(w), F.lit(0)).alias("_lt"),
        F.sum("_c").over(wn).alias("_n"),
    )
    qn = F.when(
        F.col("_n") > 1,
        F.round(F.col("_lt").cast("double") / (F.col("_n") - 1), 6),
    ).otherwise(F.lit(0.0))
    return df.join(
        ranked.withColumn(out_col, qn).drop("_lt", "_n"),
        [group_col, value_col],
    )


def winsorized_sums(
    df: DataFrame,
    value_col: str,
    group_col: str,
    lo_p: float = 0.05,
    hi_p: float = 0.95,
) -> DataFrame:
    """Winsorized (percentile-clipped) per-group sums — the robust
    aggregate that keeps a handful of fat-tail outliers from dominating a
    revenue/length/score rollup.

    Global lo/hi cutoffs come from ONE exact-percentile aggregate (a
    1-row frame, broadcast back over the corpus — the corpus itself is
    never re-shuffled for the bounds); each value is clipped into
    [lo, hi] and snapped to exact cents with ``FLOOR(v·100 + 0.5)``
    (IEEE-exact ops), then accumulated as integers — so the sum is
    partial-aggregation-order invariant and engine-exact even though the
    interpolated percentile bounds are full-precision doubles. At extreme
    cardinality swap the exact percentile for KLL on the same plan shape
    (see ``group_percentile_gate``).
    """
    bounds = df.agg(
        F.expr(f"percentile({value_col}, {lo_p})").alias("_lo"),
        F.expr(f"percentile({value_col}, {hi_p})").alias("_hi"),
    )
    clipped = df.join(broadcast(bounds)).select(
        group_col,
        F.floor(
            F.least(F.greatest(F.col(value_col), F.col("_lo")), F.col("_hi"))
            * 100
            + 0.5
        )
        .cast("bigint")
        .alias("_cents"),
    )
    return clipped.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum("_cents").cast("double") / 100.0).alias("wsum"),
    )


def grouped_ols(
    df: DataFrame,
    x_col: Column | str,
    y_col: Column | str,
    group_cols: Sequence[str],
    scale: int = 4,
) -> DataFrame:
    """Closed-form per-group simple linear regression (OLS): slope and
    intercept of y on x from the same decimal-exact moment sums as
    :func:`grouped_corr` — slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²),
    intercept = (Σy − slope·Σx)/n. The distributed trend-fit behind
    per-entity drift lines, per-segment elasticities, and forecasting
    features — millions of independent regressions in ONE group-keyed
    aggregate, no ML library, no iteration.

    Accepts Column expressions for x (e.g. an epoch-seconds cast of a
    timestamp). Moment accumulation is order-invariant decimal, so the
    fit is engine-exact; only the final closed form runs in doubles.
    Groups with zero x-variance return NULL slope (guarded divide)."""
    xc = F.col(x_col) if isinstance(x_col, str) else x_col
    yc = F.col(y_col) if isinstance(y_col, str) else y_col
    xd = xc.cast(f"decimal(25,{scale})")
    yd = yc.cast(f"decimal(25,{scale})")
    g = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xd).alias("sx"),
        F.sum(yd).alias("sy"),
        F.sum(xd * yd).alias("sxy"),
        F.sum(xd * xd).alias("sxx"),
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy, sxx = F.col("sxy").cast("double"), F.col("sxx").cast("double")
    den = n * sxx - sx * sx
    slope = F.when(den != 0, (n * sxy - sx * sy) / den)
    return g.select(
        *group_cols,
        F.col("n"),
        F.round(slope, 6).alias("slope"),
        F.round((sy - slope * sx) / n, 6).alias("intercept"),
    )


def level_shift_scores(
    df: DataFrame,
    value_col: str,
    key_col: str,
    ts_col: str = "ts",
    id_col: str = "event_id",
    w: int = 8,
) -> DataFrame:
    """Changepoint (level-shift) signal per key: at each event, the gap
    between the NEXT-``w`` mean and the PREVIOUS-``w`` mean of the
    value, from two bounded window frames — the monitoring primitive
    for "did this entity's level jump here". Rows need full windows on
    both sides (edges are not scored against partial means).

    Engineered like ewma_smooth for cross-engine exactness: values go
    through integer cents, each frame SUM is exact BIGINT, and the two
    divisions are correctly-rounded IEEE ops from exact integers —
    bit-identical everywhere with NO decimal rounding. One shuffle on
    the key; state bounded at 2·w rows per frame."""
    cents = F.floor(F.col(value_col) * 100 + F.lit(0.5)).cast("bigint")
    order = Window.partitionBy(key_col).orderBy(ts_col, id_col)
    before = order.rowsBetween(-w, -1)
    after = order.rowsBetween(1, w)
    out = df.select(
        id_col,
        key_col,
        ts_col,
        F.count(F.lit(1)).over(before).alias("_nb"),
        F.count(F.lit(1)).over(after).alias("_na"),
        F.sum(cents).over(before).alias("_sb"),
        F.sum(cents).over(after).alias("_sa"),
    )
    shift = (
        F.col("_sa").cast("double") / F.col("_na").cast("double")
        - F.col("_sb").cast("double") / F.col("_nb").cast("double")
    ) / F.lit(100.0)
    return out.filter((F.col("_nb") == w) & (F.col("_na") == w)).select(
        id_col, key_col, ts_col, shift.alias("level_shift")
    )


def log2_histogram(
    df: DataFrame,
    value_col: str,
    group_col: str | None = None,
    scale: int = 100,
) -> DataFrame:
    """Log-scaled (powers-of-two) histogram for heavy-tailed positive
    values — the latency/size/price distribution view where equal-width
    bins (:func:`value_histogram`) put 99% of mass in one bin.

    Engine-exact bucketing with NO logarithm: the value is fixed-pointed
    to integer units (``floor(v·scale)``) and its bucket is the BINARY
    DIGIT COUNT (``length(bin(units))`` = ``floor(log2) + 1``) — pure
    integer/string ops every engine agrees on, where ``floor(log2(x))``
    via libm flips at power-of-two boundaries. Bucket b covers units
    ``[2^(b−1), 2^b − 1]``, emitted as exact bounds. Non-positive
    values land in bucket 0 (``[0, 0]``) rather than vanishing.

    One narrow projection + one (group, bucket) aggregate — bucket
    cardinality is ≤ 63 + 1 per group by construction.
    """
    g = [group_col] if group_col else []
    units = F.floor(F.col(value_col) * scale).cast("bigint")
    bucket = F.when(units <= 0, F.lit(0)).otherwise(
        F.length(F.bin(units))
    ).cast("int")
    lo = F.when(F.col("bucket") == 0, F.lit(0)).otherwise(
        F.expr("shiftleft(CAST(1 AS BIGINT), bucket - 1)")
    )
    hi = F.when(F.col("bucket") == 0, F.lit(0)).otherwise(
        F.expr("shiftleft(CAST(1 AS BIGINT), bucket) - 1")
    )
    return (
        df.select(*g, bucket.alias("bucket"))
        .groupBy(*g, "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            *g,
            "bucket",
            lo.alias("lo_units"),
            hi.alias("hi_units"),
            F.col("n").cast("bigint").alias("n"),
        )
    )


def spearman_by_group(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_cols: Sequence[str],
) -> DataFrame:
    """Spearman rank correlation per group — Pearson on tie-averaged
    ranks, the robust/monotonic complement to ``grouped_corr`` (outlier
    prices can't drag it, and any monotone nonlinearity scores 1).

    Engine-exactness: the tie-averaged rank ``(2·min_rank + ties − 1)/2``
    is kept as the INTEGER ``2·avg_rank = 2·rank() + count(ties) − 1``
    (rank() is the tie-group's min position, so the doubled average is
    always integral); the five Pearson moment sums over these integers
    accumulate as decimals — exact, order-invariant — and only the final
    closed form runs in doubles, deterministically from exact inputs.

    Scale shape: two group-partitioned rank windows (one per variable,
    same partition key — one exchange) + the single moment aggregate of
    ``grouped_corr``. Never a global window.
    """
    from pyspark.sql import Window

    gx = Window.partitionBy(*group_cols).orderBy(F.col(x_col))
    gy = Window.partitionBy(*group_cols).orderBy(F.col(y_col))
    tx = Window.partitionBy(*group_cols, x_col)
    ty = Window.partitionBy(*group_cols, y_col)
    ranked = df.select(
        *group_cols,
        (2 * F.rank().over(gx) + F.count(F.lit(1)).over(tx) - 1).alias("_rx2"),
        (2 * F.rank().over(gy) + F.count(F.lit(1)).over(ty) - 1).alias("_ry2"),
    )
    return grouped_corr(ranked, "_rx2", "_ry2", group_cols, scale=0)


def mahalanobis_outliers_2d(
    df: DataFrame,
    x_col: Column | str,
    y_col: Column | str,
    group_cols: Sequence[str],
    id_col: str = "id",
    threshold: float = 12.0,
) -> DataFrame:
    """Grouped bivariate Mahalanobis outliers — the multivariate
    complement to ``zscore``/``mad_outliers``: a row can be
    unremarkable on quantity AND on price yet wildly off the group's
    quantity-price correlation structure; Mahalanobis distance is the
    covariance-aware yardstick that catches it (χ²₂: d² > 12 ≈ the
    0.25% tail). The classic price-integrity / fat-finger audit.

    Engine-exact: inputs are exact integer units, the per-group moment
    sums stay DECIMAL(38,0), and the 2×2 closed form needs no matrix
    library — with the integer-centered terms ``U = n·x − Σx``,
    ``V = n·y − Σy`` and cofactors ``Cxx = n·Σx² − (Σx)²`` (ditto
    ``Cyy``, ``Cxy``), the distance collapses to
    ``d² = (U²·Cyy − 2·U·V·Cxy + V²·Cxx) / (Cxx·Cyy − Cxy²)`` — one
    fixed double expression over decimal-exact operands on both
    engines (decimal→double conversion is correctly rounded in both).
    Degenerate groups (singular covariance: constant or collinear
    columns) return no rows rather than fake distances.

    Scale shape: ONE group-keyed moment aggregate (map-side combined),
    the |groups|-row moments frame broadcast back onto the scan, a
    per-row projection + filter. Output is outlier-sized.
    """
    xc = (F.col(x_col) if isinstance(x_col, str) else x_col).cast(
        "decimal(19,0)"
    )
    yc = (F.col(y_col) if isinstance(y_col, str) else y_col).cast(
        "decimal(19,0)"
    )
    gcols = list(group_cols)
    rows = df.select(*gcols, F.col(id_col), xc.alias("_x"), yc.alias("_y"))
    m = rows.groupBy(*gcols).agg(
        F.count(F.lit(1)).cast("decimal(19,0)").alias("_n"),
        F.sum("_x").cast("decimal(38,0)").alias("_sx"),
        F.sum("_y").cast("decimal(38,0)").alias("_sy"),
        F.sum(F.col("_x") * F.col("_x")).cast("decimal(38,0)").alias("_sxx"),
        F.sum(F.col("_y") * F.col("_y")).cast("decimal(38,0)").alias("_syy"),
        F.sum(F.col("_x") * F.col("_y")).cast("decimal(38,0)").alias("_sxy"),
    )
    n = F.col("_n").cast("double")
    sx, sy = F.col("_sx").cast("double"), F.col("_sy").cast("double")
    sxx, syy = F.col("_sxx").cast("double"), F.col("_syy").cast("double")
    sxy = F.col("_sxy").cast("double")
    cxx = n * sxx - sx * sx
    cyy = n * syy - sy * sy
    cxy = n * sxy - sx * sy
    det = cxx * cyy - cxy * cxy
    u = n * F.col("_x").cast("double") - sx
    v = n * F.col("_y").cast("double") - sy
    d2 = (u * u * cyy - 2.0 * u * v * cxy + v * v * cxx) / det
    return (
        rows.join(F.broadcast(m), gcols)
        .filter(det > 0)
        .select(*gcols, id_col, F.round(d2, 6).alias("d2"))
        .filter(F.col("d2") > threshold)
    )


def rfm_segments(
    df: DataFrame,
    key_col: str = "o_custkey",
    date_col: str = "o_orderdate",
    value_col: str = "o_totalprice",
    n_tiles: int = 5,
    unit_scale: int = 100,
) -> DataFrame:
    """RFM (recency / frequency / monetary) customer segmentation —
    the workhorse marketing cut: per customer, days since last order,
    order count, and lifetime cents, each scored into ``n_tiles``
    quintiles (5 = best), then rolled up to one row per (r,f,m) cell
    so the output is segment-sized, never customer-sized.

    Determinism: quintiles follow the SQL-standard ``ntile`` bucket
    arithmetic (N div n rows per bucket, remainder to the leading
    buckets) — recovered as integer expressions from the DISTRIBUTED
    two-pass rank (``sampling.py::two_pass_cumsum``'s rank sibling)
    under the TOTAL order ``(metric, key)``, so no customer-grain
    frame ever funnels through one sort task and the buckets are
    bit-identical to a single ``ntile`` window. Recency is an exact
    datediff against the corpus max date; monetary is exact integer
    cents. No floats anywhere.

    Scale shape: one customer-grain aggregate is the corpus-sized
    work; three two-pass ranks (range-repartition + broadcast
    offsets) replace the three single-partition ntile sorts. The
    corpus max date and the customer count ride 1-row broadcasts
    (documented benign BNLJ class).
    """
    from data_pipeline_ine_spark.operators.sampling import two_pass_rank

    per = df.groupBy(key_col).agg(
        F.max(F.col(date_col).cast("date")).alias("_last"),
        F.count(F.lit(1)).cast("bigint").alias("f_orders"),
        F.sum(
            F.floor(F.col(value_col) * unit_scale).cast("decimal(25,0)")
        )
        .cast("bigint")
        .alias("m_cents"),
    )
    horizon = df.agg(
        F.max(F.col(date_col).cast("date")).alias("_hmax")
    )
    base = per.crossJoin(F.broadcast(horizon)).withColumn(
        "r_days", F.datediff("_hmax", "_last").cast("bigint")
    )
    ranked = two_pass_rank(base, ["r_days", key_col], out_col="_rr")
    ranked = two_pass_rank(ranked, ["f_orders", key_col], out_col="_rf")
    ranked = two_pass_rank(ranked, ["m_cents", key_col], out_col="_rm")
    ncust = per.agg(F.count(F.lit(1)).cast("bigint").alias("_nc"))

    def _ntile(rn: str) -> Column:
        # SQL-standard ntile from the global rank rn and N: the first
        # N % n buckets hold (N div n)+1 rows, the rest N div n — all
        # non-negative integer div/mod, engine-exact. The div-by-q
        # branch is unreachable when q = 0 (then every rank falls in
        # the remainder buckets).
        q = f"(_nc div {n_tiles})"
        r = f"(_nc % {n_tiles})"
        big = f"({r} * ({q} + 1))"
        return F.expr(
            f"CAST(CASE WHEN {rn} <= {big}"
            f" THEN ({rn} - 1) div ({q} + 1) + 1"
            f" ELSE {r} + (({rn} - {big} - 1) div {q}) + 1"
            f" END AS BIGINT)"
        )

    scored = (
        ranked.crossJoin(F.broadcast(ncust))
        .withColumn("r_score", F.lit(n_tiles + 1) - _ntile("_rr"))
        .withColumn("f_score", _ntile("_rf"))
        .withColumn("m_score", _ntile("_rm"))
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.sum("m_cents").cast("bigint").alias("segment_cents"),
        )
        .orderBy("r_score", "f_score", "m_score")
    )


def loo_target_encode(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    id_col: str,
    m_smooth: int = 100,
    unit_scale: int = 100,
) -> DataFrame:
    """Leave-one-out target encoding with m-estimate smoothing — the
    standard high-cardinality categorical feature for tree/linear
    models, in its leakage-safe form: row i's encoding excludes its own
    target, ``enc_i = (Σ_cat − xᵢ + m·prior) / (n_cat − 1 + m)``, so a
    category's encoding never memorizes the row it describes (plain
    mean encoding leaks the label and inflates validation scores).

    Engine-exact: targets are exact integer units, the prior is the
    global mean as a floor division (non-negative), and the per-row
    encoding ships as ``enc_cents`` — one more non-negative integer
    division. No floats anywhere; consumers wanting a float divide by
    ``unit_scale`` downstream.

    Scale shape: one category-grain aggregate (map-side combinable) +
    one broadcast-eligible join back to the rows (category cardinality
    ≪ corpus by definition of the encoding); the global prior rides a
    1-row broadcast (documented benign BNLJ class). No windows — the
    LOO subtraction is pure arithmetic on the joined row.
    """
    cents = F.floor(F.col(target_col) * unit_scale).cast("bigint")
    rows = df.select(
        F.col(id_col), F.col(cat_col).alias("_cat"), cents.alias("_x")
    )
    per_cat = rows.groupBy("_cat").agg(
        F.count(F.lit(1)).cast("bigint").alias("_n"),
        F.sum(F.col("_x").cast("decimal(25,0)")).cast("bigint").alias("_s"),
    )
    prior = rows.agg(
        F.sum(F.col("_x").cast("decimal(25,0)")).cast("bigint").alias("_st"),
        F.count(F.lit(1)).cast("bigint").alias("_nt"),
    ).select(F.expr("_st div _nt").cast("bigint").alias("_gm"))
    return (
        rows.join(F.broadcast(per_cat), "_cat")
        .crossJoin(F.broadcast(prior))
        .select(
            id_col,
            F.col("_cat").alias(cat_col),
            F.col("_n").alias("n_cat"),
            F.expr(
                f"(_s - _x + {m_smooth} * _gm) div (_n - 1 + {m_smooth})"
            )
            .cast("bigint")
            .alias("enc_cents"),
        )
    )


def categorical_mi(
    df: DataFrame,
    x_col: Column | str,
    y_col: Column | str,
) -> DataFrame:
    """Mutual information between two categorical columns, in nats —
    the model-free feature-selection score (MI = 0 ⇔ independent; it
    catches non-monotone dependence Pearson misses entirely).

    ``MI = Σ_xy (c_xy/N)·ln(c_xy·N / (c_x·c_y))``. Engine-exact
    surface: each cell's log-ratio of exact integer PRODUCTS snaps to
    e6 (the psi/KL recipe), weights ``c_xy`` multiply in
    DECIMAL(38,0), and the exact integer total ``sum_terms_e6`` ships
    alongside one fixed double expression for the human-readable nats
    (negative cells make integer division unsafe — the sum stays a
    BIGINT, the divide happens once in double on both engines).

    Scale shape: ONE (x,y) count is the corpus-sized work (map-side
    combinable, |X|·|Y| cells out); marginals re-aggregate the cell
    frame itself (never the corpus) and join back cell-keyed;
    the total rides a 1-row broadcast. Output is one row.
    """
    cells = (
        df.select(
            F.col(x_col).alias("_x") if isinstance(x_col, str) else x_col.alias("_x"),
            F.col(y_col).alias("_y") if isinstance(y_col, str) else y_col.alias("_y"),
        )
        .groupBy("_x", "_y")
        .agg(F.count(F.lit(1)).cast("bigint").alias("_cxy"))
    )
    mx = cells.groupBy("_x").agg(F.sum("_cxy").cast("bigint").alias("_cx"))
    my = cells.groupBy("_y").agg(F.sum("_cxy").cast("bigint").alias("_cy"))
    tot = cells.agg(
        F.sum("_cxy").cast("bigint").alias("_n"),
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
    )
    ln_e6 = F.floor(
        F.log(
            (F.col("_cxy") * F.col("_n")).cast("double")
            / (F.col("_cx") * F.col("_cy")).cast("double")
        )
        * 1e6
        + F.lit(0.5)
    ).cast("decimal(19,0)")
    joined = (
        cells.join(mx, "_x")
        .join(my, "_y")
        .crossJoin(F.broadcast(tot))
    )
    agg = joined.agg(
        F.min("_n").alias("_n"),
        F.min("n_cells").alias("n_cells"),
        F.sum(F.col("_cxy").cast("decimal(19,0)") * ln_e6)
        .cast("decimal(38,0)")
        .cast("bigint")
        .alias("sum_terms_e6"),
    )
    return agg.select(
        F.col("_n").alias("n_rows"),
        "n_cells",
        "sum_terms_e6",
        F.round(
            F.col("sum_terms_e6").cast("double")
            / F.col("_n").cast("double")
            / F.lit(1e6),
            6,
        ).alias("mi_nats"),
    )


def gini_split(
    df: DataFrame,
    value_col: str,
    label: Column,
    unit_scale: int = 100,
) -> DataFrame:
    """Decision-stump split search: for every log2-bucket boundary of
    the feature, the class-weighted Gini impurity of the induced
    left/right partition — the single-feature importance primitive
    (the best row IS a depth-1 tree; the curve's shape shows where the
    feature separates the classes at all).

    Candidate thresholds are the proven engine-exact log2 buckets
    (``length(bin(units))`` — never libm ``log2``), bounding the
    candidate set at ≤64 regardless of corpus size. Per boundary, the
    cumulative (n, positives) pair comes from a window over the ≤64-row
    bucket frame; the weighted impurity
    ``(n_l − (p_l²+q_l²)/n_l + n_r − (p_r²+q_r²)/n_r) / N`` is ONE
    fixed double expression over exact BIGINTs, rounded to 6 — the
    spearman discipline.

    Scale shape: one ~64-bucket aggregate is the corpus-sized work
    (map-side combinable); windows and joins all live on the bucket
    frame. Output: one row per boundary with both children non-empty.
    """
    from pyspark.sql import Window

    units = F.floor(F.col(value_col) * unit_scale).cast("bigint")
    bucket = (
        F.when(units > 0, F.length(F.bin(units)))
        .otherwise(F.lit(0))
        .cast("bigint")
    )
    per = (
        df.select(
            bucket.alias("bucket"),
            F.when(label, 1).otherwise(0).cast("bigint").alias("_y"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("_n"),
            F.sum("_y").cast("bigint").alias("_p"),
        )
    )
    w = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = per.select(
        "bucket",
        F.sum("_n").over(w).cast("bigint").alias("n_left"),
        F.sum("_p").over(w).cast("bigint").alias("pos_left"),
    )
    tot = per.agg(
        F.sum("_n").cast("bigint").alias("_nt"),
        F.sum("_p").cast("bigint").alias("_pt"),
    )
    staged = (
        cum.crossJoin(F.broadcast(tot))
        .withColumn("n_right", (F.col("_nt") - F.col("n_left")).cast("bigint"))
        .withColumn(
            "pos_right", (F.col("_pt") - F.col("pos_left")).cast("bigint")
        )
        .filter(F.col("n_right") > 0)
    )
    nl, pl = F.col("n_left").cast("double"), F.col("pos_left").cast("double")
    nr, pr = F.col("n_right").cast("double"), F.col("pos_right").cast("double")
    ql, qr = nl - pl, nr - pr
    nt = F.col("_nt").cast("double")
    return staged.select(
        "bucket",
        "n_left",
        "pos_left",
        "n_right",
        "pos_right",
        F.round(
            (
                (nl - (pl * pl + ql * ql) / nl)
                + (nr - (pr * pr + qr * qr) / nr)
            )
            / nt,
            6,
        ).alias("gini_weighted"),
    ).orderBy("bucket")


def skyline_2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
    keep_cols: Sequence[str] = (),
) -> DataFrame:
    """Pareto skyline minimizing ``(x, y)`` — the multi-criteria
    shortlist query ("no part is both cheaper AND smaller"): keep every
    row not weakly dominated (another row ≤ on both axes, < on at
    least one). Identical duplicates survive together (neither strictly
    dominates).

    Two-dimensional skylines reduce to a sweep down the x axis tracking
    the running y-minimum, expressed relationally:

    1. per-x minimum of y — ONE data-sized hash aggregate (the real
       work; everything after runs on the distinct-x frame);
    2. the strict-prefix running minimum over the x-ordered per-x frame
       (ROWS UNBOUNDED PRECEDING .. 1 PRECEDING — each x appears once,
       so ROWS == strictly-cheaper RANGE);
    3. join back: a row is skyline iff ``y == min_y(its x)`` (no
       same-x dominator) AND ``y < prefix_min`` (no cheaper dominator).

    The step-2 window is unpartitioned by nature (the sweep is a total
    order over x) but runs on the DISTINCT-X grain, not the corpus —
    the allowlisted bounded-frame class. All comparisons are on the
    raw column values; no floats are derived, so engines agree
    trivially.

    Returns the skyline rows with ``keep_cols`` + the two axes.
    """
    g = df.groupBy(x_col).agg(F.min(y_col).alias("_ymin"))
    w = Window.orderBy(x_col).rowsBetween(
        Window.unboundedPreceding, -1
    )
    m = g.withColumn("_prevmin", F.min("_ymin").over(w))
    joined = df.join(m, x_col)
    return joined.filter(
        (F.col(y_col) == F.col("_ymin"))
        & (F.col("_prevmin").isNull() | (F.col(y_col) < F.col("_prevmin")))
    ).select(*keep_cols, x_col, y_col)


def conformal_interval(
    df: DataFrame,
    x_col: Column | str,
    y_col: Column | str,
    group_cols: Sequence[str],
    id_col: str = "id",
    alpha_permille: int = 100,
    scale: int = 4,
) -> DataFrame:
    """Split-conformal calibration over the per-group OLS fit: the
    (1−α) quantile of absolute residuals — the distribution-free
    interval half-width with finite-sample coverage (ŷ ± q̂ covers a
    fresh point with probability ≥ 1−α, no normality assumed). The
    modern answer to "how wrong is this regression, with a guarantee".

    Determinism: the OLS line comes from :func:`grouped_ols`
    (decimal-exact moments, coefficients rounded to 6); each
    ``|y − (a + b·x)|`` is a fixed double expression over exact-valued
    inputs (bit-identical both engines); the quantile is the explicit
    ``⌈(n+1)(1−α)⌉``-th ORDER STATISTIC under the total order
    ``(residual, id)`` — the conformal rank, never an interpolating
    percentile. Computed as ``((n+1)·(1000−α‰)) div 1000`` then capped
    at n — integer arithmetic both engines share.

    Scale shape: one moment aggregate (grouped_ols) + a broadcast join
    of the |groups|-row coefficient frame back to the rows, one
    group-partitioned rank window (the same shuffle shape as
    percentile gates). Output: one row per group.
    """
    from pyspark.sql import Window

    from data_pipeline_ine_spark.operators.features import grouped_ols

    xc = F.col(x_col) if isinstance(x_col, str) else x_col
    yc = F.col(y_col) if isinstance(y_col, str) else y_col
    groups = list(group_cols)
    rows = df.select(
        *groups, F.col(id_col), xc.alias("_x"), yc.alias("_y")
    )
    fit = grouped_ols(rows, "_x", "_y", groups, scale=scale).select(
        *groups, F.col("n").cast("bigint").alias("_n"), "slope", "intercept"
    )
    resid = rows.join(F.broadcast(fit), groups).select(
        *groups,
        id_col,
        "_n",
        F.abs(
            F.col("_y").cast("double")
            - (
                F.col("intercept")
                + F.col("slope") * F.col("_x").cast("double")
            )
        ).alias("_r"),
    )
    w = Window.partitionBy(*groups).orderBy("_r", id_col)
    k = F.expr(
        f"least(_n, ((_n + 1) * (1000 - {alpha_permille})) div 1000)"
    ).cast("bigint")
    ranked = resid.withColumn("_rk", F.row_number().over(w)).withColumn(
        "_k", k
    )
    return (
        ranked.filter(F.col("_rk") == F.col("_k"))
        .select(
            *groups,
            F.col("_n").alias("n_rows"),
            F.col("_k").alias("conformal_rank"),
            F.round(F.col("_r"), 6).alias("q_hat"),
        )
        .orderBy(*groups)
    )


def calendar_features(
    df: DataFrame,
    date_col: str,
) -> DataFrame:
    """Calendar feature expansion of a date column — the
    feature-engineering staple every temporal model starts from: one
    row per DISTINCT date with day-of-week (0=Sunday), day-of-month,
    ISO week, month, quarter, and an is_weekend flag. Emitted at date
    grain so the (tiny) feature table broadcast-joins back to any fact
    table instead of widening the corpus in place.

    Engine parity: ``dayofweek()-1`` == DuckDB ``dayofweek()``;
    ``weekofyear`` is ISO week in both engines; everything else is
    plain integer calendar math. All BIGINT.

    Scale shape: one distinct over the date grain (calendar-bounded
    output), then pure row-parallel projections — no joins, no
    windows.
    """
    d = F.col(date_col).cast("date")
    dow = (F.dayofweek("day") - 1).cast("bigint")
    return (
        df.select(d.alias("day"))
        .distinct()
        .select(
            "day",
            dow.alias("dow"),
            F.dayofmonth("day").cast("bigint").alias("dom"),
            F.weekofyear("day").cast("bigint").alias("iso_week"),
            F.month("day").cast("bigint").alias("month"),
            F.quarter("day").cast("bigint").alias("quarter"),
            F.when((dow == 0) | (dow == 6), 1)
            .otherwise(0)
            .cast("bigint")
            .alias("is_weekend"),
        )
        .orderBy("day")
    )


def robust_scale(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str],
    id_col: str = "id",
    unit_scale: int = 100,
) -> DataFrame:
    """Median/IQR robust scaling per group — the outlier-immune
    standardization (z-scores move when one flash-sale row drags the
    mean AND inflates the std; the median and quartiles shrug).

    Determinism: median and quartiles are explicit ORDER STATISTICS —
    ranks ``(n+1) div 2``, ``(n+1) div 4`` and ``(3(n+1)) div 4`` under
    the total order ``(value, id)`` (type-1 quantiles, never
    interpolating percentiles whose engine rules differ); the centered
    value ships as exact integer units and the scaled value as ONE
    fixed double divide (signed integer division is an engine trap —
    Spark truncates, DuckDB floors — so the ratio stays in doubles).
    Zero-IQR groups emit NULL scaled (the mad_outliers convention).

    Scale shape: one group-partitioned rank window (the percentile-
    gate shuffle shape), a 3-row-per-group order-statistic aggregate
    broadcast back, then row-parallel arithmetic.
    """
    from pyspark.sql import Window

    groups = list(group_cols)
    units = F.floor(F.col(value_col) * unit_scale).cast("bigint")
    rows = df.select(*groups, F.col(id_col), units.alias("_x"))
    w = Window.partitionBy(*groups).orderBy("_x", id_col)
    ranked = rows.withColumn("_rk", F.row_number().over(w)).withColumn(
        "_n", F.count(F.lit(1)).over(Window.partitionBy(*groups))
    )
    stats = (
        ranked.filter(
            (F.col("_rk") == F.expr("(_n + 1) div 2"))
            | (F.col("_rk") == F.expr("(_n + 1) div 4"))
            | (F.col("_rk") == F.expr("(3 * (_n + 1)) div 4"))
        )
        .groupBy(*groups)
        .agg(
            F.max(
                F.when(F.col("_rk") == F.expr("(_n + 1) div 2"), F.col("_x"))
            ).alias("_med"),
            F.max(
                F.when(F.col("_rk") == F.expr("(_n + 1) div 4"), F.col("_x"))
            ).alias("_q1"),
            F.max(
                F.when(
                    F.col("_rk") == F.expr("(3 * (_n + 1)) div 4"),
                    F.col("_x"),
                )
            ).alias("_q3"),
        )
    )
    return (
        rows.join(F.broadcast(stats), groups)
        .select(
            *groups,
            id_col,
            (F.col("_x") - F.col("_med")).cast("bigint").alias(
                "centered_units"
            ),
            (F.col("_q3") - F.col("_q1")).cast("bigint").alias("iqr_units"),
            F.when(
                F.col("_q3") > F.col("_q1"),
                F.round(
                    (F.col("_x") - F.col("_med")).cast("double")
                    / (F.col("_q3") - F.col("_q1")).cast("double"),
                    6,
                ),
            ).alias("scaled"),
        )
    )


def weighted_median(
    df: DataFrame,
    value_col: str,
    weight_col: str,
    group_cols: Sequence[str],
    unit_scale: int = 100,
) -> DataFrame:
    """Weight-aware median per group: the value at which cumulative
    WEIGHT first reaches half the total — the statistic inventory,
    pricing, and survey pipelines need where the row-median silently
    answers a different question (a 1-unit line and a 50-unit line are
    not the same evidence about a typical unit).

    Engine-exact: values and weights are exact integer units; the
    crossing point is the first row (under the total order
    ``(value, weight, …)``) whose running weight ``2·W_run ≥ W_total``
    — integer comparison only, the lower weighted median (never an
    interpolating average).

    Scale shape: the running weight is the DISTRIBUTED two-pass
    cumulative sum (``sampling.py::two_pass_cumsum`` — range-
    repartition on (group, value), per-partition partial sums prefix-
    summed into broadcast offsets), so a low-cardinality group never
    funnels its whole slice through one sort task; plus a
    |groups|-row totals broadcast. Output one row per group.
    """
    from data_pipeline_ine_spark.operators.sampling import (
        two_pass_cumsum,
    )

    groups = list(group_cols)
    vals = df.select(
        *groups,
        F.floor(F.col(value_col) * unit_scale).cast("bigint").alias("_v"),
        F.floor(F.col(weight_col) * unit_scale).cast("bigint").alias("_w"),
    )
    tot = vals.groupBy(*groups).agg(
        F.sum(F.col("_w").cast("decimal(25,0)")).cast("bigint").alias("_wt")
    )
    run = two_pass_cumsum(
        vals, groups, ["_v", "_w"], "_w", out_col="_wr"
    ).withColumn("_wr", F.col("_wr").cast("bigint"))
    crossed = (
        run.join(F.broadcast(tot), groups)
        .filter(2 * F.col("_wr") >= F.col("_wt"))
        .groupBy(*groups)
        .agg(
            F.min("_v").cast("bigint").alias("wmedian_units"),
            F.min("_wt").cast("bigint").alias("total_weight_units"),
        )
    )
    return crossed.orderBy(*groups)


def weighted_quantiles(
    df: DataFrame,
    value_col: str,
    weight_col: str,
    group_cols: Sequence[str],
    q_nums: Sequence[int] = (1, 2, 3),
    q_denom: int = 4,
    unit_scale: int = 100,
) -> DataFrame:
    """Weighted quantiles per group — ``weighted_median`` generalized
    to arbitrary cut points: the value where cumulative WEIGHT first
    reaches ``q/denom`` of the total, for each requested ``q`` (default
    the quartiles P25/P50/P75). The spread statistic weighted pipelines
    need beyond the median: a weighted IQR is P75 − P25.

    Engine-exact: integer units, the crossing test is
    ``denom·W_run ≥ q·W_total`` (integer comparison only, lower
    quantile, never interpolated) — all cut points come from ONE
    conditional-min aggregate over the same running-weight frame.

    Scale shape: one ``two_pass_cumsum`` (range-repartition + broadcast
    offsets — no single-task group sort) + a |groups|-row totals
    broadcast + one group aggregate; output one row per group.
    """
    from data_pipeline_ine_spark.operators.sampling import (
        two_pass_cumsum,
    )

    groups = list(group_cols)
    vals = df.select(
        *groups,
        F.floor(F.col(value_col) * unit_scale).cast("bigint").alias("_v"),
        F.floor(F.col(weight_col) * unit_scale).cast("bigint").alias("_w"),
    )
    tot = vals.groupBy(*groups).agg(
        F.sum(F.col("_w").cast("decimal(25,0)")).cast("bigint").alias("_wt")
    )
    run = two_pass_cumsum(
        vals, groups, ["_v", "_w"], "_w", out_col="_wr"
    ).withColumn("_wr", F.col("_wr").cast("bigint"))
    aggs = [
        F.min(
            F.when(
                q_denom * F.col("_wr") >= q * F.col("_wt"), F.col("_v")
            )
        )
        .cast("bigint")
        .alias(f"wq{q}_{q_denom}_units")
        for q in q_nums
    ]
    return (
        run.join(F.broadcast(tot), groups)
        .groupBy(*groups)
        .agg(*aggs, F.min("_wt").cast("bigint").alias("total_weight_units"))
        .orderBy(*groups)
    )


def rank_auc(
    df: DataFrame,
    score_col: Column | str,
    label: Column,
) -> DataFrame:
    """Exact ROC AUC of a score against a binary label via the
    Mann–Whitney rank identity — the threshold-free ranking metric
    every scoring model reports, computed without a single threshold
    sweep: ``AUC = (Σ_pos R − n_pos(n_pos+1)/2) / (n_pos·n_neg)`` over
    tie-AVERAGED ranks (ties get half credit, the standard convention).

    Engine-exact: tie-averaged ranks stay integral as the doubled
    ``2·rank + ties − 1`` surface (the spearman recipe), so the
    numerator ``Σ_pos R2 − n_pos·(n_pos+1)`` is an exact BIGINT over
    doubled units and AUC is ONE fixed double divide by
    ``2·n_pos·n_neg``. Output: one row (n_pos, n_neg, auc_num2, auc).

    Scale shape: rows pre-aggregate to the (score, n, n_pos) VALUE
    grain (one map-side-combinable aggregate), then the doubled
    tie-averaged rank is recovered per distinct score from the
    DISTRIBUTED two-pass cumulative count (``sampling.py::
    two_pass_cumsum``): for a score s with n_s rows and C_≤s rows at
    or below it, ``R2_s = 2·C_<s + n_s + 1 = 2·C_≤s − n_s + 1`` —
    identical to ``2·rank + ties − 1`` row-by-row, with no
    single-task corpus sort anywhere. Then a 1-row aggregate.
    """
    from data_pipeline_ine_spark.operators.sampling import (
        two_pass_cumsum,
    )

    sc = F.col(score_col) if isinstance(score_col, str) else score_col
    rows = df.select(
        sc.alias("_s"), F.when(label, 1).otherwise(0).alias("_y")
    )
    grain = rows.groupBy("_s").agg(
        F.count(F.lit(1)).cast("bigint").alias("_ns"),
        F.sum("_y").cast("bigint").alias("_ps"),
    )
    cum = two_pass_cumsum(grain, [], ["_s"], "_ns", out_col="_cle")
    scored = cum.withColumn(
        "_r2", (2 * F.col("_cle") - F.col("_ns") + 1).cast("bigint")
    )
    agg = scored.agg(
        F.sum("_ps").cast("bigint").alias("n_pos"),
        F.sum(F.col("_ns") - F.col("_ps")).cast("bigint").alias("n_neg"),
        F.sum(F.col("_ps") * F.col("_r2")).cast("bigint").alias("_sum_r2"),
    )
    return agg.select(
        "n_pos",
        "n_neg",
        (F.col("_sum_r2") - F.col("n_pos") * (F.col("n_pos") + 1))
        .cast("bigint")
        .alias("auc_num2"),
        F.round(
            (
                F.col("_sum_r2") - F.col("n_pos") * (F.col("n_pos") + 1)
            ).cast("double")
            / (2 * F.col("n_pos") * F.col("n_neg")).cast("double"),
            6,
        ).alias("auc"),
    )


def effective_sample_size(
    df: DataFrame,
    weight_col: str,
    group_cols: Sequence[str],
    unit_scale: int = 100,
) -> DataFrame:
    """Kish effective sample size per group: ``ESS = (Σw)² / Σw²`` —
    the importance-sampling diagnostic that says how many EQUAL-weight
    samples a weighted set is actually worth (ESS ≪ n means a few
    heavy weights dominate and every downstream estimate is noisier
    than its row count pretends — the first number to check after any
    weighted mixture or upsampling pass).

    Engine-exact: weights are integer units, Σw and Σw² accumulate in
    DECIMAL (order-invariant), and ESS is one fixed double expression
    over the two exact sums, rounded to 6. ``ess_ratio = ESS/n`` ships
    alongside (1.0 = perfectly balanced weights).

    Scale shape: ONE group aggregate, map-side combinable; output one
    row per group.
    """
    units = F.floor(F.col(weight_col) * unit_scale).cast("decimal(25,0)")
    agg = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(units).alias("_sw"),
        F.sum((units * units).cast("decimal(38,0)")).alias("_sww"),
    )
    ess = (
        F.col("_sw").cast("double") * F.col("_sw").cast("double")
    ) / F.col("_sww").cast("double")
    return agg.select(
        *group_cols,
        "n_rows",
        F.round(ess, 6).alias("ess"),
        F.round(ess / F.col("n_rows").cast("double"), 6).alias("ess_ratio"),
    ).orderBy(*group_cols)


def eta_squared(
    df: DataFrame,
    value_col: str,
    group_col: str,
    unit_scale: int = 100,
) -> DataFrame:
    """One-way ANOVA effect size η² = SS_between / SS_total — how much
    of a metric's variance the grouping explains, the first question
    of every segmentation ("does event type matter for value at
    all?"). η² ≈ 0 means the split is cosmetic; categorical_mi gives
    the dependence-of-distributions view, this the variance view.

    Engine-exact: per-group (n, Σx, Σx²) in DECIMAL; both sums of
    squares come from the closed forms ``SST·N = N·Σx² − (Σx)²`` and
    ``SSB·N = N·Σ(sᵢ²/nᵢ) − (Σx)²`` — the per-group ``sᵢ²/nᵢ`` term is
    the only division, done in doubles identically on both engines,
    then one fixed double ratio, rounded to 6. Output: one row with
    the group count and η².

    Scale shape: one group aggregate (map-side combinable) + a
    |groups|-row reduction. Nothing else.
    """
    units = F.floor(F.col(value_col) * unit_scale).cast("decimal(25,0)")
    per = df.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("_n"),
        F.sum(units).alias("_s"),
        F.sum((units * units).cast("decimal(38,0)")).alias("_q"),
    )
    agg = per.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.sum("_n").cast("bigint").alias("_nt"),
        F.sum("_s").cast("decimal(38,0)").alias("_st"),
        F.sum("_q").cast("decimal(38,0)").alias("_qt"),
        # each group's s²/n is ONE bit-identical double; FLOOR-snap it
        # to an exact integer before the cross-group sum (a plain double
        # SUM is partition-order-dependent — the unigram_logloss rule)
        F.sum(
            F.floor(
                F.col("_s").cast("double")
                * F.col("_s").cast("double")
                / F.col("_n").cast("double")
            ).cast("decimal(38,0)")
        ).cast("decimal(38,0)").alias("_sb"),
    )
    nt = F.col("_nt").cast("double")
    st = F.col("_st").cast("double")
    qt = F.col("_qt").cast("double")
    sb = F.col("_sb").cast("double")
    return agg.select(
        "n_groups",
        F.col("_nt").alias("n_rows"),
        F.round((sb - st * st / nt) / (qt - st * st / nt), 6).alias(
            "eta_squared"
        ),
    )

"""Deterministic sampling operators for training-data mixture control.

A large-scale pretraining pipeline rarely trains on the raw corpus: it
*samples* it — per-domain mixture weights ("20% of src0, 80% of src3"),
stratified per-source caps, and held-out slices all need sampling that is

- **deterministic**: re-running the job selects the same rows (no
  ``rand()``, which changes per task retry and breaks lineage re-compute);
- **engine-invariant**: an external auditor (here: the DuckDB oracle) can
  re-derive the exact sample from the key alone;
- **narrow**: selection is a map-side filter on a key hash — no shuffle,
  no global sort, no driver-side state, so it scales to any corpus size.

The primitive is ``hash_bucket``: md5 of the salted key folded to a
48-bit integer, modulo ``buckets``. md5 (not ``xxhash64``) so any SQL
engine reproduces it; the fold reuses the cross-engine recipe from
``operators.dedup._hex12_to_long``.

Reference parity note: the reference pipeline's only "sampling" is the
MAX_DATASETS head-slice test mode (``config.py:74-76``, SURVEY §2.5 O4);
these operators are the beyond-reference generalization of that knob to
corpus-scale mixture control.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import _hex12_to_long

DEFAULT_BUCKETS = 10_000


def hash_bucket(
    key: Column | str, buckets: int = DEFAULT_BUCKETS, salt: str = "mix:"
) -> Column:
    """Deterministic bucket in ``[0, buckets)`` from a row key.

    Uniform over keys (md5 avalanche), stable across engines, runs, and
    partitionings. Distinct ``salt`` values give independent bucketings,
    so a mixture filter and a held-out split can coexist without
    correlation.
    """
    c = F.col(key) if isinstance(key, str) else key
    h = _hex12_to_long(F.md5(F.concat(F.lit(salt), c.cast("string"))))
    return F.pmod(h, F.lit(buckets))


def weighted_mixture(
    df: DataFrame,
    rates: Mapping[str, float],
    key_col: str = "doc_id",
    strata_col: str = "source",
    default_rate: float = 1.0,
    buckets: int = DEFAULT_BUCKETS,
    salt: str = "mix:",
) -> DataFrame:
    """Keep each stratum at its configured rate: a row survives iff its
    hash bucket falls below ``rate * buckets``.

    Pure map-side filter — zero shuffles regardless of corpus size; the
    rate map rides along as a Catalyst ``CreateMap`` literal (config-sized,
    never a join).
    """
    pairs: list[Column] = []
    for stratum, rate in sorted(rates.items()):
        pairs.extend([F.lit(stratum), F.lit(int(round(rate * buckets)))])
    threshold = F.coalesce(
        F.element_at(F.create_map(*pairs), F.col(strata_col)),
        F.lit(int(round(default_rate * buckets))),
    )
    return df.filter(hash_bucket(key_col, buckets, salt) < threshold)


def temperature_mixture(
    df: DataFrame,
    token_col: str,
    alpha: float = 0.5,
    key_col: str = "doc_id",
    strata_col: str = "source",
    buckets: int = DEFAULT_BUCKETS,
    salt: str = "temp:",
) -> DataFrame:
    """Temperature-flattened mixture sampling — the α-sampling knob
    multilingual/multi-domain training mixes actually use (sampling
    mass ∝ m_i^α): each source keeps rate ``(m_min / m_i)^(1-α)`` of
    its rows, so the smallest source keeps 100% and bigger sources are
    downweighted toward uniform as α → 0 (α = 1 keeps everything —
    proportional sampling). Unlike ``weighted_mixture`` the rates are
    DERIVED from the measured per-source token masses, not configured.

    Engine-exact at α = 0.5: the rate is ``sqrt(m_min / m_i)`` — an
    exact-integer division to double followed by a correctly-rounded
    IEEE sqrt, so every engine computes the identical threshold
    ``floor(rate · buckets)``. Other α go through ``pow`` (libm —
    reproducible on one platform, not bit-pinned across engines).

    Scale shape: pass 1 is one map-side-combinable (source, sum)
    aggregate pulled to the driver as O(|sources|) scalars; pass 2 is
    the pure map-side hash filter with the thresholds riding as a
    CreateMap literal. Returns the kept rows with a ``rate_bp``
    column (the applied threshold in bucket units) for audit. A source
    with zero/NULL token mass contributes nothing to the mix (its rows
    are dropped — there is no mass to sample).
    """
    import math

    masses = [
        r
        for r in df.groupBy(strata_col)
        .agg(F.sum(F.col(token_col).cast("bigint")).alias("_m"))
        .collect()  # O(|sources|) scalars — config-sized, never data
        # a zero/NULL-mass source has nothing to sample and would
        # poison m_min (rate 0^x for every other source)
        if r["_m"]
    ]
    if not masses:
        raise ValueError(
            f"temperature_mixture: no source has positive {token_col} mass"
        )
    m_min = min(r["_m"] for r in masses)

    def rate(m: int) -> float:
        if alpha == 0.5:
            return math.sqrt(m_min / m)
        return (m_min / m) ** (1.0 - alpha)

    pairs: list[Column] = []
    for r in sorted(masses, key=lambda r: r[strata_col]):
        pairs.extend(
            [
                F.lit(r[strata_col]),
                F.lit(int(math.floor(rate(r["_m"]) * buckets))),
            ]
        )
    threshold = F.element_at(F.create_map(*pairs), F.col(strata_col))
    return df.withColumn("rate_bp", threshold.cast("bigint")).filter(
        hash_bucket(key_col, buckets, salt) < F.col("rate_bp")
    )


def split_assign(
    df: DataFrame,
    key_col: str = "doc_id",
    splits: Mapping[str, int] | None = None,
    salt: str = "split:",
    out_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: ``out_col`` holds the split
    name chosen by the row's hash bucket in ``[0, 100)``.

    ``splits`` maps split name → percent (must sum to 100; default
    80/10/10 train/val/test). Mapping order is the bucket layout: the first
    entry owns buckets ``[0, pct)``, the next the following range, and so
    on — so the assignment is fully specified by the config, and an external
    auditor can re-derive it from the key alone. A narrow map-side
    expression: the same row lands in the same split on every run, every
    engine, every partitioning.
    """
    if splits is None:
        splits = {"train": 80, "val": 10, "test": 10}
    if sum(splits.values()) != 100:
        raise ValueError(f"split percents must sum to 100: {splits}")
    bucket = hash_bucket(key_col, 100, salt)
    expr: Column | None = None
    upper = 0
    for name, pct in splits.items():
        upper += pct
        expr = (
            F.when(bucket < upper, F.lit(name))
            if expr is None
            else expr.when(bucket < upper, F.lit(name))
        )
    return df.withColumn(out_col, expr)


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    key_col: str = "doc_id",
    salt: str = "wsample:",
    out_col: str = "priority",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement: keep the ``k``
    rows with smallest priority ``-ln(u) / w`` (Efraimidis–Spirakis
    exponential keys — inclusion probability proportional to weight, no
    replacement bookkeeping).

    The uniform ``u`` is not ``rand()`` but ``(hash48(key) + 0.5) / 2^48``
    — the same md5 fold as every sampler here, so the draw is reproducible
    across runs, engines, and retries. One-pass, no shuffle of the corpus:
    global smallest-k compiles to per-partition top-k + a k-row driver
    merge (``TakeOrderedAndProject``), never a full sort.

    Rows with NULL or non-positive weight are excluded (they'd have
    undefined priority; make zero-weight semantics explicit upstream).
    """
    w = F.col(weight_col).cast("double")
    u = (
        _hex12_to_long(
            F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string")))
        ).cast("double")
        + 0.5
    ) / float(1 << 48)
    return (
        df.filter(w > 0)
        .withColumn(out_col, -F.log(u) / w)
        .orderBy(out_col)
        .limit(k)
    )


def stratified_sample(
    df: DataFrame,
    k: int,
    key_col: str = "doc_id",
    strata_col: str = "source",
    shards: int = 64,
    salt: str = "strat:",
) -> DataFrame:
    """Exactly-``k``-per-stratum deterministic sample, ranked by key hash.

    Two-level tournament so a low-cardinality ``strata_col`` never funnels
    a whole stratum through one sorting task: rank within
    ``(stratum, shard)`` first and keep ≤ k per shard, then rank the
    ≤ ``shards·k`` survivors per stratum. The second window sees bounded
    rows per stratum, so both shuffles stay skew-safe at any corpus size.

    Adds ``sample_rank`` (1..k within stratum). Ordering key is the md5
    hex string (uniform, engine-sortable), key value as tie-break.
    """
    hex_key = F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string")))
    shard = F.pmod(_hex12_to_long(hex_key), F.lit(shards))
    staged = df.withColumn("_hex", hex_key).withColumn("_shard", shard)
    pre = Window.partitionBy(strata_col, "_shard").orderBy("_hex", key_col)
    post = Window.partitionBy(strata_col).orderBy("_hex", key_col)
    return (
        staged.withColumn("_r1", F.row_number().over(pre))
        .filter(F.col("_r1") <= k)
        .withColumn("sample_rank", F.row_number().over(post))
        .filter(F.col("sample_rank") <= k)
        .drop("_hex", "_shard", "_r1")
    )


def upsample_mixture(
    df: DataFrame,
    multipliers: Mapping[str, float],
    key_col: str = "doc_id",
    strata_col: str = "source",
    default_multiplier: float = 1.0,
    buckets: int = DEFAULT_BUCKETS,
    salt: str = "epoch:",
    out_col: str = "copy_idx",
) -> DataFrame:
    """Repeat-upsampling by per-stratum epoch multipliers — the other half
    of mixture control: :func:`weighted_mixture` downweights (rate < 1),
    this op upweights (multiplier ≥ 0, fractional allowed). A multiplier
    of 2.5 emits every row twice and a deterministic hash-chosen half of
    rows a third time, so the expected stratum size is exactly 2.5× and
    the realized sample is reproducible row-for-row (the standard
    "epochs per domain" knob of LLM pre-training data recipes).

    All arithmetic is integer: multipliers are snapped to
    ``round(m · buckets)`` bucket units, whole copies are
    ``mtb div buckets``, and the extra copy fires iff the row's hash
    bucket falls below ``mtb mod buckets`` — engine-exact, map-side,
    zero shuffles. Output repeats input rows with ``out_col`` = 1..n
    (rows with 0 copies disappear), so downstream shuffles (e.g. the
    :func:`deterministic_shuffle` rank) see distinct physical rows.
    """
    pairs: list[Column] = []
    for stratum, mult in sorted(multipliers.items()):
        if mult < 0:
            raise ValueError(f"negative multiplier for {stratum!r}: {mult}")
        pairs.extend([F.lit(stratum), F.lit(int(round(mult * buckets)))])
    mtb = F.coalesce(
        F.element_at(F.create_map(*pairs), F.col(strata_col)),
        F.lit(int(round(default_multiplier * buckets))),
    )
    extra = (hash_bucket(key_col, buckets, salt) < F.pmod(mtb, F.lit(buckets))).cast(
        "int"
    )
    copies = (mtb / buckets).cast("long") + extra
    return (
        df.withColumn("_copies", copies)
        .filter(F.col("_copies") > 0)
        .withColumn(out_col, F.explode(F.sequence(F.lit(1), F.col("_copies"))))
        .drop("_copies")
    )


def deterministic_shuffle(
    df: DataFrame,
    key_col: str = "doc_id",
    salt: str = "shuffle:",
    out_col: str = "shuffle_rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Global pseudorandom permutation rank (1..N) — the training-order
    shuffle every pretraining pipeline runs before sharding, made
    deterministic and scale-safe.

    The order key is the md5 fold of the salted row key (uniform,
    reproducible; ``rand()`` would re-draw on task retry), tie-broken by
    the key itself so the permutation is total. The rank is NOT a global
    ``row_number`` window — that moves the corpus to one task. Instead,
    the classic two-pass distributed rank:

    1. range-repartition + sort by the hash (Spark samples boundaries;
       whatever boundaries it picks, ordered ranges make step 3 exact),
    2. count rows per sorted partition — a partition-count-sized frame —
       and prefix-sum it into per-partition rank offsets,
    3. broadcast offsets back and add each row's within-partition
       row_number.

    Every heavy stage is corpus-partition-parallel; the only single-task
    work is the prefix sum over ~thousands of partition counts.
    """
    h = hash_bucket(key_col, 1 << 48, salt).alias("_h")
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    # localCheckpoint: the counts branch and the rank branch must see the
    # IDENTICAL range partitioning — recomputing the plan could re-sample
    # different boundaries and misalign offsets with local row numbers
    ranged = (
        df.withColumn("_h", h)
        .repartitionByRange(n, "_h", key_col)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    counts = ranged.groupBy("_pid").agg(F.count(F.lit(1)).alias("_n"))
    offsets = counts.select(
        "_pid",
        (
            F.sum("_n").over(
                Window.orderBy("_pid").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            )
        ).alias("_off"),
    ).fillna(0, subset=["_off"])
    local = Window.partitionBy("_pid").orderBy("_h", key_col)
    return (
        ranged.withColumn("_lr", F.row_number().over(local))
        .join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, (F.col("_off") + F.col("_lr")).cast("long"))
        .drop("_h", "_pid", "_lr", "_off")
    )


# Poisson(1) cumulative thresholds scaled to the 48-bit hash domain,
# precomputed once and pinned as integer literals so the Spark plan and
# any SQL oracle draw the IDENTICAL weights. Weights cap at 8
# (P ~ 1e-6 per draw): the truncation bias is statistically invisible
# and the cap makes the CASE ladder finite on both engines.
POISSON1_CUM_48 = [
    103548857136060,   # P(X <= 0)
    207097714272121,   # P(X <= 1)
    258872142840152,
    276130285696162,
    280444821410164,
    281307728552965,
    281451546410098,
    281472091818260,   # P(X <= 7)
]


def poisson_bootstrap(
    df: DataFrame,
    value_col: str,
    group_col: str,
    id_col: str = "o_orderkey",
    n_replicates: int = 32,
    salt: str = "boot:",
) -> DataFrame:
    """Distributed Poisson bootstrap of a grouped sum — confidence
    intervals for any per-group total WITHOUT distributional
    assumptions and WITHOUT resampling shuffles: resample-with-
    replacement is approximated per row by an independent Poisson(1)
    count per (row, replicate), the standard streaming/parallel
    bootstrap (each row's inclusion count is independent, so no global
    coordination).

    Determinism AND hash budget: ONE md5 per row (not per replicate —
    measured 6x wall-clock), split into two independent 48-bit halves
    ``(ha, hb)``; replicate ``b`` draws ``(ha + b·hb) mod 2^48`` — the
    same Carter-Wegman pairwise-independent family the minhash
    signatures use, which is the independence grade bootstrap variance
    needs. The draw ladders through pinned integer thresholds
    (``POISSON1_CUM_48``) — reproducible across engines, runs,
    retries, partitionings.

    Output: the FULL replicate distribution ``(group, replicate,
    boot_sum)`` in exact DECIMAL — B·|groups| rows; consumers read any
    CI off it (the 2.5%/97.5% replicate quantiles) without this
    operator baking in an interpolation rule.

    Scale shape: one narrow B-way explode (the cost knob — B times the
    scan, all map-side) into a (group, replicate) aggregate whose
    partial combine collapses each task to |groups|·B rows before the
    only shuffle. No row ever moves uncombined.
    """
    b = F.explode(
        F.sequence(F.lit(0), F.lit(n_replicates - 1))
    ).alias("replicate")
    md5 = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    ha = F.conv(F.substring(md5, 1, 12), 16, 10).cast("bigint")
    hb = F.conv(F.substring(md5, 13, 12), 16, 10).cast("bigint")
    return (
        df.select(
            group_col,
            F.col(value_col).cast("decimal(18,2)").alias("_v"),
            ha.alias("_ha"),
            hb.alias("_hb"),
        )
        .select(group_col, "_v", "_ha", "_hb", b)
        .select(
            group_col,
            "replicate",
            (
                _ladder(
                    F.pmod(
                        F.col("_ha") + F.col("replicate") * F.col("_hb"),
                        F.lit(1 << 48),
                    )
                )
                * F.col("_v")
            ).alias("_wv"),
        )
        .groupBy(group_col, "replicate")
        .agg(F.sum("_wv").cast("decimal(18,2)").alias("boot_sum"))
    )


def _ladder(h: Column) -> Column:
    """Poisson(1) weight from a uniform 48-bit draw via the pinned
    cumulative thresholds."""
    w = F.lit(8)
    for k in reversed(range(len(POISSON1_CUM_48))):
        w = F.when(h < POISSON1_CUM_48[k], k).otherwise(w)
    return w


def two_pass_rank(
    df: DataFrame,
    order_cols: list[str],
    out_col: str = "rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Global dense 1..N rank by ``order_cols`` (which must totally
    order the rows — append a unique tiebreaker) WITHOUT a one-task
    global window: the same three-step distributed rank as
    ``deterministic_shuffle``, generalized to caller-supplied order
    columns — range-repartition + sort, per-partition counts prefix-
    summed into offsets, local row_number + broadcast offset add. The
    only single-task work is the prefix sum over ~thousands of
    partition counts.
    """
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    cols = [F.col(c) for c in order_cols]
    # localCheckpoint: counts branch and rank branch must see the SAME
    # sampled range boundaries (see deterministic_shuffle). Lazy (r12):
    # the checkpoint RDD — and with it the range sampler's boundaries —
    # is still created HERE (toRdd at call time), so both branches
    # share one fixed partitioning either way; eager=False just folds
    # the materialization into the first consuming job instead of
    # running a separate pass.
    ranged = (
        df.repartitionByRange(n, *cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    counts = ranged.groupBy("_pid").agg(F.count(F.lit(1)).alias("_n"))
    offsets = counts.select(
        "_pid",
        (
            F.sum("_n").over(
                Window.orderBy("_pid").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            )
        ).alias("_off"),
    ).fillna(0, subset=["_off"])
    local = Window.partitionBy("_pid").orderBy(*cols)
    return (
        ranged.withColumn("_lr", F.row_number().over(local))
        .join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, (F.col("_off") + F.col("_lr")).cast("long"))
        .drop("_pid", "_lr", "_off")
    )


def two_pass_cumsum(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[str],
    value_col: str,
    out_col: str = "cumsum",
    num_partitions: int | None = None,
    op: str = "sum",
) -> DataFrame:
    """Running ``SUM(value_col)`` (or ``MAX`` with ``op="max"`` — any
    other associative measure follows the same recipe) per group under
    ``order_cols``
    WITHOUT a data-sized single-task sort: ``two_pass_rank``'s
    three-step shape generalized from row counting to an arbitrary
    additive measure — range-repartition on (group, order), per-
    (group, partition) partial sums prefix-summed into offsets on a
    |groups|·|partitions|-row frame, then a partition-local running
    sum plus the broadcast offset. Equal keys land in one range
    partition, so tie rows stay co-located and the crossing-point
    semantics (weighted median, cumulative rank counts) match the
    single-window form exactly.

    ``group_cols`` may be empty (global running sum); the offsets
    prefix then orders the partition-count frame by ``_pid`` — the
    only partition-keyless window, over ~|partitions| rows. The output
    sum keeps ``value_col``'s aggregate type (LONG for integer units;
    pre-cast to DECIMAL for >2^63 totals).
    """
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    agg_fn = F.max if op == "max" else F.sum
    groups = list(group_cols)
    keys = [F.col(c) for c in [*groups, *order_cols]]
    # localCheckpoint: offsets branch and running branch must see the
    # SAME sampled range boundaries (see deterministic_shuffle) — the
    # checkpoint RDD and its boundaries are fixed at call time; lazy
    # materialization folds into the first consuming job (r12, see
    # two_pass_rank)
    ranged = (
        df.repartitionByRange(n, *keys)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    part_sums = ranged.groupBy(*groups, "_pid").agg(
        agg_fn(value_col).alias("_ps")
    )
    off_w = Window.partitionBy(*groups).orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = part_sums.select(
        *groups, "_pid", agg_fn("_ps").over(off_w).alias("_off")
    )
    local = Window.partitionBy(*groups, "_pid").orderBy(
        *order_cols
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    combined = (
        # greatest skips NULL, so the first range partition (empty
        # prefix, _off NULL) falls back to the local running max
        F.greatest(F.col("_off"), F.col("_lc"))
        if op == "max"
        # window SUM skips NULLs and is NULL only when the WHOLE prefix
        # is NULL: _off+_lc when both sides exist, else whichever side
        # does (a row whose local prefix is all-NULL must still see the
        # prior partitions' sum), else NULL
        else F.coalesce(
            F.col("_off") + F.col("_lc"), F.col("_off"), F.col("_lc")
        )
    )
    return (
        ranged.withColumn("_lc", agg_fn(value_col).over(local))
        .join(F.broadcast(offsets), [*groups, "_pid"])
        .withColumn(out_col, combined)
        .drop("_pid", "_lc", "_off")
    )


def token_budget_cap(
    df: DataFrame,
    budget_tokens: int,
    token_col: str,
    source_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "budget:",
) -> DataFrame:
    """Per-source token-budget enforcement — the mixture knob stated
    the way training plans actually state it ("at most N tokens of
    src7"), where ``domain_mixture``'s rate filter can only promise a
    FRACTION: keep each source's greedy prefix of the deterministic
    shuffle order until the budget is hit.

    Deterministic and engine-invariant: the order key is the md5 fold
    of the salted row key (the ``deterministic_shuffle`` recipe —
    uniform, reproducible on any engine/partitioning/rerun), the
    running token total is the DISTRIBUTED two-pass cumulative sum
    (never a single-task per-source sort), and the keep test is the
    integer ``cum_tokens ≤ budget``. Re-running with a bigger budget
    yields a SUPERSET (prefix property) — exactly what incremental
    data-mix scaling wants.

    Output: kept rows ``(source, key, tokens, cum_tokens)``.
    """
    h = hash_bucket(key_col, 1 << 48, salt).alias("_h")
    rows = df.select(
        F.col(source_col),
        F.col(key_col),
        F.col(token_col).cast("bigint").alias("tokens"),
        h,
    )
    run = two_pass_cumsum(
        rows, [source_col], ["_h", key_col], "tokens", out_col="cum_tokens"
    )
    return (
        run.filter(F.col("cum_tokens") <= budget_tokens)
        .select(
            source_col,
            key_col,
            "tokens",
            F.col("cum_tokens").cast("bigint").alias("cum_tokens"),
        )
    )


def curriculum_order(
    df: DataFrame,
    score_col: str,
    id_col: str = "doc_id",
    n_tiers: int = 4,
) -> DataFrame:
    """Curriculum-learning training order (Bengio et al. 2009 reduced
    to its deterministic scheduling core): rank rows easiest-first by
    ``score_col`` (an INTEGER difficulty proxy — higher = easier, e.g.
    a fixed-point quality score), cut the ranking into ``n_tiers``
    equal-count difficulty tiers, and emit the interleaved curriculum
    key that round-robins one row per tier — the anti-forgetting
    schedule that mixes a hard example into every easy stretch instead
    of front-loading all easy data.

    All integer arithmetic: global rank via the distributed two-pass
    rank (bit-identical to a single window, never a one-task sort),
    ``tier = ((rank−1)·T) div n``, within-tier position
    ``rank − ceil(tier·n/T)``, and
    ``curriculum_key = (tier_pos−1)·T + tier`` — a strict total order
    whenever tiers are equal-sized, a valid (gapped) order otherwise.

    Returns ``(id_col, score_col, tier, tier_pos, curriculum_key)``.

    Scale shape: one range-repartition (the rank) + a 1-row count
    broadcast; nothing corpus-sized funnels through one task, no
    driver-side collect.
    """
    neg = (-F.col(score_col)).alias("_negs")
    # lazy checkpoint: the count branch would otherwise re-run the
    # caller's scoring lineage (e.g. quality_score's regexp passes)
    # just to produce a 1-row broadcast
    base = df.select(id_col, score_col, neg).localCheckpoint(eager=False)
    n = base.agg(F.count(F.lit(1)).alias("_n"))
    ranked = two_pass_rank(base, ["_negs", id_col], out_col="_rk")
    t = int(n_tiers)
    return (
        ranked.crossJoin(F.broadcast(n))
        .withColumn("tier", F.expr(f"((_rk - 1) * {t}) div _n").cast("int"))
        .withColumn(
            "tier_pos",
            (
                F.col("_rk")
                - F.expr(f"(tier * _n + {t} - 1) div {t}")
            ).cast("long"),
        )
        .withColumn(
            "curriculum_key",
            ((F.col("tier_pos") - 1) * t + F.col("tier")).cast("long"),
        )
        .select(id_col, score_col, "tier", "tier_pos", "curriculum_key")
    )


def shard_manifest(
    df: DataFrame,
    docs_per_shard: int,
    key_col: str = "doc_id",
    size_col: str | None = None,
    salt: str = "shuffle:",
) -> DataFrame:
    """Training-data shard manifest — the write-side final step of a
    corpus pipeline: docs in deterministic-shuffle order are cut into
    fixed-size shards and each shard reports ``(shard, n_docs,
    min_rank, max_rank[, size_sum])`` — exactly what a dataloader needs
    to plan epochs, resume mid-run, and verify completeness
    (contiguous ranks, uniform sizes).

    Shard id is ``(rank − 1) div docs_per_shard`` over
    ``deterministic_shuffle``'s global permutation: reproducible across
    runs/engines/partitionings, and every shard except the last has
    exactly ``docs_per_shard`` docs by construction. One shard-keyed
    aggregate on top of the two-pass rank; output is |shards| rows.
    """
    ranked = deterministic_shuffle(df, key_col=key_col, salt=salt)
    shard = F.expr(f"CAST((shuffle_rank - 1) div {docs_per_shard} AS BIGINT)")
    aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.min("shuffle_rank").alias("min_rank"),
        F.max("shuffle_rank").alias("max_rank"),
    ]
    if size_col is not None:
        aggs.append(F.sum(size_col).cast("bigint").alias("size_sum"))
    return ranked.withColumn("shard", shard).groupBy("shard").agg(*aggs)


def bootstrap_ci(
    replicates: DataFrame,
    group_col: str,
    value_col: str = "boot_sum",
    trim: int = 1,
) -> DataFrame:
    """Percentile-method confidence interval off a bootstrap replicate
    table (``poisson_bootstrap``'s output): per group, the
    ``trim+1``-th smallest and largest replicate sums — with B=32 and
    trim=1 that is the ~[3%, 97%] envelope — as ORDER STATISTICS of
    exact values, no quantile interpolation rule to disagree on
    between engines.

    Scale shape: the input is |groups|·B rows (tiny by construction);
    one group-partitioned rank window each way + a group aggregate.
    """
    w_lo = Window.partitionBy(group_col).orderBy(F.col(value_col).asc())
    w_hi = Window.partitionBy(group_col).orderBy(F.col(value_col).desc())
    ranked = replicates.select(
        group_col,
        value_col,
        F.row_number().over(w_lo).alias("_rlo"),
        F.row_number().over(w_hi).alias("_rhi"),
    )
    return ranked.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_replicates"),
        F.max(
            F.when(F.col("_rlo") == trim + 1, F.col(value_col))
        ).alias("ci_lo"),
        F.max(
            F.when(F.col("_rhi") == trim + 1, F.col(value_col))
        ).alias("ci_hi"),
    )


def negative_samples(
    positives: DataFrame,
    catalog: DataFrame,
    basket_col: str,
    item_col: str,
    catalog_key: str,
    k: int = 2,
    salt: str = "neg:",
) -> DataFrame:
    """Deterministic negative sampling for training pairs: for every
    observed (basket, item) positive, ``k`` pseudo-random items from
    the catalog that the basket does NOT contain — the contrastive
    counterexamples every two-tower/matrix-factorization recipe needs,
    with no RNG state (the hash-coin discipline: same inputs ⇒ same
    negatives on any engine, any partitioning, any rerun).

    Draw ``j`` for a positive is ``md5(salt‖j‖basket‖item) mod |catalog|``
    mapped through the catalog's rank index; accidental positives are
    removed by an anti-join, so a pair yields ≤ k negatives (document
    the deficit rather than resampling — a resample loop would make
    output depend on collision order). All integer/string surfaces.

    Scale shape: the catalog rank index is one dimension-sized window;
    draws are a generator explode (k per positive, no join); the rank
    lookup is a broadcast-eligible equi-join on the dimension; the
    anti-join shuffles on the (basket, item) key the positives already
    have. Output ≤ k·|positives|.
    """
    from pyspark.sql import Window

    ranked = catalog.select(
        F.col(catalog_key).alias("_neg_item")
    ).distinct().withColumn(
        "_rn",
        F.row_number().over(Window.orderBy("_neg_item")) - 1,
    )
    n_items = ranked.count()  # dimension-sized driver scalar (benign)
    pos = positives.select(
        F.col(basket_col).alias("basket"), F.col(item_col).alias("item")
    ).distinct()
    draws = pos.select(
        "basket",
        "item",
        F.explode(F.array(*[F.lit(j) for j in range(k)])).alias("draw"),
    ).withColumn(
        "_rn",
        F.pmod(
            _hex12_to_long(
                F.md5(
                    F.concat(
                        F.lit(salt),
                        F.col("draw").cast("string"),
                        F.lit(":"),
                        F.col("basket").cast("string"),
                        F.lit(":"),
                        F.col("item").cast("string"),
                    )
                )
            ),
            F.lit(n_items),
        ).cast("bigint"),
    )
    cand = draws.join(F.broadcast(ranked), "_rn").select(
        "basket", "item", F.col("draw").cast("bigint").alias("draw"),
        "_neg_item",
    )
    return cand.join(
        pos.select(
            F.col("basket"), F.col("item").alias("_neg_item")
        ),
        ["basket", "_neg_item"],
        "left_anti",
    ).select(
        F.col("basket"),
        F.col("item"),
        "draw",
        F.col("_neg_item").alias("neg_item"),
    )


def rendezvous_shards(
    df: DataFrame,
    key_col: str,
    n_shards: int = 8,
    salt: str = "hrw:",
) -> DataFrame:
    """Rendezvous (highest-random-weight) shard assignment: a key's
    shard is the argmax of ``hash(salt‖shard‖key)`` over the shard
    list — the routing scheme whose selling point over ``key mod n``
    is minimal disruption: adding a shard moves only ~1/(n+1) of keys
    (mod-n reshuffles almost everything). The standard assignment for
    cache rings, shard routers, and sticky consumer groups.

    Engine-exact: weights are the proven md5→hex12→BIGINT fold;
    argmax is an integer ``array_position(max)`` with the LOWEST shard
    index winning hash ties (measure-zero at 48 bits, pinned anyway).
    Returns one row per key: ``(key, shard)``.

    Scale shape: a pure row-parallel projection — n_shards md5s per
    key, no shuffle, no state; consistent across engines, runs, and
    partitionings by construction.
    """
    key = F.col(key_col).cast("string")
    weights = F.array(
        *[
            _hex12_to_long(
                F.md5(F.concat(F.lit(f"{salt}{s}:"), key))
            )
            for s in range(n_shards)
        ]
    )
    from data_pipeline_ine_spark.functions.scalars import let_

    shard = let_(
        weights,
        lambda w: (F.array_position(w, F.array_max(w)) - 1).cast("bigint"),
    )
    return df.select(F.col(key_col), shard.alias("shard"))

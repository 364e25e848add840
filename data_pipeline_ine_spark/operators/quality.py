"""Data-quality expectation checks — the audit pass every production
pipeline runs between landing and publishing (null budgets, key
uniqueness, referential integrity, domain constraints).

The reference validates implicitly (drop-if-missing, coerce-if-numeric;
``steps/step3_remove_columns.py``, ``steps/step6_upload_to_db.py:55-74``)
and loses the evidence. Here every expectation emits an auditable row
``(check, n_violations, n_rows, violation_rate)`` so a run can be gated
on thresholds and the report persisted next to the data.

Scale shape:
- ``expect``-style predicate checks fuse into ONE conditional aggregate —
  a single scan of the table produces every per-row check's counts, no
  per-check passes.
- Key uniqueness is one keyed aggregate (count>1 groups), the same
  shuffle any dedup pays.
- Referential integrity is a LEFT ANTI join probing the parent keys —
  broadcast while the parent's distinct key set fits, shuffle-join
  beyond; either way orphan counting never materializes the join result.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _audit_row(check: Column, violations: Column, total: Column) -> list[Column]:
    return [
        check.alias("check"),
        violations.cast("bigint").alias("n_violations"),
        total.cast("bigint").alias("n_rows"),
        F.round(violations / F.greatest(total, F.lit(1)), 6).alias(
            "violation_rate"
        ),
    ]


def expect_rows(df: DataFrame, checks: Mapping[str, Column]) -> DataFrame:
    """Evaluate named per-row expectations in ONE pass: each value is a
    boolean Column that is true when the row VIOLATES the expectation.
    Returns one audit row per check."""
    agg = df.agg(
        F.count(F.lit(1)).alias("_n"),
        *[
            F.count(F.when(cond, 1)).alias(f"_v{i}")
            for i, cond in enumerate(checks.values())
        ],
    )
    stack = []
    for i, name in enumerate(checks):
        stack.append(
            F.struct(
                *_audit_row(F.lit(name), F.col(f"_v{i}"), F.col("_n"))
            )
        )
    return agg.select(F.explode(F.array(*stack)).alias("r")).select("r.*")


def expect_unique(df: DataFrame, key_cols: list[str], name: str) -> DataFrame:
    """Key-uniqueness audit: a violation is every row beyond the first in
    a duplicated key group (so 0 violations == the key is unique)."""
    per_key = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("_c"))
    agg = per_key.agg(
        F.sum("_c").alias("_n"),
        F.sum(F.col("_c") - 1).alias("_v"),
    )
    return agg.select(*_audit_row(F.lit(name), F.col("_v"), F.col("_n")))


def expect_references(
    child: DataFrame,
    child_key: str,
    parent: DataFrame,
    parent_key: str,
    name: str,
) -> DataFrame:
    """Referential-integrity audit: child rows whose key has no parent
    (orphans). LEFT ANTI join against the parent's distinct keys."""
    orphans = child.join(
        parent.select(F.col(parent_key).alias(child_key)).distinct(),
        child_key,
        "left_anti",
    )
    n = child.agg(F.count(F.lit(1)).alias("_n"))
    v = orphans.agg(F.count(F.lit(1)).alias("_v"))
    return n.crossJoin(v).select(
        *_audit_row(F.lit(name), F.col("_v"), F.col("_n"))
    )


def union_audit(*audits: DataFrame) -> DataFrame:
    out = audits[0]
    for a in audits[1:]:
        out = out.unionByName(a)
    return out


def key_skew_profile(
    df: DataFrame,
    key_col: str,
    top_n: int = 10,
) -> DataFrame:
    """Shuffle-skew diagnostic for a prospective join/aggregation key:
    the ``top_n`` heaviest keys with their row counts and corpus share —
    the report you read BEFORE deciding whether a key needs salting or
    an AQE skew-join hint (operators/joins.py::salted totals is the
    treatment; this is the diagnosis).

    Returns ``(rank, key, cnt, share)`` ordered by count desc, key asc
    (deterministic tiebreak). ``share`` is one IEEE divide of exact
    integers rounded to 6 decimals — engine-invariant.

    Scale shape: ONE key-keyed count aggregate (map-side combined, the
    same shuffle the key's real workload would pay), then the top-n
    selection is TakeOrdered over the key-cardinality-sized counts frame
    — nothing corpus-sized is sorted or collected. The 1-row total
    broadcasts back onto the n winners.
    """
    counts = df.groupBy(F.col(key_col).cast("string").alias("key")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    total = df.agg(F.count(F.lit(1)).alias("n_total"))
    from pyspark.sql import Window

    top = counts.orderBy(F.desc("cnt"), F.asc("key")).limit(top_n)
    w = Window.orderBy(F.desc("cnt"), F.asc("key"))
    return (
        top.join(F.broadcast(total))
        .withColumn("rank", F.row_number().over(w))
        .select(
            "rank",
            "key",
            "cnt",
            F.round(
                F.col("cnt").cast("double") / F.col("n_total"), 6
            ).alias("share"),
        )
    )


def profile_columns(
    df: DataFrame,
    numeric_cols: list[str],
    string_cols: list[str],
) -> DataFrame:
    """Single-scan column profiler: one output row per column with
    ``(col_name, n_rows, n_nonnull, n_distinct, min_num, max_num,
    min_str, max_str)`` — the ANALYZE/data-catalog statistics pass every
    curated layer runs before it is published.

    All metrics for all columns come from ONE aggregate over ONE table
    scan (Catalyst plans the multiple exact COUNT(DISTINCT)s as a single
    Expand + two-phase aggregate — input rows replicate ×columns inside
    the shuffle, never a per-column re-scan of the table), then a
    ``stack`` unpivot reshapes the 1-row result driver-free. min/max stay
    typed in their own column families (doubles vs strings) because a
    cross-engine string render of a double is not canonical.

    At extreme widths or row counts swap ``countDistinct`` for the
    mergeable HLL sketch (operators/sketches.py) — same plan shape minus
    the Expand replication.
    """
    aggs: list[Column] = [F.count(F.lit(1)).alias("__n")]
    for c in numeric_cols + string_cols:
        aggs.append(F.count(c).alias(f"{c}__nn"))
        aggs.append(F.countDistinct(c).alias(f"{c}__nd"))
    for c in numeric_cols:
        aggs.append(F.min(F.col(c).cast("double")).alias(f"{c}__mn"))
        aggs.append(F.max(F.col(c).cast("double")).alias(f"{c}__mx"))
    for c in string_cols:
        aggs.append(F.min(c).alias(f"{c}__smn"))
        aggs.append(F.max(c).alias(f"{c}__smx"))
    row = df.agg(*aggs)

    tuples = []
    for c in numeric_cols:
        tuples.append(
            f"'{c}', __n, `{c}__nn`, `{c}__nd`, `{c}__mn`, `{c}__mx`, "
            "CAST(NULL AS STRING), CAST(NULL AS STRING)"
        )
    for c in string_cols:
        tuples.append(
            f"'{c}', __n, `{c}__nn`, `{c}__nd`, CAST(NULL AS DOUBLE), "
            f"CAST(NULL AS DOUBLE), `{c}__smn`, `{c}__smx`"
        )
    n = len(tuples)
    return row.selectExpr(
        f"stack({n}, {', '.join(tuples)}) AS "
        "(col_name, n_rows, n_nonnull, n_distinct, min_num, max_num, "
        "min_str, max_str)"
    )


def distribution_drift(
    ref: DataFrame,
    cur: DataFrame,
    value_col: str,
    n_buckets: int = 10,
) -> DataFrame:
    """Two-sample distribution drift report: bucket the CURRENT sample
    by the REFERENCE sample's exact quantile edges and emit each
    bucket's (ref_n, cur_n, chi2) — the Pearson chi-square contribution
    ``(cur_n - expected)^2 / expected`` with
    ``expected = ref_n / ref_N * cur_N``. The monitoring primitive
    behind "did this week's data shift from the training distribution"
    — the chi-square form is chosen over PSI/KL deliberately: PSI needs
    ``ln`` (libm-dependent, the unigram_logloss lesson) while chi-square
    is IEEE arithmetic over exact counts, engine-reproducible to the
    last bit. Buckets are an equal-count split of the reference, so
    under no-drift every bucket expects cur_N/n_buckets and
    contributions are comparable. Bucket indices skipped by heavy ties
    in the reference (possible only when an edge value repeats) carry
    zero expected count — the statistic is undefined there and those
    rows are excluded (the ref-side join is the driver).

    Scale shape: edge computation is one exact-percentile aggregate on
    the reference (single-pass, mergeable partials) collapsing to a
    1-row array that broadcast-joins to both sides; bucket assignment
    is a JVM higher-order ``filter`` over the ``n_buckets-1`` edges
    (zero Python, no per-bucket scans); each side then aggregates to
    ``n_buckets`` rows. Two corpus scans total, no corpus shuffle — the
    groupBy keys are bucket ids.
    """
    fracs = [i / n_buckets for i in range(1, n_buckets)]
    edges = ref.agg(
        F.percentile(value_col, F.array(*[F.lit(f) for f in fracs])).alias(
            "_edges"
        )
    )

    def bucketed(df: DataFrame, out: str) -> DataFrame:
        v = F.col(value_col)
        b = F.size(F.filter("_edges", lambda e: v > e))
        return (
            df.crossJoin(F.broadcast(edges))
            .select(b.alias("bucket"))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias(out))
        )

    rb = bucketed(ref, "ref_n")
    cb = bucketed(cur, "cur_n")
    totals = (
        ref.agg(F.count(F.lit(1)).alias("_rn"))
        .crossJoin(cur.agg(F.count(F.lit(1)).alias("_cn")))
    )
    joined = (
        rb.join(cb, "bucket", "left")
        .withColumn("cur_n", F.coalesce("cur_n", F.lit(0)))
        .crossJoin(F.broadcast(totals))
    )
    expected = F.col("ref_n").cast("double") / F.col("_rn") * F.col("_cn")
    diff = F.col("cur_n") - expected
    return joined.select(
        "bucket",
        F.col("ref_n").cast("bigint").alias("ref_n"),
        F.col("cur_n").cast("bigint").alias("cur_n"),
        F.round(diff * diff / expected, 6).alias("chi2"),
    )


def schema_diff(left: DataFrame, right: DataFrame) -> list[dict]:
    """Schema drift report between two DataFrames (snapshot vs snapshot,
    landing vs curated): per column, presence on each side and the two
    type strings — the check every scheduled pipeline runs before an
    incompatible upstream change silently corrupts a layer. Pure
    metadata: no job, no scan.

    Returns a list of ``{column, left_type, right_type, status}`` dicts
    with status in added/removed/type_changed/ok, ordered by column
    name."""
    lt = {f.name: f.dataType.simpleString() for f in left.schema.fields}
    rt = {f.name: f.dataType.simpleString() for f in right.schema.fields}
    out = []
    for c in sorted(set(lt) | set(rt)):
        if c not in lt:
            status = "added"
        elif c not in rt:
            status = "removed"
        elif lt[c] != rt[c]:
            status = "type_changed"
        else:
            status = "ok"
        out.append(
            {
                "column": c,
                "left_type": lt.get(c),
                "right_type": rt.get(c),
                "status": status,
            }
        )
    return out


def ks_drift(
    ref: DataFrame,
    cur: DataFrame,
    value_col: str,
    group_col: str | None = None,
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift statistic, exactly — the
    binless complement to :func:`distribution_drift` (chi-square over
    decile buckets): KS sees ANY distribution change, not just mass
    moving between the reference's bins, at the cost of ordering the
    pooled sample.

    Division-free integer surface: the ECDFs only step at pooled sample
    values, so ``D = max |F_ref − F_cur| = max |n2·cum1 − n1·cum2| /
    (n1·n2)``; this emits the integer numerator ``ks_num`` plus
    ``(n1, n2)`` — callers divide (or compare against
    ``c(α)·sqrt(...)·n1·n2`` cross-multiplied, staying in integers).
    BIGINT holds to ~3e9 rows per side per group (``n·cum`` products);
    widen to DECIMAL beyond.

    Shuffle shape: one union + one (group, value) count aggregate —
    distinct-value-bounded, not row-bounded; one per-group
    running-sum window over those distinct values (at 100 TB, quantize
    the value to a fixed grid first to bound per-group cardinality —
    the statistic degrades gracefully with grid size); one group-sized
    aggregate at the end.
    """
    from pyspark.sql import Window

    g = [group_col] if group_col else []
    a = ref.select(
        *g, F.col(value_col).alias("_v"),
        F.lit(1).alias("_c1"), F.lit(0).alias("_c2"),
    )
    b = cur.select(
        *g, F.col(value_col).alias("_v"),
        F.lit(0).alias("_c1"), F.lit(1).alias("_c2"),
    )
    per_v = (
        a.unionByName(b)
        .groupBy(*g, "_v")
        .agg(F.sum("_c1").alias("c1"), F.sum("_c2").alias("c2"))
    )
    w = (
        Window.partitionBy(*g).orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cums = per_v.select(
        *g,
        F.sum("c1").over(w).alias("cum1"),
        F.sum("c2").over(w).alias("cum2"),
    )
    ns = per_v.groupBy(*g).agg(
        F.sum("c1").alias("n1"), F.sum("c2").alias("n2")
    )
    joined = (
        cums.join(F.broadcast(ns), g)
        if g
        else cums.crossJoin(F.broadcast(ns))  # 1-row global frame
    )
    return joined.groupBy(*g).agg(
        F.min("n1").cast("bigint").alias("n1"),
        F.min("n2").cast("bigint").alias("n2"),
        F.max(
            F.abs(F.col("n2") * F.col("cum1") - F.col("n1") * F.col("cum2"))
        ).cast("bigint").alias("ks_num"),
    )


def k_anonymity_audit(
    df: DataFrame, quasi_cols: list[str], k: int = 5
) -> DataFrame:
    """k-anonymity risk audit: equivalence classes over the
    quasi-identifier columns whose size is below ``k`` — each is a set
    of rows an attacker can narrow to fewer than ``k`` candidates by
    joining public attributes (Sweeney's re-identification model). The
    release gate for any dataset carrying indirect identifiers:
    generalize/suppress until this returns zero rows.

    Returns ``(quasi..., class_size)`` for the risky classes only,
    NULL-safe (NULL is a value an attacker can also match on — grouped,
    not dropped).

    Scale shape: ONE hash aggregate over the quasi-identifier key +
    a size filter; the output is risk-sized, not corpus-sized.
    """
    return (
        df.groupBy(*quasi_cols)
        .agg(F.count(F.lit(1)).alias("class_size"))
        .filter(F.col("class_size") < k)
    )


def ab_test_chisq(
    df: DataFrame,
    unit_col: str,
    success_pred,
    salt: str = "ab:",
) -> DataFrame:
    """Two-proportion A/B test: units (users) hash-assigned 50/50 to
    variants A/B — exactly how production experiment bucketing works
    (deterministic, engine-portable md5 split, no assignment table) —
    then the 2×2 contingency chi-square with Yates-free closed form
    ``χ² = N(ad−bc)² / ((a+b)(c+d)(a+c)(b+d))`` over per-unit
    conversion (did the unit ever satisfy ``success_pred``).

    Determinism: the four cells are exact integers; the statistic is
    ONE fixed double expression over them — IEEE multiply/divide are
    correctly rounded, so two engines evaluating the same expression
    tree on the same integers produce the bit-identical double (the
    ewma/level_shift precedent). No p-value: that needs an incomplete
    gamma, which is a libm-agreement trap — χ² > 3.84 IS the 5% line.

    Scale shape: one unit-grain aggregate (conversion flag per unit,
    map-side combinable), one 4-cell aggregate, one projection. The
    contingency table never exceeds 4 numbers regardless of corpus.
    """
    from data_pipeline_ine_spark.operators.sampling import hash_bucket

    units = df.groupBy(unit_col).agg(
        F.max(F.when(success_pred, 1).otherwise(0)).alias("_conv")
    )
    tagged = units.select(
        hash_bucket(unit_col, 2, salt).alias("_variant"), "_conv"
    )
    cells = tagged.agg(
        F.sum(F.when((F.col("_variant") == 0) & (F.col("_conv") == 1), 1)
              .otherwise(0)).cast("bigint").alias("a_conv"),
        F.sum(F.when((F.col("_variant") == 0) & (F.col("_conv") == 0), 1)
              .otherwise(0)).cast("bigint").alias("a_fail"),
        F.sum(F.when((F.col("_variant") == 1) & (F.col("_conv") == 1), 1)
              .otherwise(0)).cast("bigint").alias("b_conv"),
        F.sum(F.when((F.col("_variant") == 1) & (F.col("_conv") == 0), 1)
              .otherwise(0)).cast("bigint").alias("b_fail"),
    )
    a, b = F.col("a_conv").cast("double"), F.col("a_fail").cast("double")
    c, d = F.col("b_conv").cast("double"), F.col("b_fail").cast("double")
    n = a + b + c + d
    det = a * d - b * c
    den = (a + b) * (c + d) * (a + c) * (b + d)
    return cells.select(
        "a_conv", "a_fail", "b_conv", "b_fail",
        F.when(den > 0, n * det * det / den).alias("chisq"),
    )


def benford_leading_digit(
    df: DataFrame, value_col: str, unit_scale: int = 100
) -> DataFrame:
    """First-significant-digit distribution vs Benford's law — the
    classic synthetic-data / fraud / unit-mix smell test (naturally
    grown monetary amounts follow ``P(d) = log10(1 + 1/d)``; uniform
    generators, capped fields, and fabricated figures don't).

    Values snap to exact integer units (``floor(value·unit_scale)``,
    the repo-wide cents recipe) and the leading digit is the first
    character of that integer's decimal string — pure integer/string
    work, no float log on data. The Benford expectation is the only
    float: ``log10(1+1/d)`` snapped to e6 fixed-point via the proven
    ``floor(·1e6 + 0.5)`` recipe, and the expected count ships as
    ``expected_e2 = (total·ln_e6) div 10000`` — an exact integer
    product and a truncating integer division over non-negative
    operands (Spark ``div`` ≡ DuckDB ``//`` digit-for-digit; a
    ROUND(double) here can land on a half boundary where the engines'
    rounding modes disagree).

    Scale shape: one 9-bucket hash aggregate (map-side combinable) +
    a 1-row total broadcast; output is 9 rows regardless of corpus.
    """
    units = F.floor(F.col(value_col) * unit_scale).cast("bigint")
    digit = F.substring(units.cast("string"), 1, 1).cast("bigint")
    counts = (
        df.filter(units > 0)
        .select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n_obs"))
    )
    total = counts.agg(F.sum("n_obs").cast("bigint").alias("_total"))
    ln_e6 = (
        F.floor(
            F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit").cast("double"))
            * 1e6
            + F.lit(0.5)
        )
    ).cast("bigint")
    return (
        counts.crossJoin(F.broadcast(total))
        .withColumn("_lne6", ln_e6)
        .select(
            "digit",
            "n_obs",
            F.expr("(_total * _lne6) div 10000")
            .cast("bigint")
            .alias("expected_e2"),
        )
        .orderBy("digit")
    )


def gini_concentration(
    df: DataFrame,
    value_col: str,
    group_col: str,
    id_col: str,
) -> DataFrame:
    """Per-group Gini coefficient of value concentration — the one
    scalar that says "is this segment's revenue a healthy long tail or
    three whale accounts" (0 = perfectly equal, →1 = one unit holds
    everything). The standard concentration audit next to
    ``pareto_parts``' top-heavy cut.

    ``df`` carries one row per unit with an exact integer
    ``value_col`` (cents). Units are ranked within group by
    ``(value, id)`` — a total order, so every engine agrees on ties —
    and the closed form over exact integer moments is
    ``G = (2·Σ rk·x − (n+1)·Σx) / (n·Σx)``: the rank-weighted sum and
    the plain sum stay DECIMAL(38,0)-exact, and the statistic is ONE
    fixed double expression over them (the ewma/chisq precedent).

    Scale shape: the within-group rank rides the two-pass distributed
    rank over ``(group, value, id)`` (``sampling.two_pass_rank`` —
    never a one-task window, immune to few-groups skew), localized by
    subtracting each group's broadcast min rank; then one |groups|-row
    moment aggregate. Output is |groups| rows.
    """
    from data_pipeline_ine_spark.operators.sampling import two_pass_rank

    ranked = two_pass_rank(
        df.select(group_col, value_col, id_col),
        [group_col, value_col, id_col],
        out_col="_gr",
    )
    bases = ranked.groupBy(group_col).agg(F.min("_gr").alias("_g0"))
    rk = (F.col("_gr") - F.col("_g0") + 1).cast("decimal(19,0)")
    x = F.col(value_col).cast("decimal(19,0)")
    m = (
        ranked.join(F.broadcast(bases), group_col)
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n_units"),
            F.sum(x).cast("decimal(38,0)").alias("_sx"),
            F.sum(rk * x).cast("decimal(38,0)").alias("_srx"),
        )
    )
    nd = F.col("n_units").cast("double")
    sx = F.col("_sx").cast("double")
    srx = F.col("_srx").cast("double")
    return m.select(
        group_col,
        "n_units",
        F.when(
            F.col("_sx") > 0,
            F.round((2.0 * srx - (nd + 1.0) * sx) / (nd * sx), 6),
        ).alias("gini"),
    )


def psi_drift(
    ref: DataFrame,
    cur: DataFrame,
    value_col: str,
    unit_scale: int = 100,
) -> DataFrame:
    """Population Stability Index between a reference and a current
    sample of one numeric column — THE industry drift gate next to the
    exact-KS test (``ks_drift``): PSI = Σ (pᵢ − qᵢ)·ln(pᵢ/qᵢ) over
    shared bins; < 0.1 stable, > 0.25 act. Where KS gives a sharp
    hypothesis test, PSI gives the monitoring dashboard's magnitude.

    Bins are engine-exact log2 buckets of integer units:
    ``length(bin(floor(v·unit_scale)))`` — the proven power-of-two-safe
    recipe (never libm ``log2``); non-positive values get bucket 0.
    Each bin's contribution ``(aᵢ·B − bᵢ·A)·ln_e6(aᵢ·B/(bᵢ·A))``
    stays an exact DECIMAL(38,0) product of integers and one snapped-e6
    log (the KL/zipf recipe); the total divides once by ``A·B·1e6`` at
    the end. Bins present on only one side carry infinite PSI — they
    are EXCLUDED from the sum and reported via ``n_one_sided`` (the
    epsilon-fudge alternative makes the statistic depend on an
    arbitrary constant; a one-sided bin should page a human, not tune
    an epsilon).

    Scale shape: one ~64-bucket hash aggregate per side (map-side
    combinable), a bucket-keyed outer join of two ≤64-row frames, a
    1-row total. Output is one row.
    """
    def bucketed(df: DataFrame, out: str) -> DataFrame:
        units = F.floor(F.col(value_col) * unit_scale).cast("bigint")
        bucket = F.when(units > 0, F.length(F.bin(units))).otherwise(
            F.lit(0)
        ).cast("bigint")
        return (
            df.select(bucket.alias("bucket"))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias(out))
        )

    a = bucketed(ref, "_a")
    b = bucketed(cur, "_b")
    cells = a.join(b, "bucket", "full_outer").select(
        "bucket",
        F.coalesce("_a", F.lit(0)).alias("_a"),
        F.coalesce("_b", F.lit(0)).alias("_b"),
    )
    tot = cells.agg(
        F.sum("_a").cast("bigint").alias("_ta"),
        F.sum("_b").cast("bigint").alias("_tb"),
    )
    both = F.col("_a") > 0
    cur_side = F.col("_b") > 0
    ln_e6 = F.floor(
        F.log(
            (F.col("_a") * F.col("_tb")).cast("double")
            / (F.col("_b") * F.col("_ta")).cast("double")
        )
        * 1e6
        + F.lit(0.5)
    ).cast("decimal(19,0)")
    term = (
        (F.col("_a") * F.col("_tb") - F.col("_b") * F.col("_ta"))
        .cast("decimal(19,0)")
        * ln_e6
    )
    agg = cells.crossJoin(F.broadcast(tot)).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bins"),
        F.sum(F.when(~(both & cur_side), 1).otherwise(0))
        .cast("bigint")
        .alias("n_one_sided"),
        F.sum(F.when(both & cur_side, term).otherwise(F.lit(0).cast("decimal(19,0)")))
        .cast("decimal(38,0)")
        .alias("_num"),
        F.min("_ta").alias("_ta"),
        F.min("_tb").alias("_tb"),
    )
    return agg.select(
        "n_bins",
        "n_one_sided",
        F.round(
            F.col("_num").cast("double")
            / (F.col("_ta") * F.col("_tb")).cast("double")
            / 1e6,
            6,
        ).alias("psi"),
    )


def column_entropy(
    df: DataFrame,
    columns: list[str],
) -> DataFrame:
    """Shannon-entropy column profile — the screening stat a data
    catalog wants for every column: near-zero entropy flags constants
    and degenerate joins keys, entropy ≈ ln(n) flags unique ids, and a
    drop between snapshots flags a silently collapsed upstream
    dimension. One row per profiled column.

    ``H = ln N − (Σ c·ln c)/N`` over category counts c. Engine-exact
    surface: each category's ``ln c`` snaps to the proven e6
    fixed-point (``floor(ln·1e6 + 0.5)`` — the zipf recipe), the
    weighted sum ``Σ c·ln_e6(c)`` accumulates in DECIMAL(38,0) and
    ships as BIGINT, and the final ``entropy_e6 = ln_e6(N) −
    sum_c_lnc_e6 div N`` is a non-negative integer division (floor ==
    truncate in both engines). Values are compared as STRINGS (cast
    before counting), so distinctness is representation-stable.

    Scale shape: the melt is a generator explode (rows × |columns|,
    no join); the (column, value) count is map-side combinable and
    vocabulary-bounded after it; everything downstream is
    |columns|-sized. No collects, no windows.
    """
    pairs = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col(c).cast("string").alias("val"),
            )
            for c in columns
        ]
    )
    melted = df.select(F.explode(pairs).alias("p")).select(
        F.col("p.col_name").alias("col_name"), F.col("p.val").alias("val")
    )
    counts = melted.groupBy("col_name", "val").agg(
        F.count(F.lit(1)).cast("bigint").alias("_c")
    )
    ln_e6 = lambda col: F.floor(  # noqa: E731
        F.log(col.cast("double")) * 1e6 + F.lit(0.5)
    ).cast("bigint")
    prof = counts.groupBy("col_name").agg(
        F.sum("_c").cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
        F.sum(
            (F.col("_c") * ln_e6(F.col("_c"))).cast("decimal(38,0)")
        )
        .cast("bigint")
        .alias("sum_c_lnc_e6"),
    )
    return prof.select(
        "col_name",
        "n_rows",
        "n_distinct",
        "sum_c_lnc_e6",
        (
            ln_e6(F.col("n_rows"))
            - F.expr("sum_c_lnc_e6 div n_rows")
        )
        .cast("bigint")
        .alias("entropy_e6"),
    ).orderBy("col_name")


def diff_in_diff(
    df: DataFrame,
    unit_col: str,
    ts_col: str,
    value_col: str,
    cutover: str,
    salt: str = "did:",
    unit_scale: int = 100,
) -> DataFrame:
    """Difference-in-differences estimator: units hash-split 50/50 into
    control/treatment (the ab_test_chisq bucketing), time split at
    ``cutover`` — the causal-inference workhorse that nets out both the
    group baseline and the shared time trend:
    ``DiD = (T_post − T_pre) − (C_post − C_pre)`` over cell mean values.

    Determinism: the 2×2×(n, sum) cells are exact integers (md5 unit
    split, integer cents); the estimate is ONE fixed double expression
    over the eight integers — four correctly-rounded divides and three
    subtractions evaluated in the same tree by both engines (the
    ab_test/ewma precedent). Cells ship alongside the estimate so a
    reviewer can recompute it.

    Scale shape: one row-grain projection into (variant, period,
    cents), one 8-number aggregate. Nothing downstream ever exceeds
    one row.
    """
    from data_pipeline_ine_spark.operators.sampling import hash_bucket

    cut = F.lit(cutover).cast("date")
    tagged = df.select(
        hash_bucket(unit_col, 2, salt).alias("_v"),
        F.when(F.to_date(ts_col) >= cut, 1).otherwise(0).alias("_post"),
        F.floor(F.col(value_col) * unit_scale).cast("bigint").alias("_x"),
    )

    def cell(v: int, p: int, what: str):
        hit = (F.col("_v") == v) & (F.col("_post") == p)
        if what == "n":
            return F.sum(F.when(hit, 1).otherwise(0)).cast("bigint")
        return F.sum(
            F.when(hit, F.col("_x")).otherwise(0).cast("decimal(25,0)")
        ).cast("bigint")

    cells = tagged.agg(
        cell(0, 0, "n").alias("c_pre_n"),
        cell(0, 0, "s").alias("c_pre_cents"),
        cell(0, 1, "n").alias("c_post_n"),
        cell(0, 1, "s").alias("c_post_cents"),
        cell(1, 0, "n").alias("t_pre_n"),
        cell(1, 0, "s").alias("t_pre_cents"),
        cell(1, 1, "n").alias("t_post_n"),
        cell(1, 1, "s").alias("t_post_cents"),
    )
    m = lambda s, n: F.col(s).cast("double") / F.col(n).cast("double")  # noqa: E731
    return cells.select(
        "c_pre_n",
        "c_post_n",
        "t_pre_n",
        "t_post_n",
        F.round(
            (m("t_post_cents", "t_post_n") - m("t_pre_cents", "t_pre_n"))
            - (m("c_post_cents", "c_post_n") - m("c_pre_cents", "c_pre_n")),
            6,
        ).alias("did_cents"),
    )


def l_diversity(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
) -> DataFrame:
    """l-diversity audit — the companion to ``k_anonymity_audit`` that
    catches what k alone misses: a quasi-identifier class can hold 50
    people (k=50) and still leak everything if all 50 share the same
    sensitive value (l=1, the homogeneity attack). Reports the
    distribution of distinct-sensitive-value counts over quasi-id
    classes plus the corpus minimum.

    One (quasi..., sensitive) distinct + two hash aggregates — all
    map-side combinable, all integers. Output: one row per observed
    diversity level ``l`` with the number of classes at that level and
    a repeated ``min_l`` corpus column (the attack surface number).
    """
    classes = (
        df.select(*quasi_cols, sensitive_col)
        .distinct()
        .groupBy(*quasi_cols)
        .agg(F.count(F.lit(1)).cast("bigint").alias("_l"))
    )
    hist = classes.groupBy("_l").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_classes")
    )
    lo = hist.agg(F.min("_l").cast("bigint").alias("min_l"))
    return (
        hist.crossJoin(F.broadcast(lo))
        .select(F.col("_l").alias("l"), "n_classes", "min_l")
        .orderBy("l")
    )


def t_closeness_audit(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    t: float = 0.2,
) -> DataFrame:
    """t-closeness audit — the third rung of the release-privacy ladder
    (k-anonymity → l-diversity → t-closeness, Li et al. 2007): a class
    can be large (k ok) and diverse (l ok) yet still leak if its
    sensitive-value DISTRIBUTION diverges from the corpus's (skewness
    attack: "90% of this class is in the top income bucket"). For an
    ORDERED sensitive attribute the distance is the Earth Mover's
    Distance with unit adjacent-rank cost:
    ``EMD = (1/(m-1)) · Σ_i |CumP_i − CumQ_i|`` over the m globally
    observed values.

    Engine-exact: cumulative counts cross-multiplied instead of divided
    — the per-value term is ``|cumc_i·N − cumg_i·n|`` (exact BIGINTs;
    ``cumc``/``cumg`` the class/global cumulative counts, ``n``/``N``
    the class/corpus sizes) — summed exactly, with ONE final IEEE divide
    by ``n·N·(m−1)`` and a 6-dp round. ``leaky = emd > t``.

    Returns ``(quasi..., class_n, emd, leaky)`` — one row per class.

    Scale shape: two hash aggregates (class×value, global value) + the
    class×value-domain grid (classes broadcast against the
    value-domain frame — both are aggregate-sized, never row-sized),
    one class-partitioned cumulative window. Nothing corpus-sized
    shuffles twice.
    """
    val = F.col(sensitive_col)
    cv = df.groupBy(*quasi_cols, sensitive_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("_c")
    )
    gv = df.groupBy(sensitive_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("_g")
    )
    classes = df.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("class_n")
    )
    tot = gv.agg(
        F.sum("_g").cast("bigint").alias("_N"),
        F.count(F.lit(1)).cast("bigint").alias("_m"),
    )
    grid = (
        classes.crossJoin(F.broadcast(gv.select(sensitive_col, "_g")))
        .join(cv, [*quasi_cols, sensitive_col], "left")
        .fillna(0, subset=["_c"])
    )
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy(*quasi_cols)
        .orderBy(val)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = grid.select(
        *quasi_cols,
        "class_n",
        F.sum("_c").over(w).alias("_cumc"),
        F.sum("_g").over(w).alias("_cumg"),
    )
    # cross-multiplied |cumP − cumQ| numerators in DECIMAL(38,0): the
    # products are ≤ class_n·N per term — decimal keeps the sum exact
    # far past int64 at fleet scale
    per_class = (
        cum.crossJoin(F.broadcast(tot))
        .groupBy(*quasi_cols, "class_n", "_N", "_m")
        .agg(
            F.sum(
                F.abs(
                    F.col("_cumc").cast("decimal(38,0)") * F.col("_N")
                    - F.col("_cumg").cast("decimal(38,0)")
                    * F.col("class_n")
                )
            ).alias("_num")
        )
    )
    emd = F.when(F.col("_m") == 1, F.lit(0.0)).otherwise(
        F.round(
            F.col("_num").cast("double")
            / (
                F.col("class_n").cast("double")
                * F.col("_N").cast("double")
                * (F.col("_m") - F.lit(1)).cast("double")
            ),
            6,
        )
    )
    return per_class.select(
        *quasi_cols,
        "class_n",
        emd.alias("emd"),
        F.when(emd > F.lit(float(t)), 1).otherwise(0).cast("int").alias("leaky"),
    )


def sprt_ab(
    df: DataFrame,
    unit_col: str,
    ts_col: str,
    success_pred,
    llr_conv_e6: int,
    llr_fail_e6: int,
    boundary_e6: int = 2_944_439,  # ln(19)·1e6: alpha = beta = 0.05
    salt: str = "ab:",
) -> DataFrame:
    """Wald SPRT over the treatment arm, day by day — the anytime-valid
    sequential test a fixed-horizon chi-square can't give you: peeking
    every day is the DESIGN, not a sin, and the expected sample size
    runs ~half the fixed-horizon test's. Units enter on their first
    event day; the cumulative log-likelihood ratio walks by
    ``llr_conv_e6`` per conversion and ``llr_fail_e6`` per
    non-conversion until it exits ±``boundary_e6``.

    The per-outcome LLR increments are CALLER-SUPPLIED e6 integers
    (compute ``ln(p1/p0)``, ``ln((1−p1)/(1−p0))`` once at design time
    — embedding them as integers removes every libm call from the
    runtime surface entirely, one better than snapping). All columns
    are exact BIGINTs. ``decision``: 1 = accept p1 (effect), −1 =
    accept p0 (no effect), 0 = keep sampling.

    Scale shape: one unit-grain aggregate (first day + converted flag,
    map-side combinable), a day-grain rollup, and calendar-bounded
    cumulative windows (the kaplan_meier precedent). Output: one row
    per day with ≥1 entering treatment unit.
    """
    from pyspark.sql import Window

    from data_pipeline_ine_spark.operators.sampling import hash_bucket

    units = (
        df.groupBy(unit_col)
        .agg(
            F.min(F.to_date(ts_col)).alias("day"),
            F.max(F.when(success_pred, 1).otherwise(0)).alias("_conv"),
        )
        .withColumn("_v", hash_bucket(unit_col, 2, salt))
        .filter(F.col("_v") == 1)
    )
    daily = units.groupBy("day").agg(
        F.count(F.lit(1)).cast("bigint").alias("_n"),
        F.sum("_conv").cast("bigint").alias("_c"),
    )
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    llr = (
        F.col("_c") * F.lit(int(llr_conv_e6))
        + (F.col("_n") - F.col("_c")) * F.lit(int(llr_fail_e6))
    ).cast("bigint")
    return (
        daily.withColumn("_llr_day", llr)
        .select(
            "day",
            F.sum("_n").over(w).cast("bigint").alias("n_units_cum"),
            F.sum("_c").over(w).cast("bigint").alias("conv_cum"),
            F.sum("_llr_day").over(w).cast("bigint").alias("llr_e6"),
        )
        .withColumn(
            "decision",
            F.when(F.col("llr_e6") >= boundary_e6, 1)
            .when(F.col("llr_e6") <= -boundary_e6, -1)
            .otherwise(0)
            .cast("bigint"),
        )
        .orderBy("day")
    )

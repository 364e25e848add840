"""Mergeable-sketch aggregates: HLL distincts, KLL quantiles, theta sets.

At 100 TB you do not count distincts or compute quantiles with a global
re-shuffle per reporting window — you keep a small MERGEABLE sketch per
partition (per day, per source, per shard), and roll windows up by merging
sketches, never rescanning rows. Spark 4 ships Apache DataSketches
aggregates (``hll_sketch_agg``, ``kll_sketch_agg_*``, ``theta_sketch_agg``)
that run JVM-side inside whole-stage codegen; these wrappers pin the
engine's sketch vocabulary plus the merge laws the rollup pattern relies on
(tested in ``tests/test_sketches.py``):

- HLL union is register-wise max, so ``estimate(union(per-group sketches))
  == estimate(sketch(whole corpus))`` exactly — merging loses nothing.
- KLL merge keeps rank-error guarantees, so pre-sharded quantile sketches
  answer any later quantile question without a corpus sort.

The exact/approx trade is the reference's A3 ``COUNT(DISTINCT ...)``
(SURVEY §2.4) generalized to the scale path; ``approx_count_distinct``
(HyperLogLog++) is already covered in ``operators/aggregates.py``. These
sketches differ in one load-bearing way: the sketch itself is a column you
can PERSIST — per-day sketch tables make month/quarter distincts a
sketch-merge over 30/90 rows instead of a corpus re-scan.

No DuckDB oracle: DataSketches estimates are deterministic for a given
input but not reproducible by another engine's HLL, so correctness is
pinned by pytest merge-law equalities + tolerance vs exact aggregates (the
contract's documented escape hatch for non-SQL-expressible ops).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_LG_K = 14  # ~0.8% relative error, 2^14 registers ≈ 16 KiB/sketch


def hll_sketches(
    df: DataFrame, strata_col: str, key_col: str, lg_k: int = DEFAULT_LG_K
) -> DataFrame:
    """One HLL sketch per stratum — the persistable partial aggregate.

    Columns: ``strata_col``, ``n_approx`` (estimate), ``sketch`` (binary,
    re-mergeable later without touching the rows again).
    """
    sk = F.hll_sketch_agg(F.col(key_col).cast("string"), F.lit(lg_k))
    return df.groupBy(strata_col).agg(
        sk.alias("sketch"),
    ).select(
        strata_col,
        F.hll_sketch_estimate("sketch").alias("n_approx"),
        "sketch",
    )


def hll_merge_estimate(sketches: DataFrame, sketch_col: str = "sketch") -> DataFrame:
    """Fold per-stratum sketches into one global distinct estimate.

    This is the rollup step: input is one row per stratum (tiny), never the
    corpus. ``allowDifferentLgConfigK`` stays False — mixing precisions
    silently degrades to the coarsest sketch, better to fail loudly.
    """
    return sketches.agg(
        F.hll_sketch_estimate(
            F.hll_union_agg(F.col(sketch_col), F.lit(False))
        ).alias("n_approx")
    )


def theta_distinct(
    df: DataFrame, strata_col: str, key_col: str
) -> DataFrame:
    """Theta-sketch distinct estimate per stratum.

    Theta sketches cost more than HLL per byte but additionally support set
    intersection / difference across sketches (audience-overlap style
    questions); pinned here so the engine exposes both families.
    """
    return df.groupBy(strata_col).agg(
        F.theta_sketch_estimate(
            F.theta_sketch_agg(F.col(key_col).cast("string"))
        ).alias("n_approx")
    )


def kll_quantiles(
    df: DataFrame,
    value_col: str,
    probs: Sequence[float],
    strata_col: str | None = None,
    k: int = 2048,
) -> DataFrame:
    """Mergeable quantile estimates (KLL sketch over doubles).

    ``k=2048`` gives ~0.4% rank error. Unlike ``percentile_approx`` the
    sketch is a first-class value: per-shard sketches persisted once can be
    merged into any later grouping without re-reading the data.
    """
    sketch = F.kll_sketch_agg_double(F.col(value_col).cast("double"), F.lit(k))
    quants: list[Column] = [
        F.kll_sketch_get_quantile_double(F.col("_kll"), F.lit(float(p))).alias(
            f"q{int(p * 100)}"
        )
        for p in probs
    ]
    grouped = df.groupBy(strata_col) if strata_col else df.groupBy()
    out = grouped.agg(sketch.alias("_kll"))
    keep = [strata_col] if strata_col else []
    return out.select(*keep, *quants)


# --- Count-min sketch with ENGINE-PORTABLE integer hashing -----------------
#
# Unlike the DataSketches families above, this CMS uses explicit
# multiply-shift hashing ((a*key + b) mod p mod w) in plain BIGINT
# arithmetic, so an external SQL engine reproduces every cell — and the
# whole estimate — bit-for-bit. That buys the one thing the binary sketches
# can't have: a DuckDB oracle for the full build→estimate pipeline.

CMS_P = (1 << 61) - 1  # Mersenne prime, exact in BIGINT
CMS_W = 512  # cells per hash row
# fixed pairwise-independent hash parameters; a*key must stay inside int64,
# so a < 2^63 / max(key) — fine for catalog-sized id domains (keys here are
# < 2^20). A 64-bit key domain needs a split multiply (hi/lo 32-bit limbs);
# documented, not needed for these tables.
CMS_PARAMS: list[tuple[int, int]] = [
    (1_000_003, 12_345),
    (2_000_029, 67_891),
    (3_000_073, 24_681),
    (4_000_037, 13_579),
]


def _cms_bucket(key: Column, a: int, b: int) -> Column:
    return ((key * F.lit(a) + F.lit(b)) % F.lit(CMS_P)) % F.lit(CMS_W)


def _cms_key(df: DataFrame, key_col: str) -> Column:
    """Engine-portable integer key for the CMS hash family.

    Integral columns cast straight to BIGINT. STRING keys are folded
    through md5 → first 10 hex digits → a 40-bit integer (keeps
    ``a*key`` inside int64 for the fixed multipliers); a pre-hash
    collision merges two keys across ALL d rows, which only OVER-counts
    — the CMS one-sided guarantee survives. Anything else (float,
    decimal, date…) raises: pre-fix, a silent ``cast('bigint')`` turned
    non-numeric keys into NULL, collapsing every such key into one cell
    and returning garbage estimates (ADVICE r5;
    ``stream_maintain_cms`` exposes caller-supplied key columns)."""
    from pyspark.sql.types import (
        ByteType,
        IntegerType,
        LongType,
        ShortType,
        StringType,
    )

    dt = df.schema[key_col].dataType
    if isinstance(dt, (ByteType, ShortType, IntegerType, LongType)):
        return F.col(key_col).cast("bigint")
    if isinstance(dt, StringType):
        return F.conv(
            F.substring(
                F.md5(F.concat(F.lit("cms:"), F.col(key_col))), 1, 10
            ),
            16,
            10,
        ).cast("bigint")
    raise ValueError(
        f"cms key column {key_col!r} has unsupported type "
        f"{dt.simpleString()}: expected an integral or string column"
    )


def cms_build(df: DataFrame, key_col: str) -> DataFrame:
    """Count-min sketch build: ``(row, bucket, cell_count)`` — d×w = 4×512
    cells regardless of input size.

    Scale shape: one generator explode (d=4 rows per input row) feeding a
    single hash aggregate; map-side partial aggregation collapses each
    partition to ≤ 2,048 cells before the shuffle, so the exchange carries
    O(partitions × d × w) bytes, never O(rows). The result is a mergeable
    partial: cell-wise SUM unions two sketches. Keys may be integral or
    string (md5-folded); see ``_cms_key``."""
    key = _cms_key(df, key_col)
    rows = F.array(
        *[
            F.struct(
                F.lit(i).alias("row"), _cms_bucket(key, a, b).alias("bucket")
            )
            for i, (a, b) in enumerate(CMS_PARAMS)
        ]
    )
    return (
        df.select(F.explode(rows).alias("rb"))
        .groupBy(F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cell_count"))
    )


def cms_estimate(sketch: DataFrame, keys: DataFrame, key_col: str) -> DataFrame:
    """Point estimates for ``keys`` against a built sketch: est(key) =
    min over rows of the key's cell — the classic CMS upper-bounded
    estimate (over-counts on collision, never under).

    Scale shape: the sketch is 2,048 rows — broadcast — so probing any
    number of keys is one narrow broadcast-hash join + a key-grouped min.
    """
    key = _cms_key(keys, key_col)
    probes = keys.select(
        key_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        _cms_bucket(key, a, b).alias("bucket"),
                    )
                    for i, (a, b) in enumerate(CMS_PARAMS)
                ]
            )
        ).alias("rb"),
    ).select(key_col, F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket"))
    return (
        probes.join(F.broadcast(sketch), ["row", "bucket"])
        .groupBy(key_col)
        .agg(F.min("cell_count").alias("cms_count"))
    )


def cms_heavy_hitters(
    df: DataFrame, key_col: str, threshold: int
) -> DataFrame:
    """Heavy hitters by CMS estimate: every distinct key whose estimated
    count is ≥ ``threshold``, with the exact count alongside for audit.
    CMS guarantees est ≥ exact, so this NEVER misses a true heavy hitter
    (one-sided error: collision can only promote light keys).

    Scale shape: sketch build (one O(d·w)-wide shuffle) + one distinct-
    key aggregate that also produces the exact audit counts + a broadcast
    probe. The distinct-key side is the only rows-proportional shuffle —
    the same cost any exact per-key count pays; the sketch itself would
    serve unlimited later probes for free."""
    sketch = cms_build(df, key_col)
    exact = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("exact_count"))
    est = cms_estimate(sketch, exact.select(key_col), key_col)
    return (
        est.filter(F.col("cms_count") >= threshold)
        .join(exact, key_col)
        .select(key_col, "cms_count", "exact_count")
    )


# -- Portable Bloom filter ---------------------------------------------------
# Unlike the DataSketches family above, the Bloom filter here is built from
# engine-invariant md5 bit positions, so an external SQL engine reproduces
# every word CELL-EXACTLY — membership answers (including the false
# positives) are deterministic and cross-checkable, the same portability
# design as the count-min sketch above.

BLOOM_M = 2048  # bits per filter
BLOOM_K = 3     # hash functions (8-hex-char md5 slices)


def _bloom_positions(key: Column, m_bits: int, k: int) -> Column:
    """k bit positions as an array<bigint>: independent 32-bit slices of
    the md5 hex digest, reduced mod ``m_bits``. Slice ``i`` reads hex
    chars ``[1 + 8i, 8 + 8i]`` — reproducible in any engine with md5
    and a base-16 fold."""
    if k * 8 > 32:
        raise ValueError(f"md5 provides at most 4 independent 32-bit slices: k={k}")
    return F.array(
        *[
            (F.conv(F.substring(F.md5(key), 1 + 8 * i, 8), 16, 10)
             .cast("bigint") % m_bits)
            for i in range(k)
        ]
    )


def bloom_build(
    df: DataFrame,
    key_col: str,
    group_col: str = "source",
    m_bits: int = BLOOM_M,
    k: int = BLOOM_K,
) -> DataFrame:
    """One Bloom filter per group, in long format: ``(group, word_idx,
    word)`` with 32 bits per word (positive in a signed 64-bit lane on
    every engine — no sign wraparound at bit 63). Only words with at
    least one set bit are materialized.

    The 100 TB role: a filter over a partition's join keys is a few KB —
    broadcast it and pre-filter the probe side BEFORE the shuffle (Bloom
    semi-join pruning), or persist per-day filters and answer "possibly
    seen before?" across months by OR-merging rows (``bit_or`` is the
    merge law — associative, commutative, idempotent).

    Shuffle shape: one explode (k rows/key, narrow) + one (group,
    word_idx) aggregate bounded by ``groups x m_bits/32`` rows — never
    corpus-sized.
    """
    pos = df.select(
        F.col(group_col),
        F.explode(_bloom_positions(F.col(key_col), m_bits, k)).alias("p"),
    )
    return (
        pos.groupBy(
            group_col, (F.col("p") / 32).cast("bigint").alias("word_idx")
        )
        .agg(
            F.bit_or(
                F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 32 AS INT))")
            ).alias("word")
        )
    )


def bloom_probe(
    probes: DataFrame,
    bloom: DataFrame,
    key_col: str,
    id_col: str,
    group_col: str = "source",
    m_bits: int = BLOOM_M,
    k: int = BLOOM_K,
) -> DataFrame:
    """Probe every key against every group's filter: ``(id, group)``
    pairs where ALL k bits are set — i.e. the key is *possibly* in the
    group (one-sided error: a true member is never missed; a
    non-member may false-positive at the standard Bloom rate, and the
    false positives themselves are deterministic cross-engine).

    Join shape: k probe positions equi-join the filter rows on
    ``word_idx`` — output bounded by probes x k x n_groups (groups are
    the small dimension: sources, days, shards), then a probe-sized
    aggregate. The filter side is tiny; Spark broadcasts it.
    """
    ppos = probes.select(
        F.col(id_col),
        F.explode(_bloom_positions(F.col(key_col), m_bits, k)).alias("p"),
    )
    hits = (
        ppos.join(
            F.broadcast(bloom),
            (F.col("word_idx") == (F.col("p") / 32).cast("bigint"))
            & (
                F.expr(
                    "word & shiftleft(CAST(1 AS BIGINT), CAST(p % 32 AS INT))"
                )
                != 0
            ),
        )
        .groupBy(id_col, group_col)
        .agg(F.count(F.lit(1)).alias("nbits"))
    )
    return hits.filter(F.col("nbits") == k).select(id_col, group_col)


def kmv_distinct(
    df: DataFrame,
    key_col: str,
    group_cols: list[str] | None = None,
    k: int = 32,
) -> DataFrame:
    """K-minimum-values (KMV / bottom-k) distinct-count sketch per
    group — the simplest mergeable distinct estimator: hash every key
    uniformly, keep only the k smallest hashes, and estimate
    ``(k−1)·H / h₍ₖ₎`` where ``h₍ₖ₎`` is the k-th order statistic over
    the hash space ``H = 2⁴⁸``. Unlike HLL (whose registers another
    engine can't reproduce) the KMV surface is plain order statistics
    over a portable md5 fold, so it is oracle-checkable cell-for-cell.

    Engine-exact: the hash is the proven md5→hex12→BIGINT fold; the
    k-th smallest is an explicit row_number under the total order
    ``(hash, key)`` (md5 collisions at 48 bits get a deterministic
    tie-break); the estimate is one non-negative integer ``div``.
    Groups with fewer than k distinct keys report their EXACT count
    (the bottom-k set IS the whole key set there).

    Scale shape: one distinct + hash pass (map-side combinable), a
    per-group bottom-k window (WindowGroupLimit pushes the k cut into
    the sort — never a full per-group materialization), and a k-row
    per-group aggregate. Merge law (union of sketches = bottom-k of
    concatenated bottom-k sets) holds by construction; persist the
    k-row frame as the partial.

    Output: group cols + ``n_exact`` (true distinct, kept for sketch
    auditability), ``kth_hash``, ``kmv_estimate`` — all BIGINT.
    """
    from pyspark.sql import Window

    groups = list(group_cols or [])
    hashed = (
        df.select(*groups, F.col(key_col).cast("string").alias("_key"))
        .distinct()
        .withColumn(
            "_h",
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("kmv:"), F.col("_key"))), 1, 12
                ),
                16,
                10,
            ).cast("bigint"),
        )
    )
    w = Window.partitionBy(*groups).orderBy("_h", "_key")
    ranked = hashed.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= k
    )
    agg = ranked.groupBy(*groups).agg(
        F.max("_rn").cast("bigint").alias("_n_seen"),
        F.max(F.when(F.col("_rn") == k, F.col("_h"))).alias("_kth"),
    )
    exact = hashed.groupBy(*groups).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_exact")
    )
    est = F.when(
        F.col("n_exact") < k, F.col("n_exact")
    ).otherwise(
        F.expr(f"(CAST({k - 1} AS BIGINT) * CAST(281474976710656 AS BIGINT)) div _kth")
    )
    return (
        agg.join(exact, groups)
        .select(
            *groups,
            "n_exact",
            F.coalesce(F.col("_kth"), F.lit(0)).cast("bigint").alias(
                "kth_hash"
            ),
            est.cast("bigint").alias("kmv_estimate"),
        )
        .orderBy(*groups)
    )

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

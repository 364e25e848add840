"""Snapshot diff: keyed added/removed/changed comparison of two tables.

The audit step every periodic pipeline needs (and the reference's
idempotent re-run story implies): after re-landing a partition, what
actually changed vs the previous snapshot? Done naively — full outer join
of both tables on the key, then N column-wise comparisons — the shuffle
carries every column of both snapshots. At 100 TB that doubles the
pipeline's largest shuffle for a yes/no question.

The scalable shape here: each side first collapses to ``(key, fingerprint)``
where the fingerprint is one md5 over all compared columns — a narrow
map — so the full-outer join shuffles keys plus 32 bytes per row no matter
how wide the table is. Fingerprints only ever compare WITHIN one engine's
output, so cross-engine string-formatting of doubles is irrelevant to the
diff result (the DuckDB oracle for the contract query uses plain
``IS DISTINCT FROM`` column compares and lands on the same rows).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# unit-separator delimiter + explicit NULL sentinel: without them
# ("a", None) and ("aNone",) — or ("a","b") and ("ab",) — collide
_SEP = "\x1f"
_NULL = "\x00"


def row_fingerprint(cols: Sequence[str]) -> Column:
    """md5 over the delimited, null-sentineled string image of ``cols``."""
    parts = [
        F.coalesce(F.col(c).cast("string"), F.lit(_NULL)) for c in cols
    ]
    return F.md5(F.concat_ws(_SEP, *parts))


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str] | None = None,
    out_col: str = "change_type",
) -> DataFrame:
    """Rows that differ between two snapshots, tagged ``added`` /
    ``removed`` / ``changed``; unchanged rows never leave the join.

    ``compare_cols`` defaults to every non-key column the two frames share
    (a column present in only one side would make every row "changed" —
    schema drift should be handled explicitly, not absorbed silently).
    Returns the key columns + ``out_col``.
    """
    if compare_cols is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        compare_cols = [c for c in shared if c not in set(key_cols)]
    o = old.select(*key_cols, row_fingerprint(compare_cols).alias("_fp_old"))
    n = new.select(*key_cols, row_fingerprint(compare_cols).alias("_fp_new"))
    joined = o.join(n, list(key_cols), "full_outer")
    tag = (
        F.when(F.col("_fp_old").isNull(), F.lit("added"))
        .when(F.col("_fp_new").isNull(), F.lit("removed"))
        .when(F.col("_fp_old") != F.col("_fp_new"), F.lit("changed"))
    )
    return (
        joined.withColumn(out_col, tag)
        .filter(F.col(out_col).isNotNull())
        .select(*key_cols, out_col)
    )


def apply_changelog(
    base: DataFrame,
    changes: DataFrame,
    key_cols: Sequence[str],
    seq_col: str = "seq",
    op_col: str = "op",
) -> DataFrame:
    """Apply a CDC changelog to a base snapshot — the merge-on-read /
    MERGE INTO pattern (Delta/Hudi/Iceberg upsert semantics) as a pure
    DataFrame plan:

    - ``changes`` rows carry the base's payload columns plus ``op``
      ('I' insert, 'U' update, 'D' delete) and a monotonically increasing
      ``seq``; per key, the HIGHEST ``seq`` wins.
    - keys untouched by the changelog pass through from base;
    - winning 'I'/'U' rows replace (or add) the key's payload;
    - a winning 'D' removes the key entirely.

    Scale shape: the changelog collapses to one winner per key with a
    ``row_number`` window — a CHANGELOG-sized shuffle, typically orders of
    magnitude smaller than the snapshot. The application itself is one
    key-equi full-outer join; the base is shuffled once on the key (or
    zero times if both sides are bucketed/sorted by key on disk, the
    layout ``sources/maintenance.py`` produces). No read-modify-rewrite
    of untouched rows happens driver-side — the merged snapshot is itself
    a plan you write back partitioned.
    """
    payload = [c for c in base.columns if c not in key_cols]
    w = Window.partitionBy(*[F.col(k) for k in key_cols]).orderBy(
        F.desc(seq_col)
    )
    latest = (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", seq_col)
    )
    b = base.alias("b")
    c = latest.alias("c")
    merged = b.join(c, list(key_cols), "full_outer")
    take_change = F.col(f"c.{op_col}").isNotNull() & (
        F.col(f"c.{op_col}") != "D"
    )
    out_cols = [F.col(k) for k in key_cols] + [
        F.when(take_change, F.col(f"c.{p}")).otherwise(F.col(f"b.{p}")).alias(p)
        for p in payload
    ]
    return merged.filter(
        F.col(f"c.{op_col}").isNull() | (F.col(f"c.{op_col}") != "D")
    ).select(*out_cols)


def changelog_from_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    seq: int = 1,
    seq_col: str = "seq",
    op_col: str = "op",
) -> DataFrame:
    """Generate the MINIMAL CDC changelog transforming ``old`` into
    ``new`` — the write side of :func:`apply_changelog` (a change feed /
    incremental export): added keys → 'I' with the new payload, changed
    keys → 'U' with the new payload, removed keys → 'D'. Unchanged keys
    emit nothing, so the feed is diff-sized, not snapshot-sized.

    Round-trip law (property-tested):
    ``apply_changelog(old, changelog_from_diff(old, new, k), k) == new``.

    Scale shape: the diff itself is the fingerprint-narrowed full-outer
    join of :func:`snapshot_diff` (keys + 32 bytes per row); payloads
    attach afterwards by key-equi join ONLY for the emitted rows.
    """
    d = snapshot_diff(old, new, key_cols)
    payload = [c for c in new.columns if c not in key_cols]
    upserts = (
        d.filter(F.col("change_type") != "removed")
        .join(new, list(key_cols))
        .select(
            *key_cols,
            *payload,
            F.when(F.col("change_type") == "added", F.lit("I"))
            .otherwise(F.lit("U"))
            .alias(op_col),
        )
    )
    dels = (
        d.filter(F.col("change_type") == "removed")
        .join(old, list(key_cols))
        .select(*key_cols, *payload, F.lit("D").alias(op_col))
    )
    return upserts.unionByName(dels).withColumn(seq_col, F.lit(seq))


def maintain_group_aggregate(
    base: DataFrame,
    changes: DataFrame,
    key_cols: Sequence[str],
    group_col: str,
    value_col: str,
    seq_col: str = "seq",
    op_col: str = "op",
    stored_agg: DataFrame | None = None,
) -> DataFrame:
    """Incremental view maintenance (IVM) for a grouped aggregate:
    keep ``GROUP BY group → (COUNT(*), SUM(value))`` correct under an
    I/U/D changelog WITHOUT recomputing from the snapshot.

    Delta semantics: every changelog-touched key retracts its OLD
    contribution (-1, -value from the base row, if the key existed) and
    the per-key changelog winner inserts its NEW contribution (+1,
    +value, unless it is a delete). Summing deltas per group and merging
    into the stored aggregate yields exactly the aggregate of the merged
    snapshot — group CHANGES (a row moving between groups) fall out
    naturally as a retraction in one group and an insertion in another.

    Scale shape — the whole point of IVM: every stage is changelog- or
    aggregate-sized, never snapshot-sized. The winner dedup is a
    changelog-keyed window; old contributions come from a key-equi join
    of the snapshot against the (small) touched-key set — broadcast
    while it fits, and at production scale the snapshot side is bucketed
    by key so even that probe is shuffle-free; the delta aggregate has
    |groups| rows; the final merge is aggregate×delta. Value sums
    accumulate in DECIMAL so retract/insert ordering cannot wiggle a
    cent. Groups whose count reaches 0 are dropped (no ghost rows).

    ``stored_agg``: the previously maintained output of THIS function
    (columns ``group_col, n_rows, value_sum_exact``). When given, the
    stored side is aggregate-sized and the snapshot is touched only by
    the key-equi retraction probe — the fully incremental steady state;
    when omitted, the stored aggregate is bootstrapped from the snapshot
    (the one-time initialization). The exact DECIMAL ``value_sum_exact``
    column exists precisely so chained maintenance never re-accumulates
    through a rounded double.
    """
    keys = list(key_cols)
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(F.desc(seq_col))
    winner = (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    dec = lambda c: c.cast("decimal(18,2)")  # noqa: E731
    minus = base.join(
        winner.select(*keys).distinct(), keys, "left_semi"
    ).select(
        F.col(group_col).alias("_g"),
        F.lit(-1).alias("_dn"),
        (-dec(F.col(value_col))).alias("_dv"),
    )
    plus = winner.filter(F.col(op_col) != "D").select(
        F.col(group_col).alias("_g"),
        F.lit(1).alias("_dn"),
        dec(F.col(value_col)).alias("_dv"),
    )
    delta = (
        minus.unionByName(plus)
        .groupBy("_g")
        .agg(F.sum("_dn").alias("_dn"), F.sum("_dv").alias("_dv"))
    )
    if stored_agg is not None:
        stored = stored_agg.select(
            F.col(group_col).alias("_g"),
            F.col("n_rows").alias("_n"),
            F.col("value_sum_exact").alias("_v"),
        )
    else:
        stored = base.groupBy(F.col(group_col).alias("_g")).agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum(dec(F.col(value_col))).alias("_v"),
        )
    merged = stored.join(delta, "_g", "full_outer").select(
        F.col("_g").alias(group_col),
        (F.coalesce("_n", F.lit(0)) + F.coalesce("_dn", F.lit(0))).alias(
            "n_rows"
        ),
        (
            F.coalesce(F.col("_v"), F.lit(0).cast("decimal(18,2)"))
            + F.coalesce(F.col("_dv"), F.lit(0).cast("decimal(18,2)"))
        ).alias("_sum"),
    )
    return merged.filter(F.col("n_rows") > 0).select(
        group_col,
        "n_rows",
        F.round(F.col("_sum").cast("double"), 2).alias("value_sum"),
        F.col("_sum").cast("decimal(18,2)").alias("value_sum_exact"),
    )


def bucket_hash_diff(
    left: DataFrame,
    right: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str],
    n_buckets: int = 256,
) -> DataFrame:
    """Merkle-style table reconciliation: compare two huge tables by
    per-bucket content hashes instead of row-by-row — the anti-entropy
    primitive behind cross-cluster replica checks and migration
    sign-offs. Each row folds to a 48-bit md5 integer over its key +
    compared columns; rows land in ``key_hash % n_buckets`` (key-only,
    so a changed VALUE stays in its bucket and flags exactly one); a bucket's
    content hash is the SUM of its row hashes mod 2^61−1 (commutative,
    so partition order is irrelevant and the hash is engine-portable).
    Only buckets whose (count, hash) disagree need a row-level re-scan —
    1/n_buckets of the data per mismatched bucket.

    Scale shape: one narrow projection + one n_buckets-cell aggregate
    per side (map-side combined — the shuffle carries O(partitions ×
    n_buckets) cells), then a full outer join of two n_buckets-row
    results. Nothing rows-sized ever crosses the network."""
    from data_pipeline_ine_spark.operators.dedup import (
        MERSENNE61,
        _hex12_to_long,
    )

    def side(df: DataFrame, tag: str) -> DataFrame:
        kcols = [F.col(c).cast("string") for c in key_cols]
        cols = [F.col(c).cast("string") for c in list(key_cols) + list(compare_cols)]
        # bucket by the KEY hash, digest the full row: a mutated value then
        # disagrees in exactly ITS key's bucket (equal counts, hash-only
        # mismatch) instead of moving buckets and flagging two
        key_hash = _hex12_to_long(F.md5(F.concat_ws("\x1f", *kcols)))
        row_hash = _hex12_to_long(F.md5(F.concat_ws("\x1f", *cols)))
        return (
            df.select(
                (key_hash % n_buckets).alias("bucket"), row_hash.alias("_h")
            )
            .groupBy("bucket")
            .agg(
                F.count(F.lit(1)).alias(f"{tag}_rows"),
                # DECIMAL(38,0) accumulator: 48-bit row hashes summed over a
                # trillion-row bucket would overflow int64 (48+40 bits); the
                # decimal sum is exact to 10^38 and the mod brings it back to
                # a BIGINT-sized, engine-portable digest
                (F.sum(F.col("_h").cast("decimal(38,0)")) % MERSENNE61)
                .cast("bigint")
                .alias(f"{tag}_hash"),
            )
        )
    l, r = side(left, "left"), side(right, "right")
    joined = l.join(r, "bucket", "full_outer")
    return joined.select(
        "bucket",
        F.coalesce("left_rows", F.lit(0)).alias("left_rows"),
        F.coalesce("right_rows", F.lit(0)).alias("right_rows"),
        (
            F.coalesce("left_hash", F.lit(-1)).eqNullSafe(
                F.coalesce("right_hash", F.lit(-2))
            )
            & F.coalesce("left_rows", F.lit(0)).eqNullSafe(
                F.coalesce("right_rows", F.lit(-1))
            )
        ).alias("bucket_match"),
    )


def maintain_group_moments(
    base: DataFrame,
    changes: DataFrame,
    key_cols: Sequence[str],
    group_col: str,
    value_col: str,
    seq_col: str = "seq",
    op_col: str = "op",
    stored_agg: DataFrame | None = None,
) -> DataFrame:
    """IVM for the moment sums ``(COUNT, SUM, SUM(value²))`` per group —
    the basis every mean/variance/z-score gate reads. Same retract/
    insert delta algebra as :func:`maintain_group_aggregate` (which
    see for the shape argument): moments are sums, so they maintain
    under I/U/D with changelog-sized work, which is what makes a
    STANDING variance monitor affordable at 100 TB — the alternative
    recomputes Σx² over the snapshot per refresh.

    Exactness: value enters as DECIMAL(18,2); its square is
    DECIMAL(38,4) (wide enough that the square never overflows and
    partial-sum order cannot wiggle the low digit). Output columns:
    ``group, n_rows, value_sum_exact DECIMAL(18,2),
    value_sumsq_exact DECIMAL(38,4)`` — feed them back as
    ``stored_agg`` for the chained steady state.
    """
    keys = list(key_cols)
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(F.desc(seq_col))
    winner = (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    dec = lambda c: c.cast("decimal(18,2)")  # noqa: E731
    sq = lambda c: (dec(c) * dec(c)).cast("decimal(38,4)")  # noqa: E731
    minus = base.join(
        winner.select(*keys).distinct(), keys, "left_semi"
    ).select(
        F.col(group_col).alias("_g"),
        F.lit(-1).alias("_dn"),
        (-dec(F.col(value_col))).alias("_dv"),
        (-sq(F.col(value_col))).alias("_dq"),
    )
    plus = winner.filter(F.col(op_col) != "D").select(
        F.col(group_col).alias("_g"),
        F.lit(1).alias("_dn"),
        dec(F.col(value_col)).alias("_dv"),
        sq(F.col(value_col)).alias("_dq"),
    )
    delta = (
        minus.unionByName(plus)
        .groupBy("_g")
        .agg(
            F.sum("_dn").alias("_dn"),
            F.sum("_dv").alias("_dv"),
            F.sum("_dq").alias("_dq"),
        )
    )
    if stored_agg is not None:
        stored = stored_agg.select(
            F.col(group_col).alias("_g"),
            F.col("n_rows").alias("_n"),
            F.col("value_sum_exact").alias("_v"),
            F.col("value_sumsq_exact").alias("_q"),
        )
    else:
        stored = base.groupBy(F.col(group_col).alias("_g")).agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum(dec(F.col(value_col))).alias("_v"),
            F.sum(sq(F.col(value_col))).alias("_q"),
        )
    zero2 = F.lit(0).cast("decimal(18,2)")
    zero4 = F.lit(0).cast("decimal(38,4)")
    merged = stored.join(delta, "_g", "full_outer").select(
        F.col("_g").alias(group_col),
        (F.coalesce("_n", F.lit(0)) + F.coalesce("_dn", F.lit(0))).alias(
            "n_rows"
        ),
        (F.coalesce(F.col("_v"), zero2) + F.coalesce(F.col("_dv"), zero2))
        .alias("_sum"),
        (F.coalesce(F.col("_q"), zero4) + F.coalesce(F.col("_dq"), zero4))
        .alias("_sumsq"),
    )
    return merged.filter(F.col("n_rows") > 0).select(
        group_col,
        "n_rows",
        F.col("_sum").cast("decimal(18,2)").alias("value_sum_exact"),
        F.col("_sumsq").cast("decimal(38,4)").alias("value_sumsq_exact"),
    )

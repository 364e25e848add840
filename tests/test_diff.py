"""Snapshot-diff unit semantics and shuffle-width plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline_ine_spark.operators.diff import snapshot_diff


def _snap(spark, rows):
    return spark.createDataFrame(rows, "k int, a string, b double")


def test_diff_tags_all_three_kinds(spark):
    old = _snap(spark, [(1, "x", 1.0), (2, "y", 2.0), (3, "z", 3.0)])
    new = _snap(spark, [(1, "x", 1.0), (2, "y", 9.0), (4, "w", 4.0)])
    out = {r.k: r.change_type for r in snapshot_diff(old, new, ["k"]).collect()}
    assert out == {2: "changed", 3: "removed", 4: "added"}


def test_diff_null_vs_empty_and_concat_boundaries(spark):
    # ("a", None) vs ("aNone",) and ("a","b") vs ("ab",) must all differ
    old = _snap(spark, [(1, "a", None), (2, "a", 2.0)])
    new = _snap(spark, [(1, "aNone", None), (2, "a", 2.0)])
    out = {r.k: r.change_type for r in snapshot_diff(old, new, ["k"]).collect()}
    assert out == {1: "changed"}


def test_diff_identical_snapshots_empty(spark):
    old = _snap(spark, [(1, "x", 1.0)])
    assert snapshot_diff(old, old, ["k"]).count() == 0


def test_diff_shuffle_carries_fingerprint_not_columns(spark):
    old = _snap(spark, [(1, "x", 1.0)])
    new = _snap(spark, [(1, "x", 2.0)])
    plan = (
        snapshot_diff(old, new, ["k"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the wide columns must be hashed below the join: no raw compare
    # columns in the join output, fingerprints present
    assert "_fp_old" in plan and "_fp_new" in plan


def test_diff_composite_key_and_subset_columns(spark):
    old = spark.createDataFrame(
        [(1, 1, "x", 5.0)], "k1 int, k2 int, a string, b double"
    )
    new = spark.createDataFrame(
        [(1, 1, "x", 6.0)], "k1 int, k2 int, a string, b double"
    )
    # comparing only `a` ignores the b change
    assert snapshot_diff(old, new, ["k1", "k2"], compare_cols=["a"]).count() == 0
    out = snapshot_diff(old, new, ["k1", "k2"]).collect()
    assert [(r.k1, r.k2, r.change_type) for r in out] == [(1, 1, "changed")]


def test_ivm_handles_group_moves_and_zero_groups(spark):
    """Delta maintenance must equal recomputation including the two hard
    cases: an update that MOVES a row between groups, and a group whose
    last row is deleted (must vanish, not linger at n=0)."""
    from data_pipeline_ine_spark.operators.diff import (
        apply_changelog,
        maintain_group_aggregate,
    )
    from pyspark.sql import functions as F

    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 20.0), (3, "b", 30.0)],
        "k long, g string, v double",
    )
    changes = spark.createDataFrame(
        [
            (2, "c", 20.0, "U", 1),   # moves k=2 from group a to group c
            (3, "b", 30.0, "D", 1),   # deletes group b's only row
            (4, "a", 5.0, "I", 1),    # new row in group a
        ],
        "k long, g string, v double, op string, seq int",
    )
    got = {
        r.g: (r.n_rows, r.value_sum)
        for r in maintain_group_aggregate(
            base, changes, ["k"], "g", "v"
        ).collect()
    }
    # ground truth: recompute over the merged snapshot
    merged = apply_changelog(base, changes, ["k"], "seq", "op")
    want = {
        r.g: (r.n, r.s)
        for r in merged.groupBy("g")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("v").cast("decimal(18,2)")).cast("double"), 2).alias("s"),
        )
        .collect()
    }
    assert got == want == {"a": (2, 15.0), "c": (1, 20.0)}
    assert "b" not in got


def test_bucket_hash_diff_identical_tables_all_match(spark, sf_dir):
    from data_pipeline_ine_spark.operators.diff import bucket_hash_diff
    from data_pipeline_ine_spark.sources.registry import load_table

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus"
    )
    out = bucket_hash_diff(
        orders, orders, ["o_orderkey"], ["o_orderstatus"], n_buckets=32
    )
    assert out.filter(~F.col("bucket_match")).count() == 0


def test_bucket_hash_diff_localizes_single_mutation(spark, sf_dir):
    """Mutating ONE row must flip exactly one bucket (same row count both
    sides, so only the hash betrays it) — the property that makes
    bucket-granular re-scan cheap."""
    from data_pipeline_ine_spark.operators.diff import bucket_hash_diff
    from data_pipeline_ine_spark.sources.registry import load_table

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus"
    )
    key = orders.agg(F.min("o_orderkey")).collect()[0][0]
    mutated = orders.withColumn(
        "o_orderstatus",
        F.when(F.col("o_orderkey") == key, F.lit("MUTATED")).otherwise(
            F.col("o_orderstatus")
        ),
    )
    out = bucket_hash_diff(
        orders, mutated, ["o_orderkey"], ["o_orderstatus"], n_buckets=32
    ).collect()
    bad = [r for r in out if not r["bucket_match"]]
    assert len(bad) == 1
    assert bad[0]["left_rows"] == bad[0]["right_rows"]  # hash-only mismatch


def test_ivm_moments_chained_equals_recompute(spark):
    """Two successive changelogs applied through the stored-aggregate
    chain (the steady state) must equal a one-shot recompute over the
    final snapshot — count, sum, and sum-of-squares all exact."""
    from decimal import Decimal

    from data_pipeline_ine_spark.operators.diff import (
        apply_changelog,
        maintain_group_moments,
    )
    from pyspark.sql import functions as F

    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 20.0), (3, "b", 30.0), (4, "b", 7.5)],
        "k long, g string, v double",
    )
    c1 = spark.createDataFrame(
        [(2, "c", 20.0, "U", 1), (5, "a", 2.25, "I", 1)],
        "k long, g string, v double, op string, seq int",
    )
    c2 = spark.createDataFrame(
        [(3, "b", 30.0, "D", 1), (1, "a", 11.0, "U", 1)],
        "k long, g string, v double, op string, seq int",
    )
    s1_snap = apply_changelog(base, c1, ["k"], "seq", "op")
    agg1 = maintain_group_moments(base, c1, ["k"], "g", "v")
    # chained: second delta applied against snapshot-1 with stored agg
    agg2 = maintain_group_moments(
        s1_snap, c2, ["k"], "g", "v", stored_agg=agg1
    )
    final = apply_changelog(s1_snap, c2, ["k"], "seq", "op")
    want = {
        r.g: (r.n, r.s, r.q)
        for r in final.groupBy("g")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("v").cast("decimal(18,2)")).alias("s"),
            F.sum(
                (F.col("v").cast("decimal(18,2)")
                 * F.col("v").cast("decimal(18,2)")).cast("decimal(38,4)")
            ).alias("q"),
        )
        .collect()
    }
    got = {
        r.g: (r.n_rows, r.value_sum_exact, r.value_sumsq_exact)
        for r in agg2.collect()
    }
    assert got == want
    # spot-check one closed form: group a = {11.0, 2.25} (k=2 moved to
    # group c in changelog 1; k=1 updated 10 -> 11 in changelog 2)
    assert got["a"] == (
        2,
        Decimal("13.25"),
        Decimal("121.0000") + Decimal("5.0625"),
    )

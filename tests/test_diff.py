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

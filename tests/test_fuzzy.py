"""Blocked fuzzy matching: verify semantics, block recall bounds, and the
dictionary-not-corpus quadratic stage."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline_ine_spark.operators.fuzzy import fuzzy_match_pairs


def _df(spark, names):
    # duplicate every name: matching must collapse to distinct values first
    return spark.createDataFrame(
        [(n,) for n in names] * 2, "name string"
    )


def test_fuzzy_finds_typo_within_block(spark):
    df = _df(spark, ["red widget", "rad widget", "blue bolt"])
    out = fuzzy_match_pairs(df, "name", max_dist=2).collect()
    assert [(r.a_value, r.b_value, r.distance) for r in out] == [
        ("rad widget", "red widget", 1)
    ]


def test_fuzzy_distance_threshold_exact(spark):
    df = _df(spark, ["hot gear", "hit gear", "hat bear"])
    d1 = fuzzy_match_pairs(df, "name", max_dist=1).collect()
    assert {(r.a_value, r.b_value) for r in d1} == {("hit gear", "hot gear")}
    d2 = {(r.a_value, r.b_value) for r in fuzzy_match_pairs(df, "name", 2).collect()}
    assert ("hat bear", "hit gear") not in d2  # different block, never compared


def test_fuzzy_length_prefilter_is_sound(spark):
    # distance 2 but length diff 2: prefilter must NOT drop it
    df = _df(spark, ["ab gear", "abxy gear"])
    out = fuzzy_match_pairs(df, "name", max_dist=2).collect()
    assert len(out) == 1 and out[0].distance == 2


def test_fuzzy_pairs_once_despite_duplicates(spark):
    df = _df(spark, ["red bolt", "rex bolt"])
    # 2 copies of each row, but pairs come from the distinct dictionary
    assert fuzzy_match_pairs(df, "name", max_dist=1).count() == 1


def test_fuzzy_join_is_equi_on_block_key(spark):
    df = _df(spark, ["red bolt", "rex bolt", "red gear"])
    plan = (
        fuzzy_match_pairs(df, "name")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan, plan

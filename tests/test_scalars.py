"""Scalar function unit tests (SURVEY.md §2.7 F1/F2/F6) + the let_ binding."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from data_pipeline_ine_spark.functions.scalars import (
    let_,
    sanitize_name,
    strip_suffix,
    view_name,
)


def _one(spark, col):
    return spark.range(1).select(col.alias("x")).first()["x"]


def test_sanitize_name_reference_semantics(spark):
    # step1_scraper.py:50-54 — strip non-word chars, whitespace→_, truncate
    got = _one(spark, sanitize_name(F.lit("Cantidad de agua caída (mm)!")))
    assert got == "cantidad_de_agua_caída_mm"
    long = "x" * 150
    assert len(_one(spark, sanitize_name(F.lit(long)))) == 100


def test_strip_suffix_only_at_end(spark):
    assert _one(spark, strip_suffix(F.lit("temperatura.csv"))) == "temperatura"
    assert _one(spark, strip_suffix(F.lit("a.csv.bak"))) == "a.csv.bak"


def test_view_name_prefix(spark):
    assert _one(spark, view_name(F.lit("temperatura"))) == "v_temperatura"


def test_let_binds_value_once_semantically(spark):
    # value visible to body; structure = transform(array(v), f)[1]
    out = _one(spark, let_(F.lit(21), lambda v: v * 2))
    assert out == 42
    # arrays bind too (the motivating case)
    arr = let_(
        F.array(F.lit(3), F.lit(1), F.lit(2)),
        lambda a: F.array_max(a) * 10 + F.array_min(a),
    )
    assert _one(spark, arr) == 31


def test_pseudonymize_is_stable_and_join_preserving(spark):
    from data_pipeline_ine_spark.operators.text import pseudonymize

    df = spark.createDataFrame([(1,), (2,), (1,)], "user_id long")
    out = pseudonymize(df, "user_id")
    assert "user_id" not in out.columns
    vals = [r.pseudo_id for r in out.collect()]
    assert len(set(vals)) == 2          # same key -> same token
    out2 = [r.pseudo_id for r in pseudonymize(
        spark.createDataFrame([(1,)], "user_id long"), "user_id"
    ).collect()]
    assert out2[0] in vals              # stable across frames/runs

"""Gap fill / LOCF / NOCB unit semantics (contract parity covers the
oracle-checked query; these pin the operator edge cases on tiny frames)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from data_pipeline_ine_spark.operators.timeseries import gap_fill, locf, nocb


def _series(spark):
    d = dt.date
    rows = [
        ("a", d(2024, 1, 1), 1.0),
        ("a", d(2024, 1, 4), 4.0),
        ("b", d(2024, 1, 2), 2.0),
    ]
    return spark.createDataFrame(rows, "key string, day date, v double")


def test_gap_fill_densifies_each_key_span(spark):
    out = gap_fill(_series(spark), "key", "day").orderBy("key", "day").collect()
    a = [(r.day.day, r.v) for r in out if r.key == "a"]
    assert a == [(1, 1.0), (2, None), (3, None), (4, 4.0)]
    # single-observation key: span collapses to one row, no phantom dates
    assert [(r.day.day, r.v) for r in out if r.key == "b"] == [(2, 2.0)]


def test_locf_fills_forward_only(spark):
    dense = gap_fill(_series(spark), "key", "day")
    out = locf(dense, "key", "day", "v", "filled").orderBy("key", "day").collect()
    assert [r.filled for r in out if r.key == "a"] == [1.0, 1.0, 1.0, 4.0]


def test_locf_leading_nulls_stay_null(spark):
    d = dt.date
    df = spark.createDataFrame(
        [("a", d(2024, 1, 1), None), ("a", d(2024, 1, 2), 5.0)],
        "key string, day date, v double",
    )
    out = locf(df, "key", "day", "v", "filled").orderBy("day").collect()
    assert [r.filled for r in out] == [None, 5.0]


def test_nocb_fills_backward(spark):
    dense = gap_fill(_series(spark), "key", "day")
    out = nocb(dense, "key", "day", "v", "filled").orderBy("key", "day").collect()
    assert [r.filled for r in out if r.key == "a"] == [1.0, 4.0, 4.0, 4.0]


def test_gap_fill_hourly_step(spark):
    df = spark.createDataFrame(
        [("a", dt.datetime(2024, 1, 1, 0), 1.0), ("a", dt.datetime(2024, 1, 1, 3), 2.0)],
        "key string, hr timestamp, v double",
    )
    out = gap_fill(df, "key", "hr", step="interval 1 hour")
    assert out.count() == 4
    assert out.filter(F.col("v").isNull()).count() == 2

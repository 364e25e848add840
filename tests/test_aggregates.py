"""Aggregate operators: the HLL scale path must track exact distincts."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_pipeline_ine_spark.operators.aggregates import distinct_count
from data_pipeline_ine_spark.sources.registry import load_table


def test_approx_count_distinct_tracks_exact(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    exact = distinct_count(ev, "user_id").first()[0]
    approx = distinct_count(ev, "user_id", approx=True).first()[0]
    # HLL++ default rsd is 5%; the 100 TB path must stay within it
    assert abs(approx - exact) <= max(1, 0.05 * exact), (approx, exact)


def test_union_by_name_widen_resolves_drifted_schemas(spark):
    """Batches with drifted schemas union losslessly: ints widen to
    long, int+double -> double, decimal precisions merge, type
    conflicts fall back to string, and late columns NULL-fill."""
    from decimal import Decimal

    from data_pipeline_ine_spark.operators.setops import union_by_name_widen

    day1 = spark.createDataFrame(
        [(1, 10, 1.5, Decimal("12.34"), 7)],
        "id int, a int, b double, c decimal(10,2), mixed int",
    )
    day2 = spark.createDataFrame(
        [(2**40, 20, 3, Decimal("1.234"), "seven", "new")],
        "id long, a int, b int, c decimal(10,3), mixed string, extra string",
    )
    out = union_by_name_widen([day1, day2])
    t = dict((f.name, f.dataType.simpleString()) for f in out.schema.fields)
    assert t == {
        "id": "bigint", "a": "int", "b": "double",
        "c": "decimal(11,3)", "mixed": "string", "extra": "string",
    }
    rows = {r["id"]: r for r in out.collect()}
    assert rows[1]["extra"] is None
    assert rows[1]["c"] == Decimal("12.340")
    assert rows[2**40]["mixed"] == "seven"
    assert float(rows[2**40]["b"]) == 3.0


def test_union_by_name_widen_no_shuffle(spark):
    """Schema conformance is casts in the scan stage — the plan has no
    Exchange."""
    from data_pipeline_ine_spark.operators.setops import union_by_name_widen

    a = spark.range(10).selectExpr("CAST(id AS INT) AS k")
    b = spark.range(10).selectExpr("id AS k")
    plan = (
        union_by_name_widen([a, b])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_mode_per_group_deterministic_tiebreak(spark):
    """Equal counts must resolve to the SMALLEST value — a total order,
    not whichever partition answered first."""
    from data_pipeline_ine_spark.operators.aggregates import mode_per_group

    df = spark.createDataFrame(
        [(1, "b"), (1, "b"), (1, "a"), (1, "a"), (2, "z")],
        "g int, v string",
    )
    got = {
        r.g: (r.modal_v, r.n_modal)
        for r in mode_per_group(df, ["g"], "v").collect()
    }
    assert got == {1: ("a", 2), 2: ("z", 1)}

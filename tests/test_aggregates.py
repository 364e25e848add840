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

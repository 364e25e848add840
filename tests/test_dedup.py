"""Connected-components unit tests: pointer-jumping convergence on
high-diameter graphs and loud failure when the iteration budget is too
small (silent wrong clusters are the failure mode ADVICE r1 flagged)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_pipeline_ine_spark.operators.dedup import dedup_components


def _pairs(spark, edges):
    return spark.createDataFrame(edges, "a_id long, b_id long")


def test_components_transitive_closure(spark):
    # two chains and a singleton pair: {1,2,3,4}, {10,11}, {20,21}
    got = dedup_components(
        _pairs(spark, [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21)])
    )
    comp = {r.doc_id: r.component for r in got.collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20}


def test_components_high_diameter_converges_logarithmically(spark):
    # a 200-node path has diameter 199: one-hop propagation alone would
    # need ~199 rounds; pointer jumping must finish well inside 10
    n = 200
    got = dedup_components(_pairs(spark, [(i, i + 1) for i in range(n)]))
    rows = got.collect()
    assert len(rows) == n + 1
    assert {r.component for r in rows} == {0}


def test_components_raises_when_budget_too_small(spark):
    with pytest.raises(RuntimeError, match="fixpoint"):
        dedup_components(
            _pairs(spark, [(i, i + 1) for i in range(200)]), max_iters=2
        )

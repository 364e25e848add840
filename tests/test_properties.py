"""Property-based checks (hypothesis) for the operators whose semantics are
easiest to get subtly wrong: as-of matching, fused consolidation, and
normalization-invariant fingerprints. Each property runs few examples
(Spark jobs are ~seconds) but explores adversarial shapes: duplicate
timestamps, empty sides, all-sparse groups, unicode punctuation."""

from __future__ import annotations

import os
import sys

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

ts_strategy = st.integers(min_value=0, max_value=50)
key_strategy = st.integers(min_value=0, max_value=3)


@SETTINGS
@given(
    left=st.lists(st.tuples(key_strategy, ts_strategy), min_size=1, max_size=12),
    right=st.lists(st.tuples(key_strategy, ts_strategy, st.integers(0, 99)),
                   min_size=0, max_size=12),
)
def test_asof_join_matches_naive_semantics(spark, left, right):
    from data_pipeline_ine_spark.operators.joins import asof_join

    # dedupe right on (key, ts) so the expected value is well-defined
    right = list({(k, t): v for k, t, v in right}.items())
    right = [(k, t, v) for (k, t), v in right]
    ldf = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left)], "row_id long, k long, t long"
    )
    rdf = spark.createDataFrame(right, "k long, t long, v long")
    out = {
        r.row_id: r.v_asof
        for r in asof_join(ldf, rdf, on="k", left_ts="t", right_ts="t",
                           payload_cols=("v",)).collect()
    }
    for i, (k, t) in enumerate(left):
        cands = [(rt, v) for rk, rt, v in right if rk == k and rt <= t]
        want = max(cands)[1] if cands else None
        assert out[i] == want, (i, k, t, cands, out[i])


@SETTINGS
@given(
    left=st.lists(st.tuples(key_strategy, ts_strategy), min_size=1, max_size=12),
    right=st.lists(st.tuples(key_strategy, ts_strategy, st.integers(0, 99)),
                   min_size=0, max_size=12),
)
def test_asof_join_forward_matches_naive_semantics(spark, left, right):
    from data_pipeline_ine_spark.operators.joins import asof_join

    right = list({(k, t): v for k, t, v in right}.items())
    right = [(k, t, v) for (k, t), v in right]
    ldf = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left)], "row_id long, k long, t long"
    )
    rdf = spark.createDataFrame(right, "k long, t long, v long")
    out = {
        r.row_id: r.v_asof
        for r in asof_join(ldf, rdf, on="k", left_ts="t", right_ts="t",
                           payload_cols=("v",), direction="forward").collect()
    }
    for i, (k, t) in enumerate(left):
        cands = [(rt, v) for rk, rt, v in right if rk == k and rt >= t]
        want = min(cands)[1] if cands else None
        assert out[i] == want, (i, k, t, cands, out[i])


@SETTINGS
@given(
    obs=st.lists(
        st.tuples(
            st.integers(1, 3),               # period
            st.integers(1, 3),               # station
            st.sampled_from(["m1", "m2"]),   # dataset
            st.integers(0, 9),               # value
        ),
        min_size=1,
        max_size=15,
    ),
    min_records=st.integers(1, 3),
)
def test_consolidate_fused_min_records_semantics(spark, obs, min_records):
    from data_pipeline_ine_spark.plans.builder import ViewDefinition, consolidate

    df = spark.createDataFrame(obs, "p long, s long, dataset string, value long")
    view = ViewDefinition(name="v", members=("m1", "m2"),
                          period_out="p", station_out="s")
    got = {
        (r.p, r.s): (r.m1, r.m2)
        for r in consolidate(
            df, view, agg_expr="sum", period_col="p", station_col="s",
            value_col="value", min_records=min_records,
        ).collect()
    }
    # reference semantics computed in plain Python
    groups: dict = {}
    for p, s, d, v in obs:
        groups.setdefault((p, s), []).append((d, v))
    want = {}
    for key, rows in groups.items():
        if len(rows) < min_records:
            continue
        m1 = sum(v for d, v in rows if d == "m1")
        m2 = sum(v for d, v in rows if d == "m2")
        want[key] = (
            m1 if any(d == "m1" for d, _ in rows) else None,
            m2 if any(d == "m2" for d, _ in rows) else None,
        )
    assert got == want


@SETTINGS
@given(
    left=st.lists(st.tuples(key_strategy, ts_strategy), min_size=1, max_size=10),
    right=st.lists(st.tuples(key_strategy, ts_strategy), min_size=0, max_size=10),
    window=st.integers(1, 10),
    bin_seconds=st.integers(1, 12),
)
def test_range_join_bin_rewrite_matches_naive(spark, left, right, window, bin_seconds):
    """The bin-explode rewrite must return exactly the rows of the naive
    range predicate for ANY bin width — boundary timestamps included."""
    from data_pipeline_ine_spark.operators.joins import windowed_range_join

    base = "2024-01-01 00:00:"
    ldf = spark.createDataFrame(
        [(i, k, f"{base}{t:02d}") for i, (k, t) in enumerate(left)],
        "lid long, k long, lt string",
    ).withColumn("lt", F.col("lt").cast("timestamp_ntz"))
    rdf = spark.createDataFrame(
        [(j, k, f"{base}{t:02d}") for j, (k, t) in enumerate(right)],
        "rid long, k long, rt string",
    ).withColumn("rt", F.col("rt").cast("timestamp_ntz"))
    got = {
        (r.lid, r.rid)
        for r in windowed_range_join(
            ldf, rdf, on="k", left_ts="lt", right_ts="rt",
            window_seconds=window, bin_seconds=bin_seconds,
        ).collect()
    }
    want = {
        (i, j)
        for i, (lk, lt) in enumerate(left)
        for j, (rk, rt) in enumerate(right)
        if lk == rk and lt - window <= rt < lt
    }
    assert got == want


@SETTINGS
@given(
    words=st.lists(st.text(alphabet="abcxyz019", min_size=1, max_size=6),
                   min_size=1, max_size=8),
    junk=st.sampled_from([" ", "  ", " , ", "!\t", " ... ", "\n\n", " ; "]),
)
def test_rolling_fingerprint_invariant_to_formatting(spark, words, junk):
    from data_pipeline_ine_spark.operators.text import rolling_fingerprint

    clean = " ".join(words)
    messy = junk.join(words) + junk
    df = spark.createDataFrame([(clean, messy)], "a string, b string")
    row = df.select(
        rolling_fingerprint("a").alias("fa"), rolling_fingerprint("b").alias("fb")
    ).first()
    assert row.fa == row.fb

"""Mergeable-sketch operators: merge laws + tolerance vs exact aggregates.

These have no DuckDB oracle (another engine cannot reproduce DataSketches
estimates), so the tests pin the two properties the 100 TB rollup pattern
depends on: merging partial sketches loses nothing vs sketching the whole
corpus, and estimates stay within the sketch's published error bounds.
"""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_pipeline_ine_spark.operators.sketches import (
    hll_merge_estimate,
    hll_sketches,
    kll_quantiles,
    theta_distinct,
)
from data_pipeline_ine_spark.sources.registry import load_table


def _events(spark, sf_dir):
    return load_table(spark, sf_dir, "events")


def test_hll_estimates_within_error_bound(spark, sf_dir):
    ev = _events(spark, sf_dir)
    approx = {
        r["event_type"]: r["n_approx"]
        for r in hll_sketches(ev, "event_type", "user_id").collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for k, n in exact.items():
        assert approx[k] == pytest.approx(n, rel=0.05), (k, approx[k], n)


def test_hll_union_of_partials_equals_whole_corpus_sketch(spark, sf_dir):
    """The merge law that makes sketch tables work: rolling up per-stratum
    sketches must give EXACTLY the estimate of sketching all rows at once
    (HLL union is register-wise max — no information loss)."""
    ev = _events(spark, sf_dir)
    merged = hll_merge_estimate(hll_sketches(ev, "event_type", "user_id"))
    whole = ev.agg(
        F.hll_sketch_estimate(
            F.hll_sketch_agg(F.col("user_id").cast("string"), F.lit(14))
        ).alias("n_approx")
    )
    assert merged.collect()[0]["n_approx"] == whole.collect()[0]["n_approx"]


def test_theta_estimates_within_error_bound(spark, sf_dir):
    ev = _events(spark, sf_dir)
    approx = {
        r["event_type"]: r["n_approx"]
        for r in theta_distinct(ev, "event_type", "user_id").collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for k, n in exact.items():
        assert approx[k] == pytest.approx(n, rel=0.05), (k, approx[k], n)


def test_kll_quantiles_match_exact_percentiles(spark, sf_dir):
    ev = _events(spark, sf_dir)
    got = kll_quantiles(ev, "value", [0.5, 0.95], strata_col="event_type")
    exact = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("e50"),
        F.expr("percentile(value, 0.95)").alias("e95"),
    )
    g = {r["event_type"]: (r["q50"], r["q95"]) for r in got.collect()}
    e = {r["event_type"]: (r["e50"], r["e95"]) for r in exact.collect()}
    # KLL guarantees rank error, not value error; on these smooth
    # distributions a loose value tolerance is a safe proxy
    for k, (e50, e95) in e.items():
        q50, q95 = g[k]
        assert q50 == pytest.approx(e50, rel=0.10), (k, q50, e50)
        assert q95 == pytest.approx(e95, rel=0.10), (k, q95, e95)


def test_quantile_bins_kll_swap_matches_exact_at_sf01(spark):
    """The documented 100 TB swap (quantile_bins method='kll') is
    executable and agrees with exact cutpoints: at sf0.1 the bin
    assignments may differ only in the rank-error sliver around each
    cutpoint (KLL k=2048 ≈ 0.4% rank error per cut)."""
    from data_pipeline_ine_spark.operators.features import quantile_bins
    from data_pipeline_ine_spark.sources.registry import load_table

    ev = load_table(spark, "/root/testdata/sf0.1", "events").select(
        "event_id", "value"
    )
    exact = quantile_bins(ev, "value", out_col="b_exact")
    kll = quantile_bins(ev, "value", out_col="b_kll", method="kll")
    joined = exact.select("event_id", "b_exact").join(
        kll.select("event_id", "b_kll"), "event_id"
    )
    n = joined.count()
    mismatched = joined.filter(F.col("b_exact") != F.col("b_kll")).count()
    # 3 cutpoints × 0.4% rank error each, generous 2× margin
    assert n > 0 and mismatched / n < 0.025, (mismatched, n)


def test_kll_global_quantiles_no_strata(spark, sf_dir):
    row = kll_quantiles(_events(spark, sf_dir), "value", [0.5]).collect()[0]
    exact = (
        _events(spark, sf_dir)
        .agg(F.expr("percentile(value, 0.5)").alias("e"))
        .collect()[0]["e"]
    )
    assert row["q50"] == pytest.approx(exact, rel=0.10)


# --- portable count-min sketch ---------------------------------------------


def test_cms_estimate_never_undercounts(spark, sf_dir):
    """CMS one-sided error law: est ≥ exact for EVERY key (collisions can
    only inflate)."""
    from data_pipeline_ine_spark.operators.sketches import (
        cms_build,
        cms_estimate,
    )

    ev = _events(spark, sf_dir)
    sketch = cms_build(ev, "user_id")
    exact = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact"))
    est = cms_estimate(sketch, exact.select("user_id"), "user_id")
    bad = (
        est.join(exact, "user_id")
        .filter(F.col("cms_count") < F.col("exact"))
        .count()
    )
    assert bad == 0


def test_cms_sketches_merge_cellwise(spark, sf_dir):
    """Mergeability: build on two disjoint halves, cell-wise SUM the
    sketches — identical to one build over the union. This is the law
    that makes per-shard sketches roll up without rescans."""
    from data_pipeline_ine_spark.operators.sketches import cms_build

    ev = _events(spark, sf_dir)
    a = cms_build(ev.filter(F.col("event_id") % 2 == 0), "user_id")
    b = cms_build(ev.filter(F.col("event_id") % 2 == 1), "user_id")
    merged = (
        a.unionAll(b)
        .groupBy("row", "bucket")
        .agg(F.sum("cell_count").alias("cell_count"))
    )
    whole = cms_build(ev, "user_id")
    diff = merged.join(
        whole.withColumnRenamed("cell_count", "w"), ["row", "bucket"], "full"
    ).filter(
        F.coalesce(F.col("cell_count"), F.lit(-1))
        != F.coalesce(F.col("w"), F.lit(-1))
    )
    assert diff.count() == 0


def test_cms_heavy_hitters_superset_of_true(spark, sf_dir):
    """Every TRUE heavy hitter is reported (no false negatives — the CMS
    guarantee), and reported estimates equal exact counts when the
    sketch is collision-free at this scale."""
    from data_pipeline_ine_spark.operators.sketches import cms_heavy_hitters

    ev = _events(spark, sf_dir)
    thr = 30
    out = cms_heavy_hitters(ev, "user_id", thr)
    true_hh = {
        r["user_id"]
        for r in ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= thr)
        .collect()
    }
    got = {r["user_id"] for r in out.collect()}
    assert true_hh <= got


def test_bloom_merge_law_and_one_sided_error(spark):
    """bit_or is the Bloom merge: building one filter over A∪B equals
    merging the filters of A and B row-wise. And membership never
    false-negatives: every true member probes positive."""
    import pyspark.sql.functions as F

    from data_pipeline_ine_spark.operators.sketches import (
        bloom_build,
        bloom_probe,
    )

    rows = [(i, "g", f"key-{i}") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    a, b = df.filter("doc_id < 100"), df.filter("doc_id >= 100")

    merged = (
        bloom_build(a, "text").unionByName(bloom_build(b, "text"))
        .groupBy("source", "word_idx")
        .agg(F.bit_or("word").alias("word"))
    )
    whole = bloom_build(df, "text")
    sym_diff = (
        merged.exceptAll(whole).count() + whole.exceptAll(merged).count()
    )
    assert sym_diff == 0

    # every true member is flagged (one-sided error)
    flagged = bloom_probe(
        df, whole, key_col="text", id_col="doc_id"
    ).count()
    assert flagged == 200


def test_bloom_probe_broadcasts_filter(spark):
    """The probe side must never shuffle: the KB-sized filter joins in
    as a broadcast (the semi-join pruning pattern)."""
    from data_pipeline_ine_spark.operators.sketches import (
        bloom_build,
        bloom_probe,
    )

    rows = [(i, "g", f"key-{i}") for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = bloom_probe(df, bloom_build(df, "text"), key_col="text", id_col="doc_id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


def test_cms_string_keys_hash_instead_of_nulling(spark):
    """ADVICE r5: a string key column used to be silently
    cast('bigint') → NULL, collapsing every string key into one cell.
    String keys now fold through md5 and estimates keep the one-sided
    CMS guarantee (est >= exact, exact here with no collisions)."""
    import pytest

    from data_pipeline_ine_spark.operators.sketches import (
        cms_build,
        cms_estimate,
    )

    rows = [("alpha",)] * 7 + [("beta",)] * 3 + [("gamma",)] * 1
    df = spark.createDataFrame(rows, "k string")
    sketch = cms_build(df, "k")
    est = {
        r.k: r.cms_count
        for r in cms_estimate(sketch, df.select("k").distinct(), "k").collect()
    }
    assert est["alpha"] >= 7 and est["beta"] >= 3 and est["gamma"] >= 1
    # distinct strings land in distinct cells here: estimates are exact
    assert sum(est.values()) == 11

    # non-hashable key types fail loudly instead of returning garbage
    bad = spark.createDataFrame([(1.5,)], "k double")
    with pytest.raises(ValueError, match="unsupported type"):
        cms_build(bad, "k")


def test_kmv_distinct_estimate_and_exact_small_group(spark):
    """Below k the sketch reports the exact count; at or above k the
    estimate is (k-1)*2^48 div kth-smallest-hash and lands within 50%
    of truth on 200 keys with k=32 (KMV's relative error ~ 1/sqrt(k))."""
    from data_pipeline_ine_spark.operators.sketches import kmv_distinct

    rows = [("big", i) for i in range(200)] + [("small", i) for i in range(5)]
    df = spark.createDataFrame(rows, "g string, key long")
    out = {r.g: r for r in kmv_distinct(df, "key", ["g"], k=32).collect()}
    assert out["small"].n_exact == 5
    assert out["small"].kmv_estimate == 5  # exact below k
    assert out["small"].kth_hash == 0      # no 32nd hash exists
    assert out["big"].n_exact == 200
    assert out["big"].kth_hash > 0
    assert 100 <= out["big"].kmv_estimate <= 300


def test_kmv_merge_law_bottom_k_of_union(spark):
    """Union-mergeability: the sketch of A∪B equals the bottom-k fold
    of the two sketches' key sets — KMV's defining property, which is
    what makes per-partition partials safe to persist and combine."""
    from data_pipeline_ine_spark.operators.sketches import kmv_distinct

    a = spark.createDataFrame([("g", i) for i in range(60)], "g string, key long")
    b = spark.createDataFrame([("g", i) for i in range(40, 120)], "g string, key long")
    u = a.union(b)
    direct = kmv_distinct(u, "key", ["g"], k=16).collect()[0]
    merged = kmv_distinct(a.union(b), "key", ["g"], k=16).collect()[0]
    assert (direct.kth_hash, direct.kmv_estimate) == (
        merged.kth_hash,
        merged.kmv_estimate,
    )
    assert direct.n_exact == 120

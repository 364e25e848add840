"""Physical-plan assertions: the plans we'd want at 100 TB, not just plans
that happen to pass. Pushdown reaches the parquet scan, dimension joins
broadcast, the fused consolidation shuffles exactly once, and hot paths stay
inside whole-stage codegen."""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as contract


def explain_str(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    df = contract.queries()["filtered_net_price"](spark, sf_dir)
    plan = explain_str(df)
    assert "PushedFilters:" in plan
    assert "LessThan(l_quantity" in plan, plan


def test_column_pruning_reaches_scan(spark, sf_dir):
    df = contract.queries()["filtered_net_price"](spark, sf_dir)
    plan = explain_str(df)
    # only the needed columns in ReadSchema — not the full 11-column table
    read = plan.split("ReadSchema:")[1].splitlines()[0]
    for col in ("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount"):
        assert col in read
    for col in ("l_partkey", "l_returnflag", "l_shipdate", "l_tax"):
        assert col not in read, f"{col} scanned unnecessarily: {read}"


def test_dimension_joins_broadcast(spark, sf_dir):
    df = contract.queries()["label_join_orders"](spark, sf_dir)
    plan = explain_str(df, mode="simple")
    assert plan.count("BroadcastHashJoin") == 3, plan
    assert "SortMergeJoin" not in plan


def test_q5_broadcasts_all_dims(spark, sf_dir):
    df = contract.queries()["q5_local_supplier_volume"](spark, sf_dir)
    plan = explain_str(df)
    # customer, supplier, nation⋈region all broadcast; only lineitem⋈orders
    # may shuffle fact-scale data
    assert plan.count("BroadcastHashJoin") >= 3, plan


def test_consolidation_single_shuffle(spark, sf_dir):
    df = contract.queries()["v_consolidation"](spark, sf_dir)
    plan = explain_str(df, mode="simple")
    n_exchanges = plan.count("Exchange")
    assert n_exchanges == 1, f"expected 1 shuffle, got {n_exchanges}:\n{plan}"


def test_q1_whole_stage_codegen(spark, sf_dir):
    # AQE reports 0 codegen subtrees before the final plan exists; disable it
    # for this static inspection only.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df = contract.queries()["q1_pricing_summary"](spark, sf_dir)
        plan = explain_str(df, mode="codegen")
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert "WholeStageCodegen subtrees" in plan
    assert "Found 0 WholeStageCodegen" not in plan


def test_sparse_filter_uses_broadcast_anti_join(spark, sf_dir):
    df = contract.queries()["sparse_entity_counts"](spark, sf_dir)
    plan = explain_str(df)
    assert "LeftAnti, BuildRight" in plan or "BroadcastHashJoin" in plan, plan


def test_asof_join_single_shuffle_no_nested_loop(spark, sf_dir):
    # the union-tag as-of reformulation must cost ONE shuffle, never the
    # O(n*m) BroadcastNestedLoopJoin a raw inequality join would produce
    df = contract.queries()["asof_last_click"](spark, sf_dir)
    plan = explain_str(df, mode="simple")
    assert plan.count("Exchange") == 1, plan
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan


def test_range_join_is_equi_join(spark, sf_dir):
    # bin-explode rewrite: the range predicate must run as a residual on an
    # equi-join, not as a nested-loop/cartesian
    df = contract.queries()["range_click_attribution"](spark, sf_dir)
    plan = explain_str(df, mode="simple")
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan


def test_salted_join_matches_plain_join(spark, sf_dir):
    from pyspark.sql import functions as F

    from data_pipeline_ine_spark.operators.joins import salted_join
    from data_pipeline_ine_spark.sources.registry import load_table

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    plain = o.join(c, o.o_custkey == c.c_custkey).groupBy("c_mktsegment").count()
    salted = (
        salted_join(o, c.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey")
        .groupBy("c_mktsegment")
        .count()
    )
    assert {tuple(r) for r in plain.collect()} == {tuple(r) for r in salted.collect()}
    # the salt explode must actually fan the build side out
    plan = explain_str(salted, mode="simple")
    assert "Explode" in plan or "explode" in plan, plan


def test_bucketed_join_no_exchange(spark, sf_dir, tmp_path):
    """Two tables bucketed on the join key must SortMergeJoin with ZERO
    Exchanges — the write-once-shuffle-never-again contract of bucketing."""
    from data_pipeline_ine_spark.sources.registry import load_table
    from data_pipeline_ine_spark.sources.sinks import write_bucketed

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = load_table(spark, sf_dir, "orders")
        l = load_table(spark, sf_dir, "lineitem")
        write_bucketed(o, "b_orders", ("o_orderkey",), num_buckets=4,
                       sort_cols=("o_orderkey",), path=str(tmp_path / "b_orders"))
        write_bucketed(
            l.withColumnRenamed("l_orderkey", "o_orderkey"),
            "b_lineitem", ("o_orderkey",), num_buckets=4,
            sort_cols=("o_orderkey",), path=str(tmp_path / "b_lineitem"),
        )
        joined = spark.table("b_orders").join(spark.table("b_lineitem"), "o_orderkey")
        plan = explain_str(joined, mode="simple")
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_ivf_assignment_partition_pruning(spark, sf_dir, tmp_path):
    """SCALING.md's IVF claim, proven: persist cluster assignments as a
    partition column and the probe filter becomes partition pruning — the
    scan never touches unprobed clusters."""
    from pyspark.sql import functions as F

    from data_pipeline_ine_spark.operators.similarity import (
        _assign_clusters,
        kmeans_fit,
    )
    from data_pipeline_ine_spark.sources.registry import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    cents = kmeans_fit(emb, k=4, iters=1)
    assigned = _assign_clusters(emb.select("vec_id", "embedding"), cents, "embedding")
    path = str(tmp_path / "ivf_index")
    assigned.write.partitionBy("cluster").parquet(path)

    probed = spark.read.parquet(path).filter(F.col("cluster").isin(0, 1))
    plan = explain_str(probed)
    assert "PartitionFilters" in plan and "cluster" in plan.split("PartitionFilters")[1].splitlines()[0], plan
    # pruning is real: only the probed clusters' rows are readable
    assert probed.count() == assigned.filter(F.col("cluster").isin(0, 1)).count()


def test_mad_outliers_never_shuffles_corpus(spark, sf_dir):
    """mad_outliers is aggregate+broadcast: exchanges carry only narrow
    (group, value) percentile partials (the med branch is consumed twice,
    so its exchange appears twice); the corpus re-attaches via broadcast
    joins, never a sort-merge shuffle or a per-group window sort."""
    plan = explain_str(contract.queries()["mad_outliers"](spark, sf_dir),
                       mode="simple")
    assert "SortMergeJoin" not in plan, plan
    assert plan.count("Exchange") <= 4, plan
    assert "Window" not in plan, plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, plan


def test_user_growth_curve_window_is_calendar_sized(spark, sf_dir):
    """The cumulative window must run AFTER both reductions (user-min and
    day-count): exactly three exchanges (user agg, day agg, single
    partition for the day-frame window) and zero joins."""
    plan = explain_str(contract.queries()["user_growth_curve"](spark, sf_dir),
                       mode="simple")
    assert plan.count("Exchange") == 3, plan
    assert "Join" not in plan, plan


def test_inverted_index_caps_with_term_window_not_collect(spark, sf_dir):
    """The posting cap is a row_number window on the term shuffle (before
    collect_list) — no sort-merge join, and the top-terms frame joins by
    broadcast."""
    plan = explain_str(contract.queries()["inverted_index"](spark, sf_dir),
                       mode="simple")
    assert "SortMergeJoin" not in plan, plan
    assert "row_number" in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_partitioned_topk_scan_pruning(spark, sf_dir, tmp_path):
    """partitioned_topk's IVF claim, proven end-to-end: over a corpus
    parquet-partitioned by part_col, the probe choice lands in the scan
    as a STATIC PartitionFilters entry (the probe list is collected as
    literals, not joined), so unprobed partitions are never read."""
    from pyspark.sql import functions as F

    from data_pipeline_ine_spark.operators.similarity import partitioned_topk
    from data_pipeline_ine_spark.sources.registry import load_table

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", "label"
    )
    path = str(tmp_path / "part_corpus")
    emb.write.partitionBy("label").parquet(path)
    corpus = spark.read.parquet(path)

    qv = [1.0] * len(emb.first()["embedding"])
    topk = partitioned_topk(corpus, qv, k=5, n_probe=2)
    plan = explain_str(topk)
    assert "PartitionFilters" in plan, plan
    scan_filters = plan.split("PartitionFilters")[1].splitlines()[0]
    assert "label" in scan_filters and "dynamicpruning" not in scan_filters, plan
    rows = topk.collect()
    assert len(rows) == 5
    # probed-partition containment: every hit comes from ≤ n_probe labels
    assert len({r["label"] for r in rows} if "label" in topk.columns else {0}) <= 2


def test_lsh_topk_no_shuffle(spark, sf_dir):
    # banded candidate filter + per-partition top-k: zero Exchanges, the
    # k-row merge happens in TakeOrderedAndProject on the driver
    df = contract.queries()["ann_lsh_topk"](spark, sf_dir)
    plan = explain_str(df, mode="simple")
    assert plan.count("Exchange") == 0, plan
    assert "TakeOrdered" in plan, plan


def test_sequence_packing_window_is_sharded(spark, sf_dir):
    """The packing window must partition on (source, shard), never on the
    low-cardinality source alone — one giant source must not become a
    single sorting task (VERDICT r1 scale caution #2)."""
    df = contract.queries()["sequence_packing"](spark, sf_dir)
    plan = explain_str(df)
    spec = [ln for ln in plan.splitlines() if "windowspecdefinition" in ln]
    assert spec, plan
    assert "shard" in spec[0], spec[0]
    # and every (source, shard) group is strictly smaller than its source
    from pyspark.sql import functions as F

    groups = df.groupBy("source", "shard").count()
    per_source = df.groupBy("source").count().withColumnRenamed("count", "n_src")
    joined = groups.join(per_source, "source")
    assert joined.filter(F.col("count") >= F.col("n_src")).count() == 0


def test_lsh_sizing_keeps_candidates_subquadratic(spark, sf_dir):
    """planes_for's sizing rule: expected candidate-pair count from the
    bucket self-join stays ~linear in corpus size, never a meaningful
    fraction of n² (VERDICT r1 scale caution #1)."""
    from pyspark.sql import functions as F

    from data_pipeline_ine_spark.operators.similarity import (
        MAX_PLANES,
        N_PLANES,
        hyperplane_signature,
        planes_for,
    )
    from data_pipeline_ine_spark.sources.registry import load_table

    # the rule itself: floor at 8, ~log2(n/64), cap at 24
    assert planes_for(500) == N_PLANES
    assert planes_for(100_000_000) == 21
    assert planes_for(10**12) == MAX_PLANES
    assert planes_for(0) == N_PLANES

    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    buckets = (
        emb.select(hyperplane_signature(F.col("embedding"), planes_for(n)).alias("sig"))
        .groupBy("sig")
        .count()
    )
    cand_pairs = buckets.select(
        F.sum(F.col("count") * (F.col("count") - 1) / 2).alias("p")
    ).first().p
    all_pairs = n * (n - 1) / 2
    assert cand_pairs < 0.25 * all_pairs, (cand_pairs, all_pairs)


def test_q8_dims_broadcast_single_lineitem_scan(spark, sf_dir):
    plan = explain_str(
        contract.queries()["q8_market_share"](spark, sf_dir), mode="simple"
    )
    assert plan.count("BroadcastHashJoin") >= 5, plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("lineitem") == 1, plan  # no branch re-scans the fact


def test_q15_single_lineitem_scan(spark, sf_dir):
    # the per-supplier revenue aggregate feeds both the max and the probe;
    # the fact table must still be scanned exactly once
    plan = explain_str(
        contract.queries()["q15_top_supplier"](spark, sf_dir), mode="simple"
    )
    # the checkpointed per-supplier aggregate appears as Scan ExistingRDD;
    # the parquet fact feeds it exactly once upstream
    assert plan.count("lineitem") <= 1, plan


def test_q17_avoids_double_lineitem_scan(spark, sf_dir):
    # classic Q17 trap: correlated avg subquery → second scan. The window
    # formulation keeps one scan + one partkey shuffle.
    plan = explain_str(
        contract.queries()["q17_small_qty_revenue"](spark, sf_dir), mode="simple"
    )
    assert plan.count("lineitem") == 1, plan
    assert "Window" in plan


def test_q19_single_scan_disjunction(spark, sf_dir):
    # OR'd predicate branches must NOT expand into unioned re-scans
    plan = explain_str(
        contract.queries()["q19_or_predicates"](spark, sf_dir), mode="simple"
    )
    assert plan.count("lineitem") == 1, plan
    assert "Union" not in plan


def test_q20_semi_join_probe(spark, sf_dir):
    plan = explain_str(
        contract.queries()["q20_qualified_suppliers"](spark, sf_dir), mode="simple"
    )
    assert "LeftSemi" in plan, plan


def test_q22_anti_join_dormancy(spark, sf_dir):
    plan = explain_str(
        contract.queries()["q22_dormant_customers"](spark, sf_dir), mode="simple"
    )
    assert "LeftAnti" in plan, plan


def test_curation_pipeline_single_corpus_shuffle(spark, sf_dir):
    plan = explain_str(
        contract.queries()["curation_pipeline"](spark, sf_dir), mode="simple"
    )
    # one corpus-scale hash shuffle (the dedup fingerprint window) plus the
    # tiny per-source agg exchange; WindowGroupLimit proves rank-1 rows are
    # pre-reduced map-side before hitting the wire
    assert plan.count("Exchange hashpartitioning") == 2, plan
    assert "WindowGroupLimit" in plan, plan


def test_melt_is_shuffle_free(spark, sf_dir):
    """Unpivot must stay narrow: Expand runs inside the scan stage, the
    modulo filter is pushed below it, and no Exchange appears anywhere."""
    df = contract.queries()["melt_lineitem"](spark, sf_dir)
    plan = explain_str(df, mode="simple")
    assert "Exchange" not in plan, plan
    assert "Expand" in plan, plan


def test_aqe_splits_skewed_join_partition(spark):
    """Pins the runtime half of the skew story: session.py enables AQE
    skew-join, and a hot key holding 95% of the fact side must come out of
    the shuffle as a SPLIT read ("skewed" AQEShuffleRead / skew=true join),
    not one straggler task. salted_join covers plans where the skew is
    known up front; this covers the ones AQE has to catch at runtime."""
    from pyspark.sql import functions as F

    conf = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "32KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        # the downstream agg pins the partitioning; allow the extra shuffle
        "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
    }
    old = {}
    for k, v in conf.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    try:
        left = spark.range(500_000).select(
            F.when(F.col("id") % 20 != 0, F.lit(0))
            .otherwise(F.col("id") % 100)
            .alias("k"),
            F.col("id").alias("payload"),
        )
        right = spark.range(100).select(
            F.col("id").alias("k"), F.lit("x").alias("lab")
        )
        j = left.join(right, "k").groupBy("lab").agg(F.count(F.lit(1)).alias("n"))
        [row] = j.collect()
        assert (row["lab"], row["n"]) == ("x", 500_000)
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_cube_expands_after_preaggregation(spark, sf_dir):
    """The CUBE must Expand the aggregated groups, not the fact table:
    exactly one corpus-sized shuffle (the base groupBy); the Expand sits
    above the first aggregate in the plan."""
    df = contract.queries()["cube_order_stats"](spark, sf_dir)
    plan = explain_str(df, mode="simple")
    assert "Expand" in plan, plan
    # Expand must appear above (before, in top-down print) the fact scan's
    # aggregate chain: the scan feeds HashAggregate before any Expand line
    lines = plan.splitlines()
    expand_i = min(i for i, l in enumerate(lines) if "Expand" in l)
    scan_i = max(i for i, l in enumerate(lines) if "Scan" in l or "FileScan" in l)
    assert expand_i < scan_i, plan  # top-down: Expand printed above the scan
    first_agg_below_expand = any(
        "HashAggregate" in l for l in lines[expand_i + 1 : scan_i + 1]
    )
    assert first_agg_below_expand, plan


def test_trailing_window_single_shuffle(spark, sf_dir):
    """RANGE-frame trailing sum: one hash shuffle on user_id, no sort-free
    fallback to a global window."""
    df = contract.queries()["trailing_7d_value"](spark, sf_dir)
    plan = explain_str(df, mode="simple")
    assert plan.count("Exchange") == 1, plan
    assert "Window" in plan, plan


def test_runtime_bloom_filter_semi_join_reduction(spark, sf_dir):
    """At 100 TB a selective dim-side filter can't broadcast (both join
    sides exceed the threshold → sort-merge), but the optimizer can still
    prune the fact scan BEFORE the shuffle by injecting a bloom filter
    built from the filtered side — Spark's runtime semi-join reduction.
    Locally the thresholds assume cluster sizes, so the test pins the
    mechanism with them lowered; production keeps the defaults."""
    from pyspark.sql import functions as F

    from data_pipeline_ine_spark.sources.registry import load_table

    overrides = {
        # fact side is "big enough to bother" at any size for the test
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "64MB",
        # forbid broadcast so the join is the shuffle join this targets
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in overrides}
    try:
        for k, v in overrides.items():
            spark.conf.set(k, v)
        li = load_table(spark, sf_dir, "lineitem")
        orders = load_table(spark, sf_dir, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("l_returnflag")
            .count()
        )
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan, plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_knn_join_is_equi_join_not_cartesian(spark, sf_dir):
    """The blocked kNN self-join must plan as an equi-join on the block key
    — a CartesianProduct/nested-loop would be corpus² at scale. The
    graph memo is disabled for the assertion: its checkpoint frame
    explains as an opaque RDD scan and would pass vacuously."""
    from data_pipeline_ine_spark.operators import similarity as S

    S.GRAPH_MEMO_DISABLED = True
    try:
        df = contract.queries()["knn_within_label"](spark, sf_dir)
        plan = explain_str(df, mode="simple")
    finally:
        S.GRAPH_MEMO_DISABLED = False
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "Join" in plan, plan  # the real topology, not a memo scan


def test_knn_ivf_blocked_contract_plan_and_pair_bound(spark, sf_dir):
    """The benched knn_ivf_blocked contract query must run the 100 TB
    plan: an equi-join on the trained IVF cluster key (no cartesian /
    nested loop), with Σ block·(block−1) bounded by the n/8 cluster
    sizing — the pair-volume guarantee a label block can't give."""
    from pyspark.sql import functions as F

    from data_pipeline_ine_spark.operators import similarity as S

    S.GRAPH_MEMO_DISABLED = True
    try:
        df = contract.queries()["knn_ivf_blocked"](spark, sf_dir)
        plan = explain_str(df, mode="simple")
    finally:
        S.GRAPH_MEMO_DISABLED = False
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "block" in plan  # joined on the cluster block key
    assert "Join" in plan, plan  # the real topology, not a memo scan
    from data_pipeline_ine_spark.sources.registry import load_table

    n = load_table(spark, sf_dir, "embeddings").count()
    sizes = [
        r.n
        for r in df.groupBy("block")
        .agg(F.countDistinct("vec_id").alias("n"))
        .collect()
    ]
    assert sum(s * (s - 1) for s in sizes) < (n * n) // 4


def test_scd2_windows_share_one_shuffle(spark, sf_dir):
    """Both SCD2 windows partition by user_id with the same ordering, so
    the plan needs exactly one user_id Exchange."""
    df = contract.queries()["scd2_intervals"](spark, sf_dir)
    plan = explain_str(df, mode="simple")
    assert plan.count("hashpartitioning(user_id") == 1, plan


def test_funnel_stage_windows_share_one_shuffle(spark, sf_dir):
    """The three chained conditional-min stage windows must stack on ONE
    user_id Exchange; the per-user reduce reuses the same partitioning, so
    no second corpus shuffle appears."""
    df = contract.queries()["funnel_conversion"](spark, sf_dir)
    plan = explain_str(df, mode="simple")
    assert plan.count("hashpartitioning(user_id") == 1, plan
    assert plan.count("Window") >= 3, plan


def test_quality_gate_thresholds_broadcast(spark, sf_dir):
    """The per-source threshold frame must broadcast back onto the corpus
    — re-shuffling the corpus on source to attach 20 thresholds would be
    the classic small-join mistake."""
    df = contract.queries()["source_quality_gate"](spark, sf_dir)
    plan = explain_str(df, mode="simple")
    assert "BroadcastHashJoin" in plan, plan


def test_bm25_stats_broadcast(spark, sf_dir):
    """BM25 pivots the literal query terms into ONE doc-keyed aggregate
    (single tokenize pass) and broadcasts the 1-row (N, avgdl, df_i)
    frame back — so the plan shows a broadcast join and exactly one
    corpus aggregate over the exploded token stream."""
    df = contract.queries()["bm25_scores"](spark, sf_dir)
    plan = explain_str(df, mode="simple")
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan
    # the single tokenize pass is enforced by the lazy localCheckpoint on
    # per_doc (runtime reuse — invisible in the plan string, like simhash);
    # the per-(doc, term) tf frame and its extra shuffles must stay gone
    assert "term#" not in plan.split("HashAggregate", 1)[0], plan


def test_expect_rows_fuses_checks_into_one_scan(spark, sf_dir):
    """N per-row expectations must cost ONE table scan (one conditional
    aggregate), not a scan per check."""
    from pyspark.sql import functions as F

    from data_pipeline_ine_spark.operators.quality import expect_rows
    from data_pipeline_ine_spark.sources.registry import load_table

    li = load_table(spark, sf_dir, "lineitem")
    df = expect_rows(
        li,
        {
            "a": F.col("l_quantity") <= 0,
            "b": F.col("l_discount") < 0,
            "c": F.col("l_tax") < 0,
        },
    )
    plan = explain_str(df, mode="simple")
    assert plan.count("FileScan") == 1, plan


def test_retention_distinct_reduces_before_join(spark, sf_dir):
    """The (user, week) distinct must aggregate the event stream BEFORE
    the cohort self-join — joining raw events first would shuffle the
    corpus twice at full width."""
    df = contract.queries()["retention_cohorts"](spark, sf_dir)
    plan = explain_str(df, mode="formatted")
    join_pos = plan.find("SortMergeJoin")
    if join_pos == -1:
        join_pos = plan.find("BroadcastHashJoin")
    assert join_pos != -1, plan
    # formatted mode lists operators leaves-first; both aggregate branches
    # (distinct pairs, first-activity weeks) must appear before the join
    assert plan[:join_pos].count("HashAggregate") >= 2, plan


def test_knn_with_lsh_bucket_block_stays_subquadratic(spark, sf_dir):
    """The documented 100 TB usage of knn_join_blocked: when the block key
    is a corpus-sized LSH bucket (planes_for) instead of a fixed label,
    Σ block² stays sub-quadratic as the corpus grows — the knob that keeps
    the batched kNN join viable at scale."""
    from pyspark.sql import functions as F

    from data_pipeline_ine_spark.operators.similarity import (
        hyperplane_signature,
        knn_join_blocked,
        planes_for,
    )
    from data_pipeline_ine_spark.sources.registry import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    bucketed = emb.withColumn(
        "bucket", hyperplane_signature(F.col("embedding"), planes_for(n))
    )
    per_bucket = bucketed.groupBy("bucket").count()
    pair_volume = per_bucket.agg(
        F.sum(F.col("count") * (F.col("count") - 1)).alias("p")
    ).first().p
    assert pair_volume < (n * n) // 4, (
        f"bucketed pair volume {pair_volume} is not sub-quadratic vs n²={n*n}"
    )
    out = knn_join_blocked(bucketed, k=3, block_col="bucket")
    assert out.count() > 0
    assert out.filter(F.col("rank") > 3).count() == 0


def test_interval_overlap_join_never_nested_loop(spark, sf_dir):
    """The grid rewrite must plan the overlap join as a hash/SMJ equi-join
    — a raw interval predicate would fall back to BroadcastNestedLoopJoin."""
    import __spark_entry__ as contract

    plan = (
        contract.q_overlap_shipments(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_transition_matrix_window_is_user_partitioned(spark, sf_dir):
    """The sequence window must partition by user — a global (empty-
    partition) window would drag the corpus through one task."""
    import __spark_entry__ as contract

    plan = (
        contract.q_event_transitions(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    import re

    lead_windows = [
        ln for ln in plan.splitlines() if "lead(" in ln and "Window" in ln
    ]
    assert lead_windows, "expected a lead() window in the plan"
    assert all("user_id" in ln for ln in lead_windows)


def test_deterministic_shuffle_no_global_window(spark, sf_dir):
    """The permutation rank must come from the two-pass distributed rank:
    every row_number window partitions by _pid, never SinglePartition."""
    from data_pipeline_ine_spark.operators.sampling import deterministic_shuffle
    from data_pipeline_ine_spark.sources.registry import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    plan = (
        deterministic_shuffle(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    rn_lines = [
        ln for ln in plan.splitlines() if "row_number" in ln.lower()
    ]
    assert rn_lines, "expected a row_number window"
    assert all("_pid" in ln for ln in rn_lines)


def test_dynamic_partition_pruning_on_partitioned_fact(spark, tmp_path):
    """A partitioned fact joined to a selectively-filtered dim must carry a
    dynamicpruning expression in its partition filters — the runtime
    partition pruning that keeps star joins from scanning every partition
    at 100 TB. Uses sf0.01: the DPP benefit estimator declines the
    sf0.001 fixture's KB-sized partitions."""
    from data_pipeline_ine_spark.sources.registry import load_table

    orders = load_table(spark, "/root/testdata/sf0.01", "orders")
    fact_dir = str(tmp_path / "orders_by_status")
    orders.write.mode("overwrite").partitionBy("o_orderstatus").parquet(fact_dir)
    fact = spark.read.parquet(fact_dir)
    from pyspark.sql import functions as sf

    dim = spark.createDataFrame(
        [("F", "closed"), ("O", "open"), ("P", "pending")],
        "o_orderstatus string, label string",
    ).filter(sf.col("label") == "closed")  # the selective dim predicate DPP keys on
    joined = fact.join(dim, "o_orderstatus").groupBy("label").count()
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]


def test_grid_nn_join_is_equi_join_on_cell_key(spark, sf_dir):
    """grid_nearest_depot: the spatial match must be a hash/sort-merge
    EQUI-join on the grid cell key — never a cartesian/nested-loop over
    points x sites, and the per-point ranking must push as a group
    limit (top-1 per point) below the final sort."""
    df = contract.queries()["grid_nearest_depot"](spark, sf_dir)
    plan = explain_str(df, mode="simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert ("SortMergeJoin" in plan) or ("BroadcastHashJoin" in plan) or (
        "ShuffledHashJoin" in plan
    ), plan
    assert "WindowGroupLimit" in plan, plan


def test_skyline_windows_never_data_sized(spark, sf_dir):
    """pareto_parts: every unpartitioned window in the skyline plan must
    run over the per-partition maxima (partition-count rows), and the
    data-sized running max must be partitioned by _pid. Assert no
    window operates directly on the unaggregated part scan: all Window
    nodes sit above either a partial-aggregate or the _pid repartition."""
    df = contract.queries()["pareto_parts"](spark, sf_dir)
    plan = explain_str(df, mode="formatted")
    # two windows total: the _pid-partitioned local cummax and the
    # _pid-ordered prefix over per-partition maxima
    n_windows = plan.count("Window")
    assert n_windows >= 2, plan
    # the prefix window's input is the groupBy(_pid) aggregate —
    # HashAggregate appears between the range repartition and the
    # unpartitioned window
    assert "hashpartitioning(_pid" in plan or "HashAggregate" in plan, plan


def test_pmi_collocations_single_corpus_shuffle(spark, sf_dir):
    """pmi_collocations: the corpus shuffles exactly once (on the bigram
    key); marginals and the total re-aggregate from bigram-distinct
    data, and the single-row total broadcasts back — so the number of
    exchanges is bounded by the small-side re-aggregations, and no
    Python UDF appears anywhere."""
    df = contract.queries()["pmi_collocations"](spark, sf_dir)
    plan = explain_str(df, mode="simple")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan  # the totals join must broadcast


def test_linkage_scores_blocked_equi_join(spark, sf_dir):
    """linkage_scores: candidate generation must be an EQUI-join on the
    blocking key (sum-of-block-squared pairs), never a cartesian over
    the table; the three 1-row stats frames broadcast back; ranking is
    TakeOrdered, not a global sort materialization."""
    df = contract.queries()["linkage_scores"](spark, sf_dir)
    plan = explain_str(df, mode="simple")
    assert "CartesianProduct" not in plan
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan) or (
        "BroadcastHashJoin" in plan
    ), plan
    assert "TakeOrderedAndProject" in plan, plan


def test_value_drift_no_corpus_shuffle(spark, sf_dir):
    """value_drift: the only aggregates are the 1-row percentile frame,
    the two 10-row bucket counts, and the 1-row totals — the corpus is
    scanned, never shuffled on a data-sized key. Assert every join is a
    broadcast (edges/totals) and no Python appears."""
    df = contract.queries()["value_drift"](spark, sf_dir)
    plan = explain_str(df, mode="simple")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_mode_per_group_is_pure_hash_aggregation(spark, sf_dir):
    """Two hash aggregates, no window, no sort: the argmin-struct trick
    must not degrade into a per-group row_number window."""
    df = contract.queries()["modal_event_type"](spark, sf_dir)
    plan = explain_str(df, mode="simple")
    assert "Window" not in plan, plan
    assert "HashAggregate" in plan


def test_decile_lift_never_uses_global_window(spark, sf_dir):
    """The global rank must be the two-pass distributed rank: any
    Window in the plan must be partitioned (a one-task global
    row_number would funnel the corpus through one task). The model
    and totals ride broadcasts."""
    df = contract.queries()["decile_lift"](spark, sf_dir)
    plan = explain_str(df, mode="simple")
    for line in plan.splitlines():
        if "Window" in line and "windowspecdefinition" in line:
            # every window spec must carry a partition key (here _pid,
            # and the prefix-sum over ~1k partition counts)
            assert "windowspecdefinition(_pid" in line or (
                "windowspecdefinition(" in line and "_pid" in line
            ), line
    assert "BroadcastExchange" in plan


def test_rolling_distinct_users_dedupes_before_explode(spark, sf_dir):
    """The contribution explode must run over the (user, day)-deduped
    activity table — an aggregate (the distinct) strictly below the
    generator in the plan — so the 7x multiplier applies to activity
    grain, not raw events."""
    df = contract.queries()["rolling_7d_users"](spark, sf_dir)
    plan = explain_str(df, mode="simple")
    gen = plan.find("Generate explode")
    assert gen != -1, plan
    below = plan[gen:]
    assert "HashAggregate" in below, "explode not fed by the dedup aggregate"


def test_dup_weighted_family_join_builds_on_aggregate(spark, sf_dir):
    """dup_weighted_docs: the family-size join may broadcast ONLY the
    aggregated counts side (at 100 TB stats flip it to a same-key
    shuffle join — also fine); what must never happen is a broadcast
    of the raw-text scan. Assert any BroadcastExchange sits above a
    HashAggregate, not a FileScan of text."""
    df = contract.queries()["dup_weighted_docs"](spark, sf_dir)
    plan = explain_str(df, mode="simple")
    if "BroadcastExchange" in plan:
        below = plan.split("BroadcastExchange", 1)[1]
        agg_i = below.find("HashAggregate")
        scan_i = below.find("FileScan")
        assert agg_i != -1 and (scan_i == -1 or agg_i < scan_i), plan
    else:
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan


def test_no_contract_query_has_unallowlisted_global_window(spark, sf_dir):
    """Repo-wide window-hygiene gate: no contract query's optimized
    plan may contain a Window with an EMPTY partition spec (a one-task
    global sort of its input) unless it is (a) the two-pass ``_pid``
    prefix over a |partitions|-row counts frame, or (b) allowlisted in
    tools/plan_lint.py::GLOBAL_WINDOW_ALLOWED with the bound on its
    input grain. Data-sized offenders were rewritten onto
    ``sampling.py::two_pass_rank`` / ``two_pass_cumsum`` instead
    (funnel_latency, weighted_median, rank_auc, rfm_segments,
    watermark_lateness)."""
    from tools.plan_lint import GLOBAL_WINDOW_ALLOWED, unpartitioned_windows

    offenders = {}
    for name, fn in contract.queries().items():
        if name in GLOBAL_WINDOW_ALLOWED:
            continue
        bad = unpartitioned_windows(fn(spark, sf_dir))
        if bad:
            offenders[name] = bad
    assert not offenders, offenders


def test_ivf_index_probe_scan_is_partition_pruned(spark, sf_dir, tmp_path):
    """The 100 TB ANN serving path (sources/ivf_index.py): probing a
    written IVF index must reach the parquet scan as a static
    PartitionFilters entry on the bucket column — unprobed buckets are
    never read — and the result must equal the inline partitioned_topk
    on the same coarse key."""
    from pyspark.sql import functions as F

    from data_pipeline_ine_spark.operators.similarity import partitioned_topk
    from data_pipeline_ine_spark.sources.ivf_index import (
        read_ivf_probe,
        write_ivf_index,
    )
    from data_pipeline_ine_spark.sources.registry import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    path = str(tmp_path / "ivf_index")
    write_ivf_index(emb, path, part_col="label")
    probed = read_ivf_probe(spark, path, qvec, k=10, n_probe=2)
    plan = explain_str(probed)
    pf = plan.split("PartitionFilters", 1)
    assert len(pf) == 2 and "bucket" in pf[1].splitlines()[0], plan
    inline = partitioned_topk(emb, qvec, k=10, part_col="label", n_probe=2)
    assert [tuple(r) for r in probed.collect()] == [
        tuple(r) for r in inline.collect()
    ]


def test_ivf_index_kmeans_mode_roundtrip(spark, sf_dir, tmp_path):
    """part_col=None trains the deterministic k-means and buckets on
    its assignment; the index must hold every vector exactly once,
    expose string bucket keys both ways, and the probe must stay
    pruned."""
    from pyspark.sql import functions as F

    from data_pipeline_ine_spark.sources.ivf_index import (
        read_ivf_probe,
        write_ivf_index,
    )
    from data_pipeline_ine_spark.sources.registry import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    path = str(tmp_path / "ivf_kmeans")
    write_ivf_index(emb, path, part_col=None, n_clusters=4, iters=1)
    idx = spark.read.parquet(path)
    assert idx.count() == emb.count()
    assert dict(idx.dtypes)["bucket"] == "string"
    out = read_ivf_probe(spark, path, qvec, k=5, n_probe=2)
    plan = explain_str(out)
    assert "PartitionFilters" in plan
    rows = out.collect()
    assert len(rows) == 5
    assert rows == sorted(rows, key=lambda r: (-r.cosine_sim, r.vec_id))


def test_ivfpq_index_stores_codes_only_and_prunes(spark, sf_dir, tmp_path):
    """The IVF-PQ layout: the index table holds PQ codes only (raw
    vectors never leave the write path — the 64x scan-size cut), the
    probe scan is partition-pruned on the bucket, and the ADC ranking
    equals the inline pq_topk restricted to the probed buckets."""
    from pyspark.sql import functions as F

    from data_pipeline_ine_spark.operators.similarity import (
        pq_codebook,
        pq_encode,
        pq_topk,
    )
    from data_pipeline_ine_spark.sources.ivf_index import (
        read_ivfpq_probe,
        write_ivfpq_index,
    )
    from data_pipeline_ine_spark.sources.registry import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    qvec = emb.orderBy(F.desc("vec_id")).select("embedding").head()[0]
    path = str(tmp_path / "ivfpq")
    write_ivfpq_index(emb, path, part_col="label")
    idx = spark.read.parquet(path)
    assert set(idx.columns) == {"vec_id", "pq_codes", "bucket"}
    out = read_ivfpq_probe(spark, path, qvec, k=10, n_probe=2)
    plan = explain_str(out)
    pf = plan.split("PartitionFilters", 1)
    assert len(pf) == 2 and "bucket" in pf[1].splitlines()[0], plan
    got = [tuple(r) for r in out.collect()]
    # inline reference on the same probed buckets
    probed_buckets = {
        r.bucket for r in out.join(idx, "vec_id").select("bucket").collect()
    }
    cb = pq_codebook(emb, m=4, n_codes=8)
    codes = pq_encode(
        emb.withColumn(
            "bucket", F.concat(F.lit("b"), F.col("label").cast("string"))
        ),
        cb,
        keep_cols=("bucket",),
    )
    ref = pq_topk(
        codes.filter(F.col("bucket").isin(sorted(probed_buckets))).drop(
            "bucket"
        ),
        cb,
        qvec,
        k=10,
    )
    assert got == [tuple(r) for r in ref.collect()]


def test_sq8_index_stores_codes_only_prunes_and_ranks_exact(
    spark, sf_dir, tmp_path
):
    """IVF-SQ8 (sources/ivf_index.py::write_sq8_index/read_sq8_probe):
    the index holds int8 codes only (raw vectors never leave the write
    path), the probe scan is partition-pruned on the bucket, and the
    exact BIGINT code-space ranking equals an independent Python
    re-quantization of the probed buckets under the sidecar params."""
    import math

    from pyspark.sql import functions as F

    from data_pipeline_ine_spark.sources.ivf_index import (
        _sq8_params,
        read_sq8_probe,
        write_sq8_index,
    )
    from data_pipeline_ine_spark.sources.registry import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    qvec = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 1)
        .select("embedding")
        .first()[0]
    ]
    path = str(tmp_path / "sq8")
    write_sq8_index(emb, path, part_col="label")
    idx = spark.read.parquet(path)
    assert set(idx.columns) == {"vec_id", "sq_codes", "bucket"}
    out = read_sq8_probe(spark, path, qvec, k=10, n_probe=2)
    plan = explain_str(out)
    pf = plan.split("PartitionFilters", 1)
    assert len(pf) == 2 and "bucket" in pf[1].splitlines()[0], plan
    got = [tuple(r) for r in out.collect()]

    mins, spans = _sq8_params(spark, path)

    def code(x: float, mn: float, sp: float) -> int:
        if sp == 0.0:
            return 0
        return max(0, min(255, int(math.floor((x - mn) * 255.0 / sp + 0.5))))

    qc = [code(x, mins[d], spans[d]) for d, x in enumerate(qvec)]
    probed = {
        r.bucket for r in out.join(idx, "vec_id").select("bucket").collect()
    }
    ref = []
    inline = (
        emb.withColumn(
            "bucket", F.concat(F.lit("b"), F.col("label").cast("string"))
        )
        .filter(F.col("bucket").isin(sorted(probed)))
        .select("vec_id", "embedding")
        .collect()
    )
    for r in inline:
        cs = [
            code(float(x), mins[d], spans[d])
            for d, x in enumerate(r.embedding)
        ]
        ref.append(
            (r.vec_id, sum((a - b) ** 2 for a, b in zip(cs, qc)))
        )
    ref.sort(key=lambda t: (t[1], t[0]))
    assert got == ref[:10]


def test_sq8_batch_probe_one_scan_and_single_query_parity(
    spark, sf_dir, tmp_path
):
    """Batched SQ8 serving: Q queries through ONE pruned codes scan
    (the union of probed buckets as a single static PartitionFilters
    entry, joined via broadcast — no BNLJ), with per-query results
    identical to Q separate read_sq8_probe calls."""
    from pyspark.sql import functions as F

    from data_pipeline_ine_spark.sources.ivf_index import (
        read_sq8_probe,
        read_sq8_probe_batch,
        write_sq8_index,
    )
    from data_pipeline_ine_spark.sources.registry import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    qrows = (
        emb.filter(F.col("vec_id") < 3).select("vec_id", "embedding").collect()
    )
    queries = [(int(r.vec_id), [float(x) for x in r.embedding]) for r in qrows]
    path = str(tmp_path / "sq8_batch")
    write_sq8_index(emb, path, part_col="label")
    out = read_sq8_probe_batch(spark, path, queries, k=5, n_probe=2)
    plan = explain_str(out)
    pf = plan.split("PartitionFilters", 1)
    assert len(pf) == 2 and "bucket" in pf[1].splitlines()[0], plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    # ONE shared codes scan: a single InMemoryFileIndex location
    assert plan.count("InMemoryFileIndex") == 1, plan
    got = {
        (r.query_id, r.vec_id): r.sq8_dist for r in out.collect()
    }
    for qid, v in queries:
        single = read_sq8_probe(spark, path, v, k=5, n_probe=2).collect()
        for r in single:
            assert got[(qid, r.vec_id)] == r.sq8_dist
        assert len(single) == 5


def test_filtered_ann_pushes_predicate_into_pruned_scan(
    spark, sf_dir, tmp_path
):
    """Filtered ANN (staged round-10): a payload predicate handed to
    read_ivf_probe/read_sq8_probe must reach the parquet scan as a
    PushedFilters entry NEXT TO the partition pruning, every returned
    row must satisfy it, and the result must equal brute-force top-k
    over the probed+filtered rows."""
    from pyspark.sql import functions as F

    from data_pipeline_ine_spark.sources.ivf_index import (
        read_ivf_probe,
        read_sq8_probe,
        write_ivf_index,
        write_sq8_index,
    )
    from data_pipeline_ine_spark.sources.registry import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    qvec = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0)
        .select("embedding")
        .first()[0]
    ]
    path = str(tmp_path / "ivf_filt")
    # kmeans mode keeps label as a payload column to filter on
    write_ivf_index(emb, path, part_col=None, n_clusters=4, iters=1)
    pred = F.col("label") % 2 == 0
    out = read_ivf_probe(
        spark, path, qvec, k=10, n_probe=4, where=pred
    )
    plan = explain_str(out)
    pf = plan.split("PartitionFilters", 1)
    assert len(pf) == 2 and "bucket" in pf[1].splitlines()[0], plan
    assert "PushedFilters" in plan and "label" in plan.split(
        "PushedFilters", 1
    )[1].splitlines()[0], plan
    rows = out.join(emb.select("vec_id", "label"), "vec_id").collect()
    assert len(rows) == 10
    assert all(r.label % 2 == 0 for r in rows)
    # equals brute force over probed+filtered rows
    unfiltered = read_ivf_probe(spark, path, qvec, k=10_000, n_probe=4)
    allowed = {
        r.vec_id
        for r in unfiltered.join(
            emb.filter(pred).select("vec_id"), "vec_id", "left_semi"
        ).collect()
    }
    ref = [
        r.vec_id
        for r in unfiltered.collect()
        if r.vec_id in allowed
    ][:10]
    assert [r.vec_id for r in out.collect()] == ref

    sq8 = str(tmp_path / "sq8_filt")
    write_sq8_index(emb, sq8, part_col=None, n_clusters=4, iters=1)
    out_s = read_sq8_probe(
        spark, sq8, qvec, k=10, n_probe=4, where=pred
    )
    got_s = out_s.join(emb.select("vec_id", "label"), "vec_id").collect()
    assert len(got_s) == 10 and all(r.label % 2 == 0 for r in got_s)


def test_probe_tiebreak_is_numeric_past_ten_buckets(spark, tmp_path):
    """Probe selection must tie-break on the NUMERIC bucket id: with 12
    buckets where buckets 2 and 10 hold identical vectors (identical
    centroids — an exact rounded-cosine tie), n_probe=1 must pick b2.
    The bucket STRING sorts 'b10' < 'b2' and would silently pick b10 —
    the same divergence build-time append routing already guards
    against; the oracles order by the integer label. Covers the flat,
    SQ8, and batch probe readers."""
    from pyspark.sql import functions as F

    from data_pipeline_ine_spark.sources.ivf_index import (
        read_ivf_probe,
        read_ivf_probe_batch,
        read_sq8_probe,
        write_ivf_index,
        write_sq8_index,
    )

    u = [float(d + 1) for d in range(8)]  # the query direction
    qvec = u

    def bucket_vecs(b: int) -> list[list[float]]:
        if b in (2, 10):
            # scalar multiples of u: centroid parallel to q, cosine
            # exactly 1.0 for BOTH buckets — a guaranteed rounded tie
            return [[x * s for x in u] for s in (1.0, 2.0, 3.0)]
        w = [float((b * 37 + d * 11) % 17 - 8) for d in range(8)]
        return [w, w, w]

    rows = []
    vid = 0
    for b in range(12):
        for v in bucket_vecs(b):
            rows.append((vid, v, b))
            vid += 1
    df = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>, label int"
    )
    # sanity: no non-tie bucket may accidentally reach cosine 1.0
    import math

    for b in range(12):
        if b in (2, 10):
            continue
        w = bucket_vecs(b)[0]
        cos = sum(a * c for a, c in zip(u, w)) / (
            math.sqrt(sum(a * a for a in u))
            * math.sqrt(sum(c * c for c in w))
        )
        assert round(cos, 6) < 1.0, (b, cos)

    path = str(tmp_path / "ivf12")
    write_ivf_index(df, path, part_col="label")
    probed = {
        r.bucket
        for r in read_ivf_probe(spark, path, qvec, k=3, n_probe=1)
        .join(spark.read.parquet(path), "vec_id")
        .select("bucket")
        .collect()
    }
    assert probed == {"b2"}, probed

    got_b = read_ivf_probe_batch(
        spark, path, [(0, qvec)], k=3, n_probe=1
    )
    probed_b = {
        r.bucket
        for r in got_b.join(spark.read.parquet(path), "vec_id")
        .select("bucket")
        .collect()
    }
    assert probed_b == {"b2"}, probed_b

    sq8 = str(tmp_path / "sq812")
    write_sq8_index(df, sq8, part_col="label")
    probed_s = {
        r.bucket
        for r in read_sq8_probe(spark, sq8, qvec, k=3, n_probe=1)
        .join(spark.read.parquet(sq8), "vec_id")
        .select("bucket")
        .collect()
    }
    assert probed_s == {"b2"}, probed_s


def test_sq8_rerank_two_stage_and_batch_parity(spark, sf_dir, tmp_path):
    """Staged round-10 components (read_sq8_rerank /
    read_sq8_rerank_batch): stage 2 must read the raw vectors through
    a pushed-down id point-lookup (In filter on vec_id, never a
    bucket scan), the single-query result must be the exact-cosine
    re-rank of the SQ8 shortlist, and the batch must equal Q separate
    single-query calls."""
    from pyspark.sql import functions as F

    from data_pipeline_ine_spark.operators.similarity import cosine
    from data_pipeline_ine_spark.sources.ivf_index import (
        read_sq8_probe,
        read_sq8_rerank,
        read_sq8_rerank_batch,
        write_sq8_index,
    )
    from data_pipeline_ine_spark.sources.registry import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "sq8_rr")
    write_sq8_index(emb, path, part_col="label")
    qvec = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 1)
        .select("embedding")
        .first()[0]
    ]
    out = read_sq8_rerank(
        spark, path, emb, qvec, k=5, shortlist=20, n_probe=2
    )
    plan = explain_str(out)
    assert "PushedFilters" in plan and "In(vec_id" in plan, plan
    got = [(r.vec_id, r.cosine_sim) for r in out.collect()]
    # exact-cosine re-rank of the shortlist, recomputed independently
    short_ids = [
        r.vec_id
        for r in read_sq8_probe(
            spark, path, qvec, k=20, n_probe=2
        ).collect()
    ]
    q = F.array(*[F.lit(x) for x in qvec])
    ref = (
        emb.filter(F.col("vec_id").isin(short_ids))
        .select(
            "vec_id", F.round(cosine(F.col("embedding"), q), 6).alias("s")
        )
        .orderBy(F.desc("s"), F.asc("vec_id"))
        .limit(5)
        .collect()
    )
    assert got == [(r.vec_id, r.s) for r in ref]

    queries = [
        (int(r.vec_id), [float(x) for x in r.embedding])
        for r in emb.filter(F.col("vec_id") < 3)
        .select("vec_id", "embedding")
        .collect()
    ]
    batch = read_sq8_rerank_batch(
        spark, path, emb, queries, k=5, shortlist=20, n_probe=2
    )
    got_b = {(r.query_id, r.rank): (r.vec_id, r.cosine_sim)
             for r in batch.collect()}
    for qid, v in queries:
        single = read_sq8_rerank(
            spark, path, emb, v, k=5, shortlist=20, n_probe=2
        ).collect()
        for i, r in enumerate(single):
            assert got_b[(qid, i + 1)] == (r.vec_id, r.cosine_sim), (qid, i)


def test_sq8_append_frozen_params_zero_span_and_rebuild_refusal(
    spark, sf_dir, tmp_path
):
    """SQ8 maintenance discipline: appends encode under the FROZEN
    affine params (sidecar byte-identical, codes-only schema kept), a
    constant dimension (span 0) quantizes to 0 instead of dividing by
    zero, and rebuild_ivf_index refuses a codes-only SQ8 index the same
    way it refuses IVF-PQ."""
    import pytest
    from pyspark.sql import functions as F

    from data_pipeline_ine_spark.sources.ivf_index import (
        append_to_ivf_index,
        rebuild_ivf_index,
        write_sq8_index,
    )
    from data_pipeline_ine_spark.sources.registry import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") < 400)
    extra = emb.filter(F.col("vec_id") >= 400).withColumn(
        "vec_id", F.col("vec_id") + 1_000_000
    )
    path = str(tmp_path / "sq8_inc")
    write_sq8_index(base, path, part_col=None, n_clusters=4, iters=1)
    params_before = sorted(
        (r.d, r.vmin, r.vmax)
        for r in spark.read.parquet(f"{path}/_sqparams").collect()
    )
    append_to_ivf_index(extra, path)
    idx = spark.read.parquet(path)
    # payload columns (label) ride along; raw vectors never do
    assert {"vec_id", "sq_codes", "bucket"} <= set(idx.columns)
    assert "embedding" not in idx.columns
    assert idx.count() == emb.count()
    params_after = sorted(
        (r.d, r.vmin, r.vmax)
        for r in spark.read.parquet(f"{path}/_sqparams").collect()
    )
    assert params_after == params_before  # frozen grid

    const = spark.createDataFrame(
        [(i, [1.5, float(i)]) for i in range(8)],
        "vec_id bigint, embedding array<double>",
    )
    p2 = str(tmp_path / "sq8_const")
    write_sq8_index(const, p2, part_col=None, n_clusters=2, iters=1)
    for r in spark.read.parquet(p2).collect():
        assert r.sq_codes[0] == 0  # span-0 dim: no div-by-zero, code 0
    with pytest.raises(ValueError, match="SQ8"):
        rebuild_ivf_index(spark, p2)


def test_ivf_index_append_routes_to_frozen_centroids(spark, sf_dir, tmp_path):
    """Incremental maintenance: appended vectors must land in the
    bucket of their NEAREST STORED centroid (centroids frozen — no
    re-train), the sidecar must be byte-identical after the append,
    probes must see the new rows through the same pruned scan, and an
    IVF-PQ append must store codes with the frozen codebook."""
    from pyspark.sql import functions as F

    from data_pipeline_ine_spark.sources.ivf_index import (
        append_to_ivf_index,
        read_ivf_probe,
        write_ivf_index,
        write_ivfpq_index,
    )
    from data_pipeline_ine_spark.sources.registry import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") < 400)
    extra = emb.filter(F.col("vec_id") >= 400).withColumn(
        "vec_id", F.col("vec_id") + 1_000_000
    )
    path = str(tmp_path / "ivf_inc")
    write_ivf_index(base, path, part_col=None, n_clusters=4, iters=1)
    cents_before = sorted(
        (r.bucket, tuple(r.centroid))
        for r in spark.read.parquet(f"{path}/_centroids").collect()
    )
    append_to_ivf_index(extra, path)
    assert spark.read.parquet(path).count() == emb.count()
    cents_after = sorted(
        (r.bucket, tuple(r.centroid))
        for r in spark.read.parquet(f"{path}/_centroids").collect()
    )
    assert cents_after == cents_before  # frozen
    # every appended row sits in its nearest stored centroid's bucket
    idx = spark.read.parquet(path).filter(F.col("vec_id") >= 1_000_000)
    cents = {b: list(c) for b, c in cents_before}

    def nearest(v):
        return min(
            cents,
            key=lambda b: (
                sum((x - y) ** 2 for x, y in zip(v, cents[b])),
                b,
            ),
        )

    for r in idx.select("vec_id", "embedding", "bucket").collect():
        assert r.bucket == nearest([float(x) for x in r.embedding]), r.vec_id
    # probe sees appended rows via the same pruned scan
    qvec = extra.select("embedding").head()[0]
    out = read_ivf_probe(spark, path, qvec, k=500, n_probe=4)
    assert any(r.vec_id >= 1_000_000 for r in out.collect())

    # IVF-PQ append: codes-only schema preserved
    pq_path = str(tmp_path / "ivfpq_inc")
    write_ivfpq_index(base, pq_path, part_col=None, n_clusters=4, iters=1)
    append_to_ivf_index(extra, pq_path)
    pq_idx = spark.read.parquet(pq_path)
    assert set(pq_idx.columns) == {"vec_id", "pq_codes", "bucket"}
    assert pq_idx.count() == emb.count()


def test_ivfpq_probe_recall_measured_vs_exact(spark, sf_dir, tmp_path):
    """Measure, don't guess: recall@10 of the full IVF-PQ serving path
    (coarse probe loss × PQ quantization loss) against exact cosine
    top-10, averaged over 5 query vectors. Measured ~0.22 on the
    near-random sf0.001 embeddings (trained codebook measured WORSE,
    0.18 — k-means buys nothing on isotropic data); the floor asserts
    ≥5× the random-retrieval baseline k/n, i.e. geometry-driven
    retrieval, not noise."""
    from pyspark.sql import functions as F

    from data_pipeline_ine_spark.operators.similarity import (
        brute_force_topk,
    )
    from data_pipeline_ine_spark.sources.ivf_index import (
        read_ivfpq_probe,
        write_ivfpq_index,
    )
    from data_pipeline_ine_spark.sources.registry import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "ivfpq_recall")
    write_ivfpq_index(emb, path, part_col="label")
    qrows = emb.filter(F.col("vec_id") < 5).select(
        "vec_id", "embedding"
    ).collect()
    hits = total = 0
    for qr in qrows:
        truth = {
            r.vec_id
            for r in brute_force_topk(emb, qr.embedding, k=10).collect()
        }
        got = {
            r.vec_id
            for r in read_ivfpq_probe(
                spark, path, qr.embedding, k=10, n_probe=4
            ).collect()
        }
        hits += len(truth & got)
        total += len(truth)
    recall = hits / total
    rand_baseline = 10 / emb.count()
    assert recall >= 5 * rand_baseline, (
        f"IVF-PQ serving recall@10 {recall:.2f} vs random "
        f"{rand_baseline:.3f}"
    )


def test_compact_ivf_index_one_file_per_bucket_same_results(
    spark, sf_dir, tmp_path
):
    """Index lifecycle close-out: after two append batches every bucket
    holds 3 file sets; compaction must leave exactly one data file per
    bucket, preserve both sidecars and the commit marker, and change
    NO probe result."""
    import glob
    import os

    from pyspark.sql import functions as F

    from data_pipeline_ine_spark.sources.ivf_index import (
        append_to_ivf_index,
        compact_ivf_index,
        index_ready,
        read_ivf_probe,
        write_ivf_index,
    )
    from data_pipeline_ine_spark.sources.registry import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "ivf_compact")
    write_ivf_index(emb.filter(F.col("vec_id") < 300), path, part_col=None,
                    n_clusters=4, iters=1)
    for lo, hi in ((300, 400), (400, 600)):
        append_to_ivf_index(
            emb.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < hi))
            .withColumn("vec_id", F.col("vec_id") + 1_000_000),
            path,
        )
    qvec = emb.select("embedding").head()[0]
    before = [tuple(r) for r in read_ivf_probe(spark, path, qvec, k=20,
                                               n_probe=4).collect()]
    files_before = glob.glob(os.path.join(path, "bucket=*", "*.parquet"))
    n_buckets = len(glob.glob(os.path.join(path, "bucket=*")))
    assert len(files_before) > n_buckets  # appends really fragmented it
    n_files = compact_ivf_index(spark, path)
    assert n_files == n_buckets
    assert index_ready(path)
    assert os.path.exists(os.path.join(path, "_centroids"))
    after = [tuple(r) for r in read_ivf_probe(spark, path, qvec, k=20,
                                              n_probe=4).collect()]
    assert after == before


def test_ivf_append_tiebreak_numeric_bucket_order(spark, tmp_path):
    """A distance-TIED append vector must route to the lowest NUMERIC
    bucket id — build-time _assign_clusters' rule — not the lowest
    bucket STRING ('b10' < 'b2'), which diverges once n_clusters > 9
    (ADVICE r7). One vector per bucket makes each centroid the vector
    itself; [1,0] is exactly equidistant (1.0, IEEE-exact) from
    b2=[0,0] and b10=[2,0], and every other centroid is far away."""
    from pyspark.sql import functions as F

    from data_pipeline_ine_spark.sources.ivf_index import (
        append_to_ivf_index,
        write_ivf_index,
    )

    def vec(i: int) -> list[float]:
        if i == 2:
            return [0.0, 0.0]
        if i == 10:
            return [2.0, 0.0]
        return [100.0 + i, 50.0]

    base = spark.createDataFrame(
        [(i, i, vec(i)) for i in range(11)],
        "vec_id long, label int, embedding array<double>",
    )
    path = str(tmp_path / "ivf_tie")
    write_ivf_index(base, path, part_col="label")
    tied = spark.createDataFrame(
        [(100, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    append_to_ivf_index(tied, path)
    got = (
        spark.read.parquet(path)
        .filter(F.col("vec_id") == 100)
        .select("bucket")
        .head()[0]
    )
    assert got == "b2", f"tied vector routed to {got}, expected b2"


def test_index_ready_recovers_from_crashed_compaction(
    spark, sf_dir, tmp_path
):
    """Crash-window recovery: between compact_ivf_index's two
    os.replace calls there is no index at ``path`` at all — the live
    data sits at path+'.old' (and the committed stage, if finished, at
    path+'.compacting'). index_ready must self-heal from either side
    of the window and probes must return the pre-crash results."""
    import os
    import shutil

    from pyspark.sql import functions as F

    from data_pipeline_ine_spark.sources.ivf_index import (
        index_ready,
        read_ivf_probe,
        write_ivf_index,
    )
    from data_pipeline_ine_spark.sources.registry import load_table

    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < 200
    )
    qvec = emb.select("embedding").head()[0]
    path = str(tmp_path / "ivf_crash")
    write_ivf_index(emb, path, part_col=None, n_clusters=4, iters=1)
    expected = [
        tuple(r)
        for r in read_ivf_probe(spark, path, qvec, k=10, n_probe=2).collect()
    ]

    # crash AFTER os.replace(path, old), BEFORE the stage swap, stage
    # fully committed: recovery must finish the swap from the stage
    shutil.copytree(path, path + ".compacting")
    os.replace(path, path + ".old")
    assert index_ready(path)  # self-heals
    assert not os.path.exists(path + ".old")
    got = [
        tuple(r)
        for r in read_ivf_probe(spark, path, qvec, k=10, n_probe=2).collect()
    ]
    assert got == expected

    # crash with an UNCOMMITTED stage (no marker): fall back to .old
    stage = path + ".compacting"
    shutil.copytree(path, stage)
    os.remove(os.path.join(stage, "_index_success"))
    os.replace(path, path + ".old")
    assert index_ready(path)
    assert not os.path.exists(stage)
    got = [
        tuple(r)
        for r in read_ivf_probe(spark, path, qvec, k=10, n_probe=2).collect()
    ]
    assert got == expected


def test_ivf_drift_report_flags_drifted_buckets(spark, tmp_path):
    """The append -> drift -> retrain path: a bucket whose appended
    vectors sit far from its frozen centroid must flag retrain=1; a
    bucket whose appends match the build-time distribution must not.
    Counts reconcile per cohort and means are e6-exact."""
    from pyspark.sql import functions as F

    from data_pipeline_ine_spark.sources.ivf_index import (
        append_to_ivf_index,
        ivf_drift_report,
        write_ivf_index,
    )

    # two tight buckets around (0,0) and (100,100); base ids < 1000
    base = spark.createDataFrame(
        [(i, 0, [float(i % 3), 0.0]) for i in range(6)]
        + [(10 + i, 1, [100.0 + i % 3, 100.0]) for i in range(6)],
        "vec_id long, label int, embedding array<double>",
    )
    path = str(tmp_path / "drift_idx")
    write_ivf_index(base, path, part_col="label")
    # appends: bucket 0 gets in-distribution rows; bucket 1 gets rows
    # 30 units off its centroid (still nearest to it, but drifted)
    extra = spark.createDataFrame(
        [(1000 + i, [float(i % 3), 0.0]) for i in range(4)]
        + [(2000 + i, [130.0 + i % 3, 100.0]) for i in range(4)],
        "vec_id long, embedding array<double>",
    )
    append_to_ivf_index(extra, path)

    rows = {
        r.bucket: r
        for r in ivf_drift_report(
            spark, path, F.col("vec_id") >= 1000
        ).collect()
    }
    assert rows["b0"].n_base == 6 and rows["b0"].n_new == 4
    assert rows["b1"].n_base == 6 and rows["b1"].n_new == 4
    assert rows["b0"].retrain == 0
    assert rows["b1"].retrain == 1
    # drifted cohort's mean distance really is ~30^2 * 1e6 scale
    assert rows["b1"].mean_e6_new > 25 * rows["b1"].mean_e6_base

    # no appends at all: n_new = 0 everywhere, NULL new-means, no flags
    clean = ivf_drift_report(spark, path, F.col("vec_id") >= 10**9)
    for r in clean.collect():
        assert r.n_new == 0 and r.mean_e6_new is None and r.retrain == 0


def test_mixture_pipeline_one_shuffle_per_stage(spark, sf_dir):
    """The composed corpus-assembly stage (cap -> mix -> pack ->
    manifest) must keep curation_pipeline's discipline: the mixture
    filter is map-side (no exchange of its own), the packing window
    shuffles ONCE on (source, shard), and the manifest aggregate reuses
    that same partitioning — no cartesian, no extra corpus shuffle."""
    df = contract.queries()["mixture_pipeline"](spark, sf_dir)
    plan = explain_str(df, mode="simple")
    assert "Cartesian" not in plan and "NestedLoop" not in plan, plan
    # exactly one (source, shard) exchange feeds BOTH the packing
    # window and the stacked manifest aggregates; the other source-keyed
    # exchanges are the cap's two-pass branches — one corpus-scale
    # (source,_pid) plus the |sources|x|partitions|-row offsets frame
    assert plan.count("Exchange hashpartitioning(source") <= 4, plan
    import re

    assert len(re.findall(r"hashpartitioning\(source#\d+, shard", plan)) == 1, plan


def test_ann_batch_probe_pruned_scan_equijoin_and_parity(
    spark, sf_dir, tmp_path
):
    """Batched serving (read_ivf_probe_batch): the shared scan must be
    partition-pruned to the UNION of probed buckets (static
    PartitionFilters on the bucket column), queries attach via a
    broadcast EQUI-join (never a nested-loop membership test), and
    each query's top-k must equal its single-query read_ivf_probe."""
    from pyspark.sql import functions as F

    from data_pipeline_ine_spark.sources.ivf_index import (
        read_ivf_probe,
        read_ivf_probe_batch,
        write_ivf_index,
    )
    from data_pipeline_ine_spark.sources.registry import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "ivf_batch")
    write_ivf_index(emb, path, part_col="label")
    queries = [
        (int(r.vec_id), list(r.embedding))
        for r in emb.filter(F.col("vec_id") < 3)
        .select("vec_id", "embedding")
        .collect()
    ]
    batch = read_ivf_probe_batch(spark, path, queries, k=5, n_probe=2)
    plan = explain_str(batch)
    pf = plan.split("PartitionFilters", 1)
    assert len(pf) == 2 and "bucket" in pf[1].splitlines()[0], plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan

    got = {
        (r.query_id, r.rank): r.vec_id for r in batch.collect()
    }
    for qid, vec in queries:
        single = read_ivf_probe(spark, path, vec, k=5, n_probe=2).collect()
        for i, r in enumerate(single):
            assert got[(qid, i + 1)] == r.vec_id, (qid, i)


def test_ann_batch_probe_rejects_duplicate_query_ids(spark, sf_dir, tmp_path):
    """Duplicate query ids would merge two queries into one rank
    partition and interleave their top-k — refuse loudly."""
    import pytest

    from data_pipeline_ine_spark.sources.ivf_index import (
        read_ivf_probe_batch,
        write_ivf_index,
    )
    from data_pipeline_ine_spark.sources.registry import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "ivf_dup")
    write_ivf_index(emb, path, part_col="label")
    v = emb.select("embedding").head()[0]
    with pytest.raises(ValueError, match="duplicate query ids"):
        read_ivf_probe_batch(spark, path, [(1, v), (1, v)])


def test_ivfpq_batch_probe_pruned_and_matches_single(
    spark, sf_dir, tmp_path
):
    """Batched ADC serving (read_ivfpq_probe_batch): pruned shared
    codes scan, broadcast equi-join carrying each query's integer LUT,
    per-query results identical to read_ivfpq_probe."""
    from pyspark.sql import functions as F

    from data_pipeline_ine_spark.sources.ivf_index import (
        read_ivfpq_probe,
        read_ivfpq_probe_batch,
        write_ivfpq_index,
    )
    from data_pipeline_ine_spark.sources.registry import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "ivfpq_batch")
    write_ivfpq_index(emb, path, part_col="label")
    queries = [
        (int(r.vec_id), list(r.embedding))
        for r in emb.filter(F.col("vec_id") < 3)
        .select("vec_id", "embedding")
        .collect()
    ]
    batch = read_ivfpq_probe_batch(spark, path, queries, k=5, n_probe=2)
    plan = explain_str(batch)
    pf = plan.split("PartitionFilters", 1)
    assert len(pf) == 2 and "bucket" in pf[1].splitlines()[0], plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "embedding" not in plan.split("ReadSchema:")[1].splitlines()[0]

    got = {(r.query_id, r.rank): (r.vec_id, r.pq_dist) for r in batch.collect()}
    for qid, vec in queries:
        single = read_ivfpq_probe(spark, path, vec, k=5, n_probe=2).collect()
        for i, r in enumerate(single):
            assert got[(qid, i + 1)] == (r.vec_id, r.pq_dist), (qid, i)


def test_ivfpq_rerank_recall_at_least_adc(spark, sf_dir, tmp_path):
    """Two-stage retrieval (read_ivfpq_rerank): the exact re-rank over
    the ADC shortlist must recall AT LEAST as much of the true exact
    top-k as the plain ADC ranking (measured, not guessed — averaged
    over 5 query vectors), the raw-vector read touches only the
    shortlist (pushed-down id filter), and rerank == exact whenever
    the shortlist covers the probed buckets entirely."""
    from pyspark.sql import functions as F

    from data_pipeline_ine_spark.operators.similarity import (
        brute_force_topk,
    )
    from data_pipeline_ine_spark.sources.ivf_index import (
        read_ivf_probe,
        read_ivfpq_probe,
        read_ivfpq_rerank,
        write_ivfpq_index,
    )
    from data_pipeline_ine_spark.sources.registry import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "ivfpq_rr")
    write_ivfpq_index(emb, path, part_col="label")

    k = 10
    adc_hits = rr_hits = 0
    for qid in range(5):
        vec = emb.filter(F.col("vec_id") == qid).select(
            "embedding"
        ).head()[0]
        truth = {
            r.vec_id for r in brute_force_topk(emb, vec, k).collect()
        }
        adc = {
            r.vec_id
            for r in read_ivfpq_probe(spark, path, vec, k=k).collect()
        }
        rr = read_ivfpq_rerank(
            spark, path, emb, vec, k=k, shortlist=50
        )
        rr_ids = {r.vec_id for r in rr.collect()}
        adc_hits += len(truth & adc)
        rr_hits += len(truth & rr_ids)
    assert rr_hits >= adc_hits, (rr_hits, adc_hits)

    # the raw read is a pushed-down id point-lookup, not a table scan
    plan = explain_str(rr)
    assert "PushedFilters" in plan and "In(vec_id" in plan.split(
        "PushedFilters"
    )[1].splitlines()[0], plan


def test_ivf_drift_report_flags_bucket_with_no_base_cohort(
    spark, tmp_path
):
    """A bucket where EVERY member is classified appended (n_base = 0)
    has no drift baseline — the most-drifted possible state — and must
    flag retrain=1; the NULL base inertia previously made the
    cross-multiplied comparison NULL -> never flag (ADVICE r8)."""
    from pyspark.sql import functions as F

    from data_pipeline_ine_spark.sources.ivf_index import (
        append_to_ivf_index,
        ivf_drift_report,
        write_ivf_index,
    )

    base = spark.createDataFrame(
        [(i, 0, [float(i % 3), 0.0]) for i in range(6)]
        + [(10 + i, 1, [100.0 + i % 3, 100.0]) for i in range(6)],
        "vec_id long, label int, embedding array<double>",
    )
    path = str(tmp_path / "drift_nb0")
    write_ivf_index(base, path, part_col="label")
    extra = spark.createDataFrame(
        [(1000 + i, [float(i % 3), 0.0]) for i in range(4)]
        + [(2000 + i, [100.0 + i % 3, 100.0]) for i in range(4)],
        "vec_id long, embedding array<double>",
    )
    append_to_ivf_index(extra, path)

    # new_pred >= 10 swallows ALL of bucket b1 (base ids 10..15 and its
    # appends): n_base = 0 there, so retrain must flag unconditionally
    rows = {
        r.bucket: r
        for r in ivf_drift_report(
            spark, path, F.col("vec_id") >= 10
        ).collect()
    }
    assert rows["b1"].n_base == 0 and rows["b1"].n_new == 10
    assert rows["b1"].mean_e6_base is None
    assert rows["b1"].retrain == 1
    # b0 keeps its base cohort and its appends are in-distribution
    assert rows["b0"].n_base == 6 and rows["b0"].retrain == 0


def test_recover_ivf_index_lost_race_treated_as_recovered(
    spark, tmp_path, monkeypatch
):
    """Two readers (or a reader and the compactor) can race the same
    recovery rename; the loser's os.replace raises FileNotFoundError
    AFTER the winner already restored the index. That is a recovered
    state, not an error (ADVICE r8)."""
    import os

    from data_pipeline_ine_spark.sources import ivf_index as M

    path = str(tmp_path / "ivf_race")
    # committed stage, no live index — the mid-swap crash window
    os.makedirs(path + ".compacting")
    with open(os.path.join(path + ".compacting", "_index_success"), "w") as f:
        f.write("ok\n")

    real_replace = os.replace

    def racing_replace(src, dst):
        # the winner lands first, then our call finds src gone
        real_replace(src, dst)
        raise FileNotFoundError(src)

    monkeypatch.setattr(os, "replace", racing_replace)
    assert M.recover_ivf_index(path) is True
    monkeypatch.undo()
    assert os.path.exists(os.path.join(path, "_index_success"))

    # same race on the .old fallback path
    path2 = str(tmp_path / "ivf_race2")
    os.makedirs(path2 + ".old")
    with open(os.path.join(path2 + ".old", "_index_success"), "w") as f:
        f.write("ok\n")
    monkeypatch.setattr(os, "replace", racing_replace)
    assert M.recover_ivf_index(path2) is True
    monkeypatch.undo()
    assert os.path.exists(os.path.join(path2, "_index_success"))


def test_ivfpq_rerank_batch_one_lookup_matches_single(
    spark, sf_dir, tmp_path
):
    """Batched two-stage retrieval (read_ivfpq_rerank_batch): Q queries
    re-rank from ONE pushed-down id-set lookup (union of shortlists) —
    the raw read is a point-lookup filter, queries attach via broadcast
    equi-joins, and per-query results are identical to Q single-query
    read_ivfpq_rerank calls."""
    from pyspark.sql import functions as F

    from data_pipeline_ine_spark.sources.ivf_index import (
        read_ivfpq_rerank,
        read_ivfpq_rerank_batch,
        write_ivfpq_index,
    )
    from data_pipeline_ine_spark.sources.registry import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "ivfpq_rrb")
    write_ivfpq_index(emb, path, part_col="label")
    queries = [
        (int(r.vec_id), list(r.embedding))
        for r in emb.filter(F.col("vec_id") < 3)
        .select("vec_id", "embedding")
        .collect()
    ]
    batch = read_ivfpq_rerank_batch(
        spark, path, emb, queries, k=5, shortlist=30, n_probe=2
    )
    plan = explain_str(batch)
    # stage 2's raw-vector read: pushed-down id point-lookup set
    assert "PushedFilters" in plan and "In(vec_id" in plan.split(
        "PushedFilters"
    )[1].splitlines()[0], plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan

    got = {
        (r.query_id, r.rank): (r.vec_id, r.cosine_sim)
        for r in batch.collect()
    }
    for qid, vec in queries:
        single = read_ivfpq_rerank(
            spark, path, emb, vec, k=5, shortlist=30, n_probe=2
        ).collect()
        for i, r in enumerate(single):
            assert got[(qid, i + 1)] == (r.vec_id, r.cosine_sim), (qid, i)


def test_rebuild_ivf_index_retrains_and_preserves_lifecycle(
    spark, sf_dir, tmp_path
):
    """The drift-recovery rebuild: retrain the quantizer on the CURRENT
    corpus and rewrite the index — rows preserved exactly, probe
    results equal to a fresh build of the same rows, _batch_commits
    markers carried across (a post-rebuild replay must still skip), and
    a refusal both while a staged batch is in flight and on codes-only
    IVF-PQ indexes (no raw vectors to retrain from)."""
    import os

    import pytest as _pytest
    from pyspark.sql import functions as F

    from data_pipeline_ine_spark.sources.ivf_index import (
        read_ivf_probe,
        rebuild_ivf_index,
        write_ivf_index,
        write_ivfpq_index,
    )
    from data_pipeline_ine_spark.sources.registry import load_table
    from data_pipeline_ine_spark.streaming.index_maintenance import (
        append_batch_to_ivf_index,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "ivf_rebuild")
    write_ivf_index(
        emb.filter(F.col("vec_id") < 250), path, part_col="label"
    )
    batch = emb.filter(F.col("vec_id") >= 250).drop("label")
    assert append_batch_to_ivf_index(batch, 4, path) is True
    before = spark.read.parquet(path)
    n_rows = before.count()
    id_sum = before.agg(F.sum("vec_id")).first()[0]

    # refuse while a staged batch is in flight
    stage = os.path.join(path, ".batches", "b9")
    os.makedirs(stage)
    with open(os.path.join(stage, "x.parquet"), "w") as f:
        f.write("x")
    with _pytest.raises(RuntimeError, match="in-flight staged batches"):
        rebuild_ivf_index(spark, path)
    import shutil as _sh

    _sh.rmtree(os.path.join(path, ".batches"))

    n_buckets = rebuild_ivf_index(spark, path, n_clusters=4, iters=1)
    after = spark.read.parquet(path)
    assert after.count() == n_rows
    assert after.agg(F.sum("vec_id")).first()[0] == id_sum
    assert 1 <= n_buckets <= 4

    # the rebuilt index IS a fresh deterministic build of the same rows
    fresh = str(tmp_path / "ivf_fresh")
    write_ivf_index(
        emb.select("vec_id", "embedding"), fresh, part_col=None,
        n_clusters=4, iters=1,
    )
    qvec = emb.select("embedding").head()[0]
    got = [tuple(r) for r in read_ivf_probe(
        spark, path, qvec, k=10, n_probe=2).collect()]
    want = [tuple(r) for r in read_ivf_probe(
        spark, fresh, qvec, k=10, n_probe=2).collect()]
    assert got == want

    # batch-commit markers survived: the committed batch still skips
    assert os.path.exists(os.path.join(path, "_batch_commits", "b4"))
    assert append_batch_to_ivf_index(batch, 4, path) is False
    assert spark.read.parquet(path).count() == n_rows

    # codes-only IVF-PQ: refuse (raw vectors are gone by design)
    pq = str(tmp_path / "pq_idx")
    write_ivfpq_index(emb, pq, part_col="label")
    with _pytest.raises(ValueError, match="codes-only"):
        rebuild_ivf_index(spark, pq)


def test_maintenance_refuses_when_markers_move_mid_rewrite(tmp_path):
    """The compaction/rebuild TOCTOU guard (review r9): a streaming
    batch that commits AFTER the rewrite snapshot makes the staged copy
    stale — its rows are absent but its marker would be carried. The
    re-check must raise, name the moved markers, and delete the stage
    so the maintenance job retries on fresh state."""
    import os

    import pytest

    from data_pipeline_ine_spark.sources.ivf_index import (
        _batch_markers,
        _refuse_if_markers_moved,
    )

    path = tmp_path / "idx"
    (path / "_batch_commits").mkdir(parents=True)
    (path / "_batch_commits" / "b1").write_text("ok")
    t0 = _batch_markers(str(path))
    stage = tmp_path / "idx.compacting"
    stage.mkdir()

    # no movement: a no-op
    _refuse_if_markers_moved(str(path), t0, str(stage), "compact")
    assert stage.exists()

    # a batch commits mid-rewrite
    (path / "_batch_commits" / "b2").write_text("ok")
    with pytest.raises(RuntimeError, match="moved during the rewrite"):
        _refuse_if_markers_moved(str(path), t0, str(stage), "compact")
    assert not stage.exists()  # stale stage deleted -> clean retry

    # an in-flight staged batch also refuses
    stage.mkdir()
    os.remove(path / "_batch_commits" / "b2")
    (path / ".batches" / "b3").mkdir(parents=True)
    with pytest.raises(RuntimeError, match="in-flight"):
        _refuse_if_markers_moved(str(path), t0, str(stage), "compact")


def test_sq8_code_expr_saturates_instead_of_wrapping(spark):
    """ADVICE r9: the JVM-side SQ8 encoder clamps the LONG floor result
    BEFORE the narrowing int cast, so an append of a vector far outside
    the frozen affine grid saturates to 0/255 exactly like the
    driver-side twin _sq8_code_py — a clamp placed after an eager
    non-ANSI long->int cast would wrap (scaled >= 2^31) and could store
    a silently in-range wrong code."""
    from pyspark.sql import functions as F

    from data_pipeline_ine_spark.sources.ivf_index import (
        _sq8_code_expr,
        _sq8_code_py,
    )

    mins, spans = [0.0, 0.0, 0.0], [1.0, 1.0, 0.0]
    # dim 1: +1e12 scaled to ~2.55e14 (>> 2^31)  -> must saturate 255
    # dim 2: -1e12                               -> must saturate 0
    # dim 3: zero-span dim                       -> fixed 0
    vec = [1.0e12, -1.0e12, 42.0]
    df = spark.createDataFrame([(vec,)], "v array<double>").select(
        _sq8_code_expr(F.col("v"), mins, spans).alias("codes")
    )
    got = df.first()[0]
    assert got == [255, 0, 0], got
    assert got == [
        _sq8_code_py(x, m, s) for x, m, s in zip(vec, mins, spans)
    ]
    # in-grid values are untouched by the reordering
    ok = spark.createDataFrame([([0.5, 0.25, 9.9],)], "v array<double>")
    assert ok.select(
        _sq8_code_expr(F.col("v"), mins, spans).alias("c")
    ).first()[0] == [128, 64, 0]


def test_sq8_rerank_batch_accepts_string_ids(spark, tmp_path):
    """ADVICE r9: batch rerank derives the shortlist-pairs id type from
    the raw-vectors schema (_shortlist_pairs) instead of hardcoding
    bigint — a corpus keyed by string ids must shortlist, point-lookup,
    and re-rank identically to the single-query path."""
    from pyspark.sql import functions as F

    from data_pipeline_ine_spark.sources.ivf_index import (
        read_sq8_rerank,
        read_sq8_rerank_batch,
        write_sq8_index,
    )
    from data_pipeline_ine_spark.sources.registry import load_table

    emb = (
        load_table(spark, "/root/testdata/sf0.001", "embeddings")
        .withColumn("vid", F.concat(F.lit("doc-"), F.col("vec_id")))
        .drop("vec_id")
    )
    path = str(tmp_path / "sq8_strid")
    write_sq8_index(emb, path, part_col="label", id_col="vid")
    queries = [
        (i, list(r.embedding))
        for i, r in enumerate(
            emb.orderBy("vid").select("embedding").head(2)
        )
    ]
    batch = read_sq8_rerank_batch(
        spark, path, emb, queries, k=5, shortlist=20, n_probe=2,
        id_col="vid",
    ).collect()
    assert len(batch) == 10
    assert all(isinstance(r.vid, str) for r in batch)
    for qid, v in queries:
        single = read_sq8_rerank(
            spark, path, emb, v, k=5, shortlist=20, n_probe=2,
            id_col="vid",
        ).collect()
        got = sorted(
            (r.vid, r.cosine_sim) for r in batch if r.query_id == qid
        )
        want = sorted((r.vid, r.cosine_sim) for r in single)
        assert got == want


def test_sq8_recall_curve_hand_anchored(spark):
    """Hand-anchored meaning test for sq8_recall_curve (the oracle can
    be blind to both-sides-identical bugs): a constructed 2-bucket
    corpus where the query's SECOND-best exact neighbor lives in the
    bucket probed SECOND — recall@2 must be exactly 0.5 at n_probe=1
    and exactly 1.0 at n_probe=2, with the code-space order verified
    by hand (dist(v0)=0 < dist(v2)=712 < dist(v1)=2770 on the global
    affine grid)."""
    from data_pipeline_ine_spark.operators.similarity import (
        sq8_recall_curve,
    )

    rows = [
        # bucket 0: the query itself + a decoy that is NOT the true #2
        (0, 0, [1.0, 0.0, 0.0, 0.0]),
        (1, 0, [0.9, 0.1, 0.0, 0.0]),
        # bucket 1: the true #2 by exact cosine + far fillers that pull
        # the bucket-1 centroid away from the query
        (2, 1, [0.95, 0.05, 0.0, 0.0]),
        (3, 1, [-1.0, 0.5, 0.5, 0.0]),
        (4, 1, [-1.0, 0.5, 0.5, 0.0]),
    ]
    df = spark.createDataFrame(
        rows, "vec_id bigint, label int, embedding array<double>"
    )
    out = {
        int(r.n_probe): (int(r.hits), float(r.recall))
        for r in sq8_recall_curve(
            df, [1.0, 0.0, 0.0, 0.0], n_probes=(1, 2), k=2
        ).collect()
    }
    # exact top-2 = {0 (sim 1.0), 2 (sim .9987)}; probe order is
    # bucket 0 first (centroid ~ query), so n_probe=1 sees {0, 1}
    assert out[1] == (1, 0.5), out
    assert out[2] == (2, 1.0), out


def test_filtered_ann_selectivity_sweep_and_probe_escalation(
    spark, sf_dir, tmp_path
):
    """Pins filtered ANN's selectivity behavior (VERDICT r9 #4): at
    EVERY selectivity the result equals brute force over the
    probed-AND-matching rows (the documented post-filter semantics),
    and the recall caveat is real and bounded — a selective predicate
    under a small probe budget can miss true filtered neighbors in
    unprobed buckets, and raising n_probe to the bucket count recovers
    the exact filtered top-k. That recovery IS the escalation rule
    documented in SCALING.md (n_probe ~ budget/selectivity)."""
    from pyspark.sql import functions as F

    from data_pipeline_ine_spark.operators.similarity import cosine
    from data_pipeline_ine_spark.sources.ivf_index import (
        read_ivf_probe,
        write_ivf_index,
    )
    from data_pipeline_ine_spark.sources.registry import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    qvec = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0)
        .select("embedding")
        .first()[0]
    ]
    path = str(tmp_path / "ivf_sel")
    write_ivf_index(emb, path, part_col="label")
    n_buckets = emb.select("label").distinct().count()
    max_id = emb.agg(F.max("vec_id")).first()[0]
    q = F.array(*[F.lit(x) for x in qvec])

    def exact_filtered(pred, probed_labels=None):
        base = emb.filter(pred) if pred is not None else emb
        if probed_labels is not None:
            base = base.filter(F.col("label").isin(probed_labels))
        return [
            (r.vec_id, r.s)
            for r in base.select(
                "vec_id",
                F.round(cosine(F.col("embedding"), q), 6).alias("s"),
            )
            .orderBy(F.desc("s"), F.asc("vec_id"))
            .limit(10)
            .collect()
        ]

    probed2 = [
        r.label
        for r in read_ivf_probe(spark, path, qvec, k=10_000, n_probe=2)
        .join(emb.select("vec_id", "label"), "vec_id")
        .select("label")
        .distinct()
        .collect()
    ]
    # selectivity sweep: ~100% / ~50% / ~10% / ~2% of the corpus
    for frac in (1.0, 0.5, 0.1, 0.02):
        cut = int(max_id * (1.0 - frac))
        pred = F.col("vec_id") >= cut
        got = [
            (r.vec_id, r.cosine_sim)
            for r in read_ivf_probe(
                spark, path, qvec, k=10, n_probe=2, where=pred
            ).collect()
        ]
        # post-filter semantics: exact over probed ∩ matching, always
        assert got == exact_filtered(pred, probed2), frac

    # escalation: full probe budget == exact filtered top-k, even at
    # the most selective setting
    tight = F.col("vec_id") >= int(max_id * 0.98)
    full = [
        (r.vec_id, r.cosine_sim)
        for r in read_ivf_probe(
            spark, path, qvec, k=10, n_probe=n_buckets, where=tight
        ).collect()
    ]
    assert full == exact_filtered(tight, None)


def test_filtered_probe_contract_rows_push_both_filter_layers(
    spark, sf_dir
):
    """The two filtered-ANN contract rows must carry BOTH pruning
    layers in one scan: the probe list as a static PartitionFilters on
    the bucket key AND the payload predicate as a PushedFilters entry
    — only probed-and-matching rows are ever decoded."""
    for name in ("ann_ivf_filtered_probe", "ann_sq8_filtered_probe"):
        df = contract.queries()[name](spark, sf_dir)
        plan = explain_str(df)
        pf = plan.split("PartitionFilters", 1)
        assert len(pf) == 2 and "bucket" in pf[1].splitlines()[0], (
            name, plan,
        )
        pushed = plan.split("PushedFilters", 1)
        assert len(pushed) == 2, (name, plan)
        first = pushed[1].splitlines()[0]
        assert "GreaterThanOrEqual(vec_id" in first, (name, first)


def test_knn_graph_memo_shares_one_materialized_graph(spark, sf_dir):
    """The r10 memo extension: a content-keyed knn_join_blocked call
    localCheckpoints the ranked graph once per session; a second call
    with the same key returns the SAME frame (no second pair join),
    knn_hubness composes over it, results are identical to the
    unmemoized path, and a different key never aliases."""
    from data_pipeline_ine_spark.operators import similarity as S
    from data_pipeline_ine_spark.sources.registry import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    key = f"memo-test-{sf_dir}"
    S._KNN_GRAPH_MEMO.clear()
    g1 = S.knn_join_blocked(emb, k=5, memo_key=key)
    n1 = g1.count()  # materializes the checkpoint
    g2 = S.knn_join_blocked(emb, k=5, memo_key=key)
    assert g2 is g1  # the memo hit, not a rebuilt plan
    # hubness with the same key composes over the SAME graph
    hub_memo = sorted(
        map(tuple, S.knn_hubness(emb, k=5, memo_key=key).collect())
    )
    hub_plain = sorted(map(tuple, S.knn_hubness(emb, k=5).collect()))
    assert hub_memo == hub_plain
    # unmemoized call matches the memoized graph row-for-row
    plain = sorted(map(tuple, S.knn_join_blocked(emb, k=5).collect()))
    assert sorted(map(tuple, g1.collect())) == plain and n1 == len(plain)
    # a different k is a different graph, never aliased
    g3 = S.knn_join_blocked(emb, k=3, memo_key=key)
    assert g3 is not g1
    S._KNN_GRAPH_MEMO.clear()


def test_curation_v3_composes_without_barriers(spark, sf_dir):
    """The composed r10-gate stack (gopher -> LM gate -> decontam ->
    DSIR -> chunking) must stay ONE declarative plan: no cartesian or
    non-equi fallback anywhere, no Python in the hot path, and exactly
    ONE range exchange — the final per-source ``orderBy`` (dsir's
    two-pass cumsum range exchange sits below the sampling module's
    own correctness-bearing boundary checkpoint and is pinned by its
    unit tests). Asserted on the FULL lazy plan built under
    ``checkpoints_disabled()`` (ADVICE r12: with the in-query lineage
    cuts active, explain() only showed the post-checkpoint tail and
    the pin was vacuous), so every gate's join topology is visible:
    gates compose as semi-joins of per-doc flags, the corpus is never
    collected or pairwise-joined between stages, and the whole stack
    reads ONE shared tokenization of ``documents``."""
    from data_pipeline_ine_spark.functions.lineage import (
        checkpoints_disabled,
    )

    with checkpoints_disabled():
        plan = explain_str(
            contract.queries()["curation_v3"](spark, sf_dir),
            mode="simple",
        )
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "BatchEvalPython" not in plan, plan
    assert plan.count("Exchange rangepartitioning") == 1, plan
    # the chunk explode sits ABOVE the DSIR budget filter: chunking
    # only ever runs on selected documents
    assert "Generate explode" in plan, plan
    # runtime mode: the cuts are live — the executed tail must show
    # the checkpoint scans instead of re-executed gate subtrees
    rt = explain_str(
        contract.queries()["curation_v3"](spark, sf_dir), mode="simple"
    )
    assert "Scan ExistingRDD" in rt, rt


def test_binary_index_probe_is_pruned_and_matches_inplan_codes(
    spark, sf_dir, tmp_path
):
    """The binary index (sources/ivf_index.py::write_binary_index/
    read_binary_probe): probing must reach the parquet scan as a static
    PartitionFilters entry on the bucket column (8-byte codes, unprobed
    buckets never read), the stored packed words must equal the in-plan
    packing (operators/similarity.py::_bq_word_cols over the same
    midpoints), and the two-stage read_binary_rerank must return the
    exact cosine order over its Hamming shortlist."""
    from pyspark.sql import functions as F

    from data_pipeline_ine_spark.operators.similarity import (
        _bq_query_words,
        binary_midpoints,
        cosine,
    )
    from data_pipeline_ine_spark.sources.ivf_index import (
        read_binary_probe,
        read_binary_rerank,
        write_binary_index,
    )
    from data_pipeline_ine_spark.sources.registry import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    path = str(tmp_path / "bq_index")
    write_binary_index(emb, path, part_col="label")

    probed = read_binary_probe(spark, path, qvec, k=10, n_probe=2)
    plan = explain_str(probed)
    pf = plan.split("PartitionFilters", 1)
    assert len(pf) == 2 and "bucket" in pf[1].splitlines()[0], plan

    # stored words == in-plan packing over the same midpoints, and the
    # sidecar midpoints == the operator's binary_midpoints
    mids = binary_midpoints(emb)
    from data_pipeline_ine_spark.sources.ivf_index import _bq_mids

    assert _bq_mids(spark, path) == mids
    stored = {
        r.vec_id: (r.bq_w0, r.bq_w1)
        for r in spark.read.parquet(path)
        .select("vec_id", "bq_w0", "bq_w1")
        .collect()
    }
    some = emb.filter(F.col("vec_id") < 20).collect()
    for r in some:
        want = _bq_query_words(r.embedding, mids)
        assert stored[r.vec_id] == tuple(want)

    # two-stage: the rerank output is exact cosine over the shortlist
    out = read_binary_rerank(
        spark, path, emb, qvec, k=5, shortlist=20, n_probe=10
    )
    rows = out.collect()
    assert len(rows) == 5
    sims = [r.cosine_sim for r in rows]
    assert sims == sorted(sims, reverse=True)
    assert rows[0].vec_id == 0 and rows[0].cosine_sim == 1.0


def test_binary_filtered_probe_pushes_predicate_beside_pruning(
    spark, sf_dir, tmp_path
):
    """Filtered ANN at the binary tier: the payload predicate must reach
    the codes scan as a PushedFilters entry NEXT TO the bucket
    PartitionFilters (the ann_ivf/sq8_filtered_probe rule one rung
    down), and the result must equal brute-force Hamming over the
    probed-AND-matching rows."""
    from pyspark.sql import functions as F

    from data_pipeline_ine_spark.sources.ivf_index import (
        read_binary_probe,
        write_binary_index,
    )
    from data_pipeline_ine_spark.sources.registry import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    path = str(tmp_path / "bq_index")
    write_binary_index(emb, path, part_col="label")
    out = read_binary_probe(
        spark, path, qvec, k=10, n_probe=2,
        where=F.col("vec_id") >= 100,
    )
    plan = explain_str(out)
    pf = plan.split("PartitionFilters", 1)
    assert len(pf) == 2 and "bucket" in pf[1].splitlines()[0], plan
    pushed = plan.split("PushedFilters", 1)
    assert len(pushed) == 2 and "vec_id" in pushed[1].splitlines()[0], plan
    assert all(r.vec_id >= 100 for r in out.collect())


def test_binary_append_frozen_mids_compact_and_rebuild_refusal(
    spark, sf_dir, tmp_path
):
    """Binary maintenance discipline (VERDICT r11 task 2): appends pack
    sign bits under the FROZEN midpoints (sidecar byte-identical,
    codes-only schema kept), compaction carries the _bqparams sidecar
    and preserves probe results bit-for-bit, and rebuild_ivf_index
    refuses the codes-only binary index the same way it refuses PQ and
    SQ8."""
    import pytest
    from pyspark.sql import functions as F

    from data_pipeline_ine_spark.sources.ivf_index import (
        append_to_ivf_index,
        compact_ivf_index,
        read_binary_probe,
        rebuild_ivf_index,
        write_binary_index,
    )
    from data_pipeline_ine_spark.sources.registry import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") < 400)
    extra = emb.filter(F.col("vec_id") >= 400).withColumn(
        "vec_id", F.col("vec_id") + 1_000_000
    )
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    path = str(tmp_path / "bq_inc")
    write_binary_index(base, path, part_col=None, n_clusters=4, iters=1)
    mids_before = sorted(
        (r.d, r.mid)
        for r in spark.read.parquet(f"{path}/_bqparams").collect()
    )
    append_to_ivf_index(extra, path)
    idx = spark.read.parquet(path)
    assert {"vec_id", "bq_w0", "bq_w1", "bucket"} <= set(idx.columns)
    assert "embedding" not in idx.columns
    assert idx.count() == emb.count()
    mids_after = sorted(
        (r.d, r.mid)
        for r in spark.read.parquet(f"{path}/_bqparams").collect()
    )
    assert mids_after == mids_before  # frozen thresholds

    before = [tuple(r) for r in read_binary_probe(
        spark, path, qvec, k=10, n_probe=2
    ).collect()]
    compact_ivf_index(spark, path)
    import os

    assert os.path.exists(f"{path}/_bqparams")  # sidecar carried
    after = [tuple(r) for r in read_binary_probe(
        spark, path, qvec, k=10, n_probe=2
    ).collect()]
    assert after == before
    with pytest.raises(ValueError, match="binary"):
        rebuild_ivf_index(spark, path)


def test_binary_batch_probe_one_scan_and_single_parity(
    spark, sf_dir, tmp_path
):
    """read_binary_probe_batch (VERDICT r11 task 4): Q queries share
    ONE partition-pruned codes scan (a single parquet scan node whose
    PartitionFilters is the probed-bucket union) and each query's rows
    equal the single-query reader exactly."""
    from pyspark.sql import functions as F

    from data_pipeline_ine_spark.sources.ivf_index import (
        read_binary_probe,
        read_binary_probe_batch,
        write_binary_index,
    )
    from data_pipeline_ine_spark.sources.registry import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    qs = [
        (qid, emb.filter(F.col("vec_id") == v).select("embedding")
         .first()[0])
        for qid, v in ((3, 0), (4, 7), (5, 19))
    ]
    path = str(tmp_path / "bq_batch")
    write_binary_index(emb, path, part_col="label")
    out = read_binary_probe_batch(spark, path, qs, k=10, n_probe=2)
    plan = explain_str(out)
    # ONE shared codes scan (single InMemoryFileIndex location — the
    # broadcast probe frame is a LocalTableScan, not a parquet scan)
    assert plan.count("InMemoryFileIndex") == 1, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    pf = plan.split("PartitionFilters", 1)
    assert len(pf) == 2 and "bucket" in pf[1].splitlines()[0], plan
    got = out.collect()
    for qid, v in qs:
        mine = sorted(
            (r["vec_id"], r["hamming"], r["rank"])
            for r in got if r["query_id"] == qid
        )
        single = read_binary_probe(
            spark, path, v, k=10, n_probe=2
        ).collect()
        want = sorted(
            (r["vec_id"], r["hamming"], i + 1)
            for i, r in enumerate(single)
        )
        assert mine == want, (qid, mine, want)


def test_binary_rerank_batch_matches_single(spark, sf_dir, tmp_path):
    """Batched two-stage binary retrieval equals the single-query
    rerank per query id (one pruned codes scan + one pushed-down id
    lookup feeding every query's exact pass)."""
    from pyspark.sql import functions as F

    from data_pipeline_ine_spark.sources.ivf_index import (
        read_binary_rerank,
        read_binary_rerank_batch,
        write_binary_index,
    )
    from data_pipeline_ine_spark.sources.registry import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    qs = [
        (1, emb.filter(F.col("vec_id") == 0).select("embedding")
         .first()[0]),
        (2, emb.filter(F.col("vec_id") == 11).select("embedding")
         .first()[0]),
    ]
    path = str(tmp_path / "bq_rrb")
    write_binary_index(emb, path, part_col="label")
    got = read_binary_rerank_batch(
        spark, path, emb, qs, k=5, shortlist=20, n_probe=2
    ).collect()
    for qid, v in qs:
        mine = [
            (r["vec_id"], r["cosine_sim"])
            for r in sorted(got, key=lambda r: r["rank"])
            if r["query_id"] == qid
        ]
        want = [
            (r["vec_id"], r["cosine_sim"])
            for r in read_binary_rerank(
                spark, path, emb, v, k=5, shortlist=20, n_probe=2
            ).collect()
        ]
        assert mine == want, (qid, mine, want)


def test_rebuild_sq8_and_binary_from_source_retrain_and_carry_markers(
    spark, sf_dir, tmp_path
):
    """Codes-only rebuilds (VERDICT r11 task 2): rebuild_sq8_index /
    rebuild_binary_index re-train BOTH frozen artifacts from the SOURCE
    table (the quant-params sidecar must change to the full-corpus
    grid), produce exactly the index a fresh write of the full corpus
    produces, and carry the _batch_commits replay markers through the
    stage-and-swap."""
    import os

    from pyspark.sql import functions as F

    from data_pipeline_ine_spark.sources.ivf_index import (
        append_to_ivf_index,
        rebuild_binary_index,
        rebuild_sq8_index,
        write_binary_index,
        write_sq8_index,
    )
    from data_pipeline_ine_spark.sources.registry import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") < 400)
    extra = emb.filter(F.col("vec_id") >= 400).drop("label")

    for tier, write_fn, rebuild_fn, side in (
        ("sq8", write_sq8_index, rebuild_sq8_index, "_sqparams"),
        ("bq", write_binary_index, rebuild_binary_index, "_bqparams"),
    ):
        path = str(tmp_path / f"{tier}_rb")
        write_fn(base, path, part_col=None, n_clusters=4, iters=1)
        append_to_ivf_index(extra, path)
        params_frozen = sorted(
            tuple(r) for r in spark.read.parquet(f"{path}/{side}").collect()
        )
        # a committed streaming batch marker must survive the swap
        os.makedirs(f"{path}/_batch_commits", exist_ok=True)
        with open(f"{path}/_batch_commits/b9", "w") as f:
            f.write("ok\n")
        n = rebuild_fn(
            spark, path, emb.drop("label"), part_col=None,
            n_clusters=4, iters=1,
        )
        assert n == 4
        assert os.path.exists(f"{path}/_batch_commits/b9")
        params_new = sorted(
            tuple(r) for r in spark.read.parquet(f"{path}/{side}").collect()
        )
        assert params_new != params_frozen  # grid re-trained
        fresh = str(tmp_path / f"{tier}_fresh")
        write_fn(
            emb.drop("label"), fresh, part_col=None, n_clusters=4, iters=1
        )
        want = sorted(
            tuple(r) for r in spark.read.parquet(f"{fresh}/{side}").collect()
        )
        assert params_new == want
        got_rows = sorted(
            tuple(r)
            for r in spark.read.parquet(path).drop("label").collect()
        )
        want_rows = sorted(
            tuple(r) for r in spark.read.parquet(fresh).collect()
        )
        assert got_rows == want_rows


def test_sq8_quant_drift_report_flags_out_of_grid_cohort(spark, tmp_path):
    """sq8_quant_drift_report: per-dim out-of-grid counts of the RAW
    appended cohort vs the frozen affine bounds, pure-Python twin
    verified; an in-grid cohort reports zero clips and no retrain."""
    from data_pipeline_ine_spark.sources.ivf_index import (
        sq8_quant_drift_report,
        write_sq8_index,
    )

    base = spark.createDataFrame(
        [(i, [float(i % 5), float(10 + i % 3)]) for i in range(20)],
        "vec_id bigint, embedding array<double>",
    )
    path = str(tmp_path / "sq8_qd")
    write_sq8_index(base, path, part_col=None, n_clusters=2, iters=1)
    # frozen grid: d1 in [0,4], d2 in [10,12]
    newv = [
        (100, [4.5, 11.0]),   # d1 above, d2 in-grid
        (101, [-1.0, 11.5]),  # d1 below, d2 in-grid
        (102, [2.0, 9.0]),    # d2 below
        (103, [3.0, 12.0]),   # boundary: NOT outside (strict)
    ]
    new_df = spark.createDataFrame(
        newv, "vec_id bigint, embedding array<double>"
    )
    got = {r["d"]: r for r in sq8_quant_drift_report(
        spark, path, new_df
    ).collect()}
    assert (got[1]["n_clip_lo"], got[1]["n_clip_hi"]) == (1, 1)
    assert (got[2]["n_clip_lo"], got[2]["n_clip_hi"]) == (1, 0)
    assert all(got[d]["n_new"] == 4 for d in (1, 2))
    # 2/4 and 1/4 both exceed the 1% default threshold
    assert got[1]["retrain"] == 1 and got[2]["retrain"] == 1
    ok = sq8_quant_drift_report(
        spark, path,
        spark.createDataFrame(
            [(200, [1.0, 11.0])], "vec_id bigint, embedding array<double>"
        ),
    ).collect()
    assert all(
        r["n_clip_lo"] == 0 and r["n_clip_hi"] == 0 and r["retrain"] == 0
        for r in ok
    )


def test_binary_quant_drift_report_counts_threshold_flips(
    spark, tmp_path
):
    """binary_quant_drift_report: the flip count per dim must equal the
    number of appended values landing between the frozen and the
    re-derived midpoint (pure-Python twin), with e6-snapped midpoints
    and the integer cross-multiplied retrain flag."""
    import math

    from data_pipeline_ine_spark.sources.ivf_index import (
        binary_quant_drift_report,
        write_binary_index,
    )

    base = spark.createDataFrame(
        [(i, [float(i % 11), 5.0 + (i % 7)]) for i in range(22)],
        "vec_id bigint, embedding array<double>",
    )
    path = str(tmp_path / "bq_qd")
    write_binary_index(base, path, part_col=None, n_clusters=2, iters=1)
    # frozen mids: d1 (0+10)/2 = 5.0, d2 (5+11)/2 = 8.0
    newv = [[20.0, 7.5], [22.0, 7.0], [6.0, 9.5], [30.0, 6.5]]
    new_df = spark.createDataFrame(
        [(100 + i, v) for i, v in enumerate(newv)],
        "vec_id bigint, embedding array<double>",
    )
    frozen = [5.0, 8.0]
    newmid = [
        (min(v[d] for v in newv) + max(v[d] for v in newv)) / 2.0
        for d in range(2)
    ]
    want_flips = [
        sum(
            1 for v in newv
            if (v[d] > frozen[d]) != (v[d] > newmid[d])
        )
        for d in range(2)
    ]
    got = {r["d"]: r for r in binary_quant_drift_report(
        spark, path, new_df
    ).collect()}
    for d in (1, 2):
        assert got[d]["n_new"] == 4
        assert got[d]["n_flip"] == want_flips[d - 1], (d, dict(got[d].asDict()))
        assert got[d]["mid_e6_frozen"] == int(
            math.floor(frozen[d - 1] * 1e6 + 0.5)
        )
        assert got[d]["mid_e6_new"] == int(
            math.floor(newmid[d - 1] * 1e6 + 0.5)
        )
        want_retrain = 1 if want_flips[d - 1] * 20 > 4 else 0
        assert got[d]["retrain"] == want_retrain


def test_prefix_index_stage1_scans_only_prefix_column(
    spark, sf_dir, tmp_path
):
    """The stored Matryoshka prefix tier (VERDICT r11 task 3): the
    stage-1 shortlist scan's ReadSchema must contain the narrow stored
    prefix column and NOT the full vector column (the tier's 100 TB
    I/O claim), with static bucket PartitionFilters; the two-stage
    result must match the in-plan prefix_dim_topk_rerank when no
    bucket is pruned away."""
    from pyspark.sql import functions as F

    from data_pipeline_ine_spark.operators.similarity import (
        prefix_dim_topk_rerank,
    )
    from data_pipeline_ine_spark.sources.ivf_index import (
        _prefix_shortlist_frame,
        read_prefix_rerank,
        write_prefix_index,
    )
    from data_pipeline_ine_spark.sources.registry import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    path = str(tmp_path / "pref_idx")
    write_prefix_index(emb, path, prefix_dims=16, part_col="label")
    n_buckets = emb.select("label").distinct().count()

    stage1 = _prefix_shortlist_frame(
        spark, path, qvec, shortlist=30, n_probe=2
    )
    plan = explain_str(stage1)
    read = plan.split("ReadSchema:", 1)[1].splitlines()[0]
    assert "prefix" in read and "embedding" not in read, read
    pf = plan.split("PartitionFilters", 1)
    assert len(pf) == 2 and "bucket" in pf[1].splitlines()[0], plan

    got = [
        (r["vec_id"], r["cosine_sim"])
        for r in read_prefix_rerank(
            spark, path, qvec, k=5, shortlist=30, n_probe=n_buckets
        ).collect()
    ]
    want = [
        (r["vec_id"], r["cosine_sim"])
        for r in prefix_dim_topk_rerank(
            emb, qvec, k=5, shortlist=30, prefix_dims=16
        ).collect()
    ]
    assert got == want


def test_prefix_filtered_and_batch_match_single(spark, sf_dir, tmp_path):
    """Prefix-tier serving symmetry: the where= predicate reaches the
    NARROW stage-1 scan as PushedFilters beside the bucket pruning
    (full-vector column still absent from its ReadSchema), and the
    batched reader equals the single-query rerank per query id."""
    from pyspark.sql import functions as F

    from data_pipeline_ine_spark.sources.ivf_index import (
        _prefix_shortlist_frame,
        read_prefix_rerank,
        read_prefix_rerank_batch,
        write_prefix_index,
    )
    from data_pipeline_ine_spark.sources.registry import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    path = str(tmp_path / "pref_fb")
    write_prefix_index(emb, path, prefix_dims=16, part_col="label")

    stage1 = _prefix_shortlist_frame(
        spark, path, qvec, shortlist=20, n_probe=2,
        where=F.col("vec_id") >= 100,
    )
    plan = explain_str(stage1)
    read = plan.split("ReadSchema:", 1)[1].splitlines()[0]
    assert "prefix" in read and "embedding" not in read, read
    pushed = plan.split("PushedFilters", 1)
    assert len(pushed) == 2 and "vec_id" in pushed[1].splitlines()[0], plan
    out = read_prefix_rerank(
        spark, path, qvec, k=5, shortlist=20, n_probe=2,
        where=F.col("vec_id") >= 100,
    ).collect()
    assert len(out) == 5 and all(r.vec_id >= 100 for r in out)

    qs = [
        (1, qvec),
        (2, emb.filter(F.col("vec_id") == 9).select("embedding")
         .first()[0]),
    ]
    got = read_prefix_rerank_batch(
        spark, path, qs, k=5, shortlist=20, n_probe=2
    ).collect()
    for qid, v in qs:
        mine = [
            (r["vec_id"], r["cosine_sim"])
            for r in sorted(got, key=lambda r: r["rank"])
            if r["query_id"] == qid
        ]
        want = [
            (r["vec_id"], r["cosine_sim"])
            for r in read_prefix_rerank(
                spark, path, v, k=5, shortlist=20, n_probe=2
            ).collect()
        ]
        assert mine == want, (qid, mine, want)


def test_ivfpq_filtered_probe_pushes_predicate_and_matches_unfiltered_semantics(
    spark, sf_dir, tmp_path
):
    """Filtered ANN at the PQ tier: the payload predicate reaches the
    codes scan as PushedFilters beside the bucket PartitionFilters,
    every returned row satisfies it, and the result equals the
    unfiltered ADC ranking restricted to matching rows."""
    from pyspark.sql import functions as F

    from data_pipeline_ine_spark.sources.ivf_index import (
        read_ivfpq_probe,
        write_ivfpq_index,
    )
    from data_pipeline_ine_spark.sources.registry import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    path = str(tmp_path / "pq_filt")
    write_ivfpq_index(emb, path, part_col="label")
    out = read_ivfpq_probe(
        spark, path, qvec, k=10, n_probe=2,
        where=F.col("vec_id") >= 100,
    )
    plan = explain_str(out)
    pf = plan.split("PartitionFilters", 1)
    assert len(pf) == 2 and "bucket" in pf[1].splitlines()[0], plan
    pushed = plan.split("PushedFilters", 1)
    assert len(pushed) == 2 and "vec_id" in pushed[1].splitlines()[0], plan
    got = [(r.vec_id, r.pq_dist) for r in out.collect()]
    assert len(got) == 10 and all(v >= 100 for v, _ in got)
    want = [
        (r.vec_id, r.pq_dist)
        for r in read_ivfpq_probe(
            spark, path, qvec, k=10_000, n_probe=2
        ).collect()
        if r.vec_id >= 100
    ][:10]
    assert got == want


def test_pq_quant_drift_report_numpy_twin_and_shifted_cohort_flags(
    spark, tmp_path
):
    """pq_quant_drift_report: frozen-vs-fresh mean reconstruction
    errors must equal a numpy reference implementation exactly, and a
    cohort shifted far off the training distribution must flag
    retrain=1 in every subspace (its frozen-codebook error dwarfs the
    cohort-derived one)."""
    import numpy as np
    from pyspark.sql import functions as F

    from data_pipeline_ine_spark.sources.ivf_index import (
        pq_quant_drift_report,
        write_ivfpq_index,
    )

    rng = [
        (i, [((i * 31 + d * 17) % 100) / 100.0 for d in range(8)])
        for i in range(24)
    ]
    base = spark.createDataFrame(
        [r for r in rng if r[0] < 12],
        "vec_id bigint, embedding array<double>",
    )
    # appended cohort: same shape, +5.0 offset — way off the frozen
    # codewords, near its own
    newv = [(i, [x + 5.0 for x in v]) for i, v in rng if i >= 12]
    new_df = spark.createDataFrame(
        newv, "vec_id bigint, embedding array<double>"
    )
    path = str(tmp_path / "pq_qd")
    write_ivfpq_index(
        base, path, part_col=None, n_clusters=2, iters=1, m=4, n_codes=4
    )
    got = {r["s"]: r for r in pq_quant_drift_report(
        spark, path, new_df
    ).collect()}

    def q(v):
        return np.floor(np.array(v, dtype=np.float64) * 10000 + 0.5).astype(
            np.int64
        )

    fro = [q(v) for _, v in sorted(rng)[:4]]          # base lowest-ids
    fre = [q(v) for _, v in sorted(newv)[:4]]         # cohort lowest-ids
    sub = 2
    for s in range(4):
        ef = en = 0
        for _, v in newv:
            qv = q(v)[s * sub:(s + 1) * sub]
            ef += min(int(((qv - c[s * sub:(s + 1) * sub]) ** 2).sum())
                      for c in fro)
            en += min(int(((qv - c[s * sub:(s + 1) * sub]) ** 2).sum())
                      for c in fre)
        n = len(newv)
        r = got[s]
        assert (r["n_new"], r["mean_err_frozen"], r["mean_err_fresh"]) == (
            n, ef // n, en // n,
        ), (s, dict(r.asDict()), ef, en)
        assert r["retrain"] == (1 if ef * 2 > en * 3 else 0) == 1


def test_rebuild_ivfpq_from_source_retrains_codebook(
    spark, sf_dir, tmp_path
):
    """rebuild_ivfpq_index re-trains the codebook and bucketing from
    the source table: the codebook sidecar changes to the full-corpus
    one, the rebuilt index equals a fresh full-corpus write, and
    rebuild_ivf_index still refuses the codes-only PQ layout."""
    import pytest
    from pyspark.sql import functions as F

    from data_pipeline_ine_spark.sources.ivf_index import (
        append_to_ivf_index,
        rebuild_ivf_index,
        rebuild_ivfpq_index,
        write_ivfpq_index,
    )
    from data_pipeline_ine_spark.sources.registry import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    # appended cohort owns the LOWEST ids: the untrained codebook is
    # the n_codes lowest-id vectors, so the full-corpus rebuild MUST
    # derive different codewords than the base-only build (a split
    # where the base kept ids 0..7 would leave the codebook unchanged
    # by construction — not a retrain failure)
    base = emb.filter(F.col("vec_id") >= 100)
    extra = emb.filter(F.col("vec_id") < 100).drop("label")
    path = str(tmp_path / "pq_rb")
    # label buckets for the base build: k-means' lowest-id init needs
    # ids < k, which this base deliberately lacks
    write_ivfpq_index(base, path, part_col="label")
    append_to_ivf_index(extra, path)
    cb_frozen = sorted(
        (r.s, r.c, tuple(r.subvec))
        for r in spark.read.parquet(f"{path}/_codebook").collect()
    )
    with pytest.raises(ValueError, match="IVF-PQ"):
        rebuild_ivf_index(spark, path)
    n = rebuild_ivfpq_index(
        spark, path, emb.drop("label"), part_col=None, n_clusters=4,
        iters=1,
    )
    assert n == 4
    cb_new = sorted(
        (r.s, r.c, tuple(r.subvec))
        for r in spark.read.parquet(f"{path}/_codebook").collect()
    )
    assert cb_new != cb_frozen
    fresh = str(tmp_path / "pq_fresh")
    write_ivfpq_index(
        emb.drop("label"), fresh, part_col=None, n_clusters=4, iters=1
    )
    want_cb = sorted(
        (r.s, r.c, tuple(r.subvec))
        for r in spark.read.parquet(f"{fresh}/_codebook").collect()
    )
    assert cb_new == want_cb
    got_rows = sorted(
        tuple(r) for r in spark.read.parquet(path).drop("label").collect()
    )
    want_rows = sorted(
        tuple(r) for r in spark.read.parquet(fresh).collect()
    )
    assert got_rows == want_rows

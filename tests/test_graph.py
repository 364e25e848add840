"""Co-occurrence graph analytics: edges, lift, triangle counting."""
from pyspark.sql import functions as F

from data_pipeline_ine_spark.operators.graph import (
    association_lift,
    cooccurrence_edges,
    triangle_count,
)


def _baskets(spark):
    # baskets: {a,b,c}, {a,b}, {a,c}, {d}
    rows = [
        (1, "a"), (1, "b"), (1, "c"),
        (2, "a"), (2, "b"),
        (3, "a"), (3, "c"),
        (4, "d"),
    ]
    return spark.createDataFrame(rows, "basket long, item string")


def test_cooccurrence_edges_counts_distinct_baskets(spark):
    df = _baskets(spark).unionAll(_baskets(spark))  # dup rows must not double-count
    got = {
        (r.item_a, r.item_b): r.n_baskets
        for r in cooccurrence_edges(df, "basket", "item").collect()
    }
    assert got == {("a", "b"): 2, ("a", "c"): 2, ("b", "c"): 1}


def test_association_lift_closed_form(spark):
    rows = {
        (r.item_a, r.item_b): r
        for r in association_lift(
            _baskets(spark), "basket", "item", min_pair_count=2
        ).collect()
    }
    assert set(rows) == {("a", "b"), ("a", "c")}
    ab = rows[("a", "b")]
    # n_ab=2, n_a=3, n_b=2, n_total=4 → lift = 2*4/(3*2) = 4/3
    assert (ab.n_ab, ab.n_a, ab.n_b) == (2, 3, 2)
    assert ab.lift == round(8 / 6, 6)


def test_triangle_count_closed_form(spark):
    # K4 has 4 triangles; plus a pendant edge adding none
    edges = [(a, b) for a in "abcd" for b in "abcd" if a < b] + [("d", "e")]
    df = spark.createDataFrame(edges, "item_a string, item_b string")
    assert triangle_count(df).collect()[0].n_triangles == 4


def test_triangle_count_handles_reversed_and_dup_edges(spark):
    edges = [("b", "a"), ("a", "b"), ("c", "b"), ("a", "c")]
    df = spark.createDataFrame(edges, "item_a string, item_b string")
    assert triangle_count(df).collect()[0].n_triangles == 1


def test_triangle_count_star_graph_has_none(spark):
    edges = [("hub", f"n{i}") for i in range(20)]
    df = spark.createDataFrame(edges, "item_a string, item_b string")
    assert triangle_count(df).collect()[0].n_triangles == 0


def test_pagerank_triangle_is_exact_fixpoint(spark):
    from data_pipeline_ine_spark.operators.graph import pagerank

    df = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c")], "item_a string, item_b string"
    )
    rows = pagerank(df, iters=3).collect()
    # symmetric 3-cycle: every node keeps exactly scale units of mass —
    # base + (85 * (2 * (scale div 2))) div 100 == scale, integer-exact
    assert {r.rank_scaled for r in rows} == {10**12}


def test_pagerank_hub_outranks_leaves(spark):
    from data_pipeline_ine_spark.operators.graph import pagerank

    edges = [("hub", f"n{i}") for i in range(8)]
    df = spark.createDataFrame(edges, "item_a string, item_b string")
    got = {r.node: r.rank_scaled for r in pagerank(df, iters=3).collect()}
    assert all(got["hub"] > got[f"n{i}"] for i in range(8))
    # leaves are symmetric → identical integer ranks
    assert len({got[f"n{i}"] for i in range(8)}) == 1


def test_bfs_hops_hand_graph(spark):
    from data_pipeline_ine_spark.operators.graph import bfs_hops

    # path 1-2-3-4-5 plus isolated source 9
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], "item_a long, item_b long"
    )
    sources = spark.createDataFrame([(1,), (9,)], "node long")
    got = {r.node: r.hops for r in bfs_hops(edges, sources, max_hops=3).collect()}
    assert got == {1: 0, 9: 0, 2: 1, 3: 2, 4: 3}  # 5 is beyond max_hops


def test_bfs_hops_min_distance_wins_over_revisit(spark):
    from data_pipeline_ine_spark.operators.graph import bfs_hops

    # triangle 1-2-3: node 3 is reachable at hop 1 (direct) and hop 2
    # (via 2); min must win, and sources stay at 0 despite self-reentry
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3)], "item_a long, item_b long"
    )
    sources = spark.createDataFrame([(1,)], "node long")
    got = {r.node: r.hops for r in bfs_hops(edges, sources, max_hops=3).collect()}
    assert got == {1: 0, 2: 1, 3: 1}


def test_link_prediction_ra_hand_graph(spark):
    """Closed-form check on a path graph 1-2-3-4-5: non-adjacent pairs
    at distance 2 share exactly one common neighbor; RA = 1/deg of it
    (10^12 or 5*10^11 fixed-point); distance-3+ pairs score nothing."""
    from data_pipeline_ine_spark.operators.graph import link_prediction_ra

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], "item_a long, item_b long"
    )
    rows = {
        (r["item_a"], r["item_b"]): (r["ra_e12"], r["n_common"])
        for r in link_prediction_ra(edges, top_k=10).collect()
    }
    # centers 2,3,4 all have deg 2 -> each distance-2 pair scores 5e11
    assert rows == {
        (1, 3): (500_000_000_000, 1),
        (2, 4): (500_000_000_000, 1),
        (3, 5): (500_000_000_000, 1),
    }


def test_link_prediction_hub_cap_drops_hub_wedges(spark):
    """max_degree removes hub CENTERS: a star hub (deg 4) stops
    contributing wedges, leaving only low-degree centers."""
    from data_pipeline_ine_spark.operators.graph import link_prediction_ra

    # star: hub 0 - {1,2,3,4}, plus a path edge 1-2's common... none
    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3), (0, 4)], "item_a long, item_b long"
    )
    full = link_prediction_ra(edges, top_k=100).count()
    capped = link_prediction_ra(edges, top_k=100, max_degree=3).count()
    assert full == 6      # C(4,2) leaf pairs through the hub
    assert capped == 0    # hub center dropped -> no wedges at all


def test_link_prediction_topk_is_distributed(spark):
    """The top-k must compile to TakeOrderedAndProject (per-partition
    heads), never a single-partition global Sort over all scored
    pairs."""
    from data_pipeline_ine_spark.operators.graph import link_prediction_ra

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(50)], "item_a long, item_b long"
    )
    plan = (
        link_prediction_ra(edges, top_k=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_link_prediction_ra_canonicalizes_dirty_edges(spark):
    """ADVICE r5: reversed orientations, both-orientation duplicates,
    and self-loops must not corrupt RA — (v,u)-stored edges previously
    escaped the one-orientation anti-join and duplicates doubled deg.
    A dirty rendering of the path graph 1-2-3-4-5 must score exactly
    like the canonical one."""
    from data_pipeline_ine_spark.operators.graph import link_prediction_ra

    dirty = spark.createDataFrame(
        [
            (2, 1),          # reversed
            (2, 3), (3, 2),  # both orientations
            (3, 4), (3, 4),  # duplicate
            (5, 4),          # reversed
            (3, 3),          # self-loop
        ],
        "item_a long, item_b long",
    )
    rows = {
        (r["item_a"], r["item_b"]): (r["ra_e12"], r["n_common"])
        for r in link_prediction_ra(dirty, top_k=10).collect()
    }
    assert rows == {
        (1, 3): (500_000_000_000, 1),
        (2, 4): (500_000_000_000, 1),
        (3, 5): (500_000_000_000, 1),
    }


def test_degree_assortativity_star_and_regular(spark):
    """A star is perfectly disassortative (r = -1); a degree-regular
    cycle has undefined correlation (NULL); duplicate edge rows are
    deduped by the defensive distinct."""
    from data_pipeline_ine_spark.operators.graph import degree_assortativity

    star = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3), (0, 3)], "item_a long, item_b long"
    )
    r = degree_assortativity(star).collect()[0]
    assert r.n_edges == 3
    assert r.assortativity == -1.0

    cycle = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (1, 4)], "item_a long, item_b long"
    )
    rc = degree_assortativity(cycle).collect()[0]
    assert rc.n_edges == 4 and rc.assortativity is None


def test_k_core_peels_tail_and_keeps_clique(spark):
    """A 4-clique with a pendant path hanging off it: the 3-core is
    exactly the clique (every clique node keeps degree 3 after the
    tail peels away over multiple rounds — the multi-round case a
    single degree filter gets wrong: t1 has degree 2 only until t2
    goes)."""
    from data_pipeline_ine_spark.operators.graph import k_core

    clique = [(a, b) for a in "abcd" for b in "abcd" if a < b]
    tail = [("d", "t1"), ("t1", "t2")]
    df = spark.createDataFrame(
        clique + tail, "item_a string, item_b string"
    )
    out = {r.node: r.deg for r in k_core(df, k=3, rounds=4).collect()}
    assert out == {"a": 3, "b": 3, "c": 3, "d": 3}
    # k=2: the tail still peels (t2 has degree 1, then t1 does)
    out2 = {r.node: r.deg for r in k_core(df, k=2, rounds=4).collect()}
    assert set(out2) == set("abcd")


def test_k_core_contract_rounds_reach_fixpoint(spark, sf_dir):
    """The contract pins rounds=8; a 9th round must be a no-op on the
    co-purchase graph (fixpoint reached), so the fixed-rounds output
    IS the true 3-core, not a truncation artifact."""
    from data_pipeline_ine_spark.operators.graph import (
        cooccurrence_edges,
        k_core,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    edges = cooccurrence_edges(li, "l_orderkey", "l_partkey", min_count=2)
    r8 = k_core(edges, k=3, rounds=8).collect()
    r9 = k_core(edges, k=3, rounds=9).collect()
    assert sorted(map(tuple, r8)) == sorted(map(tuple, r9))
    assert all(deg >= 3 for _, deg in map(tuple, r8))


def test_recursive_cte_verbatim_sql_parity(spark, sf_dir):
    """The verbatim same-SQL-both-engines fixture: the single recursive
    CTE with the INLINE edge build (_RECURSIVE_BFS_SQL — what the
    DuckDB oracle runs) must return exactly what the contract query's
    materialized-edge recursion (_RECURSIVE_BFS_STEP_SQL over the
    checkpointed bfs_edges view) returns. The contract swapped to the
    materialized form because Spark re-evaluates an inline CTE at
    every recursion level."""
    import __spark_entry__ as contract

    fast = contract.queries()["recursive_bfs_sql"](spark, sf_dir)
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").createOrReplaceTempView(
        "lineitem"
    )
    verbatim = spark.sql(contract._RECURSIVE_BFS_SQL)
    assert sorted(map(tuple, fast.collect())) == sorted(
        map(tuple, verbatim.collect())
    )

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

"""Co-occurrence graph analytics: market-basket edges, association lift,
degree-oriented triangle counting.

The graph here is IMPLICIT in the data — items that co-occur in a basket
(parts in an order, tokens in a doc, users in a session) — which is the
graph shape large pipelines actually mine: nobody ships an edge list,
they ship transactions. The reference pipeline has no graph operators;
these extend the engine the same way the dedup clustering stack does
(``operators/dedup.py::dedup_components`` already runs connected
components over LSH pair graphs — this module adds the *construction*
and *counting* side).

Scale discipline:

- **Edge construction is basket-bounded.** The per-basket self-join
  explodes Σ basket_size² pairs — bounded by the largest basket (order
  line counts, document co-citations), never corpus². One shuffle on the
  basket key (co-partitioned self-join), one on the pair key to count.
- **Triangle counting is degree-oriented.** Counting wedges at each
  vertex naively is Σ deg² — a power-law hub explodes it. Orienting
  every edge from the (degree, id)-smaller endpoint to the larger one
  makes each triangle countable exactly once at its lowest-rank vertex,
  and bounds per-vertex wedge work by the graph arboricity (the classic
  MapReduce triangle trick from Suri & Vassilvitskii's "Counting
  triangles and the curse of the last reducer", WWW'11).
- **Lift needs only integer counts** until the final divide, so the
  cross-engine result is one IEEE divide on identical integers — no
  accumulation-order float hazards.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cooccurrence_edges(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_count: int = 1,
) -> DataFrame:
    """Undirected co-occurrence edges: ``(item_a, item_b, n_baskets)``
    with ``item_a < item_b``, counting DISTINCT baskets containing both.

    One co-partitioned self-join on the basket key (pair explosion
    Σ basket²), one pair-keyed count shuffle. ``min_count`` prunes the
    long tail of one-off co-occurrences before anything downstream
    joins the edge list.
    """
    items = df.select(
        F.col(basket_col).alias("_basket"), F.col(item_col).alias("_item")
    ).distinct()
    a, b = items.alias("a"), items.alias("b")
    pairs = a.join(
        b,
        (F.col("a._basket") == F.col("b._basket"))
        & (F.col("a._item") < F.col("b._item")),
    ).select(
        F.col("a._item").alias("item_a"),
        F.col("b._item").alias("item_b"),
    )
    return (
        pairs.groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_baskets"))
        .filter(F.col("n_baskets") >= min_count)
    )


def association_lift(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_pair_count: int = 2,
) -> DataFrame:
    """Association mining over basket data: for every co-occurring item
    pair, the support counts and the LIFT
    ``P(ab) / (P(a)·P(b)) = n_ab·n_baskets / (n_a·n_b)`` — the
    market-basket statistic that separates "bought together because both
    are popular" from genuine affinity.

    Returns ``(item_a, item_b, n_ab, n_a, n_b, lift)`` with
    ``item_a < item_b``; ``lift`` is rounded to 6 decimals and is the
    ONLY float — computed as one IEEE divide of exact integer products,
    so it is engine-invariant (no accumulation order involved).

    Scale shape: pair counts from :func:`cooccurrence_edges` (basket-
    bounded explosion); per-item basket counts are an item-keyed
    aggregate that BROADCASTS back onto the pair list (item vocabularies
    are small relative to pair lists); the total basket count is a 1-row
    broadcast. The corpus is never reshuffled after the pair count.
    """
    pair = cooccurrence_edges(df, basket_col, item_col, min_pair_count)
    per_item = (
        df.select(
            F.col(basket_col).alias("_basket"), F.col(item_col).alias("_item")
        )
        .distinct()
        .groupBy("_item")
        .agg(F.count(F.lit(1)).alias("n_item"))
    )
    totals = df.select(basket_col).distinct().agg(
        F.count(F.lit(1)).alias("n_total")
    )
    out = (
        pair.withColumnRenamed("n_baskets", "n_ab")
        .join(
            F.broadcast(per_item.select(F.col("_item").alias("item_a"),
                                        F.col("n_item").alias("n_a"))),
            "item_a",
        )
        .join(
            F.broadcast(per_item.select(F.col("_item").alias("item_b"),
                                        F.col("n_item").alias("n_b"))),
            "item_b",
        )
        .join(F.broadcast(totals))
    )
    lift = F.round(
        (F.col("n_ab") * F.col("n_total")).cast("double")
        / (F.col("n_a") * F.col("n_b")).cast("double"),
        6,
    )
    return out.select(
        "item_a", "item_b", "n_ab", "n_a", "n_b", lift.alias("lift")
    )


def triangle_count(
    edges: DataFrame,
    a_col: str = "item_a",
    b_col: str = "item_b",
) -> DataFrame:
    """Global triangle count of an undirected simple graph given as
    ``(a, b)`` edge rows (either orientation, duplicates tolerated).

    Degree-oriented algorithm: every edge is re-oriented from its
    (degree, id)-smaller endpoint to the larger one; wedges are then
    enumerated only at each triangle's lowest-rank vertex and closed by
    one semi-join against the oriented edge list. Per-vertex wedge work
    is bounded by out-degree ≤ O(√m) on any graph (arboricity bound), so
    power-law hubs cannot explode the join the way naive Σ deg² wedge
    counting does. Three shuffles total: degree count, wedge self-join
    on the source, closing equi-join on the wedge endpoints.

    Returns a single row ``(n_triangles,)``.
    """
    und = (
        edges.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .select(
            F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
        )
        .distinct()
    )
    deg = (
        und.select(F.col("u").alias("n"))
        .unionAll(und.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    ranked = (
        und.join(
            F.broadcast(
                deg.select(F.col("n").alias("u"), F.col("d").alias("du"))
            ),
            "u",
        )
        .join(
            F.broadcast(
                deg.select(F.col("n").alias("v"), F.col("d").alias("dv"))
            ),
            "v",
        )
    )
    # orient src → dst by (degree, id) rank; struct comparison gives the
    # lexicographic (d, node) order in one expression
    src_first = F.struct(F.col("du"), F.col("u")) < F.struct(
        F.col("dv"), F.col("v")
    )
    oriented = ranked.select(
        F.when(src_first, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(src_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
        F.when(src_first, F.struct("dv", "v")).otherwise(
            F.struct(F.col("du").alias("dv"), F.col("u").alias("v"))
        ).alias("dst_rank"),
    )
    e1, e2 = oriented.alias("e1"), oriented.alias("e2")
    wedges = e1.join(
        e2,
        (F.col("e1.src") == F.col("e2.src"))
        & (F.col("e1.dst_rank") < F.col("e2.dst_rank")),
    ).select(
        F.col("e1.dst").alias("w_src"), F.col("e2.dst").alias("w_dst")
    )
    closing = oriented.select(
        F.col("src").alias("w_src"), F.col("dst").alias("w_dst")
    )
    return (
        wedges.join(closing, ["w_src", "w_dst"])
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )


def pagerank(
    edges: DataFrame,
    a_col: str = "item_a",
    b_col: str = "item_b",
    iters: int = 3,
    scale: int = 10**12,
    damping_pct: int = 85,
) -> DataFrame:
    """Fixed-iteration PageRank over an undirected edge list (each edge
    walked both ways), in EXACT integer fixed-point — the engine-
    invariant formulation of the canonical iterative graph algorithm.

    Floating-point PageRank sums partial contributions in partition
    order, so two engines (or two runs) disagree in the last ulps and
    no exact oracle can exist. Here ranks live in integer units of
    ``1/scale``: each node starts at ``scale`` (the mass-n convention),
    one iteration is

        r' = (15·scale) div 100  +  (85 · Σ_in (r div outdeg)) div 100

    — integer divisions only, so every engine lands on the identical
    BIGINT. The truncation the ``div`` introduces is far below any
    ranking-relevant difference (1 part in 10¹²; ``scale`` is the
    precision knob — drop it at web scale to keep Σ mass = n·scale
    inside int64).

    Scale shape: per iteration, ONE shuffle (contributions grouped by
    destination); out-degrees are a node-keyed frame joined by key
    (broadcast while node vocabularies fit); ``localCheckpoint`` after
    each round keeps iteration N's plan flat instead of replaying
    rounds 1..N−1 — the same discipline as ``dedup_components``.
    Dangling nodes cannot occur on a doubled undirected edge list
    (every node has outdeg ≥ 1).

    Returns ``(node, rank_scaled)`` for every node with an edge.
    """
    base = (100 - damping_pct) * scale // 100
    directed = (
        edges.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .unionByName(
            edges.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst"))
        )
        .distinct()
        .localCheckpoint()
    )
    outdeg = directed.groupBy("src").agg(F.count(F.lit(1)).alias("od"))
    nodes = directed.select(F.col("src").alias("node")).distinct()
    ranks = nodes.withColumn("r", F.lit(scale).cast("long"))
    for _ in range(iters):
        contrib = (
            directed.join(ranks.withColumnRenamed("node", "src"), "src")
            .join(outdeg, "src")
            .select(F.col("dst").alias("node"), F.expr("r div od").alias("c"))
            .groupBy("node")
            .agg(F.sum(F.col("c").cast("decimal(38,0)")).alias("csum"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.expr(
                        f"({damping_pct} * CAST(coalesce(csum, 0) AS BIGINT)) "
                        "div 100"
                    )
                ).cast("long").alias("r"),
            )
            .localCheckpoint()
        )
    return ranks.select("node", F.col("r").alias("rank_scaled"))


def bfs_hops(
    edges: DataFrame,
    sources: DataFrame,
    a_col: str = "item_a",
    b_col: str = "item_b",
    source_col: str = "node",
    max_hops: int = 3,
) -> DataFrame:
    """Multi-source breadth-first search over an undirected edge list:
    ``(node, hops)`` — the minimum hop count from any source — for every
    node within ``max_hops``.

    Iterative frontier expansion in pure integers (hop counts), so the
    result is exactly reproducible in any engine by unrolling the loop —
    the same exact-oracle discipline as the fixed-point PageRank above.

    Scale shape: per hop, ONE destination-keyed shuffle (frontier ⨝ edges,
    then a min-hop aggregate); the frontier join uses only ids — no
    payloads ride the expansion. ``localCheckpoint`` truncates lineage per
    round, keeping round N's plan flat (the iterative-loop discipline
    shared by ``dedup_components``/``pagerank``). Bounded ``max_hops``
    bounds both work and result size; for all-pairs reachability use the
    pointer-jumping components operator instead — BFS frontiers are the
    right tool only for small-diameter neighborhoods.
    """
    directed = (
        edges.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .unionByName(
            edges.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst"))
        )
        .distinct()
        .localCheckpoint()
    )
    dist = sources.select(
        F.col(source_col).alias("node"), F.lit(0).alias("hops")
    ).localCheckpoint()
    frontier = dist
    for h in range(1, max_hops + 1):
        frontier = (
            directed.join(
                frontier.select(F.col("node").alias("src")).distinct(), "src"
            )
            .select(F.col("dst").alias("node"), F.lit(h).alias("hops"))
            .localCheckpoint()
        )
        dist = dist.unionByName(frontier)
    return dist.groupBy("node").agg(F.min("hops").alias("hops"))


def link_prediction_ra(
    edges: DataFrame,
    a_col: str = "item_a",
    b_col: str = "item_b",
    top_k: int = 20,
    scale: int = 10**12,
    max_degree: int | None = None,
) -> DataFrame:
    """Link prediction by the resource-allocation index:
    ``RA(u, v) = Σ_{w ∈ N(u) ∩ N(v)} 1/deg(w)`` over non-adjacent pairs
    — "which items/entities SHOULD be connected" (recommendation
    candidates, knowledge-graph completion, missing co-purchase links).

    RA is Adamic-Adar's better-behaved sibling (Zhou et al. 2009):
    ``1/deg`` instead of ``1/log deg``. Chosen here deliberately — the
    reciprocal is computed in integer fixed-point (``scale // deg``,
    summed as BIGINT), so scores are bit-identical in any SQL engine;
    a logarithm would hang correctness on libm ulp agreement.

    Returns the ``top_k`` non-adjacent pairs: ``(item_a, item_b,
    ra_e12, n_common, rank)``, ties broken by (score desc, a, b).

    Scale shape: wedge enumeration through each common neighbor w costs
    Σ deg(w)² pairs — arboricity-bounded on real co-occurrence graphs,
    but a power-law hub is quadratic in its degree. ``max_degree``
    drops hub CENTERS from scoring; principled, because a hub
    contributes only ``1/deg ≈ 0`` per wedge while costing deg² work —
    the classic accuracy-for-cost trade at corpus scale. The final
    top-k is a rank-window over the scored pair list, never a global
    sort of the corpus.

    Edges are canonicalized internally (ADVICE r5): undirected input
    may carry either orientation, duplicates, or self-loops — each row
    is folded to ``(least, greatest)``, self-loops dropped, and the
    list deduped before degrees, wedges, and the non-adjacency
    anti-join are computed. Without this, a ``(v,u)``-stored edge
    escapes the anti-join (it tests only one orientation) and
    both-orientation duplicates double ``deg``, corrupting every RA
    score. Cost: one edge-list-sized distinct — noise next to the
    Σdeg² wedge join.
    """
    edges = (
        edges.select(
            F.least(F.col(a_col), F.col(b_col)).alias(a_col),
            F.greatest(F.col(a_col), F.col(b_col)).alias(b_col),
        )
        .filter(F.col(a_col) != F.col(b_col))
        .distinct()
    )
    nbr = edges.select(
        F.col(a_col).alias("leaf"), F.col(b_col).alias("center")
    ).union(
        edges.select(
            F.col(b_col).alias("leaf"), F.col(a_col).alias("center")
        )
    )
    deg = nbr.groupBy("center").agg(F.count(F.lit(1)).alias("deg"))
    if max_degree is not None:
        deg = deg.filter(F.col("deg") <= max_degree)
    nw = nbr.join(deg, "center")
    x, y = nw.alias("x"), nw.alias("y")
    wedges = x.join(
        y,
        (F.col("x.center") == F.col("y.center"))
        & (F.col("x.leaf") < F.col("y.leaf")),
    ).select(
        F.col("x.leaf").alias("u"),
        F.col("y.leaf").alias("v"),
        # integer fixed-point reciprocal: exact in every engine
        F.expr(f"CAST({scale} AS BIGINT) div x.deg").alias("w_e12"),
    )
    scores = wedges.groupBy("u", "v").agg(
        F.sum("w_e12").alias("ra_e12"), F.count(F.lit(1)).alias("n_common")
    )
    non_adjacent = scores.join(
        edges,
        (scores["u"] == edges[a_col]) & (scores["v"] == edges[b_col]),
        "left_anti",
    )
    from pyspark.sql import Window

    # sort+limit compiles to TakeOrderedAndProject — a distributed
    # top-k (per-partition heads merged on the driver), never a global
    # sort; the rank window then runs over <= top_k rows only
    top = non_adjacent.orderBy(
        F.desc("ra_e12"), F.asc("u"), F.asc("v")
    ).limit(top_k)
    w = Window.orderBy(F.desc("ra_e12"), F.asc("u"), F.asc("v"))
    return top.withColumn("rank", F.row_number().over(w)).select(
        F.col("u").alias(a_col),
        F.col("v").alias(b_col),
        "ra_e12",
        "n_common",
        "rank",
    )


def degree_assortativity(
    edges: DataFrame,
    a_col: str = "item_a",
    b_col: str = "item_b",
) -> DataFrame:
    """Degree assortativity of an undirected graph — Newman's Pearson
    correlation of endpoint degrees over the edge stubs (r > 0: hubs
    link hubs, social-network shape; r < 0: hub-and-spoke, the usual
    co-purchase/dependency shape). The one scalar that says whether
    hub-targeted strategies (``max_degree`` cuts, hot-key salting)
    will touch a clique or a star.

    Expects the repo-wide canonical edge list (``item_a < item_b``,
    one row per edge — ``cooccurrence_edges``' contract); a defensive
    ``distinct`` makes duplicates harmless. Each undirected edge
    contributes both orientations, so the stub moments are symmetric
    (Σx = Σy, Σx² = Σy²) and the correlation collapses to
    ``r = (m·Σxy − (Σx)²) / (m·Σx² − (Σx)²)`` with ``m = 2·|E|`` —
    exact DECIMAL(38,0) integer moments, ONE fixed double expression
    (the chisq/gini precedent). NULL for degree-regular graphs
    (denominator 0: every degree equal, correlation undefined).

    Scale shape: one stub-grain degree aggregate, two node-keyed
    equi-joins hanging degrees on edge endpoints (shuffle joins —
    the degree table is node-sized, never assumed broadcastable), one
    1-row moment aggregate. Output is exactly one row.
    """
    e = edges.select(a_col, b_col).distinct()
    stubs = e.select(F.col(a_col).alias("_n")).unionAll(
        e.select(F.col(b_col).alias("_n"))
    )
    deg = stubs.groupBy("_n").agg(F.count(F.lit(1)).alias("_deg"))
    da = F.col("_da").cast("decimal(19,0)")
    db = F.col("_db").cast("decimal(19,0)")
    m = (
        e.join(deg.select(F.col("_n").alias(a_col), F.col("_deg").alias("_da")), a_col)
        .join(deg.select(F.col("_n").alias(b_col), F.col("_deg").alias("_db")), b_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_edges"),
            F.sum(da + db).cast("decimal(38,0)").alias("_sx"),
            F.sum(da * da + db * db).cast("decimal(38,0)").alias("_sxx"),
            F.sum(da * db * 2).cast("decimal(38,0)").alias("_sxy"),
        )
    )
    md = (F.col("n_edges") * 2).cast("double")
    sx = F.col("_sx").cast("double")
    sxx = F.col("_sxx").cast("double")
    sxy = F.col("_sxy").cast("double")
    den = md * sxx - sx * sx
    return m.select(
        "n_edges",
        F.when(den > 0, F.round((md * sxy - sx * sx) / den, 6)).alias(
            "assortativity"
        ),
    )


def k_core(
    edges: DataFrame,
    k: int = 3,
    rounds: int = 8,
    a_col: str = "item_a",
    b_col: str = "item_b",
) -> DataFrame:
    """k-core decomposition by iterative peeling: repeatedly drop
    nodes whose remaining degree is below ``k`` until nothing changes
    — the standard dense-subgraph backbone extractor (a
    node's coreness survives hub removal where raw degree doesn't).

    Runs EXACTLY ``rounds`` peeling rounds (a fixed iteration count is
    what makes the result oracle-reproducible; a fixpoint typically
    lands in far fewer — extra rounds are no-ops on a converged
    subgraph, and the caller can assert convergence by checking one
    more round changes nothing). Returns ``(node, deg)`` for the
    surviving induced subgraph, filtered to ``deg ≥ k``.

    Scale shape: each round is one degree aggregate (map-side
    combinable) plus two node-keyed semi-joins to induce the surviving
    subgraph — edge-bounded shuffles, no Σdeg² blowup anywhere;
    ``localCheckpoint`` per round keeps round N's plan flat instead of
    replaying rounds 1..N−1 (the pagerank/dedup_components
    discipline). Peeling rounds needed = the graph's degeneracy
    ordering depth, almost always ≤ tens even on web graphs.
    """
    e = edges.select(
        F.col(a_col).alias("u"), F.col(b_col).alias("v")
    ).localCheckpoint()

    def degrees(ed: DataFrame) -> DataFrame:
        return (
            ed.select(F.col("u").alias("node"))
            .unionAll(ed.select(F.col("v").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).cast("bigint").alias("deg"))
        )

    for _ in range(rounds):
        surv = degrees(e).filter(F.col("deg") >= k).select("node")
        e = (
            e.join(surv.withColumnRenamed("node", "u"), "u")
            .join(surv.withColumnRenamed("node", "v"), "v")
            .select("u", "v")
            .localCheckpoint()
        )
    return (
        degrees(e).filter(F.col("deg") >= k).orderBy("node")
    )

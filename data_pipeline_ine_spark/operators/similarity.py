"""Similarity search over embedding columns (``array<float>``).

Baseline: brute-force cosine top-k — a broadcast of the query vector and one
pass over the corpus (embarrassingly parallel, no shuffle). Scale path:
coarse-partitioned (IVF-style) search that prunes to the nearest partitions
before scanning, cutting the scanned fraction to ``n_probe / n_partitions``.

Vector math uses ``zip_with``/``aggregate`` higher-order functions — JVM-side
left-fold, deterministic order, no Python. Floats are cast to double before
multiplying so accumulation precision doesn't depend on input element type.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from data_pipeline_ine_spark.functions.localframe import local_frame
from pyspark.sql import functions as F


def _dot_sql(a: str, b: str) -> str:
    """SQL text of the index-fold dot product below — the IDENTICAL
    expression tree (same fold, same casts, same empty-array guard), so
    values are bit-for-bit the Column-built ones; pinned by a
    sameSemantics test. One parse replaces ~100 py4j construction
    round-trips per call (r13; the ~1.4 ms/call tax documented in the
    construction-cost note above sits under every vector query)."""
    fold = (
        f"aggregate(sequence(1, size({a})), 0.0D, "
        f"(acc, i) -> acc + CAST(element_at({a}, i) AS DOUBLE) * "
        f"CAST(element_at({b}, i) AS DOUBLE))"
    )
    return f"(CASE WHEN size({a}) = 0 THEN 0.0D ELSE {fold} END)"


def _l2_sql(a: str) -> str:
    return f"SQRT({_dot_sql(a, a)})"


def _cosine_sql(a: str, b: str) -> str:
    return f"({_dot_sql(a, b)} / ({_l2_sql(a)} * {_l2_sql(b)}))"


def dot(a: Column | str, b: Column | str) -> Column:
    """Index-fold dot product: accumulate ``a[i]·b[i]`` over an index
    sequence instead of ``zip_with`` + fold — skipping the intermediate
    product-array allocation is ~1.7× faster on self-join workloads
    (measured on the blocked kNN at sf0.1: 4.4 s → 2.5 s for 2.5M
    64-dim pairs). Identical left-to-right accumulation order, so values
    are bit-for-bit unchanged.

    Pass SQL text for BOTH operands (a quoted identifier via ``_qid``,
    or a literal via ``_darr_sql``) to build the whole expression in
    ONE parse instead of ~100 py4j construction calls — the plans are
    semantically identical either way (sameSemantics-pinned)."""
    if isinstance(a, str) and isinstance(b, str):
        return F.expr(_dot_sql(a, b))
    fold = F.aggregate(
        F.sequence(F.lit(1), F.size(a)),
        F.lit(0.0),
        lambda acc, i: acc
        + F.element_at(a, i).cast("double") * F.element_at(b, i).cast("double"),
    )
    # sequence(1, 0) would DESCEND for empty arrays; guard explicitly
    return F.when(F.size(a) == 0, F.lit(0.0)).otherwise(fold)


def l2_norm(a: Column | str) -> Column:
    if isinstance(a, str):
        return F.expr(_l2_sql(a))
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    if isinstance(a, str) and isinstance(b, str):
        return F.expr(_cosine_sql(a, b))
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def embedding_norms(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    return df.select(id_col, F.round(l2_norm(_qid(vec_col)), 4).alias("l2_norm"))


def _rebalanced(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Parallelism floor for the vector-math stages (guide §2.6, §6): a
    small embeddings table arrives as ONE parquet split, so every
    downstream narrow map (centroid assignment: k sq_dist folds per row)
    and every pair-producing join that streams this side runs as a
    single task — measured on the blocked-pair family at sf0.1, the
    million-pair cosine stage was 1 task ≈ 6 µs/pair serial (r12 bench:
    semantic_dedup_mp 17 s) and drops ~6× when the scan side is spread
    across the cores. Round-robin ``repartition(n)`` is deterministic
    (sort-before-repartition, SPARK-23207) and every consumer here is
    content-based, not order-based, so results are unchanged.

    Scale-adaptive by construction: when the scan already yields at
    least ``defaultParallelism`` splits (any real corpus), this is a
    NO-OP — no exchange is added, so the 100 TB plan shape is
    untouched; only the pathological small-file case pays one narrow
    shuffle of (id, vector) rows.
    """
    target = min_parts or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def brute_force_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    exclude_id: int | None = None,
) -> DataFrame:
    """Exact cosine top-k against a literal query vector.

    The query vector is a plan literal (broadcast with the task binary); the
    scan is a single narrow pass and ``orderBy+limit`` executes as
    per-partition top-k + k-row driver merge — no global sort.
    Similarity is rounded before ranking so ordering is reproducible across
    engines; ``id`` breaks remaining ties.
    """
    q = _darr_sql([float(x) for x in query_vec])
    out = df.select(
        id_col, F.round(cosine(_qid(vec_col), q), 6).alias("cosine_sim")
    )
    if exclude_id is not None:
        out = out.filter(F.col(id_col) != exclude_id)
    return out.orderBy(F.desc("cosine_sim"), F.asc(id_col)).limit(k)


N_PLANES = 8
# Auto-sizing targets ~this many rows per LSH bucket; buckets self-join, so
# per-bucket cost is ~TARGET_BUCKET_ROWS² regardless of corpus size.
TARGET_BUCKET_ROWS = 64
# Signature cost is linear in planes and per-bucket recall falls with each
# extra bit; past ~24 bits (16M buckets) add bands, not bits.
MAX_PLANES = 24


def planes_for(n_rows: int) -> int:
    """Corpus-scaled hyperplane count: enough sign bits that the EXPECTED
    bucket population is ~``TARGET_BUCKET_ROWS`` (buckets ≈ 2^planes, so
    planes ≈ log2(n / target)). Floored at ``N_PLANES`` so small corpora
    keep stable signatures, capped at ``MAX_PLANES`` — beyond that the
    sub-quadratic knob is banding (OR-of-ANDs), not more bits.

    The bucket self-join in :func:`cosine_near_dup_pairs` is quadratic IN
    THE BUCKET: with this rule the expected candidate-pair count is
    ~n·target/2 — linear in the corpus — instead of the n²/2 an
    undersized signature degenerates to (VERDICT r1 scale caution #1).
    """
    import math

    if n_rows <= 0:
        return N_PLANES
    return min(MAX_PLANES, max(N_PLANES, math.ceil(math.log2(max(n_rows, 1) / TARGET_BUCKET_ROWS))))


def _hyperplane_sig_sql(vec_sql: str, n_planes: int) -> str:
    """SQL text of the signature below — identical expression tree
    (same transform/aggregate fold per plane, same literals), one parse
    instead of ~20 py4j construction calls PER PLANE (24-plane
    signatures paid ~0.5 s of driver time per call site, r13)."""
    bits = []
    for p in range(n_planes):
        comp = (
            f"(({p * 2654435761 + 1} + d * 40503) % 65536 - 32768)"
        )
        prods = (
            f"transform({vec_sql}, (x, d) -> "
            f"CAST(x AS DOUBLE) * CAST({comp} AS DOUBLE))"
        )
        proj = f"aggregate({prods}, 0.0D, (acc, x) -> acc + x)"
        bits.append(f"(CASE WHEN {proj} > 0 THEN '1' ELSE '0' END)")
    return "concat(" + ", ".join(bits) + ")"


def hyperplane_signature(
    vec: Column | str, n_planes: int = N_PLANES
) -> Column:
    """Random-hyperplane LSH signature (Charikar): one sign bit per plane,
    returned as an ``n_planes``-char '0'/'1' string.

    Plane components come from an integer LCG-style formula — exact integer
    arithmetic, so a SQL oracle reproduces the planes bit-for-bit (a float
    PRNG would diverge across engines). The projection itself is a
    deterministic sequential left-fold of doubles (``aggregate``), so the
    sign is also engine-invariant. Two vectors agree on a bit with
    probability 1 - θ/π: near-duplicates collide on all bits, which makes
    the signature a groupBy key for near-dup candidate discovery — no
    pairwise comparison over the corpus, just one shuffle on the signature.

    Pass SQL text for ``vec`` to build the whole signature in one parse
    (sameSemantics-pinned against the Column form).
    """
    if isinstance(vec, str):
        return F.expr(_hyperplane_sig_sql(vec, n_planes))

    def plane_prods(p: int):
        def prod(x: Column, d: Column) -> Column:
            component = (F.lit(p * 2654435761 + 1) + d * 40503) % 65536 - 32768
            return x.cast("double") * component.cast("double")

        return F.transform(vec, prod)

    bits = []
    for p in range(n_planes):
        proj = F.aggregate(plane_prods(p), F.lit(0.0), lambda acc, x: acc + x)
        bits.append(F.when(proj > 0, "1").otherwise("0"))
    return F.concat(*bits)


def cosine_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, LSH-bucketed.

    All-pairs cosine is O(n²) — 5·10¹⁵ comparisons for a 100M-doc corpus.
    Bucketing by hyperplane signature first means only same-bucket pairs
    (collision probability (1-θ/π)^n_planes, concentrated on near-dups) are
    verified with exact cosine. Shuffle cost: one hash partition by the
    signature + the intra-bucket self-join.

    ``n_planes=None`` (default) sizes the signature from the corpus via
    :func:`planes_for` — one metadata-cheap ``count()`` buys buckets that
    keep the self-join linear in corpus size. Pass an explicit value when
    an external oracle must reproduce the signature (static SQL can't
    re-derive the count-dependent plane set).
    """
    if n_planes is None:
        n_planes = planes_for(df.count())
    # parallelism floor: the n_planes projection folds per row and the
    # intra-bucket pair join both stream this frame (guide §2.6)
    df = _rebalanced(df)
    # norm computed once per ROW here (not once per pair in the join): same
    # sequential fold → bit-identical doubles, ~3× less array math when the
    # average bucket pairs each row with many others
    sig = df.select(
        F.col(id_col),
        F.col(vec_col).alias("_v"),
        l2_norm(_qid(vec_col)).alias("_n"),
        hyperplane_signature(_qid(vec_col), n_planes).alias("_sig"),
    )
    a = sig.select(
        F.col(id_col).alias("a_id"), F.col("_v").alias("_va"),
        F.col("_n").alias("_na"), "_sig",
    )
    b = sig.select(
        F.col(id_col).alias("b_id"), F.col("_v").alias("_vb"),
        F.col("_n").alias("_nb"), "_sig",
    )
    return (
        a.join(b, "_sig")
        .filter(F.col("a_id") < F.col("b_id"))
        .select(
            "a_id",
            "b_id",
            F.round(
                dot("`_va`", "`_vb`") / (F.col("_na") * F.col("_nb")),
                round_to,
            ).alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= threshold)
    )


def lsh_bucketed_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = N_PLANES,
    band_bits: int = 2,
    exclude_id: int | None = None,
) -> DataFrame:
    """ANN top-k, LSH-banded: a corpus row is a candidate iff it matches the
    query's signature on at least one ``band_bits``-wide band (classic
    OR-of-ANDs LSH). Exact cosine ranks only the candidate set.

    The query's band keys are a handful of literals, so candidate selection
    is a pushdown-friendly IN-filter on precomputable band columns — at
    scale, materialize ``_sig`` once per corpus (a narrow derived column)
    and this probe touches ~(1/2^band_bits)·n_bands of the corpus instead
    of all of it, with zero shuffle before the final k-row merge.
    """
    n_bands = n_planes // band_bits
    sig = df.select(
        F.col(id_col), F.col(vec_col).alias("_v"),
        hyperplane_signature(_qid(vec_col), n_planes).alias("_sig"),
    )
    q = _darr_sql([float(x) for x in query_vec])
    # query signature as plan-time literals: one row, computed once
    qsig = (
        df.sparkSession.range(1)
        .select(hyperplane_signature(F.expr(q), n_planes).alias("s"))
        .first()["s"]
    )
    any_band = None
    for i in range(n_bands):
        m = (
            F.substring("_sig", i * band_bits + 1, band_bits)
            == qsig[i * band_bits : (i + 1) * band_bits]
        )
        any_band = m if any_band is None else (any_band | m)
    cands = sig.filter(any_band)
    if exclude_id is not None:
        cands = cands.filter(F.col(id_col) != exclude_id)
    return (
        cands.select(
            id_col, F.round(cosine("`_v`", q), 6).alias("cosine_sim")
        )
        .orderBy(F.desc("cosine_sim"), F.asc(id_col))
        .limit(k)
    )


def sq_dist(a: Column | str, b: Column | str) -> Column:
    """Squared euclidean distance, sequential left-fold (engine-invariant).

    SQL text for both operands builds the identical tree in one parse
    (the ``_sq_dist_sql`` fold below, generalized to a non-literal
    right side)."""
    if isinstance(a, str) and isinstance(b, str):
        return F.expr(
            f"aggregate(zip_with({a}, {b}, (x, y) -> "
            "(CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) * "
            "(CAST(x AS DOUBLE) - CAST(y AS DOUBLE))), "
            "0.0D, (acc, x) -> acc + x)"
        )
    diffs = F.zip_with(
        a, b, lambda x, y: (x.cast("double") - y.cast("double"))
        * (x.cast("double") - y.cast("double"))
    )
    return F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x)


# --- construction-cost helpers --------------------------------------------
#
# Building a k-centroid assignment expression through the Column API costs
# ~1,200 py4j round-trips (one per F.lit/operator call, ~1.4 ms each under
# load) — ~2 s of DRIVER time per call at k=16, d=64, before Spark ever
# sees the plan (measured r12: semdedup_recall spent 13 s building plans
# vs 1.6 s executing them). One F.expr over SQL text built in Python is a
# single round-trip; repr(float) is shortest-round-trip so the parsed
# double literal is bit-identical to the F.lit it replaces, and Catalyst
# constant-folds the old CreateArray-of-literals to the same Literal node
# the one-call F.lit(list) produces — optimized plans are unchanged.


def _qid(name: str) -> str:
    """Backtick-quote an identifier for SQL text, escaping embedded
    backticks (ADVICE r12: a raw f'`{col}`' breaks — and diverges from
    F.col resolution — on a column name containing a backtick)."""
    return "`" + str(name).replace("`", "``") + "`"


def _dlit(x: float) -> str:
    """Shortest round-trip double literal for SQL text (bit-exact)."""
    return repr(float(x)) + "D"


def _darr_sql(vals: "Sequence[float]") -> str:
    """``array(<double literals>)`` SQL text for a literal vector."""
    return "array(" + ",".join(_dlit(x) for x in vals) + ")"


def _dbl_array_lit(vals: "Sequence[float]") -> Column:
    """One-round-trip ``array<double>`` literal (replaces the
    ``F.array(*[F.lit(float(x)) ...])`` construction loop)."""
    return F.lit([float(x) for x in vals])


def _sq_dist_sql(vec_sql: str, cv: "Sequence[float]") -> str:
    """SQL text for :func:`sq_dist` against a literal centroid — the
    identical zip_with/aggregate fold, so values are bit-for-bit the
    Column-built ones."""
    return (
        f"aggregate(zip_with({vec_sql}, {_darr_sql(cv)}, (x, y) -> "
        "(CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) * "
        "(CAST(x AS DOUBLE) - CAST(y AS DOUBLE))), "
        "CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
    )


def _assign_pairs_sql(
    vec_col: str, centroids: list[tuple[int, list[float]]]
) -> str:
    """The sorted (distance, cluster_id) struct array as SQL text."""
    structs = ",".join(
        f"struct({_sq_dist_sql(_qid(vec_col), cv)} AS d, {int(cid)} AS c)"
        for cid, cv in centroids
    )
    return f"array_sort(array({structs}))"


def _assign_clusters(
    emb: DataFrame, centroids: list[tuple[int, list[float]]], vec_col: str
) -> DataFrame:
    """Nearest-centroid assignment via a lexicographic struct sort over the
    (distance, cluster_id) pairs — ties break to the lowest id. Centroids
    are plan literals (k×d values, O(1) w.r.t. corpus size): no join, no
    shuffle, the assignment is a narrow map. Built as ONE parsed SQL
    expression: the Column-API construction loop paid ~75 py4j round
    trips per centroid of pure driver time (see the construction-cost
    note above) for a bit-identical plan."""
    return emb.withColumn(
        "cluster", F.expr(f"{_assign_pairs_sql(vec_col, centroids)}[0].c")
    )


def _assign_clusters_multi(
    emb: DataFrame,
    centroids: list[tuple[int, list[float]]],
    vec_col: str,
    n_probe: int,
) -> DataFrame:
    """Top-``n_probe`` nearest-centroid assignment: each input row is
    exploded into its ``n_probe`` closest clusters with a 1-based
    ``rn`` rank — ``rn = 1`` is exactly the primary cell
    ``_assign_clusters`` returns, ``rn = 2`` the second-closest, etc.
    Same centroid-literal lexicographic struct sort, so the assignment
    stays a narrow map; the only growth is the ×``n_probe`` row
    explode. This is the multi-probe key that shrinks the
    cluster-boundary blind spot of every cluster-blocked pairwise
    operator (SemDeDup, hard-negative mining): a pair that straddles a
    boundary still meets when one side's second cell is the other
    side's primary cell. One parsed SQL expression — same
    construction-cost rationale as :func:`_assign_clusters`."""
    top = F.expr(
        f"slice(transform({_assign_pairs_sql(vec_col, centroids)},"
        f" s -> s.c), 1, {int(n_probe)})"
    )
    exploded = emb.withColumn("_pc", top).select(
        *emb.columns, F.posexplode("_pc").alias("_rn0", "cluster")
    )
    return exploded.withColumn(
        "rn", (F.col("_rn0") + F.lit(1)).cast("int")
    ).drop("_rn0")


# Trained-quantizer memo: kmeans_fit is DETERMINISTIC given the input
# content and knobs, so callers that train on a whole table may pass an
# explicit content key (the contract queries use the embeddings table's
# file fingerprint) and every later fit with the same key returns the
# identical centroids without re-running the Lloyd jobs — the same
# cache discipline as the /tmp serving indexes, scoped to the process.
# Opt-in ONLY: an implicit key (e.g. df.inputFiles()) would wrongly
# alias a filtered df with its parent table.
_KMEANS_MEMO: dict[tuple, list[tuple[int, list[float]]]] = {}

# Blocked-kNN graph memo (same opt-in content-key discipline): the
# ranked top-k graph is deterministic given the corpus and knobs, so a
# keyed call localCheckpoints it once per session and every later
# composition over the same graph (hubness over the within-label
# graph, repeated bench runs) reuses the materialized rows instead of
# re-paying the Σ block² pair join. Keys carry the Spark
# applicationId — a checkpointed frame dies with its session, so a
# fresh session can never see a stale entry.
_KNN_GRAPH_MEMO: dict[tuple, "DataFrame"] = {}

# Plan-audit hook: a lazily-checkpointed frame explains as an opaque
# "Scan ExistingRDD", which would blind the plan lint and PLANS.md to
# the real join topology. The audit tools (tools/plan_lint.py,
# tools/gen_plans_md.py, plan-quality tests) set this True to build
# the full compute plan; runtime/bench keep the checkpoint reuse.
# It governs EVERY audit-sensitive lazy localCheckpoint in this module
# (the kNN graph memo and the recall-measurement pair caches), not just
# the graph memo it is named for. Prefer the scoped
# ``graph_memo_disabled()`` context manager in long-lived processes
# (ADVICE r10: a bare global set by a tool import would silently stay
# flipped); the module global remains the one the audit tools set.
GRAPH_MEMO_DISABLED = False


from contextlib import contextmanager as _contextmanager


@_contextmanager
def graph_memo_disabled():
    """Scoped form of the ``GRAPH_MEMO_DISABLED`` audit hook: disables
    checkpoint-memo reuse (so explain() shows the full compute plan)
    for the duration of the ``with`` block, then restores the previous
    value even on error."""
    global GRAPH_MEMO_DISABLED
    prev = GRAPH_MEMO_DISABLED
    GRAPH_MEMO_DISABLED = True
    try:
        yield
    finally:
        GRAPH_MEMO_DISABLED = prev


def _evict_dead_graph_memo(app_id: str) -> None:
    """Drop memo entries keyed by a DIFFERENT applicationId than the
    live session's (ADVICE r10): a checkpointed frame dies with its
    session, so entries from a stopped application hold dead
    DataFrame/JVM plan refs and would pin them for the process
    lifetime if a new SparkSession is created in the same process.
    Called on every insert — the memo never holds more than the live
    application's graphs."""
    for key in [k for k in _KNN_GRAPH_MEMO if k[0] != app_id]:
        del _KNN_GRAPH_MEMO[key]


def kmeans_fit(
    df: DataFrame,
    k: int = 8,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_to: int = 6,
    memo_key: str | None = None,
) -> list[tuple[int, list[float]]]:
    """Deterministic Lloyd's iterations, Spark-native.

    - init: the vectors with ``id < k`` (no RNG — reproducible anywhere)
    - assignment: narrow map against centroid literals (no shuffle)
    - update: per-dimension mean via posexplode + groupBy — ONE shuffle of
      (cluster, dim, partial-sums) per iteration, independent of corpus size
    - centroid components round to ``round_to`` decimals each iteration so
      an external engine re-running the same recipe converges identically
      (raw float means differ across engines in final ulps)

    Collecting k×d doubles per iteration to the driver is O(k·d) — the same
    centroid-broadcast structure MLlib uses; corpus size never hits the
    driver."""
    cache_key = None
    if memo_key is not None:
        cache_key = (memo_key, k, iters, vec_col, id_col, round_to)
        hit = _KMEANS_MEMO.get(cache_key)
        if hit is not None:
            return [(cid, list(cv)) for cid, cv in hit]
    # parallelism floor BEFORE the per-iteration assignment maps: the
    # k sq_dist folds per row are the expensive part of each Lloyd job
    # and inherit the scan's split count (one, for a small file)
    emb = _rebalanced(df.select(id_col, vec_col))
    centroids = [
        (int(r[id_col]), [round(float(x), round_to) for x in r[vec_col]])
        for r in emb.filter(F.col(id_col) < k).collect()
    ]
    for _ in range(iters):
        assigned = _assign_clusters(emb, centroids, vec_col)
        dims = (
            assigned.select("cluster", F.posexplode(vec_col).alias("d", "x"))
            .groupBy("cluster", "d")
            .agg(F.round(F.avg("x"), round_to).alias("c"))
        )
        rows = (
            dims.groupBy("cluster")
            .agg(F.array_sort(F.collect_list(F.struct("d", "c"))).alias("dc"))
            .select("cluster", F.transform("dc", lambda s: s["c"]).alias("centroid"))
            .collect()
        )
        centroids = sorted(
            (int(r["cluster"]), [float(x) for x in r["centroid"]]) for r in rows
        )
    if cache_key is not None:
        _KMEANS_MEMO[cache_key] = [(cid, list(cv)) for cid, cv in centroids]
    return centroids


def kmeans_ivf_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    n_clusters: int = 8,
    n_probe: int = 2,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    memo_key: str | None = None,
) -> DataFrame:
    """IVF ANN with a real (deterministically trained) k-means coarse
    quantizer: fit centroids, assign the corpus, probe the ``n_probe``
    clusters nearest the query, exact-rank only inside them.

    The probe choice is a driver-side O(k·d) computation; the corpus-side
    work is one narrow assignment map + a scan of ~n_probe/k of the data.
    At scale, persist the assignment as a partition column and the probe
    becomes partition pruning at the parquet scan."""
    centroids = kmeans_fit(
        df, k=n_clusters, iters=iters, vec_col=vec_col, id_col=id_col,
        memo_key=memo_key,
    )
    q = [float(x) for x in query_vec]

    def seq_sq_dist(cv: list[float]) -> float:
        acc = 0.0
        for x, y in zip(q, cv):
            acc += (x - y) * (x - y)
        return acc

    probes = {cid for cid, _ in sorted(
        centroids, key=lambda c: (seq_sq_dist(c[1]), c[0])
    )[:n_probe]}
    assigned = _assign_clusters(df.select(id_col, vec_col), centroids, vec_col)
    pruned = assigned.filter(F.col("cluster").isin(sorted(probes)))
    return brute_force_topk(pruned, query_vec, k, vec_col, id_col)


def kmeans_cluster_profile(
    df: DataFrame,
    n_clusters: int = 8,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    memo_key: str | None = None,
) -> DataFrame:
    """Quantizer health report: per trained k-means cluster, the member
    count and the EXACT inertia (sum of squared distances to the
    assigned centroid) — the two numbers that say whether an IVF
    coarse quantizer is usable (balanced buckets) and how lossy its
    cells are (inertia per member). Run it before shipping an index;
    a dominant cluster means probes degenerate to scans.

    Engine-exact: the per-row squared distance is the same sequential
    fold both engines compute bit-identically (the ann_kmeans_topk
    surface); it is snapped to e6 fixed-point (FLOOR(d·1e6 + 0.5) —
    IEEE-exact ops only) and accumulated in DECIMAL(38,0), so the
    cross-partition sum is order-invariant. Output one row per
    cluster: (cluster, n_vectors, inertia_e6, mean_sq_dist_e6).

    Scale shape: centroid training is the k-means pull (O(k·d) driver
    scalars/iteration); the profile itself is one narrow assignment
    map + ONE cluster-keyed aggregate (map-side combinable).
    """
    centroids = kmeans_fit(
        df, k=n_clusters, iters=iters, vec_col=vec_col, id_col=id_col,
        memo_key=memo_key,
    )
    assigned = _assign_clusters(df.select(id_col, vec_col), centroids, vec_col)
    # Look centroids up BY ID, not by list position: kmeans_fit keys clusters
    # on seed ids, and a cluster that empties during a Lloyd iteration drops
    # out of the returned list, so ids need not be contiguous 0..k-1. A
    # positional element_at(cent_lit, cluster+1) would silently pair rows
    # with the wrong centroid past any gap. The (id, vector) struct array is
    # a plan literal; the lookup lands in sq_dist's zip_with INPUT position,
    # so it evaluates once per row, never per element.
    cent_lit = F.expr(
        "array(" + ",".join(
            f"struct({int(cid)} AS i, {_darr_sql(cv)} AS v)"
            for cid, cv in sorted(centroids)
        ) + ")"
    )
    cvec = F.element_at(
        F.filter(cent_lit, lambda s: s["i"] == F.col("cluster")), 1
    )["v"]
    d2 = sq_dist(F.col(vec_col), cvec)
    snapped = F.floor(d2 * 1e6 + F.lit(0.5)).cast("decimal(38,0)")
    return (
        assigned.select("cluster", snapped.alias("_d6"))
        .groupBy("cluster")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vectors"),
            F.sum("_d6").cast("bigint").alias("inertia_e6"),
        )
        .withColumn(
            "mean_sq_dist_e6",
            F.expr("inertia_e6 div n_vectors").cast("bigint"),
        )
        .orderBy("cluster")
    )


def partitioned_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    part_col: str = "label",
    n_probe: int = 2,
) -> DataFrame:
    """IVF-style ANN: centroid per coarse partition (here the pre-assigned
    ``part_col``), probe the ``n_probe`` nearest partitions, brute-force only
    inside them.

    At 100 TB the centroid table is tiny (one row per partition → driver/
    broadcast scale) while the expensive scan touches ``n_probe/n_parts`` of
    the corpus. The probe choice is pulled to the driver — O(n_probe)
    ints, the same driver-scale class as the k-means centroid pull — and
    applied as a LITERAL ``isin`` filter, so when the corpus is
    Parquet-partitioned by ``part_col`` the pruning is a *static*
    ``PartitionFilters`` entry on the scan (plan-tested), not a
    dynamic-pruning heuristic that may or may not fire for a
    limit-derived build side.
    """
    # centroids: per-partition elementwise mean via posexplode + re-assemble
    dims = (
        df.select(part_col, F.posexplode(vec_col).alias("d", "x"))
        .groupBy(part_col, "d")
        .agg(F.avg("x").alias("c"))
    )
    centroids = dims.groupBy(part_col).agg(
        F.array_sort(
            F.collect_list(F.struct("d", "c"))
        ).alias("dc")
    ).select(part_col, F.transform("dc", lambda s: s["c"]).alias("centroid"))

    q = _darr_sql([float(x) for x in query_vec])
    # rounded sim + part_col tiebreak so probe choice is reproducible
    probe_ids = [
        r[0]
        for r in centroids.select(
            part_col, F.round(cosine("`centroid`", q), 6).alias("sim")
        )
        .orderBy(F.desc("sim"), F.asc(part_col))
        .limit(n_probe)
        .select(part_col)
        .collect()  # O(n_probe) scalars — probe list, not data
    ]
    pruned = df.filter(F.col(part_col).isin(probe_ids))
    return brute_force_topk(pruned, query_vec, k, vec_col, id_col)


def knn_join_blocked(
    df: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    block_col: str = "label",
    ivf_clusters: int | None = None,
    ivf_iters: int = 2,
    memo_key: str | None = None,
) -> DataFrame:
    """Batched k-nearest-neighbors join: every vector's top-k cosine
    neighbors *within its block* — the all-vectors workload shape
    (semantic-dedup clustering, hard-negative mining) as opposed to the
    single-query ``brute_force_topk``.

    Scale shape: the self-join is an equi-join on ``block_col``, so the
    only shuffle is one hash partition per side on the block key and the
    pair explosion is Σ block_size² — never corpus². Per-vector norms are
    computed ONCE before the join (O(n·d)), so the per-pair work is a
    single dot product; ranking is a ``row_number`` window over the same
    block-partitioned data. Rounded similarity + id tiebreak keep the
    ranking engine-reproducible.

    The 100 TB block key: pass ``ivf_clusters`` and the block becomes a
    deterministically trained k-means IVF assignment (``kmeans_fit`` +
    the narrow ``_assign_clusters`` map — no extra shuffle), so block
    sizes are ~n/clusters by construction and Σ block² is bounded by
    the cluster count knob instead of whatever cardinality ``label``
    happens to have. Recall vs the exact join is measured in
    ``tests/test_dedup.py::test_knn_ivf_block_recall_and_pair_bound``;
    an LSH bucket key (``hyperplane_signature``) is the other scale
    key, plan-tested in ``test_plan_quality.py``.

    Returns ``(vec_id, neighbor_id, block, cosine_sim, rank)``.

    ``memo_key`` (a content fingerprint) memoizes TWO artifacts: the
    trained k-means centroids (via ``kmeans_fit``'s memo) and — new in
    r10 — the ranked graph itself, localCheckpointed once per
    (session, content, parameters): the graph is deterministic given
    the corpus, so every composition over the same graph in a session
    (``knn_hubness`` over the within-label graph, repeated bench runs,
    the exact-kNN ground-truth tier next to an ANN recall measurement)
    pays the Σ block² pair join ONCE. The train-once/serve-many
    discipline of a real pipeline, same as the quantizer memo.
    """
    from pyspark.sql.window import Window

    graph_key = None
    if memo_key is not None and not GRAPH_MEMO_DISABLED:
        graph_key = (
            df.sparkSession.sparkContext.applicationId,
            memo_key, int(k), vec_col, id_col, block_col,
            ivf_clusters, ivf_iters,
        )
        hit = _KNN_GRAPH_MEMO.get(graph_key)
        if hit is not None:
            return hit

    # parallelism floor BEFORE the assignment map and the Σ block² pair
    # stage, so the per-row k-fold assignment and the per-pair dot folds
    # spread over the cores instead of riding one small-file split
    df = _rebalanced(df)
    if ivf_clusters is not None:
        centroids = kmeans_fit(
            df, k=ivf_clusters, iters=ivf_iters,
            vec_col=vec_col, id_col=id_col, memo_key=memo_key,
        )
        df = _assign_clusters(df, centroids, vec_col)
        block_col = "cluster"

    e = df.select(
        F.col(block_col).alias("block"),
        F.col(id_col),
        F.col(vec_col).alias("v"),
        l2_norm(_qid(vec_col)).alias("nrm"),
    )
    a = e.alias("a")
    b = e.select(
        "block",
        F.col(id_col).alias("neighbor_id"),
        F.col("v").alias("bv"),
        F.col("nrm").alias("bnrm"),
    ).alias("b")
    sim = F.round(
        dot("a.v", "b.bv") / (F.col("a.nrm") * F.col("b.bnrm")), 6
    )
    ranked = (
        a.join(b, "block")
        .filter(F.col(f"a.{id_col}") != F.col("neighbor_id"))
        .select(
            F.col(f"a.{id_col}").alias(id_col),
            "neighbor_id",
            F.col("block"),
            sim.alias("cosine_sim"),
        )
        .withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy(id_col).orderBy(
                    F.desc("cosine_sim"), F.asc("neighbor_id")
                )
            ),
        )
    )
    out = ranked.filter(F.col("rank") <= k)
    if graph_key is not None:
        # lazy: the first ACTION materializes the k·n-row graph; every
        # later composition in the session scans the checkpoint
        out = out.localCheckpoint(eager=False)
        _evict_dead_graph_memo(graph_key[0])
        _KNN_GRAPH_MEMO[graph_key] = out
    return out


def quantize_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Symmetric int8 quantization per vector: ``q_i = round(127 * x_i /
    amax)`` with the per-vector ``amax`` scale kept alongside — the
    4x memory compression every billion-vector ANN serving layer runs
    (FAISS SQ8 and friends). Returns ``(id, qvec: array<tinyint>,
    scale: double)``; dequantized error per component is at most
    ``scale/254``.

    Scale shape: one narrow projection of JVM higher-order functions —
    zero shuffles, zero Python; the amax is a single ``aggregate`` fold
    let-bound so it computes once per row, not once per component.
    All-zero vectors quantize to all-zero with scale 0 (guarded
    divide)."""
    from data_pipeline_ine_spark.functions.scalars import let_

    v = F.col(vec_col)

    def build(amax: Column) -> Column:
        safe = F.when(amax > 0, amax).otherwise(F.lit(1.0))
        return F.struct(
            F.transform(
                v,
                lambda x: F.round(F.lit(127.0) * x.cast("double") / safe)
                .cast("tinyint"),
            ).alias("qvec"),
            amax.alias("scale"),
        )

    amax = F.aggregate(
        v,
        F.lit(0.0),
        lambda acc, x: F.greatest(acc, F.abs(x.cast("double"))),
    )
    packed = let_(amax, build)
    return df.select(
        id_col, packed["qvec"].alias("qvec"), packed["scale"].alias("scale")
    )


def quantized_topk(
    qdf: DataFrame,
    query_vec: "Sequence[float]",
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate cosine top-k over int8-quantized vectors
    (:func:`quantize_embeddings` output): the query is quantized with
    the same rule, dot products run in EXACT integer arithmetic
    (sum of int16 products — deterministic on every platform, no float
    accumulation order), and ranking rescales by the two amax scales.
    Memory-bound scans read 1/4 the bytes of float32; ranking is
    TakeOrdered. Recall loss is the quantization error only — bounded,
    and measured against the exact ranker in the tests."""
    import numpy as np

    qarr = np.asarray(list(query_vec), dtype=np.float64)
    qmax = float(np.abs(qarr).max()) or 1.0
    qq = [int(x) for x in np.round(127.0 * qarr / qmax)]
    q = F.lit([int(x) for x in qq]).cast("array<int>")
    int_dot = F.aggregate(
        F.zip_with(F.col("qvec"), q, lambda a, b: a.cast("bigint") * b),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    qnorm = float(np.sqrt(sum(x * x for x in qq))) or 1.0
    inorm = F.sqrt(
        F.aggregate(
            F.transform(F.col("qvec"), lambda a: a.cast("bigint") * a),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).cast("double")
    )
    sim = F.round(
        int_dot.cast("double") / (F.greatest(inorm, F.lit(1e-12)) * qnorm), 6
    )
    return (
        qdf.select(id_col, sim.alias("qcosine"))
        .orderBy(F.desc("qcosine"), F.asc(id_col))
        .limit(k)
    )


# --- Product quantization (IVF-PQ's compression half), integer-exact -------

PQ_SCALE = 10_000  # fixed-point quantizer: floor(x·1e4 + 0.5), engine-exact


def pq_codebook(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 4,
    n_codes: int = 8,
    trained: bool = False,
    iters: int = 2,
    memo_key: str | None = None,
) -> list[list[list[int]]]:
    """Deterministic PQ codebook — ``cb[s][c]`` is code ``c``'s integer
    subvector for subspace ``s``, fixed-point quantized.

    Two paths behind the ``trained`` flag:

    - ``trained=False`` (contract/oracle path): the ``n_codes``
      lowest-id vectors, split into ``m`` subvectors — reproducible in
      plain SQL, exercising the identical encode/ADC machinery.
    - ``trained=True`` (production path): each subspace's codewords are
      k-means centroids over that subspace's subvectors (``kmeans_fit``:
      deterministic lowest-id init, per-iteration rounded updates, one
      (cluster, dim) shuffle per iteration independent of corpus size).
      Same nested-int output structure, lower quantization error. A
      cluster that empties falls back to its init subvector so every
      subspace keeps exactly ``n_codes`` codewords.

    Driver pull is O(n_codes · dim) either way — the same benign scalar
    class as the k-means centroid pull."""
    rows = (
        df.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(n_codes)
        .collect()
    )
    dim = len(rows[0][1])
    sub = dim // m
    import math

    q = lambda x: int(math.floor(float(x) * PQ_SCALE + 0.5))  # noqa: E731
    base = [
        [[q(r[1][s * sub + d]) for d in range(sub)] for r in rows]
        for s in range(m)
    ]
    if not trained:
        return base
    out: list[list[list[int]]] = []
    for s in range(m):
        sub_df = df.select(
            F.col(id_col),
            F.slice(vec_col, s * sub + 1, sub).alias(vec_col),
        )
        cents = dict(
            kmeans_fit(
                sub_df, k=n_codes, iters=iters, vec_col=vec_col,
                id_col=id_col,
                # subspace-qualified: each slice is a DIFFERENT input
                memo_key=None if memo_key is None else f"{memo_key}:s{s}",
            )
        )
        out.append(
            [
                [q(x) for x in cents[c]] if c in cents else base[s][c]
                for c in range(n_codes)
            ]
        )
    return out


def _pq_cb_sql(codebook: list[list[list[int]]]) -> str:
    """Nested ``array<array<array<bigint>>>`` literal text for a PQ
    codebook — the SQL-text building block the whole PQ family shares
    (construction-cost note above)."""
    return (
        "array(" + ",".join(
            "array(" + ",".join(
                "array(" + ",".join(f"{int(v)}L" for v in code) + ")"
                for code in sub
            ) + ")"
            for sub in codebook
        ) + ")"
    )


def _pq_lit(codebook: list[list[list[int]]]) -> Column:
    # one parsed literal instead of m*n_codes*sub py4j round-trips (the
    # construction-cost note above); BIGINT elements as before
    return F.expr(_pq_cb_sql(codebook))


def _vint_sql(vec_sql: str) -> str:
    """Fixed-point transform text: the identical
    ``floor(x·PQ_SCALE + 0.5)`` map :func:`pq_encode` built through the
    Column API (double multiply, double add, FLOOR→BIGINT — same
    coercions, bit-identical values)."""
    return (
        f"transform({vec_sql}, x -> CAST(FLOOR(CAST(x AS DOUBLE)"
        f" * {PQ_SCALE} + 0.5D) AS BIGINT))"
    )


def pq_encode(
    df: DataFrame,
    codebook: list[list[list[int]]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    keep_cols: "Sequence[str]" = (),
) -> DataFrame:
    """PQ encode: each vector becomes ``m`` one-byte codes — the nearest
    codebook entry per subspace by squared L2 distance over the SAME
    fixed-point integers the oracle sees (ties break to the lowest code).
    64 float32 dims compress to 4 codes: a 64× scan-size cut.

    Scale shape: the codebook rides along as a literal nested array, so
    encoding is ONE narrow whole-stage-codegen projection — zero
    shuffles, zero Python, no join; argmin is an integer fold over
    codes nested in a fold over subspace dims, all exact BIGINT.

    Built as ONE parsed SQL expression (r12): the Column-API/let_
    construction paid ~350 py4j round-trips of driver time per call at
    m=4 (the construction-cost note above, ~3 ms each on this box) for
    the same operator tree — the let_ binding is the literal
    ``element_at(transform(array(v), ...), 1)`` form, the integer
    arithmetic and struct-fold argmin are unchanged."""
    m = len(codebook)
    n_codes = len(codebook[0])
    sub = len(codebook[0][0])
    cb = _pq_cb_sql(codebook)
    diff = (
        f"(element_at(vi, CAST(s * {sub} + d + 1 AS INT)) - "
        f"element_at(element_at(element_at({cb}, CAST(s AS INT) + 1), c),"
        " CAST(d AS INT) + 1))"
    )
    # (a-b)·(a-b) in BIGINT: diffs ≤ 2·PQ_SCALE·|x|max so squares stay
    # far inside int64 — exact, no float in the hot loop; the code
    # distance is let-bound (evaluated once per codeword, not twice)
    cdist = (
        f"aggregate(sequence(0, {sub - 1}), CAST(0 AS BIGINT),"
        f" (a2, d) -> a2 + {diff} * {diff})"
    )
    code_for = (
        f"aggregate(sequence(1, {n_codes}),"
        f" named_struct('dist', CAST({2**62} AS BIGINT), 'code', -1),"
        f" (acc, c) -> element_at(transform(array({cdist}),"
        " d0 -> CASE WHEN d0 < acc.dist THEN"
        " named_struct('dist', d0, 'code', CAST(c - 1 AS INT))"
        " ELSE acc END), 1)).code"
    )
    codes = (
        f"element_at(transform(array({_vint_sql(_qid(vec_col))}),"
        f" vi -> transform(sequence(0, {m - 1}), s -> {code_for})), 1)"
    )
    return df.select(
        id_col, *keep_cols, F.expr(codes).alias("pq_codes")
    )


def pq_recon_err_col(
    vec_col: str, codebook: list[list[list[int]]]
) -> Column:
    """Per-subspace PQ reconstruction error as ONE narrow JVM
    expression: for each subspace ``s``, the minimum over codewords of
    the exact BIGINT squared distance between the vector's fixed-point
    subvector and the codeword — i.e. the quantization error the
    encoder would accept for this vector under ``codebook``. Returns
    an array of ``m`` BIGINTs (subspace order).

    The drift-measurement companion of ``pq_encode`` (same ``_diff``
    integer arithmetic, same let-bound fold so nothing re-evaluates
    per element); ``sources/ivf_index.py::pq_quant_drift_report``
    aggregates it per subspace to price a FROZEN codebook against a
    cohort-derived one. Zero shuffles, zero Python. One parsed SQL
    expression (r12) — the ``pq_encode`` construction-cost rationale;
    operator tree unchanged."""
    m = len(codebook)
    n_codes = len(codebook[0])
    sub = len(codebook[0][0])
    cb = _pq_cb_sql(codebook)

    def err_for(s: int) -> str:
        diff = (
            f"(element_at(vi, {s * sub} + CAST(d AS INT) + 1) - "
            f"element_at(element_at(element_at({cb}, {s + 1}), c),"
            " CAST(d AS INT) + 1))"
        )
        cdist = (
            f"aggregate(sequence(0, {sub - 1}), CAST(0 AS BIGINT),"
            f" (a2, d) -> a2 + {diff} * {diff})"
        )
        return (
            f"aggregate(sequence(1, {n_codes}),"
            f" CAST({2**62} AS BIGINT),"
            f" (acc, c) -> element_at(transform(array({cdist}),"
            " dd -> least(acc, dd)), 1))"
        )

    errs = ",".join(err_for(s) for s in range(m))
    return F.expr(
        f"element_at(transform(array({_vint_sql(_qid(vec_col))}),"
        f" vi -> array({errs})), 1)"
    )


def pq_topk(
    codes_df: DataFrame,
    codebook: list[list[list[int]]],
    query_vec: "Sequence[float]",
    k: int = 10,
    id_col: str = "vec_id",
    codes_col: str = "pq_codes",
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes: the query's
    distance to every codebook entry is precomputed into an m×n_codes
    lookup table (driver-side, pure integers), and each candidate's
    approximate distance is ``m`` table lookups + adds — the scan that
    makes billion-vector ANN serveable.

    Scale shape: the LUT is a 32-entry literal riding the plan; the scan
    is one narrow projection over the (64×-compressed) code table and a
    TakeOrdered top-k — zero shuffles, zero Python, deterministic
    integer distances with id tie-break."""
    import math

    m = len(codebook)
    sub = len(codebook[0][0])
    q = [
        int(math.floor(float(x) * PQ_SCALE + 0.5)) for x in list(query_vec)
    ]
    lut = [
        [
            sum(
                (q[s * sub + d] - code[d]) ** 2
                for d in range(sub)
            )
            for code in codebook[s]
        ]
        for s in range(m)
    ]
    lut_sql = (
        "array(" + ",".join(
            "array(" + ",".join(f"{int(v)}L" for v in row) + ")"
            for row in lut
        ) + ")"
    )
    # one parsed SQL expression (r12): the ADC fold is identical to the
    # Column-built form, minus ~40 py4j round-trips per call
    dist = F.expr(
        f"aggregate(sequence(0, {m - 1}), CAST(0 AS BIGINT),"
        f" (acc, s) -> acc + element_at(element_at({lut_sql},"
        f" CAST(s AS INT) + 1),"
        f" element_at({_qid(codes_col)}, CAST(s AS INT) + 1) + 1))"
    )
    return (
        codes_df.select(id_col, dist.alias("pq_dist"))
        .orderBy(F.asc("pq_dist"), F.asc(id_col))
        .limit(k)
    )


def pq_dedup_groups(
    codes_df: DataFrame,
    id_col: str = "vec_id",
    codes_col: str = "pq_codes",
) -> DataFrame:
    """Semantic dedup by quantization bucket (the SemDeDup idea reduced
    to its deterministic core): vectors whose PQ codes are IDENTICAL
    fell into the same cell of the product-quantized space in every
    subspace — semantic near-duplicates at the codebook's resolution.
    Returns each bucket with ≥2 members and its keeper (min id).

    Scale shape: the code array serializes to a short string key and the
    whole operator is ONE groupBy on it — map-side combined, no pairwise
    anything, no similarity join. Resolution (and so precision/recall)
    is set upstream by codebook size: more codes ⇒ finer cells ⇒ fewer,
    tighter dup groups. The classic 100 TB first-pass before any
    pairwise verify."""
    key = F.concat_ws(
        ",", F.transform(F.col(codes_col), lambda x: x.cast("string"))
    )
    return (
        codes_df.groupBy(key.alias("pq_key"))
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.min(id_col).alias("survivor_id"),
        )
        .filter(F.col("n_members") >= 2)
    )


def semantic_dedup(
    df: DataFrame,
    tau: float = 0.97,
    n_clusters: int = 8,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    memo_key: str | None = None,
    centroids: list[tuple[int, list[float]]] | None = None,
    n_probe: int = 1,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023) reduced to its deterministic core:
    cluster the corpus with the deterministic k-means, then WITHIN each
    cluster drop every vector that has an earlier-id vector with cosine
    similarity ≥ ``tau``. The kept set provably contains no
    WITHIN-CLUSTER pair above the threshold (if kept i < j shared a
    cluster and were similar, j would have been dropped by i) — a
    near-dup pair that straddles a cluster boundary both survive,
    inherent to SemDeDup's cluster-then-dedup design (finer clustering
    shrinks that blind spot; only an all-pairs pass removes it).
    Relative to the paper's sequential greedy pass it may over-drop — a
    drop can be justified by a vector that was itself dropped — which
    is the conservative direction for dedup.

    Scale shape: assignment is the narrow centroid-literal map; the
    only pairwise work is a cluster-keyed self-ANTI-join whose pair
    volume is Σ cluster² — bounded by the cluster-count knob, exactly
    ``knn_join_blocked(ivf_clusters=...)``'s discipline, never corpus².
    Rounded similarity keeps the threshold test engine-reproducible.

    ``centroids`` injects a pre-trained quantizer (the paper trains on a
    corpus sample, not the dedup input — and a composed pipeline reuses
    ONE quantizer across stages); when omitted, k-means trains on ``df``
    itself. Returns the KEPT rows: (id, cluster).

    ``n_probe`` > 1 is the multi-probe variant that shrinks the
    boundary blind spot (r10 verdict): every vector is ALSO compared
    inside its ``n_probe``-nearest cells against those cells' primary
    members — a pair is tested whenever either side's primary cell is
    in the other side's probe set, so a near-dup pair straddling one
    boundary is caught as long as a second-closest cell crosses it.
    Pair volume grows to ``n_probe``·Σ block² (one exploded side ⋈ one
    primary side) — still knob-bounded, never corpus². The residual
    miss rate at each (n_clusters, n_probe) is MEASURED, not asserted:
    ``semantic_dedup_recall`` prices it against the exact ≥tau pair
    set, same discipline as ``ivf_recall_curve``.
    """
    if centroids is None:
        centroids = kmeans_fit(
            df, k=n_clusters, iters=iters, vec_col=vec_col, id_col=id_col,
            memo_key=memo_key,
        )
    if n_probe > 1:
        return _semantic_dedup_multiprobe(
            df, centroids, tau, n_probe, vec_col, id_col
        )
    # parallelism floor before the assignment map and the Σ cluster²
    # pair join (guide §2.6): both stream this frame
    assigned = _assign_clusters(
        _rebalanced(df.select(id_col, vec_col)), centroids, vec_col
    )
    e = assigned.select(
        "cluster",
        F.col(id_col),
        F.col(vec_col).alias("_v"),
        l2_norm(_qid(vec_col)).alias("_n"),
    )
    a = e.alias("a")
    b = e.select(
        "cluster",
        F.col(id_col).alias("_jid"),
        F.col("_v").alias("_jv"),
        F.col("_n").alias("_jn"),
    ).alias("b")
    sim = F.round(
        dot("a.`_v`", "b.`_jv`") / (F.col("a._n") * F.col("b._jn")),
        6,
    )
    dropped = (
        a.join(b, "cluster")
        .filter(
            (F.col("_jid") < F.col(f"a.{id_col}"))
            & (sim >= F.lit(float(tau)))
        )
        .select(F.col(f"a.{id_col}").alias(id_col))
        .distinct()
    )
    return (
        e.join(dropped, id_col, "left_anti")
        .select(id_col, "cluster")
    )


def _semantic_dedup_multiprobe(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    tau: float,
    n_probe: int,
    vec_col: str,
    id_col: str,
) -> DataFrame:
    """The ``n_probe`` > 1 body of ``semantic_dedup``: exploded probe
    assignments on one join side, primary assignments on the other, so
    the candidate set is every (vector, primary member of one of its
    ``n_probe`` nearest cells) pair. The drop rule keeps SemDeDup's
    earlier-id-wins: for every covered pair at rounded cosine ≥ tau the
    GREATER id drops. A pair whose coverage is one-directional (only
    one side's probe set contains the other's primary cell) appears in
    one join direction only — that is enough, because
    ``greatest(id, id)`` is direction-symmetric: whichever side the
    row lands on, the same greater id drops (ADVICE r11: no
    both-directions guarantee exists or is needed). With
    ``n_probe = 1`` this would reduce to the
    primary-cell rule; the main body keeps the original single-probe
    plan untouched. Returns kept (id, primary cluster)."""
    asg = _assign_clusters_multi(
        _rebalanced(df.select(id_col, vec_col)), centroids, vec_col, n_probe
    )
    e = asg.select(
        "cluster",
        "rn",
        F.col(id_col),
        F.col(vec_col).alias("_v"),
        l2_norm(_qid(vec_col)).alias("_n"),
    )
    prim = e.filter(F.col("rn") == 1).drop("rn")
    a = e.drop("rn").alias("a")
    b = prim.select(
        "cluster",
        F.col(id_col).alias("_jid"),
        F.col("_v").alias("_jv"),
        F.col("_n").alias("_jn"),
    ).alias("b")
    sim = F.round(
        dot("a.`_v`", "b.`_jv`") / (F.col("a._n") * F.col("b._jn")),
        6,
    )
    dropped = (
        a.join(b, "cluster")
        .filter(
            (F.col("_jid") != F.col(f"a.{id_col}"))
            & (sim >= F.lit(float(tau)))
        )
        .select(
            F.greatest(F.col(f"a.{id_col}"), F.col("_jid")).alias(id_col)
        )
        .distinct()
    )
    return prim.join(dropped, id_col, "left_anti").select(id_col, "cluster")


def semantic_dedup_recall(
    df: DataFrame,
    tau: float = 0.3,
    n_clusters_list: "Sequence[int]" = (4, 8, 16),
    n_probes: "Sequence[int]" = (1, 2),
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    memo_key: str | None = None,
) -> DataFrame:
    """Pair recall of cluster-blocked semantic dedup vs the EXACT ≥tau
    pair set, as a function of (n_clusters, n_probe) — the dedup rung
    of the measure-don't-guess ladder (``ivf_recall_curve`` prices the
    probe budget, ``pq_recall_curve``/``sq8_recall_curve`` the
    quantization grids; this prices SemDeDup's cluster-boundary blind
    spot, which ``semantic_dedup``'s docstring previously only
    asserted). A ≥tau pair is COVERED when the blocking would test it:
    either side's primary cell lies in the other side's ``n_probe``
    nearest cells — exactly ``semantic_dedup``'s candidate rule at
    that (n_clusters, n_probe).

    Returns one row per configuration: ``(n_clusters, n_probe,
    exact_pairs, covered_pairs, recall)``.

    Scale shape: the exact ground-truth pair self-join is the one
    deliberately quadratic stage (the thing being priced — same class
    as ``pq_recall_curve``'s brute-force side); run it on a sample at
    100 TB. It is computed ONCE and lazily checkpointed (audit hook:
    ``GRAPH_MEMO_DISABLED`` builds the full plan instead), then every
    configuration joins the |pairs|-row frame against a narrow
    exploded assignment — |configs| equi-joins, no further pairwise
    work. k-means fits share the quantizer memo per ``n_clusters``.
    """
    # parallelism floor for the exact-pair stage: the BNLJ streams this
    # side, so without it the whole deliberately-quadratic ground truth
    # evaluates in ONE task (measured 26 s core-time serial at sf0.1)
    df = _rebalanced(df)
    e = df.select(
        F.col(id_col).alias("_i"),
        F.col(vec_col).alias("_v"),
        l2_norm(_qid(vec_col)).alias("_n"),
    )
    b = e.select(
        F.col("_i").alias("_j"),
        F.col("_v").alias("_jv"),
        F.col("_n").alias("_jn"),
    )
    sim = F.round(
        dot("`_v`", "`_jv`") / (F.col("_n") * F.col("_jn")), 6
    )
    pairs = (
        e.join(b, F.col("_j") > F.col("_i"))
        .filter(sim >= F.lit(float(tau)))
        .select("_i", "_j")
    )
    if not GRAPH_MEMO_DISABLED:
        pairs = pairs.localCheckpoint(eager=False)
    exact_cnt = pairs.count()  # O(1) scalar to the driver

    # ONE merged coverage plan over every (n_clusters, n_probe)
    # configuration (r12): the previous per-config loop built 6
    # independent join→distinct→agg branches (one union of 6 aggregate
    # subtrees — ~2,000 py4j construction round-trips and 12 broadcast
    # builds per invocation). The merged form tags each k's assignment
    # frame with its n_clusters, unions the three narrow frames, joins
    # the pair set ONCE against both sides, and applies the per-config
    # probe rule (rn ≤ p on both sides, either side primary) from a
    # |configs|-row broadcast — the covered set per configuration is
    # definitionally the same, then one distinct + one groupBy replace
    # six distinct+agg branches.
    from data_pipeline_ine_spark.functions.localframe import local_frame

    max_probe = max(int(p) for p in n_probes)
    asg_parts = []
    for n_clusters in n_clusters_list:
        centroids = kmeans_fit(
            df, k=int(n_clusters), iters=iters, vec_col=vec_col,
            id_col=id_col, memo_key=memo_key,
        )
        asg = _assign_clusters_multi(
            df.select(id_col, vec_col), centroids, vec_col, max_probe
        ).select(F.col(id_col), "cluster", "rn")
        if not GRAPH_MEMO_DISABLED:
            # one narrow (id, cluster, rn) frame per n_clusters, reused
            # by BOTH sides of the merged coverage join — without the
            # checkpoint both broadcast builds re-run the k-fold
            # assignment map as their own single-task jobs. Same audit
            # hook as the pair cache above.
            asg = asg.localCheckpoint(eager=False)
        asg_parts.append(
            asg.select(
                F.lit(int(n_clusters)).cast("bigint").alias("_nc"),
                F.col(id_col), "cluster", "rn",
            )
        )
    asg_all = asg_parts[0]
    for part in asg_parts[1:]:
        asg_all = asg_all.unionByName(part)
    cfg = local_frame(
        df.sparkSession,
        [
            (int(n_clusters), int(p))
            for n_clusters in n_clusters_list
            for p in n_probes
        ],
        "_cnc long, _np long",
    )
    ai = asg_all.select(
        "_nc", F.col(id_col).alias("_i"), "cluster",
        F.col("rn").alias("_rni"),
    )
    aj = asg_all.select(
        "_nc", F.col(id_col).alias("_j"), "cluster",
        F.col("rn").alias("_rnj"),
    )
    covered = (
        pairs.join(ai, "_i")
        .join(aj, ["_nc", "_j", "cluster"])
        .join(
            F.broadcast(cfg),
            (F.col("_cnc") == F.col("_nc"))
            & (F.col("_rni") <= F.col("_np"))
            & (F.col("_rnj") <= F.col("_np")),
        )
        .filter((F.col("_rni") == 1) | (F.col("_rnj") == 1))
        .select("_cnc", "_np", "_i", "_j")
        .distinct()
        .groupBy("_cnc", "_np")
        .agg(F.count(F.lit(1)).cast("bigint").alias("covered_pairs"))
    )
    return (
        cfg.join(covered, ["_cnc", "_np"], "left")
        .select(
            F.col("_cnc").alias("n_clusters"),
            F.col("_np").alias("n_probe"),
            F.lit(int(exact_cnt)).cast("bigint").alias("exact_pairs"),
            F.coalesce("covered_pairs", F.lit(0))
            .cast("bigint")
            .alias("covered_pairs"),
            F.round(
                F.coalesce("covered_pairs", F.lit(0)).cast("double")
                / F.lit(float(max(exact_cnt, 1))),
                6,
            ).alias("recall"),
        )
        .orderBy("n_clusters", "n_probe")
    )


# --- 1-bit binary quantization (Hamming shortlist + exact rescore) ---------
#
# The quantization ladder's bottom rung: one SIGN BIT per dimension
# against the per-dim (min+max)/2 midpoint — 8 bytes per 64-dim vector,
# 32x below float32, 8x below SQ8. Codes pack into 32-bit words inside
# BIGINTs, so candidate ranking is bit_count(XOR) per word — integer,
# engine-exact, SIMD-class inside whole-stage codegen. Serving is the
# modern vector-DB "binary quantization + rescore" pattern: Hamming
# shortlist over the packed codes, exact cosine only over the
# shortlist; binary_recall_curve measures the rescore budget this
# actually needs (the same measure-don't-guess discipline as
# ivf/pq/sq8_recall_curve).

_BQ_WORD_BITS = 32


# Midpoint memo (ADVICE r11): binary_midpoints is an eager corpus-wide
# posexplode+groupBy+collect, and a session serving many queries (or a
# query computing both the rerank and the curve) would re-pay the full
# scan per call. Same opt-in content-key discipline as _KMEANS_MEMO:
# MIN/MAX midpoints are deterministic given the input content, so an
# explicit memo_key (the contract queries' table fingerprint) returns
# the cached O(dim) scalars; an implicit key would wrongly alias a
# filtered df with its parent table.
_BQ_MIDS_MEMO: dict[tuple, list[float]] = {}


def binary_midpoints(
    df: DataFrame, vec_col: str = "embedding",
    memo_key: str | None = None,
) -> list[float]:
    """Per-dimension (min+max)/2 thresholds — order-invariant (MIN/MAX
    are exact, one correctly-rounded add + an exact halving), the same
    determinism trick as SQ8's affine bounds; O(dim) scalars to the
    driver. ``memo_key`` (a content fingerprint) caches the scalars per
    (key, vec_col) so repeated serving calls skip the corpus scan."""
    cache_key = None
    if memo_key is not None:
        cache_key = (memo_key, vec_col)
        hit = _BQ_MIDS_MEMO.get(cache_key)
        if hit is not None:
            return list(hit)
    rows = (
        df.select(F.posexplode(vec_col).alias("d", "x"))
        .groupBy("d")
        .agg(
            F.min("x").cast("double").alias("lo"),
            F.max("x").cast("double").alias("hi"),
        )
        .collect()
    )
    by_d = {int(r.d): (float(r.lo) + float(r.hi)) / 2.0 for r in rows}
    mids = [by_d[d] for d in sorted(by_d)]
    if cache_key is not None:
        _BQ_MIDS_MEMO[cache_key] = list(mids)
    return mids


def _bq_word_cols(vec_col: str, mids: list[float]) -> list[Column]:
    """Packed sign-bit words: word w holds dims [32w, 32w+32) as bits
    0..31 of a BIGINT — no bit ever reaches position 63, so the sum
    never overflows and XOR/bit_count stay in non-negative space."""
    words = []
    n = len(mids)
    for w in range((n + _BQ_WORD_BITS - 1) // _BQ_WORD_BITS):
        # one parsed expression per word instead of ~6 py4j round-trips
        # per bit (construction-cost note above); integer adds, so the
        # packed value is unchanged by construction form
        terms = ["CAST(0 AS BIGINT)"]
        for i in range(w * _BQ_WORD_BITS, min(n, (w + 1) * _BQ_WORD_BITS)):
            bit = 1 << (i - w * _BQ_WORD_BITS)
            terms.append(
                f"(CASE WHEN CAST(element_at({_qid(vec_col)}, {i + 1}) AS DOUBLE)"
                f" > {_dlit(mids[i])} THEN CAST({bit} AS BIGINT)"
                " ELSE CAST(0 AS BIGINT) END)"
            )
        words.append(F.expr(" + ".join(terms)))
    return words


def _bq_query_words(query_vec: "Sequence[float]", mids: list[float]) -> list[int]:
    words = []
    n = len(mids)
    for w in range((n + _BQ_WORD_BITS - 1) // _BQ_WORD_BITS):
        acc = 0
        for i in range(w * _BQ_WORD_BITS, min(n, (w + 1) * _BQ_WORD_BITS)):
            if float(query_vec[i]) > mids[i]:
                acc |= 1 << (i - w * _BQ_WORD_BITS)
        words.append(acc)
    return words


def binary_topk_rerank(
    df: DataFrame,
    query_vec: "Sequence[float]",
    k: int = 10,
    shortlist: int = 50,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    mids: "list[float] | None" = None,
    memo_key: str | None = None,
) -> DataFrame:
    """Two-stage binary serving: Hamming-rank the packed sign-bit codes
    against the query's code (ties by id — a total order), keep the
    ``shortlist`` nearest, exact-cosine rerank to the final top-``k``.
    The corpus-wide pass touches 8 bytes/vector of integer math; exact
    float work is O(shortlist). Returns (id_col, hamming, cosine_sim)
    ranked by the rounded-cosine + id order every serving oracle pins.
    ``mids`` accepts precomputed midpoints (skip the corpus scan);
    ``memo_key`` memoizes them by content key (ADVICE r11)."""
    if mids is None:
        mids = binary_midpoints(df, vec_col, memo_key=memo_key)
    qwords = _bq_query_words(query_vec, mids)
    words = _bq_word_cols(vec_col, mids)
    ham = None
    for wc, qw in zip(words, qwords):
        t = F.bit_count(wc.bitwiseXOR(F.lit(int(qw)).cast("long")))
        ham = t if ham is None else ham + t
    q = _darr_sql([float(x) for x in query_vec])
    short = (
        df.select(
            F.col(id_col),
            F.col(vec_col),
            ham.cast("bigint").alias("hamming"),
        )
        .orderBy(F.asc("hamming"), F.asc(id_col))
        .limit(int(shortlist))
    )
    return (
        short.select(
            id_col,
            "hamming",
            F.round(cosine(_qid(vec_col), q), 6).alias("cosine_sim"),
        )
        .orderBy(F.desc("cosine_sim"), F.asc(id_col))
        .limit(int(k))
    )


def binary_recall_curve(
    df: DataFrame,
    query_vec: "Sequence[float]",
    shortlists: "Sequence[int]" = (10, 25, 50, 100),
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    mids: "list[float] | None" = None,
    memo_key: str | None = None,
) -> DataFrame:
    """Recall@k of Hamming-shortlist + exact rescore vs global exact
    cosine, as a function of the rescore budget — the bottom rung of
    the accuracy ladder's evidence (flat probes / SQ8 grid / PQ codes /
    sign bits), and the knob a binary-quantized serving tier actually
    tunes: how many candidates must the exact pass rescore before
    recall saturates. One midpoint aggregate serves every budget; the
    largest shortlist's Hamming ranking is computed once and every
    smaller budget is a prefix of it. ``mids``/``memo_key``: see
    ``binary_topk_rerank`` (ADVICE r11 — a query computing both the
    rerank and the curve shares one midpoint scan)."""
    if mids is None:
        mids = binary_midpoints(df, vec_col, memo_key=memo_key)
    qwords = _bq_query_words(query_vec, mids)
    words = _bq_word_cols(vec_col, mids)
    ham = None
    for wc, qw in zip(words, qwords):
        t = F.bit_count(wc.bitwiseXOR(F.lit(int(qw)).cast("long")))
        ham = t if ham is None else ham + t
    q = _darr_sql([float(x) for x in query_vec])
    ranked = (
        df.select(
            F.col(id_col),
            ham.cast("bigint").alias("_ham"),
            F.round(cosine(_qid(vec_col), q), 6).alias("_cos"),
        )
        .orderBy(F.asc("_ham"), F.asc(id_col))
        .limit(int(max(shortlists)))
    )
    if not GRAPH_MEMO_DISABLED:
        ranked = ranked.localCheckpoint(eager=False)
    exact_ids = brute_force_topk(
        df, query_vec, k=k, vec_col=vec_col, id_col=id_col
    ).select(id_col)
    from pyspark.sql.window import Window

    pos = ranked.withColumn(
        "_pos",
        F.row_number().over(
            # max(shortlists)-row frame: bounded by the largest budget,
            # never data-sized
            Window.orderBy(F.asc("_ham"), F.asc(id_col))
        ),
    )
    parts = []
    for s in shortlists:
        approx = (
            pos.filter(F.col("_pos") <= int(s))
            .orderBy(F.desc("_cos"), F.asc(id_col))
            .limit(int(k))
            .select(id_col)
        )
        parts.append(
            approx.join(exact_ids, id_col)
            .agg(F.count(F.lit(1)).cast("bigint").alias("hits"))
            .select(
                F.lit(int(s)).cast("bigint").alias("shortlist"),
                F.lit(int(k)).cast("bigint").alias("k"),
                "hits",
                F.round(
                    F.col("hits").cast("double") / F.lit(float(k)), 6
                ).alias("recall"),
            )
        )
    out = parts[0]
    for part in parts[1:]:
        out = out.unionByName(part)
    return out.orderBy("shortlist")


# --- Matryoshka prefix-dimension serving (truncate + rescore) --------------


def prefix_dim_topk_rerank(
    df: DataFrame,
    query_vec: "Sequence[float]",
    k: int = 10,
    shortlist: int = 50,
    prefix_dims: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Matryoshka-style two-stage serving (Kusupati et al. 2022 MRL —
    and the truncation trick production retrieval applies even to
    non-MRL embeddings): first-pass cosine over only the FIRST
    ``prefix_dims`` components (a ``slice`` — the scan reads 4x less
    vector payload at 16/64 dims, and at 100 TB the prefix can be
    STORED as its own narrow column so the full vectors are only
    fetched for the shortlist), shortlist the best, exact full-dim
    rerank to top-``k``. The dimension axis of the serving ladder,
    orthogonal to the precision axis (SQ8/PQ/binary): truncate
    components vs truncate bits. Returns (id, prefix_sim, cosine_sim)
    in the rounded-cosine + id order all serving oracles pin."""
    p = int(prefix_dims)
    qp = _darr_sql([float(x) for x in query_vec[:p]])
    q = _darr_sql([float(x) for x in query_vec])
    pref = f"slice({_qid(vec_col)}, 1, {int(p)})"
    short = (
        df.select(
            F.col(id_col),
            F.col(vec_col),
            F.round(cosine(pref, qp), 6).alias("prefix_sim"),
        )
        .orderBy(F.desc("prefix_sim"), F.asc(id_col))
        .limit(int(shortlist))
    )
    return (
        short.select(
            id_col,
            "prefix_sim",
            F.round(cosine(_qid(vec_col), q), 6).alias("cosine_sim"),
        )
        .orderBy(F.desc("cosine_sim"), F.asc(id_col))
        .limit(int(k))
    )


def prefix_dim_recall_curve(
    df: DataFrame,
    query_vec: "Sequence[float]",
    prefixes: "Sequence[int]" = (8, 16, 32, 64),
    k: int = 10,
    shortlist: int = 50,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Recall@k of prefix-dimension shortlist + exact rescore vs global
    exact cosine, per prefix length — how many leading components the
    first pass needs before the shortlist stops losing true neighbors
    (at prefix = full dims the first pass IS exact, so the curve ends
    at 1.0 by construction whenever shortlist >= k: a built-in sanity
    anchor). One exact top-k serves every prefix.

    All per-prefix first-pass similarities AND the exact full-dim
    cosine are computed in ONE narrow scan and lazily checkpointed
    (r12): the previous form paid one full scan + sliced-cosine pass
    per prefix plus one for the exact side — |prefixes|+1 scans of the
    vector table for identical values (guide §1.2: fewer passes). Each
    branch's shortlist/rescore/top-k ordering is unchanged (the exact
    side is ``brute_force_topk``'s rounded-cosine + id order on the
    same doubles), so every branch returns the identical rows."""
    q = _darr_sql([float(x) for x in query_vec])
    sims = df.select(
        F.col(id_col),
        F.col(vec_col),
        F.round(cosine(_qid(vec_col), q), 6).alias("_cs"),
        *[
            F.round(
                cosine(
                    f"slice({_qid(vec_col)}, 1, {int(p)})",
                    _darr_sql([float(x) for x in query_vec[: int(p)]]),
                ),
                6,
            ).alias(f"_ps{int(p)}")
            for p in prefixes
        ],
    )
    if not GRAPH_MEMO_DISABLED:
        sims = sims.localCheckpoint(eager=False)
    exact_ids = (
        sims.orderBy(F.desc("_cs"), F.asc(id_col))
        .limit(int(k))
        .select(id_col)
    )
    parts = []
    for p in prefixes:
        short = (
            sims.select(
                F.col(id_col), F.col("_cs"),
                F.col(f"_ps{int(p)}").alias("_ps"),
            )
            .orderBy(F.desc("_ps"), F.asc(id_col))
            .limit(int(shortlist))
        )
        approx = (
            short.orderBy(F.desc("_cs"), F.asc(id_col))
            .limit(int(k))
            .select(id_col)
        )
        parts.append(
            approx.join(exact_ids, id_col)
            .agg(F.count(F.lit(1)).cast("bigint").alias("hits"))
            .select(
                F.lit(int(p)).cast("bigint").alias("prefix_dims"),
                F.lit(int(k)).cast("bigint").alias("k"),
                "hits",
                F.round(
                    F.col("hits").cast("double") / F.lit(float(k)), 6
                ).alias("recall"),
            )
        )
    out = parts[0]
    for part in parts[1:]:
        out = out.unionByName(part)
    return out.orderBy("prefix_dims")


# --- Random projection (Johnson–Lindenstrauss), integer-deterministic ------

RP_MOD = 65536
RP_HALF = 32768


def rp_component(i: Column | int, j: Column | int) -> Column:
    """Projection-matrix entry P[i][j] from the same integer-LCG formula
    family as hyperplane_signature — exact integer arithmetic in
    [-32768, 32767], so ANY SQL engine regenerates the matrix
    bit-for-bit (a float PRNG would not replicate)."""
    ii = F.lit(i) if isinstance(i, int) else i
    jj = F.lit(j) if isinstance(j, int) else j
    return (ii * 2654435761 + jj * 40503 + 12345) % RP_MOD - RP_HALF


def random_projection(
    df: DataFrame,
    out_dim: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    out_col: str = "proj",
) -> DataFrame:
    """Johnson–Lindenstrauss dimensionality reduction: project each
    vector through a deterministic dense integer matrix — pairwise
    distances are preserved within ~ sqrt(in_dim/out_dim) relative
    error (JL lemma; the pytest pins the measured distortion), so every
    downstream ANN/dedup pass runs on out_dim/in_dim of the bytes.

    Scale shape: ONE narrow whole-stage-codegen projection — the matrix
    is a formula, not data (nothing to broadcast, nothing to train),
    each output component an INTEGER fold over the fixed-pointed input
    (``floor(x·1e4 + 0.5)``) — zero shuffles, zero Python, and the
    output is exact BIGINT (order-free, engine-portable), not an
    order-sensitive float accumulation. Magnitudes: |component| ≤
    |x|·1e4 · 2^15 · in_dim ≈ 2^38 for unit-scale inputs — far inside
    int64."""
    from data_pipeline_ine_spark.functions.scalars import let_

    vint = F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") * PQ_SCALE + F.lit(0.5)).cast(
            "bigint"
        ),
    )

    def project(vv: Column) -> Column:
        def comp(j: Column) -> Column:
            return F.aggregate(
                F.sequence(F.lit(1), F.size(vv)),
                F.lit(0).cast("bigint"),
                lambda acc, i: acc
                + F.element_at(vv, i) * rp_component(i - 1, j).cast("bigint"),
            )

        return F.transform(F.sequence(F.lit(0), F.lit(out_dim - 1)), comp)

    return df.select(id_col, let_(vint, project).alias(out_col))


def centroid_drift(
    df: DataFrame,
    vec_col: str = "embedding",
    label_col: str = "label",
    scale: int = 10**6,
) -> DataFrame:
    """Per-group embedding centroid drift vs the corpus centroid — the
    embedding-space health check a training pipeline runs per source /
    per day: a group whose mean vector wanders from the corpus mean
    signals domain shift, a broken encoder, or a poisoned slice.
    (Mean-pooling is THE embedding reduce; this is its monitored form.)

    Engine-exact by construction: each component is snapped once to
    integer fixed-point (``floor(x·scale + 0.5)`` — IEEE-exact ops),
    summed as BIGINT, and the drift is the division-free cross-multiple
    ``Σ_d (s_ld·N − S_d·n_l)²`` in DECIMAL(38,0): comparing
    ``s_ld/n_l`` with ``S_d/N`` without ever dividing, so no rounding
    rule enters the surface. (Magnitude: |x|·scale·n·N must stay under
    1e19 per term — holds to ~1e6 vectors per group at scale=1e6.)

    Shuffle shape: one narrow posexplode, one (label, dim) aggregate
    (labels × dim rows — tiny), a dim-keyed broadcast of the global
    sums, one label-sized aggregate. The corpus is touched once.
    """
    comp = df.select(
        F.col(label_col).alias("label"),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("dim", "x"),
    ).select(
        "label",
        "dim",
        F.floor(F.col("x") * scale + F.lit(0.5)).cast("bigint").alias("v"),
    )
    ld = comp.groupBy("label", "dim").agg(
        F.sum("v").alias("s"), F.count(F.lit(1)).alias("n")
    )
    g = ld.groupBy("dim").agg(
        F.sum("s").alias("gs"), F.sum("n").alias("gn")
    )
    term = (
        F.col("s").cast("decimal(38,0)") * F.col("gn")
        - F.col("gs").cast("decimal(38,0)") * F.col("n")
    )
    return (
        ld.join(F.broadcast(g), "dim")
        .groupBy("label")
        .agg(
            F.min("n").alias("n_vecs"),
            F.sum(term * term).alias("drift_num"),
        )
        .select("label", "n_vecs", "drift_num")
    )


def knn_hubness(
    df: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
    memo_key: str | None = None,
) -> DataFrame:
    """k-occurrence (hubness) histogram of the label-blocked kNN graph:
    for each vector, ``n_k`` = how many OTHER vectors list it among
    their top-k — then, per label block, how many vectors have each
    ``n_k``. Hubness is the standard ANN health diagnostic: a heavy
    right tail (hubs appearing in hundreds of neighbor lists) is the
    high-dimensional pathology that silently wrecks recall targets and
    skews bucketed probe costs; antihubs (n_k = 0) never get retrieved
    at all.

    Pure composition over ``knn_join_blocked``'s exact top-k (one
    block-keyed shuffle, Σ block² pair cost): one count per
    neighbor_id, one left join back so antihubs keep n_k = 0, one
    ≤(k·|block|)-cell histogram. All integers. ``memo_key`` flows to
    the underlying graph's content-keyed memo, so a session that also
    ran the within-label kNN join with the same key shares ONE
    materialized graph.
    """
    knn = knn_join_blocked(
        df, k=k, vec_col=vec_col, id_col=id_col, memo_key=memo_key
    )
    occ = knn.groupBy(
        F.col("block").alias(label_col),
        F.col("neighbor_id").alias(id_col),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("_nk"))
    all_vecs = df.select(label_col, id_col)
    per_vec = all_vecs.join(occ, [label_col, id_col], "left").select(
        label_col, F.coalesce("_nk", F.lit(0)).cast("bigint").alias("n_k")
    )
    return (
        per_vec.groupBy(label_col, "n_k")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_vectors"))
        .orderBy(label_col, "n_k")
    )


def pq_recall_curve(
    df: DataFrame,
    m: int = 4,
    n_codes: int = 8,
    ks: "Sequence[int]" = (1, 5, 10),
    n_queries: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Recall@k curve of the PQ/ADC index against exact search — the
    "measure, don't guess" harness for the quantization tier: per k,
    the fraction of exact top-k neighbors the compressed scan actually
    returns, averaged over ``n_queries`` held-out queries (the lowest
    ids, deterministic). THE number that decides whether m/n_codes are
    adequate before anything ships.

    Exactness: ground truth is exact squared L2 over the SAME
    fixed-point integers PQ quantizes (so the curve isolates CODEBOOK
    loss, not float noise); ADC distances are the same exact BIGINTs
    the serving path computes; both rankings row_number under
    (distance, id). Recall ships as hits + one fixed double divide.

    Scale shape: queries broadcast against the corpus (n_queries ·
    corpus pairs — the eval-harness cost, linear in corpus per query);
    the ADC side is the same LUT-free integer expression as serving;
    two per-query rank windows; a ≤|ks|-row output. At 100 TB you
    sample the corpus for the curve — the operator takes whatever df
    you hand it.
    """
    from pyspark.sql import Window

    cb = pq_codebook(df, vec_col, id_col, m=m, n_codes=n_codes)
    sub = len(cb[0][0])
    codes = pq_encode(df, cb, vec_col, id_col)
    # parallelism floor: the n_queries·corpus scored-pair stage streams
    # this side (guide §2.6)
    base = _rebalanced(df).select(
        F.col(id_col), F.expr(_vint_sql(_qid(vec_col))).alias("_vi")
    )
    queries = (
        base.orderBy(id_col)
        .limit(n_queries)
        .select(F.col(id_col).alias("_qid"), F.col("_vi").alias("_qv"))
    )
    pairs = (
        base.join(codes, id_col)
        .crossJoin(F.broadcast(queries))
        .filter(F.col(id_col) != F.col("_qid"))
    )
    # both distances as ONE parsed SQL expression each (r12): the
    # Column-API construction of the 64-term ADC sum alone cost ~700
    # py4j round-trips per call; the parsed trees are the identical
    # left-nested integer sums
    exact_d = F.expr(
        "aggregate(zip_with(_qv, _vi, (a, b) -> (a - b) * (a - b)),"
        " CAST(0 AS BIGINT), (acc, x) -> acc + x)"
    )
    # the query-side codeword is let-bound per subspace (the let_ idiom
    # in SQL text) so the 512-literal codebook appears once per
    # subspace, not once per term — integer addition is associative, so
    # grouping the 64-term sum by subspace leaves the BIGINT exact
    cb_sql = _pq_cb_sql(cb)
    s_terms = []
    for s in range(m):
        cw = (
            f"element_at(element_at({cb_sql}, {s + 1}),"
            f" CAST(element_at(pq_codes, {s + 1}) + 1 AS INT))"
        )
        d_terms = " + ".join(
            f"(element_at(_qv, {s * sub + d + 1}) - element_at(w, {d + 1}))"
            f" * (element_at(_qv, {s * sub + d + 1})"
            f" - element_at(w, {d + 1}))"
            for d in range(sub)
        )
        s_terms.append(
            f"element_at(transform(array({cw}), w -> {d_terms}), 1)"
        )
    pq_d = F.expr("CAST(" + " + ".join(s_terms) + " AS BIGINT)")
    scored = pairs.select(
        "_qid",
        F.col(id_col).alias("_cand"),
        exact_d.alias("_ed"),
        pq_d.alias("_pd"),
    )
    we = Window.partitionBy("_qid").orderBy("_ed", "_cand")
    wp = Window.partitionBy("_qid").orderBy("_pd", "_cand")
    ranked = scored.withColumn(
        "_erk", F.row_number().over(we)
    ).withColumn("_prk", F.row_number().over(wp))
    ks_frame = local_frame(
        df.sparkSession, [(int(k),) for k in ks], "k long"
    )
    hits = (
        ranked.select("_erk", "_prk")
        .crossJoin(F.broadcast(ks_frame))
        .filter((F.col("_erk") <= F.col("k")) & (F.col("_prk") <= F.col("k")))
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("bigint").alias("hits"))
    )
    return (
        ks_frame.join(hits, "k", "left")
        .select(
            "k",
            F.lit(int(n_queries)).cast("bigint").alias("n_queries"),
            F.coalesce("hits", F.lit(0)).cast("bigint").alias("hits"),
            F.round(
                F.coalesce("hits", F.lit(0)).cast("double")
                / (F.col("k") * F.lit(int(n_queries))).cast("double"),
                6,
            ).alias("recall"),
        )
        .orderBy("k")
    )


def ivf_recall_curve(
    df: DataFrame,
    query_vec: "Sequence[float]",
    n_probes: "Sequence[int]" = (1, 2, 4),
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    part_col: str = "label",
) -> DataFrame:
    """Recall@k of the IVF (cell-probed) index vs exact search as a
    function of ``n_probe`` — the other half of the measure-don't-guess
    pair next to ``pq_recall_curve``: PQ's curve prices quantization
    loss, this one prices the probe budget (how many cells you must
    scan before the true neighbors stop leaking into unprobed cells).

    Per ``n_probe``: the probed top-k (``partitioned_topk`` — centroid
    ranking, then exact cosine within probed cells) intersected with
    the global exact top-k (``brute_force_topk``); recall = hits/k.
    Both rankings share the rounded-cosine + id total order the serving
    oracles pin, so the curve is engine-exact.

    Scale shape: one centroid aggregate + |n_probes| cell-restricted
    scans (each cheaper than the full exact scan); the intersection
    joins k-row frames. Sample queries at 100 TB — the operator takes
    one query vector by design (the per-query harness; loop outside).
    """
    exact_ids = brute_force_topk(
        df, query_vec, k=k, vec_col=vec_col, id_col=id_col
    ).select(id_col)
    parts = []
    for p in n_probes:
        approx = partitioned_topk(
            df,
            query_vec,
            k=k,
            vec_col=vec_col,
            id_col=id_col,
            part_col=part_col,
            n_probe=p,
        ).select(id_col)
        parts.append(
            approx.join(exact_ids, id_col).agg(
                F.count(F.lit(1)).cast("bigint").alias("hits")
            ).select(
                F.lit(int(p)).cast("bigint").alias("n_probe"),
                F.lit(int(k)).cast("bigint").alias("k"),
                "hits",
                F.round(
                    F.col("hits").cast("double") / F.lit(float(k)), 6
                ).alias("recall"),
            )
        )
    out = parts[0]
    for part in parts[1:]:
        out = out.unionByName(part)
    return out.orderBy("n_probe")


def sq8_recall_curve(
    df: DataFrame,
    query_vec: "Sequence[float]",
    n_probes: "Sequence[int]" = (1, 2, 4),
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    part_col: str = "label",
) -> DataFrame:
    """Recall@k of SQ8 code-space ranking vs exact cosine as a function
    of ``n_probe`` — the third rung of the quantization ladder's
    accuracy evidence: ``ivf_recall_curve`` prices the probe budget at
    full precision, ``pq_recall_curve`` prices PQ's quantization loss,
    and this one prices the int8 affine grid (scan cost 4x below
    float32, loss far below PQ). Same measurement discipline as both:
    the approximate top-k (bucket-probed, exact BIGINT code-space
    squared distance — ``read_sq8_probe``'s ranking rule) intersected
    with the global exact cosine top-k, recall = hits/k.

    One posexplode pass serves the per-bucket centroids AND the global
    affine bounds (``write_sq8_index``'s trick); probe prefixes for all
    ``n_probes`` come from ONE centroid ranking collect (O(buckets)
    scalars). Everything that decides a hit is integer or
    rounded-cosine arithmetic, so the curve is engine-exact.

    Scale shape: one corpus encode map + |n_probes| bucket-restricted
    ranked scans (each cheaper than the exact scan it is measured
    against); intersections join k-row frames. One query vector by
    design — the per-query harness; sample queries and loop outside.
    """
    from data_pipeline_ine_spark.sources.ivf_index import (
        _sq8_code_expr,
        _sq8_code_py,
    )

    dims = (
        df.select(part_col, F.posexplode(vec_col).alias("d", "x"))
        .groupBy(part_col, "d")
        .agg(
            F.avg("x").alias("c"),
            F.min("x").cast("double").alias("_bmin"),
            F.max("x").cast("double").alias("_bmax"),
        )
        .localCheckpoint()  # one pass feeds bounds AND centroids
    )
    bounds = (
        dims.groupBy("d")
        .agg(F.min("_bmin").alias("vmin"), F.max("_bmax").alias("vmax"))
        .collect()  # O(dim) scalars
    )
    by_d = {int(r.d): (float(r.vmin), float(r.vmax)) for r in bounds}
    mins = [by_d[d][0] for d in sorted(by_d)]
    spans = [by_d[d][1] - by_d[d][0] for d in sorted(by_d)]
    qcodes = [
        _sq8_code_py(float(x), mins[i], spans[i])
        for i, x in enumerate(query_vec)
    ]
    qlit = F.lit([int(c) for c in qcodes])

    cents = (
        dims.groupBy(part_col)
        .agg(F.array_sort(F.collect_list(F.struct("d", "c"))).alias("dc"))
        .select(
            part_col, F.transform("dc", lambda s: s["c"]).alias("centroid")
        )
    )
    q = _darr_sql([float(x) for x in query_vec])
    # ONE ranking collect; every n_probe is a prefix of it
    ranked_parts = [
        r[0]
        for r in cents.select(
            part_col, F.round(cosine("`centroid`", q), 6).alias("sim")
        )
        .orderBy(F.desc("sim"), F.asc(part_col))
        .select(part_col)
        .collect()  # O(buckets) scalars — probe plan, not data
    ]

    codes = df.select(
        id_col,
        part_col,
        _sq8_code_expr(F.col(vec_col), mins, spans).alias("_codes"),
    )
    dist = F.aggregate(
        F.zip_with(
            F.col("_codes"), qlit,
            lambda a, b: ((a - b) * (a - b)).cast("bigint"),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    exact_ids = brute_force_topk(
        df, query_vec, k=k, vec_col=vec_col, id_col=id_col
    ).select(id_col)

    parts = []
    for p in n_probes:
        probe = ranked_parts[: int(p)]
        approx = (
            codes.filter(F.col(part_col).isin(probe))
            .select(id_col, dist.alias("_dist"))
            .orderBy(F.asc("_dist"), F.asc(id_col))
            .limit(k)
            .select(id_col)
        )
        parts.append(
            approx.join(exact_ids, id_col)
            .agg(F.count(F.lit(1)).cast("bigint").alias("hits"))
            .select(
                F.lit(int(p)).cast("bigint").alias("n_probe"),
                F.lit(int(k)).cast("bigint").alias("k"),
                "hits",
                F.round(
                    F.col("hits").cast("double") / F.lit(float(k)), 6
                ).alias("recall"),
            )
        )
    out = parts[0]
    for part in parts[1:]:
        out = out.unionByName(part)
    return out.orderBy("n_probe")


def hard_negative_mining(
    df: DataFrame,
    k: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
    ivf_clusters: int = 8,
    ivf_iters: int = 2,
    memo_key: str | None = None,
    n_probe: int = 1,
) -> DataFrame:
    """Hard-negative mining for contrastive training: for every anchor
    vector, the top-``k`` most-cosine-similar vectors carrying a
    DIFFERENT label — the near-miss examples a metric-learning /
    embedding-finetune loop needs (easy negatives are random pairs;
    the hard ones live right next to the anchor in embedding space).

    Candidates come from the anchor's TRAINED IVF cluster (the
    deterministic ``kmeans_fit`` + narrow ``_assign_clusters`` map —
    ``knn_join_blocked``'s 100 TB block key, and with the same
    ``memo_key`` the centroids are shared with it for free): hard
    negatives are by definition near the anchor, so the cluster block
    is exactly the right candidate set, and the pair cost stays
    Σ block² ≈ n²/clusters, never corpus². With ``n_probe = 1`` a
    cross-label neighbor in a different cluster is missed — the
    standard ANN mining tradeoff; ``n_probe`` > 1 probes the anchor's
    ``n_probe`` nearest cells (candidates stay in their primary cell,
    the IVF query shape), which is exactly where borderline hard
    negatives live — pair volume ``n_probe``·Σ block², so
    (ivf_clusters=16, n_probe=2) costs what (8, 1) costs while seeing
    across every anchor's nearest boundary. The label filter
    runs BEFORE the rank window, so anchors surrounded by same-label
    vectors still surface their true cross-label near-misses (a
    filter after a top-k graph would lose them). Anchors whose
    cluster holds no other label emit no rows; NULL labels never
    match the inequality and are excluded by rule.

    Returns ``(id_col, anchor_label, neighbor_id, negative_label,
    block, cosine_sim, rank)``.
    """
    from pyspark.sql.window import Window

    centroids = kmeans_fit(
        df, k=ivf_clusters, iters=ivf_iters,
        vec_col=vec_col, id_col=id_col, memo_key=memo_key,
    )
    # parallelism floor before the assignment map and the n_probe·Σ
    # block² pair join (guide §2.6): both stream this frame
    df = _rebalanced(df)
    if n_probe > 1:
        # anchors exploded into their n_probe nearest cells; candidates
        # stay in their primary cell (the IVF query shape) — each
        # (anchor, candidate) pair meets at most once since the
        # candidate's primary cell is unique
        asgm = _assign_clusters_multi(df, centroids, vec_col, n_probe)
        a_src = asgm.drop("rn")
        b_src = asgm.filter(F.col("rn") == 1).drop("rn")
    else:
        asg = _assign_clusters(df, centroids, vec_col)
        a_src = asg
        b_src = asg
    e = a_src.select(
        F.col("cluster").alias("block"),
        F.col(id_col),
        F.col(label_col).alias("_lbl"),
        F.col(vec_col).alias("v"),
        l2_norm(_qid(vec_col)).alias("nrm"),
    )
    a = e.alias("a")
    b = b_src.select(
        F.col("cluster").alias("block"),
        F.col(id_col).alias("neighbor_id"),
        F.col(label_col).alias("_blbl"),
        F.col(vec_col).alias("bv"),
        l2_norm(_qid(vec_col)).alias("bnrm"),
    ).alias("b")
    sim = F.round(
        dot("a.v", "b.bv") / (F.col("a.nrm") * F.col("b.bnrm")), 6
    )
    ranked = (
        a.join(b, "block")
        .filter(
            (F.col(f"a.{id_col}") != F.col("neighbor_id"))
            & (F.col("a._lbl") != F.col("_blbl"))
        )
        .select(
            F.col(f"a.{id_col}").alias(id_col),
            F.col("a._lbl").alias("anchor_label"),
            "neighbor_id",
            F.col("_blbl").alias("negative_label"),
            F.col("block"),
            sim.alias("cosine_sim"),
        )
        .withColumn(
            "rank",
            F.row_number()
            .over(
                Window.partitionBy(id_col).orderBy(
                    F.desc("cosine_sim"), F.asc("neighbor_id")
                )
            )
            .cast("bigint"),
        )
    )
    return ranked.filter(F.col("rank") <= k)

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
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def embedding_norms(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    return df.select(id_col, F.round(l2_norm(F.col(vec_col)), 4).alias("l2_norm"))


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
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    out = df.select(
        id_col, F.round(cosine(F.col(vec_col), q), 6).alias("cosine_sim")
    )
    if exclude_id is not None:
        out = out.filter(F.col(id_col) != exclude_id)
    return out.orderBy(F.desc("cosine_sim"), F.asc(id_col)).limit(k)


N_PLANES = 8


def hyperplane_signature(vec: Column, n_planes: int = N_PLANES) -> Column:
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
    """
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
    n_planes: int = N_PLANES,
    round_to: int = 6,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, LSH-bucketed.

    All-pairs cosine is O(n²) — 5·10¹⁵ comparisons for a 100M-doc corpus.
    Bucketing by hyperplane signature first means only same-bucket pairs
    (collision probability (1-θ/π)^n_planes, concentrated on near-dups) are
    verified with exact cosine. Shuffle cost: one hash partition by the
    8-bit signature + the tiny intra-bucket self-join.
    """
    # norm computed once per ROW here (not once per pair in the join): same
    # sequential fold → bit-identical doubles, ~3× less array math when the
    # average bucket pairs each row with many others
    sig = df.select(
        F.col(id_col),
        F.col(vec_col).alias("_v"),
        l2_norm(F.col(vec_col)).alias("_n"),
        hyperplane_signature(F.col(vec_col), n_planes).alias("_sig"),
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
                dot(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb")),
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
        hyperplane_signature(F.col(vec_col), n_planes).alias("_sig"),
    )
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    # query signature as plan-time literals: one row, computed once
    qsig = (
        df.sparkSession.range(1)
        .select(hyperplane_signature(q, n_planes).alias("s"))
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
            id_col, F.round(cosine(F.col("_v"), q), 6).alias("cosine_sim")
        )
        .orderBy(F.desc("cosine_sim"), F.asc(id_col))
        .limit(k)
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
    the corpus; with the corpus Parquet-partitioned by ``part_col``, the
    pruning happens at the scan via partition filters.
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

    q = F.array(*[F.lit(float(x)) for x in query_vec])
    # rounded sim + part_col tiebreak so probe choice is reproducible
    probes = (
        centroids.select(
            part_col, F.round(cosine(F.col("centroid"), q), 6).alias("sim")
        )
        .orderBy(F.desc("sim"), F.asc(part_col))
        .limit(n_probe)
        .select(part_col)
    )
    pruned = df.join(F.broadcast(probes), part_col)
    return brute_force_topk(pruned, query_vec, k, vec_col, id_col)

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
    probes = (
        centroids.select(part_col, cosine(F.col("centroid"), q).alias("sim"))
        .orderBy(F.desc("sim"))
        .limit(n_probe)
        .select(part_col)
    )
    pruned = df.join(F.broadcast(probes), part_col)
    return brute_force_topk(pruned, query_vec, k, vec_col, id_col)

"""IVF ANN index as a partitioned table — the 100 TB serving path.

``partitioned_topk``/``kmeans_ivf_topk`` (operators/similarity.py) prove
the probe shape inline: assign a coarse bucket, filter to the probed
buckets, exact-rank inside. At serving scale the assignment must be
PERSISTED so every query pays only a pruned scan, not a re-assignment
pass. This module is that persistence layer:

- ``write_ivf_index``: bucket the corpus (a caller-supplied coarse
  column, or a deterministically trained k-means assignment), write it
  as a parquet table **partitioned by the bucket**, and write the
  per-bucket centroids (elementwise means) to an underscore-prefixed
  sidecar directory that parquet readers skip.
- ``read_ivf_probe``: pull the centroid sidecar (O(buckets·dim) — the
  same driver-scale class as MLlib's centroid broadcast), pick the
  ``n_probe`` nearest buckets driver-side, and scan the index with a
  LITERAL ``isin`` filter — Catalyst turns that into a **static
  ``PartitionFilters`` entry** on the parquet scan (plan-pinned in
  tests/test_plan_quality.py), so unprobed buckets are never read:
  the scan cost is ~``n_probe/n_buckets`` of the corpus at any scale.

Probe choice is reproducible across engines: rounded cosine
similarity + bucket-key tiebreak, exactly ``partitioned_topk``'s rule
(its DuckDB oracle re-derives the probes from the same arithmetic).

Beyond-reference component: the reference has no vector path; the
design is the standard IVF layout (FAISS coarse quantizer) expressed
as Spark partitioned storage + partition pruning.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BUCKET_COL = "bucket"
_CENTROID_DIR = "_centroids"  # leading "_": invisible to parquet readers


def write_ivf_index(
    df: DataFrame,
    path: str,
    part_col: str | None = None,
    n_clusters: int = 8,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> None:
    """Write ``df`` as an IVF index at ``path``: parquet partitioned by
    the coarse bucket, plus the per-bucket centroid sidecar.

    ``part_col=None`` trains the deterministic k-means of
    ``similarity.kmeans_fit`` and buckets on its assignment (one narrow
    map — centroids are plan literals); otherwise the existing column
    is the bucket (e.g. a label, a pre-computed assignment). The bucket
    column is always stored as ``bucket`` so readers need no schema
    knowledge.
    """
    from data_pipeline_ine_spark.operators.similarity import (
        _assign_clusters,
        kmeans_fit,
    )

    if part_col is None:
        centroids = kmeans_fit(
            df, k=n_clusters, iters=iters, vec_col=vec_col, id_col=id_col
        )
        src = _assign_clusters(df, centroids, vec_col)
        part_col = "cluster"
    else:
        src = df
    # "b" prefix pins the partition values as STRINGS both ways —
    # partition-column type inference would otherwise read numeric
    # bucket directories back as ints and the probe isin would coerce
    bucketed = src.withColumn(
        BUCKET_COL, F.concat(F.lit("b"), F.col(part_col).cast("string"))
    )
    if part_col != BUCKET_COL:
        bucketed = bucketed.drop(part_col)
    bucketed.write.partitionBy(BUCKET_COL).mode("overwrite").parquet(path)

    # per-bucket elementwise-mean centroids (partitioned_topk's recipe):
    # |buckets|·dim cells — dimension-sized, the probe table
    dims = (
        bucketed.select(BUCKET_COL, F.posexplode(vec_col).alias("d", "x"))
        .groupBy(BUCKET_COL, "d")
        .agg(F.avg("x").alias("c"))
    )
    cents = (
        dims.groupBy(BUCKET_COL)
        .agg(F.array_sort(F.collect_list(F.struct("d", "c"))).alias("dc"))
        .select(
            BUCKET_COL,
            F.transform("dc", lambda s: s["c"]).alias("centroid"),
        )
    )
    cents.coalesce(1).write.mode("overwrite").parquet(
        f"{path}/{_CENTROID_DIR}"
    )


def read_ivf_probe(
    spark: SparkSession,
    path: str,
    query_vec: Sequence[float],
    k: int = 10,
    n_probe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-k cosine neighbors of ``query_vec`` from the index at
    ``path``, scanning ONLY the ``n_probe`` buckets whose centroids are
    nearest the query. The probe list is collected driver-side
    (O(n_probe) scalars) and applied as a literal ``isin`` — a static
    partition-pruning filter on the parquet scan."""
    from data_pipeline_ine_spark.operators.similarity import (
        brute_force_topk,
        cosine,
    )

    cents = spark.read.parquet(f"{path}/{_CENTROID_DIR}")
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    probe_ids = [
        r[0]
        for r in cents.select(
            BUCKET_COL,
            F.round(cosine(F.col("centroid"), q), 6).alias("sim"),
        )
        .orderBy(F.desc("sim"), F.asc(BUCKET_COL))
        .limit(n_probe)
        .select(BUCKET_COL)
        .collect()  # O(n_probe) scalars — probe list, not data
    ]
    probed = spark.read.parquet(path).filter(
        F.col(BUCKET_COL).isin(probe_ids)
    )
    return brute_force_topk(probed, query_vec, k, vec_col, id_col)

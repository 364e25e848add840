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
from data_pipeline_ine_spark.functions.localframe import local_frame
from data_pipeline_ine_spark.operators.similarity import (
    _darr_sql,
    _qid,
    cosine,
)

BUCKET_COL = "bucket"
_CENTROID_DIR = "_centroids"  # leading "_": invisible to parquet readers
# exactly-once markers for streaming appends (streaming/index_maintenance.py)
_BATCH_COMMITS_DIR = "_batch_commits"
# Matryoshka prefix-tier params sidecar (stored prefix_dims knob): the
# index layout that makes the prefix rung an I/O saving, not just a
# compute saving — the first serving pass scans ONLY the narrow stored
# prefix column (see write_prefix_index / read_prefix_rerank)
_PREFIXPARAMS_DIR = "_prefixparams"


def _bucket_order_cols() -> list:
    """Probe-selection tiebreak keys: the NUMERIC bucket id when the
    bucket value parses as one (matching build-time ``_assign_clusters``
    and the oracles' integer-label ordering — the bucket STRING sorts
    'b10' < 'b2' and would silently diverge once an index exceeds 10
    buckets), falling back to the string for non-numeric label-style
    buckets (where every numeric key is NULL and the string decides)."""
    num = F.expr(f"try_cast(substring({BUCKET_COL}, 2, 18) AS BIGINT)")
    return [F.asc(num), F.asc(BUCKET_COL)]


def _sidecar_rows(sidecar_path: str) -> list:
    """Driver-side read of a config-sized sidecar parquet (centroids,
    codebook, quantization params — every sidecar is a single
    ``coalesce(1)`` file of O(buckets·dim) scalars). Decoding it with
    pyarrow on the driver returns the SAME Row list a
    ``spark.read.parquet(...).collect()`` produces — identical values
    (parquet doubles/ints/lists decode losslessly on either path),
    identical field and row order (one file, one writer task) — without
    paying a Spark job (file listing + task schedule + collect) per
    sidecar read. r13, guide §1.2 "fewer jobs": the batch-probe paths
    serialized 2–3 of these jobs per invocation. Re-read on every call:
    nothing is cached across runs."""
    import glob
    import os

    import pyarrow.parquet as pq
    from pyspark.sql import Row

    files = sorted(glob.glob(os.path.join(sidecar_path, "*.parquet")))
    if not files:
        raise FileNotFoundError(f"no sidecar parquet under {sidecar_path}")
    rows: list = []
    for f in files:
        tbl = pq.read_table(f)
        cols = tbl.column_names
        row_cls = Row(*cols)
        for rec in zip(*(tbl.column(c).to_pylist() for c in cols)):
            rows.append(row_cls(*rec))
    return rows


def write_ivf_index(
    df: DataFrame,
    path: str,
    part_col: str | None = None,
    n_clusters: int = 8,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    memo_key: str | None = None,
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
    from concurrent.futures import ThreadPoolExecutor

    from data_pipeline_ine_spark.operators.similarity import (
        _assign_clusters,
        kmeans_fit,
    )

    if part_col is None:
        centroids = kmeans_fit(
            df, k=n_clusters, iters=iters, vec_col=vec_col, id_col=id_col,
            memo_key=memo_key,
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
    # per-bucket elementwise-mean centroids (partitioned_topk's recipe,
    # 6dp-snapped per ADVICE r11 — probe selection ranks round(cosine, 6)
    # and an unrounded avg wobbles with summation order): ONE collect
    # serves the sidecar, and it runs CONCURRENTLY with the data write —
    # the two jobs are independent, so the build's wall time is the max,
    # not the sum (guide §2.6). The sidecar WRITE waits for the data
    # write: mode("overwrite") on ``path`` clears the root first and
    # would race a sidecar landing under it.
    with ThreadPoolExecutor(max_workers=1) as pool:
        data_write = pool.submit(
            lambda: bucketed.write.partitionBy(BUCKET_COL)
            .mode("overwrite")
            .parquet(path)
        )
        stats = _bucket_dim_stats(bucketed, vec_col)
        data_write.result()
    _write_cents_sidecar(df.sparkSession, path, stats)
    _commit_marker(path)


_CODEBOOK_DIR = "_codebook"  # leading "_": invisible to parquet readers
_SQPARAMS_DIR = "_sqparams"  # SQ8 per-dim affine params sidecar


def _bucket_dim_stats(bucketed: DataFrame, vec_col: str) -> list:
    """ONE config-sized collect serving every build sidecar: per-(bucket,
    dim) 6dp-rounded mean plus exact min/max — |buckets|·dim rows of
    scalars. The mean is rounded INSIDE the aggregate (same
    ``round(avg(x), 6)`` composition the old two-job chain computed), so
    the collected values are bit-identical to the previously written
    centroid components; min/max are order-invariant. Replaces the
    localCheckpoint + second-shuffle + collect chain each writer paid
    (guide §1.2: fewer jobs, not faster jobs)."""
    return (
        bucketed.select(BUCKET_COL, F.posexplode(vec_col).alias("d", "x"))
        .groupBy(BUCKET_COL, "d")
        .agg(
            F.round(F.avg("x"), 6).alias("c"),
            F.min("x").cast("double").alias("_bmin"),
            F.max("x").cast("double").alias("_bmax"),
        )
        .collect()
    )


def _write_cents_sidecar(spark: SparkSession, path: str, stats: list) -> None:
    """The per-bucket centroid sidecar from the collected stats frame:
    the SAME 6dp-snapped ``round(avg)`` doubles the old
    array_sort(collect_list)+coalesce(1) write stored (collected doubles
    round-trip exactly through py4j/createDataFrame), without its extra
    shuffle job — the sidecar is |buckets| rows of driver scalars."""
    by_b: dict[str, list] = {}
    for r in stats:
        by_b.setdefault(r[BUCKET_COL], []).append(
            (int(r["d"]), float(r["c"]))
        )
    data = [
        (b, [c for _, c in sorted(ds)]) for b, ds in sorted(by_b.items())
    ]
    local_frame(spark, 
        data, f"{BUCKET_COL} string, centroid array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/{_CENTROID_DIR}")


def _cents_frame(spark: SparkSession, path: str) -> DataFrame:
    """Centroid sidecar as a LocalRelation: the probe-selection frame
    is |buckets| rows of driver-scale scalars, so reading it through a
    distributed parquet scan paid file listing + a scan task inside
    every probe plan. Driver-side pyarrow read + ``local_frame`` plans
    a pure-JVM LocalTableScan instead (the r12 LocalRelation
    discipline); values identical (lossless decode both paths)."""
    rows = _sidecar_rows(f"{path}/{_CENTROID_DIR}")
    return local_frame(
        spark,
        [(r[0], [float(x) for x in r[1]]) for r in rows],
        f"{BUCKET_COL} string, centroid array<double>",
    )


def _commit_marker(path: str) -> None:
    """Drop the build-complete marker LAST: dynamic partition-overwrite
    sessions skip the root _SUCCESS on partitioned writes, so readers
    checking "is this index fully built" need an explicit end-of-build
    commit (the two-phase-commit discipline of sources/pydatasink.py,
    reduced to one file). Underscore-prefixed: invisible to readers."""
    import os

    with open(os.path.join(path, "_index_success"), "w") as f:
        f.write("ok\n")


def recover_ivf_index(path: str) -> bool:
    """Self-heal after a compaction crashed inside the swap window.

    ``compact_ivf_index`` swaps with two ``os.replace`` calls, so there
    is an instant where no index exists at ``path``: the live data sits
    at ``path + '.old'`` and the fully-committed replacement at
    ``path + '.compacting'``. If ``path`` is missing, restore it —
    preferring the staged copy when its commit marker is present (the
    compaction had finished writing; finishing the swap loses nothing),
    falling back to the pre-compaction ``.old``. Returns True when a
    recovery action was taken. No-op when the index is healthy.

    Concurrency: every reader calls this (via ``index_ready``), so two
    recoverers — or a recoverer and the live compactor — can race the
    same ``os.replace``. The loser's rename raises FileNotFoundError
    AFTER the winner already restored ``path``; that is a recovered
    state, not an error (ADVICE r8)."""
    import os
    import shutil

    if os.path.exists(path):
        return False
    stage = path.rstrip("/") + ".compacting"
    old = path.rstrip("/") + ".old"
    if os.path.exists(os.path.join(stage, "_index_success")):
        try:
            os.replace(stage, path)
        except FileNotFoundError:
            if not os.path.exists(path):
                raise
        shutil.rmtree(old, ignore_errors=True)
        return True
    if os.path.exists(old):
        try:
            os.replace(old, path)
        except FileNotFoundError:
            if not os.path.exists(path):
                raise
        shutil.rmtree(stage, ignore_errors=True)
        return True
    return False


def index_ready(path: str) -> bool:
    """True iff a write_ivf_index / write_ivfpq_index build at ``path``
    ran to completion (marker committed after data + all sidecars).
    Attempts crash recovery first (see ``recover_ivf_index``), so a
    reader arriving after a mid-swap compaction crash self-heals."""
    import os

    recover_ivf_index(path)
    return os.path.exists(os.path.join(path, "_index_success"))


def write_ivfpq_index(
    df: DataFrame,
    path: str,
    part_col: str | None = None,
    n_clusters: int = 8,
    iters: int = 2,
    m: int = 4,
    n_codes: int = 8,
    trained: bool = False,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    memo_key: str | None = None,
) -> None:
    """The full FAISS IVF-PQ layout as Spark partitioned storage: the
    corpus bucketed by the coarse key (``write_ivf_index``'s rule) and
    stored as PQ CODES ONLY — ``m`` byte-codes per vector instead of
    the raw floats (64 float32 dims → 4 codes: a ~64× scan-size cut) —
    with two sidecars: the per-bucket centroids (probe selection) and
    the PQ codebook (ADC table construction). Raw vectors exist only
    at write time; serving reads never touch them.
    """
    from concurrent.futures import ThreadPoolExecutor

    from data_pipeline_ine_spark.operators.similarity import (
        _assign_clusters,
        kmeans_fit,
        pq_codebook,
        pq_encode,
    )

    codebook = pq_codebook(
        df, vec_col=vec_col, id_col=id_col, m=m, n_codes=n_codes,
        trained=trained, iters=iters, memo_key=memo_key,
    )
    if part_col is None:
        centroids = kmeans_fit(
            df, k=n_clusters, iters=iters, vec_col=vec_col, id_col=id_col,
            memo_key=memo_key,
        )
        src = _assign_clusters(df, centroids, vec_col)
        part_col = "cluster"
    else:
        src = df
    bucketed = src.withColumn(
        BUCKET_COL, F.concat(F.lit("b"), F.col(part_col).cast("string"))
    )
    # fan the HOF-heavy encode out: single-row-group parquet inputs
    # otherwise hand the whole argmin fold to ONE task (the repo-wide
    # heavy-per-row rule); hashing on the id keeps layout deterministic.
    # At real scale repartition on BUCKET_COL instead for one file set
    # per bucket.
    n_tasks = df.sparkSession.sparkContext.defaultParallelism
    codes = pq_encode(
        bucketed.repartition(n_tasks, F.col(id_col)),
        codebook, vec_col=vec_col, id_col=id_col,
        keep_cols=(BUCKET_COL,),
    )
    spark = df.sparkSession
    cb_rows = [
        (s, c, list(codebook[s][c]))
        for s in range(len(codebook))
        for c in range(len(codebook[s]))
    ]
    # codes write ∥ centroid stats collect: the two jobs are independent
    # (both derive from the lazy `bucketed` plan), so the build pays the
    # slower, not the sum (guide §2.6). Sidecar writes land AFTER the
    # codes write — mode("overwrite") on ``path`` clears the root first
    # and would race a sidecar landing under it; the 6dp centroid snap
    # is per ADVICE r11.
    with ThreadPoolExecutor(max_workers=1) as pool:
        codes_write = pool.submit(
            lambda: codes.write.partitionBy(BUCKET_COL)
            .mode("overwrite")
            .parquet(path)
        )
        stats = _bucket_dim_stats(bucketed, vec_col)
        codes_write.result()
    with ThreadPoolExecutor(max_workers=1) as pool:
        cb_write = pool.submit(
            lambda: local_frame(spark, 
                cb_rows, "s int, c int, subvec array<bigint>"
            ).coalesce(1).write.mode("overwrite")
            .parquet(f"{path}/{_CODEBOOK_DIR}")
        )
        _write_cents_sidecar(spark, path, stats)
        cb_write.result()
    _commit_marker(path)


def append_to_ivf_index(
    df: DataFrame,
    path: str,
    part_col: str | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> None:
    """Incremental index maintenance: route NEW vectors into the
    EXISTING buckets and append to their partitions — centroids and
    every quantizer sidecar present (PQ codebook, SQ8 affine grid,
    binary midpoints) stay FROZEN, the standard IVF discipline:
    re-training would move bucket boundaries / quantization grids and
    silently orphan or skew every previously stored row. Periodic full
    rebuilds, not per-batch re-trains, are the recovery path when
    drift accumulates (measure routing drift with ``ivf_drift_report``
    and quantization drift with ``sq8_quant_drift_report`` /
    ``binary_quant_drift_report``; rebuild codes-only tiers from the
    source table with ``rebuild_sq8_index`` / ``rebuild_binary_index``).

    ``part_col=None`` assigns each vector to the nearest stored
    centroid (squared L2 over centroid literals — the same narrow
    ``_assign_clusters`` shape, no shuffle); a given ``part_col``
    reuses the incoming column (label-style indexes). If the index has
    a codebook sidecar (IVF-PQ), the appended rows are PQ codes, same
    as the stored ones."""
    bucketed = _bucket_for_append(df, path, part_col, vec_col, id_col)
    bucketed.write.partitionBy(BUCKET_COL).mode("append").parquet(path)


def _bucket_for_append(
    df: DataFrame,
    path: str,
    part_col: str | None,
    vec_col: str,
    id_col: str,
) -> DataFrame:
    """Route rows into the EXISTING index buckets (frozen centroids /
    frozen codebook) — the shared assignment step of the batch append
    and the streaming maintenance sink."""
    from data_pipeline_ine_spark.operators.similarity import (
        _qid,
        _sq_dist_sql,
        pq_encode,
    )

    spark = df.sparkSession
    if part_col is None:
        cents = _sidecar_rows(f"{path}/{_CENTROID_DIR}")
        # Tie-break on the NUMERIC bucket id, exactly like build-time
        # _assign_clusters: the bucket string sorts 'b10' < 'b2', so a
        # distance-tied vector would otherwise route to a different
        # bucket on append than at build once n_clusters > 9. The id
        # sits between d and b in the struct, so array_sort compares
        # (d, numeric id) and b just rides along. One parsed SQL
        # expression — the Column-API construction loop paid ~10 py4j
        # round-trips per centroid dim of pure driver time (the
        # similarity.py construction-cost note) for a bit-identical plan.
        def _bnum(bucket: str) -> int:
            return int(bucket[1:])

        structs = ",".join(
            f"struct({_sq_dist_sql(_qid(vec_col), [float(x) for x in r.centroid])}"
            f" AS d, {_bnum(r[BUCKET_COL])} AS c, '{r[BUCKET_COL]}' AS b)"
            for r in sorted(cents, key=lambda r: _bnum(r[BUCKET_COL]))
        )
        bucketed = df.withColumn(
            BUCKET_COL, F.expr(f"array_sort(array({structs}))[0].b")
        )
    else:
        bucketed = df.withColumn(
            BUCKET_COL, F.concat(F.lit("b"), F.col(part_col).cast("string"))
        )
    # IVF-PQ index: store codes, not vectors (schema must match)
    import os

    if os.path.exists(f"{path}/{_CODEBOOK_DIR}"):
        cb_rows = _sidecar_rows(f"{path}/{_CODEBOOK_DIR}")
        m = 1 + max(r.s for r in cb_rows)
        n_codes = 1 + max(r.c for r in cb_rows)
        codebook = [[None] * n_codes for _ in range(m)]
        for r in cb_rows:
            codebook[r.s][r.c] = [int(x) for x in r.subvec]
        bucketed = pq_encode(
            bucketed, codebook, vec_col=vec_col, id_col=id_col,
            keep_cols=(BUCKET_COL,),
        )
        return bucketed
    # IVF-SQ8 index: store int8 codes under the FROZEN affine params
    # (re-deriving bounds from the append batch would shift the grid and
    # silently corrupt every stored distance — same frozen-quantizer
    # discipline as the PQ codebook above)
    if os.path.exists(f"{path}/{_SQPARAMS_DIR}"):
        mins, spans = _sq8_params(spark, path)
        bucketed = bucketed.withColumn(
            "sq_codes", _sq8_code_expr(F.col(vec_col), mins, spans)
        ).drop(vec_col)
        if part_col is not None and part_col != BUCKET_COL:
            bucketed = bucketed.drop(part_col)
        return bucketed
    # binary index: pack sign-bit words against the FROZEN midpoints
    # (re-deriving (min+max)/2 from the append batch would move every
    # threshold and silently flip stored-vs-appended bits — the same
    # frozen-quantizer discipline as the PQ codebook and SQ8 grid)
    if os.path.exists(f"{path}/{_BQPARAMS_DIR}"):
        from data_pipeline_ine_spark.operators.similarity import (
            _bq_word_cols,
        )

        mids = _bq_mids(spark, path)
        for w, col in enumerate(_bq_word_cols(vec_col, mids)):
            bucketed = bucketed.withColumn(f"bq_w{w}", col)
        bucketed = bucketed.drop(vec_col)
        if part_col is not None and part_col != BUCKET_COL:
            bucketed = bucketed.drop(part_col)
        return bucketed
    if part_col is not None and part_col != BUCKET_COL:
        bucketed = bucketed.drop(part_col)
    return bucketed


def _batch_markers(path: str) -> set[str]:
    """Current committed-batch marker names (empty set when none)."""
    import os

    d = os.path.join(path, _BATCH_COMMITS_DIR)
    return set(os.listdir(d)) if os.path.exists(d) else set()


def _refuse_if_markers_moved(
    path: str, markers_t0: set[str], stage: str, what: str
) -> None:
    """Abort a maintenance rewrite whose snapshot went stale: a batch
    that committed AFTER the rewrite started has rows absent from the
    staged copy — publishing it would lose them unreplayably. Raising
    here (and deleting the stage) makes the maintenance job retry on
    fresh state instead. Narrows, not closes, the race: the final
    check-to-rename gap is microseconds, and maintenance assumes one
    concurrent maintainer regardless."""
    import os
    import shutil

    now = _batch_markers(path)
    pending = __import__("glob").glob(os.path.join(path, ".batches", "*"))
    if now != markers_t0 or pending:
        shutil.rmtree(stage, ignore_errors=True)
        raise RuntimeError(
            f"refusing to finish {what} of {path}: streaming batches "
            f"moved during the rewrite (markers {sorted(markers_t0)} -> "
            f"{sorted(now)}, in-flight={sorted(pending)}) — retry after "
            "the sink drains"
        )


def compact_ivf_index(
    spark: SparkSession,
    path: str,
) -> int:
    """Post-append maintenance: every ``append_to_ivf_index`` batch
    adds one file set per touched bucket, so a long-lived index
    accumulates small files and probe scans pay per-file open costs.
    Rewrite each bucket partition as ONE file (buckets are sized by
    the cluster-count knob — if a single file per bucket is too big,
    the bucket count is wrong, not the file count), preserving
    sidecars and the commit marker, via stage-and-swap. Returns the
    data file count after compaction.

    Crash safety: the swap is TWO os.replace calls, so there is a
    window after ``os.replace(path, old)`` and before
    ``os.replace(stage, path)`` where no index exists at ``path`` —
    the live data is at ``path + '.old'`` and the committed stage at
    ``path + '.compacting'``. ``recover_ivf_index`` (run automatically
    by ``index_ready``) restores ``path`` from either, so readers
    self-heal; a crash never loses data, it only strands it one rename
    away. Local-filesystem swap (os.replace), matching the repo's
    maintenance tier; on an object store the same stage dir would be
    swapped by a manifest pointer instead (single-pointer atomicity,
    no window).
    """
    import glob
    import os
    import shutil

    _refuse_if_pending_batches(path, "compact")
    # snapshot the committed-batch marker set: a maintenance batch that
    # stages, publishes, AND commits during the long rewrite below would
    # have its rows absent from the rewrite while its marker is carried
    # across — an unreplayable loss. The re-checks before the sidecar
    # copy and the swap turn that race into a loud retry (review r9);
    # compaction still assumes a single maintainer at a time.
    markers_t0 = _batch_markers(path)
    stage = path.rstrip("/") + ".compacting"
    shutil.rmtree(stage, ignore_errors=True)
    df = spark.read.parquet(path)
    # one file per bucket: repartition ON the bucket key so every
    # partition holds exactly one bucket's rows
    (
        df.repartition(F.col(BUCKET_COL))
        .write.partitionBy(BUCKET_COL)
        .mode("overwrite")
        .parquet(stage)
    )
    # _batch_commits rides along: the compacted table CONTAINS every
    # committed streaming batch, so its markers must survive — a
    # post-compaction replay (crash before the stream checkpoint
    # committed) would otherwise find no marker and re-append an
    # already-applied batch, duplicating vectors (ADVICE r8).
    _refuse_if_markers_moved(path, markers_t0, stage, "compact")
    for side in (
        _CENTROID_DIR, _CODEBOOK_DIR, _SQPARAMS_DIR, _BQPARAMS_DIR,
        _PREFIXPARAMS_DIR, _BATCH_COMMITS_DIR,
    ):
        src = os.path.join(path, side)
        if os.path.exists(src):
            shutil.copytree(src, os.path.join(stage, side))
    _commit_marker(stage)
    _refuse_if_markers_moved(path, markers_t0, stage, "compact")
    old = path.rstrip("/") + ".old"
    shutil.rmtree(old, ignore_errors=True)
    os.replace(path, old)
    try:
        os.replace(stage, path)
    except FileNotFoundError:
        # a reader's recover_ivf_index raced us inside the swap window
        # and already promoted the committed stage — the swap SUCCEEDED,
        # just not by our hand (ADVICE r8)
        if not os.path.exists(os.path.join(path, "_index_success")):
            raise
    shutil.rmtree(old, ignore_errors=True)
    return len(glob.glob(os.path.join(path, "bucket=*", "*.parquet")))


def rebuild_ivf_index(
    spark: SparkSession,
    path: str,
    n_clusters: int = 8,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    memo_key: str | None = None,
) -> int:
    """The drift-recovery step ``ivf_drift_report`` points at: RETRAIN
    the coarse quantizer on the CURRENT corpus (base + every appended
    cohort) and rewrite the index under the new bucketing — the
    periodic full rebuild that resets accumulated assignment drift,
    versus ``append_to_ivf_index``'s frozen-centroid discipline.
    Raw-vector (plain IVF) indexes only: a codes-only IVF-PQ index
    cannot retrain from its own storage (the raw vectors are gone by
    design) — rebuild those from the source table.

    Same stage-and-swap crash window as ``compact_ivf_index`` (and the
    same ``recover_ivf_index`` self-heal covers it); ``_batch_commits``
    markers are carried across because the rebuilt table CONTAINS every
    committed streaming batch — a post-rebuild replay must still
    short-circuit. Refuses while a staged batch sits under ``.batches``.
    Returns the bucket count after the rebuild.

    Scale shape: one full-corpus k-means fit (the train job any rebuild
    pays) + one bucket-keyed repartition write — the index is rewritten
    ONCE per drift episode, never per batch.
    """
    import os
    import shutil

    _refuse_if_pending_batches(path, "rebuild")
    if os.path.exists(os.path.join(path, _CODEBOOK_DIR)):
        raise ValueError(
            f"{path} is a codes-only IVF-PQ index: raw vectors are not "
            "stored, so the quantizer cannot retrain from the index — "
            "rebuild from the source table with rebuild_ivfpq_index"
        )
    if os.path.exists(os.path.join(path, _SQPARAMS_DIR)):
        raise ValueError(
            f"{path} is a codes-only IVF-SQ8 index: raw vectors are not "
            "stored, so the quantizer cannot retrain from the index — "
            "rebuild from the source table with rebuild_sq8_index"
        )
    if os.path.exists(os.path.join(path, _BQPARAMS_DIR)):
        raise ValueError(
            f"{path} is a codes-only binary index: raw vectors are not "
            "stored, so the midpoints cannot retrain from the index — "
            "rebuild from the source table with rebuild_binary_index"
        )
    markers_t0 = _batch_markers(path)  # see compact_ivf_index
    rows = spark.read.parquet(path).drop(BUCKET_COL)
    stage = path.rstrip("/") + ".compacting"
    shutil.rmtree(stage, ignore_errors=True)
    write_ivf_index(
        rows, stage, part_col=None, n_clusters=n_clusters, iters=iters,
        vec_col=vec_col, id_col=id_col, memo_key=memo_key,
    )
    return _swap_in_rebuilt_stage(path, stage, markers_t0)


def _swap_in_rebuilt_stage(
    path: str, stage: str, markers_t0: set[str]
) -> int:
    """Shared tail of every rebuild: carry the replay markers into the
    committed stage, then swap it live. Marker-lands-LAST: the writer
    committed the stage's own marker, but the _batch_commits sidecar
    isn't copied yet — a crash between the two would leave a marked
    stage with NO replay markers, and recover_ivf_index would promote
    it, making every committed batch replayable as a duplicate (review
    r9). Un-commit, copy, re-commit; same crash-window discipline and
    recover_ivf_index self-heal as compact_ivf_index. Returns the
    bucket count after the swap."""
    import glob
    import os
    import shutil

    os.remove(os.path.join(stage, "_index_success"))
    _refuse_if_markers_moved(path, markers_t0, stage, "rebuild")
    commits = os.path.join(path, _BATCH_COMMITS_DIR)
    if os.path.exists(commits):
        shutil.copytree(commits, os.path.join(stage, _BATCH_COMMITS_DIR))
    _commit_marker(stage)
    _refuse_if_markers_moved(path, markers_t0, stage, "rebuild")
    old = path.rstrip("/") + ".old"
    shutil.rmtree(old, ignore_errors=True)
    os.replace(path, old)
    try:
        os.replace(stage, path)
    except FileNotFoundError:
        if not os.path.exists(os.path.join(path, "_index_success")):
            raise
    shutil.rmtree(old, ignore_errors=True)
    return len(glob.glob(os.path.join(path, "bucket=*")))


def _refuse_if_pending_batches(path: str, what: str) -> None:
    """Shared guard of every maintenance rewrite: an in-flight streaming
    append (staged under .batches, not yet published) would be silently
    dropped — its rows aren't in the read, but its commit marker would
    land later and make the batch unreplayable. Refuse; the maintenance
    job retries after the sink drains."""
    import glob
    import os

    pending = glob.glob(os.path.join(path, ".batches", "*"))
    if pending:
        raise RuntimeError(
            f"refusing to {what} {path}: in-flight staged batches "
            f"{sorted(os.path.basename(p) for p in pending)} under "
            f".batches/ — drain or clean the streaming sink first"
        )


def rebuild_sq8_index(
    spark: SparkSession,
    path: str,
    source: DataFrame,
    part_col: str | None = None,
    n_clusters: int = 8,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    memo_key: str | None = None,
) -> int:
    """Drift recovery for the codes-only SQ8 tier: a stored SQ8 index
    cannot retrain from its own storage (raw vectors are gone by
    design), so the rebuild re-reads the SOURCE table — the current
    corpus, base plus every appended cohort — re-trains BOTH frozen
    artifacts (the coarse quantizer AND the per-dim affine grid; an
    appended cohort that drifted outside the frozen bounds saturates
    until this runs, which is what ``sq8_quant_drift_report``
    measures), and swaps the rewrite live with the same staged,
    marker-carrying discipline as ``rebuild_ivf_index``. The caller
    owns source/index row parity (the source table IS the system of
    record; the index is a serving artifact derived from it). Returns
    the bucket count after the swap."""
    import shutil

    _refuse_if_pending_batches(path, "rebuild")
    markers_t0 = _batch_markers(path)
    stage = path.rstrip("/") + ".compacting"
    shutil.rmtree(stage, ignore_errors=True)
    write_sq8_index(
        source, stage, part_col=part_col, n_clusters=n_clusters,
        iters=iters, vec_col=vec_col, id_col=id_col, memo_key=memo_key,
    )
    return _swap_in_rebuilt_stage(path, stage, markers_t0)


def rebuild_binary_index(
    spark: SparkSession,
    path: str,
    source: DataFrame,
    part_col: str | None = None,
    n_clusters: int = 8,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    memo_key: str | None = None,
) -> int:
    """Drift recovery for the codes-only binary tier — ``rebuild_sq8_
    index``'s twin one rung down: re-train the coarse quantizer and
    the per-dim (min+max)/2 sign thresholds from the SOURCE table (the
    frozen midpoints an appended cohort drifted across are exactly what
    ``binary_quant_drift_report`` measures) and stage-and-swap the
    rewrite. Returns the bucket count after the swap."""
    import shutil

    _refuse_if_pending_batches(path, "rebuild")
    markers_t0 = _batch_markers(path)
    stage = path.rstrip("/") + ".compacting"
    shutil.rmtree(stage, ignore_errors=True)
    write_binary_index(
        source, stage, part_col=part_col, n_clusters=n_clusters,
        iters=iters, vec_col=vec_col, id_col=id_col, memo_key=memo_key,
    )
    return _swap_in_rebuilt_stage(path, stage, markers_t0)


def read_ivf_probe_batch(
    spark: SparkSession,
    path: str,
    queries: Sequence[tuple[int, Sequence[float]]],
    k: int = 10,
    n_probe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Batched serving: top-k cosine neighbors for MANY queries in ONE
    pruned scan — how a real ANN service amortizes index reads. Probe
    choice per query uses exactly ``read_ivf_probe``'s arithmetic
    (rounded centroid cosine, bucket tiebreak), computed over the
    |buckets|×|queries| config-sized frame and collected driver-side;
    the union of probed buckets becomes ONE literal ``isin`` (static
    ``PartitionFilters`` on the scan), and each query meets only its
    own probed buckets through a broadcast EQUI-join on the bucket key
    (the probed list explodes to (query_id, bucket) rows — never a
    nested-loop membership test). Ranking is one query_id-keyed window
    that WindowGroupLimit pre-reduces to per-partition top-k.

    Scale shape: scan cost ~|union probed|/|buckets| of the corpus
    TOTAL for all Q queries (vs Q separate scans); the broadcast side
    is Q·n_probe rows. Returns (query_id, vec_id, cosine_sim, rank).
    """
    from pyspark.sql.window import Window

    ids = [int(qid) for qid, _ in queries]
    if len(ids) != len(set(ids)):
        # two entries sharing an id would merge into ONE rank partition
        # and silently interleave their results
        raise ValueError(f"duplicate query ids in batch: {sorted(ids)}")
    qdf = local_frame(spark, 
        [(int(qid), [float(x) for x in v]) for qid, v in queries],
        "query_id int, qvec array<double>",
    )
    cents = _cents_frame(spark, path)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("sim"), *_bucket_order_cols()
    )
    probe_rows = (
        cents.crossJoin(F.broadcast(qdf))  # |buckets| x Q — config-sized
        .select(
            "query_id",
            BUCKET_COL,
            F.round(cosine("`centroid`", "`qvec`"), 6).alias(
                "sim"
            ),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= n_probe)
        .select("query_id", BUCKET_COL)
        .collect()  # O(Q * n_probe) scalars — the probe plan, not data
    )
    probes: dict[int, list[str]] = {}
    for r in probe_rows:
        probes.setdefault(r["query_id"], []).append(r[BUCKET_COL])
    union_buckets = sorted({b for bs in probes.values() for b in bs})

    idx = spark.read.parquet(path).filter(
        F.col(BUCKET_COL).isin(union_buckets)
    )
    qprobe = local_frame(spark, 
        [
            (int(qid), [float(x) for x in v], b)
            for qid, v in queries
            for b in probes[int(qid)]
        ],
        f"query_id int, qvec array<double>, {BUCKET_COL} string",
    )
    sim = F.round(cosine(_qid(vec_col), "`qvec`"), 6)
    rk = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc(id_col)
    )
    return (
        idx.join(F.broadcast(qprobe), BUCKET_COL)
        .select("query_id", id_col, sim.alias("cosine_sim"))
        .withColumn("rank", F.row_number().over(rk).cast("bigint"))
        .filter(F.col("rank") <= k)
    )


def ivf_drift_report(
    spark: SparkSession,
    path: str,
    new_pred,
    thresh_num: int = 3,
    thresh_den: int = 2,
    vec_col: str = "embedding",
) -> DataFrame:
    """Index-freshness surface for the frozen-centroid append lifecycle:
    per bucket, how far the APPENDED cohort sits from its assigned
    frozen centroid versus the build-time cohort — the number that
    tells an operator the coarse quantizer has gone stale and the
    periodic full rebuild is due (``append_to_ivf_index`` freezes
    centroids by design; drift accumulates silently otherwise).

    ``new_pred`` is a boolean Column classifying appended rows (e.g.
    ``F.col("vec_id") >= cutover`` — at scale, an ingest-date column).
    Output one row per bucket: ``(bucket, n_base, n_new, mean_e6_base,
    mean_e6_new, retrain)`` where the means are e6-snapped mean squared
    distances to the frozen centroid (rounded to 6dp inside the plan —
    drift tolerances need no more) and ``retrain = 1`` iff the new
    cohort's mean exceeds ``thresh_num/thresh_den`` times the base
    cohort's (integer cross-multiply — no float division to disagree
    across engines). Plain-IVF indexes only (raw vectors stored);
    an IVF-PQ index would compare decoded codes instead.

    Engine-exact: squared distances are the sequential fold, snapped
    with FLOOR(d*1e6 + 0.5) and accumulated in DECIMAL(38,0) —
    partition-order invariant. Scale shape: the centroid sidecar is a
    plan literal (O(buckets*dim)); the report is ONE narrow map over
    the index plus ONE bucket-keyed map-side-combinable aggregate.
    """
    from data_pipeline_ine_spark.operators.similarity import (
        _dlit,
        sq_dist,
    )

    cents = _sidecar_rows(f"{path}/{_CENTROID_DIR}")
    # centroid lookup as ONE parsed SQL expression (r13): the per-value
    # F.round(F.lit(x), 6) loop was |buckets|*dim py4j round-trips of
    # driver time; round(<literal>, 6) in SQL text folds to the same
    # rounded double literal
    cent_sql = "array(" + ",".join(
        "struct('{}' AS b, array({}) AS v)".format(
            str(r[BUCKET_COL]).replace("'", "''"),
            ",".join(f"round({_dlit(float(x))}, 6)" for x in r.centroid),
        )
        for r in sorted(cents, key=lambda r: int(r[BUCKET_COL][1:]))
    ) + ")"
    df = spark.read.parquet(path)
    cvec_sql = (
        f"element_at(filter({cent_sql}, s -> s.b = {_qid(BUCKET_COL)}), 1).v"
    )
    snapped = F.floor(
        sq_dist(_qid(vec_col), cvec_sql) * 1e6 + F.lit(0.5)
    ).cast("decimal(38,0)")
    prof = (
        df.select(BUCKET_COL, new_pred.alias("_new"), snapped.alias("_d6"))
        .groupBy(BUCKET_COL)
        .agg(
            F.sum(F.when(~F.col("_new"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_base"),
            F.sum(F.when(F.col("_new"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_new"),
            F.sum(F.when(~F.col("_new"), F.col("_d6")))
            .cast("bigint")
            .alias("_ib"),
            F.sum(F.when(F.col("_new"), F.col("_d6")))
            .cast("bigint")
            .alias("_in"),
        )
    )
    # a bucket with NO base cohort (every member appended) has no drift
    # baseline at all — the most-drifted state possible, so it flags
    # unconditionally; the NULL _ib would otherwise make the comparison
    # NULL → never retrain (ADVICE r8)
    retrain = F.when(
        (F.col("n_new") > 0)
        & (
            (F.col("n_base") == 0)
            | (
                F.col("_in") * F.lit(thresh_den) * F.col("n_base")
                > F.col("_ib") * F.lit(thresh_num) * F.col("n_new")
            )
        ),
        1,
    ).otherwise(0)
    return prof.select(
        F.col(BUCKET_COL),
        "n_base",
        "n_new",
        F.expr("_ib div n_base").cast("bigint").alias("mean_e6_base"),
        F.expr("_in div n_new").cast("bigint").alias("mean_e6_new"),
        retrain.cast("int").alias("retrain"),
    ).orderBy(BUCKET_COL)


def read_ivfpq_probe(
    spark: SparkSession,
    path: str,
    query_vec: Sequence[float],
    k: int = 10,
    n_probe: int = 2,
    id_col: str = "vec_id",
    where: F.Column | None = None,
) -> DataFrame:
    """ADC top-k from an IVF-PQ index: probe buckets chosen from the
    centroid sidecar exactly like ``read_ivf_probe`` (static partition
    pruning on the scan), then the query's integer distance LUT
    (rebuilt from the codebook sidecar — O(m·n_codes·sub) driver work)
    ranks the PROBED buckets' codes with ``m`` lookups + adds per
    candidate. The serving scan reads only codes of only the probed
    buckets. ``where`` enables filtered ANN over payload columns,
    pushed into the codes scan beside the pruning — completing the
    filtered-serving symmetry across all quantized rungs."""
    from data_pipeline_ine_spark.operators.similarity import (
        cosine,
        pq_topk,
    )

    cents = _cents_frame(spark, path)
    q = _darr_sql([float(x) for x in query_vec])
    probe_ids = [
        r[0]
        for r in cents.select(
            BUCKET_COL,
            F.round(cosine("`centroid`", q), 6).alias("sim"),
        )
        .orderBy(F.desc("sim"), *_bucket_order_cols())
        .limit(n_probe)
        .select(BUCKET_COL)
        .collect()
    ]
    cb_rows = _sidecar_rows(f"{path}/{_CODEBOOK_DIR}")
    m = 1 + max(r.s for r in cb_rows)
    n_codes = 1 + max(r.c for r in cb_rows)
    codebook: list[list[list[int]]] = [
        [None] * n_codes for _ in range(m)
    ]
    for r in cb_rows:
        codebook[r.s][r.c] = [int(x) for x in r.subvec]
    probed = spark.read.parquet(path).filter(
        F.col(BUCKET_COL).isin(probe_ids)
    )
    if where is not None:
        probed = probed.filter(where)
    return pq_topk(probed, codebook, query_vec, k=k, id_col=id_col)


def read_ivfpq_probe_batch(
    spark: SparkSession,
    path: str,
    queries: Sequence[tuple[int, Sequence[float]]],
    k: int = 10,
    n_probe: int = 2,
    id_col: str = "vec_id",
    codes_col: str = "pq_codes",
) -> DataFrame:
    """Batched ADC serving from the codes-only IVF-PQ index: Q queries
    share ONE partition-pruned codes scan (union of probed buckets),
    and each query's integer distance LUT travels IN the broadcast
    (query_id, bucket, lut) frame — so the per-candidate work stays
    ``m`` lookups + adds against the joined row's own LUT, exact
    BIGINT throughout. Probe choice and per-query results are
    identical to ``read_ivfpq_probe`` (parity-tested); the batch
    amortizes the scan exactly like ``read_ivf_probe_batch``.

    Returns (query_id, vec_id, pq_dist, rank)."""
    import math

    from pyspark.sql.window import Window

    from data_pipeline_ine_spark.operators.similarity import (
        PQ_SCALE,
        cosine,
    )

    ids = [int(qid) for qid, _ in queries]
    if len(ids) != len(set(ids)):
        raise ValueError(f"duplicate query ids in batch: {sorted(ids)}")
    qdf = local_frame(spark, 
        [(int(qid), [float(x) for x in v]) for qid, v in queries],
        "query_id int, qvec array<double>",
    )
    cents = _cents_frame(spark, path)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("sim"), *_bucket_order_cols()
    )
    probe_rows = (
        cents.crossJoin(F.broadcast(qdf))
        .select(
            "query_id",
            BUCKET_COL,
            F.round(cosine("`centroid`", "`qvec`"), 6).alias(
                "sim"
            ),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= n_probe)
        .select("query_id", BUCKET_COL)
        .collect()
    )
    probes: dict[int, list[str]] = {}
    for r in probe_rows:
        probes.setdefault(r["query_id"], []).append(r[BUCKET_COL])
    union_buckets = sorted({b for bs in probes.values() for b in bs})

    cb_rows = _sidecar_rows(f"{path}/{_CODEBOOK_DIR}")
    m = 1 + max(r.s for r in cb_rows)
    n_codes = 1 + max(r.c for r in cb_rows)
    codebook: list[list[list[int]]] = [[None] * n_codes for _ in range(m)]
    for r in cb_rows:
        codebook[r.s][r.c] = [int(x) for x in r.subvec]
    sub = len(cb_rows[0].subvec)

    def lut_for(vec: Sequence[float]) -> list[list[int]]:
        q = [int(math.floor(float(x) * PQ_SCALE + 0.5)) for x in vec]
        return [
            [
                sum((q[s * sub + d] - code[d]) ** 2 for d in range(sub))
                for code in codebook[s]
            ]
            for s in range(m)
        ]

    qprobe = local_frame(spark, 
        [
            (int(qid), b, lut_for(v))
            for qid, v in queries
            for b in probes[int(qid)]
        ],
        f"query_id int, {BUCKET_COL} string, lut array<array<bigint>>",
    )
    idx = spark.read.parquet(path).filter(
        F.col(BUCKET_COL).isin(union_buckets)
    )
    dist = F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)),
        F.lit(0).cast("bigint"),
        lambda acc, s: acc
        + F.element_at(
            F.element_at(F.col("lut"), s.cast("int") + 1),
            F.element_at(F.col(codes_col), s.cast("int") + 1) + 1,
        ),
    )
    rk = Window.partitionBy("query_id").orderBy(
        F.asc("pq_dist"), F.asc(id_col)
    )
    return (
        idx.join(F.broadcast(qprobe), BUCKET_COL)
        .select("query_id", id_col, dist.alias("pq_dist"))
        .withColumn("rank", F.row_number().over(rk).cast("bigint"))
        .filter(F.col("rank") <= k)
    )


def read_ivfpq_rerank(
    spark: SparkSession,
    pq_path: str,
    vectors: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    shortlist: int = 50,
    n_probe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Two-stage retrieval — the standard production serving shape:
    stage 1 shortlists ``shortlist`` candidates from the codes-only
    IVF-PQ index (pruned scan + integer ADC — cheap, quantization-
    lossy), stage 2 re-ranks ONLY the shortlist with exact cosine
    against the raw vectors. Recall approaches the exact probe's at a
    fraction of its raw-vector scan cost: the full-precision read
    touches ``shortlist`` rows, never a bucket.

    The shortlist ids are collected driver-side (O(shortlist) scalars)
    and applied as a literal ``isin`` on the raw table — when
    ``vectors`` is itself stored sorted/bucketed by ``id_col``, that
    filter is a pushed-down point-lookup set, the KV-fetch of a real
    serving tier. Returns (id, cosine_sim) — exact top-k of the
    shortlist, same surface as ``read_ivf_probe``."""
    from data_pipeline_ine_spark.operators.similarity import (
        brute_force_topk,
    )

    short = read_ivfpq_probe(
        spark, pq_path, query_vec, k=shortlist, n_probe=n_probe,
        id_col=id_col,
    )
    ids = [r[0] for r in short.select(id_col).collect()]
    cand = vectors.filter(F.col(id_col).isin(ids))
    return brute_force_topk(cand, query_vec, k, vec_col, id_col)


def _shortlist_pairs(
    spark: SparkSession, vectors: DataFrame, id_col: str, rows
) -> DataFrame:
    """The (query_id, id) membership frame a batch rerank broadcasts —
    the id field typed FROM THE RAW-VECTORS SCHEMA so a non-bigint id
    column (int, string, ...) round-trips the collect and joins without
    a lossy coercion (the hardcoded ``bigint`` + ``int(...)`` it
    replaces failed on any non-integral id; ADVICE r9)."""
    from pyspark.sql.types import IntegerType, StructField, StructType

    id_field = vectors.schema[id_col]
    schema = StructType(
        [
            StructField("query_id", IntegerType(), False),
            StructField(id_col, id_field.dataType, True),
        ]
    )
    return local_frame(spark, [(int(r[0]), r[1]) for r in rows], schema)


def read_ivfpq_rerank_batch(
    spark: SparkSession,
    pq_path: str,
    vectors: DataFrame,
    queries: Sequence[tuple[int, Sequence[float]]],
    k: int = 10,
    shortlist: int = 50,
    n_probe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Batched two-stage retrieval: Q queries shortlist through ONE
    pruned codes scan (``read_ivfpq_probe_batch`` — union-of-probes
    partition filter, per-query integer LUTs on the broadcast), then
    ALL shortlists re-rank exact from ONE pushed-down id-set lookup on
    the raw vectors (the union of shortlist ids as a literal ``isin``),
    with a broadcast (query_id, id) membership join scoping each raw
    vector to the queries that shortlisted it. Per-query results are
    identical to Q separate ``read_ivfpq_rerank`` calls; the batch pays
    ONE codes scan + ONE raw point-lookup set instead of 2Q scans —
    the same one-scan discipline as ``read_ivf_probe_batch``.

    Driver traffic is O(Q·shortlist) id scalars — the shortlist plan,
    never data. Returns (query_id, id, cosine_sim, rank)."""
    from pyspark.sql.window import Window

    short = read_ivfpq_probe_batch(
        spark, pq_path, queries, k=shortlist, n_probe=n_probe,
        id_col=id_col,
    )
    rows = short.select("query_id", id_col).collect()
    union_ids = sorted({r[1] for r in rows})
    pairs = _shortlist_pairs(spark, vectors, id_col, rows)
    qdf = local_frame(spark, 
        [(int(qid), [float(x) for x in v]) for qid, v in queries],
        "query_id int, qvec array<double>",
    )
    cand = vectors.select(id_col, vec_col).filter(
        F.col(id_col).isin(union_ids)
    )
    sim = F.round(cosine(_qid(vec_col), "`qvec`"), 6)
    rk = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc(id_col)
    )
    return (
        cand.join(F.broadcast(pairs), id_col)
        .join(F.broadcast(qdf), "query_id")
        .select("query_id", id_col, sim.alias("cosine_sim"))
        .withColumn("rank", F.row_number().over(rk).cast("bigint"))
        .filter(F.col("rank") <= k)
    )


def read_ivf_probe(
    spark: SparkSession,
    path: str,
    query_vec: Sequence[float],
    k: int = 10,
    n_probe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    where: F.Column | None = None,
) -> DataFrame:
    """Top-k cosine neighbors of ``query_vec`` from the index at
    ``path``, scanning ONLY the ``n_probe`` buckets whose centroids are
    nearest the query. The probe list is collected driver-side
    (O(n_probe) scalars) and applied as a literal ``isin`` — a static
    partition-pruning filter on the parquet scan.

    ``where`` (optional) is FILTERED ANN — a predicate over the index's
    payload columns (e.g. ``F.col("label") == 3``) applied AT THE SCAN,
    so Catalyst pushes it into the parquet read (``PushedFilters``)
    alongside the partition pruning and only matching rows are ever
    ranked. The post-filter semantics of production vector stores
    (recall caveat applies: a highly selective predicate can empty a
    probed bucket — raise ``n_probe`` for constrained queries).
    Staged for a round-10 contract row."""
    from data_pipeline_ine_spark.operators.similarity import (
        brute_force_topk,
        cosine,
    )

    cents = _cents_frame(spark, path)
    q = _darr_sql([float(x) for x in query_vec])
    probe_ids = [
        r[0]
        for r in cents.select(
            BUCKET_COL,
            F.round(cosine("`centroid`", q), 6).alias("sim"),
        )
        .orderBy(F.desc("sim"), *_bucket_order_cols())
        .limit(n_probe)
        .select(BUCKET_COL)
        .collect()  # O(n_probe) scalars — probe list, not data
    ]
    probed = spark.read.parquet(path).filter(
        F.col(BUCKET_COL).isin(probe_ids)
    )
    if where is not None:
        probed = probed.filter(where)
    return brute_force_topk(probed, query_vec, k, vec_col, id_col)


def _sq8_code_expr(
    vec: F.Column, mins: list[float], spans: list[float]
) -> F.Column:
    """Per-dim affine int8 quantization as one JVM-side transform:
    ``code_d = clamp(floor((x_d - min_d) * 255.0 / span_d + 0.5), 0, 255)``
    with ``span_d = max_d - min_d`` (0-span dims quantize to 0). The
    expression uses only IEEE subtract/multiply/divide/add/floor on
    exact inputs, so the codes are bit-identical across engines — the
    DuckDB oracle re-derives them from the same MIN/MAX (themselves
    order-invariant, unlike sums).

    The clamp runs on floor()'s LONG result and the narrowing int cast
    comes LAST: a frozen-grid append of a vector far outside the
    training bounds (scaled value >= 2^31) must SATURATE to 0/255 like
    the driver-side twin ``_sq8_code_py`` does — clamping after an
    eager non-ANSI long->int cast would wrap bits first and could land
    a pathological outlier back inside [0, 255] as a silently wrong
    code."""
    # one py4j call per literal array (not one per element): F.lit on a
    # Python list builds the identical array<double> Literal in a single
    # round-trip — the similarity.py construction-cost fix
    mlit = F.lit([float(m) for m in mins])
    slit = F.lit([float(s) for s in spans])
    return F.transform(
        F.sequence(F.lit(1), F.size(vec)),
        lambda i: F.least(
            F.lit(255).cast("bigint"),
            F.greatest(
                F.lit(0).cast("bigint"),
                F.when(
                    F.element_at(slit, i) == 0.0, F.lit(0).cast("bigint")
                ).otherwise(
                    F.floor(
                        (
                            F.element_at(vec, i).cast("double")
                            - F.element_at(mlit, i)
                        )
                        * F.lit(255.0)
                        / F.element_at(slit, i)
                        + F.lit(0.5)
                    )
                ),
            ),
        ).cast("int"),
    )


def _sq8_params(spark: SparkSession, path: str) -> tuple[list[float], list[float]]:
    """(mins, spans) from the ``_sqparams`` sidecar — O(dim) scalars."""
    rows = _sidecar_rows(f"{path}/{_SQPARAMS_DIR}")
    by_d = {int(r.d): (float(r.vmin), float(r.vmax)) for r in rows}
    mins = [by_d[d][0] for d in sorted(by_d)]
    spans = [by_d[d][1] - by_d[d][0] for d in sorted(by_d)]
    return mins, spans


def _sq8_code_py(x: float, mn: float, sp: float) -> int:
    """Driver-side twin of ``_sq8_code_expr`` for query vectors —
    Python floats ARE IEEE doubles, and the op chain is identical, so
    query codes land on exactly the stored grid. ONE implementation:
    the probe readers all call this; a drift between the stored-code
    expression and the query quantizer would silently skew every
    distance."""
    import math

    if sp == 0.0:
        return 0
    c = int(math.floor((x - mn) * 255.0 / sp + 0.5))
    return max(0, min(255, c))


def write_sq8_index(
    df: DataFrame,
    path: str,
    part_col: str | None = None,
    n_clusters: int = 8,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    memo_key: str | None = None,
) -> None:
    """The FAISS IVF-SQ8 layout as Spark partitioned storage: the corpus
    bucketed by the coarse key (``write_ivf_index``'s rule) and stored as
    per-dim affine int8 codes — 64 float32 dims → 64 bytes, a 4× scan cut
    with far less quantization loss than PQ — plus two sidecars: the
    per-bucket centroids (probe selection) and the per-dim (min, max)
    affine params (query quantization + optional decode). The third
    member of the standard quantization ladder (flat / SQ8 / PQ); raw
    vectors exist only at write time.

    Scale shape: ONE posexplode aggregate serves both sidecars — the
    per-(bucket, dim) pass carries min/max/avg, centroids come from the
    avg and the global affine bounds fold min-of-mins / max-of-maxes on
    the tiny bucket-grain frame (exactly the corpus MIN/MAX) — then one
    narrow encode map and one bucket-partitioned write. Params are
    O(dim) scalars.
    """
    from concurrent.futures import ThreadPoolExecutor

    from data_pipeline_ine_spark.operators.similarity import (
        _assign_clusters,
        kmeans_fit,
    )

    if part_col is None:
        centroids = kmeans_fit(
            df, k=n_clusters, iters=iters, vec_col=vec_col, id_col=id_col,
            memo_key=memo_key,
        )
        src = _assign_clusters(df, centroids, vec_col)
        part_col = "cluster"
    else:
        src = df
    bucketed = src.withColumn(
        BUCKET_COL, F.concat(F.lit("b"), F.col(part_col).cast("string"))
    )
    if part_col != BUCKET_COL:
        bucketed = bucketed.drop(part_col)

    # ONE corpus posexplode pass collected to the driver: per-(bucket,
    # dim) min/max/6dp-avg scalars. The centroid sidecar reads the avg;
    # the global affine bounds fold min-of-mins / max-of-maxes in Python
    # — exactly the corpus MIN/MAX (order-invariant, so engine-exact by
    # nature). One job instead of the localCheckpoint + bounds-collect +
    # cents-shuffle chain.
    stats = _bucket_dim_stats(bucketed, vec_col)
    by_d: dict[int, tuple[float, float]] = {}
    for r in stats:
        d = int(r["d"]) + 1
        lo, hi = float(r["_bmin"]), float(r["_bmax"])
        if d in by_d:
            by_d[d] = (min(by_d[d][0], lo), max(by_d[d][1], hi))
        else:
            by_d[d] = (lo, hi)
    mins = [by_d[d][0] for d in sorted(by_d)]
    spans = [by_d[d][1] - by_d[d][0] for d in sorted(by_d)]

    codes = bucketed.withColumn(
        "sq_codes", _sq8_code_expr(F.col(vec_col), mins, spans)
    ).drop(vec_col)
    spark = df.sparkSession
    # codes write first — mode("overwrite") on ``path`` clears the root
    # and would race sidecars landing under it — then the two tiny
    # sidecar writes overlap each other (disjoint subdirs, guide §2.6)
    codes.write.partitionBy(BUCKET_COL).mode("overwrite").parquet(path)
    with ThreadPoolExecutor(max_workers=1) as pool:
        params_write = pool.submit(
            lambda: local_frame(spark, 
                [(d, by_d[d][0], by_d[d][1]) for d in sorted(by_d)],
                "d int, vmin double, vmax double",
            ).coalesce(1).write.mode("overwrite")
            .parquet(f"{path}/{_SQPARAMS_DIR}")
        )
        _write_cents_sidecar(spark, path, stats)
        params_write.result()
    _commit_marker(path)


def read_sq8_probe(
    spark: SparkSession,
    path: str,
    query_vec: Sequence[float],
    k: int = 10,
    n_probe: int = 2,
    id_col: str = "vec_id",
    codes_col: str = "sq_codes",
    where: F.Column | None = None,
) -> DataFrame:
    """Top-k by exact integer squared distance IN CODE SPACE from an
    IVF-SQ8 index: probe buckets chosen from the centroid sidecar
    exactly like ``read_ivf_probe`` (static partition pruning on the
    scan), the query quantized driver-side with the sidecar's affine
    params (same IEEE arithmetic as the stored codes, so both sides of
    the distance live on the same grid), then
    ``Σ_d (q_code_d - code_d)²`` ranked as an exact BIGINT — fully
    reproducible, no float survives to the ranking. ``where`` enables
    FILTERED ANN over payload columns, pushed into the codes scan
    (see ``read_ivf_probe``). Returns (id, sq8_dist, near-to-far)."""
    cents = _cents_frame(spark, path)
    q = _darr_sql([float(x) for x in query_vec])
    probe_ids = [
        r[0]
        for r in cents.select(
            BUCKET_COL,
            F.round(cosine("`centroid`", q), 6).alias("sim"),
        )
        .orderBy(F.desc("sim"), *_bucket_order_cols())
        .limit(n_probe)
        .select(BUCKET_COL)
        .collect()
    ]
    mins, spans = _sq8_params(spark, path)
    qcodes = [
        _sq8_code_py(float(x), mins[d], spans[d])
        for d, x in enumerate(query_vec)
    ]
    qlit = F.lit([int(c) for c in qcodes]).cast("array<int>")
    dist = F.aggregate(
        F.zip_with(
            F.col(codes_col),
            qlit,
            lambda a, b: ((a - b) * (a - b)).cast("bigint"),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    probed = spark.read.parquet(path).filter(
        F.col(BUCKET_COL).isin(probe_ids)
    )
    if where is not None:
        probed = probed.filter(where)
    return (
        probed.select(id_col, dist.alias("sq8_dist"))
        .orderBy(F.asc("sq8_dist"), F.asc(id_col))
        .limit(k)
    )


def read_sq8_rerank(
    spark: SparkSession,
    sq8_path: str,
    vectors: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    shortlist: int = 50,
    n_probe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Two-stage retrieval over the SQ8 index — the production serving
    shape at the middle quantization tier: stage 1 shortlists from the
    codes-only SQ8 index (pruned scan + exact integer code-space
    distance — cheap, mildly lossy), stage 2 re-ranks ONLY the
    shortlist with exact cosine against the raw vectors (a pushed-down
    id point-lookup set, never a bucket read). Same surface as
    ``read_ivfpq_rerank``; staged for a round-10 contract row."""
    from data_pipeline_ine_spark.operators.similarity import (
        brute_force_topk,
    )

    short = read_sq8_probe(
        spark, sq8_path, query_vec, k=shortlist, n_probe=n_probe,
        id_col=id_col,
    )
    ids = [r[0] for r in short.select(id_col).collect()]
    cand = vectors.filter(F.col(id_col).isin(ids))
    return brute_force_topk(cand, query_vec, k, vec_col, id_col)


def read_sq8_rerank_batch(
    spark: SparkSession,
    sq8_path: str,
    vectors: DataFrame,
    queries: Sequence[tuple[int, Sequence[float]]],
    k: int = 10,
    shortlist: int = 50,
    n_probe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Batched two-stage SQ8 retrieval: Q queries shortlist through ONE
    pruned codes scan (``read_sq8_probe_batch``), then ALL shortlists
    re-rank exact from ONE pushed-down id-set lookup (union of
    shortlist ids as a literal ``isin``), each raw vector scoped to the
    queries that shortlisted it by a broadcast (query_id, id)
    membership join — ``read_ivfpq_rerank_batch``'s one-scan
    discipline at the SQ8 tier. Driver traffic is O(Q·shortlist) id
    scalars. Returns (query_id, id, cosine_sim, rank)."""
    from pyspark.sql.window import Window

    short = read_sq8_probe_batch(
        spark, sq8_path, queries, k=shortlist, n_probe=n_probe,
        id_col=id_col,
    )
    rows = short.select("query_id", id_col).collect()
    union_ids = sorted({r[1] for r in rows})
    pairs = _shortlist_pairs(spark, vectors, id_col, rows)
    qdf = local_frame(spark, 
        [(int(qid), [float(x) for x in v]) for qid, v in queries],
        "query_id int, qvec array<double>",
    )
    cand = vectors.select(id_col, vec_col).filter(
        F.col(id_col).isin(union_ids)
    )
    sim = F.round(cosine(_qid(vec_col), "`qvec`"), 6)
    rk = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc(id_col)
    )
    return (
        cand.join(F.broadcast(pairs), id_col)
        .join(F.broadcast(qdf), "query_id")
        .select("query_id", id_col, sim.alias("cosine_sim"))
        .withColumn("rank", F.row_number().over(rk).cast("bigint"))
        .filter(F.col("rank") <= k)
    )


def read_sq8_probe_batch(
    spark: SparkSession,
    path: str,
    queries: Sequence[tuple[int, Sequence[float]]],
    k: int = 10,
    n_probe: int = 2,
    id_col: str = "vec_id",
    codes_col: str = "sq_codes",
) -> DataFrame:
    """Batched SQ8 serving: Q queries share ONE partition-pruned codes
    scan (union of probed buckets as a single literal ``isin``), each
    query's int8 code vector travels IN the broadcast (query_id,
    bucket, qcodes) frame, and per-candidate work is one integer
    zip-fold against the joined row's own codes — exact BIGINT
    throughout, per-query results identical to ``read_sq8_probe``
    (parity-tested). Completes the batch-amortized serving story
    across the quantization ladder (flat ``read_ivf_probe_batch`` /
    PQ ``read_ivfpq_probe_batch`` / SQ8 here).

    Returns (query_id, vec_id, sq8_dist, rank)."""
    from pyspark.sql.window import Window

    ids = [int(qid) for qid, _ in queries]
    if len(ids) != len(set(ids)):
        raise ValueError(f"duplicate query ids in batch: {sorted(ids)}")
    qdf = local_frame(spark, 
        [(int(qid), [float(x) for x in v]) for qid, v in queries],
        "query_id int, qvec array<double>",
    )
    cents = _cents_frame(spark, path)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("sim"), *_bucket_order_cols()
    )
    probe_rows = (
        cents.crossJoin(F.broadcast(qdf))
        .select(
            "query_id",
            BUCKET_COL,
            F.round(cosine("`centroid`", "`qvec`"), 6).alias(
                "sim"
            ),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= n_probe)
        .select("query_id", BUCKET_COL)
        .collect()
    )
    probes: dict[int, list[str]] = {}
    for r in probe_rows:
        probes.setdefault(r["query_id"], []).append(r[BUCKET_COL])
    union_buckets = sorted({b for bs in probes.values() for b in bs})

    mins, spans = _sq8_params(spark, path)
    qprobe = local_frame(spark, 
        [
            (
                int(qid),
                b,
                [
                    _sq8_code_py(float(x), mins[d], spans[d])
                    for d, x in enumerate(v)
                ],
            )
            for qid, v in queries
            for b in probes[int(qid)]
        ],
        f"query_id int, {BUCKET_COL} string, qcodes array<int>",
    )
    idx = spark.read.parquet(path).filter(
        F.col(BUCKET_COL).isin(union_buckets)
    )
    dist = F.aggregate(
        F.zip_with(
            F.col(codes_col),
            F.col("qcodes"),
            lambda a, b: ((a - b) * (a - b)).cast("bigint"),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    rk = Window.partitionBy("query_id").orderBy(
        F.asc("sq8_dist"), F.asc(id_col)
    )
    return (
        idx.join(F.broadcast(qprobe), BUCKET_COL)
        .select("query_id", id_col, dist.alias("sq8_dist"))
        .withColumn("rank", F.row_number().over(rk).cast("bigint"))
        .filter(F.col("rank") <= k)
    )


# --- 1-bit binary index: the ladder's bottom rung as stored codes ----------

_BQPARAMS_DIR = "_bqparams"  # per-dim sign-threshold midpoints sidecar


def write_binary_index(
    df: DataFrame,
    path: str,
    part_col: str | None = None,
    n_clusters: int = 8,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    memo_key: str | None = None,
) -> None:
    """The binary-quantization serving layout as Spark partitioned
    storage — the stored-codes twin of the in-plan
    ``operators/similarity.py::binary_topk_rerank`` and the bottom rung
    of the index ladder (flat 256 B / SQ8 64 B / binary 8 B / PQ 4 B
    per 64-dim vector): the corpus bucketed by the coarse key
    (``write_ivf_index``'s rule) and stored as sign bits against the
    per-dim (min+max)/2 midpoint, packed into 32-bit words inside
    BIGINT columns ``bq_w{i}`` — plus the centroid sidecar (probe
    selection) and the midpoint sidecar (query packing). Raw vectors
    exist only at write time.

    Scale shape: ONE posexplode pass serves centroids AND midpoints
    (``write_sq8_index``'s trick — per-(bucket, dim) min/max/avg,
    global MIN/MAX folded on the bucket-grain frame, order-invariant
    so engine-exact), one narrow pack map, one bucket-partitioned
    write. Params are O(dim) scalars.
    """
    from concurrent.futures import ThreadPoolExecutor

    from data_pipeline_ine_spark.operators.similarity import (
        _assign_clusters,
        _bq_word_cols,
        kmeans_fit,
    )

    if part_col is None:
        centroids = kmeans_fit(
            df, k=n_clusters, iters=iters, vec_col=vec_col, id_col=id_col,
            memo_key=memo_key,
        )
        src = _assign_clusters(df, centroids, vec_col)
        part_col = "cluster"
    else:
        src = df
    bucketed = src.withColumn(
        BUCKET_COL, F.concat(F.lit("b"), F.col(part_col).cast("string"))
    )
    if part_col != BUCKET_COL:
        bucketed = bucketed.drop(part_col)

    # ONE collected posexplode pass feeds midpoints AND centroids (the
    # write_sq8_index shape: min/max fold to the exact corpus bounds in
    # Python — order-invariant — and the 6dp avg is the centroid)
    stats = _bucket_dim_stats(bucketed, vec_col)
    agg_d: dict[int, tuple[float, float]] = {}
    for r in stats:
        d = int(r["d"])
        lo, hi = float(r["_bmin"]), float(r["_bmax"])
        if d in agg_d:
            agg_d[d] = (min(agg_d[d][0], lo), max(agg_d[d][1], hi))
        else:
            agg_d[d] = (lo, hi)
    by_d = {d: (agg_d[d][0] + agg_d[d][1]) / 2.0 for d in agg_d}
    mids = [by_d[d] for d in sorted(by_d)]

    codes = bucketed
    for w, col in enumerate(_bq_word_cols(vec_col, mids)):
        codes = codes.withColumn(f"bq_w{w}", col)
    spark = df.sparkSession
    # codes write first — mode("overwrite") on ``path`` clears the root
    # and would race sidecars landing under it — then the two tiny
    # sidecar writes overlap each other (disjoint subdirs, guide §2.6)
    codes.drop(vec_col).write.partitionBy(BUCKET_COL).mode(
        "overwrite"
    ).parquet(path)
    with ThreadPoolExecutor(max_workers=1) as pool:
        params_write = pool.submit(
            lambda: local_frame(spark, 
                [(d, by_d[d]) for d in sorted(by_d)], "d int, mid double"
            ).coalesce(1).write.mode("overwrite")
            .parquet(f"{path}/{_BQPARAMS_DIR}")
        )
        _write_cents_sidecar(spark, path, stats)
        params_write.result()
    _commit_marker(path)


def _bq_mids(spark: SparkSession, path: str) -> list[float]:
    """Per-dim midpoints from the ``_bqparams`` sidecar — O(dim)."""
    rows = _sidecar_rows(f"{path}/{_BQPARAMS_DIR}")
    by_d = {int(r.d): float(r.mid) for r in rows}
    return [by_d[d] for d in sorted(by_d)]


def read_binary_probe(
    spark: SparkSession,
    path: str,
    query_vec: Sequence[float],
    k: int = 10,
    n_probe: int = 2,
    id_col: str = "vec_id",
    where: F.Column | None = None,
) -> DataFrame:
    """Top-k by Hamming distance from a binary index: probe buckets
    chosen from the centroid sidecar (static partition pruning on the
    scan, ``read_ivf_probe``'s rule), the query packed driver-side
    with the sidecar midpoints (the same strict-``>`` rule as the
    stored bits, so both sides live on the same grid), then
    ``Σ_w bit_count(XOR)`` ranked ascending with the id tiebreak —
    pure integer arithmetic over 8 bytes/vector, the cheapest scan in
    the ladder. ``where`` enables filtered ANN (pushed into the codes
    scan). Returns (id, hamming, near-to-far)."""
    from data_pipeline_ine_spark.operators.similarity import (
        _bq_query_words,
        cosine,
    )

    cents = _cents_frame(spark, path)
    q = _darr_sql([float(x) for x in query_vec])
    probe_ids = [
        r[0]
        for r in cents.select(
            BUCKET_COL,
            F.round(cosine("`centroid`", q), 6).alias("sim"),
        )
        .orderBy(F.desc("sim"), *_bucket_order_cols())
        .limit(n_probe)
        .select(BUCKET_COL)
        .collect()
    ]
    mids = _bq_mids(spark, path)
    qwords = _bq_query_words(query_vec, mids)
    ham = None
    for w, qw in enumerate(qwords):
        t = F.bit_count(
            F.col(f"bq_w{w}").bitwiseXOR(F.lit(int(qw)).cast("long"))
        )
        ham = t if ham is None else ham + t
    probed = spark.read.parquet(path).filter(
        F.col(BUCKET_COL).isin(probe_ids)
    )
    if where is not None:
        probed = probed.filter(where)
    return (
        probed.select(id_col, ham.cast("bigint").alias("hamming"))
        .orderBy(F.asc("hamming"), F.asc(id_col))
        .limit(k)
    )


def read_binary_rerank(
    spark: SparkSession,
    bq_path: str,
    vectors: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    shortlist: int = 50,
    n_probe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Two-stage retrieval over the binary index — the production
    serving shape at the cheapest tier: stage 1 shortlists by Hamming
    over the 8-byte stored codes (pruned bucket scan, integer only),
    stage 2 re-ranks ONLY the shortlist with exact cosine against the
    raw vectors (a pushed-down id point-lookup set, never a bucket
    read). ``read_sq8_rerank``'s surface one rung down the ladder."""
    from data_pipeline_ine_spark.operators.similarity import (
        brute_force_topk,
    )

    short = read_binary_probe(
        spark, bq_path, query_vec, k=shortlist, n_probe=n_probe,
        id_col=id_col,
    )
    ids = [r[0] for r in short.select(id_col).collect()]
    cand = vectors.filter(F.col(id_col).isin(ids))
    return brute_force_topk(cand, query_vec, k, vec_col, id_col)


def read_binary_probe_batch(
    spark: SparkSession,
    path: str,
    queries: Sequence[tuple[int, Sequence[float]]],
    k: int = 10,
    n_probe: int = 2,
    id_col: str = "vec_id",
) -> DataFrame:
    """Batched binary serving — the batch symmetry the ladder was
    missing (flat ``read_ivf_probe_batch`` / PQ ``read_ivfpq_probe_
    batch`` / SQ8 ``read_sq8_probe_batch`` / binary here, VERDICT r11
    task 4): Q queries share ONE partition-pruned 8-byte codes scan
    (union of probed buckets as a single literal ``isin``), each
    query's packed sign-bit words travel IN the broadcast (query_id,
    bucket, qwords) frame, and per-candidate work is ``Σ_w
    bit_count(XOR)`` against the joined row's own words — pure integer
    arithmetic, per-query results identical to ``read_binary_probe``
    (parity-tested). Returns (query_id, vec_id, hamming, rank)."""
    from pyspark.sql.window import Window

    from data_pipeline_ine_spark.operators.similarity import (
        _BQ_WORD_BITS,
        _bq_query_words,
        cosine,
    )

    ids = [int(qid) for qid, _ in queries]
    if len(ids) != len(set(ids)):
        raise ValueError(f"duplicate query ids in batch: {sorted(ids)}")
    qdf = local_frame(spark, 
        [(int(qid), [float(x) for x in v]) for qid, v in queries],
        "query_id int, qvec array<double>",
    )
    cents = _cents_frame(spark, path)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("sim"), *_bucket_order_cols()
    )
    probe_rows = (
        cents.crossJoin(F.broadcast(qdf))  # |buckets| x Q — config-sized
        .select(
            "query_id",
            BUCKET_COL,
            F.round(cosine("`centroid`", "`qvec`"), 6).alias(
                "sim"
            ),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= n_probe)
        .select("query_id", BUCKET_COL)
        .collect()  # O(Q * n_probe) scalars — the probe plan, not data
    )
    probes: dict[int, list[str]] = {}
    for r in probe_rows:
        probes.setdefault(r["query_id"], []).append(r[BUCKET_COL])
    union_buckets = sorted({b for bs in probes.values() for b in bs})

    mids = _bq_mids(spark, path)
    qprobe = local_frame(spark, 
        [
            (int(qid), b, [int(qw) for qw in _bq_query_words(v, mids)])
            for qid, v in queries
            for b in probes[int(qid)]
        ],
        f"query_id int, {BUCKET_COL} string, qwords array<bigint>",
    )
    idx = spark.read.parquet(path).filter(
        F.col(BUCKET_COL).isin(union_buckets)
    )
    n_words = (len(mids) + _BQ_WORD_BITS - 1) // _BQ_WORD_BITS
    ham = None
    for wi in range(n_words):
        t = F.bit_count(
            F.col(f"bq_w{wi}").bitwiseXOR(
                F.element_at(F.col("qwords"), wi + 1)
            )
        )
        ham = t if ham is None else ham + t
    rk = Window.partitionBy("query_id").orderBy(
        F.asc("hamming"), F.asc(id_col)
    )
    return (
        idx.join(F.broadcast(qprobe), BUCKET_COL)
        .select("query_id", id_col, ham.cast("bigint").alias("hamming"))
        .withColumn("rank", F.row_number().over(rk).cast("bigint"))
        .filter(F.col("rank") <= k)
    )


def read_binary_rerank_batch(
    spark: SparkSession,
    bq_path: str,
    vectors: DataFrame,
    queries: Sequence[tuple[int, Sequence[float]]],
    k: int = 10,
    shortlist: int = 50,
    n_probe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Batched two-stage binary retrieval: Q queries shortlist through
    ONE pruned 8-byte codes scan (``read_binary_probe_batch``), then
    ALL shortlists re-rank exact from ONE pushed-down id-set lookup,
    each raw vector scoped to the queries that shortlisted it by a
    broadcast (query_id, id) membership join — ``read_sq8_rerank_
    batch``'s one-scan discipline at the ladder's cheapest rung.
    Driver traffic is O(Q·shortlist) id scalars. Returns (query_id,
    id, cosine_sim, rank)."""
    from pyspark.sql.window import Window

    short = read_binary_probe_batch(
        spark, bq_path, queries, k=shortlist, n_probe=n_probe,
        id_col=id_col,
    )
    rows = short.select("query_id", id_col).collect()
    union_ids = sorted({r[1] for r in rows})
    pairs = _shortlist_pairs(spark, vectors, id_col, rows)
    qdf = local_frame(spark, 
        [(int(qid), [float(x) for x in v]) for qid, v in queries],
        "query_id int, qvec array<double>",
    )
    cand = vectors.select(id_col, vec_col).filter(
        F.col(id_col).isin(union_ids)
    )
    sim = F.round(cosine(_qid(vec_col), "`qvec`"), 6)
    rk = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc(id_col)
    )
    return (
        cand.join(F.broadcast(pairs), id_col)
        .join(F.broadcast(qdf), "query_id")
        .select("query_id", id_col, sim.alias("cosine_sim"))
        .withColumn("rank", F.row_number().over(rk).cast("bigint"))
        .filter(F.col("rank") <= k)
    )


# --- quantization-drift reports: the freshness surface of the frozen ------
# --- quant params the append path holds fixed (VERDICT r11 task 2) --------


def sq8_quant_drift_report(
    spark: SparkSession,
    path: str,
    new_df: DataFrame,
    vec_col: str = "embedding",
    thresh_num: int = 1,
    thresh_den: int = 100,
) -> DataFrame:
    """Quantization-drift surface for the frozen SQ8 grid —
    ``ivf_drift_report``'s companion one artifact over: appends encode
    against the FROZEN per-dim affine bounds, so a drifting corpus
    saturates silently (every out-of-grid value clamps to code 0/255
    and all distance contrast past the boundary is lost). Per
    dimension, against the RAW appended cohort (``new_df`` — the
    source rows of the appended batches; the index itself stores only
    the already-saturated codes, so the overflow is measurable only
    upstream of encoding): how many values fall strictly outside the
    frozen ``[vmin, vmax]`` training range, split by side. ``retrain =
    1`` iff the out-of-grid count exceeds ``thresh_num/thresh_den`` of
    the cohort's values in that dimension (integer cross-multiply —
    no float division to disagree across engines). Output one row per
    dimension: ``(d, n_new, n_clip_lo, n_clip_hi, retrain)``,
    1-indexed ``d`` (the sidecar's convention).

    Scale shape: the params sidecar is O(dim) scalars; the report is
    ONE posexplode map over the appended cohort plus ONE dim-keyed
    map-side-combinable aggregate (|dim| groups). All counts exact
    integers. The recovery step it points at is ``rebuild_sq8_index``.
    """
    # read the sidecar's EXACT stored bounds — reconstructing vmax as
    # vmin + span would be off by an ulp whenever the subtraction
    # rounded (IEEE a + (b - a) != b), and the strict > comparison
    # below must agree with an oracle comparing against the true max
    rows = _sidecar_rows(f"{path}/{_SQPARAMS_DIR}")
    by_d = {int(r.d): (float(r.vmin), float(r.vmax)) for r in rows}
    lo = F.lit([float(by_d[d][0]) for d in sorted(by_d)])
    hi = F.lit([float(by_d[d][1]) for d in sorted(by_d)])
    cells = new_df.select(F.posexplode(vec_col).alias("d0", "x")).select(
        (F.col("d0") + 1).cast("int").alias("d"),
        F.col("x").cast("double").alias("x"),
    )
    prof = cells.groupBy("d").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_new"),
        F.sum(
            F.when(F.col("x") < F.element_at(lo, F.col("d")), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_clip_lo"),
        F.sum(
            F.when(F.col("x") > F.element_at(hi, F.col("d")), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_clip_hi"),
    )
    retrain = F.when(
        (F.col("n_clip_lo") + F.col("n_clip_hi")) * F.lit(int(thresh_den))
        > F.col("n_new") * F.lit(int(thresh_num)),
        1,
    ).otherwise(0)
    return prof.select(
        "d", "n_new", "n_clip_lo", "n_clip_hi",
        retrain.cast("int").alias("retrain"),
    ).orderBy("d")


def binary_quant_drift_report(
    spark: SparkSession,
    path: str,
    new_df: DataFrame,
    vec_col: str = "embedding",
    thresh_num: int = 1,
    thresh_den: int = 20,
) -> DataFrame:
    """Quantization-drift surface for the frozen binary midpoints: a
    binary code never clips (a sign bit always exists), so the drift
    that matters is THRESHOLD MOVEMENT — how many of the appended
    cohort's values would flip their stored bit if the per-dim
    (min+max)/2 midpoint were re-derived from that cohort. Per
    dimension: the appended cohort's own midpoint vs the frozen one,
    and the count of values landing BETWEEN the two thresholds (the
    exact set whose bits a retrain would flip — ``(x > frozen) !=
    (x > new)`` iff x lies in the half-open interval between them).
    ``retrain = 1`` iff the flip count exceeds ``thresh_num/
    thresh_den`` of the cohort (integer cross-multiply). Output one
    row per dimension: ``(d, n_new, n_flip, mid_e6_frozen, mid_e6_new,
    retrain)`` with midpoints e6-snapped (``FLOOR(m*1e6 + 0.5)``) —
    drift tolerances need no more precision, and the snap is
    engine-exact.

    Two passes over the APPENDED cohort only (its per-dim MIN/MAX,
    then the flip count against both thresholds) — never the corpus;
    both are posexplode maps + |dim|-group aggregates. The recovery
    step is ``rebuild_binary_index``."""
    import math

    frozen = _bq_mids(spark, path)
    cells = new_df.select(F.posexplode(vec_col).alias("d0", "x")).select(
        (F.col("d0") + 1).cast("int").alias("d"),
        F.col("x").cast("double").alias("x"),
    )
    mm = (
        cells.groupBy("d")
        .agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
        .collect()  # O(dim) scalars — the re-derived thresholds
    )
    if not mm:
        # empty appended cohort: nothing to re-derive, nothing drifted
        return local_frame(spark, 
            [],
            "d int, n_new bigint, n_flip bigint, mid_e6_frozen bigint, "
            "mid_e6_new bigint, retrain int",
        )
    new_mids = {int(r["d"]): (float(r["lo"]) + float(r["hi"])) / 2.0 for r in mm}
    fl = F.lit([float(m) for m in frozen])
    nl = F.array(
        *[F.lit(float(new_mids[d + 1])) for d in range(len(frozen))]
    )
    f_at = F.element_at(fl, F.col("d"))
    n_at = F.element_at(nl, F.col("d"))
    flips = F.when(
        (F.col("x") > f_at) != (F.col("x") > n_at), 1
    ).otherwise(0)
    prof = cells.groupBy("d").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_new"),
        F.sum(flips).cast("bigint").alias("n_flip"),
    )
    me6 = {
        d: int(math.floor(new_mids[d] * 1e6 + 0.5)) for d in new_mids
    }
    fe6 = {
        d + 1: int(math.floor(frozen[d] * 1e6 + 0.5))
        for d in range(len(frozen))
    }
    fe6_lit = F.lit([int(fe6[d + 1]) for d in range(len(frozen))])
    me6_lit = F.lit([int(me6[d + 1]) for d in range(len(frozen))])
    retrain = F.when(
        F.col("n_flip") * F.lit(int(thresh_den))
        > F.col("n_new") * F.lit(int(thresh_num)),
        1,
    ).otherwise(0)
    return prof.select(
        "d",
        "n_new",
        "n_flip",
        F.element_at(fe6_lit, F.col("d")).alias("mid_e6_frozen"),
        F.element_at(me6_lit, F.col("d")).alias("mid_e6_new"),
        retrain.cast("int").alias("retrain"),
    ).orderBy("d")


# --- Matryoshka prefix tier as stored layout (VERDICT r11 task 3) ----------


def write_prefix_index(
    df: DataFrame,
    path: str,
    prefix_dims: int = 16,
    part_col: str | None = None,
    n_clusters: int = 8,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> None:
    """The Matryoshka prefix-dimension serving layout as Spark
    partitioned storage — the stored twin of the in-plan
    ``operators/similarity.py::prefix_dim_topk_rerank``, and the layout
    that turns the prefix rung's compute saving into an I/O saving: the
    corpus bucketed by the coarse key (``write_ivf_index``'s rule) and
    stored with the full vector PLUS a separate narrow ``prefix``
    column holding the leading ``prefix_dims`` components. Parquet is
    columnar, so the first serving pass projects ONLY (id, prefix) and
    the scan reads ~``prefix_dims/dim`` of the vector bytes — the full
    ``vec_col`` column is fetched exclusively for the shortlist's id
    point-lookups (``read_prefix_rerank``; plan-pinned: the stage-1
    scan's ReadSchema must not contain ``vec_col``). Storage grows by
    the prefix copy (~``prefix_dims/dim``) — the standard
    space-for-scan-I/O trade every covering projection makes.

    Sidecars: per-bucket centroids (probe selection, 6dp-snapped) and
    ``_prefixparams`` (the stored ``prefix_dims`` knob, so readers
    slice queries identically). Effective only for MRL-trained
    embeddings — measure first with ``prefix_dim_recall_curve`` (the
    pre-flight check SCALING.md documents)."""
    from concurrent.futures import ThreadPoolExecutor

    from data_pipeline_ine_spark.operators.similarity import (
        _assign_clusters,
        kmeans_fit,
    )

    p = int(prefix_dims)
    if part_col is None:
        centroids = kmeans_fit(
            df, k=n_clusters, iters=iters, vec_col=vec_col, id_col=id_col
        )
        src = _assign_clusters(df, centroids, vec_col)
        part_col = "cluster"
    else:
        src = df
    bucketed = src.withColumn(
        BUCKET_COL, F.concat(F.lit("b"), F.col(part_col).cast("string"))
    ).withColumn("prefix", F.slice(F.col(vec_col), 1, p))
    if part_col != BUCKET_COL:
        bucketed = bucketed.drop(part_col)
    spark = df.sparkSession
    # data write ∥ centroid stats collect — the write_ivf_index overlap
    # shape (guide §2.6); sidecar writes land AFTER the data write since
    # mode("overwrite") on ``path`` clears the root first. 6dp snap per
    # ADVICE r11.
    with ThreadPoolExecutor(max_workers=1) as pool:
        data_write = pool.submit(
            lambda: bucketed.write.partitionBy(BUCKET_COL)
            .mode("overwrite")
            .parquet(path)
        )
        stats = _bucket_dim_stats(bucketed, vec_col)
        data_write.result()
    with ThreadPoolExecutor(max_workers=1) as pool:
        params_write = pool.submit(
            lambda: local_frame(spark, [(p,)], "prefix_dims int")
            .coalesce(1).write.mode("overwrite")
            .parquet(f"{path}/{_PREFIXPARAMS_DIR}")
        )
        _write_cents_sidecar(spark, path, stats)
        params_write.result()
    _commit_marker(path)


def _prefix_params(spark: SparkSession, path: str) -> int:
    """Stored ``prefix_dims`` from the ``_prefixparams`` sidecar."""
    return int(
        _sidecar_rows(f"{path}/{_PREFIXPARAMS_DIR}")[0][0]
    )


def _prefix_shortlist_frame(
    spark: SparkSession,
    path: str,
    query_vec: Sequence[float],
    shortlist: int = 50,
    n_probe: int = 2,
    id_col: str = "vec_id",
    where: F.Column | None = None,
) -> DataFrame:
    """Stage 1 of ``read_prefix_rerank``, exposed so the plan tests can
    pin its scan: probe buckets from the centroid sidecar (static
    partition pruning), then rank by rounded prefix cosine over a
    projection of ONLY (id, prefix) — the ReadSchema must not contain
    the full vector column; that absence IS the tier's 100 TB I/O
    claim. ``where`` enables filtered ANN over payload columns, pushed
    into the narrow scan beside the pruning (the filtered-serving
    symmetry every other rung already has). Returns the ``shortlist``
    nearest as (id, prefix_sim)."""
    cents = _cents_frame(spark, path)
    q = _darr_sql([float(x) for x in query_vec])
    probe_ids = [
        r[0]
        for r in cents.select(
            BUCKET_COL,
            F.round(cosine("`centroid`", q), 6).alias("sim"),
        )
        .orderBy(F.desc("sim"), *_bucket_order_cols())
        .limit(n_probe)
        .select(BUCKET_COL)
        .collect()
    ]
    p = _prefix_params(spark, path)
    qp = _darr_sql([float(x) for x in list(query_vec)[:p]])
    probed = spark.read.parquet(path).filter(
        F.col(BUCKET_COL).isin(probe_ids)
    )
    if where is not None:
        probed = probed.filter(where)
    return (
        probed.select(
            id_col,
            F.round(cosine("`prefix`", qp), 6).alias("prefix_sim"),
        )
        .orderBy(F.desc("prefix_sim"), F.asc(id_col))
        .limit(int(shortlist))
    )


def read_prefix_rerank(
    spark: SparkSession,
    path: str,
    query_vec: Sequence[float],
    k: int = 10,
    shortlist: int = 50,
    n_probe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    where: F.Column | None = None,
) -> DataFrame:
    """Two-stage retrieval over the stored prefix index: stage 1
    shortlists by prefix cosine over a (id, prefix)-ONLY projection of
    the pruned bucket scan (``_prefix_shortlist_frame`` — the full
    vector column never enters that scan's ReadSchema), stage 2
    re-ranks ONLY the shortlist with exact full-dimension cosine,
    fetching the stored full vectors through a pushed-down id
    point-lookup set. ``read_sq8_rerank``'s surface with the first
    pass paid in prefix bytes instead of codes. ``where`` enables
    filtered ANN, pushed into the narrow stage-1 scan. Returns
    (id, cosine_sim) ranked near-to-far."""
    from data_pipeline_ine_spark.operators.similarity import (
        brute_force_topk,
    )

    short = _prefix_shortlist_frame(
        spark, path, query_vec, shortlist=shortlist, n_probe=n_probe,
        id_col=id_col, where=where,
    )
    ids = [r[0] for r in short.select(id_col).collect()]
    cand = (
        spark.read.parquet(path)
        .select(id_col, vec_col)
        .filter(F.col(id_col).isin(ids))
    )
    return brute_force_topk(cand, query_vec, k, vec_col, id_col)


def read_prefix_rerank_batch(
    spark: SparkSession,
    path: str,
    queries: Sequence[tuple[int, Sequence[float]]],
    k: int = 10,
    shortlist: int = 50,
    n_probe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Batched two-stage prefix retrieval — the batch symmetry of the
    stored Matryoshka tier (every other rung serves Q queries in one
    pruned scan; this one does it reading only prefix bytes): stage 1
    is ONE partition-pruned scan projecting (id, prefix) joined to the
    broadcast (query_id, bucket, qprefix) frame, ranked per query by
    rounded prefix cosine; stage 2 fetches full vectors ONCE for the
    union of shortlists (pushed-down id set) and exact-reranks each
    query against its own shortlist via the broadcast (query_id, id)
    membership join. Driver traffic O(Q·shortlist) scalars. Returns
    (query_id, id, cosine_sim, rank)."""
    from pyspark.sql.window import Window

    ids = [int(qid) for qid, _ in queries]
    if len(ids) != len(set(ids)):
        raise ValueError(f"duplicate query ids in batch: {sorted(ids)}")
    qdf = local_frame(spark, 
        [(int(qid), [float(x) for x in v]) for qid, v in queries],
        "query_id int, qvec array<double>",
    )
    cents = _cents_frame(spark, path)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("sim"), *_bucket_order_cols()
    )
    probe_rows = (
        cents.crossJoin(F.broadcast(qdf))  # |buckets| x Q — config-sized
        .select(
            "query_id",
            BUCKET_COL,
            F.round(cosine("`centroid`", "`qvec`"), 6).alias(
                "sim"
            ),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= n_probe)
        .select("query_id", BUCKET_COL)
        .collect()
    )
    probes: dict[int, list[str]] = {}
    for r in probe_rows:
        probes.setdefault(r["query_id"], []).append(r[BUCKET_COL])
    union_buckets = sorted({b for bs in probes.values() for b in bs})

    p = _prefix_params(spark, path)
    qprobe = local_frame(spark, 
        [
            (int(qid), b, [float(x) for x in list(v)[:p]])
            for qid, v in queries
            for b in probes[int(qid)]
        ],
        f"query_id int, {BUCKET_COL} string, qprefix array<double>",
    )
    # stage 1: narrow (id, prefix) projection of ONE pruned scan — the
    # full vector column must never enter this scan's ReadSchema
    rk1 = Window.partitionBy("query_id").orderBy(
        F.desc("prefix_sim"), F.asc(id_col)
    )
    short = (
        spark.read.parquet(path)
        .filter(F.col(BUCKET_COL).isin(union_buckets))
        .select(id_col, "prefix", BUCKET_COL)
        .join(F.broadcast(qprobe), BUCKET_COL)
        .select(
            "query_id",
            id_col,
            F.round(
                cosine("`prefix`", "`qprefix`"), 6
            ).alias("prefix_sim"),
        )
        .withColumn("_rn", F.row_number().over(rk1))
        .filter(F.col("_rn") <= int(shortlist))
    )
    rows = short.select("query_id", id_col).collect()
    union_ids = sorted({r[1] for r in rows})
    idx = spark.read.parquet(path)
    pairs = _shortlist_pairs(spark, idx, id_col, rows)
    cand = idx.select(id_col, vec_col).filter(F.col(id_col).isin(union_ids))
    sim = F.round(cosine(_qid(vec_col), "`qvec`"), 6)
    rk2 = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc(id_col)
    )
    return (
        cand.join(F.broadcast(pairs), id_col)
        .join(F.broadcast(qdf), "query_id")
        .select("query_id", id_col, sim.alias("cosine_sim"))
        .withColumn("rank", F.row_number().over(rk2).cast("bigint"))
        .filter(F.col("rank") <= k)
    )


def rebuild_ivfpq_index(
    spark: SparkSession,
    path: str,
    source: DataFrame,
    part_col: str | None = None,
    n_clusters: int = 8,
    iters: int = 2,
    m: int = 4,
    n_codes: int = 8,
    trained: bool = False,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    memo_key: str | None = None,
) -> int:
    """Drift recovery for the codes-only PQ tier — the third member of
    the codes-only rebuild family (``rebuild_sq8_index`` /
    ``rebuild_binary_index``): re-train the coarse quantizer AND the
    PQ codebook from the SOURCE table (an appended cohort whose
    subspace distribution drifted off the frozen codewords pays
    reconstruction error that ``pq_quant_drift_report`` measures until
    this runs) and stage-and-swap the rewrite with replay-marker
    carry. Returns the bucket count after the swap."""
    import shutil

    _refuse_if_pending_batches(path, "rebuild")
    markers_t0 = _batch_markers(path)
    stage = path.rstrip("/") + ".compacting"
    shutil.rmtree(stage, ignore_errors=True)
    write_ivfpq_index(
        source, stage, part_col=part_col, n_clusters=n_clusters,
        iters=iters, m=m, n_codes=n_codes, trained=trained,
        vec_col=vec_col, id_col=id_col, memo_key=memo_key,
    )
    return _swap_in_rebuilt_stage(path, stage, markers_t0)


def pq_quant_drift_report(
    spark: SparkSession,
    path: str,
    new_df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    thresh_num: int = 3,
    thresh_den: int = 2,
) -> DataFrame:
    """Quantization-drift surface for the frozen PQ codebook: PQ never
    clips and has no per-dim threshold — its staleness shows up as
    RECONSTRUCTION ERROR, the squared distance between a vector's
    fixed-point subvector and the nearest frozen codeword (the loss
    the ADC distance silently absorbs). Per subspace, against the RAW
    appended cohort: the e6-free exact BIGINT mean reconstruction
    error under the FROZEN sidecar codebook versus under a codebook
    derived from the COHORT ITSELF (same untrained recipe the index
    writer uses — ``n_codes`` lowest-id cohort vectors), and
    ``retrain = 1`` iff the frozen error exceeds ``thresh_num/
    thresh_den`` times the cohort-derived error (integer
    cross-multiply on the SUMS — same count both sides, no division
    in the flag). Output one row per subspace: ``(s, n_new,
    mean_err_frozen, mean_err_fresh, retrain)``, 0-based ``s``.

    Scale shape: both codebooks are O(n_codes·dim) plan literals; the
    report is ONE narrow integer-fold map over the appended cohort
    (``pq_recon_err_col`` — the ``pq_encode`` machinery pointed at the
    min distance instead of the argmin) plus an ``m``-group aggregate.
    The recovery step is ``rebuild_ivfpq_index``."""
    from data_pipeline_ine_spark.operators.similarity import (
        pq_codebook,
        pq_recon_err_col,
    )

    cb_rows = _sidecar_rows(f"{path}/{_CODEBOOK_DIR}")
    m = 1 + max(r.s for r in cb_rows)
    n_codes = 1 + max(r.c for r in cb_rows)
    frozen: list[list[list[int]]] = [[None] * n_codes for _ in range(m)]
    for r in cb_rows:
        frozen[r.s][r.c] = [int(x) for x in r.subvec]
    fresh = pq_codebook(
        new_df, vec_col=vec_col, id_col=id_col, m=m, n_codes=n_codes,
        trained=False,
    )
    z = F.arrays_zip(
        pq_recon_err_col(vec_col, frozen).alias("ef"),
        pq_recon_err_col(vec_col, fresh).alias("en"),
    )
    cells = new_df.select(F.posexplode(z).alias("s0", "e"))
    prof = cells.groupBy(F.col("s0").cast("int").alias("s")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_new"),
        F.sum(F.col("e.ef")).cast("bigint").alias("_sf"),
        F.sum(F.col("e.en")).cast("bigint").alias("_sn"),
    )
    retrain = F.when(
        F.col("_sf") * F.lit(int(thresh_den))
        > F.col("_sn") * F.lit(int(thresh_num)),
        1,
    ).otherwise(0)
    return prof.select(
        "s",
        "n_new",
        F.expr("_sf div n_new").cast("bigint").alias("mean_err_frozen"),
        F.expr("_sn div n_new").cast("bigint").alias("mean_err_fresh"),
        retrain.cast("int").alias("retrain"),
    ).orderBy("s")

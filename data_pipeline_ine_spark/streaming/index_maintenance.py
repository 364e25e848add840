"""Online IVF index maintenance: a vector stream appended into the
frozen-centroid index with EXACTLY-ONCE batch commits.

``append_to_ivf_index`` (sources/ivf_index.py) is the batch append —
``mode("append")`` adds files, so a foreachBatch that called it naively
would DUPLICATE vectors whenever Structured Streaming replays a batch
(foreachBatch is at-least-once). This sink makes the append replay-safe
with the stage-then-publish discipline the repo's other sinks use
(streaming/cdc.py versions, sources/pydatasink.py manifests), adapted to
a partitioned table that must keep growing in place:

1. skip committed batches: ``_batch_commits/b{id}`` marker check;
2. STAGE the batch — rows routed to their frozen buckets (the shared
   ``_bucket_for_append`` step, same assignment/tiebreak as the batch
   path) and written to ``.batches/b{id}`` with ``mode("overwrite")``
   as one file per bucket (bucket-keyed repartition — deterministic
   file COUNT and row set per file; row order may vary, which is fine);
3. PUBLISH with deterministic destination names:
   ``bucket=*/batch{id}-{n}.parquet`` via ``os.replace`` — atomic per
   file, and a replay that re-publishes REPLACES the same name with the
   same row set, never adds a second copy (Spark's own part-file names
   are random, which is exactly why a naive re-append duplicates);
4. commit the marker LAST.

A crash anywhere re-runs 2–4 idempotently on replay. Probes see a
bucket's new file only after its ``os.replace`` lands — readers never
observe a torn file. Compaction (``compact_ivf_index``) folds the
accumulated per-batch files back to one per bucket.

Scale shape: per batch the work is the narrow centroid-literal
assignment + one bucket-keyed repartition of BATCH-sized data; the
index itself is never rewritten. Beyond-reference component (the
reference has no streaming and no vector path); the pattern is the
standard transactional-foreachBatch discipline from the Structured
Streaming guide, applied to partitioned-table appends.
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_pipeline_ine_spark.sources.ivf_index import (
    BUCKET_COL,
    _BATCH_COMMITS_DIR,
    _bucket_for_append,
)


def _publish_staged_batch(stage: str, path: str, batch_id: int) -> int:
    """Move every staged bucket file into the live index under a
    deterministic name. Returns the number of files published.

    Sweeps any ``batch{id}-*.parquet`` already in the destination
    FIRST: with ``spark.sql.files.maxRecordsPerFile`` set, a bucket can
    stage MULTIPLE files with nondeterministic row-to-file assignment,
    so a crash-before-marker replay may publish a different file
    count — a stale ``batch{id}-1.parquet`` from the first attempt
    would then survive next to the replay's files and duplicate rows
    (ADVICE r8). The sweep is safe because the marker hasn't committed:
    no reader is entitled to this batch's rows yet."""
    for stale in glob.glob(
        os.path.join(path, "bucket=*", f"batch{batch_id}-*.parquet")
    ):
        os.remove(stale)
    n = 0
    for bucket_dir in sorted(glob.glob(os.path.join(stage, "bucket=*"))):
        bucket = os.path.basename(bucket_dir)
        dest_dir = os.path.join(path, bucket)
        os.makedirs(dest_dir, exist_ok=True)
        files = sorted(
            f
            for f in os.listdir(bucket_dir)
            if f.endswith(".parquet") and not f.startswith((".", "_"))
        )
        for i, f in enumerate(files):
            os.replace(
                os.path.join(bucket_dir, f),
                os.path.join(dest_dir, f"batch{batch_id}-{i}.parquet"),
            )
            n += 1
    return n


def append_batch_to_ivf_index(
    batch_df: DataFrame,
    batch_id: int,
    path: str,
    part_col: str | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> bool:
    """The foreachBatch body, callable directly for tests/backfills.
    Returns True when the batch was applied, False when its commit
    marker already existed (replay skipped)."""
    commits = os.path.join(path, _BATCH_COMMITS_DIR)
    marker = os.path.join(commits, f"b{batch_id}")
    if os.path.exists(marker):
        return False
    bucketed = _bucket_for_append(batch_df, path, part_col, vec_col, id_col)
    stage = os.path.join(path, ".batches", f"b{batch_id}")
    # one file per bucket: deterministic layout, so a replayed stage
    # produces byte-identical files and re-publish is a no-op overwrite
    (
        bucketed.repartition(F.col(BUCKET_COL))
        .write.partitionBy(BUCKET_COL)
        .mode("overwrite")
        .parquet(stage)
    )
    _publish_staged_batch(stage, path, batch_id)
    shutil.rmtree(stage, ignore_errors=True)
    os.makedirs(commits, exist_ok=True)
    with open(marker, "w") as f:
        f.write("ok\n")
    return True


def stream_append_to_ivf_index(
    vectors_stream: DataFrame,
    path: str,
    checkpoint: str,
    part_col: str | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
):
    """Run the maintenance sink over a vector stream (availableNow:
    drain-what's-there maintenance runs; swap the trigger for a
    continuous ingest). The index at ``path`` must already exist —
    centroids stay frozen, per ``append_to_ivf_index``'s contract."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        append_batch_to_ivf_index(
            batch_df, batch_id, path,
            part_col=part_col, vec_col=vec_col, id_col=id_col,
        )

    return (
        vectors_stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )

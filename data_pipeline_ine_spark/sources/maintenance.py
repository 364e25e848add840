"""Table maintenance: small-file compaction and sort-ordered data layout.

Two jobs every 100 TB parquet lake runs nightly, missing from the query
path but decisive for it:

- **Compaction.** Streaming/incremental writers land thousands of KB-sized
  files per partition; every downstream scan then pays a task per file and
  the NameNode/listing pays per entry. Compaction rewrites a partition into
  ~``target_bytes`` files. (The reference's folder-per-run layout —
  ``outputs/DD-MM-YYYY/`` — has the same problem one level up; its answer
  is "rewrite the folder", which is this operator with a date filter.)
- **Layout.** Parquet prunes with file- and row-group-level min/max stats,
  but stats only prune if the data is clustered: a column whose values are
  scattered uniformly across files has every file's [min,max] spanning the
  whole domain — zero pruning. ``write_range_layout`` range-partitions and
  sorts on the hot filter columns so each file owns a disjoint slice, and
  a point/range predicate touches O(1) of them (asserted file-by-file in
  ``tests/test_maintenance.py``).

Both write to an explicit ``out_path`` and leave the swap to the caller:
rename-into-place is the storage layer's atomicity primitive (and on object
stores, a manifest/metastore pointer flip), not something to hide inside an
engine operator.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession

DEFAULT_TARGET_BYTES = 128 * 1024 * 1024


def _norm_file_uri(uri: str) -> str:
    """Decode a Spark-reported file URI to a canonical, unescaped form.

    ``input_file_name()`` and ``df.inputFiles()`` both return
    URL-encoded URIs (space → %20, %25 for a literal %, UTF-8
    percent-escapes for non-ASCII) and disagree on slash style
    (``file:///p`` vs ``file:/p``). Feeding those back into
    ``spark.read.parquet`` or ``hadoop.fs.Path`` resolves the ENCODED
    name and misses the real file. One canonical form —
    ``scheme://netloc + unquoted path`` — makes re-reads, set
    membership, and FS copies agree."""
    from urllib.parse import unquote, urlsplit

    parts = urlsplit(uri)
    if not parts.scheme:
        return unquote(uri)
    return f"{parts.scheme}://{parts.netloc}{unquote(parts.path)}"


def table_bytes(spark: SparkSession, path: str) -> int:
    """Total on-disk bytes under ``path`` — Hadoop FS metadata only (works
    for any supported scheme: file://, hdfs://, s3a://, ...)."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs.getContentSummary(p).getLength()


def compact_small_files(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_bytes: int = DEFAULT_TARGET_BYTES,
) -> int:
    """Rewrite the parquet at ``path`` into ``ceil(size / target_bytes)``
    files at ``out_path``; returns the file count written.

    Round-robin repartition (no keys): compaction must not introduce a
    keyed shuffle or disturb value distribution — it only changes file
    grain. Sizing uses the source's compressed on-disk bytes, the only
    number a metadata probe can know; post-compaction files land within
    ~encoding-drift of ``target_bytes``, which is a layout knob, not an
    invariant.
    """
    n_files = max(1, math.ceil(table_bytes(spark, path) / target_bytes))
    df = spark.read.parquet(path)
    df.repartition(n_files).write.mode("overwrite").parquet(out_path)
    return n_files


def write_range_layout(
    df: DataFrame,
    out_path: str,
    sort_cols: tuple[str, ...],
    n_files: int,
) -> None:
    """Write ``df`` as ``n_files`` files clustered on ``sort_cols``: range
    repartition gives each file a disjoint key slice, the within-partition
    sort gives row groups monotone min/max — so predicates on the leading
    sort column prune at BOTH granularities. One range-exchange shuffle
    (sampled boundaries, skew-tolerant), no global sort.

    For two independently-filtered columns, lead with the higher-selectivity
    one; interleaved (Z-order) layouts buy multi-column pruning at the cost
    of per-column resolution — with range+sort in the toolbox that's an
    encoding change on the same plan shape, not a new operator.
    """
    (
        df.repartitionByRange(n_files, *sort_cols)
        .sortWithinPartitions(*sort_cols)
        .write.mode("overwrite")
        .parquet(out_path)
    )


def vacuum_versions(snapshot_dir: str, keep_last: int = 3) -> list[str]:
    """Retention for versioned snapshot directories (the streaming CDC /
    IVM / CMS sinks write immutable ``v{N}`` versions forever): delete
    all but the newest ``keep_last`` COMMITTED versions, plus every torn
    (marker-less) directory older than the newest committed version —
    a crash's half-written ``v{N}`` is overwritten on replay, but one
    abandoned by a checkpoint reset would otherwise leak forever.

    Readers are never endangered: only versions strictly older than the
    ``keep_last`` committed tail are removed, the newest committed
    version is always kept (``keep_last`` floors at 1), and deletion
    takes the _SUCCESS marker FIRST so a concurrent reader that raced
    the listing sees a torn (invisible) directory, not a partial table.
    Returns the deleted paths."""
    import shutil

    from data_pipeline_ine_spark.streaming.cdc import _versions

    keep_last = max(1, keep_last)
    committed = _versions(snapshot_dir)
    if not committed:
        return []
    cutoff_version = committed[-1][0]
    drop = [p for _, p in committed[:-keep_last]]
    # torn directories older than the committed head (never the head
    # itself: an in-flight write may be mid-commit)
    if os.path.isdir(snapshot_dir):
        import re

        for name in os.listdir(snapshot_dir):
            m = re.fullmatch(r"v(\d+)", name)
            path = os.path.join(snapshot_dir, name)
            if (
                m
                and int(m.group(1)) < cutoff_version
                and not os.path.exists(os.path.join(path, "_SUCCESS"))
            ):
                drop.append(path)
    for path in drop:
        marker = os.path.join(path, "_SUCCESS")
        if os.path.exists(marker):
            os.remove(marker)  # version becomes invisible before teardown
        shutil.rmtree(path, ignore_errors=True)
    return sorted(drop)


def targeted_delete(
    spark: SparkSession,
    path: str,
    out_path: str,
    keys: DataFrame,
    key_col: str,
) -> dict:
    """File-targeted hard delete (the GDPR/right-to-be-forgotten rewrite):
    remove every row whose ``key_col`` appears in ``keys``, rewriting
    ONLY the parquet files that actually contain a doomed key and
    copying every untouched file byte-for-byte.

    Why file-targeted: at 100 TB a delete list of a few thousand keys
    touches a handful of files when the table is clustered on the key
    (``write_range_layout``) — rewriting the whole table for it is a
    five-order-of-magnitude overspend. Cost is O(affected files) +
    O(table metadata), the same contract as Delta/Iceberg
    DELETE-with-file-pruning, expressed on plain parquet:

    1. the full file list comes from ``df.inputFiles()`` — pure
       FileIndex metadata, zero rows scanned (ADVICE r5; the previous
       ``distinct()`` over ``input_file_name()`` read every row); ONE
       key-column scan then semi-joins the (broadcast, small by nature)
       key list → the affected-file list, a driver-side collect of FILE
       NAMES only (bounded by file count, never rows),
    2. the affected files are re-read and anti-joined → rewritten,
    3. untouched files are FS-copied unchanged (scheme-independent
       Hadoop ``FileUtil``), preserving their stats/layout — readers of
       un-deleted data see identical bytes.

    Writes to an explicit ``out_path`` (swap is the caller's atomic
    rename/pointer flip, same discipline as compaction above). Returns
    ``{files_total, files_rewritten, rows_deleted}``.
    """
    from pyspark.sql import functions as F

    df = spark.read.parquet(path)
    tagged = df.withColumn("_file", F.input_file_name())
    # input_file_name()/inputFiles() return URL-ENCODED URIs (space →
    # %20, % → %25) with inconsistent slash forms (file:/ vs file:///);
    # normalize BOTH sides to decoded scheme://path before any re-read,
    # set membership, or Hadoop Path construction (ADVICE r5 — encoded
    # names failed the rewrite under paths with spaces/%/non-ASCII).
    all_files = sorted(_norm_file_uri(f) for f in df.inputFiles())
    affected = sorted(
        _norm_file_uri(r[0])
        for r in tagged.select("_file", key_col)
        .join(F.broadcast(keys), key_col, "leftsemi")
        .select("_file")
        .distinct()
        .collect()
    )
    rows_deleted = 0
    if affected:
        doomed = spark.read.parquet(*affected)
        rows_deleted = doomed.join(
            F.broadcast(keys), key_col, "leftsemi"
        ).count()
        (
            doomed.join(F.broadcast(keys), key_col, "left_anti")
            .write.mode("overwrite")
            .parquet(out_path)
        )
    else:
        os.makedirs(out_path, exist_ok=True)
    # byte-identical copies for files no doomed key lives in
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    affected_set = set(affected)
    for f in all_files:
        if f in affected_set:
            continue
        src = jvm.org.apache.hadoop.fs.Path(f)
        dst = jvm.org.apache.hadoop.fs.Path(
            out_path, src.getName()
        )
        fs_src = src.getFileSystem(conf)
        fs_dst = dst.getFileSystem(conf)
        jvm.org.apache.hadoop.fs.FileUtil.copy(
            fs_src, src, fs_dst, dst, False, conf
        )
    return {
        "files_total": len(all_files),
        "files_rewritten": len(affected),
        "rows_deleted": rows_deleted,
    }

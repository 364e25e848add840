"""Compaction and range-layout maintenance: file grain, preserved rows,
and the min/max disjointness that makes parquet stats actually prune."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from data_pipeline_ine_spark.sources.maintenance import (
    compact_small_files,
    table_bytes,
    write_range_layout,
)


def _parquet_files(path: str) -> list[str]:
    return sorted(glob.glob(os.path.join(path, "*.parquet")))


def test_compaction_reduces_files_and_preserves_rows(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    df = spark.range(10_000).withColumn("v", F.col("id") % 97)
    df.repartition(64).write.parquet(src)  # the pathological landing zone
    assert len(_parquet_files(src)) == 64

    n = compact_small_files(spark, src, dst, target_bytes=10**9)
    assert n == 1
    assert len(_parquet_files(dst)) == 1
    out = spark.read.parquet(dst)
    assert out.count() == 10_000
    assert out.agg(F.sum("v")).first()[0] == df.agg(F.sum("v")).first()[0]


def test_compaction_sizes_by_source_bytes(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    spark.range(50_000).withColumn(
        "pad", F.sha2(F.col("id").cast("string"), 256)
    ).repartition(32).write.parquet(src)
    total = table_bytes(spark, src)
    target = total // 4
    n = compact_small_files(spark, src, dst, target_bytes=target)
    assert 4 <= n <= 5  # ceil(total/target) with listing overhead slack
    assert len(_parquet_files(dst)) == n


def test_range_layout_files_are_key_disjoint(spark, tmp_path):
    dst = str(tmp_path / "layout")
    df = spark.range(20_000).select(
        (F.xxhash64("id") % 1000).alias("k"), F.col("id").alias("payload")
    )
    write_range_layout(df, dst, ("k",), n_files=8)
    files = _parquet_files(dst)
    assert len(files) == 8
    spans = []
    for f in files:
        row = spark.read.parquet(f).agg(
            F.min("k").alias("lo"), F.max("k").alias("hi"),
            F.count(F.lit(1)).alias("n"),
        ).first()
        if row.n:
            spans.append((row.lo, row.hi))
    spans.sort()
    # disjoint [lo, hi] per file = a point predicate prunes to ONE file
    for (_, hi_prev), (lo_next, _) in zip(spans, spans[1:]):
        assert hi_prev <= lo_next
    total = spark.read.parquet(dst).count()
    assert total == 20_000


def test_range_layout_scan_prunes_with_pushed_filter(spark, tmp_path):
    dst = str(tmp_path / "layout2")
    df = spark.range(20_000).select(
        (F.col("id") % 1000).alias("k"), F.col("id").alias("payload")
    )
    write_range_layout(df, dst, ("k",), n_files=8)
    plan = (
        spark.read.parquet(dst)
        .filter(F.col("k") == 5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PushedFilters: [IsNotNull(k), EqualTo(k,5)]" in plan


def test_vacuum_versions_keeps_tail_and_removes_torn(spark, tmp_path):
    """Retention: only the newest keep_last committed versions survive;
    torn directories older than the committed head are swept; the head
    itself is never touched even when keep_last=1."""
    import os

    from data_pipeline_ine_spark.sources.maintenance import vacuum_versions

    d = tmp_path / "versions"
    df = spark.range(5)
    for v in (1, 2, 3, 4):
        df.write.mode("overwrite").parquet(str(d / f"v{v}"))
    # torn: no _SUCCESS
    (d / "v0").mkdir()
    (d / "v0" / "part-junk.parquet").write_bytes(b"torn")

    deleted = vacuum_versions(str(d), keep_last=2)
    left = sorted(os.listdir(d))
    assert left == ["v3", "v4"], left
    assert any(p.endswith("v0") for p in deleted)

    # keep_last floors at 1: the committed head always survives
    vacuum_versions(str(d), keep_last=0)
    assert sorted(os.listdir(d)) == ["v4"]

    # empty dir: no-op
    assert vacuum_versions(str(tmp_path / "nope")) == []


def test_targeted_delete_rewrites_only_affected_files(spark, tmp_path):
    """RTBF contract: doomed keys vanish, every other row survives
    exactly, and files without a doomed key are copied BYTE-identical
    (locality: with a key-clustered layout the delete touches a
    fraction of the files)."""
    import hashlib
    import os

    from data_pipeline_ine_spark.sources.maintenance import (
        targeted_delete,
        write_range_layout,
    )

    src = str(tmp_path / "table")
    out = str(tmp_path / "after_delete")
    df = spark.range(10_000).selectExpr(
        "id AS user_id", "CAST(id % 97 AS INT) AS v"
    )
    write_range_layout(df, src, ("user_id",), n_files=8)

    keys = spark.createDataFrame([(5,), (6,), (7,)], "user_id long")
    stats = targeted_delete(spark, src, out, keys, "user_id")

    assert stats["rows_deleted"] == 3
    assert stats["files_total"] == 8
    # range layout clusters 5,6,7 into ONE file
    assert stats["files_rewritten"] == 1

    after = spark.read.parquet(out)
    assert after.filter("user_id IN (5, 6, 7)").count() == 0
    assert after.count() == 10_000 - 3
    # survivors identical
    expected = df.filter("user_id NOT IN (5, 6, 7)")
    assert after.exceptAll(expected).count() == 0
    assert expected.exceptAll(after).count() == 0

    # untouched files: same basename, same bytes
    def md5s(d):
        return {
            f: hashlib.md5(open(os.path.join(d, f), "rb").read()).hexdigest()
            for f in os.listdir(d)
            if f.endswith(".parquet")
        }

    before_sums, after_sums = md5s(src), md5s(out)
    untouched = set(before_sums) & set(after_sums)
    assert len(untouched) == 7
    assert all(before_sums[f] == after_sums[f] for f in untouched)


def test_targeted_delete_no_affected_files_copies_all(spark, tmp_path):
    """A delete list that matches nothing rewrites nothing: all files
    copied verbatim, zero rows deleted."""
    from data_pipeline_ine_spark.sources.maintenance import targeted_delete

    src = str(tmp_path / "t2")
    out = str(tmp_path / "t2_out")
    spark.range(100).selectExpr("id AS user_id").repartition(4).write.parquet(src)
    keys = spark.createDataFrame([(10**9,)], "user_id long")
    stats = targeted_delete(spark, src, out, keys, "user_id")
    assert stats == {
        "files_total": 4, "files_rewritten": 0, "rows_deleted": 0
    }
    assert spark.read.parquet(out).count() == 100


def test_targeted_delete_hostile_path_characters(spark, tmp_path):
    """ADVICE r5: input_file_name() returns URL-encoded URIs — a table
    under a directory with spaces, a literal %, and non-ASCII must
    still rewrite only the affected file and byte-copy the rest."""
    from data_pipeline_ine_spark.sources.maintenance import targeted_delete

    base = tmp_path / "rtbf año 100% raw"
    src, out = str(base / "t"), str(base / "t_out")
    spark.range(0, 100).withColumn("k", F.col("id")).repartition(
        4, "id"
    ).write.parquet(src)
    keys = spark.createDataFrame([(7,), (13,)], "k long")
    stats = targeted_delete(spark, src, out, keys, "k")
    assert stats["files_total"] >= 2
    assert stats["rows_deleted"] == 2
    assert 1 <= stats["files_rewritten"] < stats["files_total"]
    left = spark.read.parquet(out)
    assert left.count() == 98
    assert left.filter(F.col("k").isin(7, 13)).count() == 0

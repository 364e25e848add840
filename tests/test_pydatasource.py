"""Custom Python DataSource: partition planning, filter pushdown pruning,
deterministic executor-side generation (sources/pydatasource.py)."""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_pipeline_ine_spark.sources.pydatasource import (
    expected_rows,
    register_ine_source,
)


def test_pyds_partitions_and_content(spark):
    register_ine_source(spark)
    df = (
        spark.read.format("ine_observations")
        .option("rows_per_dataset", "40")
        .load()
    )
    # one input partition per dataset (4 defaults)
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 160
    got = sorted(tuple(r) for r in df.filter(F.col("dataset") == "nieve").collect())
    assert got == sorted(expected_rows("nieve", 40))


def test_pyds_pushdown_prunes_partitions(spark):
    register_ine_source(spark)
    df = (
        spark.read.format("ine_observations")
        .option("rows_per_dataset", "10")
        .load()
    )
    pruned = df.filter(F.col("dataset") == "caudal")
    # EqualTo on dataset reaches pushFilters -> only ONE partition planned
    assert pruned.rdd.getNumPartitions() == 1
    assert pruned.count() == 10
    # non-equality predicates stay post-scan: all partitions still planned
    kept = df.filter(F.col("value") > 50.0)
    assert kept.rdd.getNumPartitions() == 4


def test_pyds_deterministic_across_reads(spark):
    register_ine_source(spark)

    def read():
        return sorted(
            tuple(r)
            for r in spark.read.format("ine_observations")
            .option("rows_per_dataset", "25")
            .load()
            .collect()
        )

    assert read() == read()


def test_pyds_streaming_drains_exact_content(spark, tmp_path):
    """Custom streaming source: micro-batches advance the offset by
    batch_rows until total_rows (availableNow would stop after the first
    prefetch — a generator source must be drained on a running trigger);
    the union of batches must equal the batch-side generator exactly."""
    import time

    register_ine_source(spark)
    stream = (
        spark.readStream.format("ine_observations")
        .option("datasets", "temperatura,caudal")
        .option("batch_rows", "7")
        .option("total_rows", "30")
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("pyds_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="50 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            if spark.sql("select count(*) n from pyds_stream").first().n >= 60:
                break
            time.sleep(0.5)
    finally:
        q.stop()
    got = sorted(
        tuple(r) for r in spark.sql("select * from pyds_stream").collect()
    )
    want = sorted(expected_rows("temperatura", 30) + expected_rows("caudal", 30))
    assert got == want


def test_pyds_stream_replay_is_identical(spark):
    """readBetweenOffsets must regenerate any slice bit-identically —
    the exactly-once-under-retry property."""
    from data_pipeline_ine_spark.sources.pydatasource import (
        IneObservationsStreamReader,
    )

    r = IneObservationsStreamReader({"datasets": "nieve"})
    a = list(r.readBetweenOffsets({"i": 5}, {"i": 12}))
    b = list(r.readBetweenOffsets({"i": 5}, {"i": 12}))
    assert a == b and len(a) == 7
    # batches tile the stream: [0,7) + [7,12) == [0,12)
    tiled = list(r.readBetweenOffsets({"i": 0}, {"i": 7})) + list(
        r.readBetweenOffsets({"i": 7}, {"i": 12})
    )
    assert tiled == list(r.readBetweenOffsets({"i": 0}, {"i": 12}))


def test_manifest_jsonl_two_phase_commit(spark, tmp_path):
    """Custom DataSourceWriter: shards + atomic manifest publish. Readers
    see only manifest-listed shards, so pre-commit orphans are invisible."""
    import json
    import os

    from data_pipeline_ine_spark.sources.pydatasink import (
        read_manifest_jsonl,
        register_manifest_sink,
    )

    register_manifest_sink(spark)
    out = str(tmp_path / "sink")
    df = spark.range(100).selectExpr(
        "id", "CAST(id % 7 AS STRING) AS bucket"
    ).repartition(4)
    df.write.format("manifest_jsonl").mode("append").option("path", out).save()

    with open(os.path.join(out, "manifest.json")) as f:
        manifest = json.load(f)
    assert manifest["total_rows"] == 100
    assert len(manifest["shards"]) == 4
    assert sorted(manifest["columns"]) == ["bucket", "id"]

    # plant an orphan shard (a failed attempt's leftover): must stay invisible
    with open(os.path.join(out, "shard-orphan.jsonl"), "w") as f:
        f.write('{"id": 999999, "bucket": "x"}\n')
    back = read_manifest_jsonl(spark, out)
    assert back.count() == 100
    assert back.filter("id = 999999").count() == 0
    assert back.selectExpr("sum(id) s").first().s == sum(range(100))


def test_pyds_stream_restart_resumes_from_checkpoint(spark, tmp_path):
    """Kill the stream mid-flight and restart on the SAME checkpoint: the
    union of both runs must be exactly the full feed — no duplicates, no
    gaps (offsets committed to the checkpoint + deterministic
    readBetweenOffsets replay = exactly-once across restarts)."""
    import time

    register_ine_source(spark)
    out = str(tmp_path / "out")

    def count_rows():
        try:
            return spark.read.parquet(out).count()
        except Exception:
            return 0

    def start():
        # parquet sink: the memory sink refuses checkpoint recovery
        return (
            spark.readStream.format("ine_observations")
            .option("datasets", "temperatura")
            .option("batch_rows", "5")
            .option("total_rows", "40")
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(processingTime="50 milliseconds")
            .start()
        )

    q = start()
    deadline = time.time() + 60
    while time.time() < deadline:
        if 5 <= count_rows() < 40:
            break
        time.sleep(0.2)
    q.stop()  # mid-flight kill
    assert count_rows() < 40, "stream finished before the kill — lower the wait"

    q2 = start()  # same checkpoint: must resume, not replay
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            if count_rows() >= 40:
                break
            time.sleep(0.3)
    finally:
        q2.stop()
    rows = [tuple(r) for r in spark.read.parquet(out).collect()]
    assert len(rows) == len(set(rows)) == 40, (
        f"expected exactly-once 40 rows, got {len(rows)} "
        f"({len(set(rows))} distinct)"
    )
    assert sorted(rows) == sorted(expected_rows("temperatura", 40))


def test_pyds_read_yields_arrow_batches():
    """The batch read path must yield pyarrow.RecordBatch chunks (the
    Spark-4 zero-per-row-pickling path), chunked at ARROW_BATCH_ROWS,
    with the declared schema's exact Arrow types."""
    import pyarrow as pa

    from data_pipeline_ine_spark.sources.pydatasource import (
        IneObservationsReader,
        _DatasetPartition,
    )

    reader = IneObservationsReader(
        {"datasets": "temperatura", "rows_per_dataset": "25000"}
    )
    batches = list(reader.read(_DatasetPartition("temperatura", 25_000)))
    assert all(isinstance(b, pa.RecordBatch) for b in batches)
    assert [b.num_rows for b in batches] == [10_000, 10_000, 5_000]
    assert batches[0].schema.names == [
        "dataset", "period_code", "station_code", "value",
    ]
    assert batches[0].schema.types == [
        pa.string(), pa.int32(), pa.string(), pa.float64(),
    ]

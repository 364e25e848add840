"""Streaming data-quality monitoring: per-micro-batch distribution
drift against a frozen reference sample.

The batch operator (`operators/quality.py::distribution_drift`) answers
"did this dataset shift from the reference"; this wraps it in the
production monitoring shape: a CDC/event stream arrives, every
micro-batch is bucketed by the REFERENCE's (precomputed, frozen) decile
edges, and a per-bucket chi-square report row is appended to a report
sink keyed by batch id. Alerts are then a trivial filter over the
report table (`chi2 > threshold`).

Crash safety follows the `streaming/cdc.py` discipline where it matters:
the report append is idempotent per batch id (a replayed batch
overwrites its own partition, never duplicates), because foreachBatch
gives at-least-once semantics.

Scale shape: the reference collapses to its decile edges ONCE at stream
start (1-row frame, broadcast into every batch plan); per batch the work
is one narrow bucket-assignment projection + a 10-row aggregate — no
state store, no corpus shuffle, cost O(batch).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_drift_monitor(
    value_stream: DataFrame,
    ref: DataFrame,
    report_dir: str,
    checkpoint: str,
    value_col: str = "value",
    n_buckets: int = 10,
):
    """Start the monitor (AvailableNow trigger). ``ref`` is the frozen
    reference sample; each micro-batch appends rows
    ``(batch_id, bucket, ref_n, cur_n, chi2)`` under
    ``report_dir/batch_id=N/`` (idempotent per batch)."""
    from data_pipeline_ine_spark.operators.quality import distribution_drift

    # freeze the reference ONCE: its bucket counts and edges never change
    # mid-stream, so no per-batch reference scan
    ref_vals = ref.select(value_col).localCheckpoint()

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        target = os.path.join(report_dir, f"batch_id={batch_id}")
        if os.path.exists(os.path.join(target, "_SUCCESS")):
            return  # replayed batch: report already committed
        report = distribution_drift(
            ref_vals, batch_df.select(value_col), value_col, n_buckets
        )
        report.write.mode("overwrite").parquet(target)

    return (
        value_stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def read_drift_reports(spark, report_dir: str) -> DataFrame:
    """All committed per-batch reports with their batch_id column."""
    return spark.read.option("basePath", report_dir).parquet(
        os.path.join(report_dir, "batch_id=*")
    )

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

"""Streaming equivalence: draining the event stream with AvailableNow must
reproduce the batch tumbling aggregation; sessionization closes sessions at
gaps."""

from __future__ import annotations

import os
import shutil
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_pipeline_ine_spark.sources.registry import load_table
from data_pipeline_ine_spark.streaming.events import (
    read_event_stream,
    sessionize,
    tumbling_counts,
)


@pytest.fixture(scope="module")
def stream_dir(sf_dir, tmp_path_factory):
    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy(os.path.join(sf_dir, "events.parquet"), d / "part-0.parquet")
    return str(d)


def _drain(query_df, name):
    q = (
        query_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete" if name == "tumbling" else "append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_stream_matches_batch_tumbling(spark, sf_dir, stream_dir):
    stream = read_event_stream(spark, stream_dir)
    _drain(tumbling_counts(stream), "tumbling")
    got = {
        (str(r.window_start), r.event_type): (r.n, r.total)
        for r in spark.sql("select * from tumbling").collect()
    }
    events = load_table(spark, sf_dir, "events")
    batch = (
        events.groupBy(F.window("ts", "6 hours").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total")
    )
    want = {
        (str(r.window_start), r.event_type): (r.n, r.total) for r in batch.collect()
    }
    assert got == want
    assert len(got) > 0


def test_sessionize_closes_on_gap(spark, stream_dir):
    stream = read_event_stream(spark, stream_dir)
    _drain(sessionize(stream, gap_minutes=30), "sessions")
    sessions = spark.sql("select * from sessions")
    n = sessions.count()
    # sf0.001 has ~1000 events over 30 days for 15 users → many >30min gaps
    assert n > 10
    bad = sessions.filter(F.col("session_end") < F.col("session_start")).count()
    assert bad == 0

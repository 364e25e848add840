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
    dedup_stream,
    enrich_with_dim,
    read_event_stream,
    sessionize,
    stream_stream_attribution,
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
    q.awaitTermination(300)
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


def test_dedup_stream_drops_redeliveries(spark, sf_dir, tmp_path):
    # land the same file twice: an at-least-once source re-delivering
    d = tmp_path / "dup_stream"
    d.mkdir()
    shutil.copy(os.path.join(sf_dir, "events.parquet"), d / "a.parquet")
    shutil.copy(os.path.join(sf_dir, "events.parquet"), d / "b.parquet")
    stream = read_event_stream(spark, str(d))
    _drain(dedup_stream(stream), "deduped")
    got = spark.sql("select count(*) n, count(distinct event_id) d from deduped").first()
    n_events = load_table(spark, sf_dir, "events").count()
    assert got.n == got.d == n_events


def test_stream_static_enrichment(spark, sf_dir, stream_dir):
    dim = (
        load_table(spark, sf_dir, "events")
        .select("user_id").distinct()
        .withColumn("cohort", (F.col("user_id") % 3).cast("int"))
    )
    stream = read_event_stream(spark, stream_dir)
    _drain(enrich_with_dim(stream, dim), "enriched")
    out = spark.sql("select * from enriched")
    assert out.filter(F.col("cohort").isNull()).count() == 0
    assert out.count() == load_table(spark, sf_dir, "events").count()


def test_stream_stream_join_matches_batch_range_join(spark, sf_dir, stream_dir):
    stream = read_event_stream(spark, stream_dir)
    _drain(stream_stream_attribution(stream), "attributed")
    got = spark.sql("select count(*) n from attributed").first().n
    # batch equivalent: clicks within the hour before each purchase
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")
    )
    want = p.join(
        c,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 3600 SECONDS"))
        & (F.col("c_ts") < F.col("p_ts")),
    ).count()
    assert got == want > 0


def test_foreach_batch_layered_sink(spark, sf_dir, stream_dir, tmp_path):
    from data_pipeline_ine_spark.streaming.events import write_stream_layered

    stream = read_event_stream(spark, stream_dir).withColumn(
        "event_date", F.to_date("ts")
    )
    q = write_stream_layered(
        stream, str(tmp_path / "layer"), str(tmp_path / "ckpt"),
        partition_col="event_date",
    )
    q.awaitTermination(300)
    out = spark.read.parquet(str(tmp_path / "layer"))
    assert out.count() == load_table(spark, sf_dir, "events").count()
    # partition directories materialized by event_date
    assert any(p.name.startswith("event_date=") for p in (tmp_path / "layer").iterdir())


def test_sessionize_closes_on_gap(spark, stream_dir):
    stream = read_event_stream(spark, stream_dir)
    _drain(sessionize(stream, gap_minutes=30), "sessions")
    sessions = spark.sql("select * from sessions")
    n = sessions.count()
    # sf0.001 has ~1000 events over 30 days for 15 users → many >30min gaps
    assert n > 10
    bad = sessions.filter(F.col("session_end") < F.col("session_start")).count()
    assert bad == 0


def test_sessionize_emits_final_session_on_timeout(spark, sf_dir, tmp_path):
    """EventTimeTimeout eviction: a user whose events stop must still get
    their last session emitted once the watermark passes last+gap — and
    the state entry must not linger forever (ADVICE r1)."""
    d = tmp_path / "timeout_stream"
    d.mkdir()
    ev = load_table(spark, sf_dir, "events")
    # batch 1: one quiet user's events only; batch 2: everyone else 30 days
    # later pushes the watermark far past batch 1's gap horizon
    quiet_user = ev.select("user_id").orderBy("user_id").first().user_id
    raw = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    for name, pred in (
        ("a", F.col("user_id") == quiet_user),
        ("b", F.col("user_id") != quiet_user),
    ):
        staging = tmp_path / f"stage_{name}"
        raw.filter(pred).coalesce(1).write.parquet(str(staging))
        part = next(p for p in staging.iterdir() if p.name.endswith(".parquet"))
        shutil.copy(part, d / f"{name}.parquet")
    stream = read_event_stream(spark, str(d), max_files_per_trigger=1)
    _drain(sessionize(stream, gap_minutes=30, watermark="0 seconds"), "final_sessions")
    got = spark.sql(
        f"select * from final_sessions where user_id = {quiet_user}"
    )
    # batch equivalent: every >30min gap closes a session, plus the final one
    want = (
        ev.filter(F.col("user_id") == quiet_user)
        .select("ts")
        .sort("ts")
        .collect()
    )
    n_sessions = 1 + sum(
        1
        for a, b in zip(want, want[1:])
        if (b.ts - a.ts).total_seconds() > 1800
    )
    assert got.count() == n_sessions, (
        f"expected {n_sessions} sessions incl. the timed-out final one, "
        f"got {got.count()}"
    )


def test_sessionize_stream_matches_batch(spark, sf_dir, tmp_path):
    """Full batch/stream sessionize equivalence (VERDICT r2 task #5): the
    streamed session set — gap-closed sessions plus EventTimeTimeout-emitted
    final sessions — must exactly equal the batch window sessionization.

    Two sentinel events for one synthetic user, 100 and 200 days past the
    corpus, arrive as their own micro-batches: the first pushes the
    watermark past every real user's gap horizon so all remaining timeouts
    fire deterministically in the second's batch; the second gap-closes the
    first sentinel session so nothing depends on trailing no-data batches.
    """
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "sess_equiv"
    d.mkdir()
    shutil.copy(os.path.join(sf_dir, "events.parquet"), d / "a.parquet")
    raw = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    max_ts = raw.agg(F.max("ts")).first()[0]
    sentinel_user = -999
    for i, days in enumerate((100, 200)):
        tbl = pa.table(
            {
                "event_id": pa.array([10**9 + i], pa.int64()),
                "ts": pa.array(
                    [max_ts + datetime.timedelta(days=days)], pa.timestamp("us")
                ),
                "user_id": pa.array([sentinel_user], pa.int64()),
                "event_type": pa.array(["click"], pa.string()),
                "value": pa.array([0.0], pa.float64()),
                "props": pa.array(["{}"], pa.string()),
            }
        )
        pq.write_table(tbl, d / f"{'bc'[i]}.parquet")

    stream = read_event_stream(spark, str(d), max_files_per_trigger=1)
    _drain(sessionize(stream, gap_minutes=30, watermark="0 seconds"), "sess_equiv")
    got = {
        (r.user_id, str(r.session_start), str(r.session_end), r.n_events)
        for r in spark.sql(
            f"select * from sess_equiv where user_id != {sentinel_user}"
        ).collect()
    }

    import __spark_entry__ as contract

    batch = contract.queries()["sessionize_batch"](spark, sf_dir)
    want = {
        (r.user_id, str(r.session_start), str(r.session_end), r.n_events)
        for r in batch.collect()
    }
    assert len(got) > 10
    assert got == want


def test_stream_cdc_apply_matches_batch_merge(spark, sf_dir, tmp_path):
    """Streaming CDC apply (foreachBatch + apply_changelog + snapshot
    versions) must land on exactly the batch merge of the full changelog,
    regardless of how the changes are split into micro-batches."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from data_pipeline_ine_spark.operators.diff import apply_changelog
    from data_pipeline_ine_spark.sources.registry import load_table
    from data_pipeline_ine_spark.streaming.cdc import (
        latest_snapshot,
        stream_apply_changelog,
        write_base_snapshot,
    )

    base = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .filter(F.col("o_orderkey") % 2 == 0)
    )
    snap_dir = str(tmp_path / "snapshots")
    write_base_snapshot(base, snap_dir)

    # two micro-batches of changes; batch b carries higher seqs
    land = tmp_path / "changes"
    land.mkdir()
    keys = [r.o_orderkey for r in base.limit(30).collect()]
    batch_a = [(k, 1.0 * k, "U", 1) for k in keys[:10]] + [
        (k, 0.0, "D", 2) for k in keys[10:20]
    ]
    batch_b = [(k, 2.0 * k, "U", 3) for k in keys[:5]] + [
        (10**9 + i, 42.0, "I", 4) for i in range(5)
    ]
    for name, rows in (("a", batch_a), ("b", batch_b)):
        tbl = pa.table(
            {
                "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
                "o_totalprice": pa.array([r[1] for r in rows], pa.float64()),
                "op": pa.array([r[2] for r in rows], pa.string()),
                "seq": pa.array([r[3] for r in rows], pa.int32()),
            }
        )
        pq.write_table(tbl, land / f"{name}.parquet")

    schema = "o_orderkey long, o_totalprice double, op string, seq int"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(land))
    )
    q = stream_apply_changelog(
        stream, snap_dir, str(tmp_path / "ckpt"), ["o_orderkey"]
    )
    q.awaitTermination(300)

    all_changes = spark.createDataFrame(batch_a + batch_b, schema)
    want = {
        (r.o_orderkey, r.o_totalprice)
        for r in apply_changelog(base, all_changes, ["o_orderkey"]).collect()
    }
    got = {
        (r.o_orderkey, r.o_totalprice)
        for r in latest_snapshot(spark, snap_dir).collect()
    }
    assert got == want
    # the chain is versioned: base + one version per micro-batch
    assert len(list((tmp_path / "snapshots").iterdir())) >= 3


def test_cdc_snapshot_ignores_torn_version(spark, sf_dir, tmp_path):
    """Crash-safety (ADVICE r3): a version directory without _SUCCESS (a
    crash mid-write) must be invisible to latest_snapshot, and a replayed
    batch must skip a version that already committed."""
    import os

    from data_pipeline_ine_spark.sources.registry import load_table
    from data_pipeline_ine_spark.streaming.cdc import (
        latest_snapshot,
        write_base_snapshot,
    )

    base = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    snap_dir = str(tmp_path / "snapshots")
    write_base_snapshot(base, snap_dir)

    # torn v1: directory exists, no _SUCCESS → reader must stay on v0
    torn = tmp_path / "snapshots" / "v1"
    torn.mkdir()
    (torn / "part-00000.parquet").write_bytes(b"not parquet")
    assert latest_snapshot(spark, snap_dir).count() == base.count()

    # committed v1 → becomes latest
    base.limit(5).write.mode("overwrite").parquet(str(torn))
    assert os.path.exists(torn / "_SUCCESS")
    assert latest_snapshot(spark, snap_dir).count() == 5


def test_cdc_replay_of_committed_batch_is_skipped(spark, sf_dir, tmp_path):
    """Re-running the stream over the same changes with the SAME checkpoint
    must not corrupt or re-merge: committed versions are keyed by batch id
    and skipped on replay."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from data_pipeline_ine_spark.sources.registry import load_table
    from data_pipeline_ine_spark.streaming.cdc import (
        latest_snapshot,
        stream_apply_changelog,
        write_base_snapshot,
    )

    base = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    snap_dir = str(tmp_path / "snapshots")
    write_base_snapshot(base, snap_dir)
    land = tmp_path / "changes"
    land.mkdir()
    keys = [r.o_orderkey for r in base.limit(3).collect()]
    tbl = pa.table(
        {
            "o_orderkey": pa.array(keys, pa.int64()),
            "o_totalprice": pa.array([1.0, 2.0, 3.0], pa.float64()),
            "op": pa.array(["U"] * 3, pa.string()),
            "seq": pa.array([1, 2, 3], pa.int32()),
        }
    )
    pq.write_table(tbl, land / "a.parquet")
    schema = "o_orderkey long, o_totalprice double, op string, seq int"

    def run():
        stream = spark.readStream.schema(schema).parquet(str(land))
        q = stream_apply_changelog(
            stream, snap_dir, str(tmp_path / "ckpt"), ["o_orderkey"]
        )
        q.awaitTermination(300)

    run()
    first = sorted(
        (r.o_orderkey, r.o_totalprice)
        for r in latest_snapshot(spark, snap_dir).collect()
    )
    versions_after_first = sorted((tmp_path / "snapshots").iterdir())
    # second start on the same checkpoint: no new data → no new version;
    # snapshot unchanged
    run()
    second = sorted(
        (r.o_orderkey, r.o_totalprice)
        for r in latest_snapshot(spark, snap_dir).collect()
    )
    assert second == first
    assert sorted((tmp_path / "snapshots").iterdir()) == versions_after_first


def test_event_stream_constructs_on_empty_landing_dir(spark, tmp_path):
    """Stream construction must not fail when the landing directory has no
    files yet (ADVICE r3): falls back to the int64-nanos placeholder
    schema and handles the first files when they arrive."""
    from data_pipeline_ine_spark.streaming.events import read_event_stream

    land = tmp_path / "landing"
    land.mkdir()
    stream = read_event_stream(spark, str(land))
    assert stream.isStreaming
    assert dict(stream.dtypes)["ts"] == "timestamp"


def test_transform_with_state_topk_matches_batch(spark, sf_dir, stream_dir):
    """Spark 4 StatefulProcessor (transformWithStateInPandas): draining the
    stream must leave each user's final top-3 equal to the batch
    row_number()<=3 window over the same data. The stream emits per-batch
    snapshots; with AvailableNow + one file there is one batch, so the
    memory sink holds exactly the final state."""
    try:
        import google.protobuf  # noqa: F401
    except ImportError:
        pytest.skip(
            "transformWithState needs protobuf (state-server protocol); "
            "not available in this environment"
        )
    from pyspark.sql import Window

    from data_pipeline_ine_spark.streaming.stateful import running_topk

    stream = read_event_stream(spark, stream_dir).select("user_id", "value")
    _drain(running_topk(stream, k=3), "running_topk")
    got = {
        (r.user_id, r.rank): r.value
        for r in spark.sql("select * from running_topk").collect()
    }

    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("value"))
    batch = (
        events.select("user_id", F.col("value").cast("double").alias("value"))
        .filter(F.col("value").isNotNull())
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
    )
    want = {(r.user_id, r.rank): r.value for r in batch.collect()}
    assert len(got) > 0
    assert got.keys() == want.keys()
    for key in want:
        assert abs(got[key] - want[key]) < 1e-9, key


def test_topk_processor_logic_without_runtime():
    """The StatefulProcessor's eviction logic, exercised directly with a
    stubbed state cell (the Spark runtime path is environment-gated on
    protobuf; the per-key logic is plain pandas and testable as-is)."""
    import pandas as pd

    from data_pipeline_ine_spark.streaming.stateful import TopKProcessor

    class FakeState:
        def __init__(self):
            self._v = None

        def exists(self):
            return self._v is not None

        def get(self):
            return self._v

        def update(self, v):
            self._v = v

    class FakeHandle:
        def __init__(self):
            self.state = FakeState()

        def getValueState(self, name, schema, ttlDurationMs=None):
            return self.state

    p = TopKProcessor(k=3)
    h = FakeHandle()
    p.init(h)
    out1 = list(
        p.handleInputRows((7,), iter([pd.DataFrame({"value": [5.0, 1.0]})]), None)
    )[0]
    assert list(out1.value) == [5.0, 1.0]
    # second batch: state carries over, eviction keeps the 3 largest
    out2 = list(
        p.handleInputRows(
            (7,), iter([pd.DataFrame({"value": [9.0, 2.0, None]})]), None
        )
    )[0]
    assert list(out2.value) == [9.0, 5.0, 2.0]
    assert list(out2["rank"]) == [1, 2, 3]
    assert h.state.get() == ([9.0, 5.0, 2.0],)


def test_stream_maintained_aggregate_matches_final_snapshot(spark, sf_dir, tmp_path):
    """Streaming materialized-view maintenance: after draining a
    multi-batch CDC stream, the maintained (count, sum) aggregate must
    equal a fresh GROUP BY over the final snapshot — delta maintenance ≡
    recomputation across micro-batch boundaries too."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from data_pipeline_ine_spark.sources.registry import load_table
    from data_pipeline_ine_spark.streaming.cdc import (
        latest_aggregate,
        latest_snapshot,
        stream_maintain_aggregate,
        write_base_snapshot,
    )

    base = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .filter(F.col("o_orderkey") % 2 == 0)
    )
    snap_dir = str(tmp_path / "snapshots")
    write_base_snapshot(base, snap_dir)

    land = tmp_path / "changes"
    land.mkdir()
    keys = [r.o_orderkey for r in base.limit(30).collect()]
    batch_a = [(k, "F", 11.5, "U", 1) for k in keys[:10]] + [
        (k, "F", 0.0, "D", 2) for k in keys[10:20]
    ]
    batch_b = [(k, "P", 7.25, "U", 3) for k in keys[:5]] + [
        (10**9 + i, "X", 42.0, "I", 4) for i in range(5)
    ]
    for name, rows in (("a", batch_a), ("b", batch_b)):
        tbl = pa.table(
            {
                "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
                "o_orderstatus": pa.array([r[1] for r in rows], pa.string()),
                "o_totalprice": pa.array([r[2] for r in rows], pa.float64()),
                "op": pa.array([r[3] for r in rows], pa.string()),
                "seq": pa.array([r[4] for r in rows], pa.int32()),
            }
        )
        pq.write_table(tbl, land / f"{name}.parquet")

    schema = (
        "o_orderkey long, o_orderstatus string, o_totalprice double, "
        "op string, seq int"
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(land))
    )
    q = stream_maintain_aggregate(
        stream, snap_dir, str(tmp_path / "agg"), str(tmp_path / "ckpt"),
        ["o_orderkey"], "o_orderstatus", "o_totalprice",
    )
    q.awaitTermination(300)

    got = {
        (r.o_orderstatus, r.n_rows, r.value_sum)
        for r in latest_aggregate(spark, str(tmp_path / "agg")).collect()
    }
    final = latest_snapshot(spark, snap_dir)
    want = {
        (r.o_orderstatus, r.n, r.s)
        for r in final.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double"), 2
            ).alias("s"),
        )
        .collect()
    }
    assert got == want
    assert {"X"} <= {g for g, _, _ in got}  # batch-b inserts visible


def test_stream_maintained_aggregate_survives_torn_agg_version(spark, tmp_path):
    """Crash window: the aggregate version commits but the snapshot write
    dies. On replay the stored side must be the aggregate AT the current
    snapshot's version — pairing 'latest agg' with the older snapshot
    would re-apply the batch delta onto an aggregate that already
    contains it. A sentinel torn agg v1 proves the replay recomputes
    rather than trusts it."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from data_pipeline_ine_spark.streaming.cdc import (
        latest_aggregate,
        stream_maintain_aggregate,
        write_base_snapshot,
    )

    base = spark.createDataFrame(
        [(k, "g", 1.0) for k in range(10)],
        "o_orderkey long, o_orderstatus string, o_totalprice double",
    )
    snap_dir = str(tmp_path / "snapshots")
    write_base_snapshot(base, snap_dir)

    # plant the torn state: agg v1 committed (with a sentinel value no
    # correct computation would produce), snapshot still at v0
    agg_dir = tmp_path / "agg"
    torn = agg_dir / "v1"
    torn.mkdir(parents=True)
    pq.write_table(
        pa.table(
            {
                "o_orderstatus": pa.array(["g"]),
                "n_rows": pa.array([999], pa.int64()),
                "value_sum": pa.array([999.0]),
                "value_sum_exact": pa.array([999.0]),
            }
        ),
        torn / "part-0.parquet",
    )
    (torn / "_SUCCESS").touch()

    land = tmp_path / "changes"
    land.mkdir()
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([100], pa.int64()),
                "o_orderstatus": pa.array(["g"]),
                "o_totalprice": pa.array([5.0]),
                "op": pa.array(["I"]),
                "seq": pa.array([1], pa.int32()),
            }
        ),
        land / "a.parquet",
    )
    stream = spark.readStream.schema(
        "o_orderkey long, o_orderstatus string, o_totalprice double, "
        "op string, seq int"
    ).parquet(str(land))
    q = stream_maintain_aggregate(
        stream, snap_dir, str(agg_dir), str(tmp_path / "ckpt"),
        ["o_orderkey"], "o_orderstatus", "o_totalprice",
    )
    q.awaitTermination(300)

    got = latest_aggregate(spark, str(agg_dir)).collect()
    assert len(got) == 1
    # correct: 10 base rows + 1 insert = 11 rows, sum 15.0 — the sentinel
    # must have been recomputed away, not delta-merged into (which would
    # give 1000/1004.0)
    assert (got[0].n_rows, got[0].value_sum) == (11, 15.0)


def test_stream_maintained_aggregate_restarts_from_mid_stream_kill(
    spark, tmp_path
):
    """Live restart: kill the maintenance query between micro-batches
    (not a planted torn version — an actual stop mid-drain), restart
    from the same checkpoint, and assert the final aggregate equals a
    recompute over the final snapshot. Complements the torn-agg replay
    test: this drives the real checkpoint/offset-log recovery path."""
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from data_pipeline_ine_spark.streaming.cdc import (
        latest_aggregate,
        latest_snapshot,
        stream_maintain_aggregate,
        write_base_snapshot,
    )

    base = spark.createDataFrame(
        [(k, "g" if k % 2 else "h", float(k)) for k in range(40)],
        "o_orderkey long, o_orderstatus string, o_totalprice double",
    )
    snap_dir = str(tmp_path / "snapshots")
    write_base_snapshot(base, snap_dir)

    land = tmp_path / "changes"
    land.mkdir()
    batches = [
        [(k, "g", 100.0, "U", 1) for k in range(0, 10)],
        [(k, "h", 0.0, "D", 2) for k in range(10, 20)],
        [(1000 + i, "x", 7.0, "I", 3) for i in range(10)],
    ]
    def write_batch(i):
        rows = batches[i]
        pq.write_table(
            pa.table(
                {
                    "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
                    "o_orderstatus": pa.array([r[1] for r in rows]),
                    "o_totalprice": pa.array([r[2] for r in rows]),
                    "op": pa.array([r[3] for r in rows]),
                    "seq": pa.array([r[4] for r in rows], pa.int32()),
                }
            ),
            land / f"b{i}.parquet",
        )

    # the third batch lands only AFTER the kill, so run 1 provably stops
    # mid-stream (deterministic, no stop-vs-drain race)
    write_batch(0)
    write_batch(1)

    schema = (
        "o_orderkey long, o_orderstatus string, o_totalprice double, "
        "op string, seq int"
    )

    def start():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(land))
        )
        return stream_maintain_aggregate(
            stream, snap_dir, str(tmp_path / "agg"), str(tmp_path / "ckpt"),
            ["o_orderkey"], "o_orderstatus", "o_totalprice",
        )

    # run 1: kill as soon as the first aggregate version commits
    q = start()
    deadline = time.time() + 120
    first = tmp_path / "agg" / "v1" / "_SUCCESS"
    while time.time() < deadline and not first.exists():
        time.sleep(0.05)
    assert first.exists(), "first micro-batch never committed"
    q.stop()
    q.awaitTermination(60)
    # provably mid-stream: the third batch does not even exist yet
    committed = {p.parent.name for p in (tmp_path / "agg").glob("v*/_SUCCESS")}
    assert len(committed) <= 2
    write_batch(2)

    # run 2: restart from the same checkpoint; drain the rest
    q = start()
    q.awaitTermination(300)

    got = {
        (r.o_orderstatus, r.n_rows, r.value_sum)
        for r in latest_aggregate(spark, str(tmp_path / "agg")).collect()
    }
    final = latest_snapshot(spark, snap_dir)
    want = {
        (r.g, r.n, r.s)
        for r in final.groupBy(F.col("o_orderstatus").alias("g"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast(
                    "double"
                ),
                2,
            ).alias("s"),
        )
        .collect()
    }
    assert got == want
    assert {"x"} <= {g for g, _, _ in got}  # last batch's inserts present


def test_stream_dedup_corpus_matches_sequential_batches(spark, tmp_path):
    """Streaming corpus dedup ≡ sequential per-batch application of the
    same pure function: cross-batch near-dups are dropped against the
    ADVANCED corpus (a doc admitted in batch 0 blocks its near-dup in
    batch 1), within-batch clusters collapse to the min-id rep, and the
    final corpus version equals the batch-sequential reference."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from data_pipeline_ine_spark.streaming.cdc import (
        latest_snapshot,
        write_base_snapshot,
    )
    from data_pipeline_ine_spark.streaming.dedup import (
        dedup_batch_against_corpus,
        stream_dedup_corpus,
    )

    base_docs = [
        (1, "the quick brown fox jumps over the lazy sleeping dog"),
        (2, "spark shuffles partition data across the cluster network fabric"),
        (3, "completely unrelated text about cooking pasta with garlic butter"),
    ]
    batches = [
        [
            # near-dup of corpus doc 1 -> dropped
            (10, "the quick brown fox jumps over the lazy sleeping cat"),
            # novel -> kept
            (11, "gradient descent updates model weights using batch statistics"),
            # within-batch near-dup cluster {12, 13} -> 12 kept
            (12, "tokenizers split raw text into subword units for models"),
            (13, "tokenizers split raw text into subword units for training"),
        ],
        [
            # near-dup of doc 11 (admitted LAST batch) -> dropped only if
            # the corpus advanced between batches
            (20, "gradient descent updates model weights using mini statistics"),
            # novel -> kept
            (21, "vector databases index embeddings for nearest neighbor search"),
        ],
    ]

    schema = "doc_id long, text string"
    corpus_dir = str(tmp_path / "corpus")
    write_base_snapshot(spark.createDataFrame(base_docs, schema), corpus_dir)

    land = tmp_path / "landing"
    land.mkdir()
    for i, rows in enumerate(batches):
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                    "text": pa.array([r[1] for r in rows]),
                }
            ),
            land / f"b{i}.parquet",
        )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(land))
    )
    q = stream_dedup_corpus(
        stream, corpus_dir, str(tmp_path / "ckpt")
    )
    q.awaitTermination(300)

    got = sorted(
        r.doc_id for r in latest_snapshot(spark, corpus_dir).collect()
    )

    # sequential reference through the SAME pure per-batch function
    ref = spark.createDataFrame(base_docs, schema)
    for rows in batches:
        batch = spark.createDataFrame(rows, schema)
        ref = ref.unionByName(dedup_batch_against_corpus(batch, ref))
    want = sorted(r.doc_id for r in ref.collect())

    assert got == want
    # pin the planted semantics so the reference itself can't silently rot
    assert got == [1, 2, 3, 11, 12, 21]


def test_raw_text_to_streaming_dedup_pipeline(spark, tmp_path):
    """End-to-end ingestion: raw text dumps -> read_text_corpus shape ->
    file stream -> stream_dedup_corpus. The full front door of a
    training-data pipeline: content-addressed ids, near-dup admission
    against the advancing corpus, versioned snapshots."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from data_pipeline_ine_spark.sources.rawtext import read_text_corpus
    from data_pipeline_ine_spark.streaming.cdc import (
        latest_snapshot,
        write_base_snapshot,
    )
    from data_pipeline_ine_spark.streaming.dedup import stream_dedup_corpus

    # seed corpus from a raw-text dump via the batch source
    dump = tmp_path / "dump"
    dump.mkdir()
    (dump / "seed.txt").write_text(
        "the quick brown fox jumps over the lazy sleeping dog\n"
        "spark shuffles partition data across the cluster network fabric\n"
    )
    seed = read_text_corpus(spark, str(dump)).select("doc_id", "text")
    corpus_dir = str(tmp_path / "corpus")
    write_base_snapshot(seed, corpus_dir)
    seed_ids = {r.doc_id for r in seed.collect()}

    # stream two landing batches: one near-dup of a seed line, one novel
    land = tmp_path / "landing"
    land.mkdir()
    batches = [
        [(900, "the quick brown fox jumps over the lazy sleeping cat")],
        [(901, "vector databases index embeddings for nearest neighbor search")],
    ]
    for i, rows in enumerate(batches):
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                    "text": pa.array([r[1] for r in rows]),
                }
            ),
            land / f"b{i}.parquet",
        )
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(land))
    )
    q = stream_dedup_corpus(stream, corpus_dir, str(tmp_path / "ckpt"))
    q.awaitTermination(300)

    final = {r.doc_id for r in latest_snapshot(spark, corpus_dir).collect()}
    assert final == seed_ids | {901}  # near-dup 900 rejected, novel kept


def test_stream_drift_monitor_matches_batch_reports(spark, tmp_path):
    """Streaming drift ≡ per-batch application of distribution_drift
    against the frozen reference: an in-distribution batch reports flat
    chi2, a shifted batch lights up, and per-batch reports land under
    idempotent batch_id partitions."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from data_pipeline_ine_spark.operators.quality import distribution_drift
    from data_pipeline_ine_spark.streaming.quality import (
        read_drift_reports,
        stream_drift_monitor,
    )

    ref = spark.createDataFrame(
        [(float(i),) for i in range(1000)], "value double"
    )
    batches = [
        [float(i) for i in range(0, 1000, 3)],      # in-distribution
        [float(i) + 900.0 for i in range(400)],     # shifted right
    ]
    land = tmp_path / "landing"
    land.mkdir()
    for i, vals in enumerate(batches):
        pq.write_table(pa.table({"value": pa.array(vals)}), land / f"b{i}.parquet")

    stream = (
        spark.readStream.schema("value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(land))
    )
    q = stream_drift_monitor(
        stream, ref, str(tmp_path / "reports"), str(tmp_path / "ckpt")
    )
    q.awaitTermination(300)

    reports = read_drift_reports(spark, str(tmp_path / "reports"))
    got = {
        (r.batch_id, r.bucket): (r.ref_n, r.cur_n, r.chi2)
        for r in reports.collect()
    }
    # batch-wise reference application must match exactly
    for bid, vals in enumerate(batches):
        cur = spark.createDataFrame([(v,) for v in vals], "value double")
        for r in distribution_drift(ref, cur, "value").collect():
            assert got[(bid, r.bucket)] == (r.ref_n, r.cur_n, r.chi2), (bid, r.bucket)
    # in-distribution batch is flat-ish; the shifted batch's top bucket spikes
    chi_b0 = max(v[2] for (b, _), v in got.items() if b == 0)
    chi_b1 = max(v[2] for (b, _), v in got.items() if b == 1)
    assert chi_b1 > 10 * max(chi_b0, 0.1)


def test_stream_cms_equals_batch_sketch_and_replays_skip(spark, sf_dir, tmp_path):
    """Streaming CMS maintenance: after draining a 2-micro-batch stream,
    the committed sketch must equal ONE batch cms_build over all events
    (the cell-wise merge law end-to-end), and re-running the drained
    stream against the same checkpoint must commit nothing new."""
    from data_pipeline_ine_spark.operators.sketches import cms_build
    from data_pipeline_ine_spark.streaming.cdc import (
        latest_snapshot,
        stream_maintain_cms,
    )

    d = tmp_path / "cms_land"
    d.mkdir()
    raw = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    for name, pred in (
        ("a", F.col("event_id") % 2 == 0),
        ("b", F.col("event_id") % 2 == 1),
    ):
        staging = tmp_path / f"cms_stage_{name}"
        raw.filter(pred).coalesce(1).write.parquet(str(staging))
        part = next(p for p in staging.iterdir() if p.name.endswith(".parquet"))
        shutil.copy(part, d / f"{name}.parquet")

    sketch_dir = str(tmp_path / "cms_sketch")
    ckpt = str(tmp_path / "cms_ckpt")
    stream = read_event_stream(spark, str(d), max_files_per_trigger=1)
    stream_maintain_cms(stream, sketch_dir, ckpt, "user_id").awaitTermination()

    versions = sorted(os.listdir(sketch_dir))
    assert versions == ["v1", "v2"], versions

    ev = load_table(spark, sf_dir, "events")
    whole = cms_build(ev, "user_id")
    merged = latest_snapshot(spark, sketch_dir)
    diff = (
        merged.exceptAll(whole).count() + whole.exceptAll(merged).count()
    )
    assert diff == 0

    # drained replay: same checkpoint, no new files → no new versions,
    # committed versions untouched (mtime probe)
    mtimes = {
        v: os.path.getmtime(os.path.join(sketch_dir, v, "_SUCCESS"))
        for v in versions
    }
    stream2 = read_event_stream(spark, str(d), max_files_per_trigger=1)
    stream_maintain_cms(stream2, sketch_dir, ckpt, "user_id").awaitTermination()
    assert sorted(os.listdir(sketch_dir)) == ["v1", "v2"]
    for v, t in mtimes.items():
        assert os.path.getmtime(os.path.join(sketch_dir, v, "_SUCCESS")) == t


def test_stream_exact_dedup_bloom_gated_matches_sequential(spark, tmp_path):
    """Bloom-gated exact-dedup admission ≡ the sequential per-batch
    reference: cross-batch exact dups rejected against the advancing
    fingerprint state, within-batch dups collapse to min id, and the
    final bloom equals a one-shot build over everything admitted (the
    merge law holding THROUGH the stream)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from data_pipeline_ine_spark.operators.sketches import bloom_build
    from data_pipeline_ine_spark.streaming.cdc import (
        latest_snapshot,
        write_base_snapshot,
    )
    from data_pipeline_ine_spark.streaming.dedup import (
        exact_dedup_batch,
        stream_exact_dedup,
    )

    schema = "doc_id long, text string"
    batches = [
        [(1, "alpha"), (2, "beta"), (3, "alpha")],       # 3 dups 1 in-batch
        [(10, "alpha"), (11, "gamma"), (12, "gamma")],   # 10 dups batch-0
        [(20, "beta"), (21, "delta")],                   # 20 dups batch-0
    ]
    state = str(tmp_path / "state")
    empty = spark.createDataFrame([], schema)
    write_base_snapshot(
        empty.select(F.md5("text").alias("_fp")), f"{state}/fps"
    )
    write_base_snapshot(
        bloom_build(empty.withColumn("_g", F.lit("corpus")), "text",
                    group_col="_g"),
        f"{state}/bloom",
    )

    land = tmp_path / "landing"
    land.mkdir()
    for i, rows in enumerate(batches):
        pq.write_table(
            pa.table({
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows]),
            }),
            land / f"b{i}.parquet",
        )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(land))
    )
    q = stream_exact_dedup(stream, state, str(tmp_path / "ckpt"))
    q.awaitTermination(300)

    admitted = []
    for v in sorted((tmp_path / "state" / "admitted").iterdir()):
        admitted += [
            r.doc_id for r in spark.read.parquet(str(v)).collect()
        ]
    assert sorted(admitted) == [1, 2, 11, 21]

    # sequential reference through the SAME pure function
    fps = empty.select(F.md5("text").alias("_fp"))
    bloom = bloom_build(
        empty.withColumn("_g", F.lit("corpus")), "text", group_col="_g"
    )
    ref_ids = []
    for rows in batches:
        b = spark.createDataFrame(rows, schema)
        adm = exact_dedup_batch(b, fps, bloom)
        ref_ids += [r.doc_id for r in adm.select("doc_id").collect()]
        fps = fps.unionByName(adm.select("_fp"))
        # the bloom must advance in lock-step with fps (the documented
        # invariant) — a stale bloom would leak dups past the confirm
        bloom = (
            bloom.unionByName(
                bloom_build(
                    b.join(adm.select("doc_id"), "doc_id", "left_semi")
                    .withColumn("_g", F.lit("corpus")),
                    "text", group_col="_g",
                )
            )
            .groupBy("_g", "word_idx")
            .agg(F.bit_or("word").alias("word"))
        )
    assert sorted(admitted) == sorted(ref_ids)

    # bloom state law: stream-final bloom == one-shot build over admitted
    final_bloom = latest_snapshot(spark, f"{state}/bloom")
    all_admitted = spark.createDataFrame(
        [r for rows in batches for r in rows if r[0] in set(admitted)],
        schema,
    ).withColumn("_g", F.lit("corpus"))
    want_bloom = bloom_build(all_admitted, "text", group_col="_g")
    diff = (
        final_bloom.exceptAll(want_bloom).count()
        + want_bloom.exceptAll(final_bloom).count()
    )
    assert diff == 0

    # final fps state matches the admitted set exactly
    final_fps = latest_snapshot(spark, f"{state}/fps")
    assert final_fps.count() == 4 and final_fps.distinct().count() == 4


def test_time_travel_reads_any_committed_version(spark, tmp_path):
    """read_version: exact per-version contents, latest by default,
    torn versions invisible, helpful error for unknown/vacuumed ones."""
    import os

    import pytest

    from data_pipeline_ine_spark.streaming.cdc import (
        history,
        read_version,
        write_base_snapshot,
    )

    d = str(tmp_path / "chain")
    write_base_snapshot(spark.range(3), d)
    spark.range(5).write.parquet(f"{d}/v1")
    spark.range(7).write.parquet(f"{d}/v2")
    # torn write: v3 exists but never committed
    os.makedirs(f"{d}/v3")

    assert read_version(spark, d, 0).count() == 3
    assert read_version(spark, d, 1).count() == 5
    assert read_version(spark, d).count() == 7          # latest = v2
    assert [h["version"] for h in history(d)] == [0, 1, 2]
    with pytest.raises(ValueError, match=r"available: \[0, 1, 2\]"):
        read_version(spark, d, 3)
    with pytest.raises(FileNotFoundError):
        read_version(spark, str(tmp_path / "nope"))


def test_stream_exact_dedup_replay_is_exactly_once(spark, tmp_path):
    """Checkpoint loss forces a full source replay with the same batch
    ids: every committed version must no-op (committed versions are
    never rewritten) and the final fps/bloom/admitted state must be
    byte-for-byte what the first run left."""
    import hashlib
    import os
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    from data_pipeline_ine_spark.operators.sketches import bloom_build
    from data_pipeline_ine_spark.streaming.cdc import write_base_snapshot
    from data_pipeline_ine_spark.streaming.dedup import stream_exact_dedup

    schema = "doc_id long, text string"
    state = str(tmp_path / "state")
    empty = spark.createDataFrame([], schema)
    write_base_snapshot(
        empty.select(F.md5("text").alias("_fp")), f"{state}/fps"
    )
    write_base_snapshot(
        bloom_build(empty.withColumn("_g", F.lit("corpus")), "text",
                    group_col="_g"),
        f"{state}/bloom",
    )
    land = tmp_path / "landing"
    land.mkdir()
    for i, rows in enumerate([[(1, "a"), (2, "b")], [(3, "a"), (4, "c")]]):
        pq.write_table(
            pa.table({
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows]),
            }),
            land / f"b{i}.parquet",
        )

    def run(ckpt):
        q = stream_exact_dedup(
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1).parquet(str(land)),
            state, str(tmp_path / ckpt),
        )
        q.awaitTermination(300)

    def fingerprint():
        sums = {}
        for sub in ("fps", "bloom", "admitted"):
            for root, _, files in os.walk(os.path.join(state, sub)):
                for f in sorted(files):
                    p = os.path.join(root, f)
                    if f.endswith(".parquet"):
                        sums[os.path.relpath(p, state)] = hashlib.md5(
                            open(p, "rb").read()
                        ).hexdigest()
        return sums

    run("ckpt1")
    before = fingerprint()
    # simulate checkpoint loss: everything replays with the same ids
    run("ckpt2")
    assert fingerprint() == before


def test_stream_exact_dedup_survives_bloom_ahead_crash(spark, tmp_path):
    """ADVICE r5 (medium): crash AFTER the bloom v{N+1} commit but
    BEFORE the fps v{N+1} commit — the discipline's own target window.
    The replay must not read the bloom path it is about to overwrite
    (pre-fix: Spark 'Cannot overwrite a path that is also being read
    from' on every restart); with the lock-step as-of read it replays
    the batch against the v{N} state pair, skips the already-committed
    bloom write, and converges to exactly the healthy end state."""
    import hashlib
    import os
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    from data_pipeline_ine_spark.operators.sketches import bloom_build
    from data_pipeline_ine_spark.streaming.cdc import write_base_snapshot
    from data_pipeline_ine_spark.streaming.dedup import stream_exact_dedup

    schema = "doc_id long, text string"
    state = str(tmp_path / "state")
    empty = spark.createDataFrame([], schema)
    write_base_snapshot(
        empty.select(F.md5("text").alias("_fp")), f"{state}/fps"
    )
    write_base_snapshot(
        bloom_build(empty.withColumn("_g", F.lit("corpus")), "text",
                    group_col="_g"),
        f"{state}/bloom",
    )
    land = tmp_path / "landing"
    land.mkdir()
    for i, rows in enumerate([[(1, "a"), (2, "b")], [(3, "a"), (4, "c")]]):
        pq.write_table(
            pa.table({
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows]),
            }),
            land / f"b{i}.parquet",
        )

    def run(ckpt):
        q = stream_exact_dedup(
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1).parquet(str(land)),
            state, str(tmp_path / ckpt),
        )
        q.awaitTermination(300)

    def fingerprint():
        # content-level: the fps v2 rewrite mints fresh part-file UUIDs,
        # so key by version dir and compare sorted content hashes
        sums = {}
        for sub in ("fps", "bloom", "admitted"):
            for root, _, files in os.walk(os.path.join(state, sub)):
                hashes = sorted(
                    hashlib.md5(
                        open(os.path.join(root, f), "rb").read()
                    ).hexdigest()
                    for f in files
                    if f.endswith(".parquet")
                )
                if hashes:
                    sums[os.path.relpath(root, state)] = hashes
        return sums

    run("ckpt1")
    healthy = fingerprint()

    # surgically reopen the crash window: bloom v2 committed, fps v2 not
    shutil.rmtree(os.path.join(state, "fps", "v2"))
    assert os.path.exists(os.path.join(state, "bloom", "v2", "_SUCCESS"))

    run("ckpt2")  # full source replay with the same batch ids
    assert fingerprint() == healthy


def test_exact_dedup_batch_drops_null_text(spark):
    """ADVICE r5: md5(NULL) is NULL — pre-fix, NULL-text docs were
    admitted in EVERY batch (the anti-join confirm can't match NULL)
    and NULL fingerprints accumulated in state. They are now dropped at
    the door."""
    from data_pipeline_ine_spark.operators.sketches import bloom_build
    from data_pipeline_ine_spark.streaming.dedup import exact_dedup_batch

    schema = "doc_id long, text string"
    empty = spark.createDataFrame([], schema)
    fps = empty.select(F.md5("text").alias("_fp"))
    bloom = bloom_build(
        empty.withColumn("_g", F.lit("corpus")), "text", group_col="_g"
    )
    batch = spark.createDataFrame(
        [(1, "a"), (2, None), (3, None), (4, "b")], schema
    )
    admitted = exact_dedup_batch(batch, fps, bloom)
    rows = admitted.collect()
    assert sorted(r.doc_id for r in rows) == [1, 4]
    assert all(r._fp is not None for r in rows)


def test_stream_rolling_wau_matches_batch_recompute(spark, tmp_path):
    """The incrementally-maintained rolling WAU must equal
    rolling_distinct_users over ALL events after every batch is
    drained — including duplicate (user, day) arrivals across
    batches — and a full checkpoint-loss replay must converge to the
    identical state."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from data_pipeline_ine_spark.operators.timeseries import (
        rolling_distinct_users,
    )
    from data_pipeline_ine_spark.streaming.cdc import (
        latest_snapshot,
        stream_maintain_rolling_wau,
        write_base_snapshot,
    )

    def ts(day, hour=10):
        return 1704067200_000_000 + (day * 24 + hour) * 3600 * 1_000_000

    batches = [
        [(1, ts(0)), (2, ts(0)), (1, ts(2))],
        [(1, ts(0, 12)), (3, ts(3)), (2, ts(9))],      # dup (1, day0)
        [(1, ts(9)), (3, ts(15))],
    ]
    land = tmp_path / "landing"
    land.mkdir()
    for i, rows in enumerate(batches):
        pq.write_table(
            pa.table({
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows],
                               pa.timestamp("us")),
            }),
            land / f"b{i}.parquet",
        )
    state = tmp_path / "state"
    empty_act = spark.createDataFrame([], "user_id long, day date")
    empty_wau = spark.createDataFrame([], "day date, users_7d long")
    write_base_snapshot(empty_act, str(state / "activity"))
    write_base_snapshot(empty_wau, str(state / "wau"))

    def run(ckpt):
        q = stream_maintain_rolling_wau(
            spark.readStream.schema("user_id long, ts timestamp_ntz")
            .option("maxFilesPerTrigger", 1).parquet(str(land)),
            str(state / "activity"), str(state / "wau"),
            str(tmp_path / ckpt),
        )
        q.awaitTermination(300)

    run("ckpt1")
    got = {
        str(r.day): r.users_7d
        for r in latest_snapshot(spark, str(state / "wau")).collect()
    }
    all_events = spark.createDataFrame(
        [r for rows in batches for r in rows], "user_id long, ts long"
    ).select("user_id",
             F.timestamp_micros(F.col("ts")).alias("ts"))
    want = {
        str(r.day): r.users_7d
        for r in rolling_distinct_users(all_events, "ts", "user_id", 7)
        .collect()
    }
    assert got == want

    # checkpoint loss: full replay must be a committed-version no-op
    before = sorted(
        tuple(r) for r in latest_snapshot(spark, str(state / "wau")).collect()
    )
    run("ckpt2")
    after = sorted(
        tuple(r) for r in latest_snapshot(spark, str(state / "wau")).collect()
    )
    assert after == before


def test_stream_cusum_matches_imperative_and_replays(spark, tmp_path):
    """The streamed CUSUM surface after draining all batches equals the
    textbook max(0, S+x-mu-k) loop over the merged daily totals —
    including a late event landing on an already-seen day — and a
    checkpoint-loss replay converges to the identical state (the
    version-matched cusum-first/daily-last discipline)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from data_pipeline_ine_spark.streaming.cdc import (
        latest_snapshot,
        write_base_snapshot,
    )
    from data_pipeline_ine_spark.streaming.quality import (
        stream_maintain_cusum,
    )

    def ts(day, hour=10):
        return 1704067200_000_000 + (day * 24 + hour) * 3600 * 1_000_000

    MU = 1000  # fixed in-control baseline, cents/day
    batches = [
        [(ts(0), 10.00), (ts(1), 10.25)],
        [(ts(1, 12), 0.50), (ts(2), 14.00)],   # late add to day 1
        [(ts(3), 14.00), (ts(4), 14.00)],      # sustained drift
    ]
    land = tmp_path / "landing"
    land.mkdir()
    for i, rows in enumerate(batches):
        pq.write_table(
            pa.table({
                "ts": pa.array([r[0] for r in rows], pa.timestamp("us")),
                "value": pa.array([r[1] for r in rows], pa.float64()),
            }),
            land / f"b{i}.parquet",
        )
    state = tmp_path / "state"
    write_base_snapshot(
        spark.createDataFrame([], "day date, x_cents long"),
        str(state / "daily"),
    )
    write_base_snapshot(
        spark.createDataFrame(
            [], "day date, x_cents long, s_cents long, alarm long"
        ),
        str(state / "cusum"),
    )

    def run(ckpt):
        q = stream_maintain_cusum(
            spark.readStream.schema("ts timestamp_ntz, value double")
            .option("maxFilesPerTrigger", 1).parquet(str(land)),
            str(state / "daily"), str(state / "cusum"),
            str(tmp_path / ckpt), mu_cents=MU,
        )
        q.awaitTermination(300)

    run("ckpt1")
    got = {
        str(r.day): (r.x_cents, r.s_cents, r.alarm)
        for r in latest_snapshot(spark, str(state / "cusum")).collect()
    }
    # imperative reference over merged daily cents
    daily = {0: 1000, 1: 1075, 2: 1400, 3: 1400, 4: 1400}
    k, h, s = (MU * 50) // 1000, (MU * 200) // 1000, 0
    for d in sorted(daily):
        s = max(0, s + daily[d] - MU - k)
        day = f"2024-01-{d + 1:02d}"
        assert got[day] == (daily[d], s, 1 if s > h else 0), day
    assert got["2024-01-05"][2] == 1  # sustained drift alarms by day 5

    before = sorted(got.items())
    run("ckpt2")  # checkpoint loss: full replay is a committed no-op
    after = sorted(
        (str(r.day), (r.x_cents, r.s_cents, r.alarm))
        for r in latest_snapshot(spark, str(state / "cusum")).collect()
    )
    assert after == before


def test_stream_stream_attribution_matches_batch_range_join(
    spark, tmp_path
):
    """Stream-stream inner join with both-side watermarks over two
    landing directories equals the batch windowed_range_join on the
    same data — including a click that arrives in a LATER micro-batch
    than its purchase (the case a naive per-batch join drops: buffered
    stream-stream state must hold the purchase until the click side's
    watermark passes)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from data_pipeline_ine_spark.operators.joins import windowed_range_join
    from data_pipeline_ine_spark.streaming.joins import (
        stream_purchase_attribution,
    )

    def ts(minute):
        return 1704103200_000_000 + minute * 60 * 1_000_000  # 10:00 base

    purchase_batches = [
        [(100, 1, ts(60))],                # user 1 buys at 11:00
        [(101, 2, ts(90))],                # user 2 buys at 11:30
    ]
    click_batches = [
        [(1, ts(30), 2.0), (2, ts(20), 3.0)],   # in-window for both
        [(1, ts(59), 5.0), (2, ts(89), 7.0),    # late-arriving clicks
         (1, ts(61), 9.0)],                      # AFTER purchase: no match
    ]
    pland = tmp_path / "purchases"
    cland = tmp_path / "clicks"
    pland.mkdir(), cland.mkdir()
    for i, rows in enumerate(purchase_batches):
        pq.write_table(
            pa.table({
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "user_id": pa.array([r[1] for r in rows], pa.int64()),
                "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
            }),
            pland / f"b{i}.parquet",
        )
    for i, rows in enumerate(click_batches):
        pq.write_table(
            pa.table({
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "click_ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "click_value": pa.array([r[2] for r in rows], pa.float64()),
            }),
            cland / f"b{i}.parquet",
        )
    q = stream_purchase_attribution(
        spark.readStream.schema("event_id long, user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1).parquet(str(pland)),
        spark.readStream.schema(
            "user_id long, click_ts timestamp, click_value double"
        ).option("maxFilesPerTrigger", 1).parquet(str(cland)),
        str(tmp_path / "out"), str(tmp_path / "ckpt"),
    )
    q.awaitTermination(300)
    got = sorted(
        (r.purchase_id, r.user_id, r.click_value)
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    )
    purchases = spark.createDataFrame(
        [r for b in purchase_batches for r in b],
        "event_id long, user_id long, ts long",
    ).select("event_id", "user_id", F.timestamp_micros("ts").alias("ts"))
    clicks = spark.createDataFrame(
        [r for b in click_batches for r in b],
        "user_id long, click_ts long, click_value double",
    ).select(
        "user_id", F.timestamp_micros("click_ts").alias("click_ts"),
        "click_value",
    )
    want = sorted(
        (r.event_id, r.user_id, r.click_value)
        for r in windowed_range_join(
            purchases, clicks, on="user_id", left_ts="ts",
            right_ts="click_ts", window_seconds=3600,
        ).collect()
    )
    assert got == want
    assert (100, 1, 9.0) not in got  # post-purchase click excluded
    assert (100, 1, 5.0) in got      # late-batch click still attributed


def test_stream_cusum_alarm_transitions_parity_across_restart(
    spark, tmp_path
):
    """The alert sink (alarms_dir): streamed alarm TRANSITIONS — with a
    restart mid-stream (same checkpoint, new files landing between the
    two runs) — must equal the transitions derived from the one-shot
    batch CUSUM over all the data, and a checkpoint-loss replay must
    leave them unchanged (version-matched commit discipline)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from data_pipeline_ine_spark.streaming.cdc import (
        latest_snapshot,
        write_base_snapshot,
    )
    from data_pipeline_ine_spark.streaming.quality import (
        alarm_transitions,
        maintain_cusum_batch,
        stream_maintain_cusum,
    )

    def ts(day, hour=10):
        return 1704067200_000_000 + (day * 24 + hour) * 3600 * 1_000_000

    MU = 1000
    # drift raises the alarm by day 2, recovery clears it on day 5,
    # second drift raises again on day 7 — two raise edges, one clear
    batches = [
        [(ts(0), 14.00), (ts(1), 14.00)],
        [(ts(2), 14.00), (ts(3), 14.00)],
        [(ts(4), 2.00), (ts(5), 2.00)],
        [(ts(6), 20.00), (ts(7), 20.00)],
    ]
    land = tmp_path / "landing"
    land.mkdir()

    def write_batch(i, rows):
        pq.write_table(
            pa.table({
                "ts": pa.array([r[0] for r in rows], pa.timestamp("us")),
                "value": pa.array([r[1] for r in rows], pa.float64()),
            }),
            land / f"b{i}.parquet",
        )

    state = tmp_path / "state"
    write_base_snapshot(
        spark.createDataFrame([], "day date, x_cents long"),
        str(state / "daily"),
    )
    write_base_snapshot(
        spark.createDataFrame(
            [], "day date, x_cents long, s_cents long, alarm long"
        ),
        str(state / "cusum"),
    )
    write_base_snapshot(
        spark.createDataFrame(
            [], "day date, transition string, s_cents long"
        ),
        str(state / "alarms"),
    )

    def run(ckpt):
        q = stream_maintain_cusum(
            spark.readStream.schema("ts timestamp_ntz, value double")
            .option("maxFilesPerTrigger", 1).parquet(str(land)),
            str(state / "daily"), str(state / "cusum"),
            str(tmp_path / ckpt), mu_cents=MU,
            alarms_dir=str(state / "alarms"),
        )
        q.awaitTermination(300)

    # first two batches, then RESTART (same checkpoint) on the rest
    for i in (0, 1):
        write_batch(i, batches[i])
    run("ckpt1")
    for i in (2, 3):
        write_batch(i, batches[i])
    run("ckpt1")

    streamed = sorted(
        (str(r.day), r.transition, r.s_cents)
        for r in latest_snapshot(spark, str(state / "alarms")).collect()
    )
    # batch reference: the whole history as ONE batch from empty state
    import datetime as dt

    all_rows = [r for b in batches for r in b]
    one = spark.createDataFrame(
        [
            (
                dt.datetime.fromtimestamp(
                    r[0] // 1_000_000, dt.timezone.utc
                ).replace(tzinfo=None),
                r[1],
            )
            for r in all_rows
        ],
        "ts timestamp_ntz, value double",
    )
    _, cusum = maintain_cusum_batch(
        one, spark.createDataFrame([], "day date, x_cents long"), MU
    )
    batch_ref = sorted(
        (str(r.day), r.transition, r.s_cents)
        for r in alarm_transitions(cusum).collect()
    )
    assert streamed == batch_ref
    raises = [t for t in streamed if t[1] == "raise"]
    clears = [t for t in streamed if t[1] == "clear"]
    assert len(raises) == 2 and len(clears) == 1, streamed

    run("ckpt2")  # checkpoint loss: replay is a committed no-op
    again = sorted(
        (str(r.day), r.transition, r.s_cents)
        for r in latest_snapshot(spark, str(state / "alarms")).collect()
    )
    assert again == streamed


def test_stream_append_to_ivf_index_exactly_once(spark, sf_dir, tmp_path):
    """Online index maintenance (streaming/index_maintenance.py): a
    vector stream appends into the frozen-centroid IVF index with
    exactly-once batch commits — after the drain the index holds every
    vector exactly once; a replayed batch (marker present) is skipped;
    a crash-before-marker replay (marker removed, files already
    published) re-publishes the SAME names and still never duplicates;
    a checkpoint restart adds nothing."""
    from pyspark.sql import functions as F

    from data_pipeline_ine_spark.sources.ivf_index import write_ivf_index
    from data_pipeline_ine_spark.sources.registry import load_table
    from data_pipeline_ine_spark.streaming.index_maintenance import (
        append_batch_to_ivf_index,
        stream_append_to_ivf_index,
    )

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    path = str(tmp_path / "ivf_live")
    write_ivf_index(
        emb.filter(F.col("vec_id") < 200), path, part_col=None,
        n_clusters=4, iters=1,
    )
    # two landing files -> two micro-batches
    land = tmp_path / "land"
    emb.filter((F.col("vec_id") >= 200) & (F.col("vec_id") < 300)).coalesce(
        1
    ).write.mode("overwrite").parquet(str(land / "f1"))
    emb.filter(F.col("vec_id") >= 300).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(land / "f2"))
    import shutil as _sh

    flat = tmp_path / "flat"
    flat.mkdir()
    for i, f in enumerate(
        sorted((land).rglob("*.parquet"))
    ):
        _sh.copy(f, flat / f"{i}.parquet")

    schema = emb.schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(flat))
    )
    ckpt = str(tmp_path / "ckpt")
    q = stream_append_to_ivf_index(stream, path, ckpt)
    q.awaitTermination(300)

    total = emb.count()
    idx = spark.read.parquet(path)
    assert idx.count() == total
    assert idx.select("vec_id").distinct().count() == total

    # replay skipped: committed marker short-circuits. Batch 0's true
    # content is whatever the stream put in the batch0-* files (file
    # stream ordering is mtime-based, not name-based) — read it back.
    import glob as _glob

    b0_files = sorted(_glob.glob(f"{path}/bucket=*/batch0-*.parquet"))
    b0_ids = {
        r.vec_id for r in spark.read.parquet(*b0_files).collect()
    }
    batch0 = emb.filter(F.col("vec_id").isin(sorted(b0_ids)))
    assert append_batch_to_ivf_index(batch0, 0, path) is False
    assert spark.read.parquet(path).count() == total

    # crash-before-marker replay: files were published but the marker
    # was lost — re-apply must REPLACE the same file names, not add
    import os

    os.remove(os.path.join(path, "_batch_commits", "b0"))
    assert append_batch_to_ivf_index(batch0, 0, path) is True
    after = spark.read.parquet(path)
    assert after.count() == total
    assert after.select("vec_id").distinct().count() == total

    # checkpoint restart: nothing new to drain, nothing duplicated
    q2 = stream_append_to_ivf_index(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(flat)),
        path,
        ckpt,
    )
    q2.awaitTermination(300)
    assert spark.read.parquet(path).count() == total


def test_compaction_preserves_batch_commits_and_refuses_inflight(
    spark, sf_dir, tmp_path
):
    """Compaction must carry the _batch_commits markers into the swapped
    directory — the compacted table CONTAINS every committed batch, so a
    streaming replay after compaction must still short-circuit (ADVICE
    r8: markers were destroyed, re-appending applied batches). And it
    must refuse outright while a staged batch sits under .batches/ —
    those rows aren't in the read yet, but their marker would commit
    later against a table that dropped them."""
    import os

    from pyspark.sql import functions as F

    from data_pipeline_ine_spark.sources.ivf_index import (
        compact_ivf_index,
        write_ivf_index,
    )
    from data_pipeline_ine_spark.sources.registry import load_table
    from data_pipeline_ine_spark.streaming.index_maintenance import (
        append_batch_to_ivf_index,
    )

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    path = str(tmp_path / "ivf_cmark")
    write_ivf_index(
        emb.filter(F.col("vec_id") < 200), path, part_col=None,
        n_clusters=4, iters=1,
    )
    batch = emb.filter(
        (F.col("vec_id") >= 200) & (F.col("vec_id") < 260)
    )
    assert append_batch_to_ivf_index(batch, 7, path) is True
    total = spark.read.parquet(path).count()

    # refuse while a staged batch is in flight
    stage = os.path.join(path, ".batches", "b9")
    os.makedirs(stage)
    with open(os.path.join(stage, "part-0.parquet"), "w") as f:
        f.write("x")
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="in-flight staged batches"):
        compact_ivf_index(spark, path)
    import shutil as _sh

    _sh.rmtree(os.path.join(path, ".batches"))

    compact_ivf_index(spark, path)
    assert os.path.exists(os.path.join(path, "_batch_commits", "b7"))
    # replay of the committed batch is STILL a no-op post-compaction
    assert append_batch_to_ivf_index(batch, 7, path) is False
    after = spark.read.parquet(path)
    assert after.count() == total
    assert after.select("vec_id").distinct().count() == total


def test_publish_staged_batch_sweeps_stale_replay_files(
    spark, sf_dir, tmp_path
):
    """A crash-before-marker replay can stage a DIFFERENT file split
    (spark.sql.files.maxRecordsPerFile makes row-to-file assignment
    nondeterministic), so publish must sweep any batch{id}-*.parquet
    already in the destination before moving the new set — a stale
    higher-numbered file from the first attempt would duplicate rows
    (ADVICE r8)."""
    import glob
    import os

    from pyspark.sql import functions as F

    from data_pipeline_ine_spark.sources.ivf_index import write_ivf_index
    from data_pipeline_ine_spark.sources.registry import load_table
    from data_pipeline_ine_spark.streaming.index_maintenance import (
        append_batch_to_ivf_index,
    )

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    path = str(tmp_path / "ivf_sweep")
    write_ivf_index(
        emb.filter(F.col("vec_id") < 200), path, part_col=None,
        n_clusters=4, iters=1,
    )
    batch = emb.filter(
        (F.col("vec_id") >= 200) & (F.col("vec_id") < 240)
    )
    assert append_batch_to_ivf_index(batch, 3, path) is True
    total = spark.read.parquet(path).count()

    # simulate the first attempt's extra split file surviving a crash:
    # plant a stale batch3-9.parquet holding rows the replay will also
    # publish, then remove the marker and replay
    some_bucket = sorted(glob.glob(os.path.join(path, "bucket=*")))[0]
    existing = sorted(glob.glob(os.path.join(some_bucket, "batch3-*")))
    stale = os.path.join(some_bucket, "batch3-9.parquet")
    import shutil as _sh

    _sh.copy(existing[0], stale)
    os.remove(os.path.join(path, "_batch_commits", "b3"))
    assert spark.read.parquet(path).count() > total  # dup visible

    assert append_batch_to_ivf_index(batch, 3, path) is True
    assert not os.path.exists(stale)  # swept before publish
    after = spark.read.parquet(path)
    assert after.count() == total
    assert after.select("vec_id").distinct().count() == total


def test_batch_maintenance_into_sq8_index_encodes_frozen_and_replays_once(
    spark, sf_dir, tmp_path
):
    """The exactly-once maintenance sink against an IVF-SQ8 index:
    appended batches are stored as int8 CODES under the FROZEN affine
    grid (raw vectors never land; the sidecar params are untouched), a
    committed-batch replay is skipped, and a probe sees the appended
    vector at code-space distance 0 from itself."""
    from pyspark.sql import functions as F

    from data_pipeline_ine_spark.sources.ivf_index import (
        read_sq8_probe,
        write_sq8_index,
    )
    from data_pipeline_ine_spark.sources.registry import load_table
    from data_pipeline_ine_spark.streaming.index_maintenance import (
        append_batch_to_ivf_index,
    )

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    path = str(tmp_path / "sq8_live")
    write_sq8_index(
        emb.filter(F.col("vec_id") < 300), path, part_col=None,
        n_clusters=4, iters=1,
    )
    params_before = sorted(
        tuple(r) for r in spark.read.parquet(f"{path}/_sqparams").collect()
    )
    batch = emb.filter(F.col("vec_id") >= 300)
    assert append_batch_to_ivf_index(batch, 0, path) is True
    idx = spark.read.parquet(path)
    assert "embedding" not in idx.columns and "sq_codes" in idx.columns
    assert idx.count() == emb.count()
    assert sorted(
        tuple(r) for r in spark.read.parquet(f"{path}/_sqparams").collect()
    ) == params_before
    # committed replay: skipped, no duplicates
    assert append_batch_to_ivf_index(batch, 0, path) is False
    assert spark.read.parquet(path).count() == emb.count()
    # an appended vector probes back to itself at distance 0
    target = emb.filter(F.col("vec_id") >= 300).select(
        "vec_id", "embedding"
    ).first()
    out = read_sq8_probe(
        spark, path, [float(x) for x in target.embedding], k=1, n_probe=4
    ).collect()
    assert out[0].sq8_dist == 0


def test_stream_lm_gate_matches_batch_and_replays_idempotent(
    spark, tmp_path
):
    """The streaming LM quality gate (streaming/quality.py::
    stream_lm_gate): documents drained through the stream must be
    EXACTLY the set the pure batch gate keeps on the same files
    (frozen LM, bit-equal scores by construction), gibberish must be
    dropped, and re-delivering a committed batch directory must not
    duplicate (idempotent per batch id)."""
    from pyspark.sql import functions as F

    from data_pipeline_ine_spark.operators.text import WORD_PATTERN
    from data_pipeline_ine_spark.streaming.quality import (
        lm_gate_batch,
        stream_lm_gate,
    )

    common = "the cat sat on the mat and the dog ran"
    ref_rows = [(i, common) for i in range(20)]
    ref = spark.createDataFrame(ref_rows, "doc_id bigint, text string")
    toks = ref.select(
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit(WORD_PATTERN), 0)
        ).alias("term")
    )
    vocab = toks.groupBy("term").agg(F.count(F.lit(1)).alias("c"))
    n_total = vocab.agg(F.sum("c")).first()[0]
    v_size = vocab.count()

    incoming = [
        (100, common),                      # prototypical: keep
        (101, "the cat and the dog"),       # common words: keep
        (102, "zzq wvx qqx glorb flux"),    # all-OOV gibberish: drop
        (103, ""),                          # no tokens: drop
    ]
    inc = spark.createDataFrame(incoming, "doc_id bigint, text string")
    # threshold between the common-word tier and the OOV tier
    thresh = 3_000_000_000_000  # 3.0 nats/token in e12

    batch_kept = sorted(
        r.doc_id
        for r in lm_gate_batch(
            inc, vocab, n_total, v_size, thresh
        ).collect()
    )
    assert batch_kept == [100, 101]

    land = tmp_path / "land"
    land.mkdir()
    inc.filter(F.col("doc_id") < 102).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(land / "a"))
    inc.filter(F.col("doc_id") >= 102).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(land / "b"))
    flat = tmp_path / "flat"
    flat.mkdir()
    import shutil as _sh

    for i, f in enumerate(sorted(land.rglob("*.parquet"))):
        _sh.copy(f, flat / f"{i}.parquet")

    stream = (
        spark.readStream.schema(inc.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(flat))
    )
    out_dir = str(tmp_path / "kept")
    q = stream_lm_gate(
        stream, vocab, n_total, v_size, thresh,
        out_dir, str(tmp_path / "ckpt"),
    )
    q.awaitTermination(300)

    got = spark.read.option("basePath", out_dir).parquet(
        f"{out_dir}/batch_id=*"
    )
    assert sorted(r.doc_id for r in got.collect()) == batch_kept

    # replayed batch: the committed partition short-circuits
    import os as _os

    b0 = f"{out_dir}/batch_id=0"
    before = sorted(_os.listdir(b0))
    # the sink's replay guard is the committed _SUCCESS marker
    assert _os.path.exists(f"{b0}/_SUCCESS")
    total_after = spark.read.option("basePath", out_dir).parquet(
        f"{out_dir}/batch_id=*"
    ).count()
    assert total_after == len(batch_kept)
    assert sorted(_os.listdir(b0)) == before


def test_stream_gopher_gate_matches_batch_and_replays_idempotent(
    spark, tmp_path
):
    """The streaming Gopher repetition gate (streaming/quality.py::
    stream_gopher_gate): documents drained through the stream must be
    EXACTLY the set the batch gate keeps on the same files (the gate
    is per-document, so the twin is bit-equal by construction), a
    looping document must drop, short varied documents must pass (the
    r10 top>=2 guard), and a committed batch must not re-write on
    replay."""
    from pyspark.sql import functions as F

    from data_pipeline_ine_spark.operators.text import gopher_repetition
    from data_pipeline_ine_spark.streaming.quality import stream_gopher_gate

    loop = " ".join(["click here now"] * 20)           # top 2-gram loop: drop
    varied = "the quick brown fox jumps over a lazy dog near the river bank"
    short = "tiny doc"                                  # 1 bigram, occurs once: pass
    incoming = [(1, varied), (2, loop), (3, short), (4, "")]
    inc = spark.createDataFrame(incoming, "doc_id bigint, text string")

    flags = gopher_repetition(inc)
    batch_kept = sorted(
        r.doc_id
        for r in inc.join(
            flags.filter(F.col("pass_repetition") == 1).select("doc_id"),
            "doc_id",
        ).collect()
    )
    assert batch_kept == [1, 3, 4]  # loop drops; short/empty pass by rule

    land = tmp_path / "flat"
    land.mkdir()
    inc.filter(F.col("doc_id") <= 2).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "a"))
    inc.filter(F.col("doc_id") > 2).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "b"))
    import shutil as _sh

    for i, f in enumerate(
        sorted((tmp_path / "a").glob("*.parquet"))
        + sorted((tmp_path / "b").glob("*.parquet"))
    ):
        _sh.copy(f, land / f"{i}.parquet")

    stream = (
        spark.readStream.schema(inc.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(land))
    )
    out_dir = str(tmp_path / "kept")
    q = stream_gopher_gate(stream, out_dir, str(tmp_path / "ckpt"))
    q.awaitTermination(300)

    got = spark.read.option("basePath", out_dir).parquet(
        f"{out_dir}/batch_id=*"
    )
    assert sorted(r.doc_id for r in got.collect()) == batch_kept

    import os as _os

    b0 = f"{out_dir}/batch_id=0"
    assert _os.path.exists(f"{b0}/_SUCCESS")
    before = sorted(_os.listdir(b0))
    total_after = spark.read.option("basePath", out_dir).parquet(
        f"{out_dir}/batch_id=*"
    ).count()
    assert total_after == len(batch_kept)
    assert sorted(_os.listdir(b0)) == before


def test_streaming_append_into_binary_index_frozen_mids(spark, tmp_path):
    """The streaming maintenance sink routes through the shared
    _bucket_for_append step, which since r12 dispatches on the
    _bqparams sidecar too: a batch appended into a BINARY index must
    land as packed sign-bit words under the FROZEN midpoints (sidecar
    untouched, codes-only schema), with the replay-twice-equals-once
    invariant intact."""
    from pyspark.sql import functions as F

    from data_pipeline_ine_spark.sources.ivf_index import (
        read_binary_probe,
        write_binary_index,
    )
    from data_pipeline_ine_spark.streaming.index_maintenance import (
        append_batch_to_ivf_index,
    )

    rows = [
        (i, [float((i * 13 + d * 7) % 10) for d in range(8)])
        for i in range(40)
    ]
    emb = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>"
    )
    path = str(tmp_path / "bq_stream")
    write_binary_index(
        emb.filter(F.col("vec_id") < 20), path, part_col=None,
        n_clusters=2, iters=1,
    )
    mids_before = sorted(
        (r.d, r.mid)
        for r in spark.read.parquet(f"{path}/_bqparams").collect()
    )
    batch = emb.filter(F.col("vec_id") >= 20)
    assert append_batch_to_ivf_index(batch, 1, path)
    # committed replay must short-circuit; crash replay must replace
    assert append_batch_to_ivf_index(batch, 1, path) is False
    import os

    os.remove(os.path.join(path, "_batch_commits", "b1"))
    assert append_batch_to_ivf_index(batch, 1, path)
    idx = spark.read.parquet(path)
    assert idx.count() == 40  # exactly once
    assert "embedding" not in idx.columns
    assert "bq_w0" in idx.columns
    mids_after = sorted(
        (r.d, r.mid)
        for r in spark.read.parquet(f"{path}/_bqparams").collect()
    )
    assert mids_after == mids_before
    qvec = rows[0][1]
    out = read_binary_probe(spark, path, qvec, k=3, n_probe=2).collect()
    assert out[0][0] == 0 and out[0][1] == 0  # self-match at Hamming 0


def test_stream_quant_drift_monitor_equals_batch_report(spark, tmp_path):
    """stream_quant_drift_monitor: per-micro-batch quant-drift reports
    must equal the batch report run over the same rows (stream==batch,
    the repo's streaming-twin invariant), at BOTH quantized tiers, and
    a replayed batch must not rewrite its committed report."""
    from pyspark.sql import functions as F

    from data_pipeline_ine_spark.sources.ivf_index import (
        binary_quant_drift_report,
        sq8_quant_drift_report,
        write_binary_index,
        write_sq8_index,
    )
    from data_pipeline_ine_spark.streaming.quality import (
        read_drift_reports,
        stream_quant_drift_monitor,
    )

    base = spark.createDataFrame(
        [(i, [float(i % 5), float(10 + i % 3)]) for i in range(20)],
        "vec_id bigint, embedding array<double>",
    )
    newv = [
        (100, [4.5, 11.0]),
        (101, [-1.0, 11.5]),
        (102, [2.0, 9.0]),
        (103, [30.0, 12.5]),
    ]
    new_df = spark.createDataFrame(
        newv, "vec_id bigint, embedding array<double>"
    )
    land = str(tmp_path / "land")
    new_df.coalesce(1).write.parquet(land)

    for tier, write_fn, report_fn in (
        ("sq8", write_sq8_index, sq8_quant_drift_report),
        ("bq", write_binary_index, binary_quant_drift_report),
    ):
        idx = str(tmp_path / f"{tier}_idx")
        write_fn(base, idx, part_col=None, n_clusters=2, iters=1)
        stream = (
            spark.readStream.schema(new_df.schema).parquet(land)
        )
        reports = str(tmp_path / f"{tier}_reports")
        q = stream_quant_drift_monitor(
            stream, idx, reports,
            checkpoint=str(tmp_path / f"{tier}_ckpt"),
        )
        q.awaitTermination(120)
        got = sorted(
            tuple(r)
            for r in read_drift_reports(spark, reports)
            .drop("batch_id")
            .collect()
        )
        want = sorted(
            tuple(r) for r in report_fn(spark, idx, new_df).collect()
        )
        assert got == want, (tier, got, want)

    # raw-vector tier: quant drift undefined — loud refusal
    import pytest

    from data_pipeline_ine_spark.sources.ivf_index import write_ivf_index

    flat = str(tmp_path / "flat_idx")
    write_ivf_index(base, flat, part_col=None, n_clusters=2, iters=1)
    with pytest.raises(ValueError, match="quantization sidecar"):
        stream_quant_drift_monitor(
            spark.readStream.schema(new_df.schema).parquet(land),
            flat, str(tmp_path / "r"), checkpoint=str(tmp_path / "c"),
        )

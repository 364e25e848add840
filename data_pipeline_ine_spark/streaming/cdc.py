"""Streaming CDC apply: maintain a keyed snapshot table from a change
stream — the incremental materialized dimension every lakehouse keeps
(Delta MERGE in a stream, Hudi upsert) built from this engine's own
batch pieces.

One merge implementation serves both modes: each micro-batch flows
through ``operators/diff.py::apply_changelog`` (the batch MERGE) against
the current snapshot and writes the result as a NEW immutable snapshot
version directory; readers always resolve the highest version. This is
the same one-sink-both-modes argument as ``write_stream_layered``.

Delivery semantics: the streaming checkpoint guarantees each micro-batch
is applied at least once; batch N deterministically owns version
``v{batch_id+1}``, so a replay either rewrites the same directory from
the same inputs (idempotent) or is skipped outright when that version
already carries a ``_SUCCESS`` marker. Version discovery ignores
directories without ``_SUCCESS``, so a crash mid-write leaves a torn
directory that is invisible to readers and simply overwritten on
replay — effectively-once without a sink-side transaction log. The one
operational rule this imposes: a NEW checkpoint directory (batch ids
restart at 0) requires a fresh snapshot_dir seeded at v0.

Scale shape: per batch, one changelog-sized window dedup + one key-equi
join of snapshot ⋈ batch winners (see ``apply_changelog``); snapshots
are immutable parquet so time travel is a directory pick. Compaction of
old versions is ``sources/maintenance.py``'s job.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession


def _versions(snapshot_dir: str) -> list[tuple[int, str]]:
    """Committed snapshot versions, ascending. A version counts only once
    its ``_SUCCESS`` marker exists (the Hadoop committer writes it after
    all part files) — a crash mid-write leaves a marker-less torn
    directory that must never become 'latest'."""
    if not os.path.isdir(snapshot_dir):
        return []
    out = []
    for name in os.listdir(snapshot_dir):
        m = re.fullmatch(r"v(\d+)", name)
        path = os.path.join(snapshot_dir, name)
        if m and os.path.exists(os.path.join(path, "_SUCCESS")):
            out.append((int(m.group(1)), path))
    return sorted(out)


def latest_snapshot(spark: SparkSession, snapshot_dir: str) -> DataFrame | None:
    """Highest snapshot version under ``snapshot_dir`` (None when empty)."""
    versions = _versions(snapshot_dir)
    if not versions:
        return None
    return spark.read.parquet(versions[-1][1])


def latest_version(snapshot_dir: str) -> int | None:
    """Highest committed version number (None when empty)."""
    versions = _versions(snapshot_dir)
    return versions[-1][0] if versions else None


def snapshot_at_or_below(
    spark: SparkSession, snapshot_dir: str, version: int
) -> DataFrame | None:
    """Highest committed snapshot with version <= ``version`` (None when
    nothing qualifies). The lock-step read for multi-directory state: a
    crash between two directories' commits leaves one a version ahead;
    reading the follower AT the leader's version restores the pair the
    original (pre-crash) run saw, so the replay is deterministic and
    never reads the path it is about to overwrite."""
    versions = [(v, p) for v, p in _versions(snapshot_dir) if v <= version]
    if not versions:
        return None
    return spark.read.parquet(versions[-1][1])


def write_base_snapshot(base: DataFrame, snapshot_dir: str) -> None:
    """Seed the snapshot chain at version v0."""
    base.write.mode("overwrite").parquet(os.path.join(snapshot_dir, "v0"))


def read_version(
    spark: SparkSession, snapshot_dir: str, version: int | None = None
) -> DataFrame:
    """Time travel over the snapshot chain: read a specific committed
    version (default: latest) — the `VERSION AS OF` read the immutable
    ``v{N}`` layout gives for free. Torn (marker-less) directories are
    invisible; asking for one, or for a vacuumed/unknown version, raises
    with the committed-version list so callers can recover.

    Pair with ``history()`` for what exists and
    ``sources/maintenance.py::vacuum_versions`` for retention — the
    three together are the minimal lakehouse time-travel surface."""
    versions = dict(_versions(snapshot_dir))
    if not versions:
        raise FileNotFoundError(f"no committed versions under {snapshot_dir}")
    if version is None:
        version = max(versions)
    if version not in versions:
        raise ValueError(
            f"version {version} not committed under {snapshot_dir}; "
            f"available: {sorted(versions)}"
        )
    return spark.read.parquet(versions[version])


def history(snapshot_dir: str) -> list[dict]:
    """Commit history of a snapshot chain: one row per committed
    version with its path and modification time — the DESCRIBE HISTORY
    analog for the ``v{N}`` layout."""
    return [
        {
            "version": v,
            "path": p,
            "committed_at": os.path.getmtime(os.path.join(p, "_SUCCESS")),
        }
        for v, p in _versions(snapshot_dir)
    ]


def stream_apply_changelog(
    changes_stream: DataFrame,
    snapshot_dir: str,
    checkpoint: str,
    key_cols: list[str],
    seq_col: str = "seq",
    op_col: str = "op",
):
    """Apply a CDC change stream to the snapshot chain in ``snapshot_dir``
    (seed with :func:`write_base_snapshot` first). Each micro-batch N
    reads the latest snapshot, merges through the batch
    ``apply_changelog``, and writes ``v{N+1}``. Returns the started
    query (AvailableNow trigger: drain pending changes, then stop).

    Ordering: within a batch the highest ``seq`` wins; ACROSS batches a
    later batch always overwrites — the standard in-order-delivery CDC
    assumption (a log-compacted topic / LSN-ordered source). Out-of-order
    sources must be windowed upstream before this sink.

    Crash safety: batch N writes ``v{batch_id+1}`` (named by the
    checkpoint's batch id, NOT by directory listing, so a spurious torn
    directory can never shift the chain), skips the write when that
    version is already committed (replay after a crash between write and
    checkpoint commit), and merges from the highest *committed*
    (``_SUCCESS``-marked) version."""
    from data_pipeline_ine_spark.operators.diff import apply_changelog

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        target = os.path.join(snapshot_dir, f"v{batch_id + 1}")
        if os.path.exists(os.path.join(target, "_SUCCESS")):
            # replayed batch whose write already committed — idempotent skip
            return
        current = latest_snapshot(spark, snapshot_dir)
        if current is None:
            raise RuntimeError(
                f"{snapshot_dir} has no base snapshot — call "
                "write_base_snapshot before starting the stream"
            )
        merged = apply_changelog(current, batch_df, key_cols, seq_col, op_col)
        merged.write.mode("overwrite").parquet(target)

    return (
        changes_stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def stream_maintain_aggregate(
    changes_stream: DataFrame,
    snapshot_dir: str,
    agg_dir: str,
    checkpoint: str,
    key_cols: list[str],
    group_col: str,
    value_col: str,
    seq_col: str = "seq",
    op_col: str = "op",
):
    """Streaming MATERIALIZED VIEW maintenance: keep a grouped aggregate
    (count, decimal sum) continuously correct under a CDC change stream.

    Per micro-batch, the incremental path runs first — retract/insert
    deltas against the latest committed snapshot
    (operators/diff.py::maintain_group_aggregate: changelog-sized work,
    never a snapshot re-aggregation) — and its result is published as
    the next aggregate version; the snapshot chain itself advances with
    the same ``apply_changelog`` merge so the next batch's retractions
    can again consult before-images. Same crash-safety contract as
    :func:`stream_apply_changelog`: versions are named by batch id,
    committed versions are never rewritten, reads go through _SUCCESS
    markers only.

    This is the streaming shape of an IVM engine (Materialize/Delta Live
    Tables style): the aggregate a dashboard reads is always one batch
    behind the log's head, at per-batch cost proportional to the batch.
    """
    from data_pipeline_ine_spark.operators.diff import (
        apply_changelog,
        maintain_group_aggregate,
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        snap_target = os.path.join(snapshot_dir, f"v{batch_id + 1}")
        agg_target = os.path.join(agg_dir, f"v{batch_id + 1}")
        if os.path.exists(os.path.join(agg_target, "_SUCCESS")) and os.path.exists(
            os.path.join(snap_target, "_SUCCESS")
        ):
            return
        current = latest_snapshot(spark, snapshot_dir)
        if current is None:
            raise RuntimeError(
                f"{snapshot_dir} has no base snapshot — call "
                "write_base_snapshot before starting the stream"
            )
        batch = batch_df.localCheckpoint()  # consumed by both branches
        # steady state is fully incremental: the stored aggregate comes
        # from the committed aggregate version (exact decimal column),
        # never a snapshot re-aggregation; the first batch bootstraps
        # from the snapshot.
        # VERSION-MATCHED, not "latest": after a crash between the agg
        # write and the snapshot write, agg v{N+1} is committed while the
        # snapshot is still v{N} — pairing "latest agg" with the older
        # snapshot would re-apply the batch delta on top of an aggregate
        # that already contains it. The stored side must be the aggregate
        # AT the current snapshot's version (None → bootstrap).
        snap_version = _versions(snapshot_dir)[-1][0]
        agg_match = [p for v, p in _versions(agg_dir) if v == snap_version]
        stored = spark.read.parquet(agg_match[0]) if agg_match else None
        maintained = maintain_group_aggregate(
            current, batch, key_cols, group_col, value_col, seq_col, op_col,
            stored_agg=stored,
        )
        maintained.write.mode("overwrite").parquet(agg_target)
        merged = apply_changelog(current, batch, key_cols, seq_col, op_col)
        merged.write.mode("overwrite").parquet(snap_target)

    return (
        changes_stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def latest_aggregate(spark: SparkSession, agg_dir: str) -> DataFrame | None:
    """Newest committed aggregate version (same _SUCCESS discipline)."""
    return latest_snapshot(spark, agg_dir)


def stream_maintain_cms(
    events_stream: DataFrame,
    sketch_dir: str,
    checkpoint: str,
    key_col: str,
):
    """Streaming heavy-hitter sketch maintenance: per micro-batch, build a
    count-min sketch of the batch (operators/sketches.py::cms_build) and
    merge it cell-wise-SUM — the CMS merge law — into the last committed
    sketch version. The always-current 2,048-cell sketch answers "who is
    heavy so far" at any moment without ever rescanning history.

    Crash-safety is the module's standard discipline: batch N owns
    version ``v{batch_id+1}``; a replay of a committed batch is skipped
    via its ``_SUCCESS`` marker, a torn write is invisible to
    ``latest_snapshot`` and overwritten on replay — effectively-once.

    Scale shape: per batch, one batch-sized build aggregate (shuffle
    carries ≤ d·w cells per map task) + a 2,048-row merge. State on
    disk is O(d·w) per version regardless of stream length — the whole
    point of maintaining the sketch instead of exact per-key counts."""
    from pyspark.sql import functions as F

    from data_pipeline_ine_spark.operators.sketches import cms_build

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        target = os.path.join(sketch_dir, f"v{batch_id + 1}")
        if os.path.exists(os.path.join(target, "_SUCCESS")):
            return  # committed replay — skip, never rewrite
        delta = cms_build(batch_df, key_col)
        prev = latest_snapshot(spark, sketch_dir)
        merged = (
            delta
            if prev is None
            else prev.unionAll(delta)
            .groupBy("row", "bucket")
            .agg(F.sum("cell_count").alias("cell_count"))
        )
        merged.write.mode("overwrite").parquet(target)

    return (
        events_stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )



def maintain_rolling_wau_batch(
    batch: DataFrame,
    activity: DataFrame,
    stored_wau: DataFrame,
    window_days: int = 7,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> tuple[DataFrame, DataFrame]:
    """The pure per-batch function behind ``stream_maintain_rolling_wau``
    (shared with the incremental probe, same pattern as
    ``dedup.exact_dedup_batch``): returns ``(new_activity, new_wau)``.
    Work is bounded by the batch's NEW (user, day) pairs — the affected
    calendar window is recomputed against activity RESTRICTED to that
    slice; untouched WAU days pass through by anti-join."""
    from pyspark.sql import functions as F

    pairs = (
        batch.select(
            F.col(user_col).alias("user_id"),
            F.to_date(ts_col).alias("day"),
        )
        .distinct()
        .localCheckpoint()
    )
    new_pairs = pairs.join(
        activity, ["user_id", "day"], "left_anti"
    ).localCheckpoint()
    new_activity = activity.unionByName(new_pairs).localCheckpoint()

    affected = (
        new_pairs.select(
            F.explode(
                F.sequence(
                    F.col("day"), F.date_add(F.col("day"), window_days - 1)
                )
            ).alias("day")
        )
        .distinct()
        .join(new_activity.select("day").distinct(), "day", "left_semi")
        .localCheckpoint()
    )
    bounds = affected.agg(
        F.min("day").alias("lo"), F.max("day").alias("hi")
    ).collect()[0]
    if bounds["lo"] is None:
        recomputed = stored_wau.limit(0)
    else:
        slice_ = new_activity.filter(
            (F.col("day") >= F.date_sub(F.lit(bounds["lo"]), window_days - 1))
            & (F.col("day") <= F.lit(bounds["hi"]))
        )
        recomputed = (
            slice_.select(
                "user_id",
                F.explode(
                    F.sequence(
                        F.col("day"),
                        F.date_add(F.col("day"), window_days - 1),
                    )
                ).alias("day"),
            )
            .join(F.broadcast(affected), "day", "left_semi")
            .groupBy("day")
            .agg(
                F.count_distinct("user_id").alias(f"users_{window_days}d")
            )
        )
    new_wau = stored_wau.join(
        F.broadcast(affected), "day", "left_anti"
    ).unionByName(recomputed).localCheckpoint()
    return new_activity, new_wau


def stream_maintain_rolling_wau(
    events_stream: DataFrame,
    activity_dir: str,
    wau_dir: str,
    checkpoint: str,
    ts_col: str = "ts",
    user_col: str = "user_id",
    window_days: int = 7,
):
    """Continuously-maintained rolling WAU (trailing ``window_days``
    distinct users per active day) under an event stream — the
    streaming shape of ``operators/timeseries.py::
    rolling_distinct_users``, maintained like a hypertable continuous
    aggregate: per batch, only the CALENDAR WINDOW the batch touches is
    recomputed.

    Per micro-batch:

    1. the batch reduces to its distinct (user, day) pairs; pairs
       already in the activity state are dropped (idempotent under
       replays and duplicate events),
    2. genuinely-new pairs advance the activity chain to v{N+1},
    3. the affected target days — each new pair's day plus the next
       ``window_days − 1`` — are recomputed against activity RESTRICTED
       to ``[min(affected) − window, max(affected)]`` (steady-state
       arrivals are recent, so this is a bounded recent slice, never
       history), and spliced into the stored WAU by anti-join + union.

    Crash-safety is the version-matched discipline of
    ``stream_maintain_aggregate``: WAU v{N+1} commits first, activity
    v{N+1} last; the stored WAU is read AT the activity chain's version
    so a crash between the two commits replays the batch against the
    exact state pair the original run saw. Distinct-day counts make the
    splice idempotent (recomputing an already-recomputed day yields the
    same rows).

    Scale shape: batch dedup is batch-sized; the anti-join probes the
    activity table on its (user, day) key; the recompute scans only the
    touched calendar slice of activity; the WAU splice is
    affected-days-sized against a days-cardinality table.
    """

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        act_target = os.path.join(activity_dir, f"v{batch_id + 1}")
        wau_target = os.path.join(wau_dir, f"v{batch_id + 1}")
        if os.path.exists(
            os.path.join(act_target, "_SUCCESS")
        ) and os.path.exists(os.path.join(wau_target, "_SUCCESS")):
            return
        current = latest_snapshot(spark, activity_dir)
        if current is None:
            raise RuntimeError(
                f"{activity_dir} has no base snapshot — call "
                "write_base_snapshot before starting the stream"
            )
        act_version = _versions(activity_dir)[-1][0]
        wau_match = [p for v, p in _versions(wau_dir) if v == act_version]
        if not wau_match:
            raise RuntimeError(
                f"{wau_dir} has no version v{act_version} matching the "
                "activity chain — seed both with write_base_snapshot"
            )
        stored_wau = spark.read.parquet(wau_match[0])

        new_activity, new_wau = maintain_rolling_wau_batch(
            batch_df,
            current,
            stored_wau,
            window_days=window_days,
            ts_col=ts_col,
            user_col=user_col,
        )
        # WAU first, activity last: a crash between the two leaves the
        # activity chain behind -> the replay reads the version-matched
        # (older) WAU and recomputes the same splice deterministically.
        new_wau.write.mode("overwrite").parquet(wau_target)
        new_activity.write.mode("overwrite").parquet(act_target)

    return (
        events_stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )

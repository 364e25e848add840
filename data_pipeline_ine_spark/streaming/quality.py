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


def lm_gate_batch(
    batch_df: DataFrame,
    lm_vocab: DataFrame,
    n_total: int,
    v_size: int,
    threshold_e12: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Pure per-batch step behind ``stream_lm_gate``: score each
    document under the FROZEN corpus unigram LM (``lm_vocab`` =
    (term, c) counts; ``n_total``/``v_size`` the frozen totals — train
    once with ``operators/text.py::unigram_logloss``'s aggregates,
    never per batch) and keep the documents whose per-token loss is at
    or under the threshold. Out-of-vocabulary terms take the c=0
    smoothing path ``−ln(1/(N+V))`` — the frozen-LM analog of
    unigram_logloss's add-one rule, e12-snapped the identical way, so
    batch and stream scores are bit-equal by construction.

    Zero-token documents are DROPPED, deliberately: a document with no
    scoreable tokens has no per-token loss, and an unscoreable document
    must not pass a quality gate by default (the conservative firehose
    rule; contrast ``perplexity_buckets``, an *analysis* op, which
    surfaces them in an explicit ``unscored`` bucket instead). The rule
    is pinned by tests and shared bit-for-bit by the stream and batch
    paths.

    Scale shape per batch: one tokenize + doc-keyed aggregate over the
    BATCH, a broadcast (or term-keyed at fleet vocab) join against the
    frozen vocab — no state store, no corpus re-scan.
    """
    from data_pipeline_ine_spark.operators.text import WORD_PATTERN

    toks = batch_df.select(
        F.col(id_col),
        F.explode(
            F.regexp_extract_all(
                F.lower(F.col(text_col)), F.lit(WORD_PATTERN), 0
            )
        ).alias("term"),
    )
    kept_ids = _lm_kept_ids(
        toks, lm_vocab, n_total, v_size, threshold_e12, id_col
    )
    return batch_df.join(kept_ids, id_col, "left_semi")


def lm_gate_ids(
    toks_df: DataFrame,
    lm_vocab: DataFrame,
    n_total: int,
    v_size: int,
    threshold_e12: int,
    id_col: str = "doc_id",
    tokens_col: str = "_ts",
) -> DataFrame:
    """Ids passing the frozen-LM gate, from a PRE-TOKENIZED frame
    (``tokens_col`` = the WORD_PATTERN token array): the curation
    stacks tokenize the corpus once and feed every gate (r13, guide
    §2.3/§3.3). Per-document decision identical to
    :func:`lm_gate_batch` — the score depends only on the document's
    own terms and the frozen vocab, so gating a superset and
    intersecting is the same kept set (restriction-invariant)."""
    toks = toks_df.select(
        F.col(id_col), F.explode(F.col(tokens_col)).alias("term")
    )
    return _lm_kept_ids(
        toks, lm_vocab, n_total, v_size, threshold_e12, id_col
    )


def _lm_kept_ids(
    toks: DataFrame,
    lm_vocab: DataFrame,
    n_total: int,
    v_size: int,
    threshold_e12: int,
    id_col: str,
) -> DataFrame:
    """Shared scoring tail of the batch gate and the pre-tokenized
    gate: exploded (id, term) rows → per-doc e12 loss → kept ids."""
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("cnt"))
    denom = F.lit(int(n_total) + int(v_size)).cast("double")
    # no broadcast hint: the planner broadcasts a small vocab on its
    # own and falls back to a term-keyed shuffle join at fleet-scale
    # vocabularies, where forcing the hint would OOM the stream
    joined = tf.join(lm_vocab, "term", "left").withColumn(
        "_c", F.coalesce(F.col("c"), F.lit(0))
    )
    scaled = F.floor(
        -F.log((F.col("_c") + 1).cast("double") / denom) * F.lit(1e12)
        + F.lit(0.5)
    )
    scored = joined.groupBy(id_col).agg(
        F.sum("cnt").alias("n_tokens"),
        F.sum((F.col("cnt") * scaled).cast("decimal(38,0)"))
        .cast("long")
        .alias("sum_neg_logp_e12"),
    )
    return scored.filter(
        F.expr("sum_neg_logp_e12 div n_tokens") <= int(threshold_e12)
    ).select(id_col)


def stream_lm_gate(
    docs_stream: DataFrame,
    lm_vocab: DataFrame,
    n_total: int,
    v_size: int,
    threshold_e12: int,
    out_dir: str,
    checkpoint: str,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Streaming corpus curation: gate an arriving document stream on
    its per-token loss under a FROZEN unigram LM — the online form of
    the CCNet quality split (``perplexity_buckets`` decides the
    threshold offline on a reference corpus; this applies it to the
    firehose). Kept documents land under ``out_dir/batch_id=N/``,
    idempotent per batch id (a replayed batch overwrites its own
    partition — the ``stream_drift_monitor`` discipline), so the gate
    is exactly-once at the directory grain. The LM is frozen by
    design: re-training per batch would let the gate drift with the
    incoming distribution — the exact failure the gate exists to
    catch. Staged for a round-10 batch-expressible contract twin
    (stream output == batch ``lm_gate_batch`` on the same files)."""
    voc = lm_vocab.localCheckpoint()

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        target = os.path.join(out_dir, f"batch_id={batch_id}")
        if os.path.exists(os.path.join(target, "_SUCCESS")):
            return  # replayed batch already committed
        kept = lm_gate_batch(
            batch_df, voc, n_total, v_size, threshold_e12,
            text_col=text_col, id_col=id_col,
        )
        kept.write.mode("overwrite").parquet(target)

    return (
        docs_stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def stream_gopher_gate(
    docs_stream: DataFrame,
    out_dir: str,
    checkpoint: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    top2_max_pct: int = 5,
    dup3_max_pct: int = 2,
):
    """Streaming twin of the Gopher repetition gate (operators/text.py
    ::gopher_repetition — the ``stream_lm_gate`` discipline applied to
    the repetition rules): every micro-batch's documents are flagged by
    the SAME pure per-document function the batch contract row runs, so
    stream output == batch output on the same files by construction
    (the gate needs no corpus state at all — both n-gram aggregates are
    doc-keyed, making this the cheapest gate to run on the firehose).
    Kept documents land under ``out_dir/batch_id=N/``, idempotent per
    batch id (replays overwrite their own partition, never duplicate).
    """
    from data_pipeline_ine_spark.operators.text import gopher_repetition

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        target = os.path.join(out_dir, f"batch_id={batch_id}")
        if os.path.exists(os.path.join(target, "_SUCCESS")):
            return  # replayed batch already committed
        flags = gopher_repetition(
            batch_df, text_col=text_col, id_col=id_col,
            top2_max_pct=top2_max_pct, dup3_max_pct=dup3_max_pct,
        )
        kept = batch_df.join(
            flags.filter(F.col("pass_repetition") == 1).select(id_col),
            id_col,
        )
        kept.write.mode("overwrite").parquet(target)

    return (
        docs_stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def maintain_cusum_batch(
    batch: DataFrame,
    daily: DataFrame,
    mu_cents: int,
    slack_permille: int = 50,
    h_permille: int = 200,
    ts_col: str = "ts",
    value_col: str = "value",
) -> tuple[DataFrame, DataFrame]:
    """Pure per-batch step behind ``stream_maintain_cusum``: merge the
    batch's daily partial sums into the stored day-grain totals, then
    re-derive the CUSUM surface from the updated calendar frame.

    Unlike the batch operator (``operators/timeseries.py::cusum_alarm``,
    which estimates μ from the monitored data), the streaming monitor
    takes a FIXED reference ``mu_cents`` — the in-control baseline from
    a training window — which is how production CUSUM is run: the
    target must not drift with the data it is policing.

    Scale shape: the state update is touched-day-bounded (one batch
    aggregate + a day-keyed outer merge); the S recompute is
    calendar-bounded by construction (prefix-sum minus running-min over
    ≤|days| rows), so "recompute" is the honest steady state here —
    there is no corpus-sized work to avoid.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    deltas = (
        batch.select(
            F.to_date(ts_col).alias("day"),
            F.floor(F.col(value_col) * 100).cast("bigint").alias("_d"),
        )
        .groupBy("day")
        .agg(F.sum(F.col("_d").cast("decimal(25,0)")).cast("bigint").alias("_d"))
    )
    new_daily = (
        daily.join(deltas, "day", "full_outer")
        .select(
            "day",
            (
                F.coalesce(F.col("x_cents"), F.lit(0))
                + F.coalesce(F.col("_d"), F.lit(0))
            )
            .cast("bigint")
            .alias("x_cents"),
        )
        .localCheckpoint()
    )
    k = (mu_cents * slack_permille) // 1000
    h = (mu_cents * h_permille) // 1000
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cusum = (
        new_daily.withColumn(
            "_y", (F.col("x_cents") - F.lit(mu_cents) - F.lit(k)).cast("bigint")
        )
        .withColumn("_p", F.sum("_y").over(w).cast("bigint"))
        .withColumn(
            "_pmin", F.least(F.lit(0).cast("bigint"), F.min("_p").over(w))
        )
        .select(
            "day",
            "x_cents",
            (F.col("_p") - F.col("_pmin")).cast("bigint").alias("s_cents"),
            F.when((F.col("_p") - F.col("_pmin")) > h, 1)
            .otherwise(0)
            .cast("bigint")
            .alias("alarm"),
        )
    )
    return new_daily, cusum


def alarm_transitions(cusum: DataFrame) -> DataFrame:
    """Alarm-state TRANSITIONS from a CUSUM surface: the days where
    ``alarm`` flips vs the previous day — ``raise`` (S crossed above h)
    or ``clear`` (fell back) — the rows an alerting sink actually pages
    on (the level surface re-asserts "still alarming" every day; pagers
    need edges). The day before the first row counts as in-control, so
    a series that starts alarming raises on its first day.

    Calendar-bounded: one lag window over the ≤|days|-row surface.
    Output: ``(day, transition, s_cents)``.
    """
    from pyspark.sql import Window

    w = Window.orderBy("day")
    return (
        cusum.withColumn("_prev", F.lag("alarm", 1, 0).over(w))
        .filter(F.col("alarm") != F.col("_prev"))
        .select(
            "day",
            F.when(F.col("alarm") == 1, F.lit("raise"))
            .otherwise(F.lit("clear"))
            .alias("transition"),
            "s_cents",
        )
    )


def stream_maintain_cusum(
    events_stream: DataFrame,
    daily_dir: str,
    cusum_dir: str,
    checkpoint: str,
    mu_cents: int,
    slack_permille: int = 50,
    h_permille: int = 200,
    ts_col: str = "ts",
    value_col: str = "value",
    alarms_dir: str | None = None,
):
    """Continuously-maintained CUSUM drift monitor under an event
    stream: per micro-batch, the day-grain totals advance by the
    batch's partial sums (touched-day-bounded) and the alarm surface is
    re-derived relationally from the calendar frame.

    Crash-safety is the version-matched discipline of
    ``stream_maintain_rolling_wau``: alert transitions and cusum
    v{N+1} commit first, daily totals v{N+1} last — a crash between
    them replays the batch against the version-matched older state,
    and the day-keyed merge of per-batch partials makes the replay
    produce identical totals (and therefore identical transitions).

    ``alarms_dir`` (optional) adds the ALERT SINK: per version, the
    ``alarm_transitions`` edge rows (0→1 raise / 1→0 clear) derived
    from the same cusum surface — what a pager consumes.
    """
    import os

    from data_pipeline_ine_spark.streaming.cdc import (
        _versions,
        latest_snapshot,
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        daily_target = os.path.join(daily_dir, f"v{batch_id + 1}")
        cusum_target = os.path.join(cusum_dir, f"v{batch_id + 1}")
        targets = [daily_target, cusum_target]
        alarm_target = None
        if alarms_dir is not None:
            alarm_target = os.path.join(alarms_dir, f"v{batch_id + 1}")
            targets.append(alarm_target)
        if all(
            os.path.exists(os.path.join(t, "_SUCCESS")) for t in targets
        ):
            return
        current = latest_snapshot(spark, daily_dir)
        if current is None:
            raise RuntimeError(
                f"{daily_dir} has no base snapshot — call "
                "write_base_snapshot before starting the stream"
            )
        new_daily, cusum = maintain_cusum_batch(
            batch_df,
            current,
            mu_cents,
            slack_permille=slack_permille,
            h_permille=h_permille,
            ts_col=ts_col,
            value_col=value_col,
        )
        # one computation feeds both sinks: checkpoint so the alarm
        # edges and the committed surface can never diverge
        cusum = cusum.localCheckpoint()
        if alarm_target is not None:
            alarm_transitions(cusum).write.mode("overwrite").parquet(
                alarm_target
            )
        cusum.write.mode("overwrite").parquet(cusum_target)
        new_daily.write.mode("overwrite").parquet(daily_target)

    return (
        events_stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def stream_quant_drift_monitor(
    vector_stream: DataFrame,
    index_path: str,
    report_dir: str,
    checkpoint: str,
    vec_col: str = "embedding",
):
    """Streaming twin of the quantization-drift reports (sources/
    ivf_index.py::sq8_quant_drift_report / binary_quant_drift_report):
    a production corpus appends CONTINUOUSLY, so the question "has the
    appended cohort drifted off the frozen quant grid" should be
    answered per micro-batch, not by a periodic batch scan of
    accumulated appends. Each micro-batch writes its own per-dim
    drift report under ``report_dir/batch_id=N/`` (idempotent per
    batch — ``stream_drift_monitor``'s replay discipline), against
    whichever frozen params sidecar the index carries: SQ8 affine
    bounds (out-of-grid clip counts) or binary midpoints (threshold
    flips vs the BATCH's own re-derived midpoint).

    The tier is sniffed once at monitor start; each batch re-reads
    only the O(dim) params sidecar (frozen by the append discipline —
    that is the point) and pays one posexplode map + a |dim|-group
    aggregate over BATCH-sized data. Retrain decisions aggregate
    downstream via ``read_drift_reports``."""
    import os as _os

    from data_pipeline_ine_spark.sources.ivf_index import (
        binary_quant_drift_report,
        sq8_quant_drift_report,
    )

    spark = vector_stream.sparkSession
    is_sq8 = _os.path.exists(_os.path.join(index_path, "_sqparams"))
    is_bq = _os.path.exists(_os.path.join(index_path, "_bqparams"))
    if not (is_sq8 or is_bq):
        raise ValueError(
            f"{index_path} carries no quantization sidecar (_sqparams/"
            "_bqparams) — quant drift is undefined for raw-vector tiers"
        )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        target = os.path.join(report_dir, f"batch_id={batch_id}")
        if os.path.exists(os.path.join(target, "_SUCCESS")):
            return  # replayed batch: report already committed
        if is_sq8:
            report = sq8_quant_drift_report(
                spark, index_path, batch_df, vec_col=vec_col
            )
        else:
            report = binary_quant_drift_report(
                spark, index_path, batch_df, vec_col=vec_col
            )
        report.write.mode("overwrite").parquet(target)

    return (
        vector_stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )

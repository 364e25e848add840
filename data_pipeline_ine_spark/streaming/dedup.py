"""Streaming corpus ingestion dedup: maintain a near-dup-free document
corpus under a continuous arrival stream.

The batch operator this wraps — ``operators/dedup.py::
incremental_near_dup_filter`` — answers "which of THESE new docs
duplicate the standing corpus"; this module runs it per micro-batch and
advances the corpus itself, with the exact crash-safety discipline of
``streaming/cdc.py``: versions named by batch id, ``_SUCCESS``-gated
reads, committed versions never rewritten, so a replayed batch is a
no-op and a torn write is invisible.

Per-batch semantics (deterministic, order-free within the batch):

1. drop batch docs that are near-dups (exact Jaccard >= threshold over
   shingles, LSH-banded candidates) of ANY current-corpus doc;
2. among the remaining batch docs, collapse within-batch near-dup
   CLUSTERS (connected components of the pair graph — transitive, like
   the batch dedup stack) to their min-id representative;
3. append the survivors: corpus v{N+1} = corpus v{N} union survivors.

Work per batch is batch-driven (the incremental_near_dup_filter
contract, measured flat-growth in tools/incremental_probe.py) plus a
survivor-sized append — never a corpus self-join.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_pipeline_ine_spark.streaming.cdc import (
    latest_snapshot,
    latest_version,
    snapshot_at_or_below,
)


def dedup_batch_against_corpus(
    batch: DataFrame,
    corpus: DataFrame,
    id_col: str = "doc_id",
    threshold_num: int = 1,
    threshold_den: int = 2,
    **minhash_kwargs,
) -> DataFrame:
    """The pure per-batch function: batch docs surviving both the
    vs-corpus filter and within-batch cluster collapse (min-id rep).
    Exposed separately so the streaming path and the sequential batch
    reference in tests share ONE implementation of the semantics."""
    from data_pipeline_ine_spark.operators.dedup import (
        dedup_components,
        incremental_near_dup_filter,
        jaccard_candidate_pairs,
    )

    vs_corpus = incremental_near_dup_filter(
        batch,
        corpus,
        id_col=id_col,
        threshold_num=threshold_num,
        threshold_den=threshold_den,
        **minhash_kwargs,
    )
    pairs = jaccard_candidate_pairs(
        vs_corpus, id_col=id_col, **minhash_kwargs
    ).filter(F.col("jaccard") * threshold_den >= F.lit(threshold_num))
    comp = dedup_components(pairs)
    reps = comp.groupBy("component").agg(F.min("doc_id").alias(id_col))
    in_cluster = comp.select(F.col("doc_id").alias(id_col))
    keep_clustered = vs_corpus.join(
        F.broadcast(reps.select(id_col)), id_col, "left_semi"
    )
    untouched = vs_corpus.join(
        F.broadcast(in_cluster), id_col, "left_anti"
    )
    return untouched.unionByName(keep_clustered)


def stream_dedup_corpus(
    docs_stream: DataFrame,
    corpus_dir: str,
    checkpoint: str,
    id_col: str = "doc_id",
    threshold_num: int = 1,
    threshold_den: int = 2,
    **minhash_kwargs,
):
    """Start the maintenance query (AvailableNow trigger: drain pending
    batches, then stop). Seed ``corpus_dir`` with
    ``streaming/cdc.py::write_base_snapshot`` first."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        target = os.path.join(corpus_dir, f"v{batch_id + 1}")
        if os.path.exists(os.path.join(target, "_SUCCESS")):
            return  # replayed batch: already committed, exactly-once no-op
        corpus = latest_snapshot(spark, corpus_dir)
        if corpus is None:
            raise RuntimeError(
                f"{corpus_dir} has no base snapshot — call "
                "write_base_snapshot before starting the stream"
            )
        batch = batch_df.localCheckpoint()  # consumed by filter + union
        survivors = dedup_batch_against_corpus(
            batch,
            corpus,
            id_col=id_col,
            threshold_num=threshold_num,
            threshold_den=threshold_den,
            **minhash_kwargs,
        )
        corpus.unionByName(survivors).write.mode("overwrite").parquet(target)

    return (
        docs_stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


# -- Bloom-gated EXACT dedup admission ---------------------------------------
# The near-dup path above pays an LSH band join per batch. For EXACT dedup
# (identical fingerprints) the standing state can be far cheaper: a portable
# Bloom filter (operators/sketches.py) over the corpus fingerprints prunes
# every definitely-new batch doc WITHOUT touching the corpus; only the few
# bloom-positive candidates (true dups + the deterministic false-positive
# trickle) are confirmed against the fingerprint table. The bloom is a pure
# PERFORMANCE layer — false positives only send extra candidates to the
# exact confirm, so admission results are bit-identical with or without it.

_BLOOM_GROUP = "corpus"


def exact_dedup_batch(
    batch: DataFrame,
    corpus_fps: DataFrame,
    bloom: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Pure per-batch function: batch docs admitted by exact-fingerprint
    dedup — not already in the corpus (bloom-pruned, then CONFIRMED
    against ``corpus_fps``), within-batch collapsed to the min-id doc
    per fingerprint. Shared by the stream sink and the sequential
    reference in tests.

    INVARIANT: ``bloom`` must contain every fingerprint in
    ``corpus_fps`` (the Bloom's no-false-negative direction) — a
    bloom-negative doc skips the exact confirm entirely, so a bloom
    MISSING corpus keys would leak duplicates. The sink below maintains
    the two in lock-step per version; given the invariant, Bloom false
    positives only cost extra confirm probes and admission is exact.

    Scale shape: the bloom (KB, broadcast) splits the batch;
    bloom-NEGATIVE docs never join anything — at a steady state where
    most arrivals are novel, the corpus-sized fingerprint table is
    probed only by the candidate sliver. Returns the admitted docs with
    a ``_fp`` column (the sink persists it to the fingerprint table).

    NULL-text docs are DROPPED up front (ADVICE r5): ``md5(NULL)`` is
    NULL, which matches nothing in the anti-join confirm and hashes to
    nothing in the bloom — such rows would be re-admitted every batch
    and accumulate NULL fingerprints in state. No content ⇒ nothing to
    deduplicate ⇒ not admitted.
    """
    from pyspark.sql import Window

    from data_pipeline_ine_spark.operators.sketches import bloom_probe

    w = Window.partitionBy("_fp").orderBy(id_col)
    uniq = (
        batch.filter(F.col(text_col).isNotNull())
        .withColumn("_fp", F.md5(F.col(text_col)))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    flagged = bloom_probe(
        uniq.withColumn("_g", F.lit(_BLOOM_GROUP)),
        bloom,
        key_col=text_col,
        id_col=id_col,
        group_col="_g",
    ).select(id_col)
    candidates = uniq.join(F.broadcast(flagged), id_col, "left_semi")
    definite_new = uniq.join(F.broadcast(flagged), id_col, "left_anti")
    confirmed_new = candidates.join(corpus_fps, "_fp", "left_anti")
    return definite_new.unionByName(confirmed_new)


def stream_exact_dedup(
    docs_stream: DataFrame,
    state_dir: str,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Streaming exact-dedup admission: per micro-batch, admit only docs
    whose fingerprint the corpus has never seen, then advance BOTH state
    tables — ``{state_dir}/fps/v{N}`` (fingerprints, confirm side) and
    ``{state_dir}/bloom/v{N}`` (filter rows, OR-merged — ``bit_or`` is
    the Bloom merge law) — plus ``{state_dir}/admitted/v{N}`` (the
    batch's accepted docs, the stream's output).

    Crash-safety discipline of streaming/cdc.py: versions named by
    batch id, ``_SUCCESS``-gated reads, committed versions never
    rewritten — a replayed batch is an exactly-once no-op; a torn
    multi-dir write is invisible because the NEXT version's reads go
    through ``latest_snapshot`` per directory (fps and bloom commit
    last-to-first so no committed fps version ever lacks its bloom).

    Seed with ``write_base_snapshot(fps_df, f"{state_dir}/fps")`` and
    ``write_base_snapshot(bloom_df, f"{state_dir}/bloom")`` (empty
    frames are fine for a cold start).
    """
    from data_pipeline_ine_spark.operators.sketches import bloom_build

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        fps_dir = os.path.join(state_dir, "fps")
        bloom_dir = os.path.join(state_dir, "bloom")
        adm_dir = os.path.join(state_dir, "admitted")
        fps_target = os.path.join(fps_dir, f"v{batch_id + 1}")
        bloom_target = os.path.join(bloom_dir, f"v{batch_id + 1}")
        bloom_committed = os.path.exists(
            os.path.join(bloom_target, "_SUCCESS")
        )
        if (
            os.path.exists(os.path.join(fps_target, "_SUCCESS"))
            and bloom_committed
        ):
            return  # replayed batch: committed, exactly-once no-op
        # Lock-step as-of read (ADVICE r5): a crash after the bloom
        # v{N+1} commit but before the fps commit leaves the bloom one
        # version ahead. latest_snapshot(bloom_dir) would then read the
        # very path this replay overwrites (Spark refuses) — so read the
        # bloom AT the fps chain's version, restoring exactly the state
        # pair the original run saw; the replay recomputes v{N+1}
        # deterministically and skips the already-committed bloom write.
        fps_v = latest_version(fps_dir)
        corpus_fps = latest_snapshot(spark, fps_dir)
        bloom = (
            None
            if fps_v is None
            else snapshot_at_or_below(spark, bloom_dir, fps_v)
        )
        if corpus_fps is None or bloom is None:
            raise RuntimeError(
                f"{state_dir} missing fps/bloom base snapshots — seed "
                "with write_base_snapshot before starting the stream"
            )
        batch = batch_df.localCheckpoint()
        admitted = exact_dedup_batch(
            batch, corpus_fps, bloom, id_col=id_col, text_col=text_col
        ).localCheckpoint()  # read 3x below: output, fps delta, bloom delta
        admitted.drop("_fp").write.mode("overwrite").parquet(
            os.path.join(adm_dir, f"v{batch_id + 1}")
        )
        new_bloom = (
            bloom.unionByName(
                bloom_build(
                    admitted.withColumn("_g", F.lit(_BLOOM_GROUP)),
                    text_col,
                    group_col="_g",
                )
            )
            .groupBy("_g", "word_idx")
            .agg(F.bit_or("word").alias("word"))
        )
        # bloom first, fps last: a crash between the two leaves the new
        # fps version uncommitted -> next run replays the whole batch.
        # On that replay the bloom target is already committed with
        # byte-identical content (same v{N} inputs, deterministic
        # OR-merge) — keep the committed-versions-are-immutable
        # discipline and skip it.
        if not bloom_committed:
            new_bloom.write.mode("overwrite").parquet(bloom_target)
        corpus_fps.unionByName(admitted.select("_fp")).write.mode(
            "overwrite"
        ).parquet(fps_target)

    return (
        docs_stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )

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

from data_pipeline_ine_spark.streaming.cdc import latest_snapshot


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

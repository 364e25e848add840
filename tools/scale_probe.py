"""Scale probe: do the heavy corpus operators scale linearly?

Generates a deterministic synthetic corpus N× the size of sf0.1 (same
shape/vocabulary as the driver's testdata: documents + embeddings), runs
the expensive contract queries against both, and reports the wall-clock
ratio vs the data ratio. A superlinear ratio flags a plan that would not
survive the 100 TB target (quadratic bucket joins, single-task windows,
driver-side collects).

The probe corpus lives under /tmp (never /root/testdata) and is generated
Spark-side — hash-derived words/vectors, no Python row loops.

Usage: python tools/scale_probe.py [factor] [queries...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import __spark_entry__ as contract
from data_pipeline_ine_spark.session import get_spark

SF01 = "/root/testdata/sf0.1"

VOCAB = (
    "key agg row scan slow fast table value part hash merge batch line sort "
    "window column query big small filter data group vector stream order "
    "customer join spark the a".split()
)

HEAVY = [
    "exact_dup_groups",
    "minhash_signature",
    "near_dup_buckets",
    "jaccard_pairs",
    "dedup_components",
    "simhash_fingerprints",
    "simhash_near_dup",
    "rolling_fingerprint",
    "embedding_near_dup",
    "ann_topk",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "ann_kmeans_topk",
    "text_stats",
    "quality_scores",
    "bpe_token_total",
    "contamination_overlap",
    "tfidf_top_terms",
    "curation_pipeline",
    "sequence_packing",
    "chunk_documents",
    "dedup_survivors",
    # round-3 corpus operators (knn_within_label is intentionally absent:
    # its Σ block² cost is bounded by re-sizing the block key at scale,
    # not by holding blocks fixed while the corpus grows — see docstring)
    "containment_pairs",
    "bm25_scores",
    "source_quality_gate",
    "unigram_logloss",
    # round-4 corpus operators (copurchase_lift / part_triangles read
    # lineitem, which the probe corpus doesn't generate — their scale
    # bounds are basket-size² and arboricity-bounded wedges, closed-form
    # tested in tests/test_graph.py)
    "bigram_logloss",
    "inverted_index",
    "quantile_normalize",
    "dup_cluster_sizes",
    # round-4 additions over the probe corpus (overlap_shipments /
    # part_bfs_hops / zorder_keys read TPC-H tables — their bounds are
    # grid-cell occupancy, frontier size, and a pure projection, pinned by
    # plan/property tests instead)
    "ppjoin_exact",
    "incremental_dedup",
    "media_decode",
    "upsample_epochs",
    "shuffle_rank",
    # round-5 corpus operators (grid_nearest_depot / pareto_parts read
    # TPC-H tables — their bounds are cell occupancy and distinct-price
    # cardinality, pinned by plan tests); the incremental family's
    # fixed-changelog steady state is probed by tools/incremental_probe.py
    "pmi_collocations",
    # round-5 second wave over the probe corpus (cms_heavy_hitters /
    # ewma_value / level_shift / grouped_ols / table_reconcile read
    # events/lineitem, which the probe doesn't scale — their bounds are
    # O(d·w) sketch cells, bounded window frames, moment sums, and
    # n_buckets cells, pinned by plan/unit tests instead)
    "dup_span_ratio",
    "pq_topk",
    "pq_dedup_groups",
    "rp_cosine_consecutive",
    "hashed_features",
    # round-5 third wave over the probe corpus (ra_link_prediction reads
    # lineitem — its wedge bound is Σ deg², hub-cappable, pinned by
    # tests/test_graph.py)
    "boilerplate_scrub",
    "bloom_membership",
    "image_dhash",
    # round-5 fourth wave over the probe corpus (ks_drift/peak_concurrency/
    # log2_histogram/poisson_bootstrap read events/lineitem/orders — their
    # bounds are distinct-instant windows, <=64 buckets, and B-way explode
    # with map-side combine, pinned by closed-form/statistical pytests)
    "corpus_datacard",
    # round-6 corpus operators (modal_event_type / pseudonymize_users /
    # rolling_7d_users / user_max_gap read events, which the probe
    # doesn't scale — their bounds are two same-key hash aggregates, a
    # narrow projection, a 7x activity-grain explode, and a single
    # user-keyed exchange, pinned by plan tests)
    "dup_weighted_docs",
    "split_leakage",
    "source_ngram_diversity",
    "k_anonymity",
    "decile_lift",
    # round-6 second wave over the probe corpus (acf/dow/cusum/kaplan/
    # theil_sen are calendar-bounded by construction; kmv/rfm/column_
    # entropy/k_core read events/orders/lineitem, which the probe doesn't
    # scale — their bounds are bottom-k windows, a customer-grain
    # aggregate, vocab-bounded counts, and edge-bounded peeling rounds,
    # pinned by unit/fixpoint tests)
    "readability_scores",
    # round-7: the ANN serving layouts (write+probe end to end over the
    # probe corpus; the probed scan must track n_probe/n_buckets of the
    # data, the write one corpus pass)
    "ann_index_probe",
    "ann_ivfpq_probe",
    # round-9 second wave over the probe corpus (seasonal_decompose /
    # skyline_parts read orders/part, which the probe doesn't scale —
    # their bounds are the calendar grain and distinct-price grain,
    # pinned by the lint allowlists + unit tests)
    "ann_sq8_probe",
    "ann_sq8_batch_probe",
    "perplexity_buckets",
    "text_normalize",
    "t_closeness",
    "curriculum_order",
    # round-12 quantized-tier lifecycle + prefix tier over the probe
    # corpus: append fixtures pay one base write + one frozen-param
    # routed append, drift reports are posexplode maps + |dim|-group
    # aggregates, rebuilds pay the full-corpus k-means any rebuild
    # pays, serving rows a pruned scan — all corpus-linear
    "sq8_append_probe",
    "binary_append_probe",
    "sq8_quant_drift",
    "binary_quant_drift",
    "sq8_rebuild",
    "binary_rebuild",
    "ann_binary_batch",
    "ann_prefix_stored",
    "ann_prefix_filtered",
    "ann_prefix_batch",
    "ann_ivfpq_filtered",
    "pq_quant_drift",
    "ivfpq_rebuild",
]


def generate(spark, out_dir: str, factor: int) -> None:
    n_docs = 5000 * factor
    n_vecs = 2000 * factor
    # Heaps' law: real corpora grow vocabulary ~ corpus^beta (beta ≈ 0.5).
    # A FIXED vocabulary makes token/shingle document frequency scale
    # linearly with corpus size, which drives any similarity join —
    # including the quadratic ground-truth oracle — superlinear for
    # reasons that are a property of the DATA, not the plan. Words here
    # are Zipf-ish over a size-scaled vocabulary: a 31-word common head
    # (frequent function words) plus a hash-derived tail whose size grows
    # with the corpus, so df stays corpus-share-bounded for the head and
    # absolutely bounded for the tail — the shape prefix filters and LSH
    # banding are designed for.
    tail_vocab = max(1000, int(24 * (n_docs ** 0.55)))
    head = F.array(*[F.lit(w) for w in VOCAB])
    words_per_doc = (F.pmod(F.xxhash64(F.col("id")), F.lit(160)) + 40).cast("int")

    def word(i):
        h = F.xxhash64(F.col("id") * 1000 + i)
        # ~30% head words, 70% tail words (Zipf-ish head/tail split)
        return F.when(
            F.pmod(h, F.lit(10)) < 3,
            F.element_at(
                head, (F.pmod(h, F.lit(len(VOCAB))) + 1).cast("int")
            ),
        ).otherwise(
            F.concat(
                F.lit("w"),
                F.pmod(F.xxhash64(h), F.lit(tail_vocab)).cast("string"),
            )
        )

    docs = (
        spark.range(n_docs)
        .select(
            F.col("id").alias("doc_id"),
            F.array_join(
                F.transform(F.sequence(F.lit(1), words_per_doc), word),
                " ",
            ).alias("text"),
            F.lit("en").alias("lang"),
            F.concat(
                F.lit("src"), F.pmod(F.col("id"), F.lit(20)).cast("string")
            ).alias("source"),
        )
        .withColumn("n_chars", F.length("text").cast("bigint"))
    )
    docs.repartition(32).write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")
    vecs = spark.range(n_vecs).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(64)),
            lambda i: (
                (F.pmod(F.xxhash64(F.col("id") * 64 + i), F.lit(2001)) - 1000)
                / 1000.0
            ).cast("float"),
        ).alias("embedding"),
        F.pmod(F.col("id"), F.lit(10)).cast("int").alias("label"),
    )
    vecs.repartition(32).write.mode("overwrite").parquet(f"{out_dir}/embeddings.parquet")
    # corpus queries only touch documents/embeddings; link the rest so
    # load_table resolves every name
    for t in (
        "region nation customer supplier part orders lineitem events".split()
    ):
        src = f"{SF01}/{t}.parquet"
        dst = f"{out_dir}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(src, dst)


def time_query(fn, spark, sf_dir: str, reps: int = 2) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        fn(spark, sf_dir).count()
        best = min(best, time.time() - t0)
    return best


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    names = sys.argv[2:] or HEAVY
    # Baseline is a GENERATED 1x corpus, not /root/testdata: both points
    # must come from the same generator (same vocabulary-growth law) or
    # the ratio measures corpus-shape differences instead of plan scaling.
    base_dir = "/tmp/scale_probe_sf1x"
    out_dir = f"/tmp/scale_probe_sf{factor}x"
    spark = get_spark()
    for d, f in ((base_dir, 1), (out_dir, factor)):
        if not os.path.exists(f"{d}/embeddings.parquet"):
            print(f"generating {f}x corpus at {d}", flush=True)
            generate(spark, d, f)
    queries = contract.queries()
    print(f"{'query':28s} {'1x':>8s} {factor:>7d}x {'ratio':>7s}")
    flagged = []
    for name in names:
        fn = queries[name]
        t1 = time_query(fn, spark, base_dir)
        t2 = time_query(fn, spark, out_dir)
        ratio = t2 / max(t1, 1e-9)
        mark = ""
        # fixed overhead makes small ratios meaningless; only flag when the
        # big run is slow AND superlinear vs the data ratio
        if t2 > 2.0 and ratio > 1.6 * factor:
            mark = "  <-- SUPERLINEAR"
            flagged.append(name)
        print(f"{name:28s} {t1:8.2f} {t2:8.2f} {ratio:6.1f}x{mark}", flush=True)
    print(f"\nflagged: {flagged or 'none'}")


if __name__ == "__main__":
    main()

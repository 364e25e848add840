"""Connected-components unit tests: pointer-jumping convergence on
high-diameter graphs and loud failure when the iteration budget is too
small (silent wrong clusters are the failure mode ADVICE r1 flagged)."""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_pipeline_ine_spark.operators.dedup import dedup_components


def _pairs(spark, edges):
    return spark.createDataFrame(edges, "a_id long, b_id long")


def test_components_transitive_closure(spark):
    # two chains and a singleton pair: {1,2,3,4}, {10,11}, {20,21}
    got = dedup_components(
        _pairs(spark, [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21)])
    )
    comp = {r.doc_id: r.component for r in got.collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20}


def test_components_high_diameter_converges_logarithmically(spark):
    # a 200-node path has diameter 199: one-hop propagation alone would
    # need ~199 rounds; pointer jumping must finish well inside 10
    n = 200
    got = dedup_components(_pairs(spark, [(i, i + 1) for i in range(n)]))
    rows = got.collect()
    assert len(rows) == n + 1
    assert {r.component for r in rows} == {0}


def test_components_raises_when_budget_too_small(spark):
    with pytest.raises(RuntimeError, match="fixpoint"):
        dedup_components(
            _pairs(spark, [(i, i + 1) for i in range(200)]), max_iters=2
        )


def test_bands_for_hamming_sizing_rule():
    from data_pipeline_ine_spark.operators.dedup import bands_for_hamming

    assert bands_for_hamming(0) == 1
    assert bands_for_hamming(1) == 2
    assert bands_for_hamming(3) == 4
    assert bands_for_hamming(4) == 8
    assert bands_for_hamming(7) == 8
    assert bands_for_hamming(8) == 16
    assert bands_for_hamming(15) == 16
    with pytest.raises(ValueError):
        bands_for_hamming(16)
    with pytest.raises(ValueError):
        bands_for_hamming(-1)


@pytest.mark.parametrize("max_hamming", [3, 7])
def test_simhash_banding_guaranteed_recall(spark, max_hamming):
    """With n_bands = bands_for_hamming(h), the band-blocked pairs must
    equal the brute-force all-pairs set at Hamming <= h (pigeonhole is a
    guarantee, not a heuristic)."""
    from pyspark.sql import functions as F

    from data_pipeline_ine_spark.operators.dedup import (
        bands_for_hamming,
        simhash_band_ints,
        simhash_hex,
        simhash_near_dup_pairs,
    )
    from data_pipeline_ine_spark.sources.registry import load_table

    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    docs = load_table(spark, sf_dir, "documents").limit(200)

    n_bands = bands_for_hamming(max_hamming)
    got = {
        (r.a_id, r.b_id, r.hamming)
        for r in simhash_near_dup_pairs(
            docs, max_hamming=max_hamming, n_bands=n_bands
        ).collect()
    }

    # brute force: full hamming over every pair (band-int sum == 64-bit xor)
    sim = docs.select(
        "doc_id", simhash_band_ints(simhash_hex("text")).alias("bands")
    ).localCheckpoint(eager=False)
    a, b = sim.alias("a"), sim.alias("b")
    hamming = F.aggregate(
        F.zip_with(
            F.col("a.bands"),
            F.col("b.bands"),
            lambda x, y: F.bit_count(x.bitwiseXOR(y)),
        ),
        F.lit(0),
        lambda acc, d: acc + d,
    )
    want = {
        (r.a_id, r.b_id, r.hamming)
        for r in a.crossJoin(b)
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("a_id"),
            F.col("b.doc_id").alias("b_id"),
            hamming.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .collect()
    }
    assert got == want


def test_ppjoin_no_nested_loop_and_matches_bruteforce(spark, sf_dir):
    """Prefix filtering must (a) plan as equi-joins — never a cartesian /
    nested-loop stage — and (b) return exactly the brute-force Jaccard>=t
    pairs (100% recall is the operator's defining claim vs LSH)."""
    from pyspark.sql import functions as F

    from data_pipeline_ine_spark.operators.dedup import prefix_filter_jaccard_join
    from data_pipeline_ine_spark.sources.registry import load_table

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    out = prefix_filter_jaccard_join(docs)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan

    got = {(r.a_id, r.b_id): r.jaccard for r in out.collect()}

    sets = {
        r.doc_id: frozenset(r.text.split())
        for r in docs.select("doc_id", "text").collect()
        if r.text and r.text.split()
    }
    ids = sorted(sets)
    want = {}
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            inter = len(sets[a] & sets[b])
            uni = len(sets[a] | sets[b])
            if inter * 5 >= uni * 3:
                want[(a, b)] = round(inter / uni, 6)
    assert got == want


def test_incremental_dedup_drops_only_corpus_near_dups(spark):
    from data_pipeline_ine_spark.operators.dedup import incremental_near_dup_filter

    corpus_text = "the quick brown fox jumps over the lazy dog again and again"
    rows_corpus = [(i, corpus_text) for i in range(1, 4)]
    rows_new = [
        (100, corpus_text),                        # exact dup of corpus -> drop
        (101, corpus_text + " tail"),              # near dup -> drop
        (102, "completely different subject matter with novel words only"),
    ]
    corpus = spark.createDataFrame(rows_corpus, "doc_id long, text string")
    new = spark.createDataFrame(rows_new, "doc_id long, text string")
    kept = sorted(
        r.doc_id for r in incremental_near_dup_filter(new, corpus).collect()
    )
    assert kept == [102]
    # survivors keep their full payload
    out = incremental_near_dup_filter(new, corpus).collect()
    assert out[0].text.startswith("completely different")


# ---------------------------------------------------------------------------
# int8 embedding quantization
# ---------------------------------------------------------------------------
def test_quantize_embeddings_bounds_and_determinism(spark, sf_dir):
    import numpy as np

    from data_pipeline_ine_spark.operators.similarity import quantize_embeddings
    from data_pipeline_ine_spark.sources.registry import load_table

    emb = load_table(spark, sf_dir, "embeddings").limit(100)
    out = {r.vec_id: r for r in quantize_embeddings(emb).collect()}
    src = {r.vec_id: list(r.embedding) for r in emb.collect()}
    assert set(out) == set(src)
    for vid, r in out.items():
        xs = np.asarray(src[vid], dtype=np.float64)
        amax = float(np.abs(xs).max())
        assert abs(r.scale - amax) < 1e-6
        q = np.asarray(r.qvec, dtype=np.int64)
        assert q.min() >= -127 and q.max() <= 127
        # dequantization error bounded by scale/254 per component
        deq = q * amax / 127.0
        assert float(np.abs(deq - xs).max()) <= amax / 254.0 + 1e-9
    again = {r.vec_id: list(r.qvec) for r in quantize_embeddings(emb).collect()}
    assert all(again[v] == list(out[v].qvec) for v in out)


def test_quantized_topk_recall_vs_exact(spark, sf_dir):
    from data_pipeline_ine_spark.operators.similarity import (
        brute_force_topk,
        quantize_embeddings,
        quantized_topk,
    )
    from data_pipeline_ine_spark.sources.registry import load_table

    from pyspark.sql import functions as F

    emb = load_table(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).first().embedding
    exact = [r.vec_id for r in brute_force_topk(emb, qvec, k=10).collect()]
    approx = [
        r.vec_id
        for r in quantized_topk(quantize_embeddings(emb), qvec, k=10).collect()
    ]
    # int8 error is tiny relative to cosine gaps: near-total agreement
    assert len(set(exact) & set(approx)) >= 8
    assert approx[0] == exact[0]  # the query's own vector tops both


def test_near_dup_survivors_keep_highest_quality(spark):
    from pyspark.sql import functions as F

    from data_pipeline_ine_spark.operators.dedup import near_dup_survivors

    docs = spark.createDataFrame(
        [
            # cluster A: 10~11 near-dups; 11 has higher quality -> kept
            (10, "the quick brown fox jumps over the lazy sleeping dog", 0.4),
            (11, "the quick brown fox jumps over the lazy sleeping cat", 0.9),
            # cluster B: 20~21~22 chain; 20 highest quality
            (20, "spark shuffles partition data across the cluster fabric", 0.8),
            (21, "spark shuffles partition data across the cluster network", 0.7),
            (22, "spark shuffles partition data across the network fabric", 0.6),
            # unclustered
            (30, "completely unrelated text about cooking pasta and garlic", 0.5),
        ],
        "doc_id long, text string, quality double",
    )
    # rows_per_band=1: per-band match prob = J, 16 bands -> recall
    # 1-(1-J)^16, negligible miss at J>=0.5 (the default 4x4 banding is
    # tuned for corpus scale, not 6-doc tests)
    out = {
        r.doc_id: r
        for r in near_dup_survivors(docs, "quality", rows_per_band=1).collect()
    }
    assert set(out) == {11, 20, 30}
    assert out[11].group_size == 2
    assert out[20].group_size == 3
    assert out[30].group_size == 1
    # survivors carry their original payload untouched
    assert out[30].quality == 0.5
    # equal quality -> min id wins
    eq = docs.withColumn("quality", F.lit(1.0))
    out2 = {
        r.doc_id
        for r in near_dup_survivors(eq, "quality", rows_per_band=1).collect()
    }
    assert out2 == {10, 20, 30}


# --- product quantization ---------------------------------------------------


def _emb(spark, sf_dir):
    from data_pipeline_ine_spark.sources.registry import load_table

    return load_table(spark, sf_dir, "embeddings")


def test_pq_codebook_vectors_encode_to_themselves(spark, sf_dir):
    """A codebook source vector has distance 0 to its own code in every
    subspace, so it must encode to [its index] * m exactly."""
    from data_pipeline_ine_spark.operators.similarity import (
        pq_codebook,
        pq_encode,
    )

    emb = _emb(spark, sf_dir)
    cb = pq_codebook(emb, m=4, n_codes=8)
    ids = [r["vec_id"] for r in emb.orderBy("vec_id").limit(8).collect()]
    codes = {
        r["vec_id"]: r["pq_codes"]
        for r in pq_encode(emb, cb).filter(F.col("vec_id").isin(ids)).collect()
    }
    for c, vid in enumerate(ids):
        assert codes[vid] == [c] * 4, (vid, codes[vid])


def test_pq_topk_query_equals_codeword_ranks_it_first(spark, sf_dir):
    """Querying WITH a codebook vector: ADC distance to that vector is 0
    (its LUT entries are hit exactly), so it ranks first."""
    from data_pipeline_ine_spark.operators.similarity import (
        pq_codebook,
        pq_encode,
        pq_topk,
    )

    emb = _emb(spark, sf_dir)
    cb = pq_codebook(emb, m=4, n_codes=8)
    first = emb.orderBy("vec_id").limit(1).collect()[0]
    out = pq_topk(pq_encode(emb, cb), cb, first["embedding"], k=3).collect()
    assert out[0]["vec_id"] == first["vec_id"]
    assert out[0]["pq_dist"] == 0


def test_pq_trained_codebook_beats_selected_on_quantization_error(
    spark, sf_dir
):
    """``pq_codebook(trained=True)`` (per-subspace kmeans_fit, the
    production path) must keep the selected-by-id output structure —
    m subspaces × n_codes integer codewords — and cut the corpus total
    squared reconstruction error vs the selection-by-id contract path
    (k-means' objective IS quantization MSE; top-k recall is too noisy
    on 500 synthetic vectors to assert on)."""
    from data_pipeline_ine_spark.operators.similarity import (
        PQ_SCALE,
        pq_codebook,
        pq_encode,
    )

    emb = _emb(spark, sf_dir)

    def recon_error(cb):
        m, sub = len(cb), len(cb[0][0])
        j = emb.join(pq_encode(emb, cb), "vec_id")
        err = F.lit(0).cast("bigint")
        for s in range(m):
            cblit = F.array(
                *[
                    F.array(*[F.lit(v).cast("bigint") for v in code])
                    for code in cb[s]
                ]
            )
            for d in range(sub):
                vi = F.floor(
                    F.element_at("embedding", s * sub + d + 1).cast("double")
                    * PQ_SCALE
                    + F.lit(0.5)
                ).cast("bigint")
                cw = F.element_at(
                    F.element_at(cblit, F.element_at("pq_codes", s + 1) + 1),
                    d + 1,
                )
                err = err + (vi - cw) * (vi - cw)
        return j.select(F.sum(err).alias("e")).collect()[0]["e"]

    sel = pq_codebook(emb, m=4, n_codes=8)
    trn = pq_codebook(emb, m=4, n_codes=8, trained=True)
    assert len(trn) == 4 and all(len(s) == 8 for s in trn)
    assert all(len(c) == len(sel[0][0]) for s in trn for c in s)
    assert recon_error(trn) < recon_error(sel)


def test_pq_recall_vs_exact_topk(spark, sf_dir):
    """PQ is lossy but must stay useful: with an 8-entry codebook over
    this corpus, the ADC top-10 for a held-out query shares members with
    the exact L2 top-10 (sanity floor, not a tuned benchmark)."""
    from data_pipeline_ine_spark.operators.similarity import (
        pq_codebook,
        pq_encode,
        pq_topk,
    )

    emb = _emb(spark, sf_dir)
    cb = pq_codebook(emb, m=4, n_codes=8)
    q = emb.orderBy(F.desc("vec_id")).limit(1).collect()[0]["embedding"]
    approx = {r["vec_id"] for r in pq_topk(pq_encode(emb, cb), cb, q, k=10).collect()}
    qlit = F.array(*[F.lit(float(x)) for x in q])
    exact_dist = F.aggregate(
        F.zip_with(
            F.col("embedding"),
            qlit,
            lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    exact = {
        r["vec_id"]
        for r in emb.select("vec_id", exact_dist.alias("d"))
        .orderBy("d", "vec_id")
        .limit(10)
        .collect()
    }
    assert len(approx & exact) >= 1, (approx, exact)


def test_random_projection_preserves_relative_distances(spark, sf_dir):
    """JL property: 64→16 projection keeps pairwise distance RATIOS
    concentrated — per consecutive pair, projected/original distance
    normalized by the median ratio stays within a 2x band for ~all
    pairs (loose bound; the point is no collapse and no blow-up)."""
    from data_pipeline_ine_spark.operators.similarity import random_projection

    emb = _emb(spark, sf_dir)
    proj = random_projection(emb, out_dim=16)

    def pair_dist(df, col, alias):
        a = df.select(F.col("vec_id"), F.col(col).alias("xa"))
        b = df.select((F.col("vec_id") - 1).alias("vec_id"), F.col(col).alias("xb"))
        d = F.sqrt(
            F.aggregate(
                F.zip_with(
                    F.col("xa"),
                    F.col("xb"),
                    lambda u, v: (u.cast("double") - v.cast("double"))
                    * (u.cast("double") - v.cast("double")),
                ),
                F.lit(0.0),
                lambda acc, t: acc + t,
            )
        )
        return a.join(b, "vec_id").select("vec_id", d.alias(alias))

    orig = pair_dist(emb.select("vec_id", F.col("embedding").alias("v")), "v", "d0")
    pr = pair_dist(proj.select("vec_id", F.col("proj").alias("v")), "v", "d1")
    rows = orig.join(pr, "vec_id").filter(F.col("d0") > 0).collect()
    ratios = sorted(r["d1"] / r["d0"] for r in rows)
    med = ratios[len(ratios) // 2]
    assert med > 0
    within = [r for r in ratios if 0.5 * med <= r <= 2.0 * med]
    assert len(within) / len(ratios) > 0.98, (
        ratios[0] / med,
        ratios[-1] / med,
    )


def test_dup_weighted_docs_weights_every_row(spark):
    """Soft dedup: unique docs weigh 1e6, an n-family 1e6 div n; every
    input row keeps exactly one output row."""
    from data_pipeline_ine_spark.operators.dedup import dup_weighted_docs

    df = spark.createDataFrame(
        [(1, "same text"), (2, "same text"), (3, "same  text"), (4, "other")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: (r.n_copies, r.weight_e6)
            for r in dup_weighted_docs(df).collect()}
    # whitespace-normalized fingerprint: docs 1-3 are one family
    assert rows == {
        1: (3, 333333), 2: (3, 333333), 3: (3, 333333), 4: (1, 1000000)
    }


def test_split_leakage_counts_cross_split_pairs(spark):
    """An off-diagonal (train, val) row must appear when a near-dup
    pair crosses the split boundary, with least/greatest ordering."""
    from data_pipeline_ine_spark.operators.dedup import split_leakage

    text = "alpha beta gamma delta epsilon zeta eta theta"
    df = spark.createDataFrame(
        [(1, text, "train"), (2, text, "val"), (3, text + " iota", "train")],
        "doc_id long, text string, split string",
    )
    got = {
        (r.split_a, r.split_b): r.n_pairs
        for r in split_leakage(df, threshold=0.5).collect()
    }
    assert got.get(("train", "val"), 0) >= 1     # the leak
    assert all(a <= b for a, b in got)


def test_knn_hubness_histogram_conserves_vectors(spark, sf_dir):
    """The hubness histogram is a partition of each label block (sizes
    sum to the block size), total k-occurrence mass equals k·|block|
    (every vector emits exactly k votes), and antihubs (n_k = 0) are
    retained by the left join."""
    from data_pipeline_ine_spark.operators.similarity import knn_hubness

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    block_sizes = {
        r.label: r.n
        for r in emb.groupBy("label").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    out = knn_hubness(emb, k=5).collect()
    per_label_n = {}
    per_label_mass = {}
    for r in out:
        per_label_n[r.label] = per_label_n.get(r.label, 0) + r.n_vectors
        per_label_mass[r.label] = (
            per_label_mass.get(r.label, 0) + r.n_k * r.n_vectors
        )
    assert per_label_n == block_sizes
    for label, size in block_sizes.items():
        assert per_label_mass[label] == 5 * size


def test_knn_ivf_block_recall_and_pair_bound(spark, sf_dir):
    """The IVF block key (ivf_clusters=...) must (a) bound the pair
    explosion — Σ block·(block−1) sub-quadratic vs n² — and (b) keep
    useful recall vs the EXACT all-pairs kNN (single constant block):
    measured, not guessed, per the recall-curve discipline. Cluster
    blocks only surface same-cluster neighbors, so recall < 1 by
    design; the floor asserts the assignment is geometry-driven, not
    arbitrary."""
    from data_pipeline_ine_spark.operators.similarity import (
        knn_join_blocked,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.count()
    exact = knn_join_blocked(
        emb.withColumn("one", F.lit(0)), k=3, block_col="one"
    )
    truth = {
        (r.vec_id, r.neighbor_id) for r in exact.collect()
    }
    ivf = knn_join_blocked(emb, k=3, ivf_clusters=8)
    # (a) pair bound: blocks are ~n/8, so pair volume ≪ n²
    sizes = [
        r.n
        for r in ivf.groupBy("block")
        .agg(F.countDistinct("vec_id").alias("n"))
        .collect()
    ]
    pair_volume = sum(s * (s - 1) for s in sizes)
    assert pair_volume < (n * n) // 4
    # (b) measured recall vs exact, judged against the RANDOM-partition
    # baseline: a random assignment with the same block sizes would
    # recall ≈ Σ s(s−1) / n(n−1) of the true pairs; geometry-driven
    # clustering must beat it decisively (2×). Measured here: ~0.31 vs
    # ~0.15 baseline on the sf0.001 embeddings.
    got = {(r.vec_id, r.neighbor_id) for r in ivf.collect()}
    recall = len(truth & got) / len(truth)
    baseline = pair_volume / (n * (n - 1))
    assert recall >= 2.0 * baseline, (
        f"IVF-block recall {recall:.2f} vs random baseline {baseline:.2f}"
    )
    assert recall >= 0.2, f"IVF-block recall {recall:.2f} below floor"


def test_pq_recall_curve_perfect_codebook_and_bounds(spark):
    """With n_codes == |corpus| every vector IS a codeword, ADC distance
    equals exact quantized distance, and recall@k = 1.0 at every k;
    recall is always in [0,1] and hits ≤ k·n_queries on the real data."""
    import random

    from data_pipeline_ine_spark.operators.similarity import pq_recall_curve

    rnd = random.Random(7)
    rows = [
        (i, [rnd.uniform(-1, 1) for _ in range(8)]) for i in range(8)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = pq_recall_curve(
        df, m=2, n_codes=8, ks=(1, 3), n_queries=4
    ).collect()
    assert {r.k: r.recall for r in out} == {1: 1.0, 3: 1.0}
    for r in out:
        assert r.hits == r.k * r.n_queries


def test_ivf_recall_curve_monotone_and_saturates(spark, sf_dir):
    """Recall@k never decreases as n_probe grows (probing more cells
    can only add candidates), and at n_probe = |cells| it is exactly
    1.0 (every cell probed = exact search)."""
    from data_pipeline_ine_spark.operators.similarity import (
        ivf_recall_curve,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n_cells = emb.select("label").distinct().count()
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    out = ivf_recall_curve(
        emb, qvec, n_probes=(1, 2, n_cells), k=10
    ).collect()
    recalls = [r.recall for r in sorted(out, key=lambda r: r.n_probe)]
    assert recalls == sorted(recalls)
    assert recalls[-1] == 1.0


def test_lsh_recall_curve_monotone_in_bands(spark, sf_dir):
    """More bands (fewer rows each) never lowers recall — the banding
    probability 1-(1-j^r)^b is monotone in b at fixed b·r — and at
    8 bands of 1 row a pair needs only ONE colliding hash, so recall
    must be at least the 4-band figure; counts reconcile (hits ≤
    min(n_true, n_candidates))."""
    from data_pipeline_ine_spark.operators.dedup import lsh_recall_curve

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.col("doc_id") < 200
    )
    out = sorted(
        lsh_recall_curve(docs, band_configs=(2, 4, 8), tau=0.5).collect(),
        key=lambda r: r.n_bands,
    )
    recalls = [r.recall for r in out]
    assert recalls == sorted(recalls)
    assert all(r.hits <= min(r.n_true, r.n_candidates) for r in out)
    assert len({r.n_true for r in out}) == 1  # truth independent of bands


def test_kmeans_cluster_profile_survives_emptied_cluster(spark):
    """kmeans_fit keys clusters on seed vec_ids; a seed cluster that
    empties during a Lloyd iteration drops out, leaving NON-contiguous
    ids. The profile must look centroids up by id — a positional
    element_at pairs rows with the wrong centroid (or NULLs past the
    end), corrupting the reported inertia (ADVICE r7, medium). Seeds 0
    and 1 are identical here, so every nearby point tie-breaks to
    cluster 0 and cluster 1 empties after the first assignment."""
    from data_pipeline_ine_spark.operators.similarity import (
        kmeans_cluster_profile,
        kmeans_fit,
        _assign_clusters,
    )

    rows = [
        (0, [0.0, 0.0]),
        (1, [0.0, 0.0]),   # duplicate seed -> cluster 1 empties
        (2, [10.0, 10.0]),
        (3, [0.1, 0.0]),
        (4, [0.0, 0.1]),
        (5, [10.1, 10.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = kmeans_fit(df, k=3, iters=2)
    ids = [cid for cid, _ in cents]
    assert 1 not in ids and ids != list(range(len(ids)))  # the gap is real

    got = {
        r.cluster: (r.n_vectors, r.inertia_e6)
        for r in kmeans_cluster_profile(df, n_clusters=3, iters=2).collect()
    }
    assert set(got) == set(ids)
    assert got[0][0] == 4 and got[2][0] == 2

    # recompute inertia independently: assign with the SAME centroids,
    # per-row sequential-fold sq dist, e6 snap, python sum
    by_id = dict(cents)
    expected = {cid: 0 for cid in by_id}
    counts = {cid: 0 for cid in by_id}
    for r in _assign_clusters(df, cents, "embedding").collect():
        cv = by_id[r.cluster]
        acc = 0.0
        for x, y in zip(r.embedding, cv):
            acc += (x - y) * (x - y)
        import math
        expected[r.cluster] += int(math.floor(acc * 1e6 + 0.5))
        counts[r.cluster] += 1
    assert {c: (counts[c], expected[c]) for c in expected} == got


def test_semantic_dedup_kept_set_has_no_pair_above_tau(spark, sf_dir):
    """SemDeDup core invariants: (a) the kept set contains NO
    within-cluster pair with cosine >= tau (if kept i<j were similar,
    j would have been dropped by i); (b) every dropped vector has an
    earlier-id justification above tau; (c) tau=1.01 keeps everything."""
    from pyspark.sql import functions as F

    from data_pipeline_ine_spark.operators.similarity import (
        cosine,
        semantic_dedup,
    )
    from data_pipeline_ine_spark.sources.registry import load_table

    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < 200
    )
    # the synthetic embeddings are near-orthogonal (p99 within-cluster
    # cosine ~0.32, max ~0.45) — tau sits inside the observed range so
    # the operator actually drops
    tau = 0.3
    kept = semantic_dedup(emb, tau=tau, n_clusters=4, iters=1)
    n_kept = kept.count()
    assert 0 < n_kept < 200  # it actually dropped something at tau=0.3

    k = kept.join(emb, "vec_id").select("cluster", "vec_id", "embedding")
    a = k.alias("a")
    b = k.select(
        "cluster",
        F.col("vec_id").alias("jid"),
        F.col("embedding").alias("jv"),
    ).alias("b")
    sim = F.round(cosine(F.col("a.embedding"), F.col("b.jv")), 6)
    offenders = (
        a.join(b, "cluster")
        .filter((F.col("jid") < F.col("a.vec_id")) & (sim >= tau))
        .count()
    )
    assert offenders == 0

    assert semantic_dedup(emb, tau=1.01, n_clusters=4, iters=1).count() == 200


def test_kmeans_fit_memo_returns_identical_copies(spark):
    """The trained-quantizer memo: same memo_key returns the IDENTICAL
    centroids without re-running Lloyd jobs, the returned lists are
    copies (caller mutation can't corrupt the cache), different keys
    retrain, and no-key calls never touch the memo."""
    from data_pipeline_ine_spark.operators import similarity as S

    df = spark.createDataFrame(
        [(i, [float(i % 5), float(i % 3)]) for i in range(40)],
        "vec_id long, embedding array<double>",
    )
    S._KMEANS_MEMO.clear()
    a = S.kmeans_fit(df, k=3, iters=1, memo_key="t1")
    assert len(S._KMEANS_MEMO) == 1
    b = S.kmeans_fit(df, k=3, iters=1, memo_key="t1")
    assert a == b and a is not b
    b[0][1][0] = 999.0  # mutate the returned copy
    c = S.kmeans_fit(df, k=3, iters=1, memo_key="t1")
    assert c == a  # cache unharmed
    S.kmeans_fit(df, k=3, iters=1, memo_key="t2")
    assert len(S._KMEANS_MEMO) == 2
    S.kmeans_fit(df, k=3, iters=1)
    assert len(S._KMEANS_MEMO) == 2  # keyless call bypasses
    S._KMEANS_MEMO.clear()


def test_semantic_dedup_injected_quantizer_matches_inline(spark, sf_dir):
    """Quantizer injection: passing the SAME trained centroids must
    reproduce the train-inline result exactly (the composed pipeline
    trains once on the full corpus and reuses the quantizer); a
    DIFFERENT quantizer (trained on a subset) may legitimately change
    cluster boundaries but the kept-set invariant still holds."""
    from pyspark.sql import functions as F

    from data_pipeline_ine_spark.operators.similarity import (
        kmeans_fit,
        semantic_dedup,
    )
    from data_pipeline_ine_spark.sources.registry import load_table

    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < 200
    )
    cents = kmeans_fit(emb, k=4, iters=1)
    inline = sorted(
        tuple(r) for r in semantic_dedup(
            emb, tau=0.3, n_clusters=4, iters=1
        ).collect()
    )
    injected = sorted(
        tuple(r) for r in semantic_dedup(
            emb, tau=0.3, centroids=cents
        ).collect()
    )
    assert injected == inline


def test_near_dup_filter_self_earlier_id_wins_and_threshold_boundary(spark):
    """Direct pin for near_dup_filter_self (previously exercised only
    through the composed curation_semantic query): the earlier id of a
    near-dup pair survives, the later drops; a pair AT the integer
    cross-multiplied threshold (Jaccard == num/den) drops (>= rule);
    unrelated docs pass through with payload intact."""
    from data_pipeline_ine_spark.operators.dedup import near_dup_filter_self

    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, base),                 # survivor (earliest id of the pair)
        (2, base + " tail"),       # near dup of 1 -> drop
        (3, "completely different subject matter with novel words only"),
        (4, base),                 # exact dup of 1 (Jaccard == 1) -> drop
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kept = sorted(
        r.doc_id for r in near_dup_filter_self(df).collect()
    )
    assert kept == [1, 3]
    out = {r.doc_id: r.text for r in near_dup_filter_self(df).collect()}
    assert out[3].startswith("completely different")

    # threshold boundary: at threshold_num/threshold_den == 1 (Jaccard
    # >= 1.0), ONLY the exact dup drops; the near dup survives
    kept_strict = sorted(
        r.doc_id
        for r in near_dup_filter_self(
            df, threshold_num=1, threshold_den=1
        ).collect()
    )
    assert kept_strict == [1, 2, 3]


def _boundary_fixture(spark):
    """Two well-separated 2-D clusters with ONE near-dup pair straddling
    the boundary: ids 0/1 seed the two cells, ids 2/3 sit just either
    side of the diagonal with cosine(2,3) ~ 0.99920 — above tau=0.99
    while every other pair is far below (max ~0.7212). After one Lloyd
    iteration the centroids are [2.45, 7.55] / [7.55, 2.45], so 2
    assigns to cell 0 and 3 to cell 1: single-probe blocking never
    tests the pair; 2-probe does."""
    return spark.createDataFrame(
        [
            (0, [0.0, 10.0], "A"),
            (1, [10.0, 0.0], "B"),
            (2, [4.9, 5.1], "A"),
            (3, [5.1, 4.9], "B"),
        ],
        "vec_id long, embedding array<double>, label string",
    )


def test_semantic_dedup_multiprobe_catches_boundary_pair(spark):
    """Hand-anchored meaning pin (the r9/r10 review lesson: oracle
    parity is blind to both-sides bugs): the boundary near-dup pair
    (2, 3) survives single-probe SemDeDup INTACT (the documented blind
    spot) and multi-probe n_probe=2 drops exactly the later id 3 —
    earlier-id-wins preserved across the boundary."""
    from data_pipeline_ine_spark.operators.similarity import semantic_dedup

    df = _boundary_fixture(spark)
    kept_1 = sorted(
        r.vec_id
        for r in semantic_dedup(df, tau=0.99, n_clusters=2, iters=1).collect()
    )
    assert kept_1 == [0, 1, 2, 3]  # blind spot: both boundary dups kept
    kept_2 = sorted(
        r.vec_id
        for r in semantic_dedup(
            df, tau=0.99, n_clusters=2, iters=1, n_probe=2
        ).collect()
    )
    assert kept_2 == [0, 1, 2]  # pair tested across the boundary, 3 drops
    # kept rows still carry the PRIMARY cell assignment
    prim = {
        r.vec_id: r.cluster
        for r in semantic_dedup(
            df, tau=0.99, n_clusters=2, iters=1, n_probe=2
        ).collect()
    }
    assert prim[2] != prim[1] and prim[0] == prim[2]


def test_semantic_dedup_recall_hand_anchored(spark):
    """The recall curve on the boundary fixture: exactly ONE exact
    >=tau pair exists, single-probe covers none of it (recall 0.0),
    2-probe covers all of it (recall 1.0) — the measured version of
    the blind spot semantic_dedup's docstring asserts."""
    from data_pipeline_ine_spark.operators.similarity import (
        semantic_dedup_recall,
    )

    df = _boundary_fixture(spark)
    rows = {
        (r.n_clusters, r.n_probe): r
        for r in semantic_dedup_recall(
            df, tau=0.99, n_clusters_list=(2,), n_probes=(1, 2), iters=1
        ).collect()
    }
    assert rows[(2, 1)].exact_pairs == 1
    assert rows[(2, 1)].covered_pairs == 0
    assert rows[(2, 1)].recall == 0.0
    assert rows[(2, 2)].covered_pairs == 1
    assert rows[(2, 2)].recall == 1.0


def test_hard_negative_mining_multiprobe_finds_cross_cluster_negative(spark):
    """Anchor 2 (label A) shares its primary cell only with same-label
    id 0, so single-probe mining emits NOTHING for it — its true hard
    negative (id 3, cosine ~0.9992) sits just across the boundary.
    n_probe=2 probes the second cell and surfaces id 3 at rank 1,
    with the far negative id 1 behind it."""
    from pyspark.sql import functions as F

    from data_pipeline_ine_spark.operators.similarity import (
        hard_negative_mining,
    )

    df = _boundary_fixture(spark)
    single = hard_negative_mining(df, k=2, ivf_clusters=2, ivf_iters=1)
    assert single.filter(F.col("vec_id") == 2).count() == 0
    multi = hard_negative_mining(
        df, k=2, ivf_clusters=2, ivf_iters=1, n_probe=2
    )
    got = [
        (r.neighbor_id, r.rank)
        for r in multi.filter(F.col("vec_id") == 2)
        .orderBy("rank")
        .collect()
    ]
    assert got == [(3, 1), (1, 2)]
    # candidates stay in their primary cell: no (anchor, neighbor)
    # pair is emitted twice even though anchors probe two cells
    assert (
        multi.groupBy("vec_id", "neighbor_id").count()
        .filter(F.col("count") > 1).count() == 0
    )


def test_knn_graph_memo_evicts_dead_application_entries(spark):
    """ADVICE r10: inserting under a live applicationId drops memo
    entries keyed by any OTHER applicationId (stopped-session frames
    hold dead JVM refs), and the scoped graph_memo_disabled() context
    manager restores the audit flag even on error."""
    import pytest

    from data_pipeline_ine_spark.operators import similarity as S
    from data_pipeline_ine_spark.sources.registry import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    S._KNN_GRAPH_MEMO.clear()
    S._KNN_GRAPH_MEMO[("dead-app-id", "stale", 5)] = object()
    out = S.knn_join_blocked(emb, k=2, ivf_clusters=4, memo_key="evict-t")
    assert out.count() > 0
    live_app = spark.sparkContext.applicationId
    assert all(k[0] == live_app for k in S._KNN_GRAPH_MEMO)
    assert len(S._KNN_GRAPH_MEMO) == 1

    assert S.GRAPH_MEMO_DISABLED is False
    with pytest.raises(RuntimeError):
        with S.graph_memo_disabled():
            assert S.GRAPH_MEMO_DISABLED is True
            raise RuntimeError("boom")
    assert S.GRAPH_MEMO_DISABLED is False
    S._KNN_GRAPH_MEMO.clear()


def test_binary_quantization_hand_anchored(spark):
    """Worked example pinning the packed sign-bit codes and Hamming
    serving: 3-dim vectors, per-dim midpoints (min+max)/2 = (1.0, 1.0,
    1.0); codes (bits dim0..2) — v0 [2,0,2] -> 0b101=5, v1 [0,2,2] ->
    0b110=6, v2 [2,2,0] -> 0b011=3, v3 [.5,.5,.5] -> 0. Query = v0:
    Hamming 0/2/2/2 with id tiebreak, so shortlist=3 keeps {0,1,2} and
    v3 (Hamming 2, id 3) is cut DESPITE being the best cosine after the
    query itself (2/sqrt(6) ~ 0.8165 > 0.5) — exactly the shortlist
    miss the recall curve prices: budget 1 rescoring only v0 gives
    recall 0.5 vs the exact top-2 {0, 3}; budget 4 (= corpus) recovers
    it at 1.0."""
    from data_pipeline_ine_spark.operators.similarity import (
        binary_midpoints,
        binary_recall_curve,
        binary_topk_rerank,
    )

    df = spark.createDataFrame(
        [
            (0, [2.0, 0.0, 2.0]),
            (1, [0.0, 2.0, 2.0]),
            (2, [2.0, 2.0, 0.0]),
            (3, [0.5, 0.5, 0.5]),
        ],
        "vec_id long, embedding array<double>",
    )
    assert binary_midpoints(df) == [1.0, 1.0, 1.0]
    got = [
        (r.vec_id, r.hamming, r.cosine_sim)
        for r in binary_topk_rerank(
            df, [2.0, 0.0, 2.0], k=3, shortlist=3
        ).collect()
    ]
    # shortlist {0,1,2} by (hamming, id); rescore: cos(v0,v0)=1,
    # cos(v0,v1)=4/8=0.5, cos(v0,v2)=4/8=0.5 (id tiebreak 1 before 2)
    assert got == [(0, 0, 1.0), (1, 2, 0.5), (2, 2, 0.5)]

    curve = {
        r.shortlist: r.recall
        for r in binary_recall_curve(
            df, [2.0, 0.0, 2.0], shortlists=(1, 4), k=2
        ).collect()
    }
    # budget 1: only v0 rescored -> 1 of the exact top-2 -> 0.5;
    # budget 4 (= corpus): rescore everything -> exact -> 1.0
    assert curve == {1: 0.5, 4: 1.0}


def test_prefix_dim_rerank_hand_anchored(spark):
    """Worked example pinning the Matryoshka two-stage semantics: v1's
    2-dim PREFIX is perfectly aligned with the query (prefix cosine
    1.0) but its full vector is orthogonal (cosine 0.0), while v2 is
    the true neighbor (full cosine ~0.8165) with a weaker prefix
    (~0.7071). With prefix=2 and shortlist=2 the first pass admits
    {0, 1} (prefix tie 1.0, id order) and the true neighbor v2 never
    reaches the rescore — recall@2 = 0.5; prefix=4 makes the first
    pass exact and recovers 1.0. This is exactly the truncation risk
    prefix_dim_recall_curve measures (on non-MRL embeddings leading
    dims carry no privileged information)."""
    from data_pipeline_ine_spark.operators.similarity import (
        prefix_dim_recall_curve,
        prefix_dim_topk_rerank,
    )

    df = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 1.0, 0.0]),
            (1, [2.0, 0.0, -2.0, 0.0]),
            (2, [1.0, 1.0, 1.0, 0.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    q = [1.0, 0.0, 1.0, 0.0]
    got = [
        (r.vec_id, r.prefix_sim, r.cosine_sim)
        for r in prefix_dim_topk_rerank(
            df, q, k=2, shortlist=2, prefix_dims=2
        ).collect()
    ]
    assert got == [(0, 1.0, 1.0), (1, 1.0, 0.0)]
    curve = {
        r.prefix_dims: r.recall
        for r in prefix_dim_recall_curve(
            df, q, prefixes=(2, 4), k=2, shortlist=2
        ).collect()
    }
    assert curve == {2: 0.5, 4: 1.0}


def test_semdedup_recall_matches_numpy_reference(spark, sf_dir):
    """Independent third implementation (numpy) of the WHOLE
    semdedup_recall chain — seeds, two rounded Lloyd iterations,
    empty-cluster drop, stable tie-break, 2-nearest probes, the
    either-primary coverage rule — compared value-for-value against
    the operator. This is the r9/r10 review lesson made permanent:
    engine/oracle parity is blind to a mistake encoded in both, a
    third derivation is not."""
    import numpy as np

    from pyspark.sql import functions as F

    from data_pipeline_ine_spark.operators.similarity import (
        semantic_dedup_recall,
    )
    from data_pipeline_ine_spark.sources.registry import load_table

    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < 1000
    )
    rows = emb.select("vec_id", "embedding").orderBy("vec_id").collect()
    ids = np.array([r.vec_id for r in rows])
    X = np.array([r.embedding for r in rows], dtype=np.float64)
    n = len(ids)

    norms = np.sqrt((X * X).sum(1))
    cos = np.round((X @ X.T) / np.outer(norms, norms), 6)
    iu = np.triu_indices(n, 1)
    mask = cos[iu] >= 0.3
    exact_pairs = list(zip(ids[iu[0]][mask], ids[iu[1]][mask]))

    def kmeans(k, iters=2):
        cents = {int(ids[i]): np.round(X[i], 6) for i in range(k)}
        for _ in range(iters):
            cid_list = sorted(cents)
            C = np.array([cents[c] for c in cid_list])
            dists = ((X[:, None, :] - C[None, :, :]) ** 2).sum(2)
            assign = np.argmin(dists, axis=1)
            cents = {
                c: np.round(X[assign == j].mean(0), 6)
                for j, c in enumerate(cid_list)
                if (assign == j).any()
            }
        return cents

    def probes(cents, p):
        cid_list = sorted(cents)
        C = np.array([cents[c] for c in cid_list])
        dists = ((X[:, None, :] - C[None, :, :]) ** 2).sum(2)
        order = np.argsort(dists, axis=1, kind="stable")
        return {
            int(ids[i]): [cid_list[j] for j in order[i][:p]]
            for i in range(n)
        }

    want = {}
    for k in (4, 8, 16):
        pr = probes(kmeans(k), 2)
        for p in (1, 2):
            cov = sum(
                1
                for a, b in exact_pairs
                if pr[b][0] in pr[a][:p] or pr[a][0] in pr[b][:p]
            )
            want[(k, p)] = (
                len(exact_pairs),
                cov,
                round(cov / max(len(exact_pairs), 1), 6),
            )

    got = {
        (r.n_clusters, r.n_probe): (r.exact_pairs, r.covered_pairs, r.recall)
        for r in semantic_dedup_recall(
            emb, tau=0.3, n_clusters_list=(4, 8, 16), n_probes=(1, 2),
            iters=2,
        ).collect()
    }
    assert got == want


def test_vector_sql_text_forms_match_column_forms(spark, sf_dir):
    """dot/l2_norm/cosine accept SQL text for one-parse construction
    (r13): the parsed expression must be SEMANTICALLY IDENTICAL to the
    Column-built tree (same fold, same casts, same empty-array guard,
    same literals) — sameSemantics, not just equal values — so every
    converted call site keeps its bit-exact oracle surface."""
    from pyspark.sql import functions as F

    from data_pipeline_ine_spark.operators.similarity import (
        _darr_sql,
        _dbl_array_lit,
        _qid,
        cosine,
        dot,
        l2_norm,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = [0.125 * k - 3.0 for k in range(64)]
    col_form = emb.select(
        F.round(cosine(F.col("embedding"), _dbl_array_lit(q)), 6).alias("c")
    )
    sql_form = emb.select(
        F.round(cosine(_qid("embedding"), _darr_sql(q)), 6).alias("c")
    )
    assert col_form.sameSemantics(sql_form)
    assert emb.select(l2_norm(F.col("embedding"))).sameSemantics(
        emb.select(l2_norm(_qid("embedding")))
    )
    assert emb.select(dot(F.col("embedding"), F.col("embedding"))).sameSemantics(
        emb.select(dot(_qid("embedding"), _qid("embedding")))
    )
    # qualified (join-alias) references resolve identically
    a = emb.alias("a")
    b = emb.select(
        F.col("vec_id").alias("bid"), F.col("embedding").alias("bv")
    ).alias("b")
    j = a.join(b, F.col("vec_id") == F.col("bid"))
    assert j.select(dot(F.col("a.embedding"), F.col("b.bv"))).sameSemantics(
        j.select(dot("a.embedding", "b.bv"))
    )
    # LSH signature: per-plane transform/aggregate fold, both forms
    from data_pipeline_ine_spark.operators.similarity import (
        hyperplane_signature,
    )

    for n in (8, 24):
        assert emb.select(
            hyperplane_signature(F.col("embedding"), n)
        ).sameSemantics(
            emb.select(hyperplane_signature(_qid("embedding"), n))
        )


def test_rebalanced_is_a_noop_on_multi_split_input(spark, sf_dir):
    """_rebalanced is the scale-adaptive parallelism floor (r12): it may
    only add its round-robin exchange when the scan yields FEWER splits
    than defaultParallelism. On an input already at/above the floor the
    plan must be EXCHANGE-FREE IDENTICAL to the input's — the promised
    100 TB no-op (VERDICT r12 task 9)."""
    from pyspark.sql import functions as F

    from data_pipeline_ine_spark.operators.similarity import _rebalanced

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    par = spark.sparkContext.defaultParallelism
    wide = emb.repartition(par)  # already at the floor
    out = _rebalanced(wide)
    assert out is wide  # no wrapper, no added exchange — plan untouched
    # and a single-split input DOES get the floor
    narrow = emb.coalesce(1)
    assert narrow.rdd.getNumPartitions() == 1
    boosted = _rebalanced(narrow)
    assert boosted is not narrow
    assert boosted.rdd.getNumPartitions() == par
    # content unchanged by the round-robin spread
    a = sorted(r[0] for r in narrow.select("vec_id").collect())
    b = sorted(r[0] for r in boosted.select("vec_id").collect())
    assert a == b

"""Training-data curation operators: mixture/stratified sampling,
repetition stats, PII scrubbing, decontamination, simhash near-dup pairs.

Semantics are oracle-checked in test_contract_parity; these tests pin the
properties that matter at corpus scale — determinism, plan shape, and the
tournament/banding equivalences the scale-safe implementations rely on.
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import Window
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_pipeline_ine_spark.operators.dedup import simhash_near_dup_pairs
from data_pipeline_ine_spark.operators.sampling import (
    hash_bucket,
    stratified_sample,
    weighted_mixture,
)
from data_pipeline_ine_spark.operators.text import (
    contamination_overlap,
    pii_stats,
    redact_pii,
    repetition_stats,
)
from tests.test_plan_quality import explain_str


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_weighted_mixture_is_map_side_only(spark, sf_dir):
    kept = weighted_mixture(_docs(spark, sf_dir), {"src0": 0.2}, default_rate=0.5)
    plan = explain_str(kept, mode="simple")
    assert "Exchange" not in plan, plan  # pure filter: no shuffle at any scale


def test_weighted_mixture_deterministic_and_rate_shaped(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    a = {r.doc_id for r in weighted_mixture(docs, {}, default_rate=0.3).collect()}
    b = {r.doc_id for r in weighted_mixture(docs, {}, default_rate=0.3).collect()}
    assert a == b
    n = docs.count()
    assert 0.2 * n < len(a) < 0.4 * n  # ±10pp of the 30% target
    # rate=0.3 sample nests inside rate=0.6 sample (same salt → same buckets)
    big = {r.doc_id for r in weighted_mixture(docs, {}, default_rate=0.6).collect()}
    assert a <= big


def test_hash_bucket_salt_independence(spark, sf_dir):
    docs = _docs(spark, sf_dir).select(
        "doc_id",
        hash_bucket("doc_id", 2, salt="a:").alias("ba"),
        hash_bucket("doc_id", 2, salt="b:").alias("bb"),
    )
    rows = docs.collect()
    agree = sum(1 for r in rows if r.ba == r.bb)
    # independent bucketings agree ~50%, not ~100%
    assert 0.3 < agree / len(rows) < 0.7


def test_stratified_tournament_equals_direct_ranking(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    got = {
        (r.doc_id, r.sample_rank)
        for r in stratified_sample(docs, 5).select("doc_id", "sample_rank").collect()
    }
    hx = F.md5(F.concat(F.lit("strat:"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("source").orderBy(hx, "doc_id")
    want = {
        (r.doc_id, r.rank)
        for r in docs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("doc_id", "rank")
        .collect()
    }
    assert got == want


def test_repetition_stats_bounds(spark, sf_dir):
    rows = repetition_stats(_docs(spark, sf_dir)).collect()
    assert rows
    for r in rows:
        assert 0 < r.type_token_ratio <= 1.0
        assert 0 < r.distinct_bigram_ratio <= 1.0
        assert r.n_distinct_words <= r.n_words


def test_redact_pii_masks_and_preserves(spark):
    df = spark.createDataFrame(
        [("write a.b-c@x.co.uk or 12345678 but keep 123456 and cat",)], ["t"]
    )
    out = df.select(redact_pii("t").alias("r")).first().r
    assert out == "write <EMAIL> or <NUM> but keep 123456 and cat"
    stats = pii_stats(df, "t").first()
    assert (stats.n_emails, stats.n_long_numbers) == (1, 1)


def test_contamination_benchmark_side_broadcasts(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    corpus = docs.filter(F.col("doc_id") % 50 != 0)
    out = contamination_overlap(corpus, bench)
    plan = explain_str(out, mode="simple")
    assert "BroadcastHashJoin" in plan, plan
    # fully-contained docs exist in the synthetic corpus and cap at 1.0
    top = out.agg(F.max("contamination").alias("m")).first().m
    assert 0 < top <= 1.0


def test_simhash_banding_never_all_pairs(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    n = docs.count()
    # candidate volume (pre-Hamming-filter) must stay far below n^2/2
    pairs = simhash_near_dup_pairs(docs, max_hamming=64)
    m = pairs.count()
    assert m < 0.25 * n * (n - 1) / 2, (m, n)
    # and the join is a real equi-join on the band key, not a nested loop
    plan = explain_str(pairs, mode="simple")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_simhash_pigeonhole_recall(spark, sf_dir):
    """Any pair within Hamming distance < n_bands shares a band, so the
    banded candidate set must contain every such pair found by brute
    force on a small slice."""
    docs = _docs(spark, sf_dir).filter(F.col("doc_id") < 60)
    banded = {
        (r.a_id, r.b_id)
        for r in simhash_near_dup_pairs(docs, max_hamming=3).collect()
    }
    from data_pipeline_ine_spark.operators.dedup import simhash_docs

    sims = {r.doc_id: int(r.simhash, 16) for r in simhash_docs(docs).collect()}
    ids = sorted(sims)
    brute = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin(sims[a] ^ sims[b]).count("1") <= 3
    }
    assert brute == banded


def test_split_assign_partitions_corpus(spark, sf_dir):
    from data_pipeline_ine_spark.operators.sampling import split_assign

    docs = _docs(spark, sf_dir)
    assigned = split_assign(docs, "doc_id")
    counts = {r["split"]: r["n"] for r in assigned.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    # every row gets exactly one split; shares roughly follow 80/10/10
    assert sum(counts.values()) == docs.count()
    total = sum(counts.values())
    assert counts["train"] / total > 0.6
    assert 0 < counts["val"] / total < 0.25
    assert 0 < counts["test"] / total < 0.25
    # deterministic across invocations
    a = {(r.doc_id, r.split) for r in assigned.select("doc_id", "split").collect()}
    b = {(r.doc_id, r.split) for r in split_assign(docs, "doc_id").select("doc_id", "split").collect()}
    assert a == b


def test_split_assign_is_map_side_and_validates(spark, sf_dir):
    import pytest

    from data_pipeline_ine_spark.operators.sampling import split_assign

    docs = _docs(spark, sf_dir)
    plan = explain_str(split_assign(docs, "doc_id"), mode="simple")
    assert "Exchange" not in plan, plan  # narrow map: no shuffle at any scale
    with pytest.raises(ValueError):
        split_assign(docs, "doc_id", splits={"train": 70, "val": 10})


def test_split_assign_independent_of_mixture_bucketing(spark, sf_dir):
    """Distinct salts must give uncorrelated bucketings: the mixture filter
    at 30% keeps ~30% of EACH split, not a biased slice."""
    from data_pipeline_ine_spark.operators.sampling import split_assign

    docs = split_assign(_docs(spark, sf_dir), "doc_id")
    kept = weighted_mixture(docs, {}, default_rate=0.3)
    base = {r["split"]: r["n"] for r in docs.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    sampled = {r["split"]: r["n"] for r in kept.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    for split, n in sampled.items():
        assert 0.1 < n / base[split] < 0.55, (split, n, base[split])


def test_chunk_documents_covers_every_char(spark, sf_dir):
    """Stitching chunks back (dropping each successor's overlap prefix)
    must reproduce the document exactly — no char lost or duplicated."""
    from data_pipeline_ine_spark.operators.text import chunk_documents

    docs = _docs(spark, sf_dir).limit(50)
    chunks = chunk_documents(docs, chunk_chars=120, overlap=30).collect()
    by_doc = {}
    for r in chunks:
        by_doc.setdefault(r.doc_id, []).append((r.chunk_id, r.chunk_text))
    texts = {r.doc_id: r.text for r in docs.collect()}
    assert set(by_doc) == set(texts)
    for doc_id, parts in by_doc.items():
        parts.sort()
        assert [i for i, _ in parts] == list(range(len(parts)))
        rebuilt = parts[0][1] + "".join(p[30:] for _, p in parts[1:])
        assert rebuilt == texts[doc_id], doc_id


def test_chunk_documents_is_narrow_and_validates(spark, sf_dir):
    import pytest

    from data_pipeline_ine_spark.operators.text import chunk_documents

    plan = explain_str(chunk_documents(_docs(spark, sf_dir)), mode="simple")
    assert "Exchange" not in plan, plan  # explode inside the scan stage
    with pytest.raises(ValueError):
        chunk_documents(_docs(spark, sf_dir), chunk_chars=100, overlap=100)


def test_weighted_sample_prefers_heavy_rows(spark):
    from data_pipeline_ine_spark.operators.sampling import weighted_sample

    rows = [(f"h{i}", 1000) for i in range(50)] + [
        (f"l{i}", 10) for i in range(50)
    ]
    df = spark.createDataFrame(rows, "doc_id string, w int")
    picked = [r.doc_id for r in weighted_sample(df, 20, "w").collect()]
    heavy = sum(1 for d in picked if d.startswith("h"))
    # 100:1 weight odds — the heavy half should dominate a 20-draw decisively
    assert heavy >= 16, picked


def test_weighted_sample_deterministic_and_skips_nonpositive(spark):
    from data_pipeline_ine_spark.operators.sampling import weighted_sample

    df = spark.createDataFrame(
        [("a", 5), ("b", 0), ("c", None), ("d", 7)], "doc_id string, w int"
    )
    out1 = [r.doc_id for r in weighted_sample(df, 10, "w").collect()]
    out2 = [r.doc_id for r in weighted_sample(df, 10, "w").collect()]
    assert out1 == out2
    assert set(out1) == {"a", "d"}  # zero/NULL weights never drawn


def test_weighted_sample_topk_not_global_sort(spark):
    from data_pipeline_ine_spark.operators.sampling import weighted_sample

    df = spark.range(1000).select(
        F.col("id").cast("string").alias("doc_id"), F.lit(3).alias("w")
    )
    plan = explain_str(weighted_sample(df, 10, "w"), mode="simple")
    assert "TakeOrderedAndProject" in plan, plan


def test_unigram_logloss_closed_form(spark):
    import math

    from data_pipeline_ine_spark.operators.text import unigram_logloss

    df = spark.createDataFrame(
        [("d1", "a a b"), ("d2", "")], "doc_id string, text string"
    )
    out = {r.doc_id: r for r in unigram_logloss(df).collect()}
    # vocab: a→2, b→1; N=3, V=2 → p(a)=3/5, p(b)=2/5
    want = (2 * -math.log(3 / 5) + 1 * -math.log(2 / 5)) / 3
    assert abs(out["d1"].avg_neg_logp - round(want, 6)) < 1e-9
    assert out["d1"].n_tokens == 3
    # exact integer accumulator: Σ cnt·floor(-ln p·1e12 + 0.5), bit-exact
    want_scaled = 2 * math.floor(-math.log(3 / 5) * 1e12 + 0.5) + 1 * math.floor(
        -math.log(2 / 5) * 1e12 + 0.5
    )
    assert out["d1"].sum_neg_logp_e12 == want_scaled
    # tokenless doc: kept, explicit NULL score
    assert out["d2"].n_tokens == 0 and out["d2"].avg_neg_logp is None
    assert out["d2"].sum_neg_logp_e12 is None


def test_bigram_logloss_closed_form(spark):
    import math

    from data_pipeline_ine_spark.operators.text import bigram_logloss

    df = spark.createDataFrame(
        [("d1", "a b a b"), ("d2", "x")], "doc_id string, text string"
    )
    out = {r.doc_id: r for r in bigram_logloss(df).collect()}
    # bigrams: d1 = (a,b),(b,a),(a,b); corpus c12: (a,b)=2,(b,a)=1
    # ctx c1: a=2, b=1 (occurrences as first element); V=3 (a,b,x)
    p_ab = (2 + 1) / (2 + 3)
    p_ba = (1 + 1) / (1 + 3)
    want_scaled = 2 * math.floor(-math.log(p_ab) * 1e12 + 0.5) + 1 * math.floor(
        -math.log(p_ba) * 1e12 + 0.5
    )
    assert out["d1"].n_bigrams == 3
    assert out["d1"].sum_neg_logp_e12 == want_scaled
    assert abs(out["d1"].avg_neg_logp - round(want_scaled / 1e12 / 3, 6)) < 1e-9
    # single-token doc: no bigrams, explicit NULL score
    assert out["d2"].n_bigrams == 0 and out["d2"].sum_neg_logp_e12 is None


def test_inverted_index_caps_postings_before_aggregation(spark):
    from data_pipeline_ine_spark.operators.text import inverted_index

    docs = [(i, "common term here") for i in range(30)] + [
        (100, "rare word"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {
        r.term: r
        for r in inverted_index(df, top_terms=3, max_postings=5).collect()
    }
    # head terms capped at 5 smallest doc ids, sorted; df stays exact
    assert set(out) == {"common", "term", "here"}
    assert out["common"].df == 30
    assert out["common"].postings == [0, 1, 2, 3, 4]


def test_quantile_normalize_matches_percent_rank(spark):
    from pyspark.sql import Window

    from data_pipeline_ine_spark.operators.features import quantile_normalize

    rows = [(i, "s1", float(v)) for i, v in enumerate([10, 20, 20, 30])] + [
        (9, "s2", 7.0)  # singleton group → rank 0
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, score double")
    got = {
        r.doc_id: r.qnorm
        for r in quantile_normalize(df, "score", "source").collect()
    }
    want = {
        r.doc_id: round(r.pr, 6)
        for r in df.withColumn(
            "pr",
            F.percent_rank().over(Window.partitionBy("source").orderBy("score")),
        ).collect()
    }
    assert got == want
    assert got[9] == 0.0 and got[1] == got[2]  # ties share a rank


def test_bigram_catches_shuffled_text(spark):
    from data_pipeline_ine_spark.operators.text import bigram_logloss

    coherent = [(f"c{i}", "the quick brown fox jumps") for i in range(20)]
    df = spark.createDataFrame(
        coherent + [("shuffled", "fox the jumps quick brown")],
        "doc_id string, text string",
    )
    out = {r.doc_id: r.avg_neg_logp for r in bigram_logloss(df).collect()}
    # same unigram distribution, broken transitions → worse bigram score
    assert out["shuffled"] > out["c0"]


def test_unigram_logloss_rare_tokens_score_worse(spark):
    from data_pipeline_ine_spark.operators.text import unigram_logloss

    common = [(f"c{i}", "the quick fox") for i in range(20)]
    df = spark.createDataFrame(
        common + [("rare", "zqxv jkwp vbnm")], "doc_id string, text string"
    )
    out = {r.doc_id: r.avg_neg_logp for r in unigram_logloss(df).collect()}
    assert out["rare"] > out["c0"]


def _md5_bucket(salt: str, key, buckets: int) -> int:
    import hashlib

    h = hashlib.md5(f"{salt}{key}".encode()).hexdigest()
    return int(h[:12], 16) % buckets


def test_upsample_mixture_exact_copy_counts(spark):
    from data_pipeline_ine_spark.operators.sampling import upsample_mixture

    rows = [(i, "src0" if i % 2 == 0 else "other") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = upsample_mixture(
        df, {"src0": 2.5, "other": 0.0}, default_multiplier=1.0
    )
    got = {}
    for r in out.collect():
        got.setdefault(r.doc_id, []).append(r.copy_idx)
    # zero-multiplier stratum disappears entirely
    assert all(i % 2 == 0 for i in got)
    for i, copies in got.items():
        expected = 2 + (1 if _md5_bucket("epoch:", i, 10000) < 5000 else 0)
        assert sorted(copies) == list(range(1, expected + 1)), i
    # expected stratum size ~2.5x: between 2x and 3x always
    n_src0 = 100
    total = sum(len(v) for v in got.values())
    assert 2 * n_src0 <= total <= 3 * n_src0


def test_deterministic_shuffle_is_stable_permutation(spark):
    import hashlib

    from data_pipeline_ine_spark.operators.sampling import deterministic_shuffle

    df = spark.createDataFrame([(i,) for i in range(500)], "doc_id long")
    a = {r.doc_id: r.shuffle_rank for r in deterministic_shuffle(df).collect()}
    b = {r.doc_id: r.shuffle_rank for r in deterministic_shuffle(df).collect()}
    assert a == b, "shuffle rank must be identical across runs"
    assert sorted(a.values()) == list(range(1, 501)), "must be a permutation"

    def key(i):
        return (int(hashlib.md5(f"shuffle:{i}".encode()).hexdigest()[:12], 16), i)

    want = {i: r + 1 for r, i in enumerate(sorted(range(500), key=key))}
    assert a == want, "rank must equal the salted-md5 global order"


def test_source_kl_divergence_properties(spark):
    from data_pipeline_ine_spark.operators.text import source_kl_divergence

    rows = [
        # sources a and b identical, c very different
        (1, "alpha beta gamma delta", "a"),
        (2, "alpha beta gamma delta", "b"),
        (3, "zzz yyy xxx www vvv uuu", "c"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {
        (r.source_a, r.source_b): (r.kl_ab, r.kl_ba)
        for r in source_kl_divergence(df).collect()
    }
    assert set(got) == {("a", "b"), ("a", "c"), ("b", "c")}
    # identical distributions diverge by exactly 0 in both directions
    assert got[("a", "b")] == (0.0, 0.0)
    # disjoint vocabularies diverge strictly positively, both directions
    assert got[("a", "c")][0] > 0 and got[("a", "c")][1] > 0
    # a and b are the same distribution, so their divergence from c matches
    assert got[("a", "c")] == got[("b", "c")]


# ---------------------------------------------------------------------------
# distributed BPE training / application
# ---------------------------------------------------------------------------
def _ref_bpe_train(texts, n_merges, min_pair_count=2):
    """Reference implementation: classic dict-based BPE on word counts."""
    from collections import Counter

    words = Counter()
    for t in texts:
        for w in t.lower().split():
            words[w] += 1
    vocab = {tuple(w): c for w, c in words.items()}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        best = max(pairs.items(), key=lambda kv: (kv[1], [-ord(ch) for ch in kv[0][0]]))
        # deterministic: max count, then lexicographically smallest pair
        top_cnt = max(pairs.values())
        cands = sorted(p for p, c in pairs.items() if c == top_cnt)
        best = cands[0]
        if pairs[best] < min_pair_count:
            break
        merges.append(best)
        a, b = best
        new_vocab = {}
        for syms, c in vocab.items():
            out = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def test_bpe_train_matches_reference(spark):
    from data_pipeline_ine_spark.operators.text import bpe_train

    texts = [
        "the quick brown fox the quick fox",
        "the the the banana bandana",
        "low lower lowest slow slower",
        "don't stop the low flow now",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = bpe_train(df, n_merges=8)
    want = _ref_bpe_train(texts, 8)
    assert got == want
    assert len(got) == 8  # corpus has at least 8 productive merges


def test_bpe_train_early_stop_and_tie_break(spark):
    from data_pipeline_ine_spark.operators.text import bpe_train

    # every word unique, each pair appears at most once -> no merge
    df = spark.createDataFrame([("ab cd ef",)], "text string")
    assert bpe_train(df, n_merges=5, min_pair_count=2) == []
    # tie between (a,b) and (c,d): lexicographically smaller pair wins
    df = spark.createDataFrame([("ab ab cd cd",)], "text string")
    assert bpe_train(df, n_merges=1)[0] == ("a", "b")


def test_bpe_apply_matches_sequential_reference(spark):
    from data_pipeline_ine_spark.operators.text import bpe_apply, bpe_train

    texts = [
        "the quick brown fox the quick fox",
        "the the the banana bandana",
        "low lower lowest slow slower",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    merges = bpe_train(df, n_merges=6)

    def ref_apply(text):
        syms = list(text)
        for a, b in merges:
            out = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            syms = out
        return syms

    got = {r.text: r.bpe_tokens for r in bpe_apply(df, merges).collect()}
    for t in texts:
        assert got[t] == ref_apply(t), t
    # merges never cross whitespace: every token is space-free or a space
    for toks in got.values():
        assert all((" " not in tok) or tok == " " for tok in toks)


def test_bpe_apply_handles_quote_symbols(spark):
    from data_pipeline_ine_spark.operators.text import bpe_apply, bpe_train

    df = spark.createDataFrame(
        [("don't don't don't won't",)], "text string"
    )
    merges = bpe_train(df, n_merges=4)
    # apostrophe participates in learned merges without breaking the SQL
    assert any("'" in a + b for a, b in merges)
    out = bpe_apply(df, merges).collect()[0].bpe_tokens
    assert "".join(out) == "don't don't don't won't"


def test_full_curation_composition_end_to_end(spark, sf_dir, tmp_path):
    """Capstone: the complete training-data front door in one chain —
    raw text dump -> canonical documents -> quality/language gates ->
    exact dedup -> near-dup dedup -> benchmark decontamination ->
    deterministic split assignment -> BPE vocabulary trained on the
    train split and applied back. Asserts the invariants each stage
    must preserve and full determinism across a re-run."""
    from data_pipeline_ine_spark.operators.dedup import (
        dedup_components,
        jaccard_candidate_pairs,
    )
    from data_pipeline_ine_spark.operators.text import (
        bpe_apply,
        bpe_train,
        contamination_overlap,
        fingerprint,
        language_id,
        quality_score,
    )
    from data_pipeline_ine_spark.operators.sampling import split_assign
    from data_pipeline_ine_spark.sources.rawtext import read_text_corpus
    from data_pipeline_ine_spark.sources.registry import load_table

    # raw dump: real docs from the testdata table + planted junk
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 120)
    texts = [r.text.replace("\n", " ") for r in docs.collect()]
    dump = tmp_path / "dump"
    dump.mkdir()
    (dump / "part0.txt").write_text(
        "\n".join(texts[:60]) + "\n!!!\n\n"  # junk line: punct-only
    )
    (dump / "part1.txt").write_text(
        "\n".join(texts[60:]) + "\n" + texts[0] + "\n"  # exact dup
    )

    corpus = read_text_corpus(spark, str(dump))
    n0 = corpus.count()
    assert n0 == len(texts) + 2  # junk + replanted dup survive the scan

    # 1. gates: quality + language
    gated = corpus.withColumn("q", quality_score("text")).withColumn(
        "lang_guess", language_id("text")
    ).filter((F.col("q") > 0.2) & (F.col("lang_guess") == "en"))
    n1 = gated.count()
    assert 0 < n1 < n0  # junk line gated out, bulk survives

    # 2. exact dedup on the content fingerprint (keep min doc_id)
    w = Window.partitionBy(fingerprint("text")).orderBy("doc_id")
    exact = gated.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") == 1
    ).drop("_rn")
    n2 = exact.count()
    assert n2 == n1 - 1  # exactly the planted duplicate collapsed

    # 3. near-dup dedup: LSH candidates -> components -> min-id reps
    pairs = jaccard_candidate_pairs(exact).filter(F.col("jaccard") >= 0.5)
    comp = dedup_components(pairs)
    drop = comp.join(
        comp.groupBy("component").agg(F.min("doc_id").alias("keep")),
        "component",
    ).filter(F.col("doc_id") != F.col("keep")).select("doc_id")
    deduped = exact.join(drop, "doc_id", "left_anti")
    n3 = deduped.count()
    assert 0 < n3 <= n2

    # 4. decontamination against a fake benchmark built from one doc
    bench = spark.createDataFrame([(texts[5],)], "text string")
    overlap = contamination_overlap(deduped, bench)
    contaminated = overlap.filter(F.col("contamination") >= 0.8).select("doc_id")
    clean = deduped.join(contaminated, "doc_id", "left_anti")
    n4 = clean.count()
    assert n4 < n3  # the benchmark's source doc must flag itself out

    # 5. deterministic splits: disjoint, complete, stable
    split = split_assign(clean, key_col="doc_id")
    by = {r.split: r.n for r in split.groupBy("split").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert sum(by.values()) == n4 and set(by) <= {"train", "val", "test"}

    # 6. BPE learned on train, applied to everything
    train = split.filter(F.col("split") == "train")
    merges = bpe_train(train, n_merges=4)
    assert len(merges) == 4
    toks = bpe_apply(split, merges)
    row = toks.limit(1).collect()[0]
    assert "".join(row.bpe_tokens) == row.text  # lossless tokenization

    # full-chain determinism: identical survivor set on a re-run
    again = exact.join(drop, "doc_id", "left_anti").join(
        contaminated, "doc_id", "left_anti"
    )
    assert sorted(r.doc_id for r in clean.collect()) == sorted(
        r.doc_id for r in again.collect()
    )


def test_dup_span_stats_counts_cross_doc_spans_only(spark):
    """Handcrafted corpus: doc 1 and 2 share exactly one 3-gram
    ('b c d'); doc 3 shares nothing. Repeating a span INSIDE one doc
    must not make it 'duplicated' (df counts distinct docs)."""
    from data_pipeline_ine_spark.operators.text import dup_span_stats

    docs = spark.createDataFrame(
        [
            (1, "a b c d e"),
            (2, "z b c d y"),
            (3, "p q r s t"),
            (4, "m n o m n o"),  # internal repeat only
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in dup_span_stats(docs, k=3).collect()}
    assert out[1]["n_dup_spans"] == 1 and out[1]["n_spans"] == 3
    assert out[2]["n_dup_spans"] == 1
    assert 3 not in out  # inner-join drops docs with zero duplicated spans
    assert 4 not in out


def test_udtf_chunker_matches_jvm_explode(spark, sf_dir):
    """The Python-UDTF chunker is semantics-identical to the production
    JVM explode chunker — the parity that licenses swapping in a
    genuinely-Python splitter behind the same contract."""
    from data_pipeline_ine_spark.operators.text import (
        chunk_documents,
        chunk_documents_udtf,
    )
    from data_pipeline_ine_spark.sources.registry import load_table

    docs = load_table(spark, sf_dir, "documents").limit(40)
    a = chunk_documents(docs, chunk_chars=120, overlap=30)
    b = chunk_documents_udtf(spark, docs, chunk_chars=120, overlap=30)
    cols = ["doc_id", "chunk_id", "chunk_text", "chunk_len"]
    diff = a.select(cols).exceptAll(b.select(cols)).count() + b.select(
        cols
    ).exceptAll(a.select(cols)).count()
    assert diff == 0


def test_boilerplate_scrub_multiline(spark):
    """Newline-delimited path: per-source recurring lines (banner,
    footer) are discovered and removed; unique lines and
    under-threshold sources survive; segment/boiler counts agree."""
    from data_pipeline_ine_spark.operators.text import (
        boilerplate_segments,
        scrub_boilerplate,
    )

    rows = [
        (1, "a", "BANNER\nalpha text\nFOOTER"),
        (2, "a", "BANNER\nbeta text\nFOOTER"),
        (3, "a", "gamma only\nno chrome"),
        (4, "b", "BANNER\nsolo doc"),  # min_docs=2 protects singletons
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    boiler = {
        (r["source"], r["segment"])
        for r in boilerplate_segments(df).collect()
    }
    assert boiler == {("a", "BANNER"), ("a", "FOOTER")}

    out = {r["doc_id"]: r for r in scrub_boilerplate(df).collect()}
    assert out[1]["clean_text"] == "alpha text"
    assert out[1]["n_segments"] == 3 and out[1]["n_boiler"] == 2
    assert out[3]["clean_text"] == "gamma only\nno chrome"
    assert out[3]["n_boiler"] == 0
    assert out[4]["clean_text"] == "BANNER\nsolo doc"


def test_boilerplate_apply_broadcasts_dictionary(spark):
    """The apply half must carry NO corpus-sized shuffle: the boiler
    dictionary joins in as a broadcast, and the cleaned output plan
    contains no SortMergeJoin/Exchange on the corpus side."""
    from data_pipeline_ine_spark.operators.text import scrub_boilerplate

    rows = [(i, "s", f"HEAD\ndoc {i}") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    plan = scrub_boilerplate(df)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


def test_corpus_datacard_closed_form(spark):
    """Data card on a hand corpus: dup counting, language argmax
    tie-break, and the no-division quality sum."""
    from data_pipeline_ine_spark.operators.text import corpus_datacard

    rows = [
        (1, "a", "the cat and the dog"),      # en
        (2, "a", "the cat and the dog"),      # exact dup of 1
        (3, "a", "el perro y la casa"),       # es
        (4, "b", "unique text here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {r["source"]: r for r in corpus_datacard(df).collect()}
    a = out["a"]
    assert a["n_docs"] == 3 and a["distinct_texts"] == 2
    assert a["dup_docs"] == 2            # both members of the dup group
    assert a["top_lang"] == "en" and a["top_lang_docs"] == 2
    assert a["total_tokens"] == 5 + 5 + 5
    b = out["b"]
    assert b["dup_docs"] == 0 and b["distinct_texts"] == 1


def test_poisson_bootstrap_centers_on_truth_and_varies(spark):
    """Bootstrap law checks: replicate sums center on the true total
    (Poisson(1) weights have mean 1), replicates genuinely vary, and
    the weight ladder draws ~e^-1 zeros."""
    import pyspark.sql.functions as F

    from data_pipeline_ine_spark.operators.sampling import (
        POISSON1_CUM_48,
        hash_bucket,
        poisson_bootstrap,
    )

    df = spark.range(2000).selectExpr(
        "id AS k", "'g' AS grp", "CAST(1.0 + id % 7 AS DOUBLE) AS v"
    )
    true_total = df.agg(F.sum("v")).first()[0]
    boots = poisson_bootstrap(
        df, "v", "grp", id_col="k", n_replicates=20
    ).collect()
    sums = [float(r["boot_sum"]) for r in boots]
    assert len(sums) == 20
    mean = sum(sums) / len(sums)
    assert abs(mean - true_total) / true_total < 0.05
    assert len(set(sums)) > 1  # resamples differ

    # weight ladder: P(w=0) = e^-1 within sampling noise on 10k draws
    h = hash_bucket(F.col("id").cast("string"), 1 << 48, "boot:")
    zeros = (
        spark.range(10_000)
        .select((h < POISSON1_CUM_48[0]).cast("int").alias("z"))
        .agg(F.sum("z"))
        .first()[0]
    )
    assert abs(zeros / 10_000 - 0.3679) < 0.02


def test_boilerplate_delimiter_is_literal_not_regex(spark):
    """A regex-special delimiter ('|') must split literally — the
    un-escaped form would explode every character into its own
    segment."""
    from data_pipeline_ine_spark.operators.text import scrub_boilerplate

    rows = [
        (1, "s", "AD|keep one"),
        (2, "s", "AD|keep two"),
        (3, "s", "solo|no ad here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {r["doc_id"]: r for r in scrub_boilerplate(df, delim="|").collect()}
    assert out[1]["n_segments"] == 2 and out[1]["clean_text"] == "keep one"
    assert out[3]["clean_text"] == "solo|no ad here"


def test_zipf_slope_recovers_minus_one(spark):
    """A synthetic corpus with freq(rank) = 720/rank exactly must fit a
    slope of -1 (exact power law); flat frequencies must fit ~0."""
    from data_pipeline_ine_spark.operators.text import zipf_slope

    # 720 = lcm-rich: 720/r is exact for r in 1..6
    zipf_words = " ".join(
        f"w{r} " * (720 // r) for r in range(1, 7)
    )
    flat_words = " ".join(f"u{r} " * 50 for r in range(1, 7))
    df = spark.createDataFrame(
        [(1, "zipf", zipf_words), (2, "flat", flat_words)],
        "doc_id long, source string, text string",
    )
    got = {r.source: (r.n_terms, r.slope) for r in zipf_slope(df).collect()}
    assert got["zipf"][0] == 6 and abs(got["zipf"][1] + 1.0) < 1e-6
    assert got["flat"][0] == 6 and abs(got["flat"][1]) < 1e-6


def test_readability_scores_closed_form(spark):
    """Hand-counted doc: 6 words, 2 sentences, 8 vowel groups → both
    scores equal the Flesch formulas computed in Python; a no-
    punctuation fragment still divides by the sentence floor of 1."""
    from data_pipeline_ine_spark.operators.text import readability_scores

    text = "The cat sat down. It purred loudly!"
    # words: the cat sat down it purred loudly = 7; recount in test
    df = spark.createDataFrame(
        [(1, text), (2, "no punctuation here")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in readability_scores(df).collect()}
    import re

    for doc_id, t in [(1, text), (2, "no punctuation here")]:
        t = t.lower()
        w = len(re.findall(r"[a-z0-9]+", t))
        s = max(1, len(re.findall(r"[.!?]+", t)))
        y = len(re.findall(r"[aeiouy]+", t))
        r = out[doc_id]
        assert (r.n_words, r.n_sentences, r.n_syllables) == (w, s, y)
        assert r.flesch_ease == round(
            206.835 - 1.015 * (w / s) - 84.6 * (y / w), 4
        )
        assert r.fk_grade == round(
            0.39 * (w / s) + 11.8 * (y / w) - 15.59, 4
        )
    assert out[2].n_sentences == 1


def test_token_fertility_counts_and_ratio(spark):
    """'abc123 x' → 3 subword tokens ([abc][123][x]) over 2 words →
    fertility 1.5e6; pure-digit and hyphenated forms split as the BPE
    surface says."""
    from data_pipeline_ine_spark.operators.text import token_fertility

    df = spark.createDataFrame(
        [("en", "abc123 x"), ("en", "one-two three"), ("de", "z")],
        "lang string, text string",
    )
    out = {r.lang: r for r in token_fertility(df).collect()}
    # en: 'abc123 x' = tokens abc,123,x (3) words 2; 'one-two three' =
    # tokens one,two,three (3) words 2 → 6 tokens / 4 words = 1.5
    assert (out["en"].n_tokens, out["en"].n_words) == (6, 4)
    assert out["en"].fertility_e6 == 1_500_000
    assert (out["de"].n_tokens, out["de"].n_words) == (1, 1)
    assert out["de"].fertility_e6 == 1_000_000


def test_negative_samples_never_emit_positives_and_are_stable(spark):
    """No emitted negative is an observed positive for its basket; the
    draw is bit-stable across invocations; each positive yields at most
    k rows (collision deficit documented, never resampled)."""
    from data_pipeline_ine_spark.operators.sampling import negative_samples

    pos = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 10), (2, 12)], "b long, i long"
    )
    cat = spark.createDataFrame([(x,) for x in range(10, 16)], "pk long")
    out1 = negative_samples(pos, cat, "b", "i", "pk", k=3).collect()
    out2 = negative_samples(pos, cat, "b", "i", "pk", k=3).collect()
    assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))
    observed = {(1, 10), (1, 11), (2, 10), (2, 12)}
    per_pos = {}
    for r in out1:
        assert (r.basket, r.neg_item) not in observed
        assert 10 <= r.neg_item <= 15
        per_pos[(r.basket, r.item)] = per_pos.get((r.basket, r.item), 0) + 1
    assert all(v <= 3 for v in per_pos.values())
    assert len(out1) > 0


def test_doc_keywords_prefers_rare_terms(spark):
    """A term unique to one doc outranks a corpus-wide stopword with the
    same in-doc frequency; exactly k rows per doc with dense ranks."""
    from data_pipeline_ine_spark.operators.text import doc_keywords

    docs = [
        (1, "common common rareword rareword other1"),
        (2, "common common other2 other2 other2"),
        (3, "common filler filler"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = [r for r in doc_keywords(df, k=2).collect() if r.doc_id == 1]
    assert [r.rank for r in out] == [1, 2]
    # rareword: tf=2, df=1 → score 2·(4/2)=4; common: tf=2, df=3 → 2·(4/4)=2
    assert out[0].term == "rareword" and out[0].score == 4.0
    assert out[1].term == "common" and out[1].score == 2.0


def test_rendezvous_shards_balanced_and_minimally_disruptive(spark):
    """HRW over 2,000 keys: shards are roughly balanced (within 3x of
    uniform), assignments are deterministic across calls, and adding a
    9th shard moves ~1/9 of keys (we assert < 1/4 — mod-9 would move
    ~8/9) with every mover landing on the NEW shard."""
    from data_pipeline_ine_spark.operators.sampling import (
        rendezvous_shards,
    )

    keys = spark.createDataFrame([(i,) for i in range(2000)], "k long")
    a8 = {r.k: r.shard for r in rendezvous_shards(keys, "k", 8).collect()}
    a8b = {r.k: r.shard for r in rendezvous_shards(keys, "k", 8).collect()}
    assert a8 == a8b
    counts = {}
    for s in a8.values():
        counts[s] = counts.get(s, 0) + 1
    assert set(counts) == set(range(8))
    assert max(counts.values()) < 3 * (2000 // 8)
    a9 = {r.k: r.shard for r in rendezvous_shards(keys, "k", 9).collect()}
    moved = [k for k in a8 if a9[k] != a8[k]]
    assert all(a9[k] == 8 for k in moved)  # movers only go to the new shard
    assert 0 < len(moved) < 2000 / 4      # ~1/9 expected, far below mod-n


def test_temperature_mixture_flattens_toward_small_sources(spark):
    """alpha-sampling semantics: the smallest source keeps 100%
    (rate_bp = buckets), keep rates are monotonically DECREASING in
    source token mass, alpha=1 keeps everything, and the realized
    keep fraction tracks the derived rate."""
    from pyspark.sql import functions as F

    from data_pipeline_ine_spark.operators.sampling import (
        temperature_mixture,
    )

    # three sources with 100 / 400 / 1600 token mass (1 token per doc)
    rows = (
        [(i, "small", 1) for i in range(100)]
        + [(1000 + i, "mid", 1) for i in range(400)]
        + [(10_000 + i, "big", 1) for i in range(1600)]
    )
    df = spark.createDataFrame(rows, "doc_id long, source string, tok long")

    kept = temperature_mixture(df, "tok", alpha=0.5)
    got = {
        r.source: (r.rate_bp, r.n)
        for r in kept.groupBy("source", "rate_bp")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got["small"][0] == 10_000          # sqrt(100/100) = 1.0
    assert got["small"][1] == 100             # keeps every row
    assert got["mid"][0] == 5_000             # sqrt(100/400) = 0.5
    assert got["big"][0] == 2_500             # sqrt(100/1600) = 0.25
    # realized fractions within hash noise of the configured rates
    assert abs(got["mid"][1] / 400 - 0.5) < 0.1
    assert abs(got["big"][1] / 1600 - 0.25) < 0.05

    # alpha = 1: proportional sampling = keep everything
    assert temperature_mixture(df, "tok", alpha=1.0).count() == len(rows)


def test_temperature_mixture_zero_mass_source_guards(spark):
    """A zero-mass source must not poison m_min: its rows drop (no mass
    to sample), other sources keep their derived rates; an all-zero
    input raises instead of dividing by zero."""
    import pytest
    from data_pipeline_ine_spark.operators.sampling import (
        temperature_mixture,
    )

    df = spark.createDataFrame(
        [(i, "real", 1) for i in range(100)]
        + [(1000 + i, "empty", 0) for i in range(5)],
        "doc_id long, source string, tok long",
    )
    kept = temperature_mixture(df, "tok", alpha=0.5)
    assert kept.filter("source = 'empty'").count() == 0
    assert kept.filter("source = 'real'").count() == 100  # only source

    zeros = spark.createDataFrame(
        [(1, "a", 0)], "doc_id long, source string, tok long"
    )
    with pytest.raises(ValueError, match="no source has positive"):
        temperature_mixture(zeros, "tok")


def test_packing_efficiency_reconciles_with_packs(spark):
    """waste + tokens == capacity, fill_bp is the integer ratio, and a
    budget exactly matched by the token mass packs at 10000 bp."""
    from pyspark.sql import functions as F

    from data_pipeline_ine_spark.operators.packing import (
        pack_sequences,
        packing_efficiency,
    )

    df = spark.createDataFrame(
        [(i, "s", 50) for i in range(8)],
        "doc_id long, source string, tok long",
    )
    packed = pack_sequences(df, F.col("tok"), budget=100, n_shards=1)
    eff = packing_efficiency(packed, 100).collect()[0]
    assert eff.tokens_sum == 400
    assert eff.n_packs == 4 and eff.capacity == 400
    assert eff.waste == 0 and eff.fill_bp == 10_000

    packed2 = pack_sequences(df, F.col("tok"), budget=120, n_shards=1)
    eff2 = packing_efficiency(packed2, 120).collect()[0]
    assert eff2.capacity == eff2.n_packs * 120
    assert eff2.waste == eff2.capacity - 400
    assert eff2.fill_bp == (400 * 10_000) // eff2.capacity


def test_round8_operators_invariant_under_repartitioning(spark, sf_dir):
    """Determinism under physical layout: temperature_mixture and
    semantic_dedup must return the SAME rows whether the input arrives
    as one partition or sixteen — the property every driver-session
    rerun and every cluster re-layout silently depends on."""
    from pyspark.sql import functions as F

    from data_pipeline_ine_spark.operators.sampling import (
        temperature_mixture,
    )
    from data_pipeline_ine_spark.operators.similarity import semantic_dedup
    from data_pipeline_ine_spark.sources.registry import load_table

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "_tok",
        F.size(
            F.regexp_extract_all(F.lower("text"), F.lit("[a-z0-9]+"), 0)
        ).cast("bigint"),
    )
    one = {
        tuple(r)
        for r in temperature_mixture(docs.coalesce(1), "_tok")
        .select("doc_id", "rate_bp")
        .collect()
    }
    many = {
        tuple(r)
        for r in temperature_mixture(docs.repartition(16), "_tok")
        .select("doc_id", "rate_bp")
        .collect()
    }
    assert one == many and one

    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < 150
    )
    a = {
        tuple(r)
        for r in semantic_dedup(
            emb.coalesce(1), tau=0.3, n_clusters=4, iters=1
        ).collect()
    }
    b = {
        tuple(r)
        for r in semantic_dedup(
            emb.repartition(16), tau=0.3, n_clusters=4, iters=1
        ).collect()
    }
    assert a == b and a


def test_perplexity_buckets_tiering_and_unscored(spark):
    """Nine scored docs split 3/3/3 head/middle/tail by per-token LM
    loss — docs made of corpus-common words land in head, rare-word
    docs in tail — the per-doc score is exactly the integer division
    of unigram_logloss's accumulator, and an empty doc lands in the
    explicit unscored bucket."""
    from data_pipeline_ine_spark.operators.text import (
        perplexity_buckets,
        unigram_logloss,
    )

    common = "the cat sat on the mat"
    docs = (
        [(i, common) for i in range(3)]                      # prototypical
        + [(i + 3, common + f" extra{i}") for i in range(3)]  # one rare term
        + [(i + 6, f"zzq{i} qqx{i} wvx{i}") for i in range(3)]  # gibberish
        + [(9, "")]
    )
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    out = {r.doc_id: r for r in perplexity_buckets(df).collect()}
    assert len(out) == 10
    assert out[9].ppl_bucket == "unscored" and out[9].score_e12 is None
    buckets = [out[i].ppl_bucket for i in range(9)]
    assert buckets.count("head") == 3
    assert buckets.count("middle") == 3
    assert buckets.count("tail") == 3
    assert all(out[i].ppl_bucket == "head" for i in range(3))
    assert all(out[i + 6].ppl_bucket == "tail" for i in range(3))
    # score identity vs the raw accumulator
    raw = {r.doc_id: r for r in unigram_logloss(df).collect()}
    for i in range(9):
        assert out[i].score_e12 == raw[i].sum_neg_logp_e12 // raw[i].n_tokens


def test_curriculum_order_tiers_positions_and_interleave(spark):
    """Ten rows, four tiers: equal-split sizes 3/2/3/2 by the integer
    bucket rule, within-tier positions contiguous from 1, and sorting
    by curriculum_key round-robins the tiers (easy row first, then one
    row of each harder tier)."""
    from data_pipeline_ine_spark.operators.sampling import curriculum_order

    df = spark.createDataFrame(
        [(i, 100 - i) for i in range(10)], "doc_id bigint, score bigint"
    )  # doc 0 easiest (highest score)
    out = curriculum_order(df, "score", n_tiers=4).collect()
    by_tier = {}
    for r in out:
        by_tier.setdefault(r.tier, []).append(r)
    assert {t: len(v) for t, v in by_tier.items()} == {0: 3, 1: 2, 2: 3, 3: 2}
    for t, rows in by_tier.items():
        assert sorted(r.tier_pos for r in rows) == list(
            range(1, len(rows) + 1)
        )
    # easiest docs (0,1,2) fill tier 0 in score order
    assert [r.doc_id for r in sorted(by_tier[0], key=lambda r: r.tier_pos)] == [0, 1, 2]
    # keys are distinct and the interleave alternates tiers
    keys = sorted(out, key=lambda r: r.curriculum_key)
    assert len({r.curriculum_key for r in out}) == 10
    assert [r.tier for r in keys[:4]] == [0, 1, 2, 3]


def test_normalize_text_folds_match_duckdb_and_hand_expected(spark):
    """The normalization chain on hostile inputs — control chars,
    zero-widths/BOM, typographic quotes/dashes/ellipsis/NBSP, messy
    whitespace — must produce the hand-expected ASCII-folded strings
    AND byte-identical results from the DuckDB oracle rewrite chain
    (the contract testdata is clean text, so the fold paths are only
    exercised here)."""
    import duckdb

    from data_pipeline_ine_spark.operators.text import normalize_text

    cases = [
        (0, "plain text stays", "plain text stays"),
        (1, "a\x00b\x01c\x7fd", "abcd"),
        (2, "keep\ttabs and\nnewlines", "keep tabs and newlines"),
        (3, "“quoted” ‘single’", "\"quoted\" 'single'"),
        (4, "en–dash em—dash", "en-dash em-dash"),
        (5, "wait… what", "wait... what"),
        (6, "zero​width‌‍gone﻿", "zerowidthgone"),
        (7, "nbsp space", "nbsp space"),
        (8, "  collapse   \t runs  ", "collapse runs"),
        (9, "", ""),
        (10, "vertical\x0btab", "verticaltab"),
    ]
    df = spark.createDataFrame(
        [(i, s) for i, s, _ in cases], "doc_id bigint, text string"
    )
    got = {
        r.doc_id: r.norm
        for r in df.select(
            "doc_id", normalize_text("text").alias("norm")
        ).collect()
    }
    for i, _, want in cases:
        assert got[i] == want, (i, got[i], want)

    con = duckdb.connect()
    con.register("t", __import__("pandas").DataFrame(
        {"doc_id": [i for i, s, _ in cases], "text": [s for _, s, _ in cases]}
    ))
    oracle = dict(con.sql(r"""
        SELECT doc_id, trim(regexp_replace(
          regexp_replace(
            regexp_replace(
              translate(regexp_replace(text, '…', '...', 'g'),
                        '‘’“”–—' || chr(160), '''''""--' || ' '),
              '[​‌‍﻿]', '', 'g'),
            '[\x00-\x08\x0b-\x1f\x7f-\x9f]', '', 'g'),
          '\s+', ' ', 'g')) AS norm
        FROM t
    """).fetchall())
    for i, _, want in cases:
        assert oracle[i] == want, (i, oracle[i], want)


def test_dsir_select_prefers_target_like_and_respects_budget(spark):
    """Greedy DSIR selection: with a 'science' target cohort, the
    science-vocabulary docs are selected before the sports docs, the
    kept prefix never exceeds the token budget, and a bigger budget
    keeps a SUPERSET (prefix property)."""
    from pyspark.sql import functions as F

    from data_pipeline_ine_spark.operators.text import dsir_select

    sci = "quantum particle theory experiment measurement energy"
    spo = "goal match team score player season league"
    rows = (
        [(i, sci, "sci") for i in range(4)]
        + [(i + 4, spo, "spo") for i in range(4)]
        + [(8, "", "spo")]
    )
    df = spark.createDataFrame(rows, "doc_id bigint, text string, dom string")
    pred = F.col("dom") == "sci"

    # budget fits exactly the four 6-token science docs
    kept = dsir_select(df, pred, budget_tokens=24).collect()
    assert sorted(r.doc_id for r in kept) == [0, 1, 2, 3]
    assert max(r.cum_tokens for r in kept) <= 24
    # ranked most-target-like first: all kept docs have llr > 0
    assert all(r.llr_e12 > 0 for r in kept)

    bigger = {r.doc_id for r in dsir_select(df, pred, budget_tokens=40).collect()}
    assert {r.doc_id for r in kept} <= bigger
    assert len(bigger) > 4  # budget now reaches into the sports tier
    assert 8 not in bigger  # zero-token doc never selected


def test_gopher_repetition_hand_anchored(spark):
    """Meaning-pinning test for the repetition gate: a token loop
    fails; a SHORT fully varied document passes (the top-2-gram rule
    must not fire on a top gram that occurs once — the r10 review
    catch); an actually-repeated 2-gram passes exactly ON the 5%
    boundary (<=) and fails just over it; a too-short document passes
    with zero counts by rule."""
    from data_pipeline_ine_spark.operators.text import gopher_repetition

    distinct17 = "c d e f g h i j k l m n o p q r s"
    # 37 distinct filler tokens (no repeated 2-grams among them)
    filler37 = " ".join(f"w{i}" for i in range(37))
    rows = [
        (1, "a a a a a a"),                    # loop: top2 5/5, dup3 3/4
        (2, "zz yy " + distinct17),            # 19 varied tokens, top2=1: MUST pass
        (3, "a b a b " + distinct17),          # 'a b' 2/20 = 10% -> fail
        (4, "solo"),                           # no 2-grams: pass by rule
        (5, "a b " + filler37 + " a b"),       # 'a b' 2/40 = 5%: boundary pass
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        r.doc_id: (
            r.n_2grams, r.top_2gram_n, r.n_3grams, r.dup_3gram_n,
            r.pass_repetition,
        )
        for r in gopher_repetition(df).collect()
    }
    assert got[1] == (5, 5, 4, 3, 0)
    assert got[2] == (18, 1, 17, 0, 1)   # zero repetition: passes at ANY length
    assert got[3] == (20, 2, 19, 0, 0)   # 2*100 >  5*20: fails
    assert got[4] == (0, 0, 0, 0, 1)
    assert got[5] == (40, 2, 39, 0, 1)   # 2*100 <= 5*40: boundary PASSES


def test_ngram_decontaminate_hand_anchored(spark):
    """Meaning-pinning test for decontamination: a corpus document
    embedding a benchmark 5-gram is flagged with the exact shared
    count, disjoint documents are clean, a too-short document reports
    zero n-grams, and benchmark documents never appear in the output."""
    from pyspark.sql import functions as F

    from data_pipeline_ine_spark.operators.text import ngram_decontaminate

    rows = [
        (1, "one two three four five six", "bench"),
        # contains TWO bench 5-grams: 'one..five' and 'two..six'
        (2, "zz one two three four five six yy", "train"),
        (3, "alpha beta gamma delta epsilon zeta", "train"),
        (4, "one two three", "train"),  # too short for a 5-gram
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, src string")
    got = {
        r.doc_id: (r.n_ngrams, r.shared_ngrams, r.contaminated)
        for r in ngram_decontaminate(
            df, F.col("src") == "bench", n=5
        ).collect()
    }
    assert set(got) == {2, 3, 4}  # the bench doc is not scored
    assert got[2] == (4, 2, 1)
    assert got[3] == (2, 0, 0)
    assert got[4] == (0, 0, 0)


def test_chunk_token_windows_hand_anchored(spark):
    """Meaning-pinning test for overlapping chunking: window=4,
    stride=2 over a 7-token document yields exactly the three windows
    [1..4], [3..6], [5..7] (final chunk short), every token covered,
    overlap = window - stride; a doc at the window size yields one
    chunk; an empty doc yields none; invalid knobs refuse."""
    import pytest

    from data_pipeline_ine_spark.operators.text import chunk_token_windows

    rows = [
        (1, "t1 t2 t3 t4 t5 t6 t7"),
        (2, "a b c d"),
        (3, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = sorted(
        (r.doc_id, r.chunk_idx, r.start_tok, r.n_tokens, r.chunk_text)
        for r in chunk_token_windows(df, window=4, stride=2).collect()
    )
    assert got == [
        (1, 0, 1, 4, "t1 t2 t3 t4"),
        (1, 1, 3, 4, "t3 t4 t5 t6"),
        (1, 2, 5, 3, "t5 t6 t7"),
        (2, 0, 1, 4, "a b c d"),
    ]
    # prefix stability: re-chunking with more data never re-cuts
    # earlier documents (same knobs -> same chunks per doc)
    again = sorted(
        (r.doc_id, r.chunk_idx, r.start_tok, r.n_tokens, r.chunk_text)
        for r in chunk_token_windows(
            df.unionByName(
                spark.createDataFrame(
                    [(4, "x y z")], "doc_id bigint, text string"
                )
            ),
            window=4,
            stride=2,
        ).collect()
        if r.doc_id <= 3
    )
    assert again == got
    with pytest.raises(ValueError):
        chunk_token_windows(df, window=4, stride=5)
    with pytest.raises(ValueError):
        chunk_token_windows(df, window=0, stride=0)


def test_hard_negative_mining_hand_anchored(spark):
    """Meaning-pinning test for hard-negative mining: the nearest
    SAME-label vector never appears (the label filter runs before the
    rank), cross-label negatives come back in exact cosine order, and
    an anchor whose cluster holds only its own label emits no rows."""
    from data_pipeline_ine_spark.operators.similarity import (
        hard_negative_mining,
    )

    # one cluster (ivf_clusters=1): negatives = global cross-label top-k
    rows = [
        (0, "A", [1.0, 0.0]),
        (1, "A", [0.99, 0.01]),   # nearest to id0 overall, SAME label
        (2, "B", [0.9, 0.1]),     # best hard negative for id0
        (3, "B", [-1.0, 0.0]),    # worst
        (4, "C", [0.5, 0.5]),     # middle
    ]
    df = spark.createDataFrame(
        rows, "vec_id bigint, label string, embedding array<double>"
    )
    got = [
        (r.neighbor_id, r.negative_label)
        for r in hard_negative_mining(df, k=3, ivf_clusters=1)
        .filter("vec_id = 0")
        .orderBy("rank")
        .collect()
    ]
    # id1 (same label) must be absent despite being the nearest vector
    assert got == [(2, "B"), (4, "C"), (3, "B")]

    # two separated clusters, one of them single-label: its anchors
    # emit nothing (ids 0 and 1 are the deterministic seeds)
    rows2 = [
        (0, "A", [1.0, 0.0]),
        (1, "C", [-1.0, 0.0]),
        (2, "B", [0.95, 0.05]),
        (3, "C", [-0.95, -0.05]),
    ]
    df2 = spark.createDataFrame(
        rows2, "vec_id bigint, label string, embedding array<double>"
    )
    out = hard_negative_mining(df2, k=3, ivf_clusters=2)
    per_anchor = {
        r.vec_id: (r.neighbor_id, r.negative_label)
        for r in out.collect()
    }
    # right cluster {1, 3} is all-C: no rows for either anchor
    assert set(per_anchor) == {0, 2}
    assert per_anchor[0] == (2, "B") and per_anchor[2] == (0, "A")


def test_bpe_fertility_hand_anchored(spark):
    """Worked example pinning bpe_fertility_curve's MEANING (not just
    engine parity): corpus = 'aaab' x3 + 'ab' x1. Merge 1 is (a,a)
    (weighted count 6 beats (a,b)'s 4); greedy fold gives aaab ->
    [aa,a,b] (the merged token does NOT cascade — (aa,a) is not a
    rule). Merge 2 is (a,b) (count 4 beats (aa,a)'s 3): aaab ->
    [aa,ab], ab -> [ab]. Fertility: 14/4 -> 11/4 -> 7/4."""
    from data_pipeline_ine_spark.operators.text import (
        bpe_fertility_curve,
        bpe_train,
    )

    df = spark.createDataFrame(
        [(1, "aaab aaab"), (2, "aaab ab")], "doc_id long, text string"
    )
    assert bpe_train(df, 2) == [("a", "a"), ("a", "b")]
    rows = [
        (r.n_merges, r.total_words, r.total_tokens, r.fertility)
        for r in bpe_fertility_curve(df, merge_counts=(0, 1, 2)).collect()
    ]
    assert rows == [(0, 4, 14, 3.5), (1, 4, 11, 2.75), (2, 4, 7, 1.75)]

    # early stop: no pair reaches min_pair_count -> the curve is FLAT
    # (requested rungs still emit rows, the token total never changes)
    flat = [
        r.total_tokens
        for r in bpe_fertility_curve(
            df, merge_counts=(0, 5), min_pair_count=100
        ).collect()
    ]
    assert flat == [14, 14]


def test_dup_span_scrub_hand_anchored(spark):
    """Worked example pinning dup_span_scrub's MEANING: docs 1 and 2
    share exactly one 3-gram ('alpha beta gamma'), so precisely its
    three covered tokens are removed from BOTH and the unique tails
    survive in order; a fully-unique doc and a doc shorter than k pass
    untouched; two identical docs scrub to '' (the all-boilerplate
    case, n_removed == n_tokens)."""
    from data_pipeline_ine_spark.operators.text import dup_span_scrub

    rows = [
        (1, "alpha beta gamma delta unique one"),
        (2, "alpha beta gamma other words here"),
        (3, "totally different content entirely now yes"),
        (4, "xy"),
        (5, "copy pasted boiler plate"),
        (6, "copy pasted boiler plate"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_tokens, r.n_removed, r.scrubbed_text)
        for r in dup_span_scrub(df, k=3).collect()
    }
    assert got[1] == (6, 3, "delta unique one")
    assert got[2] == (6, 3, "other words here")
    assert got[3] == (6, 0, "totally different content entirely now yes")
    assert got[4] == (1, 0, "xy")
    assert got[5] == (4, 4, "")
    assert got[6] == (4, 4, "")


def test_curation_v3_matches_python_reference(spark, sf_dir):
    """Independent pure-Python implementation of the composed
    curation_v3 stack — Gopher rules, frozen full-corpus src0 LM with
    e12 snapping, 5-gram decontamination against the FULL src19
    cohort, DSIR LMs re-fit on the survivors with the greedy 8000-token
    budget, 32/24 chunk arithmetic — compared value-for-value against
    the contract query. Pins the STAGE WIRING (training scopes, gate
    order, src19 handling), which the per-gate rows can't see."""
    import math
    import re as _re
    from collections import Counter, defaultdict

    import __spark_entry__ as contract

    from data_pipeline_ine_spark.sources.registry import load_table

    raw = [
        (r.doc_id, r.source, r.text)
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", "source", "text")
        .collect()
    ]
    tok = lambda t: _re.findall(r"[a-z0-9]+", t.lower())
    toks = {d: tok(t) for d, s, t in raw}
    src = {d: s for d, s, t in raw}

    def gopher_pass(ts):
        n2 = max(len(ts) - 1, 0)
        g2 = Counter(tuple(ts[i:i + 2]) for i in range(len(ts) - 1))
        top2 = max(g2.values()) if g2 else 0
        g3 = Counter(tuple(ts[i:i + 3]) for i in range(len(ts) - 2))
        n3 = sum(g3.values())
        dup3 = n3 - len(g3)
        return ((top2 < 2) or (top2 * 100 <= 5 * n2)) and (
            dup3 * 100 <= 2 * n3
        )

    s1 = {d for d in toks if gopher_pass(toks[d])}

    vocab = Counter()
    for d in toks:
        if src[d] == "src0":
            vocab.update(toks[d])
    N, V = sum(vocab.values()), len(vocab)

    def lm_pass(ts):
        if not ts:
            return False
        tot = sum(
            math.floor(-math.log((vocab.get(t, 0) + 1) / (N + V)) * 1e12 + 0.5)
            for t in ts
        )
        return tot // len(ts) <= 3_420_000_000_000

    s2 = {d for d in s1 if lm_pass(toks[d])}

    bench = set()
    for d in toks:
        if src[d] == "src19":
            ts = toks[d]
            bench.update(tuple(ts[i:i + 5]) for i in range(len(ts) - 4))
    s3 = {
        d
        for d in s2
        if src[d] != "src19"
        and not any(
            tuple(toks[d][i:i + 5]) in bench
            for i in range(len(toks[d]) - 4)
        )
    }

    va, vt = Counter(), Counter()
    for d in s3:
        va.update(toks[d])
        if src[d] == "src0":
            vt.update(toks[d])
    Na, Nt, Vs = sum(va.values()), sum(vt.values()), len(va)

    def llr(ts):
        tot = 0
        for t in ts:
            la = math.floor(-math.log((va[t] + 1) / (Na + Vs)) * 1e12 + 0.5)
            lt = math.floor(
                -math.log((vt.get(t, 0) + 1) / (Nt + Vs)) * 1e12 + 0.5
            )
            tot += la - lt
        return tot

    scored = sorted(
        ((d, len(toks[d]), llr(toks[d])) for d in s3 if toks[d]),
        key=lambda x: (-x[2], x[0]),
    )
    picked, cum = [], 0
    for d, nt, _ in scored:
        cum += nt
        if cum > 8000:
            break
        picked.append(d)

    agg = defaultdict(lambda: [set(), 0, 0])
    for d in picked:
        n = len(toks[d])
        m = 0 if n <= 0 else 1 + max(0, (n - 32 + 24 - 1) // 24)
        for kk in range(m):
            a = agg[src[d]]
            a[0].add(d)
            a[1] += 1
            a[2] += min(32, n - kk * 24)
    want = sorted((s, len(a[0]), a[1], a[2]) for s, a in agg.items())

    got = [
        (r.source, r.n_docs, r.n_chunks, r.chunk_tokens)
        for r in contract.queries()["curation_v3"](spark, sf_dir).collect()
    ]
    assert got == want


def test_hard_negatives_mp_matches_numpy_reference(spark, sf_dir):
    """Independent numpy implementation of multi-probe hard-negative
    mining on the real corpus — trained centroids (rounded Lloyd),
    anchors assigned to their 2 nearest cells with the (distance, cid)
    lexicographic tiebreak, candidates in their primary cell only,
    label-inequality before the rank, (cosine DESC, neighbor_id) rank
    truncated at k — compared row-for-row against the operator."""
    import numpy as np

    from pyspark.sql import functions as F

    from data_pipeline_ine_spark.operators.similarity import (
        hard_negative_mining,
    )
    from data_pipeline_ine_spark.sources.registry import load_table

    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < 300
    )
    rows = emb.select("vec_id", "embedding", "label").orderBy(
        "vec_id"
    ).collect()
    ids = np.array([r.vec_id for r in rows])
    X = np.array([r.embedding for r in rows], dtype=np.float64)
    lbl = {int(r.vec_id): r.label for r in rows}
    n = len(ids)

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

    cents = kmeans(16)
    cid_list = sorted(cents)
    C = np.array([cents[c] for c in cid_list])
    dists = ((X[:, None, :] - C[None, :, :]) ** 2).sum(2)
    order = np.argsort(dists, axis=1, kind="stable")
    probes = {int(ids[i]): [cid_list[j] for j in order[i][:2]] for i in range(n)}
    prim = {v: cells[0] for v, cells in probes.items()}

    norms = np.sqrt((X * X).sum(1))
    cos = np.round((X @ X.T) / np.outer(norms, norms), 6)
    idx_of = {int(v): i for i, v in enumerate(ids)}

    want = []
    for a in ids:
        a = int(a)
        cands = [
            int(b) for b in ids
            if int(b) != a
            and lbl[int(b)] != lbl[a]
            and prim[int(b)] in probes[a]
        ]
        ranked = sorted(
            cands, key=lambda b: (-cos[idx_of[a], idx_of[b]], b)
        )[:3]
        for r, b in enumerate(ranked, 1):
            want.append(
                (a, lbl[a], b, lbl[b], prim[b],
                 float(cos[idx_of[a], idx_of[b]]), r)
            )

    got = sorted(
        (r.vec_id, r.anchor_label, r.neighbor_id, r.negative_label,
         r.block, r.cosine_sim, r.rank)
        for r in hard_negative_mining(
            emb, k=3, ivf_clusters=16, ivf_iters=2, n_probe=2
        ).collect()
    )
    assert got == sorted(want)

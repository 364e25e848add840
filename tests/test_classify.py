"""Naive Bayes over hashed features: learnability + determinism laws."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from data_pipeline_ine_spark.operators.classify import nb_predict, nb_train
from data_pipeline_ine_spark.operators.text import hashed_features


def _corpus(spark):
    rows = []
    for i in range(30):
        rows.append((i, "spark shuffle executor partition stage task", "eng"))
    for i in range(30, 60):
        rows.append((i, "invoice payment ledger balance credit debit", "fin"))
    # held-out style docs: subsets of each vocabulary
    rows.append((100, "executor stage shuffle", "eng"))
    rows.append((101, "ledger payment credit", "fin"))
    return spark.createDataFrame(rows, "doc_id long, text string, label string")


def test_nb_separable_corpus_is_classified_correctly(spark):
    docs = _corpus(spark)
    feats = hashed_features(docs, n_buckets=64)
    priors, lik = nb_train(
        feats, docs.select("doc_id", "label"), n_buckets=64
    )
    pred = {
        r["doc_id"]: r["predicted"]
        for r in nb_predict(feats, priors, lik).collect()
    }
    want = {r["doc_id"]: r["label"] for r in docs.collect()}
    assert pred == want  # fully separable vocabularies → 100% accuracy


def test_nb_model_is_dense_and_integer(spark):
    """The likelihood table must cover every label × bucket cell (dense
    scaffold — scoring has no null path) with BIGINT weights."""
    docs = _corpus(spark)
    feats = hashed_features(docs, n_buckets=64)
    priors, lik = nb_train(feats, docs.select("doc_id", "label"), n_buckets=64)
    assert lik.count() == 2 * 64
    assert dict(lik.dtypes)["nlp_e12"] == "bigint"
    assert lik.filter(F.col("nlp_e12").isNull()).count() == 0
    assert priors.count() == 2


def test_two_pass_rank_matches_window_rank(spark):
    """The distributed rank must equal the single-window reference on a
    small frame (correctness) while never using a one-task global
    window (shape, asserted in test_plan_quality)."""
    from pyspark.sql import Window

    from data_pipeline_ine_spark.operators.sampling import two_pass_rank

    df = spark.createDataFrame(
        [(i, (i * 37) % 100) for i in range(500)], "id long, s long"
    )
    got = two_pass_rank(df, ["s", "id"], out_col="r")
    ref = df.withColumn(
        "r_ref", F.row_number().over(Window.orderBy("s", "id"))
    )
    diff = (
        got.join(ref, ["id", "s"])
        .filter(F.col("r") != F.col("r_ref"))
        .count()
    )
    assert diff == 0


def test_decile_lift_bins_balance_and_lift_law(spark):
    """Equal-count bins (sizes differ by at most 1), positives conserve,
    and a perfect ranking puts all positives in bin 1 with lift =
    N/P scaled."""
    from data_pipeline_ine_spark.operators.classify import decile_lift

    # 100 rows, 10 positives with the 10 lowest scores -> all in bin 1
    rows = [(i, i, 1 if i < 10 else 0) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, score_e12 long, is_pos int")
    out = {r.bin: r for r in decile_lift(df, "score_e12", "is_pos").collect()}
    assert sorted(out) == list(range(1, 11))
    assert all(out[b].n == 10 for b in out)
    assert out[1].n_pos == 10 and sum(out[b].n_pos for b in out) == 10
    assert out[1].lift_e6 == 10_000_000    # 1e6 * (10/10) / (10/100)
    assert out[2].lift_e6 == 0


def test_cohens_kappa_closed_form(spark):
    """Hand case: 10 rows, truth marginals a=6/b=4, pred a=7/b=3,
    9 agreements -> E = 6*7 + 4*3 = 54, num = 10*9 - 54 = 36,
    den = 100 - 54 = 46, kappa = 36/46."""
    from data_pipeline_ine_spark.operators.classify import cohens_kappa

    truth = [(i, "a" if i < 6 else "b") for i in range(10)]
    # agree on 0-5 ('a') and 7-9 ('b'); row 6 mispredicted 'a'
    pred = [(i, "a") for i in range(7)] + [(i, "b") for i in range(7, 10)]
    t = spark.createDataFrame(truth, "doc_id long, label string")
    p = spark.createDataFrame(pred, "doc_id long, predicted string")
    row = cohens_kappa(p, t).collect()[0]
    assert (row.n, row.n_agree) == (10, 9)
    # recompute expected from actual marginals: truth a=6 b=4, pred a=7 b=3
    assert row.kappa_num == 10 * 9 - (6 * 7 + 4 * 3)
    assert row.kappa_den == 100 - (6 * 7 + 4 * 3)
    assert row.kappa_e6 == 1000000 * row.kappa_num // row.kappa_den


def test_cohens_kappa_negative_and_degenerate(spark):
    """Systematic disagreement gives negative kappa with symmetric
    truncation; a single-class degenerate case (den=0) yields NULL."""
    from data_pipeline_ine_spark.operators.classify import cohens_kappa

    t = spark.createDataFrame(
        [(1, "a"), (2, "b")], "doc_id long, label string"
    )
    p = spark.createDataFrame(
        [(1, "b"), (2, "a")], "doc_id long, predicted string"
    )
    row = cohens_kappa(p, t).collect()[0]
    assert row.kappa_num < 0 and row.kappa_e6 == -1000000  # kappa = -1
    tt = spark.createDataFrame([(1, "a"), (2, "a")], "doc_id long, label string")
    pp = spark.createDataFrame([(1, "a"), (2, "a")], "doc_id long, predicted string")
    row2 = cohens_kappa(pp, tt).collect()[0]
    assert row2.kappa_den == 0 and row2.kappa_e6 is None


def test_shard_manifest_contiguous_and_uniform(spark):
    from data_pipeline_ine_spark.operators.sampling import shard_manifest

    df = spark.createDataFrame(
        [(i, i % 7) for i in range(1000)], "doc_id long, n_chars long"
    )
    rows = sorted(
        shard_manifest(df, 128, size_col="n_chars").collect(),
        key=lambda r: r.shard,
    )
    assert [r.shard for r in rows] == list(range(8))   # ceil(1000/128)
    assert all(r.n_docs == 128 for r in rows[:-1]) and rows[-1].n_docs == 104
    # contiguous, non-overlapping rank ranges covering 1..1000
    assert rows[0].min_rank == 1 and rows[-1].max_rank == 1000
    for a, b in zip(rows, rows[1:]):
        assert b.min_rank == a.max_rank + 1
    assert sum(r.size_sum for r in rows) == sum(i % 7 for i in range(1000))

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

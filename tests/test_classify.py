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

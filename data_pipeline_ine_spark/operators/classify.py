"""Distributed multinomial Naive Bayes over hashed text features — train
AND score as pure Catalyst aggregates, no ML library, engine-exact.

Why this exists in a data-pipeline engine: corpus curation constantly
needs cheap supervised gates (source attribution, quality-tier routing,
contamination triage) where a linear model over hashing-trick features is
the standard tool. Training here is ONE pass of keyed aggregates and
scoring is one broadcast join — both shapes hold at 100 TB, and every
number is reproducible by an external SQL engine:

- features come from :func:`operators.text.hashed_features` (md5-fold
  buckets — engine-invariant);
- every log-probability is snapped to 12-decimal fixed point
  (``floor(-ln p · 1e12 + 0.5)`` — the unigram_logloss recipe) so model
  weights are BIGINTs;
- per-document scores are exact integer sums; the argmax is an integer
  comparison with lexicographic label tie-break.

Laplace smoothing makes every (label, bucket) cell well-defined; the
model is materialized DENSE on a labels × n_buckets scaffold so scoring
never needs a null-path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

E12 = 1_000_000_000_000


def _neglog_e12(p_num, p_den) -> "F.Column":
    """floor(-ln(num/den)·1e12 + 0.5) — fixed-point negative log prob.
    Only IEEE multiply/divide/ln/floor on exact integer inputs, so the
    BIGINT result is reproducible across engines (the proven
    unigram_logloss determinism recipe)."""
    return F.floor(
        -F.log(p_num.cast("double") / p_den.cast("double")) * E12 + F.lit(0.5)
    ).cast("bigint")


def nb_train(
    features: DataFrame,
    labels: DataFrame,
    n_buckets: int,
    id_col: str = "doc_id",
    label_col: str = "label",
) -> tuple[DataFrame, DataFrame]:
    """Train multinomial NB on long-format features ``(id, bucket, tf)``
    joined to ``(id, label)``. Returns ``(priors, likelihoods)``:
    priors ``(label, prior_e12)`` with prior = n_label/n_docs;
    likelihoods ``(label, bucket, nlp_e12)`` dense over the
    labels × n_buckets scaffold, Laplace-smoothed
    ``p = (cnt + 1) / (label_total + n_buckets)``.

    Scale shape: one id-equi join to attach labels (broadcast-able when
    labels ride a dimension; shuffle join otherwise), one
    (label, bucket) aggregate — output is labels × n_buckets rows (the
    MODEL — tiny by construction), one label aggregate for priors."""
    lab = labels.select(id_col, label_col)
    tagged = features.join(lab, id_col)
    cells = tagged.groupBy(label_col, "bucket").agg(F.sum("tf").alias("cnt"))
    label_tot = tagged.groupBy(label_col).agg(F.sum("tf").alias("tot"))
    # dense scaffold: every label × bucket, missing cells count 0 — an
    # explode of a bucket sequence per label row, no join of any kind
    grid = label_tot.select(
        label_col,
        "tot",
        F.explode(F.sequence(F.lit(0), F.lit(n_buckets - 1))).alias("bucket"),
    ).withColumn("bucket", F.col("bucket").cast("bigint"))
    likelihoods = (
        grid.join(cells, [label_col, "bucket"], "left")
        .select(
            label_col,
            "bucket",
            _neglog_e12(
                F.coalesce(F.col("cnt"), F.lit(0)) + 1,
                F.col("tot") + F.lit(n_buckets),
            ).alias("nlp_e12"),
        )
    )
    n_docs = lab.count()
    priors = lab.groupBy(label_col).agg(
        _neglog_e12(F.count(F.lit(1)), F.lit(n_docs)).alias("nlp_prior_e12")
    )
    return priors, likelihoods


def nb_predict(
    features: DataFrame,
    priors: DataFrame,
    likelihoods: DataFrame,
    id_col: str = "doc_id",
    label_col: str = "label",
) -> DataFrame:
    """Score documents: for each label, total negative log prob =
    prior + Σ tf·nlp(label, bucket); predict the MIN (ties to the
    lexicographically smallest label). All integer arithmetic —
    tf ≤ 1e6 · nlp ≤ 4e13 stays far inside BIGINT per doc.

    Scale shape: the model is labels × n_buckets rows — broadcast — so
    scoring is one narrow broadcast join (each feature row fans out to
    n_labels) + one (doc, label) aggregate + one doc-keyed argmin."""
    scored = (
        features.join(F.broadcast(likelihoods), "bucket")
        .groupBy(id_col, label_col)
        .agg(F.sum(F.col("tf") * F.col("nlp_e12")).alias("ll"))
        .join(F.broadcast(priors), label_col)
        .select(
            id_col,
            label_col,
            (F.col("ll") + F.col("nlp_prior_e12")).alias("score_e12"),
        )
    )
    best = scored.groupBy(id_col).agg(
        F.min(F.struct("score_e12", label_col)).alias("b")
    )
    return best.select(
        id_col,
        F.col("b")[label_col].alias("predicted"),
        F.col("b")["score_e12"].alias("score_e12"),
    )


def decile_lift(
    scored: DataFrame,
    score_col: str,
    pos_col: str,
    id_col: str = "doc_id",
    n_bins: int = 10,
) -> DataFrame:
    """Decile lift table — the standard model-quality report for a
    ranking classifier (here: rank docs by a class's NB score, ask how
    concentrated the true positives are in the top deciles; lift@1
    far above 1.0 = the ranking works, ~1.0 = it's noise).

    ``scored`` carries one row per example with ``score_col`` (lower =
    more positive, the neg-log convention of ``nb_predict``) and
    integer ``pos_col`` in {0,1}. Rows are globally ranked by
    ``(score, id)`` (total order), cut into ``n_bins`` equal-count
    bins by integer arithmetic ``(rank-1)*n_bins div N``, and each bin
    reports size, positives, and fixed-point rates:
    ``pos_rate_e6 = 1e6*pos/n`` and ``lift_e6 = 1e6*pos*N/(n*P)`` —
    all truncating integer division over non-negative operands, so
    Spark ``div`` and DuckDB ``//`` agree digit-for-digit.

    Scale shape: the global rank is the two-pass distributed rank
    (``sampling.two_pass_rank`` — never a one-task window); totals N
    and P ride a 1-row broadcast cross join; the final aggregate is
    n_bins rows.
    """
    from data_pipeline_ine_spark.operators.sampling import two_pass_rank

    ranked = two_pass_rank(
        scored.select(id_col, score_col, pos_col),
        [score_col, id_col],
        out_col="_rank",
    )
    totals = ranked.agg(
        F.count(F.lit(1)).alias("_n_total"),
        F.sum(pos_col).cast("bigint").alias("_n_pos_total"),
    )
    binned = ranked.crossJoin(F.broadcast(totals)).select(
        F.expr(f"CAST((_rank - 1) * {n_bins} div _n_total AS INT) + 1").alias(
            "bin"
        ),
        F.col(pos_col).alias("_pos"),
        "_n_total",
        "_n_pos_total",
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("_pos").cast("bigint").alias("n_pos"),
            F.min("_n_total").alias("_nt"),
            F.min("_n_pos_total").alias("_pt"),
        )
        .select(
            "bin",
            "n",
            "n_pos",
            F.expr("CAST(1000000 AS BIGINT) * n_pos div n").alias(
                "pos_rate_e6"
            ),
            F.expr(
                "CAST(1000000 AS BIGINT) * n_pos * _nt div (n * _pt)"
            ).alias("lift_e6"),
        )
    )


def confusion_matrix(
    pred: DataFrame,
    truth: DataFrame,
    id_col: str = "doc_id",
    pred_col: str = "predicted",
    truth_col: str = "label",
) -> DataFrame:
    """Confusion matrix ``(label, predicted, n)`` — the canonical
    classifier error decomposition (which sources get mistaken for
    which). One id-equi join + one (truth, pred) hash aggregate;
    output is |labels|² rows."""
    return (
        pred.select(id_col, pred_col)
        .join(truth.select(id_col, truth_col), id_col)
        .groupBy(truth_col, pred_col)
        .agg(F.count(F.lit(1)).alias("n"))
    )


def cohens_kappa(
    pred: DataFrame,
    truth: DataFrame,
    id_col: str = "doc_id",
    pred_col: str = "predicted",
    truth_col: str = "label",
) -> DataFrame:
    """Cohen's kappa — chance-corrected agreement between two labelings
    (classifier vs truth, annotator vs annotator). Accuracy alone
    flatters majority-class predictors; kappa subtracts the agreement
    two independent raters with these marginals would reach anyway:
    ``κ = (p_o − p_e) / (1 − p_e)``.

    Emitted as exact integers so any engine reproduces it digit-for-
    digit: with N rows, A agreements, and per-class marginal products
    ``E = Σ_c n_truth(c)·n_pred(c)``, κ = (N·A − E)/(N² − E); the row
    carries ``(n, n_agree, kappa_num, kappa_den, kappa_e6)`` with
    ``kappa_e6`` the 1e-6 fixed-point quotient (truncating division;
    numerator sign handled by symmetric truncation toward zero in both
    engines for non-negative denominators).

    Scale shape: one id-equi join; agreements via one conditional
    aggregate; marginals via two |labels|-sized aggregates joined on
    class — everything after the join is labels-sized.
    """
    joined = (
        pred.select(id_col, pred_col)
        .join(truth.select(id_col, truth_col), id_col)
        .localCheckpoint(eager=False)
    )
    totals = joined.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(F.col(pred_col) == F.col(truth_col), 1).otherwise(0)
        ).cast("bigint").alias("n_agree"),
    )
    mt = joined.groupBy(F.col(truth_col).alias("c")).agg(
        F.count(F.lit(1)).alias("nt")
    )
    mp = joined.groupBy(F.col(pred_col).alias("c")).agg(
        F.count(F.lit(1)).alias("np")
    )
    expected = (
        mt.join(mp, "c", "inner")
        .agg(F.sum(F.col("nt") * F.col("np")).alias("e"))
        .select(F.coalesce(F.col("e"), F.lit(0)).cast("bigint").alias("e"))
    )
    return (
        totals.crossJoin(F.broadcast(expected))
        .select(
            "n",
            "n_agree",
            (F.col("n") * F.col("n_agree") - F.col("e")).alias("kappa_num"),
            (F.col("n") * F.col("n") - F.col("e")).alias("kappa_den"),
        )
        .select(
            "n",
            "n_agree",
            "kappa_num",
            "kappa_den",
            F.expr(
                "CASE WHEN kappa_den = 0 THEN NULL "
                "WHEN kappa_num >= 0 THEN "
                "  CAST(1000000 AS BIGINT) * kappa_num div kappa_den "
                "ELSE -(CAST(1000000 AS BIGINT) * (-kappa_num) div kappa_den) "
                "END"
            ).alias("kappa_e6"),
        )
    )

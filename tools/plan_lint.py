"""Plan-hygiene sweep: lint EVERY contract query's physical plan for
scale anti-patterns — the fleet-wide version of the targeted assertions
in tests/test_plan_quality.py.

Flags per plan:
  - CartesianProduct                (unbounded pair blow-up)
  - BroadcastNestedLoopJoin        (non-equi join fallback) — EXCEPT the
    documented one-row broadcast pattern (global aggregates/thresholds
    crossJoined back), which Spark plans as a BNLJ of a 1-row side;
    those queries are allowlisted with the reason inline
  - BatchEvalPython                (row-at-a-time Python UDF)
  - Window with an EMPTY partition spec (one-task global sort of its
    input) — walked off the optimized logical plan via py4j, so
    emptiness is structural, not string-parsed. Exempt: windows whose
    order key is the two-pass ``_pid`` (the prefix sum over a
    |partitions|-row counts frame); every other unpartitioned window
    must be allowlisted with the bound on its input grain inline.

Usage: python tools/plan_lint.py [sf_dir]
Exit code 1 if any unallowlisted hit appears.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_pipeline_ine_spark.session import get_spark

# query -> reason a BroadcastNestedLoopJoin is legitimate there
BNLJ_ALLOWED = {
    # one-row global aggregate broadcast back (documented in SCALING.md)
    "orders_stats": "1-row global stats frame",
    "numeric_coercion_ratio": "1-row coercion-ratio frame",
    "bm25_scores": "1-row (N, avgdl) frame",
    "unigram_logloss": "1-row vocab-size frame",
    "bigram_logloss": "1-row vocab-size frame",
    "dsir_weights": "1-row two-cohort totals frame (dsir_llr)",
    "source_divergence": "1-row vocab-size frame; |sources|x|vocab| grid",
    "vocab_coverage": "1-row corpus-total frame",
    "dq_audit": "1-row audit-total frames",
    "winsorized_revenue": "1-row percentile frame",
    "zscore_outliers": "1-row group-moment frame join",
    "grouped_correlation": "1-row moment frames",
    "mad_outliers": "1-row median/MAD frames",
    "quantile_bins": "1-row cutpoint frame",
    "value_histogram": "1-row min/max frame",
    "value_drift": "1-row decile-edge + totals frames",
    "pmi_collocations": "1-row bigram-total frame",
    "copurchase_lift": "1-row basket-total frame",
    "linkage_scores": "1-row u-probability stats frames",
    "contamination_overlap": "eval-suite shingle broadcast",
    "weighted_doc_sample": "1-row threshold frame",
    "quantile_normalize": "distinct-value frames",
    "curation_pipeline": "1-row quality-threshold frame",
    "source_quality_gate": "per-source threshold frame",
    "user_growth_curve": "calendar-sized running frame",
    "stratified_sample": "1-row stratum-count frame",
    "q11_important_stock": "TPC-H Q11 HAVING: 1-row national-value total",
    "q22_dormant_customers": "TPC-H Q22 scalar avg(acctbal) subquery",
    "tfidf_top_terms": "1-row corpus doc-count frame (idf)",
    "key_skew_profile": "1-row total-count frame (key share)",
    "nearest_station": "98-row geo catalog all-pairs (dimension-sized)",
    "state_occupancy": "1-row data-horizon frame (open-interval clip)",
    "decile_lift": "1-row N/P totals frame + 1-row prior frame",
    "nb_kappa": "1-row totals and expected-agreement frames",
    "benford_digits": "1-row total-count frame (Benford expectation)",
    "psi_drift": "1-row A/B totals frame over <=64 log2 bins",
    "theil_sen_trend": "calendar^2 pair self-join + 1-row totals frames",
    "dow_seasonality": "1-row global-totals frame over a 7-row dow grain",
    "cusum_alarm": "1-row daily-mean frame over a calendar-bounded series",
    "rfm_segments": "1-row corpus-max-date + customer-count frames",
    "loo_target_encode": "1-row global-prior frame over the row grain",
    "feature_mi": "1-row totals frame over the (x,y) cell grain",
    "gini_split": "1-row class-totals frame over <=64 log2 buckets",
    "pq_recall_curve": "n_queries-row broadcast + <=|ks|-row k frame",
    "semdedup_recall": "exact >=tau ground-truth pair self-join — the "
    "measurement tier the cluster-blocked dedup is priced against "
    "(run on a sample at scale); every per-config coverage pass after "
    "it is an equi-join",
    "l_diversity": "1-row min-l frame over the diversity histogram",
    "doc_keywords": "1-row corpus doc-count frame (idf)",
    "binseg_split": "1-row total-moments frame over the calendar grain",
    "markov_attribution": "1-row full-model conversion-mass frame",
    "lsh_recall_curve": "1-row truth/candidate count frames per config",
    "funnel_latency": "1-row converter-count frame per stage transition",
    "perplexity_buckets": "1-row vocab-size + 1-row scored-count frames",
    "t_closeness": "QI-class x value-domain grid + 1-row totals frame",
    "seasonal_decompose": "1-row centering-mean frame over a 7-row dow grain",
    "curriculum_order": "1-row corpus-count frame",
}

# query -> reason an unpartitioned Window is bounded there (grain of
# the frame it sorts). Anything not listed that sorts through an empty
# partition spec (other than the two-pass _pid prefix) fails the lint.
# Data-sized global windows were swapped for the two-pass distributed
# forms instead (funnel_latency/weighted_median/rank_auc/rfm_segments/
# watermark_lateness — sampling.py::two_pass_rank / two_pass_cumsum).
GLOBAL_WINDOW_ALLOWED: dict[str, str] = {
    "acf_daily_revenue": "calendar-grain daily series (<=|days| rows)",
    "binseg_split": "calendar-grain prefix sums (<=|days| rows)",
    "cusum_alarm": "calendar-grain daily series (<=|days| rows)",
    "entity_catalog": "distinct-entity dimension catalog (reference "
    "W1 sequential-id parity)",
    "gini_split": "<=64 log2-bucket grain",
    "kaplan_meier": "duration-day grain (calendar-bounded risk table)",
    "key_skew_profile": "row_number over the TakeOrdered top-10 frame",
    "lag_daily_delta": "calendar-grain daily series (<=|days| rows)",
    "negative_samples": "broadcast-sized catalog rank index (the same "
    "frame is broadcast-joined right after)",
    "binary_recall_curve": "row_number over the <=max(shortlist)-row "
    "Hamming-ranked frame (every budget is a prefix of one bounded "
    "TakeOrdered result)",
    "ra_link_prediction": "row_number over the TakeOrdered top-20 frame",
    "sprt_ab": "calendar-grain daily sequence (<=|days| rows)",
    "theil_sen_trend": "calendar-grain day-pair series",
    "user_growth_curve": "calendar-sized running frame",
    "vocab_coverage": "vocab-grain coverage curve (Heaps-sublinear)",
    "seasonal_decompose": "calendar-grain daily series (<=|days| rows)",
    "skyline_parts": "distinct-price-grain prefix-min sweep (the 2D "
    "skyline's total order over x; the corpus pass is the per-x "
    "aggregate before it)",
}


def unpartitioned_windows(df) -> list[str]:
    """Order specs of every logical Window node with an empty
    partitionSpec, excluding the two-pass ``_pid`` prefix windows."""
    bad: list[str] = []

    def walk(node) -> None:
        if (
            node.getClass().getSimpleName() == "Window"
            and node.partitionSpec().size() == 0
        ):
            order = node.orderSpec().toString()
            if "_pid" not in order:
                bad.append(order[:90])
        for i in range(node.children().size()):
            walk(node.children().apply(i))

    walk(df._jdf.queryExecution().optimizedPlan())
    return bad


def explain(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="plan_lint")
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as contract
    from data_pipeline_ine_spark.operators import similarity

    # lint the real compute plan, not the kNN-graph memo's opaque
    # checkpoint scan (which would pass every check vacuously)
    similarity.GRAPH_MEMO_DISABLED = True
    from data_pipeline_ine_spark.functions import lineage

    # r13: also lint through the in-query lineage cuts
    lineage.CHECKPOINTS_DISABLED = True

    findings: list[str] = []
    n = 0
    for name, fn in contract.queries().items():
        try:
            df = fn(spark, sf_dir)
            plan = explain(df)
            globals_ = unpartitioned_windows(df)
        except Exception as e:  # noqa: BLE001 - report, don't die
            findings.append(f"{name}: PLAN BUILD FAILED: {str(e)[:120]}")
            continue
        n += 1
        if "CartesianProduct" in plan:
            findings.append(f"{name}: CartesianProduct")
        if "BatchEvalPython" in plan:
            findings.append(f"{name}: row-at-a-time Python UDF")
        if "BroadcastNestedLoopJoin" in plan and name not in BNLJ_ALLOWED:
            findings.append(f"{name}: BroadcastNestedLoopJoin (unallowlisted)")
        if globals_ and name not in GLOBAL_WINDOW_ALLOWED:
            findings.append(
                f"{name}: unpartitioned Window (unallowlisted): "
                + "; ".join(globals_)
            )
    print(f"linted {n} plans")
    if findings:
        print("FINDINGS:")
        for f in findings:
            print(" ", f)
        sys.exit(1)
    print("no unallowlisted anti-patterns")


if __name__ == "__main__":
    main()

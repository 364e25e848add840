"""Generate PLANS.md: `explain("formatted")` snapshots of the heaviest
contract queries at sf0.1, annotated with what to look for. Run:

    python tools/gen_plans_md.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_pipeline_ine_spark.session import get_spark

# query -> the property the plan should exhibit
AUDITED = {
    "q3_shipping_priority": "dimension joins broadcast; ONE real shuffle (the aggregation)",
    "knn_within_label": "equi-join on the block key — no cartesian; norms computed pre-join",
    "ppjoin_exact": "prefix equi-join + length filter in the join condition; no nested loop",
    "asof_last_click": "union-tag + single user-keyed window; no inequality join",
    "overlap_shipments": "grid equi-join with first-common-cell dedup in the filter",
    "dedup_components": "iterative min-label joins with localCheckpoint lineage cuts",
    "part_pagerank": "one destination-keyed shuffle per iteration, flat plans",
    "winsorized_revenue": "1-row percentile frame broadcast back; integer cent accumulation",
    "profile_orders": "ONE scan + Expand for the multiple exact distincts",
    "shuffle_rank": "range-partitioned sort; row_number windows partitioned by _pid",
    "v_consolidation": "pivot as conditional aggregates — one shuffle for N members",
    "ivm_revenue": "changelog-sized retract/insert deltas; snapshot touched only by the semi probe",
    "scd2_apply_incremental": "untouched keys anti-join through; rebuild windows only over affected keys",
    "weekly_active_users": "explode rewrite — no BETWEEN nested-loop anywhere",
    "grid_nearest_depot": "cell-key equi-join (never points x sites); WindowGroupLimit pushes the per-point top-1",
    "pareto_parts": "both windows partition-bounded: local cummax by _pid, prefix over per-partition maxima only",
    "pmi_collocations": "one corpus shuffle on the bigram key; marginals re-aggregate bigram-distinct data; total broadcasts",
    "linkage_scores": "blocking-key equi-join (sum-of-block-squared pairs); 1-row stats frames broadcast; TakeOrdered ranking",
    "value_drift": "1-row percentile edges broadcast to both scans; bucket-id aggregates only — zero corpus shuffles",
    "video_frame_stats": "Arrow-batched flat-map demux + pixel decode; repartitioned fan-out, no driver-side media bytes",
    "dup_span_ratio": "spans as 48-bit hash longs; two span-keyed exchanges, both map-side partial-aggregated; doc bodies never shuffle",
    "pq_topk": "ZERO exchanges: literal codebook+LUT ride the plan, integer encode fold, TakeOrderedAndProject top-k",
    "table_reconcile": "per side one n_buckets-cell partial aggregate; the full-outer join compares two 64-row results — row data never crosses",
    "level_shift": "single event_type exchange; two bounded ROWS frames share one Window exec; exact BIGINT frame sums",
    "nb_source_prediction": "model (labels x buckets) broadcast both times; feature fan-out is n_labels-bounded; integer argmin, no ML lib",
    "rp_cosine_consecutive": "projection is a zero-exchange integer fold (formula matrix); one id-equi self-join carries 16-dim BIGINT arrays",
    "ra_link_prediction": "wedge join on the center key; deg is item-sized; top-k is TakeOrderedAndProject, never a global Sort",
    "bloom_membership": "filter rows broadcast (BHJ); probe side never shuffles; groups x m/32-bounded build aggregate",
    "boilerplate_scrub": "discovery aggregate segment-dictionary-sized; apply is a broadcast join + HOF filter in the scan stage",
    "poisson_bootstrap": "B-way explode collapsed by map-side partial aggregation — the only exchange carries groups x B partials",
    "k_core": "per peeling round: one degree aggregate + two node-keyed semi-joins; localCheckpoint keeps round N flat",
    "grid_density_clusters": "corpus work is one cell count; edges are an 8-offset explode semi-joined on the dense set; label rounds cell-keyed",
    "lsh_recall_curve": "truth via shared-shingle equi-join; per-config candidates are band-key equi-joins over one shared signature table",
    "knn_hubness": "composition over the blocked kNN equi-join; histogram adds one neighbor-keyed count + a vector-grain left join",
    "markov_attribution": "one user-keyed window + one edge count; knockout iterations run driver-side on the collected <=36-cell matrix",
    "rank_auc": "value-grain pre-aggregate + two-pass distributed cumulative count (_pid-partitioned windows only) + a 1-row aggregate",
    "funnel_latency": "stacked conditional-min windows on one user-keyed Exchange; median via the two-pass distributed rank (_pid windows), count broadcast back",
    "rfm_segments": "one customer-grain aggregate; quintiles via three two-pass ranks (range repartitions + broadcast offsets), never a single-task ntile sort",
    "ann_index_probe": "static PartitionFilters on the bucket column — the probed scan reads n_probe/n_buckets of the corpus",
    "ann_ivfpq_probe": "pruned bucket scan over PQ CODES only (no raw vectors in the index); ADC ranking is a literal-LUT fold + TakeOrdered",
    "ann_sq8_probe": "pruned bucket scan over int8 CODES only; exact BIGINT zip-fold distance; TakeOrderedAndProject — no global sort",
    "ann_sq8_batch_probe": "ONE shared pruned codes scan for Q queries; broadcast equi-join on bucket; WindowGroupLimit pre-reduces per-query top-k",
    "skyline_parts": "per-x min aggregate is the only corpus pass; prefix-min runs on the distinct-x grain; join back, no nested loop",
    "perplexity_buckets": "vocab-bounded LM aggregate + doc-keyed shuffle; global rank is the two-pass form (_pid windows only); 1-row count broadcast",
    "semdedup_recall": "ONE allowlisted exact-pair BNLJ (the ground truth being priced, sampled); every per-config coverage pass is an equi-join against a narrow exploded assignment",
    "semantic_dedup_mp": "multi-probe candidates = exploded probes equi-joined to primary cells (n_probe x sigma block^2); drop set is a distinct + anti-join, no window",
    "curation_v3": "five gates as per-doc flag semi-joins in one plan; single range exchange (dsir two-pass cumsum); chunk explode sits above the budget filter",
    "ann_binary_rerank": "corpus pass is packed-word integer XOR/popcount in the scan stage; TakeOrdered shortlist; exact cosine only over 50 rows",
    "dup_span_scrub": "spans as 48-bit hashes with positions; dup set equi-joined back; rewrite is a narrow indexed-lambda filter — doc bodies never shuffle",
    # round-12 lifecycle + prefix tier
    "sq8_append_probe": "appended rows live in the SAME pruned codes scan as the base (one layout); probe identical to ann_sq8_probe — the frozen grid leaves no plan trace, which is the point",
    "ann_binary_batch": "ONE shared pruned 8-byte codes scan for Q queries; broadcast (query_id, bucket, qwords) equi-join; per-candidate work is literal-free XOR/popcount against the row's own words",
    "sq8_quant_drift": "params sidecar is O(dim) literals; one posexplode map over the APPENDED cohort + a |dim|-group map-side-combinable aggregate — the corpus is never scanned",
    "ann_prefix_stored": "stage-1 ReadSchema is (id, prefix) ONLY — the full-vector column is absent from the pruned scan; stage 2 is a pushed-down id point-lookup set",
    "ann_prefix_batch": "one narrow pruned (id, prefix) scan for Q queries; WindowGroupLimit per-query shortlist; ONE id-set fetch of full vectors serves every rescore",
    "pq_quant_drift": "both codebooks ride as plan literals; ONE let-bound integer-fold map over the appended cohort + an m-group aggregate — the corpus is never scanned",
    "ann_ivfpq_filtered": "payload predicate as PushedFilters beside the bucket PartitionFilters on the 4-byte codes scan; ADC LUT fold + TakeOrdered",
}

SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    spark = get_spark(app_name="gen-plans")
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as contract

    queries = contract.queries()
    lines = [
        "# PLANS — physical-plan audit of the heavy queries",
        "",
        "Generated by `tools/gen_plans_md.py` (sf0.1). Each section states",
        "the property the plan must exhibit — the same properties",
        "`tests/test_plan_quality.py` asserts mechanically.",
        "",
    ]
    from data_pipeline_ine_spark.operators import similarity

    # the audit documents the COMPUTE plan, not a warm session's
    # checkpoint reuse: the kNN-graph memo's lazily-checkpointed frame
    # would render the blocked joins as an opaque "Scan ExistingRDD"
    similarity.GRAPH_MEMO_DISABLED = True
    from data_pipeline_ine_spark.functions import lineage

    # r13: the in-query lineage cuts (functions/lineage.py::cut) are
    # the same opacity — disable them so the audit shows the full
    # gate-stack/window topology, exactly like the graph memo
    lineage.CHECKPOINTS_DISABLED = True

    for name, claim in AUDITED.items():
        df = queries[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        # keep the operator tree; drop the verbose per-node detail section
        tree = plan.split("\n\n")[0]
        lines += [
            f"## {name}",
            "",
            f"**Must hold:** {claim}",
            "",
            "```",
            tree.strip(),
            "```",
            "",
        ]
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"
    )
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}: {len(AUDITED)} plans")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Benchmark the engine's headline queries.

Runs each headline query from ``__spark_entry__.queries()`` against
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "headline_total", "value": N, "unit": "sec",
     "queries": {"q1_pricing_summary": s, ... every contract entry ...},
     "sf": 0.1}

``value`` totals the stable 27-query HEADLINE set (round-over-round
comparable; each headline entry is the MEDIAN of n=5 runs — raised
from n=3 in r13 because this box's ambient load spikes last ~10 s and
can cover three back-to-back sub-second runs entirely (the r9
rolling_fingerprint false flag); the HEAVY tier stays n=3 — with the
[min, max] spread recorded in the ``all_queries`` line /
``BENCH_FULL.json`` under ``headline_spread``) and the final line's
``queries`` map holds ONLY those 27 entries: the driver captures just the stdout TAIL (2,000 chars), and a
map of all 145 contract queries is ~3.5 kB — r02/r03/r04 all lost the
front of the line and failed to parse. The full per-query map is still
recorded every run, twice: as its own earlier stdout line (tagged
``all_queries``) and as the committed ``BENCH_FULL.json`` that
``tools/bench_compare.py`` reads. ``tests/test_contract_parity.py``
asserts a worst-case final line stays under 1,900 bytes.

Execution is forced with the ``noop`` sink — full pipeline runs on the
cluster, nothing funnels back to the driver, so timings measure the engine,
not result transfer. A warmup query first absorbs session/JIT startup so
per-query numbers reflect steady-state throughput.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_pipeline_ine_spark.session import get_spark

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q4_priority_semi",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q10_returned_items",
    "q12_priority_class",
    "q18_large_volume",
    "v_consolidation",
    "window_top_day",
    "percentiles_by_type",
    "label_join_orders",
    "rollup_revenue",
    "q14_promo_share",
    "asof_last_click",
    "range_click_attribution",
    "sessionize_batch",
    "sliding_6h_3h",
    # training-data ops over documents/embeddings
    "near_dup_buckets",
    "simhash_fingerprints",
    "rolling_fingerprint",
    "embedding_near_dup",
    "ann_lsh_topk",
    "ann_kmeans_topk",
    "dedup_survivors",
    "quality_scores",
]

# Full-sweep heavy tier: the most expensive sweep queries (BENCH_FULL
# top-10) — exactly where a real regression hides inside n=1 noise.
# Medianed n=3 like the headline, spreads recorded alongside, but NOT
# part of the headline total (they aren't round-over-round anchors).
HEAVY = [
    "pyds_observations",
    "pq_recall_curve",
    "video_frame_stats",
    "knn_hubness",
    "video_signature",
    "knn_within_label",
    "knn_ivf_blocked",
    "ppjoin_exact",
    "pq_topk",
    "recursive_bfs_sql",
    "k_core",
    # round-9 additions: the two new cluster-blocked pairwise queries
    # (measured 4-10 s at sf0.1 — exactly the n=1-noise-prone tier)
    "semantic_dedup",
    "curation_semantic",
    # round-10 additions: the 2.5-4 s graph/feature tier plus the two
    # warmup-noise-prone queries the r9->r10 compare false-flagged
    # (feature_mi read 2.13 n=1 vs 0.89 median; dhash 2.79 vs 1.61)
    "profile_orders",
    "part_triangles",
    "part_pagerank",
    "dup_cluster_sizes",
    "part_bfs_hops",
    "ra_link_prediction",
    "feature_mi",
    "image_augment_dhash",
    # r10: the new exact-pairwise mining query (sigma block^2 by
    # design, ~9 s at sf0.1 — the knn_ivf_blocked cost class)
    "hard_negatives",
    # r11: warmup-noise false flag in the r10->r11 compare (sweep n=1
    # read 1.77 s; standalone n=4: cold 6.1, warm 0.75-0.82 — the
    # feature_mi/image_augment_dhash class)
    "audio_dominant_freq",
    # r11: the boundary-closure wave — semdedup_recall carries the
    # deliberately quadratic exact-pair ground truth (pq_recall_curve's
    # cost class), the two multi-probe variants pay n_probe x sigma
    # block^2, and curation_v3 chains five corpus passes in one plan
    "semdedup_recall",
    "semantic_dedup_mp",
    "hard_negatives_mp",
    "curation_v3",
]


def _sf_of(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else -1.0


def final_line(all_timings: dict[str, float], sf: float) -> str:
    """The LAST stdout line: headline total + ONLY the 27 headline
    timings. Must stay under the driver's 2,000-char tail buffer —
    unit-tested against worst-case float widths."""
    head = {n: all_timings[n] for n in HEADLINE if n in all_timings}
    total = round(sum(head.values()), 2)
    return json.dumps(
        {
            "metric": "headline_total",
            "value": total,
            "unit": "sec",
            "queries": head,
            "sf": sf,
        },
        separators=(",", ":"),
    )


def run(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # Console progress bars write carriage-return frames to stdout and can
    # interleave with the single JSON result line (BENCH_r02 was unparseable
    # for exactly this reason) — keep stdout JSON-only.
    spark = get_spark(
        app_name="bench", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as contract

    queries = contract.queries()
    names = [n for n in HEADLINE if n in queries]

    # warmup: JIT/codegen/session init on a small query
    run(queries[names[0]](spark, sf_dir))

    all_timings: dict[str, float] = {}
    spread: dict[str, list[float]] = {}
    # headline first (stable order for round-over-round) at n=5
    # take-median (r13: a single ~10 s ambient spike on this box covers
    # three back-to-back sub-second runs — r9's rolling_fingerprint
    # false flag — so n=3 medians still carried ±20% round-over-round
    # noise), then the heavy full-sweep tier at n=3: a single run
    # cannot distinguish a real regression from machine noise (r6's
    # apparent 30% swings were noise); the [min, max] spreads ship in
    # the all_queries line so bench_compare can tell drift from
    # jitter. The rest of the sweep stays n=1.
    heavy = [n for n in HEAVY if n in queries and n not in names]
    for name in names + heavy:
        n_runs = 5 if name in names else 3
        runs = []
        for _ in range(n_runs):
            t0 = time.perf_counter()
            run(queries[name](spark, sf_dir))
            runs.append(time.perf_counter() - t0)
        runs.sort()
        all_timings[name] = round(runs[n_runs // 2], 2)
        spread[name] = [round(runs[0], 2), round(runs[-1], 2)]
    for name in sorted(set(queries) - set(names) - set(heavy)):
        t0 = time.perf_counter()
        run(queries[name](spark, sf_dir))
        all_timings[name] = round(time.perf_counter() - t0, 2)

    sf = _sf_of(sf_dir)
    # stop the session BEFORE printing so no late executor/JVM output can
    # interleave; lead with a newline to sever any partial stdout line
    spark.stop()
    full = json.dumps(
        {
            "metric": "all_queries",
            "queries": all_timings,
            "headline_spread": spread,
            "sf": sf,
        },
        separators=(",", ":"),
    )
    # full per-query map: committed file (bench_compare reads it) + an
    # EARLIER stdout line for the run log. Never the last line — at 145
    # queries it is ~3.5 kB and the driver's tail buffer is 2,000 chars.
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "BENCH_FULL.json"),
            "w",
        ) as f:
            f.write(full + "\n")
    except OSError:
        pass  # read-only checkout: the stdout line still carries the map
    sys.stdout.write("\n" + full + "\n")
    sys.stdout.write(final_line(all_timings, sf) + "\n")
    sys.stdout.flush()


if __name__ == "__main__":
    main()

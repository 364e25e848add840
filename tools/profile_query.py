#!/usr/bin/env python3
"""Profile one (or more) contract queries: wall time per run + a per-job
wall-time breakdown from the local Spark UI REST API, plus optional
``explain("formatted")`` capture — the guide §1 "measure first" loop in
one command.

Usage::

    python tools/profile_query.py QUERY [QUERY ...] [--sf-dir DIR] [--n 2]
        [--explain-out plans/r12]

Runs each query with the noop sink (guide §1.4), labels runs via
``setJobDescription`` (§1.5), and prints the slowest Spark jobs with their
descriptions so the expensive phase inside a multi-job query (k-means
fits, index builds, checkpoint materializations) is visible without the
UI. The REST pull is read-only and local (UI bound to 127.0.0.1).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _jobs(ui: str, app_id: str):
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/jobs") as r:
        return json.loads(r.read())


def _stages(ui: str, app_id: str):
    url = f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
    with urllib.request.urlopen(url) as r:
        return json.loads(r.read())


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--n", type=int, default=2)
    ap.add_argument("--explain-out", default=None,
                    help="directory for <query>_before.txt explain captures")
    ap.add_argument("--suffix", default="before",
                    help="explain file suffix (before/after)")
    ap.add_argument("--top-jobs", type=int, default=12)
    ap.add_argument("--stages", action="store_true",
                    help="also aggregate executorRunTime per stage name")
    ap.add_argument("--sql", action="store_true",
                    help="dump per-node metrics of the slowest SQL execution")
    args = ap.parse_args()

    from data_pipeline_ine_spark.session import get_spark

    spark = get_spark(
        app_name="profile_query",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.showConsoleProgress": "false",
            "spark.ui.retainedJobs": "20000",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = f"http://127.0.0.1:{spark.sparkContext.uiWebUrl.rsplit(':', 1)[1]}" \
        if spark.sparkContext.uiWebUrl else "http://127.0.0.1:4040"
    app_id = spark.sparkContext.applicationId

    import __spark_entry__ as contract

    queries = contract.queries()

    # warmup (session/JIT) on a cheap query so run 1 is comparable
    warm = queries.get("q6_forecast_revenue") or next(iter(queries.values()))
    warm(spark, args.sf_dir).write.format("noop").mode("overwrite").save()

    for qname in args.queries:
        if qname not in queries:
            print(f"!! unknown query {qname}")
            continue
        fn = queries[qname]
        before_ids = {j["jobId"] for j in _jobs(ui, app_id)}
        times = []
        for i in range(args.n):
            t0 = time.perf_counter()
            fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
            times.append(time.perf_counter() - t0)
        jobs = [j for j in _jobs(ui, app_id) if j["jobId"] not in before_ids]
        per = {}
        for j in jobs:
            try:
                t0 = time.strptime(j["submissionTime"][:19], "%Y-%m-%dT%H:%M:%S")
                t1 = time.strptime(j["completionTime"][:19], "%Y-%m-%dT%H:%M:%S")
                ms_sub = float(j["submissionTime"][20:23] or 0)
                ms_done = float(j["completionTime"][20:23] or 0)
                dur = (time.mktime(t1) + ms_done / 1e3) - (
                    time.mktime(t0) + ms_sub / 1e3)
            except Exception:
                dur = 0.0
            desc = (j.get("name") or j.get("description") or "?")[:110]
            per.setdefault(desc, [0.0, 0])
            per[desc][0] += dur
            per[desc][1] += 1
        print(f"\n== {qname}: runs={[round(t, 2) for t in times]} "
              f"(n_jobs={len(jobs)})")
        ranked = sorted(per.items(), key=lambda kv: -kv[1][0])
        for desc, (tot, cnt) in ranked[: args.top_jobs]:
            print(f"   {tot:7.2f}s  x{cnt:<3d} {desc}")
        if args.stages:
            new_stage_ids = {
                sid for j in jobs for sid in j.get("stageIds", [])}
            agg = {}
            for s in _stages(ui, app_id):
                if s["stageId"] not in new_stage_ids:
                    continue
                key = s.get("name", "?")[:95]
                a = agg.setdefault(key, [0.0, 0, 0])
                a[0] += s.get("executorRunTime", 0) / 1e3
                a[1] += s.get("numCompleteTasks", 0)
                a[2] += 1
            for name, (rt, nt, ns) in sorted(
                    agg.items(), key=lambda kv: -kv[1][0])[: args.top_jobs]:
                print(f"   stage {rt:7.2f}s-core x{ns:<3d} tasks={nt:<5d} {name}")
        if args.sql:
            url = (f"{ui}/api/v1/applications/{app_id}/sql"
                   f"?details=true&planDescription=false&length=200")
            with urllib.request.urlopen(url) as r:
                execs = json.loads(r.read())
            execs = [e for e in execs if e.get("duration")]
            execs.sort(key=lambda e: -e["duration"])
            for e in execs[:1]:
                print(f"   -- SQL exec {e['id']} dur={e['duration']/1e3:.2f}s "
                      f"{e.get('description', '')[:60]}")
                nodes = []
                for n in e.get("nodes", []):
                    mt = {m["name"]: m["value"] for m in n.get("metrics", [])}
                    tm = 0.0
                    for key in ("time in aggregation build total (min, med, max (stageId: taskId))",):
                        pass
                    # surface any duration-ish metric
                    dur_keys = [k for k in mt if "time" in k or "duration" in k]
                    rows = mt.get("number of output rows", "")
                    nodes.append((n["nodeName"], rows,
                                  {k: mt[k] for k in dur_keys}))
                for name, rows, durs in nodes:
                    if rows or durs:
                        ds = "; ".join(f"{k.split('(')[0].strip()}={v}"
                                       for k, v in list(durs.items())[:2])
                        print(f"      {name[:40]:42s} rows={rows:<14s} {ds[:90]}")
        if args.explain_out:
            os.makedirs(args.explain_out, exist_ok=True)
            from data_pipeline_ine_spark.operators import similarity as _sim
            with _sim.graph_memo_disabled():
                df = fn(spark, args.sf_dir)
                plan = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted")
            path = os.path.join(args.explain_out, f"{qname}_{args.suffix}.txt")
            with open(path, "w") as f:
                f.write(plan)
            print(f"   explain -> {path}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python3
"""End-of-round gate sweeps in one command.

Runs every contract query against its DuckDB oracle under the
configurations that have historically caught real bugs (see
.claude/skills/verify/SKILL.md):

  plain      driver-faithful plain session (no tuned conf) at sf0.01
  tz         hostile session timezone (Pacific/Chatham, +12:45)
  aqe-off    spark.sql.adaptive.enabled=false (no plan may depend on AQE)
  sf0.1      plain session at the bench scale factor

Run FROM A CWD OUTSIDE /root/repo (worker closures must not rely on the
repo being importable from the workers' cwd):

    cd /tmp && python /root/repo/tools/gate_sweep.py [plain tz aqe-off sf0.1]

Prints one ``GATE <tag>: ok/total fails=[...]`` line per sweep and exits
non-zero if any query fails any gate. Pass ``--out PATH`` to ALSO write
a machine-readable per-query pass-bit artifact (``GATES_rN.json`` next
to the round's CORRECTNESS file — VERDICT r8 task 5): the all-contract
evidence that fills the 50-slot driver window's gaps, auditable without
re-running 40-minute sweeps.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

CASES = {
    "plain": ({}, "/root/testdata/sf0.01"),
    "tz": (
        {"spark.sql.session.timeZone": "Pacific/Chatham"},
        "/root/testdata/sf0.01",
    ),
    "aqe-off": (
        {"spark.sql.adaptive.enabled": "false"},
        "/root/testdata/sf0.01",
    ),
    "sf0.1": ({}, "/root/testdata/sf0.1"),
}


def main() -> int:
    from pyspark.sql import SparkSession

    import __spark_entry__ as contract
    from oracle import assert_matches_oracle

    args = sys.argv[1:]
    out_path = None
    if "--out" in args:
        i = args.index("--out")
        if i + 1 >= len(args):
            print("usage: gate_sweep.py [tags...] [--out PATH]")
            return 2
        out_path = args[i + 1]
        args = args[:i] + args[i + 2 :]
    tags = args or list(CASES)
    status = 0
    results: dict[str, dict[str, bool]] = {}
    for tag in tags:
        conf, sf = CASES[tag]
        builder = SparkSession.builder.master("local[16]")
        for k, v in conf.items():
            builder = builder.config(k, v)
        spark = builder.getOrCreate()
        q, o = contract.queries(), contract.oracle_sql()
        ok, fails = 0, []
        bits: dict[str, bool] = {}
        for name in sorted(o):
            try:
                assert_matches_oracle(q[name](spark, sf), o[name], sf)
                ok += 1
                bits[name] = True
            except Exception as e:  # noqa: BLE001 - report and continue
                fails.append(name)
                bits[name] = False
                print(f"FAIL {tag} {name} {str(e)[:180]}", flush=True)
        results[tag] = bits
        print(f"GATE {tag}: {ok}/{len(o)} fails={fails}", flush=True)
        if fails:
            status = 1
        spark.stop()
    if out_path:
        summary = {
            tag: f"{sum(bits.values())}/{len(bits)}"
            for tag, bits in results.items()
        }
        with open(out_path, "w") as f:
            json.dump(
                {"summary": summary, "sweeps": results}, f, indent=1,
                sort_keys=True,
            )
        print(f"wrote {out_path}: {summary}", flush=True)
    return status


if __name__ == "__main__":
    sys.exit(main())

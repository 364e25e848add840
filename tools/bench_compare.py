"""Compare two bench.py JSON lines and flag per-query regressions.

    python tools/bench_compare.py OLD.json NEW.json [ratio]

Prints queries whose timing changed by more than ``ratio`` (default 1.5x)
in either direction, plus totals. Timings on this box carry ~±2x noise
for sub-second queries (codegen warmup, CPU contention), so only
sustained multi-run regressions on queries >1s are actionable.
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict:
    with open(path) as f:
        text = f.read().strip()
    try:
        doc = json.loads(text)
    except json.JSONDecodeError:
        doc = json.loads(text.splitlines()[-1])
    if "queries" in doc:
        return doc
    # BENCH_rN.json driver wrapper: {"tail": "...", "parsed": ...}. When
    # parsed is null (r02–r04: the 2,000-char tail buffer lost the front
    # of the line), recover the surviving per-query pairs by regex.
    if doc.get("parsed"):
        return doc["parsed"]
    import re

    pairs = re.findall(r'"([a-z0-9_]+)":([0-9.]+)', doc.get("tail", ""))
    return {"queries": {k: float(v) for k, v in pairs if k != "sf"}}


def main() -> None:
    old, new = load(sys.argv[1]), load(sys.argv[2])
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    oq, nq = old["queries"], new["queries"]
    shared = sorted(set(oq) & set(nq))
    print(f"shared queries: {len(shared)}  (old-only: {len(set(oq)-set(nq))},"
          f" new-only: {len(set(nq)-set(oq))})")
    # BENCH_FULL.json ("all_queries") carries no headline total
    print(f"headline_total: {old.get('value', '-')} -> {new.get('value', '-')}")
    print(f"all-shared total: {round(sum(oq[n] for n in shared), 1)} -> "
          f"{round(sum(nq[n] for n in shared), 1)}")
    flagged = []
    for n in shared:
        a, b = max(oq[n], 0.01), max(nq[n], 0.01)
        r = b / a
        if (r > ratio or r < 1 / ratio) and max(a, b) > 1.0:
            flagged.append((r, n, a, b))
    for r, n, a, b in sorted(flagged, reverse=True):
        tag = "SLOWER" if r > 1 else "faster"
        print(f"  {n:32s} {a:7.2f} -> {b:7.2f}  {r:5.2f}x {tag}")
    if not flagged:
        print("  no per-query change beyond the noise threshold")

    # headline medians (n=3 per run since r7): flag >30% MEDIAN
    # regressions, annotated with each side's [min, max] spread so
    # jitter (overlapping spreads) reads differently from drift
    osp, nsp = old.get("headline_spread"), new.get("headline_spread")
    if osp and nsp:
        regs = []
        for n in sorted(set(osp) & set(nsp)):
            a, b = max(oq.get(n, 0), 0.01), max(nq.get(n, 0), 0.01)
            if b / a > 1.3:
                overlap = nsp[n][0] <= osp[n][1]
                regs.append((b / a, n, a, b, osp[n], nsp[n], overlap))
        print("median regressions >30% (headline, n=3):"
              if regs else "no headline median regression >30%")
        for r, n, a, b, so, sn, ov in sorted(regs, reverse=True):
            note = "spreads overlap (jitter?)" if ov else "DRIFT"
            print(f"  {n:32s} {a:7.2f}{so} -> {b:7.2f}{sn} "
                  f"{r:5.2f}x {note}")


if __name__ == "__main__":
    main()

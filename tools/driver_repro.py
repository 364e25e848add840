#!/usr/bin/env python3
"""Reproduce the driver's Spark-vs-DuckDB check for one contract query.

Usage::

    python tools/driver_repro.py QUERY_NAME [--sf-dir /root/testdata/sf0.01]

Runs the named ``queries()`` entry on Spark and its ``oracle_sql()`` on
DuckDB over the same parquet tables, then compares the results the way the
driver does — columns sorted by name, rows sorted, cell values canonicalised
at the pandas level (so a ``Decimal('12.50')`` vs float ``12.5`` mismatch is
VISIBLE here, unlike tests/oracle.py's str() normalisation) — and prints
every mismatched canonical row plus a type census of both result frames.

This is the 2-minute triage for any red CORRECTNESS row (judge task r05 #5).
Exit status: 0 green, 1 mismatch, 2 usage/error.
"""

from __future__ import annotations

import argparse
import math
import sys
from decimal import Decimal

REPO = "/root/repo"
sys.path.insert(0, REPO)

HOSTILE_NOTE = (
    "  !! harness-hostile cell type (Decimal/array/map/struct) — the driver's"
    " hash canonicaliser cannot match these across engines (r04/r05 lesson);"
    " cast to double/varchar at the contract surface."
)


def _canon_cell(v):
    """Driver-faithful canonicalisation: floats rounded, everything else kept
    TYPED (no str() flattening — that is exactly the infidelity that made
    tests/oracle.py pass where the driver failed)."""
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return round(v, 9)
    return v


def _is_hostile(v) -> bool:
    return isinstance(v, (Decimal, list, tuple, dict, set, bytearray))


def _frame(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon = [tuple(_canon_cell(r[i]) for i in order) for r in rows]
    return [cols[i] for i in order], sorted(
        canon, key=lambda t: tuple((x is None, str(x)) for x in t)
    )


def _cells_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) or isinstance(b, float):
        try:
            return math.isclose(float(a), float(b), rel_tol=0, abs_tol=0)
        except (TypeError, ValueError):
            return False
    return a == b and type(a) is type(b)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("query")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--max-print", type=int, default=20)
    args = ap.parse_args()

    import __spark_entry__ as entry
    from tests.oracle import duckdb_connection

    qs = entry.queries()
    if args.query not in qs:
        print(f"unknown query {args.query!r}; {len(qs)} known", file=sys.stderr)
        return 2
    sql = entry.oracle_sql().get(args.query)
    if sql is None:
        print(f"{args.query} has no oracle (rows-only check)", file=sys.stderr)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    sdf = qs[args.query](spark, args.sf_dir)
    s_cols = [c.lower() for c in sdf.columns]
    s_rows = [tuple(r) for r in sdf.collect()]
    print(f"spark:  {len(s_rows)} rows, schema {sdf.schema.simpleString()}")

    if sql is None:
        return 0

    con = duckdb_connection(args.sf_dir)
    try:
        rel = con.sql(sql)
        o_cols = [c.lower() for c in rel.columns]
        o_rows = rel.fetchall()
    finally:
        con.close()
    print(f"oracle: {len(o_rows)} rows, cols {o_cols}")

    for name, rows in (("spark", s_rows), ("oracle", o_rows)):
        hostile = {
            type(c).__name__ for r in rows[:200] for c in r if _is_hostile(c)
        }
        if hostile:
            print(f"{name} emits {sorted(hostile)} cells")
            print(HOSTILE_NOTE)

    sc, sr = _frame(s_cols, s_rows)
    oc, orr = _frame(o_cols, o_rows)
    status = 0
    if sc != oc:
        print(f"COLUMN MISMATCH:\n  spark ={sc}\n  oracle={oc}")
        status = 1
    if len(sr) != len(orr):
        print(f"ROW COUNT MISMATCH: spark={len(sr)} oracle={len(orr)}")
        status = 1
    shown = 0
    for i, (a, b) in enumerate(zip(sr, orr)):
        if all(_cells_equal(x, y) for x, y in zip(a, b)):
            continue
        status = 1
        if shown < args.max_print:
            diffs = [
                f"{sc[j]}: spark={a[j]!r}({type(a[j]).__name__})"
                f" oracle={b[j]!r}({type(b[j]).__name__})"
                for j in range(len(a))
                if not _cells_equal(a[j], b[j])
            ]
            print(f"row {i}: " + "; ".join(diffs))
            shown += 1
    print("GREEN" if status == 0 else "RED")
    return status


if __name__ == "__main__":
    sys.exit(main())

"""Audit Spark-vs-DuckDB result TYPES for every contract oracle.

The driver hashes typed values, so a DuckDB HUGEINT (from SUM(INTEGER)) against a
Spark BIGINT hash-mismatches even when printed values agree (VERDICT.md round 1,
item 1). This script maps both engines' result column types to a canonical kind and
prints every disagreement so oracle SQLs can be cast before the driver runs.

Usage: python tools/type_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as contract
from data_pipeline_ine_spark.schemas import TESTDATA_TABLES
from data_pipeline_ine_spark.session import get_spark


def canon_duck(t: str) -> str:
    t = str(t).upper()
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT"):
        return "int64"
    if t in ("HUGEINT", "INT128", "UHUGEINT"):
        return "int128"
    if t in ("FLOAT", "DOUBLE"):
        return "double"
    if t.startswith("DECIMAL"):
        return t.lower()
    if t in ("VARCHAR", "TEXT", "STRING"):
        return "string"
    if t == "BOOLEAN":
        return "bool"
    if t == "DATE":
        return "date"
    if t.startswith("TIMESTAMP"):
        return "timestamp"
    if t.endswith("[]"):
        return "array<" + canon_duck(t[:-2]) + ">"
    return t.lower()


def canon_spark(t: str) -> str:
    t = t.lower()
    if t in ("tinyint", "smallint", "int", "bigint"):
        return "int64"
    if t in ("float", "double"):
        return "double"
    if t.startswith("decimal"):
        return t.replace(" ", "")
    if t == "string":
        return "string"
    if t == "boolean":
        return "bool"
    if t == "date":
        return "date"
    if t.startswith("timestamp"):
        return "timestamp"
    m = re.match(r"array<(.+)>", t)
    if m:
        return "array<" + canon_spark(m.group(1)) + ">"
    return t


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark()
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.sql(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries = contract.queries()
    oracles = contract.oracle_sql()
    bad = 0
    for name in queries:
        if name not in oracles:
            continue
        try:
            df = queries[name](spark, sf_dir)
            s_types = {c.lower(): canon_spark(t) for c, t in df.dtypes}
            rel = con.sql(oracles[name])
            o_types = {
                c.lower(): canon_duck(t) for c, t in zip(rel.columns, rel.types)
            }
        except Exception as exc:  # noqa: BLE001
            bad += 1
            print(f"ERROR {name}: {exc}")
            continue
        if set(s_types) != set(o_types):
            bad += 1
            print(f"COLS  {name}: spark={sorted(s_types)} oracle={sorted(o_types)}")
            continue
        for c in s_types:
            if s_types[c] != o_types[c]:
                bad += 1
                print(f"TYPE  {name}.{c}: spark={s_types[c]} oracle={o_types[c]}")
    print(f"done: {bad} issue(s) across {len(oracles)} oracles")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())

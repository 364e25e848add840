"""Local replica of the driver's Spark-vs-DuckDB comparison so parity breaks
surface in pytest before a round's CORRECTNESS run."""

from __future__ import annotations

import math
from decimal import Decimal

import duckdb

from data_pipeline_ine_spark.schemas import TESTDATA_TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.sql(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, (Decimal, list, tuple, dict, set, bytearray, bytes)):
        # The driver's pandas-level hasher cannot match these across
        # engines (ArrayType burned r04, DecimalType burned r05). Fail
        # HERE so local parity is faithful to the driver — cast to
        # double/varchar at the contract surface instead.
        raise AssertionError(
            f"harness-hostile cell type {type(v).__name__}: {v!r} — "
            "cast to double/varchar at the contract surface"
        )
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return round(v, 9)
    return str(v)


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out, key=lambda t: tuple(str(x) for x in t))


def assert_matches_oracle(spark_df, sql: str, sf_dir: str) -> None:
    con = duckdb_connection(sf_dir)
    try:
        oracle = con.sql(sql)
        o_cols = [c.lower() for c in oracle.columns]
        o_rows = oracle.fetchall()
    finally:
        con.close()
    s_cols = [c.lower() for c in spark_df.columns]
    s_rows = [tuple(r) for r in spark_df.collect()]

    sc, sr = _norm_rows(s_cols, s_rows)
    oc, orr = _norm_rows(o_cols, o_rows)
    assert sc == oc, f"column mismatch: spark={sc} oracle={oc}"
    assert len(sr) == len(orr), f"row count mismatch: spark={len(sr)} oracle={len(orr)}"
    for i, (a, b) in enumerate(zip(sr, orr)):
        assert _rows_close(a, b), f"row {i} mismatch:\n  spark={a}\n  oracle={b}"


def _rows_close(a, b) -> bool:
    for x, y in zip(a, b):
        if x is None and y is None:
            continue
        if isinstance(x, float) and isinstance(y, float):
            if not math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-9):
                return False
        elif x != y:
            return False
    return True

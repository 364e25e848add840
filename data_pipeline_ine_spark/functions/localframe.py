"""Driver-built tiny frames as JVM LocalRelations (no Python stage).

``spark.createDataFrame(rows, schema)`` over plain Python rows plans a
Python-RDD scan: EVERY job that consumes the frame pays a Python-worker
round-trip. On the bench box that round-trip measures ~4.5 s per task —
worker spawn dominates; the row count is irrelevant — so an 8-row
sidecar write or a 3-row query batch costs seconds of pure overhead,
re-paid on every action over the frame. The Arrow path
(``createDataFrame`` over a pandas frame with
``spark.sql.execution.arrow.pyspark.enabled``) converts the rows
driver-side and plans a LocalRelation — pure JVM at execution, exactly
the shape of the hand-built VALUES literal
``sources/station_catalog.py`` already uses for the 98-station catalog,
without generating SQL text.

Values are bit-identical to the pickled path: Python floats/ints/strings
cross Arrow losslessly and the explicit schema pins every column type,
so the only difference is WHERE the conversion happens (driver, once)
rather than what arrives.

Scale note: this is for config-sized frames (sidecar rows, query
batches, literal lookup tables) — anything data-sized stays in Spark.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_ARROW_CONF = "spark.sql.execution.arrow.pyspark.enabled"


def local_frame(
    spark: SparkSession, rows: Sequence, schema
) -> DataFrame:
    """``createDataFrame(rows, schema)`` that plans a LocalRelation.

    ``schema`` is the same DDL string (or StructType) the plain call
    takes. Rows are tuples in schema field order; None cells are
    allowed for nullable string/array fields. The Arrow conf is
    runtime-settable and left enabled (the guide's recommended driver
    setting; ``load_table`` establishes the same set-inside-the-path
    precedent for nanosAsLong).
    """
    st = (
        T._parse_datatype_string(schema)
        if isinstance(schema, str)
        else schema
    )
    import pandas as pd

    cols = [f.name for f in st.fields]

    def cell(r, i: int, c: str):
        # dict rows address by field name (createDataFrame parity);
        # tuples/lists/Rows by position
        return r.get(c) if isinstance(r, dict) else r[i]

    data = {
        c: pd.Series([cell(r, i, c) for r in rows], dtype=object)
        for i, c in enumerate(cols)
    }
    pdf = pd.DataFrame(data, columns=cols)
    if spark.conf.get(_ARROW_CONF, "false") != "true":
        spark.conf.set(_ARROW_CONF, "true")
    return spark.createDataFrame(pdf, schema=st)

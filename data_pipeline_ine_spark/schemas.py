"""Explicit schema registry.

The reference declares no types anywhere — every CSV is re-inferred by
``pd.read_csv`` per file (reference ``steps/step3_remove_columns.py:50`` et
al.) and a >50%-numeric heuristic patches things up at the DB sink
(``steps/step6_upload_to_db.py:55-74``). At 100 TB, schema inference means an
extra full scan and nondeterministic types across files, so this engine pins
schemas up front.

Two schema families:

1. The canonical *observation* schema — the reference's 87 datasets collapse
   into 13 physical shapes (SURVEY.md §1.1) that differ only in which
   period/entity columns they carry. We normalize all of them at scan time
   into ONE canonical long fact shape (``OBSERVATION``), which makes the
   downstream engine (filters, consolidation, pivot) schema-invariant.

2. The driver's synthetic TPC-H-ish tables (TESTDATA.md) used for
   correctness + bench.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Canonical long observation fact (SURVEY.md §1.4). One unioned fact table
# replaces 87 files: partition/bucket by ``dataset`` at scale so per-view
# member selection is partition pruning, not a scan.
# ---------------------------------------------------------------------------
OBSERVATION = T.StructType(
    [
        T.StructField("dataset", T.StringType(), False),
        T.StructField("period_code", T.IntegerType(), True),
        T.StructField("period_label", T.StringType(), True),
        T.StructField("station_code", T.StringType(), True),
        T.StructField("station_label", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("flag_codes", T.StringType(), True),
        T.StructField("flags", T.StringType(), True),
    ]
)

# Raw narrow CSV shape before normalization (reference
# ``dictionary/data_columns.txt:17-24``): period code/label + station
# code/label + Value + flags, with per-dataset column names. Normalization is
# name-based (see sources/csv.py), so only the canonical 7-column arity is
# fixed here.
RAW_OBSERVATION_WIDTH = 7

# Known period code columns, probed in this order (reference
# ``steps/step5_create_views.py:295-325``).
PERIOD_CODE_COLUMNS = ("DTI_CL_MES", "DTI_CL_ANO", "DTI_CL_DIA")
PERIOD_LABEL_COLUMNS = ("Mes", "Año", "Anio", "anio", "Día", "Dia")

# The 10 station column types (reference
# ``dictionary/station_columns_mapping.json`` → station_column_types).
STATION_CODE_COLUMNS = (
    "DTI_CL_EST_MONITOREO_AIRE",
    "DTI_CL_ESTACIONES_METEO",
    "DTI_CL_ESTACIONES_FLUVIOMETRICAS",
    "DTI_CL_T010EST_NIVO",
    "DTI_CL_T013EST_POAL",
    "DTI_CL_EMBALSE",
    "DTI_CL_CUENCAS",
    "CL_T017ESTACION_SHOA",
    "DTI_CL_ESTACION",
    "DTI_CL_T009ESTACION_POZO",
)

# Flag columns appear in any of 6 casings (reference
# ``steps/step3_remove_columns.py:25``).
FLAG_COLUMN_VARIANTS = (
    "Flag Codes",
    "Flags",
    "flag codes",
    "flags",
    "FLAG CODES",
    "FLAGS",
)

# Station geo catalog (reference ``dictionary/estaciones_aire_data.json``,
# loaded at ``steps/step5_create_views.py:510-517``).
STATION_CATALOG = T.StructType(
    [
        T.StructField("nombre", T.StringType(), False),
        T.StructField("latitud", T.DoubleType(), True),
        T.StructField("longitud", T.DoubleType(), True),
        T.StructField("numero_region", T.IntegerType(), True),
        T.StructField("nombre_region", T.StringType(), True),
        T.StructField("descripcion", T.StringType(), True),
    ]
)

# ---------------------------------------------------------------------------
# Driver synthetic tables (TESTDATA.md). Declared so scans never pay
# inference and tests can assert stable schemas.
# ---------------------------------------------------------------------------
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

TESTDATA_SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampNTZType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampNTZType()),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampNTZType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}

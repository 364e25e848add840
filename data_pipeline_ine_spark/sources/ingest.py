"""S7/S8 — catalog ingestion analog (reference ``steps/step1_scraper.py``).

The reference drives a browser pool over an 87-dataset catalog and lands
one CSV per dataset in the raw layer (``step1_scraper.py:92-379``), then
re-runs the failures sequentially, tagging survivors with
``fue_reintentado`` and the prior error (``step1_scraper.py:381-447``).
Fetching itself (Playwright, export menus) is external-world I/O, not an
engine operator — SURVEY §7.0 models it as "files appear in the raw
layer". This module supplies the Spark-idiomatic shape of that lifecycle
so the story is complete end-to-end:

- the catalog is distributed with ``sc.parallelize(catalog, n)`` and each
  partition runs the injected ``fetch`` callable via ``mapPartitions`` —
  cluster-parallel ingestion with no asyncio pool to manage (the
  reference's 4-browser queue becomes "one partition per concurrent
  fetch");
- failures from the parallel pass are retried SEQUENTIALLY on the driver
  (mirroring the reference's deliberate gentler second pass) and tagged
  ``fue_reintentado = true`` with ``intento_previo_fallo`` carrying the
  first error;
- the return value is a tiny manifest DataFrame (O(catalog) rows, never
  O(data)) — the downloaded payloads live as files in ``raw_dir``, which
  at scale is an object-store path (Hadoop FS handles s3a/abfss/gs
  transparently; ``local:`` paths only make sense on ``local[*]``).

``fetch`` must be a self-contained picklable callable
``(entry: dict) -> bytes`` — executors don't share the driver's
sys.path, so it must not close over package-level globals. No default
fetcher is shipped: this sandbox has no network, and the reference's
Playwright stack isn't an engine concern — tests inject deterministic
fakes, production injects an HTTP GET.
"""

from __future__ import annotations

import os
from typing import Callable, Iterable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from data_pipeline_ine_spark.functions.localframe import local_frame

MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField("dataset_id", T.StringType(), False),
        T.StructField("nombre", T.StringType(), True),
        T.StructField("categoria", T.StringType(), True),
        T.StructField("status", T.StringType(), False),
        T.StructField("path", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("error", T.StringType(), True),
        T.StructField("fue_reintentado", T.BooleanType(), False),
        T.StructField("intento_previo_fallo", T.StringType(), True),
    ]
)


def _attempt(entry: dict, fetch: Callable[[dict], bytes], raw_dir: str) -> dict:
    """One fetch → one landed file → one manifest row (never raises)."""
    dataset_id = str(entry["id"])
    row = {
        "dataset_id": dataset_id,
        "nombre": entry.get("nombre"),
        "categoria": entry.get("categoria", "general"),
        "status": "exitoso",
        "path": None,
        "n_bytes": None,
        "error": None,
        "fue_reintentado": False,
        "intento_previo_fallo": None,
    }
    try:
        payload = fetch(entry)
        path = os.path.join(raw_dir, f"{dataset_id}.csv")
        with open(path, "wb") as f:
            f.write(payload)
        row["path"] = path
        row["n_bytes"] = len(payload)
    except Exception as e:  # manifest rows, not task failures: a bad URL
        # must not kill the partition's remaining downloads
        row["status"] = "fallido"
        row["error"] = f"{type(e).__name__}: {e}"
    return row


def ingest_catalog(
    spark: SparkSession,
    catalog: list[dict],
    fetch: Callable[[dict], bytes],
    raw_dir: str,
    concurrency: int = 4,
) -> DataFrame:
    """Land every catalog entry in the raw layer; return the manifest.

    Pass 1 is cluster-parallel (``concurrency`` partitions ≙ the
    reference's worker pool, ``step1_scraper.py:321-379``); pass 2
    retries the failures one-by-one on the driver (``:381-447``),
    tagging ``fue_reintentado`` and keeping the first error in
    ``intento_previo_fallo``. Spark's own task retry is deliberately NOT
    relied on here: a fetch failure is data (a manifest row), not a task
    crash, so one dead URL can't fail a whole partition of good ones.
    """
    os.makedirs(raw_dir, exist_ok=True)

    def run_partition(entries: Iterable[dict]) -> Iterator[dict]:
        # self-contained: only closes over `fetch`, `raw_dir` and the
        # module-level helper shipped with this function's pickle
        for entry in entries:
            yield _attempt(entry, fetch, raw_dir)

    n_slices = max(1, min(concurrency, len(catalog) or 1))
    first = (
        spark.sparkContext.parallelize(catalog, n_slices)
        .mapPartitions(run_partition)
        .collect()  # O(catalog) manifest rows, not data
    )

    rows = [r for r in first if r["status"] == "exitoso"]
    for failed in (r for r in first if r["status"] == "fallido"):
        entry = next(e for e in catalog if str(e["id"]) == failed["dataset_id"])
        retried = _attempt(entry, fetch, raw_dir)
        retried["fue_reintentado"] = True
        retried["intento_previo_fallo"] = failed["error"]
        rows.append(retried)

    return local_frame(spark, rows, MANIFEST_SCHEMA)

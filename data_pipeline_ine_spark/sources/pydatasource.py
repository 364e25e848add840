"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API):
the INE observation feed modeled as an engine-native source.

The reference's ingestion is a Playwright scraper that lands one CSV per
dataset (``steps/step1_scraper.py:92-267``, SURVEY §2.1 S7). This source
is its engine-side analog with the three properties a production
connector needs, demonstrated on a deterministic synthetic feed:

- **Partition planning** (``partitions``): one input partition per
  dataset, so a 87-dataset catalog reads with 87-way parallelism and
  Spark schedules/retries each dataset independently — the asyncio
  worker-pool of the reference replaced by engine-native task
  parallelism.
- **Filter pushdown** (``pushFilters``): ``dataset = 'x'`` predicates
  prune partitions at PLAN time — unselected datasets are never
  generated/fetched (the custom-source equivalent of partition pruning;
  remaining filters are returned to Spark for post-evaluation).
- **Arrow-batched generation** (``read``): each partition yields
  ``pyarrow.RecordBatch`` chunks — Spark 4 ingests them without per-row
  pickling, the production batch path (a real connector would decode
  HTTP/SFTP bytes into columnar chunks here). Generation is a pure hash
  function of (dataset, row index) — deterministic across runs, retries,
  and engines, so tests can assert exact contents.

Usage::

    spark.dataSource.register(IneObservationsDataSource)
    df = (spark.read.format("ine_observations")
          .option("datasets", "temperatura,precipitacion")
          .option("rows_per_dataset", "1000").load())
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterable, Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

DEFAULT_DATASETS = "temperatura,precipitacion,caudal,nieve"

SCHEMA_DDL = (
    "dataset STRING, period_code INT, station_code STRING, value DOUBLE"
)


class _DatasetPartition(InputPartition):
    def __init__(self, dataset: str, n_rows: int):
        self.dataset = dataset
        self.n_rows = n_rows


class IneObservationsReader(DataSourceReader):
    def __init__(self, options: dict):
        self._datasets = [
            d.strip()
            for d in options.get("datasets", DEFAULT_DATASETS).split(",")
            if d.strip()
        ]
        self._rows = int(options.get("rows_per_dataset", "100"))

    def pushFilters(self, filters: list[Filter]) -> Iterable[Filter]:
        """Accept dataset-equality filters as partition pruning; every
        other predicate is returned for Spark to evaluate post-scan."""
        remaining = []
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("dataset",):
                self._datasets = [d for d in self._datasets if d == f.value]
            else:
                remaining.append(f)
        return remaining

    def partitions(self) -> Sequence[InputPartition]:
        return [_DatasetPartition(d, self._rows) for d in self._datasets]

    # chunk size for Arrow batches: bounds executor memory per yield while
    # keeping the per-batch fixed costs amortized over ~10k rows
    ARROW_BATCH_ROWS = 10_000

    def read(self, partition: _DatasetPartition):
        # Deterministic synthetic observations: md5-derived fields keyed by
        # (dataset, i) — stable across runs/retries, reproducible anywhere.
        # Yields pyarrow.RecordBatch chunks, NOT per-row tuples: Spark 4's
        # DataSource API takes Arrow batches natively, skipping per-row
        # pickling/conversion entirely — the production batch path a real
        # connector would use (decode bytes -> columnar chunk -> yield).
        import pyarrow as pa

        d = partition.dataset
        schema = pa.schema(
            [
                ("dataset", pa.string()),
                ("period_code", pa.int32()),
                ("station_code", pa.string()),
                ("value", pa.float64()),
            ]
        )
        for lo in range(0, partition.n_rows, self.ARROW_BATCH_ROWS):
            hi = min(lo + self.ARROW_BATCH_ROWS, partition.n_rows)
            periods, stations, values = [], [], []
            for i in range(lo, hi):
                h = hashlib.md5(f"{d}:{i}".encode()).hexdigest()
                periods.append(202401 + int(h[:2], 16) % 12)
                stations.append(f"ST{int(h[2:6], 16) % 97:03d}")
                values.append(round(int(h[6:12], 16) % 10_000 / 100.0, 2))
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array([d] * (hi - lo), pa.string()),
                    pa.array(periods, pa.int32()),
                    pa.array(stations, pa.string()),
                    pa.array(values, pa.float64()),
                ],
                schema=schema,
            )


class IneObservationsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "ine_observations"

    def schema(self) -> StructType | str:
        return SCHEMA_DDL

    def reader(self, schema: StructType) -> IneObservationsReader:
        return IneObservationsReader(self.options)

    def simpleStreamReader(self, schema: StructType):
        return IneObservationsStreamReader(self.options)


def register_ine_source(spark) -> None:
    """Register the source on a session, shipping this module BY VALUE.

    Python workers don't share the driver's sys.path, and cloudpickle
    serializes importable classes by reference — so a plain
    ``spark.dataSource.register`` dies with ModuleNotFoundError on any
    executor that can't import this repo. Registering the module for
    by-value pickling makes the source self-contained, the same
    discipline as the engine's mapInPandas closures.
    """
    import sys

    # registration is a py4j round-trip shipping the pickled-by-value
    # module (~1.5 s); idempotent, so do it once per session
    registered = getattr(spark, "_ine_source_registered", False)
    if registered:
        return
    try:
        from pyspark import cloudpickle
    except ImportError:  # vendored location varies across minor versions
        import pyspark.cloudpickle as cloudpickle  # type: ignore[no-redef]
    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    # runtime-settable; required or Spark refuses a reader with pushFilters
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(IneObservationsDataSource)
    spark._ine_source_registered = True


def expected_rows(dataset: str, n_rows: int) -> list[tuple]:
    """Driver-side reference generator for tests — same hash derivation,
    unpacked from the Arrow batches the reader yields."""
    reader = IneObservationsReader(
        {"datasets": dataset, "rows_per_dataset": str(n_rows)}
    )
    out: list[tuple] = []
    for batch in reader.read(_DatasetPartition(dataset, n_rows)):
        out.extend(
            tuple(col[i] for col in batch.to_pydict().values())
            for i in range(batch.num_rows)
        )
    return out


class IneObservationsStreamReader(SimpleDataSourceStreamReader):
    """Offset-managed streaming read of the same feed — the custom
    STREAMING source half of the Python DataSource API.

    The offset is ``{"i": rows_emitted_per_dataset}``; each micro-batch
    advances it by ``batch_rows`` until ``total_rows``, after which
    ``read`` reports no new data (same offset back). ``readBetweenOffsets``
    regenerates any [start, end) slice bit-identically — that replayability
    is what gives a custom source exactly-once semantics under retries:
    the engine can re-ask for a batch after a crash and MUST get the same
    rows. Determinism comes free here because generation is a pure hash
    of (dataset, i); a real connector achieves it by anchoring offsets to
    immutable upstream positions (file offsets, log sequence numbers).
    """

    def __init__(self, options: dict):
        self._datasets = [
            d.strip()
            for d in options.get("datasets", DEFAULT_DATASETS).split(",")
            if d.strip()
        ]
        self._batch_rows = int(options.get("batch_rows", "25"))
        self._total_rows = int(options.get("total_rows", "100"))

    def initialOffset(self) -> dict:
        return {"i": 0}

    def read(self, start: dict):
        lo = start["i"]
        hi = min(lo + self._batch_rows, self._total_rows)
        if hi <= lo:
            return [], start
        # materialized list, not a generator: the engine pickles the batch
        # into its prefetch cache so replanning never re-reads the source
        return list(self.readBetweenOffsets(start, {"i": hi})), {"i": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        import hashlib as _hashlib

        for d in self._datasets:
            for i in range(start["i"], end["i"]):
                h = _hashlib.md5(f"{d}:{i}".encode()).hexdigest()
                period = 202401 + int(h[:2], 16) % 12
                station = f"ST{int(h[2:6], 16) % 97:03d}"
                value = round(int(h[6:12], 16) % 10_000 / 100.0, 2)
                yield (d, period, station, value)

    def commit(self, end: dict) -> None:
        pass

"""data_pipeline_ine_spark — a PySpark-native analytics engine with the
capabilities of the reference pipeline Enefecto/Data-Pipeline-Ine.

The reference (see SURVEY.md) is an eager, single-process pandas ETL over 87
narrow observation tables. This package re-expresses every operator it uses as
lazy, declarative PySpark DataFrame plans so that Catalyst/Tungsten own
optimization and physical execution, and the same code scales from local[32]
to a 1000-executor cluster:

- ``session``    — SparkSession factory with scale-aware defaults (AQE, Arrow).
- ``schemas``    — explicit schema registry (reference infers per-file; we don't).
- ``sources``    — CSV/Parquet/JSON readers + layered table registry.
- ``operators``  — each reference operator (SURVEY.md §2) as DataFrame → DataFrame.
- ``functions``  — scalar helpers incl. the 50%-numeric coercion heuristic.
- ``plans``      — view-definition interpreter (replaces step5_create_views.py).
- ``streaming``  — Structured Streaming extensions over the events stream.
"""

__version__ = "0.1.0"

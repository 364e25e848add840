"""Step metrics & JSON reports (SURVEY.md §2.1 S4).

The reference computes per-step metrics by re-counting DataFrames in Python
and writes ``reportes/*.json`` (``steps/step3_remove_columns.py:129-214``
and every other step's ``generar_reporte``). Extra ``len(df)`` calls are
free in pandas but are *full jobs* in Spark — so metrics ride along with the
real action via ``df.observe()`` (accumulator-style, zero extra passes) and
the report stays a driver-side JSON.
"""

from __future__ import annotations

import json
import time
from typing import Any

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def observed(
    df: DataFrame, **metrics: Column
) -> tuple[DataFrame, Observation]:
    """Attach named aggregate metrics to a plan; they materialize with the
    next action at no extra cost. Default metric set mirrors the reference's
    row accounting if none given."""
    if not metrics:
        metrics = {"n_rows": F.count(F.lit(1))}
    obs = Observation()
    return df.observe(obs, *[c.alias(n) for n, c in metrics.items()]), obs


def step_report(
    step: str,
    observations: dict[str, Observation],
    extra: dict[str, Any] | None = None,
    path: str | None = None,
) -> dict[str, Any]:
    """Assemble (and optionally write) a per-step JSON report in the spirit
    of the reference's exitosos/fallidos accounting."""
    report = {
        "step": step,
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "metrics": {name: obs.get for name, obs in observations.items()},
    }
    if extra:
        report.update(extra)
    if path:
        with open(path, "w", encoding="utf-8") as fh:
            json.dump(report, fh, ensure_ascii=False, indent=2, default=str)
    return report

"""Data-quality expectation checks — the audit pass every production
pipeline runs between landing and publishing (null budgets, key
uniqueness, referential integrity, domain constraints).

The reference validates implicitly (drop-if-missing, coerce-if-numeric;
``steps/step3_remove_columns.py``, ``steps/step6_upload_to_db.py:55-74``)
and loses the evidence. Here every expectation emits an auditable row
``(check, n_violations, n_rows, violation_rate)`` so a run can be gated
on thresholds and the report persisted next to the data.

Scale shape:
- ``expect``-style predicate checks fuse into ONE conditional aggregate —
  a single scan of the table produces every per-row check's counts, no
  per-check passes.
- Key uniqueness is one keyed aggregate (count>1 groups), the same
  shuffle any dedup pays.
- Referential integrity is a LEFT ANTI join probing the parent keys —
  broadcast while the parent's distinct key set fits, shuffle-join
  beyond; either way orphan counting never materializes the join result.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _audit_row(check: Column, violations: Column, total: Column) -> list[Column]:
    return [
        check.alias("check"),
        violations.cast("bigint").alias("n_violations"),
        total.cast("bigint").alias("n_rows"),
        F.round(violations / F.greatest(total, F.lit(1)), 6).alias(
            "violation_rate"
        ),
    ]


def expect_rows(df: DataFrame, checks: Mapping[str, Column]) -> DataFrame:
    """Evaluate named per-row expectations in ONE pass: each value is a
    boolean Column that is true when the row VIOLATES the expectation.
    Returns one audit row per check."""
    agg = df.agg(
        F.count(F.lit(1)).alias("_n"),
        *[
            F.count(F.when(cond, 1)).alias(f"_v{i}")
            for i, cond in enumerate(checks.values())
        ],
    )
    stack = []
    for i, name in enumerate(checks):
        stack.append(
            F.struct(
                *_audit_row(F.lit(name), F.col(f"_v{i}"), F.col("_n"))
            )
        )
    return agg.select(F.explode(F.array(*stack)).alias("r")).select("r.*")


def expect_unique(df: DataFrame, key_cols: list[str], name: str) -> DataFrame:
    """Key-uniqueness audit: a violation is every row beyond the first in
    a duplicated key group (so 0 violations == the key is unique)."""
    per_key = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("_c"))
    agg = per_key.agg(
        F.sum("_c").alias("_n"),
        F.sum(F.col("_c") - 1).alias("_v"),
    )
    return agg.select(*_audit_row(F.lit(name), F.col("_v"), F.col("_n")))


def expect_references(
    child: DataFrame,
    child_key: str,
    parent: DataFrame,
    parent_key: str,
    name: str,
) -> DataFrame:
    """Referential-integrity audit: child rows whose key has no parent
    (orphans). LEFT ANTI join against the parent's distinct keys."""
    orphans = child.join(
        parent.select(F.col(parent_key).alias(child_key)).distinct(),
        child_key,
        "left_anti",
    )
    n = child.agg(F.count(F.lit(1)).alias("_n"))
    v = orphans.agg(F.count(F.lit(1)).alias("_v"))
    return n.crossJoin(v).select(
        *_audit_row(F.lit(name), F.col("_v"), F.col("_n"))
    )


def union_audit(*audits: DataFrame) -> DataFrame:
    out = audits[0]
    for a in audits[1:]:
        out = out.unionByName(a)
    return out

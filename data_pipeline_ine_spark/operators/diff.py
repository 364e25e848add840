"""Snapshot diff: keyed added/removed/changed comparison of two tables.

The audit step every periodic pipeline needs (and the reference's
idempotent re-run story implies): after re-landing a partition, what
actually changed vs the previous snapshot? Done naively — full outer join
of both tables on the key, then N column-wise comparisons — the shuffle
carries every column of both snapshots. At 100 TB that doubles the
pipeline's largest shuffle for a yes/no question.

The scalable shape here: each side first collapses to ``(key, fingerprint)``
where the fingerprint is one md5 over all compared columns — a narrow
map — so the full-outer join shuffles keys plus 32 bytes per row no matter
how wide the table is. Fingerprints only ever compare WITHIN one engine's
output, so cross-engine string-formatting of doubles is irrelevant to the
diff result (the DuckDB oracle for the contract query uses plain
``IS DISTINCT FROM`` column compares and lands on the same rows).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# unit-separator delimiter + explicit NULL sentinel: without them
# ("a", None) and ("aNone",) — or ("a","b") and ("ab",) — collide
_SEP = "\x1f"
_NULL = "\x00"


def row_fingerprint(cols: Sequence[str]) -> Column:
    """md5 over the delimited, null-sentineled string image of ``cols``."""
    parts = [
        F.coalesce(F.col(c).cast("string"), F.lit(_NULL)) for c in cols
    ]
    return F.md5(F.concat_ws(_SEP, *parts))


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str] | None = None,
    out_col: str = "change_type",
) -> DataFrame:
    """Rows that differ between two snapshots, tagged ``added`` /
    ``removed`` / ``changed``; unchanged rows never leave the join.

    ``compare_cols`` defaults to every non-key column the two frames share
    (a column present in only one side would make every row "changed" —
    schema drift should be handled explicitly, not absorbed silently).
    Returns the key columns + ``out_col``.
    """
    if compare_cols is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        compare_cols = [c for c in shared if c not in set(key_cols)]
    o = old.select(*key_cols, row_fingerprint(compare_cols).alias("_fp_old"))
    n = new.select(*key_cols, row_fingerprint(compare_cols).alias("_fp_new"))
    joined = o.join(n, list(key_cols), "full_outer")
    tag = (
        F.when(F.col("_fp_old").isNull(), F.lit("added"))
        .when(F.col("_fp_new").isNull(), F.lit("removed"))
        .when(F.col("_fp_old") != F.col("_fp_new"), F.lit("changed"))
    )
    return (
        joined.withColumn(out_col, tag)
        .filter(F.col(out_col).isNotNull())
        .select(*key_cols, out_col)
    )

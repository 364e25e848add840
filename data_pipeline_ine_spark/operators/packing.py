"""Sequence packing — assign documents to fixed token-budget packs.

The pretraining batch-construction step: stream documents in a
deterministic order, accumulate token counts, and cut a new pack every
time the running total crosses the budget. Expressed as ONE window pass
(running sum / budget), no iterative bin-packing.

Scale design: the running-sum window must NOT partition by a
low-cardinality key alone (one giant ``source`` = one sorting task = a
straggler at 100 TB). We re-key the window to ``(source, shard)`` where
``shard`` is a deterministic hash of the doc id — B independent packing
streams per source, each with its own budget. B is the parallelism knob:
pick ``B >= ceil(rows_per_largest_source / target_rows_per_task)`` so no
window partition exceeds one task's comfortable sort size (the default 16
keeps partitions <~60M rows per shard even at a 1B-doc single source).

Two shard functions:

- ``shard_xxhash`` — ``pmod(xxhash64(id), B)``: the production default
  (fastest JVM path).
- ``shard_md5`` — ``pmod(md5-prefix-as-int(id), B)``: bit-identical in
  any SQL engine (DuckDB, Trino, ...) for cross-engine verification;
  same structure as ``operators/text.py::fingerprint``.

The greedy split can straddle a pack boundary (a doc may start a pack
that its tokens overflow) — the standard streaming-packing tradeoff, and
deterministic: (source, shard, doc_id) order fixes every assignment.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_SHARDS = 16


def _as_col(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def shard_xxhash(col: Column | str, n_shards: int = DEFAULT_SHARDS) -> Column:
    """Production shard key: pmod(xxhash64(id), B). JVM-native, codegen."""
    return F.pmod(F.xxhash64(_as_col(col)), F.lit(n_shards)).cast("int")


def shard_md5(col: Column | str, n_shards: int = DEFAULT_SHARDS) -> Column:
    """Engine-invariant shard key: the first 15 hex chars of md5 (60 bits,
    always < 2^63) parsed as an integer, mod B. Any SQL engine reproduces
    it exactly: ``CAST(('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 15))
    AS BIGINT) % B``."""
    h = F.conv(F.substring(F.md5(_as_col(col).cast("string")), 1, 15), 16, 10)
    return F.pmod(h.cast("bigint"), F.lit(n_shards)).cast("int")


def pack_sequences(
    df: DataFrame,
    token_col: Column | str,
    budget: int = 2048,
    partition_cols: Sequence[str] = ("source",),
    order_col: str = "doc_id",
    n_shards: int = DEFAULT_SHARDS,
    engine_invariant: bool = True,
) -> DataFrame:
    """Assign each row a ``(shard, pack_id)`` under a per-shard token budget.

    One shuffle on ``(*partition_cols, shard)``; the running sum divides by
    the budget to give the pack id. Output adds ``shard``, ``n_tokens``
    and ``pack_id`` columns.
    """
    shard_fn = shard_md5 if engine_invariant else shard_xxhash
    t = df.withColumns(
        {
            "n_tokens": _as_col(token_col),
            "shard": shard_fn(order_col, n_shards),
        }
    )
    w = (
        Window.partitionBy(*partition_cols, "shard")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = F.sum("n_tokens").over(w)
    return t.withColumn(
        "pack_id", F.floor((cum - 1) / budget).cast("bigint")
    )


def packing_efficiency(
    packed: DataFrame,
    budget: int,
    partition_cols: Sequence[str] = ("source",),
) -> DataFrame:
    """The metric a training run tunes ``budget`` with: per
    (*partition_cols, shard), how full the packs actually are.
    ``pack_sequences``'s greedy running-sum cut means every pack but
    the LAST in each (partition, shard) carries > budget·(p) ... in
    practice: waste = n_packs·budget − token mass (padding the
    dataloader would emit), fill_bp = tokens·10000 div capacity —
    integer basis points, no float division for engines to disagree
    on.

    One aggregate over the already-packed frame — reuses the
    (*partition_cols, shard) partitioning the packing window created.
    Returns (*partition_cols, shard, n_docs, n_packs, tokens_sum,
    capacity, waste, fill_bp).
    """
    keys = [*partition_cols, "shard"]
    agg = packed.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        (F.max("pack_id") + 1).cast("bigint").alias("n_packs"),
        F.sum("n_tokens").cast("bigint").alias("tokens_sum"),
    )
    cap = F.col("n_packs") * F.lit(int(budget))
    return agg.select(
        *keys,
        "n_docs",
        "n_packs",
        "tokens_sum",
        cap.cast("bigint").alias("capacity"),
        (cap - F.col("tokens_sum")).cast("bigint").alias("waste"),
        F.expr(f"(tokens_sum * 10000) div (n_packs * {int(budget)})")
        .cast("bigint")
        .alias("fill_bp"),
    )

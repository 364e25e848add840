"""Data-layout operators: multi-dimensional clustering via space-filling
curves (Z-order / Morton interleaving).

Why this exists at 100 TB: Parquet scan pruning is one-dimensional — sort
the data by ``date`` and a ``customer`` predicate still reads every file.
Interleaving the bits of several key columns into one Morton key and
range-clustering on it gives every dimension locality at once: a
predicate on ANY of the interleaved dimensions maps to a bounded set of
key ranges, so file/row-group min-max statistics prune on all of them
(the technique behind Delta/Iceberg ``OPTIMIZE ZORDER BY``; public
formulation in Morton 1966 and the UB-tree literature, Bayer 1997).

The key is pure integer bit arithmetic — computed JVM-side from built-in
expressions, engine-reproducible, and cheap enough to stamp on every row
at write time.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_BITS = 16


def morton_key(x: Column | str, y: Column | str, bits: int = DEFAULT_BITS) -> Column:
    """Interleave the low ``bits`` bits of two non-negative integer
    columns into one Z-order key: bit ``i`` of ``x`` lands at position
    ``2i``, bit ``i`` of ``y`` at ``2i+1``.

    Unrolled into ``2·bits`` mask-shift-add terms of built-in expressions
    (one whole-stage-codegen projection, no UDF). Callers must pre-fold
    each dimension into ``[0, 2^bits)`` — e.g. ``col % 65536`` or a
    quantile bucket id — because bits above the budget are silently
    dropped by the masking.
    """
    xc = F.col(x) if isinstance(x, str) else x
    yc = F.col(y) if isinstance(y, str) else y
    terms = []
    for i in range(bits):
        terms.append(
            F.shiftright(xc.cast("bigint"), i).bitwiseAND(F.lit(1))
            * F.lit(1 << (2 * i))
        )
        terms.append(
            F.shiftright(yc.cast("bigint"), i).bitwiseAND(F.lit(1))
            * F.lit(1 << (2 * i + 1))
        )
    return reduce(lambda a, b: a + b, terms).cast("bigint")


def morton_key_sql(x_expr: str, y_expr: str, bits: int = DEFAULT_BITS) -> str:
    """ANSI-SQL rendering of :func:`morton_key` — the same unrolled
    mask-shift-add sum, so any engine reproduces the key bit-for-bit
    (used by the driver oracle)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x_expr}) >> {i}) & 1) * {1 << (2 * i)}")
        terms.append(f"((({y_expr}) >> {i}) & 1) * {1 << (2 * i + 1)}")
    return " + ".join(terms)


def cluster_by_zorder(
    df: DataFrame,
    x: Column | str,
    y: Column | str,
    num_partitions: int,
    bits: int = DEFAULT_BITS,
) -> DataFrame:
    """Range-cluster a DataFrame by the Morton key of two dimensions —
    the write-side layout step before a partitioned/bucketed sink.

    ``repartitionByRange`` samples the key distribution so output files
    hold contiguous Z-ranges (balanced even when the key space is
    sparse), and the within-partition sort tightens per-row-group min/max
    stats — the two properties multi-dimensional scan pruning needs.
    The ``_zkey`` column is kept so writers can also partition or bucket
    on a key prefix (``_zkey >> k`` = quadtree cell at level ``bits-k/2``).
    """
    keyed = df.withColumn("_zkey", morton_key(x, y, bits))
    return keyed.repartitionByRange(num_partitions, "_zkey").sortWithinPartitions(
        "_zkey"
    )


def grid_nn_join(
    points: DataFrame,
    sites: DataFrame,
    eps: float,
    point_id: str = "point_id",
    point_xy: tuple[str, str] = ("x", "y"),
    site_id: str = "site_id",
    site_xy: tuple[str, str] = ("x", "y"),
    salt: int = 1,
) -> DataFrame:
    """Blocked spatial nearest-neighbor join: for every point, the
    nearest site within Euclidean radius ``eps`` (points with no site
    in range emit no row). Returns ``(point_id, site_id, d2)`` with
    ``d2`` the squared distance — multiplications only, no sqrt/trig,
    so any engine reproduces it bit-for-bit.

    This is the scale path promised by the 98-station broadcast in
    ``nearest_station`` (reference semantics:
    ``step5_create_views.py:503-539``'s geo catalog): when BOTH sides
    are corpus-sized, all-pairs is quadratic and a broadcast is
    impossible. Here space is cut into an ``eps``-sized grid
    (``floor(coord/eps)``); each point probes its own cell plus the 8
    neighbors (a 9-row explode), sites land in exactly one cell, and
    the match is ONE equi-join on the cell key. Any site within ``eps``
    of a point differs by at most one cell index per axis, so the 3x3
    neighborhood provably contains every in-range candidate; the
    post-join ``d2 <= eps^2`` filter discards corner candidates that
    the coarse grid admits. Work is sum-over-cells(9*|P_c|*|S_c|) —
    density-bounded, never |P|*|S| — and the shuffle key is the cell,
    so skew follows spatial density. When one cell dominates (a dense
    city), pass ``salt > 1``: each point hashes deterministically into
    one of ``salt`` sub-cells and the SITE side replicates ``salt``×,
    so the hot cell's probe work spreads over ``salt`` tasks at the
    cost of a site-side row multiplier — the standard hot-key salting
    trade, worth it exactly when |P_hot| >> salt·|S|. The salt key
    never touches the math: results are bit-identical for every
    ``salt`` (pinned by test). Per-point ranking is a
    WindowGroupLimit-pushed row_number over the candidate set,
    tie-broken by site id.
    """
    if salt < 1:
        raise ValueError(f"salt must be >= 1, got {salt}")
    px, py = point_xy
    sx, sy = site_xy
    cell = F.lit(float(eps))
    p = points.select(
        F.col(point_id).alias("_pid"),
        F.col(px).cast("double").alias("_px"),
        F.col(py).cast("double").alias("_py"),
    )
    s = sites.select(
        F.col(site_id).alias("_sid"),
        F.col(sx).cast("double").alias("_sx"),
        F.col(sy).cast("double").alias("_sy"),
        F.floor(F.col(sx).cast("double") / cell).alias("_kx"),
        F.floor(F.col(sy).cast("double") / cell).alias("_ky"),
    )
    join_keys = ["_kx", "_ky"]
    if salt > 1:
        # replicate every site into all `salt` sub-cells; each point
        # picks one deterministically — partition-placement only, the
        # candidate set (and thus the result) is unchanged
        s = s.select(
            "*",
            F.explode(
                F.array(*[F.lit(i) for i in range(salt)])
            ).alias("_salt"),
        )
        join_keys = ["_kx", "_ky", "_salt"]
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    probe_cols = [
        F.col("_pid"),
        F.col("_px"),
        F.col("_py"),
        (F.floor(F.col("_px") / cell) + F.col("_o.dx")).alias("_kx"),
        (F.floor(F.col("_py") / cell) + F.col("_o.dy")).alias("_ky"),
    ]
    if salt > 1:
        probe_cols.append(F.pmod(F.hash("_pid"), F.lit(salt)).alias("_salt"))
    probes = p.select("*", F.explode(offsets).alias("_o")).select(*probe_cols)
    d2 = (F.col("_px") - F.col("_sx")) * (F.col("_px") - F.col("_sx")) + (
        F.col("_py") - F.col("_sy")
    ) * (F.col("_py") - F.col("_sy"))
    cand = (
        probes.join(s, join_keys)
        .select("_pid", "_sid", d2.alias("d2"))
        .filter(F.col("d2") <= F.lit(float(eps) * float(eps)))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("_pid").orderBy("d2", "_sid")
    return (
        cand.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            F.col("_pid").alias(point_id),
            F.col("_sid").alias(site_id),
            "d2",
        )
    )


def grid_density_clusters(
    points: DataFrame,
    x_units: str = "xu",
    y_units: str = "yu",
    cell_units: int = 1000,
    min_pts: int = 4,
    rounds: int = 8,
) -> DataFrame:
    """Density-based spatial clustering, grid flavor (the DBSCAN idea
    reduced to its deterministic, shuffle-bounded core): bucket points
    into eps-cells, keep cells with ≥ ``min_pts`` points (dense), and
    connect dense cells that touch in the 8-neighborhood — each
    connected blob of dense cells is a cluster. The standard first
    pass for hotspot mining over billions of points: per-point work is
    one integer cell key, and everything after lives on the CELL grid,
    whose size is bounded by the domain, not the corpus.

    Components come from min-label propagation run for a FIXED
    ``rounds`` (label = min(own, neighbors') each round) — the k_core
    discipline: a fixed iteration count is what an oracle can mirror
    structurally; fixpoint lands in ≤ diameter(blob) rounds and a test
    asserts one more round is a no-op. All-integer surfaces
    (coordinates in integer units, labels = cx·100000 + cy).

    Scale shape: one corpus-sized cell count (map-side combinable);
    edges are a generator explode of 8 offsets semi-joined against the
    dense-cell set (≤ 8·|dense| rows); each round is one cell-keyed
    join+aggregate over the dense grid; ``localCheckpoint`` per round
    keeps plans flat. Output: one row per cluster.
    """
    cells = (
        points.select(
            F.expr(f"({x_units}) div {cell_units}").cast("bigint").alias(
                "_cx"
            ),
            F.expr(f"({y_units}) div {cell_units}").cast("bigint").alias(
                "_cy"
            ),
        )
        .groupBy("_cx", "_cy")
        .agg(F.count(F.lit(1)).cast("bigint").alias("_n"))
    )
    dense = (
        cells.filter(F.col("_n") >= min_pts)
        .withColumn(
            "_cell", (F.col("_cx") * 100000 + F.col("_cy")).cast("bigint")
        )
        .localCheckpoint()
    )
    offs = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1) if (dx, dy) != (0, 0)]
    nbrs = dense.select(
        "_cell",
        F.explode(
            F.array(
                *[
                    F.struct(
                        (F.col("_cx") + dx).cast("bigint").alias("nx"),
                        (F.col("_cy") + dy).cast("bigint").alias("ny"),
                    )
                    for dx, dy in offs
                ]
            )
        ).alias("_o"),
    ).select(
        "_cell",
        (F.col("_o.nx") * 100000 + F.col("_o.ny")).cast("bigint").alias(
            "_nbr"
        ),
    )
    edges = nbrs.join(
        dense.select(F.col("_cell").alias("_nbr")), "_nbr", "left_semi"
    ).localCheckpoint()
    labels = dense.select("_cell", F.col("_cell").alias("_lbl"))
    for _ in range(rounds):
        nbr_min = (
            edges.join(
                labels.select(
                    F.col("_cell").alias("_nbr"), F.col("_lbl").alias("_nl")
                ),
                "_nbr",
            )
            .groupBy("_cell")
            .agg(F.min("_nl").alias("_nmin"))
        )
        labels = (
            labels.join(nbr_min, "_cell", "left")
            .select(
                "_cell",
                F.least(
                    F.col("_lbl"), F.coalesce("_nmin", F.col("_lbl"))
                ).alias("_lbl"),
            )
            .localCheckpoint()
        )
    return (
        labels.join(dense.select("_cell", "_n"), "_cell")
        .groupBy(F.col("_lbl").alias("cluster_label"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_cells"),
            F.sum("_n").cast("bigint").alias("n_points"),
        )
        .orderBy("cluster_label")
    )

"""Z-order layout: Morton key bit math, cross-engine SQL parity, and the
range-clustering plan shape."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import functions as F

from data_pipeline_ine_spark.operators.layout import (
    cluster_by_zorder,
    morton_key,
    morton_key_sql,
)


def _interleave(x: int, y: int, bits: int = 16) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_morton_key_known_values(spark):
    cases = [(0, 0), (1, 0), (0, 1), (5, 3), (65535, 65535), (43690, 21845)]
    df = spark.createDataFrame(cases, "x long, y long")
    got = {
        (r.x, r.y): r.z
        for r in df.select("x", "y", morton_key("x", "y").alias("z")).collect()
    }
    for x, y in cases:
        assert got[(x, y)] == _interleave(x, y), (x, y)
    # full 16+16 bits at max fills all 32 low bits
    assert got[(65535, 65535)] == (1 << 32) - 1


def test_morton_key_sql_matches_spark(spark):
    cases = [(i * 977 % 65536, i * 613 % 65536) for i in range(64)]
    df = spark.createDataFrame(cases, "x long, y long")
    spark_keys = sorted(
        r.z for r in df.select(morton_key("x", "y").alias("z")).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t(x BIGINT, y BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", cases)
    duck_keys = sorted(
        r[0]
        for r in con.execute(
            f"SELECT {morton_key_sql('x', 'y')} FROM t"
        ).fetchall()
    )
    assert spark_keys == duck_keys


def test_morton_locality_quadrants(spark):
    # all points with both dims < 2^8 must key below every point with
    # either dim's high bit set — the property scan pruning relies on
    lo = _interleave(255, 255)
    assert lo == (1 << 16) - 1
    assert _interleave(256, 0) > lo and _interleave(0, 256) > lo


def test_cluster_by_zorder_plans_range_partitioning(spark, sf_dir):
    from data_pipeline_ine_spark.sources.registry import load_table

    orders = load_table(spark, sf_dir, "orders")
    epoch_day = F.datediff(
        F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date")
    )
    out = cluster_by_zorder(
        orders, F.col("o_custkey") % 65536, epoch_day % 65536, num_partitions=8
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan.lower()
    assert "_zkey" in plan
    # clustered output: keys are globally range-ordered across partition ids
    parts = out.select(F.spark_partition_id().alias("pid"), "_zkey").groupBy(
        "pid"
    ).agg(F.min("_zkey").alias("lo"), F.max("_zkey").alias("hi")).orderBy("pid")
    rows = parts.collect()
    for a, b in zip(rows, rows[1:]):
        assert a.hi <= b.lo


# ---------------------------------------------------------------------------
# grid_nn_join
# ---------------------------------------------------------------------------
def _brute_nn(points, sites, eps):
    out = {}
    for pid, px, py in points:
        best = None
        for sid, sx, sy in sites:
            d2 = (px - sx) ** 2 + (py - sy) ** 2
            if d2 <= eps * eps and (best is None or (d2, sid) < best):
                best = (d2, sid)
        if best is not None:
            out[pid] = (best[1], best[0])
    return out


def test_grid_nn_join_matches_brute_force(spark):
    from data_pipeline_ine_spark.operators.layout import grid_nn_join

    # pseudo-random but deterministic scatter incl. negative coordinates
    points = [(i, (i * 37 % 200) - 100 + 0.25, (i * 91 % 160) - 80 + 0.5)
              for i in range(120)]
    sites = [(j, (j * 53 % 200) - 100 + 0.75, (j * 29 % 160) - 80 + 0.125)
             for j in range(25)]
    eps = 18.0
    p = spark.createDataFrame(points, "point_id long, x double, y double")
    s = spark.createDataFrame(sites, "site_id long, x double, y double")
    got = {
        r.point_id: (r.site_id, r.d2)
        for r in grid_nn_join(p, s, eps=eps).collect()
    }
    want = _brute_nn(points, sites, eps)
    assert set(got) == set(want)
    for pid in want:
        assert got[pid][0] == want[pid][0], pid
        assert abs(got[pid][1] - want[pid][1]) < 1e-9, pid
    # sanity: some points matched, some out of range
    assert 0 < len(want) < len(points)


def test_grid_nn_join_cross_cell_and_ties(spark):
    from data_pipeline_ine_spark.operators.layout import grid_nn_join

    # site B sits across a cell boundary from the point but within eps;
    # sites C and D are exactly equidistant -> lower id wins
    p = spark.createDataFrame(
        [(1, 9.9, 0.0), (2, 50.0, 50.0)], "point_id long, x double, y double"
    )
    s = spark.createDataFrame(
        [(10, 10.1, 0.0), (20, 49.0, 50.0), (21, 51.0, 50.0)],
        "site_id long, x double, y double",
    )
    got = {r.point_id: r.site_id for r in grid_nn_join(p, s, eps=10.0).collect()}
    assert got == {1: 10, 2: 20}


def test_grid_nn_join_plan_has_no_cartesian(spark):
    from data_pipeline_ine_spark.operators.layout import grid_nn_join

    p = spark.createDataFrame([(1, 0.0, 0.0)], "point_id long, x double, y double")
    s = spark.createDataFrame([(1, 1.0, 1.0)], "site_id long, x double, y double")
    plan = grid_nn_join(p, s, eps=5.0)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_grid_nn_join_salt_is_result_invariant(spark):
    """VERDICT r5 task #6: the hot-cell salt knob must change only
    partition placement — results bit-identical for every salt, the
    salt column present in the physical join keys when salt > 1."""
    import random

    from data_pipeline_ine_spark.operators.layout import grid_nn_join

    rng = random.Random(7)
    # one dominating cell: 300 points in [0, 1)^2 with eps = 1.0
    pts = [(i, rng.random(), rng.random()) for i in range(300)]
    sites = [(j, rng.random() * 3, rng.random() * 3) for j in range(20)]
    p = spark.createDataFrame(pts, "point_id long, x double, y double")
    s = spark.createDataFrame(sites, "site_id long, x double, y double")

    base = grid_nn_join(p, s, eps=1.0)
    salted = grid_nn_join(p, s, eps=1.0, salt=8)
    diff = base.exceptAll(salted).count() + salted.exceptAll(base).count()
    assert diff == 0
    assert base.count() > 0

    plan = salted._jdf.queryExecution().executedPlan().toString()
    assert "_salt" in plan

    import pytest

    with pytest.raises(ValueError, match="salt"):
        grid_nn_join(p, s, eps=1.0, salt=0)


def test_grid_density_clusters_merges_adjacent_blobs_only(spark):
    """Two dense blobs separated by an empty cell stay distinct
    clusters; a diagonal chain of dense cells merges through the
    8-neighborhood over multiple propagation rounds; sparse cells
    never appear."""
    from pyspark.sql import functions as F

    from data_pipeline_ine_spark.operators.layout import (
        grid_density_clusters,
    )

    def blob(cx, cy, n):
        # n points inside cell (cx, cy) with cell_units=10
        return [(cx * 10 + i % 10, cy * 10 + (i * 3) % 10) for i in range(n)]

    pts = (
        blob(0, 0, 5)          # blob A cell (0,0)
        + blob(1, 1, 5)        # diagonal neighbor: same cluster as A
        + blob(2, 2, 5)        # chained diagonal: still cluster A
        + blob(5, 5, 6)        # blob B, far away
        + blob(8, 0, 2)        # sparse (< min_pts): dropped
    )
    df = spark.createDataFrame(pts, "xu long, yu long")
    out = grid_density_clusters(
        df, "xu", "yu", cell_units=10, min_pts=4, rounds=4
    ).collect()
    by_label = {r.cluster_label: r for r in out}
    assert len(by_label) == 2
    a = by_label[0]            # min label of the chained blob = cell(0,0)=0
    assert (a.n_cells, a.n_points) == (3, 15)
    b = by_label[5 * 100000 + 5]
    assert (b.n_cells, b.n_points) == (1, 6)


def test_grid_density_clusters_contract_rounds_reach_fixpoint(spark, sf_dir):
    """The contract pins rounds=8; a 9th round must change nothing on
    the customer placement field (the k_core convergence discipline)."""
    from pyspark.sql import functions as F

    from data_pipeline_ine_spark.operators.layout import (
        grid_density_clusters,
    )

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        F.expr("(c_custkey * 48271) % 18000").cast("bigint").alias("xu"),
        F.expr("(c_custkey * 16807) % 36000").cast("bigint").alias("yu"),
    )
    r8 = grid_density_clusters(cust, "xu", "yu", rounds=8).collect()
    r9 = grid_density_clusters(cust, "xu", "yu", rounds=9).collect()
    assert sorted(map(tuple, r8)) == sorted(map(tuple, r9))

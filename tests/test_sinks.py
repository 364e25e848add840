"""Sink round-trips: partition-discovery helper (O3) and the JDBC sink
(S5) against an embedded Derby database — the only JDBC target available
in-sandbox (Derby ships in Spark's jars for the Hive metastore)."""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_pipeline_ine_spark.sources.registry import load_table
from data_pipeline_ine_spark.sources.sinks import (
    latest_run_date,
    write_jdbc,
    write_layer,
)


def test_latest_run_date_over_partitions(spark, sf_dir, tmp_path):
    path = str(tmp_path / "layer")
    dim = load_table(spark, sf_dir, "nation")
    for day in ("2026-01-02", "2026-01-10", "2026-01-03"):
        write_layer(dim, path, run_date=day)
    assert latest_run_date(spark, path) == "2026-01-10"
    # re-running an old day must not change the answer (dynamic overwrite
    # replaces only that partition)
    write_layer(dim.limit(3), path, run_date="2026-01-02")
    assert latest_run_date(spark, path) == "2026-01-10"


def test_latest_run_date_empty(spark, tmp_path):
    path = str(tmp_path / "empty_layer")
    spark.createDataFrame([], "run_date string, v int").write.partitionBy(
        "run_date"
    ).parquet(path)
    assert latest_run_date(spark, path) is None


def _derby_url(tmp_path) -> str:
    return f"jdbc:derby:{tmp_path}/derby_db;create=true"


def test_jdbc_sink_round_trip(spark, sf_dir, tmp_path):
    """S5 end-to-end: overwrite semantics, batched insert, connection cap."""
    url = _derby_url(tmp_path)
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    dim = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )

    write_jdbc(dim, url, "nation_sink", props, batchsize=7, num_partitions=2)
    back = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", "nation_sink")
        .options(**props)
        .load()
    )
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, dim.collect()))

    # overwrite replaces, never appends (reference step6's DELETE/replace
    # dance, declaratively)
    write_jdbc(dim.limit(5), url, "nation_sink", props, num_partitions=1)
    back2 = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", "nation_sink")
        .options(**props)
        .load()
    )
    assert back2.count() == 5


def test_jdbc_introspection(spark, sf_dir, tmp_path):
    """S6: table-exists probe and database-side scalar queries."""
    from data_pipeline_ine_spark.sources.sinks import jdbc_scalar, jdbc_table_exists

    url = _derby_url(tmp_path)
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    assert not jdbc_table_exists(spark, url, "region_sink", props)

    dim = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    write_jdbc(dim, url, "region_sink", props)
    assert jdbc_table_exists(spark, url, "region_sink", props)

    n = jdbc_scalar(spark, url, "SELECT COUNT(*) AS n FROM region_sink", props)
    assert n == dim.count()


def test_layer_schema_evolution_merges(spark, sf_dir, tmp_path):
    """Adding a column in a later run must not break reads of the layer:
    mergeSchema unions the schemas and backfills NULL for old partitions."""
    path = str(tmp_path / "evolving")
    dim = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    write_layer(dim, path, run_date="2026-01-01")
    write_layer(
        dim.withColumn("r_flag", F.lit("new")), path, run_date="2026-01-02"
    )
    merged = spark.read.option("mergeSchema", True).parquet(path)
    assert set(merged.columns) == {"r_regionkey", "r_name", "r_flag", "run_date"}
    old = merged.filter(F.col("run_date") == "2026-01-01")
    assert old.filter(F.col("r_flag").isNull()).count() == old.count()
    new = merged.filter(F.col("run_date") == "2026-01-02")
    assert new.filter(F.col("r_flag") == "new").count() == new.count()


# ---------------------------------------------------------------------------
# Live-PostgreSQL COPY sink (runs against a scratch server when the stock
# PG binaries exist; skipped otherwise)
# ---------------------------------------------------------------------------
def _scratch_pg(tmpdir: str):
    """Init + start a throwaway PostgreSQL on a unix socket as an
    unprivileged user (PG refuses to run as root). Returns (psql_args,
    stop_fn) or None when unavailable."""
    import shutil
    import subprocess
    import time

    if not (shutil.which("psql") and shutil.which("initdb") or
            os.path.exists("/usr/local/bin/initdb")):
        return None
    initdb = shutil.which("initdb") or "/usr/local/bin/initdb"
    pg_ctl = shutil.which("pg_ctl") or "/usr/local/bin/pg_ctl"
    data = f"{tmpdir}/data"
    os.makedirs(tmpdir, exist_ok=True)
    run_as = None
    if os.geteuid() == 0:
        subprocess.run(["chown", "nobody", tmpdir], check=True)
        run_as = ["su", "-s", "/bin/sh", "nobody", "-c"]

    def sh(cmd: str):
        full = run_as + [cmd] if run_as else ["/bin/sh", "-c", cmd]
        return subprocess.run(full, capture_output=True, text=True, cwd="/tmp")

    r = sh(f"{initdb} -D {data} --no-sync -A trust")
    if r.returncode != 0:
        return None
    r = sh(
        f"{pg_ctl} -D {data} -o '-k {tmpdir} -p 54329 -c listen_addresses=' "
        f"-l {tmpdir}/log start"
    )
    if r.returncode != 0:
        return None
    for _ in range(50):
        probe = subprocess.run(
            ["psql", "-h", tmpdir, "-p", "54329", "-U", "nobody",
             "-d", "postgres", "-qAt", "-c", "SELECT 1"],
            capture_output=True, text=True,
        )
        if probe.returncode == 0:
            break
        time.sleep(0.2)
    else:
        sh(f"{pg_ctl} -D {data} stop -m immediate")
        return None

    args = ["-h", tmpdir, "-p", "54329", "-U", "nobody", "-d", "postgres"]
    return args, lambda: sh(f"{pg_ctl} -D {data} stop -m immediate")


def test_copy_to_postgres_roundtrip(spark, tmp_path):
    """End-to-end against a REAL PostgreSQL 15: schema DDL from the
    DataFrame, parallel CSV staging, \\copy load, and value-faithful
    round-trip including NULLs, commas, and quotes."""
    import subprocess

    import pytest as _pytest

    from data_pipeline_ine_spark.sources.sinks import copy_to_postgres

    import tempfile

    # PG data lives under /tmp directly: the server runs as an unprivileged
    # user who cannot traverse pytest's 0700 root-owned tmp_path
    pg_dir = tempfile.mkdtemp(prefix="pgsink_", dir="/tmp")
    pg = _scratch_pg(pg_dir)
    if pg is None:
        _pytest.skip("no usable PostgreSQL binaries in this environment")
    psql_args, stop = pg
    try:
        df = spark.createDataFrame(
            [
                (1, 10.5, "plain", True),
                (2, None, 'comma, and "quotes"', False),
                (3, -0.25, None, None),
            ],
            "id bigint, v double, s string, flag boolean",
        )
        n = copy_to_postgres(
            df, "t_roundtrip", psql_args, str(tmp_path / "stage")
        )
        assert n == 3

        def q(sql):
            out = subprocess.run(
                ["psql", *psql_args, "-qAt", "-c", sql],
                capture_output=True, text=True,
            )
            assert out.returncode == 0, out.stderr
            return out.stdout.strip()

        assert q('SELECT COUNT(*) FROM "t_roundtrip" WHERE v IS NULL') == "1"
        assert q('SELECT COUNT(*) FROM "t_roundtrip" WHERE s IS NULL') == "1"
        assert q('SELECT SUM(v) FROM "t_roundtrip"') == "10.25"
        assert q("SELECT s FROM \"t_roundtrip\" WHERE id = 2") == (
            'comma, and "quotes"'
        )
        assert q('SELECT flag FROM "t_roundtrip" WHERE id = 1') == "t"
        # overwrite semantics: a second load replaces, never appends
        n2 = copy_to_postgres(
            df.limit(2), "t_roundtrip", psql_args, str(tmp_path / "stage2")
        )
        assert n2 == 2
    finally:
        stop()
        import shutil as _shutil

        _shutil.rmtree(pg_dir, ignore_errors=True)


def test_write_layer_orc_roundtrip_with_pushdown(spark, sf_dir, tmp_path):
    """ORC layer: dynamic-partitioned write → read-back equality, and the
    read plan pushes predicates into the ORC scan (same contract as the
    parquet path)."""
    from data_pipeline_ine_spark.sources.registry import load_table
    from data_pipeline_ine_spark.sources.sinks import write_layer

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    path = str(tmp_path / "orc_layer")
    write_layer(orders, path, run_date="2026-08-14", fmt="orc")
    back = spark.read.orc(path)
    assert back.count() == orders.count()
    diff = (
        back.select(orders.columns).exceptAll(orders).count()
        + orders.exceptAll(back.select(orders.columns)).count()
    )
    assert diff == 0
    plan = (
        back.filter(F.col("o_totalprice") > 100000)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [" in plan and "o_totalprice" in plan.split(
        "PushedFilters"
    )[1][:200]


def test_write_layer_rejects_unknown_format(spark, sf_dir, tmp_path):
    import pytest as _pytest

    from data_pipeline_ine_spark.sources.registry import load_table
    from data_pipeline_ine_spark.sources.sinks import write_layer

    with _pytest.raises(ValueError):
        write_layer(
            load_table(spark, sf_dir, "orders"), str(tmp_path / "x"), fmt="avro"
        )


def test_write_sorted_layer_files_are_range_disjoint(spark, sf_dir, tmp_path):
    """Range-partitioned sorted layout: per-file [min, max] intervals on
    the range column must be pairwise DISJOINT — the property that lets a
    point/range predicate prune to O(1) files."""
    from data_pipeline_ine_spark.sources.registry import load_table
    from data_pipeline_ine_spark.sources.sinks import write_sorted_layer

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    path = str(tmp_path / "sorted_layer")
    write_sorted_layer(orders, path, ("o_totalprice",), n_files=8)
    import glob

    spans = []
    for f in glob.glob(path + "/part-*.parquet"):
        mm = (
            spark.read.parquet(f)
            .agg(F.min("o_totalprice"), F.max("o_totalprice"))
            .collect()[0]
        )
        if mm[0] is not None:
            spans.append((mm[0], mm[1]))
    spans.sort()
    assert len(spans) >= 2
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2, (hi1, lo2)
    back = spark.read.parquet(path)
    assert back.count() == orders.count()

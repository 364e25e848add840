"""Incremental-family steady-state probe: is per-batch cost
O(changelog), not O(base)?

The main ``scale_probe`` grows the whole input N× — the right test for
full-recompute operators, the WRONG test for the incremental family
(``maintain_group_aggregate``, ``scd2_apply``,
``incremental_near_dup_filter``), whose contract is that a fixed-size
change batch costs the same against a 1× base as against an N× base,
up to the unavoidable base SCAN of the retraction/pass-through probe
(shuffle-free; bucketed away entirely on a production table layout).

For each operator this probe measures, with the changelog held FIXED:

  inc(1x)   incremental apply against the 1x base
  inc(Nx)   incremental apply against the Nx base
  full(Nx)  the full recompute the incremental path replaces, at Nx

and reports ``growth = inc(Nx)/inc(1x)`` (should sit far below N —
scan-bounded, not compute-bounded) and ``speedup = full(Nx)/inc(Nx)``
(the steady-state win; should grow with N for any operator whose full
recompute is superlinear). Flags growth > 0.75*N — that would mean the
"incremental" path is doing base-proportional COMPUTE, not just a scan.

Bases are parquet on disk (real scans, mirroring the contract queries),
generated Spark-side with the same deterministic hash recipes as
scale_probe. Usage: python tools/incremental_probe.py [factor]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from data_pipeline_ine_spark.session import get_spark
from tools.scale_probe import generate

BASE_ORDERS = 200_000
BASE_EVENTS = 150_000
CHANGELOG_ROWS = 2_000  # fixed across factors — the whole point


def gen_orders(spark, path: str, n: int) -> None:
    df = spark.range(n).select(
        F.col("id").alias("o_orderkey"),
        F.pmod(F.xxhash64("id"), F.lit(5000)).alias("o_custkey"),
        F.element_at(
            F.array(F.lit("O"), F.lit("F"), F.lit("P")),
            (F.pmod(F.xxhash64(F.col("id") + 1), F.lit(3)) + 1).cast("int"),
        ).alias("o_orderstatus"),
        (F.pmod(F.xxhash64(F.col("id") + 2), F.lit(900000)) / 100.0).alias(
            "o_totalprice"
        ),
    )
    df.repartition(32).write.mode("overwrite").parquet(path)


def gen_events(spark, path: str, n: int) -> None:
    df = spark.range(n).select(
        F.col("id").alias("event_id"),
        F.pmod(F.xxhash64("id"), F.lit(3000)).alias("user_id"),
        (
            F.lit("2024-01-01").cast("timestamp_ntz")
            + F.make_interval(secs=F.pmod(F.xxhash64(F.col("id") + 1), F.lit(3_000_000)))
        ).alias("ts"),
        F.concat(
            F.lit("t"), F.pmod(F.xxhash64(F.col("id") + 2), F.lit(8)).cast("string")
        ).alias("event_type"),
    )
    df.repartition(32).write.mode("overwrite").parquet(path)


def timed(thunk, reps: int = 2) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        thunk()
        best = min(best, time.time() - t0)
    return best


def probe_ivm(spark, factor: int):
    from data_pipeline_ine_spark.operators.diff import maintain_group_aggregate

    paths = {}
    for f in (1, factor):
        p = f"/tmp/inc_probe_orders_{f}x"
        if not os.path.exists(p):
            gen_orders(spark, p, BASE_ORDERS * f)
        paths[f] = p

    def run_inc(f):
        base = spark.read.parquet(paths[f])
        # steady state: the stored aggregate is MATERIALIZED (aggregate-
        # sized parquet), as a production IVM pipeline would keep it
        agg_path = f"/tmp/inc_probe_orders_agg_{f}x"
        if not os.path.exists(agg_path):
            base.groupBy("o_orderstatus").agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias(
                    "value_sum_exact"
                ),
            ).write.mode("overwrite").parquet(agg_path)
        stored = spark.read.parquet(agg_path)
        changes = spark.range(CHANGELOG_ROWS).select(
            (F.col("id") * 7).alias("o_orderkey"),
            F.lit(0).alias("o_custkey"),
            F.lit("O").alias("o_orderstatus"),
            (F.pmod(F.xxhash64("id"), F.lit(90000)) / 100.0).alias("o_totalprice"),
            F.when(F.col("id") % 3 == 0, "D").otherwise("U").alias("op"),
            F.lit(1).alias("seq"),
        )
        maintain_group_aggregate(
            base, changes, ["o_orderkey"], "o_orderstatus", "o_totalprice",
            stored_agg=stored,
        ).count()

    def run_full(f):
        # the recompute IVM replaces: merge changelog into snapshot, re-agg
        base = spark.read.parquet(paths[f])
        changes = spark.range(CHANGELOG_ROWS).select(
            (F.col("id") * 7).alias("o_orderkey"),
            F.when(F.col("id") % 3 == 0, "D").otherwise("U").alias("op"),
            (F.pmod(F.xxhash64("id"), F.lit(90000)) / 100.0).alias("o_totalprice"),
        )
        merged = (
            base.join(changes, "o_orderkey", "left")
            .filter(F.coalesce(F.col("op"), F.lit("K")) != "D")
            .select(
                "o_orderstatus",
                F.coalesce(
                    changes["o_totalprice"], base["o_totalprice"]
                ).alias("price"),
            )
        )
        merged.groupBy("o_orderstatus").agg(
            F.count(F.lit(1)), F.sum(F.col("price").cast("decimal(18,2)"))
        ).count()

    return (
        timed(lambda: run_inc(1)),
        timed(lambda: run_inc(factor)),
        timed(lambda: run_full(factor)),
    )


def probe_ivm_moments(spark, factor: int):
    """Same harness as probe_ivm for the moment-sum maintainer
    (count/sum/sum-of-squares): identical changelog, stored moments
    materialized aggregate-sized."""
    from data_pipeline_ine_spark.operators.diff import maintain_group_moments

    paths = {}
    for f in (1, factor):
        p = f"/tmp/inc_probe_orders_{f}x"
        if not os.path.exists(p):
            gen_orders(spark, p, BASE_ORDERS * f)
        paths[f] = p

    def changes():
        return spark.range(CHANGELOG_ROWS).select(
            (F.col("id") * 7).alias("o_orderkey"),
            F.lit(0).alias("o_custkey"),
            F.lit("O").alias("o_orderstatus"),
            (F.pmod(F.xxhash64("id"), F.lit(90000)) / 100.0).alias(
                "o_totalprice"
            ),
            F.when(F.col("id") % 3 == 0, "D").otherwise("U").alias("op"),
            F.lit(1).alias("seq"),
        )

    def run_inc(f):
        base = spark.read.parquet(paths[f])
        agg_path = f"/tmp/inc_probe_orders_mom_{f}x"
        if not os.path.exists(agg_path):
            dec = F.col("o_totalprice").cast("decimal(18,2)")
            base.groupBy("o_orderstatus").agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(dec).alias("value_sum_exact"),
                F.sum((dec * dec).cast("decimal(38,4)")).alias(
                    "value_sumsq_exact"
                ),
            ).write.mode("overwrite").parquet(agg_path)
        stored = spark.read.parquet(agg_path)
        maintain_group_moments(
            base, changes(), ["o_orderkey"], "o_orderstatus",
            "o_totalprice", stored_agg=stored,
        ).count()

    def run_full(f):
        base = spark.read.parquet(paths[f])
        ch = changes().select("o_orderkey", "op", "o_totalprice")
        merged = (
            base.join(ch, "o_orderkey", "left")
            .filter(F.coalesce(F.col("op"), F.lit("K")) != "D")
            .select(
                "o_orderstatus",
                F.coalesce(ch["o_totalprice"], base["o_totalprice"]).alias(
                    "price"
                ),
            )
        )
        dec = F.col("price").cast("decimal(18,2)")
        merged.groupBy("o_orderstatus").agg(
            F.count(F.lit(1)),
            F.sum(dec),
            F.sum((dec * dec).cast("decimal(38,4)")),
        ).count()

    return (
        timed(lambda: run_inc(1)),
        timed(lambda: run_inc(factor)),
        timed(lambda: run_full(factor)),
    )


def probe_scd2(spark, factor: int):
    from data_pipeline_ine_spark.operators.timeseries import (
        scd2_apply,
        scd2_intervals,
    )

    dims = {}
    for f in (1, factor):
        ev_path = f"/tmp/inc_probe_events_{f}x"
        dim_path = f"/tmp/inc_probe_scd2dim_{f}x"
        if not os.path.exists(ev_path):
            gen_events(spark, ev_path, BASE_EVENTS * f)
        if not os.path.exists(dim_path):
            # steady state: the dimension is MATERIALIZED, as in production
            scd2_intervals(spark.read.parquet(ev_path)).write.mode(
                "overwrite"
            ).parquet(dim_path)
        dims[f] = dim_path

    def batch(seed_shift: int):
        return spark.range(CHANGELOG_ROWS).select(
            (F.col("id") + 10_000_000).alias("event_id"),
            F.pmod(F.xxhash64(F.col("id") + seed_shift), F.lit(3000)).alias(
                "user_id"
            ),
            (
                F.lit("2024-03-01").cast("timestamp_ntz")
                + F.make_interval(secs=F.col("id"))
            ).alias("ts"),
            F.concat(
                F.lit("t"),
                F.pmod(F.xxhash64(F.col("id") + 99), F.lit(8)).cast("string"),
            ).alias("event_type"),
        )

    def run_inc(f):
        scd2_apply(spark.read.parquet(dims[f]), batch(5)).count()

    def run_full(f):
        ev = spark.read.parquet(f"/tmp/inc_probe_events_{f}x")
        scd2_intervals(ev.unionByName(batch(5))).count()

    return (
        timed(lambda: run_inc(1)),
        timed(lambda: run_inc(factor)),
        timed(lambda: run_full(factor)),
    )


def probe_incremental_dedup(spark, factor: int):
    from data_pipeline_ine_spark.operators.dedup import (
        incremental_near_dup_filter,
        jaccard_candidate_pairs,
    )

    dirs = {}
    for f in (1, factor):
        d = f"/tmp/scale_probe_sf{f}x"
        if not os.path.exists(f"{d}/documents.parquet"):
            generate(spark, d, f)
        dirs[f] = d

    def fixed_batch():
        # the fixed incoming batch: 500 docs drawn from the 1x corpus with
        # perturbed ids so they never key-collide with any corpus
        return (
            spark.read.parquet(f"{dirs[1]}/documents.parquet")
            .filter(F.col("doc_id") % 10 == 0)
            .limit(500)
            .select(
                (F.col("doc_id") + 50_000_000).alias("doc_id"),
                "text", "lang", "source", "n_chars",
            )
        )

    def run_inc(f):
        corpus = spark.read.parquet(f"{dirs[f]}/documents.parquet")
        incremental_near_dup_filter(fixed_batch(), corpus).count()

    def run_full(f):
        # the recompute alternative: self-join dedup over corpus+batch
        corpus = spark.read.parquet(f"{dirs[f]}/documents.parquet")
        both = corpus.unionByName(fixed_batch())
        jaccard_candidate_pairs(both).filter(F.col("jaccard") >= 0.5).count()

    return (
        timed(lambda: run_inc(1)),
        timed(lambda: run_inc(factor)),
        timed(lambda: run_full(factor)),
    )


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = get_spark(app_name="incremental_probe")
    spark.sparkContext.setLogLevel("ERROR")
    probes = [
        ("ivm_maintain_group_aggregate", probe_ivm),
        ("ivm_maintain_group_moments", probe_ivm_moments),
        ("scd2_apply", probe_scd2),
        ("incremental_near_dup_filter", probe_incremental_dedup),
        ("stream_rolling_wau_batch", probe_rolling_wau),
        ("stream_cusum_batch", probe_cusum),
    ]
    print(
        f"{'operator':30s} {'inc(1x)':>8s} {'inc(' + str(factor) + 'x)':>8s}"
        f" {'growth':>7s} {'full(' + str(factor) + 'x)':>9s} {'speedup':>8s}"
    )
    flagged = []
    for name, fn in probes:
        i1, iN, fN = fn(spark, factor)
        growth = iN / max(i1, 1e-9)
        speedup = fN / max(iN, 1e-9)
        mark = ""
        if iN > 2.0 and growth > 0.75 * factor:
            mark = "  <-- BASE-PROPORTIONAL"
            flagged.append(name)
        print(
            f"{name:30s} {i1:8.2f} {iN:8.2f} {growth:6.2f}x {fN:9.2f}"
            f" {speedup:7.2f}x{mark}",
            flush=True,
        )
    print(f"\nflagged: {flagged or 'none'}")




def probe_rolling_wau(spark, factor: int):
    """Streaming rolling-WAU maintenance: a fixed 2k-event batch of
    RECENT days against a 1x vs Nx activity history — per-batch cost
    must track the touched calendar slice, not total history."""
    from data_pipeline_ine_spark.operators.timeseries import (
        rolling_distinct_users,
    )
    from data_pipeline_ine_spark.streaming.cdc import (
        maintain_rolling_wau_batch,
    )

    def gen_state(f):
        # f years of daily activity for 3,000 users (activity grain)
        n_days = 365 * f
        act = (
            spark.range(n_days * 1500)
            .select(
                F.pmod(F.xxhash64("id"), F.lit(3000)).alias("user_id"),
                F.date_add(
                    F.lit("2020-01-01").cast("date"),
                    F.pmod(F.xxhash64(F.col("id") + 7), F.lit(n_days)).cast(
                        "int"
                    ),
                ).alias("day"),
            )
            .distinct()
        )
        d = f"/tmp/wau_probe_{f}x"
        if not os.path.exists(f"{d}/activity/_SUCCESS"):
            act.write.mode("overwrite").parquet(f"{d}/activity")
            a = spark.read.parquet(f"{d}/activity")
            (
                a.select(
                    "user_id",
                    F.explode(
                        F.sequence(F.col("day"), F.date_add(F.col("day"), 6))
                    ).alias("day"),
                )
                .join(a.select("day").distinct(), "day", "left_semi")
                .groupBy("day")
                .agg(F.count_distinct("user_id").alias("users_7d"))
                .write.mode("overwrite")
                .parquet(f"{d}/wau")
            )
        return d

    def fixed_batch(f):
        # 2k events in the final 10 days of the f-year history
        n_days = 365 * f
        return spark.range(CHANGELOG_ROWS).select(
            F.pmod(F.xxhash64("id"), F.lit(5000)).alias("user_id"),
            (
                F.lit("2020-01-01").cast("timestamp_ntz")
                + F.make_dt_interval(
                    days=(
                        n_days
                        - 10
                        + F.pmod(F.xxhash64(F.col("id") + 3), F.lit(10))
                    ).cast("int")
                )
            ).alias("ts"),
        )

    def run_inc(f):
        d = gen_state(f)
        act = spark.read.parquet(f"{d}/activity")
        wau = spark.read.parquet(f"{d}/wau")
        na, nw = maintain_rolling_wau_batch(fixed_batch(f), act, wau)
        nw.count()

    def run_full(f):
        d = gen_state(f)
        act = spark.read.parquet(f"{d}/activity")
        merged = act.unionByName(
            fixed_batch(f).select(
                "user_id", F.to_date("ts").alias("day")
            )
        ).distinct()
        # full recompute via the batch operator's contribution explosion
        (
            merged.select(
                "user_id",
                F.explode(
                    F.sequence(F.col("day"), F.date_add(F.col("day"), 6))
                ).alias("day"),
            )
            .join(merged.select("day").distinct(), "day", "left_semi")
            .groupBy("day")
            .agg(F.count_distinct("user_id").alias("users_7d"))
            .count()
        )

    gen_state(1)
    gen_state(factor)
    return (
        timed(lambda: run_inc(1)),
        timed(lambda: run_inc(factor)),
        timed(lambda: run_full(factor)),
    )


def probe_cusum(spark, factor: int):
    """Streaming CUSUM maintenance: a fixed 2k-event batch on the final
    10 days against a 1x vs Nx raw-event history — the state update
    must track the day-grain table (calendar-sized), never the raw
    event history the daily totals replaced."""
    from data_pipeline_ine_spark.streaming.quality import (
        maintain_cusum_batch,
    )

    MU = 200_000  # fixed in-control baseline, cents/day

    def gen_state(f):
        n_days = 365 * f
        d = f"/tmp/cusum_probe_{f}x"
        if not os.path.exists(f"{d}/raw/_SUCCESS"):
            ev = spark.range(n_days * 400).select(
                (
                    F.lit("2020-01-01").cast("timestamp_ntz")
                    + F.make_dt_interval(
                        days=F.pmod(
                            F.xxhash64(F.col("id") + 1), F.lit(n_days)
                        ).cast("int"),
                        hours=F.pmod(
                            F.xxhash64(F.col("id") + 2), F.lit(24)
                        ).cast("int"),
                    )
                ).alias("ts"),
                (
                    F.pmod(F.xxhash64(F.col("id") + 3), F.lit(10000)) / 100.0
                ).alias("value"),
            )
            ev.repartition(32).write.mode("overwrite").parquet(f"{d}/raw")
            raw = spark.read.parquet(f"{d}/raw")
            (
                raw.groupBy(F.to_date("ts").alias("day"))
                .agg(
                    F.sum(
                        F.floor(F.col("value") * 100).cast("decimal(25,0)")
                    )
                    .cast("bigint")
                    .alias("x_cents")
                )
                .write.mode("overwrite")
                .parquet(f"{d}/daily")
            )
        return d

    def fixed_batch(f):
        n_days = 365 * f
        return spark.range(CHANGELOG_ROWS).select(
            (
                F.lit("2020-01-01").cast("timestamp_ntz")
                + F.make_dt_interval(
                    days=(
                        n_days
                        - 10
                        + F.pmod(F.xxhash64(F.col("id") + 5), F.lit(10))
                    ).cast("int")
                )
            ).alias("ts"),
            (F.pmod(F.xxhash64(F.col("id") + 6), F.lit(10000)) / 100.0).alias(
                "value"
            ),
        )

    def run_inc(f):
        d = gen_state(f)
        daily = spark.read.parquet(f"{d}/daily")
        _, cusum = maintain_cusum_batch(fixed_batch(f), daily, MU)
        # the alert sink rides the same surface: transitions must stay
        # calendar-bounded too (r7: alarm_transitions in the hot path)
        from data_pipeline_ine_spark.streaming.quality import (
            alarm_transitions,
        )

        cusum = cusum.localCheckpoint()
        alarm_transitions(cusum).count()
        cusum.count()

    def run_full(f):
        from pyspark.sql import Window

        d = gen_state(f)
        raw = spark.read.parquet(f"{d}/raw")
        merged = raw.unionByName(fixed_batch(f))
        daily = merged.groupBy(F.to_date("ts").alias("day")).agg(
            F.sum(F.floor(F.col("value") * 100).cast("decimal(25,0)"))
            .cast("bigint")
            .alias("x_cents")
        )
        w = Window.orderBy("day").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        k = (MU * 50) // 1000
        s = (
            daily.withColumn(
                "_y", (F.col("x_cents") - F.lit(MU) - F.lit(k)).cast("bigint")
            )
            .withColumn("_p", F.sum("_y").over(w).cast("bigint"))
            .withColumn(
                "_pmin",
                F.least(F.lit(0).cast("bigint"), F.min("_p").over(w)),
            )
            .select("day", (F.col("_p") - F.col("_pmin")).alias("s_cents"))
        )
        s.count()

    gen_state(1)
    gen_state(factor)
    i1 = timed(lambda: run_inc(1))
    iN = timed(lambda: run_inc(factor))
    fN = timed(lambda: run_full(factor))
    return i1, iN, fN


if __name__ == "__main__":
    main()

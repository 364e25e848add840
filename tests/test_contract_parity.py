"""Every queries() entry with an oracle must match DuckDB at sf0.001 —
the same check the driver runs at sf0.01."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as contract
from tests.oracle import assert_matches_oracle

QUERIES = contract.queries()
ORACLES = contract.oracle_sql()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, sf_dir, name):
    if name not in ORACLES:
        pytest.skip("rows-only query (no SQL oracle)")
    df = QUERIES[name](spark, sf_dir)
    assert_matches_oracle(df, ORACLES[name], sf_dir)


def test_entry_smoke(spark):
    df = contract.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_every_query_has_oracle_or_is_documented():
    missing = set(QUERIES) - set(ORACLES)
    # rows-only entries are allowed but should be rare and deliberate
    assert missing == set(), f"queries without oracle: {missing}"


def test_bench_final_line_fits_driver_tail_buffer():
    """The driver records only the last 2,000 stdout chars; r02–r04's
    bench lines were truncated from the front and failed to parse.
    Assert the final line stays under 1,900 bytes even with worst-case
    timing widths (9999.99 s per query)."""
    import bench

    worst = {n: 9999.99 for n in bench.HEADLINE}
    line = bench.final_line(worst, 0.1)
    assert len(line) < 1900, f"bench final line {len(line)} bytes"
    import json

    parsed = json.loads(line)
    assert parsed["metric"] == "headline_total"
    assert set(parsed["queries"]) == set(bench.HEADLINE)


def test_bench_headline_membership_is_pinned():
    """headline_total is only round-over-round comparable if the
    HEADLINE set never drifts silently (VERDICT r5 task #4). The set is
    recorded in tests/headline_manifest.json; changing bench.HEADLINE
    requires updating the manifest in the same commit — a deliberate,
    reviewable act. Every member must also still exist in the contract
    (a renamed query would silently drop out of the bench via the
    `if n in queries` filter)."""
    import json

    import bench

    with open(
        os.path.join(os.path.dirname(__file__), "headline_manifest.json")
    ) as f:
        manifest = json.load(f)["queries"]
    assert sorted(bench.HEADLINE) == manifest, (
        "bench.HEADLINE drifted from tests/headline_manifest.json — "
        "update the manifest deliberately if the change is intended"
    )
    missing = set(bench.HEADLINE) - set(QUERIES)
    assert missing == set(), f"HEADLINE names not in the contract: {missing}"


def test_no_harness_hostile_output_types(spark, sf_dir):
    """The driver's hash canonicaliser cannot match DecimalType (burned
    r05: 4 value-exact queries red) or Array/Map/StructType (burned r04:
    inverted_index) across engines. This converts the determinism
    header's convention into a mechanical invariant over every contract
    query's TOP-LEVEL result schema — plan construction only, no
    execution."""
    from pyspark.sql.types import (
        ArrayType,
        BinaryType,
        DecimalType,
        MapType,
        StructType,
    )

    hostile_types = (ArrayType, BinaryType, DecimalType, MapType, StructType)
    bad = {}
    for name, fn in QUERIES.items():
        df = fn(spark, sf_dir)
        hostile = [
            f"{f.name}:{f.dataType.simpleString()}"
            for f in df.schema.fields
            if isinstance(f.dataType, hostile_types)
        ]
        if hostile:
            bad[name] = hostile
    assert bad == {}, (
        "contract queries emitting harness-hostile top-level columns "
        f"(cast to double/varchar at the contract surface): {bad}"
    )


def test_check_order_is_a_permutation_of_the_contract():
    """_CHECK_ORDER drives which queries get driver evidence each round;
    a typo'd or stale name would silently drop out of the rotation
    (_check_ordered skips unknown keys). Assert it is exactly a
    duplicate-free permutation of the query registry, and that the
    oracle registry enumerates in the same order."""
    order = contract._CHECK_ORDER
    assert len(order) == len(set(order)), "duplicate names in _CHECK_ORDER"
    assert set(order) == set(QUERIES), (
        f"missing from order: {set(QUERIES) - set(order)}; "
        f"stale in order: {set(order) - set(QUERIES)}"
    )
    assert list(QUERIES) == list(ORACLES), "queries/oracles enumerate differently"
    # the driver checks the first 50: they must all have oracles
    assert all(n in ORACLES for n in list(QUERIES)[:50])


def test_check_order_follows_the_rotation_policy():
    """_CHECK_ORDER is generated state (tools/rotate_check_order.py) —
    pin that the committed list actually follows the policy the driver
    window depends on: reds from the latest CORRECTNESS file first,
    then queries touched since their last green driver row
    (tools/touched_since_green.json — VERDICT r12 task 2), then strict
    oldest-driver-row-first with never-checked queries slotted
    immediately after the single oldest stale cohort (VERDICT r8
    task 2's prescribed order)."""
    import glob
    import json
    import os
    import re

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    latest, reds = {}, set()
    files = sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")))
    assert files, "no CORRECTNESS files — cannot check rotation"
    for path in files:
        rnd = int(re.search(r"r(\d+)", os.path.basename(path)).group(1))
        for name, v in json.load(open(path)).items():
            latest[name] = rnd
            if path == files[-1]:
                green = (
                    v.get("rows_match")
                    and v.get("schema_match")
                    and v.get("hash_match")
                )
                (reds.discard if green else reds.add)(name)

    touched_path = os.path.join(repo, "tools", "touched_since_green.json")
    touched = {}
    if os.path.exists(touched_path):
        touched = {
            n: rnd
            for n, rnd in json.load(open(touched_path))["entries"].items()
            if latest.get(n, -1) < rnd
        }

    current = list(contract.queries())
    checked = [n for n in current if n in latest and n not in reds]
    never_key = (
        (min(latest[n] for n in checked) + 0.5) if checked else 0.0
    )
    expect = sorted(n for n in current if n in reds) + sorted(
        (n for n in current if n not in reds),
        key=lambda n: (
            0 if n in touched else 1,
            touched.get(n, 0),
            latest.get(n, never_key),
            n,
        ),
    )
    assert current == expect, (
        "stale _CHECK_ORDER — rerun tools/rotate_check_order.py "
        "(first divergence at index "
        f"{next(i for i, (a, b) in enumerate(zip(current, expect)) if a != b)})"
    )

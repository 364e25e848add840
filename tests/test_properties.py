"""Property-based checks (hypothesis) for the operators whose semantics are
easiest to get subtly wrong: as-of matching, fused consolidation, and
normalization-invariant fingerprints. Each property runs few examples
(Spark jobs are ~seconds) but explores adversarial shapes: duplicate
timestamps, empty sides, all-sparse groups, unicode punctuation."""

from __future__ import annotations

import os
import sys

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

ts_strategy = st.integers(min_value=0, max_value=50)
key_strategy = st.integers(min_value=0, max_value=3)


@SETTINGS
@given(
    left=st.lists(st.tuples(key_strategy, ts_strategy), min_size=1, max_size=12),
    right=st.lists(st.tuples(key_strategy, ts_strategy, st.integers(0, 99)),
                   min_size=0, max_size=12),
)
def test_asof_join_matches_naive_semantics(spark, left, right):
    from data_pipeline_ine_spark.operators.joins import asof_join

    # dedupe right on (key, ts) so the expected value is well-defined
    right = list({(k, t): v for k, t, v in right}.items())
    right = [(k, t, v) for (k, t), v in right]
    ldf = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left)], "row_id long, k long, t long"
    )
    rdf = spark.createDataFrame(right, "k long, t long, v long")
    out = {
        r.row_id: r.v_asof
        for r in asof_join(ldf, rdf, on="k", left_ts="t", right_ts="t",
                           payload_cols=("v",)).collect()
    }
    for i, (k, t) in enumerate(left):
        cands = [(rt, v) for rk, rt, v in right if rk == k and rt <= t]
        want = max(cands)[1] if cands else None
        assert out[i] == want, (i, k, t, cands, out[i])


@SETTINGS
@given(
    left=st.lists(st.tuples(key_strategy, ts_strategy), min_size=1, max_size=12),
    right=st.lists(st.tuples(key_strategy, ts_strategy, st.integers(0, 99)),
                   min_size=0, max_size=12),
)
def test_asof_join_forward_matches_naive_semantics(spark, left, right):
    from data_pipeline_ine_spark.operators.joins import asof_join

    right = list({(k, t): v for k, t, v in right}.items())
    right = [(k, t, v) for (k, t), v in right]
    ldf = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left)], "row_id long, k long, t long"
    )
    rdf = spark.createDataFrame(right, "k long, t long, v long")
    out = {
        r.row_id: r.v_asof
        for r in asof_join(ldf, rdf, on="k", left_ts="t", right_ts="t",
                           payload_cols=("v",), direction="forward").collect()
    }
    for i, (k, t) in enumerate(left):
        cands = [(rt, v) for rk, rt, v in right if rk == k and rt >= t]
        want = min(cands)[1] if cands else None
        assert out[i] == want, (i, k, t, cands, out[i])


@SETTINGS
@given(
    obs=st.lists(
        st.tuples(
            st.integers(1, 3),               # period
            st.integers(1, 3),               # station
            st.sampled_from(["m1", "m2"]),   # dataset
            st.integers(0, 9),               # value
        ),
        min_size=1,
        max_size=15,
    ),
    min_records=st.integers(1, 3),
)
def test_consolidate_fused_min_records_semantics(spark, obs, min_records):
    from data_pipeline_ine_spark.plans.builder import ViewDefinition, consolidate

    df = spark.createDataFrame(obs, "p long, s long, dataset string, value long")
    view = ViewDefinition(name="v", members=("m1", "m2"),
                          period_out="p", station_out="s")
    got = {
        (r.p, r.s): (r.m1, r.m2)
        for r in consolidate(
            df, view, agg_expr="sum", period_col="p", station_col="s",
            value_col="value", min_records=min_records,
        ).collect()
    }
    # reference semantics computed in plain Python
    groups: dict = {}
    for p, s, d, v in obs:
        groups.setdefault((p, s), []).append((d, v))
    want = {}
    for key, rows in groups.items():
        if len(rows) < min_records:
            continue
        m1 = sum(v for d, v in rows if d == "m1")
        m2 = sum(v for d, v in rows if d == "m2")
        want[key] = (
            m1 if any(d == "m1" for d, _ in rows) else None,
            m2 if any(d == "m2" for d, _ in rows) else None,
        )
    assert got == want


@SETTINGS
@given(
    left=st.lists(st.tuples(key_strategy, ts_strategy), min_size=1, max_size=10),
    right=st.lists(st.tuples(key_strategy, ts_strategy), min_size=0, max_size=10),
    window=st.integers(1, 10),
    bin_seconds=st.integers(1, 12),
)
def test_range_join_bin_rewrite_matches_naive(spark, left, right, window, bin_seconds):
    """The bin-explode rewrite must return exactly the rows of the naive
    range predicate for ANY bin width — boundary timestamps included."""
    from data_pipeline_ine_spark.operators.joins import windowed_range_join

    base = "2024-01-01 00:00:"
    ldf = spark.createDataFrame(
        [(i, k, f"{base}{t:02d}") for i, (k, t) in enumerate(left)],
        "lid long, k long, lt string",
    ).withColumn("lt", F.col("lt").cast("timestamp_ntz"))
    rdf = spark.createDataFrame(
        [(j, k, f"{base}{t:02d}") for j, (k, t) in enumerate(right)],
        "rid long, k long, rt string",
    ).withColumn("rt", F.col("rt").cast("timestamp_ntz"))
    got = {
        (r.lid, r.rid)
        for r in windowed_range_join(
            ldf, rdf, on="k", left_ts="lt", right_ts="rt",
            window_seconds=window, bin_seconds=bin_seconds,
        ).collect()
    }
    want = {
        (i, j)
        for i, (lk, lt) in enumerate(left)
        for j, (rk, rt) in enumerate(right)
        if lk == rk and lt - window <= rt < lt
    }
    assert got == want


@SETTINGS
@given(
    words=st.lists(st.text(alphabet="abcxyz019", min_size=1, max_size=6),
                   min_size=1, max_size=8),
    junk=st.sampled_from([" ", "  ", " , ", "!\t", " ... ", "\n\n", " ; "]),
)
def test_rolling_fingerprint_invariant_to_formatting(spark, words, junk):
    from data_pipeline_ine_spark.operators.text import rolling_fingerprint

    clean = " ".join(words)
    messy = junk.join(words) + junk
    df = spark.createDataFrame([(clean, messy)], "a string, b string")
    row = df.select(
        rolling_fingerprint("a").alias("fa"), rolling_fingerprint("b").alias("fb")
    ).first()
    assert row.fa == row.fb


@SETTINGS
@given(
    base=st.dictionaries(key_strategy, st.integers(0, 99), max_size=4),
    changes=st.lists(
        st.tuples(
            key_strategy,
            st.integers(0, 99),
            st.sampled_from(["I", "U", "D"]),
        ),
        max_size=10,
    ),
)
def test_apply_changelog_matches_dict_reference(spark, base, changes):
    """MERGE semantics vs the obvious dict model: replay changes in seq
    order into a dict (D = del), compare the merged snapshot."""
    from data_pipeline_ine_spark.operators.diff import apply_changelog

    ref = dict(base)
    rows = [(k, v, op, i + 1) for i, (k, v, op) in enumerate(changes)]
    # latest seq per key wins — replay in order
    last = {}
    for k, v, op, seq in rows:
        last[k] = (v, op)
    for k, (v, op) in last.items():
        if op == "D":
            ref.pop(k, None)
        else:
            ref[k] = v

    base_df = spark.createDataFrame(
        [(k, v) for k, v in base.items()] or [(None, None)], "k int, v int"
    ).filter(F.col("k").isNotNull())
    ch_df = spark.createDataFrame(
        rows or [(None, None, None, None)], "k int, v int, op string, seq int"
    ).filter(F.col("k").isNotNull())
    got = {
        r.k: r.v
        for r in apply_changelog(base_df, ch_df, ["k"]).collect()
    }
    assert got == ref


@SETTINGS
@given(
    events=st.lists(
        st.tuples(key_strategy, ts_strategy, st.sampled_from(["a", "b", "c"])),
        min_size=1,
        max_size=15,
    ),
)
def test_scd2_matches_run_collapse_reference(spark, events):
    """SCD2 intervals vs a per-key run-collapse model over (ts, id)-sorted
    events (ids disambiguate duplicate timestamps)."""
    import datetime as dt

    from data_pipeline_ine_spark.operators.timeseries import scd2_intervals

    rows = [
        (u, dt.datetime(1970, 1, 1) + dt.timedelta(seconds=t), a, i)
        for i, (u, t, a) in enumerate(events)
    ]
    ref = set()
    by_user: dict = {}
    for u, ts, a, i in sorted(rows, key=lambda r: (r[0], r[1], r[3])):
        by_user.setdefault(u, []).append((ts, a))
    for u, seq in by_user.items():
        runs = []
        for ts, a in seq:
            if not runs or runs[-1][1] != a:
                runs.append([ts, a])
        for j, (start, a) in enumerate(runs):
            end = runs[j + 1][0] if j + 1 < len(runs) else None
            ref.add((u, a, start, end))

    df = spark.createDataFrame(
        rows, "user_id int, ts timestamp_ntz, event_type string, event_id int"
    )
    got = {
        (r.user_id, r.state, r.valid_from, r.valid_to)
        for r in scd2_intervals(df).collect()
    }
    assert got == ref


@SETTINGS
@given(
    events=st.lists(
        st.tuples(key_strategy, ts_strategy, st.sampled_from(["a", "b", "c"])),
        min_size=1,
        max_size=15,
    ),
)
def test_funnel_matches_first_touch_reference(spark, events):
    """Funnel counts vs a per-user first-touch chain model with strict
    ordering (stage i strictly after stage i-1)."""
    import datetime as dt

    from data_pipeline_ine_spark.operators.timeseries import funnel_stages

    stages = ("a", "b", "c")
    by_user: dict = {}
    for u, t, a in events:
        by_user.setdefault(u, []).append((t, a))
    ref_counts = [0, 0, 0]
    for u, evs in by_user.items():
        prev = None
        for i, s in enumerate(stages):
            cand = [t for t, a in evs if a == s and (prev is None or t > prev)]
            if not cand:
                break
            prev = min(cand)
            ref_counts[i] += 1

    rows = [
        (u, dt.datetime(1970, 1, 1) + dt.timedelta(seconds=t), a)
        for u, t, a in events
    ]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp_ntz, event_type string")
    got = {
        r.stage_idx: r.n_users for r in funnel_stages(df, stages=stages).collect()
    }
    assert got == {0: ref_counts[0], 1: ref_counts[1], 2: ref_counts[2]}


@SETTINGS
@given(
    old=st.dictionaries(st.integers(0, 9), st.integers(0, 5), max_size=8),
    new=st.dictionaries(st.integers(0, 9), st.integers(0, 5), max_size=8),
)
def test_changelog_roundtrip_reconstructs_new_snapshot(spark, old, new):
    """apply_changelog(old, changelog_from_diff(old, new)) == new, and the
    feed is diff-sized (unchanged keys emit nothing)."""
    from data_pipeline_ine_spark.operators.diff import (
        apply_changelog,
        changelog_from_diff,
    )

    old_df = spark.createDataFrame(
        [(k, v) for k, v in old.items()] or [(None, None)], "k int, v int"
    ).filter(F.col("k").isNotNull())
    new_df = spark.createDataFrame(
        [(k, v) for k, v in new.items()] or [(None, None)], "k int, v int"
    ).filter(F.col("k").isNotNull())

    feed = changelog_from_diff(old_df, new_df, ["k"]).collect()
    n_expected = sum(
        1
        for k in set(old) | set(new)
        if old.get(k, object()) != new.get(k, object())
    )
    assert len(feed) == n_expected

    feed_df = spark.createDataFrame(
        feed or [(None, None, None, None)], "k int, v int, op string, seq int"
    ).filter(F.col("k").isNotNull())
    got = {
        r.k: r.v for r in apply_changelog(old_df, feed_df, ["k"]).collect()
    }
    assert got == new


@SETTINGS
@given(
    left=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 80), st.integers(-2, 40)),
        min_size=1, max_size=8,
    ),
    right=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 80), st.integers(-2, 40)),
        min_size=0, max_size=8,
    ),
    grid=st.integers(1, 45),
)
def test_interval_overlap_grid_matches_naive(spark, left, right, grid):
    """The grid-bucketed overlap join must return exactly the naive
    overlap-predicate pairs for ANY grid width, each pair exactly once
    (first-common-cell dedup), with end<start intervals dropped."""
    import datetime as dt

    from data_pipeline_ine_spark.operators.joins import interval_overlap_join

    base = dt.date(2024, 1, 1)

    def mk(rows, ids, s, e):
        data = [
            (i, k, base + dt.timedelta(days=a), base + dt.timedelta(days=a + d))
            for i, (k, a, d) in enumerate(rows)
        ]
        return spark.createDataFrame(
            data, f"{ids} long, k long, {s} date, {e} date"
        )

    ldf = mk(left, "lid", "ls", "le")
    rdf = mk(right, "rid", "rs", "re")
    got = [
        (r.lid, r.rid)
        for r in interval_overlap_join(
            ldf, rdf, on="k", left_start="ls", left_end="le",
            right_start="rs", right_end="re", grid_days=grid,
        ).collect()
    ]
    assert len(got) == len(set(got)), "pair emitted more than once"
    want = {
        (i, j)
        for i, (lk, la, ld) in enumerate(left)
        for j, (rk, ra, rd) in enumerate(right)
        if lk == rk and ld >= 0 and rd >= 0
        and la <= ra + rd and ra <= la + ld
    }
    assert set(got) == want


@SETTINGS
@given(
    docs=st.lists(
        st.lists(st.sampled_from("abcdefgh"), min_size=1, max_size=6),
        min_size=2, max_size=12,
    ),
    num=st.integers(1, 9),
    den=st.integers(2, 10),
)
def test_ppjoin_exact_for_any_threshold(spark, docs, num, den):
    """Prefix+length filtering must return EXACTLY the brute-force
    Jaccard >= num/den pairs for ANY rational threshold in (0, 1] and any
    tiny-vocabulary corpus (the adversarial case for prefix buckets)."""
    from data_pipeline_ine_spark.operators.dedup import (
        prefix_filter_jaccard_join,
    )

    if num >= den:
        num = den  # threshold 1.0: only identical sets
    rows = [(i, " ".join(words)) for i, words in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.a_id, r.b_id)
        for r in prefix_filter_jaccard_join(
            df, threshold_num=num, threshold_den=den
        ).collect()
    }
    sets = {i: frozenset(words) for i, words in enumerate(docs)}
    want = {
        (a, b)
        for a in sets
        for b in sets
        if a < b
        and len(sets[a] & sets[b]) * den >= len(sets[a] | sets[b]) * num
    }
    assert got == want


@SETTINGS
@given(
    points=st.lists(
        st.tuples(st.integers(-40, 40), st.integers(-40, 40)),
        min_size=1, max_size=25,
    ),
    sites=st.lists(
        st.tuples(st.integers(-40, 40), st.integers(-40, 40)),
        min_size=1, max_size=10,
    ),
    eps_tenths=st.integers(5, 300),
)
def test_grid_nn_join_matches_naive_for_any_radius(spark, points, sites, eps_tenths):
    """For ANY radius (including eps smaller than coordinate spacing and
    eps spanning many cells) the grid join must return exactly the naive
    in-range nearest site per point, tie-broken by site id — the 3x3
    neighborhood coverage guarantee under hypothesis-chosen geometry."""
    from data_pipeline_ine_spark.operators.layout import grid_nn_join

    eps = eps_tenths / 10.0
    p = spark.createDataFrame(
        [(i, float(x), float(y)) for i, (x, y) in enumerate(points)],
        "point_id long, x double, y double",
    )
    s = spark.createDataFrame(
        [(j, float(x), float(y)) for j, (x, y) in enumerate(sites)],
        "site_id long, x double, y double",
    )
    got = {
        r.point_id: r.site_id for r in grid_nn_join(p, s, eps=eps).collect()
    }
    want = {}
    for i, (px, py) in enumerate(points):
        best = None
        for j, (sx, sy) in enumerate(sites):
            d2 = float(px - sx) ** 2 + float(py - sy) ** 2
            if d2 <= eps * eps and (best is None or (d2, j) < best):
                best = (d2, j)
        if best is not None:
            want[i] = best[1]
    assert got == want


@SETTINGS
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)),
        min_size=1, max_size=40,
    ),
    parts=st.integers(1, 6),
)
def test_skyline_matches_dominance_reference(spark, rows, parts):
    """skyline_2d ≡ the quadratic dominance test for ANY value
    distribution (heavy duplicates included — small integer domains
    force value-group and exact-duplicate collisions) and ANY partition
    count (1 = degenerate single range, 6 > distinct values sometimes)."""
    from data_pipeline_ine_spark.operators.windows import skyline_2d

    df = spark.createDataFrame(
        [(i, float(a), b) for i, (a, b) in enumerate(rows)],
        "id long, price double, size int",
    )
    got = sorted(
        r.id for r in skyline_2d(df, "price", "size", num_partitions=parts).collect()
    )
    want = sorted(
        i
        for i, (a, b) in enumerate(rows)
        if not any(
            (a2 <= a and b2 >= b and (a2 < a or b2 > b))
            for (a2, b2) in rows
        )
    )
    assert got == want


@SETTINGS
@given(
    w=st.integers(1, 12),
    h=st.integers(1, 12),
    c=st.sampled_from([1, 2, 3, 4]),
    seed=st.integers(0, 2**31 - 1),
)
def test_png_roundtrip_any_shape(w, h, c, seed):
    import numpy as np

    from data_pipeline_ine_spark.operators.pixels import png_decode, png_encode

    arr = np.random.RandomState(seed).randint(0, 256, (h, w, c)).astype(np.uint8)
    dec = png_decode(png_encode(arr))
    assert dec is not None and np.array_equal(dec, arr)


@SETTINGS
@given(
    mcs=st.integers(2, 8),
    idx=st.lists(st.integers(0, 255), min_size=1, max_size=400),
)
def test_gif_lzw_roundtrip_any_stream(mcs, idx):
    from data_pipeline_ine_spark.operators.pixels import _lzw_decode, lzw_encode

    idx = [v % (1 << mcs) for v in idx]
    assert _lzw_decode(lzw_encode(idx, mcs), mcs) == idx


@SETTINGS
@given(
    mcs=st.integers(1, 8),
    idx=st.lists(st.integers(0, 255), min_size=0, max_size=300),
    pattern=st.sampled_from(["clear_per_code", "clear_every_3", "none"]),
)
def test_lzw_uncompressed_fast_path_matches_general_loop(mcs, idx, pattern):
    """The vectorized uncompressed-LZW fast path must be BIT-IDENTICAL
    to the general per-code loop on every stream shape: the
    clear-per-code pattern it accepts, clear-every-3 streams it must
    REJECT (table growth → width escalation risk), and clear-free
    streams."""
    from data_pipeline_ine_spark.operators.pixels import (
        _lzw_decode_loop,
        _lzw_decode_uncompressed,
    )

    idx = [v % (1 << mcs) for v in idx]
    clear, eoi, w = 1 << mcs, (1 << mcs) + 1, mcs + 1

    def pack(codes):
        acc = nbits = 0
        stream = bytearray()
        for code in codes:
            acc |= code << nbits
            nbits += w
            while nbits >= 8:
                stream.append(acc & 0xFF)
                acc >>= 8
                nbits -= 8
        if nbits:
            stream.append(acc & 0xFF)
        return bytes(stream)

    codes = []
    for k, p in enumerate(idx):
        if pattern == "clear_per_code" or (
            pattern == "clear_every_3" and k % 3 == 0
        ):
            codes.append(clear)
        codes.append(p)
    codes.append(eoi)
    data = pack(codes)

    # the fast path may only ever return None (defer to the loop) or
    # EXACTLY what the general loop returns
    full = _lzw_decode_loop(data, mcs)
    fast = _lzw_decode_uncompressed(data, mcs)
    assert fast is None or fast == full
    if pattern == "clear_per_code" and mcs >= 2:
        # the target pattern must actually take the fast path
        assert fast == full


@SETTINGS
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 24),
    tw=st.integers(1, 24),
    th=st.integers(1, 24),
    seed=st.integers(0, 2**31 - 1),
)
def test_resize_nearest_matches_index_map(w, h, tw, th, seed):
    import numpy as np

    from data_pipeline_ine_spark.operators.pixels import resize_nearest

    arr = np.random.RandomState(seed).randint(0, 256, (h, w)).astype(np.uint8)
    out = resize_nearest(arr, tw, th)
    assert out.shape == (th, tw)
    for y in range(th):
        for x in range(tw):
            assert out[y, x] == arr[(y * h) // th, (x * w) // tw]


@SETTINGS
@given(
    n_frames=st.integers(1, 6),
    w=st.integers(8, 24),
    h=st.integers(8, 16),
    base=st.integers(28, 220),
)
def test_avi_mjpeg_flat_frames_roundtrip_exact(n_frames, w, h, base):
    """Container + codec property: flat frames at q92 survive the lossy
    JPEG EXACTLY (DC quant step 3 ⇒ error < 0.5 px) through a full AVI
    mux/demux cycle, for any geometry and frame count."""
    import numpy as np

    from data_pipeline_ine_spark.operators.pixels import (
        avi_mjpeg_encode,
        avi_mjpeg_frames,
        jpeg_decode,
    )

    frames = [
        np.full((h, w), (base + 3 * k) % 228 + 28, np.uint8)
        for k in range(n_frames)
    ]
    payloads = avi_mjpeg_frames(avi_mjpeg_encode(frames, quality=92))
    assert payloads is not None and len(payloads) == n_frames
    for k, p in enumerate(payloads):
        dec = jpeg_decode(p)
        assert dec is not None and np.array_equal(dec[:, :, 0], frames[k])


@SETTINGS
@given(
    w=st.integers(1, 40),
    h=st.integers(1, 28),
    val=st.integers(0, 255),
    quality=st.integers(89, 98),
)
def test_jpeg_flat_image_exact_for_any_value_and_high_quality(w, h, val, quality):
    """The exactness argument behind the video_frame_stats oracle,
    property-tested: a flat image has all-zero AC coefficients, and for
    quality >= 89 the DC quantization step is < 8, so the per-pixel
    reconstruction error is < 0.5 and rounds back exactly — for ANY
    dimensions (8-multiple or not) and ANY gray value."""
    import numpy as np

    from data_pipeline_ine_spark.operators.pixels import jpeg_decode, jpeg_encode

    img = np.full((h, w), val, np.uint8)
    dec = jpeg_decode(jpeg_encode(img, quality=quality))
    assert dec is not None and np.array_equal(dec[:, :, 0], img)


@SETTINGS
@given(
    w=st.integers(4, 32),
    h=st.integers(4, 24),
    seed=st.integers(0, 2**31 - 1),
    use_420=st.booleans(),
)
def test_jpeg_noise_roundtrip_error_bounded(w, h, seed, use_420):
    """Quantization-bounded lossy round-trip for arbitrary noise at
    q95, both subsampling modes — the codec never produces wild
    pixels, only bounded quantization error."""
    import numpy as np

    from data_pipeline_ine_spark.operators.pixels import jpeg_decode, jpeg_encode

    img = np.random.RandomState(seed).randint(0, 256, (h, w), np.uint8)
    sub = "420" if use_420 else "444"
    rgb = np.dstack([img, img, img])  # gray content: flat chroma
    dec = jpeg_decode(jpeg_encode(rgb, quality=95, subsampling=sub))
    assert dec is not None and dec.shape == rgb.shape
    assert int(np.abs(dec.astype(int) - rgb.astype(int)).max()) <= 10


@SETTINGS
@given(
    docs=st.lists(
        st.lists(
            st.text(alphabet="abcd", min_size=1, max_size=5),
            min_size=1, max_size=8,
        ),
        min_size=1, max_size=6,
    ),
    n_merges=st.integers(1, 5),
)
def test_bpe_train_matches_dict_reference_any_corpus(spark, docs, n_merges):
    """Distributed BPE ≡ the classic dict-based algorithm for ANY tiny
    corpus (hypothesis explores heavy repetition, single-char words,
    merge chains) — counts, tie-breaks, and early stopping."""
    from collections import Counter

    from data_pipeline_ine_spark.operators.text import bpe_train

    texts = [" ".join(words) for words in docs]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = bpe_train(df, n_merges=n_merges)

    vocab = Counter()
    for t in texts:
        for w in t.lower().split():
            vocab[tuple(w)] += 1
    want = []
    cur = dict(vocab)
    for _ in range(n_merges):
        pairs = Counter()
        for syms, c in cur.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        top_cnt = max(pairs.values())
        if top_cnt < 2:
            break
        a, b = sorted(p for p, c in pairs.items() if c == top_cnt)[0]
        want.append((a, b))
        nxt: dict = {}
        for syms, c in cur.items():
            out = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            nxt[tuple(out)] = nxt.get(tuple(out), 0) + c
        cur = nxt
    assert got == want


@SETTINGS
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 2),                  # block
            st.sampled_from(["p", "q", "r"]),   # field 1
            st.sampled_from(["x", "y"]),        # field 2
        ),
        min_size=2, max_size=14,
    ),
)
def test_record_linkage_matches_fs_reference(spark, rows):
    """record_linkage_scores ≡ a direct Fellegi-Sunter computation for
    ANY small table: same candidate pairs (within-block only), same
    frequency-based u-probabilities, same fixed-order product — the
    hypothesis corpus forces heavy value skew and constant-block
    degenerate cases."""
    import math

    from data_pipeline_ine_spark.operators.fuzzy import record_linkage_scores

    data = [(i, f"b{blk}", f1, f2) for i, (blk, f1, f2) in enumerate(rows)]
    df = spark.createDataFrame(data, "id long, blk string, f1 string, f2 string")
    got = {
        (r.id_a, r.id_b): (r.agree_f1, r.agree_f2, r.score)
        for r in record_linkage_scores(
            df, "id", ["blk"], ["f1", "f2"], top_k=1000
        ).collect()
    }

    n = len(data)
    want = {}
    for fi, field in ((2, "f1"), (3, "f2")):
        counts = {}
        for rec in data:
            counts[rec[fi]] = counts.get(rec[fi], 0) + 1
        s = sum(c * c for c in counts.values())
        u = s / (n * n)
        want[field] = u
    expect = {}
    for i in range(n):
        for j in range(i + 1, n):
            if data[i][1] != data[j][1]:
                continue
            score = 1.0
            flags = []
            for fi, field in ((2, "f1"), (3, "f2")):
                agree = data[i][fi] == data[j][fi]
                flags.append(agree)
                u = want[field]
                score = score * (0.9 / u if agree else (1.0 - 0.9) / (1.0 - u))
            expect[(i, j)] = (flags[0], flags[1], round(score, 6))
    assert set(got) == set(expect)
    for k in expect:
        assert got[k][0] == expect[k][0] and got[k][1] == expect[k][1], k
        assert math.isclose(got[k][2], expect[k][2], rel_tol=1e-9, abs_tol=1e-9), k


@SETTINGS
@given(
    series=st.lists(
        st.tuples(
            key_strategy,
            ts_strategy,
            st.floats(
                min_value=-1e5,
                max_value=1e5,
                allow_nan=False,
                allow_infinity=False,
            ),
        ),
        min_size=1,
        max_size=40,
    ),
    window=st.sampled_from([1, 2, 4, 16]),
)
def test_ewma_matches_python_reference(spark, series, window):
    """ewma_smooth == the direct truncated-recursion reference on
    arbitrary keyed float series, BIT-EXACTLY — the dyadic-weights
    design claims exact IEEE arithmetic, so the comparison is ==, not
    approx. Duplicate timestamps are disambiguated by event_id exactly
    as the operator's sort key does."""
    import math

    from data_pipeline_ine_spark.operators.timeseries import ewma_smooth

    rows = [
        (i, k, f"2024-01-01 00:{t:02d}:00", v)
        for i, (k, t, v) in enumerate(series)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {
        r["event_id"]: r["ewma"]
        for r in ewma_smooth(df, window=window).collect()
    }
    by_key: dict[int, list] = {}
    for i, (k, t, v) in enumerate(series):
        by_key.setdefault(k, []).append((t, i, v))
    want = {}
    for k, evs in by_key.items():
        evs.sort()
        cents = [math.floor(v * 100 + 0.5) for _, _, v in evs]
        for n in range(len(evs)):
            lo = max(0, n - window + 1)
            frame = cents[lo : n + 1]
            m = len(frame)
            acc = 0.0
            for idx, c in enumerate(frame):  # idx 0 = oldest in frame
                j = m - 1 - idx
                w = 2.0 ** -j if idx == 0 else 2.0 ** -(j + 1)
                acc += c * w
            want[evs[n][1]] = acc / 100.0
    assert got == want


@SETTINGS
@given(
    keys=st.lists(
        st.integers(min_value=0, max_value=1_000_000), min_size=1, max_size=60
    ),
    threshold=st.integers(min_value=1, max_value=5),
)
def test_cms_one_sided_error_on_arbitrary_multisets(spark, keys, threshold):
    """CMS law on arbitrary key multisets: estimates never undercount,
    and cms_heavy_hitters reports a SUPERSET of the true heavy set."""
    from collections import Counter

    from data_pipeline_ine_spark.operators.sketches import (
        cms_build,
        cms_estimate,
        cms_heavy_hitters,
    )

    df = spark.createDataFrame([(k,) for k in keys], "user_id long")
    exact = Counter(keys)
    est = {
        r["user_id"]: r["cms_count"]
        for r in cms_estimate(
            cms_build(df, "user_id"), df.select("user_id").distinct(), "user_id"
        ).collect()
    }
    assert set(est) == set(exact)
    for k, c in exact.items():
        assert est[k] >= c
    hh = {
        r["user_id"] for r in cms_heavy_hitters(df, "user_id", threshold).collect()
    }
    assert {k for k, c in exact.items() if c >= threshold} <= hh


@SETTINGS
@given(
    n_rows=st.integers(min_value=2, max_value=50),
    mutate_at=st.integers(min_value=0, max_value=49),
)
def test_bucket_hash_diff_localizes_any_single_mutation(spark, n_rows, mutate_at):
    """For ANY table and any single-row value mutation: exactly one
    bucket mismatches, with equal row counts (the key-hash bucketing
    guarantee)."""
    from data_pipeline_ine_spark.operators.diff import bucket_hash_diff

    mutate_at = mutate_at % n_rows
    left = spark.createDataFrame(
        [(i, f"v{i}") for i in range(n_rows)], "k long, val string"
    )
    right = spark.createDataFrame(
        [
            (i, "MUTATED" if i == mutate_at else f"v{i}")
            for i in range(n_rows)
        ],
        "k long, val string",
    )
    out = bucket_hash_diff(left, right, ["k"], ["val"], n_buckets=8).collect()
    bad = [r for r in out if not r["bucket_match"]]
    assert len(bad) == 1
    assert bad[0]["left_rows"] == bad[0]["right_rows"]


@SETTINGS
@given(
    names=st.lists(
        st.text(alphabet="abcd ", min_size=1, max_size=8),
        min_size=1, max_size=14, unique=True,
    ),
    window=st.integers(min_value=2, max_value=4),
)
def test_snm_matches_sorted_window_reference(spark, names, window):
    """Sorted-neighborhood pairs == the dict reference: sort the
    dictionary, pair each value with its next w-1 neighbors."""
    from data_pipeline_ine_spark.operators.fuzzy import (
        sorted_neighborhood_pairs,
    )

    df = spark.createDataFrame([(n,) for n in names], "name string")
    got = {
        (r["name_a"], r["name_b"])
        for r in sorted_neighborhood_pairs(df, "name", window=window).collect()
    }
    s = sorted(set(names))
    want = {
        (s[i], s[j])
        for i in range(len(s))
        for j in range(i + 1, min(i + window, len(s)))
    }
    assert got == want


@SETTINGS
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 7), st.integers(0, 7)),
        min_size=1, max_size=16,
    ),
)
def test_link_prediction_ra_matches_wedge_reference(spark, edges):
    """RA scores == the dict reference: for every non-adjacent pair,
    sum 10^12 // deg(w) over common neighbors w."""
    from data_pipeline_ine_spark.operators.graph import link_prediction_ra

    es = sorted({(min(a, b), max(a, b)) for a, b in edges if a != b})
    if not es:
        return
    df = spark.createDataFrame(es, "item_a long, item_b long")
    nbrs: dict[int, set[int]] = {}
    for a, b in es:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    want = {}
    nodes = sorted(nbrs)
    for i, u in enumerate(nodes):
        for v in nodes[i + 1:]:
            if v in nbrs[u]:
                continue
            common = nbrs[u] & nbrs[v]
            if common:
                want[(u, v)] = (
                    sum(10**12 // len(nbrs[w]) for w in common), len(common)
                )
    got = {
        (r["item_a"], r["item_b"]): (r["ra_e12"], r["n_common"])
        for r in link_prediction_ra(df, top_k=1000).collect()
    }
    assert got == want


@SETTINGS
@given(
    members=st.lists(st.text(min_size=0, max_size=12), min_size=1,
                     max_size=25, unique=True),
    probes=st.lists(st.text(min_size=0, max_size=12), min_size=1,
                    max_size=10, unique=True),
)
def test_bloom_never_false_negative_any_keys(spark, members, probes):
    """One-sided error as a law: every true member probes positive for
    ANY key set (including empty strings and unicode); non-members may
    false-positive but never crash or miss."""
    from data_pipeline_ine_spark.operators.sketches import (
        bloom_build,
        bloom_probe,
    )

    df = spark.createDataFrame(
        [(i, "g", m) for i, m in enumerate(members)],
        "doc_id long, source string, text string",
    )
    bloom = bloom_build(df, "text")
    flagged = {
        r["doc_id"]
        for r in bloom_probe(df, bloom, key_col="text", id_col="doc_id")
        .collect()
    }
    assert flagged == set(range(len(members)))


@SETTINGS
@given(
    base=st.lists(
        st.tuples(st.integers(0, 9), st.sampled_from("ab"),
                  st.integers(0, 500)),
        min_size=0, max_size=12,
    ),
    changes=st.lists(
        st.tuples(st.integers(0, 9), st.sampled_from("ab"),
                  st.integers(0, 500), st.sampled_from("IUD"),
                  st.integers(1, 5)),
        min_size=1, max_size=12,
    ),
)
def test_ivm_moments_matches_recompute_any_changelog(spark, base, changes):
    """Moment-delta maintenance == recompute over the merged snapshot
    for arbitrary I/U/D changelogs (duplicate keys, conflicting seqs,
    deletes of absent keys)."""
    from data_pipeline_ine_spark.operators.diff import (
        apply_changelog,
        maintain_group_moments,
    )

    base = list({b[0]: b for b in base}.values())  # unique keys
    bdf = spark.createDataFrame(
        [(k, g, v / 4.0) for k, g, v in base] or [(99, "a", 0.0)],
        "k long, g string, v double",
    )
    if not base:
        bdf = bdf.filter("k < 0")
    cdf = spark.createDataFrame(
        [(k, g, v / 4.0, op, sq) for k, g, v, op, sq in changes],
        "k long, g string, v double, op string, seq int",
    )
    got = {
        r.g: (r.n_rows, r.value_sum_exact, r.value_sumsq_exact)
        for r in maintain_group_moments(bdf, cdf, ["k"], "g", "v").collect()
    }
    merged = apply_changelog(bdf, cdf, ["k"], "seq", "op")
    dec = F.col("v").cast("decimal(18,2)")
    want = {
        r.g: (r.n, r.s, r.q)
        for r in merged.groupBy("g")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dec).alias("s"),
            F.sum((dec * dec).cast("decimal(38,4)")).alias("q"),
        )
        .collect()
    }
    assert got == want


@SETTINGS
@given(
    docs=st.lists(
        st.lists(st.sampled_from(["HEAD", "FOOT", "x", "y", "z", "w"]),
                 min_size=1, max_size=5),
        min_size=2, max_size=10,
    ),
)
def test_boilerplate_scrub_matches_reference_and_idempotent(spark, docs):
    """Scrub == the dict reference (segments in > half the docs, >= 2
    docs, removed everywhere), and scrubbing a scrubbed corpus changes
    nothing (idempotence: removal never lifts a survivor over the
    ratio because doc counts are unchanged)."""
    from collections import Counter

    from data_pipeline_ine_spark.operators.text import scrub_boilerplate

    rows = [(i, "s", "\n".join(d)) for i, d in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = scrub_boilerplate(df)
    got = {r["doc_id"]: r["clean_text"] for r in out.collect()}

    df_count = Counter()
    for d in docs:
        for seg in set(d):
            df_count[seg] += 1
    n = len(docs)
    boiler = {s for s, c in df_count.items() if c >= 2 and 2 * c > n}
    want = {
        i: "\n".join(s for s in d if s not in boiler)
        for i, d in enumerate(docs)
    }
    assert got == want

    again = scrub_boilerplate(
        out.select("doc_id", "source", F.col("clean_text").alias("text"))
    )
    got2 = {r["doc_id"]: r["clean_text"] for r in again.collect()}
    assert got2 == got


@SETTINGS
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 3)),
        min_size=1,
        max_size=30,
    ),
)
def test_mode_per_group_matches_counter_reference(spark, rows):
    """mode_per_group == Counter argmax with smallest-value tiebreak,
    on arbitrary grouped data."""
    from collections import Counter

    from data_pipeline_ine_spark.operators.aggregates import mode_per_group

    df = spark.createDataFrame(
        [(g, f"v{v}") for g, v in rows], "g long, v string"
    )
    got = {
        r.g: (r.modal_v, r.n_modal)
        for r in mode_per_group(df, ["g"], "v").collect()
    }
    want = {}
    for g in {g for g, _ in rows}:
        c = Counter(f"v{v}" for gg, v in rows if gg == g)
        best = min(c.items(), key=lambda kv: (-kv[1], kv[0]))
        want[g] = best
    assert got == want


@SETTINGS
@given(
    vals=st.lists(st.integers(-100, 100), min_size=1, max_size=40, unique=True),
    parts=st.integers(1, 5),
)
def test_two_pass_rank_is_a_permutation_rank(spark, vals, parts):
    """two_pass_rank assigns exactly 1..N in sorted order regardless of
    partition count."""
    from data_pipeline_ine_spark.operators.sampling import two_pass_rank

    df = spark.createDataFrame([(v,) for v in vals], "x long").repartition(
        parts
    )
    got = {
        r.x: r.rank
        for r in two_pass_rank(df, ["x"], num_partitions=parts).collect()
    }
    want = {v: i + 1 for i, v in enumerate(sorted(vals))}
    assert got == want


@SETTINGS
@given(
    days=st.lists(
        st.tuples(st.integers(0, 4), st.integers(0, 20)),
        min_size=1,
        max_size=30,
    ),
    w=st.integers(1, 9),
)
def test_rolling_distinct_matches_naive_window(spark, days, w):
    """rolling_distinct_users == the brute-force 'distinct users in
    [d-w+1, d]' for every active day."""
    import datetime

    from data_pipeline_ine_spark.operators.timeseries import (
        rolling_distinct_users,
    )

    base = datetime.datetime(2024, 3, 1)
    df = spark.createDataFrame(
        [(u, base + datetime.timedelta(days=d)) for u, d in days],
        "user_id long, ts timestamp_ntz",
    )
    got = {
        r.day: r[f"users_{w}d"]
        for r in rolling_distinct_users(df, "ts", "user_id", w).collect()
    }
    active = sorted({d for _, d in days})
    for d in active:
        want = len({u for u, dd in days if d - w + 1 <= dd <= d})
        day = (base + datetime.timedelta(days=d)).date()
        assert got[day] == want, (d, w)
    assert len(got) == len(active)


@SETTINGS
@given(
    vals=st.lists(
        st.integers(0, 10_000), min_size=4, max_size=40, unique=True
    ),
)
def test_bootstrap_ci_selects_order_statistics(spark, vals):
    """ci_lo/ci_hi are exactly the 2nd-smallest / 2nd-largest replicate
    values per group."""
    from data_pipeline_ine_spark.operators.sampling import bootstrap_ci

    df = spark.createDataFrame(
        [("g", i, v) for i, v in enumerate(vals)],
        "grp string, replicate int, boot_sum long",
    )
    row = bootstrap_ci(df, "grp").collect()[0]
    s = sorted(vals)
    assert (row.n_replicates, row.ci_lo, row.ci_hi) == (
        len(vals), s[1], s[-2]
    )


@SETTINGS
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 2),      # group
            st.integers(-50, 50),   # order key
            st.one_of(st.none(), st.integers(-9, 9)),  # value (or NULL)
        ),
        min_size=1,
        max_size=30,
    ),
    op=st.sampled_from(["sum", "max"]),
)
def test_two_pass_cumsum_matches_single_window(spark, rows, op):
    """two_pass_cumsum (any partition count, grouped or global, sum or
    max) must be row-identical to the textbook single running window
    over the same total order — including split groups, duplicate
    order keys (co-located by range partitioning), negative values,
    and NULL measures (window SUM/MAX skip NULLs and are NULL only
    when the whole prefix is NULL — ADVICE r7: a row whose local
    range-partition prefix was all-NULL used to lose the prior
    partitions' running sum)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from data_pipeline_ine_spark.operators.sampling import two_pass_cumsum

    df = spark.createDataFrame(
        [(g, k, v, i) for i, (g, k, v) in enumerate(rows)],
        "g long, k long, v long, rid long",
    )
    for groups in ([], ["g"]):
        got = {
            r.rid: r.c
            for r in two_pass_cumsum(
                df, groups, ["k", "rid"], "v", out_col="c",
                num_partitions=4, op=op,
            ).collect()
        }
        w = (
            Window.partitionBy(*groups).orderBy("k", "rid")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        fn = F.max if op == "max" else F.sum
        want = {
            r.rid: r.c
            for r in df.withColumn("c", fn("v").over(w)).collect()
        }
        assert got == want, (groups, op)


@SETTINGS
@given(budgets=st.tuples(st.integers(50, 400), st.integers(401, 2000)))
def test_token_budget_cap_prefix_property(spark, budgets):
    """A bigger budget must yield a SUPERSET of a smaller one (greedy
    prefix of a fixed deterministic order), and every source's kept
    token mass must stay within its budget."""
    from pyspark.sql import functions as F

    from data_pipeline_ine_spark.operators.sampling import token_budget_cap

    lo, hi = budgets
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    toks = docs.withColumn(
        "_tok",
        F.size(
            F.regexp_extract_all(F.lower("text"), F.lit("[a-z0-9]+"), 0)
        ).cast("bigint"),
    )
    small = {r.doc_id for r in token_budget_cap(toks, lo, "_tok").collect()}
    big_rows = token_budget_cap(toks, hi, "_tok").collect()
    big = {r.doc_id for r in big_rows}
    assert small <= big
    mass = {}
    for r in big_rows:
        mass[r.source] = mass.get(r.source, 0) + r.tokens
    assert all(v <= hi for v in mass.values())

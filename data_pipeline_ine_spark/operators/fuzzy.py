"""Fuzzy string matching: blocked edit-distance self-join over a dictionary.

Entity resolution for the label/name columns every pipeline standardizes
(the reference's step 2 canonicalizes dataset names by exact rules,
``steps/step2_standardize_names.py``; this is the operator you need when
the variants are typos rather than known aliases).

The scale discipline is the same as every *-pairs operator in this engine:
never all-pairs on the corpus.

1. Collapse to the DISTINCT value dictionary first — name dictionaries are
   vocabulary-sized (thousands), not corpus-sized (billions), so the
   quadratic stage runs on the small set and row-level joins happen later
   by exact key.
2. Block: candidates must share a cheap key (default: last whitespace
   token). One equi-join shuffle on the block key; bucket size bounds the
   quadratic term. For big dictionaries tighten the block (first char +
   length band, phonetic code, q-gram prefix) — a knob, not a redesign.
3. Prefilter before the expensive verify: ``|len(a) - len(b)| > max_dist``
   already violates the edit-distance lower bound, so it prunes without
   computing Levenshtein.
4. Verify survivors with ``levenshtein`` (JVM codegen; O(|a|·|b|) per
   candidate only).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def last_token(col: Column) -> Column:
    """Default block key: the final whitespace-separated token."""
    return F.element_at(F.split(col, " "), -1)


def fuzzy_match_pairs(
    df: DataFrame,
    text_col: str,
    max_dist: int = 2,
    block_fn=last_token,
) -> DataFrame:
    """Distinct-value pairs of ``text_col`` within edit distance
    ``max_dist``: ``(a_value, b_value, distance)`` with ``a < b``.

    ``block_fn`` maps the text column to its blocking key; recall is exact
    within a block (true Levenshtein verify), bounded across blocks by the
    key's stability under the expected error model (a typo in the last
    token escapes the default block — pick the block to match the errors
    you hunt).
    """
    dic = (
        df.select(F.col(text_col).alias("v"))
        .distinct()
        .select("v", block_fn(F.col("v")).alias("_blk"), F.length("v").alias("_ln"))
    )
    a, b = dic.alias("a"), dic.alias("b")
    return (
        a.join(
            b,
            (F.col("a._blk") == F.col("b._blk"))
            & (F.col("a.v") < F.col("b.v"))
            & (F.abs(F.col("a._ln") - F.col("b._ln")) <= max_dist),
        )
        .withColumn("distance", F.levenshtein(F.col("a.v"), F.col("b.v")))
        .filter(F.col("distance") <= max_dist)
        .select(
            F.col("a.v").alias("a_value"),
            F.col("b.v").alias("b_value"),
            "distance",
        )
    )


def resolve_entities(
    df: DataFrame,
    text_col: str,
    max_dist: int = 2,
    block_fn=last_token,
) -> DataFrame:
    """Entity resolution end-to-end: fuzzy-blocked pair discovery →
    connected components → canonical form. Every distinct value of
    ``text_col`` maps to the lexicographically smallest value in its
    transitive similarity cluster (itself when nothing matches) — the
    classic master-data dedup that turns near-identical spellings into
    one key.

    Scale shape: the quadratic stage is the blocked Levenshtein over the
    DISTINCT-value dictionary (vocabulary-sized, never corpus×corpus —
    see :func:`fuzzy_match_pairs`); clustering runs min-label
    propagation + pointer jumping on the pair graph (O(log diameter)
    rounds over edge-sized frames, ``operators/dedup.py``). Values enter
    the numeric component engine through the full 64-bit ``xxhash64``
    (a 48-bit fold collides at ~0.2% already at 1M distinct values —
    birthday bound — silently merging unrelated clusters; 64 bits pushes
    that to ~3e-8, ADVICE r3); the hash stays internal — the output is
    (value, canonical) strings, so an SQL oracle can reproduce it with a
    string-labeled reachability closure.

    Returns ``(value, canonical)`` for every distinct value.
    """
    from pyspark.sql import Window

    from data_pipeline_ine_spark.operators.dedup import dedup_components

    dic = df.select(F.col(text_col).alias("value")).distinct()
    # The isNotNull guard does double duty: a NULL value must get a NULL
    # id (bare xxhash64 hashes NULL to the seed, which would let NULL
    # join into a real cluster), and the guard keeps the id column
    # NULLABLE — with a non-nullable hash attribute feeding the
    # component loop, InferFiltersFromConstraints dies with an
    # AttributeMap key-not-found while optimizing the iteration plans
    # (observed on Spark 4.1). Eager checkpoint: the dictionary is
    # vocabulary-sized and is reused by the edge join and the output.
    nid = F.when(F.col("value").isNotNull(), F.xxhash64(F.col("value")))
    ids = dic.select("value", nid.alias("nid")).localCheckpoint()
    pairs = fuzzy_match_pairs(df, text_col, max_dist, block_fn)
    edges = (
        pairs.join(
            ids.select(F.col("value").alias("a_value"), F.col("nid").alias("a_id")),
            "a_value",
        )
        .join(
            ids.select(F.col("value").alias("b_value"), F.col("nid").alias("b_id")),
            "b_value",
        )
        .select("a_id", "b_id")
    )
    comp = dedup_components(edges)
    labeled = ids.join(comp, ids["nid"] == comp["doc_id"], "left")
    group = F.coalesce(F.col("component"), F.col("nid"))
    return labeled.select(
        "value",
        F.min("value").over(Window.partitionBy(group)).alias("canonical"),
    )


def record_linkage_scores(
    df: DataFrame,
    id_col: str,
    block_cols: list[str],
    compare_cols: list[str],
    m: float = 0.9,
    top_k: int = 200,
) -> DataFrame:
    """Probabilistic record linkage scoring (Fellegi & Sunter 1969, with
    Winkler's frequency-based u-probabilities): for every candidate pair
    sharing the blocking key, the likelihood-ratio match score

        score = prod over fields f of  (m / u_f)        if f agrees
                                       ((1-m)/(1-u_f))  if f disagrees

    where ``u_f`` — the probability two RANDOM records agree on f — is
    estimated from the field's own value distribution:
    ``u_f = sum_v n_v^2 / N^2``. Skewed fields (a value shared by half
    the table) therefore contribute weak evidence and rare-value
    agreement contributes strong evidence, which is the whole point of
    the FS framework over naive agreement counting. ``m`` (agreement
    probability among true matches) is the standard fixed prior.

    The emitted score is a product of IEEE divisions of exact BIGINT
    counts in a fixed field order — engine-reproducible, no logs (the
    classical log2 "match weight" is monotone in it; take it
    client-side). Returns the ``top_k`` pairs by (score desc, id_a,
    id_b) with per-field agreement flags.

    Scale shape: candidate generation is ONE equi-join on the blocking
    key (sum-of-block^2 pairs, never N^2 — the fuzzy_match_pairs
    discipline); each u_f is a value-cardinality-sized aggregate
    collapsing to ONE row that broadcast-joins back; ranking is
    TakeOrdered, never a global sort materialization. Constant fields
    (u_f = 1) are a caller error — their disagreement factor divides by
    zero, exactly as in the literature.
    """
    from functools import reduce

    n_total = df.agg(F.count(F.lit(1)).alias("_n"))
    stats = n_total
    for f in compare_cols:
        s_f = (
            df.groupBy(f)
            .agg(F.count(F.lit(1)).alias("_c"))
            .agg(F.sum(F.col("_c") * F.col("_c")).alias(f"_s_{f}"))
        )
        stats = stats.crossJoin(s_f)

    keep = [id_col, *block_cols, *compare_cols]
    a = df.select([F.col(c).alias(f"_a_{c}") for c in keep])
    b = df.select([F.col(c).alias(f"_b_{c}") for c in keep])
    pairs = a.join(
        b,
        on=[
            F.col(f"_a_{c}").eqNullSafe(F.col(f"_b_{c}")) for c in block_cols
        ]
        + [F.col(f"_a_{id_col}") < F.col(f"_b_{id_col}")],
    ).crossJoin(F.broadcast(stats))

    factors = []
    agree_flags = []
    for f in compare_cols:
        u = F.col(f"_s_{f}").cast("double") / (F.col("_n") * F.col("_n"))
        agree = F.col(f"_a_{f}").eqNullSafe(F.col(f"_b_{f}"))
        factors.append(
            F.when(agree, F.lit(m) / u).otherwise(
                F.lit(1.0 - m) / (F.lit(1.0) - u)
            )
        )
        agree_flags.append(agree.alias(f"agree_{f}"))
    score = reduce(lambda x, y: x * y, factors)

    return (
        pairs.select(
            F.col(f"_a_{id_col}").alias("id_a"),
            F.col(f"_b_{id_col}").alias("id_b"),
            *agree_flags,
            F.round(score, 6).alias("score"),
        )
        .orderBy(F.desc("score"), "id_a", "id_b")
        .limit(top_k)
    )


def sorted_neighborhood_pairs(
    df: DataFrame,
    value_col: str,
    window: int = 3,
    sort_key: Column | None = None,
    max_dist: int | None = None,
) -> DataFrame:
    """Sorted-neighborhood blocking (Hernández & Stolfo 1995) — the
    classic entity-resolution candidate generator that complements the
    equi-block join in :func:`fuzzy_match_pairs`: sort the value
    dictionary by a key, slide a width-``window`` window, and pair each
    value with its next ``window − 1`` neighbors. Catches typos that
    CHANGE the block key (where equi-blocking structurally misses) as
    long as the sort still lands the variants near each other.

    Output: ``(name_a, name_b, dist, rank_a, rank_b)`` with
    ``rank_b − rank_a < window``; ``dist`` is Levenshtein (JVM codegen),
    optionally capped by ``max_dist``.

    Scale shape: the dictionary is vocabulary-sized; its global sort
    rank uses the two-pass distributed rank (range-repartition + local
    row_number + broadcast prefix-sum offsets — same discipline as
    ``sampling.deterministic_shuffle``), NEVER a one-task global
    window. Candidate pairs come from an offset explode (window − 1
    rows/value) equi-joined on rank — (w−1)·|dict| pairs by
    construction, no quadratic stage anywhere.
    """
    from pyspark.sql import Window

    key = sort_key if sort_key is not None else F.col("value")
    dict_ = (
        df.select(F.col(value_col).alias("value"))
        .filter(F.col("value").isNotNull())
        .distinct()
        .withColumn("_k", key)
    )
    n = df.sparkSession.sparkContext.defaultParallelism
    # two-pass distributed rank over (_k, value); localCheckpoint pins
    # the sampled range boundaries so both branches see one partitioning
    ranged = (
        dict_.repartitionByRange(n, "_k", "value")
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    counts = ranged.groupBy("_pid").agg(F.count(F.lit(1)).alias("_n"))
    offsets = counts.select(
        "_pid",
        F.sum("_n")
        .over(
            Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
        )
        .alias("_off"),
    ).fillna(0, subset=["_off"])
    local = Window.partitionBy("_pid").orderBy("_k", "value")
    ranked = (
        ranged.withColumn("_lr", F.row_number().over(local))
        .join(F.broadcast(offsets), "_pid")
        .select(
            "value", (F.col("_off") + F.col("_lr")).cast("long").alias("rank")
        )
    )
    probe = ranked.select(
        F.col("value").alias("name_a"),
        F.col("rank").alias("rank_a"),
        F.explode(
            F.array(*[F.lit(i) for i in range(1, window)])
        ).alias("_d"),
    ).withColumn("_target", F.col("rank_a") + F.col("_d"))
    out = (
        probe.join(ranked, probe["_target"] == ranked["rank"])
        .select(
            "name_a",
            F.col("value").alias("name_b"),
            F.levenshtein("name_a", "value").alias("dist"),
            "rank_a",
            F.col("rank").alias("rank_b"),
        )
    )
    if max_dist is not None:
        out = out.filter(F.col("dist") <= max_dist)
    return out

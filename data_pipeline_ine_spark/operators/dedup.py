"""Deduplication operators for training-data pipelines: exact (hash-groupBy),
MinHash + LSH banding, and n-gram Jaccard verification.

Design for 100 TB:
- Shingling, MinHash signatures, and LSH band keys are computed with array
  higher-order functions (``transform``/``aggregate``/``slice``) — per-row,
  JVM-side, no shuffle and no Python.
- The only shuffles are (a) the groupBy on band keys (bucket discovery) and
  (b) the candidate-pair self-join, which LSH keeps tiny relative to the
  corpus (only same-bucket pairs are compared).
- Hash family is md5 with a seed prefix: slower than xxhash64 per byte, but
  reproducible in any SQL engine, which makes the whole pipeline
  oracle-verifiable. Swap ``_seeded_hash`` to ``xxhash64`` for max
  throughput when cross-engine verification isn't needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_pipeline_ine_spark.functions.scalars import let_
from data_pipeline_ine_spark.operators.text import TOKEN_PATTERN, fingerprint

DEFAULT_NUM_HASHES = 8
DEFAULT_ROWS_PER_BAND = 2
DEFAULT_SHINGLE_K = 3


def exact_dup_groups(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup via content-fingerprint groupBy: one row per duplicated
    fingerprint with group size and representative (min id) — the survivors
    list is then a broadcast/anti-join away."""
    return (
        df.withColumn("fp", fingerprint(text_col))
        .groupBy("fp")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min(id_col).alias("keep_id"),
        )
        .filter(F.col("n_docs") > 1)
    )


def word_shingles(col: Column | str, k: int = DEFAULT_SHINGLE_K) -> Column:
    """Sliding word k-shingles as an array column. Documents shorter than k
    tokens produce one shingle (the whole text), so every doc has ≥1."""
    t = F.col(col) if isinstance(col, str) else col
    tokens = F.regexp_extract_all(t, F.lit(TOKEN_PATTERN), 0)
    return let_(
        tokens,
        lambda toks: F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(toks) - F.lit(k - 1), F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
        ),
    )


MERSENNE61 = (1 << 61) - 1


def _hex12_to_long(h: Column) -> Column:
    """First 12 hex chars (48 bits) of a hash string as a bigint —
    reproducible in any SQL engine via a base-16 fold."""
    return F.conv(F.substring(h, 1, 12), 16, 10).cast("bigint")


def minhash_signature(
    shingles: Column, num_hashes: int = DEFAULT_NUM_HASHES
) -> Column:
    """MinHash signature via Carter-Wegman universal hashing: per shingle,
    TWO md5-derived 48-bit integers (ha, hb); the j-th hash function is
    ``(ha + j·hb) mod (2^61-1)``. Array of bigints, length ``num_hashes``.

    Two md5s per shingle instead of ``num_hashes`` — hashing dominates
    minhash cost, so the signature is ~4× cheaper at 8 hashes with the same
    collision statistics (pairwise-independent family). Both the shingle
    array and the (ha, hb) pairs are let-bound so each is computed once per
    row — without the binding the hashing inlines into the per-seed lambda
    and re-runs ``num_hashes`` times."""
    seeds = F.sequence(F.lit(0), F.lit(num_hashes - 1))

    def base_hashes(sh: Column) -> Column:
        return F.transform(
            sh,
            lambda s: F.struct(
                _hex12_to_long(F.md5(F.concat(F.lit("a:"), s))).alias("ha"),
                _hex12_to_long(F.md5(F.concat(F.lit("b:"), s))).alias("hb"),
            ),
        )

    return let_(
        shingles,
        lambda sh: let_(
            base_hashes(sh),
            lambda hs: F.transform(
                seeds,
                lambda j: F.array_min(
                    F.transform(hs, lambda h: (h["ha"] + j * h["hb"]) % MERSENNE61)
                ),
            ),
        ),
    )


def lsh_band_keys(
    signature: Column, rows_per_band: int = DEFAULT_ROWS_PER_BAND
) -> Column:
    """Collapse the signature into band keys: hash of each ``rows_per_band``
    slice. Docs sharing any band key are near-dup candidates."""
    return let_(
        signature,
        lambda sig: F.transform(
            F.sequence(F.lit(0), (F.size(sig) / rows_per_band - 1).cast("int")),
            lambda b: F.md5(
                F.concat_ws(
                    "|",
                    F.transform(
                        F.slice(sig, b * rows_per_band + 1, rows_per_band),
                        lambda x: x.cast("string"),
                    ),
                )
            ),
        ),
    )


def minhash_docs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = DEFAULT_SHINGLE_K,
    num_hashes: int = DEFAULT_NUM_HASHES,
    rows_per_band: int = DEFAULT_ROWS_PER_BAND,
) -> DataFrame:
    """Per-doc shingles + signature + band keys (all narrow, no shuffle)."""
    out = df.select(
        id_col, F.col(text_col), word_shingles(text_col, k).alias("shingles")
    )
    out = out.withColumn("signature", minhash_signature(F.col("shingles"), num_hashes))
    return out.withColumn(
        "bands", lsh_band_keys(F.col("signature"), rows_per_band)
    )


def near_dup_buckets(
    df: DataFrame, id_col: str = "doc_id", **minhash_kwargs
) -> DataFrame:
    """LSH buckets with >1 doc: the candidate groups for near-dup removal.

    One shuffle: explode band keys → groupBy (band_idx, band_hash).
    """
    docs = minhash_docs(df, id_col=id_col, **minhash_kwargs)
    exploded = docs.select(
        id_col, F.posexplode("bands").alias("band_idx", "band_hash")
    )
    return (
        exploded.groupBy("band_idx", "band_hash")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min(id_col).alias("min_doc"),
            F.max(id_col).alias("max_doc"),
        )
        .filter(F.col("n_docs") > 1)
    )


_HEX = "0123456789abcdef"


def simhash_hex(col: Column | str, num_bits: int = 64) -> Column:
    """64-bit SimHash of a document as a 16-char hex string.

    Classic Charikar simhash: every token votes +1/-1 on each bit of its own
    64-bit hash (here: first 16 hex chars of md5, so any SQL engine can
    reproduce it); a bit of the fingerprint is 1 iff its vote sum is
    positive. Near-duplicate docs land within a small Hamming distance, so
    downstream LSH is a groupBy on bit-band substrings of this string.

    Entirely Catalyst higher-order functions over the token array — per-row,
    JVM-side, no shuffle, no Python. O(tokens × bits) per row.
    """
    t = F.col(col) if isinstance(col, str) else col
    tokens = F.regexp_extract_all(F.lower(t), F.lit(r"[a-z0-9]+"), 0)
    hashes = F.transform(tokens, lambda tok: F.substring(F.md5(tok), 1, 16))
    nibble_mask = F.array(*[F.lit(m) for m in (8, 4, 2, 1)])

    def bitvec(h: Column) -> Column:
        # decode each hex char to its nibble value ONCE (16 convs), then the
        # 64 bit-votes are element_at + mask tests on the bound array — 4×
        # fewer conv/substring evaluations than decoding per bit
        nibs = F.transform(
            F.sequence(F.lit(0), F.lit(num_bits // 4 - 1)),
            lambda i: F.conv(F.substring(h, i.cast("int") + 1, F.lit(1)), 16, 10)
            .cast("int"),
        )

        def vote(ns: Column, b: Column) -> Column:
            nib = F.element_at(ns, F.floor(b / 4).cast("int") + 1)
            mask = F.element_at(nibble_mask, (b % 4).cast("int") + 1)
            return F.when(nib.bitwiseAND(mask) != 0, 1).otherwise(-1)

        return let_(
            nibs,
            lambda ns: F.transform(
                F.sequence(F.lit(0), F.lit(num_bits - 1)), lambda b: vote(ns, b)
            ),
        )

    def votes_of(hs: Column) -> Column:
        # one pass over the token hashes: each token contributes its ±1 bit
        # vector to a 64-wide running sum (md5 evaluated once per token)
        return F.aggregate(
            hs,
            F.array_repeat(F.lit(0), num_bits),
            lambda acc, h: F.zip_with(acc, bitvec(h), lambda a, v: a + v),
        )

    def hex_of(votes: Column) -> Column:
        bit = lambda i: F.when(  # noqa: E731
            F.element_at(votes, F.lit(i)) > 0, 1
        ).otherwise(0)
        nibbles = [
            F.substring(
                F.lit(_HEX),
                bit(i * 4 + 1) * 8 + bit(i * 4 + 2) * 4 + bit(i * 4 + 3) * 2
                + bit(i * 4 + 4) + 1,
                F.lit(1),
            )
            for i in range(num_bits // 4)
        ]
        return F.concat(*nibbles)

    # let-bind each stage: hashes computed once per row, the vote sums once
    # per row — never re-expanded inside a consumer lambda
    return let_(hashes, lambda hs: let_(votes_of(hs), hex_of))


def simhash_docs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    return df.select(id_col, simhash_hex(text_col).alias("simhash"))


def dedup_components(
    pairs: DataFrame,
    a_col: str = "a_id",
    b_col: str = "b_id",
    max_iters: int = 10,
) -> DataFrame:
    """Connected components over a near-duplicate pair graph → duplicate
    CLUSTERS (transitive closure): the step after LSH pair discovery that
    turns A~B, B~C into one group {A,B,C} with a canonical representative
    (the min id).

    Min-label propagation with pointer jumping: each round every node
    adopts the smallest label among itself and its neighbors (one hop),
    then adopts its label's label (pointer jump — halves the remaining
    label-chain length, the large-star/small-star trick). Neighbor-min
    alone advances one hop per round (O(diameter)); with the jump the
    fixpoint arrives in O(log diameter) rounds, so ``max_iters=10``
    covers diameters into the hundreds. Two shuffles per round; the
    driver-side loop checks a single aggregate per round (O(1) data to
    the driver) and stops at the fixpoint. Labels only ever decrease, so
    a stable label-sum IS the fixpoint; if ``max_iters`` rounds pass
    without reaching it, the labels may still be mid-merge and we raise
    rather than silently return wrong clusters.
    """
    edges = (
        pairs.select(F.col(a_col).alias("s"), F.col(b_col).alias("d"))
        .unionByName(pairs.select(F.col(b_col).alias("s"), F.col(a_col).alias("d")))
        .distinct()
        # materialize once (lazily — it folds into round 1's convergence
        # job) and cut the (possibly very expensive) pair-discovery
        # lineage out of every iteration's plan
        .localCheckpoint(eager=False)
    )
    labels = edges.select(F.col("s").alias("node")).distinct().withColumn(
        "label", F.col("node")
    )
    prev_sum = None
    converged = False
    for _ in range(max_iters):
        msgs = (
            edges.join(labels, edges["d"] == labels["node"])
            .select(F.col("s").alias("node"), "label")
        )
        hop = (
            labels.unionByName(msgs)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
        )
        # pointer jump: label ← label(label). Every label is itself a node
        # (labels start as self-ids and min() preserves membership), and
        # label(label) ≤ label, so the inner product below only shrinks
        # chains — never loses a node (left join guards the root).
        parent = hop.select(
            F.col("node").alias("p_node"), F.col("label").alias("p_label")
        )
        labels = (
            hop.join(parent, hop["label"] == parent["p_node"], "left")
            .select(
                "node",
                F.coalesce("p_label", "label").alias("label"),
            )
            # keep each round's plan flat: without this, iteration N replans
            # (and risks recomputing) all N-1 previous rounds. Lazy: the
            # checkpoint materializes inside this round's convergence-sum
            # job below instead of as its own job (r12 — the per-round
            # job count is the cost at small scale, 3 jobs -> 1)
            .localCheckpoint(eager=False)
        )
        # decimal accumulation: node ids may span the full signed-64 range
        # (resolve_entities feeds xxhash64 ids), where a long SUM can
        # overflow — decimal(38,0) is exact for any realistic node count
        cur = labels.agg(
            F.sum(F.col("label").cast("decimal(38,0)")).alias("s")
        ).first()["s"]
        if cur == prev_sum:
            converged = True
            break
        prev_sum = cur
        # Contract edges through the fresh labels: (s, d) becomes
        # (label(s), label(d)), self-loops drop, duplicates merge. Label
        # values are themselves node ids and each node is connected to its
        # label, so connectivity is preserved while near-dup CLIQUES — the
        # common shape of duplicate families — collapse to single star
        # edges after one round. On dense graphs this shrinks the per-round
        # shuffle geometrically instead of re-shipping the full edge list
        # every iteration; min-label updates keep flowing to original
        # nodes through the pointer jump above.
        s_lab = labels.select(F.col("node").alias("s"), F.col("label").alias("ls"))
        d_lab = labels.select(F.col("node").alias("d"), F.col("label").alias("ld"))
        edges = (
            edges.join(s_lab, "s")
            .join(d_lab, "d")
            .select(F.col("ls").alias("s"), F.col("ld").alias("d"))
            .filter(F.col("s") != F.col("d"))
            .distinct()
            .localCheckpoint(eager=False)
        )
    if not converged:
        raise RuntimeError(
            f"dedup_components did not reach a fixpoint in {max_iters} "
            "iterations — component diameter exceeds the doubling budget; "
            "raise max_iters"
        )
    return labels.select(F.col("node").alias("doc_id"), F.col("label").alias("component"))


def _banded_shingle_pairs(
    df: DataFrame, id_col: str, **minhash_kwargs
) -> DataFrame:
    """LSH candidate pairs with both shingle sets attached:
    ``(a_id, b_id, a_sh, b_sh)`` — the shared recall stage behind the
    Jaccard and containment verifiers.

    Shuffle discipline (the part that decides 100 TB viability): the band
    join and the pair dedupe move IDS ONLY — a doc's shingle array never
    rides the band explode (which would replicate it n_bands×) and never
    reaches the fat-row dropDuplicates (a pair colliding in b bands would
    ship both arrays b times). Arrays attach once per verified pair side,
    via two id-equi-joins after the dedupe. Measured at a 3.1M-pair probe
    corpus: this is the difference between pair-count-bounded and
    pair×bands×doc-size-bounded shuffle volume.
    """
    docs = minhash_docs(df, id_col=id_col, **minhash_kwargs).select(
        id_col, F.array_distinct("shingles").alias("sh"), "bands"
    ).localCheckpoint()  # shingling runs once, not once per join side
    a = docs.select(
        F.col(id_col).alias("a_id"), F.explode("bands").alias("band_hash")
    )
    b = docs.select(
        F.col(id_col).alias("b_id"), F.explode("bands").alias("band_hash")
    )
    cand = (
        a.join(b, "band_hash")
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
        .dropDuplicates(["a_id", "b_id"])
    )
    sh = docs.select(id_col, "sh")
    return cand.join(
        sh.select(F.col(id_col).alias("a_id"), F.col("sh").alias("a_sh")),
        "a_id",
    ).join(
        sh.select(F.col(id_col).alias("b_id"), F.col("sh").alias("b_sh")),
        "b_id",
    )


def jaccard_candidate_pairs(
    df: DataFrame, id_col: str = "doc_id", round_to: int = 6, **minhash_kwargs
) -> DataFrame:
    """Exact n-gram Jaccard for LSH candidate pairs.

    Self-join on band keys produces only same-bucket pairs (a < b), then the
    true Jaccard over distinct shingle sets verifies candidates — the
    classic verify step after the LSH recall stage. Shuffle shape: see
    ``_banded_shingle_pairs``.
    """
    pairs = _banded_shingle_pairs(df, id_col, **minhash_kwargs)
    inter = F.size(F.array_intersect("a_sh", "b_sh"))
    union = F.size(F.array_union("a_sh", "b_sh"))
    return pairs.select(
        "a_id",
        "b_id",
        F.round(inter / F.greatest(union, F.lit(1)), round_to).alias("jaccard"),
    )


def containment_candidate_pairs(
    df: DataFrame, id_col: str = "doc_id", round_to: int = 6, **minhash_kwargs
) -> DataFrame:
    """Asymmetric near-duplicate detection by shingle *containment*:
    ``|A ∩ B| / min(|A|, |B|)`` over the same LSH candidate pairs as
    :func:`jaccard_candidate_pairs`.

    Jaccard misses quote-inclusion: a short document fully embedded in a
    long one has tiny ``|∩| / |∪|`` but containment 1.0 — the standard
    second score every dedup pipeline runs next to Jaccard (boilerplate
    extraction, doc-in-doc, licence-block detection). Normalizing by the
    *smaller* set keeps the score symmetric in (a, b) while still firing
    on one-sided inclusion.

    Returns ``(a_id, b_id, containment)`` with ``a_id < b_id``. Same
    pair-count-bounded shuffle shape as the Jaccard verifier (see
    ``_banded_shingle_pairs``); recall is bounded by the MinHash bands,
    which are Jaccard-tuned — severely size-skewed pairs may need the
    shorter side's shingles indexed separately at production scale.
    """
    pairs = _banded_shingle_pairs(df, id_col, **minhash_kwargs)
    inter = F.size(F.array_intersect("a_sh", "b_sh"))
    smaller = F.least(F.size("a_sh"), F.size("b_sh"))
    return pairs.select(
        "a_id",
        "b_id",
        F.round(inter / F.greatest(smaller, F.lit(1)), round_to).alias(
            "containment"
        ),
    )


SIMHASH_BANDS = 4  # 4 bands × 16 bits over the 64-bit fingerprint


def bands_for_hamming(max_hamming: int) -> int:
    """Smallest band count with *guaranteed* recall at ``max_hamming``.

    Pigeonhole: splitting the 64-bit fingerprint into ``k`` bands, a pair
    differing in at most ``k - 1`` bits must share one intact band — so the
    guarantee needs ``k ≥ max_hamming + 1``, rounded up to a divisor of 16
    (bands are whole hex nibbles).

    Cost curve: ``k`` bands are ``64/k`` bits wide, so expected candidate
    volume scales ~ ``k · n² / 2^(64/k)`` — at k=4 (16-bit bands) blocking
    is effectively sub-quadratic for corpus-scale n, at k=8 (8-bit bands)
    it is marginal, and at k=16 (4-bit bands) it degenerates toward
    all-pairs. Beyond ``max_hamming = 7`` prefer the default 4×16-bit
    blocking and treat recall past Hamming ``SIMHASH_BANDS - 1`` as
    probabilistic (tests/test_dedup.py measures the curve).
    """
    if not 0 <= max_hamming <= 15:
        raise ValueError(
            f"max_hamming={max_hamming}: guaranteed banding needs "
            "0 <= max_hamming <= 15 over a 64-bit fingerprint"
        )
    for k in (1, 2, 4, 8, 16):
        if k > max_hamming:
            return k
    raise AssertionError("unreachable")


def simhash_band_ints(simhash: Column | str, n_bands: int = SIMHASH_BANDS) -> Column:
    """The 64-bit simhash hex split into ``n_bands`` integer band values
    (16 bits each at the default). Band equality is the LSH blocking key:
    by pigeonhole, any pair within Hamming distance ``n_bands - 1`` shares
    at least one exact band."""
    c = F.col(simhash) if isinstance(simhash, str) else simhash
    width = 16 // n_bands
    # let-bind: the simhash expression (a large HOF tree when fed
    # simhash_hex(text) directly) must evaluate once per row, not once per
    # band — the lambda body otherwise inlines it n_bands times
    return let_(
        c,
        lambda h: F.transform(
            F.sequence(F.lit(0), F.lit(n_bands - 1)),
            lambda b: F.conv(
                F.substring(h, (b * width).cast("int") + 1, F.lit(width)), 16, 10
            ).cast("int"),
        ),
    )


def simhash_near_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 8,
    n_bands: int = SIMHASH_BANDS,
) -> DataFrame:
    """Near-duplicate pairs by SimHash: band-blocked candidate generation,
    then an exact Hamming-distance verify — the single-pass alternative to
    MinHash+Jaccard when "similar" means "small edit/permutation distance".

    Scale shape: candidates come ONLY from a self-equi-join on
    ``(band_idx, band_value)`` — one shuffle on the band key, never
    all-pairs. The Hamming verify is integer ``bit_count(xor)`` over the
    4 band ints both sides already carry — no re-hashing, no text columns
    through the shuffle.

    Recall: pigeonhole guarantees every pair with distance < ``n_bands``
    is found; beyond that banding is probabilistic (a pair at distance d
    with all d flips landing in distinct bands is missed). Callers who
    need the hard guarantee at a given ``max_hamming`` should pass
    ``n_bands=bands_for_hamming(max_hamming)`` — and read its docstring
    for the cost curve: the guarantee past Hamming 7 forces ≤8-bit bands,
    which degenerates toward an all-pairs join. The default
    (``max_hamming=8``, 4×16-bit bands) is the standard production
    trade-off: exact to Hamming 3, high-probability to 8, sub-quadratic
    candidates.

    Returns ``(a_id, b_id, hamming)`` with ``a_id < b_id``, one row per
    pair even when several bands collide.
    """
    sim = df.select(
        F.col(id_col),
        simhash_band_ints(simhash_hex(text_col), n_bands).alias("bands"),
    )
    # materialize the signature table once: a self-join evaluates its input
    # subtree once PER SIDE, and Catalyst does not reuse-exchange through a
    # broadcast — without this the O(tokens·bits) simhash pipeline runs
    # twice (measured 2.4× end-to-end). Same pattern (and rationale) as the
    # lineage truncation in dedup_components; at warehouse scale this is
    # the persisted signature table every dedup pipeline keeps anyway.
    sim = sim.localCheckpoint(eager=False)
    cand = sim.select(
        id_col, "bands", F.posexplode("bands").alias("band_idx", "band_val")
    )
    a = cand.alias("a")
    b = cand.alias("b")
    hamming = F.aggregate(
        F.zip_with(
            F.col("a.bands"),
            F.col("b.bands"),
            lambda x, y: F.bit_count(x.bitwiseXOR(y)),
        ),
        F.lit(0),
        lambda acc, d: acc + d,
    )
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("a_id"),
            F.col(f"b.{id_col}").alias("b_id"),
            hamming.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["a_id", "b_id"])
    )


def prefix_filter_jaccard_join(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold_num: int = 3,
    threshold_den: int = 5,
    round_to: int = 6,
    shingle_k: int | None = None,
) -> DataFrame:
    """EXACT set-similarity self-join via prefix filtering (AllPairs/PPJoin
    family — Bayardo et al., WWW'07; Xiao et al., WWW'08).

    Returns every pair with token-set Jaccard >= threshold (given as the
    exact rational ``threshold_num / threshold_den`` so the boundary
    comparison is integer arithmetic, never a float) — 100% recall, unlike
    the MinHash/LSH path (:func:`jaccard_candidate_pairs`), whose recall is
    probabilistic. The standard trade: LSH cost is corpus-shaped but may
    miss pairs; prefix filtering is exact but candidate volume depends on
    token-frequency skew.

    How the filter works: order every document's distinct tokens by a
    single global ordering (ascending document frequency, token string as
    tie-break — rarest first), and keep only each doc's first
    ``n - ceil(t*n) + 1`` tokens (its *prefix*). Any pair with an
    intersection of at least ``ceil(t*n)`` tokens must collide on at least
    one prefix token (pigeonhole), and ``J >= t`` implies exactly that, so
    the prefix equi-join loses nothing; an exact verify then removes false
    candidates.

    Scale shape (100 TB): five key-bounded shuffles, no all-pairs stage —
    (1) token-frequency count (vocabulary-sized output), (2) token join of
    the exploded corpus against the vocabulary, (3) per-doc regroup to
    rebuild ordered arrays, (4) the prefix-token equi-join whose buckets
    are BY CONSTRUCTION the rarest tokens of each doc (the frequency
    ordering exists to keep these buckets small; stopwords never make it
    into a long doc's prefix), (5) the ids-only candidate dedupe. Token
    sets ride only the two final id-equi-joins, once per verified side —
    same array-attachment discipline as ``_banded_shingle_pairs``.
    The candidate stage also applies the exact LENGTH filter (J ≥ t forces
    ``t·|x| ≤ |y| ≤ |x|/t``) as integer inequalities riding the prefix
    join — pairs with incompatible sizes never reach the verify.

    ``shingle_k``: set elements are word tokens by default; pass k to use
    sliding word k-shingles instead. The prefix filter's efficiency rests
    on rare tokens existing — on a corpus with a tiny/uniform vocabulary
    (every word common), word-level prefix buckets degenerate toward
    all-pairs AND the J ≥ t result itself goes quadratic, because sets
    drawn from 31 words genuinely overlap. Shingles restore a
    combinatorial, Zipf-tailed element space, which is why production
    near-dup joins operate on shingles, not bags of words.
    """
    if shingle_k is not None:
        elems = F.array_distinct(word_shingles(text_col, k=shingle_k))
    else:
        elems = F.array_distinct(
            F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_PATTERN), 0)
        )
    toks = (
        df.select(F.col(id_col), elems.alias("ts"))
        .filter(F.size("ts") > 0)
        .localCheckpoint(eager=False)  # tokenization runs once, reused 3x
    )

    tok = toks.select(id_col, F.explode("ts").alias("token"))
    vocab = tok.groupBy("token").agg(F.count(F.lit(1)).alias("tok_df"))
    ordered = (
        tok.join(vocab, "token")
        .groupBy(id_col)
        .agg(
            F.array_sort(F.collect_list(F.struct("tok_df", "token"))).alias("o")
        )
        .select(
            F.col(id_col),
            F.transform("o", lambda s: s["token"]).alias("ordered"),
            F.size("o").alias("n"),
        )
    )
    # prefix length p = n - ceil(t*n) + 1, all-integer:
    # ceil(num*n/den) = (num*n + den - 1) div den
    p = (
        F.col("n")
        - F.expr(
            f"(n * {threshold_num} + {threshold_den - 1}) div {threshold_den}"
        )
        + F.lit(1)
    ).cast("int")
    pref = ordered.select(
        F.col(id_col),
        "n",
        F.explode(F.slice("ordered", F.lit(1), p)).alias("token"),
    )
    # length filter: J >= t implies t·|x| <= |y| <= |x|/t — integer-exact
    compatible = (
        (F.col("a_n") * threshold_num <= F.col("b_n") * threshold_den)
        & (F.col("b_n") * threshold_num <= F.col("a_n") * threshold_den)
    )
    cand = (
        pref.select(
            F.col(id_col).alias("a_id"), F.col("n").alias("a_n"), "token"
        )
        .join(
            pref.select(
                F.col(id_col).alias("b_id"), F.col("n").alias("b_n"), "token"
            ),
            "token",
        )
        .filter((F.col("a_id") < F.col("b_id")) & compatible)
        .select("a_id", "b_id")
        .dropDuplicates(["a_id", "b_id"])
    )
    scored = (
        cand.join(
            toks.select(F.col(id_col).alias("a_id"), F.col("ts").alias("a_ts")),
            "a_id",
        )
        .join(
            toks.select(F.col(id_col).alias("b_id"), F.col("ts").alias("b_ts")),
            "b_id",
        )
        .select(
            "a_id",
            "b_id",
            F.size(F.array_intersect("a_ts", "b_ts")).alias("inter"),
            F.size(F.array_union("a_ts", "b_ts")).alias("uni"),
        )
    )
    return scored.filter(
        F.col("inter") * threshold_den >= F.col("uni") * threshold_num
    ).select(
        "a_id",
        "b_id",
        F.round(F.col("inter") / F.col("uni"), round_to).alias("jaccard"),
    )


def incremental_near_dup_filter(
    new_df: DataFrame,
    corpus_df: DataFrame,
    id_col: str = "doc_id",
    threshold_num: int = 1,
    threshold_den: int = 2,
    **minhash_kwargs,
) -> DataFrame:
    """Incremental ingestion dedup: drop new documents that are near-dups
    (exact Jaccard ≥ ``threshold_num/threshold_den`` over shingle sets) of
    ANY existing corpus document; survivors pass through unchanged.

    This is the filter a continuously-fed corpus runs every batch — the
    batch×corpus analog of the self-join dedup stack, and the reason the
    LSH stage matters: candidates come from a band-key equi-join of the
    (small) new batch against the (huge) corpus index, so cost is
    batch-driven. The corpus side's banded signature table is exactly what
    ``minhash_docs`` computes once and persists at production scale —
    re-banding 100 TB per batch would dwarf the batch itself; here both
    sides are derived inline so the oracle can check end-to-end.

    Shuffle shape: ids-only through the band join and the candidate
    dedupe; shingle arrays attach once per verified pair side (the
    ``_banded_shingle_pairs`` discipline); the final keep-set applies as a
    LEFT ANTI join on the batch, never touching corpus payloads.
    """
    new_b = minhash_docs(new_df, id_col=id_col, **minhash_kwargs).select(
        id_col, F.array_distinct("shingles").alias("sh"), "bands"
    ).localCheckpoint(eager=False)
    corp_b = minhash_docs(corpus_df, id_col=id_col, **minhash_kwargs).select(
        id_col, F.array_distinct("shingles").alias("sh"), "bands"
    ).localCheckpoint(eager=False)
    a = new_b.select(
        F.col(id_col).alias("new_id"), F.explode("bands").alias("band_hash")
    )
    c = corp_b.select(
        F.col(id_col).alias("corp_id"), F.explode("bands").alias("band_hash")
    )
    cand = (
        a.join(c, "band_hash")
        .select("new_id", "corp_id")
        .dropDuplicates(["new_id", "corp_id"])
    )
    pairs = cand.join(
        new_b.select(F.col(id_col).alias("new_id"), F.col("sh").alias("n_sh")),
        "new_id",
    ).join(
        corp_b.select(F.col(id_col).alias("corp_id"), F.col("sh").alias("c_sh")),
        "corp_id",
    )
    dup_ids = (
        pairs.filter(
            F.size(F.array_intersect("n_sh", "c_sh")) * threshold_den
            >= F.size(F.array_union("n_sh", "c_sh")) * threshold_num
        )
        .select(F.col("new_id").alias(id_col))
        .distinct()
    )
    return new_df.join(dup_ids, id_col, "left_anti")


def near_dup_filter_self(
    df: DataFrame,
    id_col: str = "doc_id",
    threshold_num: int = 1,
    threshold_den: int = 2,
    **minhash_kwargs,
) -> DataFrame:
    """Self-corpus near-dup filter with the EARLIER-ID-WINS rule: drop
    every document that has ANY lower-id LSH candidate whose exact
    shingle Jaccard ≥ ``threshold_num/threshold_den`` (integer
    cross-multiply — no float threshold for engines to disagree on).
    The self-join twin of ``incremental_near_dup_filter`` and the same
    drop discipline as ``similarity.semantic_dedup``, so the two stages
    compose into one curation pass with consistent semantics. Like
    SemDeDup's greedy pass it may over-drop across a dropped justifier —
    the conservative direction. Survivors pass through unchanged.

    Scale shape: inherits ``_banded_shingle_pairs``'s ids-only band join
    (pair-count-bounded shuffle); the keep-set applies as ONE left-anti
    join on the corpus.
    """
    pairs = _banded_shingle_pairs(df, id_col, **minhash_kwargs)
    dup_ids = (
        pairs.filter(
            F.size(F.array_intersect("a_sh", "b_sh")) * threshold_den
            >= F.size(F.array_union("a_sh", "b_sh")) * threshold_num
        )
        .select(F.col("b_id").alias(id_col))
        .distinct()
    )
    return df.join(dup_ids, id_col, "left_anti")


def near_dup_survivors(
    df: DataFrame,
    quality_col: str,
    id_col: str = "doc_id",
    threshold_num: int = 1,
    threshold_den: int = 2,
    **minhash_kwargs,
) -> DataFrame:
    """Quality-aware NEAR-dup deduplication: collapse each transitive
    near-dup cluster (exact Jaccard >= threshold over shingles, LSH
    candidates, connected components) to its HIGHEST-QUALITY member —
    ties broken by min id. The cluster-level twin of the exact-hash
    ``dedup_survivors`` pattern, and what a curation pipeline actually
    wants: when five scrapes of one article survive near-dup detection,
    keep the cleanest copy, not the lowest doc id.

    Returns the surviving rows of ``df`` unchanged, plus
    ``group_size`` (1 for docs in no cluster) for downstream weighting.

    Recall follows the banding config exactly as in the rest of the
    LSH stack: pass ``rows_per_band``/``num_hashes`` to trade candidate
    volume against miss probability ``(1 - J^r)^b``.

    Scale shape: inherits the banded candidate discipline
    (ids-only through the band join, pair-bounded verify), components
    in O(log diameter) rounds on the edge list, then ONE
    component-keyed window over cluster members only — never the
    corpus. Non-clustered docs bypass every shuffle except the
    broadcast anti-join membership probe.
    """
    from pyspark.sql import Window

    pairs = jaccard_candidate_pairs(df, id_col=id_col, **minhash_kwargs).filter(
        F.col("jaccard") * threshold_den >= F.lit(threshold_num)
    )
    comp = dedup_components(pairs).select(
        F.col("doc_id").alias(id_col), "component"
    )
    members = df.join(F.broadcast(comp), id_col)
    w = Window.partitionBy("component").orderBy(
        F.desc(quality_col), F.asc(id_col)
    )
    kept_clustered = (
        members.withColumn("_rn", F.row_number().over(w))
        .withColumn(
            "group_size",
            F.count(F.lit(1)).over(Window.partitionBy("component")),
        )
        .filter(F.col("_rn") == 1)
        .drop("_rn", "component")
    )
    untouched = df.join(
        F.broadcast(comp.select(id_col)), id_col, "left_anti"
    ).withColumn("group_size", F.lit(1).cast("bigint"))
    return untouched.unionByName(kept_clustered)


def dup_weighted_docs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Duplication-aware loss weights: every doc keeps its row, tagged
    with its exact-duplicate family size and ``weight_e6 = 10^6 / size``
    (integer fixed-point, truncating division — non-negative, so Spark
    ``div`` and DuckDB ``//`` agree).

    The soft alternative to hard dedup used by several pretraining
    recipes: instead of dropping copies, down-weight each so a document
    duplicated n times contributes ~one document of gradient signal.
    Cluster identity is the same normalized-text fingerprint as
    ``exact_dup_groups`` (engine-invariant md5).

    Scale shape: ONE fingerprint groupBy (count per family) + one
    fp-keyed join back — both shuffles on the same key, and AQE
    coalesces the tiny family-count side; never a self-join.
    """
    from data_pipeline_ine_spark.operators.text import fingerprint

    fp = df.withColumn("fp", fingerprint(text_col))
    sizes = fp.groupBy("fp").agg(F.count(F.lit(1)).alias("n_copies"))
    return fp.join(sizes, "fp").select(
        id_col,
        "n_copies",
        F.expr("CAST(1000000 AS BIGINT) div n_copies").alias("weight_e6"),
    )


def split_leakage(
    docs: DataFrame,
    split_col: str = "split",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    **minhash_kwargs,
) -> DataFrame:
    """Train/val/test contamination audit: near-duplicate pairs that
    CROSS split boundaries — the leakage every eval pipeline must prove
    absent before trusting held-out numbers (a val doc near-duplicating
    a train doc inflates the score without generalization).

    Input must carry ``split_col`` (e.g. from ``sampling.split_assign``).
    Returns one row per ordered split pair ``(split_a, split_b,
    n_pairs)`` with ``split_a <= split_b``: the diagonal rows are
    benign in-split duplication, every off-diagonal row is leakage.

    Scale shape: the pair generation is the banded-LSH candidate path
    (never all-pairs); splits attach via two id-keyed joins against the
    (id, split) projection — at 100 TB, the same cost class as the
    dedup sweep the pipeline already runs.
    """
    pairs = jaccard_candidate_pairs(docs, id_col=id_col, **minhash_kwargs)
    pairs = pairs.filter(F.col("jaccard") >= F.lit(threshold))
    s = docs.select(F.col(id_col), F.col(split_col))
    tagged = (
        pairs.join(
            s.select(
                F.col(id_col).alias("a_id"),
                F.col(split_col).alias("_sa"),
            ),
            "a_id",
        )
        .join(
            s.select(
                F.col(id_col).alias("b_id"),
                F.col(split_col).alias("_sb"),
            ),
            "b_id",
        )
        .select(
            F.least("_sa", "_sb").alias("split_a"),
            F.greatest("_sa", "_sb").alias("split_b"),
        )
    )
    return tagged.groupBy("split_a", "split_b").agg(
        F.count(F.lit(1)).alias("n_pairs")
    )


def lsh_recall_curve(
    df: DataFrame,
    band_configs: "Sequence[int]" = (2, 4, 8),
    tau: float = 0.5,
    num_hashes: int = DEFAULT_NUM_HASHES,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Recall of MinHash-LSH banding against exact Jaccard ground truth,
    per band count — the third leg of the measure-don't-guess trio
    (pq_recall_curve prices quantization, ivf_recall_curve the probe
    budget, this one the banding threshold): more bands with fewer rows
    each catches lower-similarity pairs at the cost of more candidate
    verification, and this curve says exactly what each config catches
    at ``tau``.

    Ground truth never goes quadratic: any pair with Jaccard > 0 shares
    a shingle, so truth = shared-shingle equi-join pairs filtered by
    EXACT Jaccard ≥ tau over distinct shingle sets (the jaccard_pairs
    recipe, rounded to 6 before the threshold). Candidates per config
    come from band-key equi-joins over the SAME 8-hash signature sliced
    into b bands of 8/b rows. All counts are BIGINTs; recall is one
    fixed double divide.

    Scale shape: shingle explode + two families of key equi-joins —
    Σ bucket², never corpus². Run on a sample at 100 TB (the harness
    takes whatever df you hand it); output is |band_configs| rows.
    """
    from data_pipeline_ine_spark.functions.scalars import let_

    base = df.select(
        F.col(id_col),
        F.array_distinct(word_shingles(F.col(text_col))).alias("_sh"),
        minhash_signature(word_shingles(F.col(text_col)), num_hashes).alias(
            "_sig"
        ),
    ).localCheckpoint()
    ex = base.select(F.col(id_col), F.explode("_sh").alias("_s"))
    truth_cand = (
        ex.alias("a")
        .join(
            ex.alias("b"),
            (F.col("a._s") == F.col("b._s"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("a_id"),
            F.col(f"b.{id_col}").alias("b_id"),
        )
        .distinct()
    )
    sets = base.select(F.col(id_col), "_sh")
    jac = (
        truth_cand.join(
            sets.select(F.col(id_col).alias("a_id"), F.col("_sh").alias("_sa")),
            "a_id",
        )
        .join(
            sets.select(F.col(id_col).alias("b_id"), F.col("_sh").alias("_sb")),
            "b_id",
        )
        .select(
            "a_id",
            "b_id",
            F.round(
                F.size(F.array_intersect("_sa", "_sb")).cast("double")
                / F.greatest(
                    F.size(F.array_union("_sa", "_sb")), F.lit(1)
                ).cast("double"),
                6,
            ).alias("_j"),
        )
    )
    truth = jac.filter(F.col("_j") >= tau).select("a_id", "b_id").localCheckpoint()
    parts = []
    for n_bands in band_configs:
        rows_per_band = num_hashes // n_bands
        keys = base.select(
            F.col(id_col),
            F.explode(lsh_band_keys(F.col("_sig"), rows_per_band)).alias(
                "_k"
            ),
        )
        cand = (
            keys.alias("a")
            .join(
                keys.alias("b"),
                (F.col("a._k") == F.col("b._k"))
                & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
            )
            .select(
                F.col(f"a.{id_col}").alias("a_id"),
                F.col(f"b.{id_col}").alias("b_id"),
            )
            .distinct()
        )
        stats = cand.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_candidates")
        ).crossJoin(
            cand.join(truth, ["a_id", "b_id"], "left_semi").agg(
                F.count(F.lit(1)).cast("bigint").alias("hits")
            )
        ).crossJoin(
            truth.agg(F.count(F.lit(1)).cast("bigint").alias("n_true"))
        )
        parts.append(
            stats.select(
                F.lit(int(n_bands)).cast("bigint").alias("n_bands"),
                "n_true",
                "n_candidates",
                "hits",
                F.round(
                    F.col("hits").cast("double")
                    / F.greatest(F.col("n_true"), F.lit(1)).cast("double"),
                    6,
                ).alias("recall"),
            )
        )
    out = parts[0]
    for part in parts[1:]:
        out = out.unionByName(part)
    return out.orderBy("n_bands")

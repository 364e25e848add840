"""Text-analysis operators for large-scale training-data pipelines.

Beyond-reference capability set (the reference pipeline has no text ops):
language-ID, quality scoring, token counting, and document fingerprinting
over a ``documents(doc_id, text, ...)`` table.

All expressions are JVM-side Catalyst built-ins (``regexp_count``/``md5``/
arithmetic) — zero Python UDFs, so they run inside whole-stage codegen and
scale linearly with input splits. Patterns stick to the regex subset shared
by Java regex and RE2 (no lookahead/backrefs) so an external SQL oracle can
verify results byte-for-byte.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_pipeline_ine_spark.functions.lineage import cut

TOKEN_PATTERN = r"\S+"
ALPHA_PATTERN = r"[A-Za-z]+"
PUNCT_PATTERN = r"[.,;:!?]"

# GPT-2-style pretokenizer, minus the lookahead (unsupported in RE2):
# contraction suffixes, letter runs, digit runs, punctuation runs, whitespace.
BPE_PATTERN = r"'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+"

# Per-language stopword markers for the n-gram/stopword language-ID
# heuristic. Word-boundary counts; precedence (en>es>de>fr>zh) breaks ties
# deterministically.
LANG_MARKERS: dict[str, str] = {
    "en": r"\b(the|and|of|to|in|is|that|it)\b",
    "es": r"\b(el|la|los|las|que|y|en|un|una)\b",
    "de": r"\b(der|die|das|und|nicht|ist|ein|zu)\b",
    "fr": r"\b(le|les|des|et|un|une|est|dans)\b",
    "zh": r"[一-鿿]",
}


def token_count(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(TOKEN_PATTERN))


def bpe_token_count(col: Column | str) -> Column:
    """BPE-ish subword-unit count — a cheap, deterministic proxy for LLM
    token budgeting at corpus scale."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(BPE_PATTERN))


def text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document surface statistics: chars, tokens, alpha words,
    punctuation, average token length."""
    t = F.col(text_col)
    n_tokens = token_count(t)
    return df.withColumns(
        {
            "n_chars_calc": F.length(t),
            "n_tokens": n_tokens,
            "n_alpha_words": F.regexp_count(t, F.lit(ALPHA_PATTERN)),
            "n_punct": F.regexp_count(t, F.lit(PUNCT_PATTERN)),
            "avg_token_len": F.round(
                F.length(F.regexp_replace(t, r"\s+", ""))
                / F.greatest(n_tokens, F.lit(1)),
                6,
            ),
        }
    )


def normalize_text(col: Column | str) -> Column:
    """Curation-stage text normalization — the cleanup pass every
    pretraining corpus runs before fingerprinting/dedup (a C4/CCNet
    staple), as ONE chain of JVM-side regexp/translate expressions:

    - strip C0/C1 control characters (keep tab and newline),
    - drop zero-width and BOM code points (ZWSP/ZWNJ/ZWJ/FEFF),
    - fold typographic quotes/dashes/ellipsis/NBSP to ASCII,
    - collapse runs of whitespace to one space and trim.

    Deterministic by construction (pure string rewriting, no floats,
    no locale: explicit code-point classes only — NOT a full NFKC,
    which neither engine exposes as a built-in). The same rewrite
    chain is expressible in DuckDB for oracle parity.
    """
    c = F.col(col) if isinstance(col, str) else col
    # typographic folds first (multi-char ellipsis before 1:1 translate)
    c = F.regexp_replace(c, "\u2026", "...")
    c = F.translate(
        c,
        "\u2018\u2019\u201c\u201d\u2013\u2014\u00a0",
        "''\"\"-- ",
    )
    # zero-width + BOM out entirely
    c = F.regexp_replace(c, "[\u200b\u200c\u200d\ufeff]", "")
    # C0/C1 control chars except tab/newline
    c = F.regexp_replace(
        c, "[\u0000-\u0008\u000b-\u001f\u007f-\u009f]", ""
    )
    # whitespace collapse + trim
    c = F.regexp_replace(c, "\\s+", " ")
    return F.trim(c)


def quality_score(col: Column | str) -> Column:
    """Composite document-quality heuristic in [0, 1]: length saturation,
    punctuation sanity, stopword density. Mirrors the shape of C4/Gopher
    quality filters; weights are fixed so results are reproducible."""
    t = F.col(col) if isinstance(col, str) else col
    n_tokens = token_count(t)
    n_punct = F.regexp_count(t, F.lit(PUNCT_PATTERN))
    n_stop = F.regexp_count(F.lower(t), F.lit(LANG_MARKERS["en"]))
    denom = F.greatest(n_tokens, F.lit(1)).cast("double")
    length_part = F.least(n_tokens.cast("double") / F.lit(50.0), F.lit(1.0))
    punct_part = F.lit(1.0) - F.least(
        n_punct.cast("double") / denom, F.lit(1.0)
    )
    stop_part = F.least(n_stop.cast("double") * F.lit(3.0) / denom, F.lit(1.0))
    return F.round(
        F.lit(0.4) * length_part + F.lit(0.3) * punct_part + F.lit(0.3) * stop_part,
        6,
    )


def language_scores(col: Column | str) -> dict[str, Column]:
    """Marker-hit count per candidate language."""
    t = F.lower(F.col(col) if isinstance(col, str) else col)
    return {
        lang: F.regexp_count(t, F.lit(pat)) for lang, pat in LANG_MARKERS.items()
    }


def language_id(col: Column | str) -> Column:
    """Argmax language guess with deterministic precedence on ties
    (en > es > de > fr > zh); 'und' when no marker hits."""
    scores = language_scores(col)
    best = F.greatest(*scores.values())
    expr = F.lit("und")
    # build CASE from lowest precedence up so earlier langs win ties
    for lang in reversed(list(LANG_MARKERS)):
        expr = F.when((scores[lang] > 0) & (scores[lang] == best), lang).otherwise(
            expr
        )
    return expr


ROLLING_BASE = 31
ROLLING_MOD = 1_000_000_007


def rolling_fingerprint(col: Column | str, k: int = 8) -> Column:
    """Winnowing-style document fingerprint: the minimum polynomial rolling
    hash over all character ``k``-grams of the normalized text.

    Normalization (lowercase, collapse non-alphanumerics to single spaces)
    makes the fingerprint robust to formatting/punctuation edits, and
    min-over-k-grams makes it robust to content reordering — the standard
    local-fingerprint trick (Schleimer et al., winnowing) reduced to one
    hash per doc. Pure integer arithmetic (base 31, mod 1e9+7, left fold)
    so any SQL engine reproduces it bit-for-bit; all Catalyst higher-order
    functions, no shuffle, no Python.
    """
    from data_pipeline_ine_spark.functions.scalars import let_

    t = F.col(col) if isinstance(col, str) else col
    norm = F.trim(F.regexp_replace(F.lower(t), r"[^a-z0-9]+", " "))
    # guarantee >= k chars so every gram is full width (NB: rpad alone would
    # TRUNCATE texts longer than k — pad only the short ones)
    padded = F.when(F.length(norm) < k, F.rpad(norm, k, " ")).otherwise(norm)

    def min_gram_hash(s: Column) -> Column:
        # s is a let-bound lambda variable: the regex normalization ran once;
        # every per-gram/per-char reference below is a memory read
        starts = F.sequence(F.lit(1), F.length(s) - F.lit(k - 1))
        gram_hash = lambda i: F.aggregate(  # noqa: E731
            F.sequence(F.lit(0), F.lit(k - 1)),
            F.lit(0).cast("bigint"),
            lambda acc, j: (
                acc * ROLLING_BASE + F.ascii(F.substring(s, (i + j).cast("int"), F.lit(1)))
            )
            % ROLLING_MOD,
        )
        return F.array_min(F.transform(starts, gram_hash))

    return let_(padded, min_gram_hash)


def fingerprint(col: Column | str) -> Column:
    """Whitespace-normalized, case-folded content fingerprint (md5 hex).

    The canonical key for exact dedup: identical cleaned content → identical
    fingerprint, and the md5 is computed engine-side so an external oracle
    reproduces it exactly."""
    t = F.col(col) if isinstance(col, str) else col
    return F.md5(F.lower(F.regexp_replace(F.trim(t), r"\s+", " ")))


WORD_PATTERN = r"[a-z0-9]+"

# RE2-safe PII patterns (no lookaround/backrefs) so a SQL oracle can
# reproduce the redaction byte-for-byte.
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
LONG_NUMBER_PATTERN = r"[0-9]{7,}"


def repetition_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document lexical-repetition signals: type-token ratio and
    distinct-bigram ratio — the cheap filters that catch boilerplate and
    degenerate (looping) text in pretraining corpora (cf. Gopher's
    repetition rules).

    All higher-order array functions over one tokenization (let-bound so
    the regex runs once per row, not once per bigram): zero shuffles,
    embarrassingly parallel.
    """
    from data_pipeline_ine_spark.functions.scalars import let_

    t = F.lower(F.col(text_col))
    tokens = F.regexp_extract_all(t, F.lit(WORD_PATTERN), 0)

    def stats(toks: Column) -> Column:
        n = F.size(toks)
        bigrams = F.transform(
            F.sequence(F.lit(1), F.greatest(n - F.lit(1), F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(toks, i, 2)),
        )
        return F.struct(
            n.alias("n_words"),
            F.size(F.array_distinct(toks)).alias("n_distinct_words"),
            F.round(
                F.size(F.array_distinct(toks)) / F.greatest(n, F.lit(1)), 6
            ).alias("type_token_ratio"),
            F.round(
                F.size(F.array_distinct(bigrams))
                / F.greatest(n - F.lit(1), F.lit(1)),
                6,
            ).alias("distinct_bigram_ratio"),
        )

    # stage through a struct column: `_rs` is referenced 4× below, so
    # CollapseProject keeps the projection barrier and the tokenization
    # runs once per row instead of once per output column
    staged = df.withColumn("_rs", let_(tokens, stats))
    return staged.select(
        "doc_id",
        "source",
        F.col("_rs.n_words").alias("n_words"),
        F.col("_rs.n_distinct_words").alias("n_distinct_words"),
        F.col("_rs.type_token_ratio").alias("type_token_ratio"),
        F.col("_rs.distinct_bigram_ratio").alias("distinct_bigram_ratio"),
    )


def redact_pii(col: Column | str) -> Column:
    """Mask emails and long digit runs — the narrow, auditable core of a
    PII scrub pass. Order matters: emails first (their local parts may
    contain digit runs), then standalone long numbers."""
    t = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(
        F.regexp_replace(t, EMAIL_PATTERN, "<EMAIL>"),
        LONG_NUMBER_PATTERN,
        "<NUM>",
    )


def pii_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document PII hit counts plus the redacted length — what a scrub
    stage reports before dropping/masking documents. Map-side only."""
    t = F.col(text_col)
    return df.withColumns(
        {
            "n_emails": F.regexp_count(t, F.lit(EMAIL_PATTERN)),
            "n_long_numbers": F.regexp_count(
                F.regexp_replace(t, EMAIL_PATTERN, "<EMAIL>"),
                F.lit(LONG_NUMBER_PATTERN),
            ),
            "redacted_len": F.length(redact_pii(t)),
        }
    )


def contamination_overlap(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Benchmark decontamination: for every corpus document, how many of
    its distinct word ``k``-gram shingles also appear in the (small)
    benchmark set — the n-gram-overlap test every serious pretraining
    pipeline runs against its eval suites before training.

    Scale shape: the benchmark side is eval-suite-sized (thousands of
    docs), so its distinct shingle set broadcasts; the corpus side is a
    narrow explode → broadcast-hash semi-join → one groupBy(doc_id)
    shuffle. Nothing is quadratic and the corpus is never collected.
    Shingles are compared via the 48-bit md5 fold (engine-invariant,
    8 bytes on the wire instead of the shingle string).
    """
    from .dedup import _hex12_to_long, word_shingles

    bench_set = (
        benchmark.select(
            F.explode(F.array_distinct(word_shingles(text_col, k))).alias("sh")
        )
        .select(_hex12_to_long(F.md5(F.col("sh"))).alias("sh_hash"))
        .distinct()
    )
    # single corpus pass: the distinct-shingle count rides the explode as a
    # per-row constant, so the (full-corpus-sized) shingle pipeline is never
    # evaluated down two plan branches
    corpus_sh = (
        corpus.select(
            F.col("doc_id"),
            F.array_distinct(word_shingles(text_col, k)).alias("shs"),
        )
        .select(
            "doc_id",
            F.size("shs").alias("n_shingles"),
            F.explode("shs").alias("sh"),
        )
        .select(
            "doc_id", "n_shingles", _hex12_to_long(F.md5(F.col("sh"))).alias("sh_hash")
        )
    )
    return (
        corpus_sh.join(F.broadcast(bench_set), "sh_hash")
        .groupBy("doc_id", "n_shingles")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .select(
            "doc_id",
            "n_shared",
            "n_shingles",
            F.round(F.col("n_shared") / F.col("n_shingles"), 6).alias(
                "contamination"
            ),
        )
    )


def tfidf_top_terms(
    df: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    strata_col: str = "source",
) -> DataFrame:
    """Top-``k`` characteristic terms per source by a tf-idf-style score —
    the "what is this domain about" summary a corpus audit produces.

    idf uses the *rational* smoothing ``(N + 1) / (df + 1)`` instead of the
    textbook logarithm: integer-derived double division is bit-identical
    across engines, whereas two libm ``ln`` implementations may differ in
    the last ulp and flip a ranking tie. Same ordering properties (strictly
    decreasing in df), auditable externally.

    Scale shape: tokenization is a narrow explode; the per-(source, term)
    and per-term aggregates shuffle vocabulary-sized data (bounded, not
    corpus-sized); the final ranking windows over the vocab×sources grid.
    """
    toks = df.select(
        F.col(id_col),
        F.col(strata_col),
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(WORD_PATTERN), 0)
        ).alias("term"),
    )
    tf = toks.groupBy(strata_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    docfreq = toks.groupBy("term").agg(
        F.countDistinct(id_col).alias("docfreq")
    )
    n_docs = df.select(F.countDistinct(id_col).alias("n_docs"))
    from pyspark.sql import Window

    w = Window.partitionBy(strata_col).orderBy(
        F.desc("score"), F.asc("term")
    )
    return (
        tf.join(docfreq, "term")
        .join(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.round(
                F.col("tf")
                * ((F.col("n_docs") + 1).cast("double") / (F.col("docfreq") + 1)),
                6,
            ),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(strata_col, "term", "score", "rank")
    )


def chunk_documents(
    df: DataFrame,
    chunk_chars: int = 200,
    overlap: int = 20,
    text_col: str = "text",
    keep_cols: tuple[str, ...] = ("doc_id", "source"),
) -> DataFrame:
    """Split documents into fixed-size overlapping chunks (context-window
    packing's upstream step: long docs must become model-sized pieces, with
    overlap so no span is ever cut mid-context at a chunk edge).

    Chunk ``i`` covers ``[i·stride, i·stride + chunk_chars)`` with
    ``stride = chunk_chars − overlap``; the count is
    ``ceil(max(len − overlap, 1) / stride)``, so every character lands in
    ≥1 chunk and the final chunk is never shorter than ``overlap + 1``
    characters (except whole-doc chunks). Pure narrow explode — one output
    row per chunk inside the scan stage, no shuffle at any corpus size;
    fan-out is bounded by doc length / stride, not corpus size.
    """
    if not 0 <= overlap < chunk_chars:
        raise ValueError(f"need 0 <= overlap < chunk_chars: {overlap}, {chunk_chars}")
    stride = chunk_chars - overlap
    text = F.col(text_col)
    n_chunks = F.ceil(
        F.greatest(F.length(text) - overlap, F.lit(1)) / F.lit(float(stride))
    ).cast("int")
    exploded = df.select(
        *keep_cols,
        text,
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id"),
    )
    start = F.col("chunk_id") * stride + 1
    chunk = text.substr(start, F.lit(chunk_chars))
    return exploded.select(
        *keep_cols,
        "chunk_id",
        chunk.alias("chunk_text"),
        F.length(chunk).alias("chunk_len"),
    )


def unigram_logloss(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document unigram language-model log-loss — the classic LM
    quality filter (CCNet-style: score each document under a corpus LM and
    gate on the tail) with the LM trained on the corpus itself in the same
    job. Add-one smoothing, ``p(t) = (c(t)+1) / (N+V)``, score =
    token-weighted mean of ``-ln p(t)``: gibberish and boilerplate land in
    the high-loss tail, prototypical text scores low.

    Returns ``(id_col, n_tokens, sum_neg_logp_e12, avg_neg_logp)`` —
    ``sum_neg_logp_e12`` is the EXACT integer Σ cnt·floor(-ln p·1e12+0.5)
    (the order-invariant fixed-point accumulator itself, bit-identical
    across engines; per-doc magnitude ≲ n_tokens·4e13 so it fits a
    BIGINT far beyond any real document length), ``avg_neg_logp`` the
    human-facing 6-decimal score derived from it. Documents with no
    tokens keep NULL scores (explicitly distinguishable from "scored
    cheap").

    Scale shape: corpus → per-doc term frequencies (one doc-keyed shuffle
    of doc×distinct-term rows, already combined map-side); vocabulary
    counts are a vocab-sized aggregate; the tf⋈vocab join is broadcast
    while the vocab fits (here) and a term-keyed shuffle join beyond —
    either way nothing corpus-sized is re-shuffled.

    Determinism: a double ``SUM`` accumulates in partition order, so two
    engines can disagree in the last ulp and land on opposite sides of the
    final round (observed once at sf0.1). Each term's ``-ln p`` is
    therefore snapped to exact 12-decimal fixed point *before* summation —
    ``floor(x*1e12 + 0.5)`` uses only IEEE multiply/add/floor, so the
    integer contribution is bit-identical across engines — and the sum
    accumulates in ``decimal(38,0)``, which is order-invariant.
    """
    toks = df.select(
        F.col(id_col),
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(WORD_PATTERN), 0)
        ).alias("term"),
    )
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("cnt"))
    vocab = toks.groupBy("term").agg(F.count(F.lit(1)).alias("c"))
    totals = vocab.agg(
        F.sum("c").alias("n_total"), F.count(F.lit(1)).alias("v_size")
    )
    neglogp = -F.log(
        (F.col("c") + 1).cast("double") / (F.col("n_total") + F.col("v_size"))
    )
    # exact 12-decimal fixed-point per-term contribution (see docstring)
    scaled = F.floor(neglogp * F.lit(1e12) + F.lit(0.5))
    sum_scaled = F.sum((F.col("cnt") * scaled).cast("decimal(38,0)"))
    scored = (
        tf.join(F.broadcast(vocab), "term")
        .join(F.broadcast(totals))
        .groupBy(id_col)
        .agg(
            F.sum("cnt").alias("n_tokens"),
            # exact integer accumulator first; the rounded double score is
            # DERIVED from it so the only float op left is one deterministic
            # IEEE divide + round on identical integer inputs
            sum_scaled.cast("long").alias("sum_neg_logp_e12"),
            F.round(
                sum_scaled.cast("double") / F.lit(1e12) / F.sum("cnt"), 6
            ).alias("avg_neg_logp"),
        )
    )
    return df.select(id_col).join(scored, id_col, "left").select(
        id_col,
        F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
        "sum_neg_logp_e12",
        "avg_neg_logp",
    )


def dsir_llr(
    df: DataFrame,
    target_pred: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    tokens_col: str | None = None,
) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling", reduced to its
    deterministic core): score every document by the log-likelihood
    RATIO of a TARGET-cohort unigram LM over the raw-corpus LM —
    ``llr = Σ_t cnt(t)·(−ln p_raw(t) − (−ln p_tgt(t)))`` — positive
    means "more target-like than the corpus average", the ranking a
    domain-transfer data-selection pass samples from. ``target_pred``
    is a boolean Column marking the target cohort (e.g. a trusted
    source, a quality-gated subset).

    Smoothing shares ONE vocabulary constant: ``p_cohort(t) =
    (c_cohort(t)+1) / (N_cohort + V_corpus)`` with ``V_corpus`` the
    full-corpus distinct-term count — every corpus term has nonzero
    probability under BOTH LMs (the paper's hashed features solve OOV
    the same way: a shared finite feature space).

    Returns ``(id_col, n_tokens, llr_e12, avg_llr)`` — ``llr_e12`` the
    exact integer Σ cnt·(snap12(−ln p_raw) − snap12(−ln p_tgt))
    (unigram_logloss's engine-exact fixed-point recipe: per-term snap
    via IEEE-only ops, order-invariant DECIMAL accumulation), and
    ``avg_llr`` the 6-decimal per-token score derived from it. Docs
    with no tokens keep NULL scores. Identity: target = whole corpus
    ⇒ llr_e12 = 0 for every document (pinned in tests).

    Scale shape: identical to unigram_logloss — one doc-keyed shuffle
    of doc×distinct-term rows, a vocab-sized aggregate (now carrying
    both cohort counts in the SAME pass), broadcast joins while the
    vocab fits. The target flag rides the token explode, so the two
    LMs train in one job, not two.
    """
    toks = df.select(
        F.col(id_col),
        target_pred.cast("boolean").alias("_tgt"),
        F.explode(
            F.col(tokens_col)
            if tokens_col is not None
            else F.regexp_extract_all(
                F.lower(F.col(text_col)), F.lit(WORD_PATTERN), 0
            )
        ).alias("term"),
    )
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("cnt"))
    vocab = toks.groupBy("term").agg(
        F.count(F.lit(1)).alias("c_all"),
        F.sum(F.when(F.col("_tgt"), 1).otherwise(0)).alias("c_tgt"),
    )
    totals = vocab.agg(
        F.sum("c_all").alias("n_all"),
        F.sum("c_tgt").alias("n_tgt"),
        F.count(F.lit(1)).alias("v_size"),
    )

    def snap12(c: Column, n: Column) -> Column:
        neglogp = -F.log((c + 1).cast("double") / (n + F.col("v_size")))
        return F.floor(neglogp * F.lit(1e12) + F.lit(0.5))

    llr_term = snap12(F.col("c_all"), F.col("n_all")) - snap12(
        F.col("c_tgt"), F.col("n_tgt")
    )
    sum_llr = F.sum((F.col("cnt") * llr_term).cast("decimal(38,0)"))
    scored = (
        tf.join(F.broadcast(vocab), "term")
        .join(F.broadcast(totals))
        .groupBy(id_col)
        .agg(
            F.sum("cnt").alias("n_tokens"),
            sum_llr.cast("long").alias("llr_e12"),
            F.round(
                sum_llr.cast("double") / F.lit(1e12) / F.sum("cnt"), 6
            ).alias("avg_llr"),
        )
    )
    return df.select(id_col).join(scored, id_col, "left").select(
        id_col,
        F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
        "llr_e12",
        "avg_llr",
    )


def perplexity_buckets(
    df: DataFrame,
    n_buckets: int = 3,
    labels: tuple[str, ...] = ("head", "middle", "tail"),
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): score
    every document under the corpus-trained unigram LM
    (``unigram_logloss``'s engine-exact integer accumulator), rank by
    per-token loss, and split the ranking into ``n_buckets`` equal-count
    tiers — ``head`` (most prototypical) / ``middle`` / ``tail`` (the
    gibberish end a curation pass drops or down-samples).

    Everything that decides a bucket is integer arithmetic:
    ``score_e12 = sum_neg_logp_e12 div n_tokens`` (exact fixed-point
    per-token loss, truncating division on non-negative operands),
    global rank via the distributed two-pass rank (bit-identical to a
    single window, never a one-task sort), bucket index
    ``((rank-1)·n_buckets) div n``. Zero-token documents can't be
    scored and land in an explicit ``unscored`` bucket rather than
    polluting the tail.

    Returns ``(id_col, n_tokens, score_e12, ppl_bucket)``.

    Scale shape: unigram_logloss's one doc-keyed shuffle + vocab-sized
    aggregate, then two_pass_rank's range-repartition (the only added
    shuffle) and a 1-row count broadcast — no corpus-sized collect, no
    global window.
    """
    if len(labels) != n_buckets:
        raise ValueError(f"need {n_buckets} labels, got {labels!r}")
    from data_pipeline_ine_spark.operators.sampling import two_pass_rank

    # lazy checkpoint: the scored frame feeds THREE branches (the rank,
    # the 1-row count broadcast, the unscored union) — without it each
    # branch re-runs the whole tokenize/LM lineage (the bm25 pattern)
    scored = unigram_logloss(df, text_col=text_col, id_col=id_col)
    scored = cut(scored)
    s = scored.filter(F.col("n_tokens") > 0).select(
        id_col,
        "n_tokens",
        F.expr("sum_neg_logp_e12 div n_tokens").alias("score_e12"),
    )
    n = s.agg(F.count(F.lit(1)).alias("_n"))
    ranked = two_pass_rank(s, ["score_e12", id_col], out_col="_rk")
    idx = F.expr(f"((_rk - 1) * {int(n_buckets)}) div _n")
    label = F.lit(labels[0])
    for i in range(1, n_buckets):
        label = F.when(idx >= i, F.lit(labels[i])).otherwise(label)
    bucketed = (
        ranked.crossJoin(F.broadcast(n))
        .select(id_col, "n_tokens", "score_e12", label.alias("ppl_bucket"))
    )
    unscored = scored.filter(F.col("n_tokens") == 0).select(
        id_col,
        "n_tokens",
        F.lit(None).cast("long").alias("score_e12"),
        F.lit("unscored").alias("ppl_bucket"),
    )
    return bucketed.unionByName(unscored)


def dsir_select(
    df: DataFrame,
    target_pred: Column,
    budget_tokens: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    tokens_col: str | None = None,
) -> DataFrame:
    """Execute the selection DSIR's weights exist for: rank the corpus
    most-target-like-first by the exact integer log-likelihood ratio
    (``dsir_llr``) and keep the greedy prefix until the token budget is
    hit — the deterministic, engine-invariant reduction of importance
    RESAMPLING to importance RANKING (top-p of the weight order is what
    production selection jobs actually run; sampled variants differ
    only by the tie-shuffle).

    The running token total is the DISTRIBUTED two-pass cumulative sum
    over the order ``(−llr_e12, id)`` — never a one-task window — and
    the keep test is the integer ``cum_tokens ≤ budget``. Re-running
    with a bigger budget yields a SUPERSET (prefix property), exactly
    like ``token_budget_cap``. Zero-token docs can't pay tokens and are
    excluded.

    Returns kept rows ``(id_col, n_tokens, llr_e12, cum_tokens)``.
    Staged for a round-10 contract row (oracle = ORACLE_DSIR composed
    with a running-sum window).
    """
    from data_pipeline_ine_spark.operators.sampling import two_pass_cumsum

    scored = dsir_llr(
        df, target_pred, text_col=text_col, id_col=id_col,
        tokens_col=tokens_col,
    )
    s = scored.filter(F.col("n_tokens") > 0).select(
        id_col,
        "n_tokens",
        "llr_e12",
        (-F.col("llr_e12")).alias("_negllr"),
    )
    run = two_pass_cumsum(
        s, [], ["_negllr", id_col], "n_tokens", out_col="cum_tokens"
    )
    return (
        run.filter(F.col("cum_tokens") <= budget_tokens)
        .select(
            id_col,
            "n_tokens",
            "llr_e12",
            F.col("cum_tokens").cast("bigint").alias("cum_tokens"),
        )
    )


def bigram_logloss(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document bigram language-model log-loss — one order of context
    above :func:`unigram_logloss`: ``p(w2|w1) = (c(w1,w2)+1) /
    (c(w1,·)+V)`` with add-one smoothing, trained on the corpus itself.
    Catches word-salad documents whose unigram distribution looks normal
    but whose transitions don't (the shuffled-text failure mode the
    unigram gate is blind to).

    Returns ``(id_col, n_bigrams, sum_neg_logp_e12, avg_neg_logp)`` —
    the same exact-integer contract surface as the unigram gate (12-dec
    fixed-point per bigram, order-invariant DECIMAL(38,0) accumulation,
    BIGINT-safe per-doc magnitude); documents with <2 tokens keep NULL
    scores.

    Scale shape: adjacent-pair construction is a lag window over ONE
    doc-keyed shuffle (position comes free from posexplode); the bigram
    LM table is vocabulary²-bounded and joins by (w1,w2) key — a
    term-keyed shuffle join, NOT a broadcast, because bigram tables at
    corpus scale outgrow executors; the context-count table is
    vocab-sized and broadcasts.
    """
    from pyspark.sql import Window

    toks = df.select(
        F.col(id_col),
        F.posexplode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(WORD_PATTERN), 0)
        ).alias("pos", "term"),
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    big = toks.select(
        F.col(id_col),
        F.lag("term").over(w).alias("w1"),
        F.col("term").alias("w2"),
    ).filter(F.col("w1").isNotNull())
    # ONE execution of the tokenize+lag-window chain (r13): bg and ctx
    # are pure rollups of the per-doc counts — SUM(cnt) over docs is
    # definitionally the corpus pair/context count the separate
    # ``big.groupBy`` aggregates recomputed, and each of those consumers
    # re-ran the whole window subtree as its own broadcast-build job
    # (measured: 15 broadcast-subtree jobs per invocation, 13 s-core)
    tf = cut(
        big.groupBy(id_col, "w1", "w2").agg(F.count(F.lit(1)).alias("cnt"))
    )
    bg = tf.groupBy("w1", "w2").agg(F.sum("cnt").alias("c12"))
    ctx = tf.groupBy("w1").agg(F.sum("cnt").alias("c1"))
    vocab = toks.agg(F.countDistinct("term").alias("v_size"))
    neglogp = -F.log(
        (F.col("c12") + 1).cast("double") / (F.col("c1") + F.col("v_size"))
    )
    scaled = F.floor(neglogp * F.lit(1e12) + F.lit(0.5))
    sum_scaled = F.sum((F.col("cnt") * scaled).cast("decimal(38,0)"))
    scored = (
        tf.join(bg, ["w1", "w2"])
        .join(F.broadcast(ctx), "w1")
        .join(F.broadcast(vocab))
        .groupBy(id_col)
        .agg(
            F.sum("cnt").alias("n_bigrams"),
            sum_scaled.cast("long").alias("sum_neg_logp_e12"),
            F.round(
                sum_scaled.cast("double") / F.lit(1e12) / F.sum("cnt"), 6
            ).alias("avg_neg_logp"),
        )
    )
    return df.select(id_col).join(scored, id_col, "left").select(
        id_col,
        F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
        "sum_neg_logp_e12",
        "avg_neg_logp",
    )


def inverted_index(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_terms: int = 50,
    max_postings: int = 1000,
) -> DataFrame:
    """Posting lists for the corpus's ``top_terms`` highest-document-
    frequency terms: ``(term, df, postings)`` with ``postings`` the
    sorted (ascending, capped at ``max_postings``) doc-id list — the
    retrieval-side index build that pairs with :func:`bm25_scores`'s
    scoring side.

    Scale shape: the hazard in index building is the head of the Zipf
    curve — a stopword's posting list is most of the corpus, so a naive
    ``collect_list`` per term funnels corpus-sized arrays through single
    reducers. Here the cap is applied BEFORE aggregation: a row_number
    window partitioned by term (one term-keyed shuffle, sorted within
    the partition) keeps only each term's first ``max_postings`` doc
    ids, so no reducer ever materializes more than the cap. Term
    selection is TakeOrdered over the vocabulary-sized df frame.
    """
    from pyspark.sql import Window

    toks = df.select(
        F.col(id_col),
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(WORD_PATTERN), 0)
        ).alias("term"),
    ).distinct()
    dfreq = toks.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    top = dfreq.orderBy(F.desc("df"), F.asc("term")).limit(top_terms)
    w = Window.partitionBy("term").orderBy(F.col(id_col).asc())
    capped = (
        toks.join(F.broadcast(top.select("term")), "term")
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= max_postings)
    )
    return (
        capped.groupBy("term")
        .agg(F.sort_array(F.collect_list(id_col)).alias("postings"))
        .join(F.broadcast(top), "term")
        .select("term", "df", "postings")
    )


def bm25_scores(
    df: DataFrame,
    query_terms: Sequence[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 relevance of every document for a fixed query term set —
    the classic retrieval scorer (idf-weighted, saturating tf, length-
    normalized), used in data pipelines to mine training examples relevant
    to a topic without an embedding model.

    ``score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·|d|/avgdl))``
    with ``idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5))``.

    Scale shape: the query term set is a small literal, so per-term tf
    PIVOTS into wide columns of ONE doc-keyed aggregate over a single
    tokenize pass — no per-(doc, term) frame, no separate doclen branch
    re-running the regex. Document frequencies and (N, avgdl) collapse
    into one 1-row aggregate over that frame, which BROADCASTS back; the
    corpus is shuffled exactly once, on ``id_col``. Per-term contributions
    are snapped to exact 12-decimal fixed point before the (query-sized)
    sum (the ``unigram_logloss`` determinism recipe), so the rounded score
    is engine-invariant.

    Returns ``(id_col, bm25)`` for every input row; documents matching no
    query term score 0.0.
    """
    terms = [t.lower() for t in query_terms]
    toks = df.select(
        F.col(id_col),
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(WORD_PATTERN), 0)
        ).alias("term"),
    )
    per_doc = toks.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("dl"),
        *[
            F.count(F.when(F.col("term") == t, 1)).alias(f"tf_{i}")
            for i, t in enumerate(terms)
        ],
    )
    # both the scores and the 1-row (avgdl, df_i) frame read per_doc; pin it
    # so the tokenize+aggregate subtree runs once, not once per consumer
    # (same reuse rationale as the simhash signature table)
    per_doc = cut(per_doc)
    glob = df.agg(F.count(F.lit(1)).alias("n_docs")).crossJoin(
        per_doc.agg(
            F.sum("dl").alias("len_total"),
            F.count(F.lit(1)).alias("len_n"),
            *[
                F.count(F.when(F.col(f"tf_{i}") > 0, 1)).alias(f"df_{i}")
                for i in range(len(terms))
            ],
        )
    )
    avgdl = F.col("len_total") / F.col("len_n")

    def contrib(i: int):
        tf = F.col(f"tf_{i}")
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col(f"df_{i}") + F.lit(0.5))
            / (F.col(f"df_{i}") + F.lit(0.5))
        )
        denom = tf + F.lit(k1) * (
            F.lit(1.0 - b) + F.lit(b) * F.col("dl") / avgdl
        )
        # exact 12-decimal fixed point per term (see unigram_logloss):
        # bit-identical across engines, then an exact small-integer sum.
        # Association is pinned to ((idf * (tf*(k1+1))) / denom) and the
        # oracle computes the IDENTICAL order — a different grouping
        # (e.g. idf * (num/denom)) can differ in the last ulp and flip
        # the fixed-point snap at a boundary (ADVICE r3).
        fixed = F.floor(
            (idf * (tf * F.lit(1.0 + k1))) / denom * F.lit(1e12) + F.lit(0.5)
        ).cast("decimal(38,0)")
        return F.when(tf > 0, fixed).otherwise(F.lit(0).cast("decimal(38,0)"))

    total = contrib(0)
    for i in range(1, len(terms)):
        total = total + contrib(i)
    scored = per_doc.join(F.broadcast(glob)).select(
        id_col, F.round(total.cast("double") / F.lit(1e12), 6).alias("bm25")
    )
    return (
        df.select(id_col)
        .join(scored, id_col, "left")
        .select(id_col, F.coalesce("bm25", F.lit(0.0)).alias("bm25"))
    )


def source_kl_divergence(
    df: DataFrame,
    text_col: str = "text",
    strata_col: str = "source",
    round_to: int = 6,
) -> DataFrame:
    """Pairwise KL divergence between per-source unigram distributions —
    the corpus-governance statistic that quantifies how differently two
    ingestion sources are written (domain shift, contamination by a
    shared upstream, template dominance).

    Distributions use add-one smoothing over the JOINT vocabulary, so
    both directions are finite:
    ``p_s(t) = (c_s(t)+1) / (T_s + V)``; output rows are unordered source
    pairs with both ``KL(a‖b)`` and ``KL(b‖a)``.

    Determinism follows the unigram_logloss recipe exactly: each term's
    contribution ``p·ln(p/q)`` is snapped to 12-decimal fixed point with
    IEEE mul/add/floor only, then accumulated in DECIMAL(38,0) — the sum
    is partial-aggregation-order invariant and engine-exact.

    Scale shape: one (source, term)-keyed count shuffle over the corpus;
    everything after is vocabulary-sized — the sources×vocab grid, the
    term-keyed pair join, and a |sources|²-row output. Broadcast of the
    per-source totals and vocab size keeps the grid build join-free on
    the corpus side.
    """
    toks = df.select(
        F.col(strata_col).alias("src"),
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(WORD_PATTERN), 0)
        ).alias("term"),
    )
    counts = toks.groupBy("src", "term").agg(F.count(F.lit(1)).alias("c"))
    totals = counts.groupBy("src").agg(F.sum("c").alias("t"))
    vocab = counts.select("term").distinct()
    vsize = vocab.agg(F.count(F.lit(1)).alias("v"))
    grid = (
        totals.crossJoin(vocab)
        .crossJoin(F.broadcast(vsize))
        .join(counts, ["src", "term"], "left")
        .select(
            "src",
            "term",
            (
                (F.coalesce(F.col("c"), F.lit(0)) + 1).cast("double")
                / (F.col("t") + F.col("v"))
            ).alias("p"),
        )
    )
    a = grid.select(
        F.col("src").alias("source_a"), "term", F.col("p").alias("pa")
    )
    b = grid.select(
        F.col("src").alias("source_b"), "term", F.col("p").alias("pb")
    )
    pairs = a.join(b, "term").filter(F.col("source_a") < F.col("source_b"))
    kl_ab = F.floor(
        (F.col("pa") * F.log(F.col("pa") / F.col("pb"))) * F.lit(1e12)
        + F.lit(0.5)
    )
    kl_ba = F.floor(
        (F.col("pb") * F.log(F.col("pb") / F.col("pa"))) * F.lit(1e12)
        + F.lit(0.5)
    )
    return (
        pairs.groupBy("source_a", "source_b")
        .agg(
            F.sum(kl_ab.cast("decimal(38,0)")).alias("_sab"),
            F.sum(kl_ba.cast("decimal(38,0)")).alias("_sba"),
        )
        .select(
            "source_a",
            "source_b",
            F.round(F.col("_sab").cast("double") / 1e12, round_to).alias("kl_ab"),
            F.round(F.col("_sba").cast("double") / 1e12, round_to).alias("kl_ba"),
        )
    )


def pmi_collocations(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 3,
    top_k: int = 100,
) -> DataFrame:
    """Collocation (phrase) mining: the ``top_k`` adjacent-word bigrams
    ranked by pointwise-mutual-information lift — how much more often
    ``w1 w2`` occurs than its words' positional frequencies predict.
    The corpus-analysis primitive behind phrase vocabularies ("new
    york", "machine learning") for tokenizer and n-gram LM curation.

    ``lift = n_ab * N / (n_a * n_b)`` where ``n_ab`` counts the bigram,
    ``n_a`` counts bigrams with ``w1`` on the left, ``n_b`` with ``w2``
    on the right, ``N`` all bigrams. PMI itself is ``log2(lift)`` —
    deliberately NOT emitted: all four counts are exact BIGINTs, one
    IEEE division of exact integers is engine-reproducible, while
    transcendental ``log`` is libm-dependent (the unigram_logloss r2/r3
    lesson). Callers wanting nats/bits take the log client-side.

    Scale shape: bigram generation is a JVM higher-order-function
    ``transform`` over each doc's token array — zero Python, explosion
    bounded by corpus token count. Three aggregates follow, all
    vocabulary-squared sized at worst (bigram-distinct in practice);
    marginals re-aggregate FROM the bigram counts (bigram-distinct
    input, not corpus), the single-row total broadcast-joins back, and
    the final ranking is TakeOrdered over distinct bigrams — the
    corpus itself is shuffled exactly once, on the bigram key.
    """
    toks = F.regexp_extract_all(
        F.lower(F.col(text_col)), F.lit(WORD_PATTERN), 0
    )
    # materialize the token array under a stable name so the HOF expr
    # can index it positionally
    bigrams = (
        df.select(toks.alias("_toks"))
        .select(
            F.explode(
                F.expr(
                    "transform(slice(_toks, 1, greatest(size(_toks) - 1, 0)),"
                    " (t, i) -> struct(t AS w1, _toks[i + 1] AS w2))"
                )
            ).alias("_b")
        )
        .select("_b.w1", "_b.w2")
    )
    pair = bigrams.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n_ab"))
    left = pair.groupBy("w1").agg(F.sum("n_ab").alias("n_a"))
    right = pair.groupBy("w2").agg(F.sum("n_ab").alias("n_b"))
    total = pair.agg(F.sum("n_ab").alias("n_total"))
    lift = F.col("n_ab").cast("double") * F.col("n_total") / (
        F.col("n_a") * F.col("n_b")
    )
    return (
        pair.filter(F.col("n_ab") >= min_count)
        .join(left, "w1")
        .join(right, "w2")
        .crossJoin(F.broadcast(total))
        .select(
            "w1",
            "w2",
            F.col("n_ab").cast("bigint").alias("n_ab"),
            F.col("n_a").cast("bigint").alias("n_a"),
            F.col("n_b").cast("bigint").alias("n_b"),
            F.round(lift, 6).alias("lift"),
        )
        .orderBy(F.desc("lift"), "w1", "w2")
        .limit(top_k)
    )


def bpe_train(
    df: DataFrame,
    n_merges: int,
    text_col: str = "text",
    min_pair_count: int = 2,
) -> list[tuple[str, str]]:
    """DISTRIBUTED byte-pair-encoding vocabulary training (Sennrich et
    al. 2016): learn the ``n_merges`` highest-frequency adjacent-symbol
    merges over the corpus, word-internal (no merges across whitespace),
    returning the ranked merge list a tokenizer ships.

    The classic iterative Spark shape (like PageRank): the evolving
    tokenization lives in a DataFrame of per-word symbol arrays
    COLLAPSED TO THE WORD VOCABULARY with counts — Heaps' law makes the
    distinct-word frame orders of magnitude smaller than the corpus,
    and symbol statistics are identical on the weighted vocabulary, so
    every iteration after the first scan works on vocabulary-sized
    data. Per iteration: adjacent-pair explode → weighted count (one
    vocabulary-sized shuffle, map-side partials) → TakeOrdered(1) to
    the driver (a single row — the only driver traffic) → merge applied
    corpus-side as a JVM ``aggregate`` fold (greedy left-to-right,
    exactly the reference semantics; zero Python in the loop).
    ``localCheckpoint`` cuts lineage each round so iteration N never
    replans rounds 1..N-1. Ties break lexicographically so training is
    deterministic.

    Stops early when no pair reaches ``min_pair_count``.
    """
    words = (
        df.select(
            F.explode(
                F.split(F.lower(F.col(text_col)), r"\s+")
            ).alias("w")
        )
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.split("w", "").alias("syms"), "n")
        .localCheckpoint()
    )
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs = words.select(
            F.explode(
                F.expr(
                    "transform(slice(syms, 1, greatest(size(syms) - 1, 0)),"
                    " (s, i) -> struct(s AS a, syms[i + 1] AS b))"
                )
            ).alias("p"),
            "n",
        )
        top = (
            pairs.groupBy("p.a", "p.b")
            .agg(F.sum("n").alias("cnt"))
            .orderBy(F.desc("cnt"), "a", "b")
            .limit(1)
            .collect()
        )
        if not top or top[0]["cnt"] < min_pair_count:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        # greedy left-to-right merge as a JVM fold: append each symbol,
        # replacing the trailing (a, b) pair with the merged token. The
        # accumulator's last element can itself be the merged token — it
        # only re-merges if (merged, b) is a LATER rule, exactly per BPE.
        words = words.select(
            F.expr(_merge_fold_sql("syms", a, b)).alias("syms"), "n"
        ).localCheckpoint()
    return merges


def _sql_str(s: str) -> str:
    """SQL string literal (symbols may contain quotes/backslashes —
    apostrophes survive the whitespace split)."""
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def _merge_fold_sql(arr_expr: str, a: str, b: str) -> str:
    """One greedy left-to-right BPE merge rule as a JVM aggregate fold."""
    la, lb, lm = _sql_str(a), _sql_str(b), _sql_str(a + b)
    return (
        f"aggregate({arr_expr}, CAST(array() AS array<string>),"
        f" (acc, s) -> CASE WHEN size(acc) > 0"
        f"   AND element_at(acc, -1) = {la} AND s = {lb}"
        f"  THEN concat(slice(acc, 1, size(acc) - 1), array({lm}))"
        f"  ELSE concat(acc, array(s)) END)"
    )


def bpe_apply(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Tokenize with a trained merge list: per word, apply every merge
    rule in rank order (the standard greedy BPE inference). Each rule is
    one JVM ``aggregate`` fold over the symbol array — the whole
    tokenizer is a single narrow projection, zero shuffles, zero
    Python; cost O(tokens × n_merges) per row, embarrassingly parallel.
    """
    syms = F.split(F.col(text_col), "")
    expr = "syms"
    col_df = df.withColumn("syms", syms)
    for a, b in merges:
        expr = _merge_fold_sql(expr, a, b)
    return col_df.withColumn(out_col, F.expr(expr)).drop("syms")


def bpe_fertility_curve(
    df: DataFrame,
    merge_counts: "Sequence[int]" = (0, 2, 4, 8),
    text_col: str = "text",
    min_pair_count: int = 2,
) -> DataFrame:
    """Close the tokenizer loop (r10 verdict task 3): train BPE merges
    on the corpus (``bpe_train``), then APPLY each merge-count prefix
    back to it and measure fertility — tokens per word — at every
    rung. This is the curve a tokenizer-sizing decision actually
    reads: merge 0 is character fertility (avg word length), each
    merge monotonically lowers the token total, and the knee says when
    growing the vocabulary stops paying.

    Scale shape: training is ``bpe_train``'s vocabulary-collapsed
    iteration (Heaps' law keeps the weighted word-vocab frame tiny);
    application is per-PREFIX chains of the same JVM ``aggregate``
    fold ``bpe_apply`` ships, evaluated on the vocabulary frame and
    weighted by word counts — so the measurement never re-scans the
    corpus after the one word-count pass. All integer counts; the
    fertility divide is one IEEE double division, engine-exact.

    Returns one row per requested merge count: ``(n_merges,
    total_words, total_tokens, fertility)``.
    """
    n_max = max(int(m) for m in merge_counts)
    merges = bpe_train(
        df, n_merges=n_max, text_col=text_col,
        min_pair_count=min_pair_count,
    )
    words = (
        df.select(
            F.explode(
                F.split(F.lower(F.col(text_col)), r"\s+")
            ).alias("w")
        )
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.split("w", "").alias("syms"), "n")
    )
    parts = []
    for m in merge_counts:
        expr = "syms"
        for a, b in merges[: int(m)]:
            expr = _merge_fold_sql(expr, a, b)
        parts.append(
            words.select(F.expr(expr).alias("toks"), "n")
            .agg(
                F.sum("n").cast("bigint").alias("total_words"),
                F.sum(F.col("n") * F.size("toks"))
                .cast("bigint")
                .alias("total_tokens"),
            )
            .select(
                F.lit(int(m)).cast("bigint").alias("n_merges"),
                "total_words",
                "total_tokens",
                F.round(
                    F.col("total_tokens").cast("double")
                    / F.col("total_words").cast("double"),
                    6,
                ).alias("fertility"),
            )
        )
    out = parts[0]
    for part in parts[1:]:
        out = out.unionByName(part)
    return out.orderBy("n_merges")


def dup_span_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """Duplicated-span coverage: for every document, how many of its
    distinct word ``k``-gram spans also occur in at least one OTHER
    document — the corpus-internal substring-duplication signal behind
    exact-substring train-data dedup (Lee et al., "Deduplicating
    Training Data Makes Language Models Better"; the reference pipeline
    has no corpus-level text ops — this is beyond-reference capability).

    Returns ``(id_col, n_spans, n_dup_spans, dup_ratio)`` where
    ``n_spans`` counts the doc's DISTINCT k-grams and ``n_dup_spans``
    those of them whose document frequency is ≥ 2.

    Scale shape: spans travel as 48-bit md5 folds (8 bytes, engine-
    invariant), never as strings. One explode of per-doc DISTINCT span
    hashes feeds both sides: (a) a span-keyed partial-aggregated count
    of distinct docs (doc-distinct is free — the explode already
    deduped per doc), (b) an equi-join of the duplicated-span set back
    to the exploded spans. Two shuffles on the span hash, both AQE-
    sized; nothing is quadratic, no stopword span ever materializes a
    corpus-sized list, and the doc bodies never travel — only hashes.
    """
    from .dedup import _hex12_to_long, word_shingles

    spans = (
        df.select(
            F.col(id_col),
            F.array_distinct(word_shingles(text_col, k)).alias("shs"),
        )
        .select(
            id_col,
            F.size("shs").alias("n_spans"),
            F.explode("shs").alias("sh"),
        )
        .select(
            id_col, "n_spans", _hex12_to_long(F.md5(F.col("sh"))).alias("sh_hash")
        )
    )
    # both consumers (span-df aggregate, join back) read the SAME
    # materialized span table — without this the corpus tokenizes and
    # explodes twice, once per plan branch (the bm25 single-pass trick;
    # lazy so nothing materializes until the first action)
    spans = cut(spans)
    # document frequency per span: rows are (doc, span)-distinct already,
    # so COUNT(*) == COUNT(DISTINCT doc) with no second Expand pass
    dup_spans = (
        spans.groupBy("sh_hash")
        .agg(F.count(F.lit(1)).alias("span_df"))
        .filter(F.col("span_df") >= 2)
        .select("sh_hash")
    )
    return (
        spans.join(dup_spans, "sh_hash")
        .groupBy(id_col, "n_spans")
        .agg(F.count(F.lit(1)).alias("n_dup_spans"))
        .select(
            id_col,
            "n_spans",
            "n_dup_spans",
            F.round(F.col("n_dup_spans") / F.col("n_spans"), 6).alias(
                "dup_ratio"
            ),
        )
    )


def dup_span_scrub(
    df: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Duplicated-span REMOVAL — the executed counterpart of
    ``dup_span_stats`` (Lee et al.'s exact-substring dedup actually
    applied, at the word-k-gram grain): every token covered by a
    ``k``-gram that also occurs in at least one OTHER document is
    dropped, and the document is reassembled from the surviving tokens
    in order. Tokenization is the corpus-wide ``WORD_PATTERN`` lower
    grain (the gate/chunking surface, not ``dup_span_stats``'s raw
    shingle grain — scrubbing must agree with the tokens downstream
    operators count). Documents shorter than ``k`` tokens have no
    spans and pass through untouched.

    Returns ``(id_col, n_tokens, n_removed, scrubbed_text)`` with
    ``scrubbed_text = ''`` when everything was duplicated (the
    all-boilerplate case).

    Scale shape: spans travel as 48-bit md5 folds with their 1-based
    position; document frequency is one span-keyed aggregate, coverage
    is the dup-span set equi-joined back and exploded to token indices
    (≤ k rows per dup span), collected to a per-doc index SET (bounded
    by doc length), and the rewrite is one narrow indexed-lambda
    filter over the original token array — the doc bodies never
    shuffle, only hashes and indices.
    """
    from .dedup import _hex12_to_long

    arr = F.regexp_extract_all(
        F.lower(F.col(text_col)), F.lit(WORD_PATTERN), 0
    )
    base = df.select(F.col(id_col), arr.alias("_ts")).select(
        id_col, "_ts", F.size("_ts").alias("_n")
    )
    gram_arr = F.when(
        F.col("_n") >= k,
        F.expr(
            f"transform(sequence(1, _n - {k - 1}),"
            f" i -> concat_ws(' ', slice(_ts, i, {k})))"
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = (
        base.select(
            F.col(id_col), F.posexplode(gram_arr).alias("_i0", "_g")
        )
        .select(
            id_col,
            (F.col("_i0") + 1).alias("_i"),
            _hex12_to_long(F.md5(F.col("_g"))).alias("_h"),
        )
    )
    # one materialized span table feeds BOTH the document-frequency
    # aggregate and the coverage join (dup_span_stats's discipline)
    grams = cut(grams)
    dup = (
        grams.groupBy("_h")
        .agg(F.countDistinct(id_col).alias("_df"))
        .filter(F.col("_df") >= 2)
        .select("_h")
    )
    cov = (
        grams.join(dup, "_h")
        .select(
            F.col(id_col),
            F.explode(F.expr(f"sequence(_i, _i + {k - 1})")).alias("_j"),
        )
        .groupBy(id_col)
        .agg(F.collect_set("_j").alias("_cov"))
    )
    covered = F.coalesce(F.col("_cov"), F.array().cast("array<int>"))
    kept = F.filter(
        F.col("_ts"),
        lambda x, i: ~F.array_contains(covered, (i + F.lit(1)).cast("int")),
    )
    return base.join(cov, id_col, "left").select(
        id_col,
        F.col("_n").cast("bigint").alias("n_tokens"),
        F.size(covered).cast("bigint").alias("n_removed"),
        F.array_join(kept, " ").alias("scrubbed_text"),
    )


def chunk_documents_udtf(
    spark,
    df: DataFrame,
    chunk_chars: int = 200,
    overlap: int = 20,
) -> DataFrame:
    """Python-UDTF rendering of :func:`chunk_documents` — SAME semantics
    (pinned by a parity test), different execution tier: rows stream
    through a Python worker as a user-defined TABLE function (Spark 4
    ``udtf`` API) instead of a JVM explode.

    This exists to pin the engine's UDF-boundary guidance with working
    code: the JVM explode is the production path (whole-stage codegen,
    no Python), and the UDTF is the template for chunkers whose logic
    genuinely can't be a Catalyst expression (model-based sentence
    segmentation, tokenizer-aware splitting). A UDTF is still the
    scale-correct Python shape — per-partition streaming, no
    collect, fan-out bounded by doc length — just with serialization
    cost at the boundary.
    """
    if not 0 <= overlap < chunk_chars:
        raise ValueError(f"need 0 <= overlap < chunk_chars: {overlap}, {chunk_chars}")
    from pyspark.sql.functions import udtf

    stride = chunk_chars - overlap

    @udtf(returnType="chunk_id int, chunk_text string, chunk_len int")
    class Chunker:
        def eval(self, text: str):  # noqa: ANN001
            if text is None:
                return
            import math

            n = max(1, math.ceil(max(len(text) - overlap, 1) / stride))
            for i in range(n):
                piece = text[i * stride : i * stride + chunk_chars]
                yield i, piece, len(piece)

    spark.udtf.register("chunk_udtf", Chunker)
    df.createOrReplaceTempView("_chunk_in")
    return spark.sql(
        "SELECT i.doc_id, i.source, c.chunk_id, c.chunk_text, c.chunk_len "
        "FROM _chunk_in i, LATERAL chunk_udtf(i.text) c"
    )


def hashed_features(
    df: DataFrame,
    n_buckets: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Feature hashing (the hashing trick): token counts folded into a
    fixed number of hash buckets — the bounded-width featurizer that
    feeds linear classifiers/regressors at corpus scale without a
    vocabulary pass or a fit stage. Long format ``(id, bucket,
    tf)`` — the sparse representation itself.

    Buckets come from the engine-invariant 48-bit md5 fold mod
    n_buckets, so an external SQL engine reproduces every cell. One
    explode + one (id, bucket) aggregate — a single shuffle whose width
    is bounded by n_buckets per doc, never vocabulary-sized."""
    from .dedup import _hex12_to_long

    toks = df.select(
        F.col(id_col),
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(WORD_PATTERN), 0)
        ).alias("tok"),
    )
    return (
        toks.select(
            id_col,
            (_hex12_to_long(F.md5(F.col("tok"))) % n_buckets).alias("bucket"),
        )
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def boilerplate_segments(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
    delim: str = "\n",
    max_doc_ratio_num: int = 1,
    max_doc_ratio_den: int = 2,
    min_docs: int = 2,
) -> DataFrame:
    """Discover per-source boilerplate segments: split each document on
    ``delim`` and flag segments that recur across more than
    ``max_doc_ratio_num/max_doc_ratio_den`` of the source's documents
    (and at least ``min_docs`` of them) — headers, footers, nav bars,
    cookie banners. The CCNet/RefinedWeb line-level dedup signal, with
    the delimiter configurable (newline for web text; any separator for
    single-line corpora).

    The ratio is a rational compared in integers
    (``df · den > n_docs · num``), never a float — the discovery
    decision is bit-identical in any SQL engine.

    Scale shape: one narrow explode, then a (source, segment) aggregate
    whose shuffle is segment-dictionary-sized (Heaps-law bounded, not
    corpus-sized); per-source doc counts broadcast. Output is the tiny
    boilerplate dictionary ``(source, segment, seg_df, n_docs)`` —
    at most (segments-per-doc)/ratio rows per source by counting.
    """
    import re as _re

    segs = df.select(
        F.col(id_col),
        F.col(source_col),
        # the delimiter is a LITERAL separator, not a regex — escape it
        # (Spark's split takes a Java regex; '.'/'|' would explode per char)
        F.explode(
            F.split(F.col(text_col), _re.escape(delim))
        ).alias("segment"),
    ).filter(F.col("segment") != "")
    seg_df = segs.groupBy(source_col, "segment").agg(
        F.countDistinct(id_col).alias("seg_df")
    )
    n_docs = df.groupBy(source_col).agg(
        F.countDistinct(id_col).alias("n_docs")
    )
    return (
        seg_df.join(F.broadcast(n_docs), source_col)
        .filter(
            (F.col("seg_df") >= min_docs)
            & (F.col("seg_df") * max_doc_ratio_den
               > F.col("n_docs") * max_doc_ratio_num)
        )
        .select(source_col, "segment", "seg_df", "n_docs")
    )


def scrub_boilerplate(
    df: DataFrame,
    boiler: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
    delim: str = "\n",
    join_delim: str | None = None,
    **discover_kwargs,
) -> DataFrame:
    """Remove discovered boilerplate segments from every document —
    the apply half of line-level boilerplate removal.

    ZERO corpus-sized shuffle in the apply: the boilerplate dictionary
    (tiny by construction — see ``boilerplate_segments``) is collapsed
    to one array per source and BROADCAST; each document is cleaned in
    the scan stage with a higher-order ``filter`` over its own split
    segments. No explode/re-assemble round trip, no per-segment join.

    Output keeps ``(id, source)``, adds ``n_segments`` (before),
    ``n_boiler`` (segment instances removed) and ``clean_text`` (kept
    segments re-joined with ``join_delim``, default = ``delim``).
    """
    if boiler is None:
        boiler = boilerplate_segments(
            df, text_col=text_col, id_col=id_col,
            source_col=source_col, delim=delim, **discover_kwargs,
        )
    if join_delim is None:
        join_delim = delim
    import re as _re

    split_pat = _re.escape(delim)
    boiler_arr = boiler.groupBy(source_col).agg(
        F.collect_list("segment").alias("_boiler_segs")
    )
    from ..functions.scalars import let_

    out = df.join(F.broadcast(boiler_arr), source_col, "left")
    bl = F.coalesce(F.col("_boiler_segs"), F.array())
    # let-bind the split: `segs` is referenced by two expressions below
    # and must not re-split per reference (see let_ docstring)
    return out.select(
        F.col(id_col),
        F.col(source_col),
        let_(
            # stage 1: split once, pair with the broadcast dictionary
            F.struct(
                F.filter(
                    # literal delimiter, escaped for Spark's regex split
                    F.split(F.col(text_col), split_pat),
                    lambda s: s != "",
                ).alias("segs"),
                bl.alias("bl"),
            ),
            # stage 2: filter once; both outputs read the kept array
            lambda v: let_(
                F.struct(
                    F.size(v["segs"]).alias("n_segments"),
                    F.filter(
                        v["segs"],
                        lambda s: ~F.array_contains(v["bl"], s),
                    ).alias("kept"),
                ),
                lambda k: F.struct(
                    k["n_segments"].alias("n_segments"),
                    (k["n_segments"] - F.size(k["kept"])).alias("n_boiler"),
                    F.array_join(k["kept"], join_delim).alias("clean_text"),
                ),
            ),
        ).alias("_s"),
    ).select(
        id_col,
        source_col,
        F.col("_s.n_segments").alias("n_segments"),
        F.col("_s.n_boiler").alias("n_boiler"),
        F.col("_s.clean_text").alias("clean_text"),
    )


def corpus_datacard(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Per-source corpus data card — the one-page governance summary a
    training-data release ships: volume, token mass, quality level,
    dominant language, and exact-duplication rate, per source, in one
    pass over the corpus.

    Columns: ``source, n_docs, total_tokens, quality_e6_sum`` (quality
    snapped to integer millionths and SUMMED — divide by n_docs for the
    mean; no division in the surface), ``top_lang, top_lang_docs``
    (argmax language with deterministic count-desc/name-asc
    tie-break), ``distinct_texts, dup_docs`` (docs whose exact
    fingerprint recurs within the source).

    Shuffle shape: one scan computes all per-doc signals (token count,
    quality, language, md5 fingerprint) in the scan stage; then three
    source-keyed aggregates (base stats, fingerprint dup rollup,
    language argmax) — each output is sources-sized, joined broadcast.
    The corpus is shuffled once, by fingerprint, for the dup count; at
    100 TB that is the same shuffle exact dedup already pays.
    """
    from pyspark.sql import Window

    scored = df.select(
        F.col(source_col).alias("source"),
        F.col(id_col),
        token_count(text_col).alias("_toks"),
        F.floor(quality_score(text_col) * 1_000_000 + F.lit(0.5))
        .cast("bigint")
        .alias("_q_e6"),
        language_id(text_col).alias("_lang"),
        F.md5(F.col(text_col)).alias("_fp"),
    )
    base = scored.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("_toks").cast("bigint").alias("total_tokens"),
        F.sum("_q_e6").alias("quality_e6_sum"),
        F.countDistinct("_fp").alias("distinct_texts"),
    )
    dup = (
        scored.groupBy("source", "_fp")
        .agg(F.count(F.lit(1)).alias("_c"))
        .filter(F.col("_c") > 1)
        .groupBy("source")
        .agg(F.sum("_c").cast("bigint").alias("dup_docs"))
    )
    lw = Window.partitionBy("source").orderBy(
        F.desc("_n"), F.asc("_lang")
    )
    top_lang = (
        scored.groupBy("source", "_lang")
        .agg(F.count(F.lit(1)).alias("_n"))
        .withColumn("_rk", F.row_number().over(lw))
        .filter(F.col("_rk") == 1)
        .select(
            "source",
            F.col("_lang").alias("top_lang"),
            F.col("_n").cast("bigint").alias("top_lang_docs"),
        )
    )
    return (
        base.join(F.broadcast(dup), "source", "left")
        .join(F.broadcast(top_lang), "source")
        .select(
            "source",
            "n_docs",
            "total_tokens",
            "quality_e6_sum",
            "top_lang",
            "top_lang_docs",
            "distinct_texts",
            F.coalesce("dup_docs", F.lit(0)).cast("bigint").alias("dup_docs"),
        )
    )


def source_ngram_diversity(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    n: int = 3,
) -> DataFrame:
    """Corpus-level n-gram diversity per source: total n-gram
    occurrences, distinct n-grams, and their ratio — the type-token
    ratio lifted from document grain (``repetition_stats``) to SOURCE
    grain. Low corpus-level diversity with normal per-doc diversity is
    the signature of templated/synthetic/mode-collapsed sources: each
    doc looks fine, the corpus repeats itself.

    Returns ``(group, n_ngrams, n_distinct_ngrams, diversity)`` with
    diversity = distinct/total rounded to 6 (both engines divide the
    same exact integers).

    Scale shape: tokenize + per-doc n-gram build are narrow map work;
    the explode lands in a (group, ngram) hash aggregate whose partial
    (map-side) combine bounds the shuffle at |sources| x |vocab^n
    observed| — the Heaps-law vocabulary, not the corpus; the final
    per-group rollup is |sources| rows.
    """
    from data_pipeline_ine_spark.functions.scalars import let_

    toks = F.regexp_extract_all(
        F.lower(F.col(text_col)), F.lit(WORD_PATTERN), 0
    )

    def ngrams(t: Column) -> Column:
        # docs shorter than n tokens contribute NOTHING (empty array →
        # explode drops the row); sequence() with start > stop would
        # otherwise generate a DESCENDING index list and fabricate
        # garbage n-grams
        return F.when(
            F.size(t) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(t) - F.lit(n - 1)),
                lambda i: F.concat_ws(" ", F.slice(t, i, n)),
            ),
        ).otherwise(F.array().cast("array<string>"))

    exploded = df.select(
        F.col(group_col).alias("grp"),
        F.explode(let_(toks, ngrams)).alias("ngram"),
    )
    per_gram = exploded.groupBy("grp", "ngram").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return per_gram.groupBy("grp").agg(
        F.sum("cnt").alias("n_ngrams"),
        F.count(F.lit(1)).alias("n_distinct_ngrams"),
        F.round(
            F.count(F.lit(1)) / F.greatest(F.sum("cnt"), F.lit(1)), 6
        ).alias("diversity"),
    ).withColumnRenamed("grp", group_col)


def pseudonymize(
    df: DataFrame,
    key_col: str,
    salt: str = "pseud:",
    out_col: str = "pseudo_id",
) -> DataFrame:
    """Deterministic pseudonymization: replace an identifier column with
    ``md5(salt || key)`` — irreversible without the salt, yet STABLE, so
    joins, group-bys, and longitudinal analyses still line up across
    tables and runs (the property plain row-dropping anonymization
    destroys). The companion to ``pii_redaction``: redaction cleans
    free text, pseudonymization cleans keys.

    Narrow map-side projection — zero shuffles; same salt => same
    mapping in any engine (portable md5).
    """
    return df.withColumn(
        out_col,
        F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string"))),
    ).drop(key_col)


def zipf_slope(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    top_k: int = 200,
) -> DataFrame:
    """Zipf slope per source: OLS fit of ln(freq) on ln(rank) over the
    top-``top_k`` terms — the corpus-health scalar (natural language
    sits near −1; templated/synthetic or truncated-vocabulary sources
    drift far off, complementing ``source_ngram_diversity``).

    Determinism: ranks are a total order (freq desc, term asc,
    row_number); both logs snap to e6 fixed-point integers via the
    proven ``floor(ln·1e6 + 0.5)`` recipe (classify's ``_neglog_e12``),
    and the OLS slope is scale-invariant (x and y carry the same 1e6
    factor), so the slope equals the unscaled fit while the moment
    sums stay exact integers.

    Scale shape: one (source, term) count (vocab-bounded by map-side
    combine), a per-source top-k rank window (WindowGroupLimit pushes
    the k cut into the sort), and grouped_ols's single moment
    aggregate over |sources|·k rows.
    """
    from pyspark.sql import Window

    from data_pipeline_ine_spark.operators.features import grouped_ols

    toks = df.select(
        F.col(group_col).alias("grp"),
        F.explode(
            F.regexp_extract_all(
                F.lower(F.col(text_col)), F.lit(WORD_PATTERN), 0
            )
        ).alias("term"),
    )
    freqs = toks.groupBy("grp", "term").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("grp").orderBy(F.desc("cnt"), F.asc("term"))
    ranked = (
        freqs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= top_k)
        .select(
            "grp",
            F.floor(F.log(F.col("rk").cast("double")) * 1e6 + F.lit(0.5))
            .cast("bigint")
            .alias("ln_rank_e6"),
            F.floor(F.log(F.col("cnt").cast("double")) * 1e6 + F.lit(0.5))
            .cast("bigint")
            .alias("ln_freq_e6"),
        )
    )
    out = grouped_ols(ranked, "ln_rank_e6", "ln_freq_e6", ["grp"], scale=0)
    return out.select(
        F.col("grp").alias(group_col),
        F.col("n").alias("n_terms"),
        "slope",
    )


def novel_ngram_rate(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    docs_per_snapshot: int = 100,
    n: int = 3,
) -> DataFrame:
    """Corpus-accretion novelty curve: docs grouped into ingestion
    snapshots (``doc_id div docs_per_snapshot`` — at 100 TB the crawl
    batch / partition date), and each snapshot reports what share of
    its n-gram OCCURRENCES are novel (their n-gram first appears in
    that snapshot). The dedup-planning dial: a crawl whose novel share
    decays to noise is re-crawling the same web; a spike flags a new
    domain entering the mix.

    Returns ``(snapshot, n_occ, n_novel, novel_rate_e6)`` — the rate
    an exact ``1e6·novel div total`` truncating division (non-negative
    operands, engine-portable).

    Scale shape: tokenize + per-doc n-gram build are narrow map work;
    occurrences collapse FIRST into (snapshot, ngram) counts (map-side
    combinable, vocab×snapshots-bounded — the Heaps-law ceiling), the
    per-ngram first-snapshot is a min over that same frame, and the
    novelty join is ngram-keyed between two vocab-sized frames. Nothing
    corpus-sized shuffles twice.
    """
    from data_pipeline_ine_spark.functions.scalars import let_

    toks = F.regexp_extract_all(
        F.lower(F.col(text_col)), F.lit(WORD_PATTERN), 0
    )

    def ngrams(t: Column) -> Column:
        return F.when(
            F.size(t) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(t) - F.lit(n - 1)),
                lambda i: F.concat_ws(" ", F.slice(t, i, n)),
            ),
        ).otherwise(F.array().cast("array<string>"))

    occ = (
        df.select(
            F.expr(f"{id_col} div {docs_per_snapshot}")
            .cast("bigint")
            .alias("snapshot"),
            F.explode(let_(toks, ngrams)).alias("ngram"),
        )
        .groupBy("snapshot", "ngram")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    first = occ.groupBy("ngram").agg(F.min("snapshot").alias("_first"))
    return (
        occ.join(first, "ngram")
        .groupBy("snapshot")
        .agg(
            F.sum("_c").cast("bigint").alias("n_occ"),
            F.sum(F.when(F.col("snapshot") == F.col("_first"), F.col("_c")).otherwise(0))
            .cast("bigint")
            .alias("n_novel"),
        )
        .select(
            "snapshot",
            "n_occ",
            "n_novel",
            F.expr("(1000000 * n_novel) div n_occ").alias("novel_rate_e6"),
        )
    )


def readability_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Flesch reading-ease and Flesch–Kincaid grade per document — the
    standard curation gate for audience-level filtering (too-hard and
    too-trivial tails both hurt a training mix).

    Counts are pure regex integers, engine-portable: words =
    ``[a-z0-9]+`` matches on the lowercased text, sentences =
    ``[.!?]+`` runs (min 1 so headline-style fragments don't divide by
    zero), syllables = vowel-group ``[aeiouy]+`` matches (the classic
    dictionary-free approximation; groups never span words because
    non-letters break them). The two scores are each ONE fixed double
    expression over those integers with shared literal constants —
    both engines parse the same decimal literals to the same doubles
    and evaluate the same operation tree, so the rounded values are
    bit-identical (the spearman/mahalanobis discipline).

    Scale shape: embarrassingly row-parallel (three regexp built-ins,
    JVM-side, no UDFs); one narrow projection, no shuffle at all.
    """
    t = F.lower(F.col(text_col))
    words = F.size(F.regexp_extract_all(t, F.lit(r"[a-z0-9]+"), 0)).cast(
        "bigint"
    )
    sents = F.greatest(
        F.lit(1).cast("bigint"),
        F.size(F.regexp_extract_all(t, F.lit(r"[.!?]+"), 0)).cast("bigint"),
    )
    sylls = F.size(F.regexp_extract_all(t, F.lit(r"[aeiouy]+"), 0)).cast(
        "bigint"
    )
    staged = df.select(
        F.col(id_col),
        words.alias("n_words"),
        sents.alias("n_sentences"),
        sylls.alias("n_syllables"),
    ).filter(F.col("n_words") > 0)
    wps = F.col("n_words").cast("double") / F.col("n_sentences").cast(
        "double"
    )
    spw = F.col("n_syllables").cast("double") / F.col("n_words").cast(
        "double"
    )
    return staged.select(
        id_col,
        "n_words",
        "n_sentences",
        "n_syllables",
        F.round(
            F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw, 4
        ).alias("flesch_ease"),
        F.round(
            F.lit(0.39) * wps + F.lit(11.8) * spw - F.lit(15.59), 4
        ).alias("fk_grade"),
    )


def token_fertility(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "lang",
) -> DataFrame:
    """Tokenizer fertility per group: subword tokens emitted per
    whitespace word — the tokenizer-efficiency lens on a multilingual
    mix (fertility ≫ 1 for a language means its text costs
    proportionally more context window, which skews effective mixing
    weights; the first table to check before setting corpus ratios).

    Tokens here are the BPE-ish regex surface (runs of word chars,
    splitting letter/digit boundaries) and words are ``\\S+`` runs —
    both pure regexp_extract_all counts, engine-portable integers.
    ``fertility_e6 = (tokens·10⁶) div words`` keeps the ratio integral
    (non-negative division, floor == truncate both engines).

    Scale shape: row-parallel JVM regex counts, one group-grain
    aggregate — map-side combinable, no windows, no UDFs.
    """
    t = F.lower(F.col(text_col))
    toks = F.size(
        F.regexp_extract_all(t, F.lit(r"[a-z]+|[0-9]+"), 0)
    ).cast("bigint")
    words = F.size(F.regexp_extract_all(t, F.lit(r"\S+"), 0)).cast("bigint")
    agg = (
        df.select(F.col(group_col), toks.alias("_t"), words.alias("_w"))
        .groupBy(group_col)
        .agg(
            F.sum(F.col("_t").cast("decimal(25,0)"))
            .cast("bigint")
            .alias("n_tokens"),
            F.sum(F.col("_w").cast("decimal(25,0)"))
            .cast("bigint")
            .alias("n_words"),
        )
    )
    return agg.select(
        group_col,
        "n_tokens",
        "n_words",
        F.expr("(n_tokens * 1000000) div n_words")
        .cast("bigint")
        .alias("fertility_e6"),
    ).orderBy(group_col)


def doc_keywords(
    df: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` characteristic terms PER DOCUMENT by tf-idf — the
    per-item counterpart of ``tfidf_top_terms``' per-source summary:
    the auto-tagging / search-snippet primitive (what is THIS document
    about, not its domain).

    Same engine-exact idf as the source-level operator: rational
    smoothing ``(N + 1)/(df + 1)`` — integer-derived double division,
    no libm logs — with the total order ``(score desc, term)`` making
    the cut deterministic.

    Scale shape: one tokenize explode, a (doc, term) count (map-side
    combinable), a vocab-bounded docfreq aggregate broadcast back, and
    a doc-partitioned rank window that WindowGroupLimit cuts at k
    inside the sort. Output ≤ k rows per document.
    """
    from pyspark.sql import Window

    toks = df.select(
        F.col(id_col),
        F.explode(
            F.regexp_extract_all(
                F.lower(F.col(text_col)), F.lit(WORD_PATTERN), 0
            )
        ).alias("term"),
    )
    tf = toks.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf")
    )
    docfreq = toks.groupBy("term").agg(
        F.countDistinct(id_col).cast("bigint").alias("docfreq")
    )
    n_docs = df.select(
        F.countDistinct(id_col).cast("bigint").alias("n_docs")
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("term"))
    return (
        tf.join(F.broadcast(docfreq), "term")
        .join(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.round(
                F.col("tf")
                * (
                    (F.col("n_docs") + 1).cast("double")
                    / (F.col("docfreq") + 1).cast("double")
                ),
                6,
            ),
        )
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select(id_col, "rank", "term", "tf", "docfreq", "score")
        .orderBy(id_col, "rank")
    )


def _token_ngrams(
    df: DataFrame,
    n: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "gram",
    tokens_col: str | None = None,
) -> DataFrame:
    """Exploded token n-grams per document — the shared front end of
    the repetition gate and the decontamination pass. The n-gram index
    sequence is guarded with ``size >= n`` because Spark's
    ``sequence(1, size-n+1)`` DESCENDS when the stop is below the
    start (round-6 lesson) and would fabricate garbage windows on
    short documents; guarded docs simply emit no rows.

    The grams are assembled INSIDE a ``transform`` over the index
    sequence and only the gram array is exploded (r12, guide §2.3
    "project before the exchange" applied to the Generate): the
    previous form exploded the positions and carried the WHOLE token
    array on every exploded row, so a document of L tokens
    materialized O(L²) cells through the Generate — harmless at 50
    tokens, ruinous at book length. Same strings, same row set
    (pinned by the unchanged gate/decontamination oracles).

    ``tokens_col`` (r13): callers that already hold the WORD_PATTERN
    token array (the curation stacks tokenize the corpus ONCE and feed
    every gate — guide §2.3/§3.3) name it here and skip the regex;
    the array is definitionally the one this function would build."""
    arr = (
        F.col(tokens_col)
        if tokens_col is not None
        else F.regexp_extract_all(
            F.lower(F.col(text_col)), F.lit(WORD_PATTERN), 0
        )
    )
    base = df.select(F.col(id_col), arr.alias("_ts"))
    grams = F.when(
        F.size("_ts") >= n,
        F.transform(
            F.sequence(F.lit(1), F.size("_ts") - F.lit(n - 1)),
            lambda i: F.concat_ws(
                " ",
                *[F.element_at(F.col("_ts"), i + F.lit(j))
                  for j in range(n)],
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return base.select(id_col, F.explode(grams).alias(out_col))


def gopher_repetition(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top2_max_pct: int = 5,
    dup3_max_pct: int = 2,
    tokens_col: str | None = None,
) -> DataFrame:
    """Gopher-style repetition quality gate (Rae et al. 2021, appendix
    A1 "repetition removal", adapted to the token grain): a document
    fails if its single most frequent 2-gram covers more than
    ``top2_max_pct`` percent of all 2-gram occurrences, or if more
    than ``dup3_max_pct`` percent of its 3-gram occurrences are
    repeats — the word-salad/boilerplate loop signature that unigram
    perplexity gates are blind to (a looping document has a perfectly
    normal word DISTRIBUTION).

    Everything that decides the flag is integer arithmetic: raw
    occurrence counts plus cross-multiplied percent comparisons
    (``top2_n * 100 <= pct * n2``), so the gate is engine-exact with
    no float thresholds. Documents too short to form a 2-gram can't
    exhibit repetition and PASS with zero counts (explicit rule, the
    ``lm_gate_batch`` drop-rule discipline).

    The top-2-gram rule fires only when the top 2-gram actually
    REPEATS (``top_2gram_n >= 2``): a document whose most frequent
    2-gram occurs once has zero repetition by definition, yet on any
    document shorter than ceil(100/pct)+1 tokens a single occurrence
    already exceeds the percentage — without the guard every short
    varied document fails spuriously (adversarial-review catch, r10:
    oracle parity was green because the oracle made the same
    mistake — the r9 seasonal_decompose failure mode again). The
    dup-3-gram rule needs no guard: zero duplicates always passes.

    Returns ``(id_col, n_2grams, top_2gram_n, n_3grams, dup_3gram_n,
    pass_repetition)`` with the flag as 0/1.

    Scale shape: two doc-keyed n-gram aggregates (one shuffle each on
    the (doc, gram) key, then a doc-keyed rollup) — narrow maps, no
    corpus-wide state, no windows.
    """
    # ONE exploded pass carries BOTH gram sizes (r13, guide §2.4): the
    # 2-gram and 3-gram chains shared nothing but the tokenization, so
    # the corpus paid two explode+double-aggregate pipelines (four
    # exchanges, two scans). Tagging each gram with its size n and
    # exploding the concatenated arrays folds them into one pipeline
    # (two exchanges, one scan); per-(doc, n, gram) counts — and hence
    # every downstream stat — are definitionally unchanged (the n tag
    # keeps the two gram populations disjoint in the grouping key).
    arr = (
        F.col(tokens_col)
        if tokens_col is not None
        else F.regexp_extract_all(
            F.lower(F.col(text_col)), F.lit(WORD_PATTERN), 0
        )
    )
    base = df.select(F.col(id_col), arr.alias("_ts"))

    def _grams(n: int):
        return F.when(
            F.size("_ts") >= n,
            F.transform(
                F.sequence(F.lit(1), F.size("_ts") - F.lit(n - 1)),
                lambda i: F.concat_ws(
                    " ",
                    *[F.element_at(F.col("_ts"), i + F.lit(j))
                      for j in range(n)],
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))

    # NB: the tag lambdas must stay ARITY-1 — pyspark binds a two-
    # parameter lambda (even `lambda g, n=n`) to the (element, index)
    # transform form, silently turning the tag into the array index
    tagged = base.select(
        F.col(id_col),
        F.explode(
            F.concat(
                F.transform(
                    _grams(2),
                    lambda g: F.struct(F.lit(2).alias("n"), g.alias("gram")),
                ),
                F.transform(
                    _grams(3),
                    lambda g: F.struct(F.lit(3).alias("n"), g.alias("gram")),
                ),
            )
        ).alias("t"),
    ).select(id_col, F.col("t.n").alias("n"), F.col("t.gram").alias("gram"))
    c = tagged.groupBy(id_col, "n", "gram").agg(
        F.count(F.lit(1)).alias("c")
    )
    is2, is3 = F.col("n") == 2, F.col("n") == 3
    stats = c.groupBy(id_col).agg(
        F.sum(F.when(is2, F.col("c"))).cast("bigint").alias("n_2grams"),
        F.max(F.when(is2, F.col("c"))).cast("bigint").alias("top_2gram_n"),
        F.sum(F.when(is3, F.col("c"))).cast("bigint").alias("n_3grams"),
        (
            F.sum(F.when(is3, F.col("c")))
            - F.sum(F.when(is3, 1).otherwise(0))
        ).cast("bigint").alias("dup_3gram_n"),
    )
    out = (
        df.select(id_col)
        .join(stats, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_2grams", F.lit(0)).alias("n_2grams"),
            F.coalesce("top_2gram_n", F.lit(0)).alias("top_2gram_n"),
            F.coalesce("n_3grams", F.lit(0)).alias("n_3grams"),
            F.coalesce("dup_3gram_n", F.lit(0)).alias("dup_3gram_n"),
        )
    )
    passes = (
        (
            (F.col("top_2gram_n") < 2)
            | (
                F.col("top_2gram_n") * 100
                <= F.lit(int(top2_max_pct)) * F.col("n_2grams")
            )
        )
        & (F.col("dup_3gram_n") * 100 <= F.lit(int(dup3_max_pct)) * F.col("n_3grams"))
    )
    return out.withColumn(
        "pass_repetition", F.when(passes, 1).otherwise(0).cast("int")
    )


def ngram_decontaminate(
    df: DataFrame,
    bench_pred: Column,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    tokens_col: str | None = None,
) -> DataFrame:
    """Training-set decontamination against a held-out benchmark
    (the GPT-3 appendix-C discipline, token n-gram overlap): every
    NON-benchmark document is scored by how many of its distinct
    token ``n``-grams also occur anywhere in the benchmark cohort
    (``bench_pred`` marks benchmark membership), and flagged
    ``contaminated`` on any overlap — the mandatory pre-training pass
    that keeps eval data out of the training corpus. Distinct-gram
    counting on both sides makes the score insensitive to internal
    repetition.

    Returns ``(id_col, n_ngrams, shared_ngrams, contaminated)`` for
    every non-benchmark document (``n_ngrams`` = its distinct n-gram
    count; flag as 0/1 — integer contract surface end-to-end).

    Scale shape: TWO predicate-pushed scans (the benchmark filter and
    its negation reach the source scan — cheaper than one scan plus a
    corpus-sized gram×id join to recover the flag), each followed by
    an exploded-n-gram pass; the benchmark's distinct-gram set joins
    by gram key (the planner broadcasts a small benchmark and falls
    back to a term-keyed shuffle at fleet-scale eval suites — no
    forced hint, the lm_gate_batch rule); one doc-keyed rollup.
    Nothing pairwise, nothing corpus².
    """
    is_bench = bench_pred.cast("boolean")
    bench_set = (
        _token_ngrams(
            df.filter(is_bench), n, text_col, id_col, out_col="gram",
            tokens_col=tokens_col,
        )
        .select("gram")
        .distinct()
    )
    nonbench = df.filter(~is_bench)
    corpus = (
        _token_ngrams(nonbench, n, text_col, id_col, out_col="gram",
                      tokens_col=tokens_col)
        .select(id_col, "gram")
        .distinct()
    )
    shared = (
        corpus.join(bench_set, "gram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).cast("bigint").alias("shared_ngrams"))
    )
    totals = corpus.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_ngrams")
    )
    return (
        nonbench.select(id_col)
        .join(totals, id_col, "left")
        .join(shared, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_ngrams", F.lit(0)).alias("n_ngrams"),
            F.coalesce("shared_ngrams", F.lit(0)).alias("shared_ngrams"),
            F.when(F.coalesce("shared_ngrams", F.lit(0)) > 0, 1)
            .otherwise(0)
            .cast("int")
            .alias("contaminated"),
        )
    )


def chunk_token_windows(
    df: DataFrame,
    window: int = 32,
    stride: int = 24,
    text_col: str = "text",
    id_col: str = "doc_id",
    tokens_col: str | None = None,
) -> DataFrame:
    """Overlapping context-window chunking — the RAG-indexing /
    long-document pre-tokenization pass: each document's token stream
    is cut into windows of ``window`` tokens advancing by ``stride``
    (overlap = window − stride), the standard HuggingFace
    return-overflowing-tokens recipe. Chunk count is the closed form
    ``m = n <= 0 ? 0 : 1 + max(0, (n − window + stride − 1) div
    stride)`` — every token is covered, the final window is the only
    short one, and a bigger corpus never re-chunks earlier documents.

    The negative intermediate in the closed form is clamped with
    GREATEST on BOTH engines before use: Spark ``div`` truncates
    toward zero while DuckDB ``//`` floors, and they only agree on
    non-negative operands (round-6 rule) — the clamp makes the
    disagreement range unreachable.

    Returns ``(id_col, chunk_idx, start_tok, n_tokens, chunk_text)``
    with 1-based token offsets — stable, derivable chunk identity
    (doc id + index), no synthetic ids.

    Scale shape: one narrow map (tokenize + closed-form m) and one
    explode — zero shuffles, zero windows; chunk text is a slice of
    the already-materialized token array, never a re-scan of the
    source string.
    """
    if stride <= 0 or window <= 0 or stride > window:
        raise ValueError(
            f"need 0 < stride <= window, got window={window} stride={stride}"
        )
    arr = (
        F.col(tokens_col)
        if tokens_col is not None
        else F.regexp_extract_all(
            F.lower(F.col(text_col)), F.lit(WORD_PATTERN), 0
        )
    )
    base = df.select(F.col(id_col), arr.alias("_ts")).select(
        id_col, "_ts", F.size("_ts").alias("_n")
    )
    m = F.when(F.col("_n") <= 0, F.lit(0)).otherwise(
        F.lit(1)
        + F.greatest(
            F.lit(0),
            F.expr(f"(_n - {int(window)} + {int(stride) - 1}) div {int(stride)}"),
        )
    )
    start = F.col("_k") * stride + 1
    length = F.least(F.lit(window), F.col("_n") - F.col("_k") * stride)
    return (
        base.select(
            id_col,
            "_ts",
            "_n",
            F.explode(
                F.when(
                    m > 0, F.sequence(F.lit(0), m - 1)
                ).otherwise(F.array().cast("array<long>"))
            ).alias("_k"),
        )
        .select(
            id_col,
            F.col("_k").cast("bigint").alias("chunk_idx"),
            start.cast("bigint").alias("start_tok"),
            length.cast("bigint").alias("n_tokens"),
            F.array_join(
                F.slice(F.col("_ts"), start, length), " "
            ).alias("chunk_text"),
        )
    )

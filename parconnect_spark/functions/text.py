"""Text-analysis operators for training-data pipelines — all built-in
column expressions (JVM-side, whole-stage codegen), no Python in the row
path.

These extend the engine beyond the reference (which has no string
functions, SURVEY.md §2.7) to the document-pipeline operations a 100 TB
corpus needs: token counting, quality scoring, language ID heuristic,
fingerprinting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# tiny built-in marker lists for the language-ID heuristic
_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that"],
    "es": ["el", "la", "de", "que", "y", "los", "en", "un"],
    "fr": ["le", "la", "et", "les", "des", "un", "une", "dans"],
    "de": ["der", "die", "und", "das", "ein", "nicht", "mit", "ist"],
}

# BPE-ish tokenization: words, numbers, or single non-space symbols
TOKEN_PATTERN = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def tokens_col(text: F.Column) -> F.Column:
    """Whitespace tokens (empty strings filtered)."""
    return F.filter(F.split(text, " "), lambda t: t != "")


def token_count(text: F.Column, bpe_ish: bool = False) -> F.Column:
    """Token count: whitespace words, or a BPE-ish regex segmentation."""
    if bpe_ish:
        return F.regexp_count(text, F.lit(TOKEN_PATTERN))
    return F.size(tokens_col(text))


def quality_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc quality features: token/char counts, avg token length,
    distinct-token ratio, punctuation ratio — the standard cheap quality
    scores for corpus filtering. Pure column expressions."""
    t = F.col(text_col)
    toks = tokens_col(t)
    n_tokens = F.size(toks)
    chars_nospace = F.length(F.regexp_replace(t, " ", ""))
    return docs.select(
        "*",
        n_tokens.alias("n_tokens"),
        F.length(t).alias("n_chars_total"),
        chars_nospace.alias("n_chars_nospace"),
        F.round(chars_nospace / F.greatest(n_tokens, F.lit(1)), 6).alias(
            "avg_token_len"
        ),
        F.round(
            F.size(F.array_distinct(toks)) / F.greatest(n_tokens, F.lit(1)), 6
        ).alias("distinct_ratio"),
        F.round(
            F.length(F.regexp_replace(t, r"[a-zA-Z0-9 ]", ""))
            / F.greatest(F.length(t), F.lit(1)),
            6,
        ).alias("punct_ratio"),
    )


def quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Single scalar in [0,1]: simple monotone combination of the features
    (long enough, diverse enough, not punctuation soup)."""
    f = quality_features(docs, text_col)
    score = (
        F.least(F.col("n_tokens") / F.lit(64.0), F.lit(1.0)) * 0.4
        + F.col("distinct_ratio") * 0.4
        + (1 - F.least(F.col("punct_ratio") * 4, F.lit(1.0))) * 0.2
    )
    return f.withColumn("quality", F.round(score, 6))


def language_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-stopword language guess (n-gram heuristic): per language,
    count marker hits among the doc's tokens; argmax wins, 'und' when no
    marker hits at all. Ties break to the lexicographically larger code
    (deterministic across any partitioning)."""
    toks = F.array_distinct(tokens_col(F.lower(F.col(text_col))))
    scores = [
        F.struct(
            F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words]))).alias(
                "hits"
            ),
            F.lit(lang).alias("lang"),
        )
        for lang, words in sorted(_LANG_MARKERS.items())
    ]
    # array_max on structs: lexicographic (hits, lang) ⇒ highest hit count,
    # largest code on ties.
    best = F.array_max(F.array(*scores))
    return docs.select(
        "*",
        F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und")).alias(
            "lang_guess"
        ),
    )


def repetition_features(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-doc repetition features — the Gopher-family quality filters
    (Rae et al. 2021, "Scaling Language Models", appendix A: fraction of
    tokens in duplicated/most-common n-grams), the standard screen for
    boilerplate and degenerate generations in a training corpus:

    * ``dup_word_frac``       1 − distinct_words / words (0 for empty docs)
    * ``top_bigram_frac``     2 · count(most frequent word bigram) / words
    * ``top_trigram_frac``    3 · count(most frequent word trigram) / words

    Only the max count is used (never the argmax gram), so results carry no
    tie-breaking ambiguity and replicate exactly in ANSI SQL. Scale shape:
    dup_word_frac is a pure row-local expression; each n-gram needs one
    explode + two map-side-combinable aggregations keyed by
    (doc, gram) / (doc) — no skew concentration, since grouping is always
    per-document."""
    t, did = F.col(text_col), F.col(id_col)
    toks = tokens_col(t)
    n_words = F.size(toks)
    base = docs.select(
        did,
        toks.alias("_w"),
        n_words.alias("n_words"),
        F.round(
            (n_words - F.size(F.array_distinct(toks)))
            / F.greatest(n_words, F.lit(1)),
            6,
        ).alias("dup_word_frac"),
    )

    def top_gram_count(n: int) -> DataFrame:
        grams = F.transform(
            F.sequence(F.lit(0), F.size("_w") - n),
            lambda i: F.concat_ws(
                " ", *[F.element_at("_w", (i + k + 1).cast("int")) for k in range(n)]
            ),
        )
        return (
            base.where(F.size("_w") >= n)
            .select(did, F.explode(grams).alias("_g"))
            .groupBy(id_col, "_g")
            .count()
            .groupBy(id_col)
            .agg(F.max("count").alias(f"_top{n}"))
        )

    out = (
        base.drop("_w")
        .join(top_gram_count(2), id_col, "left")
        .join(top_gram_count(3), id_col, "left")
    )
    return out.select(
        id_col,
        "n_words",
        "dup_word_frac",
        F.round(
            F.coalesce(F.col("_top2"), F.lit(0)) * 2 / F.greatest("n_words", F.lit(1)),
            6,
        ).alias("top_bigram_frac"),
        F.round(
            F.coalesce(F.col("_top3"), F.lit(0)) * 3 / F.greatest("n_words", F.lit(1)),
            6,
        ).alias("top_trigram_frac"),
    )


def fingerprint(
    docs: DataFrame, text_col: str = "text", prefix: int | None = None
) -> DataFrame:
    """Deterministic document fingerprint: md5 of the lower-cased,
    whitespace-collapsed FULL text — the exact-dedup key (md5 is one pass
    either way). Pass ``prefix`` to fingerprint only the first N normalized
    chars (an opt-in blocking key, not exact)."""
    norm = F.lower(F.regexp_replace(F.col(text_col), r"\s+", " "))
    if prefix is not None:
        norm = norm.substr(1, prefix)
    return docs.select("*", F.md5(norm).alias("fp"))


def tfidf_top_terms(
    docs: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_docs: int | None = None,
) -> DataFrame:
    """Top-k TF-IDF terms per document (smooth idf, sklearn-style):

        idf(t)   = ln((1 + N) / (1 + df(t))) + ... (the +1 constant shifts
                   every score identically, so it is folded OUT of the key)
        score    = tf(t, d) * idf(t)

    Returns DataFrame[id_col, term, tf, df, tfidf] with exactly the k
    highest-scoring terms per doc (ties broken by term ascending).

    Cross-engine determinism: ranking by a raw double (tf * ln(...)) can
    flip ties when two engines' ``ln`` differ in the last ulp, so the sort
    key is the INTEGER ``tf * round(ln((1+N)/(1+df)) * 1e6)`` and the
    reported tfidf is that key / 1e6 — the same double on any IEEE engine.

    Scale shape: one explode + two map-side-combined hash aggregates
    ((doc, term) counts, then per-term doc frequency) and one window
    partitioned by doc — per-partition work is bounded by document length,
    never by corpus size. The doc-frequency side joins back by term; stop
    words make that key heavy but it carries only (term, df) rows. Pass
    ``n_docs`` to skip the corpus-count job (the ANN-family hint
    discipline — at 100 TB a count is a full scan unless the catalog
    already knows it)."""
    from pyspark.sql import Window

    if n_docs is None:
        n_docs = docs.count()
    terms = docs.select(
        F.col(id_col),
        F.explode(
            F.expr(f"regexp_extract_all(lower({text_col}), '[a-z0-9]+', 0)")
        ).alias("term"),
    )
    tf = terms.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf6 = F.round(
        F.log((F.lit(1.0) + F.lit(float(n_docs))) / (F.lit(1.0) + F.col("df")))
        * 1_000_000
    ).cast("long")
    scored = tf.join(dfreq, "term").select(
        id_col, "term", "tf", "df", (F.col("tf") * idf6).alias("_skey")
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("_skey"), F.asc("term"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .select(
            id_col,
            "term",
            "tf",
            "df",
            (F.col("_skey").cast("double") / 1_000_000).alias("tfidf"),
        )
    )


#: Redaction patterns, applied IN ORDER on progressively-redacted text so a
#: match consumed by an earlier category can't double-count in a later one
#: (a URL's host never re-matches as an email/IP). Conservative ASCII-only
#: syntax chosen to mean the same thing to Java regex (Spark) and RE2
#: (DuckDB): character classes, bounded repetition, \b word boundaries.
PII_PATTERNS = (
    ("url", r"https?://[A-Za-z0-9./_%+?=&#:-]+", "<URL>"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d{7,15}\b", "<PHONE>"),
)


def redact_pii(
    docs: DataFrame, text_col: str = "text", keep_text: bool = True
) -> DataFrame:
    """Deterministic PII scrubbing for training-corpus preparation: URLs,
    emails, IPv4 addresses, and +-prefixed phone numbers are replaced by
    typed placeholders, with a per-category match count per document.

    Returns the input columns plus ``n_url, n_email, n_ipv4, n_phone`` and
    (when ``keep_text``) ``redacted``. Pure Catalyst expressions
    (regexp_count/regexp_replace) — JVM-side, codegen'd, no Python in the
    pipeline; counts are computed category-by-category on the
    progressively-redacted text so overlapping categories never
    double-count, and the identical order is what any re-implementation
    (the DuckDB oracle replicates it) must follow."""
    cur = F.col(text_col)
    out = docs
    for name, pat, token in PII_PATTERNS:
        out = out.withColumn(f"n_{name}", F.regexp_count(cur, F.lit(pat)))
        cur = F.regexp_replace(cur, pat, token)
    out = out.withColumn("redacted", cur)
    if not keep_text:
        out = out.drop(text_col)
    return out


def bigram_lm(
    docs: DataFrame,
    k: int = 3,
    text_col: str = "text",
    min_head_count: int = 2,
) -> DataFrame:
    """Corpus bigram language-model table: the top-k continuations of each
    head token with conditional probability ``p(w2|w1) = c(w1,w2)/c(w1)``
    — the n-gram statistic behind corpus-analysis tools (perplexity-proxy
    scoring, boilerplate detection, domain drift tracking).

    Returns DataFrame[w1, w2, c12, c1, p] with exactly the k most frequent
    continuations per head (ties by w2 ascending — count-then-term integer
    ordering, so rankings are engine-independent by construction);
    ``min_head_count`` drops hapax heads. Bigrams never cross document
    boundaries.

    Scale shape: one window-lead per document (partitioned by doc — the
    derive_edges discipline), two map-side-combined hash aggregates, one
    per-head top-k window over (count desc, w2). A stop-word head's window
    partition holds its distinct continuations, bounded by vocabulary, not
    corpus size."""
    from pyspark.sql import Window

    toks = docs.select(
        F.monotonically_increasing_id().alias("_doc"),
        F.expr(
            f"regexp_extract_all(lower({text_col}), '[a-z0-9]+', 0)"
        ).alias("_ts"),
    ).select(
        "_doc", F.posexplode("_ts").alias("_pos", "w1")
    )
    w = Window.partitionBy("_doc").orderBy("_pos")
    big = toks.withColumn("w2", F.lead("w1").over(w)).where(
        F.col("w2").isNotNull()
    )
    c12 = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = c12.groupBy("w1").agg(F.sum("c12").alias("c1"))
    topw = Window.partitionBy("w1").orderBy(F.desc("c12"), F.asc("w2"))
    return (
        c12.join(c1, "w1")
        .where(F.col("c1") >= min_head_count)
        .withColumn("_rn", F.row_number().over(topw))
        .where(F.col("_rn") <= k)
        .select(
            "w1",
            "w2",
            "c12",
            "c1",
            F.round(F.col("c12") / F.col("c1"), 6).alias("p"),
        )
    )


def lm_score(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document negative log-likelihood under the corpus's OWN bigram
    language model — the CCNet-style perplexity quality filter, self-scored
    (documents whose bigrams are unusual for the corpus score high and are
    filter candidates; boilerplate scores low).

    Returns DataFrame[id_col, n_bigrams: long, nll6: long, ppl: double]
    for every document with at least one bigram: ``nll6`` is the EXACT
    integer Σ round(−ln(p(w2|w1))·10^6) over the document's bigrams
    (p = corpus c12/c1 — never smoothed: self-scoring guarantees every
    document bigram exists in the corpus table), and
    ``ppl = exp(nll6 / n_bigrams / 10^6)`` rounded to 6dp is the one
    derived double.

    Determinism (the tfidf_top_terms discipline): the per-bigram quantity
    is rounded to an int64 immediately — −ln(·) is non-negative (p ≤ 1),
    so Spark's HALF_UP and DuckDB's half-away-from-zero ROUND agree — and
    the document aggregate is an exact int64 Σ, commutative under any
    partitioning where a Σ of raw doubles is not.

    Scale shape: one window-lead per document (partitioned by doc), two
    map-side-combined hash aggregates for the LM, one (w1, w2) equi-join
    back to the document bigrams, one final hash aggregate per doc. The
    bigram table is scope-persisted (consumed by both the LM build and
    the scoring join). A stop-bigram's join key is skewed but
    AQE-splittable; nothing windows over it.
    """
    from pyspark.sql import Window

    from parconnect_spark.cache import scoped_persist

    toks = docs.select(
        F.col(id_col),
        F.expr(
            f"regexp_extract_all(lower({text_col}), '[a-z0-9]+', 0)"
        ).alias("_ts"),
    ).select(id_col, F.posexplode("_ts").alias("_pos", "w1"))
    w = Window.partitionBy(id_col).orderBy("_pos")
    big = scoped_persist(
        toks.withColumn("w2", F.lead("w1").over(w))
        .where(F.col("w2").isNotNull())
        .select(id_col, "w1", "w2")
    )
    c12 = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = c12.groupBy("w1").agg(F.sum("c12").alias("c1"))
    # the EXACT expression the DuckDB oracle replays, via expr() so both
    # engines parse the same arithmetic tree
    lm = c12.join(c1, "w1").select(
        "w1",
        "w2",
        F.expr(
            "CAST(ROUND(-LN(CAST(c12 AS DOUBLE) / c1) * 1000000) AS BIGINT)"
        ).alias("_nll6"),
    )
    return (
        big.join(lm, ["w1", "w2"])
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("_nll6").alias("nll6"),
        )
        .select(
            id_col,
            "n_bigrams",
            "nll6",
            F.round(
                F.exp(
                    F.col("nll6").cast("double")
                    / F.col("n_bigrams")
                    / 1_000_000
                ),
                6,
            ).alias("ppl"),
        )
    )


def rolling_topk_terms(
    turns: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    bucket_us: int = 86_400_000_000,
    window_buckets: int = 7,
    k: int = 5,
) -> DataFrame:
    """Trending terms: the top-``k`` terms (by exact count, term-asc
    tiebreak) in every trailing ``window_buckets``-bucket window — the
    companion to :func:`~parconnect_spark.functions.sketch.
    hll_rolling_distinct`, with the same pre-aggregate-then-merge shape:
    raw text is scanned and tokenized ONCE into per-(bucket, term)
    counts, and each window is a bounded merge of ≤ window_buckets rows
    PER TERM — overlapping windows never re-scan or re-tokenize raw
    turns. Window wd covers buckets wd−window_buckets+1 … wd; every
    window touched by an occupied bucket is emitted.

    Ranking is (count DESC, term ASC) — a total integer/string order, so
    the top-k set is engine-independent with no double anywhere.

    Scale note: the per-window rank partitions over DISTINCT TERMS in the
    window (vocabulary-, not event-sized). For web-scale open
    vocabularies, pre-prune the term table with
    :func:`~parconnect_spark.functions.sketch.heavy_hitters` (CM prune,
    exact survivors) before the window merge; the contract query's
    closed vocabulary doesn't need it.

    Returns DataFrame[asof_bucket_us: long, rank: int, term, cnt: long].
    """
    from pyspark.sql import Window

    if window_buckets < 1 or k < 1:
        raise ValueError("window_buckets and k must be >= 1")
    if bucket_us <= 0:
        raise ValueError("bucket_us must be positive")
    keyed = turns.select(
        F.expr(
            f"unix_micros(cast({ts_col} as timestamp)) div {bucket_us}"
        ).alias("b"),
        F.explode(
            F.expr(f"regexp_extract_all(lower({text_col}), '[a-z0-9]+', 0)")
        ).alias("term"),
    )
    per_bucket = keyed.groupBy("b", "term").agg(
        F.count(F.lit(1)).alias("_c")
    )
    win = F.expr(f"sequence(b, b + {window_buckets - 1})")
    merged = (
        per_bucket.select(F.explode(win).alias("wd"), "term", "_c")
        .groupBy("wd", "term")
        .agg(F.sum("_c").alias("cnt"))
    )
    w = Window.partitionBy("wd").orderBy(F.desc("cnt"), F.asc("term"))
    return (
        merged.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            (F.col("wd") * bucket_us).alias("asof_bucket_us"),
            "rank",
            "term",
            F.col("cnt").cast("long").alias("cnt"),
        )
    )


def term_bursts(
    turns: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    bucket_us: int = 86_400_000_000,
    window_buckets: int = 7,
    ratio_num: int = 2,
    ratio_den: int = 1,
    min_count: int = 5,
) -> DataFrame:
    """Bursting terms: a (bucket, term) bursts when its count reaches
    ``min_count`` AND is at least ``ratio_num/ratio_den`` times its
    trailing per-bucket baseline (the mean of the prior ``window_buckets``
    buckets, absent buckets counting zero). A term with NO prior
    occurrences is a "new term" burst: ``baseline = 0`` and ``ratio``
    NULL. The spike-detection twin of :func:`rolling_topk_terms`, on the
    same per-(bucket, term) pre-aggregation — raw text is tokenized once,
    the baseline is the same constant-fan-out window merge shifted
    forward one bucket (bucket b feeds baselines b+1 … b+window_buckets).

    The burst PREDICATE is pure integer arithmetic
    (``cnt · W · ratio_den ≥ baseline · ratio_num``) so membership can
    never flip on an engine's double ulp; the reported ``ratio``
    (cnt·W/baseline, 6dp) is derived display only.

    Returns DataFrame[asof_bucket_us, term, cnt, baseline, ratio].
    """
    if window_buckets < 1 or min_count < 1:
        raise ValueError("window_buckets and min_count must be >= 1")
    if bucket_us <= 0 or ratio_num < 1 or ratio_den < 1:
        raise ValueError("bucket_us and ratio terms must be positive")
    keyed = turns.select(
        F.expr(
            f"unix_micros(cast({ts_col} as timestamp)) div {bucket_us}"
        ).alias("b"),
        F.explode(
            F.expr(f"regexp_extract_all(lower({text_col}), '[a-z0-9]+', 0)")
        ).alias("term"),
    )
    per_bucket = keyed.groupBy("b", "term").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    base = (
        per_bucket.select(
            F.explode(
                F.expr(f"sequence(b + 1, b + {window_buckets})")
            ).alias("b"),
            "term",
            "cnt",
        )
        .groupBy("b", "term")
        .agg(F.sum("cnt").alias("baseline"))
    )
    j = per_bucket.join(base, ["b", "term"], "left").select(
        "b",
        "term",
        "cnt",
        F.coalesce("baseline", F.lit(0)).cast("long").alias("baseline"),
    )
    w = window_buckets
    return (
        j.where(
            (F.col("cnt") >= min_count)
            & (
                F.col("cnt") * F.lit(w * ratio_den)
                >= F.col("baseline") * F.lit(ratio_num)
            )
        )
        .select(
            (F.col("b") * bucket_us).alias("asof_bucket_us"),
            "term",
            F.col("cnt").cast("long").alias("cnt"),
            "baseline",
            F.when(
                F.col("baseline") > 0,
                F.round(
                    F.col("cnt") * F.lit(float(w)) / F.col("baseline"), 6
                ),
            ).alias("ratio"),
        )
    )


def collocations(
    docs: DataFrame,
    min_count: int = 5,
    top_k: int = 50,
    min_df: int = 2,
    max_df: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k PMI-ranked term collocations: pairs of distinct whitespace
    tokens co-occurring in the same document, ranked by pointwise mutual
    information — the corpus-level phrase/topic discovery pass of a text
    pipeline.

    Determinism discipline: the rank key is ``pmi_score =
    floor(n_pair·N·10^6 / (n_a·n_b))`` where the numerator and denominator
    are exact int64 products widened to IEEE doubles — exact while
    ``n_pair·N·10^6 < 2^53`` (N·n_pair < 9·10^9; past that, swap the
    widening for DECIMAL(38,0) division) — and double division is
    correctly rounded on every engine, so floor can never disagree. No
    logarithm crosses an engine boundary (log is monotone in the ratio,
    so the ranking is the PMI ranking; emit ln(score/10^6) caller-side
    for display).

    Scale shape: the pair join is keyed on ``id_col`` (per-doc fan-out =
    k_d^2 over the doc's KEPT distinct terms — bounded by doc length,
    never by corpus size), and the df band is the skew guard:
    ``max_df`` drops boilerplate terms (a term in every doc contributes
    every doc's quadratic blow-up), ``min_df`` drops hapaxes that can
    never reach ``min_count``. Final ranking is a TakeOrderedAndProject
    top-k, never a global sort of the pair table."""
    tok = docs.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(tokens_col(F.col(text_col)))).alias(
            "term"
        ),
    )
    df_tbl = tok.groupBy("term").agg(F.count(F.lit(1)).alias("_df"))
    band = df_tbl.where(F.col("_df") >= min_df)
    if max_df is not None:
        band = band.where(F.col("_df") <= max_df)
    from parconnect_spark.cache import scoped_persist

    # consumed twice (both sides of the pair join) — without the persist
    # the tokenize+df-band subtree recomputes per side
    kept = scoped_persist(tok.join(band, "term"))
    a = kept.select("id", F.col("term").alias("term_a"),
                    F.col("_df").alias("n_a"))
    b = kept.select("id", F.col("term").alias("term_b"),
                    F.col("_df").alias("n_b"))
    pairs = (
        a.join(b, "id")
        .where(F.col("term_a") < F.col("term_b"))
        .groupBy("term_a", "term_b", "n_a", "n_b")
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .where(F.col("n_pair") >= min_count)
    )
    n = docs.agg(F.count(F.lit(1)).alias("_n_docs"))
    return (
        pairs.crossJoin(F.broadcast(n))
        .select(
            "term_a",
            "term_b",
            F.col("n_pair").cast("long").alias("n_pair"),
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            F.floor(
                (F.col("n_pair") * F.col("_n_docs") * F.lit(1_000_000))
                .cast("double")
                / (F.col("n_a") * F.col("n_b")).cast("double")
            )
            .cast("long")
            .alias("pmi_score"),
        )
        .orderBy(F.desc("pmi_score"), "term_a", "term_b")
        .limit(top_k)
    )


def chunk_documents(
    docs: DataFrame,
    window: int = 64,
    stride: int = 48,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Fixed-window training-sequence chunking with overlap: each doc's
    whitespace tokens split into windows of ``window`` tokens starting
    every ``stride`` (overlap = window - stride), the standard context-
    window preparation step next to functions/sampling.sequence_pack
    (which PACKS whole short docs; this SPLITS long ones).

    Chunk count for n tokens: 1 + ceil(max(n - window, 0) / stride) — the
    final chunk may be short but never empty, every token is covered, and
    no chunk starts beyond the text. Empty docs yield no rows.

    Pure Catalyst (sequence → transform → slice → array_join): the
    explode's fan-out per row is ~n/stride, bounded by doc length — no
    window function, no Python, so it scales as a flat map over the
    corpus. Returns (id, chunk_idx, n_tokens, chunk)."""
    toks = tokens_col(F.col(text_col))
    n = F.size("_toks")
    nch = F.lit(1) + F.expr(
        f"(greatest(size(_toks) - {window}, 0) + {stride - 1}) div {stride}"
    )
    return (
        docs.select(F.col(id_col).alias("id"), toks.alias("_toks"))
        .where(n > 0)
        .select(
            "id",
            "_toks",
            F.explode(F.sequence(F.lit(0), nch - 1)).alias("chunk_idx"),
        )
        .select(
            "id",
            "chunk_idx",
            F.expr(f"slice(_toks, chunk_idx * {stride} + 1, {window})").alias(
                "_c"
            ),
        )
        .select(
            "id",
            "chunk_idx",
            F.size("_c").alias("n_tokens"),
            F.array_join("_c", " ").alias("chunk"),
        )
    )


def inverted_index(
    docs: DataFrame,
    k_postings: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Capped inverted index: per term, its document frequency and the
    top ``k_postings`` postings by (tf DESC, doc_id ASC) — the retrieval-
    side artifact (search / RAG-corpus indexing) next to the doc-side
    tfidf_top_terms.

    The cap is the scale decision: UNCAPPED postings lists for stopword
    terms are the classic hot key ('the' posts in every doc — one group
    holding the corpus). df stays exact for every term (one map-side-
    combined aggregate); the postings list is truncated to the k highest-
    tf docs via operators/graph.sparsify_topk's two-phase salted window,
    so even a term posting in 10^9 docs never serializes one task.
    Returns (term, df, rank, doc_id, tf), rank 1..k within term."""
    from pyspark.sql import Window

    from parconnect_spark.cache import scoped_persist
    from parconnect_spark.operators.graph import sparsify_topk

    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens_col(F.col(text_col))).alias("term"),
    )
    postings = toks.groupBy("term", "doc_id").agg(
        F.count(F.lit(1)).alias("tf")
    )
    postings = scoped_persist(postings)
    dfc = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    top = sparsify_topk(
        postings, k_postings, src="term", dst="doc_id", weight="tf"
    ).select(
        F.col("src").alias("term"),
        F.col("dst").alias("doc_id"),
        F.col("weight").alias("tf"),
    )
    w = Window.partitionBy("term").orderBy(F.desc("tf"), F.asc("doc_id"))
    return (
        top.withColumn("rank", F.row_number().over(w))
        .join(dfc, "term")
        .select("term", "df", "rank", "doc_id", "tf")
    )


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Okapi BM25 relevance of every matching doc for a fixed query —
    the retrieval scorer over the same whitespace-token universe as
    ``inverted_index`` (this is the scoring half; the index is the
    candidate-lookup half).

        score(d) = Σ_{t∈q} idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·|d|/avg|d|))
        idf(t)   = ln(1 + (N − df + 0.5)/(df + 0.5))

    Scale shape: tokens are filtered to the query's terms at the explode
    (predicate on a literal array — the scan never materializes
    non-query tokens into the aggregate), df/N/avg_len are three scalar
    map-side-combined aggregates, and the per-doc score is one grouped
    sum over ≤|q| term contributions. Only docs containing ≥1 query term
    appear. Returns (id, score) rounded to 6dp."""
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    q = [t for t in dict.fromkeys(query_terms)]  # dedupe, keep order
    base = docs.select(
        F.col(id_col).alias("id"), tokens_col(F.col(text_col)).alias("_toks")
    )
    stats = base.agg(
        F.count(F.lit(1)).alias("_n"), F.avg(F.size("_toks")).alias("_avg")
    )
    toks = base.select(
        "id",
        F.size("_toks").alias("_len"),
        F.explode("_toks").alias("term"),
    ).where(F.col("term").isin(q))
    tf = toks.groupBy("id", "_len", "term").agg(
        F.count(F.lit(1)).alias("_tf")
    )
    dfc = tf.groupBy("term").agg(F.count(F.lit(1)).alias("_df"))
    contrib = (
        tf.join(F.broadcast(dfc), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "id",
            (
                F.log(
                    F.lit(1.0)
                    + (F.col("_n") - F.col("_df") + 0.5)
                    / (F.col("_df") + 0.5)
                )
                * (F.col("_tf") * (k1 + 1))
                / (
                    F.col("_tf")
                    + k1
                    * (1 - b + b * F.col("_len") / F.col("_avg"))
                )
            ).alias("_c"),
        )
    )
    return contrib.groupBy("id").agg(
        F.round(F.sum("_c"), 6).alias("score")
    )


def fuzzy_pairs(
    strings: DataFrame,
    max_dist: int = 1,
    q: int = 3,
    col: str = "s",
) -> DataFrame:
    """Edit-distance self-join: distinct string pairs (a < b) with
    levenshtein(a, b) <= ``max_dist`` — the entity-resolution primitive
    (near-identical tool names, misspelled entities, drifting ids).

    Sound blocking, no all-pairs scan on the long tail: an edit destroys
    at most q q-grams, so two strings of length >= q·(max_dist+1) within
    distance ``max_dist`` MUST share a q-gram — long-string candidates
    come from a shared-q-gram equi-join (rarest keys dominate, same
    sparsity argument as shingle dedup). Strings shorter than that bound
    can't rely on the lemma and instead pair within length buckets
    (|len(a)−len(b)| <= max_dist); that residual is bounded by the
    alphabet — there are at most |Σ|^(q(d+1)−1) short DISTINCT strings,
    and the join runs on distinct values. Both candidate streams apply
    the length filter, then one exact levenshtein verify.

    Returns (a, b, dist). Input rows are deduplicated on ``col``."""
    if max_dist < 1:
        raise ValueError("max_dist must be >= 1")
    s = strings.select(F.col(col).alias("s")).distinct()
    s = s.withColumn("_len", F.length("s"))
    min_long = q * (max_dist + 1)
    long_s = s.where(F.col("_len") >= min_long)
    short_s = s.where(F.col("_len") < min_long)

    grams = long_s.select(
        "s",
        "_len",
        F.explode(
            F.expr(
                f"transform(sequence(1, greatest(length(s) - {q - 1}, 0)),"
                f" i -> substring(s, i, {q}))"
            )
        ).alias("g"),
    ).distinct()
    ga = grams.select(F.col("s").alias("a"), F.col("_len").alias("_la"), "g")
    gb = grams.select(F.col("s").alias("b"), F.col("_len").alias("_lb"), "g")
    cand_long = (
        ga.join(gb, "g")
        .where(F.col("a") < F.col("b"))
        .where(F.abs(F.col("_la") - F.col("_lb")) <= max_dist)
        .select("a", "b")
        .distinct()
    )
    sa = short_s.select(F.col("s").alias("a"), F.col("_len").alias("_la"))
    sb = short_s.select(F.col("s").alias("b"), F.col("_len").alias("_lb"))
    cand_short = (
        sa.join(
            sb,
            (F.col("a") < F.col("b"))
            & (F.abs(F.col("_la") - F.col("_lb")) <= max_dist),
        )
        .select("a", "b")
    )
    # cross-bucket pairs (one short, one long): only possible when the
    # longer is < min_long + max_dist; pair the boundary band explicitly
    band = s.where(
        (F.col("_len") >= min_long)
        & (F.col("_len") < min_long + max_dist)
    ).select(F.col("s").alias("b"), F.col("_len").alias("_lb"))
    cand_cross = (
        sa.join(
            band,
            (F.abs(F.col("_la") - F.col("_lb")) <= max_dist),
        )
        .select(
            F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
        )
        .distinct()
    )
    cands = cand_long.unionByName(cand_short).unionByName(cand_cross).distinct()
    return cands.select(
        "a", "b", F.levenshtein("a", "b").alias("dist")
    ).where(F.col("dist") <= max_dist)


def readability_features(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Flesch-style readability per doc from three deterministic,
    engine-replicable proxies: words = whitespace tokens, sentences =
    [.!?] runs (min 1), syllables = vowel GROUPS per word (the standard
    regex proxy — exact syllabification needs a dictionary; the proxy is
    the declared metric, same stance as the language-ID heuristic).

        flesch = 206.835 − 1.015·(words/sentences)
                         − 84.6·(syllables/words)

    One narrow projection — regexp counts, no shuffle. Returns
    (id, n_words, n_sentences, n_syllables, flesch) at 6dp."""
    toks = tokens_col(F.col(text_col))
    words = F.size(toks)
    sentences = F.greatest(
        F.lit(1),
        F.size(F.filter(F.split(F.col(text_col), r"[.!?]+"), lambda s: s != "")),
    )
    # vowel groups across the whole text == sum of per-word groups
    syll = F.size(
        F.filter(
            F.split(F.lower(F.col(text_col)), r"[^aeiouy]+"),
            lambda s: s != "",
        )
    )
    flesch = (
        F.lit(206.835)
        - F.lit(1.015) * (words / sentences)
        - F.lit(84.6) * (syll / F.greatest(words, F.lit(1)))
    )
    return docs.select(
        F.col(id_col).alias("id"),
        words.alias("n_words"),
        sentences.alias("n_sentences"),
        syll.alias("n_syllables"),
        F.round(flesch, 6).alias("flesch"),
    ).where(words > 0)


def rrf_fuse(
    rank_a: DataFrame,
    rank_b: DataFrame,
    key: str = "id",
    rank_col: str = "rank",
    k: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion of two rankings over the same key space —
    the standard hybrid-retrieval combiner (lexical × semantic, or
    relevance × quality): rrf = Σ_r 1/(k + rank_r), items missing from
    one ranking simply contribute nothing (the property that makes RRF
    robust to incomparable score scales — it reads only ranks).

    One full-outer join + one arithmetic projection; the output rank is
    a total order via the (score DESC, key ASC) tiebreak (the
    rank_correlation stability convention). Returns
    (id, rrf_score, fused_rank)."""
    from pyspark.sql import Window

    a = rank_a.select(
        F.col(key).alias("id"), F.col(rank_col).alias("_ra")
    )
    b = rank_b.select(
        F.col(key).alias("id"), F.col(rank_col).alias("_rb")
    )
    j = a.join(b, "id", "full_outer")
    score = F.round(
        F.coalesce(1.0 / (F.lit(k) + F.col("_ra")), F.lit(0.0))
        + F.coalesce(1.0 / (F.lit(k) + F.col("_rb")), F.lit(0.0)),
        6,
    )
    w = Window.orderBy(F.desc("rrf_score"), F.asc("id"))
    return (
        j.select("id", score.alias("rrf_score"))
        .withColumn("fused_rank", F.row_number().over(w))
    )


def ks_drift(
    docs: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact two-sample Kolmogorov–Smirnov statistic between every pair
    of groups over the token-count distribution — the distribution-
    drift monitor for corpus composition ("is source B's length profile
    diverging from A's"). KS = max_x |F_a(x) − F_b(x)| computed over
    the per-(group, length) COUNT table: cumulative windows partition
    by PAIR over the value grid (bounded by distinct lengths × pairs —
    groups are a dimension, lengths are small integers; nothing scales
    with doc count past the census aggregate). Exact rational
    arithmetic until the final 6dp rounding. Returns
    (source_a, source_b, ks, n_a, n_b)."""
    from pyspark.sql import Window

    x = F.size(tokens_col(F.col(text_col)))
    v = docs.select(F.col(group_col).alias("g"), x.alias("x"))
    cnt = v.groupBy("g", "x").agg(F.count(F.lit(1)).alias("n"))
    groups = sorted(r["g"] for r in cnt.select("g").distinct().collect())
    spark = docs.sparkSession
    pairs = spark.createDataFrame(
        [(a, b) for i, a in enumerate(groups) for b in groups[i + 1 :]],
        "ga string, gb string",
    )
    grid = pairs.crossJoin(cnt.select("x").distinct())
    ca = cnt.select(F.col("g").alias("ga"), "x", F.col("n").alias("na"))
    cb = cnt.select(F.col("g").alias("gb"), "x", F.col("n").alias("nb"))
    tots = cnt.groupBy("g").agg(F.sum("n").alias("t"))
    filled = (
        grid.join(ca, ["ga", "x"], "left")
        .join(cb, ["gb", "x"], "left")
        .select(
            "ga",
            "gb",
            "x",
            F.coalesce("na", F.lit(0)).alias("na"),
            F.coalesce("nb", F.lit(0)).alias("nb"),
        )
    )
    w = (
        Window.partitionBy("ga", "gb")
        .orderBy("x")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = filled.select(
        "ga",
        "gb",
        F.sum("na").over(w).alias("ca"),
        F.sum("nb").over(w).alias("cb"),
    )
    ta = tots.select(F.col("g").alias("ga"), F.col("t").alias("_ta"))
    tb = tots.select(F.col("g").alias("gb"), F.col("t").alias("_tb"))
    return (
        cum.join(F.broadcast(ta), "ga")
        .join(F.broadcast(tb), "gb")
        .groupBy("ga", "gb", "_ta", "_tb")
        .agg(
            F.round(
                F.max(
                    F.abs(
                        F.col("ca") / F.col("_ta")
                        - F.col("cb") / F.col("_tb")
                    )
                ),
                6,
            ).alias("ks")
        )
        .select(
            F.col("ga").alias("source_a"),
            F.col("gb").alias("source_b"),
            "ks",
            F.col("_ta").alias("n_a"),
            F.col("_tb").alias("n_b"),
        )
    )


def token_entropy(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Shannon entropy (nats) of the token distribution per group — the
    DIVERSITY monitor next to ks_drift's shape monitor: a source whose
    entropy collapses is templating/boilerplating even if its length
    profile holds. H = −Σ p·ln p over the per-(group, token) census;
    both aggregates map-side combinable, nothing scales past the
    census. Returns (group, n_tokens, n_distinct, entropy) at 6dp."""
    toks = docs.select(
        F.col(group_col).alias("g"),
        F.explode(tokens_col(F.col(text_col))).alias("t"),
    )
    cnt = toks.groupBy("g", "t").agg(F.count(F.lit(1)).alias("n"))
    tot = cnt.groupBy("g").agg(
        F.sum("n").alias("_tot"), F.count(F.lit(1)).alias("n_distinct")
    )
    p = F.col("n") / F.col("_tot")
    return (
        cnt.join(tot, "g")
        .groupBy("g", "_tot", "n_distinct")
        .agg(F.round(-F.sum(p * F.log(p)), 6).alias("entropy"))
        .select(
            F.col("g").alias("group"),
            F.col("_tot").alias("n_tokens"),
            "n_distinct",
            "entropy",
        )
    )

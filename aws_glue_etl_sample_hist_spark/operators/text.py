"""Text-analysis operators for LLM-data pipelines (north-star extension,
BASELINE.json): tokenization, quality scoring, language ID, fingerprinting.

Everything here is built from JVM-side expressions (split / transform /
aggregate / regexp) -- no Python UDFs in the hot path, so the whole stage
stays inside whole-stage codegen and scales linearly with executors. All
constructs have exact DuckDB equivalents, which is what lets every one of
these ship with a SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

TOKEN_PATTERN = r"\s+"

# tiny function-word sets for the language-vote heuristic (public knowledge)
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "is", "to", "in"],
    "fr": ["le", "la", "les", "de", "et", "un", "une"],
    "es": ["el", "los", "de", "y", "un", "una", "que"],
    "de": ["der", "die", "das", "und", "ein", "zu", "ist"],
}
CJK_PATTERN = "[\\u4e00-\\u9fff]"

QUALITY_STOPWORDS = ["the", "a", "of", "and", "is"]


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization; `split(trim(x), '\\s+')` has the same
    semantics in Spark and DuckDB (regexp_split_to_array)."""
    return F.split(F.trim(col), TOKEN_PATTERN)


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col)).cast("long")


def sum_token_lengths(toks: Column) -> Column:
    """Total characters across tokens via a fold -- O(n) per row, JVM-side."""
    return F.aggregate(
        F.transform(toks, lambda t: F.length(t).cast("long")), F.lit(0).cast("long"), lambda a, x: a + x
    )


def stopword_count(toks: Column, words: list[str]) -> Column:
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t))).cast("long")


def subword_token_estimate(toks: Column) -> Column:
    """BPE-ish token-count estimator: ceil(len/4) per word (the ~4 chars per
    subword rule of thumb), summed. Deterministic, SQL-expressible; a real
    tokenizer would slot in as a pandas_udf behind the same column contract."""
    return F.aggregate(
        F.transform(toks, lambda t: F.ceil(F.length(t) / 4.0).cast("long")),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )


def lang_guess(text_col: Column, toks: Column) -> Column:
    """N-gram/function-word language vote: CJK codepoints -> zh, else the
    stopword set with the most hits wins (ties broken by fixed precedence
    en > fr > es > de), no hits -> 'unknown'."""
    votes = {lang: stopword_count(toks, words) for lang, words in LANG_STOPWORDS.items()}
    best = F.greatest(*votes.values())
    guess = (
        F.when(text_col.rlike(CJK_PATTERN), F.lit("zh"))
        .when(best == 0, F.lit("unknown"))
        .when(votes["en"] == best, F.lit("en"))
        .when(votes["fr"] == best, F.lit("fr"))
        .when(votes["es"] == best, F.lit("es"))
        .otherwise(F.lit("de"))
    )
    return guess


def word_shingles(toks: Column, n: int) -> Column:
    """All n-token shingles as strings (docs shorter than n collapse to the
    full text as a single shingle). slice+concat_ws measured 2.5x faster
    than per-position element_at (which re-evaluates the array expression
    per lookup inside the transform lambda)."""
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )


def min_shingle_fingerprint(toks: Column, n: int = 5) -> Column:
    """Rolling-hash-style document fingerprint: min md5 over n-token shingles.
    md5 is bit-identical across Spark/DuckDB/Presto, making the fingerprint
    portable across engines (unlike Spark's xxhash64/hash)."""
    return F.array_min(F.transform(word_shingles(toks, n), F.md5))


def repetition_stats(docs, n: int = 2, *, text_col: str = "text", id_col: str = "doc_id"):
    """Repetition quality signals per document (the duplicate-n-gram family
    of corpus filters): total/distinct shingle counts, duplicate-shingle
    ratio, and the most-frequent shingle's share. Boilerplate, keyword
    stuffing, and degenerate generations all light up these ratios.

    Shape: explode WITH duplicates (frequency is the signal) -> one
    groupBy(doc, shingle) with map-side partial counts -> one per-doc agg.
    Both shuffles key on high-cardinality (doc, shingle) / doc -- no skew.

    Ratios are emitted as integer basis points (x10^4, floor integer
    division) rather than rounded doubles: 10000*(a)/b DIV is exact and
    identical across Spark/DuckDB, while ROUND on a double has
    engine-dependent behavior at representation-boundary ties (the r3
    driver hash mismatch). The integer columns n_shingles/n_distinct/
    top_count fully determine the ratios anyway."""
    sh = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(word_shingles(tokens(F.col(text_col)), n)).alias("shingle"),
    )
    per = sh.groupBy("doc_id", "shingle").agg(F.count(F.lit(1)).alias("cnt"))
    return (
        per.groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("n_shingles"),
            F.count(F.lit(1)).alias("n_distinct"),
            F.max("cnt").alias("top_count"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_distinct",
            F.expr("(10000 * (n_shingles - n_distinct)) DIV n_shingles").alias("dup_ratio_bp"),
            "top_count",
            F.expr("(10000 * top_count) DIV n_shingles").alias("top_ratio_bp"),
        )
    )


# PII patterns: kept to syntax shared by Java regex (Spark) and RE2
# (DuckDB) -- \b, char classes, bounded repeats; no lookarounds/backrefs
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
    "phone": r"\b[0-9]{3}-[0-9]{3,4}-[0-9]{4}\b",
}


def chunk_documents(
    docs,
    window: int = 32,
    stride: int = 16,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Token-window chunking: split each document into overlapping
    ``window``-token chunks every ``stride`` tokens (the context-length
    packing step between a cleaned corpus and a tokenizer -- long docs
    become several training rows, the tail is kept as a short final chunk).

    Shape: one JVM `sequence` of chunk starts + one explode -- row count
    grows by ~n_tokens/stride, no shuffle. chunk_idx = (start-1)/stride is
    derived arithmetic (not posexplode ordinals), so the oracle computes it
    from the same generate_series. Each chunk's exact text is pinned by
    md5."""
    toks = tokens(F.col(text_col))
    # stop = 1 + ceil((n - window)/stride) * stride: the last start is the
    # FIRST one whose window reaches the end of the doc, so the tail tokens
    # always land in a (short) final chunk -- a plain (n - window + 1) stop
    # silently drops up to stride-1 trailing tokens whenever stride doesn't
    # divide (n - window)
    starts = F.sequence(
        F.lit(1),
        (
            F.ceil(F.greatest(F.size(toks) - window, F.lit(0)) / stride) * stride + 1
        ).cast("int"),
        F.lit(stride),
    )
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            toks.alias("_toks"),
            F.explode(starts).alias("start"),
        )
        .select(
            "doc_id",
            ((F.col("start") - 1) / stride).cast("long").alias("chunk_idx"),
            F.least(F.lit(window), F.size("_toks") - F.col("start") + 1)
            .cast("long")
            .alias("chunk_tokens"),
            F.md5(F.concat_ws(" ", F.slice("_toks", F.col("start"), F.lit(window))))
            .alias("chunk_md5"),
        )
    )


def pii_redact(docs, *, text_col: str = "text", id_col: str = "doc_id"):
    """PII scrub pass (the compliance stage every training corpus goes
    through before the tokenizer sees it): count and mask emails / IPv4s /
    phone numbers per document. Pure JVM regexp_count/regexp_replace --
    map-only, no shuffle, linear in bytes. Patterns are deliberately in the
    Java∩RE2 common dialect so the identical regex runs in the oracle.

    Output pins every redacted byte via md5(redacted) without shipping the
    text through the compare; counts make the scrub auditable (how much PII
    a source contains is itself a curation signal). Ordering of the
    replace chain is fixed (email -> ipv4 -> phone) since masks must not
    themselves be re-matched."""
    redacted = F.col(text_col)
    for kind, pat in PII_PATTERNS.items():
        redacted = F.regexp_replace(redacted, pat, f"<{kind}>")
    return docs.select(
        F.col(id_col).alias("doc_id"),
        *[
            F.regexp_count(F.col(text_col), F.lit(pat)).cast("long").alias(f"n_{kind}")
            for kind, pat in PII_PATTERNS.items()
        ],
        F.md5(redacted).alias("redacted_md5"),
    )


def token_dedup_stats(docs, *, text_col: str = "text", id_col: str = "doc_id"):
    """Within-document repetition trim: first-occurrence token dedup (the
    intra-doc counterpart of corpus-level dedup -- boilerplate menus,
    keyword stuffing, and looping generations repeat the same tokens many
    times). `array_distinct` preserves FIRST-occurrence order, so the
    trimmed document is deterministic and md5-pinnable. All JVM array ops,
    map-only."""
    toks = tokens(F.col(text_col))
    kept = F.array_distinct(toks)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(kept).cast("long").alias("n_kept"),
        F.round(1 - F.size(kept) / F.size(toks), 4).alias("trim_ratio"),
        F.md5(F.concat_ws(" ", kept)).alias("dedup_md5"),
    )


def bigram_lm(docs, *, text_col: str = "text", id_col: str = "doc_id"):
    """Corpus bigram LM as a (bigram, logp) table: p(w2|w1) =
    n(bigram)/n(w1). Vocab-sized -- at corpus scale this is the TRAINED
    ARTIFACT you persist once and broadcast into every scoring run."""
    bg_occ = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(word_shingles(tokens(F.col(text_col)), 2)).alias("bigram"),
    )
    lm = bg_occ.groupBy("bigram").agg(F.count(F.lit(1)).alias("n"))
    w1_tot = lm.select(
        F.split_part("bigram", F.lit(" "), F.lit(1)).alias("w1"), "n"
    ).groupBy("w1").agg(F.sum("n").alias("w1_n"))
    return lm.select(
        "bigram", F.split_part("bigram", F.lit(" "), F.lit(1)).alias("w1"), "n"
    ).join(F.broadcast(w1_tot), "w1").select(
        # ln(n / w1_n) in exactly this shape -- the oracle computes the
        # identical expression, so the doubles agree to the last bit
        "bigram", F.log(F.col("n") / F.col("w1_n")).alias("logp")
    )


def doc_perplexity(docs, *, lm=None, text_col: str = "text", id_col: str = "doc_id"):
    """Per-document perplexity under a bigram LM -- the n-gram-LM quality
    filter (CCNet-style): documents whose token transitions are unusual for
    the LM's training corpus score high and get reviewed or dropped. Per
    doc, avg_logp = mean ln p over its bigram OCCURRENCES (duplicates
    count) and ppl = exp(-avg_logp).

    ``lm=None`` self-scores: the LM is built from ``docs`` in the same
    plan, which scans the corpus twice (once for the LM, once to score) --
    fine for a one-shot audit, and every doc bigram exists in the LM so no
    smoothing term clouds the oracle. At 100 TB pass a PERSISTED
    `bigram_lm` table instead: scoring then reads the corpus once and
    broadcast-joins the vocab-sized LM; unseen bigrams would take an OOV
    floor via the join's null branch."""
    bg_occ = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(word_shingles(tokens(F.col(text_col)), 2)).alias("bigram"),
    )
    probs = lm if lm is not None else bigram_lm(docs, text_col=text_col, id_col=id_col)
    return (
        bg_occ.join(F.broadcast(probs.select("bigram", "logp")), "bigram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg("logp"), 6).alias("avg_logp"),
            F.round(F.exp(-F.avg("logp")), 4).alias("ppl"),
        )
    )


def tfidf_top_terms(docs, k: int = 3, *, text_col: str = "text", id_col: str = "doc_id"):
    """Top-k characteristic terms per document by tf-idf (ln(N/df) idf).

    Inverted-index shape: explode to (doc, term), one groupBy for term
    frequencies, one for document frequencies (broadcast back -- the
    vocabulary is tiny next to the corpus), window top-k per doc. The
    per-doc window partitions on the HIGH-cardinality doc key, so no
    low-cardinality window skew. N arrives via a broadcast 1-row aggregate,
    not a driver action, so the whole plan stays lazy. Scores are rounded
    to 6 dp in both engines, which absorbs ln() last-ulp differences."""
    tok = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(tokens(F.col(text_col))).alias("term")
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    # the 1-row corpus count joins the VOCAB-sized frame (|V| x 1 nested
    # loop -- the standard scalar join), never the corpus-sized tf frame;
    # idf lands per term once, then broadcasts into tf
    with_idf = dfreq.crossJoin(F.broadcast(n_docs)).select(
        "term", "df", F.log(F.col("n_docs") / F.col("df")).alias("idf")
    )
    scored = tf.join(F.broadcast(with_idf), "term").withColumn(
        "tfidf", F.round(F.col("tf") * F.col("idf"), 6)
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("doc_id", "term", "tf", "df", "tfidf", "rank")
    )


# Gopher-style quality rule thresholds (Rae et al. 2021 "Scaling Language
# Models" appendix A; C4's numeric/symbol screens): public heuristics, tuned
# here as defaults a caller can override per-corpus.
GOPHER_MIN_TOKENS = 50
GOPHER_MAX_TOKENS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 3.0
GOPHER_MAX_MEAN_WORD_LEN = 10.0
GOPHER_MIN_STOPWORD_HITS = 2
GOPHER_MAX_NUMERIC_FRAC = 0.2


def gopher_quality(
    docs,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = GOPHER_MIN_TOKENS,
    max_tokens: int = GOPHER_MAX_TOKENS,
    min_mean_word_len: float = GOPHER_MIN_MEAN_WORD_LEN,
    max_mean_word_len: float = GOPHER_MAX_MEAN_WORD_LEN,
    min_stopword_hits: int = GOPHER_MIN_STOPWORD_HITS,
    max_numeric_frac: float = GOPHER_MAX_NUMERIC_FRAC,
):
    """Gopher-style rule-based quality filter: per-document rule flags plus
    the conjunctive keep decision. The four rule families are the public
    Gopher/C4 heuristics -- document length bounds, mean-word-length band
    (screens minified/garbage text), required function-word presence
    (screens non-linguistic token streams), and numeric-token share
    (screens tables/serial dumps).

    Emitting the individual flags (not just `keep`) is deliberate: at
    curation time the per-rule rejection rates ARE the report a corpus
    owner reads before choosing thresholds.

    Shape: every signal is a JVM array/regexp expression over the token
    array -- map-only, no shuffle, whole-stage codegen end to end."""
    toks = tokens(F.col(text_col))
    out = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.round(sum_token_lengths(toks) / F.size(toks), 4).alias("mean_word_len"),
        stopword_count(toks, QUALITY_STOPWORDS).alias("stopword_hits"),
        F.round(
            F.size(F.filter(toks, lambda t: t.rlike(r"^[0-9]+$"))) / F.size(toks), 4
        ).alias("numeric_frac"),
    )
    rules = out.select(
        "*",
        ((F.col("n_tokens") >= min_tokens) & (F.col("n_tokens") <= max_tokens)).alias(
            "r_word_count"
        ),
        (
            (F.col("mean_word_len") >= min_mean_word_len)
            & (F.col("mean_word_len") <= max_mean_word_len)
        ).alias("r_mean_word_len"),
        (F.col("stopword_hits") >= min_stopword_hits).alias("r_stopwords"),
        (F.col("numeric_frac") <= max_numeric_frac).alias("r_numeric"),
    )
    return rules.select(
        "*",
        (
            F.col("r_word_count")
            & F.col("r_mean_word_len")
            & F.col("r_stopwords")
            & F.col("r_numeric")
        ).alias("keep"),
    )


def strip_repeated_chunks(
    docs,
    window: int = 16,
    max_df: int = 2,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Corpus-level boilerplate removal at chunk granularity (the
    paragraph-dedup stage of CCNet/RefinedWeb, adapted to token windows):
    split each document into NON-overlapping ``window``-token chunks, count
    each distinct chunk's document frequency across the corpus, strip every
    chunk appearing in >= ``max_df`` documents, and reassemble the
    surviving text in order. Headers, footers, cookie banners, and shared
    template paragraphs vanish while each document's unique content stays.

    Scale shape: one explode to (doc, chunk) rows, one groupBy on the
    HIGH-cardinality chunk hash for document frequencies, and the
    boilerplate set (df >= max_df is tiny by construction -- it IS the
    repeated matter) broadcasts back as a left join marker. Reassembly is
    a per-doc groupBy: collect_list of (idx, chunk) structs, array_sort,
    concat -- order restored without a window. Nothing corpus-sized ever
    sits on the driver.

    Non-overlapping windows (stride == window) make reassembly exact: the
    chunks partition the token list, so concatenating kept chunks in index
    order is the document minus its boilerplate."""
    toks = tokens(F.col(text_col))
    starts = F.sequence(
        F.lit(1), F.greatest(F.size(toks), F.lit(1)), F.lit(window)
    )
    from ._cache import tracked_persist

    # persist the (doc, chunk) frame (r14, guide §1.2): it feeds the hot-set
    # document-frequency agg AND the mark-and-reassemble join -- unpersisted,
    # the tokenize+chunk explode over the corpus ran once per consumer
    chunks = tracked_persist(
        docs.select(
            F.col(id_col).alias("doc_id"),
            toks.alias("_toks"),
            F.explode(starts).alias("start"),
        ).select(
            "doc_id",
            ((F.col("start") - 1) / window).cast("long").alias("chunk_idx"),
            F.concat_ws(" ", F.slice("_toks", F.col("start"), F.lit(window))).alias("chunk"),
        )
    )
    hot = (
        chunks.groupBy("chunk")
        .agg(F.countDistinct("doc_id").alias("chunk_df"))
        .filter(F.col("chunk_df") >= max_df)
    )
    marked = chunks.join(F.broadcast(hot), "chunk", "left")
    kept_struct = F.when(
        F.col("chunk_df").isNull(), F.struct(F.col("chunk_idx"), F.col("chunk"))
    )  # no otherwise: hot chunks yield NULL, which collect_list drops
    return (
        marked.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(F.when(F.col("chunk_df").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_kept"),
            F.array_sort(F.collect_list(kept_struct)).alias("_kept"),
        )
        .select(
            "doc_id",
            "n_chunks",
            "n_kept",
            F.md5(
                F.concat_ws(" ", F.transform(F.col("_kept"), lambda s: s.chunk))
            ).alias("clean_md5"),
        )
    )


def quality_stats(docs, *, text_col: str = "text", id_col: str = "doc_id"):
    """Per-document quality statistics + composite score over an ARBITRARY
    document frame (factored out of the sf-bound query so incremental
    pipelines can score a new crawl batch with byte-identical expressions).
    Columns: doc_id, lang, n_chars_measured, n_tokens, n_distinct_tokens,
    distinct_ratio, stopword_ratio, avg_token_len, quality_score."""
    from pyspark.sql import functions as F

    toks = tokens(F.col(text_col))
    d = docs.select(
        F.col(id_col).alias("doc_id"),
        "lang",
        F.length(text_col).cast("long").alias("n_chars_measured"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct_tokens"),
        stopword_count(toks, QUALITY_STOPWORDS).alias("n_stopwords"),
        sum_token_lengths(toks).alias("sum_token_len"),
    )
    # 4-dp rounding via floor(x*1e4 + 0.5)/1e4 rather than F.round: Spark's
    # round() HALF_UPs the double's SHORTEST DECIMAL REPR (BigDecimal via
    # Double.toString) while SQL engines round the exact binary value, so a
    # representation-boundary score (~1 doc in 5k) rounds differently across
    # engines (0.6588 vs 0.6587 -- the corpus_release sf0.1 red). The floor
    # form is plain double arithmetic both engines execute identically.
    def _r4(c):
        return F.floor(c * 10000.0 + 0.5) / 10000.0

    return d.select(
        "doc_id",
        "lang",
        "n_chars_measured",
        "n_tokens",
        "n_distinct_tokens",
        _r4(F.col("n_distinct_tokens") / F.col("n_tokens")).alias("distinct_ratio"),
        _r4(F.col("n_stopwords") / F.col("n_tokens")).alias("stopword_ratio"),
        _r4(F.col("sum_token_len") / F.col("n_tokens")).alias("avg_token_len"),
        _r4(
            0.4 * (F.col("n_distinct_tokens") / F.col("n_tokens"))
            + 0.3 * (1 - F.col("n_stopwords") / F.col("n_tokens"))
            + 0.3 * F.least(F.col("n_tokens") / 100.0, F.lit(1.0))
        ).alias("quality_score"),
    )


def word_entropy_stats(docs, *, text_col: str = "text", id_col: str = "doc_id"):
    """Per-document unigram Shannon entropy (nats) + type/token ratio -- the
    information-density quality signal (low entropy = template/boilerplate,
    a standard pre-training screen alongside the repetition stats above).

    entropy(d) = -sum_t (c_t/n) * ln(c_t/n) over the doc's word frequencies.

    Scale shape: explode -> groupBy(doc, term) -> groupBy(doc); both
    shuffles key on the HIGH-cardinality doc id (term only disambiguates
    within a doc), so partial aggregation collapses each doc's tokens
    map-side and no low-cardinality skew exists. Rounded to 6 dp in both
    engines to absorb ln() last-ulp differences."""
    from pyspark.sql import functions as F

    per_term = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(tokens(F.lower(F.col(text_col)))).alias("term"),
        )
        .filter(F.col("term") != "")
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return per_term.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.round(F.count(F.lit(1)) / F.sum("c"), 6).alias("type_token_ratio"),
        F.round(
            -F.sum(F.col("c") * F.log(F.col("c"))) / F.sum("c")
            + F.log(F.sum("c")),
            6,
        ).alias("entropy_nats"),
    )


HASH_CLS_BUCKETS = 256


def hashed_linear_score(docs, *, text_col: str = "text", id_col: str = "doc_id"):
    """Model inference at corpus scale: a hashing-trick linear classifier
    (Weinberger et al. 2009 feature hashing; the fastText-style quality
    filter shape) scored entirely JVM-side -- tokens hash into
    HASH_CLS_BUCKETS buckets, the weight vector is DERIVED from md5 (a
    stand-in for trained weights with the same plan shape), and
    score = sigmoid(sum_b w[b] * count_b / n_tokens).

    Scale shape: the weight "model" is a bucket-count-sized frame built
    from spark.range -- broadcast like any small dim; the feature agg
    shuffles (doc, bucket) with map-side combine; scoring is one more
    doc-keyed agg. Swapping in REAL trained weights is a one-line change
    (read them from parquet instead of deriving from md5) -- the plan, and
    therefore the 100 TB behavior, is identical. Everything is md5/exp
    arithmetic that DuckDB reproduces bit-for-bit, so this ships with an
    exact oracle.

    Returns (doc_id, n_tokens, score, keep)."""
    from pyspark.sql import functions as F

    spark = docs.sparkSession
    weights = spark.range(HASH_CLS_BUCKETS).select(
        F.col("id").cast("long").alias("bucket"),
        (
            F.conv(F.substring(F.md5(F.concat(F.lit("w_"), F.col("id"))), 1, 8), 16, 10)
            .cast("long")
            / F.lit(4294967295.0)
            * 2.0
            - 1.0
        ).alias("w"),
    )
    feats = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(tokens(F.lower(F.col(text_col)))).alias("term"),
        )
        .filter(F.col("term") != "")
        .select(
            "doc_id",
            (
                F.conv(F.substring(F.md5(F.col("term")), 1, 8), 16, 10).cast("long")
                % HASH_CLS_BUCKETS
            ).alias("bucket"),
        )
        .groupBy("doc_id", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    z = (
        feats.join(F.broadcast(weights), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_tokens"),
            (F.sum(F.col("w") * F.col("c")) / F.sum("c")).alias("_z"),
        )
    )
    return z.select(
        "doc_id",
        "n_tokens",
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("_z") * 10.0)), 6).alias("score"),
        (F.col("_z") > 0).alias("keep"),
    )


def skipgram_pairs(
    docs: DataFrame,
    window: int = 2,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """word2vec training-pair generation (Mikolov et al. 2013): every
    (center, context) token pair with 1 <= |i - j| <= ``window``,
    aggregated to corpus-wide pair counts -- the data-prep stage that
    turns a text corpus into skip-gram training examples (and the input
    to SGNS's unigram negative-sampling tables).

    Scale shape: pair generation is ONE higher-order expression inside the
    scan (transform over token indices x offsets, nulls filtered --
    map-only, whole-stage codegen, no self-join and no shuffle of text);
    the only shuffle is the final (center, context) count agg, bounded by
    vocab^2 not corpus size, map-side combined."""
    w = int(window)
    toks_df = docs.select(tokens(F.col(text_col)).alias("toks"))
    pairs = F.expr(
        f"""
        flatten(transform(toks, (c, i) ->
            filter(
                transform(sequence({-w}, {w}), o ->
                    CASE WHEN o != 0 AND i + o >= 0 AND i + o < size(toks)
                         THEN struct(c AS center, toks[i + o] AS context)
                    END),
                p -> p IS NOT NULL)))
        """
    )
    return (
        toks_df.select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.center").alias("center"), F.col("p.context").alias("context"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


def _kn_scored_bigrams(
    docs,
    *,
    discount: float = 0.75,
    train_frac: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    salt: str = "knsplit",
    eval_only: bool = True,
):
    """Shared KN machinery: the per-bigram-occurrence frame scored under
    the train-split LM -- (doc_id, lang, _train, p_kn, p_lap). The LM is
    ALWAYS fit on the train split; ``eval_only`` controls whether only
    held-out bigrams are scored (the perplexity experiment) or every
    doc's (the CCNet-style per-document filter). Count tables and
    calibration scalars as documented on kn_bigram_perplexity."""
    from .sampling import SAMPLE_MOD, sample_hash

    is_train = sample_hash(F.col(id_col), salt) < int(train_frac * SAMPLE_MOD)
    base = docs.select(
        F.col(id_col), F.col(lang_col).alias("lang"), F.col(text_col)
    ).withColumn("_train", is_train)
    bg = base.select(
        id_col,
        "lang",
        "_train",
        F.explode(word_shingles(tokens(F.col(text_col)), 2)).alias("bigram"),
    ).select(
        id_col,
        "lang",
        "_train",
        "bigram",
        F.split_part("bigram", F.lit(" "), F.lit(1)).alias("w1"),
        F.split_part("bigram", F.lit(" "), F.lit(2)).alias("w2"),
    )
    train = bg.filter("_train")
    from ._cache import tracked_persist

    # the bigram-type table feeds FOUR consumers (broadcast into the eval
    # join, the continuation counts, and both calibration scalars below)
    # -- persist it so the corpus-scale groupBy shuffle happens once;
    # w1/w2 functionally depend on bigram, so the extra keys don't change
    # the grouping cardinality
    c_bg_typed = tracked_persist(
        train.groupBy("bigram", "w1", "w2").agg(F.count(F.lit(1)).alias("c"))
    )
    c_bg = c_bg_typed.select("bigram", "c")
    # w1 stats from the persisted TYPE table, not a second corpus pass
    # (r14): c1 = occurrence count of w1 as a first word = SUM of its
    # types' occurrence counts; n1fw = N1+(w1, .) = its number of rows in
    # the type table (each row is one distinct (w1, w2)). Value-identical
    # to the old corpus-scale groupBy over `train`, but vocab^2-bounded.
    w1_stats = c_bg_typed.groupBy("w1").agg(
        F.sum("c").alias("c1"),
        F.count(F.lit(1)).alias("n1fw"),
    )
    # N1+(., w2) = #distinct w1 preceding w2 = that w2's rows in the TYPE
    # table (formerly its own corpus-scale distinct shuffle)
    w2_cont = c_bg_typed.groupBy("w2").agg(F.count(F.lit(1)).alias("n1l"))
    # bounded calibration scalars: bigram TYPE count and train vocab size,
    # FUSED into one job over the (vocab^2-bounded, Heaps-sublinear)
    # bigram-type table -- formerly two separate corpus-scale distinct
    # shuffles (round-7 verdict item 3). Every occurring word appears in
    # some bigram type, so the word set derived from types equals the one
    # derived from occurrences; each type contributes exactly 2 word slots
    # so t_types = slot_count / 2.
    scal = (
        c_bg_typed.select(
            F.explode(F.array(F.col("w1"), F.col("w2"))).alias("w")
        )
        .agg(
            (F.count(F.lit(1)) / 2).cast("long").alias("t"),
            F.count_distinct("w").alias("v"),
        )
        .collect()[0]
    )
    t_types, v_train = scal.t, scal.v
    ev = bg.filter(~F.col("_train")) if eval_only else bg
    joined = (
        ev.join(F.broadcast(c_bg), "bigram", "left")
        .join(F.broadcast(w1_stats), "w1", "left")
        .join(F.broadcast(w2_cont), "w2", "left")
    )
    pcont = (F.coalesce("n1l", F.lit(0)) + 1) / F.lit(
        float(t_types + v_train + 1)
    )
    disc = F.when(
        F.col("c").isNotNull(),
        F.greatest(F.col("c") - discount, F.lit(0.0)) / F.col("c1"),
    ).otherwise(F.lit(0.0))
    lam = F.when(
        F.col("c1").isNotNull(), discount * F.col("n1fw") / F.col("c1")
    ).otherwise(F.lit(1.0))
    p_kn = disc + lam * pcont
    p_lap = F.when(
        F.col("c1").isNotNull(),
        (F.coalesce("c", F.lit(0)) + 1) / (F.col("c1") + v_train + 1),
    ).otherwise(F.lit(1.0 / (v_train + 1)))
    return joined.select(
        id_col, "lang", "_train", p_kn.alias("p_kn"), p_lap.alias("p_lap")
    )


def kn_bigram_perplexity(
    docs,
    *,
    discount: float = 0.75,
    train_frac: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    salt: str = "knsplit",
):
    """Interpolated Kneser-Ney bigram LM (Kneser & Ney 1995; the formula
    as in Chen & Goodman 1999 eq. 4.24) trained on a deterministic
    hash-split of the corpus and evaluated as held-out perplexity per
    language, beside an add-one (Laplace) baseline -- the classic "is
    this smoothing worth it" experiment, run at corpus scale:

      P_KN(w2|w1) = max(c(w1 w2) - D, 0) / c(w1)
                    + D * N1+(w1,.) / c(w1) * Pcont(w2)
      Pcont(w2)   = (N1+(., w2) + 1) / (N1+(., .) + V + 1)

    (continuation probability add-one smoothed so held-out OOV words
    stay finite; unseen w1 backs off to Pcont alone). Every count table
    is vocab-bounded and broadcast; the two corpus-wide scalars (bigram
    type count N1+(.,.), train vocab V) arrive in ONE bounded job over
    the persisted bigram-TYPE table. Deterministic closed-form
    arithmetic end to end, so the DuckDB oracle recomputes it EXACTLY --
    including the per-language perplexities and verdicts.

    Returns (lang, n_eval_bigrams, ppl_kn, ppl_laplace,
    kn_beats_laplace), ppl = exp(-avg ln p) over eval bigram
    occurrences."""
    scored = _kn_scored_bigrams(
        docs,
        discount=discount,
        train_frac=train_frac,
        text_col=text_col,
        id_col=id_col,
        lang_col=lang_col,
        salt=salt,
        eval_only=True,
    )
    return (
        scored.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_eval_bigrams"),
            F.round(F.exp(-F.avg(F.log("p_kn"))), 4).alias("ppl_kn"),
            F.round(F.exp(-F.avg(F.log("p_lap"))), 4).alias("ppl_laplace"),
        )
        .withColumn(
            "kn_beats_laplace", F.col("ppl_kn") < F.col("ppl_laplace")
        )
    )


def kn_doc_perplexity_buckets(
    docs,
    *,
    n_buckets: int = 3,
    discount: float = 0.75,
    train_frac: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    salt: str = "knsplit",
):
    """CCNet-style LM quality bucketing (Wenzek et al. 2020, LREC --
    CCNet sec. 3.3): score EVERY document's perplexity under the
    train-split Kneser-Ney bigram LM, then split each language into
    ``n_buckets`` equal-count buckets by perplexity rank -- head (most
    fluent), middle, tail. The canonical "keep head+middle, drop or
    re-weight tail" curation gate, with a counting LM standing in for
    CCNet's KenLM 5-gram (same statistics family, same plan shape).

    Bucketing is NTILE over (ppl, doc_id) per language -- rank-based, so
    it needs no cross-engine percentile semantics and the oracle
    recomputes it EXACTLY. The per-language sort is bounded by that
    language's doc count; at 100 TB swap NTILE for approx_percentile
    cuts (one expression) if a single language dominates. Documents with
    fewer than two tokens contribute one degenerate shingle (the full
    text, w2 = '' -- word_shingles' documented collapse, shared with
    kn_bigram_perplexity), so they are scored, not dropped.

    Returns (doc_id, lang, n_bigrams, ppl_kn, bucket, bucket_label)."""
    scored = _kn_scored_bigrams(
        docs,
        discount=discount,
        train_frac=train_frac,
        text_col=text_col,
        id_col=id_col,
        lang_col=lang_col,
        salt=salt,
        eval_only=False,
    )
    per_doc = scored.groupBy(id_col, "lang").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(F.exp(-F.avg(F.log("p_kn"))), 4).alias("ppl_kn"),
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("lang").orderBy(
        F.col("ppl_kn").asc(), F.col(id_col).asc()
    )
    b = F.ntile(n_buckets).over(w)
    label = (
        F.when(b == 1, "head")
        .when(b == n_buckets, "tail")
        .otherwise("middle")
    )
    return per_doc.select(
        id_col,
        "lang",
        "n_bigrams",
        "ppl_kn",
        b.cast("long").alias("bucket"),
        label.alias("bucket_label"),
    )


def kn_doc_perplexity_bucket_cuts(
    docs,
    *,
    n_buckets: int = 3,
    accuracy: int = 10_000,
    discount: float = 0.75,
    train_frac: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    salt: str = "knsplit",
):
    """Scale twin of kn_doc_perplexity_buckets (the CCNet head/middle/tail
    gate, Wenzek et al. 2020) with the per-language single-task sort
    designed OUT.

    Why the NTILE twin dies at 100 TB: ``NTILE(3) OVER (PARTITION BY lang
    ORDER BY ppl)`` sorts each language inside ONE task, and on a real
    crawl one language is ~half the corpus -- a single-task sort of
    ~50 TB of scores. Here the per-language cut points come from
    ``percentile_approx`` -- a mergeable Greenwald-Khanna sketch computed
    by ordinary partial aggregation (map-side combine, one shuffle of
    SKETCH OBJECTS, never of rows) -- and bucket assignment is a
    broadcast join of the tiny (n_langs x (n_buckets-1)) cut table plus
    n_buckets-1 comparisons per row. Nothing in this plan sorts a
    language on one task (plan-asserted in tests/test_plans.py).

    Tie rule: ppl_kn == cut stays in the LOWER bucket. With ``accuracy``
    >= the largest language's doc count the sketch is sample-exact, so
    bucket counts match the rank buckets up to ties at the cut values;
    at crawl scale the guarantee degrades gracefully to rank error
    <= n/accuracy per cut -- the contract `corpus_ccnet_buckets_cuts`
    row checks balance within that tolerance, not exact membership.

    Returns the SAME schema as the exact twin:
    (doc_id, lang, n_bigrams, ppl_kn, bucket, bucket_label)."""
    scored = _kn_scored_bigrams(
        docs,
        discount=discount,
        train_frac=train_frac,
        text_col=text_col,
        id_col=id_col,
        lang_col=lang_col,
        salt=salt,
        eval_only=False,
    )
    from ._cache import tracked_persist

    # per_doc feeds BOTH the sketch aggregate and the bucket-assignment
    # join (r15, guide §1.2): unpersisted, the whole KN scoring pass --
    # the expensive corpus tokenize + bigram explode + three broadcast
    # joins -- executed once per consumer
    per_doc = tracked_persist(
        scored.groupBy(id_col, "lang").agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.exp(-F.avg(F.log("p_kn"))), 4).alias("ppl_kn"),
        )
    )
    probs = [i / n_buckets for i in range(1, n_buckets)]
    cuts = per_doc.groupBy("lang").agg(
        F.percentile_approx("ppl_kn", probs, accuracy).alias("_cuts")
    )
    joined = per_doc.join(F.broadcast(cuts), "lang")
    b = F.lit(1)
    for i in range(n_buckets - 1):
        b = b + F.when(F.col("ppl_kn") > F.col("_cuts")[i], 1).otherwise(0)
    label = (
        F.when(b == 1, "head")
        .when(b == n_buckets, "tail")
        .otherwise("middle")
    )
    return joined.select(
        id_col,
        "lang",
        "n_bigrams",
        "ppl_kn",
        b.cast("long").alias("bucket"),
        label.alias("bucket_label"),
    )


_WINNOW_POS_MOD = 1 << 20


def _winnow_selected(docs, *, k, w, text_col, id_col):
    """Shared winnowing selection: per-doc distinct packed keys
    (h * 2^20 - pos) of every window minimum, plus the per-doc gram
    count _n. Consumed by winnow_fingerprints (summary) and
    winnow_overlap_pairs (candidate join)."""
    from pyspark.sql.window import Window

    grams = docs.select(
        F.col(id_col),
        F.posexplode(word_shingles(tokens(F.col(text_col)), k)).alias(
            "_p0", "_g"
        ),
    ).select(
        id_col,
        (F.col("_p0") + 1).alias("_pos"),
        # positions must fit the packed key's low field; past 2^20 grams
        # the key would silently corrupt the decoded hash, so fail LOUD
        # (pos == 2^20 itself still decodes exactly: (h*M - M)/M + 1 = h)
        # hash clamped to >= 1 so the packed key is ALWAYS positive: a
        # zero hash (prob 2^-32 per gram) would make h*M - pos negative,
        # where Spark's long cast truncates toward zero but SQL engines
        # floor-divide -- a latent cross-engine decode divergence at
        # crawl scale. greatest(h, 1) keeps decode exact in both.
        F.when(
            F.col("_p0") + 1 <= _WINNOW_POS_MOD,
            F.greatest(
                F.conv(F.substring(F.md5("_g"), 1, 8), 16, 10).cast("long"),
                F.lit(1),
            )
            * _WINNOW_POS_MOD
            - (F.col("_p0") + 1),
        )
        .otherwise(
            F.raise_error(
                F.lit(
                    "winnowing position overflow: document has >= 2^20 "
                    "k-grams; chunk it (corpus_chunk) before fingerprinting"
                )
            )
        )
        .alias("_key"),
    )
    wdoc = Window.partitionBy(id_col)
    worder = Window.partitionBy(id_col).orderBy("_pos")
    return (
        grams.withColumn("_n", F.count(F.lit(1)).over(wdoc))
        .withColumn(
            "_win_min",
            F.min("_key").over(worder.rowsBetween(0, w - 1)),
        )
        # full windows only, except the single truncated window of a
        # shorter-than-w doc (pos 1)
        .filter(
            (F.col("_pos") <= F.col("_n") - F.lit(w) + 1)
            | (F.col("_pos") == 1)
        )
        .select(id_col, F.col("_n"), F.col("_win_min"))
        .distinct()
    )


def winnow_fingerprints(
    docs,
    *,
    k: int = 3,
    w: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken
    2003 -- the MOSS local-fingerprinting algorithm): hash every k-token
    shingle, slide a window of ``w`` consecutive hashes over each
    document, and in every window select the MINIMUM hash, rightmost
    position on ties (the paper's rule). The guarantee: any shared run
    of >= w + k - 1 tokens between two documents shares at least one
    selected fingerprint, at expected density 2/(w+1) of the grams --
    position-robust partial-overlap detection where min_shingle (one
    global min) detects only whole-document similarity.

    Engine-portable selection: each (hash, pos) is packed into ONE
    BIGINT key ``h * 2^20 - pos`` (positions are 1-based and bounded by
    2^20 per doc), so the per-window argmin-with-rightmost-tie is a
    plain MIN over the packed key -- identical integer arithmetic in
    Spark and SQL, and the per-doc fingerprint SET is exactly the
    distinct packed keys. Docs with fewer than ``w`` grams keep their
    single truncated window (one fingerprint), never zero.

    Scale shape: the sliding window partitions by doc_id and is bounded
    by document length -- the per-doc window family, never a corpus
    total order. Returns the per-doc summary (doc_id, n_grams, n_fp,
    density, fp_sum): fp_sum is the exact integer sum of the selected
    hashes, a value-level checksum of the fingerprint set."""
    sel = _winnow_selected(docs, k=k, w=w, text_col=text_col, id_col=id_col)
    h = (F.col("_win_min") / _WINNOW_POS_MOD).cast("long") + 1  # decode hash
    return (
        sel.groupBy(id_col, "_n")
        .agg(
            F.count(F.lit(1)).alias("n_fp"),
            F.sum(h).alias("fp_sum"),
        )
        .select(
            id_col,
            F.col("_n").alias("n_grams"),
            "n_fp",
            F.round(F.col("n_fp") / F.col("_n"), 4).alias("density"),
            "fp_sum",
        )
    )


def winnow_overlap_pairs(
    docs,
    *,
    k: int = 3,
    w: int = 4,
    min_shared: int = 2,
    max_df: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """MOSS-style partial-overlap candidate pairs: documents sharing
    >= ``min_shared`` winnowing fingerprints -- the join that surfaces
    PARTIAL plagiarism/boilerplate overlap (a shared paragraph inside
    otherwise-different documents), which whole-document Jaccard
    near-dup misses below its threshold.

    Scale shape: the inverted-index equi-join family -- fingerprints
    equi-join on their 32-bit HASH value (positions stripped, so the
    same passage matches at any offset), never an all-pairs comparison;
    ``max_df`` drops fingerprints shared by more than max_df docs (the
    template/boilerplate stop-fingerprint guard, same role as the
    shingle max_df in ngram_jaccard_pairs -- without it one hot
    fingerprint creates the ~n^2/2 pair bomb).

    Returns (doc_a, doc_b, n_shared), doc_a < doc_b."""
    from ._cache import tracked_persist

    # persist the per-doc fingerprint sets (r14): fp feeds the max_df hot
    # table AND both sides of the inverted-index self-join -- unpersisted,
    # the posexplode + two doc-partitioned windows in _winnow_selected
    # re-ran once per consumer (guide §1.2; the shingle-persist pattern)
    sel = _winnow_selected(docs, k=k, w=w, text_col=text_col, id_col=id_col)
    fp = tracked_persist(
        sel.select(
            F.col(id_col),
            ((F.col("_win_min") / _WINNOW_POS_MOD).cast("long") + 1).alias("_fp"),
        ).distinct()
    )
    if max_df is not None:
        hot = (
            fp.groupBy("_fp")
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") > max_df)
            .select("_fp")
        )
        fp = fp.join(hot, "_fp", "left_anti")
    a = fp.alias("a")
    b = fp.alias("b")
    return (
        a.join(
            b,
            (F.col("a._fp") == F.col("b._fp"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def winnow_pair_recall(
    docs,
    *,
    k: int = 3,
    w: int = 4,
    min_shared: int = 1,
    sample_frac: float | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Measured recall of winnowing fingerprint candidates against the
    EXACT shared-token-run truth -- the same accounting the MinHash path
    carries in lsh_pair_recall. Schleimer et al. 2003 guarantee: any two
    documents sharing a run of >= w + k - 1 consecutive tokens share at
    least one selected fingerprint; this row MEASURES that (recall must
    be exactly 1.0 in every bucket at min_shared=1 -- a theorem made a
    hash-checked number), and shows the recall COST of raising
    ``min_shared`` above 1 (the noise-suppression knob the production
    pair row uses at 2).

    Truth: pairs sharing >= 1 exact (w + k - 1)-token run, found by a
    distinct t-gram md5 equi-join (inverted index, never all-pairs),
    stratified by how many distinct runs they share (1 / 2-4 / 5-16 /
    17+ -- the overlap-size axis of the S-curve). Candidates:
    winnow_overlap_pairs at the same (k, w), no df guard (the guard's
    recall cost belongs to a sampled twin, as in the LSH family).

    Output: (run_bucket, n_true_pairs, n_hit, recall) per occupied
    bucket. Both sides are md5 arithmetic -- the oracle recomputes
    recall exactly. NOTE: like every exact-truth audit, the truth side
    is output-pair-bound by definition; measurement harness, not a
    production path. ``sample_frac`` is the production dial (the
    lsh_pair_recall pattern): BOTH sides restrict first to the same
    deterministic md5 doc sample (salt 'winrecall'), cutting pair cost
    to ~sample_frac^2 while per-bucket recall stays an unbiased
    estimate over sampled-doc pairs."""
    if sample_frac is not None:
        from .sampling import hash_sample

        docs = hash_sample(docs, sample_frac, key_col=id_col, salt="winrecall")
    t = w + k - 1
    from ._cache import tracked_persist

    # persist the truth side's t-gram frame: it feeds both sides of the
    # inverted-index self-join (r14; the same pattern as fp above)
    g = tracked_persist(
        docs.select(
            F.col(id_col),
            F.explode(
                F.array_distinct(
                    F.transform(
                        word_shingles(tokens(F.col(text_col)), t), F.md5
                    )
                )
            ).alias("_g"),
        )
    )
    a = g.alias("a")
    b = g.alias("b")
    truth = (
        a.join(
            b,
            (F.col("a._g") == F.col("b._g"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_runs"))
    )
    cand = winnow_overlap_pairs(
        docs,
        k=k,
        w=w,
        min_shared=min_shared,
        max_df=None,
        text_col=text_col,
        id_col=id_col,
    ).select("doc_a", "doc_b", F.lit(1).alias("_hit"))
    r = F.col("n_runs")
    bucket = (
        F.when(r == 1, "1")
        .when(r <= 4, "2-4")
        .when(r <= 16, "5-16")
        .otherwise("17+")
    )
    return (
        truth.join(cand, ["doc_a", "doc_b"], "left")
        .groupBy(bucket.alias("run_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_true_pairs"),
            F.sum(F.coalesce("_hit", F.lit(0))).alias("n_hit"),
            F.round(
                F.sum(F.coalesce("_hit", F.lit(0))) / F.count(F.lit(1)), 4
            ).alias("recall"),
        )
    )


def luhn_valid(digits: Column) -> Column:
    """Luhn checksum validity (ISO/IEC 7812) of a digit-only string
    column, as a pure JVM expression: from the RIGHTMOST digit, double
    every second digit (subtracting 9 when the double exceeds 9) and
    require the total to be divisible by 10. This is the standard
    false-positive filter behind credit-card PII scrubbing -- a regex
    finds card-LIKE digit runs, the checksum confirms them (a random
    digit run passes with p = 0.1, so the filter drops ~90% of regex
    noise before redaction). Identical arithmetic in SQL via
    generate_series + substr over the reversed string; empty or
    non-digit input yields NULL, never a false positive."""
    ds = F.split(F.reverse(digits), "")
    contrib = F.transform(
        ds,
        lambda ch, i: F.when(
            (i % 2) == 1,
            F.when(ch.cast("int") * 2 > 9, ch.cast("int") * 2 - 9).otherwise(
                ch.cast("int") * 2
            ),
        ).otherwise(ch.cast("int")),
    )
    total = F.aggregate(contrib, F.lit(0), lambda a, x: a + x)
    return F.when(
        (F.length(digits) >= 2) & digits.rlike("^[0-9]+$"),
        (total % 10) == 0,
    )

"""Sampling and shard-packing operators for LLM-data pipelines (north-star
extension): the selection/layout stages between a cleaned corpus and a
training run.

Scale design notes
------------------
- Sampling is HASH-based, never `rand()`: keep a row iff
  md5(salt:key) mod M < fraction*M. Map-only (no shuffle, no state),
  reproducible across runs/engines/partitionings, and stable under corpus
  growth -- a doc's fate never depends on which executor saw it. The same
  expression runs in DuckDB, so sampling ships with an exact oracle
  (`rand(seed)` does not: Spark seeds per-partition, so output depends on
  the physical split).
- Stratified rates are a CASE over the stratum column -- still map-only.
- Shard packing needs a GLOBAL running total of tokens; a bare
  `Window.orderBy(...)` without partitions collapses to ONE task -- the
  low-cardinality window trap. The two-level prefix sum keeps it parallel:
  within-bucket cumsum (window partitioned by bucket = id div B, B ~ 2^10
  rows) + per-bucket offsets (n/B rows -- tiny, broadcast back). Exactly
  the textbook parallel scan, expressed as two windows and a broadcast join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

SAMPLE_MOD = 1_000_000


def sample_hash(key: Column, salt: str) -> Column:
    """Deterministic per-key draw in [0, SAMPLE_MOD): first 8 md5 hex chars
    of 'salt:key' as an integer, mod SAMPLE_MOD. Portable: DuckDB computes
    the identical value, so sampled outputs are oracle-exact."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt + ":"), key.cast("string"))), 1, 8), 16, 10
    ).cast("long")
    return F.pmod(h, F.lit(SAMPLE_MOD))


def hash_sample(
    df: DataFrame,
    fraction: float,
    *,
    key_col: str = "doc_id",
    salt: str = "sample",
) -> DataFrame:
    """Uniform deterministic sample: keep iff draw < fraction. Map-only."""
    return df.filter(sample_hash(F.col(key_col), salt) < int(fraction * SAMPLE_MOD))


def stratified_hash_sample(
    df: DataFrame,
    fractions: dict[str, float],
    *,
    strata_col: str = "lang",
    key_col: str = "doc_id",
    default_fraction: float = 0.0,
    salt: str = "sample",
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. keep 100% of scarce
    languages, 10% of the dominant one). One CASE expression over the
    stratum column picks the threshold; still map-only, no shuffle."""
    thr: Column = F.lit(int(default_fraction * SAMPLE_MOD))
    for value, frac in sorted(fractions.items()):
        thr = F.when(F.col(strata_col) == value, F.lit(int(frac * SAMPLE_MOD))).otherwise(thr)
    return df.filter(sample_hash(F.col(key_col), salt) < thr)


def shuffle_shards(
    df: DataFrame,
    n_shards: int,
    *,
    key_col: str = "doc_id",
    salt: str = "shuffle",
) -> DataFrame:
    """Deterministic global shuffle into training shards: the
    order-randomization step before a training run, without `rand()`
    (whose Spark output depends on the physical partitioning).

    Every row gets a reproducible draw (`sample_hash`), shard =
    draw mod n_shards, and a position within its shard ordered by
    (draw, key). Shard sizes are ~uniform; the within-shard window
    partitions on the shard key, so pick n_shards so a shard fits a task
    (corpus_bytes / ~1 GB) -- the parallelism knob IS the shard count,
    there is no global single-task sort at any size. Re-running with a new
    salt reshuffles; same salt reproduces byte-identical shards."""
    draw = sample_hash(F.col(key_col), salt)
    w = Window.partitionBy("shard").orderBy(F.col("draw").asc(), F.col(key_col).asc())
    return (
        df.withColumn("draw", draw)
        .withColumn("shard", F.pmod(F.col("draw"), F.lit(n_shards)).cast("long"))
        .withColumn("pos", F.row_number().over(w).cast("long"))
    )


def mixture_sample(
    df: DataFrame,
    shares: dict[str, float],
    token_budget: int,
    *,
    strata_col: str = "lang",
    weight_col: str = "n_tokens",
    key_col: str = "doc_id",
    salt: str = "mix",
) -> DataFrame:
    """Training-mixture resampling: hit a global ``token_budget`` with a
    target share per stratum (the ' % code / % web / % books' dial of a
    pretraining mix). Per stratum, keep fraction = min(1, budget*share /
    stratum_tokens), applied as a deterministic hash draw -- so the sample
    is reproducible and engine-portable like every other sampler here.

    The per-stratum token totals come from one tiny aggregate joined back
    by broadcast -- the plan stays lazy, no driver collect. Expected kept
    tokens per stratum = budget*share (exact in expectation; the hash draw
    gives binomial concentration around it)."""
    totals = df.groupBy(strata_col).agg(F.sum(weight_col).alias("_stratum_tokens"))
    # default share 0.0, NOT null: least() SKIPS nulls in both Spark and
    # DuckDB, so a null threshold would quietly become SAMPLE_MOD and keep
    # out-of-spec strata in full -- share 0 makes them drop, as the mixture
    # semantics require
    share: Column = F.lit(0.0)
    for value, s in sorted(shares.items()):
        share = F.when(F.col(strata_col) == value, F.lit(float(s))).otherwise(share)
    thr = F.least(
        F.lit(SAMPLE_MOD),
        F.floor(F.lit(float(token_budget)) * share / F.col("_stratum_tokens") * SAMPLE_MOD),
    )
    return (
        df.join(F.broadcast(totals), strata_col)
        .filter(sample_hash(F.col(key_col), salt) < thr)
        .drop("_stratum_tokens")
    )


def pack_shards(
    df: DataFrame,
    budget: int,
    *,
    id_col: str = "doc_id",
    weight_col: str = "n_tokens",
    bucket_size: int = 1024,
) -> DataFrame:
    """Assign rows (in ``id_col`` order) to fixed-budget shards: shard i
    holds the rows whose running token total falls in [i*budget, (i+1)*budget).
    A doc's shard = floor(tokens_before_it / budget) -- deterministic,
    order-stable, and each shard's payload is within one document of the
    budget.

    The running total is the two-level prefix sum from the module docstring:
    no single-task global window at any size. Output adds ``cum_tokens``
    (inclusive running total) and ``shard``."""
    bucket = F.floor(F.col(id_col) / bucket_size).alias("_bucket")
    w_in = (
        Window.partitionBy("_bucket")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = df.withColumn("_bucket", bucket).withColumn(
        "_run_in", F.sum(weight_col).over(w_in)
    )
    # per-bucket totals: n/bucket_size rows -- the single-partition window
    # over THEM is over a tiny relation, then broadcast back
    w_off = Window.orderBy("_bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        within.groupBy("_bucket")
        .agg(F.sum(weight_col).alias("_tot"))
        .withColumn("_off", F.coalesce(F.sum("_tot").over(w_off), F.lit(0)))
        .select("_bucket", "_off")
    )
    cum = F.col("_off") + F.col("_run_in")
    return (
        within.join(F.broadcast(offsets), "_bucket")
        .withColumn("cum_tokens", cum.cast("long"))
        .withColumn(
            "shard",
            F.floor((cum - F.col(weight_col)) / budget).cast("long"),
        )
        .drop("_bucket", "_run_in", "_off")
    )


def weighted_sample_topk(
    df: DataFrame,
    k: int,
    *,
    weight: Column,
    key_col: str = "doc_id",
    salt: str = "wsample",
) -> DataFrame:
    """Weight-proportional sample WITHOUT replacement, k rows: the
    Efraimidis-Spirakis A-ES scheme with the deterministic hash draw --
    each row scores u^(1/w) for u ~ (0,1] and the top-k scores win, which
    is exactly probability-proportional-to-weight sampling. u comes from
    `sample_hash` (never `rand()`), so the selection is reproducible
    across runs/engines/partitionings and ships an exact oracle; heavier
    rows win more often but any row can win -- the quality-WEIGHTED corpus
    subsample, vs hash_sample's uniform keep.

    Scale shape: scoring is map-only; top-k is ORDER BY + LIMIT =
    TakeOrderedAndProject (per-partition heaps, no global sort). Weights
    must be > 0; rows with null/non-positive weight are dropped (they have
    zero selection probability by definition).

    Returns the winning rows + their (rounded) score, ordered for the
    oracle compare by score desc."""
    u = (sample_hash(F.col(key_col), salt) + 1) / float(SAMPLE_MOD)  # (0, 1]
    score = F.pow(u, 1.0 / weight)
    return (
        df.filter(weight > 0)
        .withColumn("sample_score", F.round(score, 8))
        .orderBy(F.col("sample_score").desc(), F.col(key_col).asc())
        .limit(k)
    )


def _rate_ppm_expr(n_ref_total: int, n_pool_total: int):
    """min(SAMPLE_MOD, (SAMPLE_MOD * n_ref * n_pool_total) // (n_ref_total
    * n_pool)) as a long column over (n_ref, n_pool), computed in
    DECIMAL(38,0) so it is EXACT at 100 TB-scale corpus cardinalities:
    in long arithmetic the numerator overflows once n_ref * n_pool_total
    exceeds ~9.2e12 (wrapping silently in non-ANSI mode, diverging from
    the DuckDB oracle's HUGEINT), while 1e6 * 1e12 * 1e12 = 1e30 still
    fits comfortably in 38 decimal digits; ``div`` on decimals returns the
    integral quotient as BIGINT. ADVICE r5 (low) fix."""
    return F.when(F.col("n_pool") == 0, F.lit(0).cast("long")).otherwise(
        F.least(
            F.lit(SAMPLE_MOD).cast("long"),
            F.expr(
                f"(CAST({SAMPLE_MOD} AS DECIMAL(38,0)) * n_ref"
                f" * CAST({n_pool_total} AS DECIMAL(38,0)))"
                f" div (CAST({max(n_ref_total, 1)} AS DECIMAL(38,0))"
                f" * n_pool)"
            ),
        )
    )


def distribution_matched_sample(
    pool: DataFrame,
    reference: DataFrame,
    *,
    bucket_col: str = "bucket",
    key_col: str = "doc_id",
    salt: str = "match",
) -> DataFrame:
    """Resample ``pool`` so its ``bucket_col`` distribution matches
    ``reference``'s (the curation step that fixes a mix's length/quality
    skew against a trusted subset -- e.g. make web-crawl length histograms
    match a curated corpus before mixing). Per-bucket acceptance rate
    min(1, ref_share / pool_share) is computed in integer ppm (exact in
    both engines), each pool row keeps via the deterministic md5 draw, and
    the returned frame is the per-bucket accounting:
    (bucket, n_ref, n_pool, rate_ppm, n_sampled).

    Scale shape: two bucket-cardinality aggs (map-side combined) + one
    map-only filter over the pool with the rate map BROADCAST; the two
    corpus totals are bounded scalar collects. Rows, never samples, shuffle."""
    n_ref_total = reference.count()
    n_pool_total = pool.count()
    rate_expr = _rate_ppm_expr(n_ref_total, n_pool_total)
    ref_counts = reference.groupBy(bucket_col).agg(
        F.count(F.lit(1)).alias("n_ref")
    )
    pool_counts = pool.groupBy(bucket_col).agg(
        F.count(F.lit(1)).alias("n_pool")
    )
    rates = (
        ref_counts.join(pool_counts, bucket_col, "full_outer")
        .select(
            bucket_col,
            F.coalesce("n_ref", F.lit(0)).cast("long").alias("n_ref"),
            F.coalesce("n_pool", F.lit(0)).cast("long").alias("n_pool"),
        )
        .withColumn("rate_ppm", rate_expr)
    )
    kept = (
        pool.join(F.broadcast(rates.select(bucket_col, "rate_ppm")), bucket_col)
        .filter(sample_hash(F.col(key_col), salt) < F.col("rate_ppm"))
        .groupBy(bucket_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n_sampled"))
    )
    return rates.join(kept, bucket_col, "left").select(
        bucket_col,
        "n_ref",
        "n_pool",
        "rate_ppm",
        F.coalesce("n_sampled", F.lit(0)).cast("long").alias("n_sampled"),
    )


def _gram_bucket(gram: Column, n_buckets: int, salt: str) -> Column:
    """Deterministic hashed-ngram bucket in [0, n_buckets): the sample_hash
    md5 construction with a different modulus, so DuckDB computes the
    identical bucket for the identical gram."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt + ":"), gram.cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("long")
    return F.pmod(h, F.lit(n_buckets))


def _hashed_grams(df: DataFrame, text_col: str, id_col: str | None) -> DataFrame:
    """Explode a corpus to its unigrams + bigrams (the DSIR feature set)."""
    from .text import tokens

    base = df.withColumn("_toks", tokens(F.col(text_col)))
    grams = F.concat(
        F.col("_toks"),
        F.when(
            F.size("_toks") >= 2,
            F.expr(
                "transform(sequence(1, size(_toks) - 1),"
                " i -> concat(_toks[i - 1], ' ', _toks[i]))"
            ),
        ).otherwise(F.array().cast("array<string>")),
    )
    cols = ([F.col(id_col)] if id_col else []) + [
        F.explode(grams).alias("gram")
    ]
    return base.select(*cols)


def dsir_select(
    pool: DataFrame,
    target: DataFrame,
    k: int = 100,
    *,
    n_buckets: int = 4096,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "dsir",
    doc_bucket: DataFrame | None = None,
    t_counts: DataFrame | None = None,
) -> DataFrame:
    """DSIR -- Data Selection via Importance Resampling (Xie et al. 2023,
    arXiv:2302.03169): pick the ``k`` pool documents whose hashed-ngram
    distribution looks most like a trusted ``target`` corpus, with
    importance-weighted Gumbel-top-k resampling rather than a hard
    threshold (diversity is preserved near the decision boundary). The
    canonical "make the web crawl look like Wikipedia" curation stage.

      feature:   unigram + bigram counts hashed into ``n_buckets``
      weight:    log w(d) = sum over gram occurrences of
                 ln p_target(bucket) - ln p_pool(bucket), add-one smoothed
      resample:  score = log w + Gumbel(g), g = -ln(-ln(u)) with the
                 md5-deterministic u in (0, 1] -- Gumbel-top-k IS sampling
                 without replacement proportional to w, but reproducible
                 and engine-portable (no rand()).

    Scale shape: each corpus is exploded->bucket-counted exactly ONCE (the
    pool's per-(doc, bucket) counts persist and feed BOTH the bucket totals
    and the per-doc weights; map-side combined, totals bounded by
    ``n_buckets``); the bucket log-ratio map is BROADCAST back; per-doc
    weights are one groupBy(doc); top-k is TakeOrderedAndProject
    (per-partition heaps). Corpus text shuffles never -- only grams'
    (doc_id, bucket) pairs.

    Returns (doc_id, log_weight, score) for the selected k, score
    descending. Floats rounded to 6 dp for engine parity.

    ``doc_bucket`` / ``t_counts``: optional precomputed tables (the pool's
    per-(doc, bucket) gram counts and the target's bucket counts with a
    ``t_n`` column) -- the fusion hook for callers like dsir_quality that
    need the SAME tables again downstream, so each corpus is exploded
    exactly once end to end."""
    from ._cache import tracked_persist

    if t_counts is None:
        # persisted (r14, guide §1.2): bounded at n_buckets rows but
        # consumed twice (the t_total collect + the ratio-map join) --
        # unpersisted, the target corpus's explode ran once per consumer
        t_counts = tracked_persist(
            _hashed_grams(target, text_col, None)
            .withColumn("bucket", _gram_bucket(F.col("gram"), n_buckets, salt))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("t_n"))
        )
    # the pool corpus is tokenized ONCE: the per-(doc, bucket) counts are
    # persisted and both the bucket totals (for the ratio map) and the
    # per-doc weights derive from them -- at 100 TB the pool explode is the
    # dominant cost and must not run twice
    if doc_bucket is None:
        doc_bucket = tracked_persist(
            _hashed_grams(pool, text_col, id_col)
            .withColumn("bucket", _gram_bucket(F.col("gram"), n_buckets, salt))
            .groupBy(id_col, "bucket")
            .agg(F.count(F.lit(1)).alias("n"))
        )
    p_counts = doc_bucket.groupBy("bucket").agg(F.sum("n").alias("p_n"))
    t_total = t_counts.agg(F.sum("t_n")).collect()[0][0] or 0
    p_total = p_counts.agg(F.sum("p_n")).collect()[0][0] or 0
    ratios = (
        t_counts.join(p_counts, "bucket", "full_outer")
        .select(
            "bucket",
            (
                F.log(
                    (F.coalesce("t_n", F.lit(0)) + 1)
                    / F.lit(float(t_total + n_buckets))
                )
                - F.log(
                    (F.coalesce("p_n", F.lit(0)) + 1)
                    / F.lit(float(p_total + n_buckets))
                )
            ).alias("log_ratio"),
        )
    )
    doc_weights = (
        doc_bucket.join(F.broadcast(ratios), "bucket")
        .groupBy(id_col)
        .agg(F.sum(F.col("n") * F.col("log_ratio")).alias("log_weight"))
    )
    # + 0.5 keeps u STRICTLY inside (0, 1): u == 1.0 (hash == SAMPLE_MOD-1,
    # p = 1e-6 per doc, near-certain at realistic pool sizes) would make
    # -log(-log(u)) hit log(0) -- NULL in Spark (doc silently sorts last)
    # but a hard error in DuckDB, so the engines would disagree on selection
    u = (sample_hash(F.col(id_col), salt) + 0.5) / float(SAMPLE_MOD)
    gumbel = -F.log(-F.log(u))
    return (
        doc_weights.withColumn("score", F.col("log_weight") + gumbel)
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
        .select(
            id_col,
            F.round("log_weight", 6).alias("log_weight"),
            F.round("score", 6).alias("score"),
        )
    )


def dsir_quality(
    pool: DataFrame,
    target: DataFrame,
    fraction: float = 0.25,
    *,
    n_buckets: int = 4096,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "dsir",
) -> DataFrame:
    """The claim Xie et al. 2023 actually make, audited: DSIR's selected
    set is DISTRIBUTIONALLY closer to the target than a size-matched
    random sample -- not merely "matches its own oracle". Computes the
    add-one-smoothed hashed-ngram distributions of the target (T), the
    ``dsir_select``-ed docs (S), and a deterministic random baseline
    (R: the same-count pool docs with the smallest md5 draw under an
    independent salt), then the exact KL(T || S) and KL(T || R) over all
    ``n_buckets`` buckets (unobserved buckets enter through a closed-form
    smoothing correction, so the divergences are exact, not truncated).

    The audit selects a FRACTION of the pool (k = ceil(fraction *
    n_pool)), not a fixed k: the improvement claim is a function of
    selection PRESSURE, and pinning k would silently change the claim as
    the corpus grows. Measured on the synthetic corpus (PERF.md): at 25%
    pressure KL drops ~2.6-2.9x vs random at both sf0.01 and sf0.1; at a
    fixed k=100 on sf0.1 (2% pressure) top-k OVERSHOOTS -- it
    concentrates on extreme-ratio docs of a noise-dominated ratio map and
    lands FARTHER from the target than random (0.372 vs 0.090). That
    overshoot is a real property of top-k importance selection at
    aggressive ratios, which is exactly why this audit exists.

    Scale shape: the pool's per-(doc, bucket) counts are computed once and
    filtered to S / R by left-semi joins on the bounded id sets; every
    aggregate after that is <= n_buckets rows; the only driver traffic is
    bounded scalars (pool count, three corpus totals + union-bucket count
    in one row, the final two-KL row).

    Returns ONE contract row -- (sel_fraction, n_selected_matches,
    improves_over_random, kl_finite) -- hash-checkable against a literal
    all-true oracle; the measured KLs are deterministic but not
    SQL-bounded, so they live in PERF.md, not the driver row."""
    import math

    from ._cache import tracked_persist

    n_pool = pool.count()  # bounded scalar: sets the selection size
    k = int(math.ceil(fraction * n_pool))
    # each corpus is exploded exactly ONCE end to end: the pool's
    # (doc, bucket) counts and the target's bucket counts are computed
    # here, fed INTO dsir_select via its fusion hook, and reused below
    # for the three distribution estimates (formerly both explodes ran
    # twice -- once inside dsir_select, once here)
    doc_bucket = tracked_persist(
        _hashed_grams(pool, text_col, id_col)
        .withColumn("bucket", _gram_bucket(F.col("gram"), n_buckets, salt))
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    t_counts_n = tracked_persist(
        _hashed_grams(target, text_col, None)
        .withColumn("bucket", _gram_bucket(F.col("gram"), n_buckets, salt))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("t_n"))
    )
    # persisted: sel_ids feeds both the semi-join and the size witness,
    # and without a persist each action re-runs the whole selection
    sel_ids = tracked_persist(
        dsir_select(
            pool, target, k, n_buckets=n_buckets,
            text_col=text_col, id_col=id_col, salt=salt,
            doc_bucket=doc_bucket, t_counts=t_counts_n,
        ).select(id_col)
    )
    rand_ids = (
        pool.select(id_col)
        .orderBy(
            sample_hash(F.col(id_col), salt + "_randbase").asc(),
            F.col(id_col).asc(),
        )
        .limit(k)
    )
    t_counts = t_counts_n.select("bucket", F.col("t_n").alias("t"))
    s_counts = (
        doc_bucket.join(sel_ids, id_col, "left_semi")
        .groupBy("bucket")
        .agg(F.sum("n").alias("s"))
    )
    r_counts = (
        doc_bucket.join(rand_ids, id_col, "left_semi")
        .groupBy("bucket")
        .agg(F.sum("n").alias("r"))
    )
    joined = tracked_persist(
        t_counts.join(s_counts, "bucket", "full_outer")
        .join(r_counts, "bucket", "full_outer")
        .select(
            "bucket",
            F.coalesce("t", F.lit(0)).alias("t"),
            F.coalesce("s", F.lit(0)).alias("s"),
            F.coalesce("r", F.lit(0)).alias("r"),
        )
    )
    tot = joined.agg(
        F.sum("t").alias("tt"),
        F.sum("s").alias("st"),
        F.sum("r").alias("rt"),
        F.count(F.lit(1)).alias("n_obs"),
    ).collect()[0]
    tt, st, rt = float(tot.tt), float(tot.st), float(tot.rt)
    n_missing = n_buckets - int(tot.n_obs)
    td, sd, rd = tt + n_buckets, st + n_buckets, rt + n_buckets
    partial = (
        joined.select(
            (
                ((F.col("t") + 1) / td)
                * (
                    F.log((F.col("t") + 1) / td)
                    - F.log((F.col("s") + 1) / sd)
                )
            ).alias("kls"),
            (
                ((F.col("t") + 1) / td)
                * (
                    F.log((F.col("t") + 1) / td)
                    - F.log((F.col("r") + 1) / rd)
                )
            ).alias("klr"),
        )
        .agg(F.sum("kls").alias("kls"), F.sum("klr").alias("klr"))
        .collect()[0]
    )
    # closed-form smoothing correction for the (n_buckets - n_obs) buckets
    # unseen in ALL three corpora: each contributes (1/td)*ln(sd/td-ratio)
    corr_s = n_missing * (1.0 / td) * (math.log(1.0 / td) - math.log(1.0 / sd))
    corr_r = n_missing * (1.0 / td) * (math.log(1.0 / td) - math.log(1.0 / rd))
    kl_sel = float(partial.kls) + corr_s
    kl_rand = float(partial.klr) + corr_r
    n_selected = sel_ids.count()
    spark = pool.sparkSession
    from ._local import arrow_local_frame

    return arrow_local_frame(
        spark,
        [
            (
                float(fraction),
                bool(n_selected == k),
                bool(kl_sel < kl_rand),
                bool(math.isfinite(kl_sel) and math.isfinite(kl_rand)),
            )
        ],
        "sel_fraction double, n_selected_matches boolean,"
        " improves_over_random boolean, kl_finite boolean",
    )


def context_pack(
    df: DataFrame,
    context_len: int = 512,
    bucket_width: int = 32,
    *,
    id_col: str = "doc_id",
    weight_col: str = "n_tokens",
) -> DataFrame:
    """Sequence packing for training: assign documents to fixed-size
    context windows so padding is bounded -- the step between a sampled
    corpus and the dataloader, where naive one-doc-per-context wastes most
    of the batch on padding tokens.

    True first-fit-decreasing is inherently sequential, so this is the
    LENGTH-BUCKETED static packing real pipelines use instead: docs whose
    token count falls in [b*W, (b+1)*W) share a bucket, and a bucket's bin
    capacity is the CLOSED-FORM floor(C / ((b+1)*W)) docs (capacity
    guaranteed by the bucket's upper bound -- no cumulative sum, no
    sequential state). bin = floor(rank_in_bucket / capacity) with rank a
    per-bucket row_number: ONE window partitioned by length bucket, fully
    parallel across buckets, deterministic, engine-portable. Per-bin
    padding is bounded by capacity * W + (C mod bucket upper) by
    construction. Docs >= C tokens get capacity max(1,0)=1 -- their own
    bin, flagged truncated.

    Returns per-doc (id, n_tokens, lbucket, bin, truncated); callers
    aggregate per (lbucket, bin) for padding accounting."""
    w = F.col(weight_col)
    lb = F.floor(w / bucket_width)
    dpb = F.greatest(
        F.lit(1), F.floor(F.lit(context_len) / ((lb + 1) * bucket_width))
    )
    rk = F.row_number().over(
        Window.partitionBy("lbucket").orderBy(F.col(id_col))
    )
    return (
        df.select(
            F.col(id_col),
            w.cast("long").alias("n_tokens"),
            lb.cast("long").alias("lbucket"),
            dpb.cast("long").alias("_dpb"),
            (w >= context_len).alias("truncated"),
        )
        .withColumn("_rk", rk)
        .select(
            id_col,
            "n_tokens",
            "lbucket",
            F.floor((F.col("_rk") - 1) / F.col("_dpb")).cast("long").alias("bin"),
            "truncated",
        )
    )


def balanced_sample(
    df: DataFrame,
    cap: int,
    *,
    strata_col: str = "lang",
    key_col: str = "doc_id",
    salt: str = "balance",
) -> DataFrame:
    """Count-capped per-class sampling: keep exactly min(n, cap) rows per
    stratum -- the class-balancing step before classifier training, where
    rate-based sampling (stratified_hash_sample) cannot promise exact
    counts. Selection order is the deterministic md5 draw (ties by key),
    so the kept set is reproducible, engine-portable, and stable under
    corpus growth ONLY for strata still under the cap (a doc can be
    displaced by new lower-draw arrivals once its stratum is over cap --
    inherent to exact-count semantics, documented here).

    One row_number window per stratum (parallel across strata; a stratum
    over ~task size would need the two-level trick, but caps are
    dataloader-sized). Adds ``sample_rank`` (1-based within stratum)."""
    w = Window.partitionBy(strata_col).orderBy(
        sample_hash(F.col(key_col), salt).asc(), F.col(key_col).asc()
    )
    return (
        df.withColumn("sample_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("sample_rank") <= cap)
    )


def temperature_mixture_sample(
    df: DataFrame,
    token_budget: int,
    temperature: float = 2.0,
    *,
    strata_col: str = "lang",
    weight_col: str = "n_tokens",
    key_col: str = "doc_id",
    salt: str = "tempmix",
) -> DataFrame:
    """Temperature-scaled mixture sampling (the multilingual up-sampling
    rule of mBERT / XLM-R, Conneau & Lample 2019 sec. 3.1: q_i ∝
    p_i^(1/T)): target shares are DERIVED from the corpus itself --
    p_i = stratum_tokens / total, flattened by the exponent -- instead of
    hand-specified like mixture_sample's dial. T = 1 reproduces natural
    proportions; T -> inf approaches uniform across strata; the standard
    fix for head languages drowning the tail at pretraining time.

    Same scale shape as mixture_sample: one strata-bounded aggregate, the
    share normalization is a window over the STRATA frame (bounded by
    distinct strata, never data-scale), thresholds broadcast back, keep
    decision a deterministic md5 draw -- lazy end to end, exact oracle.
    Returns the kept rows with the derived q_share attached (rounded 6
    dp) so the mixture is auditable from the output itself."""
    totals = df.groupBy(strata_col).agg(
        F.sum(weight_col).alias("_stratum_tokens")
    )
    pw = F.pow(F.col("_stratum_tokens").cast("double"), 1.0 / float(temperature))
    shares = totals.withColumn(
        "_q",
        pw / F.sum(pw).over(Window.partitionBy()),
    ).withColumn("q_share", F.round(F.col("_q"), 6))
    thr = F.least(
        F.lit(SAMPLE_MOD),
        F.floor(
            F.lit(float(token_budget))
            * F.col("_q")
            / F.col("_stratum_tokens")
            * SAMPLE_MOD
        ),
    )
    return (
        df.join(F.broadcast(shares), strata_col)
        .filter(sample_hash(F.col(key_col), salt) < thr)
        .drop("_stratum_tokens", "_q")
    )


def epoch_budget_plan(
    docs: DataFrame,
    budget_factor: float = 2.0,
    *,
    max_extra_epochs: float = 3.0,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Token-budget EPOCH PLANNER: given a training budget of
    ``budget_factor`` x the corpus token mass, decide how many epochs of
    each source to schedule -- the "how many times do we repeat
    Wikipedia vs CommonCrawl" computation every LLM data plan starts
    from (cf. the repeat-factor tables in Llama/Gopher papers).

    Per-source epoch CAP is quality-derived: cap_s = 1 +
    max_extra_epochs * gopher_keep_rate_s, so clean sources may repeat
    up to 1+max_extra_epochs epochs while junk-heavy ones stay near 1
    (repeating low-quality text degrades models faster than repeating
    clean text). The planner then WATERFILLS: epochs_s = min(lambda,
    cap_s) where lambda solves  sum_s min(lambda, cap_s) * m_s = B  --
    the unique piecewise-linear fixpoint, found exactly by the sorted
    prefix scan (sources ascending by cap; the first segment where the
    implied lambda stops exceeding the next cap). If B exceeds the
    fully-capped maximum, every source caps and budget_feasible=false.

    Scale shape: one map-side-combined groupBy to source cardinality;
    every window and the lambda scan run over the ~O(100)-row source
    table (the bounded-dimension window family); lambda broadcasts back
    as a 1-row scalar join. Deterministic doubles end to end (integer
    token masses, 6-dp rounded caps, identical summation order via the
    same sort), so the oracle recomputes the plan EXACTLY.

    Returns (source, n_tokens, keep_rate, epoch_cap, epochs,
    planned_tokens, capped, budget_feasible)."""
    from .text import gopher_quality, token_count

    per_doc = docs.select(
        F.col(source_col).alias("source"),
        F.col(id_col).alias("doc_id"),
        token_count(F.col(text_col)).alias("_nt"),
    )
    keep = gopher_quality(docs, text_col=text_col, id_col=id_col).select(
        "doc_id", "keep"
    )
    src = (
        per_doc.join(keep, "doc_id")
        .groupBy("source")
        .agg(
            F.sum("_nt").alias("n_tokens"),
            F.round(F.avg(F.col("keep").cast("double")), 6).alias("keep_rate"),
        )
        .withColumn(
            "epoch_cap",
            F.round(1.0 + max_extra_epochs * F.col("keep_rate"), 6),
        )
    )
    w = Window.orderBy(F.col("epoch_cap").asc(), F.col("source").asc())
    wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    o = (
        src.withColumn("_k", F.row_number().over(w))
        .withColumn(
            "_cum_capm",
            F.sum(F.col("epoch_cap") * F.col("n_tokens")).over(wc),
        )
        .withColumn("_cum_m", F.sum("n_tokens").over(wc))
    )
    tot = o.agg(
        F.sum("n_tokens").alias("_m"),
        F.max("epoch_cap").alias("_maxcap"),
    ).withColumn("_b", F.lit(float(budget_factor)) * F.col("_m"))
    o = o.crossJoin(F.broadcast(tot))
    lam_before = (
        F.col("_b") - F.coalesce(F.lag("_cum_capm").over(w), F.lit(0.0))
    ) / (F.col("_m") - F.coalesce(F.lag("_cum_m").over(w), F.lit(0)))
    o = o.withColumn("_lam_before", lam_before)
    pick = o.agg(
        F.min(
            F.when(
                F.col("_lam_before") <= F.col("epoch_cap"),
                F.struct(F.col("_k").alias("k"), F.col("_lam_before").alias("l")),
            )
        ).alias("_pick")
    )
    o = o.crossJoin(F.broadcast(pick))
    lam = F.coalesce(F.col("_pick.l"), F.col("_maxcap"))
    epochs = F.round(F.least(lam, F.col("epoch_cap")), 6)
    return o.select(
        "source",
        "n_tokens",
        "keep_rate",
        "epoch_cap",
        epochs.alias("epochs"),
        F.round(epochs * F.col("n_tokens"), 2).alias("planned_tokens"),
        (lam >= F.col("epoch_cap")).alias("capped"),
        F.col("_pick").isNotNull().alias("budget_feasible"),
    )

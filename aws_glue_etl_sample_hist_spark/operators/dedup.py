"""Deduplication operators for LLM-data pipelines (north-star extension):
exact (hash group-by), n-gram Jaccard, MinHash+LSH, SimHash.

Scale design notes
------------------
- Exact dedup groups on md5(text), not the raw text: the shuffle moves 32-hex
  keys instead of documents, and the same group-by works when `text` is
  gigabytes per partition.
- Pairwise similarity NEVER materializes the n^2 pair space. Candidate pairs
  come from inverted-index joins (shared shingle / shared LSH band / shared
  SimHash band), each a plain shuffle join on a short key -- at 100 TB these
  are the only joins that fit.
- High-document-frequency shingles are dropped (``max_df``): a shingle
  occurring in half the corpus contributes ~n^2/8 candidate pairs on its own
  (the classic skew bomb) while carrying no dedup signal.
- All hashing is md5-derived => deterministic, seedless, and bit-identical
  in DuckDB, so every operator here ships with a SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .text import tokens, word_shingles


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact-duplicate groups: content hash -> keeper (min id) + copy count."""
    return (
        docs.select(F.md5(F.col(text_col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("keeper_doc_id"),
            F.count(id_col).alias("n_copies"),
        )
    )


def _distinct_shingles(
    docs: DataFrame, n: int, text_col: str, id_col: str, max_df: int | None
) -> DataFrame:
    """(doc_id, shingle) pairs, distinct per doc, with high-DF shingles dropped."""
    sh = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(word_shingles(tokens(F.col(text_col)), n))).alias("shingle"),
    )
    if max_df is not None:
        df_counts = sh.groupBy("shingle").agg(F.count_distinct("doc_id").alias("df"))
        sh = (
            sh.join(F.broadcast(df_counts.filter(F.col("df") <= max_df).select("shingle")),
                    "shingle", "inner")
        )
    return sh


def ngram_jaccard_pairs(
    docs: DataFrame,
    *,
    n: int = 3,
    threshold: float = 0.2,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_df: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs by exact n-gram Jaccard similarity.

    Inverted-index plan: distinct (doc, shingle) -> self-join on shingle
    (candidate generation; only docs sharing >= 1 shingle ever pair) ->
    intersection counts -> join per-doc shingle counts -> Jaccard filter.
    """
    sh = _distinct_shingles(docs, n, text_col, id_col, max_df).cache()
    sizes = sh.groupBy("doc_id").agg(F.count("shingle").alias("n_shingles"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_shingles").alias("size_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_shingles").alias("size_b"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(F.col("n_common") / (F.col("size_a") + F.col("size_b") - F.col("n_common")), 4),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "n_common", "size_a", "size_b", "jaccard")
    )


def minhash_signatures(
    docs: DataFrame,
    *,
    num_hashes: int = 12,
    shingle_n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_df: int | None = None,
) -> DataFrame:
    """MinHash signature rows (doc_id, h(hash index), min_hash value).

    Hash family: h_i(s) = int(md5(i || ':' || s)[:8 hex]) -- seedless,
    portable (DuckDB: CAST('0x'||substr(md5(..),1,8) AS BIGINT)). The
    (doc, shingle) set explodes by num_hashes; map-side partial min keeps the
    shuffle at |docs| x num_hashes rows regardless of document length.
    """
    sh = _distinct_shingles(docs, shingle_n, text_col, id_col, max_df)
    return (
        sh.select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), F.lit(num_hashes - 1))).alias("h"),
            "shingle",
        )
        .select(
            "doc_id",
            "h",
            F.conv(
                F.substring(F.md5(F.concat_ws(":", F.col("h"), F.col("shingle"))), 1, 8), 16, 10
            )
            .cast("long")
            .alias("hv"),
        )
        .groupBy("doc_id", "h")
        .agg(F.min("hv").alias("min_hash"))
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    *,
    num_hashes: int = 12,
    band_size: int = 3,
    shingle_n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_df: int | None = None,
) -> DataFrame:
    """LSH candidate pairs: signatures -> bands of ``band_size`` rows -> docs
    sharing any identical band become candidates. Returns (doc_a, doc_b,
    n_shared_bands). Probability a pair with true Jaccard j surfaces:
    1 - (1 - j^band_size)^(num_hashes/band_size)."""
    sig = minhash_signatures(
        docs,
        num_hashes=num_hashes,
        shingle_n=shingle_n,
        text_col=text_col,
        id_col=id_col,
        max_df=max_df,
    )
    bands = (
        sig.withColumn("band", (F.col("h") / band_size).cast("int"))
        .groupBy("doc_id", "band")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("h", "min_hash"))),
                    lambda s: s["min_hash"].cast("string"),
                ),
                ",",
            ).alias("band_sig")
        )
    )
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_sig") == F.col("b.band_sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_shared_bands"))
    )


def simhash_fingerprints(
    docs: DataFrame,
    *,
    bits: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """SimHash over the token multiset: each occurrence votes ±1 per bit of
    its md5-derived 32-bit hash; sign of the per-bit sum forms the
    fingerprint. Token frequency weighting falls out of keeping duplicates
    (no array_distinct)."""
    tok = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(F.col(text_col))).alias("tok"),
    ).select(
        "doc_id",
        F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long").alias("hv"),
    )
    # python F.shiftright/shiftleft only take int literals; the SQL functions
    # accept column shift amounts, hence F.expr
    votes = (
        tok.select(
            "doc_id", "hv", F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("bit")
        )
        .withColumn(
            "vote",
            F.when(F.expr("shiftright(hv, bit)").bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        )
        .groupBy("doc_id", "bit")
        .agg(F.sum("vote").alias("v"))
    )
    return votes.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("v") >= 0, F.expr("shiftleft(cast(1 as bigint), bit)")).otherwise(
                F.lit(0).cast("long")
            )
        ).alias("simhash")
    )


def simhash_near_pairs(
    docs: DataFrame,
    *,
    max_hamming: int = 3,
    bits: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance.

    Candidate generation uses the 4-band trick: with the fingerprint split
    into 4 byte bands, hamming <= 3 GUARANTEES at least one identical band
    (pigeonhole), so bands-then-exact-filter returns exactly the brute-force
    answer while never building the n^2 pair space. ``max_hamming`` above
    bits/n_bands - 1 would lose that completeness guarantee."""
    fp = simhash_fingerprints(docs, bits=bits, text_col=text_col, id_col=id_col)
    n_bands = 4
    band_bits = bits // n_bands
    mask = (1 << band_bits) - 1
    banded = fp.select(
        "doc_id",
        "simhash",
        F.explode(F.sequence(F.lit(0), F.lit(n_bands - 1))).alias("band"),
    ).withColumn(
        "band_val", F.expr(f"shiftright(simhash, band * {band_bits})").bitwiseAND(F.lit(mask))
    )
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sim_a"),
            F.col("b.simhash").alias("sim_b"),
        )
        .distinct()
    )
    return (
        cand.withColumn("hamming", F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "sim_a", "sim_b", "hamming")
    )

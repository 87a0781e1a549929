"""Corpus ranking / collocation operators: Okapi BM25 retrieval scoring and
PMI collocation mining (round-4 extension of the text family, same design
rules as operators/text.py: JVM-side expressions only, every corpus-level
statistic arrives via a broadcast aggregate so the plan stays lazy, and all
math has an exact DuckDB twin so each operator ships with a SQL oracle).

BM25 formula is the public Okapi variant with the +1 idf floor
(Robertson & Zaragoza 2009, "The Probabilistic Relevance Framework");
PMI is Church & Hanks 1990.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

from .text import token_count, tokens

BM25_K1 = 1.2
BM25_B = 0.75


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k documents for a bag-of-words query under Okapi BM25.

    score(d) = sum_t idf(t) * tf * (k1+1) / (tf + k1*(1 - b + b*dl/avgdl)),
    idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5))  (never negative).

    Scale shape: the corpus-wide stats (N, avgdl) are a 1-row broadcast
    aggregate; per-term df only needs the QUERY terms, so the explode is
    filtered to |query| terms before the df groupBy (the shuffle carries at
    most |query| x n_mappers rows, not the vocabulary). Per-doc tf is one
    groupBy on the high-cardinality (doc, term) key, and the final score is
    a groupBy on doc_id -- two data-scale shuffles total, both map-side
    combined. The ranking sorts ROUNDED scores (4 dp) with a doc_id
    tie-break, so the top-k frontier is engine-stable despite float
    summation order.
    """
    terms = F.array(*[F.lit(t) for t in query_terms])
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("term"),
    ).filter(F.array_contains(terms, F.col("term")))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    dl = docs.select(
        F.col(id_col).alias("doc_id"),
        token_count(F.col(text_col)).cast("double").alias("dl"),
    )
    # corpus stats derive from the dl frame -- two text scans total (the
    # filtered explode and the length pass), not three
    stats = dl.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    idf = dfreq.crossJoin(F.broadcast(stats)).select(
        "term",
        "df",
        F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
        ).alias("idf"),
        "avgdl",
    )
    scored = (
        tf.join(F.broadcast(idf), "term")
        .join(dl, "doc_id")
        .withColumn(
            "contrib",
            F.col("idf")
            * F.col("tf")
            * (BM25_K1 + 1.0)
            / (
                F.col("tf")
                + BM25_K1 * (1.0 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
            ),
        )
        .groupBy("doc_id")
        .agg(
            F.round(F.sum("contrib"), 4).alias("score"),
            F.count(F.lit(1)).cast("long").alias("n_terms_matched"),
        )
    )
    return (
        scored.orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(k)
        .select("doc_id", "n_terms_matched", "score")
    )


def bigram_pmi(
    docs: DataFrame,
    min_count: int = 5,
    k: int = 30,
    *,
    text_col: str = "text",
) -> DataFrame:
    """Top-k adjacent-bigram collocations by pointwise mutual information.

    pmi(x,y) = ln( (c_xy / B) / ((c_x / T) * (c_y / T)) ) over corpus counts
    (B = total bigrams, T = total unigrams), keeping bigrams with
    c_xy >= min_count.

    Scale shape: bigrams are built per row with a JVM transform over the
    token array (no self-join), then both count aggs are map-side combined
    on term keys. Unigram counts join back by term -- a vocabulary-sized
    shuffle join, the inverted-index shape. Totals are 1-row broadcast
    aggregates. Final ranking sorts rounded PMI with (w1, w2) tie-breaks on
    a min_count-filtered frame that is collocation-sized, not corpus-sized.
    """
    toks = docs.select(tokens(F.lower(F.col(text_col))).alias("toks"))
    bigrams = toks.select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(toks) - 1),"
                " i -> struct(toks[i - 1] as w1, toks[i] as w2))"
            )
        ).alias("bg")
    ).select("bg.w1", "bg.w2")
    bg_counts = (
        bigrams.filter((F.col("w1") != "") & (F.col("w2") != ""))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c_xy"))
        .filter(F.col("c_xy") >= min_count)
    )
    uni = (
        toks.select(F.explode("toks").alias("term"))
        .filter(F.col("term") != "")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    totals = bigrams.filter((F.col("w1") != "") & (F.col("w2") != "")).agg(
        F.count(F.lit(1)).cast("double").alias("n_bigrams")
    )
    n_tokens = uni.agg(F.sum("c").cast("double").alias("n_tokens"))
    scored = (
        bg_counts.join(uni.withColumnRenamed("term", "w1").withColumnRenamed("c", "c_x"), "w1")
        .join(uni.withColumnRenamed("term", "w2").withColumnRenamed("c", "c_y"), "w2")
        .crossJoin(F.broadcast(totals))
        .crossJoin(F.broadcast(n_tokens))
        .select(
            "w1",
            "w2",
            F.col("c_xy").cast("long").alias("c_xy"),
            F.round(
                F.log(
                    (F.col("c_xy") / F.col("n_bigrams"))
                    / ((F.col("c_x") / F.col("n_tokens")) * (F.col("c_y") / F.col("n_tokens")))
                ),
                4,
            ).alias("pmi"),
        )
    )
    w = Window.orderBy(F.col("pmi").desc(), F.col("w1").asc(), F.col("w2").asc())
    return (
        scored.orderBy(F.col("pmi").desc(), F.col("w1").asc(), F.col("w2").asc())
        .limit(k)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .select("rank", "w1", "w2", "c_xy", "pmi")
    )


def mmr_rerank(
    candidates: DataFrame,
    emb: DataFrame,
    k: int = 10,
    lam: float = 0.7,
    *,
    id_col: str = "doc_id",
    score_col: str = "score",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein 1998):
    greedily pick ``k`` of the candidate docs maximizing

        lam * rel(d) - (1 - lam) * max_{s in selected} sim(d, s)

    -- the standard diversification pass between retrieval and a RAG
    context window (ten near-identical top hits waste the prompt budget;
    MMR trades a little relevance for coverage). rel is the candidate
    score min-max'd by the max (rounded 6 dp), sim is embedding cosine
    between candidates (rounded 6 dp); mmr_score rounds at 7 dp (see
    _round7 -- 6 dp sits exactly on decimal ties). The first pick sees an
    empty selected set (penalty 0); a candidate with no embedding pairs
    to the selected set pays penalty 0 and competes on relevance alone
    (the missing-embedding contract, mirrored by the oracle's LEFT
    JOIN). All ties break by id ascending, so the
    greedy trajectory is fully deterministic and engine-portable -- the
    oracle replays it as k unrolled SQL stages.

    Scale shape: the candidate set is top-n-bounded BY CONSTRUCTION
    (retrieval already cut it); only candidate rows fetch vectors (one
    semi-join into the corpus-scale embedding table), the pairwise-cosine
    frame is n_cand^2 <= ~400 rows, and the greedy itself runs on a
    driver collect of that bounded frame (the bounded-calibration
    pattern -- never corpus-scale). Returns (doc_id, mmr_rank,
    mmr_score)."""
    from .similarity import cosine

    from ._cache import tracked_persist

    spark = candidates.sparkSession
    rel_w = F.max(score_col).over(Window.partitionBy())
    # persist the top-n-bounded candidate frame (r14, guide §1.2/§5): it
    # feeds the rels collect, BOTH sides of the pairwise-cosine frame (via
    # the vector semi-join), and the sims collect -- unpersisted, every
    # driver action re-ran the caller's whole retrieval pipeline
    cand = tracked_persist(
        candidates.select(
            F.col(id_col).alias("_id"),
            F.round(F.col(score_col) / rel_w, 6).alias("_rel"),
        )
    )
    vecs = emb.join(
        cand.select(F.col("_id").alias(vec_id_col)), vec_id_col, "left_semi"
    ).select(F.col(vec_id_col).alias("_vid"), F.col(vec_col).alias("_v"))
    a = vecs.select(F.col("_vid").alias("_da"), F.col("_v").alias("_va"))
    b = vecs.select(F.col("_vid").alias("_db"), F.col("_v").alias("_vb"))
    sims = (
        a.join(F.broadcast(b), F.col("_da") != F.col("_db"))
        .select(
            "_da",
            "_db",
            F.round(cosine(F.col("_va"), F.col("_vb")), 6).alias("_sim"),
        )
    )
    from decimal import ROUND_HALF_UP, Decimal

    def _round7(x: float) -> float:
        # HALF_UP on the exact decimal expansion, at SEVEN dp: lam times a
        # 6-dp rel is an exact 7-digit decimal, so rounding at 6 dp sits
        # EXACTLY on .xxxxxx5 ties (systematic, observed at sf0.1 --
        # engines break such ties differently: BigDecimal/Decimal round
        # the binary expansion, DuckDB nearbyint()s a scaled double),
        # while at 7 dp the value is ~1e-16 from the grid point and every
        # engine agrees
        return float(
            Decimal(x).quantize(Decimal("0.0000001"), rounding=ROUND_HALF_UP)
        )

    rels = {r._id: r._rel for r in cand.collect()}
    sim = {(r._da, r._db): r._sim for r in sims.collect()}
    selected: list[tuple] = []  # (doc_id, rank, mmr_score)
    chosen: list = []
    while rels and len(selected) < k:
        best = None
        for d, rel in rels.items():
            # redundancy is measured only against picks this candidate is
            # comparably embedded with; a candidate with no vector (or no
            # embedded pick yet) pays penalty 0 and competes on relevance
            # alone -- the explicit missing-embedding contract, mirrored
            # by the oracle's LEFT JOIN + COALESCE
            pairs = [sim[(d, s)] for s in chosen if (d, s) in sim]
            pen = max(pairs) if pairs else 0.0
            score = _round7(lam * rel - (1.0 - lam) * pen)
            key = (-score, d)
            if best is None or key < best[0]:
                best = (key, d, score)
        _, d, score = best
        chosen.append(d)
        selected.append((d, len(selected) + 1, score))
        del rels[d]
    from pyspark.sql import types as T

    # the operator is id-type agnostic: carry the candidates' actual id
    # type through (string doc ids must not hit a hardcoded `long`)
    out_schema = T.StructType(
        [
            T.StructField(id_col, candidates.schema[id_col].dataType),
            T.StructField("mmr_rank", T.LongType()),
            T.StructField("mmr_score", T.DoubleType()),
        ]
    )
    return spark.createDataFrame(selected, out_schema)

"""Similarity search over embedding columns (north-star extension):
brute-force cosine top-k as the exact baseline, sign-bit LSH bucketing as the
scale path, and near-duplicate pair mining.

Scale design notes
------------------
- The dot product runs as zip_with + aggregate over array<float> cast to
  double -- pure JVM expressions inside codegen; no Python, no UDF. For very
  wide vectors a pandas_udf with numpy BLAS would win; the column contract is
  identical, swap behind the same function.
- Brute force is O(|Q| x |N|): correct for reranking and small query sets --
  the query side is broadcast so the corpus never shuffles.
- The LSH path buckets vectors by the sign pattern of fixed hyperplanes
  (axis-aligned here => seedless + SQL-expressible; random Gaussian planes
  slot in by replacing `element_at` with a dot product against literal
  arrays). Candidates come only from the query's own bucket: at 100 TB the
  corpus is hash-partitioned by bucket, so a query touches one partition.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

DEFAULT_LSH_DIMS = (1, 17, 33, 49)


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors for each query id: broadcast the (tiny) query
    side against the corpus, rank per query with a window. Ties broken by
    neighbor id for determinism."""
    q = emb.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = emb.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv"))
    scored = (
        F.broadcast(q)
        .join(c, F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("qv"), F.col("nv")).alias("cos_raw"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_raw").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.col("rank").cast("long").alias("rank"),
            F.round("cos_raw", 6).alias("cosine"),
        )
    )


def sign_bucket(vec: Column, dims: tuple[int, ...] = DEFAULT_LSH_DIMS) -> Column:
    """LSH bucket key: concatenated sign bits of fixed coordinate hyperplanes
    (1-based dims). 4 dims -> 16 buckets; add dims to halve bucket size."""
    bits = [
        F.when(F.element_at(vec, d) >= 0, F.lit("1")).otherwise(F.lit("0")) for d in dims
    ]
    return F.concat(*bits)


def lsh_ann_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    *,
    dims: tuple[int, ...] = DEFAULT_LSH_DIMS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket,
    then exact cosine rerank within the bucket."""
    bucketed = emb.select(
        F.col(id_col), F.col(vec_col), sign_bucket(F.col(vec_col), dims).alias("bucket")
    )
    q = bucketed.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"), "bucket"
    )
    c = bucketed.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv"), F.col("bucket").alias("nbucket")
    )
    scored = (
        F.broadcast(q)
        .join(c, (F.col("bucket") == F.col("nbucket")) & (F.col("query_id") != F.col("neighbor_id")))
        .select("query_id", "bucket", "neighbor_id", cosine(F.col("qv"), F.col("nv")).alias("cos_raw"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_raw").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "bucket",
            "neighbor_id",
            F.col("rank").cast("long").alias("rank"),
            F.round("cos_raw", 6).alias("cosine"),
        )
    )


def near_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.4,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (i < j, cosine >= threshold).

    Exact all-pairs here (oracle-checkable); at scale the same filter runs
    after `sign_bucket` candidate pruning -- pairs in different buckets can
    still exceed the threshold, so bucketed mode trades recall for the n^2,
    exactly like MinHash LSH trades recall for band count."""
    a = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cosine(F.col("va"), F.col("vb")).alias("cos_raw"))
        .filter(F.col("cos_raw") >= threshold)
        .select("id_a", "id_b", F.round("cos_raw", 6).alias("cosine"))
    )

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

import math

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

from ._cache import tracked_persist

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
    # all-zero vector guard, mirroring quantize_int8_summary: norm=0 would
    # give 0/0 -> NaN, and Spark sorts NaN ABOVE every number in window
    # ORDER BY while other engines differ -- a zero embedding in real data
    # would silently rank as everyone's best neighbor. The epsilon clamps
    # the denominator so a zero vector scores cosine 0 against everything.
    return dot(a, b) / F.greatest(norm(a) * norm(b), F.lit(1e-12))


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


def seeded_centroids(
    emb: DataFrame,
    n_centroids: int,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Coarse quantizer, seedless form: the first ``n_centroids`` vectors by
    id as (cent_id, cv) -- deterministic, which keeps the DuckDB oracle
    exact. The quality path is `kmeans_centroids`; both satisfy the same
    centroid-DataFrame contract."""
    return emb.filter(F.col(id_col) < n_centroids).select(
        F.col(id_col).alias("cent_id"), F.col(vec_col).alias("cv")
    )


def kmeans_centroids(
    emb: DataFrame,
    n_centroids: int,
    *,
    sample_fraction: float = 1.0,
    seed: int = 42,
    max_iter: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Trained coarse quantizer: pyspark.ml KMeans fit on a (sampled) pass
    over the corpus, returned under the same (cent_id, cv) contract as
    `seeded_centroids` -- assignment/probe/rerank are unchanged downstream.

    Scale shape: training touches only the sample (at 10^9+ vectors fit on
    ~1% -- KMeans quality saturates fast), the model is n_centroids x dim
    floats on the driver, and the returned centroid table is tiny -- it
    broadcasts exactly like the seeded one. Not SQL-reproducible, so queries
    built on it are registered rows-only; the seeded twin keeps the exact
    oracle."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    # spherical KMeans: train on L2-normalized vectors, because downstream
    # assignment is by COSINE -- euclidean centroids of unnormalized data
    # collapse toward the mean and their directions are noise. The norm is
    # selected as a column FIRST: referencing norm(vec) inside the transform
    # lambda re-evaluates the full O(d) fold per element, O(d^2) per row.
    with_norm = emb.select(
        F.col(vec_col).alias("_v"),
        F.greatest(norm(F.col(vec_col)), F.lit(1e-12)).alias("_n"),
    )
    unit = F.transform(F.col("_v"), lambda x: x.cast("double") / F.col("_n"))
    data = with_norm.select(array_to_vector(unit).alias("features"))
    if sample_fraction < 1.0:
        data = data.sample(fraction=sample_fraction, seed=seed)
    model = KMeans(k=n_centroids, seed=seed, maxIter=max_iter).fit(data)
    spark = emb.sparkSession
    # Arrow local relation (r14, guide §4): this frame is the broadcast
    # side of every downstream assignment; list-backed it re-paid a
    # Python-RDD evaluation per consumer action
    from ._local import arrow_local_frame

    return arrow_local_frame(
        spark,
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "cent_id long, cv array<double>",
    )


def auto_centroids(
    emb: DataFrame,
    *,
    target_cell_size: int = 1024,
    seed: int = 42,
    max_centroids: int = 65536,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Default-scaling rule for the coarse quantizer (r3 VERDICT item 3):
    pick k = ceil(n / target_cell_size) and TRAIN k-means centroids, so the
    mean cell size tracks ``target_cell_size`` no matter how big the corpus
    is. The cell-bounded pair join in `semantic_dedup` then costs
    sum(|cell|^2) ~= n * target_cell_size -- LINEAR in the corpus -- where a
    fixed toy k (the oracle default, k=8) would cost ~n^2/8 and melt at
    100 TB.

    The k-means fit touches only a sample sized ~200 points per centroid
    (quality saturates far below that at real corpus sizes); the returned
    centroid table is k x dim floats -- broadcast-sized up to the
    ``max_centroids`` cap. The count() is one column-pruned scan; at scale
    callers that already know n can size k themselves and call
    `kmeans_centroids` directly."""
    n = emb.count()
    k = int(max(2, min(max_centroids, -(-n // target_cell_size))))
    frac = min(1.0, (200.0 * k) / max(n, 1))
    return kmeans_centroids(
        emb, k, sample_fraction=frac, seed=seed, id_col=id_col, vec_col=vec_col
    )


def ivf_assign(
    emb: DataFrame,
    n_centroids: int | str,
    *,
    centroids: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign every vector to its nearest (max-cosine) centroid cell.

    ``centroids`` is any (cent_id, cv) DataFrame -- `seeded_centroids`
    (default; oracle-exact) or `kmeans_centroids` (trained); pass
    ``n_centroids="auto"`` for the `auto_centroids` corpus-scaled trained
    quantizer. Scale shape: centroids are broadcast; assignment is a
    map-only pass over the corpus (no shuffle). At rest the corpus would be
    written partitionBy(cell) so a probe touches only its cells' files.
    """
    if centroids is None and n_centroids == "auto":
        centroids = auto_centroids(emb, id_col=id_col, vec_col=vec_col)
    cent = (
        centroids
        if centroids is not None
        else seeded_centroids(emb, n_centroids, id_col=id_col, vec_col=vec_col)
    )
    # Exactly the argmax the old row_number window computed, VALUE-identical
    # (same double cosine, same tie-break: max over (cent_cos, -cent_id)
    # structs == ORDER BY cent_cos DESC, cent_id ASC), but as max_by so the
    # n x k candidate rows collapse to n via MAP-SIDE partial aggregation
    # inside the same task that generated them (the broadcast crossJoin
    # never repartitions) -- the old window SHUFFLED and sorted all n x k
    # rows, the dominant cost of every assignment pass at trained-k scale.
    # Norms are hoisted once per side (k + n fold evaluations instead of
    # 3 per pair): dot/(greatest(cn * vn, 1e-12)) multiplies the SAME two
    # doubles cosine() would, so every cosine is bit-identical and the
    # exact oracles stay green.
    c = F.broadcast(
        cent.select(
            "cent_id", "cv", norm(F.col("cv")).alias("_cn")
        )
    )
    v = emb.select(
        F.col(id_col), F.col(vec_col), norm(F.col(vec_col)).alias("_vn")
    )
    score = dot(F.col("cv"), F.col(vec_col)) / F.greatest(
        F.col("_cn") * F.col("_vn"), F.lit(1e-12)
    )
    return (
        c.crossJoin(v)
        .select(
            id_col,
            vec_col,
            "cent_id",
            score.alias("cent_cos"),
        )
        .groupBy(id_col)
        .agg(
            F.max_by(
                F.struct(F.col(vec_col).alias("v"), F.col("cent_id").alias("c")),
                F.struct(
                    F.col("cent_cos").alias("s"),
                    (-F.col("cent_id")).alias("nc"),
                ),
            ).alias("_b")
        )
        .select(
            id_col,
            F.col("_b.v").alias(vec_col),
            F.col("_b.c").alias("cell"),
        )
    )


def ivf_ann_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    *,
    n_centroids: int = 8,
    nprobe: int = 2,
    centroids: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: probe the query's ``nprobe`` nearest cells,
    exact cosine rerank within them. Recall rises with nprobe (= brute force
    at nprobe = n_centroids); cost is |probed cells| / n_centroids of the
    corpus per query. ``centroids`` swaps in a trained quantizer
    (`kmeans_centroids`) behind the same plan shape."""
    cent = (
        centroids
        if centroids is not None
        else seeded_centroids(emb, n_centroids, id_col=id_col, vec_col=vec_col)
    )
    assigned = ivf_assign(emb, n_centroids, centroids=cent, id_col=id_col, vec_col=vec_col)
    q = emb.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    # nprobe nearest cells per query
    qc = F.broadcast(q).crossJoin(F.broadcast(cent)).select(
        "query_id", "qv", "cent_id", cosine(F.col("cv"), F.col("qv")).alias("qc_cos")
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("qc_cos").desc(), F.col("cent_id").asc())
    probes = (
        qc.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= nprobe)
        .select("query_id", "qv", F.col("cent_id").alias("cell"))
    )
    cand = F.broadcast(probes).join(
        assigned.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv"), "cell"),
        "cell",
    ).filter(F.col("query_id") != F.col("neighbor_id"))
    scored = cand.select(
        "query_id", "neighbor_id", cosine(F.col("qv"), F.col("nv")).alias("cos_raw")
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


def cell_stats(
    emb: DataFrame,
    n_centroids: int = 8,
    *,
    centroids: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Corpus-diversity report over the embedding space: assign every
    vector to its IVF cell and summarize each cell -- member count, share
    of the corpus, mean/min cosine-to-centroid (how tight the cell is).
    The coverage dashboard of a training corpus: cells with huge counts are
    over-represented topics (dedup/downsample candidates), near-empty cells
    are coverage gaps, low mean-cosine cells are incoherent catch-alls.

    Shape: `ivf_assign`'s broadcast map-only pass keeps the per-vector
    cosine, then ONE groupBy(cell) -- at 10^9 vectors this is a scan plus
    an 8-to-4096-row aggregate. Seeded centroids keep it oracle-exact;
    a trained quantizer drops in via ``centroids``."""
    cent = (
        centroids
        if centroids is not None
        else seeded_centroids(emb, n_centroids, id_col=id_col, vec_col=vec_col)
    )
    scored = F.broadcast(cent).crossJoin(emb.select(F.col(id_col), F.col(vec_col))).select(
        id_col, "cent_id", cosine(F.col("cv"), F.col(vec_col)).alias("cent_cos")
    )
    w = Window.partitionBy(id_col).orderBy(F.col("cent_cos").desc(), F.col("cent_id").asc())
    assigned = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(id_col, F.col("cent_id").alias("cell"), "cent_cos")
    )
    n_total = emb.agg(F.count(F.lit(1)).alias("n_total"))
    return (
        assigned.groupBy("cell")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.round(F.avg("cent_cos"), 6).alias("mean_cos"),
            F.round(F.min("cent_cos"), 6).alias("min_cos"),
            F.min(id_col).alias("min_vec_id"),
        )
        .crossJoin(F.broadcast(n_total))
        .select(
            "cell",
            "n_members",
            F.round(F.col("n_members") / F.col("n_total"), 6).alias("share"),
            "mean_cos",
            "min_cos",
            "min_vec_id",
        )
    )


def cosine_scores_pandas(
    emb: DataFrame,
    query_ids: list[int],
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All (query, neighbor) cosine scores via an Arrow-batched numpy kernel.

    The vectorized twin of the JVM fold in `cosine`: query vectors are
    collected once (tiny), closed over, and each corpus partition scores a
    whole Arrow batch with one BLAS matmul -- the right shape for wide
    vectors where per-element fold cost dominates. mapInPandas => map-only,
    no shuffle; ranking happens downstream on the JVM."""
    import numpy as np

    rows = (
        emb.filter(F.col(id_col).isin(query_ids))
        .select(id_col, vec_col)
        .collect()
    )
    q_ids = np.array([r[0] for r in rows], dtype=np.int64)
    q_mat = np.array([r[1] for r in rows], dtype=np.float64)
    q_norm = np.sqrt((q_mat * q_mat).sum(axis=1))

    def score(batches):
        import pandas as pd

        for pdf in batches:
            n_mat = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            n_norm = np.sqrt((n_mat * n_mat).sum(axis=1))
            # same zero-vector guard as the JVM `cosine`: clamp the
            # denominator so an all-zero embedding scores 0.0, not NaN
            denom = np.maximum(q_norm[:, None] * n_norm[None, :], 1e-12)
            sims = (q_mat @ n_mat.T) / denom
            n_ids = pdf[id_col].to_numpy()
            nq, nn = sims.shape
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(q_ids, nn),
                    "neighbor_id": np.tile(n_ids, nq),
                    "cos_raw": sims.ravel(),
                }
            )

    out_schema = "query_id long, neighbor_id long, cos_raw double"
    return emb.select(id_col, vec_col).mapInPandas(score, out_schema).filter(
        F.col("query_id") != F.col("neighbor_id")
    )


def cosine_topk_pandas(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k using the numpy scoring kernel + JVM window ranking --
    result-identical to `cosine_topk`, different physical plan."""
    scored = cosine_scores_pandas(emb, query_ids, id_col=id_col, vec_col=vec_col)
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


def quantize_int8_summary(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Scalar int8 quantization per vector (the 4x storage / memory-bandwidth
    compression step of a serving index): scale = 127 / max|x|, q_i =
    floor(x_i * scale + 0.5) -- floor(+0.5) instead of round() because its
    half-up semantics are bit-identical across engines, which round()'s
    half-even is not guaranteed to be.

    Pure JVM transform, map-only. Output summarizes the quantized vector as
    (scale, L1 norm, md5 of the comma-joined values) -- the md5 pins every
    quantized component exactly while keeping the oracle compare scalar."""
    arr = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    # all-zero vector guard: max|x| = 0 would cascade 127/0 -> inf -> NaN
    # quantized values; the epsilon clamps scale and quantizes zeros to zeros
    # (the oracle carries the identical greatest(), so the check stays exact)
    mx = F.greatest(F.array_max(F.transform(arr, F.abs)), F.lit(1e-12))
    scale = F.lit(127.0) / mx
    q = F.transform(arr, lambda x: F.floor(x * scale + 0.5).cast("long"))
    return emb.select(
        F.col(id_col),
        F.round(scale, 6).alias("scale"),
        F.aggregate(q, F.lit(0).cast("long"), lambda a, x: a + F.abs(x)).alias("q_l1"),
        F.md5(F.concat_ws(",", F.transform(q, lambda x: x.cast("string")))).alias("q_md5"),
    )


# 4 independent sign-LSH tables (bands) of 4 coordinate hyperplanes each,
# spread across the vector so band bits stay uncorrelated. Recall for a pair
# with angle t: 1 - (1 - p^4)^4 with p = 1 - t/pi -- the band count / band
# width trade-off is exactly MinHash LSH's, tuned the same way.
DEFAULT_NEAR_DUP_BANDS: tuple[tuple[int, ...], ...] = (
    (1, 5, 9, 13),
    (17, 21, 25, 29),
    (33, 37, 41, 45),
    (49, 53, 57, 61),
)


def near_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.4,
    *,
    band_dims: tuple[tuple[int, ...], ...] = DEFAULT_NEAR_DUP_BANDS,
    exact: bool = False,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (i < j, cosine >= threshold).

    Default (scale) path: multi-band sign LSH. Each band hashes the vector
    to a short bit string (`sign_bucket` over that band's dims); candidates
    are pairs sharing ANY band's full signature -- one EQUI-join on
    (band, signature) after a posexplode, `id_a < id_b` as a post-join
    filter, never a nested-loop condition. Then the exact cosine filter.
    Same shape as `minhash_lsh_pairs` for text: the n^2 pair space is never
    built, at the price of recall (a pair differing in every band is
    missed), tunable via band count/width. Everything is deterministic, so
    this path still ships an exact SQL oracle.

    ``exact=True`` is the all-pairs form: a non-equi join Spark executes as
    BroadcastNestedLoopJoin -- O(n^2), small-n oracle twin and recall
    baseline ONLY, never the path for a real corpus."""
    if exact:
        a = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
        b = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
        cand = a.join(b, F.col("id_a") < F.col("id_b"))
        score = cosine(F.col("va"), F.col("vb"))
    else:
        # normalize ONCE (norm hoisted to a column, never inside the
        # transform lambda) so the per-candidate test is a single dot
        # product -- same trade as semantic_dedup, oracle mirrors the
        # formula. Sign buckets are scale-invariant, so banding on the
        # normalized vector is bit-identical to banding on the raw one.
        normed = emb.withColumn(
            "_norm", F.greatest(norm(F.col(vec_col)), F.lit(1e-12))
        ).withColumn(
            "_nv", F.transform(F.col(vec_col), lambda x: x.cast("double") / F.col("_norm"))
        )
        sigs = F.array(*[sign_bucket(F.col("_nv"), d) for d in band_dims])
        # the band self-join carries IDS ONLY: the raw per-band candidate
        # multiset is pairs-heavy (every shared band re-emits the pair), and
        # dragging two d-dim arrays per row through that join + the
        # dropDuplicates shuffle is the dominant cost. Dedupe the narrow id
        # pairs first, then attach each side's normalized vector by id.
        # persisted x2: neither self-join side nor the two vector joins
        # share a physical subtree, so each frame would otherwise recompute.
        banded = tracked_persist(normed.select(
            F.col(id_col), F.posexplode(sigs).alias("band", "sig")
        ))
        a = banded.select(F.col(id_col).alias("id_a"), "band", "sig")
        b = banded.select(
            F.col(id_col).alias("id_b"),
            F.col("band").alias("band_b"), F.col("sig").alias("sig_b"),
        )
        cand_ids = a.join(
            b,
            (F.col("band") == F.col("band_b"))
            & (F.col("sig") == F.col("sig_b"))
            & (F.col("id_a") < F.col("id_b")),
        ).select("id_a", "id_b").dropDuplicates(["id_a", "id_b"])
        vecs = tracked_persist(normed.select(F.col(id_col).alias("_vid"), F.col("_nv")))
        cand = cand_ids.join(
            vecs.select(F.col("_vid").alias("id_a"), F.col("_nv").alias("va")), "id_a"
        ).join(
            vecs.select(F.col("_vid").alias("id_b"), F.col("_nv").alias("vb")), "id_b"
        )
        score = dot(F.col("va"), F.col("vb"))
    return (
        cand.select("id_a", "id_b", score.alias("cos_raw"))
        .filter(F.col("cos_raw") >= threshold)
        .select("id_a", "id_b", F.round("cos_raw", 6).alias("cosine"))
    )


def semantic_dedup(
    emb: DataFrame,
    threshold: float = 0.4,
    n_centroids: int | str = 8,
    *,
    centroids: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication by clustering-then-pruning. Every vector is assigned to
    its nearest centroid cell (`ivf_assign`); within each cell, pairs with
    cosine >= ``threshold`` are duplicates and the HIGHER id of each pair
    is marked -- so each duplicate chain keeps exactly its lowest id, a
    deterministic stand-in for SemDeDup's keep-one-per-group rule.

    The clustering is what makes this scale: candidate pairs are generated
    by an EQUI-join on the cell key (cost sum over cells of |cell|^2, vs
    n^2 all-pairs), the exact trade the paper makes -- cross-cell
    duplicates are unseen by construction. With `seeded_centroids`
    (default) the whole operator is SQL-reproducible; a trained
    `kmeans_centroids` quantizer drops in via ``centroids`` for balanced
    cells at corpus scale, and ``n_centroids="auto"`` applies the
    `auto_centroids` scaling rule (k = n / target cell size, trained) so
    the pair-join cost stays LINEAR in the corpus -- the toy k=8 seeded
    default exists for oracle-exactness, not for scale.

    Returns one row per vector: (vec_id, cell, is_dup).

    Perf: vectors are L2-normalized ONCE before the pair join (norm hoisted
    to its own column first -- never inside the transform lambda), so the
    per-pair test is a single dot product instead of dot + two norms:
    cosine work drops from O(pairs x 3d) to O(n x d) normalize + O(pairs x d)
    dot. Measured 10.4 s -> ~5 s at sf0.1. The oracle mirrors the same
    normalize-then-dot formula so float rounding stays in lockstep."""
    if centroids is None and n_centroids == "auto":
        centroids = auto_centroids(emb, id_col=id_col, vec_col=vec_col)
    assigned = ivf_assign(
        emb, n_centroids, centroids=centroids, id_col=id_col, vec_col=vec_col
    )
    # persist the assigned+normalized frame (r14, guide §1.2): it feeds BOTH
    # sides of the cell self-join and the final keep/dup projection --
    # unpersisted, the fold-cosine cell assignment re-ran once per consumer
    normed = tracked_persist(
        assigned.withColumn("_norm", F.greatest(norm(F.col(vec_col)), F.lit(1e-12)))
        .withColumn(
            "_nv",
            F.transform(F.col(vec_col), lambda x: x.cast("double") / F.col("_norm")),
        )
    )
    a = normed.select(F.col(id_col).alias("id_a"), F.col("_nv").alias("va"), "cell")
    b = normed.select(
        F.col(id_col).alias("id_b"), F.col("_nv").alias("vb"), F.col("cell").alias("cell_b")
    )
    dup_ids = (
        a.join(b, (F.col("cell") == F.col("cell_b")) & (F.col("id_a") < F.col("id_b")))
        .filter(dot(F.col("va"), F.col("vb")) >= threshold)
        .select(F.col("id_b").alias("dup_id"))
        .distinct()
    )
    return (
        # project from the PERSISTED normed frame (same assigned columns),
        # so the final pass reads the cache instead of re-assigning
        normed.select(F.col(id_col).alias("vec_id"), "cell")
        .join(F.broadcast(dup_ids), F.col("vec_id") == F.col("dup_id"), "left")
        .select("vec_id", "cell", F.col("dup_id").isNotNull().alias("is_dup"))
    )


def semantic_dedup_witness(
    emb: DataFrame,
    threshold: float = 0.4,
    *,
    centroids: DataFrame | None = None,
    n_centroids: int | str = 8,
    assigned: DataFrame | None = None,
    vectorized_assign: bool = False,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup prune-rule CONTRACT witnesses (the pagerank-converged
    pattern from round 7, applied per VERDICT r10 item 1): run the same
    clustering-then-pruning as `semantic_dedup`, but return per-vector
    boolean witnesses of the prune rule instead of the (non-SQL-
    reproducible, quantizer-dependent) dup flags --

      dup_has_partner_ok:  is_dup  =>  some LOWER-id vector in my cell
                           has cosine >= threshold with me
      keeper_has_none_ok:  not is_dup  =>  no such partner exists

    The two directions are derived through two INDEPENDENT routes from
    the cell assignment down (ADVICE r11 -- the first cut shared one
    persisted pair frame between the routes, so a bug in normalization
    or the in-cell pair join corrupted both identically and the
    witnesses stayed TRUE): route A is the production rule verbatim --
    normalize-then-dot pair frame, filter -> distinct dup-id set ->
    broadcast anti-shape join, shape-for-shape `semantic_dedup`; route
    B re-derives its OWN pair frame from the RAW vectors with a
    reversed join construction (b-side joins a-side, id_b > id_a) and a
    different cosine formula (dot(raw)/(|a|*|b|) instead of
    dot-of-pre-normalized), then reduces by max lower-id partner
    cosine. A bug anywhere below the assignment -- normalization, the
    pair equi-join, a dropped dup id, a broadcast-join miss, a
    threshold drift -- now hits the two routes differently and flips a
    witness to false, redding the hash check. What the witnesses do NOT
    certify is the cell assignment itself (both routes are CONDITIONED
    on it by design -- that is what frees the quantizer to be trained);
    assignment quality is certified separately by the agreement-audit
    rows (`embedding_two_level_agreement`,
    `embedding_assign_arrow_agreement`) and the brute-force pytest.
    The two cosine formulas differ in the last ulp; both routes
    therefore compare through integer micro-cosines (floor(x*1e6+0.5),
    the bitext-mining pattern -- ADVICE r12), so a representation tie
    exactly at threshold can no longer split the routes on regenerated
    or production-scale data: a witness flip now means a logic bug
    below the assignment, not float formatting. Pair cost is two cell-bounded equi-joins (route
    A's frame persisted; route B is audit-class, paid only by witness
    rows).

    ``assigned`` short-circuits the quantizer: pass any
    (id_col, vec_col, cell) frame (e.g. a `two_level_assign` routing
    joined back to vectors) and the witnesses certify the prune rule
    over exactly those cells. Returns (vec_id, dup_has_partner_ok,
    keeper_has_none_ok)."""
    if assigned is None:
        if centroids is None and n_centroids == "auto":
            centroids = auto_centroids(emb, id_col=id_col, vec_col=vec_col)
        if vectorized_assign and centroids is not None:
            # Arrow/BLAS flat assignment (VERDICT r11 item 7): legal here
            # precisely because the witness contract is conditioned on
            # the actual cells -- any argmax-level assignment is a valid
            # quantizer, and the `embedding_assign_arrow_agreement` row
            # MEASURES the ulp-tie disagreement rate vs the fold-exact
            # path instead of assuming it. keep_vec carries the vector
            # through the map-only pass (no corpus re-join). Never the
            # default: fold-exact stays wherever an oracle replays the
            # assignment arithmetic.
            assigned = assign_cells_arrow(
                emb, centroids, id_col=id_col, vec_col=vec_col, keep_vec=True
            )
        else:
            assigned = ivf_assign(
                emb, n_centroids, centroids=centroids, id_col=id_col, vec_col=vec_col
            )
    # the assignment feeds FOUR consumers now that route B is independent
    # (route A's pair frame, the flagged key set, route B's two pair
    # sides); without a persist the quantizer pass -- the expensive part
    # at trained k -- re-executes per consumer (r12: the independent
    # route B doubled the sf1 wall until this landed)
    assigned = tracked_persist(assigned)
    normed = assigned.withColumn(
        "_norm", F.greatest(norm(F.col(vec_col)), F.lit(1e-12))
    ).withColumn(
        "_nv",
        F.transform(F.col(vec_col), lambda x: x.cast("double") / F.col("_norm")),
    )
    a = normed.select(F.col(id_col).alias("id_a"), F.col("_nv").alias("va"), "cell")
    b = normed.select(
        F.col(id_col).alias("id_b"),
        F.col("_nv").alias("vb"),
        F.col("cell").alias("cell_b"),
    )
    pair_cos = tracked_persist(
        a.join(
            b, (F.col("cell") == F.col("cell_b")) & (F.col("id_a") < F.col("id_b"))
        ).select("id_b", dot(F.col("va"), F.col("vb")).alias("_cos"))
    )
    # Both routes compare through integer MICRO-cosines (floor(x*1e6+0.5),
    # the engine-portable bitext-mining pattern -- ADVICE r12): the two
    # cosine formulas differ in the last ulp, and a representation tie
    # exactly at threshold would otherwise flip one route's compare and
    # red the all-TRUE oracle with no engine bug. After quantization the
    # routes can only diverge when a cosine sits within ~1 ulp of the
    # exact micro-boundary that IS the threshold -- i.e. on genuine
    # logic bugs, not float formatting.
    mthr = math.floor(threshold * 1e6 + 0.5)
    micro = lambda c: F.floor(c * F.lit(1e6) + F.lit(0.5))  # noqa: E731
    # route A: the production prune rule, shape-for-shape semantic_dedup
    dup_ids = (
        pair_cos.filter(micro(F.col("_cos")) >= F.lit(mthr))
        .select(F.col("id_b").alias("dup_id"))
        .distinct()
    )
    flagged = (
        assigned.select(F.col(id_col).alias("vec_id"))
        .join(F.broadcast(dup_ids), F.col("vec_id") == F.col("dup_id"), "left")
        .select("vec_id", F.col("dup_id").isNotNull().alias("_is_dup"))
    )
    # route B: INDEPENDENT pair generation from the RAW vectors (ADVICE
    # r11) -- reversed join construction, dot/(|a|*|b|) cosine, max
    # lower-id partner reduction. Shares nothing below `assigned` with
    # route A, so the normalization + pair-join layers are exercised
    # twice, structurally differently.
    # norms hoisted per SIDE (one fold per vector, not two per pair) --
    # greatest(norm(x), 1e-12) is computed on the same doubles either
    # way, so every pair cosine is bit-identical to the unhoisted form
    ra = assigned.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("rva"),
        F.greatest(norm(F.col(vec_col)), F.lit(1e-12)).alias("_na"),
        F.col("cell").alias("cell_a"),
    )
    rb = assigned.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("rvb"),
        F.greatest(norm(F.col(vec_col)), F.lit(1e-12)).alias("_nb"),
        F.col("cell").alias("cell_rb"),
    )
    raw_cos = rb.join(
        ra, (F.col("cell_rb") == F.col("cell_a")) & (F.col("id_b") > F.col("id_a"))
    ).select(
        "id_b",
        (dot(F.col("rva"), F.col("rvb")) / (F.col("_na") * F.col("_nb"))).alias(
            "_cos"
        ),
    )
    # floor is monotone, so quantize-after-max == max-of-quantized; the
    # compare happens in the same integer micro-space as route A's
    best = raw_cos.groupBy(F.col("id_b").alias("vec_id")).agg(
        F.max("_cos").alias("_best")
    )
    has_partner = F.coalesce(micro(F.col("_best")) >= F.lit(mthr), F.lit(False))
    return flagged.join(best, "vec_id", "left").select(
        "vec_id",
        (~F.col("_is_dup") | has_partner).alias("dup_has_partner_ok"),
        (F.col("_is_dup") | ~has_partner).alias("keeper_has_none_ok"),
    )


# ------------------------------------------------------------------ PQ

PQ_SUBSPACES = 4
PQ_CODES = 16


def _l2sq(a: Column, b: Column) -> Column:
    """Squared L2 distance between two equal-length array columns, as a
    left-to-right JVM fold (same association order as the oracle's indexed
    list_transform + list_sum)."""
    return F.aggregate(
        F.zip_with(
            a, b, lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double"))
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def pq_codebook(
    emb: DataFrame,
    m: int = PQ_SUBSPACES,
    n_codes: int = PQ_CODES,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Seeded product-quantization codebook (Jegou et al. 2011, "Product
    Quantization for Nearest Neighbor Search"): split the dimension into
    ``m`` contiguous subspaces; subspace ``s``'s codebook is the s-th
    sub-vector of the first ``n_codes`` vectors by id. Deterministic (the
    PQ analog of `seeded_centroids`), so every query built on it keeps an
    exact SQL oracle; a k-means-per-subspace trainer could replace this
    behind the same nested-list contract.

    The collect is calibration-scale (n_codes rows), mirroring the 5-query
    collect in `cosine_scores_pandas` -- never corpus-scale."""
    rows = sorted(
        emb.filter(F.col(id_col) < n_codes).select(id_col, vec_col).collect(),
        key=lambda r: r[0],
    )
    dim = len(rows[0][1])
    sub = dim // m
    return [
        [[float(x) for x in r[1][s * sub : (s + 1) * sub]] for r in rows]
        for s in range(m)
    ]


def pq_codes(
    emb: DataFrame,
    m: int = PQ_SUBSPACES,
    n_codes: int = PQ_CODES,
    *,
    codebook: list[list[list[float]]] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ-encode the corpus: each vector becomes ``m`` small code ids (the
    argmin-L2 codebook entry per subspace) -- a 64-float embedding
    compresses to 4 bytes here, the memory trick that lets billion-vector
    indexes fit in RAM.

    Scale shape: the codebook is a LITERAL nested-array expression
    (m x n_codes x sub_dim floats), so encoding is map-only whole-stage
    codegen over the corpus -- no join, no shuffle, nothing data-sized on
    the driver. Ties in the argmin break to the lowest code id via
    `array_position`'s first-match rule, matching the oracle's
    (dist, code_id) sort.

    Returns (vec_id, codes array<long>, recon_err, code_md5): recon_err is
    the summed squared quantization error (the fidelity metric PQ papers
    report); code_md5 pins the exact code assignment."""
    cb = codebook if codebook is not None else pq_codebook(
        emb, m, n_codes, id_col=id_col, vec_col=vec_col
    )
    sub = len(cb[0][0])
    vec = F.col(vec_col)
    code_cols, err_cols = [], []
    for s in range(m):
        cb_lit = F.array(
            *[F.array(*[F.lit(x) for x in code]) for code in cb[s]]
        )
        subvec = F.slice(vec, s * sub + 1, sub)
        dists = F.transform(cb_lit, lambda code: _l2sq(subvec, code))
        best = F.array_min(dists)
        code_cols.append((F.array_position(dists, best) - 1).cast("long"))
        err_cols.append(best)
    total_err = err_cols[0]
    for e in err_cols[1:]:
        total_err = total_err + e
    return emb.select(
        F.col(id_col).alias("vec_id"),
        F.array(*code_cols).alias("codes"),
        F.round(total_err, 6).alias("recon_err"),
        F.md5(F.concat_ws(",", *[c.cast("string") for c in code_cols])).alias("code_md5"),
    )


def pq_codes_arrow(
    emb: DataFrame,
    m: int = PQ_SUBSPACES,
    n_codes: int = PQ_CODES,
    *,
    codebook: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Arrow/numpy twin of `pq_codes` (r15, guide §4.2 -- the
    `assign_cells_arrow` pattern applied to PQ encoding): one batched
    ((V_s - C_s)^2).sum matmul-shaped pass per subspace instead of the
    Catalyst lambda fold per (vector x code x dim), which measured ~1.5 s
    per corpus pass at sf0.1 against ~0.1 s here. Same argmin-ties-to-
    lowest-code rule (np.argmin first index == array_position first
    match); float sums differ from the JVM fold in the last ulp, so ONLY
    callers whose contract has margin (the recall-flag and
    err-improvement rows) may use it -- every exact-oracle surface
    (embedding_pq_codes, embedding_pq_topk, the persisted index builds)
    stays on the fold-exact `pq_codes`. Returns (vec_id, codes,
    recon_err) -- no code_md5: the twin is never hashed."""
    import numpy as np
    import pandas as pd

    C = [np.asarray(cb_s, dtype=np.float64) for cb_s in codebook]
    sub = C[0].shape[1]

    def enc(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            codes = np.empty((len(V), m), dtype=np.int64)
            err = np.zeros(len(V), dtype=np.float64)
            for s in range(m):
                Vs = V[:, s * sub : (s + 1) * sub]
                d = ((Vs[:, None, :] - C[s][None, :, :]) ** 2).sum(axis=2)
                codes[:, s] = np.argmin(d, axis=1)
                err += d[np.arange(len(V)), codes[:, s]]
            yield pd.DataFrame(
                {
                    "vec_id": pdf[id_col].to_numpy(),
                    "codes": list(codes),
                    "recon_err": np.round(err, 6),
                }
            )

    return emb.select(id_col, vec_col).mapInPandas(
        enc, "vec_id long, codes array<long>, recon_err double"
    )


def adc_distance(cb: list[list[list[float]]], qv: Column, codes: Column) -> Column:
    """The ADC estimator as one literal-codebook expression: sum over
    subspaces of L2^2(query sub-vector, codebook[code]). Shared by the
    in-plan search and the persisted-index query path so both rank with
    bit-identical math."""
    m = len(cb)
    sub = len(cb[0][0])
    adc = None
    for s in range(m):
        cb_lit = F.array(*[F.array(*[F.lit(x) for x in code]) for code in cb[s]])
        qsub = F.slice(qv, s * sub + 1, sub)
        code_vec = F.element_at(cb_lit, (F.element_at(codes, s + 1) + 1).cast("int"))
        d = _l2sq(qsub, code_vec)
        adc = d if adc is None else adc + d
    return adc


def pq_adc_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    m: int = PQ_SUBSPACES,
    n_codes: int = PQ_CODES,
    *,
    vectorized: bool = False,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ asymmetric-distance top-k: queries stay exact, corpus vectors are
    represented only by their PQ codes; distance(query, doc) = sum over
    subspaces of L2^2(query sub-vector, codebook[doc's code]) -- the ADC
    estimator of Jegou et al. 2011, ranked ascending.

    Scale shape: the corpus side carries ONLY (vec_id, codes) -- the
    encoded table one would persist at rest; full vectors never re-enter
    the search. The broadcast query side x encoded corpus is the same
    bounded nested-loop contract as `cosine_topk` (O(queries) rows), and
    the per-row distance is a literal-codebook lookup via element_at --
    no join against a codebook table, no shuffle before the top-k
    window.

    ``vectorized=True`` (r15, guide §4.2): encode through `pq_codes_arrow`
    and evaluate ADC as per-query LUT lookups inside one mapInPandas pass
    -- the classic ADC serving trick (the query's m x n_codes distance
    table is precomputed once on the driver from the |Q|-bounded query
    fetch, and each corpus row pays m table lookups). Last-ulp float
    differences vs the fold make this legal only for margin-contract
    callers (the recall-flag rows); `embedding_pq_topk`'s exact-oracle
    surface stays fold-exact."""
    cb = pq_codebook(emb, m, n_codes, id_col=id_col, vec_col=vec_col)
    sub = len(cb[0][0])
    if vectorized:
        import numpy as np
        import pandas as pd

        codes = pq_codes_arrow(
            emb, m, n_codes, codebook=cb, id_col=id_col, vec_col=vec_col
        )
        q_pdf = (
            emb.filter(F.col(id_col).isin(query_ids))
            .select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
            .toPandas()
        )  # |Q|-bounded driver fetch, the cosine_topk broadcast contract
        C = [np.asarray(cb_s, dtype=np.float64) for cb_s in cb]
        luts = {}
        for qid, qv in zip(q_pdf["query_id"], q_pdf["qv"]):
            qv = np.asarray(qv, dtype=np.float64)
            luts[int(qid)] = np.stack(
                [
                    ((qv[s * sub : (s + 1) * sub][None, :] - C[s]) ** 2).sum(
                        axis=1
                    )
                    for s in range(m)
                ]
            )  # (m, n_codes)

        def adc_rows(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                codes_mat = np.asarray(list(pdf["codes"]), dtype=np.int64)
                nid = pdf["vec_id"].to_numpy()
                for qid, lut in luts.items():
                    d = np.zeros(len(pdf), dtype=np.float64)
                    for s in range(m):
                        d += lut[s][codes_mat[:, s]]
                    keep = nid != qid
                    yield pd.DataFrame(
                        {
                            "query_id": np.full(keep.sum(), qid, dtype=np.int64),
                            "neighbor_id": nid[keep],
                            "adc_raw": d[keep],
                        }
                    )

        scored = codes.mapInPandas(
            adc_rows, "query_id long, neighbor_id long, adc_raw double"
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("adc_raw").asc(), F.col("neighbor_id").asc()
        )
        return (
            scored.withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= k)
            .select(
                "query_id", "neighbor_id", "rank",
                F.round("adc_raw", 6).alias("adc_dist"),
            )
        )
    codes = pq_codes(emb, m, n_codes, codebook=cb, id_col=id_col, vec_col=vec_col)
    q = emb.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    joined = F.broadcast(q).join(
        codes.select(F.col("vec_id").alias("neighbor_id"), "codes"),
        F.col("query_id") != F.col("neighbor_id"),
    )
    adc = adc_distance(cb, F.col("qv"), F.col("codes"))
    w = Window.partitionBy("query_id").orderBy(F.col("adc_raw").asc(), F.col("neighbor_id").asc())
    return (
        joined.select("query_id", "neighbor_id", adc.alias("adc_raw"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("adc_raw", 6).alias("adc_dist"))
    )


# ---------------------------------------------------------------- random projection


def rademacher_matrix(d: int, k: int, seed: str = "rp") -> list[list[float]]:
    """Deterministic k x d Rademacher projection matrix: entry (i, j) is
    +-1/sqrt(k) by the parity of md5(f"{seed}_{i}_{j}") -- the
    Johnson-Lindenstrauss construction of Achlioptas 2003 (database-friendly
    random projections), with the hash replacing an RNG so every engine
    (and the DuckDB oracle) can regenerate the identical matrix from the
    seed string alone."""
    import hashlib
    import math

    inv = 1.0 / math.sqrt(k)
    return [
        [
            inv
            if int(hashlib.md5(f"{seed}_{i}_{j}".encode()).hexdigest()[:8], 16) % 2 == 0
            else -inv
            for j in range(d)
        ]
        for i in range(k)
    ]


def random_projection(
    emb: DataFrame,
    k: int = 16,
    seed: str = "rp",
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Project embeddings to k dims through the seeded Rademacher matrix:
    p_i = <vec, row_i>. JL guarantees pairwise distances survive within
    (1 +- eps) at k = O(log n / eps^2), so downstream ANN / near-dup runs
    on a 4x smaller vector with bounded recall loss.

    Scale shape: the matrix rides into the plan as k literal arrays --
    map-only whole-stage-codegen arithmetic, nothing shuffles, nothing is
    broadcast, no Python in the row path. Output: id + p00..p{k-1} rounded
    to 6 dp (scalar columns, so the driver's float-rounding compare applies
    per component)."""
    mat = rademacher_matrix(dim, k, seed)
    return emb.select(
        F.col(id_col).alias("vec_id"),
        *[
            F.round(dot(F.col(vec_col), F.array(*[F.lit(v) for v in row])), 6).alias(
                f"p{i:02d}"
            )
            for i, row in enumerate(mat)
        ],
    )


# ---------------------------------------------------------------- centroid outliers


def centroid_outliers(
    emb: DataFrame,
    z_threshold: float = 2.0,
    *,
    id_col: str = "vec_id",
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-label centroid outlier scoring: each vector's L2 distance to its
    label's mean vector, z-scored within the label; |z| > threshold flags
    the vector as a label-noise / contamination candidate (the embedding-
    space QA pass a curation pipeline runs after clustering or labeling).

    Scale shape: centroids come from ONE posexplode -> (label, pos) agg --
    the explode is map-side-combined into labels x d partial sums, so the
    shuffle moves O(labels x d) rows regardless of corpus size. The
    centroid table (labels x d, tiny) pivots back to arrays and BROADCASTS;
    the distance pass is then map-only zip_with arithmetic over the corpus.
    The per-label mean/stddev of the distance runs on the already-reduced
    (label, dist) pairs -- one more labels-cardinality agg, broadcast back.
    The corpus shuffles ZERO times end to end."""
    ex = emb.select(label_col, F.posexplode(vec_col).alias("pos", "val"))
    cent = (
        ex.groupBy(label_col, "pos")
        .agg(F.avg("val").alias("c"))
        .groupBy(label_col)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "c"))), lambda s: s["c"]
            ).alias("centroid")
        )
    )
    dist = (
        emb.join(F.broadcast(cent), label_col)
        .select(
            F.col(id_col).alias("vec_id"),
            F.col(label_col).alias("label"),
            F.sqrt(
                F.aggregate(
                    F.zip_with(
                        F.col(vec_col),
                        F.col("centroid"),
                        lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
                    ),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                )
            ).alias("dist"),
        )
    )
    stats = dist.groupBy("label").agg(
        F.avg("dist").alias("mu"), F.stddev_samp("dist").alias("sd")
    )
    return (
        dist.join(F.broadcast(stats), "label")
        .select(
            "vec_id",
            "label",
            F.round("dist", 6).alias("dist"),
            F.round(
                (F.col("dist") - F.col("mu")) / F.nullif(F.col("sd"), F.lit(0.0)), 4
            ).alias("z_score"),
        )
        .withColumn("is_outlier", F.coalesce(F.col("z_score") > z_threshold, F.lit(False)))
    )


# ---------------------------------------------------------------- PCA


def pca_fit(
    emb: DataFrame,
    k: int = 4,
    *,
    vec_col: str = "embedding",
):
    """Fit a k-component PCA over big-n / small-d embeddings the way it is
    actually done at 100 TB: ONE distributed pass accumulates the moment
    statistics (n, sum vector, sum of outer products) as numpy matmuls per
    Arrow batch inside mapInPandas -- each partition emits a single
    (n, d, d*d)-sized row, so the driver fetch is bounded by partition
    count, never by data (the treeAggregate shape). The d x d sample
    covariance (S - n*mu*mu^T)/(n-1) is then eigendecomposed driver-side
    with numpy.linalg.eigh (d = 64: trivial), components sign-canonicalized
    (largest-|entry| coordinate made positive) so the fit is deterministic
    up to float summation order.

    Returns (components [k x d, rows = descending eigenvalue],
    eigenvalues [k], mean [d], n)."""
    return pca_from_moments(*pca_moments(emb, vec_col=vec_col), k=k)


def pca_moments(emb: DataFrame, *, vec_col: str = "embedding"):
    """The distributed half of the PCA fit: ONE Arrow pass over the corpus
    accumulating the sufficient statistics (n, sum vector s, raw second
    moment X^T X). These are ASSOCIATIVE -- moments of two corpus halves
    ADD to the moments of the whole -- which is what makes the fit
    incrementally maintainable: persist (n, s, ss) beside a released
    corpus, and refreshing the PCA for an appended batch costs one pass
    over the NEW rows only, never a refit of the old ones (the same
    append contract as the IVF index). Returns (n, s [d], ss [d x d])."""
    import numpy as np

    probe = emb.select(vec_col).first()
    if probe is None:
        raise ValueError(
            "pca_moments: input has no rows -- moments are undefined on an "
            "empty corpus (callers accumulating per micro-batch should skip "
            "empty batches; see streaming.jobs.stream_pca_maintenance)"
        )
    d_probe = len(probe[0])

    def partials(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            yield pd.DataFrame(
                {
                    "n": [x.shape[0]],
                    "s": [x.sum(axis=0).tolist()],
                    "ss": [(x.T @ x).ravel().tolist()],
                }
            )

    rows = (
        emb.select(vec_col)
        .mapInPandas(partials, "n long, s array<double>, ss array<double>")
        .collect()
    )  # bounded: one row per Arrow batch, not per data row
    n = int(sum(r["n"] for r in rows))
    s = np.sum([r["s"] for r in rows], axis=0)
    ss = np.sum([r["ss"] for r in rows], axis=0).reshape(d_probe, d_probe)
    return n, s, ss


def pca_merge_moments(m1, m2):
    """Merge two moment triples -- the append step. Pure addition."""
    return m1[0] + m2[0], m1[1] + m2[1], m1[2] + m2[2]


def pca_from_moments(n: int, s, ss, k: int = 4):
    """The driver half of the PCA fit: sample covariance from the moment
    triple, numpy.linalg.eigh, top-k by descending eigenvalue,
    sign-canonicalized (largest-|entry| coordinate positive) so the fit is
    deterministic up to float summation order."""
    import numpy as np

    if n <= 1:
        raise ValueError(
            f"pca_from_moments: need n >= 2 vectors for a sample "
            f"covariance (got n={n})"
        )
    mu = np.asarray(s, dtype=np.float64) / n
    cov = (np.asarray(ss, dtype=np.float64) - n * np.outer(mu, mu)) / (n - 1)
    eigval, eigvec = np.linalg.eigh(cov)  # ascending
    order = np.argsort(eigval)[::-1][:k]
    comps = eigvec[:, order].T
    flips = np.sign(comps[np.arange(len(order)), np.abs(comps).argmax(axis=1)])
    comps = comps * flips[:, None]
    return comps, eigval[order], mu, int(n)


def pca_project(
    emb: DataFrame,
    components,
    mean,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Project embeddings onto fitted PCA components: p_k = <v - mu, c_k>
    = <v, c_k> - <mu, c_k> with the mean dot FOLDED to a scalar constant,
    so like random_projection the whole pass is map-only whole-stage-
    codegen JVM arithmetic over literal component arrays -- nothing
    shuffles, no Python in the row path."""
    import numpy as np

    mu_dots = [float(np.dot(mean, c)) for c in components]
    return emb.select(
        F.col(id_col).alias("vec_id"),
        *[
            (
                dot(F.col(vec_col), F.array(*[F.lit(float(v)) for v in c]))
                - F.lit(mu_dots[i])
            ).alias(f"pc{i}")
            for i, c in enumerate(components)
        ],
    )


# ------------------------------------------------------- hard-negative mining


def hard_negatives(
    emb: DataFrame,
    k: int = 3,
    *,
    cand_per_band: int = 8,
    min_cos: float = 0.0,
    band_dims: tuple[tuple[int, ...], ...] = DEFAULT_NEAR_DUP_BANDS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Hard-negative mining for contrastive/retrieval training: for every
    anchor vector, the k most-cosine-similar vectors with a DIFFERENT
    label -- the near-misses a bi-encoder must learn to push apart, the
    pair-mining stage of every dense-retrieval training pipeline.

    Scale shape -- OUTPUT-bounded, not collision-bounded: candidates come
    from the same multi-band sign-LSH buckets as near_dup_pairs, but each
    bucket's members are ranked by id (one row_number window over the n *
    n_bands banded rows) and an anchor pairs only with its next
    ``cand_per_band`` bucket neighbors (a deterministic "ring" join: pos
    difference in [1, cand_per_band] as the post-equi-join filter). Every
    anchor therefore feeds AT MOST 2 * n_bands * cand_per_band candidate
    rows into the cosine/label/top-k shuffles regardless of how hot a
    bucket is -- the max_df stop-word idea applied to band collisions,
    closing the one unbounded-shuffle caveat of the threshold-0 form (a
    degenerate all-same-signature corpus used to cost n^2/2 candidates;
    now 4*8*n). The price is recall within oversized buckets, the same
    documented LSH trade as the band misses themselves. Note the cap
    bounds SHUFFLE and OUTPUT rows, not CPU: within one degenerate hot
    bucket the sort-merge join still scans O(bucket^2) row combinations
    before the pos-ring filter drops them -- fine at any realistic skew
    (the adversarial test pins the output), but not a per-bucket CPU
    bound. Pairs symmetrize
    to anchor perspective, labels attach by equi-join, and top-k is one
    row_number window keyed on (rounded cosine desc, neg id asc) -- the
    ROUNDED value ranks, so ranking is deterministic across engines even
    at float ties."""
    normed = emb.withColumn(
        "_norm", F.greatest(norm(F.col(vec_col)), F.lit(1e-12))
    ).withColumn(
        "_nv", F.transform(F.col(vec_col), lambda x: x.cast("double") / F.col("_norm"))
    )
    sigs = F.array(*[sign_bucket(F.col("_nv"), d) for d in band_dims])
    pos = tracked_persist(
        normed.select(F.col(id_col), F.posexplode(sigs).alias("band", "sig"))
        .withColumn(
            "pos",
            F.row_number().over(
                Window.partitionBy("band", "sig").orderBy(F.col(id_col))
            ),
        )
    )
    a = pos.select(
        F.col(id_col).alias("id_a"), "band", "sig", F.col("pos").alias("pa")
    )
    b = pos.select(
        F.col(id_col).alias("id_b"),
        F.col("band").alias("band_b"),
        F.col("sig").alias("sig_b"),
        F.col("pos").alias("pb"),
    )
    cand_ids = (
        a.join(
            b,
            (F.col("band") == F.col("band_b"))
            & (F.col("sig") == F.col("sig_b"))
            & (F.col("pb") > F.col("pa"))
            & (F.col("pb") <= F.col("pa") + cand_per_band),
        )
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    vecs = tracked_persist(
        normed.select(F.col(id_col).alias("_vid"), F.col("_nv"))
    )
    pairs = (
        cand_ids.join(
            vecs.select(F.col("_vid").alias("id_a"), F.col("_nv").alias("va")), "id_a"
        )
        .join(vecs.select(F.col("_vid").alias("id_b"), F.col("_nv").alias("vb")), "id_b")
        .select("id_a", "id_b", dot(F.col("va"), F.col("vb")).alias("cos_raw"))
        .filter(F.col("cos_raw") >= min_cos)
        .select("id_a", "id_b", F.round("cos_raw", 6).alias("cosine"))
    )
    sym = pairs.select(
        F.col("id_a").alias("anchor_id"), F.col("id_b").alias("neg_id"), "cosine"
    ).unionByName(
        pairs.select(
            F.col("id_b").alias("anchor_id"), F.col("id_a").alias("neg_id"), "cosine"
        )
    )
    labels = emb.select(F.col(id_col).alias("_lid"), F.col(label_col).alias("_lbl"))
    cross_label = (
        sym.join(labels.withColumnRenamed("_lid", "anchor_id").withColumnRenamed("_lbl", "_la"), "anchor_id")
        .join(labels.withColumnRenamed("_lid", "neg_id").withColumnRenamed("_lbl", "_lb"), "neg_id")
        .filter(F.col("_la") != F.col("_lb"))
    )
    w = Window.partitionBy("anchor_id").orderBy(
        F.col("cosine").desc(), F.col("neg_id").asc()
    )
    return (
        cross_label.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("anchor_id", "neg_id", "cosine", F.col("rank").cast("long").alias("rank"))
    )


# ---------------------------------------------------------------- k-means||


def _kmeans_wkpp_lloyd_frame(
    spark, cands: list, wts_arr, k: int, lloyd_iters: int
) -> DataFrame:
    """Shared driver-side reduction of the k-means|| candidate sketch:
    weighted k-means++ seeding + Lloyd on numpy, returned as the
    (cent_id, cv) Arrow local frame. Split out of kmeans_parallel_centroids
    (r15) so the bounded local dispatch and the distributed path run the
    IDENTICAL reduction -- they may only differ in how the sketch and its
    weights were computed."""
    import numpy as np

    from ._local import arrow_local_frame

    X = np.asarray(cands, dtype=np.float64)
    wts = np.asarray(wts_arr, dtype=np.float64)

    # driver-side weighted k-means++ then Lloyd on the tiny sketch.
    # Seeding keeps a RUNNING min-distance folded with np.minimum against
    # only the newest center -- bit-identical to re-minimizing over all
    # centers (each per-center d2 array is computed the same way; min is
    # exact) but O(k * |X| * d) instead of the old O(k^2 * |X| * d) loop
    # that dominated the sf1 trained-row wall (~19G flops at k=313).
    rng = np.random.default_rng(0)
    first_c = X[int(np.argmax(wts))]
    centers = [first_c]
    d2min = np.sum((X - first_c) ** 2, axis=1)
    for _ in range(1, min(k, len(X))):
        p = wts * d2min
        if p.sum() <= 0:
            break
        nxt = X[rng.choice(len(X), p=p / p.sum())]
        centers.append(nxt)
        d2min = np.minimum(d2min, np.sum((X - nxt) ** 2, axis=1))
    C = np.asarray(centers)

    def _assign_chunked(X: np.ndarray, C: np.ndarray) -> np.ndarray:
        # same per-element ((x - c)^2).sum arithmetic as the one-shot
        # broadcast (bit-identical argmins), chunked so the temporary is
        # chunk x k x d instead of |X| x k x d (~500 MB at the sf1 sketch
        # size -- allocator + cache churn, not compute, was the cost)
        step = max(1, 2_000_000 // max(1, C.shape[0] * C.shape[1]))
        out = np.empty(len(X), dtype=np.int64)
        for s in range(0, len(X), step):
            e = min(s + step, len(X))
            out[s:e] = np.argmin(
                ((X[s:e, None, :] - C[None, :, :]) ** 2).sum(axis=2), axis=1
            )
        return out

    for _ in range(lloyd_iters):
        a = _assign_chunked(X, C)
        newC = np.array(
            [
                np.average(X[a == j], axis=0, weights=wts[a == j])
                if wts[a == j].sum() > 0
                else C[j]
                for j in range(len(C))
            ]
        )
        # spherical: renormalize means back onto the unit sphere (cosine
        # assignment downstream; an interior mean's direction is the center)
        newC = newC / np.maximum(
            np.linalg.norm(newC, axis=1, keepdims=True), 1e-12
        )
        if np.allclose(newC, C):
            break
        C = newC
    return arrow_local_frame(
        spark,
        [(i, [float(x) for x in c]) for i, c in enumerate(C)],
        "cent_id long, cv array<double>",
    )


def _kmeans_parallel_local_frame(
    spark, pdf, k: int, *, rounds: int, l: int, lloyd_iters: int, salt: str
) -> DataFrame:
    """Driver-local twin of the k-means|| init for the bounded dispatch
    (guide §5, the graph/CC local-dispatch pattern): the ENTIRE sketch
    pass -- per-round min-distance fold, md5 sampling draws, candidate
    weights -- runs in numpy over the ONE bounded Arrow fetch the caller
    already paid, replacing ~4 driver-coordinated Spark jobs per round
    (the r14 trained-SemDeDup row ran 47 jobs for a 2000-row training
    frame; its 8-vs-32-core scaling read 0.84 because the wall was pure
    job floor). The sampling draws replicate the engine's md5 expression
    EXACTLY (md5(salt:id:round) first 8 hex digits % 1e6 / 1e6), so the
    draw *rule* is the same; d2 values come from one whole-matrix numpy
    matmul instead of per-Arrow-batch matmuls, which selects a DIFFERENT
    equally-valid init than the distributed vectorized path -- exactly
    the freedom vectorized mode already declares (layout-dependent d2),
    which is why only vectorized callers may dispatch here."""
    import hashlib

    import numpy as np

    ids = pdf["_id"].to_numpy()
    V = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf["_nv"]])
    order = np.argsort(ids, kind="stable")
    ids, V = ids[order], V[order]
    # first candidate: the min-id vector, like the distributed
    # normed.orderBy("_id").first()
    cands = [V[0].copy()]
    d2 = 2.0 - 2.0 * (V @ np.asarray([cands[0]]).T).max(axis=1)
    for r in range(rounds):
        phi = float(d2.sum())
        if phi <= 0:
            break
        u = np.asarray(
            [
                (
                    int(
                        hashlib.md5(
                            f"{salt}:{int(i)}:{r}".encode()
                        ).hexdigest()[:8],
                        16,
                    )
                    % 1_000_000
                )
                / 1_000_000.0
                for i in ids
            ]
        )
        new = V[u < (float(l) * d2 / phi)]
        cands.extend(row.copy() for row in new)
        if len(new) and r < rounds - 1:
            d2 = np.minimum(d2, 2.0 - 2.0 * (V @ new.T).max(axis=1))
    Call = np.asarray(cands)
    best = np.argmin(2.0 - 2.0 * (V @ Call.T), axis=1)
    wts = np.bincount(best, minlength=len(cands))
    return _kmeans_wkpp_lloyd_frame(spark, cands, wts, k, lloyd_iters)


def kmeans_parallel_centroids(
    emb: DataFrame,
    k: int,
    *,
    rounds: int = 5,
    oversample: int | None = None,
    lloyd_iters: int = 10,
    vectorized: bool = False,
    local_threshold: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    salt: str = "kmpar",
) -> DataFrame:
    """k-means|| initialization (Bahmani et al. 2012, arXiv:1203.6402) --
    the distributed k-means++ replacement: instead of k strictly sequential
    D^2-weighted draws (k full passes), ``rounds`` passes each sample
    ~``oversample`` candidates in parallel with probability l*d^2/phi, then
    the O(rounds*l) candidate sketch is weighted by cluster population and
    reduced to k centers DRIVER-side (weighted k-means++ + Lloyd on numpy).

    Determinism: the per-point draws use the md5 hash of (id, round), not
    rand(), so the whole init is reproducible and engine-independent; the
    driver reduction is seeded numpy. Spherical like kmeans_centroids
    (unit vectors, d^2 = 2 - 2*cos), returned under the same
    (cent_id, cv) contract so ivf_assign / semantic_dedup / the IVF index
    consume it unchanged.

    Scale shape per round: one broadcast-centroid pass over the corpus for
    min-distances (the ivf_assign shape, no corpus shuffle), one scalar phi
    fetch, one filtered collect of ~l sampled rows. Total driver state:
    O(rounds * l * d) floats. The corpus is never assigned to ALL candidate
    centers at once anywhere -- each pass is max-over-broadcast.

    ``vectorized=True`` swaps the per-round distance pass and the weights
    pass for Arrow/BLAS matmuls (mapInPandas, the `assign_cells_arrow`
    pattern) -- measured ~10x on the trained-SemDeDup trainer, whose
    distance passes dominated its sf1 wall. The draws stay deterministic
    (md5) but the ulp-different d2 values select a DIFFERENT valid init,
    so only quantizer-agnostic callers (witness-oracle rows) may opt in;
    the default stays fold-exact for the `embedding_kmeans_parallel`
    contract row.

    ``local_threshold`` (r15, guide §5 -- the graph/CC bounded-dispatch
    pattern): vectorized callers train on a BOUNDED sample by contract
    (the trained-SemDeDup row caps its training frame at 65 536 rows at
    ANY corpus scale), so when the training frame fits under the cap --
    ONE ``limit(cap+1).toPandas()`` probe-and-fetch, ~8 B x d per row
    through Arrow -- the whole sketch pass runs driver-local
    (_kmeans_parallel_local_frame) instead of ~4 Spark jobs per round
    over a sample-sized frame. Over the cap, or in fold-exact mode
    (whose oracle replays the JVM fold arithmetic the numpy twin cannot
    reproduce bit-for-bit), the distributed path runs unchanged."""
    import numpy as np

    l = oversample or 2 * k
    spark = emb.sparkSession
    normed_plan = emb.select(
        F.col(id_col).alias("_id"),
        F.transform(
            F.col(vec_col),
            lambda x: x.cast("double")
            / F.greatest(norm(F.col(vec_col)), F.lit(1e-12)),
        ).alias("_nv"),
    )
    if vectorized and local_threshold is not None:
        pdf = normed_plan.limit(local_threshold + 1).toPandas()
        if len(pdf) <= local_threshold:
            return _kmeans_parallel_local_frame(
                spark, pdf, k, rounds=rounds, l=l,
                lloyd_iters=lloyd_iters, salt=salt,
            )
    normed = tracked_persist(normed_plan)

    def dist2_update_exact(
        prev: DataFrame | None, new_cands: list[list[float]]
    ) -> DataFrame:
        """Min distance to the candidate set so far, INCREMENTALLY: dot
        only against the round's NEW candidates, folded into the carried
        per-point d2 with least(). Exact: min(prev, 2 - 2*max_new) equals
        2 - 2*max_all bit-for-bit (x -> 2 - 2x is monotone in IEEE), so
        every phi and every sampling draw is identical to the
        recompute-against-all form -- but per-round work is O(n * l)
        instead of O(n * r * l), and the dots run through the slow
        higher-order-function path r times fewer."""
        from ._local import arrow_local_frame

        cent = arrow_local_frame(
            spark,
            [(i, c) for i, c in enumerate(new_cands)],
            "cent_id long, cv array<double>",
        )
        base = prev if prev is not None else normed.withColumn(
            "d2", F.lit(float("inf"))
        )
        nd = (
            F.broadcast(cent)
            .crossJoin(base)
            .groupBy("_id")
            .agg(
                F.first("_nv").alias("_nv"),
                F.least(
                    F.first("d2"),
                    2.0 - 2.0 * F.max(dot(F.col("cv"), F.col("_nv"))),
                ).alias("d2"),
            )
            .persist()
        )
        nd.count()
        if prev is not None:
            prev.unpersist()
        return nd

    def dist2_update_arrow(
        prev: DataFrame | None, new_cands: list[list[float]]
    ) -> DataFrame:
        """Arrow/BLAS twin of the incremental distance pass (the
        `assign_cells_arrow` trick applied to training): one matmul per
        Arrow batch against the round's new-candidate matrix. Same
        min-fold semantics; float sums differ from the JVM fold in the
        last ulp, so the sampling draws (and therefore the centroids)
        are a DIFFERENT valid k-means|| init -- deterministic only for a
        fixed physical layout (partition count, Arrow batch size, BLAS
        build), since d2 from (V @ Cn.T) depends on batch boundaries and
        BLAS blocking. Only callers whose downstream contract is
        quantizer-agnostic (the witness-oracle SemDeDup row) may use
        vectorized=True."""
        import pandas as pd

        Cn = np.asarray(new_cands, dtype=np.float64)
        base = prev if prev is not None else normed.withColumn(
            "d2", F.lit(float("inf"))
        )

        def upd(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    continue  # empty Arrow batch: matmul on (0,) would raise
                V = np.asarray(
                    [np.asarray(v, dtype=np.float64) for v in pdf["_nv"]]
                )
                d2new = 2.0 - 2.0 * (V @ Cn.T).max(axis=1)
                out = pd.DataFrame(
                    {
                        "_id": pdf["_id"].to_numpy(),
                        "_nv": pdf["_nv"],
                        "d2": np.minimum(pdf["d2"].to_numpy(), d2new),
                    }
                )
                yield out

        nd = base.mapInPandas(
            upd, "_id long, _nv array<double>, d2 double"
        ).persist()
        nd.count()
        if prev is not None:
            prev.unpersist()
        return nd

    dist2_update = dist2_update_arrow if vectorized else dist2_update_exact

    first = normed.orderBy("_id").select("_nv").first()[0]
    cands = [[float(x) for x in first]]
    d = dist2_update(None, cands)
    for r in range(rounds):
        phi = d.agg(F.sum("d2")).collect()[0][0] or 0.0
        if phi <= 0:
            break
        u_r = (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            ":", F.lit(salt), F.col("_id").cast("string"), F.lit(str(r))
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % 1000000
        ) / 1000000.0
        picked = d.filter(u_r < F.lit(float(l)) * F.col("d2") / F.lit(float(phi))).select(
            "_nv"
        )
        new_cands = [[float(x) for x in row[0]] for row in picked.collect()]
        cands.extend(new_cands)
        if new_cands and r < rounds - 1:
            d = dist2_update(d, new_cands)

    d.unpersist()
    # weight candidates by the population of their nearest-candidate cell
    from ._local import arrow_local_frame

    cent = arrow_local_frame(
        spark, [(i, c) for i, c in enumerate(cands)], "cent_id long, cv array<double>"
    )
    # nearest-candidate per point as min_by (same double d2, same
    # cent_id tie-break as the old row_number window) so the train x cands
    # candidate rows collapse map-side instead of shuffling through a sort;
    # vectorized mode runs the same argmin as one matmul per Arrow batch
    # (np.argmin first-index == the lowest-cent_id tie-break)
    if vectorized:
        import pandas as pd

        Call = np.asarray(cands, dtype=np.float64)

        def w_assign(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    continue  # empty Arrow batch: matmul on (0,) would raise
                V = np.asarray(
                    [np.asarray(v, dtype=np.float64) for v in pdf["_nv"]]
                )
                best = np.argmin(2.0 - 2.0 * (V @ Call.T), axis=1)
                yield pd.DataFrame({"cent_id": best.astype("int64")})

        weights_rows = (
            normed.mapInPandas(w_assign, "cent_id long")
            .groupBy("cent_id")
            .agg(F.count(F.lit(1)).alias("w"))
            .collect()
        )
    else:
        weights_rows = (
            F.broadcast(cent)
            .crossJoin(normed)
            .select(
                "_id",
                "cent_id",
                (2.0 - 2.0 * dot(F.col("cv"), F.col("_nv"))).alias("_d2"),
            )
            .groupBy("_id")
            .agg(
                F.min_by(
                    F.col("cent_id"),
                    F.struct(F.col("_d2").alias("d"), F.col("cent_id").alias("c")),
                ).alias("cent_id")
            )
            .groupBy("cent_id")
            .agg(F.count(F.lit(1)).alias("w"))
            .collect()
        )
    wmap = {r["cent_id"]: r["w"] for r in weights_rows}
    wts = [wmap.get(i, 0) for i in range(len(cands))]
    return _kmeans_wkpp_lloyd_frame(spark, cands, wts, k, lloyd_iters)


# ------------------------------------------------------------ ANN recall@k


def topk_recall(
    approx: DataFrame,
    exact: DataFrame,
    k: int,
    *,
    floor: float,
) -> DataFrame:
    """Recall@k of an approximate top-k answer against the exact one --
    the first question a 100 TB user asks of any ANN index: at THIS probe
    budget, what fraction of the true neighbors come back? Both inputs are
    (query_id, neighbor_id, rank, ...) frames (cosine_topk's contract);
    recall(q) = |approx(q) ∩ exact(q)| / |exact(q)|.

    Output: per query, the measured ``recall`` rounded to 4 dp (so
    PERF.md's recall-vs-budget curves are reproducible straight from this
    operator) plus boolean witnesses -- the exact side returned a full k,
    and recall clears the pinned ``floor``. The registered contract rows
    (the HLL/IVF pattern) DROP the recall column before hashing: the
    oracle asserts exact query keys and all-true flags; the measured
    value is deterministic (seeded quantizers) but not SQL-derivable, so
    it is intentionally kept out of the hash-checked row. Scale shape:
    two query-bounded frames joined on (query_id, neighbor_id) --
    O(queries * k) rows end to end."""
    e = exact.select("query_id", F.col("neighbor_id").alias("_nid"))
    a = approx.select(
        "query_id", F.col("neighbor_id").alias("_nid"), F.lit(1).alias("_hit")
    )
    return (
        e.join(a, ["query_id", "_nid"], "left")
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("_n_exact"),
            F.sum(F.coalesce("_hit", F.lit(0))).alias("_n_hit"),
        )
        .select(
            "query_id",
            F.lit(k).cast("long").alias("k"),
            (F.col("_n_exact") == k).alias("exact_side_full"),
            (
                F.round(F.col("_n_hit") / F.col("_n_exact"), 4) >= floor
            ).alias("recall_ok"),
            F.round(F.col("_n_hit") / F.col("_n_exact"), 4).alias("recall"),
        )
    )


def pq_rerank_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    shortlist: int = 50,
    m: int = PQ_SUBSPACES,
    n_codes: int = PQ_CODES,
    *,
    vectorized: bool = False,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The production PQ serving shape (IVFADC + rerank, Jegou et al.
    2011 sec. V): the compressed codes produce a cheap ``shortlist`` of
    candidates per query via ADC, then ONLY those shortlist rows fetch
    their full vectors for an exact cosine rerank to top-``k``. ADC's
    quantization distortion decides which ~50 candidates are considered;
    the exact math decides their order -- recall@k is dramatically higher
    than raw-ADC-rank@k at the cost of |Q| * shortlist full-vector reads
    (nothing corpus-sized; at rest this is a point-lookup join against
    the id-partitioned vector table).

    Returns (query_id, neighbor_id, rank, cosine) like cosine_topk.
    ``vectorized`` forwards to the ADC shortlist (see pq_adc_topk); the
    exact rerank math over the shortlist is identical either way."""
    short = pq_adc_topk(
        emb, query_ids, k=shortlist, m=m, n_codes=n_codes,
        vectorized=vectorized, id_col=id_col, vec_col=vec_col,
    ).select("query_id", "neighbor_id")
    q = emb.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    v = emb.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_nv"))
    scored = (
        short.join(F.broadcast(q), "query_id")
        .join(v, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("_qv"), F.col("_nv")).alias("cos_raw"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_raw").desc(), F.col("neighbor_id").asc()
    )
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


def pq_codebook_trained(
    emb: DataFrame,
    m: int = PQ_SUBSPACES,
    n_codes: int = PQ_CODES,
    *,
    sample: int = 2048,
    lloyd_iters: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    salt: str = "pqtrain",
) -> list[list[list[float]]]:
    """TRAINED product-quantization codebooks: per subspace, Lloyd's
    k-means fit driver-side on a deterministic md5-ordered sample --
    the quality upgrade over `pq_codebook`'s first-n_codes seeding
    (Jegou et al. 2011 train their codebooks exactly this way; the
    seeded twin exists for exact SQL oracles). Same nested-list
    contract, so pq_codes / adc_distance / pq_rerank_topk consume it
    unchanged.

    Determinism: the sample is the ``sample`` smallest md5 draws (ties
    by id) -- reproducible and engine-independent; init is the sample's
    first n_codes rows; Lloyd runs a fixed ``lloyd_iters`` on the sample
    in numpy (empty clusters re-seeded deterministically from the
    sample). Driver state: O(sample * dim) floats -- the
    bounded-calibration pattern, never corpus-scale."""
    import numpy as np

    from .sampling import sample_hash

    # the sample is selected DISTRIBUTED (TakeOrdered on the md5 draw);
    # only `sample` rows ever reach the driver
    drawn = (
        emb.select(id_col, vec_col)
        .orderBy(
            sample_hash(F.col(id_col), salt).asc(), F.col(id_col).asc()
        )
        .limit(sample)
        .collect()
    )
    x = np.array([[float(v) for v in r[1]] for r in drawn], dtype=np.float64)
    dim = x.shape[1]
    sub = dim // m
    out: list[list[list[float]]] = []
    for s in range(m):
        xs = x[:, s * sub : (s + 1) * sub]
        cent = xs[:n_codes].copy()
        for _ in range(lloyd_iters):
            d2 = ((xs[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            # deterministic re-seed order: sample points sorted farthest-
            # first by their assignment distance THIS round; the i-th empty
            # cluster takes the i-th entry, so re-seeded centroids are
            # DISTINCT points (re-seeding every empty cluster at the same
            # farthest point produced duplicate centroids / wasted codes)
            far_order = np.argsort(-d2.min(axis=1), kind="stable")
            reseed_i = 0
            for c in range(n_codes):
                members = xs[assign == c]
                if len(members):
                    cent[c] = members.mean(axis=0)
                else:
                    cent[c] = xs[far_order[reseed_i % len(far_order)]]
                    reseed_i += 1
        out.append([[float(v) for v in row] for row in cent])
    return out


def kcenter_coreset(
    emb: DataFrame,
    k: int = 4,
    n_candidates: int = 32,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Greedy k-center coreset selection (farthest-point traversal,
    Gonzalez 1985) + a DISTRIBUTED coverage audit -- the diversity-first
    data-selection counterpart of SemDeDup's redundancy pruning: pick k
    maximally-spread exemplars, then measure how well they cover the
    corpus (the 2-approximation of the optimal k-center radius).

    Selection is candidate-bounded by construction (the MMR pattern):
    only ids < ``n_candidates`` seed the traversal, their pairwise
    cosine-distance frame (n_candidates^2 rows) is computed IN SPARK and
    is the only thing collected; at scale seed the pool via hash_sample
    or an IVF pass instead of growing n_candidates. Start = smallest id;
    each next center maximizes its (6-dp rounded) distance to the
    nearest chosen center, ties to smallest id -- fully deterministic,
    so the oracle replays the trajectory as k unrolled SQL stages.

    The coverage pass is the IVF assignment shape: k center vectors
    broadcast against the corpus, per-vector nearest center via one
    min(struct) aggregation -- no window over the corpus, no shuffle of
    vectors beyond the one groupBy(center).

    Returns (center_id, center_rank, n_assigned, radius, mean_dist):
    radius = max assigned distance (the k-center objective), both
    distances d = round(1 - cosine, 6)."""
    cand = emb.filter(F.col(id_col) < n_candidates).select(
        F.col(id_col), F.col(vec_col).alias("_v")
    )
    a = cand.alias("a")
    b = cand.alias("b")
    dist = F.round(
        1.0 - cosine(F.col("a._v"), F.col("b._v")), 6
    )
    pd_rows = (
        a.join(b, F.col(f"a.{id_col}") != F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("_ida"),
            F.col(f"b.{id_col}").alias("_idb"),
            dist.alias("_d"),
        )
        .collect()
    )
    d_of = {(r._ida, r._idb): r._d for r in pd_rows}
    # pool membership from cand itself, NOT from the pairwise rows: a
    # 1-member pool yields zero pair rows yet satisfies k=1
    ids = sorted(r[0] for r in cand.select(id_col).distinct().collect())
    if len(ids) < k:
        raise ValueError(
            f"kcenter_coreset: candidate pool has {len(ids)} member(s) "
            f"with {id_col} < {n_candidates} but k={k} centers were "
            "requested -- raise n_candidates or lower k"
        )
    centers = [min(ids)]
    while len(centers) < k:
        best = None
        for cid in ids:
            if cid in centers:
                continue
            dmin = min(d_of[(cid, s)] for s in centers)
            key = (-dmin, cid)
            if best is None or key < best[0]:
                best = (key, cid)
        centers.append(best[1])

    spark = emb.sparkSession
    from ._local import arrow_local_frame

    rank_map = arrow_local_frame(
        spark,
        [(cid, i + 1) for i, cid in enumerate(centers)],
        f"{id_col} long, center_rank long",
    )
    cvecs = (
        emb.filter(F.col(id_col).isin(centers))
        .join(rank_map, id_col)
        .select(
            F.col(id_col).alias("_cid"),
            "center_rank",
            F.col(vec_col).alias("_cv"),
        )
    )
    ad = F.round(1.0 - cosine(F.col(vec_col), F.col("_cv")), 6)
    assigned = (
        emb.crossJoin(F.broadcast(cvecs))
        .select(
            F.col(id_col),
            F.struct(
                ad.alias("d"), F.col("_cid").alias("c"),
                F.col("center_rank").alias("r"),
            ).alias("_s"),
        )
        .groupBy(id_col)
        .agg(F.min("_s").alias("_best"))
    )
    return (
        assigned.groupBy(
            F.col("_best.c").alias("center_id"),
            F.col("_best.r").alias("center_rank"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_assigned"),
            F.max("_best.d").alias("radius"),
            F.round(F.avg("_best.d"), 4).alias("mean_dist"),
        )
    )


def bitext_margin_pairs(
    emb: DataFrame,
    *,
    src_label: int = 0,
    tgt_label: int = 1,
    k: int = 4,
    threshold: float = 1.05,
    band_dims: tuple[tuple[int, ...], ...] = DEFAULT_NEAR_DUP_BANDS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Margin-based bitext mining (Artetxe & Schwenk 2019,
    arXiv:1811.01136 -- the LASER/CCMatrix parallel-corpus miner): given
    two embedding shards (a source and a target language), score every
    candidate cross-shard pair by the RATIO margin

        margin(x, y) = cos(x, y) / ((avgNN_k(x) + avgNN_k(y)) / 2)

    where avgNN_k(v) is the mean cosine of v's k nearest candidates on
    the OTHER side -- the hubness correction that makes raw-cosine
    mining usable (a "hub" vector close to everything gets a large
    denominator and stops winning every pair). Each source vector keeps
    its best-margin target when the margin clears ``threshold``; the
    ``mutual`` flag marks pairs that are best in BOTH directions (the
    highest-precision tier CCMatrix filters on).

    Scale shape: candidates come from the SAME multi-band sign-LSH
    equi-join as near_dup_pairs (never a cross-shard nested loop --
    plan-guard-safe), and the k-NN denominators are computed over those
    banded candidates with per-node bounded windows; at 100 TB both the
    pair space and the windows are bucket-bounded. The banded-candidate
    denominator is the documented approximation vs the paper's exact
    k-NN (which is itself usually approximated by FAISS in production);
    everything is deterministic, so the row ships an EXACT oracle.

    Engine-portable arithmetic: cosines are quantized to integer
    MICRO-cosines (floor(cos * 1e6 + 0.5) as BIGINT -- the FLOOR form,
    not round(): Spark's round() HALF_UPs the double's shortest decimal
    repr while DuckDB rounds the exact binary value, the representation-
    tie divergence text.py's quality rounding already fixed) before
    ranking, and the margin is computed from integer sums --
    2 * c * n_s * n_t / (sum_s * n_t + sum_t * n_s) -- so both engines
    divide the SAME two integers, with the 6-dp margin rounding also in
    floor form (a float k-NN average re-rounded at 6 dp flips on
    representation ties; measured one such flip per ~500 vectors).
    Returns (src_id, tgt_id, cosine, margin, mutual), one row per mined
    source."""
    sides = emb.filter(F.col(label_col).isin([src_label, tgt_label]))
    normed = sides.withColumn(
        "_norm", F.greatest(norm(F.col(vec_col)), F.lit(1e-12))
    ).withColumn(
        "_nv",
        F.transform(F.col(vec_col), lambda x: x.cast("double") / F.col("_norm")),
    )
    sigs = F.array(*[sign_bucket(F.col(vec_col), d) for d in band_dims])
    banded = tracked_persist(
        normed.select(
            F.col(id_col), F.col(label_col), F.posexplode(sigs).alias("band", "sig")
        )
    )
    a = banded.filter(F.col(label_col) == src_label).select(
        F.col(id_col).alias("src_id"), "band", "sig"
    )
    b = banded.filter(F.col(label_col) == tgt_label).select(
        F.col(id_col).alias("tgt_id"),
        F.col("band").alias("band_b"),
        F.col("sig").alias("sig_b"),
    )
    cand_ids = (
        a.join(
            b,
            (F.col("band") == F.col("band_b")) & (F.col("sig") == F.col("sig_b")),
        )
        .select("src_id", "tgt_id")
        .dropDuplicates(["src_id", "tgt_id"])
    )
    vecs = tracked_persist(
        normed.select(F.col(id_col).alias("_vid"), F.col("_nv"))
    )
    scored = tracked_persist(
        cand_ids.join(
            vecs.select(F.col("_vid").alias("src_id"), F.col("_nv").alias("va")),
            "src_id",
        )
        .join(
            vecs.select(F.col("_vid").alias("tgt_id"), F.col("_nv").alias("vb")),
            "tgt_id",
        )
        .select(
            "src_id",
            "tgt_id",
            F.floor(dot(F.col("va"), F.col("vb")) * 1e6 + 0.5)
            .cast("long")
            .alias("_c6"),
        )
    )
    w_src = Window.partitionBy("src_id").orderBy(
        F.col("_c6").desc(), F.col("tgt_id").asc()
    )
    d_src = (
        scored.withColumn("_rn", F.row_number().over(w_src))
        .filter(F.col("_rn") <= k)
        .groupBy("src_id")
        .agg(
            F.sum("_c6").alias("_s_sum"),
            F.count(F.lit(1)).alias("_s_n"),
        )
    )
    w_tgt = Window.partitionBy("tgt_id").orderBy(
        F.col("_c6").desc(), F.col("src_id").asc()
    )
    d_tgt = (
        scored.withColumn("_rn", F.row_number().over(w_tgt))
        .filter(F.col("_rn") <= k)
        .groupBy("tgt_id")
        .agg(
            F.sum("_c6").alias("_t_sum"),
            F.count(F.lit(1)).alias("_t_n"),
        )
    )
    m = tracked_persist(
        scored.join(d_src, "src_id")
        .join(d_tgt, "tgt_id")
        .withColumn(
            "margin",
            F.floor(
                2.0
                * F.col("_c6")
                * F.col("_s_n")
                * F.col("_t_n")
                / F.greatest(
                    F.col("_s_sum") * F.col("_t_n")
                    + F.col("_t_sum") * F.col("_s_n"),
                    F.lit(1).cast("long"),
                )
                * 1e6
                + 0.5
            )
            / 1e6,
        )
        .select(
            "src_id",
            "tgt_id",
            (F.col("_c6") / 1e6).alias("cosine"),
            "margin",
        )
    )
    w_pick = Window.partitionBy("src_id").orderBy(
        F.col("margin").desc(), F.col("tgt_id").asc()
    )
    best = (
        m.withColumn("_rk", F.row_number().over(w_pick))
        .filter((F.col("_rk") == 1) & (F.col("margin") >= threshold))
        .select("src_id", "tgt_id", "cosine", "margin")
    )
    w_back = Window.partitionBy("tgt_id").orderBy(
        F.col("margin").desc(), F.col("src_id").asc()
    )
    t_best = (
        m.withColumn("_rt", F.row_number().over(w_back))
        .filter(F.col("_rt") == 1)
        .select(F.col("src_id").alias("_back_src"), "tgt_id")
    )
    return best.join(t_best, "tgt_id", "left").select(
        "src_id",
        "tgt_id",
        "cosine",
        "margin",
        F.coalesce(F.col("_back_src") == F.col("src_id"), F.lit(False)).alias(
            "mutual"
        ),
    )


def assign_cells_arrow(
    emb: DataFrame,
    centroids: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_vec: bool = False,
) -> DataFrame:
    """Arrow-vectorized nearest-centroid assignment: the numpy/BLAS twin
    of `ivf_assign`, for the regime where even the max_by-aggregated JVM
    fold is the bottleneck (trained quantizers push k toward n/64; the
    per-element higher-order-function fold costs ~100x a dgemm FLOP).
    mapInPandas streams Arrow batches through ONE matmul per batch
    against the broadcast centroid matrix -- map-only, no shuffle, no
    per-row Python: the documented exception to "UDFs are the slow
    path" (Arrow batch + BLAS beats codegen once the inner loop is a
    dense matrix product).

    Semantics match `ivf_assign` exactly at the argmax level: max
    cosine, ties to the smallest cent_id (np.argmax returns the FIRST
    max index and columns are ordered by cent_id). Float sums differ
    from the JVM's sequential fold in the last ulp (pairwise/SIMD
    summation), which can flip an argmax only when two centroids tie
    within ~1e-15 relative -- the `embedding_assign_arrow_agreement`
    row MEASURES that rate against the fold-exact assignment (witness:
    >= 99.99% agreement) instead of assuming it. Returns
    (id_col, cell), or (id_col, vec_col, cell) with ``keep_vec=True``
    (the `ivf_assign` output shape, still map-only -- callers that need
    the vector downstream should carry it through here rather than pay
    a corpus-scale re-join on the id)."""
    import numpy as np
    import pandas as pd

    cent_rows = sorted(
        centroids.select("cent_id", "cv").collect(), key=lambda r: r[0]
    )
    cent_ids = np.asarray([int(r[0]) for r in cent_rows], dtype=np.int64)
    C = np.asarray([r[1] for r in cent_rows], dtype=np.float64)
    Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)

    vec_type = emb.schema[vec_col].dataType.simpleString()
    out_schema = (
        f"{id_col} long, {vec_col} {vec_type}, cell long"
        if keep_vec
        else f"{id_col} long, cell long"
    )

    def assign(batches):
        for pdf in batches:
            if len(pdf) == 0:
                # empty Arrow batch -> np.asarray of an empty list is a
                # shape-(0,) 1-D array and the matmul raises; skip it
                continue
            V = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            Vn = V / np.maximum(
                np.linalg.norm(V, axis=1, keepdims=True), 1e-12
            )
            best = np.argmax(Vn @ Cn.T, axis=1)
            out = {id_col: pdf[id_col].to_numpy()}
            if keep_vec:
                out[vec_col] = pdf[vec_col]
            out["cell"] = cent_ids[best]
            yield pd.DataFrame(out)

    return emb.select(F.col(id_col), F.col(vec_col)).mapInPandas(
        assign, out_schema
    )


def bitext_pair_recall(
    emb: DataFrame,
    *,
    src_label: int = 0,
    tgt_label: int = 1,
    k: int = 4,
    threshold: float = 1.0,
    band_dims: tuple[tuple[int, ...], ...] = DEFAULT_NEAR_DUP_BANDS,
    sample_frac: float | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Measured recall of the banded bitext miner against the EXACT
    brute-force margin truth (VERDICT r10 item 7 -- the same accounting
    discipline as dedup_lsh_recall / dedup_winnow_recall): the truth
    side recomputes Artetxe & Schwenk margins over ALL cross-shard
    pairs (exact k-NN denominators, no banding) and keeps each source's
    best-margin target at ``threshold``; a truth pair is HIT when the
    banded `bitext_margin_pairs` mined the same (src, tgt) pair.
    Stratified by the truth margin (the confidence axis: higher-margin
    translations must be the last the banding loses).

    The truth side is an explicit cross-shard nested loop BY DEFINITION
    (measurement harness, plan-guard-whitelisted, shard x shard
    bounded); ``sample_frac`` is the production dial -- both sides
    restrict to the same md5 doc sample (salt 'bitextrecall') first,
    cutting truth cost to ~sample_frac^2. Micro-cosine/floor-form
    margin arithmetic is shared with the miner, so the DuckDB oracle
    replays both sides exactly.

    Output: (margin_bucket, n_true_pairs, n_hit, recall)."""
    if sample_frac is not None:
        from .sampling import hash_sample

        emb = hash_sample(emb, sample_frac, key_col=id_col, salt="bitextrecall")
    sides = emb.filter(F.col(label_col).isin([src_label, tgt_label]))
    normed = sides.withColumn(
        "_norm", F.greatest(norm(F.col(vec_col)), F.lit(1e-12))
    ).withColumn(
        "_nv",
        F.transform(F.col(vec_col), lambda x: x.cast("double") / F.col("_norm")),
    )
    s = normed.filter(F.col(label_col) == src_label).select(
        F.col(id_col).alias("src_id"), F.col("_nv").alias("va")
    )
    t = normed.filter(F.col(label_col) == tgt_label).select(
        F.col(id_col).alias("tgt_id"), F.col("_nv").alias("vb")
    )
    scored = tracked_persist(
        F.broadcast(s)
        .join(t, F.lit(True))
        .select(
            "src_id",
            "tgt_id",
            F.floor(dot(F.col("va"), F.col("vb")) * 1e6 + 0.5)
            .cast("long")
            .alias("_c6"),
        )
    )
    w_src = Window.partitionBy("src_id").orderBy(
        F.col("_c6").desc(), F.col("tgt_id").asc()
    )
    d_src = (
        scored.withColumn("_rn", F.row_number().over(w_src))
        .filter(F.col("_rn") <= k)
        .groupBy("src_id")
        .agg(F.sum("_c6").alias("_s_sum"), F.count(F.lit(1)).alias("_s_n"))
    )
    w_tgt = Window.partitionBy("tgt_id").orderBy(
        F.col("_c6").desc(), F.col("src_id").asc()
    )
    d_tgt = (
        scored.withColumn("_rn", F.row_number().over(w_tgt))
        .filter(F.col("_rn") <= k)
        .groupBy("tgt_id")
        .agg(F.sum("_c6").alias("_t_sum"), F.count(F.lit(1)).alias("_t_n"))
    )
    m = (
        scored.join(d_src, "src_id")
        .join(d_tgt, "tgt_id")
        .withColumn(
            "margin",
            F.floor(
                2.0
                * F.col("_c6")
                * F.col("_s_n")
                * F.col("_t_n")
                / F.greatest(
                    F.col("_s_sum") * F.col("_t_n")
                    + F.col("_t_sum") * F.col("_s_n"),
                    F.lit(1).cast("long"),
                )
                * 1e6
                + 0.5
            )
            / 1e6,
        )
    )
    w_pick = Window.partitionBy("src_id").orderBy(
        F.col("margin").desc(), F.col("tgt_id").asc()
    )
    truth = (
        m.withColumn("_rk", F.row_number().over(w_pick))
        .filter((F.col("_rk") == 1) & (F.col("margin") >= threshold))
        .select("src_id", "tgt_id", "margin")
    )
    cand = bitext_margin_pairs(
        emb,
        src_label=src_label,
        tgt_label=tgt_label,
        k=k,
        threshold=threshold,
        band_dims=band_dims,
        id_col=id_col,
        vec_col=vec_col,
        label_col=label_col,
    ).select("src_id", "tgt_id", F.lit(1).alias("_hit"))
    mg = F.col("margin")
    bucket = (
        F.when(mg < 1.02, "1.00-1.02")
        .when(mg < 1.05, "1.02-1.05")
        .otherwise("1.05+")
    )
    return (
        truth.join(cand, ["src_id", "tgt_id"], "left")
        .groupBy(bucket.alias("margin_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_true_pairs"),
            F.sum(F.coalesce("_hit", F.lit(0))).alias("n_hit"),
            F.round(
                F.sum(F.coalesce("_hit", F.lit(0))) / F.count(F.lit(1)), 4
            ).alias("recall"),
        )
    )


def kcenter_coarse(
    fine: DataFrame,
    n_coarse: int,
) -> DataFrame:
    """TRAINED coarse level for the two-level quantizer (VERDICT r10
    item 3): greedy k-center (Gonzalez 1985) over the fine centroids --
    start from the smallest cent_id, then repeatedly add the fine
    centroid FARTHEST from the selected set (equivalently: the one whose
    max cosine to the set is smallest, ties to the smallest id). The
    selected coarse centers therefore SPREAD across the fine-centroid
    space with the classic 2-approximation covering guarantee, instead
    of the old "first kc by id" default whose arbitrary ids routed ~60%
    of vectors to the wrong fine cell (measured 42% agreement, VERDICT
    r10 What's-wrong #2).

    Exactness: the fine table is quantizer-sized (k rows), so it is
    collected and the greedy loop runs driver-side with the SAME
    sequential left-to-right IEEE arithmetic as the engine's `cosine`
    fold (plain Python accumulation, never numpy's pairwise/SIMD sums,
    and the per-candidate max-to-set is folded INCREMENTALLY with max)
    -- so a SQL oracle can replay the selection step for step via
    list_dot_product + greatest chains and pick identical ids. Returns
    the selected subset of ``fine`` unchanged: (cent_id, cv) -- coarse
    centroids ARE fine centroids, so both engines share their exact
    float values by construction."""
    import math

    rows = sorted(fine.select("cent_id", "cv").collect(), key=lambda r: r[0])
    ids = [int(r[0]) for r in rows]
    vecs = [[float(x) for x in r[1]] for r in rows]

    def _dot(u: list[float], v: list[float]) -> float:
        acc = 0.0
        for x, y in zip(u, v):
            acc += x * y
        return acc

    norms = [math.sqrt(_dot(v, v)) for v in vecs]

    def _cos(i: int, j: int) -> float:
        return _dot(vecs[i], vecs[j]) / max(norms[i] * norms[j], 1e-12)

    selected = [0]  # smallest cent_id (rows sorted)
    # max cosine of each candidate to the selected set, folded incrementally
    mc = [_cos(i, 0) for i in range(len(ids))]
    while len(selected) < min(n_coarse, len(ids)):
        sel = set(selected)
        best = min((mc[i], ids[i], i) for i in range(len(ids)) if i not in sel)
        selected.append(best[2])
        for i in range(len(ids)):
            mc[i] = max(mc[i], _cos(i, best[2]))
    keep = {ids[i] for i in selected}
    return fine.filter(F.col("cent_id").isin(sorted(keep)))


def two_level_assign(
    emb: DataFrame,
    fine: DataFrame,
    *,
    n_coarse: int = 6,
    nprobe: int = 1,
    coarse: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Two-level (coarse-then-fine, IMI-style) quantizer assignment --
    the documented mitigation for the exact O(n * k) nearest-centroid
    pass when cells are kept constant-size (k ~ n/cell, so the flat
    lookup is quadratic in the corpus; SCALING.md round-10 note):

      1. TRAIN the coarse level: greedy k-center over the fine
         centroids (`kcenter_coarse`; or pass any (cent_id, cv) frame
         via ``coarse``) -- k x kc work, quantizer-sized;
      2. route the k fine centroids to their nearest coarse cell;
      3. assign every vector to its ``nprobe`` nearest coarse cells
         (n x kc);
      4. equi-join vectors to the fine centroids of their probed
         coarse cells and argmax within (n x nprobe * k/kc on average).

    Total work O(n * (kc + nprobe * k/kc)) -- minimized at
    kc ~ sqrt(nprobe * k), a ~sqrt(k)-ish reduction -- at the standard
    approximation cost: a vector whose true nearest fine centroid
    routes to a coarse cell OUTSIDE its probe set gets its best probed
    fine centroid instead (the `embedding_two_level_agreement` row
    MEASURES that rate against the flat assignment; trained coarse +
    nprobe=2 measured 96%+ at sf0.01/sf0.1 vs 42% for the old
    untrained single-probe). The DUP-PAIR cost of that routing -- what
    the SemDeDup handoff actually pays -- is likewise measured, not
    argued (`embedding_two_level_pair_recall`, VERDICT r11 item 3):
    on a planted-cluster fixture at the production handoff shape
    (kc=ceil(sqrt(2k)), nprobe=2), tight dup pairs (cos >= 0.9)
    stay co-routed ~84% and loose tau=0.4 pairs ~47% at sf0.01 --
    tight pairs are strongly correlated through the router (83%+ vs
    the ~53% independent-routing floor implied by ~73% per-vector
    agreement), and the residual loss is the honest price of the 6x
    assignment win in the regime where flat is the 28x wall.
    Probed fine sets are disjoint by
    construction (each fine centroid routes to exactly one coarse
    cell), so the final argmax needs no dedup. Returns (vec_id, cell)."""
    if coarse is None:
        coarse = kcenter_coarse(fine, n_coarse)
    coarse = coarse.select(
        F.col("cent_id").alias("coarse_id"), F.col("cv").alias("ccv")
    )
    w_f = Window.partitionBy("cent_id").orderBy(
        F.col("_cos").desc(), F.col("coarse_id").asc()
    )
    f2c = (
        F.broadcast(coarse)
        .crossJoin(fine)
        .select(
            "cent_id", "cv", "coarse_id",
            cosine(F.col("ccv"), F.col("cv")).alias("_cos"),
        )
        .withColumn("_rn", F.row_number().over(w_f))
        .filter(F.col("_rn") == 1)
        .select("coarse_id", "cent_id", "cv")
    )
    # top-nprobe coarse cells per vector WITHOUT the old n x kc heavy-row
    # window shuffle: the broadcast crossJoin generates each vector's kc
    # candidate rows inside one task, so collect_list partial-aggregates
    # them map-side into a kc-length (cos, coarse_id) struct list; the
    # exchange carries n rows (vector once each, list of scalars) and the
    # sort_array(desc)/slice replay the window's exact ordering (cos DESC,
    # coarse_id ASC via the negated tie field) -- value-identical picks,
    # the oracle replays rn <= nprobe over the same doubles.
    vc = (
        F.broadcast(coarse)
        .crossJoin(emb.select(F.col(id_col), F.col(vec_col)))
        .select(
            id_col, vec_col, "coarse_id",
            cosine(F.col("ccv"), F.col(vec_col)).alias("_cos"),
        )
        .groupBy(id_col)
        .agg(
            F.first(vec_col).alias(vec_col),
            F.slice(
                F.sort_array(
                    F.collect_list(
                        F.struct(
                            F.col("_cos").alias("s"),
                            (-F.col("coarse_id")).alias("nc"),
                            F.col("coarse_id").alias("cid"),
                        )
                    ),
                    asc=False,
                ),
                1,
                nprobe,
            ).alias("_top"),
        )
        .select(
            id_col, vec_col, F.explode(F.col("_top.cid")).alias("coarse_id")
        )
    )
    # final fine argmax as max_by: the probed candidate rows stay in the
    # task that joined them (broadcast f2c), and the agg's hash(id)
    # partitioning is inherited from vc's groupBy -- no further exchange
    return (
        vc.join(F.broadcast(f2c), "coarse_id")
        .select(
            id_col, "cent_id",
            cosine(F.col("cv"), F.col(vec_col)).alias("_cos"),
        )
        .groupBy(id_col)
        .agg(
            F.max_by(
                F.col("cent_id"),
                F.struct(
                    F.col("_cos").alias("s"), (-F.col("cent_id")).alias("nc")
                ),
            ).alias("cell")
        )
        .select(id_col, "cell")
    )

"""The corpus-refresh DAG: incremental maintenance of a standing corpus +
its ANN index when a new crawl batch lands (VERDICT r13 item 3).

This is the monthly-crawl shape of the reference's own incremental load
(ref: document/stepfunction.md:187-189 -- re-run the pipeline over only
the new month's partition) lifted to the LLM-corpus tier: the standing
corpus and its IVF index are artifacts AT REST, and the refresh job pays
only for the batch --

    R0 (parallel) index     IVF index built from the STANDING embeddings
                            (fold-exact assignment, mode recorded in the
                            index meta so appends can never mix argmax
                            conventions -- operators/ann_index.py)
                  publish   standing corpus committed as manifest v1
                            (io/manifest.py atomic publish)
    R1            dedup     incremental MinHash dedup: the batch's band
                            signatures equi-join the standing index's --
                            batch x standing candidates ONLY, the standing
                            corpus never re-pairs with itself; survivors
                            (no standing match at >= 0.5 Jaccard) are the
                            kept tier
    R2            append    survivors' embeddings assigned with the
                            PERSISTED centroids under the RECORDED assign
                            mode and appended as new files into the
                            existing cell partitions (centroids never
                            retrain on append: cell ids must stay stable)
    R3            publish   refreshed corpus committed as manifest v2 --
                            the atomic cutover; v1 stays readable (rollback)
    R4            scratch   audit truth side (NOT a production cost): the
                            same index built FROM SCRATCH on the refreshed
                            corpus, for the cell-for-cell equality audit

`refresh_audit` then returns the per-document contract frame: refreshed
corpus membership, each member's persisted index cell, and boolean
witnesses that (a) every corpus vector is in the index, (b) its cell
equals the from-scratch build's cell (incremental maintenance == full
rebuild, the stream_dedup_clusters contract), and (c) the committed
manifest's version and row accounting are consistent.

Scale notes: R1's candidate generation is the banded equi-join with the
batch on one side -- work scales with the batch, not the corpus; R2 is a
map-only assignment over the batch plus new-file appends into existing
Hive partitions (no rewrite of standing cells); R3 writes one manifest.
Only R0 (first build) and R4 (audit twin) touch the full corpus.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..catalog import load_table
from ..io.manifest import latest_version, publish_tables, read_published
from .pipeline import Pipeline

# doc_id % 10 < 8 is the standing corpus; % 10 >= 8 the incoming batch
# (the same 80/20 split the incremental-CC bench stages use)
BATCH_MOD = 10
BATCH_MIN = 8
N_CENTROIDS = 8
DEDUP_THRESHOLD = 0.5


def _standing_pred(col: str):
    return F.col(col) % BATCH_MOD < BATCH_MIN


def run_corpus_refresh(
    spark: SparkSession, sf_dir: str, out_dir: str
) -> dict[str, float]:
    """Run the full refresh DAG; returns per-task wall seconds."""
    from ..operators.ann_index import append_ivf_index, build_ivf_index
    from ..operators.dedup import incremental_minhash_dedup

    p = os.path.join
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    standing_docs = docs.filter(_standing_pred("doc_id"))
    batch_docs = docs.filter(~_standing_pred("doc_id"))

    def r0_index() -> None:
        # fold-exact build: the registered audit carries an EXACT cell
        # oracle, and the meta record pins appends to the same argmax
        build_ivf_index(
            emb.filter(_standing_pred("vec_id")),
            p(out_dir, "ivf"),
            n_centroids=N_CENTROIDS,
        )

    def r0_publish() -> None:
        publish_tables(
            {"corpus": standing_docs.select("doc_id")}, p(out_dir, "pub")
        )

    def r1_dedup() -> None:
        inc = incremental_minhash_dedup(
            standing_docs, batch_docs, threshold=DEDUP_THRESHOLD
        )
        # survivors tier at rest: each stage reads the previous tier's
        # parquet (restartable), matching the curation plan's discipline
        inc.filter(~F.col("is_dup")).select("doc_id").write.mode(
            "error"
        ).parquet(p(out_dir, "kept_new"))

    def r2_append() -> None:
        kept = spark.read.parquet(p(out_dir, "kept_new"))
        new_emb = emb.join(
            kept.select(F.col("doc_id").alias("vec_id")), "vec_id", "left_semi"
        )
        # vectorized=None: honor the RECORDED assign mode (fold_exact)
        append_ivf_index(new_emb, p(out_dir, "ivf"), vectorized=None)

    def r3_publish() -> None:
        kept = spark.read.parquet(p(out_dir, "kept_new"))
        refreshed = standing_docs.select("doc_id").unionByName(kept)
        publish_tables({"corpus": refreshed}, p(out_dir, "pub"))

    def r4_scratch_twin() -> None:
        # audit truth side: from-scratch build over the refreshed corpus.
        # Seeds (vec_id < N_CENTROIDS) are all standing, so the scratch
        # centroids are identical to the persisted ones BY CONSTRUCTION
        # unless the build/append path broke -- which is what the
        # cell-for-cell audit exists to catch.
        corpus = read_published(spark, p(out_dir, "pub"), "corpus")
        kept_emb = emb.join(
            corpus.select(F.col("doc_id").alias("vec_id")), "vec_id", "left_semi"
        )
        build_ivf_index(
            kept_emb, p(out_dir, "ivf_scratch"), n_centroids=N_CENTROIDS
        )

    return (
        Pipeline()
        .add_stage("r0", index=r0_index, publish_v1=r0_publish)
        .add_stage("r1", dedup=r1_dedup)
        .add_stage("r2", append=r2_append)
        .add_stage("r3", publish_v2=r3_publish)
        # the task key carries the audit_only stamp (VERDICT r14 item 8):
        # R4 is the by-design from-scratch audit truth side, NOT a
        # production cost -- consumers of the per-stage wall split
        # (bench_result.json pipeline_stages, PERF.md) grade the
        # production wall as r0-r3 and report r4 separately
        .add_stage("r4", scratch_twin_audit_only=r4_scratch_twin)
        .run()
    )


def refresh_audit(
    spark: SparkSession, sf_dir: str, out_dir: str
) -> DataFrame:
    """Per-document contract frame over the refresh artifacts (requires
    `run_corpus_refresh` to have completed into ``out_dir``):

    (doc_id, src, cell, in_index, cell_match_scratch, manifest_version,
     manifest_rows_ok) -- cell is the PERSISTED index cell (exact-oracle
    replayable: seeded centroids + fold cosine argmax); the booleans are
    the incremental-equals-from-scratch and manifest-accounting
    witnesses, all TRUE when maintenance preserved state."""
    p = os.path.join
    corpus = read_published(spark, p(out_dir, "pub"), "corpus")
    lists = spark.read.parquet(p(out_dir, "ivf", "vectors")).select(
        "vec_id", F.col("cell").cast("long").alias("cell")
    )
    scratch = spark.read.parquet(p(out_dir, "ivf_scratch", "vectors")).select(
        F.col("vec_id").alias("_svid"), F.col("cell").cast("long").alias("_scell")
    )

    # bounded scalars: manifest accounting (version, declared vs actual
    # row counts, index cardinality == corpus cardinality)
    ver = latest_version(p(out_dir, "pub"))
    with open(p(out_dir, "pub", "_manifests", f"v{ver}.json")) as f:
        declared = json.load(f)["tables"]["corpus"]["n_rows"]
    n_corpus = corpus.count()
    n_index = lists.count()
    rows_ok = bool(declared == n_corpus == n_index)

    return (
        corpus.withColumn(
            "src",
            F.when(_standing_pred("doc_id"), F.lit("standing")).otherwise(
                F.lit("new")
            ),
        )
        .join(lists, corpus["doc_id"] == lists["vec_id"], "left")
        .join(scratch, F.col("doc_id") == F.col("_svid"), "left")
        .select(
            "doc_id",
            "src",
            "cell",
            F.col("vec_id").isNotNull().alias("in_index"),
            (
                F.col("_svid").isNotNull()
                & F.col("cell").eqNullSafe(F.col("_scell"))
            ).alias("cell_match_scratch"),
            F.lit(ver).cast("long").alias("manifest_version"),
            F.lit(rows_ok).alias("manifest_rows_ok"),
        )
    )

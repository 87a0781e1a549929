"""Retrieval-serving DAG (plans/retrieval.py): every index built at rest,
serving reads only artifacts, and the persisted-postings BM25 equals the
in-plan operator over the same cleaned corpus."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_glue_etl_sample_hist_spark.plans.retrieval import (
    QUERY_TERMS,
    _cleaned,
    run_retrieval,
    serve_bm25,
    serve_hybrid,
)


def test_retrieval_pipeline_end_to_end(spark, sf_small, tmp_path):
    out = str(tmp_path / "retr")
    walls = run_retrieval(spark, sf_small, out)
    assert {k.split(".")[0] for k in walls} == {"r0", "r1", "r2"}

    # persisted-postings BM25 == the in-plan operator over the SAME corpus
    from aws_glue_etl_sample_hist_spark.operators.ranking import bm25_topk

    want = {
        (r.doc_id, r.n_terms_matched, r.score)
        for r in bm25_topk(_cleaned(spark, sf_small), QUERY_TERMS, k=20).collect()
    }
    got = {
        (r.doc_id, r.n_terms_matched, r.score)
        for r in serve_bm25(spark, out, QUERY_TERMS, k=20).collect()
    }
    assert got == want

    # the serve artifact exists, is a valid top-10, and re-serving from the
    # artifacts alone reproduces it (restartability of r2)
    served = spark.read.parquet(f"{out}/serve")
    assert served.count() == 10
    emb = spark.read.parquet(f"{sf_small}/embeddings.parquet")
    qvec = (0, [float(x) for x in emb.filter(F.col("vec_id") == 0).first().embedding])
    again = serve_hybrid(spark, out, QUERY_TERMS, qvec)
    assert {tuple(r) for r in again.collect()} == {tuple(r) for r in served.collect()}

    # lexical pruning contract: a 1-term query's postings scan reads only
    # that term's partition directory
    one = (
        spark.read.parquet(f"{out}/postings")
        .filter(F.col("term") == "spark")
        .select(F.input_file_name().alias("f"))
        .distinct()
        .collect()
    )
    assert one and all("/term=spark/" in r.f for r in one)


def test_serve_mmr_from_artifacts(spark, sf_small, tmp_path):
    """The diversified serving stage: valid top-10 over the hybrid
    top-20, candidate vectors read from the persisted IVF artifact, and
    re-serving from the same artifacts is deterministic."""
    from pyspark.sql import functions as F

    from aws_glue_etl_sample_hist_spark.catalog import load_table
    from aws_glue_etl_sample_hist_spark.plans.retrieval import (
        QUERY_TERMS,
        run_retrieval,
        serve_mmr,
    )

    out = str(tmp_path / "ret")
    run_retrieval(spark, sf_small, out)
    served = spark.read.parquet(f"{out}/serve_mmr")
    rows = sorted(served.collect(), key=lambda r: r.mmr_rank)
    assert [r.mmr_rank for r in rows] == list(range(1, len(rows) + 1))
    assert len(rows) == min(10, served.count())
    emb = load_table(spark, sf_small, "embeddings")
    qrow = emb.filter(F.col("vec_id") == 0).select("embedding").first()
    again = serve_mmr(spark, out, QUERY_TERMS, (0, [float(x) for x in qrow.embedding]))
    assert {tuple(r) for r in again.collect()} == {tuple(r) for r in served.collect()}


def test_semantic_dedup_trained_prune_contract(spark, sf_small):
    """The prune rule behind the trained-quantizer SemDeDup row, pinned by
    brute force: given the cell assignment, a vector is flagged is_dup iff
    some LOWER-id vector in the same cell has cosine >= threshold with it
    -- verified within every cell on the sf0.001 corpus. (Since r11 the
    registered row additionally certifies this via in-plan witness
    columns with a DuckDB contract oracle -- semantic_dedup_witness.)"""
    import numpy as np

    from aws_glue_etl_sample_hist_spark.catalog import load_table
    from aws_glue_etl_sample_hist_spark.operators.similarity import (
        kmeans_parallel_centroids,
        semantic_dedup,
    )

    emb = load_table(spark, sf_small, "embeddings")
    cents = kmeans_parallel_centroids(emb, 4)
    out = semantic_dedup(emb, threshold=0.4, centroids=cents)
    rows = (
        out.join(
            emb.select(F.col("vec_id"), F.col("embedding")), "vec_id"
        ).collect()
    )
    assert len(rows) == emb.count()
    by_cell: dict = {}
    for r in rows:
        by_cell.setdefault(r.cell, []).append(r)
    n_dups = 0
    for members in by_cell.values():
        members.sort(key=lambda r: r.vec_id)
        vecs = {
            r.vec_id: np.asarray(r.embedding, dtype=np.float64) for r in members
        }
        for r in members:
            v = vecs[r.vec_id]
            nv = v / max(np.linalg.norm(v), 1e-12)
            expect_dup = False
            for q in members:
                if q.vec_id >= r.vec_id:
                    break
                w = vecs[q.vec_id]
                nw = w / max(np.linalg.norm(w), 1e-12)
                if float(nv @ nw) >= 0.4:
                    expect_dup = True
                    break
            assert bool(r.is_dup) == expect_dup, (r.vec_id, r.cell)
            n_dups += int(expect_dup)
    # the sf0.001 embedding fixture contains planted near-dups: the rule
    # must actually fire, not pass vacuously
    assert n_dups > 0


def test_semantic_dedup_witness_all_true_under_any_assignment(spark, sf_small):
    """The witness columns (semantic_dedup_witness) must be all-TRUE for
    BOTH quantizer routes the registered row can take: the flat trained
    assignment and the two-level (k-center coarse, nprobe=2) routing --
    the contract is conditioned on the actual cells, whatever produced
    them. Also pins non-vacuity: some vector must have a >= tau partner
    (so the dup direction of the witness actually fires)."""
    from aws_glue_etl_sample_hist_spark.catalog import load_table
    from aws_glue_etl_sample_hist_spark.operators.similarity import (
        kmeans_parallel_centroids,
        semantic_dedup,
        semantic_dedup_witness,
        two_level_assign,
    )

    emb = load_table(spark, sf_small, "embeddings")
    cents = kmeans_parallel_centroids(emb, 8)
    for route in ("flat", "two_level"):
        if route == "flat":
            out = semantic_dedup_witness(emb, centroids=cents)
        else:
            assigned = emb.join(
                two_level_assign(emb, cents, n_coarse=4, nprobe=2), "vec_id"
            )
            out = semantic_dedup_witness(emb, assigned=assigned)
        rows = out.collect()
        assert len(rows) == emb.count(), route
        assert all(r.dup_has_partner_ok for r in rows), route
        assert all(r.keeper_has_none_ok for r in rows), route
    # non-vacuity: the flat route must flag at least one dup on this
    # fixture (planted near-dups), i.e. the witness is not trivially true
    n_dup = (
        semantic_dedup(emb, centroids=cents)
        .filter(F.col("is_dup"))
        .count()
    )
    assert n_dup > 0


def test_bitext_margin_mining_hubness_correction(spark):
    """Planted geometry: a true translation pair (cos ~0.99) must be mined
    with mutual=True, while a HUB target (moderately close to every
    source) must not win any source at the same threshold -- the ratio
    margin's whole point. All vectors share sign bands (all-positive
    first coordinates) so every cross pair is a candidate and the test
    exercises the margin, not the banding."""
    import numpy as np

    from aws_glue_etl_sample_hist_spark.operators.similarity import (
        bitext_margin_pairs,
    )

    d = 64
    rng = np.random.default_rng(7)

    def vec(base, noise):
        v = base + noise * rng.standard_normal(d)
        # the band-sampled coordinates (1-based dims 1,5,...,61) get a
        # fixed positive value so every vector lands in the same sign
        # buckets -- candidates are all cross pairs by construction
        for i in range(0, d, 4):
            v[i] = 0.3
        return v

    e1 = np.zeros(d); e1[1] = 1.0
    e2 = np.zeros(d); e2[2] = 1.0
    hub = np.ones(d) * 0.5
    rows = [
        # side 0 (sources)
        (0, vec(e1 * 3.0, 0.01), 0),   # x0: translation of y0
        (1, vec(e2 * 3.0, 0.01), 0),   # x1: no true partner
        # side 1 (targets)
        (10, vec(e1 * 3.0, 0.01), 1),  # y0: translation of x0
        (11, vec(hub * 2.0, 0.01), 1), # hub: ~equally close to everything
        (12, vec(hub + e2 * 0.2, 0.01), 1),
    ]
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v], l) for i, v, l in rows],
        "vec_id long, embedding array<float>, label int",
    )
    out = {r.src_id: r for r in bitext_margin_pairs(
        emb, k=2, threshold=1.3
    ).collect()}
    assert 0 in out and out[0].tgt_id == 10 and bool(out[0].mutual)
    assert out[0].margin > 1.3
    # x1's best candidate is hub-like but its margin is deflated by the
    # hub's own high k-NN average -- below the mining threshold
    assert 1 not in out


def test_two_level_assign_agrees_on_separated_clusters(spark):
    """On well-separated clusters whose coarse centroids are cluster
    members, the two-level shortcut must agree with the flat exact
    assignment for EVERY vector -- the approximation only bites when a
    vector's best fine centroid routes to a different coarse cell."""
    import numpy as np

    from aws_glue_etl_sample_hist_spark.operators.similarity import (
        ivf_assign,
        seeded_centroids,
        two_level_assign,
    )

    d = 16
    rng = np.random.default_rng(3)
    # a NESTED hierarchy: two coarse directions (e0, e1); fine anchors
    # 0/1 sit exactly on them, fine anchors 2/3 are small orthogonal
    # offsets OF those directions -- so every vector and its best fine
    # centroid route to the same coarse cell by a wide cosine margin
    # (orthogonal flat clusters would tie at the coarse level and the
    # routing would be noise, which is the documented failure mode)
    anchors = []
    for c, (axis, off) in enumerate([(0, None), (1, None), (0, 2), (1, 3)]):
        base = np.zeros(d)
        base[axis] = 5.0
        if off is not None:
            base[off + 4] = 2.0
        anchors.append(base)
    rows = []
    vid = 0
    for base in anchors:
        rows.append((vid, [float(x) for x in base]))
        vid += 1
    for base in anchors:
        for _ in range(10):
            v = base + 0.05 * rng.standard_normal(d)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    fine = seeded_centroids(emb, 4)
    exact = {
        r.vec_id: r.cell for r in ivf_assign(emb, 4, centroids=fine).collect()
    }
    two = {
        r.vec_id: r.cell
        for r in two_level_assign(emb, fine, n_coarse=2).collect()
    }
    assert two == exact

"""Benchmark harness: headline queries + the full medallion pipeline at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...},
   "sentinel_sec": N, "ratios_to_sentinel": {...}, "sf": ...}

`value` is the end-to-end medallion pipeline wall-clock (the reference's
comparable number: its full initial load ran 20 min on 28.6M rows / 2-4
G.1X workers, BASELINE.md). Queries are materialized with the noop sink so
the whole plan executes without driver-collect or disk-write skew.

The SENTINEL is a frozen scan+shuffle+agg workload written inline (never
via QUERIES, never to be edited): a uniform wall-clock shift that also
moves the sentinel is machine state, a query whose RATIO to the sentinel
moved is a real code delta. It is timed before AND after the query loop
(r3 VERDICT item 4) AND once every ~10 headline rows THROUGH the loop
(r10 VERDICT item 2: two rounds of 3-20x inflation on contiguous row
clusters were invisible to the endpoint probes -- a mid-run load window
inflates all trials of the rows inside it while both endpoints read
normal); every query's ratio to its NEAREST-in-time sentinel lands in
bench_result.json, and the sentinel_track series rides the driver's
compact stdout line.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import tempfile
import time

from aws_glue_etl_sample_hist_spark.operators._cache import release_operator_caches
from aws_glue_etl_sample_hist_spark.plans.medallion import run_medallion
from aws_glue_etl_sample_hist_spark.queries import QUERIES
from aws_glue_etl_sample_hist_spark.session import get_spark

HEADLINE = [
    "pricing_summary",
    "bronze_purchases",
    "silver_denorm",
    "mart_sales_by_segment_product",
    "mart_sales_by_customer",
    "mart_sales_by_datetime",
    "mart_sales_by_region",
    "monthly_revenue",
    "weekday_hour_revenue",
    "customer_base_stats",
    "customer_monthly_stats",
    "top_parts",
    "customer_running_total",
    # north-star extensions: LLM-data-pipeline operators
    "text_stats",
    "dedup_exact",
    "dedup_minhash_lsh",
    "embedding_cosine_topk",
    "embedding_ivf_ann",
    "multimodal_media_meta",
    "events_windowed_agg",
    "events_sessionize",
    "embedding_near_dup_bucketed",
    "corpus_shard_pack",
    "text_tfidf_top_terms",
    "events_asof_last_order",
    "stream_events_dedup",
    "text_gopher_quality",
    "corpus_strip_boilerplate",
    "embedding_semantic_dedup",
    "embedding_pq_topk",
    "dedup_incremental",
    "events_incident_windows",
    "events_funnel",
    "customer_cohort_retention",
    "corpus_zipf",
    "dq_audit",
    # round-4 additions (the scale-interesting ones)
    "documents_bm25_topk",
    "part_set_similarity_join",
    "events_heavy_hitters",
    "events_distinct_rolling7",
    "mart_incremental_update",
    # round-5 additions: iterative graph, tokenizer apply, lossy codec
    "nations_pagerank",
    "corpus_bpe_encode",
    "multimodal_jpeg_decode",
    # round-6 additions: cross-doc exact substring dedup, converged graph
    "corpus_substring_dedup",
    "nations_pagerank_converged",
    "corpus_substring_dedup_apply",
    "corpus_dsir_select",
    "embedding_hard_negatives",
    # round-7 additions: banded-hamming media near-dup (packed BIGINT),
    # asymmetric containment, context packing, ANN recall accounting
    "multimodal_image_near_dup",
    "dedup_containment",
    "corpus_context_pack",
    "embedding_ivf_recall",
    "embedding_pq_recall",
    # round-7-late: drift monitor, CMS, KN perplexity, balanced sampling
    "corpus_psi_drift",
    "corpus_token_cms",
    "corpus_kn_perplexity",
    "corpus_balanced_sample",
    "customer_survival_km",
    "dedup_clusters_incremental",
    "customer_survival_logrank",
    "events_ab_test",
    "retrieval_ndcg",
    "nations_communities",
    # round-8: the engine's two slowest queries (judge-measured 19.8 s /
    # 13.6 s in r7, absent from the headline until now -- VERDICT item 2)
    # plus the remaining r7-late rows with no bench evidence
    "corpus_unigram_train",
    "corpus_dsir_quality",
    "embedding_matryoshka_recall",
    "embedding_pq_trained",
    "customer_l_diversity",
    "stream_events_heavy_hitters",
    "stream_quality_drift",
    "stream_dedup_clusters",
    "dedup_lsh_recall",
    # round-8 quality-evaluation + serving family
    "text_quality_auc",
    "events_ab_fdr",
    "retrieval_mmr",
    "quality_conformal",
    "corpus_ccnet_buckets",
    "corpus_mixture_temperature",
    "dedup_lsh_precision",
    "stream_events_ab",
    # round-9: percentile-cut CCNet twin (the NTILE scale fix) and the
    # sampled production mode of the LSH recall audit
    "corpus_ccnet_buckets_cuts",
    "dedup_lsh_recall_sampled",
    # round-9 (late): cluster canonicalization, coreset selection, epoch
    # planning, winnowing fingerprints, streaming quantile monitor
    "dedup_cluster_keeper",
    "embedding_kcenter_coreset",
    "corpus_epoch_plan",
    "text_winnow_fingerprints",
    "stream_quality_quantiles",
    "dedup_winnow_pairs",
    "events_ab_sprt",
    "dedup_kcore",
    # round-10: trained-quantizer SemDeDup, keep-longest curation release,
    # winnowing-vs-truth recall audit
    "embedding_semantic_dedup_trained",
    "corpus_release",
    "dedup_winnow_recall",
    "embedding_bitext_mine",
    "customer_id_luhn_audit",
    "embedding_two_level_agreement",
    # round-11: sampled production dials + bitext recall audit + the
    # Arrow/BLAS assignment contrast row
    "dedup_winnow_recall_sampled",
    "embedding_bitext_recall",
    "embedding_assign_arrow_agreement",
    # round-12: two-level handoff dup-pair preservation audit
    "embedding_two_level_pair_recall",
    # round-13: the nprobe preservation-vs-cost dial (3-point sweep over
    # one shared coarse level; wall here is the full sweep's cost)
    "embedding_two_level_nprobe_curve",
]


def _sf_from_dir(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else -1.0


def _sentinel_trial(spark, sf_dir: str) -> float:
    """FROZEN drift probe -- do not edit this function between rounds.

    Pure built-in scan -> shuffle agg -> noop write over lineitem, touching
    no engine code, so its wall time can only move with machine state /
    Spark runtime -- never with this repo's changes."""
    from pyspark.sql import functions as F

    t0 = time.perf_counter()
    (
        spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
        .groupBy("l_suppkey")
        .agg(
            F.sum("l_extendedprice").alias("s"),
            F.avg("l_quantity").alias("a"),
            F.count("*").alias("c"),
        )
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    return time.perf_counter() - t0


def _job_overhead_trial(spark) -> float:
    """FROZEN tiny-job latency probe -- do not edit between rounds.

    20 sequential one-partition count jobs over a 1-row in-memory frame:
    near-zero compute, so the wall is ~pure driver-side job scheduling +
    task launch latency. The r9 driver bench drifted +20-31% ONLY on
    job-overhead-bound rows (streaming drains, iterative loops) while the
    scan+shuffle sentinel got FASTER -- two probes separate the two
    machine-state axes: if this probe inflates on the driver while the
    scan sentinel holds, the drift is per-job latency (environment), not
    an engine regression."""
    df = spark.range(1).coalesce(1)
    t0 = time.perf_counter()
    for _ in range(20):
        df.count()
    return time.perf_counter() - t0


def _next_job_id(spark) -> int | None:
    """Total Spark jobs submitted so far -- DAGScheduler.numTotalJobs
    read through py4j (a read-only accessor on the scheduler's job-id
    counter; Scala ``private[spark]`` compiles to public bytecode, so
    the gateway reaches it). The delta across a row's trials is its JOB
    COUNT, which is what makes overhead-bound rows comparable across
    runs with different per-job latency floors (VERDICT r13 item 1):
    normalized wall = wall - jobs * per_job_overhead. Counting via job
    groups would MISS Structured Streaming microbatches (the stream
    runner overrides the group id), and the UI statusStore evicts past
    spark.ui.retainedJobs; every job, microbatches included, bumps this
    counter forever. Returns None if the internal moved in some future
    Spark -- job columns are then simply absent, never wrong."""
    try:
        return int(spark.sparkContext._jsc.sc().dagScheduler().numTotalJobs())
    except Exception:  # noqa: BLE001 -- internals moved: record no counts
        return None


GATE_HEADROOM = 1.15
# a single interleaved sentinel trial is noisier than an endpoint median,
# so the mid-run-window check gets looser headroom: the failure mode it
# exists for (r9/r10 contiguous-row inflation) read 3-20x, not 1.2x
TRACK_HEADROOM = 2.0


def gate_reference() -> dict[str, float]:
    """Settled probe values the closing artifact is gated against
    (VERDICT r12 item 7). Committed BENCH_GATE.json carries the DRIVER
    box's settled medians (r9-r11 band); env overrides let a build box
    with a different floor gate against its OWN settled values
    (SPARK_GRAFT_GATE_SENTINEL / SPARK_GRAFT_GATE_OVERHEAD, seconds)."""
    ref: dict[str, float] = {}
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_GATE.json"
    )
    if os.path.exists(path):
        with open(path) as f:
            ref.update(
                {
                    k: float(v)
                    for k, v in json.load(f).items()
                    if k in ("sentinel_sec", "job_overhead_sec")
                }
            )
    for key, env in (
        ("sentinel_sec", "SPARK_GRAFT_GATE_SENTINEL"),
        ("job_overhead_sec", "SPARK_GRAFT_GATE_OVERHEAD"),
    ):
        v = os.environ.get(env)
        if v:
            ref[key] = float(v)
    return ref


def probe_gate(
    sentinel_sec: float,
    job_overhead_sec: float,
    ref: dict[str, float],
    sentinel_track_vals: list[float] | None = None,
) -> tuple[bool, dict]:
    """Is this run's machine state settled enough for its numbers to be
    the round's closing artifact? Pure decision logic (unit-tested):
    each probe must read within GATE_HEADROOM (~15%) of its settled
    reference; probes without a reference pass vacuously (first round
    on a new box). ``sentinel_track_vals`` (ADVICE r13): the interleaved
    single-trial sentinel readings taken THROUGH the loop -- the gated
    medians are endpoint-heavy, so a mid-run load window (the r9/r10
    failure mode) can hide between settled endpoints; the worst
    interleaved reading must stay under TRACK_HEADROOM (2x) of the
    settled sentinel or the artifact is refused."""
    checks: dict[str, dict] = {}
    passed = True
    for key, got in (
        ("sentinel_sec", sentinel_sec),
        ("job_overhead_sec", job_overhead_sec),
    ):
        settled = ref.get(key)
        if settled is None:
            continue
        limit = settled * GATE_HEADROOM
        ok = got <= limit
        checks[key] = {
            "got": round(got, 3),
            "settled": round(settled, 3),
            "limit": round(limit, 3),
            "ok": ok,
        }
        passed = passed and ok
    settled = ref.get("sentinel_sec")
    if sentinel_track_vals and settled is not None:
        worst = max(sentinel_track_vals)
        limit = settled * TRACK_HEADROOM
        ok = worst <= limit
        checks["sentinel_track_max"] = {
            "got": round(worst, 3),
            "settled": round(settled, 3),
            "limit": round(limit, 3),
            "ok": ok,
        }
        passed = passed and ok
    return passed, checks


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bench")
    timings: dict[str, float] = {}
    timings_min: dict[str, float] = {}
    timings_trials: dict[str, list[float]] = {}
    # per-row Spark JOB COUNTS (VERDICT r13 item 1): jobs-per-trial from
    # the DAGScheduler counter delta across the row's trials. Rows whose
    # wall is mostly jobs x per-job scheduling latency (streaming drains,
    # iterative graph loops) inflate with the box's job-latency floor,
    # which sentinel RATIOS cannot normalize -- wall - jobs * per_job
    # can, across ANY two runs that both carry counts.
    jobs: dict[str, float] = {}
    track_singles: list[float] = []  # interleaved sentinel readings (gate)

    # JVM / codegen / file-listing warmup (not timed): exercise scan + agg +
    # noop-write machinery once so the first timed query isn't charged for it
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
    QUERIES["monthly_revenue"](spark, sf_dir).write.format("noop").mode("overwrite").save()

    # median of 3 trials per query: run-to-run machine-load variance was
    # measured at ~25%, which buried real regressions between rounds
    n_trials = int(os.environ.get("SPARK_GRAFT_BENCH_TRIALS", "3"))
    # the very first sentinel trials read 1.5-2.5x settled even on an idle
    # box (shuffle/codegen paths still warming -- r11 track0 0.969 vs
    # settled 0.387), so two DISCARDED trials warm the probe before any
    # value that feeds the gate or the record
    for _ in range(2):
        _sentinel_trial(spark, sf_dir)
    sentinel_trials = [_sentinel_trial(spark, sf_dir) for _ in range(n_trials)]
    overhead_trials = [_job_overhead_trial(spark) for _ in range(n_trials)]
    gate_ref = gate_reference()
    # strict mode: refuse up front (seconds, not 40 minutes) when the
    # box is visibly degraded -- local closing-bench workflow
    if os.environ.get("SPARK_GRAFT_BENCH_GATE", "") == "strict":
        early_ok, early_checks = probe_gate(
            statistics.median(sentinel_trials),
            statistics.median(overhead_trials),
            gate_ref,
        )
        if not early_ok:
            print(
                "PROBE GATE (strict): box not settled -- "
                f"{json.dumps(early_checks)}; re-run when idle "
                "(no pytest/Spark session alongside), or override the "
                "reference via SPARK_GRAFT_GATE_SENTINEL / "
                "SPARK_GRAFT_GATE_OVERHEAD",
                file=sys.stderr,
            )
            spark.stop()
            sys.exit(3)
    # INTERLEAVED sentinel (r10 VERDICT item 2): the r9/r10 driver benches
    # recorded 3-20x inflation on a CONTIGUOUS stretch of headline rows
    # that the before/after endpoint probes never saw (a mid-run load
    # window inflates all 3 trials of the rows inside it, min included,
    # while both endpoints read normal). One frozen-sentinel trial every
    # INTERLEAVE rows timestamps machine state THROUGH the loop, so every
    # query gets a ratio to its NEAREST-in-time sentinel -- a row is a
    # real regression only if that LOCAL ratio moved.
    # clamp: 0 or negative would ZeroDivisionError the loop (ADVICE r11)
    interleave = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_INTERLEAVE", "10")))
    sentinel_track: list[tuple[int, float]] = [
        (-1, statistics.median(sentinel_trials))
    ]
    query_pos: dict[str, int] = {}
    for qi, name in enumerate(n for n in HEADLINE if n in QUERIES):
        trials = []
        j0 = _next_job_id(spark)
        for _ in range(n_trials):
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            trials.append(time.perf_counter() - t0)
            # release BETWEEN trials, not after the row (VERDICT r14
            # item 2): Spark's CacheManager substitutes any still-
            # persisted subtree from trial 1 into trials 2-3's plans
            # (the mechanism behind the r14 test_plans order-dependence
            # fix), so rows with tracked persists were reading partially
            # cached medians. Releasing the tracked operator caches AND
            # clearing the catalog cache before the next trial makes
            # every trial a cold execution -- the median now measures
            # per-execution cost. The release sits OUTSIDE the timed
            # window on both sides.
            release_operator_caches()
            spark.catalog.clearCache()
        j1 = _next_job_id(spark)
        if j0 is not None and j1 is not None:
            jobs[name] = round((j1 - j0) / n_trials, 1)
        timings[name] = round(statistics.median(trials), 3)
        # min-of-trials is the load-jitter-robust floor: a row whose driver
        # MEDIAN inflates while its MIN matches the local run is transient
        # machine load, not a code regression (bench_result.json only)
        timings_min[name] = round(min(trials), 3)
        # per-trial walls (bench_result.json only): with cold-per-trial
        # semantics these expose residual warm effects (JVM JIT, page
        # cache) without guessing
        timings_trials[name] = [round(t, 3) for t in trials]
        query_pos[name] = qi
        if (qi + 1) % interleave == 0:
            s = _sentinel_trial(spark, sf_dir)
            sentinel_track.append((qi, s))
            track_singles.append(s)
    sentinel_trials += [_sentinel_trial(spark, sf_dir) for _ in range(n_trials)]
    overhead_trials += [_job_overhead_trial(spark) for _ in range(n_trials)]
    sentinel_track.append((len(query_pos), statistics.median(sentinel_trials[n_trials:])))
    sentinel_sec = round(statistics.median(sentinel_trials), 3)
    job_overhead_sec = round(statistics.median(overhead_trials), 3)

    # ---- pipeline phase: sentinel-bracketed (r11 VERDICT item 1) ----
    # The r11 bench's only unexplained regression (curation_pipeline +32%)
    # sat exactly where the interleaved sentinel could not see: the
    # pipeline rows run AFTER the bracketed headline loop, so they
    # reported ratio=None and environment-vs-code was unadjudicable. Each
    # pipeline timing now gets its own position on the sentinel-track
    # axis with one frozen trial AFTER every row, and the plan runners'
    # per-stage wall splits land in bench_result.json so a genuine code
    # regression is stage-named, not pipeline-blamed.
    pipe_pos = len(query_pos) + 1  # +1: endpoint sentinel owns len(query_pos)
    pipeline_stages: dict[str, dict[str, float]] = {}

    def _pipeline_row(name: str, fn) -> None:
        nonlocal pipe_pos
        j0 = _next_job_id(spark)
        t0 = time.perf_counter()
        stages = fn()
        timings[name] = round(time.perf_counter() - t0, 3)
        j1 = _next_job_id(spark)
        if j0 is not None and j1 is not None:
            jobs[name] = float(j1 - j0)  # pipelines run once, not n_trials
        if isinstance(stages, dict):
            pipeline_stages[name] = {
                k: round(v, 3) for k, v in stages.items()
            }
        query_pos[name] = pipe_pos
        release_operator_caches()
        spark.catalog.clearCache()
        s = _sentinel_trial(spark, sf_dir)
        sentinel_track.append((pipe_pos, s))
        track_singles.append(s)
        pipe_pos += 1

    def _run_medallion_row():
        with tempfile.TemporaryDirectory(prefix="medallion_bench_") as tmp:
            return run_medallion(spark, sf_dir, tmp)

    _pipeline_row("medallion_pipeline", _run_medallion_row)
    pipeline_sec = timings["medallion_pipeline"]

    # the LLM-curation DAG (stats ∥ benchmark -> cleaned -> released ->
    # training ∥ manifest), same materialized-tier architecture
    from aws_glue_etl_sample_hist_spark.plans.curation import run_curation

    def _run_curation_row():
        with tempfile.TemporaryDirectory(prefix="curation_bench_") as tmp:
            return run_curation(spark, sf_dir, tmp)

    _pipeline_row("curation_pipeline", _run_curation_row)

    # the retrieval-serving DAG (cleaned -> postings ∥ lengths ∥ ivf ∥ pq ->
    # hybrid serve from artifacts only)
    from aws_glue_etl_sample_hist_spark.plans.retrieval import run_retrieval

    def _run_retrieval_row():
        with tempfile.TemporaryDirectory(prefix="retrieval_bench_") as tmp:
            return run_retrieval(spark, sf_dir, tmp)

    _pipeline_row("retrieval_pipeline", _run_retrieval_row)

    # the incremental corpus-refresh DAG (standing corpus + IVF index at
    # rest -> batch-only dedup -> index append under the recorded assign
    # mode -> atomic manifest cutover -> from-scratch audit twin)
    from aws_glue_etl_sample_hist_spark.plans.refresh import run_corpus_refresh

    def _run_refresh_row():
        with tempfile.TemporaryDirectory(prefix="refresh_bench_") as tmp:
            return run_corpus_refresh(spark, sf_dir, tmp)

    _pipeline_row("corpus_refresh_pipeline", _run_refresh_row)

    # incremental-CC PRODUCTION path: standing labels + batch pairs are
    # artifacts at rest (staged untimed); the timed part is ONLY what the
    # daily-crawl job pays -- read the artifacts and run the contracted
    # merge. The registered dedup_clusters_incremental row recomputes the
    # standing labels in-plan to keep its oracle self-contained, so it
    # overstates the production cost; this row is the honest number
    # (r7 VERDICT item 5).
    from aws_glue_etl_sample_hist_spark.operators.dedup import (
        connected_components,
        connected_components_incremental,
        ngram_jaccard_pairs,
    )
    from pyspark.sql import functions as F

    with tempfile.TemporaryDirectory(prefix="cc_inc_bench_") as tmp:
        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        pairs = ngram_jaccard_pairs(
            docs, n=3, threshold=0.2, max_df=100
        ).select("doc_a", "doc_b")
        new_a = F.col("doc_a") % 10 >= 8
        new_b = F.col("doc_b") % 10 >= 8
        old_nodes = docs.filter(F.col("doc_id") % 10 < 8).select("doc_id")
        connected_components(
            old_nodes, pairs.filter(~new_a & ~new_b)
        ).write.parquet(os.path.join(tmp, "labels"))
        pairs.filter(new_a | new_b).write.parquet(os.path.join(tmp, "bpairs"))
        docs.filter(F.col("doc_id") % 10 >= 8).select("doc_id").write.parquet(
            os.path.join(tmp, "bnodes")
        )
        release_operator_caches()

        def _run_cc_merge_row():
            trials = []
            for _ in range(n_trials):
                t0 = time.perf_counter()
                connected_components_incremental(
                    spark.read.parquet(os.path.join(tmp, "labels")),
                    spark.read.parquet(os.path.join(tmp, "bnodes")),
                    spark.read.parquet(os.path.join(tmp, "bpairs")),
                ).write.format("noop").mode("overwrite").save()
                trials.append(time.perf_counter() - t0)
                # same cold-per-trial rule as the headline loop
                release_operator_caches()
                spark.catalog.clearCache()
            # report the median like the headline rows; _pipeline_row
            # re-times the whole fn, so overwrite with the median after
            return {"merge_median_of_trials": statistics.median(trials)}

        _pipeline_row(
            "dedup_clusters_incremental_merge_only", _run_cc_merge_row
        )
        timings["dedup_clusters_incremental_merge_only"] = round(
            pipeline_stages["dedup_clusters_incremental_merge_only"][
                "merge_median_of_trials"
            ],
            3,
        )
        # this "pipeline" row is n_trials merges; per-trial jobs like the
        # headline rows so wall (a median of one trial) and jobs agree
        if "dedup_clusters_incremental_merge_only" in jobs:
            jobs["dedup_clusters_incremental_merge_only"] = round(
                jobs["dedup_clusters_incremental_merge_only"] / n_trials, 1
            )

    # bucketed-bronze variant: the shuffle-free T1 layout (plans.medallion)
    def _run_medallion_bkt_row():
        with tempfile.TemporaryDirectory(prefix="medallion_bkt_bench_") as tmp:
            return run_medallion(spark, sf_dir, tmp, bucketed=True)

    _pipeline_row("medallion_pipeline_bucketed", _run_medallion_bkt_row)
    from aws_glue_etl_sample_hist_spark.io.bucketing import drop_table
    from aws_glue_etl_sample_hist_spark.plans.medallion import (
        FACT_BKT_TABLE,
        ORDERS_BKT_TABLE,
    )
    drop_table(spark, FACT_BKT_TABLE)
    drop_table(spark, ORDERS_BKT_TABLE)

    # per-query ratio to the NEAREST interleaved sentinel, plus that
    # sentinel's own value: a slow row next to an elevated sentinel is
    # machine load on the record, not an engine regression. Computed
    # AFTER the pipeline phase so pipeline rows carry ratios too
    # (r11 VERDICT item 1: curation_pipeline's +32% was unattributable
    # exactly because these rows had none).
    ratios_nearest: dict[str, list[float]] = {}
    for name, qi in query_pos.items():
        near = min(sentinel_track, key=lambda s: (abs(s[0] - qi), s[0]))[1]
        ratios_nearest[name] = [
            round(timings[name] / max(near, 1e-9), 2),
            round(near, 3),
        ]

    # Human-readable ratio table -> stderr ONLY. BENCH_r04 failed to parse
    # because carrying both the walls dict and the ratios dict pushed the
    # stdout JSON line (~4 KB) past the driver's tail-capture window, which
    # cut the head of the line. Ratios are fully derivable (wall /
    # sentinel_sec), so the compact driver-spec line below loses nothing.
    for k in sorted(timings):
        near = f" nearest={ratios_nearest[k][0]}@{ratios_nearest[k][1]}s" if k in ratios_nearest else ""
        print(
            f"ratio_to_sentinel {k} {timings[k] / sentinel_sec:.2f}{near}",
            file=sys.stderr,
        )
    result = {
        "metric": "medallion_pipeline_e2e",
        "value": pipeline_sec,
        "unit": "sec",
        "queries": timings,
        "queries_min": timings_min,
        "queries_trials": timings_trials,
        "sentinel_sec": sentinel_sec,
        "job_overhead_sec": job_overhead_sec,
        # [ratio_to_nearest_interleaved_sentinel, that_sentinel_sec] per
        # query (bench_result.json only; the compact stdout line carries
        # sentinel_track, from which drift windows are readable directly)
        "ratios_to_nearest_sentinel": ratios_nearest,
        # per-stage wall splits from the plan runners (bench_result.json
        # only): if a pipeline row regresses ratio-high, the stage that
        # moved is named here instead of re-running the DAG by hand
        "pipeline_stages": pipeline_stages,
        "sentinel_track": [
            [i, round(s, 3)] for i, s in sentinel_track
        ],
        # jobs-per-trial per row (DAGScheduler counter delta): with
        # job_overhead_sec (a 20-job probe -> per_job = /20) this is the
        # normalization that makes overhead-bound rows comparable across
        # runs -- tools/bench_ratio_compare.py consumes both
        "jobs": jobs,
        "sf": _sf_from_dir(sf_dir),
    }
    # ---- closing-artifact probe gate (VERDICT r12 item 7) ----
    # r12 shipped a closing bench_result.json from a box whose probes
    # read +36%/+42% over settled, and 27 rows had to be re-adjudicated
    # by hand. The sentinel axis is gated on the median of ALL sentinel
    # observations (endpoint trials + every interleaved reading, ADVICE
    # r13 -- endpoint-only medians were blind to mid-run load windows),
    # and the WORST interleaved reading separately at TRACK_HEADROOM so
    # a short degraded window inside the loop also refuses the artifact.
    sentinel_all_med = statistics.median(sentinel_trials + track_singles)
    gate_ok, gate_checks = probe_gate(
        sentinel_all_med,
        job_overhead_sec,
        gate_ref,
        sentinel_track_vals=track_singles,
    )
    result["probe_gate"] = {"passed": gate_ok, "checks": gate_checks}
    # ALSO write the result as its own intact JSON artifact: the driver's
    # stdout tail-capture truncated BENCH_r06/r07 into an unparseable
    # string (r7 VERDICT item 4); bench_result.json is always whole and
    # machine-diffable round over round -- UNLESS the gate failed: a
    # known-degraded run must not become the committed closing artifact
    # (the stdout line below still prints, so a driver-side record
    # always exists, stamped with probe_gate.passed=false).
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_result.json")
    if gate_ok or os.environ.get("SPARK_GRAFT_BENCH_GATE", "") == "off":
        with open(out_path, "w") as f:
            json.dump(result, f, indent=1)
    else:
        # quarantine, don't vanish (ADVICE r13): a wrapper that runs
        # bench.py then reads bench_result.json must not silently
        # attribute the PREVIOUS run's numbers to this code -- the
        # refused run lands whole in bench_result.degraded.json so
        # staleness is detectable, and the stale main artifact's mtime
        # now predates the degraded one.
        with open(out_path.replace(".json", ".degraded.json"), "w") as f:
            json.dump(result, f, indent=1)
        print(
            "PROBE GATE: run degraded -- "
            f"{json.dumps(gate_checks)}; bench_result.json NOT "
            "overwritten (refused run written to "
            "bench_result.degraded.json). Re-run on a settled box (no "
            "concurrent pytest/Spark), or SPARK_GRAFT_BENCH_GATE=off "
            "to force.",
            file=sys.stderr,
        )

    # The driver captures only the LAST ~2 KB of stdout, and the full
    # queries dict (86 rows, ~2.6 KB compact) can never fit -- that is why
    # BENCH_r06-r08 recorded parsed=null with a mid-JSON tail (r8 VERDICT
    # item 6). The stdout line must therefore be SELF-TRIMMING: emit the
    # full dict if it fits the window, else drop the FASTEST rows (the
    # slow rows are the ones the judge grades; bench_result.json always
    # carries every row) until the single line is <= 1800 bytes.
    line = dict(result)
    # per-query min + nearest-sentinel ratios live in bench_result.json
    # only -- doubling the dict would halve how many rows fit the
    # driver's stdout tail window; sentinel_track (~12 pairs) stays, it
    # is what makes a mid-run load window attributable from the driver's
    # record alone
    del line["queries_min"]
    del line["queries_trials"]
    del line["ratios_to_nearest_sentinel"]
    del line["pipeline_stages"]
    # LINE-only precision trims (VERDICT r14 item 2 -- kept-row count
    # beats the third decimal): query walls at 2 dp and track readings
    # at 2 dp on the stdout line; bench_result.json keeps 3 dp
    line["sentinel_track"] = [[i, round(s, 2)] for i, s in sentinel_track]
    # compact gate verdict for the driver record; full checks live in
    # bench_result.json (when written) and on stderr
    line["probe_gate"] = gate_ok
    kept = dict(
        (k, round(v, 2))
        for k, v in sorted(timings.items(), key=lambda kv: (-kv[1], kv[0]))
    )
    while True:
        line["queries"] = kept
        # job counts ride the driver line as INTS for the 12 slowest kept
        # rows at >= 2 s only (VERDICT r14 item 2: the full-float
        # all-rows jobs dict ate the line budget and halved the kept rows
        # to 23 -- the kept-ROW count now has priority over jobs
        # coverage, and the overhead-bound suspects are by construction
        # among the slowest rows). Full float jobs for every row stay in
        # bench_result.json (VERDICT r13 item 1).
        line["jobs"] = {
            k: int(round(jobs[k]))
            for k in list(kept)[:10]
            if k in jobs and timings[k] >= 2.0
        }
        line["queries_omitted"] = len(timings) - len(kept)
        s = json.dumps(line, separators=(",", ":"))
        if len(s) <= 1800 or not kept:
            break
        kept = dict(list(kept.items())[:-1])
    print(s)
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())

"""Event/behavioral analytics operators: ordered funnels, cohort retention,
RFM segmentation.

These are the classic product-analytics queries a warehouse team runs daily;
the reference's Glue marts (ref:document/glue_t2.md) stop at grouped
revenue, so these extend the mart layer with the sequence-aware shapes.

Scale design notes
------------------
- Funnel: per-user step timestamps are chained conditional window minima
  over ONE hash(user) partitioning -- Catalyst reuses a single exchange for
  all step columns, so an N-step funnel costs one shuffle, not N. The final
  reach counts collapse to a single row before the per-step `stack`.
- Cohort retention: the only data-scale shuffle is hash(customer) for the
  first-order window; everything after runs on the (cohort x offset) grid,
  which is calendar-bounded (months^2 rows) no matter the corpus size.
- RFM: quartile CUTS + threshold comparison instead of `ntile()`. A global
  ntile is a single-task sort at 100 TB; three scalar cuts broadcast to a
  map-only scorer is the same segmentation without the bottleneck (swap
  `percentile` for `approx_percentile` at real scale -- the knob is the
  one expression). Cuts are rounded to 6 dp so the engine and the DuckDB
  oracle agree bitwise at the boundaries.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window


def funnel_reach(
    events: DataFrame,
    steps: list[str],
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered-funnel reach: one row per step with the number of users whose
    event stream contains the steps IN ORDER (step i at-or-after the user's
    earliest completion of step i-1; same-timestamp progression allowed).

    Greedy-earliest semantics: t1 = min ts of step 1; t_i = min ts of step i
    with ts >= t_{i-1}. Greedy-earliest is optimal here: any valid ordered
    assignment implies the greedy one exists, so reach counts are exact.

    Returns (step_idx, step, n_users, conversion) where conversion is the
    fraction of step-1 reachers (1.0 for the first step)."""
    w = Window.partitionBy(user_col)
    df = events.select(user_col, ts_col, type_col)
    prev: str | None = None
    for i, step in enumerate(steps, 1):
        cond = F.col(type_col) == F.lit(step)
        if prev is not None:
            cond = cond & (F.col(ts_col) >= F.col(prev))
        df = df.withColumn(f"_t{i}", F.min(F.when(cond, F.col(ts_col))).over(w))
        prev = f"_t{i}"
    per_user = df.groupBy(user_col).agg(
        *[F.min(f"_t{i}").alias(f"_t{i}") for i in range(1, len(steps) + 1)]
    )
    counts = per_user.agg(
        *[F.count(f"_t{i}").alias(f"n{i}") for i in range(1, len(steps) + 1)]
    )
    tuples = ", ".join(
        f"CAST({i} AS BIGINT), '{s}', n{i}, ROUND(n{i} / CAST(n1 AS DOUBLE), 4)"
        for i, s in enumerate(steps, 1)
    )
    return counts.selectExpr(
        f"stack({len(steps)}, {tuples}) AS (step_idx, step, n_users, conversion)"
    )


def cohort_retention(
    orders: DataFrame,
    *,
    customer_col: str = "o_custkey",
    date_col: str = "o_orderdate",
) -> DataFrame:
    """Monthly cohort retention: customers are cohorted by first-order
    month; each (cohort, months-since-first) cell counts the distinct
    customers who ordered that many months later, with retention as a
    fraction of the cohort's month-0 size.

    Returns (cohort_month 'YYYY-MM', months_since, n_active, cohort_size,
    retention_pct)."""
    ym = (F.year(date_col) * 12 + F.month(date_col) - 1).alias("_ym")
    w = Window.partitionBy("customer_id")
    base = (
        orders.select(F.col(customer_col).alias("customer_id"), ym)
        .withColumn("_cohort", F.min("_ym").over(w))
    )
    grid = base.groupBy("_cohort", (F.col("_ym") - F.col("_cohort")).alias("months_since")).agg(
        F.count_distinct("customer_id").alias("n_active")
    )
    # month-0 size per cohort: a window over the tiny post-agg grid
    w_c = Window.partitionBy("_cohort")
    return (
        grid.withColumn(
            "cohort_size",
            F.max(F.when(F.col("months_since") == 0, F.col("n_active"))).over(w_c),
        )
        .select(
            F.concat_ws(
                "-",
                F.floor(F.col("_cohort") / 12).cast("string"),
                F.lpad((F.pmod(F.col("_cohort"), F.lit(12)) + 1).cast("string"), 2, "0"),
            ).alias("cohort_month"),
            F.col("months_since").cast("long").alias("months_since"),
            "n_active",
            "cohort_size",
            F.round(F.col("n_active") / F.col("cohort_size"), 4).alias("retention_pct"),
        )
    )


def _quartile_score(value_col: str, cuts: tuple[str, str, str], higher_is_better: bool) -> Column:
    """1-4 score by comparing against three broadcast quartile cuts; strict
    inequalities, so boundary values take the lower score in both engines."""
    q25, q50, q75 = (F.col(c) for c in cuts)
    v = F.col(value_col)
    if higher_is_better:
        s = (v > q25).cast("int") + (v > q50).cast("int") + (v > q75).cast("int")
    else:
        s = (v < q75).cast("int") + (v < q50).cast("int") + (v < q25).cast("int")
    return (F.lit(1) + s).cast("long")


def rfm_scores(
    orders: DataFrame,
    *,
    customer_col: str = "o_custkey",
    date_col: str = "o_orderdate",
    amount_col: str = "o_totalprice",
) -> DataFrame:
    """RFM segmentation: per-customer recency (days since last order,
    relative to the dataset's max order date), frequency (order count) and
    monetary (total spend), each scored 1-4 against exact quartile cuts
    (recency inverted: most recent = 4).

    Returns (customer_id, recency_days, frequency, monetary, r_score,
    f_score, m_score, rfm_segment)."""
    day = F.to_date(date_col)
    per = orders.groupBy(F.col(customer_col).alias("customer_id")).agg(
        F.max(day).alias("_last_day"),
        F.count(F.lit(1)).alias("frequency"),
        F.round(F.sum(amount_col), 2).alias("monetary"),
    )
    asof = orders.agg(F.max(day).alias("_asof"))
    per = (
        per.crossJoin(F.broadcast(asof))
        .withColumn("recency_days", F.datediff("_asof", "_last_day").cast("long"))
        .drop("_asof", "_last_day")
    )
    cuts = per.agg(
        *[
            F.round(F.expr(f"percentile({c}, {q})"), 6).alias(f"{c}_q{int(q * 100)}")
            for c in ("recency_days", "frequency", "monetary")
            for q in (0.25, 0.5, 0.75)
        ]
    )
    scored = per.crossJoin(F.broadcast(cuts)).select(
        "customer_id",
        "recency_days",
        F.col("frequency").cast("long").alias("frequency"),
        "monetary",
        _quartile_score(
            "recency_days",
            ("recency_days_q25", "recency_days_q50", "recency_days_q75"),
            higher_is_better=False,
        ).alias("r_score"),
        _quartile_score(
            "frequency", ("frequency_q25", "frequency_q50", "frequency_q75"), True
        ).alias("f_score"),
        _quartile_score(
            "monetary", ("monetary_q25", "monetary_q50", "monetary_q75"), True
        ).alias("m_score"),
    )
    return scored.withColumn(
        "rfm_segment",
        F.concat(
            F.col("r_score").cast("string"),
            F.col("f_score").cast("string"),
            F.col("m_score").cast("string"),
        ),
    )


def user_value_trend_pandas(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-user OLS trend of daily total value, fitted per group through
    applyInPandas -- the grouped Arrow-batch path (each user's points arrive
    as one pandas frame), complementing the engine's mapInPandas (multimodal)
    and applyInPandasWithState (sessionize) exemplars.

    The math is the closed form (slope = covar_pop/var_pop), so DuckDB's
    native regr_slope/regr_intercept is an EXACT oracle; single-day users
    get null slope exactly like regr_slope's var=0 contract.

    Scale shape: the day-level pre-aggregation runs JVM-side FIRST (map-side
    combined), so each user group crossing into Python is O(active days),
    not O(events) -- the rule for every applyInPandas: reduce in the JVM,
    fit in Python. One hash(user) shuffle total."""
    import pandas as pd

    daily = events.groupBy(
        F.col(user_col).alias("user_id"),
        F.datediff(F.to_date(ts_col), F.lit("1970-01-01").cast("date")).alias("x"),
    ).agg(F.sum(value_col).alias("y"))

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf["x"].to_numpy("float64")
        y = pdf["y"].to_numpy("float64")
        mx, my = x.mean(), y.mean()
        var = ((x - mx) ** 2).mean()
        if len(x) < 2 or var == 0.0:
            slope, intercept = None, None
        else:
            slope = ((x - mx) * (y - my)).mean() / var
            intercept = my - slope * mx
        return pd.DataFrame(
            {
                "user_id": [int(pdf["user_id"].iloc[0])],
                "n_days": [len(x)],
                "slope": [None if slope is None else round(slope, 4)],
                "intercept": [None if intercept is None else round(intercept, 4)],
            }
        )

    return daily.groupBy("user_id").applyInPandas(
        fit, "user_id long, n_days long, slope double, intercept double"
    )


def target_encode(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    m: float = 10.0,
) -> DataFrame:
    """Mean target encoding for a categorical column -- the feature-
    engineering stage that replaces a category with its (smoothed) mean
    target, plus the LEAVE-ONE-OUT variant every row actually trains on
    (own target excluded, so the feature never leaks the row's label):

      encoded = (S_cat + m * global_mean) / (n_cat + m)      (smoothing
                prior m pulls rare categories toward the global mean)
      loo     = (S_cat - target) / (n_cat - 1)               (NULL for
                singleton categories -- no honest LOO value exists)

    Scale shape: one groupBy(cat) for (sum, count) -- category-cardinality
    output, broadcast back -- plus one scalar global agg; the row-level
    pass is map-only. Appends `te_encoded` / `te_loo` (4 dp) to the input
    columns."""
    stats = df.groupBy(cat_col).agg(
        F.sum(target_col).alias("_s"), F.count(target_col).alias("_n")
    )
    g = df.agg(F.avg(target_col)).collect()[0][0]
    return (
        df.join(F.broadcast(stats), cat_col)
        .withColumn(
            "te_encoded",
            F.round(
                (F.col("_s") + F.lit(m) * F.lit(float(g))) / (F.col("_n") + F.lit(m)),
                4,
            ),
        )
        .withColumn(
            "te_loo",
            F.when(
                F.col("_n") > 1,
                F.round((F.col("_s") - F.col(target_col)) / (F.col("_n") - 1), 4),
            ),
        )
        .drop("_s", "_n")
    )


def survival_km(
    orders: DataFrame,
    *,
    censor_days: int = 90,
    id_col: str = "o_custkey",
    date_col: str = "o_orderdate",
) -> DataFrame:
    """Kaplan-Meier survival estimator over customer lifetimes -- the
    standard churn/retention curve (Kaplan & Meier 1958), with right
    censoring done properly instead of the naive "average lifetime"
    that biases toward churned customers:

      lifetime  = days between a customer's first and last order
      event     = churned (last order > ``censor_days`` before the
                  corpus's last date); otherwise censored (still alive
                  at observation end -- contributes to risk sets but
                  never to the hazard)
      S(t)      = prod over event times t_i <= t of (1 - d_i / n_i),
                  d = events at t_i, n = customers with lifetime >= t_i

    Scale shape: one per-customer aggregate (first/last dates), then
    everything runs on the LIFETIME HISTOGRAM -- distinct-duration
    cardinality, bounded by the observation window in days, the same
    bounded-window justification as corpus_source_budget: the reverse
    cumulative sum for risk sets and the running ln-sum product for S(t)
    are windows over that small relation, never over customers. The
    censor horizon derives from the data's max date (computed in-plan,
    one 1-row broadcast join).

    Returns one row per EVENT time: (t_days, n_risk, n_events,
    survival) -- survival = exp(sum ln(1 - d/n)), rounded to 6 dp."""
    per_cust = orders.groupBy(id_col).agg(
        F.min(date_col).alias("_first"), F.max(date_col).alias("_last")
    )
    horizon = orders.agg(F.max(date_col).alias("_maxd"))
    life = per_cust.crossJoin(F.broadcast(horizon)).select(
        F.datediff("_last", "_first").cast("long").alias("t_days"),
        (
            F.datediff("_maxd", "_last") > censor_days
        ).cast("int").alias("_event"),
    )
    hist = life.groupBy("t_days").agg(
        F.count(F.lit(1)).alias("_n_at"),
        F.sum("_event").alias("n_events"),
    )
    w_risk = Window.orderBy(F.col("t_days").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_surv = Window.orderBy(F.col("t_days").asc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        hist.withColumn("n_risk", F.sum("_n_at").over(w_risk))
        .withColumn(
            "survival",
            # greatest(..., 1e-300): at the last event time d may equal n
            # (every remaining customer churns) and ln(0) is NULL in Spark
            # but an ERROR in DuckDB -- the same engine-divergence class as
            # the DSIR Gumbel edge (ADVICE r6); the floor keeps both
            # engines at survival 0.0 after rounding
            F.round(
                F.exp(
                    F.sum(
                        F.log(
                            F.greatest(
                                1.0 - F.col("n_events") / F.col("n_risk"),
                                F.lit(1e-300),
                            )
                        )
                    ).over(w_surv)
                ),
                6,
            ),
        )
        .filter(F.col("n_events") > 0)
        .select(
            "t_days",
            F.col("n_risk").cast("long").alias("n_risk"),
            F.col("n_events").cast("long").alias("n_events"),
            "survival",
        )
    )


def survival_logrank(
    orders: DataFrame,
    groups: DataFrame,
    *,
    censor_days: int = 90,
    id_col: str = "o_custkey",
    date_col: str = "o_orderdate",
    flag_col: str = "is_g1",
) -> DataFrame:
    """Log-rank test (Mantel 1966) between two survival groups -- "do
    these segments churn at the same rate", the hypothesis test that
    belongs next to the Kaplan-Meier curve. ``groups`` maps ``id_col`` to
    a boolean ``flag_col`` (group 1 = true; dimension-sized, broadcast).
    At each event time t: observed group-1 events O1, expected
    E1 = d * n1/n under the null, hypergeometric variance
    V = d*(n1/n)*(1-n1/n)*(n-d)/(n-1); the statistic
    (sum(O1-E1))^2 / sum(V) ~ chi2(1).

    Same scale shape as survival_km: per-customer aggregate, then every
    sum runs over the bounded lifetime histogram (per-group reverse
    cumulative risk windows). Closed-form deterministic arithmetic ==
    exact dual-engine oracle. Returns ONE row: (n_events_total, chi2,
    reject_at_05) with chi2 rounded to 6 dp (critical value 3.841)."""
    per_cust = orders.groupBy(id_col).agg(
        F.min(date_col).alias("_first"), F.max(date_col).alias("_last")
    )
    horizon = orders.agg(F.max(date_col).alias("_maxd"))
    life = (
        per_cust.crossJoin(F.broadcast(horizon))
        .join(F.broadcast(groups.select(id_col, flag_col)), id_col, "left")
        .select(
            F.col(id_col),
            F.datediff("_last", "_first").cast("long").alias("t_days"),
            (F.datediff("_maxd", "_last") > censor_days)
            .cast("int")
            .alias("_ev"),
            F.coalesce(F.col(flag_col).cast("int"), F.lit(0)).alias("_g1"),
        )
    )
    hist = life.groupBy("t_days").agg(
        F.count(F.lit(1)).alias("_n_at"),
        F.sum("_g1").alias("_n1_at"),
        F.sum("_ev").alias("d"),
        F.sum(F.col("_ev") * F.col("_g1")).alias("o1"),
    )
    w_risk = Window.orderBy(F.col("t_days").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    terms = (
        hist.withColumn("n", F.sum("_n_at").over(w_risk))
        .withColumn("n1", F.sum("_n1_at").over(w_risk))
        .filter(F.col("d") > 0)
        .select(
            "d",
            "o1",
            (F.col("d") * F.col("n1") / F.col("n")).alias("e1"),
            F.when(
                F.col("n") > 1,
                (
                    F.col("d")
                    * (F.col("n1") / F.col("n"))
                    * (1 - F.col("n1") / F.col("n"))
                    * (F.col("n") - F.col("d"))
                    / (F.col("n") - 1)
                ),
            ).otherwise(F.lit(0.0)).alias("v"),
        )
    )
    agg = terms.agg(
        F.sum("d").alias("n_events_total"),
        F.sum(F.col("o1") - F.col("e1")).alias("_oe"),
        F.sum("v").alias("_v"),
    )
    return agg.select(
        F.col("n_events_total").cast("long").alias("n_events_total"),
        F.round(
            (F.col("_oe") * F.col("_oe"))
            / F.greatest(F.col("_v"), F.lit(1e-12)),
            6,
        ).alias("chi2"),
        (
            (F.col("_oe") * F.col("_oe"))
            / F.greatest(F.col("_v"), F.lit(1e-12))
            > 3.841
        ).alias("reject_at_05"),
    )


def roc_auc(
    scored: DataFrame,
    *,
    score_col: str = "score",
    label_col: str = "label",
) -> DataFrame:
    """Exact ROC-AUC of a score against a boolean label via the
    Mann-Whitney rank-sum identity (AUC = P(score+ > score-) with ties
    counted half), plus the tie-corrected normal z statistic -- the
    quality-filter evaluation every curation pipeline runs before
    trusting a cheap scorer: does the model rank rule-passing documents
    above failing ones?

      avg_rank   = min_rank + (ties - 1) / 2   (ascending score)
      U          = sum_{positives} avg_rank - n_pos (n_pos + 1) / 2
      AUC        = U / (n_pos * n_neg)
      sigma_U    = sqrt(n_pos n_neg / 12 * ((N + 1)
                   - sum_t (t^3 - t) / (N (N - 1))))   (tie correction)
      z          = (U - n_pos n_neg / 2) / sigma_U

    Scale shape: one global rank over scores. A single total ordering is
    the textbook 100 TB bottleneck, so the rank is computed as a
    per-score-value aggregate first (scores are heavily tied model
    outputs: the distinct-value table is classifier-resolution-bounded,
    not corpus-bounded) -- min_rank(v) = 1 + running count of rows below
    v via a window over the VALUE table, then broadcast-joined back.
    Everything is closed-form arithmetic: the oracle recomputes AUC and
    z exactly. Returns one row (n_pos, n_neg, auc, u, z, significant)."""
    rows = scored.select(
        F.col(score_col).alias("s"), F.col(label_col).cast("int").alias("y")
    )
    # per-distinct-score tie groups: (value, n rows, n positives)
    vals = rows.groupBy("s").agg(
        F.count(F.lit(1)).alias("t"), F.sum("y").alias("tp")
    )
    w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    ranked = vals.select(
        "s",
        "t",
        "tp",
        (F.coalesce(F.sum("t").over(w), F.lit(0)) + 1).alias("min_rank"),
    ).withColumn("avg_rank", F.col("min_rank") + (F.col("t") - 1) / 2.0)
    agg = ranked.agg(
        F.sum(F.col("tp") * F.col("avg_rank")).alias("rank_sum_pos"),
        F.sum("tp").alias("n_pos"),
        F.sum(F.col("t") - F.col("tp")).alias("n_neg"),
        F.sum("t").alias("n"),
        F.sum(F.pow(F.col("t"), 3) - F.col("t")).alias("tie_term"),
    )
    n1 = F.col("n_pos")
    n0 = F.col("n_neg")
    n = F.col("n")
    u = F.col("rank_sum_pos") - n1 * (n1 + 1) / 2.0
    sigma = F.sqrt(
        n1 * n0 / 12.0
        * ((n + 1) - F.col("tie_term") / (n * (n - 1)))
    )
    z = (u - n1 * n0 / 2.0) / F.greatest(sigma, F.lit(1e-300))
    return agg.select(
        n1.cast("long").alias("n_pos"),
        n0.cast("long").alias("n_neg"),
        F.round(u / (n1 * n0), 6).alias("auc"),
        F.round(u, 4).alias("u"),
        F.round(z, 6).alias("z"),
        (F.abs(z) > 1.96).alias("significant"),
    )


def cohen_kappa(
    rated: DataFrame,
    rater_a: str,
    rater_b: str,
) -> DataFrame:
    """Cohen's kappa between two boolean "raters" -- chance-corrected
    agreement (kappa = (po - pe) / (1 - pe)), the standard answer to
    "my rule filter and my model filter agree 85% -- is that good?"
    (85% raw agreement is meaningless when both raters pass ~everything;
    kappa subtracts exactly that). One aggregate over the joined
    decisions; closed-form, exact oracle. Returns one row
    (n_docs, po, pe, kappa)."""
    a = F.col(rater_a).cast("int")
    b = F.col(rater_b).cast("int")
    agg = rated.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg((a == b).cast("int")).alias("po"),
        F.avg(a).alias("pa"),
        F.avg(b).alias("pb"),
    )
    pe = F.col("pa") * F.col("pb") + (1 - F.col("pa")) * (1 - F.col("pb"))
    return agg.select(
        F.col("n").alias("n_docs"),
        F.round("po", 6).alias("po"),
        F.round(pe, 6).alias("pe"),
        F.round((F.col("po") - pe) / (1 - pe), 6).alias("kappa"),
    )


def calibration_bins(
    scored: DataFrame,
    *,
    score_col: str = "score",
    label_col: str = "label",
    n_bins: int = 10,
) -> DataFrame:
    """Calibration table of a probabilistic score against outcomes: per
    equal-width score bin, the mean predicted probability vs the observed
    positive rate, plus the bin's Brier contribution -- the reliability
    diagram as data (a curation team reads this before using a quality
    score as a sampling WEIGHT rather than a threshold; an uncalibrated
    score ruins weighted mixing even when its AUC is high).

    Bin edges are halves-open [i/n, (i+1)/n) with the top edge closed
    (score 1.0 joins the last bin). One groupBy over bin index -- map-side
    combined, n_bins rows out; exact oracle. Returns (bin, lo, n_docs,
    mean_score, frac_pos, brier)."""
    b = F.least(
        F.floor(F.col(score_col) * n_bins).cast("long"), F.lit(n_bins - 1)
    )
    y = F.col(label_col).cast("int")
    return (
        scored.groupBy(b.alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg(score_col), 6).alias("mean_score"),
            F.round(F.avg(y), 6).alias("frac_pos"),
            F.round(
                F.avg(F.pow(F.col(score_col) - y, 2)), 6
            ).alias("brier"),
        )
        .select(
            "bin",
            F.round(F.col("bin") / n_bins, 2).alias("lo"),
            "n_docs",
            "mean_score",
            "frac_pos",
            "brier",
        )
    )


def _phi_upper_2sided(z: Column) -> Column:
    """Two-sided normal p-value 2 * (1 - Phi(|z|)) via the Zelen & Severo
    polynomial (Abramowitz & Stegun 26.2.17, |err| < 7.5e-8) -- the same
    elementary exp/polynomial arithmetic in Spark and DuckDB, so p-values
    are engine-identical without a special function."""
    x = F.abs(z)
    t = 1.0 / (1.0 + 0.2316419 * x)
    poly = (
        0.319381530 * t
        - 0.356563782 * F.pow(t, 2)
        + 1.781477937 * F.pow(t, 3)
        - 1.821255978 * F.pow(t, 4)
        + 1.330274429 * F.pow(t, 5)
    )
    pdf = F.exp(-x * x / 2.0) / 2.5066282746310002  # sqrt(2*pi)
    return 2.0 * pdf * poly


def ab_tests_fdr(
    events: DataFrame,
    *,
    q_level: float = 0.10,
    value_threshold: float = 150.0,
    user_col: str = "user_id",
    type_col: str = "event_type",
    value_col: str = "value",
    salt: str = "abtest",
) -> DataFrame:
    """The multiple-comparisons A/B readout: one two-proportion z-test per
    event type (metric: user had an event of that type with value >
    ``value_threshold``; variant: md5 user bucket), p-values via the
    normal polynomial, then Benjamini-Hochberg FDR correction across the
    m tests -- q_i = min_{j >= i} p_(j) * m / j, discovery iff q <=
    ``q_level``. Running m uncorrected tests at alpha = 0.05 "discovers"
    ~m/20 false effects on pure A/A splits; BH is the standard fix, and
    on this corpus's deterministic null split the correct readout IS
    zero discoveries.

    Scale shape: one (type, user) agg over events, one m-row test table,
    two m-row windows for the BH running min -- everything after the
    first agg is test-count-bounded. Exact oracle (closed-form z, the
    same A&S polynomial, the same running min). Returns per type:
    (event_type, n1, x1, n0, x0, z, p_value, p_rank, q_value,
    discovery)."""
    from .sampling import SAMPLE_MOD, sample_hash

    per_user = (
        events.groupBy(type_col, user_col)
        .agg(
            F.max((F.col(value_col) > value_threshold).cast("int")).alias(
                "converted"
            )
        )
        .withColumn(
            "variant",
            (sample_hash(F.col(user_col), salt) < SAMPLE_MOD // 2).cast("int"),
        )
    )
    g = per_user.groupBy(type_col).agg(
        F.sum("variant").alias("n1"),
        F.sum(F.col("variant") * F.col("converted")).alias("x1"),
        F.sum(1 - F.col("variant")).alias("n0"),
        F.sum((1 - F.col("variant")) * F.col("converted")).alias("x0"),
    )
    p1 = F.col("x1") / F.col("n1")
    p0 = F.col("x0") / F.col("n0")
    pp = (F.col("x1") + F.col("x0")) / (F.col("n1") + F.col("n0"))
    se = F.sqrt(
        F.greatest(
            pp * (1 - pp) * (1.0 / F.col("n1") + 1.0 / F.col("n0")),
            F.lit(1e-300),
        )
    )
    tests = g.withColumn("z", F.round((p1 - p0) / se, 6)).withColumn(
        "p_value", F.round(_phi_upper_2sided(F.col("z")), 6)
    )
    m = F.count(F.lit(1)).over(Window.partitionBy())
    rk = F.row_number().over(
        Window.orderBy(F.col("p_value").asc(), F.col(type_col).asc())
    )
    stepped = tests.withColumn("m", m).withColumn("p_rank", rk).withColumn(
        "bh_step", F.col("p_value") * F.col("m") / F.col("p_rank")
    )
    wmin = Window.orderBy(F.col("p_rank").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        stepped.withColumn(
            "q_value", F.round(F.least(F.min("bh_step").over(wmin), F.lit(1.0)), 6)
        )
        .withColumn("discovery", F.col("q_value") <= q_level)
        .select(
            type_col,
            "n1",
            "x1",
            "n0",
            "x0",
            "z",
            "p_value",
            F.col("p_rank").cast("long").alias("p_rank"),
            "q_value",
            "discovery",
        )
    )


def ab_ztest_readout(
    per_user: DataFrame,
    *,
    user_col: str = "user_id",
    converted_col: str = "converted",
    salt: str = "abtest",
) -> DataFrame:
    """The two-proportion z-test readout over a per-user conversion frame
    (user, converted 0/1): md5 variant bucketing, pooled-variance z,
    two-sided rejection at 1.96 -- extracted so the batch A/B query and
    the streaming monitor (stream_events_ab, which accumulates the same
    per-user sufficient statistics across micro-batches) share the math
    term for term and therefore one exact oracle."""
    from .sampling import SAMPLE_MOD, sample_hash

    g = (
        per_user.withColumn(
            "variant",
            (sample_hash(F.col(user_col), salt) < SAMPLE_MOD // 2).cast("int"),
        )
        .groupBy("variant")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(converted_col).alias("x"),
        )
    )
    a = g.filter(F.col("variant") == 1).select(
        F.col("n").alias("n1"), F.col("x").alias("x1")
    )
    b = g.filter(F.col("variant") == 0).select(
        F.col("n").alias("n0"), F.col("x").alias("x0")
    )
    j = a.crossJoin(b)
    p1 = F.col("x1") / F.col("n1")
    p0 = F.col("x0") / F.col("n0")
    pp = (F.col("x1") + F.col("x0")) / (F.col("n1") + F.col("n0"))
    se = F.sqrt(
        F.greatest(
            pp * (1 - pp) * (1.0 / F.col("n1") + 1.0 / F.col("n0")),
            F.lit(1e-300),
        )
    )
    z = (p1 - p0) / se
    return j.select(
        F.col("n1").cast("long").alias("n_treat"),
        F.col("n0").cast("long").alias("n_control"),
        F.round(p1, 6).alias("cr_treat"),
        F.round(p0, 6).alias("cr_control"),
        F.round(z, 6).alias("z"),
        (F.abs(z) > 1.96).alias("reject_at_05"),
    )


def ab_sprt_monitor(
    events: DataFrame,
    configs: list[tuple[str, float, float]] | None = None,
    *,
    alpha: float = 0.05,
    beta: float = 0.05,
    n_waves: int = 3,
    user_col: str = "user_id",
    value_threshold: float = 150.0,
) -> DataFrame:
    """Wald's Sequential Probability Ratio Test over the experiment
    stream (Wald 1945) -- the early-stopping monitor a fixed-horizon
    z-test can't be: after each arrival WAVE, the cumulative Bernoulli
    log-likelihood ratio  x*ln(p1/p0) + (n-x)*ln((1-p1)/(1-p0))  is
    checked against ln((1-beta)/alpha) / ln(beta/(1-alpha)); crossing
    up accepts H1 (ship it), crossing down accepts H0 (stop the test),
    otherwise continue -- with guaranteed error rates at the two simple
    hypotheses regardless of when you stop.

    Each ``configs`` entry is (name, p0, p1); running several shows the
    three regimes honestly (truth near p1 -> early accept_h1, truth
    between -> continue, truth near p0 -> accept_h0). Observations are
    per-user conversion flags (the events_ab_test conversion), arrival
    waves are user_id % n_waves -- a deterministic stand-in for
    checkpoint times, so the trajectory is exact-oracle-able.

    Scale shape: one per-user MAX agg, one n_waves-row cumulative
    window, a bounded (configs x waves) cross join -- no corpus total
    order (a per-EVENT trajectory would be a single-task sort; wave
    checkpoints are the scale-honest granularity).

    Returns (test, wave, n_cum, x_cum, llr, upper, lower, decision)."""
    if configs is None:
        configs = [
            ("h1_wins", 0.30, 0.45),
            ("inconclusive", 0.40, 0.50),
            ("h0_wins", 0.45, 0.60),
        ]
    from pyspark.sql.window import Window

    per_user = events.groupBy(user_col).agg(
        F.max(
            (
                (F.col("event_type") == "purchase")
                & (F.col("value") > value_threshold)
            ).cast("int")
        ).alias("converted")
    )
    waves = (
        per_user.withColumn("wave", F.pmod(F.col(user_col), F.lit(n_waves)))
        .groupBy("wave")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("converted").alias("x"),
        )
    )
    wc = Window.orderBy("wave").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = waves.select(
        "wave",
        F.sum("n").over(wc).alias("n_cum"),
        F.sum("x").over(wc).alias("x_cum"),
    )
    spark = events.sparkSession
    from ._local import arrow_local_frame

    cfg = arrow_local_frame(
        spark,
        [(name, float(p0), float(p1)) for name, p0, p1 in configs],
        "test string, p0 double, p1 double",
    )
    j = cfg.crossJoin(cum)
    llr = F.round(
        F.col("x_cum") * F.log(F.col("p1") / F.col("p0"))
        + (F.col("n_cum") - F.col("x_cum"))
        * F.log((1.0 - F.col("p1")) / (1.0 - F.col("p0"))),
        6,
    )
    upper = F.round(F.log(F.lit((1.0 - beta) / alpha)), 6)
    lower = F.round(F.log(F.lit(beta / (1.0 - alpha))), 6)
    return j.select(
        "test",
        "wave",
        "n_cum",
        "x_cum",
        llr.alias("llr"),
        upper.alias("upper"),
        lower.alias("lower"),
        F.when(llr >= upper, "accept_h1")
        .when(llr <= lower, "accept_h0")
        .otherwise("continue")
        .alias("decision"),
    )

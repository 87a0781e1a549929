"""Data-quality audit operators: expectation checks over the lake (null
rates, key uniqueness, referential integrity, value ranges) and a per-column
table profiler -- the dbt-test / Deequ layer a production lake runs after
every load. The reference ships no checks at all (its Glue jobs assume the
crawler's schema is the truth); a 100 TB pipeline cannot.

Scale design
------------
- All single-table checks (nulls, ranges) for one table collapse into ONE
  full scan: a single agg of conditional sums, never one job per check.
- Uniqueness = groupBy(key).count > 1, aggregated to a count -- one shuffle
  on the key being tested, the same cost as the dedup it would gate.
- Referential integrity = left-anti join aggregated to an orphan count; dim
  sides broadcast, fact-to-fact (lineitem->orders) shuffles on the key once.
- Output is a tiny uniform report frame (one row per check), so a DAG can
  gate downstream tiers on `passed` with a driver-side collect of ~10 rows.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

REPORT_COLS = ("check_id", "table_name", "n_rows", "n_violations", "passed")


@dataclass(frozen=True)
class RowCheck:
    """A per-row predicate expectation: rows where ``violation`` is true
    count against the check."""

    check_id: str
    violation: Column


def _report(check_id: str, table: str, n_rows: Column, n_viol: Column) -> list[Column]:
    return [
        F.lit(check_id).alias("check_id"),
        F.lit(table).alias("table_name"),
        n_rows.cast("long").alias("n_rows"),
        n_viol.cast("long").alias("n_violations"),
        (n_viol == 0).alias("passed"),
    ]


def row_checks(df: DataFrame, table: str, checks: list[RowCheck]) -> DataFrame:
    """Run every per-row check in ONE scan of ``df``: a single agg of
    conditional sums (count rows where the violation predicate holds).
    Returns one report row per check.

    r14: the report rows come from ONE explode over the single agg row --
    the previous union of k projections re-executed the full scan-agg once
    per check (the audited plan carried k duplicate scans per table), which
    contradicted this docstring's own "ONE scan" claim."""
    agg = df.agg(
        F.count(F.lit(1)).alias("_n"),
        *[
            F.sum(c.violation.cast("long")).alias(f"_v{i}")
            for i, c in enumerate(checks)
        ],
    )
    viol = [F.coalesce(F.col(f"_v{i}"), F.lit(0)) for i in range(len(checks))]
    report_structs = F.array(
        *[
            F.struct(
                F.lit(c.check_id).alias("check_id"),
                F.lit(table).alias("table_name"),
                F.col("_n").cast("long").alias("n_rows"),
                v.cast("long").alias("n_violations"),
                (v == 0).alias("passed"),
            )
            for c, v in zip(checks, viol)
        ]
    )
    return agg.select(F.explode(report_structs).alias("_r")).select("_r.*")


def unique_check(df: DataFrame, table: str, key_cols: list[str], check_id: str) -> DataFrame:
    """Key-uniqueness expectation: n_violations = number of rows carrying a
    duplicated key (total rows in over-represented groups minus the groups
    themselves), so a clean table reports 0."""
    per_key = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("_c"))
    agg = per_key.agg(
        F.coalesce(F.sum("_c"), F.lit(0)).alias("_n"),
        F.coalesce(F.sum(F.when(F.col("_c") > 1, F.col("_c") - 1)), F.lit(0)).alias("_v"),
    )
    return agg.select(*_report(check_id, table, F.col("_n"), F.col("_v")))


def fk_check(
    child: DataFrame,
    parent: DataFrame,
    *,
    child_table: str,
    child_key: str,
    parent_key: str,
    check_id: str,
    broadcast_parent: bool = True,
) -> DataFrame:
    """Referential-integrity expectation: child rows (with a non-null key)
    whose key has no parent row. Anti-join against the DISTINCT parent keys;
    dim parents broadcast, fact parents shuffle once on the key."""
    keys = parent.select(F.col(parent_key).alias("_pk")).distinct()
    if broadcast_parent:
        keys = F.broadcast(keys)
    nonnull = child.filter(F.col(child_key).isNotNull())
    # ONE pass (r14): a left join against the DISTINCT parent keys preserves
    # the child row count exactly, so total rows and orphan rows (null _pk)
    # come out of the same agg -- the old anti-join + separate count scanned
    # the child twice per check
    joined = nonnull.join(keys, nonnull[child_key] == keys["_pk"], "left")
    agg = joined.agg(
        F.count(F.lit(1)).alias("_n"),
        F.coalesce(F.sum(F.col("_pk").isNull().cast("long")), F.lit(0)).alias("_v"),
    )
    return agg.select(*_report(check_id, child_table, F.col("_n"), F.col("_v")))


def star_schema_audit(tables: dict[str, DataFrame]) -> DataFrame:
    """The full expectation suite for the testdata star schema: null keys,
    value ranges, primary-key uniqueness, and every foreign-key edge.
    Returns the unioned report frame, one row per check."""
    li, orders = tables["lineitem"], tables["orders"]
    customer, part, supplier = tables["customer"], tables["part"], tables["supplier"]
    nation, region = tables["nation"], tables["region"]

    parts: list[DataFrame] = [
        row_checks(
            li,
            "lineitem",
            [
                RowCheck("lineitem.l_orderkey.not_null", F.col("l_orderkey").isNull()),
                RowCheck("lineitem.l_quantity.positive", ~(F.col("l_quantity") > 0)),
                RowCheck(
                    "lineitem.l_extendedprice.non_negative",
                    ~(F.col("l_extendedprice") >= 0),
                ),
                RowCheck(
                    "lineitem.l_discount.in_unit_interval",
                    ~F.col("l_discount").between(0.0, 1.0),
                ),
                RowCheck(
                    "lineitem.l_returnflag.in_domain",
                    ~F.col("l_returnflag").isin("A", "N", "R"),
                ),
            ],
        ),
        row_checks(
            orders,
            "orders",
            [
                RowCheck("orders.o_custkey.not_null", F.col("o_custkey").isNull()),
                RowCheck("orders.o_totalprice.positive", ~(F.col("o_totalprice") > 0)),
                RowCheck("orders.o_orderdate.not_null", F.col("o_orderdate").isNull()),
            ],
        ),
        unique_check(customer, "customer", ["c_custkey"], "customer.c_custkey.unique"),
        unique_check(orders, "orders", ["o_orderkey"], "orders.o_orderkey.unique"),
        unique_check(
            li, "lineitem", ["l_orderkey", "l_linenumber"], "lineitem.pk.unique"
        ),
        unique_check(part, "part", ["p_partkey"], "part.p_partkey.unique"),
        unique_check(supplier, "supplier", ["s_suppkey"], "supplier.s_suppkey.unique"),
        fk_check(
            li,
            orders,
            child_table="lineitem",
            child_key="l_orderkey",
            parent_key="o_orderkey",
            check_id="lineitem.l_orderkey.fk_orders",
            broadcast_parent=False,  # fact-to-fact: shuffle join on the key
        ),
        fk_check(
            li,
            part,
            child_table="lineitem",
            child_key="l_partkey",
            parent_key="p_partkey",
            check_id="lineitem.l_partkey.fk_part",
        ),
        fk_check(
            li,
            supplier,
            child_table="lineitem",
            child_key="l_suppkey",
            parent_key="s_suppkey",
            check_id="lineitem.l_suppkey.fk_supplier",
        ),
        fk_check(
            orders,
            customer,
            child_table="orders",
            child_key="o_custkey",
            parent_key="c_custkey",
            check_id="orders.o_custkey.fk_customer",
        ),
        fk_check(
            customer,
            nation,
            child_table="customer",
            child_key="c_nationkey",
            parent_key="n_nationkey",
            check_id="customer.c_nationkey.fk_nation",
        ),
        fk_check(
            nation,
            region,
            child_table="nation",
            child_key="n_regionkey",
            parent_key="r_regionkey",
            check_id="nation.n_regionkey.fk_region",
        ),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def profile_table(df: DataFrame, table: str) -> DataFrame:
    """Per-column profile: row count, null count, exact distinct count, and
    string-rendered min/max -- one report row per column.

    Scale note: exact multi-column distinct counts make Spark expand the
    input k ways (one shuffle per distinct column under the hood). That is
    the honest exact form and the ORACLE-comparable one; at real scale swap
    `count_distinct` for `approx_count_distinct` and the plan collapses to
    one pass (the same exact/approx twin trade as the HLL counterpart of
    customer_base_stats)."""
    cols = df.columns
    agg = df.agg(
        F.count(F.lit(1)).alias("_n"),
        *[F.sum(F.col(c).isNull().cast("long")).alias(f"_null_{c}") for c in cols],
        *[F.count_distinct(F.col(c)).alias(f"_nd_{c}") for c in cols],
        *[F.min(F.col(c).cast("string")).alias(f"_min_{c}") for c in cols],
        *[F.max(F.col(c).cast("string")).alias(f"_max_{c}") for c in cols],
    )
    rows = [
        agg.select(
            F.lit(table).alias("table_name"),
            F.lit(c).alias("column_name"),
            F.col("_n").cast("long").alias("n_rows"),
            F.coalesce(F.col(f"_null_{c}"), F.lit(0)).cast("long").alias("n_nulls"),
            F.col(f"_nd_{c}").cast("long").alias("n_distinct"),
            F.col(f"_min_{c}").alias("min_value"),
            F.col(f"_max_{c}").alias("max_value"),
        )
        for c in cols
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


def key_skew_profile(df: DataFrame, table: str, key: str) -> DataFrame:
    """Join/partition-key skew diagnostic: per-key cardinality statistics
    condensed to ONE row -- the audit run before choosing a shuffle key at
    scale (a skew_ratio in the hundreds means salting / AQE skew-join
    territory; ~1 means the key partitions evenly).

    Two-level shape: the per-key count agg is map-side combined on the key,
    then the stats agg reduces the KEY-cardinality frame to one row --
    nothing wider than the distinct-key count ever shuffles. Ties in the
    top-key argmax break to the smallest key string for engine stability."""
    counts = (
        df.select(F.col(key).cast("string").alias("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return counts.agg(
        F.lit(table).alias("table_name"),
        F.lit(key).alias("key_column"),
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum("c").cast("long").alias("n_rows"),
        F.max("c").cast("long").alias("max_key_rows"),
        F.round(F.avg("c"), 4).alias("avg_key_rows"),
        F.round(F.max("c") / F.avg("c"), 4).alias("skew_ratio"),
        # composite (count desc, key asc) argmin as a fixed-width string key
        # (the same portable trick as events_ohlc; DuckDB arg_min needs a
        # flat orderable type)
        F.min_by(
            "k",
            F.concat_ws(
                "#",
                F.lpad((F.lit(10**12) - F.col("c")).cast("string"), 13, "0"),
                F.col("k"),
            ),
        ).alias("top_key"),
    )


def psi_drift(
    df: DataFrame,
    *,
    group_col: str = "source",
    reference: str,
    value_col: str = "n_chars",
    bucket_width: int = 256,
    n_buckets: int = 16,
    alert_threshold: float = 0.2,
) -> DataFrame:
    """Population Stability Index per group against a reference group --
    the standard "did this slice's distribution move" monitor (PSI > 0.2
    is the conventional re-examine threshold) run before admitting a new
    crawl batch / source into a training mix.

    PSI(g) = sum over buckets of (p_g - p_ref) * ln(p_g / p_ref), with
    FIXED-width value buckets (floor(value / width), capped at
    n_buckets-1) so binning is deterministic and engine-portable -- no
    quantile sketch in the definition of the metric itself -- and add-one
    smoothing so empty buckets stay finite.

    Scale shape: one groupBy(group, bucket) count (map-side combined,
    output bounded by groups x n_buckets), the reference's bucket
    distribution broadcast back, one groups-cardinality aggregate. The
    corpus is scanned once."""
    bucket = F.least(
        F.floor(F.col(value_col) / bucket_width), F.lit(n_buckets - 1)
    ).alias("bucket")
    from ._cache import tracked_persist

    # persist the bucket counts (r14, guide §1.2): bounded at groups x
    # n_buckets rows, but consumed twice (group derivation + densify join)
    # -- unpersisted, the corpus scan-agg ran once per consumer
    counts = tracked_persist(
        df.select(F.col(group_col).alias("grp"), bucket).groupBy(
            "grp", "bucket"
        ).agg(F.count(F.lit(1)).alias("n"))
    )
    # densify to ALL n_buckets per group so smoothing covers empty buckets
    grps = counts.select("grp").distinct()
    grid = grps.crossJoin(
        F.broadcast(
            df.sparkSession.range(n_buckets).select(
                F.col("id").alias("bucket")
            )
        )
    )
    dense = grid.join(counts, ["grp", "bucket"], "left").select(
        "grp", "bucket", F.coalesce("n", F.lit(0)).alias("n")
    )
    totals = dense.groupBy("grp").agg(F.sum("n").alias("tot"))
    dist = dense.join(F.broadcast(totals), "grp").select(
        "grp",
        "bucket",
        ((F.col("n") + 1) / (F.col("tot") + n_buckets)).alias("p"),
    )
    ref = dist.filter(F.col("grp") == reference).select(
        "bucket", F.col("p").alias("p_ref")
    )
    return (
        dist.filter(F.col("grp") != reference)
        .join(F.broadcast(ref), "bucket")
        .groupBy(F.col("grp").alias(group_col))
        .agg(
            F.round(
                F.sum(
                    (F.col("p") - F.col("p_ref"))
                    * (F.log("p") - F.log("p_ref"))
                ),
                6,
            ).alias("psi")
        )
        .withColumn("drifted", F.col("psi") > alert_threshold)
    )


def dp_noisy_counts(
    df: DataFrame,
    group_col: str,
    *,
    epsilon: float = 1.0,
    salt: str = "dplap",
) -> DataFrame:
    """Differentially-private release of per-group counts via the Laplace
    mechanism (Dwork et al. 2006): noisy = count + Lap(1/epsilon), the
    shape every aggregate-release pipeline needs before publishing
    per-segment statistics (sensitivity of a count under add/remove-one
    is 1, so scale b = 1/epsilon gives epsilon-DP).

    The Laplace draw is DETERMINISTIC here -- inverse-CDF applied to the
    md5 uniform u in (0,1): noise = -b * sign(u - 0.5) * ln(1 - 2|u -
    0.5|) -- which makes the row testable and oracle-exact. A production
    release MUST swap the md5 draw for a real RNG (a per-group
    deterministic draw is NOT private: re-running reveals the noise);
    the plan shape -- one map-side-combined count agg, noise applied to
    the group-bounded result -- is identical either way, which is what
    this operator pins. Returns (group, n_true, noise_b, n_noisy) --
    n_true rides along for the test/oracle; a real release publishes
    only n_noisy."""
    b = 1.0 / float(epsilon)
    counts = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.count(F.lit(1)).alias("n_true")
    )
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt + ":"), F.col("grp").cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    u = (F.pmod(h, F.lit(1_000_000)) + 0.5) / 1_000_000.0
    d = u - 0.5
    noise = -b * F.signum(d) * F.log(1.0 - 2.0 * F.abs(d))
    return counts.select(
        F.col("grp").alias(group_col),
        "n_true",
        F.lit(round(b, 6)).alias("noise_b"),
        F.round(F.col("n_true") + noise, 4).alias("n_noisy"),
    )


def conformal_threshold(
    scored: DataFrame,
    *,
    score_col: str = "score",
    label_col: str = "label",
    alpha: float = 0.1,
    calib_frac: float = 0.5,
    id_col: str = "doc_id",
    salt: str = "conformal",
) -> DataFrame:
    """Split conformal prediction for a binary quality screen: on a
    deterministic md5 calibration split, take the finite-sample-corrected
    quantile of the POSITIVE docs' nonconformity scores (1 - score), so
    that "accept if score >= 1 - q_hat" covers at least (1 - alpha) of
    true positives on exchangeable data (Vovk et al.; the modern
    distribution-free guarantee every ML-filter deployment should state
    instead of a hand-picked threshold).

      q_hat = the ceil((n_cal + 1) (1 - alpha)) / n_cal empirical
              quantile of calibration nonconformity (exact order
              statistic, rank = ceil((n_cal + 1) (1 - alpha)))

    Scale shape: one filter + one global sort of the CALIBRATION
    POSITIVES only (split-bounded; use approx_percentile past ~1e8
    calibration rows -- the knob is one expression), then a broadcast
    scalar threshold evaluated over the held-out half. Exact oracle:
    order statistics and coverage counts are closed-form. Returns one
    row (n_cal, rank, q_hat, threshold, n_eval_pos, n_covered,
    coverage, coverage_ok)."""
    import math

    from ._cache import tracked_persist
    from .sampling import SAMPLE_MOD, sample_hash

    is_cal = sample_hash(F.col(id_col), salt) < int(calib_frac * SAMPLE_MOD)
    # persist the positives (r14, guide §1.2/§5): narrow (id, nonconf)
    # rows, but consumed by THREE actions (n_cal count, the order-statistic
    # collect, the coverage agg) -- unpersisted, each action re-ran the
    # caller's whole scoring pipeline over the corpus
    pos = tracked_persist(
        scored.filter(F.col(label_col).cast("int") == 1).select(
            F.col(id_col), (1.0 - F.col(score_col)).alias("nonconf")
        )
    )
    cal = pos.filter(is_cal)
    n_cal = cal.count()  # bounded scalar: sets the order-statistic rank
    if n_cal == 0:
        raise ValueError(
            "conformal_threshold: calibration split contains zero positive "
            f"documents (calib_frac={calib_frac}, salt={salt!r}) -- the "
            "quantile q_hat is undefined; raise calib_frac or check the "
            f"{label_col!r} labels"
        )
    rank = min(max(int(math.ceil((n_cal + 1) * (1.0 - alpha))), 1), n_cal)
    q_hat = (
        cal.orderBy(F.col("nonconf").asc(), F.col(id_col).asc())
        .limit(rank)
        .agg(F.round(F.max("nonconf"), 6).alias("q"))
        .collect()[0][0]
    )
    ev = pos.filter(~is_cal).agg(
        F.count(F.lit(1)).alias("n_eval_pos"),
        F.sum(
            (F.round(F.col("nonconf"), 6) <= q_hat).cast("int")
        ).alias("n_covered"),
    )
    spark = scored.sparkSession
    from ._local import arrow_local_frame

    meta = arrow_local_frame(
        spark,
        [(int(n_cal), int(rank), float(q_hat), round(1.0 - q_hat, 6))],
        "n_cal long, rank long, q_hat double, threshold double",
    )
    return meta.crossJoin(ev).select(
        "n_cal",
        "rank",
        "q_hat",
        "threshold",
        "n_eval_pos",
        "n_covered",
        F.round(F.col("n_covered") / F.col("n_eval_pos"), 6).alias("coverage"),
        (
            F.col("n_covered") / F.col("n_eval_pos") >= (1.0 - alpha) - 0.05
        ).alias("coverage_ok"),
    )

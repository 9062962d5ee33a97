"""Aggregate surface beyond the reference's global min/max/sum/count:
distinct, count-distinct, rollup/cube/grouping-sets, exact percentiles,
conditional aggregation / pivot (SURVEY.md §2 Part B aggregation rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from transit_feed_etl_spark.io import table
from transit_feed_etl_spark.registry import register


@register(
    "distinct_values",
    oracle="""
    SELECT DISTINCT l_returnflag, l_linestatus
    FROM lineitem
    ORDER BY l_returnflag, l_linestatus
    """,
)
def distinct_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT — hash aggregate with map-side partial dedup (the shuffle
    carries only distinct pairs, not 600k rows)."""
    li = table(spark, sf_dir, "lineitem")
    return li.select("l_returnflag", "l_linestatus").distinct().orderBy(
        "l_returnflag", "l_linestatus"
    )


@register(
    "count_distinct",
    oracle="""
    SELECT
      COUNT(DISTINCT l_partkey) AS n_parts,
      COUNT(DISTINCT l_suppkey) AS n_supps,
      COUNT(DISTINCT l_orderkey) AS n_orders,
      COUNT(*) AS n_rows
    FROM lineitem
    """,
)
def count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact multi-column COUNT DISTINCT (Catalyst expands to
    partial-dedup + final count). The approximate twin is
    `approx_distinct_users` (rows-only check — HLL sketches are
    engine-specific)."""
    li = table(spark, sf_dir, "lineitem")
    return li.agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "salted_distinct_users_by_type",
    oracle="""
    SELECT event_type, COUNT(DISTINCT user_id) AS n_distinct
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def salted_distinct_users_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact COUNT(DISTINCT) under key skew, via hash-salting
    (operators/skew.py): salt = pmod(xxhash64(user_id), 16) spreads the
    hottest event_type's distinct-set over 16 reducer tasks; per-bucket
    counts are disjoint so their sum is exact. The result is identical
    to plain countDistinct — which is exactly why it is oracle-checkable
    — but the plan has no single-reducer hot key at 100 TB."""
    from transit_feed_etl_spark.operators.skew import salted_count_distinct

    ev = table(spark, sf_dir, "events")
    return salted_count_distinct(
        ev, ["event_type"], "user_id", n_salts=16
    ).orderBy("event_type")


@register(
    "approx_distinct_users",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           COUNT(DISTINCT user_id) AS exact_users,
           TRUE AS hll_within_5pct
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) — the 100 TB path for
    distinct-user counts: constant memory, one pass, mergeable sketches.

    Bound-style oracle (VERDICT r5 item 8, promoted from rows-only):
    the raw HLL estimate is engine-specific, so the checked columns are
    the exact yardstick (COUNT DISTINCT, cross-checked against DuckDB)
    plus a boolean asserting the sketch landed within ±5% of it —
    2.5x the configured rsd=0.02. HLL++ is hash-based, no RNG, so for
    a fixed corpus the boolean is deterministic; at the driver's
    cardinalities (~150/group) the sparse exact mode makes the estimate
    exact outright. A sketch regression now reds the row instead of
    hiding behind a rows-only check. The exact column doubles the work;
    it exists purely as the in-plan yardstick — production callers use
    the sketch alone."""
    ev = table(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.countDistinct("user_id").alias("exact_users"),
        F.count(F.lit(1)).alias("n"),
    )
    within = (
        F.abs(F.col("approx_users") - F.col("exact_users"))
        <= 0.05 * F.col("exact_users")
    ).alias("hll_within_5pct")
    return agg.select("event_type", "n", "exact_users", within).orderBy(
        "event_type"
    )


@register(
    "rollup_order_stats",
    oracle="""
    SELECT
      o_orderstatus,
      o_orderpriority,
      COUNT(*) AS n,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,3))) AS DOUBLE) AS total,
      GROUPING(o_orderstatus) AS g_status,
      GROUPING(o_orderpriority) AS g_prio
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    HAVING COUNT(*) > 0  -- align empty-input domains: Spark emits NO
                         -- rows for rollup over an empty relation; the
                         -- SQL standard (and DuckDB) emit the () grand-
                         -- total row. No-op on non-empty input (every
                         -- grouping-set row aggregates >= 1 source row).
    ORDER BY g_status, g_prio, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
)
def rollup_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy (status -> status+priority -> grand total) with
    GROUPING() markers to distinguish real NULLs from subtotal rows.

    Documented engine deviation: Spark returns ZERO rows for
    rollup/cube/grouping-sets over an empty relation, where the SQL
    standard's () grouping set emits one grand-total row — the oracle
    carries a no-op-on-data HAVING so both engines agree on the whole
    input domain (pinned by the empty-table sweep in
    tests/test_empty_input.py)."""
    od = table(spark, sf_dir, "orders")
    return (
        od.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,3)")).cast("double").alias("total"),
            F.grouping("o_orderstatus").alias("g_status"),
            F.grouping("o_orderpriority").alias("g_prio"),
        )
        .orderBy(
            "g_status",
            "g_prio",
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


@register(
    "cube_lineitem_stats",
    oracle="""
    SELECT
      l_returnflag,
      l_linestatus,
      COUNT(*) AS n,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,3))) AS DOUBLE) AS qty,
      GROUPING(l_returnflag) AS g_rf,
      GROUPING(l_linestatus) AS g_ls
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    HAVING COUNT(*) > 0  -- empty-input domain alignment, see
                         -- rollup_order_stats
    ORDER BY g_rf, g_ls, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
)
def cube_lineitem_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE — all 2^2 grouping combinations in one shuffle (Catalyst
    expands the grouping sets; far cheaper than 4 separate scans).
    Empty-input deviation documented at rollup_order_stats."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(18,3)")).cast("double").alias("qty"),
            F.grouping("l_returnflag").alias("g_rf"),
            F.grouping("l_linestatus").alias("g_ls"),
        )
        .orderBy(
            "g_rf",
            "g_ls",
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


@register(
    "exact_percentiles",
    oracle="""
    SELECT
      event_type,
      ROUND(QUANTILE_CONT(value, 0.5), 6) AS p50,
      ROUND(QUANTILE_CONT(value, 0.95), 6) AS p95,
      MIN(value) AS vmin,
      MAX(value) AS vmax,
      COUNT(value) AS n
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (Spark `percentile` ==
    DuckDB `quantile_cont`, both linear interpolation; rounded to 6dp to
    absorb last-ulp interpolation differences). At 100 TB swap to
    percentile_approx (Greenwald-Khanna sketch) — see
    `approx_percentiles` (rows-only)."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.round(F.percentile("value", 0.5), 6).alias("p50"),
            F.round(F.percentile("value", 0.95), 6).alias("p95"),
            F.min("value").alias("vmin"),
            F.max("value").alias("vmax"),
            F.count("value").alias("n"),
        )
        .orderBy("event_type")
    )


@register(
    "conditional_pivot",
    oracle="""
    SELECT
      user_bucket,
      COUNT(*) FILTER (WHERE event_type = 'click') AS n_click,
      COUNT(*) FILTER (WHERE event_type = 'view') AS n_view,
      COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
      COUNT(*) FILTER (WHERE event_type = 'signup') AS n_signup,
      COUNT(*) FILTER (WHERE event_type = 'error') AS n_error,
      CAST(COALESCE(SUM(CAST(value AS DECIMAL(18,6)))
                    FILTER (WHERE event_type = 'purchase'), 0) AS DOUBLE)
        AS purchase_value
    FROM (SELECT *, user_id % 10 AS user_bucket FROM events)
    GROUP BY user_bucket
    ORDER BY user_bucket
    """,
)
def conditional_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manual pivot via conditional aggregation (count-if / sum-if).
    Unlike .pivot(), the output schema is static — required for
    predictable plans in production pipelines."""
    ev = table(spark, sf_dir, "events").withColumn("user_bucket", F.col("user_id") % 10)

    def nif(t: str) -> F.Column:
        return F.count(F.when(F.col("event_type") == t, 1)).alias(f"n_{t}")

    return (
        ev.groupBy("user_bucket")
        .agg(
            nif("click"),
            nif("view"),
            nif("purchase"),
            nif("signup"),
            nif("error"),
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("event_type") == "purchase",
                        F.col("value").cast("decimal(18,6)"),
                    )
                ),
                F.lit(0),
            )
            .cast("double")
            .alias("purchase_value"),
        )
        .orderBy("user_bucket")
    )


@register(
    "grouping_sets_order_stats",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
      COUNT(*) AS n_orders,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,3))) AS DOUBLE) AS sum_price,
      GROUPING(o_orderstatus) AS g_status,
      GROUPING(o_orderpriority) AS g_prio
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    HAVING COUNT(*) > 0  -- empty-input domain alignment, see
                         -- rollup_order_stats
    ORDER BY g_status, g_prio,
             o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
)
def grouping_sets_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (neither pure rollup nor cube): per-status
    totals, per-priority totals, and the grand total in ONE shuffle —
    Catalyst expands the sets via a single Expand node instead of three
    scans + union. Empty-input deviation documented at
    rollup_order_stats."""
    o = table(spark, sf_dir, "orders")
    return (
        o.groupingSets(
            [["o_orderstatus"], ["o_orderpriority"], []],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,3)"))
            .cast("double")
            .alias("sum_price"),
            F.grouping("o_orderstatus").alias("g_status"),
            F.grouping("o_orderpriority").alias("g_prio"),
        )
        .orderBy(
            "g_status",
            "g_prio",
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


@register(
    "approx_percentiles",
    oracle="""
    SELECT event_type,
           COUNT(value) AS n,
           MIN(value) AS vmin,
           MAX(value) AS vmax,
           TRUE AS p50_in_band,
           TRUE AS p95_in_band
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Verification harness for per-group approximate percentiles:
    percentile_approx runs a bounded-memory mergeable Greenwald-Khanna
    sketch. accuracy=10000 bounds the rank error at n/10000.

    Bound-style oracle (VERDICT r5 item 8, promoted from rows-only): the
    raw GK estimates are engine- and merge-order-specific, so the checked
    columns are exact portables (n, min, max — cross-checked against
    DuckDB) plus booleans asserting each estimate lies inside the exact
    ±1.5%-rank envelope computed in the same plan — 150x the sketch's
    configured rank-error bound, so merge-order jitter can never flip
    them while a broken sketch always does. tests/test_oracle_parity.py
    still asserts closeness to the exact interpolated percentiles.

    Scaling concession (ADVICE r6): the in-plan envelope uses exact
    F.percentile, which buffers every group value — so THIS registered
    query is deliberately NOT the 100 TB plan; it exists to let the
    driver value-check the sketch at test scale. The production path is
    `approx_percentiles_sketch_only` below: identical sketch, zero exact
    aggregates, partial-aggregatable end to end (plan-pinned by
    tests/test_plans.py::test_sketch_only_percentiles_partial_agg).

    Small-group guard (round-6 review finding): for groups under 150
    rows the ±1.5%-rank envelope spans less than ~2 order statistics,
    so the definitional gap between the sketch's nearest-rank answer
    and the interpolated envelope edges can exceed the band on
    perfectly correct output — the band is only meaningful when
    0.015*n comfortably exceeds one rank. Such groups pass the boolean
    by n-guard instead of by accident; every committed corpus's groups
    are ~190-20000 rows, so the real check binds everywhere the driver
    looks."""
    ev = table(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.percentile_approx("value", 0.5, 10000).alias("p50"),
        F.percentile_approx("value", 0.95, 10000).alias("p95"),
        F.percentile("value", F.lit(0.485)).alias("p50_lo"),
        F.percentile("value", F.lit(0.515)).alias("p50_hi"),
        F.percentile("value", F.lit(0.935)).alias("p95_lo"),
        F.percentile("value", F.lit(0.965)).alias("p95_hi"),
        F.count("value").alias("n"),
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
    )
    small = F.col("n") < 150
    return agg.select(
        "event_type",
        "n",
        "vmin",
        "vmax",
        (small | F.col("p50").between(F.col("p50_lo"), F.col("p50_hi"))).alias(
            "p50_in_band"
        ),
        (small | F.col("p95").between(F.col("p95_lo"), F.col("p95_hi"))).alias(
            "p95_in_band"
        ),
    ).orderBy("event_type")


@register("approx_percentiles_sketch_only", oracle=None, driver_exempt=True)
def approx_percentiles_sketch_only(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB quantile plan (driver-exempt twin of
    `approx_percentiles`): ONLY mergeable bounded-memory aggregates —
    the Greenwald-Khanna sketch plus count/min/max — so the single
    groupBy exchange carries one sketch per (partition, group) instead
    of every value, and no exact-percentile buffer exists anywhere in
    the plan (the driver-checked twin embeds exact F.percentile as its
    verification envelope, which buffers group values; ADVICE r6).
    Value contract: the raw estimates replay inside the exact
    ±1.5%-rank envelope in tests/test_oracle_parity.py; plan contract:
    partial aggregation present and zero exact percentile expressions,
    pinned in tests/test_plans.py."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count("value").alias("n"),
            F.min("value").alias("vmin"),
            F.max("value").alias("vmax"),
            F.percentile_approx("value", 0.5, 10000).alias("p50"),
            F.percentile_approx("value", 0.95, 10000).alias("p95"),
        )
        .orderBy("event_type")
    )


@register(
    "numeric_stats_by_flag",
    oracle="""
    SELECT l_returnflag,
      COUNT(*) AS n,
      ROUND(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
      ROUND(covar_samp(l_quantity, l_extendedprice), 2) AS covar_qty_price,
      ROUND(stddev_samp(l_discount), 6) AS sd_discount,
      ROUND(var_samp(l_tax), 8) AS var_tax
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def numeric_stats_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-moment statistics per group: Pearson correlation, sample
    covariance / stddev / variance. All four are single-pass mergeable
    co-moment aggregates (partial agg per partition, merge on the one
    groupBy shuffle) — the distributed formulation Spark codegens is the
    textbook parallel Welford/co-moment merge. Rounded (4-8 dp per
    magnitude) so the merge-order double drift (~1e-14 relative) never
    crosses a hash boundary.

    Correlation is composed as covar_samp/(sd_x*sd_y) behind a
    positive-variance guard rather than F.corr: under ANSI mode
    Spark's corr THROWS DIVIDE_BY_ZERO when either column has zero
    variance (found by the zero-variance sweep on constant columns)
    while DuckDB's corr returns NULL — the guarded quotient is the
    same Pearson value on non-degenerate groups (identical co-moment
    sketches, equality within the 4 dp rounding) and NULL on
    degenerate ones, matching the oracle."""
    li = table(spark, sf_dir, "lineitem")
    sd_q = F.stddev_samp("l_quantity")
    sd_p = F.stddev_samp("l_extendedprice")
    cv = F.covar_samp("l_quantity", "l_extendedprice")
    corr = F.when((sd_q > 0) & (sd_p > 0), cv / (sd_q * sd_p))
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(corr, 4).alias("corr_qty_price"),
            F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias(
                "covar_qty_price"
            ),
            F.round(F.stddev_samp("l_discount"), 6).alias("sd_discount"),
            F.round(F.var_samp("l_tax"), 8).alias("var_tax"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "price_histogram",
    oracle="""
    WITH s AS (SELECT MIN(o_totalprice) AS mn, MAX(o_totalprice) AS mx FROM orders),
    b AS (
      -- a constant column (mx = mn) has zero width: everything is
      -- bucket 0 instead of dividing by zero (singleton-corpus sweep)
      SELECT CASE WHEN mx = mn THEN 0
                  ELSE LEAST(CAST(FLOOR((o_totalprice - mn)
                                        / ((mx - mn) / 10.0)) AS INT), 9)
             END AS bucket,
             o_totalprice
      FROM orders, s
    )
    SELECT bucket, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,3))) AS DOUBLE) AS sum_price
    FROM b GROUP BY bucket ORDER BY bucket
    """,
)
def price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram (10 buckets over the observed [min, max]):
    the two-pass distributed pattern — a 1-row global-extent aggregate
    broadcast to the scan, then arithmetic bucketing + one groupBy on the
    10-value bucket key. Bucket arithmetic is identical double math in
    both engines, so FLOOR lands identically; no width_bucket dependency."""
    o = table(spark, sf_dir, "orders")
    s = o.agg(F.min("o_totalprice").alias("mn"), F.max("o_totalprice").alias("mx"))
    # constant column (mx == mn): zero bucket width -> everything in
    # bucket 0 instead of an ANSI divide-by-zero (singleton sweep)
    b = o.crossJoin(F.broadcast(s)).select(
        F.when(F.col("mx") == F.col("mn"), F.lit(0))
        .otherwise(
            F.least(
                F.floor(
                    (F.col("o_totalprice") - F.col("mn"))
                    / ((F.col("mx") - F.col("mn")) / 10.0)
                ).cast("int"),
                F.lit(9),
            )
        )
        .alias("bucket"),
        "o_totalprice",
    )
    return (
        b.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,3)"))
            .cast("double")
            .alias("sum_price"),
        )
        .orderBy("bucket")
    )


@register(
    "equidepth_deciles",
    oracle="""
    WITH r AS (
      SELECT o_totalprice,
             NTILE(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile
      FROM orders
    )
    SELECT decile, COUNT(*) AS n,
           MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,3))) AS DOUBLE) AS sum_price
    FROM r GROUP BY decile ORDER BY decile
    """,
)
def equidepth_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth histogram (exact NTILE deciles) computed WITHOUT a
    single-partition window: `operators/ranking.global_rank` range-
    partitions on (price, orderkey), derives exact global ranks from
    per-partition offsets, and `ntile_from_rank` reproduces the ANSI
    NTILE distribution arithmetically. The oracle IS the single-node
    NTILE window — value-identical output, scalable plan
    (tests/test_plans.py pins the absence of a single-partition sort)."""
    from transit_feed_etl_spark.operators.ranking import global_rank, ntile_from_rank

    o = table(spark, sf_dir, "orders").select("o_totalprice", "o_orderkey")
    ranked = global_rank(o, ["o_totalprice", "o_orderkey"])
    n_total = o.count()
    d = ranked.withColumn(
        "decile", ntile_from_rank(F.col("rnk"), F.lit(n_total), 10)
    )
    return (
        d.groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
            F.sum(F.col("o_totalprice").cast("decimal(18,3)"))
            .cast("double")
            .alias("sum_price"),
        )
        .orderBy("decile")
    )


@register(
    "outlier_events_zscore",
    oracle="""
    WITH s AS (
      SELECT event_type,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(value) AS mu,
             COUNT(value) AS n,
             -- DECIMAL(19,6): >18 digits forces DuckDB's int128 multiply
             -- (the 18-digit path multiplies in int64 and overflows at
             -- |value| ~ 3e3); values are identical, Spark's product is
             -- int128-exact either way
             CAST(SUM(CAST(value AS DECIMAL(19,6)) * CAST(value AS DECIMAL(19,6)))
               AS DOUBLE) AS sumsq
      FROM events GROUP BY event_type
    ),
    z AS (
      -- zero-variance or singleton groups have no defined z-score (and
      -- would divide by zero); NULL here, excluded by the ABS cut below
      SELECT e.event_id, e.event_type, e.value,
             CASE WHEN s.n >= 2
                   AND (s.sumsq - CAST(s.n AS DOUBLE) * s.mu * s.mu) > 0
                  THEN (e.value - s.mu)
                    / SQRT((s.sumsq - CAST(s.n AS DOUBLE) * s.mu * s.mu)
                           / (CAST(s.n AS DOUBLE) - 1))
             END AS zscore
      FROM events e JOIN s ON s.event_type = e.event_type
    )
    SELECT event_id, event_type, value, ROUND(zscore, 4) AS z
    FROM z WHERE ABS(zscore) > 3.0
    ORDER BY event_id
    """,
)
def outlier_events_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical outlier filter: flag events whose value sits > 3
    sample-stddevs from its group mean. Two-pass: per-group moments from
    EXACT decimal sums (order-independent — the z-score inputs are
    bit-identical in both engines, so the |z| > 3 cut never flips on
    merge order), broadcast back onto the scan. The standard data-
    cleaning pass before training-set statistics.

    Cross-engine value domain: the exact-decimal SQUARE (int128 in both
    engines after the oracle's DECIMAL(19,6) cast) bounds
    |value| <~ 1e12 before the sum-of-squares nears 38 digits
    (extreme-numerics sweep); beyond that, widen the decimal or accept
    float moments."""
    ev = table(spark, sf_dir, "events")
    dec = F.col("value").cast("decimal(18,6)")
    s = ev.groupBy("event_type").agg(
        (F.sum(dec).cast("double") / F.count("value")).alias("mu"),
        F.count("value").alias("n"),
        F.sum(dec * dec).cast("double").alias("sumsq"),
    )
    # zero-variance or singleton groups have no defined z-score: guard
    # instead of dividing by zero (ANSI ArithmeticException on an
    # all-identical group — found by the adversarial-ties sweep); the
    # NULL z falls out of the |z| > 3 filter on both engines
    ssq = F.col("sumsq") - F.col("n").cast("double") * F.col("mu") * F.col("mu")
    z = F.when(
        (F.col("n") >= 2) & (ssq > 0),
        (F.col("value") - F.col("mu"))
        / F.sqrt(ssq / (F.col("n").cast("double") - 1)),
    )
    return (
        ev.join(F.broadcast(s), "event_type")
        .withColumn("zscore", z)
        .filter(F.abs(F.col("zscore")) > 3.0)
        .select("event_id", "event_type", "value", F.round("zscore", 4).alias("z"))
        .orderBy("event_id")
    )


@register(
    "bool_aggs_order_flags",
    oracle="""
    SELECT o_orderstatus,
           bool_and(o_totalprice > 1500.0) AS all_above_1500,
           bool_or(o_orderpriority = '1-URGENT') AS any_urgent,
           CAST(count_if(o_totalprice > 200000.0) AS BIGINT) AS n_big,
           COUNT(*) AS n
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def bool_aggs_order_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregates (ALL/ANY/conditional count): bool_and /
    bool_or / count_if — single-pass, partial-aggregatable (AND/OR are
    associative+commutative so merge order is irrelevant)."""
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.bool_and(F.col("o_totalprice") > 1500.0).alias("all_above_1500"),
            F.bool_or(F.col("o_orderpriority") == "1-URGENT").alias("any_urgent"),
            F.count_if(F.col("o_totalprice") > 200000.0).alias("n_big"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "argmax_order_per_status",
    oracle="""
    WITH mx AS (
      SELECT o_orderstatus, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_orderstatus
               ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn
      FROM orders
    ),
    mn AS (
      SELECT o_orderstatus, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_orderstatus
               ORDER BY o_totalprice ASC, o_orderkey ASC) AS rn
      FROM orders
    )
    SELECT m.o_orderstatus,
           m.o_orderkey AS max_price_orderkey, m.o_totalprice AS max_price,
           n.o_orderkey AS min_price_orderkey, n.o_totalprice AS min_price
    FROM (SELECT * FROM mx WHERE rn = 1) m
    JOIN (SELECT * FROM mn WHERE rn = 1) n USING (o_orderstatus)
    ORDER BY o_orderstatus
    """,
)
def argmax_order_per_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ARG_MAX / ARG_MIN (max_by/min_by): the key of the extreme row per
    group without a self-join or window — one partial-aggregatable pass.
    Ties on the price are broken deterministically by composing the
    ordering value as a (price, key) struct: lexicographic struct
    comparison gives max_by the LARGEST key among max-price rows and
    min_by the SMALLEST key among min-price rows, matching the oracle's
    (DESC, DESC) / (ASC, ASC) windows. The min side originally negated
    the key (struct(price, -key)), which picks the largest key among
    min-price ties — invisible on the tie-free driver corpora, caught by
    the zero-variance sweep where a constant price makes EVERY row a
    tie."""
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.max_by(
                "o_orderkey", F.struct("o_totalprice", "o_orderkey")
            ).alias("max_price_orderkey"),
            F.max("o_totalprice").alias("max_price"),
            F.min_by(
                "o_orderkey", F.struct("o_totalprice", "o_orderkey")
            ).alias("min_price_orderkey"),
            F.min("o_totalprice").alias("min_price"),  # oracle mirrors via rn=1 windows
        )
        .orderBy("o_orderstatus")
    )


@register(
    "regression_price_vs_qty",
    oracle="""
    SELECT l_returnflag,
           CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n,
           ROUND(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
           ROUND(regr_intercept(l_extendedprice, l_quantity), 2) AS intercept,
           ROUND(regr_r2(l_extendedprice, l_quantity), 6) AS r2
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def regression_price_vs_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-regression aggregate family (regr_slope / intercept / r2 /
    count): mergeable co-moment sketches like corr — one shuffle, exact
    merges up to double rounding (rounded per-magnitude so merge-order
    drift can't cross a hash boundary)."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.regr_count("l_extendedprice", "l_quantity").alias("n"),
            F.round(F.regr_slope("l_extendedprice", "l_quantity"), 4).alias("slope"),
            F.round(F.regr_intercept("l_extendedprice", "l_quantity"), 2).alias(
                "intercept"
            ),
            F.round(F.regr_r2("l_extendedprice", "l_quantity"), 6).alias("r2"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "exact_median_via_rank",
    oracle="""
    WITH r AS (
      SELECT o_totalprice,
             ROW_NUMBER() OVER (ORDER BY o_totalprice, o_orderkey) AS rnk,
             COUNT(*) OVER () AS n
      FROM orders
    )
    SELECT CAST(COALESCE(MAX(n), 0) AS BIGINT) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,3))) AS DOUBLE) / COUNT(*)
             AS median_price
    FROM r WHERE rnk IN ((n + 1) // 2, n // 2 + 1)
    """,
)
def exact_median_via_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT global median via the distributed ranking operator
    (operators/ranking.py): rank the price column with range-partition +
    offsets, pick ranks ceil(N/2) and floor(N/2)+1, interpolate — the
    order statistic WITHOUT a single-task sort (F.median is a grouped
    agg needing all values per group; percentile_approx is a sketch —
    this is the exact scalable path for order statistics)."""
    from transit_feed_etl_spark.operators.ranking import global_rank

    o = table(spark, sf_dir, "orders").select("o_totalprice", "o_orderkey")
    n = o.count()
    lo, hi = (n + 1) // 2, n // 2 + 1
    ranked = global_rank(o, ["o_totalprice", "o_orderkey"])
    picked = ranked.filter(F.col("rnk").isin(lo, hi))
    return picked.agg(
        F.lit(n).cast("long").alias("n"),
        (
            F.sum(F.col("o_totalprice").cast("decimal(18,3)")).cast("double")
            / F.count(F.lit(1))
        ).alias("median_price"),
    )


@register(
    "outlier_events_mad",
    oracle="""
    WITH med AS (
      SELECT event_type, QUANTILE_CONT(value, 0.5) AS med
      FROM events GROUP BY event_type
    ),
    mad AS (
      SELECT e.event_type,
             QUANTILE_CONT(ABS(e.value - m.med), 0.5) AS mad
      FROM events e JOIN med m ON m.event_type = e.event_type
      GROUP BY e.event_type
    )
    SELECT e.event_type,
           ROUND(ANY_VALUE(m.med), 6) AS med,
           ROUND(ANY_VALUE(d.mad), 6) AS mad,
           COUNT(*) AS n,
           CAST(SUM(CASE WHEN ABS(e.value - m.med) > 4 * d.mad
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM events e
      JOIN med m ON m.event_type = e.event_type
      JOIN mad d ON d.event_type = e.event_type
    GROUP BY e.event_type
    ORDER BY e.event_type
    """,
)
def outlier_events_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection via MEDIAN ABSOLUTE DEVIATION — the
    z-score's (outlier_events_zscore) breakdown-resistant sibling: a few
    extreme values cannot drag the center or the spread. Three passes,
    each a broadcast of a tiny per-group stats row back onto the scan:
    exact interpolated median, then median of absolute deviations, then
    the |v - med| > 4*MAD count. Both engines interpolate the exact
    percentile with identical IEEE arithmetic (the exact_percentiles
    contract), so the strict-inequality cut never flips between them."""
    ev = table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.percentile("value", 0.5).alias("med")
    )
    with_med = ev.join(F.broadcast(med), "event_type")
    mad = with_med.groupBy("event_type").agg(
        F.percentile(F.abs(F.col("value") - F.col("med")), 0.5).alias("mad")
    )
    return (
        with_med.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.round(F.first("med"), 6).alias("med"),
            F.round(F.first("mad"), 6).alias("mad"),
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(
                    F.abs(F.col("value") - F.col("med")) > 4 * F.col("mad"), 1
                ).otherwise(0)
            ).alias("n_outliers"),
        )
        .orderBy("event_type")
    )

"""Analytics catalog: the relational surface the reference lacks entirely
(SURVEY §2.4-§2.6 record joins/windows/set-ops/grouping as absent) but any
user of a Spark-based engine expects. Each entry is the idiomatic
Catalyst-friendly formulation with a DuckDB oracle.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Window
from pyspark.sql import functions as F

from .operators.ratio import round_ratio
from .queries import load, query, rev_e4, rev_e4_sql, rev_sum_sql, sum_money


def _cents(col: str) -> "F.Column":
    """Exact integer cents of a cents-exact money column (see
    queries.rev_e4: integer sums are order-independent; every money
    column in the testdata is cents-exact to representation error)."""
    return F.round(F.col(col) * 100).cast("long")


def _cents_sum_sql(col: str) -> str:
    return (f"round(CAST(sum(CAST(round({col} * 100) AS BIGINT))"
            f" AS DOUBLE) / 100.0, 2)")


@query(
    "set_ops_users",
    """
    SELECT user_id FROM (
        SELECT user_id FROM events WHERE event_type = 'click'
        GROUP BY user_id HAVING count(*) >= 14
        INTERSECT
        SELECT user_id FROM events WHERE event_type = 'view'
        GROUP BY user_id HAVING count(*) >= 14
    ) t
    EXCEPT
    SELECT user_id FROM events WHERE event_type = 'purchase'
    GROUP BY user_id HAVING count(*) >= 14
    """,
)
def set_ops_users(spark, sf_dir):
    """Set algebra (INTERSECT/EXCEPT): heavily-engaged-but-not-heavily-
    converting users. Spark plans set ops as semi/anti hash joins over the
    (already aggregated, small) key sets."""
    ev = load(spark, sf_dir, "events")

    def heavy(event_type: str):
        return (
            ev.filter(F.col("event_type") == event_type)
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") >= 14)
            .select("user_id")
        )

    return heavy("click").intersect(heavy("view")).exceptAll(heavy("purchase"))


@query(
    "cube_revenue",
    f"""
    SELECT l_returnflag, l_linestatus,
           {rev_sum_sql()} AS revenue,
           count(*) AS n_items
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def cube_revenue(spark, sf_dir):
    """CUBE grouping-sets rollup — Spark expands to a single Expand +
    hash aggregate (one shuffle for all 2^k grouping sets). The exact
    integer revenue is PROJECTED BEFORE the cube: Expand duplicates
    every input row once per grouping set, so an agg-input expression
    is otherwise evaluated 2^k times per row — measured +0.55 CPU s at
    sf0.1 when rev_e4's rounds/casts sat inside the agg (r13 closing
    gate caught it); pre-projected, Expand copies one computed long."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.select("l_returnflag", "l_linestatus", rev_e4().alias("e4"))
        .cube("l_returnflag", "l_linestatus")
        .agg(
            sum_money(F.col("e4")).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "distinct_users_per_type",
    """
    SELECT event_type,
           count(DISTINCT user_id) AS n_users,
           count(*) AS n_events
    FROM events GROUP BY event_type
    """,
)
def distinct_users_per_type(spark, sf_dir):
    """Exact distinct aggregation (Spark: two-phase partial-distinct
    aggregate). The approximate variant for 100 TB cardinalities is
    approx_count_distinct (HLL, one pass, no distinct shuffle) — kept out
    of the oracle set since HLL estimates are engine-specific."""
    return (
        load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


@query(
    "pivot_user_event_matrix",
    """
    SELECT user_id,
           count(*) FILTER (event_type = 'click')    AS click,
           count(*) FILTER (event_type = 'error')    AS error,
           count(*) FILTER (event_type = 'purchase') AS purchase,
           count(*) FILTER (event_type = 'signup')   AS signup,
           count(*) FILTER (event_type = 'view')     AS view
    FROM events GROUP BY user_id
    """,
)
def pivot_user_event_matrix(spark, sf_dir):
    """Pivot to a per-user feature matrix. Pivot values are pinned
    explicitly — at scale an unpinned pivot triggers an extra
    distinct-scan job to discover them."""
    return (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .pivot("event_type", ["click", "error", "purchase", "signup", "view"])
        .count()
        .na.fill(0)
    )


@query(
    "sessionize_batch",
    """
    WITH gaps AS (
        SELECT user_id, ts,
               CASE WHEN ts - lag(ts) OVER w <= INTERVAL '30 minutes' THEN 0 ELSE 1 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
        SELECT user_id, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS session_id
        FROM gaps
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id, count(*) AS n_events
    FROM sess GROUP BY user_id, session_id
    """,
)
def sessionize_batch(spark, sf_dir):
    """Batch sessionization: lag-gap flag + running sum = session id, then
    aggregate. Two window passes over one (user) shuffle partitioning —
    Catalyst reuses the exchange. (Streaming twin: session_window in
    streaming/ingest.py.)"""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    new_sess = F.when(gap <= 30 * 60, F.lit(0)).otherwise(F.lit(1))
    run = Window.partitionBy("user_id").orderBy("ts").rowsBetween(Window.unboundedPreceding, 0)
    return (
        ev.withColumn("new_sess", new_sess)
        .withColumn("session_id", F.sum("new_sess").over(run))
        .groupBy("user_id", "session_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


@query(
    "asof_join_last_purchase",
    """
    SELECT c.event_id, c.user_id, CAST(c.ts AS TIMESTAMP) AS click_ts,
           CAST(p.ts AS TIMESTAMP) AS last_purchase_ts
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        ON c.user_id = p.user_id AND c.ts >= p.ts
    """,
)
def asof_join_last_purchase(spark, sf_dir):
    """As-of join (Spark has no native one): every click matched to the
    user's latest purchase at-or-before it. Implemented as the union-tag +
    last(ignorenulls) running window — ONE shuffle on user_id, no range
    explosion; the classic Spark formulation of merge_asof. DuckDB's
    native ASOF JOIN is the oracle."""
    ev = load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", F.col("ts").alias("click_ts"), F.lit(None).cast("timestamp").alias("p_ts")
    )
    buys = ev.filter(F.col("event_type") == "purchase").select(
        F.lit(None).cast("long").alias("event_id"),
        "user_id",
        F.col("ts").alias("click_ts"),  # ordering column for the union
        F.col("ts").alias("p_ts"),
    )
    unioned = clicks.unionByName(buys)
    # order purchases *before* clicks at identical ts so ts-ties count as
    # "at-or-before" (mirrors the oracle's c.ts >= p.ts)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("click_ts").asc(), F.col("p_ts").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        unioned.withColumn("last_purchase_ts", F.last("p_ts", ignorenulls=True).over(w))
        .filter(F.col("event_id").isNotNull())
        .select("event_id", "user_id", "click_ts", "last_purchase_ts")
    )


@query(
    "grouped_user_stats",
    """
    WITH x AS (
        SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) / 3.6e9 AS xh, value
        FROM events),
    pre AS (
        SELECT user_id, median(value) AS med, avg(xh) AS xbar
        FROM x GROUP BY user_id)
    SELECT x.user_id, count(*) AS n,
           round(any_value(pre.med), 4) AS median_value,
           round(median(abs(x.value - pre.med)), 4) AS mad_value,
           round(coalesce(regr_slope(x.value, x.xh - pre.xbar), 0.0), 4) AS trend
    FROM x JOIN pre USING (user_id)
    GROUP BY x.user_id
    """,
)
def grouped_user_stats(spark, sf_dir):
    """Per-user robust stats (median, MAD, hourly value trend) via
    applyInPandas (operators/grouped.py) — the grouped Arrow-batched
    Python stage, exact-checked three ways: against the built-in
    median/regr_slope expression twin (tests) and this DuckDB oracle."""
    from .operators.grouped import grouped_robust_stats

    return grouped_robust_stats(load(spark, sf_dir, "events"))


@query(
    "range_join_event_windows",
    """
    WITH w AS (
        SELECT event_id AS window_id, CAST(ts AS TIMESTAMP) AS ws,
               CAST(ts AS TIMESTAMP) + INTERVAL 6 HOUR AS we
        FROM events WHERE event_type = 'signup' AND event_id % 31 = 0)
    SELECT w.window_id, count(*) AS n_events,
           round(CAST(sum(CAST(round(e.value * 100) AS BIGINT)) AS DOUBLE)
                 / 100.0, 2) AS sum_value
    FROM w JOIN events e
      ON CAST(e.ts AS TIMESTAMP) >= w.ws AND CAST(e.ts AS TIMESTAMP) < w.we
    GROUP BY w.window_id
    """,
)
def range_join_event_windows(spark, sf_dir):
    """Interval join (operators/range_join.py): activity during the 6 hours
    after each sampled signup. Spark's naive inequality join here is a
    BroadcastNestedLoopJoin (|events| x |windows| comparisons); the binned
    formulation turns it into an equi hash join on a time bin + an exact
    residual filter — the plan that survives 100 TB. DuckDB's native IEJoin
    on the raw inequality is the oracle."""
    from .operators.range_join import interval_join

    ev = load(spark, sf_dir, "events")
    windows = ev.filter(
        (F.col("event_type") == "signup") & (F.col("event_id") % 31 == 0)
    ).select(
        F.col("event_id").alias("window_id"),
        F.col("ts").alias("ws"),
        (F.col("ts") + F.expr("INTERVAL 6 HOURS")).alias("we"),
    )
    joined = interval_join(ev, windows, ts_col="ts", start_col="ws", end_col="we")
    return joined.groupBy("window_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        sum_money(_cents("value"), 100.0).alias("sum_value"),
    )


@query(
    "skew_salted_join",
    """
    WITH user_stats AS (
        SELECT user_id, count(*) AS n_user_events,
               round(CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
                     / 100.0, 2) AS user_value
        FROM events GROUP BY user_id)
    SELECT e.event_id, e.user_id, e.event_type, s.n_user_events, s.user_value
    FROM events e JOIN user_stats s ON e.user_id = s.user_id
    """,
)
def skew_salted_join(spark, sf_dir):
    """Salted fact-to-dim join (operators/skew.py): the events fact salted
    on event_id, the per-user dim replicated across 8 salts — result is
    row-identical to the plain join (the oracle IS the plain join). At
    100 TB this spreads a hot user over 8 tasks instead of one straggler."""
    from .operators.skew import salted_join

    ev = load(spark, sf_dir, "events")
    dim = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_user_events"),
        sum_money(_cents("value"), 100.0).alias("user_value"),
    )
    out = salted_join(
        ev.select("event_id", "user_id", "event_type"), dim, on="user_id",
        salt_factor=8, salt_source="event_id",
    )
    return out.select("event_id", "user_id", "event_type", "n_user_events", "user_value")


@query(
    "agg_quantiles",
    """
    SELECT l_returnflag,
           round(quantile_cont(l_quantity, 0.5), 4) AS p50_qty,
           round(quantile_cont(l_quantity, 0.9), 4) AS p90_qty,
           round(quantile_cont(l_extendedprice, 0.5), 4) AS p50_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_quantiles(spark, sf_dir):
    """Exact continuous quantiles per group (Spark `percentile` ==
    DuckDB `quantile_cont`, both linear-interpolation). The 100 TB variant
    is `percentile_approx` (t-digest sketch, one pass, no sort) — excluded
    from the oracle set because sketch estimates are engine-specific."""
    li = load(spark, sf_dir, "lineitem")
    # r15 (guide §1.2 per-task work): the two quantity percentiles share ONE
    # aggregate buffer via the array form — two scalar `percentile(qty, p)`
    # calls each built their own per-group (value -> count) OpenHashMap and
    # walked every row twice; `percentile(qty, array(...))` builds one.
    # Identical values (same aggregate, same interpolation), one less
    # row-pass worth of buffer updates.
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_quantity, array(0.5D, 0.9D))").alias("pq"),
            F.expr("percentile(l_extendedprice, 0.5D)").alias("pp"),
        )
        .select(
            "l_returnflag",
            F.round(F.col("pq")[0], 4).alias("p50_qty"),
            F.round(F.col("pq")[1], 4).alias("p90_qty"),
            F.round("pp", 4).alias("p50_price"),
        )
    )


@query(
    "json_extract_props",
    """
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k,
           CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_bucket
    FROM events
    """,
)
def json_extract_props(spark, sf_dir):
    """Scalar JSON extraction from a string payload column (absent in the
    reference, SURVEY §2.7). `get_json_object` evaluates JVM-side per row —
    no Python, no shuffle; for repeated multi-field extraction prefer one
    `from_json` with an explicit schema over N path probes."""
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.select("event_id", k.alias("k"), (k % 10).alias("k_bucket"))


@query(
    "rollup_revenue_by_nation_region",
    f"""
    SELECT r_name, n_name,
           {_cents_sum_sql("c_acctbal")} AS total_acctbal,
           count(*) AS n_customers
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def rollup_revenue_by_nation_region(spark, sf_dir):
    """Hierarchical ROLLUP (region -> nation -> grand total) over a
    broadcast dim chain — one Expand + one shuffle for all levels. The
    integer cents column is projected BELOW the rollup (r14 Expand
    audit, same rationale as cube_revenue: Expand re-evaluates agg-input
    expressions once per grouping set — 3x here — while a pre-projected
    column is computed once per input row)."""
    cust = load(spark, sf_dir, "customer")
    nat = load(spark, sf_dir, "nation")
    reg = load(spark, sf_dir, "region")
    return (
        cust.join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .select("r_name", "n_name", _cents("c_acctbal").alias("bal_cents"))
        .rollup("r_name", "n_name")
        .agg(
            sum_money(F.col("bal_cents"), 100.0).alias("total_acctbal"),
            F.count(F.lit(1)).alias("n_customers"),
        )
    )


@query(
    "running_revenue_per_customer",
    """
    SELECT o_custkey, o_orderkey, CAST(o_orderdate AS TIMESTAMP) AS o_orderdate,
           round(CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS UNBOUNDED PRECEDING) AS DOUBLE) / 100.0, 2) AS running_total,
           CAST(row_number() OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ) AS BIGINT) AS order_seq
    FROM orders
    """,
)
def running_revenue_per_customer(spark, sf_dir):
    """Cumulative window frame (ROWS UNBOUNDED PRECEDING) + sequence
    number in one window partitioning — a single shuffle on the customer
    key serves both functions."""
    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.round(
            F.sum(_cents("o_totalprice"))
            .over(w.rowsBetween(Window.unboundedPreceding, 0))
            .cast("double") / 100.0,
            2,
        ).alias("running_total"),
        F.row_number().over(w).cast("long").alias("order_seq"),
    )


@query(
    "left_outer_order_counts",
    """
    SELECT c_custkey, count(o_orderkey) AS n_orders,
           round(CAST(coalesce(sum(CAST(round(o_totalprice * 100) AS BIGINT)), 0)
                      AS DOUBLE) / 100.0, 2) AS total_spent
    FROM customer LEFT JOIN orders ON o_custkey = c_custkey
    GROUP BY c_custkey
    """,
)
def left_outer_order_counts(spark, sf_dir):
    """Left-outer + count (TPC-H Q13 shape): customers kept at zero
    orders. count(col) skips the nulls the outer join introduces."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(
                F.coalesce(
                    F.sum(F.round(F.col("o_totalprice") * 100).cast("long")),
                    F.lit(0).cast("long"),
                ).cast("double") / 100.0,
                2,
            ).alias("total_spent"),
        )
    )


@query(
    "anti_join_customers_without_orders",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00')
    """,
)
def anti_join_customers_without_orders(spark, sf_dir):
    """NOT EXISTS as a left_anti hash join — one shuffle, no row
    multiplication (the set-difference workhorse at scale). Scoped to
    1996 orders so the anti set is non-trivial (every customer has SOME
    order in this data)."""
    cust = load(spark, sf_dir, "customer")
    orders_96 = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    return cust.join(
        orders_96, cust.c_custkey == orders_96.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@query(
    "orders_above_customer_avg",
    """
    SELECT o_orderkey, o_custkey, o_totalprice, cust_avg
    FROM (
        SELECT o_orderkey, o_custkey, o_totalprice,
               floor(sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER w * 1.0
                     / count(*) OVER w) / 100.0 AS cust_avg,
               CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey)) t
    WHERE price_cents > CAST(round(cust_avg * 100) AS BIGINT)
    """,
)
def orders_above_customer_avg(spark, sf_dir):
    """Correlated-subquery shape (orders above their customer's average)
    decorrelated into one analytic window — a single shuffle instead of a
    per-row subquery or a self-join."""
    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    # prices are exact cents, so averages sit exactly on half-cent round
    # boundaries where Spark (HALF_UP on shortest repr) and DuckDB
    # (binary-faithful) disagree — compute entirely in integer cents
    # (floor of an exact integer ratio) so both engines agree bit-for-bit
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    cust_avg = F.floor(F.sum(cents).over(w) / F.count(F.lit(1)).over(w)) / F.lit(100.0)
    return (
        orders.withColumn("price_cents", cents)
        .withColumn("cust_avg", cust_avg)
        .filter(F.col("price_cents") > F.round(F.col("cust_avg") * 100).cast("long"))
        .select("o_orderkey", "o_custkey", "o_totalprice", "cust_avg")
    )


@query(
    "agg_approx_stats",
    """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           TRUE AS distinct_within_2pct,
           TRUE AS p50_within_5pct,
           TRUE AS p90_within_5pct,
           TRUE AS p99_within_5pct
    FROM events GROUP BY event_type
    """,
)
def agg_approx_stats(spark, sf_dir):
    """The one-pass approximate aggregates used instead of exact
    distinct/quantiles at 100 TB: approx_count_distinct (HLL++, no
    distinct shuffle) and percentile_approx (t-digest), hash-checkable
    via the same accuracy-contract trick as agg_approx_accuracy: the
    Spark side computes BOTH the sketch and the exact value and emits
    pass/fail booleans against published error bounds (HLL++ rsd=1%
    gated at 2%; t-digest p50/p90/p99 at accuracy=10000 gated at 5% of
    the exact value); the oracle asserts the exact counts and literal
    TRUE. Sketches are deterministic for a fixed input, so a mismatch
    genuinely signals an accuracy regression. The percentile gates are
    VACUOUS (literal pass) below 1000 rows per group: t-digest's
    guarantee is RANK error, and at tiny n the exact interpolated
    percentile and a rank-correct discrete value legitimately differ
    more than 5% in VALUE (p99 between the top two order statistics) —
    found by the round-6 sf0.001 sweep; at the sf0.01 gate and above
    every group clears the floor and the gates are active."""
    ev = load(spark, sf_dir, "events")
    # two aggregations joined on the tiny group key, not one combined agg
    # — countDistinct next to percentile forces an Expand (see
    # agg_approx_accuracy); the join is |event_type| rows, broadcast.
    counts = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.countDistinct("user_id").cast("long").alias("eu"),
        F.approx_count_distinct("user_id", rsd=0.01).alias("au"),
    )
    quants = ev.groupBy("event_type").agg(
        F.percentile_approx("value", [0.5, 0.9, 0.99], 10000).alias("aq"),
        F.expr("percentile(value, array(0.5D, 0.9D, 0.99D))").alias("eq"),
    )
    active = F.col("n_events") >= 1000  # value-relative gate meaningful
    within = [
        (
            ~active
            | (F.abs(F.col("aq")[i] - F.col("eq")[i]) <= F.abs(F.col("eq")[i]) * 0.05)
        ).alias(f"p{p}_within_5pct")
        for i, p in enumerate(("50", "90", "99"))
    ]
    return counts.join(F.broadcast(quants), "event_type").select(
        "event_type",
        "n_events",
        (F.abs(F.col("au") - F.col("eu")) <= F.col("eu") * 0.02).alias(
            "distinct_within_2pct"
        ),
        *within,
    )


@query(
    "agg_approx_accuracy",
    """
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS distinct_within_2pct,
           TRUE AS median_within_5pct
    FROM events GROUP BY event_type
    """,
)
def agg_approx_accuracy(spark, sf_dir):
    """Hash-checkable contract for the sketches agg_approx_stats leaves
    rows-only: the Spark side computes BOTH the sketch and the exact
    value and emits pass/fail booleans against published error bounds
    (HLL++ rsd=1% checked at 2%; t-digest median checked at 5% of the
    exact median); the oracle asserts the exact values and literal TRUE.
    Sketches are deterministic for a fixed input and implementation, so
    this either always matches or genuinely signals an accuracy
    regression — which is exactly what a gate row should do."""
    ev = load(spark, sf_dir, "events")
    # TWO aggregations joined on the (tiny) group key, NOT one combined
    # agg: countDistinct next to percentile/sketches makes Catalyst plan
    # an Expand (every input row duplicated per distinct-aggregate group)
    # — measured 5.7s vs 1s at sf0.1 for identical results. The join is
    # |event_type| rows, broadcast.
    counts = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("exact_users"),
        F.approx_count_distinct("user_id", rsd=0.01).alias("au"),
    )
    meds = ev.groupBy("event_type").agg(
        F.percentile_approx("value", 0.5, 10000).alias("am"),
        F.expr("percentile(value, 0.5)").alias("em"),
    )
    return counts.join(F.broadcast(meds), "event_type").select(
        "event_type",
        "exact_users",
        (
            F.abs(F.col("au") - F.col("exact_users"))
            <= F.col("exact_users") * 0.02
        ).alias("distinct_within_2pct"),
        (F.abs(F.col("am") - F.col("em")) <= F.abs(F.col("em")) * 0.05).alias(
            "median_within_5pct"
        ),
    )


@query(
    "sketch_merge_daily_users",
    """
    SELECT event_type,
           CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS merged_within_2pct
    FROM events GROUP BY event_type
    """,
)
def sketch_merge_daily_users(spark, sf_dir):
    """Incremental distinct counting via MERGEABLE sketches — the pattern
    that makes 100 TB dashboards possible: per-(type, day) Datasketches
    HLL sketches are built ONCE (in production: materialized with each
    day's ingest), and any cross-day distinct count is a sketch UNION —
    history is never rescanned. Here: daily sketches -> hll_union_agg per
    type -> estimate, checked against the exact distinct with the same
    accuracy-contract trick as agg_approx_accuracy (lgConfigK=14 is
    ~0.8% rsd; gate at 2%). The oracle asserts the day/user exact counts
    and literal TRUE."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.hll_sketch_agg("user_id", 14).alias("sk")
    )
    merged = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"),
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("exact_users")
    )
    return merged.join(F.broadcast(exact), "event_type").select(
        "event_type",
        "n_days",
        "exact_users",
        (
            F.abs(F.col("est") - F.col("exact_users"))
            <= F.col("exact_users") * 0.02
        ).alias("merged_within_2pct"),
    )


@query(
    "semi_join_priority_orders",
    """
    SELECT o_orderpriority, count(*) AS n_orders
    FROM orders o
    WHERE EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
)
def semi_join_priority_orders(spark, sf_dir):
    """EXISTS as a left_semi join (TPC-H Q4 shape): orders with at least
    one late-shipping lineitem, counted by priority. Semi joins never
    multiply rows — the probe side streams past the build side once."""
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n_orders"))


@query(
    "case_agg_priority_split",
    """
    SELECT l_returnflag,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    GROUP BY l_returnflag
    """,
)
def case_agg_priority_split(spark, sf_dir):
    """Conditional-sum aggregation over a join (TPC-H Q12 shape): CASE
    folded into the aggregate, so one pass computes both branches."""
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "top10_orders_global",
    """
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 10
    """,
)
def top10_orders_global(spark, sf_dir):
    """Global ORDER BY + LIMIT: Spark plans TakeOrderedAndProject — each
    partition keeps its local top-10, the driver merges k·n_partitions
    rows; no global sort ever materializes. The shape that makes top-N
    over 100 TB cheap."""
    return (
        load(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@query(
    "unpivot_event_matrix",
    """
    WITH m AS (
        SELECT user_id,
               count(*) FILTER (event_type = 'click')    AS click,
               count(*) FILTER (event_type = 'purchase') AS purchase
        FROM events GROUP BY user_id)
    SELECT user_id, kind, n FROM m
    UNPIVOT (n FOR kind IN (click, purchase))
    """,
)
def unpivot_event_matrix(spark, sf_dir):
    """Unpivot (melt) wide columns back to long form via ``stack`` — the
    inverse of pivot, needed whenever feature matrices feed long-format
    consumers."""
    wide = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .pivot("event_type", ["click", "purchase"])
        .count()
        .na.fill(0)
    )
    return wide.selectExpr(
        "user_id", "stack(2, 'click', click, 'purchase', purchase) AS (kind, n)"
    )


@query(
    "part_name_search",
    """
    SELECT p_partkey, p_name, p_brand, p_size, p_retailprice
    FROM part
    WHERE p_name LIKE '%widget%' AND p_size >= 10
    """,
)
def part_name_search(spark, sf_dir):
    """LIKE-pattern + range filter on the part dim. A contains-pattern
    compiles to a StringContains scan filter (pushed to parquet); anchored
    prefixes would push as StartsWith."""
    return (
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%widget%") & (F.col("p_size") >= 10))
        .select("p_partkey", "p_name", "p_brand", "p_size", "p_retailprice")
    )


@query(
    "supplier_balance_by_nation",
    f"""
    SELECT n_name,
           count(*) AS n_suppliers,
           {_cents_sum_sql("s_acctbal")} AS total_balance,
           round(max(s_acctbal), 2) AS max_balance
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def supplier_balance_by_nation(spark, sf_dir):
    """Supplier dim rollup over a broadcast nation join."""
    sup = load(spark, sf_dir, "supplier")
    nat = load(spark, sf_dir, "nation")
    return (
        sup.join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            sum_money(_cents("s_acctbal"), 100.0).alias("total_balance"),
            F.round(F.max("s_acctbal"), 2).alias("max_balance"),
        )
    )


@query(
    "orders_monthly_rollup",
    f"""
    SELECT date_trunc('month', o_orderdate) AS order_month,
           count(*) AS n_orders,
           {_cents_sum_sql("o_totalprice")} AS revenue
    FROM orders
    GROUP BY 1
    """,
)
def orders_monthly_rollup(spark, sf_dir):
    """Calendar bucketing via date_trunc — the partition-friendly time
    rollup (at scale the month usually IS the partition column, making
    this a metadata-only aggregation)."""
    return (
        load(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("month", "o_orderdate").alias("order_month"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            sum_money(_cents("o_totalprice"), 100.0).alias("revenue"),
        )
    )


@query(
    "embedding_vector_stats",
    """
    SELECT vec_id,
           CAST(len(embedding) AS BIGINT) AS dim,
           round(sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x))), 4) AS l2_norm,
           round(list_min(CAST(embedding AS DOUBLE[])), 4) AS min_val,
           round(list_max(CAST(embedding AS DOUBLE[])), 4) AS max_val
    FROM embeddings
    """,
)
def embedding_vector_stats(spark, sf_dir):
    """Per-vector array statistics (dim, L2 norm, min/max) — the array
    function surface (size/aggregate/array_min/array_max) as pure
    codegen-free-rider columns on the scan."""
    emb = load(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    from .operators.dedup import l2_norm_expr

    return emb.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.round(l2_norm_expr(v), 4).alias("l2_norm"),
        F.round(F.array_min(v), 4).alias("min_val"),
        F.round(F.array_max(v), 4).alias("max_val"),
    )


@query(
    "stats_price_quantity",
    """
    SELECT l_returnflag,
           round(corr(l_quantity, l_extendedprice), 4) AS qty_price_corr,
           round(stddev_samp(l_extendedprice), 2) AS price_stddev,
           round(var_samp(l_quantity), 4) AS qty_variance
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def stats_price_quantity(spark, sf_dir):
    """Statistical aggregates (Pearson correlation, sample stddev/variance)
    per group — single-pass co-moment accumulation, one shuffle."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("qty_price_corr"),
        F.round(F.stddev_samp("l_extendedprice"), 2).alias("price_stddev"),
        F.round(F.var_samp("l_quantity"), 4).alias("qty_variance"),
    )


@query(
    "rolling_24h_user_value",
    """
    WITH x AS (
        SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS t,
               CAST(round(value * 100) AS BIGINT) AS cents
        FROM events)
    SELECT event_id, user_id,
           CAST(count(*) OVER w AS BIGINT) AS n_24h,
           round(CAST(sum(cents) OVER w AS BIGINT) / 100.0, 2) AS value_24h
    FROM x
    WINDOW w AS (
        PARTITION BY user_id ORDER BY t
        RANGE BETWEEN INTERVAL 24 HOUR PRECEDING AND CURRENT ROW)
    """,
)
def rolling_24h_user_value(spark, sf_dir):
    """Time-RANGE window frame: per event, the user's trailing-24h event
    count and value total. rangeBetween over epoch seconds — the frame is
    defined by TIME distance, not row counts, which row-frame windows
    can't express. The dollar values are summed as exact integer cents
    (doubles accumulate in engine-specific orders inside window frames;
    cents are associative-exact, see orders_above_customer_avg)."""
    ev = load(spark, sf_dir, "events")
    x = ev.select(
        "event_id",
        "user_id",
        F.col("ts").cast("timestamp").alias("t"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("t")))
        .rangeBetween(-24 * 3600 * 1_000_000, 0)
    )
    return x.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).cast("long").alias("n_24h"),
        F.round(F.sum("cents").over(w) / 100.0, 2).alias("value_24h"),
    )


@query(
    "gapfill_hourly_counts",
    """
    WITH bounds AS (
        SELECT date_trunc('hour', min(CAST(ts AS TIMESTAMP))) AS h0,
               date_trunc('hour', max(CAST(ts AS TIMESTAMP))) AS h1
        FROM events),
    grid AS (
        SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour_ts
        FROM bounds),
    types AS (SELECT DISTINCT event_type FROM events),
    actual AS (
        SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour_ts, event_type,
               count(*) AS n
        FROM events GROUP BY 1, 2)
    SELECT g.hour_ts, t.event_type,
           CAST(coalesce(a.n, 0) AS BIGINT) AS n_events
    FROM grid g CROSS JOIN types t
    LEFT JOIN actual a ON a.hour_ts = g.hour_ts AND a.event_type = t.event_type
    """,
)
def gapfill_hourly_counts(spark, sf_dir):
    """Time-series gap filling: a dense hour x event_type grid with zeros
    where nothing happened (downstream rolling/anomaly jobs need explicit
    zeros). The grid is sequence()+explode from the aggregated bounds —
    a 1-row cross join, so the only real shuffle is the count itself."""
    ev = load(spark, sf_dir, "events")
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    grid = bounds.select(
        F.explode(F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))).alias("hour_ts")
    )
    types = ev.select("event_type").distinct()
    actual = ev.groupBy(
        F.date_trunc("hour", "ts").alias("hour_ts"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    return (
        grid.crossJoin(F.broadcast(types))
        .join(F.broadcast(actual), ["hour_ts", "event_type"], "left")
        .select(
            "hour_ts",
            "event_type",
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_events"),
        )
    )


@query(
    "grouping_sets_revenue",
    f"""
    SELECT l_returnflag, l_linestatus,
           CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS BIGINT) AS gid,
           {rev_sum_sql()} AS revenue
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
)
def grouping_sets_revenue(spark, sf_dir):
    """Explicit GROUPING SETS (the general form under cube/rollup) +
    grouping() to disambiguate real NULLs from subtotal rows — one Expand
    node, one shuffle for all three sets. The exact integer revenue is
    computed in a subquery BEFORE the grouping sets (see cube_revenue:
    Expand re-evaluates agg-input expressions once per set). 100.0D, not
    100.0 — Spark SQL parses a plain decimal literal as DECIMAL and the
    division would silently turn the column decimal(24,2), which the
    gate canonicalizer hashes differently from the oracle's double. The
    half-cent tie offset runs in DECIMAL(38,0) integer space, the SQL
    twin of queries.sum_money (r14: the r13 double-space offset capped
    exactness at 2^53 e4-units; this was the one converted query whose
    inline SQL still carried it)."""
    li = load(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("li_gs")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS BIGINT) AS gid,
               round(CAST(floor((CAST(sum(e4) AS DECIMAL(38,0)) + 50) / 100)
                          AS DOUBLE) / 100.0D, 2) AS revenue
        FROM (
            SELECT l_returnflag, l_linestatus,
                   CAST(round(l_extendedprice * 100) AS BIGINT)
                   * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS e4
            FROM li_gs)
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """
    )


@query(
    "first_last_event_per_user",
    """
    WITH x AS (
        SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS t,
               printf('%016d-%010d', epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS k
        FROM events)
    SELECT user_id,
           arg_min(event_type, k) AS first_type,
           arg_max(event_type, k) AS last_type,
           min(t) AS first_ts,
           max(t) AS last_ts
    FROM x GROUP BY user_id
    """,
)
def first_last_event_per_user(spark, sf_dir):
    """min_by/max_by (argmin/argmax) aggregates: each user's first and last
    event type in one pass — no self-join, no window sort. The order key is
    a zero-padded '(epoch_us)-(event_id)' string, lexicographically equal
    to the (ts, event_id) composite in both engines (tuple-valued arg_min
    isn't portable)."""
    ev = load(spark, sf_dir, "events")
    key = F.format_string("%016d-%010d", F.unix_micros(F.col("ts").cast("timestamp")), F.col("event_id"))
    return ev.groupBy("user_id").agg(
        F.min_by("event_type", key).alias("first_type"),
        F.max_by("event_type", key).alias("last_type"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    )


@query(
    "funnel_signup_click_purchase",
    """
    WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS t FROM events),
    s AS (
        SELECT user_id,
               min(CASE WHEN event_type = 'signup' THEN t END) AS signup_ts
        FROM e GROUP BY user_id),
    c AS (
        SELECT s.user_id, s.signup_ts,
               min(CASE WHEN e.event_type = 'click' AND e.t > s.signup_ts THEN e.t END)
                   AS first_click_ts
        FROM s JOIN e USING (user_id)
        GROUP BY s.user_id, s.signup_ts),
    p AS (
        SELECT c.user_id, c.signup_ts, c.first_click_ts,
               min(CASE WHEN e.event_type = 'purchase' AND e.t > c.first_click_ts THEN e.t END)
                   AS first_purchase_ts
        FROM c JOIN e USING (user_id)
        GROUP BY c.user_id, c.signup_ts, c.first_click_ts)
    SELECT * FROM p WHERE signup_ts IS NOT NULL
    """,
)
def funnel_signup_click_purchase(spark, sf_dir):
    """Ordered funnel: first signup -> first click AFTER it -> first
    purchase AFTER that, per user. Each stage is a conditional min that
    depends on the previous stage's timestamp, so it's two re-join+agg
    passes over the (already small) per-user frontier — never a window
    sort over the raw events. NULL stages propagate (no click => no
    purchase counted), identical three-valued logic in both engines."""
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_type", F.col("ts").alias("t")
    )
    s = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("t"))).alias("signup_ts")
    )
    c = (
        s.join(ev, "user_id")
        .groupBy("user_id", "signup_ts")
        .agg(
            F.min(
                F.when(
                    (F.col("event_type") == "click") & (F.col("t") > F.col("signup_ts")),
                    F.col("t"),
                )
            ).alias("first_click_ts")
        )
    )
    p = (
        c.join(ev, "user_id")
        .groupBy("user_id", "signup_ts", "first_click_ts")
        .agg(
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("t") > F.col("first_click_ts")),
                    F.col("t"),
                )
            ).alias("first_purchase_ts")
        )
    )
    return p.filter(F.col("signup_ts").isNotNull())


def _zorder_oracle() -> str:
    from .operators.layout import morton_code_sql

    code = morton_code_sql(["x", "y"], bits=10)
    return f"""
    WITH q AS (
        SELECT event_id,
               user_id % 1024 AS x,
               (epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000) % 1024 AS y
        FROM events)
    SELECT event_id, x, y, {code} AS zcode FROM q
    """


@query("zorder_morton_codes", _zorder_oracle())
def zorder_morton_codes(spark, sf_dir):
    """Morton/Z-curve codes over (user bucket, hour bucket)
    (operators/layout.py): the clustering key that makes parquet min/max
    stats prune on BOTH columns after zorder_write. Pure bit-interleave
    projection — bit-exact against the SQL twin."""
    from .operators.layout import morton_code

    ev = load(spark, sf_dir, "events")
    q = ev.select(
        "event_id",
        (F.col("user_id") % 1024).alias("x"),
        (F.expr("unix_micros(cast(ts as timestamp)) div 3600000000") % 1024).alias("y"),
    )
    return q.select("event_id", "x", "y", morton_code([F.col("x"), F.col("y")], 10).alias("zcode"))


@query(
    "dq_orders_expectations",
    """
    WITH a AS (
        SELECT count(*) AS n_rows,
               CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS c_key,
               CAST(sum(CASE WHEN o_totalprice IS NULL OR (o_totalprice >= 0.0 AND o_totalprice <= 1000000.0) THEN 0 ELSE 1 END) AS BIGINT) AS c_price,
               CAST(sum(CASE WHEN o_orderstatus IS NULL OR regexp_matches(o_orderstatus, '^[OFP]$') THEN 0 ELSE 1 END) AS BIGINT) AS c_status,
               CAST(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS c_date
        FROM orders),
    s AS (
        SELECT 'o_orderkey_not_null' AS check_name, n_rows, c_key AS n_violations FROM a
        UNION ALL SELECT 'o_totalprice_in_range', n_rows, c_price FROM a
        UNION ALL SELECT 'o_orderstatus_matches', n_rows, c_status FROM a
        UNION ALL SELECT 'o_orderdate_not_null', n_rows, c_date FROM a)
    SELECT check_name, n_rows, n_violations,
           CAST(floor(n_violations * 10000 / n_rows) AS BIGINT) AS violation_rate_bp
    FROM s
    """,
)
def dq_orders_expectations(spark, sf_dir):
    """Expectations suite over orders (operators/quality.py): every
    row-level check folds into ONE aggregation pass (conditional sums),
    then stack()s into a per-check report. Rates in integer basis points
    — exact cross-engine, no float division."""
    from .operators import quality as Q

    orders = load(spark, sf_dir, "orders")
    return Q.run_checks(
        orders,
        [
            Q.not_null("o_orderkey"),
            Q.in_range("o_totalprice", 0.0, 1_000_000.0),
            Q.matches("o_orderstatus", "^[OFP]$"),
            Q.not_null("o_orderdate"),
        ],
    )


@query(
    "dq_fk_orphan_events",
    """
    SELECT user_id, count(*) AS n_rows
    FROM events e
    WHERE user_id IS NOT NULL
      AND NOT EXISTS (
          SELECT 1 FROM customer c
          WHERE c.c_custkey = e.user_id AND c.c_acctbal >= 0)
    GROUP BY user_id
    """,
)
def dq_fk_orphan_events(spark, sf_dir):
    """Referential-integrity audit: events whose user has no row in the
    in-good-standing account dim (c_acctbal >= 0) — a broadcast LEFT ANTI
    join on the (small, distinct) parent key set, aggregated per orphan
    key. (The raw events->customer FK is clean in this dataset; auditing
    against the restricted dim is what makes the check discriminating.)"""
    from .operators.quality import fk_violations

    ev = load(spark, sf_dir, "events")
    cust = load(spark, sf_dir, "customer").filter(F.col("c_acctbal") >= 0)
    orphans = fk_violations(ev, "user_id", cust, "c_custkey")
    return orphans.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_rows"))


@query(
    "scd2_customer_versions",
    """
    WITH c AS (SELECT c_custkey, c_name, c_acctbal FROM customer),
    unchanged AS (
        SELECT c_custkey, c_name, c_acctbal,
               TIMESTAMP '2024-01-01' AS valid_from,
               TIMESTAMP '2200-01-01' AS valid_to,
               true AS is_current
        FROM c WHERE c_custkey % 10 <> 0),
    closed AS (
        SELECT c_custkey, c_name, c_acctbal,
               TIMESTAMP '2024-01-01', TIMESTAMP '2024-02-01', false
        FROM c WHERE c_custkey % 10 = 0),
    opened AS (
        SELECT c_custkey, c_name, c_acctbal + 100, TIMESTAMP '2024-02-01',
               TIMESTAMP '2200-01-01', true
        FROM c WHERE c_custkey % 10 = 0)
    SELECT * FROM unchanged
    UNION ALL SELECT * FROM closed
    UNION ALL SELECT * FROM opened
    """,
)
def scd2_customer_versions(spark, sf_dir):
    """SCD Type 2 end-to-end (operators/scd2.py): bootstrap the customer
    dim, then apply a batch that bumps every 10th customer's balance —
    changed keys get a closed version + an open one, unchanged keys are
    NOT re-versioned. The oracle declares the expected version table
    directly, so the operator's change detection, closing and opening
    logic are all checked against the spec rather than a reimplementation."""
    from .operators.scd2 import scd2_apply, scd2_init

    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_acctbal")
    batch = cust.withColumn(
        "c_acctbal",
        F.when(F.col("c_custkey") % 10 == 0, F.col("c_acctbal") + 100).otherwise(
            F.col("c_acctbal")
        ),
    )
    dim = scd2_init(cust, "2024-01-01 00:00:00")
    return scd2_apply(
        dim, batch, "c_custkey", ["c_name", "c_acctbal"], "2024-02-01 00:00:00"
    )


@query(
    "table_diff_customer_batches",
    """
    WITH old AS (SELECT * FROM customer),
    new AS (
        SELECT c_custkey,
               c_name,
               CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 50 ELSE c_acctbal END AS c_acctbal,
               c_nationkey, c_mktsegment
        FROM customer WHERE c_custkey % 11 <> 0
        UNION ALL
        SELECT c_custkey + 1000000, c_name, c_acctbal, c_nationkey, c_mktsegment
        FROM customer WHERE c_custkey % 13 = 0)
    SELECT * FROM (
    SELECT coalesce(o.c_custkey, n.c_custkey) AS c_custkey,
           CASE WHEN o.c_custkey IS NULL THEN 'added'
                WHEN n.c_custkey IS NULL THEN 'removed'
                WHEN o.c_name <> n.c_name OR o.c_acctbal <> n.c_acctbal
                     OR o.c_nationkey <> n.c_nationkey
                     OR o.c_mktsegment <> n.c_mktsegment THEN 'changed'
                ELSE 'unchanged' END AS change_type
    FROM old o FULL OUTER JOIN new n ON o.c_custkey = n.c_custkey
    ) t WHERE change_type <> 'unchanged'
    """,
)
def table_diff_customer_batches(spark, sf_dir):
    """Snapshot reconciliation (operators/diff.py): old = customer; new =
    customer with every 11th key dropped (removed), every 7th balance
    bumped (changed) and every 13th cloned to a fresh key (added). One
    full-outer join on md5 fingerprints classifies every key; the oracle
    does the same classification by comparing columns directly, so the
    fingerprint shortcut is checked against literal column equality."""
    from .operators.diff import table_diff

    cust = load(spark, sf_dir, "customer")
    new = cust.filter(F.col("c_custkey") % 11 != 0).withColumn(
        "c_acctbal",
        F.when(F.col("c_custkey") % 7 == 0, F.col("c_acctbal") + 50).otherwise(
            F.col("c_acctbal")
        ),
    )
    clones = cust.filter(F.col("c_custkey") % 13 == 0).withColumn(
        "c_custkey", F.col("c_custkey") + 1_000_000
    )
    return table_diff(cust, new.unionByName(clones), key="c_custkey")


@query(
    "order_price_distribution",
    """
    WITH x AS (
        SELECT o_orderkey,
               CAST(ntile(10) OVER w AS BIGINT) AS decile,
               row_number() OVER w AS r,
               count(*) OVER () AS n
        FROM orders
        WINDOW w AS (ORDER BY o_totalprice, o_orderkey))
    SELECT o_orderkey, decile,
           CASE WHEN n > 1
                THEN CAST((20000 * (r - 1) + (n - 1)) // (2 * (n - 1))
                          AS DOUBLE) / 10000.0
                ELSE 0.0 END AS pct_rank,
           CAST((20000 * r + n) // (2 * n) AS DOUBLE) / 10000.0 AS cume
    FROM x
    """,
)
def order_price_distribution(spark, sf_dir):
    """Distribution window functions (ntile/percent_rank/cume_dist) over a
    deterministic total order (price, key) — WITHOUT the single-task
    global window (`Window.orderBy` with no partition key was round 2's
    named scale-killer: one task sorts the whole table).

    Two-level instead (operators/packing.global_row_ranks): range-
    partition by the ordering key, per-partition parallel row_number,
    plus cumulative partition-count offsets = exact global rank. The
    ordering (price, key) is unique, so every peer group is a singleton
    and the distribution functions collapse to rank arithmetic:
    ntile(10) = SQL-standard uneven-bucket formula over (r, n),
    percent_rank = (r-1)/(n-1), cume_dist = r/n.

    The 4dp rounding of those ratios runs in INTEGER space —
    ``(20000*p + q) div (2*q)`` is round-half-up(p/q, 4) computed
    exactly — because ``round(r/n, 4)`` on the double hits the same
    cross-engine tie divergence as the money half-cent: the r14 sf1.0
    sweep (n = 1.5M, a clean divisor) caught 573 rows where r/n sits
    exactly on a 5e-5 boundary and Spark (HALF_UP on the decimal repr)
    and DuckDB (binary-faithful) rounded opposite ways. Ties land
    toward +inf in both engines by the same arithmetic. Overflow: the
    20000*r product caps at ~4.6e14 input rows — far past any orders
    cardinality (100 TB ~ 1e12 rows)."""
    from .operators.packing import global_row_ranks

    ranked = global_row_ranks(
        load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice"),
        ["o_totalprice", "o_orderkey"],
        rank_col="r",
        count_col="n",
    )
    r, n = F.col("r"), F.col("n")
    q, rem = F.expr("n div 10"), n % 10
    decile = F.when(
        r <= rem * (q + 1), F.expr("(r - 1) div ((n div 10) + 1) + 1")
    ).otherwise(rem + F.expr("(r - (n % 10) * ((n div 10) + 1) - 1) div (n div 10) + 1"))
    pct_rank4 = F.expr("(20000 * (r - 1) + (n - 1)) div (2 * (n - 1))")
    cume4 = F.expr("(20000 * r + n) div (2 * n)")
    return ranked.select(
        "o_orderkey",
        decile.cast("long").alias("decile"),
        F.when(n > 1, pct_rank4.cast("double") / 10000.0)
        .otherwise(0.0)
        .alias("pct_rank"),
        (cume4.cast("double") / 10000.0).alias("cume"),
    )


@query(
    "q3_shipping_priority",
    f"""
    SELECT o.o_orderkey,
           {rev_sum_sql("l.")} AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING' AND o.o_orderstatus = 'O'
    GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape: 3-table join (customer filter broadcast into the
    fact join), grouped revenue, global top-10 — Catalyst plans the limit
    as TakeOrderedAndProject, never a full result sort."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    li = load(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(sum_money(rev_e4()).alias("revenue"))
        .select("o_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@query(
    "q22_idle_rich_customers",
    f"""
    WITH avg_bal AS (
        SELECT CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS DOUBLE)
               / count(*) / 100.0 AS a
        FROM customer WHERE c_acctbal > 0)
    SELECT c.c_nationkey, count(*) AS n_customers,
           round(CAST(sum(CAST(round(c.c_acctbal * 100) AS BIGINT)) AS DOUBLE)
                 / 100.0, 2) AS total_balance
    FROM customer c, avg_bal
    WHERE c.c_acctbal > avg_bal.a
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    GROUP BY c.c_nationkey
    """,
)
def q22_idle_rich_customers(spark, sf_dir):
    """TPC-H Q22 shape: scalar subquery (global average, broadcast as a
    1-row cross join) + anti join against orders + aggregate — the
    decorrelation pattern Catalyst needs for EXISTS-free plans. The anti
    side is restricted to urgent orders so the result is non-trivial (every
    customer in this dataset has SOME order)."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        # exact average: integer cents sum / count, ONE terminal float
        # division — a double avg() is summation-order-dependent and a
        # customer sitting exactly on the boundary could flip engines
        (
            F.sum(_cents("c_acctbal")).cast("double")
            / F.count(F.lit(1)) / 100.0
        ).alias("a")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(
            orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey"),
            cust.c_custkey == F.col("o_custkey"),
            "left_anti",
        )
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            sum_money(_cents("c_acctbal"), 100.0).alias("total_balance"),
        )
    )


@query(
    "calendar_dim",
    """
    WITH days AS (
        SELECT unnest(generate_series(DATE '2024-01-01', DATE '2024-12-31',
                                      INTERVAL 1 DAY)) AS d)
    SELECT CAST(d AS TIMESTAMP) AS date_key,
           CAST(year(d) AS BIGINT) AS year,
           CAST(quarter(d) AS BIGINT) AS quarter,
           CAST(month(d) AS BIGINT) AS month,
           CAST(isodow(d) AS BIGINT) AS iso_dow,
           CAST(weekofyear(d) AS BIGINT) AS iso_week,
           isodow(d) >= 6 AS is_weekend,
           CAST(date_trunc('month', d) AS TIMESTAMP) AS month_start
    FROM days
    """,
)
def calendar_dim(spark, sf_dir):
    """Generated calendar dimension (one year of date attributes) — the
    standard broadcast-side table for date-logic joins, built from
    sequence() with zero input scans. ISO day/week numbering matches
    across engines (dayofweek does NOT: Spark is Sunday=1)."""
    days = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("2024-01-01").cast("date"),
                F.lit("2024-12-31").cast("date"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("d")
    )
    return days.select(
        F.col("d").cast("timestamp").alias("date_key"),
        F.year("d").cast("long").alias("year"),
        F.quarter("d").cast("long").alias("quarter"),
        F.month("d").cast("long").alias("month"),
        F.dayofweek("d").cast("long").alias("iso_dow"),  # fixed below
        F.weekofyear("d").cast("long").alias("iso_week"),
        F.lit(False).alias("is_weekend"),
        F.trunc("d", "month").cast("timestamp").alias("month_start"),
    ).select(
        "date_key",
        "year",
        "quarter",
        "month",
        # Spark dayofweek: Sunday=1..Saturday=7 -> ISO Monday=1..Sunday=7
        ((F.col("iso_dow") + 5) % 7 + 1).alias("iso_dow"),
        "iso_week",
        (((F.col("iso_dow") + 5) % 7 + 1) >= 6).alias("is_weekend"),
        "month_start",
    )


@query(
    "histogram_order_prices",
    """
    WITH b AS (
        SELECT CAST(least(floor(o_totalprice / 50000.0), 9) AS BIGINT) AS bucket,
               o_totalprice
        FROM orders)
    SELECT bucket,
           bucket * 50000.0 AS bucket_lo,
           count(*) AS n_orders,
           round(min(o_totalprice), 2) AS min_price,
           round(max(o_totalprice), 2) AS max_price
    FROM b GROUP BY bucket
    """,
)
def histogram_order_prices(spark, sf_dir):
    """Fixed-width histogram (50k buckets, top-clamped) of order prices —
    the single-shuffle profile that drives partition sizing and skew
    decisions; integer bucket math, no float boundary ambiguity."""
    orders = load(spark, sf_dir, "orders")
    bucket = F.least(F.floor(F.col("o_totalprice") / 50000.0), F.lit(9)).cast("long")
    return (
        orders.select(bucket.alias("bucket"), "o_totalprice")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
        )
        .select(
            "bucket",
            (F.col("bucket") * 50000.0).alias("bucket_lo"),
            "n_orders",
            "min_price",
            "max_price",
        )
    )


@query(
    "skew_key_profile_events",
    """
    WITH counts AS (SELECT user_id, count(*) AS n FROM events GROUP BY user_id),
    t AS (SELECT CAST(sum(n) AS BIGINT) AS total_rows, count(*) AS n_keys FROM counts)
    SELECT user_id, n,
           CAST(floor(n * 10000 / t.total_rows) AS BIGINT) AS share_bp,
           CAST(floor(n * t.n_keys * 10000 / t.total_rows) AS BIGINT) AS ratio_to_avg_bp,
           CAST(row_number() OVER (ORDER BY n DESC, user_id) AS BIGINT) AS rank
    FROM counts, t
    QUALIFY row_number() OVER (ORDER BY n DESC, user_id) <= 10
    """,
)
def skew_key_profile_events(spark, sf_dir):
    """Key-distribution diagnosis (operators/skew.key_profile): top-10
    users by event count with exact basis-point shares and
    ratio-to-average — the measurement that decides between plain join,
    AQE skew handling, and explicit salting (skew_salted_join)."""
    from .operators.skew import key_profile

    return key_profile(load(spark, sf_dir, "events"), "user_id", top_n=10)


@query(
    "cohort_weekly_retention",
    """
    WITH u AS (SELECT user_id,
                      date_trunc('week', CAST(ts AS TIMESTAMP)) AS wk
               FROM events),
    f AS (SELECT user_id, min(wk) AS cohort_wk FROM u GROUP BY 1),
    a AS (SELECT DISTINCT user_id, wk FROM u)
    SELECT f.cohort_wk,
           CAST(datediff('day', f.cohort_wk, a.wk) // 7 AS BIGINT) AS week_offset,
           CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_active
    FROM a JOIN f USING (user_id)
    GROUP BY 1, 2
    """,
)
def cohort_weekly_retention(spark, sf_dir):
    """Weekly cohort retention matrix: users grouped by first-activity
    week, counted distinct in every later week they return. Two shuffles
    (first-week per user; cohort x offset count-distinct) — at 100 TB
    the (user, week) activity set is pre-deduped map-side before either,
    and both engines truncate weeks to ISO Monday so the offset is exact
    integer day-arithmetic / 7."""
    ev = load(spark, sf_dir, "events")
    u = ev.select("user_id", F.date_trunc("week", F.col("ts")).alias("wk"))
    first = u.groupBy("user_id").agg(F.min("wk").alias("cohort_wk"))
    act = u.distinct()
    j = act.join(first, "user_id")
    return (
        j.groupBy(
            "cohort_wk",
            (F.datediff(F.col("wk"), F.col("cohort_wk")) / 7)
            .cast("long")
            .alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").cast("long").alias("n_active"))
    )


# ---------------------------------------------------------------------------
# Modern Spark SQL surface: recursive CTEs, VARIANT semi-structured type
# ---------------------------------------------------------------------------

@query(
    "order_burst_components",
    """
    WITH x AS (
        SELECT o_custkey AS c, o_orderkey AS k, o_orderdate AS d,
               CASE WHEN lag(o_orderdate) OVER w IS NULL
                         OR date_diff('day', lag(o_orderdate) OVER w,
                                      o_orderdate) > 30
                    THEN 1 ELSE 0 END AS nb
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)),
    y AS (SELECT c, k, d,
                 sum(nb) OVER (PARTITION BY c ORDER BY d, k
                               ROWS UNBOUNDED PRECEDING) AS g
          FROM x),
    z AS (SELECT c, k, d, g,
                 -- burst label = the ROOT order's key (first by date, not
                 -- min key): matches the recursion's anchor exactly
                 first_value(k) OVER (PARTITION BY c, g ORDER BY d, k) AS bid
          FROM y)
    SELECT c AS o_custkey, CAST(bid AS BIGINT) AS burst_id,
           count(*) AS n_orders,
           CAST(min(d) AS VARCHAR) AS burst_start,
           CAST(max(d) AS VARCHAR) AS burst_end
    FROM z GROUP BY c, g, bid
    """,
)
def order_burst_components(spark, sf_dir):
    """Order "bursts": chains of same-customer orders each placed within
    30 days of the previous one, labeled by the first order key in the
    chain — connected components of a per-customer path graph, computed
    LEVEL-SYNCHRONOUSLY (r16, VERDICT r15 order 7): anchor = burst
    roots, then one join per level walks the lag-edge until the
    frontier empties, exactly the fixpoint the previous WITH RECURSIVE
    form ran inside the recursive-CTE executor. The driver-side loop
    replaces the executor's union-buffered fixpoint; measured A/B
    (interleaved, same ruler): sf0.1 CPU 1.6 -> 1.27 s/run (−20%),
    shuffle 10.4 -> 7.2 MB (−30%); sf1.0 CPU 33.2 -> 20.7 (−38%),
    shuffle 127.6 -> 94.3 MB (−26%), output row-identical at both SFs
    (exceptAll both ways = 0). It also retires the
    spark.sql.cteRecursionRowLimit save/restore machinery entirely —
    the CTE executor's TOTAL-row cap (not a level cap) needed scaling
    to the input (r14 hit it at 1.5M orders), the raise leaked
    session-globally in r14, and the r15 scoping fix forced an eager
    materialization; the loop needs none of that (the level guard is
    the frontier's monotone shrink — 6 levels, 15982 -> 8 rows at
    sf0.1). The recursive-CTE twin lives on in
    tests/test_conf_hygiene.py, value-asserted equal, so WITH RECURSIVE
    executor semantics stay pinned by the suite. The oracle is the
    closed-form gaps-and-islands window formulation — independent
    non-recursive math. At 100 TB prefer that window formulation
    outright (one shuffle, no iteration); among iterative forms the
    level-sync loop is the one that scales (per-level state = one
    frontier, no cross-level union buffer).
    """
    # Materialize the lag-edge relation ONCE before iterating: every
    # level joins against it, and an un-checkpointed frame would re-run
    # the per-customer window (a full shuffle+sort) per level —
    # measured 3.4s -> ~1.4s at sf0.1 when this landed for the CTE form.
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    edges = (
        load(spark, sf_dir, "orders")
        .select(
            F.col("o_custkey").alias("c"),
            F.col("o_orderkey").alias("k"),
            F.col("o_orderdate").alias("d"),
            F.lag("o_orderdate").over(w).alias("pd"),
            F.lag("o_orderkey").over(w).alias("pk"),
        )
        .localCheckpoint()
    )
    # Chain-interior orders only: each level probes this (shrinking
    # frontiers broadcast against it under AQE). Lazy checkpoint — the
    # first level materializes it once off the eager edges checkpoint.
    step = (
        edges.filter("pd IS NOT NULL AND datediff(d, pd) <= 30")
        .select("c", "k", "d", "pk")
        .localCheckpoint(eager=False)
    )
    frontier = (
        edges.filter("pd IS NULL OR datediff(d, pd) > 30")
        .select("c", "k", "d", F.col("k").alias("root"))
        .localCheckpoint()
    )
    levels = [frontier]
    while True:
        # Eager per-level checkpoint: bounds each level's plan to ONE
        # join (no lineage growth), and isEmpty() then reads the
        # materialized result instead of re-running the level.
        nxt = (
            step.alias("e")
            .join(
                frontier.alias("ch"),
                (F.col("e.c") == F.col("ch.c"))
                & (F.col("e.pk") == F.col("ch.k")),
            )
            .select(
                F.col("e.c").alias("c"),
                F.col("e.k").alias("k"),
                F.col("e.d").alias("d"),
                F.col("ch.root").alias("root"),
            )
            .localCheckpoint()
        )
        if nxt.isEmpty():
            break
        levels.append(nxt)
        frontier = nxt
    chain = reduce(lambda a, b: a.unionByName(b), levels)
    return chain.groupBy(
        F.col("c").alias("o_custkey"),
        F.col("root").cast("bigint").alias("burst_id"),
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.min("d").cast("timestamp").cast("string").alias("burst_start"),
        F.max("d").cast("timestamp").cast("string").alias("burst_end"),
    )


@query(
    "variant_props_stats",
    """
    SELECT event_type,
           count(*) AS n_events,
           CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
               AS sum_k,
           CAST(max(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
               AS max_k
    FROM events
    GROUP BY event_type
    """,
)
def variant_props_stats(spark, sf_dir):
    """Schemaless JSON via Spark 4's VARIANT type: ``parse_json`` once
    into a binary variant, then typed ``variant_get`` path extraction —
    the modern replacement for per-path ``get_json_object`` string
    re-parsing (json_extract_props) when payload shapes drift. The parse
    happens JVM-side in the scan projection; the aggregation shuffles
    only (event_type, k)."""
    ev = load(spark, sf_dir, "events")
    k = F.expr("variant_get(parse_json(props), '$.k', 'bigint')")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").cast("long").alias("sum_k"),
            F.max("k").cast("long").alias("max_k"),
        )
    )


@query(
    "rfm_customer_segments",
    f"""
    WITH m AS (
        SELECT o_custkey AS custkey,
               max(o_orderdate) AS recency,
               CAST(count(*) AS BIGINT) AS frequency,
               {_cents_sum_sql("o_totalprice")} AS monetary
        FROM orders GROUP BY o_custkey)
    SELECT custkey, recency, frequency, monetary,
           CAST(ntile(4) OVER (ORDER BY recency DESC, custkey) AS BIGINT) AS r_quartile,
           CAST(ntile(4) OVER (ORDER BY frequency DESC, custkey) AS BIGINT) AS f_quartile,
           CAST(ntile(4) OVER (ORDER BY monetary DESC, custkey) AS BIGINT) AS m_quartile,
           CAST(ntile(4) OVER (ORDER BY recency DESC, custkey) * 100
              + ntile(4) OVER (ORDER BY frequency DESC, custkey) * 10
              + ntile(4) OVER (ORDER BY monetary DESC, custkey) AS BIGINT) AS rfm_segment
    FROM m
    """,
)
def rfm_customer_segments(spark, sf_dir):
    """RFM customer segmentation (recency / frequency / monetary
    quartiles). The oracle uses naive global ``ntile(4)`` windows; the
    Spark side deliberately does NOT — each quartile comes from
    packing.global_row_ranks (range-partition + 32-row offset collect +
    per-partition row_number) and packing.ntile_from_rank's pure
    arithmetic, so no stage ever funnels the customer table through one
    task. Three ranked passes over a dimension-sized aggregate, exact
    NTILE semantics, linear at 100 TB."""
    from .operators.packing import global_row_ranks, ntile_from_rank

    o = load(spark, sf_dir, "orders")
    m = o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.max("o_orderdate").alias("recency"),
        F.count(F.lit(1)).cast("long").alias("frequency"),
        sum_money(_cents("o_totalprice"), 100.0).alias("monetary"),
    ).localCheckpoint(eager=False)  # 7 evaluations otherwise: each of the
    # three rank passes reads it twice (offsets probe + ranked output)
    # plus the final join spine — the orders scan+aggregate must run once
    out = m
    for metric, name in [("recency", "r_quartile"), ("frequency", "f_quartile"),
                         ("monetary", "m_quartile")]:
        ranked = global_row_ranks(
            m.select("custkey", metric),
            [F.col(metric).desc(), F.col("custkey").asc()],
        )
        q = ranked.select(
            "custkey", ntile_from_rank(F.col("__rank"), F.col("__n"), 4).alias(name)
        )
        out = out.join(q, "custkey")
    return out.withColumn(
        "rfm_segment",
        (F.col("r_quartile") * 100 + F.col("f_quartile") * 10 + F.col("m_quartile")).cast("long"),
    )


@query(
    "markov_event_transitions",
    """
    WITH seq AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        FROM events),
    pairs AS (
        SELECT prev_type, event_type AS next_type, CAST(count(*) AS BIGINT) AS n
        FROM seq WHERE prev_type IS NOT NULL
        GROUP BY prev_type, event_type)
    SELECT prev_type, next_type, n,
           CAST(floor(10000.0 * n / sum(n) OVER (PARTITION BY prev_type)) AS BIGINT)
               AS prob_bp
    FROM pairs
    """,
)
def markov_event_transitions(spark, sf_dir):
    """First-order Markov transition matrix over per-user event
    sequences: lag window keyed by user (parallel — no global window),
    then a count aggregation over the 5x5 state space and transition
    probabilities in integer basis points (floor(10000*n/total) — no
    float rounding, engines agree exactly). The per-user sequence shuffle
    is the only corpus-scale exchange; everything after runs on the
    state-pair table."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    w_prev = Window.partitionBy("prev_type")
    return pairs.withColumn(
        "prob_bp",
        F.floor(F.lit(10000.0) * F.col("n") / F.sum("n").over(w_prev)).cast("long"),
    )


@query(
    "cdc_apply_orders",
    """
    WITH ins AS (
        SELECT o_orderkey, o_custkey, o_orderstatus,
               o_totalprice AS price, 0 AS seq, 'I' AS op
        FROM orders),
    upd AS (
        SELECT o_orderkey, o_custkey, 'X' AS o_orderstatus,
               round(o_totalprice + 500.0, 2) AS price, 1 AS seq, 'U' AS op
        FROM orders WHERE o_orderkey % 3 = 0),
    del AS (
        SELECT o_orderkey, o_custkey, o_orderstatus,
               o_totalprice AS price, 2 AS seq, 'D' AS op
        FROM orders WHERE o_orderkey % 7 = 0),
    ch AS (
        SELECT * FROM ins UNION ALL SELECT * FROM upd UNION ALL SELECT * FROM del),
    latest AS (
        SELECT *, row_number() OVER (PARTITION BY o_orderkey ORDER BY seq DESC) AS rn
        FROM ch)
    SELECT o_orderkey, o_custkey, o_orderstatus, price
    FROM latest WHERE rn = 1 AND op <> 'D'
    """,
)
def cdc_apply_orders(spark, sf_dir):
    """CDC change-feed materialization (operators/merge.cdc_apply): a
    Debezium/Delta-CDF-shaped log of I/U/D operations folded into final
    table state — latest op per key wins, delete-last keys dropped. The
    feed here is derived deterministically from orders (insert all,
    update every 3rd key, delete every 7th) so the oracle replays the
    identical log in SQL. One key-hash shuffle + short per-key window;
    no global ordering anywhere."""
    from .operators.merge import cdc_apply

    o = load(spark, sf_dir, "orders")
    ins = o.select(
        "o_orderkey", "o_custkey", "o_orderstatus",
        F.col("o_totalprice").alias("price"),
        F.lit(0).alias("seq"), F.lit("I").alias("op"),
    )
    upd = o.filter(F.col("o_orderkey") % 3 == 0).select(
        "o_orderkey", "o_custkey", F.lit("X").alias("o_orderstatus"),
        F.round(F.col("o_totalprice") + 500.0, 2).alias("price"),
        F.lit(1).alias("seq"), F.lit("U").alias("op"),
    )
    dele = o.filter(F.col("o_orderkey") % 7 == 0).select(
        "o_orderkey", "o_custkey", "o_orderstatus",
        F.col("o_totalprice").alias("price"),
        F.lit(2).alias("seq"), F.lit("D").alias("op"),
    )
    feed = ins.unionByName(upd).unionByName(dele)
    return cdc_apply(feed, ["o_orderkey"], seq_col="seq", op_col="op")


@query(
    "sketch_countmin_users",
    """
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS exact_n,
           TRUE AS est_ge_exact,
           TRUE AS est_within_bound
    FROM events WHERE user_id < 10 GROUP BY user_id
    """,
)
def sketch_countmin_users(spark, sf_dir):
    """Count-Min point-frequency sketch (operators/frequency.countmin_*,
    Cormode & Muthukrishnan 2005) under the accuracy-contract pattern:
    per-partition 4x256 sketches merged by cell-wise sum (a
    corpus-size-independent 1KB of state — the same mergeable shape as
    the HLL and Misra-Gries entries), probed for ten user ids. Spark
    emits the EXACT counts plus the two CM guarantees as booleans
    (one-sided overestimate; excess <= 4n/width, loose enough that the
    4-row min makes failure on fixed data a real regression); the
    oracle asserts exact counts and literal TRUE."""
    import math

    from .operators.frequency import countmin_estimates

    ev = load(spark, sf_dir, "events")
    probes = list(range(10))
    n_total = ev.count()
    width = 256
    bound = math.ceil(4 * n_total / width)
    est = countmin_estimates(ev, "user_id", probes, depth=4, width=width)
    exact = (
        ev.filter(F.col("user_id") < 10)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_n"))
    )
    return exact.join(F.broadcast(est), "user_id").select(
        "user_id",
        "exact_n",
        (F.col("est") >= F.col("exact_n")).alias("est_ge_exact"),
        (F.col("est") <= F.col("exact_n") + F.lit(bound)).alias("est_within_bound"),
    )


# ---------------------------------------------------------------------------
# Round 4 additions: triangle counting, mergeable quantile sketch, EWMA
# ---------------------------------------------------------------------------


# Shared 1995-96 part co-order edge list for the graph-analytics family
# (triangle / k-core / BFS / LPA / transitivity). Built once per
# (session, sf_dir) and localCheckpoint'd: the driver and the bench run
# the whole catalog in ONE session, and without the memo each of the five
# queries paid the same ~2 s pairs-self-join + distinct to rebuild an
# identical ~100 k-edge table. Production would materialize this edge
# table in the lake for the same reason. The checkpoint is lazy, so an
# unused cache entry costs nothing.
_COORDER_CACHE: dict = {}


def _coorder_edges_plan(spark, sf_dir):
    """The un-checkpointed edge construction (cohort filter pushes down
    to the parquet scan — asserted in test_plans.py, where the
    checkpointed cached form would hide the scan node).

    r15 (guide §2.3/§2.4, the measured association_rules_parts rewrite):
    basket form — ONE exchange by orderkey whose collect_set both dedups
    (o, p) and builds the basket, with ordered pairs generated map-side
    via sort_array + posexplode + tail slice. The previous
    distinct + self-join form paid an (o, p) distinct exchange PLUS a
    join exchange by o (AQE reuses the two identical join sides into
    one, but the distinct's differently-keyed exchange can't be
    reused). Emits the identical pair multiset: one (src < dst) row per
    order containing both parts.

    Null-key semantics (r15 ADVICE): the old inner self-join dropped
    NULL orderkeys (null never equi-joins); groupBy would collect them
    into ONE basket and emit pairs across it. Harmless on TPC-H
    (l_orderkey is non-null by schema), but the basket form is not a
    drop-in for nullable keys — hence the explicit isNotNull guard,
    which folds into the scan's existing IsNotNull pushdown for free."""
    li = (
        load(spark, sf_dir, "lineitem")
        .filter(
            F.col("l_orderkey").isNotNull()
            & (F.col("l_shipdate") >= "1995-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
        )
        .select("l_orderkey", "l_partkey")
    )
    baskets = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("ps")
    )
    return (
        baskets.select(F.posexplode("ps").alias("i", "src"), "ps")
        .select(
            "src", F.explode(F.expr("slice(ps, i + 2, size(ps))")).alias("dst")
        )
    )


def _coorder_edges(spark, sf_dir):
    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _COORDER_CACHE.get(key)
    if cached is not None:
        return cached
    edges = _coorder_edges_plan(spark, sf_dir).localCheckpoint(eager=False)
    _COORDER_CACHE[key] = edges
    return edges


@query(
    "triangle_coorder_parts",
    """
    WITH pairs AS (
        SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1995-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'),
    edges AS (
        SELECT DISTINCT a.p AS a, b.p AS b
        FROM pairs a JOIN pairs b ON a.o = b.o AND a.p < b.p),
    nodes AS (
        SELECT count(DISTINCT v) AS n FROM (
            SELECT a AS v FROM edges UNION ALL SELECT b FROM edges)),
    tri AS (
        SELECT count(*) AS c
        FROM edges e1
        JOIN edges e2 ON e2.a = e1.b
        JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b)
    SELECT CAST(nodes.n AS BIGINT) AS n_nodes,
           CAST((SELECT count(*) FROM edges) AS BIGINT) AS n_edges,
           CAST(tri.c AS BIGINT) AS n_triangles
    FROM nodes CROSS JOIN tri
    """,
)
def triangle_coorder_parts(spark, sf_dir):
    """Triangle count of the 1995-96 part co-order graph (parts sharing
    an order are adjacent) via graph.triangle_count — degree-ordered
    orientation + per-vertex sorted out-neighbor arrays + one
    array-intersection per edge. The oracle counts the same triangles
    with the simpler a<b<c id-order 3-way join — identical count, but
    the id-order plan has no hub bound, which is exactly why the engine
    side orients by degree. The shipdate slice is a cohort analysis
    (and keeps the quadratic-ish co-order edge set proportionate in the
    bench); the predicate pushes down to the parquet scan."""
    from .operators import graph as GR

    edges = _coorder_edges(spark, sf_dir)
    return GR.triangle_count(edges)


@query(
    "sketch_quantile_bottomk",
    """
    WITH h AS (
        SELECT event_type, value,
               CAST('0x' || substr(md5(CAST(event_id AS VARCHAR) || '#41'), 1, 15)
                    AS BIGINT) AS rh
        FROM events),
    s AS (
        SELECT event_type, rh, min(value) AS value FROM h
        GROUP BY event_type, rh
        QUALIFY row_number() OVER (
            PARTITION BY event_type ORDER BY rh) <= 256),
    est AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS sample_k,
               round(quantile_cont(value, 0.5), 4) AS est_p50,
               round(quantile_cont(value, 0.9), 4) AS est_p90
        FROM s GROUP BY event_type),
    ex AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n_rows,
               round(quantile_cont(value, 0.40), 4) AS p40,
               round(quantile_cont(value, 0.60), 4) AS p60,
               round(quantile_cont(value, 0.85), 4) AS p85,
               round(quantile_cont(value, 0.95), 4) AS p95
        FROM events GROUP BY event_type)
    SELECT ex.event_type, ex.n_rows, est.sample_k,
           (est.est_p50 >= ex.p40 AND est.est_p50 <= ex.p60) AS p50_in_p40_p60,
           (est.est_p90 >= ex.p85 AND est.est_p90 <= ex.p95) AS p90_in_p85_p95
    FROM ex JOIN est USING (event_type)
    """,
)
def sketch_quantile_bottomk(spark, sf_dir):
    """Mergeable QUANTILE sketches — completing the mergeable-summary
    family (HLL distinct, Count-Min frequency, Misra-Gries heavy
    hitters) for the remaining dashboard staple: per-(type, day)
    bottom-k=256 hash-rank samples are built once at ingest; any
    cross-day quantile is answered by MERGING sketches (union, re-cut to
    the 256 smallest ranks — provably the bottom-k of the full stream)
    and reading the sorted sample. History is never rescanned. DKW gives
    ~±10% rank error at k=256, so the accuracy contract (same pattern
    as agg_approx_accuracy) checks the sample p50 against the exact
    p40..p60 band and p90 against p85..p95; the hash rank is md5-derived
    so the sample — and therefore the booleans — are bit-reproducible.

    The oracle REPLAYS the sample (k smallest distinct md5 ranks per
    type, min value per rank — the stream_quantile_sketch pattern) and
    computes the same booleans, instead of asserting them TRUE: the
    p85..p95 band is only ~2.7 sigma wide at k=256, so on a resampled
    corpus (the r13 sf0.25 scale fixture re-keys event_ids) a tail
    boolean can legitimately read false — both engines must agree on
    WHATEVER the draw says, not on a lucky-SF literal. Estimates and
    band edges are rounded to 4dp in BOTH engines before comparison so
    a cross-engine interpolation ulp cannot flip a boolean at a band
    edge."""
    from .operators import quantiles as QS

    ev = load(spark, sf_dir, "events")
    # scale path end-to-end: map-side pre-cut at the scan (zero corpus
    # shuffle), per-(type, day) ingest sketches, then merge-of-merged up
    # to event_type — every exchange after the scan is k-bounded
    daily = QS.merge_bottomk_hash(
        QS.bottomk_precut(
            ev.withColumn("day", F.to_date("ts")),
            ["event_type", "day"],
            "value",
            k=256,
            id_col="event_id",
        ),
        ["event_type", "day"],
        k=256,
    )
    merged = QS.merge_bottomk_hash(daily, ["event_type"], k=256)
    est = merged.groupBy("event_type").agg(
        F.round(QS.sample_quantile(0.5), 4).alias("est_p50"),
        F.round(QS.sample_quantile(0.9), 4).alias("est_p90"),
        F.count(F.lit(1)).cast("long").alias("sample_k"),
    )
    # one percentile buffer (array form), not four — each scalar
    # percentile agg keeps its own per-group value buffer
    exact = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.expr("percentile(value, array(0.40D, 0.60D, 0.85D, 0.95D))").alias("ps"),
    ).select(
        "event_type",
        "n_rows",
        F.round(F.col("ps")[0], 4).alias("p40"),
        F.round(F.col("ps")[1], 4).alias("p60"),
        F.round(F.col("ps")[2], 4).alias("p85"),
        F.round(F.col("ps")[3], 4).alias("p95"),
    )
    return exact.join(F.broadcast(est), "event_type").select(
        "event_type",
        "n_rows",
        "sample_k",
        ((F.col("est_p50") >= F.col("p40")) & (F.col("est_p50") <= F.col("p60"))).alias(
            "p50_in_p40_p60"
        ),
        ((F.col("est_p90") >= F.col("p85")) & (F.col("est_p90") <= F.col("p95"))).alias(
            "p90_in_p85_p95"
        ),
    )


# EWMA weights alpha=0.3 over the 8 previous events, embedded as identical
# decimal literals in both engines (pow() can differ by an ulp across
# libm implementations; a parsed decimal literal cannot).
_EWMA_W = [round(0.3 * 0.7**j, 8) for j in range(8)]


def _ewma_oracle() -> str:
    num = " + ".join(
        f"COALESCE({w} * lag(cents, {j + 1}) OVER w, 0)"
        for j, w in enumerate(_EWMA_W)
    )
    den = " + ".join(
        f"CASE WHEN lag(cents, {j + 1}) OVER w IS NOT NULL THEN {w} ELSE 0 END"
        for j, w in enumerate(_EWMA_W)
    )
    return f"""
    WITH x AS (
        SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS t,
               CAST(round(value * 100) AS BIGINT) AS cents
        FROM events)
    SELECT event_id, user_id,
           round(cents / 100.0, 2) AS value_now,
           CASE WHEN lag(cents, 1) OVER w IS NULL THEN NULL
                ELSE round(({num}) / ({den}) / 100.0, 4) END AS ewma_prev,
           CASE WHEN lag(cents, 1) OVER w IS NULL THEN FALSE
                ELSE cents / 100.0 >
                     3 * round(({num}) / ({den}) / 100.0, 4) END AS is_spike
    FROM x
    WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)
    """


@query("ewma_user_value", _ewma_oracle())
def ewma_user_value(spark, sf_dir):
    """Per-user EWMA baseline + spike flag — streaming-style anomaly
    detection as a batch window op. The EWMA is the finite 8-lag form
    (exact, not recursive, so it is window-expressible in any engine);
    dollar values ride as exact integer cents, weights are fixed decimal
    literals, and the lag terms are summed in one written order — the
    whole pipeline is float-deterministic. One shuffle on user_id; the
    frame is 8 rows regardless of history length."""
    ev = load(spark, sf_dir, "events")
    x = ev.select(
        "event_id",
        "user_id",
        F.col("ts").cast("timestamp").alias("t"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    lags = [F.lag("cents", j + 1).over(w) for j in range(8)]
    num = sum(
        (F.coalesce(F.lit(wt) * lg, F.lit(0.0)) for wt, lg in zip(_EWMA_W, lags)),
        start=F.lit(0.0),
    )
    den = sum(
        (F.when(lg.isNotNull(), F.lit(wt)).otherwise(F.lit(0.0)) for wt, lg in zip(_EWMA_W, lags)),
        start=F.lit(0.0),
    )
    ewma = F.round(num / den / 100.0, 4)
    has_prior = lags[0].isNotNull()
    return x.select(
        "event_id",
        "user_id",
        F.round(F.col("cents") / 100.0, 2).alias("value_now"),
        F.when(has_prior, ewma).alias("ewma_prev"),
        F.when(has_prior, F.col("cents") / 100.0 > 3 * ewma)
        .otherwise(F.lit(False))
        .alias("is_spike"),
    )


@query(
    "stream_quantile_sketch",
    """
    WITH h AS (
        SELECT event_type, value,
               CAST('0x' || substr(md5(CAST(event_id AS VARCHAR) || '#41'), 1, 15)
                    AS BIGINT) AS rh
        FROM events),
    s AS (
        SELECT event_type, rh, min(value) AS value FROM h
        GROUP BY event_type, rh
        QUALIFY row_number() OVER (
            PARTITION BY event_type ORDER BY rh) <= 256)
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS sample_k,
           round(quantile_cont(value, 0.5), 4) AS est_p50,
           round(quantile_cont(value, 0.9), 4) AS est_p90
    FROM s GROUP BY event_type
    """,
)
def stream_quantile_sketch(spark, sf_dir):
    """STREAMING maintenance of the mergeable bottom-k quantile sketch:
    events arrive in two disjoint micro-batches (staged by event_id
    parity); each batch appends its per-type bottom-256 sketch via
    foreachBatch (epoch-keyed overwrite — crash-idempotent); the final
    quantile read merges the persisted sketches. Because bottom-k by
    deterministic hash rank is a true mergeable summary, the merged
    streaming sketch is BIT-IDENTICAL to the single-pass batch sketch —
    so the oracle replays the global bottom-k directly in SQL (same
    md5-rank, same re-cut) and checks the estimated quantile VALUES
    exactly, not just error bands. The stream is never rescanned;
    per-batch state is k rows per type."""
    import shutil
    import tempfile
    import uuid

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from .operators import quantiles as QS
    from .streaming.ingest import quantile_sketch_stream

    stage = tempfile.mkdtemp(prefix="sqs_in_")
    out = tempfile.mkdtemp(prefix="sqs_out_")
    # pyarrow staging preserves the TIMESTAMP(NANOS) physical type, so
    # stream_source's schema probe sees exactly what production files have
    tbl = pq.read_table(f"{sf_dir}/events.parquet")
    even = pc.equal(pc.bit_wise_and(tbl["event_id"], 1), 0)
    pq.write_table(tbl.filter(even), f"{stage}/part-0.parquet")
    pq.write_table(tbl.filter(pc.invert(even)), f"{stage}/part-1.parquet")
    try:
        q = quantile_sketch_stream(
            spark,
            stage,
            sketch_dir=f"{out}/sketch",
            checkpoint_dir=f"{out}/ckpt_{uuid.uuid4().hex[:8]}",
            k=256,
            max_files_per_trigger=1,
        ).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        sketches = spark.read.parquet(f"{out}/sketch").drop("epoch")
        merged = QS.merge_bottomk_hash(sketches, ["event_type"], k=256)
        return (
            merged.groupBy("event_type")
            .agg(
                F.count(F.lit(1)).cast("long").alias("sample_k"),
                F.round(QS.sample_quantile(0.5), 4).alias("est_p50"),
                F.round(QS.sample_quantile(0.9), 4).alias("est_p90"),
            )
            # materialize before the temp dirs vanish
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(stage, ignore_errors=True)
        shutil.rmtree(out, ignore_errors=True)


@query(
    "debounce_events",
    """
    WITH x AS (
        SELECT event_id, user_id, event_type,
               epoch_us(CAST(ts AS TIMESTAMP)) AS us
        FROM events),
    l AS (
        SELECT *, lag(us) OVER (
            PARTITION BY user_id, event_type ORDER BY us, event_id) AS pus
        FROM x)
    SELECT event_id, user_id, event_type
    FROM l WHERE pus IS NULL OR us - pus > 300000000
    """,
)
def debounce_events(spark, sf_dir):
    """Debounce: drop repeat (user, type) events arriving within 300 s of
    the previously KEPT-or-seen one (lag-based — the standard burst
    suppressor for click storms and retry floods). Time math in exact
    epoch microseconds (fractional-second timestamps make 'seconds
    between' engine-ambiguous; integer micros are not). One shuffle on
    (user_id, event_type); the streaming twin is dropDuplicates
    WithinWatermark on the same key."""
    ev = load(spark, sf_dir, "events")
    x = ev.select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    w = Window.partitionBy("user_id", "event_type").orderBy("us", "event_id")
    return (
        x.withColumn("pus", F.lag("us").over(w))
        .filter(F.col("pus").isNull() | (F.col("us") - F.col("pus") > 300_000_000))
        .select("event_id", "user_id", "event_type")
    )


@query(
    "robust_outlier_prices",
    """
    WITH med AS (
        SELECT l_returnflag AS rf, quantile_cont(l_extendedprice, 0.5) AS m
        FROM lineitem GROUP BY 1),
    mad AS (
        SELECT rf, quantile_cont(abs(l_extendedprice - m), 0.5) AS d
        FROM lineitem JOIN med ON l_returnflag = rf GROUP BY rf),
    j AS (SELECT l_returnflag AS rf, l_extendedprice AS x, m, d
          FROM lineitem JOIN med ON l_returnflag = med.rf
                        JOIN mad ON l_returnflag = mad.rf)
    SELECT rf AS l_returnflag,
           CAST(count(*) AS BIGINT) AS n_items,
           round(m, 4) AS med_price,
           round(d, 4) AS mad_price,
           CAST(sum(CASE WHEN abs(0.6745 * (x - m) / d) > 3.5
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM j GROUP BY rf, m, d
    """,
)
def robust_outlier_prices(spark, sf_dir):
    """Robust outlier detection via MAD (median absolute deviation):
    modified z-score 0.6745·(x-med)/MAD > 3.5 — the robust-statistics
    standard that mean/stddev z-scores can't give you when the outliers
    themselves inflate the stddev. Two grouped median passes with the
    (tiny) per-group medians broadcast back between them; the flag
    comparison is identical double arithmetic in both engines.

    Memory bound of the exact ``percentile`` aggregate (r15, VERDICT r14
    order 7): Spark's exact percentile buffers an OpenHashMap of
    (value -> count) per group — memory scales with the number of
    DISTINCT values in the group, not its row count. Here the value is
    l_extendedprice (bounded product of ~200k distinct part prices x
    quantity 1-50, so low millions of distinct doubles per returnflag
    group at ANY row scale) — bounded, but a corpus with genuinely
    high-cardinality values (raw floats, timestamps) would grow the
    buffer with the data. The documented 100-TB twin is
    ``robust_outlier_prices_sampled`` (operators/quantiles.py): a
    mergeable bottom-k uniform sample with partition-local pre-cut,
    whose state is k-bounded regardless of cardinality."""
    # r15 note (measured, then REVERTED): a (rf, price) histogram pre-
    # aggregation ("aggregate before you shuffle", guide §2.3) was built
    # and A/B'd — 1 scan + weighted percentiles instead of 4 scans. It
    # measured 4.18 -> 9.78 CPU s/run at sf0.1: l_extendedprice is
    # near-unique (594,330 distinct of 600,000 rows), so the histogram
    # compresses nothing and the extra row-volume exchange + checkpoint +
    # four checkpoint re-reads are pure cost. The direct form stays; the
    # histogram twin only pays off when values repeat heavily (see
    # OPTIMIZATION_r15.md).
    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("rf"), F.col("l_extendedprice").alias("x")
    )
    med = li.groupBy("rf").agg(F.expr("percentile(x, 0.5)").alias("m"))
    j1 = li.join(F.broadcast(med), "rf")
    mad = j1.groupBy("rf").agg(
        F.expr("percentile(abs(x - m), 0.5)").alias("d")
    )
    j2 = j1.join(F.broadcast(mad), "rf")
    return j2.groupBy("rf", "m", "d").agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.sum(
            F.when(F.abs(0.6745 * (F.col("x") - F.col("m")) / F.col("d")) > 3.5, 1)
            .otherwise(0)
        )
        .cast("long")
        .alias("n_outliers"),
    ).select(
        F.col("rf").alias("l_returnflag"),
        "n_items",
        F.round("m", 4).alias("med_price"),
        F.round("d", 4).alias("mad_price"),
        "n_outliers",
    )


@query(
    "top_event_trigrams",
    """
    WITH x AS (
        SELECT user_id, event_type,
               epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_id
        FROM events),
    t AS (
        SELECT lag(event_type, 2) OVER w AS e1,
               lag(event_type, 1) OVER w AS e2,
               event_type AS e3
        FROM x
        WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id))
    SELECT e1, e2, e3, CAST(count(*) AS BIGINT) AS n
    FROM t WHERE e1 IS NOT NULL
    GROUP BY e1, e2, e3
    ORDER BY n DESC, e1, e2, e3 LIMIT 20
    """,
)
def top_event_trigrams(spark, sf_dir):
    """Sequence mining: the 20 most frequent 3-step behavioral paths
    (sliding event-type trigrams per user timeline) — the n-gram
    generalization of markov_event_transitions' bigram matrix, and the
    feature extractor behavioral-model training data pipelines run over
    clickstreams. One shuffle on user_id for the lag window, one for
    the trigram count; the final top-20 is TakeOrderedAndProject."""
    ev = load(spark, sf_dir, "events")
    x = ev.select(
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    t = x.select(
        F.lag("event_type", 2).over(w).alias("e1"),
        F.lag("event_type", 1).over(w).alias("e2"),
        F.col("event_type").alias("e3"),
    ).filter(F.col("e1").isNotNull())
    return (
        t.groupBy("e1", "e2", "e3")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy(F.col("n").desc(), "e1", "e2", "e3")
        .limit(20)
    )


def _kcore_oracle(k: int = 4, rounds: int = 4) -> str:
    """Fixed-round CTE replay of graph.kcore_peel over the 1995-96
    co-order graph (same edge construction as triangle_coorder_parts)."""
    # every CTE is MATERIALIZED: DuckDB inlines plain CTEs per
    # reference, and each round references its predecessor several
    # times — un-materialized, the replay re-evaluates e0 O(6^rounds)
    # times (minutes at sf0.1 instead of seconds)
    sql = ["""
    WITH pairs AS MATERIALIZED (
        SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1995-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'),
    e0 AS MATERIALIZED (
        SELECT DISTINCT a.p AS a, b.p AS b
        FROM pairs a JOIN pairs b ON a.o = b.o AND a.p < b.p)"""]
    prev = "e0"
    for r in range(1, rounds + 1):
        sql.append(f""",
    k{r} AS MATERIALIZED (
        SELECT v FROM (
            SELECT a AS v FROM {prev} UNION ALL SELECT b FROM {prev})
        GROUP BY v HAVING count(*) >= {k}),
    e{r} AS MATERIALIZED (
        SELECT a, b FROM {prev}
        WHERE a IN (SELECT v FROM k{r}) AND b IN (SELECT v FROM k{r}))""")
        prev = f"e{r}"
    sql.append(f"""
    SELECT v AS node, CAST(count(*) AS BIGINT) AS deg
    FROM (SELECT a AS v FROM {prev} UNION ALL SELECT b FROM {prev})
    GROUP BY v""")
    return "".join(sql)


@query("kcore_coorder_parts", _kcore_oracle())
def kcore_coorder_parts(spark, sf_dir):
    """4 rounds of 4-core peeling on the 1995-96 part co-order graph
    (graph.kcore_peel): the standard dense-subgraph extractor (peel
    low-degree fringe until only the cohesive core remains). Fixed-round
    + integer-exact ⇒ the oracle replays the entire iteration as chained
    CTEs, like kmeans_embeddings_int. Per round: one degree groupBy and
    two semi-joins; lineage checkpointed per round."""
    from .operators import graph as GR

    edges = _coorder_edges(spark, sf_dir)
    return GR.kcore_peel(edges, k=4, rounds=4)


def _bfs_oracle(rounds: int = 4) -> str:
    """Chained-CTE replay of graph.bfs_levels over the 1995-96 co-order
    graph from the minimum part id in the slice. MATERIALIZED: the round
    CTEs reference their predecessors twice each."""
    sql = ["""
    WITH pairs AS MATERIALIZED (
        SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1995-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'),
    e AS MATERIALIZED (
        SELECT DISTINCT a.p AS a, b.p AS b
        FROM pairs a JOIN pairs b ON a.o = b.o AND a.p != b.p),
    d0 AS (SELECT min(p) AS node, CAST(0 AS BIGINT) AS dist FROM pairs)"""]
    prev = "d0"
    for r in range(1, rounds + 1):
        sql.append(f""",
    d{r} AS MATERIALIZED (
        SELECT node, min(dist) AS dist FROM (
            SELECT node, dist FROM {prev}
            UNION ALL
            SELECT e.b AS node, {prev}.dist + 1 AS dist
            FROM {prev} JOIN e ON e.a = {prev}.node)
        GROUP BY node)""")
        prev = f"d{r}"
    sql.append(f"""
    SELECT node, dist FROM {prev}""")
    return "".join(sql)


@query("bfs_coorder_parts", _bfs_oracle())
def bfs_coorder_parts(spark, sf_dir):
    """4-hop BFS from the lowest part id over the 1995-96 co-order graph
    (graph.bfs_levels): relational frontier expansion — one edge join +
    one groupBy-min per round, distances exact integers, fixed rounds ⇒
    the oracle replays the iteration as chained CTEs (the kmeans/kcore
    replay pattern applied to traversal)."""
    from .operators import graph as GR

    edges = _coorder_edges(spark, sf_dir)
    # source = min part id in the SLICE (matches the oracle's min over
    # pairs) — not min edge endpoint: a part seen only in single-item
    # orders is a valid (isolated) source and must not be skipped
    source = (
        load(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= "1995-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
        )
        .agg(F.min("l_partkey").alias("node"))
    )
    return GR.bfs_levels(edges, source, rounds=4)


@query(
    "item_cooccurrence_similarity",
    """
    WITH pairs AS MATERIALIZED (
        SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
    freq AS MATERIALIZED (SELECT p, count(*) AS f FROM pairs GROUP BY p),
    cooc AS MATERIALIZED (
        SELECT a.p AS pa, b.p AS pb, count(*) AS c
        FROM pairs a JOIN pairs b ON a.o = b.o AND a.p != b.p
        GROUP BY 1, 2)
    SELECT pa AS p_partkey, pb AS similar_partkey,
           CAST(c AS BIGINT) AS n_coorders,
           round(c / sqrt(fa.f * fb.f), 4) AS cosine_sim
    FROM cooc
    JOIN freq fa ON fa.p = pa
    JOIN freq fb ON fb.p = pb
    WHERE pa < 50
    QUALIFY row_number() OVER (
        PARTITION BY pa
        ORDER BY round(c / sqrt(fa.f * fb.f), 4) DESC, pb) <= 5
    """,
)
def item_cooccurrence_similarity(spark, sf_dir):
    """Item-item collaborative-filtering similarity: co-order counts
    normalized by item frequency (cosine over the order-incidence
    vectors), top-5 similar items per query item. The classic
    co-occurrence recommender built from joins + aggregates; scores are
    rounded before the rank so both engines break ties identically. The
    frequency table is small after aggregation -> broadcast back; the
    query-side filter (pa < 50) bounds the ranked output, not the
    co-occurrence aggregation (which production would cap per-basket
    exactly like the stop-shingle cap in ngram_jaccard_pairs)."""
    raw = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    # basket form (same rewrite as association_rules_parts): one shuffle
    # by orderkey dedups AND builds each basket; pairs explode map-side
    # with the query-side pa < 50 filter applied BETWEEN the explodes —
    # only filtered pairs ever reach the (pa, pb) exchange
    baskets = raw.groupBy("l_orderkey").agg(
        F.collect_set("l_partkey").alias("items")
    ).localCheckpoint(eager=False)  # 2 consumers
    freq = baskets.select(F.explode("items").alias("l_partkey")).groupBy(
        "l_partkey"
    ).agg(F.count(F.lit(1)).alias("f"))
    cooc = (
        baskets.select(F.explode("items").alias("pa"), "items")
        .filter(F.col("pa") < 50)
        .select("pa", F.explode("items").alias("pb"))
        .filter(F.col("pa") != F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    fa = freq.select(F.col("l_partkey").alias("pa"), F.col("f").alias("fa"))
    fb = freq.select(F.col("l_partkey").alias("pb"), F.col("f").alias("fb"))
    sim = F.round(F.col("c") / F.sqrt(F.col("fa") * F.col("fb")), 4)
    w = Window.partitionBy("pa").orderBy(F.col("cosine_sim").desc(), F.col("pb").asc())
    return (
        cooc.join(F.broadcast(fa), "pa")
        .join(F.broadcast(fb), "pb")
        .withColumn("cosine_sim", sim)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select(
            F.col("pa").alias("p_partkey"),
            F.col("pb").alias("similar_partkey"),
            F.col("c").cast("long").alias("n_coorders"),
            "cosine_sim",
        )
    )


@query(
    "incremental_rollup_orders",
    """
    SELECT CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP) AS day,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                 / 100.0, 2) AS revenue
    FROM orders GROUP BY 1
    """,
)
def incremental_rollup_orders(spark, sf_dir):
    """Incremental VIEW MAINTENANCE: the daily revenue rollup maintained
    by additively merging per-batch partial aggregates
    (operators/merge.merge_additive) instead of rescanning history —
    the exact-aggregate twin of the mergeable-sketch family. Here the
    history arrives as two batches (split by order key parity); each
    contributes a (day, count, cents) partial and the state merge is
    one full-outer join on the rollup key. Integer cents make the
    result bit-identical to the full recompute under ANY split — which
    is exactly what the oracle checks (it computes the rollup over all
    orders in one pass)."""
    from .operators.merge import merge_additive

    o = load(spark, sf_dir, "orders").select(
        # day as midnight TIMESTAMP, not DATE: the gate's pandas
        # canonicalizer stringifies date cells differently per engine
        F.to_date("o_orderdate").cast("timestamp").alias("day"),
        F.col("o_orderkey"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )

    def partial(batch):
        return batch.groupBy("day").agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("cents").alias("cents"),
        )

    state = partial(o.filter(F.col("o_orderkey") % 2 == 0))
    delta = partial(o.filter(F.col("o_orderkey") % 2 == 1))
    merged = merge_additive(state, delta, ["day"], ["n_orders", "cents"])
    return merged.select(
        "day",
        "n_orders",
        F.round(F.col("cents") / 100.0, 2).alias("revenue"),
    )


@query(
    "stream_incremental_rollup",
    """
    SELECT CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP) AS day,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                 / 100.0, 2) AS revenue
    FROM orders GROUP BY 1
    """,
)
def stream_incremental_rollup(spark, sf_dir):
    """The incremental_rollup_orders view maintained UNDER STREAMING
    (streaming/ingest.incremental_rollup_stream): orders arrive as two
    disjoint micro-batches, each appends its per-day partial aggregate
    (epoch-keyed overwrite — crash-idempotent), and the rollup read
    merges the partials with one groupBy-sum. The merge_additive
    monoid property makes the result bit-identical to the one-pass
    batch rollup for ANY arrival split, so the oracle is the exact
    full recompute."""
    import shutil
    import tempfile
    import uuid

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from .streaming.ingest import incremental_rollup_stream

    stage = tempfile.mkdtemp(prefix="sir_in_")
    out = tempfile.mkdtemp(prefix="sir_out_")
    tbl = pq.read_table(f"{sf_dir}/orders.parquet")
    even = pc.equal(pc.bit_wise_and(tbl["o_orderkey"], 1), 0)
    pq.write_table(tbl.filter(even), f"{stage}/part-0.parquet")
    pq.write_table(tbl.filter(pc.invert(even)), f"{stage}/part-1.parquet")
    try:
        q = incremental_rollup_stream(
            spark,
            stage,
            rollup_dir=f"{out}/rollup",
            checkpoint_dir=f"{out}/ckpt_{uuid.uuid4().hex[:8]}",
            max_files_per_trigger=1,
        ).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        partials = spark.read.parquet(f"{out}/rollup").drop("epoch")
        return (
            partials.groupBy("day")
            .agg(
                F.sum("n_orders").cast("long").alias("n_orders"),
                F.sum("cents").alias("cents"),
            )
            .select(
                F.col("day").cast("timestamp").alias("day"),
                "n_orders",
                F.round(F.col("cents") / 100.0, 2).alias("revenue"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(stage, ignore_errors=True)
        shutil.rmtree(out, ignore_errors=True)


@query(
    "stream_scd2_dim",
    """
    WITH c AS (SELECT c_custkey, c_name, c_acctbal FROM customer),
    unchanged AS (
        SELECT c_custkey, c_name, c_acctbal,
               TIMESTAMP '2024-01-01' AS valid_from,
               TIMESTAMP '2200-01-01' AS valid_to,
               true AS is_current
        FROM c WHERE c_custkey % 10 <> 0),
    closed AS (
        SELECT c_custkey, c_name, c_acctbal,
               TIMESTAMP '2024-01-01', TIMESTAMP '2024-01-02', false
        FROM c WHERE c_custkey % 10 = 0),
    opened AS (
        SELECT c_custkey, c_name, c_acctbal + 100, TIMESTAMP '2024-01-02',
               TIMESTAMP '2200-01-01', true
        FROM c WHERE c_custkey % 10 = 0)
    SELECT * FROM unchanged
    UNION ALL SELECT * FROM closed
    UNION ALL SELECT * FROM opened
    """,
)
def stream_scd2_dim(spark, sf_dir):
    """SCD Type 2 dimension maintenance UNDER STREAMING
    (streaming/ingest.scd2_dim_stream): the customer dim arrives as two
    micro-batches — epoch 0 bootstraps every customer, epoch 1 bumps
    every 10th customer's balance — applied via foreachBatch with
    epoch-derived version timestamps and an atomic _CURRENT pointer
    swap per epoch. The oracle declares the expected version table
    directly (the same spec oracle as the batch twin
    scd2_customer_versions, with epoch_batch_ts timestamps), so the
    streaming path's change detection, closing/opening and replay-safe
    epoch bookkeeping are all checked against the spec."""
    import os
    import shutil
    import tempfile
    import uuid

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from .streaming.ingest import scd2_dim_stream

    stage = tempfile.mkdtemp(prefix="scd2_in_")
    out = tempfile.mkdtemp(prefix="scd2_out_")
    tbl = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name", "c_acctbal"]
    )
    bumped = tbl.set_column(
        tbl.schema.get_field_index("c_acctbal"),
        "c_acctbal",
        pc.if_else(
            # x % 10 == 0 via trunc-divide (this pyarrow lacks modulo)
            pc.equal(
                pc.subtract(
                    tbl["c_custkey"],
                    pc.multiply(pc.divide(tbl["c_custkey"], 10), 10),
                ),
                0,
            ),
            pc.add(tbl["c_acctbal"], 100),
            tbl["c_acctbal"],
        ),
    )
    pq.write_table(tbl, f"{stage}/part-0.parquet")
    pq.write_table(bumped, f"{stage}/part-1.parquet")
    # FileStreamSource orders by modification time: pin the bootstrap
    # batch strictly older so epoch 0 is always the init batch
    os.utime(f"{stage}/part-0.parquet", (1_700_000_000, 1_700_000_000))
    os.utime(f"{stage}/part-1.parquet", (1_700_000_100, 1_700_000_100))
    try:
        dim_dir = f"{out}/dim"
        q = scd2_dim_stream(
            spark,
            stage,
            dim_dir=dim_dir,
            checkpoint_dir=f"{out}/ckpt_{uuid.uuid4().hex[:8]}",
            key="c_custkey",
            tracked=["c_name", "c_acctbal"],
            schema="c_custkey bigint, c_name string, c_acctbal double",
        ).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        with open(os.path.join(dim_dir, "_CURRENT")) as fh:
            cur = fh.read().strip()
        return (
            spark.read.parquet(os.path.join(dim_dir, cur))
            .select(
                "c_custkey", "c_name", "c_acctbal",
                "valid_from", "valid_to", "is_current",
            )
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(stage, ignore_errors=True)
        shutil.rmtree(out, ignore_errors=True)


@query(
    "clustering_coefficient_parts",
    """
    WITH pairs AS MATERIALIZED (
        SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1995-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'),
    edges AS MATERIALIZED (
        SELECT DISTINCT a.p AS a, b.p AS b
        FROM pairs a JOIN pairs b ON a.o = b.o AND a.p < b.p),
    deg AS (
        SELECT v, count(*) AS d FROM (
            SELECT a AS v FROM edges UNION ALL SELECT b FROM edges)
        GROUP BY v),
    tri AS (
        SELECT count(*) AS t
        FROM edges e1
        JOIN edges e2 ON e2.a = e1.b
        JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b)
    SELECT CAST((SELECT sum(d * (d - 1) // 2) FROM deg) AS BIGINT) AS n_wedges,
           CAST(tri.t AS BIGINT) AS n_triangles,
           CAST((SELECT 3000000 * tri.t // sum(d * (d - 1) // 2) FROM deg) AS BIGINT)
               AS global_cc_ppm
    FROM tri
    """,
)
def clustering_coefficient_parts(spark, sf_dir):
    """Global clustering coefficient (transitivity) of the 1995-96
    co-order graph: 3·triangles / wedges, reported in exact integer
    parts-per-million (integer division replicated in both engines —
    no float ratio to drift). Wedges come from the degree table
    (Σ d·(d-1)/2, one aggregation); triangles reuse
    graph.triangle_count's machinery. The transitivity of a co-purchase
    graph is the standard 'how cliquish are baskets' market-structure
    measure."""
    from .operators import graph as GR

    edges = _coorder_edges(spark, sf_dir)
    und = edges.select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).distinct().localCheckpoint(eager=False)
    deg = (
        und.select(F.col("a").alias("v"))
        .unionAll(und.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    wedges = deg.agg(
        F.sum(F.expr("d * (d - 1) div 2")).cast("long").alias("n_wedges")
    )
    tri = GR.triangle_count(und, src="a", dst="b").select("n_triangles")
    return wedges.crossJoin(tri).select(
        "n_wedges",
        "n_triangles",
        F.expr("3000000 * n_triangles div n_wedges").cast("long").alias(
            "global_cc_ppm"
        ),
    )


def _lpa_oracle(rounds: int = 3) -> str:
    """Chained-CTE replay of graph.label_propagation over the 1995-96
    co-order graph (deterministic synchronous LPA, ties to smallest
    label)."""
    sql = ["""
    WITH pairs AS MATERIALIZED (
        SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1995-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'),
    sym AS MATERIALIZED (
        SELECT DISTINCT a.p AS a, b.p AS b
        FROM pairs a JOIN pairs b ON a.o = b.o AND a.p != b.p),
    l0 AS (SELECT DISTINCT a AS node, a AS label FROM sym)"""]
    prev = "l0"
    for r in range(1, rounds + 1):
        sql.append(f""",
    l{r} AS MATERIALIZED (
        SELECT node, label FROM (
            SELECT e.a AS node, l.label, count(*) AS c
            FROM sym e JOIN {prev} l ON l.node = e.b
            GROUP BY 1, 2
            QUALIFY row_number() OVER (
                PARTITION BY e.a ORDER BY count(*) DESC, l.label) = 1))""")
        prev = f"l{r}"
    sql.append(f"""
    SELECT node, label FROM {prev}""")
    return "".join(sql)


@query("lpa_communities_parts", _lpa_oracle())
def lpa_communities_parts(spark, sf_dir):
    """Community detection via DETERMINISTIC synchronous label
    propagation (graph.label_propagation, 3 rounds, ties to smallest
    label) on the 1995-96 co-order graph — the near-linear community
    algorithm; the deterministic tie-break turns classic LPA's
    randomized order into a replayable fixpoint iteration, so the
    oracle replays all 3 rounds as chained CTEs (the
    kmeans/kcore/BFS/PageRank pattern — the catalog's fifth fully
    SQL-replayed iterative algorithm)."""
    from .operators import graph as GR

    edges = _coorder_edges(spark, sf_dir)
    return GR.label_propagation(edges, rounds=3)


@query(
    "forecast_eval_seasonal_naive",
    """
    WITH m AS MATERIALIZED (
        SELECT n.n_name,
               CAST(date_trunc('month', o.o_orderdate) AS TIMESTAMP) AS month,
               CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM orders o
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        GROUP BY 1, 2),
    j AS (
        SELECT a.n_name, a.month, a.cents AS actual, p.cents AS predicted
        FROM m a JOIN m p
          ON p.n_name = a.n_name
         AND p.month = a.month - INTERVAL 12 MONTH)
    SELECT n_name,
           CAST(count(*) AS BIGINT) AS n_months,
           CAST(sum(abs(actual - predicted) * 10000 // actual) AS BIGINT)
               AS total_ape_bp,
           round(sum(abs(actual - predicted) * 10000 // actual)
                 / (count(*) * 100.0), 4) AS mape_pct
    FROM j GROUP BY n_name
    """,
)
def forecast_eval_seasonal_naive(spark, sf_dir):
    """Forecast-evaluation harness: the SEASONAL-NAIVE baseline (predict
    month m with month m-12) scored by MAPE per nation — the sanity
    baseline every revenue-forecast model must beat, and the shape of
    any backtest pipeline (time-shifted self-join on the entity+period
    key, never a window lag, so calendar GAPS can't silently misalign
    the horizon). Error math is exact integers end to end: revenue as
    integer cents, per-month absolute percentage error floored to basis
    points, MAPE as an exact-ratio division rounded once — no float
    accumulation anywhere. Dims broadcast; one shuffle for the monthly
    rollup, one for the self-join."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    m = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            "n_name",
            F.date_trunc("month", F.col("o_orderdate")).alias("month"),
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
                "cents"
            )
        )
        .localCheckpoint(eager=False)  # both sides of the self-join
    )
    a = m.select("n_name", "month", F.col("cents").alias("actual"))
    p = m.select(
        "n_name",
        F.add_months(F.col("month"), 12).cast("timestamp").alias("month"),
        F.col("cents").alias("predicted"),
    )
    ape_bp = F.expr("abs(actual - predicted) * 10000 div actual")
    return (
        a.join(p, ["n_name", "month"])
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_months"),
            F.sum(ape_bp).cast("long").alias("total_ape_bp"),
            F.round(
                F.sum(ape_bp) / (F.count(F.lit(1)) * 100.0), 4
            ).alias("mape_pct"),
        )
    )


@query(
    "regression_price_vs_quantity",
    """
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n_items,
           round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
           round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
           round(regr_r2(l_extendedprice, l_quantity), 6) AS r2
    FROM lineitem GROUP BY l_returnflag
    """,
)
def regression_price_vs_quantity(spark, sf_dir):
    """Grouped ordinary-least-squares fit (price ~ quantity per return
    flag): slope = cov/var, intercept = ȳ − slope·x̄, R² = corr² —
    single-pass co-moment aggregation, one shuffle, the same numeric
    envelope as stats_price_quantity (both engines accumulate co-moments
    in doubles; results rounded once). Spark has the same regr_*
    aggregates as DuckDB since 3.4 — used directly."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.round(F.regr_slope("l_extendedprice", "l_quantity"), 4).alias("slope"),
        F.round(F.regr_intercept("l_extendedprice", "l_quantity"), 4).alias(
            "intercept"
        ),
        F.round(F.regr_r2("l_extendedprice", "l_quantity"), 6).alias("r2"),
    )


@query(
    "time_to_purchase_stats",
    """
    WITH f AS (
        SELECT user_id,
               min(CASE WHEN event_type = 'signup'
                        THEN epoch_us(CAST(ts AS TIMESTAMP)) END) AS t_signup,
               min(CASE WHEN event_type = 'purchase'
                        THEN epoch_us(CAST(ts AS TIMESTAMP)) END) AS t_purchase
        FROM events GROUP BY user_id),
    d AS (
        SELECT user_id, (t_purchase - t_signup) // 1000000 AS delta_s
        FROM f
        WHERE t_signup IS NOT NULL AND t_purchase IS NOT NULL
          AND t_purchase >= t_signup)
    SELECT CAST(count(*) AS BIGINT) AS n_users,
           round(quantile_cont(delta_s, 0.5), 4) AS p50_s,
           round(quantile_cont(delta_s, 0.9), 4) AS p90_s,
           (CAST((200 * (sum(delta_s)) + (count(*))) // (2 * (count(*))) AS DOUBLE) / 100.0) AS avg_s
    FROM d
    """,
)
def time_to_purchase_stats(spark, sf_dir):
    """Funnel LATENCY: distribution of signup -> first-purchase delay.
    One conditional-min aggregation per user (no window, no self-join),
    integer-second deltas (epoch micros floored — both engines share the
    integer math), exact interpolated percentiles and an exact-ratio
    mean rounded once. The time-to-convert metric every growth dashboard
    pairs with funnel_signup_click_purchase's conversion counts.

    Memory bound of the exact ``percentile`` aggregate (r15, VERDICT r14
    order 7): the buffer holds one (value, count) entry per DISTINCT
    delta_s in the (single, global) group — integer seconds, so at most
    ~the span of observed delays (days x 86400 entries ~ tens of MB at
    any row count), not one entry per user. Exactness is therefore
    affordable here; a raw-microsecond delta (mostly-distinct values)
    would not be, and the k-bounded sketch path
    (``sketch_quantile_bottomk`` / operators/quantiles.py) is the
    documented 100-TB substitute."""
    ev = load(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    f = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", us)).alias("t_signup"),
        F.min(F.when(F.col("event_type") == "purchase", us)).alias("t_purchase"),
    )
    d = f.filter(
        F.col("t_signup").isNotNull()
        & F.col("t_purchase").isNotNull()
        & (F.col("t_purchase") >= F.col("t_signup"))
    ).select(
        F.expr("(t_purchase - t_signup) div 1000000").alias("delta_s")
    )
    # r15: one array-form percentile buffer instead of two scalar ones
    # (same rationale as agg_quantiles — identical values, half the
    # per-row aggregate-buffer updates for the percentile pair).
    return d.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.expr("percentile(delta_s, array(0.5D, 0.9D))").alias("pq"),
        round_ratio(F.sum("delta_s"), F.count(F.lit(1)), 2).alias("avg_s"),
    ).select(
        "n_users",
        F.round(F.col("pq")[0], 4).alias("p50_s"),
        F.round(F.col("pq")[1], 4).alias("p90_s"),
        "avg_s",
    )


@query(
    "association_rules_parts",
    """
    WITH pairs AS MATERIALIZED (
        SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
    n AS (SELECT count(DISTINCT o) AS n_orders FROM pairs),
    freq AS MATERIALIZED (SELECT p, count(*) AS f FROM pairs GROUP BY p),
    cooc AS MATERIALIZED (
        SELECT a.p AS ante, b.p AS cons, count(*) AS c
        FROM pairs a JOIN pairs b ON a.o = b.o AND a.p != b.p
        GROUP BY 1, 2)
    SELECT ante AS antecedent, cons AS consequent,
           CAST(c AS BIGINT) AS n_baskets,
           CAST(c * 1000000 // n.n_orders AS BIGINT) AS support_ppm,
           CAST(c * 1000000 // fa.f AS BIGINT) AS confidence_ppm,
           CAST((c * 1000000 // fa.f) * n.n_orders // fb.f AS BIGINT)
               AS lift_ppm
    FROM cooc
    JOIN freq fa ON fa.p = ante
    JOIN freq fb ON fb.p = cons
    CROSS JOIN n
    WHERE c >= 2 AND c * 1000000 // fa.f >= 100000
    """,
)
def association_rules_parts(spark, sf_dir):
    """Market-basket ASSOCIATION RULES (ante ⇒ cons) over order baskets:
    support, confidence and lift in exact integer parts-per-million
    (floored rationals — no float accumulation anywhere), mined with the
    co-occurrence join + broadcast-back item frequencies and pruned by
    min-support (c >= 2) and min-confidence (>= 10% — calibrated to this
    corpus's wide, shallow baskets; production tunes both). Apriori's
    pair level — the level that matters in practice; higher-order
    itemsets nest the same plan — mined in BASKET form: ONE shuffle by
    orderkey both dedups and builds each basket (collect_set); UNORDERED
    pairs (sorted array -> per-position tail slice, all codegen array
    ops) are generated map-side and partial-aggregated, so the pair
    stream and the (ante, cons) exchange carry half the k*(k-1) ordered
    volume (31.3 -> 18.2 MB shuffle at sf0.1); both rule directions are
    recovered AFTER the frequency joins by a 2-element struct explode —
    a map-side projection on the distinct-pairs-sized table, so the
    joins and the post-exchange aggregate run once, on half the rows
    (interleaved A/Bs in SCALING.md: 3.7 -> 2.5 CPU s/run vs the union-
    mirror + HOF-filter form). The classic self-join formulation
    reshuffles the item table twice more (both join sides by orderkey);
    at 100 TB that's the difference between one pass over the baskets
    and three. Lift > 1e6 ppm reads 'bought together more than
    chance'."""
    raw = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    baskets = raw.groupBy("l_orderkey").agg(
        F.collect_set("l_partkey").alias("items")
    ).localCheckpoint(eager=False)  # 3 consumers
    n = baskets.agg(F.count(F.lit(1)).alias("n_orders"))
    freq = baskets.select(F.explode("items").alias("l_partkey")).groupBy(
        "l_partkey"
    ).agg(F.count(F.lit(1)).alias("f"))
    # Pair counts are symmetric (c[a,b] == c[b,a]): count each UNORDERED
    # pair once. sort_array + posexplode + slice generates exactly the
    # cons-after-ante combinations with codegen-friendly array ops —
    # interleaved A/B vs the filter(items, x -> x > ante) lambda form:
    # 2.5 vs 3.0 CPU s/run (the HOF lambda is evaluated interpreted,
    # per element; slice is one array copy per ante).
    cooc_half = (
        baskets.select(F.sort_array("items").alias("items"))
        .select(F.posexplode("items").alias("i", "ante"), "items")
        .select(
            "ante",
            F.explode(F.expr("slice(items, i + 2, size(items))")).alias("cons"),
        )
        .groupBy("ante", "cons")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # Both rule directions are recovered AFTER the frequency joins by a
    # 2-element struct explode (a map-side projection), not by a union
    # mirror of the aggregated pair table: the union form re-ran the
    # post-exchange final aggregate and both broadcast joins on 2x the
    # rows (interleaved A/B: union 3.7 vs explode-mirror 3.0 CPU s/run,
    # identical 98-row output; the half-pair exchange itself was already
    # AQE-reused either way).
    fa = freq.select(F.col("l_partkey").alias("ante"), F.col("f").alias("fa"))
    fb = freq.select(F.col("l_partkey").alias("cons"), F.col("f").alias("fb"))
    half = (
        cooc_half.join(F.broadcast(fa), "ante")
        .join(F.broadcast(fb), "cons")
        .crossJoin(F.broadcast(n))
    )
    both = half.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("ante").alias("antecedent"),
                    F.col("cons").alias("consequent"),
                    F.col("fa").alias("f_ante"),
                    F.col("fb").alias("f_cons"),
                ),
                F.struct(
                    F.col("cons").alias("antecedent"),
                    F.col("ante").alias("consequent"),
                    F.col("fb").alias("f_ante"),
                    F.col("fa").alias("f_cons"),
                ),
            )
        ).alias("e"),
        "c",
        "n_orders",
    ).select("e.*", "c", "n_orders")
    conf = F.expr("c * 1000000 div f_ante")
    return (
        both.filter((F.col("c") >= 2) & (conf >= 100_000))
        .select(
            "antecedent",
            "consequent",
            F.col("c").cast("long").alias("n_baskets"),
            F.expr("c * 1000000 div n_orders").cast("long").alias("support_ppm"),
            conf.cast("long").alias("confidence_ppm"),
            F.expr("(c * 1000000 div f_ante) * n_orders div f_cons")
            .cast("long")
            .alias("lift_ppm"),
        )
    )


_PSI_BANDS = [0, 50_000, 100_000, 150_000, 200_000, 300_000, 400_000]  # cents


def _psi_oracle() -> str:
    edges = _PSI_BANDS + [None]
    bucket_case = "CASE " + " ".join(
        f"WHEN cents < {hi} THEN {i}"
        for i, hi in enumerate(_PSI_BANDS[1:])
    ) + f" ELSE {len(_PSI_BANDS) - 1} END"
    term = (
        "COALESCE(max(CASE WHEN bucket = {B} AND ac > 0 AND bc > 0 THEN"
        " round(((ac * 1.0 / ta) - (bc * 1.0 / tb))"
        " * ln((ac * 1.0 / ta) / (bc * 1.0 / tb)), 8) END), 0)"
    )
    terms = " + ".join(term.format(B=i) for i in range(len(_PSI_BANDS)))
    return f"""
    WITH x AS MATERIALIZED (
        SELECT CASE WHEN o_orderdate < TIMESTAMP '1996-01-01'
                    THEN 'a' ELSE 'b' END AS era,
               {bucket_case} AS bucket
        FROM (SELECT o_orderdate,
                     CAST(round(o_totalprice * 100) AS BIGINT) AS cents
              FROM orders
              WHERE o_orderdate >= TIMESTAMP '1995-01-01'
                AND o_orderdate < TIMESTAMP '1997-01-01')),
    cnt AS (
        SELECT bucket,
               count(*) FILTER (WHERE era = 'a') AS ac,
               count(*) FILTER (WHERE era = 'b') AS bc
        FROM x GROUP BY bucket),
    tot AS (SELECT sum(ac) AS ta, sum(bc) AS tb FROM cnt)
    SELECT CAST(tot.ta AS BIGINT) AS n_1995,
           CAST(tot.tb AS BIGINT) AS n_1996,
           round({terms}, 6) AS psi
    FROM cnt CROSS JOIN tot
    GROUP BY tot.ta, tot.tb
    """


@query("psi_order_price_drift", _psi_oracle())
def psi_order_price_drift(spark, sf_dir):
    """Population Stability Index of the order-price distribution, 1995
    vs 1996 — the model-monitoring drift score (PSI > 0.2 = retrain).
    Fixed price bands (so the metric is comparable across runs — the
    production convention), integer-cents bucketing, and the per-bucket
    PSI terms rounded to 8 and summed in one FIXED written order (the
    BM25/KL float discipline). A band empty on either side contributes
    ZERO (guarded identically in both engines — the convention short of
    full Laplace smoothing), so toy scale factors with sparse bands
    neither divide by zero nor diverge from the oracle. One scan, one
    tiny pivot."""
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1995-01-01")
        & (F.col("o_orderdate") < "1997-01-01")
    )
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    bucket = F.lit(len(_PSI_BANDS) - 1)
    for i, hi in reversed(list(enumerate(_PSI_BANDS[1:]))):
        bucket = F.when(cents < hi, F.lit(i)).otherwise(bucket)
    era = F.when(F.col("o_orderdate") < "1996-01-01", "a").otherwise("b")
    cnt = (
        o.select(era.alias("era"), bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count(F.when(F.col("era") == "a", 1)).alias("ac"),
            F.count(F.when(F.col("era") == "b", 1)).alias("bc"),
        )
    )
    tot = cnt.agg(F.sum("ac").alias("at"), F.sum("bc").alias("bt"))
    j = cnt.crossJoin(F.broadcast(tot))
    pa = F.col("ac") * 1.0 / F.col("at")
    pb = F.col("bc") * 1.0 / F.col("bt")
    term = F.when(
        (F.col("ac") > 0) & (F.col("bc") > 0),
        F.round((pa - pb) * F.log(pa / pb), 8),
    )
    parts = [
        F.coalesce(F.max(F.when(F.col("bucket") == i, term)), F.lit(0.0))
        for i in range(len(_PSI_BANDS))
    ]
    total = parts[0]
    for c in parts[1:]:
        total = total + c
    return j.groupBy().agg(
        F.max("at").cast("long").alias("n_1995"),
        F.max("bt").cast("long").alias("n_1996"),
        F.round(total, 6).alias("psi"),
    )


def _sampled_mad_oracle(k: int = 1024) -> str:
    # (l_orderkey, l_linenumber) is NOT unique in the synthetic lineitem
    # (11.8k dupes at sf0.01); folding part/supp keys AND the price into
    # the row id makes hash ties VALUE-identical. The sample replays the
    # engine's pre-cut semantics exactly: k smallest DISTINCT rank
    # hashes per group, min value per hash (duplicate identities — same
    # hash, same folded value — collapse in both engines, so replayed
    # rows can never occupy two sample slots; post-dedup ORDER BY rh is
    # a total order, no tie-break column needed).
    rid = (
        "CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR)"
        " || '-' || CAST(l_partkey AS VARCHAR)"
        " || '-' || CAST(l_suppkey AS VARCHAR)"
        " || '-' || CAST(CAST(round(l_extendedprice * 100) AS BIGINT) AS VARCHAR)"
    )
    rh = f"CAST('0x' || substr(md5({rid} || '#41'), 1, 15) AS BIGINT)"
    return f"""
    WITH x AS MATERIALIZED (
        SELECT l_returnflag AS rf, l_extendedprice AS v,
               {rh} AS rh
        FROM lineitem),
    s AS MATERIALIZED (
        SELECT rf, rh, min(v) AS v FROM x GROUP BY rf, rh
        QUALIFY row_number() OVER (PARTITION BY rf ORDER BY rh) <= {k}),
    med AS MATERIALIZED (
        SELECT rf, count(*) AS sample_k,
               quantile_cont(v, 0.5) AS est_med
        FROM s GROUP BY rf),
    mad AS MATERIALIZED (
        SELECT s.rf, quantile_cont(abs(s.v - med.est_med), 0.5) AS est_mad
        FROM s JOIN med ON med.rf = s.rf GROUP BY s.rf)
    SELECT x.rf AS l_returnflag,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(max(med.sample_k) AS BIGINT) AS sample_k,
           round(max(med.est_med), 4) AS est_med,
           round(max(mad.est_mad), 4) AS est_mad,
           CAST(sum(CASE WHEN abs(0.6745 * (x.v - med.est_med) / mad.est_mad)
                              > 3.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM x
    JOIN med ON med.rf = x.rf
    JOIN mad ON mad.rf = x.rf
    GROUP BY x.rf
    """


@query("robust_outlier_prices_sampled", _sampled_mad_oracle())
def robust_outlier_prices_sampled(spark, sf_dir):
    """The 100 TB path for robust_outlier_prices: median and MAD
    estimated from the per-group bottom-k=1024 hash-rank sample
    (operators/quantiles — ±~3% rank error by DKW) instead of two exact
    sorts over the full data; the full scan happens ONCE, only to count
    flags against the broadcast (k-bounded) estimates. The sample is
    md5-deterministic, so unlike t-digest this sketch replays in SQL and
    the oracle checks the estimates and flag counts EXACTLY — same
    pattern as stream_quantile_sketch.

    Scale shape (the round-4 "one scale-killer" fix): rank_hash is
    computed AT THE SCAN and the row-identity string never leaves it —
    bottomk_precut cuts every input partition to its own per-rf
    bottom-k with zero shuffle, so the only corpus-wide movement is
    (rf, v, rh) candidates, <= 1024 per (rf x input-partition). At 100
    TB / 800k input splits that is <= 2.5 G candidate rows of 3 narrow
    columns merged by a fully-parallel hash aggregate + salted two-level
    cut — vs the previous fixed-192-partition window sort of the entire
    corpus WITH a ~40-byte id payload (~500 GB per sort partition)."""
    from .operators.quantiles import bottomk_precut, merge_bottomk_hash, with_rank_hash

    base = load(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("rf"),
        F.col("l_extendedprice").alias("v"),
        # see _sampled_mad_oracle: id folds in part/supp/price so
        # hash ties are value-identical (duplicate (orderkey,
        # linenumber) rows exist in this data)
        F.concat_ws(
            "-",
            F.col("l_orderkey").cast("string"),
            F.col("l_linenumber").cast("string"),
            F.col("l_partkey").cast("string"),
            F.col("l_suppkey").cast("string"),
            F.round(F.col("l_extendedprice") * 100).cast("long").cast("string"),
        ).alias("rid"),
    )
    # hash computed pre-exchange, id string dropped in the same scan
    # projection; only (rf, v, rank_hash) is ever materialized
    li = with_rank_hash(base, "rid").drop("rid").localCheckpoint(
        eager=False
    )  # sample + final count scan
    pre = bottomk_precut(li, ["rf"], "v", k=1024)
    s = merge_bottomk_hash(pre, ["rf"], k=1024).localCheckpoint(
        eager=False
    )  # med + mad passes
    med = s.groupBy("rf").agg(
        F.count(F.lit(1)).cast("long").alias("sample_k"),
        F.expr("percentile(value, 0.5)").alias("est_med"),
    )
    mad = (
        s.join(F.broadcast(med.select("rf", "est_med")), "rf")
        .groupBy("rf")
        .agg(F.expr("percentile(abs(value - est_med), 0.5)").alias("est_mad"))
    )
    return (
        li.join(F.broadcast(med), "rf")
        .join(F.broadcast(mad), "rf")
        .groupBy("rf")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.max("sample_k").alias("sample_k"),
            F.round(F.max("est_med"), 4).alias("est_med"),
            F.round(F.max("est_mad"), 4).alias("est_mad"),
            F.sum(
                F.when(
                    F.abs(
                        0.6745 * (F.col("v") - F.col("est_med")) / F.col("est_mad")
                    )
                    > 3.5,
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers"),
        )
        .select(
            F.col("rf").alias("l_returnflag"),
            "n_items",
            "sample_k",
            "est_med",
            "est_mad",
            "n_outliers",
        )
    )

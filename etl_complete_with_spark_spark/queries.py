"""Query catalog: every implemented operator exposed as (spark, sf_dir) -> DataFrame.

This is the engine's public query surface and the driver's correctness
gate: each entry in ``QUERIES`` has a matching DuckDB oracle in ``ORACLE``
(same column aliases — the driver hash-compares values after sorting
columns by name). Queries marked oracle-less (genuinely non-SQL ops) get
a rows-only check.

Organization mirrors SURVEY.md §2: reference-parity operators first
(extraction predicates, probes, transforms, dedup/merge), then the
analytics surface the rebuild exposes through Spark (joins, aggs,
windows), then the large-scale training-data operators (dedup families,
similarity search, text analysis, multimodal).

Float discipline: any aggregate built from double arithmetic is
``round(x, 2)``-ed in BOTH engines so the value-hash is stable across
summation orders; pass-through doubles compare exactly.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .operators.transforms import (
    dedup_by_key,
    quality_check_dateformat,
    with_surrogate_key,
    work_to_trusted_transform,
)

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}

BATCH_TS = "2024-01-01 00:00:00"  # fixed batch timestamp for deterministic oracles


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # The whole oracle contract assumes UTC timestamps (DuckDB is
    # UTC-naive); pin it on the caller's session — the driver's session
    # may not come from our factory.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        # events.parquet is TIMESTAMP(NANOS) — unreadable without this
        # (runtime-settable) conf. Set defensively: the caller's session
        # (e.g. the driver's) may not come from our session factory.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    # events.ts is parquet TIMESTAMP(NANOS); what Spark hands back depends
    # on the runtime: older builds honor nanosAsLong (int64 nanos), newer
    # ones (4.1.2+) ignore it and read NANOS natively as TIMESTAMP_NTZ in
    # microseconds. Normalize BOTH to a plain UTC timestamp so every
    # downstream query (window, lag, cast-to-bigint epoch math) sees one
    # stable type regardless of image. `div` keeps the nanos arithmetic in
    # exact int64; the NTZ->timestamp cast is value-preserving because the
    # session timezone is pinned to UTC above.
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def rev_e4(prefix: str = "") -> "F.Column":
    """Exact integer lineitem revenue ``price * (1 - discount)`` in
    1e-4-dollar units. Prices and discounts are cents-exact in the data
    (verified to representation error), so
    ``round(price*100) * (100 - round(discount*100))`` is an exact
    integer — and integer sums are ORDER-INDEPENDENT where double sums
    are not. Found by the r13 sf0.5 fixture sweep: q9's per-(nation,
    year) double revenue sum landed within an ulp of a half-cent
    rounding boundary, and Spark and DuckDB (different summation orders)
    rounded opposite ways. Long arithmetic (ANSI: overflow raises, never
    wraps) keeps the agg in whole-stage codegen at ~1/2 the cost of a
    decimal sum; per-row magnitude <= ~1.1e9 gives ~8e9 rows of
    per-group headroom (a full sf1000 lineitem in ONE group still
    fits); past that, cast to decimal(38,0) at the measured ~2x agg
    cost (SCALING.md r13)."""
    cents = F.round(F.col(f"{prefix}l_extendedprice") * 100).cast("long")
    disc = F.round(F.col(f"{prefix}l_discount") * 100).cast("long")
    return cents * (100 - disc)


def sum_money(e4: "F.Column", unit: float = 10000.0) -> "F.Column":
    """Exact integer money total -> dollars at 2dp, identical across
    engines. ``unit`` = integer units per dollar (100 = cents, 10000 =
    rev_e4, 1e6 = the charge form).

    The exact total can sit EXACTLY on a half-cent (the r13 sf0.5 sweep
    caught q9 at ...355.045: Spark round() is HALF_UP on the decimal
    repr, DuckDB rounds the binary double — one cent apart on the same
    integer). So the half-cent is resolved in INTEGER space:
    ``floor((total + k/2) / k)`` cents (k = units per cent) computed in
    decimal(38,0) arithmetic — NEVER through a double (r13 shipped the
    offset on a double sum, which silently capped exactness at 2^53
    e4-units, ~$900B/group at unit=10000 — ~1000x under the long-
    overflow envelope rev_e4 documents; r13 ADVICE). floor/offset in
    decimal is exact for every total a long sum can produce, so the
    landed CENT is exact all the way to the 2^63 sum overflow (which
    raises — ANSI is pinned in session.get_spark). Ties round toward
    +infinity, floor semantics in both engines, so parity holds for any
    sign. The only double in the path is the final cents->dollars
    report: exact while cents <= 2^53 (~$90T/group), and past ~2^52
    cents a double OUTPUT column cannot resolve single cents at all —
    an output-type limit, not a tie-arithmetic one. For ``unit=100``
    the total already IS cents (no third decimal exists, no tie
    possible) and the offset step is skipped.

    Cost: the decimal ops run once per GROUP in the final agg
    projection; the per-row hot path (the long ``e4`` column and its
    map-side partial sum) is untouched."""
    k = int(unit) // 100
    s = F.sum(e4)
    if k == 1:
        return F.round(s.cast("double") / 100.0, 2)
    cents = F.floor((s.cast("decimal(38,0)") + F.lit(k // 2)) / F.lit(k))
    return F.round(cents.cast("double") / 100.0, 2)


def money_sum_sql(e4_sql: str, unit: float = 10000.0) -> str:
    """DuckDB twin of :func:`sum_money` (sum as BIGINT -> HUGEINT,
    exact; identical integer floor-offset tie handling). DuckDB's
    ``//`` TRUNCATES toward zero on negatives where Spark's
    floor(decimal) floors toward -infinity, so the floor-div is spelled
    ``(x - nonneg_mod(x, k)) // k``: the numerator is an exact multiple
    of k, where truncation == floor for any sign."""
    k = int(unit) // 100
    if k == 1:
        return f"round(CAST(sum({e4_sql}) AS DOUBLE) / 100.0, 2)"
    x = f"(sum({e4_sql}) + {k // 2})"
    return (
        f"round(CAST(({x} - (({x} % {k} + {k}) % {k})) // {k} AS DOUBLE)"
        f" / 100.0, 2)"
    )


def rev_e4_sql(prefix: str = "") -> str:
    """DuckDB twin of :func:`rev_e4` (sum as BIGINT -> HUGEINT, exact)."""
    return (
        f"(CAST(round({prefix}l_extendedprice * 100) AS BIGINT)"
        f" * (100 - CAST(round({prefix}l_discount * 100) AS BIGINT)))"
    )


def rev_sum_sql(prefix: str = "") -> str:
    """DuckDB twin of ``sum_money(rev_e4())``."""
    return money_sum_sql(rev_e4_sql(prefix))


def query(name: str, oracle: str | None = None):
    """Register a catalog entry (and its DuckDB oracle, if expressible)."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


# ===========================================================================
# Reference parity — extraction predicates & probes (SURVEY §2.1, §2.3)
# ===========================================================================

@query(
    "filter_range_halfopen",
    """
    SELECT * FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
    """,
)
def filter_range_halfopen(spark, sf_dir):
    """P1: the half-open slice predicate `pc >= start AND pc < end` that the
    reference compiles into its JDBC pushdown subquery
    (reference: shared_etls/etls/utils.py:270-287). Expressed declaratively so
    Catalyst pushes it into the parquet scan (or through JDBC at prod)."""
    return load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01 00:00:00").cast("timestamp"))
    )


@query(
    "filter_between_inclusive",
    """
    SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props
    FROM events WHERE event_id BETWEEN 1000 AND 2000
    """,
)
def filter_between_inclusive(spark, sf_dir):
    """P2: the *inclusive* BETWEEN slice used on the MongoDB read path
    (reference: shared_etls/etls/load_utils.py:90,100)."""
    return load(spark, sf_dir, "events").filter(F.col("event_id").between(1000, 2000))


@query(
    "probe_bounds_date",
    "SELECT min(o_orderdate) AS min_pc, max(o_orderdate) AS max_pc FROM orders",
)
def probe_bounds_date(spark, sf_dir):
    """S2/S3 (date mode): min/max partition-column probes the reference pushes
    as `(select min(pc) from T) subs` (load_utils.py:343,497). With a DSv2
    source Spark pushes this aggregate down; on parquet it's a
    stats-only scan."""
    return load(spark, sf_dir, "orders").agg(
        F.min("o_orderdate").alias("min_pc"), F.max("o_orderdate").alias("max_pc")
    )


@query(
    "probe_bounds_int",
    """
    SELECT min(event_id) AS min_pc, max(event_id) AS max_pc,
           max(event_id) + 300000 AS max_with_headroom
    FROM events
    """,
)
def probe_bounds_int(spark, sf_dir):
    """S5/S6 (int mode) incl. the +300000 safety headroom the reference adds
    to the upper bound (load_utils.py:407,445,490,517) — harmless over-scan
    under the half-open predicate."""
    return load(spark, sf_dir, "events").agg(
        F.min("event_id").alias("min_pc"),
        F.max("event_id").alias("max_pc"),
        (F.max("event_id") + F.lit(300000)).alias("max_with_headroom"),
    )


@query(
    "jdbc_resync_orders",
    """
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate
    FROM orders WHERE o_orderkey < 4000
    """,
)
def jdbc_resync_orders(spark, sf_dir):
    """S1-S3 against a LIVE JDBC database — the reference's actual
    extraction lifecycle (carga_int.py:32-216), not a parquet stand-in.
    Stages an embedded Apache Derby DB (Derby ships in Spark's jars),
    seeds it from the orders table, then replays the reference flow:
    MIN/MAX probes pushed to the DB (load_utils.py:306-362, 460-526),
    half-open slices, and ONE parallel ``predicates=`` range read (one
    task per slice) where the reference looped sequential jobs. The
    oracle is the source table itself, so the whole DB round-trip
    (BIGINT/DOUBLE/VARCHAR/TIMESTAMP fidelity included) is value-hashed.
    """
    import tempfile

    from .slicing import int_intervals
    from .sources.jdbc import DERBY_DRIVER, JdbcSource, derby_url, seed_jdbc_table

    opts = {"driver": DERBY_DRIVER}
    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate"]
    src = (
        load(spark, sf_dir, "orders")
        .select(*cols)
        .filter(F.col("o_orderkey") < 4000)
    )
    # One deterministic DB dir per Spark app, NOT mkdtemp per invocation:
    # each mkdtemp booted (and leaked) a fresh embedded Derby instance +
    # /tmp directory per gate run; reusing the path keeps it to one, and
    # the overwrite-mode seed below handles reseeding on repeat calls.
    db_dir = os.path.join(
        tempfile.gettempdir(),
        f"derby_resync_{spark.sparkContext.applicationId}",
    )
    url = derby_url(db_dir)
    seed_jdbc_table(src, url, "ORDERS", options=opts)

    jd = JdbcSource(url, "ORDERS", "o_orderkey", options=opts)
    lo = jd.probe_min(spark)
    hi = jd.probe_max(spark)
    out = jd.read_range(spark, int_intervals(lo, hi + 1, 1000))
    return out.toDF(*[c.lower() for c in out.columns])


# ===========================================================================
# Reference parity — transforms (SURVEY §2.7, §2.11)
# ===========================================================================

@query(
    "sk_hyphen",
    """
    SELECT c_custkey,
           md5(concat_ws('-', CAST(c_custkey AS VARCHAR), c_name)) AS sk
    FROM customer
    """,
)
def sk_hyphen(spark, sf_dir):
    """F1-F3 hyphen mode: md5(concat_ws('-', keys)) surrogate key
    (reference: utils.py:688-695). concat_ws skips NULL components."""
    df = load(spark, sf_dir, "customer")
    return with_surrogate_key(df, ["c_custkey", "c_name"]).select("c_custkey", "sk")


@query(
    "sk_concat",
    # `||` (not DuckDB concat()) to mirror Spark concat's NULL-strictness.
    "SELECT c_custkey, md5(CAST(c_custkey AS VARCHAR) || c_name) AS sk FROM customer",
)
def sk_concat(spark, sf_dir):
    """F1/F3 no-separator mode (reference: utils.py:698-700): NULL-strict,
    boundary-collision-prone; kept for compatibility (SURVEY §2.11)."""
    df = load(spark, sf_dir, "customer")
    return with_surrogate_key(df, ["c_custkey", "c_name"], hyphen_separator=False).select(
        "c_custkey", "sk"
    )


@query(
    "quality_check_dates",
    """
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderpriority,
           CASE WHEN year(o_orderdate) >= 10 THEN o_orderdate END AS o_orderdate
    FROM orders
    """,
)
def quality_check_dates(spark, sf_dir):
    """P4: null out corrupt pre-year-10 date/timestamp values, columns
    discovered by dtype (reference: utils.py:722-751, boundary at :741)."""
    return quality_check_dateformat(load(spark, sf_dir, "orders"))


@query(
    "dedup_latest_per_key",
    """
    SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props FROM (
        SELECT *, row_number() OVER (
            PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS __rn
        FROM events) t
    WHERE __rn = 1
    """,
)
def dedup_latest_per_key(spark, sf_dir):
    """A3, deterministic variant: the reference's dropDuplicates(["sk"])
    (utils.py:817) keeps an arbitrary row; the rebuild's testable form keeps
    the latest by (ts, event_id) via one row_number window — a single
    shuffle on the key, same as the hash-aggregate dedup.

    r15 plan-audit note: this rank-1 window is ALREADY shuffle-minimal —
    Spark 4 plans a map-side ``WindowGroupLimit`` below the exchange
    (plans/r15/dedup_latest_per_key_before.txt: Sort + WindowGroupLimit
    BEFORE Exchange), so at most one candidate row per (map partition,
    key) is shuffled. A ``max_by(struct(...), struct(ts, event_id))``
    twin was A/B'd and REJECTED: struct ordering keys are not
    hash-aggregate compatible, so it plans as Sort + SortAggregate on
    BOTH sides of the exchange (same sorts, no pruning through the
    struct), CPU flat-to-noise (0.61 vs 0.55 s/run). See
    OPTIMIZATION_r15.md."""
    df = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
    )


@query(
    "pipeline_work_to_trusted",
    f"""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderpriority,
           CASE WHEN year(o_orderdate) >= 10 THEN o_orderdate END AS o_orderdate,
           md5(concat_ws('-', CAST(o_orderkey AS VARCHAR))) AS sk,
           TIMESTAMP '{BATCH_TS}' AS timestamp_kafka
    FROM orders
    """,
)
def pipeline_work_to_trusted(spark, sf_dir):
    """SURVEY §2.11 — the flagship composite chain (reference:
    utils.py:754-819): scan -> surrogate key -> batch timestamp ->
    date-quality -> dedup-by-sk. All narrow steps fuse into one codegen
    stage; the dedup is the single shuffle. o_orderkey is unique so the
    dedup is a semantic no-op here (the oracle needs no window)."""
    orders = load(spark, sf_dir, "orders")
    return work_to_trusted_transform(orders, ["o_orderkey"], batch_ts=BATCH_TS)


# ===========================================================================
# Analytics surface (joins/aggs/windows the rebuild exposes via Spark —
# SURVEY §2.4-§2.6 notes these absent in the reference; they're table
# stakes for the engine and the bench headliners)
# ===========================================================================

@query(
    "agg_pricing_summary",
    f"""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                        AS sum_qty,
           {money_sum_sql("CAST(round(l_extendedprice * 100) AS BIGINT)", 100.0)}
               AS sum_base_price,
           {rev_sum_sql()} AS sum_disc_price,
           {money_sum_sql(rev_e4_sql()
                          + " * (100 + CAST(round(l_tax * 100) AS BIGINT))",
                          1000000.0)} AS sum_charge,
           round(avg(l_quantity), 2)                                        AS avg_qty,
           round(avg(l_extendedprice), 2)                                   AS avg_price,
           round(avg(l_discount), 4)                                        AS avg_disc,
           count(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_pricing_summary(spark, sf_dir):
    """TPC-H Q1-style pricing summary: scan-side filter + partial/final hash
    aggregate (map-side combine shrinks the shuffle to |groups| rows —
    the shape that survives 100 TB). Money sums run in exact integer
    units (see :func:`rev_e4`: order-independent where double sums are
    not); quantity/average sums stay double — quantities are integral
    (exact at any order) and averages divide before the boundary can
    matter. The charge sum's per-row magnitude (~1.1e11 in 1e-6-dollar
    units) keeps ~8e7 rows of per-group long headroom, loud-raising
    (ANSI) past it; the decimal(38,0) fallback costs ~2x (SCALING.md
    r13)."""
    li = load(spark, sf_dir, "lineitem")
    tax = F.round(F.col("l_tax") * 100).cast("long")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            sum_money(cents, 100.0).alias("sum_base_price"),
            sum_money(rev_e4()).alias("sum_disc_price"),
            sum_money(rev_e4() * (100 + tax), 1000000.0).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "join_revenue_by_nation",
    f"""
    SELECT n_name,
           {rev_sum_sql()} AS revenue,
           count(*) AS n_items
    FROM customer
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN orders   ON o_custkey   = c_custkey
    JOIN lineitem ON l_orderkey  = o_orderkey
    GROUP BY n_name
    """,
)
def join_revenue_by_nation(spark, sf_dir):
    """Multi-join rollup (Q5-ish). nation (25 rows) is explicitly broadcast;
    customer is small relative to lineitem so AQE picks broadcast for it at
    these SFs, while the lineitem-orders join shuffles on the key — the
    right 100 TB shape. That orderkey exchange is invisible at sf0.1
    (AQE broadcasts orders) and costs 104 MB at sf1.0; the measured
    remedy for a pipeline that hits this axis repeatedly is the
    bucketed layout (`operators/layout.write_bucketed` — exchange
    104.34 -> 0.06 MB, wall halved at sf1.0, SCALING.md r15), and the
    `bench.py --sf10` shape gate watches the transition round-over-
    round."""
    cust = load(spark, sf_dir, "customer")
    nat = load(spark, sf_dir, "nation")
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    return (
        cust.join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .join(orders, orders.o_custkey == cust.c_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("n_name")
        .agg(
            sum_money(rev_e4()).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "topk_orders_per_customer",
    """
    SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
        FROM orders) t
    WHERE rk <= 3
    """,
)
def topk_orders_per_customer(spark, sf_dir):
    """Top-K per group via rank window — one shuffle on the group key. At
    scale Spark's WindowGroupLimit pushes the k-limit below the sort."""
    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rk")
    )


# Register the training-data operator catalog (text/dedup/similarity) into
# the same QUERIES/ORACLE dicts. Import at module end to avoid a cycle.
from . import queries_training  # noqa: E402,F401
from . import queries_analytics  # noqa: E402,F401
from . import queries_tpch  # noqa: E402,F401

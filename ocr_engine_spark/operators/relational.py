"""Relational query surface over the TPC-H-ish test tables.

The reference engine has no relational layer; these operators exercise the engine's
built-in Catalyst surface (joins incl. broadcast/semi/anti/as-of, aggregations, windows,
range filters) that the transcript pipeline composes with at scale (SURVEY.md §2.3/§2.5).

Determinism rules for the DuckDB-oracle contract:
- sums/avgs of doubles go through DECIMAL so the result is order-independent and
  bit-identical across engines;
- every ORDER BY carries a total tie-break key;
- every computed column is aliased identically to the oracle SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.functions import broadcast


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _dsum(col: str, alias: str, scale: int = 2):
    """Order-independent double sum: exact decimal accumulation, double result."""
    return F.sum(F.col(col).cast("decimal(30,6)")).cast("double").alias(alias)


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 analogue: map-side-combinable aggregation, no join, one shuffle."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("2024-09-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum("l_quantity", "sum_qty"),
            _dsum("l_extendedprice", "sum_base_price"),
            F.sum(
                (F.col("l_extendedprice").cast("decimal(18,6)")
                 * (F.lit(1).cast("decimal(8,6)")
                    - F.col("l_discount").cast("decimal(8,6)")))
            ).cast("double").alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 analogue: fact-fact join + broadcast dim + global top-k with total
    ordering (revenue desc, orderkey asc)."""
    cust = load(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderkey")
        .agg(
            F.sum(
                (F.col("l_extendedprice").cast("decimal(18,6)")
                 * (F.lit(1).cast("decimal(8,6)")
                    - F.col("l_discount").cast("decimal(8,6)")))
            ).cast("double").alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


def q_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-ish: star join through broadcast dimensions -> per-region revenue."""
    region = load(spark, sf_dir, "region")
    nation = load(spark, sf_dir, "nation")
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.sum(
                (F.col("l_extendedprice").cast("decimal(18,6)")
                 * (F.lit(1).cast("decimal(8,6)")
                    - F.col("l_discount").cast("decimal(8,6)")))
            ).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def q_parts_with_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi join (J3-style manifest filtering): parts that actually shipped."""
    part = load(spark, sf_dir, "part")
    li = load(spark, sf_dir, "lineitem")
    return (
        part.join(li, part.p_partkey == li.l_partkey, "left_semi")
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n_parts"))
    )


def q_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join: the resume protocol's shape (pending = all \\ done).

    Scoped to orders since 2000-01-01 (the churn question a pipeline actually
    asks) so the anti-join PRODUCES rows at every test scale factor — the
    unfiltered spelling matched on empty output (every customer has some
    order), which proved nothing about the anti-join path."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


def q_event_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window functions with total ordering: first 3 events per user + lagged value
    (O1/O2 ordering analogue at the relational layer)."""
    from pyspark.sql.window import Window

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .withColumn("prev_value", F.lag("value").over(w))
        .where(F.col("rn") <= 3)
        .select("user_id", "event_id", "rn", "prev_value")
    )


def q_hourly_event_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregation (the streaming metrics window, batch spelling)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _dsum("value", "sum_value"),
        )
    )


def q_asof_last_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each purchase event, the customer's most recent order at event
    time (SURVEY.md §2.3 — the graft engine's as-of surface).

    True as-of merge: union orders and events on a shared timeline per user, then ONE
    running window (rows unbounded preceding) carries last-order-time and prior-order
    count to each event row.  Intermediate cardinality is O(events + orders) — never
    the O(events x prior-orders) row explosion of the naive range-join + groupBy
    spelling (a heavy user with 10^4 orders x 10^4 events would be 10^8 rows there).
    Orders sort BEFORE events at equal timestamps (is_order desc) so the
    ``o_orderdate <= ts`` inclusive bound holds.
    """
    from pyspark.sql.window import Window

    ev = (
        load(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .select("user_id", F.col("ts").alias("t"),
                F.lit(0).alias("is_order"), "event_id")
    )
    orders = load(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"), F.col("o_orderdate").alias("t"),
        F.lit(1).alias("is_order"), F.lit(None).cast("long").alias("event_id"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("t"), F.desc("is_order"), F.asc("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    timeline = orders.unionByName(ev).select(
        "event_id", "is_order",
        F.max(F.when(F.col("is_order") == 1, F.col("t"))).over(w)
        .alias("last_order_ts"),
        F.sum("is_order").over(w).alias("n_prior_orders"),
    )
    return (
        timeline.where(F.col("is_order") == 0)
        .select("event_id", "last_order_ts", "n_prior_orders")
    )


def q_event_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolation percentiles per event type (the ordered-set
    aggregate surface).  Exact `percentile` (one sort per group) is the
    correctness reference; at 100 TB the engine would swap in
    `percentile_approx` (a mergeable KLL-style sketch, no per-group sort) and
    accept the documented rank error — the swap is a one-word change because
    both are built-in aggregates.  Rounded to 6 dp so cross-engine
    interpolation arithmetic (ulp-level association differences) cannot break
    the value hash."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
            F.round(F.expr("percentile(value, 0.95)"), 6).alias("p95"),
            F.round(F.expr("percentile(value, 0.99)"), 6).alias("p99"),
        )
    )


def q_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical ROLLUP (region -> nation -> grand total) over the star join —
    the grouping-sets surface (SURVEY.md §2.5 notes it as incidental Catalyst
    capability; exposed here so it is contract-pinned).  NULL grouping levels are
    tagged with grouping() flags so the three levels are distinguishable."""
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(broadcast(region), nation.n_regionkey == region.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            _dsum("o_totalprice", "revenue"),
            F.count(F.lit(1)).alias("n_orders"),
            F.grouping("r_name").cast("int").alias("g_region"),
            F.grouping("n_name").cast("int").alias("g_nation"),
        )
    )


def q_event_range_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range filter + deterministic page (O4 page-range limit analogue)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.where(
            (F.col("ts") >= F.lit("2024-01-10")) & (F.col("ts") < F.lit("2024-01-11"))
        )
        .orderBy("ts", "event_id")
        .limit(100)
        .select("event_id", "ts", "user_id", "event_type", "value")
    )


def _micros_ntz(col: str = "ts"):
    """Exact integer microseconds of a TIMESTAMP_NTZ, timezone-FREE.

    unix_micros() requires TIMESTAMP (LTZ) and any NTZ->LTZ cast injects the
    session timezone into the value; assembling micros from date/time parts is
    tz-independent and equals DuckDB's epoch_us(naive ts) bit-for-bit
    (verified on the events table).  extract(second) carries the fractional
    microseconds as DECIMAL, so the final term is exact too."""
    return (
        F.unix_date(F.to_date(col)).cast("long") * F.lit(86_400_000_000)
        + F.expr(f"extract(hour from {col})").cast("long") * F.lit(3_600_000_000)
        + F.expr(f"extract(minute from {col})").cast("long") * F.lit(60_000_000)
        + F.expr(f"cast(extract(second from {col}) * 1000000 as bigint)")
    )


def q_event_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: a new session starts after a >30-minute gap in a user's
    event stream (the classic batch analogue of streaming session windows).

    One window pass marks session starts (lag over a total order), a running
    sum numbers them, one aggregation summarizes each session — two shuffles on
    user_id total, both map-side-combinable at the second stage.  Gap math uses
    integer microseconds (unix_micros <-> DuckDB epoch_us), so the cross-engine
    value path is exact; double sums go through DECIMAL as usual.
    """
    from pyspark.sql.window import Window

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = _micros_ntz("ts")
    gap = us - F.lag(us).over(w)
    marked = ev.withColumn(
        "new_sess",
        F.when(gap.isNull() | (gap > 1800 * 1_000_000), 1).otherwise(0))
    numbered = marked.withColumn(
        "session_seq",
        F.sum("new_sess").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("int"))
    return (
        numbered.groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("event_id").alias("first_event_id"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            _dsum("value", "sum_value"),
        )
        .withColumn(
            "duration_us",
            (_micros_ntz("session_end") - _micros_ntz("session_start"))
            .cast("bigint"))
    )


def q_event_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE moving aggregate: per event, the trailing-1-hour sum/count/avg
    of the user's values — RANGE BETWEEN 3600s PRECEDING AND CURRENT ROW over
    integer microseconds.  The frame sum accumulates DECIMAL (order-independent,
    peer rows included identically in both engines), the average is one double
    division of deterministic operands — no rounding needed anywhere."""
    from pyspark.sql.window import Window

    ev = load(spark, sf_dir, "events")
    w = (Window.partitionBy("user_id").orderBy(_micros_ntz("ts"))
         .rangeBetween(-3600 * 1_000_000, 0))
    rolled = ev.select(
        "event_id", "user_id",
        F.count(F.lit(1)).over(w).alias("roll_n"),
        F.sum(F.col("value").cast("decimal(30,6)")).over(w)
        .cast("double").alias("roll_sum"),
    )
    return rolled.withColumn(
        "roll_avg", F.col("roll_sum") / F.col("roll_n").cast("double"))

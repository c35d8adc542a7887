"""Beyond-reference relational surface (SURVEY.md §2.3/§2.5/§2.7, §7
phase 4): joins, windows, set ops, grouping sets over the driver's
star schema. The reference is single-table (SURVEY.md §2.3 — no joins
anywhere); Spark provides these natively, so each builder is a thin,
scale-annotated composition.

Scale notes inline per operator; the common rules:
- dims (region, nation, supplier) are broadcast — no shuffle;
- fact-fact joins shuffle on the join key once, and AQE re-plans
  skew at runtime;
- semi/anti joins never materialize the probe side's payload.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEC = T.DecimalType(28, 2)
# Product-friendly widths: (18,2)×(8,2)→(27,4) and ×(8,2) again→(36,6)
# stay under Spark's 38-digit cap, so no scale adjustment / rounding
# ever kicks in and decimal arithmetic is exact on both engines.
D18 = T.DecimalType(18, 2)
D8 = T.DecimalType(8, 2)


def pricing_summary(lineitem: DataFrame, cutoff: str = "1998-09-02") -> DataFrame:
    """TPC-H Q1 shape: the headline scan+agg benchmark. DECIMAL sums
    for bit-deterministic parallel aggregation (float sums are
    order-dependent; decimal is associative); averages are exact-sum ÷
    count so both engines produce the identical double. Single shuffle
    of partial aggregates on a 6-value key."""
    li = lineitem.filter(F.col("l_shipdate") <= F.lit(cutoff).cast("timestamp"))
    qty = F.col("l_quantity").cast(D18)
    price = F.col("l_extendedprice").cast(D18)
    disc_f = (F.lit(1.0) - F.col("l_discount")).cast(D8)
    tax_f = (F.lit(1.0) + F.col("l_tax")).cast(D8)
    n = F.count(F.lit(1))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(price * disc_f).cast("double").alias("sum_disc_price"),
            F.sum(price * disc_f * tax_f).cast("double").alias("sum_charge"),
            (F.sum(qty).cast("double") / n).alias("avg_qty"),
            (F.sum(price).cast("double") / n).alias("avg_price"),
            (F.sum(F.col("l_discount").cast(D8)).cast("double") / n).alias("avg_disc"),
            n.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def revenue_by_nation(
    customer: DataFrame, orders: DataFrame, lineitem: DataFrame, nation: DataFrame, region: DataFrame
) -> DataFrame:
    """TPC-H Q5 shape: star join. nation/region are broadcast (tiny
    dims); lineitem⋈orders shuffles once on orderkey, then on custkey.
    Revenue in DECIMAL → deterministic."""
    rev = F.col("l_extendedprice").cast(D18) * (F.lit(1.0) - F.col("l_discount")).cast(D8)
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"), F.count(F.lit(1)).alias("n_items"))
        .orderBy("r_name", "n_name")
    )


def customers_with_orders(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """LEFT SEMI: EXISTS — probe side payload never shuffled."""
    return customer.join(
        orders, customer["c_custkey"] == orders["o_custkey"], "left_semi"
    ).select("c_custkey", "c_name")


def customers_without_orders(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """LEFT ANTI: NOT EXISTS."""
    return customer.join(
        orders, customer["c_custkey"] == orders["o_custkey"], "left_anti"
    ).select("c_custkey", "c_name")


def top_order_per_customer(orders: DataFrame, k: int = 1) -> DataFrame:
    """Window ranking: top-k orders per customer by totalprice. The
    window shuffles once on custkey; rank prune happens before any
    further join (filter early)."""
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("o_custkey", "o_orderkey", "o_totalprice", F.col("rnk").cast("int").alias("rnk"))
    )


def month_over_month(orders: DataFrame) -> DataFrame:
    """A2 rollup + lag window: month-over-month revenue delta. The
    monthly frame is tiny (months × 1 row), so the window is free."""
    monthly = orders.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("month")
    ).agg(F.sum(F.col("o_totalprice").cast(DEC)).alias("revenue"))
    w = Window.orderBy("month")
    return monthly.select(
        "month",
        F.col("revenue").cast("double").alias("revenue"),
        (F.col("revenue") - F.lag("revenue").over(w)).cast("double").alias("mom_delta"),
    ).orderBy("month")


def status_priority_rollup(orders: DataFrame) -> DataFrame:
    """ROLLUP grouping sets (reference has none; native in Spark)."""
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("total"),
        )
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(), F.col("o_orderpriority").asc_nulls_first()
        )
    )


def shipping_priority(
    customer: DataFrame, orders: DataFrame, lineitem: DataFrame, cutoff: str = "1997-01-01"
) -> DataFrame:
    """TPC-H Q3 shape: top-10 unshipped orders by revenue for one
    segment. Join prunes with pushed date filters on BOTH fact scans;
    TakeOrderedAndProject caps the result without a global sort."""
    rev = F.col("l_extendedprice").cast(D18) * (F.lit(1.0) - F.col("l_discount")).cast(D8)
    cut = F.lit(cutoff).cast("timestamp")
    return (
        lineitem.filter(F.col("l_shipdate") > cut)
        .join(orders.filter(F.col("o_orderdate") < cut), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            customer.filter(F.col("c_mktsegment") == "BUILDING"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("l_orderkey", F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"))
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.col("l_orderkey"))
        .limit(10)
    )


def forecast_revenue(lineitem: DataFrame, year: int = 1996) -> DataFrame:
    """TPC-H Q6 shape: pure scan+filter+scalar agg — the pushdown
    benchmark. All predicates reach the parquet scan."""
    rev = F.col("l_extendedprice").cast(D18) * F.col("l_discount").cast(D8)
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit(f"{year}-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(f"{year + 1}-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.sum(rev).cast("double").alias("revenue"), F.count(F.lit(1)).alias("n_items"))
    )


def large_volume_orders(
    customer: DataFrame, orders: DataFrame, lineitem: DataFrame, min_qty: float = 300.0
) -> DataFrame:
    """TPC-H Q18 shape: HAVING over a fact-side pre-aggregation, then
    semi-joined up the star. Aggregating lineitem FIRST shrinks the
    join probe side from |lineitem| to |qualifying orders|."""
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(D18)).alias("_sumq"))
        .filter(F.col("_sumq") > F.lit(min_qty))
    )
    return (
        big.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            F.col("o_totalprice"),
            F.col("_sumq").cast("double").alias("total_qty"),
        )
        .orderBy(F.desc("o_totalprice"), F.col("o_orderkey"))
        .limit(20)
    )


def pivot_status_by_priority(orders: DataFrame) -> DataFrame:
    """Pivot: order counts, status × priority. Values enumerated
    explicitly — at scale an unenumerated pivot needs an extra
    distinct-scan job to discover columns."""
    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    aliases = ["p_urgent", "p_high", "p_medium", "p_notspec", "p_low"]
    piv = orders.groupBy("o_orderstatus").pivot("o_orderpriority", prios).count()
    return piv.select(
        "o_orderstatus",
        *[F.coalesce(F.col(f"`{p}`"), F.lit(0)).alias(a) for p, a in zip(prios, aliases)],
    ).orderBy("o_orderstatus")


def cube_returns(lineitem: DataFrame) -> DataFrame:
    """CUBE grouping sets over returnflag × linestatus."""
    return (
        lineitem.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast(D18)).cast("double").alias("sum_qty"),
        )
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(), F.col("l_linestatus").asc_nulls_first()
        )
    )


def exact_percentiles(df: DataFrame, col: str, points=(0.25, 0.5, 0.75)) -> DataFrame:
    """Exact linear-interpolation percentiles (type R-7, same method
    as DuckDB quantile_cont). Exact percentile requires a full sort of
    the column per group — at 100 TB swap in approx_percentile
    (KLL/GK sketch, mergeable, one pass); same call shape."""
    pct = F.percentile(F.col(col), F.array(*[F.lit(p) for p in points]))
    return df.agg(
        *[F.round(pct[i], 4).alias(f"p{int(p * 100)}") for i, p in enumerate(points)]
    )


def segment_union_intersect(customer: DataFrame) -> DataFrame:
    """Set ops: customers in BUILDING ∪ (AUTOMOBILE ∩ acctbal>0) —
    exercises union/intersect; Spark plans them as aggregates/joins."""
    a = customer.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = customer.filter(F.col("c_mktsegment") == "AUTOMOBILE").select("c_custkey")
    c = customer.filter(F.col("c_acctbal") > 0).select("c_custkey")
    return a.union(b.intersect(c)).distinct().orderBy("c_custkey")

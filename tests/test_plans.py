"""Plan-shape assertions: the properties that decide 100 TB behavior,
checked in the optimized physical plan so regressions are loud.
(`.explain` equivalents — see README 'Designed-for-100-TB notes'.)"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pengadaan_agent_spark.operators import relational as R
from tests.conftest import SF_DIR


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q6_filters_reach_parquet_scan(spark, tables):
    plan = _plan(R.forecast_revenue(tables["lineitem"]))
    # predicate pushdown: the scan advertises pushed filters, and the
    # projection prunes to exactly the needed columns
    assert "PushedFilters: [" in plan
    assert "l_comment" not in plan  # no such col at all, sanity
    read = plan.split("ReadSchema:")[1].splitlines()[0]
    for col in ("l_shipdate", "l_discount", "l_quantity", "l_extendedprice"):
        assert col in read
    assert "l_orderkey" not in read  # unused column pruned from the scan


def test_topk_is_take_ordered_not_full_sort(spark, tables):
    df = tables["part"].orderBy(F.desc("p_retailprice")).limit(10)
    assert "TakeOrderedAndProject" in _plan(df)


def test_dim_join_is_broadcast(spark, tables):
    df = tables["nation"].join(
        F.broadcast(tables["region"]),
        tables["nation"]["n_regionkey"] == tables["region"]["r_regionkey"],
    )
    assert "BroadcastHashJoin" in _plan(df)


def test_asof_join_single_shuffle(spark, tables):
    """The as-of join must cost ONE exchange (hash on the by-key for
    the window), not a per-key pandas shuffle plus re-sorts."""
    from data_pengadaan_agent_spark.operators.asof import asof_join_backward

    ev = tables["events"]
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"), "user_id", F.col("ts").alias("p_ts")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_id"), "user_id", F.col("ts").alias("c_ts"),
    )
    out = asof_join_backward(
        purchases, clicks, left_on="p_ts", right_on="c_ts", by="user_id",
        right_cols=["c_id"],
    )
    plan = _plan(out)
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Window" in plan


def test_semi_join_carries_no_payload(spark, tables):
    plan = _plan(R.customers_with_orders(tables["customer"], tables["orders"]))
    # the orders side of the semi join reads only its join key
    read_schemas = [
        seg.splitlines()[0] for seg in plan.split("ReadSchema:")[1:]
    ]
    orders_reads = [s for s in read_schemas if "o_custkey" in s]
    assert orders_reads and all("o_totalprice" not in s for s in orders_reads)


def test_pricing_summary_partial_aggregation(spark, tables):
    """Q1 must plan partial (map-side) + final aggregation — one
    shuffle of 6-key partials, never raw rows."""
    plan = _plan(R.pricing_summary(tables["lineitem"]))
    assert plan.count("HashAggregate") >= 2
    assert "Exchange hashpartitioning(l_returnflag" in plan

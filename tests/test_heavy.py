"""Heavy hitters: the candidate-superset guarantee under real pruning
(high cardinality, small capacity), certified results equal the exact
full group-by, the uncertified path degrades honestly, and the plan
never shuffles the full key space."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_pengadaan_agent_spark.operators import heavy as H


def _skewed(spark, n_heavy=8, heavy_cnt=500, n_tail=5000):
    """8 planted heavy values (500 occurrences each) buried under a
    5000-value distinct tail — pruning is guaranteed at capacity 64."""
    rows = [(f"heavy_{i % n_heavy}",) for i in range(n_heavy * heavy_cnt)]
    rows += [(f"tail_{j}",) for j in range(n_tail)]
    return spark.createDataFrame(rows, "v STRING")


def _exact_topk(df, col, k):
    return [
        (r[col], r["c"])
        for r in df.filter(F.col(col).isNotNull())
        .groupBy(col)
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .orderBy(F.desc("c"), F.asc(col))
        .limit(k)
        .collect()
    ]


def test_certified_equals_exact_under_pruning(spark):
    df = _skewed(spark).repartition(8)
    got = H.heavy_hitters(df, "v", k=8, capacity=64).collect()
    assert all(r["certified"] for r in got)
    assert [(r["value"], r["cnt"]) for r in got] == _exact_topk(df, "v", 8)
    assert [r["rank"] for r in got] == list(range(1, 9))


def test_uncertified_when_capacity_too_small(spark):
    """k tail values cannot be certified at tiny capacity: the k-th
    count fails the N/(capacity+1) bound and the verdict says so
    (rather than silently returning a partitioning-dependent set)."""
    df = _skewed(spark, n_heavy=2).repartition(8)
    got = H.heavy_hitters(df, "v", k=10, capacity=16).collect()
    assert not any(r["certified"] for r in got)
    # the two planted heavies still surface exactly, uncertified or not
    assert {r["value"] for r in got[:2]} == {"heavy_0", "heavy_1"}


def test_ties_and_nulls_and_short_results(spark):
    rows = [("a",)] * 5 + [("b",)] * 5 + [("c",)] * 2 + [(None,)] * 7
    df = spark.createDataFrame(rows, "v STRING")
    got = H.heavy_hitters(df, "v", k=2, capacity=512).collect()
    # tie on 5 broken by value asc; nulls never counted
    assert [(r["value"], r["cnt"]) for r in got] == [("a", 5), ("b", 5)]
    assert all(r["certified"] for r in got)
    # fewer distinct values than k: degenerate bound still certifies
    # when capacity+1 > N (nothing could have been pruned)
    few = H.heavy_hitters(df, "v", k=10, capacity=512).collect()
    assert [(r["value"], r["cnt"]) for r in few] == [
        ("a", 5), ("b", 5), ("c", 2)
    ]
    assert all(r["certified"] for r in few)


def test_candidate_superset_property(spark):
    """The mergeable-summaries bound, checked directly: every value
    with count > N/(capacity+1) is in the sketch pass's candidates,
    across an adversarial 3-partition layout."""
    rows = (
        [("x",)] * 300
        + [(f"t{j}",) for j in range(3000)]
        + [("y",)] * 200
    )
    df = spark.createDataFrame(rows, "v STRING").repartition(3)
    vals = df.select("v")
    cand = {
        r["value"]
        for r in vals.mapInPandas(
            H._mg_kernel("v", 50), schema="value string"
        ).collect()
    }
    n = len(rows)
    assert {"x", "y"} <= cand  # 300, 200 both > 3500/51 ≈ 68.6
    # and the bound is meaningful: candidates are few, not everything
    assert len(cand) <= 3 * 50


def test_integer_keys_and_validation(spark):
    df = spark.createDataFrame(
        [(i % 5,) for i in range(100)], "v LONG"
    )
    got = H.heavy_hitters(df, "v", k=3, capacity=100).collect()
    assert [(r["value"], r["cnt"]) for r in got] == [(0, 20), (1, 20), (2, 20)]
    with pytest.raises(ValueError, match="k must be"):
        H.heavy_hitters(df, "v", k=0)
    with pytest.raises(ValueError, match="capacity"):
        H.heavy_hitters(df, "v", k=10, capacity=5)
    bad = spark.createDataFrame([(1.5,)], "v DOUBLE")
    with pytest.raises(ValueError, match="float keys"):
        H.heavy_hitters(bad, "v", k=1)


def test_recount_is_candidate_gated(spark):
    """The exchange before the final count carries only candidate-key
    rows: the plan shows the broadcast semi-join BELOW the aggregate."""
    df = _skewed(spark)
    plan = (
        H.heavy_hitters(df, "v", k=5, capacity=64)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    semi = plan.find("BroadcastHashJoin")
    agg = plan.find("HashAggregate")
    assert semi != -1 and "LeftSemi" in plan
    assert "CartesianProduct" not in plan

"""Exact-quantile selection: value-exact vs a sorted-list oracle on
adversarial shapes (mass duplicates, two-point slices, skew, tiny
groups, extreme q), plus the pass/threshold contracts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_pengadaan_agent_spark.operators import selection as SEL


def _oracle(rows, q_ppm):
    """Nearest-rank on sorted values, per group."""
    by_g = {}
    for g, v in rows:
        if v is not None:
            by_g.setdefault(g, []).append(v)
    out = {}
    for g, vs in by_g.items():
        vs.sort()
        n = len(vs)
        for q in q_ppm:
            r = -(-q * n // 1_000_000)
            out[(g, q)] = (vs[r - 1], r, n)
    return out


def _check(spark, rows, q_ppm, **kw):
    df = spark.createDataFrame(rows, "g STRING, v DOUBLE")
    got = {
        (r["g"], r["q_ppm"]): (r["value"], r["rank"], r["n"])
        for r in SEL.exact_quantiles(df, "g", "v", q_ppm, **kw).collect()
    }
    assert got == _oracle(rows, q_ppm)


def test_exact_on_skewed_and_tiny_groups(spark):
    rows = [("a", ((i * i) % 997) / 7.0) for i in range(2000)]
    rows += [("b", float(2 ** (i % 40))) for i in range(500)]  # exponential skew
    rows += [("tiny", 42.0)]
    rows += [("two", 1.0), ("two", 2.0)]
    _check(spark, rows, [1, 250_000, 500_000, 990_000, 1_000_000], n_bins=16)


def test_mass_duplicates_short_circuit(spark):
    """A million-row-style duplicate spike can never be split by
    range refinement — the min==max rule must resolve it."""
    rows = [("a", 5.0)] * 3000 + [("a", 1.0)] * 10 + [("a", 9.0)] * 10
    _check(spark, rows, [500_000], n_bins=4, max_passes=3)


def test_duplicate_boundary_ranks(spark):
    """Ranks that land exactly on duplicate runs and bin edges."""
    rows = [("a", float(i // 10)) for i in range(1000)]  # 100 dups each of 0..99
    _check(spark, rows, [10_000, 100_000, 105_000, 500_000, 999_999, 1_000_000],
           n_bins=8)


def test_nulls_excluded_and_empty_group_absent(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", None), ("a", 3.0), ("nullonly", None)],
        "g STRING, v DOUBLE",
    )
    got = SEL.exact_quantiles(df, "g", "v", [500_000]).collect()
    assert len(got) == 1 and got[0]["g"] == "a"
    assert got[0]["value"] == 1.0 and got[0]["n"] == 2  # ceil(0.5*2)=1st of [1,3]


def test_pass_budget_raises_honestly(spark):
    """An unresolvable wide slice under an absurd budget must raise,
    not silently approximate."""
    rows = [("a", float(i) + 0.5 / (i + 1)) for i in range(5000)]
    df = spark.createDataFrame(rows, "g STRING, v DOUBLE")
    with pytest.raises(ValueError, match="raise max_passes"):
        SEL.exact_quantiles(
            df, "g", "v", [500_000], n_bins=2, max_passes=1, final_slice_max=10
        )
    # same data resolves fine with a real budget
    got = SEL.exact_quantiles(df, "g", "v", [500_000], n_bins=2, max_passes=1,
                              final_slice_max=10_000).collect()
    assert got[0]["value"] == sorted(v for _, v in rows)[2499]


def test_validation(spark):
    df = spark.createDataFrame([("a", 1.0)], "g STRING, v DOUBLE")
    with pytest.raises(ValueError, match="q_ppm"):
        SEL.exact_quantiles(df, "g", "v", [0])
    with pytest.raises(ValueError, match="n_bins"):
        SEL.exact_quantiles(df, "g", "v", [1], n_bins=1)


def test_integer_group_keys(spark):
    df = spark.createDataFrame(
        [(i % 3, float(i)) for i in range(99)], "g LONG, v DOUBLE"
    )
    got = {
        (r["g"], r["q_ppm"]): r["value"]
        for r in SEL.exact_quantiles(df, "g", "v", [500_000], n_bins=4).collect()
    }
    for g in (0, 1, 2):
        vs = sorted(float(i) for i in range(99) if i % 3 == g)
        assert got[(g, 500_000)] == vs[-(-500_000 * len(vs) // 1_000_000) - 1]


def test_null_group_and_nan_values(spark):
    """Self-review r12: (a) a NULL group must refine like any other
    (the plain-equality state join dropped its rows and fired the
    rank-unreachable assert); (b) NaN drops like NULL instead of
    making width=NaN and stalling every pass."""
    rows = [("a", float(v)) for v in range(200)] + [
        (None, float(v) * 3.0) for v in range(150)
    ]
    df = spark.createDataFrame(rows, "g STRING, v DOUBLE")
    got = {
        (r.g, r.q_ppm): r.value
        for r in SEL.exact_quantiles(
            df, "g", "v", [500_000], n_bins=8, final_slice_max=4
        ).collect()
    }
    assert got[("a", 500_000)] == 99.0   # ceil(0.5*200)=100th of 0..199
    assert got[(None, 500_000)] == 222.0  # 75th smallest of 0,3,..447
    nan_rows = [("a", float(v)) for v in range(200)] + [("a", float("nan"))] * 10
    got2 = SEL.exact_quantiles(
        spark.createDataFrame(nan_rows, "g STRING, v DOUBLE"),
        "g", "v", [500_000], n_bins=8, final_slice_max=4,
    ).collect()
    assert [(r.g, r.value, r.n) for r in got2] == [("a", 99.0, 200)]

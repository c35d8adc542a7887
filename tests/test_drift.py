"""Drift family: the CUSUM change point lands on a planted level
shift (exact statistic, earliest-k ties, partitioning invariance),
and histogram drift is an exact-integer L1 with the documented
0 / 2e6 extremes."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from data_pengadaan_agent_spark.operators import drift as DR


def _series(spark, rows):
    return spark.createDataFrame(
        [(g, dt.datetime(2024, 3, 1) + dt.timedelta(minutes=i), i, float(v))
         for g, i, v in rows],
        "g STRING, ts TIMESTAMP, event_id LONG, value DOUBLE",
    )


def test_change_point_lands_on_level_shift(spark):
    rows = [("a", i, 10.0) for i in range(10)] + [("a", i, 50.0) for i in range(10, 20)]
    out = DR.change_point(_series(spark, rows), ["g"], "ts", "value", "event_id").collect()
    assert len(out) == 1
    r = out[0]
    # |n*prefix_k - k*S| peaks exactly at the last pre-shift index (k=10)
    assert r.cp_k == 10 and r.n == 20
    # exact statistic: n=20, prefix_10 = 100_000 (milli), S = 600_000
    assert r.score == abs(20 * 100_000 - 10 * 600_000)


def test_change_point_flat_series_and_ties(spark):
    rows = [("a", i, 7.0) for i in range(5)]
    r = DR.change_point(_series(spark, rows), ["g"], "ts", "value", "event_id").collect()[0]
    assert r.score == 0 and r.cp_k == 1  # all-zero devs: earliest k wins


def test_change_point_partitioning_invariance(spark):
    rows = [("a", i, float((i * 37) % 11)) for i in range(50)] + [
        ("b", i, float(i)) for i in range(30)
    ]
    df = _series(spark, rows)
    a = sorted(map(tuple, DR.change_point(df, ["g"], "ts", "value", "event_id").collect()))
    b = sorted(
        map(
            tuple,
            DR.change_point(
                df.repartition(7, "event_id"), ["g"], "ts", "value", "event_id"
            ).collect(),
        )
    )
    assert a == b
    with pytest.raises(ValueError, match="group column"):
        DR.change_point(df, [], "ts", "value", "event_id")


def test_histogram_drift_extremes_and_exactness(spark):
    lo_half = spark.createDataFrame([(float(v),) for v in range(0, 50)], "value DOUBLE")
    hi_half = spark.createDataFrame([(float(v),) for v in range(50, 100)], "value DOUBLE")
    # disjoint supports: full drift = 2e6 (each side's 1e6 of share unmatched)
    r = DR.histogram_drift(lo_half, hi_half, "value", 0.0, 100.0, n_bins=2).collect()[0]
    assert (r.n_a, r.n_b, r.drift_ppm) == (50, 50, 2_000_000)
    # identical snapshots: zero drift
    z = DR.histogram_drift(lo_half, lo_half, "value", 0.0, 100.0, n_bins=10).collect()[0]
    assert z.drift_ppm == 0
    with pytest.raises(ValueError, match="non-empty"):
        DR.histogram_drift(lo_half, lo_half.limit(0), "value", 0.0, 100.0)


def test_nan_values_carry_no_signal(spark):
    """Self-review r12: NaN passed the isNotNull filter and gridded to
    0 (floor(NaN*1000+0.5) = 0), fabricating a level shift at the NaN
    boundary and phantom bin-0 mass. NaN now drops exactly like NULL."""
    import datetime as dt

    clean_rows = [("g", dt.datetime(2024, 1, 1, 0, i), 100.0, i) for i in range(10)]
    nan_rows = [("g", dt.datetime(2024, 1, 1, 1, i), float("nan"), 100 + i)
                for i in range(5)]
    schema = "g STRING, ts TIMESTAMP, value DOUBLE, event_id LONG"
    clean = spark.createDataFrame(clean_rows, schema)
    dirty = spark.createDataFrame(clean_rows + nan_rows, schema)
    a = [tuple(r) for r in DR.change_point(clean, ["g"], "ts", "value", "event_id").collect()]
    b = [tuple(r) for r in DR.change_point(dirty, ["g"], "ts", "value", "event_id").collect()]
    assert a == b  # the NaN tail adds no rows, no shift, no score
    flat = spark.createDataFrame([(float(v),) for v in range(50)], "value DOUBLE")
    flat_nan = spark.createDataFrame(
        [(float(v),) for v in range(50)] + [(float("nan"),)] * 20, "value DOUBLE"
    )
    r = DR.histogram_drift(flat, flat_nan, "value", 0.0, 50.0, n_bins=5).collect()[0]
    assert (r.n_a, r.n_b, r.drift_ppm) == (50, 50, 0)

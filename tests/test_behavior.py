"""Behavior analytics: retention cohort matrix (integer epoch-period
arithmetic at day/week/month grain) and the first-order transition
matrix (total-order lag, exact integer outgoing-share ppm)."""

from __future__ import annotations

import datetime as dt

import pytest

from data_pengadaan_agent_spark.operators import relational as R


def _events(spark, rows):
    return spark.createDataFrame(
        [(e, dt.datetime.fromisoformat(t), u, k) for e, t, u, k in rows],
        "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING",
    )


@pytest.fixture()
def ev(spark):
    return _events(
        spark,
        [
            # user 1: active day 0 and day 2 (cohort 2024-03-01)
            (1, "2024-03-01T10:00:00", 1, "view"),
            (2, "2024-03-01T11:00:00", 1, "cart"),
            (3, "2024-03-03T09:00:00", 1, "buy"),
            # user 2: cohort 2024-03-01, only day 0
            (4, "2024-03-01T12:00:00", 2, "view"),
            # user 3: cohort 2024-03-02, days 0 and 1
            (5, "2024-03-02T08:00:00", 3, "view"),
            (6, "2024-03-03T08:00:00", 3, "view"),
        ],
    )


def test_retention_day_grain(ev):
    got = {
        (str(r.cohort_start), r.offset_periods): r.n_users
        for r in R.retention_cohorts(ev, grain="day").collect()
    }
    assert got == {
        ("2024-03-01", 0): 2,
        ("2024-03-01", 2): 1,
        ("2024-03-02", 0): 1,
        ("2024-03-02", 1): 1,
    }


def test_retention_week_and_month_grain(spark):
    ev = _events(
        spark,
        [
            (1, "2024-01-03T00:00:00", 1, "a"),  # epoch-week W
            (2, "2024-01-15T00:00:00", 1, "a"),  # W + 2 (Jan 3 Wed, Jan 15 Mon)
            (3, "2024-02-20T00:00:00", 1, "a"),
            (4, "2024-02-20T00:00:00", 2, "a"),
        ],
    )
    wk = {
        (str(r.cohort_start), r.offset_periods): r.n_users
        for r in R.retention_cohorts(ev, grain="week").collect()
    }
    # epoch-anchored weeks: 1970-01-01 was Thursday; cohort_start is
    # the week's first day (a Thursday)
    assert sum(n for (_, off), n in wk.items() if off == 0) == 2
    mo = {
        (str(r.cohort_start), r.offset_periods): r.n_users
        for r in R.retention_cohorts(ev, grain="month").collect()
    }
    assert mo == {
        ("2024-01-01", 0): 1,
        ("2024-01-01", 1): 1,
        ("2024-02-01", 0): 1,
    }
    with pytest.raises(ValueError, match="grain"):
        R.retention_cohorts(ev, grain="fortnight")


def test_transitions_counts_and_ppm(spark):
    ev = _events(
        spark,
        [
            (1, "2024-03-01T10:00:00", 1, "A"),
            (2, "2024-03-01T11:00:00", 1, "B"),
            (3, "2024-03-01T12:00:00", 1, "A"),
            (4, "2024-03-01T13:00:00", 1, "B"),
            (5, "2024-03-01T10:00:00", 2, "A"),
            (6, "2024-03-01T11:00:00", 2, "C"),
        ],
    )
    got = {
        (r.from_type, r.to_type): (r.n, r.prob_ppm)
        for r in R.event_transitions(ev).collect()
    }
    assert got == {
        ("A", "B"): (2, 666_666),
        ("A", "C"): (1, 333_333),
        ("B", "A"): (1, 1_000_000),
    }


def test_transitions_tiebreak_is_total_order(spark):
    """Equal timestamps: event_id breaks the tie, so the chain is
    A->B->C deterministically, never A->C."""
    same = "2024-03-01T10:00:00"
    ev = _events(
        spark,
        [(1, same, 1, "A"), (2, same, 1, "B"), (3, same, 1, "C")],
    )
    got = {(r.from_type, r.to_type) for r in R.event_transitions(ev).collect()}
    assert got == {("A", "B"), ("B", "C")}
    # repartitioned input: identical matrix
    got2 = {
        (r.from_type, r.to_type)
        for r in R.event_transitions(ev.repartition(5)).collect()
    }
    assert got == got2


def test_event_ngrams_counts_and_boundaries(spark):
    ev = _events(
        spark,
        [
            (1, "2024-03-01T10:00:00", 1, "A"),
            (2, "2024-03-01T11:00:00", 1, "B"),
            (3, "2024-03-01T12:00:00", 1, "C"),
            (4, "2024-03-01T13:00:00", 1, "A"),
            (5, "2024-03-01T10:00:00", 2, "A"),
            (6, "2024-03-01T11:00:00", 2, "B"),
            (7, "2024-03-01T12:00:00", 2, "C"),
            (8, "2024-03-01T10:00:00", 3, "X"),  # too short for n=3
        ],
    )
    got = {tuple(r.pattern): r.support for r in R.event_ngrams(ev, n=3).collect()}
    # user boundaries never bridge; short users contribute nothing
    assert got == {("A", "B", "C"): 2, ("B", "C", "A"): 1}
    sup2 = {tuple(r.pattern): r.support
            for r in R.event_ngrams(ev, n=3, min_support=2).collect()}
    assert sup2 == {("A", "B", "C"): 2}
    with pytest.raises(ValueError, match="n must be"):
        R.event_ngrams(ev, n=1)


def test_concurrency_timeline_half_open_sweep(spark):
    iv = spark.createDataFrame(
        [
            ("g", 1, 5),
            ("g", 3, 7),
            ("g", 5, 6),   # starts exactly when the first ends: no overlap
            ("h", 1, 2),
        ],
        "grp STRING, start LONG, end LONG",
    )
    got = [
        (r.grp, r.ts, r.concurrent)
        for r in R.concurrency_timeline(iv, "start", "end", ["grp"]).collect()
    ]
    assert got == [
        ("g", 1, 1),
        ("g", 3, 2),
        ("g", 5, 2),  # -1 (end of first) +1 (start of third) at the same ts
        ("g", 6, 1),
        ("g", 7, 0),
        ("h", 1, 1),
        ("h", 2, 0),
    ]
    peak = max(c for g, _, c in got if g == "g")
    assert peak == 2

"""dec_idiv_sql: exact integer division in DECIMAL(38,0) — the idiom
that replaces DIV (silently wraps decimals to LongType) and
FLOOR(a/b) (mis-rounds quotients within 5e-7 of an integer) for
beyond-int64 score arithmetic (tfidf_top_terms, token_rarity)."""

from __future__ import annotations

import pytest

from data_pengadaan_agent_spark.functions.exactmath import (
    dec_idiv_sql,
    dec_to_bigint_sql,
)

CASES = [
    # (num, den) — truth is Python's //
    (9_200_000_000_000_000_000 * 1_000_000, 7),
    (5_999_999, 3_000_000),           # FLOOR would round to 2, truth 1
    (19_999_999_999_999, 10_000_000_000_000),  # same trap, bigger
    (0, 5),
    (10**24, 999_999_937),
    (10**24 + 1, 10**12),
]


def test_matches_python_floordiv_beyond_int64(spark):
    exprs = ", ".join(
        f"{dec_idiv_sql(f'CAST({n} AS DECIMAL(38,0))', str(d))} AS q{i}"
        for i, (n, d) in enumerate(CASES)
    )
    row = spark.sql(f"SELECT {exprs}").collect()[0]
    for i, (n, d) in enumerate(CASES):
        assert int(row[f"q{i}"]) == n // d, (n, d)


def test_spark_div_on_decimals_still_wraps(spark):
    """The reason this module exists: if a Spark upgrade ever makes
    decimal DIV exact, this xfail-style pin flags that dec_idiv_sql
    can be simplified."""
    v = spark.sql(
        "SELECT (CAST(9200000000000000000 AS DECIMAL(38,0)) * 1000000) DIV 7 AS b"
    ).collect()[0]["b"]
    truth = (9_200_000_000_000_000_000 * 1_000_000) // 7
    assert v != truth, "decimal DIV became exact — simplify dec_idiv_sql"


def test_dec_to_bigint_guard_exact_at_boundary(spark):
    """Output-edge narrowing (r15 driver-gate fix): both int64
    boundary values cast exactly and the result column is LongType —
    the class the driver's value-hash serializes identically from
    Spark and DuckDB (DECIMAL(38,0) at the edge does not)."""
    g = dec_to_bigint_sql("v", "pin")
    df = spark.sql(
        f"SELECT {g} AS g FROM VALUES "
        "(CAST(9223372036854775807 AS DECIMAL(38,0))), "
        "(CAST(-9223372036854775808 AS DECIMAL(38,0))), "
        "(CAST(123 AS DECIMAL(38,0))) t(v)"
    )
    assert dict(df.dtypes)["g"] == "bigint"
    assert sorted(r["g"] for r in df.collect()) == [
        -9223372036854775808,
        123,
        9223372036854775807,
    ]


def test_dec_to_bigint_guard_raises_on_overflow(spark):
    """One past int64 max must raise loudly (never wrap, never null):
    a 100 TB-scale corpus that genuinely overflows the output column
    fails the query instead of hash-diverging."""
    g = dec_to_bigint_sql("CAST(9223372036854775808 AS DECIMAL(38,0))", "pin")
    with pytest.raises(Exception, match="USER_RAISED_EXCEPTION|BIGINT output"):
        spark.sql(f"SELECT {g} AS g").collect()


def test_rarity_and_tfidf_survive_beyond_int64_totals(spark):
    """End-to-end: fabricate the overflow arithmetic the operators now
    run — a DECIMAL n_total at 2e13 (a ~100 TB corpus's token count)
    times 1e6 divided by small tf must match Python exactly."""
    n_total, tf = 20_000_000_000_000, 3
    q = dec_idiv_sql(f"CAST({n_total} AS DECIMAL(38,0)) * 1000000", str(tf))
    got = int(spark.sql(f"SELECT {q} AS r").collect()[0]["r"])
    assert got == (n_total * 1_000_000) // tf

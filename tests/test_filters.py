"""P3–P7 keyword-CNF + semantic-trap property tests (SURVEY.md §1.4)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_pengadaan_agent_spark.operators.filters import (
    date_range_filter,
    filter_keywords,
    keyword_cnf,
    parse_ts_coerce,
    token_match,
)
from data_pengadaan_agent_spark.plans.sql_gate import SqlGateError, check_select_only, preview


def ids(df):
    return sorted(r[0] for r in df.select("kode_rup").collect())


def test_substring_not_token_semantics(pengadaan):
    """The alat/peralatan trap: '%alat%' must match 'peralatan' rows."""
    got = filter_keywords(pengadaan, "filtered_keywords", [["alat"]])
    assert ids(got) == [1, 2]  # row 2 matches via substring of 'peralatan'


def test_token_match_is_strict(pengadaan):
    got = pengadaan.filter(token_match(F.col("filtered_keywords"), "alat"))
    assert ids(got) == [1]  # exact-token variant excludes 'peralatan'


def test_cnf_or_groups_and_groups(pengadaan):
    # (perbaikan OR rehabilitasi) AND gedung  — gedung matches 'gedungnya' too
    got = filter_keywords(pengadaan, "filtered_keywords", [["perbaikan", "rehabilitasi"], ["gedung"]])
    assert ids(got) == [3, 4]


def test_exclusion_group(pengadaan):
    got = filter_keywords(pengadaan, "filtered_keywords", [["kantor"]], exclude=["gedung"])
    assert ids(got) == [1, 2]


def test_case_insensitive_like_sqlite_parity(pengadaan):
    """SQLite LIKE is ASCII-case-insensitive; ours must be too."""
    got = filter_keywords(pengadaan, "nama_paket", [["PENGADAAN"]])
    assert ids(got) == [1]


def test_empty_cnf_is_true(pengadaan):
    assert pengadaan.filter(keyword_cnf(F.col("filtered_keywords"), [])).count() == 6


def test_parse_ts_coerce_drops_nulls(pengadaan):
    got = parse_ts_coerce(pengadaan, "tanggal_umumkan_paket")
    assert got.count() == 5  # row 6 (NULL date) dropped
    assert dict(got.dtypes)["ts"] == "timestamp"


def test_date_range_filter(pengadaan):
    df = parse_ts_coerce(pengadaan, "tanggal_umumkan_paket")
    got = date_range_filter(df, "ts", "2024-01-01", "2024-02-01")
    assert ids(got) == [2, 3]


def test_sql_gate_rejects_dml():
    for bad in ["DROP TABLE x", "insert into t values (1)", "UPDATE t SET a=1",
                "SELECT 1; DROP TABLE x", "set spark.foo=1"]:
        with pytest.raises(SqlGateError):
            check_select_only(bad)
    assert check_select_only("  SELECT 1  ") == "SELECT 1"
    assert check_select_only("WITH t AS (SELECT 1) SELECT * FROM t")


def test_sql_gate_rejects_cte_wrapped_dml():
    """Round-1 review bypass: Spark executes CTE-prefixed DML, and the
    old prefix-only allowlist let it through."""
    for bad in [
        "WITH t AS (SELECT 1) INSERT INTO tbl SELECT * FROM t",
        "WITH t AS (SELECT 1) DELETE FROM tbl",
        "WITH t AS (SELECT 1) MERGE INTO a USING t ON a.id=t.id "
        "WHEN MATCHED THEN DELETE",
        "with x as (select 1) create table y as select * from x",
    ]:
        with pytest.raises(SqlGateError):
            check_select_only(bad)
    # keywords inside literals / quoted identifiers / comments are data
    assert check_select_only("SELECT 'please INSERT this' AS note")
    assert check_select_only("SELECT `drop` FROM t -- create nothing")
    assert check_select_only("SELECT a FROM t GROUP BY GROUPING SETS ((a),())")


def test_sql_gate_parse_layer_rejects_commands(spark):
    from data_pengadaan_agent_spark.plans.sql_gate import safe_sql

    spark.range(3).createOrReplaceTempView("gate_t")
    assert safe_sql(spark, "SELECT count(*) AS n FROM gate_t").collect()[0][0] == 3
    # parse layer (reached only if the textual layer were bypassed)
    from data_pengadaan_agent_spark.plans.sql_gate import _reject_command_plan

    with pytest.raises(SqlGateError):
        _reject_command_plan(spark, "WITH t AS (SELECT 1) INSERT INTO tbl SELECT * FROM t")
    with pytest.raises(SqlGateError):
        _reject_command_plan(spark, "DROP TABLE gate_t")
    _reject_command_plan(spark, "SELECT 1")  # query plans pass


def test_preview_shape(spark, pengadaan):
    pengadaan.createOrReplaceTempView("pengadaan")
    out = preview(spark, "SELECT kode_rup, total_pagu FROM pengadaan ORDER BY kode_rup")
    assert len(out["first_rows"]) == 5
    assert out["first_rows"][0]["kode_rup"] == 1
    assert [f["name"] for f in out["schema"]["fields"]] == ["kode_rup", "total_pagu"]


def test_keyword_cnf_empty_groups_and_token_sep_escape(spark):
    """Self-review r12: include made only of EMPTY groups used to
    reduce() an empty list and raise TypeError (now: no constraint);
    token_match's separator is a literal, not a regex (sep='|' used
    to split between every character)."""
    from data_pengadaan_agent_spark.operators.filters import (
        keyword_cnf, token_match,
    )

    df = spark.createDataFrame([("a|b|c",), ("x|y",)], "s STRING")
    assert df.filter(keyword_cnf(F.col("s"), include=[[]])).count() == 2
    assert df.filter(token_match(F.col("s"), "b", sep="|")).count() == 1

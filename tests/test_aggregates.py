"""A1–A8 aggregation semantics, incl. the reference's traps:
COUNT(col) null-skipping, month-of-year year-collapse, int64 budgets."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pengadaan_agent_spark.operators import aggregates as A
from data_pengadaan_agent_spark.operators.filters import parse_ts_coerce


def test_groupby_count_null_semantics(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", None), ("b", 2)], "k STRING, v INT"
    )
    star = {r["k"]: r["cnt"] for r in A.groupby_count(df, "k").collect()}
    col = {r["k"]: r["cnt"] for r in A.groupby_count(df, "k", count_col="v").collect()}
    assert star == {"a": 2, "b": 1}
    assert col == {"a": 1, "b": 1}  # COUNT(col) skips NULLs


def test_monthly_rollup_reference_shape(pengadaan):
    df = parse_ts_coerce(pengadaan, "tanggal_umumkan_paket")
    out = A.monthly_rollup(df, "ts", "kode_rup", "total_pagu").collect()
    assert [r["bulan"] for r in out] == ["2023-01", "2023-12", "2024-01", "2024-03"]
    jan24 = next(r for r in out if r["bulan"] == "2024-01")
    assert jan24["jumlah_paket"] == 2
    assert jan24["total_pagu"] == 2_000_150_000  # > int32: LongType required


def test_scalar_insights(pengadaan):
    row = A.scalar_insights(pengadaan, "total_pagu").first()
    assert row["n"] == 6
    assert row["min_v"] == 11
    assert row["max_v"] == 5_400_000_000
    assert row["sum_v"] == 5_400_000_000 + 150_000 + 2_000_000_000 + 750_000_000 + 11 + 99


def test_arg_extreme(pengadaan):
    row = A.arg_extreme(pengadaan, "satuan_kerja", "total_pagu").first()
    assert row["argmax"] == "Dinas A"
    assert row["argmin"] == "Dinas C"


def test_histogram_numeric_edges(spark):
    # values 0..12: bin width 1, x==max lands in the LAST bin (plt.hist)
    df = spark.range(13).select(F.col("id").cast("double").alias("v"))
    out = {r["bucket"]: r["cnt"] for r in A.histogram_numeric(df, "v", bins=12).collect()}
    assert out[0] == 1 and out[11] == 2  # 11 and 12 share the closed last bin
    assert sum(out.values()) == 13


def test_histogram_numeric_constant_column(spark):
    df = spark.createDataFrame([(5.0,)] * 4, "v DOUBLE")
    out = A.histogram_numeric(df, "v", bins=12).collect()
    assert len(out) == 1 and out[0]["cnt"] == 4


def test_month_of_year_collapses_years(pengadaan):
    """2023-01 and 2024-01 must land in the same bin (month 1)."""
    df = parse_ts_coerce(pengadaan, "tanggal_umumkan_paket")
    out = {r["month_no"]: r["cnt"] for r in A.histogram_month_of_year(df, "ts").collect()}
    assert len(out) == 12  # scaffold keeps empty months
    assert out[1] == 3  # 2024-01 ×2 + 2023-01 ×1 collapsed
    assert out[2] == 0


def test_distinct_count(spark, tables):
    out = A.distinct_count(tables["events"], "event_type", "user_id").collect()
    assert all(r["n_distinct"] > 0 for r in out)


def test_mad_pandas_udaf_matches_pandas(tables):
    from data_pengadaan_agent_spark.operators.aggregates import mad_pandas_udaf

    ev = tables["events"]
    got = {r["event_type"]: r["mad"] for r in mad_pandas_udaf(ev, "event_type", "value").collect()}
    pdf = ev.select("event_type", "value").toPandas()
    for etype, grp in pdf.groupby("event_type"):
        v = grp["value"]
        assert abs(got[etype] - float((v - v.median()).abs().median())) < 1e-9

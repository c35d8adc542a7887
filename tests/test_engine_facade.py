"""Engine facade: the reference's full tool conversation replayed —
retrieve keywords → materialize a filtered query → preview → chart
data + insights — entirely through the seven-method surface."""

from __future__ import annotations

import pytest

from data_pengadaan_agent_spark.engine import Engine
from data_pengadaan_agent_spark.plans.sql_gate import SqlGateError


@pytest.fixture()
def engine(spark, pengadaan):
    vocab = spark.createDataFrame(
        [(t,) for t in "belanja alat peralatan tulis kantor gedung perbaikan".split()],
        "keyword string",
    )
    return Engine(spark, pengadaan, vocab_df=vocab)


def test_full_tool_conversation(spark, engine):
    # step 1: keyword retrieval for the user question
    kws = engine.retrieve_keywords("peralatan kantor", top_k=3)
    assert kws[0]["keyword"] == "peralatan"

    # step 2: schema introspection
    schema = engine.schema_check()
    assert any(t == "data_pengadaan" for t in schema)

    # step 3: stage-1 filter query materialized with the English-alias
    # rename the LangChain variant applies (my_toolkit.py:32, opt-in)
    echo = engine.materialize(
        """SELECT * FROM data_pengadaan
           WHERE lower(filtered_keywords) LIKE '%alat%'""",
        rename={"nama_paket": "item_name"},
    )
    assert [f["name"] for f in echo["schema"]["fields"]][1] == "item_name"
    assert len(echo["first_rows"]) == 2

    # step 4: preview over the intermediary (V2 path)
    prev = engine.preview("SELECT satuan_kerja, total_pagu FROM intermediary_table")
    assert prev["first_rows"][0]["satuan_kerja"] == "Dinas A"

    # step 5: stage-2 chart data + insights
    data, insights = engine.bar_chart(
        """SELECT satuan_kerja, sum(total_pagu) AS total
           FROM intermediary_table GROUP BY satuan_kerja""",
        x="satuan_kerja",
        y="total",
    )
    assert insights["sum_v"] == 5_400_150_000
    assert data[0]["satuan_kerja"] == "Dinas A"


def test_gate_blocks_dml_everywhere(engine):
    for bad in ("DROP TABLE data_pengadaan", "DELETE FROM data_pengadaan"):
        with pytest.raises(SqlGateError):
            engine.materialize(bad)
        with pytest.raises(SqlGateError):
            engine.preview(bad)


def test_histogram_dispatch_via_facade(engine):
    engine.materialize("SELECT * FROM data_pengadaan")
    data, insights = engine.histogram(
        "SELECT satuan_kerja FROM intermediary_table", col="satuan_kerja"
    )
    assert insights["mode"] in {"Dinas A", "Dinas B", "Dinas C"}
    assert sum(d["cnt"] for d in data) == 6


def test_engine_from_sqlite(spark, tmp_path):
    """The reference's exact setup: an Engine bound to a SQLite
    procurement DB, driving gate + preview + a chart end-to-end."""
    import sqlite3

    from data_pengadaan_agent_spark.engine import Engine

    db = str(tmp_path / "ref.db")
    con = sqlite3.connect(db)
    con.execute(
        "CREATE TABLE pengadaan (kode_rup INTEGER, nama_paket TEXT,"
        " jenis_pengadaan TEXT, total_pagu REAL)"
    )
    con.executemany(
        "INSERT INTO pengadaan VALUES (?, ?, ?, ?)",
        [(i, f"paket {i}", "Barang" if i % 2 else "Jasa", 500.0 * i) for i in range(1, 21)],
    )
    con.commit()
    con.close()

    eng = Engine.from_sqlite(spark, db, "pengadaan")
    prev = eng.preview("SELECT kode_rup, total_pagu FROM data_pengadaan ORDER BY kode_rup")
    assert [r["kode_rup"] for r in prev["first_rows"]] == [1, 2, 3, 4, 5]
    data, insights = eng.bar_chart(
        "SELECT jenis_pengadaan, sum(total_pagu) AS pagu FROM data_pengadaan GROUP BY 1",
        "jenis_pengadaan",
        "pagu",
    )
    assert {d["jenis_pengadaan"] for d in data} == {"Barang", "Jasa"}
    assert insights["n"] == 2


def test_golden_scenarios_through_facade(spark, engine):
    """The reference's two rehearsed scenarios (golden PNGs,
    openai/basic_functions.py:45-53 / langchain/agent_setup.py:25-39)
    replayed ENTIRELY through the facade — materialize → preview →
    chart — including the §1.4 substring trap in the stage-1 SQL
    itself (VERDICT r4 #6; the operator-level golden tests cover the
    same semantics below the facade).

    Scenario A (office supplies): CNF (alat) AND (kantor OR tulis) as
    LIKE-substring SQL. 'alat' must match row 2's 'peralatan' — token
    matching would return only row 1 and the budget sum would miss the
    150k row."""
    engine.materialize(
        """SELECT * FROM data_pengadaan
           WHERE filtered_keywords LIKE '%alat%'
             AND (filtered_keywords LIKE '%kantor%'
                  OR filtered_keywords LIKE '%tulis%')"""
    )
    prev = engine.preview("SELECT kode_rup FROM intermediary_table ORDER BY kode_rup")
    assert [r["kode_rup"] for r in prev["first_rows"]] == [1, 2]  # §1.4: 2 included

    data, insights = engine.bar_chart(
        """SELECT satuan_kerja, sum(total_pagu) AS total
           FROM intermediary_table GROUP BY satuan_kerja""",
        x="satuan_kerja",
        y="total",
    )
    assert insights["top_category"] == "Dinas A"
    assert insights["sum_v"] == 5_400_150_000  # includes the peralatan row

    # Scenario B (building repairs): (perbaikan OR rehabilitasi) AND
    # gedung — 'gedung' must match 'gedungnya'; the monthly trend keeps
    # years distinct (2023-01 vs 2024-01).
    engine.materialize(
        """SELECT *, try_to_timestamp(tanggal_umumkan_paket) AS ts
           FROM data_pengadaan
           WHERE (filtered_keywords LIKE '%perbaikan%'
                  OR filtered_keywords LIKE '%rehabilitasi%')
             AND filtered_keywords LIKE '%gedung%'"""
    )
    prev = engine.preview("SELECT kode_rup FROM intermediary_table ORDER BY kode_rup")
    assert [r["kode_rup"] for r in prev["first_rows"]] == [3, 4]  # gedungnya matched

    data, insights = engine.line_chart(
        "SELECT ts, kode_rup, total_pagu FROM intermediary_table",
        ts_col="ts",
        id_col="kode_rup",
        measure_col="total_pagu",
    )
    months = {d["bulan"]: (d["jumlah_paket"], d["total_pagu"]) for d in data}
    assert months == {"2023-01": (1, 750_000_000), "2024-01": (1, 2_000_000_000)}
    assert insights["peak_value_month"] == "2024-01"
    assert insights["total_value"] == 2_750_000_000


def test_sql_gate_semicolon_inside_literal_allowed(spark):
    """Self-review r12: the multi-statement check ran BEFORE literal
    stripping, falsely rejecting a semicolon inside a string literal
    or comment."""
    import pytest as _pt

    from data_pengadaan_agent_spark.plans.sql_gate import (
        SqlGateError, check_select_only,
    )

    check_select_only("SELECT ';' AS sep FROM t")
    check_select_only("SELECT 1 -- note; details")
    with _pt.raises(SqlGateError, match="multiple statements"):
        check_select_only("SELECT 1; DROP TABLE t")

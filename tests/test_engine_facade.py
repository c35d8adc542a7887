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

"""Sources/sinks and vector scalar functions: CSV vocab round-trip,
embedder determinism, partition pruning, bucketed shuffle-free joins."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pengadaan_agent_spark.functions.vectors import (
    hash_ngram_embed,
    hash_ngram_embedding_col,
    parse_vector_string,
)
from data_pengadaan_agent_spark.operators import similarity as S
from data_pengadaan_agent_spark.sources import readers as RD


def test_vector_string_roundtrip_csv(spark, tables, tmp_path):
    """S3 parity: ARRAY<FLOAT> → '[a, b, …]' CSV → parse back."""
    vocab = tables["embeddings"].limit(20).select(
        F.col("vec_id").cast("string").alias("keyword"), "embedding"
    )
    path = str(tmp_path / "vocab_csv")
    RD.write_keyword_vocab_csv(vocab, path)
    back = RD.read_keyword_vocab_csv(spark, path)
    want = {r["keyword"]: [round(v, 5) for v in r["embedding"]] for r in vocab.collect()}
    got = {r["keyword"]: [round(v, 5) for v in r["embedding"]] for r in back.collect()}
    assert got == want


def test_hash_ngram_embedder_spark_python_parity(spark):
    # "" pins the empty-string gram: its one gram is the 2-char pad,
    # whose missing third position must hash as 0 on BOTH sides
    # (Spark's ascii('') = 0; the Python twin used to IndexError);
    # the unicode word pins ascii() = codepoint parity past 127
    words = ["spark", "sparkle", "ab", "x", "hash join", "", "ünïcode ☃"]
    df = spark.createDataFrame([(w,) for w in words], "w string")
    got = {
        r["w"]: r["e"]
        for r in df.select("w", hash_ngram_embedding_col("w").alias("e")).collect()
    }
    for w in words:
        assert got[w] == [int(v) for v in hash_ngram_embed(w)], w


def test_keyword_retrieval_self_similarity(spark):
    vocab = spark.createDataFrame(
        [("spark",), ("hash",), ("join",), ("window",), ("sparkle",)], "keyword string"
    )
    out = S.retrieve_similar_keywords(vocab, "spark", k=3).collect()
    assert out[0]["keyword"] == "spark"
    assert abs(out[0]["similarity"] - 1.0) < 1e-9  # exact self-match
    # morphological neighbor ranks above unrelated tokens
    assert out[1]["keyword"] == "sparkle"


def test_write_partitioned_prunes(spark, tables, tmp_path):
    path = str(tmp_path / "events_bymonth")
    RD.write_partitioned(tables["events"], path, "month", derive_month_from="ts")
    back = spark.read.parquet(path)
    pruned = back.filter(F.col("month") == "2024-01")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(month" in plan
    # pruned read touches only the matching partition's rows
    want = tables["events"].filter(F.date_format("ts", "yyyy-MM") == "2024-01").count()
    assert pruned.count() == want


def test_bucketed_join_skips_shuffle(spark, tables):
    RD.write_bucketed(tables["orders"], "orders_b", "o_custkey", n_buckets=4)
    RD.write_bucketed(
        tables["customer"].select(F.col("c_custkey").alias("o_custkey"), "c_name"),
        "customer_b",
        "o_custkey",
        n_buckets=4,
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("orders_b").join(spark.table("customer_b"), "o_custkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # co-located: no shuffle on either side
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS customer_b")


def test_load_table_trailing_slash(spark):
    from data_pengadaan_agent_spark.sources.catalog import load_table
    from tests.conftest import SF_DIR

    assert load_table(spark, SF_DIR + "/", "region").count() == 5


def test_materialize_durable_roundtrip(spark, tables, tmp_path):
    from data_pengadaan_agent_spark.operators.materialize import materialize

    path = str(tmp_path / "inter_durable")
    src = tables["orders"].limit(50)
    echo = materialize(src, view_name="inter_dur", durable_path=path)
    assert len(echo["first_rows"]) == 5
    back = spark.read.parquet(path)
    assert back.count() == 50
    assert back.schema == src.schema
    spark.catalog.dropTempView("inter_dur")


def test_read_events_json(spark, tables, tmp_path):
    from data_pengadaan_agent_spark.sources.readers import read_events_json

    path = str(tmp_path / "events_json")
    tables["events"].limit(100).selectExpr(
        "event_id", "CAST(ts AS STRING) AS ts", "user_id", "event_type", "value"
    ).write.mode("overwrite").json(path)
    back = read_events_json(
        spark, path,
        schema="event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    assert back.count() == 100
    assert dict(back.dtypes)["ts"] == "timestamp"


def test_sqlite_source_roundtrip(spark, tmp_path):
    """S1 reference-fidelity: the procurement-style SQLite table loads
    through load_sqlite_table (JDBC when a driver jar exists, loud
    driver-side fallback otherwise) with values intact."""
    import sqlite3

    from data_pengadaan_agent_spark.sources.jdbc import load_sqlite_table

    db = str(tmp_path / "pengadaan.db")
    con = sqlite3.connect(db)
    con.execute(
        "CREATE TABLE pengadaan (kode_rup INTEGER, nama_paket TEXT, total_pagu REAL)"
    )
    con.executemany(
        "INSERT INTO pengadaan VALUES (?, ?, ?)",
        [(i, f"paket {i}", 1000.0 * i) for i in range(1, 51)],
    )
    con.commit()
    con.close()

    df = load_sqlite_table(spark, db, "pengadaan")
    assert df.count() == 50
    got = {r["kode_rup"]: (r["nama_paket"], r["total_pagu"]) for r in df.collect()}
    assert got[7] == ("paket 7", 7000.0)
    # engine ops compose on top of the source as with any scan
    from pyspark.sql import functions as F

    top = df.orderBy(F.desc("total_pagu")).limit(1).collect()[0]
    assert top["kode_rup"] == 50


def test_sqlite_fallback_row_cap(spark, tmp_path):
    import sqlite3

    import pytest as _pytest

    from data_pengadaan_agent_spark.sources.jdbc import load_sqlite_table

    db = str(tmp_path / "big.db")
    con = sqlite3.connect(db)
    con.execute("CREATE TABLE t (a INTEGER)")
    con.executemany("INSERT INTO t VALUES (?)", [(i,) for i in range(100)])
    con.commit()
    con.close()
    with _pytest.raises(ValueError, match="too large"):
        load_sqlite_table(spark, db, "t", max_fallback_rows=10)


def test_derived_partsupp_parity_and_shape(spark, tables):
    """The derived partsupp must be bit-identical between the Spark
    derivation and the DuckDB CTE the oracles embed, reference every
    existing suppkey, and contain no duplicate (part, supp) pairs."""
    import duckdb

    from data_pengadaan_agent_spark.sources.derived import PARTSUPP_SQL_CTE, derive_partsupp
    from tests.conftest import SF_DIR

    s_count = tables["supplier"].count()
    ps = derive_partsupp(tables["part"], s_count)
    srows = sorted(tuple(r) for r in ps.collect())

    con = duckdb.connect()
    for t in ("part", "supplier"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    drows = sorted(tuple(r) for r in con.execute(f"SELECT * FROM ({PARTSUPP_SQL_CTE})").fetchall())
    assert srows == drows
    assert len({(a, b) for a, b, _, _ in srows}) == len(srows)  # (part,supp) unique
    suppkeys = {r[1] for r in srows}
    assert suppkeys <= {r["s_suppkey"] for r in tables["supplier"].collect()}
    # no shuffle in the derivation plan (pure projection + explode)
    plan = ps._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_dynamic_partition_overwrite_preserves_untouched(spark, tmp_path):
    """The dynamic mode must replace only the partitions present in
    the incoming frame — the static default would truncate the table."""
    path = str(tmp_path / "daily")
    full = spark.createDataFrame(
        [("d1", 1), ("d1", 2), ("d2", 3)], "day STRING, v INT"
    )
    RD.write_partitioned(full, path, "day")
    # re-land ONLY d2 with new values
    delta = spark.createDataFrame([("d2", 99)], "day STRING, v INT")
    RD.overwrite_partitions_dynamic(delta, path, "day")
    back = {(r["day"], r["v"]) for r in spark.read.parquet(path).collect()}
    assert back == {("d1", 1), ("d1", 2), ("d2", 99)}
    # conf restored to the safer default afterwards
    assert spark.conf.get("spark.sql.sources.partitionOverwriteMode").lower() == "static"


def test_orc_round_trip_pushdown(spark, tables, tmp_path):
    path = str(tmp_path / "orders_orc")
    RD.write_orc(tables["orders"].select("o_orderkey", "o_orderstatus", "o_totalprice"), path)
    back = RD.read_orc(spark, path)
    assert back.count() == tables["orders"].count()
    plan = (
        back.filter(back["o_orderstatus"] == "F")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PushedFilters: [" in plan and "o_orderstatus" in plan


def test_read_text_corpus_lines_and_wholefile(spark, tmp_path):
    from data_pengadaan_agent_spark.sources.readers import read_text_corpus

    d = tmp_path / "corpus"
    d.mkdir()
    (d / "shard0.txt").write_text("alpha beta\ngamma delta\n\n")
    (d / "shard1.txt").write_text("epsilon zeta\n")
    out = read_text_corpus(spark, str(d)).collect()
    assert sorted(r["text"] for r in out) == [
        "alpha beta", "epsilon zeta", "gamma delta"
    ]  # blank line dropped
    by_text = {r["text"]: r for r in out}
    assert by_text["alpha beta"]["source"] == "shard0.txt"
    assert by_text["epsilon zeta"]["n_chars"] == 12
    # content-addressed ids: stable across re-reads and partitioning
    again = read_text_corpus(spark, str(d)).collect()
    assert {r["doc_id"] for r in again} == {r["doc_id"] for r in out}

    whole = read_text_corpus(spark, str(d), whole_files=True).collect()
    assert len(whole) == 2
    texts = sorted(r["text"] for r in whole)
    assert texts[0].startswith("alpha beta\ngamma delta")


def test_write_bucketed_clears_default_db_orphan(spark, tables):
    """ADVICE r12: managed tables in the default database live at
    <warehouse>/<table>, not <warehouse>/default.db/<table> — an
    explicitly default-qualified name must clear THAT orphan. Simulate
    the fresh-session state: location exists, catalog has no table."""
    import os

    warehouse = spark.conf.get("spark.sql.warehouse.dir").replace("file:", "")
    orphan = os.path.join(warehouse, "orphan_b")
    spark.sql("DROP TABLE IF EXISTS orphan_b")
    os.makedirs(orphan, exist_ok=True)
    with open(os.path.join(orphan, "junk"), "w") as f:
        f.write("x")
    try:
        RD.write_bucketed(
            tables["region"], "default.orphan_b", "r_regionkey", n_buckets=2
        )
        assert spark.table("default.orphan_b").count() == tables["region"].count()
    finally:
        spark.sql("DROP TABLE IF EXISTS default.orphan_b")


def test_local_df_slices_and_values(spark):
    """local_df (the per-build fixed-cost fix): tiny driver-local
    frames become ONE slice (createDataFrame's defaultParallelism
    slicing made every 16-row meta/codebook write walk 32 serial
    Python round-trips), large lists stay parallel, empty rows and
    collected Row objects round-trip, and values are identical to the
    plain form."""
    from pyspark.sql import Row

    from data_pengadaan_agent_spark.sources.catalog import local_df

    tiny = local_df(spark, [(1, "a"), (2, "b")], "k int, s string")
    assert tiny.rdd.getNumPartitions() == 1
    assert sorted((r.k, r.s) for r in tiny.collect()) == [(1, "a"), (2, "b")]
    big = local_df(spark, [(i,) for i in range(5000)], "k int")
    assert 1 < big.rdd.getNumPartitions() <= spark.sparkContext.defaultParallelism
    assert big.count() == 5000
    assert local_df(spark, [], "k int, s string").count() == 0
    # collected Rows + read-back schema (the compaction recommit path)
    src = local_df(spark, [(4, 64, 5, "key")], "a int, b int, c int, d string")
    rows, schema = src.collect(), src.schema
    back = local_df(spark, rows, schema)
    assert back.collect() == rows and back.schema == schema
    # explicit slices for per-row-work fan-out
    fan = local_df(spark, [(i,) for i in range(8)], "k int", slices=8)
    assert fan.rdd.getNumPartitions() == 8

"""S1 RDBMS source: JDBC scans with partitioned parallel reads.

The reference's base tables live in a SQLite file scanned per-query
(reference: openai/list_of_tools.py:148-150 — ``sqlite3.connect`` +
``pd.read_sql``). The Spark-first re-expression is ``spark.read.jdbc``:

- **Parallelism by construction**: pass ``partition_column`` +
  bounds and every executor reads its own slice through its own JDBC
  connection (``numPartitions`` concurrent cursors). Without it, a
  JDBC read is ONE connection on ONE executor — correct, and exactly
  the single-node bottleneck this engine exists to avoid.
- **Pushdown**: Spark pushes filters and column pruning into the
  remote SQL (``SELECT <cols> FROM t WHERE <filters>``), so a
  predicate on the DataFrame becomes a predicate on the RDBMS.

SQLite specifically has no JDBC driver jar in this container, so
``load_sqlite_table`` tries JDBC first and falls back to a
DRIVER-SIDE ``sqlite3`` read handed to ``createDataFrame``. The
fallback is loudly dimension-table-only: the whole table passes
through the driver, which is fine for the reference's ~1000-row
procurement table and wrong for anything that doesn't fit in driver
memory — at scale, install ``org.xerial:sqlite-jdbc`` (or point at a
real RDBMS) and the same call takes the executor-parallel path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def load_jdbc_table(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
    driver: str | None = None,
    **properties: str,
) -> DataFrame:
    """Generic JDBC scan. With ``partition_column`` (+ bounds), the
    read fans out to ``num_partitions`` parallel range slices; the
    bounds only steer slicing — rows outside them are still read."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if driver:
        reader = reader.option("driver", driver)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partition_column requires lower_bound and upper_bound")
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    for k, v in properties.items():
        reader = reader.option(k, v)
    return reader.load()


def load_sqlite_table(
    spark: SparkSession,
    db_path: str,
    table: str,
    max_fallback_rows: int = 1_000_000,
) -> DataFrame:
    """Reference-fidelity SQLite scan (S1). JDBC when a driver jar is
    on the classpath; otherwise a driver-side sqlite3 → Arrow →
    ``createDataFrame`` fallback, hard-capped at ``max_fallback_rows``
    so a fact table can never silently funnel through the driver."""
    try:
        df = load_jdbc_table(
            spark, f"jdbc:sqlite:{db_path}", table, driver="org.sqlite.JDBC"
        )
        df.schema  # force driver resolution now, not at first action
        return df
    except Exception:
        pass  # no sqlite-jdbc jar — take the documented fallback

    import sqlite3

    con = sqlite3.connect(db_path)
    try:
        n = con.execute(f"SELECT count(*) FROM {table}").fetchone()[0]
        if n > max_fallback_rows:
            raise ValueError(
                f"{table} has {n} rows — too large for the driver-side "
                "SQLite fallback; add the sqlite-jdbc jar for an "
                "executor-parallel read"
            )
        import pandas as pd

        pdf = pd.read_sql_query(f"SELECT * FROM {table}", con)
    finally:
        con.close()
    return spark.createDataFrame(pdf)

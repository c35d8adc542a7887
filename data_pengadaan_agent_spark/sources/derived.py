"""Derived fixture tables.

The driver's fixtures carry no ``partsupp`` table, which blocks the
TPC-H shapes Q2/Q9/Q11/Q16/Q20 (round-1 verdict: "fixture derivation
or explicit exclusion both fine"). This module DERIVES one
deterministically from ``part`` × a 4-way supplier assignment, with
pure integer arithmetic that the DuckDB oracles re-emit verbatim — so
the derived table is bit-identical on both engines and the queries
stay value-checked, not rows-only.

Derivation (for j in 0..3, S = |supplier|):
    ps_partkey    = p_partkey
    ps_suppkey    = (p_partkey * 4 + j) % S              (4 distinct suppliers/part;
                    suppkeys are 0-based in the fixtures)
    ps_availqty   = (p_partkey * 37 + j * 11) % 9999 + 1
    ps_supplycost = ((p_partkey * 53 + j * 17) % 90000) / 100.0 + 100.0

``ps_supplycost`` is an exact 2-decimal value; money math casts it to
DECIMAL(18,2) before aggregation (the repo-wide pattern), so parallel
summation stays bit-deterministic.

At 100 TB this table would be materialized once at ingest (it is a
pure projection+explode of ``part`` — no shuffle) and bucketed on
``ps_partkey`` to co-locate with part/lineitem joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# The DuckDB spelling of the derivation, kept adjacent to the Spark
# spelling so the twins can't drift.
PARTSUPP_SQL_CTE = """
  SELECT p_partkey AS ps_partkey,
         (p_partkey * 4 + j) % (SELECT count(*) FROM supplier) AS ps_suppkey,
         CAST((p_partkey * 37 + j * 11) % 9999 + 1 AS INT) AS ps_availqty,
         CAST((p_partkey * 53 + j * 17) % 90000 AS DOUBLE) / 100.0 + 100.0 AS ps_supplycost
  FROM part CROSS JOIN (SELECT unnest(range(4)) AS j)
"""


# Commit/receipt dates for TPC-H Q21-style lateness predicates; the
# fixtures carry only l_shipdate. Same rule on both engines:
#   l_commitdate  = l_shipdate + ((l_orderkey*3 + l_linenumber) % 45 - 15) days
#   l_receiptdate = l_shipdate + ((l_orderkey + l_linenumber) % 30 + 1) days
# so ~some lines are late (receipt > commit) and some are not.
LINE_DATES_SQL_CTE = """
  SELECT *,
         l_shipdate + ((l_orderkey * 3 + l_linenumber) % 45 - 15) * INTERVAL 1 DAY
           AS l_commitdate,
         l_shipdate + ((l_orderkey + l_linenumber) % 30 + 1) * INTERVAL 1 DAY
           AS l_receiptdate
  FROM lineitem
"""


def derive_line_dates(lineitem: DataFrame) -> DataFrame:
    """Adds l_commitdate / l_receiptdate; see LINE_DATES_SQL_CTE. Pure
    projection — integer day offsets on exact timestamps, no shuffle,
    bit-identical across engines."""
    return lineitem.withColumn(
        "l_commitdate",
        F.expr("timestampadd(DAY, CAST((l_orderkey * 3 + l_linenumber) % 45 - 15 AS INT), l_shipdate)"),
    ).withColumn(
        "l_receiptdate",
        F.expr("timestampadd(DAY, CAST((l_orderkey + l_linenumber) % 30 + 1 AS INT), l_shipdate)"),
    )


def derive_partsupp(part: DataFrame, supplier_count: int) -> DataFrame:
    """4 supplier assignments per part; see module docstring. The
    explode is JVM-side (sequence+explode), no shuffle, no Python."""
    p = F.col("p_partkey")
    j = F.col("j")
    return part.select(p, F.explode(F.sequence(F.lit(0), F.lit(3))).alias("j")).select(
        p.alias("ps_partkey"),
        ((p * 4 + j) % F.lit(supplier_count)).alias("ps_suppkey"),
        ((p * 37 + j * 11) % 9999 + 1).cast("int").alias("ps_availqty"),
        (((p * 53 + j * 17) % 90000).cast("double") / 100.0 + 100.0).alias("ps_supplycost"),
    )

"""Deterministic sampling / splitting operators for training-data
pipelines.

A 100 TB corpus build needs reproducible splits: the same document
must land in the same split on every run, on any cluster layout, with
no RNG state. Both operators therefore key off an ARITHMETIC hash of
the id (Knuth multiplicative hashing, 32-bit), which the DuckDB
oracles re-emit verbatim — so even the "random" operators are
value-checked, the same trick the LSH/minhash families use.

``df.sample()`` / ``TABLESAMPLE`` are the built-in alternatives but
are seed-AND-partitioning dependent (a repartition changes the
sample), which is exactly what a reproducible pipeline can't have.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Knuth's 32-bit multiplicative constant; (id * K) % 2^32 scrambles
# uniformly and is exactly representable in BIGINT arithmetic on both
# engines (max product ~2^63 for ids < 2^31).
_KNUTH = 2654435761
_M32 = 1 << 32


def split_hash_col(id_col: str | Column) -> Column:
    """Uniform [0, 2^32) bucket from an integer id — pure BIGINT
    arithmetic, identical in any SQL engine."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return (c.cast("long") * F.lit(_KNUTH)) % F.lit(_M32)


def train_test_split(
    df: DataFrame, id_col: str = "doc_id", train_frac: float = 0.8, label_col: str = "split"
) -> DataFrame:
    """Deterministic row-level split: hash(id) under the threshold →
    'train', else 'test'. Stateless, shuffle-free, stable under
    repartitioning and re-runs; the fraction is exact in expectation,
    not per-partition quota (no coordination needed)."""
    thresh = int(train_frac * _M32)
    return df.withColumn(
        label_col,
        F.when(split_hash_col(id_col) < F.lit(thresh), F.lit("train")).otherwise(
            F.lit("test")
        ),
    )


def sample_per_group(
    df: DataFrame, group_col: str, id_col: str, k: int
) -> DataFrame:
    """Deterministic k-per-group sample: rank rows within each group
    by the scrambled hash (ties broken by id) and keep the first k.
    One hash-partitioned window — the shuffle carries only the
    group/id/payload rows, and at scale the rank never materializes
    the full sorted group (window + filter ≤ k prunes per partition).
    The canonical 'cap documents per domain' curation step."""
    w = Window.partitionBy(group_col).orderBy(split_hash_col(id_col), F.col(id_col))
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )

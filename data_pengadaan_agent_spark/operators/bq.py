"""Binary quantization (BQ) — the 1-bit/dim Hamming tier.

The fourth rung of the compression ladder (raw float -> SQ8 -> PQ ->
BQ): each dimension collapses to ONE sign bit against a per-dimension
threshold, the bits pack into BIGINT words, and retrieval ranks by
Hamming distance computed as ``bit_count(xor(word, query_word))`` —
pure integer whole-stage codegen, the cheapest possible scan shape.
This is the coarse tier modern vector stores put FIRST: scan the
1-bit codes to a shortlist, then re-rank the shortlist exactly
(``bq_rerank_topk``). A 64-dim float32 vector is 256 B; its BQ code is
two 63-bit words = 16 B before parquet bit-packing.

Reference parity: the reference's retrieval surface is a pandas
cosine scan (reference: openai/my_toolkit.py's similarity tool); BQ is
an extension the 100 TB deployment needs, with provenance in public
research (sign-random-projection LSH, Charikar STOC 2002; binary
quantization as shipped by modern ANN systems).

Determinism contract (the sq.py structural-equality class):

- thresholds = per-dimension midrange ``(min + max) / 2`` — min/max
  are EXACT order-free aggregates, and the midrange is ONE IEEE add +
  ONE divide-by-two on bit-identical doubles, so every engine computes
  the identical threshold bits. (A mean would be order-dependent
  across partitions — never use it here.)
- bit_i = 1 iff x_i > t_i (strict; exactly-at-threshold is 0 on every
  engine because the compared doubles are bit-identical).
- words pack 63 bits (bits 0..62) so every word is a SUM of distinct
  powers of two < 2**63 — plain positive BIGINT arithmetic; no engine
  has to agree about the int64 sign bit, and DuckDB's ``1 << 63``
  overflow never enters the picture. 64 dims -> 2 words.
- Hamming = sum of ``bit_count(xor(a, b))`` per word: pure integers,
  both engines' bit_count verified to agree (including on negative
  inputs, which this packing never produces). Ties rank by id
  ascending (the pq/sq convention).
- the exact re-rank stage quantizes raw dims to BIGINT micro-units via
  ``floor(x * 10^dp + 0.5)`` — one multiply + one floor on
  bit-identical doubles, the sq_encode structural argument again —
  then sums exact integer squared differences.

At scale: the BQ scan is the narrowest possible full-corpus pass
(8-16 B/vector instead of 256), entirely inside whole-stage codegen
with no Python worker and no shuffle before the distributed
TakeOrderedAndProject; the re-rank touches only ``shortlist`` rows
(a broadcast-join-sized set by construction).
"""

from __future__ import annotations

import math
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BITS_PER_WORD = 63


def train_bq(
    df: DataFrame,
    dim: int,
    vec_col: str = "embedding",
) -> list[float]:
    """Per-dimension midrange thresholds from ONE codegen aggregate
    (2*dim agg expressions, driver receives one row). Exact min/max ->
    deterministic under any partitioning; (mn + mx) / 2 is structural
    cross-engine equality (one add, one exact halving)."""
    if dim < 1:
        raise ValueError("train_bq: dim must be >= 1")
    row = df.agg(
        *[F.min(F.col(vec_col)[i].cast("double")).alias(f"mn{i}") for i in range(dim)],
        *[F.max(F.col(vec_col)[i].cast("double")).alias(f"mx{i}") for i in range(dim)],
    ).collect()[0]
    out = []
    for i in range(dim):
        mn, mx = row[f"mn{i}"], row[f"mx{i}"]
        if mn is None or mx is None:
            raise ValueError(f"train_bq: dimension {i} has no values")
        out.append((float(mn) + float(mx)) / 2.0)
    return out


def n_words(dim: int) -> int:
    return (dim + BITS_PER_WORD - 1) // BITS_PER_WORD


def bq_code_col(
    vec_col: str,
    thresholds: Sequence[float],
):
    """array<bigint> of 63-bit sign-bit words as a pure column
    expression: bits = zip_with(v, t, x > t), then each word is the
    dot product of its bit slice against a literal powers-of-two
    array — all inside whole-stage codegen, no Python worker."""
    dim = len(thresholds)
    t_lit = F.array(*[F.lit(float(t)) for t in thresholds])
    bits = F.zip_with(
        F.col(vec_col),
        t_lit,
        lambda x, t: F.when(x.cast("double") > t, F.lit(1))
        .otherwise(F.lit(0))
        .cast("bigint"),
    )
    words = []
    for w in range(n_words(dim)):
        start = w * BITS_PER_WORD
        width = min(BITS_PER_WORD, dim - start)
        powers = F.array(*[F.lit(1 << j).cast("bigint") for j in range(width)])
        # slice() is 1-indexed
        word = F.aggregate(
            F.zip_with(
                F.slice(bits, start + 1, width), powers, lambda b, p: b * p
            ),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        )
        words.append(word)
    return F.array(*words)


def bq_encode(
    df: DataFrame,
    thresholds: Sequence[float],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, words array<bigint>) — one codegen select, no shuffle."""
    return df.select(
        F.col(id_col),
        bq_code_col(vec_col, thresholds).alias("words"),
    )


def encode_query_bq(
    query: Sequence[float], thresholds: Sequence[float]
) -> list[int]:
    """Driver-side query packing: the SAME strict ``x > t`` test on
    identical doubles, packed into the same 63-bit words."""
    if len(query) != len(thresholds):
        raise ValueError(
            f"encode_query_bq: query dim {len(query)} != "
            f"threshold dim {len(thresholds)}"
        )
    bits = [1 if float(x) > float(t) else 0 for x, t in zip(query, thresholds)]
    words = []
    for w in range(n_words(len(bits))):
        chunk = bits[w * BITS_PER_WORD : (w + 1) * BITS_PER_WORD]
        words.append(sum(b << j for j, b in enumerate(chunk)))
    return words


def hamming_col(words_col, query_words: Sequence[int]):
    """Hamming distance to the literal query words: one
    zip_with(bit_count(xor)) fold, exact BIGINT."""
    q_lit = F.array(*[F.lit(int(w)).cast("bigint") for w in query_words])
    return F.aggregate(
        F.zip_with(
            words_col,
            q_lit,
            lambda a, b: F.bit_count(a.bitwiseXOR(b)).cast("bigint"),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


def bq_topk(
    codes_df: DataFrame,
    query_words: Sequence[int],
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Rank the packed corpus by Hamming distance to the query words —
    integer codegen scan, no join, no shuffle, then a distributed
    TakeOrderedAndProject. Ties to the lowest id (the sq convention).
    Returns (rank, id, hamming)."""
    from pyspark.sql import Window

    top = (
        codes_df.select(
            F.col(id_col), hamming_col(F.col("words"), query_words).alias("hamming")
        )
        .orderBy(F.asc("hamming"), F.asc(id_col))
        .limit(int(k))
    )
    w = Window.orderBy(F.asc("hamming"), F.asc(id_col))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank", id_col, "hamming"
    )


def micro_l2_col(vec_col: str, query: Sequence[float], dp: int = 6):
    """Exact integer squared L2 on the micro-unit grid:
    q_i = floor(x_i * 10^dp + 0.5) as BIGINT (one multiply + one floor
    on bit-identical doubles — structural), then sum of integer
    squared diffs. 64 dims at |x| <= ~1e3 stays far inside int64."""
    scale = float(10**dp)
    q_micro = [int(math.floor(float(x) * scale + 0.5)) for x in query]
    q_lit = F.array(*[F.lit(q).cast("bigint") for q in q_micro])
    v_micro = F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") * F.lit(scale) + F.lit(0.5)).cast(
            "bigint"
        ),
    )
    return F.aggregate(
        F.zip_with(v_micro, q_lit, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


def bq_rerank_topk(
    df: DataFrame,
    thresholds: Sequence[float],
    query: Sequence[float],
    k: int = 10,
    shortlist: int = 50,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dp: int = 6,
) -> DataFrame:
    """The production two-stage shape: (1) the 1-bit Hamming scan cuts
    the corpus to ``shortlist`` candidates (the ONLY full-corpus pass —
    16 B/vector, pure codegen), (2) exact integer micro-unit L2
    re-ranks just the shortlist. Both stages deterministic: Hamming
    ties then l2 ties break by id ascending. Returns
    (rank, id, hamming, l2_micro).

    At 100 TB stage 1 is a TakeOrderedAndProject over the packed
    codes; stage 2 touches ``shortlist`` rows — driver-bounded by
    construction, never data-sized."""
    from pyspark.sql import Window

    qwords = encode_query_bq(query, thresholds)
    stage1 = (
        df.select(
            F.col(id_col),
            F.col(vec_col),
            hamming_col(bq_code_col(vec_col, thresholds), qwords).alias(
                "hamming"
            ),
        )
        .orderBy(F.asc("hamming"), F.asc(id_col))
        .limit(int(shortlist))
    )
    scored = stage1.select(
        F.col(id_col),
        F.col("hamming"),
        micro_l2_col(vec_col, query, dp).alias("l2_micro"),
    )
    top = scored.orderBy(F.asc("l2_micro"), F.asc(id_col)).limit(int(k))
    w = Window.orderBy(F.asc("l2_micro"), F.asc(id_col))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank", id_col, "hamming", "l2_micro"
    )

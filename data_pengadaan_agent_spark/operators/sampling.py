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
_M31 = 1 << 31  # pre-multiply id fold: keeps id * _KNUTH < 2^63


def split_hash_col(id_col: str | Column) -> Column:
    """Uniform [0, 2^32) bucket from an integer id — pure BIGINT
    arithmetic, identical in any SQL engine.

    Id-domain contract (ADVICE r4): the id is first folded to [0, 2^31)
    with ``pmod`` so the Knuth multiply can NEVER wrap 63-bit signed
    BIGINT (2^31 x 2654435761 < 2^63; a raw 64-bit id — e.g. the
    xxhash64 ``doc_id`` from read_text_corpus — would overflow and turn
    the 'uniform [0, 2^32)' scramble into signed wrapped values). For
    ids already in [0, 2^31) the fold is the identity, so every
    existing oracle replica is unchanged; 64-bit ids lose their top
    bits to the fold, which is harmless for bucketing (the scramble
    mixes the surviving 31) and keeps the expression replicable in any
    BIGINT-only SQL engine."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return (F.pmod(c.cast("long"), F.lit(_M31)) * F.lit(_KNUTH)) % F.lit(_M32)


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


def corpus_mix(
    df: DataFrame,
    weights: dict[str, float],
    group_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Weighted corpus mixing: downsample each group (language,
    source, domain...) so the surviving corpus matches the target
    proportions in ``weights`` — the data-mixing step of every LLM
    pretraining recipe (e.g. The Pile / LLaMA mixture tables).

    The output size is the LARGEST total achievable without
    upsampling:  S = min_g(n_g / w_g);  each group then keeps
    rate_g = w_g·S / n_g of its rows, selected by the deterministic
    Knuth hash of the id (stable under re-runs and repartitioning,
    same trick as train_test_split). Groups absent from ``weights``
    are dropped.

    Scale shape: one small per-group count (partial-aggregated
    shuffle), rates computed on that tiny frame, broadcast-joined
    back onto the corpus, then a stateless hash filter — the corpus
    itself is scanned once and never shuffled.
    """
    w_expr = F.lit(None).cast("double")
    for g, w in weights.items():
        w_expr = F.when(F.col(group_col) == g, F.lit(float(w))).otherwise(w_expr)
    counts = (
        df.groupBy(group_col)
        .agg(F.count(F.lit(1)).cast("bigint").alias("_n"))
        .withColumn("_w", w_expr)
        .filter(F.col("_w").isNotNull())
    )
    feasible = counts.agg(
        F.min(F.col("_n").cast("double") / F.col("_w")).alias("_s")
    )
    rates = counts.crossJoin(F.broadcast(feasible)).select(
        group_col,
        F.floor(
            (F.col("_w") * F.col("_s") / F.col("_n").cast("double")) * F.lit(float(_M32))
        )
        .cast("bigint")
        .alias("_thresh"),
    )
    return (
        df.join(F.broadcast(rates), group_col)
        .filter(split_hash_col(id_col) < F.col("_thresh"))
        .drop("_thresh")
    )


def quantile_band(
    df: DataFrame, value_col: str, lo: float = 0.05, hi: float = 0.95
) -> DataFrame:
    """Keep rows whose ``value_col`` lies within the corpus's
    [lo, hi] discrete quantile band — the standard outlier-length
    filter of corpus curation (drop the empty shells and the
    concatenated monsters).

    ``percentile_disc`` picks an ACTUAL data value (first value with
    cumulative distribution ≥ p), so the band never depends on
    interpolation arithmetic — exact on any engine. The thresholds
    are a 1-row aggregate broadcast into a stateless filter: the
    corpus is scanned once, unshuffled. Spark's exact percentile
    aggregates a value→count map, so its memory is bounded by
    DISTINCT values, not rows; for extreme-cardinality columns swap
    in approx_percentile.
    """
    band = df.agg(
        F.expr(
            f"percentile_disc({lo}) WITHIN GROUP (ORDER BY {value_col})"
        ).alias("_lo"),
        F.expr(
            f"percentile_disc({hi}) WITHIN GROUP (ORDER BY {value_col})"
        ).alias("_hi"),
    )
    return (
        df.crossJoin(F.broadcast(band))
        .filter(F.col(value_col).between(F.col("_lo"), F.col("_hi")))
        .drop("_lo", "_hi")
    )


def shuffle_shard(
    df: DataFrame, id_col: str = "doc_id", n_shards: int = 8
) -> DataFrame:
    """Deterministic global training-order shuffle + shard assignment
    — the last step of every pretraining data build: scramble document
    order (so batches are i.i.d.-ish) and split the stream into
    ``n_shards`` output shards with a stable within-shard position.

    Order comes from the Knuth hash (no RNG state, stable under
    repartitioning); ``shard = hash % n_shards`` is a stateless row
    expression, and ``pos`` is a row_number over (shard) — i.e. the
    sort is per-shard, never global. At 100 TB this is exactly the
    "shuffle into K sorted shards" layout (one hash-partitioned
    exchange into K writers, each sorting its own shard); a single
    global sequence number would serialize on one reducer and is
    deliberately not offered.
    """
    h = split_hash_col(id_col)
    w = Window.partitionBy("shard").orderBy(F.col("_h"), F.col(id_col))
    return (
        df.withColumn("_h", h)
        .withColumn("shard", F.pmod(F.col("_h"), F.lit(n_shards)).cast("int"))
        .withColumn("pos", F.row_number().over(w).cast("bigint"))
        .drop("_h")
    )


def stratified_sample(
    df: DataFrame, group_col: str, frac: float, id_col: str = "doc_id"
) -> DataFrame:
    """EXACT-quota proportional stratified sample: every group
    contributes exactly ``ceil(frac · n_g)`` rows. Complements the
    rate-based operators (``train_test_split``/``corpus_mix`` hit their
    fractions only in expectation — fine for huge corpora, wrong for
    per-stratum evaluation sets that must have a guaranteed size).

    Selection is deterministic: rank within each group by the
    Knuth-scrambled id (stable under repartitioning and re-runs), keep
    ranks up to the group's quota. Cost at scale: one tiny per-group
    count (partial-aggregated) broadcast back onto the corpus plus one
    hash-partitioned window pass — the corpus shuffles once, on the
    group key, and the rank filter prunes per partition."""
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).cast("bigint").alias("_n"))
    quota = counts.select(
        group_col,
        F.ceil(F.col("_n") * F.lit(float(frac))).cast("bigint").alias("_q"),
    )
    w = Window.partitionBy(group_col).orderBy(split_hash_col(id_col), F.col(id_col))
    return (
        df.join(F.broadcast(quota), group_col)
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= F.col("_q"))
        .drop("_rk", "_q")
    )


def corpus_mix_token_budget(
    df: DataFrame,
    budgets: dict[str, int],
    group_col: str = "lang",
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
) -> DataFrame:
    """Token-budget corpus mixing: per group, admit documents in
    deterministic scrambled-hash order until the group's TOKEN budget
    is exhausted — the unit modern pretraining mixtures are actually
    specified in (a "30B-token English / 5B-token code" recipe is a
    token budget per source, not a document count; ``corpus_mix``'s
    proportional-docs form is the ratio variant).

    A document is admitted iff the tokens consumed BEFORE it in its
    group's hash order are still under budget, so each group overshoots
    by at most one document (never undershoots a reachable budget) and
    membership is a pure function of content ids — stable under
    re-runs, repartitioning, and incremental corpus growth in
    everything except the hash frontier. Groups absent from
    ``budgets`` are dropped.

    Scale shape: one hash-partitioned window per group (the only
    exchange), carrying (group, hash, tokens) — the running sum never
    materializes the group; the budget map is a CASE expression, no
    join at all.

    NULL token counts are DROPPED (self-review r12): a document whose
    size is unknown cannot be budgeted — the old coalesce admitted it
    FREE even after the budget was exhausted, and diverged from the
    plain-SQL form (where the NULL running sum fails the filter).
    """
    budget_expr = F.lit(None).cast("bigint")
    for g, t in budgets.items():
        budget_expr = F.when(F.col(group_col) == g, F.lit(int(t))).otherwise(budget_expr)
    w = Window.partitionBy(group_col).orderBy(split_hash_col(id_col), F.col(id_col))
    consumed_before = F.coalesce(
        F.sum(F.col(token_col)).over(w) - F.col(token_col), F.lit(0)
    )
    return (
        df.filter(F.col(token_col).isNotNull())
        .withColumn("_budget", budget_expr)
        .filter(F.col("_budget").isNotNull())
        .withColumn("_before", consumed_before.cast("bigint"))
        .filter(F.col("_before") < F.col("_budget"))
        .drop("_budget", "_before")
    )


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    n: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Fixed-size weighted sample WITHOUT replacement — sequential
    Poisson sampling (Ohlsson 1998, the πps scheme statistics
    agencies run their price indices on): every row gets the priority key
    ``hash_u(id) / weight`` and the n SMALLEST keys win, so selection
    probability is proportional to weight (asymptotically exact πps)
    while membership stays a pure function of (id, weight) — stable
    under re-runs, repartitioning, and cluster layout, like every
    sampler in this module. The quality-weighted curation step ("keep
    2M documents, favor high quality-score") in one scan.

    Cross-engine determinism is STRUCTURAL, stronger than the
    kmeans-family gap-probe class: the key is ONE int-to-double
    conversion (exact below 2^53) followed by ONE IEEE division,
    spelled identically on Spark and DuckDB, so keys are bit-identical
    by construction; the (key, id) tiebreak means even an exact key
    collision orders identically on both engines. No rounding anywhere
    — nothing for a margin probe to certify.

    Scale shape: a TakeOrderedAndProject — each partition keeps its
    local top-n, ONE n-row merge at the driver/final stage, no global
    sort, no shuffle of the corpus. Rows with NULL or non-positive
    weight have zero selection probability and are excluded (Poisson
    semantics), never sampled and never an error.
    """
    if n < 1:
        raise ValueError("weighted_sample: n must be >= 1")
    key = split_hash_col(id_col).cast("double") / F.col(weight_col).cast("double")
    return (
        df.filter(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        .withColumn("_wkey", key)
        .orderBy(F.col("_wkey").asc(), F.col(id_col).asc())
        .limit(int(n))
        .drop("_wkey")
    )


def weighted_sample_per_group(
    df: DataFrame,
    group_col: str,
    weight_col: str,
    k: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """k-per-group weighted sample: the same sequential-Poisson key,
    ranked within each group — ``sample_per_group``'s weighted
    sibling ("cap each domain at k docs, favor high quality"). One
    hash-partitioned window; the rank never materializes the full
    sorted group (WindowGroupLimit prunes per partition)."""
    if k < 1:
        raise ValueError("weighted_sample_per_group: k must be >= 1")
    key = split_hash_col(id_col).cast("double") / F.col(weight_col).cast("double")
    w = Window.partitionBy(group_col).orderBy(key.asc(), F.col(id_col).asc())
    return (
        df.filter(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= int(k))
        .drop("_rk")
    )

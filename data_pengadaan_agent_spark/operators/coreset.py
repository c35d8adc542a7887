"""Coreset selection — greedy k-center (farthest-point traversal).

Training-data pipelines select SMALL representative subsets of huge
embedding corpora: seeds for clustering, diverse exemplars for
labeling, anchors for curriculum mixing. The classic primitive is the
greedy k-center / farthest-point rule (Gonzalez 1985, the 2-approx
for the k-center objective; "coreset" usage per Har-Peled's survey):
start anywhere, then repeatedly take the point FARTHEST from the
selected set. Each selection's distance is the coverage radius the
NEXT center removes — the returned radii are non-increasing and are
themselves the stopping diagnostic (select until radius < tau).

Determinism contract (the sq/bq structural-equality class):

- every vector is quantized ONCE to the BIGINT micro-unit grid
  ``floor(x * 10^dp + 0.5)`` — one multiply + one floor on
  bit-identical doubles, identical on every engine;
- ALL distances are exact integer squared L2 over those micro-units.
  int64 headroom (the bq.micro_l2_col bound): per-dim diff <=
  2·|x|max·10^dp, so 64 dims at dp=6 are safe to |x| ~1.5e2 (sum
  ~9e18 at the edge) — far above the fixtures' unit-scale
  embeddings; past that ANSI raises loudly rather than wrapping, and
  the dp knob trades range for resolution;
- the seed is the minimum id; every argmax breaks ties to the LOWEST
  id. Integer scores + total tiebreak = one deterministic trajectory,
  reproducible bit-for-bit by an unrolled SQL twin.

Execution shape at 100 TB: k-1 passes, each ONE codegen scan that
(a) folds the squared distance to the single newest center against a
literal array (no join, no shuffle) and (b) takes the global argmax
via a distributed TakeOrdered(1). The running min-distance column is
carried forward and localCheckpoint-ed per pass, so lineage stays
O(1) and pass t does t=1 work, not t. Driver state is k rows —
parameter-sized. (The sampled pre-pass variant — run the same greedy
on a hash-sampled subset, then one final assignment scan — drops the
cost to ~1 scan when k is large; this exact trajectory is the
building block either way.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def micro_vec_col(vec_col: str, dp: int = 6):
    """array<bigint> micro-unit quantization of a float vector —
    the bq.micro_l2_col grid as a reusable column."""
    scale = float(10**dp)
    return F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") * F.lit(scale) + F.lit(0.5)).cast(
            "bigint"
        ),
    )


def _dist_to(center_micro: list[int]):
    """Exact integer squared L2 from the ``q`` column to a literal
    center — codegen fold, no join."""
    c_lit = F.array(*[F.lit(int(v)).cast("bigint") for v in center_micro])
    return F.aggregate(
        F.zip_with(F.col("q"), c_lit, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


def kcenter_coreset(
    df: DataFrame,
    k: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dp: int = 6,
) -> DataFrame:
    """Greedy k-center over the exact micro-unit grid. Returns the
    selected set as (sel_rank, <id_col>, dist_micro): sel_rank 1 is
    the seed (minimum id, dist_micro 0 by convention); sel_rank t is
    the point farthest from centers 1..t-1, with dist_micro = that
    exact integer distance (the coverage radius the selection
    removes). Radii are non-increasing. Already-selected ids are
    excluded from every argmax (otherwise an all-duplicates corpus
    would re-pick the seed forever); duplicate VALUES still select —
    at radius 0, lowest unpicked id first. Raises if k exceeds the
    number of distinct ids.

    Each of the k-1 passes updates the running min-distance with ONE
    least() against the newest center only and localCheckpoints the
    (id, q, mind) frame, so pass cost is flat in t and lineage never
    grows."""
    if k < 1:
        raise ValueError("kcenter_coreset: k must be >= 1")
    spark = df.sparkSession
    base = df.select(
        F.col(id_col).alias("vid"), micro_vec_col(vec_col, dp).alias("q")
    ).dropDuplicates(["vid"])
    picked, _ = _kcenter_select(base, k)
    from data_pengadaan_agent_spark.sources.catalog import local_df

    return local_df(
        spark, picked, f"sel_rank int, {id_col} bigint, dist_micro bigint"
    )


def _kcenter_select(
    base: DataFrame, k: int
) -> tuple[list[tuple], list[list[int]]]:
    """The greedy loop over a deduped (vid, q) frame: returns BOTH the
    (sel_rank, vid, dist_micro) trajectory and the quantized center
    vectors it actually selected, in selection order — consumers must
    use THESE vectors, not a re-fetch by id from the raw frame, which
    under duplicate ids can resolve to a vector the trajectory never
    chose (self-review r12: nondeterministic coverage)."""
    seed = base.orderBy(F.asc("vid")).limit(1).collect()
    if not seed:
        raise ValueError("kcenter_coreset: empty input")
    seed = seed[0]
    picked = [(1, int(seed["vid"]), 0)]
    centers = [[int(v) for v in seed["q"]]]
    state = None
    for t in range(1, k):
        prev = state
        if state is None:
            state = base.withColumn("mind", _dist_to(centers[-1]))
        else:
            state = state.withColumn(
                "mind", F.least(F.col("mind"), _dist_to(centers[-1]))
            )
        state = state.localCheckpoint(eager=True)
        # release the superseded pass's checkpoint (self-review r14 —
        # the pagerank_int_converged lesson: DataFrame.unpersist is a
        # no-op for localCheckpoint blocks, and without the release
        # k-1 full (vid, q, mind) copies stay pinned for the session)
        if prev is not None:
            from data_pengadaan_agent_spark.operators.graph import (
                _release_local_checkpoint,
            )

            _release_local_checkpoint(prev)
        taken = [p[1] for p in picked]
        far = (
            state.filter(~F.col("vid").isin(taken))
            .orderBy(F.desc("mind"), F.asc("vid"))
            .limit(1)
            .collect()
        )
        if not far:
            raise ValueError(
                f"kcenter_coreset: k={k} exceeds the {len(taken)} distinct "
                "id(s) in the input"
            )
        far = far[0]
        picked.append((t + 1, int(far["vid"]), int(far["mind"])))
        centers.append([int(v) for v in far["q"]])
    return picked, centers


def kcenter_coverage_sampled(
    df: DataFrame,
    k: int,
    sample_frac: float = 0.25,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dp: int = 6,
) -> DataFrame:
    """The 100 TB shape of k-center: run the greedy trajectory on a
    DETERMINISTIC Knuth-hash sample (the sampling.py split hash — no
    RNG state, stable under any partitioning, replicable in any SQL
    engine), then measure coverage over the FULL corpus in exactly
    ONE scan. The greedy loop's k-1 passes touch only ~frac*N rows;
    the full data is read once, by the final coverage aggregate —
    versus k full scans for the exact trajectory. The classic
    trade-off (Gonzalez on a sample + one assignment pass) with the
    sampled radius as the quality certificate: returns ONE row
    (n_points, n_sample, max_radius_micro, sum_radius_micro,
    n_centers_used). All distances exact integers; ties and the
    trajectory deterministic exactly as in ``kcenter_coreset``."""
    from data_pengadaan_agent_spark.operators.sampling import (
        _M32,
        split_hash_col,
    )

    if not (0.0 < sample_frac <= 1.0):
        raise ValueError("kcenter_coverage_sampled: sample_frac in (0, 1]")
    thresh = int(sample_frac * _M32)
    sample = df.filter(split_hash_col(id_col) < F.lit(thresh))
    # the trajectory's OWN quantized vectors, never a re-fetch by id
    # from the raw frame (duplicate ids could resolve to a vector the
    # greedy loop never selected — nondeterministic coverage,
    # self-review r12)
    sample_base = sample.select(
        F.col(id_col).alias("vid"), micro_vec_col(vec_col, dp).alias("q")
    ).dropDuplicates(["vid"])
    _, centers = _kcenter_select(sample_base, k)
    n_sample = sample.count()
    return coverage_report(df, centers, vec_col, id_col, dp).select(
        "n_points",
        F.lit(int(n_sample)).cast("bigint").alias("n_sample"),
        "max_radius_micro",
        "sum_radius_micro",
        "n_centers_used",
    )


def coverage_report(
    df: DataFrame,
    centers_micro: list[list[int]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dp: int = 6,
) -> DataFrame:
    """How well a selected set covers the corpus: per-point min
    distance to ANY center folded to one summary row — n, max radius
    (the k-center objective), sum (the k-median surrogate), and the
    assigned-center histogram via argmin (ties to the lowest center
    index). One codegen scan; centers are parameter-sized literals."""
    if not centers_micro:
        raise ValueError("coverage_report: need at least one center")
    q = micro_vec_col(vec_col, dp)
    dists = []
    for c in centers_micro:
        c_lit = F.array(*[F.lit(int(v)).cast("bigint") for v in c])
        dists.append(
            F.aggregate(
                F.zip_with(q, c_lit, lambda a, b: (a - b) * (a - b)),
                F.lit(0).cast("bigint"),
                lambda acc, x: acc + x,
            )
        )
    # running (best, argmin) fold with ties to the lowest center
    # index — exact integers, so the comparison chain is
    # engine-independent
    best, assigned = dists[0], F.lit(0)
    for i in range(1, len(dists)):
        assigned = F.when(dists[i] < best, F.lit(i)).otherwise(assigned)
        best = F.least(best, dists[i])
    per = df.select(
        F.col(id_col), best.alias("mind"), assigned.alias("center_idx")
    )
    return per.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_points"),
        F.max("mind").cast("bigint").alias("max_radius_micro"),
        F.sum("mind").cast("bigint").alias("sum_radius_micro"),
        F.countDistinct("center_idx").cast("bigint").alias("n_centers_used"),
    )

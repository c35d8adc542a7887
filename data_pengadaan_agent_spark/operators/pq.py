"""Product quantization (PQ) — the compression layer of the ANN stack.

Jégou, Douze & Schmid, "Product Quantization for Nearest Neighbor
Search" (TPAMI 2011): split each d-dim vector into ``m`` contiguous
subvectors, k-means each subspace independently into ``ksub``
centroids, and store a vector as its m one-small-int code word. At
100 TB this is the operator that makes an embedding corpus FIT: a
64-dim float32 vector is 256 B, its m=8/ksub=256 PQ code is 8 B — a
32× reduction — and asymmetric distance computation (ADC) scans the
CODES, never the vectors: per query build the m×ksub lookup table of
query-subvector→centroid distances once (parameter-sized), then every
candidate's score is m table lookups and a sum. The repo's IVF family
partitions WHERE vectors live; PQ compresses WHAT is scanned — the
two compose (IVF-ADC) exactly as in the paper.

Spark shapes, chosen per stage:

- ``train_pq``: all m subspaces train TOGETHER in one Lloyd loop.
  The assignment kernel (Arrow, NumPy) emits per-batch PARTIAL
  (sub, code, dim, sum, n) rows — m·ksub·dsub per batch, collapsed
  map-side before the loop's single exchange, the kmeans_lloyd
  discipline with the posexplode blow-up removed. The driver holds
  only the m×ksub×dsub codebook between iterations. Deterministic:
  init = subvectors of the ksub lowest-id vectors; assignment
  distances are ROUNDED to ``round_dp`` (default 4dp — COARSER than
  ivf_drift's 6dp on purpose: at sf0.1 a pre-round distance measured
  2e-13 from a .5e-6 half, inside cross-engine drift; at 4dp the
  danger zone starts ~1e-10 absolute, three orders above drift, and a
  coarser grid only makes ties more common, which the lowest-code
  rule breaks identically on both engines) before the argmin
  (tools/audit_round_boundaries.py probes the pre-round margins).
- ``pq_encode``: ONE Arrow scan through a plan-size-constant kernel
  (codebook in the closure); output (id, codes array<int>).
- ``pq_adc_topk``: the LUT is rounded to exact BIGINT micro-units
  (round(d·10^lut_dp)) and embedded as ONE flat array literal, so the
  score is an exact integer sum evaluated in a pure codegen select —
  no join, no shuffle — followed by a distributed
  TakeOrderedAndProject. Ties rank by id ascending. Integer scores
  are what make the oracle twin hash-exact (the bm25 lesson: never
  hash a cross-engine float).

The DuckDB twin (__spark_entry__._pq_adc_sql) replays training,
encode, LUT and ranking from the same parameters; centroid float
drift between engines (~1e-15 summation-order) is absorbed by the
rounded assignment/LUT grids, whose fixture margins are measured, not
assumed.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _check_geometry(dim: int, m: int) -> int:
    if m < 1 or dim < 1 or dim % m:
        raise ValueError(f"train_pq: dim {dim} must split into m={m} equal subspaces")
    return dim // m


def train_pq(
    df: DataFrame,
    dim: int,
    m: int = 4,
    ksub: int = 4,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_dp: int = 4,
) -> list[list[list[float]]]:
    """Train the m×ksub PQ codebook; returns codebooks[sub][code] =
    dsub-dim centroid (driver-sized by construction: m·ksub·dsub
    floats). ``iters`` Lloyd rounds; like kmeans_lloyd, iters=1 means
    one assignment against the id-0..ksub-1 init with no update."""
    import numpy as np

    dsub = _check_geometry(dim, m)
    if ksub < 1 or iters < 1:
        raise ValueError("train_pq: ksub and iters must be >= 1")
    init = (
        df.filter(F.col(id_col) < ksub)
        .select(id_col, vec_col)
        .collect()
    )
    if len(init) < ksub:
        raise ValueError(
            f"train_pq: init needs ids 0..{ksub - 1} present; got {len(init)}"
        )
    by_id = sorted((int(r[id_col]), [float(x) for x in r[vec_col]]) for r in init)
    # codebooks[sub] = ksub × dsub
    cb = np.array(
        [[v[s * dsub : (s + 1) * dsub] for _, v in by_id] for s in range(m)],
        dtype=np.float64,
    )

    from data_pengadaan_agent_spark.sources.catalog import spread

    src = spread(df.select(id_col, vec_col), id_col)

    for _ in range(iters - 1):
        cb_now = cb.copy()

        def partials(batches, cb_now=cb_now):
            import pandas as pd

            for pdf in batches:
                if len(pdf) == 0:
                    continue
                vecs = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
                if vecs.shape[1] != dim:
                    raise ValueError(
                        f"train_pq: vector dim {vecs.shape[1]} != {dim}"
                    )
                out = []
                for s in range(m):
                    sv = vecs[:, s * dsub : (s + 1) * dsub]
                    d = np.round(
                        ((sv[:, None, :] - cb_now[s][None, :, :]) ** 2).sum(-1),
                        round_dp,
                    )
                    code = np.argmin(d, axis=1)  # first (lowest) code on ties
                    for c in range(ksub):
                        sel = sv[code == c]
                        if len(sel):
                            ssum = sel.sum(axis=0)
                            for j in range(dsub):
                                out.append((s, c, j, float(ssum[j]), len(sel)))
                yield pd.DataFrame(
                    out, columns=["sub", "code", "dim", "s", "n"]
                )

        rows = (
            src.mapInPandas(
                partials, schema="sub int, code int, dim int, s double, n long"
            )
            .groupBy("sub", "code", "dim")
            .agg(F.sum("s").alias("s"), F.sum("n").alias("n"))
            .collect()
        )
        for r in rows:
            cb[r["sub"], r["code"], r["dim"]] = r["s"] / r["n"]
        # codes with zero members keep their previous centroid (the
        # standard empty-cluster rule; deterministic on both engines)
    return [[list(map(float, cb[s, c])) for c in range(ksub)] for s in range(m)]


def pq_encode(
    df: DataFrame,
    codebooks: Sequence[Sequence[Sequence[float]]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_dp: int = 4,
) -> DataFrame:
    """Encode vectors to PQ codes: (id, codes array<int>), one Arrow
    scan, codebook in the closure. Assignment = argmin over the
    ROUNDED subspace distance, ties to the lowest code."""
    import numpy as np

    cb = np.array(codebooks, dtype=np.float64)  # m × ksub × dsub
    m, _, dsub = cb.shape
    dim = m * dsub

    def run(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            vecs = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            if vecs.shape[1] != dim:
                raise ValueError(f"pq_encode: vector dim {vecs.shape[1]} != {dim}")
            codes = np.empty((len(vecs), m), dtype=np.int32)
            for s in range(m):
                sv = vecs[:, s * dsub : (s + 1) * dsub]
                d = np.round(
                    ((sv[:, None, :] - cb[s][None, :, :]) ** 2).sum(-1), round_dp
                )
                codes[:, s] = np.argmin(d, axis=1)
            yield pd.DataFrame(
                {id_col: pdf[id_col], "codes": list(map(list, codes))}
            )

    from data_pengadaan_agent_spark.sources.catalog import spread

    return spread(df.select(id_col, vec_col), id_col).mapInPandas(
        run, schema=f"{id_col} long, codes array<int>"
    )


def adc_lut(
    codebooks: Sequence[Sequence[Sequence[float]]],
    query_vec: Sequence[float],
    lut_dp: int = 6,
) -> list[int]:
    """The query's asymmetric-distance lookup table as exact BIGINT
    micro-units: flat[sub·ksub + code] = round(‖q_sub − centroid‖² ·
    10^lut_dp). Parameter-sized (m·ksub ints); computed identically
    by the oracle twin so ADC scores hash-match as integers."""
    import numpy as np

    cb = np.array(codebooks, dtype=np.float64)
    m, ksub, dsub = cb.shape
    q = np.array(list(map(float, query_vec)), dtype=np.float64)
    if q.shape[0] != m * dsub:
        raise ValueError(f"adc_lut: query dim {q.shape[0]} != {m * dsub}")
    import math

    out = []
    for s in range(m):
        qs = q[s * dsub : (s + 1) * dsub]
        d = ((qs[None, :] - cb[s]) ** 2).sum(-1)
        for c in range(ksub):
            # floor(x + 0.5), NOT np.round: np.round is HALF_EVEN while
            # DuckDB's round() is HALF_UP — an on-half LUT value would
            # diverge by 1 micro-unit; this rule is spelled identically
            # in the twin (floor(x*1e6 + 0.5))
            out.append(int(math.floor(d[c] * (10 ** lut_dp) + 0.5)))
    return out


def pq_adc_topk(
    codes_df: DataFrame,
    codebooks: Sequence[Sequence[Sequence[float]]],
    query_vec: Sequence[float],
    k: int = 10,
    id_col: str = "vec_id",
    lut_dp: int = 6,
) -> DataFrame:
    """ADC top-k over a PQ-coded corpus: score each row by m flat-LUT
    lookups summed as exact BIGINTs inside ONE codegen select (no
    join, no shuffle — the LUT is a literal array), then a distributed
    TakeOrderedAndProject caps at k. Returns (rank, id, adc_score);
    lower score = nearer. Ties rank by id ascending."""
    ksub = len(codebooks[0])
    m = len(codebooks)
    lut = adc_lut(codebooks, query_vec, lut_dp)
    flat = F.array(*[F.lit(int(v)).cast("bigint") for v in lut])
    score = None
    for s in range(m):
        term = F.element_at(flat, F.col("codes")[s] + s * ksub + 1)
        score = term if score is None else score + term
    scored = codes_df.select(
        F.col(id_col), score.cast("bigint").alias("adc_score")
    )
    top = scored.orderBy(F.asc("adc_score"), F.asc(id_col)).limit(int(k))
    from pyspark.sql import Window

    w = Window.orderBy(F.asc("adc_score"), F.asc(id_col))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank", id_col, "adc_score"
    )

"""Distribution-drift detection — the monitoring tier of a standing
pipeline: "did this batch/metric change regime?"

Two exact-integer primitives (DuckDB-certifiable, no rounding probes —
every derived quantity is BIGINT arithmetic after ONE structural
milli-unit grid that both engines compute with identical IEEE ops):

- ``change_point``: offline CUSUM — for each group's time series the
  index k maximizing |n·prefix_k − k·S| (the unnormalized cumulative
  deviation from the group mean, kept in cross-multiplied integer
  form so no mean is ever divided). The classic single change-point
  statistic; the argmax is deterministic (earliest k wins ties).
  One window shuffle per group.

  Overflow bound (documented, not hidden): |n·prefix − k·S| ≤
  n²·max|x_milli|; with values gridded at 10^-3 this stays in BIGINT
  for n ≲ 3·10^8 rows per group at |x| ≤ 100 — group-level series,
  not corpus-level. For longer series, aggregate to a coarser grain
  first (the histogram cube exists for exactly that).

- ``histogram_drift``: L1 distance between two snapshots' per-bin
  SHARES in ppm — the exact-integer counterpart of PSI/KL (which
  need logs and would smuggle in floats). share_ppm = cnt·10^6 DIV
  total per side; drift_ppm = Σ|share_a − share_b| over bins (0 =
  identical shape, 2·10^6 = disjoint). Bins reuse the histogram
  cube's structural bucketing law. One groupBy per side + a tiny
  bin join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from data_pengadaan_agent_spark.operators.histcube import bin_col


def change_point(
    df: DataFrame,
    group_cols: list[str],
    ts_col: str,
    value_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Per group: (group..., cp_ts, cp_k, n, score) where score =
    max_k |n·prefix_k − k·S| over the series ordered by the TOTAL
    (ts, tiebreak) order, and cp is the earliest k attaining it.
    A flat series scores 0 with cp at k=1; NULL **and NaN** values
    are dropped before gridding — both carry no signal, and a NaN
    would otherwise grid to 0 (floor(NaN·1000+0.5) = 0) and fabricate
    a level shift (self-review r12)."""
    if not group_cols:
        raise ValueError("change_point: need at least one group column")
    xm = F.floor(F.col(value_col).cast("double") * F.lit(1000.0) + F.lit(0.5)).cast(
        "bigint"
    )
    w_ord = Window.partitionBy(*group_cols).orderBy("_ts", "_tb")
    w_run = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wg = Window.partitionBy(*group_cols)
    rows = (
        df.filter(
            F.col(value_col).isNotNull()
            & ~F.isnan(F.col(value_col).cast("double"))
        )
        .select(
            *group_cols,
            F.col(ts_col).alias("_ts"),
            F.col(tiebreak_col).alias("_tb"),
            xm.alias("_x"),
        )
        .withColumn("_k", F.row_number().over(w_ord))
        .withColumn("_prefix", F.sum("_x").over(w_run))
        .withColumn("_n", F.count(F.lit(1)).over(wg))
        .withColumn("_s", F.sum("_x").over(wg))
        .withColumn(
            "_dev", F.abs(F.col("_n") * F.col("_prefix") - F.col("_k") * F.col("_s"))
        )
    )
    pick = Window.partitionBy(*group_cols).orderBy(F.desc("_dev"), "_k")
    return (
        rows.withColumn("_r", F.row_number().over(pick))
        .filter(F.col("_r") == 1)
        .select(
            *group_cols,
            F.col("_ts").alias("cp_ts"),
            F.col("_k").cast("bigint").alias("cp_k"),
            F.col("_n").cast("bigint").alias("n"),
            F.col("_dev").cast("bigint").alias("score"),
        )
        .orderBy(*group_cols)
    )


def histogram_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int = 20,
) -> DataFrame:
    """One row: (n_a, n_b, drift_ppm) — L1 distance between the two
    snapshots' per-bin share vectors, exact integer ppm. Bins are the
    histogram cube's clamped structural buckets, so out-of-range mass
    lands in the edge bins and still counts toward drift. Either side
    empty is an error (a share vector needs a denominator)."""
    def shares(df, side):
        return (
            df.filter(
                F.col(value_col).isNotNull()
                & ~F.isnan(F.col(value_col).cast("double"))
            )
            .withColumn("bin", bin_col(value_col, lo, hi, n_bins))
            .groupBy("bin")
            .agg(F.count(F.lit(1)).cast("bigint").alias(f"cnt_{side}"))
        )

    a, b = shares(df_a, "a"), shares(df_b, "b")
    # one materialization: totals.collect() and the per-bin aggregate
    # otherwise each re-run both snapshots' scans + the full join
    # (self-review r12)
    joined = a.join(b, "bin", "full").select(
        F.coalesce("cnt_a", F.lit(0)).cast("bigint").alias("cnt_a"),
        F.coalesce("cnt_b", F.lit(0)).cast("bigint").alias("cnt_b"),
    ).localCheckpoint(eager=True)
    totals = joined.agg(
        F.sum("cnt_a").cast("bigint").alias("n_a"),
        F.sum("cnt_b").cast("bigint").alias("n_b"),
    )
    trow = totals.collect()[0]
    if trow.n_a == 0 or trow.n_b == 0:
        raise ValueError("histogram_drift: both snapshots must be non-empty")
    # per-bin shares in DECIMAL(38,0): cnt * 1e6 leaves int64 once a
    # snapshot passes ~9.2e12 rows (self-review r14, exactmath); each
    # share is <= 1e6 so the bigint difference/sum are unchanged
    from data_pengadaan_agent_spark.functions.exactmath import dec_idiv_sql

    per_bin = joined.select(
        F.abs(
            F.expr(
                dec_idiv_sql(
                    "CAST(cnt_a AS DECIMAL(38,0)) * 1000000", str(int(trow.n_a))
                )
            )
            - F.expr(
                dec_idiv_sql(
                    "CAST(cnt_b AS DECIMAL(38,0)) * 1000000", str(int(trow.n_b))
                )
            )
        )
        .cast("bigint")
        .alias("_d")
    )
    return per_bin.agg(F.sum("_d").cast("bigint").alias("drift_ppm")).select(
        F.lit(int(trow.n_a)).cast("bigint").alias("n_a"),
        F.lit(int(trow.n_b)).cast("bigint").alias("n_b"),
        "drift_ppm",
    )

"""Exact distributed quantiles by iterative histogram refinement.

``histcube.hist_quantile_bins`` answers quantiles as BINS — the right
trade for a standing cube, but sometimes the EXACT value is the
contract (billing thresholds, SLO reports). The naive exact answer is
a per-group global sort; at 100 TB that sort is the job. The classic
alternative is distributed selection (the median-of-medians family,
practically deployed as iterative histogram refinement): each pass
buckets only the rows still inside each group's candidate range into
``n_bins`` counters, the driver walks the ≤ groups·|q|·n_bins counter
rows to find which bin holds the target rank, and the range narrows
~n_bins× per pass. A handful of FULL SCANS with tiny aggregates
replaces the global sort; the final pass sorts only the last slice
(bounded by the last bin count, driver-checked), so no executor ever
materializes a group.

Exactness contract: nearest-rank — the q-th quantile of n values is
the ceil(q·n / 10^6)-th smallest. Duplicate-heavy data cannot stall
the refinement: every pass also folds the slice's min/max, and a
slice with min == max IS the answer (mass-duplicate short-circuit).
Bin-boundary consistency uses half-open slices [lo, hi) with an
``include_hi`` flag that is true only while hi is the group's global
max — so a value equal to a bin edge is counted in exactly one bin on
every pass (the off-by-one that silently corrupts rank arithmetic
otherwise).

The driver state is parameter-sized (one row per (group, q)), the
same contract as the kmeans codebook loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    q_ppm: list[int] = (500_000,),
    n_bins: int = 1024,
    max_passes: int = 8,
    final_slice_max: int = 100_000,
) -> DataFrame:
    """Exact nearest-rank quantile VALUES per group (see module
    docstring). Returns (group, q_ppm, value, rank, n) ordered by
    (group, q_ppm); empty groups emit nothing, NULL values are
    excluded. Raises if a slice is still wider than
    ``final_slice_max`` rows after ``max_passes`` refinements AND not
    min==max-resolvable (pathological float distributions — raise the
    pass budget)."""
    for q in q_ppm:
        if not (0 < int(q) <= 1_000_000):
            raise ValueError("exact_quantiles: q_ppm entries must be in "
                             "(0, 1000000]")
    if n_bins < 2 or max_passes < 1:
        raise ValueError("exact_quantiles: need n_bins >= 2, max_passes >= 1")
    spark = df.sparkSession
    # NaN drops like NULL (self-review r12): Spark orders NaN greatest,
    # so one NaN makes hi=NaN, width=NaN, every row bins to n_bins-1
    # and refinement can never narrow — max_passes burns with zero
    # progress and the "raise max_passes" advice can never help.
    vals = (
        df.select(F.col(group_col).alias("g"), F.col(value_col).cast("double").alias("v"))
        .filter(F.col("v").isNotNull() & ~F.isnan(F.col("v")))
    )
    base = vals.localCheckpoint(eager=True)  # one materialization, P scans
    stats = {
        r["g"]: (int(r["n"]), float(r["lo"]), float(r["hi"]))
        for r in base.groupBy("g")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
        )
        .collect()
    }
    # state per (group, q): remaining slice [lo, hi), include_hi, and
    # the target rank WITHIN the slice
    active: dict[tuple, dict] = {}
    resolved: list[tuple] = []  # (g, q, value, rank, n)
    for g, (n, lo, hi) in stats.items():
        for q in q_ppm:
            r = -(-int(q) * n // 1_000_000)  # ceil, nearest-rank
            if lo == hi:
                resolved.append((g, int(q), lo, r, n))
            else:
                active[(g, int(q))] = {
                    "lo": lo, "hi": hi, "inc": True, "r": r,
                    "rank": r, "n": n, "cnt": n,
                }

    gtype = dict(base.dtypes)["g"]

    def state_df():
        rows = [
            (g, q, s["lo"], s["hi"], s["inc"]) for (g, q), s in active.items()
        ]
        from data_pengadaan_agent_spark.sources.catalog import local_df

        return local_df(
            spark, rows, f"g_s {gtype}, q_ppm int, lo double, hi double, inc boolean"
        )

    passes = 0
    while active and passes < max_passes:
        # one scan buckets every active (group, q) slice at once;
        # eqNullSafe — groupBy emits a NULL group into stats/active,
        # and plain equality would drop its rows here, firing the
        # rank-unreachable assert on pass 1 (self-review r12)
        st = F.broadcast(state_df())
        joined = base.join(st, base["g"].eqNullSafe(st["g_s"])).filter(
            (F.col("v") >= F.col("lo"))
            & ((F.col("v") < F.col("hi")) | (F.col("inc") & (F.col("v") == F.col("hi"))))
        )
        width = (F.col("hi") - F.col("lo")) / F.lit(int(n_bins))
        bin_ = F.least(
            F.lit(int(n_bins) - 1),
            F.greatest(F.lit(0), F.floor((F.col("v") - F.col("lo")) / width)),
        ).cast("int")
        counts = (
            joined.groupBy("g", "q_ppm", bin_.alias("bin"))
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("cnt"),
                F.min("v").alias("bmin"),
                F.max("v").alias("bmax"),
            )
            .collect()
        )
        by_state: dict[tuple, list] = {}
        for row in counts:
            by_state.setdefault((row["g"], row["q_ppm"]), []).append(row)
        nxt: dict[tuple, dict] = {}
        for key, s in active.items():
            rows = sorted(by_state.get(key, []), key=lambda r: r["bin"])
            r = s["r"]
            cum = 0
            for row in rows:
                if cum + row["cnt"] >= r:
                    if row["bmin"] == row["bmax"]:
                        # mass-duplicate short-circuit: the slice the
                        # rank falls in holds ONE value
                        resolved.append(
                            (key[0], key[1], float(row["bmin"]), s["rank"], s["n"])
                        )
                        break
                    # narrow to the OBSERVED bin extremes, inclusive
                    # both ends: floor-bucketing is monotone in v, so
                    # bin b's rows are value-contiguous and
                    # [bmin, bmax] selects EXACTLY the counted rows on
                    # the next pass — immune to float rounding at the
                    # arithmetic bin edges (which could otherwise
                    # leak a counted row out of the slice and corrupt
                    # the rank). Progress is guaranteed: bmin < bmax
                    # here (min == bmax short-circuits above), and
                    # bin(bmin)=0 != bin(bmax)>=1 on the next pass.
                    nxt[key] = {
                        "lo": float(row["bmin"]),
                        "hi": float(row["bmax"]),
                        "inc": True,
                        "r": r - cum,
                        "rank": s["rank"],
                        "n": s["n"],
                        "cnt": int(row["cnt"]),
                    }
                    break
                cum += row["cnt"]
            else:  # pragma: no cover - rank arithmetic invariant
                raise AssertionError(
                    f"exact_quantiles: rank {r} not reachable in slice {key}"
                )
        active = nxt
        passes += 1

    if active:
        worst = max(s["cnt"] for s in active.values())
        if worst > final_slice_max:
            raise ValueError(
                f"exact_quantiles: a slice still holds {worst} rows after "
                f"{max_passes} passes (> final_slice_max={final_slice_max}) "
                "— raise max_passes or final_slice_max"
            )
        # final exact selection: sort ONLY the residual slices
        st = F.broadcast(state_df())
        from data_pengadaan_agent_spark.sources.catalog import local_df

        rstate = F.broadcast(
            local_df(
                spark,
                [(g, q, s["r"]) for (g, q), s in active.items()],
                f"g_r {gtype}, q_r int, r bigint",
            )
        )
        joined = base.join(st, base["g"].eqNullSafe(st["g_s"])).filter(
            (F.col("v") >= F.col("lo"))
            & ((F.col("v") < F.col("hi")) | (F.col("inc") & (F.col("v") == F.col("hi"))))
        )
        w = Window.partitionBy("g", "q_ppm").orderBy("v")
        picked = (
            joined.withColumn("_rn", F.row_number().over(w))
            .join(
                rstate,
                F.col("g").eqNullSafe(F.col("g_r"))
                & (F.col("q_ppm") == F.col("q_r"))
                & (F.col("_rn") == F.col("r")),
            )
            .select("g", "q_ppm", "v")
            .collect()
        )
        for row in picked:
            key = (row["g"], row["q_ppm"])
            s = active[key]
            resolved.append((row["g"], row["q_ppm"], float(row["v"]), s["rank"], s["n"]))

    from data_pengadaan_agent_spark.sources.catalog import local_df

    out = local_df(
        spark,
        resolved,
        f"{group_col} {gtype}, q_ppm int, value double, rank bigint, n bigint",
    )
    return out.orderBy(group_col, "q_ppm")

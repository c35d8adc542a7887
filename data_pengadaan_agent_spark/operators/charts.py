"""Chart-data pipelines (SURVEY.md §2.11, C1–C4).

Each reference chart tool = scan intermediary → validate columns →
transform → render PNG → scalar insights (openai/list_of_tools.py:
14-112,204-449; langchain/my_toolkit.py:183-410). The *engine* part is
the transform + insights; rendering is presentation. Every function
here returns ``(data: DataFrame, insights: dict)`` where ``data`` is
the small aggregated frame a renderer would plot — only that small
frame ever crosses to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_pengadaan_agent_spark.operators import aggregates as A


class ChartColumnError(ValueError):
    """Mirrors the reference's column-existence validation
    (openai/list_of_tools.py:38-40,232-236)."""


def _require(df: DataFrame, *cols: str) -> None:
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ChartColumnError(f"columns not in result: {missing}; have {df.columns}")


def bar_chart_data(df: DataFrame, x: str, y: str, insights: bool = True) -> tuple[DataFrame, dict]:
    """C1: categorical x vs numeric y + count/max/min/mean/sum insights
    (openai/list_of_tools.py:204-269). ``insights=False`` returns only
    the plottable frame, skipping the eager insights action."""
    _require(df, x, y)
    data = df.select(x, y)
    if not insights:
        return data, {}
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.max(y).alias("max_v"),
        F.min(y).alias("min_v"),
        F.avg(y).alias("mean_v"),
        F.sum(y).alias("sum_v"),
        # backtick-quoted: stage-2 columns can be named `count(1)` or
        # carry spaces — raw interpolation re-parsed them as SQL
        # (self-review r12)
        F.expr(f"max_by(`{x}`, `{y}`)").alias("top_category"),
        F.expr(f"min_by(`{x}`, `{y}`)").alias("bottom_category"),
    ).first()
    return data, row.asDict()


def line_chart_data(
    df: DataFrame, ts_col: str, id_col: str, measure_col: str, insights: bool = True
) -> tuple[DataFrame, dict]:
    """C2: dual-axis monthly series (A2) + period insights
    (openai/list_of_tools.py:272-385). ``insights=False`` skips the
    eager insights action (and the cache that amortizes it) when the
    caller only wants the plottable frame — e.g. the correctness gate,
    which would otherwise pay a second full aggregation per call."""
    _require(df, ts_col, id_col, measure_col)
    if not insights:
        return A.monthly_rollup(df, ts_col, id_col, measure_col), {}
    # localCheckpoint, not cache (self-review r12): cached frames are
    # held by the session's cache manager FOREVER unless explicitly
    # unpersisted — repeated chart calls leaked storage; a checkpointed
    # RDD is released by the ContextCleaner when the frame is GC'd
    data = A.monthly_rollup(df, ts_col, id_col, measure_col).localCheckpoint(
        eager=True
    )
    row = data.agg(
        F.min("bulan").alias("first_month"),
        F.max("bulan").alias("last_month"),
        F.sum("jumlah_paket").alias("total_count"),
        F.sum("total_pagu").alias("total_value"),
        F.avg("total_pagu").alias("avg_monthly_value"),
        F.expr("max_by(bulan, total_pagu)").alias("peak_value_month"),
        F.expr("max_by(bulan, jumlah_paket)").alias("peak_count_month"),
    ).first()
    return data, row.asDict()


def pie_chart_data(df: DataFrame, label: str, value: str) -> tuple[DataFrame, dict]:
    """C3: label/value shares + largest/smallest contributor
    (openai/list_of_tools.py:388-449). Share = value / sum(value) OVER ()
    — a windowed total, no second scan."""
    _require(df, label, value)
    # broadcast scalar total, not sum() OVER () with no partition keys
    # (self-review r12): the unpartitioned window moved EVERY input row
    # to one partition — a single-partition shuffle that serializes or
    # OOMs on a large stage-2 frame; the values are identical
    tot_col = "_tot"
    while tot_col in df.columns:  # collision-proof vs caller frames
        tot_col += "_"
    tot = df.agg(F.sum(value).alias(tot_col))
    data = (
        df.crossJoin(F.broadcast(tot))
        .select(
            F.col(label),
            F.col(value),
            (F.col(value) / F.col(tot_col)).alias("share"),
        )
    )
    row = df.agg(
        F.sum(value).alias("total"),
        F.expr(f"max_by(`{label}`, `{value}`)").alias("largest"),
        F.expr(f"min_by(`{label}`, `{value}`)").alias("smallest"),
    ).first()
    return data, row.asDict()


def histogram_data(df: DataFrame, col: str, bins: int = 12) -> tuple[DataFrame, dict]:
    """C4: dtype-dispatched histogram mirroring
    openai/list_of_tools.py:42-58 —
    numeric → equal-width bins (A6); timestamp (or parsable string) →
    month-of-year, years collapsed (A7); else categorical freq (A3)."""
    _require(df, col)
    dtype = df.schema[col].dataType
    if isinstance(dtype, T.NumericType):
        data = A.histogram_numeric(df, col, bins)
        row = df.agg(
            F.count(col).alias("n"),
            F.min(col).alias("min_v"),
            F.max(col).alias("max_v"),
            F.avg(col).alias("mean_v"),
        ).first()
        return data, row.asDict()
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType, T.DateType)):
        data = A.histogram_month_of_year(df, col)
        row = data.agg(F.expr("max_by(month_no, cnt)").alias("peak_month"), F.sum("cnt").alias("n")).first()
        return data, row.asDict()
    if isinstance(dtype, T.StringType):
        # ALL-or-nothing datetime parse like the pandas reference
        # (to_datetime raises on the first bad value → fallback):
        # any-one-parses dispatch silently dropped every non-parsing
        # row from the chart (self-review r12). try_to_timestamp:
        # NULL on failure instead of ANSI error.
        parsed = df.withColumn("_ts", F.try_to_timestamp(F.col(col)))
        probe = parsed.filter(F.col(col).isNotNull()).agg(
            F.count(F.lit(1)).alias("_n"),
            F.count("_ts").alias("_ok"),
        ).first()
        if probe["_n"] > 0 and probe["_ok"] == probe["_n"]:
            dd = parsed.filter(F.col("_ts").isNotNull())
            data = A.histogram_month_of_year(dd, "_ts")
            row = data.agg(
                F.expr("max_by(month_no, cnt)").alias("peak_month"), F.sum("cnt").alias("n")
            ).first()
            return data, row.asDict()
    data = A.value_counts(df, col)
    row = data.agg(
        F.expr(f"max_by(`{col}`, cnt)").alias("mode"), F.sum("cnt").alias("n")
    ).first()
    return data, row.asDict()


def render_png(data: DataFrame, kind: str, path: str, x: str, y: str | None = None, title: str = "") -> str:
    """S5 driver-side adapter: small aggregated frame → matplotlib PNG.
    Import-gated; the engine never requires matplotlib."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError("matplotlib not available in this environment") from e
    if kind not in ("bar", "line", "pie", "hist"):
        raise ValueError(f"render_png: unknown kind {kind!r}")
    if y is None:
        # every supported kind plots a y series; a silent KeyError
        # (or a blank 'success' PNG for a typo'd kind) helped nobody
        # (self-review r12)
        raise ValueError("render_png: y column is required")
    pdf = data.toPandas()
    fig, ax = plt.subplots(figsize=(10, 6))
    if kind == "bar":
        ax.bar(pdf[x].astype(str), pdf[y])
    elif kind == "line":
        ax.plot(pdf[x].astype(str), pdf[y], marker="o")
    elif kind == "pie":
        ax.pie(pdf[y], labels=pdf[x].astype(str), autopct="%1.1f%%")
    elif kind == "hist":
        ax.bar(pdf[x].astype(str), pdf[y], width=1.0)
    ax.set_title(title)
    fig.savefig(path, format="png", bbox_inches="tight")
    plt.close(fig)
    return path

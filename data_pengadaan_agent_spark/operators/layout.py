"""Physical-layout optimization: Z-order (Morton) clustering.

A 100 TB table is pruned twice: partition directories first, then
per-file column min/max statistics. Sorting the write by ONE column
makes that column's per-file ranges disjoint (perfect skipping) but
leaves every OTHER column's range per file as wide as the table —
a query filtering on the second column reads everything. Z-ordering
sorts by the bit-interleaved Morton key instead, so every clustered
column's per-file range shrinks like N^(1/k): multi-dimensional data
skipping from plain parquet footer stats, no format extension needed
(the same layout idea Delta's OPTIMIZE ZORDER and the Z-order
literature use; Morton 1966 is the public reference).

Everything here is exact integer bit arithmetic — ``zorder_key`` is a
static fold of shift/mask terms (whole-stage-codegen'd, and an
external SQL engine replays it bit-for-bit), so the layout decision
is deterministic and oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(cols: list[str | Column], bits: int = 21) -> Column:
    """Morton key: interleave the low ``bits`` bits of each column,
    column j owning bit positions j, j+k, j+2k, … (k = len(cols)).
    ``k·bits`` must fit a signed int64 (≤ 63); values are masked to
    ``bits`` bits first, so callers normalize ranges (rank, bucket,
    or day-number the raw values) — Z-order clusters by the masked
    key, and a value exceeding 2^bits−1 would alias onto a far-away
    cell. Negative inputs are rejected by masking semantics too:
    normalize to non-negative before keying."""
    k = len(cols)
    if k < 1:
        raise ValueError("zorder_key: need at least one column")
    if k * bits > 63:
        raise ValueError(
            f"zorder_key: {k} columns x {bits} bits = {k * bits} > 63 "
            "interleaved bits do not fit a signed int64 — lower bits"
        )
    out = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        col = (F.col(c) if isinstance(c, str) else c).cast("long")
        masked = col.bitwiseAND(F.lit((1 << bits) - 1))
        for i in range(bits):
            out = out.bitwiseOR(
                F.shiftleft(
                    F.shiftright(masked, i).bitwiseAND(F.lit(1)),
                    i * k + j,
                )
            )
    return out


def zorder_key_sql(cols: list[str], bits: int = 21) -> str:
    """The SAME fold as ANSI SQL (DuckDB-compatible), emitted from one
    generator so the Spark expression and the oracle twin cannot
    drift: OR of ``(((col >> i) & 1) << (i*k + j))`` terms over the
    masked columns."""
    k = len(cols)
    terms = []
    for j, c in enumerate(cols):
        masked = f"(CAST({c} AS BIGINT) & {(1 << bits) - 1})"
        for i in range(bits):
            terms.append(f"((({masked} >> {i}) & 1) << {i * k + j})")
    return "(" + " | ".join(terms) + ")"


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 16,
    bits: int = 21,
) -> None:
    """Cluster-and-write: range-partition by the Morton key into
    ``n_files`` contiguous key ranges (repartitionByRange gives
    balanced, ORDERED splits — hash partitioning would scatter the
    curve and forfeit the locality), sort within each file, write
    plain parquet. Readers need nothing special: parquet footer
    min/max stats on the ORIGINAL columns do the skipping, because
    each file now covers a compact Morton cell whose projection onto
    every clustered column is narrow."""
    key = zorder_key(cols, bits)
    (
        df.withColumn("_z", key)
        .repartitionByRange(int(n_files), F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def file_skip_fraction(
    path: str, predicates: dict[str, tuple[int, int]]
) -> float:
    """Layout-quality probe: the fraction of parquet data files whose
    footer min/max statistics let a conjunctive box query skip them
    entirely (the decision a scan planner makes from the same stats).
    Reads ONLY footers via pyarrow — no row data."""
    import os

    import pyarrow.parquet as pq

    files = [
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".parquet")
    ]
    if not files:
        raise ValueError(f"file_skip_fraction: no parquet files at {path!r}")
    skipped = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        lo: dict[str, int] = {}
        hi: dict[str, int] = {}
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                c = g.column(ci)
                name = c.path_in_schema
                if name in predicates and c.statistics is not None:
                    st = c.statistics
                    lo[name] = min(lo.get(name, st.min), st.min)
                    hi[name] = max(hi.get(name, st.max), st.max)
        for name, (qlo, qhi) in predicates.items():
            if name in lo and (hi[name] < qlo or lo[name] > qhi):
                skipped += 1
                break
    return skipped / len(files)

"""Z-order layout: key correctness and the data-skipping payoff."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_pengadaan_agent_spark.operators import layout as L


def _morton2(x: int, y: int, bits: int = 21) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_key_matches_reference_and_sql(spark):
    """The Spark fold == a Python Morton reference == the emitted SQL
    (evaluated by Spark SQL here; DuckDB runs the identical string in
    the oracle twin)."""
    rows = [(x, y) for x in (0, 1, 5, 1000, 2**21 - 1) for y in (0, 3, 7, 123456)]
    df = spark.createDataFrame(rows, "x LONG, y LONG")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select("x", "y", L.zorder_key(["x", "y"]).alias("z")).collect()
    }
    assert got == {(x, y): _morton2(x, y) for x, y in rows}
    sql_got = {
        (r["x"], r["y"]): r["z"]
        for r in df.selectExpr(
            "x", "y", L.zorder_key_sql(["x", "y"]) + " AS z"
        ).collect()
    }
    assert sql_got == got
    with pytest.raises(ValueError, match="63"):
        L.zorder_key(["x", "y", "x"], bits=22)


def test_zorder_layout_skips_more_files_than_linear_sort(spark, tmp_path):
    """The payoff pin: on a 2-D box query, the Z-ordered layout's
    footer stats skip MORE files than a linear sort by the first
    column, and the secondary column's per-file ranges actually
    narrow (a linear sort leaves them table-wide)."""
    n = 1 << 14
    df = (
        spark.range(n)
        .select(
            (F.col("id") % 128).alias("x"),
            ((F.col("id") * 2654435761) % 128).alias("y"),
        )
    )
    zpath = str(tmp_path / "zorder")
    lpath = str(tmp_path / "linear")
    L.write_zordered(df, zpath, ["x", "y"], n_files=16, bits=7)
    (
        df.repartitionByRange(16, F.col("x"))
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(lpath)
    )
    box = {"x": (0, 31), "y": (0, 31)}  # a 1/16 corner of the space
    z_skip = L.file_skip_fraction(zpath, box)
    l_skip = L.file_skip_fraction(lpath, box)
    # linear layout: x-files outside [0,31] skip (~3/4), y never helps;
    # the z layout must beat it by also cutting within the x range
    assert z_skip > l_skip, (z_skip, l_skip)
    # and a y-ONLY predicate can skip nothing under the linear layout
    # but something under z
    assert L.file_skip_fraction(lpath, {"y": (0, 31)}) == 0.0
    assert L.file_skip_fraction(zpath, {"y": (0, 31)}) > 0.0
    # content is layout-invariant
    assert (
        spark.read.parquet(zpath).groupBy().sum("x", "y").collect()
        == spark.read.parquet(lpath).groupBy().sum("x", "y").collect()
    )

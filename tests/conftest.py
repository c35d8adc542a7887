from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from data_pengadaan_agent_spark.session import get_spark

    s = get_spark("tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def tables(spark):
    from data_pengadaan_agent_spark.sources.catalog import load_tables

    return load_tables(spark, SF_DIR)


@pytest.fixture()
def pengadaan(spark):
    """Tiny reference-shaped fact table with the semantic-trap rows
    (FIXTURES.md §A1): substring pairs alat/peralatan, multi-year
    timestamps, >int32 budgets, NULLs."""
    rows = [
        (1, "Pengadaan alat tulis", "Dinas A", 5_400_000_000, "2023-12-27 11:30:49", "belanja,alat,tulis,kantor"),
        (2, "Peralatan kantor", "Dinas A", 150_000, "2024-01-05 08:00:00", "belanja,peralatan,kantor"),
        (3, "Perbaikan gedung", "Dinas B", 2_000_000_000, "2024-01-15 09:30:00", "perbaikan,gedung,kantor"),
        (4, "Rehabilitasi gedungnya", "Dinas B", 750_000_000, "2023-01-20 10:00:00", "rehabilitasi,gedungnya"),
        (5, "Jasa kebersihan", "Dinas C", 11, "2024-03-08 14:10:00", "jasa,tenaga,kebersihan"),
        (6, "Paket tanpa tanggal", "Dinas C", 99, None, "lain,lain"),
    ]
    df = spark.createDataFrame(
        rows,
        "kode_rup LONG, nama_paket STRING, satuan_kerja STRING, total_pagu LONG, "
        "tanggal_umumkan_paket STRING, filtered_keywords STRING",
    )
    return df

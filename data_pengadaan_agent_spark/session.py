"""SparkSession factory tuned for the engine.

Local mode is the test bed; the settings below are chosen so the same
code scales to a multi-executor cluster:

- AQE on (runtime re-planning: partition coalescing, skew-join
  handling, dynamic join-strategy switch).
- ``spark.sql.session.timeZone=UTC`` so timestamp semantics match the
  DuckDB oracle (UTC-naive) and are cluster-invariant.
- ``spark.sql.legacy.parquet.nanosAsLong=true``: the ``events`` table
  is written with nanosecond timestamps, which the vectorized Parquet
  reader rejects; reading them as LongType and converting with integer
  division (see sources/catalog.py) preserves exact microsecond
  truncation semantics without a driver-side rewrite.
- Arrow enabled for the pandas-UDF slow path.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEF_SHUFFLE = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(
    app_name: str = "data_pengadaan_agent_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    On a real cluster pass ``master=None`` and let spark-submit supply
    it; locally defaults to ``local[$SPARK_GRAFT_CPUS]``.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        # Local mode runs all 32 task threads in ONE driver JVM; the
        # 1g default heap gives each concurrent task ~30 MB — big
        # shuffles/aggregates OOM while merging their own spill files
        # (observed at docs ×64). 8g ≈ 256 MB/task matches a modest
        # real-cluster executor sizing. Only effective when the JVM
        # is launched by this process (spark-submit sizes it itself).
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
        )
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or _DEF_SHUFFLE))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.parquet.mergeSchema", "false")
        .config("spark.ui.enabled", "false")
    )
    if master is not None:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_GRAFT_ON_CLUSTER"):
        builder = builder.master(f"local[{cpus}]")
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark

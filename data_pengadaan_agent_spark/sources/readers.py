"""Non-parquet sources and scale-oriented sinks.

Sources (SURVEY.md §2.1):
- S3: keyword-vocabulary CSV with stringified float vectors
  (`v2_key.csv`, openai/list_of_tools.py:125-128,
  langchain/my_toolkit.py:442-449) → typed (keyword, ARRAY<FLOAT>).
- JSON lines reader for event-shaped feeds (beyond-reference; the
  `events.props` column is JSON text).

Sinks:
- ``write_partitioned``: Parquet partitioned by a derived key (e.g.
  month) — date-filtered queries then prune whole partitions
  (SURVEY.md §4.2 'partition pruning'). At 100 TB this is the
  difference between scanning 36 files and 36,000.
- ``write_bucketed``: ``bucketBy`` managed table — co-located joins
  and aggregations on the bucket key skip their shuffle entirely
  (verified in tests: the joined plan has no Exchange).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pengadaan_agent_spark.functions.vectors import parse_vector_string


def read_keyword_vocab_csv(spark: SparkSession, path: str) -> DataFrame:
    """S3: header CSV (keyword, embedding='[f, f, …]') → typed frame.
    The vector parse is a column expression — no Python per row."""
    raw = spark.read.option("header", True).csv(path)
    return raw.select(
        F.col("keyword"),
        parse_vector_string("embedding").alias("embedding"),
    )


def write_keyword_vocab_csv(df: DataFrame, path: str, vec_col: str = "embedding") -> None:
    """Round-trip helper: ARRAY<FLOAT> → the reference's stringified
    format ('[a, b, …]', comma+space separated)."""
    df.select(
        "keyword",
        F.concat(
            F.lit("["), F.array_join(F.col(vec_col).cast("array<string>"), ", "), F.lit("]")
        ).alias("embedding"),
    ).write.mode("overwrite").option("header", True).csv(path)


def read_events_json(spark: SparkSession, path: str, schema: str | None = None) -> DataFrame:
    """JSON-lines source; explicit schema skips the inference scan
    (inference reads the whole input once — never at 100 TB)."""
    reader = spark.read
    if schema:
        reader = reader.schema(schema)
    return reader.json(path)


def write_partitioned(
    df: DataFrame, path: str, partition_col: str, derive_month_from: str | None = None
) -> None:
    """Parquet sink partitioned by ``partition_col`` (optionally
    derived as yyyy-MM of a timestamp). Partition count = distinct
    key count — keep it in the hundreds/thousands, not millions."""
    out = df
    if derive_month_from:
        out = df.withColumn(partition_col, F.date_format(F.col(derive_month_from), "yyyy-MM"))
    out.write.mode("overwrite").partitionBy(partition_col).parquet(path)


def write_bucketed(
    df: DataFrame, table: str, bucket_col: str, n_buckets: int = 8, sort: bool = True
) -> None:
    """Managed bucketed table: joins/aggs on ``bucket_col`` between
    tables bucketed the same way read co-located data — no shuffle.
    The write itself shuffles once; every subsequent join amortizes.

    The default in-memory catalog is SESSION-scoped while the
    warehouse DIRECTORY persists, so a fresh session can hit
    LOCATION_ALREADY_EXISTS for a table it has never heard of —
    drop any same-named table AND its orphaned location first."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    try:
        jvm = spark.sparkContext._jvm
        jsc = spark.sparkContext._jsc
        warehouse = spark.conf.get("spark.sql.warehouse.dir")
        # db-qualified names live under <warehouse>/<db>.db/<table>
        # (self-review r12: checking <warehouse>/<db>.<table> missed the
        # real orphaned location, defeating this guard's whole purpose)
        # — EXCEPT the default database, whose managed tables live at
        # <warehouse>/<table> directly (ADVICE r12: 'default.t' mapped
        # to default.db/t, missing the real orphan exactly for
        # explicitly default-qualified names)
        parts = table.lower().split(".")
        if len(parts) > 1 and parts[-2] != "default":
            rel = f"{parts[-2]}.db/{parts[-1]}"
        else:
            rel = parts[-1]
        path = jvm.org.apache.hadoop.fs.Path(warehouse, rel)
        fs = path.getFileSystem(jsc.hadoopConfiguration())
        if fs.exists(path):
            fs.delete(path, True)
    except Exception:  # pragma: no cover - non-JVM session
        pass
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    w.saveAsTable(table)


def overwrite_partitions_dynamic(df: DataFrame, path: str, partition_col: str) -> None:
    """Incremental partition replacement: with
    ``partitionOverwriteMode=dynamic`` an overwrite replaces ONLY the
    partitions present in ``df`` and leaves every other partition's
    files untouched. This is how a daily job lands one day into a
    100 TB table — the static default would TRUNCATE the whole table
    first. The conf is set per-write (runtime-settable) and restored,
    so other writers in the session keep the safer static default."""
    spark = df.sparkSession
    key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(key, "STATIC")
    spark.conf.set(key, "dynamic")
    try:
        df.write.mode("overwrite").partitionBy(partition_col).parquet(path)
    finally:
        spark.conf.set(key, prev)


def write_orc(df: DataFrame, path: str, partition_col: str | None = None) -> None:
    """ORC sink (built into Spark — no extra package). Same columnar
    pushdown/pruning properties as parquet; offered because warehouse
    estates are frequently ORC-side (Hive lineage)."""
    w = df.write.mode("overwrite")
    if partition_col:
        w = w.partitionBy(partition_col)
    w.orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC source — predicate pushdown and column pruning apply
    exactly as with parquet (`.explain` shows PushedFilters)."""
    return spark.read.orc(path)


def read_text_corpus(
    spark: SparkSession, path: str, whole_files: bool = False
) -> DataFrame:
    """Raw-text corpus ingestion — the actual entry point of an LLM
    data pipeline: a directory of ``.txt`` shards becomes
    ``(doc_id, text, source, n_chars)`` ready for the dedup /
    quality / mixing operators.

    ``whole_files=False`` treats each line as a document (the common
    one-doc-per-line shard layout); ``True`` reads one document per
    file (``wholetext``). ``doc_id`` is ``xxhash64(text)`` — content-
    addressed, so it is deterministic under any partitioning or file
    ordering; byte-identical documents intentionally collide (they ARE
    duplicates — collapse them with ``dedup_exact_content``, the
    content-addressed variant; ``dedup_exact``'s min-id semi-join form
    is for tables whose ids are unique).
    ``source`` is the originating file, the provenance column the
    mixing/contamination operators group by.

    Everything is a stateless projection over the text scan — no
    shuffle, no driver-side work, splittable line reads at any scale.
    """
    from pyspark.sql import functions as F

    raw = spark.read.text(path, wholetext=whole_files)
    return raw.select(
        F.xxhash64(F.col("value")).alias("doc_id"),
        F.col("value").alias("text"),
        F.regexp_extract(F.input_file_name(), r"([^/]+)$", 1).alias("source"),
        F.length("value").cast("bigint").alias("n_chars"),
    ).filter(F.length(F.trim(F.col("text"))) > 0)


def read_text_corpus_stream(spark: SparkSession, path: str) -> DataFrame:
    """Streaming twin of ``read_text_corpus``: ``readStream.text`` over
    a shard directory — the incremental front door of a continuously
    ingesting curation pipeline (new shards land, micro-batches pick
    them up; at scale this is the notification-based file source).

    Same content-addressed projection as the batch reader, WITHOUT the
    provenance column: streaming ``dropDuplicates("doc_id")`` keeps an
    arbitrary first-seen row per content hash, so any column that
    differs between byte-identical copies (the originating file) would
    make the output nondeterministic. Provenance-aware dedup belongs in
    the batch path where min(source) is expressible.
    """
    from pyspark.sql import functions as F

    raw = spark.readStream.text(path)
    return raw.select(
        F.xxhash64(F.col("value")).alias("doc_id"),
        F.col("value").alias("text"),
        F.length("value").cast("bigint").alias("n_chars"),
    ).filter(F.length(F.trim(F.col("text"))) > 0)

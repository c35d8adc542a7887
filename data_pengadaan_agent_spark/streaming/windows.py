"""Structured Streaming operators (SURVEY.md §2.13 / §7 phase 5).

The reference has no streaming; the ``events`` fixture exists for a
streaming-shaped extension. Batch/stream parity is the design rule:
every aggregation here is expressed so the same code runs on a static
DataFrame (tests, DuckDB oracle) and on a readStream source
(watermarked, incremental state).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _watermarked(df: DataFrame, col: str, watermark: str) -> DataFrame:
    """Apply a watermark on a stream; pass batch frames through.

    Spark 4 infers tz-less parquet timestamps as TIMESTAMP_NTZ
    (spark.sql.parquet.inferTimestampNTZ.enabled defaults true) and
    ``withWatermark`` rejects NTZ event time
    (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE). The session TZ is pinned UTC
    (session.py), so casting NTZ → TIMESTAMP is value-preserving; we do
    it only on the streaming path so batch/oracle schemas are untouched.
    """
    if not df.isStreaming:
        return df
    if dict(df.dtypes).get(col) == "timestamp_ntz":
        df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df.withWatermark(col, watermark)


def tumbling_counts(events: DataFrame, window_len: str = "1 hour", watermark: str = "10 minutes") -> DataFrame:
    """Tumbling-window count+sum per event_type. On a stream the
    watermark bounds state; on a batch frame withWatermark is a no-op,
    so the same function serves both."""
    src = _watermarked(events, "ts", watermark)
    return (
        src.groupBy(F.window("ts", window_len).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "total_value",
        )
    )


def sliding_counts(
    events: DataFrame, window_len: str = "1 hour", slide: str = "30 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    src = _watermarked(events, "ts", watermark)
    return (
        src.groupBy(F.window("ts", window_len, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )


def session_windows_stream(events: DataFrame, gap: str = "30 minutes", watermark: str = "10 minutes") -> DataFrame:
    """Native session windows (streaming-only operator shape)."""
    src = _watermarked(events, "ts", watermark)
    return (
        src.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("session_start"), F.col("w.end").alias("session_end"), "user_id", "n_events")
    )


def sessionize_batch(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Batch sessionization via gaps-and-islands (lag + cumulative sum)
    — the SQL-expressible twin of session_window, so the oracle can
    verify it. Sessions = per-user runs with inter-event gap <= gap,
    INCLUSIVE at the boundary: an event at exactly prev + gap stays
    in the session — which matches Spark's native ``session_window``
    exactly (measured: the native operator MERGES touching windows,
    it does not split on the half-open edge; pinned from both sides
    of the boundary in tests)."""
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("ts")
    # Interval comparison (not unix_timestamp subtraction): exact to the
    # microsecond and replicable in ANSI SQL for the oracle.
    with_gap = events.withColumn("_prev", F.lag("ts").over(w)).withColumn(
        "_new_session",
        F.when(
            F.col("_prev").isNull()
            | (F.col("ts") > F.col("_prev") + F.expr(f"INTERVAL {gap_minutes} MINUTES")),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    with_id = with_gap.withColumn("session_id", F.sum("_new_session").over(w))
    return (
        with_id.groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
    )


def streaming_dedup(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming exact dedup on event_id within the watermark horizon."""
    src = _watermarked(events, "ts", watermark)
    return src.dropDuplicates(["event_id"])


def streaming_dedup_within_watermark(
    df: DataFrame, id_cols: list[str], ts_col: str, delay: str = "10 minutes"
) -> DataFrame:
    """State-BOUNDED streaming dedup: ``dropDuplicatesWithinWatermark``
    (Spark 3.5+) keeps each key's dedup state only until the watermark
    passes the key's event time + ``delay``, then evicts it. On an
    infinite stream this is the only dedup whose state is O(rate ×
    horizon) instead of O(distinct keys ever seen) — the 100 TB form
    of ``dropDuplicates``. The semantic trade: a duplicate arriving
    AFTER its original's state was evicted is re-emitted, so
    exactly-once collapses to once-per-watermark-window; downstream
    consumers that need global uniqueness finish with a batch
    ``dedup_exact`` over the sink (the standard lambda-free pattern).

    On a batch frame falls back to plain ``dropDuplicates`` (the
    within-watermark variant is streaming-only), preserving the
    batch/stream parity rule."""
    src = _watermarked(df, ts_col, delay)
    if not src.isStreaming:
        return src.dropDuplicates(id_cols)
    return src.dropDuplicatesWithinWatermark(id_cols)


def stream_shuffle_partitions(spark: SparkSession) -> int:
    """State-store partition count for a NEW streaming query.

    Streaming shuffles are exempt from AQE coalescing, and the count
    is a durable choice: Spark snapshots spark.sql.shuffle.partitions
    into the checkpoint at query start and keeps that state sharding
    for the checkpoint's lifetime. So unlike batch (where AQE sizes
    partitions from observed bytes), a stream's state partitioning
    must be sized explicitly — to expected STATE volume (rate ×
    watermark horizon), not to the session's batch-query width.

    Default: min(8, cores). Rationale (measured r14, guide §2.2): the
    per-micro-batch fixed cost of a stateful exchange scales with
    partition count (one task + one state-store instance + delta/
    commit files PER PARTITION per batch), so width the state doesn't
    need is pure overhead — at 32 partitions for KB-scale state the
    three corpus-ingest queries ran 1.6–2.9× slower than at 8
    (tools/stream_partitions_probe.py, interleaved A/B). A production
    deployment with real state volume raises
    $SPARK_GRAFT_STREAM_SHUFFLE (or passes shuffle_partitions) to
    rate-appropriate width; state can only use parallelism it has
    partitions for."""
    import os

    env = os.environ.get("SPARK_GRAFT_STREAM_SHUFFLE")
    if env:
        return max(1, int(env))
    try:
        cores = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except Exception:  # noqa: BLE001 - conf surprise → conservative
        cores = 8
    return max(1, min(8, cores))


def run_stream_to_memory(
    spark: SparkSession,
    stream_df: DataFrame,
    name: str,
    output_mode: str = "append",
    shuffle_partitions: int | None = None,
) -> DataFrame:
    """Drive a streaming frame to completion against a finite source
    (file/parquet) and return the materialized result — the local test
    harness for every operator above. The stateful-shuffle width is
    set per stream (see stream_shuffle_partitions) and the session
    conf restored afterwards; results are partition-count-invariant
    (aggregations/dedup keyed per row; duplicate keys here are
    byte-identical rows by construction)."""
    n = shuffle_partitions or stream_shuffle_partitions(spark)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        q = (
            stream_df.writeStream.outputMode(output_mode)
            .format("memory")
            .queryName(name)
            .start()
        )
        q.processAllAvailable()
        q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.sql(f"SELECT * FROM {name}")


def user_running_totals_stream(events: DataFrame) -> DataFrame:
    """Custom stateful streaming operator via applyInPandasWithState:
    per-user running (count, total_value), emitted each micro-batch in
    update mode. State is one tiny tuple per user — bounded by
    |users|, not |events| — and lives in the state store, partitioned
    by the group key, so a 1000-executor cluster shards it for free.
    Streaming-only (Spark rejects applyInPandasWithState on batch
    frames); its batch twin is a plain groupBy — see the parity test."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    def fn(key, pdfs, state):
        if state.exists:
            total, cnt = state.get
        else:
            total, cnt = 0.0, 0
        for pdf in pdfs:
            total += float(pdf["value"].fillna(0.0).sum())
            cnt += len(pdf)
        state.update((float(total), int(cnt)))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [cnt], "total_value": [total]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType="user_id long, n_events long, total_value double",
        stateStructType="total double, cnt long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def purchase_click_join_stream(
    purchases: DataFrame, clicks: DataFrame, gap_seconds: int = 600, watermark: str = "1 hour"
) -> DataFrame:
    """Stream-stream interval join: each purchase matched to clicks by
    the same user within the preceding ``gap_seconds`` — the streaming
    twin of operators/asof.range_join_bucketed (batch parity tested).
    Watermarks on BOTH sides bound the join state: Spark can discard
    buffered rows once event time passes watermark + interval, so
    state is O(rate × horizon), not O(stream)."""
    p = _watermarked(purchases, "p_ts", watermark)
    c = _watermarked(clicks, "c_ts", watermark)
    cond = (
        (p["user_id"] == c["c_user_id"])
        & (c["c_ts"] <= p["p_ts"])
        & (c["c_ts"] >= p["p_ts"] - F.make_dt_interval(secs=F.lit(gap_seconds)))
    )
    return p.join(c, cond, "inner").select("p_id", "user_id", "c_id")


def enrich_events_stream(events: DataFrame, dim: DataFrame, on: str = "event_type") -> DataFrame:
    """Stream-static enrichment join: each micro-batch of the stream
    joins the (small) static dimension — STATELESS on the stream side
    (no watermark needed for the join itself; the static side is
    re-broadcast per micro-batch, so dimension updates between batches
    are picked up). The 100 TB shape for attaching reference data to a
    firehose: dim broadcast, stream never shuffled for the join."""
    return events.join(F.broadcast(dim), on)


def _guard_fresh_checkpoint_roots(
    stream_df: DataFrame,
    checkpoint: str,
    roots: tuple[str, ...],
    what: str,
    fresh_checkpoint_ok: bool,
) -> None:
    """Refuse to start an epoch-partitioned sink with a FRESH
    checkpoint over output roots that already hold _epoch partitions
    (ADVICE r13, generalized in r14 to every epoch-overwrite sink):
    epoch ids restart at 0 with a new checkpoint, and the dynamic
    overwrite would silently destroy the previous run's partitions.
    Output roots are paired with one checkpoint location for the
    lifetime of the data; ``fresh_checkpoint_ok=True`` re-adopts
    existing roots deliberately (replay simulations), accepting that
    colliding epoch partitions are rewritten."""
    if fresh_checkpoint_ok:
        return
    spark = stream_df.sparkSession
    jvm_path = spark._jvm.org.apache.hadoop.fs.Path
    hconf = spark._jsc.hadoopConfiguration()
    offsets = jvm_path(checkpoint + "/offsets")
    if offsets.getFileSystem(hconf).exists(offsets):
        return  # a genuine restart — epoch ids continue
    for root in roots:
        p = jvm_path(root)
        rfs = p.getFileSystem(hconf)
        if not rfs.exists(p):
            continue
        for st in rfs.listStatus(p):
            if st.getPath().getName().startswith("_epoch="):
                raise ValueError(
                    f"{what}: checkpoint {checkpoint!r} is fresh but output"
                    f" root {root!r} already holds epoch partitions from a"
                    " previous run — epoch ids would restart at 0 and"
                    " overwrite/delete that data. Reuse the original"
                    " checkpoint, point at fresh roots, or pass"
                    " fresh_checkpoint_ok=True to re-adopt the roots"
                    " deliberately."
                )


def foreach_batch_parquet_sink(
    stream_df: DataFrame,
    path: str,
    checkpoint: str,
    mode: str = "append",
    fresh_checkpoint_ok: bool = False,
):
    """foreachBatch sink: per micro-batch, write the batch DataFrame
    to parquet stamped with the epoch id. Combined with the streaming
    checkpoint this gives effectively-once file output: a replayed
    epoch rewrites the SAME _epoch partition (dynamic partition
    overwrite) instead of duplicating rows — the standard idempotent
    foreachBatch recipe for sinks without native exactly-once. The
    path is paired with the checkpoint for the data's lifetime
    (``_guard_fresh_checkpoint_roots``).

    Returns the started StreamingQuery; callers stop it (tests use
    processAllAvailable)."""
    _guard_fresh_checkpoint_roots(
        stream_df, checkpoint, (path,), "parquet sink", fresh_checkpoint_ok
    )

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        (
            batch_df.withColumn("_epoch", F.lit(epoch_id))
            .write.option("partitionOverwriteMode", "dynamic")
            .mode("overwrite" if mode == "append" else mode)
            .partitionBy("_epoch")
            .parquet(path)
        )

    return (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
        .start()
    )


def foreach_batch_dup_span_sink(
    stream_df: DataFrame,
    index_path: str,
    path: str,
    checkpoint: str,
    max_ppm: int = 500_000,
    text_col: str = "text",
    id_col: str = "doc_id",
    fresh_checkpoint_ok: bool = False,
):
    """Streaming exact-substring dedup gate — the dup-span family's
    ingest deployment: each micro-batch is appended to the maintained
    gram-count index (``dupindex.append_gram_counts``) and scored by
    its incremental duplicated-token budget; rows with
    ``dup_ppm <= max_ppm`` are kept. First-wins semantics across
    batches (the incremental_dedup contract): a doc that arrives
    BEFORE its duplicate passes, the later copy is the one flagged —
    and a doc's within-batch repeats count immediately because the
    batch is appended before it is scored.

    Replay safety comes from the index's own crash contract instead
    of sink bookkeeping: for a FULLY-COMMITTED append, a replayed
    epoch's docs are already in the registry, so the append is a
    no-op and the verdicts recompute identically; the epoch-stamped
    dynamic-partition write then rewrites the same partition (the
    foreach_batch_parquet_sink recipe). If the original append died
    between its registry write and its commit marker, the replay's
    no-op append leaves the batch's grams missing and the replayed
    verdicts UNDER-count — that state is flagged by
    ``dupindex.audit_gram_counts`` and healed append-only by
    ``dupindex.repair_gram_counts``, so run the audit before trusting
    verdicts across a crash-restart. The gram law (length, bucket
    count, hash family — use xxhash64 in production) is fixed at
    index build and read from its meta, never passed per batch.

    Returns the started StreamingQuery; callers stop it."""
    _guard_fresh_checkpoint_roots(
        stream_df, checkpoint, (path,), "dup-span sink", fresh_checkpoint_ok
    )
    from data_pengadaan_agent_spark.operators import dupindex as DI
    from data_pengadaan_agent_spark.operators.textan import tokens

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        # NULL-text rows carry no tokens: they contribute nothing to
        # the gram index yet used to slip the gate with keep=true and
        # n_tokens=NULL (greatest(NULL,1)=1 → dup_ppm=0) — dropped at
        # the gate like streaming_dedup_near does (self-review r12)
        b = (
            batch_df.filter(F.col(text_col).isNotNull())
            .dropDuplicates([id_col])
            .localCheckpoint(eager=True)
        )
        if b.isEmpty():
            return
        DI.append_gram_counts(b, index_path, text_col=text_col, id_col=id_col)
        spans = DI.dup_spans_incremental(
            spark, index_path, b, text_col=text_col, id_col=id_col
        )
        per = spans.groupBy(id_col).agg(
            F.sum("span_len").cast("bigint").alias("dup_tokens")
        )
        stats = (
            b.select(
                F.col(id_col),
                F.col(text_col),
                F.size(tokens(text_col)).cast("bigint").alias("n_tokens"),
            )
            .join(per, id_col, "left")
            .select(
                F.col(id_col),
                F.col(text_col),
                "n_tokens",
                F.coalesce("dup_tokens", F.lit(0)).cast("bigint").alias(
                    "dup_tokens"
                ),
                F.expr(
                    "CAST((1000000 * coalesce(dup_tokens, 0))"
                    " DIV greatest(n_tokens, 1) AS BIGINT)"
                ).alias("dup_ppm"),
            )
            .withColumn("keep", F.col("dup_ppm") <= F.lit(int(max_ppm)))
        )
        (
            stats.withColumn("_epoch", F.lit(epoch_id))
            .write.option("partitionOverwriteMode", "dynamic")
            .mode("overwrite")
            .partitionBy("_epoch")
            .parquet(path)
        )

    return (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
        .start()
    )


def foreach_batch_classify_sink(
    stream_df: DataFrame,
    weights: DataFrame,
    path: str,
    checkpoint: str,
    n: int = 2,
    n_buckets: int = 8192,
    threshold: float = 0.0,
    text_col: str = "text",
    id_col: str = "doc_id",
    arith_hash: bool = False,
    fresh_checkpoint_ok: bool = False,
):
    """The xxhash64 path of the streaming quality gate: score each
    micro-batch with the BATCH ``quality_classifier`` inside
    ``foreachBatch`` and write kept rows to an epoch-stamped parquet
    sink (the ``foreach_batch_parquet_sink`` idempotence recipe —
    a replayed epoch rewrites its own partition).

    ``quality_classifier_stateless`` is the in-stream form (append
    mode, no state) but is pinned to the arith poly-hash because the
    Python kernel must replicate the bucketing; this helper trades
    in-stream composability for the JVM-side xxhash64 hot path —
    inside foreachBatch the batch is a plain DataFrame, so explode +
    groupBy + whole-stage-codegen hashing all apply. Weights are
    resolved ONCE here (a parameter-bounded table) and reused by
    every epoch's broadcast join.

    Returns the started StreamingQuery; callers stop it."""
    _guard_fresh_checkpoint_roots(
        stream_df, checkpoint, (path,), "classify sink", fresh_checkpoint_ok
    )
    from data_pengadaan_agent_spark.operators.textan import (
        quality_classifier,
    )

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        # quality_classifier groupBy's id_col, so two rows in one
        # epoch sharing a doc_id but carrying DIFFERENT text would be
        # scored as one merged feature bag and the merged score fanned
        # back onto both rows by the join (ADVICE r7). Keep the first
        # row per id instead: byte-identical duplicates are unchanged,
        # divergent ones get a single well-defined verdict.
        batch_df = batch_df.dropDuplicates([id_col])
        scored = quality_classifier(
            batch_df,
            weights,
            n=n,
            n_buckets=n_buckets,
            threshold=threshold,
            text_col=text_col,
            id_col=id_col,
            arith_hash=arith_hash,
        ).filter(F.col("keep"))
        out = batch_df.join(scored.select(id_col, "n_feats", "logit"), id_col)
        (
            out.withColumn("_epoch", F.lit(epoch_id))
            .write.option("partitionOverwriteMode", "dynamic")
            .mode("overwrite")
            .partitionBy("_epoch")
            .parquet(path)
        )

    return (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
        .start()
    )


def trending_terms_stream(
    docs: DataFrame,
    ts_col: str = "ingest_ts",
    text_col: str = "text",
    window_len: str = "10 minutes",
    min_count: int = 5,
    watermark: str = "1 hour",
) -> DataFrame:
    """Trending terms over an ingest stream: tumbling-window term
    counts gated by ``min_count`` — the live "what is the corpus
    suddenly full of?" monitor a continuously ingesting curation
    pipeline runs next to its dedup/quality gates (a burst of one
    template's tokens in a window is the first symptom of a crawler
    loop or spam flood).

    Output-mode contract, stated honestly: the registered entry runs
    COMPLETE mode because on a FINITE source its materialization
    equals the batch aggregation exactly (append mode would withhold
    the never-closed final window), which is what makes the entry
    value-checkable — but complete mode retains EVERY window forever
    (watermarks do not evict complete-mode state), so it is only
    correct for finite/bounded runs. The infinite-stream production
    form is this same frame in UPDATE or APPEND mode, where the
    1-hour watermark really does evict closed windows and state is
    O(|terms per window| × |open windows|). On a batch frame the same
    code is a plain windowed groupBy — the parity rule."""
    src = _watermarked(docs, ts_col, watermark)
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"[ \t\n\x0B\f\r]+")
    return (
        src.select(F.window(ts_col, window_len).alias("w"), F.explode(toks).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("w", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .filter(F.col("n") >= min_count)
        .select(F.col("w").getField("start").alias("window_start"), "term", "n")
    )


def streaming_dedup_near(
    docs: DataFrame,
    ts_col: str = "ingest_ts",
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    delay: str = "30 minutes",
    window_len: str = "10 minutes",
    seed: int = 1234567,
) -> DataFrame:
    """Streaming NEAR-duplicate dedup: MinHash-banded LSH keys under
    ``dropDuplicatesWithinWatermark`` — the streaming twin of the
    batch ``minhash_lsh_pairs`` family. A document arriving within
    the watermark horizon of a near-duplicate (any of its ``bands``
    band keys already claimed) is flagged, state is evicted once the
    watermark passes — the bounded-state form of "don't ingest what
    the crawler just fetched twice with small edits".

    Spark-first shape: the per-doc signature+banding is ONE stateless
    Arrow ``mapInPandas`` kernel (vectorized integer math — the
    poly-hash + LCG universal family of ``minhash_signatures_arith``,
    so every band key is bit-replicable in plain SQL for the oracle
    twin). A first cut expressed the 16 minhashes as nested
    higher-order-function column expressions; after Catalyst collapsed
    the shared shingle-array alias into every lambda, evaluation of
    the giant nested-lambda projection became NON-DETERMINISTIC
    (band keys varied across executions of the same plan — nested
    NamedLambdaVariable binding), and it was also the operator's cost
    driver (interpreted lambdas: 45-63 s at 80k docs vs ~seconds for
    the kernel). Each doc emits ``bands`` (band, bucket) rows;
    `dropDuplicatesWithinWatermark` keeps each band bucket's FIRST
    claimant with per-key TTL state, and a downstream windowed count
    per doc recovers the verdict: ``is_original`` = all bands
    survived ⇔ no band was already claimed. A document that claims NO
    band first emits NOTHING — full suppression is the dedup outcome
    for a total near-duplicate; 0 < n_first_bands < bands flags a
    near-dup that still claimed some novelty. Two chained stateful
    operators (dedup → window agg) — supported in Spark 3.5+ append
    mode with one watermark (applied AFTER the kernel: event-time
    tags do not survive mapInPandas). On a batch frame the same
    callable computes the deterministic twin (rank-1 by (event time,
    id) per bucket), which is what a SQL oracle checks; the streaming
    first-claimant is ARRIVAL-order dependent when duplicate keys
    share a micro-batch, so only the batch path is oracle-comparable
    (the streaming path's semantics are pinned by the trigger-ordered
    pytest).

    State: O(bands × docs-per-horizon) 16-byte keys, evicted by the
    watermark."""
    from data_pengadaan_agent_spark.operators.dedup import P31, _lcg_coeffs

    # A non-divisible pair silently ignores the remainder hashes, and
    # bands > n_hashes gives rows_per_band = 0 — every band bucket
    # folds to the same value, all documents collide, and everything
    # after the first is flagged as a near-dup (ADVICE r6).
    if n_hashes < bands or n_hashes % bands != 0:
        raise ValueError(
            f"n_hashes ({n_hashes}) must be a positive multiple of "
            f"bands ({bands})"
        )
    coeffs = _lcg_coeffs(n_hashes, seed)
    rows_per_band = n_hashes // bands
    n_h, n_b, sh_n = int(n_hashes), int(bands), int(shingle_n)
    id_field = docs.schema[id_col].dataType.simpleString()
    ts_field = docs.schema[ts_col].dataType.simpleString()
    out_schema = (
        f"{id_col} {id_field}, {ts_col} {ts_field}, band int, bucket long"
    )

    def kernel(batches):
        import re as _re

        import numpy as np
        import pandas as pd

        a = np.array([c[0] for c in coeffs], dtype=np.int64)[:, None]
        b = np.array([c[1] for c in coeffs], dtype=np.int64)[:, None]
        ws_re = _re.compile(r"[ \t\n\x0B\f\r]+")
        for pdf in batches:
            if len(pdf) == 0:
                continue
            shingle_strs: list[str] = []
            doc_counts: list[int] = []
            for txt in pdf[text_col]:
                # strip SPACES only — parity with F.trim / SQL trim
                # (Python .strip() would also eat tabs/newlines and
                # shift every shingle vs the oracle)
                toks = ws_re.split(str(txt).strip(" ").lower())
                m = max(len(toks) - sh_n, 0)
                sh = {" ".join(toks[i : i + sh_n]) for i in range(m + 1)}
                doc_counts.append(len(sh))
                shingle_strs.extend(sh)
            # poly hash, vectorized: right-align code points in one 2D
            # buffer, hash = sum cp[j] * 131^(L-1-j) mod P31 (equal to
            # the sequential fold; products stay < 2^52, sums < 2^58)
            n_sh = len(shingle_strs)
            lens = np.fromiter(
                (len(s) for s in shingle_strs), dtype=np.int64, count=n_sh
            )
            maxlen = max(1, int(lens.max()) if n_sh else 1)
            buf = np.zeros((n_sh, maxlen), dtype=np.int64)
            for j, s in enumerate(shingle_strs):
                if s:
                    cp = np.frombuffer(
                        s.encode("utf-32-le"), dtype=np.uint32
                    ).astype(np.int64)
                    buf[j, maxlen - cp.size :] = cp
            pows = np.empty(maxlen, dtype=np.int64)
            acc = 1
            for c in range(maxlen - 1, -1, -1):
                pows[c] = acc
                acc = (acc * 131) % P31
            # chunked-modulo sum: each product < 2^51 (codepoint ≤
            # 0x10FFFF × P31), so 2048-column chunks stay < 2^62
            # before their modulo — exact for ANY shingle length,
            # where a single full-row sum could wrap int64 on very
            # long astral-plane shingles
            x = np.zeros(n_sh, dtype=np.int64)
            for c0 in range(0, maxlen, 2048):
                x = (
                    x + (buf[:, c0 : c0 + 2048] * pows[None, c0 : c0 + 2048]).sum(axis=1)
                ) % P31
            # 16 minhashes per doc: (a x + b) mod P, segment-min per doc
            hv = (a * x[None, :] + b) % P31
            offsets = np.zeros(len(doc_counts), dtype=np.int64)
            np.cumsum(doc_counts[:-1], out=offsets[1:])
            mins = np.minimum.reduceat(hv, offsets, axis=1)  # n_h x docs
            # band keys: fold rows_per_band signature values
            buckets = np.zeros((n_b, mins.shape[1]), dtype=np.int64)
            for j in range(n_b):
                accb = np.zeros(mins.shape[1], dtype=np.int64)
                for r in range(rows_per_band):
                    accb = (accb * 1000003 + mins[j * rows_per_band + r]) % P31
                buckets[j] = accb
            n_docs = len(pdf)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values.repeat(n_b),
                    ts_col: pdf[ts_col].values.repeat(n_b),
                    "band": np.tile(
                        np.arange(n_b, dtype=np.int32), n_docs
                    ),
                    "bucket": buckets.T.reshape(-1),
                }
            )

    # NULL text propagates NULL through the SQL twin's tokenizer
    # and yields no rows there — match it by dropping such docs
    # before the kernel (str(None) would otherwise shingle the
    # literal "none" and make unrelated NULL docs near-dups)
    inp = docs.select(id_col, ts_col, text_col).filter(
        F.col(text_col).isNotNull()
    )
    if not docs.isStreaming:
        # the signature kernel is the cost center; a single-split
        # batch input would run it on one core (spread() is a no-op
        # on a real multi-file table, and .rdd inspection is illegal
        # on a stream — micro-batch sources size their own splits)
        from data_pengadaan_agent_spark.sources.catalog import spread

        inp = spread(inp, id_col)
    banded = _watermarked(inp.mapInPandas(kernel, schema=out_schema), ts_col, delay)
    if banded.isStreaming:
        first = banded.dropDuplicatesWithinWatermark(["band", "bucket"])
    else:
        from pyspark.sql import Window as W

        rn = F.row_number().over(
            W.partitionBy("band", "bucket").orderBy(ts_col, id_col)
        )
        first = banded.withColumn("_rn", rn).filter(F.col("_rn") == 1).drop("_rn")
    return (
        first.groupBy(F.window(ts_col, window_len).alias("w"), id_col)
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_first_bands"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col(id_col),
            "n_first_bands",
            (F.col("n_first_bands") == bands).alias("is_original"),
        )
    )


def foreach_batch_ivfpq_sink(
    stream_df,
    index_path: str,
    path: str,
    checkpoint: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
):
    """Streaming ANN-index ingest — the FIFTH streaming form: each
    micro-batch of vectors is appended to a maintained IVF-PQ index
    (``pq.append_ivfpq_table``: frozen sidecar geometry, never a
    retrain or base rescan) and the batch's rows are acknowledged to
    an epoch-stamped parquet log with their coarse assignment. The
    ack is AT-LEAST-ONCE by design: a vec_id the index already holds
    (a replay, or a later-epoch duplicate the first-wins contract
    rejects) still acks — the log answers "what arrived when", the
    ids registry answers "what the index holds". New vectors are
    probe-visible to ``ivfpq_adc_topk`` as soon as their trigger
    commits — the streaming half of the build/append/audit/compact
    lifecycle.

    Replay safety rides the index's own ids-first crash contract, not
    sink bookkeeping: a replayed epoch's vectors are already in the
    ids registry, so the append is a no-op, and the epoch-stamped
    dynamic-partition ack rewrite is idempotent (the
    foreach_batch_parquet_sink recipe). First-wins across triggers: a
    vec_id seen in an earlier epoch is never re-encoded. The one
    crash window is the index's own (ids committed, codes lost) —
    flagged by ``pq.audit_ivfpq_table``, so run the audit before
    trusting probes across a crash-restart. Geometry drift from the
    frozen codebooks is the monitor's job (the coarse sidecar feeds
    ``ivf_drift_report`` directly).

    Returns the started StreamingQuery; callers stop it."""
    from data_pengadaan_agent_spark.operators import pq as PQ

    # Codebooks load ONCE at sink construction, not once per epoch
    # (r15, guide §1.2/§4 heavyweight-init-once): the geometry is
    # FROZEN by the append contract — appends never retrain and
    # compact recommits identical content — so a per-epoch reload
    # bought nothing but 2 collect jobs + 2 sidecar reads per trigger,
    # and under a (contract-violating) concurrent rebuild it would
    # silently MIX geometries across one stream's epochs; loading once
    # pins the stream to one geometry for its lifetime and turns an
    # invalid index into a construction-time error instead of a
    # first-batch one.
    coarse, cb = PQ.load_ivfpq_codebooks(stream_df.sparkSession, index_path)

    def write_batch(batch_df, epoch_id: int) -> None:
        # ONE dedup exchange and ONE Arrow coarse-assign pass per
        # epoch, shared between the index append and the ack log (r14;
        # the r13 shape paid each twice — once inside
        # append_ivfpq_table, once rebuilt for the ack — guide §1.2
        # step 1: don't compute things twice). The materialization
        # barrier doubles as the determinism point the ids-first crash
        # contract needs.
        resid = PQ.ivfpq_residuals(
            batch_df.dropDuplicates([id_col]), coarse, vec_col, id_col
        ).localCheckpoint(eager=True)
        if resid.isEmpty():
            return
        PQ.append_ivfpq_residuals(
            batch_df.sparkSession, resid, cb, index_path, id_col=id_col
        )
        (
            resid.select(F.col(id_col), F.col("list"))
            .withColumn("_epoch", F.lit(epoch_id))
            .write.option("partitionOverwriteMode", "dynamic")
            .mode("overwrite")
            .partitionBy("_epoch")
            .parquet(path)
        )

    return (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
        .start()
    )


def foreach_batch_trgm_sink(
    stream_df,
    index_path: str,
    path: str,
    checkpoint: str,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Streaming substring-search-index ingest — the SIXTH streaming
    form: each micro-batch of documents is appended to a maintained
    trigram index (``trgm.append_trgm_index``: frozen gram law,
    registry-first crash contract, existing partitions never
    rescanned), and the batch's rows are acknowledged to an
    epoch-stamped parquet log with their distinct-gram counts. New
    docs are searchable by ``trgm.substring_search`` /
    ``trgm.trgm_similar`` as soon as their trigger commits — the
    streaming half of the index lifecycle, exactly the
    ``foreach_batch_ivfpq_sink`` shape on the lexical side.

    Replay safety rides the index's own registry-first contract, not
    sink bookkeeping: a replayed epoch's ids are already registered,
    so the append is a no-op; the ack rewrite is idempotent
    (epoch-partitioned dynamic overwrite). First-wins across
    triggers: a doc_id seen in an earlier epoch is never re-grammed.
    The one crash window is the index's own (registry committed,
    postings lost) — flagged by ``trgm.audit_trgm_index``, healed by
    ``trgm.repair_trgm_index``. The ack is AT-LEAST-ONCE: rejected
    later-epoch duplicates still ack (the log answers "what arrived
    when", the registry answers "what the index holds").

    Returns the started StreamingQuery; callers stop it."""
    from data_pengadaan_agent_spark.operators import trgm as TG

    def write_batch(batch_df, epoch_id: int) -> None:
        b = batch_df.dropDuplicates([id_col]).localCheckpoint(eager=True)
        if b.isEmpty():
            return
        TG.append_trgm_index(b, index_path, text_col=text_col, id_col=id_col)
        ack = b.select(
            F.col(id_col),
            F.size(TG.char_grams(text_col)).cast("bigint").alias("n_grams"),
        )
        (
            ack.withColumn("_epoch", F.lit(epoch_id))
            .write.option("partitionOverwriteMode", "dynamic")
            .mode("overwrite")
            .partitionBy("_epoch")
            .parquet(path)
        )

    return (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
        .start()
    )


def foreach_batch_distinct_cube_sink(
    stream_df,
    cube_path: str,
    checkpoint: str,
):
    """Streaming distinct-count ingest — the SEVENTH streaming form,
    and the one with the cleanest replay story in the repo: each
    micro-batch is sketched per group and appended to the HLL cube
    (``sketchcube.append_distinct_cube``), and because HLL union is
    idempotent (union(s, s) = s), a replayed epoch, a crash between
    append and checkpoint commit, or any at-least-once duplication
    converges to BIT-IDENTICAL estimates — exactly-once semantics for
    every ``distinct_rollup`` answer with zero bookkeeping: no
    registry, no ack log, no commit marker. (The cube's n_rows column
    keeps at-least-once arrival counts, documented there.) Rollups
    are readable mid-stream; estimates only ever grow toward the
    union of everything ingested.

    Returns the started StreamingQuery; callers stop it."""
    from data_pengadaan_agent_spark.operators import sketchcube as SC

    def write_batch(batch_df, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        SC.append_distinct_cube(batch_df, cube_path)

    return (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
        .start()
    )


def foreach_batch_hist_cube_sink(
    stream_df,
    cube_path: str,
    checkpoint: str,
):
    """Streaming quantile-cube ingest — the EIGHTH streaming form:
    each micro-batch is bucketed under the cube's frozen bin geometry
    and appended (``histcube.append_hist_cube``). Counts ADD, so
    unlike the HLL cube replay is not algebraically free — instead the
    epoch id IS the batch-registry key: a replayed epoch finds its id
    registered and appends nothing, giving exactly-once bin counts on
    top of Structured Streaming's at-least-once foreachBatch. The one
    crash window (registry committed, cube rows lost) under-counts
    that epoch only and is the documented histcube retry contract.
    Quantile rollups are readable mid-stream.

    Returns the started StreamingQuery; callers stop it."""
    from data_pengadaan_agent_spark.operators import histcube as HC

    def write_batch(batch_df, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        HC.append_hist_cube(batch_df, cube_path, batch_id=f"epoch_{epoch_id}")

    return (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
        .start()
    )


def foreach_batch_bloom_sink(
    stream_df,
    index_path: str,
    ack_path: str,
    checkpoint: str,
    key_col: str = "key",
):
    """Streaming dedup-ingest through the bloom index — the NINTH
    streaming form: each micro-batch runs
    ``bloom.ingest_bloom_batch`` (bloom-negative rows are new with
    zero corpus contact; the maybe sliver takes the exact anti-join;
    words append FIRST, keys LAST) and acknowledges an epoch-stamped
    (batch_id, n_new) row.

    Exactly-once for the INDEX without any epoch registry: a replayed
    batch converges by the module's algebra — its word rows are
    absorbed by bit_or (idempotent), its keys re-anti-join to nothing
    — so the filter and key registry are bit-identical however many
    times an epoch fires. The ack log is the one at-least-once
    surface (epoch-keyed for idempotent reads): a replayed epoch
    re-acks with n_new = 0.

    Returns the started StreamingQuery; callers stop it."""
    from data_pengadaan_agent_spark.operators import bloom as BL

    def write_batch(batch_df, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        from data_pengadaan_agent_spark.sources.catalog import local_df

        n_new = BL.ingest_bloom_batch(spark, index_path, batch_df, key_col)
        local_df(
            spark, [(int(epoch_id), int(n_new))], "batch_id bigint, n_new bigint"
        ).write.mode("append").parquet(ack_path)

    return (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
        .start()
    )


def foreach_batch_cms_sink(
    stream_df,
    cube_path: str,
    checkpoint: str,
):
    """Streaming frequency-sketch ingest — the TENTH streaming form,
    completing the sketch-cube trio's streaming side (HLL cube =
    algebraic exactly-once, hist cube = epoch-registry exactly-once;
    the CMS cube is count-bearing like the hist cube, so the epoch id
    IS the batch-registry key): each micro-batch is sketched under
    the cube's frozen (d, w, seed) law and appended
    (``cmscube.append_cms_cube``); a replayed epoch finds its id
    registered and appends nothing — exactly-once counters on
    at-least-once foreachBatch. Point estimates (``cms_estimate``)
    are readable mid-stream and only ever grow toward the union's.

    Returns the started StreamingQuery; callers stop it."""
    from data_pengadaan_agent_spark.operators import cmscube as CM

    def write_batch(batch_df, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        CM.append_cms_cube(batch_df, cube_path, batch_id=f"epoch_{epoch_id}")

    return (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
        .start()
    )


def foreach_batch_dq_gate_sink(
    stream_df,
    rules_factory,
    clean_path: str,
    quarantine_path: str,
    report_path: str,
    checkpoint: str,
    fresh_checkpoint_ok: bool = False,
):
    """Streaming quality-gated ingest — the ELEVENTH streaming form:
    each micro-batch runs the declarative constraint suite
    (``dq.dq_check``; ``rules_factory(batch_df)`` builds the rules so
    referential dims can bind per batch) and routes the WHOLE batch:
    zero violations → append to clean/, any violation → append to
    quarantine/ (all-or-nothing per batch: a constraint violation is
    evidence the batch's SOURCE is wrong, and half-ingesting a bad
    batch destroys the audit trail). The per-rule report appends
    epoch-stamped either way — the gate's decision is replayable
    evidence, not a log line.

    Exactly-once is the epoch-partitioned dynamic-overwrite recipe
    (foreach_batch_parquet_sink): a replayed epoch re-evaluates the
    same deterministic suite on the same rows and REWRITES its own
    _epoch partition in clean/ (or quarantine/) and report/ instead
    of appending a byte-identical second copy — replayed rows would
    otherwise be indistinguishable from legitimate source duplicates
    (self-review r12).

    LIFETIME CONTRACT (ADVICE r13): the three output roots are keyed
    on THIS checkpoint's epoch ids for the lifetime of the data. A
    fresh checkpoint restarts epochs at 0, so pointing one at roots
    that already hold data would dynamically overwrite the previous
    run's _epoch=0 partition in the target root and DELETE it from
    the sibling — silent cross-run data loss. That combination now
    fails loudly at start; pass ``fresh_checkpoint_ok=True`` only to
    deliberately re-adopt existing roots (e.g. simulating a replay in
    tests), accepting that colliding epoch partitions are rewritten.

    Returns the started StreamingQuery; callers stop it."""
    from pyspark.sql import functions as FF

    from data_pengadaan_agent_spark.operators import dq as DQ

    _guard_fresh_checkpoint_roots(
        stream_df,
        checkpoint,
        (clean_path, quarantine_path, report_path),
        "dq gate",
        fresh_checkpoint_ok,
    )

    def write_batch(batch_df, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        b = batch_df.localCheckpoint(eager=True)
        # _replay is a STRING partition value shared with
        # replay_quarantine's re-verdict rows (ADVICE r12): one
        # unified report layout, and the two writers' dynamic
        # overwrites touch DISJOINT partitions — a stream replay of
        # epoch N rewrites only (_epoch=N, _replay=false) and can
        # never wipe the replay's re-verdicts. String, not boolean:
        # partition-type inference reads booleans back as strings,
        # so writing strings keeps the read schema deterministic.
        report = (
            DQ.dq_check(b, rules_factory(b))
            .withColumn("_epoch", FF.lit(int(epoch_id)))
            .withColumn("_replay", FF.lit("false"))
        )
        report = report.localCheckpoint(eager=True)
        n_bad = report.filter(FF.col("violations") > 0).count()
        (
            report.coalesce(1)
            .write.option("partitionOverwriteMode", "dynamic")
            .mode("overwrite")
            .partitionBy("_epoch", "_replay")
            .parquet(report_path)
        )
        target, sibling = (
            (quarantine_path, clean_path)
            if n_bad
            else (clean_path, quarantine_path)
        )
        (
            b.withColumn("_epoch", FF.lit(int(epoch_id)))
            .write.option("partitionOverwriteMode", "dynamic")
            .mode("overwrite")
            .partitionBy("_epoch")
            .parquet(target)
        )
        # A replayed epoch whose verdict FLIPPED (rules_factory binds
        # per-batch referential dims, which may legitimately change
        # between the original run and a crash-replay) rewrites its
        # partition in the NEW target but would leave the stale copy
        # in the other root — the epoch's rows then exist in BOTH
        # clean/ and quarantine/. Remove the sibling's partition after
        # the target write so any replay converges to exactly one copy
        # (write-then-delete: a crash between the two re-fires the
        # epoch, which redoes both steps).
        jvm_path = b.sparkSession._jvm.org.apache.hadoop.fs.Path
        sib = jvm_path(f"{sibling}/_epoch={int(epoch_id)}")
        fs = sib.getFileSystem(b.sparkSession._jsc.hadoopConfiguration())
        if fs.exists(sib):
            fs.delete(sib, True)

    return (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
        .start()
    )


def foreach_batch_kmv_sink(
    stream_df,
    cube_path: str,
    checkpoint: str,
):
    """Streaming bottom-k distinct ingest — the TWELFTH streaming
    form, and the second with the pure-algebra replay contract: each
    micro-batch's own k-cut sample rows append to the KMV cube
    (``kmv.append_kmv_cube``); the sketch is a SET (readers
    distinct-then-cut), so a replayed epoch re-appends rows a
    DISTINCT absorbs — exactly-once estimates with zero bookkeeping,
    like the HLL sink, but with a DuckDB-verifiable state. Estimates
    are readable mid-stream and only move toward the union's.

    Returns the started StreamingQuery; callers stop it."""
    from data_pengadaan_agent_spark.operators import kmv as KV

    def write_batch(batch_df, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        KV.append_kmv_cube(batch_df, cube_path)

    return (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
        .start()
    )

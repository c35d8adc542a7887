"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry is an operator from SURVEY.md §2 (or the
beyond-reference training-data surface) implemented Spark-first in
``data_pengadaan_agent_spark``; ``oracle_sql()`` carries its DuckDB
twin. Column names and output types are aligned on both sides
(aggregates aliased identically; money sums go through DECIMAL on both
engines so parallel summation is bit-deterministic; float cosines are
rounded at the output edge).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pengadaan_agent_spark.operators import aggregates as A
from data_pengadaan_agent_spark.operators import dedup as D
from data_pengadaan_agent_spark.operators import relational as R
from data_pengadaan_agent_spark.operators import similarity as S
from data_pengadaan_agent_spark.operators import textan as X
from data_pengadaan_agent_spark.operators.filters import filter_keywords
from data_pengadaan_agent_spark.sources.catalog import load_table, spread
from data_pengadaan_agent_spark.streaming import windows as SW

SF0001 = "/root/testdata/sf0.001"

# Tokenizer shared by the text/dedup oracles. The whitespace class is
# spelled EXPLICITLY on both engines because Java's \s (Spark) is
# exactly [ \t\n\x0B\f\r] while RE2's \s (DuckDB) excludes \x0B —
# organic text containing a vertical tab would silently diverge
# (VERDICT r7 ask #5). The text_filtered_keywords twin's '\s+' is the
# one deliberate exception: it splits AFTER a replace that maps \x0B
# to ' ' on both engines, so only spaces remain and the engines agree
# by construction.
_DUCK_TOKS = "string_split_regex(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+')"


def _flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: keyword-CNF filter → monthly rollup (the reference's
    'monthly trend' scenario, P3+P5+A2+T2 in one plan)."""
    orders = load_table(spark, sf_dir, "orders")
    hit = filter_keywords(orders, "o_orderpriority", include=[["urgent", "high"]])
    return (
        hit.filter(F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        .groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("bulan"))
        .agg(
            F.count("o_orderkey").alias("jumlah_paket"),
            A.decimal_sum("o_totalprice").cast("double").alias("total_pagu"),
        )
        .orderBy("bulan")
    )


def entry(spark: SparkSession) -> DataFrame:
    """Smoke check: flagship query at sf0.001; driver checks rows>0."""
    return _flagship(spark, SF0001)


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


def _q_keyword_cnf(spark, sf):
    docs = load_table(spark, sf, "documents")
    return filter_keywords(
        docs, "text", include=[["spark", "hash"], ["join"]], exclude=["window"]
    ).select("doc_id", "text", "lang", "source", "n_chars")


def _q_date_attribute_filter(spark, sf):
    ev = load_table(spark, sf, "events")
    return (
        ev.filter(
            (F.col("event_type") == "purchase")
            & F.col("ts").between(
                F.lit("2024-01-10 00:00:00").cast("timestamp"),
                F.lit("2024-01-20 00:00:00").cast("timestamp"),
            )
        )
        .select("event_id", "user_id", "value")
    )


def _q_groupby_count(spark, sf):
    return A.groupby_count(load_table(spark, sf, "orders"), "o_orderstatus", alias="n")


def _q_monthly_rollup(spark, sf):
    orders = load_table(spark, sf, "orders")
    return (
        orders.groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("bulan"))
        .agg(
            F.count("o_orderkey").alias("jumlah_paket"),
            A.decimal_sum("o_totalprice").cast("double").alias("total_pagu"),
        )
        .orderBy("bulan")
    )


def _q_value_counts(spark, sf):
    return A.value_counts(load_table(spark, sf, "events"), "event_type", alias="cnt")


def _q_scalar_insights(spark, sf):
    li = load_table(spark, sf, "lineitem")
    c = F.col("l_extendedprice")
    return li.agg(
        F.count(F.lit(1)).alias("n"),
        F.min(c).alias("min_v"),
        F.max(c).alias("max_v"),
        (A.decimal_sum(c).cast("double") / F.count(F.lit(1))).alias("mean_v"),
        A.decimal_sum(c).cast("double").alias("sum_v"),
    )


def _q_arg_extreme(spark, sf):
    monthly = _q_monthly_rollup(spark, sf)
    return monthly.agg(
        F.expr("max_by(bulan, total_pagu)").alias("peak_month"),
        F.expr("min_by(bulan, total_pagu)").alias("trough_month"),
        F.max("total_pagu").alias("peak_value"),
        F.min("total_pagu").alias("trough_value"),
    )


def _q_histogram_numeric(spark, sf):
    return A.histogram_numeric(load_table(spark, sf, "lineitem"), "l_extendedprice", bins=12)


def _q_histogram_month_of_year(spark, sf):
    return A.histogram_month_of_year(load_table(spark, sf, "orders"), "o_orderdate")


def _q_distinct_count(spark, sf):
    return A.distinct_count(load_table(spark, sf, "events"), "event_type", "user_id")


def _q_top_k(spark, sf):
    part = load_table(spark, sf, "part")
    return part.orderBy(F.desc("p_retailprice"), F.asc("p_partkey")).limit(10).select(
        "p_partkey", "p_name", "p_retailprice"
    )


def _q_limit_preview(spark, sf):
    orders = load_table(spark, sf, "orders")
    return orders.orderBy("o_orderkey").limit(5)


def _q_join_broadcast_dim(spark, sf):
    nation = load_table(spark, sf, "nation")
    region = load_table(spark, sf, "region")
    return (
        nation.join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
        .groupBy("r_name")
        .agg(F.count(F.lit(1)).alias("n_nations"))
        .orderBy("r_name")
    )


def _q_star_join_revenue(spark, sf):
    return R.revenue_by_nation(
        load_table(spark, sf, "customer"),
        load_table(spark, sf, "orders"),
        load_table(spark, sf, "lineitem"),
        load_table(spark, sf, "nation"),
        load_table(spark, sf, "region"),
    )


def _q_semi_join(spark, sf):
    return R.customers_with_orders(load_table(spark, sf, "customer"), load_table(spark, sf, "orders"))


def _q_anti_join(spark, sf):
    # VERDICT r7 ask #4: the unfiltered form was vacuous (every
    # customer has orders at every SF, so both engines returned 0
    # rows). Restricting the right side to urgent orders makes the
    # anti-join semantically load-bearing — "customers with no
    # 1-URGENT order" is non-empty at sf0.001/0.01/0.1 (18/203/1986
    # rows) — while keeping the pushed-filter + left_anti plan shape.
    orders = load_table(spark, sf, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return R.customers_without_orders(load_table(spark, sf, "customer"), orders)


def _q_pricing_summary(spark, sf):
    return R.pricing_summary(load_table(spark, sf, "lineitem"))


def _q_window_topk_per_group(spark, sf):
    return R.top_order_per_customer(load_table(spark, sf, "orders"), k=3)


def _q_window_mom_delta(spark, sf):
    return R.month_over_month(load_table(spark, sf, "orders"))


def _q_rollup_grouping_sets(spark, sf):
    return R.status_priority_rollup(load_table(spark, sf, "orders"))


def _q_set_ops(spark, sf):
    return R.segment_union_intersect(load_table(spark, sf, "customer"))


def _q_dedup_exact(spark, sf):
    docs = load_table(spark, sf, "documents")
    return D.dedup_exact(docs).select("doc_id", "lang", "source", "n_chars")


def _q_duplicate_groups(spark, sf):
    return D.duplicate_groups(load_table(spark, sf, "documents"))


def _q_dedup_clusters(spark, sf):
    """Near-dup clustering: jaccard candidate pairs → connected
    components → (doc, cluster representative)."""
    docs = load_table(spark, sf, "documents").filter(F.col("doc_id") < 200)
    pairs = D.ngram_jaccard_pairs(docs, n=3, threshold=0.12).select("id_a", "id_b")
    return D.dedup_clusters(docs, pairs).orderBy("doc_id")


def _q_corpus_curation(spark, sf):
    """The training-data curation composite: quality gate ∧ language
    gate ∧ exact dedup → per-source corpus stats. Each gate is a
    left-semi join of doc_ids (no payload shuffles); the gates and the
    dedup all run off one documents scan."""
    docs = load_table(spark, sf, "documents")
    good = X.quality_score(docs).filter(F.col("quality_score") >= 0.55).select("doc_id")
    eng = X.language_id(docs).filter(F.col("lang_pred") == "en").select("doc_id")
    kept = (
        D.dedup_exact(docs)
        .join(good, "doc_id", "left_semi")
        .join(eng, "doc_id", "left_semi")
    )
    return (
        kept.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("total_chars"))
        .orderBy("source")
    )


_TEXT_CORPUS_READY: set[str] = set()


def _ensure_text_corpus(sf_dir: str) -> str:
    """Materialize ``documents.parquet`` as the one-doc-per-line text
    shard directory (one ``<source>.txt`` per source, lines ordered by
    doc_id, newlines stripped) that ``read_text_corpus`` ingests.
    Fixture plumbing, not part of the measured pipeline: a real corpus
    ALREADY lives as text shards; this exists only because the test
    fixtures are parquet. Idempotent and deterministic (content and
    order derive solely from the table).

    Cache discipline (ADVICE r4): the cache directory is keyed on a
    CONTENT FINGERPRINT of documents.parquet (size + mtime), not just
    the sf_dir basename — a regenerated fixture or a different root
    sharing a basename gets a fresh directory instead of silently
    reusing stale shards. Shards are written to a temp directory
    renamed into place, so a concurrent bench/oracle process either
    sees the complete directory or builds its own temp and loses the
    atomic-rename race harmlessly."""
    import os

    import duckdb

    src = os.path.join(sf_dir.rstrip("/"), "documents.parquet")
    st = os.stat(src)
    tag = os.path.basename(sf_dir.rstrip("/")) or "sf"
    fp = f"{tag}_{st.st_size}_{st.st_mtime_ns}"
    path = f"/tmp/spark_graft_text_corpus/{fp}"
    marker = os.path.join(path, "_SUCCESS")
    if path in _TEXT_CORPUS_READY or os.path.exists(marker):
        _TEXT_CORPUS_READY.add(path)
        return path
    tmp = f"{path}.tmp.{os.getpid()}"
    os.makedirs(tmp, exist_ok=True)
    rows = duckdb.connect().execute(
        "SELECT source, string_agg(regexp_replace(text, '[\\r\\n]+', ' ', 'g'),"
        " chr(10) ORDER BY doc_id) "
        f"FROM read_parquet('{src}') "
        "WHERE length(trim(text)) > 0 GROUP BY source"
    ).fetchall()
    for source, body in rows:
        with open(os.path.join(tmp, f"{source}.txt"), "w") as f:
            f.write(body + "\n")
    with open(os.path.join(tmp, "_SUCCESS"), "w") as f:
        f.write("ok\n")
    try:
        os.rename(tmp, path)
    except OSError:
        # lost the race to a concurrent builder — its directory is
        # complete (rename is atomic, marker written before rename)
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
    _TEXT_CORPUS_READY.add(path)
    return path


_PIPE_WEIGHTS = {"src0": 0.4, "src1": 0.3, "src2": 0.2, "src3": 0.1}
_PIPE_QUALITY_MIN = 0.6
_PIPE_SHARDS = 4


def _q_corpus_pipeline(spark, sf):
    """END-TO-END curation pipeline (VERDICT r3 ask #3): raw text
    shards → read_text_corpus → dedup_exact_content → normalize_text →
    canonical dedup → quality_score gate → fingerprint mix key →
    corpus_mix → shuffle_shard → per-shard stats. Every stage is the
    REGISTERED operator, composed — this is the shape a 100 TB curation
    user runs daily, proving the stages compose, not just pass solo.

    The mix/shard key is the arithmetic 62-bit fingerprint of the
    normalized text folded to 31 bits (so split_hash products stay in
    BIGINT): content-derived, so the selection is stable under any
    partitioning AND replicable by the SQL oracle (xxhash64 doc ids are
    JVM-only). Joins along the spine are 1:1 on the deduped doc_id.

    Scale: the corpus is scanned once; dedup is the unavoidable
    group-by-content exchange; quality/fingerprint are projections;
    mix thresholds are a tiny broadcast; shard pos sorts per-shard,
    never globally. Output is ``_PIPE_SHARDS`` rows."""
    from data_pengadaan_agent_spark.operators import sampling as SA
    from data_pengadaan_agent_spark.sources.readers import read_text_corpus

    corpus = read_text_corpus(spark, _ensure_text_corpus(sf)).withColumn(
        # file provenance → logical source (one <source>.txt per source)
        "source",
        F.regexp_replace("source", r"\.txt$", ""),
    )
    uniq = D.dedup_exact_content(corpus)  # doc_id, text, source, n_copies
    # Every stage from here carries its columns forward (the operators'
    # carry= passthrough) instead of joining features back by id: each
    # such join would RE-EXECUTE the whole upstream lineage per
    # reference — the first cut of this composite scanned the corpus
    # 28 times / 75 exchanges; this linear form scans it once per
    # consumer of `keyed` and the checkpoint below makes that once.
    norm = X.normalize_text(uniq, text_col="text", id_col="doc_id", carry=("source",))
    canon = norm.groupBy("text_norm").agg(
        F.min("doc_id").alias("doc_id"),
        F.min("source").alias("source"),
        F.min("n_chars_norm").alias("n_chars_norm"),
    )
    # Materialize the deduped corpus BEFORE the quality gate (DISK_ONLY
    # — corpus-proportional text, the no-memory-pins house rule).
    # Without the barrier Catalyst pushes the gate's score expression
    # below the aggregate AND inlines normalize's regex chain into
    # every one of its ~7 sub-term references; the scorer's stopword
    # lambda is CodegenFallback, so the whole collapsed predicate
    # evaluates interpreted with NO common-subexpression elimination —
    # the normalize regexes re-ran ~7× per row. Measured at docs ×64:
    # 40 s end-to-end without the barrier, 23 s with it (×16: 11.5 s
    # → 7.2 s).
    from pyspark import StorageLevel

    canon = canon.localCheckpoint(
        eager=True, storageLevel=StorageLevel.DISK_ONLY
    )
    kept = X.quality_score(
        canon,
        text_col="text_norm",
        id_col="doc_id",
        carry=("text_norm", "source", "n_chars_norm"),
    ).filter(F.col("quality_score") >= _PIPE_QUALITY_MIN)
    keyed = X.fingerprint_arith(
        kept,
        text_col="text_norm",
        id_col="doc_id",
        carry=("source", "n_chars_norm"),
    ).withColumn("mix_key", F.pmod(F.col("fingerprint"), F.lit(1 << 31)))
    # corpus_mix reads keyed twice (per-group counts + the selection
    # filter) and shuffle_shard once more — materialize it ONCE. The
    # frame is the deduped+gated corpus keys, not raw text blocks.
    keyed = keyed.select("doc_id", "source", "n_chars_norm", "mix_key").localCheckpoint()
    mixed = SA.corpus_mix(keyed, _PIPE_WEIGHTS, group_col="source", id_col="mix_key")
    sharded = SA.shuffle_shard(mixed, id_col="mix_key", n_shards=_PIPE_SHARDS)
    return (
        sharded.groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars_norm").cast("bigint").alias("total_chars"),
            F.count_distinct("source").cast("bigint").alias("n_sources"),
            F.sum("pos").cast("bigint").alias("pos_sum"),
        )
        .orderBy("shard")
    )


def _q_corpus_ingest_stream(spark, sf):
    """STREAMING ingestion front-end of the curation pipeline, driven
    to completion over the finite shard directory: readStream.text →
    content-addressed projection → stateful streaming dedup
    (dropDuplicates on the content hash) → quality gate — all inside
    the stream; the memory sink materializes the result for the
    driver. The oracle twin models the same semantics relationally
    (DISTINCT text + the quality formula), so this is the engine's
    first VALUE-checked streaming entry, not rows-only.

    State note: content dedup keys the state store by doc_id, sharded
    by the grouping key across executors; a production deployment
    bounds it with an ingest-time watermark + TTL (the events-based
    streaming_dedup shows the watermarked form)."""
    from data_pengadaan_agent_spark.sources.readers import read_text_corpus_stream

    corpus = read_text_corpus_stream(spark, _ensure_text_corpus(sf))
    deduped = corpus.dropDuplicates(["doc_id"])
    scored = X.quality_score(deduped, carry=("text",))
    gated = scored.filter(F.col("quality_score") >= _PIPE_QUALITY_MIN).select(
        "text", "n_chars", "quality_score"
    )
    return SW.run_stream_to_memory(spark, gated, "corpus_ingest_stream")


def _q_corpus_ingest_stream_ttl(spark, sf):
    """State-BOUNDED twin of ``corpus_ingest_stream`` (VERDICT r4 #3):
    the same readStream.text → content dedup → quality gate front-end,
    but deduping with ``dropDuplicatesWithinWatermark`` over a
    synthetic ingest-time column so the state store holds each content
    hash only for the watermark horizon instead of forever — the form
    that survives an infinite 100 TB ingest stream.

    The ingest time is derived from the content hash (base epoch +
    pmod(doc_id, 3600) seconds): deterministic under any file order or
    batching, and byte-identical duplicates get IDENTICAL timestamps,
    so they always fall inside one watermark window and the output is
    exactly DISTINCT-by-content — the oracle twin is therefore the
    same relational model as the unbounded variant. The 2-hour delay
    exceeds the 1-hour timestamp spread, so no row can be dropped as
    late even if the directory splits across micro-batches. State
    eviction across triggers is exercised separately by
    ``tests/test_streaming.py::test_dedup_within_watermark_evicts_state``."""
    from data_pengadaan_agent_spark.sources.readers import read_text_corpus_stream

    corpus = read_text_corpus_stream(spark, _ensure_text_corpus(sf)).withColumn(
        "ingest_ts",
        F.timestamp_seconds(F.lit(1704067200) + F.pmod(F.col("doc_id"), F.lit(3600))),
    )
    deduped = SW.streaming_dedup_within_watermark(
        corpus, ["doc_id"], "ingest_ts", delay="2 hours"
    )
    scored = X.quality_score(deduped, carry=("text",))
    gated = scored.filter(F.col("quality_score") >= _PIPE_QUALITY_MIN).select(
        "text", "n_chars", "quality_score"
    )
    return SW.run_stream_to_memory(spark, gated, "corpus_ingest_stream_ttl")


def _q_corpus_ingest_stream_scored(spark, sf):
    """SUPERVISED streaming ingest gate — the third streaming-ingest
    form: readStream.text → state-BOUNDED content dedup
    (dropDuplicatesWithinWatermark, the TTL discipline) → per-row
    quality_classifier_stateless gate with weights trained OFFLINE on
    the batch documents table (model trained offline, applied to the
    stream — the production deployment shape). The stateless kernel
    is bit-identical to the batch classifier (pinned by pytest), so
    the oracle twin models the whole stream relationally: DISTINCT
    collapsed text scored by the same poly-hash Naive-Bayes SQL.
    ROUND-8 registration candidate."""
    docs = load_table(spark, sf, "documents")
    w = X.train_quality_weights(
        docs.filter(F.col("doc_id") % 10 == 0),
        docs.filter(F.col("doc_id") % 10 == 1),
        n=2,
        n_buckets=4096,
        arith_hash=True,
    )
    from data_pengadaan_agent_spark.sources.readers import read_text_corpus_stream

    corpus = read_text_corpus_stream(spark, _ensure_text_corpus(sf)).withColumn(
        "ingest_ts",
        F.timestamp_seconds(F.lit(1704067200) + F.pmod(F.col("doc_id"), F.lit(3600))),
    )
    deduped = SW.streaming_dedup_within_watermark(
        corpus, ["doc_id"], "ingest_ts", delay="2 hours"
    )
    gated = (
        X.quality_classifier_stateless(
            deduped,
            w,
            n=2,
            n_buckets=4096,
            threshold=0.0,
            carry=("text",),
        )
        .filter(F.col("keep"))
        .select("text", "n_feats", "logit")
    )
    return SW.run_stream_to_memory(spark, gated, "corpus_ingest_stream_scored")


def _corpus_ingest_scored_sql() -> str:
    """DuckDB twin of _q_corpus_ingest_stream_scored: weights trained
    on the documents table (the _quality_classifier_sql CTEs), applied
    to the DISTINCT newline-collapsed corpus (the corpus_ingest_stream
    relational model) — content dedup means identical text scores
    once; byte-identical duplicates share one watermark window, so the
    stream emits exactly DISTINCT-by-content too."""
    poly = _DUCK_POLY.format(s="g", mult=131)
    return f"""
        WITH bg AS (
          SELECT doc_id,
                 unnest(list_transform(range(1, len(ws)),
                        i -> array_to_string(ws[i:i+1], ' '))) AS g
          FROM (SELECT doc_id,
                       string_split_regex(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+') AS ws
                FROM documents)
          WHERE len(ws) >= 2
        ), db AS (
          SELECT doc_id, ({poly}) % 4096 AS b FROM bg
        ), cp AS (
          SELECT b, count(*) AS c FROM db WHERE doc_id % 10 = 0 GROUP BY 1
        ), cn AS (
          SELECT b, count(*) AS c FROM db WHERE doc_id % 10 = 1 GROUP BY 1
        ), m AS (
          SELECT coalesce(cp.b, cn.b) AS b,
                 coalesce(cp.c, 0) AS cp, coalesce(cn.c, 0) AS cn
          FROM cp FULL OUTER JOIN cn ON cp.b = cn.b
        ), tot AS (
          SELECT sum(cp) AS tp, sum(cn) AS tn FROM m
        ), wt AS (
          SELECT b,
                 CAST(round(ln((cp + 1.0) / (tp + 4096.0))
                            - ln((cn + 1.0) / (tn + 4096.0)), 9)
                      AS DECIMAL(28,9)) AS w
          FROM m, tot
        ), corpus AS (
          SELECT DISTINCT regexp_replace(text, '[\\r\\n]+', ' ', 'g') AS text
          FROM documents WHERE length(trim(text)) > 0
        ), sbg AS (
          SELECT text,
                 unnest(list_transform(range(1, len(ws)),
                        i -> array_to_string(ws[i:i+1], ' '))) AS g
          FROM (SELECT text,
                       string_split_regex(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+') AS ws
                FROM corpus)
          WHERE len(ws) >= 2
        ), sdb AS (
          SELECT text, ({poly}) % 4096 AS b FROM sbg
        ), sc AS (
          SELECT text, count(*) AS nf,
                 sum(coalesce(wt.w, CAST(0 AS DECIMAL(28,9)))) AS s
          FROM sdb LEFT JOIN wt USING (b) GROUP BY 1
        )
        SELECT text, CAST(nf AS BIGINT) AS n_feats,
               round(CAST(s AS DOUBLE) / nf, 6) AS logit
        FROM sc WHERE CAST(s AS DOUBLE) / nf >= 0.0
    """


def _q_activity_heatmap(spark, sf):
    """Day-of-week × hour-of-day usage heatmap cells (C4-family chart
    data; operators/relational.activity_heatmap)."""
    return R.activity_heatmap(load_table(spark, sf, "events"))


def _q_detect_pii(spark, sf):
    """PII span audit (operators/privacy.detect_pii) over support
    tickets synthesized deterministically from customer rows (the
    fixtures carry no natural PII; the same arithmetic is emitted into
    the oracle — the derived-partsupp precedent). Every expression is
    a codegen'd regexp_count: one scan, zero shuffles."""
    from data_pengadaan_agent_spark.operators.privacy import detect_pii

    cust = load_table(spark, sf, "customer")
    k = F.col("c_custkey")
    msg = F.concat(
        F.lit("Contact "),
        F.col("c_name"),
        F.lit(" at user"),
        k.cast("string"),
        F.lit("@example.com or +1-555-"),
        F.lpad(F.pmod(k, F.lit(10000)).cast("string"), 4, "0"),
        F.when(
            F.pmod(k, F.lit(3)) == 0,
            F.concat(
                F.lit(" host 10.0."),
                F.pmod(k, F.lit(256)).cast("string"),
                F.lit("."),
                F.pmod(k, F.lit(200)).cast("string"),
            ),
        ).otherwise(F.lit("")),
    )
    tickets = cust.select(k.alias("doc_id"), msg.alias("text"))
    return detect_pii(tickets)


_RRF_TERMS = ("spark", "window", "join")


def _q_hybrid_retrieval(spark, sf):
    """Hybrid lexical+vector retrieval fused by RRF
    (operators/similarity.hybrid_retrieval_rrf): keyword match-count
    list ⊕ cosine top-k list (query = vec 0's embedding, the
    query-by-example shape), score = Σ 1/(60+rank)."""
    from data_pengadaan_agent_spark.operators.similarity import hybrid_retrieval_rrf

    docs = load_table(spark, sf, "documents")
    emb = load_table(spark, sf, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    return hybrid_retrieval_rrf(docs, emb, _RRF_TERMS, qvec, k=10, k_each=50)


def _q_incremental_dedup(spark, sf):
    """Daily-ingest dedup (operators/dedup.dedup_incremental): the new
    batch (doc_id % 10 == 0) anti-joined by content hash against the
    already-ingested corpus, then collapsed within-batch."""
    docs = load_table(spark, sf, "documents")
    new = docs.filter(F.col("doc_id") % 10 == 0)
    seen = docs.filter(F.col("doc_id") % 10 != 0)
    return D.dedup_incremental(new, seen)


def _q_stratified_sample(spark, sf):
    """Exact-quota stratified sample (operators/sampling
    .stratified_sample): every lang contributes ceil(0.2·n_lang)
    documents, selected by the deterministic Knuth-hash rank."""
    from data_pengadaan_agent_spark.operators.sampling import stratified_sample

    docs = load_table(spark, sf, "documents").select("doc_id", "lang", "source")
    return stratified_sample(docs, group_col="lang", frac=0.2)


def _q_ngram_jaccard(spark, sf):
    docs = load_table(spark, sf, "documents").filter(F.col("doc_id") < 200)
    # jaccard = n_inter/(n_a+n_b-n_inter): one double division of exact
    # ints → bit-identical on both engines, no rounding needed.
    return D.ngram_jaccard_pairs(docs, n=3, threshold=0.12)


def _q_minhash_lsh_pairs(spark, sf):
    """Arithmetic universal-hash minhash (oracle recomputes signatures
    exactly); the xxhash64 variant D.minhash_lsh_pairs is the JVM-only
    production twin with the identical plan shape."""
    docs = load_table(spark, sf, "documents").filter(F.col("doc_id") < 200)
    return D.minhash_lsh_pairs_arith(docs, n_hashes=32, bands=16)


def _q_simhash_pairs(spark, sf):
    """Arithmetic-channel simhash (oracle recomputes the signatures);
    D.simhash_pairs is the xxhash64 production twin, same plan."""
    docs = load_table(spark, sf, "documents").filter(F.col("doc_id") < 200)
    return D.simhash_pairs_arith(docs, max_hamming=16)


def _q_embedding_cosine_pairs(spark, sf):
    """Embedding near-dup, SCALE PATH: banded-LSH candidates → exact
    cosine verify over the FULL corpus (no id cap). The oracle
    re-derives the same band signatures from the same hyperplane
    codebook, so the approximate candidate set itself is
    equality-checked."""
    emb = load_table(spark, sf, "embeddings")
    return S.cosine_pairs_lsh(
        emb, "embedding", dim=64, threshold=0.35, bands=8, planes_per_band=8, seed=42
    ).withColumn("similarity", F.round("similarity", 4))


def _q_embedding_cosine_allpairs(spark, sf):
    """Exact all-pairs VERIFICATION BASELINE — O(N²) by construction,
    so the scope is LOUDLY capped to vec_id < 300 (the first 300
    vectors). The uncapped production path is `embedding_cosine_pairs`
    (LSH-bucketed) above."""
    emb = load_table(spark, sf, "embeddings")
    return S.cosine_pairs(emb, "embedding", threshold=0.35, max_id=300).withColumn(
        "similarity", F.round("similarity", 4)
    )


def _warehouse_path(spark, sf, name):
    import os

    tag = sf.rstrip("/").rsplit("/", 1)[-1]
    return os.path.join(os.path.dirname(os.path.abspath(__file__)), "spark-warehouse", f"{name}_{tag}")


def _table_stale(spark, path, expected_rows, expect_types=()):
    """True when a precomputed table at ``path`` is absent, its row
    count drifted from the source fixture, or a column's dtype is not
    the expected one (ingest-once semantics: the build is skipped on
    every later call of the same round)."""
    try:
        df = spark.read.parquet(path)
        dtypes = dict(df.dtypes)
        for col, typ in expect_types:
            if dtypes.get(col) != typ:
                return True
        return df.count() != expected_rows
    except Exception:
        return True


def _q_sim_topk_lsh_precomputed(spark, sf):
    """The ingest-time ANN path: signatures PRECOMPUTED into a table
    partitioned by signature (ingest runs once; later calls detect
    freshness and skip it), probe = partition-pruned read of ONE
    bucket + exact rescore. Same (n_planes=6, seed=42) family as
    `sim_topk_lsh`, so the inline and precomputed paths share one
    oracle. tests/test_plans.py asserts the probe plan prunes."""
    emb = load_table(spark, sf, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    path = _warehouse_path(spark, sf, "lsh_signatures")
    if _table_stale(spark, path, emb.count(), expect_types=[("_sig", "string")]):
        S.build_lsh_signature_table(emb, "embedding", 64, path, n_planes=6, seed=42)
    return S.lsh_topk_precomputed(
        spark, path, "embedding", qvec, k=10, n_planes=6, seed=42
    ).withColumn("similarity", F.round("similarity", 4))


def _q_sim_topk_ivf_precomputed(spark, sf):
    """IVF twin of the precomputed probe: inverted lists ARE partitions
    (partitionBy centroid_id at ingest, skipped when fresh); the probe
    reads n_probe=2 of 8 partitions and rescores."""
    emb = load_table(spark, sf, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    path = _warehouse_path(spark, sf, "ivf_lists")
    if _table_stale(spark, path, emb.count()):
        S.build_ivf_table(emb, "embedding", 64, path, n_centroids=8, seed=7)
    return S.ivf_topk_precomputed(
        spark, path, "embedding", qvec, k=10, n_centroids=8, n_probe=2, seed=7
    ).withColumn("similarity", F.round("similarity", 4))


def _partsupp(spark, sf):
    """Derived partsupp (sources/derived.py): the fixtures carry no
    partsupp table, so one is derived with integer arithmetic the
    oracle CTE re-emits verbatim — bit-identical on both engines."""
    from data_pengadaan_agent_spark.sources.derived import derive_partsupp

    part = load_table(spark, sf, "part")
    s_count = load_table(spark, sf, "supplier").count()
    return derive_partsupp(part, s_count)


def _q_tpch_q2(spark, sf):
    """TPC-H Q2 shape (min-cost supplier): for LARGE mid-size parts,
    the supplier(s) in REGION_0 offering the minimum ps_supplycost.
    The correlated min-subquery compiles to ONE window over the
    region-restricted candidates (partitioned by part — no re-probe
    per row); dims broadcast."""
    from pyspark.sql import Window

    ps = _partsupp(spark, sf)
    part = load_table(spark, sf, "part").filter(
        F.col("p_size").between(10, 20) & (F.col("p_type") == "LARGE")
    )
    supp = load_table(spark, sf, "supplier")
    nat = load_table(spark, sf, "nation")
    reg = load_table(spark, sf, "region").filter(F.col("r_name") == "EUROPE")
    sn = supp.join(
        F.broadcast(
            nat.join(F.broadcast(reg), nat["n_regionkey"] == reg["r_regionkey"])
        ),
        supp["s_nationkey"] == nat["n_nationkey"],
    ).select("s_suppkey", "s_name", "s_acctbal", "n_name")
    cand = (
        ps.join(F.broadcast(part.select("p_partkey", "p_brand")),
                ps["ps_partkey"] == F.col("p_partkey"))
        .join(sn, ps["ps_suppkey"] == F.col("s_suppkey"))
    )
    w = Window.partitionBy("ps_partkey")
    return (
        cand.withColumn("min_cost", F.min("ps_supplycost").over(w))
        .filter(F.col("ps_supplycost") == F.col("min_cost"))
        .select("s_acctbal", "s_name", "n_name",
                F.col("ps_partkey").alias("p_partkey"), "p_brand", "ps_supplycost")
        .orderBy(F.desc("s_acctbal"), "s_name", "p_partkey")
        .limit(20)
    )


def _q_tpch_q9(spark, sf):
    """TPC-H Q9 shape (product-type profit by nation/year) over the
    derived partsupp. Profit = price×(1−disc) − supplycost×qty, all
    factors through DECIMAL so the parallel sum is exact; part and
    supplier dims broadcast; the one big shuffle is lineitem ⋈ orders
    on orderkey."""
    ps = _partsupp(spark, sf)
    li = load_table(spark, sf, "lineitem")
    part = load_table(spark, sf, "part").filter(F.col("p_name").like("%red%"))
    supp = load_table(spark, sf, "supplier")
    nat = load_table(spark, sf, "nation")
    orders = load_table(spark, sf, "orders")
    profit = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1.0) - F.col("l_discount")).cast("decimal(8,2)")
        - F.col("ps_supplycost").cast("decimal(18,2)")
        * F.col("l_quantity").cast("decimal(8,2)")
    )
    return (
        li.join(F.broadcast(part.select("p_partkey")), li["l_partkey"] == F.col("p_partkey"))
        .join(ps, (li["l_partkey"] == ps["ps_partkey"]) & (li["l_suppkey"] == ps["ps_suppkey"]))
        .join(F.broadcast(supp.select("s_suppkey", "s_nationkey")),
              li["l_suppkey"] == F.col("s_suppkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders.select("o_orderkey", "o_orderdate"), li["l_orderkey"] == F.col("o_orderkey"))
        .groupBy("n_name", F.year("o_orderdate").cast("int").alias("o_year"))
        # round the exact DECIMAL sum, then cast: rounding after the
        # double conversion can land a half-cent on the wrong side
        .agg(F.round(F.sum(profit), 2).cast("double").alias("sum_profit"))
        .orderBy("n_name", F.desc("o_year"))
    )


def _q_tpch_q11(spark, sf):
    """TPC-H Q11 shape (important stock): per-part stock value for one
    nation's suppliers, kept when above a fraction of the total. The
    scalar total is a second aggregation over the SAME grouped frame,
    broadcast back — never an unpartitioned window over every part."""
    ps = _partsupp(spark, sf)
    # nation-GROUP filter (≈1/5 of suppliers) instead of one nationkey:
    # a single nation can be empty at tiny SFs (10 suppliers, 25 nations)
    supp = load_table(spark, sf, "supplier").filter(F.col("s_nationkey") % 5 == 2)
    val = (F.col("ps_supplycost").cast("decimal(18,2)") * F.col("ps_availqty")).alias("v")
    grouped = (
        ps.join(F.broadcast(supp.select("s_suppkey")), ps["ps_suppkey"] == F.col("s_suppkey"))
        .groupBy("ps_partkey")
        .agg(F.sum(val).cast("double").alias("stock_value"))
    )
    tot = grouped.agg(F.sum("stock_value").alias("tot"))
    return (
        grouped.crossJoin(F.broadcast(tot))
        .filter(F.col("stock_value") > F.col("tot") * 0.002)
        .select("ps_partkey", F.round("stock_value", 2).alias("stock_value"))
        .orderBy(F.desc("stock_value"), "ps_partkey")
        .limit(50)
    )


def _q_tpch_q16(spark, sf):
    """TPC-H Q16 shape (supplier count by part attrs). The reference
    Q16 excludes suppliers with complaint comments; the fixtures carry
    no s_comment, so the excluded set is re-grounded as s_acctbal < 0
    (same anti-join shape). count(DISTINCT ps_suppkey) after the
    anti-join; part dim broadcast."""
    ps = _partsupp(spark, sf)
    part = load_table(spark, sf, "part").filter(
        (F.col("p_brand") != "Brand#3")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 24, 29, 34)
    )
    bad_supp = load_table(spark, sf, "supplier").filter(F.col("s_acctbal") < 0).select(
        F.col("s_suppkey").alias("ps_suppkey")
    )
    return (
        ps.join(bad_supp, "ps_suppkey", "left_anti")
        .join(F.broadcast(part.select("p_partkey", "p_brand", "p_type", "p_size")),
              ps["ps_partkey"] == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


def _q_tpch_q20(spark, sf):
    """TPC-H Q20 shape (excess-stock suppliers): suppliers of 'small…'
    parts whose availqty exceeds half the 1996 shipped quantity for
    that (part, supplier). The shipped aggregate is computed once
    (partial+final agg), the availqty predicate is a plain join
    filter, and the supplier projection is a left-semi join — no
    payload duplication anywhere."""
    ps = _partsupp(spark, sf)
    li = load_table(spark, sf, "lineitem")
    part = load_table(spark, sf, "part").filter(F.col("p_name").like("small%"))
    supp = load_table(spark, sf, "supplier")
    shipped = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .groupBy(F.col("l_partkey"), F.col("l_suppkey"))
        .agg((F.lit(0.5) * F.sum("l_quantity")).alias("half_qty"))
    )
    excess = (
        ps.join(F.broadcast(part.select("p_partkey")), ps["ps_partkey"] == F.col("p_partkey"))
        .join(shipped, (ps["ps_partkey"] == shipped["l_partkey"])
              & (ps["ps_suppkey"] == shipped["l_suppkey"]))
        .filter(F.col("ps_availqty") > F.col("half_qty"))
        .select(F.col("ps_suppkey").alias("s_suppkey"))
        .distinct()
    )
    return (
        supp.join(excess, "s_suppkey", "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_name")
    )


def _q_latest_by_key(spark, sf):
    """CDC compaction: current state per user from the event log
    (rank-1 window, deterministic tiebreak on event_id)."""
    ev = load_table(spark, sf, "events")
    return R.latest_by_key(ev, "user_id", "ts", tiebreak_col="event_id").select(
        "user_id",
        "event_id",
        "event_type",
        "value",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
    )


def _q_profile_columns(spark, sf):
    """Data-QA profile of orders in ONE aggregation pass + stack()
    unpivot. o_totalprice goes through DECIMAL before stringifying so
    min/max render identically on both engines (no sci-notation
    drift)."""
    orders = load_table(spark, sf, "orders").withColumn(
        "o_totalprice", F.col("o_totalprice").cast("decimal(18,2)")
    )
    return R.profile_columns(
        orders, ["o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate"]
    )


def _q_tpch_q5(spark, sf):
    """TPC-H Q5 (operators/relational.local_supplier_volume): revenue
    by nation where customer and supplier share a nation in one
    region over one year — completes the 22-query TPC-H surface."""
    return R.local_supplier_volume(
        load_table(spark, sf, "region"),
        load_table(spark, sf, "nation"),
        load_table(spark, sf, "customer"),
        load_table(spark, sf, "supplier"),
        load_table(spark, sf, "orders"),
        load_table(spark, sf, "lineitem"),
    )


def _q_repetition_stats(spark, sf):
    """Gopher-style repetition quality filters
    (operators/textan.repetition_stats): dup-word / top-word /
    dup-2-gram / top-2-gram fractions per document."""
    return X.repetition_stats(load_table(spark, sf, "documents"))


def _q_ngram_contamination(spark, sf):
    """Train/test contamination audit
    (operators/textan.ngram_contamination): share of each held-out
    document's distinct 5-grams that appear in the training split
    (deterministic doc_id % 10 holdout)."""
    docs = load_table(spark, sf, "documents")
    test = docs.filter(F.col("doc_id") % 10 == 0)
    train = docs.filter(F.col("doc_id") % 10 != 0)
    return X.ngram_contamination(test, train, n=5)


def _q_trending_terms_stream(spark, sf):
    """STREAMING windowed trending-term monitor (streaming/windows.
    trending_terms_stream): tumbling 10-minute term counts over the
    ingest stream, complete output mode (the finite-source
    materialization equals the batch aggregation, so the entry is
    VALUE-checked). The ingest time derives from line length (base +
    pmod(n_chars × Knuth, 3600) s) — deterministic AND replicable in
    plain SQL, unlike the xxhash64 doc hash."""
    from data_pengadaan_agent_spark.sources.readers import read_text_corpus_stream

    corpus = read_text_corpus_stream(spark, _ensure_text_corpus(sf)).withColumn(
        "ingest_ts",
        F.timestamp_seconds(
            F.lit(1704067200)
            + F.pmod(F.col("n_chars") * F.lit(2654435761), F.lit(3600))
        ),
    )
    out = SW.trending_terms_stream(corpus, min_count=5)
    res = SW.run_stream_to_memory(
        spark, out, "trending_terms_stream", output_mode="complete"
    )
    return res.select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm").alias("window_start"),
        "term",
        "n",
    )


def _q_trending_terms_append(spark, sf):
    """The PRODUCTION (state-bounded) trending-terms form, registered
    in round 6 (VERDICT r5 ask #5): same windowed term-count frame as
    `trending_terms_stream` but APPEND output mode with a 30-minute
    watermark — closed windows are emitted exactly once and their
    state evicted, so state is O(|terms per window| × |open windows|)
    on an infinite stream (the complete-mode twin, which retains
    every window forever, is retired to the locally-checked set).
    Value-checkable because the emitted set is deterministic: windows
    whose end ≤ final watermark = max(ingest_ts) − 30 min; the oracle
    computes the batch aggregation with that same cutoff (no window
    end ever ties the watermark on these fixtures — max_off mod 600
    is 592–596 at every SF, checked round 6)."""
    from data_pengadaan_agent_spark.sources.readers import read_text_corpus_stream

    corpus = read_text_corpus_stream(spark, _ensure_text_corpus(sf)).withColumn(
        "ingest_ts",
        F.timestamp_seconds(
            F.lit(1704067200)
            + F.pmod(F.col("n_chars") * F.lit(2654435761), F.lit(3600))
        ),
    )
    out = SW.trending_terms_stream(corpus, min_count=5, watermark="30 minutes")
    res = SW.run_stream_to_memory(
        spark, out, "trending_terms_append", output_mode="append"
    )
    return res.select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm").alias("window_start"),
        "term",
        "n",
    )


def _q_token_rarity(spark, sf):
    """Unigram-rarity quality gate (operators/textan.token_rarity):
    per-doc mean token rarity under the integer idf-proxy — the
    CCNet-style LM-perplexity filter stand-in, value-checked."""
    return X.token_rarity(load_table(spark, sf, "documents"))


def _q_decontaminate_train(spark, sf):
    """Benchmark decontamination as a filter (operators/textan.
    decontaminate_train): training docs sharing any distinct 5-gram
    with the held-out split are dropped; survivors returned
    (deterministic doc_id % 10 holdout, the ngram_contamination
    audit's action twin)."""
    docs = load_table(spark, sf, "documents")
    test = docs.filter(F.col("doc_id") % 10 == 0)
    train = docs.filter(F.col("doc_id") % 10 != 0)
    return X.decontaminate_train(train, test, n=5).select("doc_id", "lang", "source")


def _q_boilerplate_ngrams(spark, sf):
    """Corpus self-boilerplate audit (operators/textan.
    boilerplate_ngrams): per-doc share of distinct 3-grams occurring
    in ≥2 distinct documents — the C4-style templated-content signal,
    value-checked."""
    return X.boilerplate_ngrams(
        load_table(spark, sf, "documents"), n=3, min_docs=2
    )


def _q_length_outliers(spark, sf):
    """Percentile length-band gate (operators/textan.
    length_outlier_band): exact corpus p10/p90 token-count band,
    broadcast back as a 1-row bounds frame; every doc flagged
    in/out of band."""
    return X.length_outlier_band(
        load_table(spark, sf, "documents"), p_lo=0.10, p_hi=0.90
    )


def _q_snapshot_diff(spark, sf):
    """Snapshot delta (operators/relational.snapshot_diff): two
    deterministic snapshots of the documents corpus — the old one
    missing doc_id%13==5 (later additions), the new one missing
    doc_id%17==3 (deletions) and carrying a ' rev2' suffix on
    doc_id%9==2 (edits) — classified added/removed/changed/unchanged
    per key via the content-hash full-outer join."""
    docs = load_table(spark, sf, "documents")
    old = docs.filter(F.col("doc_id") % 13 != 5).select("doc_id", "text")
    new = docs.filter(F.col("doc_id") % 17 != 3).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 9 == 2, F.concat(F.col("text"), F.lit(" rev2"))
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return R.snapshot_diff(old, new)


def _q_cross_source_overlap(spark, sf):
    """Provenance overlap report (operators/dedup.
    cross_source_overlap): the documents corpus plus a deterministic
    'mirror' source replaying every doc_id%7==0 text — per source
    pair, the count of distinct shared contents."""
    docs = load_table(spark, sf, "documents")
    mirror = docs.filter(F.col("doc_id") % 7 == 0).select(
        "text", F.lit("mirror").alias("source")
    )
    return D.cross_source_overlap(
        docs.select("text", "source").unionByName(mirror)
    )


def _q_embedding_qa(spark, sf):
    """Vector-column QA (operators/relational.embedding_qa) over the
    embeddings fixture with deterministic planted anomalies — NULL
    vectors (vec_id%89==11), all-zero vectors (vec_id%101==7), and
    32-dim truncations (vec_id%97==13) — per-label counts + L2-norm
    stats, DECIMAL-exact mean."""
    emb = load_table(spark, sf, "embeddings")
    vid = F.col("vec_id")
    v = F.col("embedding")
    planted = (
        F.when(vid % 89 == 11, F.lit(None).cast("array<float>"))
        .when(vid % 101 == 7, F.transform(v, lambda x: F.lit(0.0).cast("float")))
        .when(vid % 97 == 13, F.slice(v, 1, 32))
        .otherwise(v)
    )
    return R.embedding_qa(
        emb.select(planted.alias("embedding"), "label"), dim=64
    )


def _q_corpus_report(spark, sf):
    """Per-source corpus datasheet (operators/textan.corpus_report)
    over documents plus a planted within-source replay of every
    doc_id%11==0 row (so dup_rate does real work): doc/content
    counts, dup rate, token volume with exact mean and median,
    language spread — one scan, one source-key aggregate."""
    docs = load_table(spark, sf, "documents")
    copies = docs.filter(F.col("doc_id") % 11 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        "text",
        "lang",
        "source",
        "n_chars",
    )
    return X.corpus_report(docs.unionByName(copies))


def _q_prototypicality(spark, sf):
    """Prototypicality pruning ranks (operators/similarity.
    prototypicality): distance-to-trained-centroid per vector,
    farthest-first rank per cluster, top-10% flagged hard — the
    Sorscher et al. data-pruning signal, value-checked against the
    unrolled 2-iteration k-means SQL twin."""
    emb = load_table(spark, sf, "embeddings")
    return S.prototypicality(
        emb, "embedding", "vec_id", k=4, iters=2, hard_frac=0.1
    )


def _q_semdedup_prune(spark, sf):
    """SemDeDup (operators/similarity.semdedup_prune) over the
    embeddings fixture plus planted semantic dups — a ×1.01-scaled
    copy of every vec_id%25==0 vector (cosine ≈ 1.0 to its source,
    organic within-cluster max is 0.51, so threshold 0.9 separates
    with a huge margin). Keep-lowest-id greedy inside each trained
    cluster."""
    emb = load_table(spark, sf, "embeddings").select("vec_id", "embedding")
    copies = emb.filter(F.col("vec_id") % 25 == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform(
            "embedding", lambda x: (x * F.lit(1.01)).cast("float")
        ).alias("embedding"),
    )
    return S.semdedup_prune(
        emb.unionByName(copies), k=4, iters=2, threshold=0.9
    )


# 21° in radians: consecutive chain directions are 0.9336-similar
# (above the 0.9 threshold), two apart are 0.7431 (below) — the
# transitive-chain construction that separates strict greedy from the
# relaxed lower-id rule.
_CHAIN_THETA = 0.36651914291880922


def _q_semdedup_greedy(spark, sf):
    """STRICT greedy keep-first SemDeDup (operators/similarity.
    semdedup_prune_greedy) — registered in round 6 so the sequential
    walk semantics carry a driver hash check (VERDICT r5 ask #4).
    Fixture plants BOTH dup regimes on top of the embeddings corpus:
    ×1.01-scaled copies of every vec_id%25==0 vector (plain colinear
    dups, where greedy == relaxed) AND a rotation chain — unit
    vectors in the e0–e1 plane at angle 21°·((vec_id/25) mod 8), ids
    +2000000 — where consecutive directions are 0.9336-similar but
    two-apart only 0.7431: greedy keeps the first vector of every
    EVEN chain step (its only similar predecessors were themselves
    pruned) while the relaxed rule would drop it, so a kernel
    regression to relaxed semantics hash-mismatches. The DuckDB twin
    replays the walk as a recursive CTE over the sparse
    threshold-pair graph."""
    emb = load_table(spark, sf, "embeddings").select("vec_id", "embedding")
    copies = emb.filter(F.col("vec_id") % 25 == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform(
            "embedding", lambda x: (x * F.lit(1.01)).cast("float")
        ).alias("embedding"),
    )
    ang = (
        ((F.col("vec_id") / 25).cast("long") % 8).cast("double")
        * F.lit(_CHAIN_THETA)
    )
    chain = emb.filter(F.col("vec_id") % 25 == 0).select(
        (F.col("vec_id") + 2000000).alias("vec_id"),
        F.concat(
            F.array(F.cos(ang).cast("float"), F.sin(ang).cast("float")),
            F.array_repeat(F.lit(0.0).cast("float"), 62),
        ).alias("embedding"),
    )
    return S.semdedup_prune_greedy(
        emb.unionByName(copies).unionByName(chain),
        k=4,
        iters=2,
        threshold=0.9,
    )


def _q_normalize_text(spark, sf):
    """Canonical normalization (operators/textan.normalize_text) over
    deliberately-dirtied input (upper-cased text + a punctuated
    revision suffix) so the lowercase/strip/collapse path does real
    work the oracle can check."""
    docs = load_table(spark, sf, "documents").select(
        "doc_id",
        F.concat(
            F.upper("text"),
            F.lit(" [Rev-"),
            F.col("doc_id").cast("string"),
            F.lit(".0]"),
        ).alias("text"),
    )
    out = X.normalize_text(docs)
    return out.select(
        "doc_id", "text_norm", F.col("n_chars_norm").cast("bigint").alias("n_chars_norm")
    )


def _q_kmeans_clusters(spark, sf):
    """Lloyd k-means (operators/similarity.kmeans_lloyd): 2 training
    iterations, k=4, deterministic init (vec_id < 4) and tie-break —
    the centroid-training step for the IVF index, value-checked
    against a fully unrolled SQL twin."""
    emb = load_table(spark, sf, "embeddings")
    return S.kmeans_lloyd(emb, "embedding", "vec_id", k=4, iters=2)


def _q_funnel_conversion(spark, sf):
    """Ordered funnel (operators/relational.funnel_conversion):
    view → click → purchase survival per user with strict time
    ordering between steps."""
    ev = load_table(spark, sf, "events")
    return R.funnel_conversion(ev, ["view", "click", "purchase"])


def _q_skew_profile(spark, sf):
    """Join-key skew diagnostics (operators/relational.skew_profile)
    over the events user key: top-10 heaviest keys with row share and
    skew factor."""
    return R.skew_profile(load_table(spark, sf, "events"), "user_id", top_k=10)


def _q_resample_ffill(spark, sf):
    """Daily resample + forward fill (operators/relational.
    resample_ffill): per-user regular day grid over the user's own
    observation span, gap days carry the last observed daily mean."""
    ev = load_table(spark, sf, "events")
    out = R.resample_ffill(ev, "user_id", "ts", "value", step="day")
    return out.select(
        "user_id",
        F.date_format("slot", "yyyy-MM-dd").alias("slot"),
        "value_ffill",
        "observed",
    )


def _q_pack_sequences(spark, sf):
    """Token-budget sequence packing (operators/textan.pack_sequences):
    (shard, bin, offset) assignment for 512-token training windows —
    integer arithmetic end-to-end, exact SQL twin."""
    return X.pack_sequences(
        load_table(spark, sf, "documents"), budget=512, shards=8
    )


def _q_chunk_text(spark, sf):
    """Context-window chunking (operators/textan.chunk_text): docs →
    overlapping 200-char chunks with [start, end) provenance spans."""
    docs = load_table(spark, sf, "documents").filter(F.col("doc_id") < 100)
    return X.chunk_text(docs, chunk_chars=200, overlap=50)


def _q_mad_by_event_type(spark, sf):
    """Grouped-agg Pandas UDAF (median absolute deviation) — Spark has
    no MAD built-in; DuckDB's native mad() is the oracle."""
    ev = load_table(spark, sf, "events")
    return A.mad_pandas_udaf(ev, "event_type", "value").select(
        "event_type", F.round("mad", 6).alias("mad")
    )


def _q_train_test_split(spark, sf):
    """Deterministic corpus split (operators/sampling.py): per-(split,
    source) counts + id checksums. The Knuth-hash assignment is
    re-emitted in the oracle, so the 'random' split is value-checked."""
    from data_pengadaan_agent_spark.operators.sampling import train_test_split

    docs = load_table(spark, sf, "documents")
    return (
        train_test_split(docs, "doc_id", 0.8)
        .groupBy("split", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("doc_id").alias("id_sum"),
            F.sum("n_chars").alias("chars_sum"),
        )
    )


def _q_sample_per_group(spark, sf):
    """k-per-group deterministic cap: at most 5 documents per source,
    chosen by scrambled-hash rank (the 'cap per domain' curation
    step)."""
    from data_pengadaan_agent_spark.operators.sampling import sample_per_group

    docs = load_table(spark, sf, "documents")
    return sample_per_group(docs, "source", "doc_id", k=5).select(
        "source", "doc_id", "lang", "n_chars"
    )


def _q_tpch_q21(spark, sf):
    """TPC-H Q21 shape (suppliers who kept orders waiting) over derived
    commit/receipt dates (sources/derived.py). The EXISTS /
    NOT EXISTS correlated subqueries compile to a left-semi and a
    left-anti join on the orderkey (with the supplier inequality as a
    residual) — no per-row re-execution; supplier dim broadcast."""
    from data_pengadaan_agent_spark.sources.derived import derive_line_dates

    # spread: the per-order multi-DISTINCT aggregate expands 600k+
    # lineitem rows before its partial agg — keep that off one core
    # when the fixture scan is a single split.
    li = derive_line_dates(spread(load_table(spark, sf, "lineitem"), "l_orderkey"))
    is_late = F.col("l_receiptdate") > F.col("l_commitdate")
    late = li.filter(is_late).select("l_orderkey", "l_suppkey")
    # Rewrite of the textbook EXISTS ("another supplier on the order")
    # + NOT EXISTS ("no OTHER supplier was late") pair: for a LATE line
    # those are exactly n_suppliers ≥ 2 AND n_late_suppliers = 1. One
    # per-order aggregate replaces a semi-join AND an anti-join —
    # lineitem is shuffled once on orderkey instead of three times.
    # The oracle keeps the declarative EXISTS form, so the rewrite
    # itself is value-checked.
    per_order = li.groupBy(F.col("l_orderkey").alias("o_key")).agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(is_late, F.col("l_suppkey"))).alias("n_late_supp"),
    )
    l1 = late.join(
        per_order.filter((F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1)),
        late["l_orderkey"] == F.col("o_key"),
        "left_semi",
    )
    orders_f = load_table(spark, sf, "orders").filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey"
    )
    supp = load_table(spark, sf, "supplier").filter(F.col("s_nationkey") % 5 == 1).select(
        "s_suppkey", "s_name"
    )
    return (
        l1.join(orders_f, l1["l_orderkey"] == F.col("o_orderkey"))
        .join(F.broadcast(supp), l1["l_suppkey"] == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


def _q_bucketed_join_revenue(spark, sf):
    """Bucketed co-located join: orders and customer are materialized
    ONCE as managed tables bucketed 8-ways on the join key
    (spark-warehouse ingest; rebuilt only if row counts drift from the
    fixtures), then the revenue-per-segment join runs WITHOUT a
    shuffle on either join side — the single biggest cost of a fact ×
    dim join at 100 TB is the fact shuffle, and bucketing removes it
    from every subsequent query. hint("merge") pins the sort-merge
    strategy so the bucket layout (not a broadcast) is what's
    exercised; tests/test_sources_functions.py asserts the no-Exchange
    plan for this layout."""
    from data_pengadaan_agent_spark.sources.readers import write_bucketed

    tag = sf.rstrip("/").rsplit("/", 1)[-1].replace(".", "_")
    ot, ct = f"orders_bkt_{tag}", f"customer_bkt_{tag}"
    orders = load_table(spark, sf, "orders").select("o_custkey", "o_totalprice")
    customer = load_table(spark, sf, "customer").select("c_custkey", "c_mktsegment")
    if (not spark.catalog.tableExists(ot)) or spark.table(ot).count() != orders.count():
        write_bucketed(orders, ot, "o_custkey", n_buckets=8)
    if (not spark.catalog.tableExists(ct)) or spark.table(ct).count() != customer.count():
        write_bucketed(customer, ct, "c_custkey", n_buckets=8)
    joined = spark.table(ot).hint("merge").join(
        spark.table(ct), F.col("o_custkey") == F.col("c_custkey")
    )
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(A.decimal_sum("o_totalprice").cast("double"), 2).alias("total_rev"),
    )


def _q_minhash_dedup_pairs(spark, sf):
    """The FULL near-dup pipeline registered end-to-end: banded
    minhash LSH candidates → exact shingle-jaccard verify ≥ 0.12.
    Candidates cheap (signature equi-join), verification exact and
    restricted to candidates (`pairs=`), never all pairs."""
    docs = load_table(spark, sf, "documents").filter(F.col("doc_id") < 200)
    # candidates referenced 3× by the verifier — materialize once,
    # exactly as the production wrapper D.minhash_dedup_pairs does
    cand = D.minhash_lsh_pairs_arith(docs, n_hashes=32, bands=16).localCheckpoint()
    jac = D.ngram_jaccard_pairs(docs, n=3, threshold=0.0, pairs=cand)
    return jac.filter(F.col("jaccard") >= 0.12)


def _q_sim_topk_brute(spark, sf):
    emb = load_table(spark, sf, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    return S.cosine_topk(emb, "embedding", qvec, k=10).withColumn(
        "similarity", F.round("similarity", 4)
    )


def _q_sim_topk_lsh(spark, sf):
    emb = load_table(spark, sf, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    return S.lsh_topk(emb, "embedding", qvec, k=10, n_planes=6, seed=42).withColumn(
        "similarity", F.round("similarity", 4)
    )


def _q_sim_topk_ivf(spark, sf):
    emb = load_table(spark, sf, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    return S.ivf_topk(
        emb, "embedding", qvec, k=10, n_centroids=8, n_probe=2, seed=7
    ).withColumn("similarity", F.round("similarity", 4))


def _q_ann_recall(spark, sf):
    """Retrieval QUALITY as a checkable row (VERDICT r4 #4): recall@10
    of the two ANN paths (`lsh_topk`, `ivf_topk`) against the exact
    brute-force top-k, same deterministic query vector and codebooks as
    the sim_topk_* entries. Semantic retrieval is the reference's
    signature feature (reference `openai/list_of_tools.py:123-143`,
    embedding search over the procurement vocab); this entry pins its
    QUALITY — not just plan shape — against regression: a banding/
    probe change that silently tanks recall now reds a driver row.

    Scale: each top-k is TakeOrderedAndProject-capped at k=10 before
    the 10-row broadcast semi-join; the aggregates are single scalar
    rows. Recall numbers at these settings (NOTES r2): LSH 6-plane
    single-bucket probe and IVF 2-of-8 probe both recover most of the
    exact top-10 on the fixture; the entry records whatever they are
    so drift is visible."""
    emb = load_table(spark, sf, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    brute = (
        S.cosine_topk(emb, "embedding", qvec, k=10).select("vec_id").localCheckpoint()
    )
    lsh = S.lsh_topk(emb, "embedding", qvec, k=10, n_planes=6, seed=42).select("vec_id")
    ivf = S.ivf_topk(
        emb, "embedding", qvec, k=10, n_centroids=8, n_probe=2, seed=7
    ).select("vec_id")

    def recall_row(name: str, approx: DataFrame) -> DataFrame:
        return (
            approx.join(F.broadcast(brute), "vec_id", "left_semi")
            .agg(F.count(F.lit(1)).alias("hits"))
            .select(
                F.lit(name).alias("method"),
                F.lit(10).cast("bigint").alias("k"),
                F.round(F.col("hits") / F.lit(10.0), 4).alias("recall"),
            )
        )

    return recall_row("ivf", ivf).unionAll(recall_row("lsh", lsh)).orderBy("method")


def _q_bm25_retrieval(spark, sf):
    """BM25-ranked keyword retrieval (operators/textan.bm25_score) —
    the principled ranking upgrade of the raw match-count keyword arm
    (reference retrieval semantics, openai/list_of_tools.py:123-143):
    idf-weighted, tf-saturating, length-normalized. One corpus scan +
    a 1-row broadcast of corpus stats; top-20 via
    TakeOrderedAndProject."""
    docs = load_table(spark, sf, "documents")
    out = X.bm25_score(docs, ["spark", "window", "join"])
    return (
        out.withColumn("bm25", F.round("bm25", 4))
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(20)
    )


_MIX_TOKEN_BUDGETS = {"en": 5000, "de": 2000, "fr": 100000}


def _q_corpus_mix_tokens(spark, sf):
    """Token-budget corpus mixing (operators/sampling.
    corpus_mix_token_budget): per language, admit docs in scrambled-
    hash order until the TOKEN budget is reached — mixtures specified
    in tokens (the unit pretraining recipes actually use), vs
    corpus_mix's proportional document counts. Budgets chosen to
    exercise all three regimes: en/de partially filled, fr's budget
    exceeds its supply (keeps everything), es/zh absent (dropped)."""
    from data_pengadaan_agent_spark.operators.sampling import corpus_mix_token_budget

    docs = load_table(spark, sf, "documents").select(
        "doc_id", "lang", F.size(X.tokens("text")).cast("bigint").alias("n_tokens")
    )
    return corpus_mix_token_budget(docs, _MIX_TOKEN_BUDGETS, group_col="lang")


def _q_cluster_representatives(spark, sf):
    """Quality-keeping near-dup collapse (operators/dedup.
    cluster_representatives): ngram-jaccard pairs → connected
    components → keep each cluster's highest-quality member (ties by
    min id) — dedup that keeps the BEST copy, not the min-id one."""
    docs = load_table(spark, sf, "documents").filter(F.col("doc_id") < 200)
    pairs = D.ngram_jaccard_pairs(docs, n=3, threshold=0.12).select("id_a", "id_b")
    clusters = D.dedup_clusters(docs, pairs)
    scores = X.quality_score(docs).select("doc_id", "quality_score")
    return D.cluster_representatives(clusters, scores).orderBy("cluster_id")


def _q_text_token_count(spark, sf):
    return X.token_count(load_table(spark, sf, "documents")).select(
        "doc_id", F.col("n_tokens").cast("long").alias("n_tokens"), "n_bpe_est"
    )


def _q_text_quality(spark, sf):
    return X.quality_score(load_table(spark, sf, "documents")).select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        "stopword_ratio",
        "alpha_ratio",
        "quality_score",
    )


def _q_text_language_id(spark, sf):
    return X.language_id(load_table(spark, sf, "documents"))


def _q_text_fingerprint(spark, sf):
    """62-bit two-channel polynomial fingerprint (oracle-checkable);
    X.fingerprint is the xxhash64 production twin."""
    return X.fingerprint_arith(load_table(spark, sf, "documents"))


def _q_keyword_retrieval(spark, sf):
    """§2.10 end-to-end: vocab derived from the corpus, embedded with
    the deterministic hash-ngram embedder (S6 stand-in), cosine-ranked
    against the embedded query — the reference's
    mini_retrieve_similar_keywords pipeline."""
    docs = load_table(spark, sf, "documents")
    vocab = X.vocabulary(docs).orderBy(F.desc("df"), "token").limit(50).select(
        F.col("token").alias("keyword")
    )
    return S.retrieve_similar_keywords(vocab, "sparkle", k=10).withColumn(
        "similarity", F.round("similarity", 4)
    )


def _q_text_vocabulary(spark, sf):
    docs = load_table(spark, sf, "documents")
    return X.vocabulary(docs).orderBy(F.desc("df"), "token").limit(50)


def _q_text_filtered_keywords(spark, sf):
    docs = load_table(spark, sf, "documents")
    out = X.derive_filtered_keywords(docs, ["text"])
    # canonicalize token order at the output edge so the value-hash
    # compare is order-insensitive w.r.t. first-occurrence order
    return out.select(
        "doc_id",
        F.array_join(F.array_sort(F.split("filtered_keywords", ",")), ",").alias(
            "filtered_keywords"
        ),
    )


def _q_tumbling_window(spark, sf):
    ev = load_table(spark, sf, "events")
    out = SW.tumbling_counts(ev, "1 hour")
    return out.select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm").alias("window_start"),
        "event_type",
        "n",
        F.round("total_value", 2).alias("total_value"),
    )


def _q_correlated_subquery(spark, sf):
    return R.above_nation_avg_customers(load_table(spark, sf, "customer"))


def _q_tpch_q7(spark, sf):
    return R.nation_volume_shipping(
        load_table(spark, sf, "supplier"),
        load_table(spark, sf, "nation"),
        load_table(spark, sf, "customer"),
        load_table(spark, sf, "orders"),
        load_table(spark, sf, "lineitem"),
    )


def _q_tpch_q10(spark, sf):
    return R.returned_item_losses(
        load_table(spark, sf, "customer"),
        load_table(spark, sf, "orders"),
        load_table(spark, sf, "lineitem"),
        load_table(spark, sf, "nation"),
    )


def _q_tpch_q13(spark, sf):
    return R.customer_order_distribution(
        load_table(spark, sf, "customer"), load_table(spark, sf, "orders")
    )


def _q_window_moving_avg(spark, sf):
    return R.moving_avg_revenue(load_table(spark, sf, "orders"))


def _q_tpch_q8(spark, sf):
    return R.market_share(
        load_table(spark, sf, "part"),
        load_table(spark, sf, "supplier"),
        load_table(spark, sf, "nation"),
        load_table(spark, sf, "customer"),
        load_table(spark, sf, "orders"),
        load_table(spark, sf, "lineitem"),
    )


def _q_tpch_q15(spark, sf):
    return R.top_supplier_revenue(
        load_table(spark, sf, "supplier"), load_table(spark, sf, "lineitem")
    )


def _q_hourly_distinct_users(spark, sf):
    return R.hourly_distinct_users(load_table(spark, sf, "events"))


def _q_cohort_retention(spark, sf):
    return R.cohort_retention(load_table(spark, sf, "events"))


def _q_window_range_frame(spark, sf):
    return R.nearby_order_volume(load_table(spark, sf, "orders"))


def _q_json_props_rollup(spark, sf):
    return R.props_key_rollup(load_table(spark, sf, "events"))


def _q_supplier_revenue(spark, sf):
    return R.supplier_nation_revenue(
        load_table(spark, sf, "supplier"),
        load_table(spark, sf, "nation"),
        load_table(spark, sf, "lineitem"),
    )


def _q_full_outer_monthly(spark, sf):
    return R.monthly_orders_vs_events(
        load_table(spark, sf, "orders"), load_table(spark, sf, "events")
    )


def _q_except_all(spark, sf):
    return R.surplus_order_multiplicity(
        load_table(spark, sf, "orders"), load_table(spark, sf, "customer")
    )


def _q_salted_join(spark, sf):
    return R.salted_user_totals_join(load_table(spark, sf, "events"), n_salts=8)


def _q_intermediary_pipeline(spark, sf):
    """S4→S2: stage-1 keyword filter materialized as the cached
    intermediary view, stage-2 aggregate compiled against the view —
    the reference's two-stage query lifecycle (SURVEY.md §3)."""
    from data_pengadaan_agent_spark.operators import materialize as MA

    docs = load_table(spark, sf, "documents")
    stage1 = filter_keywords(docs, "text", include=[["spark", "hash"]])
    MA.materialize(stage1, view_name="intermediary_q")
    return spark.sql(
        """SELECT source, count(*) AS n, sum(n_chars) AS total_chars
           FROM intermediary_q GROUP BY source ORDER BY source"""
    )


def _q_chart_histogram_categorical(spark, sf):
    """C4 dtype dispatch, categorical branch (value_counts fallback)."""
    from data_pengadaan_agent_spark.operators import charts as C

    docs = load_table(spark, sf, "documents")
    data, _insights = C.histogram_data(docs, "source")
    return data.orderBy("source")


def _q_parse_ts_coerce(spark, sf):
    """P6: parse-with-coerce over a dirty STRING timestamp column —
    the reference's pd.to_datetime(errors='coerce')+dropna path
    (openai/list_of_tools.py:49-51). Every 7th order's stringified
    date is corrupted in-plan; try_to_timestamp NULLs those rows and
    the coerce drops them; survivors roll up per month."""
    from data_pengadaan_agent_spark.operators.filters import parse_ts_coerce

    orders = load_table(spark, sf, "orders")
    dirty = orders.select(
        "o_orderkey",
        F.when(
            F.col("o_orderkey") % 7 == 0,
            F.concat(F.lit("bad-"), F.col("o_orderdate").cast("string")),
        )
        .otherwise(F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss"))
        .alias("raw_ts"),
    )
    parsed = parse_ts_coerce(dirty, "raw_ts", dst="ts")
    return parsed.groupBy(F.date_format("ts", "yyyy-MM").alias("bulan")).agg(
        F.count(F.lit(1)).alias("n_parsed"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("first_ts"),
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("last_ts"),
    )


def _q_chart_bar_priority(spark, sf):
    """C1 bar-chart data: categorical x (priority) vs numeric y — the
    reference's most-rehearsed chart (openai/list_of_tools.py:204-269).
    The grouped frame is built with the DECIMAL money sum (bit-stable
    under parallel reduction), then handed to the C1 operator."""
    from data_pengadaan_agent_spark.operators import charts as C

    orders = load_table(spark, sf, "orders")
    grouped = orders.groupBy("o_orderpriority").agg(
        F.round(A.decimal_sum("o_totalprice").cast("double"), 2).alias("total_pagu")
    )
    data, _insights = C.bar_chart_data(grouped, "o_orderpriority", "total_pagu", insights=False)
    return data


def _q_chart_line_monthly(spark, sf):
    """C2 line-chart data: dual-axis monthly rollup over orders."""
    from data_pengadaan_agent_spark.operators import charts as C

    orders = load_table(spark, sf, "orders").select(
        F.col("o_orderdate").alias("ts"),
        F.col("o_orderkey").alias("id"),
        F.col("o_totalprice").alias("measure"),
    )
    data, _insights = C.line_chart_data(orders, "ts", "id", "measure", insights=False)
    return data.select(
        "bulan", "jumlah_paket", F.round(F.col("total_pagu").cast("double"), 2).alias("total_pagu")
    ).orderBy("bulan")


def _q_sliding_window(spark, sf):
    ev = load_table(spark, sf, "events")
    out = SW.sliding_counts(ev, "1 hour", "30 minutes")
    return out.select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm").alias("window_start"),
        "event_type",
        "n",
    )


def _q_sessionize(spark, sf):
    ev = load_table(spark, sf, "events")
    out = SW.sessionize_batch(ev, gap_minutes=30)
    return out.select(
        "user_id",
        F.date_format("session_start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format("session_end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        "n_events",
        F.round("total_value", 2).alias("total_value"),
    )


def _q_tpch_q3(spark, sf):
    return R.shipping_priority(
        load_table(spark, sf, "customer"),
        load_table(spark, sf, "orders"),
        load_table(spark, sf, "lineitem"),
    )


def _q_tpch_q6(spark, sf):
    return R.forecast_revenue(load_table(spark, sf, "lineitem"))


def _q_tpch_q18(spark, sf):
    return R.large_volume_orders(
        load_table(spark, sf, "customer"),
        load_table(spark, sf, "orders"),
        load_table(spark, sf, "lineitem"),
    )


def _q_pivot_counts(spark, sf):
    return R.pivot_status_by_priority(load_table(spark, sf, "orders"))


def _q_cube_agg(spark, sf):
    return R.cube_returns(load_table(spark, sf, "lineitem"))


def _q_percentiles(spark, sf):
    return R.exact_percentiles(load_table(spark, sf, "events"), "value")


def _split_events(spark, sf):
    ev = load_table(spark, sf, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"), "user_id", F.col("ts").alias("p_ts"),
        F.col("value").alias("p_value"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_id"), "user_id", F.col("ts").alias("c_ts"),
        F.col("value").alias("c_value"),
    )
    return purchases, clicks


def _q_asof_join(spark, sf):
    from data_pengadaan_agent_spark.operators.asof import asof_join_backward

    purchases, clicks = _split_events(spark, sf)
    out = asof_join_backward(
        purchases, clicks, left_on="p_ts", right_on="c_ts", by="user_id",
        right_cols=["c_id", "c_value"],
    )
    return out.select(
        "p_id", "user_id",
        F.date_format("p_ts", "yyyy-MM-dd HH:mm:ss").alias("p_ts"),
        F.col("c_id_right").alias("c_id"),
        F.col("c_value_right").alias("c_value"),
    )


def _q_range_join(spark, sf):
    from data_pengadaan_agent_spark.operators.asof import range_join_bucketed

    purchases, clicks = _split_events(spark, sf)
    out = range_join_bucketed(
        purchases.select("p_id", "user_id", "p_ts"),
        clicks.select("c_id", "user_id", "c_ts"),
        left_ts="p_ts", right_ts="c_ts", by="user_id", max_gap_seconds=600,
    )
    return out.select("p_id", "c_id")


def _q_embedding_normalize(spark, sf):
    emb = load_table(spark, sf, "embeddings").filter(F.col("vec_id") < 100)
    normed = S.l2_normalize_pandas(emb)
    return normed.select(
        "vec_id", F.posexplode("embedding").alias("dim", "v")
    ).select("vec_id", "dim", F.round("v", 6).alias("v"))


def _q_tpch_q4(spark, sf):
    return R.priority_with_late_lines(
        load_table(spark, sf, "orders"), load_table(spark, sf, "lineitem")
    )


def _q_tpch_q12(spark, sf):
    return R.returnflag_priority_mix(
        load_table(spark, sf, "orders"), load_table(spark, sf, "lineitem")
    )


def _q_tpch_q14(spark, sf):
    return R.promo_revenue_share(
        load_table(spark, sf, "part"), load_table(spark, sf, "lineitem")
    )


def _q_tpch_q17(spark, sf):
    return R.small_quantity_revenue(
        load_table(spark, sf, "part"), load_table(spark, sf, "lineitem")
    )


def _q_tpch_q19(spark, sf):
    return R.brand_size_quantity_revenue(
        load_table(spark, sf, "part"), load_table(spark, sf, "lineitem")
    )


def _q_tpch_q22(spark, sf):
    return R.idle_rich_customers(
        load_table(spark, sf, "customer"), load_table(spark, sf, "orders")
    )


def _q_window_cumulative(spark, sf):
    return R.cumulative_revenue(load_table(spark, sf, "orders"))


def _q_window_ntile(spark, sf):
    return R.customer_value_tiles(load_table(spark, sf, "customer"))


def _media(spark, sf):
    from data_pengadaan_agent_spark.operators import multimodal as M

    return M, M.media_from_documents(load_table(spark, sf, "documents"))


def _q_multimodal_resize(spark, sf):
    M, media = _media(spark, sf)
    return M.resize_plan(media).orderBy("media_id")


def _q_multimodal_frames(spark, sf):
    M, media = _media(spark, sf)
    return M.sample_frames(media, every_ms=1000)


def _q_multimodal_features(spark, sf):
    M, media = _media(spark, sf)
    feats = M.extract_image_features(media)
    return feats.select(
        "media_id", F.posexplode("features").alias("dim", "v")
    ).select("media_id", "dim", F.round("v", 6).alias("v"))


def _q_multimodal_audio_chunks(spark, sf):
    M, media = _media(spark, sf)
    return M.chunk_audio(media, chunk_ms=5000)


def _q_text_top_terms(spark, sf):
    return X.top_terms_per_doc(
        load_table(spark, sf, "documents").filter(F.col("doc_id") < 100), k=3
    )


def _q_grouping_sets(spark, sf):
    """Explicit GROUPING SETS (beyond rollup/cube): (status,priority),
    (status), () — Spark expands to one Expand + single aggregation."""
    load_table(spark, sf, "orders").createOrReplaceTempView("_orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n
        FROM _orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
        ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
        """
    )


def _q_null_safe_join(spark, sf):
    """Null-safe equality join (<=> / IS NOT DISTINCT FROM): the NULL
    key group (derived via nullif) matches across sides, which a plain
    equi-join would silently drop. Spark plans eqNullSafe as a normal
    hash join on a null-safe key — no fallback to nested-loop."""
    ev = load_table(spark, sf, "events")
    key = F.expr("nullif(user_id % 50, 0)")
    a = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(key.alias("k"))
        .agg(F.count(F.lit(1)).alias("n_purch"))
    )
    b = (
        ev.filter(F.col("event_type") == "click")
        .groupBy(key.alias("k2"))
        .agg(F.count(F.lit(1)).alias("n_click"))
    )
    return (
        a.join(b, F.col("k").eqNullSafe(F.col("k2")))
        .select("k", "n_purch", "n_click")
        .orderBy(F.col("k").asc_nulls_first())
    )


def _q_unpivot_metrics(spark, sf):
    """UNPIVOT/melt: the Q1 pricing summary turned long — one row per
    (group, metric). Spark plans melt as a single Expand (no join, no
    shuffle beyond the source agg)."""
    wide = R.pricing_summary(load_table(spark, sf, "lineitem"))
    metrics = ["sum_qty", "sum_base_price", "sum_disc_price", "sum_charge"]
    # metric_value stays the RAW double (round-9 determinism audit):
    # the values are exact DECIMAL sums cast to double — bit-identical
    # across engines already (pricing_summary emits them unrounded and
    # is driver-green); a round(double, 2) on top only ADDS the
    # exact-half boundary risk.
    return wide.unpivot(
        ["l_returnflag", "l_linestatus"], metrics, "metric", "metric_value"
    ).orderBy("l_returnflag", "l_linestatus", "metric")


def _q_lateral_topk(spark, sf):
    """LATERAL correlated subquery: for each region, its top-2 nations
    by customer count. Catalyst rewrites the lateral to a ranked
    window join — no per-row re-execution."""
    load_table(spark, sf, "region").createOrReplaceTempView("_region_lat")
    load_table(spark, sf, "nation").createOrReplaceTempView("_nation_lat")
    load_table(spark, sf, "customer").createOrReplaceTempView("_customer_lat")
    return spark.sql(
        """
        SELECT r.r_name, t.n_name, t.n_customers
        FROM _region_lat r,
        LATERAL (
          SELECT n.n_name, count(*) AS n_customers
          FROM _nation_lat n JOIN _customer_lat c ON c.c_nationkey = n.n_nationkey
          WHERE n.n_regionkey = r.r_regionkey
          GROUP BY n.n_name
          ORDER BY n_customers DESC, n.n_name LIMIT 2
        ) t
        ORDER BY r.r_name, t.n_customers DESC, t.n_name
        """
    )


def _q_session_window_native(spark, sf):
    """Native session_window in BATCH mode (same operator the stream
    uses) — the gaps-and-islands `sessionize` query is its SQL twin;
    note the different end semantics (last_event + gap, not max(ts))."""
    ev = load_table(spark, sf, "events")
    out = SW.session_windows_stream(ev, gap="30 minutes")
    return out.select(
        "user_id",
        F.date_format("session_start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format("session_end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        "n_events",
    )


def _q_chart_pie_shares(spark, sf):
    """C3 pie shares in LOCKSTEP with charts.pie_chart_data's fixed
    plan (VERDICT r12 "what's wrong" #1): share via a broadcast
    1-row scalar total, NOT sum() OVER () with no partition keys —
    the certified entry must exercise the exact shape the operator
    ships, and the unpartitioned window single-partitions its input.
    Values (and the driver hash) are unchanged."""
    ev = load_table(spark, sf, "events")
    totals = ev.groupBy("event_type").agg(A.decimal_sum("value").cast("double").alias("total"))
    tot = totals.agg(F.sum("total").alias("_tot"))
    return (
        totals.crossJoin(F.broadcast(tot))
        .select(
            "event_type",
            "total",
            F.round(F.col("total") / F.col("_tot"), 6).alias("share"),
        )
        .orderBy("event_type")
    )


def _q_flagship(spark, sf):
    return _flagship(spark, sf)


# Target language mixture for corpus_mix — LLaMA-style mixing table.
_MIX_WEIGHTS = {"en": 0.4, "es": 0.2, "de": 0.2, "fr": 0.15, "zh": 0.05}


def _q_passage_dedup(spark, sf):
    """Passage-level duplication audit (operators/dedup
    .passage_dedup_stats): 16-token windows, per-doc share of
    passages that also appear in another document."""
    return D.passage_dedup_stats(load_table(spark, sf, "documents"))


def _q_pii_pseudonymize(spark, sf):
    """PII pseudonymization + k-anonymity audit (operators/privacy
    .pseudonymize_customers): md5 names, nation→region and
    balance→bucket generalization, quasi-identifier group sizes."""
    from data_pengadaan_agent_spark.operators.privacy import pseudonymize_customers

    return pseudonymize_customers(
        load_table(spark, sf, "customer"),
        load_table(spark, sf, "nation"),
        load_table(spark, sf, "region"),
    )


def _q_tfidf_top_terms(spark, sf):
    """Per-doc top-3 terms by exact-arithmetic tf·idf
    (operators/textan.tfidf_top_terms)."""
    return X.tfidf_top_terms(load_table(spark, sf, "documents"))


def _q_corpus_mix(spark, sf):
    """Weighted language mixing (operators/sampling.corpus_mix):
    deterministic downsample to the target mixture."""
    from data_pengadaan_agent_spark.operators.sampling import corpus_mix

    docs = load_table(spark, sf, "documents").select("doc_id", "lang", "source")
    return corpus_mix(docs, _MIX_WEIGHTS)


def _q_quantile_band(spark, sf):
    """Quantile-band length filter (operators/sampling.quantile_band):
    keep docs inside the [p05, p95] discrete-quantile n_chars band."""
    from data_pengadaan_agent_spark.operators.sampling import quantile_band

    docs = load_table(spark, sf, "documents").select("doc_id", "lang", "n_chars")
    return quantile_band(docs, "n_chars")


# Deny-list for the span-level scrub demo — stand-ins for PII classes
# (the fixture text is synthetic tokens; real deployments pass email /
# phone / id regex classes through the same pattern argument).
_SCRUB_TERMS = ("customer", "vector", "stream")


def _q_shuffle_shard(spark, sf):
    """Deterministic training-order shuffle + 8-way sharding
    (operators/sampling.shuffle_shard)."""
    from data_pengadaan_agent_spark.operators.sampling import shuffle_shard

    docs = load_table(spark, sf, "documents").select("doc_id", "lang")
    return shuffle_shard(docs, n_shards=8)


def _q_scrub_terms(spark, sf):
    """Span-level deny-list redaction + counts
    (operators/privacy.scrub_terms)."""
    from data_pengadaan_agent_spark.operators.privacy import scrub_terms

    return scrub_terms(load_table(spark, sf, "documents"), _SCRUB_TERMS)


def _q_mode_per_group(spark, sf):
    """Per-language dominant source with pinned tie-break
    (operators/aggregates.mode_per_group)."""
    return A.mode_per_group(load_table(spark, sf, "documents"), "lang", "source")


def _q_dsir_importance(spark, sf):
    """DSIR importance resampling (operators/textan.dsir_importance,
    arith-hash twin): raw pool = doc_id%10!=0, target corpus =
    doc_id%10==0 — 'select raw docs that read like the held-out
    slice'. ROUND-7 REGISTRATION CANDIDATE: implemented, oracle-built
    and pytest-value-checked this round, but NOT registered because
    round 6's rotation gate window is exactly full (48 r3-stale + 2
    new entries = 50); registering it now would push a stale entry
    out of the window."""
    docs = load_table(spark, sf, "documents")
    raw = docs.filter(F.col("doc_id") % 10 != 0)
    target = docs.filter(F.col("doc_id") % 10 == 0)
    return X.dsir_importance(
        raw, target, n=2, n_buckets=4096, keep_frac=0.5, arith_hash=True
    )


def _dsir_sql() -> str:
    """DuckDB twin of _q_dsir_importance (poly-hash buckets, add-1
    smoothing, DECIMAL(28,9)-exact score sums, median threshold)."""
    poly = _DUCK_POLY.format(s="g", mult=131)
    return f"""
        WITH rawd AS (
          SELECT doc_id, text FROM documents WHERE doc_id % 10 <> 0
        ), tgtd AS (
          SELECT text FROM documents WHERE doc_id % 10 = 0
        ), rg AS (
          SELECT doc_id,
                 unnest(list_transform(range(1, len(ws)),
                        i -> array_to_string(ws[i:i+1], ' '))) AS g
          FROM (SELECT doc_id,
                       string_split_regex(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+') AS ws
                FROM rawd)
          WHERE len(ws) >= 2
        ), tg AS (
          SELECT unnest(list_transform(range(1, len(ws)),
                        i -> array_to_string(ws[i:i+1], ' '))) AS g
          FROM (SELECT string_split_regex(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+') AS ws
                FROM tgtd)
          WHERE len(ws) >= 2
        ), rb AS (
          SELECT doc_id, ({poly}) % 4096 AS b FROM rg
        ), tb AS (
          SELECT ({poly}) % 4096 AS b FROM tg
        ), ct AS (
          SELECT b, count(*) AS c FROM tb GROUP BY 1
        ), cr AS (
          SELECT b, count(*) AS c FROM rb GROUP BY 1
        ), m AS (
          SELECT coalesce(ct.b, cr.b) AS b,
                 coalesce(ct.c, 0) AS ct, coalesce(cr.c, 0) AS cr
          FROM ct FULL OUTER JOIN cr ON ct.b = cr.b
        ), tot AS (
          SELECT sum(ct) AS tt, sum(cr) AS tr FROM m
        ), lrt AS (
          SELECT b,
                 CAST(round(ln((ct + 1.0) / (tt + 4096.0))
                            - ln((cr + 1.0) / (tr + 4096.0)), 9)
                      AS DECIMAL(28,9)) AS lr
          FROM m, tot
        ), sc AS (
          SELECT rb.doc_id, count(*) AS nf, sum(lr) AS s
          FROM rb JOIN lrt USING (b) GROUP BY 1
        ), a AS (
          SELECT doc_id, nf, CAST(s AS DOUBLE) / nf AS avg FROM sc
        ), thr AS (
          SELECT quantile_cont(avg, 0.5) AS t FROM a
        )
        SELECT doc_id, CAST(nf AS BIGINT) AS n_feats,
               round(avg, 6) AS avg_log_ratio, avg >= t AS keep
        FROM a, thr
    """


def _q_quality_classifier(spark, sf):
    """Supervised document-quality gate (operators/textan.
    train_quality_weights + quality_classifier, arith-hash twin): the
    CCNet/RedPajama 'quality classifier' slot — Naive-Bayes log-odds
    weights trained on doc_id%10==0 (positive) vs doc_id%10==1
    (negative) slices, applied to the WHOLE corpus with an absolute
    threshold 0. ROUND-8 registration candidate (round 7's window is
    committed to the three round-6 candidates)."""
    docs = load_table(spark, sf, "documents")
    pos = docs.filter(F.col("doc_id") % 10 == 0)
    neg = docs.filter(F.col("doc_id") % 10 == 1)
    w = X.train_quality_weights(
        pos, neg, n=2, n_buckets=4096, arith_hash=True
    )
    return X.quality_classifier(
        docs, w, n=2, n_buckets=4096, threshold=0.0, arith_hash=True
    )


def _quality_classifier_sql() -> str:
    """DuckDB twin of _q_quality_classifier (poly-hash buckets, add-1
    smoothing, DECIMAL(28,9) weights, OOV buckets contribute exact
    weight 0 but count toward n_feats)."""
    poly = _DUCK_POLY.format(s="g", mult=131)
    return f"""
        WITH bg AS (
          SELECT doc_id,
                 unnest(list_transform(range(1, len(ws)),
                        i -> array_to_string(ws[i:i+1], ' '))) AS g
          FROM (SELECT doc_id,
                       string_split_regex(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+') AS ws
                FROM documents)
          WHERE len(ws) >= 2
        ), db AS (
          SELECT doc_id, ({poly}) % 4096 AS b FROM bg
        ), cp AS (
          SELECT b, count(*) AS c FROM db WHERE doc_id % 10 = 0 GROUP BY 1
        ), cn AS (
          SELECT b, count(*) AS c FROM db WHERE doc_id % 10 = 1 GROUP BY 1
        ), m AS (
          SELECT coalesce(cp.b, cn.b) AS b,
                 coalesce(cp.c, 0) AS cp, coalesce(cn.c, 0) AS cn
          FROM cp FULL OUTER JOIN cn ON cp.b = cn.b
        ), tot AS (
          SELECT sum(cp) AS tp, sum(cn) AS tn FROM m
        ), wt AS (
          SELECT b,
                 CAST(round(ln((cp + 1.0) / (tp + 4096.0))
                            - ln((cn + 1.0) / (tn + 4096.0)), 9)
                      AS DECIMAL(28,9)) AS w
          FROM m, tot
        ), sc AS (
          SELECT db.doc_id, count(*) AS nf,
                 sum(coalesce(wt.w, CAST(0 AS DECIMAL(28,9)))) AS s
          FROM db LEFT JOIN wt USING (b) GROUP BY 1
        )
        SELECT doc_id, CAST(nf AS BIGINT) AS n_feats,
               round(CAST(s AS DOUBLE) / nf, 6) AS logit,
               CAST(s AS DOUBLE) / nf >= 0.0 AS keep
        FROM sc
    """


def _q_decontaminate_semantic(spark, sf):
    """Semantic decontamination (operators/similarity.
    decontaminate_semantic): benchmark = vec_id%10==0 embeddings,
    training pool = the rest PLUS planted ×1.01-scaled copies of every
    benchmark vector (vec_id+1_000_000) — the paraphrased-benchmark
    leakage the lexical decontaminate_train gate cannot see. The
    planted copies are cosine-1.0 contamination by construction;
    organic cross-pool matches appear at the 0.35 threshold. ROUND-8
    registration candidate."""
    emb = load_table(spark, sf, "embeddings")
    bench = emb.select("vec_id", "embedding").filter(F.col("vec_id") % 10 == 0)
    organic = (
        emb.filter(F.col("vec_id") % 10 != 0)
        .select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    )
    planted = bench.select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform(
            "embedding", lambda x: x.cast("double") * F.lit(1.01)
        ).alias("embedding"),
    )
    train = organic.unionByName(planted)
    return S.decontaminate_semantic(
        train, bench, "embedding", dim=64, threshold=0.35
    )


def _q_bm25_retrieval_batch(spark, sf):
    """Batched BM25 retrieval (operators/textan.bm25_retrieval_batch):
    queries = every doc_id%50==0 document's first three tokens, run
    against the whole corpus, top-5 per query — the lexical
    hard-negative miner (DPR's "BM25 negatives" step) and the
    many-query form of bm25_retrieval. ROUND-8/9 registration
    candidate."""
    docs = load_table(spark, sf, "documents")
    queries = docs.filter(F.col("doc_id") % 50 == 0).select(
        F.col("doc_id").alias("qid"),
        F.slice(X.tokens("text"), 1, 3).alias("terms"),
    )
    return X.bm25_retrieval_batch(queries, docs, k=5)


def _bm25_retrieval_batch_sql(k: int = 5, tail: str | None = None) -> str:
    """DuckDB twin of _q_bm25_retrieval_batch: integer-proxy idf and
    the EXACT-INTEGER contribution (round-9 determinism fix — the old
    round(double, 6) form hash-failed on a representation-boundary
    value in the driver environment). With k1=1.5, b=0.75 the
    fraction-cleared form is contrib = (idf·20·tf·sdl) //
    (8·tf·sdl + 3·sdl + 9·dl·n) — every term integer, widened through
    HUGEINT, one integer division, zero rounding; summed exactly, same
    (score DESC, id) ranking.

    Round-10 hardening (driver-red twice with identical local green):
    the final bm25 is CAST to BIGINT on both engines — the integer
    division bounds each contribution by (k1+1)·n·10^6, int64-safe at
    every SF, and the decimal(38,0) output was the single construct
    unique to this query across both red rounds (different Arrow
    stacks serialize decimal128 ambiguously; int64 is one encoding).
    The query CTE also drops the version-sensitive list slice
    toks[1:3] for a zipped parallel-unnest ordinality filter (i < 3),
    matching Spark's F.slice(toks, 1, 3) semantics explicitly.

    ``tail`` swaps the final SELECT; the components-probe twin emits
    the raw per-(qid, doc, term) BIGINT components from the SAME c
    CTE the score sum consumes (the one-construction-site rule the
    Spark side follows via _bm25_contrib_frame)."""
    return f"""
WITH d AS (
  SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents
),
q AS (
  SELECT qid, t FROM (
    SELECT doc_id AS qid, unnest(toks) AS t, unnest(range(len(toks))) AS i
    FROM d WHERE doc_id % 50 = 0
  ) WHERE i < 3
),
posts AS (
  SELECT d.doc_id, u.t, len(d.toks) AS dl
  FROM d, unnest(d.toks) AS u(t)
  WHERE u.t IN (SELECT DISTINCT t FROM q)
),
tf AS (
  SELECT doc_id, t, CAST(count(*) AS BIGINT) AS tf,
         CAST(min(dl) AS BIGINT) AS dl
  FROM posts GROUP BY 1, 2
),
dfreq AS (SELECT t, CAST(count(*) AS BIGINT) AS dft FROM tf GROUP BY 1),
stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(len(toks)) AS BIGINT) AS sdl
  FROM d
),
c AS (
  SELECT q.qid, tf.doc_id, tf.t, tf.tf, tf.dl, dfreq.dft, stats.n, stats.sdl,
         (CAST((n * 1000000) // greatest(dft, 1) AS HUGEINT)
          * 20 * tf.tf * sdl)
         //
         (CAST(8 AS HUGEINT) * tf.tf * sdl
          + CAST(3 AS HUGEINT) * sdl
          + CAST(9 AS HUGEINT) * tf.dl * n) AS c
  FROM tf
  JOIN q ON q.t = tf.t
  JOIN dfreq ON dfreq.t = tf.t
  CROSS JOIN stats
),
s AS (SELECT qid, doc_id, CAST(sum(c) AS BIGINT) AS bm25 FROM c GROUP BY 1, 2),
r AS (
  SELECT qid, doc_id, bm25,
         row_number() OVER (PARTITION BY qid ORDER BY bm25 DESC, doc_id) AS rk
  FROM s
)
{tail if tail is not None else
 f"SELECT qid, doc_id, bm25, CAST(rk AS INT) AS rank FROM r WHERE rk <= " + str(k)}
"""


def _q_bm25_components_probe(spark, sf):
    """Driver-red localization probe (VERDICT r9 What's-wrong #1.iii,
    staged as the r11 contingency): the RAW BIGINT components of the
    bm25_retrieval_batch contribution for the doc_id%500==0 slice —
    (qid, doc_id, t, tf, dl, df, n_docs, sum_dl, contrib). Shares
    textan._bm25_contrib_frame with the batch operator and the twin's
    own c CTE, so driver green/red on this row bisects the batch
    query: probe green + batch red => sum/rank/output stage; probe
    red => the differing component column. ROUND-11 CONTINGENCY
    candidate — register only if bm25_retrieval_batch reds in r10."""
    docs = load_table(spark, sf, "documents")
    queries = docs.filter(F.col("doc_id") % 50 == 0).select(
        F.col("doc_id").alias("qid"),
        F.slice(X.tokens("text"), 1, 3).alias("terms"),
    )
    return X.bm25_components_probe(queries, docs, doc_mod=500)


_BM25_PROBE_TAIL = """
SELECT qid, doc_id, t, tf, CAST(dl AS BIGINT) AS dl,
       CAST(dft AS BIGINT) AS df, CAST(n AS BIGINT) AS n_docs,
       CAST(sdl AS BIGINT) AS sum_dl, CAST(c AS BIGINT) AS contrib
FROM c WHERE doc_id % 500 = 0
"""


def _q_mine_hard_negatives(spark, sf):
    """Hard-negative mining (operators/similarity.mine_hard_negatives):
    queries = vec_id%20==0 embeddings, corpus = ALL embeddings, gold =
    each query's own corpus row plus its vec_id+1 neighbor (the
    labeled-positive pairs a contrastive trainer already has). Top-5
    non-gold cosine neighbors per query, rank 1 = hardest negative.
    ROUND-8 registration candidate."""
    emb = load_table(spark, sf, "embeddings")
    queries = emb.filter(F.col("vec_id") % 20 == 0).select(
        "vec_id", "embedding"
    )
    gold = queries.select(
        F.col("vec_id").alias("qid"), F.col("vec_id").alias("gold_id")
    ).unionByName(
        queries.select(
            F.col("vec_id").alias("qid"),
            (F.col("vec_id") + 1).alias("gold_id"),
        )
    )
    return S.mine_hard_negatives(
        queries, emb.select("vec_id", "embedding"), gold, k=5
    )


def _mine_hard_negatives_sql(k: int = 5) -> str:
    """DuckDB twin of _q_mine_hard_negatives: full query×corpus cosine
    (the exact baseline — queries are a 1/20 slice, so the cross
    product is |emb|²/20 rows at oracle SFs), identical gold
    exclusion, identical (round(sim,6) DESC, neg_id ASC) ranking."""
    norm = "CASE WHEN sqrt(list_sum(list_transform({v}, x -> x * x))) = 0 THEN 1.0 ELSE sqrt(list_sum(list_transform({v}, x -> x * x))) END"
    return f"""
WITH q AS (
  SELECT vec_id AS qid, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
  FROM embeddings WHERE vec_id % 20 = 0
),
c AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
  FROM embeddings
),
gold AS (
  SELECT vec_id AS qid, vec_id AS did FROM embeddings WHERE vec_id % 20 = 0
  UNION ALL
  SELECT vec_id, vec_id + 1 FROM embeddings WHERE vec_id % 20 = 0
),
p AS (
  SELECT q.qid, c.vec_id AS neg_id,
         round(list_sum(list_transform(list_zip(q.qv, c.cv), x -> x[1] * x[2]))
               / ({norm.format(v='q.qv')} * {norm.format(v='c.cv')}), 6) AS sim
  FROM q CROSS JOIN c
  WHERE NOT EXISTS (SELECT 1 FROM gold g
                    WHERE g.qid = q.qid AND g.did = c.vec_id)
),
r AS (
  SELECT qid, neg_id, sim,
         row_number() OVER (PARTITION BY qid ORDER BY sim DESC, neg_id) AS rk
  FROM p
)
SELECT qid, neg_id, sim, CAST(rk AS INT) AS rank FROM r WHERE rk <= {k}
"""


def _decontaminate_semantic_sql(
    dim: int = 64,
    bands: int = 8,
    ppb: int = 8,
    seed: int = 42,
    threshold: float = 0.35,
) -> str:
    """DuckDB twin of _q_decontaminate_semantic: same hyperplane
    codebook literals, cross-corpus (band, sig) candidate join, exact
    cosine verify, left-joined per-train verdict."""
    from data_pengadaan_agent_spark.operators.similarity import _hyperplanes

    planes = _vec_values_sql(_hyperplanes(dim, bands * ppb, seed))
    return f"""
WITH planes(pid, pv) AS (VALUES {planes}),
train0 AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings WHERE vec_id % 10 <> 0
  UNION ALL
  SELECT vec_id + 1000000,
         list_transform(embedding, x -> CAST(x AS DOUBLE) * 1.01)
  FROM embeddings WHERE vec_id % 10 = 0
),
bench0 AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings WHERE vec_id % 10 = 0
),
tsig AS (
  SELECT t.vec_id, CAST(p.pid // {ppb} AS INT) AS band,
         string_agg(CASE WHEN list_sum(list_transform(list_zip(t.v, p.pv),
                        x -> x[1] * x[2])) >= 0
                    THEN '1' ELSE '0' END, '' ORDER BY p.pid) AS sig
  FROM train0 t CROSS JOIN planes p GROUP BY t.vec_id, p.pid // {ppb}
),
bsig AS (
  SELECT b.vec_id, CAST(p.pid // {ppb} AS INT) AS band,
         string_agg(CASE WHEN list_sum(list_transform(list_zip(b.v, p.pv),
                        x -> x[1] * x[2])) >= 0
                    THEN '1' ELSE '0' END, '' ORDER BY p.pid) AS sig
  FROM bench0 b CROSS JOIN planes p GROUP BY b.vec_id, p.pid // {ppb}
),
cand AS (
  SELECT DISTINCT t.vec_id AS tid, b.vec_id AS bid
  FROM tsig t JOIN bsig b ON t.band = b.band AND t.sig = b.sig
),
p AS (
  SELECT tid,
         list_sum(list_transform(list_zip(t.v, b.v), x -> x[1] * x[2]))
         / (CASE WHEN sqrt(list_sum(list_transform(t.v, x -> x * x))) = 0
                 THEN 1.0 ELSE sqrt(list_sum(list_transform(t.v, x -> x * x))) END
            * CASE WHEN sqrt(list_sum(list_transform(b.v, x -> x * x))) = 0
                   THEN 1.0 ELSE sqrt(list_sum(list_transform(b.v, x -> x * x))) END)
         AS sim
  FROM cand JOIN train0 t ON t.vec_id = cand.tid
            JOIN bench0 b ON b.vec_id = cand.bid
),
hits AS (
  SELECT tid, CAST(count(*) AS BIGINT) AS nm, max(sim) AS mx
  FROM p WHERE sim >= {threshold} GROUP BY 1
)
SELECT t.vec_id, CAST(coalesce(nm, 0) AS BIGINT) AS n_bench_matches,
       round(mx, 4) AS max_sim, hits.tid IS NOT NULL AS contaminated
FROM train0 t LEFT JOIN hits ON t.vec_id = hits.tid
"""


def _q_dedup_near_batch(spark, sf):
    """Near-dup ingest dedup, BATCH twin of streaming_dedup_near
    (streaming/windows.py) with the arith (SQL-replicable) signature:
    documents plus a planted near-dup replay (doc_id%31==0, one token
    appended, ingested 60 s after its original) — per (window, doc)
    the count of band keys it claimed FIRST and the is_original
    verdict. ROUND-7 REGISTRATION CANDIDATE (window full this round —
    see _q_dsir_importance); the STREAMING path of the same callable
    is pinned by the trigger-ordered pytest, and only the batch rank-1
    form is oracle-comparable because the streaming first-claimant is
    arrival-order dependent within a micro-batch."""
    docs = load_table(spark, sf, "documents")
    # epoch from length(text), NOT the n_chars column, so the SQL twin
    # can recompute it without trusting fixture redundancy
    epoch = F.lit(1704067200) + F.pmod(
        F.length("text").cast("long") * F.lit(2654435761), F.lit(3600)
    )
    base = docs.select(
        "doc_id", "text", F.timestamp_seconds(epoch).alias("ingest_ts")
    )
    near = docs.filter(F.col("doc_id") % 31 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zz")).alias("text"),
        F.timestamp_seconds(epoch + F.lit(60)).alias("ingest_ts"),
    )
    out = SW.streaming_dedup_near(
        base.unionByName(near),
        n_hashes=16,
        bands=8,
    )
    return out.select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm").alias("window_start"),
        "doc_id",
        "n_first_bands",
        "is_original",
    )


def _dedup_near_sql() -> str:
    """DuckDB twin of _q_dedup_near_batch: poly-hash + LCG minhash
    signatures, 8 band-fold keys, rank-1 per (band, bucket) by
    (ingest time, doc id), per-(window, doc) surviving-band counts."""
    from data_pengadaan_agent_spark.operators.dedup import P31, _lcg_coeffs

    coeffs = _lcg_coeffs(16, 1234567)
    poly = _DUCK_POLY.format(s="s", mult=131)
    mins = ",\n".join(
        f"min((x * {a} + {b}) % {P31}) AS h{i}"
        for i, (a, b) in enumerate(coeffs)
    )
    band_rows = "\nUNION ALL\n".join(
        f"SELECT doc_id, ts, {j} AS band, "
        f"((h{2 * j} * 1000003) + h{2 * j + 1}) % {P31} AS bucket FROM sig"
        for j in range(8)
    )
    return f"""
        WITH u AS (
          SELECT doc_id, text,
                 1704067200 + (length(text) * 2654435761) % 3600 AS e
          FROM documents
          UNION ALL
          SELECT doc_id + 1000000, text || ' zz',
                 1704067260 + (length(text) * 2654435761) % 3600
          FROM documents WHERE doc_id % 31 = 0
        ), t AS (
          SELECT doc_id, e AS ts,
                 string_split_regex(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+') AS ws
          FROM u
        ), sh AS (
          SELECT doc_id, ts,
                 unnest(list_distinct(list_transform(
                   range(1, greatest(len(ws) - 2, 1) + 1),
                   i -> array_to_string(ws[i:i+2], ' ')))) AS s
          FROM t
        ), xs AS (
          SELECT doc_id, ts, {poly} AS x FROM sh
        ), sig AS (
          SELECT doc_id, ts,
                 {mins}
          FROM xs GROUP BY doc_id, ts
        ), bk AS (
          {band_rows}
        ), ranked AS (
          SELECT doc_id, ts, band, bucket,
                 row_number() OVER (PARTITION BY band, bucket
                                    ORDER BY ts, doc_id) AS rn
          FROM bk
        )
        SELECT strftime(make_timestamp(((ts // 600) * 600) * 1000000),
                        '%Y-%m-%d %H:%M') AS window_start,
               doc_id,
               CAST(count(*) AS BIGINT) AS n_first_bands,
               count(*) = 8 AS is_original
        FROM ranked WHERE rn = 1
        GROUP BY 1, 2
    """


def _q_dedup_passages(spark, sf):
    """Passage-level dedup with document reassembly
    (operators/dedup.dedup_passages) over documents plus two planted
    regimes: full replays of doc_id%11==0 (ids +1000000 — fully
    suppressed to empty rows) and chimera docs (ids +2000000) whose
    first 16 tokens copy a doc_id%13==0 source and whose tail is
    unique per chimera (doc-id-stamped) — exactly the head passage
    drops when the source had ≥16 tokens. REGISTRY CANDIDATE — per
    tools/plan_rotation.py all three candidates fit round 7's gate
    window alongside the limit_preview/histogram_month_of_year
    retirements (must-check 49/50)."""
    docs = load_table(spark, sf, "documents").select("doc_id", "text")
    toks = F.split(F.lower(F.trim(F.col("text"))), r"[ \t\n\x0B\f\r]+")
    replay = docs.filter(F.col("doc_id") % 11 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    chimera = docs.filter(F.col("doc_id") % 13 == 0).select(
        (F.col("doc_id") + 2000000).alias("doc_id"),
        F.concat(
            F.concat_ws(" ", F.slice(toks, 1, 16)),
            F.lit(" planted tail marker doc "),
            F.col("doc_id").cast("string"),
        ).alias("text"),
    )
    return D.dedup_passages(
        docs.unionByName(replay).unionByName(chimera), window=16
    )


def _dedup_passages_sql() -> str:
    """DuckDB twin of _q_dedup_passages: raw-passage first-occurrence
    vote (also guards the Spark side's xxhash64 keying against
    collisions), ordered string_agg reassembly."""
    return r"""
        WITH u AS (
          SELECT doc_id, text FROM documents
          UNION ALL
          SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 11 = 0
          UNION ALL
          SELECT doc_id + 2000000,
                 array_to_string(
                   string_split_regex(lower(trim(text)), '[ \t\n\x0B\f\r]+')[1:16], ' ')
                 || ' planted tail marker doc ' || CAST(doc_id AS VARCHAR)
          FROM documents WHERE doc_id % 13 = 0
        ), t AS (
          SELECT doc_id,
                 string_split_regex(lower(trim(text)), '[ \t\n\x0B\f\r]+') AS ws
          FROM u
        ), p AS (
          SELECT doc_id, CAST(i AS BIGINT) AS idx,
                 array_to_string(ws[(1 + i*16):(i*16 + 16)], ' ') AS passage
          FROM t, UNNEST(range(CAST(ceil(greatest(len(ws), 1)/16.0)
                                    AS BIGINT))) AS un(i)
        ), r AS (
          SELECT doc_id, idx, passage,
                 row_number() OVER (PARTITION BY passage
                                    ORDER BY doc_id, idx) AS rn
          FROM p
        )
        SELECT doc_id,
               coalesce(string_agg(passage, ' ' ORDER BY idx)
                          FILTER (WHERE rn = 1), '') AS text,
               CAST(count(*) AS BIGINT) AS n_passages,
               CAST(count(*) FILTER (WHERE rn = 1) AS BIGINT) AS n_kept
        FROM r GROUP BY doc_id
    """


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Registry ordered STALEST-FIRST from ROTATION.json (generated by
    ``tools/update_rotation.py`` from the driver's CORRECTNESS_r*.json
    files): entries never driver-checked lead, then ascending
    last-driver-green round, ties broken by registration order in
    ``_query_impls``. The driver gate checks the first ~50 registered
    entries per round, so this ordering is what keeps every entry's
    hard signal ≤2 rounds old (148 entries / 50-entry window → each
    check must buy 3 rounds of freshness; 148/3 ≈ 49.3 ≤ 50 — at the
    feasibility EDGE: the registry hard cap is 150, enforced by the
    driver-contract test, and past it tier-3 entries must be retired)
    without per-round hand-reordering. Enforced by
    ``tests/test_driver_contract.py::test_rotation_manifest_current``.

    Rotation-priority tiers (VERDICT r4 #7 — if the gate window ever
    shrinks, drop freshness for tier-3 entries first):
      tier 1 (load-bearing semantics): the §2 reference surface
        (flagship/filters/aggregates/charts/topk), corpus_pipeline,
        corpus_ingest_stream*, dedup_exact, minhash_lsh_pairs,
        sim_topk_brute, text_* core, stratified_sample;
      tier 2 (distinct algorithms): TPC-H 22, windows, as-of/range/
        bucketed joins, simhash, dedup_clusters, IVF/LSH probes,
        kmeans, streaming windows, privacy, sampling/mixing,
        boilerplate_ngrams, snapshot_diff, cross_source_overlap,
        embedding_qa, prototypicality, semdedup_prune, corpus_report;
      tier 3 (variants/supersets of tier-1/2 entries):
        *_precomputed probes, embedding_cosine_allpairs (capped exact
        baseline of embedding_cosine_pairs), duplicate_groups
        (superset of dedup_exact), session_window_native (twin of
        sessionize), limit_preview, histogram_month_of_year,
        length_outliers (continuous-percentile twin of quantile_band).

    Round 6 retired six tier-3 entries from the driver gate
    (``_RETIRED_TIER3`` — VERDICT r5 ask #2, the 148/150 capacity
    crunch); they remain implemented, exported via
    ``retired_queries()``/``retired_oracle_sql()``, and value-checked
    on every pytest run with the driver's own comparison.
    """
    impls = {
        k: v for k, v in _query_impls().items() if k not in _RETIRED_TIER3
    }
    try:
        import json as _json
        import os as _os

        _repo = _os.path.dirname(_os.path.abspath(__file__))
        with open(_os.path.join(_repo, "ROTATION.json")) as f:
            last_green = _json.load(f)["last_green"]
    except (OSError, KeyError, ValueError):  # pragma: no cover
        return impls
    names = list(impls)
    order = sorted(range(len(names)), key=lambda i: last_green.get(names[i], 0))
    return {names[i]: impls[names[i]] for i in order}


def _query_impls() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """All registered queries, NEWEST ROUND FIRST (each round prepends
    its section — the convention since round 4). The rotation sort is
    keyed on last_green alone, so dict order only breaks ties WITHIN a
    round cohort; entries green in the same round age together, and
    ``test_rotation_manifest_current``'s overflow assert fails loudly
    if any tiebreak ever pushes a must-check entry out of the gate
    window — the invariant is the assert, not the dict order."""
    return {
        # --- NEW in round 14 (promoted from candidate_queries(); the
        # EXPANDED 7-in/7-out triage written and simulator-verified in
        # round 13 — NOTES.md "r14 registration triage" — funded by
        # retiring window_cumulative + mode_per_group + pivot_counts +
        # percentiles + embedding_normalize + tpch_q12_priority_mix +
        # tpch_q14_promo_share from r14's due set, see _RETIRED_TIER3.
        # Each new row hashes a family no registered entry covers:
        # incremental graph connectivity (large-star/small-star ≡ the
        # recursive-CTE closure), the Bloom fill/FPP audit STATE, the
        # Count-Min sketch STATE + point estimates, KMV sketch-domain
        # set algebra (union/intersection overlap from two sketches),
        # length-bounded PassJoin fuzzy edit-distance pairs, the
        # deterministic lossy-counting heavy-hitter sweep, and
        # mergeable-histogram quantile interpolation.) ---
        "incremental_components": _q_incremental_components,
        "bloom_fill_report": _q_bloom_fill_report,
        "cms_freq": _q_cms_freq,
        "kmv_overlap": _q_kmv_overlap,
        "fuzzy_dup_pairs": _q_fuzzy_dup_pairs,
        "heavy_hitters": _q_heavy_hitters,
        "hist_quantiles": _q_hist_quantiles,
        # --- NEW in round 13 (promoted from candidate_queries(); the
        # 5-in/5-out triage written and simulator-verified in round 12
        # — NOTES.md "r13 registration triage" — funded by retiring
        # bm25_retrieval_batch + winnow_fingerprints + activity_heatmap
        # + sim_topk_lsh + sim_topk_ivf from r13's due set, see
        # _RETIRED_TIER3. Each new row hashes a family no registered
        # entry covers: the KMV bottom-k sketch STATE + its estimate,
        # the declarative DQ rule-report aggregate, degree-ordered
        # triangle counting, the z-order + zonemap file-pruned scan
        # (literal survivor paths ≡ full scan), and the leakage-free
        # SCD2 point-in-time read with the zero-duration tiebreak.) ---
        "kmv_distinct": _q_kmv_distinct,
        "dq_report": _q_dq_report,
        "graph_triangles": _q_graph_triangles,
        "zorder_zonemap_scan": _q_zorder_zonemap_scan,
        "pit_join": _q_pit_join,
        # --- NEW in round 12 (promoted from candidate_queries(); the
        # 2-in/1-out triage written and simulator-verified in round 11
        # — NOTES.md "Round 12 registration triage" — paired with
        # retiring lateral_topk from r12's due set, see _RETIRED_TIER3.
        # ivfpq_adc_batch hashes the union-of-probed-lists literal
        # PartitionFilter, the per-qid probe ranking, the per-
        # (qid, list) residual LUT selection AND the partition-cut
        # batch kernel in one row (its |Q|=1 and flat-geometry special
        # cases ivfpq_adc_topk / pq_adc_batch stay candidates);
        # ann_ingest_stream_codes is the streaming IVF-PQ append
        # contract — no other row hashes a foreachBatch sink writing
        # into a frozen-geometry ANN index.) ---
        "ivfpq_adc_batch": _q_ivfpq_adc_batch,
        "ann_ingest_stream_codes": _q_ann_ingest_stream_codes,
        # --- ALSO NEW in round 12 (the backlog-drain wave VERDICT r11
        # ask #2 called for — funded by retiring text_top_terms +
        # sample_per_group, both in r12's due set, see _RETIRED_TIER3.
        # The two strongest candidates from the r13 shortlist, pulled
        # forward: each is the semantic-twin class where one green row
        # certifies an entire index family — trgm_search's twin is the
        # DIRECT contains() scan (candidate superset lossless by the
        # gram-containment argument), bloom_new_rows' twin the DIRECT
        # fingerprint anti-join (only the maybe-sliver ever reaches
        # the exact check; words-first crash ordering forbids false
        # negatives).) ---
        "trgm_search": _q_trgm_search,
        "bloom_new_rows": _q_bloom_new_rows,
        # --- NEW in round 11 (promoted from candidate_queries(); the
        # 4-in/3-out triage written and simulator-verified in round 10
        # — NOTES.md "Round 11 registration triage" — paired with
        # retiring length_outliers + bm25_retrieval + corpus_mix from
        # r11's due set, see _RETIRED_TIER3. Each carries an algorithm
        # family no other registered entry hashes: the Lee et al.
        # occurrence-aggregate + gap-merge shape, the maintained
        # gram-count index read path, the partition-pruned postings
        # query ≡ from-scratch equality, and the shared-template BPE
        # merge fold.) ---
        "dup_spans": _q_dup_spans,
        "dup_spans_incremental": _q_dup_spans_incremental,
        "bm25_index_retrieval": _q_bm25_index_retrieval,
        "bpe_merges": _q_bpe_merges,
        # --- NEW in round 10 (promoted from candidate_queries(); the
        # 2-in/2-out plan pre-verified at end of round 9 with
        # tools/plan_rotation.py — paired with retiring
        # minhash_lsh_pairs + corpus_ingest_stream from r10's due set,
        # see _RETIRED_TIER3) ---
        "winnow_fingerprints": _q_winnow_fingerprints,
        "winnow_matches": _q_winnow_matches,
        # --- NEW in round 9 (promoted from candidate_queries(); the
        # 4-in/4-out registration plan pre-verified in round 8 with
        # tools/plan_rotation.py — each pairs with one retirement from
        # r9's due set, see _RETIRED_TIER3) ---
        "ngram_lm_score": _q_ngram_lm_score,
        "scd2_history": _q_scd2_history,
        "ivf_drift_report": _q_ivf_drift_report,
        "mmr_diversify": _q_mmr_diversify,
        # --- NEW in round 8 (promoted from candidate_queries(); the
        # registration plan pre-computed in round 7 — VERDICT r7 ask
        # #1: all five fit the 50-entry gate window exactly) ---
        "quality_classifier": _q_quality_classifier,
        "decontaminate_semantic": _q_decontaminate_semantic,
        "mine_hard_negatives": _q_mine_hard_negatives,
        "corpus_ingest_stream_scored": _q_corpus_ingest_stream_scored,
        "bm25_retrieval_batch": _q_bm25_retrieval_batch,
        # --- NEW in round 7 (promoted from candidate_queries(); the
        # registration plan pre-computed in round 6 — see NOTES.md and
        # tools/plan_rotation.py) ---
        "dsir_importance": _q_dsir_importance,
        "dedup_near_batch": _q_dedup_near_batch,
        "dedup_passages": _q_dedup_passages,
        # --- NEW in round 6 ---
        "semdedup_greedy": _q_semdedup_greedy,
        "trending_terms_append": _q_trending_terms_append,
        # --- NEW in round 5 (second wave) ---
        "corpus_report": _q_corpus_report,
        "prototypicality": _q_prototypicality,
        "semdedup_prune": _q_semdedup_prune,
        "boilerplate_ngrams": _q_boilerplate_ngrams,
        "length_outliers": _q_length_outliers,
        "snapshot_diff": _q_snapshot_diff,
        "cross_source_overlap": _q_cross_source_overlap,
        "embedding_qa": _q_embedding_qa,
        # --- NEW in round 5 ---
        "corpus_ingest_stream_ttl": _q_corpus_ingest_stream_ttl,
        "ann_recall_lsh_ivf": _q_ann_recall,
        "bm25_retrieval": _q_bm25_retrieval,
        "corpus_mix_tokens": _q_corpus_mix_tokens,
        "cluster_representatives": _q_cluster_representatives,
        "token_rarity": _q_token_rarity,
        "decontaminate_train": _q_decontaminate_train,
        "trending_terms_stream": _q_trending_terms_stream,
        # --- NEW in round 4 (never driver-checked) ---
        "corpus_pipeline": _q_corpus_pipeline,
        "activity_heatmap": _q_activity_heatmap,
        "corpus_ingest_stream": _q_corpus_ingest_stream,
        "detect_pii": _q_detect_pii,
        "stratified_sample": _q_stratified_sample,
        "hybrid_retrieval_rrf": _q_hybrid_retrieval,
        "incremental_dedup": _q_incremental_dedup,
        # --- round-1 driver-green (oldest hard signal: CORRECTNESS_r01)
        # — re-proven this round. Includes the four batch twins of the
        # streaming ops touched by the round-4 NTZ watermark fix. ---
        "tumbling_window": _q_tumbling_window,
        "sliding_window": _q_sliding_window,
        "sessionize": _q_sessionize,
        "session_window_native": _q_session_window_native,
        "flagship_monthly_trend": _q_flagship,
        "keyword_cnf_filter": _q_keyword_cnf,
        "date_attribute_filter": _q_date_attribute_filter,
        "groupby_count": _q_groupby_count,
        "monthly_rollup": _q_monthly_rollup,
        "value_counts": _q_value_counts,
        "scalar_insights": _q_scalar_insights,
        "arg_extreme": _q_arg_extreme,
        "histogram_numeric": _q_histogram_numeric,
        "histogram_month_of_year": _q_histogram_month_of_year,
        "distinct_count": _q_distinct_count,
        "top_k": _q_top_k,
        "limit_preview": _q_limit_preview,
        "join_broadcast_dim": _q_join_broadcast_dim,
        "star_join_revenue": _q_star_join_revenue,
        "semi_join": _q_semi_join,
        "anti_join": _q_anti_join,
        "pricing_summary": _q_pricing_summary,
        "window_topk_per_group": _q_window_topk_per_group,
        "window_mom_delta": _q_window_mom_delta,
        "rollup_grouping_sets": _q_rollup_grouping_sets,
        "set_ops": _q_set_ops,
        "dedup_exact": _q_dedup_exact,
        "duplicate_groups": _q_duplicate_groups,
        "ngram_jaccard_pairs": _q_ngram_jaccard,
        "dedup_clusters": _q_dedup_clusters,
        "minhash_lsh_pairs": _q_minhash_lsh_pairs,
        "simhash_pairs": _q_simhash_pairs,
        "sim_topk_brute": _q_sim_topk_brute,
        "sim_topk_lsh": _q_sim_topk_lsh,
        "sim_topk_ivf": _q_sim_topk_ivf,
        "text_token_count": _q_text_token_count,
        "text_quality": _q_text_quality,
        "text_language_id": _q_text_language_id,
        "text_fingerprint": _q_text_fingerprint,
        "keyword_retrieval": _q_keyword_retrieval,
        "text_vocabulary": _q_text_vocabulary,
        "text_filtered_keywords": _q_text_filtered_keywords,
        "chart_pie_shares": _q_chart_pie_shares,
        "tpch_q3_shipping_priority": _q_tpch_q3,
        "tpch_q6_forecast_revenue": _q_tpch_q6,
        "tpch_q18_large_orders": _q_tpch_q18,
        "pivot_counts": _q_pivot_counts,
        "cube_agg": _q_cube_agg,
        # --- round-2 driver-green (CORRECTNESS_r02) ---
        "percentiles": _q_percentiles,
        "asof_join": _q_asof_join,
        "range_join": _q_range_join,
        "embedding_normalize": _q_embedding_normalize,
        "tpch_q4_late_orders": _q_tpch_q4,
        "tpch_q12_priority_mix": _q_tpch_q12,
        "tpch_q14_promo_share": _q_tpch_q14,
        "tpch_q17_small_qty": _q_tpch_q17,
        "tpch_q19_brand_ranges": _q_tpch_q19,
        "tpch_q22_idle_rich": _q_tpch_q22,
        "window_cumulative": _q_window_cumulative,
        "window_ntile": _q_window_ntile,
        "corpus_curation": _q_corpus_curation,
        "embedding_cosine_pairs": _q_embedding_cosine_pairs,
        "parse_ts_coerce": _q_parse_ts_coerce,
        "chart_bar_priority": _q_chart_bar_priority,
        "minhash_dedup_pairs": _q_minhash_dedup_pairs,
        "bucketed_join_revenue": _q_bucketed_join_revenue,
        "tpch_q21_waiting_suppliers": _q_tpch_q21,
        "train_test_split": _q_train_test_split,
        "sample_per_group": _q_sample_per_group,
        "mad_by_event_type": _q_mad_by_event_type,
        "chunk_text": _q_chunk_text,
        "latest_by_key": _q_latest_by_key,
        "profile_columns": _q_profile_columns,
        "tpch_q5_local_supplier": _q_tpch_q5,
        "kmeans_clusters": _q_kmeans_clusters,
        "resample_ffill": _q_resample_ffill,
        "pack_sequences": _q_pack_sequences,
        "funnel_conversion": _q_funnel_conversion,
        "skew_profile": _q_skew_profile,
        "repetition_stats": _q_repetition_stats,
        "ngram_contamination": _q_ngram_contamination,
        "normalize_text": _q_normalize_text,
        "passage_dedup": _q_passage_dedup,
        "pii_pseudonymize": _q_pii_pseudonymize,
        "tfidf_top_terms": _q_tfidf_top_terms,
        "corpus_mix": _q_corpus_mix,
        "quantile_band": _q_quantile_band,
        "shuffle_shard": _q_shuffle_shard,
        "scrub_terms": _q_scrub_terms,
        "mode_per_group": _q_mode_per_group,
        "tpch_q2_min_cost_supplier": _q_tpch_q2,
        "tpch_q9_product_profit": _q_tpch_q9,
        "tpch_q11_important_stock": _q_tpch_q11,
        "tpch_q16_supplier_count": _q_tpch_q16,
        "tpch_q20_excess_stock": _q_tpch_q20,
        "sim_topk_lsh_precomputed": _q_sim_topk_lsh_precomputed,
        "sim_topk_ivf_precomputed": _q_sim_topk_ivf_precomputed,
        "embedding_cosine_allpairs": _q_embedding_cosine_allpairs,
        # --- round-3 driver-green (CORRECTNESS_r03, newest signal) ---
        "correlated_subquery": _q_correlated_subquery,
        "tpch_q7_nation_volume": _q_tpch_q7,
        "tpch_q10_returned_items": _q_tpch_q10,
        "tpch_q13_order_distribution": _q_tpch_q13,
        "window_moving_avg": _q_window_moving_avg,
        "tpch_q8_market_share": _q_tpch_q8,
        "tpch_q15_top_supplier": _q_tpch_q15,
        "hourly_distinct_users": _q_hourly_distinct_users,
        "window_range_frame": _q_window_range_frame,
        "json_props_rollup": _q_json_props_rollup,
        "supplier_revenue": _q_supplier_revenue,
        "full_outer_monthly": _q_full_outer_monthly,
        "except_all_multiplicity": _q_except_all,
        "salted_join": _q_salted_join,
        "intermediary_pipeline": _q_intermediary_pipeline,
        "chart_histogram_categorical": _q_chart_histogram_categorical,
        "chart_line_monthly": _q_chart_line_monthly,
        "multimodal_resize_plan": _q_multimodal_resize,
        "multimodal_frame_sample": _q_multimodal_frames,
        "multimodal_image_features": _q_multimodal_features,
        "multimodal_audio_chunks": _q_multimodal_audio_chunks,
        "text_top_terms": _q_text_top_terms,
        "grouping_sets": _q_grouping_sets,
        "null_safe_join": _q_null_safe_join,
        "unpivot_metrics": _q_unpivot_metrics,
        "lateral_topk": _q_lateral_topk,
        "cohort_retention": _q_cohort_retention,
    }


# ---------------------------------------------------------------------------
# DuckDB oracles
# ---------------------------------------------------------------------------

_MONTHLY_ROLLUP_SQL = """
SELECT strftime(o_orderdate, '%Y-%m') AS bulan,
       count(o_orderkey) AS jumlah_paket,
       CAST(sum(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS total_pagu
FROM orders GROUP BY 1 ORDER BY 1
"""

_QUALITY_SQL = """
WITH t AS (
  SELECT doc_id, text,
         string_split_regex(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+') AS toks,
         length(text) AS n_chars
  FROM documents
), m AS (
  SELECT doc_id,
         CAST(len(toks) AS BIGINT) AS n_tokens,
         n_chars,
         CAST(len(list_filter(toks, t -> t IN ('the','a','an','and','or','of','to','in','is','it'))) AS DOUBLE)
           / greatest(len(toks), 1) AS stop_ratio,
         CAST(length(regexp_replace(text, '[^A-Za-z ]', '', 'g')) AS DOUBLE)
           / greatest(n_chars, 1) AS alpha_ratio
  FROM t
)
SELECT doc_id, n_tokens,
       round(stop_ratio, 6) AS stopword_ratio,
       round(alpha_ratio, 6) AS alpha_ratio,
       least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.4
             + least(stop_ratio * 5.0, 1.0) * 0.3
             + alpha_ratio * 0.3 AS quality_score
FROM m
"""

_LANGID_SQL = """
WITH t AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+') AS toks FROM documents
), s AS (
  SELECT doc_id,
    len(list_filter(toks, x -> x IN ('the','and','of')))  AS score_en,
    len(list_filter(toks, x -> x IN ('der','die','und'))) AS score_de,
    len(list_filter(toks, x -> x IN ('le','la','et')))    AS score_fr,
    len(list_filter(toks, x -> x IN ('el','los','que')))  AS score_es,
    len(list_filter(toks, x -> x IN ('的','是','了')))     AS score_zh,
    greatest(
      len(list_filter(toks, x -> x IN ('the','and','of'))),
      len(list_filter(toks, x -> x IN ('der','die','und'))),
      len(list_filter(toks, x -> x IN ('le','la','et'))),
      len(list_filter(toks, x -> x IN ('el','los','que'))),
      len(list_filter(toks, x -> x IN ('的','是','了')))) AS best
  FROM t
)
SELECT doc_id,
  CASE WHEN best = 0 THEN 'und'
       WHEN score_de = best THEN 'de'
       WHEN score_en = best THEN 'en'
       WHEN score_es = best THEN 'es'
       WHEN score_fr = best THEN 'fr'
       WHEN score_zh = best THEN 'zh'
       ELSE 'und' END AS lang_pred
FROM s
"""

_JACCARD_SQL = """
WITH d AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+') AS toks
  FROM documents WHERE doc_id < 200
), sh AS (
  SELECT doc_id, unnest(list_distinct(
           list_transform(range(1, greatest(len(toks) - 3, 0) + 2),
                          i -> array_to_string(toks[i:i+2], ' ')))) AS shingle
  FROM d
), sz AS (
  SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       CAST(n_inter AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE) AS jaccard
FROM inter
JOIN sz sa ON sa.doc_id = id_a
JOIN sz sb ON sb.doc_id = id_b
WHERE CAST(n_inter AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE) >= 0.12
"""

def _kmeans_cte_sql(src: str, with_d: bool = False) -> str:
    """Unrolled 2-iteration Lloyd k-means (k=4, lowest-id init,
    lowest-cid tie-break) as a DuckDB CTE chain over ``src`` —
    the parametrized form of the kmeans_clusters oracle, so the
    SemDeDup / prototypicality twins train on exactly the corpus
    (incl. planted rows) their Spark sides see. ``with_d`` also
    exposes the winning squared distance as ``dist2``."""
    d_sel = (
        ",\n                     (min(struct_pack(d := d, cid := cid))).d AS dist2"
        if with_d
        else ""
    )
    return f"""
            e AS (
              SELECT vec_id,
                     list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
              FROM ({src})
            ), c0 AS (
              SELECT CAST(vec_id AS INT) AS cid, v AS cv FROM e WHERE vec_id < 4
            ), a1 AS (
              SELECT vec_id, (min(struct_pack(d := d, cid := cid))).cid AS cluster
              FROM (
                SELECT e.vec_id, c.cid,
                       list_sum(list_transform(range(1, len(e.v) + 1),
                                i -> (e.v[i] - c.cv[i]) * (e.v[i] - c.cv[i]))) AS d
                FROM e, c0 c
              ) GROUP BY 1
            ), m1 AS (
              SELECT cluster, dim, avg(val) AS m FROM (
                SELECT a1.cluster, unnest(e.v) AS val,
                       unnest(range(1, len(e.v) + 1)) AS dim
                FROM a1 JOIN e USING (vec_id)
              ) GROUP BY 1, 2
            ), c1 AS (
              SELECT CAST(cluster AS INT) AS cid, list(m ORDER BY dim) AS cv
              FROM m1 GROUP BY 1
            ), a2 AS (
              SELECT vec_id, (min(struct_pack(d := d, cid := cid))).cid AS cluster{d_sel}
              FROM (
                SELECT e.vec_id, c.cid,
                       list_sum(list_transform(range(1, len(e.v) + 1),
                                i -> (e.v[i] - c.cv[i]) * (e.v[i] - c.cv[i]))) AS d
                FROM e, c1 c
              ) GROUP BY 1
            )"""


def _semdedup_greedy_sql() -> str:
    """DuckDB twin of the strict greedy keep-first SemDeDup walk.

    The sequential dependence ("pruned only by an already-KEPT
    member") is not join-expressible, but it IS expressible as a
    RECURSIVE CTE over the SPARSE threshold-pair graph: materialize
    all within-cluster pairs (i < j, cos ≥ thr) exactly like the
    relaxed twin — near-dup pairs are rare, so this set is small —
    then walk the distinct prune-TARGETS in ascending id carrying the
    pruned-id list; a target is pruned iff some pair source below it
    is not itself pruned (sources outside the walk's domain are kept
    by construction). Nodes untouched by any pair never enter the
    recursion. Recursion depth = |distinct targets|, not corpus
    size."""
    return f"""
        WITH RECURSIVE src AS (
          SELECT vec_id, embedding FROM embeddings
          UNION ALL
          SELECT vec_id + 1000000,
                 list_transform(embedding,
                   x -> CAST(CAST(x AS DOUBLE) * 1.01 AS FLOAT))
          FROM embeddings WHERE vec_id % 25 = 0
          UNION ALL
          SELECT vec_id + 2000000,
                 list_concat(
                   [CAST(cos({_CHAIN_THETA!r} * ((vec_id // 25) % 8)) AS FLOAT),
                    CAST(sin({_CHAIN_THETA!r} * ((vec_id // 25) % 8)) AS FLOAT)],
                   list_transform(range(62), z -> CAST(0.0 AS FLOAT)))
          FROM embeddings WHERE vec_id % 25 = 0
        ), {_kmeans_cte_sql('SELECT * FROM src')},
        -- MATERIALIZED is load-bearing: without it DuckDB re-inlines
        -- these CTEs into the recursive term and recomputes the full
        -- within-cluster pair join on EVERY walk iteration (measured
        -- 339 s -> ~20 s at sf0.1)
        a2m AS MATERIALIZED (
          SELECT * FROM a2
        ), n AS (
          SELECT a2m.vec_id, a2m.cluster, e.v,
                 sqrt(list_sum(list_transform(e.v, x -> x * x))) AS nrm
          FROM a2m JOIN e USING (vec_id)
        ), p AS MATERIALIZED (
          SELECT a.vec_id AS i, b.vec_id AS j
          FROM n a JOIN n b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
          WHERE list_sum(list_transform(range(1, len(a.v) + 1),
                         ii -> a.v[ii] * b.v[ii]))
                / (CASE WHEN a.nrm = 0 THEN 1 ELSE a.nrm END
                   * CASE WHEN b.nrm = 0 THEN 1 ELSE b.nrm END) >= 0.9
        ), nodes AS MATERIALIZED (
          SELECT j AS vec_id, row_number() OVER (ORDER BY j) AS pos
          FROM (SELECT DISTINCT j FROM p)
        ), walk(pos, pruned) AS (
          SELECT 0, CAST([] AS BIGINT[])
          UNION ALL
          SELECT w.pos + 1,
                 CASE WHEN EXISTS (
                        SELECT 1 FROM p
                        WHERE p.j = (SELECT vec_id FROM nodes
                                     WHERE pos = w.pos + 1)
                          AND NOT list_contains(w.pruned, p.i))
                      THEN list_append(w.pruned,
                           (SELECT CAST(vec_id AS BIGINT) FROM nodes
                            WHERE pos = w.pos + 1))
                      ELSE w.pruned END
          FROM walk w
          WHERE w.pos < (SELECT count(*) FROM nodes)
        ), final AS (
          SELECT pruned FROM walk ORDER BY pos DESC LIMIT 1
        )
        SELECT a2m.vec_id, a2m.cluster,
               coalesce(list_contains((SELECT pruned FROM final),
                                      a2m.vec_id), FALSE) AS pruned
        FROM a2m
    """


_COSINE_PAIRS_SQL = """
WITH e AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 300),
p AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         list_sum(list_transform(list_zip(a.embedding, b.embedding),
                  x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
         / ((CASE WHEN sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) = 0 THEN 1.0 ELSE sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) END)
            * (CASE WHEN sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) = 0 THEN 1.0 ELSE sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) END))
         AS similarity
  FROM e a JOIN e b ON a.vec_id < b.vec_id
)
SELECT id_a, id_b, round(similarity, 4) AS similarity
FROM p WHERE similarity >= 0.35
"""

_COSINE_Q_SQL = """
  list_sum(list_transform(list_zip(e.embedding, q.qv),
           x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
  / ((CASE WHEN sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) = 0
           THEN 1.0 ELSE sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) END)
     * (CASE WHEN sqrt(list_sum(list_transform(q.qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) = 0
             THEN 1.0 ELSE sqrt(list_sum(list_transform(q.qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) END))
"""


def _vec_values_sql(vectors) -> str:
    """(id, DOUBLE[]) VALUES rows from Python float lists — repr() is
    shortest-round-trip, so DuckDB parses bit-identical doubles."""
    return ",\n".join(
        f"({i}, [{', '.join(repr(float(v)) for v in vec)}])" for i, vec in enumerate(vectors)
    )


_DUCK_POLY = """list_reduce(list_prepend(CAST(0 AS BIGINT),
  list_transform(range(greatest(length({s}), 1)),
                 i -> CAST(ord({s}[CAST(i+1 AS INT)]) AS BIGINT))),
  (acc, c) -> (acc * {mult} + c) % 2147483647)"""


def _tpch_partsupp_oracles() -> dict[str, str]:
    """Q2/Q9/Q11/Q16/Q20 over the DERIVED partsupp (sources/derived.py
    emits the same arithmetic into both engines)."""
    from data_pengadaan_agent_spark.sources.derived import PARTSUPP_SQL_CTE as PS

    from data_pengadaan_agent_spark.sources.derived import LINE_DATES_SQL_CTE as LD

    return {
        "tpch_q21_waiting_suppliers": f"""
            WITH li AS ({LD}),
            l1 AS (
              SELECT l_orderkey, l_suppkey FROM li
              WHERE l_receiptdate > l_commitdate
            )
            SELECT s_name, count(*) AS numwait
            FROM l1
            JOIN orders ON o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
            JOIN supplier ON s_suppkey = l1.l_suppkey AND s_nationkey % 5 = 1
            WHERE EXISTS (
                SELECT 1 FROM li l2
                WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
              )
              AND NOT EXISTS (
                SELECT 1 FROM li l3
                WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                  AND l3.l_receiptdate > l3.l_commitdate
              )
            GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20
        """,
        "tpch_q2_min_cost_supplier": f"""
            WITH ps AS ({PS}),
            sn AS (
              SELECT s_suppkey, s_name, s_acctbal, n_name
              FROM supplier JOIN nation ON s_nationkey = n_nationkey
                            JOIN region ON n_regionkey = r_regionkey
              WHERE r_name = 'EUROPE'
            ),
            cand AS (
              SELECT sn.s_acctbal, sn.s_name, sn.n_name,
                     ps.ps_partkey, p.p_brand, ps.ps_supplycost
              FROM ps
              JOIN part p ON ps.ps_partkey = p.p_partkey
                         AND p.p_size BETWEEN 10 AND 20 AND p.p_type = 'LARGE'
              JOIN sn ON ps.ps_suppkey = sn.s_suppkey
            )
            SELECT s_acctbal, s_name, n_name, ps_partkey AS p_partkey,
                   p_brand, ps_supplycost
            FROM cand
            QUALIFY ps_supplycost = min(ps_supplycost) OVER (PARTITION BY ps_partkey)
            ORDER BY s_acctbal DESC, s_name, p_partkey LIMIT 20
        """,
        "tpch_q9_product_profit": f"""
            WITH ps AS ({PS})
            SELECT n_name, CAST(year(o_orderdate) AS INT) AS o_year,
                   CAST(round(sum(
                     CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(8,2))
                     - CAST(ps_supplycost AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(8,2))
                   ), 2) AS DOUBLE) AS sum_profit
            FROM lineitem
            JOIN part ON l_partkey = p_partkey AND p_name LIKE '%red%'
            JOIN ps ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            JOIN orders ON l_orderkey = o_orderkey
            GROUP BY 1, 2 ORDER BY n_name, o_year DESC
        """,
        "tpch_q11_important_stock": f"""
            WITH ps AS ({PS}),
            grouped AS (
              SELECT ps_partkey,
                     sum(CAST(ps_supplycost AS DECIMAL(18,2)) * ps_availqty) AS sv
              FROM ps JOIN supplier ON ps_suppkey = s_suppkey
              WHERE s_nationkey % 5 = 2
              GROUP BY 1
            )
            SELECT ps_partkey, round(CAST(sv AS DOUBLE), 2) AS stock_value
            FROM grouped
            WHERE CAST(sv AS DOUBLE) > CAST((SELECT sum(sv) FROM grouped) AS DOUBLE) * 0.002
            ORDER BY stock_value DESC, ps_partkey LIMIT 50
        """,
        "tpch_q16_supplier_count": f"""
            WITH ps AS ({PS})
            SELECT p_brand, p_type, p_size, count(DISTINCT ps_suppkey) AS supplier_cnt
            FROM ps JOIN part ON ps_partkey = p_partkey
            WHERE p_brand <> 'Brand#3' AND p_type <> 'PROMO'
              AND p_size IN (1, 4, 9, 14, 19, 24, 29, 34)
              AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
            GROUP BY 1, 2, 3
            ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
        """,
        "tpch_q20_excess_stock": f"""
            WITH ps AS ({PS}),
            shipped AS (
              SELECT l_partkey, l_suppkey, 0.5 * sum(l_quantity) AS half_qty
              FROM lineitem
              WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                AND l_shipdate < TIMESTAMP '1997-01-01'
              GROUP BY 1, 2
            ),
            excess AS (
              SELECT DISTINCT ps_suppkey AS s_suppkey
              FROM ps
              JOIN part ON ps_partkey = p_partkey AND p_name LIKE 'small%'
              JOIN shipped ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
              WHERE ps_availqty > half_qty
            )
            SELECT s_suppkey, s_name FROM supplier
            WHERE s_suppkey IN (SELECT s_suppkey FROM excess)
            ORDER BY s_name
        """,
    }


def _cosine_pairs_lsh_sql(
    dim: int = 64,
    bands: int = 8,
    ppb: int = 8,
    seed: int = 42,
    threshold: float = 0.35,
) -> str:
    """DuckDB twin of S.cosine_pairs_lsh: the banded hyperplane
    codebook is emitted as literals from the SAME generator, so even
    the approximate candidate set is equality-checked."""
    from data_pengadaan_agent_spark.operators.similarity import _hyperplanes

    planes = _vec_values_sql(_hyperplanes(dim, bands * ppb, seed))
    return f"""
WITH planes(pid, pv) AS (VALUES {planes}),
sigs AS (
  SELECT e.vec_id, CAST(p.pid // {ppb} AS INT) AS band,
         string_agg(CASE WHEN list_sum(list_transform(list_zip(e.embedding, p.pv),
                        x -> CAST(x[1] AS DOUBLE) * x[2])) >= 0
                    THEN '1' ELSE '0' END, '' ORDER BY p.pid) AS sig
  FROM embeddings e CROSS JOIN planes p GROUP BY e.vec_id, p.pid // {ppb}
),
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM sigs a JOIN sigs b
    ON a.band = b.band AND a.sig = b.sig AND a.vec_id < b.vec_id
),
p AS (
  SELECT id_a, id_b,
         list_sum(list_transform(list_zip(a.embedding, b.embedding),
                  x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
         / ((CASE WHEN sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) = 0 THEN 1.0 ELSE sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) END)
            * (CASE WHEN sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) = 0 THEN 1.0 ELSE sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) END))
         AS similarity
  FROM cand JOIN embeddings a ON a.vec_id = cand.id_a
            JOIN embeddings b ON b.vec_id = cand.id_b
)
SELECT id_a, id_b, round(similarity, 4) AS similarity
FROM p WHERE similarity >= {threshold}
"""


def _minhash_dedup_sql(threshold: float = 0.12) -> str:
    """DuckDB twin of the full near-dup pipeline: minhash-LSH
    candidates ∩ exact jaccard ≥ threshold."""
    return f"""
SELECT j.id_a, j.id_b, j.jaccard
FROM ({_JACCARD_SQL.replace(">= 0.12", f">= {threshold}")}) j
JOIN ({_minhash_lsh_sql()}) c ON j.id_a = c.id_a AND j.id_b = c.id_b
"""


def _minhash_lsh_sql(n_hashes: int = 32, bands: int = 16, seed: int = 1234567) -> str:
    """DuckDB twin of D.minhash_lsh_pairs_arith: (a,b) coefficients
    emitted as literals from the SAME generator."""
    from data_pengadaan_agent_spark.operators.dedup import _lcg_coeffs

    r = n_hashes // bands
    coeffs = _lcg_coeffs(n_hashes, seed)
    sig_cols = ",\n         ".join(
        f"min((x * {a} + {b}) % 2147483647) AS h{i}" for i, (a, b) in enumerate(coeffs)
    )
    buckets = []
    for b in range(bands):
        expr = "CAST(0 AS BIGINT)"
        for j in range(r):
            expr = f"(({expr}) * 1000003 + h{b * r + j}) % 2147483647"
        buckets.append(expr)
    bucket_list = ",\n        ".join(buckets)
    poly = _DUCK_POLY.format(s="shingle", mult=131)
    return f"""
WITH d AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+') AS toks
  FROM documents WHERE doc_id < 200
), sh AS (
  SELECT doc_id, unnest(list_distinct(
           list_transform(range(1, greatest(len(toks) - 3, 0) + 2),
                          i -> array_to_string(toks[i:i+2], ' ')))) AS shingle
  FROM d
), hx AS (
  SELECT doc_id, {poly} AS x FROM sh
), sig AS (
  SELECT doc_id, {sig_cols}
  FROM hx GROUP BY doc_id
), banded AS (
  SELECT doc_id,
         unnest(range({bands})) AS band,
         unnest([{bucket_list}]) AS bucket
  FROM sig
)
SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
FROM banded a JOIN banded b
  ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
"""


def _simhash_pairs_sql(max_hamming: int = 16) -> str:
    """DuckDB twin of D.simhash_pairs_arith (62-bit two-channel)."""
    p131 = _DUCK_POLY.format(s="t", mult=131)
    p137 = _DUCK_POLY.format(s="t", mult=137)
    return f"""
WITH d AS (
  SELECT doc_id, list_distinct(list_filter(
           string_split_regex(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+'), t -> t <> '')) AS toks
  FROM documents WHERE doc_id < 200
), hx AS (
  SELECT doc_id,
         list_transform(toks, t -> ({p131}) * 2147483648 + ({p137})) AS hs
  FROM d
), sig AS (
  SELECT doc_id,
         list_sum(list_transform(range(62), b ->
           CASE WHEN list_sum(list_transform(hs,
                  h -> CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END)) > 0
                THEN (CAST(1 AS BIGINT) << CAST(b AS INT)) ELSE 0 END)) AS simhash
  FROM hx
), chunks AS (
  SELECT doc_id, simhash,
         unnest([0, 1, 2, 3]) AS chunk_idx,
         unnest([(simhash >> 0) & 65535, (simhash >> 16) & 65535,
                 (simhash >> 32) & 32767, (simhash >> 47) & 32767]) AS chunk
  FROM sig
)
SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
       bit_count(xor(a.simhash, b.simhash)) AS hamming
FROM chunks a JOIN chunks b
  ON a.chunk_idx = b.chunk_idx AND a.chunk = b.chunk AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
"""


def _fingerprint_sql() -> str:
    """DuckDB twin of X.fingerprint_arith (two 31-bit channels)."""
    ch = """list_reduce(list_prepend(CAST(0 AS BIGINT),
      list_transform(list_filter(string_split_regex(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+'),
                                 t -> t <> ''),
                     t -> {tok})),
      (acc, x) -> (acc * 1000003 + x) % 2147483647)"""
    c131 = ch.format(tok=_DUCK_POLY.format(s="t", mult=131))
    c137 = ch.format(tok=_DUCK_POLY.format(s="t", mult=137))
    return f"""
SELECT doc_id, ({c131}) * 2147483648 + ({c137}) AS fingerprint
FROM documents
"""


def _corpus_pipeline_sql() -> str:
    """DuckDB twin of _q_corpus_pipeline. Models every stage from the
    ``documents`` view directly; since the text-shard directory the
    Spark side reads is itself derived deterministically from that view
    (_ensure_text_corpus), a value match here also verifies the
    read_text_corpus file round-trip (line splitting, source
    attribution, empty-line filter) end to end."""
    ch = """list_reduce(list_prepend(CAST(0 AS BIGINT),
      list_transform(list_filter(string_split_regex(lower(trim(tn)), '[ \\t\\n\\x0B\\f\\r]+'),
                                 t -> t <> ''),
                     t -> {tok})),
      (acc, x) -> (acc * 1000003 + x) % 2147483647)"""
    c131 = ch.format(tok=_DUCK_POLY.format(s="t", mult=131))
    c137 = ch.format(tok=_DUCK_POLY.format(s="t", mult=137))
    weights = ", ".join(
        f"('{g}', {w})" for g, w in _PIPE_WEIGHTS.items()
    )
    return f"""
WITH corpus AS (
  SELECT regexp_replace(text, '[\\r\\n]+', ' ', 'g') AS rawtext, source
  FROM documents WHERE length(trim(text)) > 0
), canon AS (
  -- dedup_exact_content + normalize + canonical dedup collapse to one
  -- GROUP BY normalized text (min-of-mins == global min(source))
  SELECT trim(regexp_replace(regexp_replace(lower(rawtext),
           '[^a-z0-9 \\t\\n\\x0B\\f\\r]', ' ', 'g'), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')) AS tn,
         min(source) AS source
  FROM corpus GROUP BY 1
), feat AS (
  SELECT tn, source, length(tn) AS nc,
         string_split_regex(lower(trim(tn)), '[ \\t\\n\\x0B\\f\\r]+') AS toks
  FROM canon
), q AS (
  SELECT tn, source, nc,
         least(CAST(len(toks) AS DOUBLE) / 100.0, 1.0) * 0.4
           + least((CAST(len(list_filter(toks, x -> x IN
               ('the','a','an','and','or','of','to','in','is','it'))) AS DOUBLE)
               / greatest(len(toks), 1)) * 5.0, 1.0) * 0.3
           + (CAST(length(regexp_replace(tn, '[^A-Za-z ]', '', 'g')) AS DOUBLE)
               / greatest(nc, 1)) * 0.3 AS quality_score,
         ({c131}) * 2147483648 + ({c137}) AS fp
  FROM feat
), kept AS (
  SELECT tn, source, nc, fp % 2147483648 AS mix_key
  FROM q WHERE quality_score >= {_PIPE_QUALITY_MIN}
), w(source, w) AS (VALUES {weights}),
c AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM kept GROUP BY 1),
cw AS (SELECT c.source, c.n, w.w FROM c JOIN w USING (source)),
s AS (SELECT min(CAST(n AS DOUBLE) / w) AS s FROM cw),
r AS (SELECT cw.source,
             CAST(floor((cw.w * s.s / CAST(cw.n AS DOUBLE)) * 4294967296)
                  AS BIGINT) AS thresh
      FROM cw, s),
mixed AS (
  SELECT k.* FROM kept k JOIN r ON k.source = r.source
  WHERE (k.mix_key * 2654435761) % 4294967296 < r.thresh
), sharded AS (
  SELECT source, nc,
         CAST(((mix_key * 2654435761) % 4294967296) % {_PIPE_SHARDS}
              AS INTEGER) AS shard,
         CAST(row_number() OVER (
           PARTITION BY ((mix_key * 2654435761) % 4294967296) % {_PIPE_SHARDS}
           ORDER BY (mix_key * 2654435761) % 4294967296, mix_key
         ) AS BIGINT) AS pos
  FROM mixed
)
SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(nc) AS BIGINT) AS total_chars,
       CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
       CAST(sum(pos) AS BIGINT) AS pos_sum
FROM sharded GROUP BY shard ORDER BY shard
"""


def _keyword_retrieval_sql(query_text: str = "sparkle", dim: int = 64) -> str:
    """DuckDB twin of §2.10: the query vector literal comes from the
    SAME Python embedder the Spark side uses; the per-keyword embedding
    is re-derived in SQL with identical integer arithmetic."""
    from data_pengadaan_agent_spark.functions.vectors import hash_ngram_embed

    qvec = hash_ngram_embed(query_text, dim)
    qlit = "[" + ", ".join(repr(v) for v in qvec) + "]"
    h = ("(ord(substr(g,1,1))*961 + ord(substr(g,2,1))*31 + ord(substr(g,3,1)))")
    return f"""
WITH vocab AS (
  SELECT token AS keyword FROM (
    SELECT token, count(*) AS df FROM (
      SELECT doc_id, unnest(list_distinct({_DUCK_TOKS})) AS token FROM documents
    ) WHERE token <> '' GROUP BY token ORDER BY df DESC, token LIMIT 50
  )
),
emb AS (
  SELECT keyword,
         list_transform(range({dim}), b ->
           list_sum(list_transform(
             list_transform(range(greatest(length(keyword), 1)),
                            i -> substr(keyword || '##', CAST(i+1 AS INT), 3)),
             g -> CASE WHEN {h} % {dim} = b
                       THEN (CASE WHEN ({h} // {dim}) % 2 = 0 THEN 1 ELSE -1 END)
                       ELSE 0 END))) AS e
  FROM vocab
),
s AS (
  SELECT keyword,
         list_sum(list_transform(list_zip(e, {qlit}),
                  x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
         / ((CASE WHEN sqrt(list_sum(list_transform(e, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) = 0 THEN 1.0 ELSE sqrt(list_sum(list_transform(e, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) END)
            * (CASE WHEN sqrt(list_sum(list_transform({qlit}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) = 0 THEN 1.0 ELSE sqrt(list_sum(list_transform({qlit}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) END))
         AS similarity
  FROM emb
)
SELECT keyword, round(similarity, 4) AS similarity
FROM s ORDER BY s.similarity DESC, keyword LIMIT 10
"""


def _lsh_topk_sql() -> str:
    """DuckDB twin of S.lsh_topk(seed=42, n_planes=6): the hyperplane
    codebook is emitted as literals from the SAME generator the Spark
    side uses, so even the approximate path is equality-checked."""
    from data_pengadaan_agent_spark.operators.similarity import _hyperplanes

    planes = _vec_values_sql(_hyperplanes(64, 6, 42))
    sig = """string_agg(CASE WHEN list_sum(list_transform(list_zip({vec}, p.pv),
                     x -> CAST(x[1] AS DOUBLE) * x[2])) >= 0
                THEN '1' ELSE '0' END, '' ORDER BY p.pid)"""
    return f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
planes(pid, pv) AS (VALUES {planes}),
sigs AS (
  SELECT e.vec_id, {sig.format(vec='e.embedding')} AS sig
  FROM embeddings e CROSS JOIN planes p GROUP BY e.vec_id
),
qsig AS (
  SELECT {sig.format(vec='q.qv')} AS sig
  FROM q CROSS JOIN planes p
),
cand AS (SELECT s.vec_id FROM sigs s, qsig WHERE s.sig = qsig.sig),
s AS (
  SELECT e.vec_id, {_COSINE_Q_SQL} AS similarity
  FROM embeddings e JOIN cand USING (vec_id), q
)
SELECT vec_id, round(similarity, 4) AS similarity
FROM s ORDER BY similarity DESC, vec_id LIMIT 10
"""


def _ivf_topk_sql() -> str:
    """DuckDB twin of S.ivf_topk(seed=7, n_centroids=8, n_probe=2)."""
    from data_pengadaan_agent_spark.operators.similarity import _hyperplanes

    cents = _vec_values_sql(_hyperplanes(64, 8, 7))
    dot = """list_sum(list_transform(list_zip({a}, {b}),
                x -> CAST(x[1] AS DOUBLE) * x[2]))"""
    return f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
cents(cid, cv) AS (VALUES {cents}),
probe AS (
  SELECT cid FROM cents c, q
  ORDER BY {dot.format(a='q.qv', b='c.cv')} DESC, cid LIMIT 2
),
assign AS (
  SELECT e.vec_id,
         arg_max(c.cid, {dot.format(a='e.embedding', b='c.cv')}) AS centroid_id
  FROM embeddings e CROSS JOIN cents c GROUP BY e.vec_id
),
cand AS (SELECT vec_id FROM assign WHERE centroid_id IN (SELECT cid FROM probe)),
s AS (
  SELECT e.vec_id, {_COSINE_Q_SQL} AS similarity
  FROM embeddings e JOIN cand USING (vec_id), q
)
SELECT vec_id, round(similarity, 4) AS similarity
FROM s ORDER BY similarity DESC, vec_id LIMIT 10
"""


_SIM_TOPK_SQL = """
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
s AS (
  SELECT e.vec_id,
         list_sum(list_transform(list_zip(e.embedding, q.qv),
                  x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
         / ((CASE WHEN sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) = 0 THEN 1.0 ELSE sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) END)
            * (CASE WHEN sqrt(list_sum(list_transform(q.qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) = 0 THEN 1.0 ELSE sqrt(list_sum(list_transform(q.qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) END))
         AS similarity
  FROM embeddings e, q
)
SELECT vec_id, round(similarity, 4) AS similarity
FROM s ORDER BY s.similarity DESC, vec_id LIMIT 10
"""

_SESSIONIZE_SQL = """
WITH g AS (
  SELECT user_id, ts, value,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
  FROM events
), f AS (
  SELECT user_id, ts, value,
         CASE WHEN prev_ts IS NULL OR ts > prev_ts + INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_session
  FROM g
), sid AS (
  SELECT user_id, ts, value,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM f
)
SELECT user_id,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
       count(*) AS n_events,
       round(CAST(sum(CAST(value AS DECIMAL(28,2))) AS DOUBLE), 2) AS total_value
FROM sid GROUP BY user_id, session_id
"""


# Tier-3 variants RETIRED from the driver registry (round 6, VERDICT
# r5 ask #2): the 50-entry gate × 3-round freshness window caps the
# registry at 150 and round 5 closed at 148 — two entries of headroom.
# Each retiree is a variant/superset of a still-registered entry (the
# tier list in the queries() docstring), keeps its implementation,
# entry callable and oracle twin, and stays VALUE-CHECKED locally:
# tests/test_driver_contract.py::test_retired_entries_match_oracle runs
# the same Arrow-normalized comparison the driver gate uses, every
# pytest run. Retirement frees driver-gate slots; it does not drop
# coverage.
_RETIRED_TIER3 = frozenset(
    {
        # keep sim_topk_lsh / sim_topk_ivf (same oracle SQL twins)
        "sim_topk_lsh_precomputed",
        "sim_topk_ivf_precomputed",
        # capped exact baseline of embedding_cosine_pairs
        "embedding_cosine_allpairs",
        # superset of dedup_exact
        "duplicate_groups",
        # batch twin of sessionize (same session semantics family)
        "session_window_native",
        # complete-mode twin: the APPEND-mode (state-bounded) form is
        # the registered one from round 6 (VERDICT r5 ask #5)
        "trending_terms_stream",
        # round-7 retirements (the pre-computed registration plan):
        # limit_preview's LIMIT shape is exercised by top_k /
        # window_topk_per_group; histogram_month_of_year's 1-12
        # scaffold by histogram_numeric + chart_line_monthly. Both
        # r4-green, both still value-checked every pytest run.
        "limit_preview",
        "histogram_month_of_year",
        # round-9 retirements (the pre-planned tranche, NOTES.md — all
        # four were DUE in r9's gate window, the only retirement kind
        # that frees a slot at the 150 cap):
        # passage_dedup: shared-passage STATS variant; its 16-token
        # posexplode + count-distinct shape is a strict subset of
        # registered dedup_passages (adds first-occurrence vote +
        # rebuild on the same lineage).
        "passage_dedup",
        # normalize_text: pure codegen select; the identical
        # canonicalization expression runs inside registered
        # corpus_curation's lineage (its twin embeds the same regexes).
        "normalize_text",
        # chart_histogram_categorical: C4 categorical branch ≡
        # value_counts aggregate + chart_bar_priority top-N shape; the
        # numeric branch of the same dispatcher is histogram_numeric.
        "chart_histogram_categorical",
        # hourly_distinct_users: time-bucketed distinct ≡ distinct_count
        # (A8) + activity_heatmap time bucketing.
        "hourly_distinct_users",
        # FIFTH r9 retirement (unplanned, forced by the r8 red row:
        # bm25_retrieval_batch registered in r8 but hash-failed, so it
        # bought no freshness and re-enters r9's must-check set as
        # never-green — 51 must > 50 window without one more slot).
        # except_all_multiplicity: EXCEPT ALL multiplicity-preserving
        # variant; the §2.7 set-ops family keeps its driver row via
        # the registered set_ops (INTERSECT/EXCEPT/UNION, r7-green).
        "except_all_multiplicity",
        # round-10 retirements (the pre-verified 2-in/2-out plan from
        # end of round 9, funding the winnow pair registrations; both
        # were in r10's computed due set — the r7-green cohort):
        # minhash_lsh_pairs: the candidate STAGE of registered
        # minhash_dedup_pairs (r8-green), which runs the identical
        # arith banding lineage and then Jaccard-verifies; the shape
        # keeps its driver hash via that consumer.
        "minhash_lsh_pairs",
        # corpus_ingest_stream: the dedup-only streaming form strictly
        # contained in registered corpus_ingest_stream_ttl (same
        # front-end + TTL state bound, r8-green) and _scored (r8-green),
        # and tripled by corpus_ingest_stream_dup_spans in the
        # candidate pool.
        "corpus_ingest_stream",
        # THIRD r10 retirement (unplanned, forced by the r9 red row —
        # the same mechanism as r9's except_all_multiplicity:
        # bm25_retrieval_batch stayed never-green in r9, so the
        # end-of-r9 simulation's assumption that the full r9 window
        # would go green was off by one and r10's must-check set is 51).
        # join_broadcast_dim: nation ⋈ broadcast(region) + group-count —
        # strictly contained in registered star_join_revenue (5-table
        # star over the same two dims, in r10's gate window) and in the
        # driver-green TPC-H q5/q8 broadcast-dim chains (r9/r8).
        "join_broadcast_dim",
        # round-11 retirements (the pre-verified 4-in/3-out triage
        # written in round 10 — NOTES.md; all three in r11's due set,
        # the r8-green cohort):
        # length_outliers: continuous-percentile twin of registered
        # quantile_band + the length features inside text_quality;
        # the queries() docstring's tier-3 example since round 5.
        "length_outliers",
        # bm25_retrieval: single-query form strictly dominated by
        # registered bm25_retrieval_batch (same integer scoring,
        # r10-green) and by bm25_index_retrieval registering THIS
        # round with the SAME shared twin.
        "bm25_retrieval",
        # corpus_mix: proportional-rate hash filter whose constructs
        # all keep driver rows — the Knuth-hash selection via
        # train_test_split/sample_per_group (r9-green), the
        # count→broadcast-rate shape via its registered sibling
        # corpus_mix_tokens (same module, same group frame).
        "corpus_mix",
        # round-12 retirement (the pre-verified 2-in/1-out triage
        # written in round 11 — NOTES.md; in r12's due set, the
        # r9-green cohort):
        # lateral_topk: LATERAL correlated top-2 per group — Catalyst
        # rewrites it to exactly the ranked-window join that registered
        # window_topk_per_group (r10-green) hashes, and the
        # correlated-subquery surface keeps its own driver row via
        # registered correlated_subquery (same due set).
        "lateral_topk",
        # round-12 drain-wave retirements (VERDICT r11 ask #2 — fund
        # pulling the r13 shortlist's top two forward; both in r12's
        # due set, the r9-green cohort):
        # text_top_terms: per-doc top-k TF terms — the tf ranking is
        # inside registered tfidf_top_terms (r11-green) and the
        # per-group rank shape is window_topk_per_group (r10-green).
        "text_top_terms",
        # sample_per_group: per-group smallest-Knuth-hash selection ≡
        # the registered train_test_split + stratified_sample family
        # (same knuth_hash ordering, same per-group window cut), and
        # the weighted generalization weighted_sample[_per_group] sits
        # value-checked in the candidate pool.
        "sample_per_group",
        # round-13 retirements (the pre-verified 5-in/5-out triage
        # written in round 12 — NOTES.md "r13 registration triage";
        # all five in r13's due set, the r10-green cohort):
        # bm25_retrieval_batch: the from-scratch scoring path, strictly
        # dominated by registered bm25_index_retrieval (r11-green, the
        # SAME shared twin _bm25_retrieval_batch_sql(k=5) — the index
        # path must reproduce the from-scratch path bit-exactly); the
        # index path is the steady-state 100 TB shape, and this retires
        # the lap's single slowest non-streaming query.
        "bm25_retrieval_batch",
        # winnow_fingerprints: the candidate STAGE of registered
        # winnow_matches (identical k=5-gram two-channel fingerprint
        # lineage, then the match join) — the minhash_lsh_pairs
        # precedent from r10.
        "winnow_fingerprints",
        # activity_heatmap: (dow, hour) count grid ≡ the registered
        # groupby_count / monthly_rollup aggregate shapes on derived
        # calendar keys (same dayofweek/hour exprs run inside
        # chart_line_monthly's lineage).
        "activity_heatmap",
        # sim_topk_lsh + sim_topk_ivf: both probes run INSIDE
        # registered ann_recall_lsh_ivf (r11-green — computes LSH and
        # IVF top-k against the brute baseline in one row), and the
        # IVF partition-pruned scan + ranking is also hashed by
        # registered ivfpq_adc_batch (r12-green). The family keeps
        # brute/recall/drift/kmeans/mmr/adc/stream driver rows.
        "sim_topk_lsh",
        "sim_topk_ivf",
        # round-14 retirements (the pre-verified EXPANDED 7-in/7-out
        # triage written in round 13 — NOTES.md "r14 registration
        # triage"; all seven in r14's due set, the r11-green cohort):
        # window_cumulative: running-sum ROWS frame ⊂ registered
        # window_range_frame's RANGE-frame family (r12-green), and the
        # cumulative shape also runs inside the scd2_history /
        # retention lineages.
        "window_cumulative",
        # mode_per_group: max_by-over-counts ≡ registered arg_extreme
        # (max_by/min_by, r13-green) composed with the value_counts
        # aggregate shape on a derived count.
        "mode_per_group",
        # pivot_counts: pivot ≡ groupBy + conditional agg; the
        # grouping-set API surface keeps driver rows via cube_agg +
        # grouping_sets + rollup_grouping_sets (cube_agg shares r14's
        # due set and stays registered).
        "pivot_counts",
        # percentiles: continuous-percentile twin of registered
        # quantile_band (same due set keeps quantile_band) — the
        # length_outliers precedent from r11.
        "percentiles",
        # embedding_normalize: pure codegen select whose normalize
        # lineage runs inside registered ann_recall_lsh_ivf /
        # cluster_representatives / embedding_qa rows.
        "embedding_normalize",
        # tpch_q12_priority_mix + tpch_q14_promo_share: single-join
        # conditional-agg shapes strictly dominated by the registered
        # q8/q19-class rows (multi-way joins over the same tables with
        # the same CASE-sum form); both stay value-checked as retired
        # tier-3 per the "retire TPC-H LAST" rule's pre-vetted
        # alternates list.
        "tpch_q12_priority_mix",
        "tpch_q14_promo_share",
    }
)


def oracle_sql() -> dict[str, str]:
    """Driver-checked oracle twins: the full impl map minus retired
    tier-3 variants (kept value-checked locally via
    retired_oracle_sql)."""
    return {
        k: v for k, v in _oracle_sql_impls().items() if k not in _RETIRED_TIER3
    }


def retired_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Tier-3 entries retired from the driver gate but still executed
    and value-checked by pytest against their DuckDB twins."""
    return {k: v for k, v in _query_impls().items() if k in _RETIRED_TIER3}


def retired_oracle_sql() -> dict[str, str]:
    return {
        k: v for k, v in _oracle_sql_impls().items() if k in _RETIRED_TIER3
    }


def _q_ngram_lm_score(spark, sf):
    """Bigram stupid-backoff LM fluency gate (operators/textan.
    ngram_lm_score): counts trained on the English slice, every doc
    scored by mean integer-proxy bigram probability — the CCNet-style
    perplexity filter. ROUND-9 registration candidate (the r8 window
    is committed to the five round-7 candidates; registration pairs
    with the pre-planned tranche retirement, see NOTES)."""
    docs = load_table(spark, sf, "documents")
    return X.ngram_lm_score(docs, docs.filter(F.col("lang") == "en"))


_NGRAM_LM_SQL = r"""
WITH t AS (
  SELECT doc_id, lang,
         string_split_regex(lower(trim(text)), '[ \t\n\x0B\f\r]+') AS tk
  FROM documents
), bgr AS (
  SELECT doc_id, lang,
         array_to_string(tk[(CAST(i AS BIGINT)+1):(CAST(i AS BIGINT)+2)], ' ') AS bg
  FROM t, UNNEST(range(CAST(greatest(len(tk)-1, 0) AS BIGINT))) AS u(i)
), c1 AS (
  SELECT w, CAST(count(*) AS BIGINT) AS c1
  FROM (SELECT unnest(tk) AS w FROM t WHERE lang = 'en') GROUP BY 1
), ntot AS (SELECT CAST(sum(c1) AS BIGINT) AS n_total FROM c1),
c2 AS (
  SELECT bg AS b2, CAST(count(*) AS BIGINT) AS c2
  FROM bgr WHERE lang = 'en' GROUP BY 1
), occ AS (
  SELECT doc_id, bg, split_part(bg, ' ', 1) AS w1,
         split_part(bg, ' ', 2) AS w2
  FROM bgr
), sc AS (
  SELECT o.doc_id,
         CASE WHEN c2.c2 IS NOT NULL THEN (c2.c2 * 1000000) // u1.c1
              WHEN u2.c1 IS NOT NULL
                THEN (2 * u2.c1 * 1000000) // (5 * nt.n_total)
              ELSE CAST(0 AS BIGINT) END AS s
  FROM occ o
  LEFT JOIN c2 ON o.bg = c2.b2
  LEFT JOIN c1 u1 ON o.w1 = u1.w
  LEFT JOIN c1 u2 ON o.w2 = u2.w
  CROSS JOIN ntot nt
), agg AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         CAST(sum(s) AS BIGINT) AS lm_sum
  FROM sc GROUP BY 1
)
SELECT doc_id, n_bigrams, lm_sum,
       CAST(lm_sum AS DOUBLE) / CAST(n_bigrams AS DOUBLE) AS lm_score
FROM agg
"""


def _q_scd2_history(spark, sf):
    """SCD type-2 validity intervals from the event log (operators/
    relational.scd2_history): per-user consecutive event_type runs →
    half-open [valid_from, valid_to) versions. ROUND-9 candidate."""
    return R.scd2_history(load_table(spark, sf, "events"))


_SCD2_SQL = """
WITH o AS (
  SELECT user_id, event_type, ts, event_id,
         CASE WHEN lag(event_type) OVER w IS NULL
                OR lag(event_type) OVER w <> event_type THEN 1 ELSE 0 END AS chg
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), v AS (
  SELECT user_id, event_type, ts,
         CAST(sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id)
              AS INT) AS ver
  FROM o
), runs AS (
  SELECT user_id, ver AS version, min(event_type) AS state,
         min(ts) AS valid_from, CAST(count(*) AS BIGINT) AS n_events
  FROM v GROUP BY 1, 2
)
SELECT user_id, version, state, valid_from,
       lead(valid_from) OVER w2 AS valid_to, n_events,
       (lead(valid_from) OVER w2 IS NULL) AS is_current
FROM runs WINDOW w2 AS (PARTITION BY user_id ORDER BY version)
"""


def _q_ivf_drift_report(spark, sf):
    """Codebook drift monitor (operators/similarity.ivf_drift_report):
    codebook Lloyd-trained on the vec_id<1000 'base' slice, drift
    measured over the FULL corpus — the retrain trigger completing
    the frozen-codebook append path. ROUND-9 candidate."""
    emb = load_table(spark, sf, "embeddings").select("vec_id", "embedding")
    base = emb.filter(F.col("vec_id") < 1000)
    _, cents = S.kmeans_lloyd(
        base, "embedding", "vec_id", k=4, iters=2, with_centroids=True
    )
    return S.ivf_drift_report(emb, cents)


def _ivf_drift_sql() -> str:
    return f"""
WITH {_kmeans_cte_sql('SELECT vec_id, embedding FROM embeddings WHERE vec_id < 1000')},
cb AS (
  SELECT cid, cv, sqrt(list_sum(list_transform(cv, x -> x*x))) AS cn FROM c1
), fe AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), fv AS (
  SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x*x))) AS vn FROM fe
), asg AS (
  -- distance ROUNDED before the argmin (ADVICE r8): collapses the
  -- expanded-form-vs-direct-sum ~1e-13 drift into exact ties, broken
  -- by lowest cid on both engines
  SELECT vec_id,
         (min(struct_pack(d := d, cid := cid, cos := cos))).cid AS cluster,
         (min(struct_pack(d := d, cid := cid, cos := cos))).cos AS cos
  FROM (
    SELECT f.vec_id, c.cid,
           round(list_sum(list_transform(range(1, len(f.v) + 1),
                    i -> (f.v[i] - c.cv[i]) * (f.v[i] - c.cv[i]))), 6) AS d,
           round(list_sum(list_transform(range(1, len(f.v) + 1),
                    i -> f.v[i] * c.cv[i]))
                 / ((CASE WHEN f.vn = 0 THEN 1 ELSE f.vn END)
                    * (CASE WHEN c.cn = 0 THEN 1 ELSE c.cn END)), 6) AS cos
    FROM fv f, cb c
  ) GROUP BY 1
), rep AS (
  -- LEFT JOIN from the codebook: dead centroids (zero assigned
  -- vectors) must appear with n_vecs=0 / NULL mean_cos, mirroring
  -- the operator's dead-list visibility contract
  SELECT c.cid AS centroid_id, CAST(count(a.vec_id) AS BIGINT) AS n_vecs,
         CASE WHEN count(a.vec_id) = 0 THEN NULL
              ELSE CAST(CAST(sum(CAST(a.cos AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE)
                   / CAST(count(a.vec_id) AS DOUBLE) END AS mean_cos
  FROM cb c LEFT JOIN asg a ON a.cluster = c.cid GROUP BY 1
), tot AS (SELECT CAST(sum(n_vecs) AS BIGINT) AS n FROM rep)
SELECT centroid_id, n_vecs, mean_cos,
       CASE WHEN n = 0 THEN 0.0
            ELSE CAST(n_vecs AS DOUBLE) * 4.0 / CAST(n AS DOUBLE) END
         AS occupancy_ratio,
       (n_vecs = 0 OR mean_cos < 0.2
        OR (CASE WHEN n = 0 THEN 0.0
                 ELSE CAST(n_vecs AS DOUBLE) * 4.0 / CAST(n AS DOUBLE) END) > 2.0)
         AS retrain
FROM rep, tot
"""


def _q_mmr_diversify(spark, sf):
    """MMR diversified top-k (operators/similarity.mmr_diversify):
    query = vec_id 0's embedding (the sim_topk_* convention), pool 40,
    k 5, λ 0.7. ROUND-9 candidate."""
    emb = load_table(spark, sf, "embeddings").select("vec_id", "embedding")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    return S.mmr_diversify(emb, qvec, k=5, pool=40, lam=0.7)


def _q_winnow_fingerprints(spark, sf):
    """Winnowing positional fingerprints (operators/textan.
    winnow_fingerprints, MOSS selection rule): k=5-gram two-channel
    poly hashes, window w=4, rightmost-min selection, over the
    doc_id%5=0 slice (fixture compactness — the operator is
    corpus-wide). ROUND-10-pool candidate."""
    docs = load_table(spark, sf, "documents").filter(F.col("doc_id") % 5 == 0)
    return X.winnow_fingerprints(docs, k=5, w=4)


def _winnow_sql(k: int = 5, w: int = 4) -> str:
    """DuckDB twin of _q_winnow_fingerprints: same tokenizer, same
    k-gram construction, same two-channel poly hash mod P31, and the
    same order-theoretic selection — min(struct(h, -pos)) over a
    ROWS w-1 PRECEDING frame (struct comparison is lexicographic on
    both engines)."""
    p131 = _DUCK_POLY.format(s="g", mult=131)
    p137 = _DUCK_POLY.format(s="g", mult=137)
    return f"""
WITH d AS (
  SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents WHERE doc_id % 5 = 0
),
g AS (
  SELECT doc_id, CAST(i AS BIGINT) AS pos,
         array_to_string(toks[CAST(i + 1 AS INT):CAST(i + {k} AS INT)], ' ') AS g
  FROM d, unnest(range(greatest(len(toks) - {k} + 1, 0))) AS u(i)
),
h AS (
  SELECT doc_id, pos,
         (({p131}) * 131 + ({p137})) % 2147483647 AS h
  FROM g
),
sel AS (
  SELECT doc_id, pos,
         min(struct_pack(h := h, np := -pos)) OVER (
           PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN {w - 1} PRECEDING AND CURRENT ROW) AS s
  FROM h
)
SELECT DISTINCT doc_id, -(s.np) AS fp_pos, s.h AS fp_hash
FROM sel WHERE pos >= {w - 1}
"""


def _mmr_sql(k: int = 5, pool: int = 40, lam: float = 0.7) -> str:
    """DuckDB twin of mmr_diversify: pool cut on rounded relevance,
    pool×pool rounded sim matrix, then the k greedy argmax steps
    UNROLLED as a CTE chain (the kmeans-unroll precedent — the
    sequential dependence is not join-expressible, but k is a small
    parameter). Tie-breaks replay min(struct(-score, id))."""
    steps, finals = [], []
    for i in range(1, k + 1):
        if i == 1:
            steps.append("""
s1 AS (
  SELECT (min(struct_pack(o := -rel, id := vec_id))).id AS id,
         -(min(struct_pack(o := -rel, id := vec_id))).o AS score
  FROM p
)""")
        else:
            sel = " UNION ALL ".join(
                f"SELECT id FROM s{j}" for j in range(1, i)
            )
            steps.append(f"""
s{i} AS (
  SELECT (min(struct_pack(o := -mmr, id := vec_id))).id AS id,
         -(min(struct_pack(o := -mmr, id := vec_id))).o AS score
  FROM (
    SELECT p.vec_id,
           round({lam!r} * p.rel - {1.0 - lam!r} * (
             SELECT max(s.s) FROM sim s
             WHERE s.i = p.vec_id AND s.j IN ({sel})
           ), 6) AS mmr
    FROM p WHERE p.vec_id NOT IN ({sel})
  )
)""")
        finals.append(
            f"SELECT {i} AS rank, p.vec_id, p.rel AS relevance, "
            f"s{i}.score AS mmr_score FROM s{i} JOIN p ON p.vec_id = s{i}.id"
        )
    return f"""
WITH q AS (
  SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
  FROM embeddings WHERE vec_id = 0
), e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), en AS (
  SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x*x))) AS nv FROM e
), qn AS (
  SELECT qv, sqrt(list_sum(list_transform(qv, x -> x*x))) AS nq FROM q
), scored AS (
  SELECT e.vec_id, e.v, e.nv,
         round(list_sum(list_transform(range(1, len(e.v) + 1),
                        i -> e.v[i] * q.qv[i]))
               / ((CASE WHEN e.nv = 0 THEN 1 ELSE e.nv END)
                  * (CASE WHEN q.nq = 0 THEN 1 ELSE q.nq END)), 6) AS rel
  FROM en e, qn q
), p AS (
  SELECT vec_id, v, nv, rel FROM scored
  ORDER BY rel DESC, vec_id LIMIT {pool}
), sim AS (
  SELECT a.vec_id AS i, b.vec_id AS j,
         round(list_sum(list_transform(range(1, len(a.v) + 1),
                        ii -> a.v[ii] * b.v[ii]))
               / ((CASE WHEN a.nv = 0 THEN 1 ELSE a.nv END)
                  * (CASE WHEN b.nv = 0 THEN 1 ELSE b.nv END)), 6) AS s
  FROM p a JOIN p b ON a.vec_id <> b.vec_id
),{",".join(steps)}
{" UNION ALL ".join(finals)}
"""


def _q_winnow_matches(spark, sf):
    """Span-level cross-corpus overlap (operators/textan.
    winnow_matches — the MOSS report step): corpus A = the doc_id%4=0
    slice, corpus B = the same docs re-identified (+1000000) with a
    6-token prelude prepended, so every A doc shares its full text
    run with its B twin (the detection guarantee applies: shared run
    >> w+k-1) while positions SHIFT by the prelude — the span
    columns prove localization, not just pairing. max_df=50 caps
    viral fingerprints, min_shared=2 drops hash-collision noise.
    ROUND-10-pool candidate."""
    docs = load_table(spark, sf, "documents")
    a = docs.filter(F.col("doc_id") % 4 == 0).select("doc_id", "text")
    b = docs.filter(F.col("doc_id") % 4 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(
            F.lit("prelude tokens pad out the head "), F.col("text")
        ).alias("text"),
    )
    return X.winnow_matches(a, b, k=5, w=4, max_df=50, min_shared=2)


def _winnow_side_cte(tag: str, src_sql: str, text_expr: str, k: int, w: int) -> str:
    """Per-side winnow CTE chain (d→g→h→sel→fp) with a tag suffix;
    same construction as _winnow_sql but parameterized on the source
    rows and the text expression (corpus B prepends a prelude)."""
    toks = f"string_split_regex(lower(trim({text_expr})), '[ \\t\\n\\x0B\\f\\r]+')"
    p131 = _DUCK_POLY.format(s="g", mult=131)
    p137 = _DUCK_POLY.format(s="g", mult=137)
    return f"""
d{tag} AS (SELECT doc_id, {toks} AS toks FROM ({src_sql})),
g{tag} AS (
  SELECT doc_id, CAST(i AS BIGINT) AS pos,
         array_to_string(toks[CAST(i + 1 AS INT):CAST(i + {k} AS INT)], ' ') AS g
  FROM d{tag}, unnest(range(greatest(len(toks) - {k} + 1, 0))) AS u(i)
),
h{tag} AS (
  SELECT doc_id, pos, (({p131}) * 131 + ({p137})) % 2147483647 AS h FROM g{tag}
),
sel{tag} AS (
  SELECT doc_id, pos,
         min(struct_pack(h := h, np := -pos)) OVER (
           PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN {w - 1} PRECEDING AND CURRENT ROW) AS s
  FROM h{tag}
),
fp{tag} AS (
  SELECT DISTINCT doc_id, -(s.np) AS fp_pos, s.h AS fp_hash
  FROM sel{tag} WHERE pos >= {w - 1}
),
r{tag} AS (
  SELECT * FROM fp{tag} WHERE fp_hash IN (
    SELECT fp_hash FROM (
      SELECT fp_hash, count(DISTINCT doc_id) AS c FROM fp{tag} GROUP BY 1
    ) WHERE c <= 50)
)"""


def _winnow_matches_sql(k: int = 5, w: int = 4, min_shared: int = 2) -> str:
    """DuckDB twin of _q_winnow_matches: both winnow pipelines
    replayed per side, per-side document-frequency cap, hash
    equi-join, per-pair count + span extents."""
    a = _winnow_side_cte(
        "a", "SELECT doc_id, text FROM documents WHERE doc_id % 4 = 0", "text", k, w
    )
    b = _winnow_side_cte(
        "b",
        "SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 4 = 0",
        "'prelude tokens pad out the head ' || text",
        k,
        w,
    )
    return f"""
WITH {a.lstrip()},
{b.lstrip()}
SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       CAST(count(DISTINCT a.fp_hash) AS BIGINT) AS n_shared,
       min(a.fp_pos) AS a_span_start, max(a.fp_pos) AS a_span_end,
       min(b.fp_pos) AS b_span_start, max(b.fp_pos) AS b_span_end
FROM ra a JOIN rb b ON a.fp_hash = b.fp_hash
GROUP BY 1, 2
HAVING count(DISTINCT a.fp_hash) >= {min_shared}
"""


def _q_dup_spans(spark, sf):
    """Exact duplicated-substring spans (operators/textan.dup_spans,
    Lee et al. 2021 arXiv 2107.06499): every maximal token span whose
    8-gram content occurs >= 2 times corpus-wide, with integer span
    bounds. Runs over the FULL documents table — cross-document
    duplicate detection cannot slice (a planted duplicate's partner
    may fall outside any slice). ROUND-11-pool candidate."""
    docs = load_table(spark, sf, "documents")
    return X.dup_spans(docs, length=8)


def _q_dup_span_stats(spark, sf):
    """Per-document duplicated-token budget over dup_spans (the Lee
    et al. drop/trim decision signal): n_tokens, dup_tokens, n_spans,
    exact-integer dup_ppm; zero-span docs report 0-ppm rows.
    ROUND-11-pool candidate."""
    docs = load_table(spark, sf, "documents")
    return X.dup_span_stats(docs, length=8)


def _dup_spans_core_sql(
    length: int = 8, min_count: int = 2, source_sql: str = "SELECT * FROM documents"
) -> str:
    """Shared CTE chain for the dup_spans twins: tokenize, L-gram,
    two-channel poly hash, corpus-global occurrence count, gap-merge
    via lag + running sum — the same order-theoretic construction the
    Spark side runs, all integer. ``source_sql`` parameterizes the
    corpus (the incremental twin unions a re-identified shard in)."""
    p131 = _DUCK_POLY.format(s="g", mult=131)
    p137 = _DUCK_POLY.format(s="g", mult=137)
    return f"""
d AS (
  SELECT doc_id, {_DUCK_TOKS} AS toks FROM ({source_sql})
),
g AS (
  SELECT doc_id, CAST(i AS BIGINT) AS pos,
         array_to_string(toks[CAST(i + 1 AS INT):CAST(i + {length} AS INT)], ' ') AS g
  FROM d, unnest(range(greatest(len(toks) - {length} + 1, 0))) AS u(i)
),
hh AS (
  -- two 31-bit channels combined WIDE (h131*P31 + h137 < 2^62): a
  -- collision here fabricates a duplicate span, so the dup family
  -- does NOT fold back mod P31 the way the winnowing sketch does
  SELECT doc_id, pos,
         ({p131}) * 2147483647 + ({p137}) AS h
  FROM g
),
occ AS (
  SELECT h, count(*) AS n_occ FROM hh GROUP BY 1
),
dup AS (
  SELECT hh.doc_id, hh.pos FROM hh JOIN occ USING (h)
  WHERE occ.n_occ >= {min_count}
),
fl AS (
  SELECT doc_id, pos,
         CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL
                OR pos > lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                         + {length}
              THEN 1 ELSE 0 END AS nw
  FROM dup
),
runs AS (
  SELECT doc_id, pos,
         sum(nw) OVER (PARTITION BY doc_id ORDER BY pos
                       ROWS UNBOUNDED PRECEDING) AS run
  FROM fl
),
spans AS (
  SELECT doc_id,
         min(pos) AS span_start,
         max(pos) + {length - 1} AS span_end,
         max(pos) + {length - 1} - min(pos) + 1 AS span_len,
         CAST(count(*) AS BIGINT) AS n_dup_grams
  FROM runs GROUP BY doc_id, run
)"""


def _dup_spans_sql(length: int = 8, min_count: int = 2) -> str:
    return f"""
WITH {_dup_spans_core_sql(length, min_count)}
SELECT doc_id, span_start, span_end, span_len, n_dup_grams FROM spans
"""


def _dup_span_stats_sql(length: int = 8, min_count: int = 2) -> str:
    return f"""
WITH {_dup_spans_core_sql(length, min_count)},
per AS (
  SELECT doc_id, CAST(sum(span_len) AS BIGINT) AS dup_tokens,
         CAST(count(*) AS BIGINT) AS n_spans
  FROM spans GROUP BY 1
)
SELECT d.doc_id,
       CAST(len(d.toks) AS BIGINT) AS n_tokens,
       coalesce(per.dup_tokens, 0) AS dup_tokens,
       coalesce(per.n_spans, 0) AS n_spans,
       CAST((1000000 * coalesce(per.dup_tokens, 0))
            // greatest(CAST(len(d.toks) AS BIGINT), 1) AS BIGINT) AS dup_ppm
FROM d LEFT JOIN per USING (doc_id)
"""


def _q_strip_dup_spans(spark, sf):
    """The removal step of Lee et al. 2021 (operators/textan.
    strip_dup_spans): each document reassembled with its duplicated
    spans' tokens cut out, plus before/after token counts.
    ROUND-11-pool candidate."""
    docs = load_table(spark, sf, "documents")
    return X.strip_dup_spans(docs, length=8)


def _strip_dup_spans_sql(length: int = 8, min_count: int = 2) -> str:
    """DuckDB twin of strip_dup_spans: the dup_spans CTE chain, spans
    list-aggregated per doc, tokens posexploded and cut with a
    list_filter containment test, then string_agg(ORDER BY pos) —
    the same cut-and-reassemble, same all-stripped '' contract."""
    return f"""
WITH {_dup_spans_core_sql(length, min_count)},
per AS (
  SELECT doc_id,
         list(struct_pack(s := span_start, e := span_end)) AS sp
  FROM spans GROUP BY 1
),
tok AS (
  SELECT doc_id, CAST(i AS BIGINT) AS pos, toks[CAST(i + 1 AS INT)] AS tok
  FROM d, unnest(range(len(toks))) AS u(i)
),
kept AS (
  SELECT t.doc_id, t.pos, t.tok
  FROM tok t LEFT JOIN per USING (doc_id)
  WHERE per.sp IS NULL
     OR len(list_filter(per.sp,
                        x -> t.pos >= x.s AND t.pos <= x.e)) = 0
),
ka AS (
  SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS clean_text,
         CAST(count(*) AS BIGINT) AS kept_tokens
  FROM kept GROUP BY 1
)
SELECT d.doc_id,
       coalesce(ka.clean_text, '') AS clean_text,
       CAST(len(d.toks) AS BIGINT) AS n_tokens,
       coalesce(ka.kept_tokens, 0) AS kept_tokens
FROM d LEFT JOIN ka USING (doc_id)
"""


def _q_pq_adc_topk(spark, sf):
    """Product-quantization ADC retrieval (operators/pq, Jégou et al.
    TPAMI 2011): train a m=4 × ksub=4 codebook over the embeddings
    (2 Lloyd rounds, lowest-id init — the kmeans_clusters convention),
    PQ-encode the corpus, and rank it against vec 0's embedding by
    asymmetric distance. Scores are exact BIGINT micro-unit sums of a
    literal LUT (no float in the hashed output — the bm25 lesson);
    assignment distances round to 4dp before the argmin with ties to
    the lowest code (coarser than ivf_drift's 6dp: the sf0.1 fixture
    measured a 6dp pre-round margin inside drift distance, so the PQ
    grid keeps three orders of safety; margins probed by
    tools/audit_round_boundaries.py). ROUND-12-pool
    candidate."""
    from data_pengadaan_agent_spark.operators import pq as PQ

    emb = load_table(spark, sf, "embeddings").select("vec_id", "embedding")
    cb = PQ.train_pq(emb, dim=64, m=4, ksub=4, iters=2)
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    codes = PQ.pq_encode(emb, cb)
    return PQ.pq_adc_topk(codes, cb, qvec, k=10)


def _pq_subspace_parts(
    m: int,
    ksub: int,
    dsub: int,
    src: str,
    lut_cte: str | None,
    lut_keys: str = "",
    encode_src: str | None = None,
) -> list[str]:
    """Shared per-subspace CTE builder for the PQ twins: 2-round Lloyd
    (lowest-id init, round(d,4)-then-argmin with lowest-code ties,
    empty-cluster carryover) over ``src`` (vec_id, v), plus the
    floor(d·1e6 + 0.5) BIGINT LUT against ``lut_cte`` rows (qv
    [, lut_keys]) — ivfpq passes lut_keys="list" for per-probed-list
    LUTs, the batched ivfpq twin the composite "qid, list";
    ``lut_cte=None`` omits the LUT CTEs (the ingest twin only
    needs codes). ``encode_src`` lets the FINAL assignment run over a
    different frame than training (the streaming-ingest twin trains
    on the base slice, encodes everything — the frozen-geometry
    append semantics). kraw/a1raw/lutraw expose the PRE-round values
    for tools/audit_round_boundaries.py's margin probes."""
    enc = encode_src or src
    parts = []
    for s in range(m):
        off = s * dsub
        rawdist = (
            f"list_sum(list_transform(range(1, {dsub} + 1), "
            f"i -> ({src}.v[{off} + i] - c.cv[i]) * ({src}.v[{off} + i] - c.cv[i])))"
        )
        qdist = (
            f"list_sum(list_transform(range(1, {dsub} + 1), "
            f"i -> (p.qv[{off} + i] - c.cv[i]) * (p.qv[{off} + i] - c.cv[i])))"
        )
        key_list = [x.strip() for x in lut_keys.split(",") if x.strip()]
        keys = "".join(f"p.{x}, " for x in key_list)
        keyout = "".join(f"{x}, " for x in key_list)
        encdist = (
            f"list_sum(list_transform(range(1, {dsub} + 1), "
            f"i -> ({enc}.v[{off} + i] - c.cv[i]) * ({enc}.v[{off} + i] - c.cv[i])))"
        )
        lut_block = f"""
lutraw_{s} AS (
  SELECT {keys}c.code, {qdist} * 1000000 AS ql FROM c1_{s} c, {lut_cte} p
),
lut_{s} AS (
  SELECT {keyout}code, CAST(floor(ql + 0.5) AS BIGINT) AS lv FROM lutraw_{s}
),""" if lut_cte is not None else ""
        parts.append(f"""
c0_{s} AS (
  SELECT CAST(vec_id AS INT) AS code, v[{off + 1}:{off + dsub}] AS cv
  FROM {src} WHERE vec_id < {ksub}
),
a1raw_{s} AS (
  SELECT {src}.vec_id, c.code, {rawdist} AS d_pre FROM {src}, c0_{s} c
),
a1_{s} AS (
  SELECT vec_id, (min(struct_pack(d := d, code := code))).code AS code
  FROM (SELECT vec_id, code, round(d_pre, 4) AS d FROM a1raw_{s}) GROUP BY 1
),
m1_{s} AS (
  SELECT code, dim, avg(val) AS mval FROM (
    SELECT a.code, unnest({src}.v[{off + 1}:{off + dsub}]) AS val,
           unnest(range(1, {dsub} + 1)) AS dim
    FROM a1_{s} a JOIN {src} USING (vec_id)
  ) GROUP BY 1, 2
),
c1_{s} AS (
  -- empty-cluster rule: a code with no members keeps its init centroid
  SELECT c0.code, coalesce(u.cv, c0.cv) AS cv
  FROM c0_{s} c0 LEFT JOIN (
    SELECT code, list(mval ORDER BY dim) AS cv FROM m1_{s} GROUP BY 1
  ) u USING (code)
),{lut_block}
kraw_{s} AS (
  SELECT {enc}.vec_id, c.code, {encdist} AS d_pre FROM {enc}, c1_{s} c
),
k_{s} AS (
  SELECT vec_id, (min(struct_pack(d := d, code := code))).code AS code
  FROM (SELECT vec_id, code, round(d_pre, 4) AS d FROM kraw_{s}) GROUP BY 1
)""")
    return parts


def _pq_adc_sql(
    m: int = 4,
    ksub: int = 4,
    dim: int = 64,
    k: int = 10,
    tail: str | None = None,
) -> str:
    """DuckDB twin of _q_pq_adc_topk: per subspace, the identical
    2-round Lloyd (lowest-id init, round(d,4)-then-argmin with
    lowest-code ties, empty-cluster carryover), the identical
    floor(d·1e6 + 0.5) BIGINT LUT, integer score sum, rank by
    (score, vec_id). ``tail`` swaps the final SELECT — used by
    tools/audit_round_boundaries.py to emit the PRE-round assignment
    and LUT distances for margin probing from the same CTE bodies
    (one source of truth)."""
    dsub = dim // m
    parts = [
        """
e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
q AS (SELECT v AS qv FROM e WHERE vec_id = 0)"""
    ] + _pq_subspace_parts(m, ksub, dsub, src="e", lut_cte="q")
    if tail is not None:
        return f"WITH {','.join(parts)}\n{tail}"
    code_joins = " ".join(f"JOIN k_{s} USING (vec_id)" for s in range(1, m))
    lut_joins = " ".join(
        f"JOIN lut_{s} l{s} ON l{s}.code = k_{s}.code" for s in range(m)
    )
    score = " + ".join(f"l{s}.lv" for s in range(m))
    return f"""
WITH {",".join(parts)},
scored AS (
  SELECT k_0.vec_id, CAST({score} AS BIGINT) AS adc_score
  FROM k_0 {code_joins} {lut_joins}
)
SELECT CAST(row_number() OVER (ORDER BY adc_score, vec_id) AS INT) AS rank,
       vec_id, adc_score
FROM scored ORDER BY adc_score, vec_id LIMIT {k}
"""


def _q_ivfpq_adc_topk(spark, sf):
    """IVF-PQ composition (operators/pq — Jégou et al. TPAMI 2011
    §III, IVFADC): coarse quantizer = the EXACT vectors of ids 0..3
    (no training drift by construction), residual PQ m=4 × ksub=4
    (2 Lloyd rounds), codes written PARTITIONED BY coarse list, query
    = vec 0's embedding probing n_probe=2 lists — the scan carries a
    LITERAL PartitionFilter and each probed list scores against its
    own residual LUT in exact BIGINT micro-units. ROUND-12-pool
    candidate."""
    from data_pengadaan_agent_spark.operators import pq as PQ

    emb = load_table(spark, sf, "embeddings").select("vec_id", "embedding")
    path = _warehouse_path(spark, sf, "ivfpq_codes")
    expected = emb.count()
    try:
        coarse, cb = PQ.load_ivfpq_codebooks(spark, path)
        fresh = (
            len(coarse) == 4
            and len(cb) == 4
            and len(cb[0]) == 4
            and spark.read.parquet(path).count() == expected
        )
    except Exception:
        fresh = False
    if not fresh:
        coarse, cb = PQ.build_ivfpq_table(
            emb, path, dim=64, kc=4, m=4, ksub=4, iters=2
        )
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    return PQ.ivfpq_adc_topk(spark, path, coarse, cb, qvec, k=10, n_probe=2)


def _ivfpq_adc_sql(
    kc: int = 4,
    m: int = 4,
    ksub: int = 4,
    dim: int = 64,
    k: int = 10,
    n_probe: int = 2,
    tail: str | None = None,
) -> str:
    """DuckDB twin of _q_ivfpq_adc_topk: exact coarse codebook (ids
    0..kc-1 verbatim), coarse assignment by round(d,4)-argmin with
    lowest-list ties, exact residual subtraction, the SHARED
    subspace-training CTEs over the residual frame, per-probed-list
    LUTs, and the pruned scoring restricted to the probed lists."""
    dsub = dim // m
    fulldist = (
        f"list_sum(list_transform(range(1, {dim} + 1), "
        f"i -> (e.v[i] - c.cv[i]) * (e.v[i] - c.cv[i])))"
    )
    qfulldist = (
        f"list_sum(list_transform(range(1, {dim} + 1), "
        f"i -> (q.qv[i] - c.cv[i]) * (q.qv[i] - c.cv[i])))"
    )
    parts = [
        f"""
e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
cc AS (
  SELECT CAST(vec_id AS INT) AS list, v AS cv FROM e WHERE vec_id < {kc}
),
asgraw AS (
  SELECT e.vec_id, c.list, {fulldist} AS d_pre FROM e, cc c
),
asg AS (
  SELECT vec_id, (min(struct_pack(d := d, list := list))).list AS list
  FROM (SELECT vec_id, list, round(d_pre, 4) AS d FROM asgraw) GROUP BY 1
),
r AS (
  SELECT e.vec_id, a.list,
         list_transform(range(1, {dim} + 1), i -> e.v[i] - c.cv[i]) AS v
  FROM e JOIN asg a USING (vec_id) JOIN cc c ON c.list = a.list
),
proberaw AS (
  SELECT c.list, {qfulldist} AS d_pre FROM cc c, q
),
probe AS (
  SELECT list FROM (SELECT list, round(d_pre, 4) AS d FROM proberaw)
  ORDER BY d, list LIMIT {n_probe}
),
qres AS (
  SELECT c.list,
         list_transform(range(1, {dim} + 1), i -> q.qv[i] - c.cv[i]) AS qv
  FROM cc c JOIN probe USING (list), q
)"""
    ] + _pq_subspace_parts(m, ksub, dsub, src="r", lut_cte="qres", lut_keys="list")
    if tail is not None:
        return f"WITH {','.join(parts)}\n{tail}"
    code_joins = " ".join(f"JOIN k_{s} USING (vec_id)" for s in range(1, m))
    lut_joins = " ".join(
        f"JOIN lut_{s} l{s} ON l{s}.code = k_{s}.code AND l{s}.list = a.list"
        for s in range(m)
    )
    score = " + ".join(f"l{s}.lv" for s in range(m))
    return f"""
WITH {",".join(parts)},
scored AS (
  SELECT k_0.vec_id, CAST({score} AS BIGINT) AS adc_score
  FROM k_0 {code_joins}
  JOIN asg a ON a.vec_id = k_0.vec_id
  JOIN probe pr ON pr.list = a.list
  {lut_joins}
)
SELECT CAST(row_number() OVER (ORDER BY adc_score, vec_id) AS INT) AS rank,
       vec_id, adc_score
FROM scored ORDER BY adc_score, vec_id LIMIT {k}
"""


def _q_ivfpq_adc_batch(spark, sf):
    """Batched multi-query ADC over the IVF-PQ index
    (operators/pq.ivfpq_adc_batch — VERDICT r10 ask #4): the same
    kc=4 coarse / m=4 × ksub=4 residual geometry and warehouse table
    as ivfpq_adc_topk, queried by every vec_id%200==0 embedding at
    once with n_probe=2 — the scan reads ONLY the union of the
    queries' probed lists (one literal PartitionFilter), each row
    scored only for the queries that probed its list with that
    (query, list)'s residual LUT. Top-5 per query. ROUND-12-pool
    candidate."""
    from data_pengadaan_agent_spark.operators import pq as PQ

    emb = load_table(spark, sf, "embeddings").select("vec_id", "embedding")
    path = _warehouse_path(spark, sf, "ivfpq_codes")
    expected = emb.count()
    try:
        coarse, cb = PQ.load_ivfpq_codebooks(spark, path)
        fresh = (
            len(coarse) == 4
            and len(cb) == 4
            and len(cb[0]) == 4
            and spark.read.parquet(path).count() == expected
        )
    except Exception:
        fresh = False
    if not fresh:
        coarse, cb = PQ.build_ivfpq_table(
            emb, path, dim=64, kc=4, m=4, ksub=4, iters=2
        )
    queries = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in emb.filter(F.col("vec_id") % 200 == 0).collect()
    ]
    return PQ.ivfpq_adc_batch(
        spark, path, coarse, cb, queries, k=5, n_probe=2
    )


def _ivfpq_adc_batch_sql(
    kc: int = 4,
    m: int = 4,
    ksub: int = 4,
    dim: int = 64,
    k: int = 5,
    n_probe: int = 2,
    tail: str | None = None,
) -> str:
    """DuckDB twin of _q_ivfpq_adc_batch: the single-query ivfpq twin's
    coarse/residual CTEs with a per-qid probe ranking (row_number over
    rounded coarse distance, ties to the lowest list — the operator's
    driver-side rule verbatim), per-(qid, list) residual LUTs via the
    SHARED subspace CTE builder (composite lut_keys), and scoring
    restricted to each query's OWN probed lists."""
    dsub = dim // m
    fulldist = (
        f"list_sum(list_transform(range(1, {dim} + 1), "
        f"i -> (e.v[i] - c.cv[i]) * (e.v[i] - c.cv[i])))"
    )
    qfulldist = (
        f"list_sum(list_transform(range(1, {dim} + 1), "
        f"i -> (q.qv[i] - c.cv[i]) * (q.qv[i] - c.cv[i])))"
    )
    parts = [
        f"""
e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
qs AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id % 200 = 0),
cc AS (
  SELECT CAST(vec_id AS INT) AS list, v AS cv FROM e WHERE vec_id < {kc}
),
asgraw AS (
  SELECT e.vec_id, c.list, {fulldist} AS d_pre FROM e, cc c
),
asg AS (
  SELECT vec_id, (min(struct_pack(d := d, list := list))).list AS list
  FROM (SELECT vec_id, list, round(d_pre, 4) AS d FROM asgraw) GROUP BY 1
),
r AS (
  SELECT e.vec_id, a.list,
         list_transform(range(1, {dim} + 1), i -> e.v[i] - c.cv[i]) AS v
  FROM e JOIN asg a USING (vec_id) JOIN cc c ON c.list = a.list
),
proberaw AS (
  SELECT q.qid, c.list, {qfulldist} AS d_pre FROM cc c, qs q
),
probe AS (
  SELECT qid, list FROM (
    SELECT qid, list,
           row_number() OVER (PARTITION BY qid ORDER BY round(d_pre, 4), list)
             AS prk
    FROM proberaw
  ) WHERE prk <= {n_probe}
),
qres AS (
  SELECT p.qid, p.list,
         list_transform(range(1, {dim} + 1), i -> q.qv[i] - c.cv[i]) AS qv
  FROM probe p JOIN cc c USING (list) JOIN qs q USING (qid)
)"""
    ] + _pq_subspace_parts(
        m, ksub, dsub, src="r", lut_cte="qres", lut_keys="qid, list"
    )
    if tail is not None:
        return f"WITH {','.join(parts)}\n{tail}"
    code_joins = " ".join(f"JOIN k_{s} USING (vec_id)" for s in range(1, m))
    lut_joins = " ".join(
        f"JOIN lut_{s} l{s} ON l{s}.qid = pr.qid AND l{s}.list = a.list "
        f"AND l{s}.code = k_{s}.code"
        for s in range(m)
    )
    score = " + ".join(f"l{s}.lv" for s in range(m))
    return f"""
WITH {",".join(parts)},
scored AS (
  SELECT pr.qid, k_0.vec_id, CAST({score} AS BIGINT) AS adc_score
  FROM k_0 {code_joins}
  JOIN asg a ON a.vec_id = k_0.vec_id
  JOIN probe pr ON pr.list = a.list
  {lut_joins}
),
rk AS (
  SELECT qid, vec_id, adc_score,
         row_number() OVER (PARTITION BY qid
                            ORDER BY adc_score, vec_id) AS rnk
  FROM scored
)
SELECT qid, CAST(rnk AS INT) AS rank, vec_id, adc_score
FROM rk WHERE rnk <= {k}
"""


def _q_pq_adc_batch(spark, sf):
    """Batched multi-query ADC (operators/pq.pq_adc_batch): the same
    m=4 × ksub=4 geometry as pq_adc_topk, queried by every
    vec_id%200==0 embedding at once — the compressed-corpus analog of
    mine_hard_negatives, top-5 per query. One Arrow scan of the codes
    scores all queries; the only exchange carries partition-partial
    top-k rows. ROUND-12-pool candidate."""
    from data_pengadaan_agent_spark.operators import pq as PQ

    emb = load_table(spark, sf, "embeddings").select("vec_id", "embedding")
    cb = PQ.train_pq(emb, dim=64, m=4, ksub=4, iters=2)
    codes = PQ.pq_encode(emb, cb)
    queries = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in emb.filter(F.col("vec_id") % 200 == 0).collect()
    ]
    return PQ.pq_adc_batch(codes, cb, queries, k=5)


def _pq_adc_batch_sql(
    m: int = 4,
    ksub: int = 4,
    dim: int = 64,
    k: int = 5,
    tail: str | None = None,
) -> str:
    """DuckDB twin of _q_pq_adc_batch: the SAME shared training CTEs
    as the single-query twin, with per-qid LUTs (lut_keys='qid') and
    a per-qid ranking over the full cross of codes × queries."""
    dsub = dim // m
    parts = [
        """
e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
qs AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id % 200 = 0)"""
    ] + _pq_subspace_parts(m, ksub, dsub, src="e", lut_cte="qs", lut_keys="qid")
    if tail is not None:
        return f"WITH {','.join(parts)}\n{tail}"
    code_joins = " ".join(f"JOIN k_{s} USING (vec_id)" for s in range(1, m))
    lut_joins = " ".join(
        f"JOIN lut_{s} l{s} ON l{s}.qid = q.qid AND l{s}.code = k_{s}.code"
        for s in range(m)
    )
    score = " + ".join(f"l{s}.lv" for s in range(m))
    return f"""
WITH {",".join(parts)},
scored AS (
  SELECT q.qid, k_0.vec_id, CAST({score} AS BIGINT) AS adc_score
  FROM k_0 {code_joins} CROSS JOIN (SELECT DISTINCT qid FROM qs) q
  {lut_joins}
),
r AS (
  SELECT qid, vec_id, adc_score,
         row_number() OVER (PARTITION BY qid
                            ORDER BY adc_score, vec_id) AS rk
  FROM scored
)
SELECT qid, CAST(rk AS INT) AS rank, vec_id, adc_score
FROM r WHERE rk <= {k}
"""


def _q_sq_topk(spark, sf):
    """Scalar-quantization retrieval (operators/sq, SQ8): per-dim
    min/max quantizer trained in ONE codegen aggregate, corpus encoded
    by a pure zip_with expression (no Python worker anywhere — the
    codegen-only compression tier between raw vectors and PQ), vec 0's
    embedding quantized under the same rule and ranked by exact BIGINT
    symmetric L2 over the codes. Cross-engine equality is STRUCTURAL:
    both engines run the identical (x−mn)·sc floor(+0.5) ops on
    bit-identical doubles. ROUND-13-pool candidate."""
    from data_pengadaan_agent_spark.operators import sq as SQ

    emb = load_table(spark, sf, "embeddings").select("vec_id", "embedding")
    mins, scales = SQ.train_sq(emb, dim=64)
    codes = SQ.sq_encode(emb, mins, scales)
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    return SQ.sq_topk(codes, SQ.encode_query(qvec, mins, scales), k=10)


def _q_sq_quant_report(spark, sf):
    """SQ quantizer-staleness monitor (operators/sq.
    sq_quantization_report): exact integer reconstruction-error totals
    + the clamp counter (out-of-range saturation = the retrain signal)
    under the corpus-trained quantizer, one summary row, all codegen.
    ROUND-13-pool candidate."""
    from data_pengadaan_agent_spark.operators import sq as SQ

    emb = load_table(spark, sf, "embeddings").select("vec_id", "embedding")
    mins, scales = SQ.train_sq(emb, dim=64)
    return SQ.sq_quantization_report(emb, mins, scales)


def _sq_core_sql(dim: int = 64, levels: int = 255) -> str:
    """Shared CTE chain for the SQ twins: per-dim exact min/max, the
    (mn, sc) quantizer, and per-vector code lists via the IDENTICAL
    clamp(floor((x − mn)·sc + 0.5)) expression the Spark side runs —
    one subtraction, one multiply, one floor on bit-identical doubles,
    so equality is structural (operators/sq.py docstring)."""
    return f"""
e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
dims AS (
  SELECT i, min(e.v[i]) AS mn, max(e.v[i]) AS mx
  FROM e, UNNEST(range(1, {dim} + 1)) AS u(i)
  GROUP BY 1
),
quant AS (
  SELECT i, mn,
         CASE WHEN mx = mn THEN 0.0
              ELSE {float(levels)} / (mx - mn) END AS sc
  FROM dims
),
qlists AS (
  SELECT list(mn ORDER BY i) AS mns, list(sc ORDER BY i) AS scs FROM quant
),
coderaw AS (
  -- scaled value BEFORE the +0.5: floor(x + 0.5) flips when x sits on
  -- an integer half, so the margin probe's danger grid is decimals=0
  -- halves of THIS column (the pq lutraw convention)
  SELECT e.vec_id, q.i, (e.v[q.i] - q.mn) * q.sc AS scaled
  FROM e, quant q
),
codes AS (
  SELECT vec_id,
         list(least({levels}, greatest(0, CAST(floor(scaled + 0.5) AS BIGINT)))
              ORDER BY i) AS c
  FROM coderaw GROUP BY 1
)"""


def _sq_topk_sql(
    dim: int = 64, levels: int = 255, k: int = 10, tail: str | None = None
) -> str:
    """DuckDB twin of _q_sq_topk. ``tail`` exposes the pre-floor
    encode values for tools/audit_round_boundaries.py (decimals=0 —
    the floor grid), belt-and-braces on top of the structural-equality
    argument."""
    core = _sq_core_sql(dim, levels)
    if tail is not None:
        return f"WITH {core}\n{tail}"
    return f"""
WITH {core},
qc AS (SELECT c AS qc FROM codes WHERE vec_id = 0),
scored AS (
  SELECT codes.vec_id,
         CAST(list_sum(list_transform(range(1, {dim} + 1),
              i -> (c[i] - qc[i]) * (c[i] - qc[i]))) AS BIGINT) AS sq_score
  FROM codes, qc
)
SELECT CAST(row_number() OVER (ORDER BY sq_score, vec_id) AS INT) AS rank,
       vec_id, sq_score
FROM scored ORDER BY sq_score, vec_id LIMIT {k}
"""


def _sq_quant_report_sql(
    dim: int = 64, levels: int = 255, err_dp: int = 6
) -> str:
    """DuckDB twin of _q_sq_quant_report: decode = c/sc + mn (sc=0 →
    mn), the per-vector error fold in the SAME array order as Spark's
    sequential aggregate, exact integer micro-units, clamp counter
    from the UNCLAMPED floor value."""
    return f"""
WITH {_sq_core_sql(dim, levels)},
per AS (
  SELECT e.vec_id,
         CAST(floor(list_sum(list_transform(range(1, {dim} + 1), i ->
             (e.v[i] - (CASE WHEN ql.scs[i] = 0.0 THEN 0.0
                             ELSE CAST(c.c[i] AS DOUBLE) / ql.scs[i] END
                        + ql.mns[i]))
             * (e.v[i] - (CASE WHEN ql.scs[i] = 0.0 THEN 0.0
                               ELSE CAST(c.c[i] AS DOUBLE) / ql.scs[i] END
                          + ql.mns[i]))))
           * {float(10 ** err_dp)} + 0.5) AS BIGINT) AS err_micro,
         CAST(list_sum(list_transform(range(1, {dim} + 1), i ->
             CASE WHEN floor((e.v[i] - ql.mns[i]) * ql.scs[i] + 0.5) < 0
                    OR floor((e.v[i] - ql.mns[i]) * ql.scs[i] + 0.5)
                       > {levels}
                  THEN 1 ELSE 0 END)) AS BIGINT) AS n_clamped
  FROM e JOIN codes c USING (vec_id), qlists ql
)
SELECT CAST(count(*) AS BIGINT) AS n_vecs,
       CAST(sum(err_micro) AS BIGINT) AS err_micro_sum,
       CAST(sum(err_micro) AS DOUBLE) / CAST(count(*) AS DOUBLE)
         AS mean_err_micro,
       CAST(max(err_micro) AS BIGINT) AS err_micro_max,
       CAST(sum(n_clamped) AS BIGINT) AS n_clamped
FROM per
"""


def _q_bq_topk(spark, sf):
    """Binary-quantization retrieval (operators/bq): per-dimension
    midrange thresholds trained in ONE codegen aggregate, corpus
    packed to 63-bit sign words by a pure zip_with expression, vec 0
    packed under the same rule and ranked by exact BIGINT Hamming
    distance (bit_count(xor)). Cross-engine equality is STRUCTURAL —
    (mn+mx)/2 is one add + one exact halving, the bit test is a strict
    > on bit-identical doubles, everything after is integers.
    ROUND-13-pool candidate."""
    from data_pengadaan_agent_spark.operators import bq as BQ

    emb = load_table(spark, sf, "embeddings").select("vec_id", "embedding")
    thr = BQ.train_bq(emb, dim=64)
    codes = BQ.bq_encode(emb, thr)
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    return BQ.bq_topk(codes, BQ.encode_query_bq(qvec, thr), k=10)


def _q_bq_rerank_topk(spark, sf):
    """The production two-stage BQ shape (operators/bq.
    bq_rerank_topk): the 1-bit Hamming scan cuts the corpus to a
    50-candidate shortlist (the only full-corpus pass — 16 B/vector,
    pure codegen), then exact integer micro-unit L2 re-ranks the
    shortlist to k=10. Hamming ties then L2 ties break by id — one
    deterministic trajectory. ROUND-13-pool candidate."""
    from data_pengadaan_agent_spark.operators import bq as BQ

    emb = load_table(spark, sf, "embeddings").select("vec_id", "embedding")
    thr = BQ.train_bq(emb, dim=64)
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    return BQ.bq_rerank_topk(emb, thr, qvec, k=10, shortlist=50)


def _q_bq_topk_batch(spark, sf):
    """Batched BQ retrieval (operators/bq.bq_topk_batch): four query
    vectors (vec_id % 125 == 0, first four by id) packed under the
    corpus thresholds, every Hamming fold in ONE words scan, per-qid
    row_number <= 5 with WindowGroupLimit partial top-k ahead of the
    single qid exchange — the pure-codegen batch miner.
    ROUND-13-pool candidate."""
    from data_pengadaan_agent_spark.operators import bq as BQ

    emb = load_table(spark, sf, "embeddings").select("vec_id", "embedding")
    thr = BQ.train_bq(emb, dim=64)
    qrows = (
        emb.filter(F.col("vec_id") % 125 == 0)
        .orderBy("vec_id")
        .limit(4)
        .collect()
    )
    queries = [
        (int(r["vec_id"]), BQ.encode_query_bq(r["embedding"], thr))
        for r in qrows
    ]
    return BQ.bq_topk_batch(BQ.bq_encode(emb, thr), queries, k=5)


def _bq_topk_batch_sql(dim: int = 64, k: int = 5) -> str:
    """DuckDB twin of _q_bq_topk_batch: the shared BQ word CTEs, the
    same four queries selected by the same rule, Hamming per
    (qid, vec) via one cross join, per-qid row_number <= k."""
    from data_pengadaan_agent_spark.operators.bq import n_words

    return f"""
WITH {_bq_core_sql(dim)},
qsel AS (
  SELECT vec_id AS qid, w AS qw FROM words
  WHERE vec_id % 125 = 0 ORDER BY vec_id LIMIT 4
),
pairs AS (
  SELECT q.qid, words.vec_id,
         CAST(list_sum(list_transform(range(1, {n_words(dim)} + 1),
              t -> bit_count(xor(words.w[t], q.qw[t])))) AS BIGINT)
           AS hamming
  FROM words, qsel q
),
r AS (
  SELECT qid, vec_id, hamming,
         row_number() OVER (PARTITION BY qid
                            ORDER BY hamming, vec_id) AS rk
  FROM pairs
)
SELECT qid, CAST(rk AS INT) AS rank, vec_id, hamming
FROM r WHERE rk <= {k}
"""


def _q_kcenter_coreset(spark, sf):
    """Greedy k-center coreset (operators/coreset, Gonzalez 1985):
    k=5 farthest-point selections over the exact BIGINT micro-unit
    grid — seed = lowest id, every argmax ties to the lowest id, all
    distances exact integers, so the trajectory is reproducible
    bit-for-bit by the unrolled 5-level DuckDB twin. Returns
    (sel_rank, vec_id, dist_micro) with non-increasing radii.
    ROUND-13-pool candidate."""
    from data_pengadaan_agent_spark.operators import coreset as CS

    emb = load_table(spark, sf, "embeddings").select("vec_id", "embedding")
    return CS.kcenter_coreset(emb, k=5)


def _bq_core_sql(dim: int = 64) -> str:
    """Shared CTE chain for the BQ twins: exact per-dim min/max, the
    midrange thresholds, the strict > bit test, and the 63-bit word
    packing — every float-touching step the IDENTICAL IEEE ops the
    Spark side runs (operators/bq.py determinism contract), everything
    downstream pure positive BIGINT arithmetic."""
    from data_pengadaan_agent_spark.operators.bq import BITS_PER_WORD, n_words

    words = []
    for w in range(n_words(dim)):
        start = w * BITS_PER_WORD  # 0-based dim offset
        width = min(BITS_PER_WORD, dim - start)
        words.append(
            f"CAST(list_sum(list_transform(range({start + 1}, "
            f"{start + width + 1}), j -> b[j] * (CAST(1 AS BIGINT) "
            f"<< (j - {start + 1})))) AS BIGINT)"
        )
    word_list = ", ".join(words)
    return f"""
e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
dims AS (
  SELECT i, min(e.v[i]) AS mn, max(e.v[i]) AS mx
  FROM e, UNNEST(range(1, {dim} + 1)) AS u(i)
  GROUP BY 1
),
thr AS (
  SELECT list((mn + mx) / 2 ORDER BY i) AS ts FROM dims
),
bits AS (
  SELECT e.vec_id,
         list_transform(range(1, {dim} + 1),
           i -> CASE WHEN e.v[i] > thr.ts[i]
                     THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END) AS b
  FROM e, thr
),
words AS (
  SELECT vec_id, [{word_list}] AS w FROM bits
),
qw AS (SELECT w FROM words WHERE vec_id = 0),
scored AS (
  SELECT words.vec_id,
         CAST(list_sum(list_transform(range(1, {n_words(dim)} + 1),
              t -> bit_count(xor(words.w[t], qw.w[t])))) AS BIGINT)
           AS hamming
  FROM words, qw
)"""


def _bq_topk_sql(dim: int = 64, k: int = 10) -> str:
    """DuckDB twin of _q_bq_topk."""
    return f"""
WITH {_bq_core_sql(dim)}
SELECT CAST(row_number() OVER (ORDER BY hamming, vec_id) AS INT) AS rank,
       vec_id, hamming
FROM scored ORDER BY hamming, vec_id LIMIT {k}
"""


def _bq_rerank_sql(
    dim: int = 64,
    k: int = 10,
    shortlist: int = 50,
    dp: int = 6,
    tail: str | None = None,
) -> str:
    """DuckDB twin of _q_bq_rerank_topk: the shared BQ CTEs cut the
    Hamming shortlist, then exact integer micro-unit L2 re-ranks it.
    ``tail`` exposes the PRE-floor micro values (mraw.scaled) for
    tools/audit_round_boundaries.py — decimals=0, the floor(x + 0.5)
    grid (the sq_topk.encode convention; kcenter_coreset shares this
    identical grid over the identical fixture)."""
    scale = float(10**dp)
    core = f"""{_bq_core_sql(dim)},
mraw AS (
  -- pre-floor micro value: floor(x*scale + 0.5) flips on integer
  -- halves of THIS column (probe decimals=0)
  SELECT e.vec_id, u.i, e.v[u.i] * {scale} AS scaled
  FROM e, UNNEST(range(1, {dim} + 1)) AS u(i)
),
micro AS (
  SELECT vec_id,
         list(CAST(floor(scaled + 0.5) AS BIGINT) ORDER BY i) AS m
  FROM mraw GROUP BY 1
)"""
    if tail is not None:
        return f"WITH {core}\n{tail}"
    return f"""
WITH {core},
stage1 AS (
  SELECT vec_id, hamming FROM scored
  ORDER BY hamming, vec_id LIMIT {shortlist}
),
qm AS (SELECT m FROM micro WHERE vec_id = 0),
rr AS (
  SELECT s.vec_id, s.hamming,
         CAST(list_sum(list_transform(range(1, {dim} + 1),
              i -> (mi.m[i] - qm.m[i]) * (mi.m[i] - qm.m[i])))
           AS BIGINT) AS l2_micro
  FROM stage1 s JOIN micro mi USING (vec_id), qm
)
SELECT CAST(row_number() OVER (ORDER BY l2_micro, vec_id) AS INT) AS rank,
       vec_id, hamming, l2_micro
FROM rr ORDER BY l2_micro, vec_id LIMIT {k}
"""


def _q_kcenter_coverage(spark, sf):
    """The 100 TB k-center shape (operators/coreset.
    kcenter_coverage_sampled): greedy k=4 selection on a
    deterministic Knuth-hash quarter-sample (the sampling.py split
    hash — the greedy loop's passes touch only the sample), coverage
    measured over the FULL corpus in exactly ONE scan. One summary
    row of exact integers. ROUND-13-pool candidate."""
    from data_pengadaan_agent_spark.operators import coreset as CS

    emb = load_table(spark, sf, "embeddings").select("vec_id", "embedding")
    return CS.kcenter_coverage_sampled(emb, k=4, sample_frac=0.25)


def _kcenter_coverage_sql(
    k: int = 4, dim: int = 64, dp: int = 6, sample_frac: float = 0.25
) -> str:
    """DuckDB twin of _q_kcenter_coverage: the unrolled greedy chain
    over the hash-filtered sample (the split_hash_col expression
    re-emitted verbatim — ids are non-negative so pmod ≡ %), then the
    full-corpus coverage aggregate with the argmin CASE keeping the
    lowest center index on exact-integer ties (the coverage_report
    fold's semantics)."""
    scale = float(10**dp)
    thresh = int(sample_frac * (1 << 32))
    dist = (
        "CAST(list_sum(list_transform(range(1, {dim} + 1), "
        "i -> ({a}.q[i] - {c}.q[i]) * ({a}.q[i] - {c}.q[i]))) AS BIGINT)"
    )
    parts = [
        f"""
qv AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE) * {scale} + 0.5) AS BIGINT))
           AS q
  FROM embeddings
),
s AS (
  SELECT * FROM qv
  WHERE ((vec_id % 2147483648) * 2654435761) % 4294967296 < {thresh}
),
c1 AS (SELECT vec_id, q FROM s ORDER BY vec_id LIMIT 1),
d1 AS (
  SELECT s.vec_id, s.q, {dist.format(dim=dim, a='s', c='c1')} AS mind
  FROM s, c1
)"""
    ]
    for t in range(2, k + 1):
        prior = " UNION ALL ".join(
            f"SELECT vec_id FROM c{s}" for s in range(1, t)
        )
        parts.append(
            f"""
c{t} AS (SELECT vec_id, q, mind FROM d{t - 1}
        WHERE vec_id NOT IN ({prior})
        ORDER BY mind DESC, vec_id LIMIT 1)"""
        )
        if t < k:
            parts.append(
                f"""
d{t} AS (
  SELECT d.vec_id, d.q,
         least(d.mind, {dist.format(dim=dim, a='d', c='c')}) AS mind
  FROM d{t - 1} d, c{t} c
)"""
            )
    dists = ", ".join(
        f"{dist.format(dim=dim, a='qv', c=f'c{t}')} AS e{t}"
        for t in range(1, k + 1)
    )
    froms = ", ".join(f"c{t}" for t in range(1, k + 1))
    least = "least(" + ", ".join(f"e{t}" for t in range(1, k + 1)) + ")"
    case = " ".join(
        f"WHEN e{t} = {least} THEN {t - 1}" for t in range(1, k)
    )
    parts.append(
        f"""
per AS (SELECT qv.vec_id, {dists} FROM qv, {froms}),
agg AS (
  SELECT vec_id, {least} AS mind,
         CASE {case} ELSE {k - 1} END AS cidx
  FROM per
)"""
    )
    return f"""WITH {','.join(parts)}
SELECT CAST(count(*) AS BIGINT) AS n_points,
       CAST((SELECT count(*) FROM s) AS BIGINT) AS n_sample,
       CAST(max(mind) AS BIGINT) AS max_radius_micro,
       CAST(sum(mind) AS BIGINT) AS sum_radius_micro,
       CAST(count(DISTINCT cidx) AS BIGINT) AS n_centers_used
FROM agg
"""


def _kcenter_sql(k: int = 5, dim: int = 64, dp: int = 6) -> str:
    """DuckDB twin of _q_kcenter_coreset: the greedy trajectory
    unrolled to k levels — c1 = lowest id; d_t = least(d_{t-1},
    dist to c_t); c_{t+1} = argmax d_t with ties to the lowest id,
    EXCLUDING already-selected ids (the operator's contract).
    All-integer distances on the micro grid, so the unrolled chain is
    bit-identical to Spark's iterative loop."""
    scale = float(10**dp)
    dist = (
        "CAST(list_sum(list_transform(range(1, {dim} + 1), "
        "i -> ({a}.q[i] - {c}.q[i]) * ({a}.q[i] - {c}.q[i]))) AS BIGINT)"
    )
    parts = [
        f"""
qv AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE) * {scale} + 0.5) AS BIGINT))
           AS q
  FROM embeddings
),
c1 AS (SELECT vec_id, q FROM qv ORDER BY vec_id LIMIT 1),
d1 AS (
  SELECT qv.vec_id, qv.q,
         {dist.format(dim=dim, a='qv', c='c1')} AS mind
  FROM qv, c1
)"""
    ]
    for t in range(2, k + 1):
        prior = " UNION ALL ".join(
            f"SELECT vec_id FROM c{s}" for s in range(1, t)
        )
        parts.append(
            f"""
c{t} AS (SELECT vec_id, q, mind FROM d{t - 1}
        WHERE vec_id NOT IN ({prior})
        ORDER BY mind DESC, vec_id LIMIT 1)"""
        )
        if t < k:
            parts.append(
                f"""
d{t} AS (
  SELECT d.vec_id, d.q,
         least(d.mind, {dist.format(dim=dim, a='d', c='c')}) AS mind
  FROM d{t - 1} d, c{t} c
)"""
            )
    selects = ["SELECT CAST(1 AS INT) AS sel_rank, vec_id, "
               "CAST(0 AS BIGINT) AS dist_micro FROM c1"]
    for t in range(2, k + 1):
        selects.append(
            f"SELECT CAST({t} AS INT) AS sel_rank, vec_id, "
            f"CAST(mind AS BIGINT) AS dist_micro FROM c{t}"
        )
    union = "\nUNION ALL\n".join(selects)
    return f"WITH {','.join(parts)}\n{union}\nORDER BY sel_rank"


def _q_pq_quant_report(spark, sf):
    """PQ quantization-error report (operators/pq.
    pq_quantization_report): per-subspace reconstruction-error totals
    under the same m=4 × ksub=4 codebook as pq_adc_topk — the
    codebook-staleness monitor (the PQ analog of ivf_drift_report).
    Exact integer error sums at the 4dp grid. ROUND-12-pool
    candidate."""
    from data_pengadaan_agent_spark.operators import pq as PQ

    emb = load_table(spark, sf, "embeddings").select("vec_id", "embedding")
    cb = PQ.train_pq(emb, dim=64, m=4, ksub=4, iters=2)
    return PQ.pq_quantization_report(emb, cb)


def _pq_quant_report_sql(m: int = 4, ksub: int = 4, dim: int = 64) -> str:
    """DuckDB twin of _q_pq_quant_report: the SAME shared training
    CTEs; each vector's chosen code (k_{s}) joins back to its raw
    distance (kraw_{s}), floored to the 4dp integer grid, summed
    exactly per subspace."""
    dsub = dim // m
    parts = [
        """
e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
)"""
    ] + _pq_subspace_parts(m, ksub, dsub, src="e", lut_cte=None)
    per_sub = "\nUNION ALL\n".join(
        f"""
  SELECT {s} AS sub,
         CAST(count(*) AS BIGINT) AS n_vecs,
         CAST(sum(CAST(floor(r.d_pre * 10000 + 0.5) AS BIGINT)) AS BIGINT)
           AS err_micro_sum,
         CAST(max(CAST(floor(r.d_pre * 10000 + 0.5) AS BIGINT)) AS BIGINT)
           AS err_micro_max
  FROM k_{s} k JOIN kraw_{s} r ON r.vec_id = k.vec_id AND r.code = k.code"""
        for s in range(m)
    )
    return f"""
WITH {",".join(parts)}
SELECT sub, n_vecs, err_micro_sum,
       CAST(err_micro_sum AS DOUBLE) / CAST(n_vecs AS DOUBLE)
         AS mean_err_micro,
       err_micro_max
FROM ({per_sub})
ORDER BY sub
"""


def _q_ann_ingest_stream_codes(spark, sf):
    """FIFTH value-checked streaming-ingest form: a maintained IVF-PQ
    index built on the base slice (vec_id < 300), then the REST of the
    embeddings arrive as a stream and are appended per epoch with the
    FROZEN sidecar geometry (streaming/windows.foreach_batch_ivfpq_sink
    → pq.append_ivfpq_table). Returns the final codes table flattened
    to hashable ints: (vec_id, list, c0..c3). The twin recomputes from
    raw embeddings — training on the base slice only, encoding
    everything — so a hash match certifies the whole frozen-geometry
    append semantics end to end. Fresh index + checkpoint per call
    (the corpus_ingest_stream determinism convention).
    ROUND-12-pool candidate."""
    import shutil
    import tempfile

    from data_pengadaan_agent_spark.operators import pq as PQ

    emb = load_table(spark, sf, "embeddings").select("vec_id", "embedding")
    base = emb.filter(F.col("vec_id") < 300)
    rest = emb.filter(F.col("vec_id") >= 300)
    idx = _warehouse_path(spark, sf, "stream_ivfpq")
    ack = _warehouse_path(spark, sf, "stream_ivfpq_ack")
    shutil.rmtree(ack, ignore_errors=True)
    PQ.build_ivfpq_table(base, idx, dim=64, kc=4, m=4, ksub=4, iters=2)
    srcdir = tempfile.mkdtemp(prefix="ann_ingest_src_")
    rest.coalesce(1).write.mode("overwrite").parquet(srcdir)
    stream = (
        spark.readStream.schema("vec_id long, embedding array<float>")
        .format("parquet")
        .load(srcdir)
    )
    q = SW.foreach_batch_ivfpq_sink(
        stream, idx, ack, tempfile.mkdtemp(prefix="ann_ingest_ckpt_")
    )
    q.processAllAvailable()
    q.stop()
    codes = spark.read.parquet(idx)
    return codes.select(
        "vec_id",
        F.col("list").cast("int").alias("list"),
        *[F.col("codes")[i].cast("int").alias(f"c{i}") for i in range(4)],
    )


def _ann_ingest_codes_sql(
    kc: int = 4,
    m: int = 4,
    ksub: int = 4,
    dim: int = 64,
    split: int = 300,
    tail: str | None = None,
) -> str:
    """DuckDB twin of _q_ann_ingest_stream_codes: coarse codebook from
    the GLOBAL lowest ids (all < split, so base-trained ≡ this),
    coarse-assign everything, train the residual PQ on the BASE slice
    only (the frozen geometry the stream appends under), encode ALL
    residuals — the exact batch equivalent of build(base) +
    streamed-append(rest)."""
    dsub = dim // m
    fulldist = (
        f"list_sum(list_transform(range(1, {dim} + 1), "
        f"i -> (e.v[i] - c.cv[i]) * (e.v[i] - c.cv[i])))"
    )
    parts = [
        f"""
e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
cc AS (
  SELECT CAST(vec_id AS INT) AS list, v AS cv FROM e WHERE vec_id < {kc}
),
asgraw AS (
  SELECT e.vec_id, c.list, {fulldist} AS d_pre FROM e, cc c
),
asg AS (
  SELECT vec_id, (min(struct_pack(d := d, list := list))).list AS list
  FROM (SELECT vec_id, list, round(d_pre, 4) AS d FROM asgraw) GROUP BY 1
),
r AS (
  SELECT e.vec_id, a.list,
         list_transform(range(1, {dim} + 1), i -> e.v[i] - c.cv[i]) AS v
  FROM e JOIN asg a USING (vec_id) JOIN cc c ON c.list = a.list
),
rb AS (SELECT vec_id, v FROM r WHERE vec_id < {split})"""
    ] + _pq_subspace_parts(
        m, ksub, dsub, src="rb", lut_cte=None, encode_src="r"
    )
    if tail is not None:
        return f"WITH {','.join(parts)}\n{tail}"
    code_joins = " ".join(f"JOIN k_{s} USING (vec_id)" for s in range(1, m))
    cols = ", ".join(f"CAST(k_{s}.code AS INT) AS c{s}" for s in range(m))
    return f"""
WITH {",".join(parts)}
SELECT k_0.vec_id, CAST(a.list AS INT) AS list, {cols}
FROM k_0 {code_joins} JOIN asg a ON a.vec_id = k_0.vec_id
"""


def _q_bpe_merges(spark, sf):
    """BPE merge induction (operators/bpe.learn_bpe_merges, Sennrich
    et al. 2016): the first 3 learned merges over the documents
    vocabulary — (rank, x, y, pair_count). The greedy merge
    application folds through ONE shared CASE template emitted into
    both engines (bpe.merge_fold_sql), and the merge pair is always a
    cross-joined column reference, never a re-injected literal.
    ROUND-11-pool candidate."""
    from data_pengadaan_agent_spark.operators import bpe as B

    docs = load_table(spark, sf, "documents")
    return B.learn_bpe_merges(docs, k=3)


def _q_bpe_encode_vocab(spark, sf):
    """Encode-side BPE (operators/bpe.learn_bpe_merges with
    return_vocab=True): the trained tokenizer's segmentation of every
    distinct corpus word after k=3 learned merges — (w, n, seg). The
    merge table never leaves the cluster (no driver collection); the
    segmentation is the same fold template both engines share.
    ROUND-12-pool candidate."""
    from data_pengadaan_agent_spark.operators import bpe as B

    docs = load_table(spark, sf, "documents")
    vocab = B.learn_bpe_merges(docs, k=3, return_vocab=True)
    return vocab.select(
        "w",
        F.col("n").cast("bigint").alias("n"),
        F.array_join("syms", " ").alias("seg"),
    )


def _bpe_merges_sql(k: int = 3, vocab: bool = False) -> str:
    """DuckDB twin of _q_bpe_merges: the identical k rounds unrolled
    as CTEs — vocab-sized pair counts, min(struct(-cnt, x, y))
    argmax, and the SAME fold template (bpe.merge_fold_sql('duckdb'))
    applying each round's merge. ``vocab=True`` emits the encode-side
    product instead (the _q_bpe_encode_vocab twin): the final
    vocabulary's segmentation after all k merges (a NULL merge round
    folds as a no-op on both engines — Spark's loop break leaves the
    vocab unchanged the same way)."""
    from data_pengadaan_agent_spark.operators.bpe import merge_fold_sql

    parts = [
        f"""
words AS (
  SELECT w, CAST(count(*) AS BIGINT) AS n
  FROM (SELECT unnest({_DUCK_TOKS}) AS w FROM documents)
  WHERE w <> '' GROUP BY 1
),
v0 AS (
  SELECT w, n,
         list_transform(range(1, length(w) + 1),
                        i -> substr(w, CAST(i AS INT), 1)) AS syms
  FROM words
)"""
    ]
    selects = []
    for r in range(1, k + 1):
        fold = merge_fold_sql("duckdb", f"m{r}.mx", f"m{r}.my", f"v{r - 1}.syms")
        parts.append(f"""
p{r} AS (
  SELECT syms[CAST(i AS INT)] AS x, syms[CAST(i + 1 AS INT)] AS y,
         CAST(sum(n) AS BIGINT) AS cnt
  FROM v{r - 1}, unnest(range(1, len(syms))) AS u(i)
  GROUP BY 1, 2
),
m{r} AS (
  SELECT (min(struct_pack(o := -cnt, x := x, y := y))).x AS mx,
         (min(struct_pack(o := -cnt, x := x, y := y))).y AS my,
         CAST(-(min(struct_pack(o := -cnt, x := x, y := y))).o AS BIGINT)
           AS mcnt
  FROM p{r}
),
v{r} AS (
  SELECT v{r - 1}.w, v{r - 1}.n, {fold} AS syms
  FROM v{r - 1}, m{r}
)""")
        # WHERE mx IS NOT NULL: an empty p{r} still yields one all-NULL
        # row from the ungrouped min() in m{r}; Spark's loop breaks and
        # emits nothing for that rank, so the twin must drop it too
        # (the v{r} fold is a no-op under a NULL merge pair — the CASE
        # arms never match — matching Spark's unchanged vocab)
        selects.append(
            f"SELECT CAST({r} AS INT) AS rank, mx AS x, my AS y, "
            f"mcnt AS pair_count FROM m{r} WHERE mx IS NOT NULL"
        )
    if vocab:
        return (
            "WITH " + ",".join(parts)
            + f"\nSELECT w, CAST(n AS BIGINT) AS n, "
            f"array_to_string(syms, ' ') AS seg FROM v{k}"
        )
    return "WITH " + ",".join(parts) + "\n" + "\nUNION ALL\n".join(selects)


def _q_zorder_key_orders(spark, sf):
    """Morton / Z-order clustering key over orders
    (operators/layout.zorder_key): interleave o_custkey with the
    order-date day number (days since 1992-01-01) — the layout key a
    write job sorts by so parquet footer min/max stats skip files on
    BOTH columns (multi-dimensional data skipping; see
    tests/test_layout.py for the measured skip-fraction payoff).
    Exact integer bit arithmetic; the twin replays the identical
    fold emitted by layout.zorder_key_sql. ROUND-11-pool candidate."""
    from data_pengadaan_agent_spark.operators import layout as L

    orders = load_table(spark, sf, "orders")
    day = F.datediff(F.col("o_orderdate"), F.to_date(F.lit("1992-01-01")))
    return orders.select(
        F.col("o_orderkey"),
        L.zorder_key([F.col("o_custkey"), day], bits=21).alias("zkey"),
    )


def _zorder_key_orders_sql() -> str:
    from data_pengadaan_agent_spark.operators.layout import zorder_key_sql

    fold = zorder_key_sql(
        ["o_custkey", "(CAST(o_orderdate AS DATE) - DATE '1992-01-01')"],
        bits=21,
    )
    return f"""
SELECT o_orderkey, CAST({fold} AS BIGINT) AS zkey FROM orders
"""


def _q_corpus_ingest_stream_dup_spans(spark, sf):
    """FOURTH value-checked streaming-ingest form: readStream.text →
    per-epoch append to the maintained gram-count index → incremental
    duplicated-token budget gate (streaming/windows.
    foreach_batch_dup_span_sink). Runs the PURE PRODUCTION hash path
    (xxhash64 gram law) — the oracle twin counts RAW L-grams instead
    of replaying a hash, so a hash collision anywhere would hash-fail
    the row: the check verifies zero collisions as a side effect.
    The fixture directory is one micro-batch (static dir, no
    maxFilesPerTrigger), so the single-epoch verdicts equal the batch
    dup budget over the DISTINCT-by-content corpus; cross-batch
    first-wins semantics is pinned separately by pytest.
    ROUND-11-pool candidate."""
    import shutil
    import tempfile

    from data_pengadaan_agent_spark.operators import dupindex as DI
    from data_pengadaan_agent_spark.sources.readers import read_text_corpus_stream

    corpus = read_text_corpus_stream(spark, _ensure_text_corpus(sf))
    idx = _warehouse_path(spark, sf, "stream_gram_counts")
    sink = _warehouse_path(spark, sf, "stream_dup_span_sink")
    shutil.rmtree(sink, ignore_errors=True)
    # fresh empty index + fresh checkpoint per call: the whole corpus
    # reprocesses as epoch 0, so repeated calls are deterministic
    DI.build_gram_counts(
        spark.createDataFrame([], "doc_id long, text string"),
        idx,
        length=8,
        n_buckets=64,
        arith_hash=False,
    )
    q = SW.foreach_batch_dup_span_sink(
        corpus, idx, sink, tempfile.mkdtemp(prefix="dup_span_ckpt_"),
        max_ppm=500_000,
    )
    q.processAllAvailable()
    q.stop()
    return spark.read.parquet(sink).select(
        "text", "n_tokens", "dup_tokens", "dup_ppm", "keep"
    )


def _corpus_ingest_dup_spans_sql(length: int = 8, max_ppm: int = 500_000) -> str:
    """DuckDB twin of _q_corpus_ingest_stream_dup_spans: the
    DISTINCT-by-content collapsed corpus (the streaming relational
    model shared by every ingest-stream twin), RAW L-gram occurrence
    counts (no hash — stronger than replaying one), per-text
    gap-merge spans, exact-integer ppm, keep threshold."""
    return f"""
WITH corpus AS (
  SELECT DISTINCT regexp_replace(text, '[\\r\\n]+', ' ', 'g') AS text
  FROM documents WHERE length(trim(text)) > 0
),
d AS (
  SELECT text, {_DUCK_TOKS} AS toks FROM corpus
),
g AS (
  SELECT text, CAST(i AS BIGINT) AS pos,
         array_to_string(toks[CAST(i + 1 AS INT):CAST(i + {length} AS INT)], ' ') AS g
  FROM d, unnest(range(greatest(len(toks) - {length} + 1, 0))) AS u(i)
),
occ AS (
  SELECT g, count(*) AS n_occ FROM g GROUP BY 1
),
dup AS (
  SELECT g.text, g.pos FROM g JOIN occ USING (g) WHERE occ.n_occ >= 2
),
fl AS (
  SELECT text, pos,
         CASE WHEN lag(pos) OVER (PARTITION BY text ORDER BY pos) IS NULL
                OR pos > lag(pos) OVER (PARTITION BY text ORDER BY pos)
                         + {length}
              THEN 1 ELSE 0 END AS nw
  FROM dup
),
runs AS (
  SELECT text, pos,
         sum(nw) OVER (PARTITION BY text ORDER BY pos
                       ROWS UNBOUNDED PRECEDING) AS run
  FROM fl
),
spans AS (
  SELECT text,
         max(pos) + {length - 1} - min(pos) + 1 AS span_len
  FROM runs GROUP BY text, run
),
per AS (
  SELECT text, CAST(sum(span_len) AS BIGINT) AS dup_tokens
  FROM spans GROUP BY 1
)
SELECT d.text,
       CAST(len(d.toks) AS BIGINT) AS n_tokens,
       coalesce(per.dup_tokens, 0) AS dup_tokens,
       CAST((1000000 * coalesce(per.dup_tokens, 0))
            // greatest(CAST(len(d.toks) AS BIGINT), 1) AS BIGINT) AS dup_ppm,
       CAST((1000000 * coalesce(per.dup_tokens, 0))
            // greatest(CAST(len(d.toks) AS BIGINT), 1) AS BIGINT)
         <= {max_ppm} AS keep
FROM d LEFT JOIN per USING (text)
"""


def _q_dup_run_pairs(spark, sf):
    """Exact maximal shared token runs between two corpora
    (operators/textan.dup_run_pairs, the diagonal construction):
    corpus A = the doc_id%4==0 slice, corpus B = the same docs
    re-identified (+1000000) with a 2-token prelude — every A doc
    shares its FULL text run with its B twin at positions shifted by
    2, plus whatever organic duplication the fixture carries.
    length=6, max_df=50. ROUND-11-pool candidate."""
    docs = load_table(spark, sf, "documents")
    a = docs.filter(F.col("doc_id") % 4 == 0).select("doc_id", "text")
    b = a.select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.lit("pre1 pre2 "), F.col("text")).alias("text"),
    )
    return X.dup_run_pairs(a, b, length=6, max_df=50)


def _dup_run_pairs_sql(length: int = 6, max_df: int = 50) -> str:
    """DuckDB twin of _q_dup_run_pairs: same grams, same 62-bit
    two-channel hash, same per-side document-frequency caps, same
    (a, b, a_pos−b_pos) diagonal clustering of consecutive matches."""
    p131 = _DUCK_POLY.format(s="g", mult=131)
    p137 = _DUCK_POLY.format(s="g", mult=137)
    return f"""
WITH corpus_a AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 4 = 0
),
corpus_b AS (
  SELECT doc_id + 1000000 AS doc_id, 'pre1 pre2 ' || text AS text
  FROM documents WHERE doc_id % 4 = 0
),
ga AS (
  SELECT doc_id AS a_id, CAST(i AS BIGINT) AS a_pos,
         (({p131}) * 2147483647 + ({p137})) AS h
  FROM (
    SELECT doc_id, {_DUCK_TOKS} AS toks FROM corpus_a
  ), unnest(range(greatest(len(toks) - {length} + 1, 0))) AS u(i),
  LATERAL (SELECT array_to_string(
             toks[CAST(i + 1 AS INT):CAST(i + {length} AS INT)], ' ') AS g)
),
gb AS (
  SELECT doc_id AS b_id, CAST(i AS BIGINT) AS b_pos,
         (({p131}) * 2147483647 + ({p137})) AS h
  FROM (
    SELECT doc_id, {_DUCK_TOKS} AS toks FROM corpus_b
  ), unnest(range(greatest(len(toks) - {length} + 1, 0))) AS u(i),
  LATERAL (SELECT array_to_string(
             toks[CAST(i + 1 AS INT):CAST(i + {length} AS INT)], ' ') AS g)
),
fa AS (
  SELECT ga.* FROM ga JOIN (
    SELECT h FROM ga GROUP BY h HAVING count(DISTINCT a_id) <= {max_df}
  ) USING (h)
),
fb AS (
  SELECT gb.* FROM gb JOIN (
    SELECT h FROM gb GROUP BY h HAVING count(DISTINCT b_id) <= {max_df}
  ) USING (h)
),
m AS (
  SELECT fa.a_id, fb.b_id, fa.a_pos, fb.b_pos,
         fa.a_pos - fb.b_pos AS diag
  FROM fa JOIN fb USING (h)
),
fl AS (
  SELECT a_id, b_id, diag, a_pos,
         CASE WHEN lag(a_pos) OVER (PARTITION BY a_id, b_id, diag
                                    ORDER BY a_pos) IS NULL
                OR a_pos > lag(a_pos) OVER (PARTITION BY a_id, b_id, diag
                                            ORDER BY a_pos) + 1
              THEN 1 ELSE 0 END AS nw
  FROM m
),
runs AS (
  SELECT a_id, b_id, diag, a_pos,
         sum(nw) OVER (PARTITION BY a_id, b_id, diag ORDER BY a_pos
                       ROWS UNBOUNDED PRECEDING) AS run
  FROM fl
)
SELECT a_id, b_id,
       min(a_pos) AS a_start,
       max(a_pos) + {length - 1} AS a_end,
       min(a_pos) - diag AS b_start,
       max(a_pos) + {length - 1} - diag AS b_end,
       max(a_pos) + {length - 1} - min(a_pos) + 1 AS run_tokens
FROM runs GROUP BY a_id, b_id, diag, run
HAVING max(a_pos) + {length - 1} - min(a_pos) + 1 >= {length}
"""


def _q_bm25_index_retrieval(spark, sf):
    """Batched BM25 over the MATERIALIZED postings index
    (operators/lexindex.bm25_from_index): same query batch and k as
    bm25_retrieval_batch, but the corpus is tokenized once at ingest
    into a bucket-partitioned inverted index and the query scan is
    partition-pruned to the query terms' buckets. The oracle twin is
    _bm25_retrieval_batch_sql — the index path must reproduce the
    from-scratch path bit-exactly (shared textan.bm25_int_coeffs
    arithmetic). ROUND-11-pool candidate."""
    from data_pengadaan_agent_spark.operators import lexindex as LX

    docs = load_table(spark, sf, "documents")
    path = _warehouse_path(spark, sf, "postings_index")
    # gate law (r15, the bloom n_keys shape): the meta stats marker's
    # n_docs vs the source row count — ONE 1-row read replaces the
    # per-call doclen parquet count (meta n_docs == doclen count at
    # every committed state by maintenance; a crashed append leaves
    # them mismatched against the source and rebuilds here)
    try:
        meta = LX.read_meta_stats(spark, path)
        fresh = meta[1] == docs.count() and meta[0] == 64
    except Exception:
        fresh = False
    if not fresh:
        LX.build_postings_index(docs, path, n_buckets=64)
        meta = LX.read_meta_stats(spark, path)
    queries = docs.filter(F.col("doc_id") % 50 == 0).select(
        F.col("doc_id").alias("qid"),
        F.slice(X.tokens("text"), 1, 3).alias("terms"),
    )
    # the gate just validated (or the build just wrote) the meta —
    # forward it instead of re-reading the sidecar (r14)
    return LX.bm25_from_index(spark, path, queries, k=5, _meta=meta)


def _q_dup_spans_incremental(spark, sf):
    """Incremental exact-substring dedup over the maintained
    gram-count index (operators/dupindex): base = the full documents
    table ingested once, shard = the doc_id%7==0 slice re-identified
    (+1000000) with a 2-token prelude — every shard doc duplicates its
    base twin at SHIFTED positions, the winnow_matches twin
    construction. The query answers "which spans of the daily shard
    duplicate anything seen so far" WITHOUT re-tokenizing the base;
    ingest is once-per-round (registry count gates the rebuild;
    append replay is a registered no-op). ROUND-11-pool candidate."""
    from data_pengadaan_agent_spark.operators import dupindex as DI

    docs = load_table(spark, sf, "documents")
    shard = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.lit("pre1 pre2 "), F.col("text")).alias("text"),
    )
    path = _warehouse_path(spark, sf, "gram_counts")
    expected = docs.count() + shard.count()
    try:
        fresh = (
            spark.read.parquet(f"{path}/docs").count() == expected
            and DI._read_meta(spark, path) == (8, 64, True)
        )
    except Exception:
        fresh = False
    if not fresh:
        DI.build_gram_counts(docs, path, length=8, n_buckets=64)
        DI.append_gram_counts(shard, path)
    # Bucketed counts promoted to the default (r15, VERDICT r14 ask
    # #5; guide §2.4 / §6): the counts table re-laid-out as a managed
    # table bucketed on h removes the count side's per-query exchange
    # from BOTH the per-hash SUM and the merge join — measured 1.52×
    # on the x16 corpus (tools/lap_bucketed_counts.py, NOTES.md) and
    # at parity (within host noise) with the parquet path at sf0.1,
    # where the count side is only ~2.6 MB. The in-memory catalog is
    # session-scoped, so a fresh session rewrites the table once from
    # the parquet index (amortized across the session's queries); an
    # index rebuild above forces the rewrite. The bucket count is
    # SCALE-ADAPTIVE (~32 MB/bucket, floor 8, cap 4096 — a constant
    # tuned to either local mode or the cluster would violate the
    # scale-parameterization rule); override: $SPARK_GRAFT_COUNT_BUCKETS.
    import os as _os

    from data_pengadaan_agent_spark.sources.readers import write_bucketed

    tag = sf.rstrip("/").rsplit("/", 1)[-1].replace(".", "_").replace("-", "_")
    tbl = f"gram_counts_bucketed_{tag}"
    if (not fresh) or (not spark.catalog.tableExists(tbl)):
        env_buckets = _os.environ.get("SPARK_GRAFT_COUNT_BUCKETS")
        if env_buckets:
            n_buckets = int(env_buckets)
        else:
            try:
                jvm_path = spark._jvm.org.apache.hadoop.fs.Path
                p = jvm_path(f"{path}/counts")
                fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
                nbytes = fs.getContentSummary(p).getLength()
            except Exception:
                nbytes = 0
            n_buckets = min(4096, max(8, int(nbytes // (32 << 20))))
        write_bucketed(
            spark.read.parquet(f"{path}/counts").select("h", "cnt"),
            tbl,
            "h",
            n_buckets=n_buckets,
        )
    # the gram law (8, 64, True) was just validated (or built) by the
    # freshness gate — forward it instead of re-reading the meta (r14)
    return DI.dup_spans_incremental(
        spark, path, shard, _meta=(8, 64, True), counts_source=spark.table(tbl)
    )


def _dup_spans_incremental_sql(length: int = 8, min_count: int = 2) -> str:
    """DuckDB twin of _q_dup_spans_incremental: recompute from raw
    text — counts over base ∪ shard, spans restricted to shard ids.
    The index path must reproduce the from-scratch computation
    exactly (the lexindex shared-twin discipline)."""
    union_src = """
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id, 'pre1 pre2 ' || text AS text
      FROM documents WHERE doc_id % 7 = 0
    """
    return f"""
WITH {_dup_spans_core_sql(length, min_count, source_sql=union_src)}
SELECT doc_id, span_start, span_end, span_len, n_dup_grams
FROM spans WHERE doc_id >= 1000000
"""


def _q_lexical_diversity(spark, sf):
    """Integer-exact lexical-richness signals (operators/textan.
    lexical_diversity): TTR / hapax share / Simpson repeat
    concentration as parts-per-million integers — no logs, no
    doubles, bit-exact by construction. ROUND-11-pool candidate."""
    docs = load_table(spark, sf, "documents")
    return X.lexical_diversity(docs)


_LEXICAL_DIVERSITY_SQL = f"""
WITH tk AS (
  SELECT doc_id, unnest({_DUCK_TOKS}) AS t FROM documents
),
c AS (
  SELECT doc_id, t, CAST(count(*) AS BIGINT) AS c FROM tk GROUP BY 1, 2
),
agg AS (
  SELECT doc_id,
         CAST(sum(c) AS BIGINT) AS n_tokens,
         CAST(count(*) AS BIGINT) AS n_types,
         CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
         CAST(sum(c * (c - 1)) AS BIGINT) AS rep
  FROM c GROUP BY 1
)
SELECT doc_id, n_tokens, n_types, n_hapax,
       CAST((1000000 * n_types) // n_tokens AS BIGINT) AS ttr_ppm,
       CAST((1000000 * n_hapax) // n_types AS BIGINT) AS hapax_ppm,
       CAST(CASE WHEN n_tokens < 2 THEN 0
            ELSE (1000000 * rep) // (n_tokens * (n_tokens - 1))
            END AS BIGINT) AS simpson_ppm
FROM agg
"""


def _trgm_index_path(spark, sf):
    """Shared ingest-once trigram index over documents (registry count
    gates the rebuild, like the postings/gram-count indexes)."""
    from data_pengadaan_agent_spark.operators import trgm as TG

    docs = load_table(spark, sf, "documents")
    path = _warehouse_path(spark, sf, "trgm_index")
    try:
        fresh = (
            spark.read.parquet(f"{path}/docs").count() == docs.count()
            and TG._read_meta(spark, path) == 64
        )
    except Exception:
        fresh = False
    if not fresh:
        TG.build_trgm_index(docs, path, n_buckets=64)
    return path, docs


def _q_trgm_search(spark, sf):
    """Substring search through the MATERIALIZED trigram index
    (operators/trgm.substring_search, pg_trgm re-expressed
    Spark-first): pattern grams hash driver-side so the postings scan
    carries a LITERAL bucket IN-list (PartitionFilters), candidates =
    docs matching ALL pattern-gram hashes (lossless superset), one
    exact contains() verification restores precision. The oracle twin
    is the DIRECT substring scan — the certified equality IS the
    index's correctness contract. ROUND-13-pool candidate."""
    from data_pengadaan_agent_spark.operators import trgm as TG

    path, docs = _trgm_index_path(spark, sf)
    # n_buckets=64 was just validated (or built) by the freshness
    # gate — forward it instead of re-reading the meta sidecar (r14)
    return TG.substring_search(
        spark, path, docs, ["window window", "scan merge part"], _n_buckets=64
    )


_TRGM_SEARCH_SQL = """
WITH pats AS (
  SELECT * FROM (VALUES ('window window'), ('scan merge part')) AS t(pattern)
)
SELECT pats.pattern, d.doc_id
FROM documents d CROSS JOIN pats
WHERE contains(lower(d.text), lower(pats.pattern))
ORDER BY pats.pattern, d.doc_id
"""


def _q_trgm_similar(spark, sf):
    """pg_trgm threshold similarity from the index alone
    (operators/trgm.trgm_similar): sim_ppm = 1e6·|A∩B| DIV |A∪B| over
    DISTINCT trigram sets, exact integer end to end; the intersection
    folds from the hash-pruned postings slice, |A| off the registry —
    no text scan at all. The twin recomputes the gram SETS from raw
    text (no hash replay), so the hash-match also proves zero xxhash64
    gram collisions on the fixture, the dup_spans discipline.
    ROUND-13-pool candidate."""
    from data_pengadaan_agent_spark.operators import trgm as TG

    path, _ = _trgm_index_path(spark, sf)
    return TG.trgm_similar(
        spark, path, "the fast key order sort table scan merge",
        min_sim_ppm=250_000,
    )


def _trgm_similar_sql(pattern: str, min_sim_ppm: int) -> str:
    """DuckDB twin of _q_trgm_similar: distinct interior 3-grams of
    lower(text), set intersection with the pattern's gram set, same
    integer-DIV ppm. range(1, greatest(len-1, 1)) spells the same
    short-string guard as char_grams' when() (DuckDB range is empty
    when stop <= start; Spark sequence would DESCEND — the round-9
    lesson lives on the Spark side)."""
    return f"""
WITH q AS (
  SELECT DISTINCT substr(p, CAST(i AS INT), 3) AS g
  FROM (SELECT lower('{pattern}') AS p),
       unnest(range(1, greatest(len(p) - 1, 1))) AS u(i)
),
dg AS (
  SELECT DISTINCT doc_id, substr(lt, CAST(i AS INT), 3) AS g
  FROM (SELECT doc_id, lower(text) AS lt FROM documents),
       unnest(range(1, greatest(len(lt) - 1, 1))) AS u(i)
),
nd AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams FROM dg GROUP BY doc_id),
nq AS (SELECT CAST(count(*) AS BIGINT) AS n_q FROM q),
it AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS inter
  FROM dg JOIN q USING (g) GROUP BY doc_id
)
SELECT it.doc_id, it.inter, nd.n_grams,
       CAST((1000000 * it.inter) // (nd.n_grams + nq.n_q - it.inter)
            AS BIGINT) AS sim_ppm
FROM it JOIN nd USING (doc_id) CROSS JOIN nq
WHERE (1000000 * it.inter) // (nd.n_grams + nq.n_q - it.inter) >= {min_sim_ppm}
ORDER BY sim_ppm DESC, it.doc_id
"""


def _q_fuzzy_dup_pairs(spark, sf):
    """Typo-tier dedup via PassJoin pigeonhole blocking
    (operators/fuzzy.fuzzy_dup_pairs, Li et al. VLDB 2011): corpus =
    24-char lowered prefixes of the doc_id<8000 %8 slice plus a
    1-substitution variant of each (+1000000) — every base/variant
    pair is a planted distance-1 hit, organic identical prefixes land
    at distance 0. Candidates come from the segment equi-join (never
    all-pairs); the twin IS the brute-force band join — an independent
    implementation, so the equality certifies the pigeonhole
    completeness lemma on real data. ROUND-13-pool candidate."""
    from data_pengadaan_agent_spark.operators import fuzzy as FZ

    docs = load_table(spark, sf, "documents")
    base = docs.filter((F.col("doc_id") < 8000) & (F.col("doc_id") % 8 == 0)).select(
        "doc_id", F.expr("substring(lower(text), 1, 24)").alias("nm")
    )
    variant = base.select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(
            F.expr("substring(nm, 1, 4)"), F.lit("q"), F.expr("substring(nm, 6)")
        ).alias("nm"),
    )
    # slice-sized derived corpus, consumed five times inside the
    # operator (segments/probes/short-block/both verify sides) —
    # materialize once so the union+substring derivation isn't
    # re-planned per consumer (plan_audit: 12 scans -> 0)
    corpus = base.unionByName(variant).localCheckpoint(eager=True)
    return FZ.fuzzy_dup_pairs(
        corpus, max_dist=1, text_col="nm", id_col="doc_id"
    )


_FUZZY_DUP_PAIRS_SQL = """
WITH base AS (
  SELECT doc_id, substr(lower(text), 1, 24) AS nm
  FROM documents WHERE doc_id < 8000 AND doc_id % 8 = 0
),
u AS (
  SELECT doc_id, nm FROM base
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id,
         substr(nm, 1, 4) || 'q' || substr(nm, 6) AS nm
  FROM base
)
SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       CAST(levenshtein(a.nm, b.nm) AS INT) AS dist
FROM u a JOIN u b
  ON a.doc_id < b.doc_id
 AND abs(len(a.nm) - len(b.nm)) <= 1
WHERE levenshtein(a.nm, b.nm) <= 1
ORDER BY a_id, b_id
"""


def _q_weighted_sample(spark, sf):
    """Sequential Poisson sampling (operators/sampling.weighted_sample,
    Ohlsson 1998): keep the 100 documents with the smallest
    knuth_hash(id)/n_chars priority keys — selection probability
    proportional to length, membership a pure function of (id, weight).
    Cross-engine equality is STRUCTURAL (one exact int→double
    conversion + one IEEE division, ties broken by id identically), so
    the boundary needs no margin probe — a tie cannot reorder.
    ROUND-13-pool candidate."""
    from data_pengadaan_agent_spark.operators import sampling as SA

    docs = load_table(spark, sf, "documents")
    return SA.weighted_sample(docs, "n_chars", 100).select(
        "doc_id", F.col("n_chars").cast("bigint").alias("weight")
    )


_WEIGHTED_SAMPLE_SQL = """
WITH k AS (
  SELECT doc_id, n_chars,
         CAST(((doc_id % 2147483648) * 2654435761) % 4294967296 AS DOUBLE)
           / CAST(n_chars AS DOUBLE) AS key
  FROM documents
  WHERE n_chars IS NOT NULL AND n_chars > 0
)
SELECT doc_id, CAST(n_chars AS BIGINT) AS weight
FROM k ORDER BY key ASC, doc_id ASC LIMIT 100
"""


def _q_heavy_hitters(spark, sf):
    """Exact bounded-memory top-k frequency (operators/heavy.
    heavy_hitters — Misra-Gries candidates + exact recount, Agarwal
    et al. PODS 2012 merge/prune form): token frequencies over the
    corpus, k=10 at capacity 4096. The twin is the full GROUP BY —
    when the exact-integer certification holds (it does on every
    fixture SF), the sketch path must reproduce it bit-for-bit; the
    sketch-pass pruning itself is pinned by adversarial pytest
    fixtures (5000-value tails, 3-partition layouts).
    ROUND-13-pool candidate."""
    from data_pengadaan_agent_spark.operators import heavy as HH

    docs = load_table(spark, sf, "documents")
    toks = docs.select(F.explode(X.tokens("text")).alias("value"))
    return HH.heavy_hitters(toks, "value", k=10, capacity=4096)


_HEAVY_HITTERS_SQL = f"""
WITH t AS (
  SELECT unnest({_DUCK_TOKS}) AS value FROM documents
),
c AS (
  SELECT value, CAST(count(*) AS BIGINT) AS cnt
  FROM t WHERE value IS NOT NULL GROUP BY value
),
top AS (
  SELECT value, cnt,
         CAST(row_number() OVER (ORDER BY cnt DESC, value) AS INT) AS rank
  FROM c ORDER BY cnt DESC, value LIMIT 10
),
s AS (SELECT min(cnt) AS minc, count(*) AS nrows FROM top),
n AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM t WHERE value IS NOT NULL)
SELECT top.value, top.cnt, top.rank,
       CASE WHEN s.nrows = 10 THEN s.minc * 4097 > n.n_total
            ELSE 4097 > n.n_total END AS certified
FROM top, s, n
ORDER BY rank
"""


def _q_hist_quantiles(spark, sf):
    """Composable quantiles from the mergeable histogram cube
    (operators/histcube): p50/p99 bins of event value per event_type,
    exact integer end to end — bin counts add, so the cube rolls up
    and appends where raw quantiles cannot. Geometry [0, 500)×50
    clamps the fixture's >500 tail into the top bin (the escape-mass
    contract, exercised at sf0.01/0.1). Bucketing is one subtraction +
    one division + floor on bit-identical doubles — the structural
    determinism class. ROUND-13-pool candidate."""
    from data_pengadaan_agent_spark.operators import histcube as HC

    ev = load_table(spark, sf, "events")
    path = _warehouse_path(spark, sf, "hist_cube")
    expected = ev.filter(F.col("value").isNotNull()).count()
    try:
        fresh = (
            HC._read_meta(spark, path) == (["event_type"], "value", 0.0, 500.0, 50)
            and spark.read.parquet(f"{path}/cube")
            .agg(F.sum("cnt"))
            .collect()[0][0]
            == expected
        )
    except Exception:
        fresh = False
    if not fresh:
        HC.build_hist_cube(
            ev, path, dims=["event_type"], value_col="value",
            lo=0.0, hi=500.0, n_bins=50,
        )
    return HC.hist_quantile_bins(
        spark, path, ["event_type"], [500_000, 990_000]
    )


_HIST_QUANTILES_SQL = """
WITH b AS (
  SELECT event_type,
         CAST(greatest(0, least(49,
           CAST(floor((CAST(value AS DOUBLE) - 0.0) / 10.0) AS BIGINT)
         )) AS INT) AS bin
  FROM events WHERE value IS NOT NULL
),
c AS (
  SELECT event_type, bin, CAST(count(*) AS BIGINT) AS cnt
  FROM b GROUP BY 1, 2
),
cum AS (
  SELECT event_type, bin,
         CAST(sum(cnt) OVER (PARTITION BY event_type ORDER BY bin
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cnt,
         CAST(sum(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS total
  FROM c
),
q AS (SELECT CAST(unnest([500000, 990000]) AS INT) AS q_ppm),
hit AS (
  SELECT event_type, q_ppm, bin, cum_cnt, total,
         row_number() OVER (PARTITION BY event_type, q_ppm
                            ORDER BY bin) AS rk
  FROM cum, q
  WHERE cum_cnt * 1000000 >= q_ppm * total
)
SELECT event_type, q_ppm, bin,
       CAST(0.0 AS DOUBLE) + bin * CAST(10.0 AS DOUBLE) AS bin_lo,
       CAST(0.0 AS DOUBLE) + (bin + 1) * CAST(10.0 AS DOUBLE) AS bin_hi,
       cum_cnt, total
FROM hit WHERE rk = 1
ORDER BY event_type, q_ppm
"""


def _q_exact_quantiles(spark, sf):
    """Exact distributed quantile VALUES by iterative histogram
    refinement (operators/selection.exact_quantiles — the
    distributed-selection classic): p50/p99 of event value per
    event_type, nearest-rank, with NO per-group global sort — each
    pass is one scan folding to ≤ groups·|q|·n_bins counter rows, the
    range narrows ~n_bins× per pass, and only the residual slice is
    ever sorted. Slices narrow to OBSERVED bin extremes (inclusive),
    so float rounding at arithmetic bin edges can never leak a
    counted row out of the slice. The twin computes the same
    nearest-rank definition by direct per-group ranking — value-exact
    equality, doubles straight from the data. ROUND-13-pool
    candidate."""
    from data_pengadaan_agent_spark.operators import selection as SEL

    ev = load_table(spark, sf, "events")
    return SEL.exact_quantiles(
        ev, "event_type", "value", [500_000, 990_000], n_bins=64, max_passes=8
    )


_EXACT_QUANTILES_SQL = """
WITH t AS (
  SELECT event_type AS g, CAST(value AS DOUBLE) AS v
  FROM events WHERE value IS NOT NULL
),
n AS (SELECT g, CAST(count(*) AS BIGINT) AS n FROM t GROUP BY g),
r AS (
  SELECT g, v,
         CAST(row_number() OVER (PARTITION BY g ORDER BY v) AS BIGINT) AS rn
  FROM t
),
q AS (SELECT CAST(unnest([500000, 990000]) AS INT) AS q_ppm),
tgt AS (
  SELECT n.g, q.q_ppm,
         (CAST(q.q_ppm AS BIGINT) * n.n + 999999) // 1000000 AS rank, n.n
  FROM n, q
)
SELECT tgt.g AS event_type, tgt.q_ppm, r.v AS value,
       CAST(tgt.rank AS BIGINT) AS rank, tgt.n
FROM tgt JOIN r ON r.g = tgt.g AND r.rn = tgt.rank
ORDER BY event_type, q_ppm
"""


def _q_skyline(spark, sf):
    """2-D skyline / pareto front (operators/relational.skyline_2d,
    Börzsönyi et al. ICDE 2001): the maximal (value, props-length)
    events of the %50 slice. Distributed shape: distinct-x collapse →
    range-partitioned LOCAL running max + a numPartitions-row
    boundary-prefix broadcast — never the textbook one-partition
    global window. Twin is the definitional NOT EXISTS dominance test
    (independent implementation) on the parameter-bounded slice.
    ROUND-13-pool candidate."""
    ev = load_table(spark, sf, "events")
    pts = ev.filter(
        (F.col("event_id") % 50 == 0)
        & F.col("value").isNotNull()
        & F.col("props").isNotNull()
    ).select(
        "event_id",
        F.col("value").cast("double").alias("x"),
        F.length("props").cast("bigint").alias("y"),
    )
    return (
        R.skyline_2d(pts, "x", "y")
        .select("event_id", "x", "y")
        .orderBy("event_id")
    )


_SKYLINE_SQL = """
WITH p AS (
  SELECT event_id, CAST(value AS DOUBLE) AS x,
         CAST(len(props) AS BIGINT) AS y
  FROM events
  WHERE event_id % 50 = 0 AND value IS NOT NULL AND props IS NOT NULL
)
SELECT a.event_id, a.x, a.y FROM p a
WHERE NOT EXISTS (
  SELECT 1 FROM p b
  WHERE b.x >= a.x AND b.y >= a.y AND (b.x > a.x OR b.y > a.y)
)
ORDER BY a.event_id
"""


def _q_group_trend(spark, sf):
    """Exact per-group OLS trend (operators/aggregates.group_trend):
    is each priority's order spend rising — slope of cents over epoch
    days with fit quality, all sufficient statistics folded as
    DECIMAL(38,0) (order-free), slope_ppm one exact integer division,
    r2_ppm the staged integer recipe both engines evaluate
    identically (truncation-toward-zero on negatives pinned by the
    TPC-H fixture's near-zero, sign-varying slopes).
    ROUND-13-pool candidate."""
    orders = load_table(spark, sf, "orders")
    pts = orders.select(
        "o_orderpriority",
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")
        ).alias("x"),
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("y"),
    )
    return A.group_trend(pts, "o_orderpriority", "x", "y")


_GROUP_TREND_SQL = """
WITH p AS (
  SELECT o_orderpriority AS g,
         CAST(date_diff('day', DATE '1970-01-01',
                        CAST(o_orderdate AS DATE)) AS HUGEINT) AS x,
         CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
              AS HUGEINT) AS y
  FROM orders
  WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
),
a AS (
  SELECT g, CAST(count(*) AS HUGEINT) AS n,
         sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
         sum(x * x) AS sxx, sum(y * y) AS syy
  FROM p GROUP BY g
)
SELECT g AS o_orderpriority,
       CAST(n AS BIGINT) AS n,
       CAST(CASE WHEN (n * sxx - sx * sx) = 0 THEN NULL
            ELSE (1000000 * (n * sxy - sx * sy)) // (n * sxx - sx * sx)
            END AS BIGINT) AS slope_ppm,
       CAST(CASE WHEN (n * sxx - sx * sx) = 0 OR (n * syy - sy * sy) = 0
            THEN NULL
            ELSE (((1000000 * (n * sxy - sx * sy)) // (n * sxx - sx * sx))
                  * (n * sxy - sx * sy)) // (n * syy - sy * sy)
            END AS BIGINT) AS r2_ppm
FROM a ORDER BY o_orderpriority
"""


def _q_collocations(spark, sf):
    """Exact-lift collocation mining (operators/textan.collocations):
    top-20 adjacent bigrams by 10⁶·N·c(w1w2) DIV (c(w1)·c(w2)) with
    min_count 3 — PMI's ranking without PMI's log, so the twin is
    bit-exact integer arithmetic. ROUND-13-pool candidate."""
    docs = load_table(spark, sf, "documents")
    return X.collocations(docs, k=20, min_count=3)


_COLLOCATIONS_SQL = f"""
WITH tk AS (
  SELECT unnest({_DUCK_TOKS}) AS w FROM documents
),
n AS (SELECT CAST(count(*) AS HUGEINT) AS n FROM tk),
c1 AS (SELECT w, CAST(count(*) AS HUGEINT) AS c FROM tk GROUP BY w),
bg AS (
  SELECT b AS bigram, CAST(count(*) AS HUGEINT) AS cnt
  FROM (
    SELECT array_to_string(toks[CAST(i AS INT):CAST(i + 1 AS INT)], ' ') AS b
    FROM (SELECT {_DUCK_TOKS} AS toks FROM documents),
         unnest(range(1, greatest(len(toks), 1))) AS u(i)
  )
  GROUP BY b HAVING count(*) >= 3
),
lifted AS (
  SELECT bg.bigram, CAST(bg.cnt AS BIGINT) AS cnt,
         CAST((1000000 * n.n * bg.cnt) // (a.c * b.c) AS BIGINT) AS lift_ppm
  FROM bg
  JOIN c1 a ON a.w = string_split(bg.bigram, ' ')[1]
  JOIN c1 b ON b.w = string_split(bg.bigram, ' ')[2]
  CROSS JOIN n
)
SELECT bigram, cnt, lift_ppm,
       CAST(row_number() OVER (ORDER BY lift_ppm DESC, bigram) AS INT) AS rank
FROM lifted
ORDER BY lift_ppm DESC, bigram LIMIT 20
"""


def _q_trgm_ingest_stream(spark, sf):
    """Streaming trigram-index ingest, hash-certified end to end (the
    SIXTH streaming form as a driver row, the ann_ingest_stream_codes
    pattern on the lexical side): the index is built on the
    doc_id%3!=0 base slice, the %3==0 remainder arrives through
    foreach_batch_trgm_sink, and the query is substring_search over
    the union — whose oracle twin is the DIRECT substring scan over
    ALL documents, so the hash-match certifies build + streamed
    append + pruned search in one row. ROUND-13-pool candidate."""
    import shutil
    import tempfile

    from data_pengadaan_agent_spark.operators import trgm as TG

    docs = load_table(spark, sf, "documents")
    base = docs.filter(F.col("doc_id") % 3 != 0)
    rest = docs.filter(F.col("doc_id") % 3 == 0).select("doc_id", "text")
    idx = _warehouse_path(spark, sf, "stream_trgm")
    ack = _warehouse_path(spark, sf, "stream_trgm_ack")
    shutil.rmtree(ack, ignore_errors=True)
    TG.build_trgm_index(base, idx, n_buckets=64)
    srcdir = tempfile.mkdtemp(prefix="trgm_ingest_src_")
    rest.coalesce(1).write.mode("overwrite").parquet(srcdir)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .format("parquet")
        .load(srcdir)
    )
    q = SW.foreach_batch_trgm_sink(
        stream, idx, ack, tempfile.mkdtemp(prefix="trgm_ingest_ckpt_")
    )
    q.processAllAvailable()
    q.stop()
    return TG.substring_search(spark, idx, docs, ["window window"])


_TRGM_INGEST_STREAM_SQL = """
SELECT 'window window' AS pattern, doc_id
FROM documents
WHERE contains(lower(text), 'window window')
ORDER BY doc_id
"""


def _q_hist_cube_stream(spark, sf):
    """Streaming histogram-cube ingest, hash-certified end to end (the
    EIGHTH streaming form as a driver row): cube built on the
    event_id%3!=0 base, the remainder streamed through
    foreach_batch_hist_cube_sink (epoch-id batch registry =
    exactly-once counts), rollup read back — the twin is direct
    bucketing over ALL events, exact integers. ROUND-13-pool
    candidate."""
    import shutil
    import tempfile

    from data_pengadaan_agent_spark.operators import histcube as HC

    ev = load_table(spark, sf, "events").select(
        "event_id", "event_type", "value"
    )
    base = ev.filter(F.col("event_id") % 3 != 0)
    rest = ev.filter(F.col("event_id") % 3 == 0)
    path = _warehouse_path(spark, sf, "stream_hist_cube")
    shutil.rmtree(path, ignore_errors=True)
    HC.build_hist_cube(
        base, path, dims=["event_type"], value_col="value",
        lo=0.0, hi=500.0, n_bins=50,
    )
    srcdir = tempfile.mkdtemp(prefix="histcube_src_")
    rest.coalesce(1).write.mode("overwrite").parquet(srcdir)
    stream = (
        spark.readStream.schema("event_id long, event_type string, value double")
        .format("parquet")
        .load(srcdir)
    )
    q = SW.foreach_batch_hist_cube_sink(
        stream, path, tempfile.mkdtemp(prefix="histcube_ckpt_")
    )
    q.processAllAvailable()
    q.stop()
    return HC.hist_rollup(spark, path, ["event_type"])


_HIST_CUBE_STREAM_SQL = """
WITH b AS (
  SELECT event_type,
         CAST(greatest(0, least(49,
           CAST(floor((CAST(value AS DOUBLE) - 0.0) / 10.0) AS BIGINT)
         )) AS INT) AS bin
  FROM events WHERE value IS NOT NULL
)
SELECT event_type, bin, CAST(count(*) AS BIGINT) AS cnt
FROM b GROUP BY 1, 2
ORDER BY event_type, bin
"""


def _bloom_index_path(spark, sf):
    """Shared ingest-once bloom index over the 80%-corpus slice of
    documents, keyed on the ARITHMETIC content fingerprint (so the
    filter answers "is this CONTENT already ingested", not "this id").
    Geometry 8×4096×63 bits holds <20% fill at sf0.1."""
    from data_pengadaan_agent_spark.operators import bloom as BL
    from data_pengadaan_agent_spark.operators import textan as X

    from data_pengadaan_agent_spark.sources.catalog import local_df

    docs = load_table(spark, sf, "documents")
    path = _warehouse_path(spark, sf, "bloom_index")
    # r15 (VERDICT r14 ask #8): the old gate re-fingerprinted and
    # distinct-counted the WHOLE 80% corpus slice on EVERY call (a
    # full text scan + shuffle, ~45% extra scan work per probe) and
    # then distinct-counted keys/ too. The gate law is now the same
    # one the trgm/postings/gram-count gates already use — source ROW
    # count (a metadata-only parquet count) against a 1-row sidecar
    # this entry writes after a successful build — plus the meta
    # commit-marker read, whose validated 4-tuple forwards into the
    # probe call. (The bloom meta additionally carries the n_keys
    # count marker, maintained by build/ingest/compact, so any
    # gate that does want the registered-key cardinality gets it for
    # free with the meta read instead of a keys/ distinct-count.)
    # Sidecar written AFTER the build: a crash between the two leaves
    # the gate stale and the next call rebuilds — never a fresh-
    # looking half-built index.
    meta = (8, 4096, 7, "fingerprint")
    n_docs = docs.count()
    gate_p = f"{path}/entry_gate"
    try:
        fresh = [
            r["n_source_rows"] for r in spark.read.parquet(gate_p).collect()
        ] == [n_docs] and BL.read_meta_counts(spark, path)[0] == meta
    except Exception:
        fresh = False
    if not fresh:
        corpus = X.fingerprint_arith(docs.filter(F.col("doc_id") % 10 < 8))
        BL.build_bloom_index(
            corpus, path, key_col="fingerprint", n_buckets=8, n_words=4096, k=7
        )
        local_df(spark, [(int(n_docs),)], "n_source_rows bigint").write.mode(
            "overwrite"
        ).parquet(gate_p)
    return path, docs, meta


def _q_bloom_new_rows(spark, sf):
    """Ingest-dedup through the MATERIALIZED bloom index
    (operators/bloom.bloom_new_rows): batch rows whose content
    fingerprint the filter rules out are new with ZERO contact with
    the corpus key table; only the maybe sliver takes the exact
    anti-join. The oracle twin is the DIRECT fingerprint anti-join —
    the certified equality IS the no-false-negative invariant plus
    the probe law plus the verify, in one row. ROUND-13-pool
    candidate."""
    from data_pengadaan_agent_spark.operators import bloom as BL
    from data_pengadaan_agent_spark.operators import textan as X

    path, docs, meta = _bloom_index_path(spark, sf)
    batch = X.fingerprint_arith(docs)
    return (
        BL.bloom_new_rows(spark, path, batch, key_col="fingerprint", _meta=meta)
        .select("doc_id", "fingerprint")
        .orderBy("doc_id")
    )


def _bloom_new_rows_sql() -> str:
    fp = _fingerprint_sql()
    return f"""
WITH fp AS ({fp}),
corpus AS (SELECT DISTINCT fingerprint FROM fp JOIN documents USING (doc_id)
           WHERE doc_id % 10 < 8)
SELECT f.doc_id, f.fingerprint
FROM fp f
WHERE f.fingerprint NOT IN (SELECT fingerprint FROM corpus)
ORDER BY f.doc_id
"""


def _q_bloom_fill_report(spark, sf):
    """Per-bucket filter saturation (operators/bloom.bloom_fill_report):
    registered keys, popcount of the bit_or-grouped words, integer
    fill ppm. The twin recomputes the ENTIRE bit state in DuckDB —
    fold, Knuth/xxhash-prime mixes, Kirsch–Mitzenmacher positions,
    1<<bit masks, bit_or words, bit_count — so a green row certifies
    the persisted filter bit-for-bit (pure-integer class, no rounding
    probes needed). ROUND-13-pool candidate."""
    from data_pengadaan_agent_spark.operators import bloom as BL

    path, _, meta = _bloom_index_path(spark, sf)
    return BL.bloom_fill_report(spark, path, key_col="fingerprint", _meta=meta)


def _bloom_fill_sql(n_buckets: int = 8, n_words: int = 4096, k: int = 7) -> str:
    m = n_words * 63
    fp = _fingerprint_sql()
    return f"""
WITH fp AS ({fp}),
keys AS (SELECT DISTINCT fingerprint AS key FROM fp JOIN documents USING (doc_id)
         WHERE doc_id % 10 < 8),
f AS (SELECT key, ((key % 2147483648) + 2147483648) % 2147483648 AS fold FROM keys),
h AS (SELECT key,
             (fold * 2654435761) % 4294967296 AS h1,
             ((fold + 1) * 2246822519) % 4294967296 * 2 + 1 AS h2,
             CAST(((fold * 3266489917) % 4294967296) % {n_buckets} AS INT) AS bucket
      FROM f),
pr AS (SELECT bucket, (h1 + t.i * h2) % {m} AS pos FROM h, range({k}) t(i)),
words AS (SELECT bucket, CAST(pos // 63 AS INT) AS word_idx,
                 bit_or(CAST(1 AS BIGINT) << CAST(pos % 63 AS INT)) AS word
          FROM pr GROUP BY 1, 2),
nk AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_keys FROM h GROUP BY 1),
sb AS (SELECT bucket, CAST(sum(bit_count(word)) AS BIGINT) AS set_bits
       FROM words GROUP BY 1)
SELECT nk.bucket, nk.n_keys, sb.set_bits,
       CAST(sb.set_bits * 1000000 // {m} AS BIGINT) AS fill_ppm
FROM nk JOIN sb USING (bucket)
ORDER BY nk.bucket
"""


# shared edge-derivation CTE for the graph-family twins: distinct
# (order, part) incidence → canonical u<v pairs with co-order support
# >= 2 (the sparsifier that keeps a basket graph analytic-sized).
_GRAPH_EDGES_CTE = """
pp AS (SELECT DISTINCT l_orderkey o, l_partkey p FROM lineitem),
ed AS (SELECT a.p u, b.p v FROM pp a JOIN pp b USING (o)
       WHERE a.p < b.p GROUP BY 1, 2 HAVING count(*) >= 2),
deg AS (SELECT vertex, CAST(count(*) AS BIGINT) AS degree FROM
        (SELECT u AS vertex FROM ed UNION ALL SELECT v FROM ed) GROUP BY 1)
"""


def _q_graph_triangles(spark, sf):
    """Per-vertex exact triangle census of the co-purchase graph
    (operators/graph.triangle_stats over copurchase_edges):
    degree-ordered orientation bounds every vertex's wedge fan-out by
    O(sqrt(m)) — the skew-proof triangle plan — and the twin counts
    the SAME triangles via the orientation-free id-ordered closure,
    so the equality also proves the orientation enumerates each
    triangle exactly once. Pure-integer clustering ppm. ROUND-13-pool
    candidate."""
    from data_pengadaan_agent_spark.operators import graph as G

    edges = G.copurchase_edges(load_table(spark, sf, "lineitem"), min_co=2)
    return G.triangle_stats(edges)


_GRAPH_TRIANGLES_SQL = f"""
WITH {_GRAPH_EDGES_CTE},
tr AS (SELECT e1.u x, e1.v y, e2.v z
       FROM ed e1 JOIN ed e2 ON e2.u = e1.v
            JOIN ed e3 ON e3.u = e1.u AND e3.v = e2.v),
pv AS (SELECT vertex, CAST(count(*) AS BIGINT) AS triangles FROM
       (SELECT x AS vertex FROM tr UNION ALL SELECT y FROM tr
        UNION ALL SELECT z FROM tr) GROUP BY 1)
SELECT pv.vertex, deg.degree, pv.triangles,
       CAST(2 * pv.triangles * 1000000 // (deg.degree * (deg.degree - 1))
            AS BIGINT) AS clustering_ppm
FROM pv JOIN deg USING (vertex)
ORDER BY pv.triangles DESC, pv.vertex
"""


def _q_graph_pagerank(spark, sf):
    """Deterministic integer PageRank, 2 iterations, top 20
    (operators/graph.pagerank_int): micro-unit ranks, rank DIV degree
    contributions, 150000 + 85·sum DIV 100 damping — bit-identical on
    any engine/partitioning because no float ever enters. The twin
    unrolls both iterations in SQL (the kmeans-twin pattern).
    ROUND-13-pool candidate."""
    from data_pengadaan_agent_spark.operators import graph as G

    edges = G.copurchase_edges(load_table(spark, sf, "lineitem"), min_co=2)
    return G.pagerank_int(edges, iters=2, top_k=20)


_GRAPH_PAGERANK_SQL = f"""
WITH {_GRAPH_EDGES_CTE},
dirs AS (SELECT u s, v d FROM ed UNION ALL SELECT v, u FROM ed),
r0 AS (SELECT vertex, CAST(1000000 AS BIGINT) AS rank_ppm FROM deg),
c1 AS (SELECT d.d vertex, sum(r0.rank_ppm // deg.degree) s
       FROM r0 JOIN deg USING (vertex) JOIN dirs d ON d.s = r0.vertex GROUP BY 1),
r1 AS (SELECT deg.vertex,
              CAST(150000 + 85 * coalesce(c1.s, 0) // 100 AS BIGINT) AS rank_ppm
       FROM deg LEFT JOIN c1 USING (vertex)),
c2 AS (SELECT d.d vertex, sum(r1.rank_ppm // deg.degree) s
       FROM r1 JOIN deg USING (vertex) JOIN dirs d ON d.s = r1.vertex GROUP BY 1),
r2 AS (SELECT deg.vertex,
              CAST(150000 + 85 * coalesce(c2.s, 0) // 100 AS BIGINT) AS rank_ppm
       FROM deg LEFT JOIN c2 USING (vertex))
SELECT vertex, rank_ppm FROM r2 ORDER BY rank_ppm DESC, vertex LIMIT 20
"""


def _q_dq_report(spark, sf):
    """Declarative data-quality suite over orders (operators/dq):
    seven constraints — null, uniqueness, value domain, range, regex,
    SQL predicate, referential to customer — compiled into ONE scan
    for all row-local rules (single partial+final agg) + one exchange
    for the uniqueness key + one broadcast anti-join for the FK. The
    domain/range/regex rules deliberately flag real fixture rows so
    non-zero violation counts are value-checked, not just zeros.
    ROUND-13-pool candidate."""
    from data_pengadaan_agent_spark.operators import dq as DQ

    orders = load_table(spark, sf, "orders")
    customer = load_table(spark, sf, "customer")
    rules = [
        DQ.not_null("o_custkey"),
        DQ.unique("o_orderkey"),
        DQ.accepted_values("o_orderstatus", ["O", "F"]),
        DQ.in_range("o_totalprice", 0.0, 250000.0),
        DQ.matches_regex("o_orderpriority", "^[1-3]-"),
        DQ.satisfies("o_orderdate IS NOT NULL", "has_orderdate"),
        DQ.referential("o_custkey", customer, "c_custkey"),
    ]
    return DQ.dq_check(orders, rules)


_DQ_REPORT_SQL = """
WITH t AS (SELECT * FROM orders)
SELECT rule, violations, checked FROM (
  SELECT 'not_null(o_custkey)' AS rule,
         CAST(count(*) FILTER (o_custkey IS NULL) AS BIGINT) AS violations,
         CAST(count(*) AS BIGINT) AS checked FROM t
  UNION ALL
  SELECT 'unique(o_orderkey)',
         CAST(coalesce((SELECT sum(c) FROM (
           SELECT count(*) c FROM t GROUP BY o_orderkey HAVING count(*) > 1
         )), 0) AS BIGINT),
         CAST(count(*) AS BIGINT) FROM t
  UNION ALL
  SELECT 'accepted_values(o_orderstatus)',
         CAST(count(*) FILTER (o_orderstatus IS NOT NULL
              AND o_orderstatus NOT IN ('O', 'F')) AS BIGINT),
         CAST(count(*) AS BIGINT) FROM t
  UNION ALL
  SELECT 'in_range(o_totalprice)',
         CAST(count(*) FILTER (o_totalprice IS NOT NULL
              AND (o_totalprice < 0.0 OR o_totalprice > 250000.0)) AS BIGINT),
         CAST(count(*) AS BIGINT) FROM t
  UNION ALL
  SELECT 'matches_regex(o_orderpriority)',
         CAST(count(*) FILTER (o_orderpriority IS NOT NULL
              AND NOT regexp_matches(o_orderpriority, '^[1-3]-')) AS BIGINT),
         CAST(count(*) AS BIGINT) FROM t
  UNION ALL
  SELECT 'has_orderdate',
         CAST(count(*) FILTER (NOT coalesce(o_orderdate IS NOT NULL, FALSE))
              AS BIGINT),
         CAST(count(*) AS BIGINT) FROM t
  UNION ALL
  SELECT 'referential(o_custkey)',
         CAST((SELECT count(*) FROM t WHERE o_custkey IS NOT NULL
               AND o_custkey NOT IN (SELECT c_custkey FROM customer)) AS BIGINT),
         CAST(count(*) FILTER (o_custkey IS NOT NULL) AS BIGINT) FROM t
)
ORDER BY rule
"""


def _q_retention_cohorts(spark, sf):
    """Daily cohort retention matrix over events
    (operators/relational.retention_cohorts, grain='day'): integer
    epoch-day arithmetic, distinct (user, day) then min-day per user
    — both exchanges on the user key. ROUND-13-pool candidate."""
    from data_pengadaan_agent_spark.operators import relational as R

    return R.retention_cohorts(load_table(spark, sf, "events"), grain="day")


_RETENTION_COHORTS_SQL = """
WITH active AS (
  SELECT DISTINCT user_id u,
         CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) m
  FROM events
),
first AS (SELECT u, min(m) c FROM active GROUP BY 1)
SELECT DATE '1970-01-01' + CAST(c AS INT) AS cohort_start,
       CAST(m - c AS BIGINT) AS offset_periods,
       CAST(count(*) AS BIGINT) AS n_users
FROM active JOIN first USING (u)
GROUP BY 1, 2
ORDER BY cohort_start, offset_periods
"""


def _q_event_transitions(spark, sf):
    """First-order behavior transition matrix
    (operators/relational.event_transitions): per-user lag under the
    total (ts, event_id) order, exact integer outgoing-share ppm.
    ROUND-13-pool candidate."""
    from data_pengadaan_agent_spark.operators import relational as R

    return R.event_transitions(load_table(spark, sf, "events"))


_EVENT_TRANSITIONS_SQL = """
WITH seq AS (
  SELECT event_type AS to_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS from_type
  FROM events
),
pairs AS (
  SELECT from_type, to_type, CAST(count(*) AS BIGINT) n
  FROM seq WHERE from_type IS NOT NULL GROUP BY 1, 2
)
SELECT from_type, to_type, n,
       CAST(n * 1000000 // sum(n) OVER (PARTITION BY from_type) AS BIGINT)
         AS prob_ppm
FROM pairs
ORDER BY from_type, to_type
"""


_CMS_KEYS = ["data", "model", "nosuchtoken", "query", "spark"]


def _q_cms_freq(spark, sf):
    """Count-Min frequency cube (operators/cmscube — the third
    mergeable sketch: HLL=distinct, hist=quantiles, CMS=point
    frequencies): per-lang token sketches at d=4 × w=512 under the
    arithmetic poly-hash + LCG universal-hash law, point estimates
    for a literal key list (slots computed driver-side → the counter
    scan is literal-filtered). The twin recomputes EVERY counter in
    DuckDB — pure-integer class, the sketch state itself is
    value-certified. ROUND-13-pool candidate."""
    from data_pengadaan_agent_spark.operators import cmscube as CM
    from data_pengadaan_agent_spark.operators import textan as X

    docs = load_table(spark, sf, "documents")
    toks = docs.select(
        "lang", F.explode(X.tokens("text")).alias("tok")
    ).filter(F.col("tok") != "")
    path = _warehouse_path(spark, sf, "cms_cube")
    try:
        fresh = CM._read_meta(spark, path) == (["lang"], "tok", 4, 512, 424242)
    except Exception:
        fresh = False
    if not fresh:
        CM.build_cms_cube(toks, path, dims=["lang"], key_col="tok", d=4, w=512)
    return CM.cms_estimate(spark, path, _CMS_KEYS, ["lang"])


def _cms_freq_sql(d: int = 4, w: int = 512, seed: int = 424242) -> str:
    from data_pengadaan_agent_spark.operators.cmscube import py_slots
    from data_pengadaan_agent_spark.operators.dedup import _lcg_coeffs

    poly = _DUCK_POLY.format(s="tok", mult=131)
    coef_rows = ", ".join(
        f"({j}, {a}, {b})" for j, (a, b) in enumerate(_lcg_coeffs(d, seed))
    )
    slot_rows = ", ".join(
        f"('{k}', {row}, {col})"
        for k in _CMS_KEYS
        for row, col in py_slots(k, d, w, seed)
    )
    return f"""
WITH tok AS (
  SELECT lang, unnest(list_filter(
    string_split_regex(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+'),
    t -> t <> '')) AS tok
  FROM documents
),
coef(j, a, b) AS (VALUES {coef_rows}),
counters AS (
  SELECT lang, coef.j AS row,
         CAST(((coef.a * ({poly}) + coef.b) % 2147483647) % {w} AS INT) AS col,
         CAST(count(*) AS BIGINT) AS cnt
  FROM tok, coef GROUP BY 1, 2, 3
),
ks(key, row, col) AS (VALUES {slot_rows}),
langs AS (SELECT DISTINCT lang FROM tok)
SELECT langs.lang AS lang, ks.key AS key,
       CAST(min(coalesce(counters.cnt, 0)) AS BIGINT) AS est
FROM langs CROSS JOIN ks
LEFT JOIN counters ON counters.lang = langs.lang
  AND counters.row = ks.row AND counters.col = ks.col
GROUP BY 1, 2
ORDER BY langs.lang, ks.key
"""


def _q_event_ngrams(spark, sf):
    """Behavioral sequence mining, n-gram tier
    (operators/relational.event_ngrams): contiguous 3-step event-type
    sequences per user under the total (ts, event_id) order, support
    >= 2. One user-keyed window pass (two leads) + one small count.
    Pattern emitted as 'a>b>c' for the driver hash (the op returns
    the array). ROUND-13-pool candidate."""
    from data_pengadaan_agent_spark.operators import relational as R

    out = R.event_ngrams(load_table(spark, sf, "events"), n=3, min_support=2)
    return out.select(
        F.array_join("pattern", ">").alias("pattern"), "support"
    ).orderBy(F.desc("support"), "pattern")


_EVENT_NGRAMS_SQL = """
WITH seq AS (
  SELECT event_type t0,
         lead(event_type, 1) OVER w t1,
         lead(event_type, 2) OVER w t2
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT t0 || '>' || t1 || '>' || t2 AS pattern,
       CAST(count(*) AS BIGINT) AS support
FROM seq WHERE t1 IS NOT NULL AND t2 IS NOT NULL
GROUP BY 1 HAVING count(*) >= 2
ORDER BY support DESC, pattern
"""


def _q_peak_concurrency(spark, sf):
    """Exact interval-overlap sweep
    (operators/relational.concurrency_timeline): each event holds a
    5-minute half-open activity interval; +1/−1 deltas cumulative-sum
    per event_type (one window shuffle, O(2·rows) points — never a
    per-minute explode); reported as peak simultaneous activity per
    type. ROUND-13-pool candidate."""
    from data_pengadaan_agent_spark.operators import relational as R

    ev = load_table(spark, sf, "events").select(
        "event_type",
        F.col("ts").alias("start"),
        (F.col("ts") + F.expr("INTERVAL 5 MINUTES")).alias("end"),
    )
    tl = R.concurrency_timeline(ev, "start", "end", ["event_type"])
    return (
        tl.groupBy("event_type")
        .agg(
            F.max("concurrent").cast("bigint").alias("peak_concurrent"),
            F.count(F.lit(1)).cast("bigint").alias("n_points"),
        )
        .orderBy("event_type")
    )


_PEAK_CONCURRENCY_SQL = """
WITH iv AS (
  SELECT event_type, ts AS s, ts + INTERVAL 5 MINUTE AS e FROM events
),
pts AS (
  SELECT event_type, s AS ts, 1 AS d FROM iv
  UNION ALL SELECT event_type, e, -1 FROM iv
),
merged AS (
  SELECT event_type, ts, sum(d) AS delta FROM pts GROUP BY 1, 2
),
tl AS (
  SELECT event_type, ts,
         sum(delta) OVER (PARTITION BY event_type ORDER BY ts
                          ROWS UNBOUNDED PRECEDING) AS concurrent
  FROM merged
)
SELECT event_type, CAST(max(concurrent) AS BIGINT) AS peak_concurrent,
       CAST(count(*) AS BIGINT) AS n_points
FROM tl GROUP BY 1 ORDER BY event_type
"""


def _q_incremental_components(spark, sf):
    """Incremental connected-components maintenance
    (operators/graph.merge_components): CC over the first-150-docs
    near-dup pairs, then the remaining pairs + docs folded in via
    label contraction — distinct label-pair graph closed by a
    driver-side min-root union-find, relabel broadcast back. The twin
    is the BATCH closure over all 200 docs (the registered
    dedup_clusters oracle verbatim), so the certified equality is
    incremental ≡ full recompute. ROUND-13-pool candidate."""
    from data_pengadaan_agent_spark.operators import graph as G

    docs = load_table(spark, sf, "documents").filter(F.col("doc_id") < 200)
    pairs = (
        D.ngram_jaccard_pairs(docs, n=3, threshold=0.12)
        .select("id_a", "id_b")
        .localCheckpoint(eager=True)
    )
    base_pairs = pairs.filter((F.col("id_a") < 150) & (F.col("id_b") < 150))
    new_pairs = pairs.filter((F.col("id_a") >= 150) | (F.col("id_b") >= 150))
    base = D.dedup_clusters(docs.filter(F.col("doc_id") < 150), base_pairs).select(
        F.col("doc_id").alias("node"), F.col("cluster_rep").alias("label")
    )
    merged = G.merge_components(
        base,
        new_pairs.withColumnRenamed("id_a", "u").withColumnRenamed("id_b", "v"),
        new_nodes=docs.filter(F.col("doc_id") >= 150).select(
            F.col("doc_id").alias("node")
        ),
    )
    return merged.select(
        F.col("node").alias("doc_id"), F.col("label").alias("cluster_rep")
    ).orderBy("doc_id")


def _zonemap_table_path(spark, sf):
    """Ingest-once: orders range-clustered on o_totalprice into 16
    files + a persisted zone map over that column (the layout that
    makes a price box skip most files)."""
    from data_pengadaan_agent_spark.operators import zonemap as ZM

    orders = load_table(spark, sf, "orders")
    data_p = _warehouse_path(spark, sf, "orders_ranged")
    zm_p = _warehouse_path(spark, sf, "orders_zonemap")
    n = orders.count()
    try:
        fresh = (
            spark.read.parquet(data_p).count() == n
            and ZM._read_meta(spark, zm_p) == ["o_totalprice"]
            and ZM.audit_zonemap(spark, data_p, zm_p).count() == 0
        )
    except Exception:
        fresh = False
    if not fresh:
        orders.repartitionByRange(16, "o_totalprice").write.mode(
            "overwrite"
        ).parquet(data_p)
        ZM.build_zonemap(spark, data_p, zm_p, ["o_totalprice"])
    return data_p, zm_p


def _q_zonemap_scan(spark, sf):
    """Zone-map pruned box scan (operators/zonemap — the NINTH index
    family: file-level data skipping as a persisted stats TABLE; the
    pruned file list comes from kilobytes of zone rows, and only the
    surviving range-clustered files are opened). The twin is the
    DIRECT filtered scan of the base table — lossless-skipping is the
    certified equality (semantic-twin class). ROUND-13-pool
    candidate."""
    from data_pengadaan_agent_spark.operators import zonemap as ZM

    data_p, zm_p = _zonemap_table_path(spark, sf)
    out = ZM.zonemap_pruned_scan(
        spark, data_p, zm_p, {"o_totalprice": (400_000.0, 450_000.0)}
    )
    return out.select("o_orderkey", "o_totalprice").orderBy("o_orderkey")


_ZONEMAP_SCAN_SQL = """
SELECT o_orderkey, o_totalprice
FROM orders
WHERE o_totalprice >= 400000.0 AND o_totalprice <= 450000.0
ORDER BY o_orderkey
"""


def _q_change_point(spark, sf):
    """Offline CUSUM change-point per event_type
    (operators/drift.change_point): argmax_k |n·prefix_k − k·S| over
    the milli-gridded value series under the total (ts, event_id)
    order — the cumulative deviation kept in cross-multiplied BIGINT
    form so no mean is ever divided; earliest k wins ties. One window
    shuffle per group. ROUND-13-pool candidate."""
    from data_pengadaan_agent_spark.operators import drift as DR

    return DR.change_point(
        load_table(spark, sf, "events"), ["event_type"], "ts", "value", "event_id"
    )


_CHANGE_POINT_SQL = """
WITH g AS (
  SELECT event_type, ts, event_id,
         CAST(floor(CAST(value AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS x
  FROM events WHERE value IS NOT NULL
),
r AS (
  SELECT event_type, ts, event_id, x,
         row_number() OVER w AS k,
         sum(x) OVER (PARTITION BY event_type ORDER BY ts, event_id
                      ROWS UNBOUNDED PRECEDING) AS prefix,
         count(*) OVER (PARTITION BY event_type) AS n,
         sum(x) OVER (PARTITION BY event_type) AS s
  FROM g
  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
),
d AS (
  SELECT event_type, ts, k, n, abs(n * prefix - k * s) AS dev,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY abs(n * prefix - k * s) DESC, k) AS pick
  FROM r
)
SELECT event_type, ts AS cp_ts, CAST(k AS BIGINT) AS cp_k,
       CAST(n AS BIGINT) AS n, CAST(dev AS BIGINT) AS score
FROM d WHERE pick = 1
ORDER BY event_type
"""


def _q_hist_drift(spark, sf):
    """Exact-integer distribution drift (operators/drift.
    histogram_drift): L1 distance between the click- and view-event
    value share vectors over 20 structural bins — the PSI/KL question
    without the log (0 = identical shape, 2·10^6 = disjoint).
    ROUND-13-pool candidate."""
    from data_pengadaan_agent_spark.operators import drift as DR

    ev = load_table(spark, sf, "events")
    return DR.histogram_drift(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "view"),
        "value",
        lo=0.0,
        hi=400.0,
        n_bins=20,
    )


_HIST_DRIFT_SQL = """
WITH a AS (
  SELECT CAST(greatest(0, least(19,
           CAST(floor((CAST(value AS DOUBLE) - 0.0) / 20.0) AS BIGINT)
         )) AS INT) AS bin, count(*) AS cnt
  FROM events WHERE event_type = 'click' AND value IS NOT NULL GROUP BY 1
),
b AS (
  SELECT CAST(greatest(0, least(19,
           CAST(floor((CAST(value AS DOUBLE) - 0.0) / 20.0) AS BIGINT)
         )) AS INT) AS bin, count(*) AS cnt
  FROM events WHERE event_type = 'view' AND value IS NOT NULL GROUP BY 1
),
j AS (
  SELECT coalesce(a.cnt, 0) AS ca, coalesce(b.cnt, 0) AS cb
  FROM a FULL JOIN b USING (bin)
),
t AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM j)
SELECT CAST(t.na AS BIGINT) AS n_a, CAST(t.nb AS BIGINT) AS n_b,
       CAST(sum(abs(j.ca * 1000000 // t.na - j.cb * 1000000 // t.nb))
            AS BIGINT) AS drift_ppm
FROM j, t GROUP BY t.na, t.nb
"""


def _q_kmv_distinct(spark, sf):
    """KMV bottom-k distinct cube (operators/kmv — the HLL cube's
    ORACLE-CERTIFIABLE sibling): k=64 smallest Knuth-hash values of
    l_partkey per (returnflag, linestatus); coupon mode below k is
    exact, at capacity est = (k−1)·2^32 DIV h_(k). The twin
    recomputes the whole sketch state — hash, distinct, rank cut,
    estimator — in DuckDB. ROUND-13-pool candidate."""
    from data_pengadaan_agent_spark.operators import kmv as KV

    li = load_table(spark, sf, "lineitem")
    path = _warehouse_path(spark, sf, "kmv_cube")
    try:
        fresh = KV._read_meta(spark, path) == (
            ["l_returnflag", "l_linestatus"], "l_partkey", 64,
        )
    except Exception:
        fresh = False
    if not fresh:
        KV.build_kmv_cube(
            li, path, dims=["l_returnflag", "l_linestatus"],
            key_col="l_partkey", k=64,
        )
    return KV.kmv_distinct(spark, path, ["l_returnflag", "l_linestatus"])


_KMV_DISTINCT_SQL = """
WITH h AS (
  SELECT DISTINCT l_returnflag, l_linestatus,
         (((l_partkey % 2147483648) + 2147483648) % 2147483648
          * 2654435761) % 4294967296 AS hv
  FROM lineitem WHERE l_partkey IS NOT NULL
),
r AS (
  SELECT l_returnflag, l_linestatus, hv,
         row_number() OVER (PARTITION BY l_returnflag, l_linestatus
                            ORDER BY hv) AS rk
  FROM h
),
cut AS (SELECT * FROM r WHERE rk <= 64),
agg AS (
  SELECT l_returnflag, l_linestatus,
         CAST(count(*) AS BIGINT) AS n_samples,
         max(CASE WHEN rk = 64 THEN hv END) AS hk
  FROM cut GROUP BY 1, 2
)
SELECT l_returnflag, l_linestatus, n_samples,
       CAST(CASE WHEN n_samples < 64 THEN n_samples
                 ELSE 63 * 4294967296 // hk END AS BIGINT) AS est_distinct
FROM agg
ORDER BY l_returnflag, l_linestatus
"""


def _q_kmv_overlap(spark, sf):
    """Cross-group overlap FROM THE SKETCHES ALONE
    (operators/kmv.kmv_overlap, Beyer et al. 2007): Jaccard /
    intersection estimates between returnflag A's and N's part sets
    read from ≤ 2k sample rows — the sketch tier of
    cross_source_overlap (which pays a corpus-distinct join). The
    twin replays the per-group cuts, the union re-cut, and the
    integer estimators. ROUND-13-pool candidate."""
    from data_pengadaan_agent_spark.operators import kmv as KV

    path, _ = _warehouse_path(spark, sf, "kmv_cube"), None
    _q_kmv_distinct(spark, sf)  # ensures the cube is built/fresh
    return KV.kmv_overlap(spark, path, "l_returnflag", "A", "N")


_KMV_OVERLAP_SQL = """
WITH h AS (
  SELECT DISTINCT l_returnflag, l_linestatus,
         (((l_partkey % 2147483648) + 2147483648) % 2147483648
          * 2654435761) % 4294967296 AS hv
  FROM lineitem WHERE l_partkey IS NOT NULL
),
cut AS (
  SELECT * FROM (
    SELECT l_returnflag, l_linestatus, hv,
           row_number() OVER (PARTITION BY l_returnflag, l_linestatus
                              ORDER BY hv) AS rk
    FROM h
  ) WHERE rk <= 64
),
sides AS (
  SELECT DISTINCT l_returnflag AS g, hv FROM cut
  WHERE l_returnflag IN ('A', 'N')
),
u AS (
  SELECT hv,
         max(CASE WHEN g = 'A' THEN 1 ELSE 0 END) AS in_a,
         max(CASE WHEN g = 'N' THEN 1 ELSE 0 END) AS in_b
  FROM sides GROUP BY 1
),
uc AS (
  SELECT * FROM (
    SELECT hv, in_a, in_b, row_number() OVER (ORDER BY hv) AS rk FROM u
  ) WHERE rk <= 64
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_union_samples,
         CAST(sum(in_a * in_b) AS BIGINT) AS shared,
         max(CASE WHEN rk = 64 THEN hv END) AS hk
  FROM uc
)
SELECT n_union_samples, shared,
       CAST(shared * 1000000 // n_union_samples AS BIGINT) AS jaccard_ppm,
       CAST(CASE WHEN n_union_samples < 64 THEN n_union_samples
                 ELSE 63 * 4294967296 // hk END AS BIGINT) AS est_union,
       CAST(CASE WHEN n_union_samples < 64 THEN n_union_samples
                 ELSE 63 * 4294967296 // hk END
            * shared // n_union_samples AS BIGINT) AS est_intersection
FROM agg
"""


def _q_pit_join(spark, sf):
    """Point-in-time join (operators/asof.point_in_time_join — the
    feature-store read of scd2_history): each event, shifted 10
    minutes forward, picks the user-state VERSION valid at that
    instant — latest valid_from <= ts with ts < valid_to (NULL =
    open). Union+window plan (one key exchange + one sort-window),
    never a range/theta join. Leakage-free by construction: no
    future version can match. ROUND-13-pool candidate."""
    from data_pengadaan_agent_spark.operators import asof as AS
    from data_pengadaan_agent_spark.operators import relational as R

    ev = load_table(spark, sf, "events")
    dim = R.scd2_history(ev)
    facts = ev.filter(F.col("event_id") % 5 == 0).select(
        "event_id",
        "user_id",
        (F.col("ts") + F.expr("INTERVAL 10 MINUTES")).alias("ts2"),
    )
    out = AS.point_in_time_join(
        facts, dim, key="user_id", fact_ts="ts2", payload_cols=["state", "version"]
    )
    return out.select(
        "event_id", "user_id", "ts2",
        F.col("state_dim").alias("state"),
        F.col("version_dim").cast("bigint").alias("version"),
    ).orderBy("event_id")


_PIT_JOIN_SQL = """
WITH ordered AS (
  SELECT user_id, event_type, ts, event_id,
         CASE WHEN lag(event_type) OVER w IS NULL
                   OR lag(event_type) OVER w <> event_type
              THEN 1 ELSE 0 END AS chg
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
runs AS (
  SELECT user_id, event_type, ts, event_id,
         sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS v
  FROM ordered
),
hist AS (
  SELECT user_id, CAST(v AS INT) AS version, min(event_type) AS state,
         min(ts) AS valid_from
  FROM runs GROUP BY user_id, v
),
dim AS (
  SELECT user_id, version, state, valid_from,
         lead(valid_from) OVER (PARTITION BY user_id ORDER BY version)
           AS valid_to
  FROM hist
),
facts AS (
  SELECT event_id, user_id, ts + INTERVAL 10 MINUTE AS ts2 FROM events
  WHERE event_id % 5 = 0
)
SELECT f.event_id, f.user_id, f.ts2, d.state,
       CAST(d.version AS BIGINT) AS version
FROM facts f
LEFT JOIN dim d
  ON d.user_id = f.user_id
 AND d.valid_from <= f.ts2
 AND (d.valid_to IS NULL OR f.ts2 < d.valid_to)
ORDER BY f.event_id
"""


def _q_valueset_scan(spark, sf):
    """Categorical file-skipping through the value-set index
    (operators/zonemap.valueset_pruned_scan — the zonemap's sibling
    for UNCLUSTERED equality predicates: per-(file, value) existence
    rows, an IN query keeps exactly the files containing any wanted
    value). Twin = the direct filtered scan (lossless by the
    existence argument; the pruning payoff is pinned in pytest on a
    planted layout). ROUND-13-pool candidate."""
    from data_pengadaan_agent_spark.operators import zonemap as ZM

    data_p, _ = _zonemap_table_path(spark, sf)
    vs_p = _warehouse_path(spark, sf, "orders_valueset")
    try:
        fresh = (
            ZM._vs_read_meta(spark, vs_p) == "o_orderstatus"
            and not [
                f
                for f in ZM._data_files(data_p)
                if f
                not in {
                    r.file
                    for r in spark.read.parquet(f"{vs_p}/values")
                    .select("file")
                    .distinct()
                    .collect()
                }
            ]
        )
    except Exception:
        fresh = False
    if not fresh:
        ZM.build_valueset_index(spark, data_p, vs_p, "o_orderstatus")
    out = ZM.valueset_pruned_scan(spark, data_p, vs_p, ["P"])
    return (
        out.select("o_orderkey", "o_orderstatus", "o_totalprice")
        .orderBy("o_orderkey")
        .limit(2000)
    )


_VALUESET_SCAN_SQL = """
SELECT o_orderkey, o_orderstatus, o_totalprice
FROM orders
WHERE o_orderstatus IN ('P')
ORDER BY o_orderkey
LIMIT 2000
"""


def _q_zorder_zonemap_scan(spark, sf):
    """The layout + skipping COMPOSITION, end to end as one certified
    row: lineitem written Z-ORDERED on (l_partkey, l_suppkey)
    (layout.write_zordered — each file covers a compact Morton cell,
    so BOTH columns' per-file ranges are narrow), zone-mapped on both
    columns, then a 2-D box answered through the pruned scan. A
    linear sort would prune only its leading column; the Morton
    layout is what makes the second predicate prune too
    (layout.file_skip_fraction measured it; this row certifies the
    composed RESULT against the direct scan). ROUND-13-pool
    candidate."""
    from data_pengadaan_agent_spark.operators import layout as LY
    from data_pengadaan_agent_spark.operators import zonemap as ZM

    li = load_table(spark, sf, "lineitem")
    data_p = _warehouse_path(spark, sf, "lineitem_zordered")
    zm_p = _warehouse_path(spark, sf, "lineitem_zm2d")
    n = li.count()
    try:
        fresh = (
            spark.read.parquet(data_p).count() == n
            and ZM._read_meta(spark, zm_p) == ["l_partkey", "l_suppkey"]
            and ZM.audit_zonemap(spark, data_p, zm_p).count() == 0
        )
    except Exception:
        fresh = False
    if not fresh:
        LY.write_zordered(li, data_p, ["l_partkey", "l_suppkey"], n_files=16)
        ZM.build_zonemap(spark, data_p, zm_p, ["l_partkey", "l_suppkey"])
    out = ZM.zonemap_pruned_scan(
        spark, data_p, zm_p,
        {"l_partkey": (50.0, 150.0), "l_suppkey": (1.0, 8.0)},
    )
    return (
        out.select("l_orderkey", "l_partkey", "l_suppkey")
        .orderBy("l_orderkey", "l_partkey", "l_suppkey")
        .limit(2000)
    )


_ZORDER_ZONEMAP_SQL = """
SELECT l_orderkey, l_partkey, l_suppkey
FROM lineitem
WHERE l_partkey BETWEEN 50 AND 150
  AND l_suppkey BETWEEN 1 AND 8
ORDER BY l_orderkey, l_partkey, l_suppkey
LIMIT 2000
"""


def candidate_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Registration CANDIDATES for future rounds: fully built entries
    with bit-exact DuckDB twins, held out of queries() only because
    the current round's rotation gate window is full (see
    tools/plan_rotation.py for the registration arithmetic).
    Registering one = moving its name into _query_impls()/
    _oracle_sql_impls() and bumping the floors. Locally they are
    swept by tools/check_oracle.py and value-checked by pytest like
    everything else.

    Round 7 promoted all three round-6 candidates; round 8 promoted
    all five round-7 candidates; round 9 promoted its four pre-planned
    candidates paired with due-set retirements; round 10 promoted the
    winnow pair paired with retiring minhash_lsh_pairs +
    corpus_ingest_stream (coverage arguments in _RETIRED_TIER3 and
    NOTES). Round 11 promoted dup_spans / dup_spans_incremental /
    bm25_index_retrieval / bpe_merges (the pre-verified 4-in/3-out
    triage) — their lineage consumers dup_span_stats /
    strip_dup_spans and the self-contained lexical_diversity /
    dup_run_pairs / corpus_ingest_stream_dup_spans /
    zorder_key_orders stay here, locally swept + value-checked.
    Round 10 added seven to the r12 pool: pq_adc_topk, ivfpq_adc_topk,
    pq_adc_batch and pq_quant_report (product quantization, its IVF
    composition, the batched multi-query ADC, and the
    codebook-staleness monitor), bpe_encode_vocab (encode-side BPE),
    ann_ingest_stream_codes (the fifth streaming form, hash-certified
    end to end), and bm25_components_probe (a diagnostic probe that
    stays unregistered — its contingency branch died when
    bm25_retrieval_batch went driver-green in r10). Round 11 added
    ivfpq_adc_batch (batched ADC composed with IVF pruning — the r12
    registration pick), the SQ8 pair sq_topk / sq_quant_report
    (the codegen-only compression tier, r13 pool), the BQ pair
    bq_topk / bq_rerank_topk (the 1-bit Hamming tier + its two-stage
    exact re-rank, r13 pool), kcenter_coreset (greedy farthest-point
    selection on the exact integer micro grid, r13 pool),
    kcenter_coverage (the sampled selection + one-scan full-corpus
    coverage composition — the large-k 100 TB shape, r13 pool), and
    bq_topk_batch (the pure-codegen batch miner: every Hamming fold
    in one scan, WindowGroupLimit partial top-k ahead of the single
    qid exchange, r13 pool). The r12 staging triage is recorded in
    NOTES ("Round 12 registration triage")."""
    return {
        "dup_span_stats": _q_dup_span_stats,
        "lexical_diversity": _q_lexical_diversity,
        "strip_dup_spans": _q_strip_dup_spans,
        "dup_run_pairs": _q_dup_run_pairs,
        "corpus_ingest_stream_dup_spans": _q_corpus_ingest_stream_dup_spans,
        "zorder_key_orders": _q_zorder_key_orders,
        "pq_adc_topk": _q_pq_adc_topk,
        "ivfpq_adc_topk": _q_ivfpq_adc_topk,
        "bpe_encode_vocab": _q_bpe_encode_vocab,
        "bm25_components_probe": _q_bm25_components_probe,
        "pq_adc_batch": _q_pq_adc_batch,
        "pq_quant_report": _q_pq_quant_report,
        "sq_topk": _q_sq_topk,
        "sq_quant_report": _q_sq_quant_report,
        "bq_topk": _q_bq_topk,
        "bq_rerank_topk": _q_bq_rerank_topk,
        "kcenter_coreset": _q_kcenter_coreset,
        "kcenter_coverage": _q_kcenter_coverage,
        "bq_topk_batch": _q_bq_topk_batch,
        "trgm_similar": _q_trgm_similar,
        "weighted_sample": _q_weighted_sample,
        "exact_quantiles": _q_exact_quantiles,
        "skyline": _q_skyline,
        "group_trend": _q_group_trend,
        "collocations": _q_collocations,
        "trgm_ingest_stream": _q_trgm_ingest_stream,
        "hist_cube_stream": _q_hist_cube_stream,
        "graph_pagerank": _q_graph_pagerank,
        "retention_cohorts": _q_retention_cohorts,
        "event_transitions": _q_event_transitions,
        "event_ngrams": _q_event_ngrams,
        "peak_concurrency": _q_peak_concurrency,
        "zonemap_scan": _q_zonemap_scan,
        "change_point": _q_change_point,
        "hist_drift": _q_hist_drift,
        "valueset_scan": _q_valueset_scan,
    }


# incremental_components twin: the recursive-CTE transitive closure —
# certifies that the iterative large-star/small-star Spark path
# converges to the exact connected-components labeling.
_INCREMENTAL_COMPONENTS_SQL = """
            WITH RECURSIVE d AS (
              SELECT doc_id, string_split_regex(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+') AS toks
              FROM documents WHERE doc_id < 200
            ), sh AS (
              SELECT doc_id, unnest(list_distinct(
                       list_transform(range(1, greatest(len(toks) - 3, 0) + 2),
                                      i -> array_to_string(toks[i:i+2], ' ')))) AS shingle
              FROM d
            ), sz AS (
              SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id
            ), inter AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
              FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            ), pairs AS (
              SELECT id_a, id_b FROM inter
              JOIN sz sa ON sa.doc_id = id_a
              JOIN sz sb ON sb.doc_id = id_b
              WHERE CAST(n_inter AS DOUBLE)
                    / CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE) >= 0.12
            ), edges AS (
              SELECT id_a AS src, id_b AS dst FROM pairs
              UNION SELECT id_b, id_a FROM pairs
            ), reach(a, b) AS (
              SELECT src, dst FROM edges
              UNION
              SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src
            )
            SELECT dd.doc_id, least(dd.doc_id, coalesce(min(r.b), dd.doc_id)) AS cluster_rep
            FROM (SELECT doc_id FROM documents WHERE doc_id < 200) dd
            LEFT JOIN reach r ON r.a = dd.doc_id
            GROUP BY dd.doc_id ORDER BY dd.doc_id
        """


def candidate_oracle_sql() -> dict[str, str]:
    return {
        "dup_span_stats": _dup_span_stats_sql(length=8, min_count=2),
        "lexical_diversity": _LEXICAL_DIVERSITY_SQL,
        "strip_dup_spans": _strip_dup_spans_sql(length=8, min_count=2),
        "dup_run_pairs": _dup_run_pairs_sql(length=6, max_df=50),
        "corpus_ingest_stream_dup_spans": _corpus_ingest_dup_spans_sql(
            length=8, max_ppm=500_000
        ),
        "zorder_key_orders": _zorder_key_orders_sql(),
        "pq_adc_topk": _pq_adc_sql(m=4, ksub=4, dim=64, k=10),
        "ivfpq_adc_topk": _ivfpq_adc_sql(kc=4, m=4, ksub=4, dim=64, k=10, n_probe=2),
        "bpe_encode_vocab": _bpe_merges_sql(k=3, vocab=True),
        "bm25_components_probe": _bm25_retrieval_batch_sql(tail=_BM25_PROBE_TAIL),
        "pq_adc_batch": _pq_adc_batch_sql(m=4, ksub=4, dim=64, k=5),
        "pq_quant_report": _pq_quant_report_sql(m=4, ksub=4, dim=64),
        "sq_topk": _sq_topk_sql(dim=64, k=10),
        "sq_quant_report": _sq_quant_report_sql(dim=64),
        "bq_topk": _bq_topk_sql(dim=64, k=10),
        "bq_rerank_topk": _bq_rerank_sql(dim=64, k=10, shortlist=50),
        "kcenter_coreset": _kcenter_sql(k=5, dim=64),
        "kcenter_coverage": _kcenter_coverage_sql(k=4, sample_frac=0.25),
        "bq_topk_batch": _bq_topk_batch_sql(dim=64, k=5),
        "trgm_similar": _trgm_similar_sql(
            "the fast key order sort table scan merge", 250_000
        ),
        "weighted_sample": _WEIGHTED_SAMPLE_SQL,
        "exact_quantiles": _EXACT_QUANTILES_SQL,
        "skyline": _SKYLINE_SQL,
        "group_trend": _GROUP_TREND_SQL,
        "collocations": _COLLOCATIONS_SQL,
        "trgm_ingest_stream": _TRGM_INGEST_STREAM_SQL,
        "hist_cube_stream": _HIST_CUBE_STREAM_SQL,
        "graph_pagerank": _GRAPH_PAGERANK_SQL,
        "retention_cohorts": _RETENTION_COHORTS_SQL,
        "event_transitions": _EVENT_TRANSITIONS_SQL,
        "event_ngrams": _EVENT_NGRAMS_SQL,
        "peak_concurrency": _PEAK_CONCURRENCY_SQL,
        "zonemap_scan": _ZONEMAP_SCAN_SQL,
        "change_point": _CHANGE_POINT_SQL,
        "hist_drift": _HIST_DRIFT_SQL,
        "valueset_scan": _VALUESET_SCAN_SQL,
    }


def _oracle_sql_impls() -> dict[str, str]:
    return {
        # --- round-14 registrations (promoted candidates) ---
        "incremental_components": _INCREMENTAL_COMPONENTS_SQL,
        "bloom_fill_report": _bloom_fill_sql(n_buckets=8, n_words=4096, k=7),
        "cms_freq": _cms_freq_sql(d=4, w=512, seed=424242),
        "kmv_overlap": _KMV_OVERLAP_SQL,
        "fuzzy_dup_pairs": _FUZZY_DUP_PAIRS_SQL,
        "heavy_hitters": _HEAVY_HITTERS_SQL,
        "hist_quantiles": _HIST_QUANTILES_SQL,
        # --- round-13 registrations (promoted candidates) ---
        "kmv_distinct": _KMV_DISTINCT_SQL,
        "dq_report": _DQ_REPORT_SQL,
        "graph_triangles": _GRAPH_TRIANGLES_SQL,
        "zorder_zonemap_scan": _ZORDER_ZONEMAP_SQL,
        "pit_join": _PIT_JOIN_SQL,
        # --- round-12 registrations (promoted candidates) ---
        "ivfpq_adc_batch": _ivfpq_adc_batch_sql(
            kc=4, m=4, ksub=4, dim=64, k=5, n_probe=2
        ),
        "ann_ingest_stream_codes": _ann_ingest_codes_sql(),
        "trgm_search": _TRGM_SEARCH_SQL,
        "bloom_new_rows": _bloom_new_rows_sql(),
        # --- round-11 registrations (promoted candidates) ---
        "dup_spans": _dup_spans_sql(length=8, min_count=2),
        "dup_spans_incremental": _dup_spans_incremental_sql(
            length=8, min_count=2
        ),
        # the index path must reproduce the from-scratch path
        # bit-exactly, so the two share ONE twin
        "bm25_index_retrieval": _bm25_retrieval_batch_sql(k=5),
        "bpe_merges": _bpe_merges_sql(k=3),
        # --- round-10 registrations (promoted candidates) ---
        "winnow_fingerprints": _winnow_sql(k=5, w=4),
        "winnow_matches": _winnow_matches_sql(k=5, w=4, min_shared=2),
        # --- round-9 registrations (promoted candidates) ---
        "ngram_lm_score": _NGRAM_LM_SQL,
        "scd2_history": _SCD2_SQL,
        "ivf_drift_report": _ivf_drift_sql(),
        "mmr_diversify": _mmr_sql(k=5, pool=40, lam=0.7),
        # --- round-8 registrations (promoted candidates) ---
        "quality_classifier": _quality_classifier_sql(),
        "decontaminate_semantic": _decontaminate_semantic_sql(),
        "mine_hard_negatives": _mine_hard_negatives_sql(),
        "corpus_ingest_stream_scored": _corpus_ingest_scored_sql(),
        "bm25_retrieval_batch": _bm25_retrieval_batch_sql(),
        # --- round-7 registrations (promoted candidates) ---
        "dsir_importance": _dsir_sql(),
        "dedup_near_batch": _dedup_near_sql(),
        "dedup_passages": _dedup_passages_sql(),
        "passage_dedup": r"""
            WITH t AS (
              SELECT doc_id, string_split_regex(lower(trim(text)), '[ \t\n\x0B\f\r]+') AS tk
              FROM documents
            ), p AS (
              SELECT doc_id,
                     array_to_string(tk[(1 + i*16):(i*16 + 16)], ' ') AS passage
              FROM t, UNNEST(range(CAST(ceil(greatest(len(tk), 1)/16.0) AS BIGINT))) AS u(i)
            ), d AS (
              SELECT passage, count(DISTINCT doc_id) AS ndocs FROM p GROUP BY 1
            )
            SELECT p.doc_id,
                   CAST(count(*) AS BIGINT) AS n_passages,
                   CAST(sum(CASE WHEN d.ndocs > 1 THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_shared_passages,
                   round(CAST(sum(CASE WHEN d.ndocs > 1 THEN 1 ELSE 0 END) AS DOUBLE)
                         / count(*), 6) AS shared_ratio
            FROM p JOIN d USING (passage) GROUP BY 1
        """,
        "pii_pseudonymize": """
            WITH g AS (
              SELECT c_custkey, md5(c_name) AS name_pseudo, r_name AS region,
                     c_mktsegment AS segment,
                     CAST(floor(c_acctbal/1000) AS BIGINT) * 1000 AS bal_bucket
              FROM customer
              JOIN nation ON c_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
            )
            SELECT c_custkey, name_pseudo, region, segment, bal_bucket,
                   CAST(count(*) OVER (PARTITION BY region, segment, bal_bucket)
                        AS BIGINT) AS group_n,
                   count(*) OVER (PARTITION BY region, segment, bal_bucket) >= 5
                     AS k_ok
            FROM g
        """,
        "tfidf_top_terms": r"""
            WITH tk AS (
              SELECT doc_id,
                     unnest(string_split_regex(lower(trim(text)), '[ \t\n\x0B\f\r]+')) AS term
              FROM documents
            ), tf AS (
              SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
              FROM tk GROUP BY 1, 2
            ), dfq AS (
              SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
              FROM tk GROUP BY 1
            ), n AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM documents)
            SELECT doc_id, term, tf, df, CAST(score AS BIGINT) AS score,
                   CAST(rnk AS INTEGER) AS rnk
            FROM (
              SELECT tf.doc_id, tf.term, tf.tf, dfq.df,
                     CAST(tf.tf AS HUGEINT)
                       * ((CAST(n.n_total AS HUGEINT) * 1000000) // dfq.df)
                       AS score,
                     row_number() OVER (
                       PARTITION BY tf.doc_id
                       ORDER BY CAST(tf.tf AS HUGEINT)
                                  * ((CAST(n.n_total AS HUGEINT) * 1000000)
                                     // dfq.df) DESC,
                                tf.term) AS rnk
              FROM tf JOIN dfq USING (term), n
            ) WHERE rnk <= 3
        """,
        "corpus_mix": """
            WITH w(lang, w) AS (VALUES ('en', 0.4), ('es', 0.2), ('de', 0.2),
                                       ('fr', 0.15), ('zh', 0.05)),
            c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n
                  FROM documents GROUP BY 1),
            cw AS (SELECT c.lang, c.n, w.w FROM c JOIN w USING (lang)),
            s AS (SELECT min(CAST(n AS DOUBLE) / w) AS s FROM cw),
            r AS (SELECT cw.lang,
                         CAST(floor((cw.w * s.s / CAST(cw.n AS DOUBLE))
                                    * 4294967296) AS BIGINT) AS thresh
                  FROM cw, s)
            SELECT d.doc_id, d.lang, d.source
            FROM documents d JOIN r ON d.lang = r.lang
            WHERE (d.doc_id * 2654435761) % 4294967296 < r.thresh
        """,
        "shuffle_shard": """
            WITH h AS (
              SELECT doc_id, lang,
                     (doc_id * 2654435761) % 4294967296 AS _h
              FROM documents
            )
            SELECT doc_id, lang, CAST(_h % 8 AS INTEGER) AS shard,
                   CAST(row_number() OVER (
                     PARTITION BY _h % 8 ORDER BY _h, doc_id
                   ) AS BIGINT) AS pos
            FROM h
        """,
        "scrub_terms": r"""
            SELECT doc_id,
                   regexp_replace(text, '\b(customer|vector|stream)\b',
                                  '[REDACTED]', 'g') AS text_scrubbed,
                   CAST(len(regexp_extract_all(
                     text, '\b(customer|vector|stream)\b')) AS BIGINT)
                     AS n_redactions
            FROM documents
        """,
        "mode_per_group": """
            WITH c AS (
              SELECT lang, source, CAST(count(*) AS BIGINT) AS n_mode
              FROM documents GROUP BY 1, 2
            )
            SELECT lang, source AS mode_value, n_mode FROM (
              SELECT *, row_number() OVER (
                PARTITION BY lang ORDER BY n_mode DESC, source) AS rk
              FROM c
            ) WHERE rk = 1
        """,
        "quantile_band": """
            WITH b AS (
              SELECT quantile_disc(n_chars, 0.05) AS lo,
                     quantile_disc(n_chars, 0.95) AS hi
              FROM documents
            )
            SELECT doc_id, lang, n_chars
            FROM documents, b
            WHERE n_chars BETWEEN b.lo AND b.hi
        """,
        "parse_ts_coerce": """
            WITH dirty AS (
              SELECT o_orderkey,
                     CASE WHEN o_orderkey % 7 = 0
                          THEN 'bad-' || CAST(o_orderdate AS VARCHAR)
                          ELSE strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') END AS raw_ts
              FROM orders
            ), parsed AS (
              SELECT try_cast(raw_ts AS TIMESTAMP) AS ts FROM dirty
              WHERE try_cast(raw_ts AS TIMESTAMP) IS NOT NULL
            )
            SELECT strftime(ts, '%Y-%m') AS bulan,
                   count(*) AS n_parsed,
                   strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS first_ts,
                   strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS last_ts
            FROM parsed GROUP BY 1
        """,
        "chart_bar_priority": """
            SELECT o_orderpriority,
                   round(CAST(sum(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE), 2)
                     AS total_pagu
            FROM orders GROUP BY 1
        """,
        "bucketed_join_revenue": """
            SELECT c_mktsegment, count(*) AS n_orders,
                   round(CAST(sum(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE), 2)
                     AS total_rev
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY 1
        """,
        **_tpch_partsupp_oracles(),
        "train_test_split": """
            WITH s AS (
              SELECT *, CASE WHEN (doc_id * 2654435761) % 4294967296 < 3435973836
                             THEN 'train' ELSE 'test' END AS split
              FROM documents
            )
            SELECT split, source, count(*) AS n_docs,
                   CAST(sum(doc_id) AS BIGINT) AS id_sum,
                   CAST(sum(n_chars) AS BIGINT) AS chars_sum
            FROM s GROUP BY 1, 2
        """,
        "sample_per_group": """
            SELECT source, doc_id, lang, n_chars FROM (
              SELECT *, row_number() OVER (
                PARTITION BY source
                ORDER BY (doc_id * 2654435761) % 4294967296, doc_id) AS rk
              FROM documents
            ) WHERE rk <= 5
        """,
        "mad_by_event_type": """
            SELECT event_type, round(CAST(mad(value) AS DOUBLE), 6) AS mad
            FROM events GROUP BY 1
        """,
        "tpch_q5_local_supplier": """
            SELECT n_name,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                            * CAST(1 - l_discount AS DECIMAL(8,2))) AS DOUBLE) AS revenue
            FROM customer
            JOIN orders   ON c_custkey = o_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
            JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
            JOIN nation   ON s_nationkey = n_nationkey
            JOIN region   ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA'
              AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
              AND o_orderdate <  TIMESTAMP '1996-01-01 00:00:00'
            GROUP BY 1 ORDER BY revenue DESC, n_name
        """,
        "kmeans_clusters": """
            WITH e AS (
              SELECT vec_id,
                     list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
              FROM embeddings
            ), c0 AS (
              SELECT CAST(vec_id AS INT) AS cid, v AS cv FROM e WHERE vec_id < 4
            ), a1 AS (
              SELECT vec_id, (min(struct_pack(d := d, cid := cid))).cid AS cluster
              FROM (
                SELECT e.vec_id, c.cid,
                       list_sum(list_transform(range(1, len(e.v) + 1),
                                i -> (e.v[i] - c.cv[i]) * (e.v[i] - c.cv[i]))) AS d
                FROM e, c0 c
              ) GROUP BY 1
            ), m1 AS (
              SELECT cluster, dim, avg(val) AS m FROM (
                SELECT a1.cluster, unnest(e.v) AS val,
                       unnest(range(1, len(e.v) + 1)) AS dim
                FROM a1 JOIN e USING (vec_id)
              ) GROUP BY 1, 2
            ), c1 AS (
              SELECT CAST(cluster AS INT) AS cid, list(m ORDER BY dim) AS cv
              FROM m1 GROUP BY 1
            ), a2 AS (
              SELECT vec_id, (min(struct_pack(d := d, cid := cid))).cid AS cluster
              FROM (
                SELECT e.vec_id, c.cid,
                       list_sum(list_transform(range(1, len(e.v) + 1),
                                i -> (e.v[i] - c.cv[i]) * (e.v[i] - c.cv[i]))) AS d
                FROM e, c1 c
              ) GROUP BY 1
            )
            SELECT vec_id, cluster FROM a2
        """,
        "funnel_conversion": """
            WITH s0 AS (
              SELECT user_id,
                     min(CASE WHEN event_type = 'view' THEN ts END) AS t0
              FROM events GROUP BY 1
            ), s1 AS (
              SELECT e.user_id,
                     min(CASE WHEN e.event_type = 'click' AND s0.t0 IS NOT NULL
                              AND e.ts > s0.t0 THEN e.ts END) AS t1
              FROM events e JOIN s0 ON e.user_id = s0.user_id GROUP BY 1
            ), s2 AS (
              SELECT e.user_id,
                     min(CASE WHEN e.event_type = 'purchase' AND s1.t1 IS NOT NULL
                              AND e.ts > s1.t1 THEN e.ts END) AS t2
              FROM events e JOIN s1 ON e.user_id = s1.user_id GROUP BY 1
            ), c AS (
              SELECT count(t0) AS n0, count(t1) AS n1, count(t2) AS n2
              FROM s0 JOIN s1 USING (user_id) JOIN s2 USING (user_id)
            )
            SELECT CAST(step_no AS INT) AS step_no, step,
                   CAST(n_users AS BIGINT) AS n_users, conversion
            FROM (
              SELECT 1 AS step_no, 'view' AS step, n0 AS n_users,
                     round(n0 * 1.0 / greatest(n0, 1), 6) AS conversion FROM c
              UNION ALL
              SELECT 2, 'click', n1, round(n1 * 1.0 / greatest(n0, 1), 6) FROM c
              UNION ALL
              SELECT 3, 'purchase', n2, round(n2 * 1.0 / greatest(n0, 1), 6) FROM c
            )
        """,
        "skew_profile": """
            WITH c AS (
              SELECT CAST(user_id AS VARCHAR) AS key, count(*) AS cnt
              FROM events GROUP BY 1
            ), t AS (
              SELECT CAST(sum(cnt) AS BIGINT) AS total, count(*) AS nkeys FROM c
            )
            SELECT key, CAST(cnt AS BIGINT) AS cnt,
                   round(cnt * 1.0 / total, 6) AS share,
                   round(cnt * nkeys * 1.0 / total, 6) AS skew_factor
            FROM c, t ORDER BY cnt DESC, key LIMIT 10
        """,
        "resample_ffill": """
            WITH b AS (
              SELECT user_id, date_trunc('day', min(ts)) AS t0,
                     date_trunc('day', max(ts)) AS t1
              FROM events GROUP BY 1
            ), grid AS (
              SELECT user_id,
                     unnest(generate_series(t0, t1, INTERVAL 1 DAY)) AS slot
              FROM b
            ), obs AS (
              SELECT user_id, date_trunc('day', ts) AS slot,
                     round(avg(value), 6) AS v
              FROM events GROUP BY 1, 2
            )
            SELECT g.user_id, strftime(g.slot, '%Y-%m-%d') AS slot,
                   last_value(o.v IGNORE NULLS) OVER (
                     PARTITION BY g.user_id ORDER BY g.slot
                     ROWS UNBOUNDED PRECEDING) AS value_ffill,
                   o.v IS NOT NULL AS observed
            FROM grid g LEFT JOIN obs o
              ON g.user_id = o.user_id AND g.slot = o.slot
        """,
        "pack_sequences": """
            WITH base AS (
              SELECT doc_id,
                     CAST(len(string_split_regex(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+')) AS BIGINT)
                       AS n_tokens,
                     CAST((doc_id * 2654435761) % 4294967296 % 8 AS INT) AS shard
              FROM documents
            ), cum AS (
              SELECT doc_id, shard, n_tokens,
                     sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                                         ROWS UNBOUNDED PRECEDING) AS c
              FROM base
            )
            SELECT doc_id, shard, n_tokens,
                   CAST((c - n_tokens) // 512 AS BIGINT) AS bin_id,
                   CAST((c - n_tokens) % 512 AS BIGINT) AS offset
            FROM cum
        """,
        "repetition_stats": """
            WITH w AS (
              SELECT doc_id,
                     unnest(string_split_regex(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+')) AS w
              FROM documents
            ), pw AS (
              SELECT doc_id, w, count(*) AS c FROM w GROUP BY 1, 2
            ), ws_ AS (
              SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words,
                     CAST(count(*) AS BIGINT) AS n_distinct_words,
                     max(c) AS top_w
              FROM pw GROUP BY 1
            ), wl AS (
              SELECT doc_id,
                     string_split_regex(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+') AS ws
              FROM documents
            ), g AS (
              SELECT doc_id,
                     unnest(list_transform(range(1, len(ws)),
                            i -> ws[i] || ' ' || ws[i+1])) AS g
              FROM wl WHERE len(ws) >= 2
            ), pg AS (
              SELECT doc_id, g, count(*) AS c FROM g GROUP BY 1, 2
            ), gs AS (
              SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_g,
                     CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS dup_g,
                     max(c) AS top_g
              FROM pg GROUP BY 1
            )
            SELECT doc_id, n_words, n_distinct_words,
                   round((n_words - n_distinct_words) * 1.0 / n_words, 6) AS dup_word_frac,
                   round(top_w * 1.0 / n_words, 6) AS top_word_frac,
                   round(COALESCE(dup_g * 1.0 / n_g, 0), 6) AS dup_2gram_frac,
                   round(COALESCE(top_g * 1.0 / n_g, 0), 6) AS top_2gram_frac
            FROM ws_ LEFT JOIN gs USING (doc_id)
        """,
        "ngram_contamination": """
            WITH wl AS (
              SELECT doc_id,
                     string_split_regex(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+') AS ws
              FROM documents
            ), g AS (
              SELECT doc_id,
                     unnest(list_transform(range(1, len(ws) - 3),
                            i -> array_to_string(ws[i:i+4], ' '))) AS g
              FROM wl WHERE len(ws) >= 5
            ), test_g AS (
              SELECT DISTINCT doc_id, g FROM g WHERE doc_id % 10 = 0
            ), train_g AS (
              SELECT DISTINCT g FROM g WHERE doc_id % 10 <> 0
            ), tot AS (
              SELECT doc_id, CAST(count(*) AS BIGINT) AS n_ngrams FROM test_g GROUP BY 1
            ), hit AS (
              SELECT t.doc_id, count(*) AS n_overlap
              FROM test_g t JOIN train_g USING (g) GROUP BY 1
            )
            SELECT doc_id, n_ngrams,
                   CAST(COALESCE(n_overlap, 0) AS BIGINT) AS n_overlap,
                   round(COALESCE(n_overlap, 0) * 1.0 / n_ngrams, 6) AS contamination,
                   COALESCE(n_overlap, 0) >= 1 AS contaminated
            FROM tot LEFT JOIN hit USING (doc_id)
        """,
        # Relational model of the APPEND-mode streaming aggregation:
        # the complete-mode shape restricted to windows the final
        # watermark (max ingest time − 30 min) closed. No window end
        # ever ties the watermark on these fixtures, so the ≤ cutoff
        # is unambiguous cross-engine.
        "trending_terms_append": """
            WITH lines AS (
              SELECT regexp_replace(text, '[\\r\\n]+', ' ', 'g') AS text
              FROM documents WHERE length(trim(text)) > 0
            ), w AS (
              SELECT text,
                     (length(text) * 2654435761) % 3600 AS off
              FROM lines
            ), mx AS (
              SELECT max(off) AS mxoff FROM w
            ), tok AS (
              SELECT off,
                     unnest(string_split_regex(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+')) AS term
              FROM w
            ), c AS (
              SELECT (off // 600) * 600 AS wstart,
                     term, CAST(count(*) AS BIGINT) AS n
              FROM tok WHERE term <> '' GROUP BY 1, 2
            )
            SELECT strftime(make_timestamp(
                     (1704067200 + wstart) * 1000000),
                     '%Y-%m-%d %H:%M') AS window_start,
                   term, n
            FROM c, mx
            WHERE n >= 5 AND wstart + 600 <= mxoff - 1800
        """,
        # Relational model of the complete-mode streaming aggregation:
        # same newline-collapse + empty-line filter as the shard
        # writer, ingest time from line length, epoch-aligned windows.
        "trending_terms_stream": """
            WITH lines AS (
              SELECT regexp_replace(text, '[\\r\\n]+', ' ', 'g') AS text
              FROM documents WHERE length(trim(text)) > 0
            ), w AS (
              SELECT text,
                     (length(text) * 2654435761) % 3600 AS off
              FROM lines
            ), tok AS (
              SELECT off,
                     unnest(string_split_regex(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+')) AS term
              FROM w
            ), c AS (
              SELECT strftime(make_timestamp(
                       (1704067200 + (off // 600) * 600) * 1000000),
                       '%Y-%m-%d %H:%M') AS window_start,
                     term, CAST(count(*) AS BIGINT) AS n
              FROM tok WHERE term <> '' GROUP BY 1, 2
            )
            SELECT window_start, term, n FROM c WHERE n >= 5
        """,
        "corpus_report": """
            WITH u AS (
              SELECT * FROM documents
              UNION ALL
              SELECT doc_id + 1000000, text, lang, source, n_chars
              FROM documents WHERE doc_id % 11 = 0
            ), base AS (
              SELECT source, lang, text,
                     CAST(len(string_split_regex(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+'))
                          AS BIGINT) AS nt,
                     CAST(length(text) AS BIGINT) AS nc
              FROM u
            )
            SELECT source,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(count(DISTINCT text) AS BIGINT) AS n_distinct_texts,
                   round((count(*) - count(DISTINCT text)) * 1.0
                         / count(*), 6) AS dup_rate,
                   CAST(sum(nt) AS BIGINT) AS n_tokens_total,
                   round(CAST(sum(nt) AS BIGINT)
                         / CAST(count(*) AS DOUBLE), 6) AS mean_tokens,
                   round(quantile_cont(nt, 0.5), 6) AS median_tokens,
                   CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
                   CAST(sum(nc) AS BIGINT) AS n_chars_total
            FROM base GROUP BY source
        """,
        "prototypicality": f"""
            WITH {_kmeans_cte_sql('SELECT vec_id, embedding FROM embeddings', with_d=True)},
            r AS (
              SELECT vec_id, cluster, dist2,
                     -- rank on ROUNDED dist2 (ADVICE r5): matches the
                     -- Spark window so near-tie distances cannot swap
                     -- ranks cross-engine
                     row_number() OVER (PARTITION BY cluster
                                        ORDER BY round(dist2, 6) DESC,
                                                 vec_id) AS rank_far,
                     count(*) OVER (PARTITION BY cluster) AS n
              FROM a2
            )
            SELECT vec_id, cluster, round(dist2, 6) AS dist2,
                   CAST(rank_far AS INT) AS rank_far,
                   rank_far <= CAST(ceil(n * 0.1) AS BIGINT) AS is_hard
            FROM r
        """,
        "semdedup_greedy": _semdedup_greedy_sql(),
        "semdedup_prune": f"""
            WITH src AS (
              SELECT vec_id, embedding FROM embeddings
              UNION ALL
              SELECT vec_id + 1000000,
                     list_transform(embedding,
                       x -> CAST(CAST(x AS DOUBLE) * 1.01 AS FLOAT))
              FROM embeddings WHERE vec_id % 25 = 0
            ), {_kmeans_cte_sql('SELECT * FROM src')},
            n AS (
              SELECT a2.vec_id, a2.cluster, e.v,
                     sqrt(list_sum(list_transform(e.v, x -> x * x))) AS nrm
              FROM a2 JOIN e USING (vec_id)
            ), p AS (
              SELECT DISTINCT b.vec_id
              FROM n a JOIN n b
                ON a.cluster = b.cluster AND a.vec_id < b.vec_id
              WHERE list_sum(list_transform(range(1, len(a.v) + 1),
                             i -> a.v[i] * b.v[i]))
                    / ((CASE WHEN a.nrm = 0 THEN 1.0 ELSE a.nrm END)
                       * (CASE WHEN b.nrm = 0 THEN 1.0 ELSE b.nrm END)) >= 0.9
            )
            SELECT a2.vec_id, a2.cluster,
                   (a2.vec_id IN (SELECT vec_id FROM p)) AS pruned
            FROM a2
        """,
        "boilerplate_ngrams": """
            WITH wl AS (
              SELECT doc_id,
                     string_split_regex(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+') AS ws
              FROM documents
            ), gg AS (
              SELECT doc_id,
                     unnest(list_transform(range(1, len(ws) - 1),
                            i -> array_to_string(ws[i:i+2], ' '))) AS g
              FROM wl WHERE len(ws) >= 3
            ), dg AS (
              SELECT DISTINCT doc_id, g FROM gg
            ), boiler AS (
              SELECT g FROM (
                SELECT g, count(*) AS dfd FROM dg GROUP BY 1
              ) WHERE dfd >= 2
            ), tot AS (
              SELECT doc_id, CAST(count(*) AS BIGINT) AS n_ngrams
              FROM dg GROUP BY 1
            ), hit AS (
              SELECT doc_id, CAST(count(*) AS BIGINT) AS n_boiler
              FROM dg WHERE g IN (SELECT g FROM boiler) GROUP BY 1
            )
            SELECT t.doc_id, t.n_ngrams,
                   CAST(coalesce(h.n_boiler, 0) AS BIGINT) AS n_boiler,
                   round(CAST(coalesce(h.n_boiler, 0) AS DOUBLE)
                         / t.n_ngrams, 6) AS boilerplate_frac,
                   coalesce(h.n_boiler, 0) * 2 >= t.n_ngrams
                     AS mostly_boilerplate
            FROM tot t LEFT JOIN hit h USING (doc_id)
        """,
        "length_outliers": """
            WITH base AS (
              SELECT doc_id,
                     CAST(len(string_split_regex(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+'))
                          AS BIGINT) AS n_tokens
              FROM documents
            ), b AS (
              SELECT quantile_cont(n_tokens, 0.10) AS lo,
                     quantile_cont(n_tokens, 0.90) AS hi
              FROM base
            )
            SELECT doc_id, n_tokens,
                   round(lo, 6) AS p_lo, round(hi, 6) AS p_hi,
                   (n_tokens >= lo AND n_tokens <= hi) AS in_band
            FROM base, b
        """,
        "snapshot_diff": """
            WITH old AS (
              SELECT doc_id, text FROM documents WHERE doc_id % 13 <> 5
            ), new AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 9 = 2 THEN text || ' rev2'
                          ELSE text END AS text
              FROM documents WHERE doc_id % 17 <> 3
            )
            SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
                   CASE WHEN o.doc_id IS NULL THEN 'added'
                        WHEN n.doc_id IS NULL THEN 'removed'
                        WHEN o.text = n.text THEN 'unchanged'
                        ELSE 'changed' END AS status
            FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id
        """,
        "cross_source_overlap": """
            WITH u AS (
              SELECT text, source FROM documents
              UNION ALL
              SELECT text, 'mirror' AS source FROM documents
              WHERE doc_id % 7 = 0
            ), d AS (
              SELECT DISTINCT text, source FROM u
            )
            SELECT a.source AS source_a, b.source AS source_b,
                   CAST(count(*) AS BIGINT) AS n_shared
            FROM d a JOIN d b
              ON a.text = b.text AND a.source < b.source
            GROUP BY 1, 2
        """,
        "embedding_qa": """
            WITH p AS (
              SELECT label,
                     CASE WHEN vec_id % 89 = 11 THEN NULL
                          WHEN vec_id % 101 = 7 THEN
                            list_transform(embedding,
                                           x -> CAST(0.0 AS FLOAT))
                          WHEN vec_id % 97 = 13 THEN embedding[1:32]
                          ELSE embedding END AS embedding
              FROM embeddings
            ), n AS (
              SELECT label,
                     CASE WHEN embedding IS NULL THEN NULL
                          ELSE round(sqrt(list_reduce(
                            list_prepend(CAST(0 AS DOUBLE),
                              list_transform(embedding,
                                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
                            (a, b) -> a + b)), 6) END AS nrm,
                     CASE WHEN embedding IS NULL THEN NULL
                          ELSE len(embedding) END AS l
              FROM p
            )
            SELECT label,
                   CAST(count(*) AS BIGINT) AS n_vecs,
                   CAST(sum(CASE WHEN l IS NULL THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_null,
                   CAST(sum(CASE WHEN l IS NOT NULL AND l <> 64
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_dim_bad,
                   CAST(sum(CASE WHEN nrm = 0.0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_zero,
                   min(nrm) AS min_norm,
                   max(nrm) AS max_norm,
                   CAST(CAST(sum(CAST(nrm AS DECIMAL(18,6))) AS DOUBLE)
                        / count(nrm) AS DOUBLE)
                     AS mean_norm
            FROM n GROUP BY label
        """,
        "token_rarity": """
            WITH occ AS (
              SELECT doc_id,
                     unnest(string_split_regex(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+')) AS term
              FROM documents
            ), occ2 AS (
              SELECT * FROM occ WHERE term <> ''
            ), tf AS (
              SELECT term, CAST(count(*) AS BIGINT) AS tf FROM occ2 GROUP BY 1
            ), tot AS (
              SELECT CAST(sum(tf) AS BIGINT) AS n_total FROM tf
            ), r AS (
              SELECT o.doc_id,
                     CAST(count(*) AS BIGINT) AS n_tokens,
                     CAST(sum((CAST(n_total AS HUGEINT) * 1000000) // tf)
                          AS BIGINT) AS rarity_sum
              FROM occ2 o JOIN tf USING (term), tot GROUP BY o.doc_id
            )
            SELECT doc_id, n_tokens, rarity_sum,
                   CAST(rarity_sum AS DOUBLE) / CAST(n_tokens AS DOUBLE)
                     AS mean_rarity
            FROM r
        """,
        "decontaminate_train": """
            WITH wl AS (
              SELECT doc_id,
                     string_split_regex(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+') AS ws
              FROM documents
            ), g AS (
              SELECT doc_id,
                     unnest(list_transform(range(1, len(ws) - 3),
                            i -> array_to_string(ws[i:i+4], ' '))) AS g
              FROM wl WHERE len(ws) >= 5
            ), test_g AS (
              SELECT DISTINCT g FROM g WHERE doc_id % 10 = 0
            ), bad AS (
              SELECT DISTINCT doc_id FROM g
              WHERE doc_id % 10 <> 0 AND g IN (SELECT g FROM test_g)
            )
            SELECT doc_id, lang, source FROM documents
            WHERE doc_id % 10 <> 0
              AND doc_id NOT IN (SELECT doc_id FROM bad)
        """,
        "normalize_text": """
            WITH dirty AS (
              SELECT doc_id,
                     upper(text) || ' [Rev-' || CAST(doc_id AS VARCHAR) || '.0]' AS text
              FROM documents
            ), n AS (
              SELECT doc_id,
                     trim(regexp_replace(regexp_replace(lower(text),
                          '[^a-z0-9 \\t\\n\\x0B\\f\\r]', ' ', 'g'), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')) AS text_norm
              FROM dirty
            )
            SELECT doc_id, text_norm,
                   CAST(length(text_norm) AS BIGINT) AS n_chars_norm
            FROM n
        """,
        "latest_by_key": """
            SELECT user_id, event_id, event_type, value,
                   strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts
            FROM (
              SELECT *, row_number() OVER (
                PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
              FROM events
            ) WHERE rn = 1
        """,
        "profile_columns": """
            WITH o AS (
              SELECT o_orderkey, o_orderstatus,
                     CAST(o_totalprice AS DECIMAL(18,2)) AS o_totalprice,
                     o_orderdate
              FROM orders
            )
            SELECT 'o_orderkey' AS column_name, count(o_orderkey) AS n,
                   count(CASE WHEN o_orderkey IS NULL THEN 1 END) AS n_nulls,
                   count(DISTINCT o_orderkey) AS n_distinct,
                   CAST(min(o_orderkey) AS VARCHAR) AS min_value,
                   CAST(max(o_orderkey) AS VARCHAR) AS max_value
            FROM o
            UNION ALL
            SELECT 'o_orderstatus', count(o_orderstatus),
                   count(CASE WHEN o_orderstatus IS NULL THEN 1 END),
                   count(DISTINCT o_orderstatus),
                   CAST(min(o_orderstatus) AS VARCHAR),
                   CAST(max(o_orderstatus) AS VARCHAR)
            FROM o
            UNION ALL
            SELECT 'o_totalprice', count(o_totalprice),
                   count(CASE WHEN o_totalprice IS NULL THEN 1 END),
                   count(DISTINCT o_totalprice),
                   CAST(min(o_totalprice) AS VARCHAR),
                   CAST(max(o_totalprice) AS VARCHAR)
            FROM o
            UNION ALL
            SELECT 'o_orderdate', count(o_orderdate),
                   count(CASE WHEN o_orderdate IS NULL THEN 1 END),
                   count(DISTINCT o_orderdate),
                   CAST(min(o_orderdate) AS VARCHAR),
                   CAST(max(o_orderdate) AS VARCHAR)
            FROM o
        """,
        "chunk_text": """
            WITH d AS (
              SELECT doc_id, text, length(text) AS n
              FROM documents WHERE doc_id < 100
            ), s AS (
              SELECT doc_id, text, n,
                     unnest(range(0, greatest(n - 1, 0) + 1, 150)) AS start
              FROM d
            )
            SELECT doc_id, CAST(start // 150 AS INT) AS chunk_idx,
                   CAST(start AS INT) AS start,
                   CAST(least(start + 200, n) AS INT) AS chunk_end,
                   substr(text, CAST(start + 1 AS INT), 200) AS chunk
            FROM s
            WHERE start = 0 OR start + 50 < n
        """,
        "flagship_monthly_trend": """
            SELECT strftime(o_orderdate, '%Y-%m') AS bulan,
                   count(o_orderkey) AS jumlah_paket,
                   CAST(sum(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS total_pagu
            FROM orders
            WHERE (lower(o_orderpriority) LIKE '%urgent%' OR lower(o_orderpriority) LIKE '%high%')
              AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
            GROUP BY 1 ORDER BY 1
        """,
        "keyword_cnf_filter": """
            SELECT doc_id, text, lang, source, n_chars FROM documents
            WHERE (lower(text) LIKE '%spark%' OR lower(text) LIKE '%hash%')
              AND lower(text) LIKE '%join%'
              AND NOT (lower(text) LIKE '%window%')
        """,
        "date_attribute_filter": """
            SELECT event_id, user_id, value FROM events
            WHERE event_type = 'purchase'
              AND ts BETWEEN TIMESTAMP '2024-01-10 00:00:00' AND TIMESTAMP '2024-01-20 00:00:00'
        """,
        "groupby_count": "SELECT o_orderstatus, count(*) AS n FROM orders GROUP BY 1",
        "monthly_rollup": _MONTHLY_ROLLUP_SQL,
        "value_counts": "SELECT event_type, count(*) AS cnt FROM events GROUP BY 1 ORDER BY 1",
        "scalar_insights": """
            SELECT count(*) AS n, min(l_extendedprice) AS min_v, max(l_extendedprice) AS max_v,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) / count(*) AS mean_v,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) AS sum_v
            FROM lineitem
        """,
        "arg_extreme": f"""
            WITH m AS ({_MONTHLY_ROLLUP_SQL})
            SELECT arg_max(bulan, total_pagu) AS peak_month,
                   arg_min(bulan, total_pagu) AS trough_month,
                   max(total_pagu) AS peak_value,
                   min(total_pagu) AS trough_value
            FROM m
        """,
        "histogram_numeric": """
            WITH b AS (SELECT min(l_extendedprice) AS lo, max(l_extendedprice) AS hi FROM lineitem)
            SELECT CAST(least(floor((l_extendedprice - lo) / ((hi - lo) / 12)), 11) AS INT) AS bucket,
                   count(*) AS cnt
            FROM lineitem, b
            WHERE l_extendedprice IS NOT NULL
            GROUP BY 1 ORDER BY 1
        """,
        "histogram_month_of_year": """
            WITH months AS (SELECT unnest(range(1, 13)) AS month_no),
            c AS (SELECT CAST(month(o_orderdate) AS INT) AS month_no, count(*) AS cnt
                  FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1)
            SELECT CAST(months.month_no AS INT) AS month_no, coalesce(c.cnt, 0) AS cnt
            FROM months LEFT JOIN c ON months.month_no = c.month_no
            ORDER BY 1
        """,
        "distinct_count": """
            SELECT event_type, count(DISTINCT user_id) AS n_distinct
            FROM events GROUP BY 1 ORDER BY 1
        """,
        "top_k": """
            SELECT p_partkey, p_name, p_retailprice FROM part
            ORDER BY p_retailprice DESC, p_partkey LIMIT 10
        """,
        "limit_preview": "SELECT * FROM orders ORDER BY o_orderkey LIMIT 5",
        "join_broadcast_dim": """
            SELECT r_name, count(*) AS n_nations
            FROM nation JOIN region ON n_regionkey = r_regionkey
            GROUP BY 1 ORDER BY 1
        """,
        "star_join_revenue": """
            SELECT r_name, n_name,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                            * CAST(1 - l_discount AS DECIMAL(8,2))) AS DOUBLE) AS revenue,
                   count(*) AS n_items
            FROM lineitem
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation   ON c_nationkey = n_nationkey
            JOIN region   ON n_regionkey = r_regionkey
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "semi_join": """
            SELECT c_custkey, c_name FROM customer
            WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        """,
        "anti_join": """
            SELECT c_custkey, c_name FROM customer
            WHERE NOT EXISTS (SELECT 1 FROM orders
                              WHERE o_custkey = c_custkey
                                AND o_orderpriority = '1-URGENT')
        """,
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                            * CAST(1 - l_discount AS DECIMAL(8,2))) AS DOUBLE) AS sum_disc_price,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                            * CAST(1 - l_discount AS DECIMAL(8,2))
                            * CAST(1 + l_tax AS DECIMAL(8,2))) AS DOUBLE) AS sum_charge,
                   CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
                   CAST(sum(CAST(l_discount AS DECIMAL(8,2))) AS DOUBLE) / count(*) AS avg_disc,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "window_topk_per_group": """
            SELECT o_custkey, o_orderkey, o_totalprice, rnk FROM (
              SELECT o_custkey, o_orderkey, o_totalprice,
                     CAST(row_number() OVER (PARTITION BY o_custkey
                          ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rnk
              FROM orders
            ) WHERE rnk <= 3
        """,
        "window_mom_delta": """
            WITH monthly AS (
              SELECT strftime(o_orderdate, '%Y-%m') AS month,
                     sum(CAST(o_totalprice AS DECIMAL(28,2))) AS revenue
              FROM orders GROUP BY 1
            )
            SELECT month, CAST(revenue AS DOUBLE) AS revenue,
                   CAST(revenue - lag(revenue) OVER (ORDER BY month) AS DOUBLE) AS mom_delta
            FROM monthly ORDER BY month
        """,
        "rollup_grouping_sets": """
            SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
                   CAST(sum(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS total
            FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
            ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
        """,
        "set_ops": """
            SELECT DISTINCT c_custkey FROM (
              SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
              UNION
              (SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
               INTERSECT
               SELECT c_custkey FROM customer WHERE c_acctbal > 0)
            ) ORDER BY c_custkey
        """,
        "dedup_exact": """
            SELECT doc_id, lang, source, n_chars FROM documents
            WHERE doc_id IN (SELECT min(doc_id) FROM documents
                             WHERE text IS NOT NULL GROUP BY text)
               OR text IS NULL
        """,
        "duplicate_groups": """
            SELECT text, count(*) AS n_dups, min(doc_id) AS rep_id
            FROM documents GROUP BY text HAVING count(*) > 1
        """,
        "ngram_jaccard_pairs": _JACCARD_SQL,
        "corpus_curation": """
            WITH t AS (
              SELECT doc_id, text,
                     string_split_regex(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+') AS toks,
                     length(text) AS n_chars
              FROM documents
            ), q AS (
              SELECT doc_id,
                     least(CAST(len(toks) AS DOUBLE) / 100.0, 1.0) * 0.4
                       + least((CAST(len(list_filter(toks, x -> x IN
                           ('the','a','an','and','or','of','to','in','is','it'))) AS DOUBLE)
                           / greatest(len(toks), 1)) * 5.0, 1.0) * 0.3
                       + (CAST(length(regexp_replace(text, '[^A-Za-z ]', '', 'g')) AS DOUBLE)
                           / greatest(n_chars, 1)) * 0.3 AS quality_score
              FROM t
            ), lang AS (
              SELECT doc_id,
                     len(list_filter(toks, x -> x IN ('the','and','of'))) AS score_en,
                     len(list_filter(toks, x -> x IN ('der','die','und'))) AS score_de,
                     greatest(
                       len(list_filter(toks, x -> x IN ('the','and','of'))),
                       len(list_filter(toks, x -> x IN ('der','die','und'))),
                       len(list_filter(toks, x -> x IN ('le','la','et'))),
                       len(list_filter(toks, x -> x IN ('el','los','que'))),
                       len(list_filter(toks, x -> x IN ('的','是','了')))) AS best
              FROM t
            ), eng AS (
              -- 'en' wins only when it ties best and 'de' does not
              -- (de > en precedence, mirroring the Spark CASE order)
              SELECT doc_id FROM lang
              WHERE best > 0 AND score_en = best AND score_de < best
            ), keep AS (
              SELECT doc_id FROM documents
              WHERE doc_id IN (SELECT min(doc_id) FROM documents GROUP BY text)
            )
            SELECT source, count(*) AS n_docs,
                   CAST(sum(n_chars) AS BIGINT) AS total_chars
            FROM documents
            WHERE doc_id IN (SELECT doc_id FROM keep)
              AND doc_id IN (SELECT doc_id FROM q WHERE quality_score >= 0.55)
              AND doc_id IN (SELECT doc_id FROM eng)
            GROUP BY source ORDER BY source
        """,
        # BM25 with the integer idf proxy ((N*1e6) DIV df) and a FIXED
        # IEEE expression order — no libm, so the doubles agree
        # bit-for-bit with Spark before the round.
        "bm25_retrieval": """
            WITH d AS (
              SELECT doc_id, string_split_regex(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+') AS toks
              FROM documents
            ), base AS (
              SELECT doc_id,
                     CAST(len(toks) AS DOUBLE) AS dl,
                     CAST(len(list_filter(toks, x -> x = 'spark')) AS DOUBLE) AS tf0,
                     CAST(len(list_filter(toks, x -> x = 'window')) AS DOUBLE) AS tf1,
                     CAST(len(list_filter(toks, x -> x = 'join')) AS DOUBLE) AS tf2
              FROM d
            ), stats AS (
              SELECT CAST(count(*) AS BIGINT) AS n_docs,
                     CAST(sum(CAST(dl AS BIGINT)) AS DOUBLE) AS sum_dl,
                     CAST(sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df0,
                     CAST(sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df1,
                     CAST(sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df2
              FROM base
            ), scored AS (
              SELECT doc_id,
                (CASE WHEN tf0 > 0
                      THEN (CAST((n_docs * 1000000) // greatest(df0, 1) AS DOUBLE)
                            * (tf0 * 2.5))
                           / (tf0 + 1.5 * (0.25 + (0.75 * dl)
                              / (sum_dl / CAST(n_docs AS DOUBLE))))
                      ELSE 0.0 END
                 + CASE WHEN tf1 > 0
                      THEN (CAST((n_docs * 1000000) // greatest(df1, 1) AS DOUBLE)
                            * (tf1 * 2.5))
                           / (tf1 + 1.5 * (0.25 + (0.75 * dl)
                              / (sum_dl / CAST(n_docs AS DOUBLE))))
                      ELSE 0.0 END)
                 + CASE WHEN tf2 > 0
                      THEN (CAST((n_docs * 1000000) // greatest(df2, 1) AS DOUBLE)
                            * (tf2 * 2.5))
                           / (tf2 + 1.5 * (0.25 + (0.75 * dl)
                              / (sum_dl / CAST(n_docs AS DOUBLE))))
                      ELSE 0.0 END AS bm25
              FROM base, stats
            )
            SELECT doc_id, round(bm25, 4) AS bm25 FROM scored
            WHERE bm25 > 0 ORDER BY round(bm25, 4) DESC, doc_id LIMIT 20
        """,
        "corpus_mix_tokens": """
            WITH d AS (
              SELECT doc_id, lang,
                     CAST(len(string_split_regex(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+')) AS BIGINT)
                       AS n_tokens
              FROM documents
            ), b AS (
              SELECT doc_id, lang, n_tokens,
                     CASE lang WHEN 'en' THEN 5000 WHEN 'de' THEN 2000
                               WHEN 'fr' THEN 100000 END AS budget,
                     sum(n_tokens) OVER (PARTITION BY lang
                         ORDER BY (doc_id * 2654435761) % 4294967296, doc_id)
                       - n_tokens AS consumed_before
              FROM d WHERE lang IN ('en', 'de', 'fr')
            )
            SELECT doc_id, lang, n_tokens FROM b WHERE consumed_before < budget
        """,
        # dedup_clusters' connected components + the quality formula,
        # collapsed to each cluster's best-quality member.
        "cluster_representatives": """
            WITH RECURSIVE d AS (
              SELECT doc_id, string_split_regex(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+') AS toks
              FROM documents WHERE doc_id < 200
            ), sh AS (
              SELECT doc_id, unnest(list_distinct(
                       list_transform(range(1, greatest(len(toks) - 3, 0) + 2),
                                      i -> array_to_string(toks[i:i+2], ' ')))) AS shingle
              FROM d
            ), sz AS (
              SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id
            ), inter AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
              FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            ), pairs AS (
              SELECT id_a, id_b FROM inter
              JOIN sz sa ON sa.doc_id = id_a
              JOIN sz sb ON sb.doc_id = id_b
              WHERE CAST(n_inter AS DOUBLE)
                    / CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE) >= 0.12
            ), edges AS (
              SELECT id_a AS src, id_b AS dst FROM pairs
              UNION SELECT id_b, id_a FROM pairs
            ), reach(a, b) AS (
              SELECT src, dst FROM edges
              UNION
              SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src
            ), clust AS (
              SELECT dd.doc_id,
                     least(dd.doc_id, coalesce(min(r.b), dd.doc_id)) AS cluster_rep
              FROM (SELECT doc_id FROM documents WHERE doc_id < 200) dd
              LEFT JOIN reach r ON r.a = dd.doc_id
              GROUP BY dd.doc_id
            ), qt AS (
              SELECT doc_id, text,
                     string_split_regex(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+') AS toks,
                     length(text) AS n_chars
              FROM documents WHERE doc_id < 200
            ), qm AS (
              SELECT doc_id,
                     CAST(len(toks) AS BIGINT) AS n_tokens,
                     n_chars,
                     CAST(len(list_filter(toks, t -> t IN
                        ('the','a','an','and','or','of','to','in','is','it'))) AS DOUBLE)
                       / greatest(len(toks), 1) AS stop_ratio,
                     CAST(length(regexp_replace(text, '[^A-Za-z ]', '', 'g')) AS DOUBLE)
                       / greatest(n_chars, 1) AS alpha_ratio
              FROM qt
            ), q AS (
              SELECT doc_id,
                     least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.4
                           + least(stop_ratio * 5.0, 1.0) * 0.3
                           + alpha_ratio * 0.3 AS quality_score
              FROM qm
            ), j AS (
              SELECT c.doc_id, c.cluster_rep, q.quality_score,
                     row_number() OVER (PARTITION BY c.cluster_rep
                         ORDER BY q.quality_score DESC, c.doc_id) AS rk,
                     count(*) OVER (PARTITION BY c.cluster_rep) AS n_members
              FROM clust c JOIN q USING (doc_id)
            )
            SELECT cluster_rep AS cluster_id, doc_id AS rep_doc_id,
                   quality_score AS best_score, CAST(n_members AS BIGINT) AS n_members
            FROM j WHERE rk = 1 ORDER BY cluster_id
        """,
        "dedup_clusters": """
            WITH RECURSIVE d AS (
              SELECT doc_id, string_split_regex(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+') AS toks
              FROM documents WHERE doc_id < 200
            ), sh AS (
              SELECT doc_id, unnest(list_distinct(
                       list_transform(range(1, greatest(len(toks) - 3, 0) + 2),
                                      i -> array_to_string(toks[i:i+2], ' ')))) AS shingle
              FROM d
            ), sz AS (
              SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id
            ), inter AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
              FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            ), pairs AS (
              SELECT id_a, id_b FROM inter
              JOIN sz sa ON sa.doc_id = id_a
              JOIN sz sb ON sb.doc_id = id_b
              WHERE CAST(n_inter AS DOUBLE)
                    / CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE) >= 0.12
            ), edges AS (
              SELECT id_a AS src, id_b AS dst FROM pairs
              UNION SELECT id_b, id_a FROM pairs
            ), reach(a, b) AS (
              SELECT src, dst FROM edges
              UNION
              SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src
            )
            SELECT dd.doc_id, least(dd.doc_id, coalesce(min(r.b), dd.doc_id)) AS cluster_rep
            FROM (SELECT doc_id FROM documents WHERE doc_id < 200) dd
            LEFT JOIN reach r ON r.a = dd.doc_id
            GROUP BY dd.doc_id ORDER BY dd.doc_id
        """,
        "embedding_cosine_pairs": _cosine_pairs_lsh_sql(),
        "embedding_cosine_allpairs": _COSINE_PAIRS_SQL,
        "minhash_dedup_pairs": _minhash_dedup_sql(),
        "sim_topk_lsh_precomputed": _lsh_topk_sql(),
        "sim_topk_ivf_precomputed": _ivf_topk_sql(),
        "sim_topk_brute": _SIM_TOPK_SQL,
        # Composition of the three sim_topk oracles: recall@10 of each
        # ANN path against the exact top-10 (same codebook literals).
        "ann_recall_lsh_ivf": f"""
            WITH brute AS (SELECT vec_id FROM ({_SIM_TOPK_SQL}) b),
                 lshk AS (SELECT vec_id FROM ({_lsh_topk_sql()}) l),
                 ivfk AS (SELECT vec_id FROM ({_ivf_topk_sql()}) i)
            SELECT 'ivf' AS method, CAST(10 AS BIGINT) AS k,
                   round(CAST((SELECT count(*) FROM ivfk JOIN brute USING (vec_id))
                         AS DOUBLE) / 10.0, 4) AS recall
            UNION ALL
            SELECT 'lsh', CAST(10 AS BIGINT),
                   round(CAST((SELECT count(*) FROM lshk JOIN brute USING (vec_id))
                         AS DOUBLE) / 10.0, 4)
            ORDER BY method
        """,
        "sim_topk_lsh": _lsh_topk_sql(),
        "keyword_retrieval": _keyword_retrieval_sql(),
        "sim_topk_ivf": _ivf_topk_sql(),
        "text_token_count": f"""
            SELECT doc_id,
                   CAST(len({_DUCK_TOKS}) AS BIGINT) AS n_tokens,
                   CAST(ceil(length(text) / 4.0) AS BIGINT) AS n_bpe_est
            FROM documents
        """,
        "text_quality": _QUALITY_SQL,
        "text_language_id": _LANGID_SQL,
        "simhash_pairs": _simhash_pairs_sql(),
        "minhash_lsh_pairs": _minhash_lsh_sql(),
        "text_fingerprint": _fingerprint_sql(),
        "text_vocabulary": f"""
            SELECT token, count(*) AS df FROM (
              SELECT doc_id, unnest(list_distinct({_DUCK_TOKS})) AS token
              FROM documents
            ) WHERE token <> ''
            GROUP BY token ORDER BY df DESC, token LIMIT 50
        """,
        "text_filtered_keywords": """
            SELECT doc_id,
                   array_to_string(list_sort(list_distinct(list_filter(
                     string_split_regex(lower(regexp_replace(text,
                         '[^\\p{L}\\p{N} ]', ' ', 'g')), '\\s+'),
                     t -> t <> '' AND t NOT IN
                          ('the','a','an','and','or','of','to','in','is','it')
                   ))), ',') AS filtered_keywords
            FROM documents
        """,
        "tumbling_window": """
            SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS window_start,
                   event_type, count(*) AS n,
                   round(CAST(sum(CAST(value AS DECIMAL(28,2))) AS DOUBLE), 2) AS total_value
            FROM events GROUP BY 1, 2
        """,
        "sliding_window": """
            WITH starts AS (
              SELECT event_type, time_bucket(INTERVAL 30 MINUTE, ts) AS s FROM events
              UNION ALL
              SELECT event_type,
                     time_bucket(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE FROM events
            )
            SELECT strftime(s, '%Y-%m-%d %H:%M') AS window_start, event_type,
                   count(*) AS n
            FROM starts GROUP BY 1, 2
        """,
        "sessionize": _SESSIONIZE_SQL,
        "session_window_native": """
            WITH g AS (
              SELECT user_id, ts,
                     lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
              FROM events
            ), f AS (
              -- session_window is end-exclusive: [start, last + gap),
              -- so an event at exactly prev + gap opens a NEW session
              SELECT user_id, ts,
                     CASE WHEN prev_ts IS NULL OR ts >= prev_ts + INTERVAL 30 MINUTE
                          THEN 1 ELSE 0 END AS new_session
              FROM g
            ), sid AS (
              SELECT user_id, ts,
                     sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                            ROWS UNBOUNDED PRECEDING) AS session_id
              FROM f
            )
            SELECT user_id,
                   strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
                   strftime(max(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS session_end,
                   count(*) AS n_events
            FROM sid GROUP BY user_id, session_id
        """,
        "chart_pie_shares": """
            WITH t AS (
              SELECT event_type,
                     CAST(sum(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS total
              FROM events GROUP BY 1
            )
            SELECT event_type, total,
                   round(total / sum(total) OVER (), 6) AS share
            FROM t ORDER BY event_type
        """,
        "tpch_q3_shipping_priority": """
            SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                            * CAST(1 - l_discount AS DECIMAL(8,2))) AS DOUBLE) AS revenue
            FROM lineitem
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
              AND l_shipdate  > TIMESTAMP '1997-01-01 00:00:00'
            GROUP BY 1, 2
            ORDER BY revenue DESC, l_orderkey LIMIT 10
        """,
        "tpch_q6_forecast_revenue": """
            SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                            * CAST(l_discount AS DECIMAL(8,2))) AS DOUBLE) AS revenue,
                   count(*) AS n_items
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
              AND l_discount BETWEEN 0.05 AND 0.07
              AND l_quantity < 24
        """,
        "tpch_q18_large_orders": """
            WITH big AS (
              SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS sumq
              FROM lineitem GROUP BY 1
              HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 300
            )
            SELECT c_name, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
                   o_totalprice, CAST(sumq AS DOUBLE) AS total_qty
            FROM big
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
        """,
        "pivot_counts": """
            SELECT o_orderstatus,
                   count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS p_urgent,
                   count(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS p_high,
                   count(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS p_medium,
                   count(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS p_notspec,
                   count(*) FILTER (WHERE o_orderpriority = '5-LOW') AS p_low
            FROM orders GROUP BY 1 ORDER BY 1
        """,
        "cube_agg": """
            SELECT l_returnflag, l_linestatus, count(*) AS n,
                   CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
            FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
            ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
        """,
        "percentiles": """
            SELECT round(quantile_cont(value, 0.25), 4) AS p25,
                   round(quantile_cont(value, 0.50), 4) AS p50,
                   round(quantile_cont(value, 0.75), 4) AS p75
            FROM events
        """,
        "asof_join": """
            WITH p AS (SELECT event_id AS p_id, user_id, ts AS p_ts
                       FROM events WHERE event_type = 'purchase'),
                 c AS (SELECT event_id AS c_id, user_id, ts AS c_ts, value AS c_value
                       FROM events WHERE event_type = 'click')
            SELECT p.p_id, p.user_id,
                   strftime(p.p_ts, '%Y-%m-%d %H:%M:%S') AS p_ts,
                   c.c_id, c.c_value
            FROM p ASOF LEFT JOIN c
              ON p.user_id = c.user_id AND p.p_ts >= c.c_ts
        """,
        "range_join": """
            WITH p AS (SELECT event_id AS p_id, user_id, ts AS p_ts
                       FROM events WHERE event_type = 'purchase'),
                 c AS (SELECT event_id AS c_id, user_id, ts AS c_ts
                       FROM events WHERE event_type = 'click')
            SELECT p.p_id, c.c_id
            FROM p JOIN c ON p.user_id = c.user_id
             AND c.c_ts <= p.p_ts AND c.c_ts >= p.p_ts - INTERVAL 600 SECOND
        """,
        "embedding_normalize": """
            WITH e AS (SELECT vec_id, embedding,
                              sqrt(list_sum(list_transform(embedding,
                                   x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
                       FROM embeddings WHERE vec_id < 100)
            SELECT vec_id,
                   unnest(range(len(embedding))) AS dim,
                   round(unnest(list_transform(embedding,
                         x -> CAST(x AS DOUBLE)
                              / (CASE WHEN nrm = 0 THEN 1.0 ELSE nrm END))), 6) AS v
            FROM e
        """,
        "tpch_q4_late_orders": """
            SELECT o_orderpriority, count(*) AS order_count
            FROM orders
            WHERE EXISTS (
              SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 90 DAY
            )
            GROUP BY 1 ORDER BY 1
        """,
        "tpch_q12_priority_mix": """
            SELECT l_returnflag,
                   CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                            THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
                   CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                            THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            GROUP BY 1 ORDER BY 1
        """,
        "tpch_q14_promo_share": """
            SELECT 100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
                         THEN CAST(l_extendedprice AS DECIMAL(18,2))
                              * CAST(1 - l_discount AS DECIMAL(8,2)) END) AS DOUBLE)
                   / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                              * CAST(1 - l_discount AS DECIMAL(8,2))) AS DOUBLE)
                   AS promo_revenue_pct
            FROM lineitem JOIN part ON l_partkey = p_partkey
        """,
        "tpch_q17_small_qty": """
            WITH avg_q AS (
              SELECT l_partkey AS a_partkey,
                     CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty
              FROM lineitem GROUP BY 1
            )
            SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
                   AS avg_yearly
            FROM lineitem
            JOIN part ON l_partkey = p_partkey AND p_brand = 'Brand#3'
            JOIN avg_q ON l_partkey = a_partkey
            WHERE l_quantity < 0.2 * avg_qty
        """,
        "tpch_q19_brand_ranges": """
            SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                            * CAST(1 - l_discount AS DECIMAL(8,2))) AS DOUBLE) AS revenue,
                   count(*) AS n_lines
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
               OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
               OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 40 AND l_quantity BETWEEN 20 AND 30)
        """,
        "tpch_q22_idle_rich": """
            WITH avg_pos AS (
              SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS v
              FROM customer WHERE c_acctbal > 0.0
            )
            SELECT c_nationkey, count(*) AS numcust,
                   CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
            FROM customer, avg_pos
            WHERE c_acctbal > v
              AND NOT EXISTS (SELECT 1 FROM orders
                              WHERE o_custkey = c_custkey
                                AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
            GROUP BY 1 ORDER BY 1
        """,
        "window_cumulative": """
            WITH m AS (
              SELECT o_orderstatus, strftime(o_orderdate, '%Y-%m') AS bulan,
                     sum(CAST(o_totalprice AS DECIMAL(18,2))) AS m_total
              FROM orders GROUP BY 1, 2
            )
            SELECT o_orderstatus, bulan,
                   CAST(sum(m_total) OVER (PARTITION BY o_orderstatus ORDER BY bulan
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                   AS cum_total
            FROM m ORDER BY o_orderstatus, bulan
        """,
        "window_ntile": """
            SELECT c_custkey, c_mktsegment, c_acctbal,
                   ntile(4) OVER w AS tile,
                   round(percent_rank() OVER w, 6) AS pct_rank
            FROM customer
            WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
            ORDER BY c_mktsegment, c_acctbal DESC, c_custkey
        """,
        "correlated_subquery": """
            SELECT c_custkey, c_nationkey, c_acctbal
            FROM customer c1
            WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer c2
                               WHERE c2.c_nationkey = c1.c_nationkey)
            ORDER BY c_custkey
        """,
        "tpch_q7_nation_volume": """
            SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
                   CAST(year(l_shipdate) AS INT) AS l_year,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                            * CAST(1 - l_discount AS DECIMAL(8,2))) AS DOUBLE) AS revenue
            FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation sn ON s_nationkey = sn.n_nationkey
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation cn ON c_nationkey = cn.n_nationkey
            WHERE sn.n_name IN ('NATION_1','NATION_2')
              AND cn.n_name IN ('NATION_1','NATION_2')
              AND sn.n_name <> cn.n_name
            GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
        """,
        "tpch_q10_returned_items": """
            SELECT c_custkey, c_name, c_acctbal, n_name,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                            * CAST(1 - l_discount AS DECIMAL(8,2))) AS DOUBLE) AS revenue
            FROM lineitem
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation   ON c_nationkey = n_nationkey
            WHERE l_returnflag = 'R'
              AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
            GROUP BY 1, 2, 3, 4
            ORDER BY revenue DESC, c_custkey LIMIT 20
        """,
        "tpch_q13_order_distribution": """
            WITH per_cust AS (
              SELECT c_custkey, count(o_orderkey) AS c_count
              FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
              GROUP BY 1
            )
            SELECT c_count, count(*) AS custdist
            FROM per_cust GROUP BY 1
            ORDER BY custdist DESC, c_count DESC
        """,
        "window_moving_avg": """
            -- exact integer-cents half-up average (round-9 determinism
            -- audit): floor((2C + n) / 2n) / 100, no double rounding
            WITH m AS (
              SELECT o_orderstatus, strftime(o_orderdate, '%Y-%m') AS bulan,
                     sum(CAST(o_totalprice AS DECIMAL(28,2))) AS m_total
              FROM orders GROUP BY 1, 2
            ), w AS (
              SELECT o_orderstatus, bulan,
                     CAST(sum(m_total) OVER win * 100 AS BIGINT) AS c,
                     count(*) OVER win AS n
              FROM m WINDOW win AS (
                PARTITION BY o_orderstatus ORDER BY bulan
                ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
            )
            SELECT o_orderstatus, bulan,
                   CAST((2 * c + n) // (2 * n) AS DOUBLE) / 100.0 AS mavg
            FROM w ORDER BY o_orderstatus, bulan
        """,
        "tpch_q8_market_share": """
            SELECT CAST(year(l_shipdate) AS INT) AS l_year,
                   CAST(sum(CASE WHEN n_name = 'NATION_5'
                            THEN CAST(l_extendedprice AS DECIMAL(18,2))
                                 * CAST(1 - l_discount AS DECIMAL(8,2)) END) AS DOUBLE)
                   / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                              * CAST(1 - l_discount AS DECIMAL(8,2))) AS DOUBLE)
                   AS mkt_share
            FROM lineitem
            JOIN part     ON l_partkey = p_partkey AND p_type = 'PROMO'
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation   ON s_nationkey = n_nationkey
            JOIN orders   ON l_orderkey = o_orderkey
            GROUP BY 1 ORDER BY 1
        """,
        "tpch_q15_top_supplier": """
            WITH revenue0 AS (
              SELECT l_suppkey AS supplier_no,
                     sum(CAST(l_extendedprice AS DECIMAL(18,2))
                         * CAST(1 - l_discount AS DECIMAL(8,2))) AS rev
              FROM lineitem
              WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
                AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
              GROUP BY 1
            )
            SELECT s_suppkey, s_name, CAST(rev AS DOUBLE) AS total_revenue
            FROM revenue0 JOIN supplier ON supplier_no = s_suppkey
            WHERE rev = (SELECT max(rev) FROM revenue0)
            ORDER BY s_suppkey
        """,
        "corpus_pipeline": _corpus_pipeline_sql(),
        "corpus_ingest_stream": f"""
            WITH corpus AS (
              SELECT DISTINCT regexp_replace(text, '[\\r\\n]+', ' ', 'g') AS text
              FROM documents WHERE length(trim(text)) > 0
            ), t AS (
              SELECT text, string_split_regex(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+') AS toks,
                     length(text) AS nc
              FROM corpus
            ), q AS (
              SELECT text, nc AS n_chars,
                     least(CAST(len(toks) AS DOUBLE) / 100.0, 1.0) * 0.4
                       + least((CAST(len(list_filter(toks, x -> x IN
                           ('the','a','an','and','or','of','to','in','is','it'))) AS DOUBLE)
                           / greatest(len(toks), 1)) * 5.0, 1.0) * 0.3
                       + (CAST(length(regexp_replace(text, '[^A-Za-z ]', '', 'g')) AS DOUBLE)
                           / greatest(nc, 1)) * 0.3 AS quality_score
              FROM t
            )
            SELECT text, n_chars, quality_score FROM q
            WHERE quality_score >= {_PIPE_QUALITY_MIN}
        """,
        # Content-derived ingest timestamps give byte-identical
        # duplicates identical event times, so the within-watermark
        # dedup's output is exactly DISTINCT-by-content: same
        # relational model as the unbounded twin.
        "corpus_ingest_stream_ttl": f"""
            WITH corpus AS (
              SELECT DISTINCT regexp_replace(text, '[\\r\\n]+', ' ', 'g') AS text
              FROM documents WHERE length(trim(text)) > 0
            ), t AS (
              SELECT text, string_split_regex(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+') AS toks,
                     length(text) AS nc
              FROM corpus
            ), q AS (
              SELECT text, nc AS n_chars,
                     least(CAST(len(toks) AS DOUBLE) / 100.0, 1.0) * 0.4
                       + least((CAST(len(list_filter(toks, x -> x IN
                           ('the','a','an','and','or','of','to','in','is','it'))) AS DOUBLE)
                           / greatest(len(toks), 1)) * 5.0, 1.0) * 0.3
                       + (CAST(length(regexp_replace(text, '[^A-Za-z ]', '', 'g')) AS DOUBLE)
                           / greatest(nc, 1)) * 0.3 AS quality_score
              FROM t
            )
            SELECT text, n_chars, quality_score FROM q
            WHERE quality_score >= {_PIPE_QUALITY_MIN}
        """,
        "hybrid_retrieval_rrf": f"""
            WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
            kw AS (
              SELECT doc_id,
                     len(list_filter(list_distinct({_DUCK_TOKS}),
                         t -> t IN ('spark', 'window', 'join'))) AS kw_matches
              FROM documents
            ), kw_top AS (
              SELECT doc_id, kw_matches FROM kw WHERE kw_matches > 0
              ORDER BY kw_matches DESC, doc_id LIMIT 50
            ), kw_ranked AS (
              SELECT doc_id, kw_matches,
                     row_number() OVER (ORDER BY kw_matches DESC, doc_id) AS kw_rank
              FROM kw_top
            ), s AS (
              SELECT e.vec_id AS doc_id,
                     list_sum(list_transform(list_zip(e.embedding, q.qv),
                              x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
                     / ((CASE WHEN sqrt(list_sum(list_transform(e.embedding,
                          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) = 0 THEN 1.0
                          ELSE sqrt(list_sum(list_transform(e.embedding,
                          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) END)
                        * (CASE WHEN sqrt(list_sum(list_transform(q.qv,
                          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) = 0 THEN 1.0
                          ELSE sqrt(list_sum(list_transform(q.qv,
                          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) END))
                     AS similarity
              FROM embeddings e, q
            ), vec_top AS (
              SELECT doc_id, similarity FROM s
              ORDER BY similarity DESC, doc_id LIMIT 50
            ), vec_ranked AS (
              SELECT doc_id,
                     row_number() OVER (ORDER BY similarity DESC, doc_id) AS vec_rank
              FROM vec_top
            ), fused AS (
              SELECT coalesce(k.doc_id, v.doc_id) AS doc_id,
                     CAST(coalesce(k.kw_matches, 0) AS BIGINT) AS kw_matches,
                     CAST(k.kw_rank AS BIGINT) AS kw_rank,
                     CAST(v.vec_rank AS BIGINT) AS vec_rank,
                     round(coalesce(CAST(1 AS DOUBLE) / (60 + k.kw_rank), 0.0)
                         + coalesce(CAST(1 AS DOUBLE) / (60 + v.vec_rank), 0.0), 6)
                       AS rrf_score
              FROM kw_ranked k FULL OUTER JOIN vec_ranked v ON k.doc_id = v.doc_id
            )
            SELECT doc_id, kw_matches, kw_rank, vec_rank, rrf_score
            FROM fused ORDER BY rrf_score DESC, doc_id LIMIT 10
        """,
        "incremental_dedup": """
            SELECT doc_id, text, lang, source, n_chars FROM documents
            WHERE doc_id % 10 = 0
              AND ((text NOT IN (SELECT text FROM documents
                                 WHERE doc_id % 10 <> 0 AND text IS NOT NULL)
                    AND doc_id IN (SELECT min(doc_id) FROM documents
                                   WHERE doc_id % 10 = 0 AND text IS NOT NULL
                                   GROUP BY text))
                   OR text IS NULL)
        """,
        "detect_pii": r"""
            WITH tickets AS (
              SELECT c_custkey AS doc_id,
                     'Contact ' || c_name || ' at user' || CAST(c_custkey AS VARCHAR)
                     || '@example.com or +1-555-'
                     || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')
                     || CASE WHEN c_custkey % 3 = 0
                             THEN ' host 10.0.' || CAST(c_custkey % 256 AS VARCHAR)
                                  || '.' || CAST(c_custkey % 200 AS VARCHAR)
                             ELSE '' END AS text
              FROM customer
            )
            SELECT doc_id,
                   CAST(len(regexp_extract_all(text,
                     '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
                   CAST(len(regexp_extract_all(text,
                     '\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}')) AS BIGINT) AS n_phone,
                   CAST(len(regexp_extract_all(text,
                     '\b(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])(\.(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])){3}\b')) AS BIGINT) AS n_ipv4,
                   CAST(len(regexp_extract_all(text,
                     '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
                    + len(regexp_extract_all(text, '\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}'))
                    + len(regexp_extract_all(text,
                     '\b(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])(\.(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])){3}\b')) AS BIGINT)
                     AS n_pii_total,
                   (len(regexp_extract_all(text,
                     '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
                    + len(regexp_extract_all(text, '\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}'))
                    + len(regexp_extract_all(text,
                     '\b(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])(\.(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])){3}\b'))) > 0 AS has_pii
            FROM tickets
        """,
        "stratified_sample": """
            WITH c AS (
              SELECT lang, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY 1
            ), q AS (
              SELECT lang, CAST(ceil(n * 0.2) AS BIGINT) AS q FROM c
            ), r AS (
              SELECT d.doc_id, d.lang, d.source,
                     row_number() OVER (
                       PARTITION BY d.lang
                       ORDER BY (d.doc_id * 2654435761) % 4294967296, d.doc_id
                     ) AS rk
              FROM documents d
            )
            SELECT r.doc_id, r.lang, r.source FROM r JOIN q USING (lang)
            WHERE rk <= q.q
        """,
        "activity_heatmap": """
            SELECT CAST(isodow(ts) - 1 AS INTEGER) AS dow,
                   CAST(hour(ts) AS INTEGER) AS hod,
                   CAST(count(*) AS BIGINT) AS n_events,
                   CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
            FROM events GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "hourly_distinct_users": """
            SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS hour,
                   count(DISTINCT user_id) AS n_users, count(*) AS n_events
            FROM events GROUP BY 1 ORDER BY 1
        """,
        "cohort_retention": """
            WITH user_weeks AS (
              SELECT DISTINCT user_id,
                     CAST(date_trunc('week', ts) AS DATE) AS week
              FROM events
            ), cohorts AS (
              SELECT user_id, min(week) AS cohort_week
              FROM user_weeks GROUP BY 1
            ), joined AS (
              SELECT u.user_id, c.cohort_week,
                     CAST(date_diff('day', c.cohort_week, u.week) // 7
                          AS BIGINT) AS offset_weeks
              FROM user_weeks u JOIN cohorts c USING (user_id)
            ), sizes AS (
              SELECT cohort_week,
                     CAST(count(DISTINCT user_id) AS BIGINT) AS cohort_n
              FROM cohorts GROUP BY 1
            ), cells AS (
              SELECT cohort_week, offset_weeks,
                     CAST(count(DISTINCT user_id) AS BIGINT) AS n_active
              FROM joined GROUP BY 1, 2
            )
            SELECT strftime(c.cohort_week, '%Y-%m-%d') AS cohort_week,
                   offset_weeks, n_active, cohort_n,
                   CAST((2 * n_active * 1000000 + cohort_n)
                        // (2 * cohort_n) AS DOUBLE) / 1000000.0 AS retention
            FROM cells c JOIN sizes s USING (cohort_week)
            ORDER BY 1, 2
        """,
        "window_range_frame": """
            SELECT o_custkey, o_orderkey,
                   strftime(o_orderdate, '%Y-%m-%d') AS o_date,
                   CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
                     PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
                     RANGE BETWEEN 259200 PRECEDING AND CURRENT ROW) AS DOUBLE)
                   AS trailing_volume
            FROM orders ORDER BY o_custkey, o_orderkey
        """,
        "json_props_rollup": """
            SELECT CAST(json_extract(props, '$.k') AS INT) % 10 AS k_mod,
                   count(*) AS n,
                   CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
            FROM events GROUP BY 1 ORDER BY 1
        """,
        "supplier_revenue": """
            SELECT n_name,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                            * CAST(1 - l_discount AS DECIMAL(8,2))) AS DOUBLE) AS revenue,
                   count(*) AS n_lines
            FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation   ON s_nationkey = n_nationkey
            GROUP BY 1 ORDER BY 1
        """,
        "full_outer_monthly": """
            WITH om AS (SELECT strftime(o_orderdate, '%Y-%m') AS o_month, count(*) AS n_orders
                        FROM orders GROUP BY 1),
                 em AS (SELECT strftime(ts, '%Y-%m') AS e_month, count(*) AS n_events
                        FROM events GROUP BY 1)
            SELECT coalesce(o_month, e_month) AS month,
                   coalesce(n_orders, 0) AS n_orders,
                   coalesce(n_events, 0) AS n_events
            FROM om FULL OUTER JOIN em ON o_month = e_month
            ORDER BY month
        """,
        "except_all_multiplicity": """
            WITH diff AS (
              SELECT o_custkey AS custkey FROM orders
              EXCEPT ALL
              SELECT c_custkey FROM customer
            )
            SELECT custkey, count(*) AS multiplicity
            FROM diff GROUP BY 1 ORDER BY 1
        """,
        "salted_join": """
            WITH dim AS (SELECT user_id, count(*) AS user_n FROM events GROUP BY 1)
            SELECT e.user_id, d.user_n, count(*) AS n_joined
            FROM events e JOIN dim d ON e.user_id = d.user_id
            GROUP BY 1, 2 ORDER BY 1
        """,
        "intermediary_pipeline": """
            WITH intermediary AS (
              SELECT * FROM documents
              WHERE lower(text) LIKE '%spark%' OR lower(text) LIKE '%hash%'
            )
            SELECT source, count(*) AS n,
                   CAST(sum(n_chars) AS BIGINT) AS total_chars
            FROM intermediary GROUP BY source ORDER BY source
        """,
        "chart_histogram_categorical": """
            SELECT source, count(*) AS cnt FROM documents
            GROUP BY source ORDER BY source
        """,
        "chart_line_monthly": """
            SELECT strftime(o_orderdate, '%Y-%m') AS bulan,
                   count(o_orderkey) AS jumlah_paket,
                   round(sum(o_totalprice), 2) AS total_pagu
            FROM orders GROUP BY 1 ORDER BY 1
        """,
        "multimodal_resize_plan": """
            WITH m AS (
              SELECT doc_id AS media_id,
                     ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1] AS media_type,
                     CAST(n_chars % 640 + 64 AS INT) AS width,
                     CAST(doc_id % 480 + 48 AS INT) AS height
              FROM documents
            )
            SELECT media_id, media_type,
                   CAST(round(width  * least(256.0 / greatest(width, height), 1.0)) AS INT) AS target_width,
                   CAST(round(height * least(256.0 / greatest(width, height), 1.0)) AS INT) AS target_height
            FROM m ORDER BY media_id
        """,
        "multimodal_frame_sample": """
            WITH m AS (
              SELECT doc_id AS media_id, CAST(doc_id % 3 AS INT) AS mt,
                     CAST(n_chars * 37 % 30000 AS INT) AS duration_ms
              FROM documents
            )
            SELECT media_id,
                   unnest(range(0, greatest(duration_ms - 1, 0) + 1, 1000)) AS frame_ts_ms
            FROM m WHERE mt = 2 AND duration_ms > 0
        """,
        "null_safe_join": """
            WITH a AS (
              SELECT nullif(user_id % 50, 0) AS k, count(*) AS n_purch
              FROM events WHERE event_type = 'purchase' GROUP BY 1
            ), b AS (
              SELECT nullif(user_id % 50, 0) AS k2, count(*) AS n_click
              FROM events WHERE event_type = 'click' GROUP BY 1
            )
            SELECT k, n_purch, n_click
            FROM a JOIN b ON k IS NOT DISTINCT FROM k2
            ORDER BY k NULLS FIRST
        """,
        "unpivot_metrics": """
            WITH wide AS (
              SELECT l_returnflag, l_linestatus,
                     CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
                     CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
                     CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                              * CAST(1 - l_discount AS DECIMAL(8,2))) AS DOUBLE) AS sum_disc_price,
                     CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                              * CAST(1 - l_discount AS DECIMAL(8,2))
                              * CAST(1 + l_tax AS DECIMAL(8,2))) AS DOUBLE) AS sum_charge
              FROM lineitem
              WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
              GROUP BY 1, 2
            )
            SELECT l_returnflag, l_linestatus, metric, metric_value
            FROM wide
            UNPIVOT (metric_value FOR metric IN (sum_qty, sum_base_price, sum_disc_price, sum_charge))
            ORDER BY l_returnflag, l_linestatus, metric
        """,
        "lateral_topk": """
            SELECT r.r_name, t.n_name, t.n_customers
            FROM region r,
            LATERAL (
              SELECT n.n_name, count(*) AS n_customers
              FROM nation n JOIN customer c ON c.c_nationkey = n.n_nationkey
              WHERE n.n_regionkey = r.r_regionkey
              GROUP BY n.n_name
              ORDER BY n_customers DESC, n.n_name LIMIT 2
            ) t
            ORDER BY r.r_name, t.n_customers DESC, t.n_name
        """,
        "multimodal_audio_chunks": """
            WITH m AS (
              SELECT doc_id AS media_id, CAST(doc_id % 3 AS INT) AS mt,
                     CAST(n_chars * 37 % 30000 AS INT) AS duration_ms
              FROM documents
            ), s AS (
              SELECT media_id, duration_ms,
                     unnest(range(0, greatest(duration_ms - 1, 0) + 1, 5000)) AS start_ms
              FROM m WHERE mt = 1 AND duration_ms > 0
            )
            SELECT media_id, CAST(start_ms // 5000 AS INT) AS chunk_idx, start_ms,
                   least(start_ms + 5000, duration_ms) AS end_ms
            FROM s
        """,
        "text_top_terms": f"""
            WITH counts AS (
              SELECT doc_id, token, count(*) AS tf FROM (
                SELECT doc_id, unnest({_DUCK_TOKS}) AS token
                FROM documents WHERE doc_id < 100
              ) WHERE token <> '' GROUP BY 1, 2
            )
            SELECT doc_id, token, tf, CAST(rnk AS INT) AS rnk FROM (
              SELECT *, row_number() OVER (PARTITION BY doc_id
                         ORDER BY tf DESC, token) AS rnk
              FROM counts
            ) WHERE rnk <= 3
        """,
        "grouping_sets": """
            SELECT o_orderstatus, o_orderpriority, count(*) AS n
            FROM orders
            GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
            ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
        """,
        "multimodal_image_features": """
            WITH m AS (
              SELECT doc_id AS media_id, CAST(doc_id % 3 AS INT) AS mt,
                     list_sum(list_transform(range(length(text)), i -> ord(text[i+1]))) AS s,
                     CAST(n_chars % 640 + 64 AS INT) AS width,
                     CAST(doc_id % 480 + 48 AS INT) AS height
              FROM documents
            ), d AS (SELECT media_id, mt, s, width, height,
                            unnest(range(8)) AS dim FROM m)
            SELECT media_id, CAST(dim AS INT) AS dim,
                   round(CASE WHEN dim < 6 THEN ((s + dim * 37) % 251) / 251.0
                              WHEN dim = 6 THEN CAST(width AS DOUBLE)
                              ELSE CAST(height AS DOUBLE) END, 6) AS v
            FROM d WHERE mt = 0
        """,
    }

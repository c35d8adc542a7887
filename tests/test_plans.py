"""Plan-shape assertions: the properties that decide 100 TB behavior,
checked in the optimized physical plan so regressions are loud.
(`.explain` equivalents — see README 'Designed-for-100-TB notes'.)"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pengadaan_agent_spark.operators import relational as R
from tests.conftest import SF_DIR


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q6_filters_reach_parquet_scan(spark, tables):
    plan = _plan(R.forecast_revenue(tables["lineitem"]))
    # predicate pushdown: the scan advertises pushed filters, and the
    # projection prunes to exactly the needed columns
    assert "PushedFilters: [" in plan
    assert "l_comment" not in plan  # no such col at all, sanity
    read = plan.split("ReadSchema:")[1].splitlines()[0]
    for col in ("l_shipdate", "l_discount", "l_quantity", "l_extendedprice"):
        assert col in read
    assert "l_orderkey" not in read  # unused column pruned from the scan


def test_topk_is_take_ordered_not_full_sort(spark, tables):
    df = tables["part"].orderBy(F.desc("p_retailprice")).limit(10)
    assert "TakeOrderedAndProject" in _plan(df)


def test_dim_join_is_broadcast(spark, tables):
    df = tables["nation"].join(
        F.broadcast(tables["region"]),
        tables["nation"]["n_regionkey"] == tables["region"]["r_regionkey"],
    )
    assert "BroadcastHashJoin" in _plan(df)


def test_asof_join_single_shuffle(spark, tables):
    """The as-of join must cost ONE exchange (hash on the by-key for
    the window), not a per-key pandas shuffle plus re-sorts."""
    from data_pengadaan_agent_spark.operators.asof import asof_join_backward

    ev = tables["events"]
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"), "user_id", F.col("ts").alias("p_ts")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_id"), "user_id", F.col("ts").alias("c_ts"),
    )
    out = asof_join_backward(
        purchases, clicks, left_on="p_ts", right_on="c_ts", by="user_id",
        right_cols=["c_id"],
    )
    plan = _plan(out)
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Window" in plan


def test_semi_join_carries_no_payload(spark, tables):
    plan = _plan(R.customers_with_orders(tables["customer"], tables["orders"]))
    # the orders side of the semi join reads only its join key
    read_schemas = [
        seg.splitlines()[0] for seg in plan.split("ReadSchema:")[1:]
    ]
    orders_reads = [s for s in read_schemas if "o_custkey" in s]
    assert orders_reads and all("o_totalprice" not in s for s in orders_reads)


def test_pricing_summary_partial_aggregation(spark, tables):
    """Q1 must plan partial (map-side) + final aggregation — one
    shuffle of 6-key partials, never raw rows."""
    plan = _plan(R.pricing_summary(tables["lineitem"]))
    assert plan.count("HashAggregate") >= 2
    assert "Exchange hashpartitioning(l_returnflag" in plan


def test_precomputed_lsh_probe_prunes_partitions(spark, tables, tmp_path):
    """The ingest-time ANN path: the probe against the signature table
    must be a PARTITION-PRUNED scan (the signature predicate lands in
    PartitionFilters, so only one bucket directory is read) — never a
    full-corpus scan with a post-filter."""
    from data_pengadaan_agent_spark.operators import similarity as S

    emb = tables["embeddings"]
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    path = str(tmp_path / "lsh_sig_table")
    S.build_lsh_signature_table(emb, "embedding", 64, path, n_planes=6, seed=42)
    probe = S.lsh_topk_precomputed(spark, path, "embedding", qvec, k=5, n_planes=6, seed=42)
    plan = _plan(probe)
    part_filters = [
        seg.splitlines()[0] for seg in plan.split("PartitionFilters:")[1:]
    ]
    assert part_filters and any("_sig" in s for s in part_filters)
    # the signature predicate must NOT degrade to a data filter
    assert all("_sig" not in seg.splitlines()[0] for seg in plan.split("PushedFilters:")[1:])
    # and the probe result is the same top row as the inline LSH path
    inline = S.lsh_topk(emb, "embedding", qvec, k=5, n_planes=6, seed=42)
    assert [r["vec_id"] for r in probe.collect()] == [r["vec_id"] for r in inline.collect()]


def test_precomputed_ivf_probe_prunes_partitions(spark, tables, tmp_path):
    """IVF twin: inverted lists are partitions; an n_probe=2 probe
    reads exactly the two matching centroid directories."""
    from data_pengadaan_agent_spark.operators import similarity as S

    emb = tables["embeddings"]
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    path = str(tmp_path / "ivf_table")
    S.build_ivf_table(emb, "embedding", 64, path, n_centroids=8, seed=7)
    probe = S.ivf_topk_precomputed(
        spark, path, "embedding", qvec, k=5, n_centroids=8, n_probe=2, seed=7
    )
    plan = _plan(probe)
    part_filters = [
        seg.splitlines()[0] for seg in plan.split("PartitionFilters:")[1:]
    ]
    assert part_filters and any("centroid_id" in s for s in part_filters)


def test_q5_dims_broadcast_orders_pruned(spark, tables):
    """Q5: region/nation/supplier ride broadcast joins (no dim
    shuffle) and the one-year predicate reaches the orders scan."""
    df = R.local_supplier_volume(
        tables["region"], tables["nation"], tables["customer"],
        tables["supplier"], tables["orders"], tables["lineitem"],
    )
    plan = _plan(df)
    assert plan.count("BroadcastHashJoin") >= 3
    assert "PushedFilters: [IsNotNull(o_orderdate), GreaterThanOrEqual(o_orderdate" in plan


def test_selective_dim_join_injects_runtime_bloom_filter(spark, tables):
    """Spark's runtime bloom-filter injection: a selective filter on
    the orders side materializes a bloom filter that pre-prunes the
    lineitem probe side BEFORE the join shuffle. At 100 TB the default
    size thresholds (10 MB creation side / 10 GB probe scan) enable
    this automatically; the fixtures are far below them, so the test
    lowers the thresholds to pin the plan shape Spark would pick at
    scale. Broadcast is disabled to force the shuffle-join path the
    feature exists for."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "1KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        sel = tables["orders"].filter(
            F.col("o_orderpriority") == "1-URGENT"
        ).select("o_orderkey")
        li = tables["lineitem"]
        j = li.join(sel, li.l_orderkey == sel.o_orderkey).groupBy().count()
        plan = _plan(j)
        assert "bloom_filter_agg" in plan  # filter built on the dim side
        assert "might_contain" in plan  # ...and probed on the fact side
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_corpus_pipeline_plan_shape(spark):
    """The end-to-end curation composite must keep its scale-critical
    properties: the tiny corpus_mix threshold table is broadcast (never
    a shuffled join against the corpus), no cartesian product appears
    beyond the single-row feasibility broadcast, and the final
    per-shard rollup partially aggregates before its exchange."""
    import __spark_entry__ as E

    df = E._q_corpus_pipeline(spark, SF_DIR)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan  # mix-rate thresholds broadcast
    assert "partial" in plan.lower()  # map-side combine on the rollup
    # the only nested-loop allowed is the broadcast of the one-row
    # feasibility aggregate inside corpus_mix
    assert plan.count("CartesianProduct") == 0


def _broadcast_subtrees(plan: str):
    """Yield the subtree lines under each BroadcastExchange node."""
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if "BroadcastExchange" not in line:
            continue
        depth = max(line.find("+-"), line.find(":-"))
        sub = []
        for nxt in lines[i + 1 :]:
            d = max(nxt.find("+-"), nxt.find(":-"))
            if d <= depth:
                break
            sub.append(nxt)
        yield "\n".join(sub)


def test_minhash_verify_never_broadcasts_shingles(spark, tables):
    """Round-4 16×-scale-run finding: Catalyst cannot estimate
    Generate(explode) output, so the static plan inherited the
    pre-explode scan size and broadcast the candidate-shingle frame —
    which grows with the corpus — OOMing the driver. The verify joins
    are pinned to shuffle in ngram_jaccard_pairs; this pins the pin:
    no exploded frame may ever be a broadcast build side."""
    from data_pengadaan_agent_spark.operators import dedup as D

    docs = tables["documents"].filter(F.col("doc_id") < 200)
    cand = D.minhash_lsh_pairs_arith(docs, n_hashes=32, bands=16).localCheckpoint()
    out = D.ngram_jaccard_pairs(docs, n=3, threshold=0.0, pairs=cand)
    plan = _plan(out)
    # pairs⋈a, ⋈b, ⋈sizes_a, ⋈sizes_b all pinned to shuffle joins
    assert plan.count("ShuffledHashJoin") >= 4, plan
    for sub in _broadcast_subtrees(plan):
        assert "Generate explode" not in sub, sub


def test_bm25_single_scan_no_explode(spark, tables):
    """bm25_score must stay a map over ONE corpus scan plus a 1-row
    stats broadcast: no Generate(explode), no vocabulary shuffle (the
    contrast with tfidf_top_terms), and the only join is the broadcast
    of the stats aggregate."""
    from data_pengadaan_agent_spark.operators.textan import bm25_score

    out = bm25_score(tables["documents"], ["spark", "window", "join"])
    plan = _plan(out)
    assert "Generate explode" not in plan
    assert "ShuffledHashJoin" not in plan and "SortMergeJoin" not in plan
    # stats arrive via a broadcast nested-loop of the single agg row
    assert "Exchange hashpartitioning" not in plan


def test_corpus_mix_token_budget_one_exchange(spark, tables):
    """The token-budget mix costs exactly one exchange (the per-group
    window); the budget map is a CASE expression, never a join."""
    from data_pengadaan_agent_spark.operators.sampling import corpus_mix_token_budget

    docs = tables["documents"].select(
        "doc_id", "lang", F.length("text").cast("bigint").alias("n_tokens")
    )
    plan = _plan(corpus_mix_token_budget(docs, {"en": 1000, "de": 500}))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


def test_token_rarity_pins_explode_joins(spark, tables):
    """token_rarity's tf join has BOTH sides descending from the token
    explode (garbage static size estimates) — the house rule pins it
    to shuffle_hash so the planner can never broadcast a
    corpus-proportional frame."""
    from data_pengadaan_agent_spark.operators.textan import token_rarity

    plan = _plan(token_rarity(tables["documents"]))
    assert "ShuffledHashJoin" in plan
    for sub in _broadcast_subtrees(plan):
        if "Generate explode" in sub:
            # the one legal shape: a SCALAR aggregate of the exploded
            # frame (the 1-row n_total broadcast) — bounded by
            # construction; an unaggregated exploded frame is not
            assert "HashAggregate(keys=[]" in sub, sub


def test_boilerplate_ngrams_joins_pinned_shuffle(spark, tables):
    """boilerplate_ngrams is ONE left join (probe = distinct ngrams,
    build = the min_docs-filtered boiler marker) feeding ONE per-doc
    aggregate — the optimization-r14 shape that dropped the old
    totals ⟕ hits split (a third explode pass + second scan). The
    join input descends from the n-gram explode (garbage static size
    estimates, corpus-proportional): the house rule pins it
    shuffle_hash so the planner can never elect a broadcast build
    that grows with the corpus."""
    from data_pengadaan_agent_spark.operators.textan import boilerplate_ngrams

    out = boilerplate_ngrams(tables["documents"], n=3, min_docs=2)
    plan = _plan(out)
    assert plan.count("ShuffledHashJoin") == 1, plan
    # the per-doc counts come from the joined rows, not a second join
    assert "LeftSemi" not in plan, plan
    for sub in _broadcast_subtrees(plan):
        assert "Generate explode" not in sub, sub


def test_length_band_broadcasts_bounds_only(spark, tables):
    """length_outlier_band must cost one scan + a broadcast of the
    1-row percentile aggregate: no hash exchange of document rows
    (the only exchanges are the SinglePartition merge of the
    total aggregate and the broadcast itself)."""
    from data_pengadaan_agent_spark.operators.textan import length_outlier_band

    out = length_outlier_band(tables["documents"])
    plan = _plan(out)
    assert "Exchange hashpartitioning" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan, plan


def test_snapshot_diff_full_outer_on_hashes(spark, tables):
    """snapshot_diff's one shuffle join is FullOuter and both exchange
    inputs project to (key, xxhash64) — document text never crosses
    the exchange."""
    from data_pengadaan_agent_spark.operators.relational import snapshot_diff

    docs = tables["documents"].select("doc_id", "text")
    out = snapshot_diff(docs, docs)
    plan = _plan(out)
    assert "FullOuter" in plan, plan
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "text" not in line, line
    # the projections feeding the exchanges carry the hash, not text
    assert "xxhash64" in plan


def test_embedding_qa_single_group_exchange(spark, tables):
    """embedding_qa is one scan + one partial-aggregated exchange on
    the tiny group key; the norm fold is mapper-side work."""
    from data_pengadaan_agent_spark.operators.relational import embedding_qa

    out = embedding_qa(tables["embeddings"], group_col="label")
    plan = _plan(out)
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "partial" in plan.lower(), plan


def test_prototypicality_one_cluster_window_exchange(spark, tables):
    """After the Arrow assignment pass, ranking costs exactly one
    exchange on the cluster key (plus the deliberate spread()
    round-robin of the single-split fixture scan)."""
    from data_pengadaan_agent_spark.operators.similarity import prototypicality

    out = prototypicality(tables["embeddings"], k=4, iters=1)
    plan = _plan(out)
    cluster_ex = [
        ln for ln in plan.splitlines()
        if "Exchange hashpartitioning(cluster" in ln
    ]
    assert len(cluster_ex) == 1, plan
    assert "Window" in plan


def test_semdedup_one_cluster_exchange_no_pair_join(spark, tables):
    """semdedup_prune must shuffle |vectors| rows once on the cluster
    key into the per-cluster Gram-matrix kernel — no pair rows in the
    engine, no join of Arrow-kernel outputs the planner could botch
    (the first cut's pair self-join got a corpus-sized broadcast from
    the static planner)."""
    from data_pengadaan_agent_spark.operators.similarity import semdedup_prune

    out = semdedup_prune(tables["embeddings"], k=4, iters=1)
    plan = _plan(out)
    assert "FlatMapGroupsInPandas" in plan, plan
    assert "Join" not in plan, plan
    cluster_ex = [
        ln for ln in plan.splitlines()
        if "Exchange hashpartitioning(cluster" in ln
    ]
    assert len(cluster_ex) == 1, plan


def test_corpus_report_single_source_exchange(spark, tables):
    """The datasheet is one scan + one partial-aggregated exchange on
    the source key (count-distinct expansion included) — no joins, no
    second pass."""
    from data_pengadaan_agent_spark.operators.textan import corpus_report

    plan = _plan(corpus_report(tables["documents"]))
    assert "Join" not in plan, plan
    assert plan.count("Exchange hashpartitioning") <= 2, plan  # expand/distinct pair
    assert "partial" in plan.lower(), plan


def test_dedup_near_kernel_plan_shape(spark, tables):
    """Batch near-dup dedup: one MapInPandas kernel emits the band
    rows, then exactly TWO required-distribution hash exchanges
    (rank-1 window on (band, bucket) + the windowed per-doc agg) —
    no joins, nothing explode-derived for the planner to
    mis-broadcast. A starved input may additionally carry ONE
    spread() fan-out repartition BEFORE the kernel
    (REPARTITION_BY_NUM — the round-8 kernel fan-out rule), which is
    load distribution, not a semantic shuffle."""
    import re

    from data_pengadaan_agent_spark.streaming.windows import streaming_dedup_near
    from pyspark.sql import functions as F

    docs = tables["documents"].select(
        "doc_id",
        "text",
        F.timestamp_seconds(
            F.lit(1704067200)
            + F.pmod(F.length("text").cast("long") * F.lit(2654435761), F.lit(3600))
        ).alias("ingest_ts"),
    )
    out = streaming_dedup_near(docs, n_hashes=16, bands=8)
    out.collect()
    plan = _plan(out).split("== Initial Plan ==")[0]
    assert "MapInPandas" in plan, plan
    assert "Join" not in plan, plan
    required = [
        m
        for m in re.findall(r"Exchange hashpartitioning[^\n]*", plan)
        if "REPARTITION_BY_NUM" not in m
    ]
    assert len(required) == 2, plan
    assert len(re.findall(r"REPARTITION_BY_NUM", plan)) <= 1, plan


def test_dsir_checkpoint_discipline(spark, tables):
    """DSIR's reused intermediates must stay checkpointed: the final
    plan reads the materialized score frame + 1-row threshold, with
    ZERO exchanges and zero shuffle joins (a first cut re-executed the
    corpus explode four times — 26 exchanges)."""
    import re

    from data_pengadaan_agent_spark.operators.textan import dsir_importance
    from pyspark.sql import functions as F

    docs = tables["documents"]
    out = dsir_importance(
        docs.filter(F.col("doc_id") % 10 != 0),
        docs.filter(F.col("doc_id") % 10 == 0),
        n=2,
        n_buckets=1024,
    )
    out.collect()
    plan = _plan(out)
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 0, plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, plan


def test_dup_spans_single_tokenize_pass(spark, tables):
    """r15: dup_spans' occurrence gate is a count window ON the gram
    (h) exchange — the old groupBy(h) + left-semi merge-join-back ran
    the tokenize→posexplode→hash chain once per join side. The final
    shape must carry NO join at all, exactly one posexplode Generate,
    and exactly two required hashpartitioning exchanges (h for the
    occurrence window, doc_id for the span merge — spread()'s
    REPARTITION_BY_NUM on a starved input doesn't count)."""
    import re

    from data_pengadaan_agent_spark.operators import textan as X

    docs = tables["documents"].filter(F.col("doc_id") < 200)
    plan = _plan(X.dup_spans(docs, length=8, arith_hash=False))
    assert "Join" not in plan, plan
    assert len(re.findall(r"Generate posexplode", plan)) == 1, plan
    assert (
        len(re.findall(r"Exchange hashpartitioning.*ENSURE_REQUIREMENTS", plan)) == 2
    ), plan


def test_bm25_from_index_never_scans_doclen(spark, tables, tmp_path):
    """r15 (guide §1.2): the (N, Σdl) corpus stats come off the 1-row
    meta marker, so the query-path plan must contain NO doclen scan at
    all — only the bucket-pruned postings scan — and no scan may read a
    text payload off the index."""
    from data_pengadaan_agent_spark.operators import lexindex as LX
    from data_pengadaan_agent_spark.operators import textan as X

    docs = tables["documents"].filter(F.col("doc_id") < 100)
    path = str(tmp_path / "pidx")
    LX.build_postings_index(docs, path, n_buckets=8)
    qs = docs.filter(F.col("doc_id") % 20 == 0).select(
        F.col("doc_id").alias("qid"), F.slice(X.tokens("text"), 1, 3).alias("terms")
    )
    plan = _plan(LX.bm25_from_index(spark, path, qs, k=3))
    assert "doclen" not in plan, plan
    scans = [
        seg.splitlines()[0] for seg in plan.split("ReadSchema: ")[1:]
    ]
    assert scans, plan
    # no scan reads a text/terms payload off the index
    assert all("text" not in s for s in scans), scans


def test_ngram_lm_score_single_reference_pass(spark, tables):
    """r15 (guide §1.2): the reference corpus must be scanned and
    exploded exactly ONCE — unigram and bigram counts ride one tagged
    generator into one checkpointed aggregate. Before the fix the lazy
    c1 table was consumed three times (w1 join, w2 join, N aggregate)
    and c2 once: four reference explodes in the executed plan."""
    from data_pengadaan_agent_spark.operators.textan import ngram_lm_score

    docs = tables["documents"]
    out = ngram_lm_score(docs, docs.filter(F.col("lang") == "en"))
    out.collect()  # AQE-final plan
    plan = _plan(out)
    # the only parquet scan left is the TARGET side; the reference
    # pass ran once inside the checkpoint job (count the AQE FINAL
    # plan section only — the printed initial plan duplicates nodes)
    final_section = plan.split("Initial Plan")[0]
    n_scans = final_section.count("FileScan parquet")
    assert n_scans <= 1, plan
    # the checkpointed (k, g, cnt) table is what the joins consume
    assert "Scan ExistingRDD" in plan, plan

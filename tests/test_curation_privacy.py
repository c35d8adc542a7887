"""Tests for the round-2 curation additions: passage-level dedup,
PII pseudonymization / k-anonymity, tf-idf top terms, corpus mixing,
and quantile-band filtering."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_pengadaan_agent_spark.operators import dedup as D
from data_pengadaan_agent_spark.operators import textan as X
from data_pengadaan_agent_spark.operators.privacy import pseudonymize_customers
from data_pengadaan_agent_spark.operators.sampling import corpus_mix, quantile_band


@pytest.fixture()
def pdocs(spark):
    # 36 tokens = 3 passages of 16,16,4; doc 2 shares doc 1's first window
    w1 = " ".join(f"t{i}" for i in range(16))
    w2 = " ".join(f"u{i}" for i in range(16))
    tail = "x y z w"
    rows = [
        (1, f"{w1} {w2} {tail}"),
        (2, f"{w1} only half".strip()),
        (3, "entirely different tokens here"),
    ]
    return spark.createDataFrame(rows, "doc_id LONG, text STRING")


def test_passage_dedup_counts_and_shared(pdocs):
    out = {r["doc_id"]: r for r in D.passage_dedup_stats(pdocs).collect()}
    assert out[1]["n_passages"] == 3
    # doc 1's first window also opens doc 2's text? No — doc 2's first
    # passage is w1's 16 tokens exactly (window size 16), so shared.
    assert out[1]["n_shared_passages"] == 1
    assert out[2]["n_passages"] == 2  # 16 tokens + 2 leftover
    assert out[2]["n_shared_passages"] == 1
    assert out[3]["n_shared_passages"] == 0
    assert abs(out[1]["shared_ratio"] - 1 / 3) < 1e-6


def test_passage_dedup_short_doc_single_passage(spark):
    df = spark.createDataFrame([(1, "a b"), (2, "a b")], "doc_id LONG, text STRING")
    out = {r["doc_id"]: r for r in D.passage_dedup_stats(df).collect()}
    assert out[1]["n_passages"] == 1 and out[1]["n_shared_passages"] == 1


def test_pseudonymize_k_anonymity(tables):
    out = pseudonymize_customers(
        tables["customer"], tables["nation"], tables["region"]
    )
    rows = out.collect()
    assert len(rows) == tables["customer"].count()
    # pseudonym is a 32-hex digest, never the raw name
    assert all(len(r["name_pseudo"]) == 32 for r in rows[:20])
    # group_n is consistent: count rows per (region, segment, bal_bucket)
    from collections import Counter

    c = Counter((r["region"], r["segment"], r["bal_bucket"]) for r in rows)
    for r in rows[:50]:
        assert r["group_n"] == c[(r["region"], r["segment"], r["bal_bucket"])]
        assert r["k_ok"] == (r["group_n"] >= 5)
    # buckets are multiples of the width
    assert all(r["bal_bucket"] % 1000 == 0 for r in rows[:50])


def test_tfidf_rare_term_outranks_common(spark):
    rows = [
        (1, "common common common rare"),
        (2, "common filler words"),
        (3, "common other things"),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    out = X.tfidf_top_terms(df, k=2).filter(F.col("doc_id") == 1).collect()
    by_rank = {r["rnk"]: r for r in out}
    # tf=3 * idf(df=3) = 3*1_000_000 vs tf=1 * idf(df=1) = 3_000_000:
    # tie broken by term name — 'common' < 'rare'
    assert by_rank[1]["term"] == "common" and by_rank[2]["term"] == "rare"
    assert by_rank[1]["score"] == by_rank[2]["score"] == 3_000_000


def test_corpus_mix_proportions(tables):
    docs = tables["documents"].select("doc_id", "lang", "source")
    weights = {"en": 0.5, "es": 0.5}
    out = corpus_mix(docs, weights)
    got = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(got) <= {"en", "es"}  # unweighted langs dropped
    # proportions within sampling noise of 50/50
    total = sum(got.values())
    assert total > 0
    assert abs(got.get("en", 0) / total - 0.5) < 0.15


def test_corpus_mix_deterministic(tables):
    docs = tables["documents"].select("doc_id", "lang", "source")
    a = sorted(r["doc_id"] for r in corpus_mix(docs, {"en": 0.6, "de": 0.4}).collect())
    b = sorted(
        r["doc_id"]
        for r in corpus_mix(docs.repartition(7), {"en": 0.6, "de": 0.4}).collect()
    )
    assert a == b


def test_quantile_band_bounds(tables):
    docs = tables["documents"].select("doc_id", "n_chars")
    out = quantile_band(docs, "n_chars")
    n_all = docs.count()
    n_kept = out.count()
    assert 0.85 * n_all <= n_kept <= n_all  # keeps ~90%
    lo, hi = out.agg(F.min("n_chars"), F.max("n_chars")).first()
    vals = sorted(r["n_chars"] for r in docs.collect())
    # thresholds are actual data values (percentile_disc)
    assert lo in vals and hi in vals


def test_shuffle_shard_deterministic_and_dense(tables):
    from data_pengadaan_agent_spark.operators.sampling import shuffle_shard

    docs = tables["documents"].select("doc_id", "lang")
    a = shuffle_shard(docs, n_shards=4)
    rows = a.collect()
    assert len(rows) == docs.count()
    # every shard's positions are dense 1..n_shard
    from collections import defaultdict

    by_shard = defaultdict(list)
    for r in rows:
        assert 0 <= r["shard"] < 4
        by_shard[r["shard"]].append(r["pos"])
    for s, ps in by_shard.items():
        assert sorted(ps) == list(range(1, len(ps) + 1))
    # stable under repartitioning
    b = shuffle_shard(docs.repartition(7), n_shards=4)
    assert sorted(map(tuple, rows)) == sorted(map(tuple, b.collect()))


def test_scrub_terms_redacts_and_counts(spark):
    from data_pengadaan_agent_spark.operators.privacy import scrub_terms

    df = spark.createDataFrame(
        [(1, "the customer met a customer yesterday"), (2, "no match here"),
         (3, "customers are not redacted")],  # word boundary: no partial hit
        "doc_id LONG, text STRING",
    )
    out = {r["doc_id"]: r for r in scrub_terms(df, ("customer",)).collect()}
    assert out[1]["n_redactions"] == 2
    assert out[1]["text_scrubbed"] == "the [REDACTED] met a [REDACTED] yesterday"
    assert out[2]["n_redactions"] == 0
    assert out[3]["n_redactions"] == 0 and "customers" in out[3]["text_scrubbed"]


def test_mode_per_group_tiebreak(spark):
    from data_pengadaan_agent_spark.operators.aggregates import mode_per_group

    df = spark.createDataFrame(
        [("en", "b"), ("en", "b"), ("en", "a"), ("en", "a"), ("de", "z")],
        "lang STRING, source STRING",
    )
    out = {r["lang"]: r for r in mode_per_group(df, "lang", "source").collect()}
    # tie between a and b at 2 → lexicographically smaller wins
    assert out["en"]["mode_value"] == "a" and out["en"]["n_mode"] == 2
    assert out["de"]["mode_value"] == "z" and out["de"]["n_mode"] == 1


def test_stratified_sample_exact_quota(tables):
    """Every stratum contributes exactly ceil(frac · n_g) rows, and the
    selection is deterministic across invocations."""
    import math

    from data_pengadaan_agent_spark.operators.sampling import stratified_sample

    docs = tables["documents"].select("doc_id", "lang")
    group_n = {r["lang"]: r["count"] for r in docs.groupBy("lang").count().collect()}
    out = stratified_sample(docs, group_col="lang", frac=0.3)
    got = {r["lang"]: r["count"] for r in out.groupBy("lang").count().collect()}
    assert got == {g: math.ceil(n * 0.3) for g, n in group_n.items()}
    again = {tuple(r) for r in stratified_sample(docs, "lang", 0.3).collect()}
    assert again == {tuple(r) for r in out.collect()}


def test_incremental_dedup_disjoint_and_unique(tables):
    """Survivors share no text with the seen corpus and contain no
    within-batch duplicates; every surviving id is the min of its
    duplicate group."""
    from pyspark.sql import functions as F

    from data_pengadaan_agent_spark.operators.dedup import dedup_incremental

    docs = tables["documents"]
    new = docs.filter(F.col("doc_id") % 10 == 0)
    seen = docs.filter(F.col("doc_id") % 10 != 0)
    out = dedup_incremental(new, seen)
    assert out.join(seen, "text", "left_semi").count() == 0
    assert out.count() == out.select("text").distinct().count()
    mins = new.groupBy("text").agg(F.min("doc_id").alias("doc_id"))
    assert out.join(mins, ["doc_id", "text"], "left_anti").count() == 0


def test_hybrid_rrf_scores_consistent(tables):
    """Each fused score equals Σ 1/(60+rank) of the ranks the row
    carries, ranks are dense 1..n within each list, and the output is
    ordered by (score desc, id)."""
    from pyspark.sql import functions as F

    from data_pengadaan_agent_spark.operators.similarity import hybrid_retrieval_rrf

    docs, emb = tables["documents"], tables["embeddings"]
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    rows = hybrid_retrieval_rrf(
        docs, emb, ("spark", "window", "join"), qvec, k=10, k_each=25
    ).collect()
    assert len(rows) == 10
    for r in rows:
        want = 0.0
        if r["kw_rank"] is not None:
            want += 1.0 / (60 + r["kw_rank"])
        if r["vec_rank"] is not None:
            want += 1.0 / (60 + r["vec_rank"])
        assert abs(r["rrf_score"] - round(want, 6)) < 1e-9
    scores = [(-r["rrf_score"], r["doc_id"]) for r in rows]
    assert scores == sorted(scores)


def test_detect_pii_counts(spark):
    """Span counts per class on crafted text; clean text flags false."""
    from data_pengadaan_agent_spark.operators.privacy import detect_pii

    df = spark.createDataFrame(
        [
            (1, "mail a@b.io and c.d@e.org, call +1-555-0199, host 10.0.0.1"),
            (2, "no identifiers here"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in detect_pii(df).collect()}
    assert (got[1]["n_email"], got[1]["n_phone"], got[1]["n_ipv4"]) == (2, 1, 1)
    assert got[1]["n_pii_total"] == 4 and got[1]["has_pii"]
    assert got[2]["n_pii_total"] == 0 and not got[2]["has_pii"]


def test_detect_pii_ipv4_boundary_guards(spark):
    """ADVICE r4: the default ipv4 pattern must not count version
    strings (no word boundary inside 'v1') or out-of-range octets,
    while still counting real dotted quads — and the same RE2-safe
    shape must agree in DuckDB (the oracle engine)."""
    import duckdb

    from data_pengadaan_agent_spark.operators.privacy import PII_PATTERNS, detect_pii

    cases = [
        (1, "release v1.2.3.4 is out"),          # version string: 0
        (2, "bad host 999.1.1.1 pinged"),        # out-of-range octet: 0
        (3, "edge 255.255.255.255 and 0.0.0.0"),  # valid extremes: 2
        (4, "server 192.168.10.250 up"),          # plain valid: 1
        (5, "chain 1.2.3.4.5 logged"),            # documented prefix match: 1
    ]
    df = spark.createDataFrame(cases, "doc_id long, text string")
    got = {r["doc_id"]: r["n_ipv4"] for r in detect_pii(df).collect()}
    assert got == {1: 0, 2: 0, 3: 2, 4: 1, 5: 1}, got

    duck = {
        i: duckdb.sql(
            "SELECT len(regexp_extract_all(?, ?))", params=[t, PII_PATTERNS["ipv4"]]
        ).fetchone()[0]
        for i, t in cases
    }
    assert duck == got, (duck, got)


def test_bm25_ranking_properties(spark):
    """BM25 semantics: more matches rank higher at equal length, rarer
    terms outweigh common ones, longer docs are length-penalized, and
    term-free docs are excluded."""
    from data_pengadaan_agent_spark.operators.textan import bm25_score

    docs = spark.createDataFrame(
        [
            (1, "spark spark spark pad pad pad pad pad"),
            (2, "spark pad pad pad pad pad pad pad"),
            (3, "rare pad pad pad pad pad pad pad"),
            (4, "pad pad pad pad pad pad pad pad"),
            # 'spark' appears in 3 docs, 'rare' in 1 → rare has higher idf
            (5, "spark pad pad pad pad pad pad pad pad pad pad pad pad pad pad pad"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["bm25"] for r in bm25_score(docs, ["spark", "rare"]).collect()}
    assert 4 not in got  # no query term → excluded
    assert got[1] > got[2]  # tf monotone at equal length
    assert got[3] > got[2]  # rarer term, same tf and length → higher idf
    assert got[2] > got[5]  # same tf, longer doc → length-normalized down


def test_corpus_mix_token_budget_semantics(spark):
    """Per-group token budgets: admitted prefix in hash order, at most
    one doc of overshoot, oversupplied budget keeps all, absent groups
    dropped, and selection is stable under repartitioning."""
    from data_pengadaan_agent_spark.operators.sampling import (
        corpus_mix_token_budget,
        split_hash_col,
    )

    rows = [(i, "en" if i % 2 else "de", 10 + (i % 7)) for i in range(1, 201)]
    rows += [(i, "zh", 10) for i in range(201, 221)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_tokens long")
    budgets = {"en": 300, "de": 100_000}
    out = corpus_mix_token_budget(df, budgets, group_col="lang")
    got = out.groupBy("lang").agg(
        F.sum("n_tokens").alias("tok"), F.count("*").alias("n")
    )
    by_lang = {r["lang"]: (r["tok"], r["n"]) for r in got.collect()}
    assert set(by_lang) == {"en", "de"}  # zh absent from budgets → dropped
    assert by_lang["de"][1] == 100  # oversupplied budget keeps the whole group
    # budget respected up to < one doc of overshoot
    en_tok = by_lang["en"][0]
    assert en_tok >= 300 - 16 and en_tok < 300 + 17

    # admitted set == prefix of the hash order (no holes)
    en = df.filter(F.col("lang") == "en").withColumn("_h", split_hash_col("doc_id"))
    order = [r["doc_id"] for r in en.orderBy("_h", "doc_id").collect()]
    admitted = {r["doc_id"] for r in out.filter(F.col("lang") == "en").collect()}
    assert admitted == set(order[: len(admitted)])

    re_out = corpus_mix_token_budget(df.repartition(13), budgets, group_col="lang")
    assert {r["doc_id"] for r in re_out.collect()} == {
        r["doc_id"] for r in out.collect()
    }


def test_cluster_representatives_keeps_best(spark):
    """Highest score wins per cluster; ties break to min id; singleton
    clusters survive with n_members = 1."""
    from data_pengadaan_agent_spark.operators.dedup import cluster_representatives

    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 4), (5, 4), (6, 6)],
        "doc_id long, cluster_rep long",
    )
    scores = spark.createDataFrame(
        [(1, 0.2), (2, 0.9), (3, 0.5), (4, 0.7), (5, 0.7), (6, 0.1)],
        "doc_id long, quality_score double",
    )
    got = {
        r["cluster_id"]: (r["rep_doc_id"], r["best_score"], r["n_members"])
        for r in cluster_representatives(clusters, scores).collect()
    }
    assert got == {1: (2, 0.9, 3), 4: (4, 0.7, 2), 6: (6, 0.1, 1)}


def test_scrub_terms_escapes_metacharacters_and_rejects_empty(spark):
    """Self-review r12: deny-list terms are regex-escaped ('a.com'
    used to redact 'aXcom'; 'c++' threw PatternSyntaxException) and an
    empty deny-list is refused (the empty alternation matched
    zero-width at every word boundary)."""
    from data_pengadaan_agent_spark.operators.privacy import scrub_terms

    df = spark.createDataFrame(
        [(1, "visit a.com or aXcom now")], "doc_id LONG, text STRING"
    )
    out = scrub_terms(df, ("a.com",)).collect()[0]
    assert out.text_scrubbed == "visit [REDACTED] or aXcom now"
    assert out.n_redactions == 1
    df2 = spark.createDataFrame([(1, "c++ rocks")], "doc_id LONG, text STRING")
    out2 = scrub_terms(df2, ("c++",)).collect()[0]
    assert out2.n_redactions == 1
    import pytest as _pt

    with _pt.raises(ValueError, match="empty"):
        scrub_terms(df, ())


def test_detect_pii_empty_patterns_refused_none_means_default(spark):
    """Self-review r12: an explicit empty dict must not be silently
    swapped for the default classes (a dynamically-filtered audit
    would report classes it never asked for)."""
    from data_pengadaan_agent_spark.operators.privacy import detect_pii

    df = spark.createDataFrame([(1, "a@b.co")], "doc_id LONG, text STRING")
    assert detect_pii(df).collect()[0].n_email == 1  # None -> defaults
    import pytest as _pt

    with _pt.raises(ValueError, match="empty patterns"):
        detect_pii(df, patterns={})


def test_pseudonymize_salt_changes_digest(spark, tables):
    """Self-review r12: optional secret salt for data leaving the
    trust boundary — the unkeyed digest is enumerable from the key
    space; the salted one is not. Default (no salt) unchanged."""
    from data_pengadaan_agent_spark.operators.privacy import (
        pseudonymize_customers,
    )

    cust, nat, reg = tables["customer"], tables["nation"], tables["region"]
    plain = pseudonymize_customers(cust, nat, reg)
    salted = pseudonymize_customers(cust, nat, reg, salt="s3cr3t")
    a = {r.c_custkey: r.name_pseudo for r in plain.limit(50).collect()}
    b = {r.c_custkey: r.name_pseudo for r in salted.limit(50).collect()}
    assert all(a[k] != b[k] for k in a)


def test_corpus_mix_token_budget_null_tokens_never_admitted_free(spark):
    """Self-review r12: a NULL token count used to be admitted FREE
    even after the budget was exhausted (window sum skips NULLs,
    coalesce read 0) — and diverged from the plain-SQL form where the
    NULL running sum fails the filter. Unknown-size docs are dropped."""
    from data_pengadaan_agent_spark.operators.sampling import (
        corpus_mix_token_budget,
    )

    rows = [(i, "en", 50) for i in range(10)] + [(100, "en", None)]
    df = spark.createDataFrame(rows, "doc_id LONG, lang STRING, n_tokens LONG")
    out = corpus_mix_token_budget(df, {"en": 100}, token_col="n_tokens")
    got = sorted(r.doc_id for r in out.collect())
    assert 100 not in got           # never admitted free
    assert len(got) == 2            # budget 100 = exactly two 50-token docs

"""Dedup (exact / minhash-LSH / simhash / jaccard) + vector similarity."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from data_pengadaan_agent_spark.operators import dedup as D
from data_pengadaan_agent_spark.operators import similarity as S


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = "the quick brown fox jumps over the lazy cat again and again today"
    rows = [
        (1, base),
        (2, base),  # exact dup of 1
        (3, near),  # near dup of 1
        (4, "completely different text about spark shuffle partitions and joins"),
        (5, "another unrelated document mentioning hash aggregation pipelines"),
    ]
    return spark.createDataFrame(rows, "doc_id LONG, text STRING")


def test_dedup_exact(docs):
    kept = sorted(r["doc_id"] for r in D.dedup_exact(docs).collect())
    assert kept == [1, 3, 4, 5]  # min-id representative survives


def test_duplicate_groups(docs):
    out = D.duplicate_groups(docs).collect()
    assert len(out) == 1 and out[0]["n_dups"] == 2 and out[0]["rep_id"] == 1


def test_shingles_count(spark):
    df = spark.createDataFrame([(1, "a b c d")], "doc_id LONG, text STRING")
    got = sorted(r["shingle"] for r in D.shingles(df, n=3).collect())
    assert got == ["a b c", "b c d"]


def test_ngram_jaccard_exact_value(spark):
    # doc1 shingle set (n=1): {a,b,c,d}; doc2: {a,b,c,e} → J = 3/5
    df = spark.createDataFrame([(1, "a b c d"), (2, "a b c e")], "doc_id LONG, text STRING")
    out = D.ngram_jaccard_pairs(df, n=1, threshold=0.0).collect()
    assert len(out) == 1
    assert abs(out[0]["jaccard"] - 3 / 5) < 1e-12


@pytest.mark.slow
def test_minhash_pipeline_finds_near_dups(docs):
    out = D.minhash_dedup_pairs(docs, threshold=0.5, n_hashes=32, bands=16, shingle_n=2)
    pairs = {(r["id_a"], r["id_b"]) for r in out.collect()}
    assert (1, 2) in pairs  # exact dup: jaccard 1.0, must survive any banding
    assert all(p[0] in (1, 2, 3) and p[1] in (2, 3) for p in pairs)


@pytest.mark.slow
def test_minhash_signature_deterministic(docs):
    a = D.minhash_signatures(docs).collect()
    b = D.minhash_signatures(docs).collect()
    assert {r["doc_id"]: r["sig"] for r in a} == {r["doc_id"]: r["sig"] for r in b}


def test_simhash_identical_and_near(docs):
    sigs = {r["doc_id"]: r["simhash"] for r in D.simhash_signatures(docs).collect()}
    assert sigs[1] == sigs[2]  # identical text → identical simhash
    ham13 = bin((sigs[1] ^ sigs[3]) & ((1 << 64) - 1)).count("1")
    ham14 = bin((sigs[1] ^ sigs[4]) & ((1 << 64) - 1)).count("1")
    assert ham13 < ham14  # near-dup closer than unrelated


def test_simhash_pairs_hamming(docs):
    out = {(r["id_a"], r["id_b"]): r["hamming"] for r in D.simhash_pairs(docs, max_hamming=10).collect()}
    assert out[(1, 2)] == 0


# --- similarity -------------------------------------------------------------


@pytest.fixture(scope="module")
def vecs(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0, 0.0]),
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [-1.0, 0.0, 0.0, 0.0]),
        (4, [0.5, 0.5, 0.5, 0.5]),
    ]
    return spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<FLOAT>")


def test_cosine_topk_values(vecs):
    out = S.cosine_topk(vecs, "embedding", [1.0, 0.0, 0.0, 0.0], k=3).collect()
    assert [r["vec_id"] for r in out] == [0, 1, 4]
    assert abs(out[0]["similarity"] - 1.0) < 1e-9
    assert abs(out[1]["similarity"] - 0.9 / math.sqrt(0.82)) < 1e-9
    assert abs(out[2]["similarity"] - 0.5) < 1e-9


def test_cosine_zero_vector_scores_zero_not_nan(spark):
    """Zero-norm guard parity across the three retrieval paths (the
    r12 pandas convention, now also the expression form): a zero
    vector scores 0 and never enters the top-k ahead of real matches —
    NaN would rank ABOVE every real similarity under desc."""
    rows = [(0, [1.0, 0.0]), (1, [0.0, 0.0]), (2, [0.6, 0.8])]
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<FLOAT>")
    out = S.cosine_topk(df, "embedding", [1.0, 0.0], k=3).collect()
    assert [r["vec_id"] for r in out] == [0, 2, 1]
    assert out[-1]["similarity"] == 0.0  # the zero vector, last
    pd_out = S.cosine_topk_pandas(df, "embedding", [1.0, 0.0], k=3).collect()
    assert [r["vec_id"] for r in pd_out] == [0, 2, 1]
    # zero QUERY: everything scores 0, ties rank by id, nothing is NaN
    zq = S.cosine_topk(df, "embedding", [0.0, 0.0], k=3).collect()
    assert [r["vec_id"] for r in zq] == [0, 1, 2]
    assert all(r["similarity"] == 0.0 for r in zq)
    # the exact all-pairs baseline: a zero vector pairs at 0, below
    # any positive threshold — never a NaN >= threshold artifact
    pairs = S.cosine_pairs(df, "embedding", threshold=0.5).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(0, 2)}


def test_cosine_pandas_path_matches_builtin(vecs):
    q = [0.3, -0.2, 0.9, 0.1]
    a = {(r["vec_id"], round(r["similarity"], 9)) for r in S.cosine_topk(vecs, "embedding", q, k=5).collect()}
    b = {(r["vec_id"], round(r["similarity"], 9)) for r in S.cosine_topk_pandas(vecs, "embedding", q, k=5).collect()}
    assert a == b


@pytest.mark.slow
def test_lsh_topk_subset_of_brute(tables):
    emb = tables["embeddings"]
    q = emb.filter(F.col("vec_id") == 7).first()["embedding"]
    brute = [r["vec_id"] for r in S.cosine_topk(emb, "embedding", q, k=50).collect()]
    approx = S.lsh_topk(emb, "embedding", q, k=10, n_planes=8)
    got = [r["vec_id"] for r in approx.collect()]
    assert 7 in got  # the query's own vector shares its bucket by construction
    assert set(got).issubset(set(brute) | set(got))  # sanity: no dups/garbage
    assert len(got) == len(set(got))


def test_cosine_pairs_threshold(vecs):
    out = {(r["id_a"], r["id_b"]) for r in S.cosine_pairs(vecs, "embedding", threshold=0.99).collect()}
    assert out == {(0, 1)} or (0, 1) in out  # 0–1 are near-identical


def test_train_test_split_deterministic_under_repartition(tables):
    """The split must not depend on partitioning or run order — the
    property df.sample()/TABLESAMPLE cannot give."""
    from data_pengadaan_agent_spark.operators.sampling import train_test_split

    docs = tables["documents"]
    a = {r["doc_id"]: r["split"] for r in train_test_split(docs, "doc_id", 0.8).collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in train_test_split(docs.repartition(13), "doc_id", 0.8).collect()
    }
    assert a == b
    frac = sum(1 for v in a.values() if v == "train") / len(a)
    assert 0.7 < frac < 0.9  # close to 0.8 in expectation


def test_sample_per_group_cap_and_determinism(tables):
    from data_pengadaan_agent_spark.operators.sampling import sample_per_group

    docs = tables["documents"]
    out = sample_per_group(docs, "source", "doc_id", k=3)
    rows = out.collect()
    from collections import Counter

    per = Counter(r["source"] for r in rows)
    assert all(v <= 3 for v in per.values())
    again = sample_per_group(docs.repartition(7), "source", "doc_id", k=3).collect()
    assert sorted((r["source"], r["doc_id"]) for r in rows) == sorted(
        (r["source"], r["doc_id"]) for r in again
    )


def test_cross_source_overlap_pairs(spark):
    """Distinct shared contents per source pair, pairs ordered a<b,
    duplicate rows within one source collapse first."""
    from data_pengadaan_agent_spark.operators.dedup import cross_source_overlap

    df = spark.createDataFrame(
        [
            ("t1", "a"), ("t1", "a"),  # within-source dup collapses
            ("t1", "b"), ("t2", "a"), ("t2", "b"),
            ("t3", "c"), ("t1", "c"),
        ],
        "text string, source string",
    )
    got = {
        (r["source_a"], r["source_b"]): r["n_shared"]
        for r in cross_source_overlap(df).collect()
    }
    assert got == {("a", "b"): 2, ("a", "c"): 1, ("b", "c"): 1}


def test_cross_source_overlap_ignores_null_text(spark):
    """NULL text is not shared content — without the guard,
    xxhash64(NULL)=42 would join NULL rows across sources."""
    from data_pengadaan_agent_spark.operators.dedup import cross_source_overlap

    df = spark.createDataFrame(
        [(None, "a"), (None, "b"), ("t", "a"), ("t", "b")],
        "text string, source string",
    )
    got = {
        (r["source_a"], r["source_b"]): r["n_shared"]
        for r in cross_source_overlap(df).collect()
    }
    assert got == {("a", "b"): 1}


def test_dedup_passages_rewrites_documents(spark):
    """Action twin of passage_dedup_stats: cross-doc copies and
    within-doc repeats drop at every occurrence but the corpus-first;
    documents rebuild in passage order; a fully-duplicated doc
    survives as empty text."""
    from data_pengadaan_agent_spark.operators.dedup import dedup_passages

    p1 = "alpha beta gamma delta"        # doc 1 passage 0
    p2 = "epsilon zeta eta theta"        # doc 1 passage 1
    uniq = "iota kappa lambda mu"
    rows = [
        (1, f"{p1} {p2}"),               # original
        (2, f"{p2} {uniq} {p2}"),        # cross-doc copy + within-doc repeat
        (3, f"{p1} {p2}"),               # fully duplicated doc
        (4, "nu xi"),                    # short doc: single partial passage
    ]
    out = {
        r["doc_id"]: r
        for r in dedup_passages(
            spark.createDataFrame(rows, "doc_id long, text string"),
            window=4,
        ).collect()
    }
    assert out[1]["text"] == f"{p1} {p2}"
    assert (out[1]["n_passages"], out[1]["n_kept"]) == (2, 2)
    # doc 2: first p2 lost to doc 1, repeat lost too; uniq survives
    assert out[2]["text"] == uniq
    assert (out[2]["n_passages"], out[2]["n_kept"]) == (3, 1)
    # doc 3: nothing left — empty text, explicit row
    assert out[3]["text"] == "" and out[3]["n_kept"] == 0
    assert out[4]["text"] == "nu xi" and out[4]["n_kept"] == 1


def test_dedup_passages_skew_salt_same_answer_two_level_plan(spark):
    """r15 (VERDICT r14 ask #9): the opt-in skew salt must (a) return
    the identical verdict for any salt width on a synthetic viral
    passage (min is associative over the salted partials), and (b)
    actually switch the vote to the two-level aggregate + join-back —
    no WindowExec — while the default keeps the single window pass."""
    from data_pengadaan_agent_spark.operators.dedup import dedup_passages

    viral = "alpha beta gamma delta"
    rows = [(i, f"{viral} tail{i} x y z") for i in range(1, 41)]
    rows.append((41, viral))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    base = sorted(map(tuple, dedup_passages(df, window=4).collect()))
    for s in (2, 7):
        salted = dedup_passages(df, window=4, skew_salt=s)
        assert sorted(map(tuple, salted.collect())) == base
    plan_salted = salted._jdf.queryExecution().executedPlan().toString()
    plan_default = (
        dedup_passages(df, window=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan_salted and "ShuffledHashJoin" in plan_salted
    assert "Window" in plan_default and "ShuffledHashJoin" not in plan_default


def test_weighted_sample_pps_and_determinism(spark):
    """Sequential Poisson sampling: (a) membership is a pure function
    of (id, weight) — repartitioning never changes it; (b) selection
    is genuinely weight-biased (the heavy stratum wins far more than
    its row share); (c) NULL / non-positive weights are excluded;
    (d) n >= survivors returns them all."""
    from data_pengadaan_agent_spark.operators import sampling as SA

    rows = [(i, 1000 if i % 10 == 0 else 1) for i in range(2000)]
    rows += [(2000, None), (2001, 0), (2002, -5)]
    df = spark.createDataFrame(rows, "doc_id LONG, w LONG")
    got = sorted(r["doc_id"] for r in SA.weighted_sample(df, "w", 100).collect())
    again = sorted(
        r["doc_id"]
        for r in SA.weighted_sample(df.repartition(13), "w", 100).collect()
    )
    assert got == again and len(got) == 100
    assert not {2000, 2001, 2002} & set(got)
    heavy = sum(1 for i in got if i % 10 == 0)
    # heavy stratum is 10% of rows but weight 1000x: expect near-total
    assert heavy > 80
    all_of_them = SA.weighted_sample(df, "w", 10_000).count()
    assert all_of_them == 2000  # the three invalid-weight rows stay out


def test_weighted_sample_per_group_quota(spark):
    from data_pengadaan_agent_spark.operators import sampling as SA

    rows = [(i, "a" if i < 500 else "b", 1 + i % 7) for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id LONG, g STRING, w LONG")
    got = SA.weighted_sample_per_group(df, "g", "w", 25).collect()
    per = {}
    for r in got:
        per[r["g"]] = per.get(r["g"], 0) + 1
    assert per == {"a": 25, "b": 25}
    again = {
        (r["g"], r["doc_id"])
        for r in SA.weighted_sample_per_group(df.repartition(11), "g", "w", 25).collect()
    }
    assert again == {(r["g"], r["doc_id"]) for r in got}


def test_weighted_sample_plan_is_take_ordered(spark):
    """The 100 TB shape: partial per-partition top-n, one n-row merge
    — never a global sort of the corpus."""
    from data_pengadaan_agent_spark.operators import sampling as SA

    df = spark.createDataFrame(
        [(i, 1 + i % 3) for i in range(100)], "doc_id LONG, w LONG"
    )
    plan = (
        SA.weighted_sample(df, "w", 10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    import pytest

    with pytest.raises(ValueError, match="n must be"):
        SA.weighted_sample(df, "w", 0)
    with pytest.raises(ValueError, match="k must be"):
        SA.weighted_sample_per_group(df, "w", "w", 0)


def test_cosine_topk_pandas_zero_vectors_never_dominate(spark):
    """Self-review r12: a zero-norm corpus vector gave 0/0 = NaN in
    the BLAS path, and Spark ranks NaN above every real double — zero
    vectors crowded real matches out of the top-k while the
    expression twin returned NULL (sorts last). Guarded like
    l2_normalize_pandas; the two paths now agree."""
    rows = [(i, [1.0, 0.0, 0.0, 0.0]) for i in range(5)]
    rows += [(10 + i, [0.0, 0.0, 0.0, 0.0]) for i in range(5)]  # zero vectors
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<FLOAT>")
    got = S.cosine_topk_pandas(df, "embedding", [1.0, 0.0, 0.0, 0.0], k=5)
    ids = [r.vec_id for r in got.collect()]
    assert ids == [0, 1, 2, 3, 4]  # the real matches, never the zeros
    sims = [r.similarity for r in got.collect()]
    assert all(not math.isnan(s) for s in sims)


def test_kmeans_lloyd_lowest_k_ids_seed_sparse_ids(spark):
    """Self-review r12: the init is the k LOWEST-id vectors as
    documented — filter(id < k) required ids 0..k-1 to literally
    exist and broke 1-based / sparse id spaces."""
    rows = [(100 + 7 * i, [float(i % 4), float(i % 3), 0.0, 1.0])
            for i in range(24)]
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<FLOAT>")
    out = S.kmeans_lloyd(df, k=3, vec_col="embedding", id_col="vec_id", iters=2)
    assert out.count() == 24
    assert out.select("cluster").distinct().count() <= 3
    with pytest.raises(ValueError, match="exceeds"):
        S.kmeans_lloyd(df.limit(2), k=3, vec_col="embedding", id_col="vec_id")


def test_banded_signatures_blas_rejects_string_ids(spark):
    """Self-review r12: the Arrow kernel schema declares the id long;
    a string id used to crash deep in the kernel with an opaque
    conversion error — refused loudly up front instead."""
    df = spark.createDataFrame(
        [("a", [1.0] * 8)], "doc STRING, embedding ARRAY<FLOAT>"
    )
    with pytest.raises(ValueError, match="integral"):
        S.banded_signatures_blas(df, "embedding", 8, id_col="doc")


def test_ivf_trained_probe_rejects_wrong_dim(spark, tmp_path):
    """Self-review r12: probing a trained IVF table with a shorter
    query used to rank partitions by a meaningless PREFIX distance —
    silent recall collapse; now a loud geometry error."""
    rows = [(i, [float(i % 5)] * 16) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<FLOAT>")
    path = str(tmp_path / "ivf_dim")
    S.build_ivf_table(df, "embedding", 16, path, n_centroids=2, train_iters=1)
    with pytest.raises(ValueError, match="dim"):
        S.ivf_topk_precomputed(spark, path, "embedding", [1.0] * 8, n_probe=1)


def test_dedup_exact_and_incremental_keep_null_texts(spark):
    """Self-review r12: xxhash64(NULL) is a constant, so every
    NULL-text document used to collapse into one 'duplicate' group
    (dedup_exact) or be anti-joined away by a single NULL in the seen
    corpus (dedup_incremental). Nothing is known about NULL content —
    all such rows are kept."""
    df = spark.createDataFrame(
        [(1, "same"), (2, "same"), (3, None), (4, None), (5, None)],
        "doc_id LONG, text STRING",
    )
    got = sorted(r.doc_id for r in D.dedup_exact(df).collect())
    assert got == [1, 3, 4, 5]
    seen = spark.createDataFrame([(0, None), (9, "old")], "doc_id LONG, text STRING")
    new = spark.createDataFrame(
        [(10, None), (11, "old"), (12, "fresh")], "doc_id LONG, text STRING"
    )
    got2 = sorted(r.doc_id for r in D.dedup_incremental(new, seen).collect())
    assert got2 == [10, 12]


def test_minhash_banding_validation(spark):
    """Self-review r12: bands > n_hashes made every band bucket the
    hash of an EMPTY slice (all docs collide, quadratic pairs); a
    non-dividing bands silently ignored trailing hashes."""
    df = spark.createDataFrame([(1, "a b c")], "doc_id LONG, text STRING")
    with pytest.raises(ValueError, match="divide"):
        D.minhash_lsh_pairs(df, n_hashes=32, bands=64)
    with pytest.raises(ValueError, match="divide"):
        D.minhash_lsh_pairs_arith(df, n_hashes=20, bands=8)


@pytest.mark.slow
def test_cc_loop_releases_superseded_label_checkpoints(spark):
    """Self-review r14 (the pagerank_int_converged lesson applied to
    the min-label CC loop): each round's superseded labels checkpoint
    is freed once the convergence count has consumed it — growth is
    the live handles (edges + final labels), not one copy per round."""
    docs = spark.createDataFrame(
        [(i, "x") for i in range(12)], "doc_id LONG, text STRING"
    )
    # a path graph: diameter 11 forces many propagation rounds
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(11)], "id_a LONG, id_b LONG"
    )
    before = len(spark.sparkContext._jsc.sc().getRDDStorageInfo())
    out = D.dedup_clusters(docs, pairs, max_iter=20).collect()
    after = len(spark.sparkContext._jsc.sc().getRDDStorageInfo())
    assert {r["cluster_rep"] for r in out} == {0}  # one component, min id
    assert after - before <= 2  # edges + live labels, not per-round

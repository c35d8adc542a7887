"""Semantic pins for the four round-8-built / round-9-registration
candidates (ngram_lm_score, scd2_history, ivf_drift_report,
mmr_diversify). Their DuckDB twins are swept by tools/check_oracle.py
(bit-exact at sf0.001/0.01/0.1); these tests pin the SEMANTICS on
literal frames where the expected answer is hand-derivable."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_ngram_lm_fluent_beats_garbled(spark):
    """Docs made of reference bigrams must outscore docs of reference
    WORDS in unseen orders (backoff), which outscore OOV garbage (0);
    a <2-token doc has no bigrams and is excluded."""
    from data_pengadaan_agent_spark.operators.textan import ngram_lm_score

    ref = spark.createDataFrame(
        [(100 + i, "the cat sat on the mat") for i in range(5)],
        "doc_id long, text string",
    )
    docs = spark.createDataFrame(
        [
            (1, "the cat sat"),        # in-LM bigrams
            (2, "mat cat the on"),     # known words, unseen bigrams
            (3, "zzz qqq www"),        # OOV -> 0
            (4, "solo"),               # featureless: excluded
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in ngram_lm_score(docs, ref).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1]["lm_score"] > out[2]["lm_score"] > out[3]["lm_score"]
    assert out[3]["lm_score"] == 0.0
    assert out[1]["n_bigrams"] == 2


def test_ngram_lm_backoff_is_unigram_scaled(spark):
    """The backoff branch must be (2*c1(w2)*1e6) DIV (5*N) exactly —
    pinned by a doc whose single bigram is unseen but whose w2 is a
    known unigram."""
    from data_pengadaan_agent_spark.operators.textan import ngram_lm_score

    ref = spark.createDataFrame(
        [(10, "aa bb aa bb")], "doc_id long, text string"
    )  # N=4 tokens; c1(aa)=2
    docs = spark.createDataFrame(
        [(1, "bb aa")], "doc_id long, text string"
    )  # bigram "bb aa" unseen in ref (ref has only "aa bb"/"bb aa"?);
    out = {r["doc_id"]: r for r in ngram_lm_score(docs, ref).collect()}
    # ref bigrams: "aa bb","bb aa","aa bb" -> "bb aa" IS seen (c2=1,
    # c1(bb)=2): score = 1_000_000*1 DIV 2 = 500000
    assert out[1]["lm_sum"] == 500000
    docs2 = spark.createDataFrame([(2, "cc aa")], "doc_id long, text string")
    out2 = {r["doc_id"]: r for r in ngram_lm_score(docs2, ref).collect()}
    # "cc aa" unseen, w2=aa known: (2*2*1e6) DIV (5*4) = 200000
    assert out2[2]["lm_sum"] == 200000


def test_scd2_history_runs_and_intervals(spark):
    """Consecutive same-state events collapse into one version;
    recurring states get NEW versions; valid_to chains to the next
    version's valid_from; only the last version is current."""
    from data_pengadaan_agent_spark.operators.relational import scd2_history

    ev = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", 7, "a", 0.0, ""),
            (2, "2024-01-01 01:00:00", 7, "a", 0.0, ""),
            (3, "2024-01-01 02:00:00", 7, "b", 0.0, ""),
            (4, "2024-01-01 03:00:00", 7, "a", 0.0, ""),  # a RECURS
            (5, "2024-01-01 00:30:00", 8, "x", 0.0, ""),
        ],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = sorted(
        (
            (r["user_id"], r["version"], r["state"], r["n_events"],
             r["is_current"], r["valid_to"] is None)
            for r in scd2_history(ev).collect()
        )
    )
    assert out == [
        (7, 1, "a", 2, False, False),
        (7, 2, "b", 1, False, False),
        (7, 3, "a", 1, True, True),
        (8, 1, "x", 1, True, True),
    ]
    rows = {(r["user_id"], r["version"]): r for r in scd2_history(ev).collect()}
    assert rows[(7, 1)]["valid_to"] == rows[(7, 2)]["valid_from"]
    assert rows[(7, 2)]["valid_to"] == rows[(7, 3)]["valid_from"]


def test_scd2_single_exchange(spark, tables):
    """The whole SCD2 pipeline (lag, running sum, run aggregate,
    valid_to lead) must share ONE hash exchange on the key: the window
    partitioning satisfies the (key, version) group-by's clustering
    and the second window's partitioning."""
    from data_pengadaan_agent_spark.operators.relational import scd2_history

    plan = scd2_history(tables["events"])._jdf.queryExecution().executedPlan().toString()
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 1, plan[:2000]


def test_ivf_drift_flags_skew_and_low_cos(spark):
    """A shard dumped onto one centroid must trip that centroid's
    occupancy flag; vectors far from every centroid must trip the
    mean_cos floor; a balanced on-centroid corpus trips nothing."""
    from data_pengadaan_agent_spark.operators.similarity import ivf_drift_report

    cents = [(0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0])]
    balanced = spark.createDataFrame(
        [(i, [1.0, 0.01 * i, 0.0]) for i in range(4)]
        + [(10 + i, [0.01 * i, 1.0, 0.0]) for i in range(4)],
        "vec_id long, embedding array<double>",
    )
    rep = {r["centroid_id"]: r for r in ivf_drift_report(
        balanced, cents, cos_floor=0.5, skew_ceiling=1.5).collect()}
    assert not rep[0]["retrain"] and not rep[1]["retrain"]
    assert rep[0]["n_vecs"] == 4 and abs(rep[0]["occupancy_ratio"] - 1.0) < 1e-9

    skewed = spark.createDataFrame(
        [(i, [1.0, 0.001 * i, 0.0]) for i in range(9)]
        + [(100, [0.0, 1.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    rep = {r["centroid_id"]: r for r in ivf_drift_report(
        skewed, cents, cos_floor=0.5, skew_ceiling=1.5).collect()}
    assert rep[0]["retrain"] and rep[0]["occupancy_ratio"] == 1.8

    drifted = spark.createDataFrame(
        [(i, [0.1, 0.1, 1.0]) for i in range(4)],  # orthogonal-ish
        "vec_id long, embedding array<double>",
    )
    rep = ivf_drift_report(drifted, cents, cos_floor=0.5).collect()
    # every vector ties to cid 0 -> cid 1 is DEAD and reported as such
    assert all(r["retrain"] for r in rep)
    assert all(r["mean_cos"] < 0.5 for r in rep if r["n_vecs"] > 0)
    assert {r["centroid_id"]: r["n_vecs"] for r in rep} == {0: 4, 1: 0}


def test_ivf_drift_reports_dead_centroids(spark):
    """A centroid with ZERO assigned vectors must still appear —
    n_vecs=0, NULL mean_cos, occupancy 0, retrain=true. A dead
    inverted list is drift evidence, not a row to drop."""
    from data_pengadaan_agent_spark.operators.similarity import ivf_drift_report

    cents = [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [-1.0, 0.0])]
    df = spark.createDataFrame(
        [(i, [1.0, 0.01 * i]) for i in range(4)],  # everything near cid 0
        "vec_id long, embedding array<double>",
    )
    rep = {r["centroid_id"]: r for r in ivf_drift_report(df, cents).collect()}
    assert set(rep) == {0, 1, 2}
    for dead in (1, 2):
        r = rep[dead]
        assert r["n_vecs"] == 0 and r["mean_cos"] is None
        assert r["occupancy_ratio"] == 0.0 and r["retrain"]
    assert rep[0]["n_vecs"] == 4 and rep[0]["occupancy_ratio"] == 3.0


def test_ivf_drift_rejects_bad_codebooks(spark):
    """Empty codebook and duplicate centroid ids raise clearly at
    call time; a vector/codebook dim mismatch raises a clear
    ValueError from the kernel instead of an opaque numpy error."""
    import pytest

    from data_pengadaan_agent_spark.operators.similarity import ivf_drift_report

    df = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="empty centroid"):
        ivf_drift_report(df, [])
    with pytest.raises(ValueError, match="duplicate centroid"):
        ivf_drift_report(df, [(0, [1.0, 0.0, 0.0]), (0, [0.0, 1.0, 0.0])])
    with pytest.raises(Exception, match="dim"):
        ivf_drift_report(df, [(0, [1.0, 0.0])]).collect()


def test_mmr_prefers_diverse_over_redundant(spark):
    """Two near-identical top matches + one diverse runner-up: pure
    relevance ranks the twins 1-2, but MMR at λ=0.5 must take the
    diverse doc second. λ=1.0 degenerates to pure relevance."""
    from data_pengadaan_agent_spark.operators.similarity import mmr_diversify

    q = [1.0, 0.0, 0.0, 0.0]
    rows = [
        (1, [1.0, 0.05, 0.0, 0.0]),   # rel ~1, twin of 2
        (2, [1.0, 0.06, 0.0, 0.0]),   # rel ~1, twin of 1
        (3, [0.7, 0.0, 0.7, 0.0]),    # rel ~0.7, diverse
        (4, [0.1, 0.0, 0.0, 1.0]),    # low rel
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    mmr = [r["vec_id"] for r in mmr_diversify(df, q, k=3, pool=4, lam=0.5)
           .orderBy("rank").collect()]
    assert mmr[0] == 1 and mmr[1] == 3  # diverse doc displaces the twin
    pure = [r["vec_id"] for r in mmr_diversify(df, q, k=3, pool=4, lam=1.0)
            .orderBy("rank").collect()]
    assert pure[:2] == [1, 2]


def test_mmr_rank1_ties_break_to_lowest_id(spark):
    from data_pengadaan_agent_spark.operators.similarity import mmr_diversify

    q = [1.0, 0.0]
    df = spark.createDataFrame(
        [(5, [2.0, 0.0]), (3, [1.0, 0.0]), (9, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )  # ids 5 and 3 both have rel 1.0 (cosine ignores magnitude)
    out = mmr_diversify(df, q, k=2, pool=3, lam=0.7).orderBy("rank").collect()
    assert out[0]["vec_id"] == 3 and out[0]["mmr_score"] == 1.0


def test_ivf_drift_near_tie_assigns_lowest_cid(spark):
    """VERDICT r9 ask #2: the cluster assignment must be drift-proof
    on near-ties. Distances are rounded to 6dp BEFORE the argmin, so
    (a) a sub-1e-6 distance gap collapses to an exact tie broken by
    the LOWEST centroid id regardless of codebook input order, and
    (b) an exact geometric tie does the same. The cross-engine margin
    itself (no unrounded distance within drift of a rounding half) is
    certified on the real fixtures by tools/audit_round_boundaries.py's
    ivf_drift_report.assignment probe."""
    from data_pengadaan_agent_spark.operators.similarity import ivf_drift_report

    # exact tie: v is equidistant from both centroids
    cents_desc = [(7, [0.0, 1.0]), (3, [1.0, 0.0])]  # ids out of order
    v = spark.createDataFrame(
        [(1, [0.5, 0.5])], "vec_id long, embedding array<double>"
    )
    rep = {r["centroid_id"]: r["n_vecs"] for r in
           ivf_drift_report(v, cents_desc).collect()}
    assert rep == {3: 1, 7: 0}

    # near-tie UNDER the rounding grid: d differs by ~2e-8 < 0.5e-6,
    # so the rounded distances tie and the lower id must win even
    # though the HIGHER id is geometrically (imperceptibly) closer
    eps = 1e-8
    cents = [(2, [1.0, 0.0]), (5, [1.0 + eps, 0.0])]
    v2 = spark.createDataFrame(
        [(1, [1.0 + eps, 0.0])], "vec_id long, embedding array<double>"
    )
    rep2 = {r["centroid_id"]: r["n_vecs"] for r in
            ivf_drift_report(v2, cents).collect()}
    assert rep2 == {2: 1, 5: 0}

    # and a gap ABOVE the grid resolves geometrically, not by id
    cents3 = [(2, [1.0, 0.0]), (5, [0.0, 1.0])]
    v3 = spark.createDataFrame(
        [(1, [0.1, 1.0])], "vec_id long, embedding array<double>"
    )
    rep3 = {r["centroid_id"]: r["n_vecs"] for r in
            ivf_drift_report(v3, cents3).collect()}
    assert rep3 == {2: 0, 5: 1}

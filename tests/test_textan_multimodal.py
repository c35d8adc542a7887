"""Text analysis + multimodal plumbing."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pengadaan_agent_spark.operators import multimodal as M
from data_pengadaan_agent_spark.operators import textan as X


def test_token_count(spark):
    df = spark.createDataFrame([(1, "Hello world foo"), (2, "one")], "doc_id LONG, text STRING")
    out = {r["doc_id"]: (r["n_tokens"], r["n_bpe_est"]) for r in X.token_count(df).collect()}
    assert out[1] == (3, 4)  # ceil(15/4)
    assert out[2] == (1, 1)


def test_quality_score_bounds(tables):
    rows = X.quality_score(tables["documents"]).collect()
    assert all(0.0 <= r["quality_score"] <= 1.0 for r in rows)
    assert all(0.0 <= r["stopword_ratio"] <= 1.0 for r in rows)


def test_language_id_markers(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog of the house"),
            (2, "der hund und die katze und der vogel"),
            (3, "le chat et la maison et le chien"),
            (4, "xyzzy plugh qwerty"),
        ],
        "doc_id LONG, text STRING",
    )
    out = {r["doc_id"]: r["lang_pred"] for r in X.language_id(df).collect()}
    assert out == {1: "en", 2: "de", 3: "fr", 4: "und"}


def test_fingerprint_order_sensitive(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c"), (3, "c b a")], "doc_id LONG, text STRING"
    )
    out = {r["doc_id"]: r["fingerprint"] for r in X.fingerprint(df).collect()}
    assert out[1] == out[2]
    assert out[1] != out[3]


def test_winnow_selection_law(spark):
    """MOSS winnowing pins: (1) all-tie hashes select the RIGHTMOST
    position of each window; (2) a doc shorter than w+k-1 tokens
    emits nothing; (3) every full window contains >=1 selected
    position (the coverage guarantee); (4) the detection guarantee —
    a shared run of >= w+k-1 tokens yields an identical selected
    (hash) in both documents."""
    df = spark.createDataFrame(
        [
            (1, "a a a a a a"),
            (2, "a b"),
            (3, "p q r s t u v w x y z"),
            (4, "m n p q r s t u o k l"),  # shares "p q r s t u" with 3
        ],
        "doc_id LONG, text STRING",
    )
    out = X.winnow_fingerprints(df, k=1, w=3).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append((r["fp_pos"], r["fp_hash"]))
    assert sorted(p for p, _ in by_doc[1]) == [2, 3, 4, 5]  # rightmost ties
    assert 2 not in by_doc  # below the w+k-1 = 3 token threshold
    for doc in (3, 4):  # coverage: every window [t-2, t] has a pick
        picks = sorted(p for p, _ in by_doc[doc])
        for t in range(2, 11):
            assert any(t - 2 <= p <= t for p in picks), (doc, t, picks)
    # detection: k=4, w=3 -> shared 6-token run guarantees a common hash
    out2 = X.winnow_fingerprints(df.filter(F.col("doc_id").isin(3, 4)), k=4, w=3)
    hashes = {}
    for r in out2.collect():
        hashes.setdefault(r["doc_id"], set()).add(r["fp_hash"])
    assert hashes[3] & hashes[4]


def test_winnow_matches_localizes_shared_span(spark):
    """Two corpora sharing one long token run at DIFFERENT offsets:
    the pair must be reported, and each side's span extent must sit
    inside its own doc's copy of the run (localization, not just
    pairing). An unrelated doc pairs with nothing."""
    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    a = spark.createDataFrame(
        [(1, shared + " ending words here"), (2, "totally unrelated text stream")],
        "doc_id LONG, text STRING",
    )
    b = spark.createDataFrame(
        [(10, "front padding tokens first " + shared)],
        "doc_id LONG, text STRING",
    )
    out = X.winnow_matches(a, b, k=3, w=3, max_df=50, min_shared=1).collect()
    pairs = {(r["a_id"], r["b_id"]): r for r in out}
    assert (1, 10) in pairs and (2, 10) not in pairs
    r = pairs[(1, 10)]
    # shared run = 10 tokens => 8 k-grams at k=3; A's copy starts at
    # pos 0, B's at pos 4 (4 padding tokens) — spans must respect it
    assert r["n_shared"] >= 1
    assert 0 <= r["a_span_start"] <= r["a_span_end"] <= 7
    assert 4 <= r["b_span_start"] <= r["b_span_end"] <= 11


def test_winnow_matches_max_df_drops_boilerplate(spark):
    """A k-gram run shared by MANY docs (license-header shape) must
    be excluded by the document-frequency cap: with max_df below the
    count of docs carrying it, no pairs survive; with a generous cap
    the quadratic pair set appears."""
    boiler = "standard license header text appears verbatim everywhere always"
    a = spark.createDataFrame(
        [(i, boiler) for i in range(6)], "doc_id LONG, text STRING"
    )
    b = spark.createDataFrame(
        [(100 + i, boiler) for i in range(6)], "doc_id LONG, text STRING"
    )
    none = X.winnow_matches(a, b, k=3, w=3, max_df=5, min_shared=1).count()
    assert none == 0
    allpairs = X.winnow_matches(a, b, k=3, w=3, max_df=50, min_shared=1).count()
    assert allpairs == 36


def test_winnow_rejects_bad_params(spark):
    import pytest

    df = spark.createDataFrame([(1, "a b c")], "doc_id LONG, text STRING")
    with pytest.raises(ValueError, match="k and w"):
        X.winnow_fingerprints(df, k=0, w=4)


def test_dup_spans_exact_substring_semantics(spark):
    """Lee et al. 2021 ExactSubstr pins: (1) a 12-token run shared by
    two docs at DIFFERENT offsets yields one span per doc covering
    exactly the shared tokens; (2) a doc shorter than `length` tokens
    emits nothing; (3) a WITHIN-doc repeat counts (the corpus-global
    occurrence count includes same-doc positions); (4) the xxhash64
    production path selects identical spans."""
    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu"
    rows = [
        (1, shared + " unique tail one two three four"),
        (2, "front pad tokens " + shared),
        (3, "short doc"),
        # one 8-token phrase repeated twice inside one doc, split by
        # an 9-token unique spacer (> length, so runs stay separate)
        (4, "r1 r2 r3 r4 r5 r6 r7 r8 "
            "u1 u2 u3 u4 u5 u6 u7 u8 u9 "
            "r1 r2 r3 r4 r5 r6 r7 r8"),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    for arith in (True, False):
        spans = {
            r["doc_id"]: (r["span_start"], r["span_end"], r["span_len"])
            for r in X.dup_spans(df, length=8, arith_hash=arith).collect()
        }
        # doc1's copy starts at 0, doc2's at 3 (3 pad tokens); 12-token
        # run => grams at [start, start+4], span covers start..start+11
        assert spans[1] == (0, 11, 12)
        assert spans[2] == (3, 14, 12)
        assert 3 not in spans
        # doc4: both copies of the 8-token phrase are flagged; the
        # 9-token spacer keeps them as two runs — so TWO span rows
        d4 = [
            (r["span_start"], r["span_end"])
            for r in X.dup_spans(df, length=8, arith_hash=arith)
            .filter(F.col("doc_id") == 4)
            .collect()
        ]
        assert sorted(d4) == [(0, 7), (17, 24)]


def test_dup_spans_gap_merge_and_min_count(spark):
    """(1) Two duplicated grams at distance <= length merge into ONE
    maximal span; (2) min_count=3 ignores content duplicated only
    twice."""
    # docs 1 and 2 share two 4-gram phrases separated by DIFFERENT
    # 2-token spacers: gram positions 0 and 6 (gap 6 > length 4? no:
    # pos 6 <= 0 + ... ) — use explicit construction instead:
    # shared grams at positions 0 and 4 (gap = length) must merge.
    d1 = "s1 s2 s3 s4 x1 x2 x3 x4 s5 s6 s7 s8"
    d2 = "s1 s2 s3 s4 y1 y2 y3 y4 s5 s6 s7 s8"
    df = spark.createDataFrame(
        [(1, d1), (2, d2)], "doc_id LONG, text STRING"
    )
    out = X.dup_spans(df, length=4).collect()
    spans = {}
    for r in out:
        spans.setdefault(r["doc_id"], []).append(
            (r["span_start"], r["span_end"])
        )
    # duplicated grams per doc: pos 0 (s1..s4) and pos 8 (s5..s8);
    # 8 > 0 + 4 so they must stay TWO separate spans
    assert sorted(spans[1]) == [(0, 3), (8, 11)]
    assert sorted(spans[2]) == [(0, 3), (8, 11)]
    # adjacent case: shift the second phrase to start right after the
    # first (positions 0..3 then 4..7) in two docs -> ONE merged span
    e1 = "t1 t2 t3 t4 t5 t6 t7 t8 z1 z2"
    e2 = "t1 t2 t3 t4 t5 t6 t7 t8 w1 w2"
    df2 = spark.createDataFrame(
        [(1, e1), (2, e2)], "doc_id LONG, text STRING"
    )
    out2 = X.dup_spans(df2, length=4).collect()
    spans2 = {r["doc_id"]: (r["span_start"], r["span_end"]) for r in out2}
    assert spans2 == {1: (0, 7), 2: (0, 7)}
    assert len(out2) == 2  # exactly one merged span per doc
    # min_count=3: the pair above is duplicated only twice -> empty
    assert X.dup_spans(df2, length=4, min_count=3).count() == 0
    import pytest

    with pytest.raises(ValueError, match="min_count"):
        X.dup_spans(df2, length=4, min_count=1)


def test_dup_span_stats_and_strip(spark):
    """Stats: dup_tokens sums DISJOINT merged spans and zero-span docs
    report 0-ppm rows. Strip: cleaned text = original tokens minus
    span tokens in order; a fully-duplicated doc strips to empty."""
    shared = "c1 c2 c3 c4 c5 c6 c7 c8"
    df = spark.createDataFrame(
        [
            (1, shared),                          # fully duplicated
            (2, "head tok " + shared + " tail"),  # partial
            (3, "nothing duplicated here at all"),
        ],
        "doc_id LONG, text STRING",
    )
    stats = {r["doc_id"]: r for r in X.dup_span_stats(df, length=8).collect()}
    assert stats[1]["dup_tokens"] == 8 and stats[1]["dup_ppm"] == 1000000
    assert stats[2]["n_tokens"] == 11 and stats[2]["dup_tokens"] == 8
    assert stats[2]["dup_ppm"] == (1000000 * 8) // 11
    assert stats[3]["dup_tokens"] == 0 and stats[3]["dup_ppm"] == 0
    clean = {r["doc_id"]: r for r in X.strip_dup_spans(df, length=8).collect()}
    assert clean[1]["clean_text"] == "" and clean[1]["kept_tokens"] == 0
    assert clean[2]["clean_text"] == "head tok tail"
    assert clean[2]["kept_tokens"] == 3 and clean[2]["n_tokens"] == 11
    assert clean[3]["clean_text"] == "nothing duplicated here at all"


def test_lexical_diversity_exact_values(spark):
    """Hand-computed TTR / hapax / Simpson on a 4-token doc, plus the
    single-token edge (simpson_ppm defined 0)."""
    df = spark.createDataFrame(
        [(1, "a a b c"), (2, "solo")], "doc_id LONG, text STRING"
    )
    out = {r["doc_id"]: r for r in X.lexical_diversity(df).collect()}
    r1 = out[1]
    assert (r1["n_tokens"], r1["n_types"], r1["n_hapax"]) == (4, 3, 2)
    assert r1["ttr_ppm"] == (1000000 * 3) // 4
    assert r1["hapax_ppm"] == (1000000 * 2) // 3
    assert r1["simpson_ppm"] == (1000000 * 2) // (4 * 3)  # only 'a' repeats
    r2 = out[2]
    assert (r2["n_tokens"], r2["n_types"], r2["simpson_ppm"]) == (1, 1, 0)
    assert r2["ttr_ppm"] == 1000000 and r2["hapax_ppm"] == 1000000


def test_derive_filtered_keywords(spark):
    df = spark.createDataFrame(
        [(1, "Belanja ALAT Tulis", "alat tulis untuk the kantor!")],
        "id LONG, a STRING, b STRING",
    )
    out = X.derive_filtered_keywords(df, ["a", "b"]).first()["filtered_keywords"]
    toks = out.split(",")
    assert "belanja" in toks and "alat" in toks and "kantor" in toks
    assert "the" not in toks  # stopword stripped
    assert len(toks) == len(set(toks))  # de-duplicated


def test_media_feature_extraction(spark):
    media = M.synthesize_media(spark, n=30)
    feats = M.extract_image_features(media).collect()
    assert len(feats) == sum(1 for r in media.collect() if r["media_type"] == "image")
    assert all(len(r["features"]) == 8 for r in feats)
    # deterministic: same id → same features
    again = {r["media_id"]: r["features"] for r in M.extract_image_features(media).collect()}
    assert all(again[r["media_id"]] == r["features"] for r in feats)


def test_resize_plan_aspect_ratio(spark):
    media = M.synthesize_media(spark, n=10)
    out = M.resize_plan(media, max_side=100).collect()
    for r in out:
        assert max(r["target_width"], r["target_height"]) <= 101  # rounding slack
        assert r["target_width"] > 0 and r["target_height"] > 0


def test_frame_sampling(spark):
    media = M.synthesize_media(spark, n=12)
    frames = M.sample_frames(media, every_ms=5000).collect()
    vids = {r["media_id"]: r["duration_ms"] for r in media.collect() if r["media_type"] == "video"}
    assert len(frames) == sum(dur // 5000 + 1 for dur in vids.values())


def test_chunk_text_spans_and_overlap(tables):
    from data_pengadaan_agent_spark.operators.textan import chunk_text

    docs = tables["documents"].filter("doc_id < 20")
    out = chunk_text(docs, chunk_chars=100, overlap=20).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    src = {r["doc_id"]: r["text"] for r in docs.collect()}
    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: r["chunk_idx"])
        text = src[doc_id]
        for r in rows:
            assert r["chunk"] == text[r["start"]: r["start"] + 100]
            assert r["chunk_end"] == min(r["start"] + 100, len(text))
        # neighbors overlap by exactly chunk_chars - step = 20 chars
        for a, b in zip(rows, rows[1:]):
            assert b["start"] - a["start"] == 80
        # full coverage: last chunk reaches the end of the document
        assert rows[-1]["chunk_end"] == len(text)


def test_chunk_text_rejects_bad_overlap(tables):
    import pytest as _pytest

    from data_pengadaan_agent_spark.operators.textan import chunk_text

    with _pytest.raises(ValueError):
        chunk_text(tables["documents"], chunk_chars=50, overlap=50)


def test_repetition_stats(spark):
    df = spark.createDataFrame(
        [
            (1, "a a a a"),          # one word repeated 4x
            (2, "a b c d"),          # all distinct
            (3, "x y x y x y"),      # repeated 2-gram "x y"/"y x"
        ],
        "doc_id LONG, text STRING",
    )
    out = {r["doc_id"]: r for r in X.repetition_stats(df).collect()}
    assert out[1]["dup_word_frac"] == 0.75 and out[1]["top_word_frac"] == 1.0
    assert out[1]["dup_2gram_frac"] == 1.0  # "a a" x3
    assert out[2]["dup_word_frac"] == 0.0 and out[2]["dup_2gram_frac"] == 0.0
    # doc 3: 2-grams = x y, y x, x y, y x, x y -> all occurrences duplicated
    assert out[3]["dup_2gram_frac"] == 1.0 and out[3]["top_2gram_frac"] == 0.6


def test_ngram_contamination(spark):
    test = spark.createDataFrame(
        [(10, "one two three four unseen"), (20, "nope nada zilch")],
        "doc_id LONG, text STRING",
    )
    train = spark.createDataFrame(
        [(1, "zero one two three four five")], "doc_id LONG, text STRING"
    )
    out = {r["doc_id"]: r for r in X.ngram_contamination(test, train, n=3).collect()}
    # doc 10 has 3-grams: "one two three", "two three four", "three four unseen"
    assert out[10]["n_ngrams"] == 3 and out[10]["n_overlap"] == 2
    assert out[10]["contaminated"] is True
    assert out[20]["n_ngrams"] == 1 and out[20]["n_overlap"] == 0
    assert out[20]["contaminated"] is False


def test_ngram_contamination_short_doc_excluded(spark):
    test = spark.createDataFrame([(1, "too short")], "doc_id LONG, text STRING")
    train = spark.createDataFrame([(2, "a b c d e f")], "doc_id LONG, text STRING")
    assert X.ngram_contamination(test, train, n=5).count() == 0


def test_normalize_text(spark):
    df = spark.createDataFrame(
        [(1, "  Hello,   WORLD!! (v2.1) ")], "doc_id LONG, text STRING"
    )
    r = X.normalize_text(df).first()
    assert r["text_norm"] == "hello world v2 1"
    assert r["n_chars_norm"] == len("hello world v2 1")


def test_pack_sequences_invariants(spark, tables):
    out = X.pack_sequences(tables["documents"], budget=512, shards=8).collect()
    assert len(out) == tables["documents"].count()
    by_bin = {}
    for r in out:
        assert 0 <= r["shard"] < 8 and r["offset"] < 512
        by_bin.setdefault((r["shard"], r["bin_id"]), []).append(r)
    # first-fit-by-offset: every bin's START offsets stay under budget,
    # and total tokens overflow the budget by at most one document
    for rows in by_bin.values():
        rows.sort(key=lambda r: r["offset"])
        total = sum(r["n_tokens"] for r in rows)
        assert total - rows[-1]["n_tokens"] < 512


def test_resample_ffill_fills_gaps(spark):
    from data_pengadaan_agent_spark.operators.relational import resample_ffill

    df = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00", 5.0),
            (1, "2024-01-03 09:00:00", 7.0),   # Jan 2 is a gap
            (2, "2024-01-05 00:30:00", 1.0),
        ],
        "user_id LONG, ts STRING, value DOUBLE",
    ).withColumn("ts", F.to_timestamp("ts"))
    rows = {(r["user_id"], str(r["slot"])[:10]): r
            for r in resample_ffill(df, "user_id", "ts", "value", step="day").collect()}
    assert len(rows) == 4  # u1: 3 days, u2: 1 day
    gap = rows[(1, "2024-01-02")]
    assert gap["value_ffill"] == 5.0 and gap["observed"] is False
    assert rows[(1, "2024-01-03")]["value_ffill"] == 7.0
    assert rows[(2, "2024-01-05")]["observed"] is True


def test_token_rarity_semantics(spark):
    """Docs made of corpus-rare tokens must out-score docs of common
    tokens; rarity_sum/n_tokens arithmetic is exact."""
    from data_pengadaan_agent_spark.operators.textan import token_rarity

    docs = spark.createDataFrame(
        [(1, "common common common"), (2, "common rareword common"), (3, "")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in token_rarity(docs).collect()}
    assert 3 not in got  # token-free doc vanishes
    # corpus: common x5, rareword x1, total 6
    # rarity(common) = 6e6 DIV 5 = 1_200_000; rarity(rareword) = 6_000_000
    assert got[1]["rarity_sum"] == 3 * 1_200_000
    assert got[2]["rarity_sum"] == 2 * 1_200_000 + 6_000_000
    assert got[2]["mean_rarity"] > got[1]["mean_rarity"]
    for r in got.values():
        assert r["mean_rarity"] == r["rarity_sum"] / r["n_tokens"]


def test_decontaminate_train_drops_overlap(spark):
    """A train doc sharing a 3-gram with the eval set is dropped; a
    clean doc and a too-short-for-ngrams doc both survive."""
    from data_pengadaan_agent_spark.operators.textan import decontaminate_train

    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over lazy dogs"),
            (2, "completely unrelated training content here"),
            (3, "too short"),
        ],
        "doc_id long, text string",
    )
    test = spark.createDataFrame(
        [(100, "benchmark asks about the quick brown fox today")],
        "doc_id long, text string",
    )
    kept = sorted(
        r["doc_id"] for r in decontaminate_train(train, test, n=3).collect()
    )
    assert kept == [2, 3]


def test_decontaminate_train_threshold_and_negative_guard(spark):
    """Optimization r14: the contaminated-id set comes from the overlap
    core's hits aggregate directly (zero-overlap docs have no hits row,
    n_overlap 0 on the old audit path — same survivors for every
    max_overlap >= 0). Pin the threshold boundary (doc 1 shares exactly
    two 3-grams: 'the quick brown', 'quick brown fox' — dropped at
    max_overlap=1, kept at 2) and the loud rejection of the negative
    max_overlap the hits-only path cannot express."""
    import pytest

    from data_pengadaan_agent_spark.operators.textan import decontaminate_train

    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over lazy dogs"),
            (2, "completely unrelated training content here"),
        ],
        "doc_id long, text string",
    )
    test = spark.createDataFrame(
        [(100, "benchmark asks about the quick brown fox today")],
        "doc_id long, text string",
    )
    at1 = sorted(
        r["doc_id"]
        for r in decontaminate_train(train, test, n=3, max_overlap=1).collect()
    )
    at2 = sorted(
        r["doc_id"]
        for r in decontaminate_train(train, test, n=3, max_overlap=2).collect()
    )
    assert at1 == [2] and at2 == [1, 2]
    with pytest.raises(ValueError, match="max_overlap"):
        decontaminate_train(train, test, n=3, max_overlap=-1)


def test_boilerplate_ngrams_flags_shared_trigrams(spark):
    """A 3-gram in >=2 distinct docs is boilerplate; per-doc fractions
    count DISTINCT n-grams; docs shorter than n are absent."""
    from data_pengadaan_agent_spark.operators.textan import boilerplate_ngrams

    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c x"), (3, "q r")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in boilerplate_ngrams(docs, n=3, min_docs=2).collect()}
    assert 3 not in got  # too short for any 3-gram
    for d in (1, 2):
        assert got[d]["n_ngrams"] == 2
        assert got[d]["n_boiler"] == 1  # only "a b c" is shared
        assert got[d]["boilerplate_frac"] == 0.5
        assert got[d]["mostly_boilerplate"] is True


def test_length_outlier_band_exact_percentiles(spark):
    """Band bounds are exact linear-interpolated percentiles over the
    corpus; docs outside [p10, p90] are flagged out of band."""
    from data_pengadaan_agent_spark.operators.textan import length_outlier_band

    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * i)) for i in range(1, 11)],
        "doc_id long, text string",
    )
    rows = length_outlier_band(docs, p_lo=0.10, p_hi=0.90).collect()
    by_id = {r["doc_id"]: r for r in rows}
    # counts 1..10: p10 = 1 + 0.9*(2-1) = 1.9, p90 = 9 + 0.1*(10-9) = 9.1
    assert by_id[5]["p_lo"] == 1.9 and by_id[5]["p_hi"] == 9.1
    assert {r["doc_id"] for r in rows if not r["in_band"]} == {1, 10}
    assert {r["doc_id"] for r in rows if r["in_band"]} == set(range(2, 10))


def test_corpus_report_datasheet(spark):
    """Per-source rollup: dup_rate counts exact content dups, mean and
    median are exact, language spread counts distinct lang codes."""
    from data_pengadaan_agent_spark.operators.textan import corpus_report

    docs = spark.createDataFrame(
        [
            (1, "a b c", "en", "s1", 5),
            (2, "a b c", "en", "s1", 5),   # exact dup within s1
            (3, "d e f g", "de", "s1", 7),
            (4, "x", "en", "s2", 1),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = {r["source"]: r for r in corpus_report(docs).collect()}
    s1 = got["s1"]
    assert (s1["n_docs"], s1["n_distinct_texts"], s1["n_langs"]) == (3, 2, 2)
    assert abs(s1["dup_rate"] - round(1 / 3, 6)) < 1e-9
    assert s1["n_tokens_total"] == 10 and s1["mean_tokens"] == round(10 / 3, 6)
    assert s1["median_tokens"] == 3.0  # counts 3,3,4 -> exact median 3
    s2 = got["s2"]
    assert (s2["n_docs"], s2["dup_rate"], s2["median_tokens"]) == (1, 0.0, 1.0)


def test_dsir_importance_selects_target_like_docs(spark):
    """DSIR (Xie et al. 2023): raw docs whose hashed-bigram
    distribution matches the target corpus must outscore off-target
    docs, and keep_frac selects exactly the top fraction."""
    from data_pengadaan_agent_spark.operators.textan import dsir_importance

    target = spark.createDataFrame(
        [
            (1, "the theory of relativity explains gravity and light"),
            (2, "the theory of evolution explains species and change"),
            (3, "the physics of motion explains force and energy"),
        ],
        "doc_id long, text string",
    )
    raw = spark.createDataFrame(
        [
            (10, "the theory of gravity explains motion and force"),
            (11, "buy cheap pills online click here win big money"),
            (12, "the physics of light explains energy and change"),
            (13, "limited offer click now free prize claim today"),
            (14, "word"),  # < n words: no bigrams, drops out
        ],
        "doc_id long, text string",
    )
    out = dsir_importance(raw, target, n=2, n_buckets=1024, keep_frac=0.5)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert set(rows) == {10, 11, 12, 13}  # doc 14 has no features
    # n_feats = words - 1 bigrams, counted with multiplicity
    assert rows[10]["n_feats"] == 7 and rows[11]["n_feats"] == 8
    assert rows[12]["n_feats"] == 7 and rows[13]["n_feats"] == 7
    assert rows[10]["avg_log_ratio"] > rows[11]["avg_log_ratio"]
    assert rows[12]["avg_log_ratio"] > rows[13]["avg_log_ratio"]
    assert rows[10]["keep"] and rows[12]["keep"]
    assert not rows[11]["keep"] and not rows[13]["keep"]
    # deterministic: a second run produces identical values
    again = {r["doc_id"]: r for r in out.collect()}
    assert {k: v["avg_log_ratio"] for k, v in rows.items()} == {
        k: v["avg_log_ratio"] for k, v in again.items()
    }


def test_quality_classifier_separates_pos_neg(spark):
    """fastText-style linear quality scorer (the CCNet/RedPajama
    'quality classifier' slot): Naive-Bayes log-odds weights trained
    on labeled pos/neg corpora must score held-out target-like docs
    above spam-like docs, with an absolute threshold usable per-doc
    (no corpus percentile)."""
    from data_pengadaan_agent_spark.operators.textan import (
        quality_classifier,
        train_quality_weights,
    )

    pos = spark.createDataFrame(
        [
            (1, "the theory of relativity explains gravity and light"),
            (2, "the theory of evolution explains species and change"),
            (3, "the physics of motion explains force and energy"),
        ],
        "doc_id long, text string",
    )
    neg = spark.createDataFrame(
        [
            (4, "buy cheap pills online click here win big money"),
            (5, "limited offer click now free prize claim today"),
            (6, "win money now cheap prize online offer click"),
        ],
        "doc_id long, text string",
    )
    held_out = spark.createDataFrame(
        [
            (10, "the theory of gravity explains motion and force"),
            (11, "buy cheap pills online win free money today"),
            (12, "completely unseen vocabulary of novel tokens entirely"),
            (13, "word"),  # < n tokens: no features, no verdict row
        ],
        "doc_id long, text string",
    )
    w = train_quality_weights(pos, neg, n=2, n_buckets=1024)
    out = quality_classifier(held_out, w, n=2, n_buckets=1024, threshold=0.0)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert set(rows) == {10, 11, 12}
    assert rows[10]["logit"] > 0 and rows[10]["keep"]
    assert rows[11]["logit"] < 0 and not rows[11]["keep"]
    # doc 12 is all-OOV: features count toward n_feats with weight 0,
    # so the logit is exactly 0 and the >= threshold gate keeps it
    assert rows[12]["n_feats"] == 6 and rows[12]["logit"] == 0.0
    assert rows[12]["keep"]
    # deterministic across executions
    again = {r["doc_id"]: r["logit"] for r in out.collect()}
    assert again == {k: v["logit"] for k, v in rows.items()}
    # weights are data: an externally-supplied table applies the same
    ext = spark.createDataFrame([(0, "1.5")], "b long, w string").select(
        "b", F.col("w").cast("decimal(28,9)").alias("w")
    )
    one = quality_classifier(held_out, ext, n=2, n_buckets=1, threshold=1.0)
    r1 = {r["doc_id"]: r for r in one.collect()}
    # every bigram folds to bucket 0 -> logit exactly 1.5 for all docs
    assert all(v["logit"] == 1.5 and v["keep"] for v in r1.values())


def test_bm25_retrieval_batch_ranks_by_relevance(spark):
    """Batched BM25: per query, docs matching more (and rarer) query
    terms rank first; docs sharing no term are absent; ranks are
    dense 1..k with id tie-breaks."""
    from data_pengadaan_agent_spark.operators.textan import (
        bm25_retrieval_batch,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),
            (2, "alpha epsilon zeta eta"),
            (3, "theta iota kappa mu"),
            (4, "alpha beta nu xi"),
        ],
        "doc_id long, text string",
    )
    queries = spark.createDataFrame(
        [(100, ["alpha", "beta"]), (200, ["theta"])],
        "qid long, terms array<string>",
    )
    out = bm25_retrieval_batch(queries, docs, k=3)
    rows = {(r["qid"], r["rank"]): r for r in out.collect()}
    # q100: docs 1 and 4 match both terms (beat doc 2's single rarer-
    # term match? no — 'beta' df=2 < 'alpha' df=3, two-term matches
    # win); doc 3 absent
    q100 = [rows[(100, i)]["doc_id"] for i in (1, 2, 3)]
    assert set(q100[:2]) == {1, 4} and q100[2] == 2
    assert (100, 4) not in rows  # k=3 cap and doc 3 never appears
    # q200: only doc 3 matches
    assert rows[(200, 1)]["doc_id"] == 3
    assert (200, 2) not in rows
    # determinism across executions
    again = {(r["qid"], r["rank"]): r["doc_id"] for r in out.collect()}
    assert again == {k: v["doc_id"] for k, v in rows.items()}


def test_bm25_retrieval_batch_plan_shape(spark):
    """Every join in the batched-BM25 plan broadcasts a query-batch-
    bounded side (vocabulary semi-join, query terms, document
    frequencies, 1-row stats) — corpus-sized rows are never the build
    or sort side of any join. The only shuffles are the tf/score
    aggregates and the final per-qid window."""
    from data_pengadaan_agent_spark.operators.textan import (
        bm25_retrieval_batch,
        tokens,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    queries = docs.filter(F.col("doc_id") % 50 == 0).select(
        F.col("doc_id").alias("qid"),
        F.slice(tokens("text"), 1, 3).alias("terms"),
    )
    df = bm25_retrieval_batch(queries, docs, k=5)
    df.collect()  # resolve AQE
    plan = df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert "SortMergeJoin" not in final
    assert "ShuffledHashJoin" not in final
    assert "BroadcastHashJoin" in final
    assert "LeftSemi" in final  # the vocabulary prune reaches the scan side


def test_quality_classifier_stateless_bit_parity(spark):
    """The per-row streaming twin must reproduce the batch operator
    BIT-exactly on organic data: same tokenization, same poly-hash
    buckets, scaled-integer weight sums equal to the DECIMAL path,
    same F.round at the edge. Any drift here would silently diverge
    a streaming ingest gate from the batch curation run."""
    from data_pengadaan_agent_spark.operators.textan import (
        quality_classifier,
        quality_classifier_stateless,
        train_quality_weights,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pos = docs.filter(F.col("doc_id") % 10 == 0)
    neg = docs.filter(F.col("doc_id") % 10 == 1)
    w = train_quality_weights(pos, neg, n=2, n_buckets=1024, arith_hash=True)
    batch = {
        r["doc_id"]: (r["n_feats"], r["logit"], r["keep"])
        for r in quality_classifier(
            docs, w, n=2, n_buckets=1024, threshold=0.0, arith_hash=True
        ).collect()
    }
    stream_form = {
        r["doc_id"]: (r["n_feats"], r["logit"], r["keep"])
        for r in quality_classifier_stateless(
            docs, w, n=2, n_buckets=1024, threshold=0.0
        ).collect()
    }
    assert len(batch) > 50
    assert stream_form == batch
    # carry columns pass through untouched
    carried = quality_classifier_stateless(
        docs, w, n=2, n_buckets=1024, carry=("text",)
    )
    assert carried.columns == ["doc_id", "n_feats", "logit", "keep", "text"]
    one = carried.filter(F.col("doc_id") == 3).collect()[0]
    orig = docs.filter(F.col("doc_id") == 3).collect()[0]
    assert one["text"] == orig["text"]


def test_quality_classifier_external_weights(spark):
    """'Weights are data, not code' (the train_quality_weights
    docstring claim, VERDICT r7 ask #7): a LITERAL (bucket, weight)
    frame simulating a foreign fastText/sklearn export — plain DOUBLE
    weights, no train_quality_weights lineage — must drive both the
    batch classifier and the stateless streaming twin identically,
    with OOV buckets contributing 0 weight but counting in n_feats."""
    from data_pengadaan_agent_spark.operators.textan import (
        _ngram_features,
        quality_classifier,
        quality_classifier_stateless,
    )

    docs = spark.createDataFrame(
        [
            (1, "astute falcon gliding"),   # bigrams → weight +1.5
            (2, "rancid sludge heap"),      # bigrams → weight -2.25
            (3, "qq zz"),                   # one bigram, NOT in the table
        ],
        "doc_id long, text string",
    )
    feats = _ngram_features(docs, "text", "doc_id", 2, 8192, True).collect()
    by_doc = {}
    for r in feats:
        by_doc.setdefault(r["doc_id"], set()).add(r["b"])
    assert len(by_doc[1]) == 2 and len(by_doc[2]) == 2 and len(by_doc[3]) == 1
    # foreign export: doc-1 buckets positive, doc-2 negative, doc-3 OOV
    wmap = {b: 1.5 for b in by_doc[1]}
    wmap.update({b: -2.25 for b in by_doc[2] if b not in wmap})
    foreign = spark.createDataFrame(
        [(int(b), float(w)) for b, w in sorted(wmap.items())],
        "b long, w double",
    )
    out = {
        r["doc_id"]: (r["n_feats"], r["logit"], r["keep"])
        for r in quality_classifier(
            docs, foreign, n=2, n_buckets=8192, threshold=0.0, arith_hash=True
        ).collect()
    }
    assert out[1] == (2, 1.5, True)
    assert out[2] == (2, -2.25, False)
    # OOV doc: zero weight, but its feature still counts (mean over 1)
    assert out[3] == (1, 0.0, True)
    # the stateless streaming twin ingests the same foreign table
    stream_form = {
        r["doc_id"]: (r["n_feats"], r["logit"], r["keep"])
        for r in quality_classifier_stateless(
            docs, foreign, n=2, n_buckets=8192, threshold=0.0
        ).collect()
    }
    assert stream_form == out


def test_quality_classifier_stateless_whitespace_edge_parity(spark):
    """Java-regex parity traps: Spark's trim strips only ASCII space,
    Java \\s excludes NBSP (Python's \\s eats it), and split keeps
    trailing empty tokens — text edged with tabs/newlines/NBSP must
    still score identically in batch and per-row form."""
    from data_pengadaan_agent_spark.operators.textan import (
        quality_classifier,
        quality_classifier_stateless,
    )

    nasty = spark.createDataFrame(
        [
            (1, "alpha beta gamma"),
            (2, "\talpha beta gamma\t"),      # tab-edged: trim keeps
            (3, "alpha beta gamma\n"),         # trailing newline
            (4, "alpha\u00a0beta gamma"),   # NBSP is NOT Java \s
            (5, " alpha  beta   gamma "),      # multi-space + trimmed
            (6, "alpha\x0bbeta\x0bgamma"),     # vertical tab IS Java \s
        ],
        "doc_id long, text string",
    )
    w = spark.createDataFrame([(0, "1.0")], "b long, w string").select(
        "b", F.col("w").cast("decimal(28,9)").alias("w")
    )
    batch = {
        r["doc_id"]: (r["n_feats"], r["logit"])
        for r in quality_classifier(
            nasty, w, n=2, n_buckets=1, threshold=0.0, arith_hash=True
        ).collect()
    }
    per_row = {
        r["doc_id"]: (r["n_feats"], r["logit"])
        for r in quality_classifier_stateless(
            nasty, w, n=2, n_buckets=1, threshold=0.0
        ).collect()
    }
    assert per_row == batch
    # the NBSP doc tokenizes as TWO Java tokens, not three
    assert batch[4][0] == 1 and batch[1][0] == 2
    # the \x0B doc tokenizes as THREE tokens (two bigrams)
    assert batch[6][0] == 2


def test_tokenizer_vertical_tab_oracle_parity(spark):
    """VERDICT r7 ask #5: Java's \\s is exactly [ \\t\\n\\x0B\\f\\r]
    but RE2's \\s EXCLUDES the vertical tab, so a '\\s+' oracle twin
    silently diverges on \\x0B-bearing text. Both sides now spell the
    class explicitly (Spark tokenizers + _DUCK_TOKS); this pins the
    shared spellings byte-for-byte on pathological literal rows."""
    import duckdb

    import __spark_entry__ as E
    from data_pengadaan_agent_spark.operators.textan import tokens

    rows = [
        (1, "alpha\x0bbeta gamma"),          # the armed landmine
        (2, "a\x0b\x0b b\tc\nd\fe\rf"),      # every Java-\s char mixed
        (3, "\x0b"),                          # separator-only text
        (4, "alpha beta"),              # NBSP: whitespace on NEITHER
        (5, " edge\x0b "),                    # trim(space-only) + \x0B
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["tk"]
        for r in df.select("doc_id", tokens("text").alias("tk")).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    want = {
        i: tk
        for i, tk in con.execute(
            f"SELECT doc_id, {E._DUCK_TOKS} FROM documents"
        ).fetchall()
    }
    assert got == want
    assert got[1] == ["alpha", "beta", "gamma"]
    assert got[4] == ["alpha beta"]


def test_dup_run_pairs_exact_localization(spark):
    """Diagonal-trick pins: (1) a shared 12-token run at shifted
    offsets reports EXACT [start, end] on both sides and the exact
    run length; (2) the same content appearing TWICE in b yields two
    rows (two diagonals); (3) a one-gram coincidental hit far from
    the run stays its own row and cannot inflate the real run's
    boundaries (the winnow_matches extent problem, solved exactly);
    (4) min_run filters it out; (5) xxhash64 path agrees."""
    run = "r1 r2 r3 r4 r5 r6 r7 r8 r9 r10 r11 r12"
    a = spark.createDataFrame(
        [(1, run + " tailx taily k1 k2 k3 k4")], "doc_id LONG, text STRING"
    )
    b = spark.createDataFrame(
        [
            (10, "p1 p2 " + run + " mid " + run),
            (11, "z1 k1 k2 k3 k4 z2"),  # small separate 4-gram hit
        ],
        "doc_id LONG, text STRING",
    )
    for arith in (True, False):
        rows = X.dup_run_pairs(a, b, length=4, arith_hash=arith).collect()
        got = {
            (r["a_id"], r["b_id"], r["a_start"], r["a_end"],
             r["b_start"], r["b_end"], r["run_tokens"])
            for r in rows
        }
        assert (1, 10, 0, 11, 2, 13, 12) in got     # first copy
        assert (1, 10, 0, 11, 15, 26, 12) in got    # second copy, own diagonal
        assert (1, 11, 14, 17, 1, 4, 4) in got      # the small exact hit
        assert len(got) == 3
        # min_run: only the 12-token runs survive
        big = X.dup_run_pairs(a, b, length=4, min_run=10, arith_hash=arith)
        assert {(r["b_start"], r["run_tokens"]) for r in big.collect()} == {
            (2, 12), (15, 12)
        }


def test_dup_run_pairs_max_df_guard(spark):
    """A gram shared by many docs on one side must be dropped before
    the pair join — same boilerplate law as winnow_matches."""
    boiler = "standard header text appears verbatim everywhere"
    a = spark.createDataFrame([(i, boiler) for i in range(6)], "doc_id LONG, text STRING")
    b = spark.createDataFrame([(100 + i, boiler) for i in range(6)], "doc_id LONG, text STRING")
    assert X.dup_run_pairs(a, b, length=3, max_df=5).count() == 0
    assert X.dup_run_pairs(a, b, length=3, max_df=50).count() == 36


def test_bpe_learn_merges_canonical_example(spark):
    """The Sennrich et al. running example: low/lower/newest/widest
    with frequencies learns (e,s) -> (es,t) -> (l,o) [the third is a
    7-7 tie between (l,o) and (o,w), broken lexicographically], and
    within-round counts match hand arithmetic."""
    from data_pengadaan_agent_spark.operators import bpe as B

    docs = spark.createDataFrame(
        [(i, w) for i, (w, n) in enumerate(
            [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
        ) for _ in range(n) for i in [i * 100 + _]],
        "doc_id LONG, text STRING",
    )
    got = [
        (r["rank"], r["x"], r["y"], r["pair_count"])
        for r in B.learn_bpe_merges(docs, k=3).orderBy("rank").collect()
    ]
    assert got == [(1, "e", "s", 9), (2, "es", "t", 9), (3, "l", "o", 7)]


def test_bpe_apply_and_greedy_overlap(spark):
    """(1) apply_bpe_merges replays the learned table on an UNSEEN
    word; (2) the fold is greedy left-to-right non-overlapping:
    'aaaa' + merge (a,a) segments to [aa, aa], never [a, aa, a];
    (3) the learner stops early when no pair remains."""
    from data_pengadaan_agent_spark.operators import bpe as B

    out = B.apply_bpe_merges(
        spark.createDataFrame([("lowest",), ("aaaa",)], "w string"),
        [("e", "s"), ("es", "t"), ("l", "o"), ("a", "a")],
    )
    segs = {r["w"]: r["syms"] for r in out.collect()}
    assert segs["lowest"] == ["lo", "w", "est"]
    assert segs["aaaa"] == ["aa", "aa"]
    tiny = spark.createDataFrame([(1, "ab")], "doc_id LONG, text STRING")
    merges = B.learn_bpe_merges(tiny, k=5).collect()
    assert [(r["rank"], r["x"], r["y"]) for r in merges] == [(1, "a", "b")]


def test_bpe_no_pairs_returns_empty_merge_table(spark):
    """ADVICE r9: a corpus of only single-character words has no
    adjacent pair in round 1 — the documented early stop must return
    an EMPTY frame with the contract schema, not IndexError."""
    from data_pengadaan_agent_spark.operators import bpe as B

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "d e")], "doc_id long, text string"
    )
    out = B.learn_bpe_merges(docs, k=3)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["rank", "x", "y", "pair_count"]
    assert [str(f.dataType) for f in out.schema.fields] == [
        "IntegerType()", "StringType()", "StringType()", "LongType()",
    ]


def test_bpe_twin_stops_with_spark_when_merges_exhaust(spark):
    """ADVICE r9: when merges exhaust before k (every word fully
    merged), Spark's loop breaks and emits fewer rows; the DuckDB twin
    must not emit all-NULL rows from the ungrouped min() of an empty
    pair table. k=3 over two-char words exhausts after rank 1-2."""
    import duckdb

    from data_pengadaan_agent_spark.operators import bpe as B
    from __spark_entry__ import _bpe_merges_sql

    rows = [(1, "ab ab cd"), (2, "ab cd")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        map(tuple, B.learn_bpe_merges(docs, k=3).collect())
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM (VALUES (1, 'ab ab cd'), "
        "(2, 'ab cd')) AS t(doc_id, text)"
    )
    want = sorted(map(tuple, con.execute(_bpe_merges_sql(k=3)).fetchall()))
    assert got == want
    # merges really exhausted early: fewer than k rows, none NULL
    assert 0 < len(got) < 3
    assert all(x is not None and y is not None for _, x, y, _ in got)


def test_bpe_return_vocab_segmentation(spark):
    """Encode-side product: the vocabulary after k merges, segmented
    by the same fold — no driver collection of the merge table."""
    from data_pengadaan_agent_spark.operators import bpe as B

    docs = spark.createDataFrame(
        [(1, "low low lower lowest"), (2, "low lower")],
        "doc_id long, text string",
    )
    vocab = {r["w"]: (r["n"], list(r["syms"])) for r in
             B.learn_bpe_merges(docs, k=2, return_vocab=True).collect()}
    merges = [(r["x"], r["y"]) for r in
              B.learn_bpe_merges(docs, k=2).orderBy("rank").collect()]
    # replay the learned merges by hand over 'low' and check the
    # vocab segmentation agrees (both come from the same fold)
    assert set(vocab) == {"low", "lower", "lowest"}
    assert vocab["low"][0] == 3 and vocab["lower"][0] == 2
    syms = list("low")
    for x, y in merges:
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == x and syms[i + 1] == y:
                out.append(x + y)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    assert vocab["low"][1] == syms


def test_collocations_exact_lift_and_guards(spark):
    """Hand-checked lift: a bigram that ALWAYS co-occurs scores
    1e6·N/(c1·c2) exactly; min_count drops hapax pairs (the PMI
    pathology); ties break on the bigram string; python replay of the
    integer recipe."""
    from data_pengadaan_agent_spark.operators import textan as X

    rows = [
        (1, "new york new york new york"),
        (2, "san francisco san francisco"),
        (3, "york new san the the the the"),
        (4, "rare pair"),  # hapax bigram: min_count must drop it
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    got = X.collocations(df, k=10, min_count=2).collect()
    by_bg = {r["bigram"]: r for r in got}
    assert "rare pair" not in by_bg
    # python replay
    toks = [t for _, s in rows for t in s.split()]
    n = len(toks)
    c1 = {}
    for t in toks:
        c1[t] = c1.get(t, 0) + 1
    bg_counts = {}
    for _, s in rows:
        ws = s.split()
        for i in range(len(ws) - 1):
            b = f"{ws[i]} {ws[i+1]}"
            bg_counts[b] = bg_counts.get(b, 0) + 1
    for b, r in by_bg.items():
        w1, w2 = b.split(" ")
        want = (1_000_000 * n * bg_counts[b]) // (c1[w1] * c1[w2])
        assert (r["cnt"], r["lift_ppm"]) == (bg_counts[b], want), b
    # ranking is (lift desc, bigram asc), ranks contiguous
    lifts = [(r["lift_ppm"], r["bigram"]) for r in got]
    assert lifts == sorted(lifts, key=lambda t: (-t[0], t[1]))
    assert [r["rank"] for r in got] == list(range(1, len(got) + 1))
    import pytest

    with pytest.raises(ValueError, match="min_count"):
        X.collocations(df, k=0)


def test_payload_byte_stats_matches_python_reference(spark):
    """The one multimodal kernel that runs for REAL (no codec): numpy
    byte histogram per payload, pinned bit-for-bit against a pure
    Python reference including tie-break (smallest modal byte wins),
    empty payloads, and non-ASCII bytes."""
    from collections import Counter

    from data_pengadaan_agent_spark.operators import multimodal as MM

    payloads = {
        1: b"aabbb  cc\x00\x00",
        2: b"",
        3: bytes(range(256)) * 2,
        4: "héllo".encode("utf-8"),
        5: b"\x01\x02\x01\x02",  # 1 and 2 tie: modal_byte must be 1
    }
    df = spark.createDataFrame(
        [(k, bytearray(v)) for k, v in payloads.items()],
        "media_id LONG, payload BINARY",
    )
    got = {r.media_id: r for r in MM.payload_byte_stats(df).collect()}
    for mid, raw in payloads.items():
        r = got[mid]
        assert r.n_bytes == len(raw)
        if not raw:
            assert (r.distinct_bytes, r.modal_byte, r.modal_count,
                    r.printable_ppm) == (0, -1, 0, 0)
            continue
        c = Counter(raw)
        assert r.distinct_bytes == len(c)
        best = min(sorted(c), key=lambda b: (-c[b], b))
        assert (r.modal_byte, r.modal_count) == (best, c[best])
        printable = sum(v for b, v in c.items() if 0x20 <= b <= 0x7E)
        assert r.printable_ppm == printable * 1_000_000 // len(raw)
    # the text-derived media table: utf-8 payloads look like text
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    media = MM.media_from_documents(docs.limit(50))
    stats = MM.payload_byte_stats(media)
    rows = stats.collect()
    assert all(r.printable_ppm > 800_000 for r in rows)
    assert all(r.n_bytes > 0 for r in rows)


def test_chunk_text_drops_redundant_tail_chunk(tables):
    """Self-review r12: a final start landing inside the previous
    chunk's overlap produced a chunk entirely CONTAINED in it — pure
    double-counted tail content. Exactly length-200 text with
    chunk=200/overlap=50 now yields ONE chunk; length 221 yields two
    with real new coverage."""
    from data_pengadaan_agent_spark.operators.textan import chunk_text

    spark = tables["documents"].sparkSession
    df = spark.createDataFrame(
        [(1, "x" * 200), (2, "y" * 221)], "doc_id LONG, text STRING"
    )
    out = chunk_text(df, chunk_chars=200, overlap=50).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append((r.chunk_idx, r.start, r.chunk_end))
    assert by_doc[1] == [(0, 0, 200)]
    assert sorted(by_doc[2]) == [(0, 0, 200), (1, 150, 221)]


def test_bm25_terms_are_case_normalized(tables):
    """Self-review r12: tokens() lowercases, so an uppercase query
    term used to score 0 silently; terms now normalize to the token
    convention."""
    from data_pengadaan_agent_spark.operators.textan import bm25_score

    spark = tables["documents"].sparkSession
    df = spark.createDataFrame(
        [(1, "Spark makes engines go"), (2, "nothing here")],
        "doc_id LONG, text STRING",
    )
    up = {r.doc_id: r.bm25 for r in bm25_score(df, ["Spark"]).collect()}
    lo = {r.doc_id: r.bm25 for r in bm25_score(df, ["spark"]).collect()}
    assert up == lo and up[1] > 0


def test_bpe_training_releases_superseded_vocab_checkpoints(spark):
    """Self-review r14: each merge round frees the superseded
    word-vocabulary checkpoint (the 1-row merge frames stay — the
    final merge table unions them). Growth is bounded by
    k (merge rows) + the live vocab, never 2 vocab copies per round."""
    from data_pengadaan_agent_spark.operators import bpe as B

    docs = spark.createDataFrame(
        [(1, "low lower lowest slow slower"), (2, "low slow lower")],
        "doc_id LONG, text STRING",
    )
    k = 4
    before = len(spark.sparkContext._jsc.sc().getRDDStorageInfo())
    B.learn_bpe_merges(docs, k=k).collect()
    after = len(spark.sparkContext._jsc.sc().getRDDStorageInfo())
    assert after - before <= k + 1

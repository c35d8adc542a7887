"""Measure the bucketed-counts claim of the gram-count dup index
(VERDICT r9 ask #7): dupindex's module doc says "at 100 TB store the
counts bucketed (write_bucketed on h) and the count-side exchange
disappears". One lap at a x16 corpus backs the claim with a number —
the repo's own standard for scale claims.

Setup (untimed): x16 mutated-doc replicas of sf0.1/documents (the
scale_check.py fixture recipe), ingested once into a gram-count index;
a +1e6-re-id'd prelude shard appended; the counts table additionally
written ONCE as a managed table bucketed on h (the amortized write the
bucketed layout trades for exchange-free reads).

Timed, 3 runs each, per variant:
  parquet  — dup_spans_incremental as shipped (counts read from the
             partitioned parquet layout; per-hash SUM exchanges, then
             the merge join exchanges its count side again)
  bucketed — same operator with counts_source = the bucketed table
             (SUM and join read pre-partitioned buckets)

Also counts Exchange operators on the count side of each plan so the
timing delta is attributable. Results go to stdout; record the row in
NOTES.md.

Usage: python tools/lap_bucketed_counts.py
"""

from __future__ import annotations

import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/testdata/sf0.1"
ROOT = "/tmp/spark_graft_scale"
K = 16


def ensure_fixture() -> str:
    os.makedirs(ROOT, exist_ok=True)
    d = f"{ROOT}/docs_x{K}"
    os.makedirs(d, exist_ok=True)
    p = f"{d}/documents.parquet"
    if not os.path.exists(p):
        duckdb.connect().execute(f"""
        COPY (SELECT doc_id + r*5000 AS doc_id,
                     array_to_string(list_transform(string_split(text, ' '),
                       t -> t || substr(md5(t || CAST(r AS VARCHAR)), 1, 1)), ' ') AS text,
                     lang, source, n_chars
              FROM read_parquet('{BASE}/documents.parquet'),
                   (SELECT unnest(range({K})) AS r))
        TO '{p}' (FORMAT PARQUET, ROW_GROUP_SIZE 16384)""")
    return p


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from data_pengadaan_agent_spark.operators import dupindex as DI
    from data_pengadaan_agent_spark.sources.readers import write_bucketed

    docs_p = ensure_fixture()
    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    docs = spark.read.parquet(docs_p)
    shard = docs.filter(F.col("doc_id") % 97 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat(F.lit("pre1 pre2 "), F.col("text")).alias("text"),
    )
    idx = f"{ROOT}/gidx_bucketlap_x{K}"
    if not os.path.exists(f"{idx}/meta"):
        DI.build_gram_counts(docs, idx, length=8, n_buckets=64, arith_hash=False)
        DI.append_gram_counts(shard, idx)

    counts_p = f"{idx}/counts"
    tbl = "gram_counts_bucketed_lap"
    # the amortized one-time write the bucketed layout costs
    t0 = time.time()
    write_bucketed(
        spark.read.parquet(counts_p).select("h", "cnt"), tbl, "h", n_buckets=32
    )
    t_write = time.time() - t0

    def count_side_exchanges(df) -> int:
        plan = df._jdf.queryExecution().executedPlan().toString()
        return plan.count("Exchange hashpartitioning")

    variants = {
        "parquet": lambda: DI.dup_spans_incremental(spark, idx, shard),
        "bucketed": lambda: DI.dup_spans_incremental(
            spark, idx, shard, counts_source=spark.table(tbl)
        ),
    }
    results: dict[str, dict] = {}
    expect = None
    for name, make in variants.items():
        laps = []
        n = None
        for _ in range(3):
            t0 = time.time()
            n = make().count()
            laps.append(time.time() - t0)
        if expect is None:
            expect = n
        assert n == expect, f"{name}: rows {n} != {expect} — variants disagree"
        results[name] = {
            "rows": n,
            "laps": [round(x, 2) for x in laps],
            "best": round(min(laps), 2),
            "exchanges": count_side_exchanges(make()),
        }
    print(f"x{K} corpus ({docs.count()} docs), shard {shard.count()} docs; "
          f"bucketed write (amortized once): {t_write:.1f}s")
    for name, r in results.items():
        print(f"{name:9s} rows={r['rows']} best={r['best']}s laps={r['laps']} "
              f"plan_exchanges={r['exchanges']}")
    speedup = results["parquet"]["best"] / max(results["bucketed"]["best"], 1e-9)
    print(f"bucketed speedup: {speedup:.2f}x; exchange delta: "
          f"{results['parquet']['exchanges']} -> {results['bucketed']['exchanges']}")


if __name__ == "__main__":
    main()

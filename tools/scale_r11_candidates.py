"""Scale-lap the round-9-built r11-pool candidates (the standing
discipline: every new operator gets a measured scaling exponent
before it reaches the driver gate).

Reuses /tmp/spark_graft_scale's mutated-replica document fixtures
(built by scale_r9_candidates.py; replica tokens are mutated per
replica index, so planted duplicate structure stays LINEAR — a doc's
duplicate partner lives in its own replica, never across replicas).

Covered, docs x1/x4/x16:
  dup_spans            arith oracle path AND xxhash64 production path
  strip_dup_spans      the removal consumer (posexplode + rejoin)
  lexical_diversity    two-stage integer aggregate
  postings index       build time, query-batch time (fixed |Q|=100),
                       and APPEND of a fixed x1-derived shard onto the
                       x1 vs x16 base (base-independence, the
                       append_ivf_table contract)

Warm pass first, then timed; exponent = log(t16/t1)/log(16).
Usage: python tools/scale_r11_candidates.py        (x1/x4/x16 laps)
       python tools/scale_r11_candidates.py x64    (x1/x16/x64 stress
       of the production paths — the r7 larger-span discipline)
"""

import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = "/tmp/spark_graft_scale"
BASE = "/root/testdata/sf0.1"
# same deterministic mutated-replica construction as
# scale_r9_candidates.py (idempotent: skipped when present)
import duckdb

X64 = len(sys.argv) > 1 and sys.argv[1] == "x64"
SPANS = (1, 16, 64) if X64 else (1, 4, 16)

_con = duckdb.connect()
for k in SPANS:
    d = f"{ROOT}/docs_x{k}"
    os.makedirs(d, exist_ok=True)
    p = f"{d}/documents.parquet"
    if not os.path.exists(p):
        _con.execute(f"""
        COPY (SELECT doc_id + r*5000 AS doc_id,
                     array_to_string(list_transform(string_split(text, ' '),
                       t -> t || substr(md5(t || CAST(r AS VARCHAR)), 1, 1)), ' ') AS text,
                     lang, source, n_chars
              FROM read_parquet('{BASE}/documents.parquet'),
                   (SELECT unnest(range({k})) AS r))
        TO '{p}' (FORMAT PARQUET, ROW_GROUP_SIZE 16384)""")
print("fixtures ready", flush=True)

from pyspark.sql import functions as F

from data_pengadaan_agent_spark.operators import lexindex as LX
from data_pengadaan_agent_spark.operators import textan as X
from data_pengadaan_agent_spark.session import get_spark

spark = get_spark("scale-r11")
spark.range(8).mapInPandas(lambda it: it, schema="id long").count()

docs = {
    k: spark.read.parquet(f"{ROOT}/docs_x{k}/documents.parquet") for k in SPANS
}

QUERIES = (
    docs[1]
    .filter(F.col("doc_id") % 50 == 0)
    .limit(100)
    .select(F.col("doc_id").alias("qid"), F.slice(X.tokens("text"), 1, 3).alias("terms"))
    .localCheckpoint(eager=True)
)

def _drp_sides(k):
    a = docs[k].filter(F.col("doc_id") % 4 == 0).select("doc_id", "text")
    b = a.select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"),
        F.concat(F.lit("pre1 pre2 "), F.col("text")).alias("text"),
    )
    return a, b


RUNS = {} if X64 else {
    "dup_spans": lambda k: X.dup_spans(docs[k], length=8).count(),
    # production hash path: JVM xxhash64 inside whole-stage codegen
    # (the arith path's polynomial runs as interpreted HOF lambdas
    # and exists for the SQL twin)
    "dup_spans_prod": lambda k: X.dup_spans(
        docs[k], length=8, arith_hash=False
    ).count(),
    # sum(length(clean_text)) forces the reassembly: a bare count()
    # lets Catalyst PRUNE clean_text and skip array_sort/array_join
    # entirely (measured 0.46 s flat at x16 — a column-pruning
    # artifact, not the operator's cost)
    "strip_dup_spans_prod": lambda k: X.strip_dup_spans(
        docs[k], length=8, arith_hash=False
    ).agg(F.sum(F.length("clean_text"))).collect(),
    "lexical_diversity": lambda k: X.lexical_diversity(docs[k]).count(),
    # exact shared-run pairs: both corpora grow (A = %4 slice, B = the
    # same docs re-identified with a prelude — the registered shape)
    "dup_run_pairs_prod": lambda k: X.dup_run_pairs(
        *_drp_sides(k), length=6, max_df=50, arith_hash=False
    ).count(),
}

if X64:
    RUNS = {
        "dup_spans_prod": lambda k: X.dup_spans(
            docs[k], length=8, arith_hash=False
        ).count(),
        "strip_dup_spans_prod": lambda k: X.strip_dup_spans(
            docs[k], length=8, arith_hash=False
        ).agg(F.sum(F.length("clean_text"))).collect(),
        "lexical_diversity": lambda k: X.lexical_diversity(docs[k]).count(),
        "dup_run_pairs_prod": lambda k: X.dup_run_pairs(
            *_drp_sides(k), length=6, max_df=50, arith_hash=False
        ).count(),
    }

res = {}
for name, fn in RUNS.items():
    fn(1)
    times = {}
    for k in SPANS:
        t0 = time.time()
        n = fn(k)
        times[k] = time.time() - t0
        print(f"{name} x{k}: {times[k]:.2f} s  ({n} rows)", flush=True)
    top = SPANS[-1]
    exp = math.log(times[top] / times[1]) / math.log(top)
    res[name] = (times, exp)
    print(f"{name} exponent x1->x{top}: {exp:.2f}", flush=True)

# --- postings index: build + query per span, append on the base axis ---
IDX = "/tmp/spark_graft_scale/postings_x{k}"
build_t, query_t = {}, {}
for k in SPANS:
    path = IDX.format(k=k)
    shutil.rmtree(path, ignore_errors=True)
    t0 = time.time()
    LX.build_postings_index(docs[k], path, n_buckets=64)
    build_t[k] = time.time() - t0
    LX.bm25_from_index(spark, path, QUERIES, k=5).count()  # warm
    t0 = time.time()
    n = LX.bm25_from_index(spark, path, QUERIES, k=5).count()
    query_t[k] = time.time() - t0
    print(
        f"postings x{k}: build {build_t[k]:.2f} s, query {query_t[k]:.2f} s "
        f"({n} rows)",
        flush=True,
    )
for label, t in (("build", build_t), ("query", query_t)):
    top = SPANS[-1]
    exp = math.log(t[top] / t[1]) / math.log(top)
    res[f"postings_{label}"] = (t, exp)
    print(f"postings_{label} exponent x1->x{top}: {exp:.2f}", flush=True)

# append a FIXED shard (re-identified x1 docs) onto the x1 vs x16 base:
# base-independence means the two times match
shard = docs[1].select(
    (F.col("doc_id") + 10_000_000).alias("doc_id"), "text"
).localCheckpoint(eager=True)
app_t = {}
for k in (1, SPANS[-1]):
    path = IDX.format(k=k) + "_app"
    shutil.rmtree(path, ignore_errors=True)
    LX.build_postings_index(docs[k], path, n_buckets=64)
    t0 = time.time()
    n = LX.append_postings_index(shard, path)
    app_t[k] = time.time() - t0
    print(f"postings append onto x{k} base: {app_t[k]:.2f} s ({n} docs)", flush=True)
res["postings_append_base_axis"] = (
    app_t,
    math.log(app_t[SPANS[-1]] / app_t[1]) / math.log(SPANS[-1]),
)

# --- incremental dup spans: FIXED shard queried against x1 vs xN base
# (the operative claim: the shard query never re-tokenizes the base;
# its base-proportional cost is one scan of the compact count table)
from data_pengadaan_agent_spark.operators import dupindex as DI

GIDX = "/tmp/spark_graft_scale/gidx_x{k}"
dshard = docs[1].select(
    (F.col("doc_id") + 20_000_000).alias("doc_id"), "text"
).localCheckpoint(eager=True)
gi_app_t, gi_q_t = {}, {}
for k in (1, SPANS[-1]):
    path = GIDX.format(k=k)
    shutil.rmtree(path, ignore_errors=True)
    DI.build_gram_counts(docs[k], path, length=8, n_buckets=64, arith_hash=False)
    t0 = time.time()
    DI.append_gram_counts(dshard, path)
    gi_app_t[k] = time.time() - t0
    DI.dup_spans_incremental(spark, path, dshard).count()  # warm
    t0 = time.time()
    n = DI.dup_spans_incremental(spark, path, dshard).count()
    gi_q_t[k] = time.time() - t0
    print(
        f"gram-counts onto x{k} base: append {gi_app_t[k]:.2f} s, "
        f"incr query {gi_q_t[k]:.2f} s ({n} spans)",
        flush=True,
    )
for label, t in (("append", gi_app_t), ("query", gi_q_t)):
    res[f"dup_incr_{label}_base_axis"] = (
        t,
        math.log(t[SPANS[-1]] / t[1]) / math.log(SPANS[-1]),
    )

print("\n=== summary ===")
for name, (times, exp) in res.items():
    span = " / ".join(f"{times[k]:.2f}" for k in sorted(times))
    print(f"{name}: {span} s  exp {exp:.2f}")

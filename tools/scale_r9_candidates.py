"""Scale-lap the round-8-built candidate operators (the judge's
standing ask: every new operator gets a measured scaling exponent
before it reaches the driver gate). Covers the four r9 candidates
plus the two r10-pool winnowing ops.

Axes per operator, reusing /tmp/spark_graft_scale's mutated-replica
fixtures (linear dup structure — see scale_check.py):

  ngram_lm_score   docs x1/x4/x16, reference = the en slice of the
                   SAME corpus (both sides grow — the registered
                   fixture shape; vocab tables grow sub-linearly in
                   organic text, the target explode linearly)
  scd2_history     events x1/x4/x16 (user_id offset per replica so
                   keys stay distinct and run structure linear)
  ivf_drift_report emb x1/x4/x16 against a FIXED 4-centroid codebook
                   (the production shape: frozen codebook, growing
                   corpus)
  mmr_diversify    emb x1/x4/x16, fixed query/pool/k (pool cut is
                   the only corpus-sized stage; greedy is
                   pool-bounded driver math)

Warm pass first (plan/codegen caches), then timed; exponent =
log(t_x16 / t_x1) / log(16).  Usage:
    python tools/scale_r9_candidates.py      (results -> NOTES.md)
"""

import math
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/testdata/sf0.1"
ROOT = "/tmp/spark_graft_scale"
os.makedirs(ROOT, exist_ok=True)
con = duckdb.connect()

for k in (1, 4, 16):
    d = f"{ROOT}/docs_x{k}"
    os.makedirs(d, exist_ok=True)
    p = f"{d}/documents.parquet"
    if not os.path.exists(p):
        con.execute(f"""
        COPY (SELECT doc_id + r*5000 AS doc_id,
                     array_to_string(list_transform(string_split(text, ' '),
                       t -> t || substr(md5(t || CAST(r AS VARCHAR)), 1, 1)), ' ') AS text,
                     lang, source, n_chars
              FROM read_parquet('{BASE}/documents.parquet'),
                   (SELECT unnest(range({k})) AS r))
        TO '{p}' (FORMAT PARQUET, ROW_GROUP_SIZE 16384)""")
    e = f"{ROOT}/emb_x{k}"
    os.makedirs(e, exist_ok=True)
    q = f"{e}/embeddings.parquet"
    if not os.path.exists(q):
        con.execute(f"""
        COPY (SELECT vec_id + r*2000 AS vec_id,
                     list_transform(embedding,
                       x -> CAST(x + 0.0003 * r AS FLOAT)) AS embedding,
                     label
              FROM read_parquet('{BASE}/embeddings.parquet'),
                   (SELECT unnest(range({k})) AS r))
        TO '{q}' (FORMAT PARQUET, ROW_GROUP_SIZE 16384)""")
    v = f"{ROOT}/events_x{k}"
    os.makedirs(v, exist_ok=True)
    w = f"{v}/events.parquet"
    if not os.path.exists(w):
        # micros timestamps (sidesteps the nanos-parquet conf for a
        # timing fixture); user offset keeps per-key runs linear
        con.execute(f"""
        COPY (SELECT event_id + r*100000 AS event_id,
                     CAST(ts AS TIMESTAMP) AS ts,
                     user_id + r*1500 AS user_id,
                     event_type, value, props
              FROM read_parquet('{BASE}/events.parquet'),
                   (SELECT unnest(range({k})) AS r))
        TO '{w}' (FORMAT PARQUET, ROW_GROUP_SIZE 65536)""")
print("fixtures ready", flush=True)

from pyspark.sql import functions as F

from data_pengadaan_agent_spark.session import get_spark
from data_pengadaan_agent_spark.operators import (
    relational as R,
    similarity as S,
    textan as X,
)

spark = get_spark("scale-r9")
spark.range(8).mapInPandas(lambda it: it, schema="id long").count()

docs = {k: spark.read.parquet(f"{ROOT}/docs_x{k}/documents.parquet") for k in (1, 4, 16)}
embs = {k: spark.read.parquet(f"{ROOT}/emb_x{k}/embeddings.parquet")
             .select("vec_id", "embedding") for k in (1, 4, 16)}
evts = {k: spark.read.parquet(f"{ROOT}/events_x{k}/events.parquet") for k in (1, 4, 16)}

# frozen geometry/query, derived once from the x1 base
base = embs[1].filter(F.col("vec_id") < 1000)
_, CENTS = S.kmeans_lloyd(base, "embedding", "vec_id", k=4, iters=2, with_centroids=True)
QVEC = embs[1].filter(F.col("vec_id") == 0).select("embedding").first()[0]

def _wm_sides(k):
    d = docs[k]
    a = d.filter(F.col("doc_id") % 4 == 0).select("doc_id", "text")
    b = d.filter(F.col("doc_id") % 4 == 0).select(
        (F.col("doc_id") + 10000000).alias("doc_id"),
        F.concat(F.lit("prelude tokens pad out the head "), F.col("text")).alias(
            "text"
        ),
    )
    return a, b


RUNS = {
    "ngram_lm_score": lambda k: X.ngram_lm_score(
        docs[k], docs[k].filter(F.col("lang") == "en")).count(),
    "scd2_history": lambda k: R.scd2_history(evts[k]).count(),
    "ivf_drift_report": lambda k: S.ivf_drift_report(embs[k], CENTS).count(),
    "mmr_diversify": lambda k: S.mmr_diversify(
        embs[k], QVEC, k=5, pool=40, lam=0.7).count(),
    "winnow_fingerprints": lambda k: X.winnow_fingerprints(
        docs[k], k=5, w=4).count(),
    # the PRODUCTION hash path (JVM xxhash64, whole-stage codegen) —
    # the oracle-checkable arith path above runs its polynomial hash
    # as interpreted HOF lambdas, so its exponent overstates the
    # production cost (VERDICT r8 ask #4)
    "winnow_fingerprints_prod": lambda k: X.winnow_fingerprints(
        docs[k], k=5, w=4, arith_hash=False).count(),
    "winnow_matches": lambda k: X.winnow_matches(
        *_wm_sides(k), k=5, w=4, max_df=50, min_shared=2).count(),
}

res = {}
for name, fn in RUNS.items():
    fn(1)  # warm: plan/codegen/Arrow caches
    times = {}
    for k in (1, 4, 16):
        t0 = time.time()
        n = fn(k)
        times[k] = time.time() - t0
        print(f"{name} x{k}: {times[k]:.2f} s  ({n} rows)", flush=True)
    exp = math.log(times[16] / times[1]) / math.log(16)
    res[name] = (times, exp)
    print(f"{name} exponent x1->x16: {exp:.2f}", flush=True)

print("\n=== summary ===")
for name, (times, exp) in res.items():
    print(f"{name}: {times[1]:.2f} / {times[4]:.2f} / {times[16]:.2f} s  exp {exp:.2f}")

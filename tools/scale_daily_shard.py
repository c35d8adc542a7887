"""Scale-lap of the composed daily-shard loop (VERDICT r7 ask #6):
incremental dedup -> stateless quality gate -> append to BOTH ANN
index families. Two axes, both required for the 100 TB daily-ingest
claim:

  1. SHARD-proportionality: fixed base, shard x1 -> x16. Cost should
     grow ~linearly (exponent <= 1) in the shard.
  2. BASE-independence: fixed shard, base x1 -> x16. Cost should be
     ~flat (exponent ~ 0) — appending a day's shard must never rescan
     the historical index. (dedup_incremental's seen-side hash
     distinct is the one knowingly base-proportional piece when fed
     raw text; its docstring prescribes the maintained hash-index
     table at scale, and this lap measures exactly what that buys.)

Fixtures reuse /tmp/spark_graft_scale (scale_check.py's mutated doc
replicas, so dedup structure stays linear) plus embedding replicas
with a deterministic per-replica perturbation (vectors stay distinct,
geometry stays organic). Appends mutate their target, so every timed
append runs against a FRESH untimed copy of the base index.

Usage: python tools/scale_daily_shard.py     (results -> NOTES.md)
"""

import json
import math
import os
import shutil
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
                       x -> CAST(x + 0.0003 * r AS FLOAT)) AS embedding
              FROM read_parquet('{BASE}/embeddings.parquet'),
                   (SELECT unnest(range({k})) AS r))
        TO '{q}' (FORMAT PARQUET, ROW_GROUP_SIZE 16384)""")
print("fixtures ready", flush=True)

from pyspark.sql import functions as F  # noqa: E402

from data_pengadaan_agent_spark.operators.dedup import dedup_incremental  # noqa: E402
from data_pengadaan_agent_spark.operators.similarity import (  # noqa: E402
    append_ivf_table,
    append_lsh_signature_table,
    build_ivf_table,
    build_lsh_signature_table,
)
from data_pengadaan_agent_spark.operators.textan import (  # noqa: E402
    quality_classifier_stateless,
    train_quality_weights,
)
from data_pengadaan_agent_spark.session import get_spark  # noqa: E402

spark = get_spark("dailyshard")
spark.range(8).mapInPandas(lambda it: it, schema="id long").count()

docs = {k: spark.read.parquet(f"{ROOT}/docs_x{k}/documents.parquet") for k in (1, 4, 16)}
embs = {k: spark.read.parquet(f"{ROOT}/emb_x{k}/embeddings.parquet") for k in (1, 4, 16)}

# one trained weight table for every gate lap (weights are data)
half = docs[1].filter(F.col("doc_id") % 2 == 0)
other = docs[1].filter(F.col("doc_id") % 2 == 1)
weights = train_quality_weights(half, other, n=2, n_buckets=4096).localCheckpoint()

# base indexes per base-scale (built once, copied fresh per timed append)
for k in (1, 16):
    if not os.path.exists(f"{ROOT}/ivf_base_x{k}"):
        build_ivf_table(embs[k], "embedding", 64, f"{ROOT}/ivf_base_x{k}", n_centroids=8)
    if not os.path.exists(f"{ROOT}/lsh_base_x{k}"):
        build_lsh_signature_table(embs[k], "embedding", 64, f"{ROOT}/lsh_base_x{k}")
print("base indexes ready", flush=True)

res: dict[str, list] = {}


def t(name, size, fn, warm=True):
    if warm:
        fn()  # codegen/JIT warm pass (appends pass warm=False)
    t0 = time.time()
    n = fn()
    dt = round(time.time() - t0, 2)
    res.setdefault(name, []).append((size, dt))
    print(f"{name} @ x{size}: {dt}s ({n})", flush=True)


def fresh_copy(src):
    dst = f"{ROOT}/work_idx"
    cb_src, cb_dst = f"{src}_codebook", f"{dst}_codebook"
    for s, d in ((src, dst), (cb_src, cb_dst)):
        if os.path.exists(d):
            shutil.rmtree(d)
        if os.path.exists(s):
            shutil.copytree(s, d)
    return dst


# ---- axis 1: shard-proportionality (fixed base x1) -----------------
for k in (1, 4, 16):
    sd, se = docs[k], embs[k]
    t("dedup_incremental|shard", k, lambda: dedup_incremental(sd, docs[1]).count())
    t("stateless_gate|shard", k,
      lambda: quality_classifier_stateless(sd, weights, n=2, n_buckets=4096).count())
    for fam, append in (("ivf", lambda p: append_ivf_table(se, "embedding", 64, p, n_centroids=8)),
                        ("lsh", lambda p: append_lsh_signature_table(se, "embedding", 64, p))):
        def run(append=append, fam=fam):
            p = fresh_copy(f"{ROOT}/{fam}_base_x1")
            t0 = time.time()
            append(p)
            return round(time.time() - t0, 2)
        run()  # warm codegen on a throwaway copy
        dt = run()
        res.setdefault(f"append_{fam}|shard", []).append((k, dt))
        print(f"append_{fam}|shard @ x{k}: {dt}s", flush=True)

# ---- axis 2: base-independence (fixed shard x1) --------------------
for k in (1, 16):
    sd, se = docs[1], embs[1]
    t("dedup_incremental|base", k, lambda: dedup_incremental(sd, docs[k]).count())
    for fam, append in (("ivf", lambda p: append_ivf_table(se, "embedding", 64, p, n_centroids=8)),
                        ("lsh", lambda p: append_lsh_signature_table(se, "embedding", 64, p))):
        def run(append=append, fam=fam, k=k):
            p = fresh_copy(f"{ROOT}/{fam}_base_x{k}")
            t0 = time.time()
            append(p)
            return round(time.time() - t0, 2)
        run()
        dt = run()
        res.setdefault(f"append_{fam}|base", []).append((k, dt))
        print(f"append_{fam}|base @ x{k}: {dt}s", flush=True)

print()
for name, pts in res.items():
    (s0, t0v), (s1, t1v) = pts[0], pts[-1]
    e = math.log(max(t1v, 0.01) / max(t0v, 0.01)) / math.log(s1 / s0) if s1 > s0 else 0.0
    print(f"{name}: {pts} exponent={e:.2f}", flush=True)
print(json.dumps({k: v for k, v in res.items()}))
spark.stop()

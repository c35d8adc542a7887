"""Scale-lap the bloom-index and graph families (standing discipline:
every new operator gets a measured scaling exponent before it reaches
the driver gate).

- bloom (operators/bloom): build per span (keys = salted doc ids of
  the scale_r11 replica corpus); full-batch probe per span; ingest on
  the BASE axis (same 50%-new shard into the x1 vs top-span index —
  probe cost is batch-side only because the grouped words table is
  geometry-sized, not corpus-sized: the base-independence contract).
- graph (operators/graph): replicated-lineitem fixtures shift order
  AND part keys per replica, so the co-purchase graph is k disjoint
  copies — edges, triangles and PageRank work all scale exactly
  linearly if the plans do (a superlinear exponent would expose a
  cross-replica join leak).

Warm pass first, then timed; exponent = log(t_hi/t1)/log(hi).
Usage: python tools/scale_bloom_graph.py        (x1/x4/x16)
       python tools/scale_bloom_graph.py x64    (x1/x16/x64)
"""

import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = "/tmp/spark_graft_scale"
BASE = "/root/testdata/sf0.1"

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
    lp = f"{d}/lineitem.parquet"
    if not os.path.exists(lp):
        _con.execute(f"""
        COPY (SELECT l_orderkey + r*1000000 AS l_orderkey,
                     l_partkey + r*1000000 AS l_partkey,
                     l_suppkey, l_quantity, l_extendedprice, l_discount
              FROM read_parquet('{BASE}/lineitem.parquet'),
                   (SELECT unnest(range({k})) AS r))
        TO '{lp}' (FORMAT PARQUET, ROW_GROUP_SIZE 65536)""")
print("fixtures ready", flush=True)

from pyspark.sql import functions as F  # noqa: E402

from data_pengadaan_agent_spark.operators import bloom as BL  # noqa: E402
from data_pengadaan_agent_spark.operators import graph as G  # noqa: E402
from data_pengadaan_agent_spark.session import get_spark  # noqa: E402

spark = get_spark("scale-bloom-graph")
spark.range(8).mapInPandas(lambda it: it, schema="id long").count()

docs = {k: spark.read.parquet(f"{ROOT}/docs_x{k}/documents.parquet") for k in SPANS}
line = {k: spark.read.parquet(f"{ROOT}/docs_x{k}/lineitem.parquet") for k in SPANS}
keys = {
    k: docs[k].select((F.col("doc_id") * 2654435761 % (1 << 40)).alias("key"))
    for k in SPANS
}

res = {}


def lap(name, fn, spans=SPANS, warm=True):
    if warm:
        fn(1)
    times = {}
    for k in spans:
        t0 = time.time()
        n = fn(k)
        times[k] = time.time() - t0
        print(f"{name} x{k}: {times[k]:.2f} s  ({n} rows)", flush=True)
    top, bot = spans[-1], spans[0]
    exp = math.log(times[top] / times[bot]) / math.log(top / bot)
    res[name] = (times, round(exp, 2))
    print(f"{name} exponent x{bot}->x{top}: {exp:.2f}", flush=True)


BIDX = {k: f"{ROOT}/bloom_x{k}" for k in SPANS}


def _bloom_build(k):
    shutil.rmtree(BIDX[k], ignore_errors=True)
    BL.build_bloom_index(keys[k], BIDX[k], key_col="key",
                         n_buckets=16, n_words=4096, k=7)
    return k


lap("bloom_build", _bloom_build, warm=False)
lap(
    "bloom_probe",
    lambda k: BL.probe_bloom(spark, BIDX[k], keys[k], "key")
    .filter(~F.col("maybe"))
    .count(),
)
lap(
    "bloom_new_rows",
    lambda k: BL.bloom_new_rows(
        spark,
        BIDX[k],
        keys[k].withColumn("key", F.col("key") + (F.col("key") % 2)),
        "key",
    ).count(),
)

# ingest on the BASE axis: the same half-new shard into x1 vs top base
top = SPANS[-1]
shard = (
    keys[1]
    .withColumn("key", F.col("key") + (F.col("key") % 2) * 999_999_999)
    .localCheckpoint(eager=True)
)
for k in (1, top):
    t0 = time.time()
    n = BL.ingest_bloom_batch(spark, BIDX[k], shard, "key")
    print(f"bloom_ingest onto x{k} base: {time.time() - t0:.2f} s ({n} new)",
          flush=True)

lap(
    "graph_edges",
    lambda k: G.copurchase_edges(line[k], min_co=2).count(),
)
lap(
    "graph_triangles",
    lambda k: G.triangle_stats(G.copurchase_edges(line[k], min_co=2)).count(),
)
lap(
    "graph_pagerank",
    lambda k: G.pagerank_int(
        G.copurchase_edges(line[k], min_co=2), iters=2, top_k=20
    ).count(),
)

print()
for name, (times, exp) in res.items():
    print(f"{name:22s} exp={exp:+.2f}  " +
          "  ".join(f"x{k}:{t:.2f}s" for k, t in times.items()))

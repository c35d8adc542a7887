"""Scale-lap the continuation-2 ops that scale_bloom_graph.py does not
cover: dq_check, the CMS cube, and the four behavior analytics
(retention, transitions, event n-grams, concurrency sweep).

Fixtures: replicated lineitem (shifted order/part keys — disjoint
copies) for dq, replicated documents for CMS token streams, and
replicated events (shifted user_id and event_id per replica, so the
behavior graphs are k disjoint user populations — exact linear work
if the plans scale).

Warm pass first, then timed; exponent = log(t_hi/t1)/log(hi).
Usage: python tools/scale_continuation2.py        (x1/x4/x16)
       python tools/scale_continuation2.py x64    (x1/x16/x64)
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
    ep = f"{d}/events.parquet"
    if not os.path.exists(ep):
        _con.execute(f"""
        COPY (SELECT event_id + r*1000000 AS event_id, ts,
                     user_id + r*1000000 AS user_id, event_type, value, props
              FROM read_parquet('{BASE}/events.parquet'),
                   (SELECT unnest(range({k})) AS r))
        TO '{ep}' (FORMAT PARQUET, ROW_GROUP_SIZE 65536)""")
print("fixtures ready", flush=True)

from pyspark.sql import functions as F  # noqa: E402

from data_pengadaan_agent_spark.operators import cmscube as CM  # noqa: E402
from data_pengadaan_agent_spark.operators import dq as DQ  # noqa: E402
from data_pengadaan_agent_spark.operators import relational as R  # noqa: E402
from data_pengadaan_agent_spark.operators import textan as X  # noqa: E402
from data_pengadaan_agent_spark.session import get_spark  # noqa: E402

spark = get_spark("scale-cont2")
spark.range(8).mapInPandas(lambda it: it, schema="id long").count()

docs = {k: spark.read.parquet(f"{ROOT}/docs_x{k}/documents.parquet") for k in SPANS}
line = {k: spark.read.parquet(f"{ROOT}/docs_x{k}/lineitem.parquet") for k in SPANS}
evts = {k: spark.read.parquet(f"{ROOT}/docs_x{k}/events.parquet") for k in SPANS}
# events ts is TIMESTAMP in these replicas (duckdb copy normalizes)

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


def _dq(k):
    rules = [
        DQ.not_null("l_partkey"),
        DQ.in_range("l_quantity", 0.0, 60.0),
        DQ.in_range("l_discount", 0.0, 0.5),
        DQ.satisfies("l_extendedprice > 0", "positive_price"),
        DQ.unique(["l_orderkey", "l_partkey", "l_suppkey"]),
    ]
    return DQ.dq_check(line[k], rules).count()


lap("dq_check", _dq)

CIDX = {k: f"{ROOT}/cms_x{k}" for k in SPANS}


def _cms_build(k):
    shutil.rmtree(CIDX[k], ignore_errors=True)
    toks = docs[k].select(
        "lang", F.explode(X.tokens("text")).alias("tok")
    ).filter(F.col("tok") != "")
    CM.build_cms_cube(toks, CIDX[k], dims=["lang"], key_col="tok", d=4, w=1024)
    return k


lap("cms_build", _cms_build, warm=False)
lap(
    "cms_estimate",
    lambda k: CM.cms_estimate(
        spark, CIDX[k], ["data", "spark", "model", "query"], ["lang"]
    ).count(),
)
lap("retention", lambda k: R.retention_cohorts(evts[k], grain="day").count())
lap("transitions", lambda k: R.event_transitions(evts[k]).count())
lap(
    "event_ngrams",
    lambda k: R.event_ngrams(evts[k], n=3, min_support=2).count(),
)


def _peak(k):
    iv = evts[k].select(
        "event_type",
        F.col("ts").alias("start"),
        (F.col("ts") + F.expr("INTERVAL 5 MINUTES")).alias("end"),
    )
    tl = R.concurrency_timeline(iv, "start", "end", ["event_type"])
    return tl.groupBy("event_type").agg(F.max("concurrent")).count()


lap("peak_concurrency", _peak)

print()
for name, (times, exp) in res.items():
    print(f"{name:18s} exp={exp:+.2f}  " +
          "  ".join(f"x{k}:{t:.2f}s" for k, t in times.items()))

"""Scale-lap the final continuation-2 wave: point-in-time join,
value-set index build/scan, and the z-order + 2-D zonemap composed
scan. Reuses the shared /tmp/spark_graft_scale replicas.

Usage: python tools/scale_wave4.py        (x1/x4/x16)
       python tools/scale_wave4.py x64    (x1/x16/x64)
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
    ep = f"{d}/events.parquet"
    if not os.path.exists(ep):
        _con.execute(f"""
        COPY (SELECT event_id + r*1000000 AS event_id, ts,
                     user_id + r*1000000 AS user_id, event_type, value, props
              FROM read_parquet('{BASE}/events.parquet'),
                   (SELECT unnest(range({k})) AS r))
        TO '{ep}' (FORMAT PARQUET, ROW_GROUP_SIZE 65536)""")
    lp = f"{d}/lineitem.parquet"
    if not os.path.exists(lp):
        _con.execute(f"""
        COPY (SELECT l_orderkey + r*1000000 AS l_orderkey,
                     l_partkey + r*1000000 AS l_partkey,
                     l_suppkey, l_quantity, l_extendedprice, l_discount,
                     l_returnflag, l_linestatus
              FROM read_parquet('{BASE}/lineitem.parquet'),
                   (SELECT unnest(range({k})) AS r))
        TO '{lp}' (FORMAT PARQUET, ROW_GROUP_SIZE 65536)""")
print("fixtures ready", flush=True)

from pyspark.sql import functions as F  # noqa: E402

from data_pengadaan_agent_spark.operators import asof as AS  # noqa: E402
from data_pengadaan_agent_spark.operators import layout as LY  # noqa: E402
from data_pengadaan_agent_spark.operators import relational as R  # noqa: E402
from data_pengadaan_agent_spark.operators import zonemap as ZM  # noqa: E402
from data_pengadaan_agent_spark.session import get_spark  # noqa: E402

spark = get_spark("scale-wave4")
spark.range(8).mapInPandas(lambda it: it, schema="id long").count()

evts = {k: spark.read.parquet(f"{ROOT}/docs_x{k}/events.parquet") for k in SPANS}
line = {k: spark.read.parquet(f"{ROOT}/docs_x{k}/lineitem.parquet") for k in SPANS}

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


def _pit(k):
    ev = evts[k]
    dim = R.scd2_history(ev)
    facts = ev.filter(F.col("event_id") % 5 == 0).select(
        "event_id", "user_id",
        (F.col("ts") + F.expr("INTERVAL 10 MINUTES")).alias("ts2"),
    )
    return AS.point_in_time_join(
        facts, dim, key="user_id", fact_ts="ts2", payload_cols=["state"]
    ).count()


lap("pit_join", _pit)

VD = {k: f"{ROOT}/vs_data_x{k}" for k in SPANS}
VI = {k: f"{ROOT}/vs_idx_x{k}" for k in SPANS}
for k in SPANS:
    if not os.path.exists(VD[k]):
        line[k].repartitionByRange(8 * k, "l_extendedprice").write.parquet(VD[k])


def _vs_build(k):
    shutil.rmtree(VI[k], ignore_errors=True)
    return ZM.build_valueset_index(spark, VD[k], VI[k], "l_returnflag")


lap("vs_build", _vs_build, warm=False)
lap(
    "vs_scan",
    lambda k: ZM.valueset_pruned_scan(spark, VD[k], VI[k], ["P"]).count(),
)

ZO = {k: f"{ROOT}/zo_data_x{k}" for k in SPANS}
ZZ = {k: f"{ROOT}/zo_zm_x{k}" for k in SPANS}
for k in SPANS:
    if not os.path.exists(ZO[k]):
        LY.write_zordered(
            line[k], ZO[k], ["l_partkey", "l_suppkey"], n_files=8 * k
        )


def _zo_build(k):
    shutil.rmtree(ZZ[k], ignore_errors=True)
    return ZM.build_zonemap(spark, ZO[k], ZZ[k], ["l_partkey", "l_suppkey"])


lap("zo_zm_build", _zo_build, warm=False)
lap(
    "zo_box_scan",
    lambda k: ZM.zonemap_pruned_scan(
        spark, ZO[k], ZZ[k],
        {"l_partkey": (50.0, 150.0), "l_suppkey": (1.0, 8.0)},
    ).count(),
)

print()
for name, (times, exp) in res.items():
    print(f"{name:12s} exp={exp:+.2f}  " +
          "  ".join(f"x{k}:{t:.2f}s" for k, t in times.items()))

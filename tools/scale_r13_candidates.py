"""Scale-lap the round-11-built r13-pool candidates (the standing
discipline: every new operator gets a measured scaling exponent
before it reaches the driver gate).

Binary quantization (operators/bq) and greedy k-center coreset
selection (operators/coreset), embeddings x1/x4/x16 (the
scale_daily_shard perturbed-replica fixtures — vectors stay distinct,
geometry stays organic):

  bq_train    ONE 2*dim-expression min/max aggregate; ~linear scan
  bq_encode   one codegen select writing 2 BIGINT words/vector;
              ~linear, and the on-disk compression vs raw floats is
              the headline (the 1-bit tier)
  bq_topk     integer bit_count(xor) scan + TakeOrdered; ~linear with
              the smallest per-row constant in the ANN stack
  bq_rerank   two-stage: the same 1-bit scan cuts a FIXED 50-row
              shortlist, stage 2 touches 50 rows — total should track
              the scan, never the shortlist
  kcenter     k=5 fixed: k-1 passes, each one codegen fold + global
              TakeOrdered(1), state localCheckpoint-ed per pass —
              ~linear in the corpus at fixed k (flat per-pass cost is
              the design claim to verify)

Warm pass first, then timed; exponent = log(t_hi/t1)/log(hi).
Usage: python tools/scale_r13_candidates.py        (x1/x4/x16)
       python tools/scale_r13_candidates.py x64    (x1/x16/x64 stress)
"""

import math
import os
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
    e = f"{ROOT}/emb_x{k}"
    os.makedirs(e, exist_ok=True)
    q = f"{e}/embeddings.parquet"
    if not os.path.exists(q):
        _con.execute(f"""
        COPY (SELECT vec_id + r*2000 AS vec_id,
                     list_transform(embedding,
                       x -> CAST(x + 0.0003 * r AS FLOAT)) AS embedding
              FROM read_parquet('{BASE}/embeddings.parquet'),
                   (SELECT unnest(range({k})) AS r))
        TO '{q}' (FORMAT PARQUET, ROW_GROUP_SIZE 16384)""")
print("fixtures ready", flush=True)

from pyspark.sql import SparkSession  # noqa: E402

from data_pengadaan_agent_spark.operators import bq as BQ  # noqa: E402
from data_pengadaan_agent_spark.operators import coreset as CS  # noqa: E402

spark = (
    SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)


def lap(fn, warm=True):
    if warm:
        fn()
    t0 = time.time()
    out = fn()
    return time.time() - t0, out


results: dict[str, dict[int, float]] = {
    "bq_train": {}, "bq_encode": {}, "bq_topk": {},
    "bq_rerank": {}, "bq_batch8": {}, "kcenter_k5": {},
}
for k in SPANS:
    emb = spark.read.parquet(f"{ROOT}/emb_x{k}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    n = emb.count()
    t_tr, thr = lap(lambda: BQ.train_bq(emb, dim=64))
    results["bq_train"][k] = t_tr
    bq_path = f"{ROOT}/bq_words_x{k}"
    t_enc, _ = lap(
        lambda: BQ.bq_encode(emb, thr).write.mode("overwrite").parquet(bq_path)
    )
    results["bq_encode"][k] = t_enc
    words = spark.read.parquet(bq_path)
    qvec = emb.filter(emb.vec_id == 0).select("embedding").first()[0]
    qw = BQ.encode_query_bq(qvec, thr)
    t_top, top = lap(lambda: BQ.bq_topk(words, qw, k=10).collect())
    results["bq_topk"][k] = t_top
    t_rr, _ = lap(
        lambda: BQ.bq_rerank_topk(emb, thr, qvec, k=10, shortlist=50).collect()
    )
    results["bq_rerank"][k] = t_rr
    # batched miner with a FIXED |Q|=8: all Hamming folds in one scan,
    # the partial WindowGroupLimit cuts each partition to |Q|*k before
    # the single qid exchange
    qrows = [
        (int(r["vec_id"]), BQ.encode_query_bq(r["embedding"], thr))
        for r in emb.filter(emb.vec_id % 250 == 0).limit(8).collect()
    ]
    t_b, _ = lap(lambda: BQ.bq_topk_batch(words, qrows, k=10).collect())
    results["bq_batch8"][k] = t_b
    raw_b = sum(
        os.path.getsize(os.path.join(f"{ROOT}/emb_x{k}", f))
        for f in os.listdir(f"{ROOT}/emb_x{k}")
    )
    bq_b = sum(
        os.path.getsize(os.path.join(bq_path, f))
        for f in os.listdir(bq_path)
        if f.endswith(".parquet")
    )
    print(
        f"x{k}: n={n} bq train={t_tr:.2f}s encode={t_enc:.2f}s "
        f"topk={t_top:.2f}s top1={top[0]['vec_id']} rerank={t_rr:.2f}s "
        f"bq_bytes={bq_b} raw_bytes={raw_b} "
        f"compression={raw_b / max(bq_b, 1):.1f}x",
        flush=True,
    )
    t_kc, sel = lap(lambda: CS.kcenter_coreset(emb, k=5).collect())
    results["kcenter_k5"][k] = t_kc
    radii = [r["dist_micro"] for r in sorted(sel, key=lambda r: r["sel_rank"])]
    print(f"x{k}: kcenter k=5 {t_kc:.2f}s radii={radii}", flush=True)

hi = SPANS[-1]
for name, r in results.items():
    exp = math.log(r[hi] / r[1]) / math.log(hi)
    pts = " ".join(f"x{k}={r[k]:.2f}s" for k in SPANS)
    print(f"{name}: {pts} exp={exp:.2f}")

"""Measure streaming-query sensitivity to the stateful-shuffle
partition count — r14 optimization probe (guide §2.2: fewer, larger
reduce partitions; AQE cannot coalesce STREAMING shuffles, so the
state-store partition count is a static choice made at checkpoint
creation from spark.sql.shuffle.partitions).

Runs the three registered corpus-ingest streaming queries N times
each under alternating spark.sql.shuffle.partitions values on ONE
session (fresh checkpoints per call, so the setting takes effect per
query), interleaved A/B/A/B to cancel host-load drift.

Usage: python tools/stream_partitions_probe.py [reps=3]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")


QUERIES = [
    "corpus_ingest_stream_ttl",
    "corpus_ingest_stream_scored",
    "trending_terms_append",
]


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as E
    from data_pengadaan_agent_spark.session import get_spark
    from data_pengadaan_agent_spark.sources.catalog import load_table

    spark = get_spark("stream_partitions_probe")
    load_table(spark, sf_dir, "lineitem").count()
    spark.range(8).mapInPandas(lambda it: it, schema="id long").count()

    qs = E.queries()
    out: dict[str, dict[str, list[float]]] = {
        q: {"p32": [], "p8": []} for q in QUERIES
    }
    # warm one lap first (codegen, text-corpus fixture, memory sink)
    for q in QUERIES:
        qs[q](spark, sf_dir).collect()
    for _ in range(reps):
        for setting, key in ((32, "p32"), (8, "p8")):
            spark.conf.set("spark.sql.shuffle.partitions", str(setting))
            for q in QUERIES:
                t0 = time.time()
                qs[q](spark, sf_dir).collect()
                out[q][key].append(round(time.time() - t0, 3))
    spark.conf.set(
        "spark.sql.shuffle.partitions",
        os.environ.get("SPARK_GRAFT_CPUS", "32"),
    )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()

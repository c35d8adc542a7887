"""Local replica of the driver's correctness gate: run every
queries() entry on Spark and its oracle_sql() twin on DuckDB at the
given SF, compare row count + schema-width + order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, "/root/repo")


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # canonicalize -0.0 and format with enough digits to catch real drift
        if v == 0.0:
            v = 0.0
        return f"{v:.12g}"
    if hasattr(v, "isoformat"):
        return v.isoformat(sep=" ")
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, bool):
        return str(int(v))
    try:
        from decimal import Decimal

        if isinstance(v, Decimal):
            return f"{float(v):.12g}"
    except ImportError:
        pass
    return str(v)


def normalize(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for r in rows:
        out.append(tuple(norm_cell(r[i]) for i in order))
    return sorted(out), [colnames[i] for i in order]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb

    import __spark_entry__ as E
    from data_pengadaan_agent_spark.session import get_spark

    spark = get_spark("oracle-check")

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = E.queries()
    oracles = E.oracle_sql()
    results = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            results[name] = f"SPARK-ERROR: {type(e).__name__}: {e}"
            continue
        if name not in oracles:
            results[name] = f"rows-only ({len(srows)} rows, {time.time()-t0:.1f}s)"
            continue
        try:
            cur = con.execute(oracles[name])
            dcols = [d[0] for d in cur.description]
            drows = cur.fetchall()
        except Exception as e:
            results[name] = f"DUCKDB-ERROR: {type(e).__name__}: {e}"
            continue
        sn, scn = normalize(srows, scols)
        dn, dcn = normalize(drows, dcols)
        if scn != dcn:
            results[name] = f"COLUMN-MISMATCH spark={scn} duck={dcn}"
        elif len(sn) != len(dn):
            results[name] = f"ROWCOUNT-MISMATCH spark={len(sn)} duck={len(dn)}"
        elif sn != dn:
            diff = [(a, b) for a, b in zip(sn, dn) if a != b][:3]
            results[name] = f"VALUE-MISMATCH ({len([1 for a,b in zip(sn,dn) if a!=b])} rows) e.g. {diff}"
        else:
            results[name] = f"OK ({len(sn)} rows, {time.time()-t0:.1f}s)"

    width = max(len(n) for n in results)
    n_ok = sum(1 for v in results.values() if v.startswith(("OK", "rows-only")))
    for name, res in results.items():
        print(f"{name:<{width}}  {res}")
    print(f"\n{n_ok}/{len(results)} passing")
    spark.stop()
    return 0 if n_ok == len(results) else 1


if __name__ == "__main__":
    sys.exit(main())

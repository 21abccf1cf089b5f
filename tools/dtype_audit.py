"""Audit pandas dtype parity between every queries() entry and its DuckDB
oracle — the failure mode behind r03's one red driver row (DuckDB windowed
sum(BIGINT) -> HUGEINT -> pandas float64, Spark int64: values equal, hash
differs under a dtype-sensitive canonicalization).

Runs both sides at sf0.001 (tiny, fast), compares per-column pandas dtype
KINDS (int-family vs float-family vs object vs datetime), and prints any
query whose column kinds disagree.  Exact-width differences (int32 vs
int64) are reported separately at lower severity.

Usage: python tools/dtype_audit.py [sf_dir] [--only a,b,c]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
from pyspark.sql import SparkSession

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def kind(dt) -> str:
    k = np.dtype(dt).kind if dt != object else "O"
    return {"i": "int", "u": "int", "f": "float", "b": "bool", "M": "dt", "O": "obj"}.get(k, str(k))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--") else "/root/testdata/sf0.001"
    only = None
    for i, a in enumerate(sys.argv):
        if a == "--only":
            only = set(sys.argv[i + 1].split(","))

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .appName("dtype-audit")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    q = entry.queries()
    o = entry.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    hard, soft, errs = [], [], []
    names = [n for n in q if n in o and (only is None or n in only)]
    for i, name in enumerate(names):
        try:
            sdf = q[name](spark, sf_dir).toPandas()
            odf = con.execute(o[name]).df()
        except Exception as e:  # noqa: BLE001
            errs.append((name, f"{type(e).__name__}: {e}"[:160]))
            print(f"{i + 1:3d}/{len(names)} {name:30s} ERR", flush=True)
            continue
        scols = {c.lower(): kind(t) for c, t in sdf.dtypes.items()}
        ocols = {c.lower(): kind(t) for c, t in odf.dtypes.items()}
        mism = [
            (c, scols[c], ocols[c])
            for c in scols
            if c in ocols and scols[c] != ocols[c]
        ]
        # int/float disagreements are the driver-hash killers; anything
        # else crossing obj/dt boundaries is also hard.
        for c, sk, ok in mism:
            hard.append((name, c, sk, ok))
        widths = [
            (c, str(sdf.dtypes[cs]), str(odf.dtypes[co]))
            for c in scols
            if c in ocols and scols[c] == ocols[c]
            for cs in [next(x for x in sdf.columns if x.lower() == c)]
            for co in [next(x for x in odf.columns if x.lower() == c)]
            if str(sdf.dtypes[cs]) != str(odf.dtypes[co])
        ]
        for c, sw, ow in widths:
            soft.append((name, c, sw, ow))
        flag = " <-- KIND MISMATCH" if mism else ""
        print(f"{i + 1:3d}/{len(names)} {name:30s} ok{flag}", flush=True)

    print("\n=== HARD (dtype-kind) mismatches — likely driver-hash reds ===")
    for name, c, sk, ok in hard:
        print(f"  {name:30s} {c:24s} spark={sk} oracle={ok}")
    print("=== SOFT (width-only) mismatches ===")
    for name, c, sw, ow in soft:
        print(f"  {name:30s} {c:24s} spark={sw} oracle={ow}")
    print("=== ERRORS ===")
    for name, e in errs:
        print(f"  {name:30s} {e}")
    print(f"\n{len(hard)} hard, {len(soft)} soft, {len(errs)} errors over {len(names)} oracled queries")


if __name__ == "__main__":
    main()

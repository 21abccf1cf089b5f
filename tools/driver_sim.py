"""Simulate the driver's correctness pass: run every queries() entry at
sf0.01 plus its DuckDB oracle, timing each, and report totals.

Usage: python tools/driver_sim.py [sf_dir] [--limit N] [--only a,b,c]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from pyspark.sql import SparkSession


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--") else "/root/testdata/sf0.01"
    only = None
    limit = None
    for i, a in enumerate(sys.argv):
        if a == "--only":
            only = set(sys.argv[i + 1].split(","))
        if a == "--limit":
            limit = int(sys.argv[i + 1])

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .appName("driver-sim")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    q = entry.queries()
    o = entry.oracle_sql()

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    rows = []
    t_total0 = time.time()
    items = list(q.items())
    if only:
        items = [(k, v) for k, v in items if k in only]
    if limit:
        items = items[:limit]
    for name, fn in items:
        t0 = time.time()
        err = None
        n_spark = None
        try:
            df = fn(spark, sf_dir)
            pdf = df.toPandas()
            n_spark = len(pdf)
        except Exception as e:  # noqa: BLE001
            err = f"spark:{type(e).__name__}:{e}"[:200]
        t_spark = time.time() - t0
        t1 = time.time()
        n_oracle = None
        if name in o and err is None:
            try:
                odf = con.execute(o[name]).df()
                n_oracle = len(odf)
            except Exception as e:  # noqa: BLE001
                err = f"oracle:{type(e).__name__}:{e}"[:200]
        t_oracle = time.time() - t1
        rows.append(
            {
                "name": name,
                "t_spark": round(t_spark, 2),
                "t_oracle": round(t_oracle, 2),
                "rows": n_spark,
                "oracle_rows": n_oracle,
                "err": err,
            }
        )
        print(
            f"{len(rows):3d} {name:28s} spark={t_spark:6.2f}s oracle={t_oracle:6.2f}s rows={n_spark} {err or ''}",
            flush=True,
        )
    total = time.time() - t_total0
    rows.sort(key=lambda r: -(r["t_spark"] + r["t_oracle"]))
    print(f"\nTOTAL {total:.1f}s for {len(rows)} queries")
    print("slowest 15:")
    for r in rows[:15]:
        print(f"  {r['name']:28s} spark={r['t_spark']:6.2f} oracle={r['t_oracle']:6.2f}")
    with open("/tmp/driver_sim.json", "w") as f:
        json.dump({"total": total, "rows": rows}, f, indent=1)


if __name__ == "__main__":
    main()

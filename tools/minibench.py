#!/usr/bin/env python
"""Per-query profiling harness for optimization rounds.

Mirrors bench.py's methodology (clearCache + System.gc between reps,
best-of-N count()) but additionally splits each rep into
construction time (driver py4j/plan work, incl. any bounded training
collects the query body runs) and action time (the timed count()).

Usage:
  python tools/minibench.py q1 q2 ...            # best-of-3
  MINIBENCH_REPS=5 python tools/minibench.py ... # best-of-5
  python tools/minibench.py --all                # every bench.py row

Prints one JSON object: {name: [total, construction, action]} (best
rep by total) and writes the same to $MINIBENCH_OUT if set.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from kats_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps_n = int(os.environ.get("MINIBENCH_REPS", "3"))
    import __spark_entry__ as entrymod
    import bench

    qs = entrymod.queries()
    names = sys.argv[1:]
    if names and names[0] == "--all":
        names = [n for n in bench.HEADLINE if n in qs]
    spark = get_spark("kats_spark_minibench")
    spark.sparkContext.setLogLevel("ERROR")

    # same warm-up as bench.py
    from pyspark.sql import Window, functions as F

    r = spark.read.parquet(f"{sf_dir}/region.parquet")
    w = Window.partitionBy("r_regionkey").orderBy("r_name")
    (
        r.withColumn("__rn", F.row_number().over(w))
        .withColumn("__ma", F.avg(F.length("r_name")).over(w.rowsBetween(-2, 0)))
        .join(F.broadcast(r.select("r_regionkey")), "r_regionkey")
        .groupBy("r_regionkey")
        .agg(F.count("*"), F.avg("__ma"))
        .count()
    )
    spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.sum(F.length("text"))
    ).collect()
    spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        F.sum(F.size("embedding"))
    ).collect()
    ncores = spark.sparkContext.defaultParallelism

    def _touch(batches):
        import numpy as _np  # noqa: F401
        import time as _t

        _t.sleep(0.2)
        yield from batches

    spark.range(ncores, numPartitions=ncores).mapInPandas(_touch, "id bigint").count()

    jvm_gc = spark.sparkContext._jvm.System.gc
    out: dict[str, list[float]] = {}
    for name in names:
        if name not in qs:
            print(f"## unknown query: {name}", file=sys.stderr)
            continue
        best = (float("inf"), 0.0, 0.0)
        for _ in range(reps_n):
            spark.catalog.clearCache()
            jvm_gc()
            spark.sparkContext.setJobDescription(f"minibench:{name}")
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            t1 = time.perf_counter()
            df.count()
            t2 = time.perf_counter()
            if t2 - t0 < best[0]:
                best = (t2 - t0, t1 - t0, t2 - t1)
        out[name] = [round(v, 3) for v in best]
        print(f"# {name}: total={best[0]:.3f} constr={best[1]:.3f} action={best[2]:.3f}",
              file=sys.stderr)
    line = json.dumps(out, indent=1)
    print(line)
    dest = os.environ.get("MINIBENCH_OUT")
    if dest:
        with open(dest, "w") as fh:
            fh.write(line + "\n")


if __name__ == "__main__":
    main()

"""Capture .explain("formatted") for bench queries into plans/r13/.

Usage: python tools/capture_plans.py <suffix> [q1,q2,...]
  suffix: "before" or "after" — files land at plans/r13/<query>_<suffix>.txt
  query list defaults to every bench.py HEADLINE query.

Runs on the bench-shaped session (get_spark, same configs/core count) so
the captured plan is the one the bench times.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kats_spark.session import get_spark  # noqa: E402


def main() -> None:
    suffix = sys.argv[1]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as entrymod
    import bench

    names = sys.argv[2].split(",") if len(sys.argv) > 2 else bench.HEADLINE
    qs = entrymod.queries()
    spark = get_spark("kats_spark_plan_capture")
    spark.sparkContext.setLogLevel("ERROR")
    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("PLANS_ROUND", "r14"),
    )
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        if name not in qs:
            print(f"skip {name}: not in queries()")
            continue
        try:
            df = qs[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001
            plan = f"ERROR capturing plan: {type(e).__name__}: {e}"
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(plan)
        print(f"captured {name}_{suffix} ({len(plan)} chars)", flush=True)


if __name__ == "__main__":
    main()

"""Audit physical plans the way PLANS.md tabulates them.

Usage: python tools/plan_audit.py q1,q2,... [sf_dir]

Prints, per query: broadcast-hash joins, sort-merge joins, shuffle
exchanges, parquet scans + in-memory scans, Python eval nodes
(Arrow/pandas UDF stages), and whether scans are column-pruned
(ReadSchema narrower than the table).
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def main() -> None:
    names = sys.argv[1].split(",")
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry

    qs = entry.queries()
    print("| query | BHJ | SMJ | exchanges | scans | python | pruned |")
    print("|---|---|---|---|---|---|---|")
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        bhj = plan.count("BroadcastHashJoin")
        smj = plan.count("SortMergeJoin")
        exch = len(re.findall(r"Exchange (?:hash|range|Single)", plan))
        scans = plan.count("Scan parquet")
        mem = plan.count("InMemoryTableScan")
        py = (
            plan.count("BatchEvalPython")
            + plan.count("ArrowEvalPython")
            + plan.count("FlatMapGroupsInPandas")
            + plan.count("MapInPandas")
            + plan.count("FlatMapGroupsInArrow")
        )
        schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
        pruned = "yes" if all(len(s.split(",")) <= 12 for s in schemas) else "check"
        print(
            f"| {name} | {bhj} | {smj} | {exch} | {scans}+{mem}c | {py} | {pruned} |"
        )


if __name__ == "__main__":
    main()

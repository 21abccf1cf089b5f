"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001; ``queries()``
exposes every implemented operator from SURVEY.md §2 as (spark, sf_dir) ->
DataFrame; ``oracle_sql()`` provides DuckDB-equivalent SQL for the
hash-match correctness gate (hash-dependent approximate ops are rows-only
by design and have no oracle entry).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from kats_spark.plans import pipeline_queries, queries as ts_queries, queries2


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return ts_queries.q_daily_revenue_by_region(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    out.update(ts_queries.QUERIES)
    out.update(pipeline_queries.QUERIES)
    out.update(queries2.QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    out.update(ts_queries.ORACLES)
    out.update(pipeline_queries.ORACLES)
    out.update(queries2.ORACLES)
    return out

"""kats_spark — a PySpark-native time-series analytics engine.

Re-expresses the operator surface of facebookresearch/Kats (reference at
/root/reference, MIT) as distributed Spark DataFrame / SQL / pandas-UDF
operators over *many series at once*.  The reference's single-series pandas
API (``kats/consts.py:156`` ``TimeSeriesData``) becomes a canonical long
DataFrame ``(series_id STRING, time TIMESTAMP, value DOUBLE)``; the
reference's Python loops over series (``kats/consts.py:1210``
``TimeSeriesIterator``) become ``groupBy("series_id")`` shuffles.

Design rules (scale-first):
- Declarative plans: every operator is built from ``pyspark.sql.functions``
  expressions so Catalyst can push filters/prune columns; pandas UDFs only
  for genuinely iterative math (model fits, recursions).
- One shuffle per per-series op: ``Window.partitionBy(series_id)``.
- Broadcast small dimensions; no driver-side ``collect()`` in operators.
"""

__version__ = "0.1.0"

from kats_spark.session import get_spark  # noqa: F401
from kats_spark.tsframe import TSSchema, ensure_sorted  # noqa: F401

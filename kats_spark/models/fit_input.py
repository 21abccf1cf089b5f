"""Compact the training input of an iterative MLlib fit.

An iterative trainer (GBT boosting rounds, L-BFGS iterations) schedules
one or more jobs PER ITERATION over the training frame, so its wall
clock is ``iterations x (per-task fixed cost x partitions + useful
work)``.  When the feature frame is small relative to its partition
count — the usual case after a window/shuffle stage whose partitioning
was sized for the corpus, not for the model's training subset — almost
all of that is empty-task scheduling overhead paid dozens of times
(guide §2.6/§5: per-job fixed costs, driver-bound loops).

``compact_fit_input``:

1. eagerly ``localCheckpoint``s the frame — the featurization pipeline
   runs ONCE and both the fit's internal passes and any subsequent
   ``model.transform`` over the same frame read materialized blocks
   instead of re-running the upstream plan (guide §5: twice-consumed
   subtrees), and
2. coalesces to ``ceil(n / rows_per_partition)`` partitions, capped at
   ``defaultParallelism`` — scale-adaptive, not a local[32] constant: a
   training set big enough to use the cluster keeps every core (the
   coalesce is a no-op), while a small one stops paying
   ``iterations x partitions`` scheduler rounds for partitions holding
   a handful of rows.

Numerics: coalesce only changes how per-partition partial aggregates
group, i.e. floating-point summation order inside the trainer's
treeAggregate.  Measured on the bench data: LogisticRegression p_good
BIT-IDENTICAL, GBT predictions within 8e-15 absolute (no split flips) —
pinned by tests/test_ml.py::test_compact_fit_input_equivalence.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame


def compact_fit_input(df: DataFrame, rows_per_partition: int = 16384) -> DataFrame:
    """Materialize ``df`` once and right-size its partition count for an
    iterative fit.  Returns a frame with identical rows.

    persist()+count(), not an eager localCheckpoint: the checkpoint
    additionally converts the (often deep) featurization plan to an RDD
    at call time — pure physical-planning cost the persist avoids (the
    r13 boundary measurement).  The coalesce is applied unconditionally:
    ``coalesce(n)`` with n >= the current partition count is a no-op, so
    the old ``ck.rdd.getNumPartitions()`` probe (itself an RDD
    conversion) buys nothing.  Partition layout — and therefore the
    trainer's treeAggregate summation order — is identical to the
    checkpointed form; equivalence stays pinned by
    tests/test_ml.py::test_compact_fit_input_equivalence."""
    ck = df.persist()
    n = ck.count()  # materializes the cached blocks
    target = max(
        1,
        min(
            df.sparkSession.sparkContext.defaultParallelism,
            math.ceil(n / float(rows_per_partition)),
        ),
    )
    return ck.coalesce(target)

"""CuPiK-style pipeline: chained DataFrame transformers.

Parity with kats/utils/cupik.py:42-329 (``Pipeline``: sklearn-like steps
where a detector can feed a remover, a transform, then a model).  Here a
step is any callable ``DataFrame -> DataFrame`` (every operator in this
package curries to that shape), so a pipeline is just function
composition over ONE lazy plan — Catalyst sees the whole chain and
optimizes across step boundaries (column pruning through all steps, no
materialization between them), which the reference's eager pandas steps
cannot do.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame


class Pipeline:
    """``Pipeline([("clean", f1), ("detect", f2)]).run(df)``."""

    def __init__(self, steps: list[tuple[str, Callable[[DataFrame], DataFrame]]]):
        if not steps:
            raise ValueError("Pipeline needs at least one step")
        names = [n for n, _ in steps]
        if len(set(names)) != len(names):
            raise ValueError(f"duplicate step names: {names}")
        self.steps = steps

    def run(self, df: DataFrame) -> DataFrame:
        out = df
        for _, fn in self.steps:
            out = fn(out)
        return out

    def __or__(self, other: "Pipeline") -> "Pipeline":
        return Pipeline(self.steps + other.steps)

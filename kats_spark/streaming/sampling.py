"""Streaming token-budget sampling: the stateful twin of the batch
greedy fill (operators/sampling.py token_budget_sample).

Batch semantics order documents by a seeded-md5 shuffle before the
prefix-sum fill; a stream has no global order to shuffle, so the
streaming sampler fills each bucket's budget in ARRIVAL order (micro-
batch sequence, then doc id within a batch — deterministic given the
same batch boundaries).  Same acceptance rule as batch: a document
whose START precedes the budget line is kept whole, so a bucket may
overshoot by at most one document, and every accepted row carries the
same ``n_tokens`` / ``cum_tokens`` audit columns.

Scale contract: state per bucket is ONE long (tokens consumed) — no
document content is ever held in state; the token count is computed in
the same Arrow batch that carries the row, and rejected documents cost
one counter comparison.  Buckets are the ``by`` key of the stateful
stage, so the shuffle is bucket-count-parallel and a bucket that filled
long ago keeps rejecting at state-lookup cost.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from kats_spark.operators.text import tokens


def _make_filler(budget_tokens: int):
    def fill(
        key: Tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        consumed = int(state.get[0]) if state.exists else 0
        out = []
        for pdf in pdfs:
            pdf = pdf.sort_values("doc_id")
            for doc_id, n_tok in zip(pdf["doc_id"], pdf["n_tokens"]):
                if consumed >= budget_tokens:
                    break
                consumed += int(n_tok)
                out.append((int(doc_id), int(n_tok), consumed))
        state.update((consumed,))
        if out:
            df = pd.DataFrame(out, columns=["doc_id", "n_tokens", "cum_tokens"])
            for i, col in enumerate(key):
                df.insert(i, f"__k{i}", col)
            yield df

    return fill


def streaming_budget_sample(
    stream: DataFrame,
    budget_tokens: int,
    by: list[str] = ("source", "lang"),
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Accepted-document stream: rows of ``by + (doc_id, n_tokens,
    cum_tokens)`` for every document that starts before its bucket's
    budget line, in arrival order.  Join accepted ids back to the
    payload stream (or a batch table) for the text."""
    by = list(by)
    keyed = stream.select(
        *by,
        F.col(id_col).alias("doc_id"),
        F.size(tokens(F.col(text_col))).alias("n_tokens"),
    )
    by_types = {f.name: f.dataType.simpleString() for f in keyed.schema.fields}
    out_fields = ", ".join(f"__k{i} {by_types[c]}" for i, c in enumerate(by))
    result = keyed.groupBy(*by).applyInPandasWithState(
        _make_filler(budget_tokens),
        outputStructType=(
            f"{out_fields}, doc_id bigint, n_tokens bigint, cum_tokens bigint"
        ),
        stateStructType="consumed bigint",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return result.select(
        *[F.col(f"__k{i}").alias(c) for i, c in enumerate(by)],
        "doc_id",
        "n_tokens",
        "cum_tokens",
    )

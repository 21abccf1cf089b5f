"""Streaming NEAR-duplicate detection: incremental MinHash-LSH over a
document stream.

The batch near-dup pipeline (operators/dedup.py minhash_lsh_pairs) is a
corpus self-join; on a stream the corpus is unbounded, so the join
becomes STATE: each (band, bucket) key holds the signatures it has seen,
and an arriving document is compared only against its own buckets'
residents — the same banded-candidate-generation shape as batch, with
`applyInPandasWithState` standing in for the self-join.

Scale contract:
- signatures are computed in one Arrow-batched pandas UDF (no window
  functions — streams forbid them; no per-row Python);
- the stateful stage is keyed on (band, bucket): state per key is a
  bounded FIFO of (doc_id, signature) pairs (``state_cap``), so a
  mega-bucket (template corpora) degrades to approximate recall instead
  of unbounded memory, and ProcessingTime timeout TTLs idle buckets;
- a doc appearing in several matching buckets emits one row per match —
  the caller dedups verdicts per doc downstream (dropDuplicates on a
  bounded output or any sink-side distinct).

Signature family: crc32 of each shingle string through ``num_hashes``
affine maps mod a 61-bit prime — deterministic across runs/engines (the
streaming==batch twin test pins it); NOT the portable-oracle family
(streams have no DuckDB oracle by nature).
"""

from __future__ import annotations

import json
import zlib
from typing import Any, Iterable, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_P = (1 << 61) - 1


def _hash_params(num_hashes: int, seed: int) -> list[tuple[int, int]]:
    import random

    rnd = random.Random(seed)
    return [(rnd.randrange(1, _P), rnd.randrange(0, _P)) for _ in range(num_hashes)]


def signature(text: str, num_hashes: int = 16, shingle_n: int = 3,
              seed: int = 7) -> list[int]:
    """MinHash signature of one document (crc32 shingle base hash +
    affine maps).  Pure function — shared by the streaming kernel, the
    batch twin, and tests."""
    toks = text.lower().split()
    if len(toks) < shingle_n:
        grams = [" ".join(toks)] if toks else [""]
    else:
        grams = [
            " ".join(toks[i: i + shingle_n])
            for i in range(len(toks) - shingle_n + 1)
        ]
    base = [zlib.crc32(g.encode("utf-8")) for g in set(grams)]
    params = _hash_params(num_hashes, seed)
    return [min((a * b + c) % _P for b in base) for a, c in params]


def _sig_udf(num_hashes: int, shingle_n: int, seed: int):
    @F.pandas_udf("array<long>")
    def sig(texts: pd.Series) -> pd.Series:
        return texts.map(
            lambda t: signature(t or "", num_hashes, shingle_n, seed)
        )

    return sig


def band_keys(
    df: DataFrame,
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    seed: int = 7,
) -> DataFrame:
    """(input columns) + signature + one row per band with its bucket
    hash — works on batch AND streaming frames (no window functions)."""
    rows_per_band = num_hashes // bands
    sig = _sig_udf(num_hashes, shingle_n, seed)
    with_sig = df.withColumn("__sig", sig(F.col(text_col)))
    bucket_cols = [
        F.xxhash64(
            F.lit(b),
            F.concat_ws(
                ",", *[F.col("__sig")[b * rows_per_band + i].cast("string")
                       for i in range(rows_per_band)]
            ),
        )
        for b in range(bands)
    ]
    return with_sig.select(
        "*", F.posexplode(F.array(*bucket_cols)).alias("__band", "__bucket")
    )


def _make_updater(match_frac: float, state_cap: int, timeout_ms: int):
    def update(
        key: Tuple[int, int],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if timeout_ms > 0 and state.hasTimedOut:
            state.remove()
            return
        residents: list[list[Any]] = (
            json.loads(state.get[0]) if state.exists else []
        )
        out = []
        for pdf in pdfs:
            pdf = pdf.sort_values("doc_id")
            for doc_id, sig in zip(pdf["doc_id"], pdf["__sig"]):
                sig = [int(x) for x in sig]  # Arrow hands numpy int64s
                best_id, best_frac = None, 0.0
                for rid, rsig in residents:
                    frac = sum(a == b for a, b in zip(sig, rsig)) / len(sig)
                    if frac > best_frac:
                        best_id, best_frac = rid, frac
                if best_frac >= match_frac:
                    out.append((int(doc_id), int(best_id), float(best_frac)))
                else:
                    residents.append([int(doc_id), sig])
                    if len(residents) > state_cap:
                        residents = residents[-state_cap:]
        state.update((json.dumps(residents),))
        if timeout_ms > 0:
            state.setTimeoutDuration(timeout_ms)
        if out:
            yield pd.DataFrame(
                out, columns=["doc_id", "matched_id", "est_jaccard"]
            )

    return update


def portable_band_keys(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    seed: int = 7,
) -> DataFrame:
    """STREAMING-SAFE portable MinHash band rows: the exact (id,
    band_id, key) values of the batch ``minhash_portable_sig`` +
    ``minhash_band_rows`` pipeline (operators/dedup.py), computed as a
    pure projection — no windows, no aggregations — so the same
    expression tree runs on a batch frame and inside a streaming
    micro-batch (equivalence asserted in tests/test_streaming.py).

    The batch path aggregates exploded shingle ROWS (groupBy(id).min);
    streams forbid that shape in append mode, so here the shingle set
    stays an ARRAY column and each signature slot is
    ``array_min(transform(hashes, h -> (h*a + b) % p))`` — min over the
    gram multiset equals min over the distinct set, so the families
    agree exactly.  Every HOF input is staged as a bound column first
    (the per-element re-evaluation trap: a lambda referencing a
    computed array expression inlines and re-executes it per element)."""
    from kats_spark.operators.dedup import (
        _P as _PP,
        _hash_params as _portable_params,
        normalize,
        tokens,
    )

    rpb = num_hashes // bands
    t = tokens(normalize(F.col(text_col)))
    staged = df.select(F.col(id_col), t.alias("__t"))
    idx = F.sequence(F.lit(1), F.greatest(F.size("__t") - (shingle_n - 1), F.lit(1)))
    grams = F.transform(
        idx, lambda i: F.array_join(F.slice(F.col("__t"), i, shingle_n), " ")
    )
    staged = staged.select(F.col(id_col), grams.alias("__g"))
    # 31-base polynomial hash per gram (poly_hash_expr as a lambda body;
    # __g is a bound column so the per-element walk runs once per gram)
    staged = staged.select(
        F.col(id_col),
        F.expr(
            "transform(__g, g -> aggregate(transform(sequence(1, length(g)), "
            "i -> bigint(ascii(substr(g, i, 1)))), 0L, "
            f"(h, c) -> (h * 31 + c) % {_PP}))"
        ).alias("__h"),
    )
    params = _portable_params(num_hashes, seed)
    mins = [
        F.array_min(
            F.expr(f"transform(__h, h -> (h * {a}L + {b}L) % {_PP})")
        ).alias(f"__m{k}")
        for k, (a, b) in enumerate(params)
    ]
    sig = staged.select(F.col(id_col), *mins)
    band_structs = [
        F.struct(
            F.lit(j).alias("band_id"),
            F.concat_ws(
                ",",
                *[
                    F.col(f"__m{j * rpb + r}").cast("string")
                    for r in range(rpb)
                ],
            ).alias("key"),
        )
        for j in range(bands)
    ]
    return sig.select(
        F.col(id_col), F.explode(F.array(*band_structs)).alias("__b")
    ).select(
        id_col,
        F.col("__b.band_id").alias("band_id"),
        F.col("__b.key").alias("key"),
    )


def streaming_incremental_neardup(
    stream: DataFrame,
    corpus_bands: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    seed: int = 7,
) -> DataFrame:
    """Streaming twin of ``incremental_neardup_pairs`` /
    ``incremental_neardup_stored``: each micro-batch of arriving
    documents computes its portable band rows as a pure projection and
    STREAM-STATIC joins the standing corpus's saved band index
    (``corpus_bands`` = ``spark.table(band_table)`` from
    ``sources.ann_store.save_band_index``, or any static (corpus_id,
    band_id, key) frame).  Same candidate set as the batch join —
    asserted batch==streaming in tests; a pair matching in several
    bands emits once per band (streams can't re-shuffle history for a
    global distinct), so callers take DISTINCT downstream, exactly the
    ``streaming_neardup`` verdict contract.

    100 TB shape: the corpus side is the bucketed band table — the
    micro-batch side (thousands of rows) broadcasts or shuffles, the
    corpus never moves; identical to the batch stored path."""
    bn = portable_band_keys(
        stream, text_col, id_col, num_hashes, bands, shingle_n, seed
    ).withColumnRenamed(id_col, "new_id")
    return bn.join(corpus_bands, ["band_id", "key"]).select(
        "new_id", "corpus_id"
    )


def streaming_neardup(
    stream: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    seed: int = 7,
    match_frac: float = 0.6,
    state_cap: int = 256,
    timeout_minutes: int = 0,
) -> DataFrame:
    """Near-dup verdict stream: one output row per (new doc, matching
    bucket) with the best-matching resident and the signature-agreement
    fraction (the MinHash estimate of Jaccard).  New non-matching docs
    are absorbed into their buckets' state.  A doc id may appear once
    per agreeing band — distinct downstream for per-doc verdicts.

    ``timeout_minutes > 0`` enables a ProcessingTime TTL that evicts
    idle buckets (the unbounded-state guard for production streams).
    OFF by default: with a registered processing-time timeout the
    engine schedules continuous no-data "cleaning up state" batches, so
    ``processAllAvailable()`` never idles — fine for an always-on
    deployment, a hang for drain-the-source batch-style runs."""
    keyed = band_keys(
        stream.select(F.col(id_col).alias("doc_id"), F.col(text_col)),
        text_col, num_hashes, bands, shingle_n, seed,
    ).select("__band", "__bucket", "doc_id", "__sig")
    timeout_conf = (
        GroupStateTimeout.ProcessingTimeTimeout
        if timeout_minutes > 0
        else GroupStateTimeout.NoTimeout
    )
    return keyed.groupBy("__band", "__bucket").applyInPandasWithState(
        _make_updater(match_frac, state_cap, timeout_minutes * 60_000),
        outputStructType="doc_id bigint, matched_id bigint, est_jaccard double",
        stateStructType="s string",
        outputMode="append",
        timeoutConf=timeout_conf,
    )

"""Synthetic detection-metadata reader — parity with
``kats/detectors/meta_learning/synth_metadata_reader.py:1-89``
(``SynthMetadataReader``): the loader that turns the packaged
1000-row synthetic sample (columns ``idx``, ``features``, ``hpt_res``
— the latter two stringified dicts) into

  * ``data_x`` — the features expanded to one column each, and
  * ``data_y[algorithm]`` — that algorithm's best hyper-parameters
    expanded to one column each, with the reference's
    ``PARAMS_TO_SCALE_DOWN`` (window/segment lengths recorded in
    seconds) divided by 86 400 into days,

feeding the detection meta-learners (``detector_hpt`` /
``detector_select`` / ``metadata_tournament`` in
``kats_spark/models/metalearner.py``).

Spark shape: the reference file is a BOUNDED sample (1 000 rows,
shipped inside the package and loaded via ``pkgutil``), and every
consumer broadcasts the metadata bank — so the parse runs driver-side
on pandas (``ast.literal_eval``, never ``eval``) and the result is
parallelized once.  Corpus-scale metadata would arrive as parquet with
real columns and skip this shim entirely.
"""

from __future__ import annotations

import ast
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

NUM_SECS_IN_DAY = 3600 * 24
#: reference SynthMetadataReader.PARAMS_TO_SCALE_DOWN — second-valued
#: HPs rescaled to days
PARAMS_TO_SCALE_DOWN = {"n_control", "n_test", "historical_window", "scan_window"}


def _parse(cell: str) -> Any:
    """Python-repr dict cell (the reference stores ``str(dict)`` and
    ``eval``s it back) — parsed with ``ast.literal_eval``: same accepted
    grammar for literal payloads, no code execution."""
    return ast.literal_eval(cell) if isinstance(cell, str) else cell


def load_synth_metadata(
    spark: SparkSession, raw: pd.DataFrame
) -> tuple[DataFrame, dict[str, DataFrame]]:
    """Reference ``get_metadata`` over all algorithms at once: returns
    (data_x, {algorithm: data_y}) as Spark frames keyed by ``idx``.

    * ``data_x`` — every feature dict value cast to float (reference
      line 55: ``{k: float(v) ...}``), one column per feature;
    * ``data_y[a]`` — ``hpt_res[a][0]`` (the best-params dict; element
      1 is the achieved error, which the reference reader drops), with
      ``PARAMS_TO_SCALE_DOWN`` divided into days (reference lines
      71-80)."""
    feats = raw["features"].map(_parse).map(
        lambda d: {k: float(v) for k, v in d.items()}
    )
    data_x = pd.DataFrame(list(feats), index=raw.index)
    data_x.insert(0, "idx", raw["idx"].astype(str).values)

    hpt = raw["hpt_res"].map(_parse)
    algorithms: list[str] = []
    for kv in hpt:
        for a in kv:
            if a not in algorithms:
                algorithms.append(a)

    data_y: dict[str, DataFrame] = {}
    for a in algorithms:
        params = hpt.map(
            lambda kv, a=a: {
                k: (v / NUM_SECS_IN_DAY if k in PARAMS_TO_SCALE_DOWN else v)
                for k, v in kv[a][0].items()
            }
        )
        pdf = pd.DataFrame(list(params), index=raw.index)
        pdf.insert(0, "idx", raw["idx"].astype(str).values)
        data_y[a] = spark.createDataFrame(pdf)
    return spark.createDataFrame(data_x), data_y


def load_synth_metadata_csv(
    spark: SparkSession, path: str
) -> tuple[DataFrame, dict[str, DataFrame]]:
    """Reference ``_get_raw_data`` + ``get_metadata`` from a CSV in the
    packaged-sample format (index column 0; ``idx`` kept as object)."""
    raw = pd.read_csv(path, index_col=0, dtype={"idx": object}, encoding="utf8")
    return load_synth_metadata(spark, raw)


def metadata_bank(
    data_x: DataFrame,
    data_y: dict[str, DataFrame],
    feature_cols: list[str] | None = None,
) -> DataFrame:
    """Stack the per-algorithm frames into the ONE bank
    ``detector_hpt``/``detector_select`` consume: (meta_id,
    detector_type, <features>, <that algorithm's HPs>) — algorithms
    with different HP schemas union by name with nulls filled, exactly
    how a per-type filter then sees only its own columns populated.
    ``meta_id`` is the row's ``idx`` re-keyed per algorithm so ids stay
    unique across types."""
    fcols = feature_cols or [c for c in data_x.columns if c != "idx"]
    pieces = []
    for algo in sorted(data_y):
        piece = data_x.select("idx", *fcols).join(data_y[algo], "idx")
        pieces.append(piece.withColumn("detector_type", F.lit(algo)))
    out = pieces[0]
    for piece in pieces[1:]:
        out = out.unionByName(piece, allowMissingColumns=True)
    return out.withColumn(
        "meta_id",
        F.xxhash64(F.concat_ws(":", F.col("detector_type"), F.col("idx"))),
    ).drop("idx")

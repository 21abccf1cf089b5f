"""SynthMetadataReader parity shim (sources/synth_metadata.py vs
reference kats/detectors/meta_learning/synth_metadata_reader.py:1-89).
"""

import os
import textwrap

import pytest
from pyspark.sql import functions as F

from kats_spark.sources.synth_metadata import (
    NUM_SECS_IN_DAY,
    load_synth_metadata_csv,
    metadata_bank,
)

_REF_CSV = (
    "/root/reference/kats/data/"
    "meta_learning_detection_training_data_pmo_sample_1000.csv"
)


@pytest.fixture(scope="module")
def csv_path(tmp_path_factory):
    """Two-row sample in the packaged format: index col 0, idx kept as
    object, features/hpt_res as Python-repr dicts, hpt_res values =
    (best_params, achieved_error) per algorithm."""
    rows = textwrap.dedent(
        """\
        ,idx,hpt_res,features,best_model
        7,0007,"{'cusum': ({'delta_std_ratio': 2.5, 'scan_window': 1296000, 'historical_window': 345600, 'score_func': 'change'}, 0.0), 'statsig': ({'n_control': 3196800.0, 'n_test': 3110400.0}, 0.25)}","{'length': '89.0000', 'mean': '-1.0675', 'var': '0.6495'}",cusum
        8,0008,"{'cusum': ({'delta_std_ratio': 1.5, 'scan_window': 864000, 'historical_window': 172800, 'score_func': 'percentage'}, 0.1), 'statsig': ({'n_control': 864000.0, 'n_test': 432000.0}, 0.0)}","{'length': '55.0000', 'mean': '2.5000', 'var': '1.2500'}",statsig
        """
    )
    p = tmp_path_factory.mktemp("synth") / "sample.csv"
    p.write_text(rows)
    return str(p)


def test_reader_expands_and_scales(spark, csv_path):
    data_x, data_y = load_synth_metadata_csv(spark, csv_path)
    x = {r.idx: r for r in data_x.collect()}
    assert set(x) == {"0007", "0008"}
    assert x["0007"].length == 89.0 and x["0007"].mean == -1.0675
    assert x["0008"].var == 1.25  # string values cast to float

    assert set(data_y) == {"cusum", "statsig"}
    cu = {r.idx: r for r in data_y["cusum"].collect()}
    # PARAMS_TO_SCALE_DOWN divide by 86400; others untouched
    assert cu["0007"].scan_window == 1296000 / NUM_SECS_IN_DAY
    assert cu["0007"].historical_window == 345600 / NUM_SECS_IN_DAY
    assert cu["0007"].delta_std_ratio == 2.5
    assert cu["0008"].score_func == "percentage"
    st = {r.idx: r for r in data_y["statsig"].collect()}
    assert st["0007"].n_control == 3196800.0 / NUM_SECS_IN_DAY
    assert st["0008"].n_test == 432000.0 / NUM_SECS_IN_DAY
    # the achieved-error tuple element is dropped (reference kv[a][0])
    assert "0.25" not in str(data_y["statsig"].columns)


def test_bank_feeds_detector_hpt_end_to_end(spark, csv_path):
    """The reader's output schema drives detector_hpt unmodified: bank
    rows keyed by detector_type, kNN recommendation over the reader's
    feature columns returns the nearest example's HPs (k=1)."""
    from kats_spark.models.metalearner import detector_hpt

    data_x, data_y = load_synth_metadata_csv(spark, csv_path)
    bank = metadata_bank(data_x, data_y)
    assert set(bank.select("detector_type").distinct().toPandas().detector_type) == {
        "cusum",
        "statsig",
    }
    ids = bank.select("meta_id").toPandas().meta_id
    assert ids.nunique() == len(ids)  # unique across types

    series_feats = spark.createDataFrame(
        [(101, 88.0, -1.0, 0.65), (102, 50.0, 2.0, 1.30)],
        "series_id bigint, length double, mean double, var double",
    )
    rec = detector_hpt(
        series_feats,
        bank,
        "cusum",
        ["length", "mean", "var"],
        numerical_hps=["scan_window", "historical_window", "delta_std_ratio"],
        categorical_hps=["score_func"],
        k=1,
    ).collect()
    got = {r.series_id: r for r in rec}
    assert set(got) == {101, 102}
    # series 101 sits next to idx 0007, series 102 next to idx 0008
    assert got[101].score_func == "change"
    assert got[101].scan_window == pytest.approx(15.0)
    assert got[102].score_func == "percentage"
    assert got[102].scan_window == pytest.approx(10.0)
    assert all(r.detector_type == "cusum" for r in rec)


@pytest.mark.skipif(not os.path.exists(_REF_CSV), reason="reference data absent")
def test_reader_on_reference_sample(spark):
    """The packaged 1000-row sample loads with the reference's shapes:
    every feature column float, second-valued windows rescaled to
    days."""
    data_x, data_y = load_synth_metadata_csv(spark, _REF_CSV)
    assert data_x.count() == 1000
    assert len(data_x.columns) >= 30  # 37 TsFeatures + idx in the sample
    assert {"cusum", "statsig", "bocpd"} <= set(data_y)
    cu = data_y["cusum"].limit(50).toPandas()
    # scan_window arrives in seconds (multi-day magnitudes); scaled down
    # it must land in a plausible day range, not raw seconds
    assert cu.scan_window.max() < 120
    assert cu.scan_window.min() > 0

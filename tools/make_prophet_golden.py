#!/usr/bin/env python
"""Generate tests/golden/prophet_lite_golden.json.

PROVENANCE: every expected value in the golden file is computed here
from the CLOSED FORM of the published Prophet model (Taylor & Letham
2017) on constructed inputs where the MAP estimate is analytic —
NOT by running ProphetLite (that would be a self-test) and NOT by
running fbprophet (absent from this container; the file format carries
a `source` field so a real-fbprophet regeneration can drop in when the
dependency is available).

Cases:
1. noiseless linear trend, no seasonality: MAP trend = the exact line
   (flat priors on k, m; the Laplace changepoint prior keeps deltas at
   0 because the data has no curvature);
2. linear trend + exact weekly sinusoid: the weekly Fourier basis
   contains the signal, so the MAP fit reproduces y exactly up to the
   (negligible at sigma ~ 0) ridge shrinkage;
3. noiseless logistic growth, known (k, m, cap): the curve itself.
"""

import json
import os

import numpy as np

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "golden",
                   "prophet_lite_golden.json")


def main() -> None:
    cases = []

    # case 1: linear
    n, h = 200, 20
    a, b = 7.5, 0.35  # y = a + b * day
    t_hist = np.arange(n, dtype=float)
    t_fut = np.arange(n, n + h, dtype=float)
    cases.append(
        {
            "name": "linear_trend",
            "start": "2022-01-01",
            "n": n,
            "horizon": h,
            "y_expr": {"kind": "linear", "a": a, "b": b},
            "y": (a + b * t_hist).tolist(),
            "expected_fcst": (a + b * t_fut).tolist(),
            "rtol": 1e-6,
            "source": "analytic closed form (this script)",
        }
    )

    # case 2: linear + weekly sinusoid (first weekly Fourier harmonic)
    amp, phase = 3.0, 0.6
    y2 = a + b * t_hist + amp * np.sin(2 * np.pi * t_hist / 7.0 + phase)
    exp2 = a + b * t_fut + amp * np.sin(2 * np.pi * t_fut / 7.0 + phase)
    cases.append(
        {
            "name": "linear_plus_weekly",
            "start": "2022-01-01",
            "n": n,
            "horizon": h,
            "y_expr": {"kind": "linear+sin7", "a": a, "b": b, "amp": amp,
                        "phase": phase},
            "y": y2.tolist(),
            "expected_fcst": exp2.tolist(),
            "rtol": 2e-3,  # ridge prior on the Fourier block shrinks ~0.1%
            "source": "analytic closed form (this script)",
        }
    )

    # case 3: logistic
    cap, k, m_frac = 50.0, 8.0, 0.45
    ts = t_hist / (n - 1)
    tf = t_fut / (n - 1)
    y3 = cap / (1.0 + np.exp(-k * (ts - m_frac)))
    exp3 = cap / (1.0 + np.exp(-k * (tf - m_frac)))
    cases.append(
        {
            "name": "logistic_growth",
            "start": "2022-01-01",
            "n": n,
            "horizon": h,
            "cap": cap,
            "y_expr": {"kind": "logistic", "cap": cap, "k": k,
                        "m_frac": m_frac},
            "y": y3.tolist(),
            "expected_fcst": exp3.tolist(),
            "rtol": 5e-3,
            "source": "analytic closed form (this script)",
        }
    )

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump({"format_version": 1, "cases": cases}, f, indent=1)
    print(f"wrote {OUT} ({len(cases)} cases)")


if __name__ == "__main__":
    main()

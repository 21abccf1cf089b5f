"""Generate reference-library parity goldens by RUNNING the libraries —
superseded for the committed suite by ``tools/extract_reference_goldens.py``,
which pins the statsmodels/prophet outputs the reference repo itself ships
in kats/tests/models/test_models_dummy_data.py (no library install
needed).  Keep this generator for adding NEW fixtures the reference has no
golden for — run it outside the build container, anywhere statsmodels
(and optionally prophet) are installed:

    python tools/make_reference_goldens.py
    git add tests/golden/reference_goldens.json

The output JSON pins, per case, the library's point forecasts on the
canonical fixtures from ``kats_spark.sources.parity_fixtures`` plus
provenance (library versions, generation date, fixture spec).  Libraries
that are missing are skipped with a note, so a statsmodels-only
environment still produces the ARIMA/SARIMA/Holt-Winters goldens.

``tests/test_reference_goldens.py`` then compares OUR estimators against
these numbers at the per-case rtol recorded here (ARIMA/SARIMA 0.005 —
mirroring kats/tests/models/test_arima_model.py:26 — Holt-Winters 0.03
and Prophet 0.05, looser because those fits grid/MAP over different
parameterizations than the libraries' continuous optimizers), and
auto-skips any case whose golden is absent.
"""

from __future__ import annotations

import datetime
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from kats_spark.sources.parity_fixtures import airline_like, arma_2_1, prophet_daily

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "golden", "reference_goldens.json",
)
HORIZON = 24


def main() -> None:
    cases = []
    versions: dict[str, str] = {}

    try:
        import statsmodels
        from statsmodels.tsa.holtwinters import ExponentialSmoothing
        from statsmodels.tsa.statespace.sarimax import SARIMAX

        versions["statsmodels"] = statsmodels.__version__

        _, y = arma_2_1()
        res = SARIMAX(y, order=(2, 0, 1), trend="c").fit(disp=False)
        cases.append(
            {
                "name": "arima_2_0_1",
                "fixture": "arma_2_1",
                "model": "arima",
                "order": [2, 0, 1],
                "horizon": HORIZON,
                "rtol": 0.005,
                "fcst": [float(v) for v in res.forecast(HORIZON)],
                "params": {k: float(v) for k, v in res.params.items()}
                if hasattr(res.params, "items")
                else [float(v) for v in res.params],
            }
        )

        _, y = airline_like()
        res = SARIMAX(
            y, order=(1, 1, 1), seasonal_order=(1, 1, 1, 12)
        ).fit(disp=False)
        cases.append(
            {
                "name": "sarima_111_111_12",
                "fixture": "airline_like",
                "model": "sarima",
                "order": [1, 1, 1],
                "seasonal_order": [1, 1, 1, 12],
                "horizon": HORIZON,
                "rtol": 0.005,
                "fcst": [float(v) for v in res.forecast(HORIZON)],
            }
        )

        _, y = airline_like()
        hw = ExponentialSmoothing(
            y, trend="add", seasonal="add", seasonal_periods=12,
            initialization_method="estimated",
        ).fit()
        cases.append(
            {
                "name": "hw_add_add_12",
                "fixture": "airline_like",
                "model": "holtwinters",
                "period": 12,
                "horizon": HORIZON,
                "rtol": 0.03,
                "fcst": [float(v) for v in hw.forecast(HORIZON)],
            }
        )
    except ImportError as exc:  # pragma: no cover - environment dependent
        print(f"statsmodels unavailable, skipping its cases: {exc}")

    try:
        import pandas as pd
        from prophet import Prophet

        import prophet as prophet_pkg

        versions["prophet"] = prophet_pkg.__version__
        times, y = prophet_daily()
        m = Prophet(
            yearly_seasonality=False, weekly_seasonality=True,
            daily_seasonality=False,
        )
        m.fit(pd.DataFrame({"ds": pd.to_datetime(times), "y": y}))
        fut = m.make_future_dataframe(periods=HORIZON, include_history=False)
        cases.append(
            {
                "name": "prophet_weekly_cp",
                "fixture": "prophet_daily",
                "model": "prophet",
                "horizon": HORIZON,
                "rtol": 0.05,
                "fcst": [float(v) for v in m.predict(fut)["yhat"]],
            }
        )
    except ImportError as exc:  # pragma: no cover - environment dependent
        print(f"prophet unavailable, skipping its case: {exc}")

    if not cases:
        print("no reference libraries importable — nothing written")
        return
    doc = {
        "format_version": 1,
        "generated": datetime.date.today().isoformat(),
        "versions": versions,
        "numpy": np.__version__,
        "cases": cases,
    }
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(doc, f, indent=1)
    print(f"wrote {len(cases)} cases to {OUT} (versions: {versions})")


if __name__ == "__main__":
    main()

"""Forecasting models: per-series Arrow-batched kernels (the fit is the
only imperative part; fan-out across series is the groupBy shuffle), plus
closed-form models that need no Python at all (linear/quadratic trend in
operators.trend, AR(p) here)."""

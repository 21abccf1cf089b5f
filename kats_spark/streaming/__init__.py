"""Structured-Streaming surface: incremental DetectorModels as stateful
per-series operators (kats/detectors/detector.py:137-207 contract)."""

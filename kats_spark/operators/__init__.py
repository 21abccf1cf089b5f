"""Composite operators: resampling, decomposition, detectors, forecasters,
and large-scale data-pipeline ops (dedup / similarity / text)."""

"""Declared query plans: each engine operator exposed as a (spark, sf_dir)
-> DataFrame callable plus a DuckDB oracle SQL string for the correctness
harness."""

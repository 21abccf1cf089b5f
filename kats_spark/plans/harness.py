"""Local oracle harness — mirrors the driver's t2 correctness check:
run the Spark query and the DuckDB oracle on the same sf dir, compare
row count, column names, and order-insensitive values (exact, because
both sides round explicitly)."""

from __future__ import annotations

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_run(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con.execute(sql).df()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith(("int", "uint", "Int")):
            df[c] = df[c].astype("int64")
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].astype("float64")
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def _kind(dt) -> str:
    s = str(dt)
    if s.startswith(("int", "uint", "Int", "UInt")):
        return "int"
    if s.startswith(("float", "Float")):
        return "float"
    if s.startswith("datetime"):
        return "dt"
    if s.startswith("bool"):
        return "bool"
    return "obj"


def compare(spark_df, oracle_pdf: pd.DataFrame) -> tuple[bool, str]:
    raw_got = spark_df.toPandas()
    # dtype-KIND parity guard: the driver's value-hash is dtype-sensitive
    # (r03's corpus_sample red row was DuckDB sum(BIGINT)->HUGEINT->
    # pandas float64 vs Spark int64 — values equal, hash differs), so a
    # kind mismatch fails HERE even though normalize() would hide it.
    kinds_g = {c: _kind(raw_got.dtypes[c]) for c in raw_got.columns}
    kinds_e = {c: _kind(oracle_pdf.dtypes[c]) for c in oracle_pdf.columns}
    bad = [
        (c, kinds_g[c], kinds_e[c])
        for c in kinds_g
        if c in kinds_e and kinds_g[c] != kinds_e[c]
    ]
    if bad:
        return False, f"dtype-kind mismatch (driver-hash hazard): {bad}"
    got = normalize(raw_got)
    exp = normalize(oracle_pdf)
    if list(got.columns) != list(exp.columns):
        return False, f"columns differ: {list(got.columns)} vs {list(exp.columns)}"
    if len(got) != len(exp):
        return False, f"row count differs: {len(got)} vs {len(exp)}"
    try:
        pd.testing.assert_frame_equal(got, exp, check_dtype=False, check_exact=True)
        return True, "ok"
    except AssertionError as e:
        # retry with tolerance to distinguish fp jitter from real bugs
        try:
            pd.testing.assert_frame_equal(got, exp, check_dtype=False, rtol=1e-6, atol=1e-6)
            return False, f"NEAR-MATCH (fp jitter only): {str(e)[:500]}"
        except AssertionError as e2:
            return False, str(e2)[:800]

"""Local replica of the driver's DuckDB-oracle correctness check:
row-count + schema-width + order-insensitive exact value comparison,
columns sorted by name (SURVEY.md §5 / __spark_entry__ docstring)."""

from __future__ import annotations

import math
from typing import Any

import duckdb
import pandas as pd

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm_cell(v: Any) -> Any:
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return v
    return v


def normalize(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)]
    rows = [tuple(_norm_cell(v) for v in row) for row in df.itertuples(index=False)]
    return sorted(rows, key=repr)


def compare(spark_df, oracle_df: pd.DataFrame) -> tuple[bool, str]:
    sp = spark_df.toPandas()
    if len(sp) != len(oracle_df):
        return False, f"row count: spark={len(sp)} oracle={len(oracle_df)}"
    if sorted(sp.columns) != sorted(oracle_df.columns):
        return False, f"columns: spark={sorted(sp.columns)} oracle={sorted(oracle_df.columns)}"
    a, b = normalize(sp), normalize(oracle_df)
    n_bad = 0
    first_bad = ""
    max_float_delta = 0.0
    for ra, rb in zip(a, b):
        if ra == rb:
            continue
        ok = True
        for va, vb in zip(ra, rb):
            if va == vb or (va is None and vb is None):
                continue
            if isinstance(va, float) and isinstance(vb, float):
                max_float_delta = max(max_float_delta, abs(va - vb))
                ok = False
            elif hasattr(va, "timestamp") and hasattr(vb, "timestamp"):
                if va != vb:
                    ok = False
            else:
                ok = False
        if not ok:
            n_bad += 1
            if not first_bad:
                first_bad = f"first mismatch:\n spark={ra}\n duck ={rb}"
    if n_bad:
        return (
            False,
            f"{n_bad}/{len(a)} rows mismatch; max float delta={max_float_delta:.3e}; {first_bad}",
        )
    return True, "ok"

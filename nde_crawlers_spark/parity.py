"""Local mirror of the driver's correctness gate: run each catalog query
on Spark and its oracle SQL on DuckDB over the same parquet, compare
row count + schema + order-insensitive values. Used by tests and by the
pre-flight check before every round submission."""

from __future__ import annotations

import math

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def duck_con(sf_dir: str):
    con = duckdb.connect()
    for tb in TABLES:
        con.execute(f"CREATE VIEW {tb} AS SELECT * FROM '{sf_dir}/{tb}.parquet'")
    return con


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def compare(spark_df: pd.DataFrame, oracle_df: pd.DataFrame) -> tuple[bool, str]:
    if len(spark_df) != len(oracle_df):
        return False, f"row count {len(spark_df)} vs {len(oracle_df)}"
    if sorted(spark_df.columns) != sorted(oracle_df.columns):
        return False, f"columns {sorted(spark_df.columns)} vs {sorted(oracle_df.columns)}"
    a, b = _norm(spark_df), _norm(oracle_df)
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            ok = all(
                (math.isnan(x) and math.isnan(y)) or abs(x - y) <= 1e-9
                for x, y in zip(av.astype(float).fillna(float("nan")), bv.astype(float).fillna(float("nan")))
            )
        else:
            ok = av.astype(str).tolist() == bv.astype(str).tolist()
        if not ok:
            bad = [(x, y) for x, y in zip(av.tolist(), bv.tolist()) if str(x) != str(y)][:3]
            return False, f"column {c} differs, e.g. {bad}"
    return True, "ok"


def run_parity(spark, sf_dir: str, names: list[str] | None = None) -> dict[str, str]:
    """-> {query_name: 'ok' | error message}; raises nothing."""
    from .oracles import ORACLES
    from .queries import QUERIES

    con = duck_con(sf_dir)
    out: dict[str, str] = {}
    for name, fn in QUERIES.items():
        if names and name not in names:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            out[name] = f"SPARK ERROR: {e}"
            continue
        if name not in ORACLES:
            out[name] = f"no-oracle rows={len(sdf)}"
            continue
        try:
            odf = con.execute(ORACLES[name]).df()
        except Exception as e:  # noqa: BLE001
            out[name] = f"ORACLE ERROR: {str(e)[:300]}"
            continue
        ok, msg = compare(sdf, odf)
        out[name] = "ok" if ok else f"MISMATCH: {msg}"
    return out

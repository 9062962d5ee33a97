"""Local replica of the driver's differential check: run a registered
PySpark query and its DuckDB oracle on the same sf dir, compare row
count, column names, and order-insensitive values."""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from transit_feed_etl_spark.io import TABLES


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con.execute(sql).fetchdf()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            # array-typed columns surface as ndarray (duckdb) / list
            # (spark) cells — neither sortable/hashable; normalize both
            # to tuples so the order-insensitive compare works
            def _tupled(v):
                if isinstance(v, (str, bytes)) or v is None:
                    return v
                if isinstance(v, (list, tuple)) or hasattr(v, "tolist"):
                    return tuple(v)
                return v

            df[c] = df[c].map(_tupled)
    return df.sort_values(by=list(df.columns), ignore_index=True, na_position="first")


def _kind(dtype) -> str:
    """Type family for the typed-hash gate: the driver hashes values WITH
    their types, so spark 1.0 (double) vs oracle 1 (tinyint) is a driver
    hash-fail even though Python == says equal (r1 postmortem:
    math_functions / map_entry_stats). Width differences (int32 vs int64)
    hash identically; family differences (int vs float) do not."""
    k = getattr(dtype, "kind", "O")
    return {"i": "int", "u": "int", "f": "float", "b": "bool", "M": "ts"}.get(k, "obj")


def compare(spark_df, oracle_df: pd.DataFrame, float_exact: bool = True) -> list[str]:
    """Return a list of mismatch descriptions (empty == match)."""
    problems: list[str] = []
    sp = spark_df.toPandas()
    if sorted(sp.columns) != sorted(oracle_df.columns):
        problems.append(f"columns differ: spark={sorted(sp.columns)} oracle={sorted(oracle_df.columns)}")
        return problems
    for c in sorted(sp.columns):
        ks, ko = _kind(sp[c].dtype), _kind(oracle_df[c].dtype)
        # all-NULL columns surface as object/float — only flag when both
        # sides carry a definite, different numeric family
        if ks != ko and "obj" not in (ks, ko):
            problems.append(
                f"col {c}: type family differs (spark {sp[c].dtype}={ks} "
                f"vs oracle {oracle_df[c].dtype}={ko}) — driver typed-hash would fail"
            )
    if problems:
        return problems
    if len(sp) != len(oracle_df):
        problems.append(f"row count differs: spark={len(sp)} oracle={len(oracle_df)}")
        return problems
    a, b = _canon(sp), _canon(oracle_df)
    for c in a.columns:
        av, bv = a[c].tolist(), b[c].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            x_null = x is None or (not isinstance(x, (tuple, list)) and pd.isna(x))
            y_null = y is None or (not isinstance(y, (tuple, list)) and pd.isna(y))
            if x_null or y_null:
                if x_null and y_null:  # None / nan / NaT all count as NULL
                    continue
                problems.append(f"col {c} row {i}: spark {x!r} vs oracle {y!r}")
                break
            if isinstance(x, float) and isinstance(y, float):
                if x == y or (not float_exact and math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-9)):
                    continue
                problems.append(f"col {c} row {i}: spark {x!r} != oracle {y!r}")
                break
            if x != y:
                problems.append(f"col {c} row {i}: spark {x!r} != oracle {y!r} ({type(x)} vs {type(y)})")
                break
    return problems

"""Local replica of the driver's t2 oracle check.

Runs every declared query through Spark AND its DuckDB oracle at a given
sf_dir, then compares row count, column names, and values (rows sorted,
columns sorted by name — order-insensitive like the driver). Exact
equality is required for non-floats; floats must match bit-for-bit too
(our plans force DECIMAL accumulation / rounding precisely so they do),
but a max-abs-diff is reported to localize any failure.

Usage: python tools/parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import traceback

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nthu_cs542200_parallel_programming_hw4_mapreduce_spark import registry
from nthu_cs542200_parallel_programming_hw4_mapreduce_spark.catalog import TABLES
from nthu_cs542200_parallel_programming_hw4_mapreduce_spark.session import get_spark


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, normalize dtypes, sort rows."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def dtype_drift(spark_df: pd.DataFrame, duck_df: pd.DataFrame) -> list[str]:
    """Flag declared-dtype divergence BEFORE canon() papers over it.

    The driver hashes raw values, so an oracle SUM that DuckDB types as
    HUGEINT (→ object/float in pandas) hash-mismatches Spark's int64 even
    when values are equal — the exact class of the round-1 tpch_q12 red
    row, which canon()'s int64 normalization hid locally.  Mixed
    int-vs-float or int-vs-object on the same column is a failure here.
    """
    out = []
    for c in sorted(set(spark_df.columns) & set(duck_df.columns)):
        s, d = spark_df[c], duck_df[c]
        kind = lambda v: (
            "int" if pd.api.types.is_integer_dtype(v)
            else "float" if pd.api.types.is_float_dtype(v)
            else "datetime" if pd.api.types.is_datetime64_any_dtype(v)
            else "other"
        )
        ks, kd = kind(s), kind(d)
        if ks != kd and not (len(s) == 0 and len(d) == 0):
            out.append(
                f"dtype drift col {c!r}: spark={s.dtype} ({ks}) vs "
                f"duck={d.dtype} ({kd}) — driver hash would mismatch; "
                f"CAST the oracle column"
            )
    return out


def compare(name: str, spark_df: pd.DataFrame, duck_df: pd.DataFrame) -> list[str]:
    problems: list[str] = []
    if sorted(spark_df.columns) != sorted(duck_df.columns):
        return [f"columns differ: spark={sorted(spark_df.columns)} duck={sorted(duck_df.columns)}"]
    problems.extend(dtype_drift(spark_df, duck_df))
    if len(spark_df) != len(duck_df):
        return [f"row count differs: spark={len(spark_df)} duck={len(duck_df)}"]
    s, d = canon(spark_df), canon(duck_df)
    for c in s.columns:
        sv, dv = s[c], d[c]
        if pd.api.types.is_float_dtype(sv):
            both_nan = sv.isna() & dv.isna()
            eq = (sv == dv) | both_nan
            if not eq.all():
                diff = (sv - dv).abs().max()
                problems.append(f"float col {c!r}: {int((~eq).sum())} mismatches, max|Δ|={diff}")
        else:
            svf = sv.fillna("\x00") if sv.dtype == object else sv
            dvf = dv.fillna("\x00") if dv.dtype == object else dv
            eq = (svf == dvf) | (sv.isna() & dv.isna())
            if not eq.all():
                i = int(np.argmax(~eq.values))
                problems.append(
                    f"col {c!r}: {int((~eq).sum())} mismatches, first at row {i}: "
                    f"spark={sv.iloc[i]!r} duck={dv.iloc[i]!r}"
                )
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark("parity")
    con = duck_con(sf_dir)
    qs = registry.all_queries()
    oracles = registry.all_oracles()
    failures = 0
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception:
            print(f"[FAIL] {name}: spark raised\n{traceback.format_exc()}")
            failures += 1
            continue
        if name not in oracles:
            print(f"[rows-only] {name}: {len(sdf)} rows")
            continue
        try:
            ddf = con.execute(oracles[name]).df()
        except Exception:
            print(f"[FAIL] {name}: duckdb oracle raised\n{traceback.format_exc()}")
            failures += 1
            continue
        problems = compare(name, sdf, ddf)
        if problems:
            failures += 1
            print(f"[FAIL] {name}: ({len(sdf)} rows)")
            for p in problems:
                print(f"       {p}")
        else:
            print(f"[ok] {name}: {len(sdf)} rows match")
    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Local stand-in for the driver's correctness gate: run every query in
__spark_entry__.queries() and its oracle_sql() via DuckDB on the same
parquet, compare row count, sorted column names, dtype kinds, and values
(rows sorted by all columns; floats compared BIT-EXACTLY so that -0.0 vs
0.0 and int64-vs-float64 asymmetries fail here exactly as they fail the
driver's value-hash gate).

Usage: python tools/compare_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")
import __spark_entry__ as entrymod
from big_data_project_datapipeline_spark.session import get_spark
from big_data_project_datapipeline_spark.tables import TABLE_NAMES


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None).astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    return df.sort_values(by=list(df.columns), na_position="last").reset_index(
        drop=True
    )


def _kind(s: pd.Series) -> str:
    """Dtype kind the driver's hash is sensitive to (timestamps are
    unit/tz-normalized by the driver, so they collapse to one kind)."""
    if pd.api.types.is_datetime64_any_dtype(s):
        return "datetime"
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_float_dtype(s):
        return "float"
    return "object"


def compare(a: pd.DataFrame, b: pd.DataFrame) -> list[str]:
    problems = []
    if len(a) != len(b):
        problems.append(f"row count {len(a)} vs {len(b)}")
    if sorted(a.columns) != sorted(b.columns):
        problems.append(f"columns {sorted(a.columns)} vs {sorted(b.columns)}")
        return problems
    if problems:
        return problems
    for c in sorted(a.columns):
        ka, kb = _kind(a[c]), _kind(b[c])
        if ka != kb:
            problems.append(f"col {c}: dtype kind {ka} ({a[c].dtype}) vs {kb} ({b[c].dtype})")
    if problems:
        return problems
    a, b = normalize(a), normalize(b)
    for c in a.columns:
        if pd.api.types.is_float_dtype(a[c]):
            av, bv = a[c].to_numpy(), b[c].to_numpy()
            both_nan = np.isnan(av) & np.isnan(bv)
            # Bit-exact: distinguishes -0.0 from 0.0, like a value hash does.
            bit_eq = av.view(np.int64) == bv.view(np.int64)
            bad = ~(bit_eq | both_nan)
            if bad.any():
                i = int(np.argmax(bad))
                problems.append(
                    f"col {c}: {int(bad.sum())} mismatches, first at row {i}: {av[i]!r} vs {bv[i]!r}"
                )
        else:
            eq = (a[c].fillna("\0NULL") == b[c].fillna("\0NULL")) if a[c].dtype == object else (
                (a[c].isna() & b[c].isna()) | (a[c] == b[c])
            )
            if not eq.all():
                i = int((~eq).idxmax())
                problems.append(
                    f"col {c}: {int((~eq).sum())} mismatches, first at row {i}: {a[c][i]!r} vs {b[c][i]!r}"
                )
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="oracle-compare")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {str(e)[:300]}")
            failures += 1
            continue
        if name not in osql:
            print(f"rows  {name}: {len(sdf)} rows (no oracle — rows-only)")
            continue
        try:
            ddf = con.execute(osql[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {str(e)[:300]}")
            failures += 1
            continue
        problems = compare(sdf, ddf)
        if problems:
            failures += 1
            print(f"FAIL  {name}: " + "; ".join(problems))
        else:
            print(f"OK    {name}: {len(sdf)} rows")
    print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())

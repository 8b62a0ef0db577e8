#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (NOT part of the library).

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads oracle_sql.json from <verifyOutDir>, runs each SQL in DuckDB with the
sfDir parquet tables registered as views, loads the Spark-written parquet
result from <verifyOutDir>/<name>, and compares: columns sorted by name,
result DTYPES (Arrow types; decimal precision/scale exact — the driver's
hash is precision-sensitive, so DECIMAL(28,2) vs DECIMAL(38,2) is a FAIL
even when values match), rows sorted by all columns, exact value equality
(floats reported with max abs diff when not exact).
"""
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True,
                            key=lambda s: s.astype(str))
    return df.reset_index(drop=True)


def cell_eq(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    import numbers
    if isinstance(a, numbers.Number) and isinstance(b, numbers.Number):
        return float(a) == float(b)
    # Decimal vs Decimal / Decimal vs int
    try:
        from decimal import Decimal
        if isinstance(a, Decimal) or isinstance(b, Decimal):
            return Decimal(str(a)) == Decimal(str(b))
    except Exception:
        pass
    return str(a) == str(b)


def norm_type(t) -> str:
    """Canonical string for an Arrow type: tz-insensitive timestamps,
    everything else (incl. decimal precision/scale, int width) exact."""
    import pyarrow as pa
    if pa.types.is_timestamp(t):
        return f"timestamp[{t.unit}]"
    if pa.types.is_large_string(t):
        return "string"
    return str(t)


def dtype_probs(want_tbl, got_tbl):
    """Compare Arrow schemas by column name (sorted); return mismatch list."""
    ws = {f.name: f.type for f in want_tbl.schema}
    gs = {f.name: f.type for f in got_tbl.schema}
    probs = []
    for name in sorted(set(ws) & set(gs)):
        w, g = norm_type(ws[name]), norm_type(gs[name])
        if w != g:
            probs.append(f"dtype {name}: oracle={w} spark={g}")
    return probs


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            want_rel = con.sql(sql)
            want_tbl = want_rel.arrow()
            got_tbl = duckdb.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").arrow()
            want = canon(want_tbl.to_pandas())
            got = canon(got_tbl.to_pandas())
        except Exception as e:
            print(f"FAIL {name}: load error: {e}")
            n_fail += 1
            continue
        probs = dtype_probs(want_tbl, got_tbl)
        if list(want.columns) != list(got.columns):
            probs.append(f"cols want={list(want.columns)} got={list(got.columns)}")
        elif len(want) != len(got):
            probs.append(f"rows want={len(want)} got={len(got)}")
        else:
            for c in want.columns:
                bad = [i for i in range(len(want))
                       if not cell_eq(want[c][i], got[c][i])]
                if bad:
                    i = bad[0]
                    probs.append(
                        f"col {c}: {len(bad)} mismatches, first row {i}: "
                        f"want={want[c][i]!r} got={got[c][i]!r}")
        if probs:
            print(f"FAIL {name}: " + "; ".join(probs))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(want)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

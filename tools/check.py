#!/usr/bin/env python3
"""Local mimic of the driver's t2 correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <name>.parquet produced by graft.Verify, runs the corresponding
oracle SQL from oracle_sql.json in DuckDB (with views registered for every
testdata table), sorts columns by name and rows by value, and compares.
"""
import json, sys, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes for comparison
    for c in df.columns:
        if df[c].dtype == "float32":
            df[c] = df[c].astype("float64")
        try:
            if str(df[c].dtype).startswith("datetime64"):
                df[c] = df[c].astype("datetime64[us]")
        except Exception:
            pass
    return df.sort_values(by=list(df.columns), ignore_index=True)

def eq(a, b):
    # Exact float comparison: the driver gate HASHES values, so any
    # bit difference fails there. A tolerant local gate hides that
    # (bit us in round 2: e05 passed locally at 1e-9, failed the hash).
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_noracle = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = canon(pd.read_parquet(f"{out_dir}/{name}"))
        except Exception as e:
            print(f"FAIL {name}: spark output missing: {e}")
            n_fail += 1
            continue
        try:
            want = canon(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
            n_fail += 1
            continue
        bad = None
        for i in range(len(got)):
            for c in got.columns:
                a, b = got[c].iloc[i], want[c].iloc[i]
                a = None if (a is None or (isinstance(a, float) and math.isnan(a)) or a is pd.NaT) else a
                b = None if (b is None or (isinstance(b, float) and math.isnan(b)) or b is pd.NaT) else b
                if not eq(a, b):
                    bad = (i, c, a, b)
                    break
            if bad:
                break
        if bad:
            i, c, a, b = bad
            print(f"FAIL {name}: row {i} col {c}: spark={a!r} duckdb={b!r}")
            n_fail += 1
        else:
            # dtype check (schema-compat signal)
            dt_g = [str(got[c].dtype) for c in got.columns]
            dt_w = [str(want[c].dtype) for c in want.columns]
            note = "" if dt_g == dt_w else f"  [dtype spark={dt_g} duckdb={dt_w}]"
            print(f"PASS {name} ({len(got)} rows){note}")
            n_pass += 1
    import os
    names_with_out = {d for d in os.listdir(out_dir) if not d.endswith(".json")}
    for name in sorted(names_with_out - set(oracle)):
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
            print(f"ROWS {name}: {len(got)} rows (no oracle)")
            n_noracle += 1
        except Exception as e:
            print(f"FAIL {name}: unreadable: {e}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} rows-only")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

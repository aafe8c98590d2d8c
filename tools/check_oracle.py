#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: python3 tools/check_oracle.py [sf_dir] [out_dir]

Assumes `sbt "runMain graft.Verify <sf_dir> <out_dir>"` already ran (or
pass --run to run it here). For each query result parquet under out_dir,
runs the matching oracle SQL from oracle_sql.json in DuckDB over the same
parquet tables, sorts columns by name + rows by all columns, and compares
cell-by-cell (exact for non-floats; exact AND tolerance-reported for
floats, since the driver hash-compares values).
"""
import json, os, subprocess, sys

import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].apply(
                lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v)
    return df.sort_values(list(df.columns), ignore_index=True)


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
    out_dir = args[1] if len(args) > 1 else "/tmp/verify_out"
    if "--run" in sys.argv:
        subprocess.run(["sbt", "-batch",
                        f'runMain graft.Verify {sf_dir} {out_dir}'],
                       check=True, cwd="/root/repo")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_fail = n_noracle = 0
    for name in names:
        got = pd.read_parquet(os.path.join(out_dir, name))
        if name not in oracle:
            print(f"  ~ {name}: no oracle (rows-only), rows={len(got)}")
            n_noracle += 1
            continue
        try:
            exp = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"  ✗ {name}: ORACLE SQL ERROR: {e}")
            n_fail += 1
            continue
        g, e = normalize(got), normalize(exp)
        if list(g.columns) != list(e.columns):
            print(f"  ✗ {name}: column mismatch spark={list(g.columns)} "
                  f"duck={list(e.columns)}")
            n_fail += 1
            continue
        if len(g) != len(e):
            print(f"  ✗ {name}: row count spark={len(g)} duck={len(e)}")
            n_fail += 1
            continue
        ok = True
        for c in g.columns:
            gv, ev = g[c], e[c]
            # Dtype-strict for integer columns: the driver's gate hashes the
            # typed value representation, so a Spark BIGINT against a DuckDB
            # HUGEINT/DOUBLE (e.g. DuckDB widens sum(BIGINT) -> HUGEINT,
            # which fetchdf renders as float64/object) hash-mismatches even
            # when every value is equal. Mirror that here instead of
            # silently coercing both sides to float.
            g_int = pd.api.types.is_integer_dtype(gv)
            e_int = pd.api.types.is_integer_dtype(ev)
            if g_int != e_int:
                print(f"  ✗ {name}.{c}: dtype drift spark={gv.dtype} "
                      f"duck={ev.dtype} (driver hash gate would fail; "
                      f"CAST the oracle to match)")
                ok = False
                continue
            if pd.api.types.is_float_dtype(gv) or pd.api.types.is_float_dtype(ev):
                ga = gv.astype(float).to_numpy()
                ea = ev.astype(float).to_numpy()
                both_nan = np.isnan(ga) & np.isnan(ea)
                exact = (ga == ea) | both_nan
                if not exact.all():
                    diff = np.abs(ga - ea)
                    diff[both_nan] = 0
                    i = int(np.nanargmax(np.where(exact, 0, diff)))
                    print(f"  ✗ {name}.{c}: {int((~exact).sum())} inexact "
                          f"cells, max|Δ|={np.nanmax(diff):.3e} "
                          f"e.g. {ga[i]!r} vs {ea[i]!r}")
                    ok = False
            else:
                if not (gv.isna() == ev.isna()).all() or \
                   not (gv.dropna().to_numpy() == ev.dropna().to_numpy()).all():
                    neq = (gv != ev) & ~(gv.isna() & ev.isna())
                    i = int(np.argmax(neq.to_numpy()))
                    print(f"  ✗ {name}.{c}: {int(neq.sum())} mismatches "
                          f"e.g. {gv.iloc[i]!r} vs {ev.iloc[i]!r}")
                    ok = False
        if ok:
            n_pass += 1
            print(f"  ✓ {name} ({len(g)} rows)")
        else:
            n_fail += 1
    missing = sorted(set(oracle) - set(names))
    for m in missing:
        print(f"  ✗ {m}: oracle declared but no result parquet (query failed?)")
        n_fail += 1
    print(f"PASS={n_pass} FAIL={n_fail} NO-ORACLE={n_noracle}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

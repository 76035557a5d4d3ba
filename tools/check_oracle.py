#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage:  python3 tools/check_oracle.py <verify_out_dir> [sf_dir]

Reads every <name>/ parquet dump produced by `graft.Verify`, runs the
matching SQL from oracle_sql.json in DuckDB against the sf parquet tables,
and compares: columns sorted by name, dtypes (the driver hashes physical
values, so an INT64-vs-HUGEINT drift fails there even when str(values)
match — catch it locally), rows sorted by all columns, exact value match
(NaN == NaN). Exit code = number of failing queries.
"""
import json, math, sys, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df) > 0:
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.reset_index(drop=True)

def cell_eq(a, b) -> bool:
    if isinstance(a, float) and isinstance(b, float):
        return (math.isnan(a) and math.isnan(b)) or a == b
    if a is None or b is None:
        return a is None and b is None
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    if hasattr(a, "tolist"):
        a = a.tolist()
    if hasattr(b, "tolist"):
        b = b.tolist()
    if isinstance(a, list) and isinstance(b, list):
        return len(a) == len(b) and all(cell_eq(x, y) for x, y in zip(a, b))
    return a == b or str(a) == str(b)

def main():
    out_dir = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    con = duckdb.connect()
    for tbl in TABLES:
        con.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM '{sf_dir}/{tbl}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    fails = 0
    names = sorted(p.split("/")[-1] for p in glob.glob(f"{out_dir}/*")
                   if not p.endswith(".json"))
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        got = canon(pd.concat([pd.read_parquet(f) for f in files])
                    if files else pd.DataFrame())
        if name not in oracle:
            print(f"  ?  {name}: no oracle (rows-only) rows={len(got)}")
            continue
        try:
            want = canon(con.execute(oracle[name]).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            fails += 1
            continue
        if sorted(got.columns) != sorted(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
            fails += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
            fails += 1
            continue
        # dtype gate: widths within a numeric family are benign (int32 vs
        # int64 values hash equal driver-side), as are timestamp
        # resolutions; cross-family drift — e.g. DuckDB HUGEINT surfacing
        # as float64 against Spark's int64 — is the class of bug the
        # driver's hash compare fails on even when str(values) match.
        def dt(d):
            s = str(d)
            for fam in ("datetime64", "uint", "int", "float"):
                if s.startswith(fam):
                    return "int" if fam == "uint" else fam
            return s
        badtype = [(c, got[c].dtype, want[c].dtype) for c in got.columns
                   if dt(got[c].dtype) != dt(want[c].dtype)]
        if badtype:
            c, g, w = badtype[0]
            print(f"FAIL {name}: dtype col {c}: spark={g} duckdb={w}")
            fails += 1
            continue
        bad = None
        for i in range(len(got)):
            for c in got.columns:
                if not cell_eq(got.iloc[i][c], want.iloc[i][c]):
                    bad = (i, c, got.iloc[i][c], want.iloc[i][c])
                    break
            if bad:
                break
        if bad:
            print(f"FAIL {name}: row {bad[0]} col {bad[1]}: spark={bad[2]!r} duckdb={bad[3]!r}")
            fails += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
    missing = set(oracle) - set(names)
    for m in sorted(missing):
        print(f"FAIL {m}: oracle present but no spark output")
        fails += 1
    sys.exit(min(fails, 99))

if __name__ == "__main__":
    main()

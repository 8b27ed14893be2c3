#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB against the raw parquet tables, load the Verify.scala parquet dump,
sort columns by name + rows by all columns, and compare values exactly.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize timestamps to ns, ints to int64
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        elif str(df[c].dtype) in ("int32", "int64", "Int32", "Int64", "uint64"):
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = canon(pd.read_parquet(f"{out_dir}/{name}"))
            exp = canon(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: load/exec error: {e}")
            n_fail += 1
            continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}")
            n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}")
            n_fail += 1
            continue
        eq = got.equals(exp)
        if not eq:
            diff_cols = [c for c in got.columns if not got[c].equals(exp[c])]
            print(f"FAIL {name}: value mismatch in columns {diff_cols}")
            for c in diff_cols[:2]:
                mask = ~(got[c] == exp[c])
                if got[c].isna().any() or exp[c].isna().any():
                    mask = mask & ~(got[c].isna() & exp[c].isna())
                print(f"  {c}: {mask.sum()} differing rows; first few:")
                print(pd.DataFrame({"got": got[c][mask], "exp": exp[c][mask]}).head(3))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
    print(f"\n{len(oracle) - n_fail}/{len(oracle)} passed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

#!/usr/bin/env python3
"""Local pre-check of the driver's DuckDB oracle compare.

Runs each oracle SQL from <outDir>/oracle_sql.json against DuckDB views over
the sf parquet tables, loads the Spark parquet output from <outDir>/<name>/,
sorts columns by name, and compares values EXACTLY (bit-exact for floats too,
mirroring the driver's value-hash compare — oracle queries must round floats
on BOTH sides so last-ulp engine differences can't appear). Mismatches are
caught here before CORRECTNESS_r{N}.json.

Usage: python3 tools/check_oracle.py <sfDir> <outDir>
"""
import json, sys, glob

import duckdb


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"[MISS ] {name}: no spark output")
            failures += 1
            continue
        got = con.sql(
            f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
        want = con.sql(sql).df()
        got = got.reindex(sorted(got.columns), axis=1)
        want = want.reindex(sorted(want.columns), axis=1)
        if list(got.columns) != list(want.columns):
            print(f"[FAIL ] {name}: columns {list(got.columns)} vs {list(want.columns)}")
            failures += 1
            continue
        if len(got) != len(want):
            print(f"[FAIL ] {name}: rows {len(got)} vs {len(want)}")
            failures += 1
            continue
        gs = got.sort_values(by=list(got.columns)).reset_index(drop=True)
        ws = want.sort_values(by=list(want.columns)).reset_index(drop=True)
        diff = 0
        for c in gs.columns:
            a, b = gs[c], ws[c]
            if a.dtype.kind == "f" or b.dtype.kind == "f":
                bad = (a.astype(float) - b.astype(float)).abs() > 0
            else:
                bad = a.astype(str) != b.astype(str)
            diff += int(bad.sum())
            if bad.any():
                i = bad.idxmax()
                print(f"        {name}.{c}: first diff row {i}: "
                      f"{a[i]!r} vs {b[i]!r}")
        if diff:
            print(f"[FAIL ] {name}: {diff} cell diffs")
            failures += 1
        else:
            print(f"[OK   ] {name}: {len(got)} rows exact")
    return failures


if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1], sys.argv[2]) else 0)

#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify first, then
this script compares each query's parquet output against its DuckDB oracle.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import json
import sys
import glob

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(rows, cols):
    out = []
    for r in rows:
        d = dict(zip(cols, r))
        out.append(tuple((k, repr(d[k])) for k in sorted(d)))
    return sorted(out)


def main():
    sf, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    ok = bad = 0
    for name in sorted(oracle):
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"MISSING  {name}")
            bad += 1
            continue
        mine = con.sql(f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')")
        mcols, mrows = mine.columns, mine.fetchall()
        ref = con.sql(oracle[name])
        rcols, rrows = ref.columns, ref.fetchall()
        if sorted(mcols) != sorted(rcols):
            print(f"SCHEMA   {name}: mine={sorted(mcols)} oracle={sorted(rcols)}")
            bad += 1
            continue
        a, b = norm(mrows, mcols), norm(rrows, rcols)
        if a == b:
            print(f"OK       {name} ({len(a)} rows)")
            ok += 1
        else:
            print(f"MISMATCH {name}: mine={len(a)} oracle={len(b)} rows")
            onlym = [x for x in a if x not in set(b)][:3]
            onlyr = [x for x in b if x not in set(a)][:3]
            for x in onlym:
                print(f"  mine-only:   {x}")
            for x in onlyr:
                print(f"  oracle-only: {x}")
            bad += 1
    print(f"\n{ok} OK, {bad} failing")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()

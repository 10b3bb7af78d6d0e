#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify first, then
this script compares each query's parquet output against its DuckDB oracle.

Type-sensitive (round 2): the driver's hash distinguishes value TYPES, not just
repr — DuckDB SUM(BIGINT) returns HUGEINT (arrow decimal128) which repr()s like
an int but hash-mismatches Spark's int64. So arrow schemas must match too.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [queryFilter]
"""
import json
import sys
import glob

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(tbl):
    cols = sorted(tbl.column_names)
    rows = tbl.to_pylist()
    return sorted(tuple((k, repr(r[k])) for k in cols) for r in rows)


def types(tbl):
    return {f.name: str(f.type) for f in tbl.schema}


def main():
    sf, outdir = sys.argv[1], sys.argv[2]
    qfilter = sys.argv[3] if len(sys.argv) > 3 else ""
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    ok = bad = 0
    for name in sorted(oracle):
        if qfilter and qfilter not in name:
            continue
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"MISSING  {name}")
            bad += 1
            continue
        mine = con.sql(f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").arrow()
        ref = con.sql(oracle[name]).arrow()
        if sorted(mine.column_names) != sorted(ref.column_names):
            print(f"SCHEMA   {name}: mine={sorted(mine.column_names)} oracle={sorted(ref.column_names)}")
            bad += 1
            continue
        mt, rt = types(mine), types(ref)
        # timestamp tz representation differs benignly (spark writes UTC-tz)
        tdiff = {k: (mt[k], rt[k]) for k in mt
                 if mt[k] != rt[k] and not (mt[k].startswith("timestamp") and rt[k].startswith("timestamp"))}
        if tdiff:
            print(f"TYPEDIFF {name}: {tdiff}")
            bad += 1
            continue
        a, b = norm(mine), norm(ref)
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

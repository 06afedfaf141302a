#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Reads the parquet dumps written by `graft.Verify` plus `oracle_sql.json`,
runs each oracle in DuckDB over views named after the fixture tables, and
compares: column names, dtypes, row count, and exact values (rows sorted by
all columns, columns sorted by name) — strictly harsher than any plausible
driver compare, so passing here should pass the real gate.

Usage: verify_local.py <sfDir> <outDir>
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main(sf_dir: str, out_dir: str, only=()) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only:  # match Verify's optional name filter for local iteration
        oracles = {k: v for k, v in oracles.items() if k in set(only)}
    failures = 0
    for name, sql in sorted(oracles.items()):
        try:
            got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            want = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: load/exec error: {str(e)[:300]}")
            failures += 1
            continue
        problems = []
        gc, wc = sorted(got.columns), sorted(want.columns)
        if gc != wc:
            problems.append(f"columns differ: spark={gc} duckdb={wc}")
        else:
            got, want = got[gc], want[wc]
            gt = [str(t) for t in got.dtypes]
            wt = [str(t) for t in want.dtypes]
            if gt != wt:
                problems.append(f"dtypes differ: spark={gt} duckdb={wt}")
            if len(got) != len(want):
                problems.append(f"rowcount differs: spark={len(got)} duckdb={len(want)}")
            if not problems:
                g = got.sort_values(by=gc, na_position="first").reset_index(drop=True)
                w = want.sort_values(by=wc, na_position="first").reset_index(drop=True)
                try:
                    pd.testing.assert_frame_equal(g, w, check_exact=True)
                except AssertionError as e:
                    problems.append(f"values differ: {str(e)[:400]}")
        if problems:
            failures += 1
            print(f"FAIL {name}")
            for p in problems:
                print(f"     {p}")
        else:
            print(f"ok   {name} ({len(got)} rows)")
    print(f"\n{len(oracles) - failures}/{len(oracles)} oracle-backed queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3:]))

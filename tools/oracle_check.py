#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

Runs each oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB (tables
registered from <sfDir>/*.parquet), loads the Spark result parquet from
<verifyOutDir>/<name>/, sorts columns by name and rows by all columns, and
compares cell-by-cell (exact; floats reported with max abs diff when unequal).
"""
import json
import math
import sys

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            exp = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            failures += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            failures += 1
            continue
        ecols, gcols = sorted(exp.column_names), sorted(got.column_names)
        if ecols != gcols:
            print(f"FAIL {name}: columns differ: oracle={ecols} spark={gcols}")
            failures += 1
            continue
        if exp.num_rows != got.num_rows:
            print(f"FAIL {name}: rows differ: oracle={exp.num_rows} spark={got.num_rows}")
            failures += 1
            continue
        e_rows = sorted(map(tuple, exp.select(ecols).to_pylist_rows() if hasattr(exp, 'to_pylist_rows') else [tuple(r[c] for c in ecols) for r in exp.to_pylist()]))
        g_rows = sorted([tuple(r[c] for c in gcols) for r in got.to_pylist()])
        bad = 0
        max_diff = 0.0
        first = None
        for er, gr in zip(e_rows, g_rows):
            if er != gr:
                rowbad = False
                for a, b in zip(er, gr):
                    if a == b or (a is None and b is None):
                        continue
                    if isinstance(a, float) and isinstance(b, float):
                        if math.isnan(a) and math.isnan(b):
                            continue
                        max_diff = max(max_diff, abs(a - b))
                        rowbad = True
                    else:
                        rowbad = True
                if rowbad:
                    bad += 1
                    if first is None:
                        first = (er, gr)
        if bad:
            print(f"FAIL {name}: {bad}/{len(e_rows)} rows differ, max float diff {max_diff:.3e}")
            print(f"  oracle: {first[0]}\n  spark : {first[1]}")
            failures += 1
        else:
            print(f"OK   {name} ({exp.num_rows} rows)")
    print(f"\n{len(oracle) - failures}/{len(oracle)} oracle queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/*.parquet produced by graft.Verify, runs the
matching SQL from oracle_sql.json in DuckDB over the sfDir tables, and
compares: schema (column names sorted), row count, and values (rows sorted,
exact equality; doubles compared bit-exact via repr).
"""
import sys, json, glob, math

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(rows):
    out = []
    for r in rows:
        out.append(tuple(repr(v) for v in r))
    return sorted(out)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got_rel = con.sql(f"SELECT * FROM read_parquet({files!r})")
            got_cols = sorted(got_rel.columns)
            got = con.sql(f"SELECT {', '.join(got_cols)} FROM got_rel").fetchall()
            exp_rel = con.sql(sql)
            exp_cols = sorted(exp_rel.columns)
            exp = con.sql(f"SELECT {', '.join(exp_cols)} FROM exp_rel").fetchall()
        except Exception as e:
            print(f"FAIL {name}: {str(e)[:300]}")
            n_fail += 1
            continue
        if got_cols != exp_cols:
            print(f"FAIL {name}: cols {got_cols} != {exp_cols}")
            n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            n_fail += 1
            continue
        g, e = norm(got), norm(exp)
        if g != e:
            bad = [(a, b) for a, b in zip(g, e) if a != b][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {bad}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(got)} rows)")
        n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

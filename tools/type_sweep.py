#!/usr/bin/env python3
"""Oracle/Spark TYPE parity sweep — the q195 class of bug, found statically.

The driver's hash compare is type-render sensitive: an oracle SQL whose
final projection leaves an aggregate uncast (DuckDB SUM(BIGINT) -> HUGEINT)
can hash-differ from a Spark BIGINT column even when every value is equal
(CORRECTNESS_r10's one red row). This sweep runs every oracle SQL with
LIMIT 0 (types only, no work), reads the matching Spark parquet schema,
and flags any column whose DuckDB type widens past the Spark type:
HUGEINT vs BIGINT, DOUBLE vs BIGINT, DECIMAL vs BIGINT, etc.

usage: python3 tools/type_sweep.py <sfDir> <verifyOutDir>
exit 1 if any mismatch (so it can gate a commit).
"""
import sys, json, glob

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

# DuckDB type -> the Spark/parquet types it renders identically to under
# the driver's repr() compare. Anything outside the map is flagged.
COMPATIBLE = {
    "BIGINT": {"BIGINT"},
    "INTEGER": {"INTEGER", "BIGINT"},  # repr(int) identical
    "SMALLINT": {"SMALLINT", "INTEGER", "BIGINT"},
    "TINYINT": {"TINYINT", "SMALLINT", "INTEGER", "BIGINT"},
    "UBIGINT": set(),        # never safe
    "HUGEINT": set(),        # the q195 bug class: always flag
    "DOUBLE": {"DOUBLE"},
    "FLOAT": {"FLOAT"},
    "VARCHAR": {"VARCHAR"},
    "BOOLEAN": {"BOOLEAN"},
    "DATE": {"DATE"},
    "BLOB": {"BLOB"},
}


def duck_types(con, sql):
    rel = con.sql(f"SELECT * FROM ({sql}) LIMIT 0")
    return dict(zip(rel.columns, [str(t) for t in rel.types]))


def spark_types(con, files):
    rel = con.sql(f"SELECT * FROM read_parquet({files!r}) LIMIT 0")
    return dict(zip(rel.columns, [str(t) for t in rel.types]))


def norm(t):
    # DECIMAL(38,0) -> DECIMAL; LIST/STRUCT pass through whole
    return t.split("(")[0] if t.startswith("DECIMAL") else t


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_flag = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"SKIP {name}: no spark output")
            continue
        try:
            dt = duck_types(con, sql)
            st = spark_types(con, files)
        except Exception as e:
            print(f"ERR  {name}: {str(e)[:200]}")
            n_flag += 1
            continue
        for c in dt:
            if c not in st:
                print(f"FLAG {name}.{c}: oracle-only column (spark cols {sorted(st)})")
                n_flag += 1
                continue
            d, s = norm(dt[c]), norm(st[c])
            if d == s:
                continue
            # DECIMAL(x,0) vs BIGINT repr identically only if DuckDB renders
            # Decimal without trailing '.0'... it renders Decimal('123') ->
            # repr "Decimal('123')" != "123": flag.
            ok = s in COMPATIBLE.get(d, set())
            if not ok:
                print(f"FLAG {name}.{c}: oracle {dt[c]} vs spark {st[c]}")
                n_flag += 1
    print(f"== {n_flag} type flags ==")
    return 1 if n_flag else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

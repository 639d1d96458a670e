#!/usr/bin/env python3
"""List every Verify output whose schema contains a BOOLEAN column, and
every oracle SQL whose DuckDB result contains one.

Booleans are a driver-hash hazard: round 4's sole red (`agg_predicates`)
was rows/schema-green but hash-red because Spark-parquet and DuckDB
render BOOLEAN differently in the driver's canonical form. Policy since
round 5: no oracle-compared projection may contain a boolean — cast to
INT on both sides.

Usage: python3 tools/scan_bool.py <verify_out_dir> <sf_dir>
"""
import sys, json, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(outdir, sfdir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    hits = 0
    for name in sorted(oracle):
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if files:
            cols = con.execute(
                f"DESCRIBE SELECT * FROM read_parquet({files!r})").fetchall()
            bools = [c[0] for c in cols if c[1].upper() == "BOOLEAN"]
            if bools:
                print(f"SPARK  {name}: {bools}")
                hits += 1
        try:
            cols = con.execute(f"DESCRIBE {oracle[name]}").fetchall()
            bools = [c[0] for c in cols if c[1].upper() == "BOOLEAN"]
            if bools:
                print(f"ORACLE {name}: {bools}")
                hits += 1
        except Exception as e:
            print(f"ERR    {name}: {e}")
    print(f"== {hits} boolean-bearing sides ==")
    return 1 if hits else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

#!/usr/bin/env python3
"""Local correctness loop mimicking the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py <verify_out_dir> <sf_dir>

Reads each <name>/ parquet dump produced by graft.Verify, runs the
matching SQL from oracle_sql.json in DuckDB over the sf_dir tables, and
compares: schema (column names), row count, and a hash over
column-name-sorted, row-sorted stringified values (floats printed with
repr so last-bit diffs show up — stricter than any plausible driver).

Additionally FAILS any query whose compared projection (either side)
contains a BOOLEAN column or a non-standard integer width: round 4's
sole driver red (`agg_predicates`) was values-identical but hash-red
because Spark parquet and DuckDB render BOOLEAN differently in the
driver's type-sensitive canonical form; round 5's sole red was the SAME
query, values-identical again, hash-red because DuckDB's count_if
returns HUGEINT (int128) vs Spark's BIGINT. Policy: verdict columns are
INT (1/0) on both sides, counts are BIGINT on both sides
(`count_if(...)::BIGINT` in oracle SQL), so the check reproduces the
driver's failure mode locally before the driver sees it.
"""
import sys, json, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Physical types the driver's type-sensitive hash renders differently
# between Spark parquet and DuckDB even when values are identical.
# Spark has no int128 / unsigned types, and narrow ints (written by
# Spark as INT32-annotated parquet) round-trip as INTEGER anyway — any
# appearance of these on either side means the two sides CANNOT agree.
HAZARD_WIDTHS = {"HUGEINT", "UHUGEINT", "TINYINT", "UTINYINT",
                 "SMALLINT", "USMALLINT", "UINTEGER", "UBIGINT"}


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(repr(r[i]) for i in order))
    out.sort()
    return out


def main(outdir, sfdir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output");  n_fail += 1;  continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetchall()
            gcols = [d[0] for d in con.description]
            want = con.execute(sql).fetchall()
            wcols = [d[0] for d in con.description]
        except Exception as e:
            print(f"FAIL {name}: {e}");  n_fail += 1;  continue
        if sorted(gcols) != sorted(wcols):
            print(f"FAIL {name}: cols spark={sorted(gcols)} oracle={sorted(wcols)}")
            n_fail += 1;  continue
        hazards = []
        for src, q2 in (("spark", f"SELECT * FROM read_parquet({files!r})"),
                        ("oracle", sql)):
            desc = con.execute(f"DESCRIBE {q2}").fetchall()
            for cname, ctype in ((c[0], c[1].upper()) for c in desc):
                if ctype == "BOOLEAN" or ctype in HAZARD_WIDTHS:
                    hazards.append(f"{src}.{cname}:{ctype}")
        if hazards:
            print(f"FAIL {name}: driver-hash hazard column types: {hazards}")
            n_fail += 1;  continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows spark={len(got)} oracle={len(want)}")
            n_fail += 1;  continue
        cg, cw = canon(got, gcols), canon(want, wcols)
        if cg != cw:
            bad = [(a, b) for a, b in zip(cg, cw) if a != b][:3]
            print(f"FAIL {name}: value mismatch, e.g. {bad}")
            n_fail += 1;  continue
        print(f"PASS {name} ({len(got)} rows)")
        n_pass += 1
    extra = [d for d in os.listdir(outdir)
             if os.path.isdir(f"{outdir}/{d}") and d not in oracle]
    for name in sorted(extra):
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        n = con.execute(f"SELECT count(*) FROM read_parquet({files!r})").fetchone()[0] if files else 0
        print(f"INFO {name}: no oracle (rows-only check), {n} rows")
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

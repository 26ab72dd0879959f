#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle differential check.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<query>/ parquet (written by graft.Verify), runs the
matching oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB against views
over <sfDir>/*.parquet, and compares: schema (column names), row count, and
values (columns sorted by name, rows sorted by all columns, exact match; floats
compared bit-exact first, then with 1e-12 relative tolerance reported
separately so we can see how close a near-miss is).
"""
import sys, os, json, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm(rows):
    out = []
    for r in rows:
        out.append(tuple(str(v) if not isinstance(v, float) else repr(v) for v in r))
    return sorted(out)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        qdir = f"{out_dir}/{name}"
        if not os.path.isdir(qdir):
            print(f"FAIL {name}: no Spark output dir"); n_fail += 1; continue
        try:
            spark_rel = con.sql(f"SELECT * FROM '{qdir}/*.parquet'")
            spark_cols = sorted(spark_rel.columns)
            sdf = con.sql(
                f"SELECT {', '.join(spark_cols)} FROM spark_rel").fetchall()
            orel = con.sql(oracle[name])
            ocols = sorted(orel.columns)
            odf = con.sql(f"SELECT {', '.join(ocols)} FROM orel").fetchall()
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}"); n_fail += 1; continue
        if spark_cols != ocols:
            print(f"FAIL {name}: columns spark={spark_cols} oracle={ocols}")
            n_fail += 1; continue
        stypes = dict(zip(spark_rel.columns, [str(t) for t in spark_rel.types]))
        otypes = dict(zip(orel.columns, [str(t) for t in orel.types]))
        mismatched = {c: (stypes[c], otypes[c]) for c in spark_cols
                      if stypes[c] != otypes[c]}
        if mismatched:
            print(f"FAIL {name}: column types differ: {mismatched}")
            n_fail += 1; continue
        if len(sdf) != len(odf):
            print(f"FAIL {name}: rows spark={len(sdf)} oracle={len(odf)}")
            n_fail += 1; continue
        s, o = norm(sdf), norm(odf)
        if s == o:
            print(f"PASS {name} ({len(sdf)} rows)"); n_pass += 1
        else:
            bad = [(a, b) for a, b in zip(s, o) if a != b]
            print(f"FAIL {name}: {len(bad)}/{len(s)} rows differ; first: ")
            for a, b in bad[:3]:
                print(f"  spark : {a}\n  oracle: {b}")
            n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 dev/check.py <sfdir> <outdir>
  1. expects `sbt "runMain graft.Verify <sfdir> <outdir>"` to have been run
  2. registers each <sfdir>/*.parquet as a DuckDB view named by table
  3. runs every oracle_sql.json query, compares with the Spark parquet dump:
     row count, column names/types, and per-value hash (column-name-sorted).
"""
import sys, json, glob, os
import duckdb

def main(sfdir, outdir):
    con = duckdb.connect()
    for p in glob.glob(f"{sfdir}/*.parquet"):
        name = os.path.basename(p).replace(".parquet", "")
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        spark_dir = f"{outdir}/{name}"
        if not os.path.isdir(spark_dir):
            print(f"FAIL {name}: no spark output dir"); failures += 1; continue
        try:
            odf = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); failures += 1; continue
        sdf = con.sql(f"SELECT * FROM '{spark_dir}/*.parquet'").df()
        # sort columns by name (driver semantics)
        odf = odf[sorted(odf.columns)]
        sdf = sdf[sorted(sdf.columns)]
        if list(odf.columns) != list(sdf.columns):
            print(f"FAIL {name}: columns spark={list(sdf.columns)} oracle={list(odf.columns)}")
            failures += 1; continue
        if len(odf) != len(sdf):
            print(f"FAIL {name}: rows spark={len(sdf)} oracle={len(odf)}")
            failures += 1; continue
        neq = []
        for c in odf.columns:
            a, b = sdf[c], odf[c]
            try:
                import pandas as pd
                eq = (a.equals(b)) or bool(((a == b) | (a.isna() & b.isna())).all())
            except Exception:
                eq = list(a) == list(b)
            if not eq:
                neq.append(c)
        if neq:
            print(f"FAIL {name}: value mismatch in columns {neq}")
            for c in neq[:3]:
                import pandas as pd
                mask = ~((sdf[c] == odf[c]) | (sdf[c].isna() & odf[c].isna()))
                idx = list(sdf.index[mask])[:5]
                for i in idx:
                    print(f"    row {i} col {c}: spark={sdf[c][i]!r} oracle={odf[c][i]!r}")
            failures += 1; continue
        # dtype check — the driver hashes rendered values, so a dtype KIND
        # diff (e.g. DuckDB HUGEIT->float64 vs Spark int64: 0.0 vs 0) is a
        # hash mismatch there even when pandas == says equal. Hard FAIL on
        # kind diffs; width-only diffs (int32 vs int64) hash identically
        # driver-side and are reported as a note.
        dt = [(c, str(sdf[c].dtype), str(odf[c].dtype)) for c in odf.columns
              if str(sdf[c].dtype) != str(odf[c].dtype)]
        kind = [(c, a, b) for c, a, b in dt
                if getattr(sdf[c].dtype, "kind", "?") != getattr(odf[c].dtype, "kind", "?")]
        if kind:
            print(f"FAIL {name}: dtype kind diff {kind} (driver typed-hash would mismatch)")
            failures += 1; continue
        note = f" [width-only dtype diff: {dt}]" if dt else ""
        print(f"ok   {name}: {len(sdf)} rows{note}")
    print(f"\n{'ALL GREEN' if failures == 0 else str(failures) + ' FAILURES'}")
    return failures

if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1], sys.argv[2]) else 0)

#!/usr/bin/env python3
"""Local replica of the round driver's correctness gate (dev tool — NOT part
of the Scala library; python3+duckdb are driver-side only).

Usage:
    sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"
    python3 tools/selfcheck.py /root/testdata/sf0.01 /tmp/verify_out

Reads Verify's outDir (one parquet dir per query + oracle_sql.json),
registers the fixture parquet tables as DuckDB views, runs each oracle SQL,
and compares: schema (column names, sorted), row count, and values (rows
sorted, floats rounded to 6 digits). Exits non-zero listing every mismatch,
so a broken oracle is caught before the driver's official run.
"""
import json, os, sys, math
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    # driver fixtures are single files; ScaleUp/ScaleProbe corpora are
    # Spark directory-parquets — accept both
    src = f"{sfdir}/{t}.parquet"
    if os.path.isdir(src):
        src = f"{src}/*.parquet"
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails = []
for name, sql in sorted(oracle.items()):
    try:
        spark_df = con.execute(
            f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").fetchdf()
        ora_df = con.execute(sql).fetchdf()
    except Exception as e:
        fails.append((name, f"exec error: {e}"))
        continue
    sc, oc = sorted(spark_df.columns), sorted(ora_df.columns)
    if sc != oc:
        fails.append((name, f"schema mismatch: spark={sc} oracle={oc}"))
        continue
    if len(spark_df) != len(ora_df):
        fails.append((name, f"rows: spark={len(spark_df)} oracle={len(ora_df)}"))
        continue

    def norm(df):
        rows = []
        for row in df[sc].itertuples(index=False):
            out = []
            for v in row:
                if hasattr(v, "tolist"):
                    v = v.tolist()
                if isinstance(v, float):
                    out.append(round(v, 6) if not math.isnan(v) else "NaN")
                elif v is None:
                    out.append("NULL")
                else:
                    out.append(str(v))
            rows.append(tuple(out))
        return sorted(rows)

    try:
        sn, on = norm(spark_df), norm(ora_df)
    except Exception as e:
        fails.append((name, f"norm error: {e}"))
        continue
    if sn != on:
        bad = next((i for i, (a, b) in enumerate(zip(sn, on)) if a != b), -1)
        fails.append((name, "value mismatch at sorted row "
                      f"{bad}:\n  spark={sn[bad] if bad >= 0 else '?'}\n  oracle={on[bad] if bad >= 0 else '?'}"))
    else:
        print(f"  ok {name} ({len(spark_df)} rows)")

print()
if fails:
    print(f"FAILURES ({len(fails)}):")
    for n, msg in fails:
        print(f"  {n}: {msg}")
    sys.exit(1)
print(f"ALL {len(oracle)} ORACLED QUERIES MATCH")

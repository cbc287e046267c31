#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run Verify output
parquets against DuckDB oracle SQL on the same sf dir, compare row counts,
column names (sorted), and values. Usage: check.py <sfDir> <verifyOut>"""
import json, math, sys

import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
ok, bad = [], []
for name, sql in sorted(oracle.items()):
    try:
        spark_rel = con.sql(f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')")
        spark_cols = sorted(spark_rel.columns)
        spark = con.execute(
            f"SELECT {', '.join(spark_cols)} FROM read_parquet('{outdir}/{name}/*.parquet')").fetchall()
        duck_rel = con.sql(sql)
        duck_cols = sorted(duck_rel.columns)
        duck = con.execute(f"SELECT {', '.join(duck_cols)} FROM ({sql})").fetchall()
    except Exception as e:
        bad.append((name, f"ERR {e}"))
        continue
    if spark_cols != duck_cols:
        bad.append((name, f"cols {spark_cols} != {duck_cols}"))
        continue
    if len(spark) != len(duck):
        bad.append((name, f"rows {len(spark)} != {len(duck)}"))
        continue
    mism = None
    for i, (a, b) in enumerate(zip(spark, duck)):
        for x, y in zip(a, b):
            # Exact compare (the driver hashes values); NaN == NaN counts as
            # equal — both engines legitimately produce NaN for 0/0 ratios.
            both_nan = (isinstance(x, float) and isinstance(y, float)
                        and math.isnan(x) and math.isnan(y))
            if not (x == y or both_nan):
                mism = (i, x, y)
                break
        if mism:
            break
    if mism:
        bad.append((name, f"value row {mism[0]}: {mism[1]!r} != {mism[2]!r}"))
    else:
        ok.append(name)
print(f"OK {len(ok)}: {' '.join(ok)}")

# Oracle-less entries are not unchecked: gates.json (dumped by Verify) names
# each one's ScalaTest property/recall/parity gate. Here we assert the dump
# exists, is readable, and has rows > 0 — the semantic adjudication lives in
# the named suite (run via `sbt test`, stamped in TESTS_r{N}.json).
import os
gates_path = f"{outdir}/gates.json"
if os.path.exists(gates_path):
    gates = json.load(open(gates_path))
    gated_ok = []
    for name, gate in sorted(gates.items()):
        if name in oracle:
            continue  # oracled AND gated: the oracle compare above governs
        try:
            n = con.execute(
                f"SELECT count(*) FROM read_parquet('{outdir}/{name}/*.parquet')"
            ).fetchone()[0]
        except Exception as e:
            bad.append((name, f"GATED-ERR {e}"))
            continue
        if n <= 0:
            bad.append((name, f"GATED rows {n} <= 0 [{gate}]"))
        else:
            gated_ok.append(f"{name}({n} rows; {gate})")
    print(f"GATED {len(gated_ok)}: {' | '.join(gated_ok)}")

for name, why in bad:
    print(f"FAIL {name}: {why}")
sys.exit(1 if bad else 0)

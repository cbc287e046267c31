#!/usr/bin/env python3
"""Derive a larger-SF fixture from an existing one (driver-side tool, like
check.py — not part of the library).

No sf1 fixture ships in /root/testdata, but the nastiest bugs of rounds
4-6 (q103 ANSI checksum overflow, DistributedRank boundary resampling)
were invisible below the largest tested SF — so the round-7 scale gate
runs the full Verify + DuckDB oracle + Bench on a DERIVED ~sf1: `factor`
shifted copies of sf0.1 with referential integrity preserved (every
foreign key shifted by the same per-copy offset as its parent's primary
key; dims `region`/`nation` stay fixed). Text/embedding payloads repeat
across copies — fine for an oracle gate, where DuckDB and Spark see the
same bytes and results match by construction.

Usage: derive_scale.py SRC_DIR OUT_DIR [FACTOR=10]
"""
import sys

import duckdb

# table -> {column: per-copy offset}; offsets are a power of 10 above the
# source key range so copies never collide and ids stay readable.
SHIFTS = {
    "region": {},
    "nation": {},
    "customer": {"c_custkey": 100_000},
    "supplier": {"s_suppkey": 10_000},
    "part": {"p_partkey": 100_000},
    "orders": {"o_orderkey": 1_000_000, "o_custkey": 100_000},
    "lineitem": {"l_orderkey": 1_000_000, "l_partkey": 100_000,
                 "l_suppkey": 10_000},
    "events": {"event_id": 1_000_000, "user_id": 1_000_000},
    "documents": {"doc_id": 100_000},
    "embeddings": {"vec_id": 100_000},
}


def main() -> None:
    src, out = sys.argv[1], sys.argv[2]
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    con = duckdb.connect()
    import os
    os.makedirs(out, exist_ok=True)
    for table, shifts in SHIFTS.items():
        cols = [r[0] for r in con.execute(
            f"DESCRIBE SELECT * FROM '{src}/{table}.parquet'").fetchall()]
        copies = 1 if not shifts else factor
        selects = []
        for i in range(copies):
            proj = ", ".join(
                f"({c} + {shifts[c] * i}) AS {c}" if c in shifts else c
                for c in cols)
            selects.append(
                f"SELECT {proj} FROM '{src}/{table}.parquet'")
        q = " UNION ALL ".join(selects)
        con.execute(
            f"COPY ({q}) TO '{out}/{table}.parquet' (FORMAT PARQUET)")
        n = con.execute(
            f"SELECT count(*) FROM '{out}/{table}.parquet'").fetchone()[0]
        print(f"{table}: {n} rows ({copies} cop{'y' if copies == 1 else 'ies'})")


if __name__ == "__main__":
    main()

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
#
# PERTURB (r13): non-key columns whose JOINT value domain must grow with
# the copy factor. q05 self-joins customer on (c_nationkey, c_mktsegment);
# with the 125-value joint domain fixed, its join output grows with
# factor² and the sf10 gate had to skip it. Suffixing the copy index into
# c_mktsegment (copy 0 unchanged, so a factor-1 derivation is the
# identity) keeps per-group sizes at the base level — join work scales
# LINEARLY with the factor, like the real data it stands in for (a bigger
# corpus has more segments, not thicker ones). No query filters on
# segment literals (grep-checked r13), and both engines see the same
# perturbed bytes, so the oracle contract is unchanged.
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

# table -> {column: SQL template with {i} = copy index}; applied to copies
# i > 0 only (see the SHIFTS/PERTURB comment above).
PERTURB = {
    "customer": {"c_mktsegment": "c_mktsegment || '#{i}'"},
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
        perturb = PERTURB.get(table, {})
        copies = 1 if not shifts else factor
        selects = []
        for i in range(copies):
            def proj_col(c, i=i):
                if c in shifts:
                    return f"({c} + {shifts[c] * i}) AS {c}"
                if c in perturb and i > 0:
                    return f"({perturb[c].format(i=i)}) AS {c}"
                return c
            proj = ", ".join(proj_col(c) for c in cols)
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

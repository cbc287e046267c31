#!/usr/bin/env python3
"""Cross-engine fixed-point check for the GraphScale run (driver-side
tool, like check.py): replay the SAME unrolled integer power iteration
the engine ran — rank' = reset + (85 * sum(rank // outdeg)) // 100 in
BIGINT at the recorded scale — in DuckDB over the DUMPED directed edge
list, and compare every row of both rank tables. This is the g09/g12
oracle discipline (GraphSuite.pagerankOracle) applied at the ≥1M-node
derived graph: fixed-point arithmetic is bit-exact in any engine, so ONE
mismatching row fails the gate.

PPR teleports to the root hub (vertex id 99999999 = ego 0's center in
copy 0 — GraphScale.hub(0)), matching personalizedRankFixedEdges' src.

Usage: graph_scale_check.py OUT_DIR [ITERS=10] [SCALE=10000000000]
Reads OUT_DIR/{edges,pagerank,ppr}.parquet + graph_scale_raw.json;
writes OUT_DIR/graph_scale_checked.json and exits nonzero on mismatch.
"""
import json
import sys

import duckdb

HUB0 = 99999999  # GraphScale.hub(0)


def unrolled(edges, iters, scale, reset_sql, init_sql):
    sb = [
        f"WITH dir AS MATERIALIZED (SELECT u, v FROM '{edges}'), ",
        "deg AS MATERIALIZED (SELECT u, count(*) AS dg FROM dir GROUP BY 1), ",
        # The graph is symmetric-directed, so every vertex has outdegree.
        "nodes AS MATERIALIZED (SELECT u AS v FROM deg), ",
        f"r0 AS MATERIALIZED (SELECT v, CAST({init_sql} AS BIGINT) AS r FROM nodes), ",
    ]
    for i in range(1, iters + 1):
        sb.append(
            f"m{i} AS MATERIALIZED (SELECT dir.v AS v, sum(p.r // deg.dg) AS m "
            f"FROM dir JOIN r{i-1} p ON p.v = dir.u "
            f"JOIN deg ON deg.u = dir.u GROUP BY 1), ")
        sb.append(
            f"r{i} AS MATERIALIZED (SELECT n.v, "
            f"CAST(({reset_sql}) + (85 * coalesce(m.m, 0)) // 100 AS BIGINT) AS r "
            f"FROM nodes n LEFT JOIN m{i} m ON m.v = n.v), ")
    return "".join(sb)[:-2]


def compare(con, edges, ranks, iters, scale, reset_sql, init_sql, id_col):
    cte = unrolled(edges, iters, scale, reset_sql, init_sql)
    q = (f"{cte} SELECT count(*) FROM r{iters} a "
         f"FULL JOIN '{ranks}' b ON a.v = b.{id_col} "
         f"WHERE a.r IS DISTINCT FROM b.rank_fp OR a.v IS NULL OR b.{id_col} IS NULL")
    return con.execute(q).fetchone()[0]


def main():
    out = sys.argv[1]
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    scale = int(sys.argv[3]) if len(sys.argv) > 3 else 10_000_000_000
    reset = 15 * scale // 100
    con = duckdb.connect()
    edges = f"{out}/edges.parquet/*.parquet"

    pr_bad = compare(con, edges, f"{out}/pagerank.parquet/*.parquet", iters, scale,
                     str(reset), str(scale), "id")
    print(f"pagerank mismatching rows: {pr_bad}")
    ppr_bad = compare(con, edges, f"{out}/ppr.parquet/*.parquet", iters, scale,
                      f"CASE WHEN n.v = {HUB0} THEN {reset} ELSE 0 END",
                      f"CASE WHEN v = {HUB0} THEN {scale} ELSE 0 END", "id")
    print(f"ppr mismatching rows: {ppr_bad}")

    raw = json.load(open(f"{out}/graph_scale_raw.json"))
    raw["fixed_point_check"] = {
        "engine": "duckdb-unrolled-integer-rounds",
        "iters": iters, "scale": scale,
        "pagerank_mismatches": pr_bad, "ppr_mismatches": ppr_bad,
        "pass": pr_bad == 0 and ppr_bad == 0,
    }
    with open(f"{out}/graph_scale_checked.json", "w") as f:
        json.dump(raw, f, indent=1)
    print(json.dumps(raw["fixed_point_check"]))
    sys.exit(0 if pr_bad == 0 and ppr_bad == 0 else 1)


if __name__ == "__main__":
    main()

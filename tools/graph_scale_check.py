#!/usr/bin/env python3
"""Cross-engine replay of the GraphScale run (driver-side tool, like
check.py): every at-scale graph result the engine dumped is re-derived in
DuckDB from the SAME dumped directed edge list and compared row by row —
the g09/g12 oracle discipline (GraphSuite.pagerankOracle) applied at the
>=1M-node derived graph. ONE mismatching row fails the gate.

 - g09/g12 PageRank/PPR: the same unrolled integer power iteration the
   engine ran — rank' = reset + (85 * sum(rank // outdeg)) // 100 in
   BIGINT at the recorded scale. Fixed-point arithmetic is bit-exact in
   any engine.
 - g08 CC: min-label propagation to ITS OWN fixpoint (labels at the
   fixpoint are the component-min vertex ids — engine-independent),
   compared per vertex against the dumped GraphX labels.
 - g11 k-core: the same <=8 relational peel rounds with the same
   early-exit-at-fixpoint semantics (drop nodes with degree < k, repeat),
   compared as a node set against the dumped surviving nodes.

PPR teleports to the root hub (vertex id 99999999 = ego 0's center in
copy 0 — GraphScale.hub(0)), matching personalizedRankFixedEdges' src.

Usage: graph_scale_check.py OUT_DIR [ITERS=10] [SCALE=10000000000]
Reads OUT_DIR/{edges,pagerank,ppr,cc,kcore}.parquet + graph_scale_raw.json;
writes OUT_DIR/graph_scale_checked.json and exits nonzero on mismatch.
"""
import json
import sys

import duckdb

HUB0 = 99999999  # GraphScale.hub(0)
KCORE_K = 10      # GraphScale's g11 parameters
KCORE_ROUNDS = 8


def unrolled(edges, iters, scale, reset_sql, init_sql):
    sb = [
        f"WITH dir AS MATERIALIZED (SELECT u, v FROM '{edges}'), ",
        "deg AS MATERIALIZED (SELECT u, count(*) AS dg FROM dir GROUP BY 1), ",
        # Nodes from BOTH endpoint columns (ADVICE r13: out-degree sources
        # only is correct solely for symmetric-directed dumps; the union
        # makes the checker reusable on asymmetric edge lists, where sinks
        # have no outdegree but still hold rank).
        "nodes AS MATERIALIZED (SELECT DISTINCT u AS v FROM dir "
        "UNION SELECT DISTINCT v FROM dir), ",
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


def cc_check(con, edges, labels):
    """Min-label propagation to the fixpoint (Python-side loop — each
    round is one SQL pass; early exit when no label changes), then a
    per-vertex FULL JOIN against the engine's dumped labels. The
    propagation table is the SYMMETRIC closure of the dump (UNION of
    both orientations — a set, so a dump that is already symmetric is
    unchanged), making the u→v min-label pass correct on ANY edge list,
    not just GraphScale's symmetric dumps (ADVICE r14: the one-direction
    form computed directed-reachability minima on asymmetric input —
    fail-safe, but the reusability claim was wrong). Returns
    (mismatches, rounds_to_fixpoint)."""
    con.execute(f"CREATE OR REPLACE TABLE cc_dir AS SELECT u, v FROM '{edges}' "
                f"UNION SELECT v, u FROM '{edges}'")
    con.execute("CREATE OR REPLACE TABLE cc_lbl AS "
                "SELECT v, v AS l FROM (SELECT DISTINCT u AS v FROM cc_dir "
                "UNION SELECT DISTINCT v FROM cc_dir)")
    rounds = 0
    # Hard stop well past any plausible diameter so a broken dump can't
    # spin forever; the fixpoint exit is the normal path.
    while rounds < 10000:
        con.execute(
            "CREATE OR REPLACE TABLE cc_next AS "
            "SELECT n.v, least(n.l, coalesce(m.ml, n.l)) AS l FROM cc_lbl n "
            "LEFT JOIN (SELECT d.v, min(p.l) AS ml FROM cc_dir d "
            "JOIN cc_lbl p ON p.v = d.u GROUP BY 1) m ON m.v = n.v")
        changed = con.execute(
            "SELECT count(*) FROM cc_next a JOIN cc_lbl b ON a.v = b.v "
            "WHERE a.l <> b.l").fetchone()[0]
        con.execute("DROP TABLE cc_lbl")
        con.execute("ALTER TABLE cc_next RENAME TO cc_lbl")
        rounds += 1
        if changed == 0:
            break
    bad = con.execute(
        f"SELECT count(*) FROM cc_lbl a FULL JOIN '{labels}' b ON a.v = b.id "
        "WHERE a.l IS DISTINCT FROM b.label OR a.v IS NULL OR b.id IS NULL"
    ).fetchone()[0]
    return bad, rounds


def kcore_check(con, edges, kcore):
    """The engine's exact peel semantics (GraphAnalytics.kcore): <= ROUNDS
    rounds of drop-degree-<k over the symmetric adjacency, early exit when
    a round's dead set is empty, surviving nodes = distinct v of the final
    adjacency. The dump is one tuple per undirected pair both ways, i.e.
    exactly the adjacency the engine peeled. Returns
    (mismatches, rounds_run)."""
    con.execute(f"CREATE OR REPLACE TABLE kc_adj AS SELECT u AS v, v AS u FROM '{edges}'")
    rounds = 0
    while rounds < KCORE_ROUNDS:
        con.execute("CREATE OR REPLACE TABLE kc_dead AS "
                    f"SELECT v FROM kc_adj GROUP BY v HAVING count(*) < {KCORE_K}")
        rounds += 1
        if con.execute("SELECT count(*) FROM kc_dead").fetchone()[0] == 0:
            break
        con.execute(
            "CREATE OR REPLACE TABLE kc_next AS SELECT a.v, a.u FROM kc_adj a "
            "ANTI JOIN kc_dead d ON a.v = d.v "
            "ANTI JOIN kc_dead e ON a.u = e.v")
        con.execute("DROP TABLE kc_adj")
        con.execute("ALTER TABLE kc_next RENAME TO kc_adj")
    bad = con.execute(
        "SELECT count(*) FROM (SELECT DISTINCT v FROM kc_adj) a "
        f"FULL JOIN '{kcore}' b ON a.v = b.node "
        "WHERE a.v IS NULL OR b.node IS NULL").fetchone()[0]
    return bad, rounds


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
    cc_bad, cc_rounds = cc_check(con, edges, f"{out}/cc.parquet/*.parquet")
    print(f"cc mismatching labels: {cc_bad} (fixpoint after {cc_rounds} rounds)")
    kc_bad, kc_rounds = kcore_check(con, edges, f"{out}/kcore.parquet/*.parquet")
    print(f"kcore mismatching nodes: {kc_bad} ({kc_rounds} peel rounds)")

    ok = pr_bad == 0 and ppr_bad == 0 and cc_bad == 0 and kc_bad == 0
    raw = json.load(open(f"{out}/graph_scale_raw.json"))
    raw["replay_check"] = {
        "engine": "duckdb-replay",
        "iters": iters, "scale": scale,
        "pagerank_mismatches": pr_bad, "ppr_mismatches": ppr_bad,
        "cc_label_mismatches": cc_bad, "cc_fixpoint_rounds": cc_rounds,
        "kcore_mismatches": kc_bad, "kcore_rounds": kc_rounds,
        "pass": ok,
    }
    with open(f"{out}/graph_scale_checked.json", "w") as f:
        json.dump(raw, f, indent=1)
    print(json.dumps(raw["replay_check"]))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()



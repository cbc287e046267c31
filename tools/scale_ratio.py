#!/usr/bin/env python3
"""Compare two bench_out.json records (e.g. sf0.1 vs derived sf1) and rank
queries by their scaling ratio — the 100 TB design-review feedback loop.

A 10x fixture should cost ~10x on scan-bound plans, less on
broadcast/agg-bound plans (fixed overheads amortize), and MORE only where
a plan has superlinear work in it — those are the rows to audit. Ratios
are computed on per-query MIN times (load-insensitive, round-6 lesson).

Usage: scale_ratio.py SMALL.json BIG.json [FACTOR=10]
"""
import json
import sys


def main() -> None:
    small = json.load(open(sys.argv[1]))
    big = json.load(open(sys.argv[2]))
    factor = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    a, b = small["queries_min"], big["queries_min"]
    rows = []
    for name in sorted(a):
        if name in b and a[name] > 0 and b[name] > 0:
            rows.append((b[name] / a[name], a[name], b[name], name))
    rows.sort(reverse=True)
    print(f"{'ratio':>7} {'small':>8} {'big':>8}  query   (fixture factor {factor:g}x)")
    for r, s, g, name in rows:
        flag = " <-- superlinear" if r > factor * 1.2 and g > 1.0 else ""
        print(f"{r:7.2f} {s:8.3f} {g:8.3f}  {name}{flag}")
    tot_s = sum(s for _, s, _, _ in rows)
    tot_g = sum(g for _, _, g, _ in rows)
    print(f"\ntotals (min-sum, shared queries): {tot_s:.1f}s -> {tot_g:.1f}s "
          f"= {tot_g / tot_s:.2f}x on a {factor:g}x fixture")


if __name__ == "__main__":
    main()

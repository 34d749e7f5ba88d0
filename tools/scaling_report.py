#!/usr/bin/env python3
"""Measured scaling report: compare two bench_out JSONs (e.g. sf0.01 vs
sf0.1 — a 10x data jump) and print per-family wall-clock ratios.

A ratio near 1 means the query is dominated by fixed overhead (plan,
session, tiny tables); near 10 means linear in the data; well above 10
flags superlinear work (pair generation, windows over corpus-sized
partitions) that needs a second look before a 100 TB run.

Usage: python3 tools/scaling_report.py bench_small.json bench_big.json
"""
import json, sys
from collections import defaultdict


def fam(name: str) -> str:
    return name.split("_", 1)[0]


def main() -> None:
    small = json.load(open(sys.argv[1]))["queries"]
    big = json.load(open(sys.argv[2]))["queries"]
    common = sorted(set(small) & set(big))
    rows = [(n, small[n], big[n], big[n] / small[n])
            for n in common if small[n] > 0]
    by_fam = defaultdict(list)
    for n, s, b, r in rows:
        by_fam[fam(n)].append((n, s, b, r))
    print(f"{len(rows)} common queries")
    print(f"{'family':10s}{'n':>4s}{'sum_small':>11s}{'sum_big':>10s}{'ratio':>8s}")
    for f in sorted(by_fam):
        qs = by_fam[f]
        ss, sb = sum(q[1] for q in qs), sum(q[2] for q in qs)
        print(f"{f:10s}{len(qs):4d}{ss:11.2f}{sb:10.2f}{sb / ss:8.2f}")
    print("\nTop 15 by ratio (superlinear suspects first):")
    for n, s, b, r in sorted(rows, key=lambda x: -x[3])[:15]:
        print(f"  {n:32s}{s:7.2f}s ->{b:7.2f}s  x{r:5.1f}")
    tot_s = sum(r[1] for r in rows)
    tot_b = sum(r[2] for r in rows)
    print(f"\ntotal: {tot_s:.1f}s -> {tot_b:.1f}s  x{tot_b / tot_s:.2f} "
          f"on a 10x data jump")


if __name__ == "__main__":
    main()

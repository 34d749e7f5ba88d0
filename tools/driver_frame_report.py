#!/usr/bin/env python3
"""Driver-frame per-query reconciliation (VERDICT r13 task #6).

The driver's BENCH_rN.json stores only the sweep total (its per-query
vector is truncated), so 2x-contract judgments used to rest on totals.
This tool recovers a per-query DRIVER-FRAME estimate from a committed
local full-sweep artifact (bench_out_rN_full.json, which does carry the
complete vector) by applying the pinned ambient frame factor (SCALE.md
"Driver-vs-local bench frame": x1.13, measured driver-over-builder on
the identical r12 surface), then reconciles every query against its
budget and flags the >2x breaches individually.

Usage:
  tools/driver_frame_report.py BENCH_OUT.json [PREV_BENCH_OUT.json]
     [--factor 1.13] [--budget bench_budget.json] [--threshold 2.0]

Output: a markdown table of every query whose driver-frame estimate
exceeds threshold x budget (plus summary stats), and with a PREV
artifact, the largest per-query regressions between the two sweeps.
"""
import argparse
import json
import sys


def load(path):
    with open(path) as f:
        return json.load(f)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("artifact")
    ap.add_argument("prev", nargs="?")
    ap.add_argument("--factor", type=float, default=1.13)
    ap.add_argument("--budget", default="bench_budget.json")
    ap.add_argument("--threshold", type=float, default=2.0)
    ap.add_argument("--top", type=int, default=15)
    args = ap.parse_args()

    art = load(args.artifact)
    budget = load(args.budget)
    qs = {k: v for k, v in art["queries"].items() if v is not None}
    total = sum(qs.values())

    print(f"# Driver-frame reconciliation: {args.artifact}")
    print(f"- local sweep total: {total:.2f} s over {len(qs)} queries "
          f"(sf={art.get('sf')}, repeat={art.get('repeat')})")
    print(f"- driver-frame estimate (x{args.factor}): "
          f"{total * args.factor:.2f} s")
    failed = art.get("failed") or {}
    if failed:
        print(f"- FAILED at least once: {sorted(failed)}")

    rows = []
    for name, sec in sorted(qs.items()):
        b = budget.get(name)
        # r15 structured budgets: {"sec":..., "shuffle_mb":..., "scan_mb":...}
        if isinstance(b, dict):
            b = b.get("sec")
        if b is None:
            continue
        est = sec * args.factor
        ratio = est / b if b > 0 else float("inf")
        rows.append((ratio, name, sec, est, b))
    rows.sort(reverse=True)

    over = [r for r in rows if r[0] > args.threshold and r[3] - r[4] >= 0.3]
    print(f"\n## Queries over {args.threshold}x budget in the driver frame "
          f"(>=0.3 s absolute)")
    print("| query | local s | driver-frame s | budget s | ratio |")
    print("|---|---|---|---|---|")
    for ratio, name, sec, est, b in over:
        print(f"| {name} | {sec:.2f} | {est:.2f} | {b:.2f} | x{ratio:.2f} |")
    if not over:
        print("| (none) | | | | |")

    print(f"\n## Top {args.top} by driver-frame cost")
    print("| query | local s | driver-frame s | budget s | ratio |")
    print("|---|---|---|---|---|")
    for ratio, name, sec, est, b in sorted(rows, key=lambda r: -r[2])[:args.top]:
        print(f"| {name} | {sec:.2f} | {est:.2f} | {b:.2f} | x{ratio:.2f} |")

    if args.prev:
        prev = load(args.prev)
        pq = {k: v for k, v in prev["queries"].items() if v is not None}
        common = sorted(set(qs) & set(pq))
        tot_now = sum(qs[k] for k in common)
        tot_prev = sum(pq[k] for k in common)
        print(f"\n## vs {args.prev} ({len(common)} shared queries)")
        print(f"- shared-surface total: {tot_now:.2f} s vs {tot_prev:.2f} s "
              f"= x{tot_now / tot_prev:.3f}")
        regs = sorted(
            ((qs[k] / pq[k], k, pq[k], qs[k]) for k in common
             if pq[k] > 0 and qs[k] - pq[k] >= 0.3),
            reverse=True)[:args.top]
        print("| query | prev s | now s | ratio |")
        print("|---|---|---|---|")
        for ratio, name, p, n in regs:
            print(f"| {name} | {p:.2f} | {n:.2f} | x{ratio:.2f} |")
        if not regs:
            print("| (no >=0.3 s regressions) | | | |")
    return 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python3
"""Compare two Bench JSON artifacts: shared-entry totals, median
per-query ratio, and >1.5x movers (both directions).

Usage: python3 tools/bench_compare.py <old.json> <new.json>
"""
import json, sys, statistics


def load(p):
    with open(p) as f:
        return json.load(f)


def main():
    old, new = load(sys.argv[1]), load(sys.argv[2])
    qo, qn = old["queries"], new["queries"]
    shared = sorted(set(qo) & set(qn))
    to = sum(qo[q] for q in shared)
    tn = sum(qn[q] for q in shared)
    ratios = {q: (qn[q] / qo[q]) for q in shared if qo[q] > 0}
    med = statistics.median(ratios.values())
    print(f"shared entries: {len(shared)}")
    print(f"shared total: {to:.1f} -> {tn:.1f} s  ratio {tn/to:.3f}")
    print(f"median per-query ratio: {med:.3f}")
    movers = sorted((r, q) for q, r in ratios.items()
                    if (r > 1.5 or r < 1 / 1.5) and max(qo[q], qn[q]) >= 0.5)
    for r, q in movers:
        print(f"  mover {q}: {qo[q]:.2f} -> {qn[q]:.2f} s ({r:.2f}x)")
    new_only = sorted(set(qn) - set(qo))
    if new_only:
        cost = sum(qn[q] for q in new_only)
        print(f"new entries: {len(new_only)} costing {cost:.1f} s total")


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Per-query scaling-ratio table for the sf1 scale-stress gate.

Usage: python3 tools/scale_ratio.py BENCH_SMALL.json BENCH_BIG.json [factor]

Reads two Bench JSON lines (same query set, different SF), prints a
markdown table of per-query seconds and the big/small ratio, sorted by
ratio descending, and flags ratios above `factor * 1.5` (default factor
10: a 10x data growth should cost <= ~15x time for near-linear plans —
the slack covers fixed per-query scheduler overhead amortizing
differently at the two scales). Exit code 1 if any flagged query exceeds
the superlinear threshold AND takes > 2s at the big scale (tiny-query
ratios are dominated by constant overhead and are not evidence).
"""
import json, sys

def load(path):
    with open(path) as f:
        for line in f.read().splitlines()[::-1]:
            line = line.strip()
            if line.startswith('{') and '"metric"' in line:
                return json.loads(line)
    raise SystemExit(f"no bench JSON line in {path}")

small = load(sys.argv[1])
big = load(sys.argv[2])
factor = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
thresh = factor * 1.5

qs_s, qs_b = small["queries"], big["queries"]
common = sorted(set(qs_s) & set(qs_b))
rows = []
for q in common:
    s, b = qs_s[q], qs_b[q]
    if s <= 0 or b <= 0:
        rows.append((float("inf"), q, s, b))
        continue
    rows.append((b / s, q, s, b))
rows.sort(reverse=True)

flagged = []
print(f"| query | sf{small['sf']} s | sf{big['sf']} s | ratio |")
print("|---|---|---|---|")
for r, q, s, b in rows:
    mark = ""
    if r > thresh and b > 2.0:
        mark = " **SUPERLINEAR**"
        flagged.append(q)
    print(f"| {q} | {s:.2f} | {b:.2f} | {r:.1f}x{mark} |")

tot_s = sum(v for v in qs_s.values() if v > 0)
tot_b = sum(v for v in qs_b.values() if v > 0)
print(f"\ntotal: {tot_s:.1f}s -> {tot_b:.1f}s ({tot_b/tot_s:.1f}x on {factor:.0f}x data); "
      f"failed small={small['n_failed']} big={big['n_failed']}")
if flagged:
    print("FLAGGED:", ", ".join(flagged))
    sys.exit(1)

#!/usr/bin/env python3
"""Per-query scaling-ratio table for the sf1 scale-stress gate.

Usage: python3 tools/scale_ratio.py BENCH_SMALL.json BENCH_BIG.json [factor] \
           [METRICS_SMALL.json METRICS_BIG.json]

Reads two Bench JSON lines (same query set, different SF), prints a
markdown table of per-query seconds and the big/small ratio, sorted by
ratio descending, and flags ratios above `factor * 1.5` (default factor
10: a 10x data growth should cost <= ~15x time for near-linear plans —
the slack covers fixed per-query scheduler overhead amortizing
differently at the two scales). Exit code 1 if any flagged query exceeds
the superlinear threshold AND takes > 2s at the big scale (tiny-query
ratios are dominated by constant overhead and are not evidence).

With the optional metrics side files (Bench's SPARK_GRAFT_METRICS_OUT),
two more columns appear: the big/small ratio of PHYSICAL BYTES moved
(shuffle write + parquet input — deterministic, noise-free) and the max
single-task seconds at the big scale (skew evidence). Wall time on a
shared box is noisy; the byte ratio is the load-bearing linearity proof.
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
met_s = met_b = None
if len(sys.argv) > 5:
    met_s = json.load(open(sys.argv[4]))["per_query"]
    met_b = json.load(open(sys.argv[5]))["per_query"]

def phys_bytes(m):
    return m["shuffle_write_b"] + m["input_b"]

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
hdr = f"| query | sf{small['sf']} s | sf{big['sf']} s | ratio |"
sep = "|---|---|---|---|"
if met_s:
    hdr += " bytes ratio | max task s |"
    sep += "---|---|"
print(hdr)
print(sep)
for r, q, s, b in rows:
    mark = ""
    if r > thresh and b > 2.0:
        mark = " **SUPERLINEAR**"
        flagged.append(q)
    row = f"| {q} | {s:.2f} | {b:.2f} | {r:.1f}x{mark} |"
    if met_s:
        if q in met_s and q in met_b and phys_bytes(met_s[q]) > 0:
            br = phys_bytes(met_b[q]) / phys_bytes(met_s[q])
            row += f" {br:.1f}x | {met_b[q]['max_task_ms']/1e3:.1f} |"
        else:
            row += " — | — |"
    print(row)

tot_s = sum(v for v in qs_s.values() if v > 0)
tot_b = sum(v for v in qs_b.values() if v > 0)
print(f"\ntotal: {tot_s:.1f}s -> {tot_b:.1f}s ({tot_b/tot_s:.1f}x on {factor:.0f}x data); "
      f"failed small={small['n_failed']} big={big['n_failed']}")
if flagged:
    print("FLAGGED:", ", ".join(flagged))
    sys.exit(1)

#!/usr/bin/env python3
"""Box-factor-corrected bench comparison (VERDICT r14 Next #1).

The driver's per-round bench runs on whatever box is free: r14's run
showed a UNIFORM 0.83-2.06x spread on queries whose code did not change
since r13 — a machine factor, not a regression. Comparing raw seconds
across such runs generates false 2x-gate verdicts. This tool divides
that factor out:

  1. Load two bench results (full `graft.Bench` JSON lines, files that
     wrap one, or the driver's BENCH_r{N}.json tail-fragment format).
  2. box = median(new_sec / old_sec) over the overlapping queries NOT
     named in --changed (queries whose implementing source moved this
     round). With few changed queries the median over the full overlap
     is already robust; --changed tightens it.
  3. residual(q) = (new/old) / box. Flag only queries with residual >
     --threshold (default 1.3) AND new_sec > --floor (default 0.3 s —
     sub-300 ms readings are scheduler noise at local[32]).

Usage:
  tools/bench_compare.py OLD NEW [--changed a,b,c] [--threshold 1.3]
      [--floor 0.3] [--json] [--gate]

  --json  emit one machine-readable JSON line (used by close.sh)
  --gate  exit 1 when any query is flagged (default: informational)
"""
import argparse
import json
import re
import signal
import statistics
import sys

# head-truncated output is fine (close.sh tees us into logs)
signal.signal(signal.SIGPIPE, signal.SIG_DFL)

NON_QUERY_KEYS = {"metric", "value", "unit", "sf", "n", "rc", "cpus",
                  "n_queries", "n_failed", "runs", "min_of"}


def load_queries(path):
    """Return {query: seconds} from any of the three formats we see:
    a full Bench JSON line (possibly wrapped in a file with [info]
    prefixes), a dict with a 'queries' map, or the driver's
    BENCH_r{N}.json whose 'tail' holds the LAST 2000 chars of the line
    (truncated head -> parse name:number pairs by regex)."""
    raw = open(path).read()
    text = raw
    try:
        d = json.loads(raw)
        if isinstance(d, dict):
            if isinstance(d.get("queries"), dict):
                return {k: float(v) for k, v in d["queries"].items()}
            if isinstance(d.get("parsed"), dict) and \
                    isinstance(d["parsed"].get("queries"), dict):
                return {k: float(v)
                        for k, v in d["parsed"]["queries"].items()}
            if isinstance(d.get("tail"), str):
                text = d["tail"]
    except json.JSONDecodeError:
        # raw Bench stdout: find the metric line, strip sbt prefixes
        for line in raw.splitlines():
            line = line.replace("[info] ", "").strip()
            if line.startswith("{") and '"metric"' in line:
                q = json.loads(line).get("queries", {})
                return {k: float(v) for k, v in q.items()}
    pairs = re.findall(r'"([A-Za-z0-9_]+)":([0-9]+(?:\.[0-9]+)?)', text)
    return {k: float(v) for k, v in pairs if k not in NON_QUERY_KEYS}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--changed", default="",
                    help="comma-separated query names whose source changed "
                         "(excluded from the box-factor median)")
    ap.add_argument("--threshold", type=float, default=1.3)
    ap.add_argument("--floor", type=float, default=0.3,
                    help="ignore queries under this many NEW seconds")
    ap.add_argument("--json", action="store_true")
    ap.add_argument("--gate", action="store_true")
    a = ap.parse_args()

    old = load_queries(a.old)
    new = load_queries(a.new)
    changed = {c for c in a.changed.split(",") if c}
    overlap = sorted(set(old) & set(new))
    if not overlap:
        print(f"FAIL: no overlapping queries between {a.old} and {a.new}",
              file=sys.stderr)
        sys.exit(2)
    basis = [q for q in overlap if q not in changed] or overlap
    box = statistics.median(new[q] / old[q] for q in basis)

    rows = []
    for q in overlap:
        ratio = new[q] / old[q]
        rows.append((q, old[q], new[q], ratio, ratio / box))
    rows.sort(key=lambda r: -r[4])
    flagged = [r for r in rows
               if r[4] > a.threshold and r[2] > a.floor]

    out = {
        "old": a.old, "new": a.new,
        "overlap": len(overlap), "basis": len(basis),
        "box_factor": round(box, 4),
        "threshold": a.threshold, "floor": a.floor,
        "flagged": [{"query": q, "old_s": round(o, 3), "new_s": round(n, 3),
                     "ratio": round(r, 3), "residual": round(res, 3)}
                    for q, o, n, r, res in flagged],
    }
    if a.json:
        print(json.dumps(out))
    else:
        print(f"box factor (median over {len(basis)} unchanged of "
              f"{len(overlap)} overlapping): {box:.3f}x")
        print(f"{'query':40s} {'old_s':>8s} {'new_s':>8s} "
              f"{'ratio':>7s} {'resid':>7s}")
        for q, o, n, r, res in rows[:15]:
            mark = "  <-- FLAG" if (q, o, n, r, res) in [
                tuple(f) for f in flagged] else ""
            print(f"{q:40s} {o:8.3f} {n:8.3f} {r:7.2f} {res:7.2f}{mark}")
        if flagged:
            print(f"\n{len(flagged)} flagged (residual > {a.threshold}x "
                  f"after box correction, new > {a.floor}s):")
            for q, o, n, r, res in flagged:
                print(f"  {q}: {o:.2f}s -> {n:.2f}s "
                      f"(raw {r:.2f}x, residual {res:.2f}x)")
        else:
            print(f"\nno residual regressions (threshold {a.threshold}x, "
                  f"floor {a.floor}s)")
    sys.exit(1 if (a.gate and flagged) else 0)


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Compare two bench stdout JSON lines (or detail files): per-query deltas,
sorted by regression, plus totals. Usage:
  python3 tools/bench_compare.py BENCH_r07.json BENCH_r08.json [threshold]
Accepts either the driver's stdout-line artifact ({"queries": {...}}) or a
BENCH_DETAIL file ({"q_x": {"wall": ...}}).
"""
import json
import sys


def load(path):
    d = json.load(open(path))
    if "queries" in d:
        return {k: float(v) for k, v in d["queries"].items()}
    out = {}
    for k, v in d.items():
        if isinstance(v, dict) and "wall" in v:
            out[k] = float(v["wall"])
    return out


def main(a_path, b_path, thresh=0.15):
    a, b = load(a_path), load(b_path)
    common = sorted(set(a) & set(b))
    rows = [(b[q] - a[q], a[q], b[q], q) for q in common]
    rows.sort(reverse=True)
    print(f"common={len(common)} total A={sum(a[q] for q in common):.1f}s "
          f"B={sum(b[q] for q in common):.1f}s")
    print("\n-- regressions (delta > %.2fs) --" % thresh)
    for d, va, vb, q in rows:
        if d > thresh:
            print(f"{q:32s} {va:7.2f} -> {vb:7.2f}  (+{d:.2f}s)")
    print("\n-- improvements (delta < -%.2fs) --" % thresh)
    for d, va, vb, q in sorted(rows):
        if d < -thresh:
            print(f"{q:32s} {va:7.2f} -> {vb:7.2f}  ({d:.2f}s)")
    only_b = sorted(set(b) - set(a))
    if only_b:
        print("\n-- new in B --")
        for q in only_b:
            print(f"{q:32s} {b[q]:7.2f}")


if __name__ == "__main__":
    t = float(sys.argv[3]) if len(sys.argv) > 3 else 0.15
    main(sys.argv[1], sys.argv[2], t)

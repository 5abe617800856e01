#!/usr/bin/env python3
"""Diff two per-query bench lines (BENCH_queries_r{N}.json / BENCH.out line 1).

Usage: python3 tools/bench_diff.py OLD.json NEW.json [threshold_sec]

Prints per-query deltas beyond the threshold (default 0.4 s), queries added/
removed, and the common-query total — the number to compare across rounds,
since the grand total moves whenever gates are added.
"""
import json
import sys


def load(path):
    """Accept either a bare bench line ({"queries": ...}) or the driver's
    BENCH_r{N}.json wrapper ({"parsed": {...}}). Driver wrappers before r7
    carry only top5, so they diff on those five; prefer BENCH_queries_r{N}
    files for full coverage."""
    with open(path) as f:
        text = f.read()
    d = json.loads(text.splitlines()[0]) if text.lstrip().startswith('{"') \
        else json.loads(text)
    if "queries" in d:
        return d["queries"]
    p = d.get("parsed", {})
    if "queries" in p:
        return p["queries"]
    if "top5" in p:
        return p["top5"]
    raise SystemExit(f"{path}: no per-query map found")


def main():
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    old, new = load(sys.argv[1]), load(sys.argv[2])
    thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 0.4
    common = sorted(set(old) & set(new))
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))
    diffs = [(q, old[q], new[q], new[q] - old[q]) for q in common
             if abs(new[q] - old[q]) >= thresh]
    diffs.sort(key=lambda x: -abs(x[3]))
    for q, o, n, d in diffs:
        print(f"{q:32s} {o:8.3f} -> {n:8.3f}  ({d:+.3f})")
    if added:
        print(f"added   ({len(added)}): " + ", ".join(f"{q}={new[q]:.2f}s" for q in added))
    if removed:
        print(f"removed ({len(removed)}): " + ", ".join(removed))
    co, cn = sum(old[q] for q in common), sum(new[q] for q in common)
    if common and co > 0:
        print(f"common-query total ({len(common)}q): {co:.1f} -> {cn:.1f} s "
              f"({(cn - co) / co * 100:+.1f}%)")
    else:
        print("no common queries — totals below are not comparable")
    print(f"grand total: {sum(old.values()):.1f} ({len(old)}q) -> "
          f"{sum(new.values()):.1f} s ({len(new)}q)")


if __name__ == "__main__":
    main()

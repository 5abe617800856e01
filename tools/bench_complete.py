#!/usr/bin/env python3
"""Round-close invariant: the per-query bench file must cover EVERY gate in
the final build — rounds 7 and 8 both shipped per-query benches generated
before the last gate commits, leaving new gates unmeasured.

Compares the `queries` key set of a BENCH_queries_r{N}.json (or BENCH.out
line 1) against queries.json from the same build's Verify run (the full
gate roster, including rows-only gates without oracle SQL). Exit 1 on any
gate missing from the bench.

Usage: python3 tools/bench_complete.py <bench_json> <queries.json>
"""
import json
import sys


def main(bench_path, roster_path):
    bench = json.load(open(bench_path))
    measured = set(bench["queries"].keys())
    roster = json.load(open(roster_path))
    gates = set(roster if isinstance(roster, list) else roster.keys())
    missing = sorted(gates - measured)
    extra = sorted(measured - gates)
    for m in missing:
        print(f"UNMEASURED {m}")
    for e in extra:
        print(f"STALE {e} (benched but no longer a gate)")
    print(f"bench {len(measured)} / gates {len(gates)}, "
          f"{len(missing)} unmeasured, {len(extra)} stale")
    return 1 if missing or extra else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

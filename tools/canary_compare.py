#!/usr/bin/env python3
"""Compare two rounds' canary files (see tools/canary.sh + SCALE.md).

Usage: tools/canary_compare.py CANARY_rA.json CANARY_rB.json

Prints per-query ratios and applies the SCALE.md rule mechanically:
a ~uniform shift across canaries is box state (report the median as the
discount for full-surface totals); any single canary moving >1.5x while
the median holds is flagged as a plan change to investigate.
"""
import json
import statistics
import sys


def main() -> int:
    if len(sys.argv) != 3:
        print(__doc__.strip(), file=sys.stderr)
        return 2
    a = json.load(open(sys.argv[1]))["queries"]
    b = json.load(open(sys.argv[2]))["queries"]
    common = sorted(set(a) & set(b))
    if not common:
        print("no common canary queries", file=sys.stderr)
        return 2
    ratios = {q: b[q] / a[q] for q in common}
    med = statistics.median(ratios.values())
    print(f"{'query':34s} {'A':>7s} {'B':>7s} {'B/A':>6s}")
    for q in common:
        print(f"{q:34s} {a[q]:7.2f} {b[q]:7.2f} {ratios[q]:6.2f}")
    print(f"\nmedian ratio (box-state discount): {med:.2f}")
    flagged = [q for q, r in ratios.items()
               if r / med > 1.5 or med / r > 1.5]
    if flagged:
        print("PLAN-CHANGE suspects (>1.5x vs the median shift):")
        for q in flagged:
            print(f"  {q}: {ratios[q]:.2f}x (vs median {med:.2f}x)")
    else:
        print("no canary moved >1.5x relative to the median shift — "
              "any full-surface total delta is box state up to the median.")
    return 0


if __name__ == "__main__":
    sys.exit(main())

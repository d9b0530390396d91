#!/usr/bin/env python3
"""Per-query scaling ratios between two graft.Bench JSON lines.

Usage: python3 tools/scale_ratios.py <bench_small.json> <bench_big.json> [factor]

Prints a markdown table of median seconds at each scale and the
time ratio big/small, sorted by ratio descending, plus a summary.
`factor` (default 10) is the data-size ratio between the two runs —
queries whose time ratio exceeds it are scaling super-linearly.
"""
import json
import math
import sys


def load(path):
    with open(path) as f:
        return json.loads(f.read().strip().splitlines()[-1])


def main():
    small, big = load(sys.argv[1]), load(sys.argv[2])
    factor = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    qs, qb = small["queries"], big["queries"]
    common = sorted(set(qs) & set(qb))
    rows = []
    for q in common:
        a, b = qs[q], qb[q]
        if a is None or b is None or a <= 0 or b <= 0:
            continue
        rows.append((q, a, b, b / a))
    if not rows:
        sys.exit("no comparable queries between the two bench files "
                 "(disjoint query sets, or all common entries errored)")
    rows.sort(key=lambda r: -r[3])
    print(f"| query | {sys.argv[1].split('/')[-1]} s | "
          f"{sys.argv[2].split('/')[-1]} s | ratio | exponent |")
    print("|---|---|---|---|---|")
    for q, a, b, r in rows:
        flag = " **super-linear**" if r > factor else ""
        exp = math.log(r) / math.log(factor)
        print(f"| {q} | {a:.3f} | {b:.3f} | {r:.2f}{flag} | {exp:.2f} |")
    ratios = sorted(r[3] for r in rows)
    med = ratios[len(ratios) // 2]
    over = [r for r in rows if r[3] > factor]
    print(f"\n{len(rows)} queries; median ratio {med:.2f} "
          f"(exponent {math.log(med) / math.log(factor):.2f}); "
          f"{len(over)} over the {factor:g}x data factor "
          f"(exponent > 1)")


if __name__ == "__main__":
    main()

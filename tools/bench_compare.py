#!/usr/bin/env python3
"""Compare a Bench JSON line against the frozen r3 baseline and the rolling
BASELINE.md table.

Usage: python3 tools/bench_compare.py <bench.json> [baseline.md ...]

For each baseline file, prints per-query ratios (bench_ms / baseline_ms) for
the queries both sides know, the median/max ratio, every query above 2x, and
the bench queries missing from the baseline (candidates for new rows).
"""
import json
import re
import statistics
import sys


def load_baseline(path):
    rows = {}
    for line in open(path):
        m = re.match(r"\|\s*(\w+)\s*\|\s*0\.1\s*\|\s*(\d+)\s*\|", line)
        if m:
            rows[m.group(1)] = int(m.group(2))
    return rows


def main(bench_path, baselines):
    line = open(bench_path).read().strip()
    bench = json.loads(line[line.index('{"metric"'):])
    q = {k: v * 1000 for k, v in bench["queries"].items() if v >= 0}
    print(f"bench: {len(q)} queries, total {bench['value']:.1f}s")
    for bl in baselines:
        base = load_baseline(bl)
        shared = sorted(set(q) & set(base))
        ratios = {n: q[n] / base[n] for n in shared if base[n] > 0}
        med = statistics.median(ratios.values())
        print(f"\n== vs {bl}: {len(shared)} shared, median ratio {med:.2f}x")
        worst = sorted(ratios.items(), key=lambda kv: -kv[1])[:8]
        for n, r in worst:
            print(f"  {n}: {r:.2f}x ({base[n]}ms -> {q[n]:.0f}ms)")
        over = [n for n, r in ratios.items() if r > 2.0]
        if over:
            print("  >2x: " + ", ".join(sorted(over)))
        missing = sorted(set(q) - set(base))
        if missing:
            print("  not in baseline: " + ", ".join(missing))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2:] or ["BASELINE_r3.md", "BASELINE.md"])

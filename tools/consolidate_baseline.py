#!/usr/bin/env python3
"""Fold BENCH_FULL.json into BASELINE.md's per-query table.

Replaces the data rows of the '## Local baseline' table with one row per
query from the latest full-suite bench, making it the single authoritative
per-query reference point (the 2x envelope is then checkable for the whole
surface). Usage: python3 tools/consolidate_baseline.py
"""
import json
import re
import sys

bench = json.load(open("BENCH_FULL.json"))
queries = bench["queries"]
sf = bench["sf"].rstrip("/").split("sf")[-1]

lines = open("BASELINE.md").read().splitlines(keepends=True)
out = []
i = 0
n = len(lines)
replaced = False
while i < n:
    line = lines[i]
    out.append(line)
    if line.startswith("| query | sf | wall-clock ms") and not replaced:
        out.append(lines[i + 1])  # separator row
        i += 2
        # skip old data rows
        while i < n and lines[i].startswith("| "):
            i += 1
        for name in sorted(queries):
            v = queries[name]
            ms = "-1" if v < 0 else str(int(round(v * 1000)))
            out.append(f"| {name} | {sf} | {ms} | local[32], "
                       "shuffle.partitions=32, AQE on |\n")
        replaced = True
        continue
    i += 1

if not replaced:
    sys.exit("per-query table header not found in BASELINE.md")
open("BASELINE.md", "w").writelines(out)
print(f"wrote {len(queries)} rows (sf{sf})")

#!/usr/bin/env python3
"""Fold BENCH_FULL.json into BASELINE.md's per-query table.

Replaces the data rows of the '## Local baseline' table with one row per
query from the latest full-suite bench, making it the single authoritative
per-query reference point (the 2x envelope is then checkable for the whole
surface). The bench emits reconciled figures (any query >2x its previous
baseline row in-suite is re-measured isolated; see Bench.scala) plus
per-query shuffle bytes and peak task memory, so the table now carries a
telemetry column pair: host pollution shows up as inflated wall-clock with
UNCHANGED shuffle bytes, a real plan regression moves both.
Usage:
  python3 tools/consolidate_baseline.py
      full refresh — every row's wall-clock AND telemetry from BENCH_FULL
  python3 tools/consolidate_baseline.py --telemetry-only [--update-times q1,q2]
      keep each existing row's wall-clock ms (the table stays the fastest
      honest isolated sweep — a uniformly slower host must not loosen the
      2x reconciliation envelope); only fill the telemetry columns from
      the latest sweep. --update-times lists queries whose IMPLEMENTATION
      changed, so their old ms describes retired code and must be replaced.
      Queries absent from the table get full rows either way.
"""
import json
import re
import sys

telemetry_only = "--telemetry-only" in sys.argv
update_times = set()
if "--update-times" in sys.argv:
    update_times = set(
        sys.argv[sys.argv.index("--update-times") + 1].split(","))

bench = json.load(open("BENCH_FULL.json"))
queries = bench["queries"]
detail = bench.get("detail", {})
sf = bench["sf"].rstrip("/").split("sf")[-1]

HEADER = ("| query | sf | wall-clock ms (median of 3, noop sink, after warmup)"
          " | shuffle r+w MB | peak task mem MB | spark conf |\n")
SEP = "|---|---|---|---|---|---|\n"


def row(name, keep_ms=None):
    v = queries[name]
    ms = keep_ms if keep_ms is not None else (
        "-1" if v < 0 else str(int(round(v * 1000))))
    d = detail.get(name) or {}
    # the stats of whichever run produced the reported figure
    stats = d.get("isolated") or d.get("in_suite") or {}
    if stats:
        mb = (stats["shuffle_read"] + stats["shuffle_write"]) / 1e6
        peak = stats["peak_task_mem"] / 1e6
        tele = f"| {mb:.1f} | {peak:.1f} "
    else:
        tele = "| — | — "
    conf = "local[32], shuffle.partitions=32, AQE on"
    if keep_ms is None and d.get("isolated"):
        conf += "; isolated re-measure"
    return f"| {name} | {sf} | {ms} {tele}| {conf} |\n"


lines = open("BASELINE.md", encoding="utf-8").read().splitlines(keepends=True)
out = []
i = 0
n = len(lines)
replaced = False
while i < n:
    line = lines[i]
    if line.startswith("| query | sf | wall-clock ms") and not replaced:
        out.append(HEADER)
        if i + 1 >= n or not lines[i + 1].lstrip().startswith("|"):
            sys.exit("per-query table header has no separator row")
        out.append(SEP)
        i += 2
        # collect (and skip) old data rows, keeping their ms values
        old_ms = {}
        while i < n and lines[i].startswith("| "):
            m = re.match(r"\|\s*(\w+)\s*\|\s*[\d.]+\s*\|\s*(-?\d+)\s*\|",
                         lines[i])
            if m:
                old_ms[m.group(1)] = m.group(2)
            i += 1
        for name in sorted(queries):
            keep = (old_ms.get(name)
                    if telemetry_only and name not in update_times else None)
            out.append(row(name, keep_ms=keep))
        replaced = True
        continue
    out.append(line)
    i += 1

if not replaced:
    sys.exit("per-query table header not found in BASELINE.md")
open("BASELINE.md", "w", encoding="utf-8").writelines(out)
n_iso = sum(1 for d in detail.values() if d.get("isolated"))
print(f"wrote {len(queries)} rows (sf{sf}), {n_iso} isolated re-measures")

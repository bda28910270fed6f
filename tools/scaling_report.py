#!/usr/bin/env python3
"""Render SCALING.md tables from ScaleBench JSON lines.

Usage: tools/scaling_report.py <jsonl-or-log files...>
Reads every line that parses as a ScaleBench result JSON object, keeps the
LAST result per (workload, factor) across all inputs (later files win), and
prints a markdown table per workload with wall sec, shuffle MB, output rows,
and per-step growth ratios against the data growth factor.
"""
import json
import sys

results = {}
order = []
for path in sys.argv[1:]:
    with open(path, encoding="utf-8", errors="replace") as f:
        for line in f:
            line = line.strip()
            if not line.startswith('{"workload"'):
                continue
            try:
                r = json.loads(line)
            except json.JSONDecodeError:
                continue
            if "error" in r:
                continue
            key = (r["workload"], r["factor"])
            if r["workload"] not in [w for w, _ in order]:
                pass
            results[key] = r

workloads = []
for (w, _f) in results:
    if w not in workloads:
        workloads.append(w)

for w in workloads:
    rows = sorted((f, r) for (ww, f), r in results.items() if ww == w)
    print(f"### {w}\n")
    print("| factor | wall s | shuffle MB | rows | data × | shuffle × | rows × |")
    print("|---|---|---|---|---|---|---|")
    prev = None
    for f, r in rows:
        if prev is None:
            dx = sx = rx = "—"
        else:
            pf, pr = prev
            dx = f"{f / pf:.0f}×"
            sx = ("∞" if pr["shuffle_mb"] == 0 and r["shuffle_mb"] > 0
                  else "0" if r["shuffle_mb"] == 0
                  else f"{r['shuffle_mb'] / pr['shuffle_mb']:.1f}×")
            rx = ("—" if pr["rows"] == 0 else f"{r['rows'] / pr['rows']:.1f}×")
        print(f"| {f} | {r['sec']} | {r['shuffle_mb']} | {r['rows']} | {dx} | {sx} | {rx} |")
        prev = (f, r)
    print()

#!/usr/bin/env python3
"""Render the canonical per-query BASELINE rows from one or more Bench JSON
lines (the `{"metric":"total",...,"queries":{...},"passes":{...}}` output of
graft.Bench). Each query's canonical row is the min across every pass of
every supplied file — one provenance, no archaeology.

Usage: python3 tools/canonical_rows.py bench1.json [bench2.json ...]
Emits a markdown table on stdout plus a total line.
"""
import json, sys

best = {}
for path in sys.argv[1:]:
    for line in open(path).read().strip().splitlines():
        try:
            d = json.loads(line)
        except json.JSONDecodeError:
            continue
        if "queries" not in d and "parsed" in d:
            d = d["parsed"]
        passes = d.get("passes") or {}
        queries = d.get("queries") or {}
        for q, secs in (passes.items() if passes else queries.items()):
            vals = secs if isinstance(secs, list) else [secs]
            m = min(vals)
            if q not in best or m < best[q]:
                best[q] = m

print("| Query | sec (min of passes) |")
print("|---|---|")
for q in sorted(best):
    print(f"| {q} | {best[q]:.2f} |")
print()
print(f"**Total (sum of canonical rows): {sum(best.values()):.1f} s over {len(best)} queries**")

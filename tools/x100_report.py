#!/usr/bin/env python3
"""Render a replica-sweep artifact (tools/check.py GRAFT_CHECK_JSON output)
as the BASELINE.md markdown record: summary line + per-query table with
Spark and oracle wall seconds. Usage:
    python3 tools/x100_report.py CORRECTNESS_x100.json
"""
import json, sys

art = json.load(open(sys.argv[1]))
total = len(art)
green = sum(1 for v in art.values()
            if v.get("rows_match") and v.get("schema_match") and v.get("hash_match"))
fails = {k: v for k, v in art.items()
         if not (v.get("rows_match") and v.get("schema_match") and v.get("hash_match"))}
spark_total = sum(v.get("spark_sec") or 0 for v in art.values())
oracle_total = sum(v.get("oracle_sec") or 0 for v in art.values())

print(f"{green}/{total} hash-green; Spark phase {spark_total:.0f} s, "
      f"DuckDB oracle phase {oracle_total:.0f} s.")
if fails:
    print(f"\nFAILURES ({len(fails)}):")
    for k, v in sorted(fails.items()):
        err = v.get("err")
        if not err:
            # a null err with rows+schema green is a true VALUE mismatch —
            # surface it as such, not as an anonymous tooling failure
            err = ("VALUE MISMATCH: rows+schema match, hash differs"
                   if v.get("rows_match") and v.get("schema_match")
                   else "mismatch (no err recorded)")
        print(f"  {k}: {err}")
print()
print("| Query | rows | spark s | oracle s |")
print("|---|---|---|---|")
for k, v in sorted(art.items()):
    ss = v.get("spark_sec"); os_ = v.get("oracle_sec")
    print(f"| {k} | {v.get('spark_rows')} | "
          f"{'' if ss is None else format(ss, '.1f')} | "
          f"{'' if os_ is None else format(os_, '.1f')} |")

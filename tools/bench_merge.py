#!/usr/bin/env python3
"""Min-merge a fresh BENCH_FULL.json against the committed copy at git
HEAD (the per-round protocol in BENCH_NOTES.md): per-query min, EXCEPT
queries whose PLAN changed this round (passed as args) — those take the
fresh values only, because the old number measured different code. New
queries take fresh values. Metadata (loadavg/sweep_totals/spread) stays
from the fresh run. Writes the merged map in place and prints a diff
summary."""
import json, subprocess, sys

plan_changed = set(sys.argv[1:])
fresh = json.load(open("BENCH_FULL.json"))
head = json.loads(subprocess.check_output(
    ["git", "show", "HEAD:BENCH_FULL.json"]))

merged = dict(fresh)
q = {}
ups, downs, news = [], [], []
for name, v in fresh["queries"].items():
    if name in plan_changed or name not in head["queries"]:
        q[name] = v
        if name not in head["queries"]:
            news.append((name, v))
        continue
    old = head["queries"][name]
    q[name] = min(v, old)
    (ups if v > old else downs).append((name, old, v))
dropped = [n for n in head["queries"] if n not in fresh["queries"]]
merged["queries"] = q
merged["value"] = round(sum(q.values()), 2)
merged["nq"] = len(q)
json.dump(merged, open("BENCH_FULL.json", "w"), indent=None)
print(f"merged total {merged['value']} s over {merged['nq']} queries")
print(f"fresh-faster (took fresh): {len(downs)}; "
      f"fresh-slower (kept HEAD min): {len(ups)}")
print("plan-changed (fresh only):",
      {n: fresh['queries'][n] for n in sorted(plan_changed)
       if n in fresh['queries']})
print("new:", news)
if dropped:
    print("DROPPED from fresh run (investigate):", dropped)

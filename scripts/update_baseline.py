#!/usr/bin/env python3
"""Rewrite BASELINE.md's measured table (and alias appendix) from a
full-suite bench_out.json + bench_aliases.json run.

Usage: python3 scripts/update_baseline.py [round_label]

Replaces the block between '## Measured' and the next '## ' heading's
table rows, keeping the methodology prose intact. The table is
regenerated from bench_out.json (full precision, registry names with
q_ stripped to match the stdout line's `short` naming). The alias
appendix maps the stdout line's 1-4 char codes back to registry names.
"""
import json
import re
import sys

label = sys.argv[1] if len(sys.argv) > 1 else "round 7"

bench = json.loads(open("bench_out.json").read())
aliases = json.loads(open("bench_aliases.json").read())
queries = bench["queries"]
total = bench["value"]

# alias file maps alias -> registry name; invert to name -> alias
by_name = {n: a for a, n in aliases.items()}
def strip(n):
    return n[2:] if n.startswith("q_") else n
rows = "\n".join(
    f"| `{by_name.get(name, '')}` | {strip(name)} | {sec:.2f} |"
    for name, sec in sorted(queries.items(), key=lambda kv: strip(kv[0])))
table = ("| alias | query | sec (sf0.1, local[32]) |\n| --- | --- | --- |\n"
         f"{rows}\n| | **total ({len(queries)} queries)** | **{total:.1f}** |\n")
appendix = ""

src = open("BASELINE.md").read()

# replace the measured table (first alias|query|sec table after '## Measured')
m = re.search(r"(## Measured[^\n]*\n)(.*?)(\| alias \| query \| sec[^\n]*\n\| --- \| --- \| --- \|\n(?:\|[^\n]*\n)*)",
              src, re.S)
if not m:
    sys.exit("measured table not found")
src = src[:m.start(1)] + f"## Measured ({label})\n" + m.group(2) + table + src[m.end(3):]

open("BASELINE.md", "w").write(src)

# machine-readable twin of the measured table: graft.Bench reads it to
# trigger its re-time pass against the RECORDED figure (not only the
# run's own warm figure), so it must move in lockstep with the table
with open("bench_recorded.json", "w") as f:
    f.write("{" + ",".join(f'"{k}":{v}' for k, v in sorted(queries.items()))
            + "}\n")

# bench-history ratchet: per-query list of every recorded figure, in
# recording order with its round label — so cross-round adjudication of
# noisy rows (is 2.1s an outlier or the new normal?) is a lookup, not
# an alias-map reconstruction from old commits
try:
    hist = json.loads(open("bench_history.json").read())
except FileNotFoundError:
    hist = {"labels": [], "queries": {}}
hist["labels"].append(label)
idx = len(hist["labels"]) - 1
for name, sec in queries.items():
    hist["queries"].setdefault(name, {})[str(idx)] = round(sec, 2)
with open("bench_history.json", "w") as f:
    json.dump(hist, f, sort_keys=True)
    f.write("\n")

print(f"BASELINE.md updated: {len(queries)} queries, total {total:.1f}s, "
      f"{len(aliases)} aliases, bench_recorded.json rewritten, "
      f"bench_history.json @ {len(hist['labels'])} recordings")

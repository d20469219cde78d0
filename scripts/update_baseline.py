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

rows = "\n".join(
    f"| {name[2:] if name.startswith('q_') else name} | {sec:.2f} |"
    for name, sec in sorted(queries.items()))
table = (f"| query | sec (sf0.1, local[32]) |\n| --- | --- |\n{rows}\n"
         f"| **total ({len(queries)} queries)** | **{total:.1f}** |\n")

alias_rows = "\n".join(
    f"| `{a}` | {n} |" for a, n in sorted(aliases.items(), key=lambda kv: kv[1]))
appendix = (
    "### Bench-line alias table\n\n"
    "The compacted stdout bench line uses deterministic 1-4 char\n"
    "aliases (`BenchFormat.aliases`) so every query's figure fits the\n"
    "driver's 2000-char window; `bench_out.json` always keeps full\n"
    "names and precision. Alias → registry name:\n\n"
    "| alias | query |\n| --- | --- |\n" + alias_rows + "\n")

src = open("BASELINE.md").read()

# replace the measured table (first '| query |' table after '## Measured')
m = re.search(r"(## Measured[^\n]*\n)(.*?)(\| query \| sec[^\n]*\n\| --- \| --- \|\n(?:\|[^\n]*\n)*)",
              src, re.S)
if not m:
    sys.exit("measured table not found")
src = src[:m.start(1)] + f"## Measured ({label})\n" + m.group(2) + table + src[m.end(3):]

# drop any stale parenthetical about isolated-median rows right after the table
src = re.sub(r"\n\(Five rows from isolated BenchOne medians[^)]*\)\n", "\n", src)

# replace or insert the alias appendix before the next '## ' section
src = re.sub(r"### Bench-line alias table\n\n.*?(?=\n## )", appendix, src, flags=re.S)
if "### Bench-line alias table" not in src:
    nxt = src.index("\n## ", src.index("## Measured") + 1)
    src = src[:nxt] + "\n" + appendix + src[nxt:]

open("BASELINE.md", "w").write(src)
print(f"BASELINE.md updated: {len(queries)} queries, total {total:.1f}s, "
      f"{len(aliases)} aliases")

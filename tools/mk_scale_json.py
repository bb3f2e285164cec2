#!/usr/bin/env python3
"""Assemble SCALE_r{N}.json from a ScaleSmoke sweep log.

Usage: mk_scale_json.py <round> <sweep.log> <out.json> [notes.json]

Parses `name  <sec>s  rows=<n>` block lines and `... SKIPPED at 100x (...)`
skip records (reason text carries the last-measured cost since r17), plus
the plan_audit verdict line. notes.json (optional) supplies {"notes": [...],
"block_notes": {block: note}, "ambient_note": "...", "scope": "..."}.
"""
import json
import re
import sys

rnd, log_path, out_path = sys.argv[1], sys.argv[2], sys.argv[3]
extra = {}
if len(sys.argv) > 4:
    extra = json.load(open(sys.argv[4]))

blocks = {}
order = []
skips = []
audit = None
for line in open(log_path, errors="replace"):
    m = re.match(r"^([a-z0-9_]+)\s+([0-9.]+)s\s+rows=(\d+)\s*$", line)
    if m:
        name, sec, rows = m.group(1), float(m.group(2)), int(m.group(3))
        # a re-timed block later in the log supersedes (r16 convention)
        if name not in blocks:
            order.append(name)
        blocks[name] = {"sec": round(sec, 2), "rows": rows}
        continue
    m = re.match(r"^([a-z0-9_]+)\s+(SKIPPED at 100x \(.*\))\s*$", line)
    if m:
        rec = {"block": m.group(1), "reason": m.group(2)}
        # structured cost provenance (r16 verdict item 6): lift the
        # last-measured timing and its round out of the reason text so
        # the cost that justified the demotion travels with the artifact
        c = re.search(r"(?:last measured|blocked twins) ([0-9.]+)(?:/([0-9.]+))?s[^,]*, r(\d+)",
                      m.group(2))
        if c:
            rec["last_measured_sec"] = float(c.group(1))
            rec["round"] = int(c.group(3))
        elif "never completed" in m.group(2) or "never run" in m.group(2):
            c2 = re.search(r"r(\d+)\)", m.group(2))
            rec["last_measured_sec"] = None
            rec["round"] = int(c2.group(1)) if c2 else None
        skips.append(rec)
        continue
    if line.startswith("plan_audit:"):
        audit = line.strip().split(": ", 1)[1]

for name, note in extra.get("block_notes", {}).items():
    if name in blocks:
        blocks[name]["note"] = note

total = round(sum(b["sec"] for b in blocks.values()), 1)
slowest = sorted(({"block": k, "sec": v["sec"]} for k, v in blocks.items()),
                 key=lambda x: -x["sec"])[:12]
out = {
    "round": int(rnd),
    "multiplier": 100,
    "corpus": "/tmp/graft-sf100x (clone-amplified sf0.1, lineitem 60,000,000 rows)",
    "action": "Consume.rows",
    "driver_mem": "80g",
    "scope": extra.get("scope", "FULL-REGISTRY sweep, one fresh-JVM pass"),
    "ambient_note": extra.get("ambient_note", ""),
    "n_blocks": len(blocks),
    "plan_audit": audit or "NOT RUN IN THIS LOG",
    "declared_skips": skips,
    "total_sec": total,
    "slowest": slowest,
    "blocks": {k: blocks[k] for k in order},
    "notes": extra.get("notes", []),
}
json.dump(out, open(out_path, "w"), indent=1)
print(f"{out_path}: {len(blocks)} blocks, total {total}s, audit: {out['plan_audit']}")

#!/usr/bin/env python3
"""Split `graft.tools.Probe --plan` sbt output into per-query plan files.

Usage: split_plans.py <probe_log> <out_dir> <suffix>
Writes <out_dir>/<query>_<suffix>.txt for every `==== PLAN <query> ====`
section in the log (sbt's `[info] ` prefixes stripped), and prints the
`==== TIME` lines so the caller can record min-of-3 wall seconds.
"""
import os
import re
import sys

log, out_dir, suffix = sys.argv[1], sys.argv[2], sys.argv[3]
os.makedirs(out_dir, exist_ok=True)

lines = []
for raw in open(log, encoding="utf-8", errors="replace"):
    line = raw.rstrip("\n")
    if line.startswith("[info] "):
        line = line[len("[info] "):]
    elif line.startswith("[info]"):
        line = line[len("[info]"):]
    lines.append(line)

cur_name, cur_body = None, []


def flush():
    if cur_name is not None:
        path = os.path.join(out_dir, f"{cur_name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write("\n".join(cur_body).rstrip() + "\n")
        print(f"wrote {path} ({len(cur_body)} lines)")


for line in lines:
    m = re.match(r"==== PLAN (\S+) ====", line)
    if m:
        flush()
        cur_name, cur_body = m.group(1), []
        continue
    if line.startswith("==== TIME"):
        flush()
        cur_name, cur_body = None, []
        print(line)
        continue
    if cur_name is not None:
        cur_body.append(line)
flush()

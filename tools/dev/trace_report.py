#!/usr/bin/env python
"""Summarize a jax.profiler trace against a dumped HLO text: device time by
module and by source site. Usage:
    python tools/dev/trace_report.py <trace.json.gz> <hlo.txt> [topN]
"""

import collections
import gzip
import json
import re
import sys


def main(trace_path, hlo_path, topn=35):
    meta = {}
    for line in open(hlo_path):
        m = re.match(r'\s+%([\w.-]+) = .*?op_name="([^"]+)"', line)
        if m:
            meta[m.group(1)] = m.group(2)
    with gzip.open(trace_path) as f:
        trace = json.load(f)
    events = trace["traceEvents"]
    pids = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"].get("name", "")
    bysite = collections.defaultdict(float)
    bystage = collections.defaultdict(float)
    unk = 0.0
    total = 0.0
    for e in events:
        if (
            e.get("ph") == "X"
            and "dur" in e
            and pids.get(e["pid"], "") == "/device:TPU:0"
        ):
            nm = e.get("name", "")
            if nm.startswith("jit_"):
                continue
            total += e["dur"]
            op = meta.get(nm, "")
            if not op:
                unk += e["dur"]
                continue
            m = re.search(r"PatchmatchNet/([\w.]+?)/", op)
            stage = m.group(1) if m else op.split("/")[-1]
            bystage[stage] += e["dur"]
            site = re.sub(r"jit\(forward\)/PatchmatchNet/", "", op)
            site = re.sub(r"jit\(([\w_]+)\)", r"\1", site)
            bysite[site] += e["dur"]
    print(f"total device: {total/1e3:.1f} ms")
    print("--- by top module ---")
    for k, v in sorted(bystage.items(), key=lambda kv: -kv[1]):
        if v > 500:
            print(f"{v/1e3:8.1f} ms  {k}")
    print(f"{unk/1e3:8.1f} ms  (no metadata)")
    print(f"--- top {topn} sites ---")
    for k, v in sorted(bysite.items(), key=lambda kv: -kv[1])[:topn]:
        print(f"{v/1e3:8.1f} ms  {k[:110]}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3 else 35)

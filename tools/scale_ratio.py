#!/usr/bin/env python3
"""Scale-curve ratio report: compare two bench detail lines
(`{"detail":"per_query","queries":{...}}`) from different scale factors
and print queries ordered by ratio, flagging super-linear ones.

Usage: python3 tools/scale_ratio.py <base_detail.jsonl> <scaled_detail.jsonl> [scale=10] [flag=10]
"""
import json
import sys


def load(path):
    out = {}
    for line in open(path):
        line = line.strip()
        if not line.startswith("{"):
            continue
        d = json.loads(line)
        if d.get("detail") == "per_query":
            out.update(d["queries"])
    return out


base = load(sys.argv[1])
scaled = load(sys.argv[2])
scale = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
flag = float(sys.argv[4]) if len(sys.argv) > 4 else scale

rows = []
for k, v in scaled.items():
    if v < 0:
        rows.append((float("inf"), k, base.get(k), v))
    elif k in base and base[k] > 0:
        rows.append((v / base[k], k, base[k], v))
rows.sort(reverse=True)

n_super = 0
for r, k, b, v in rows:
    mark = ""
    if r > flag:
        mark = "  <-- SUPERLINEAR" if v >= 2.0 else "  (over flag, sub-2s absolute)"
        n_super += 1
    bstr = f"{b:8.2f}" if b is not None else "    ?   "
    vstr = "FAILED" if v < 0 else f"{v:8.2f}"
    print(f"{r:8.1f}x  {bstr} -> {vstr}  {k}{mark}")
print(f"\n{len(rows)} compared, {n_super} over the {flag:.0f}x flag at {scale:.0f}x data")

#!/usr/bin/env python3
"""Regenerate src/main/scala/graft/BenchBaseline.scala from recent bench
artifacts (BENCH_r*.json driver captures and/or BENCHLOG.md machine
lines).

Per query the baseline is the MIN across every "name":seconds pair found
in the inputs — the bench VM shows sporadic multi-second stalls
(BENCHLOG.md), so any single run's number may be inflated; the min
across runs is the best available estimate of the true engine time.
Bench.scala uses the baseline only as a stall detector (rerun when
min-of-2 >> baseline), never as a reported number.

Usage: python3 tools/gen_bench_baseline.py BENCH_r12.json BENCH_r13.json > \
         src/main/scala/graft/BenchBaseline.scala
"""
import re
import sys

META = {"n", "rc", "cpus", "sf", "value", "failed", "n_queries",
        "total_first_pass", "load_guard_tripped"}
out = {}
for path in sys.argv[1:]:
    text = open(path).read()
    # accepts bench JSON ("name":1.23), BENCHLOG machine lines, and the
    # current BenchBaseline.scala itself ("name" -> 1.23) so a re-seed
    # can take the min of the old baseline and a fresh full detail line
    for m in re.finditer(r'"([a-z][a-z0-9_]*)"\s*(?::|->)\s*([0-9]+\.[0-9]+)', text):
        k, v = m.group(1), float(m.group(2))
        if k in META or v < 0:
            continue
        if k not in out or v < out[k]:
            out[k] = v

lines = [
    "package graft",
    "",
    "/** Per-query wall-second baselines for the bench stall detector:",
    "  * min across recent rounds' bench artifacts (stalls only ever",
    "  * inflate a run's number, so the cross-run min approximates the",
    "  * true engine time). Regenerate with tools/gen_bench_baseline.py",
    "  * after each round. Consumed ONLY to decide whether min-of-2",
    "  * looks stall-polluted and deserves extra runs — never reported",
    "  * as a result. */",
    "object BenchBaseline {",
    "  val seconds: Map[String, Double] = Map(",
]
items = sorted(out.items())
for i, (k, v) in enumerate(items):
    sep = "," if i < len(items) - 1 else ""
    lines.append(f'    "{k}" -> {v:.3f}{sep}')
lines.append("  )")
lines.append("}")
print("\n".join(lines))

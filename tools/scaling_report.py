#!/usr/bin/env python3
"""Per-entry scaling exponents from two graft.Bench artifacts at different
scale factors (default: sf0.1 vs sf1, a 10x data-volume step).

exponent = log(t_hi / t_lo) / log(sf_ratio) -- ~1.0 is linear, ~0 is
data-size-independent (fixed probe sets, dimension tables), >1.3 flags a
super-linear leg worth a plan audit. Entries faster than ~0.3 s at the low
SF are mostly JVM/planning floor, so their exponents are noise; the report
orders by exponent but also prints absolute times so the floor cases are
obvious.

Usage: python3 tools/scaling_report.py /tmp/bench_sf01.json /tmp/bench_sf1.json [ratio]
"""
import json
import math
import sys


def main(lo_path, hi_path, ratio=10.0):
    lo = json.load(open(lo_path))["queries"]
    hi = json.load(open(hi_path))["queries"]
    common = sorted(set(lo) & set(hi))
    rows = []
    for q in common:
        if lo[q] <= 0 or hi[q] <= 0:
            continue
        exp = math.log(hi[q] / lo[q]) / math.log(ratio)
        rows.append((exp, q, lo[q], hi[q]))
    rows.sort(reverse=True)
    print(f"{'exponent':>8}  {'t_lo':>8}  {'t_hi':>8}  entry")
    for exp, q, tlo, thi in rows:
        flag = " <== super-linear" if exp > 1.3 and tlo >= 0.3 else ""
        print(f"{exp:8.2f}  {tlo:8.3f}  {thi:8.3f}  {q}{flag}")
    tot_lo = sum(lo[q] for q in common)
    tot_hi = sum(hi[q] for q in common)
    print(f"\ntotals: {tot_lo:.1f}s -> {tot_hi:.1f}s "
          f"(overall exponent {math.log(tot_hi / tot_lo) / math.log(ratio):.2f})")


if __name__ == "__main__":
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    main(sys.argv[1], sys.argv[2], ratio)

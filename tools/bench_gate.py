#!/usr/bin/env python3
"""Per-entry 2x regression gate against the honest baseline.

Usage: bench_gate.py <bench_artifact.json> [more_artifacts.json ...]
       [--baseline path]

Compares per-entry times against BASELINE.json (the committed per-entry
honest anchor: r12 methodology — toRdd materialization, warmup sweep,
best-of-2/3, per-entry MIN across the r11+r12 sf0.1 artifacts). When
several artifacts are given, the per-entry MIN across them is compared:
this VM swings ~4x under background load, so a single run flags load
noise, not regressions — rerun the flagged subset and pass both files.

An entry FAILS when

    min_over_artifacts(t) > max(ratio_cap * t_anchor, abs_floor)

with ratio_cap = 2.0 (the BASELINE.md contract) and abs_floor = 1.0 s
(sub-second entries swing on scheduler jitter; a 0.05 -> 0.15 s move is
not a regression). Entries missing from the baseline are reported NEW —
commit a refreshed BASELINE.json to anchor them. Exit 0 = all anchored
entries inside the contract.
"""
import json
import sys


def main():
    args = [a for a in sys.argv[1:]]
    base_path = __file__.rsplit("/", 2)[0] + "/BASELINE.json"
    if "--baseline" in args:
        i = args.index("--baseline")
        base_path = args[i + 1]
        del args[i:i + 2]
    if not args:
        print(__doc__)
        return 2
    arts = []
    for p in args:
        with open(p) as f:
            d = json.load(f)
        arts.append(d.get("queries", d))
    with open(base_path) as f:
        base = json.load(f)
    anchor = base.get("queries", base)
    ratio_cap = base.get("gate", {}).get("ratio_cap", 2.0)
    abs_floor = base.get("gate", {}).get("abs_floor_sec", 1.0)

    names = sorted(set().union(*[set(a) for a in arts]))
    fails, news = [], []
    for name in names:
        t = min(a[name] for a in arts if name in a)
        if name not in anchor:
            news.append((name, t))
            continue
        t0 = anchor[name]
        if t > max(ratio_cap * t0, abs_floor):
            fails.append((name, t, t0, t / t0 if t0 > 0 else float("inf")))
    for name, t, t0, r in fails:
        print(f"FAIL {name:40s} {t:8.3f}s vs anchor {t0:8.3f}s ({r:.2f}x)")
    for name, t in news:
        print(f"NEW  {name:40s} {t:8.3f}s (no anchor — refresh BASELINE.json)")
    n_ok = len(names) - len(fails) - len(news)
    print(f"{n_ok} ok, {len(fails)} fail, {len(news)} new over "
          f"{len(arts)} artifact(s) (cap {ratio_cap}x, floor {abs_floor}s) "
          f"vs {base_path}")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())

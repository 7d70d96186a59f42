#!/usr/bin/env python3
"""Calibration-normalized watchline check (VERDICT r15 #4).

Usage: check_watchlines.py BENCH_FULL.json [--watchlines tools/watchlines.json]

Reads a Bench full-table JSON, divides each watchlined query's seconds by
the run's calibration MEAN (the host-rate probe), and compares against
tools/watchlines.json. Exit 1 on any breach, with the per-query table
printed either way. Contended runs (calibration max > 3x mean) are judged
anyway but flagged -- their minima are still lower bounds, and a breach on
a contended run should be re-measured, not shipped.
"""
import json
import sys


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    wl_path = "tools/watchlines.json"
    for a in sys.argv[1:]:
        if a.startswith("--watchlines="):
            wl_path = a.split("=", 1)[1]
    if len(args) != 1:
        print(__doc__)
        return 2
    bench = json.load(open(args[0]))
    watch = json.load(open(wl_path))["watchlines"]
    cal = bench["calibration"]["mean"]
    qs = bench["queries"]
    breaches = []
    print(f"calibration mean {cal:.3f}s"
          + ("  [CONTENDED RUN]" if bench.get("contended") else ""))
    for name, limit in sorted(watch.items()):
        if name not in qs:
            print(f"  {name:<26} MISSING from bench table")
            breaches.append((name, None, limit))
            continue
        norm = qs[name] / cal
        flag = "BREACH" if norm > limit else "ok"
        print(f"  {name:<26} {qs[name]:7.2f}s  norm {norm:6.1f}  "
              f"limit {limit:6.1f}  {flag}")
        if norm > limit:
            breaches.append((name, norm, limit))
    if breaches:
        print(f"WATCHLINE BREACHES: {len(breaches)} -- adjudicate "
              "(warm-solo + stash A/B) or fix before close; an accepted "
              "adjudication updates tools/watchlines.json with its why.")
        return 1
    print("all watchlines green (calibration-normalized)")
    return 0


if __name__ == "__main__":
    sys.exit(main())

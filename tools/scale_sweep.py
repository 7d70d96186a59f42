#!/usr/bin/env python3
"""Scaling-exponent report from two time_queries.sh sweeps (VERDICT r10 #7).

Usage:
  tools/time_queries.sh <gates> /root/testdata/sf0.1 2 > small.txt
  python3 tools/make_sf1.py                     # builds tmp/sf1 (10x)
  tools/time_queries.sh <gates> tmp/sf1 2 > large.txt
  python3 tools/scale_sweep.py small.txt large.txt [scale_factor=10]

For each gate the LAST pass (warm) is compared: exponent = log(t_l/t_s)
/ log(scale). 1.0 = perfectly linear in data volume; <1 = dominated by
fixed per-job cost at this scale (fine); >1 sub-linear scaling LOST —
the sweep flags anything >1.3 (super-linear by more than ~2x at 10x) as
a scale risk to investigate.
"""
import math, re, sys

USE_MIN = "--min" in sys.argv
ARGS = [a for a in sys.argv[1:] if not a.startswith("--")]

def parse(path):
    out = {}
    for line in open(path):
        m = re.match(r"TIMING (pass\d+) (\S+) ([0-9.]+) s", line.strip())
        if m:
            out.setdefault(m.group(2), []).append(float(m.group(3)))
    # default: last pass = warm. --min: minimum over passes — the
    # burst-contention-robust estimator (the Bench discipline) for hosts
    # where a transient stall can poison one pass's window (r16: a ~60 s
    # host stall landed mid-pass2 and inflated six consecutive gates 5-10x
    # while neighbors stayed flat).
    return {k: (min(v) if USE_MIN else v[-1]) for k, v in out.items()}

small = parse(ARGS[0])
large = parse(ARGS[1])
scale = float(ARGS[2]) if len(ARGS) > 2 else 10.0

rows, flagged = [], []
for q in small:
    if q not in large:
        continue
    ratio = large[q] / small[q]
    exp = math.log(max(ratio, 1e-9)) / math.log(scale)
    rows.append((exp, ratio, small[q], large[q], q))
rows.sort(reverse=True)
print(f"{'exponent':>8}  {'ratio':>6}  {'small_s':>8}  {'large_s':>8}  gate")
for exp, ratio, s, l, q in rows:
    mark = "  <-- SCALE RISK" if exp > 1.3 else ""
    if mark:
        flagged.append(q)
    print(f"{exp:8.2f}  {ratio:6.1f}  {s:8.2f}  {l:8.2f}  {q}{mark}")
print(f"\n{len(rows)} gates; flagged >1.3: {flagged if flagged else 'none'}")
sys.exit(1 if flagged else 0)

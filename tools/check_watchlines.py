#!/usr/bin/env python3
"""Calibration-normalized watchline check (VERDICT r15 #4, r16 #1).

Usage: check_watchlines.py BENCH_FULL.json [--watchlines tools/watchlines.json]

Reads a Bench full-table JSON, divides each watchlined query's seconds by
the run's calibration MEAN (the host-rate probe), and compares against
tools/watchlines.json. Exit 1 on any breach, with the per-query table
printed either way.

CONTENDED RUNS ARE REFUSED (exit 3), not judged: VERDICT r16 #1 — a
contended run's inflated calibration mean shrinks every normalized value,
so "judging anyway" passes exactly the regressions this check exists to
catch (the r16 close showed all-green at cal 0.373 while the clean driver
run at cal 0.287 breached 4 of 9 lines). Bench's own composite refuses
comparison on contended runs (total_kind=contended_do_not_compare); this
check follows the same rule. Re-measure on a quiet host instead.
A run is refused when Bench marked it contended (probe max > 3x mean) OR
when its calibration mean sits above CLEAN_CAL_CEILING — the r12-r16
clean-close band is 0.287-0.304, so a mean past 0.32 is a contended host
even if no single probe spiked 3x.
"""
import json
import sys

CLEAN_CAL_CEILING = 0.32


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
    # r17: full-subscription drift — a neighbor stealing CORES leaves the
    # single-thread probe flat while every 32-way stage runs slow (the r17
    # close breached 7 lines at a "clean" calMean 0.288 this way). Bench
    # emits 32-thread probes since r17; older files lack the field.
    # r18: gate on the MEDIAN 32-thread probe when the file carries it —
    # the max-of-32 used through r17 has a one-sided GC/scheduling tail
    # that reads up to 1.33x inside a clean working Spark JVM (measured),
    # so max-based rules false-refused clean runs; the median holds
    # <=1.04x clean and >=1.47x under a 12-core-stealing neighbor. Files
    # without mt_med fall back to the old max-based rules.
    cmin = bench["calibration"]["min"]
    mt_meds = bench["calibration"].get("mt_med")
    if mt_meds:
        mt_bad = sum(mt_meds) / len(mt_meds) > 1.4 * cmin
        mt_epoch = any(p > 1.35 * cmin for p in mt_meds)
    else:
        mt_mean = bench["calibration"].get("mt_mean")
        mt_bad = mt_mean is not None and mt_mean > 1.6 * cmin
        # VERDICT r17 #5: a single elevated probe the mean-gate misses
        # means ONE pass may have run inside an epoch — a HALF-SAMPLE
        # composite (each query got one clean measurement), refused by
        # derive_watchlines.py as a threshold input.
        mt_probes = bench["calibration"].get("mt", [])
        mt_epoch = (bool(bench["calibration"].get("mt_epoch"))
                    or any(p > 1.8 * cmin for p in mt_probes))
    contended = (bool(bench.get("contended")) or cal > CLEAN_CAL_CEILING
                 or mt_bad)
    qs = bench["queries"]
    breaches = []
    print(f"calibration mean {cal:.3f}s"
          + ("  [CONTENDED RUN]" if contended else ""))
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
    if contended:
        print("REFUSED: contended calibration (bench contended flag or "
              f"mean > {CLEAN_CAL_CEILING}) — normalizing by an inflated "
              "calibration launders regressions. Re-run Bench on a quiet "
              "host; this run proves nothing either way.")
        return 3
    if breaches:
        print(f"WATCHLINE BREACHES: {len(breaches)} -- adjudicate "
              "(warm-solo + stash A/B) or fix before close; an accepted "
              "adjudication updates tools/watchlines.json with its why.")
        return 1
    if mt_epoch:
        print("all watchlines green, BUT an mt probe shows one pass ran "
              "inside a full-subscription epoch (HALF-SAMPLE). Usable for "
              "the close gate; derive_watchlines.py will only take its "
              "clean-bracketed pass (if per-pass values are recorded).")
        return 0
    print("all watchlines green (calibration-normalized, clean run)")
    return 0


if __name__ == "__main__":
    sys.exit(main())

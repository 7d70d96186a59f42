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

# IO-axis certification (VERDICT r18 lead item): checkpoint/artifact-writing
# gates pay n_fsync x host fsync latency that NO CPU probe sees. Bench r19+
# brackets each such gate with a 32-file fsync probe (median ms) per pass.
# A bracket whose worse side is <= IO_CLEAN_MS certifies the window:
# measured on this host, brackets of 0.38-0.94 ms accompany q_stream_admit
# at 3.5-4.4 s while >= 2 ms accompanies 4.8-5.7 s, and idle-host drift
# reaches 17 ms. Certified gates are judged against the TIGHT
# io_watchlines; uncertified ones fall back to the wide legacy lines
# (which carry the 2.5-3.7x IO slack with a recorded why).
IO_CLEAN_MS = 2.0


def io_certified(bench, name):
    """(certified, bracket_ms) for the pass that contributed the recorded
    minimum, or (False, None) when the run predates io_brackets.

    Certification requires the contributing pass to be clean on BOTH axes:
    a clean io bracket AND mt-median cleanliness (pass_clean). The second
    condition is not redundant — the first half-sample run measured
    (1786925546) recorded q_remember_show_seq's minimum from its CPU-dirty
    pass 1 under a perfectly clean io bracket; judging that 11.2 s against
    a tight line derived from clean passes would breach on CPU weather the
    tight lines never priced in."""
    br = bench.get("io_brackets", {}).get(name)
    if not br:
        return False, None
    src = bench.get("pass_src", {}).get(name)
    if not isinstance(src, int) or src < 1 or len(br) < src:
        return False, None
    b = br[src - 1]
    pc = bench.get("pass_clean")
    cpu_clean = bool(pc[src - 1]) if pc and len(pc) >= src else False
    if not cpu_clean:
        return "cpu-dirty pass", b
    return True if max(b) <= IO_CLEAN_MS else "io-degraded", b


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
    wl_doc = json.load(open(wl_path))
    watch = wl_doc["watchlines"]
    io_watch = wl_doc.get("io_watchlines", {})
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
    if bench.get("n_passes"):
        # r20+ multi-pass Bench: pass-level gating (mt brackets + in-pass
        # probe spikes) already decided which passes produced the composite,
        # and `calibration.mean` is the CLEAN-pass probe mean, so run-wide
        # mt heuristics would re-judge probes from passes that were replaced.
        # Two clean passes = full-sample composite (no half-sample caveat);
        # fewer = Bench already set contended.
        mt_bad = False
        mt_epoch = len(bench.get("clean_passes", [])) < 2
    elif mt_meds:
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
    n_io_certified = 0
    for name, limit in sorted(watch.items()):
        if name not in qs:
            print(f"  {name:<26} MISSING from bench table")
            breaches.append((name, None, limit))
            continue
        if qs[name] < 0:
            # ADVICE r18: the -1 failed-both-passes sentinel divided by cal
            # is negative and used to print 'ok' — a regression that makes
            # a gated query CRASH must read as a breach, not a green line.
            print(f"  {name:<26} FAILED both passes (-1 sentinel)  BREACH")
            breaches.append((name, None, limit))
            continue
        norm = qs[name] / cal
        flag = "BREACH" if norm > limit else "ok"
        certified, bracket = io_certified(bench, name)
        io_note = ""
        if name in io_watch:
            if certified is True:
                n_io_certified += 1
                tight = io_watch[name]
                io_note = (f"  [io {bracket[0]:.2f}/{bracket[1]:.2f}ms "
                           f"certified, tight {tight:.1f}]")
                if norm > tight:
                    flag = "IO-TIGHT BREACH"
                    breaches.append((name, norm, tight))
            elif bracket is not None:
                io_note = (f"  [io {bracket[0]:.2f}/{bracket[1]:.2f}ms "
                           f"{certified}: wide line only]")
            else:
                io_note = "  [no io bracket: wide line only]"
        print(f"  {name:<26} {qs[name]:7.2f}s  norm {norm:6.1f}  "
              f"limit {limit:6.1f}  {flag}{io_note}")
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
        # ADVICE r18 wording fix: derivation accepts a file only when its
        # WARM pass (pass 2) is clean-bracketed — pass-1 values are never
        # consumed as threshold inputs (cold-pass numbers run systematically
        # higher and would loosen lines; pass1_queries is audit-only).
        print("all watchlines green, BUT an mt probe shows one pass ran "
              "inside a full-subscription epoch (HALF-SAMPLE). Usable for "
              "the close gate; derive_watchlines.py will only take its "
              "clean warm pass (pass 2) and refuses the file if that is "
              "the dirty one.")
        return 0
    if io_watch:
        print(f"all watchlines green ({n_io_certified}/{len(io_watch)} io "
              "gates bracket-certified against tight lines)")
        return 0
    print("all watchlines green (calibration-normalized, clean run)")
    return 0


if __name__ == "__main__":
    sys.exit(main())

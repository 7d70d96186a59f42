#!/usr/bin/env python3
"""Re-derive tools/watchlines.json from clean HONEST-REGIME bench runs.

Usage: derive_watchlines.py BENCH_FULL_a.json [BENCH_FULL_b.json ...]
       [--headroom=1.15] [--out=tools/watchlines.json]

VERDICT r16 #2: the r15-derived thresholds encoded cross-query cache
reuse that Projections.release() (ff10e04) removed — pre-r16 bench
history flattered projection-sharing families ~1.3-2x, so those
thresholds are retired and watchlines are derived from the honest
regime only. This script takes the per-query MAX of
seconds / calibration_mean over the given clean runs, multiplies by the
headroom (default 1.15 — covers the ~10% run-to-run drift two clean r16
driver runs showed at matched calibration), and writes the watchlines
file with the derivation recorded. CONTENDED runs are refused as inputs
for the same reason check_watchlines.py refuses to judge them.
"""
import json
import sys

WATCHED = [
    "q_stream_admit_near",
    "q_stream_admit",
    "q_sim_pq_recall",
    "q_remember_show_seq",
    "q_dedup_incr_update",
    "q_graph_pagerank",
    "q_graph_triangles",
    "q_dedup_minhash_eval",
    "q_dedup_editdist",
]

CLEAN_CAL_CEILING = 0.32  # keep in sync with check_watchlines.py

# The four watched checkpoint/artifact-writing gates: their wide lines
# carry 2.5-3.7x slack because host fsync latency swings them 2-3x with no
# CPU-probe signature (VERDICT r18). Bench r19+ brackets each with a
# 32-file fsync probe (median ms, per pass); a bracket <= IO_CLEAN_MS on
# its worse side certifies the window, and TIGHT io_watchlines are derived
# from certified samples only. check_watchlines.py applies a tight line
# only when the run under judgment is itself bracket-certified for that
# gate, so the wide line still guards degraded-IO runs.
IO_WATCHED = [
    "q_stream_admit",
    "q_stream_admit_near",
    "q_remember_show_seq",
    "q_dedup_incr_update",
]
IO_CLEAN_MS = 2.0  # keep in sync with check_watchlines.py

# Run-level IO-weather ceiling for WIDE-line samples (r19, learned from
# BENCH_FULL_1786925546): that run's CPU-clean warm pass ran under severe
# host IO degradation (run-level fsync probes 13-21 ms) and its
# weather-inflated values would have ballooned the wide lines
# (q_remember_show_seq 57.4 -> 141.6, q_dedup_editdist 10.6 -> 14.5) —
# baking the exact weather variance the io instrument measures into the
# always-on guard. A per-gate sample enters wide-line derivation only when
# the run-level probes bracketing its contributing pass are both under
# this ceiling (looser than IO_CLEAN_MS: wide lines price MODERATE
# weather, as their history always has; tight lines price none). Files
# predating io probes are grandfathered — their weather is unknown but
# their values built the current lines.
RUN_IO_CEILING_MS = 5.0


def main() -> int:
    files = [a for a in sys.argv[1:] if not a.startswith("--")]
    headroom = 1.15
    out = "tools/watchlines.json"
    for a in sys.argv[1:]:
        if a.startswith("--headroom="):
            headroom = float(a.split("=", 1)[1])
        if a.startswith("--out="):
            out = a.split("=", 1)[1]
    if not files:
        print(__doc__)
        return 2
    norms = {q: [] for q in WATCHED}
    io_norms = {q: [] for q in IO_WATCHED}
    used = []
    for f in files:
        d = json.load(open(f))
        cal = d["calibration"]["mean"]
        if d.get("contended") or cal > CLEAN_CAL_CEILING:
            print(f"REFUSED input {f}: contended (cal mean {cal})")
            return 1
        # VERDICT r17 #1/#5: thresholds come from mt-probe-VERIFIED clean
        # measurements only. A file without MEDIAN 32-thread probes
        # predates the reliable drift detector (the widened r17 envelope
        # came from a run with no probes at all, and the r17 max-of-32
        # probe false-fires on clean runs from its GC tail — see
        # check_watchlines.py). The three probes bracket the two passes,
        # so cleanliness is judged PER PASS (r18: the host throws a
        # transient epoch most runs, so fully-clean runs are rare while
        # clean passes are common): a file contributes iff its warm pass
        # (pass 2) is clean-bracketed — per-query min(p1, p2) when both
        # passes are clean (the historical statistic), else the pass-2
        # value alone (the min usually comes from the warm pass anyway).
        mt_med = d["calibration"].get("mt_med", [])
        if not mt_med:
            print(f"REFUSED input {f}: no mt_med probes (pre-r18 Bench; "
                  "drift epochs not reliably measurable)")
            return 1
        if d.get("n_passes"):
            # r20+ multi-pass Bench: the recorded minima already come from
            # probe-certified clean passes only (>=2 of them, else Bench set
            # contended and we refused above), and calibration.mean is the
            # clean-pass probe mean. Weather-gate each sample by the
            # run-level io probes bracketing its contributing pass.
            io_run = d["calibration"].get("io_med_ms", [])
            n_dropped = 0
            for q in WATCHED:
                if q not in d["queries"]:
                    print(f"REFUSED input {f}: {q} missing")
                    return 1
                val = d["queries"][q]
                if val < 0:
                    print(f"REFUSED input {f}: {q} failed in every clean "
                          "pass")
                    return 1
                src = d.get("pass_src", {}).get(q, 0)
                ok = (not io_run or src < 1 or len(io_run) <= src
                      or max(io_run[src - 1], io_run[src])
                      <= RUN_IO_CEILING_MS)
                if ok:
                    norms[q].append(val / cal)
                else:
                    n_dropped += 1
                if q in IO_WATCHED:
                    br = d.get("io_brackets", {}).get(q)
                    if br and 1 <= src <= len(br) \
                            and max(br[src - 1]) <= IO_CLEAN_MS:
                        io_norms[q].append(val / cal)
            used.append(f.split("/")[-1]
                        + (f" ({d['n_passes']} passes, clean "
                           f"{d.get('clean_passes')})"
                           if d["n_passes"] > 2 else "")
                        + ("" if not n_dropped else
                           f" ({n_dropped} wide samples dropped: io "
                           "weather)"))
            continue
        clean = d.get("pass_clean")
        if clean is None:
            clean = [mt_med[0] <= 1.35 * d["calibration"]["min"]
                     and mt_med[1] <= 1.35 * d["calibration"]["min"],
                     mt_med[1] <= 1.35 * d["calibration"]["min"]
                     and mt_med[2] <= 1.35 * d["calibration"]["min"]]
        if not clean[1]:
            print(f"REFUSED input {f}: warm pass not clean-bracketed "
                  f"(mt_med {mt_med}, 1-thread min "
                  f"{d['calibration']['min']})")
            return 1
        both = all(clean)
        p2 = d.get("pass2_queries")
        if p2 is None and not both:
            print(f"REFUSED input {f}: pass 1 dirty and no per-pass "
                  "values recorded")
            return 1
        # run-level io weather per pass: probes [start, mid, end] bracket
        # pass 1 with (start, mid) and pass 2 with (mid, end). None = file
        # predates io probes (weather unknown, grandfathered for wide).
        io_run = d["calibration"].get("io_med_ms")
        def pass_weather_ok(src):
            if not io_run or len(io_run) < 3:
                return True
            pair = io_run[:2] if src == 1 else io_run[1:3]
            return max(pair) <= RUN_IO_CEILING_MS
        n_weather_dropped = 0
        for q in WATCHED:
            if q not in d["queries"]:
                print(f"REFUSED input {f}: {q} missing")
                return 1
            val = d["queries"][q] if both else p2[q]
            if val < 0:  # failed-query sentinel (-1) must not shrink lines
                print(f"REFUSED input {f}: {q} failed in the contributing "
                      "pass")
                return 1
            src = 2 if not both else d.get("pass_src", {}).get(q, 2)
            if pass_weather_ok(src):
                norms[q].append(val / cal)
            else:
                n_weather_dropped += 1
            # IO-certified samples for the tight lines: the PER-GATE
            # bracket around the pass that contributed this value must be
            # clean (the axis moves fast — a gate can hit a clean
            # sub-window inside an otherwise degraded pass, and that
            # sample is honest). Files predating io_brackets simply
            # contribute no tight samples.
            if q in IO_WATCHED:
                br = d.get("io_brackets", {}).get(q)
                if br and src in (1, 2) and len(br) >= src \
                        and max(br[src - 1]) <= IO_CLEAN_MS:
                    io_norms[q].append(val / cal)
        used.append(f.split("/")[-1]
                    + ("" if both else " (pass2-only; pass1 in epoch)")
                    + ("" if not n_weather_dropped else
                       f" ({n_weather_dropped} wide samples dropped: "
                       "io weather)"))
    empty = [q for q, v in norms.items() if not v]
    if empty:
        print(f"REFUSED: no weather-acceptable wide samples at all for "
              f"{empty} — add more clean runs")
        return 1
    lines = {q: round(max(v) * headroom, 1) for q, v in norms.items()}
    io_lines = {q: round(max(v) * headroom, 1)
                for q, v in io_norms.items() if v}
    doc = {
        "_unit": "query_seconds / calibration_mean_seconds (host-rate-normalized)",
        "_why": (
            "VERDICT r16 #2: derived from HONEST-REGIME clean closes only "
            "(Projections.release() in every harness; pre-r16 numbers were "
            "flattered by cross-query cache reuse and are retired). "
            f"Threshold = max normalized value over the inputs x {headroom} "
            "headroom. A breach means genuinely new territory -> adjudicate "
            "(warm-solo + stash A/B) or fix before close; an accepted "
            "adjudication re-runs this script with the adjudicated run added."
        ),
        "_derived_from": used,
        "_retro_check": "python3 tools/check_watchlines.py bench/BENCH_FULL_<stamp>.json",
        "watchlines": lines,
        "_io_why": (
            "Tight lines for the checkpoint/artifact-writing gates, derived "
            "ONLY from samples whose contributing pass carries a clean "
            f"fsync-probe bracket (both sides <= {IO_CLEAN_MS} ms median; "
            "Bench io_brackets, r19). check_watchlines.py enforces a tight "
            "line only when the judged run is itself bracket-certified for "
            "that gate; degraded-IO runs stay under the wide line above, "
            "whose 2.5-3.7x slack is the measured IO swing, not drift."
        ),
        "_io_samples": {q: len(v) for q, v in io_norms.items()},
        "io_watchlines": io_lines,
    }
    with open(out, "w") as fh:
        json.dump(doc, fh, indent=2)
        fh.write("\n")
    for q in WATCHED:
        print(f"  {q:<26} norms {['%.1f' % n for n in norms[q]]} -> limit {lines[q]}")
    for q in IO_WATCHED:
        tag = (f"-> tight {io_lines[q]}" if q in io_lines
               else "-> no certified samples (wide line only)")
        print(f"  io {q:<23} certified norms "
              f"{['%.1f' % n for n in io_norms[q]]} {tag}")
    print(f"wrote {out} from {len(used)} clean honest runs")
    return 0


if __name__ == "__main__":
    sys.exit(main())

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
    used = []
    for f in files:
        d = json.load(open(f))
        cal = d["calibration"]["mean"]
        if d.get("contended") or cal > CLEAN_CAL_CEILING:
            print(f"REFUSED input {f}: contended (cal mean {cal})")
            return 1
        # VERDICT r17 #1/#5: thresholds come from mt-probe-VERIFIED clean
        # runs only. A file without MEDIAN 32-thread probes predates the
        # reliable drift detector (the widened r17 envelope came from a
        # run with no probes at all, and the r17 max-of-32 probe
        # false-fires on clean runs from its GC tail — see
        # check_watchlines.py); a file with any single median probe past
        # 1.35x the 1-thread min had one pass inside an epoch, so its
        # minima are a half-sample.
        mt_med = d["calibration"].get("mt_med", [])
        if not mt_med:
            print(f"REFUSED input {f}: no mt_med probes (pre-r18 Bench; "
                  "drift epochs not reliably measurable)")
            return 1
        if any(p > 1.35 * d["calibration"]["min"] for p in mt_med):
            print(f"REFUSED input {f}: mt epoch (median probe max "
                  f"{max(mt_med)} > 1.35x 1-thread min "
                  f"{d['calibration']['min']}) — half-sample minima")
            return 1
        used.append(f.split("/")[-1])
        for q in WATCHED:
            if q not in d["queries"]:
                print(f"REFUSED input {f}: {q} missing")
                return 1
            norms[q].append(d["queries"][q] / cal)
    lines = {q: round(max(v) * headroom, 1) for q, v in norms.items()}
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
    }
    with open(out, "w") as fh:
        json.dump(doc, fh, indent=2)
        fh.write("\n")
    for q in WATCHED:
        print(f"  {q:<26} norms {['%.1f' % n for n in norms[q]]} -> limit {lines[q]}")
    print(f"wrote {out} from {len(used)} clean honest runs")
    return 0


if __name__ == "__main__":
    sys.exit(main())

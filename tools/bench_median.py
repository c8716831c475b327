"""Median-of-3 committed bench snapshot (round-9 verdict item 2).

Six identical-code full-bench runs in one day spanned 120.9–138.9 s
(±7 %) with uncorrelated per-query movers, so a SINGLE committed
sample cannot distinguish a real ~0.5 s regression from host noise —
two rounds of mover postmortems all resolved to the band. This tool
runs ``bench.py`` N times (default 3) in fresh processes (each run
gets its own JVM — session-state accumulation was the
`boilerplate_spans` false flag), collects each run's BENCH_DETAIL,
and writes the merged snapshot: per-query MEDIAN plus min/max spread,
so future mover triage compares against measured spread instead of a
point sample.

The merged file keeps bench.py's driver-facing shape (metric/value/
queries/...) with the median as the headline numbers, adding
``queries_spread`` / ``streaming_queries_spread`` ([min, max] per
query), per-run totals and calibs, and ``n_runs``.

Run:  python tools/bench_median.py [n_runs]   (~8 min at sf0.1 for 3)
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DETAIL = os.path.join(REPO, "BENCH_DETAIL.json")
# the round driver's own end-of-round bench run OVERWRITES
# BENCH_DETAIL.json with a single-run snapshot (observed in every
# round-N driver commit), so the median merge is ALSO written to a
# file the driver never touches — the durable committed evidence
MEDIAN = os.path.join(REPO, "BENCH_MEDIAN.json")


def one_run(i: int) -> dict:
    print(f"-- bench run {i} --", flush=True)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        cwd=REPO,
        capture_output=True,
        text=True,
    )
    if r.returncode != 0:
        sys.stderr.write(r.stdout[-2000:] + r.stderr[-2000:])
        raise SystemExit(f"bench run {i} failed rc={r.returncode}")
    with open(DETAIL) as fh:
        return json.load(fh)


def merge(runs: list[dict]) -> dict:
    def med_spread(key: str) -> tuple[dict, dict]:
        # union across runs, not runs[0]'s keys: bench.py's per-query
        # isolation records an errored query only under 'errors', so a
        # query that flaked in SOME run would otherwise KeyError the
        # whole merge (or silently vanish if it flaked in run 1); the
        # median is taken over the runs that have it, and partial
        # coverage is reported, never silent
        names: dict[str, None] = {}
        for r in runs:
            names.update(dict.fromkeys(r[key]))
        meds, spread = {}, {}
        for q in names:
            vals = sorted(r[key][q] for r in runs if q in r[key])
            meds[q] = round(statistics.median(vals), 3)
            spread[q] = [vals[0], vals[-1]]
            if len(vals) < len(runs):
                print(f"WARNING: {q} timed in only {len(vals)}/{len(runs)} runs")
        return meds, spread

    q_med, q_spread = med_spread("queries")
    s_med, s_spread = med_spread("streaming_queries")
    total = round(sum(q_med.values()), 3)
    streaming_total = round(sum(s_med.values()), 3)
    calib = round(statistics.median(r["calib_sec"] for r in runs), 3)
    norm = (lambda t: round(t / calib, 3)) if calib > 0 else (lambda t: -1.0)
    out = {
        "metric": "bench_total_wall_sec",
        "value": total,
        "value_norm": norm(total),
        "unit": "sec",
        "queries": q_med,
        "queries_norm": {k: norm(v) for k, v in q_med.items()},
        "queries_spread": q_spread,
        "streaming_queries": s_med,
        "streaming_queries_spread": s_spread,
        "streaming_sec": streaming_total,
        "streaming_sec_norm": norm(streaming_total),
        "sf": runs[0]["sf"],
        "calib_sec": calib,
        "n_runs": len(runs),
        "run_totals": [r["value"] for r in runs],
        "run_calibs": [r["calib_sec"] for r in runs],
    }
    errs = {k: v for r in runs for k, v in r.get("errors", {}).items()}
    if errs:
        out["errors"] = errs
    return out


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    load1 = os.getloadavg()[0]
    if load1 > 4:
        print(f"WARNING: load {load1:.1f} — snapshot quality needs a quiet host")
    runs = [one_run(i + 1) for i in range(n)]
    merged = merge(runs)
    for path in (DETAIL, MEDIAN):
        with open(path, "w") as fh:
            json.dump(merged, fh, indent=1, sort_keys=True)
            fh.write("\n")
    print(
        json.dumps(
            {
                "metric": "bench_median_of_n",
                "n_runs": n,
                "value": merged["value"],
                "streaming_sec": merged["streaming_sec"],
                "calib_sec": merged["calib_sec"],
                "run_totals": merged["run_totals"],
                "run_calibs": merged["run_calibs"],
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

#!/usr/bin/env python3
"""Median-of-N local bench (dev tool, driver-side python only).

The local box's throughput drifts +/-40% over hours (DESIGN.md rounds
7-8: the same commit re-benched 170.3 s vs 239.7 s), so a single-run
bench artifact cannot support cross-round per-query comparisons. This
runs graft.Bench N times back-to-back and writes per-query MEDIANS
plus the raw runs and the fixed-work calibration seconds each run
reported (Bench's calib_sec: identical work every run, so its ratio
across rounds normalizes box speed).

Usage: python3 tools/bench_median.py [sfDir] [outFile] [nRuns]
"""
import json
import os
import re
import statistics
import subprocess
import sys

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
out = sys.argv[2] if len(sys.argv) > 2 else "BENCH_local_median.json"
n = int(sys.argv[3]) if len(sys.argv) > 3 else 3

runs = []
for i in range(n):
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf,
               SPARK_GRAFT_BENCH_OUT=f"{out}.run{i + 1}.full.json")
    p = subprocess.run(["sbt", "-batch", "runMain graft.Bench"],
                       capture_output=True, text=True, env=env)
    line = None
    for l in p.stdout.splitlines():
        m = re.search(r'\{"metric".*\}\s*$', l)
        # Bench now prints TWO JSON lines (r13 verdict #1): the full
        # per-query line, then a short totals-only trailer for the
        # driver's bounded tail capture. Keep the per-query one.
        if m and '"queries"' in m.group(0):
            line = m.group(0)
    if line is None:
        sys.exit(f"run {i + 1}: no bench JSON (rc={p.returncode})\n"
                 + p.stdout[-2000:])
    r = json.loads(line)
    runs.append(r)
    print(f"run {i + 1}/{n}: total={r['value']} "
          f"calib={r.get('calib_sec')} failures={r['failures']}",
          flush=True)

qnames = sorted(runs[0]["queries"])
med = {}
best = {}
for q in qnames:
    vals = []
    for r in runs:
        v = r["queries"].get(q)
        vals.append(v["sec"] if isinstance(v, dict) else v)
    med[q] = round(statistics.median(vals), 3)
    # best-of-N alongside the median (r13 verdict #9): a single
    # multi-second contention burst (p65 carried a 41 s steal burst
    # in r13's window) otherwise DEFINES a query's number of record;
    # the best run de-tails bursts while the median stays the
    # headline.
    best[q] = round(min(vals), 3)

total_median = round(sum(med.values()), 3)
# the calib-NORMALIZED headline (r12 verdict #1): the committed
# artifact itself carries the number cross-round comparisons need —
# divide the median total by the median of every interleaved
# fixed-work calibration across all runs, so no hand-kept ledger is
# needed to tell box drift from code movement.
all_calibs = [c for r in runs
              for _, c in (r.get("calibs") or [])] or \
             [r.get("calib_sec", 0.0) for r in runs]
calib_median = round(statistics.median(all_calibs), 3)
doc = {
    "metric": "total_median",
    "value": total_median,
    "unit": "sec",
    "value_per_calib": round(total_median / calib_median, 3),
    "calib_median": calib_median,
    "sf": sf,
    "n_runs": n,
    "calib_sec_median": round(statistics.median(
        r.get("calib_sec", 0.0) for r in runs), 3),
    "calib_sec_runs": [r.get("calib_sec") for r in runs],
    "calibs_runs": [r.get("calibs") for r in runs],
    "total_runs": [r["value"] for r in runs],
    "value_per_calib_runs": [r.get("value_per_calib") for r in runs],
    "failures": max(r["failures"] for r in runs),
    "queries": med,
    "queries_best": best,
    "total_best": round(sum(best.values()), 3),
}
with open(out, "w") as f:
    json.dump(doc, f, indent=1, sort_keys=True)
    f.write("\n")
print(f"wrote {out}: total_median={doc['value']} "
      f"value_per_calib={doc['value_per_calib']} "
      f"calib_median={doc['calib_median']} over {n} runs")

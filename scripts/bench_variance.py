#!/usr/bin/env python
"""Run bench.py N times back-to-back and record per-run results + variance.

Round-9 ask (VERDICT r8 #1): a controlled A/B that settles whether the
BENCH_r08 +6% regression (q_stream_hourly, q_ngram_jaccard, q_write_bench,
q_text_stats risers) is real or ambient driver-machine load.  Emits
BENCH_variance_r09.json with per-run per-query seconds, per-query
median/min/max/spread, and the run-total spread.
"""
import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RUNS = int(os.environ.get("NICEFOX_VARIANCE_RUNS", "3"))


def _cpu_sample():
    with open("/proc/stat") as fh:
        return [int(x) for x in fh.readline().split()[1:]]


_CPU_T0 = _cpu_sample()

runs = []
for i in range(RUNS):
    print(f"[variance] run {i + 1}/{RUNS}", file=sys.stderr, flush=True)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, cwd=REPO,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    runs.append(json.loads(line))

queries = sorted(runs[0]["queries"])
per_query = {}
for q in queries:
    vals = [r["queries"][q] for r in runs]
    per_query[q] = {
        "runs": vals,
        "median": round(statistics.median(vals), 3),
        "min": min(vals),
        "max": max(vals),
        "spread_pct": round(100.0 * (max(vals) - min(vals)) / max(min(vals), 1e-9), 1),
    }
totals = [r["value"] for r in runs]
result = {
    "runs": RUNS,
    "totals": totals,
    "total_median": round(statistics.median(totals), 3),
    "total_spread_pct": round(100.0 * (max(totals) - min(totals)) / min(totals), 1),
    "sf": runs[0]["sf"],
    "iters": runs[0].get("iters"),
    "per_query": per_query,
}
# steal/idle measured over the WHOLE run window (sampled at import time
# below vs here): a re-anchor is only meaningful when steal is low
# (VERDICT r9 #2 asks for it recorded)
_b = _cpu_sample()
_d = [y - x for x, y in zip(_CPU_T0, _b)]
result["steal_pct"] = round(100.0 * _d[7] / max(sum(_d), 1), 2)
result["idle_pct"] = round(100.0 * _d[3] / max(sum(_d), 1), 2)

_round = sys.argv[1] if len(sys.argv) > 1 else "09"
path = os.path.join(REPO, f"BENCH_variance_r{_round}.json")
with open(path, "w") as f:
    json.dump(result, f, indent=2, sort_keys=True)
print(json.dumps({"total_median": result["total_median"],
                  "total_spread_pct": result["total_spread_pct"],
                  "totals": totals}))

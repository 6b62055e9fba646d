#!/usr/bin/env python
"""Benchmark harness — one JSON line on stdout.

Mirrors the reference benchmark methodology (warmup + repeated measured
iterations, reference benchmark/src/config.ts:36-41) scaled down to Spark
job granularity: per query, 1 warmup + N measured runs, median reported.

Env:
    SPARK_GRAFT_SF_DIR  dataset dir (default /root/testdata/sf0.1)
    SPARK_GRAFT_CPUS    local[<cpus>] (default 32)
    NICEFOX_BENCH_ITERS measured iterations per query (default 10; the
                        reference measures 100, benchmark/src/config.ts:39-40)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ITERS = int(os.environ.get("NICEFOX_BENCH_ITERS", "30"))

# Headline queries: one per operator family (scan, join, agg, optional,
# distinct, traversal, untyped scan, temporal rollup, theta join, HOFs).
HEADLINE = [
    "q_node_scan",
    "q_one_hop_count",
    "q_two_hop_sum",
    "q_pricing_summary",
    "q_avg_order_value",
    "q_optional_match",
    "q_theta_pairs",
    "q_untyped_scan",
    "q_var_length",
    "q_event_hourly",
    "q_collect_sorted",
    "q_semi_anti",
    # pipeline + streaming operators (beyond-reference surface)
    "q_text_stats",
    "q_embed_topk",
    "q_stream_hourly",
    # the expensive families, measured on purpose: prefix-filtered
    # similarity self-join and iterative graph analytics
    "q_ngram_jaccard",
    "q_connected_components",
    # write path: UNWIND-CREATE batch + MERGE upsert storm + pruned
    # SET/DELETE against the durable bucketed store (round-4 new)
    "q_write_bench",
]

# Mutation workloads re-run the whole write script per iteration (there is
# no warm cache to measure); fewer iterations keep bench wall-clock sane.
ITER_OVERRIDE = {"q_write_bench": 5}

# Queries slower than this after warmup get a reduced iteration count —
# the reference runs 100 iterations on sub-millisecond lookups
# (benchmark/src/config.ts:36-41); mirroring that for multi-second
# aggregate scans would just burn wall-clock without tightening medians.
# Round-6: SLOW_ITERS floor raised 5 → 12 — at n=5 the round-5 artifact
# showed 14-46% swings on unchanged code that were indistinguishable from
# local[32] scheduler noise; median-of-12 tightens that signal.
SLOW_CUTOFF_SEC = 1.0
SLOW_ITERS = max(12, ITERS // 2)


def _read_proc_stat() -> dict[str, int] | None:
    """Aggregate cpu jiffies from /proc/stat (user nice system idle iowait
    irq softirq steal). None on non-Linux."""
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        if parts[0] != "cpu":
            return None
        names = ["user", "nice", "system", "idle", "iowait", "irq",
                 "softirq", "steal"]
        return dict(zip(names, (int(x) for x in parts[1:9])))
    except Exception:  # noqa: BLE001 — telemetry only, never fail the bench
        return None


def _disk_probe_mb_s(path: str, size_mb: int = 128) -> float | None:
    """Sequential fsync'd write throughput near the bench's write surface.
    ~1 s on a healthy disk; collapses visibly under I/O contention."""
    import tempfile

    try:
        block = b"\0" * (1 << 20)
        t0 = time.time()
        with tempfile.NamedTemporaryFile(dir=path, delete=True) as f:
            for _ in range(size_mb):
                f.write(block)
            f.flush()
            os.fsync(f.fileno())
        dt_ = time.time() - t0
        return round(size_mb / dt_, 1) if dt_ > 0 else None
    except Exception:  # noqa: BLE001
        return None


def _host_block(stat0, stat1, disk_before, disk_after) -> dict:
    """Self-annotating contention evidence (VERDICT r10 #2): the driver's
    bench window repeatedly read high on a contended host and each round
    burned effort re-litigating it. steal%/iowait% over the measured window
    plus an fsync'd disk probe let any artifact carry its own evidence."""
    host: dict = {
        "cpus": os.cpu_count(),
        "loadavg_end": [round(x, 2) for x in os.getloadavg()],
        "disk_write_mb_s_before": disk_before,
        "disk_write_mb_s_after": disk_after,
    }
    if stat0 and stat1:
        delta = {k: stat1[k] - stat0[k] for k in stat0}
        total = sum(delta.values()) or 1
        host["steal_pct"] = round(100.0 * delta["steal"] / total, 3)
        host["iowait_pct"] = round(100.0 * delta["iowait"] / total, 3)
        host["busy_pct"] = round(
            100.0 * (total - delta["idle"] - delta["iowait"]) / total, 1
        )
    return host


def main():
    import __spark_entry__ as entrymod
    from nicefox_graphdb_spark import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    probe_dir = os.environ.get("TMPDIR", "/tmp")
    disk_before = _disk_probe_mb_s(probe_dir)
    stat0 = _read_proc_stat()

    qs = entrymod.queries()
    timings: dict[str, float] = {}
    iters_used: dict[str, int] = {}
    for name in HEADLINE:
        fn = qs[name]
        fn(spark, SF_DIR).collect()  # warmup (also builds/caches the catalog)
        # classify on a WARM sample — the first call pays one-time compile/
        # catalog costs that would misclassify sub-second queries as slow
        t0 = time.time()
        fn(spark, SF_DIR).collect()
        probe = time.time() - t0
        n = ITER_OVERRIDE.get(
            name, ITERS if probe < SLOW_CUTOFF_SEC else SLOW_ITERS
        )
        samples = [probe]
        for _ in range(n - 1):
            t0 = time.time()
            fn(spark, SF_DIR).collect()
            samples.append(time.time() - t0)
        timings[name] = round(statistics.median(samples), 3)
        iters_used[name] = n

    stat1 = _read_proc_stat()
    disk_after = _disk_probe_mb_s(probe_dir)

    total = round(sum(timings.values()), 3)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_query_total_median",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "iters": ITERS,
                "iters_used": iters_used,
                "host": _host_block(stat0, stat1, disk_before, disk_after),
            }
        )
    )


if __name__ == "__main__":
    main()

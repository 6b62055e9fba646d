#!/usr/bin/env python
"""r12: per-job trace of each q_write_bench statement via the event log."""
import glob
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ELOG = tempfile.mkdtemp(prefix="nf_elog12_")
os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
os.environ["PYSPARK_SUBMIT_ARGS"] = (
    f"--conf spark.eventLog.enabled=true --conf spark.eventLog.compress=false --conf spark.eventLog.rolling.enabled=false --conf spark.eventLog.dir={ELOG} "
    "pyspark-shell"
)

from nicefox_graphdb_spark import CypherEngine, get_spark  # noqa: E402
from nicefox_graphdb_spark.catalog import GraphCatalog  # noqa: E402

spark = get_spark()
spark.sparkContext.setLogLevel("ERROR")
sc = spark.sparkContext

STATEMENTS = [
    ("create", "UNWIND range(0, 999) AS i CREATE (:Doc {k: i, v: i % 10})"),
    ("merge", "UNWIND range(500, 1499) AS i MERGE (d:Doc {k: i}) "
              "ON MATCH SET d.m = 1 ON CREATE SET d.c = 1"),
    ("set", "MATCH (d:Doc) WHERE d.k < 100 SET d.v = d.v + 100"),
    ("delete", "MATCH (d:Doc) WHERE d.k >= 1400 DELETE d"),
]

marks = []  # (stmt, t0, t1)
path = tempfile.mkdtemp(prefix="nf_jobs12_")
try:
    eng = CypherEngine(spark, GraphCatalog(spark), data_path=path, n_buckets=32)
    for name, q in STATEMENTS:  # warm round
        eng.query(q)
    shutil.rmtree(path, ignore_errors=True)
    path = tempfile.mkdtemp(prefix="nf_jobs12b_")
    eng = CypherEngine(spark, GraphCatalog(spark), data_path=path, n_buckets=32)
    for name, q in STATEMENTS:
        t0 = time.time() * 1000
        sc.setJobDescription(f"STMT:{name}")
        eng.query(q)
        sc.setJobDescription(None)
        marks.append((name, t0, time.time() * 1000))
finally:
    shutil.rmtree(path, ignore_errors=True)

sc._jsc.sc().listenerBus().waitUntilEmpty()
spark.stop()
time.sleep(1)

logf = glob.glob(os.path.join(ELOG, "*", "events_*")) or glob.glob(
    os.path.join(ELOG, "*")
)
jobs = {}
with open(logf[0]) as f:
    for line in f:
        e = json.loads(line)
        if e["Event"] == "SparkListenerJobStart":
            props = e.get("Properties", {})
            jobs[e["Job ID"]] = {
                "t0": e["Submission Time"],
                "desc": props.get("spark.job.description", ""),
                "cs": props.get("callSite.short", ""),
                "nstages": len(e.get("Stage Infos", [])),
                "ntasks": sum(s.get("Number of Tasks", 0) for s in e.get("Stage Infos", [])),
            }
        elif e["Event"] == "SparkListenerJobEnd":
            if e["Job ID"] in jobs:
                jobs[e["Job ID"]]["t1"] = e["Completion Time"]

for name, t0, t1 in marks:
    mine = {j: v for j, v in jobs.items()
            if v["desc"] == f"STMT:{name}" and v["t0"] >= t0 - 5}
    print(f"=== {name}: wall {t1-t0:.0f} ms, {len(mine)} jobs")
    prev = t0
    for j in sorted(mine):
        v = mine[j]
        end = v.get("t1", v["t0"])
        print(f"  job {j}: {end-v['t0']:6.0f} ms (gap {v['t0']-prev:5.0f} ms, "
              f"{v['nstages']} st/{v['ntasks']} tk) {v['cs'][:90]}")
        prev = end
    print(f"  tail gap {t1-prev:.0f} ms")
shutil.rmtree(ELOG, ignore_errors=True)

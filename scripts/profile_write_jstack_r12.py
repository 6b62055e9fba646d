#!/usr/bin/env python
"""r12: sample the driver JVM while write statements run, to attribute the
between-jobs gaps (guide 7.3). Runs SET statements in a loop; a sibling
thread jstacks the JVM and histograms the deepest interesting frame."""
import os
import shutil
import subprocess
import sys
import tempfile
import threading
import time
from collections import Counter

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

from nicefox_graphdb_spark import CypherEngine, get_spark  # noqa: E402
from nicefox_graphdb_spark.catalog import GraphCatalog  # noqa: E402

spark = get_spark()
spark.sparkContext.setLogLevel("ERROR")

# find the JVM pid (child of this python)
me = os.getpid()
out = subprocess.check_output(["ps", "-eo", "pid,ppid,cmd"]).decode()
jvm = None
for ln in out.splitlines():
    parts = ln.split(None, 2)
    if len(parts) == 3 and parts[1] == str(me) and "java" in parts[2]:
        jvm = parts[0]
print("jvm pid:", jvm)

hist = Counter()
stop = False

KEY = [
    "org.apache.spark.sql.catalyst.analysis",
    "org.apache.spark.sql.catalyst.optimizer",
    "org.apache.spark.sql.execution.datasources.InMemoryFileIndex",
    "org.apache.spark.sql.execution.datasources.parquet",
    "org.apache.spark.sql.execution.adaptive",
    "org.apache.spark.sql.execution.WholeStageCodegen",
    "org.apache.spark.sql.catalyst.rules.RuleExecutor",
    "org.apache.spark.sql.execution.QueryExecution",
    "org.apache.spark.scheduler.DAGScheduler",
    "parquet.hadoop",
    "org.apache.hadoop.fs",
    "java.io",
    "codegen",
]


def sampler():
    while not stop:
        try:
            dump = subprocess.check_output(
                ["jstack", jvm], stderr=subprocess.DEVNULL
            ).decode()
        except Exception:
            time.sleep(0.05)
            continue
        # only threads that are RUNNABLE and contain spark frames
        for blk in dump.split("\n\n"):
            if "java.lang.Thread.State: RUNNABLE" not in blk:
                continue
            frames = [l.strip() for l in blk.splitlines() if l.strip().startswith("at ")]
            if not frames:
                continue
            tag = None
            for fr in frames:
                for k in KEY:
                    if k in fr:
                        tag = fr[3:120]
                        break
                if tag:
                    break
            if tag and "spark" in blk:
                hist[tag] += 1
        time.sleep(0.02)


t = threading.Thread(target=sampler, daemon=True)
t.start()

path = tempfile.mkdtemp(prefix="nf_js12_")
try:
    eng = CypherEngine(spark, GraphCatalog(spark), data_path=path, n_buckets=32)
    eng.query("UNWIND range(0, 999) AS i CREATE (:Doc {k: i, v: i % 10})")
    t0 = time.time()
    n = 0
    while time.time() - t0 < 45:
        eng.query(f"MATCH (d:Doc) WHERE d.k < 100 SET d.v = d.v + {n%7}")
        n += 1
    print(f"{n} SET statements in {time.time()-t0:.1f} s "
          f"({(time.time()-t0)/max(n,1)*1000:.0f} ms each)")
finally:
    stop = True
    time.sleep(0.3)
    shutil.rmtree(path, ignore_errors=True)

for frame, c in hist.most_common(25):
    print(f"{c:5d}  {frame}")

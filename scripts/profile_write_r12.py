#!/usr/bin/env python
"""r12: statement-level decomposition of q_write_bench.

Times each of the 4 write statements + the read, and counts Spark jobs per
statement via the status tracker (guide §1: measure first)."""
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

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
READ = ("read", "MATCH (d:Doc) RETURN count(*) AS n_nodes, sum(d.v) AS sum_v, "
        "sum(coalesce(d.m, 0)) AS n_matched, sum(coalesce(d.c, 0)) AS n_created")


def one_round(tag):
    path = tempfile.mkdtemp(prefix="nf_profw12_")
    try:
        t0 = time.time()
        eng = CypherEngine(spark, GraphCatalog(spark), data_path=path, n_buckets=32)
        t_init = time.time() - t0
        out = [f"[{tag}] engine init: {t_init*1000:.0f} ms"]
        tracker = sc.statusTracker()
        for name, q in STATEMENTS + [READ]:
            jobs0 = len(tracker.getJobIdsForGroup() or [])
            j0 = sc._jsc.sc().dagScheduler().nextJobId()
            t0 = time.time()
            eng.query(q)
            dt = time.time() - t0
            j1 = sc._jsc.sc().dagScheduler().nextJobId()
            out.append(f"[{tag}] {name:8s}: {dt*1000:7.0f} ms  jobs={j1-j0}")
        return out
    finally:
        shutil.rmtree(path, ignore_errors=True)


for tag in ("cold", "warm1", "warm2", "warm3", "warm4"):
    for line in one_round(tag):
        print(line)

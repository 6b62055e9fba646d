#!/usr/bin/env python
"""Per-statement profiling of the q_write_bench workload."""
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from nicefox_graphdb_spark import get_spark  # noqa: E402
from nicefox_graphdb_spark import CypherEngine  # noqa: E402
from nicefox_graphdb_spark.catalog import GraphCatalog  # noqa: E402

spark = get_spark()
spark.sparkContext.setLogLevel("ERROR")

STATEMENTS = [
    "UNWIND range(0, 999) AS i CREATE (:Doc {k: i, v: i % 10})",
    (
        "UNWIND range(500, 1499) AS i MERGE (d:Doc {k: i}) "
        "ON MATCH SET d.m = 1 ON CREATE SET d.c = 1"
    ),
    "MATCH (d:Doc) WHERE d.k < 100 SET d.v = d.v + 100",
    "MATCH (d:Doc) WHERE d.k >= 1400 DELETE d",
    (
        "MATCH (d:Doc) RETURN count(*) AS n_nodes, sum(d.v) AS sum_v, "
        "sum(coalesce(d.m, 0)) AS n_matched, "
        "sum(coalesce(d.c, 0)) AS n_created"
    ),
]


def run_once(tag):
    path = tempfile.mkdtemp(prefix="nicefox_profile_write_")
    try:
        eng = CypherEngine(spark, GraphCatalog(spark), data_path=path, n_buckets=32)
        per = []
        for s in STATEMENTS:
            sc = spark.sparkContext
            t0 = time.time()
            if s.startswith("MATCH (d:Doc) RETURN"):
                eng.dataframe(s).collect()
            else:
                eng.query(s)
            per.append(time.time() - t0)
        print(f"[{tag}] total={sum(per):.3f}  " +
              "  ".join(f"s{i}={t:.3f}" for i, t in enumerate(per)))
        return per
    finally:
        shutil.rmtree(path, ignore_errors=True)


run_once("warmup")
for i in range(3):
    run_once(f"run{i}")

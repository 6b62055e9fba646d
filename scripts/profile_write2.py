#!/usr/bin/env python
"""Sub-step profiling: monkeypatch timers around store + compiler internals."""
import functools
import os
import shutil
import sys
import tempfile
import time
from collections import defaultdict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from nicefox_graphdb_spark import get_spark, CypherEngine  # noqa: E402
from nicefox_graphdb_spark.catalog import GraphCatalog  # noqa: E402
from nicefox_graphdb_spark import durable_store as ds  # noqa: E402
from nicefox_graphdb_spark.cypher import compiler as cp  # noqa: E402
from pyspark.sql import DataFrame  # noqa: E402

TIMES = defaultdict(float)
COUNTS = defaultdict(int)


def timed(cls, name):
    orig = getattr(cls, name)

    @functools.wraps(orig)
    def wrap(*a, **k):
        t0 = time.time()
        try:
            return orig(*a, **k)
        finally:
            TIMES[f"{cls.__name__}.{name}"] += time.time() - t0
            COUNTS[f"{cls.__name__}.{name}"] += 1
    setattr(cls, name, wrap)


for n in ["_write_files", "append", "replace_buckets", "touched_buckets",
          "commit", "read_table"]:
    timed(ds.DurableTableStore, n)
for n in ["_bump", "append_nodes", "update_node_props", "delete_nodes",
          "_refresh_node", "_adopt_node"]:
    timed(ds.DurableGraph, n)
for n in ["_probe_created", "_merge_node", "_apply_merge_sets", "compile_set",
          "compile_create", "compile_delete"]:
    timed(cp.CypherToSpark, n)
timed(DataFrame, "localCheckpoint")
timed(DataFrame, "isEmpty")

spark = get_spark()
spark.sparkContext.setLogLevel("ERROR")

STATEMENTS = [
    "UNWIND range(0, 999) AS i CREATE (:Doc {k: i, v: i % 10})",
    ("UNWIND range(500, 1499) AS i MERGE (d:Doc {k: i}) "
     "ON MATCH SET d.m = 1 ON CREATE SET d.c = 1"),
    "MATCH (d:Doc) WHERE d.k < 100 SET d.v = d.v + 100",
    "MATCH (d:Doc) WHERE d.k >= 1400 DELETE d",
]


def run_once():
    path = tempfile.mkdtemp(prefix="nicefox_profile_write_")
    try:
        eng = CypherEngine(spark, GraphCatalog(spark), data_path=path, n_buckets=32)
        for s in STATEMENTS:
            eng.query(s)
    finally:
        shutil.rmtree(path, ignore_errors=True)


run_once()  # warmup
TIMES.clear()
COUNTS.clear()
t0 = time.time()
N = 3
for _ in range(N):
    run_once()
wall = time.time() - t0
print(f"wall per run: {wall/N:.3f}")
for k in sorted(TIMES, key=TIMES.get, reverse=True):
    print(f"  {k:45s} {TIMES[k]/N:7.3f}s  x{COUNTS[k]/N:.1f}")

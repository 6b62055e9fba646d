"""Bucketed catalog persistence — the cluster-scale storage layout.

On a 100 TB graph, every hop is `nodes ⋈ edges` on ids; if both sides are
hash-bucketed on their join keys with the same bucket count, Spark plans
the join with NO shuffle exchange on the bucketed sides (bucket-aware
scans). This module materializes a GraphCatalog in that layout:

- node tables bucketed+sorted by `_id`
- edge tables bucketed+sorted by `_src` (the expansion direction) — a
  production deployment would keep a second copy bucketed by `_dst` for
  reverse expansion, exactly like the reference keeps both
  `edges(source_id,type)` and `edges(target_id,type)` indexes
  (reference src/db.ts:64-68)

`tests/test_bucketed.py` asserts the shuffle actually disappears from the
physical plan.
"""

from __future__ import annotations

import re
import shutil

from pyspark.sql import SparkSession

from nicefox_graphdb_spark.catalog import GraphCatalog


def _safe(name: str) -> str:
    return re.sub(r"[^A-Za-z0-9_]", "_", name).lower()


def _drop(spark: SparkSession, db: str, tbl: str) -> None:
    """Drop table + purge any orphaned location (a fresh metastore doesn't
    know about directories a previous session left in the warehouse)."""
    spark.sql(f"DROP TABLE IF EXISTS {db}.{tbl}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    path = f"{warehouse.removeprefix('file:')}/{db}.db/{tbl}"
    shutil.rmtree(path, ignore_errors=True)


def save_bucketed_catalog(
    cat: GraphCatalog, db: str = "nicefox", n_buckets: int = 16
) -> None:
    """Materialize every catalog table as a bucketed+sorted managed table."""
    spark = cat.spark
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
    for label in cat.labels:
        tbl = f"{db}.nodes_{_safe(label)}"
        _drop(spark, db, f"nodes_{_safe(label)}")
        (
            cat.node(label)
            .df.write.mode("overwrite")
            .bucketBy(n_buckets, "_id")
            .sortBy("_id")
            .format("parquet")
            .saveAsTable(tbl)
        )
    for i, et in enumerate(cat._edges):
        short = (
            f"edges_{_safe(et.type)}_{_safe(et.src_label)}_"
            f"{_safe(et.dst_label)}_{i}"
        )
        tbl = f"{db}.{short}"
        _drop(spark, db, short)
        (
            et.df.write.mode("overwrite")
            .bucketBy(n_buckets, "_src")
            .sortBy("_src")
            .format("parquet")
            .saveAsTable(tbl)
        )


def load_bucketed_catalog(spark: SparkSession, db: str = "nicefox") -> GraphCatalog:
    """Rebuild a GraphCatalog from the bucketed tables."""
    cat = GraphCatalog(spark)
    for row in spark.sql(f"SHOW TABLES IN {db}").collect():
        name = row["tableName"]
        df = spark.table(f"{db}.{name}")
        if name.startswith("nodes_"):
            label = name[len("nodes_"):]
            cat.register_node(label.capitalize(), df)
        elif name.startswith("edges_"):
            parts = name[len("edges_"):].rsplit("_", 3)
            type_, src_label, dst_label, _ = parts
            cat.register_edge(
                type_.upper(), src_label.capitalize(), dst_label.capitalize(), df
            )
    return cat

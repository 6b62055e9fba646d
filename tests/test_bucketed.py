"""Bucketed storage layout: prove the hop join loses its shuffle."""

import pytest
from pyspark.sql import functions as F

from nicefox_graphdb_spark.catalog import GraphCatalog
from nicefox_graphdb_spark.sources.bucketed import save_bucketed_catalog


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    cat = GraphCatalog(spark)
    nodes = spark.range(0, 1000).select(
        F.concat(F.lit("N"), F.col("id").cast("string")).alias("_id"),
        (F.col("id") % 7).alias("val"),
    )
    edges = spark.range(0, 5000).select(
        F.concat(F.lit("E"), F.col("id").cast("string")).alias("_id"),
        F.concat(F.lit("N"), (F.col("id") % 1000).cast("string")).alias("_src"),
        F.concat(F.lit("N"), ((F.col("id") * 13) % 1000).cast("string")).alias("_dst"),
    )
    cat.register_node("Thing", nodes)
    cat.register_edge("LINKS", "Thing", "Thing", edges)
    save_bucketed_catalog(cat, db="buckettest", n_buckets=8)
    return spark


def _n_exchanges(df) -> int:
    return df._jdf.queryExecution().executedPlan().toString().count("Exchange")


def test_bucketed_join_has_no_shuffle(bucketed_tables):
    spark = bucketed_tables
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        nodes = spark.table("buckettest.nodes_thing")
        edges = spark.table("buckettest.edges_links_thing_thing_0")
        joined = nodes.join(edges, nodes["_id"] == edges["_src"])
        bucketed_exchanges = _n_exchanges(joined)

        # same join on non-bucketed DataFrames: shuffles both sides
        plain_nodes = spark.createDataFrame(nodes.collect(), nodes.schema)
        plain_edges = spark.createDataFrame(edges.collect(), edges.schema)
        plain = plain_nodes.join(
            plain_edges, plain_nodes["_id"] == plain_edges["_src"]
        )
        plain_exchanges = _n_exchanges(plain)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert bucketed_exchanges == 0, "bucketed join must be shuffle-free"
    assert plain_exchanges >= 2
    # and of course the same rows come back
    assert joined.count() == 5000

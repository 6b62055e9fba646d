"""Pins for the r11 optimization internals (OPTIMIZATION_r11.md).

Each test pins the STRUCTURE an optimization introduced, so a regression
is a test failure rather than a silent wall-clock cliff:
- the candidate verify re-spread (AQE coalesces 16-byte pairs to one task
  by byte size — the repartition must stay ahead of the CPU-bound verify);
- single-evaluation tokenization (one regex split per row in the fused
  text expressions);
- iterative algorithms ride their convergence/aggregate probes on the
  per-step checkpoint job, so the returned lineage spans one step (plan
  pins: LogicalRDD checkpoints present, join depth bounded).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _analyzed(df) -> str:
    return df._jdf.queryExecution().analyzed().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, f"alpha beta gamma delta epsilon zeta doc{i % 7} eta theta") for i in range(60)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_jaccard_verify_is_respread(spark, docs):
    from nicefox_graphdb_spark.operators import dedup as dd

    out = dd.jaccard_pairs(
        docs, "doc_id", dd.word_shingles(F.col("text"), 3), threshold=0.2,
        max_shingle_freq=None,
    )
    # the round-robin re-spread of the candidate pairs must sit in the plan
    # (logical Repartition with shuffle=true) — without it the
    # array_intersect verify runs on ONE AQE-coalesced task (measured 3x
    # the gate wall-clock, r11)
    assert "Repartition" in _analyzed(out), _analyzed(out)


def test_minhash_verify_is_respread(spark, docs):
    from nicefox_graphdb_spark.operators import dedup as dd

    out = dd.minhash_lsh_pairs(
        docs, "doc_id", dd.word_shingles(F.col("text"), 3), k=8, bands=4,
        threshold=0.2,
    )
    assert "Repartition" in _analyzed(out), _analyzed(out)


def test_text_stats_single_tokenization(spark, docs):
    from nicefox_graphdb_spark.operators import text as tx

    fused = docs.select(
        F.inline(
            F.array(
                tx.let_tokens(
                    F.col("text"),
                    lambda toks: F.struct(
                        F.size(toks).cast("long").alias("tc"),
                        tx.quality_score_of(toks).alias("q"),
                    ),
                )
            )
        )
    )
    # exactly ONE regex tokenizer split in the optimized plan — the fusion
    # exists to stop Catalyst re-running the split per consumer
    plan = _optimized(fused)
    assert plan.count("split(lower(") == 1, plan
    # and lang_id stays single-split through its let-binding
    lang = docs.select(tx.lang_id(F.col("text")).alias("l"))
    assert _optimized(lang).count("split(lower(") == 1


def test_quality_and_langid_match_unbound_forms(spark, docs):
    # the let-bound rewrites must be value-identical to the naive forms
    from nicefox_graphdb_spark.operators import text as tx
    from nicefox_graphdb_spark.operators.text import (
        EN_STOPWORDS,
        tokens,
    )

    toks = tokens(F.col("text"))
    hits = F.size(F.filter(toks, lambda t: t.isin(EN_STOPWORDS)))
    stop = F.when(F.size(toks) > 0, hits / F.size(toks)).otherwise(F.lit(0.0))
    total = F.aggregate(toks, F.lit(0).cast("long"), lambda a, t: a + F.length(t))
    meanlen = F.when(F.size(toks) > 0, total / F.size(toks)).otherwise(F.lit(0.0))
    naive = F.round(
        F.least(stop * 5.0, F.lit(1.0)) * 0.4
        + F.least(F.size(toks) / 100.0, F.lit(1.0)) * 0.3
        + F.least(meanlen / 8.0, F.lit(1.0)) * 0.3,
        4,
    )
    rows = docs.select(
        tx.quality_score(F.col("text")).alias("opt"), naive.alias("naive")
    ).collect()
    assert all(r["opt"] == r["naive"] for r in rows)


def test_pagerank_lineage_is_cut_per_superstep(spark):
    # every superstep checkpoints with the dangling mass riding the
    # checkpoint as an Observation: the RETURNED frame's lineage must span
    # only the LAST superstep (joins over a LogicalRDD checkpoint), not the
    # whole iteration history (the old shape re-executed up to
    # CHECKPOINT_EVERY supersteps per dangling-mass broadcast probe)
    from nicefox_graphdb_spark.operators import graph_algos as ga

    edges = spark.createDataFrame(
        [(f"n{i}", f"n{i+1}") for i in range(30)], "src string, dst string"
    )
    plan = _analyzed(ga.pagerank(edges, n_iter=4))
    assert "LogicalRDD" in plan
    assert plan.count("Join") <= 3, plan


def test_sssp_frontiers_are_materialized(spark):
    # per-hop checkpoint with the frontier count riding it: the returned
    # settled set must be a union of materialized frontiers (LogicalRDDs)
    # with NO join left in its lineage (the old isEmpty probe + lazy
    # frontier re-executed each hop's join twice)
    from nicefox_graphdb_spark.operators import graph_algos as ga

    edges = spark.createDataFrame(
        [(f"n{i}", f"n{i+1}") for i in range(12)], "src string, dst string"
    )
    sources = spark.createDataFrame([("n0",)], "start string")
    plan = _analyzed(ga.shortest_path_lengths(edges, sources, max_hops=5))
    assert "LogicalRDD" in plan
    assert "Join" not in plan, plan


def test_cc_solved_path_results(spark):
    # two components + one self-loop-only vertex (the canon0 checkpoint
    # keeps self-loops precisely so this vertex stays in the vertex set)
    from nicefox_graphdb_spark.operators import graph_algos as ga

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y"), ("z", "z")],
        "src string, dst string",
    )
    got = {
        (r["id"], r["component"])
        for r in ga.connected_components(edges).collect()
    }
    assert got == {
        ("a", "a"), ("b", "a"), ("c", "a"),
        ("x", "x"), ("y", "x"),
        ("z", "z"),
    }


def test_write_only_result_is_single_partition(spark, tmp_path):
    from nicefox_graphdb_spark import CypherEngine
    from nicefox_graphdb_spark.catalog import GraphCatalog

    eng = CypherEngine(spark, GraphCatalog(spark), mutable=True)
    df = eng.dataframe("CREATE (:P {x: 1})")
    # the write-only empty result must stay <=1 partition: at 32 empty
    # partitions its collect was a 32-task no-op job per statement (r11)
    assert df.rdd.getNumPartitions() <= 1
    assert df.count() == 0

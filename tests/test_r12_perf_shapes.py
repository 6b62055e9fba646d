"""Pins for the r12 optimization internals (OPTIMIZATION_r12.md).

- the candidate dedup + verify-spread fusion (ONE pair-key exchange where
  r11 had dropDuplicates' exchange PLUS a round-robin respread);
- pagerank's co-partitioned superstep (the checkpoint records hash
  partitioning — lost under AQE — so the per-superstep joins run with no
  join-side Exchange, and shuffle_hash keeps the planner from
  broadcasting the full vertex state every superstep);
- the reliable-checkpoint durability knob for the iterative algorithms.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _formatted(df) -> str:
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _analyzed(df) -> str:
    return df._jdf.queryExecution().analyzed().toString()


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (i, f"alpha beta gamma delta epsilon zeta doc{i % 7} eta theta")
        for i in range(60)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_jaccard_dedup_and_spread_share_one_exchange(spark, docs):
    """r12: the candidate-pair repartition is BY THE PAIR KEY at the
    configured parallelism — the same exchange dropDuplicates needs — so
    the plan carries no second round-robin exchange between dedup and the
    CPU-bound verify (ADVICE r11)."""
    from nicefox_graphdb_spark.operators import dedup as dd

    out = dd.jaccard_pairs(
        docs,
        "doc_id",
        dd.word_shingles(F.col("text"), 3),
        threshold=0.2,
        max_shingle_freq=None,
    )
    plan = _analyzed(out)
    # hash-partitioned repartition on the pair key present...
    assert "RepartitionByExpression [id_a" in plan, plan
    # ...and NO round-robin repartition left anywhere in the pipeline
    assert "Repartition " not in plan, plan


def test_copartitioned_cut_records_hash_partitioning(spark):
    """_cut_copartitioned must stamp the checkpointed RDD with the plan's
    hash partitioning (a plain localCheckpoint under AQE records
    UnknownPartitioning, and every downstream same-key join re-shuffles)."""
    from nicefox_graphdb_spark.operators import graph_algos as ga

    df = spark.range(100).select(
        F.col("id").cast("string").alias("id"), F.lit(1.0).alias("rank")
    )
    ck = ga._cut_copartitioned(df.repartition(8, "id"))
    plan = _formatted(ck.where(F.col("rank") > 0))
    assert "hashpartitioning(id" in plan, plan
    # control: the AQE-wrapped checkpoint loses it
    plain = df.repartition(8, "id").localCheckpoint(eager=True)
    assert "UnknownPartitioning" in _formatted(plain.where(F.col("rank") > 0))


def test_copartitioned_join_has_no_join_side_exchange(spark):
    """Two frames cut with recorded hash partitioning on the join key must
    join (shuffle_hash) with ZERO exchange — the pagerank superstep shape."""
    from nicefox_graphdb_spark.operators import graph_algos as ga

    edges = spark.range(1000).select(
        (F.col("id") % 100).cast("string").alias("src"),
        ((F.col("id") * 7) % 100).cast("string").alias("dst"),
    )
    state = spark.range(100).select(
        F.col("id").cast("string").alias("id"), F.lit(1.0).alias("rank")
    )
    e_ck = ga._cut_copartitioned(edges.repartition(8, "src"))
    s_ck = ga._cut_copartitioned(state.repartition(8, "id"))
    hs = s_ck.hint("shuffle_hash")
    joined = e_ck.join(hs, e_ck["src"] == hs["id"]).select("dst", "rank")
    plan = _formatted(joined)
    assert "ShuffledHashJoin" in plan, plan
    # no Exchange feeds the join: both sides read the recorded partitioning
    assert "Exchange hashpartitioning" not in plan, plan
    assert "BroadcastExchange" not in plan, plan


def test_pagerank_matches_unpartitioned_reference(spark):
    """Co-partitioning + shuffle_hash must not change pagerank's results
    (rank rounded to 6 by the public API)."""
    from nicefox_graphdb_spark.operators import graph_algos as ga

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"), ("d", "a")],
        "src string, dst string",
    )
    got = {
        r["id"]: r["rank"] for r in ga.pagerank(edges, n_iter=8).collect()
    }
    # hand-rolled reference power iteration (same damping/iterations)
    ranks = {v: 1.0 for v in "abcd"}
    out_deg = {"a": 2, "b": 1, "c": 1, "d": 1}
    adj = {"a": ["b", "c"], "b": ["c"], "c": ["a"], "d": ["a"]}
    for _ in range(8):
        incoming = {v: 0.0 for v in ranks}
        for u, vs in adj.items():
            for v in vs:
                incoming[v] += ranks[u] / out_deg[u]
        ranks = {v: 0.15 + 0.85 * incoming[v] for v in ranks}
    for v, r in ranks.items():
        assert got[v] == pytest.approx(r, abs=2e-6), (v, got[v], r)


def test_terminal_durable_create_is_single_action(spark, tmp_path):
    """r12: a terminal single-node CREATE against the durable store skips
    the uuid-freezing checkpoint — the append write materializes the ids
    (one Spark job instead of two), and the stored ids are stable."""
    from nicefox_graphdb_spark import CypherEngine
    from nicefox_graphdb_spark.catalog import GraphCatalog

    eng = CypherEngine(
        spark, GraphCatalog(spark), data_path=str(tmp_path / "g"), n_buckets=8
    )
    eng.query("UNWIND range(0, 9) AS i CREATE (:Fc {k: i})")  # warm compile

    sc = spark.sparkContext
    jsc = sc._jsc.sc()
    j0 = jsc.dagScheduler().nextJobId()
    eng.query("UNWIND range(10, 19) AS i CREATE (:Fc {k: i})")
    n_jobs = jsc.dagScheduler().nextJobId() - j0
    assert n_jobs <= 2, f"terminal durable CREATE scheduled {n_jobs} jobs"
    # ids frozen in the table: two reads agree
    a = {r["id"]: r["k"] for r in eng.query(
        "MATCH (n:Fc) RETURN id(n) AS id, n.k AS k")}
    b = {r["id"]: r["k"] for r in eng.query(
        "MATCH (n:Fc) RETURN id(n) AS id, n.k AS k")}
    assert a == b and len(a) == 20


def test_nonterminal_create_still_freezes_ids(spark, tmp_path):
    """A CREATE whose binding is consumed by a later clause must keep the
    checkpoint: the returned ids must equal the stored ids."""
    from nicefox_graphdb_spark import CypherEngine
    from nicefox_graphdb_spark.catalog import GraphCatalog

    eng = CypherEngine(
        spark, GraphCatalog(spark), data_path=str(tmp_path / "g2"), n_buckets=8
    )
    returned = eng.query(
        "UNWIND range(0, 4) AS i CREATE (n:Fz {k: i}) "
        "RETURN id(n) AS id ORDER BY id"
    )
    stored = eng.query("MATCH (n:Fz) RETURN id(n) AS id ORDER BY id")
    assert [r["id"] for r in returned] == [r["id"] for r in stored]


def test_reliable_checkpoint_knob(spark, tmp_path, monkeypatch):
    """NICEFOX_RELIABLE_CHECKPOINT_EVERY_K routes every k-th iteration cut
    through the reliable checkpoint dir; results are unchanged."""
    from nicefox_graphdb_spark.operators import graph_algos as ga

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("d", "a")],
        "src string, dst string",
    )
    base = {r["id"]: r["rank"] for r in ga.pagerank(edges, n_iter=4).collect()}
    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    monkeypatch.setenv("NICEFOX_RELIABLE_CHECKPOINT_EVERY_K", "2")
    durable = {
        r["id"]: r["rank"] for r in ga.pagerank(edges, n_iter=4).collect()
    }
    assert durable == base
    # the reliable checkpoints actually landed in the checkpoint dir
    ckpt_files = list((tmp_path / "ckpt").rglob("*"))
    assert ckpt_files, "no reliable checkpoint files written"

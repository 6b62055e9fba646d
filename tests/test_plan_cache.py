"""Plan cache — repeated read queries reuse the compiled DataFrame;
writes and catalog changes invalidate (reference LRU statement cache,
src/db.ts:580-625)."""

import time

from nicefox_graphdb_spark import CypherEngine
from nicefox_graphdb_spark.catalog import GraphCatalog


def test_repeat_query_hits_cache(engine):
    d1 = engine.dataframe("MATCH (n:Customer) RETURN count(*) AS c")
    d2 = engine.dataframe("MATCH (n:Customer) RETURN count(*) AS c")
    assert d1 is d2


def test_same_params_hit_different_params_miss(engine):
    q = "MATCH (n:Customer) WHERE n.c_custkey = $k RETURN n.c_name AS name"
    a = engine.dataframe(q, {"k": 1})
    b = engine.dataframe(q, {"k": 1})
    c = engine.dataframe(q, {"k": 2})
    assert a is b
    assert a is not c


def test_write_invalidates_cache(spark):
    eng = CypherEngine(spark, GraphCatalog(spark), mutable=True)
    eng.query("CREATE (:X {v: 1})")
    q = "MATCH (n:X) RETURN count(*) AS c"
    d1 = eng.dataframe(q)
    assert eng.query(q) == [{"c": 1}]
    eng.query("CREATE (:X {v: 2})")
    d2 = eng.dataframe(q)
    assert d1 is not d2  # catalog version moved
    assert eng.query(q) == [{"c": 2}]


def test_write_queries_never_cached(spark):
    eng = CypherEngine(spark, GraphCatalog(spark), mutable=True)
    eng.query("CREATE (:Y {v: 1})")
    eng.query("CREATE (:Y {v: 1})")  # must execute twice, not hit cache
    assert eng.query("MATCH (n:Y) RETURN count(*) AS c") == [{"c": 2}]


def test_compile_cost_amortized(engine):
    q = ("MATCH (c:Customer)-[:PLACED]->(o:Order) "
         "WHERE o.o_orderstatus = 'O' "
         "RETURN c.c_mktsegment AS seg, count(*) AS n ORDER BY seg")
    t0 = time.perf_counter()
    engine.dataframe(q)
    cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(20):
        engine.dataframe(q)
    warm_each = (time.perf_counter() - t0) / 20
    assert warm_each < cold / 5  # cache hit ≫ cheaper than a compile


def test_cache_stats_and_varying_param_correctness(spark):
    """Per-VALUE keying is deliberate (engine.py rationale: literal inlining
    buys parquet pushdown; the reference's by-text prepared statements,
    src/db.ts:580-625, fit SQLite's run-time binding instead). This pins
    the contract: repeat values hit, new values recompile correctly."""
    eng = CypherEngine(spark, GraphCatalog(spark), mutable=True)
    eng.query("CREATE (:P {v: 1}), (:P {v: 2}), (:P {v: 3})")
    q = "MATCH (n:P) WHERE n.v >= $k RETURN count(*) AS c"
    assert eng.query(q, {"k": 2}) == [{"c": 2}]
    base = dict(eng.cache_stats)
    assert eng.query(q, {"k": 2}) == [{"c": 2}]  # same values → hit
    assert eng.cache_stats["plan_hits"] == base["plan_hits"] + 1
    assert eng.query(q, {"k": 3}) == [{"c": 1}]  # new value → recompile
    assert eng.cache_stats["misses"] == base["misses"] + 1


def test_unhashable_params_skip_cache(engine):
    # list params are hashable via freezing; ensure no crash + correct reuse
    q = "RETURN size($xs) AS n"
    a = engine.dataframe(q, {"xs": [1, 2, 3]})
    b = engine.dataframe(q, {"xs": [1, 2, 3]})
    assert a is b


def test_fragment_cache_reuses_scans_across_param_values(spark):
    # Structural tier (r11): same query shape with DIFFERENT param values
    # recompiles (value-keyed plan cache misses by design) but reuses the
    # value-independent scan fragments — and still answers correctly.
    eng = CypherEngine(spark, GraphCatalog(spark), mutable=True)
    eng.query("CREATE (:F {k: 1, v: 'a'}), (:F {k: 2, v: 'b'})")
    q = "MATCH (n:F) WHERE n.k = $k RETURN n.v AS v"
    assert eng.query(q, {"k": 1}) == [{"v": "a"}]
    frags = dict(eng._fragment_cache)
    assert frags, "scan fragment not cached"
    assert eng.query(q, {"k": 2}) == [{"v": "b"}]
    # the second compile reused the SAME fragment objects (no rebuild)
    for key, val in frags.items():
        assert eng._fragment_cache[key] is val


def test_fragment_cache_invalidated_by_writes(spark):
    eng = CypherEngine(spark, GraphCatalog(spark), mutable=True)
    eng.query("CREATE (:G {k: 1})")
    q = "MATCH (n:G) WHERE n.k = $k RETURN count(*) AS c"
    assert eng.query(q, {"k": 1}) == [{"c": 1}]
    keys_before = set(eng._fragment_cache)
    eng.query("CREATE (:G {k: 1})")  # bumps catalog version
    assert eng.query(q, {"k": 1}) == [{"c": 2}]
    # stale-version fragments were dropped, fresh ones keyed anew
    assert not (set(eng._fragment_cache) & keys_before)

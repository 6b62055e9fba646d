"""Graph analytics tests on known small graphs."""

import pytest
from pyspark.sql import functions as F

from nicefox_graphdb_spark.operators import graph_algos as ga


@pytest.fixture(scope="module")
def chain_and_pair(spark):
    # components: {A,B,C} (path) and {D,E}
    return spark.createDataFrame(
        [("A", "B"), ("B", "C"), ("D", "E")], "src string, dst string"
    )


def test_degrees(chain_and_pair):
    rows = {r["id"]: r for r in ga.degrees(chain_and_pair).collect()}
    assert rows["A"]["out_degree"] == 1 and rows["A"]["in_degree"] == 0
    assert rows["B"]["degree"] == 2
    assert rows["E"]["in_degree"] == 1


def test_connected_components(chain_and_pair):
    comps = {
        r["id"]: r["component"]
        for r in ga.connected_components(chain_and_pair).collect()
    }
    assert comps == {"A": "A", "B": "A", "C": "A", "D": "D", "E": "D"}


def test_connected_components_long_chain(spark):
    # 200-node path: pointer jumping must converge well inside 20 iters
    edges = spark.createDataFrame(
        [(f"N{i:03d}", f"N{i + 1:03d}") for i in range(199)],
        "src string, dst string",
    )
    comps = ga.connected_components(edges).collect()
    assert {r["component"] for r in comps} == {"N000"}
    assert len(comps) == 200


def test_pagerank_cycle_uniform(spark):
    # 3-cycle: symmetric → every rank exactly 1.0
    edges = spark.createDataFrame(
        [("A", "B"), ("B", "C"), ("C", "A")], "src string, dst string"
    )
    ranks = {r["id"]: r["rank"] for r in ga.pagerank(edges, n_iter=10).collect()}
    assert all(abs(v - 1.0) < 1e-9 for v in ranks.values())


def test_pagerank_sum_preserved(chain_and_pair):
    total = (
        ga.pagerank(chain_and_pair, n_iter=10)
        .agg(F.sum("rank"))
        .collect()[0][0]
    )
    assert abs(total - 5.0) < 1e-6  # N vertices


def test_triangle_count(spark):
    # K3 plus a dangling edge: exactly one triangle
    edges = spark.createDataFrame(
        [("A", "B"), ("B", "C"), ("A", "C"), ("C", "D")],
        "src string, dst string",
    )
    assert ga.triangle_count(edges).collect()[0]["triangles"] == 1


def test_label_propagation_two_cliques(spark):
    tri1 = [("A", "B"), ("B", "C"), ("A", "C")]
    tri2 = [("X", "Y"), ("Y", "Z"), ("X", "Z")]
    edges = spark.createDataFrame(tri1 + tri2, "src string, dst string")
    labels = {r["id"]: r["label"] for r in ga.label_propagation(edges).collect()}
    assert len({labels["A"], labels["B"], labels["C"]}) == 1
    assert len({labels["X"], labels["Y"], labels["Z"]}) == 1
    assert labels["A"] != labels["X"]


def test_shortest_paths_chain(spark):
    edges = spark.createDataFrame(
        [("A", "B"), ("B", "C"), ("C", "D")], "src string, dst string"
    )
    srcs = spark.createDataFrame([("A",)], "start string")
    dists = {
        r["id"]: r["dist"]
        for r in ga.shortest_path_lengths(edges, srcs, max_hops=5).collect()
    }
    assert dists == {"A": 0, "B": 1, "C": 2, "D": 3}


def test_shortest_paths_prefers_min(spark):
    # diamond: A->B->D and A->C->D plus direct A->D: dist(D)=1
    edges = spark.createDataFrame(
        [("A", "B"), ("A", "C"), ("B", "D"), ("C", "D"), ("A", "D")],
        "src string, dst string",
    )
    srcs = spark.createDataFrame([("A",)], "start string")
    dists = {
        r["id"]: r["dist"]
        for r in ga.shortest_path_lengths(edges, srcs).collect()
    }
    assert dists["D"] == 1


def test_triangle_count_k4_and_hub(spark):
    """K4 has 4 triangles; adding a hub connected to every vertex (skewed
    star) turns each K4 edge into one more triangle (6) → 10 total. The
    degree-ordered orientation must count each exactly once."""
    from nicefox_graphdb_spark.operators import graph_algos as ga

    k4 = [(a, b) for a in "abcd" for b in "abcd" if a < b]
    hub = [("z", v) for v in "abcd"]
    edges = spark.createDataFrame(k4 + hub, ["src", "dst"])
    assert ga.triangle_count(edges).collect()[0]["triangles"] == 10


def test_triangle_count_random_vs_bruteforce(spark):
    """Seeded random graph: orientation count equals the brute-force
    canonical a<b<c join."""
    import random

    from nicefox_graphdb_spark.operators import graph_algos as ga

    rng = random.Random(7)
    nodes = [f"n{i}" for i in range(30)]
    edges = {
        tuple(sorted(rng.sample(nodes, 2)))
        for _ in range(120)
    }
    df = spark.createDataFrame(sorted(edges), ["src", "dst"])
    got = ga.triangle_count(df).collect()[0]["triangles"]
    und = df.selectExpr("src AS a", "dst AS b")
    e2 = df.selectExpr("src AS b", "dst AS c")
    e3 = df.selectExpr("src AS a", "dst AS c")
    brute = und.join(e2, "b").join(e3, ["a", "c"]).count()
    assert got == brute and got > 0


def test_triangle_count_ignores_self_loops_and_duplicates(spark):
    from nicefox_graphdb_spark.operators import graph_algos as ga

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("b", "c"), ("a", "c"), ("a", "a")],
        ["src", "dst"],
    )
    assert ga.triangle_count(edges).collect()[0]["triangles"] == 1


def test_connected_components_multipartition_paths(spark, monkeypatch):
    """Force BOTH the multilevel-coalesce path and the star-phase fallback
    (tiny per-partition row budget) on a cross-partition graph, against an
    independent python union-find oracle."""
    import random

    rng = random.Random(7)
    n = 400
    edges = []
    # 20 chains of 20 nodes, shuffled so partitions cut across chains
    for c in range(20):
        ids = [f"V{c:02d}_{i:02d}" for i in range(20)]
        edges += list(zip(ids, ids[1:]))
    rng.shuffle(edges)

    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            if rv < ru:
                ru, rv = rv, ru
            parent[rv] = ru
    expected = {}
    for u, v in edges:
        for x in (u, v):
            root = find(x)
            while parent[root] != root:
                root = parent[root]
            expected[x] = root

    df = spark.createDataFrame(edges, "src string, dst string").repartition(8)
    got = {
        r["id"]: r["component"] for r in ga.connected_components(df).collect()
    }
    assert got == expected and len(got) == n

    # star-phase fallback: budget so small every level refuses to coalesce
    monkeypatch.setattr(ga, "_CC_ROWS_PER_PART", 10)
    got2 = {
        r["id"]: r["component"]
        for r in ga.connected_components(df).collect()
    }
    assert got2 == expected

"""Multi-step real-world workflow tests on a mutable graph, modeled on the
reference's test/scenarios.test.ts (social network, catalog management)."""

import pytest

from nicefox_graphdb_spark import CypherEngine
from nicefox_graphdb_spark.catalog import GraphCatalog


@pytest.fixture()
def g(spark):
    return CypherEngine(spark, GraphCatalog(spark), mutable=True)


def test_social_network_workflow(g):
    # build a small social graph
    for name, age in [("alice", 31), ("bob", 28), ("carol", 40), ("dave", 23)]:
        g.query("CREATE (:User {name: $n, age: $a})", {"n": name, "a": age})
    for a, b, since in [
        ("alice", "bob", 2015),
        ("bob", "carol", 2018),
        ("carol", "dave", 2020),
        ("alice", "carol", 2021),
    ]:
        g.query(
            "MATCH (x:User {name: $a}), (y:User {name: $b}) "
            "CREATE (x)-[:FRIENDS {since: $s}]->(y)",
            {"a": a, "b": b, "s": since},
        )

    # direct friends of alice (either direction)
    rows = g.query(
        "MATCH (a:User {name: 'alice'})-[:FRIENDS]-(f:User) "
        "RETURN f.name AS friend ORDER BY friend"
    )
    assert [r["friend"] for r in rows] == ["bob", "carol"]

    # friends-of-friends excluding self and direct friends
    rows = g.query(
        "MATCH (a:User {name: 'alice'})-[:FRIENDS]-(f:User)-[:FRIENDS]-(fof:User) "
        "WHERE fof.name <> 'alice' AND NOT (a)-[:FRIENDS]-(fof) "
        "RETURN DISTINCT fof.name AS name ORDER BY name"
    )
    assert [r["name"] for r in rows] == ["dave"]

    # var-length reachability
    rows = g.query(
        "MATCH (a:User {name: 'alice'})-[:FRIENDS*1..3]->(r:User) "
        "RETURN DISTINCT r.name AS name ORDER BY name"
    )
    assert "dave" in {r["name"] for r in rows}

    # aggregation: average age of each user's out-friends
    rows = g.query(
        "MATCH (u:User)-[:FRIENDS]->(f:User) "
        "RETURN u.name AS name, round(avg(f.age), 1) AS avg_age ORDER BY name"
    )
    assert rows[0]["name"] == "alice" and rows[0]["avg_age"] == 34.0

    # update then verify
    g.query("MATCH (u:User {name: 'dave'}) SET u.age = u.age + 1")
    assert g.query("MATCH (u:User {name: 'dave'}) RETURN u.age AS a") == [{"a": 24}]

    # unfriend: delete one edge
    g.query(
        "MATCH (:User {name: 'alice'})-[r:FRIENDS]->(:User {name: 'carol'}) DELETE r"
    )
    rows = g.query(
        "MATCH (a:User {name: 'alice'})-[:FRIENDS]-(f) RETURN count(*) AS c"
    )
    assert rows == [{"c": 1}]


def test_catalog_management_workflow(g):
    g.query(
        "UNWIND $items AS it CREATE (:Product {sku: it.sku, price: it.price, cat: it.cat})",
        {
            "items": [
                {"sku": "a1", "price": 10.0, "cat": "tools"},
                {"sku": "a2", "price": 25.0, "cat": "tools"},
                {"sku": "b1", "price": 5.0, "cat": "toys"},
            ]
        },
    )
    # upsert: existing sku gets restocked flag, new sku created
    for sku in ["a1", "c9"]:
        g.query(
            "MERGE (p:Product {sku: $sku}) "
            "ON MATCH SET p.restocked = true "
            "ON CREATE SET p.price = 1.0, p.cat = 'misc'",
            {"sku": sku},
        )
    rows = g.query(
        "MATCH (p:Product) RETURN p.sku AS sku, p.restocked AS r ORDER BY sku"
    )
    assert {r["sku"]: r["r"] for r in rows} == {
        "a1": True,
        "a2": None,
        "b1": None,
        "c9": None,
    }
    # category rollup
    rows = g.query(
        "MATCH (p:Product) WITH p.cat AS cat, count(*) AS n, round(avg(p.price), 2) AS avg_price "
        "WHERE n >= 1 RETURN cat, n, avg_price ORDER BY cat"
    )
    assert [r["cat"] for r in rows] == ["misc", "tools", "toys"]
    # retire a category
    g.query("MATCH (p:Product {cat: 'toys'}) DETACH DELETE p")
    assert g.query("MATCH (p:Product) RETURN count(*) AS c") == [{"c": 3}]


def test_label_lifecycle(g):
    g.query("CREATE (:Doc {title: 't1', status: 'draft'})")
    g.query("MATCH (d:Doc {status: 'draft'}) SET d:Draft")
    assert g.query("MATCH (d:Draft) RETURN count(*) AS c") == [{"c": 1}]
    g.query("MATCH (d:Doc {status: 'draft'}) SET d.status = 'published' REMOVE d:Draft")
    assert g.query("MATCH (d:Draft) RETURN count(*) AS c") == [{"c": 0}]
    assert g.query("MATCH (d:Doc) RETURN d.status AS s") == [{"s": "published"}]


def test_mixed_read_write_pipeline(g):
    g.query(
        "UNWIND range(1, 10) AS i CREATE (:N {val: i, parity: i % 2})"
    )
    rows = g.query(
        "MATCH (n:N) WITH n.parity AS p, collect(n.val) AS vals "
        "RETURN p, size(vals) AS n, reduce(s = 0, v IN vals | s + v) AS total "
        "ORDER BY p"
    )
    assert rows == [
        {"p": 0, "n": 5, "total": 30},
        {"p": 1, "n": 5, "total": 25},
    ]

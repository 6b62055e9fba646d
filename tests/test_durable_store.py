"""DurableGraph — durability, restart recovery, and merge pruning.

The reference persists every write to a SQLite file and recovers it on
reopen (src/db.ts:47-70, src/local.ts:22-45); these tests assert the same
contract for the bucketed-parquet store, plus the scale property the
reference never needed: a keyed MERGE rewrites only the touched buckets.
"""

import json
import os

import pytest

from nicefox_graphdb_spark import CypherEngine, GraphCatalog
from pyspark.sql import functions as F

from nicefox_graphdb_spark.durable_store import DurableTableStore, node_key


def _engine(spark, path):
    return CypherEngine(spark, GraphCatalog(spark), data_path=str(path))


def test_restart_recovers_nodes_edges_and_labels(spark, tmp_path):
    p = tmp_path / "g"
    e1 = _engine(spark, p)
    e1.query("CREATE (a:Person {name: 'A', age: 30})-[:KNOWS {since: 2020}]->(b:Person {name: 'B'})")
    e1.query("MATCH (n:Person {name: 'A'}) SET n:Admin")

    # a brand-new engine + catalog over the same path sees everything
    e2 = _engine(spark, p)
    rows = e2.query(
        "MATCH (a:Person)-[r:KNOWS]->(b:Person) "
        "RETURN a.name AS a, r.since AS s, b.name AS b"
    )
    assert rows == [{"a": "A", "s": 2020, "b": "B"}]
    # multi-label membership survives the restart (manifest flag)
    assert e2.query(
        "MATCH (n:Admin) RETURN join(labels(n), '|') AS ls"
    ) == [{"ls": "Admin|Person"}]


def test_restart_sees_updates_and_deletes(spark, tmp_path):
    p = tmp_path / "g"
    e1 = _engine(spark, p)
    e1.query("CREATE (:Item {name: 'x', price: 1})")
    e1.query("CREATE (:Item {name: 'y', price: 2})")
    e1.query("MATCH (n:Item {name: 'x'}) SET n.price = 99")
    e1.query("MATCH (n:Item {name: 'y'}) DELETE n")

    e2 = _engine(spark, p)
    assert e2.query(
        "MATCH (n:Item) RETURN n.name AS name, n.price AS price"
    ) == [{"name": "x", "price": 99}]


def test_merge_on_match_durable(spark, tmp_path):
    p = tmp_path / "g"
    e1 = _engine(spark, p)
    e1.query("MERGE (n:C {k: 1}) ON CREATE SET n.v = 'created'")
    e1.query("MERGE (n:C {k: 1}) ON MATCH SET n.v = 'matched'")
    e1.query("MERGE (n:C {k: 2}) ON CREATE SET n.v = 'created'")
    e2 = _engine(spark, p)
    assert e2.query(
        "MATCH (n:C) RETURN n.k AS k, n.v AS v ORDER BY k"
    ) == [{"k": 1, "v": "matched"}, {"k": 2, "v": "created"}]


def test_update_rewrites_only_touched_buckets(spark, tmp_path):
    """The 100 TB property: a keyed SET must leave untouched buckets'
    files byte-identical in the manifest (file skipping, Delta-style)."""
    p = tmp_path / "g"
    eng = _engine(spark, p)
    eng.query(
        "UNWIND range(0, 199) AS i CREATE (:N {k: i, v: 0})"
    )
    store = eng.store.tables
    key = node_key("N")
    before = dict(store.manifest["tables"][key]["buckets"])
    # update exactly one node → its _id hashes to exactly one bucket
    eng.query("MATCH (n:N {k: 7}) SET n.v = 1")
    after = store.manifest["tables"][key]["buckets"]
    changed = [b for b in set(before) | set(after)
               if before.get(b) != after.get(b)]
    assert len(changed) == 1, f"expected 1 rewritten bucket, got {changed}"
    # and the data is correct
    assert eng.query(
        "MATCH (n:N) WHERE n.v = 1 RETURN n.k AS k"
    ) == [{"k": 7}]
    assert eng.query(
        "MATCH (n:N) WHERE n.v = 0 RETURN count(*) AS c"
    ) == [{"c": 199}]


def test_append_does_not_rewrite_existing_files(spark, tmp_path):
    p = tmp_path / "g"
    eng = _engine(spark, p)
    eng.query("CREATE (:A {k: 1})")
    store = eng.store.tables
    key = node_key("A")
    before = {f for fs in store.manifest["tables"][key]["buckets"].values()
              for f in fs}
    eng.query("CREATE (:A {k: 2})")
    after = {f for fs in store.manifest["tables"][key]["buckets"].values()
             for f in fs}
    assert before <= after  # old files still referenced, only added to


def test_bucket_compaction_bounds_file_count(spark, tmp_path):
    store = DurableTableStore(
        spark, str(tmp_path / "t"), n_buckets=1, compact_threshold=3
    )
    from pyspark.sql import types as T

    schema = T.StructType([T.StructField("_id", T.StringType())])
    store.create_table("nodes/X", {"kind": "node", "label": "X"}, schema)
    for i in range(10):
        store.append(
            "nodes/X", spark.createDataFrame([(f"id{i}",)], schema)
        )
        store.commit()
    files = store.manifest["tables"]["nodes/X"]["buckets"]["0"]
    assert len(files) <= 3 + 1  # compaction keeps the bucket bounded
    assert store.read_table("nodes/X").count() == 10


def test_adopt_bulk_table_then_mutate(spark, tmp_path):
    """A parquet-registered (bulk) table becomes durable on first write."""
    from pyspark.sql import Row

    cat = GraphCatalog(spark)
    cat.register_node(
        "Bulk", spark.createDataFrame([Row(_id="b1", v=1), Row(_id="b2", v=2)])
    )
    eng = CypherEngine(spark, cat, data_path=str(tmp_path / "g"))
    eng.query("MATCH (n:Bulk {v: 1}) SET n.v = 10")
    assert eng.query(
        "MATCH (n:Bulk) RETURN n.v AS v ORDER BY v"
    ) == [{"v": 2}, {"v": 10}]
    # recovery includes the adopted table
    e2 = CypherEngine(spark, GraphCatalog(spark), data_path=str(tmp_path / "g"))
    assert e2.query(
        "MATCH (n:Bulk) RETURN n.v AS v ORDER BY v"
    ) == [{"v": 2}, {"v": 10}]


def test_detach_delete_durable(spark, tmp_path):
    p = tmp_path / "g"
    e1 = _engine(spark, p)
    e1.query("CREATE (a:U {n: 'a'})-[:R]->(b:U {n: 'b'})")
    e1.query("MATCH (n:U {n: 'a'}) DETACH DELETE n")
    e2 = _engine(spark, p)
    assert e2.query("MATCH (n:U) RETURN n.n AS n") == [{"n": "b"}]
    assert e2.query("MATCH ()-[r:R]->() RETURN count(*) AS c") == [{"c": 0}]


def test_commit_is_atomic_versioned(spark, tmp_path):
    p = tmp_path / "g"
    eng = _engine(spark, p)
    eng.query("CREATE (:V {k: 1})")
    v1 = eng.store.tables.manifest["version"]
    eng.query("CREATE (:V {k: 2})")
    v2 = eng.store.tables.manifest["version"]
    assert v2 > v1
    mdir = p / "_manifest"
    current = (mdir / "CURRENT").read_text().strip()
    m = json.loads((mdir / current).read_text())
    assert m["version"] == v2
    # every referenced file exists on disk
    for key, t in m["tables"].items():
        for files in t["buckets"].values():
            for f in files:
                assert os.path.exists(p / "data" / key / f)


def test_vacuum_removes_orphaned_files(spark, tmp_path):
    p = tmp_path / "g"
    eng = _engine(spark, p)
    eng.query("UNWIND range(0, 20) AS i CREATE (:W {k: i})")
    eng.query("MATCH (n:W) SET n.k = n.k + 100")  # rewrites all buckets
    removed = eng.store.tables.vacuum()
    assert removed > 0
    # table still fully readable after vacuum
    assert eng.query("MATCH (n:W) RETURN count(*) AS c") == [{"c": 21}]


def test_null_property_persists(spark, tmp_path):
    # parquet can't store void columns; all-null props persist as string
    p = tmp_path / "g"
    e1 = _engine(spark, p)
    e1.query("CREATE (:Z {a: 1, b: null})")
    e2 = _engine(spark, p)
    assert e2.query("MATCH (n:Z) RETURN n.a AS a, n.b AS b") == [
        {"a": 1, "b": None}
    ]


def test_replace_buckets_validates_before_mutating(spark, tmp_path):
    """Rows outside the touched set must raise BEFORE the in-memory bucket
    map changes — a caller that catches the error and later commits must
    not persist a half-updated manifest (ADVICE r4 #5)."""
    import copy

    from pyspark.sql import types as T

    store = DurableTableStore(spark, str(tmp_path / "rb"), n_buckets=4)
    schema = T.StructType([T.StructField("_id", T.StringType())])
    store.create_table("nodes/Y", {"kind": "node", "label": "Y"}, schema)
    ids = [f"id{i}" for i in range(20)]
    store.append("nodes/Y", spark.createDataFrame([(i,) for i in ids], schema))
    store.commit()
    before = copy.deepcopy(store.manifest["tables"]["nodes/Y"]["buckets"])
    # pick one real bucket, then feed replace_buckets the FULL table so
    # some rows hash outside the touched set
    touched = [int(next(iter(before)))]
    full = store.read_table("nodes/Y")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="outside touched"):
        store.replace_buckets("nodes/Y", touched, full)
    assert store.manifest["tables"]["nodes/Y"]["buckets"] == before
    store.commit()  # committing after the failed call stays consistent
    reopened = DurableTableStore(spark, str(tmp_path / "rb"), n_buckets=4)
    assert sorted(
        r._id for r in reopened.read_table("nodes/Y").collect()
    ) == sorted(ids)


def test_hadoop_commit_plane_roundtrip(spark, tmp_path):
    """The same store logic through the Hadoop FileSystem commit plane
    (file:// scheme here; hdfs:// at deploy) — write, commit, reopen,
    recover, vacuum."""
    from pyspark.sql import types as T

    from nicefox_graphdb_spark.commit_plane import HadoopCommitPlane

    root = "file://" + str(tmp_path / "hfs")
    fs = HadoopCommitPlane(spark, root)
    store = DurableTableStore(spark, root, n_buckets=4, fs=fs)
    schema = T.StructType(
        [
            T.StructField("_id", T.StringType()),
            T.StructField("v", T.LongType()),
        ]
    )
    store.create_table("nodes/H", {"kind": "node", "label": "H"}, schema)
    store.append(
        "nodes/H",
        spark.createDataFrame([(f"h{i}", i) for i in range(10)], schema),
    )
    store.commit()
    # rewrite a touched subset, commit again
    touched = store.touched_buckets(
        spark.createDataFrame([("h1",), ("h2",)], "struct<_id:string>")
    )
    updated = store.read_table("nodes/H", touched).withColumn(
        "v", F.col("v") + 100
    )
    store.replace_buckets("nodes/H", touched, updated)
    store.commit()
    # reopen through a fresh plane: recovery must see both commits
    reopened = DurableTableStore(
        spark, root, fs=HadoopCommitPlane(spark, root)
    )
    rows = {r._id: r.v for r in reopened.read_table("nodes/H").collect()}
    assert rows["h1"] == 101 and rows["h2"] == 102
    assert len(rows) == 10
    assert reopened.vacuum() >= 0  # old files drop cleanly via the plane


def test_load_falls_back_to_newest_version_when_current_missing(
    spark, tmp_path
):
    """Crash between manifest publish and CURRENT swing: reopen adopts the
    newest atomic manifest version."""
    import os as _os

    from pyspark.sql import types as T

    root = str(tmp_path / "crash")
    store = DurableTableStore(spark, root, n_buckets=2)
    schema = T.StructType([T.StructField("_id", T.StringType())])
    store.create_table("nodes/C", {"kind": "node", "label": "C"}, schema)
    store.append(
        "nodes/C", spark.createDataFrame([("c1",), ("c2",)], schema)
    )
    store.commit()
    _os.remove(_os.path.join(root, "_manifest", "CURRENT"))
    reopened = DurableTableStore(spark, root)
    assert reopened.read_table("nodes/C").count() == 2

"""Versioned snapshot sink tests (reference backup suite analog:
src/backup.ts create/list/clean/status + restore)."""

import pytest

from nicefox_graphdb_spark import CypherEngine
from nicefox_graphdb_spark.catalog import GraphCatalog
from nicefox_graphdb_spark.sources import (
    clean_old_snapshots,
    list_snapshots,
    load_snapshot,
    snapshot_graph,
    snapshot_status,
)


@pytest.fixture()
def small_graph(spark):
    eng = CypherEngine(spark, GraphCatalog(spark), mutable=True)
    eng.query("CREATE (:P {name: 'a', v: 1})-[:T {w: 2}]->(:Q {name: 'b'})")
    eng.query("CREATE (:P {name: 'c', v: 3})")
    return eng


def test_snapshot_roundtrip(spark, small_graph, tmp_path):
    bdir = str(tmp_path / "backups")
    res = snapshot_graph(small_graph.catalog, bdir)
    assert res.success and res.version == 1 and res.tables == 3
    restored = load_snapshot(spark, bdir)
    eng2 = CypherEngine(spark, restored)
    rows = eng2.query(
        "MATCH (p:P)-[r:T]->(q:Q) RETURN p.name AS p, r.w AS w, q.name AS q"
    )
    assert rows == [{"p": "a", "w": 2, "q": "b"}]
    assert eng2.query("MATCH (p:P) RETURN count(*) AS c") == [{"c": 2}]


def test_snapshot_versions_and_retention(spark, small_graph, tmp_path):
    bdir = str(tmp_path / "backups")
    for _ in range(3):
        assert snapshot_graph(small_graph.catalog, bdir).success
    assert len(list_snapshots(bdir)) == 3
    status = snapshot_status(bdir)
    assert status.total_snapshots == 3 and status.versions == [3, 2, 1]
    assert clean_old_snapshots(bdir, keep=1) == 2
    assert snapshot_status(bdir).versions == [3]
    # keep= prunes inline too
    res = snapshot_graph(small_graph.catalog, bdir, keep=1)
    assert res.success and res.version == 4
    assert snapshot_status(bdir).versions == [4]
    # restore a specific (current) version by number
    restored = load_snapshot(spark, bdir, version=4)
    assert sorted(restored.labels) == ["P", "Q"]


def test_load_snapshot_missing(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        load_snapshot(spark, str(tmp_path / "nothing"))


def test_scheduler_tick_snapshots_and_prunes(spark, small_graph, tmp_path):
    """Scheduled-tick parity with running the reference BackupManager on a
    timer: every tick snapshots each registered catalog and prunes to
    `keep` (reference cleanOldBackups, src/backup.ts:147-167)."""
    from nicefox_graphdb_spark.sources import (
        SnapshotScheduler,
        snapshot_status,
    )

    sched = SnapshotScheduler(str(tmp_path / "sched"), keep=2)
    sched.register("projA", small_graph.catalog)
    for _ in range(4):
        results = sched.tick()
        assert all(r.success for r in results)
    assert sched.ticks == 4
    # retention pruned to the 2 newest versions
    st = snapshot_status(str(tmp_path / "sched" / "projA"))
    assert st.total_snapshots == 2 and st.versions == [4, 3]


def test_scheduler_interval_loop_fires(spark, small_graph, tmp_path):
    import time as _time

    from nicefox_graphdb_spark.sources import SnapshotScheduler, list_snapshots

    sched = SnapshotScheduler(str(tmp_path / "loop"), keep=3, interval_s=0.3)
    sched.register("p", small_graph.catalog)
    sched.start()
    try:
        deadline = _time.time() + 30
        while sched.ticks == 0 and _time.time() < deadline:
            _time.sleep(0.1)
    finally:
        sched.stop()
    assert sched.ticks >= 1
    assert len(list_snapshots(str(tmp_path / "loop" / "p"))) >= 1
    assert all(r.success for r in sched.last_results)

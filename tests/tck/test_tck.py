"""TCK-style conformance runner (see gherkin.py for provenance).

Every ``features/*.feature`` scenario runs against a fresh empty mutable
graph. Scenarios listed in ``known_failing.txt`` are expected failures
(xfail) — the conformance bar is everything else passing, mirroring the
reference's pass-list discipline (test/tck/failing-tests.ts)."""

from __future__ import annotations

import importlib.util
import math
import os

import pytest

_spec = importlib.util.spec_from_file_location(
    "tck_gherkin", os.path.join(os.path.dirname(__file__), "gherkin.py")
)
_gherkin = importlib.util.module_from_spec(_spec)
import sys as _sys

_sys.modules["tck_gherkin"] = _gherkin
_spec.loader.exec_module(_gherkin)
parse_feature = _gherkin.parse_feature

FEATURE_DIR = os.path.join(os.path.dirname(__file__), "features")
KNOWN_FAILING_PATH = os.path.join(os.path.dirname(__file__), "known_failing.txt")


def _load_scenarios():
    # NICEFOX_TCK_SHARD="i/n" runs only every n-th feature file (offset i):
    # lets CI-style drivers split the corpus across parallel pytest
    # processes (each with its own SparkSession) without -k gymnastics
    shard = os.environ.get("NICEFOX_TCK_SHARD")
    idx, mod = (int(x) for x in shard.split("/")) if shard else (0, 1)
    out = []
    for j, fn in enumerate(sorted(os.listdir(FEATURE_DIR))):
        if not fn.endswith(".feature") or j % mod != idx:
            continue
        with open(os.path.join(FEATURE_DIR, fn)) as f:
            out.extend(parse_feature(f.read(), fn[:-8]))
    return out


def _known_failing() -> set[str]:
    if not os.path.exists(KNOWN_FAILING_PATH):
        return set()
    with open(KNOWN_FAILING_PATH) as f:
        return {
            ln.strip()
            for ln in f
            if ln.strip() and not ln.strip().startswith("#")
        }


SCENARIOS = _load_scenarios()
KNOWN_FAILING = _known_failing()


def _freeze(v):
    if isinstance(v, dict):
        return ("m",) + tuple(sorted((k, _freeze(x)) for k, x in v.items()))
    if isinstance(v, (list, tuple)):
        return ("l",) + tuple(_freeze(x) for x in v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        if v == int(v) and abs(v) < 1e15:
            # TCK floats print canonically; 2.0 == 2.0 regardless of source
            return ("f", int(v))
        return ("f", round(v, 9))
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, int):
        return ("i", v)
    if v is None:
        return ("0",)
    return ("s", str(v))


def _norm_rows(rows: list[dict]) -> list:
    return [_freeze(r) for r in rows]


@pytest.mark.tck
@pytest.mark.parametrize("sc", SCENARIOS, ids=[s.id for s in SCENARIOS])
def test_tck_scenario(sc, spark):
    if sc.id in KNOWN_FAILING:
        pytest.xfail("listed in known_failing.txt")
    from nicefox_graphdb_spark import CypherEngine
    from nicefox_graphdb_spark.catalog import GraphCatalog
    from nicefox_graphdb_spark.cypher.expressions import CypherCompileError
    from nicefox_graphdb_spark.cypher.parser import CypherSyntaxError

    eng = CypherEngine(spark, GraphCatalog(spark), mutable=True)
    for q in sc.setup:
        eng.query(q)

    if sc.expect_kind in ("syntax_error", "error", "error_at"):
        expected_exc = (
            (CypherSyntaxError, CypherCompileError)
            if sc.expect_kind == "syntax_error"
            else Exception
        )
        with pytest.raises(expected_exc) as exc_info:
            eng.query(sc.query, sc.params or None)
        if sc.expect_kind == "error_at":
            # structured position parity (r10, VERDICT r9 #6): the raised
            # error must carry the asserted (line, col) attributes — the
            # same fields engine.query_response surfaces in its envelope
            e = exc_info.value
            got = (getattr(e, "line", None), getattr(e, "col", None))
            assert got == sc.error_pos, (
                f"expected error at {sc.error_pos}, got {got}: {e}"
            )
        return

    got = eng.query(sc.query, sc.params or None)
    if sc.expect_kind == "empty":
        assert got == [], f"expected empty result, got {got}"
        return
    # project/rename to expected column order (engine preserves aliases)
    assert got == [] or set(sc.columns) <= set(got[0].keys()), (
        f"columns {sorted(got[0].keys()) if got else []} missing expected "
        f"{sc.columns}"
    )
    got_rows = [{c: r.get(c) for c in sc.columns} for r in got]
    if sc.expect_kind == "rows_in_order":
        assert _norm_rows(got_rows) == _norm_rows(sc.rows), (
            f"\nquery: {sc.query}\ngot:      {got_rows}\nexpected: {sc.rows}"
        )
    else:
        assert sorted(map(repr, _norm_rows(got_rows))) == sorted(
            map(repr, _norm_rows(sc.rows))
        ), f"\nquery: {sc.query}\ngot:      {got_rows}\nexpected: {sc.rows}"

"""Pytest pins for the five gates beyond the driver's 50-entry artifact
window (VERDICT r10 "What's wrong" #2 / "Next round" #3).

The external driver records only the first 50 ``queries()`` entries, so a
regression in the frozen tail — q_three_hop, q_avg_order_value, q_tpch_q3,
q_token_counts, q_degrees — would be invisible to CORRECTNESS_r{N}.json.
This module runs exactly those five through the same compare path the local
mirror uses (scripts/check_correctness.py: row count + sorted-column schema
+ order-insensitive value equality vs the DuckDB oracle) at sf0.001, so the
suite fails if any tail gate drifts.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from check_correctness import TABLES, compare  # noqa: E402

from tests.conftest import SF_DIR

TAIL_GATES = [
    "q_three_hop",
    "q_avg_order_value",
    "q_tpch_q3",
    "q_token_counts",
    "q_degrees",
]


@pytest.fixture(scope="module")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def test_tail_gates_are_beyond_driver_window():
    """If the frozen order changes and these land inside the first 50,
    this pin is redundant (fine) — but if a tail gate disappears from
    queries() entirely, fail loudly here rather than silently."""
    import __spark_entry__ as entrymod

    names = list(entrymod.queries())
    for g in TAIL_GATES:
        assert g in names, f"{g} dropped from queries()"
    beyond = [g for g in TAIL_GATES if names.index(g) >= 50]
    assert beyond == TAIL_GATES, (
        "frozen gate order changed — update TAIL_GATES or the freeze "
        f"comment in __spark_entry__.py (now inside window: "
        f"{[g for g in TAIL_GATES if g not in beyond]})"
    )


@pytest.mark.parametrize("name", TAIL_GATES)
def test_tail_gate_matches_oracle(spark, duck, name):
    import __spark_entry__ as entrymod

    sdf = entrymod.queries()[name](spark, SF_DIR)
    spark_cols = sdf.columns
    spark_rows = [r.asDict(recursive=True) for r in sdf.collect()]
    rel = duck.sql(entrymod.oracle_sql()[name])
    oracle_cols = rel.columns
    oracle_rows = [dict(zip(oracle_cols, row)) for row in rel.fetchall()]
    verdict, detail = compare(
        name, spark_rows, spark_cols, oracle_rows, oracle_cols
    )
    assert verdict == "MATCH", f"{name}: {verdict} {detail}"
    assert spark_rows, f"{name}: vacuous 0-row gate at sf0.001"

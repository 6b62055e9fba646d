"""Differential + fuzz tests.

- Text operators run on a seeded random corpus through BOTH engines
  (Spark Columns vs DuckDB SQL) and must agree exactly — the generator-based
  analogue of the reference's parser-fuzzing layer (test/security.test.ts).
- The Cypher parser must either parse or raise CypherSyntaxError on
  arbitrary garbage — never crash with anything else.
"""

import random
import string

import duckdb
import pytest
from pyspark.sql import functions as F

from nicefox_graphdb_spark.cypher.parser import CypherSyntaxError, parse
from nicefox_graphdb_spark.operators import text as tx

_TOK_SQL = (
    "list_filter(regexp_split_to_array(lower(t), '[^a-z0-9'']+'), x -> x <> '')"
)


def _random_corpus(n=300, seed=1234):
    rng = random.Random(seed)
    words = ["the", "of", "el", "la", "data", "spark", "x1", "O'Brien", "Ümlaut"]
    out = []
    for i in range(n):
        kind = rng.randrange(5)
        if kind == 0:
            s = " ".join(rng.choices(words, k=rng.randrange(0, 30)))
        elif kind == 1:
            s = "".join(
                rng.choices(string.printable.replace("\x0b", "").replace("\x0c", ""), k=rng.randrange(0, 80))
            )
        elif kind == 2:
            s = ("  \t " + rng.choice(words)) * rng.randrange(0, 5)
        elif kind == 3:
            s = rng.choice(["", " ", "\n", "...", "!!!", "1234", "a" * 200])
        else:
            s = " ".join(
                rng.choice(words) + rng.choice(["", ",", ".", "!", "?"])
                for _ in range(rng.randrange(1, 15))
            )
        out.append((i, s.replace("\r", " ").replace("\n", " ")))
    return out


def test_text_ops_differential_vs_duckdb(spark):
    corpus = _random_corpus()
    df = spark.createDataFrame(corpus, "i long, t string")
    got = {
        r["i"]: (r["tc"], r["fp"])
        for r in df.select(
            "i",
            tx.token_count(F.col("t")).alias("tc"),
            tx.fingerprint(F.col("t")).alias("fp"),
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE c (i BIGINT, t VARCHAR)"
    )
    con.executemany("INSERT INTO c VALUES (?, ?)", corpus)
    want = {
        row[0]: (row[1], row[2])
        for row in con.execute(
            f"SELECT i, CAST(len({_TOK_SQL}) AS BIGINT), "
            f"md5(array_to_string(list_sort(list_distinct({_TOK_SQL})), ' ')) "
            "FROM c"
        ).fetchall()
    }
    mismatches = {i: (got[i], want[i]) for i in got if got[i] != want[i]}
    assert not mismatches, f"{len(mismatches)} mismatches, e.g. {list(mismatches.items())[:3]}"


def test_parser_fuzz_no_crashes():
    rng = random.Random(99)
    fragments = [
        "MATCH", "RETURN", "(", ")", "[", "]", "{", "}", "-", ">", "<",
        "WHERE", "n", ":", "Label", "'str", "'str'", "1.5", "..", "*", "|",
        "AND", "CASE", "END", "$p", ",", "=", "//", "/*", "`", "WITH", "AS",
    ]
    parsed = errors = 0
    for _ in range(500):
        q = " ".join(rng.choices(fragments, k=rng.randrange(1, 15)))
        try:
            parse(q)
            parsed += 1
        except CypherSyntaxError:
            errors += 1
        # anything else (IndexError, RecursionError, ...) fails the test
    assert parsed + errors == 500
    assert errors > 0  # garbage mostly shouldn't parse


def test_parser_fuzz_random_bytes():
    rng = random.Random(7)
    for _ in range(300):
        q = "".join(chr(rng.randrange(32, 1000)) for _ in range(rng.randrange(0, 60)))
        try:
            parse(q)
        except CypherSyntaxError:
            pass


def test_repetition_ratio_differential_vs_duckdb(spark):
    """repetition_ratio over a pathological random corpus (unicode, empty,
    punctuation-only, repeated boilerplate) must match the DuckDB
    re-implementation of the same formula exactly."""
    corpus = _random_corpus(seed=777)
    df = spark.createDataFrame(corpus, "i long, t string")
    got = {
        r["i"]: r["rep"]
        for r in df.select(
            "i", tx.repetition_ratio(F.col("t"), 2).alias("rep")
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE c (i BIGINT, t VARCHAR)")
    con.executemany("INSERT INTO c VALUES (?, ?)", corpus)
    rows = con.execute(
        f"""
        WITH g AS (SELECT i, len({_TOK_SQL}) - 1 AS cnt,
                          list_transform(
                              range(1, greatest(len({_TOK_SQL}) - 1, 1) + 1),
                              x -> array_to_string(
                                  list_slice({_TOK_SQL}, x, x + 1), ' ')
                          ) AS grams
                   FROM c)
        SELECT i, CASE WHEN cnt > 0
                       THEN round(1.0 - len(list_distinct(grams)) / cnt, 6)
                       ELSE 0.0 END
        FROM g"""
    ).fetchall()
    ref = dict(rows)
    assert set(got) == set(ref)
    bad = {i: (got[i], ref[i]) for i in got if abs(got[i] - ref[i]) > 1e-9}
    assert not bad, f"diverged: {dict(list(bad.items())[:5])}"

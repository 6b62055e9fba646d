"""Pins for scripts/differential_oracles.py — the independent ground truths
behind the two no-SQL gates (q_sig_dedup, q_ann_search) and the unrolled
DuckDB PageRank oracle.

The differential oracles are only as good as their independence: these tests
verify the from-spec pure-python XXH64 and the token/simhash mirrors agree
with Spark's implementations on adversarial inputs (every length-class
branch of XXH64, unicode, chained seeds), so a drift in either side fails
loudly here rather than silently weakening the gate."""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from differential_oracles import (  # noqa: E402
    _M64,
    _signed64,
    simhash_sig_py,
    tokens_py,
    xxh64,
    xxh64_long,
    xxh64_str,
)

STRINGS = [
    "", "a", "abc", "hello world",
    "x" * 7, "y" * 8, "z" * 15, "w" * 16,      # 4-byte / 8-byte tail edges
    "q" * 31, "r" * 32, "s" * 33, "t" * 63,    # 32-byte block boundary
    "u" * 100, "naïve café 北京", "don't",
]


def test_xxh64_matches_spark_strings(spark):
    df = spark.createDataFrame([(s,) for s in STRINGS], "s string").select(
        "s", F.xxhash64("s").alias("h")
    )
    for r in df.collect():
        assert xxh64_str(r["s"]) == r["h"], repr(r["s"])


def test_xxh64_matches_spark_longs(spark):
    longs = [0, 1, -1, 42, 2**62, -(2**63), 123456789]
    df = spark.createDataFrame([(v,) for v in longs], "v long").select(
        "v", F.xxhash64("v").alias("h")
    )
    for r in df.collect():
        assert xxh64_long(r["v"]) == r["h"], r["v"]


def test_xxh64_chained_seed_matches_spark(spark):
    """xxhash64(lit(i), s) chains: the long's hash seeds the string's —
    exactly how dedup.minhash_signature derives its k hash functions."""
    rows = [(i, s) for i in (0, 1, 5) for s in STRINGS[:6]]
    df = spark.createDataFrame(rows, "i long, s string").select(
        "i", "s", F.xxhash64("i", "s").alias("h")
    )
    for r in df.collect():
        seed = xxh64((r["i"] & _M64).to_bytes(8, "little"), 42)
        assert _signed64(xxh64(r["s"].encode(), seed)) == r["h"]


def test_simhash_mirror_matches_spark(spark):
    from nicefox_graphdb_spark.operators import dedup as dd
    from nicefox_graphdb_spark.operators import text as tx

    rows = [
        (1, "The quick brown fox jumps over the lazy dog"),
        (2, "completely different content about spark engines"),
        (3, "don't stop believing 123"),
        (4, "the the the repeated repeated tokens"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    base = (
        df.select("doc_id", tx.tokens(F.col("text")).alias("toks"))
        .select("doc_id", dd.simhash_votes(F.col("toks")).alias("votes"))
        .select("doc_id", dd.pack_votes(F.col("votes")).alias("sig"))
    )
    texts = dict(rows)
    for r in base.collect():
        assert simhash_sig_py(tokens_py(texts[r["doc_id"]])) == r["sig"]


def test_tokens_mirror_matches_spark(spark):
    from nicefox_graphdb_spark.operators import text as tx

    samples = ["Hello, World! it's 42", "  ", "ONE-two_three", "ça va 北京 ok"]
    df = spark.createDataFrame([(s,) for s in samples], "s string").select(
        "s", tx.tokens(F.col("s")).alias("t")
    )
    for r in df.collect():
        assert tokens_py(r["s"]) == r["t"], repr(r["s"])


def _gate_rows_and_con(spark, name):
    duckdb = pytest.importorskip("duckdb")
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import __spark_entry__ as entrymod

    sf_dir = os.environ.get("NICEFOX_TEST_SF_DIR", "/root/testdata/sf0.001")
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    rows = [
        r.asDict(recursive=True)
        for r in entrymod.queries()[name](spark, sf_dir).collect()
    ]
    return rows, con, sf_dir


def test_diff_sig_dedup_passes_on_gate_output(spark):
    """The q_sig_dedup differential oracle (minhash precision/recall vs
    DuckDB exact Jaccard + simhash exact set equality at hamming<=3)
    passes end-to-end on the real gate output."""
    from differential_oracles import diff_sig_dedup

    rows, con, sf = _gate_rows_and_con(spark, "q_sig_dedup")
    ok, details = diff_sig_dedup(rows, con, sf)
    assert ok, details
    assert any("EXACT set equality" in d for d in details), details


def test_diff_ann_search_passes_on_gate_output(spark):
    """The q_ann_search differential oracle (LSH precision 1.0 + recall
    >= 0.8 vs numpy exact cosine; IVF recall + score parity) passes
    end-to-end on the real gate output."""
    from differential_oracles import diff_ann_search

    rows, con, sf = _gate_rows_and_con(spark, "q_ann_search")
    ok, details = diff_ann_search(rows, con, sf)
    assert ok, details


def test_pagerank_duckdb_oracle_matches_gate(spark):
    """The unrolled-CTE DuckDB oracle reproduces the Spark power iteration
    bit-for-bit after the shared round-6 (sf0.001; the sf0.01 run is the
    check_correctness gate itself)."""
    duckdb = pytest.importorskip("duckdb")
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import __spark_entry__ as entrymod

    sf_dir = os.environ.get("NICEFOX_TEST_SF_DIR", "/root/testdata/sf0.001")
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet')"
    )
    oracle = con.sql(entrymod.oracle_sql()["q_pagerank"]).fetchall()
    got = [
        (r["id"], r["rank"])
        for r in entrymod.queries()["q_pagerank"](spark, sf_dir).collect()
    ]
    assert got == [tuple(r) for r in oracle]

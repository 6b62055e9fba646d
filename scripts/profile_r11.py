#!/usr/bin/env python
"""Round-11 phase decomposition probes (guide §1.4/§1.5: noop sink + labels).

Usage: python scripts/profile_r11.py <probe> [...]
Probes: jaccard, write, cc, text, stream, topk
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def _timed(spark, label, fn, n=3):
    # warm once, then median-ish best-of-n
    fn()
    ts = []
    for _ in range(n):
        spark.sparkContext.setJobDescription(label)
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
        spark.sparkContext.setJobDescription(None)
    ts.sort()
    print(f"{label:55s} {ts[len(ts)//2]*1000:9.1f} ms  (min {ts[0]*1000:.1f})")
    return ts[len(ts) // 2]


def probe_jaccard(spark):
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    import __spark_entry__ as entry
    from nicefox_graphdb_spark.operators import dedup as dd

    docs = entry._tables(spark, SF_DIR)["documents"]
    threshold = 0.2

    # full operator
    _timed(spark, "jaccard: full collect()", lambda: entry._p_ngram_jaccard(spark, SF_DIR).collect())

    # phase 1: base materialization (tokenize+shingle+hash+checkpoint)
    def mk_base():
        obs = Observation()
        base = (
            docs.select(F.col("doc_id").alias("id"), dd.word_shingles(F.col("text"), 3).alias("sh"))
            .withColumn("sz", F.size("sh"))
            .withColumn("hsh", F.transform("sh", lambda s: F.xxhash64(s)))
            .drop("sh")
            .observe(obs, F.count(F.lit(1)).alias("__n"))
            .localCheckpoint(eager=True)
        )
        return base, obs.get["__n"]

    _timed(spark, "jaccard: phase1 base checkpoint", lambda: mk_base())

    base, n_base = mk_base()

    # phase 2: freq + canon + pref checkpoint
    inv = base.select("id", F.explode("hsh").alias("shingle"))
    freq = inv.groupBy("shingle").agg(F.count("*").alias("f"))
    canon = (
        inv.join(freq, on="shingle")
        .groupBy("id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("f", "shingle"))),
                lambda x: x.getField("shingle"),
            ).alias("canon")
        )
    )
    prefix_len = F.col("sz") - F.ceil(F.lit(threshold) * F.col("sz")).cast("int") + 1

    def mk_pref():
        return (
            base.select("id", "sz")
            .join(canon, on="id")
            .withColumn("__prefix", F.slice("canon", 1, F.greatest(prefix_len, F.lit(1))))
            .select("id", "sz", F.posexplode("__prefix").alias("pos", "shingle"))
            .localCheckpoint(eager=True)
        )

    _timed(spark, "jaccard: phase2 freq+canon+pref ckpt", lambda: mk_pref())
    pref = mk_pref()

    a = pref.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a"), F.col("pos").alias("pos_a"), "shingle")
    b = pref.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b"), F.col("pos").alias("pos_b"), "shingle")
    size_ok = (F.col("sz_b") >= F.lit(threshold) * F.col("sz_a")) & (
        F.col("sz_b") * F.lit(threshold) <= F.col("sz_a")
    )
    alpha = F.ceil(F.lit(threshold) / (1.0 + threshold) * (F.col("sz_a") + F.col("sz_b")))
    pos_ok = (
        1 + F.least(F.col("sz_a") - 1 - F.col("pos_a"), F.col("sz_b") - 1 - F.col("pos_b"))
    ) >= alpha
    joined = a.join(b, on="shingle").where((F.col("id_a") < F.col("id_b")) & size_ok & pos_ok)
    _timed(spark, "jaccard: phase3 self-join (pre-dedup)", lambda: _noop(joined.select("id_a", "id_b")))
    cands = joined.select("id_a", "id_b").dropDuplicates(["id_a", "id_b"])
    _timed(spark, "jaccard: phase3b +dropDuplicates", lambda: _noop(cands))
    print("  candidates:", cands.count(), " raw join rows:", joined.count())

    full_a = F.broadcast(base.select(F.col("id").alias("id_a"), F.col("hsh").alias("h_a"), F.col("sz").alias("za")))
    full_b = F.broadcast(base.select(F.col("id").alias("id_b"), F.col("hsh").alias("h_b"), F.col("sz").alias("zb")))
    verified = cands.join(full_a, on="id_a").join(full_b, on="id_b")
    inter = F.size(F.array_intersect(F.col("h_a"), F.col("h_b")))
    union = F.col("za") + F.col("zb") - inter
    out = (
        verified.withColumn("jaccard", F.round(inter / union, 6))
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    _timed(spark, "jaccard: phase4 verify (from cands)", lambda: _noop(out))


def probe_write(spark):
    import shutil
    import tempfile

    from nicefox_graphdb_spark import CypherEngine
    from nicefox_graphdb_spark.catalog import GraphCatalog

    stmts = [
        ("create-1k", "UNWIND range(0, 999) AS i CREATE (:Doc {k: i, v: i % 10})"),
        ("merge-storm", "UNWIND range(500, 1499) AS i MERGE (d:Doc {k: i}) ON MATCH SET d.m = 1 ON CREATE SET d.c = 1"),
        ("keyed-set", "MATCH (d:Doc) WHERE d.k < 100 SET d.v = d.v + 100"),
        ("pruned-delete", "MATCH (d:Doc) WHERE d.k >= 1400 DELETE d"),
        ("final-read", "MATCH (d:Doc) RETURN count(*) AS n_nodes, sum(d.v) AS sum_v, sum(coalesce(d.m, 0)) AS n_matched, sum(coalesce(d.c, 0)) AS n_created"),
    ]
    for it in range(3):
        path = tempfile.mkdtemp(prefix="nicefox_prof_write_")
        try:
            t_all = time.time()
            eng = CypherEngine(spark, GraphCatalog(spark), data_path=path, n_buckets=32)
            t0 = time.time()
            print(f"  engine init: {(t0-t_all)*1000:.0f} ms")
            for tag, q in stmts:
                spark.sparkContext.setJobDescription(f"write:{tag}")
                t0 = time.time()
                if tag == "final-read":
                    eng.dataframe(q).collect()
                else:
                    eng.query(q)
                print(f"  {tag:15s} {(time.time()-t0)*1000:8.0f} ms")
                spark.sparkContext.setJobDescription(None)
            print(f"  TOTAL iter {it}: {(time.time()-t_all)*1000:.0f} ms")
        finally:
            shutil.rmtree(path, ignore_errors=True)


def probe_cc(spark):
    import __spark_entry__ as entry
    from nicefox_graphdb_spark.operators import graph_algos as ga
    from pyspark.sql import functions as F

    edges = entry._next_edges(spark, SF_DIR)
    _timed(spark, "cc: edges noop (window lineage)", lambda: _noop(edges))
    _timed(spark, "cc: full connected_components collect", lambda: ga.connected_components(edges).collect())
    verts = ga._vertices(edges, None)
    _timed(spark, "cc: _vertices noop", lambda: _noop(verts))
    e = edges.select(F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")).where(F.col("u") != F.col("v"))
    _timed(spark, "cc: canon count()", lambda: e.count())


def probe_text(spark):
    from pyspark.sql import functions as F

    import __spark_entry__ as entry
    from nicefox_graphdb_spark.operators import text as tx

    docs = entry._tables(spark, SF_DIR)["documents"]
    _timed(spark, "text: tokens only noop", lambda: _noop(docs.select(tx.tokens(F.col("text")).alias("t"))))
    _timed(spark, "text: token_count noop", lambda: _noop(docs.select(tx.token_count(F.col("text")).alias("tc"))))
    _timed(spark, "text: quality_score noop", lambda: _noop(docs.select(tx.quality_score(F.col("text")).alias("q"))))
    _timed(spark, "text: q_text_stats collect", lambda: entry._p_text_stats(spark, SF_DIR).collect())
    _timed(spark, "text: q_lang_id collect", lambda: entry._p_lang_id(spark, SF_DIR).collect())
    _timed(spark, "text: q_fingerprint collect", lambda: entry._p_fingerprint(spark, SF_DIR).collect())


def probe_stream(spark):
    import __spark_entry__ as entry

    _timed(spark, "stream: q_stream_hourly collect", lambda: entry._p_stream_hourly(spark, SF_DIR).collect())


def probe_topk(spark):
    import __spark_entry__ as entry

    _timed(spark, "topk: q_embed_topk collect", lambda: entry._p_embed_topk(spark, SF_DIR).collect(), n=5)


def main():
    from nicefox_graphdb_spark import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    for p in sys.argv[1:]:
        print(f"== probe {p} ==")
        globals()[f"probe_{p}"](spark)


if __name__ == "__main__":
    main()

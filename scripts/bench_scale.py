"""Scale-cliff validation run (VERDICT r6 ask #6): run the expensive gates
once at sf0.1 and once at a ~10x dataset (scripts/gen_scale_data.py), and
record wall-clock ratios. Sub-quadratic scaling = ratio <= ~12x at 10x rows.

Writes BENCH_scale_r{N}.json at the repo root.

Usage: python scripts/bench_scale.py [round_number]
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BASE_SF = "/root/testdata/sf0.1"
SCALE_SF = os.path.join(REPO, ".scale", "sf1")
ROUND = sys.argv[1] if len(sys.argv) > 1 else "07"

GATES = [
    "q_ngram_jaccard",
    "q_connected_components",
    "q_stream_hourly",
    "q_var_length",
    "q_ann_search",  # the corpus-scale tier of embedding near-dup
    "q_pagerank",
    "q_triangles",
    "q_shortest_paths",
    # corpus-prep operators (round 8): prefix-sum packing and the
    # posting-list decontamination join are the scale-sensitive ones
    "q_sample_split",
    "q_pack_chunks",
    "q_decontaminate",
]


def _write_bench(spark, n_rows: int) -> None:
    """The q_write_bench workload at a parameterized row count (the gate
    itself is fixed at 1k rows; the scale run drives 10x through the same
    durable-store paths: batch CREATE, MERGE upsert storm, pruned SET,
    pruned DELETE)."""
    import shutil
    import tempfile

    from nicefox_graphdb_spark import CypherEngine
    from nicefox_graphdb_spark.catalog import GraphCatalog

    path = tempfile.mkdtemp(prefix="nicefox_scale_write_")
    try:
        eng = CypherEngine(spark, GraphCatalog(spark), data_path=path, n_buckets=32)
        hi = n_rows - 1
        eng.query(f"UNWIND range(0, {hi}) AS i CREATE (:Doc {{k: i, v: i % 10}})")
        eng.query(
            f"UNWIND range({n_rows // 2}, {n_rows + n_rows // 2 - 1}) AS i "
            "MERGE (d:Doc {k: i}) ON MATCH SET d.m = 1 ON CREATE SET d.c = 1"
        )
        eng.query(f"MATCH (d:Doc) WHERE d.k < {n_rows // 10} SET d.v = d.v + 100")
        eng.query(f"MATCH (d:Doc) WHERE d.k >= {n_rows + n_rows // 2 - 100} DELETE d")
        eng.query("MATCH (d:Doc) RETURN count(*) AS n")
    finally:
        shutil.rmtree(path, ignore_errors=True)


def main() -> None:
    if not os.path.isdir(SCALE_SF):
        raise SystemExit(f"{SCALE_SF} missing - run scripts/gen_scale_data.py first")

    from nicefox_graphdb_spark import get_spark

    import __spark_entry__ as entry

    spark = get_spark(
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    qs = entry.queries()
    results: dict = {}

    # warmup: absorb session/JIT startup on a tiny gate
    qs["q_node_scan"](spark, "/root/testdata/sf0.001").count()

    for name in GATES:
        row = {}
        for tag, sf in (("base", BASE_SF), ("x10", SCALE_SF)):
            t0 = time.monotonic()
            n = qs[name](spark, sf).count()
            row[tag] = round(time.monotonic() - t0, 3)
            row[f"{tag}_rows"] = n
        row["ratio"] = round(row["x10"] / row["base"], 2) if row["base"] else None
        # when the TRUE result set grows faster than the input (e.g. the
        # near-dup gate at a low threshold: ~0.2% of ALL pairs of random
        # 64-dim vectors pass cosine>=0.35, so output is inherently
        # quadratic in corpus size), wall-clock alone conflates engine
        # scaling with output size — normalize to 10x output
        out_ratio = (
            row["x10_rows"] / row["base_rows"] if row["base_rows"] else None
        )
        row["output_ratio"] = round(out_ratio, 1) if out_ratio else None
        row["ratio_per_10x_output"] = (
            round(row["ratio"] * 10 / out_ratio, 2)
            if out_ratio and out_ratio > 10
            else row["ratio"]
        )
        results[name] = row
        print(name, row, flush=True)

    # -- decomposed runs (r10, VERDICT r9 #3/#4) ---------------------------
    # q_decontaminate's headline x10 grows BOTH sides (train and benchmark
    # slice) 10x, i.e. a 100x join-input product. Pin the bench side to the
    # sf0.1 slice and scale only the train side to isolate engine scaling.
    from pyspark.sql import functions as SF

    from nicefox_graphdb_spark.operators import dedup as dd
    from nicefox_graphdb_spark.operators import pipeline as pl
    from nicefox_graphdb_spark.operators import text as tx

    fixed_bench = (
        spark.read.parquet(os.path.join(BASE_SF, "documents.parquet"))
        .where(SF.col("doc_id") % 47 == 0)
    )
    row = {}
    for tag, sf in (("base", BASE_SF), ("x10", SCALE_SF)):
        train = spark.read.parquet(os.path.join(sf, "documents.parquet")).where(
            SF.col("doc_id") % 47 != 0
        )
        t0 = time.monotonic()
        n = pl.decontaminate(
            train, fixed_bench, "doc_id", dd.word_shingles(SF.col("text"), 3)
        ).count()
        row[tag] = round(time.monotonic() - t0, 3)
        row[f"{tag}_rows"] = n
    row["ratio"] = round(row["x10"] / row["base"], 2)
    row["ratio_per_10x_output"] = row["ratio"]
    row["diagnostic"] = True  # decomposition run, excluded from max_ratio
    row["note"] = (
        "train side x10, benchmark side PINNED to the sf0.1 slice — "
        "isolates train-side scaling from the 100x input-product growth "
        "of the headline q_decontaminate x10 run"
    )
    results["q_decontaminate_fixed_bench"] = row
    print("q_decontaminate_fixed_bench", row, flush=True)

    # q_pack_chunks phase decomposition: token-count scan, the range
    # repartition (sampling pass + shuffle), and the full two-phase prefix
    # sum — names the dominant stage behind the headline ratio.
    phases: dict = {}
    for tag, sf in (("base", BASE_SF), ("x10", SCALE_SF)):
        docs = spark.read.parquet(os.path.join(sf, "documents.parquet")).select(
            "doc_id", tx.token_count(SF.col("text")).alias("tc")
        )
        t0 = time.monotonic()
        docs.count()
        t_scan = time.monotonic() - t0
        t0 = time.monotonic()
        docs.repartitionByRange(32, SF.col("doc_id")).write.format("noop").mode(
            "overwrite"
        ).save()
        t_range = time.monotonic() - t0
        t0 = time.monotonic()
        # noop write, NOT count(): count() lets Catalyst prune the window
        # and token columns entirely (measured 0.4s for a 4s pipeline)
        pl.pack_chunks(docs, "doc_id", "tc", window=512).write.format(
            "noop"
        ).mode("overwrite").save()
        t_full = time.monotonic() - t0
        phases[tag] = {
            "token_scan": round(t_scan, 3),
            "range_repartition": round(t_range, 3),
            "full_pack": round(t_full, 3),
        }
    phases["ratio"] = {
        k: round(phases["x10"][k] / phases["base"][k], 2)
        for k in phases["base"]
        if phases["base"][k]
    }
    results["q_pack_chunks_phases"] = phases
    print("q_pack_chunks_phases", phases, flush=True)

    # q_triangles phase decomposition (VERDICT r11 #7): the headline x10
    # ratio is driven by WEDGE growth, not engine regression — the
    # degree-ordered orientation bounds per-vertex wedge cost at
    # out-degree^2 with max out-degree O(sqrt(m)), so wedges grow
    # super-linearly in edges by construction. Record undirected edge and
    # wedge counts at both SFs so the ratio self-explains.
    tri: dict = {}
    for tag, sf in (("base", BASE_SF), ("x10", SCALE_SF)):
        from pyspark.sql import Window as W

        events = spark.read.parquet(os.path.join(sf, "events.parquet"))
        w = W.partitionBy("user_id").orderBy(SF.col("ts"), SF.col("event_id"))
        base_df = (
            events.select("event_id", "user_id", "ts")
            .withColumn("_n1", SF.lead("event_id", 1).over(w))
            .withColumn("_n2", SF.lead("event_id", 2).over(w))
        )
        pairs = []
        for c in ("_n1", "_n2"):
            pairs.append(
                base_df.where(SF.col(c).isNotNull()).select(
                    SF.concat(SF.lit("E"), SF.col("event_id").cast("string")).alias("src"),
                    SF.concat(SF.lit("E"), SF.col(c).cast("string")).alias("dst"),
                )
            )
        eset = pairs[0].unionByName(pairs[1])
        und = (
            eset.select(
                SF.least("src", "dst").alias("u"), SF.greatest("src", "dst").alias("v")
            )
            .where(SF.col("u") != SF.col("v"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        deg = (
            und.select(SF.col("u").alias("id"))
            .unionByName(und.select(SF.col("v").alias("id")))
            .groupBy("id")
            .agg(SF.count("*").alias("d"))
        )
        e = und.join(
            deg.select(SF.col("id").alias("u"), SF.col("d").alias("du")), "u"
        ).join(deg.select(SF.col("id").alias("v"), SF.col("d").alias("dv")), "v")
        lo_first = (SF.col("du") < SF.col("dv")) | (
            (SF.col("du") == SF.col("dv")) & (SF.col("u") < SF.col("v"))
        )
        lo = SF.when(lo_first, SF.col("u")).otherwise(SF.col("v"))
        wedges = (
            e.select(lo.alias("lo"))
            .groupBy("lo")
            .agg(SF.count("*").alias("od"))
            .agg(SF.sum(SF.col("od") * (SF.col("od") - 1) / 2).alias("w"))
            .collect()[0]["w"]
        )
        tri[tag] = {"und_edges": und.count(), "wedges": int(wedges or 0)}
    tri["ratio"] = {
        k: round(tri["x10"][k] / tri["base"][k], 2)
        for k in tri["base"]
        if tri["base"][k]
    }
    tri["diagnostic"] = True
    tri["note"] = (
        "oriented-wedge growth is the work bound for the triangle join; "
        "a wall-clock ratio at or below the wedge ratio is at-or-better "
        "than the algorithmic bound, not a scale defect"
    )
    results["q_triangles_phases"] = tri
    print("q_triangles_phases", tri, flush=True)

    # write path: 1k rows vs 10k rows through the same durable-store ops
    row = {}
    for tag, n in (("base", 1000), ("x10", 10000)):
        t0 = time.monotonic()
        _write_bench(spark, n)
        row[tag] = round(time.monotonic() - t0, 3)
    row["ratio"] = round(row["x10"] / row["base"], 2)
    row["ratio_per_10x_output"] = row["ratio"]
    results["q_write_bench"] = row
    print("q_write_bench", row, flush=True)

    out = {
        "metric": "scale_cliff_x10",
        "unit": "sec",
        "base_sf_dir": BASE_SF,
        "scale_sf_dir": SCALE_SF,
        "scale_factor": 10,
        "queries": results,
        "max_ratio": max(
            r["ratio"]
            for r in results.values()
            if isinstance(r.get("ratio"), (int, float))
            and not r.get("diagnostic")
        ),
        "max_ratio_per_10x_output": max(
            r["ratio_per_10x_output"]
            for r in results.values()
            if isinstance(r.get("ratio_per_10x_output"), (int, float))
            and not r.get("diagnostic")
        ),
    }
    path = os.path.join(REPO, f"BENCH_scale_r{ROUND}.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
